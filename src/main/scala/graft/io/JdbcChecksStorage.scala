package graft.io

import graft.rules.ChecksSerializer

import java.sql.{Connection, DriverManager, Timestamp}

/** JDBC-backed checks storage — the OSS analog of the reference's
  * Lakebase/Postgres backend (checks_storage.py:498-1012): rule definitions
  * live in a relational table, fingerprint-versioned, with the same contract
  * as [[TableChecksStorage]]:
  *
  *  - save is idempotent per (run_config_name, rule_set_fingerprint) — an
  *    already-stored set short-circuits the write;
  *  - `overwrite` replaces only this run config's rows, `append` accumulates
  *    versions;
  *  - load returns the latest set by created_at, or a specific
  *    rule_set_fingerprint when given.
  *
  * Each check serializes to its YAML document (faithful round-trip through
  * [[ChecksSerializer]]); `seq_no` preserves rule order within a set. Plain
  * `java.sql` against any driver on the classpath (embedded Derby in tests;
  * a Postgres URL works unchanged) — checks tables are small by contract
  * (the reference warns beyond 500 rows), so driver-side round-trips are the
  * right shape; no Spark jobs involved.
  */
class JdbcChecksStorage(url: String, table: String = "dq_checks",
                        user: Option[String] = None, password: Option[String] = None)
    extends ChecksStorage {
  require(table.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid table name '$table'")

  private def withConn[A](f: Connection => A): A = {
    val conn = (user, password) match {
      case (Some(u), p) => DriverManager.getConnection(url, u, p.getOrElse(""))
      case _ => DriverManager.getConnection(url)
    }
    try f(conn) finally conn.close()
  }

  private def ensureTable(conn: Connection): Unit = {
    val meta = conn.getMetaData
    // scope the existence check to the schema unqualified statements resolve
    // in — an identically-named table in ANOTHER schema must not suppress the
    // CREATE (getSchema can be null/unsupported; null falls back to all)
    val schema = try conn.getSchema catch { case _: Throwable => null }
    val rs = meta.getTables(null, schema, null, Array("TABLE"))
    var exists = false
    while (rs.next() && !exists)
      exists = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
    rs.close()
    if (!exists) {
      val st = conn.createStatement()
      // VARCHAR(32000) fits Derby's limit and is valid Postgres DDL
      st.executeUpdate(
        s"""CREATE TABLE $table (
           |  run_config_name VARCHAR(255) NOT NULL,
           |  seq_no INT NOT NULL,
           |  check_yaml VARCHAR(32000) NOT NULL,
           |  created_at TIMESTAMP NOT NULL,
           |  rule_fingerprint VARCHAR(64) NOT NULL,
           |  rule_set_fingerprint VARCHAR(64) NOT NULL
           |)""".stripMargin)
      st.close()
    }
  }

  def saveChecks(checks: Seq[Map[String, Any]], runConfigName: String = "default",
                 mode: String = "overwrite"): Unit = {
    if (checks.isEmpty) return
    require(runConfigName.matches("[\\w.\\-]+"),
      s"run_config_name must contain only word chars, '.', '-'; got '$runConfigName'")
    val setFp = CheckFingerprints.ruleSetFingerprint(checks)
    withConn { conn =>
      ensureTable(conn)
      val check = conn.prepareStatement(
        s"SELECT 1 FROM $table WHERE run_config_name = ? AND rule_set_fingerprint = ?")
      check.setString(1, runConfigName); check.setString(2, setFp)
      val already = { val rs = check.executeQuery(); val r = rs.next(); rs.close(); r }
      check.close()
      if (already) return // idempotent: same set already stored
      conn.setAutoCommit(false)
      try {
        if (mode == "overwrite") {
          val del = conn.prepareStatement(s"DELETE FROM $table WHERE run_config_name = ?")
          del.setString(1, runConfigName); del.executeUpdate(); del.close()
        }
        val now = new Timestamp(System.currentTimeMillis())
        val ins = conn.prepareStatement(
          s"INSERT INTO $table (run_config_name, seq_no, check_yaml, created_at, " +
            "rule_fingerprint, rule_set_fingerprint) VALUES (?, ?, ?, ?, ?, ?)")
        checks.zipWithIndex.foreach { case (c, i) =>
          ins.setString(1, runConfigName)
          ins.setInt(2, i)
          ins.setString(3, ChecksSerializer.toYaml(Seq(c)))
          ins.setTimestamp(4, now)
          ins.setString(5, CheckFingerprints.ruleFingerprint(c))
          ins.setString(6, setFp)
          ins.addBatch()
        }
        ins.executeBatch(); ins.close()
        conn.commit()
      } catch { case e: Throwable => conn.rollback(); throw e }
    }
  }

  def loadChecks(runConfigName: String = "default",
                 fingerprint: Option[String] = None): Seq[Map[String, Any]] = withConn { conn =>
    ensureTable(conn)
    val fp = fingerprint.orElse {
      val st = conn.prepareStatement(
        s"SELECT rule_set_fingerprint FROM $table WHERE run_config_name = ? " +
          "ORDER BY created_at DESC, rule_set_fingerprint DESC FETCH FIRST 1 ROWS ONLY")
      st.setString(1, runConfigName)
      val rs = st.executeQuery()
      val r = if (rs.next()) Some(rs.getString(1)) else None
      rs.close(); st.close(); r
    }
    fp match {
      case None => Seq.empty
      case Some(f) =>
        val st = conn.prepareStatement(
          s"SELECT check_yaml FROM $table WHERE run_config_name = ? AND " +
            "rule_set_fingerprint = ? ORDER BY seq_no")
        st.setString(1, runConfigName); st.setString(2, f)
        val rs = st.executeQuery()
        val out = scala.collection.mutable.ArrayBuffer[Map[String, Any]]()
        while (rs.next()) out ++= ChecksSerializer.parseYaml(rs.getString(1))
        rs.close(); st.close()
        out.toSeq
    }
  }

  override def load(location: String): Seq[Map[String, Any]] = loadChecks()
  override def save(checks: Seq[Map[String, Any]], location: String): Unit = saveChecks(checks)
}
