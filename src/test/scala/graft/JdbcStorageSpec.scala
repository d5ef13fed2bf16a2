package graft

import graft.io.{ChecksStorageFactory, JdbcChecksStorage}
import org.scalatest.funsuite.AnyFunSuite

/** JDBC checks storage against embedded Derby (the same code path a Postgres
  * URL takes): latest/by-fingerprint load contract, overwrite-per-run-config,
  * idempotent saves, run-config isolation.
  */
class JdbcStorageSpec extends AnyFunSuite {

  private val url = "jdbc:derby:memory:dq_checks_spec;create=true"

  private def checksA: Seq[Map[String, Any]] = Seq(
    Map("name" -> "id_not_null", "criticality" -> "error",
      "check" -> Map("function" -> "is_not_null", "arguments" -> Map("column" -> "id"))),
    Map("name" -> "v_in_range", "criticality" -> "warn", "filter" -> "id > 0",
      "check" -> Map("function" -> "is_in_range",
        "arguments" -> Map("column" -> "v", "min_limit" -> 1, "max_limit" -> 10))))

  private def checksB: Seq[Map[String, Any]] = Seq(
    Map("name" -> "s_not_empty", "criticality" -> "error",
      "check" -> Map("function" -> "is_not_empty", "arguments" -> Map("column" -> "s"))))

  test("save/load round-trip preserves definitions and order") {
    val st = new JdbcChecksStorage(url, table = "t_roundtrip")
    st.saveChecks(checksA)
    val got = st.loadChecks()
    assert(got.map(_("name")) == Seq("id_not_null", "v_in_range"))
    val args = got(1)("check").asInstanceOf[Map[String, Any]]("arguments").asInstanceOf[Map[String, Any]]
    assert(args("min_limit") == 1 && args("max_limit") == 10)
    assert(got(1)("filter") == "id > 0")
  }

  test("append keeps versions; load by fingerprint returns the older set") {
    val st = new JdbcChecksStorage(url, table = "t_versions")
    st.saveChecks(checksA, mode = "append")
    val fpA = graft.io.CheckFingerprints.ruleSetFingerprint(checksA)
    Thread.sleep(5) // distinct created_at for the latest-set ordering
    st.saveChecks(checksB, mode = "append")
    assert(st.loadChecks().map(_("name")) == Seq("s_not_empty")) // latest wins
    assert(st.loadChecks(fingerprint = Some(fpA)).map(_("name")) ==
      Seq("id_not_null", "v_in_range"))
  }

  test("overwrite replaces only its run config; saves are idempotent") {
    val st = new JdbcChecksStorage(url, table = "t_configs")
    st.saveChecks(checksA, runConfigName = "alpha")
    st.saveChecks(checksB, runConfigName = "beta")
    st.saveChecks(checksA, runConfigName = "alpha") // idempotent no-op
    st.saveChecks(checksB, runConfigName = "alpha") // overwrite alpha
    assert(st.loadChecks(runConfigName = "alpha").map(_("name")) == Seq("s_not_empty"))
    assert(st.loadChecks(runConfigName = "beta").map(_("name")) == Seq("s_not_empty"))
    st.saveChecks(checksA, runConfigName = "beta")
    assert(st.loadChecks(runConfigName = "beta").map(_("name")) ==
      Seq("id_not_null", "v_in_range"))
  }

  test("factory routes jdbc: locations to the JDBC backend") {
    val st = ChecksStorageFactory.forLocation(url, null)
    assert(st.isInstanceOf[JdbcChecksStorage])
    st.save(checksA, url)
    assert(st.load(url).map(_("name")) == Seq("id_not_null", "v_in_range"))
  }
}
