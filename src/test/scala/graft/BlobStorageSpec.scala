package graft

import graft.io.{BlobChecksStorage, CheckFingerprints, ChecksStorageFactory}

/** URI-addressed blob checks storage (workspace-file/UC-volume analog):
  * the same contract parity suite the JDBC backend passes — latest/
  * by-fingerprint load, overwrite-per-run-config, idempotent saves,
  * run-config isolation — over a file:// directory.
  */
class BlobStorageSpec extends SparkSpec {

  private def checksA: Seq[Map[String, Any]] = Seq(
    Map("name" -> "id_not_null", "criticality" -> "error",
      "check" -> Map("function" -> "is_not_null", "arguments" -> Map("column" -> "id"))),
    Map("name" -> "v_in_range", "criticality" -> "warn", "filter" -> "id > 0",
      "check" -> Map("function" -> "is_in_range",
        "arguments" -> Map("column" -> "v", "min_limit" -> 1, "max_limit" -> 10))))

  private def checksB: Seq[Map[String, Any]] = Seq(
    Map("name" -> "s_not_empty", "criticality" -> "error",
      "check" -> Map("function" -> "is_not_empty", "arguments" -> Map("column" -> "s"))))

  private def tempLoc(): String =
    java.nio.file.Files.createTempDirectory("graft_blob").toUri.toString

  test("save/load round-trip preserves definitions and order") {
    val st = new BlobChecksStorage(spark)
    val loc = tempLoc()
    st.saveChecks(checksA, loc)
    val got = st.loadChecks(loc)
    assert(got.map(_("name")) == Seq("id_not_null", "v_in_range"))
    val args = got(1)("check").asInstanceOf[Map[String, Any]]("arguments").asInstanceOf[Map[String, Any]]
    assert(args("min_limit") == 1 && args("max_limit") == 10)
    assert(got(1)("filter") == "id > 0")
  }

  test("append keeps versions; load by fingerprint returns the older set") {
    val st = new BlobChecksStorage(spark)
    val loc = tempLoc()
    st.saveChecks(checksA, loc, mode = "append")
    val fpA = CheckFingerprints.ruleSetFingerprint(checksA)
    Thread.sleep(5) // distinct timestamp prefix for the latest-set ordering
    st.saveChecks(checksB, loc, mode = "append")
    assert(st.loadChecks(loc).map(_("name")) == Seq("s_not_empty")) // latest wins
    assert(st.loadChecks(loc, fingerprint = Some(fpA)).map(_("name")) ==
      Seq("id_not_null", "v_in_range"))
    assert(st.listVersions(loc).size == 2)
  }

  test("overwrite replaces only its run config; saves are idempotent") {
    val st = new BlobChecksStorage(spark)
    val loc = tempLoc()
    st.saveChecks(checksA, loc, runConfigName = "alpha")
    st.saveChecks(checksB, loc, runConfigName = "beta")
    st.saveChecks(checksA, loc, runConfigName = "alpha") // idempotent no-op
    assert(st.listVersions(loc, "alpha").size == 1)
    st.saveChecks(checksB, loc, runConfigName = "alpha") // overwrite alpha
    assert(st.loadChecks(loc, runConfigName = "alpha").map(_("name")) == Seq("s_not_empty"))
    assert(st.loadChecks(loc, runConfigName = "beta").map(_("name")) == Seq("s_not_empty"))
    assert(st.listVersions(loc, "alpha").size == 1) // overwrite pruned history
    st.saveChecks(checksA, loc, runConfigName = "beta")
    assert(st.loadChecks(loc, runConfigName = "beta").map(_("name")) ==
      Seq("id_not_null", "v_in_range"))
  }

  test("missing config and unknown fingerprint fail with the location story") {
    val st = new BlobChecksStorage(spark)
    val loc = tempLoc()
    intercept[IllegalArgumentException] { st.loadChecks(loc) }
    st.saveChecks(checksA, loc)
    intercept[IllegalArgumentException] {
      st.loadChecks(loc, fingerprint = Some("deadbeef"))
    }
  }

  test("factory routes scheme-qualified URIs to the blob backend") {
    val st = ChecksStorageFactory.forLocation("file:///tmp/any/dir", spark)
    assert(st.isInstanceOf[BlobChecksStorage])
    // jdbc: still wins over the scheme rule
    assert(!ChecksStorageFactory.forLocation("jdbc:derby:memory:x", spark)
      .isInstanceOf[BlobChecksStorage])
  }
}
