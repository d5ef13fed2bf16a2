package graft

import graft.checks.DatasetChecks
import graft.engine.DQEngine
import graft.rules.DQDatasetRule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The hash-prefilter path of compare_datasets must be observationally
  * identical to the wide-join path on every row the check flags. Runs both
  * paths on the same planted-diff inputs and diffs the full result.
  */
class ComparePrefilterSpec extends SparkSpec {
  import spark.implicits._

  private def base: DataFrame = Seq(
    (1, "a", 10.0, "x"), // clean
    (2, "b", 20.0, "x"), // value changed in ref
    (3, "c", 30.0, "x"), // extra: key absent from ref
    (4, null, 40.0, "x"), // null in a compared column, equal on both sides
    (5, "e", 50.0, "x"), // null-vs-value diff in ref
    (7, "g", 70.0, "x") // ref has this key twice (one equal copy, one changed)
  ).toDF("id", "s", "v", "tag")

  private def ref: DataFrame = Seq(
    (1, "a", 10.0, "y"),
    (2, "CHANGED", 20.0, "y"),
    (4, null, 40.0, "y"),
    (5, null, 50.0, "y"),
    (6, "f", 60.0, "y"), // missing: key absent from input
    (7, "g", 70.0, "y"),
    (7, "g2", 70.5, "y")
  ).toDF("id", "s", "v", "tag")

  private def run(hashPrefilter: Boolean, checkMissing: Boolean,
                  nullSafeVals: Boolean = true, absTol: Double = 0.0): Seq[(Option[Int], String)] = {
    val rule = DQDatasetRule(
      DatasetChecks.compareDatasets(Seq("id"), Seq("id"), ref,
        checkMissingRecords = checkMissing, excludeColumns = Seq("tag"),
        nullSafeColumnValueMatching = nullSafeVals, absTolerance = absTol,
        hashPrefilter = hashPrefilter),
      "compare_datasets", Seq("id"))
    DQEngine.applyChecks(base, Seq(rule))
      .select(col("id"), coalesce(col("_errors")(0)("message"), lit("pass")).as("m"))
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Int]), r.getString(1)))
      .sortBy(p => (p._1.getOrElse(-1), p._2)).toSeq
  }

  test("prefilter path matches wide path: left-join mode") {
    assert(run(hashPrefilter = true, checkMissing = false) ==
      run(hashPrefilter = false, checkMissing = false))
  }

  test("prefilter path matches wide path: full-outer with appended missing rows") {
    val p = run(hashPrefilter = true, checkMissing = true)
    assert(p == run(hashPrefilter = false, checkMissing = true))
    // the missing ref-only key must actually be appended
    assert(p.exists { case (id, m) => id.contains(6) && m.contains("\"row_missing\":true") })
  }

  test("prefilter path matches wide path: non-null-safe value matching") {
    assert(run(hashPrefilter = true, checkMissing = true, nullSafeVals = false) ==
      run(hashPrefilter = false, checkMissing = true, nullSafeVals = false))
  }

  test("prefilter path matches wide path: tolerance absorbs hash candidates") {
    // v differs by 0.5 on the duplicated key 7; tolerance 1.0 clears it in
    // both paths even though the hashes differ
    assert(run(hashPrefilter = true, checkMissing = true, absTol = 1.0) ==
      run(hashPrefilter = false, checkMissing = true, absTol = 1.0))
  }

  test("duplicated ref keys multiply rows identically in both paths") {
    def rows(pf: Boolean) = run(hashPrefilter = pf, checkMissing = false)
    val p = rows(true)
    assert(p.count(_._1.contains(7)) == 2)
    assert(p == rows(false))
  }

  test("candidate cap exceeded falls back to the wide path (same answer)") {
    assert(run(hashPrefilter = true, checkMissing = true) ==
      runWithCap(1))
  }

  test("byte cap exceeded falls back to the wide path (same answer)") {
    // 16-byte cap is below any ref row width -> capRows = 1 -> fallback
    val rule = DQDatasetRule(
      DatasetChecks.compareDatasets(Seq("id"), Seq("id"), ref,
        checkMissingRecords = true, excludeColumns = Seq("tag"),
        maxPrefilterBytes = 16L),
      "compare_datasets", Seq("id"))
    val capped = DQEngine.applyChecks(base, Seq(rule))
      .select(col("id"), coalesce(col("_errors")(0)("message"), lit("pass")).as("m"))
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Int]), r.getString(1)))
      .sortBy(p => (p._1.getOrElse(-1), p._2)).toSeq
    assert(run(hashPrefilter = true, checkMissing = true) == capped)
  }

  test("NaN with tolerance: prefilter matches wide path (NaN rows stay flagged)") {
    val nanBase = Seq((1, 1.0), (2, Double.NaN), (3, 3.0), (4, Double.NaN))
      .toDF("id", "v")
    val nanRef = Seq((1, 1.2), (2, Double.NaN), (3, 3.0), (4, 4.0))
      .toDF("id", "v")
    def go(pf: Boolean): Seq[(Int, String)] = {
      val rule = DQDatasetRule(
        DatasetChecks.compareDatasets(Seq("id"), Seq("id"), nanRef,
          absTolerance = 0.5, hashPrefilter = pf),
        "compare_datasets", Seq("id"))
      DQEngine.applyChecks(nanBase, Seq(rule))
        .select(col("id"), coalesce(col("_errors")(0)("message"), lit("pass")).as("m"))
        .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(identity).toSeq
    }
    val p = go(true)
    assert(p == go(false))
    // Wide-path tolerance semantics (ground truth): NaN-vs-NaN passes — the
    // band `abs + rel*|b|` is NaN for a NaN ref value and NaN <= NaN holds in
    // Spark — while NaN-vs-value is changed (NaN <= 0.5 is false). The
    // prefilter forces NaN rows into candidacy so the exact predicate, not
    // hash equality, decides both cases.
    assert(p == Seq(
      (1, "pass"), (2, "pass"), (3, "pass"),
      (4, """{"row_missing":false,"row_extra":false,"changed":{"v":"NaN -> 4.0"}}""")))
  }

  test("presence path (no compared columns) matches wide path flags") {
    def runPresence(pf: Boolean): Seq[(Int, String)] = {
      val rule = DQDatasetRule(
        DatasetChecks.compareDatasets(Seq("id"), Seq("id"), ref.where(col("id") =!= 7),
          excludeColumns = Seq("s", "v", "tag"), hashPrefilter = pf),
        "compare_datasets", Seq("id"))
      DQEngine.applyChecks(base, Seq(rule))
        .select(col("id"), coalesce(col("_errors")(0)("message"), lit("pass")).as("m"))
        .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(identity).toSeq
    }
    // ref sans key 7 so no duplicate ref keys: row sets identical in both paths
    assert(runPresence(true) == runPresence(false))
    assert(runPresence(true).count(_._2.contains("\"row_extra\":true")) == 2) // ids 3 and 7
  }

  test("small starved inputs SKIP the widening shuffle (size floor), answers unchanged") {
    // single-partition inputs, but tiny: the r6 size gate must not add a
    // repartition-to-defaultParallelism shuffle (it would cost more than the
    // parallelism it buys), and the answers must be identical either way
    val starvedBase = base.repartition(1)
    val starvedRef = ref.repartition(1)
    val rule = DQDatasetRule(
      DatasetChecks.compareDatasets(Seq("id"), Seq("id"), starvedRef,
        checkMissingRecords = true, excludeColumns = Seq("tag")),
      "compare_datasets", Seq("id"))
    val out = DQEngine.applyChecks(starvedBase, Seq(rule))
    val par = spark.sparkContext.defaultParallelism
    val planStr = out.queryExecution.executedPlan.toString
    assert(!planStr.contains(s"RoundRobinPartitioning($par)"),
      s"tiny frame was widened to $par partitions:\n$planStr")
    val got = out
      .select(col("id"), coalesce(col("_errors")(0)("message"), lit("pass")).as("m"))
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Int]), r.getString(1)))
      .sortBy(p => (p._1.getOrElse(-1), p._2)).toSeq
    assert(got == run(hashPrefilter = true, checkMissing = true))
  }

  test("widen decision: narrow AND bulky widens; small, already-wide, or empty do not") {
    // the 100M reference fixture shape (~1.4 GB-estimate per partition, 10
    // partitions on a 32-way cluster) widens; the 10M shape (~100 MB per
    // partition) and near-cluster-width inputs do not
    val gb = 1024L * 1024 * 1024
    assert(DatasetChecks.shouldWiden(BigInt(14 * gb), 10, 32))
    assert(!DatasetChecks.shouldWiden(BigInt(1 * gb), 10, 32))
    assert(!DatasetChecks.shouldWiden(BigInt(140 * gb), 20, 32))
    assert(!DatasetChecks.shouldWiden(BigInt(0), 0, 32))
  }

  test("widen decision row criterion: narrow-schema agg side with many rows widens") {
    // the 100M 3-int-col ref fixture: ~1 GB estimate / 10 partitions is under
    // the byte floor, but at 20 bytes/row that is 5M rows per partition of
    // partial aggregation — row criterion fires (measured 152.5s -> 78.6s)
    val oneGb = BigInt(1024L * 1024 * 1024)
    assert(DatasetChecks.shouldWiden(oneGb, 10, 32, estRowSize = 20L))
    // 10M-row shape: ~100 MB estimate -> 500k rows/partition, under both floors
    assert(!DatasetChecks.shouldWiden(oneGb / 10, 10, 32, estRowSize = 20L))
    // wide rows (estRowSize large): row criterion never fires before bytes
    assert(!DatasetChecks.shouldWiden(oneGb, 10, 32, estRowSize = 10000L))
  }

  test("cacheInput snapshots non-deterministic inputs: flags agree with rows") {
    // rand()-derived column: without a snapshot the candidate pass and the
    // verdict pass would see different values and the flags could disagree
    // with the rows they annotate. With cacheInput=true both passes read the
    // localCheckpoint, so every changed-flag must quote the row's own value.
    val ndBase = spark.range(0, 200).toDF("id")
      .withColumn("v", when(rand(7) < 0.5, col("id").cast("double"))
        .otherwise(col("id").cast("double") + 1000.0))
    val ndRef = spark.range(0, 200).toDF("id")
      .withColumn("v", col("id").cast("double"))
    val rule = DQDatasetRule(
      DatasetChecks.compareDatasets(Seq("id"), Seq("id"), ndRef,
        cacheInput = true),
      "compare_datasets", Seq("id"))
    val out = DQEngine.applyChecks(ndBase, Seq(rule))
      .select(col("id"), col("v"),
        coalesce(col("_errors")(0)("message"), lit("pass")).as("m"))
      .collect()
    out.foreach { r =>
      val id = r.getLong(0); val v = r.getDouble(1); val m = r.getString(2)
      if (v == id.toDouble) assert(m == "pass", s"id=$id v=$v flagged: $m")
      else assert(m.contains(s"${'"'}v${'"'}:${'"'}$v -> "), s"id=$id v=$v msg=$m")
    }
    assert(out.exists(_.getString(2) != "pass")) // the planted diffs exist
  }

  private def runWithCap(cap: Int): Seq[(Option[Int], String)] = {
    val rule = DQDatasetRule(
      DatasetChecks.compareDatasets(Seq("id"), Seq("id"), ref,
        checkMissingRecords = true, excludeColumns = Seq("tag"),
        maxCollectedDiffs = cap),
      "compare_datasets", Seq("id"))
    DQEngine.applyChecks(base, Seq(rule))
      .select(col("id"), coalesce(col("_errors")(0)("message"), lit("pass")).as("m"))
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Int]), r.getString(1)))
      .sortBy(p => (p._1.getOrElse(-1), p._2)).toSeq
  }
}
