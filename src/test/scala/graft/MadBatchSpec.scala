package graft

import graft.checks.DatasetChecks
import graft.engine.DQEngine
import graft.rules.DQDatasetRule
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Engine-level batching of has_no_outliers driver stats: N MAD rules must
  * share two stats actions (all medians, then all MADs) and flag exactly the
  * rows the per-rule path flags.
  */
class MadBatchSpec extends SparkSpec {
  import spark.implicits._

  private def df = (Seq.tabulate(500)(i => (i, i % 100 * 1.0, i % 50 * 1.0, i % 10 * 1.0)) ++
    Seq((9001, 1e6, 0.0, 0.0), (9002, 0.0, 1e6, 0.0), (9003, 0.0, 0.0, -1e6)))
    .toDF("id", "a", "b", "c")

  private def flagged(checked: org.apache.spark.sql.DataFrame): Seq[(Int, Int)] =
    checked.where(col("_errors").isNotNull)
      .select(col("id"), size(col("_errors")).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(identity).toSeq

  private def rules(exact: Boolean) = Seq(
    DQDatasetRule(DatasetChecks.hasNoOutliers("a", exact = exact), "has_no_outliers", Seq("a")),
    DQDatasetRule(DatasetChecks.hasNoOutliers("b", exact = exact), "has_no_outliers", Seq("b")),
    DQDatasetRule(DatasetChecks.hasNoOutliers("c", factor = 2.0, exact = exact,
      rowFilter = Some("id < 9000 OR id = 9003")), "has_no_outliers", Seq("c")))

  test("batched bands flag the same rows as the standalone applyFn path") {
    val viaEngine = flagged(DQEngine.applyChecks(df, rules(exact = true)))
    // standalone path: apply each check's own applyFn manually (no batching)
    val standalone = {
      var cur = df
      val rs = rules(exact = true)
      rs.foreach(r => cur = r.check.applyFn(cur))
      val errs = array_compact(array(rs.map(r =>
        when(r.check.condition.isNotNull, r.check.condition)): _*))
      flagged(cur.select(col("id"),
        when(size(errs) > 0, errs).otherwise(lit(null)).as("_errors")))
    }
    assert(viaEngine.nonEmpty && viaEngine.map(_._1) == standalone.map(_._1))
    assert(viaEngine == standalone)
    // the planted extremes must be among the flags
    assert(Set(9001, 9002, 9003).subsetOf(viaEngine.map(_._1).toSet))
  }

  test("N mad rules cost two stats jobs, not 2N") {
    val counter = new SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(counter)
    try {
      DQEngine.applyChecks(df, rules(exact = false)) // stats actions run eagerly here
      Thread.sleep(500) // let the listener bus drain
      val statsJobs = counter.jobs.get()
      // 3 rules, 2 stats actions total (vs 6 unbatched); allow slack for
      // first()'s possible multi-job limit escalation
      assert(statsJobs <= 4, s"expected <=4 stats jobs for 3 batched MAD rules, got $statsJobs")
    } finally spark.sparkContext.removeSparkListener(counter)
  }

  test("unresolvable column keeps skip-don't-fail semantics alongside batched rules") {
    val rs = rules(exact = true) :+
      DQDatasetRule(DatasetChecks.hasNoOutliers("no_such_col"), "has_no_outliers", Seq("no_such_col"))
    val checked = DQEngine.applyChecks(df, rs)
    val skipped = checked.select(explode(col("_errors")).as("e"))
      .where(col("e.skipped"))
      .select("e.name").distinct().as[String].collect().toSeq
    assert(skipped == Seq("no_such_col_has_no_outliers"))
    // the resolvable rules still flag the planted extremes
    assert(Set(9001, 9002, 9003).subsetOf(flagged(checked).map(_._1).toSet))
  }

  test("ExactMedian equals built-in exact percentile on odd/even/null/filtered inputs") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 2, 101, 1000)) {
      val data = Seq.tabulate(n)(i =>
        (i, if (i % 13 == 0 && n > 100) None else Some(rnd.nextDouble() * 1000 - 500)))
      val d = data.toDF("id", "v")
      val got = d.select(graft.checks.ExactMedian.of(col("v"))).first()
      val exp = d.select(expr("percentile(v, 0.5)")).first()
      assert(got.isNullAt(0) == exp.isNullAt(0))
      if (!got.isNullAt(0))
        assert(math.abs(got.getDouble(0) - exp.getDouble(0)) < 1e-9,
          s"n=$n got=${got.getDouble(0)} exp=${exp.getDouble(0)}")
    }
    // all-null input -> NULL
    val allNull = Seq.tabulate(5)(i => (i, Option.empty[Double])).toDF("id", "v")
    assert(allNull.select(graft.checks.ExactMedian.of(col("v"))).first().isNullAt(0))
  }

  test("rowFilter respected by the batched band") {
    // filter excludes the extreme 9001 from the band stats AND from flagging
    val r = Seq(DQDatasetRule(DatasetChecks.hasNoOutliers("a", exact = true,
      rowFilter = Some("id <= 500")), "has_no_outliers", Seq("a")))
    val out = flagged(DQEngine.applyChecks(df, r))
    assert(!out.map(_._1).contains(9001)) // filtered out -> never flagged
  }

  test("ExactMedian value cap fails loudly instead of buffering unbounded groups") {
    import graft.checks.ExactMedian
    // under the cap: fine
    val ok = df.agg(ExactMedian.of(col("a"), maxValues = 1000).as("m")).collect()
    assert(ok.head.getDouble(0) > 0)
    // over the cap: clear error naming the remedy, not an OOM
    val e = intercept[org.apache.spark.SparkException] {
      df.agg(ExactMedian.of(col("a"), maxValues = 100).as("m")).collect()
    }
    val msg = String.valueOf(e.getCause) + e.getMessage
    assert(msg.contains("graft_exact_median") && msg.contains("percentile_approx"), msg)
    // SQL two-arg form wires the cap through
    graft.GraftExtensions.register(spark)
    df.createOrReplaceTempView("madcap_t")
    val sqlE = intercept[org.apache.spark.SparkException] {
      spark.sql("SELECT graft_exact_median(a, 100) FROM madcap_t").collect()
    }
    assert((String.valueOf(sqlE.getCause) + sqlE.getMessage).contains("graft_exact_median"))
    assert(spark.sql("SELECT graft_exact_median(a, 100000) FROM madcap_t")
      .collect().head.getDouble(0) > 0)
  }

  test("MAD after a row-appending compare_datasets: band comes from the INPUT frame") {
    // Pins the documented divergence (DQEngine batching comment): a
    // has_no_outliers rule placed AFTER compare_datasets(checkMissingRecords)
    // computes its band on the original input, so rows the compare APPENDS
    // (missing-in-input) neither move the band nor get flagged by the MAD
    // rule (their value columns are null on append).
    val input = (Seq.tabulate(200)(i => (i, i % 20 * 1.0)) :+ (9001, 1e6))
      .toDF("id", "a")
    // ref = input keys plus one missing row whose `a` is an extreme value
    // that WOULD move a per-rule-position band computed after the append
    val ref = ((Seq.tabulate(200)(i => (i, i % 20 * 1.0)) :+ (9001, 1e6)) ++
      Seq((7777, 1e9), (7778, 1e9), (7779, 1e9))).toDF("id", "a")
    val rs = Seq(
      DQDatasetRule(DatasetChecks.compareDatasets(Seq("id"), Seq("id"), ref,
        checkMissingRecords = true), "compare_datasets", Seq("id")),
      DQDatasetRule(DatasetChecks.hasNoOutliers("a", exact = true),
        "has_no_outliers", Seq("a")))
    val checked = DQEngine.applyChecks(input, rs)
    assert(checked.count() == 204) // 201 input + 3 appended
    val madFlagged = checked
      .where(col("_errors").isNotNull &&
        exists(col("_errors"), e => e.getField("function") === "has_no_outliers"))
      .select("id").collect().map(_.getInt(0)).toSet
    // band from the input frame: only the input outlier is flagged; the
    // appended 1e9 rows are not (null `a` after append), and their presence
    // did not widen the band to excuse 9001
    assert(madFlagged == Set(9001), s"got $madFlagged")
  }
}
