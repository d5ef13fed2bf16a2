package graft

import graft.checks.{DatasetChecks, RowChecks}
import graft.engine.DQEngine
import graft.rules._
import org.apache.spark.sql.functions._

/** Edge-case semantics from SURVEY §1.3: null-handling knobs, tolerances,
  * filters inside aggregates, JSON schema presence checks.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def errs(df: org.apache.spark.sql.DataFrame, rule: DQRule): Seq[Int] =
    DQEngine.applyChecks(df, Seq(rule))
      .where(col("_errors").isNotNull).select("id").as[Int].collect().toSeq.sorted

  test("is_unique nulls_distinct: null keys never duplicate; =false groups them") {
    val df = Seq((1, Option.empty[String]), (2, None), (3, Some("x")), (4, Some("x")))
      .toDF("id", "k")
    val distinct = errs(df, DQDatasetRule(DatasetChecks.isUnique(Seq("k")), "is_unique", Seq("k")))
    assert(distinct == Seq(3, 4)) // nulls distinct by default
    val grouped = errs(df, DQDatasetRule(
      DatasetChecks.isUnique(Seq("k"), nullsDistinct = false), "is_unique", Seq("k")))
    assert(grouped == Seq(1, 2, 3, 4))
  }

  test("is_unique strategies agree: window/probe x nulls_distinct x filter x composite") {
    // r11 scale work: the slim dup-key probe must produce byte-identical
    // verdicts AND messages to the reference-parity window plan
    val df = Seq(
      (1, Option.empty[String], "a"), (2, None, "a"), (3, Some("x"), "b"),
      (4, Some("x"), "b"), (5, Some("y"), "b"), (6, Some("x"), "c")).toDF("id", "k", "g")
    def msgs(rule: DQRule): Seq[String] =
      DQEngine.applyChecks(df, Seq(rule)).where(col("_errors").isNotNull)
        .selectExpr("id", "_errors[0].message AS m").as[(Int, String)]
        .collect().toSeq.sortBy(_._1).map { case (i, m) => s"$i:$m" }
    for (nd <- Seq(true, false); filter <- Seq(None, Some("id <= 5"));
         cols <- Seq(Seq("k"), Seq("k", "g"))) {
      val w = msgs(DQDatasetRule(DatasetChecks.isUnique(cols, nd, filter, "window"),
        "is_unique", cols, filter = filter))
      val p = msgs(DQDatasetRule(DatasetChecks.isUnique(cols, nd, filter, "probe"),
        "is_unique", cols, filter = filter))
      assert(p == w, s"nulls_distinct=$nd filter=$filter cols=$cols: $p != $w")
    }
  }

  test("is_unique probe plan: no window/sort-merge; count prunes the probe subtree") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.SparkPlan
    val df = spark.range(0L, 50000L, 1L, 8)
      .selectExpr("id", "CAST(id % 1000 AS STRING) AS k")
    val checked = DQEngine.applyChecks(df, Seq(DQDatasetRule(
      DatasetChecks.isUnique(Seq("k"), strategy = "probe"), "is_unique", Seq("k"))))
    def collectPlans(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(collectPlans)) ++ p.subqueries.flatMap(collectPlans)
    val executed = checked.where(col("_errors").isNotNull).queryExecution.executedPlan
    val bad = collectPlans(executed).collect {
      case j: SortMergeJoinExec => j; case w: WindowExec => w
    }
    assert(bad.isEmpty, s"probe plan contains SMJ/Window:\n$executed")
    // unread verdicts eliminate the row-preserving join-back and the dup-key
    // aggregation with it (count-parity protocol)
    val counted = checked.select(count(lit(1))).queryExecution.optimizedPlan
    val joins = counted.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, s"count plan did not eliminate the probe join:\n$counted")
  }

  test("foreign_key null_safe: NULL key matches NULL ref key") {
    val df = Seq((1, Option.empty[String]), (2, Some("a")), (3, Some("zz"))).toDF("id", "k")
    val ref = Seq(Option.empty[String], Some("a")).toDF("rk")
    val plain = errs(df, DQDatasetRule(
      DatasetChecks.foreignKey(Seq("k"), Seq("rk"), ref), "foreign_key", Seq("k")))
    assert(plain == Seq(3)) // null key skipped (not a violation), zz missing
    val nullSafe = errs(df, DQDatasetRule(
      DatasetChecks.foreignKey(Seq("k"), Seq("rk"), ref, nullSafe = true), "foreign_key", Seq("k")))
    assert(nullSafe == Seq(3)) // null matches null ref row
    val refNoNull = Seq(Some("a")).toDF("rk")
    val nullSafe2 = errs(df, DQDatasetRule(
      DatasetChecks.foreignKey(Seq("k"), Seq("rk"), refNoNull, nullSafe = true), "foreign_key", Seq("k")))
    assert(nullSafe2 == Seq(1, 3)) // null no longer matches
  }

  test("foreign_key strategies agree: join/broadcast/probe x negate x null_safe x filter") {
    // r10 scale work: the slim keys-probe and explicit-broadcast shapes must
    // produce byte-identical verdicts to the pre-r10 plain join
    val df = Seq(
      (1, Option.empty[String]), (2, Some("a")), (3, Some("zz")),
      (4, Some("a")), (5, Some("q")), (6, Option.empty[String])).toDF("id", "k")
    val ref = Seq(Option.empty[String], Some("a"), Some("a"), Some("b")).toDF("rk")
    val strategies = Seq("join", "broadcast", "probe", "auto")
    for (negate <- Seq(false, true); nullSafe <- Seq(false, true);
         filter <- Seq(None, Some("id <= 5"))) {
      val got = strategies.map { s =>
        s -> errs(df, DQDatasetRule(
          DatasetChecks.foreignKey(Seq("k"), Seq("rk"), ref,
            negate = negate, nullSafe = nullSafe, rowFilter = filter, strategy = s),
          "foreign_key", Seq("k"), filter = filter))
      }
      val base = got.head._2
      got.tail.foreach { case (s, r) =>
        assert(r == base, s"strategy=$s negate=$negate nullSafe=$nullSafe filter=$filter: $r != $base")
      }
    }
    // spot-check absolute semantics in probe mode
    val probeViol = errs(df, DQDatasetRule(
      DatasetChecks.foreignKey(Seq("k"), Seq("rk"), ref, strategy = "probe"),
      "foreign_key", Seq("k")))
    assert(probeViol == Seq(3, 5)) // zz, q missing; nulls skipped
    val probeNeg = errs(df, DQDatasetRule(
      DatasetChecks.foreignKey(Seq("k"), Seq("rk"), ref, negate = true, strategy = "probe"),
      "foreign_key", Seq("k")))
    assert(probeNeg == Seq(2, 4)) // the "a" rows found in ref
  }

  test("foreign_key probe plan: no sort-merge join-back; count prunes the probe subtree") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.SparkPlan
    // big-enough frames that the planner would otherwise SMJ
    val df = spark.range(0L, 50000L, 1L, 8)
      .selectExpr("id", "CAST(id % 1000 AS STRING) AS k")
    val ref = spark.range(0L, 20000L, 1L, 8).selectExpr("CAST(id AS STRING) AS rk")
    val checked = DQEngine.applyChecks(df, Seq(DQDatasetRule(
      DatasetChecks.foreignKey(Seq("k"), Seq("rk"), ref, strategy = "probe"),
      "foreign_key", Seq("k"))))
    // (a) the verdict-reading plan has NO SortMergeJoin: the probe/anti join
    // runs on slim key sets and the join-back is hash- or broadcast-built —
    // the full-width frame is never sorted
    def collectPlans(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(collectPlans)) ++ p.subqueries.flatMap(collectPlans)
    val executed = checked.where(col("_errors").isNotNull).queryExecution.executedPlan
    val smj = collectPlans(executed).collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, s"probe plan contains SortMergeJoin:\n$executed")
    // (b) when the verdicts go unread (count-parity protocol) Catalyst
    // eliminates the row-preserving join-back AND the probe subtree with it
    val counted = checked.select(count(lit(1))).queryExecution.optimizedPlan
    val joins = counted.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, s"count plan did not eliminate the probe joins:\n$counted")
  }

  test("foreign_key auto honors a user-disabled broadcast threshold with the probe") {
    // ADVICE r10 #2: autoBroadcastJoinThreshold=-1 is a deliberate "no
    // broadcast joins" decision — auto must pick the keys-probe, not clamp
    // to 10MB and force a broadcast hint over the operator's head
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    val df = Seq((1, "a"), (2, "zz")).toDF("id", "k")
    val ref = Seq("a", "b").toDF("rk")
    def autoPlanHasAnti(threshold: String): Boolean = {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        val checked = DQEngine.applyChecks(df, Seq(DQDatasetRule(
          DatasetChecks.foreignKey(Seq("k"), Seq("rk"), ref), "foreign_key", Seq("k"))))
        checked.queryExecution.analyzed.collect {
          case j: Join if j.joinType == LeftAnti => j
        }.nonEmpty
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    assert(autoPlanHasAnti("-1"), "disabled threshold should route auto to the keys-probe")
    assert(!autoPlanHasAnti("10MB"), "tiny ref under an enabled threshold should broadcast-join")
    // verdicts are unchanged either way
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val got = errs(df, DQDatasetRule(
        DatasetChecks.foreignKey(Seq("k"), Seq("rk"), ref), "foreign_key", Seq("k")))
      assert(got == Seq(2))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggr compare row_filter is conditional aggregation + result gate") {
    val df = Seq((1, "g1", 10), (2, "g1", 100), (3, "g2", 10)).toDF("id", "g", "v")
    // dqx semantics: the rule filter goes INTO the aggregate (row_filter) AND
    // gates which rows flag. sum(v | v<50) per group: g1=10, g2=10; limit 5 ->
    // both groups fail; row 2 (v=100) is outside the filter so it never flags.
    val rule = DQDatasetRule(DatasetChecks.isAggrNotGreaterThan(
      "v", 5.0, "sum", groupBy = Seq("g"), rowFilter = Some("v < 50")),
      "is_aggr_not_greater_than", Seq("v"), filter = Some("v < 50"))
    assert(errs(df, rule) == Seq(1, 3))
    // metadata path wires the same filter into both automatically
    val out = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error", "filter" -> "v < 50",
      "check" -> Map("function" -> "is_aggr_not_greater_than",
        "arguments" -> Map("column" -> "v", "aggr_type" -> "sum", "limit" -> 5.0,
          "group_by" -> Seq("g"))))))
    val flagged = out.where(col("_errors").isNotNull).select("id").as[Int].collect().toSeq.sorted
    assert(flagged == Seq(1, 3))
  }

  test("is_aggr_equal tolerances: abs and rel") {
    val df = Seq((1, 98), (2, 98)).toDF("id", "v")
    // sum=196 vs limit 200: abs tol 5 -> within; abs tol 2 -> outside
    val within = DQDatasetRule(DatasetChecks.isAggrEqual("v", 200.0, "sum", absTolerance = 5.0),
      "is_aggr_equal", Seq("v"))
    assert(errs(df, within).isEmpty)
    val outside = DQDatasetRule(DatasetChecks.isAggrEqual("v", 200.0, "sum", absTolerance = 2.0),
      "is_aggr_equal", Seq("v"))
    assert(errs(df, outside) == Seq(1, 2))
    // rel tol 0.03 -> band 6 -> within
    val rel = DQDatasetRule(DatasetChecks.isAggrEqual("v", 200.0, "sum", relTolerance = 0.03),
      "is_aggr_equal", Seq("v"))
    assert(errs(df, rel).isEmpty)
  }

  test("compare_datasets numeric tolerance suppresses small drifts") {
    val df = Seq((1, 100.0), (2, 200.0)).toDF("id", "v")
    val ref = Seq((1, 100.4), (2, 250.0)).toDF("id", "v")
    val rule = DQDatasetRule(DatasetChecks.compareDatasets(Seq("id"), Seq("id"), ref,
      absTolerance = 1.0), "compare_datasets", Seq("id"))
    assert(errs(df, rule) == Seq(2)) // 0.4 within tol, 50 outside
  }

  test("has_valid_json_schema flags missing NOT NULL fields") {
    val df = Seq(
      (1, """{"a": 1, "b": "x"}"""),
      (2, """{"b": "x"}"""),
      (3, """not json""")
    ).toDF("id", "js")
    val rule = DQRowRule(RowChecks.hasValidJsonSchema(col("js"), "a INT NOT NULL, b STRING"),
      "has_valid_json_schema", Seq("js"))
    assert(errs(df, rule) == Seq(2, 3))
  }

  test("sql_expression: NULL expression value passes in both branches") {
    val df = Seq((1, Some(5)), (2, None), (3, Some(-1))).toDF("id", "v")
    val plain = errs(df, DQRowRule(RowChecks.sqlExpression("v >= 0"), "sql_expression"))
    assert(plain == Seq(3)) // NULL v -> condition NULL -> pass (row 2 clean)
    val negated = errs(df, DQRowRule(RowChecks.sqlExpression("v >= 0", negate = true), "sql_expression"))
    assert(negated == Seq(1)) // fails where TRUE; NULL passes
  }

  test("row checks on backtick-needing column names resolve via quoted retry") {
    val df = Seq((1, Option.empty[String]), (2, Some("x")))
      .toDF("id", "weird name.with dots")
    val out = DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "is_not_null",
        "arguments" -> Map("column" -> "weird name.with dots")))))
    val flagged = out.where(col("_errors").isNotNull).select("id").as[Int].collect().toSeq
    assert(flagged == Seq(1))
    // and it is NOT reported as skipped
    val skipped = out.selectExpr("exists(_errors, x -> x.skipped)").where(col("id") === 1)
      .collect().head.getBoolean(0)
    assert(!skipped)
  }

  test("has_valid_schema after another dataset check ignores engine temp columns") {
    val df = Seq((1, "a"), (1, "a")).toDF("id", "k")
    val out = DQEngine.applyChecks(df, Seq(
      DQDatasetRule(DatasetChecks.isUnique(Seq("id")), "is_unique", Seq("id"),
        criticality = graft.core.Criticality.Warn),
      DQDatasetRule(DatasetChecks.hasValidSchema("id INT, k STRING", strict = true),
        "has_valid_schema")))
    // strict schema check must pass despite the is_unique temp metric column
    assert(out.where(col("_errors").isNotNull).count() == 0)
    assert(out.where(col("_warnings").isNotNull).count() == 2)
  }

  test("checks on DERIVED columns (no plain name) build without stringification") {
    val df = Seq((1, "2024-01-05x"), (2, "oops")).toDF("id", "raw")
    val derived = substring(col("raw"), 1, 10) // not a plain attribute
    val dateRule = DQRowRule(RowChecks.isValidDate(derived), "is_valid_date", Seq("raw"))
    assert(errs(df, dateRule) == Seq(2))
    val jsonDf = Seq((1, """x{"a":1}"""), (2, "xnope")).toDF("id", "raw")
    val jsonRule = DQRowRule(RowChecks.isValidJson(substring(col("raw"), 2, 100)), "is_valid_json", Seq("raw"))
    assert(errs(jsonDf, jsonRule) == Seq(2))
    val lonRule = DQRowRule(RowChecks.isLongitude(col("id") * 100), "is_longitude", Seq("id"))
    assert(errs(df, lonRule) == Seq(2)) // 200 outside +-180, 100 inside
    val caseRule = DQRowRule(RowChecks.hasValidStringCase(concat(lit("A"), col("raw")), "sentence"),
      "has_valid_string_case", Seq("raw"))
    assert(errs(Seq((1, "bc"), (2, "BC")).toDF("id", "raw"), caseRule) == Seq(2))
  }

  test("by-name aggregate fallback works for non-curated functions") {
    val df = Seq((1, "g", 5), (2, "g", 15)).toDF("id", "g", "v")
    // 'sum_distinct' is not in the curated registry -> expr fallback
    val rule = DQDatasetRule(DatasetChecks.isAggrNotGreaterThan(
      "v", 10.0, "sum_distinct", groupBy = Seq("g")), "is_aggr_not_greater_than", Seq("v"))
    assert(errs(df, rule) == Seq(1, 2)) // 20 > 10
  }

  test("time-window checks preserve null-timestamp rows (window() isnotnull trap)") {
    import java.sql.Timestamp
    val df = Seq(
      (1, Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
      (2, Some(Timestamp.valueOf("2024-01-01 00:30:00"))),
      (3, Option.empty[Timestamp]), // window(ts) alone would drop this row
      (4, Some(Timestamp.valueOf("2024-01-01 03:00:00")))
    ).toDF("id", "ts")
    val gaps = DQEngine.applyChecks(df, Seq(DQDatasetRule(
      DatasetChecks.hasNoGapsPerTimeWindow("ts", 60), "has_no_gaps", Seq("ts"))))
    assert(gaps.count() == 4) // all rows preserved
    // rows of the 00:00 bucket fail (next occupied window is 03:00); the
    // null-ts row probes the unoccupied sentinel bucket and passes
    assert(errs(df, DQDatasetRule(
      DatasetChecks.hasNoGapsPerTimeWindow("ts", 60), "has_no_gaps", Seq("ts"))) == Seq(1, 2))
    val outliers = DQEngine.applyChecks(df, Seq(DQDatasetRule(
      DatasetChecks.hasNoAggrOutliers("*", "ts", "count", timeInterval = "60 minutes"),
      "has_no_aggr_outliers", Seq("ts"))))
    assert(outliers.count() == 4)
  }

  test("partitioned ordered window: boundary-exact vs global window, incl. empty partitions") {
    // direct pin of the r12 helper (VERDICT r11 next #2): rolling sum over
    // the previous 3 rows + lead(1), range-partitioned, must equal the
    // single-partition global-window answer for every row — including rows
    // whose frames cross partition boundaries, and with more partitions
    // than rows (empty range partitions must not fabricate boundary nulls)
    val vals = (0 until 100).map(_ * 3 + 1) // distinct, irregular-ish
    val df = vals.toDF("v")
    def expected: Map[Int, (Option[Long], Option[Int])] = {
      val s = vals.sorted
      s.indices.map { i =>
        val frame = s.slice(math.max(0, i - 3), i)
        val sumPrev = if (frame.isEmpty) None else Some(frame.map(_.toLong).sum)
        val nxt = if (i + 1 < s.length) Some(s(i + 1)) else None
        s(i) -> ((sumPrev, nxt))
      }.toMap
    }
    // boundsSampleMod=1 collects every key: exact quantile boundaries, so
    // buckets genuinely split and the cross-boundary repair is exercised
    // (the production default's 1-in-1000 sample would leave a 100-row
    // frame in one bucket — covered by the default-sample cell below)
    for (p <- Seq(1, 4, 7, 137)) { // 137 > rows: most partitions empty
      val out = DatasetChecks.withPartitionedOrderedWindow(df, "v", 3, 1, Some(p),
        boundsSampleMod = 1) { (f, w) =>
        f.withColumn("sp", sum(col("v")).over(w.rowsBetween(-3, -1)))
          .withColumn("nx", lead(col("v"), 1).over(w))
      }.collect().map(r => r.getInt(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.get(2)).map(_.asInstanceOf[Int])))).toMap
      assert(out == expected, s"mismatch at numParts=$p")
    }
    // production default (sampled boundaries): a small frame degrades to
    // fewer effective buckets, never to a wrong answer
    val outDefault = DatasetChecks.withPartitionedOrderedWindow(df, "v", 3, 1, Some(8)) { (f, w) =>
      f.withColumn("sp", sum(col("v")).over(w.rowsBetween(-3, -1)))
        .withColumn("nx", lead(col("v"), 1).over(w))
    }.collect().map(r => r.getInt(0) ->
      ((Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.get(2)).map(_.asInstanceOf[Int])))).toMap
    assert(outDefault == expected, "mismatch under default sampled boundaries")
  }

  test("partitioned ordered window: randomized equivalence vs global window (seeded)") {
    // 12 seeded-random cells over (size, prevRows, nextRows, numParts):
    // rolling sum + count + lead must equal the single-partition global
    // window on every row — the strongest pin on the boundary-repair math
    val rnd = new scala.util.Random(2026)
    for (_ <- 0 until 12) {
      val n = 1 + rnd.nextInt(200)
      val prev = rnd.nextInt(6) // 0..5
      val next = rnd.nextInt(3) // 0..2
      val p = 1 + rnd.nextInt(50)
      // exact (1), partial-sample (3: boundaries from ~a third of the keys
      // — buckets still split AND the sampled path is exercised), and the
      // production default (degenerate single bucket at these sizes)
      val sampleMod = Seq(1, 3, 1000)(rnd.nextInt(3))
      val vals = rnd.shuffle((0 until 1000).toList).take(n) // distinct
      val df = vals.toDF("v")
      def addC(f: org.apache.spark.sql.DataFrame,
               w: org.apache.spark.sql.expressions.WindowSpec) = {
        val fr = f.withColumn("cnt", count(lit(1)).over(w.rowsBetween(-prev, next)))
        if (prev > 0) fr.withColumn("sp", sum(col("v")).over(w.rowsBetween(-prev, -1)))
        else fr.withColumn("sp", lit(null).cast("long"))
      }
      def key(r: org.apache.spark.sql.Row) =
        (r.getInt(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]))
      val got = DatasetChecks.withPartitionedOrderedWindow(df, "v", prev, next, Some(p),
          boundsSampleMod = sampleMod)(addC)
        .collect().map(key).toSet
      val want = addC(df, org.apache.spark.sql.expressions.Window.orderBy(col("v")))
        .collect().map(key).toSet
      assert(got == want, s"mismatch at n=$n prev=$prev next=$next p=$p sampleMod=$sampleMod")
    }
  }

  test("ungrouped gaps/aggr-outliers: parallel ranking, exact answers, no global WindowExec") {
    import java.sql.Timestamp
    // ~290 occupied minute buckets with holes every 37th minute and count
    // bursts every 50th — boundaries fall inside the series at the test
    // session's 4 shuffle partitions
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val minutes = (0 until 300).filterNot(_ % 37 == 0)
    val rows = minutes.flatMap { m =>
      val n = if (m % 50 == 0) 10 else 1
      (0 until n).map(i => (m * 100 + i, new Timestamp(base + m * 60000L)))
    }
    val df = rows.toDF("id", "ts")
    // gaps: bucket m fails iff m+1 unoccupied and m is not the last bucket
    val expectGapBuckets = minutes.filter(m => !minutes.contains(m + 1) && m != minutes.max).toSet
    val gapOut = DQEngine.applyChecks(df, Seq(DQDatasetRule(
      DatasetChecks.hasNoGapsPerTimeWindow("ts", 1), "has_no_gaps", Seq("ts"))))
    val gapBuckets = gapOut.where(col("_errors").isNotNull)
      .select((col("id") / 100).cast("int")).distinct().as[Int].collect().toSet
    assert(gapBuckets == expectGapBuckets)
    // outliers: simulate the rolling band over per-bucket counts
    val counts = minutes.map(m => if (m % 50 == 0) 10.0 else 1.0)
    val lookback = 5; val warmup = 3; val sigma = 3.0
    val expectOutlierBuckets = minutes.indices.filter { i =>
      val frame = counts.slice(math.max(0, i - lookback), i)
      frame.size >= warmup && {
        val mean = frame.sum / frame.size
        val std = math.sqrt(frame.map(c => (c - mean) * (c - mean)).sum / frame.size)
        math.abs(counts(i) - mean) > sigma * std
      }
    }.map(minutes).toSet
    val outOut = DQEngine.applyChecks(df, Seq(DQDatasetRule(
      DatasetChecks.hasNoAggrOutliers("*", "ts", "count", sigma = sigma,
        lookback = lookback, warmup = warmup, timeInterval = "1 minute"),
      "has_no_aggr_outliers", Seq("ts"))))
    val outlierBuckets = outOut.where(col("_errors").isNotNull)
      .select((col("id") / 100).cast("int")).distinct().as[Int].collect().toSet
    assert(outlierBuckets == expectOutlierBuckets)
    assert(expectOutlierBuckets.nonEmpty && expectGapBuckets.nonEmpty) // tests bite
    // the r11 watch item is gone: no Window anywhere in either plan runs
    // with an empty partition spec (the "No Partition Defined" collapse).
    // Logical-plan check: the physical WindowExec hides inside AQE stages,
    // which made the old executedPlan.collect vacuously empty (r14 fix).
    for (out <- Seq(gapOut, outOut)) {
      val windows = out.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
      assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
        "single-partition Window found in ungrouped fine-grain time-bucket check")
    }
    // count-parity protocol: an UNREAD verdict must still prune the whole
    // check subtree. The helper's localCheckpoint hides the bucket
    // aggregate's uniqueness proof behind a LogicalRDD; the helper re-proves
    // it (dropDuplicates on the order key) so the verdict join-back stays
    // eliminable — without this, bare count() paid the full check (caught by
    // the r12 100M countparity cells at 5.9 s vs ~0.1 s)
    for (out <- Seq(gapOut, outOut)) {
      val counted = out.select(count(lit(1)))
      val joins = counted.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      assert(joins.isEmpty, "unread time-bucket verdict did not prune its join-back")
      assert(!counted.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
        "pruned plan still materializes the helper checkpoint")
    }
  }

  test("coarse-grain time-bucket checks take the plain single-task window") {
    // VERDICT r13 next #2: a frame provably below ~640k rows (bounded by
    // horizon/grain, NOT by a data probe) must skip the bucket machinery —
    // one small sorted task instead of bounds aggregate + crossJoin + AQE
    // waves. Fine grains keep the partitioned shape (previous test).
    assert(DatasetChecks.intervalSecondsOf("30 days") == 30L * 86400)
    assert(DatasetChecks.intervalSecondsOf("1 hour 30 minutes") == 5400L)
    assert(DatasetChecks.intervalSecondsOf("2 weeks") == 1209600L)
    assert(DatasetChecks.intervalSecondsOf("garbage") == 0L)
    assert(DatasetChecks.intervalSecondsOf("500 milliseconds") == 0L) // sub-second: stay partitioned
    assert(DatasetChecks.orderedWindowPartsFor(86400L).contains(1))        // day grain: <= 73k buckets
    assert(DatasetChecks.orderedWindowPartsFor(30L * 86400).contains(1))   // 30 days
    assert(DatasetChecks.orderedWindowPartsFor(3600L).isEmpty)             // hour grain: ~1.76M
    assert(DatasetChecks.orderedWindowPartsFor(60L).isEmpty)
    assert(DatasetChecks.orderedWindowPartsFor(0L).isEmpty)
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 100).flatMap { d =>
      val n = if (d == 50) 20 else 1
      (0 until n).map(i => (d * 100 + i, new Timestamp(base + d * 86400000L)))
    }
    val df = rows.toDF("id", "ts")
    // day-50 burst vs a zero-variance rolling band: exactly that bucket fails
    val outOut = DQEngine.applyChecks(df, Seq(DQDatasetRule(
      DatasetChecks.hasNoAggrOutliers("*", "ts", "count", sigma = 3.0,
        lookback = 5, warmup = 3, timeInterval = "1 day"),
      "has_no_aggr_outliers", Seq("ts"))))
    assert(outOut.where(col("_errors").isNotNull).count() == 20)
    // gaps at daily windows: drop day 70 -> day 69 flagged
    val gdf = rows.filterNot(_._1 / 100 == 70).toDF("id", "ts")
    val gapOut = DQEngine.applyChecks(gdf, Seq(DQDatasetRule(
      DatasetChecks.hasNoGapsPerTimeWindow("ts", 1440), "has_no_gaps", Seq("ts"))))
    assert(gapOut.where(col("_errors").isNotNull)
      .select((col("id") / 100).cast("int")).distinct().as[Int].collect().toSet == Set(69))
    for (out <- Seq(outOut, gapOut)) {
      // plain path fired: the one ordered window runs with an EMPTY
      // partition spec and no bucket union/crossJoin exists anywhere
      // (logical plan: the physical WindowExec hides inside AQE stages)
      val windows = out.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
      assert(windows.nonEmpty && windows.forall(_.partitionSpec.isEmpty),
        "coarse grain did not take the plain single-task window")
      val unions = out.queryExecution.optimizedPlan.collect {
        case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }
      assert(unions.isEmpty, "plain path still built the bucket union")
      // unread verdict still prunes the whole subtree (no dropDuplicates
      // re-proof needed: the frame is an Aggregate/Distinct, so the order
      // key's uniqueness propagates naturally)
      val counted = out.select(count(lit(1)))
      val joins = counted.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      assert(joins.isEmpty, "unread coarse-grain verdict did not prune its join-back")
    }
  }

  test("sql_query dataset mode: single-row condition applies to every row") {
    val df = Seq((1, 5), (2, 50), (3, 7)).toDF("id", "v")
    // dataset-level assertion: any v above 40 fails ALL rows
    val rule = DQDatasetRule(DatasetChecks.sqlQuery(
      "SELECT max(v) > 40 AS too_big FROM {{input_view}}",
      conditionColumn = "too_big"), "sql_query", Seq("v"))
    assert(errs(df, rule) == Seq(1, 2, 3))
    val okRule = DQDatasetRule(DatasetChecks.sqlQuery(
      "SELECT max(v) > 100 AS too_big FROM {{input_view}}",
      conditionColumn = "too_big"), "sql_query", Seq("v"))
    assert(errs(df, okRule) == Seq())
    // multi-row result without merge_columns is rejected
    val bad = DQDatasetRule(DatasetChecks.sqlQuery(
      "SELECT v > 0 AS too_big FROM {{input_view}}",
      conditionColumn = "too_big"), "sql_query", Seq("v"))
    assertThrows[IllegalArgumentException] { errs(df, bad) }
  }

  test("sql_query replaces only {{ placeholders }}, never bare identifiers") {
    // ref view name 'tags' also appears as a column name and inside a string
    // literal; both whitespace forms of the placeholder must resolve
    val df = Seq((1, "a"), (2, "b"), (3, "zz")).toDF("id", "tags")
    val ref = Seq("a", "b").toDF("tag")
    val rule = DQDatasetRule(DatasetChecks.sqlQuery(
      """SELECT i.tags AS tags, i.tags NOT IN (SELECT tag FROM {{ tags }}) AND i.tags <> 'tags' AS bad
        |FROM {{input_view}} i""".stripMargin,
      mergeColumns = Seq("tags"), conditionColumn = "bad",
      refDfs = Map("tags" -> ref)), "sql_query", Seq("tags"))
    assert(errs(df, rule) == Seq(3))
  }

  test("round-6 pipeline ops degrade gracefully on empty and degenerate inputs") {
    import graft.pipeline._
    import org.apache.spark.sql.functions.{col, length}
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(empty, "doc_id", "text").count() == 0)
    assert(Dedup.removeDuplicateSpans(empty, "doc_id", "text").count() == 0)
    assert(Curation.packSequences(empty, "doc_id", length(col("text")), 100).count() == 0)
    assert(Curation.sampleByWeights(empty, col("text"), Map("x" -> 0.5), col("doc_id")).count() == 0)
    // single doc: nothing can be corpus-duplicated
    val one = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(one, "doc_id", "text", windowWords = 3).count() == 0)
    // bm25: queries whose terms match nothing return zero rows, not an error
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val q = Seq(("q1", "zeta")).toDF("qid", "qtext")
    assert(Search.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext").count() == 0)
    // null ids are excluded from packing by contract (they have no
    // deterministic group or order)
    val withNull = Seq((Some(1L), "aa"), (None, "bb")).toDF("doc_id", "text")
    val packed = Curation.packSequences(withNull, "doc_id", length(col("text")), 100)
    assert(packed.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    // quality training ignores null labels instead of NPE-ing the decode
    val part = Seq((Some(1.0), "good good"), (None, "ignored")).toDF("label", "text")
    val m = QualityClassifier.train(part, col("text"), col("label"),
      vocabSize = 4, epochs = 1)
    assert(m.weights.keySet.subsetOf(Set("good", "ignored")))
  }
}
