package graft.tools

import graft.BenchRef
import graft.checks.DatasetChecks
import graft.engine.DQEngine
import graft.rules._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness for plan-shape experiments on the slow BASELINE.md suites.
  * Not part of the driver contract; run ad hoc:
  *   SPARK_GRAFT_BENCH_ROWS=100000000 sbt "runMain graft.tools.PerfLab"
  */
object PerfLab {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.get("SPARK_GRAFT_BENCH_ROWS").map(_.toLong).getOrElse(100000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("PERFLAB_LOCAL_DIR", "/tmp"))
      .config("spark.shuffle.compress", sys.env.getOrElse("PERFLAB_SHUFFLE_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress", sys.env.getOrElse("PERFLAB_SHUFFLE_COMPRESS", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("PERFLAB_ADVISORY", "64m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime(); f
      val s1 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); f
      val s2 = (System.nanoTime() - t1) / 1e9
      println(f"LAB $name%-40s ${(s1 + s2) / 2}%8.3f s")
    }

    val df = BenchRef.generatedDf(spark, rows)
    val ref = BenchRef.refDf(spark, rows)
    df.count(); ref.count() // IO/codegen warmup

    val which = args.headOption.getOrElse("all")

    val doExplain = sys.env.get("PERFLAB_EXPLAIN").contains("1")

    if (which == "all" || which == "cmp") {
      val cmp = DQEngine.applyChecks(df, Seq(DQDatasetRule(
        DatasetChecks.compareDatasets(Seq("col1", "col2"), Seq("ref_col1", "ref_col2"), ref),
        "compare_datasets", Seq("col1", "col2"), criticality = graft.core.Criticality.Warn)))
      if (doExplain) cmp.groupBy().count().explain("formatted")
      time("compare_datasets current")(cmp.count())
      // raw join variants: what does the count-measured shape cost?
      val l = df.select(col("col1"), col("col2"))
      val r = ref.select(col("ref_col1"), col("ref_col2"))
      def nsCond = (col("col1") <=> col("ref_col1")) && (col("col2") <=> col("ref_col2"))
      time("cmp floor: nullsafe SMJ")(l.join(r, nsCond, "left_outer").count())
      time("cmp floor: nullsafe SHJ hint")(
        l.join(r.hint("shuffle_hash"), nsCond, "left_outer").count())
      time("cmp floor: struct-key SHJ hint")(
        l.withColumn("__k", struct(col("col1"), col("col2")))
          .join(r.withColumn("__rk", struct(col("ref_col1"), col("ref_col2"))).hint("shuffle_hash"),
            col("__k") === col("__rk"), "left_outer").count())
    }

    if (which == "all" || which == "d9") {
      val aggrOutliers = DQEngine.applyChecks(df, Seq(DQDatasetRule(
        DatasetChecks.hasNoAggrOutliers("*", "col6", "count", sigma = 6.0, timeInterval = "30 days"),
        "has_no_aggr_outliers", Seq.empty)))
      if (doExplain) aggrOutliers.groupBy().count().explain("formatted")
      time("has_no_aggr_outliers current")(aggrOutliers.count())
      // cost floor: the bucketed aggregation alone
      val agg = df.groupBy(window(col("col6"), "30 days").getField("start")).count()
      time("d9 floor: bucketed agg only")(agg.count())
      // cost of one bare scan of the generated frame
      time("d9 floor: probe scan only")(df.select(col("col6")).count())

      // variant: sentinel-coalesced ts, materialized grain, plain === join
      def d9Variant(useBroadcast: Boolean): org.apache.spark.sql.DataFrame = {
        val ts = coalesce(col("col6"), lit("1900-01-01 00:00:00").cast("timestamp"))
        val grain = window(ts, "30 days").getField("start")
        val withGrain = df.withColumn("__grain", grain)
        val bucketed = withGrain.groupBy(col("__grain")).agg(count(lit(1)).as("__cur"))
        val wPrev = org.apache.spark.sql.expressions.Window
          .orderBy(col("__grain")).rowsBetween(-10, -1)
        val stats = bucketed
          .withColumn("__mean", avg(col("__cur")).over(wPrev))
          .withColumn("__std", stddev_pop(col("__cur")).over(wPrev))
          .withColumn("__n", count(col("__cur")).over(wPrev))
          .withColumn("__outlier", col("__n") >= 3 && col("__std").isNotNull &&
            abs(col("__cur") - col("__mean")) > lit(6.0) * col("__std"))
        val flags = stats.select(col("__grain").as("__grain_f"), col("__outlier"))
        val b = if (useBroadcast) broadcast(flags) else flags
        withGrain.join(b, col("__grain") === col("__grain_f"), "left").drop("__grain_f")
      }
      time("d9 sentinel === broadcast")(d9Variant(true).count())
      time("d9 sentinel === no-hint")(d9Variant(false).count())
      // how much of 'current' is just the null-safe probe? same join, <=> keys
      val ts2 = col("col6")
      val wg2 = df.withColumn("__grain", window(ts2, "30 days").getField("start"))
      val flags2 = wg2.select(col("__grain").as("__grain_f")).distinct()
      time("d9 nullsafe join only")(
        wg2.join(broadcast(flags2), col("__grain") <=> col("__grain_f"), "left").count())
      time("d9 equality join only")(
        wg2.join(broadcast(flags2), col("__grain") === col("__grain_f"), "left").count())
    }
    if (which == "all" || which == "sqlq") {
      val idf = BenchRef.intDf(spark, rows)
      idf.count()
      val rules = (1 to 5).map(i => DQDatasetRule(
        DatasetChecks.sqlQuery(
          "SELECT col2, SUM(col1) > 1 AS condition FROM {{input_view}} GROUP BY col2",
          mergeColumns = Seq("col2"), conditionColumn = "condition", negate = true),
        "sql_query", Seq(s"col$i"), criticality = graft.core.Criticality.Warn))
      val suite = DQEngine.applyChecks(idf, rules)
      if (doExplain) suite.groupBy().count().explain("formatted")
      time("foreach_sql_query current")(suite.count())
      // floor: ONE aggregation + ONE null-safe join-back
      val one = DQEngine.applyChecks(idf, rules.take(1))
      time("single sql_query current")(one.count())
      // floor: the user aggregation alone
      time("sqlq floor: agg only")(
        idf.groupBy(col("col2")).agg((sum(col("col1")) > 1).as("condition")).count())
      // variant: struct-key grouping + plain === join-back — null-safe via
      // struct comparison semantics, and the join key IS the aggregate's
      // grouping attribute (provably unique -> join eliminable under count)
      def structVariant(): org.apache.spark.sql.DataFrame = {
        val q = idf.groupBy(struct(col("col2")).as("__k"))
          .agg((sum(col("col1")) > 1).as("__cond"))
        idf.withColumn("__lk", struct(col("col2")))
          .join(q, col("__lk") === col("__k"), "left")
          .drop("__k", "__lk")
      }
      if (doExplain) structVariant().groupBy().count().explain("formatted")
      time("sqlq struct === join-back")(structVariant().count())
      // struct null-equality semantics probe
      import spark.implicits._
      val probe = Seq((Option.empty[Int], Option.empty[Int]), (Some(1), Some(1)), (Some(1), Option.empty[Int]))
        .toDF("a", "b")
        .select(col("a"), col("b"), (struct(col("a")) === struct(col("b"))).as("eq"))
      probe.show()
    }
    if (which == "rowprof") {
      // per-check honest cost of the all-row-checks suite: which checks pay
      // for the 10M-row scan under the result-reading action?
      val wholeSuite = BenchRef.allRowChecks(df)
      // fixture floor: force-compute EVERY generated column, no checks — the
      // part of the suite cost that is the synthetic data, not the engine
      time("fixture floor (all columns forced)")(
        df.where(xxhash64(df.columns.filterNot(_ == "col7").map(col) :+
          map_keys(col("col7")): _*) === 0).count())
      time("all_row_checks (whole suite)")(BenchRef.touch(wholeSuite))
      time("all_row_checks bare count")(wholeSuite.count())
      val R = graft.checks.RowChecks
      val singles: Seq[(String, DQRowRule)] = Seq(
        "is_not_null" -> DQRowRule(R.isNotNull(col("col1")), "is_not_null", Seq("col1")),
        "is_in_list_97" -> DQRowRule(R.isInList(col("col3"), (0 until 97).map(_.asInstanceOf[Any])), "is_in_list", Seq("col3")),
        "is_not_null_and_not_empty" -> DQRowRule(R.isNotNullAndNotEmpty(col("col2")), "x", Seq("col2")),
        "sql_expression" -> DQRowRule(R.sqlExpression("col2 >= 0"), "sql_expression"),
        "is_older_than_n_days" -> DQRowRule(R.isOlderThanNDays(col("col5"), 0, Some(lit("2026-01-01").cast("date"))), "x", Seq("col5")),
        "is_valid_date" -> DQRowRule(R.isValidDate(col("col5").cast("string")), "x", Seq("col5")),
        "is_valid_timestamp" -> DQRowRule(R.isValidTimestamp(col("col6").cast("string")), "x", Seq("col6")),
        "is_valid_ipv4" -> DQRowRule(R.isValidIpv4Address(col("col_ipv4")), "x", Seq("col_ipv4")),
        "is_valid_ipv6" -> DQRowRule(graft.checks.NetChecks.isValidIpv6Address(col("col_ipv6")), "x", Seq("col_ipv6")),
        "ipv4_in_cidr" -> DQRowRule(graft.checks.NetChecks.isIpv4AddressInCidr(col("col_ipv4"), "10.0.0.0/8"), "x", Seq("col_ipv4")),
        "is_valid_json" -> DQRowRule(R.isValidJson(col("col_json_str")), "x", Seq("col_json_str")),
        "has_json_keys" -> DQRowRule(R.hasJsonKeys(col("col_json_str"), Seq("key1", "key2")), "x", Seq("col_json_str")),
        "regex_match" -> DQRowRule(R.regexMatch(col("col_json_str"), "^\\{.*\\}$"), "x", Seq("col_json_str")),
        "geo_is_point" -> DQRowRule(graft.checks.GeoChecks.isPoint(col("col_geo_point")), "x", Seq("col_geo_point")),
        "geo_not_null_island" -> DQRowRule(graft.checks.GeoChecks.isNotNullIsland(col("col_geo_point")), "x", Seq("col_geo_point")))
      singles.foreach { case (name, rule) =>
        time(s"single $name")(BenchRef.touch(DQEngine.applyChecks(df, Seq(rule))))
      }
    }
    spark.stop()
  }
}
