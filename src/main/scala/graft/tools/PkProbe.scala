package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes prof_pk_candidates' cost: which aggregate in the one-pass PK
  * agg burns the CPU (exact counts vs approx_count_distinct at each rsd).
  * Run: sbt "runMain graft.tools.PkProbe"
  */
object PkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = graft.queries.QueryDefs.t(spark, sfDir, "orders")
    orders.count()

    def time(name: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"PK $name%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus")
    time("counts only") {
      val cs = count(lit(1)) +: cols.map(c => count(col(c)))
      orders.agg(cs.head, cs.tail: _*).collect()
    }
    time("1x acd rsd=0.01") {
      orders.agg(approx_count_distinct(col("o_orderkey"), 0.01)).collect()
    }
    time("3x acd rsd=0.01") {
      orders.agg(approx_count_distinct(col(cols.head), 0.01),
        cols.tail.map(c => approx_count_distinct(col(c), 0.01)): _*).collect()
    }
    time("3x acd rsd=0.05 (default)") {
      orders.agg(approx_count_distinct(col(cols.head), 0.05),
        cols.tail.map(c => approx_count_distinct(col(c), 0.05)): _*).collect()
    }
    time("1x acd rsd=0.01 on 100 rows") {
      orders.limit(100).agg(approx_count_distinct(col("o_orderkey"), 0.01)).collect()
    }
    time("1x acd rsd=0.02") {
      orders.agg(approx_count_distinct(col("o_orderkey"), 0.02)).collect()
    }
    time("1x acd rsd=0.01 single partition") {
      orders.coalesce(1).agg(approx_count_distinct(col("o_orderkey"), 0.01)).collect()
    }
    time("1x acd rsd=0.01, wholeStage codegen OFF") {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try orders.agg(approx_count_distinct(col("o_orderkey"), 0.01)).collect()
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    time("full pk agg (counts + 3x acd 0.01)") {
      val aggs = count(lit(1)).as("__n") +:
        cols.flatMap(c => Seq(count(col(c)).as(s"__nn_$c"),
          approx_count_distinct(col(c), 0.01).as(s"__d_$c")))
      orders.agg(aggs.head, aggs.tail: _*).collect()
    }
    spark.stop()
  }
}
