package graft

import graft.queries.QueryDefs._
import org.apache.spark.sql.functions._

/** Regression corners found by the correctness gate. */
class ScratchSpec extends SparkSpec {
  val dir = "/root/testdata/sf0.01"

  test("events loader normalizes ts (NANOS-as-long or MICROS-as-NTZ) to timestamp") {
    val ev = t(spark, dir, "events")
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(ev.count() == 10000)
    assert(ev.select(max(col("ts"))).collect().head.getTimestamp(0) != null)
  }

  test("compare_datasets emits no false changed-flags on untouched keys") {
    val out = SparkEntry.queries("ds_compare_datasets")(spark, dir)
    // untouched keys: not %50, %70, %90 -> absent from output
    val spurious = out.where(col("o_orderkey") % 50 =!= 0 &&
      col("o_orderkey") % 70 =!= 0 && col("o_orderkey") % 90 =!= 0 &&
      col("o_orderkey") < 5000000).count()
    assert(spurious == 0)
  }

  test("has_no_aggr_outliers runs on events") {
    val n = SparkEntry.queries("ds_has_no_aggr_outliers")(spark, dir).count()
    assert(n >= 0)
  }
}
