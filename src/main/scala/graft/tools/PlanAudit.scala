package graft.tools

import graft.queries.QueryDefs
import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative operators — the
  * 100 TB-readiness review loop (pushdown, pruning, broadcast, codegen spans).
  * Run: sbt "runMain graft.tools.PlanAudit [queryName ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("row_is_in_range", "ds_is_unique", "ds_foreign_key",
        "ds_is_aggr_not_greater_than", "pipe_dedup_minhash", "pipe_knn_bruteforce",
        "ds_polygons_mutually_disjoint", "pipe_dedup_cosine", "ds_has_no_aggr_outliers",
        "eng_check_metrics", "ds_compare_datasets", "pipe_decontaminate",
        "pipe_curation_quota",
        // round 8 additions
        "pipe_knn_pq", "pipe_token_budget", "pipe_token_budget_groups",
        "pipe_wordpiece_count", "ds_drift_scores", "ds_segment_drift",
        "pipe_curation_pipeline_lsh")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
