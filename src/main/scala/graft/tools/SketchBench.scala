package graft.tools

import graft.pipeline._
import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.functions._

/** Before/after micro-bench for the round-5 sketch codegen work: the old
  * higher-order-function sketch formulation (CodegenFallback territory —
  * `transform(shingles(text), xxhash64)`) vs the fused codegen'd kernels
  * ([[HashedShingles]], [[MinHashBandsExplode]], [[HyperplaneBuckets]]).
  * The generator "before" is approximated by running the SAME plan with
  * whole-stage codegen disabled — exactly the state a CodegenFallback
  * generator forced on the stage.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.SketchBench
  */
object SketchBench {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def best2(f: => Unit): Double = { f; math.min(time(f), time(f)) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    docs.count() // warm IO

    def fusedShingles = GraftColumnBridge.column(
      HashedShingles(GraftColumnBridge.expression(col("text")), 3))
    def hofShingles = array_distinct(
      transform(Dedup.shingles(col("text"), 3), s => xxhash64(s)))
    def banded(sh: org.apache.spark.sql.Column) = docs.select(
      GraftColumnBridge.column(MinHashBandsExplode(
        GraftColumnBridge.expression(sh), 128, 32)).as(Seq("b", "h")))
      .agg(sum(pmod(col("h"), lit(1000000)))).collect() // pmod: ANSI sum of raw hashes overflows
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
    emb.count()
    def buckets() = emb.select(explode(GraftColumnBridge.column(HyperplaneBuckets(
      GraftColumnBridge.expression(col("v")), 20, 8, 64, 42L))).as("b"))
      .agg(sum(pmod(col("b"), lit(1000000)))).collect()

    def codegenOff[A](f: => A): A = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try f finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }

    val results = Seq(
      "shingle_hash_hof_before" ->
        best2(docs.select(sum(size(hofShingles))).collect()),
      "shingle_hash_fused_after" ->
        best2(docs.select(sum(size(fusedShingles))).collect()),
      "minhash_bands_nocodegen_before" -> codegenOff(best2(banded(fusedShingles))),
      "minhash_bands_codegen_after" -> best2(banded(fusedShingles)),
      "minhash_full_old_shape" -> codegenOff(best2(banded(hofShingles))),
      "minhash_full_new_shape" -> best2(banded(fusedShingles)),
      "hyperplane_nocodegen_before" -> codegenOff(best2(buckets())),
      "hyperplane_codegen_after" -> best2(buckets()))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"sketch_bench","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
