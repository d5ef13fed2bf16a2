package graft.tools

import graft.profiler.{Profiler, ProfilerOptions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Writes the `plans/r14/<name>_{before,after}.txt` artifacts for every query
  * this optimization round touched: `explain("formatted")` of the touched
  * computation, with the BEFORE variant reconstructed inline from the
  * pre-change formulation (the original code is in git history at 279e602 /
  * be3fa0c) so both plans come from the same Spark session and fixture.
  *
  * Run: sbt "runMain graft.tools.R14Plans"
  */
object R14Plans {
  private def explainStr(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString("UTF-8")
  }

  private def write(name: String, header: String, df: DataFrame): Unit = {
    val p = java.nio.file.Paths.get("plans/r14", s"$name.txt")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, (header + "\n\n" + explainStr(df))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $p")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.queries.QueryDefs.t(spark, sfDir, "lineitem")
    val docs = graft.queries.QueryDefs.t(spark, sfDir, "documents")

    // ---- prof_summary: the profiler's one-pass aggregation input ----------
    // BEFORE: sampleInput(fraction=1.0) + limit(Int.MaxValue) fed the agg —
    // note the Exchange SinglePartition under GlobalLimit ahead of the
    // partial aggregation (one task does all the work).
    val exact = ProfilerOptions(sampleFraction = 1.0, limit = Int.MaxValue)
    val aggCols = Seq(count(lit(1)).as("n"), count(col("l_quantity")).as("nn"),
      min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"))
    write("prof_summary_before",
      "== prof_summary (profiler aggregation pass) BEFORE ==\n" +
        "sampleInput(df, opts).limit(Int.MaxValue) feeding the stats agg:\n" +
        "Sample(1.0) evaluates an RNG per row; GlobalLimit plans\n" +
        "Exchange SinglePartition — the whole partial aggregation runs as ONE task.",
      Profiler.sampleInput(li, exact).limit(Int.MaxValue)
        .agg(aggCols.head, aggCols.tail: _*))
    write("prof_summary_after",
      "== prof_summary (profiler aggregation pass) AFTER ==\n" +
        "profileInput drops the no-op Sample and GlobalLimit: plain parallel\n" +
        "scan -> partial agg -> single-partition final agg (the 1-row exchange\n" +
        "carries sketch state, not data).",
      Profiler.profileInput(li, exact).agg(aggCols.head, aggCols.tail: _*))

    // ---- pipe_streaming_neardup: the banding projection -------------------
    // The streaming plan itself is per-micro-batch; the projection below is
    // the exact expression set bandDocuments puts in every batch's map stage
    // (captured on a batch frame so explain() can print it).
    import org.apache.spark.sql.GraftColumnBridge
    val hsh = GraftColumnBridge.column(graft.pipeline.HashedShingles(
      GraftColumnBridge.expression(col("text")), 3))
    val bandArr = GraftColumnBridge.column(graft.pipeline.MinHashBands(
      GraftColumnBridge.expression(hsh), 64, 16))
    val hofSignature = array((0 until 64).map { seed =>
      array_min(transform(hsh, h => xxhash64(lit(seed), h)))
    }: _*)
    write("pipe_streaming_neardup_before",
      "== pipe_streaming_neardup (bandDocuments map-stage projection) BEFORE ==\n" +
        "signature = array(array_min(transform(hsh, h => xxhash64(lit(s), h)))\n" +
        "for s <- 0 until 64): 64 higher-order functions, every one\n" +
        "CodegenFallback — NO WholeStageCodegen span covers the projection and\n" +
        "each lambda re-walks the shingle array interpreted (measured ~3 ms/doc\n" +
        "CPU in the micro-batch map task; the task is single-partition because\n" +
        "each MemoryStream batch is one block).",
      docs.select(col("doc_id"), hofSignature.as("signature"),
        posexplode(bandArr).as(Seq("band", "bandhash"))))
    write("pipe_streaming_neardup_after",
      "== pipe_streaming_neardup (bandDocuments map-stage projection) AFTER ==\n" +
        "signature = MinHashSignature(hsh, 64): one codegen'd kernel call,\n" +
        "bit-identical values (SketchCodegenSpec pins it against the HOF\n" +
        "formulation); the whole banding projection is back inside\n" +
        "WholeStageCodegen (~30 us/doc).",
      docs.select(col("doc_id"),
        graft.pipeline.Dedup.minHashSignature(hsh, 64).as("signature"),
        posexplode(bandArr).as(Seq("band", "bandhash"))))

    spark.stop()
  }
}
