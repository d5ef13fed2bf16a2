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

    // ---- pipe_dsir_train: the raw-corpus bigram pass --------------------
    val hofTokens = filter(split(lower(coalesce(col("text"), lit(""))), " "), t => t =!= "")
    val hofBigrams = when(size(hofTokens) >= 2,
      transform(sequence(lit(1), size(hofTokens) - 1),
        i => concat_ws(" ", element_at(hofTokens, i), element_at(hofTokens, i + 1))))
      .otherwise(array().cast("array<string>"))
    write("pipe_dsir_train_before",
      "== pipe_dsir_train (raw-corpus bigram explode) BEFORE ==\n" +
        "bigramFeatures = transform(sequence(...), i => concat_ws(element_at,\n" +
        "element_at)) over wsTokens = filter(split(lower(...))) — three stacked\n" +
        "CodegenFallback HOFs; the count agg's map stage ran interpreted\n" +
        "(~5 us/bigram; 5.2 s single-task CPU at sf0.1, 55.7 s at 1M docs).",
      docs.select(explode(hofBigrams).as("__f"))
        .groupBy("__f").agg(count(lit(1)).as("__c")))
    write("pipe_dsir_train_after",
      "== pipe_dsir_train (raw-corpus bigram explode) AFTER ==\n" +
        "WordBigrams(WsTokens(text)) — both codegen'd kernels, byte-identical\n" +
        "output (SketchCodegenSpec); whole map stage in one WholeStageCodegen\n" +
        "span (0.9 s at sf0.1, 15.3 s at 1M docs — the remaining cost is the\n" +
        "bigram count shuffle itself).",
      docs.select(explode(graft.pipeline.Dsir.bigramFeatures(col("text"))).as("__f"))
        .groupBy("__f").agg(count(lit(1)).as("__c")))

    // ---- pipe_text_repetition: the Gopher repetition signals ------------
    val t = split(col("text"), " ")
    def dupFrac(arr: org.apache.spark.sql.Column) =
      when(size(arr) > 0,
        lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr))
        .otherwise(lit(0.0))
    val topWordFrac = when(size(t) > 0,
      array_max(transform(array_distinct(t), w => size(filter(t, x => x === w))))
        .cast("double") / size(t)).otherwise(lit(0.0))
    write("pipe_text_repetition_before",
      "== pipe_text_repetition (repetitionSignals projection) BEFORE ==\n" +
        "top_word_frac = array_max(transform(array_distinct(t), w =>\n" +
        "size(filter(t, _ === w)))) — O(distinct x tokens) interpreted lambda\n" +
        "evals per document (quadratic on long docs; 42.9 s scan at 1M docs).",
      docs.select(struct(
        dupFrac(t).as("dup_word_frac"), topWordFrac.as("top_word_frac"),
        dupFrac(graft.pipeline.TextAnalysis.wordNgrams(col("text"), 2)).as("dup_2gram_frac"),
        dupFrac(graft.pipeline.TextAnalysis.wordNgrams(col("text"), 3)).as("dup_3gram_frac"))
        .as("r")))
    write("pipe_text_repetition_after",
      "== pipe_text_repetition (repetitionSignals projection) AFTER ==\n" +
        "RepetitionStats kernel: all four signals in ONE linear pass per doc\n" +
        "(hash-map word counts, n-gram sets), codegen'd; value parity pinned\n" +
        "in TextQualitySpec (0.91 s scan at 1M docs — 47x).",
      docs.select(graft.pipeline.TextAnalysis.repetitionSignals(col("text")).as("r")))

    spark.stop()
  }
}
