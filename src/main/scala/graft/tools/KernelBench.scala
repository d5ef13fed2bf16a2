package graft.tools

import graft.pipeline._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted 1M-doc A/B cells for the r14 tokenizer/bigram/repetition kernel
  * swaps — the PipeBench ops whose map stage tokenizes text. Same corpus
  * generator as PipeBench; run this main on HEAD and on the pre-change
  * commit (worktree) for a like-for-like comparison:
  *   SPARK_GRAFT_PIPE_DOCS=1000000 sbt "runMain graft.tools.KernelBench"
  */
object KernelBench {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.get("SPARK_GRAFT_PIPE_DOCS").map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = PipeBench.corpus(spark, nDocs).localCheckpoint()
    docs.count()
    val evalSet = docs.where(col("doc_id") % 997 === 3)

    val cells = Seq(
      "tokenize_scan" -> (() =>
        docs.agg(sum(size(TextAnalysis.wsTokens(col("text"))))).collect()),
      "repetition_scan" -> (() =>
        docs.agg(sum(TextAnalysis.repetitionSignals(col("text"))
          .getField("dup_3gram_frac"))).collect()),
      "dsir_train_4k" -> (() => { Dsir.train(evalSet, docs, col("text"), features = 4096); () }),
      "lm_train_8k" -> (() => {
        NgramLm.train(docs, col("text"), vocabSize = 8192, maxBigrams = 262144); () }),
      "corpus_stats" -> (() => { TextAnalysis.corpusStats(docs, col("text")).collect(); () }),
      // r15 cells (VERDICT r14 next #4/#3): the r14 quality-signal and
      // langid kernel swaps, plus the r15 c4 kernel — run on HEAD vs the
      // pre-change worktree (be3fa0c for quality/langid, r14 HEAD for c4)
      "quality_signals_scan" -> (() =>
        docs.agg(sum(TextAnalysis.qualitysignals(col("text"))
          .getField("stopword_ratio"))).collect()),
      "langid_scan" -> (() =>
        docs.groupBy(TextAnalysis.languageId(col("text")).as("lang"))
          .count().collect()),
      "c4_scan" -> (() =>
        docs.agg(sum(TextAnalysis.c4Signals(col("text")).getField("n_kept_lines")),
          sum(length(TextAnalysis.c4CleanedText(col("text"))))).collect())
    )
    val out = cells.map { case (name, f) =>
      f() // warmup
      val s = time(f())
      println(f"KB $name%-20s $s%7.2f s")
      name -> s
    }
    val qs = out.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
    println(s"""{"metric":"kernel_bench","n_docs":$nDocs,"ops":$qs}""")
    spark.stop()
  }
}
