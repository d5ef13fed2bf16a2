package graft

import graft.checks._
import org.apache.spark.sql.SparkSession

/** One-shot trainer for the committed pretrained NER artifact
  * (`src/main/resources/graft/ner/pretrained_ner.json`). Deterministic:
  * the corpus is index-arithmetic ([[NerCorpus]]), the RDD partitioning is
  * pinned, and [[PerceptronNer.train]] is deterministic given both — so
  * re-running reproduces the committed weights bit-for-bit.
  *
  * Prints sentence-level precision/recall on three eval buckets (held-out
  * gazetteer names, synthetic out-of-gazetteer names, negatives) for the
  * trained model AND the gazetteer baseline — the numbers COVERAGE.md cites.
  *
  * Usage: `sbt "runMain graft.NerPretrainMain [outPath]"`.
  */
object NerPretrainMain {

  /** Drop features whose weights are all tiny and round the rest: the
    * averaged-perceptron tail of one-off features bloats the JSON without
    * moving any argmax. Threshold/rounding are part of the artifact
    * contract — the eval below runs on the PRUNED model.
    */
  def prune(m: PerceptronNerModel, minAbs: Double = 0.2): PerceptronNerModel =
    PerceptronNerModel(m.weights.flatMap { case (f, wv) =>
      if (wv.exists(w => math.abs(w) >= minAbs))
        Some(f -> wv.map(w => math.rint(w * 100.0) / 100.0))
      else None
    })

  /** Sentence-level detection scoring: predicted entity-type set vs gold. */
  def score(engine: NerEngine, sentences: Seq[NerCorpus.Sentence]): (Double, Double) = {
    var tp = 0; var fp = 0; var fn = 0
    sentences.foreach { s =>
      val pred = engine.detect(s.text).toSet
        .intersect(Set("PERSON", "ORG", "LOC")) // score only the BIO types
      val gold = s.entityTypes
      tp += pred.intersect(gold).size
      fp += pred.diff(gold).size
      fn += gold.diff(pred).size
    }
    val p = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    val r = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    (p, r)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/main/resources/graft/ner/pretrained_ner.json")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("ner-pretrain")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val train = NerCorpus.trainingSentences()
    // pinned partitioning: repartition by a stable key would shuffle rows
    // non-deterministically; parallelize keeps list order -> same slices
    val df = spark.sparkContext.parallelize(
      train.map(s => (s.tokens, s.tags)), 8).toDF("tokens", "tags")
    val t0 = System.nanoTime()
    val raw = PerceptronNer.train(df, df("tokens"), df("tags"), epochs = 15)
    val model = prune(raw)
    println(f"trained on ${train.length} sentences in ${(System.nanoTime() - t0) / 1e9}%.1fs; " +
      s"features ${raw.weights.size} -> pruned ${model.weights.size}")

    val eng = new PerceptronNerEngine(model)
    val gaz = new GazetteerNerEngine()
    def report(name: String, ss: Seq[NerCorpus.Sentence]): Unit = {
      val (p, r) = score(eng, ss)
      val (gp, gr) = score(gaz, ss)
      println(f"$name%-22s model P=$p%.3f R=$r%.3f | gazetteer P=$gp%.3f R=$gr%.3f (n=${ss.length})")
    }
    report("held-out-gazetteer", NerCorpus.heldOutSentences())
    report("synthetic-names", NerCorpus.syntheticPersonSentences())
    report("negatives", NerCorpus.negativeEvalSentences)
    if (args.contains("--debug")) {
      (NerCorpus.negativeEvalSentences ++ NerCorpus.heldOutSentences()).foreach { s =>
        val pred = eng.detect(s.text).toSet.intersect(Set("PERSON", "ORG", "LOC"))
        if (pred != s.entityTypes)
          println(s"MISS [${s.entityTypes.mkString(",")}] pred=[${pred.mkString(",")}] :: ${s.text}")
      }
    }

    val json = PerceptronNerModelJson.render(model)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote ${json.length} bytes to $out")
    spark.stop()
  }
}
