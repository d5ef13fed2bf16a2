package graft

import graft.pipeline.QualityClassifier
import graft.pipeline.QualityModel
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val goodWords = Seq("informative", "detailed", "thorough", "clear", "sourced")
  private val badWords = Seq("spam", "click", "buy", "casino", "winner")
  private val fill = Seq("the", "a", "report", "page", "text")

  /** Deterministic corpus: doc i mixes 6 class words + 4 shared filler words. */
  private def doc(i: Int, words: Seq[String]): String =
    ((0 until 6).map(j => words((i * 3 + j) % words.size)) ++
      (0 until 4).map(j => fill((i + j) % fill.size))).mkString(" ")

  test("train learns a separating model on planted good/bad vocab") {
    val rows = (0 until 200).map(i => (doc(i, goodWords), 1.0)) ++
      (0 until 200).map(i => (doc(i, badWords), 0.0))
    val df = rows.toDF("text", "label")
    val model = QualityClassifier.train(df, col("text"), col("label"),
      vocabSize = 64, epochs = 40, lr = 2.0)
    // class words must get opposite-signed weights; filler stays near zero
    goodWords.foreach(w => assert(model.weights.getOrElse(w, 0.0) > 0, s"good '$w'"))
    badWords.foreach(w => assert(model.weights.getOrElse(w, 0.0) < 0, s"bad '$w'"))
    // held-out docs (different index range) classify correctly
    val heldOut = (500 until 560).map(i => (doc(i, goodWords), 1.0)) ++
      (500 until 560).map(i => (doc(i, badWords), 0.0))
    val scored = QualityClassifier.score(heldOut.toDF("text", "label"),
      col("text"), model)
      .select(col("label"), col("quality_score")).as[(Double, Double)].collect()
    val acc = scored.count { case (y, p) => (p >= 0.5) == (y == 1.0) }.toDouble / scored.length
    assert(acc >= 0.95, s"held-out accuracy $acc")
  }

  test("scoreColumn matches the closed-form kernel and handles edge docs") {
    val model = QualityModel(-0.1, Map("spark" -> 2.0, "slow" -> -1.5))
    val out = QualityClassifier.score(
      Seq((1L, "spark spark slow"), (2L, "unknown words only"), (3L, ""), (4L, null))
        .toDF("id", "text"), col("text"), model)
      .select("id", "quality_score").as[(Long, Option[Double])].collect().toMap
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    assert(math.abs(out(1L).get - sig(-0.1 + (2.0 + 2.0 - 1.5) / 3)) < 1e-12)
    assert(math.abs(out(2L).get - sig(-0.1)) < 1e-12) // all-unknown -> bias only
    assert(math.abs(out(3L).get - sig(-0.1)) < 1e-12) // empty -> bias only
    assert(out(4L).isEmpty) // null text -> null score
  }

  test("filterByQuality keeps rows at or above the threshold") {
    val model = QualityModel(0.0, Map("good" -> 4.0, "bad" -> -4.0))
    val df = Seq((1L, "good good good"), (2L, "bad bad bad")).toDF("id", "text")
    val kept = QualityClassifier.filterByQuality(df, col("text"), model, 0.5)
      .select("id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("train rejects streaming input") {
    val stream = spark.readStream.format("rate").load()
      .selectExpr("CAST(value AS STRING) AS text", "CAST(0.0 AS DOUBLE) AS label")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.train(stream, col("text"), col("label"))
    }
    assert(e.getMessage.contains("batch-only"))
  }
}
