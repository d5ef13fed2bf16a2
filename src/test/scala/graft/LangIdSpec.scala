package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

/** Trainable char-n-gram NB language ID: gram generation, exact train
  * counts with the cap boundary, hand-computed scores, tie-break,
  * generalization, determinism, JSON, codegen.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("charGrams: sliding case-folded windows, short-text floor") {
    val g = Seq("AbCd").toDF("t")
      .select(LangId.charGrams(col("t"), 3)).head().getSeq[String](0)
    assert(g == Seq("abc", "bcd"))
    val short = Seq("ab").toDF("t")
      .select(LangId.charGrams(col("t"), 3)).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("train: exact counts, priors off the marker row, deterministic cap") {
    val docs = Seq(
      (1L, "aaabc", "en"), (2L, "aaabc", "en"), (3L, "aaabc", "en"),
      (4L, "bbbad", "de"), (5L, "bbbad", "de")).toDF("id", "text", "lang")
    val m = LangId.train(docs, col("text"), col("lang"), n = 3, vocabPerLang = 2)
    assert(m.docCounts == Map("en" -> 3L, "de" -> 2L))
    // en grams per doc: aaa, aab, abc (all count 3); cap 2 keeps (count desc,
    // gram asc) -> aaa, aab. de: bbb, bba, bad -> bad, bba kept.
    assert(m.gramCounts("en") == Map("aaa" -> 3L, "aab" -> 3L))
    assert(m.gramCounts("de") == Map("bad" -> 2L, "bba" -> 2L))
    val again = LangId.train(docs, col("text"), col("lang"), n = 3, vocabPerLang = 2)
    assert(again == m)
  }

  test("score: hand-computed NB arithmetic, OOV unk mass, shared vocabulary") {
    val m = LangIdModel(3, Map("en" -> 50L, "de" -> 50L),
      Map("en" -> Map("aaa" -> 3L), "de" -> Map("bbb" -> 4L)))
    def score(t: String, lang: String): Double =
      Seq(t).toDF("t").select(LangId.scoreColumn(col("t"), m, lang)).head().getDouble(0)
    // en: total=3, SHARED V = |{aaa, bbb}| = 2, denom=ln(6); "aaaa" -> aaa,aaa
    val exp = math.log(0.5) + 2 * (math.log(4.0) - math.log(6.0))
    assert(math.abs(score("aaaa", "en") - exp) < 1e-12)
    // OOV gram scores the unk mass ln(1/(total+V+1))
    assert(math.abs(score("zzz", "en") - (math.log(0.5) - math.log(6.0))) < 1e-12)
    // no grams (short text) -> prior only
    assert(math.abs(score("a", "de") - math.log(0.5)) < 1e-12)
  }

  test("a language with doc counts but no gram table cannot dominate") {
    // per-language smoothing would give 'xx' unk = ln(1/1) = 0 and every
    // prediction would flip to it; shared-V smoothing keeps it penalized
    val m = LangIdModel(3, Map("en" -> 1L, "xx" -> 1L),
      Map("en" -> Map("aaa" -> 10L)))
    val out = Seq("aaaaaa").toDF("t")
      .select(LangId.predictColumn(col("t"), m)).head().getString(0)
    assert(out == "en")
  }

  test("astral text scores identical grams at train and predict time") {
    // one doc whose only word is two astral letters + 'ab' (4 code points,
    // 6 UTF-16 units) — a UTF-16-sliding kernel would produce 4 lone-
    // surrogate grams that miss the trained table entirely
    val s = "𝐀𝐁ab"
    val docs = Seq((s, "xx")).toDF("text", "lang")
    val m = LangId.train(docs, col("text"), col("lang"), n = 3, vocabPerLang = 10)
    // train (code-point substr) produced exactly 2 grams of 3 code points
    assert(m.gramCounts("xx").size == 2)
    assert(m.gramCounts("xx").keySet.forall(g => g.codePointCount(0, g.length) == 3))
    // kernel must reproduce both grams -> score = 2 * (ln(1+1) - ln(2+2+1))
    val score = Seq(s).toDF("t")
      .select(LangId.scoreColumn(col("t"), m, "xx")).head().getDouble(0)
    val exp = 2 * (math.log(2.0) - math.log(5.0)) // prior = ln(1/1) = 0
    assert(math.abs(score - exp) < 1e-12, s"$score vs $exp")
  }

  test("predict: argmax with first-sorted-label ties") {
    val m = LangIdModel(3, Map("en" -> 50L, "de" -> 50L),
      Map("en" -> Map("aaa" -> 10L, "aab" -> 5L), "de" -> Map("bbb" -> 10L)))
    val out = Seq((1L, "aaab"), (2L, "bbbb"), (3L, "x")).toDF("id", "t")
      .select(col("id"), LangId.predictColumn(col("t"), m).as("lang"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    // 'x' has no grams -> equal priors -> tie -> first sorted label ('de')
    assert(out == Seq("en", "de", "de"))
  }

  test("end-to-end: trains on labeled prose and generalizes") {
    val en = Seq("the quick brown fox jumps over the lazy dog",
      "a dog and a fox were friends in the wood")
    val de = Seq("der schnelle braune fuchs springt über den faulen hund",
      "ein hund und ein fuchs waren freunde im wald")
    val docs = (en.map((_, "en")) ++ de.map((_, "de"))).toDF("text", "lang")
    val m = LangId.train(docs, col("text"), col("lang"), n = 3)
    val preds = Seq((1L, "the dog jumps over the fox"),
      (2L, "der hund springt über den fuchs")).toDF("id", "t")
      .select(col("id"), LangId.predictColumn(col("t"), m).as("lang"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(preds == Seq("en", "de"))
    val kept = LangId.filterByLanguage(
      Seq((1L, "the dog and the fox"), (2L, "der hund im wald")).toDF("id", "t"),
      col("t"), m, Seq("en")).select("id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("train rejects streaming input, empty corpora, unknown score lang") {
    val stream = spark.readStream.format("rate").load()
      .selectExpr("CAST(value AS STRING) AS text", "'en' AS lang")
    val e = intercept[IllegalArgumentException] {
      LangId.train(stream, col("text"), col("lang"))
    }
    assert(e.getMessage.contains("batch-only"))
    intercept[IllegalArgumentException] {
      LangId.train(Seq.empty[(String, String)].toDF("text", "lang"),
        col("text"), col("lang"))
    }
    val m = LangIdModel(3, Map("en" -> 1L), Map("en" -> Map("abc" -> 1L)))
    intercept[IllegalArgumentException] {
      LangId.scoreColumn(col("t"), m, "xx")
    }
  }

  test("model JSON round-trips") {
    val m = LangIdModel(2, Map("en" -> 3L), Map("en" -> Map("th" -> 5L, "he" -> 4L)))
    assert(LangIdModelJson.parse(LangIdModelJson.render(m)) == m)
  }

  test("langid expressions stay inside whole-stage codegen") {
    val m = LangIdModel(3, Map("en" -> 50L, "de" -> 50L),
      Map("en" -> Map("aaa" -> 10L), "de" -> Map("bbb" -> 10L)))
    val df = spark.range(4)
      .select(concat(lit("aaa"), col("id")).as("t"))
      .select(LangId.predictColumn(col("t"), m).as("lang"),
        LangId.scoreColumn(col("t"), m, "en").as("s"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(df.head().getString(0) == "en")
  }
}
