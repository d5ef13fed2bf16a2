package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  // raw: bigrams "a b"x2, "b a"x1, "c d"x1 (total 4); features=2 keeps
  // "a b"(2) then the count-1 tie breaks ascending -> "b a"; rawOov=1.
  // target "a b c": "a b" in vocab (1), "b c" -> OOV (1); total 2.
  private def tinyModel: DsirModel = {
    val raw = Seq((1L, "a b a b"), (2L, "c d")).toDF("id", "text")
    val target = Seq((1L, "a b c")).toDF("id", "text")
    Dsir.train(target, raw, col("text"), features = 2, k = 1.0)
  }

  test("train: cap tie-break, OOV accounting, totals") {
    val m = tinyModel
    assert(m.rawCounts == Map("a b" -> 2L, "b a" -> 1L))
    assert(m.rawOov == 1L && m.rawTotal == 4L)
    assert(m.targetCounts == Map("a b" -> 1L))
    assert(m.targetOov == 1L && m.targetTotal == 2L)
  }

  test("score: closed-form log importance, null below two tokens") {
    val m = tinyModel
    // td = 2 + 1*(2+1) = 5, rd = 4 + 3 = 7
    val out = Dsir.score(
      Seq((1L, "a b"), (2L, "x y"), (3L, "a"), (4L, null.asInstanceOf[String]))
        .toDF("id", "text"), col("text"), m)
      .select("id", "dsir_log_importance").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // "a b": ln(2/5) - ln(3/7)
    assert(math.abs(out(1L).get - (math.log(2.0 / 5) - math.log(3.0 / 7))) < 1e-12)
    // OOV bigram: ln(2/5) - ln(2/7)
    assert(math.abs(out(2L).get - (math.log(2.0 / 5) - math.log(2.0 / 7))) < 1e-12)
    assert(out(3L).isEmpty && out(4L).isEmpty)
  }

  test("score prefers target-like docs") {
    val raw = Seq.tabulate(50)(i => (i.toLong, s"common filler words number $i here"))
      .toDF("id", "text")
      .union(Seq((100L, "rust borrow checker"), (101L, "rust borrow checker")).toDF("id", "text"))
    val target = Seq((1L, "rust borrow checker lifetimes")).toDF("id", "text")
    val m = Dsir.train(target, raw, col("text"), features = 64, k = 1.0)
    val s = Dsir.score(raw, col("text"), m)
      .select("id", "dsir_log_importance").as[(Long, Double)].collect().toMap
    assert(s(100L) > s(5L))
  }

  test("resample: deterministic, temperature guard, null scores drop") {
    val m = tinyModel
    val docs = Seq.tabulate(200)(i => (i.toLong, if (i % 7 == 0) "a b" else "x y"))
      .toDF("id", "text")
    val scored = Dsir.score(docs, col("text"), m)
    def kept = Dsir.resample(scored, col("id"), col("dsir_log_importance"), 0.5)
      .select("id").as[Long].collect().toSet
    val k1 = kept
    assert(k1 == kept) // same draw every run
    assert(k1.nonEmpty && k1.size < 200) // threshold actually splits
    val nullScore = Dsir.resample(
      Dsir.score(Seq((9L, "solo")).toDF("id", "text"), col("text"), m),
      col("id"), col("dsir_log_importance"), -100.0)
    assert(nullScore.count() == 0) // no evidence, no draw
    intercept[IllegalArgumentException] {
      Dsir.resample(scored, col("id"), col("dsir_log_importance"), 0.0, temperature = 0.0)
    }
    // string ids would hash to NULL and silently drop every row — fail fast
    intercept[IllegalArgumentException] {
      Dsir.resample(Seq(("u-1", 0.5)).toDF("sid", "sc"), col("sid"), col("sc"), 0.0)
    }
  }

  test("model JSON round-trip and SQL surface parity") {
    val m = tinyModel
    assert(DsirModelJson.parse(DsirModelJson.render(m)) == m)
    Seq((1L, "a b"), (2L, "x y"), (3L, "a")).toDF("id", "text")
      .createOrReplaceTempView("dsirv")
    val js = DsirModelJson.render(m)
    val rows = spark.sql(
      s"""SELECT id, graft_dsir_score(text, '$js') AS s FROM dsirv ORDER BY id""").collect()
    assert(math.abs(rows(0).getDouble(1) - (math.log(2.0 / 5) - math.log(3.0 / 7))) < 1e-12)
    assert(math.abs(rows(1).getDouble(1) - (math.log(2.0 / 5) - math.log(2.0 / 7))) < 1e-12)
    assert(rows(2).isNullAt(1))
  }

  test("curation-pipeline steps: filter_perplexity and dsir_resample dispatch") {
    val m = tinyModel
    val docs = Seq.tabulate(100)(i => (i.toLong, if (i % 5 == 0) "a b" else "x y"))
      .toDF("doc_id", "text")
    val direct = Dsir.resample(Dsir.score(docs, col("text"), m),
      col("doc_id"), col("dsir_log_importance"), 0.5)
      .select("doc_id").as[Long].collect().toSet
    val piped = CurationPipeline(docs, Seq(Map(
      "step" -> "dsir_resample", "model_json" -> DsirModelJson.render(m),
      "threshold" -> 0.5)))
      .select("doc_id").as[Long].collect().toSet
    assert(piped == direct && piped.nonEmpty)
    val lm = LmModel(0.5, Map("a" -> 10L, "b" -> 5L, LmModel.Unk -> 5L),
      Map(LmModel.key("a", "b") -> 4L))
    val expect = NgramLm.filterByPerplexity(docs, col("text"), lm, 10.0)
      .select("doc_id").as[Long].collect().toSet
    val lmPiped = CurationPipeline(docs, Seq(Map(
      "step" -> "filter_perplexity", "model_json" -> LmModelJson.render(lm),
      "max_perplexity" -> 10.0)))
      .select("doc_id").as[Long].collect().toSet
    assert(lmPiped == expect)
    intercept[IllegalArgumentException] {
      CurationPipeline(docs, Seq(Map("step" -> "dsir_resample", "threshold" -> 0.5)))
    }
  }

  test("train guards: empty raw corpus, bad params") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val t = Seq((1L, "a b")).toDF("id", "text")
    intercept[IllegalArgumentException] { Dsir.train(t, empty, col("text")) }
    intercept[IllegalArgumentException] { Dsir.train(t, t, col("text"), features = 0) }
    intercept[IllegalArgumentException] { Dsir.train(t, t, col("text"), k = 0.0) }
  }
}
