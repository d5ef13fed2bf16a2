package graft

import graft.checks._
import org.apache.spark.sql.functions._

/** The COMMITTED pretrained NER artifact (graft/ner/pretrained_ner.json):
  * quality gates on the exact resource the library ships, plus the
  * DefaultNerEngine fallback contract and its registry wiring. If a
  * retrained artifact regresses any bucket, this spec fails the build.
  */
class PretrainedNerSpec extends SparkSpec {
  import spark.implicits._

  test("committed model meets the documented quality bars on all three buckets") {
    val eng = PretrainedNer.engine
    val gaz = new GazetteerNerEngine()
    // held-out gazetteer names (never in the training half)
    val (hp, hr) = NerPretrainMain.score(eng, NerCorpus.heldOutSentences())
    assert(hp >= 0.97 && hr >= 0.97, s"held-out P=$hp R=$hr")
    // synthetic out-of-gazetteer names: the generalization delta the
    // gazetteer cannot have by construction
    val synth = NerCorpus.syntheticPersonSentences()
    val (sp, sr) = NerPretrainMain.score(eng, synth)
    val (_, gazR) = NerPretrainMain.score(gaz, synth)
    assert(sp >= 0.9 && sr >= 0.7, s"synthetic P=$sp R=$sr")
    assert(gazR == 0.0, s"gazetteer recall on out-of-list names should be 0, got $gazR")
    // negatives: no false entities on capitalized business prose
    val (np, _) = NerPretrainMain.score(eng, NerCorpus.negativeEvalSentences)
    assert(np == 1.0, s"negatives P=$np")
  }

  test("model artifact is bounded and loads once") {
    val in = getClass.getResourceAsStream(PretrainedNer.ResourcePath)
    assert(in != null)
    val bytes = try Iterator.continually(in.read()).takeWhile(_ >= 0).size finally in.close()
    assert(bytes < 1000000, s"artifact grew to $bytes bytes — prune harder")
    assert(PretrainedNer.model.weights.nonEmpty)
    assert(PretrainedNer.engine eq PretrainedNer.engine) // lazy singleton
  }

  test("DefaultNerEngine: gazetteer answers first, pretrained fills the misses") {
    val eng = new DefaultNerEngine()
    // gazetteer hit (list name + honorific) short-circuits
    assert(eng.detect("Dear Alice , thank you for your letter .").contains("PERSON"))
    // out-of-gazetteer name: gazetteer finds nothing, perceptron does
    val synthetic = "Please contact Quina Ashford about the invoice ."
    assert(new GazetteerNerEngine().detect(synthetic).isEmpty)
    assert(eng.detect(synthetic).contains("PERSON"))
    // clean prose stays clean through both layers
    assert(eng.detect("The warehouse inventory was counted twice .").isEmpty)
    assert(eng.detect(null).isEmpty && eng.detect("").isEmpty)
  }

  test("registry default: does_not_contain_pii runs NER out of the box; use_ner:false opts out") {
    val df = Seq(
      (1, "Please contact Quina Ashford about the invoice ."), // synthetic name
      (2, "revenue grew while costs fell"),
      (3, "mail me at a@b.com")).toDF("id", "text")
    def flagged(args: Map[String, Any]): Set[Int] =
      graft.engine.DQEngine.applyChecksByMetadata(df, Seq(Map(
        "criticality" -> "error",
        "check" -> Map("function" -> "does_not_contain_pii",
          "arguments" -> (Map("column" -> "text") ++ args)))))
        .where(col("_errors").isNotNull).select("id").as[Int].collect().toSet
    assert(flagged(Map.empty) == Set(1, 3)) // NER default-on catches row 1
    assert(flagged(Map("use_ner" -> false)) == Set(3)) // regex-only
  }
}
