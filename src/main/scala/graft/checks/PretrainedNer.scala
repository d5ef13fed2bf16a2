package graft.checks

/** The committed pretrained [[PerceptronNerModel]] — the OSS analog of the
  * reference shipping Presidio's trained models out of the box
  * (pii/pii_detection_funcs.py:33): `does_not_contain_pii` name detection
  * works without the user training or wiring anything.
  *
  * The artifact lives on the classpath
  * (`graft/ner/pretrained_ner.json`), is ~regenerable bit-for-bit with
  * `sbt "runMain graft.NerPretrainMain"` (deterministic corpus, fixed
  * partitioning), and loads once per JVM.
  */
object PretrainedNer {
  val ResourcePath = "/graft/ner/pretrained_ner.json"

  lazy val model: PerceptronNerModel = {
    val in = getClass.getResourceAsStream(ResourcePath)
    require(in != null, s"pretrained NER resource $ResourcePath missing from classpath")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    PerceptronNerModelJson.parse(json)
  }

  lazy val engine: PerceptronNerEngine = new PerceptronNerEngine(model)
}

/** Default NER engine for `does_not_contain_pii` when the user wires neither
  * `ner_model_location` nor `ner_engine_class`: the high-precision gazetteer
  * answers first; only when it finds NOTHING does the pretrained perceptron
  * weigh in — so gazetteer hits keep their precision and the trained model
  * adds recall on names outside the public lists (the bucket where a
  * gazetteer scores zero by construction). Stateless per-call dispatch;
  * thread-safe; rides codegen as a reference object like every NerEngine.
  */
final class DefaultNerEngine extends NerEngine {
  private val gazetteer = new GazetteerNerEngine()
  override def detect(text: String): Seq[String] = {
    val g = gazetteer.detect(text)
    if (g.nonEmpty) g else PretrainedNer.engine.detect(text)
  }
}
