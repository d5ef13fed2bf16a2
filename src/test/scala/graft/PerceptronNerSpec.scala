package graft

import graft.checks._
import org.apache.spark.sql.functions._

/** Trainable averaged-perceptron NER behind the NerEngine seam. */
class PerceptronNerSpec extends SparkSpec {
  import spark.implicits._

  // gazetteer names plus a few out-of-list ones: with the list-membership
  // features (r9) a corpus whose persons are ALL in the lists teaches
  // "absent from every list" as ORG evidence, which would defeat the
  // shape+context generalization this spec pins
  private val givens = Vector("james", "mary", "robert", "patricia", "john",
    "jennifer", "michael", "linda", "david", "elizabeth", "william", "barbara",
    "richard", "susan", "joseph", "jessica", "thomas", "sarah", "charles", "karen",
    "branwel", "fyntor", "gorveth", "jaspen", "kelmar", "lorvus", "mirteth",
    "nolqa", "pralio", "selben")
  private val surs = Vector("smith", "johnson", "williams", "brown", "jones",
    "garcia", "miller", "davis", "rodriguez", "martinez", "wilson", "anderson",
    "taylor", "moore", "jackson", "martin", "lee", "perez", "thompson", "white",
    "dornwick", "fennholt", "greshmere", "ostrand", "pembwell", "caldby",
    "elmstrand", "haleton", "irvmere", "kestwick")
  private val orgs = Vector("acme", "globex", "initech", "umbrella", "stark",
    "wayne", "cyberdyne", "tyrell", "wonka", "oscorp")
  private val suffixes = Vector("Corp", "Inc", "Ltd", "Group")
  private val cities = Vector("london", "paris", "berlin", "tokyo", "madrid",
    "rome", "oslo", "dublin", "vienna", "prague")

  private def cap(s: String) = s.capitalize

  /** Deterministic synthetic labeled sentences (tokens, BIO tags). */
  private def corpus(seed: Int, n: Int): Seq[(Seq[String], Seq[String])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      def person = (Seq(cap(givens(rnd.nextInt(givens.size))),
        cap(surs(rnd.nextInt(surs.size)))), Seq("B-PERSON", "I-PERSON"))
      def org = (Seq(cap(orgs(rnd.nextInt(orgs.size))),
        suffixes(rnd.nextInt(suffixes.size))), Seq("B-ORG", "I-ORG"))
      def loc = (Seq(cap(cities(rnd.nextInt(cities.size)))), Seq("B-LOC"))
      rnd.nextInt(6) match {
        case 0 =>
          val (p, pt) = person; val (l, lt) = loc
          (Seq("yesterday") ++ p ++ Seq("flew", "to") ++ l ++ Seq("."),
            Seq("O") ++ pt ++ Seq("O", "O") ++ lt ++ Seq("O"))
        case 1 =>
          val (p, pt) = person; val (o, ot) = org
          (p ++ Seq("joined") ++ o ++ Seq("last", "spring", "."),
            pt ++ Seq("O") ++ ot ++ Seq("O", "O", "O"))
        case 2 =>
          val (o, ot) = org; val (l, lt) = loc
          (o ++ Seq("opened", "an", "office", "in") ++ l ++ Seq("."),
            ot ++ Seq("O", "O", "O", "O") ++ lt ++ Seq("O"))
        case 3 =>
          val (p, pt) = person
          (Seq("please", "contact") ++ p ++ Seq("for", "details", "."),
            Seq("O", "O") ++ pt ++ Seq("O", "O", "O"))
        case 4 =>
          val (l, lt) = loc; val (o, ot) = org
          (Seq("the", "meeting", "in") ++ l ++ Seq("was", "hosted", "by") ++ o ++ Seq("."),
            Seq("O", "O", "O") ++ lt ++ Seq("O", "O", "O") ++ ot ++ Seq("O"))
        case _ =>
          (Seq("revenue", "grew", "while", "costs", "fell", "."),
            Seq("O", "O", "O", "O", "O", "O"))
      }
    }
  }

  private lazy val model: PerceptronNerModel = {
    val train = corpus(seed = 11, n = 400)
    PerceptronNer.train(train.toDF("toks", "tags").repartition(4),
      col("toks"), col("tags"), epochs = 12)
  }

  test("held-out token accuracy and entity-type detection on unseen sentences") {
    val eval = corpus(seed = 97, n = 150) // same templates, unseen combinations
    var good = 0L
    var total = 0L
    eval.foreach { case (toks, gold) =>
      val pred = PerceptronNer.decode(model, toks.toArray)
      total += toks.length
      good += pred.zip(gold).count { case (a, b) => a == b }
    }
    val acc = good.toDouble / total
    assert(acc >= 0.95, s"token accuracy $acc")
    // entity-type detection through the engine
    val engine = new PerceptronNerEngine(model)
    var typeHits = 0
    eval.foreach { case (toks, gold) =>
      val want = gold.collect { case t if t != "O" => t.substring(2) }.distinct.toSet
      val got = engine.detect(toks.mkString(" ")).toSet
      if (got == want) typeHits += 1
    }
    assert(typeHits >= (eval.size * 0.9).toInt, s"$typeHits / ${eval.size}")
  }

  test("generalizes to entity WORDS never seen in training (shape + context)") {
    val m = model
    // unseen names/places: the model must lean on cap-shape and context cues
    val toks = "yesterday Zorblat Quixby flew to Zanzibar .".split(" ")
    val pred = PerceptronNer.decode(m, toks)
    assert(pred(1).endsWith("PERSON") && pred(2).endsWith("PERSON"), pred.toSeq)
    assert(pred(5).endsWith("LOC"), pred.toSeq)
  }

  test("training is deterministic for a fixed input partitioning") {
    val train = corpus(seed = 11, n = 120)
    val df = train.toDF("toks", "tags").repartition(3)
    val m1 = PerceptronNer.train(df, col("toks"), col("tags"), epochs = 3)
    val m2 = PerceptronNer.train(df, col("toks"), col("tags"), epochs = 3)
    val eval = corpus(seed = 5, n = 40)
    eval.foreach { case (toks, _) =>
      assert(PerceptronNer.decode(m1, toks.toArray).toSeq ==
        PerceptronNer.decode(m2, toks.toArray).toSeq)
    }
  }

  test("NerDetect column integration: model engine flags PII rows in-plan") {
    val engine = new PerceptronNerEngine(model)
    import org.apache.spark.sql.GraftColumnBridge
    val df = Seq(
      (1L, "please contact Mary Garcia for details ."),
      (2L, "revenue grew while costs fell ."),
      (3L, "Acme Corp opened an office in Oslo ."))
      .toDF("id", "text")
      .select(col("id"), GraftColumnBridge.column(
        NerDetect(GraftColumnBridge.expression(col("text")), engine)).as("ents"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(got(1L) == Set("PERSON"), got)
    assert(got(2L).isEmpty, got)
    assert(got(3L) == Set("ORG", "LOC"), got)
  }

  test("model-as-data: JSON round trip is exact; file load wires the metadata path") {
    // trained weights survive render -> parse bit-for-bit
    val rt = PerceptronNerModelJson.parse(PerceptronNerModelJson.render(model))
    assert(rt.weights.keySet == model.weights.keySet)
    model.weights.foreach { case (f, wv) => assert(rt.weights(f).toSeq == wv.toSeq) }
    corpus(seed = 8, n = 30).foreach { case (toks, _) =>
      assert(PerceptronNer.decode(rt, toks.toArray).toSeq ==
        PerceptronNer.decode(model, toks.toArray).toSeq)
    }
    // tag-set and arity validation fail loudly
    intercept[IllegalArgumentException] {
      PerceptronNerModelJson.parse("""{"tags":["O","B-X"],"weights":{}}""")
    }
    intercept[IllegalArgumentException] {
      PerceptronNerModelJson.parse(
        """{"tags":["O","B-PERSON","I-PERSON","B-ORG","I-ORG","B-LOC","I-LOC"],
          |"weights":{"w=a":[1.0]}}""".stripMargin)
    }
    // save -> metadata path via ner_model_location
    val path = java.nio.file.Files.createTempDirectory("graft_ner").resolve("ner.json")
    PerceptronNerModelJson.save(spark, path.toUri.toString, model)
    val df = Seq(
      (1, "please contact Mary Garcia for details ."),
      (2, "revenue grew while costs fell .")).toDF("id", "text")
    val out = graft.engine.DQEngine.applyChecksByMetadata(df, Seq(Map(
      "criticality" -> "error",
      "check" -> Map("function" -> "does_not_contain_pii", "arguments" -> Map(
        "column" -> "text", "ner_model_location" -> path.toUri.toString)))))
    val flagged = out.where(col("_errors").isNotNull).select("id").as[Int].collect().toSet
    assert(flagged == Set(1))
  }

  test("train validates input: misaligned rows and unknown tags fail fast") {
    intercept[Exception] {
      PerceptronNer.train(Seq((Seq("a", "b"), Seq("O"))).toDF("toks", "tags"),
        col("toks"), col("tags"), epochs = 1)
    }
    intercept[Exception] {
      PerceptronNer.train(Seq((Seq("a"), Seq("B-THING"))).toDF("toks", "tags"),
        col("toks"), col("tags"), epochs = 1)
    }
    intercept[IllegalArgumentException] {
      PerceptronNer.train(Seq.empty[(Seq[String], Seq[String])].toDF("toks", "tags"),
        col("toks"), col("tags"), epochs = 1)
    }
  }
}
