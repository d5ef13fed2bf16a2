package graft

import graft.checks.PiiChecks
import graft.engine.DQEngine
import graft.rules.DQRowRule
import org.apache.spark.sql.functions._

/** Checksum-validated PII entities (Luhn cards, IBAN mod-97) + regex set. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def entities(text: String, which: Seq[String]): Seq[String] = {
    val df = Seq(Tuple1(text)).toDF("t")
    df.select(PiiChecks.detectedEntities(col("t"), which).as("e"))
      .as[Seq[String]].collect().head
  }

  test("Luhn-validated credit cards: valid numbers flagged, invalid shapes not") {
    val luhn = Seq("CREDIT_CARD_LUHN")
    assert(entities("card 4539 1488 0343 6467 on file", luhn) == Seq("CREDIT_CARD_LUHN"))
    assert(entities("card 4539-1488-0343-6467", luhn) == Seq("CREDIT_CARD_LUHN"))
    assert(entities("order id 4539 1488 0343 6468", luhn).isEmpty) // fails Luhn
    assert(entities("phone 555 123 4567", luhn).isEmpty) // too short
    // bare shape regex would flag both; the Luhn variant only the real one
    assert(entities("order id 4539 1488 0343 6468", Seq("CREDIT_CARD")) == Seq("CREDIT_CARD"))
  }

  test("IBAN mod-97: valid IBANs flagged, near-misses not") {
    assert(entities("pay to GB82 WEST 1234 5698 7654 32 today", Seq("IBAN")) == Seq("IBAN"))
    assert(entities("pay to DE89370400440532013000", Seq("IBAN")) == Seq("IBAN"))
    assert(entities("pay to GB82WEST12345698765433", Seq("IBAN")).isEmpty) // bad check digits
    assert(entities("Customer#000000001 contact here", Seq("IBAN")).isEmpty)
  }

  test("MAC and URL entities") {
    assert(entities("host at 00:1B:44:11:3A:B7 up", Seq("MAC_ADDRESS")) == Seq("MAC_ADDRESS"))
    assert(entities("see https://example.com/x?y=1", Seq("URL")) == Seq("URL"))
    assert(entities("no pii here", Seq("MAC_ADDRESS", "URL")).isEmpty)
  }

  test("does_not_contain_pii reports the detected entity set") {
    val df = Seq((1, "email a@b.co and card 4539 1488 0343 6467"), (2, "clean")).toDF("id", "t")
    val out = DQEngine.applyChecks(df, Seq(DQRowRule(
      PiiChecks.doesNotContainPii(col("t")), "does_not_contain_pii", Seq("t"))))
    val msg = out.where(col("id") === 1).selectExpr("_errors[0].message").as[String].collect().head
    assert(msg.contains("EMAIL_ADDRESS") && msg.contains("CREDIT_CARD_LUHN"))
    assert(out.where(col("id") === 2 && col("_errors").isNotNull).count() == 0)
  }

  test("redactPii replaces entities with placeholders in redaction order") {
    val df = Seq(
      (1, "mail a.user@site.org from 192.168.0.7 ssn 123-45-6789"),
      (2, "clean text stays untouched")
    ).toDF("id", "t")
    val got = df.select(col("id"), PiiChecks.redactPii(col("t"),
      Seq("EMAIL_ADDRESS", "IP_ADDRESS", "US_SSN")).as("r"))
      .as[(Int, String)].collect().toMap
    assert(got(1) == "mail [EMAIL_ADDRESS] from [IP_ADDRESS] ssn [US_SSN]")
    assert(got(2) == "clean text stays untouched")
  }

  test("redactPii default entity set covers urls, macs, cards and phones") {
    val s0 = "see http://ex.com/a 00:1B:44:11:3A:B7 4539 1488 0343 6467 call (555) 123-4567"
    val got = Seq((1, s0)).toDF("id", "t")
      .select(PiiChecks.redactPii(col("t"))).as[String].head()
    assert(got == "see [URL] [MAC_ADDRESS] [CREDIT_CARD] call [PHONE_NUMBER]")
  }

  test("redactPii covers oddly-grouped and Amex-length cards plus IBANs") {
    // 15-digit Luhn-valid Amex and a 16-digit card in 8-8 grouping both fall
    // outside the 4-4-4-4 detection shape but must not survive redaction
    val got = Seq(
      (1, "amex 378282246310005 ok"),
      (2, "odd 45391488 03436467 ok"),
      (3, "iban DE89 3704 0044 0532 0130 00 ok"),
      (4, "short 1234 5678 stays")
    ).toDF("id", "t")
      .select(col("id"), PiiChecks.redactPii(col("t")).as("r"))
      .as[(Int, String)].collect().toMap
    assert(got(1) == "amex [CREDIT_CARD] ok")
    assert(got(2) == "odd [CREDIT_CARD] ok")
    assert(got(3) == "iban [IBAN] ok")
    assert(got(4) == "short 1234 5678 stays")
  }

  test("NER plug-in seam: a model-class engine drops into does_not_contain_pii") {
    val df = Seq(
      (1, "meeting with alice johnson tomorrow"),
      (2, "email a@b.co from bob smith"),
      (3, "no names, no pii")
    ).toDF("id", "t")
    // Scala-API path: toy dictionary NER next to the regex registry
    val out = DQEngine.applyChecks(df, Seq(DQRowRule(
      PiiChecks.doesNotContainPii(col("t"), ner = Some(new ToyPersonNer)),
      "does_not_contain_pii", Seq("t"))))
    val msgs = out.selectExpr("id", "coalesce(_errors[0].message, 'pass') AS m")
      .as[(Int, String)].collect().toMap
    assert(msgs(1).contains("PERSON") && !msgs(1).contains("EMAIL"))
    assert(msgs(2).contains("EMAIL_ADDRESS") && msgs(2).contains("PERSON"))
    assert(msgs(3) == "pass")
    // codegen: the engine rides as a reference object, projection stays fused
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)

    // metadata path: FQCN with a no-arg constructor, same convention as
    // custom CheckProviders
    val yaml =
      s"""- criticality: error
         |  check:
         |    function: does_not_contain_pii
         |    arguments:
         |      column: t
         |      ner_engine_class: graft.ToyPersonNer
         |""".stripMargin
    val metaOut = DQEngine.applyChecksByMetadataYaml(df, yaml)
    val metaMsgs = metaOut.selectExpr("id", "coalesce(_errors[0].message, 'pass') AS m")
      .as[(Int, String)].collect().toMap
    assert(metaMsgs(1).contains("PERSON") && metaMsgs(3) == "pass")
  }

  test("GazetteerNerEngine: precision/recall on planted entities") {
    val eng = new graft.checks.GazetteerNerEngine()
    val positives = Seq(
      "I met James Wilson at the conference",
      "Dear Alice, thank you for your letter",
      "Mr Thompson will see you now",
      "Please contact Sarah Johnson about the invoice",
      "Sincerely, Robert Brown",
      "The report was signed Maria Garcia yesterday",
      "Dr Patel reviewed the results",
      "Ask Jennifer about the schedule",
      "Karen Martinez approved the request",
      "His name is David Lee",
      "The email came from Linda Nguyen this morning",
      "Thomas Wright arrived late")
    val negatives = Seq(
      "the quick brown fox jumps over the lazy dog",
      "April showers bring flowers in May",
      "New York City is large",
      "The United Nations met on Tuesday",
      "Monday was a holiday in March",
      "Acme Corporation reported quarterly results",
      "the smith hammered the metal all day",
      "Green Street is closed for repairs",
      "We visited Washington last year",
      "Jordan River flows south",
      "Thomas the engine pulled coaches",
      "Deep Learning Models Scale Well")
    val missed = positives.filterNot(p => eng.detect(p).contains("PERSON"))
    val falsePos = negatives.filter(n => eng.detect(n).contains("PERSON"))
    // recall >= 11/12 on planted persons, zero false positives on the traps
    assert(missed.size <= 1, s"missed: $missed")
    assert(falsePos.isEmpty, s"false positives: $falsePos")
    // ADDRESS shape
    assert(eng.detect("Ship to 742 Evergreen Terrace before noon").contains("ADDRESS"))
    assert(eng.detect("Offices at 1600 Pennsylvania Avenue are closed").contains("ADDRESS"))
    assert(!eng.detect("He ran 5 Miles Yesterday").contains("ADDRESS"))
    assert(eng.detect(null) == Seq.empty && eng.detect("") == Seq.empty)
    // FQCN wiring contract: zero-arg constructor reachable
    val viaFqcn = Class.forName("graft.checks.GazetteerNerEngine")
      .getDeclaredConstructor().newInstance().asInstanceOf[graft.checks.NerEngine]
    assert(viaFqcn.detect("Dear Alice, hello").contains("PERSON"))
  }

  test("GazetteerNerEngine: ORG and LOC detection (cased)") {
    val eng = new graft.checks.GazetteerNerEngine()
    val orgPos = Seq(
      "Meeting at Acme Corp today",
      "She joined Vertex Technologies last spring",
      "The grant came from the Ford Foundation",
      "Stanford University published the study",
      "Shares of Globex Corporation fell sharply")
    val orgNeg = Seq(
      "The group met at noon",
      "Many Plans Succeed Eventually",
      "the quick brown fox jumps over the lazy dog")
    assert(orgPos.forall(p => eng.detect(p).contains("ORG")),
      s"missed ORG: ${orgPos.filterNot(p => eng.detect(p).contains("ORG"))}")
    assert(!orgNeg.exists(n => eng.detect(n).contains("ORG")),
      s"false ORG: ${orgNeg.filter(n => eng.detect(n).contains("ORG"))}")
    val locPos = Seq(
      "Flights from New York depart hourly",
      "They moved to Paris in June",
      "Texas has wide roads",
      "He was born in South Korea",
      "The shipment cleared customs in Hong Kong",
      "New York City is large") // place phrase inside a LONGER cap span
    val locNeg = Seq(
      "The capital city is very large",
      "the quick brown fox jumps over the lazy dog",
      "Sort Keys Before Merging")
    assert(locPos.forall(p => eng.detect(p).contains("LOC")),
      s"missed LOC: ${locPos.filterNot(p => eng.detect(p).contains("LOC"))}")
    assert(!locNeg.exists(n => eng.detect(n).contains("LOC")),
      s"false LOC: ${locNeg.filter(n => eng.detect(n).contains("LOC"))}")
  }

  test("GazetteerNerEngine: uncased fallback recall + precision") {
    val eng = new graft.checks.GazetteerNerEngine()
    // all-lowercase text: the capitalized-span pass finds nothing; the
    // fallback pass must still recall strong-evidence entities
    val personPos = Seq(
      "contact james smith asap",
      "mr patel will call this afternoon",
      "the memo was signed by maria garcia",
      "dr thompson reviewed the chart")
    val orgPos = Seq(
      "she works at acme corp now",
      "he joined vertex technologies in march",
      "the grant was funded by the knight foundation",
      // 3+-token org names: the cue window anchors at the span START (the
      // pre-fix suffix-anchored window silently capped names at two tokens)
      "works at acme global data systems",
      "employed by northern lights research group since june")
    val locPos = Seq(
      "we met in paris last summer",
      "flights from new york to berlin are cheap",
      "the package was shipped to south korea")
    assert(personPos.forall(p => eng.detect(p).contains("PERSON")),
      s"missed uncased PERSON: ${personPos.filterNot(p => eng.detect(p).contains("PERSON"))}")
    assert(orgPos.forall(p => eng.detect(p).contains("ORG")),
      s"missed uncased ORG: ${orgPos.filterNot(p => eng.detect(p).contains("ORG"))}")
    assert(locPos.forall(p => eng.detect(p).contains("LOC")),
      s"missed uncased LOC: ${locPos.filterNot(p => eng.detect(p).contains("LOC"))}")
    // precision traps: gazetteer words WITHOUT the stronger uncased evidence
    val clean = Seq(
      "sort the table by key and merge the group",   // org suffix, no cue
      "james likes apples",                          // given name, no surname/honorific
      "we should meet at noon",                      // loc preposition, no place
      "turkey sandwiches are tasty",                 // place word, no preposition
      "the quick brown fox jumps over the lazy dog")
    val dirty = clean.filter(c => eng.detect(c).nonEmpty)
    assert(dirty.isEmpty, s"uncased false positives: ${dirty.map(c => c -> eng.detect(c))}")
  }
}

/** Toy Presidio-stand-in: dictionary person-name matcher. Proves the
  * [[graft.checks.NerEngine]] seam carries a model-class engine end to end
  * (Scala API + FQCN metadata path). A real engine swaps the dictionary for
  * a model; the contract is identical.
  */
class ToyPersonNer extends graft.checks.NerEngine {
  private val names = Set("alice johnson", "bob smith", "carol white")
  override def detect(text: String): Seq[String] = {
    val t = text.toLowerCase
    if (names.exists(t.contains)) Seq("PERSON") else Seq.empty
  }
}
