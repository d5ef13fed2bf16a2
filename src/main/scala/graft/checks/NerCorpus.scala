package graft.checks

/** Deterministic synthetic BIO-labeled corpus for pretraining the
  * [[PerceptronNer]] shipped with the library (the reference ships
  * Presidio's pretrained models, pii/pii_detection_funcs.py:33; the OSS
  * analog trains its own small model from PUBLIC gazetteers — the same
  * most-common-name / country / city lists [[GazetteerNerEngine]] uses —
  * expanded through sentence templates).
  *
  * Three disjoint name pools make the evaluation honest:
  *  - TRAIN names (even indices of the sorted gazetteer lists) appear in
  *    training sentences;
  *  - HELD-OUT names (odd indices) never appear in training — recall on
  *    them measures generalization to unseen-but-real names;
  *  - SYNTHETIC names (generated syllable combinations, filtered against
  *    every gazetteer list) measure pure context/shape generalization —
  *    the bucket where a gazetteer scores near zero by construction.
  *
  * Everything is index-arithmetic deterministic: no RNG, so the committed
  * model artifact is exactly reproducible by re-running
  * [[graft.NerPretrainMain]].
  */
object NerCorpus {

  /** One labeled token. */
  final case class Tok(w: String, tag: String)
  /** One labeled sentence: aligned tokens and BIO tags. */
  final case class Sentence(tokens: Vector[String], tags: Vector[String]) {
    def text: String = tokens.mkString(" ")
    /** Entity types present (e.g. Set("PERSON")). */
    def entityTypes: Set[String] =
      tags.collect { case t if t != "O" => t.substring(2) }.toSet
  }

  // ------------------------------------------------------------- name pools

  private def half[A](v: Vector[A], even: Boolean): Vector[A] =
    v.zipWithIndex.collect { case (a, i) if (i % 2 == 0) == even => a }
  private def cap(s: String): String =
    s.split(" ").map(w => w.head.toUpper + w.tail).mkString(" ")

  val trainGiven: Vector[String] = half(GazetteerNerEngine.givenNameList, even = true).map(cap)
  val heldGiven: Vector[String] = half(GazetteerNerEngine.givenNameList, even = false).map(cap)
  val trainSur: Vector[String] = half(GazetteerNerEngine.surnameList, even = true).map(cap)
  val heldSur: Vector[String] = half(GazetteerNerEngine.surnameList, even = false).map(cap)
  val trainPlace: Vector[String] = half(GazetteerNerEngine.placeList, even = true).map(cap)
  val heldPlace: Vector[String] = half(GazetteerNerEngine.placeList, even = false).map(cap)

  /** Org names = base word + legal suffix ("Vertex Corp"). Bases are common
    * English words (not trademarks); the suffix carries the ORG signal, the
    * split teaches the model the SHAPE rather than the base identity.
    */
  private val orgBases: Vector[String] = Vector(
    "Acme", "Apex", "Aurora", "Beacon", "Cascade", "Citadel", "Crescent",
    "Harbor", "Juniper", "Latitude", "Meridian", "Nimbus", "Obsidian",
    "Pinnacle", "Quantum", "Sterling", "Summit", "Vertex", "Zenith", "Orchid",
    "Falcon", "Granite", "Horizon", "Ivory", "Keystone", "Lantern", "Mosaic",
    "Nectar", "Onyx", "Prairie")
  private val orgSuffixes: Vector[String] = Vector(
    "Corp", "Inc", "Ltd", "Group", "Holdings", "Partners", "Foundation",
    "Institute", "University", "Bank", "Labs", "Technologies", "Systems",
    "Solutions", "Industries", "Ventures", "Capital", "Trust", "Association")
  val trainOrg: Vector[String] =
    for (i <- (0 until 60).toVector) yield
      orgBases(i % orgBases.length) + " " + orgSuffixes((i * 7 + 1) % orgSuffixes.length)
  val heldOrg: Vector[String] =
    for (i <- (0 until 40).toVector) yield
      orgBases((i * 11 + 5) % orgBases.length) + " " + orgSuffixes((i * 3 + 2) % orgSuffixes.length)

  /** Out-of-gazetteer names: syllable products filtered against every public
    * list, so a gazetteer cannot know them. Split even/odd into a TRAIN half
    * (mixed into training so the model learns that context + shape alone can
    * make a PERSON — otherwise the gazetteer features become a hard veto)
    * and an EVAL half the model never sees.
    */
  private val syntheticGivenAll: Vector[String] = {
    val onsets = Vector("Bral", "Dren", "Fyn", "Gorv", "Jasp", "Kelm", "Lorv",
      "Mirt", "Nolq", "Pral", "Quin", "Rolv", "Selb", "Tarn", "Velk", "Wex")
    val ends = Vector("a", "io", "eth", "ar", "us", "en")
    (for (o <- onsets; e <- ends) yield o + e)
      .filterNot(n => GazetteerNerEngine.inAnyNameList(n.toLowerCase))
  }
  private val syntheticSurAll: Vector[String] = {
    val onsets = Vector("Ash", "Brack", "Cald", "Dorn", "Elm", "Fenn", "Gresh",
      "Hale", "Irv", "Kest", "Lund", "Marsh", "Nash", "Ost", "Pemb", "Quill")
    val ends = Vector("ford", "wick", "holt", "strand", "mere", "ton", "well", "by")
    (for (o <- onsets; e <- ends) yield o + e)
      .filterNot(n => GazetteerNerEngine.inAnyNameList(n.toLowerCase))
  }
  val syntheticTrainGiven: Vector[String] = half(syntheticGivenAll, even = true)
  val syntheticGiven: Vector[String] = half(syntheticGivenAll, even = false)
  val syntheticTrainSur: Vector[String] = half(syntheticSurAll, even = true)
  val syntheticSur: Vector[String] = half(syntheticSurAll, even = false)

  // ------------------------------------------------------------- templates

  // Templates are token sequences with typed slots; expansion keeps the
  // token/tag alignment exact. Slot markers: {P} person (given+surname),
  // {S} surname alone, {O} org, {L} place.
  private val personTemplates: Vector[Vector[String]] = Vector(
    Vector("Please", "contact", "{P}", "about", "the", "invoice", "."),
    Vector("Dear", "{P}", ",", "thank", "you", "for", "your", "letter", "."),
    Vector("Mr", "{S}", "will", "see", "you", "now", "."),
    Vector("I", "met", "{P}", "at", "the", "conference", "."),
    Vector("Sincerely", ",", "{P}"),
    Vector("The", "report", "was", "signed", "by", "{P}", "yesterday", "."),
    Vector("{P}", "joined", "the", "team", "in", "March", "."),
    Vector("Dr", "{S}", "reviewed", "the", "results", "."),
    Vector("Ask", "{P}", "for", "the", "updated", "figures", "."),
    // "According to Ms {S}": the honorific separates "to" from the name so
    // this template cannot teach prevw=to as PERSON evidence — that feature
    // belongs to LOC ("moved to Paris") and colliding them cost LOC recall
    Vector("According", "to", "Ms", "{S}", ",", "the", "deal", "closed", "."),
    Vector("{P}", "will", "present", "the", "results", "."),
    Vector("{P}", "approved", "the", "budget", "request", "."),
    Vector("The", "invoice", "was", "sent", "to", "Mrs", "{S}", "today", "."),
    Vector("Our", "manager", ",", "{P}", ",", "resigned", "."),
    Vector("Interview", "with", "{P}", "starts", "at", "noon", "."))
  private val orgTemplates: Vector[Vector[String]] = Vector(
    Vector("She", "works", "at", "{O}", "in", "the", "city", "."),
    Vector("{O}", "announced", "record", "earnings", "."),
    Vector("He", "joined", "{O}", "last", "year", "."),
    Vector("The", "contract", "with", "{O}", "was", "renewed", "."),
    Vector("Analysts", "expect", "{O}", "to", "expand", "."),
    Vector("The", "merger", "between", "{O}", "and", "{O2}", "failed", "."))
  private val locTemplates: Vector[Vector[String]] = Vector(
    Vector("They", "moved", "to", "{L}", "last", "summer", "."),
    Vector("The", "flight", "to", "{L}", "was", "delayed", "."),
    Vector("She", "lives", "in", "{L}", "."),
    Vector("Offices", "opened", "in", "{L}", "and", "{L2}", "."),
    Vector("The", "summit", "was", "held", "in", "{L}", "."))
  /** No entities, but realistic capitalization traps (sentence-start words,
    * months, weekdays, title-case nouns) so the model learns that a capital
    * letter alone is not an entity.
    */
  private val negativeSentences: Vector[Vector[String]] = Vector(
    Vector("The", "Quarterly", "Report", "was", "filed", "on", "Monday", "."),
    Vector("Please", "review", "the", "attached", "Invoice", "before", "Friday", "."),
    Vector("Our", "sales", "team", "shipped", "the", "new", "release", "."),
    Vector("Revenue", "grew", "in", "the", "second", "quarter", "."),
    Vector("The", "meeting", "moved", "to", "next", "Tuesday", "."),
    Vector("April", "showers", "bring", "May", "flowers", "."),
    Vector("The", "warehouse", "inventory", "was", "counted", "twice", "."),
    Vector("This", "Agreement", "takes", "effect", "immediately", "."),
    Vector("Download", "the", "latest", "build", "from", "the", "portal", "."),
    Vector("The", "printer", "on", "the", "third", "floor", "is", "broken", "."),
    Vector("Budget", "estimates", "were", "revised", "upward", "."),
    Vector("A", "new", "policy", "applies", "from", "January", "."),
    Vector("June", "sales", "beat", "the", "March", "forecast", "."),
    Vector("The", "July", "release", "slipped", "to", "August", "."),
    Vector("Summer", "Friday", "hours", "start", "in", "May", "."),
    // mid-sentence capitalized business nouns — the "attached Invoice" class
    Vector("See", "the", "signed", "Agreement", "for", "details", "."),
    Vector("The", "updated", "Roadmap", "ships", "next", "week", "."),
    Vector("Check", "the", "shared", "Backlog", "for", "open", "items", "."),
    Vector("Attach", "the", "final", "Statement", "to", "the", "email", "."),
    Vector("Read", "the", "enclosed", "Summary", "first", "."),
    Vector("File", "the", "amended", "Return", "by", "April", "."),
    // capitalized noun directly before "to" — counterweight for the
    // "expect {O} to expand" ORG context
    Vector("Send", "the", "revised", "Proposal", "to", "the", "board", "."),
    Vector("Forward", "this", "Notice", "to", "all", "tenants", "."))

  private def expand(template: Vector[String], given: Vector[String],
                     sur: Vector[String], orgs: Vector[String],
                     places: Vector[String], i: Int, lower: Boolean): Sentence = {
    val toks = Vector.newBuilder[Tok]
    template.foreach {
      case "{P}" =>
        toks += Tok(given(i % given.length), "B-PERSON")
        toks += Tok(sur((i * 13 + 7) % sur.length), "I-PERSON")
      case "{S}" =>
        toks += Tok(sur((i * 13 + 7) % sur.length), "B-PERSON")
      case "{O}" =>
        val parts = orgs(i % orgs.length).split(" ")
        toks += Tok(parts(0), "B-ORG")
        parts.drop(1).foreach(p => toks += Tok(p, "I-ORG"))
      case "{O2}" =>
        val parts = orgs((i * 17 + 3) % orgs.length).split(" ")
        toks += Tok(parts(0), "B-ORG")
        parts.drop(1).foreach(p => toks += Tok(p, "I-ORG"))
      case "{L}" =>
        val parts = places(i % places.length).split(" ")
        toks += Tok(parts(0), "B-LOC")
        parts.drop(1).foreach(p => toks += Tok(p, "I-LOC"))
      case "{L2}" =>
        val parts = places((i * 17 + 3) % places.length).split(" ")
        toks += Tok(parts(0), "B-LOC")
        parts.drop(1).foreach(p => toks += Tok(p, "I-LOC"))
      case w => toks += Tok(w, "O")
    }
    val ts = toks.result()
    // some training text is uncased (chat logs, scraped corpora) — keep the
    // tags, drop the capitalization signal on a deterministic subset
    val words = if (lower) ts.map(t => t.w.toLowerCase(java.util.Locale.ROOT))
    else ts.map(_.w)
    Sentence(words, ts.map(_.tag))
  }

  private def build(given: Vector[String], sur: Vector[String],
                    orgs: Vector[String], places: Vector[String],
                    perTemplate: Int, withLower: Boolean): Vector[Sentence] = {
    val out = Vector.newBuilder[Sentence]
    var n = 0
    def lowerNow(): Boolean = { n += 1; withLower && n % 7 == 0 }
    personTemplates.zipWithIndex.foreach { case (t, ti) =>
      (0 until perTemplate).foreach(i =>
        out += expand(t, given, sur, orgs, places, i * personTemplates.length + ti, lowerNow()))
    }
    orgTemplates.zipWithIndex.foreach { case (t, ti) =>
      (0 until perTemplate).foreach(i =>
        out += expand(t, given, sur, orgs, places, i * orgTemplates.length + ti, lowerNow()))
    }
    locTemplates.zipWithIndex.foreach { case (t, ti) =>
      (0 until perTemplate).foreach(i =>
        out += expand(t, given, sur, orgs, places, i * locTemplates.length + ti, lowerNow()))
    }
    // negatives: repeat so the O prior is strong (~1/3 of the corpus)
    val entityCount = out.result().length
    val negRepeats = math.max(1, entityCount / (2 * negativeSentences.length))
    (0 until negRepeats).foreach { _ =>
      negativeSentences.foreach(t =>
        out += Sentence(t, t.map(_ => "O")))
    }
    out.result()
  }

  /** Training corpus: TRAIN name pools only — gazetteer train halves plus
    * the synthetic train halves (~1/3 of person mentions), so the learned
    * weights balance list evidence against pure context/shape evidence.
    */
  def trainingSentences(perTemplate: Int = 55): Vector[Sentence] =
    build(trainGiven ++ half(syntheticTrainGiven, even = true),
      trainSur ++ half(syntheticTrainSur, even = true),
      trainOrg, trainPlace, perTemplate, withLower = true)

  /** Held-out eval: gazetteer names the model never saw in training. */
  def heldOutSentences(perTemplate: Int = 12): Vector[Sentence] =
    build(heldGiven, heldSur, heldOrg, heldPlace, perTemplate, withLower = false)

  /** Synthetic eval: names absent from EVERY public list — context/shape
    * generalization only. Places/orgs reuse held-out pools (a synthetic
    * place would be indistinguishable from an unknown org base).
    */
  def syntheticPersonSentences(perTemplate: Int = 12): Vector[Sentence] = {
    val out = Vector.newBuilder[Sentence]
    personTemplates.zipWithIndex.foreach { case (t, ti) =>
      (0 until perTemplate).foreach(i =>
        out += expand(t, syntheticGiven, syntheticSur, heldOrg, heldPlace,
          i * personTemplates.length + ti, lower = false))
    }
    out.result()
  }

  /** Negative-only sentences for precision measurement. */
  def negativeEvalSentences: Vector[Sentence] =
    negativeSentences.map(t => Sentence(t, t.map(_ => "O")))
}
