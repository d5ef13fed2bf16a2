package graft.checks

/** Production-grade reference [[NerEngine]]: a public-list gazetteer with a
  * context-window scorer, pure JVM, zero dependencies — the shipped default
  * for name detection behind the NER seam (the reference runs Presidio in a
  * pandas UDF, pii/pii_detection_funcs.py:118-186; its entity-name contract
  * is what [[detect]] returns).
  *
  * Detection is span-based, not bag-of-words: maximal runs of capitalized
  * tokens (joined only by spaces — never across punctuation) are scored by
  *  - gazetteer membership (given-name list, surname list — the public
  *    "most common names" tiers every NER gazetteer bootstraps from),
  *  - the 3-token context window before the span (honorifics like "Mr"/"Dr"
  *    score highest; softer cues like "dear"/"met"/"contact" lower),
  *  - span shape (single-token spans are demoted; single tokens at sentence
  *    start demoted further — "April showers" at sentence start is not a
  *    person).
  * A span at or above `threshold` yields PERSON. Street addresses (number +
  * capitalized words + street suffix) yield ADDRESS via a shape pattern.
  * ORG = a multi-token capitalized span ending in a legal/organizational
  * suffix ("Acme Corp", "Stanford University"). LOC = a capitalized span
  * whose full phrase sits in the public place gazetteer (countries, major
  * cities, US states).
  *
  * UNCASED text (no uppercase letter anywhere — chat logs, scraped corpora)
  * gets a fallback pass with no capitalization signal and strictly stronger
  * evidence requirements: PERSON needs an adjacent given+surname pair from
  * different lists or an honorific directly before a gazetteer name; ORG
  * needs the suffix shape AND an attachment cue ("at", "for", "joined", ...)
  * within two tokens before the span; LOC needs a locative preposition
  * directly before the gazetteer phrase ("in paris", not bare "turkey").
  *
  * Thread-safe and stateless: one instance serves every row of every
  * partition, riding whole-stage codegen as a reference object (see
  * [[NerDetect]]). Wireable by FQCN through the `ner_engine_class` metadata
  * key (zero-arg constructor).
  */
final class GazetteerNerEngine(threshold: Double = 0.6) extends NerEngine {
  import GazetteerNerEngine._

  /** Zero-arg constructor for `ner_engine_class` metadata wiring. */
  def this() = this(0.6)

  override def detect(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    if (hasUpper(text)) {
      val toks = TokenRx.findAllMatchIn(text).toVector
      if (containsPerson(text, toks)) out += "PERSON"
      if (containsOrg(text, toks)) out += "ORG"
      if (containsLoc(text, toks)) out += "LOC"
    } else {
      val words = text.toLowerCase(java.util.Locale.ROOT)
        .split("[^a-z'\\-]+").filter(_.nonEmpty).toVector
      if (uncasedPerson(words)) out += "PERSON"
      if (uncasedOrg(words)) out += "ORG"
      if (uncasedLoc(words)) out += "LOC"
    }
    if (AddressRx.findFirstIn(text).isDefined) out += "ADDRESS"
    out.toSeq
  }

  private def hasUpper(text: String): Boolean = {
    var i = 0
    while (i < text.length) { if (text.charAt(i).isUpper) return true; i += 1 }
    false
  }

  // -------------------------------------------------------------- cased pass

  private def isCap(s: String): Boolean =
    s.length >= 2 && s.head.isUpper &&
      s.drop(1).forall(c => c.isLower || c == '\'' || c == '-')

  /** Maximal space-joined capitalized spans (skipping honorific/cue tokens),
    * handed to `score`; any span scoring true short-circuits.
    */
  private def anyCapSpan(text: String, toks: Vector[scala.util.matching.Regex.Match])
                        (score: (Int, Int, IndexedSeq[String]) => Boolean): Boolean = {
    def word(k: Int): String = toks(k).matched
    def spaceJoined(a: Int, b: Int): Boolean = {
      val between = text.substring(toks(a).end, toks(b).start)
      between.nonEmpty && between.forall(_ == ' ')
    }
    // honorifics and cue words never join a span — "Dear Alice" scores the
    // span ["Alice"] with "dear" in its context window, not ["Dear","Alice"]
    def spanToken(k: Int): Boolean = {
      val lower = word(k).toLowerCase
      isCap(word(k)) && !Honorifics(lower) && !ContextCues(lower)
    }
    var i = 0
    while (i < toks.length) {
      if (spanToken(i)) {
        var j = i
        while (j + 1 < toks.length && spanToken(j + 1) && spaceJoined(j, j + 1)) j += 1
        if (score(i, j, (i to j).map(k => word(k).toLowerCase))) return true
        i = j + 1
      } else i += 1
    }
    false
  }

  private def containsPerson(text: String, toks: Vector[scala.util.matching.Regex.Match]): Boolean = {
    def sentenceStart(k: Int): Boolean = {
      val before = text.substring(0, toks(k).start).reverse.dropWhile(c => c == ' ' || c == '"')
      before.isEmpty || ".!?\n".contains(before.head)
    }
    anyCapSpan(text, toks) { (i, _, span) =>
      var score = 0.0
      // given and surname evidence must come from DIFFERENT tokens: many
      // names sit in both lists ("Jordan", "Thomas"), and one ambiguous
      // token is one piece of evidence, not two ("Jordan River" must not
      // outscore what "Jordan" alone would)
      val givenIdx = span.indexWhere(GivenNames)
      val surIdx = span.lastIndexWhere(Surnames)
      if (givenIdx >= 0) score += 0.5
      if (surIdx >= 0 && surIdx != givenIdx) score += 0.4
      val window = toks.slice(math.max(0, i - 3), i).map(_.matched.toLowerCase)
      if (window.lastOption.exists(Honorifics)) score += 0.45
      else if (window.exists(ContextCues)) score += 0.35
      if (span.length == 1) {
        score -= 0.15
        if (sentenceStart(i)) score -= 0.2
      }
      score >= threshold
    }
  }

  /** Multi-token capitalized span ending in an org suffix ("Acme Corp"). */
  private def containsOrg(text: String, toks: Vector[scala.util.matching.Regex.Match]): Boolean =
    anyCapSpan(text, toks) { (_, _, span) =>
      span.length >= 2 && OrgSuffixes(span.last)
    }

  /** Capitalized span containing a gazetteer place phrase — matched over
    * contiguous subspans of up to 3 tokens, so "New York City" (span longer
    * than the gazetteer phrase "new york") still resolves.
    */
  private def containsLoc(text: String, toks: Vector[scala.util.matching.Regex.Match]): Boolean =
    anyCapSpan(text, toks) { (_, _, span) =>
      span.indices.exists { a =>
        var n = 1
        var hit = false
        while (!hit && n <= 3 && a + n <= span.length) {
          hit = Places(span.slice(a, a + n).mkString(" "))
          n += 1
        }
        hit
      }
    }

  // ------------------------------------------------------------ uncased pass

  private def uncasedPerson(w: Vector[String]): Boolean = {
    var i = 0
    while (i < w.length) {
      if (i + 1 < w.length && GivenNames(w(i)) && Surnames(w(i + 1)) && w(i) != w(i + 1))
        return true
      if (Honorifics(w(i)) && i + 1 < w.length &&
        (GivenNames(w(i + 1)) || Surnames(w(i + 1)))) return true
      i += 1
    }
    false
  }

  private def uncasedOrg(w: Vector[String]): Boolean = {
    var i = 1
    while (i < w.length) {
      if (OrgSuffixes(w(i)) && !OrgSuffixes(w(i - 1))) {
        // candidate name spans of 1-4 tokens ending at the suffix; the
        // attachment cue must sit within TWO tokens before the span START
        // (anchoring the window at the suffix instead silently capped org
        // names at two tokens — "works at acme global data systems" has its
        // cue four back from the suffix but directly before the span). Name
        // tokens must be content words: letting function words into the
        // span would stretch any nearby cue into a false positive
        // ("...sort the table BY key and merge the GROUP").
        var len = 1
        var contentOk = true
        while (contentOk && len <= 4 && i - len >= 1) {
          val start = i - len
          if (FunctionWords(w(start))) contentOk = false
          else if (OrgCues(w(start - 1)) ||
            (start >= 2 && OrgCues(w(start - 2)))) return true
          len += 1
        }
      }
      i += 1
    }
    false
  }

  private def uncasedLoc(w: Vector[String]): Boolean = {
    var i = 0
    while (i < w.length) {
      if (LocPrepositions(w(i))) {
        // gazetteer phrase of 1-3 tokens directly after the preposition
        var n = 1
        while (n <= 3 && i + n < w.length) {
          if (Places(w.slice(i + 1, i + 1 + n).mkString(" "))) return true
          n += 1
        }
      }
      i += 1
    }
    false
  }
}

object GazetteerNerEngine {
  private val TokenRx = "[A-Za-z][A-Za-z'\\-]*".r

  /** number + 1-3 words + street suffix, e.g. "742 Evergreen Terrace". */
  private val AddressRx =
    ("\\b\\d{1,5}\\s+(?:[A-Z][A-Za-z'\\-]*\\s+){1,3}" +
      "(?:Street|St|Avenue|Ave|Road|Rd|Boulevard|Blvd|Lane|Ln|Drive|Dr|Court|Ct|Place|Pl|Terrace|Way)\\.?\\b").r

  private val Honorifics: Set[String] =
    Set("mr", "mrs", "ms", "miss", "dr", "prof", "professor", "sir", "madam",
      "rev", "fr", "capt", "lt", "sgt")

  /** Legal/organizational suffix tokens ending an ORG span (public company-
    * registry conventions; the standard shape feature every rule-based NER
    * system uses for ORG).
    */
  private val OrgSuffixes: Set[String] = Set(
    "inc", "corp", "llc", "ltd", "gmbh", "plc", "co", "company", "corporation",
    "group", "holdings", "partners", "foundation", "institute", "university",
    "college", "bank", "labs", "laboratories", "technologies", "systems",
    "solutions", "industries", "enterprises", "associates", "agency",
    "committee", "council", "ministry", "department", "bureau", "commission",
    "society", "association", "hospital", "airlines", "motors",
    "pharmaceuticals", "ventures", "capital", "trust", "federation")

  /** Attachment cues for uncased ORG spans ("works at acme corp"). */
  private val OrgCues: Set[String] =
    Set("at", "for", "with", "joined", "from", "by", "of", "works", "founded")

  /** Locative prepositions gating uncased LOC spans ("in paris"). */
  private val LocPrepositions: Set[String] =
    Set("in", "from", "to", "near", "at", "via", "visited", "visiting",
      "leaving", "reached", "toward", "towards")

  /** Public place gazetteer: countries, major world cities, US states
    * (multi-word phrases lowercased, matched against the full span).
    */
  private val Places: Set[String] = Set(
    // countries (common English short names)
    "afghanistan", "argentina", "australia", "austria", "bangladesh",
    "belgium", "brazil", "canada", "chile", "china", "colombia", "cuba",
    "denmark", "egypt", "ethiopia", "finland", "france", "germany", "ghana",
    "greece", "hungary", "india", "indonesia", "iran", "iraq", "ireland",
    "israel", "italy", "japan", "jordan", "kenya", "malaysia", "mexico",
    "morocco", "nepal", "netherlands", "new zealand", "nigeria", "norway",
    "pakistan", "peru", "philippines", "poland", "portugal", "romania",
    "russia", "saudi arabia", "singapore", "somalia", "south africa",
    "south korea", "spain", "sweden", "switzerland", "syria", "thailand",
    "turkey", "ukraine", "united kingdom", "united states", "venezuela",
    "vietnam", "yemen", "zimbabwe",
    // major world cities
    "amsterdam", "athens", "baghdad", "bangkok", "barcelona", "beijing",
    "berlin", "bogota", "boston", "brussels", "budapest", "buenos aires",
    "cairo", "calgary", "cape town", "caracas", "chicago", "copenhagen",
    "dallas", "delhi", "denver", "detroit", "dubai", "dublin", "edinburgh",
    "frankfurt", "geneva", "glasgow", "hanoi", "havana", "helsinki",
    "hong kong", "houston", "istanbul", "jakarta", "johannesburg", "karachi",
    "kyiv", "lagos", "lima", "lisbon", "london", "los angeles", "madrid",
    "manila", "melbourne", "mexico city", "miami", "milan", "montreal",
    "moscow", "mumbai", "munich", "nairobi", "new york", "osaka", "oslo",
    "ottawa", "paris", "philadelphia", "phoenix", "prague", "rome",
    "san francisco", "santiago", "sao paulo", "seattle", "seoul", "shanghai",
    "stockholm", "sydney", "taipei", "tehran", "tokyo", "toronto", "vancouver",
    "vienna", "warsaw", "zurich",
    // US states
    "alabama", "alaska", "arizona", "arkansas", "california", "colorado",
    "connecticut", "delaware", "florida", "georgia", "hawaii", "idaho",
    "illinois", "indiana", "iowa", "kansas", "kentucky", "louisiana", "maine",
    "maryland", "massachusetts", "michigan", "minnesota", "mississippi",
    "missouri", "montana", "nebraska", "nevada", "new hampshire",
    "new jersey", "new mexico", "north carolina", "north dakota", "ohio",
    "oklahoma", "oregon", "pennsylvania", "rhode island", "south carolina",
    "south dakota", "tennessee", "texas", "utah", "vermont", "virginia",
    "washington", "west virginia", "wisconsin", "wyoming")

  /** Function words that cannot be part of an uncased org NAME span (they
    * stretch the cue window into false positives).
    */
  private val FunctionWords: Set[String] =
    graft.pipeline.TextAnalysis.EnglishStopwords.toSet

  /** Soft context cues within 3 tokens before the span. */
  private val ContextCues: Set[String] =
    Set("dear", "sincerely", "regards", "attn", "met", "meet", "name", "named",
      "call", "called", "contact", "contacted", "signed", "author", "yours",
      "thanks", "email", "ask", "tell", "told", "wrote", "says", "said")

  /** Most-common given names (public top-frequency lists — the standard
    * gazetteer bootstrap set).
    */
  private val GivenNames: Set[String] = Set(
    "james", "mary", "robert", "patricia", "john", "jennifer", "michael",
    "linda", "david", "elizabeth", "william", "barbara", "richard", "susan",
    "joseph", "jessica", "thomas", "sarah", "charles", "karen", "christopher",
    "lisa", "daniel", "nancy", "matthew", "betty", "anthony", "sandra",
    "mark", "margaret", "donald", "ashley", "steven", "kimberly", "andrew",
    "emily", "paul", "donna", "joshua", "michelle", "kenneth", "carol",
    "kevin", "amanda", "brian", "melissa", "george", "deborah", "timothy",
    "stephanie", "ronald", "dorothy", "jason", "rebecca", "edward", "sharon",
    "jeffrey", "laura", "ryan", "cynthia", "jacob", "amy", "gary", "kathleen",
    "nicholas", "angela", "eric", "shirley", "jonathan", "brenda", "stephen",
    "emma", "larry", "anna", "justin", "pamela", "scott", "nicole", "brandon",
    "samantha", "benjamin", "katherine", "samuel", "christine", "gregory",
    "helen", "alexander", "debra", "patrick", "rachel", "frank", "carolyn",
    "raymond", "janet", "jack", "maria", "dennis", "catherine", "jerry",
    "heather", "tyler", "diane", "aaron", "olivia", "jose", "julie", "adam",
    "joyce", "nathan", "victoria", "henry", "ruth", "zachary", "virginia",
    "douglas", "lauren", "peter", "kelly", "kyle", "christina", "noah",
    "joan", "ethan", "evelyn", "jeremy", "judith", "walter", "andrea",
    "christian", "hannah", "keith", "megan", "roger", "alice", "terry",
    "jane", "austin", "madison", "sean", "gloria", "gerald", "teresa",
    "carl", "kathryn", "harold", "sara", "dylan", "janice", "arthur", "jean",
    "lawrence", "abigail", "jordan", "sophia", "jesse", "frances", "bryan",
    "grace", "billy", "denise", "bruce", "amber", "gabriel", "doris", "joe",
    "marilyn", "logan", "danielle", "alan", "beverly", "juan", "isabella",
    "albert", "theresa", "willie", "diana", "elijah", "natalie", "wayne",
    "brittany", "randy", "charlotte", "vincent", "marie", "mason", "kayla",
    "roy", "alexis", "ralph", "lori")

  /** Most-common surnames (public top-frequency lists). */
  private val Surnames: Set[String] = Set(
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas", "taylor", "moore", "jackson", "martin",
    "lee", "perez", "thompson", "white", "harris", "sanchez", "clark",
    "ramirez", "lewis", "robinson", "walker", "young", "allen", "king",
    "wright", "scott", "torres", "nguyen", "hill", "flores", "green",
    "adams", "nelson", "baker", "hall", "rivera", "campbell", "mitchell",
    "carter", "roberts", "gomez", "phillips", "evans", "turner", "diaz",
    "parker", "cruz", "edwards", "collins", "reyes", "stewart", "morris",
    "morales", "murphy", "cook", "rogers", "gutierrez", "ortiz", "morgan",
    "cooper", "peterson", "bailey", "reed", "kelly", "howard", "ramos",
    "kim", "cox", "ward", "richardson", "watson", "brooks", "chavez",
    "wood", "james", "bennett", "gray", "mendoza", "ruiz", "hughes",
    "price", "alvarez", "castillo", "sanders", "patel", "myers", "long",
    "ross", "foster", "jimenez", "powell", "jenkins", "perry", "russell",
    "sullivan", "bell", "coleman", "butler", "henderson", "barnes",
    "fisher", "vasquez", "simmons", "romero", "jordan", "patterson",
    "alexander", "hamilton", "graham", "reynolds", "griffin", "wallace",
    "moreno", "west", "cole", "hayes", "bryant", "herrera", "gibson",
    "ellis", "tran", "medina", "aguilar", "stevens", "murray", "ford",
    "castro", "marshall", "owens", "harrison", "fernandez", "mcdonald",
    "woods", "washington", "kennedy", "wells", "vargas", "henry", "chen",
    "freeman", "webb", "tucker", "guzman", "burns", "crawford", "olson",
    "simpson", "porter", "hunter", "gordon", "mendez", "silva", "shaw",
    "snyder", "mason", "dixon", "munoz", "hunt", "hicks", "holmes",
    "palmer", "wagner", "black", "robertson", "boyd", "rose", "stone",
    "salazar", "fox", "warren", "mills", "meyer", "rice", "schmidt")

  // Sorted snapshots of the public lists for synthetic NER corpus generation
  // ([[NerCorpus]]) — sorted so name splits are deterministic across JVMs.
  private[checks] def givenNameList: Vector[String] = GivenNames.toVector.sorted
  private[checks] def surnameList: Vector[String] = Surnames.toVector.sorted
  private[checks] def placeList: Vector[String] = Places.toVector.sorted
  private[checks] def inAnyNameList(lower: String): Boolean =
    GivenNames(lower) || Surnames(lower) || Places(lower)
  // single-token membership probes for perceptron gazetteer FEATURES
  // (Collins 2002-style list features; [[PerceptronNer.features]])
  private[checks] def isGivenName(lower: String): Boolean = GivenNames(lower)
  private[checks] def isSurname(lower: String): Boolean = Surnames(lower)
  private[checks] def isPlaceWord(lower: String): Boolean = Places(lower)
}
