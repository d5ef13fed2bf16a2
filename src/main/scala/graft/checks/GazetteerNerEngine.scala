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
    if (containsPerson(text)) out += "PERSON"
    if (AddressRx.findFirstIn(text).isDefined) out += "ADDRESS"
    out.toSeq
  }

  private def containsPerson(text: String): Boolean = {
    val toks = TokenRx.findAllMatchIn(text).toVector
    def word(k: Int): String = toks(k).matched
    def isCap(s: String): Boolean =
      s.length >= 2 && s.head.isUpper &&
        s.drop(1).forall(c => c.isLower || c == '\'' || c == '-')
    def spaceJoined(a: Int, b: Int): Boolean = {
      val between = text.substring(toks(a).end, toks(b).start)
      between.nonEmpty && between.forall(_ == ' ')
    }
    def sentenceStart(k: Int): Boolean = {
      val before = text.substring(0, toks(k).start).reverse.dropWhile(c => c == ' ' || c == '"')
      before.isEmpty || ".!?\n".contains(before.head)
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
        val span = (i to j).map(k => word(k).toLowerCase)
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
        if (score >= threshold) return true
        i = j + 1
      } else i += 1
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
}
