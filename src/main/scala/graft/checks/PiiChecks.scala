package graft.checks

import graft.core.CheckUtils._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection (reference pii/pii_detection_funcs.py:33 uses a Presidio NER
  * pandas UDF — a Python-worker round-trip per batch).
  *
  * Here: a deterministic regex entity detector as pure Catalyst expressions —
  * emails, phone numbers, US SSNs, credit-card-shaped numbers, IPv4 addresses.
  * This is a different (weaker but 100 TB-scalable) detector; a model-based
  * NER can plug in behind the same check contract (SURVEY §7.1 module 10).
  */
object PiiChecks {

  /** entity -> detection regex (substring match). */
  val EntityPatterns: Seq[(String, String)] = Seq(
    "EMAIL_ADDRESS" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "PHONE_NUMBER" -> "(\\+?\\d{1,3}[ .-]?)?\\(?\\d{3}\\)?[ .-]?\\d{3}[ .-]?\\d{4}",
    "US_SSN" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "CREDIT_CARD" -> "\\b\\d{4}[ -]?\\d{4}[ -]?\\d{4}[ -]?\\d{4}\\b",
    "IP_ADDRESS" -> "\\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\\b",
    "MAC_ADDRESS" -> "\\b([0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}\\b",
    "URL" -> "https?://[A-Za-z0-9.-]+(:\\d+)?(/[^\\s]*)?",
    // checksum-validated entities (regex key present for the registry; the
    // actual detection goes through the validating expressions below)
    "CREDIT_CARD_LUHN" -> "",
    "IBAN" -> "")

  /** Array of entity types detected in the column (empty array = clean).
    * CREDIT_CARD_LUHN and IBAN validate the check digits (Luhn / mod-97) —
    * regex shape alone flags any 16 random digits.
    */
  def detectedEntities(c: Column, entities: Seq[String] = EntityPatterns.map(_._1),
                       ner: Option[NerEngine] = None): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val s = c.cast("string")
    val hits = EntityPatterns.filter { case (n, _) => entities.contains(n) }.map {
      case ("CREDIT_CARD_LUHN", _) =>
        when(GraftColumnBridge.column(ContainsLuhnNumber(GraftColumnBridge.expression(s))),
          lit("CREDIT_CARD_LUHN")).otherwise(lit(null))
      case ("IBAN", _) =>
        when(GraftColumnBridge.column(ContainsIban(GraftColumnBridge.expression(s))),
          lit("IBAN")).otherwise(lit(null))
      case (name, re) => when(s.rlike(re), lit(name)).otherwise(lit(null))
    }
    val regexHits = array_compact(array(hits: _*))
    ner match {
      case Some(engine) =>
        // model hits append after the registry hits; null text stays null-safe
        // (caller guards with isNotNull), engine called once per row (CSE'd)
        array_union(regexHits,
          GraftColumnBridge.column(NerDetect(GraftColumnBridge.expression(s), engine)))
      case None => regexHits
    }
  }

  /** Redaction order: emails/URLs first so their digit/dot runs can't be
    * half-eaten by the looser numeric patterns; phone last (loosest).
    */
  val RedactionOrder: Seq[String] = Seq(
    "EMAIL_ADDRESS", "URL", "MAC_ADDRESS", "IP_ADDRESS", "IBAN", "US_SSN",
    "CREDIT_CARD", "CREDIT_CARD_LUHN", "PHONE_NUMBER")

  /** Redaction regexes: the detection patterns, except cards and IBANs widen
    * to shape-only patterns. Redaction must cover MORE than detection flags:
    * a Luhn-valid 15-digit Amex (378282246310005) matches CREDIT_CARD_LUHN
    * detection but not the 4-4-4-4 CREDIT_CARD shape, and a published corpus
    * must not leak it — so any 13-19 digit run (optional separators) redacts.
    * Over-redaction is the safe failure mode here.
    */
  val RedactionPatterns: Map[String, String] = EntityPatterns.toMap ++ Map(
    "CREDIT_CARD" -> "\\b\\d(?:[ -]?\\d){12,18}\\b",
    "CREDIT_CARD_LUHN" -> "\\b\\d(?:[ -]?\\d){12,18}\\b",
    "IBAN" -> "\\b[A-Z]{2}\\d{2}(?: ?[A-Z0-9]{2,4}){2,8}\\b")

  /** Replace every PII entity occurrence with an `[ENTITY_NAME]` placeholder —
    * the transform counterpart of [[doesNotContainPii]] for publishing
    * training corpora. Sequential regexp_replace chain in [[RedactionOrder]];
    * row-local, codegen'd, no shuffle. Every entity in [[EntityPatterns]] has
    * a redaction regex (checksum-validated entities redact on shape).
    */
  def redactPii(c: Column, entities: Seq[String] = RedactionOrder): Column =
    RedactionOrder.filter(entities.contains).foldLeft(c.cast("string")) { (acc, name) =>
      regexp_replace(acc, RedactionPatterns(name), s"[$name]")
    }

  /** Check: any detected entity fails, message lists the entity types.
    * `ner` plugs a Presidio-class model engine in NEXT TO the deterministic
    * registry — its entity names surface in the same message/flag contract.
    */
  def doesNotContainPii(c: Column, entities: Seq[String] = EntityPatterns.map(_._1),
                        ner: Option[NerEngine] = None): Column = {
    val found = detectedEntities(c, entities, ner)
    makeCondition(c.isNotNull && size(found) > 0,
      concat(lit(s"Column '${c.toString}' contains PII entities: "), concat_ws(",", found)))
  }
}
