package graft.checks

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Checksum-validated PII detectors: regex shape alone over-flags (any 16
  * random digits look like a card number); these expressions scan the text
  * once and validate candidates with the real check digit algorithms.
  * Codegen'd via static [[PiiOps]] calls — a CodegenFallback here would
  * disable whole-stage codegen for every check sharing the projection.
  */
object PiiOps {
  def containsLuhn(u: UTF8String): Boolean = {
    val s = u.toString
    var i = 0
    val n = s.length
    while (i < n) {
      if (s.charAt(i).isDigit) {
        // collect a digit run allowing single space/dash separators
        val digits = new StringBuilder
        var j = i
        var lastWasSep = false
        while (j < n && (s.charAt(j).isDigit ||
          ((s.charAt(j) == ' ' || s.charAt(j) == '-') && !lastWasSep && digits.nonEmpty))) {
          if (s.charAt(j).isDigit) { digits.append(s.charAt(j)); lastWasSep = false }
          else lastWasSep = true
          j += 1
        }
        val d = digits.toString
        if (d.length >= 13 && d.length <= 19 && luhn(d)) return true
        i = j
      } else i += 1
    }
    false
  }

  private def luhn(d: String): Boolean = {
    var sum = 0
    var alt = false
    var i = d.length - 1
    while (i >= 0) {
      var x = d.charAt(i) - '0'
      if (alt) { x *= 2; if (x > 9) x -= 9 }
      sum += x
      alt = !alt
      i -= 1
    }
    sum % 10 == 0
  }

  private val ibanShape = "[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}".r

  def containsIban(u: UTF8String): Boolean =
    ibanShape.findAllIn(u.toString.replace(" ", "")).exists(mod97Valid)

  private def mod97Valid(iban: String): Boolean = {
    val rearranged = iban.substring(4) + iban.substring(0, 4)
    var rem = 0L
    var i = 0
    while (i < rearranged.length) {
      val ch = rearranged.charAt(i)
      val piece = if (ch.isDigit) (ch - '0').toString else (ch - 'A' + 10).toString
      piece.foreach(p => rem = (rem * 10 + (p - '0')) % 97)
      i += 1
    }
    rem == 1
  }

  /** Static kernel for [[NerDetect]] codegen: engine hits as ArrayData of
    * UTF8String (distinct, input order). Null/blank entity names from the
    * engine are dropped here: [[NerDetect]] declares containsNull=false, and
    * the trait contract is only documentation — a null element in a
    * non-null-element array corrupts downstream concat_ws/size.
    */
  def nerDetect(engine: NerEngine, u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val hits = engine.detect(u.toString)
      .filter(h => h != null && h.nonEmpty).distinct
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      hits.map(UTF8String.fromString).toArray[Any])
  }
}

/** True when the text contains a 13-19 digit sequence (spaces/dashes allowed
  * between groups) that passes the Luhn checksum — credit-card detection with
  * far fewer false positives than the bare digit-shape regex.
  */
case class ContainsLuhnNumber(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any = PiiOps.containsLuhn(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.checks.PiiOps.containsLuhn($c)")

  override protected def withNewChildInternal(c: Expression): ContainsLuhnNumber = copy(child = c)
}

/** Pluggable NER contract — the seam a Presidio-class engine drops into
  * (reference: pii/pii_detection_funcs.py:33 runs Presidio in a pandas UDF).
  * Implementations MUST be Serializable (shipped to executors once per plan,
  * referenced from generated code) and thread-safe: one instance serves every
  * row of every partition. Heavyweight models should lazy-init
  * `@transient lazy val` state so the driver-side object stays small.
  */
trait NerEngine extends Serializable {
  /** Entity type names detected in the text (empty = clean). Called only on
    * non-null text.
    */
  def detect(text: String): Seq[String]
}

/** Entity types the [[NerEngine]] finds in the text, as array<string>
  * (empty array = clean). Codegen'd: the engine ships as a reference object
  * into the generated code, so plugging in an NER model does NOT de-codegen
  * the surrounding check projection.
  */
case class NerDetect(child: Expression, engine: NerEngine) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType,
      containsNull = false)

  override def nullSafeEval(v: Any): Any =
    PiiOps.nerDetect(engine, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nerEngine", engine, classOf[NerEngine].getName)
    defineCodeGen(ctx, ev, c => s"graft.checks.PiiOps.nerDetect($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): NerDetect = copy(child = c)
}

/** True when the text contains an IBAN-shaped token (CC + 2 check digits +
  * 11-30 alphanumerics) whose ISO 7064 mod-97 checksum is 1.
  */
case class ContainsIban(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any = PiiOps.containsIban(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.checks.PiiOps.containsIban($c)")

  override protected def withNewChildInternal(c: Expression): ContainsIban = copy(child = c)
}
