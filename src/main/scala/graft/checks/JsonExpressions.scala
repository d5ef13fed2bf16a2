package graft.checks

import com.fasterxml.jackson.core.{JsonFactoryBuilder, JsonParser, JsonToken}
import com.fasterxml.jackson.core.json.JsonReadFeature
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One Jackson pass per row computing everything the JSON check family needs
  * (the WktInfo pattern): `is_valid_json` and `has_json_keys` previously
  * parsed the same document through two structurally different built-ins
  * (try_parse_json's variant builder + json_object_keys' streaming reader),
  * so common-subexpression elimination could never share the parse —
  * measured ~2s of the 24-check 10M-row suite.
  *
  * The two built-ins disagree on real inputs, and JsonInfoSpec's differential
  * corpus pins every class (decompiled from the Spark 4.1 jars and verified
  * empirically):
  * - json_object_keys tokenizes with the Hive-compat lenient factory
  *   (ALLOW_UNESCAPED_CONTROL_CHARS + ALLOW_SINGLE_QUOTES); the variant
  *   parser is a strict parse of the same text. Both read DECODED chars
  *   (no BOM skipping, invalid UTF-8 replaced, never failed).
  * - The variant parser rejects duplicate object keys at every nesting
  *   level; json_object_keys lists duplicates.
  * - NEITHER checks for trailing content after the first root value:
  *   `{"a":1} garbage` is try_parse_json-valid and yields keys ["a"].
  * - The variant number paths never fail on tokenizer-accepted numerals
  *   (long coercion falls back to decimal-or-double; overflow is Infinity).
  *
  * The kernel therefore walks the FIRST root value once with the lenient
  * tokenizer (keys parity), and derives strict-parse validity from the same
  * stream: duplicate-key tracking plus per-string-token source-span checks
  * for a leading single quote or raw control chars.
  */
object JsonInfo {
  val schema: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("keys", ArrayType(StringType, containsNull = false))))
}

object JsonOps {
  // json_object_keys' SharedFactory shape (jsonExpressions.scala, "enabled
  // for Hive compatibility"); stream constraints stay at Jackson defaults,
  // which both built-ins also ride (depth/number/string limits)
  private val factory = new JsonFactoryBuilder()
    .enable(JsonReadFeature.ALLOW_UNESCAPED_CONTROL_CHARS)
    .enable(JsonReadFeature.ALLOW_SINGLE_QUOTES)
    .build()

  /** Single-pass validity + outer-object keys; see [[JsonInfo]]. Parses the
    * DECODED text with a char-based parser — the same decode path both
    * built-ins take (variant: UTF8String.toString; keys: an
    * InputStreamReader), so BOM chars and invalid-UTF-8 replacement behave
    * identically by construction.
    */
  def info(u: UTF8String): InternalRow = {
    val s = u.toString
    var keys: java.util.ArrayList[UTF8String] = null
    var strictOk = true
    val parser = factory.createParser(s)
    try {
      try {
        val first = parser.nextToken()
        if (first == null) return InternalRow(false, null) // empty/ws-only input
        if (first == JsonToken.START_OBJECT) keys = new java.util.ArrayList[UTF8String]()
        strictOk = walkValue(parser, first, s, keys)
      } catch {
        case _: Exception =>
          strictOk = false
          keys = null // first root value malformed -> json_object_keys is null too
      }
    } finally parser.close()
    val keysArr =
      if (keys == null) null
      else new GenericArrayData(keys.toArray(new Array[AnyRef](keys.size())))
    InternalRow(strictOk, keysArr)
  }

  /** Recursive walk of one value: returns false when the strict variant
    * parse would reject (duplicate key, single-quoted or raw-control-char
    * string); throws on tokenizer-level syntax errors (both sides reject).
    * `topKeys` non-null only for a root-level object.
    */
  private def walkValue(p: JsonParser, tok: JsonToken, s: String,
                        topKeys: java.util.ArrayList[UTF8String]): Boolean = tok match {
    case JsonToken.START_OBJECT =>
      var ok = true
      val seen = new java.util.HashSet[String]()
      var t = p.nextToken()
      while (t != JsonToken.END_OBJECT) {
        val name = p.currentName()
        if (!seen.add(name)) ok = false
        if (!spanStrict(p, s)) ok = false
        if (topKeys != null) topKeys.add(UTF8String.fromString(name))
        val v = p.nextToken()
        if (!walkValue(p, v, s, null)) ok = false
        t = p.nextToken()
      }
      ok
    case JsonToken.START_ARRAY =>
      var ok = true
      var t = p.nextToken()
      while (t != JsonToken.END_ARRAY) {
        if (!walkValue(p, t, s, null)) ok = false
        t = p.nextToken()
      }
      ok
    case JsonToken.VALUE_STRING =>
      p.finishToken() // string values tokenize lazily; force the escape scan
      spanStrict(p, s)
    case _ => true // numbers and literals: tokenizer acceptance == variant acceptance
  }

  /** Strictness probe over the current string-ish token's SOURCE chars:
    * false when it is single-quoted or carries raw control chars (legal only
    * under the lenient factory). Scans from the token's opening quote to its
    * matching close quote with escape handling — parser end locations are
    * not reliable across token kinds (a field name's span can swallow the
    * whitespace before the colon).
    */
  private def spanStrict(p: JsonParser, s: String): Boolean = {
    val start = p.currentTokenLocation().getCharOffset.toInt
    if (start < 0 || start >= s.length) return true
    val q = s.charAt(start)
    if (q == '\'') return false
    if (q != '"') return true
    var i = start + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == q) return true
      else if (c < ' ') return false
      else i += 1
    }
    true
  }
}

/** NULL only for NULL input; struct (valid, keys) otherwise. Codegen'd static
  * call so the row-check projection stays inside whole-stage codegen.
  */
case class JsonInfoExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = JsonInfo.schema
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = JsonOps.info(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${gen.code}
        boolean ${ev.isNull} = ${gen.isNull};
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.checks.JsonOps.info(${gen.value});
        }""")
  }

  override protected def withNewChildInternal(c: Expression): JsonInfoExpr = copy(child = c)
}
