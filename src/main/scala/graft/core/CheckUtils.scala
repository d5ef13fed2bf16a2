package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Expression-building utilities shared by all checks.
  *
  * Reference behaviors: make_condition (dqx/check_funcs.py:123-142), limit
  * coercion (check_funcs.py:4468-4510), SQL safety scan (dqx/utils.py:85-97,
  * 309-361), null-safe join helpers (check_funcs.py:3757-3833), unique temp
  * column names (check_funcs.py:1855-1857).
  */
object CheckUtils {

  /** Failure = message string; pass = NULL (check_funcs.py:123-142). */
  def makeCondition(condition: Column, message: Column): Column =
    when(condition, message).otherwise(lit(null).cast("string"))

  def makeCondition(condition: Column, message: String): Column =
    makeCondition(condition, lit(message))

  /** Fresh temp-column suffix so dataset checks compose without collisions. */
  def uniqueSuffix(): String =
    java.util.UUID.randomUUID().toString.replace("-", "")

  /** Coerce a limit argument (literal number/string/date/column/SQL expression)
    * into a Column (check_funcs.py:4468-4510). Strings are treated as SQL
    * expressions — matching the reference, which passes strings to F.expr.
    */
  def limitExpr(limit: Any): Column = limit match {
    case c: Column => c
    case null => lit(null)
    case s: String => expr(s)
    case d: java.sql.Date => lit(d)
    case t: java.sql.Timestamp => lit(t)
    case d: java.time.LocalDate => lit(java.sql.Date.valueOf(d))
    // Legacy fallback for java.util.Date values from a STOCK snakeyaml
    // loader (graft's own loader yields typed sql.Date/sql.Timestamp via
    // [[parseYamlTimestampScalar]], matched above): snakeyaml builds the
    // Date from the text's fields AT UTC, so rebuild the literal from the
    // UTC fields to interpret the text NAIVELY. Two lossy corners are
    // inherent to this path and only fixed by the typed loader: a
    // tz-suffixed scalar arrives pre-shifted (the original wall time is
    // gone), and an explicit "00:00:00" timestamp is indistinguishable
    // from a date-only scalar (demoted to DATE here).
    case d: java.util.Date =>
      val utc = java.time.LocalDateTime.ofInstant(d.toInstant, java.time.ZoneOffset.UTC)
      if (utc.toLocalTime == java.time.LocalTime.MIDNIGHT)
        lit(java.sql.Date.valueOf(utc.toLocalDate))
      else lit(java.sql.Timestamp.valueOf(utc))
    case n => lit(n)
  }

  /** Typed construction of a YAML 1.1 `!!timestamp` scalar from its TEXT,
    * replacing snakeyaml's lossy java.util.Date: date-only scalars become
    * `java.sql.Date`; naive timestamps (incl. an explicit "00:00:00")
    * become `java.sql.Timestamp` with the text's own wall-time fields
    * (PyYAML-naive semantics, matching the reference's yaml.safe_load);
    * tz-suffixed scalars (`Z` / `+05:00` / `-0530`) become the EXACT
    * instant they denote (PyYAML applies the offset the same way).
    */
  def parseYamlTimestampScalar(text: String): AnyRef = {
    val s = text.trim
    val dateOnly = "^(\\d{4})-(\\d{1,2})-(\\d{1,2})$".r
    val full = ("^(\\d{4})-(\\d{1,2})-(\\d{1,2})(?:[Tt]|[ \\t]+)" +
      "(\\d{1,2}):(\\d{2}):(\\d{2})(?:\\.(\\d+))?" +
      "(?:[ \\t]*(Z|[-+]\\d{1,2}(?::?\\d{2})?))?$").r
    s match {
      case dateOnly(y, m, d) =>
        java.sql.Date.valueOf(java.time.LocalDate.of(y.toInt, m.toInt, d.toInt))
      case full(y, mo, d, h, mi, sec, frac, tz) =>
        val nanos = if (frac == null) 0 else frac.padTo(9, '0').take(9).toInt
        val ldt = java.time.LocalDateTime.of(
          y.toInt, mo.toInt, d.toInt, h.toInt, mi.toInt, sec.toInt, nanos)
        if (tz == null) java.sql.Timestamp.valueOf(ldt)
        else {
          val offset =
            if (tz == "Z") java.time.ZoneOffset.UTC
            else {
              val sign = if (tz.startsWith("-")) -1 else 1
              val body = tz.substring(1).replace(":", "")
              val (hh, mm) =
                if (body.length <= 2) (body.toInt, 0)
                else (body.dropRight(2).toInt, body.takeRight(2).toInt)
              java.time.ZoneOffset.ofHoursMinutes(sign * hh, sign * mm)
            }
          java.sql.Timestamp.from(ldt.toInstant(offset))
        }
      case other =>
        throw new IllegalArgumentException(s"Not a YAML timestamp scalar: '$other'")
    }
  }

  /** String rendering of a limit for failure messages. */
  def limitText(limit: Any): String = limit match {
    case c: Column => c.toString
    case other => String.valueOf(other)
  }

  private val forbiddenSql = Seq(
    "delete", "insert", "update", "drop", "truncate", "alter", "create",
    "replace", "grant", "revoke", "merge", "use", "refresh", "analyze",
    "optimize", "vacuum", "describe")

  /** Lightweight SQL-injection guard for user-supplied filter/query strings:
    * strips string literals and comments, then scans for destructive keywords
    * (dqx/utils.py:309-361). SELECT is allowed.
    */
  def isSqlQuerySafe(sql: String): Boolean = {
    val noLiterals = sql.replaceAll("'[^']*'", " ").replaceAll("\"[^\"]*\"", " ")
    val noComments = noLiterals.replaceAll("--.*", " ").replaceAll("(?s)/\\*.*?\\*/", " ")
    val tokens = noComments.toLowerCase.split("[^a-z_]+").toSet
    !forbiddenSql.exists(tokens.contains)
  }

  def requireSafeSql(sql: String, what: String): Unit =
    require(isSqlQuerySafe(sql), s"Provided $what is not safe: forbidden SQL keyword found in '$sql'")

  /** Null-safe equality join condition over paired columns
    * (check_funcs.py:3784-3797).
    */
  def nullSafeJoinCondition(left: Seq[Column], right: Seq[Column]): Column =
    left.zip(right).map { case (l, r) => l <=> r }.reduce(_ && _)

  /** Plain equality join condition with non-null guard on the left keys
    * (FK semantics, check_funcs.py:2005-2014).
    */
  def equalityJoinCondition(left: Seq[Column], right: Seq[Column]): Column =
    left.zip(right).map { case (l, r) => l === r }.reduce(_ && _)

  /** Render a column's value for a failure message: NULL-safe cast to string. */
  def valueText(c: Column): Column =
    coalesce(c.cast("string"), lit("null"))
}
