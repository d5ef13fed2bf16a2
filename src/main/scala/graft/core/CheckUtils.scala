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
    // snakeyaml parses unquoted YAML date/timestamp scalars to java.util.Date
    // built from the text's fields AT UTC (must match AFTER the
    // sql.Date/Timestamp subclasses). Rebuild the literal from those UTC
    // fields so the YAML text is interpreted NAIVELY — "2025-01-01" is a
    // DATE literal and "2025-02-24 01:00:00" means 01:00 in the session
    // zone (the reference's PyYAML-naive-datetime semantics), instead of
    // shifting by the session/JVM timezone offset.
    case d: java.util.Date =>
      val utc = java.time.LocalDateTime.ofInstant(d.toInstant, java.time.ZoneOffset.UTC)
      if (utc.toLocalTime == java.time.LocalTime.MIDNIGHT)
        lit(java.sql.Date.valueOf(utc.toLocalDate))
      else lit(java.sql.Timestamp.valueOf(utc))
    case n => lit(n)
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
