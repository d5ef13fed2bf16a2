package graft.profiler

/** DQProfile -> Lakeflow Pipelines / DLT expectation generator (reference
  * profiler/dlt_generator.py:17-231): SQL `CONSTRAINT ... EXPECT (...)`
  * strings, a Python `@dlt.expect_all*` decorator block, or a plain
  * name->expression map. Pure string templating — deterministic, no Spark.
  */
object DltGenerator {

  private def valToStr(v: Any): String = v match {
    case s: String => "'" + s.replace("'", "\\'") + "'"
    case other => String.valueOf(other)
  }

  private def sanitize(name: String): String = name.replaceAll("[^a-zA-Z0-9_]+", "_")

  /** Profile name -> boolean SQL expression; None when unsupported/empty. */
  private def expressionFor(p: DQProfile): Option[String] = p.name match {
    case "is_not_null" => Some(s"${p.column} is not null")
    case "is_in" | "is_in_list" =>
      val vals = p.parameters.get("in").orElse(p.parameters.get("allowed")) match {
        case Some(s: Seq[_]) => s
        case _ => Seq.empty
      }
      if (vals.isEmpty) None
      else Some(s"${p.column} in (${vals.map(valToStr).mkString(", ")})")
    case "min_max" =>
      (p.parameters.get("min"), p.parameters.get("max")) match {
        case (Some(lo), Some(hi)) => Some(s"${p.column} >= ${valToStr(lo)} and ${p.column} <= ${valToStr(hi)}")
        case (Some(lo), None) => Some(s"${p.column} >= ${valToStr(lo)}")
        case (None, Some(hi)) => Some(s"${p.column} <= ${valToStr(hi)}")
        case _ => None
      }
    case "is_not_null_or_empty" | "is_not_null_and_not_empty" =>
      val trim = p.parameters.get("trim_strings").forall(_ == true)
      val c = if (trim) s"trim(${p.column})" else p.column
      Some(s"${p.column} is not null and $c <> ''")
    case "is_not_empty" =>
      val trim = p.parameters.get("trim_strings").forall(_ == true)
      val c = if (trim) s"trim(${p.column})" else p.column
      Some(s"(${p.column} is null or $c <> '')")
    case _ => None
  }

  /** name -> expression map (dlt_generator.py:143-169). */
  def generateDict(profiles: Seq[DQProfile]): Map[String, String] =
    profiles.flatMap(p => expressionFor(p).map(e => sanitize(s"${p.column}_${p.name}") -> e))
      .toMap

  /** SQL constraints (dlt_generator.py:200-231). action: drop | fail | null. */
  def generateSql(profiles: Seq[DQProfile], action: Option[String] = None): Seq[String] = {
    val act = action match {
      case Some("drop") => " ON VIOLATION DROP ROW"
      case Some("fail") => " ON VIOLATION FAIL UPDATE"
      case _ => ""
    }
    profiles.flatMap(p => expressionFor(p).map(e =>
      s"CONSTRAINT ${p.column}_${p.name} EXPECT ($e)$act"))
  }

  /** Python decorator block (dlt_generator.py:171-198). */
  def generatePython(profiles: Seq[DQProfile], action: Option[String] = None): String = {
    val expectations = generateDict(profiles)
    if (expectations.isEmpty) return ""
    val decorator = action match {
      case Some("drop") => "@dlt.expect_all_or_drop"
      case Some("fail") => "@dlt.expect_all_or_fail"
      case _ => "@dlt.expect_all"
    }
    val json = expectations.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + k + "\": \"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ", ", "}")
    s"$decorator(\n$json\n)"
  }
}
