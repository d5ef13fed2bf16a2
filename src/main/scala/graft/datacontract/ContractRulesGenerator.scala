package graft.datacontract

import graft.rules.ChecksSerializer

/** ODCS (Open Data Contract Standard v3.x) -> DQ rules generator — the
  * deterministic subset of the reference's
  * datacontract/contract_rules_generator.py (no LLM paths):
  *
  *  - one `has_valid_schema` rule per schema object (properties' physicalType
  *    DDL, contract_rules_generator.py:483-545);
  *  - predefined per-property rules (:569-705): `required` -> is_not_null,
  *    `unique` -> is_unique, and logicalTypeOptions `pattern` -> regex_match,
  *    `minimum`/`maximum` -> is_in_range / aggr min-max (sql_expression for
  *    float limits, :726-860), `minLength`/`maxLength` -> sql_expression
  *    LENGTH bounds (:864-955), date/timestamp `format` -> is_valid_date /
  *    is_valid_timestamp (:956-1008; formats stay Java SimpleDateFormat —
  *    Spark-native, no strftime conversion needed);
  *  - explicit DQX rules embedded in `quality` blocks (type=custom,
  *    engine=dqx, implementation carrying a check dict, :1235-1300);
  *  - nested `object` properties recurse with dotted column paths (:600-612).
  *
  * Input: the contract as parsed YAML maps (use [[fromYaml]]).
  */
object ContractRulesGenerator {

  def fromYaml(contractYaml: String, defaultCriticality: String = "error",
               strictSchemaValidation: Boolean = false): Seq[Map[String, Any]] = {
    val parsed = ChecksSerializer.parseYaml(contractYaml) match {
      case Seq(one) => one
      case other => throw new IllegalArgumentException(s"Expected one contract document, got ${other.size}")
    }
    generate(parsed, defaultCriticality, strictSchemaValidation)
  }

  def generate(contract: Map[String, Any], defaultCriticality: String = "error",
               strictSchemaValidation: Boolean = false): Seq[Map[String, Any]] = {
    val apiVersion = str(contract.get("apiVersion")).getOrElse("unknown")
    require(apiVersion == "unknown" || apiVersion.startsWith("v3"),
      s"Only ODCS v3.x contracts are supported, got apiVersion '$apiVersion'")
    val base = Map(
      "contract_id" -> str(contract.get("id")).getOrElse("unknown"),
      "contract_version" -> str(contract.get("version")).getOrElse("unknown"),
      "odcs_version" -> apiVersion)
    val schemas = seqOfMaps(contract.get("schema"))
    val rules = schemas.flatMap { schemaObj =>
      val schemaName = str(schemaObj.get("name")).getOrElse("unnamed_schema")
      val meta = base + ("schema" -> schemaName)
      schemaValidationRule(schemaObj, schemaName, meta, defaultCriticality, strictSchemaValidation) ++
        seqOfMaps(schemaObj.get("properties")).flatMap(p =>
          propertyRules(p, meta, defaultCriticality, parentPath = "", depth = 0)) ++
        explicitRules(seqOfMaps(schemaObj.get("quality")), None, meta, defaultCriticality) ++
        seqOfMaps(schemaObj.get("properties")).flatMap { p =>
          str(p.get("name")).toSeq.flatMap(n =>
            explicitRules(seqOfMaps(p.get("quality")), Some(n), meta, defaultCriticality))
        }
    }
    val errors = ChecksSerializer.validateChecks(rules)
    require(errors.isEmpty, s"Contract produced invalid rules:\n${errors.mkString("\n")}")
    rules
  }

  // ------------------------------------------------------------------ helpers

  private def str(v: Option[Any]): Option[String] = v.collect {
    case null => null
    case s: String => s
    case other => String.valueOf(other)
  }.filter(_ != null)

  private def seqOfMaps(v: Option[Any]): Seq[Map[String, Any]] = v match {
    case Some(s: Seq[_]) => s.collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
    case _ => Seq.empty
  }

  private def boolOf(v: Option[Any]): Boolean = v match {
    case Some(b: Boolean) => b
    case Some(s: String) => s.equalsIgnoreCase("true")
    case _ => false
  }

  private def isFloatLike(v: Any): Boolean = v match {
    case _: Double | _: Float | _: java.math.BigDecimal => true
    case _ => false
  }

  private def rule(function: String, args: Map[String, Any], name: String,
                   criticality: String, meta: Map[String, Any],
                   dimension: String, ruleType: String = "predefined"): Map[String, Any] =
    Map(
      "check" -> Map("function" -> function, "arguments" -> args),
      "name" -> name,
      "criticality" -> criticality,
      "user_metadata" -> (meta ++ Map("dimension" -> dimension, "rule_type" -> ruleType))
        .map { case (k, v) => k -> String.valueOf(v) })

  // -------------------------------------------------------- schema validation

  private val identifier = "^[a-zA-Z_][a-zA-Z0-9_]*$".r

  private def schemaValidationRule(schemaObj: Map[String, Any], schemaName: String,
                                   meta: Map[String, Any], criticality: String,
                                   strict: Boolean): Seq[Map[String, Any]] = {
    val parts = seqOfMaps(schemaObj.get("properties")).flatMap { p =>
      for {
        name <- str(p.get("name"))
        pt <- str(p.get("physicalType"))
      } yield {
        val col = if (identifier.matches(name)) name else s"`$name`"
        s"$col ${pt.toUpperCase}"
      }
    }
    if (parts.isEmpty) Seq.empty
    else Seq(rule("has_valid_schema",
      Map("expected_schema" -> parts.mkString(", "), "strict" -> strict),
      s"${schemaName}_schema_validation", criticality,
      meta, dimension = "consistency", ruleType = "schema_validation"))
  }

  // ------------------------------------------------------- predefined rules

  private def propertyRules(prop: Map[String, Any], meta: Map[String, Any],
                            criticality: String, parentPath: String,
                            depth: Int): Seq[Map[String, Any]] = {
    if (depth > 20) return Seq.empty
    val name = str(prop.get("name")).getOrElse(return Seq.empty)
    val path = if (parentPath.isEmpty) name else s"$parentPath.$name"
    val fieldMeta = meta + ("field" -> path)
    val logicalType = str(prop.get("logicalType")).getOrElse("")

    if (logicalType == "object" && prop.get("properties").nonEmpty)
      return seqOfMaps(prop.get("properties"))
        .flatMap(p => propertyRules(p, meta, criticality, path, depth + 1))

    val direct =
      (if (boolOf(prop.get("required")))
        Seq(rule("is_not_null", Map("column" -> path), s"${path}_is_null",
          criticality, fieldMeta, "completeness")) else Seq.empty) ++
      (if (boolOf(prop.get("unique")))
        Seq(rule("is_unique", Map("columns" -> Seq(path)), s"${path}_not_unique",
          criticality, fieldMeta, "uniqueness")) else Seq.empty)

    val opts = prop.get("logicalTypeOptions").collect { case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]] }.getOrElse(Map.empty)
    direct ++ optionRules(path, logicalType, opts, fieldMeta, criticality)
  }

  private def optionRules(path: String, logicalType: String, opts: Map[String, Any],
                          meta: Map[String, Any], crit: String): Seq[Map[String, Any]] = {
    val pattern = opts.get("pattern").flatMap(v => str(Some(v))).map { re =>
      rule("regex_match", Map("column" -> path, "regex" -> re),
        s"${path}_invalid_pattern", crit, meta, "validity")
    }
    val minimum = opts.get("minimum")
    val maximum = opts.get("maximum")
    val floats = minimum.exists(isFloatLike) || maximum.exists(isFloatLike)
    val range = (minimum, maximum) match {
      case (Some(lo), Some(hi)) =>
        if (floats) Some(rule("sql_expression",
          Map("expression" -> s"$path >= $lo AND $path <= $hi", "columns" -> Seq(path)),
          s"${path}_out_of_range", crit, meta, "validity"))
        else Some(rule("is_in_range",
          Map("column" -> path, "min_limit" -> lo, "max_limit" -> hi),
          s"${path}_out_of_range", crit, meta, "validity"))
      case (Some(lo), None) =>
        if (floats) Some(rule("sql_expression",
          Map("expression" -> s"$path >= $lo", "columns" -> Seq(path)),
          s"${path}_below_minimum", crit, meta, "validity"))
        else Some(rule("is_aggr_not_less_than",
          Map("column" -> path, "limit" -> lo, "aggr_type" -> "min"),
          s"${path}_below_minimum", crit, meta, "validity"))
      case (None, Some(hi)) =>
        if (floats) Some(rule("sql_expression",
          Map("expression" -> s"$path <= $hi", "columns" -> Seq(path)),
          s"${path}_above_maximum", crit, meta, "validity"))
        else Some(rule("is_aggr_not_greater_than",
          Map("column" -> path, "limit" -> hi, "aggr_type" -> "max"),
          s"${path}_above_maximum", crit, meta, "validity"))
      case _ => None
    }
    val minLen = opts.get("minLength").flatMap(v => str(Some(v))).map(_.toInt)
    val maxLen = opts.get("maxLength").flatMap(v => str(Some(v))).map(_.toInt)
    val length = (minLen, maxLen) match {
      case (Some(lo), Some(hi)) if lo == hi => Some(rule("sql_expression",
        Map("expression" -> s"LENGTH($path) = $lo", "columns" -> Seq(path)),
        s"${path}_invalid_length", crit, meta, "validity"))
      case (Some(lo), Some(hi)) => Some(rule("sql_expression",
        Map("expression" -> s"LENGTH($path) >= $lo AND LENGTH($path) <= $hi", "columns" -> Seq(path)),
        s"${path}_invalid_length", crit, meta, "validity"))
      case (Some(lo), None) => Some(rule("sql_expression",
        Map("expression" -> s"LENGTH($path) >= $lo", "columns" -> Seq(path)),
        s"${path}_too_short", crit, meta, "validity"))
      case (None, Some(hi)) => Some(rule("sql_expression",
        Map("expression" -> s"LENGTH($path) <= $hi", "columns" -> Seq(path)),
        s"${path}_too_long", crit, meta, "validity"))
      case _ => None
    }
    val format = str(opts.get("format")).filter(_ =>
      Set("date", "timestamp", "datetime").contains(logicalType)).map { fmt =>
      if (logicalType == "date")
        rule("is_valid_date", Map("column" -> path, "date_format" -> fmt),
          s"${path}_valid_date_format", crit, meta, "validity")
      else
        rule("is_valid_timestamp", Map("column" -> path, "timestamp_format" -> fmt),
          s"${path}_valid_timestamp_format", crit, meta, "validity")
    }
    pattern.toSeq ++ range.toSeq ++ length.toSeq ++ format.toSeq
  }

  // --------------------------------------------------------- explicit rules

  private def explicitRules(quality: Seq[Map[String, Any]], property: Option[String],
                            meta: Map[String, Any], crit: String): Seq[Map[String, Any]] =
    quality.flatMap { q =>
      val isDqx = str(q.get("type")).contains("custom") && str(q.get("engine")).contains("dqx")
      if (!isDqx) None
      else q.get("implementation").collect { case impl: Map[_, _] =>
        val im = impl.asInstanceOf[Map[String, Any]]
        im.get("check").collect { case check: Map[_, _] =>
          val fieldMeta = property.map(p => meta + ("field" -> p)).getOrElse(meta)
          Map(
            "check" -> check.asInstanceOf[Map[String, Any]],
            "name" -> str(im.get("name")).getOrElse("unnamed_rule"),
            "criticality" -> str(im.get("criticality")).getOrElse(crit),
            "user_metadata" -> (fieldMeta + ("rule_type" -> "explicit"))
              .map { case (k, v) => k -> String.valueOf(v) }) ++
            str(im.get("filter")).map("filter" -> _)
        }
      }.flatten
    }
}
