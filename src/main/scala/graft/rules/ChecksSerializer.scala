package graft.rules

import graft.core.Criticality
import org.yaml.snakeyaml.Yaml

import scala.jdk.CollectionConverters._

/** Metadata (YAML/JSON dict) <-> rules (reference checks_serializer.py:238-409,
  * checks_validator.py:52-116). The canonical metadata shape:
  *
  * {{{
  * - name: optional_rule_name
  *   criticality: error | warn
  *   check:
  *     function: is_not_null
  *     arguments: { column: a }
  *     for_each_column: [a, b]   # expands one template x N columns
  *   filter: "b > 1"
  *   user_metadata: { k: v }
  * }}}
  */
object ChecksSerializer {

  private val allowedTopKeys = Set("name", "criticality", "check", "filter", "user_metadata", "message_expr")
  private val allowedCheckKeys = Set("function", "arguments", "for_each_column")

  /** YAML loader with a TYPED `!!timestamp` construct: date-only scalars
    * load as `java.sql.Date`, naive timestamps (incl. explicit midnight) as
    * `java.sql.Timestamp` in the text's own wall time, and tz-suffixed
    * scalars as the exact instant — replacing snakeyaml's java.util.Date,
    * which loses the original wall time for offset-suffixed inputs
    * (PyYAML/safe_load parity; see CheckUtils.parseYamlTimestampScalar).
    */
  private def typedLoader(): Yaml = {
    val ctor = new org.yaml.snakeyaml.constructor.SafeConstructor(
      new org.yaml.snakeyaml.LoaderOptions) {
      yamlConstructors.put(org.yaml.snakeyaml.nodes.Tag.TIMESTAMP,
        new org.yaml.snakeyaml.constructor.AbstractConstruct {
          override def construct(node: org.yaml.snakeyaml.nodes.Node): AnyRef =
            graft.core.CheckUtils.parseYamlTimestampScalar(
              node.asInstanceOf[org.yaml.snakeyaml.nodes.ScalarNode].getValue)
        })
    }
    new Yaml(ctor)
  }

  /** Parse YAML (or JSON — YAML superset) into check dicts. */
  def parseYaml(content: String): Seq[Map[String, Any]] = {
    val yaml = typedLoader()
    val parsed = yaml.load[Any](content)
    toScala(parsed) match {
      case s: Seq[_] => s.map(_.asInstanceOf[Map[String, Any]])
      case m: Map[_, _] => Seq(m.asInstanceOf[Map[String, Any]])
      case null => Seq.empty
      case other => throw new IllegalArgumentException(s"Expected a list of checks, got: $other")
    }
  }

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] => m.asScala.map { case (k, x) => String.valueOf(k) -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toSeq
    case other => other
  }

  private def toJava(v: Any): Any = v match {
    case m: Map[_, _] => m.map { case (k, x) => String.valueOf(k) -> toJava(x) }.asJava
    case s: Seq[_] => s.map(toJava).asJava
    case other => other
  }

  /** Render check dicts back to YAML (save_checks path). */
  def toYaml(checks: Seq[Map[String, Any]]): String =
    new Yaml().dump(checks.map(toJava).asJava)

  /** Single-value encode/decode for storage round-trips (YAML is faithful for
    * strings/numbers/booleans/lists/maps — quoted strings stay strings).
    */
  def encodeScalar(v: Any): String = new Yaml().dump(toJava(v)).stripLineEnd
  def decodeScalar(s: String): Any = toScala(typedLoader().load[Any](s))

  /** Structural validation against the allow-list schema. Returns error
    * strings; empty = valid (checks_validator.py:52-116).
    */
  def validateChecks(checks: Seq[Map[String, Any]]): Seq[String] =
    checks.zipWithIndex.flatMap { case (c, i) =>
      val unknownTop = c.keySet -- allowedTopKeys
      val base = if (unknownTop.nonEmpty) Seq(s"check[$i]: unknown keys ${unknownTop.mkString(",")}") else Seq.empty
      c.get("check") match {
        case Some(ch: Map[_, _]) =>
          val chm = ch.asInstanceOf[Map[String, Any]]
          val unknownCheck = chm.keySet -- allowedCheckKeys
          val e1 = if (unknownCheck.nonEmpty) Seq(s"check[$i].check: unknown keys ${unknownCheck.mkString(",")}") else Seq.empty
          val e2 = chm.get("function") match {
            case Some(f: String) =>
              if (scala.util.Try(CheckRegistry.resolve(f)).isFailure) Seq(s"check[$i]: unknown function '$f'") else Seq.empty
            case _ => Seq(s"check[$i]: check.function is required")
          }
          val e3 = c.get("criticality") match {
            case Some(cr: String) if scala.util.Try(Criticality.fromString(cr)).isFailure =>
              Seq(s"check[$i]: invalid criticality '$cr'")
            case _ => Seq.empty
          }
          base ++ e1 ++ e2 ++ e3
        case Some(other) => base :+ s"check[$i]: 'check' must be a mapping, got $other"
        case None => base :+ s"check[$i]: 'check' is required"
      }
    }

  /** Variable substitution in check metadata (reference utils.py:696-820):
    * `${name}` AND the reference's whitespace-tolerant `{{ name }}`
    * placeholders in any string value, recursively; dict KEYS are never
    * substituted. Unresolved `{{ ... }}` placeholders are left verbatim
    * with a warning (they may resolve at runtime, e.g. sql_query).
    */
  def substituteVariables(checks: Seq[Map[String, Any]], vars: Map[String, String]): Seq[Map[String, Any]] = {
    val braced = java.util.regex.Pattern.compile("\\{\\{[ \\t]*([^{}]*?)[ \\t]*\\}\\}")
    val unresolved = scala.collection.mutable.ListBuffer.empty[String]
    def sub(v: Any): Any = v match {
      case s: String =>
        val dollar = vars.foldLeft(s) { case (acc, (k, value)) => acc.replace(s"$${$k}", value) }
        val m = braced.matcher(dollar)
        val out = new java.lang.StringBuilder
        var last = 0
        while (m.find()) {
          out.append(dollar, last, m.start())
          vars.get(m.group(1)) match {
            case Some(value) => out.append(value)
            case None => unresolved += m.group(1); out.append(m.group(0))
          }
          last = m.end()
        }
        out.append(dollar, last, dollar.length).toString
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].map { case (k, x) => k -> sub(x) }
      case xs: Seq[_] => xs.map(sub)
      case other => other
    }
    val result = checks.map(c => sub(c).asInstanceOf[Map[String, Any]])
    if (unresolved.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"Unresolved placeholders found: ${unresolved.distinct.mkString(", ")}. " +
          "They may be resolved at runtime for certain checks (e.g. sql_query).")
    result
  }

  /** Typed variable resolution (reference utils.py:779-820 resolve_variables):
    * values must be SCALARS — str / integral / floating / bool / BigDecimal /
    * date / datetime / time — and are stringified with Python's `str()`
    * conventions (True/False capitalization; "yyyy-MM-dd HH:mm:ss" datetimes
    * with microseconds only when nonzero) before substitution. Collection
    * values are rejected, like the reference's InvalidParameterError.
    */
  def resolveVariables(checks: Seq[Map[String, Any]], vars: Map[String, Any]): Seq[Map[String, Any]] =
    if (vars.isEmpty) checks
    else substituteVariables(checks, vars.map { case (k, v) => k -> scalarVariableText(k, v) })

  /** Python `repr(float)` conventions (ADVICE r10 #5): fixed-point when the
    * decimal exponent is in [-4, 16), else scientific with a lowercase 'e',
    * an explicit sign and >= 2 exponent digits — so substituted SQL matches
    * what the reference's `str()` interpolation emits ("1e+20" not "1.0E20",
    * "1e-05" not "1.0E-5"). Digits come from Java's shortest-unique
    * Double.toString; only the FORMATTING is re-done Python-style.
    *
    * Residual divergence (ADVICE r11, documented, not chased): Java's
    * Double.toString guarantees a round-trippable digit string but not
    * Python's SHORTEST one, so boundary magnitudes can render with extra
    * digits — e.g. Double.MIN_VALUE gives "4.9e-324" where Python repr
    * (5e-324) is "5e-324". Both parse back to the identical double, so
    * substituted SQL stays value-correct; only the literal's spelling can
    * differ from the reference's str() at such extremes.
    */
  private[graft] def pyFloatRepr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d == Double.PositiveInfinity) return "inf"
    if (d == Double.NegativeInfinity) return "-inf"
    val sign = if (d < 0.0 || (d == 0.0 && 1.0 / d < 0.0)) "-" else ""
    val (mant, e) = java.lang.Double.toString(math.abs(d)).split("E") match {
      case Array(m)     => (m, 0)
      case Array(m, ex) => (m, ex.toInt)
    }
    val dot = mant.indexOf('.')
    val digits = mant.replace(".", "")
    val lead = digits.takeWhile(_ == '0').length
    val sig0 = digits.drop(lead).reverse.dropWhile(_ == '0').reverse
    if (sig0.isEmpty) return sign + "0.0"
    // exponent of the first significant digit: d = 0.sig * 10^(dot - lead + e)
    val exp10 = dot - lead - 1 + e
    if (exp10 >= 16 || exp10 < -4) {
      val m2 = if (sig0.length == 1) sig0 else s"${sig0.head}.${sig0.tail}"
      val es = if (exp10 < 0) f"-${-exp10}%02d" else f"+$exp10%02d"
      s"$sign${m2}e$es"
    } else if (exp10 >= 0) {
      val ints = if (sig0.length > exp10 + 1) sig0.take(exp10 + 1) else sig0.padTo(exp10 + 1, '0')
      val frac = if (sig0.length > exp10 + 1) sig0.drop(exp10 + 1) else ""
      s"$sign$ints.${if (frac.isEmpty) "0" else frac}"
    } else {
      s"${sign}0." + ("0" * (-exp10 - 1)) + sig0
    }
  }

  def scalarVariableText(key: String, v: Any): String = {
    def timeText(h: Int, mi: Int, s: Int, nanos: Int): String = {
      val base = f"$h%02d:$mi%02d:$s%02d"
      if (nanos == 0) base else f"$base.${nanos / 1000}%06d"
    }
    v match {
      case s: String => s
      case b: Boolean => if (b) "True" else "False" // Python str(bool)
      case n @ (_: Int | _: Long | _: Short | _: Byte | _: java.math.BigInteger | _: BigInt) =>
        n.toString
      case d: java.math.BigDecimal => d.toPlainString
      case d: BigDecimal => d.underlying.toPlainString
      case d: Double => pyFloatRepr(d)
      // a Float's shortest decimal form re-parsed as Double keeps the value
      // the user wrote (1e-5f -> "1e-05", not "9.999999747378752e-06")
      case f: Float => pyFloatRepr(f.toString.toDouble)
      case d: java.time.LocalDate => d.toString
      case d: java.sql.Date => d.toString
      case t: java.time.LocalTime => timeText(t.getHour, t.getMinute, t.getSecond, t.getNano)
      case dt: java.time.LocalDateTime =>
        s"${dt.toLocalDate} ${timeText(dt.getHour, dt.getMinute, dt.getSecond, dt.getNano)}"
      case ts: java.sql.Timestamp =>
        val dt = ts.toLocalDateTime
        s"${dt.toLocalDate} ${timeText(dt.getHour, dt.getMinute, dt.getSecond, dt.getNano)}"
      case other =>
        throw new IllegalArgumentException(
          s"Variable '$key' has unsupported type '${if (other == null) "null" else other.getClass.getSimpleName}'. " +
            "Only scalar types are supported: str, int, float, bool, Decimal, date, datetime, time.")
    }
  }

  /** Semantic validation beyond structure (reference
    * checks_semantic_validator.py): duplicate rule names and duplicate
    * fingerprints (same function+arguments+filter at the same criticality).
    */
  def validateChecksSemantics(checks: Seq[Map[String, Any]]): Seq[String] = {
    val named = checks.flatMap(c => c.get("name").map(String.valueOf))
    val dupNames = named.groupBy(identity).collect { case (n, xs) if xs.size > 1 => n }
    val sigs = checks.map(c => (c.get("check"), c.get("criticality"), c.get("filter")))
    val dupDefs = sigs.groupBy(identity).collect { case (_, xs) if xs.size > 1 => xs.size }
    dupNames.map(n => s"duplicate rule name: $n").toSeq ++
      (if (dupDefs.nonEmpty) Seq(s"${dupDefs.sum - dupDefs.size} duplicate check definition(s)") else Seq.empty)
  }

  /** Deserialize validated check dicts into rules, expanding for_each_column
    * (checks_serializer.py:238-364).
    */
  def deserialize(checks: Seq[Map[String, Any]], ctx: ResolveCtx): Seq[DQRule] = {
    val errors = validateChecks(checks)
    require(errors.isEmpty, s"Invalid checks:\n${errors.mkString("\n")}")
    checks.flatMap { c =>
      val check = c("check").asInstanceOf[Map[String, Any]]
      val function = check("function").asInstanceOf[String]
      val baseArgs = check.getOrElse("arguments", Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
      // entries are column names/expressions, or LISTS of columns for the
      // composite-key dataset checks (reference: is_unique for_each_column
      // with [[col3, col5], [col1]])
      val forEach: Option[Seq[Any]] = check.get("for_each_column").map {
        case s: Seq[_] => s.map {
          // parseYaml's toScala already deep-converts java collections
          case inner: Seq[_] => inner.map(String.valueOf)
          case one => String.valueOf(one)
        }
        case other => Seq(String.valueOf(other))
      }
      val criticality = c.get("criticality").map(v => Criticality.fromString(String.valueOf(v)))
        .getOrElse(Criticality.Error)
      val filter = c.get("filter").map(String.valueOf)
      val messageExpr = c.get("message_expr").map(String.valueOf)
      val name = c.get("name").map(String.valueOf).getOrElse("")
      val userMeta = c.get("user_metadata").map(_.asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> String.valueOf(v) }).getOrElse(Map.empty[String, String])

      val argSets: Seq[(Map[String, Any], String)] = forEach match {
        case Some(cols) =>
          // expand template x N columns; suffix auto-names per column
          cols.map {
            case cs: Seq[_] =>
              (baseArgs + (columnArgKey(function) -> cs.map(String.valueOf)),
                cs.map(String.valueOf).mkString("_"))
            case cn => (baseArgs + (columnArgKey(function) -> cn), String.valueOf(cn))
          }
        case None => Seq((baseArgs, ""))
      }
      argSets.map { case (args, suffixCol) =>
        // reference sql_expression/sql_query also accept `name` INSIDE
        // arguments; the top-level key wins when both are present
        val effName =
          if (name.nonEmpty) name
          else args.get("name").map(String.valueOf).getOrElse("")
        val ruleName = (effName, suffixCol) match {
          case ("", _) => ""
          case (n, "") => n
          case (n, sc) => s"${n}_$sc"
        }
        buildRule(function, args, ruleName, criticality, filter, userMeta, ctx, messageExpr)
      }
    }
  }

  /** Dataset checks taking a columns LIST expand for_each_column into that key. */
  private def columnArgKey(function: String): String = function match {
    case "is_unique" | "foreign_key" | "compare_datasets" => "columns"
    case _ => "column"
  }

  /** Column names surfaced in the result struct, from the arguments. */
  def columnsOf(args: Map[String, Any]): Seq[String] = {
    def asSeq(v: Any): Seq[String] = v match {
      case s: Seq[_] => s.map(String.valueOf)
      case l: java.util.List[_] => l.asScala.toSeq.map(String.valueOf)
      case other => Seq(String.valueOf(other))
    }
    args.get("columns").map(asSeq)
      .orElse(args.get("column").map(asSeq))
      .orElse(args.get("column1").map(c1 => asSeq(c1) ++ args.get("column2").map(asSeq).getOrElse(Seq.empty)))
      .getOrElse(Seq.empty)
  }

  def buildRule(function: String, args: Map[String, Any], name: String,
                criticality: Criticality, filter: Option[String],
                userMetadata: Map[String, String], ctx: ResolveCtx,
                messageExpr: Option[String] = None): DQRule = {
    CheckRegistry.resolve(function) match {
      case RowCheckFn(build) =>
        DQRowRule(build(CheckArgs(args)), function, columnsOf(args), name, criticality,
          filter, userMetadata, args, messageExpr)
      case DatasetCheckFn(build) =>
        // the rule-level filter is ALSO pushed into the aggregation as
        // row_filter (reference rule.py:471-473) so group metrics only see
        // filtered rows; the engine separately gates the per-row result
        val argsWithFilter = filter match {
          case Some(f) if !args.contains("row_filter") => args + ("row_filter" -> f)
          case _ => args
        }
        DQDatasetRule(build(CheckArgs(argsWithFilter), ctx), function, columnsOf(args),
          name, criticality, filter, userMetadata, args, messageExpr)
    }
  }

  /** Serialize rules back to metadata dicts (round-trip for storage). */
  def serialize(rules: Seq[DQRule]): Seq[Map[String, Any]] =
    rules.map { r =>
      Map(
        "name" -> r.resolvedName,
        "criticality" -> r.criticality.value,
        "check" -> (Map("function" -> r.function) ++
          (if (r.arguments.nonEmpty) Map("arguments" -> r.arguments) else Map.empty))
      ) ++ r.filter.map("filter" -> _).toMap ++
        r.messageExpr.map("message_expr" -> _).toMap ++
        (if (r.userMetadata.nonEmpty) Map("user_metadata" -> r.userMetadata) else Map.empty)
    }
}
