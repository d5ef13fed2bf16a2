package graft.queries

import graft.checks.{NetChecks, RowChecks => R}
import graft.queries.QueryDefs._
import org.apache.spark.sql.functions._

/** Driver-contract queries for every row-level check (SURVEY §2.1).
  *
  * Where the raw tables have no failing values, the input frame derives a
  * column with planted bad values — the SAME derivation is written into the
  * DuckDB oracle, so both engines see identical inputs.
  */
object RowCheckQueries {

  val all: Seq[(String, QueryDef)] = Seq(

    "row_is_not_null" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("acct", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
        failing(df, row(R.isNotNull(col("acct")), "is_not_null", "acct"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM (SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS acct FROM customer)
             |WHERE acct IS NULL ORDER BY 1""".stripMargin)),

    "row_is_null" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("acct", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
        failing(df, row(R.isNull(col("acct")), "is_null", "acct"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM (SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS acct FROM customer)
             |WHERE acct IS NOT NULL ORDER BY 1""".stripMargin)),

    "row_is_not_null_and_not_empty" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("seg", when(col("c_mktsegment") === "BUILDING", lit("")).otherwise(col("c_mktsegment")))
        failing(df, row(R.isNotNullAndNotEmpty(col("seg")), "is_not_null_and_not_empty", "seg"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM (SELECT c_custkey, CASE WHEN c_mktsegment = 'BUILDING' THEN '' ELSE c_mktsegment END AS seg FROM customer)
             |WHERE seg IS NULL OR seg = '' ORDER BY 1""".stripMargin)),

    "row_is_not_empty" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("seg", when(col("c_mktsegment") === "MACHINERY", lit("")).otherwise(col("c_mktsegment")))
        failing(df, row(R.isNotEmpty(col("seg")), "is_not_empty", "seg"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM (SELECT c_custkey, CASE WHEN c_mktsegment = 'MACHINERY' THEN '' ELSE c_mktsegment END AS seg FROM customer)
             |WHERE seg = '' ORDER BY 1""".stripMargin)),

    "row_is_empty" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("seg", when(col("c_mktsegment") === "MACHINERY", lit("")).otherwise(col("c_mktsegment")))
        failing(df, row(R.isEmpty(col("seg")), "is_empty", "seg"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM (SELECT c_custkey, CASE WHEN c_mktsegment = 'MACHINERY' THEN '' ELSE c_mktsegment END AS seg FROM customer)
             |WHERE seg != '' ORDER BY 1""".stripMargin)),

    "row_is_null_or_empty" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("seg", when(col("c_custkey") % 10 === 0, lit(null)).otherwise(col("c_mktsegment")))
        failing(df, row(R.isNullOrEmpty(col("seg")), "is_null_or_empty", "seg"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM (SELECT c_custkey, CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_mktsegment END AS seg FROM customer)
             |WHERE seg IS NOT NULL AND seg != '' ORDER BY 1""".stripMargin)),

    "row_has_valid_string_case" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "part")
          .withColumn("nm", when(col("p_partkey") % 3 === 0, upper(col("p_name"))).otherwise(col("p_name")))
        failing(df, row(R.hasValidStringCase(col("nm"), "lower"), "has_valid_string_case", "nm"), Seq("p_partkey"))
      },
      Some("""SELECT p_partkey FROM (SELECT p_partkey, CASE WHEN p_partkey % 3 = 0 THEN upper(p_name) ELSE p_name END AS nm FROM part)
             |WHERE nm IS NOT NULL AND nm != lower(nm) ORDER BY 1""".stripMargin)),

    "row_is_not_null_and_is_in_list" -> QueryDef(
      (s, dir) => failing(t(s, dir, "orders"),
        row(R.isNotNullAndIsInList(col("o_orderstatus"), Seq("O", "F")), "is_not_null_and_is_in_list", "o_orderstatus"),
        Seq("o_orderkey")),
      Some("""SELECT o_orderkey FROM orders
             |WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F') ORDER BY 1""".stripMargin)),

    "row_is_in_list" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        row(R.isInList(col("l_returnflag"), Seq("A", "N")), "is_in_list", "l_returnflag"),
        Seq("l_orderkey", "l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N') ORDER BY 1, 2""".stripMargin)),

    "row_is_not_in_list" -> QueryDef(
      (s, dir) => failing(t(s, dir, "events"),
        row(R.isNotInList(col("event_type"), Seq("error")), "is_not_in_list", "event_type"),
        Seq("event_id")),
      Some("""SELECT event_id FROM events
             |WHERE event_type IS NOT NULL AND event_type IN ('error') ORDER BY 1""".stripMargin)),

    "row_sql_expression" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        row(R.sqlExpression("l_tax <= l_discount"), "sql_expression"),
        Seq("l_orderkey", "l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE NOT coalesce(l_tax <= l_discount, FALSE) ORDER BY 1, 2""".stripMargin)),

    "row_is_older_than_col2_for_n_days" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "lineitem").join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        failing(df, row(R.isOlderThanCol2ForNDays(col("o_orderdate"), col("l_shipdate"), 60),
          "is_older_than_col2_for_n_days", "o_orderdate", "l_shipdate"),
          Seq("l_orderkey", "l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderdate IS NOT NULL AND l_shipdate IS NOT NULL
             |  AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) >= 60
             |ORDER BY 1, 2""".stripMargin)),

    "row_is_older_than_n_days" -> QueryDef(
      (s, dir) => failing(t(s, dir, "orders"),
        row(R.isOlderThanNDays(col("o_orderdate"), 9000, Some(lit("2022-01-01").cast("date"))),
          "is_older_than_n_days", "o_orderdate"),
        Seq("o_orderkey")),
      Some("""SELECT o_orderkey FROM orders
             |WHERE o_orderdate IS NOT NULL
             |  AND date_diff('day', CAST(o_orderdate AS DATE), DATE '2022-01-01') >= 9000
             |ORDER BY 1""".stripMargin)),

    "row_is_not_in_future" -> QueryDef(
      (s, dir) => failing(t(s, dir, "events"),
        row(R.isNotInFuture(col("ts"), 0, Some(lit("2024-01-15 00:00:00").cast("timestamp"))),
          "is_not_in_future", "ts"),
        Seq("event_id")),
      Some("""SELECT event_id FROM events
             |WHERE ts IS NOT NULL AND ts > TIMESTAMP '2024-01-15 00:00:00' ORDER BY 1""".stripMargin)),

    "row_is_not_in_near_future" -> QueryDef(
      (s, dir) => failing(t(s, dir, "events"),
        row(R.isNotInNearFuture(col("ts"), 86400, Some(lit("2024-01-15 00:00:00").cast("timestamp"))),
          "is_not_in_near_future", "ts"),
        Seq("event_id")),
      Some("""SELECT event_id FROM events
             |WHERE ts IS NOT NULL AND ts > TIMESTAMP '2024-01-15 00:00:00'
             |  AND ts < TIMESTAMP '2024-01-16 00:00:00' ORDER BY 1""".stripMargin)),

    "row_is_equal_to" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        row(R.isEqualTo(col("l_linestatus"), "'O'"), "is_equal_to", "l_linestatus"),
        Seq("l_orderkey", "l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_linestatus IS NOT NULL AND l_linestatus != 'O' ORDER BY 1, 2""".stripMargin)),

    "row_is_not_equal_to" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        row(R.isNotEqualTo(col("l_linestatus"), "'F'"), "is_not_equal_to", "l_linestatus"),
        Seq("l_orderkey", "l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_linestatus IS NOT NULL AND l_linestatus = 'F' ORDER BY 1, 2""".stripMargin)),

    "row_is_not_less_than" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        row(R.isNotLessThan(col("l_extendedprice"), 1500.0), "is_not_less_than", "l_extendedprice"),
        Seq("l_orderkey", "l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_extendedprice IS NOT NULL AND l_extendedprice < 1500.0 ORDER BY 1, 2""".stripMargin)),

    "row_is_not_greater_than" -> QueryDef(
      (s, dir) => failing(t(s, dir, "orders"),
        row(R.isNotGreaterThan(col("o_totalprice"), 250000.0), "is_not_greater_than", "o_totalprice"),
        Seq("o_orderkey")),
      Some("""SELECT o_orderkey FROM orders
             |WHERE o_totalprice IS NOT NULL AND o_totalprice > 250000.0 ORDER BY 1""".stripMargin)),

    "row_is_in_range" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        row(R.isInRange(col("l_quantity"), 1, 25), "is_in_range", "l_quantity"),
        Seq("l_orderkey", "l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 25) ORDER BY 1, 2""".stripMargin)),

    "row_is_not_in_range" -> QueryDef(
      (s, dir) => failing(t(s, dir, "lineitem"),
        row(R.isNotInRange(col("l_discount"), 0.02, 0.04), "is_not_in_range", "l_discount"),
        Seq("l_orderkey", "l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_discount IS NOT NULL AND l_discount >= 0.02 AND l_discount <= 0.04 ORDER BY 1, 2""".stripMargin)),

    "row_regex_match" -> QueryDef(
      (s, dir) => failing(t(s, dir, "orders"),
        row(R.regexMatch(col("o_orderpriority"), "^[1-3]-"), "regex_match", "o_orderpriority"),
        Seq("o_orderkey")),
      Some("""SELECT o_orderkey FROM orders
             |WHERE o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^[1-3]-')
             |ORDER BY 1""".stripMargin)),

    "row_is_not_null_and_not_empty_array" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "documents")
          .withColumn("toks", when(col("doc_id") % 7 === 0, array().cast("array<string>"))
            .otherwise(split(col("text"), " ")))
        failing(df, row(R.isNotNullAndNotEmptyArray(col("toks")), "is_not_null_and_not_empty_array", "toks"),
          Seq("doc_id"))
      },
      Some("""SELECT doc_id FROM (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN [] ELSE string_split(text, ' ') END AS toks FROM documents)
             |WHERE toks IS NULL OR len(toks) = 0 ORDER BY 1""".stripMargin)),

    "row_is_valid_date" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "orders")
          .withColumn("dstr", when(col("o_orderkey") % 5 === 0, lit("not-a-date"))
            .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")))
        failing(df, row(R.isValidDate(col("dstr")), "is_valid_date", "dstr"), Seq("o_orderkey"))
      },
      Some("""SELECT o_orderkey FROM (SELECT o_orderkey, CASE WHEN o_orderkey % 5 = 0 THEN 'not-a-date' ELSE strftime(o_orderdate, '%Y-%m-%d') END AS dstr FROM orders)
             |WHERE dstr IS NOT NULL AND try_cast(dstr AS DATE) IS NULL ORDER BY 1""".stripMargin)),

    "row_is_valid_timestamp" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "events")
          .withColumn("tstr", when(col("event_id") % 3 === 0, lit("garbage"))
            .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")))
        failing(df, row(R.isValidTimestamp(col("tstr")), "is_valid_timestamp", "tstr"), Seq("event_id"))
      },
      Some("""SELECT event_id FROM (SELECT event_id, CASE WHEN event_id % 3 = 0 THEN 'garbage' ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS tstr FROM events)
             |WHERE tstr IS NOT NULL AND try_cast(tstr AS TIMESTAMP) IS NULL ORDER BY 1""".stripMargin)),

    "row_is_valid_ipv4_address" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "events")
          .withColumn("ip", when(col("event_id") % 10 === 0,
            format_string("999.%d.0.1", col("user_id")))
            .otherwise(format_string("10.%d.%d.%d", col("user_id") % 256, col("event_id") % 256, col("user_id") % 100)))
        failing(df, row(R.isValidIpv4Address(col("ip")), "is_valid_ipv4_address", "ip"), Seq("event_id"))
      },
      Some("""SELECT event_id FROM events WHERE event_id % 10 = 0 ORDER BY 1""".stripMargin)),

    "row_is_ipv4_address_in_cidr" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "events")
          .withColumn("ip", when(col("event_id") % 5 === 0,
            format_string("11.0.%d.1", col("user_id") % 256))
            .otherwise(format_string("10.0.%d.%d", col("event_id") % 256, col("user_id") % 256)))
        failing(df, row(NetChecks.isIpv4AddressInCidr(col("ip"), "10.0.0.0/16"), "is_ipv4_address_in_cidr", "ip"),
          Seq("event_id"))
      },
      Some("""SELECT event_id FROM events WHERE event_id % 5 = 0 ORDER BY 1""".stripMargin)),

    "row_is_valid_ipv6_address" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "events")
          .withColumn("ip6", when(col("event_id") % 4 === 0, lit("zzzz::1"))
            .otherwise(format_string("2001:db8::%d", col("user_id") % 9999)))
        failing(df, row(NetChecks.isValidIpv6Address(col("ip6")), "is_valid_ipv6_address", "ip6"), Seq("event_id"))
      },
      Some("""SELECT event_id FROM events WHERE event_id % 4 = 0 ORDER BY 1""".stripMargin)),

    "row_is_ipv6_address_in_cidr" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "events")
          .withColumn("ip6", when(col("event_id") % 6 === 0, lit("fe80::1"))
            .otherwise(format_string("2001:db8::%d", col("user_id") % 9999)))
        failing(df, row(NetChecks.isIpv6AddressInCidr(col("ip6"), "2001:db8::/32"), "is_ipv6_address_in_cidr", "ip6"),
          Seq("event_id"))
      },
      Some("""SELECT event_id FROM events WHERE event_id % 6 = 0 ORDER BY 1""".stripMargin)),

    "row_is_valid_email" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("email", when(col("c_custkey") % 4 === 0, lit("bad@@example..com"))
            .otherwise(format_string("user%d@example.com", col("c_custkey"))))
        failing(df, row(R.isValidEmail(col("email")), "is_valid_email", "email"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer WHERE c_custkey % 4 = 0 ORDER BY 1""".stripMargin)),

    "row_is_valid_national_id" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("ssn", when(col("c_custkey") % 3 === 0, lit("000-12-3456"))
            .otherwise(lit("123-45-6789")))
        failing(df, row(R.isValidNationalId(col("ssn"), "us"), "is_valid_national_id", "ssn"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0 ORDER BY 1""".stripMargin)),

    "row_is_valid_national_id_multi" -> QueryDef(
      (s, dir) => {
        // Spanish DNI: 8 digits + letter; bad rows get a 7-digit body
        val df = t(s, dir, "customer")
          .withColumn("nid", when(col("c_custkey") % 7 === 0, lit("1234567A"))
            .otherwise(lit("12345678Z")))
        failing(df, row(R.isValidNationalId(col("nid"), "es"), "is_valid_national_id", "nid"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer WHERE c_custkey % 7 = 0 ORDER BY 1""".stripMargin)),

    "row_is_valid_country_code_numeric" -> QueryDef(
      (s, dir) => {
        // 840 = US, 999 unassigned
        val df = t(s, dir, "customer")
          .withColumn("cc", when(col("c_custkey") % 8 === 0, lit("999")).otherwise(lit("840")))
        failing(df, row(R.isValidCountryCode(col("cc"), "numeric"), "is_valid_country_code", "cc"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer WHERE c_custkey % 8 = 0 ORDER BY 1""".stripMargin)),

    "row_is_valid_country_code" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("cc", when(col("c_custkey") % 4 === 0, lit("XX")).otherwise(lit("US")))
        failing(df, row(R.isValidCountryCode(col("cc")), "is_valid_country_code", "cc"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer WHERE c_custkey % 4 = 0 ORDER BY 1""".stripMargin)),

    "row_is_valid_currency_code" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "supplier")
          .withColumn("cur", when(col("s_suppkey") % 5 === 0, lit("XYZ")).otherwise(lit("USD")))
        failing(df, row(R.isValidCurrencyCode(col("cur")), "is_valid_currency_code", "cur"), Seq("s_suppkey"))
      },
      Some("""SELECT s_suppkey FROM supplier WHERE s_suppkey % 5 = 0 ORDER BY 1""".stripMargin)),

    "row_is_valid_subdivision_code" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("sub", when(col("c_custkey") % 6 === 0, lit("US-ZZ")).otherwise(lit("US-CA")))
        failing(df, row(R.isValidSubdivisionCode(col("sub"), "US"), "is_valid_subdivision_code", "sub"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer WHERE c_custkey % 6 = 0 ORDER BY 1""".stripMargin)),

    "row_is_valid_subdivision_multi" -> QueryDef(
      (s, dir) => {
        // rotate through three countries from the full registry; every 6th row invalid
        val df = t(s, dir, "customer")
          .withColumn("sub", when(col("c_custkey") % 6 === 0, lit("FR-99"))
            .otherwise(when(col("c_custkey") % 3 === 0, lit("FR-13"))
              .when(col("c_custkey") % 3 === 1, lit("JP-13"))
              .otherwise(lit("GB-BIR"))))
        val rules = Seq(
          row(R.isValidSubdivisionCode(col("sub"), "FR"), "is_valid_subdivision_code", "sub")
            .copy(filter = Some("c_custkey % 3 = 0")),
          row(R.isValidSubdivisionCode(col("sub"), "JP"), "is_valid_subdivision_code", "sub")
            .copy(name = "jp_sub", filter = Some("c_custkey % 3 = 1")),
          row(R.isValidSubdivisionCode(col("sub"), "GB"), "is_valid_subdivision_code", "sub")
            .copy(name = "gb_sub", filter = Some("c_custkey % 3 = 2")))
        graft.engine.DQEngine.applyChecks(df, rules)
          .where(col("_errors").isNotNull)
          .select("c_custkey").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_custkey % 6 = 0 ORDER BY 1""".stripMargin)),

    "row_is_valid_language_code" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "documents")
          .withColumn("lng", when(col("doc_id") % 5 === 0, lit("qq")).otherwise(col("lang")))
        failing(df, row(R.isValidLanguageCode(col("lng")), "is_valid_language_code", "lng"), Seq("doc_id"))
      },
      Some("""SELECT doc_id FROM documents WHERE doc_id % 5 = 0 ORDER BY 1""".stripMargin)),

    "row_is_data_fresh" -> QueryDef(
      (s, dir) => failing(t(s, dir, "events"),
        row(R.isDataFresh(col("ts"), 7200, Some(lit("2024-01-20 00:00:00").cast("timestamp"))),
          "is_data_fresh", "ts"),
        Seq("event_id")),
      Some("""SELECT event_id FROM events
             |WHERE ts IS NOT NULL AND ts < TIMESTAMP '2024-01-15 00:00:00' ORDER BY 1""".stripMargin)),

    "row_is_valid_json" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "events")
          .withColumn("js", when(col("event_id") % 9 === 0, lit("{bad")).otherwise(col("props")))
        failing(df, row(R.isValidJson(col("js")), "is_valid_json", "js"), Seq("event_id"))
      },
      Some("""SELECT event_id FROM events WHERE event_id % 9 = 0 ORDER BY 1""".stripMargin)),

    "row_has_json_keys" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "events")
          .withColumn("js", when(col("event_id") % 2 === 0, lit("""{"k": 1, "m": 2}""")).otherwise(col("props")))
        failing(df, row(R.hasJsonKeys(col("js"), Seq("k", "m")), "has_json_keys", "js"), Seq("event_id"))
      },
      Some("""SELECT event_id FROM events WHERE event_id % 2 != 0 ORDER BY 1""".stripMargin)),

    "row_has_valid_json_schema" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "events")
          .withColumn("js", when(col("event_id") % 11 === 0, lit("{broken")).otherwise(col("props")))
        failing(df, row(R.hasValidJsonSchema(col("js"), "k INT"), "has_valid_json_schema", "js"), Seq("event_id"))
      },
      Some("""SELECT event_id FROM events WHERE event_id % 11 = 0 ORDER BY 1""".stripMargin)),

    "row_is_latitude" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer").withColumn("lat", col("c_acctbal") / 100.0)
        failing(df, row(R.isLatitude(col("lat")), "is_latitude", "lat"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM (SELECT c_custkey, c_acctbal / 100.0 AS lat FROM customer)
             |WHERE lat IS NOT NULL AND NOT (lat BETWEEN -90 AND 90) ORDER BY 1""".stripMargin)),

    "row_is_longitude" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer").withColumn("lon", col("c_acctbal") / 50.0)
        failing(df, row(R.isLongitude(col("lon")), "is_longitude", "lon"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM (SELECT c_custkey, c_acctbal / 50.0 AS lon FROM customer)
             |WHERE lon IS NOT NULL AND NOT (lon BETWEEN -180 AND 180) ORDER BY 1""".stripMargin)),

    "row_geo_is_point" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("wkt", when(col("c_custkey") % 30 === 0, lit("LINESTRING (0 0, 1 1)"))
            .otherwise(format_string("POINT (%d %d)", col("c_custkey") % 360 - 180, col("c_custkey") % 180 - 90)))
        failing(df, row(graft.checks.GeoChecks.isPoint(col("wkt")), "is_point", "wkt"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer WHERE c_custkey % 30 = 0 ORDER BY 1""".stripMargin)),

    "row_geo_is_not_null_island" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("wkt", when(col("c_custkey") % 50 === 0, lit("POINT (0 0)"))
            .otherwise(format_string("POINT (%d %d)", col("c_custkey") % 179 + 1, col("c_custkey") % 89 + 1)))
        failing(df, row(graft.checks.GeoChecks.isNotNullIsland(col("wkt")), "is_not_null_island", "wkt"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer WHERE c_custkey % 50 = 0 ORDER BY 1""".stripMargin)),

    "row_geo_x_between" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("wkt", format_string("POINT (%d %d)", col("c_custkey") % 400 - 200, lit(10)))
        failing(df, row(graft.checks.GeoChecks.hasXCoordinateBetween(col("wkt"), -180, 180),
          "has_x_coordinate_between", "wkt"), Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer
             |WHERE NOT ((c_custkey % 400 - 200) BETWEEN -180 AND 180) ORDER BY 1""".stripMargin)),

    "row_does_not_contain_pii" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "customer")
          .withColumn("bio", when(col("c_custkey") % 5 === 0, concat(col("c_name"), lit(" contact user@example.com")))
            .when(col("c_custkey") % 7 === 0, concat(col("c_name"), lit(" ssn 123-45-6789")))
            .otherwise(col("c_name")))
        failing(df, row(graft.checks.PiiChecks.doesNotContainPii(col("bio")), "does_not_contain_pii", "bio"),
          Seq("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer
             |WHERE c_custkey % 5 = 0 OR c_custkey % 7 = 0 ORDER BY 1""".stripMargin)),

    // NER path: the shipped GazetteerNerEngine (public-list gazetteer +
    // context scorer) next to the regex registry. Documents text is all
    // lowercase (no capitalized spans), so only the planted spans can flag:
    // %7 plants "Dear James Smith," (gazetteer given+surname), %11 plants an
    // address shape; DuckDB replicates the planting arithmetic. Exercises the
    // full metadata-wireable engine end to end on the oracle gate.
    "row_does_not_contain_pii_ner" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "documents")
          .withColumn("body",
            when(col("doc_id") % 7 === 0, concat(lit("Dear James Smith, "), col("text")))
              .when(col("doc_id") % 11 === 0, concat(lit("Ship to 742 Evergreen Terrace. "), col("text")))
              .otherwise(col("text")))
        failing(df, row(graft.checks.PiiChecks.doesNotContainPii(col("body"),
          ner = Some(new graft.checks.GazetteerNerEngine())), "does_not_contain_pii", "body"),
          Seq("doc_id"))
      },
      Some("""SELECT doc_id FROM documents
             |WHERE doc_id % 7 = 0 OR doc_id % 11 = 0 ORDER BY 1""".stripMargin)),

    // ORG/LOC + uncased coverage for the gazetteer engine (VERDICT r6 "Next
    // #5"): %13 plants a cased ORG span (suffix shape "Acme Corp"), %17 a
    // cased LOC span (gazetteer phrase "New York"), %19 an ALL-LOWERCASE
    // person ("contact james smith") that only the uncased fallback pass can
    // flag — the base documents text is lowercase and stays clean under all
    // three detectors (vocab contains "group" of the org-suffix set but none
    // of the attachment cues).
    "row_does_not_contain_pii_ner_orgloc" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "documents")
          .withColumn("body",
            when(col("doc_id") % 13 === 0, concat(lit("Meeting at Acme Corp today. "), col("text")))
              .when(col("doc_id") % 17 === 0, concat(lit("Flights from New York depart. "), col("text")))
              .when(col("doc_id") % 19 === 0, concat(lit("contact james smith asap. "), col("text")))
              .otherwise(col("text")))
        failing(df, row(graft.checks.PiiChecks.doesNotContainPii(col("body"),
          ner = Some(new graft.checks.GazetteerNerEngine())), "does_not_contain_pii", "body"),
          Seq("doc_id"))
      },
      Some("""SELECT doc_id FROM documents
             |WHERE doc_id % 13 = 0 OR doc_id % 17 = 0 OR doc_id % 19 = 0 ORDER BY 1""".stripMargin)),

    // model-as-data NER (pii_detection_funcs.py:33 analog): a FIXED literal
    // perceptron model routed through the JSON (de)serialization path. Only
    // word-identity features carry weight, so the decode is fully determined
    // by the planted tokens (all-zero scores tie-break to "O"); the planted
    // names are absent from the synthetic corpus text.
    "row_does_not_contain_pii_ner_model" -> QueryDef(
      (s, dir) => {
        import graft.checks._
        val model = PerceptronNerModel(Map(
          "w=alverton" -> Array(0.0, 5.0, 0.0, 0.0, 0.0, 0.0, 0.0), // B-PERSON
          "w=quuxland" -> Array(0.0, 0.0, 0.0, 0.0, 0.0, 5.0, 0.0))) // B-LOC
        val loaded = PerceptronNerModelJson.parse(PerceptronNerModelJson.render(model))
        val df = t(s, dir, "documents")
          .withColumn("body",
            when(col("doc_id") % 9 === 0, concat(lit("Contact Alverton today. "), col("text")))
              .when(col("doc_id") % 23 === 0, concat(lit("Greetings from Quuxland. "), col("text")))
              .otherwise(col("text")))
        failing(df, row(PiiChecks.doesNotContainPii(col("body"),
          ner = Some(new PerceptronNerEngine(loaded))), "does_not_contain_pii", "body"),
          Seq("doc_id"))
      },
      Some("""SELECT doc_id FROM documents
             |WHERE doc_id % 9 = 0 OR doc_id % 23 = 0 ORDER BY 1""".stripMargin)),

    // The COMMITTED pretrained model through the out-of-the-box default
    // engine (r9): the planted name is absent from every public gazetteer
    // list, so only the bundled perceptron weights can flag it — the gate
    // fails if the shipped artifact loses that recall (reference ships
    // Presidio's trained models, pii/pii_detection_funcs.py:33).
    "row_does_not_contain_pii_pretrained" -> QueryDef(
      (s, dir) => {
        import graft.checks._
        val df = t(s, dir, "documents")
          .withColumn("body",
            when(col("doc_id") % 11 === 0,
              concat(lit("Please contact Quina Ashford about the invoice . "), col("text")))
              .otherwise(col("text")))
        failing(df, row(PiiChecks.doesNotContainPii(col("body"),
          ner = Some(new DefaultNerEngine())), "does_not_contain_pii", "body"),
          Seq("doc_id"))
      },
      Some("SELECT doc_id FROM documents WHERE doc_id % 11 = 0 ORDER BY 1"))
  )
}
