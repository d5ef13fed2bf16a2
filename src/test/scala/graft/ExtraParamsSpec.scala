// golden fingerprint vectors live in FingerprintGoldenSpec
package graft

import graft.checks.RowChecks
import graft.core._
import graft.engine.DQEngine
import graft.rules._
import org.apache.spark.sql.functions._

/** ExtraParams knobs: result-column renaming, suppress-skipped, user metadata,
  * for-each-column programmatic expansion.
  */
class ExtraParamsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1, Some("a"), 10), (2, None, 20)).toDF("id", "name", "amount")

  test("custom result column names flow through apply/split") {
    val extra = ExtraParams(resultColumnNames = ResultColumnNames("dq_errs", "dq_warns"))
    val rules = Seq(DQRowRule(RowChecks.isNotNull(col("name")), "is_not_null", Seq("name")))
    val out = DQEngine.applyChecks(df, rules, extra)
    assert(out.columns.toSeq == Seq("id", "name", "amount", "dq_errs", "dq_warns"))
    val (good, bad) = DQEngine.applyChecksAndSplit(df, rules, extra)
    assert(good.count() == 1 && bad.count() == 1)
    assert(!good.columns.contains("dq_errs"))
  }

  test("suppressSkipped drops unresolvable-check results entirely") {
    val rules = Seq(DQRowRule(RowChecks.isNotNull(col("missing")), "is_not_null", Seq("missing")))
    val out = DQEngine.applyChecks(df, rules, ExtraParams(suppressSkipped = true))
    assert(out.where(col("_errors").isNotNull).count() == 0)
  }

  test("user metadata merges engine-level and rule-level entries") {
    val extra = ExtraParams(userMetadata = Map("env" -> "test"))
    val rules = Seq(DQRowRule(RowChecks.isNotNull(col("name")), "is_not_null", Seq("name"),
      userMetadata = Map("owner" -> "team-a")))
    val out = DQEngine.applyChecks(df, rules, extra)
    val meta = out.where(col("_errors").isNotNull)
      .select(expr("_errors[0].user_metadata")).collect().head.getMap[String, String](0)
    assert(meta("env") == "test" && meta("owner") == "team-a")
  }

  test("DQForEachColRule expands a template across columns") {
    val rules = DQForEachColRule.expand(Seq("id", "name"), "is_not_null",
      c => RowChecks.isNotNull(col(c)))
    assert(rules.map(_.resolvedName) == Seq("id_is_not_null", "name_is_not_null"))
    val out = DQEngine.applyChecks(df, rules)
    assert(out.where(col("_errors").isNotNull).count() == 1)
  }
}
