package graft.anomaly

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic anomaly explanations from the per-row contribution map —
  * the OSS layer of the reference's explainability stack
  * (anomaly/explainability.py:274-305 `add_top_contributors_to_message`,
  * formatting contract :143-172). The LLM narrative layer
  * (anomaly_llm_explainer.py renders a prompt into the SQL `ai_query`
  * function against a Databricks model-serving endpoint) is proprietary
  * infrastructure and stays a documented plug-in boundary: anything that can
  * turn (row, contributions, score) into text can be applied over the same
  * columns this module reads.
  */
object Explain {

  /** `"amount (85%), quantity (10%)"` — the top-`topN` contributors by
    * |value| from a `map<string,double>` contribution column, the exact
    * format the reference embeds in messages (explainability.py:155-171).
    * Null map → null (coalesce to `''` for the reference's empty-string
    * convention). Codegen'd scalar expression; ties break by name so output
    * is deterministic.
    */
  def topContributors(contributions: Column, topN: Int = 3): Column =
    GraftColumnBridge.column(
      TopContributors(GraftColumnBridge.expression(contributions), topN))

  /** Reference `add_top_contributors_to_message` shape: append
    * `_top_contributors` to a checked frame, formatted from the `_dq_info`
    * anomaly struct when `severity_percentile >= threshold`, else `''`.
    * Row-local projection over columns the check already computed — no
    * second scoring pass, no shuffle.
    */
  def addTopContributors(checked: DataFrame, threshold: Double,
                         topN: Int = 3): DataFrame = {
    require(checked.columns.contains("_dq_info"),
      "addTopContributors needs a frame produced by applyChecks with an anomaly check (_dq_info missing)")
    // find the element whose anomaly struct is populated instead of assuming
    // it sits first: other info-producing checks (or a pre-existing _dq_info
    // the engine concat-prepends) may occupy earlier slots, and element_at(1)
    // would then read a NULL anomaly field and blank every explanation
    // try_element_at: the filtered array is empty when no anomaly check ran
    // (ANSI element_at would throw); null then falls through to ''
    val anomaly = try_element_at(
      filter(col("_dq_info"), e => e.getField("anomaly").isNotNull), lit(1))
      .getField("anomaly")
    checked.withColumn("_top_contributors",
      when(anomaly.getField("severity_percentile") >= threshold,
        coalesce(topContributors(anomaly.getField("contributions"), topN), lit("")))
        .otherwise(lit("")))
  }
}

private[anomaly] object ExplainOps {

  /** Static codegen kernel for [[TopContributors]]: sort entries by
    * (|value| desc, key asc), take n, render `key (R%)` with R = half-up
    * rounding (contributions are 0-100, where Java and C round identically).
    * Null-valued entries are skipped (explainability.py:170 drops None).
    */
  def formatTop(m: MapData, topN: Int): UTF8String = {
    val n = m.numElements()
    if (n == 0) return UTF8String.EMPTY_UTF8
    val keys = m.keyArray()
    val vals = m.valueArray()
    val entries = new java.util.ArrayList[(String, Double)](n)
    var i = 0
    while (i < n) {
      if (!vals.isNullAt(i) && !keys.isNullAt(i)) {
        entries.add((keys.getUTF8String(i).toString, vals.getDouble(i)))
      }
      i += 1
    }
    if (entries.isEmpty) return UTF8String.EMPTY_UTF8
    entries.sort { (a: (String, Double), b: (String, Double)) =>
      val c = java.lang.Double.compare(math.abs(b._2), math.abs(a._2))
      if (c != 0) c else a._1.compareTo(b._1)
    }
    val k = math.min(topN, entries.size)
    val sb = new java.lang.StringBuilder(k * 16)
    var j = 0
    while (j < k) {
      if (j > 0) sb.append(", ")
      val (key, v) = entries.get(j)
      sb.append(key).append(" (").append(Math.round(v)).append("%)")
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Top-N contributor formatting as a codegen'd scalar over
  * `map<string,double>`. Runs only where projected (gate it with `when` on
  * the anomaly flag to keep clean rows free).
  */
case class TopContributors(child: Expression, topN: Int) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    ExplainOps.formatTop(v.asInstanceOf[MapData], topN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.anomaly.ExplainOps.formatTop($c, $topN)")

  override protected def withNewChildInternal(c: Expression): TopContributors =
    copy(child = c)
}
