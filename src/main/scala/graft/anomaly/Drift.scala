package graft.anomaly

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Baseline-vs-current distribution drift detection for anomaly scoring
  * pipelines (reference anomaly/drift.py:34-195): per column, the drift score
  * is a weighted mix of the mean-shift z-score (vs the baseline std) and the
  * relative std change; the overall score is the max across columns, and
  * crossing the threshold recommends retraining. Small batches are skipped
  * (high-variance stats cause false positives).
  *
  * Scale shape: the whole detection is ONE global aggregation over the
  * current frame (count + per-column mean/std fused into a single pass —
  * the reference runs count and stats as two actions), so it costs a scan
  * regardless of column count and never shuffles more than one row.
  */
object Drift {

  /** drift.py:24 — below this row count drift detection is skipped. */
  val MinSampleSizeForDrift = 1000L

  final case class ColumnStats(mean: Double, std: Double)

  /** drift.py:27-36. */
  final case class DriftResult(driftDetected: Boolean, driftScore: Double,
                               driftedColumns: Seq[String],
                               columnScores: Map[String, Double],
                               recommendation: String, sampleSize: Long)

  /** Per-column (mean, std) baseline in one aggregation pass over the
    * training frame; booleans cast to double (drift.py:57). Columns whose
    * stats come back null (all-null or single-row input) are dropped, which
    * mirrors the reference skipping columns absent from baseline_stats.
    */
  def baselineStats(df: DataFrame, columns: Seq[String]): Map[String, ColumnStats] = {
    val row = df.select(statExprs(df, columns): _*).first()
    columns.flatMap { c =>
      val (m, s) = (row.getAs[Any](s"mean_$c"), row.getAs[Any](s"std_$c"))
      (Option(m), Option(s)) match {
        case (Some(mv), Some(sv)) =>
          Some(c -> ColumnStats(toD(mv), toD(sv)))
        case _ => None
      }
    }.toMap
  }

  /** drift.py:74-110 — 0.7 * mean-shift z + 0.3 * relative std change, with
    * the reference's zero-std conventions: a zero baseline std makes any mean
    * change drift by absolute difference, and a collapsed current std (0 vs
    * nonzero baseline) counts as full std drift.
    */
  def columnDriftScore(baseMean: Double, baseStd: Double,
                       curMean: Option[Double], curStd: Option[Double]): Double = {
    val cm = curMean.getOrElse(baseMean)
    val cs = curStd.getOrElse(0.0)
    val z =
      if (baseStd == 0) { if (cm != baseMean) math.abs(cm - baseMean) else 0.0 }
      else math.abs(cm - baseMean) / baseStd
    val stdChange =
      if (baseStd > 0 && cs > 0) math.abs(cs - baseStd) / baseStd
      else if (baseStd > 0) 1.0
      else 0.0
    z * 0.7 + stdChange * 0.3
  }

  /** Declarative per-column drift frame: `(column, base_mean, base_std,
    * cur_mean, cur_std, sample_size, score)`, one row per baseline column.
    * Lazy (no driver action) and built from ONE global aggregation, so it
    * composes into larger plans and replays in plain SQL. The score column
    * encodes [[columnDriftScore]] exactly, including the null conventions
    * (null current mean falls back to the baseline mean; null current std
    * counts as zero).
    */
  def driftScores(df: DataFrame, baseline: Map[String, ColumnStats]): DataFrame = {
    val cols = df.columns.filter(baseline.contains).toSeq
    val agg = df.select(count(lit(1)).as("__n") +: statExprs(df, cols): _*)
    val perCol = cols.map { c =>
      val b = baseline(c)
      struct(lit(c).as("column"),
        lit(b.mean).as("base_mean"), lit(b.std).as("base_std"),
        col(s"mean_$c").as("cur_mean"), col(s"std_$c").as("cur_std"))
    }
    agg.select(col("__n").as("sample_size"), explode(array(perCol: _*)).as("s"))
      .select(col("s.column"), col("s.base_mean"), col("s.base_std"),
        col("s.cur_mean"), col("s.cur_std"), col("sample_size"))
      .withColumn("score", scoreExpr(col("base_mean"), col("base_std"),
        col("cur_mean"), col("cur_std")))
  }

  /** Per-SEGMENT drift in ONE grouped aggregation — the reference's
    * check_segment_drift (drift.py:219-253) loops segments and runs
    * count + stats per segment (2 actions each); here every segment's
    * mean/std aggregates in a single groupBy pass and compares against its
    * own baseline via a broadcast join. Returns a lazy per-(segment, column)
    * frame: segment columns + `(column, base_mean, base_std, cur_mean,
    * cur_std, sample_size, score, drifted)`; segments under `minSampleSize`
    * carry drifted=false (the small-batch skip). Segments present in the
    * data but absent from `baselines` are omitted (nothing to compare),
    * matching the reference's per-model dispatch.
    */
  def segmentDriftScores(df: DataFrame, segmentCols: Seq[String],
                         baselines: Map[Seq[String], Map[String, ColumnStats]],
                         threshold: Double = 3.0,
                         minSampleSize: Long = MinSampleSizeForDrift): DataFrame = {
    require(segmentCols.nonEmpty, "segmentCols must not be empty")
    require(baselines.nonEmpty, "baselines must not be empty")
    baselines.keys.foreach(k => require(k.length == segmentCols.length,
      s"baseline segment key $k does not match segmentCols $segmentCols"))
    val session = df.sparkSession
    import session.implicits._
    val allCols = baselines.values.flatMap(_.keys).toSeq.distinct.sorted
      .filter(df.columns.contains)
    require(allCols.nonEmpty, "no baseline column exists in the frame")
    val agg = df.groupBy(segmentCols.map(c => col(c).cast("string").as(c)): _*)
      .agg(count(lit(1)).as("sample_size"), statExprs(df, allCols): _*)
    val perCol = allCols.map { c =>
      struct(lit(c).as("column"),
        col(s"mean_$c").as("cur_mean"), col(s"std_$c").as("cur_std"))
    }
    val long = agg.select(
      segmentCols.map(col) :+ col("sample_size") :+
        explode(array(perCol: _*)).as("s"): _*)
      .select(segmentCols.map(col) :+ col("sample_size") :+
        col("s.column") :+ col("s.cur_mean") :+ col("s.cur_std"): _*)
    // Join on the segment columns THEMSELVES, one baseline-frame column per
    // segment column: a concatenated string key drops nulls (concat_ws), so
    // ("a", null) and (null, "a") would collide, and any separator char
    // appearing inside a value would too. Null-safe equality (<=>) keeps a
    // deliberately-null baseline segment value matchable.
    val segKeyCols = segmentCols.indices.map(i => s"__base_seg_$i")
    val baseRows = baselines.toSeq.flatMap { case (seg, stats) =>
      stats.toSeq.map { case (c, st) => (seg.toList, c, st.mean, st.std) }
    }
    val baseDf = baseRows.toDF("__seg", "column", "base_mean", "base_std")
      .select(segKeyCols.zipWithIndex.map { case (n, i) =>
        element_at(col("__seg"), i + 1).as(n)
      } ++ Seq(col("column").as("__base_column"), col("base_mean"),
        col("base_std")): _*)
    val joinCond = segmentCols.zip(segKeyCols).map { case (sc, bc) =>
      long(sc) <=> baseDf(bc)
    }.reduce(_ && _) && long("column") === baseDf("__base_column")
    long.join(broadcast(baseDf), joinCond)
      .withColumn("score", scoreExpr(col("base_mean"), col("base_std"),
        col("cur_mean"), col("cur_std")))
      .withColumn("drifted",
        col("sample_size") >= minSampleSize && col("score") >= threshold)
      .select(segmentCols.map(long(_)) ++ Seq(long("column"), col("base_mean"),
        col("base_std"), col("cur_mean"), col("cur_std"), col("sample_size"),
        col("score"), col("drifted")): _*)
  }

  /** drift.py:113-195 `compute_drift_score` — one Spark action total (the
    * count is fused into the stats aggregation). Columns missing from the
    * baseline or from the frame are skipped.
    */
  def computeDriftScore(df: DataFrame, columns: Seq[String],
                        baseline: Map[String, ColumnStats],
                        threshold: Double = 3.0,
                        minSampleSize: Long = MinSampleSizeForDrift): DriftResult = {
    val present = columns.filter(c => baseline.contains(c) && df.columns.contains(c))
    if (present.isEmpty) {
      val n = df.count()
      val rec = if (n < minSampleSize) "skipped_small_batch" else "ok"
      return DriftResult(driftDetected = false, 0.0, Nil, Map.empty, rec, n)
    }
    val rows = driftScores(df.select(present.map(col): _*), baseline).collect()
    val n = if (rows.isEmpty) 0L else rows.head.getAs[Long]("sample_size")
    if (n < minSampleSize)
      return DriftResult(driftDetected = false, 0.0, Nil, Map.empty,
        "skipped_small_batch", n)
    val scores = rows.map(r => r.getAs[String]("column") -> r.getAs[Double]("score")).toMap
    val drifted = present.filter(c => scores.getOrElse(c, 0.0) >= threshold)
    val overall = if (scores.isEmpty) 0.0 else scores.values.max
    val detected = overall >= threshold
    DriftResult(detected, overall, drifted, scores,
      if (detected) "retrain" else "ok", n)
  }

  // ------------------------------------------------------------------ internal

  private def statExprs(df: DataFrame, columns: Seq[String]): Seq[Column] = {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    columns.flatMap { c =>
      val e = if (types.get(c).contains(org.apache.spark.sql.types.BooleanType))
        col(c).cast("double") else col(c)
      Seq(avg(e).as(s"mean_$c"), stddev(e).as(s"std_$c"))
    }
  }

  /** In-plan [[columnDriftScore]]: branch order mirrors the Scala version. */
  private def scoreExpr(bm: Column, bs: Column, cmIn: Column, csIn: Column): Column = {
    val cm = coalesce(cmIn, bm)
    val cs = coalesce(csIn, lit(0.0))
    val z = when(bs === 0.0, when(cm =!= bm, abs(cm - bm)).otherwise(lit(0.0)))
      .otherwise(abs(cm - bm) / bs)
    val stdChange = when(bs > 0.0 && cs > 0.0, abs(cs - bs) / bs)
      .when(bs > 0.0, lit(1.0))
      .otherwise(lit(0.0))
    z * 0.7 + stdChange * 0.3
  }

  private def toD(v: Any): Double = v match {
    case d: java.lang.Double => d
    case f: java.lang.Float => f.toDouble
    case n: java.lang.Number => n.doubleValue()
  }
}
