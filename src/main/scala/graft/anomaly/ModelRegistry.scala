package graft.anomaly

import graft.anomaly.IsolationForest.{Leaf, Model, Node, Split}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** Trained anomaly model as data (the portable slice of the reference's
  * MLflow-backed registry, anomaly/model_registry.py:27-36): identity +
  * training metadata + baseline feature stats (drift detection input) +
  * the full forest, serialized to one JSON document on any Hadoop-visible
  * URI (file://, hdfs://, s3a://, ...). The reference parks the model in
  * MLflow and the metadata in a Delta table; file-as-registry is the OSS
  * workflow users actually script (train once, score many runs, drift-gate
  * retraining).
  */
final case class AnomalyModelRecord(
    modelName: String,
    algorithm: String,
    columns: Seq[String],
    hyperparameters: Map[String, String],
    trainingRows: Long,
    trainedAtEpochMs: Long,
    /** Sorted training-score distribution — severity percentiles of a loaded
      * model reproduce the training run exactly (score_quantiles analog,
      * kept at full resolution instead of the reference's 7 quantiles).
      */
    trainScoresSorted: Array[Double],
    /** Per-column training stats: [[Drift]] baseline. */
    baselineStats: Map[String, Drift.ColumnStats],
    model: Model)

object ModelRegistry {

  /** Train a forest on a driver-side sample and capture everything scoring
    * and drift detection later need; the baseline stats ride the same single
    * aggregation pass [[Drift.baselineStats]] already makes.
    */
  def train(df: DataFrame, columns: Seq[String], modelName: String,
            numTrees: Int = 100, subsampleSize: Int = 256,
            trainRows: Int = 10000, seed: Long = 42L,
            trainedAtEpochMs: Long = System.currentTimeMillis()): AnomalyModelRecord = {
    import org.apache.spark.sql.functions._
    val features = array(columns.map(c => coalesce(col(c).cast("double"), lit(0.0))): _*)
    val sample = df.select(features.as("f")).limit(trainRows)
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "no rows available to train the anomaly model")
    val model = IsolationForest.train(sample, numTrees, subsampleSize, seed)
    AnomalyModelRecord(
      modelName = modelName,
      algorithm = "isolation_forest",
      columns = columns,
      hyperparameters = Map(
        "num_trees" -> numTrees.toString, "subsample_size" -> subsampleSize.toString,
        "train_rows" -> trainRows.toString, "seed" -> seed.toString),
      trainingRows = sample.length.toLong,
      trainedAtEpochMs = trainedAtEpochMs,
      trainScoresSorted = sample.map(model.score).sorted,
      baselineStats = Drift.baselineStats(df, columns),
      model = model)
  }

  /** Baseline-vs-current drift for a stored record (drift.py:198-239): the
    * gate a scoring pipeline runs before trusting a loaded model.
    */
  def checkDrift(df: DataFrame, record: AnomalyModelRecord,
                 threshold: Double = 3.0): Drift.DriftResult =
    Drift.computeDriftScore(df, record.columns, record.baselineStats, threshold)

  // ------------------------------------------------------------------- JSON

  def render(r: AnomalyModelRecord): String = {
    val json =
      ("model_name" -> r.modelName) ~
        ("algorithm" -> r.algorithm) ~
        ("columns" -> r.columns) ~
        ("hyperparameters" -> r.hyperparameters) ~
        ("training_rows" -> r.trainingRows) ~
        ("trained_at_epoch_ms" -> r.trainedAtEpochMs) ~
        ("train_scores_sorted" -> r.trainScoresSorted.toSeq) ~
        ("baseline_stats" -> r.baselineStats.map { case (c, s) =>
          c -> (("mean" -> s.mean) ~ ("std" -> s.std))
        }) ~
        ("subsample_size" -> r.model.subsampleSize) ~
        ("trees" -> r.model.trees.toSeq.map(nodeJson))
    JsonMethods.compact(JsonMethods.render(json))
  }

  def parse(json: String): AnomalyModelRecord = {
    implicit val formats: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    AnomalyModelRecord(
      modelName = (j \ "model_name").extract[String],
      algorithm = (j \ "algorithm").extract[String],
      columns = (j \ "columns").extract[Seq[String]],
      hyperparameters = (j \ "hyperparameters").extract[Map[String, String]],
      trainingRows = (j \ "training_rows").extract[Long],
      trainedAtEpochMs = (j \ "trained_at_epoch_ms").extract[Long],
      trainScoresSorted = (j \ "train_scores_sorted").extract[Seq[Double]].toArray,
      baselineStats = (j \ "baseline_stats").extract[Map[String, JValue]].map {
        case (c, s) => c -> Drift.ColumnStats(
          (s \ "mean").extract[Double], (s \ "std").extract[Double])
      },
      model = Model((j \ "trees").extract[Seq[JValue]].map(nodeOf).toArray,
        (j \ "subsample_size").extract[Int]))
  }

  private def nodeJson(n: Node): JValue = n match {
    case Leaf(size) => JObject("n" -> JInt(size))
    case Split(f, v, l, r) =>
      ("f" -> f) ~ ("v" -> v) ~ ("l" -> nodeJson(l)) ~ ("r" -> nodeJson(r))
  }

  private def nodeOf(j: JValue): Node = {
    implicit val formats: Formats = DefaultFormats
    (j \ "n") match {
      case JNothing => Split((j \ "f").extract[Int], (j \ "v").extract[Double],
        nodeOf(j \ "l"), nodeOf(j \ "r"))
      case n => Leaf(n.extract[Int])
    }
  }

  // --------------------------------------------------------------------- IO

  /** Write the record to any Hadoop-visible URI (driver-side, one file). */
  def save(spark: SparkSession, location: String, record: AnomalyModelRecord): Unit =
    graft.io.FsText.write(spark, location, render(record))

  def load(spark: SparkSession, location: String): AnomalyModelRecord =
    parse(graft.io.FsText.read(spark, location))
}
