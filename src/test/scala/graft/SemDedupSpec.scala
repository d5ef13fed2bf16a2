package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

/** SemDeDup semantic near-dup pairs + character-entropy quality signal. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val e1 = Array(1.0, 0.0)
  private val e2 = Array(0.0, 1.0)

  test("semanticDupPairs pairs only within a cluster, verified by exact cosine") {
    // ids 1,2 near e1 (cosine ~1); id 3 also cluster-e1 but 45 deg off;
    // ids 10,11 near e2 (exact duplicates)
    val df = Seq(
      (1L, Seq(10.0, 0.1)), (2L, Seq(5.0, 0.05)), (3L, Seq(1.0, 0.9)),
      (10L, Seq(0.0, 2.0)), (11L, Seq(0.0, 2.0))).toDF("id", "v")
    val pairs = Dedup.semanticDupPairs(df, "id", "v", Array(e1, e2), threshold = 0.99)
      .select("id_a", "id_b", "cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0), (10L, 11L, 1)), pairs)
  }

  test("semanticDupPairs assignment is argmax dot with lowest-index ties") {
    // (1,1) ties both centroids -> cluster 0
    val df = Seq((1L, Seq(1.0, 1.0))).toDF("id", "v")
    import org.apache.spark.sql.GraftColumnBridge
    val c = df.select(GraftColumnBridge.column(NearestCentroids(
      GraftColumnBridge.expression(col("v")), Array(e1, e2), 1))(0)).head().getInt(0)
    assert(c == 0)
  }

  test("maxClusterSize drops an over-full cluster before the self-join") {
    val big = (1 to 20).map(i => (i.toLong, Seq(1.0, 0.0)))
    val small = Seq((100L, Seq(0.0, 1.0)), (101L, Seq(0.0, 1.0)))
    val df = (big ++ small).toDF("id", "v")
    val pairs = Dedup.semanticDupPairs(df, "id", "v", Array(e1, e2),
      threshold = 0.99, maxClusterSize = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 101L)), pairs) // cluster 0 (20 rows) guarded away
  }

  test("dedupSemantic drops higher ids of over-threshold pairs") {
    val df = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.001)),
      (10L, Seq(0.0, 1.0))).toDF("id", "v")
    val kept = Dedup.dedupSemantic(df, "id", "v", Array(e1, e2), threshold = 0.999)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 10L), kept)
  }

  test("charEntropy: closed forms, empty/null, codegen") {
    val rows = Seq(
      (1L, "aaaa"), (2L, "ab"), (3L, "aabb"), (4L, "")).toDF("id", "t")
      .select(col("id"), TextAnalysis.charEntropy(col("t")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1L) == 0.0)
    assert(math.abs(rows(2L) - math.log(2)) < 1e-12)
    assert(math.abs(rows(3L) - math.log(2)) < 1e-12)
    assert(rows(4L) == 0.0)
    val n = Seq(Option.empty[String]).toDF("t")
      .select(TextAnalysis.charEntropy(col("t"))).head()
    assert(n.isNullAt(0))
    // stays in whole-stage codegen over a non-foldable input
    val df = spark.range(3).select(TextAnalysis.charEntropy(
      col("id").cast("string")).as("h"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty)
    assert(df.collect().forall(_.getDouble(0) == 0.0)) // single-char strings
  }

  test("charEntropy handles non-BMP code points as single symbols") {
    // U+1F600 twice -> one distinct symbol -> entropy 0
    val s = new String(Character.toChars(0x1F600)) * 2
    val h = Seq(s).toDF("t").select(TextAnalysis.charEntropy(col("t")))
      .head().getDouble(0)
    assert(h == 0.0)
  }
}
