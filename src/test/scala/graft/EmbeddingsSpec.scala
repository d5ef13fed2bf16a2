package graft

import graft.pipeline.Embeddings
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(3.0f, 4.0f), "a"),   // norm 5
    (2L, Array(0.0f, 0.0f), "a"),   // zero vector
    (3L, Array(6.0f, 8.0f), "b"),   // norm 10
    (4L, Array(0.0f, 2.0f), "b")
  ).toDF("vec_id", "embedding", "g")

  test("l2Norm and l2Normalize") {
    val out = vecs.select(col("vec_id"), Embeddings.l2Norm(col("embedding")).as("n"),
      Embeddings.l2Normalize(col("embedding")).as("u"))
      .as[(Long, Double, Array[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 == 5.0 && out(1L)._2.toSeq == Seq(0.6, 0.8))
    assert(out(2L)._1 == 0.0 && out(2L)._2.toSeq == Seq(0.0, 0.0)) // zero vec passes through
    assert(math.abs(out(3L)._2.map(x => x * x).sum - 1.0) < 1e-12) // unit norm after scaling
  }

  test("VectorNorm matches the HOF formulation bit-for-bit and stays codegen'd") {
    // RDD-backed so the projection survives into the physical plan
    val rnd = new scala.util.Random(11)
    val data = (0 until 500).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(data, 3))
      .toDF("id", "v")
    val hof = sqrt(aggregate(col("v"), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val both = df.select(col("id"), Embeddings.l2Norm(col("v")).as("fused"), hof.as("old"))
    both.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"id=${r.getLong(0)}")
    }
    // fused-only projection keeps whole-stage codegen (the HOF would break it)
    val fusedOnly = df.select(col("id"), Embeddings.l2Norm(col("v")).as("n"))
    val plan = fusedOnly.queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.exists(_.child.collect { case p => p.nodeName }.contains("Project")),
      plan.toString)
    // null element -> null norm; null vector -> null; double arrays too
    val edge = Seq(
      (1L, Array[java.lang.Double](3.0, 4.0)),
      (2L, Array[java.lang.Double](1.0, null)),
      (3L, null.asInstanceOf[Array[java.lang.Double]])
    ).toDF("id", "v")
    val got = edge.select(col("id"), Embeddings.l2Norm(col("v")).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(1L -> Some(5.0), 2L -> None, 3L -> None))
  }

  test("groupStats counts zeros and aggregates norms per group") {
    val got = Embeddings.groupStats(vecs, "g", "embedding")
      .as[(String, Long, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 2L, 1L, 0.0, 2.5, 5.0)))
    assert(got("b") == (("b", 2L, 0L, 2.0, 6.0, 10.0)))
  }

  test("groupCentroids computes element-wise means in dimension order") {
    val got = Embeddings.groupCentroids(vecs, "g", "embedding")
      .as[(String, Array[Double], Double)].collect().map(r => r._1 -> r).toMap
    assert(got("a")._2.toSeq == Seq(1.5, 2.0)) // mean of (3,4),(0,0)
    assert(got("b")._2.toSeq == Seq(3.0, 5.0)) // mean of (6,8),(0,2)
    assert(got("b")._3 == math.sqrt(34.0).floor / 1 || got("b")._3 == 5.830952) // rounded norm
  }

  test("assignClusters labels rows with the nearest centroid, zero shuffle") {
    val df = Seq(
      (1L, Seq(5.0, 0.1)), (2L, Seq(0.1, 3.0)), (3L, Seq(1.0, 1.0)))
      .toDF("id", "v")
    val out = Embeddings.assignClusters(df, "v",
      Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val got = out.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 0), got) // tie -> lowest index
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 0, out.queryExecution.executedPlan.toString)
  }
}
