package graft

import graft.pipeline.Search
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark engine"),
    (2L, "spark engine fast"),
    (3L, "slow database engine"),
    (4L, "completely unrelated text here"),
    (5L, "spark")
  ).toDF("doc_id", "text")

  test("bm25TopK ranks by term frequency with length normalization") {
    val queries = Seq(("q1", "spark")).toDF("qid", "qtext")
    val out = Search.bm25TopK(docs, "doc_id", "text", queries, "qid", "qtext", k = 10)
      .as[(String, Int, Long, Double)].collect().sortBy(_._2).toList
    // only docs containing 'spark' are returned
    assert(out.map(_._3).toSet == Set(1L, 2L, 5L))
    // doc 5 is a one-word doc made entirely of the query term -> shortest dl,
    // highest normalized tf among tf=1 docs; doc 1 has tf=3
    val ranks = out.map(r => r._3 -> r._2).toMap
    assert(ranks(1L) < ranks(2L), "tf=3 must beat tf=1 at comparable length")
    assert(ranks(5L) < ranks(2L), "shorter doc must beat longer doc at equal tf")
    // scores strictly ordered by rank
    assert(out.map(_._4) == out.map(_._4).sorted.reverse)
  }

  test("bm25TopK: multi-term queries sum contributions; k caps the output") {
    val queries = Seq(("q1", "spark engine"), ("q2", "database")).toDF("qid", "qtext")
    val out = Search.bm25TopK(docs, "doc_id", "text", queries, "qid", "qtext", k = 2)
    val byQuery = out.as[(String, Int, Long, Double)].collect().groupBy(_._1)
    assert(byQuery("q1").length == 2) // 4 matching docs capped at k=2
    assert(byQuery("q2").map(_._3).toSeq == Seq(3L)) // only doc 3 has 'database'
    // deterministic across reruns (decimal-exact scores)
    val again = Search.bm25TopK(docs, "doc_id", "text", queries, "qid", "qtext", k = 2)
      .as[(String, Int, Long, Double)].collect().toSet
    assert(again == out.as[(String, Int, Long, Double)].collect().toSet)
  }

  test("bm25TopK fallback branch: semi join is BROADCAST, results identical") {
    val queries = Seq(("q1", "spark engine"), ("q2", "database")).toDF("qid", "qtext")
    // threshold 0 forces the explode + semi-join fallback
    val fallback = Search.bm25TopK(docs, "doc_id", "text", queries, "qid", "qtext",
      k = 10, termFilterThreshold = 0)
    val plan = fallback.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"fallback term filter must be a broadcast semi join, plan:\n${plan.take(2000)}")
    // branch parity: both paths produce identical (query, rank, doc, score)
    val viaFilter = Search.bm25TopK(docs, "doc_id", "text", queries, "qid", "qtext", k = 10)
      .as[(String, Int, Long, Double)].collect().toSet
    assert(fallback.as[(String, Int, Long, Double)].collect().toSet == viaFilter)
  }

  test("bm25TopK streaming corpus is rejected (corpus-global stats)") {
    val stream = spark.readStream.format("rate").load()
      .selectExpr("value AS doc_id", "CAST(value AS STRING) AS text")
    val queries = Seq(("q1", "spark")).toDF("qid", "qtext")
    val e = intercept[IllegalArgumentException] {
      Search.bm25TopK(stream, "doc_id", "text", queries, "qid", "qtext")
    }
    assert(e.getMessage.contains("batch-only"))
  }
}
