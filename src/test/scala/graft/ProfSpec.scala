package graft

import graft.pipeline._
import graft.queries.QueryDefs._
import org.apache.spark.sql.functions._

class ProfSpec extends SparkSpec {
  test("dedup query timings at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    def tm(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      info(f"$name: $n rows, ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    tm("minhash warm")(SparkEntry.queries("pipe_dedup_minhash")(spark, dir).count())
    tm("minhash")(SparkEntry.queries("pipe_dedup_minhash")(spark, dir).count())
    tm("ngram")(SparkEntry.queries("pipe_dedup_ngram_jaccard")(spark, dir).count())
    tm("simhash")(SparkEntry.queries("pipe_dedup_simhash")(spark, dir).count())
  }
}
