package graft

import graft.pipeline.{Bpe, BpeModel}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq.fill(20)("banana band bandana ban").zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  test("train learns frequent pairs from the word dictionary, deterministically") {
    val m = Bpe.train(corpus, col("text"), numMerges = 8)
    assert(m.merges.nonEmpty && m.merges.size <= 8)
    // 'an' dominates the pair counts (banana has two, band/bandana/ban one+)
    assert(m.merges.head == ("a", "n"), m.merges.toString)
    val again = Bpe.train(corpus, col("text"), numMerges = 8)
    assert(again == m)
  }

  test("encode merges per word, round-trips characters, count matches") {
    val m = Bpe.train(corpus, col("text"), numMerges = 8)
    val out = corpus.limit(1).select(
      Bpe.encodeColumn(col("text"), m).as("toks"),
      Bpe.countColumn(col("text"), m).as("n")).head()
    val toks = out.getSeq[String](0)
    assert(out.getInt(1) == toks.length)
    // concatenating tokens reproduces the words with spaces dropped
    assert(toks.mkString("") == "banana band bandana ban".replace(" ", ""))
    // merges compress: fewer tokens than characters
    assert(toks.length < "bananabandbandanaban".length)
    // an empty merge table degenerates to character tokens
    val chars = corpus.limit(1).select(
      Bpe.countColumn(col("text"), BpeModel(Vector.empty)).as("n")).head().getInt(0)
    assert(chars == "bananabandbandanaban".length)
    assert(out.getInt(1) < chars)
  }

  test("codegen and interpreted paths agree") {
    val m = Bpe.train(corpus, col("text"), numMerges = 4)
    def run() = corpus.select(col("id"), Bpe.encodeColumn(col("text"), m))
      .orderBy("id").collect().map(_.toSeq).toSeq
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try run() finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on == off)
  }

  test("property: lowest-rank-first apply == rank-order full passes on hierarchical models") {
    // Independent naive reference: apply each merge as a FULL left-to-right
    // pass over the symbol list, in rank order. For hierarchical models
    // (every composite part formed by a strictly earlier rank — the invariant
    // every trained model satisfies, and the one the DuckDB oracle's nested
    // replace() replay leans on) this must equal BpeOps' interleaved
    // lowest-rank-first loop. Implemented differently on purpose: a shared
    // bug cannot hide.
    def naive(word: String, merges: Seq[(String, String)]): List[String] = {
      var syms = word.map(_.toString).toList
      merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var rest = syms
        while (rest.nonEmpty) rest match {
          case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
          case x :: tail => out += x; rest = tail
          case Nil =>
        }
        syms = out.toList
      }
      syms
    }
    // deterministic pseudo-random hierarchical model + words over {a,b,c,d}
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c", "d")
    (1 to 50).foreach { trial =>
      var symbols = alphabet
      val merges = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
      (1 to rnd.nextInt(6)).foreach { _ =>
        val p = (symbols(rnd.nextInt(symbols.size)), symbols(rnd.nextInt(symbols.size)))
        // distinct pairs only: a duplicate would OVERWRITE the earlier rank in
        // the model's rank map, which legitimately diverges from naive
        // sequential passes — trained models never contain duplicates
        if (merges.add(p)) symbols = symbols :+ (p._1 + p._2)
      }
      val model = BpeModel(merges.toVector)
      val words = Seq.fill(8)(Seq.fill(2 + rnd.nextInt(10))(
        alphabet(rnd.nextInt(alphabet.size))).mkString)
      val text = words.mkString(" ")
      val got = Seq((1L, text)).toDF("id", "text")
        .select(Bpe.encodeColumn(col("text"), model)).head().getSeq[String](0)
      val want = words.flatMap(w => naive(w, model.merges))
      assert(got == want, s"trial $trial model=${model.merges} text='$text'")
    }
  }

  test("null and empty text degrade gracefully") {
    val m = BpeModel(Vector(("a", "b")))
    val df = Seq((1L, "ab ab"), (2L, ""), (3L, null)).toDF("id", "text")
    val out = df.select(col("id"), Bpe.countColumn(col("text"), m).as("n"))
      .as[(Long, Option[Int])].collect().toMap
    assert(out(1L).contains(2)) // two words, each one merged 'ab' token
    assert(out(2L).contains(0))
    assert(out(3L).isEmpty)
  }
}
