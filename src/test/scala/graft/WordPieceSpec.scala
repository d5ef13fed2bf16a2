package graft

import graft.pipeline.{WordPiece, WordPieceModel, WordPieceModelJson, WordPieceOps}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer: greedy longest-match decode, likelihood-scored
  * training, JSON round trip, codegen integration.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val m = WordPieceModel(Set(
    "the", "##me", "##s", "a", "b", "c", "##a", "##b", "##c",
    "un", "##able", "t", "h", "e", "##t", "##h", "##e", "##m", "m"))

  test("greedy longest-match-first with ## continuations; UNK is whole-word") {
    assert(WordPieceOps.applyWord("the", m).toSeq == Seq("the"))
    // longest FIRST match wins at each step: "theme" -> the + ##me
    assert(WordPieceOps.applyWord("theme", m).toSeq == Seq("the", "##me"))
    assert(WordPieceOps.applyWord("themes", m).toSeq == Seq("the", "##me", "##s"))
    // continuation pieces only match mid-word: "unable" -> un + ##able
    assert(WordPieceOps.applyWord("unable", m).toSeq == Seq("un", "##able"))
    // falls to single chars when no longer piece fits
    assert(WordPieceOps.applyWord("abc", m).toSeq == Seq("a", "##b", "##c"))
    // ANY unmatchable position makes the whole word one UNK
    assert(WordPieceOps.applyWord("ab9", m).toSeq == Seq("[UNK]"))
    assert(WordPieceOps.applyWord("9ab", m).toSeq == Seq("[UNK]"))
    // over the max-chars cap -> UNK
    assert(WordPieceOps.applyWord("a" * 201, m).toSeq == Seq("[UNK]"))
    assert(WordPieceOps.applyWord("", m).isEmpty)
  }

  test("encode/count columns: word split parity, null handling, codegen") {
    val df = Seq(
      (1L, "The theme"), // case-folds to the + the ##me
      (2L, "abc  unable"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val out = df.select(col("id"),
      WordPiece.encodeColumn(col("text"), m).as("toks"),
      WordPiece.countColumn(col("text"), m).as("n"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getSeq[String](1)), if (r.isNullAt(2)) -1 else r.getInt(2))).toMap
    assert(out(1L)._1.contains(Seq("the", "the", "##me")) && out(1L)._2 == 3)
    assert(out(2L)._1.contains(Seq("a", "##b", "##c", "un", "##able")) && out(2L)._2 == 5)
    assert(out(3L)._1.isEmpty && out(3L)._2 == -1) // null text -> null outputs

    val q = spark.range(50).select(concat(lit("the theme x"), col("id")).as("text"))
      .select(WordPiece.countColumn(col("text"), m).as("n")).where(col("n") > 0)
    val codegen = q.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegen.nonEmpty)
    assert(q.count() == 50)
  }

  test("astral code points never split: intact pair matches or whole-word UNK") {
    val smile = new String(Character.toChars(0x1F600))
    val withAstral = WordPieceModel(Set("a", "##" + smile))
    assert(WordPieceOps.applyWord("a" + smile, withAstral).toSeq ==
      Seq("a", "##" + smile))
    // no piece for the astral char -> whole word UNK, never a lone surrogate
    assert(WordPieceOps.applyWord("a" + smile, m).toSeq == Seq("[UNK]"))
  }

  test("train learns the dominant compound and is deterministic") {
    val docs = (1 to 60).map(i => (i.toLong, "hugging face hugging hug")) ++
      (1 to 10).map(i => (100L + i, "hub hub hub"))
    val df = docs.toDF("id", "text")
    val m1 = WordPiece.train(df, col("text"), vocabSize = 40)
    val m2 = WordPiece.train(df, col("text"), vocabSize = 40)
    assert(m1.vocab == m2.vocab)
    // the trained vocab segments the training words compactly
    val n = WordPieceOps.applyWord("hugging", m1).length
    assert(n <= 3, s"'hugging' still splits into $n pieces: " +
      WordPieceOps.applyWord("hugging", m1).mkString("|"))
    // unseen-charset words degrade to UNK, not errors
    assert(WordPieceOps.applyWord("zzz9", m1).toSeq == Seq("[UNK]"))
  }

  test("JSON round trip preserves decode behavior") {
    val rt = WordPieceModelJson.parse(WordPieceModelJson.render(m))
    assert(rt == m)
    val trained = WordPiece.train(
      Seq((1L, "alpha beta alpha")).toDF("id", "t"), col("t"), vocabSize = 30)
    val rt2 = WordPieceModelJson.parse(WordPieceModelJson.render(trained))
    assert(WordPieceOps.applyWord("alpha", rt2).toSeq ==
      WordPieceOps.applyWord("alpha", trained).toSeq)
  }
}
