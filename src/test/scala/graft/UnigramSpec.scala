package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram tokenizer: Viterbi closed forms (global
  * optimum beats greedy longest-match), tie-break, OOV fallback, EM
  * monotonicity, end-to-end training, determinism, JSON, codegen.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val m = UnigramModel(Map(
    "ab" -> -1.0, "cd" -> -1.2, "abc" -> -2.5, "d" -> -3.0,
    "a" -> -4.0, "b" -> -4.0, "c" -> -4.0,
    "xy" -> -3.0, "x" -> -1.5, "y" -> -1.5), -20.0)

  test("applyWord: Viterbi global optimum beats greedy longest prefix") {
    // greedy would take 'abc' then 'd' (-5.5); Viterbi finds ab+cd (-2.2)
    assert(UnigramOps.applyWord("abcd", m).toSeq == Seq("ab", "cd"))
    assert(UnigramOps.applyWord("abc", m).toSeq == Seq("abc"))
    // OOV char falls back to a single-char unk piece
    assert(UnigramOps.applyWord("abq", m).toSeq == Seq("ab", "q"))
    // exact tie (xy = x+y = -3.0) resolves to the longer piece
    assert(UnigramOps.applyWord("xy", m).toSeq == Seq("xy"))
    assert(UnigramOps.applyWord("", m).toSeq == Seq.empty)
    // every-char-OOV word still segments
    assert(UnigramOps.applyWord("zz", m).toSeq == Seq("z", "z"))
  }

  test("applyWord never splits an astral code point into lone surrogates") {
    // OOV astral char (U+1F600) falls back as its intact surrogate pair
    val smile = new String(Character.toChars(0x1F600))
    val pieces = UnigramOps.applyWord("ab" + smile + "cd", m)
    assert(pieces.toSeq == Seq("ab", smile, "cd"), pieces.toSeq)
    assert(pieces.forall(p => p.codePoints().toArray.forall(Character.isValidCodePoint)))
    assert(!pieces.exists(p => p.length == 1 && Character.isSurrogate(p.charAt(0))))
    // all-astral OOV word: one piece per code point
    val astral = smile * 3
    assert(UnigramOps.applyWord(astral, m).toSeq == Seq(smile, smile, smile))
    // training on astral text yields no half-pair vocab pieces
    val df2 = Seq(smile + "ab " + smile + "ab", "ab ab").toDF("text")
    val m2 = Unigram.train(df2, col("text"), vocabSize = 8, emIters = 1)
    assert(m2.pieces.keys.forall(p =>
      !Character.isLowSurrogate(p.charAt(0)) &&
        !Character.isHighSurrogate(p.charAt(p.length - 1))))
  }

  test("encode/count columns: per-word application, case fold, null") {
    val df = Seq((1L, "ABCD abc"), (2L, null.asInstanceOf[String])).toDF("id", "t")
    val out = df.select(col("id"),
      Unigram.encodeColumn(col("t"), m).as("toks"),
      Unigram.countColumn(col("t"), m).as("n")).orderBy("id").collect()
    assert(out(0).getSeq[String](1) == Seq("ab", "cd", "abc"))
    assert(out(0).getInt(2) == 3)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("EM E-step log-likelihood is non-decreasing across a re-estimation") {
    val words = Array(("abab", 3L), ("ab", 2L), ("ba", 1L))
    val third = math.log(1.0 / 3)
    val m0 = UnigramModel(Map("a" -> third, "b" -> third, "ab" -> third), -20.0)
    val (c1, ll1) = UnigramOps.emStep(words, m0)
    // exact M-step (no smoothing) so EM's monotonicity guarantee applies
    val total = c1.values.sum
    val m1 = UnigramModel(
      m0.pieces.keys.map(p => p -> (math.log(c1.getOrElse(p, 1e-12)) - math.log(total))).toMap,
      -20.0)
    val (_, ll2) = UnigramOps.emStep(words, m1)
    assert(ll2 >= ll1 - 1e-9, s"$ll2 < $ll1")
  }

  test("train learns the shared piece across contexts and is deterministic") {
    // 'ab' recurs inside three different words; with a 5-piece budget the
    // per-word pieces (abx, aby) cannot all survive, the shared 'ab' must
    val docs = (1 to 50).map(i => (i.toLong, "abx aby ab")).toDF("id", "text")
    val model = Unigram.train(docs, col("text"), vocabSize = 5, maxPieceLen = 3)
    assert(model.pieces.contains("ab"), model.pieces.keySet)
    assert(model.pieces.size <= 5)
    assert(UnigramOps.applyWord("abx", model).toSeq.head == "ab")
    val again = Unigram.train(docs, col("text"), vocabSize = 5, maxPieceLen = 3)
    assert(again == model) // bit-identical training
  }

  test("train compresses the dominant word far below character level") {
    // P(ab)=1 and P(abab)=1 are BOTH global optima of this corpus's
    // likelihood (bistable EM) — assert the learned compression, not which
    // attractor won: 4 chars must encode as at most 2 pieces, and the model
    // must use its own best multi-char piece, not char-level fallback
    val docs = (1 to 50).map(i => (i.toLong, "abab ab abab")).toDF("id", "text")
    val model = Unigram.train(docs, col("text"), vocabSize = 4, maxPieceLen = 4)
    val toks = UnigramOps.applyWord("abab", model).toSeq
    assert(toks.length <= 2, toks)
    assert(toks.forall(model.pieces.contains), toks)
    assert(model.pieces.size <= 4)
  }

  test("train keeps all single characters even past vocabSize") {
    val docs = Seq((1L, "abcdefgh")).toDF("id", "text")
    val model = Unigram.train(docs, col("text"), vocabSize = 2, maxPieceLen = 3)
    assert(Seq("a", "b", "c", "d", "e", "f", "g", "h").forall(model.pieces.contains))
    assert(model.pieces.keys.forall(_.length == 1)) // multis pruned to budget
  }

  test("train rejects streaming input and empty corpora") {
    val stream = spark.readStream.format("rate").load()
      .selectExpr("CAST(value AS STRING) AS text")
    val e = intercept[IllegalArgumentException] {
      Unigram.train(stream, col("text"), vocabSize = 10)
    }
    assert(e.getMessage.contains("batch-only"))
    val e2 = intercept[IllegalArgumentException] {
      Unigram.train(Seq.empty[(Long, String)].toDF("id", "text"), col("text"), 10)
    }
    assert(e2.getMessage.contains("at least one token"))
  }

  test("model JSON round-trips") {
    val back = UnigramModelJson.parse(UnigramModelJson.render(m))
    assert(back == m)
  }

  test("unigram expressions stay inside whole-stage codegen") {
    val df = spark.range(4)
      .select(concat(lit("abcd x"), col("id")).as("t"))
      .select(Unigram.countColumn(col("t"), m).as("n"),
        Unigram.encodeColumn(col("t"), m).as("toks"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, df.queryExecution.executedPlan.toString)
    // "abcd x0" -> ab cd | x 0(unk)
    assert(df.head().getInt(0) == 4)
  }
}
