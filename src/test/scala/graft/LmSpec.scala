package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

/** Bigram-LM perplexity filter, markup stripping, and stratified split. */
class LmSpec extends SparkSpec {
  import spark.implicits._

  test("NgramLm.train counts unigrams, <unk> mass, and OOV-mapped bigrams exactly") {
    // corpus: "a b a b c" + "c a b" -> counts a:3 b:3 c:2; vocab cap 2 keeps
    // a, b (count desc, term asc) and sends c -> <unk>
    val df = Seq("a b a b c", "c a b").toDF("text")
    val m = NgramLm.train(df, col("text"), vocabSize = 2, maxBigrams = 100, k = 0.5)
    assert(m.unigrams == Map("a" -> 3L, "b" -> 3L, LmModel.Unk -> 2L))
    // bigrams: (a,b)x2 + (b,a) + (b,c->unk) + (c->unk, a) + (a,b)
    assert(m.bigrams == Map(
      LmModel.key("a", "b") -> 3L,
      LmModel.key("b", "a") -> 1L,
      LmModel.key("b", LmModel.Unk) -> 1L,
      LmModel.key(LmModel.Unk, "a") -> 1L))
  }

  test("a literal '<unk>' corpus token routes through OOV instead of colliding") {
    // "<unk>" is the most frequent term; it must NOT occupy a vocab slot —
    // its mass lands in the OOV bucket and bigrams treat it as OOV
    val df = Seq("<unk> a <unk>", "<unk> b").toDF("text")
    val m = NgramLm.train(df, col("text"), vocabSize = 2, maxBigrams = 100, k = 0.5)
    assert(m.unigrams == Map("a" -> 1L, "b" -> 1L, LmModel.Unk -> 3L))
    assert(m.bigrams == Map(
      LmModel.key(LmModel.Unk, "a") -> 1L,
      LmModel.key("a", LmModel.Unk) -> 1L,
      LmModel.key(LmModel.Unk, "b") -> 1L))
  }

  test("train fails fast on an empty/all-null corpus instead of NPE") {
    val e = intercept[IllegalArgumentException] {
      NgramLm.train(Seq(Option.empty[String]).toDF("text"), col("text"))
    }
    assert(e.getMessage.contains("at least one token"))
  }

  test("maxBigrams keeps the top pairs by (count desc, v, w)") {
    val df = Seq("a b a b b a").toDF("text") // (a,b)x2, (b,a)x2, (b,b)x1
    val m = NgramLm.train(df, col("text"), vocabSize = 10, maxBigrams = 2)
    assert(m.bigrams == Map(LmModel.key("a", "b") -> 2L, LmModel.key("b", "a") -> 2L))
  }

  test("perplexity kernel matches the closed-form hand computation") {
    val m = LmModel(0.5,
      Map("a" -> 4L, "b" -> 3L, LmModel.Unk -> 2L),
      Map(LmModel.key("a", "b") -> 2L, LmModel.key("b", "a") -> 1L))
    // "a b z": bigrams (a,b), (b,<unk>); V=3
    val lp = math.log((2 + 0.5) / (4 + 0.5 * 3)) + math.log((0 + 0.5) / (3 + 0.5 * 3))
    val want = math.exp(-lp / 2)
    val got = Seq("a b z").toDF("text")
      .select(NgramLm.perplexityColumn(col("text"), m)).head().getDouble(0)
    assert(math.abs(got - want) < 1e-12, s"got $got want $want")
    // <2 tokens or null -> null
    val nulls = Seq(Some("a"), Some(""), None).toDF("text")
      .select(NgramLm.perplexityColumn(col("text"), m)).collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("filterByPerplexity keeps in-domain text, drops shuffled junk") {
    val ref = Seq.fill(50)("the quick brown fox jumps over the lazy dog").toDF("text")
    val m = NgramLm.train(ref, col("text"), vocabSize = 20, k = 0.1)
    val candidates = Seq(
      (1L, "the quick brown fox jumps"), // in-domain word order
      (2L, "dog lazy the over jumps fox brown quick the")) // reversed
    val scored = candidates.toDF("id", "text")
      .select(col("id"), NgramLm.perplexityColumn(col("text"), m).as("ppl"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) < scored(2L), s"in-domain should score lower: $scored")
    val kept = NgramLm.filterByPerplexity(candidates.toDF("id", "text"),
      col("text"), m, maxPerplexity = scored(1L) + 1e-9)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("train's bigram stage broadcasts the vocab — the corpus never shuffles pre-agg") {
    // capture the physical plan of the mapped-pair aggregation by replaying
    // train's plan shape on a small frame and asserting both vocab joins are
    // broadcast; the only Exchange below the agg must be the partial-agg one
    val df = Seq("a b c a b", "c a b").toDF("text")
    val toks = graft.pipeline.TextAnalysis.wsTokens(col("text"))
    val vocabDf = broadcast(Seq("a", "b").toDF("__w"))
    val pairs = df.select(toks.as("__t")).where(size(col("__t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("v"),
          element_at(col("__t"), i + 1).as("w")))).as("__p"))
      .select(col("__p.v").as("__v"), col("__p.w").as("__w0"))
    val mapped = pairs
      .join(vocabDf.withColumnRenamed("__w", "__lv"), col("__v") === col("__lv"), "left")
      .join(vocabDf.withColumnRenamed("__w", "__lw"), col("__w0") === col("__lw"), "left")
      .select(coalesce(col("__lv"), lit("<unk>")).as("v"),
        coalesce(col("__lw"), lit("<unk>")).as("w"))
      .groupBy("v", "w").agg(count(lit(1)).as("c"))
    val plan = mapped.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("perplexity expression stays inside whole-stage codegen") {
    val m = LmModel(0.5, Map("a" -> 1L, LmModel.Unk -> 0L), Map.empty)
    // non-literal input so the projection cannot constant-fold away
    val df = spark.range(4)
      .select(NgramLm.perplexityColumn(
        concat(lit("a "), col("id").cast("string")), m).as("p"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, df.queryExecution.executedPlan.toString)
    // and the scored values are right (forces actual generated-code execution)
    val got = df.collect().map(_.getDouble(0))
    val want = math.exp(-math.log(0.5 / (1 + 0.5 * 2))) // all bigrams (a, <unk>)
    assert(got.forall(v => math.abs(v - want) < 1e-12), got.mkString(","))
  }

  test("stripMarkup removes script/style/comments/tags and decodes entities") {
    val cases = Seq(
      ("<p>hello <b>world</b></p>", "hello world"),
      ("<script>var x = \"<p>\";</script>keep", "keep"),
      ("<style a=b>p{}</style>text", "text"),
      ("<!-- note -->a<br/>b", "a b"),
      ("x &amp; y &lt;z&gt; &quot;q&quot; &#39;s&#39;&nbsp;t", "x & y <z> \"q\" 's' t"),
      ("&amp;lt; stays literal", "&lt; stays literal"), // amp decoded LAST
      ("  spaced\t\nout  ", "spaced out"),
      ("", ""))
    val got = cases.map(_._1).toDF("t")
      .select(TextAnalysis.stripMarkup(col("t"))).as[String].collect().toSeq
    assert(got == cases.map(_._2), got.zip(cases).mkString("\n"))
    // null degrades to empty, not null
    val n = Seq(Option.empty[String]).toDF("t")
      .select(TextAnalysis.stripMarkup(col("t"))).head()
    assert(!n.isNullAt(0) && n.getString(0) == "")
  }

  test("stratifiedSplit gives each stratum exactly ceil(frac*n) val rows, deterministically") {
    val df = (1 to 100).map(i => (i.toLong, if (i % 10 == 0) "rare" else "common"))
      .toDF("id", "grp") // rare: 10 rows, common: 90 rows
    val out = Curation.stratifiedSplit(df, Seq("grp"), col("id"), 0.15)
    val counts = out.groupBy("grp", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts(("rare", "val")) == 2L)    // ceil(0.15 * 10)
    assert(counts(("common", "val")) == 14L) // ceil(0.15 * 90)
    assert(counts(("rare", "train")) == 8L && counts(("common", "train")) == 76L)
    // reproducible: same rows land in val on a second run over shuffled input
    val again = Curation.stratifiedSplit(df.orderBy(rand(7)), Seq("grp"), col("id"), 0.15)
    def valIds(d: org.apache.spark.sql.DataFrame) =
      d.where(col("split") === "val").select("id").as[Long].collect().toSet
    assert(valIds(out) == valIds(again))
    // one exchange: both windows share the stratum partitioning
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, out.queryExecution.executedPlan.toString)
  }

  test("stratifiedSplit quota is exact when n*frac is a whole number in decimal") {
    // IEEE: 100 * 0.55 = 55.00000000000001 — naive ceil would take 56
    val df = (1 to 100).map(i => (i.toLong, "g")).toDF("id", "grp")
    val nVal = Curation.stratifiedSplit(df, Seq("grp"), col("id"), 0.55)
      .where(col("split") === "val").count()
    assert(nVal == 55L, nVal)
    // and 0.07 * 100 -> 7, not 8
    assert(Curation.stratifiedSplit(df, Seq("grp"), col("id"), 0.07)
      .where(col("split") === "val").count() == 7L)
  }

  test("stratifiedSplit edge fractions: 0 -> all train, 1 -> all val") {
    val df = (1 to 10).map(i => (i.toLong, "g")).toDF("id", "grp")
    assert(Curation.stratifiedSplit(df, Seq("grp"), col("id"), 0.0)
      .where(col("split") === "val").count() == 0)
    assert(Curation.stratifiedSplit(df, Seq("grp"), col("id"), 1.0)
      .where(col("split") === "train").count() == 0)
  }
}
