package graft

import graft.pipeline.{Curation, CurationPipeline, Dedup, LangIdModel, LangIdModelJson, QualityClassifier, QualityModel, QualityModelJson, TextAnalysis}
import org.apache.spark.sql.functions._

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog. It was a sunny day and the walk was long.", "en"),
    (2L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG. IT WAS A SUNNY DAY AND THE WALK WAS LONG.", "en"),
    (3L, "short", "en"),
    (4L, "Ein kurzer Satz ohne das englische Wort.", "de"),
    (5L, "A completely different document with the word in it, long enough to clear every single length filter here.", "en"),
    (6L, null.asInstanceOf[String], "en")
  ).toDF("doc_id", "text", "lang")

  test("steps compose in declaration order and thread the text column") {
    val yaml =
      """- step: normalize
        |- step: filter_length
        |  min_chars: 40
        |- step: filter_regex
        |  pattern: the
        |- step: dedup_exact
        |""".stripMargin
    val out = CurationPipeline.fromYaml(docs, yaml)
    val rows = out.select("doc_id", "text").as[(Long, String)].collect().toMap
    // 1 and 2 normalize to the same text -> keep-first keeps doc 1
    assert(rows.keySet == Set(1L, 5L))
    assert(rows(1L) == rows.getOrElse(1L, "").toLowerCase)
    // other columns survive the pipeline
    assert(out.columns.contains("lang"))
  }

  test("sampling steps dispatch to the deterministic kernels") {
    val df = spark.range(0, 1000).toDF("doc_id").withColumn("text", lit("x"))
      .withColumn("g", when(col("doc_id") % 2 === 0, "a").otherwise("b"))
    val viaPipeline = CurationPipeline(df,
      Seq(Map("step" -> "sample_hash", "fraction" -> 0.25)))
      .select("doc_id").as[Long].collect().toSet
    val direct = Curation.hashSample(df, col("doc_id"), 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(viaPipeline == direct)
    val weighted = CurationPipeline(df, Seq(Map("step" -> "sample_weights",
      "group_col" -> "g", "weights" -> Map("a" -> 1.0, "b" -> 0.0))))
    assert(weighted.select("g").distinct().as[String].collect().toSeq == Seq("a"))
    val quota = CurationPipeline(df, Seq(Map("step" -> "sample_quota",
      "group_cols" -> Seq("g"), "quota" -> 7)))
    assert(quota.groupBy("g").count().as[(String, Long)].collect().toMap
      .values.forall(_ == 7L))
  }

  test("dedup_lines step preserves carried columns via the id join-back") {
    val df = Seq(
      (1L, "keep me\nBOILER\nunique one", "a"),
      (2L, "BOILER\nanother unique", "b")
    ).toDF("doc_id", "text", "src")
    val out = CurationPipeline(df, Seq(Map("step" -> "dedup_lines")))
    val m = out.select("doc_id", "text", "src").as[(Long, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(1L) == (("keep me\nunique one", "a")))
    assert(m(2L) == (("another unique", "b")))
  }

  test("unknown step and unknown parameter fail fast with the catalog") {
    val e1 = intercept[IllegalArgumentException] {
      CurationPipeline(docs, Seq(Map("step" -> "no_such_step")))
    }
    assert(e1.getMessage.contains("unknown step") && e1.getMessage.contains("dedup_exact"))
    val e2 = intercept[IllegalArgumentException] {
      CurationPipeline(docs, Seq(Map("step" -> "filter_length", "min_char" -> 3)))
    }
    assert(e2.getMessage.contains("min_char") && e2.getMessage.contains("min_chars"))
    val e3 = intercept[IllegalArgumentException] {
      CurationPipeline(docs, Seq(Map("step" -> "filter_regex", "mode" -> "keep")))
    }
    assert(e3.getMessage.contains("pattern"))
  }

  test("row-local steps fuse into one scan and observe metrics per step") {
    val named = CurationPipeline(docs, Seq(
      Map("step" -> "normalize"),
      Map("step" -> "filter_length", "min_chars" -> 40),
      Map("step" -> "filter_regex", "pattern" -> "the")),
      observePrefix = Some("cur_"))
    // single stage: no exchange anywhere in the plan for row-local steps
    val plan = named.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan)
    named.collect()
    val observed = named.queryExecution.observedMetrics
      .map { case (k, row) => k -> row.getAs[Long]("rows_out") }
    assert(observed.get("cur_0_normalize").contains(6L))
    assert(observed.get("cur_1_filter_length").contains(4L))
    assert(observed.get("cur_2_filter_regex").contains(3L))
  }

  test("language filter uses an existing column when told to") {
    val out = CurationPipeline(docs, Seq(Map("step" -> "filter_language",
      "langs" -> Seq("de"), "column" -> "lang")))
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(4L))
  }
  test("curation-pipeline steps: filter_gopher, filter_blocklist, dedup_url dispatch") {
    val prose = Array.fill(10)("the quick brown dogs jump with that energy").mkString(" ")
    val docs = Seq(
      (1L, prose, "http://www.a.com/p/"),
      (2L, "too short", "http://a.com:80/p"),
      (3L, prose + " spam", "https://b.org/q")).toDF("doc_id", "text", "url")

    val gopherKept = CurationPipeline(docs, Seq(Map("step" -> "filter_gopher")))
      .select("doc_id").as[Long].collect().toSet
    assert(gopherKept == Set(1L, 3L)) // doc 2 under the 50-word minimum

    val blockKept = CurationPipeline(docs,
      Seq(Map("step" -> "filter_blocklist", "words" -> Seq("spam"))))
      .select("doc_id").as[Long].collect().toSet
    assert(blockKept == Set(1L, 2L))

    // model-backed language filter step
    val lm = LangIdModel(3, Map("en" -> 50L, "de" -> 50L),
      Map("en" -> Map("the" -> 10L), "de" -> Map("der" -> 10L)))
    val langDocs = Seq((1L, "the the the"), (2L, "der der der")).toDF("doc_id", "text")
    val enOnly = CurationPipeline(langDocs, Seq(Map(
      "step" -> "filter_language_model",
      "langs" -> Seq("en"), "model_json" -> LangIdModelJson.render(lm))))
      .select("doc_id").as[Long].collect().toSeq
    assert(enOnly == Seq(1L))

    // docs 1 and 2 canonicalize to the same page; keep-first by doc_id
    val urlKept = CurationPipeline(docs,
      Seq(Map("step" -> "dedup_url", "url_col" -> "url")))
      .select("doc_id").as[Long].collect().toSet
    assert(urlKept == Set(1L, 3L))
    intercept[IllegalArgumentException] {
      CurationPipeline(docs, Seq(Map("step" -> "dedup_url")))
    }
    intercept[IllegalArgumentException] {
      CurationPipeline(docs, Seq(Map("step" -> "filter_gopher", "bogus" -> 1)))
    }
  }

  test("curation-pipeline steps: filter_quality_score and dedup_against_reference dispatch") {
    val docs2 = Seq((1L, "good words"), (2L, "bad stuff"), (3L, "good things"))
      .toDF("doc_id", "text")
    val qm = QualityModel(0.0, Map("good" -> 5.0, "bad" -> -5.0))
    val direct = QualityClassifier.filterByQuality(docs2, col("text"), qm, 0.5)
      .select("doc_id").as[Long].collect().toSet
    val piped = CurationPipeline(docs2, Seq(Map(
      "step" -> "filter_quality_score",
      "model_json" -> QualityModelJson.render(qm), "min_score" -> 0.5)))
      .select("doc_id").as[Long].collect().toSet
    assert(piped == direct && piped == Set(1L, 3L))

    val refRoot = java.nio.file.Files.createTempDirectory("graft_ref")
    try {
      val refDir = refRoot.toString + "/ref"
      Seq("good words").toDF("text").write.mode("overwrite").parquet(refDir)
      val kept = CurationPipeline(docs2, Seq(Map(
        "step" -> "dedup_against_reference", "ref_path" -> refDir)))
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(2L, 3L))
      intercept[IllegalArgumentException] {
        CurationPipeline(docs2, Seq(Map("step" -> "dedup_against_reference")))
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(refRoot).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      ()
    }
  }

  test("sample_token_budget step: ws default and trained-tokenizer budgets") {
    val docs4 = (1L to 8L).map(i => (i, "w w w w w")).toDF("doc_id", "text") // 5 ws tokens each
    val ws = CurationPipeline(docs4, Seq(Map(
      "step" -> "sample_token_budget", "budget_tokens" -> 12)))
    assert(ws.count() == 2) // 2 docs x 5 tokens = 10 <= 12; a third would hit 15
    // wordpiece budget: each "w" is one piece, same counts here but through
    // the trained-tokenizer path (model_json parsed, expression dispatched)
    val model = """{"vocab": ["w"], "unk": "[UNK]", "prefix": "##", "max_chars": 200}"""
    val wp = CurationPipeline(docs4, Seq(Map(
      "step" -> "sample_token_budget", "budget_tokens" -> 12,
      "tokenizer" -> "wordpiece", "model_json" -> model)))
    assert(wp.count() == 2)
    intercept[IllegalArgumentException] {
      CurationPipeline(docs4, Seq(Map(
        "step" -> "sample_token_budget", "budget_tokens" -> 12, "tokenizer" -> "bpe")))
    }
    intercept[IllegalArgumentException] {
      CurationPipeline(docs4, Seq(Map(
        "step" -> "sample_token_budget", "budget_tokens" -> 12,
        "tokenizer" -> "nope", "model_json" -> model)))
    }
  }

  test("curation-pipeline steps: dedup_minhash matches the direct kernel path") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs3 = Seq(
      (1L, base),
      (2L, base), // exact dup of 1 -> jaccard 1.0
      (3L, "completely unrelated words nothing shared here at all everywhere"),
      (4L, "lambda mu nu xi omicron pi rho sigma tau upsilon")
    ).toDF("doc_id", "text")
    val piped = CurationPipeline(docs3, Seq(Map(
      "step" -> "dedup_minhash", "threshold" -> 0.9)))
      .select("doc_id").as[Long].collect().toSet
    assert(piped == Set(1L, 3L, 4L))
    // quality keep rule: longer text wins instead of lowest id
    val docs4 = Seq((1L, base), (2L, base + " extra")).toDF("doc_id", "text")
      .withColumn("q", length(col("text")))
    val best = CurationPipeline(docs4, Seq(Map(
      "step" -> "dedup_minhash", "threshold" -> 0.8, "quality_col" -> "q")))
      .select("doc_id").as[Long].collect().toSet
    assert(best == Set(2L))
  }

  test("curation-pipeline steps: dedup_semantic and decontaminate_semantic dispatch") {
    val emb = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.999, 0.001, 0.0)), // near-dup of 1 -> dropped (higher id)
      (3L, Seq(0.0, 1.0, 0.0)),
      (4L, Seq(0.0, 0.0, 1.0))
    ).toDF("doc_id", "vec")
    val kept = CurationPipeline(emb, Seq(Map(
      "step" -> "dedup_semantic", "vec_col" -> "vec",
      "threshold" -> 0.95, "num_centroids" -> 3, "train_rows" -> 4)))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))

    // a null vec among the first train_rows must not NPE the driver-side
    // k-means sample (it is filtered, matching Pq.train)
    val withNull = Seq((0L, null.asInstanceOf[Seq[Double]])).toDF("doc_id", "vec")
      .union(emb)
    val keptNull = CurationPipeline(withNull, Seq(Map(
      "step" -> "dedup_semantic", "vec_col" -> "vec",
      "threshold" -> 0.95, "num_centroids" -> 3, "train_rows" -> 4)))
      .select("doc_id").as[Long].collect().toSet
    assert(keptNull.intersect(Set(1L, 3L, 4L)) == Set(1L, 3L, 4L))

    // PQ-compressed variant: same semantics under a no-pruning margin
    val keptPq = CurationPipeline(emb, Seq(Map(
      "step" -> "dedup_semantic_pq", "vec_col" -> "vec",
      "threshold" -> 0.95, "margin" -> 1.0, "num_centroids" -> 3,
      "num_blocks" -> 3, "codebook_size" -> 4, "train_rows" -> 4)))
      .select("doc_id").as[Long].collect().toSet
    assert(keptPq == Set(1L, 3L, 4L))

    val evalRoot = java.nio.file.Files.createTempDirectory("graft_eval")
    try {
      val evalDir = evalRoot.toString + "/eval"
      Seq(Seq(0.0, 1.0, 0.0)).toDF("vec").write.mode("overwrite").parquet(evalDir)
      val decon = CurationPipeline(emb, Seq(Map(
        "step" -> "decontaminate_semantic", "vec_col" -> "vec",
        "eval_path" -> evalDir, "threshold" -> 0.95)))
        .select("doc_id").as[Long].collect().toSet
      assert(decon == Set(1L, 2L, 4L)) // doc 3 matches the eval vector
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(evalRoot).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      ()
    }
  }

  test("curation-pipeline steps: drift_check, pq_encode, knn_pq, tokenize_wordpiece dispatch") {
    import graft.pipeline.{WordPieceModel, WordPieceModelJson}
    // drift_check: off-baseline batch annotates detected=true; small batch skips
    val nums = (1 to 1500).map(i => (i.toLong, "doc text", 10.0 + i % 3))
      .toDF("doc_id", "text", "v")
    val drifted = CurationPipeline(nums, Seq(Map("step" -> "drift_check",
      "baseline" -> Map("v" -> Map("mean" -> 100.0, "std" -> 1.0)))))
    assert(drifted.columns.contains("_drift_score"))
    assert(drifted.where(!col("_drift_detected")).count() == 0)
    assert(drifted.count() == 1500)
    val small = CurationPipeline(nums.limit(100), Seq(Map("step" -> "drift_check",
      "baseline" -> Map("v" -> Map("mean" -> 100.0, "std" -> 1.0)))))
    assert(small.where(col("_drift_detected")).count() == 0) // min_sample_size skip
    val onBase = CurationPipeline(nums, Seq(Map("step" -> "drift_check",
      "baseline" -> Map("v" -> Map("mean" -> 11.0, "std" -> 0.82)))))
    assert(onBase.where(col("_drift_detected")).count() == 0)
    // chaining two drift_checks must not duplicate columns: last one wins
    val twice = CurationPipeline(nums, Seq(
      Map("step" -> "drift_check", "baseline" -> Map("v" -> Map("mean" -> 100.0, "std" -> 1.0))),
      Map("step" -> "drift_check", "baseline" -> Map("v" -> Map("mean" -> 11.0, "std" -> 0.82)))))
    assert(twice.columns.count(_ == "_drift_detected") == 1)
    assert(twice.where(col("_drift_detected")).count() == 0)

    // pq_encode: adds a codes column of num_blocks small ints
    val rnd = new java.util.Random(7)
    val emb = (0 until 200).map(i =>
      (i.toLong, "t", Seq.fill(8)(rnd.nextGaussian()))).toDF("doc_id", "text", "vec")
    val coded = CurationPipeline(emb, Seq(Map("step" -> "pq_encode",
      "vec_col" -> "vec", "num_blocks" -> 4, "codebook_size" -> 8, "train_rows" -> 200)))
    val c0 = coded.select("pq_codes").head().getSeq[Int](0)
    assert(c0.length == 4 && c0.forall(c => c >= 0 && c < 8))
    assert(coded.count() == 200)

    // knn_pq: terminal search step; a query identical to corpus vector 3
    // must return neighbor 3 at rank 1
    val qdir = java.nio.file.Files.createTempDirectory("graft_knnpq")
    try {
      val qpath = qdir.toString + "/queries"
      emb.where(col("doc_id") === 3)
        .select(col("doc_id").as("query_id"), col("vec"))
        .write.mode("overwrite").parquet(qpath)
      val knn = CurationPipeline(emb, Seq(Map("step" -> "knn_pq",
        "vec_col" -> "vec", "queries_path" -> qpath, "k" -> 5,
        "num_blocks" -> 4, "codebook_size" -> 8, "train_rows" -> 200,
        "shortlist" -> 200, "query_vec_col" -> "vec")))
        .orderBy("rank").select("neighbor_id").as[Long].collect()
      assert(knn.length == 5 && !knn.contains(3L)) // self excluded, k returned
      // rank-1 is the true nearest by exact cosine (rerank contract):
      val vecs = emb.select("doc_id", "vec").as[(Long, Seq[Double])].collect().toMap
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      val best = vecs.filter(_._1 != 3L)
        .map { case (id, v) => (id, cos(v, vecs(3L))) }
        .toSeq.sortBy { case (id, c) => (-c, id) }.head._1
      assert(knn.head == best, s"rank1 ${knn.head} != exact $best")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(qdir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      ()
    }

    // knn_ivfpq (r10): the cell-pruned search step, residual (IVFADC) mode —
    // exhaustive setting must equal the exact rerank answer
    val qdir2 = java.nio.file.Files.createTempDirectory("graft_knnivfpq")
    try {
      val qpath2 = qdir2.toString + "/queries"
      emb.where(col("doc_id") === 3)
        .select(col("doc_id").as("query_id"), col("vec"))
        .write.mode("overwrite").parquet(qpath2)
      val knn2 = CurationPipeline(emb, Seq(Map("step" -> "knn_ivfpq",
        "vec_col" -> "vec", "queries_path" -> qpath2, "k" -> 5,
        "num_cells" -> 4, "nprobe" -> 4, "num_blocks" -> 4,
        "codebook_size" -> 8, "train_rows" -> 200, "shortlist" -> 200,
        "query_vec_col" -> "vec", "residual" -> true)))
        .orderBy("rank").select("neighbor_id").as[Long].collect()
      assert(knn2.length == 5 && !knn2.contains(3L))
      val vecs2 = emb.select("doc_id", "vec").as[(Long, Seq[Double])].collect().toMap
      def cos2(a: Seq[Double], b: Seq[Double]): Double = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      val exact5 = vecs2.filter(_._1 != 3L)
        .map { case (id, v) => (id, cos2(v, vecs2(3L))) }
        .toSeq.sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      assert(knn2.toSeq == exact5, s"ivfpq exhaustive ${knn2.toSeq} != exact $exact5")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(qdir2).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      ()
    }

    // dedup_semantic_against_reference (r10): rows semantically present in a
    // prior snapshot drop; in-corpus-only duplicates survive
    val refDir = java.nio.file.Files.createTempDirectory("graft_semref")
    try {
      val refPath = refDir.toString + "/ref"
      Seq((10L, Seq(0.0, 2.0)), (11L, Seq(0.0, 2.0))).toDF("doc_id", "vec")
        .write.mode("overwrite").parquet(refPath)
      val cur = Seq(
        (1L, "t", Seq(10.0, 0.1)), (2L, "t", Seq(10.0, 0.1)), (10L, "t", Seq(0.0, 2.0)))
        .toDF("doc_id", "text", "vec")
      val keptInc = CurationPipeline(cur, Seq(Map(
        "step" -> "dedup_semantic_against_reference", "vec_col" -> "vec",
        "ref_path" -> refPath, "threshold" -> 0.99, "num_centroids" -> 2,
        "train_rows" -> 10))).select("doc_id").as[Long].collect().toSet
      assert(keptInc == Set(1L, 2L), keptInc)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(refDir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      ()
    }

    // sample_cluster_quota: topic balancing caps each embedding cluster
    val lop = (0 until 90).map(i => (i.toLong, "t", Seq(1.0, 0.01 * i % 1))) ++
      (100 until 110).map(i => (i.toLong, "t", Seq(0.0, 1.0)))
    val balanced = CurationPipeline(lop.toDF("doc_id", "text", "vec"), Seq(Map(
      "step" -> "sample_cluster_quota", "vec_col" -> "vec",
      "quota" -> 20, "num_centroids" -> 2, "train_rows" -> 100)))
    val byCluster = balanced.groupBy("cluster").count()
      .as[(Int, Long)].collect().toMap
    assert(byCluster.values.forall(_ <= 20), byCluster)
    assert(byCluster.values.sum == 30) // 90-cluster capped to 20, small one intact
    assert(balanced.columns.contains("cluster"))

    // tokenize_wordpiece: count and encode modes with a serialized model
    val vocab = ('a' to 'z').flatMap(c => Seq(c.toString, "##" + c)).toSet ++
      Set("ab", "##cd")
    val json = WordPieceModelJson.render(WordPieceModel(vocab))
    val docs = Seq((1L, "abcd xy"), (2L, "q9")).toDF("doc_id", "text")
    val counted = CurationPipeline(docs, Seq(Map("step" -> "tokenize_wordpiece",
      "model_json" -> json))).select("doc_id", "token_count")
      .as[(Long, Int)].collect().toMap
    assert(counted(1L) == 4) // "abcd" -> ab, ##cd (greedy); "xy" -> x, ##y
    assert(counted(2L) == 1) // digit -> whole-word [UNK]
    val encoded = CurationPipeline(docs, Seq(Map("step" -> "tokenize_wordpiece",
      "model_json" -> json, "mode" -> "encode", "output_col" -> "toks")))
      .where(col("doc_id") === 1).select("toks").head().getSeq[String](0)
    assert(encoded.take(2) == Seq("ab", "##cd"), encoded)
  }

  test("curation-pipeline steps: near_dedup_against_reference drops near-rewrites") {
    val refRoot = java.nio.file.Files.createTempDirectory("graft_nref")
    try {
      val refDir = refRoot.toString + "/snap"
      Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
        .toDF("doc_id", "text").write.mode("overwrite").parquet(refDir)
      val today = Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta iota"), // near-rewrite
        (2L, "a genuinely new page about entirely different topics today")
      ).toDF("doc_id", "text")
      val kept = CurationPipeline(today, Seq(Map(
        "step" -> "near_dedup_against_reference", "ref_path" -> refDir,
        "threshold" -> 0.8)))
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(2L))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(refRoot).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      ()
    }
  }
}
