package graft.queries

import graft.pipeline._
import graft.queries.QueryDefs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract queries for the LLM-data-pipeline operators (dedup,
  * similarity search, text analysis, multimodal). Near-dup inputs plant
  * perturbed copies with derivations the DuckDB oracle replicates exactly.
  */
object PipelineQueries {

  /** documents + 80%-prefix copies of every 20th doc (near-dups). */
  private def plantedNearDups(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val toks = split(col("text"), " ")
    val keepN = greatest((size(toks) * 8) / 10, lit(3))
    val pert = docs.where(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1), keepN)).as("text"))
    docs.unionByName(pert)
  }

  private val plantedNearDupsSql =
    """planted AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id,
      |         array_to_string(string_split(text,' ')[1:greatest((len(string_split(text,' '))*8)//10, 3)], ' ') AS text
      |  FROM documents WHERE doc_id % 20 = 0)""".stripMargin

  /** Shared WITH-RECURSIVE prologue for the cluster gates: transitive closure
    * over the exact-Jaccard >= 0.8 pair set of the planted corpus; `cl` maps
    * every paired doc to its component's min reachable id (quadratic closure
    * is fine at oracle scale).
    */
  private val nearDupClustersSql =
    s"""WITH RECURSIVE $plantedNearDupsSql,
       |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM planted),
       |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
       |         THEN list_transform(generate_series(1, len(t)-2), i -> array_to_string(t[i:i+2], ' '))
       |         ELSE [array_to_string(t, ' ')] END) AS s FROM toks),
       |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.s, b.s))::DOUBLE
       |        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
       |sym AS (SELECT id_a AS a, id_b AS b FROM pairs
       |        UNION SELECT id_b AS a, id_a AS b FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM (SELECT a, b FROM sym UNION SELECT DISTINCT a, a AS b FROM sym)
       |  UNION
       |  SELECT r.a, s2.b FROM reach r JOIN sym s2 ON r.b = s2.a),
       |cl AS (SELECT a AS id, min(b) AS cluster FROM reach GROUP BY a)""".stripMargin

  /** "Yesterday's" snapshot for the incremental near-dup gates: 90%-truncated
    * rewrites of every 20th doc (ids +100000). NULL-text rows are excluded so
    * both engines agree on the ref set (Spark's concat_ws would otherwise
    * degrade NULL to "" while the SQL side drops the row).
    */
  private def truncatedRef(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val keepN = greatest((size(toks) * 9) / 10, lit(3))
    docs.where(col("text").isNotNull && col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1), keepN)).as("text"))
  }

  private val truncatedRefSql =
    """ref AS (
      |  SELECT doc_id + 100000 AS doc_id,
      |         array_to_string(string_split(text,' ')[1:greatest((len(string_split(text,' '))*9)//10, 3)], ' ') AS text
      |  FROM documents WHERE text IS NOT NULL AND doc_id % 20 = 0)""".stripMargin

  /** Word-3-gram shingle-set CTE over `src` — MUST stay in lock-step with
    * [[Dedup.shingles]] / HashedShingles (same tokenize, same short-text
    * fallback); both near-dup gates share this single copy.
    */
  private def shingleCte(name: String, src: String): String =
    s"""$name AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
       |    THEN list_transform(generate_series(1, len(t)-2), i -> array_to_string(t[i:i+2], ' '))
       |    ELSE [array_to_string(t, ' ')] END) AS s
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM $src WHERE text IS NOT NULL))""".stripMargin

  /** Shared WITH-prologue: exact cross-snapshot Jaccard >= 0.8 pairs (id from
    * today's documents, ref_id from [[truncatedRefSql]]).
    */
  private val nearDupCrossPairsSql =
    s"""WITH $truncatedRefSql,
       |${shingleCte("sh_l", "documents")},
       |${shingleCte("sh_r", "ref")},
       |xp AS (SELECT a.doc_id AS id, b.doc_id AS ref_id
       |  FROM sh_l a JOIN sh_r b
       |    ON len(list_intersect(a.s, b.s))::DOUBLE
       |       / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8)""".stripMargin

  /** documents + exact copies of every 10th-plus-1 doc. */
  private def plantedExactDups(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    docs.unionByName(docs.where(col("doc_id") % 10 === 1)
      .select((col("doc_id") + 200000).as("doc_id"), col("text")))
  }

  /** DuckDB replica of TextAnalysis.languageId: per-language distinct-stopword
    * hit counts, argmax with registry-order tie-break, 'und' when all zero.
    * Generated from the SAME registry so the two can never drift.
    */
  private def langIdOracleSql: String = {
    val langs = TextAnalysis.LanguageStopwords
    val scoreCols = langs.map { case (lang, words) =>
      val list = words.map(w => s"'${w.replace("'", "''")}'").mkString("[", ", ", "]")
      s"len(list_intersect(toks, $list)) AS s_$lang"
    }.mkString(",\n  ")
    val caseBranches = langs.map { case (lang, _) =>
      val geAll = langs.map { case (o, _) => s"s_$lang >= s_$o" }.mkString(" AND ")
      s"WHEN s_$lang > 0 AND $geAll THEN '$lang'"
    }.mkString("\n    ")
    s"""WITH t AS (SELECT doc_id, list_distinct(string_split_regex(lower(text), '\\s+')) AS toks FROM documents),
       |s AS (SELECT doc_id,
       |  $scoreCols
       |FROM t),
       |p AS (SELECT doc_id, CASE
       |    $caseBranches
       |    ELSE 'und' END AS lang_pred FROM s)
       |SELECT lang_pred, count(*) AS n FROM p GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** DuckDB replica of PiiChecks.redactPii over planted entities, generated
    * from the SAME EntityPatterns registry (redaction-order chain) so the two
    * can never drift. The patterns use only RE2-compatible syntax.
    */
  private def piiRedactOracleSql: String = {
    val pats = graft.checks.PiiChecks.RedactionPatterns
    val chain = graft.checks.PiiChecks.RedactionOrder
      .filter(Seq("EMAIL_ADDRESS", "IP_ADDRESS", "US_SSN").contains)
      .foldLeft("text") { (acc, name) =>
        val re = pats(name).replace("'", "''")
        s"regexp_replace($acc, '$re', '[$name]', 'g')"
      }
    s"""WITH p AS (SELECT doc_id,
       |  CASE WHEN doc_id % 5 = 0 THEN text || ' contact user' || doc_id || '@example.com now'
       |       WHEN doc_id % 5 = 1 THEN text || ' ssn 123-45-6789 ok'
       |       WHEN doc_id % 5 = 2 THEN text || ' from 10.1.2.33 host'
       |       ELSE text END AS text
       |FROM documents)
       |SELECT doc_id, $chain AS redacted FROM p ORDER BY doc_id""".stripMargin
  }

  val all: Seq[(String, QueryDef)] = (Seq(

    "pipe_dedup_exact" -> QueryDef(
      (s, dir) => {
        val input = plantedExactDups(s, dir)
        Dedup.flagExactDuplicates(input, Seq(col("text")))
          .where(col("__is_duplicate"))
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 10 = 1)
             |SELECT doc_id FROM planted
             |WHERE text IN (SELECT text FROM planted GROUP BY text HAVING count(*) > 1)
             |ORDER BY 1""".stripMargin)),

    "pipe_dedup_exact_keep_first" -> QueryDef(
      (s, dir) => {
        val input = plantedExactDups(s, dir)
        Dedup.dedupExact(input, Seq(col("text")), col("doc_id"))
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 10 = 1)
             |SELECT min(doc_id) AS doc_id FROM planted GROUP BY text ORDER BY 1""".stripMargin)),

    "pipe_dedup_minhash" -> QueryDef(
      (s, dir) => Dedup.minHashDuplicatePairs(plantedNearDups(s, dir), "doc_id", "text",
        shingleSize = 3, numHashes = 128, bands = 32, threshold = 0.8)
        .select("id_a", "id_b").orderBy("id_a", "id_b"),
      Some(s"""WITH $plantedNearDupsSql,
              |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM planted),
              |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
              |         THEN list_transform(generate_series(1, len(t)-2), i -> array_to_string(t[i:i+2], ' '))
              |         ELSE [array_to_string(t, ' ')] END) AS s FROM toks)
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b
              |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |WHERE len(list_intersect(a.s, b.s))::DOUBLE
              |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
              |ORDER BY 1, 2""".stripMargin)),

    "pipe_dedup_clusters" -> QueryDef(
      (s, dir) => {
        val pairs = Dedup.minHashDuplicatePairs(plantedNearDups(s, dir), "doc_id", "text",
          shingleSize = 3, numHashes = 128, bands = 32, threshold = 0.8)
        Dedup.duplicateClusters(pairs).orderBy("id")
      },
      // transitive closure over the same exact-Jaccard pair set; cluster =
      // min reachable id ([[nearDupClustersSql]], shared with keep_best)
      Some(s"""$nearDupClustersSql
              |SELECT id, cluster FROM cl ORDER BY 1""".stripMargin)),

    // quality keep rule over the SAME clusters: each component keeps its
    // longest-text member (ties -> lowest doc_id); docs in no pair survive
    // untouched. Exercises the struct-ordered argmax path end-to-end.
    "pipe_dedup_clusters_keep_best" -> QueryDef(
      (s, dir) => {
        val input = plantedNearDups(s, dir)
        val pairs = Dedup.minHashDuplicatePairs(input, "doc_id", "text",
          shingleSize = 3, numHashes = 128, bands = 32, threshold = 0.8)
        Dedup.dedupByClustersKeepBest(input, "doc_id", length(col("text")),
          Dedup.duplicateClusters(pairs))
          .select("doc_id").orderBy("doc_id")
      },
      Some(s"""$nearDupClustersSql,
              |win AS (SELECT doc_id FROM (
              |  SELECT p.doc_id,
              |         row_number() OVER (PARTITION BY cl.cluster
              |                            ORDER BY length(p.text) DESC, p.doc_id) AS rn
              |  FROM cl JOIN planted p ON p.doc_id = cl.id) WHERE rn = 1)
              |SELECT doc_id FROM planted WHERE doc_id NOT IN (SELECT id FROM cl)
              |UNION ALL
              |SELECT doc_id FROM win
              |ORDER BY 1""".stripMargin)),

    "pipe_dedup_ngram_jaccard" -> QueryDef(
      (s, dir) => Dedup.ngramJaccardPairs(plantedNearDups(s, dir), "doc_id", "text",
        n = 2, threshold = 0.75)
        .select("id_a", "id_b").orderBy("id_a", "id_b"),
      Some(s"""WITH $plantedNearDupsSql,
              |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM planted),
              |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 2
              |         THEN list_transform(generate_series(1, len(t)-1), i -> array_to_string(t[i:i+1], ' '))
              |         ELSE [array_to_string(t, ' ')] END) AS s FROM toks)
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b
              |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |WHERE len(list_intersect(a.s, b.s))::DOUBLE
              |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.75
              |ORDER BY 1, 2""".stripMargin)),

    // SimHash gate = recall + precision, both DuckDB-expressible:
    //  - recall: planted EXACT copies (doc_id%10==1 at +200000) share every
    //    chunk value with their source, so the pigeonhole banding emits them
    //    with hamming 0 BY CONSTRUCTION — the output must contain exactly the
    //    planted pair list;
    //  - precision: any emitted pair whose distinct-token jaccard < 0.5 is
    //    also emitted (probe-measured min on sf0.01 is 0.76, so zero such
    //    rows are expected — an extra row fails the hash compare).
    // Planted 80%-prefix near-dups stay in the input to keep the candidate
    // space realistic, but their recall is sketch-dependent (token-multiset
    // weighting) and is deliberately not asserted.
    "pipe_dedup_simhash" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val input = plantedNearDups(s, dir).unionByName(
          docs.where(col("doc_id") % 10 === 1)
            .select((col("doc_id") + 200000).as("doc_id"), col("text")))
        val pairs = Dedup.simHashDuplicatePairs(input, "doc_id", "text", maxHamming = 3)
        val tk = input.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("tk"))
        pairs
          .join(tk.select(col("doc_id").as("id_a"), col("tk").as("tk_a")), "id_a")
          .join(tk.select(col("doc_id").as("id_b"), col("tk").as("tk_b")), "id_b")
          .withColumn("inter", size(array_intersect(col("tk_a"), col("tk_b"))))
          .withColumn("uni", size(col("tk_a")) + size(col("tk_b")) - col("inter"))
          .where((col("id_b") === col("id_a") + 200000) || (col("inter") * 2 < col("uni")))
          .select("id_a", "id_b").orderBy("id_a", "id_b")
      },
      Some("""SELECT doc_id AS id_a, doc_id + 200000 AS id_b FROM documents
             |WHERE doc_id % 10 = 1 ORDER BY 1, 2""".stripMargin)),

    // line-level dedup gate: every doc gets a shared boilerplate header +
    // footer and a per-doc unique line; line dedup must strip exactly the
    // boilerplate (corpus count > 1) and keep original text + unique line in
    // order. Oracle recomputes global line counts in DuckDB.
    "pipe_dedup_lines" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"),
          concat_ws("\n",
            lit("subscribe to our newsletter"),
            col("text"),
            concat(lit("unique line "), col("doc_id")),
            lit("all rights reserved")).as("text"))
        Dedup.dedupLines(docs, "doc_id", "text", maxOccurrences = 1)
          .orderBy("doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id, 'subscribe to our newsletter' || chr(10) || text || chr(10) ||
             |         'unique line ' || doc_id || chr(10) || 'all rights reserved' AS text
             |  FROM documents),
             |lines AS (
             |  SELECT doc_id, t.line, t.pos
             |  FROM planted, LATERAL (
             |    SELECT unnest(string_split(text, chr(10))) AS line,
             |           generate_subscripts(string_split(text, chr(10)), 1) AS pos) t),
             |counts AS (SELECT line, count(*) AS n FROM lines
             |           WHERE trim(line) <> '' GROUP BY line)
             |SELECT l.doc_id,
             |       string_agg(l.line, chr(10) ORDER BY l.pos) AS text
             |FROM lines l LEFT JOIN counts c ON l.line = c.line
             |WHERE c.n IS NULL OR c.n <= 1
             |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin)),

    "pipe_dedup_cosine" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        val planted = emb.unionByName(
          emb.where(col("vec_id") % 25 === 0)
            .select((col("vec_id") + 100000).as("vec_id"),
              transform(col("embedding"), x => x * lit(1.01)).as("embedding")))
        Dedup.cosineNearDupPairs(planted, "vec_id", "embedding", threshold = 0.999,
          planes = 20, tables = 8, dim = 64)
          .select("id_a", "id_b").orderBy("id_a", "id_b")
      },
      Some("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |planted AS (
             |  SELECT vec_id, e FROM emb
             |  UNION ALL
             |  SELECT vec_id + 100000, list_transform(e, x -> x * 1.01) FROM emb WHERE vec_id % 25 = 0)
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b
             |FROM planted a JOIN planted b ON a.vec_id < b.vec_id
             |WHERE list_cosine_similarity(a.e, b.e) >= 0.999
             |ORDER BY 1, 2""".stripMargin)),

    "pipe_knn_bruteforce" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 20), "vec_id", "embedding", 5)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |q AS (SELECT vec_id, e FROM emb WHERE vec_id < 20),
             |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |  list_cosine_similarity(q.e, c.e) AS cos
             |  FROM q JOIN emb c ON c.vec_id != q.vec_id)
             |SELECT query_id, rank, neighbor_id FROM (
             |  SELECT query_id, neighbor_id,
             |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
             |  FROM scored) t
             |WHERE rank <= 5 ORDER BY 1, 2""".stripMargin)),

    "pipe_knn_ivf" -> QueryDef(
      (s, dir) => {
        // nprobe = numCentroids makes IVF exhaustive, so the exact brute-force
        // oracle applies; recall-at-lower-nprobe is spec-tested
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        Similarity.ivfTopK(emb, emb.where(col("vec_id") < 20), "vec_id", "embedding", 5,
          numCentroids = 16, nprobe = 16, trainRows = 2000)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |q AS (SELECT vec_id, e FROM emb WHERE vec_id < 20),
             |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |  list_cosine_similarity(q.e, c.e) AS cos
             |  FROM q JOIN emb c ON c.vec_id != q.vec_id)
             |SELECT query_id, rank, neighbor_id FROM (
             |  SELECT query_id, neighbor_id,
             |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
             |  FROM scored) t
             |WHERE rank <= 5 ORDER BY 1, 2""".stripMargin)),

    // IVF-PQ composition gate (r9): nprobe = numCells and a corpus-sized
    // shortlist make the pipeline exhaustive — every row is ADC-scored and
    // every candidate is exact-cosine reranked, so the brute-force oracle
    // applies exactly (the spec proves the degenerate-exact property; recall
    // at sublinear nprobe/shortlist is spec-tested on clustered data).
    "pipe_knn_ivfpq" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        val queries = emb.where(col("vec_id") < 20)
          .select(col("vec_id").cast("long"), col("embedding"))
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
          .sortBy(_._1)
        Pq.ivfPqTopK(emb, "vec_id", "embedding", queries, k = 5,
          numCells = 16, nprobe = 16, numBlocks = 16, codebookSize = 64,
          shortlist = 1000000, trainRows = 2000)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |q AS (SELECT vec_id, e FROM emb WHERE vec_id < 20),
             |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |  list_cosine_similarity(q.e, c.e) AS cos
             |  FROM q JOIN emb c ON c.vec_id != q.vec_id)
             |SELECT query_id, rank, neighbor_id FROM (
             |  SELECT query_id, neighbor_id,
             |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
             |  FROM scored) t
             |WHERE rank <= 5 ORDER BY 1, 2""".stripMargin)),

    // Incremental-append gate (r12): build on the even half, append the odd
    // half with the FROZEN quantizers (Pq.ivfPqAppendToIndex — no retrain),
    // query the union index exhaustively (nprobe = numCells, corpus-sized
    // shortlist + exact rerank) so the brute-force oracle applies exactly;
    // frozen-model append==rebuild identity and at-rest pruning are
    // spec-pinned (PqSpec).
    "pipe_knn_ivfpq_appended" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        val queries = emb.where(col("vec_id") < 20)
          .select(col("vec_id").cast("long"), col("embedding"))
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
          .sortBy(_._1)
        val (model, idxEven) = Pq.ivfPqBuildIndex(emb.where(col("vec_id") % 2 === 0),
          "vec_id", "embedding", numCells = 16, numBlocks = 16, codebookSize = 64,
          trainRows = 2000)
        val appended = Pq.ivfPqAppendToIndex(model, emb.where(col("vec_id") % 2 === 1),
          "vec_id", "embedding")
        Pq.ivfPqTopKIndexed(idxEven.unionByName(appended), model, queries, k = 5,
          nprobe = 16, shortlist = 1000000)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |q AS (SELECT vec_id, e FROM emb WHERE vec_id < 20),
             |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |  list_cosine_similarity(q.e, c.e) AS cos
             |  FROM q JOIN emb c ON c.vec_id != q.vec_id)
             |SELECT query_id, rank, neighbor_id FROM (
             |  SELECT query_id, neighbor_id,
             |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
             |  FROM scored) t
             |WHERE rank <= 5 ORDER BY 1, 2""".stripMargin)),

    // SUBLINEAR IVF-PQ gate (r10): nprobe=2 STRICTLY BELOW numCells=8, exact
    // by construction. The corpus is rebuilt as one-hot direction vectors
    // (direction = vec_id % 8) scaled by powers of two (2^(vec_id % 3) — so
    // dot, norms, and cosine are all EXACT floats and same-direction cosine
    // is exactly 1.0 > 0.0 cross-direction). Scaling never changes the
    // argmax over NORMALIZED centroids, so every member of a query's
    // direction group lives in the query's own argmax cell — which is
    // always probe #1 — hence the true top-k provably co-locates in the
    // probed cells and the closed-form oracle (k lowest other ids of the
    // same direction group) applies at ANY nprobe >= 1. The shortlist
    // exceeds the corpus so only CELL PRUNING is exercised; ADC-cut recall
    // is spec-tested (PqSpec).
    "pipe_knn_ivfpq_sublinear" -> QueryDef(
      (s, dir) => {
        val dirCol = (col("vec_id") % 8).cast("int")
        val scale = pow(lit(2.0), (col("vec_id") % 3).cast("double"))
        val vec = array((0 until 8).map(i =>
          when(dirCol === i, scale).otherwise(lit(0.0))): _*)
        val corpus = t(s, dir, "embeddings").select(
          col("vec_id").cast("long").as("vec_id"), vec.as("v"))
        val queries = corpus.where(col("vec_id") < 8)
          .select(col("vec_id"), col("v"))
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
          .sortBy(_._1)
        Pq.ivfPqTopK(corpus, "vec_id", "v", queries, k = 5,
          numCells = 8, nprobe = 2, numBlocks = 4, codebookSize = 8,
          shortlist = 10000000, trainRows = 4000)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some("""WITH c AS (SELECT vec_id, vec_id % 8 AS dir FROM embeddings),
             |q AS (SELECT vec_id AS query_id, dir FROM c WHERE vec_id < 8),
             |n AS (SELECT q.query_id, c.vec_id AS neighbor_id,
             |        row_number() OVER (PARTITION BY q.query_id ORDER BY c.vec_id) AS rank
             |      FROM q JOIN c ON c.dir = q.dir AND c.vec_id != q.query_id)
             |SELECT query_id, rank, neighbor_id FROM n WHERE rank <= 5 ORDER BY 1, 2""".stripMargin)),

    // Product-quantization gate: FIXED literal codebooks (2 blocks x 2
    // centroids over the first 4 dims), so per-block argmin encoding and the
    // ADC lookup sum are pure closed-form arithmetic the oracle replays.
    // Ties keep the lowest centroid index on both sides (<=).
    "pipe_knn_pq" -> QueryDef(
      (s, dir) => {
        val model = Pq.PqModel(2, Array(
          Array(Array(1.0, 0.0), Array(0.0, 1.0)),
          Array(Array(1.0, 0.0), Array(0.0, 1.0))))
        val emb = t(s, dir, "embeddings").select(col("vec_id"),
          slice(col("embedding").cast("array<double>"), 1, 4).as("v4"))
        emb.select(col("vec_id"), Pq.encodeColumn(col("v4"), model).as("codes"))
          .select(col("vec_id"),
            col("codes")(0).as("code0"), col("codes")(1).as("code1"),
            round(Pq.adcDotColumn(col("codes"), Array(1.0, 0.0, 0.0, 1.0), model), 4)
              .as("adc_dot"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)) AS v
             |           FROM embeddings),
             |c AS (SELECT vec_id,
             |  CASE WHEN (v[1]-1)*(v[1]-1)+v[2]*v[2] <= v[1]*v[1]+(v[2]-1)*(v[2]-1)
             |       THEN 0 ELSE 1 END AS code0,
             |  CASE WHEN (v[3]-1)*(v[3]-1)+v[4]*v[4] <= v[3]*v[3]+(v[4]-1)*(v[4]-1)
             |       THEN 0 ELSE 1 END AS code1
             |FROM e)
             |SELECT vec_id, code0, code1,
             |       round(CAST(CASE WHEN code0=0 THEN 1.0 ELSE 0.0 END +
             |             CASE WHEN code1=0 THEN 0.0 ELSE 1.0 END AS DOUBLE), 4) AS adc_dot
             |FROM c ORDER BY vec_id""".stripMargin)),

    // LSH-ANN gate: plant a scaled copy (x*1.01) of every query vector —
    // scaling never flips a hyperplane sign, so the copy lands in the SAME
    // bucket in every table (guaranteed candidate), and cosine(x, 1.01x)=1.0
    // beats every natural neighbor (probe-measured max natural cosine ~0.3).
    // Deterministic assertions: each query returns exactly k neighbors and
    // its rank-1 neighbor IS the planted copy. Deeper ranks are approximate
    // by design and deliberately not asserted.
    "pipe_knn_lsh" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        val queries = emb.where(col("vec_id") < 20)
        val corpus = emb.unionByName(queries.select(
          (col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.01)).as("embedding")))
        Similarity.lshTopK(corpus, queries, "vec_id", "embedding", 5,
          planes = 6, tables = 6, dim = 64)
          .groupBy("query_id").agg(
            count(lit(1)).as("n_neighbors"),
            max(when(col("rank") === 1, col("neighbor_id"))).as("top1_id"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_neighbors,
             |       vec_id + 100000 AS top1_id
             |FROM embeddings WHERE vec_id < 20 ORDER BY 1""".stripMargin)),

    "pipe_text_signals" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          length(col("text")).as("n_chars"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens,
             |       length(text) AS n_chars
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "pipe_text_fingerprint" -> QueryDef(
      (s, dir) => {
        val input = plantedExactDups(s, dir)
        input.select(TextAnalysis.fingerprint(col("text")).as("fp"))
          .agg(countDistinct(col("fp")).as("n_distinct"))
      },
      Some("""WITH planted AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 10 = 1)
             |SELECT count(DISTINCT regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS n_distinct
             |FROM planted""".stripMargin)),

    "pipe_text_langid" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(TextAnalysis.languageId(col("text")).as("lang_pred"))
        .groupBy("lang_pred").agg(count(lit(1)).as("n"))
        .orderBy("lang_pred"),
      Some(langIdOracleSql)), // oracle generated from the same stopword registry

    "pipe_text_repetition" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.repetitionSignals(col("text")).as("r"))
        .select(col("doc_id"),
          col("r.dup_word_frac").as("dup_word_frac"),
          col("r.top_word_frac").as("top_word_frac"),
          col("r.dup_2gram_frac").as("dup_2gram_frac"),
          col("r.dup_3gram_frac").as("dup_3gram_frac"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |g AS (SELECT doc_id, w,
             |  CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) ELSE [] END AS b2,
             |  CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE [] END AS b3
             |FROM t)
             |SELECT doc_id,
             |  CASE WHEN len(w) > 0 THEN 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) ELSE 0.0 END AS dup_word_frac,
             |  CASE WHEN len(w) > 0 THEN CAST(list_max(list_transform(list_distinct(w), x -> len(list_filter(w, y -> y = x)))) AS DOUBLE) / len(w) ELSE 0.0 END AS top_word_frac,
             |  CASE WHEN len(b2) > 0 THEN 1.0 - CAST(len(list_distinct(b2)) AS DOUBLE) / len(b2) ELSE 0.0 END AS dup_2gram_frac,
             |  CASE WHEN len(b3) > 0 THEN 1.0 - CAST(len(list_distinct(b3)) AS DOUBLE) / len(b3) ELSE 0.0 END AS dup_3gram_frac
             |FROM g ORDER BY doc_id""".stripMargin)),

    "pipe_text_normalize" -> QueryDef(
      (s, dir) => {
        val p = t(s, dir, "documents").where(col("doc_id") < 2000)
          .select(col("doc_id"),
            when(col("doc_id") % 3 === 0, upper(col("text")))
              .when(col("doc_id") % 3 === 1, concat(lit("  "), col("text"), lit(" \t ")))
              .otherwise(col("text")).as("text"))
        p.select(col("doc_id"), TextAnalysis.normalizeText(col("text")).as("norm"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id,
             |  CASE WHEN doc_id % 3 = 0 THEN upper(text)
             |       WHEN doc_id % 3 = 1 THEN '  ' || text || ' ' || chr(9) || ' '
             |       ELSE text END AS text
             |FROM documents WHERE doc_id < 2000)
             |SELECT doc_id,
             |  trim(regexp_replace(regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
             |FROM p ORDER BY doc_id""".stripMargin)),

    "pipe_text_chunks" -> QueryDef(
      (s, dir) => TextAnalysis.chunkDocuments(
        t(s, dir, "documents").select("doc_id", "text"), "text", chunkSize = 16, overlap = 4)
        .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |k AS (SELECT doc_id, w,
             |        CASE WHEN len(w) > 16 THEN CAST(ceil((len(w) - 16) / 12.0) AS INT) ELSE 0 END AS kk
             |      FROM t),
             |c AS (SELECT doc_id,
             |        unnest(list_transform(range(1, kk*12 + 2, 12), s -> array_to_string(w[s:s+15], ' '))) AS chunk_text,
             |        generate_subscripts(range(1, kk*12 + 2, 12), 1) - 1 AS chunk_id
             |      FROM k)
             |SELECT doc_id, chunk_id, chunk_text FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    "pipe_doc_frequency" -> QueryDef(
      (s, dir) => TextAnalysis.documentFrequency(
        t(s, dir, "documents"), col("text"))
        .orderBy(col("doc_freq").desc, col("word"))
        .limit(50),
      Some("""WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word FROM documents)
             |SELECT word, count(*) AS doc_freq FROM t GROUP BY 1
             |ORDER BY doc_freq DESC, word LIMIT 50""".stripMargin)),

    "pipe_decontaminate" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val eval = docs.where(col("doc_id") % 97 === 3)
        Curation.decontaminate(docs, col("doc_id"), col("text"), eval, col("text"), n = 8)
          .select(col("doc_id"), col("is_contaminated"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |eg AS (SELECT DISTINCT unnest(list_transform(range(1, len(w) - 6), i -> array_to_string(w[i:i+7], ' '))) AS g
             |       FROM d WHERE doc_id % 97 = 3 AND len(w) >= 8),
             |cont AS (SELECT DISTINCT doc_id
             |         FROM (SELECT doc_id, unnest(list_transform(range(1, len(w) - 6), i -> array_to_string(w[i:i+7], ' '))) AS g
             |               FROM d WHERE len(w) >= 8)
             |         WHERE g IN (SELECT g FROM eg))
             |SELECT doc_id, (doc_id IN (SELECT doc_id FROM cont)) AS is_contaminated
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Semantic decontamination gate: corpus = embeddings (4-dim slice) plus
    // planted scaled copies of every eval vector (×1.5 — same direction, so
    // cosine is 1 up to float ulps: a "paraphrase" no n-gram rule can see).
    // Threshold 0.999 sits mid-gap: self/scaled matches are >= 1 - 2e-16,
    // the nearest ambient max-sim-to-eval is 0.99790 (probed in DuckDB), so
    // cross-engine float drift cannot flip a row.
    "pipe_decontaminate_semantic" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select(col("vec_id"),
          slice(col("embedding").cast("array<double>"), 1, 4).as("v4"))
        val evalSet = emb.where(col("vec_id") % 25 === 0)
        val planted = evalSet.select((col("vec_id") + 100000).as("vec_id"),
          transform(col("v4"), x => x * 1.5).as("v4"))
        Curation.decontaminateSemantic(emb.unionByName(planted),
          col("vec_id"), col("v4"), evalSet, col("v4"), threshold = 0.999)
          .select(col("vec_id"), col("is_contaminated"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |corpus AS (SELECT vec_id, v FROM e
             |           UNION ALL
             |           SELECT vec_id + 100000, list_transform(v, x -> x * 1.5)
             |           FROM e WHERE vec_id % 25 = 0),
             |ev AS (SELECT v FROM e WHERE vec_id % 25 = 0),
             |cont AS (SELECT DISTINCT c.vec_id FROM corpus c JOIN ev
             |         ON list_cosine_similarity(c.v, ev.v) >= 0.999)
             |SELECT vec_id, (vec_id IN (SELECT vec_id FROM cont)) AS is_contaminated
             |FROM corpus ORDER BY vec_id""".stripMargin)),

    "pipe_curation_hash_sample" -> QueryDef(
      (s, dir) => Curation.hashSample(
        t(s, dir, "documents"), col("doc_id"), 0.25)
        .select("doc_id").orderBy("doc_id"),
      Some("""SELECT doc_id FROM documents
             |WHERE (doc_id % 2147483648) * 2654435761 % 4294967296 < 1073741824
             |ORDER BY doc_id""".stripMargin)),

    "pipe_curation_quota" -> QueryDef(
      (s, dir) => Curation.quotaSample(
        t(s, dir, "documents"), Seq("lang"), col("doc_id"), quota = 200)
        .select("doc_id").orderBy("doc_id"),
      Some("""WITH h AS (SELECT doc_id, lang,
             |            (doc_id % 2147483648) * 2654435761 % 4294967296 AS hv FROM documents),
             |r AS (SELECT doc_id, row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn FROM h)
             |SELECT doc_id FROM r WHERE rn <= 200 ORDER BY doc_id""".stripMargin)),

    // Cluster-balanced sampling gate (r9): fixed axis centroids make the
    // assignment the closed-form argmax CASE; the per-cluster quota replays
    // as the portable-hash row_number window (the pipe_curation_quota
    // pattern applied to a DERIVED topic key instead of a stored column).
    "pipe_cluster_balanced_sample" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select(col("vec_id"),
          slice(col("embedding").cast("array<double>"), 1, 4).as("v4"))
        Curation.clusterBalancedSample(emb, "v4", col("vec_id"),
          Array(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0),
            Array(0, 0, 1.0, 0), Array(0, 0, 0, 1.0)), quota = 60)
          .select(col("vec_id"), col("cluster").cast("int").as("cluster"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |a AS (SELECT vec_id,
             |  CASE WHEN v[1] >= v[2] AND v[1] >= v[3] AND v[1] >= v[4] THEN 0
             |       WHEN v[2] >= v[3] AND v[2] >= v[4] THEN 1
             |       WHEN v[3] >= v[4] THEN 2 ELSE 3 END AS cluster,
             |  (vec_id % 2147483648) * 2654435761 % 4294967296 AS hv
             |FROM e),
             |r AS (SELECT vec_id, cluster,
             |  row_number() OVER (PARTITION BY cluster ORDER BY hv, vec_id) AS rn FROM a)
             |SELECT vec_id, CAST(cluster AS INT) AS cluster FROM r
             |WHERE rn <= 60 ORDER BY vec_id""".stripMargin)),

    // Declarative curation run: YAML config -> one plan. Every step's
    // semantics is independently oracle-gated elsewhere; this gate pins the
    // COMPOSITION (ordering, text threading through transforms, id survival
    // through dedup + sampling) by replaying the whole recipe in SQL.
    "pipe_curation_pipeline" -> QueryDef(
      (s, dir) => {
        val yaml =
          """- step: normalize
            |- step: filter_length
            |  min_chars: 100
            |- step: filter_regex
            |  pattern: the
            |  mode: keep
            |- step: dedup_exact
            |- step: sample_hash
            |  fraction: 0.5
            |""".stripMargin
        CurationPipeline.fromYaml(t(s, dir, "documents"), yaml)
          .select(col("doc_id"), length(col("text")).cast("long").as("n_norm_chars"))
          .orderBy("doc_id")
      },
      Some("""WITH norm AS (
             |  SELECT doc_id,
             |         trim(regexp_replace(regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g')) AS text
             |  FROM documents),
             |f AS (SELECT doc_id, text FROM norm
             |      WHERE length(text) >= 100 AND regexp_matches(text, 'the')),
             |d AS (SELECT doc_id, text FROM f
             |      QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text))
             |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_norm_chars FROM d
             |WHERE (doc_id % 2147483648) * 2654435761 % 4294967296 < 2147483648
             |ORDER BY doc_id""".stripMargin)),

    // Declarative monitoring recipe (r9): tokenize_wordpiece (count mode,
    // fixed single-letter vocab -> closed-form token counts) followed by
    // drift_check annotating every row with the batch drift verdict against
    // an inline far-off baseline — score >> threshold by construction, so
    // the boolean replay is just the min-sample-size rule (no float
    // aggregates in the output, avoiding cross-engine stddev drift).
    "pipe_curation_pipeline_monitor" -> QueryDef(
      (s, dir) => {
        val vocab = ('a' to 'z').flatMap(c => Seq(c.toString, "##" + c)).toSet
        val json = WordPieceModelJson.render(WordPieceModel(vocab))
        CurationPipeline(t(s, dir, "documents"), Seq(
          Map("step" -> "tokenize_wordpiece", "model_json" -> json,
            "output_col" -> "n_wp"),
          Map("step" -> "drift_check",
            "baseline" -> Map("n_wp" -> Map("mean" -> -100000.0, "std" -> 1.0)),
            "threshold" -> 3.0, "min_sample_size" -> 100)))
          .select(col("doc_id"), col("n_wp"), col("_drift_detected"))
          .orderBy("doc_id")
      },
      Some(raw"""WITH d AS (SELECT doc_id,
                |  list_filter(string_split(lower(coalesce(text,'')),' '), t -> t <> '') AS w
                |FROM documents)
                |SELECT doc_id,
                |  CAST(coalesce(list_sum(list_transform(w, t ->
                |    CASE WHEN length(t) <= 200 AND regexp_matches(t, '^[a-z]+$$')
                |         THEN length(t) ELSE 1 END)), 0) AS INT) AS n_wp,
                |  (SELECT count(*) FROM documents) >= 100 AS _drift_detected
                |FROM d ORDER BY doc_id""".stripMargin)),

    // WordPiece count with a FIXED single-letter vocabulary: a word of pure
    // a-z letters greedily segments into exactly len(word) pieces (no
    // multi-char piece exists to match first), anything else — a digit, an
    // apostrophe, an accented letter, >200 chars — makes the WHOLE word one
    // [UNK] (BERT's rule). Closed-form, so the oracle needs no tokenizer.
    // Greedy multi-char matching is pinned by WordPieceSpec.
    "pipe_wordpiece_count" -> QueryDef(
      (s, dir) => {
        val vocab = ('a' to 'z').flatMap(c => Seq(c.toString, "##" + c)).toSet
        val model = WordPieceModel(vocab)
        t(s, dir, "documents")
          .select(col("doc_id"),
            WordPiece.countColumn(coalesce(col("text"), lit("")), model).as("n_wp"))
          .orderBy("doc_id")
      },
      Some(raw"""WITH d AS (SELECT doc_id,
                |  list_filter(string_split(lower(coalesce(text,'')),' '), t -> t <> '') AS w
                |FROM documents)
                |SELECT doc_id,
                |  CAST(coalesce(list_sum(list_transform(w, t ->
                |    CASE WHEN length(t) <= 200 AND regexp_matches(t, '^[a-z]+$$')
                |         THEN length(t) ELSE 1 END)), 0) AS INT) AS n_wp
                |FROM d ORDER BY doc_id""".stripMargin)),

    // Token-budget sampling: rows in portable-hash order until the cumulative
    // whitespace-token count would exceed the budget. The GLOBAL path runs
    // the distributed prefix sum (range partition + per-partition sums +
    // broadcast offsets); its kept set is partition-independent, so the
    // oracle replays it as one plain window cumsum.
    "pipe_token_budget" -> QueryDef(
      (s, dir) => Curation.sampleToTokenBudget(t(s, dir, "documents"),
        TextAnalysis.tokenCount(col("text")), col("doc_id"), 20000L)
        .select("doc_id").orderBy("doc_id"),
      Some(raw"""WITH d AS (SELECT doc_id,
                |  coalesce(len(regexp_extract_all(text, '\S+')), 0) AS tc,
                |  (doc_id % 2147483648) * 2654435761 % 4294967296 AS h FROM documents),
                |c AS (SELECT doc_id,
                |  sum(tc) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM d)
                |SELECT doc_id FROM c WHERE cum <= 20000 ORDER BY doc_id""".stripMargin)),

    "pipe_token_budget_groups" -> QueryDef(
      (s, dir) => Curation.sampleToTokenBudget(
        t(s, dir, "documents").withColumn("g", col("doc_id") % 3),
        TextAnalysis.tokenCount(col("text")), col("doc_id"), 5000L, Seq("g"))
        .select("doc_id", "g").orderBy("doc_id"),
      Some(raw"""WITH d AS (SELECT doc_id, doc_id % 3 AS g,
                |  coalesce(len(regexp_extract_all(text, '\S+')), 0) AS tc,
                |  (doc_id % 2147483648) * 2654435761 % 4294967296 AS h FROM documents),
                |c AS (SELECT doc_id, g,
                |  sum(tc) OVER (PARTITION BY g ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM d)
                |SELECT doc_id, g FROM c WHERE cum <= 5000 ORDER BY doc_id""".stripMargin)),

    // Declarative pipeline with a HEAVY step: MinHash-LSH dedup (transitive
    // closure, min-id keep) followed by a row-local shard assignment — the
    // catalog's LSH family exercised end-to-end through the YAML-shaped
    // config path. The oracle replays exact Jaccard >= 0.8 + WITH RECURSIVE
    // closure (same prologue the pipe_dedup_clusters gate pins) and the
    // portable shard hash.
    "pipe_curation_pipeline_lsh" -> QueryDef(
      (s, dir) => {
        val steps: Seq[Map[String, Any]] = Seq(
          Map("step" -> "dedup_minhash", "shingle_size" -> 3,
            "num_hashes" -> 128, "bands" -> 32, "threshold" -> 0.8),
          Map("step" -> "shard_assign", "num_shards" -> 8))
        CurationPipeline(plantedNearDups(s, dir), steps)
          .select(col("doc_id"), col("shard"))
          .orderBy("doc_id")
      },
      Some(s"""$nearDupClustersSql
              |SELECT p.doc_id,
              |       (p.doc_id % 2147483648) * 2654435761 % 4294967296 % 8 AS shard
              |FROM planted p
              |WHERE p.doc_id NOT IN (SELECT id FROM cl WHERE id <> cluster)
              |ORDER BY p.doc_id""".stripMargin)),

    // Incremental cross-snapshot dedup: "yesterday's corpus" = every third
    // doc; keep today's docs whose text is not already there. The bloom
    // prefilter routes rows, the confirm anti-join decides — so the result is
    // exactly anti-join semantics and fully SQL-replayable (NULL text never
    // matches, hence survives, both engines).
    "pipe_dedup_incremental" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.dedupAgainstReference(docs, col("text"),
          docs.where(col("doc_id") % 3 === 0), col("text"))
          .select(col("doc_id")).orderBy("doc_id")
      },
      Some("""SELECT d.doc_id FROM documents d
             |ANTI JOIN (SELECT DISTINCT text FROM documents WHERE doc_id % 3 = 0) r
             |ON d.text = r.text
             |ORDER BY d.doc_id""".stripMargin)),

    // Cross-snapshot NEAR-dup: ref = truncated-to-90% rewrites of every 20th
    // doc (ids +100000, built by [[truncatedRef]]); flag today's docs whose
    // shingle-set Jaccard vs some ref doc clears 0.8. Both engines verify
    // with EXACT Jaccard over the same word-3-gram definition, so banding
    // recall (1 - 5e-8 at j=0.8 with 128/32) is the only divergence channel
    // and the planted overlap keeps true pairs far from it.
    "pipe_neardup_incremental" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        Dedup.nearDupPairsAgainstReference(docs, "doc_id", "text",
          truncatedRef(docs), "doc_id", "text",
          shingleSize = 3, numHashes = 128, bands = 32, threshold = 0.8)
          .select("id", "ref_id").orderBy("id", "ref_id")
      },
      Some(s"""$nearDupCrossPairsSql
              |SELECT id, ref_id FROM xp ORDER BY 1, 2""".stripMargin)),

    "pipe_neardup_incremental_drop" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        Dedup.dropNearDupsAgainstReference(docs, "doc_id", "text",
          truncatedRef(docs), "doc_id", "text",
          shingleSize = 3, numHashes = 128, bands = 32, threshold = 0.8)
          .select("doc_id").orderBy("doc_id")
      },
      Some(s"""$nearDupCrossPairsSql
              |SELECT d.doc_id FROM documents d
              |ANTI JOIN (SELECT DISTINCT id FROM xp) f ON d.doc_id = f.id
              |ORDER BY 1""".stripMargin)),

    // Epoch mixing with upsampling: en ×2.5 (two copies + a hash-coin third),
    // de ×0.5, everything else ×1. The fractional draw is the salted portable
    // hash, replayed verbatim in SQL; copies materialize via unnest(range).
    "pipe_epoch_mix" -> QueryDef(
      (s, dir) => Curation.epochMix(
        t(s, dir, "documents"), col("lang"),
        Map("en" -> 2.5, "de" -> 0.5), col("doc_id"))
        .select(col("doc_id"), col("epoch_copy"))
        .orderBy("doc_id", "epoch_copy"),
      Some("""WITH base AS (
             |  SELECT doc_id,
             |         (CASE WHEN lang = 'de' THEN 0 WHEN lang = 'en' THEN 2 ELSE 1 END
             |          + CASE WHEN ((doc_id % 2147483648 + 1000003) % 2147483648) * 2654435761 % 4294967296
             |                      < CASE WHEN lang IN ('de','en') THEN 2147483648 ELSE 0 END
             |                 THEN 1 ELSE 0 END) AS reps
             |  FROM documents)
             |SELECT * FROM (
             |  SELECT doc_id, unnest(range(reps)) AS epoch_copy FROM base)
             |ORDER BY doc_id, epoch_copy""".stripMargin)),

    // Deterministic shard assignment for training export: shard id + salted
    // within-shard order hash, both pure column arithmetic.
    "pipe_shard_assign" -> QueryDef(
      (s, dir) => Curation.shardAssign(
        t(s, dir, "documents"), col("doc_id"), 8)
        .select(col("doc_id"), col("shard"), col("shard_order"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       (doc_id % 2147483648) * 2654435761 % 4294967296 % 8 AS shard,
             |       ((doc_id % 2147483648 + 7368787) % 2147483648) * 2654435761 % 4294967296 AS shard_order
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "pipe_embedding_stats" -> QueryDef(
      (s, dir) => Embeddings.groupStats(
        t(s, dir, "embeddings"), "label", "embedding")
        .orderBy("label"),
      Some("""WITH n AS (SELECT label, embedding,
             |  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
             |FROM embeddings)
             |SELECT label, count(*) AS n_vectors,
             |  CAST(sum(CASE WHEN nrm = 0 OR embedding IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
             |  round(min(nrm), 6) AS min_norm,
             |  round(CAST(sum(CAST(round(nrm, 6) AS DECIMAL(38,6))) AS DOUBLE) / count(nrm), 6) AS avg_norm,
             |  round(max(nrm), 6) AS max_norm
             |FROM n GROUP BY label ORDER BY label""".stripMargin)),

    // Gate emits scalar (label, dim, mean) rows — the driver's pandas-based
    // hasher cannot sort/hash an array<double> column, so the array-valued
    // operator output is exploded back to one row per dimension for the gate.
    "pipe_embedding_centroids" -> QueryDef(
      (s, dir) => Embeddings.groupCentroids(
        t(s, dir, "embeddings"), "label", "embedding")
        .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "mean")))
        .select(col("label"), (col("dim") + 1).cast("long").as("dim"), col("mean"))
        .orderBy("label", "dim"),
      Some("""WITH e AS (SELECT label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS dim
             |           FROM embeddings)
             |SELECT label, CAST(dim AS BIGINT) AS dim,
             |  round(CAST(sum(CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(38,6))) AS DOUBLE) / count(v), 6) AS mean
             |FROM e GROUP BY 1, 2 ORDER BY label, dim""".stripMargin)),

    "pipe_pii_redact" -> QueryDef(
      (s, dir) => {
        val p = t(s, dir, "documents")
          .select(col("doc_id"),
            when(col("doc_id") % 5 === 0,
              concat(col("text"), lit(" contact user"), col("doc_id"), lit("@example.com now")))
              .when(col("doc_id") % 5 === 1, concat(col("text"), lit(" ssn 123-45-6789 ok")))
              .when(col("doc_id") % 5 === 2, concat(col("text"), lit(" from 10.1.2.33 host")))
              .otherwise(col("text")).as("text"))
        p.select(col("doc_id"),
          graft.checks.PiiChecks.redactPii(col("text"),
            Seq("EMAIL_ADDRESS", "IP_ADDRESS", "US_SSN")).as("redacted"))
          .orderBy("doc_id")
      },
      Some(piiRedactOracleSql)), // oracle generated from the same pattern registry

    // REAL decode path: synthetic-but-valid PNG signature + IHDR chunk built
    // in-plan (unhex(lpad(hex(n),8,'0')) = 4-byte big-endian int), parsed by
    // the pure-JVM HeaderDecoder; DuckDB recomputes the planted dimensions
    // arithmetically. Proves the decoder reads actual container bytes.
    "pipe_multimodal_png" -> QueryDef(
      (s, dir) => {
        val w = (col("doc_id") % 100 + 1).cast("int")
        val h = (col("doc_id") % 37 + 1).cast("int")
        val png = concat(
          unhex(lit("89504E470D0A1A0A")), // PNG signature
          unhex(lit("0000000D49484452")), // IHDR length 13 + type
          unhex(lpad(hex(w), 8, "0")), unhex(lpad(hex(h), 8, "0")),
          unhex(lit("0806000000")), // bit depth 8, color type 6 (RGBA)
          unhex(lit("00000000"))) // CRC (not verified by header parse)
        val df = t(s, dir, "documents")
          .select(col("doc_id"),
            Multimodal.asMedia(png, lit("image/png")).as("media"))
        Multimodal.extractFeatures(df, "media", new Multimodal.HeaderDecoder)
          .select(col("doc_id"), col("media_features.ok").as("ok"),
            col("media_features.width").as("width"),
            col("media_features.height").as("height"),
            col("media_features.features")(3).cast("int").as("channels"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, TRUE AS ok,
             |  CAST(doc_id % 100 + 1 AS INT) AS width,
             |  CAST(doc_id % 37 + 1 AS INT) AS height,
             |  4 AS channels
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // REAL audio path: synthetic-but-valid WAV/RIFF container built in-plan
    // (little-endian sizes assembled from unhex'd byte pairs, 16 kHz mono
    // 16-bit => byteRate 32000, blockAlign 2), parsed by the pure-JVM
    // ContainerProbe; DuckDB recomputes the planted duration arithmetically:
    // dataSize = (doc_id%100+1)*320 bytes => duration_ms = dataSize/32,
    // n_frames = dataSize/2. Proves duration_ms/n_frames are live metadata.
    "pipe_multimodal_wav" -> QueryDef(
      (s, dir) => {
        val ds = (col("doc_id") % 100 + 1) * 320
        // 32-bit little-endian for values < 65536: two live bytes + "0000"
        def le32(c: org.apache.spark.sql.Column) = concat(
          unhex(lpad(hex(c % 256), 2, "0")),
          unhex(lpad(hex((c / 256).cast("int")), 2, "0")),
          unhex(lit("0000")))
        val wav = concat(
          unhex(lit("52494646")), le32(ds + 36), // "RIFF" + riff size
          unhex(lit("57415645")), // "WAVE"
          unhex(lit("666D7420")), unhex(lit("10000000")), // "fmt " + len 16
          unhex(lit("0100")), unhex(lit("0100")), // PCM, mono
          unhex(lit("803E0000")), unhex(lit("007D0000")), // 16000 Hz, 32000 B/s
          unhex(lit("0200")), unhex(lit("1000")), // block align 2, 16-bit
          unhex(lit("64617461")), le32(ds), // "data" + size
          encode(repeat(lit("a"), ds.cast("int")), "utf-8")) // payload
        val df = t(s, dir, "documents")
          .select(col("doc_id"), Multimodal.asMedia(wav, lit("audio/wav")).as("media"))
        Multimodal.probeMedia(df, "media")
          .select(col("doc_id"), col("media_info.ok").as("ok"),
            col("media_info.format").as("format"),
            col("media_info.duration_ms").as("duration_ms"),
            col("media_info.n_frames").as("n_frames"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, TRUE AS ok, 'wav' AS format,
             |  CAST((doc_id % 100 + 1) * 10 AS BIGINT) AS duration_ms,
             |  CAST((doc_id % 100 + 1) * 160 AS INT) AS n_frames
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "pipe_multimodal_stub" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "documents")
          .select(col("doc_id"),
            Multimodal.asMedia(encode(col("text"), "utf-8"), lit("text/plain")).as("media"))
        Multimodal.extractFeatures(df, "media", new Multimodal.StubDecoder(16))
          .select(col("doc_id"), col("media_features.ok").as("ok"),
            size(col("media_features.features")).as("n_features"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, TRUE AS ok, 16 AS n_features FROM documents ORDER BY doc_id""".stripMargin)),

    // C4-style page cleaning signals over in-plan-built multi-line text:
    // k=doc_id%6+3 keepable sentences plus planted bad lines (no terminal
    // punctuation / lorem ipsum / code braces / javascript warning) gated by
    // doc_id arithmetic, so DuckDB recomputes every count and flag closed-form.
    "pipe_text_c4" -> QueryDef(
      (s, dir) => {
        val d = col("doc_id")
        val empty = array().cast("array<string>")
        val parts = concat(
          array_repeat(lit("the quick brown fox jumps."), (d % 6 + 3).cast("int")),
          when(d % 2 === 0, array(lit("no punctuation here"))).otherwise(empty),
          when(d % 7 === 0, array(lit("lorem ipsum dolor sit amet."))).otherwise(empty),
          when(d % 5 === 0, array(lit("function() { return 1; }"))).otherwise(empty),
          when(d % 4 === 0, array(lit("please enable javascript to continue."))).otherwise(empty))
        val df = t(s, dir, "documents").select(d, array_join(parts, "\n").as("text"))
        val sig = TextAnalysis.c4Signals(col("text"))
        df.select(d,
          sig.getField("n_lines").as("n_lines"),
          sig.getField("n_kept_lines").as("n_kept_lines"),
          sig.getField("n_sentences").as("n_sentences"),
          sig.getField("has_lorem_ipsum").as("has_lorem_ipsum"),
          sig.getField("has_curly_brace").as("has_curly_brace"),
          sig.getField("has_javascript_line").as("has_javascript_line"),
          TextAnalysis.c4Keep(col("text")).as("keep"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(doc_id % 6 + 3
             |    + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
             |    + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
             |    + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
             |    + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS INT) AS n_lines,
             |  CAST(doc_id % 6 + 3 + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS INT) AS n_kept_lines,
             |  CAST(doc_id % 6 + 3 + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS INT) AS n_sentences,
             |  doc_id % 7 = 0 AS has_lorem_ipsum,
             |  doc_id % 5 = 0 AS has_curly_brace,
             |  doc_id % 4 = 0 AS has_javascript_line,
             |  (doc_id % 6 + 3 + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) >= 5
             |    AND doc_id % 7 <> 0 AND doc_id % 5 <> 0 AS keep
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Gopher-complete quality signals over in-plan-built multi-line text:
    // k=doc_id%4+2 clean prose lines plus planted bullet / ellipsis / symbol
    // lines gated by doc_id arithmetic. Every count is recomputed closed-form
    // in DuckDB from the composition arithmetic (per-line char totals read off
    // the literal line constants, never hand-counted); ratios rounded to 4 dp
    // on both sides (fraction denominators probed: no half-boundary or
    // threshold-equality cases exist in the planted value set).
    "pipe_text_gopher" -> QueryDef(
      (s, dir) => {
        val d = col("doc_id")
        val empty = array().cast("array<string>")
        val parts = concat(
          array_repeat(lit("the fox and dog run with that energy of nine"),
            (d % 4 + 2).cast("int")),
          when(d % 3 === 0, array(lit("- item one"))).otherwise(empty),
          when(d % 5 === 0, array(lit("to be continued..."))).otherwise(empty),
          when(d % 2 === 0, array(lit("# # tag"))).otherwise(empty))
        val df = t(s, dir, "documents").select(d, array_join(parts, "\n").as("text"))
        val sig = TextAnalysis.gopherSignals(col("text"))
        df.select(d,
          sig.getField("n_words").as("n_words"),
          sig.getField("n_alpha_words").as("n_alpha_words"),
          round(sig.getField("alpha_word_frac"), 4).as("alpha_word_frac"),
          round(sig.getField("mean_word_len"), 4).as("mean_word_len"),
          round(sig.getField("symbol_word_ratio"), 4).as("symbol_word_ratio"),
          sig.getField("n_lines").as("n_lines"),
          round(sig.getField("bullet_line_frac"), 4).as("bullet_line_frac"),
          round(sig.getField("ellipsis_line_frac"), 4).as("ellipsis_line_frac"),
          sig.getField("n_required_words").as("n_required_words"),
          TextAnalysis.gopherFilter(col("text"), minWords = 30).as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (
             |  SELECT doc_id, doc_id % 4 + 2 AS k,
             |         CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS b,
             |         CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS e,
             |         CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS h
             |  FROM documents),
             |c AS (
             |  SELECT length(replace('the fox and dog run with that energy of nine',' ','')) AS gc,
             |         length(replace('- item one',' ','')) AS bc,
             |         length(replace('to be continued...',' ','')) AS ec,
             |         length(replace('# # tag',' ','')) AS hc),
             |m AS (
             |  SELECT doc_id,
             |         10*k + 3*b + 3*e + 3*h AS n_words,
             |         10*k + 2*b + 3*e + 1*h AS n_alpha,
             |         e + 2*h AS n_symbols,
             |         k + b + e + h AS n_lines,
             |         b AS n_bullet, e AS n_ell,
             |         5 + 2*e AS n_required,
             |         gc*k + bc*b + ec*e + hc*h AS n_chars
             |  FROM p, c)
             |SELECT doc_id,
             |  CAST(n_words AS INT) AS n_words,
             |  CAST(n_alpha AS INT) AS n_alpha_words,
             |  round(n_alpha * 1.0 / n_words, 4) AS alpha_word_frac,
             |  round(n_chars * 1.0 / n_words, 4) AS mean_word_len,
             |  round(n_symbols * 1.0 / n_words, 4) AS symbol_word_ratio,
             |  CAST(n_lines AS INT) AS n_lines,
             |  round(n_bullet * 1.0 / n_lines, 4) AS bullet_line_frac,
             |  round(n_ell * 1.0 / n_lines, 4) AS ellipsis_line_frac,
             |  CAST(n_required AS INT) AS n_required_words,
             |  (n_words BETWEEN 30 AND 100000)
             |    AND (n_chars * 1.0 / n_words BETWEEN 3.0 AND 10.0)
             |    AND n_symbols * 1.0 / n_words <= 0.1
             |    AND n_bullet * 1.0 / n_lines <= 0.9
             |    AND n_ell * 1.0 / n_lines <= 0.3
             |    AND n_alpha * 1.0 / n_words >= 0.8
             |    AND n_required >= 2 AS keep
             |FROM m ORDER BY doc_id""".stripMargin)),

    // Blocklist token signals over in-plan-built text: doc_id%3 planted
    // 'badword' copies + doc_id%5 uppercase 'SPAM' copies (pinning the
    // case-insensitive match) after a 3-token clean prefix. Counts and the
    // keep decision recomputed closed-form in DuckDB; ratio denominators
    // 3..10 have no half-boundary or threshold-equality cases.
    "pipe_text_blocklist" -> QueryDef(
      (s, dir) => {
        val d = col("doc_id")
        val text = concat_ws(" ",
          lit("good words here"),
          array_join(array_repeat(lit("badword"), (d % 3).cast("int")), " "),
          array_join(array_repeat(lit("SPAM"), (d % 5).cast("int")), " "))
        val df = t(s, dir, "documents").select(d, text.as("text"))
        val list = Seq("badword", "spam")
        val sig = TextAnalysis.blocklistSignals(col("text"), list)
        df.select(d,
          sig.getField("n_blocked").as("n_blocked"),
          round(sig.getField("blocked_ratio"), 4).as("blocked_ratio"),
          TextAnalysis.blocklistFilter(col("text"), list, maxRatio = 0.1).as("keep"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(doc_id % 3 + doc_id % 5 AS INT) AS n_blocked,
             |  round((doc_id % 3 + doc_id % 5) * 1.0 / (3 + doc_id % 3 + doc_id % 5), 4) AS blocked_ratio,
             |  (doc_id % 3 + doc_id % 5) * 1.0 / (3 + doc_id % 3 + doc_id % 5) <= 0.1 AS keep
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // URL signals over in-plan-built URLs (every field derives from doc_id
    // arithmetic, so DuckDB recomputes expectations without parsing URLs):
    // scheme/host variants, a multi-label public suffix (co.uk), www
    // stripping, IPv4-literal hosts with ports, path depth, query params.
    "pipe_url_signals" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "documents").select(col("doc_id"), syntheticUrl.as("url"))
        UrlAnalysis.urlSignals(df, "url")
          .select(col("doc_id"), col("url_scheme"), col("url_host"),
            col("url_registered_domain"),
            col("url_path_depth").cast("int").as("url_path_depth"),
            col("url_n_query_params").cast("int").as("url_n_query_params"),
            col("url_is_ip_host"))
          .orderBy("doc_id")
      },
      // concatenated, not interpolated into a stripMargin literal: the inner
      // SQL's `||` concat lines would lose a pipe to the outer stripMargin
      Some("WITH u AS (" + syntheticUrlOracle + ")\n" +
        "SELECT doc_id, url_scheme, url_host, url_registered_domain,\n" +
        "       url_path_depth, url_n_query_params, url_is_ip_host\n" +
        "FROM u ORDER BY doc_id")),

    // Per-registered-domain counts: one partial-agg shuffle of (domain, n).
    "pipe_url_domain_freq" -> QueryDef(
      (s, dir) => {
        val df = t(s, dir, "documents").select(col("doc_id"), syntheticUrl.as("url"))
        UrlAnalysis.domainFrequency(df, "url")
          .orderBy("registered_domain")
      },
      Some("WITH u AS (" + syntheticUrlOracle + ")\n" +
        "SELECT url_registered_domain AS registered_domain,\n" +
        "       count(*) AS n_docs\n" +
        "FROM u GROUP BY 1 ORDER BY registered_domain")),

    // URL canonicalization: six in-plan variants per doc_id%6 covering www
    // stripping, case folding, default-port drop (http:80 / https:443),
    // non-default port kept, trailing-slash trim, empty path -> '/',
    // fragment drop, tracking-param removal, param sorting, and non-URL
    // passthrough. Expected canonicals are closed-form literals in DuckDB.
    "pipe_url_canonical" -> QueryDef(
      (s, dir) => {
        val d = col("doc_id")
        val variants = array(
          lit("http://www.Example.com:80/path/?utm_source=x&b=2&a=1#frag"),
          lit("https://Example.com:443/path"),
          lit("https://example.com:8443/a/b/"),
          lit("http://sub.example.co.uk"),
          lit("not a url at all"),
          lit("http://example.com/?fbclid=abc"))
        t(s, dir, "documents")
          .select(d, element_at(variants, (d % 6 + 1).cast("int")).as("url"))
          .select(d, UrlAnalysis.canonicalUrl(col("url")).as("canonical_url"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE CAST(doc_id % 6 AS INT)
             |    WHEN 0 THEN 'http://example.com/path?a=1&b=2'
             |    WHEN 1 THEN 'https://example.com/path'
             |    WHEN 2 THEN 'https://example.com:8443/a/b'
             |    WHEN 3 THEN 'http://sub.example.co.uk/'
             |    WHEN 4 THEN 'not a url at all'
             |    WHEN 5 THEN 'http://example.com/'
             |  END AS canonical_url
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Canonical-URL dedup: doc_id pairs (2g, 2g+1) spell the same page two
    // ways (www + trailing slash vs :80, no slash); keep-first-by-doc_id must
    // surface exactly min(doc_id) per pair — the oracle recomputes the group
    // key from the id arithmetic, never from URL parsing.
    "pipe_url_dedup" -> QueryDef(
      (s, dir) => {
        val d = col("doc_id")
        val g = (d / 2).cast("long").cast("string") // floor for non-negative ids
        val url = when(d % 2 === 0,
          concat(lit("http://www.site"), g, lit(".com/p/")))
          .otherwise(concat(lit("http://site"), g, lit(".com:80/p")))
        val df = t(s, dir, "documents").select(d, url.as("url"))
        UrlAnalysis.dedupByCanonicalUrl(df, "url", col("doc_id"))
          .select("doc_id").orderBy("doc_id")
      },
      Some("""SELECT min(doc_id) AS doc_id FROM documents
             |GROUP BY doc_id // 2 ORDER BY doc_id""".stripMargin)),

    // Exact-substring span dedup (Lee et al. 2022 semantics): every 7th doc
    // gets the same 10-word boilerplate suffix planted, so its three fully-
    // planted 8-word windows are corpus-duplicated and must merge into one
    // maximal span covering exactly the planted words. The oracle replays the
    // whole pipeline (window counts -> gaps-and-islands merge) over gram
    // STRINGS, checking the Spark side's 64-bit gram hashing is faithful.
    "pipe_dedup_spans" -> QueryDef(
      (s, dir) => Dedup.duplicateSpans(
        plantedSpans(s, dir), "doc_id", "text", windowWords = 8)
        .orderBy("doc_id", "span_start"),
      Some(plantedSpansOracle +
        """,
          |isl AS (SELECT doc_id, pos,
          |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
          |       THEN 1 ELSE 0 END AS brk FROM dp),
          |isl2 AS (SELECT doc_id, pos,
          |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
          |FROM isl)
          |SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
          |       CAST(max(pos) + 7 AS INT) AS span_end
          |FROM isl2 GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin)),

    // Span REMOVAL: same planted corpus, duplicated spans cut out of the text
    // word-aligned; untouched docs must round-trip byte-identical.
    "pipe_dedup_spans_remove" -> QueryDef(
      (s, dir) => Dedup.removeDuplicateSpans(
        plantedSpans(s, dir), "doc_id", "text", windowWords = 8)
        .select("doc_id", "text")
        .orderBy("doc_id"),
      Some(plantedSpansOracle +
        """,
          |isl AS (SELECT doc_id, pos,
          |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
          |       THEN 1 ELSE 0 END AS brk FROM dp),
          |isl2 AS (SELECT doc_id, pos,
          |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
          |FROM isl),
          |spans AS (SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end
          |          FROM isl2 GROUP BY doc_id, island),
          |toks AS (SELECT doc_id, unnest(w) AS t, generate_subscripts(w, 1) AS i FROM d),
          |keep AS (SELECT tk.doc_id, tk.t, tk.i FROM toks tk
          |         WHERE NOT EXISTS (SELECT 1 FROM spans s WHERE s.doc_id = tk.doc_id
          |                           AND tk.i BETWEEN s.span_start AND s.span_end)),
          |agg AS (SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS text
          |        FROM keep GROUP BY doc_id)
          |-- left join: a fully-duplicated doc (exact corpus dup) keeps every
          |-- position in a span, loses all tokens, and must survive as ''
          |SELECT p.doc_id, coalesce(agg.text, '') AS text
          |FROM p LEFT JOIN agg ON p.doc_id = agg.doc_id ORDER BY p.doc_id""".stripMargin)),

    // Greedy next-fit sequence packing on the n_chars weight: bins are cut by
    // a running-sum threshold inside content-hashed pack groups; the oracle
    // replays the sequential scan with a recursive CTE.
    "pipe_pack_sequences" -> QueryDef(
      (s, dir) => Curation.packSequences(
        t(s, dir, "documents"), "doc_id", col("n_chars"), budget = 2000, numGroups = 8)
        .orderBy("doc_id"),
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id, CAST((doc_id % 2147483648) * 2654435761 % 4294967296 % 8 AS INT) AS g,
             |         n_chars AS w,
             |         row_number() OVER (
             |           PARTITION BY ((doc_id % 2147483648) * 2654435761 % 4294967296 % 8)
             |           ORDER BY doc_id) AS rn
             |  FROM documents),
             |st AS (
             |  SELECT g, rn, doc_id, w, CAST(0 AS BIGINT) AS bin, w AS acc FROM base WHERE rn = 1
             |  UNION ALL
             |  SELECT b.g, b.rn, b.doc_id, b.w,
             |    CASE WHEN s.acc + b.w <= 2000 THEN s.bin ELSE s.bin + 1 END,
             |    CASE WHEN s.acc + b.w <= 2000 THEN s.acc + b.w ELSE b.w END
             |  FROM st s JOIN base b ON b.g = s.g AND b.rn = s.rn + 1)
             |SELECT doc_id, g AS pack_group, bin AS bin_id
             |FROM st ORDER BY doc_id""".stripMargin)),

    // Deterministic domain-mix sampling: per-source keep probabilities via the
    // portable hash, absent sources at the default weight.
    "pipe_sample_weights" -> QueryDef(
      (s, dir) => Curation.sampleByWeights(
        t(s, dir, "documents"), col("source"),
        Map("src0" -> 0.9, "src1" -> 0.5, "src2" -> 0.1),
        col("doc_id"), defaultWeight = 0.7)
        .select("doc_id").orderBy("doc_id"),
      // floor, not CAST: DuckDB rounds double->BIGINT casts, Scala .toLong
      // truncates — the cut points must agree exactly
      Some("""SELECT doc_id FROM documents
             |WHERE (doc_id % 2147483648) * 2654435761 % 4294967296 <
             |  CAST(floor(CASE source WHEN 'src0' THEN CAST(0.9 AS DOUBLE) * 4294967296
             |                         WHEN 'src1' THEN CAST(0.5 AS DOUBLE) * 4294967296
             |                         WHEN 'src2' THEN CAST(0.1 AS DOUBLE) * 4294967296
             |                         ELSE CAST(0.7 AS DOUBLE) * 4294967296 END) AS BIGINT)
             |ORDER BY doc_id""".stripMargin)),

    // BM25 top-k retrieval (Lucene idf variant); per-term contributions are
    // rounded then summed as DECIMAL(38,6) in BOTH engines, so scores and
    // ranks are exactly reproducible.
    "pipe_bm25_topk" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val queries = Seq(
          ("q1", "spark fast query"),
          ("q2", "customer order line table"),
          ("q3", "vector scan batch")).toDF("query_id", "qtext")
        Search.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
          queries, "query_id", "qtext", k = 10)
          .orderBy("query_id", "rank")
      },
      Some("""WITH q(query_id, qtext) AS (VALUES
             |  ('q1','spark fast query'), ('q2','customer order line table'), ('q3','vector scan batch')),
             |dt AS (SELECT doc_id,
             |         len(list_filter(string_split(lower(coalesce(text,'')),' '), t -> t <> '')) AS dl,
             |         unnest(list_filter(string_split(lower(coalesce(text,'')),' '), t -> t <> '')) AS term
             |       FROM documents),
             |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl
             |          FROM (SELECT doc_id, len(list_filter(string_split(lower(coalesce(text,'')),' '), t -> t <> '')) AS dl
             |                FROM documents)),
             |qt AS (SELECT DISTINCT query_id, unnest(list_filter(string_split(lower(qtext),' '), t -> t <> '')) AS term FROM q),
             |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM dt
             |       WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2, 3),
             |df_ AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |sc AS (SELECT qt.query_id, tf.doc_id,
             |         sum(CAST(round(
             |           ln(1 + (s.n_docs - df_.df + 0.5) / (df_.df + 0.5)) *
             |           (tf.tf * (1.2 + 1.0)) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)),
             |           6) AS DECIMAL(38,6))) AS score
             |       FROM tf JOIN qt USING (term) JOIN df_ USING (term) CROSS JOIN stats s
             |       GROUP BY 1, 2),
             |r AS (SELECT query_id, doc_id, score,
             |        row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
             |      FROM sc)
             |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, CAST(score AS DOUBLE) AS score
             |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin))
  ) :+ qualityScoreQuery :+ corpusStatsQuery :+ bpeCountQuery :+ bpeApplyQuery :+
    streamingNearDupQuery :+ lmBigramsQuery :+ lmPerplexityQuery :+
    stripMarkupQuery :+ stratifiedSplitQuery :+ semanticDedupQuery :+
    semanticDedupRemoveQuery :+ pqSemanticDedupQuery :+
    semanticDedupIncrementalQuery :+ semanticDedupIncrementalDropQuery :+
    charEntropyQuery :+ readabilityQuery :+
    tfIdfKeywordsQuery :+ embeddingClustersQuery :+
    dsirTrainQuery :+ dsirScoreQuery :+ dsirResampleQuery) ++
    unigramQueries ++ langIdQueries

  /** TRAIN-path gate for DSIR importance resampling: exact-integer feature
    * counts (no float channel at all) — the DuckDB side re-derives the raw
    * bigram head (count DESC, feature tie-break), the OOV remainder, and the
    * target counts over the same closed vocabulary.
    */
  private def dsirTrainQuery: (String, QueryDef) =
    "pipe_dsir_train" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val m = Dsir.train(docs.where(col("doc_id") % 10 === 0), docs,
          col("text"), features = 20, k = 1.0)
        import s.implicits._
        (m.rawCounts.toSeq.map { case (f, rc) =>
          (f, m.targetCounts.getOrElse(f, 0L), rc)
        } :+ ((Dsir.Oov, m.targetOov, m.rawOov)))
          .sortBy(_._1).toDF("f", "t_cnt", "r_cnt")
      },
      Some("""WITH d AS (SELECT doc_id, list_filter(string_split(lower(coalesce(text,'')),' '), t -> t <> '') AS w FROM documents),
             |pr AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS f
             |       FROM d WHERE len(w) >= 2),
             |rawc AS (SELECT f, count(*) AS c FROM pr GROUP BY 1),
             |head AS (SELECT f, c FROM rawc ORDER BY c DESC, f LIMIT 20),
             |tc AS (SELECT CASE WHEN f IN (SELECT f FROM head) THEN f ELSE '<oov>' END AS f, count(*) AS c
             |       FROM pr WHERE doc_id % 10 = 0 GROUP BY 1)
             |SELECT h.f AS f, CAST(coalesce(tc.c, 0) AS BIGINT) AS t_cnt, CAST(h.c AS BIGINT) AS r_cnt
             |FROM head h LEFT JOIN tc ON h.f = tc.f
             |UNION ALL
             |SELECT '<oov>' AS f,
             |       CAST(coalesce((SELECT c FROM tc WHERE f = '<oov>'), 0) AS BIGINT) AS t_cnt,
             |       CAST((SELECT sum(c) FROM rawc) - (SELECT sum(c) FROM head) AS BIGINT) AS r_cnt
             |ORDER BY 1""".stripMargin))

  /** SCORING-path gate: a FIXED literal model (vocab {'the table','table
    * fast'}, OOV 8/950, totals 40/1000, k=1 → denominators 43/1003) so the
    * oracle's CASE chains replay the kernel exactly; list_sum's sequential
    * order matches the left-to-right accumulation; 4 dp rounding gives
    * ln cross-engine last-ulp headroom.
    */
  private def dsirFixedModel: DsirModel = DsirModel(1.0,
    targetCounts = Map("the table" -> 30L, "table fast" -> 2L),
    rawCounts = Map("the table" -> 10L, "table fast" -> 40L),
    targetTotal = 40L, rawTotal = 1000L, targetOov = 8L, rawOov = 950L)

  private lazy val dsirScoreSql =
    """d AS (SELECT doc_id, list_filter(string_split(lower(coalesce(text,'')),' '), t -> t <> '') AS w FROM documents),
      |p AS (SELECT doc_id, len(w) AS n, CASE WHEN len(w) >= 2 THEN list_sum(list_transform(range(1, len(w)), i ->
      |  ln(((CASE w[i] || ' ' || w[i+1] WHEN 'the table' THEN 30 WHEN 'table fast' THEN 2 ELSE 8 END) + 1.0) / 43.0)
      |- ln(((CASE w[i] || ' ' || w[i+1] WHEN 'the table' THEN 10 WHEN 'table fast' THEN 40 ELSE 950 END) + 1.0) / 1003.0)))
      |  ELSE NULL END AS s FROM d)""".stripMargin

  private def dsirScoreQuery: (String, QueryDef) =
    "pipe_dsir_score" -> QueryDef(
      (s, dir) => Dsir.score(t(s, dir, "documents"), col("text"), dsirFixedModel)
        .select(col("doc_id"), round(col("dsir_log_importance"), 4).as("dsir_log_importance"))
        .orderBy("doc_id"),
      Some(s"""WITH $dsirScoreSql
              |SELECT doc_id, round(s / (n - 1), 4) AS dsir_log_importance
              |FROM p ORDER BY doc_id""".stripMargin))

  /** SELECTION-path gate: Gumbel-max resampling under the same fixed model.
    * The noise is the portable hash replayed verbatim in SQL; the threshold
    * sits mid-gap of the fixture's perturbed-score distribution so ln/exp
    * last-ulp drift cannot flip a row.
    */
  private def dsirResampleQuery: (String, QueryDef) =
    "pipe_dsir_resample" -> QueryDef(
      (s, dir) => {
        val scored = Dsir.score(t(s, dir, "documents"), col("text"), dsirFixedModel)
        Dsir.resample(scored, col("doc_id"), col("dsir_log_importance"),
          threshold = -0.189277106161, temperature = 1.0)
          .select("doc_id").orderBy("doc_id")
      },
      Some(s"""WITH $dsirScoreSql
              |SELECT doc_id FROM p
              |WHERE s / (n - 1)
              |      - ln(-ln((((doc_id % 2147483648) * 2654435761) % 4294967296 + 0.5) / 4294967296.0))
              |      >= -0.189277106161
              |ORDER BY doc_id""".stripMargin))

  /** Oracle gate for the cross-batch streaming near-dup pipeline (VERDICT r6
    * "Next #4" — the one pipeline op that had no CORRECTNESS row). A real
    * multi-batch MemoryStream run: a corpus built IN PLAN from doc_id
    * arithmetic (24 tokens `w<(id*131 + 17*j*j) mod 9973>` per doc — distinct
    * docs share at most isolated tokens, never a 3-token shingle, so
    * inter-doc shingle jaccard is ~0 and MinHash cannot collide) split across
    * two batches, then a third batch of planted EXACT copies (one copy of
    * every %10==1 doc, TWO copies of every %20==7 doc). With
    * `threshold = 1.0`, est == 1.0 iff all 64 MinHash components agree,
    * which on this corpus holds iff the texts are equal — so the expected
    * pair set is the planting arithmetic itself, closed-form in DuckDB. (A
    * first cut streamed the raw documents table: its natural near-dup pairs
    * at jaccard ~0.97 legitimately agree on all 64 components with ~15%
    * probability each — correct operator behavior, but not SQL-replayable.)
    * The pair set spans cross-batch pairs (original in batch 1/2, copy in
    * batch 3) and same-batch pairs (the two %20==7 copies); events arrive
    * once per shared LSH band and the query normalizes to distinct unordered
    * pairs. The driver-side collect is the MemoryStream feeding harness
    * (bounded: the sf verify table), not a distributed-operator pattern.
    */
  private def streamingNearDupQuery: (String, QueryDef) =
    "pipe_streaming_neardup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.streaming.StreamChecks
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val docs = t(s, dir, "documents")
          .select(col("doc_id"),
            concat_ws(" ", transform(sequence(lit(0), lit(23)),
              j => concat(lit("w"), pmod(col("doc_id") * 131 + j * j * 17, lit(9973)))))
              .as("text"))
          .as[(Long, String)].collect()
        val copies1 = docs.filter(_._1 % 10 == 1).map { case (id, tx) => (id + 200000L, tx) }
        val copies2 = docs.filter(_._1 % 20 == 7).map { case (id, tx) => (id + 300000L, tx) }
        val copies3 = docs.filter(_._1 % 20 == 7).map { case (id, tx) => (id + 400000L, tx) }
        val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
        val banded = StreamChecks.bandDocuments(in.toDF().toDF("doc_id", "text"),
          "doc_id", "text", shingleSize = 3, numHashes = 64, bands = 16)
        val events = StreamChecks.nearDupEvents(banded, threshold = 1.0, maxDocsPerBucket = 64)
        val qname = "graft_stream_neardup_sink"
        val q = events.writeStream.format("memory").queryName(qname)
          .outputMode("append").start()
        try {
          in.addData(docs.filter(_._1 % 2 == 0).toIndexedSeq)
          q.processAllAvailable()
          in.addData(docs.filter(_._1 % 2 == 1).toIndexedSeq)
          q.processAllAvailable()
          in.addData((copies1 ++ copies2 ++ copies3).toIndexedSeq)
          q.processAllAvailable()
        } finally q.stop()
        s.table(qname)
          .select(least(col("docId"), col("matchedDocId")).as("id_a"),
            greatest(col("docId"), col("matchedDocId")).as("id_b"))
          .distinct().orderBy("id_a", "id_b")
      },
      Some("""SELECT doc_id AS id_a, doc_id + 200000 AS id_b
             |FROM documents WHERE doc_id % 10 = 1
             |UNION ALL
             |SELECT doc_id, doc_id + 300000 FROM documents WHERE doc_id % 20 = 7
             |UNION ALL
             |SELECT doc_id, doc_id + 400000 FROM documents WHERE doc_id % 20 = 7
             |UNION ALL
             |SELECT doc_id + 300000, doc_id + 400000 FROM documents WHERE doc_id % 20 = 7
             |ORDER BY 1, 2""".stripMargin))

  /** BPE apply with a FIXED MULTI-merge model `[(b,c), (a,b), (x,ab)]`
    * (upgraded from the r6 single-merge gate — VERDICT r6 "Next #3"): the
    * model is *hierarchical* (every composite component comes from a strictly
    * earlier rank), and under that invariant a higher-rank application can
    * only create pairs containing its own fused symbol — never a lower-rank
    * pair — so BPE's interleaved lowest-rank-first loop is provably equal to
    * full replace-all passes in rank order, which DuckDB replays as nested
    * `replace()` with single-char placeholders. The model still DISTINGUISHES
    * rank-priority from positional scheduling: on 'abc', rank order merges
    * (b,c) first → 2 tokens, while leftmost-pair-first would fuse (a,b) then
    * (ab,c)-style chains → different token stream. Counts over the full
    * documents corpus, so every real word exercises the loop.
    */
  // lazy: referenced from query defs invoked during the queries-map val's
  // initialization, which runs before plain vals declared below it
  private lazy val bpeTestModel = BpeModel(Vector(("b", "c"), ("a", "b"), ("x", "ab")))

  /** DuckDB string-space replay of [[bpeTestModel]]: rank-order replace-all
    * with placeholders chr(1)=bc, chr(2)=ab, chr(3)=xab.
    */
  private lazy val bpeReplaySql =
    "replace(replace(replace(t, 'bc', chr(1)), 'ab', chr(2)), 'x' || chr(2), chr(3))"

  private def bpeCountQuery: (String, QueryDef) =
    "pipe_bpe_count" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          Bpe.countColumn(coalesce(col("text"), lit("")), bpeTestModel).as("n_bpe"))
        .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id,
             |  list_filter(string_split(lower(coalesce(text,'')),' '), t -> t <> '') AS w
             |FROM documents)
             |SELECT doc_id,
             |  CAST(coalesce(list_sum(list_transform(w, t -> len($bpeReplaySql))), 0) AS INT) AS n_bpe
             |FROM d ORDER BY doc_id""".stripMargin))

  /** Full ENCODE gate for the multi-merge model: the complete BPE token
    * stream (space-joined) must match, over documents PLUS planted words
    * chosen so every scheduling decision fires — chained merges ('xabd':
    * (a,b) then (x,ab)), rank-over-position ('abc': (b,c) wins over the
    * leftmost (a,b)), repeated fusing ('abab', 'bcbc'), and re-scan cases
    * ('abcabc'). The oracle rebuilds token strings by spacing the replayed
    * placeholder string char-by-char and expanding placeholders back.
    */
  private def bpeApplyQuery: (String, QueryDef) =
    "pipe_bpe_apply" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val planted = Seq(
          (-1L, "abc"), (-2L, "xabd xabc"), (-3L, "ab bc abab aab xab"),
          (-4L, "zabcq cab abx bcbc abcabc")).toDF("doc_id", "text")
        t(s, dir, "documents").select(col("doc_id"), col("text"))
          .unionByName(planted)
          .select(col("doc_id"),
            concat_ws(" ", Bpe.encodeColumn(coalesce(col("text"), lit("")), bpeTestModel))
              .as("bpe_tokens"),
            Bpe.countColumn(coalesce(col("text"), lit("")), bpeTestModel).as("n_bpe"))
          .orderBy("doc_id")
      },
      Some(raw"""WITH src(doc_id, text) AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT * FROM (VALUES
             |    (-1, 'abc'), (-2, 'xabd xabc'), (-3, 'ab bc abab aab xab'),
             |    (-4, 'zabcq cab abx bcbc abcabc'))
             |),
             |d AS (SELECT doc_id,
             |  list_filter(string_split(lower(coalesce(text,'')),' '), t -> t <> '') AS w
             |FROM src),
             |e AS (SELECT doc_id,
             |  list_transform(w, t ->
             |    replace(replace(replace(rtrim(regexp_replace(
             |      $bpeReplaySql,
             |      '(.)', '\1 ', 'g')), chr(1), 'bc'), chr(2), 'ab'), chr(3), 'xab')) AS toks,
             |  list_transform(w, t -> len($bpeReplaySql)) AS lens
             |FROM d)
             |SELECT doc_id, coalesce(array_to_string(toks, ' '), '') AS bpe_tokens,
             |  CAST(coalesce(list_sum(lens), 0) AS INT) AS n_bpe
             |FROM e ORDER BY doc_id""".stripMargin))

  /** Fixed literal unigram model for the gate queries. The piece set makes
    * Viterbi's GLOBAL optimum observably different from greedy longest-match
    * ('abcd': ab+cd at -2.2 beats the greedy prefix abc+d at -5.5) and pins
    * the tie-break ('xy' = x+y = -3.0 resolves to the longer piece).
    */
  private lazy val unigramGateModel = UnigramModel(Map(
    "ab" -> -1.0, "cd" -> -1.2, "abc" -> -2.5, "d" -> -3.0,
    "a" -> -4.0, "b" -> -4.0, "c" -> -4.0,
    "xy" -> -3.0, "x" -> -1.5, "y" -> -1.5), -20.0)

  /** Unigram (SentencePiece) Viterbi encode over five planted word shapes:
    * global-optimum-beats-greedy, whole-piece word, OOV single-char unk
    * fallback, all-singles decomposition, and the exact-tie longer-piece
    * rule. Expected token streams are closed-form literals in DuckDB —
    * no algorithm replay, so a shared bug cannot hide.
    */
  private def unigramQueries: Seq[(String, QueryDef)] = Seq(
    "pipe_unigram_encode" -> QueryDef(
      (s, dir) => {
        val d = col("doc_id")
        val variants = array(lit("abcd"), lit("abc"), lit("abq"), lit("dcba"), lit("xy"))
        t(s, dir, "documents")
          .select(d, concat(lit("abcd "), element_at(variants, (d % 5 + 1).cast("int"))).as("text"))
          .select(d,
            concat_ws(" ", Unigram.encodeColumn(col("text"), unigramGateModel)).as("toks"),
            Unigram.countColumn(col("text"), unigramGateModel).as("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  'ab cd ' || CASE CAST(doc_id % 5 AS INT)
             |    WHEN 0 THEN 'ab cd' WHEN 1 THEN 'abc' WHEN 2 THEN 'ab q'
             |    WHEN 3 THEN 'd c b a' WHEN 4 THEN 'xy' END AS toks,
             |  CAST(2 + CASE CAST(doc_id % 5 AS INT)
             |    WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 2
             |    WHEN 3 THEN 4 WHEN 4 THEN 1 END AS INT) AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "pipe_unigram_count" -> QueryDef(
      (s, dir) => {
        val d = col("doc_id")
        val text = array_join(
          array_repeat(lit("abcd abc abq dcba xy"), (d % 3 + 1).cast("int")), " ")
        t(s, dir, "documents").select(d, text.as("text"))
          .select(d,
            Unigram.countColumn(col("text"), unigramGateModel).as("n_tokens"))
          .orderBy("doc_id")
      },
      // 2+1+2+4+1 = 10 tokens per base repetition
      Some("""SELECT doc_id, CAST((doc_id % 3 + 1) * 10 AS INT) AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)))

  /** TRAIN- and SCORING-path gates for the char-n-gram NB language
    * classifier. Train: two planted label/text shapes; vocabPerLang=2
    * exercises the deterministic (count desc, gram) cap boundary (en keeps
    * aaa/aab, drops abc; de keeps bad/bba, drops bbb) and the priors read
    * off the same aggregated frame as the grams. The oracle recomputes every
    * count from the label arithmetic. Predict: a FIXED literal model; the
    * oracle rewrites the NB arithmetic term-for-term in the kernel's
    * accumulation order (prior first, grams in text order, each logprob as
    * ln(c+1)-ln(denom)); 4 dp rounding absorbs last-ulp libm drift.
    */
  private def langIdQueries: Seq[(String, QueryDef)] = Seq(
    "pipe_langid_train" -> QueryDef(
      (s, dir) => {
        val d = col("doc_id")
        val df = t(s, dir, "documents").select(d,
          when(d % 2 === 0, lit("aaabc")).otherwise(lit("bbbad")).as("text"),
          when(d % 2 === 0, lit("en")).otherwise(lit("de")).as("lang"))
        val m = LangId.train(df, col("text"), col("lang"), n = 3, vocabPerLang = 2)
        import s.implicits._
        val rows = m.docCounts.toSeq.map { case (l, c) => (l, "<docs>", c) } ++
          m.gramCounts.toSeq.flatMap { case (l, gs) =>
            gs.toSeq.map { case (g, c) => (l, g, c) } }
        rows.sortBy(x => (x._1, x._2)).toDF("lang", "gram", "cnt")
      },
      Some("""WITH c AS (SELECT
             |    count(*) FILTER (WHERE doc_id % 2 = 0) AS n_en,
             |    count(*) FILTER (WHERE doc_id % 2 = 1) AS n_de
             |  FROM documents)
             |SELECT * FROM (
             |  SELECT 'en' AS lang, '<docs>' AS gram, n_en AS cnt FROM c
             |  UNION ALL SELECT 'de', '<docs>', n_de FROM c
             |  UNION ALL SELECT 'en', 'aaa', n_en FROM c
             |  UNION ALL SELECT 'en', 'aab', n_en FROM c
             |  UNION ALL SELECT 'de', 'bad', n_de FROM c
             |  UNION ALL SELECT 'de', 'bba', n_de FROM c)
             |ORDER BY lang, gram""".stripMargin)),

    "pipe_langid_predict" -> QueryDef(
      (s, dir) => {
        val m = LangIdModel(3, Map("en" -> 50L, "de" -> 50L),
          Map("en" -> Map("aaa" -> 10L, "aab" -> 5L), "de" -> Map("bbb" -> 10L)))
        val d = col("doc_id")
        val variants = array(lit("aaab"), lit("bbbb"), lit("x"))
        t(s, dir, "documents")
          .select(d, element_at(variants, (d % 3 + 1).cast("int")).as("text"))
          .select(d,
            LangId.predictColumn(col("text"), m).as("lang"),
            round(LangId.scoreColumn(col("text"), m, "en"), 4).as("en_score"))
          .orderBy("doc_id")
      },
      // 'x' has no 3-grams: equal priors tie -> first sorted label ('de').
      // en smoothing denom = ln(total 15 + shared V {aaa,aab,bbb} + 1) = ln(19)
      Some("""SELECT doc_id,
             |  CASE CAST(doc_id % 3 AS INT)
             |    WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'de' END AS lang,
             |  round(CASE CAST(doc_id % 3 AS INT)
             |    WHEN 0 THEN ln(0.5) + (ln(11.0) - ln(19.0)) + (ln(6.0) - ln(19.0))
             |    WHEN 1 THEN ln(0.5) + (0 - ln(19.0)) + (0 - ln(19.0))
             |    ELSE ln(0.5) END, 4) AS en_score
             |FROM documents ORDER BY doc_id""".stripMargin)))

  /** TRAIN-path gate for the bigram LM: vocabSize=20 forces 11 of the
    * corpus's 31 distinct words through the `<unk>` mapping, and all 441
    * mapped pairs exist so maxBigrams=300 exercises the cap's deterministic
    * (count desc, v, w) boundary. The oracle recomputes vocabulary selection,
    * OOV mapping, pair counting, and the cap from scratch in DuckDB.
    */
  private def lmBigramsQuery: (String, QueryDef) =
    "pipe_lm_bigrams" -> QueryDef(
      (s, dir) => {
        val model = NgramLm.train(t(s, dir, "documents"), col("text"),
          vocabSize = 20, maxBigrams = 300)
        import s.implicits._
        model.bigrams.toSeq.map { case (key, c) =>
          // key = v + " " + w; whitespace-split tokens contain no spaces
          val Array(v, w) = key.split(" ", 2)
          (v, w, c)
        }.sortBy(x => (x._1, x._2)).toDF("v", "w", "cnt")
      },
      Some("""WITH d AS (SELECT list_filter(string_split(lower(coalesce(text,'')),' '), t -> t <> '') AS w FROM documents),
             |uni AS (SELECT u AS term, count(*) AS c FROM (SELECT unnest(w) AS u FROM d) GROUP BY 1),
             |voc AS (SELECT term FROM uni ORDER BY c DESC, term LIMIT 20),
             |pr AS (SELECT unnest(list_transform(range(1, len(w)), i -> {'pv': w[i], 'pw': w[i+1]}), recursive := true)
             |       FROM d WHERE len(w) >= 2),
             |m AS (SELECT CASE WHEN pv IN (SELECT term FROM voc) THEN pv ELSE '<unk>' END AS v,
             |             CASE WHEN pw IN (SELECT term FROM voc) THEN pw ELSE '<unk>' END AS w
             |      FROM pr),
             |b AS (SELECT v, w, count(*) AS cnt FROM m GROUP BY 1, 2
             |      ORDER BY cnt DESC, v, w LIMIT 300)
             |SELECT v, w, CAST(cnt AS BIGINT) AS cnt FROM b ORDER BY v, w""".stripMargin))

  /** SCORING-path gate for the bigram LM: a FIXED literal model (so the
    * oracle's CASE chains replay it exactly) with add-0.5 smoothing over a
    * 4-entry vocabulary including `<unk>`. The oracle re-derives
    * exp(-mean ln P(w|v)) with list_sum's sequential order matching the
    * kernel's left-to-right accumulation; rounded to 4 dp (ln/exp last-ulp
    * cross-engine headroom).
    */
  private def lmPerplexityQuery: (String, QueryDef) =
    "pipe_lm_perplexity" -> QueryDef(
      (s, dir) => {
        val model = LmModel(0.5,
          Map("the" -> 100L, "table" -> 40L, "fast" -> 10L, LmModel.Unk -> 850L),
          Map(LmModel.key("the", "table") -> 20L, LmModel.key("table", "fast") -> 5L,
            LmModel.key(LmModel.Unk, "the") -> 60L, LmModel.key("fast", LmModel.Unk) -> 8L))
        NgramLm.score(t(s, dir, "documents"), col("text"), model)
          .select(col("doc_id"), round(col("lm_perplexity"), 4).as("lm_perplexity"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, list_filter(string_split(lower(coalesce(text,'')),' '), t -> t <> '') AS w0 FROM documents),
             |m AS (SELECT doc_id, len(w0) AS n,
             |  list_transform(w0, t -> CASE WHEN t IN ('the','table','fast') THEN t ELSE '<unk>' END) AS w
             |FROM d),
             |p AS (SELECT doc_id, n, CASE WHEN n >= 2 THEN list_sum(list_transform(range(1, n), i ->
             |  ln((CASE
             |        WHEN w[i]='the' AND w[i+1]='table' THEN 20
             |        WHEN w[i]='table' AND w[i+1]='fast' THEN 5
             |        WHEN w[i]='<unk>' AND w[i+1]='the' THEN 60
             |        WHEN w[i]='fast' AND w[i+1]='<unk>' THEN 8
             |        ELSE 0 END + 0.5)
             |     / ((CASE w[i] WHEN 'the' THEN 100 WHEN 'table' THEN 40 WHEN 'fast' THEN 10 ELSE 850 END) + 0.5*4))))
             |  ELSE NULL END AS lp FROM m)
             |SELECT doc_id, round(exp(-lp/(n-1)), 4) AS lm_perplexity
             |FROM p ORDER BY doc_id""".stripMargin))

  /** Markup stripping gate with a CLOSED-FORM oracle: the query wraps each
    * doc's text in a synthetic HTML page (style block, tags, a comment, a
    * script whose body contains a tag, three entities), and the expected
    * output is derivable without replaying the strip algorithm — the corpus
    * text contains no markup characters (verified at fixture build), so
    * clean == text + ' ' + text + ' & more <stuff>'.
    */
  private def stripMarkupQuery: (String, QueryDef) =
    "pipe_text_strip_markup" -> QueryDef(
      (s, dir) => {
        val body = coalesce(col("text"), lit(""))
        val wrapped = concat(
          lit("<html><head><style type=\"text/css\">p { color: red }</style></head><body><h1>"),
          body, lit("</h1>\n<p>"), body,
          lit(" &amp; more &lt;stuff&gt;</p><!-- hidden --><script>var x = \"<p>\";</script></body></html>"))
        t(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.stripMarkup(wrapped).as("clean"))
          .orderBy("doc_id")
      },
      Some(raw"""SELECT doc_id,
             |  trim(regexp_replace(
             |    coalesce(text,'') || ' ' || coalesce(text,'') || ' & more <stuff>',
             |    '\s+', ' ', 'g')) AS clean
             |FROM documents ORDER BY doc_id""".stripMargin))

  /** Stratified-split gate: per-lang ceil(0.2 * n) validation rows chosen by
    * portable-hash order; the oracle replays the hash, the per-stratum
    * row_number, and the quota arithmetic.
    */
  private def stratifiedSplitQuery: (String, QueryDef) =
    "pipe_stratified_split" -> QueryDef(
      (s, dir) => Curation.stratifiedSplit(
        t(s, dir, "documents"), Seq("lang"), col("doc_id"), valFraction = 0.2)
        .select(col("doc_id"), col("split")).orderBy("doc_id"),
      Some("""WITH h AS (SELECT doc_id, lang,
             |            (doc_id % 2147483648) * 2654435761 % 4294967296 AS hv FROM documents),
             |r AS (SELECT doc_id,
             |        row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn,
             |        count(*) OVER (PARTITION BY lang) AS n
             |      FROM h)
             |SELECT doc_id, CASE WHEN rn <= ceil(round(n * 0.2, 9)) THEN 'val' ELSE 'train' END AS split
             |FROM r ORDER BY doc_id""".stripMargin))

  /** SemDeDup gate: FIXED literal centroids (the 4-dim identity — already
    * unit-normalized) over the 4-dim embedding prefix, so the oracle replays
    * the argmax-dot assignment (ties to the lowest index, matching the
    * kernel's sort) with plain comparisons, and the within-cluster pair scan
    * + exact cosine verify with list_cosine_similarity. Threshold 0.9965 sits
    * mid-gap in the fixture's cosine distribution (nearest pair 3.4e-4 away),
    * so cross-engine dot-product summation order cannot flip a pair.
    */
  private def semanticDedupQuery: (String, QueryDef) =
    "pipe_semantic_dedup" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select(col("vec_id"),
          slice(col("embedding").cast("array<double>"), 1, 4).as("v4"))
        Dedup.semanticDupPairs(emb, "vec_id", "v4",
          Array(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0),
            Array(0, 0, 1.0, 0), Array(0, 0, 0, 1.0)),
          threshold = 0.9965)
          .select(col("id_a"), col("id_b"), col("cluster").cast("int").as("cluster"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |a AS (SELECT vec_id, v,
             |  CASE WHEN v[1] >= v[2] AND v[1] >= v[3] AND v[1] >= v[4] THEN 0
             |       WHEN v[2] >= v[3] AND v[2] >= v[4] THEN 1
             |       WHEN v[3] >= v[4] THEN 2 ELSE 3 END AS cluster
             |FROM e)
             |SELECT x.vec_id AS id_a, y.vec_id AS id_b, CAST(x.cluster AS INT) AS cluster
             |FROM a x JOIN a y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
             |WHERE list_cosine_similarity(x.v, y.v) >= 0.9965
             |ORDER BY 1, 2""".stripMargin))

  /** Incremental SEMANTIC dedup gates (r10): today's corpus (all embeddings)
    * vs yesterday's index (vec_id % 3 = 0). Same fixed identity centroids and
    * probed mid-gap threshold as pipe_semantic_dedup — the cross-side pair
    * cosines are a SUBSET of the in-corpus pair set (ref rows are corpus
    * rows) plus exact-1.0 self pairs, so the 0.9965 boundary clearance holds.
    */
  private def semanticDedupIncrementalQuery: (String, QueryDef) =
    "pipe_semantic_dedup_incremental" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select(col("vec_id"),
          slice(col("embedding").cast("array<double>"), 1, 4).as("v4"))
        val ref = emb.where(col("vec_id") % 3 === 0)
          .select(col("vec_id").as("rid"), col("v4").as("rv"))
        Dedup.semanticDupPairsAgainstReference(emb, "vec_id", "v4",
          ref, "rid", "rv",
          Array(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0),
            Array(0, 0, 1.0, 0), Array(0, 0, 0, 1.0)),
          threshold = 0.9965)
          .select(col("id"), col("ref_id"), col("cell").cast("int").as("cell"))
          .orderBy("id", "ref_id")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |a AS (SELECT vec_id, v,
             |  CASE WHEN v[1] >= v[2] AND v[1] >= v[3] AND v[1] >= v[4] THEN 0
             |       WHEN v[2] >= v[3] AND v[2] >= v[4] THEN 1
             |       WHEN v[3] >= v[4] THEN 2 ELSE 3 END AS cell
             |FROM e)
             |SELECT x.vec_id AS id, r.vec_id AS ref_id, CAST(x.cell AS INT) AS cell
             |FROM a x JOIN a r ON x.cell = r.cell AND r.vec_id % 3 = 0
             |WHERE list_cosine_similarity(x.v, r.v) >= 0.9965
             |ORDER BY 1, 2""".stripMargin))

  /** Removal-policy gate: kept = corpus rows with no over-threshold ref
    * neighbor (ref members always drop — they pair with themselves at 1.0).
    */
  private def semanticDedupIncrementalDropQuery: (String, QueryDef) =
    "pipe_semantic_dedup_incremental_drop" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select(col("vec_id"),
          slice(col("embedding").cast("array<double>"), 1, 4).as("v4"))
        val ref = emb.where(col("vec_id") % 3 === 0)
          .select(col("vec_id").as("rid"), col("v4").as("rv"))
        Dedup.dropSemanticDupsAgainstReference(emb, "vec_id", "v4",
          ref, "rid", "rv",
          Array(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0),
            Array(0, 0, 1.0, 0), Array(0, 0, 0, 1.0)),
          threshold = 0.9965)
          .select("vec_id").orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |a AS (SELECT vec_id, v,
             |  CASE WHEN v[1] >= v[2] AND v[1] >= v[3] AND v[1] >= v[4] THEN 0
             |       WHEN v[2] >= v[3] AND v[2] >= v[4] THEN 1
             |       WHEN v[3] >= v[4] THEN 2 ELSE 3 END AS cell
             |FROM e),
             |drop AS (SELECT DISTINCT x.vec_id AS id
             |  FROM a x JOIN a r ON x.cell = r.cell AND r.vec_id % 3 = 0
             |  WHERE list_cosine_similarity(x.v, r.v) >= 0.9965)
             |SELECT vec_id FROM e WHERE vec_id NOT IN (SELECT id FROM drop)
             |ORDER BY vec_id""".stripMargin))

  /** PQ-SDC semantic dedup gate (r9): the full pipeline — normalize the
    * 4-dim slice in-plan (so the SDC approximate cosine is the INTEGER
    * shared-code count, no float boundary), fixed literal codebooks (the
    * pipe_knn_pq closed forms), code-only candidate join, integer
    * prefilter (margin 0: keep >= 1 shared block code), exact-cosine
    * verify at the probed mid-gap 0.9965 — replayed step for step in SQL.
    * Probed on both SFs: no true pair has 0 shared codes, so the prefilter
    * is lossless here and the output equals the plain semantic pair set.
    */
  private def pqSemanticDedupQuery: (String, QueryDef) =
    "pipe_semantic_dedup_pq" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.GraftColumnBridge
        val model = Pq.PqModel(2, Array(
          Array(Array(1.0, 0.0), Array(0.0, 1.0)),
          Array(Array(1.0, 0.0), Array(0.0, 1.0))))
        val emb = t(s, dir, "embeddings").select(col("vec_id"),
          slice(col("embedding").cast("array<double>"), 1, 4).as("v0"))
        val normed = emb
          .withColumn("__n", GraftColumnBridge.column(VectorNorm(
            GraftColumnBridge.expression(col("v0")))))
          .where(col("__n") > 0)
          .select(col("vec_id"), transform(col("v0"), x => x / col("__n")).as("v4"))
        Dedup.pqSemanticDupPairs(normed, "vec_id", "v4",
          Array(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0),
            Array(0, 0, 1.0, 0), Array(0, 0, 0, 1.0)),
          model, threshold = 0.9965, margin = 0.0)
          .select(col("id_a"), col("id_b"), col("cluster").cast("int").as("cluster"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH e0 AS (SELECT vec_id, list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)) AS v0 FROM embeddings),
             |e AS (SELECT vec_id, v0, sqrt(v0[1]*v0[1]+v0[2]*v0[2]+v0[3]*v0[3]+v0[4]*v0[4]) AS nrm FROM e0),
             |n AS (SELECT vec_id, list_transform(v0, x -> x/nrm) AS v FROM e WHERE nrm > 0),
             |a AS (SELECT vec_id, v,
             |  CASE WHEN v[1] >= v[2] AND v[1] >= v[3] AND v[1] >= v[4] THEN 0
             |       WHEN v[2] >= v[3] AND v[2] >= v[4] THEN 1
             |       WHEN v[3] >= v[4] THEN 2 ELSE 3 END AS cluster,
             |  CASE WHEN (v[1]-1)*(v[1]-1)+v[2]*v[2] <= v[1]*v[1]+(v[2]-1)*(v[2]-1) THEN 0 ELSE 1 END AS c0,
             |  CASE WHEN (v[3]-1)*(v[3]-1)+v[4]*v[4] <= v[3]*v[3]+(v[4]-1)*(v[4]-1) THEN 0 ELSE 1 END AS c1
             |FROM n)
             |SELECT x.vec_id AS id_a, y.vec_id AS id_b, CAST(x.cluster AS INT) AS cluster
             |FROM a x JOIN a y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
             |WHERE ((x.c0 = y.c0)::INT + (x.c1 = y.c1)::INT) >= 0.9965
             |  AND list_cosine_similarity(x.v, y.v) >= 0.9965
             |ORDER BY 1, 2""".stripMargin))

  /** Removal-policy gate for [[Dedup.dedupSemantic]]: keep = ids never
    * appearing as the higher id of an over-threshold pair; the oracle derives
    * the same keep set from its own recomputed pair relation.
    */
  private def semanticDedupRemoveQuery: (String, QueryDef) =
    "pipe_semantic_dedup_remove" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select(col("vec_id"),
          slice(col("embedding").cast("array<double>"), 1, 4).as("v4"))
        Dedup.dedupSemantic(emb, "vec_id", "v4",
          Array(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0),
            Array(0, 0, 1.0, 0), Array(0, 0, 0, 1.0)),
          threshold = 0.9965)
          .select("vec_id").orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |a AS (SELECT vec_id, v,
             |  CASE WHEN v[1] >= v[2] AND v[1] >= v[3] AND v[1] >= v[4] THEN 0
             |       WHEN v[2] >= v[3] AND v[2] >= v[4] THEN 1
             |       WHEN v[3] >= v[4] THEN 2 ELSE 3 END AS cluster
             |FROM e),
             |drop AS (SELECT DISTINCT y.vec_id AS id
             |  FROM a x JOIN a y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
             |  WHERE list_cosine_similarity(x.v, y.v) >= 0.9965)
             |SELECT vec_id FROM e WHERE vec_id NOT IN (SELECT id FROM drop)
             |ORDER BY vec_id""".stripMargin))

  /** Cluster-assignment gate: same fixed identity centroids and argmax-dot
    * replay as the SemDeDup gates, but over the full assignment output (plus
    * a per-cluster size rollup exercising the downstream groupBy).
    */
  private def embeddingClustersQuery: (String, QueryDef) =
    "pipe_embedding_clusters" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select(col("vec_id"),
          slice(col("embedding").cast("array<double>"), 1, 4).as("v4"))
        Embeddings.assignClusters(emb, "v4",
          Array(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0),
            Array(0, 0, 1.0, 0), Array(0, 0, 0, 1.0)))
          .select(col("vec_id"), col("cluster").cast("int").as("cluster"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
             |SELECT vec_id,
             |  CAST(CASE WHEN v[1] >= v[2] AND v[1] >= v[3] AND v[1] >= v[4] THEN 0
             |       WHEN v[2] >= v[3] AND v[2] >= v[4] THEN 1
             |       WHEN v[3] >= v[4] THEN 2 ELSE 3 END AS INT) AS cluster
             |FROM e ORDER BY vec_id""".stripMargin))

  /** Readability gate: every count and both ratio formulas recomputed in
    * DuckDB from the same three regex passes.
    */
  private def readabilityQuery: (String, QueryDef) =
    "pipe_text_readability" -> QueryDef(
      (s, dir) => {
        val sig = TextAnalysis.readabilitySignals(col("text"))
        t(s, dir, "documents").select(col("doc_id"),
          sig.getField("n_words").as("n_words"),
          sig.getField("n_sentences").as("n_sentences"),
          sig.getField("n_syllables").as("n_syllables"),
          sig.getField("fk_grade").as("fk_grade"),
          sig.getField("flesch_ease").as("flesch_ease"))
          .orderBy("doc_id")
      },
      Some(raw"""WITH d AS (SELECT doc_id,
             |  len(regexp_extract_all(coalesce(text,''), '\S+')) AS n_words,
             |  greatest(len(regexp_extract_all(coalesce(text,''), '[.!?]+')), 1) AS n_sentences,
             |  len(regexp_extract_all(lower(coalesce(text,'')), '[aeiouy]+')) AS n_syllables
             |FROM documents)
             |SELECT doc_id, n_words, n_sentences, n_syllables,
             |  round(0.39 * (n_words * 1.0 / n_sentences)
             |    + 11.8 * (n_syllables * 1.0 / greatest(n_words, 1)) - 15.59, 4) AS fk_grade,
             |  round(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
             |    - 84.6 * (n_syllables * 1.0 / greatest(n_words, 1)), 4) AS flesch_ease
             |FROM d ORDER BY doc_id""".stripMargin))

  /** TF-IDF keyword gate: tf, df, N, the ln-scored ranking, and the
    * deterministic (score desc, term) tie-break all recomputed in DuckDB.
    * A fixture probe confirmed no cross-engine near-collisions (distinct
    * (tf, df) pairs never score within 1e-9 relative), so 1-ulp ln drift
    * cannot flip a rank; exact ties fall to the term tie-break on both
    * sides. Scores excluded from the output (ranks carry the signal).
    */
  private def tfIdfKeywordsQuery: (String, QueryDef) =
    "pipe_tfidf_keywords" -> QueryDef(
      (s, dir) => TextAnalysis.tfIdfKeywords(
        t(s, dir, "documents"), "doc_id", col("text"), k = 3)
        .orderBy("doc_id", "rank"),
      Some("""WITH d AS (SELECT doc_id, list_filter(string_split(lower(coalesce(text,'')),' '), t -> t <> '') AS w FROM documents),
             |tf AS (SELECT doc_id, u AS term, count(*) AS tf
             |       FROM (SELECT doc_id, unnest(w) AS u FROM d) GROUP BY 1, 2),
             |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(*) AS nd FROM documents),
             |s AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
             |        tf.tf * ln((SELECT nd FROM n) * 1.0 / dfq.df) AS score
             |      FROM tf JOIN dfq USING (term)),
             |r AS (SELECT doc_id, term, tf, df,
             |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
             |      FROM s)
             |SELECT doc_id, CAST(rank AS INT) AS rank, term,
             |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
             |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin))

  /** Character-entropy gate: the oracle recomputes -Σ p ln p per doc with the
    * counts listed in character order (DuckDB's binary collation = code-point
    * order for valid UTF-8, matching the kernel's sorted accumulation);
    * sequential negated addition is bit-identical to the kernel's sequential
    * subtraction. Empty docs come back via the left join at exactly 0.0.
    */
  private def charEntropyQuery: (String, QueryDef) =
    "pipe_text_entropy" -> QueryDef(
      (s, dir) => t(s, dir, "documents").select(col("doc_id"),
        round(TextAnalysis.charEntropy(coalesce(col("text"), lit(""))), 6)
          .as("char_entropy"))
        .orderBy("doc_id"),
      Some("""WITH c AS (SELECT doc_id, string_split(coalesce(text,''), '') AS ch FROM documents),
             |g AS (SELECT doc_id, u AS c, count(*) AS cnt
             |      FROM (SELECT doc_id, unnest(ch) AS u FROM c) GROUP BY 1, 2),
             |l AS (SELECT doc_id, list(cnt ORDER BY c) AS cnts, sum(cnt) AS n FROM g GROUP BY 1)
             |SELECT d.doc_id,
             |  round(coalesce(-list_sum(list_transform(l.cnts, x -> (x/l.n) * ln(x/l.n))), 0.0), 6) AS char_entropy
             |FROM documents d LEFT JOIN l ON d.doc_id = l.doc_id
             |ORDER BY d.doc_id""".stripMargin))

  /** One-row corpus summary; exact percentiles (Spark `percentile` and DuckDB
    * `quantile_cont` both interpolate, type-7).
    */
  private def corpusStatsQuery: (String, QueryDef) =
    "pipe_corpus_stats" -> QueryDef(
      (s, dir) => TextAnalysis.corpusStats(t(s, dir, "documents"), col("text")),
      Some("""WITH d AS (SELECT text,
             |  len(list_filter(string_split(lower(coalesce(text,'')),' '), t -> t <> '')) AS nt,
             |  (text IS NULL OR len(text) = 0) AS empty
             |FROM documents)
             |SELECT count(*) AS n_docs,
             |  CAST(sum(nt) AS BIGINT) AS total_tokens, -- DuckDB sums to HUGEINT
             |  round(avg(nt), 4) AS avg_tokens,
             |  quantile_cont(nt, 0.5) AS p50_tokens,
             |  round(quantile_cont(nt, 0.95), 4) AS p95_tokens,
             |  CAST(sum(CASE WHEN empty THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
             |  count(DISTINCT text) AS n_distinct_texts
             |FROM d""".stripMargin))

  /** Gate entry appended via concatenation below (kept out of the main map
    * literal to hold the diff local): fastText-style dictionary scoring with a
    * FIXED literal model — the oracle replays sigmoid(bias + Σw/n) with
    * list_sum's sequential order matching the kernel's left-to-right sum.
    */
  private def qualityScoreQuery: (String, QueryDef) =
    "pipe_quality_score" -> QueryDef(
      (s, dir) => {
        val model = QualityModel(-0.1,
          Map("spark" -> 2.0, "fast" -> 1.0, "slow" -> -1.5, "the" -> -0.2))
        QualityClassifier.score(t(s, dir, "documents"), col("text"), model)
          .select(col("doc_id"), round(col("quality_score"), 6).as("quality_score"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id,
             |  list_filter(string_split(lower(coalesce(text,'')),' '), t -> t <> '') AS w
             |FROM documents)
             |SELECT doc_id,
             |  round(1.0/(1.0+exp(-(-0.1 + coalesce(list_sum(list_transform(w,
             |    t -> CASE t WHEN 'spark' THEN CAST(2.0 AS DOUBLE)
             |                WHEN 'fast' THEN CAST(1.0 AS DOUBLE)
             |                WHEN 'slow' THEN CAST(-1.5 AS DOUBLE)
             |                WHEN 'the' THEN CAST(-0.2 AS DOUBLE)
             |                ELSE CAST(0.0 AS DOUBLE) END)), 0)
             |    / greatest(len(w), 1)))), 6) AS quality_score
             |FROM d ORDER BY doc_id""".stripMargin))

  /** documents + the same 10-word boilerplate suffix planted on every 7th doc
    * — the fixture for the exact-substring span gates. The planted words are
    * outside the corpus vocabulary, so the only corpus-duplicated 8-grams are
    * the fully-planted windows.
    */
  private def plantedSpans(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" " + PlantedBoilerplate)))
        .otherwise(col("text")).as("text"))

  // `final val` with a literal initializer: constant-folded at COMPILE time,
  // so interpolating it from the `all` map during object init is safe (a
  // plain val defined below the map would still be null at that point — the
  // same init-order trap syntheticUrlOracle documents)
  private final val PlantedBoilerplate =
    "please subscribe to our newsletter for updates and offers today"

  /** Shared oracle prefix: planted corpus -> positional 8-gram windows ->
    * corpus-duplicated window positions (grams compared as strings).
    */
  private def plantedSpansOracle: String =
    s"""WITH p AS (SELECT doc_id,
       |  CASE WHEN doc_id % 7 = 0 THEN text || ' $PlantedBoilerplate' ELSE text END AS text
       |FROM documents),
       |d AS (SELECT doc_id, string_split(text, ' ') AS w FROM p),
       |g AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 6),
       |        i -> {'pos': i, 'gram': array_to_string(w[i:i+7], ' ')}), recursive := true)
       |      FROM d WHERE len(w) >= 8),
       |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup))""".stripMargin

  /** Deterministic synthetic URL built in-plan: doc_id % 11 == 0 rows get an
    * IPv4-literal host with a port; the rest get `http(s)://[www.]site{k}.{tld}`
    * with 0-3 path segments and 0-2 query params. Paired with
    * [[syntheticUrlOracle]], which derives every expected signal from the
    * same doc_id arithmetic.
    */
  private def syntheticUrl: org.apache.spark.sql.Column = {
    val d = col("doc_id")
    val tld = element_at(
      array(lit("com"), lit("org"), lit("co.uk"), lit("net"), lit("io")),
      (d % 5 + 1).cast("int"))
    val ipUrl = concat(lit("http://192.168.1."), ((d % 250) + 1).cast("string"),
      lit(":8080/x?y=1"))
    val siteUrl = concat(
      lit("http"), when(d % 2 === 0, lit("s")).otherwise(lit("")), lit("://"),
      when(d % 4 === 0, lit("www.")).otherwise(lit("")),
      lit("site"), (d % 37).cast("string"), lit("."), tld,
      call_function("repeat", lit("/p"), (d % 4).cast("int")),
      when(d % 3 === 1, lit("?a=1"))
        .when(d % 3 === 2, lit("?a=1&b=2")).otherwise(lit("")))
    when(d % 11 === 0, ipUrl).otherwise(siteUrl)
  }

  /** DuckDB replica of [[syntheticUrl]]'s expected signals. (A `def`, not a
    * `val`: the `all` map interpolates this during object init, and a val
    * defined below the map would still be null at that point.)
    */
  private def syntheticUrlOracle: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 11 = 0 THEN 'http'
      |       WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END AS url_scheme,
      |  CASE WHEN doc_id % 11 = 0 THEN '192.168.1.' || CAST(doc_id % 250 + 1 AS VARCHAR)
      |       ELSE (CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END)
      |            || 'site' || CAST(doc_id % 37 AS VARCHAR) || '.'
      |            || (['com','org','co.uk','net','io'])[(doc_id % 5 + 1)] END AS url_host,
      |  CASE WHEN doc_id % 11 = 0 THEN '192.168.1.' || CAST(doc_id % 250 + 1 AS VARCHAR)
      |       ELSE 'site' || CAST(doc_id % 37 AS VARCHAR) || '.'
      |            || (['com','org','co.uk','net','io'])[(doc_id % 5 + 1)] END AS url_registered_domain,
      |  CAST(CASE WHEN doc_id % 11 = 0 THEN 1 ELSE doc_id % 4 END AS INT) AS url_path_depth,
      |  CAST(CASE WHEN doc_id % 11 = 0 THEN 1
      |            WHEN doc_id % 3 = 1 THEN 1
      |            WHEN doc_id % 3 = 2 THEN 2 ELSE 0 END AS INT) AS url_n_query_params,
      |  doc_id % 11 = 0 AS url_is_ip_host
      |FROM documents""".stripMargin
}
