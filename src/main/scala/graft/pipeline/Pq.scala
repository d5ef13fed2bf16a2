package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization for embedding columns — the memory-compression scale
  * path of the ANN family (Jégou, Douze, Schmid: "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011). A D-dim vector becomes `numBlocks`
  * one-byte centroid ids (e.g. 768 floats -> 96 bytes, 32x), so a 100 TB
  * embedding corpus's codes fit a fraction of the nodes; queries score
  * against codes via asymmetric distance (ADC): per-block lookup tables of
  * query-to-centroid dot products, summed by code — a handful of array reads
  * per row instead of a full float dot product.
  *
  * Shapes: training is driver-side Lloyd per block on a CAPPED sample (the
  * IsolationForest/IVF convention — the model is kilobytes and broadcasts
  * inside a codegen'd expression); encode is a row-local projection; top-k
  * is scan + per-query window, or compose with IVF cells for sublinear scan.
  */
object Pq {

  /** codebooks(block)(centroid)(dim); blockDim * numBlocks = vector dim. */
  final case class PqModel(blockDim: Int, codebooks: Array[Array[Array[Double]]])
      extends Serializable {
    def numBlocks: Int = codebooks.length
    def codebookSize: Int = codebooks.head.length
  }

  /** Train per-block codebooks on a driver-side sample. `codebookSize` <= 256
    * so codes pack into one byte per block. Deterministic for a fixed seed.
    */
  def train(df: DataFrame, vecCol: String, numBlocks: Int,
            codebookSize: Int = 256, trainRows: Int = 10000,
            iterations: Int = 10, seed: Long = 42L): PqModel = {
    require(numBlocks > 0, "numBlocks must be positive")
    require(codebookSize > 0 && codebookSize <= 256,
      "codebookSize must be in [1, 256] (codes are one byte per block)")
    val sample = df.select(col(vecCol).cast("array<double>"))
      .where(col(vecCol).isNotNull).limit(trainRows)
      .collect().map(_.getSeq[Double](0).toArray)
    trainFromSample(sample, numBlocks, codebookSize, iterations, seed)
  }

  /** Codebook training from an already-collected sample — shared by
    * [[train]] and [[ivfPqTopK]] (which trains the coarse quantizer and the
    * codebooks from ONE driver sample instead of scanning twice).
    */
  private[pipeline] def trainFromSample(sample: Array[Array[Double]], numBlocks: Int,
                                        codebookSize: Int, iterations: Int,
                                        seed: Long): PqModel = {
    require(sample.nonEmpty, "no rows to train the PQ codebooks")
    val dim = sample.head.length
    require(dim % numBlocks == 0, s"vector dim $dim not divisible by numBlocks $numBlocks")
    val bd = dim / numBlocks
    val codebooks = Array.tabulate(numBlocks) { b =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, b * bd, (b + 1) * bd))
      lloyd(sub, codebookSize, iterations, seed + b)
    }
    PqModel(bd, codebooks)
  }

  /** Plain-L2 Lloyd (PQ quantizes raw subvectors; spherical normalization
    * would distort per-block distances). Deterministic: seeded init, ties to
    * the lowest centroid index, empty cells keep their previous centroid.
    */
  private def lloyd(data: Array[Array[Double]], k: Int, iterations: Int,
                    seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val kk = math.min(k, data.length)
    var centroids = rnd.shuffle(data.indices.toVector).take(kk)
      .map(i => data(i).clone()).toArray
    for (_ <- 0 until iterations) {
      val sums = Array.fill(kk)(new Array[Double](data.head.length))
      val counts = new Array[Int](kk)
      data.foreach { v =>
        val c = nearest(centroids, v)
        counts(c) += 1
        var d = 0
        while (d < v.length) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  private def nearest(centroids: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d = 0.0
      var i = 0
      val cent = centroids(c)
      while (i < v.length) { val x = v(i) - cent(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c } // strict: ties keep lowest index
      c += 1
    }
    best
  }

  /** Per-block centroid codes for a vector column (`array<int>`, one entry
    * per block — int for SQL replayability; pack to binary at the storage
    * layer if desired). Row-local, codegen'd. NULL for null/mis-sized input.
    */
  def encodeColumn(vec: Column, model: PqModel): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PqEncode(
      GraftColumnBridge.expression(vec.cast("array<double>")), model))
  }

  /** Per-block lookup table of query-subvector x centroid dot products —
    * the ADC table every scoring path shares.
    */
  private def buildLut(query: Array[Double], model: PqModel): Array[Array[Double]] =
    Array.tabulate(model.numBlocks) { b =>
      model.codebooks(b).map { cent =>
        var s = 0.0
        var d = 0
        while (d < cent.length) { s += cent(d) * query(b * model.blockDim + d); d += 1 }
        s
      }
    }

  private def buildLuts(queries: Seq[(Long, Array[Double])],
                        model: PqModel): Array[Array[Array[Double]]] = {
    val dim = model.blockDim * model.numBlocks
    queries.foreach { case (_, qv) =>
      require(qv.length == dim, s"query dim ${qv.length} != model dim $dim") }
    queries.map { case (_, qv) => buildLut(qv, model) }.toArray
  }

  /** ADC inner-product score of a FIXED query against a codes column: build
    * the per-block lookup table of query-subvector x centroid dot products
    * once on the driver, then each row sums `numBlocks` table reads.
    */
  def adcDotColumn(codes: Column, query: Array[Double], model: PqModel): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    require(query.length == model.blockDim * model.numBlocks,
      s"query dim ${query.length} != model dim ${model.blockDim * model.numBlocks}")
    GraftColumnBridge.column(PqAdcDot(GraftColumnBridge.expression(codes),
      buildLut(query, model)))
  }

  /** Per-block code-code dot tables for symmetric (code vs code) scoring:
    * `tables(b)(i)(j)` = dot(codebook(b)(i), codebook(b)(j)). Size is
    * numBlocks x k^2 doubles (16 blocks x 256^2 = 8 MB at the default k,
    * kilobytes at dedup-sized codebooks) — broadcast once inside the
    * expression.
    */
  def sdcTables(model: PqModel): Array[Array[Array[Double]]] =
    Array.tabulate(model.numBlocks) { b =>
      val cb = model.codebooks(b)
      Array.tabulate(cb.length) { i =>
        Array.tabulate(cb.length) { j =>
          var s = 0.0
          var d = 0
          while (d < cb(i).length) { s += cb(i)(d) * cb(j)(d); d += 1 }
          s
        }
      }
    }

  /** SDC approximate dot of two PQ-codes columns. */
  def sdcDotColumn(a: Column, b: Column, model: PqModel): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PqSdcDot(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b), sdcTables(model)))
  }

  /** Approximate top-k by PQ ADC dot product: ONE corpus scan over CODES
    * (no float vectors read, no per-query rescans) — every query's LUT rides
    * one broadcast expression that emits all scores per row; a generator
    * unpacks them and a per-query window ranks. `queries` carries
    * (query_id, vector) pairs and must be small (driver-built LUTs, the
    * broadcast-dimension convention). Output: (query_id, rank, neighbor_id,
    * adc_dot).
    */
  def topKByAdc(corpusCodes: DataFrame, idCol: String, codesCol: String,
                queries: Seq[(Long, Array[Double])], model: PqModel,
                k: Int, excludeSelf: Boolean = false): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    require(queries.nonEmpty, "no queries")
    val luts = buildLuts(queries, model)
    val qids = queries.map(_._1)
    val scores = GraftColumnBridge.column(PqAdcDotMulti(
      GraftColumnBridge.expression(col(codesCol)), luts))
    val scored = corpusCodes
      .select(col(idCol).as("neighbor_id"), posexplode(scores)
        .as(Seq("__graft_qidx", "adc_dot")))
      .withColumn("query_id", element_at(
        array(qids.map(lit): _*), col("__graft_qidx") + 1))
    val w = Window.partitionBy("query_id").orderBy(col("adc_dot").desc, col("neighbor_id"))
    // self-exclusion must happen BEFORE the rank cut, or a query present in
    // the corpus consumes one of its own k slots
    val base = if (excludeSelf) scored.where(col("query_id") =!= col("neighbor_id"))
               else scored
    base.where(col("adc_dot").isNotNull)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_dot"))
  }

  /** The production PQ search shape: ADC over codes prefilters a shortlist
    * (quantization cannot rank WITHIN a cell — same-code rows tie), then the
    * shortlist alone joins back to the float vectors for an exact cosine
    * rerank (the metric the rest of the ANN family ranks by). The
    * corpus-wide scan touches only codes; the exact kernel runs on
    * `shortlist` rows per query. Output: (query_id, rank, neighbor_id,
    * cosine), rank 1..k, self-match excluded.
    */
  def topKByAdcRerank(corpusCodes: DataFrame, corpusVecs: DataFrame,
                      idCol: String, codesCol: String, vecCol: String,
                      queries: Seq[(Long, Array[Double])], model: PqModel,
                      k: Int, shortlist: Int = 100): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val session = corpusVecs.sparkSession
    import session.implicits._
    val cand = topKByAdc(corpusCodes, idCol, codesCol, queries, model, shortlist,
        excludeSelf = true)
      .select(col("query_id"), col("neighbor_id"))
    val qdf = queries.map { case (qid, qv) => (qid, qv.toSeq) }.toDF("query_id", "__qv")
    val vecs = corpusVecs.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__cv"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    cand.join(vecs, Seq("neighbor_id"))
      .join(broadcast(qdf), Seq("query_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.cosine(col("__qv"), col("__cv")))
      .where(col("cosine").isNotNull)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Driver-side mirror of the [[NearestCentroids]] kernel (max dot against
    * NORMALIZED centroids, ties to the lowest index) so query probing and
    * corpus cell assignment agree exactly.
    */
  private[pipeline] def probeCells(cells: Array[Array[Double]], q: Array[Double],
                                   nprobe: Int): Array[Int] = {
    val normed = cells.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0.0) c else c.map(_ / n)
    }
    val sims = normed.map { cen =>
      val d = math.min(q.length, cen.length)
      var dot = 0.0
      var j = 0
      while (j < d) { dot += q(j) * cen(j); j += 1 }
      dot
    }
    sims.zipWithIndex.sortBy { case (s, idx) => (-s, idx) }.take(nprobe).map(_._2)
  }

  /** IVF-PQ — the production 100 TB ANN layout (Jégou et al. 2011 §V;
    * IVFADC without residual re-encoding, codebooks shared across cells):
    * a coarse quantizer partitions the corpus into `numCells` inverted
    * lists, every row stores only its cell id + PQ codes, and a query
    * touches just its `nprobe` nearest cells — the scan is SUBLINEAR in the
    * corpus (cells prune at the storage layer when the table is partitioned
    * by cell), and what it reads is 32x smaller than the float vectors.
    * Scoring is one ADC pass over the probed rows; the top-`shortlist` ADC
    * candidates alone join back to float vectors for an exact cosine rerank.
    *
    * Both quantizers train on ONE capped driver sample (the IVF/PQ/
    * IsolationForest convention). `queries` is a small driver-side seq, the
    * broadcast-dimension convention of [[topKByAdc]]; probing is therefore
    * free driver arithmetic. Output: (query_id, rank, neighbor_id, cosine),
    * rank 1..k, self-match excluded.
    */
  def ivfPqTopK(corpus: DataFrame, idCol: String, vecCol: String,
                queries: Seq[(Long, Array[Double])], k: Int,
                numCells: Int = 64, nprobe: Int = 8, numBlocks: Int = 16,
                codebookSize: Int = 256, shortlist: Int = 100,
                trainRows: Int = 10000, iterations: Int = 10,
                seed: Long = 42L, residual: Boolean = false): DataFrame = {
    val (model, indexed) = ivfPqBuildIndex(corpus, idCol, vecCol, numCells,
      numBlocks, codebookSize, trainRows, iterations, seed, residual)
    ivfPqQueryPhase(indexed, model, queries, k, nprobe, shortlist)
  }

  /** The trained coarse+product quantizers of one IVF-PQ index build:
    * everything a LATER job needs to query an index written at rest —
    * `cells` (coarse centroids for probe selection), `anchors` (residual
    * reference points, empty when `residual=false`), and the PQ codebooks.
    * Serialize with [[IvfPqIndexModelJson]].
    */
  final case class IvfPqIndexModel(cells: Array[Array[Double]],
                                   anchors: Array[Array[Double]],
                                   pq: PqModel, residual: Boolean)

  /** Build-once half of the 100 TB ANN story: ONE corpus pass emits
    * `(neighbor_id, cell, codes, vector)` — write it
    * `partitionBy("cell")` to parquet and the query half
    * ([[ivfPqTopKIndexed]]) prunes untouched cells AT THE STORAGE LAYER
    * (`cell` is then a partition column, so the `isin(touched)` filter
    * becomes a partition filter: scanned files ~ nprobe/numCells of the
    * corpus; PqSpec pins this with scan-node metrics). The model returns
    * alongside so query jobs never retrain.
    */
  def ivfPqBuildIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      numCells: Int = 64, numBlocks: Int = 16,
                      codebookSize: Int = 256,
                      trainRows: Int = 10000, iterations: Int = 10,
                      seed: Long = 42L, residual: Boolean = false): (IvfPqIndexModel, DataFrame) = {
    import org.apache.spark.sql.GraftColumnBridge
    val sample = corpus.select(col(vecCol).cast("array<double>"))
      .where(col(vecCol).isNotNull).limit(trainRows)
      .collect().map(_.getSeq[Double](0).toArray)
    val cells = Similarity.trainKMeans(sample, numCells, iterations, seed)
    // residual=true is full IVFADC (Jégou et al. 2011 §V): the PQ codebooks
    // quantize `v - anchor(cell)` — a much smaller ball than the raw space,
    // so the same bit budget buys finer resolution. The reference point is
    // the RAW-SPACE mean of the cell's sample members (the spherical coarse
    // quantizer's centroids are unit vectors — direction-only — so they are
    // NOT small-residual reference points; any per-cell constant keeps the
    // decomposition exact: dot(q, v) ~ dot(q, anchor) + dot(q, residual~)).
    val dim = sample.head.length
    val anchors: Array[Array[Double]] =
      if (!residual) Array.empty
      else {
        val sums = Array.fill(cells.length)(new Array[Double](dim))
        val counts = new Array[Int](cells.length)
        sample.foreach { v =>
          val c = probeCells(cells, v, 1).head
          counts(c) += 1
          var i = 0
          while (i < math.min(dim, v.length)) { sums(c)(i) += v(i); i += 1 }
        }
        Array.tabulate(cells.length)(c =>
          if (counts(c) == 0) new Array[Double](dim) else sums(c).map(_ / counts(c)))
      }
    val pqSample =
      if (!residual) sample
      else sample.map { v =>
        val a = anchors(probeCells(cells, v, 1).head)
        if (a.length != v.length) v
        else Array.tabulate(v.length)(i => v(i) - a(i))
      }
    val model = trainFromSample(pqSample, numBlocks, codebookSize, iterations, seed)

    // index build: ONE corpus projection -> (id, cell, codes, vector); at
    // rest this is the whole index (cell = partition column, codes =
    // 1 byte/block, vector kept for the exact rerank)
    val indexModel = IvfPqIndexModel(cells, anchors, model, residual)
    (indexModel, ivfPqAppendToIndex(indexModel, corpus, idCol, vecCol))
  }

  /** Incremental append half (VERDICT r11 next #6): real corpora grow daily
    * and a 100 TB index must not retrain from scratch per batch. Encodes
    * `newRows` with the STORED coarse + product quantizers — zero training,
    * ONE projection pass — into the same `(neighbor_id, cell, codes,
    * vector)` layout; write it `partitionBy("cell")` in append mode next to
    * the original index and [[ivfPqTopKIndexed]] keeps pruning at the
    * storage layer (identical `cell` domain, so appended files land inside
    * existing partition directories).
    *
    * Frozen-codebook caveat: appended vectors are quantized against
    * centroids trained on the ORIGINAL distribution. Rerank stays exact
    * (raw vectors ride along), so correctness never degrades — only ADC
    * shortlist RECALL drifts if the new data's distribution moves. Retrain
    * trigger heuristic: rebuild when [[ivfPqCellSkew]] exceeds ~4 (new data
    * piling into few cells) or appends exceed ~30% of indexed rows.
    */
  def ivfPqAppendToIndex(model: IvfPqIndexModel, newRows: DataFrame,
                         idCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val vec = col(vecCol).cast("array<double>")
    val withCell = newRows.where(vec.isNotNull).select(
      col(idCol).cast("long").as("neighbor_id"),
      vec.as("vector"),
      element_at(GraftColumnBridge.column(NearestCentroids(
        GraftColumnBridge.expression(vec), model.cells, 1)), 1).as("cell"))
    val codesCol =
      if (model.residual)
        GraftColumnBridge.column(PqEncodeResidual(
          GraftColumnBridge.expression(col("vector")),
          GraftColumnBridge.expression(col("cell")), model.anchors, model.pq))
      else encodeColumn(col("vector"), model.pq)
    withCell.select(col("neighbor_id"), col("cell"),
      codesCol.as("codes"), col("vector"))
  }

  /** Retrain-trigger input for appended indexes: max cell population over
    * the mean (non-empty cells). One slim aggregate over the index frame —
    * at rest this reads only parquet footers' worth of rows per cell
    * directory. ~1 is balanced; past ~4, fresh data is piling into few
    * cells and the coarse quantizer no longer reflects the distribution, so
    * probe pruning degrades toward scanning those hot cells every query.
    */
  def ivfPqCellSkew(index: DataFrame): Double = {
    val row = index.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).cast("double").as("mx"), avg(col("n")).as("av"))
      .collect().head
    if (row.isNullAt(0) || row.getDouble(1) == 0.0) 1.0
    else row.getDouble(0) / row.getDouble(1)
  }

  /** One row of [[ivfPqIndexFileStats]]: the physical file census of one
    * `cell=` partition directory.
    */
  final case class IndexCellFiles(cell: Int, files: Int, bytes: Long)

  /** Result of [[ivfPqCompactIndex]]. */
  final case class CompactionStats(cellsRewritten: Int, filesBefore: Int,
                                   filesAfter: Int, rowsRewritten: Long)

  /** Driver-side file census of an at-rest cell-partitioned index: one
    * filesystem listing per `cell=` directory, bounded by the model's cell
    * count (a training-time constant), never by data. The maintenance
    * signal for [[ivfPqCompactIndex]]: per-micro-batch appends
    * ([[graft.streaming.StreamingRecipes.ivfPqAppendPerBatch]]) add at
    * least one parquet file per touched cell per batch, and a day of
    * 5-minute batches is ~288 small files per hot cell — each one a
    * separate open/footer-parse at query time.
    */
  def ivfPqIndexFileStats(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String): Seq[IndexCellFiles] = {
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .flatMap { st =>
        val cell = scala.util.Try(st.getPath.getName.stripPrefix("cell=").toInt).toOption
        cell.map { c =>
          val data = fs.listStatus(st.getPath).filter(f => f.isFile && {
            val n = f.getPath.getName
            !n.startsWith("_") && !n.startsWith(".")
          })
          IndexCellFiles(c, data.length, data.map(_.getLen).sum)
        }
      }.sortBy(_.cell)
  }

  /** Compact fragmented cells of an at-rest index IN PLACE: cells holding
    * more than `maxFilesPerCell` data files are re-read (a partition-pruned
    * scan touching ONLY those cells), rewritten with bounded file counts,
    * and swapped in with one atomic directory rename per cell. Healthy
    * cells are never read, rewritten, or moved — at 100 TB the cost scales
    * with the fragmented fraction, not the index.
    *
    * Row content is preserved exactly (same columns, same rows), so queries
    * racing a compaction see each cell either pre- or post-swap with
    * identical answers; a reader that LISTS files mid-swap of one cell can
    * still hit a transient miss, so schedule compaction off the query peak.
    * PAUSE INGEST while compacting: an append landing a file into a cell
    * between its census and its swap would be staged out with the old
    * directory and deleted — writers and the compactor must not overlap.
    * Crash safety: the new files land under a hidden `.dq_compact_tmp` dir
    * first and replaced directories are deleted only after their swap —
    * a crash leaves every cell fully old or fully new, plus tmp/backup
    * dirs that the next compaction run clears (parquet readers skip
    * dot-dirs, so leftovers never pollute answers). The per-cell swap is
    * two renames (`live -> bak`, then `tmp -> live`); a crash between them
    * leaves the cell's only copies inside the dot-dirs, so the leftover
    * cleanup first RESTORES any staged-out `cell=` whose live directory is
    * missing (old copy from bak, else the finished fresh copy from tmp)
    * before deleting the roots — no crash point loses rows.
    *
    * File sizing: each rewritten cell coalesces to one task's output split
    * by `maxRecordsPerFile` (derived from `targetBytesPerFile` and the
    * cell's measured bytes-per-row), so oversized cells still split into
    * sane scan units instead of one giant file.
    */
  def ivfPqCompactIndex(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String,
                        maxFilesPerCell: Int = 8,
                        targetBytesPerFile: Long = 128L * 1024 * 1024): CompactionStats = {
    require(maxFilesPerCell >= 1, "maxFilesPerCell must be >= 1")
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmpRoot = new org.apache.hadoop.fs.Path(root, ".dq_compact_tmp")
    val bakRoot = new org.apache.hadoop.fs.Path(root, ".dq_compact_bak")
    // Recover, then clear, leftovers from a crashed prior run. A crash
    // between the two swap renames leaves a cell ONLY under the dot-dirs;
    // restore any such cell before deleting anything (bak holds the proven
    // old copy — prefer it; a cell present only in tmp with no live dir
    // cannot arise from the swap order below, but restore it defensively).
    Seq(bakRoot, tmpRoot).foreach { staged =>
      if (fs.exists(staged)) {
        fs.listStatus(staged).filter(s => s.isDirectory &&
            s.getPath.getName.startsWith("cell=")).foreach { s =>
          val live = new org.apache.hadoop.fs.Path(root, s.getPath.getName)
          if (!fs.exists(live))
            require(fs.rename(s.getPath, live),
              s"could not restore staged-out ${s.getPath.getName} after a crashed compaction")
        }
      }
    }
    Seq(tmpRoot, bakRoot).foreach(p => if (fs.exists(p)) fs.delete(p, true))
    val stats = ivfPqIndexFileStats(spark, indexPath)
    val frag = stats.filter(_.files > maxFilesPerCell)
    if (frag.isEmpty) return CompactionStats(0, stats.map(_.files).sum,
      stats.map(_.files).sum, 0L)
    val fragCells = frag.map(_.cell)
    val fragRows = spark.read.parquet(indexPath)
      .where(col("cell").isin(fragCells: _*)) // partition filter: only frag cells read
    val rows = fragRows.count()
    // bytes-per-row from the census (compressed, the unit that matters for
    // scan splits); guard against empty/degenerate cells
    val bpr = math.max(1L, frag.map(_.bytes).sum / math.max(1L, rows))
    val maxRecords = math.max(1L, targetBytesPerFile / bpr)
    fragRows
      .repartition(fragCells.length, col("cell"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecords)
      .partitionBy("cell")
      .parquet(tmpRoot.toString)
    fs.mkdirs(bakRoot)
    fragCells.foreach { c =>
      val live = new org.apache.hadoop.fs.Path(root, s"cell=$c")
      val fresh = new org.apache.hadoop.fs.Path(tmpRoot, s"cell=$c")
      val bak = new org.apache.hadoop.fs.Path(bakRoot, s"cell=$c")
      // a frag cell with zero ROWS (fragmented empty files) produces no
      // output dir; leave it untouched rather than swap in nothing
      if (fs.exists(fresh)) {
        require(fs.rename(live, bak), s"could not stage out cell=$c")
        require(fs.rename(fresh, live), s"could not swap in compacted cell=$c")
      }
    }
    Seq(tmpRoot, bakRoot).foreach(p => if (fs.exists(p)) fs.delete(p, true))
    val after = ivfPqIndexFileStats(spark, indexPath)
    CompactionStats(fragCells.length, stats.map(_.files).sum,
      after.map(_.files).sum, rows)
  }

  /** Query half over a PREBUILT index frame `(neighbor_id, cell, codes,
    * vector)` — typically `spark.read.parquet(indexPath)` of an
    * [[ivfPqBuildIndex]] output written `partitionBy("cell")`, with the
    * model loaded via [[IvfPqIndexModelJson]]. Only the `nprobe` nearest
    * cells per query are read: on a cell-partitioned table the filter is a
    * partition filter, so untouched partitions are never scanned.
    */
  def ivfPqTopKIndexed(index: DataFrame, model: IvfPqIndexModel,
                       queries: Seq[(Long, Array[Double])], k: Int,
                       nprobe: Int = 8, shortlist: Int = 100): DataFrame = {
    Seq("neighbor_id", "cell", "codes", "vector").foreach(c =>
      require(index.columns.contains(c), s"index frame must carry column '$c'"))
    ivfPqQueryPhase(index, model, queries, k, nprobe, shortlist)
  }

  private def ivfPqQueryPhase(indexed: DataFrame, indexModel: IvfPqIndexModel,
                              queries: Seq[(Long, Array[Double])], k: Int,
                              nprobe: Int, shortlist: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    require(queries.nonEmpty, "no queries")
    require(shortlist >= k, "shortlist must be at least k")
    val session = indexed.sparkSession
    import session.implicits._
    val cells = indexModel.cells
    val anchors = indexModel.anchors
    val model = indexModel.pq
    val residual = indexModel.residual

    // driver-side probe lists per query + the union of touched cells
    val probes = math.min(nprobe, cells.length)
    val probed: Seq[Array[Int]] = queries.map { case (_, qv) => probeCells(cells, qv, probes) }
    val touched = probed.flatten.distinct.sorted
    val probedLit = array(probed.map(cs => array(cs.map(lit): _*)): _*)

    // ADC over probed rows only: every query's LUT rides one expression,
    // rows outside a query's probe list are dropped before ranking
    val luts = buildLuts(queries, model)
    val qids = queries.map(_._1)
    val scores = GraftColumnBridge.column(PqAdcDotMulti(
      GraftColumnBridge.expression(col("codes")), luts))
    // residual mode: the per-(query, cell) dot(q, anchor) constant that
    // completes the IVFADC decomposition, as a literal lookup (queries x
    // numCells doubles — driver arithmetic, broadcast with the plan)
    val qCellDotLit =
      if (!residual) lit(null)
      else array(queries.map { case (_, qv) =>
        array(anchors.map { cent =>
          val d = math.min(qv.length, cent.length)
          var s = 0.0
          var j = 0
          while (j < d) { s += qv(j) * cent(j); j += 1 }
          lit(s)
        }: _*)
      }: _*)
    val pruned = indexed
      .where(col("cell").isin(touched: _*)) // cell pruning (partition prune at rest)
    val cand0 = pruned
      .select(col("neighbor_id"), col("cell"), posexplode(scores).as(Seq("__qidx", "adc_dot")))
      .where(array_contains(element_at(probedLit, col("__qidx") + 1), col("cell")))
      .withColumn("query_id", element_at(array(qids.map(lit): _*), col("__qidx") + 1))
    val cand = (if (!residual) cand0
      else cand0.withColumn("adc_dot",
        col("adc_dot") + element_at(element_at(qCellDotLit, col("__qidx") + 1), col("cell") + 1)))
      .where(col("adc_dot").isNotNull)
      // self-exclusion BEFORE the shortlist cut: a query id present in the
      // corpus must not consume one of its own shortlist slots (with
      // shortlist == k that silently returned k-1 neighbors)
      .where(col("query_id") =!= col("neighbor_id"))
    val wAdc = Window.partitionBy("query_id").orderBy(col("adc_dot").desc, col("neighbor_id"))
    val short = cand.withColumn("__r", row_number().over(wAdc))
      .where(col("__r") <= shortlist)
      .select("query_id", "neighbor_id")

    // exact cosine rerank on the shortlist only; vectors come from the
    // index frame, so a cell-partitioned table serves them from the SAME
    // pruned partitions (shortlist members live in touched cells)
    val qdf = queries.map { case (qid, qv) => (qid, qv.toSeq) }.toDF("query_id", "__qv")
    val vecs = pruned.select(col("neighbor_id"),
      col("vector").cast("array<double>").as("__cv"))
    val wCos = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    short.join(vecs, Seq("neighbor_id"))
      .join(broadcast(qdf), Seq("query_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.cosine(col("__qv"), col("__cv")))
      .where(col("cosine").isNotNull)
      .withColumn("rank", row_number().over(wCos))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}

/** JSON (de)serialization for [[Pq.PqModel]] — the model-as-data convention
  * every trained family follows (NER weights, tokenizers, n-gram LMs,
  * IsolationForest records): train the codebooks ONCE on a sample job, save
  * to any Hadoop-visible URI, and encode/search in later jobs or other
  * clusters without retraining. Format:
  * `{"block_dim": D, "codebooks": [[[...]]]}` (block x centroid x dim);
  * numbers round-trip exactly (json4s renders doubles losslessly).
  */
object PqModelJson {
  def render(model: Pq.PqModel): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("block_dim" -> model.blockDim) ~
          ("codebooks" -> model.codebooks.map(_.map(_.toList).toList).toList)))
  }

  def parse(json: String): Pq.PqModel = {
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val j = org.json4s.jackson.JsonMethods.parse(json)
    val bd = (j \ "block_dim").extract[Int]
    val cbs = (j \ "codebooks").extract[List[List[List[Double]]]]
      .map(_.map(_.toArray).toArray).toArray
    require(bd > 0, "block_dim must be positive")
    require(cbs.nonEmpty && cbs.forall(b => b.nonEmpty && b.forall(_.length == bd)),
      "every codebook centroid must have block_dim entries")
    Pq.PqModel(bd, cbs)
  }

  def save(spark: org.apache.spark.sql.SparkSession, location: String,
           model: Pq.PqModel): Unit =
    graft.io.FsText.write(spark, location, render(model))

  def load(spark: org.apache.spark.sql.SparkSession, location: String): Pq.PqModel =
    parse(graft.io.FsText.read(spark, location))
}

/** JSON (de)serialization for [[Pq.IvfPqIndexModel]] — same model-as-data
  * convention as [[PqModelJson]]: build the index once, save the model next
  * to the cell-partitioned index table, and query from any later job
  * without retraining.
  */
object IvfPqIndexModelJson {
  def render(m: Pq.IvfPqIndexModel): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("residual" -> m.residual) ~
          ("cells" -> m.cells.map(_.toList).toList) ~
          ("anchors" -> m.anchors.map(_.toList).toList) ~
          ("block_dim" -> m.pq.blockDim) ~
          ("codebooks" -> m.pq.codebooks.map(_.map(_.toList).toList).toList)))
  }

  def parse(json: String): Pq.IvfPqIndexModel = {
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val j = org.json4s.jackson.JsonMethods.parse(json)
    val cells = (j \ "cells").extract[List[List[Double]]].map(_.toArray).toArray
    require(cells.nonEmpty, "cells must be non-empty")
    val anchors = (j \ "anchors").extract[List[List[Double]]].map(_.toArray).toArray
    val bd = (j \ "block_dim").extract[Int]
    val cbs = (j \ "codebooks").extract[List[List[List[Double]]]]
      .map(_.map(_.toArray).toArray).toArray
    require(bd > 0 && cbs.nonEmpty && cbs.forall(b => b.nonEmpty && b.forall(_.length == bd)),
      "every codebook centroid must have block_dim entries")
    Pq.IvfPqIndexModel(cells, anchors, Pq.PqModel(bd, cbs),
      (j \ "residual").extract[Boolean])
  }

  def save(spark: org.apache.spark.sql.SparkSession, location: String,
           m: Pq.IvfPqIndexModel): Unit =
    graft.io.FsText.write(spark, location, render(m))

  def load(spark: org.apache.spark.sql.SparkSession, location: String): Pq.IvfPqIndexModel =
    parse(graft.io.FsText.read(spark, location))
}

/** Static kernels for the PQ expressions. */
object PqOps {
  def encode(arr: ArrayData, model: Pq.PqModel): ArrayData = {
    val v = readVec(arr, model)
    if (v == null) return null
    encodeVec(v, model)
  }

  /** Residual encoding (IVFADC, Jégou et al. 2011 §V): encode
    * `v - centroids(cell)` so the codebooks only need to cover the small
    * per-cell residual ball instead of the whole space. NULL on mis-sized
    * input, null elements, an out-of-range cell, or a centroid whose dim
    * disagrees with the vector.
    */
  def encodeResidual(arr: ArrayData, cell: Int,
                     centroids: Array[Array[Double]], model: Pq.PqModel): ArrayData = {
    val v = readVec(arr, model)
    if (v == null || cell < 0 || cell >= centroids.length) return null
    val cent = centroids(cell)
    if (cent.length != v.length) return null
    var i = 0
    while (i < v.length) { v(i) -= cent(i); i += 1 }
    encodeVec(v, model)
  }

  private def readVec(arr: ArrayData, model: Pq.PqModel): Array[Double] = {
    val n = arr.numElements()
    if (n != model.blockDim * model.numBlocks) return null
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      v(i) = arr.getDouble(i)
      i += 1
    }
    v
  }

  private def encodeVec(v: Array[Double], model: Pq.PqModel): ArrayData = {
    val codes = new Array[Int](model.numBlocks)
    var b = 0
    while (b < model.numBlocks) {
      val cb = model.codebooks(b)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        var d = 0.0
        var j = 0
        val cent = cb(c)
        while (j < cent.length) {
          val x = v(b * model.blockDim + j) - cent(j)
          d += x * x
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(b) = best
      b += 1
    }
    new GenericArrayData(codes)
  }

  def adcDot(codes: ArrayData, lut: Array[Array[Double]]): java.lang.Double = {
    val n = codes.numElements()
    if (n != lut.length) return null
    var s = 0.0
    var b = 0
    while (b < n) {
      if (codes.isNullAt(b)) return null
      val c = codes.getInt(b)
      val t = lut(b)
      if (c < 0 || c >= t.length) return null
      s += t(c)
      b += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** SDC dot of two code arrays via the precomputed per-block code-code
    * tables; null on any malformed side (mirrors [[adcDot]]'s conventions).
    */
  def sdcDot(a: ArrayData, b: ArrayData,
             tables: Array[Array[Array[Double]]]): java.lang.Double = {
    val n = a.numElements()
    if (n != tables.length || b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val ca = a.getInt(i)
      val cb = b.getInt(i)
      val t = tables(i)
      if (ca < 0 || ca >= t.length || cb < 0 || cb >= t(ca).length) return null
      s += t(ca)(cb)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** All queries' ADC dots in one pass over the row's codes (query-major
    * LUTs); null when the codes don't fit the model.
    */
  def adcDotMulti(codes: ArrayData, luts: Array[Array[Array[Double]]]): ArrayData = {
    val out = new Array[Double](luts.length)
    var q = 0
    while (q < luts.length) {
      val one = adcDot(codes, luts(q))
      if (one == null) return null
      out(q) = one.doubleValue()
      q += 1
    }
    new GenericArrayData(out)
  }
}

/** PQ codes of a vector column. NULL on null/mis-sized/null-element input. */
case class PqEncode(child: Expression, model: Pq.PqModel) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = PqOps.encode(v.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[Pq.PqModel].getName)
    val gen = child.genCode(ctx)
    val res = ctx.freshName("pqCodes")
    ev.copy(code =
      code"""
        ${gen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${gen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $res =
            graft.pipeline.PqOps.encode(${gen.value}, $ref);
          if ($res != null) { ${ev.isNull} = false; ${ev.value} = $res; }
        }""")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

/** Residual PQ codes (IVFADC): encode `vec - centroids(cell)` row-locally —
  * the index-build kernel of the residual IVF-PQ layout. NULL conventions
  * follow [[PqEncode]] (plus out-of-range cell / centroid-dim mismatch).
  */
case class PqEncodeResidual(vec: Expression, cell: Expression,
                            centroids: Array[Array[Double]], model: Pq.PqModel)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = cell
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, c: Any): Any =
    PqOps.encodeResidual(v.asInstanceOf[ArrayData], c.asInstanceOf[Int], centroids, model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refM = ctx.addReferenceObj("pqModel", model, classOf[Pq.PqModel].getName)
    val refC = ctx.addReferenceObj("pqCells", centroids, "double[][]")
    val genV = vec.genCode(ctx)
    val genC = cell.genCode(ctx)
    val res = ctx.freshName("pqResCodes")
    ev.copy(code =
      code"""
        ${genV.code}
        ${genC.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${genV.isNull} && !${genC.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $res =
            graft.pipeline.PqOps.encodeResidual(${genV.value}, ${genC.value}, $refC, $refM);
          if ($res != null) { ${ev.isNull} = false; ${ev.value} = $res; }
        }""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncodeResidual =
    copy(vec = l, cell = r)
}

/** Every query's ADC dot product per row (array<double>, query-major LUTs). */
case class PqAdcDotMulti(child: Expression, luts: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = PqOps.adcDotMulti(v.asInstanceOf[ArrayData], luts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLuts", luts, "double[][][]")
    val gen = child.genCode(ctx)
    val res = ctx.freshName("adcMultiRes")
    ev.copy(code =
      code"""
        ${gen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${gen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $res =
            graft.pipeline.PqOps.adcDotMulti(${gen.value}, $ref);
          if ($res != null) { ${ev.isNull} = false; ${ev.value} = $res; }
        }""")
  }

  override protected def withNewChildInternal(c: Expression): PqAdcDotMulti = copy(child = c)
}

/** ADC dot product of a codes column against a broadcast LUT. */
/** Symmetric-distance (SDC) dot product of TWO PQ code arrays: per block,
  * `tables(b)(ca)(cb)` = dot(codebook(b)(ca), codebook(b)(cb)), precomputed
  * once on the driver ([[Pq.sdcTables]]) — a code-code pair costs numBlocks
  * array reads, no float vectors touched (Jégou et al. 2011 §III.B, SDC).
  * NULL when either side is null/mis-sized/null-element/out-of-range.
  */
case class PqSdcDot(left: Expression, right: Expression,
                    tables: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    PqOps.sdcDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqSdcTables", tables, "double[][][]")
    val genA = left.genCode(ctx)
    val genB = right.genCode(ctx)
    val res = ctx.freshName("sdcRes")
    ev.copy(code =
      code"""
        ${genA.code}
        ${genB.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${genA.isNull} && !${genB.isNull}) {
          java.lang.Double $res = graft.pipeline.PqOps.sdcDot(${genA.value}, ${genB.value}, $ref);
          if ($res != null) { ${ev.isNull} = false; ${ev.value} = $res.doubleValue(); }
        }""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqSdcDot =
    copy(left = l, right = r)
}

case class PqAdcDot(child: Expression, lut: Array[Array[Double]]) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = PqOps.adcDot(v.asInstanceOf[ArrayData], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", lut, "double[][]")
    val gen = child.genCode(ctx)
    val res = ctx.freshName("adcRes")
    ev.copy(code =
      code"""
        ${gen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${gen.isNull}) {
          java.lang.Double $res = graft.pipeline.PqOps.adcDot(${gen.value}, $ref);
          if ($res != null) { ${ev.isNull} = false; ${ev.value} = $res.doubleValue(); }
        }""")
  }

  override protected def withNewChildInternal(c: Expression): PqAdcDot = copy(child = c)
}
