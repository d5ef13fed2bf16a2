package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup flags and removes duplicate content") {
    val df = Seq((1, "a b c"), (2, "a b c"), (3, "x y z")).toDF("id", "text")
    val flagged = Dedup.flagExactDuplicates(df, Seq(col("text")))
    assert(flagged.where(col("__is_duplicate")).count() == 2)
    val kept = Dedup.dedupExact(df, Seq(col("text")), col("id"))
    assert(kept.count() == 2)
    assert(kept.where(col("text") === "a b c").select("id").as[Int].head() == 1)
  }

  test("line-level dedup strips corpus-wide boilerplate, keeps order, empties all-boilerplate docs") {
    import spark.implicits._
    val docs = Seq(
      (1, "HEADER\nalpha beta\nmiddle one\nFOOTER"),
      (2, "HEADER\ngamma delta\nFOOTER"),
      (3, "HEADER\nFOOTER"), // nothing unique -> must survive as ''
      (4, "solo doc with no boilerplate")
    ).toDF("doc_id", "text")
    val out = graft.pipeline.Dedup.dedupLines(docs, "doc_id", "text")
      .as[(Int, String)].collect().toMap
    assert(out(1) == "alpha beta\nmiddle one") // order preserved
    assert(out(2) == "gamma delta")
    assert(out(3) == "") // doc retained, fully stripped
    assert(out(4) == "solo doc with no boilerplate")
    // maxOccurrences=3 keeps lines repeated up to 3 times (HEADER/FOOTER x3)
    val relaxed = graft.pipeline.Dedup.dedupLines(docs, "doc_id", "text", maxOccurrences = 3)
      .as[(Int, String)].collect().toMap
    assert(relaxed(3) == "HEADER\nFOOTER")
  }

  test("minhash LSH finds near-duplicate pairs with exact jaccard verification") {
    val base = "spark catalyst plan optimizer shuffle partition broadcast join window aggregate"
    val df = Seq(
      (1, base),
      (2, base + " extra"), // high jaccard with 1
      (3, "completely different words nothing shared here at all ok then")
    ).toDF("id", "text")
    val pairs = Dedup.minHashDuplicatePairs(df, "id", "text", shingleSize = 3,
      numHashes = 64, bands = 32, threshold = 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getInt(0) == 1 && pairs.head.getInt(1) == 2)
    assert(pairs.head.getDouble(2) > 0.7)
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val near = (1 to 29).map(i => s"tok$i").mkString(" ") + " tok99"
    val far = (100 to 130).map(i => s"w$i").mkString(" ")
    val df = Seq((1, base), (2, near), (3, far)).toDF("id", "text")
    val pairs = Dedup.simHashDuplicatePairs(df, "id", "text", maxHamming = 8)
    val got = pairs.select("id_a", "id_b").as[(Int, Int)].collect().toSet
    assert(got.contains((1, 2)))
    assert(!got.contains((1, 3)) && !got.contains((2, 3)))
  }

  test("brute-force cosine top-k ranks exact neighbors") {
    val vecs = Seq(
      (0, Array(1.0f, 0.0f)),
      (1, Array(0.9f, 0.1f)),
      (2, Array(0.0f, 1.0f)),
      (3, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0), "vec_id", "embedding", 2)
    val ranked = out.select("rank", "neighbor_id").as[(Int, Int)].collect().sortBy(_._1)
    assert(ranked.toSeq == Seq((1, 1), (2, 2)))
  }

  test("lsh top-k returns subset-consistent ranks") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 100).map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(vecs, vecs.where(col("vec_id") < 3), "vec_id", "embedding", 5,
      planes = 4, tables = 8, dim = 64)
    val n = out.count()
    assert(n > 0 && n <= 15)
    // ranks are 1..k contiguous per query
    val ranks = out.groupBy("query_id").agg(collect_list("rank")).collect()
    ranks.foreach { r =>
      val rs = r.getSeq[Int](1).sorted
      assert(rs == (1 to rs.length))
    }
  }

  test("cosine LSH: multi-table recall on near-parallel pairs + skew-bucket cap") {
    val rnd = new scala.util.Random(11)
    val baseVecs = (0 until 60).map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
    // planted near-dups: scaled copies (cosine exactly 1 — always co-bucketed)
    val planted = baseVecs.take(5).map { case (i, v) => (i + 1000, v.map(x => x * 1.01f)) }
    // degenerate skew bucket: 50 identical vectors (all pairwise cosine 1)
    val skew = (0 until 50).map(i => (i + 2000, Array.fill(64)(0.5f)))
    val df = (baseVecs ++ planted ++ skew).toDF("vec_id", "embedding")
    val pairs = Dedup.cosineNearDupPairs(df, "vec_id", "embedding", threshold = 0.999)
      .select("id_a", "id_b").as[(Int, Int)].collect().toSet
    (0 until 5).foreach(i => assert(pairs.contains((i, i + 1000)), s"missed planted pair $i"))
    assert(pairs.count { case (a, b) => a >= 2000 && b >= 2000 } == 50 * 49 / 2)
    // with a tight cap the degenerate bucket is dropped; planted pairs survive
    // (different buckets) and the job never builds the quadratic candidate set
    val capped = Dedup.cosineNearDupPairs(df, "vec_id", "embedding", threshold = 0.999,
      maxBucketSize = 20)
      .select("id_a", "id_b").as[(Int, Int)].collect().toSet
    (0 until 5).foreach(i => assert(capped.contains((i, i + 1000)), s"capped missed pair $i"))
    assert(!capped.exists { case (a, b) => a >= 2000 && b >= 2000 })
  }

  test("simhash chunk-pair blocking keeps recall 1 within the Hamming budget") {
    // identical up to maxHamming bit flips must always be found
    val doc = (1 to 60).map(i => s"token$i").mkString(" ")
    val variants = Seq(
      (1, doc),
      (2, doc), // identical -> hamming 0
      (3, doc.replace("token7", "tokenX")), // small perturbation
      (4, (1 to 60).map(i => s"other$i").mkString(" ")) // unrelated
    ).toDF("id", "text")
    val pairs = Dedup.simHashDuplicatePairs(variants, "id", "text", maxHamming = 10)
      .select("id_a", "id_b", "hamming").as[(Int, Int, Int)].collect()
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((1, 2)))
    assert(pairs.find(p => (p._1, p._2) == ((1, 2))).get._3 == 0)
    assert(!pairSet.exists { case (a, b) => b == 4 || a == 4 })
  }

  test("text analysis signals and language id") {
    val df = Seq(
      (1, "The cat and the dog are in the house"),
      (2, "der Hund und die Katze sind nicht im Haus"),
      (3, "xyzzy qwerty asdf")
    ).toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.languageId(col("text")).as("lang"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
    val rows = out.collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    assert(rows.map(_._2) == Seq(9, 9, 3))
    assert(rows.map(_._3) == Seq("en", "de", "und"))
    // fingerprint is whitespace/punct/case-insensitive
    val fps = Seq((1, "The CAT, and the dog are   in the house!!"), (2, "other"))
      .toDF("id", "text").select(TextAnalysis.fingerprint(col("text"))).as[Long].collect()
    assert(fps.head == out.where(col("id") === 1).select("fp").as[Long].head())
  }

  test("multimodal stub decode plumbing: schema, partition-local features") {
    val df = Seq(
      (1, "image-bytes-one".getBytes, "image/png"),
      (2, "different-payload".getBytes, "image/jpeg"),
      (3, Array.empty[Byte], "image/png")
    ).toDF("id", "data", "mime")
      .withColumn("media", Multimodal.asMedia(col("data"), col("mime")))
      .drop("data", "mime")
    val out = Multimodal.extractFeatures(df, "media", new Multimodal.StubDecoder(8))
    assert(out.schema.fieldNames.toSeq == Seq("id", "media", "media_features"))
    val rows = out.select(col("id"), col("media_features.ok"), size(col("media_features.features")))
      .as[(Int, Boolean, Int)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1, true, 8), (2, true, 8), (3, false, 0)))
    // deterministic: same payload -> same features
    val f1 = out.where(col("id") === 1).select("media_features.features").collect().head.getSeq[Float](0)
    val f1b = Multimodal.extractFeatures(df, "media", new Multimodal.StubDecoder(8))
      .where(col("id") === 1).select("media_features.features").collect().head.getSeq[Float](0)
    assert(f1 == f1b)
  }

  test("HeaderDecoder parses real PNG/JPEG/GIF headers, rejects junk") {
    val dec = new Multimodal.HeaderDecoder
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    // PNG: signature + IHDR(640x480, depth 8, color type 2 = RGB)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
    val (pok, pw, ph, pf) = dec.decode(png, "image/png")
    assert(pok && pw == 640 && ph == 480 && pf.toSeq == Seq(640f, 480f, 8f, 3f))
    // JPEG: SOI, APP0 (skipped), SOF0 800x600 3-component, EOI
    val app0 = Array[Byte](0xFF.toByte, 0xE0.toByte) ++ be16(4) ++ Array[Byte](0, 0)
    val sof0 = Array[Byte](0xFF.toByte, 0xC0.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(600) ++ be16(800) ++ Array[Byte](3) ++
      Array.fill[Byte](9)(0)
    val jpg = Array[Byte](0xFF.toByte, 0xD8.toByte) ++ app0 ++ sof0 ++
      Array[Byte](0xFF.toByte, 0xD9.toByte)
    val (jok, jw, jh, jf) = dec.decode(jpg, "image/jpeg")
    assert(jok && jw == 800 && jh == 600 && jf.toSeq == Seq(800f, 600f, 8f, 3f))
    // GIF89a 320x200
    val gif = "GIF89a".getBytes ++ Array[Byte](64, 1, 200.toByte, 0) // 320 LE, 200 LE
    val (gok, gw, gh, _) = dec.decode(gif, "")
    assert(gok && gw == 320 && gh == 200)
    // junk + truncated PNG + empty
    assert(!dec.decode("not an image at all".getBytes, "image/png")._1)
    assert(!dec.decode(png.take(20), "image/png")._1)
    assert(!dec.decode(Array.empty[Byte], "image/png")._1)
    // mime is advisory: magic wins
    assert(dec.decode(png, "image/jpeg")._2 == 640)
  }

  test("ContainerProbe parses WAV/RIFF and MP4 mvhd durations, rejects junk") {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    // WAV: 16 kHz mono 16-bit (byteRate 32000, blockAlign 2), 64000-byte data
    // chunk => 2000 ms, 32000 sample frames
    val dataSize = 64000
    val wav = "RIFF".getBytes ++ le32(36 + dataSize) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(16000) ++
      le32(32000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(dataSize) ++ Array.fill[Byte](dataSize)(0)
    val w = Multimodal.ContainerProbe.probe(wav)
    assert(w.ok && w.format == "wav" && w.durationMs.contains(2000L) && w.nFrames.contains(32000))
    // WAV with an extra LIST chunk before data: chunk walk must skip it
    val wav2 = "RIFF".getBytes ++ le32(36 + 12 + dataSize) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(16000) ++
      le32(32000) ++ le16(2) ++ le16(16) ++
      "LIST".getBytes ++ le32(4) ++ "INFO".getBytes ++
      "data".getBytes ++ le32(dataSize) ++ Array.fill[Byte](dataSize)(0)
    assert(Multimodal.ContainerProbe.probe(wav2).durationMs.contains(2000L))
    // MP4: ftyp + moov[mvhd v0 timescale=600 duration=3000] => 5000 ms
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)
    val mvhdPayload = Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(600) ++ be32(3000) ++ Array.fill[Byte](80)(0)
    val mvhd = be32(8 + mvhdPayload.length) ++ "mvhd".getBytes ++ mvhdPayload
    val moov = be32(8 + mvhd.length) ++ "moov".getBytes ++ mvhd
    val m = Multimodal.ContainerProbe.probe(ftyp ++ moov)
    assert(m.ok && m.format == "mp4" && m.durationMs.contains(5000L))
    // images route through HeaderDecoder with format tagged
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      be32(13) ++ "IHDR".getBytes ++ be32(64) ++ be32(32) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
    val p = Multimodal.ContainerProbe.probe(png)
    assert(p.ok && p.format == "png" && p.width.contains(64) && p.height.contains(32) && p.durationMs.isEmpty)
    // junk / truncated / null never throw
    assert(!Multimodal.ContainerProbe.probe("RIFFxxxxWAVE".getBytes).ok)
    assert(!Multimodal.ContainerProbe.probe(wav.take(30)).ok)
    assert(!Multimodal.ContainerProbe.probe(null).ok)
  }

  test("truncated JPEG SOF degrades to ok=false instead of throwing") {
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    // FF D8, then an SOF0 whose declared length (2) covers none of the reads
    val evil = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xC0.toByte) ++
      be16(2) ++ Array[Byte](1, 2, 3, 4)
    val dec = new Multimodal.HeaderDecoder
    assert(!dec.decode(evil, "image/jpeg")._1)
    // and through the partition-local stage: one corrupt row can't fail the job
    val df = Seq((1, evil), (2, "plain junk".getBytes)).toDF("id", "data")
      .withColumn("media", Multimodal.asMedia(col("data"), lit("image/jpeg")))
      .drop("data")
    val out = Multimodal.extractFeatures(df, "media")
      .select(col("id"), col("media_features.ok")).as[(Int, Boolean)].collect().toSeq.sorted
    assert(out == Seq((1, false), (2, false)))
  }

  test("probeMedia stage emits probeSchema struct with live duration fields") {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val wav = "RIFF".getBytes ++ le32(36 + 320) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(16000) ++
      le32(32000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(320) ++ Array.fill[Byte](320)(0)
    val df = Seq((1, wav), (2, "junk".getBytes ++ Array.fill[Byte](20)(0))).toDF("id", "data")
      .withColumn("media", Multimodal.asMedia(col("data"), lit("audio/wav")))
      .drop("data")
    val out = Multimodal.probeMedia(df, "media")
    assert(out.schema("media_info").dataType == Multimodal.probeSchema)
    val rows = out.select(col("id"), col("media_info.ok"), col("media_info.format"),
      col("media_info.duration_ms"), col("media_info.n_frames"))
      .collect().map(r => (r.getInt(0), r.getBoolean(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), if (r.isNullAt(4)) -1 else r.getInt(4)))
      .toSeq.sortBy(_._1)
    assert(rows == Seq((1, true, "wav", 10L, 160), (2, false, null, -1L, -1)))
  }

  test("IVF top-k: exhaustive probe matches brute force, partial probe keeps high recall") {
    val rnd = new scala.util.Random(7)
    // 3 well-separated gaussian clusters in 8d
    val centers = Seq(Array.fill(8)(5.0), Array.fill(8)(-5.0),
      Array.tabulate(8)(i => if (i % 2 == 0) 5.0 else -5.0))
    val rows = (0 until 300).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + rnd.nextGaussian()).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 9)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exhaustive = Similarity.ivfTopK(df, queries, "vec_id", "embedding", 5,
      numCentroids = 6, nprobe = 6, trainRows = 300)
      .select("query_id", "rank", "neighbor_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(exhaustive == exact)
    // nprobe=2 of 6: same-cluster neighbors live in the probed lists
    val partial = Similarity.ivfTopK(df, queries, "vec_id", "embedding", 5,
      numCentroids = 6, nprobe = 2, trainRows = 300)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = exact.map { case (q, _, n) => (q, n) }
    val recall = partial.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("duplicate clusters: transitive chains collapse to the min-id representative") {
    // components: {1,2,3,4} via chain edges, {10,11}; 99 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(clusters.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L)))
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (10L, "e"), (11L, "f"), (99L, "g"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupByClusters(docs, "doc_id", Dedup.duplicateClusters(pairs))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 10L, 99L))
  }

  test("duplicateClusters runs one job per iteration (observed convergence)") {
    // a 4-node chain needs 2 propagation rounds to converge (labels settle
    // after round 1, round 2 observes zero changes). Jobs per iteration must
    // be exactly ONE (the checkpoint job with the piggybacked Observation) —
    // the separate isEmpty action it replaced made it two (VERDICT r14 #6).
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    // count ACTIONS (SQL executions), not scheduler jobs — AQE splits one
    // action into a job per stage, so the job count is not a stable pin
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = { actions.incrementAndGet(); () }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val clusters = Dedup.duplicateClusters(pairs).as[(Long, Long)].collect().sortBy(_._1)
      assert(clusters.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
      Thread.sleep(500) // QueryExecutionListener delivery is async
      // fixed-shape pin: 2 setup checkpoints (edges, initial labels) + N
      // iterations x 1 checkpoint action + the final collect = 2 + N + 1.
      // The 4-chain converges in <= 3 rounds. With the replaced per-
      // iteration isEmpty probe this count was 2 + 2N + 1 (>= 9).
      val n = actions.get()
      assert(n <= 2 + 3 + 1,
        s"expected one action per iteration (<= 6 total for this fixture), got $n")
    } finally spark.listenerManager.unregister(listener)
  }

  test("duplicateSpans finds maximal corpus-duplicated substrings, word-aligned") {
    // shared 5-word boilerplate "one two three four five" planted mid-doc;
    // window=3 -> duplicated windows at the 3 fully-planted positions, merged
    val docs = Seq(
      (1L, "alpha beta one two three four five gamma delta epsilon"),
      (2L, "zeta eta theta one two three four five iota"),
      (3L, "totally unrelated words in this document here")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", windowWords = 3)
      .as[(Long, Int, Int)].collect().sortBy(s => (s._1, s._2)).toList
    // doc 1: planted words at positions 3..7; doc 2: positions 4..8
    assert(spans == List((1L, 3, 7), (2L, 4, 8)))
    // within-doc repetition also counts toward corpus multiplicity
    val selfDup = Seq((1L, "x y z pad pad x y z")).toDF("doc_id", "text")
    val s2 = Dedup.duplicateSpans(selfDup, "doc_id", "text", windowWords = 3)
      .as[(Long, Int, Int)].collect().toList
    assert(s2 == List((1L, 1, 3), (1L, 6, 8)))
  }

  test("removeDuplicateSpans cuts duplicated spans, untouched docs round-trip") {
    val docs = Seq(
      (1L, "alpha beta one two three four five gamma delta epsilon"),
      (2L, "zeta eta theta one two three four five iota"),
      (3L, "totally unrelated words in this document here")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text", windowWords = 3)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha beta gamma delta epsilon")
    assert(out(2L) == "zeta eta theta iota")
    assert(out(3L) == "totally unrelated words in this document here")
  }

  test("nearDupPairsAgainstReference: cross-side pairs only, null-safe, drop keeps novel docs") {
    val today = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // 2 and 3 are near-dups of EACH OTHER but of nothing in ref: an
      // in-corpus LSH would pair them; the cross-snapshot op must not
      (2L, "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (3L, "lambda mu nu xi omicron pi rho sigma tau phi"),
      (4L, null.asInstanceOf[String]),
      (5L, "a completely unrelated fresh document about something else")
    ).toDF("doc_id", "text")
    val ref = Seq(
      // 80%-truncated rewrite of doc 1 (8 of 10 tokens -> jaccard 6/8 = 0.75
      // at 3-shingles... use 9 tokens: 7/8 = 0.875 >= 0.8)
      (900L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (901L, "reference only content never seen today at all")
    ).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairsAgainstReference(today, "doc_id", "text",
      ref, "doc_id", "text", shingleSize = 3, numHashes = 128, bands = 32,
      threshold = 0.8)
    val got = pairs.select("id", "ref_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 900L)))
    // jaccard is the exact shingle-set value: doc1 has 8 3-shingles, the
    // truncated ref doc has 7, all shared -> 7/8
    val j = pairs.select("jaccard").as[Double].collect()
    assert(j.length == 1 && math.abs(j(0) - 0.875) < 1e-12)
    val kept = Dedup.dropNearDupsAgainstReference(today, "doc_id", "text",
      ref, "doc_id", "text", shingleSize = 3, numHashes = 128, bands = 32,
      threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L, 5L))
  }

  test("dedupByClustersKeepBest keeps the highest-quality member per component") {
    val docs = Seq(
      (1L, "a", 5.0), (2L, "b", 9.0), (3L, "c", 9.0), // component {1,2,3}
      (4L, "solo", 1.0) // in no pair: survives regardless of score
    ).toDF("doc_id", "text", "q")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(pairs)
    val out = Dedup.dedupByClustersKeepBest(docs, "doc_id", col("q"), clusters)
      .select("doc_id").as[Long].collect().toSet
    // 2 and 3 tie on quality -> lowest id 2 wins; min-id policy would keep 1
    assert(out == Set(2L, 4L))
    val minId = Dedup.dedupByClusters(docs, "doc_id", clusters)
      .select("doc_id").as[Long].collect().toSet
    assert(minId == Set(1L, 4L))
  }

  test("dedupByClustersKeepBest: null quality never wins the keep rule") {
    // doc 1 has NULL quality (e.g. length(text) of a null text) — struct
    // ordering sorts null fields first, so without the coalesce guard the
    // null-quality doc would beat every scored member
    val docs = Seq(
      (1L, null.asInstanceOf[java.lang.Double]),
      (2L, java.lang.Double.valueOf(3.0)),
      (3L, java.lang.Double.valueOf(9.0))).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(pairs)
    val out = Dedup.dedupByClustersKeepBest(docs, "doc_id", col("q"), clusters)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(3L))
    // all-null cluster still keeps exactly one member (lowest id)
    val docs2 = Seq((1L, null.asInstanceOf[java.lang.Double]),
      (2L, null.asInstanceOf[java.lang.Double])).toDF("doc_id", "q")
    val out2 = Dedup.dedupByClustersKeepBest(docs2, "doc_id", col("q"),
      Dedup.duplicateClusters(Seq((1L, 2L)).toDF("id_a", "id_b")))
      .select("doc_id").as[Long].collect().toSet
    assert(out2 == Set(1L))
  }

  test("NearDupIndex: prebuilt-index probes equal the direct path") {
    val today = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "a completely unrelated fresh document about something else")
    ).toDF("doc_id", "text")
    val ref = Seq(
      (900L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (901L, "reference only content never seen today at all")
    ).toDF("doc_id", "text")
    val index = Dedup.buildNearDupIndex(ref, "doc_id", "text",
      shingleSize = 3, numHashes = 128, bands = 32)
    try {
      val direct = Dedup.nearDupPairsAgainstReference(today, "doc_id", "text",
        ref, "doc_id", "text", shingleSize = 3, numHashes = 128, bands = 32)
        .select("id", "ref_id").as[(Long, Long)].collect().toSet
      val viaIndex = Dedup.nearDupPairsAgainstIndex(today, "doc_id", "text", index)
        .select("id", "ref_id").as[(Long, Long)].collect().toSet
      assert(viaIndex == direct && viaIndex == Set((1L, 900L)))
      // a second probe reuses the same persisted index frames
      val kept = Dedup.dropNearDupsAgainstIndex(today, "doc_id", "text", index)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(2L))
    } finally {
      index.shingles.unpersist(); index.bandRows.unpersist(); ()
    }
  }

  test("dedupAgainstReference: exact anti semantics, nulls survive, bloom routes not decides") {
    val corpus = Seq(
      (1L, "already crawled yesterday"),
      (2L, "a brand new page"),
      (3L, "also crawled before"),
      (4L, null.asInstanceOf[String]),
      (5L, "another new one")
    ).toDF("doc_id", "text")
    val ref = Seq("already crawled yesterday", "also crawled before",
      "never seen in corpus", null.asInstanceOf[String])
      .toDF("old_text")
    val out = Dedup.dedupAgainstReference(corpus, col("text"), ref, col("old_text"))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(2L, 4L, 5L))
    // exact parity with the plain anti-join for ANY fpp (bloom only routes)
    val exact = corpus.join(ref.select(col("old_text")).distinct(),
      col("text") === col("old_text"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    val highFpp = Dedup.dedupAgainstReference(corpus, col("text"), ref,
      col("old_text"), fpp = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(highFpp == exact)
    // the keep branch is a row-local bloom filter (no join on that side):
    // the probe expression is in the plan (analyzed — ConvertToLocalRelation
    // folds filters over these in-memory fixtures before execution)
    assert(out.queryExecution.analyzed.toString().toLowerCase
      .contains("bloommightcontain"))
    intercept[IllegalArgumentException] {
      Dedup.dedupAgainstReference(corpus, col("text"), ref, col("old_text"), fpp = 1.5)
    }
  }
}
