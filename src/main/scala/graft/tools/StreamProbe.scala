package graft.tools

import graft.queries.QueryDefs
import graft.streaming.StreamChecks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for the pipe_streaming_neardup gate (the 3rd-slowest
  * single item in BENCH_r13): replicates the query's MemoryStream harness and
  * prints per-micro-batch `durationMs` breakdowns (queryPlanning, addBatch,
  * walCommit, stateStore commit ride inside addBatch) plus end-to-end
  * seconds, under parameterized state-partition counts — so the 15.8 s can
  * be attributed to micro-batch machinery vs compute before touching the
  * operator. Not part of the driver contract; run ad hoc:
  *   sbt "runMain graft.tools.StreamProbe [shufflePartitions ...]"
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val parts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(cpus.toInt)
    val ckRoot = sys.env.get("STREAMPROBE_CKPT") // e.g. /dev/shm/graft_ckpt

    // stage-level attribution: the progress durationMs lumps everything into
    // addBatch; this prints each stage's wall time + summed task time
    val stageLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; e <- si.completionTime } yield e - s).getOrElse(-1L)
        stageLines.add(f"    stage ${si.stageId}%4d tasks=${si.numTasks}%4d wall=${wall}ms " +
          f"taskTime=${si.taskMetrics.executorRunTime}ms " +
          f"cpu=${si.taskMetrics.executorCpuTime / 1000000}ms " +
          f"ser=${si.taskMetrics.resultSerializationTime}ms " +
          f"shW=${si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1024}KB")
      }
    })

    val docs = QueryDefs.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(23)),
          j => concat(lit("w"), pmod(col("doc_id") * 131 + j * j * 17, lit(9973)))))
          .as("text"))
      .as[(Long, String)].collect()
    val copies1 = docs.filter(_._1 % 10 == 1).map { case (id, tx) => (id + 200000L, tx) }
    val copies2 = docs.filter(_._1 % 20 == 7).map { case (id, tx) => (id + 300000L, tx) }
    val copies3 = docs.filter(_._1 % 20 == 7).map { case (id, tx) => (id + 400000L, tx) }
    println(s"docs=${docs.length} copies=${copies1.length + copies2.length + copies3.length}")

    def once(round: Int, nParts: Int): Unit = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", nParts.toString)
      val t0 = System.nanoTime()
      try {
        val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
        val banded = StreamChecks.bandDocuments(in.toDF().toDF("doc_id", "text"),
          "doc_id", "text", shingleSize = 3, numHashes = 64, bands = 16)
        val events = StreamChecks.nearDupEvents(banded, threshold = 1.0, maxDocsPerBucket = 64)
        val qname = s"probe_neardup_${round}_$nParts"
        val w0 = events.writeStream.format("memory").queryName(qname)
          .outputMode("append")
        val w = ckRoot.map(r => w0.option("checkpointLocation",
          s"$r/${qname}_${System.nanoTime()}")).getOrElse(w0)
        val q = w.start()
        try {
          val ts = System.nanoTime()
          in.addData(docs.filter(_._1 % 2 == 0).toIndexedSeq)
          q.processAllAvailable()
          val t1 = System.nanoTime()
          in.addData(docs.filter(_._1 % 2 == 1).toIndexedSeq)
          q.processAllAvailable()
          val t2 = System.nanoTime()
          in.addData((copies1 ++ copies2 ++ copies3).toIndexedSeq)
          q.processAllAvailable()
          val t3 = System.nanoTime()
          println(f"PROBE parts=$nParts round=$round start=${(ts - t0) / 1e9}%.2f " +
            f"b1=${(t1 - ts) / 1e9}%.2f b2=${(t2 - t1) / 1e9}%.2f b3=${(t3 - t2) / 1e9}%.2f")
          Thread.sleep(300)
          stageLines.forEach(l => println(l))
          stageLines.clear()
          q.recentProgress.foreach { p =>
            println(s"  batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
            p.stateOperators.foreach(so =>
              println(s"    state: commitMs=${so.commitTimeMs} rowsTotal=${so.numRowsTotal} " +
                s"mem=${so.memoryUsedBytes} custom=${so.customMetrics}"))
          }
          val n = spark.table(qname)
            .select(least(col("docId"), col("matchedDocId")).as("id_a"),
              greatest(col("docId"), col("matchedDocId")).as("id_b"))
            .distinct().count()
          println(f"  pairs=$n total=${(System.nanoTime() - t0) / 1e9}%.2f s")
        } finally q.stop()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    parts.foreach { p => once(1, p); once(2, p) }
    spark.stop()
  }
}
