package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level attribution for any declared query: runs
  * `SparkEntry.queries(name)` under the bench session config and prints each
  * stage's wall/task/cpu time, so a slow query-loop entry can be keyed to
  * its actual bottleneck (scan vs shuffle vs single-task stage vs driver
  * gap). Run: sbt "runMain graft.tools.QueryProbe <query> [query ...]"
  */
object QueryProbe {
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
    spark.sparkContext.setLogLevel("ERROR")

    val stageLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; e <- si.completionTime } yield e - s).getOrElse(-1L)
        stageLines.add(f"    stage ${si.stageId}%4d tasks=${si.numTasks}%4d wall=${wall}ms " +
          f"taskTime=${si.taskMetrics.executorRunTime}ms " +
          f"cpu=${si.taskMetrics.executorCpuTime / 1000000}ms " +
          f"shW=${si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1024}KB " +
          f"[${si.name.takeWhile(_ != '\n').take(60)}]")
      }
    })

    args.foreach { name =>
      // warmup (parquet footer cache, codegen) then two timed runs, matching
      // the bench's min-of-2 protocol
      spark.sparkContext.setJobDescription(s"probe:$name")
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      stageLines.clear()
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(f"QUERY $name run$r rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
        Thread.sleep(200)
        stageLines.forEach(l => println(l))
        stageLines.clear()
      }
    }
    spark.stop()
  }
}
