package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench protocol self-guard (VERDICT r6 "Next #1"): the sf0.1/10M suite
  * is only comparable under the default 8g heap; a small-scale run on an
  * oversized heap must be stamped as a protocol violation so a contaminated
  * BENCH record is machine-detectable.
  */
class BenchGuardSpec extends AnyFunSuite {
  private val GiB = 1024L * 1024L * 1024L

  test("10M rows on an 8g heap is clean") {
    assert(Bench.protocolViolation(10000000L, 8L * GiB).isEmpty)
  }

  test("10M rows on a 16g heap is still within the ceiling") {
    assert(Bench.protocolViolation(10000000L, 16L * GiB).isEmpty)
  }

  test("10M rows on a 90g heap is flagged (the r5/r6 driver-run trap)") {
    val v = Bench.protocolViolation(10000000L, 90L * GiB)
    assert(v.exists(_.startsWith("heap:")))
    assert(v.exists(_.contains("92160mb")))
  }

  test("100M rows on a 96g heap is the documented full-parity protocol") {
    assert(Bench.protocolViolation(100000000L, 96L * GiB).isEmpty)
  }

  test("disabled ref suites (rows=0) still guard the heap") {
    assert(Bench.protocolViolation(0L, 90L * GiB).nonEmpty)
  }

  test("violating run refuses unless explicitly acknowledged (r7 follow-up)") {
    val v = Bench.protocolViolation(10000000L, 90L * GiB)
    // unacknowledged -> refuse (main exits 2 before any artifact write)
    assert(Bench.shouldRefuse(v, acknowledged = false) == v)
    // acknowledged -> run proceeds, stamped
    assert(Bench.shouldRefuse(v, acknowledged = true).isEmpty)
    // clean run never refuses
    assert(Bench.shouldRefuse(None, acknowledged = false).isEmpty)
  }

  test("child JVM args drop the parent heap pin and agents, keep module opens") {
    val parent = Seq("-Xmx91g", "-Xms4g", "--add-opens",
      "java.base/java.lang=ALL-UNNAMED", "-agentlib:jdwp=x", "-javaagent:a.jar",
      "-Dspark.ui.enabled=false")
    val child = Bench.childJvmArgs(parent)
    assert(child.last == s"-Xmx${Bench.NormalizedHeap}")
    assert(child.contains("--add-opens") &&
      child.contains("java.base/java.lang=ALL-UNNAMED") &&
      child.contains("-Dspark.ui.enabled=false"))
    assert(!child.exists(a => a == "-Xmx91g" || a == "-Xms4g" ||
      a.startsWith("-agentlib") || a.startsWith("-javaagent")))
  }

  test("env-pinned heap (_JAVA_OPTIONS) is scrubbed before re-exec, child runs clean") {
    import scala.jdk.CollectionConverters._
    // the heap arrives via _JAVA_OPTIONS (applied AFTER command-line flags),
    // the way a driver environment can pin it: the parent violates, and the
    // child would too unless re-exec scrubs the env var
    val dir = java.nio.file.Files.createTempDirectory("graft_benchguard_env")
    val out = dir.resolve("stdout.txt").toFile
    val err = dir.resolve("stderr.txt").toFile
    try {
      val javaBin = new java.io.File(
        new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
      val baseArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq
        .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms") ||
          a.startsWith("-agentlib") || a.startsWith("-javaagent"))
      val cmd = Seq(javaBin) ++ baseArgs ++
        Seq("-cp", System.getProperty("java.class.path"), "graft.Bench")
      val pb = new ProcessBuilder(cmd.asJava)
      pb.directory(dir.toFile)
      pb.environment().put("_JAVA_OPTIONS", "-Xmx32g")
      pb.environment().put("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
      pb.environment().put("SPARK_GRAFT_BENCH_ROWS", "0")
      pb.environment().put("SPARK_GRAFT_BENCH_SUITES", "__no_such_suite__")
      pb.environment().put("SPARK_GRAFT_CPUS", "4")
      pb.redirectOutput(out)
      pb.redirectError(err)
      val proc = pb.start()
      assert(proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
        { proc.destroyForcibly(); "bench child timed out" })
      val stderrTxt = new String(java.nio.file.Files.readAllBytes(err.toPath))
      assert(proc.exitValue() == 0, s"exit ${proc.exitValue()}\n$stderrTxt")
      assert(stderrTxt.contains("re-executing in a child JVM pinned to -Xmx8g"), stderrTxt)
      assert(!stderrTxt.contains("already re-execed once"), stderrTxt)
      val art = new String(java.nio.file.Files.readAllBytes(dir.resolve("bench_out.json")))
      val heapMb = """"heapMaxMb":(\d+)""".r.findFirstMatchIn(art).map(_.group(1).toLong)
      assert(heapMb.exists(h => h > 4000 && h <= 16384), s"stamp heap $heapMb")
      assert(!art.contains("protocol_violation"), art)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      ()
    }
  }

  test("big-heap parent self-normalizes: re-exec yields a parsed, 8g-stamped record (r8 follow-up)") {
    import scala.jdk.CollectionConverters._
    // Spawn the REAL graft.Bench at -Xmx32g (violating); it must re-exec
    // itself at the protocol heap and produce a clean artifact + contract
    // line. Suite filter matches nothing and ref rows are disabled, so the
    // child only starts a session, warms the sf0.001 tables, and reports.
    val dir = java.nio.file.Files.createTempDirectory("graft_benchguard")
    val out = dir.resolve("stdout.txt").toFile
    val err = dir.resolve("stderr.txt").toFile
    try {
      val javaBin = new java.io.File(
        new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
      val baseArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq
        .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms") ||
          a.startsWith("-agentlib") || a.startsWith("-javaagent"))
      val cmd = Seq(javaBin) ++ baseArgs ++ Seq("-Xmx32g",
        "-cp", System.getProperty("java.class.path"), "graft.Bench")
      val pb = new ProcessBuilder(cmd.asJava)
      pb.directory(dir.toFile) // artifacts land here, NOT in the repo
      pb.environment().put("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
      pb.environment().put("SPARK_GRAFT_BENCH_ROWS", "0") // still guards heap
      pb.environment().put("SPARK_GRAFT_BENCH_SUITES", "__no_such_suite__")
      pb.environment().put("SPARK_GRAFT_CPUS", "4")
      pb.redirectOutput(out)
      pb.redirectError(err)
      val proc = pb.start()
      assert(proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
        { proc.destroyForcibly(); "bench child timed out" })
      val stderrTxt = new String(java.nio.file.Files.readAllBytes(err.toPath))
      assert(proc.exitValue() == 0, s"exit ${proc.exitValue()}\n$stderrTxt")
      assert(stderrTxt.contains("re-executing in a child JVM pinned to -Xmx8g"), stderrTxt)
      // contract line: last stdout line is the JSON record, no violation stamp
      val lines = scala.io.Source.fromFile(out).getLines().toSeq
      val contract = lines.last
      assert(contract.startsWith("""{"metric":"total""""), contract)
      assert(!contract.contains("protocol_violation"), contract)
      // artifact: written by the pinned grandchild, stamped under the ceiling
      val art = new String(java.nio.file.Files.readAllBytes(
        dir.resolve("bench_out.json")))
      val heapMb = """"heapMaxMb":(\d+)""".r.findFirstMatchIn(art)
        .map(_.group(1).toLong)
      assert(heapMb.exists(h => h > 4000 && h <= 16384), s"stamp heap $heapMb\n$art")
      assert(!art.contains("protocol_violation"), art)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      ()
    }
  }
}
