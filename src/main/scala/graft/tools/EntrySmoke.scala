package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: entry() on sf0.001, rows must be > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.SparkEntry.entry(spark).collect()
    rows.foreach(r => println(s"ENTRY ${r.getString(0)} -> ${r.getLong(1)}"))
    println(s"ENTRY_ROWS ${rows.length}")
    spark.stop()
  }
}
