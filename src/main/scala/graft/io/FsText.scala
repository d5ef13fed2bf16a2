package graft.io

import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets

/** Driver-side single-file text IO over Hadoop's FileSystem API, so model
  * and config documents live on whatever storage the cluster sees (file://,
  * hdfs://, s3a://, ...) instead of being limited to the driver's local disk.
  */
object FsText {

  def write(spark: SparkSession, location: String, content: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(location)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def read(spark: SparkSession, location: String): String = {
    val path = new org.apache.hadoop.fs.Path(location)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
    finally in.close()
  }

  def exists(spark: SparkSession, location: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(location)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  def delete(spark: SparkSession, location: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(location)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(path, false)
  }

  def list(spark: SparkSession, location: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(location)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq.map(_.getPath.toString)
  }
}
