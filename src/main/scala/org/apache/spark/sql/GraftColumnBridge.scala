package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's package-private Column <-> Expression conversion
  * (org.apache.spark.sql.classic.ExpressionUtils). Lives in the spark.sql
  * package solely to satisfy access control; no Spark internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** Bridge to Observation's package-private non-blocking read: `getOrEmpty`
  * returns the observed metrics row if the action's listener has delivered
  * it, else an empty map — the public `get` blocks forever if metrics never
  * land, which an engine loop must not risk.
  */
object GraftObservationBridge {
  def getOrEmpty(o: Observation): Map[String, Any] = o.getOrEmpty
}

/** Bridge to the package-private internalCreateDataFrame — lets partition-local
  * operators (e.g. multimodal decode) rebuild a DataFrame from an
  * RDD[InternalRow] without a Row conversion round-trip.
  */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession,
             rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
             schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
