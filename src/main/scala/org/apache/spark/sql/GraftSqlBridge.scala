package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.StructType

/** Bridge into the `private[sql]` Column↔Expression converters so graft's
  * native Catalyst expressions can be exposed as `Column`s (the same
  * mechanism `org.apache.spark.sql.functions` uses internally), plus the
  * InternalRow-level DataFrame constructors for operators that must append
  * computed fields without a Row-boxing round trip. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The physical (InternalRow) RDD of a DataFrame. */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.queryExecution.toRdd

  /** Build a DataFrame over an InternalRow RDD without Row conversion. */
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
