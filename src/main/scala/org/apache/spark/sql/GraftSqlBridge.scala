package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column ↔ Expression converters
  * (Spark 4 made Column implementation-agnostic; classic-mode libraries
  * use this standard shim to expose custom Catalyst expressions as
  * Columns). Nothing else from the private API surface is touched.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a custom LogicalPlan (classic-mode `Dataset.ofRows`). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame. */
  def analyzed(df: DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  // ---- Arrow interop (graft.multimodal.ArrowInterop) -----------------
  // The same private[sql] converters Spark's own vectorized Python
  // runners (mapInPandas / mapInArrow) are built on: InternalRow
  // partitions ↔ serialized Arrow record batches.

  /** Executed (physical) rows of a DataFrame. */
  def internalRows(df: DataFrame): org.apache.spark.rdd.RDD[
      org.apache.spark.sql.catalyst.InternalRow] =
    df.queryExecution.toRdd

  /** DataFrame over physical rows (classic internalCreateDataFrame). */
  def fromInternalRows(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** Rows → serialized Arrow record batches (IPC message framing, no
    * stream header — schema travels out of band, as with Python
    * workers). Executor-side only (needs a TaskContext). */
  def toArrowBatches(rows: Iterator[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      maxRecordsPerBatch: Long, timeZoneId: String): Iterator[Array[Byte]] =
    execution.arrow.ArrowConverters.toBatchIterator(rows, schema,
      maxRecordsPerBatch, timeZoneId,
      true, false, org.apache.spark.TaskContext.get())

  /** Serialized Arrow record batches → rows. Executor-side only. */
  def fromArrowBatches(batches: Iterator[Array[Byte]],
      schema: org.apache.spark.sql.types.StructType,
      timeZoneId: String): Iterator[org.apache.spark.sql.catalyst.InternalRow] =
    execution.arrow.ArrowConverters.fromBatchIterator(batches, schema,
      timeZoneId, true, false, org.apache.spark.TaskContext.get())

  /** Spark schema → Arrow schema (for workers that parse the batches). */
  def arrowSchema(schema: org.apache.spark.sql.types.StructType,
      timeZoneId: String): org.apache.arrow.vector.types.pojo.Schema =
    util.ArrowUtils.toArrowSchema(schema, timeZoneId,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)
}
