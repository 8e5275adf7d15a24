package org.apache.spark.sql.graftbridge

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.types.StructType

/** Arrow interchange for JVM stages — the Scala counterpart of PySpark's
  * `DataFrame.mapInArrow` plumbing, which routes through the same
  * `private[sql]` `ArrowConverters` (`sql/core/.../arrow/ArrowConverters
  * .scala`). Exposed from inside the sql package like [[Bridge]].
  *
  * Batches are the Arrow IPC record-batch wire format (`Array[Byte]`), so
  * a model runtime (ONNX Runtime Java, Triton client, TorchServe) can
  * consume them zero-copy-ish without Spark on the other side.
  */
object ArrowBridge {

  /** Serialize internal rows to Arrow record batches, `maxRecords` rows
    * per batch.
    */
  def toBatches(
      rows: Iterator[InternalRow], schema: StructType,
      maxRecords: Long, timeZoneId: String): Iterator[Array[Byte]] =
    ArrowConverters.toBatchIterator(rows, schema, maxRecords, timeZoneId,
      true, false, TaskContext.get())

  /** Deserialize Arrow record batches back to internal rows. */
  def fromBatches(
      batches: Iterator[Array[Byte]], schema: StructType,
      timeZoneId: String): Iterator[InternalRow] =
    ArrowConverters.fromBatchIterator(batches, schema, timeZoneId,
      true, false, TaskContext.get())

  /** The session-configured time zone (Arrow timestamps need it). */
  def sessionTimeZone(df: DataFrame): String =
    df.sparkSession.sessionState.conf.sessionLocalTimeZone

  /** Physical row RDD of a DataFrame (post-optimization). */
  def toRowRdd(df: DataFrame): RDD[InternalRow] =
    df.queryExecution.toRdd

  /** Wrap an internal-row RDD back into a DataFrame. */
  def fromRowRdd(
      df: DataFrame, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
