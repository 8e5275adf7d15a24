package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.resource.{ExecutorResourceRequests, ResourceProfile, ResourceProfileBuilder, TaskResourceRequests}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.ArrowBridge
import org.apache.spark.sql.types.StructType

/** The physically-real `map_gpu` stage (`edsnlp/core/stream.py:617-673`):
  * rows cross into the model runtime as ARROW RECORD BATCHES (the same
  * interchange PySpark's `mapInArrow` uses) and the stage's RDD carries a
  * GPU [[ResourceProfile]], so on a GPU cluster (standalone/YARN/K8s with
  * dynamic allocation) Spark schedules exactly this stage — and only this
  * stage — onto GPU executors. `local[*]` has no custom-profile
  * scheduling, so tests assert the profile on the lineage and execute the
  * unpinned path; the forward function stays injected (this container
  * ships no torch/GPU), which is the TorchComponent contract: prepare /
  * collate happen Spark-side, forward is a batch-in/batch-out black box.
  *
  * Design for 100 TB: one partition = one stream of bounded Arrow batches
  * (`maxRecordsPerBatch` rows), so device memory holds one batch at a
  * time per task; no driver round-trip, no shuffle — the stage is a
  * narrow map over whatever partitioning the upstream plan produced.
  */
object GpuStage {

  /** A 1-GPU-per-task profile (`spark.task.resource.gpu.amount` shape). */
  def gpuProfile(
      gpusPerExecutor: Int = 1, gpusPerTask: Double = 1.0)
      : ResourceProfile =
    new ResourceProfileBuilder()
      .require(new ExecutorResourceRequests().resource("gpu",
        gpusPerExecutor))
      .require(new TaskResourceRequests().resource("gpu", gpusPerTask))
      .build()

  /** Building block: the Arrow-batched, optionally profile-pinned RDD.
    * Exposed so the scheduling contract is assertable
    * (`rdd.getResourceProfile`).
    */
  def arrowStageRdd(
      df: DataFrame,
      outSchema: StructType,
      maxRecordsPerBatch: Long,
      profile: Option[ResourceProfile])(
      fn: Iterator[Array[Byte]] => Iterator[Array[Byte]])
      : RDD[InternalRow] = {
    val inSchema = df.schema
    val tz = ArrowBridge.sessionTimeZone(df)
    val mapped = ArrowBridge.toRowRdd(df).mapPartitions { it =>
      val batches = ArrowBridge.toBatches(it, inSchema,
        maxRecordsPerBatch, tz)
      ArrowBridge.fromBatches(fn(batches), outSchema, tz)
    }
    profile.map(mapped.withResources).getOrElse(mapped)
  }

  /** `mapInArrow` for the JVM: run `fn` over the serialized Arrow record
    * batches of `df`'s partitions; `fn`'s output batches must conform to
    * `outSchema`.
    */
  def mapInArrow(
      df: DataFrame,
      outSchema: StructType,
      maxRecordsPerBatch: Long = 1024,
      profile: Option[ResourceProfile] = None)(
      fn: Iterator[Array[Byte]] => Iterator[Array[Byte]]): DataFrame =
    ArrowBridge.fromRowRdd(df,
      arrowStageRdd(df, outSchema, maxRecordsPerBatch, profile)(fn),
      outSchema)
}
