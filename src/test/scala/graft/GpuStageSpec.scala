package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GpuStage

class GpuStageSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("mapInArrow: identity over Arrow batches round-trips rows") {
    val df = (0 until 100).map(i => (i.toLong, s"doc $i"))
      .toDF("id", "text").repartition(4)
    val out = GpuStage.mapInArrow(df, df.schema,
      maxRecordsPerBatch = 10)(identity)
    assert(out.schema === df.schema)
    val got = out.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === (0 until 100).map(i => (i.toLong, s"doc $i")).toSet)
  }

  test("mapInArrow: partitions stream as bounded Arrow batches") {
    val df = (0 until 100).map(i => (i.toLong, s"d$i"))
      .toDF("id", "text").coalesce(1)
    val counter = spark.sparkContext.longAccumulator("batches")
    val out = GpuStage.mapInArrow(df, df.schema,
      maxRecordsPerBatch = 10) { batches =>
      batches.map { b => counter.add(1L); b }
    }
    assert(out.count() === 100L)
    // 100 rows / 10-row batches in one partition: the forward fn saw 10
    // bounded device-sized batches, not one monolith
    assert(counter.value === 10L)
  }

  test("gpu stage registers the ResourceProfile with the scheduler") {
    val df = Seq((1L, "a")).toDF("id", "text")
    val profile = GpuStage.gpuProfile(gpusPerExecutor = 2,
      gpusPerTask = 0.5)
    assert(profile.executorResources("gpu").amount === 2)
    assert(profile.taskResources("gpu").amount === 0.5)
    // local mode has no custom-profile scheduling, so Spark rejects the
    // profile AT SCHEDULER REGISTRATION (ResourceProfileManager
    // .addResourceProfile via RDD.withResources) — which is exactly the
    // proof that the pinned path hands the profile to the scheduling
    // layer rather than carrying it as an inert field. On YARN/K8s/
    // standalone+dynamicAllocation the same call registers and the
    // stage schedules onto GPU executors.
    val thrown = intercept[org.apache.spark.SparkException] {
      GpuStage.arrowStageRdd(df, df.schema, 1024,
        Some(profile))(identity)
    }
    assert(thrown.getMessage.contains("ResourceProfiles are only supported"))
    // unpinned stage carries no profile (default-profile scheduling)
    val bare = GpuStage.arrowStageRdd(df, df.schema, 1024, None)(identity)
    assert(bare.getResourceProfile() === null)
  }
}
