package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media payloads are
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run as partition-local batch functions.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (byte-level features standing in for
  * pixel decoding) — the Spark-side plumbing (schema, batched
  * `mapPartitions`, partition sizing) is real and is what matters at scale:
  * payloads never pass through a shuffle; feature extraction is a narrow
  * map over whatever partitioning the source had, and downstream analytics
  * see only small fixed-width feature rows.
  */
object Multimodal {

  case class MediaMeta(
      format: String, width: Int, height: Int, durationMs: Long)

  case class MediaRow(
      media_id: Long, content: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      entropy: Double,     // byte-histogram entropy (stub for pixel stats)
      brightness: Double,  // mean byte value (stub)
      histogram: Seq[Long]) // 16-bucket byte histogram

  /** STUB decode: deterministic byte-level features in place of a codec.
    * Swap body for a real decoder when codecs are available; the signature
    * and batching are the production shape.
    */
  def decodeFeatures(content: Array[Byte]): (Double, Double, Array[Long]) = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < content.length) {
      val b = content(i) & 0xFF
      hist(b >> 4) += 1
      sum += b
      i += 1
    }
    val n = math.max(content.length, 1)
    var entropy = 0.0
    hist.foreach { h =>
      if (h > 0) {
        val p = h.toDouble / n
        entropy -= p * math.log(p) / math.log(2)
      }
    }
    (entropy, sum.toDouble / n, hist)
  }

  /** Partition-local feature extraction: one pass over payload bytes per
    * row, emitting fixed-width features. No shuffle; the heavy `content`
    * column is dropped as early as possible (column pruning downstream).
    */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // HALF_UP rounding matches Spark's round() and DuckDB's round()
      // (rint's half-even would diverge on exact .00005 boundaries)
      def r4(x: Double): Double =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      rows.map { r =>
        val (entropy, brightness, hist) = decodeFeatures(r.content)
        MediaFeatures(r.media_id, r.content.length.toLong,
          r4(entropy), r4(brightness), hist.toSeq)
      }
    }
  }

  /** Frame sampling stub for video-as-bytes: every `stride`-th fixed-size
    * block becomes a "frame" payload — 1→N explode done lazily per
    * partition so a 100 MB payload never materializes N copies up front.
    */
  def sampleFrames(
      ds: Dataset[MediaRow], frameBytes: Int, stride: Int)
      : Dataset[(Long, Int, Array[Byte])] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val n = r.content.length / frameBytes
      (0 until n by stride).iterator.map { f =>
        val from = f * frameBytes
        (r.media_id, f,
          java.util.Arrays.copyOfRange(r.content, from, from + frameBytes))
      }
    }
  }

  /** Resize stub: deterministic stride-downsample of the payload to a
    * target byte budget, standing in for a pixel resize — the payload
    * SHRINKS in place per partition (the property that matters: resize
    * before shuffle/collect so only the small form ever moves). Swap
    * the body for a codec-backed resample when codecs are available.
    */
  def resize(ds: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        if (r.content.length <= targetBytes) r
        else {
          val step = r.content.length.toDouble / targetBytes
          val out = new Array[Byte](targetBytes)
          var i = 0
          while (i < targetBytes) {
            out(i) = r.content((i * step).toInt)
            i += 1
          }
          // meta keeps its ORIGINAL semantics (pixel dims etc.); the
          // new payload size is observable from the content itself
          r.copy(content = out)
        }
      }
    }
  }

  /** aHash (average-hash) perceptual fingerprint of a binary payload —
    * the LAION-style image-dedup primitive on the declared stub
    * surface: the payload splits into `blocks` byte ranges and bit b
    * is set iff block b's mean byte value exceeds the whole payload's
    * mean. The comparison is INTEGER cross-multiplication
    * (`blockSum * nTotal > totalSum * blockLen`), so the fingerprint
    * is exact and an independent SQL oracle replays it bit-for-bit
    * (the q38 ASCII-payload convention). 60 bits by default — the
    * widest fingerprint whose bit-sum stays in a signed 64-bit int in
    * every engine (the q33 convention). Swap the byte reads for pixel
    * luma when codecs are available; the banding/join shape is the
    * production one.
    */
  def aHash(content: Array[Byte], blocks: Int = 60): Long = {
    val n = content.length
    if (n == 0) return 0L
    val bs = new Array[Long](blocks)
    val bn = new Array[Long](blocks)
    var total = 0L
    var j = 0
    while (j < n) {
      val v = content(j) & 0xFFL
      val b = ((j.toLong * blocks) / n).toInt
      bs(b) += v
      bn(b) += 1
      total += v
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < blocks) {
      if (bs(b) * n > total * bn(b)) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** Near-duplicate payload pairs at Hamming distance <= `radius` over
    * the [[aHash]] fingerprint — media dedup as a first-class corpus
    * operator: fingerprints are one row-local pass over the payload
    * (payloads never shuffle — only (id, fp) longs move), candidates
    * come from the shared pigeonhole band join
    * ([[graft.dedup.SimHash.pairsFromFingerprints]]), and the exact
    * Hamming check runs on the 8-byte fingerprints.
    */
  def mediaNearDuplicates(media: Dataset[MediaRow], radius: Int = 8,
      blocks: Int = 60): DataFrame = {
    val f = udf((c: Array[Byte]) => aHash(c, blocks))
    val fp = media.toDF()
      .select(col("media_id").as("id"), f(col("content")).as("fp"))
    graft.dedup.SimHash.pairsFromFingerprints(fp, radius, nbits = blocks)
  }

  /** Scene-change (shot-boundary) detection stub for video-as-bytes:
    * the payload's consecutive full `frameBytes` blocks are "frames",
    * each frame's byte-sum its brightness, and a CHANGE is a
    * consecutive-frame mean-brightness jump above `threshold` —
    * `|sum_f - sum_{f-1}| > threshold * frameBytes`, exact integer
    * arithmetic so an independent SQL engine replays every count from
    * ASCII payload chars (the q38/q106 convention). One fused row-local
    * pass: the payload never leaves its partition, no per-frame rows
    * materialize, only (id, n_frames, n_changes) ever moves. Swap the
    * byte sums for decoded luma when codecs are available; the
    * windowed-difference shape is the production one.
    */
  def sceneChanges(ds: Dataset[MediaRow], frameBytes: Int, threshold: Int)
      : Dataset[(Long, Int, Int)] = {
    import ds.sparkSession.implicits._
    ds.map { r =>
      val n = r.content.length / frameBytes
      var prev = 0L
      var changes = 0
      var f = 0
      while (f < n) {
        var s = 0L
        var i = f * frameBytes
        val end = i + frameBytes
        while (i < end) { s += r.content(i) & 0xFFL; i += 1 }
        if (f > 0 && math.abs(s - prev) > threshold.toLong * frameBytes)
          changes += 1
        prev = s
        f += 1
      }
      (r.media_id, n, changes)
    }
  }

  /** Build a synthetic media table from the documents corpus (text bytes as
    * payload) — exercises the exact schema/plumbing with deterministic
    * content.
    */
  def mediaFromDocuments(
      spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(lit("stub/text").as("format"), lit(0).as("width"),
        lit(0).as("height"), lit(0L).as("durationMs")).as("meta"))
      .as[MediaRow]
  }
}
