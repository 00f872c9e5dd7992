package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed by per-partition operators.
  *
  * The actual codecs (image decode, audio resample, video frame extraction)
  * are NOT available in this environment — the decode kernel is a clearly
  * marked STUB with a deterministic fake so the Spark-side plumbing
  * (schema, batch iteration, partition-local processing, metadata structs)
  * is real and tested. Swapping [[decodeStub]] for a JNI/FFI codec changes
  * no dataflow.
  *
  * Scale notes: blobs never shuffle — `decodeMeta` is mapPartitions over
  * the scan, metadata-only columns flow downstream. A real pipeline
  * would write decoded features back partitioned by (media_type, date).
  */
object Multimodal {

  case class MediaMeta(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** STUB decode kernel: real implementation would call an image/audio
    * codec here. The fake derives deterministic "dimensions" from blob
    * length and a simple byte checksum — enough to exercise the partition
    * iterator, the typed output schema and downstream aggregation. */
  private def decodeStub(docId: Long, mediaType: String, bytes: Array[Byte]): MediaMeta = {
    // ??? <- real codec goes here (e.g. via FFI); deterministic fake below
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum = (sum * 131 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    val len = bytes.length.toLong
    MediaMeta(docId, mediaType,
      byte_len = len,
      width = (len % 640).toInt + 1,
      height = (len % 480).toInt + 1,
      n_frames = if (mediaType == "video") (len % 24).toInt + 1 else 1,
      checksum = sum)
  }

  /** documents-as-blobs: models a `binary` media column (UTF-8 bytes of the
    * text stand in for real media payloads). */
  def asBlobs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("blob"))

  /** Partition-local decode: one iterator pass per partition, typed output.
    * (The Scala analog of a Pandas `mapInPandas` batch UDF.) */
  def decodeMeta(spark: SparkSession, blobs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs.select(col("doc_id"), col("media_type"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, mt, bytes) => decodeStub(id, mt, bytes) })
  }

  /** Frame sampling for video blobs: every `stride`-th frame index of the
    * stub-decoded frame count (explode → one row per sampled frame). */
  def sampleFrames(spark: SparkSession, meta: Dataset[MediaMeta], stride: Int): DataFrame = {
    meta.toDF()
      .filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"))
  }

  /** Aspect-preserving resize planning (column arithmetic over the decoded
    * metadata — a real resize kernel would consume this plan inside the
    * same partition-local pass as [[decodeMeta]]): fit (width, height)
    * into (maxW, maxH), never upscale. */
  def resizePlan(meta: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"), lit(1.0))
    meta
      .withColumn("scale", scale)
      .withColumn("out_w", greatest(lit(1), floor(col("width") * col("scale")))
        .cast("int"))
      .withColumn("out_h", greatest(lit(1), floor(col("height") * col("scale")))
        .cast("int"))
      .withColumn("downscaled", col("scale") < 1.0)
  }

  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      features: Array[Double], // normalized 8-bucket byte histogram
      entropy: Double)

  /** STUB feature extraction — the shape of an embedding/fingerprint
    * kernel over a binary column: one partition-local pass computing a
    * normalized 8-bucket byte histogram + its entropy. A real extractor
    * (CLIP embedding, mel spectrogram, ...) replaces the loop body; the
    * iterator/schema/partitioning contract is identical.
    *
    * Contract: features sum to 1 for non-empty blobs; an EMPTY blob yields
    * the all-zero vector with entropy 0 (there is no distribution to
    * normalize — fabricating a uniform one would be invented data). */
  def extractFeatures(spark: SparkSession, blobs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    blobs.select(col("doc_id"), col("media_type"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, mt, bytes) =>
        val counts = new Array[Double](8)
        var i = 0
        while (i < bytes.length) { counts((bytes(i) & 0xff) >> 5) += 1; i += 1 }
        val n = math.max(1, bytes.length).toDouble
        val feats = counts.map(_ / n)
        val entropy = -feats.filter(_ > 0).map(p => p * math.log(p)).sum
        MediaFeatures(id, mt, feats, entropy)
      })
  }
}
