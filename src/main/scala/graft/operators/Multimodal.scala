package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines at 100 TB.
  *
  * Design: media is an opaque `binary` column plus a typed metadata
  * struct; heavy per-item work (decode, feature extraction, frame
  * sampling) runs inside `mapPartitions` so each task amortizes
  * library/model initialization over its whole partition — the Scala
  * analogue of the batched pandas-UDF pattern. The Spark-side plumbing
  * (schemas, partitioning, batch shape) is real; the codec itself is a
  * clearly-marked deterministic STUB because media libraries are not in
  * this environment — swap `StubCodec` for a real decoder without
  * touching any operator.
  */
object Multimodal {

  /** Canonical media schema: join-key id, modality tag, raw bytes,
    * typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Output schema of [[extractFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** STUB decode: a real implementation would decode the media and run a
    * feature extractor; this derives a deterministic pseudo-feature from
    * the bytes (content-addressed, so tests are exact). Marked clearly:
    * replace this object to integrate a real codec.
    */
  object StubCodec {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      // splitmix over byte prefix: deterministic, content-sensitive
      var h = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < bytes.length) { h = (h ^ bytes(i)) * 0xBF58476D1CE4E5B9L; i += 1 }
      val out = new Array[Float](dim)
      var j = 0
      var z = h
      while (j < dim) {
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        out(j) = ((z >>> 11).toDouble / (1L << 52).toDouble).toFloat
        j += 1
      }
      out
    }

    /** STUB frame sampling: returns `n` byte-offset "frames"; a real
      * implementation returns decoded frame images. */
    def sampleFrames(bytes: Array[Byte], n: Int): Array[Long] =
      Array.tabulate(n)(i =>
        if (bytes.isEmpty) 0L else (i.toLong * bytes.length) / n)

    /** STUB resize: a real implementation decodes, scales to (w, h) and
      * re-encodes; this derives deterministic placeholder bytes sized
      * proportionally to the target area so downstream byte-accounting
      * is exercised. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val n = math.max(1, math.min(bytes.length, (w.toLong * h / 64).toInt))
      java.util.Arrays.copyOf(bytes, n)
    }
  }

  /** Batched feature extraction over the binary column. One initializer
    * per PARTITION (not per row) — where a real codec would load its
    * model once per task.
    */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    media.select("media_id", "modality", "bytes").mapPartitions { rows =>
      // per-partition init happens here (codec/model load in real impl)
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]]("bytes")).getOrElse(Array.empty)
        Row(r.getAs[Long]("media_id"), r.getAs[String]("modality"),
          bytes.length.toLong, StubCodec.features(bytes, dim).toSeq)
      }
    }(Encoders.row(featureSchema))
  }

  /** Frame sampling for video rows: explodes each video into `n` frame
    * records keyed (media_id, frame_no) — the fan-out shape a real
    * pipeline uses before per-frame featurization.
    */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("frame_offset", LongType)))

  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    media.filter(col("modality") === "video")
      .select("media_id", "bytes").mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = Option(r.getAs[Array[Byte]]("bytes")).getOrElse(Array.empty)
          StubCodec.sampleFrames(bytes, n).zipWithIndex.map {
            case (off, i) => Row(r.getAs[Long]("media_id"), i, off)
          }
        }
      }(Encoders.row(frameSchema))
  }

  /** Resize image/video media to (w, h): same media schema out, bytes
    * re-encoded (STUB), metadata width/height updated — the standard
    * normalize-resolution step before batching into a training set.
    * Audio rows pass through untouched.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    media.mapPartitions { rows =>
      // per-partition init point for a real codec
      rows.map { r =>
        val modality = r.getAs[String]("modality")
        val meta = r.getAs[Row]("meta")
        if (modality == "audio") r
        else {
          val bytes = Option(r.getAs[Array[Byte]]("bytes")).getOrElse(Array.empty)
          Row(r.getAs[Long]("media_id"), modality,
            StubCodec.resize(bytes, w, h),
            Row(if (meta == null) null else meta.getAs[String]("format"),
              w, h,
              if (meta == null) null else meta.getAs[java.lang.Long]("duration_ms")))
        }
      }
    }(Encoders.row(mediaSchema))
  }

  /** Wrap arbitrary rows with binary payloads into the media schema —
    * the ingestion adapter (e.g. from `spark.read.format("binaryFile")`).
    */
  def fromBinaryFiles(df: DataFrame, modality: String): DataFrame =
    df.select(
      xxhash64(col("path")).as("media_id"),
      lit(modality).as("modality"),
      col("content").as("bytes"),
      struct(
        regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1).as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))
}
