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
  * analogue of the batched pandas-UDF pattern. Codecs plug in behind
  * [[MediaCodec]]: [[ImageIoCodec]] REALLY decodes PNG/JPEG/BMP via the
  * JDK's built-in javax.imageio (no external jars needed);
  * [[StubCodec]] remains the clearly-marked deterministic stand-in for
  * modalities whose libraries are not in this environment (video/audio).
  */
object Multimodal {

  /** Pluggable per-item media kernel. Implementations must be
    * deterministic (the oracle gates depend on it) and cheap to ship in
    * a task closure (objects/case objects). */
  trait MediaCodec extends Serializable {
    def features(bytes: Array[Byte], dim: Int): Array[Float]
    def sampleFrames(bytes: Array[Byte], n: Int): Array[Long]
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
    /** Decoded (width, height) when the payload is a decodable image. */
    def dimensions(bytes: Array[Byte]): Option[(Int, Int)] = None
  }

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
    * the bytes (content-addressed, so tests are exact). Kept for
    * modalities without an in-JVM decoder (video/audio); images have the
    * real [[ImageIoCodec]].
    */
  object StubCodec extends MediaCodec {
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

  /** REAL image codec over the JDK's built-in `javax.imageio`
    * (PNG/JPEG/BMP/GIF — no external jars): decode, nearest-neighbor
    * resize with exact integer source mapping (floor(x*srcW/dstW), so an
    * external engine can reproduce the pixel arithmetic), luminance
    * band-mean features, PNG re-encode. Payloads that do not decode as
    * images (video containers, audio, junk) fall back to [[StubCodec]] —
    * the operator keeps its batched shape either way.
    */
  object ImageIoCodec extends MediaCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    private def decode(bytes: Array[Byte]): Option[BufferedImage] =
      if (bytes == null || bytes.isEmpty) None
      else Option(
        try ImageIO.read(new ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null })

    /** Luminance at (x, y): the raw sample for single-band (gray)
      * rasters, integer mean of R,G,B otherwise — pure integer math. */
    private def gray(im: BufferedImage, x: Int, y: Int): Int =
      if (im.getRaster.getNumBands == 1) im.getRaster.getSample(x, y, 0)
      else {
        val rgb = im.getRGB(x, y)
        (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
      }

    override def dimensions(bytes: Array[Byte]): Option[(Int, Int)] =
      decode(bytes).map(im => (im.getWidth, im.getHeight))

    /** (width, height, mean luminance) of a decoded image — the
      * roundtrip stats the oracle gates recompute from pixel formulas. */
    def stats(bytes: Array[Byte]): Option[(Int, Int, Double)] =
      decode(bytes).map { im =>
        var sum = 0L
        var y = 0
        while (y < im.getHeight) {
          var x = 0
          while (x < im.getWidth) { sum += gray(im, x, y); x += 1 }
          y += 1
        }
        (im.getWidth, im.getHeight,
          sum.toDouble / (im.getWidth.toLong * im.getHeight))
      }

    /** dim horizontal-band luminance means: band j covers rows
      * [j*h/dim, (j+1)*h/dim) — integer sums, one double division,
      * float rounding last (reproducible in SQL). */
    def features(bytes: Array[Byte], dim: Int): Array[Float] =
      decode(bytes) match {
        case None => StubCodec.features(bytes, dim)
        case Some(im) =>
          val w = im.getWidth
          val h = im.getHeight
          Array.tabulate(dim) { j =>
            val y0 = (j.toLong * h / dim).toInt
            val y1 = ((j + 1).toLong * h / dim).toInt
            var sum = 0L
            var cnt = 0L
            var y = y0
            while (y < y1) {
              var x = 0
              while (x < w) { sum += gray(im, x, y); cnt += 1; x += 1 }
              y += 1
            }
            if (cnt == 0) 0f else (sum.toDouble / cnt).toFloat
          }
      }

    /** Still images have no frames to sample. */
    def sampleFrames(bytes: Array[Byte], n: Int): Array[Long] =
      StubCodec.sampleFrames(bytes, n)

    /** 64-bit dHash (difference hash) perceptual fingerprint: decode ->
      * gray -> nearest-neighbor 9x8 downsample (same integer source
      * mapping as [[resize]]: src x = floor(x*srcW/9), src y =
      * floor(y*srcH/8)) -> gradient bits. Bit (y*8+x) is set iff
      * g(x+1, y) > g(x, y). Near-identical images (re-encodes, small
      * edits, watermarks) differ in a few bits; unrelated images differ
      * in ~32. None when the payload does not decode as an image.
      */
    def dHash(bytes: Array[Byte]): Option[Long] =
      decode(bytes).map { im =>
        val g = Array.tabulate(8, 9) { (y, x) =>
          gray(im, (x.toLong * im.getWidth / 9).toInt,
            (y.toLong * im.getHeight / 8).toInt)
        }
        var h = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (g(y)(x + 1) > g(y)(x)) h |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        h
      }

    /** Nearest-neighbor resize to (w, h), single-channel PNG out:
      * dst(x, y) = luminance(src(floor(x*srcW/w), floor(y*srcH/h))). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      decode(bytes) match {
        case None => StubCodec.resize(bytes, w, h)
        case Some(im) =>
          val out = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
          val raster = out.getRaster
          var y = 0
          while (y < h) {
            val sy = (y.toLong * im.getHeight / h).toInt
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0,
                gray(im, (x.toLong * im.getWidth / w).toInt, sy))
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          bos.toByteArray
      }
  }

  /** Deterministic grayscale PNG: pixel(x, y) = (7x + 13y + 31*id) mod
    * 256 — a REAL encoded image whose decoded content is pure integer
    * arithmetic, so decode-path gates have an exact SQL oracle. */
  def syntheticGrayPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = im.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((7L * x + 13L * y + 31L * id) % 256L).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** Cell value of the dup-family fixture pattern at cell (cx, cy) for
    * image `id`: family f = id/4 draws a pseudo-varied base raster, and
    * variant v = id%4 >= 1 perturbs ONE cell (row 0, column v-1) by +128
    * — so the four images of a family are near-identical (each perturbed
    * cell moves at most 2 dHash gradient bits) while different families
    * fingerprint independently. Pure integer arithmetic; the v04 oracle
    * recomputes it verbatim in SQL.
    */
  private[graft] def cellVal(cx: Long, cy: Long, id: Long): Int = {
    val f = id / 4
    val v = id % 4
    val base = (cx * 31 + cy * 17 + f * 97 + cx * cy * ((f % 7) + 1)) % 256
    (if (v >= 1 && cy == 0 && cx == v - 1) (base + 128) % 256 else base).toInt
  }

  /** Deterministic grayscale PNG with 4x4-pixel constant cells following
    * [[cellVal]]: pixel(sx, sy) = cellVal(sx/4, sy/4, id). A 36x32 image
    * has a 9x8 cell grid, and the dHash 9x8 downsample lands exactly on
    * cell corners (floor(x*36/9) = 4x), so the fingerprint is integer-
    * reproducible from the cell formula alone. */
  def syntheticCellPng(id: Long, w: Int, h: Int, cell: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = im.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, cellVal(x / cell, y / cell, id))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** Dup-family image fixtures in the media schema: one [[syntheticCellPng]]
    * per id row (every 4 consecutive ids form a near-identical family). */
  def syntheticCellImages(ids: DataFrame, idCol: String,
                          w: Int = 36, h: Int = 32, cell: Int = 4): DataFrame =
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, "image", syntheticCellPng(id, w, h, cell),
            Row("png", w, h, null))
        }
      }(Encoders.row(mediaSchema))

  /** dHash fingerprints of an image column: (media_id, fp) via the
    * batched mapPartitions path; rows whose payload does not decode are
    * dropped (no fingerprint to compare). Feed the result to
    * [[graft.operators.Dedup.fingerprintDedup]] for perceptual
    * near-duplicate removal — the image analogue of text SimHash.
    */
  val dHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("fp", LongType)))

  def dHashFingerprints(media: DataFrame): DataFrame =
    media.select("media_id", "bytes").mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes =
          Option(r.get(1)).map(_.asInstanceOf[Array[Byte]]).getOrElse(Array.empty)
        ImageIoCodec.dHash(bytes).map(fp => Row(r.getLong(0), fp))
      }
    }(Encoders.row(dHashSchema))

  /** Image-fixture table in the media schema: one PNG per id row. */
  def syntheticImages(ids: DataFrame, idCol: String,
                      w: Int, h: Int): DataFrame =
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, "image", syntheticGrayPng(id, w, h),
            Row("png", w, h, null))
        }
      }(Encoders.row(mediaSchema))

  /** Decoded roundtrip stats of an image column: (media_id, width,
    * height, mean_gray) — nulls when the payload is not a decodable
    * image. The gate shape proving bytes really decode. */
  val decodedStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_gray", DoubleType)))

  def decodedStats(media: DataFrame): DataFrame =
    media.select("media_id", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val bytes =
          Option(r.get(1)).map(_.asInstanceOf[Array[Byte]]).getOrElse(Array.empty)
        ImageIoCodec.stats(bytes) match {
          case Some((w, h, mean)) => Row(r.getLong(0), w, h, mean)
          case None => Row(r.getLong(0), null, null, null)
        }
      }
    }(Encoders.row(decodedStatsSchema))

  /** Batched feature extraction over the binary column. One initializer
    * per PARTITION (not per row) — where a real codec would load its
    * model once per task.
    */
  def extractFeatures(media: DataFrame, dim: Int = 64,
                      codec: MediaCodec = StubCodec): DataFrame = {
    // positional access after an explicit select: upstream rows from a
    // user mapPartitions stage carry no field-name schema when pipelined
    media.select("media_id", "modality", "bytes").mapPartitions { rows =>
      // per-partition init happens here (codec/model load in real impl)
      rows.map { r =>
        val bytes =
          Option(r.get(2)).map(_.asInstanceOf[Array[Byte]]).getOrElse(Array.empty)
        Row(r.getLong(0), r.getString(1),
          bytes.length.toLong, codec.features(bytes, dim).toSeq)
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
          val bytes =
            Option(r.get(1)).map(_.asInstanceOf[Array[Byte]]).getOrElse(Array.empty)
          StubCodec.sampleFrames(bytes, n).zipWithIndex.map {
            case (off, i) => Row(r.getLong(0), i, off)
          }
        }
      }(Encoders.row(frameSchema))
  }

  /** Resize image/video media to (w, h): same media schema out, bytes
    * re-encoded (STUB), metadata width/height updated — the standard
    * normalize-resolution step before batching into a training set.
    * Audio rows pass through untouched.
    */
  def resize(media: DataFrame, w: Int, h: Int,
             codec: MediaCodec = StubCodec): DataFrame = {
    media.select("media_id", "modality", "bytes", "meta").mapPartitions { rows =>
      // per-partition init point for a real codec
      rows.map { r =>
        val modality = r.getString(1)
        val meta = if (r.isNullAt(3)) null else r.getStruct(3)
        if (modality == "audio") r
        else {
          val bytes =
            Option(r.get(2)).map(_.asInstanceOf[Array[Byte]]).getOrElse(Array.empty)
          Row(r.getLong(0), modality,
            codec.resize(bytes, w, h),
            Row(if (meta == null) null else meta.get(0), // format
              w, h,
              if (meta == null) null else meta.get(3))) // duration_ms
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
