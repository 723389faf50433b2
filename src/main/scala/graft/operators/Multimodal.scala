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
  * JDK's built-in javax.imageio, [[AudioWavCodec]] REALLY decodes
  * WAV/AIFF/AU PCM via javax.sound.sampled, and [[AviCodec]] REALLY
  * demuxes RIFF/AVI containers (no external jars needed anywhere);
  * [[StubCodec]] remains the clearly-marked deterministic stand-in for
  * the paths with no in-JDK decoder (compressed video/audio codecs).
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
    * modalities without an in-JVM decoder (video containers, compressed
    * audio); images have the real [[ImageIoCodec]] and PCM audio the
    * real [[AudioWavCodec]].
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

  /** REAL audio codec over the JDK's built-in `javax.sound.sampled`
    * (WAV/AIFF/AU containers, PCM payloads — no external jars): the
    * audio analogue of [[ImageIoCodec]]. Decodes the container for
    * real (RIFF header parse + frame extraction via AudioSystem),
    * yields signed 16-bit samples, and computes temporal-band
    * mean-absolute-amplitude features with the same integer-sums /
    * one-double-division / float-rounding-last discipline as the image
    * band means, so an external engine reproduces every value exactly.
    * Payloads that do not decode as audio fall back to [[StubCodec]].
    * Compressed codecs (MP3/AAC/Opus) have no in-JDK decoder and stay
    * env-blocked.
    */
  object AudioWavCodec extends MediaCodec {
    import javax.sound.sampled.AudioSystem

    /** Signed 16-bit mono samples of a decodable PCM payload. */
    def samples(bytes: Array[Byte]): Option[Array[Int]] =
      if (bytes == null || bytes.isEmpty) None
      else try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
        else {
          val raw = in.readAllBytes()
          val le = !fmt.isBigEndian
          val out = new Array[Int](raw.length / 2)
          var i = 0
          while (i < out.length) {
            val lo = raw(2 * i) & 0xFF
            val hi = raw(2 * i + 1) & 0xFF
            out(i) = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toInt
            i += 1
          }
          Some(out)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** (n_samples, sample_rate_hz, mean |amplitude|) — the decode-proof
      * stats triple (the audio twin of [[ImageIoCodec.stats]]). */
    def stats(bytes: Array[Byte]): Option[(Int, Int, Double)] =
      try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val rate = in.getFormat.getSampleRate.toInt
        samples(bytes).map { s =>
          var sum = 0L
          var i = 0
          while (i < s.length) { sum += math.abs(s(i)); i += 1 }
          (s.length, rate,
            if (s.isEmpty) 0.0 else sum.toDouble / s.length)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** dim temporal-band mean-absolute amplitudes: band j covers samples
      * [j*n/dim, (j+1)*n/dim) — integer |sample| sums, one double
      * division, float rounding last (the [[ImageIoCodec.features]]
      * discipline on the time axis). */
    def features(bytes: Array[Byte], dim: Int): Array[Float] =
      samples(bytes) match {
        case None => StubCodec.features(bytes, dim)
        case Some(s) =>
          val n = s.length
          Array.tabulate(dim) { j =>
            val i0 = (j.toLong * n / dim).toInt
            val i1 = ((j + 1).toLong * n / dim).toInt
            var sum = 0L
            var i = i0
            while (i < i1) { sum += math.abs(s(i)); i += 1 }
            if (i1 == i0) 0f else (sum.toDouble / (i1 - i0)).toFloat
          }
      }

    /** `n` evenly-spaced SAMPLE offsets (the audio frame-sampling
      * analogue: where a real pipeline would cut analysis windows). */
    def sampleFrames(bytes: Array[Byte], n: Int): Array[Long] =
      samples(bytes) match {
        case None => StubCodec.sampleFrames(bytes, n)
        case Some(s) => Array.tabulate(n)(i => (i.toLong * s.length) / n)
      }

    /** Nearest-neighbor resample to w*h samples at the source rate,
      * re-encoded as 16-bit mono little-endian WAV:
      * dst(i) = src(floor(i*n/target)) — the exact integer source
      * mapping of [[ImageIoCodec.resize]] on the time axis. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = w * h
      (samples(bytes), stats(bytes)) match {
        case (Some(s), Some((_, rate, _))) if s.nonEmpty && target > 0 =>
          val out = Array.tabulate(target)(i =>
            s((i.toLong * s.length / target).toInt))
          pcm16Wav(out, rate)
        case _ => StubCodec.resize(bytes, w, h)
      }
    }
  }

  /** REAL video container demux over hand-parsed RIFF/AVI (uncompressed
    * BI_RGB payloads — no codec needed, and none exists in the JDK):
    * the Spark-side half of video handling at 100 TB. Demuxing (walking
    * the container to cut frame payloads) is cheap integer parsing that
    * belongs in the batched executor pass; actual compressed-codec
    * decode stays behind the [[MediaCodec]] seam for an external
    * library. Frames come back as raw bottom-up BGR rows exactly as
    * stored, so frame statistics are pure integer arithmetic an oracle
    * reproduces.
    */
  object AviCodec {

    /** Parse an AVI container: (width, height, frame payloads in stream
      * order). Walks the RIFF LIST tree for real — `avih` for the
      * dimensions, `00db`/`00dc` chunks for the frames. None when the
      * payload is not a RIFF/AVI file.
      */
    def demux(bytes: Array[Byte]): Option[(Int, Int, Vector[Array[Byte]])] =
      try {
        val buf = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def fourcc(): String = {
          val a = new Array[Byte](4)
          buf.get(a)
          new String(a, "US-ASCII")
        }
        if (buf.remaining() < 12 || fourcc() != "RIFF") None
        else {
          buf.getInt // riff payload size
          if (fourcc() != "AVI ") None
          else {
            var w, h = 0
            var frames = Vector.empty[Array[Byte]]
            def walk(end: Int): Unit =
              while (buf.position() < end) {
                val id = fourcc()
                val sz = buf.getInt
                val next = buf.position() + sz + (sz & 1) // chunks pad to even
                if (id == "LIST") { fourcc(); walk(next) } // descend
                else {
                  if (id == "avih") { // MainAVIHeader: dwWidth @32, dwHeight @36
                    val base = buf.position()
                    w = buf.getInt(base + 32)
                    h = buf.getInt(base + 36)
                  } else if (id == "00db" || id == "00dc") {
                    val payload = new Array[Byte](sz)
                    buf.get(payload)
                    frames :+= payload
                  }
                  buf.position(next)
                }
              }
            walk(buf.limit())
            if (w > 0 && h > 0 && frames.nonEmpty) Some((w, h, frames)) else None
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Mean gray value of a raw bottom-up BGR frame (gray content stores
      * B = G = R, so the blue channel is the value): integer sum, one
      * double division. */
    def frameMeanGray(frame: Array[Byte], w: Int, h: Int): Double = {
      var sum = 0L
      var p = 0
      val n = w * h
      while (p < n) { sum += frame(3 * p) & 0xFF; p += 1 }
      if (n == 0) 0.0 else sum.toDouble / n
    }
  }

  /** Minimal RIFF/AVI container around uncompressed BI_RGB frames —
    * byte-deterministic, structurally valid (hdrl with avih/strl, movi
    * with 00db chunks), demuxable by [[AviCodec]] or any AVI reader.
    * `frames` are raw bottom-up BGR rows (w*3 bytes per row — callers
    * should keep w*3 a multiple of 4 to avoid row padding).
    */
  def bgrAvi(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int): Array[Byte] = {
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val b = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      b.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("US-ASCII")).putInt(4 + body.length)
        .put(kind.getBytes("US-ASCII")).put(body)
      b.array()
    }
    val frameBytes = w * h * 3
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(1000000 / fps).putInt(frameBytes * fps).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(frameBytes)
      .putInt(w).putInt(h).array()
    val strh = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes("US-ASCII")).put("DIB ".getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0).putInt(1).putInt(fps)
      .putInt(0).putInt(frames.length).putInt(frameBytes)
      .putInt(-1).putInt(0).putShort(0.toShort).putShort(0.toShort)
      .putShort(w.toShort).putShort(h.toShort).array()
    val strf = java.nio.ByteBuffer.allocate(40) // BITMAPINFOHEADER, BI_RGB
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(w).putInt(h).putShort(1.toShort).putShort(24.toShort)
      .putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00db", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }

  /** Deterministic gray test video: frame k pixel (x, y) =
    * (7x + 13y + 31*id + 17*k) mod 256 ([[syntheticGrayPng]]'s formula
    * plus a frame term), stored as raw bottom-up BGR. A REAL demuxable
    * AVI whose frame content is pure integer arithmetic. */
  def syntheticGrayAvi(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val frames = (0 until nFrames).map { k =>
      val f = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = ((7L * x + 13L * y + 31L * id + 17L * k) % 256L).toByte
          val p = 3 * ((h - 1 - y) * w + x) // bottom-up row order
          f(p) = g; f(p + 1) = g; f(p + 2) = g
          x += 1
        }
        y += 1
      }
      f
    }
    bgrAvi(frames, w, h, fps = 10)
  }

  /** Video-fixture table in the media schema: one gray AVI per id row. */
  def syntheticVideos(ids: DataFrame, idCol: String, w: Int = 16, h: Int = 12,
                      nFrames: Int = 8): DataFrame =
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, "video", syntheticGrayAvi(id, w, h, nFrames),
            Row("avi", w, h, nFrames * 100L))
        }
      }(Encoders.row(mediaSchema))

  /** REAL frame sampling: demux the container, keep `n` evenly-spaced
    * frames (index i -> source frame floor(i*nFrames/n)), return per-
    * frame decode-proof stats — the upgrade of [[sampleFrames]]'s stub
    * byte-offset path for demuxable containers. Rows that do not demux
    * are dropped.
    */
  val frameStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("frame_index", IntegerType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_gray", DoubleType)))

  def sampleFrameStats(media: DataFrame, n: Int): DataFrame =
    media.filter(col("modality") === "video")
      .select("media_id", "bytes").mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes =
            Option(r.get(1)).map(_.asInstanceOf[Array[Byte]]).getOrElse(Array.empty)
          AviCodec.demux(bytes).toSeq.flatMap { case (w, h, frames) =>
            (0 until n).map { i =>
              val k = ((i.toLong * frames.length) / n).toInt
              Row(r.getLong(0), i, k, w, h,
                AviCodec.frameMeanGray(frames(k), w, h))
            }
          }
        }
      }(Encoders.row(frameStatsSchema))

  /** Minimal RIFF/WAVE container around signed 16-bit mono little-endian
    * PCM — byte-deterministic (no encoder variance), decodable by any
    * WAV reader including the JDK's own. */
  def pcm16Wav(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(1.toShort) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2.toShort) // block align
      .putShort(16.toShort) // bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }

  /** Deterministic test tone: sample(t) = ((t*(id%7+3) + id*13) mod
    * 2001) - 1000 — a REAL encoded WAV whose decoded samples are pure
    * integer arithmetic, so audio decode-path gates have an exact SQL
    * oracle (the [[syntheticGrayPng]] pattern on the time axis). */
  def syntheticToneWav(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] =
    pcm16Wav(Array.tabulate(nSamples)(t =>
      (((t.toLong * (id % 7 + 3) + id * 13) % 2001L) - 1000L).toInt),
      sampleRate)

  /** Audio-fixture table in the media schema: one tone WAV per id row. */
  def syntheticAudio(ids: DataFrame, idCol: String,
                     nSamples: Int = 2048, sampleRate: Int = 8000): DataFrame =
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, "audio", syntheticToneWav(id, nSamples, sampleRate),
            Row("wav", null, null,
              nSamples.toLong * 1000L / sampleRate))
        }
      }(Encoders.row(mediaSchema))

  /** Decoded roundtrip stats of an audio column: (media_id, n_samples,
    * sample_rate, mean_abs) — the audio twin of [[decodedStats]]. */
  val audioStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_samples", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("mean_abs", DoubleType)))

  /** Nearest-neighbor resample of the audio rows to `targetSamples`
    * samples (re-encoded WAV; [[resize]] deliberately passes audio rows
    * through untouched, so time-axis normalization is its own step —
    * the fixed-length windows a training batcher wants). */
  def resampleAudio(media: DataFrame, targetSamples: Int,
                    codec: MediaCodec = AudioWavCodec): DataFrame =
    media.filter(col("modality") === "audio")
      .select("media_id", "modality", "bytes", "meta").mapPartitions { rows =>
        // per-partition init point for a real resampler
        rows.map { r =>
          val bytes =
            Option(r.get(2)).map(_.asInstanceOf[Array[Byte]]).getOrElse(Array.empty)
          Row(r.getLong(0), "audio", codec.resize(bytes, targetSamples, 1),
            Row("wav", null, null, null))
        }
      }(Encoders.row(mediaSchema))

  def decodedAudioStats(media: DataFrame): DataFrame =
    media.select("media_id", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val bytes =
          Option(r.get(1)).map(_.asInstanceOf[Array[Byte]]).getOrElse(Array.empty)
        AudioWavCodec.stats(bytes) match {
          case Some((n, rate, mean)) => Row(r.getLong(0), n, rate, mean)
          case None => Row(r.getLong(0), null, null, null)
        }
      }
    }(Encoders.row(audioStatsSchema))

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

  def sampleFrames(media: DataFrame, n: Int,
                   codec: MediaCodec = StubCodec): DataFrame = {
    media.filter(col("modality") === "video")
      .select("media_id", "bytes").mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes =
            Option(r.get(1)).map(_.asInstanceOf[Array[Byte]]).getOrElse(Array.empty)
          codec.sampleFrames(bytes, n).zipWithIndex.map {
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
