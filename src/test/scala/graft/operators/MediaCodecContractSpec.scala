package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal.{ImageIoCodec, MediaCodec, StubCodec}

/** Contract proof for the [[Multimodal.MediaCodec]] seam: the env-blocked
  * compressed codecs (H.264, MP3) are production-registered by passing a
  * codec instance to the operators — ONE argument, no operator changes.
  * This suite registers a synthetic compressed format at runtime ("XZR1":
  * a 4-byte magic + XOR-0x5A body standing in for a real entropy coder)
  * whose codec decompresses and delegates to the REAL ImageIO path, and
  * proves the full v01/v02/v03-shaped pipelines run through it with
  * results identical to the uncompressed ground truth. A real codec jar
  * slots in exactly the same way.
  */
/** The synthetic compressed-format codec: decompress, then the real
  * image pipeline. `resize` re-encodes INTO the compressed format, as a
  * real transcoding codec would. Top-level so the task closure carries
  * only the codec, never the suite.
  */
object XzrCodec extends MediaCodec {
  private val Magic = Array[Byte]('X', 'Z', 'R', '1')
  def compress(b: Array[Byte]): Array[Byte] =
    Magic ++ b.map(x => (x ^ 0x5A).toByte)
  def decompress(b: Array[Byte]): Array[Byte] =
    if (b.length >= 4 && b.take(4).sameElements(Magic))
      b.drop(4).map(x => (x ^ 0x5A).toByte)
    else b
  def features(bytes: Array[Byte], dim: Int): Array[Float] =
    ImageIoCodec.features(decompress(bytes), dim)
  def sampleFrames(bytes: Array[Byte], n: Int): Array[Long] =
    StubCodec.sampleFrames(decompress(bytes), n)
  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    compress(ImageIoCodec.resize(decompress(bytes), w, h))
  override def dimensions(bytes: Array[Byte]): Option[(Int, Int)] =
    ImageIoCodec.dimensions(decompress(bytes))
}

class MediaCodecContractSpec extends SparkSpec {

  import spark.implicits._

  private def media(n: Int) =
    Multimodal.syntheticCellImages(
      spark.range(0L, n.toLong).toDF("id"), "id")

  private def compressed(n: Int) = {
    val c = udf((b: Array[Byte]) => XzrCodec.compress(b))
    media(n).withColumn("bytes", c(col("bytes")))
  }

  test("v03 features through the registered compressed codec equal the uncompressed truth") {
    val ref = Multimodal.extractFeatures(media(40), dim = 16,
        codec = ImageIoCodec)
      .select("media_id", "feature").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val got = Multimodal.extractFeatures(compressed(40), dim = 16,
        codec = XzrCodec) // <- the one-line registration
      .select("media_id", "feature").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got.size == 40)
    assert(got == ref)
  }

  test("v02 resize through the compressed codec transcodes losslessly") {
    val refBytes = Multimodal.resize(media(10), 16, 12, codec = ImageIoCodec)
      .select("media_id", "bytes").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val gotRows = Multimodal.resize(compressed(10), 16, 12, codec = XzrCodec)
      .select("media_id", "bytes", "meta.width", "meta.height").collect()
    // output stays IN the compressed format (a transcoding codec), with
    // updated metadata; decompressing recovers the real resized PNG
    assert(gotRows.forall(r => r.getInt(2) == 16 && r.getInt(3) == 12))
    val got = gotRows
      .map(r => r.getLong(0) ->
        XzrCodec.decompress(r.getAs[Array[Byte]](1)).toSeq).toMap
    assert(got == refBytes)
  }

  test("v01 frame sampling reads offsets of the DECOMPRESSED stream") {
    val vids = compressed(6).withColumn("modality", lit("video"))
    val frames = Multimodal.sampleFrames(vids, n = 4, codec = XzrCodec)
      .orderBy("media_id", "frame_no").collect()
    assert(frames.length == 24)
    // offsets are i*len/n over the DECOMPRESSED payload length — the
    // compressed wrapper (4 magic bytes) must not leak into them
    val rawLens = media(6).select("media_id", "bytes").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).length).toMap
    frames.foreach { r =>
      val (id, i, off) = (r.getLong(0), r.getInt(1), r.getLong(2))
      assert(off == i.toLong * rawLens(id) / 4, s"media $id frame $i")
    }
  }
}
