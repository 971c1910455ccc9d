package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}

/** The REAL image-codec leg (VERDICT r11 #7): javax.imageio decode /
  * nearest-neighbor resize / PNG re-encode behind the same
  * per-partition plumbing the deterministic stand-in legs use. The
  * fixtures are PNGs generated in-test from exact pixel programs, so
  * every assertion is against known ground-truth pixels.
  */
class MultimodalSpec extends SparkSpec {

  /** w×h RGB image with pixel (x, y) = f(x, y), PNG-encoded. */
  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) = {
    val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(Multimodal.mediaSchema))
    spark.createDataset(rows.map { case (id, b) =>
      Row(id, "image", b, Row("png", b.length))
    })(enc)
  }

  test("imageFeatures decodes real PNG bytes: width/height/luma histogram") {
    // image 1: all-black 8x6 (every pixel in bin 0); image 2: a
    // half-black half-white 4x4 (bins 0 and 15, 8 pixels each)
    val black = png(8, 6)((_, _) => 0x000000)
    val split = png(4, 4)((x, _) => if (x < 2) 0x000000 else 0xffffff)
    val out = Multimodal.imageFeatures(mediaDf(Seq((1L, black), (2L, split))))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L).getInt(2) == 8 && out(1L).getInt(3) == 6)
    val h1 = out(1L).getSeq[Long](4)
    assert(h1.head == 48L && h1.tail.forall(_ == 0L))
    val h2 = out(2L).getSeq[Long](4)
    assert(h2.head == 8L && h2.last == 8L && h2.sum == 16L)
  }

  test("imageFeatures drops undecodable bytes instead of failing the job") {
    val good = png(2, 2)((_, _) => 0x123456)
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val out = Multimodal.imageFeatures(
      mediaDf(Seq((1L, good), (2L, junk)))).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("imageResize: real decode, exact nearest-neighbor pixels, PNG " +
      "re-encode, media schema preserved") {
    // 8x8 with a distinct color per pixel so sampling is fully visible
    def color(x: Int, y: Int): Int = (x * 32 << 16) | (y * 32 << 8) | 0x7f
    val src = png(8, 8)(color)
    val out = Multimodal.imageResize(mediaDf(Seq((5L, src))), 4, 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 5L && r.getString(1) == "image")
    val meta = r.getStruct(3)
    assert(meta.getString(0) == "png")
    val bytes = r.getAs[Array[Byte]](2)
    assert(meta.getInt(1) == bytes.length)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 4 && img.getHeight == 2)
    // nearest-neighbor with integer index math: out(x,y) = src(2x, 4y)
    for (y <- 0 until 2; x <- 0 until 4)
      assert((img.getRGB(x, y) & 0xffffff) == color(2 * x, 4 * y),
        s"pixel ($x,$y)")
  }

  test("the real leg composes with the shared plumbing: resize output " +
      "feeds extractFeatures and planTransform") {
    val src = png(16, 16)((x, y) => (x ^ y) * 0x010101)
    val resized = Multimodal.imageResize(mediaDf(Seq((9L, src))), 8, 8)
    val planned = Multimodal.planTransform(resized, maxBytes = 10)
    assert(planned.columns.contains("transform"))
    val feats = Multimodal.extractFeatures(resized).collect()
    assert(feats.length == 1 && feats.head.getLong(0) == 9L)
    // byte count in features matches the re-encoded payload
    val nb = resized.collect().head.getAs[Array[Byte]](2).length
    assert(feats.head.getInt(2) == nb)
  }

  /** Mono 16-bit little-endian PCM WAV from an exact sample program. */
  private def wav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, 16, 1, 2, rate.toFloat, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def audioDf(rows: Seq[(Long, Array[Byte])]) = {
    val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(Multimodal.mediaSchema))
    spark.createDataset(rows.map { case (id, b) =>
      Row(id, "audio", b, Row("wav", b.length))
    })(enc)
  }

  test("audioFeatures decodes real WAV/PCM: rate, counts, peak, sum of " +
      "squares, amplitude histogram — all against the exact program") {
    // a known staircase: samples 0, ±1000, ±32000 — ground truth by hand
    val samples = Array[Short](0, 1000, -1000, 32000, -32000, 0)
    val out = Multimodal.audioFeatures(
      audioDf(Seq((1L, wav(8000, samples))))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getInt(2) == 8000 && r.getInt(3) == 1)
    assert(r.getLong(4) == 6L)
    assert(r.getInt(5) == 32000)
    assert(r.getLong(6) ==
      samples.map(s => s.toLong * s).sum)
    val hist = r.getSeq[Long](7)
    assert(hist.sum == 6L)
    // bins: |0| -> 0 (x3 incl. the two zeros), |1000| -> 1000*16/32768=0,
    // |32000| -> 15 (x2)
    assert(hist.head == 4L && hist.last == 2L)
  }

  test("audioFeatures drops non-PCM/corrupt rows instead of failing") {
    val good = wav(16000, Array[Short](5, -5, 5, -5))
    val junk = Array.tabulate[Byte](96)(i => (i * 13).toByte)
    val out = Multimodal.audioFeatures(
      audioDf(Seq((1L, good), (2L, junk)))).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out.head.getLong(4) == 4L && out.head.getInt(5) == 5)
  }
}
