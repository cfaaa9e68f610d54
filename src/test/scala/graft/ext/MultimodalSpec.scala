package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "a b c"),
      (1L, "the quick brown fox"),
      (2L, "x" * 300)).toDF("doc_id", "text")
  }

  test("mediaTable carries an opaque binary payload column") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("media").dataType == BinaryType)
    val row = m.filter(col("doc_id") === 0L).head()
    assert(row.getAs[Array[Byte]]("media").sameElements("a b c".getBytes("UTF-8")))
  }

  test("stub decode is deterministic and partition-parallel") {
    val d1 = Multimodal.decoded(spark, Multimodal.mediaTable(docs))
      .orderBy("doc_id").collect()
    val d2 = Multimodal.decoded(spark,
        Multimodal.mediaTable(docs).repartition(3))
      .orderBy("doc_id").collect()
    assert(d1.sameElements(d2), "decode must not depend on partitioning")
    val r = d1.head
    assert(r.getAs[Int]("n_bytes") == 5)
    assert(r.getAs[Int]("width") == 32 + 5 % 608)
  }

  test("a custom decoder plugs in without touching the pipeline") {
    val doubler = new MediaDecoder {
      def decode(r: MediaRecord): DecodedMedia =
        StubDecoder.decode(r).copy(width = 2 * r.media.length)
    }
    val out = Multimodal.decoded(spark, Multimodal.mediaTable(docs), doubler)
    assert(out.filter(col("doc_id") === 0L).head().getAs[Int]("width") == 10)
  }

  /** A real in-memory PNG: w×h gradient, encoded by the JDK itself. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 255 / w << 16) | (y * 255 / h << 8) | 0x40)))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def mediaOf(rows: (Long, String, Array[Byte])*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "kind", "media")
      .withColumn("payload_md5", md5(col("media")))
      .select("doc_id", "kind", "payload_md5", "media")
  }

  test("ImageIoDecoder reads true dimensions from real PNG/JPEG bytes") {
    val png = pngBytes(64, 48)
    // JPEG round-trip of the same gradient, also JDK-encoded
    val jimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val jbuf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(jimg, "jpg", jbuf)
    val media = mediaOf(
      (1L, "image", png),
      (2L, "image", jbuf.toByteArray),
      (3L, "image", "not an image at all".getBytes("UTF-8")),
      (4L, "audio", png)) // wrong kind -> stub path even for real bytes
    val out = Multimodal.decoded(spark, media)
      .select("doc_id", "width", "height", "n_frames")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(out(1L) === ((64, 48, 1)), "PNG decodes to its true geometry")
    assert(out(2L) === ((64, 48, 1)), "JPEG decodes to its true geometry")
    val n3 = "not an image at all".getBytes("UTF-8").length
    assert(out(3L) === ((32 + n3 % 608, 32 + (n3 * 7) % 448, 1)),
      "undecodable payload falls back to the deterministic stub")
    assert(out(4L)._1 === 32 + png.length % 608,
      "non-image kinds stay on the stub path")
  }

  test("imageNeardup pairs perceptually-close images, not distinct ones") {
    import spark.implicits._
    // base: gradient; nearNoise: same gradient with a few pixels nudged
    // (hamming should be tiny); inverted: reversed gradient (far)
    val base = pngBytes(64, 48)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    (0 until 5).foreach(i => img.setRGB(i, i, img.getRGB(i, i) ^ 0x070707))
    val nearBuf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", nearBuf)
    val inv = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 64).foreach(x => (0 until 48).foreach(y =>
      inv.setRGB(x, y, ((63 - x) * 255 / 64 << 16) | ((47 - y) * 255 / 48 << 8))))
    val invBuf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(inv, "png", invBuf)
    val media = mediaOf(
      (1L, "image", base),
      (2L, "image", nearBuf.toByteArray),
      (3L, "image", invBuf.toByteArray),
      (4L, "image", base), // exact duplicate of 1 -> hamming 0
      (5L, "audio", base)) // not the image branch
    val hashes = Multimodal.imageHashes(spark, media)
      .as[(Long, Long)].collect().toMap
    assert(hashes.keySet === Set(1L, 2L, 3L, 4L))
    assert(hashes(1L) === hashes(4L), "identical bytes -> identical hash")
    val pairs = Multimodal.imageNeardup(spark, media, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) === 0)
    assert(pairs.contains((1L, 2L)), "noise-perturbed copy is a near-dup")
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L },
      "the inverted gradient is not a near-dup of anything")
  }

  test("resizedImages really scales pixels, aspect-preserving, re-encoded") {
    val media = mediaOf(
      (1L, "image", pngBytes(640, 480)), // landscape, needs shrink
      (2L, "image", pngBytes(20, 10)),   // already fits -> untouched
      (3L, "audio", pngBytes(64, 64)),   // dropped: not the image branch
      (4L, "image", "plain text".getBytes("UTF-8"))) // dropped: undecodable
    val out = Multimodal.resizedImages(spark, media, target = 224)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet === Set(1L, 2L))
    val r1 = out(1L)
    assert((r1.getAs[Int]("out_w"), r1.getAs[Int]("out_h")) === ((224, 168)))
    // the payload is a REAL resized image: decode it back and check
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r1.getAs[Array[Byte]]("out_png")))
    assert((back.getWidth, back.getHeight) === ((224, 168)))
    // bilinear scaling preserves the gradient direction: left edge darker
    // red channel than right edge
    def red(rgb: Int) = (rgb >> 16) & 0xFF
    assert(red(back.getRGB(4, 84)) < red(back.getRGB(219, 84)))
    val r2 = out(2L)
    assert((r2.getAs[Int]("out_w"), r2.getAs[Int]("out_h")) === ((20, 10)))
  }

  /** A real in-memory 16-bit mono WAV, encoded by the JDK itself. */
  private def wavBytes(samples: Array[Short],
      sampleRate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled._
    val data = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i => // little-endian PCM_SIGNED 16
      data(2 * i) = (samples(i) & 0xFF).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length)
    val buf = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  /** 6400 samples whose loudness follows `pattern` over 64 windows
    * (100 samples each): a full-scale-ish sine where the pattern bit is
    * set, near-silence elsewhere — an unambiguous energy envelope. */
  private def envelopeSignal(pattern: Int => Boolean,
      noise: Int => Short = _ => 0): Array[Short] =
    Array.tabulate(6400) { i =>
      val loud = pattern(i / 100)
      val amp = if (loud) 16000.0 else 100.0
      (amp * math.sin(2 * math.Pi * i / 20.0) + noise(i)).toShort
    }

  test("audioFeatures decodes real WAV bytes: rate, geometry, RMS level") {
    val sine = Array.tabulate(8000)(i =>
      (16384 * math.sin(2 * math.Pi * 440 * i / 8000.0)).toShort)
    val media = mediaOf(
      (1L, "audio", wavBytes(sine)),
      (2L, "audio", "not audio".getBytes("UTF-8")), // dropped: undecodable
      (3L, "image", wavBytes(sine)))                // dropped: wrong kind
    val out = Multimodal.audioFeatures(spark, media).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(1L))
    val r = out.head
    assert(r.getAs[Int]("sample_rate") === 8000)
    assert(r.getAs[Int]("channels") === 1)
    assert(r.getAs[Int]("bits") === 16)
    assert(r.getAs[Long]("n_samples") === 8000L)
    assert(r.getAs[Long]("duration_ms") === 1000L)
    // a full-cycle sine's RMS is amplitude/sqrt(2)
    val expected = 16384.0 / 32768.0 / math.sqrt(2.0)
    assert(math.abs(r.getAs[Double]("rms") - expected) < 0.005)
  }

  test("audioNeardup pairs re-noised envelopes, not a different envelope") {
    val pattern = (w: Int) => w % 3 == 0
    val rnd = new scala.util.Random(7)
    val noisy = (_: Int) => (rnd.nextInt(41) - 20).toShort
    val media = mediaOf(
      (1L, "audio", wavBytes(envelopeSignal(pattern))),
      (2L, "audio", wavBytes(envelopeSignal(pattern, noisy))),
      (3L, "audio", wavBytes(envelopeSignal(w => !pattern(w)))),
      (4L, "audio", wavBytes(envelopeSignal(pattern))))
    val pairs = Multimodal.audioNeardup(spark, media, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) === 0,
      "bit-identical signals hash identically")
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L)),
      "low-level noise must not change the energy envelope")
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L },
      "the complementary envelope is not a near-dup of anything")
  }

  test("monoSamples downmixes stereo and handles both endiannesses") {
    import javax.sound.sampled.AudioFormat
    // stereo frame: L=+16384, R=-16384 -> mono 0; then L=R=+8192 -> 0.25
    val le = Array[Byte](0, 64, 0, -64, 0, 32, 0, 32)
    val xs = Multimodal.monoSamples(
      new AudioFormat(8000f, 16, 2, true, false), le).get
    assert(xs.length === 2)
    assert(math.abs(xs(0)) < 1e-9)
    assert(math.abs(xs(1) - 0.25) < 1e-9)
    val be = Array[Byte](64, 0, -64, 0, 32, 0, 32, 0)
    val ys = Multimodal.monoSamples(
      new AudioFormat(8000f, 16, 2, true, true), be).get
    assert(ys.toSeq === xs.toSeq, "endianness must not change the signal")
  }

  test("energyHash window bounds survive >34M-frame signals") {
    // w*n in Int overflows past n ≈ 34.1M (w up to 64): a ~13-minute
    // 44.1 kHz WAV is a legitimate readAudio input. Energy only in the
    // second half → exactly the high 32 envelope bits set.
    val n = 35_000_000
    val xs = new Array[Double](n)
    var i = n / 2
    while (i < n) { xs(i) = 1.0; i += 1 }
    val h = Multimodal.energyHash(xs)
    assert(h === (-1L << 32), "high 32 windows loud, low 32 quiet")
  }
}
