package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque payload + routing metadata. The payload is an
  * opaque `BinaryType` column — the schema a 100 TB multimodal lake uses
  * (media bytes inline or as object-store pointers; here inline). */
case class MediaRecord(
    doc_id: Long, kind: String, payload_md5: String, media: Array[Byte])

/** Decoder output: typed features per media object. */
case class DecodedMedia(
    doc_id: Long, kind: String, payload_md5: String, n_bytes: Int,
    width: Int, height: Int, n_frames: Int)

/** Pluggable media decoder. Implementations run inside `mapPartitions`
  * on executors — they must be Serializable and must NOT touch the
  * driver. */
trait MediaDecoder extends Serializable {
  def decode(r: MediaRecord): DecodedMedia
}

/** Real-resize output: original + output geometry and the re-encoded
  * PNG bytes ([[Multimodal.resizedImages]]). */
case class ResizedImage(
    doc_id: Long, width: Int, height: Int, out_w: Int, out_h: Int,
    out_png: Array[Byte])

/** Decoded audio: true signal-level metadata + RMS level
  * ([[Multimodal.audioFeatures]]). */
case class DecodedAudio(
    doc_id: Long, sample_rate: Int, channels: Int, bits: Int,
    n_samples: Long, duration_ms: Long, rms: Double)

/** Transform output: post-resize geometry + sampled frame count. */
case class TransformedMedia(
    doc_id: Long, kind: String, width: Int, height: Int,
    out_w: Int, out_h: Int, frames_sampled: Int)

/** Pluggable media transform (resize / frame-sample), second
  * `mapPartitions` stage after decode. */
trait MediaTransform extends Serializable {
  def apply(d: DecodedMedia): TransformedMedia
}

/** STUB resize + frame-sample transform: computes the output geometry
  * (fit into 224×224 preserving aspect, integer arithmetic) and samples
  * every 5th frame. In a real deployment the pixel/frame work happens
  * here; the stub keeps the arithmetic oracle-reproducible. */
object StubResizeSample extends MediaTransform {
  val Target = 224
  val Stride = 5
  def apply(d: DecodedMedia): TransformedMedia = {
    val m = math.max(d.width, d.height)
    val ow = if (m <= Target) d.width else d.width * Target / m
    val oh = if (m <= Target) d.height else d.height * Target / m
    TransformedMedia(d.doc_id, d.kind, d.width, d.height, ow, oh,
      (d.n_frames - 1) / Stride + 1)
  }
}

/** STUB decoder — deterministic fake (pure arithmetic on payload size)
  * for payloads that genuinely cannot be decoded in this environment:
  * audio/video (the JDK ships no codecs for them) and the synthetic
  * text-byte fixtures, whose "features" must stay oracle-reproducible
  * in SQL. Real images route through [[ImageIoDecoder]] instead. */
object StubDecoder extends MediaDecoder {
  def decode(r: MediaRecord): DecodedMedia = {
    val n = r.media.length
    DecodedMedia(
      doc_id = r.doc_id, kind = r.kind, payload_md5 = r.payload_md5,
      n_bytes = n,
      width = 32 + n % 608,
      height = 32 + (n * 7) % 448,
      n_frames = if (r.kind == "video") 1 + n % 30 else 1)
  }
}

/** REAL image decoder via the JDK's own `javax.imageio` (PNG/JPEG/GIF/BMP
  * readers ship with every JVM — no external codec dependency). An
  * `image`-kind payload whose magic bytes mark a real image is decoded on
  * the executor for its true dimensions; anything else — audio/video
  * kinds, or payloads that aren't actual image bytes (the synthetic
  * fixtures) — falls back to [[StubDecoder]]'s deterministic formula so
  * those rows stay SQL-oracle-reproducible. Default decoder for
  * [[Multimodal.decoded]]. */
object ImageIoDecoder extends MediaDecoder {
  /** Magic-byte sniff (PNG / JPEG / GIF / BMP) — cheaper than handing
    * every payload to an ImageIO reader probe. */
  private[ext] def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
        (b(0) == 'B' && b(1) == 'M'))

  private[ext] def readImage(b: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(b)) None
    else Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))

  def decode(r: MediaRecord): DecodedMedia =
    (if (r.kind == "image") readImage(r.media) else None) match {
      case Some(img) => DecodedMedia(
        doc_id = r.doc_id, kind = r.kind, payload_md5 = r.payload_md5,
        n_bytes = r.media.length,
        width = img.getWidth, height = img.getHeight, n_frames = 1)
      case None => StubDecoder.decode(r)
    }
}

/** Multimodal-column plumbing (SURVEY.md §7.5 extension; BASELINE.json
  * north star "multimodal columns").
  *
  * Shape for 100 TB:
  *   - media stays an opaque binary column end-to-end; nothing decodes
  *     at plan time or on the driver;
  *   - decode is `mapPartitions` over a typed Dataset — one decoder
  *     instance per partition, streaming the iterator (the JVM analog of
  *     a batched pandas UDF), so per-record overhead amortizes and
  *     memory stays bounded by one record;
  *   - decode cost is size-skewed, so [[decoded]] pre-repartitions by a
  *     byte-size range so one executor doesn't get all the 4 GB videos.
  */
object Multimodal {

  /** Build the media table from `documents`: payload = UTF-8 bytes of the
    * text (the fixtures ship no real media), kind sniffed deterministically
    * from payload size. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      expr(
        """CASE octet_length(encode(text, 'UTF-8')) % 3
             WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END""")
        .as("kind"),
      md5(encode(col("text"), "UTF-8")).as("payload_md5"),
      encode(col("text"), "UTF-8").as("media"))

  /** Partition-parallel batch decode: typed mapPartitions with a pluggable
    * decoder. Range-partitions on payload size first so decode cost
    * balances across executors. */
  def decoded(s: SparkSession, media: DataFrame,
      decoder: MediaDecoder = ImageIoDecoder): DataFrame = {
    import s.implicits._
    media
      .withColumn("n_bytes", octet_length(col("media")))
      .repartitionByRange(col("n_bytes"))
      .drop("n_bytes")
      .as[MediaRecord]
      .mapPartitions(batch => batch.map(decoder.decode))
      .toDF()
  }

  /** Decode → resize/frame-sample, both stages partition-parallel typed
    * mapPartitions (decode's range partitioning carries through the
    * narrow transform — no extra shuffle). */
  def transformed(s: SparkSession, media: DataFrame,
      decoder: MediaDecoder = ImageIoDecoder,
      transform: MediaTransform = StubResizeSample): DataFrame = {
    import s.implicits._
    decoded(s, media, decoder)
      .as[DecodedMedia]
      .mapPartitions(batch => batch.map(transform.apply))
      .toDF()
  }

  /** Perceptual 64-bit average-hash (aHash) per decodable image payload —
    * the image-space analog of the text tiers' simhash: decode → 8×8
    * block-mean grayscale → threshold at the global cell mean → one bit
    * per cell. All integer arithmetic (luma = (299r+587g+114b)/1000,
    * block means exact over pixel sums), so the hash is deterministic
    * across JVMs and partitionings. Decode+hash fused in one
    * mapPartitions stage — pixels never leave the task. Non-image /
    * undecodable payloads are dropped. */
  def imageHashes(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media
      .withColumn("n_bytes", octet_length(col("media")))
      .repartitionByRange(col("n_bytes"))
      .drop("n_bytes")
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        ImageIoDecoder.readImage(r.media).filter(_ => r.kind == "image")
          .map(img => (r.doc_id, aHash(img)))
      })
      .toDF("doc_id", "ahash")
  }

  /** 8×8 block-mean aHash of a decoded image (see [[imageHashes]]). */
  private[ext] def aHash(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val cells = new Array[Long](64)
    var gy = 0
    while (gy < 8) {
      val (y0, y1) = (gy * h / 8, math.max((gy + 1) * h / 8, gy * h / 8 + 1))
      var gx = 0
      while (gx < 8) {
        val (x0, x1) = (gx * w / 8, math.max((gx + 1) * w / 8, gx * w / 8 + 1))
        var sum = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            sum += (299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
              114L * (rgb & 0xFF)) / 1000L
            x += 1
          }
          y += 1
        }
        val n = math.max(1, (math.min(y1, h) - y0) * (math.min(x1, w) - x0))
        cells(gy * 8 + gx) = sum / n
        gx += 1
      }
      gy += 1
    }
    val mean = cells.sum / 64
    cells.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
      if (c > mean) acc | (1L << i) else acc
    }
  }

  /** Image near-duplicate pairs by perceptual-hash Hamming distance —
    * the image dedup tier. Candidates and verification via the shared
    * [[bandedHammingPairs]] machinery; feed the output into
    * [[DedupQueries.connectedComponents]] for cluster decisions. */
  def imageNeardup(s: SparkSession, media: DataFrame,
      maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(
      imageHashes(s, media).withColumnRenamed("ahash", "h64"), maxHamming)

  /** 64-bit-hash near-duplicate pairs, shared by the image (aHash,
    * [[imageNeardup]]) and audio (energy hash, [[audioNeardup]]) tiers.
    * Candidates = pairs sharing any of the hash's four 16-bit bands (one
    * equi-join shuffle on (band, key) — the same banded-signature shape
    * as the simhash/minhash text tiers, never all-pairs); verify = exact
    * `bit_count(xor)` ≤ `maxHamming`. The 4-band pigeonhole guarantees
    * full recall for Hamming ≤ 3; larger thresholds trade recall like
    * any banded LSH. Input columns: (doc_id, h64). Output: (doc_a,
    * doc_b, hamming), doc_a < doc_b, one row per pair. */
  private[ext] def bandedHammingPairs(hashes: DataFrame,
      maxHamming: Int): DataFrame = {
    val bands = hashes
      .select(col("doc_id"), col("h64"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("h64"), b * 16).bitwiseAND(lit(0xFFFFL))
              .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("h64"), col("bk.band").as("band"),
        col("bk.key").as("key"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.h64").bitwiseXOR(col("b.h64"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Magic-byte sniff for the container formats the JDK's own
    * `javax.sound.sampled` decodes (WAV / AIFF / AU — no external codec
    * dependency, the audio analog of [[ImageIoDecoder]]'s sniff). */
  private[ext] def looksLikeAudio(b: Array[Byte]): Boolean =
    b.length >= 12 && (
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
        (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') ||
        (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'))

  /** Decode an audio container to (format, raw PCM bytes); None when the
    * payload isn't real audio (the synthetic fixtures) or the encoding
    * is unsupported. Runs on executors only. */
  private[ext] def readAudio(b: Array[Byte])
      : Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
    if (!looksLikeAudio(b)) None
    else scala.util.Try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      try (in.getFormat, in.readAllBytes()) finally in.close()
    }.toOption

  /** Interleaved PCM bytes → per-frame mono samples in [-1, 1) (channels
    * averaged). Supports the encodings WAV/AIFF actually carry: signed
    * 16-bit (either endianness) and signed/unsigned 8-bit. */
  private[ext] def monoSamples(fmt: javax.sound.sampled.AudioFormat,
      data: Array[Byte]): Option[Array[Double]] = {
    import javax.sound.sampled.AudioFormat.Encoding._
    val ch = fmt.getChannels
    val bits = fmt.getSampleSizeInBits
    val enc = fmt.getEncoding
    val ok = (bits == 16 && enc == PCM_SIGNED) ||
      (bits == 8 && (enc == PCM_SIGNED || enc == PCM_UNSIGNED))
    if (!ok || ch < 1) return None
    val bytesPerSample = bits / 8
    val frames = data.length / (bytesPerSample * ch)
    val out = new Array[Double](frames)
    var f = 0
    while (f < frames) {
      var acc = 0.0
      var c = 0
      while (c < ch) {
        val i = (f * ch + c) * bytesPerSample
        val v =
          if (bits == 16) {
            val (lo, hi) =
              if (fmt.isBigEndian) (data(i + 1), data(i)) else (data(i), data(i + 1))
            ((hi << 8) | (lo & 0xFF)).toShort / 32768.0
          } else if (enc == PCM_SIGNED) data(i) / 128.0
          else ((data(i) & 0xFF) - 128) / 128.0
        acc += v
        c += 1
      }
      out(f) = acc / ch
      f += 1
    }
    Some(out)
  }

  /** REAL audio decode via the JDK's own `javax.sound.sampled` — true
    * signal-level features per decodable audio payload: sample rate,
    * channels, bit depth, frame count, duration, RMS level. The audio
    * analog of the ImageIO tier: decode + feature extraction fused in
    * one mapPartitions stage, samples never leave the task. Non-audio
    * kinds and undecodable payloads are dropped (this is the real-audio
    * branch; the synthetic fixtures route through the stub path of
    * [[decoded]]). */
  def audioFeatures(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media
      .withColumn("n_bytes", octet_length(col("media")))
      .repartitionByRange(col("n_bytes"))
      .drop("n_bytes")
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        (if (r.kind == "audio") readAudio(r.media) else None)
          .flatMap { case (fmt, data) =>
            monoSamples(fmt, data).map { xs =>
              val n = xs.length
              val energy = xs.foldLeft(0.0)((a, x) => a + x * x)
              DecodedAudio(
                doc_id = r.doc_id,
                sample_rate = fmt.getSampleRate.toInt,
                channels = fmt.getChannels,
                bits = fmt.getSampleSizeInBits,
                n_samples = n.toLong,
                duration_ms =
                  math.round(n * 1000.0 / fmt.getSampleRate),
                rms = if (n == 0) 0.0
                  else BigDecimal(math.sqrt(energy / n))
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
          }
      })
      .toDF()
  }

  /** 64-bit energy-envelope hash per decodable audio payload — the audio
    * analog of [[aHash]]: the signal is cut into 64 equal windows, each
    * window's mean energy compared against the whole-signal mean, one
    * bit per window. Robust to low-level noise and uniform gain (both
    * sides of the comparison scale together), sensitive to WHERE the
    * loud parts are — the envelope is what survives re-encoding. Fused
    * decode→hash in one mapPartitions stage. */
  def audioHashes(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media
      .withColumn("n_bytes", octet_length(col("media")))
      .repartitionByRange(col("n_bytes"))
      .drop("n_bytes")
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        (if (r.kind == "audio") readAudio(r.media) else None)
          .flatMap { case (fmt, data) => monoSamples(fmt, data) }
          .filter(_.length >= 64)
          .map(xs => (r.doc_id, energyHash(xs)))
      })
      .toDF("doc_id", "h64")
  }

  /** 64-window energy-envelope hash of a mono signal (see
    * [[audioHashes]]). */
  private[ext] def energyHash(xs: Array[Double]): Long = {
    val n = xs.length
    val win = new Array[Double](64)
    var w = 0
    while (w < 64) {
      // Long window bounds: w*n overflows Int past ~34M frames (a
      // 13-minute 44.1 kHz WAV is within readAudio's inputs).
      val i0 = (w.toLong * n / 64).toInt
      val i1 = math.max(((w + 1).toLong * n / 64).toInt, i0 + 1)
      var sum = 0.0
      var i = i0
      while (i < math.min(i1, n)) { sum += xs(i) * xs(i); i += 1 }
      win(w) = sum / math.max(1, math.min(i1, n) - i0)
      w += 1
    }
    val mean = win.sum / 64
    win.zipWithIndex.foldLeft(0L) { case (acc, (e, i)) =>
      if (e > mean) acc | (1L << i) else acc
    }
  }

  /** Audio near-duplicate pairs by energy-envelope-hash Hamming distance
    * — the audio dedup tier, sharing [[bandedHammingPairs]] (one
    * (band, key) equi-join, exact verify) with the image tier. */
  def audioNeardup(s: SparkSession, media: DataFrame,
      maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(audioHashes(s, media), maxHamming)

  /** REAL pixel resize for image payloads, decode→scale→re-encode FUSED
    * into one `mapPartitions` stage: raw pixels live only inside a single
    * task — they never cross a shuffle or revisit the driver, which is
    * the only layout that survives 100 TB of media (a decode→shuffle→
    * resize split would move decompressed pixel buffers over the
    * network). Aspect-preserving fit into `target`×`target` with the
    * same integer arithmetic as [[StubResizeSample]]; output is
    * PNG-re-encoded bytes + geometry. Non-image or undecodable payloads
    * are dropped (this is the image branch of the pipeline; audio/video
    * route through the stub path). */
  def resizedImages(s: SparkSession, media: DataFrame,
      target: Int = StubResizeSample.Target): DataFrame = {
    import s.implicits._
    media
      .withColumn("n_bytes", octet_length(col("media")))
      .repartitionByRange(col("n_bytes"))
      .drop("n_bytes")
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        ImageIoDecoder.readImage(r.media).filter(_ => r.kind == "image")
          .map { img =>
            val (w, h) = (img.getWidth, img.getHeight)
            val m = math.max(w, h)
            val ow = if (m <= target) w else w * target / m
            val oh = if (m <= target) h else h * target / m
            val out = new java.awt.image.BufferedImage(
              ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, ow, oh, null)
            } finally g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            ResizedImage(r.doc_id, w, h, ow, oh, buf.toByteArray)
          }
      })
      .toDF()
  }
}
