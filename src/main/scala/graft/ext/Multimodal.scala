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

/** STUB decoder — this container ships no image/audio/video codecs, so
  * the decode step is a clearly-marked deterministic fake (pure
  * arithmetic on payload size). The Spark-side plumbing around it —
  * binary schema, partition-parallel batch decode, typed output — is
  * real and oracle-tested; swapping in a JNI/javacv decoder is a
  * one-class change. */
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
      decoder: MediaDecoder = StubDecoder): DataFrame = {
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
      decoder: MediaDecoder = StubDecoder,
      transform: MediaTransform = StubResizeSample): DataFrame = {
    import s.implicits._
    decoded(s, media, decoder)
      .as[DecodedMedia]
      .mapPartitions(batch => batch.map(transform.apply))
      .toDF()
  }
}
