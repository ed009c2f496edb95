package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract run as a
  * partition-local typed transformation (the Scala analog of
  * `mapInPandas` batches — same schema/partitioning contract).
  *
  * Two tiers of decode:
  *  - [[RealCodecs]] — REAL BMP and WAV container parsing (pure-JVM byte
  *    work, no external libraries; q78 roundtrips every header field);
  *  - [[FakeDecoder]] — a clearly marked deterministic STUB standing in
  *    for compressed codecs (JPEG/H.264/Opus) that genuinely need
  *    libraries this container lacks; the Spark-side plumbing — binary
  *    schema, batch iteration, feature schema, partition preservation —
  *    is real and tested; swap [[FakeDecoder.decode]] for a codec at
  *    deployment. */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, frames: Int, checksum: Long)

  /** STUB decoder: derives deterministic pseudo-metadata from payload bytes.
    * Replace with a real codec (e.g. javax.imageio / ffmpeg bindings) in a
    * real deployment — the call-site contract is the only thing tests pin. */
  object FakeDecoder {
    def decode(payload: Array[Byte], mediaType: String): (Int, Int, Int) = {
      val n = payload.length
      val w = 16 + (n % 1024)
      val h = 16 + ((n / 7) % 768)
      val frames = if (mediaType == "video") 1 + (n % 240) else 1
      (w, h, frames)
    }
  }

  /** Synthesize a media table from documents: text bytes stand in for the
    * opaque payload (binary column), media type assigned round-robin. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Partition-local decode + feature extraction. No shuffle: narrow
    * mapPartitions over whatever partitioning the payload table has. */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val (w, h, f) = FakeDecoder.decode(r.payload, r.media_type)
        val checksum = r.payload.foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
          w, h, f, checksum)
      }
    }
  }

  case class ResizedMedia(doc_id: Long, media_type: String,
      payload: Array[Byte], width: Int, height: Int)
  case class Frame(doc_id: Long, frame_idx: Int, frame_payload: Array[Byte])

  /** Resize plumbing: narrow per-row payload rewrite (STUB kernel scales the
    * byte buffer to the target pixel count; a real build calls the codec).
    * The shape is what matters at scale: payload-in/payload-out, no shuffle,
    * partitioning preserved. */
  def resize(spark: SparkSession, media: DataFrame,
      width: Int, height: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val target = math.max(1, (width * height) / 64) // STUB "pixel" bytes
        val out = java.util.Arrays.copyOf(r.payload, target)
        ResizedMedia(r.doc_id, r.media_type, out, width, height)
      }
    }
  }

  /** Frame sampling: video payloads flatMap to one row per kept frame
    * (every `everyN`-th of the stub-decoded frame count) — the UDTF/explode
    * shape for media. Output cardinality is data-dependent; downstream ops
    * see ordinary rows. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      everyN: Int = 10): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      if (r.media_type != "video") Iterator.empty
      else {
        val (_, _, frames) = FakeDecoder.decode(r.payload, r.media_type)
        Iterator.range(0, frames, everyN).map { i =>
          // STUB frame bytes: a deterministic slice keyed by frame index
          val off = if (r.payload.isEmpty) 0 else i % r.payload.length
          Frame(r.doc_id, i,
            java.util.Arrays.copyOfRange(r.payload, off,
              math.min(off + 16, r.payload.length)))
        }
      }
    }
  }

  /** Relational metadata view (oracle-checkable): byte length and lead byte
    * straight from the binary column, plus stubbed frame count. */
  def metadata(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      ascii(col("text")).cast("long").as("first_byte"),
      (floor(octet_length(col("text")) / 256) + 1).as("frames_stub"))
      .orderBy("doc_id")

  /** REAL container codecs for the two media formats pure-JVM byte code can
    * encode AND decode without external libraries: BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, 24-bpp bottom-up, 4-byte row padding) and WAV
    * (RIFF/WAVE with PCM16 `fmt ` + `data` chunks). These replace the
    * [[FakeDecoder]] stub for formats where a stub was never necessary;
    * compressed codecs (JPEG/H.264/Opus) remain deployment swaps.
    * All multi-byte fields little-endian per both specs. */
  object RealCodecs {

    final case class Decoded(format: String, width: Int, height: Int,
        sampleRate: Int, channels: Int, samples: Int)

    private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    }
    private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
      b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
    }
    private def rd16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def rd32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

    /** BMP row stride: 24-bpp rows pad to 4 bytes. */
    def bmpStride(width: Int): Int = (3 * width + 3) & ~3

    def encodeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
      val stride = bmpStride(width)
      val size = 54 + stride * height
      val b = new Array[Byte](size)
      b(0) = 'B'; b(1) = 'M'
      le32(b, 2, size)
      le32(b, 10, 54) // pixel-array offset
      le32(b, 14, 40) // BITMAPINFOHEADER size
      le32(b, 18, width)
      le32(b, 22, height) // positive = bottom-up
      le16(b, 26, 1) // planes
      le16(b, 28, 24) // bpp
      le32(b, 34, stride * height) // image size
      var i = 54
      while (i < size) { b(i) = ((seed + i) * 31).toByte; i += 1 }
      b
    }

    def encodeWav(sampleRate: Int, channels: Int, samples: Int,
        seed: Long): Array[Byte] = {
      val dataLen = samples * channels * 2
      val b = new Array[Byte](44 + dataLen)
      b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
      le32(b, 4, 36 + dataLen)
      b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
      b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
      le32(b, 16, 16) // PCM fmt chunk length
      le16(b, 20, 1) // PCM
      le16(b, 22, channels)
      le32(b, 24, sampleRate)
      le32(b, 28, sampleRate * channels * 2) // byte rate
      le16(b, 32, channels * 2) // block align
      le16(b, 34, 16) // bits per sample
      b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
      le32(b, 40, dataLen)
      var i = 44
      while (i < b.length) { b(i) = ((seed * 17 + i) % 251).toByte; i += 1 }
      b
    }

    /** Sniffs the container magic and parses the header fields. WAV walks
      * the RIFF chunk list (fmt /data may be preceded by other chunks in
      * the wild). Throws on anything that is neither — corrupt media must
      * surface, not decode to zeros. */
    def decode(payload: Array[Byte]): Decoded = {
      if (payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M') {
        Decoded("bmp", rd32(payload, 18), rd32(payload, 22), 0, 0, 0)
      } else if (payload.length >= 44 && rd32(payload, 0) == 0x46464952
          && rd32(payload, 8) == 0x45564157) { // "RIFF", "WAVE"
        var off = 12
        var rate = 0; var ch = 0; var dataLen = -1
        while (off + 8 <= payload.length && (rate == 0 || dataLen < 0)) {
          val id = rd32(payload, off)
          val len = rd32(payload, off + 4)
          if (id == 0x20746d66) { // "fmt "
            ch = rd16(payload, off + 10)
            rate = rd32(payload, off + 12)
          } else if (id == 0x61746164) { // "data"
            dataLen = len
          }
          off += 8 + len + (len & 1) // chunks pad to even length
        }
        if (rate <= 0 || ch <= 0 || dataLen < 0)
          throw new java.io.IOException("WAV missing fmt/data chunk")
        Decoded("wav", 0, 0, rate, ch, dataLen / (ch * 2))
      } else throw new java.io.IOException("unknown media container")
    }
  }

  /** Real media table: one REAL container payload per document — BMP for
    * even doc_ids, WAV for odd — every header field a pure function of
    * doc_id so the decode roundtrip is oracle-recomputable. Payload build
    * is a narrow mapPartitions (the corpus-scale shape: payloads are
    * generated/stored next to the row, never shuffled). */
  def realMediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          if (id % 2 == 0)
            MediaRow(id, "bmp", RealCodecs.encodeBmp(
              4 + (id % 32).toInt, 4 + (id % 24).toInt, id))
          else
            MediaRow(id, "wav", RealCodecs.encodeWav(
              8000 + (id % 8).toInt * 1000, 1 + (id % 2).toInt,
              100 + (id % 400).toInt, id))
        }
      }
  }

  /** q78: REAL media decode — parse every payload's actual container
    * header back out (BMP dimensions; WAV rate/channels/sample count +
    * derived duration). Narrow end to end: encode and decode both ride
    * mapPartitions, the only exchange is the final presentation sort. */
  def mediaDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    realMediaTable(spark, dir)
      .mapPartitions { it =>
        it.map { r =>
          val d = RealCodecs.decode(r.payload)
          (r.doc_id, d.format, r.payload.length.toLong,
            d.width.toLong, d.height.toLong, d.sampleRate.toLong,
            d.channels.toLong, d.samples.toLong,
            if (d.sampleRate == 0) 0L
            else d.samples.toLong * 1000L / d.sampleRate)
        }
      }
      .toDF("doc_id", "format", "n_bytes", "width", "height",
        "sample_rate", "channels", "samples", "duration_ms")
      .orderBy("doc_id")
  }
}
