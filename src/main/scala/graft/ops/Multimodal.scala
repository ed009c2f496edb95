package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract run as a
  * partition-local typed transformation (the Scala analog of
  * `mapInPandas` batches — same schema/partitioning contract).
  *
  * The container has no image/audio codecs, so the decoder is a clearly
  * marked deterministic STUB ([[FakeDecoder]]): the Spark-side plumbing —
  * binary schema, batch iteration, feature schema, partition preservation —
  * is real and tested; swap [[FakeDecoder.decode]] for a codec at
  * deployment. */
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
}
