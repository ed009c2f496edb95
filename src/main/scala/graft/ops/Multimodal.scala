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
