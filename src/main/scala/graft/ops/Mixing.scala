package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** TRAINING-MIXTURE construction (round 16) — the re-balancing step
  * every multilingual / multi-source pretraining pipeline runs between
  * cleaning and packing: raw source shares are too skewed to train on
  * (the biggest crawl drowns the curated sources), so each source is
  * sampled at a rate that SMOOTHS the size distribution. The standard
  * move is exponent smoothing (sample ∝ size^α, α < 1 — the
  * multilingual-BERT / XLM-R exposure rule); this operator implements
  * its capped inverse-sqrt form:
  *
  *   rate(s) = min(1, sqrt(T_max / T_s) / 2)
  *
  * where T_s is source s's token total — the smallest sources keep (or
  * approach) all their data while a source 4x the largest's quarter…
  * i.e. the LARGEST source is cut to half its tokens and every smaller
  * source is cut strictly less, the α = 1/2 exposure curve anchored at
  * the corpus head. Selection is DETERMINISTIC per document (a 60-bit
  * hash of the doc id against the scaled rate), so the mixture is
  * reproducible run to run and shard-stable under repartitioning —
  * what a training-data pipeline needs for resumable jobs.
  *
  * Scale shape: one narrow per-source aggregate (O(#sources) driver
  * rows), a broadcast rate table, and a hash-threshold filter inside
  * whole-stage codegen — no shuffle of the corpus, no sort, no
  * sampling state. The rate arithmetic is fixed IEEE double ops
  * (divide, sqrt, halve, floor to ×10^6) in a pinned order, so the
  * DuckDB oracle reproduces every rate bit-for-bit. */
object Mixing {

  /** Rates are published (and compared) as floor(rate × 10^6). */
  val RateScale = 1000000L

  private val M = 1000003L

  private def withTokens(docs: DataFrame): DataFrame =
    docs.withColumn("token_count",
      size(split(col("text"), " ")).cast("long"))

  /** The pinned rate function — ONE expression shared by the operator
    * and the spec so the driver and the oracle can never drift. */
  def rateX1e6(tMax: Long, t: Long): Long =
    math.floor(math.min(1.0,
      math.sqrt(tMax.toDouble / t.toDouble) / 2.0) * 1000000.0).toLong

  /** Epoch cap for [[sourceEpochs]] — no source repeats more than this
    * many times however small it is (repetition past a few epochs stops
    * helping and starts memorizing). */
  val MaxEpochs = 4.0

  /** The pinned exposure function for the UPSAMPLING half: target each
    * source at twice the head source's token count, capped at
    * [[MaxEpochs]] — exposure(s) = min(4, 2·T_max / T_s), published as
    * floor(exposure × 10^6). Every source repeats at least twice (the
    * head included), fractional epochs materialize per document by
    * hash threshold. */
  def exposureX1e6(tMax: Long, t: Long): Long =
    math.floor(math.min(MaxEpochs,
      (2.0 * tMax.toDouble) / t.toDouble) * 1000000.0).toLong

  /** Epochs for [[epochShuffle]]. */
  val ShuffleEpochs = 2

  /** Hash-bucket batches per epoch. */
  val ShuffleBatches = 64L

  /** q233: DETERMINISTIC EPOCH SHUFFLING (round 16) — the dataloader
    * step after mixture + packing: each training epoch visits every
    * document exactly once in a pseudorandom order that is
    * REPRODUCIBLE (resume a crashed job mid-epoch, re-derive any
    * batch's contents bit-for-bit) and RESHUFFLED between epochs.
    * The order is pure hash arithmetic — batch =
    * `h60("shuffle:<epoch>:" || doc_id) mod B`, within-batch position
    * by the same hash — so there is NO global sort anywhere: batch
    * assignment is a codegen'd projection, the only window is
    * per-(epoch, batch) — bounded partitions, the shape that survives
    * any corpus size. The per-batch ORDER-WEIGHTED digest
    * (Σ position · (doc_id mod M)) pins the exact visiting sequence,
    * not just membership; coverage (every doc once per epoch) is the
    * row/ids invariant the oracle re-derives. */
  def epochShuffle(spark: SparkSession, dir: String): DataFrame = {
    val docs = withTokens(Tables.documents(spark, dir))
      .select(col("doc_id"), col("token_count"))
    val epochs = docs.withColumn("epoch",
      explode(array((0 until ShuffleEpochs).map(lit(_)): _*)))
      .withColumn("epoch", col("epoch").cast("long"))
    val h = graft.functions.PortableHash.h60(concat(
      lit("shuffle:"), col("epoch"), lit(":"), col("doc_id")))
    val placed = epochs
      .withColumn("h", h)
      .withColumn("batch", pmod(col("h"), lit(ShuffleBatches)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("epoch", "batch").orderBy("h", "doc_id")
    placed
      .withColumn("pos", row_number().over(w).cast("long"))
      .groupBy("epoch", "batch")
      .agg(
        count(lit(1)).as("docs"),
        sum("token_count").as("tokens"),
        sum(col("doc_id") % M).as("ids_digest"),
        sum(col("pos") * (col("doc_id") % M)).as("order_digest"))
      .orderBy("epoch", "batch")
  }

  /** q203: the UPSAMPLING relation (q202's other half — a real mixture
    * both downsamples the head and REPEATS the small curated sources):
    * each source's documents are emitted floor(exposure) times plus one
    * more for the hash-selected fraction, through a real generator
    * (`explode(sequence(1, copies))`) so the emitted dataset exists,
    * then folded back per source. The emitted-id checksum
    * Σ (doc_id mod M)·rep pins the exact multiset of copies (the
    * oracle collapses the rep sum arithmetically:
    * Σ_{rep=1..c} rep = c(c+1)/2). Deterministic and shard-stable like
    * q202. */
  def sourceEpochs(spark: SparkSession, dir: String): DataFrame = {
    val docs = withTokens(Tables.documents(spark, dir))
    val perSource = docs.groupBy("source")
      .agg(sum("token_count").as("tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val tMax = perSource.map(_._2).max
    import spark.implicits._
    val exposures = perSource
      .map { case (s, t) => (s, exposureX1e6(tMax, t)) }.toSeq
      .toDF("source", "exposure_x1e6")
    docs.join(broadcast(exposures), "source")
      .withColumn("copies",
        expr(s"exposure_x1e6 div $RateScale") +
          when(pmod(graft.functions.PortableHash.h60(
            concat(lit("epoch:"), col("doc_id").cast("string"))),
            lit(RateScale)) < col("exposure_x1e6") % RateScale, 1L)
            .otherwise(0L))
      // copies >= 2 by construction (exposure >= 2 at every source);
      // sequence(1, copies) is therefore never empty/descending
      .withColumn("rep", explode(expr("sequence(1L, copies)")))
      .groupBy("source")
      .agg(
        max("exposure_x1e6").as("exposure_x1e6"),
        count(lit(1)).as("docs_emitted"),
        sum("token_count").as("tokens_emitted"),
        sum((col("doc_id") % M) * col("rep")).as("emitted_checksum"))
      .orderBy("source")
  }

  /** q202: the mixture relation — one row per source: its raw volume,
    * the smoothed sampling rate, and the kept subset's counts + id
    * checksum (the kept SET is the deliverable; the checksum pins it). */
  def sourceMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = withTokens(Tables.documents(spark, dir))
    val perSource = docs.groupBy("source")
      .agg(sum("token_count").as("tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val tMax = perSource.map(_._2).max
    import spark.implicits._
    val rates = perSource
      .map { case (s, t) => (s, rateX1e6(tMax, t)) }.toSeq
      .toDF("source", "rate_x1e6")
    docs.join(broadcast(rates), "source")
      .withColumn("kept",
        pmod(graft.functions.PortableHash.h60(
          concat(lit("mix:"), col("doc_id").cast("string"))),
          lit(RateScale)) < col("rate_x1e6"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        sum("token_count").as("tokens"),
        max("rate_x1e6").as("rate_x1e6"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("docs_kept"),
        sum(when(col("kept"), col("token_count")).otherwise(0L))
          .as("tokens_kept"),
        coalesce(sum(when(col("kept"), col("doc_id") % M)), lit(0L))
          .as("kept_id_checksum"))
      .orderBy("source")
  }
}
