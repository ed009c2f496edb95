package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.sources.Tables

/** DSIR-style importance-resampled data SELECTION (round 19) — the
  * published pretraining-pipeline step (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling") the mixture/cleaning
  * suite was still missing: given a small TARGET domain sample and a big
  * raw pool, score every pool document by how target-like its hashed
  * n-gram feature distribution is and keep the best.
  *
  *   1. features: unigrams hashed into [[Buckets]] buckets (DSIR's
  *      hashed-ngram generative model) via the cross-engine
  *      [[PortableHash.h60]], so the oracle replays the exact buckets;
  *   2. bucket model: add-1-smoothed target vs source (pool) unigram
  *      probabilities, compared in FLOOR-LOG2 space (`length(bin(x))`,
  *      identical in Spark and DuckDB) so the log-likelihood-ratio table
  *      is integer-exact — no float log to drift between engines;
  *   3. per-document importance weight: the sum of its token
  *      occurrences' bucket LLRs (the log importance weight
  *      `log p_target(doc)/p_source(doc)` of the paper);
  *   4. selection: deterministic top-[[TopK]] by (weight, doc_id) — the
  *      paper's Gumbel-top-k resampling with the noise term dropped, so
  *      the selected set is a pure function of the corpus and stays
  *      under the DuckDB oracle (hash-seeded Gumbel noise would pin the
  *      ranking to float `ln` bit-parity across engines).
  *
  * Target domain here: `lang = 'en'` documents; the pool is everything
  * else — "pull the most English-looking documents out of the non-en
  * crawl", the cross-lingual contamination shape DSIR is run for.
  *
  * Scale shape (100 TB): the bucket-count aggregation is a narrow
  * map-side-combined rollup to [[Buckets]] rows; the LLR table is tiny
  * at any plausible bucket count (DSIR uses 10k) and BROADCASTS back
  * onto the token stream — no shuffle of the corpus beyond the per-doc
  * weight rollup, which groups on doc_id (the natural parquet order,
  * high cardinality, no skew). The final selection is orderBy+limit —
  * Spark plans TakeOrderedAndProject (per-partition top-K then a
  * driver-side K-merge), never a global sort. At fleet scale K grows to
  * a token budget; the same plan holds with the limit replaced by the
  * q75-style running-sum budget cut. */
object DataSelection {

  /** Hashed-feature bucket count (paper uses 10k; 64 keeps every bucket
    * populated at the sf0.01 gate corpus so smoothing is exercised, not
    * dominant). */
  val Buckets = 64

  /** Selection size. */
  val TopK = 100

  /** The target domain predicate's language. */
  val TargetLang = "en"

  /** Floor-log2 via bit length: `length(bin(x))` = ⌊log2 x⌋ + 1 for
    * x ≥ 1, same builtin in both engines. */
  private def bitlen(c: Column): Column = length(bin(c)).cast("long")

  /** q247: the selected top-K pool documents with their integer log
    * importance weights. */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs
      .select(col("doc_id"), col("lang"), col("source"),
        explode(split(col("text"), " ")).as("w"))
      .withColumn("b",
        pmod(PortableHash.h60(col("w")), lit(Buckets.toLong)))
    val counts = toks.groupBy("b").agg(
      sum(when(col("lang") === TargetLang, 1L).otherwise(0L)).as("ct"),
      sum(when(col("lang") =!= TargetLang, 1L).otherwise(0L)).as("cs"))
    val totals = counts.agg(
      sum("ct").as("tt"), sum("cs").as("ts"))
    // llr(b) = ⌊log2⌋-space log( p_t(b) / p_s(b) ) with add-1 smoothing:
    // (bitlen(ct+1) - bitlen(tt+B)) - (bitlen(cs+1) - bitlen(ts+B))
    val llr = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        (bitlen(col("ct") + lit(1L)) - bitlen(col("cs") + lit(1L)) +
          bitlen(col("ts") + lit(Buckets.toLong)) -
          bitlen(col("tt") + lit(Buckets.toLong))).as("llr"))
    toks.where(col("lang") =!= TargetLang)
      .join(broadcast(llr), "b")
      .groupBy("doc_id", "lang", "source")
      .agg(count(lit(1)).as("n_tokens"), sum("llr").as("weight"))
      .orderBy(col("weight").desc, col("doc_id"))
      .limit(TopK)
  }
}
