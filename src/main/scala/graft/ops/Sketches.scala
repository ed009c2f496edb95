package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.KmvSketch
import graft.functions.PortableHash
import graft.sources.Tables

/** Bounded-state sketch operators over the documents corpus — the
  * "approximate but mergeable" family a 100 TB curation pipeline leans on
  * when exact answers would shuffle the full value universe.
  *
  * Two classic shapes, both kept oracle-exact:
  *  - [[kmvDistinct]]: distinct counting where the sketch IS the answer —
  *    its estimator is deterministic integer arithmetic over the k minimum
  *    hashes, so DuckDB replays it exactly.
  *  - [[heavyHitters]]: a candidate-generation sketch whose superset
  *    guarantee feeds an exact second pass — output equals the exact
  *    frequent-items answer, computed without ever shuffling the full
  *    token universe.
  */
object Sketches {

  /** q133: per-language distinct-token estimate via the [[KmvSketch]]
    * Aggregator, with the exact NDV alongside so the estimator's error is
    * itself part of the checked result.
    *
    * Scale shape: the KMV column aggregates with O(k) state per (map task,
    * lang) and ships ≤ k longs per group through the exchange. The exact
    * `count(distinct h)` column is deliberately retained for comparison —
    * at 100 TB a production run would drop it (it is the expensive
    * full-universe path the sketch replaces) and keep only the sketch. */
  def kmvDistinct(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .select(col("lang"), PortableHash.h60(col("token")).as("h"))
    val kmv = udaf(new KmvSketch.Agg(k), Encoders.product[KmvSketch.In])
    tok.groupBy("lang")
      .agg(kmv(col("h")).as("sk"),
        countDistinct(col("h")).as("ndv_exact"))
      .select(col("lang"),
        col("sk.ndv_est").as("ndv_est"),
        col("sk.kth_hash").as("kth_hash"),
        col("sk.sketch_n").as("sketch_n"),
        col("ndv_exact"))
      .orderBy("lang")
  }

  /** q134: exact global heavy hitters (tokens with frequency > n/kInv)
    * found WITHOUT a full-vocabulary groupBy, via per-partition
    * Misra-Gries summaries (Misra & Gries, "Finding repeated elements",
    * 1982) + an exact recount of the candidate union.
    *
    * Soundness: if Σ_p f_p(x) > Σ_p n_p / kInv then f_p(x) > n_p/kInv on
    * at least one partition p (pigeonhole), and a kInv-counter MG summary
    * of partition p retains any item exceeding n_p/kInv — so the candidate
    * union is a superset of every global heavy hitter regardless of row
    * order, and the exact-recount pass makes the final output
    * deterministic and order-independent (the sketch only prunes).
    *
    * Scale shape: stage 1 is a narrow mapPartitions with O(kInv) state and
    * emits ≤ kInv tokens per partition; stage 2 recounts ONLY candidates
    * via a broadcast semi-join (the aggregate shuffles ≤ |candidates|
    * groups, vs the full token vocabulary for the direct groupBy). The
    * total-count side is a 1-row broadcast. */
  def heavyHitters(spark: SparkSession, dir: String, kInv: Int = 64): DataFrame = {
    import spark.implicits._
    val tok = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
    val cands = tok.as[String].mapPartitions { it =>
      val counters = new java.util.HashMap[String, Long](kInv * 2)
      it.foreach { t =>
        val c = counters.get(t)
        if (c != 0L || counters.containsKey(t)) counters.put(t, c + 1L)
        else if (counters.size < kInv) counters.put(t, 1L)
        else { // decrement-all: amortized O(1) per input token
          val e = counters.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
          }
        }
      }
      counters.keySet().iterator().asScala
    }.toDF("token").distinct()
    val tot = tok.agg(count(lit(1)).as("total_tokens"))
    tok.join(broadcast(cands), "token")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .where(col("cnt") * kInv > col("total_tokens"))
      .select(col("token"), col("cnt"), col("total_tokens"))
      .orderBy(desc("cnt"), col("token"))
  }
}
