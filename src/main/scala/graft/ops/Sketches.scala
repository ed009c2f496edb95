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

  /** q138: KMV SET ALGEBRA (Beyer et al., "On synopses for distinct-value
    * estimation over sliding windows", SIGMOD 2007) — per-source-pair
    * union / intersection / Jaccard estimates computed from the per-source
    * k-minimum sketches ALONE. This is the mergeability payoff: once each
    * source carries its O(k) sketch, any cross-source overlap question is
    * O(k) array algebra on the pair — no re-scan of either source.
    *
    * Estimators (exact integer arithmetic, HUGEINT-replayed by the
    * oracle): merged sketch = k smallest of the union of the two lists;
    * K = its k-th minimum; c = common values ≤ K (every such value is in
    * BOTH lists since K ≤ each list's own k-th min); est_union =
    * ⌊(k−1)·2^60/K⌋; est_intersect = ⌊c·est_union/k⌋; Jaccard×1000 =
    * ⌊c·1000/min(k, |merged∪|)⌋. When both sketches are under-full the
    * merged set is the exact value universe and every estimate is exact.
    *
    * The exact NDVs ride alongside for error visibility (like q133, the
    * expensive full-universe path a production run would drop): the
    * pairwise exact intersection joins the distinct (source, hash)
    * relation with itself on the 8-byte hash.
    *
    * Scale shape: sketches aggregate with O(k) state (map-side combined);
    * the pair relation is S²/2 rows of 2k-long arrays, all-narrow array
    * functions; the single UDF (BigInt floor division past int64) runs on
    * S²/2 rows — never on corpus rows. */
  def sketchSetOps(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .select(col("source"), PortableHash.h60(col("token")).as("h"))
    val kmvList = udaf(new KmvSketch.ListAgg(k), Encoders.product[KmvSketch.In])
    val sk = tok.groupBy("source")
      .agg(kmvList(col("h")).as("mins"), countDistinct(col("h")).as("ndv"))
    val a = sk.select(col("source").as("source_a"), col("mins").as("ma"),
      col("ndv").as("nda"))
    val b = sk.select(col("source").as("source_b"), col("mins").as("mb"),
      col("ndv").as("ndb"))
    // (k−1)·2^60 and c·est_union both exceed int64 — BigInt, like the
    // Aggregator's finish; truncation == floor on nonnegative operands
    val est = udf((msize: Int, kth: Long, c: Int) =>
      if (msize < k) (msize.toLong, c.toLong)
      else {
        val u = (BigInt(k - 1) << 60) / kth
        (u.toLong, ((BigInt(c) * u) / k).toLong)
      })
    val d = tok.distinct()
    val ex = d.as("x").join(d.as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("exact_intersect"))
    a.join(b, col("source_a") < col("source_b"))
      .withColumn("mu", array_union(col("ma"), col("mb")))
      .withColumn("msize", size(col("mu")))
      .withColumn("kth",
        when(col("msize") >= k, element_at(array_sort(col("mu")), k)))
      .withColumn("common", array_intersect(col("ma"), col("mb")))
      .withColumn("c", when(col("kth").isNotNull,
          size(filter(col("common"), x => x <= col("kth"))))
        .otherwise(size(col("common"))))
      .withColumn("e", est(col("msize"), coalesce(col("kth"), lit(0L)),
        col("c")))
      .join(ex, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        col("c").cast("long").as("c_common"),
        col("e._1").as("est_union"),
        col("e._2").as("est_intersect"),
        floor(col("c") * 1000 / least(lit(k), col("msize")))
          .as("jaccard_x1000"),
        (col("nda") + col("ndb") -
          coalesce(col("exact_intersect"), lit(0L))).as("exact_union"),
        coalesce(col("exact_intersect"), lit(0L)).as("exact_intersect"))
      .orderBy("source_a", "source_b")
  }
}
