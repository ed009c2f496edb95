package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{PlanCache, Tables}

/** Deduplication operators for large-scale training-data pipelines: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash and embedding-cosine near-dup.
  *
  * The documents fixture has no natural duplicates, so [[corpus]] injects
  * deterministic exact copies (doc_id % 5) and near-duplicates with a suffix
  * (doc_id % 7) — derivable identically in DuckDB SQL for the oracle.
  *
  * Scale design: every method is shuffle-bounded by (band/bucket, signature)
  * keys, never by a document cross-join; candidate verification only runs
  * inside buckets. At 100 TB the shingle→bucket join is the only wide
  * exchange and it is keyed on high-cardinality hashes (saltable if skewed).
  */
object Dedup {

  /** documents ∪ exact copies (ids +1_000_000) ∪ near-dup suffixed copies
    * (ids +2_000_000). */
  def corpus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.unionByName(
      d.where(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
      .unionByName(
        d.where(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 2000000L)
          .withColumn("text", concat(col("text"),
            lit(" graft near duplicate suffix")))
          .withColumn("n_chars", col("n_chars") + 28L))
  }

  /** Exact dedup keyed on a 128-bit digest: the digest is computed in the
    * narrow scan and the groupBy shuffles 16-byte `unhex(md5(text))` keys —
    * the corpus BODY never enters an exchange (keying on raw text would
    * shuffle the entire 100 TB corpus). Two distinct texts colliding in 128
    * bits (~n²/2¹²⁹) is beyond reach at any corpus size; the DuckDB oracle
    * keeps the text-keyed form, so a collision would surface as a t2
    * mismatch — the same documented-equivalence class as q21's 64-bit
    * shingle join keys. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .select(col("doc_id"), unhex(md5(col("text"))).as("digest"))
      .groupBy("digest")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("copies"))
      .where(col("copies") > 1)
      .select("keeper", "copies")
      .orderBy("keeper")

  /** Cached shingle set of the dedup corpus (shared by the Jaccard and
    * MinHash paths — one derivation per session). */
  def corpusShingles(spark: SparkSession, dir: String): DataFrame =
    PlanCache.cached(spark, s"shingles|$dir")(shingles(corpus(spark, dir)))

  /** 5-word shingles, distinct per document. */
  def shingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(size(w) - 4, 1))," +
          " i -> array_join(slice(w, i, 5), ' '))")).as("g"))
      .distinct()

  /** Default doc-frequency cap for the shingle buckets (scale path): a
    * shingle shared by more than this many documents is treated as a
    * stop-shingle and dropped before pair generation. Bounds both the
    * per-bucket pair count (≤ C(cap, 2) = 8,128 pairs) and the size of each
    * bucket-collected array row (≤ cap structs), the two quadratic failure
    * modes of web-corpus shingles ("the of and …" n-grams shared by 1M docs
    * would alone emit 5·10¹¹ pairs and one 16 MB array row). Callers that
    * need the exact Jaccard relation (the DuckDB oracle form) pass
    * `maxDocFreq = 0` explicitly. */
  val DefaultMaxDocFreq = 128

  /** n-gram Jaccard near-dup pairs: inverted shingle index bucket-collected,
    * pairs generated inside each bucket, then |A∩B| / |A∪B| ≥ 0.8 decided in
    * pure integer arithmetic (inter·100 ≥ 80·union) so the threshold is
    * engine-exact.
    *
    * Shape: bucket-collect (groupBy shingle, collect doc list, emit the
    * C(n,2) pairs per bucket) instead of an inverted-index self-join — one
    * narrow exchange of (long, long) rows replaces shuffling/broadcasting
    * the shingle table twice. Pair volume is identical either way (both are
    * Σ C(|bucket|, 2)); the collect form just skips the join's hash-table
    * build over every shingle row.
    *
    * `maxDocFreq` (0 = exact) drops shingles shared by more than that many
    * documents before pair generation — the standard guard against the
    * quadratic blow-up of stop-word-like shingles at web-corpus scale. ON
    * by default ([[DefaultMaxDocFreq]]): the capped result is a documented
    * under-approximation (pairs supported ONLY by ultra-common shingles are
    * missed — at ≥80% Jaccard such pairs barely exist, because a pair needs
    * most of its shingles shared and specific shingles dominate any real
    * document). The exact form (`maxDocFreq = 0`) is the oracle
    * configuration. */
  def ngramJaccard(spark: SparkSession, dir: String,
      thresholdPct: Int = 80, maxDocFreq: Int = DefaultMaxDocFreq): DataFrame =
    ngramPairs(spark, dir, thresholdPct, maxDocFreq)
      .orderBy("id_a", "id_b")

  /** [[ngramJaccard]] without the final presentation sort — the form
    * consumed as an edge feed (dup-cluster propagation) where row order is
    * irrelevant and a global sort of the pair set would be pure waste. */
  def ngramPairs(spark: SparkSession, dir: String,
      thresholdPct: Int = 80, maxDocFreq: Int = DefaultMaxDocFreq): DataFrame =
    ngramPairsOf(corpusShingles(spark, dir), thresholdPct, maxDocFreq)

  /** Session-cached EXACT pair relation at the default threshold — the
    * oracle configuration, shared by the q21 report (which only adds the
    * presentation sort) and dup-cluster propagation (which consumes it as
    * the edge feed): one bucket-collect pass per session, the same
    * PlanCache contract as the scan families. Orders of magnitude smaller
    * than the shingle table (only ≥80%-Jaccard pairs survive). */
  def ngramPairsExact(spark: SparkSession, dir: String): DataFrame =
    PlanCache.cached(spark, s"ngram_pairs|$dir")(
      ngramPairs(spark, dir, maxDocFreq = 0))

  /** Pair generation over an arbitrary distinct (doc_id, g) shingle set —
    * the testable core of [[ngramJaccard]]. */
  def ngramPairsOf(shingleSet: DataFrame,
      thresholdPct: Int = 80, maxDocFreq: Int = DefaultMaxDocFreq): DataFrame = {
    // bucket key = xxhash64(shingle): the bucket-collect shuffle carries
    // 8-byte longs instead of ~30-byte strings and equality checks are
    // primitive. Counts equal the string-keyed form's unless two distinct
    // shingles collide in 64 bits (~n²/2⁶⁵ ≈ 10⁻⁷ at 1M shingles); the
    // DuckDB oracle keeps string keys, so a collision would surface as a
    // t2 mismatch.
    val sh = shingleSet
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
    // per-doc shingle count rides the bucket rows as a struct field, so no
    // post-aggregation size join is needed at all — a join back to a
    // one-row-per-doc size table can neither broadcast at corpus scale nor
    // beat carrying 8 more bytes through the existing shuffles
    val sized = sh.withColumn("sz",
      count(lit(1)).over(Window.partitionBy("doc_id")))
    val buckets = sized.groupBy("gh")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sz"))))
        .as("ids"))
      .where(size(col("ids")) > 1 &&
        (if (maxDocFreq > 0) size(col("ids")) <= maxDocFreq else lit(true)))
    // ids is sorted by (unique) doc_id, so pairing each element with its
    // successors yields exactly the id_a < id_b pairs of the bucket
    val pairs = buckets
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids) - i - 1), " +
          "y -> struct(x.doc_id AS id_a, x.sz AS sz_a, " +
          "y.doc_id AS id_b, y.sz AS sz_b))))")).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.sz_a").as("sz_a"), col("p.sz_b").as("sz_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .withColumn("union_sz", col("sz_a") + col("sz_b") - col("inter"))
      .where(col("inter") * 100 >= lit(thresholdPct) * col("union_sz"))
      .select(col("id_a"), col("id_b"),
        floor(col("inter") * 1000 / col("union_sz")).as("jaccard_x1000"))
  }

  /** q154: PREFIX-FILTERED similarity join (the SSJoin/PPJoin principle —
    * Chaudhuri, Ganti & Kaushik, ICDE 2006; Xiao et al., WWW 2008) — the
    * third EXACT reduction of the all-pairs Jaccard join, next to the
    * doc-frequency cap (q21's scale default) and MinHash-LSH (q22,
    * probabilistic): order every document's shingles by GLOBAL RARITY
    * (ascending document frequency, shingle-hash tiebreak) and index only
    * each doc's first |d| − ⌈τ·|d|⌉ + 1 shingles. If J(a,b) ≥ τ, the
    * first shingle the two documents share (in the global order) must
    * sit inside BOTH prefixes — were it past a's prefix, the ≥ p_a
    * earlier a-shingles would all be absent from b, capping the overlap
    * at |a| − p_a = ⌈τ|a|⌉ − 1 < τ|a| ≤ τ|a∪b| ≤ overlap, a
    * contradiction — so scanning only prefix buckets loses nothing, and
    * the verify stage recomputes the exact Jaccard over the full sets.
    * Equality with the all-pairs relation is the ORACLE (q21's), not an
    * assertion.
    *
    * Scale shape: prefix buckets are by construction the RAREST shingles
    * (low df ⇒ small buckets ⇒ few pairs); candidates then verify via
    * two co-partitioned joins carrying 16-byte (id, hash) rows. The
    * doc-frequency relation is one hash aggregate reused from the bucket
    * build's own key. */
  /** (doc_id, gh, sz): each doc's hashed shingles carrying the doc's set
    * size — the shared verify-stage input of q154/q155. */
  private def hashedSized(spark: SparkSession, dir: String): DataFrame =
    corpusShingles(spark, dir)
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("doc_id")))

  /** Session-cached per-doc sorted shingle-hash arrays — the verify
    * stage's build side, shared by EVERY blocking scheme that funnels
    * into [[verifyExact]] (q154's prefix filter, q155's sorted
    * neighborhood): the groupBy + collect_set over the full shingle
    * relation is the verify stage's expensive half, and it is a pure
    * function of the corpus, so the second scheme in a session gets it
    * free (round 13 — this was rebuilt per query and showed up as
    * q155's whole bench cost). */
  private def shingleSets(spark: SparkSession, dir: String): DataFrame =
    PlanCache.cached(spark, s"shingle-sets|$dir")(
      hashedSized(spark, dir).groupBy("doc_id")
        .agg(sort_array(collect_set(col("gh"))).as("gs"))
        .withColumn("sz", size(col("gs")).cast("long")))

  /** Exact-Jaccard verification of a candidate pair set — the stage every
    * blocking scheme funnels into. Each doc's distinct hashed shingles
    * collapse ONCE into a sorted array (session-cached across schemes);
    * candidates then join the two arrays by id (row count stays
    * |candidates| — no per-shingle row explosion through the join) and
    * the intersection is a narrow `array_intersect` inside codegen. vs
    * the exploded two-join form, the exchanges carry |candidates| array
    * rows (~set_size·8 B each) instead of |candidates|·|set| scalar
    * rows. */
  private def verifyExact(spark: SparkSession, dir: String,
      cands: DataFrame, thresholdPct: Int): DataFrame = {
    val sets = shingleSets(spark, dir)
    cands
      .join(sets.select(col("doc_id").as("id_a"), col("gs").as("ga"),
        col("sz").as("sz_a")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("gs").as("gb"),
        col("sz").as("sz_b")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .withColumn("union_sz", col("sz_a") + col("sz_b") - col("inter"))
      .where(col("inter") * 100 >= lit(thresholdPct) * col("union_sz"))
      .select(col("id_a"), col("id_b"),
        floor(col("inter") * 1000 / col("union_sz")).as("jaccard_x1000"))
      .orderBy("id_a", "id_b")
  }

  def prefixPairs(spark: SparkSession, dir: String,
      thresholdPct: Int = 80): DataFrame = {
    val sized = hashedSized(spark, dir)
    val dfreq = sized.groupBy("gh").agg(count(lit(1)).as("dfreq"))
    val wp = Window.partitionBy("doc_id").orderBy(col("dfreq"), col("gh"))
    val prefix = sized.join(dfreq, "gh")
      .withColumn("rn", row_number().over(wp))
      .where(col("rn") <=
        expr(s"sz - ((sz * $thresholdPct + 99) div 100) + 1"))
    val cands = prefix.groupBy("gh")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids) - i - 1), " +
          "y -> struct(x AS id_a, y AS id_b))))")).as("p"))
      .select("p.id_a", "p.id_b").distinct()
    verifyExact(spark, dir, cands, thresholdPct)
  }

  /** q155: SORTED-NEIGHBORHOOD dedup (Hernández & Stolfo, SIGMOD 1995) —
    * the fourth blocking family next to the df-cap, LSH and the prefix
    * filter: documents sort by a similarity-preserving key (the q23
    * SimHash — near-dups differ in few bits, so they sort near each
    * other), and candidates are only the pairs within a sliding window
    * of `w` in that order; exact verify restores precision. Unlike q154
    * this blocking is deliberately LOSSY (recall < 1) in exchange for a
    * FIXED O(n·w) candidate budget that no shingle-frequency skew can
    * blow up — the bound a latency-capped pipeline buys. Determinism:
    * the sort key tiebreaks by doc_id and the window is an equi-join on
    * neighbor rank, so the oracle replays the exact blocking decision,
    * not just the verified survivors.
    *
    * Scale shape: the global rank is TWO-LEVEL (within-bucket
    * row_number over the signature's top-byte buckets + a ≤256-row
    * broadcast of bucket bases — the packSequences pattern; no global
    * window); the window join is an equi-join on rank. */
  /** Session-cached SimHash signatures (shared by q23 and q155's sort
    * key — the signature aggregate is the expensive half of both). */
  def simhashCached(spark: SparkSession, dir: String): DataFrame =
    PlanCache.cached(spark, s"simhash|$dir")(simhash(corpus(spark, dir)))

  def snmPairs(spark: SparkSession, dir: String, w: Int = 8,
      thresholdPct: Int = 80): DataFrame = {
    val sigs = simhashCached(spark, dir).select("doc_id", "simhash")
    val bucketed = sigs.withColumn("bkt",
      expr("simhash div 4503599627370496")) // top 8 of the 60 bits
    val wb = Window.partitionBy("bkt").orderBy("simhash", "doc_id")
    val ranked = bucketed.withColumn("rn_in", row_number().over(wb))
    val bases = bucketed.groupBy("bkt").agg(count(lit(1)).as("n"))
      .withColumn("base", coalesce(sum("n").over(
        Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bkt", "base")
    val glob = ranked.join(broadcast(bases), "bkt")
      .select(col("doc_id"), (col("base") + col("rn_in")).as("rn"))
    val right = glob
      .withColumn("i", explode(sequence(lit(1), lit(w))))
      .select((col("rn") - col("i")).as("rn_l"), col("doc_id").as("d_r"))
    val cands = glob
      .select(col("rn").as("rn_l"), col("doc_id").as("d_l"))
      .join(right, "rn_l")
      .select(least(col("d_l"), col("d_r")).as("id_a"),
        greatest(col("d_l"), col("d_r")).as("id_b"))
      .distinct()
    verifyExact(spark, dir, cands, thresholdPct)
  }

  /** q157: LEAKAGE-FREE train/validation SPLIT — the assignment unit is
    * the DUP CLUSTER, not the document: a near-duplicate of a validation
    * doc sitting in train is silent eval contamination, so every doc
    * inherits its q56 component representative (singletons are their own
    * group) and the split hashes the GROUP id (h60("split:"+group) ‰ <
    * valPermille ⇒ val). The relation carries the audit alongside the
    * per-source funnel: `cross_split_dup_pairs` counts dup pairs whose
    * sides landed in different splits — ZERO by construction, and the
    * oracle recomputes it from the transitive closure rather than
    * trusting the engine's claim.
    *
    * Scale shape: one left join onto the (dup-docs-only) cluster
    * relation, a narrow hash split, and the audit join over the
    * session-cached exact pair relation; output frames are O(#sources). */
  def leakFreeSplit(spark: SparkSession, dir: String,
      valPermille: Int = 100): DataFrame = {
    val docs = corpus(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("token_count"))
    val clusters = dupClusters(spark, dir).select("doc_id", "cluster_rep")
    val tagged = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("group_id", coalesce(col("cluster_rep"), col("doc_id")))
      .withColumn("is_val",
        graft.functions.PortableHash.h60(
          concat(lit("split:"), col("group_id").cast("string")))
          % 1000 < valPermille)
    val side = tagged.select(col("doc_id"), col("is_val"))
    val leaks = ngramPairsExact(spark, dir).select("id_a", "id_b")
      .join(side.select(col("doc_id").as("id_a"), col("is_val").as("va")),
        "id_a")
      .join(side.select(col("doc_id").as("id_b"), col("is_val").as("vb")),
        "id_b")
      .agg(coalesce(sum(when(col("va") =!= col("vb"), 1L).otherwise(0L)),
        lit(0L)).as("cross_split_dup_pairs"))
    tagged.groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(when(!col("is_val"), 1L).otherwise(0L)).as("train_docs"),
        sum(when(col("is_val"), 1L).otherwise(0L)).as("val_docs"),
        sum(when(!col("is_val"), col("token_count")).otherwise(0L))
          .as("train_tokens"),
        sum(when(col("is_val"), col("token_count")).otherwise(0L))
          .as("val_tokens"))
      .crossJoin(broadcast(leaks))
      .orderBy("source")
  }

  /** MinHash signatures: k permutations h_i(x) = (a_i·m(x) + b_i) mod p over
    * the cross-engine [[graft.functions.PortableHash]] of each shingle
    * (oracle-checkable; `hash`/murmur3 is a drop-in for engine-only use). */
  def minhashSignatures(sh: DataFrame, k: Int = 32): DataFrame = {
    val p = 2147483647L // 2^31 - 1, Mersenne prime
    // the shingle hash is hoisted into one projected column: inside the
    // aggregate list it would be re-evaluated per permutation (k x per row).
    // h60 < 2^60 is always positive, so a plain mod lands in [0, p).
    val hashed = sh.withColumn("hc",
      graft.functions.PortableHash.h60(col("g")) % p)
    val perms = (0 until k).map { i =>
      val a = 1L + 2L * i + 1L // odd multipliers
      val b = 7919L * (i + 1)
      min((col("hc") * a + b) % p).as(s"h$i")
    }
    hashed.groupBy("doc_id").agg(perms.head, perms.tail: _*)
  }

  /** MinHash + LSH banding: signatures split into bands of `rowsPerBand`,
    * band-hash bucket join yields candidates, verified by signature
    * similarity. One shuffle on (band, bandHash) — never all-pairs. */
  def minhashLsh(spark: SparkSession, dir: String, k: Int = 32,
      rowsPerBand: Int = 4, minMatchFrac: Double = 0.7): DataFrame = {
    val sigs = PlanCache.cached(spark, s"minhash$k|$dir")(
      minhashSignatures(corpusShingles(spark, dir), k))
    val bands = k / rowsPerBand
    // bucket key = xxhash64 of the band's signature tuple: the candidate
    // shuffle carries 8-byte longs instead of the ~40-byte signature string.
    // Equal signatures always hash equal, so hash-bucketing finds a SUPERSET
    // of the exact-equality candidates; any extra (64-bit-collision) pair
    // still faces the >= ceil(0.7k) signature-match verification below, so
    // the OUTPUT equals exact bucketing (the DuckDB oracle) unless a
    // colliding pair also shares 23/32 positions — ~2^-64 per pair, the same
    // class of risk q21 documents for its shingle-hash join keys.
    val bandCols = (0 until bands).map { b =>
      val cs = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cs: _*).as("bucket")).as(s"bb$b")
    }
    val buckets = sigs
      .select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"), explode(array((0 until bands).map(b =>
        col(s"bb$b")): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    val cand = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val matches = (0 until k).map(i =>
      when(col(s"a.h$i") === col(s"b.h$i"), 1).otherwise(0))
      .reduce(_ + _)
    // no broadcast hint here: the signature table is one row per document
    // (k longs), so at corpus scale it cannot broadcast — AQE already
    // converts these to broadcast joins when the side happens to be small
    cand
      .join(sigs.as("a"), col("id_a") === col("a.doc_id"))
      .join(sigs.as("b"), col("id_b") === col("b.doc_id"))
      .withColumn("sig_matches", matches.cast("long"))
      .where(col("sig_matches") >= math.ceil(minMatchFrac * k).toLong)
      .select("id_a", "id_b", "sig_matches")
      .orderBy("id_a", "id_b")
  }

  /** Fixed-size chunk dedup statistics: documents are cut into
    * non-overlapping `chunkTokens`-token chunks (the granularity training
    * pipelines dedup across documents), then per source: total chunks,
    * chunks whose text occurs more than once corpus-wide, distinct chunks.
    *
    * Chunk identity travels as xxhash64 of the chunk text — the frequency
    * shuffle carries 8-byte longs, equal to string keying modulo the
    * ~n²/2⁶⁵ 64-bit collision class q21 documents (the DuckDB oracle keeps
    * string keys, so a collision would surface as a t2 mismatch). */
  def chunkStats(spark: SparkSession, dir: String,
      chunkTokens: Int = 10): DataFrame = {
    val chunks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"), explode(expr(
        s"transform(sequence(1, size(w), $chunkTokens), " +
          s"i -> array_join(slice(w, i, $chunkTokens), ' '))")).as("chunk"))
      .withColumn("ch", xxhash64(col("chunk")))
      .select("source", "ch")
    val freq = chunks.groupBy("ch").agg(count(lit(1)).as("c"))
    chunks.join(freq, "ch")
      .groupBy("source")
      .agg(
        count(lit(1)).as("chunks"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("shared_chunks"),
        countDistinct("ch").as("distinct_chunks"))
      .orderBy("source")
  }

  /** Duplicated-SPAN coverage (exact-substring dedup, the
    * deduplicate-training-data shape): for every document, how much of it
    * is covered by k-token grams that also occur in ANOTHER document. The
    * standard scalable approximation of suffix-array substring dedup —
    * explode overlapping k-grams, keep grams seen in ≥2 distinct docs,
    * union the per-doc [s, s+k) start intervals into a covered-token count.
    *
    * Scale shape: one narrow scan explodes |tokens| gram rows; the gram
    * frequency agg partial-combines map-side and the dup decision is
    * `min(doc) != max(doc)` (no count-distinct); the starts→dup join is
    * hash-co-partitioned on the 8-byte gram key; interval union is a lag
    * window partitioned BY DOCUMENT (bounded by doc length — never a
    * corpus-wide or per-source reducer): each start contributes
    * min(k, gap-to-previous-start) tokens. Gram identity travels as
    * xxhash64 — the q21-documented 64-bit equivalence class (the oracle
    * keys on gram text). */
  def dupSpans(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val toks = corpus(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("n_tokens", size(col("w")).cast("long"))
    val grams = toks.where(col("n_tokens") >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(w) - ${k - 1}), " +
          s"i -> xxhash64(array_join(slice(w, i, $k), ' ')))")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("s"),
        col("col").as("gh"))
    // cross-doc decision via a window over the ONE gram relation (round
    // 19, guide §1.2): the former groupBy + self-join re-exploded every
    // k-gram a second time; min/max over the gh partition make the same
    // `min(doc) != max(doc)` call on the single exploded pass (the
    // window's gh exchange replaces the join's, not adds to it)
    val wg = Window.partitionBy("gh")
    val w = Window.partitionBy("doc_id").orderBy("s")
    val runs = grams
      .withColumn("mn", min("doc_id").over(wg))
      .withColumn("mx", max("doc_id").over(wg))
      .where(col("mn") =!= col("mx"))
      .drop("mn", "mx")
      .withColumn("ps", lag(col("s"), 1).over(w))
      .withColumn("contrib",
        when(col("ps").isNull, lit(k.toLong))
          .otherwise(least(lit(k.toLong), col("s") - col("ps"))))
    val cov = runs.groupBy("doc_id")
      .agg(count(lit(1)).as("dup_starts"),
        sum("contrib").as("covered_tokens"))
    toks.select("doc_id", "n_tokens")
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_starts"), lit(0L)).as("dup_starts"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        floor(coalesce(col("covered_tokens"), lit(0L)) * 1000 /
          col("n_tokens")).as("dup_x1000"))
      .orderBy("doc_id")
  }

  /** Exact-substring dedup REMOVAL stage (q86): the decision step over
    * [[dupSpans]]' coverage — every cross-document duplicated k-gram keeps
    * ONE canonical occurrence (the min-doc_id holder) and is masked
    * everywhere else; per source, how many tokens removal would strip.
    * The interval-union arithmetic is the same lag-window run-length trick
    * as [[dupSpans]] (union of [s, s+k-1] from sorted starts), applied
    * AFTER the keeper filter, so a document's removed-token count is the
    * exact size of its masked position set. Within-document repeats of a
    * gram that occurs in no other document are not masked (cross-doc
    * definition, consistent with [[dupSpans]]).
    *
    * Scale shape: identical to [[dupSpans]] — the wide exchanges are the
    * gram groupBy and the gram join, both keyed on 64-bit `xxhash64`
    * values (never gram text; the oracle keys on the text form, so a
    * 64-bit collision would surface as a t2 mismatch — q21's documented
    * class); the per-doc window partitions on doc_id. */
  def dupSpanRemoval(spark: SparkSession, dir: String, k: Int = 5)
      : DataFrame = {
    val docs = corpus(spark, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .withColumn("n_tokens", size(col("w")).cast("long"))
    val grams = docs.where(col("n_tokens") >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(w) - ${k - 1}), " +
          s"i -> xxhash64(array_join(slice(w, i, $k), ' ')))")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("s"),
        col("col").as("gh"))
    // keeper decision via a window over the ONE gram relation (round 19,
    // same rewrite as dupSpans): min/max over the gh partition replace
    // the groupBy + self-join that re-exploded every k-gram twice
    val wg = Window.partitionBy("gh")
    val w = Window.partitionBy("doc_id").orderBy("s")
    val runs = grams
      .withColumn("keeper", min("doc_id").over(wg))
      .withColumn("mx", max("doc_id").over(wg))
      .where(col("keeper") =!= col("mx") && col("doc_id") =!= col("keeper"))
      .drop("mx")
      .withColumn("ps", lag(col("s"), 1).over(w))
      .withColumn("contrib",
        when(col("ps").isNull, lit(k.toLong))
          .otherwise(least(lit(k.toLong), col("s") - col("ps"))))
    val rem = runs.groupBy("doc_id")
      .agg(sum("contrib").as("removed_tokens"))
    docs.select("doc_id", "source", "n_tokens")
      .join(rem, Seq("doc_id"), "left")
      .withColumn("removed_tokens",
        coalesce(col("removed_tokens"), lit(0L)))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(when(col("removed_tokens") > 0, 1L).otherwise(0L))
          .as("docs_touched"),
        sum("n_tokens").as("tokens_total"),
        sum("removed_tokens").as("tokens_removed"))
      .withColumn("removed_x1000",
        floor(col("tokens_removed") * 1000 / col("tokens_total")))
      .orderBy("source")
  }

  /** Connected components over the near-dup pair graph — the step that
    * turns pairwise matches into dedup GROUPS with one representative
    * (keeper) per group. Pregel-style min-label propagation: labels converge
    * in O(component diameter) rounds under a driver-coordinated fixpoint
    * check (the standard Spark connected-components shape; GraphX's CC is
    * this loop). Near-dup components are shallow stars/chains in practice,
    * so rounds stay in single digits even at corpus scale.
    *
    * Cost shape: exactly ONE Spark action per round. The adjacency is
    * augmented with a self-loop per vertex, so the round is a single
    * `join → groupBy(min)` (no left-join back to the previous labels), and
    * convergence falls out of the same action for free: labels only ever
    * decrease, so Σ label is strictly monotone until the fixpoint — the
    * round's aggregate materializes the persisted labels AND returns
    * (Σ label, count) in one job, and an unchanged sum IS convergence. The
    * previous shape paid two actions per round (materialize + a separate
    * changed-row count via an extra join); at 32-partition scale that was
    * pure scheduler overhead, and it is why this operator was the most
    * expensive bench query of round 4.
    *
    * Uses the EXACT pair relation (`maxDocFreq = 0`) — the q56 oracle
    * computes the transitive closure of the exact Jaccard pairs, and a
    * capped edge feed could split a component.
    *
    * The returned frame is `localCheckpoint`ed: the loop's per-round caches
    * are all released before returning (no session-lifetime block leak), and
    * the result's lineage does not grow with the iteration count.
    *
    * Returns one row per document that occurs in a dup pair:
    * (doc_id, cluster_rep = min doc_id of its component, cluster_size). */
  /** Pairs below this count take the driver union-find fast path of
    * [[dupClusters]]; above it, the distributed propagation loop. 1M pairs
    * ≈ 16 MB collected — far under any driver budget, while a corpus whose
    * ≥80%-Jaccard dup graph exceeds it genuinely needs the loop. */
  val DriverPairThreshold = 1000000L

  /** Scale-adaptive entry point: the dup-pair relation is O(dup docs) —
    * orders of magnitude below the corpus — and its size is known from the
    * session-cached pair view, so small graphs (the overwhelmingly common
    * case, and every fixture scale) skip the fixpoint loop entirely: one
    * collect + a driver union-find + one parallelize replaces 4+
    * driver-coordinated join/agg jobs whose cost is pure scheduler floor.
    * Large graphs take [[dupClustersDistributed]] unchanged. Both paths
    * produce identical rows (spec-asserted): cluster_rep = min doc_id of
    * the component, one row per doc in any dup pair, sorted by doc_id. */
  def dupClusters(spark: SparkSession, dir: String,
      maxIter: Int = 20, loopShufflePartitions: Int = 4,
      driverThreshold: Long = DriverPairThreshold): DataFrame = {
    val dup = ngramPairsExact(spark, dir).select("id_a", "id_b")
    if (dup.count() <= driverThreshold) dupClustersLocal(spark, dup)
    else dupClustersDistributed(spark, dir, maxIter, loopShufflePartitions)
  }

  /** Driver union-find over a collected pair set (the small-graph fast
    * path). Path-compressed, union by attaching the larger root id under
    * the smaller, so roots ARE the min-label representatives. */
  private[ops] def dupClustersLocal(spark: SparkSession,
      dup: DataFrame): DataFrame = {
    import spark.implicits._
    val pairs = dup.as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val members = parent.keySet().iterator()
    val reps = new java.util.HashMap[Long, Long]() // doc -> root
    val sizes = new java.util.HashMap[Long, Long]()
    while (members.hasNext) {
      val id = members.next()
      val r = find(id)
      reps.put(id, r)
      sizes.merge(r, 1L, (x, y) => x + y)
    }
    val rows = reps.entrySet().iterator().asScala
      .map(e => (e.getKey.toLong, e.getValue.toLong, sizes.get(e.getValue).toLong))
      .toSeq.sortBy(_._1)
    spark.createDataset(rows)
      .toDF("doc_id", "cluster_rep", "cluster_size")
  }

  /** The distributed min-label propagation loop (the large-graph path). */
  def dupClustersDistributed(spark: SparkSession, dir: String,
      maxIter: Int = 20, loopShufflePartitions: Int = 4): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // the pair relation feeds four union branches below (two edge
    // directions + the vertex set twice) — the session-cached exact pair
    // view makes those four reads one bucket-collect pass per SESSION,
    // shared with q21 (it stays persisted for the session; only the
    // loop-local caches below are released on return)
    val dup = ngramPairsExact(spark, dir).select("id_a", "id_b")
    // the loop's frames are tiny (O(dup-pair docs), orders of magnitude
    // below the corpus) yet every round's join+agg inherited the session's
    // 32 shuffle partitions — at fixpoint-loop job counts that is pure
    // scheduler floor (task launch × partitions × rounds), the #1 cost of
    // this operator in rounds 4-5. Plans COMPILED inside the loop get a
    // small fixed partition count instead; the session value is restored
    // on exit. Correctness is partition-count independent; raise the
    // parameter if a corpus ever has dup-graphs near corpus scale.
    val spKey = "spark.sql.shuffle.partitions"
    val prevSP = spark.conf.get(spKey)
    spark.conf.set(spKey, loopShufflePartitions.toString)
    try {
    // both edge directions + a self-loop per vertex: min over in-neighbors
    // of the augmented graph = min(own label, neighbor labels)
    val ids = dup.select(col("id_a").as("id"))
      .unionByName(dup.select(col("id_b").as("id"))).distinct()
    val adj = dup.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(dup.select(col("id_b").as("src"), col("id_a").as("dst")))
      .unionByName(ids.select(col("id").as("src"), col("id").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = ids.withColumn("label", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one propagation round: min label over the augmented in-neighborhood
    def step(l: DataFrame): DataFrame = adj
      .join(l.withColumnRenamed("id", "src"), "src")
      .groupBy(col("dst").as("id")).agg(min("label").as("label"))
    var prevSum: Option[Long] = None
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // TWO rounds per action: at near-dup edge densities the loop data is
      // tiny after the first round, so per-job scheduler overhead — not
      // shuffle volume — dominates; doubling the step depth halves the
      // number of driver-coordinated jobs for the same fixpoint (a step
      // applied to converged labels is the identity, so overshooting by one
      // round is harmless).
      val next = step(step(labels)).persist(StorageLevel.MEMORY_AND_DISK)
      // one action: materializes `next` and yields the convergence measure.
      // Σ label cannot overflow: labels are doc ids, so the sum is bounded
      // by maxDocId · nDocs and Spark's sum aggregate would ANSI-abort
      // rather than wrap if a pathological id space ever crossed 2^63.
      val row = next.agg(org.apache.spark.sql.functions.sum("label")).first()
      val sum = if (row.isNullAt(0)) 0L else row.getLong(0) // null = no rows
      labels.unpersist()
      labels = next
      done = prevSum.contains(sum)
      prevSum = Some(sum)
      iter += 2
    }
    if (!done)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"dupClusters stopped at maxIter=$maxIter WITHOUT converging: " +
          "a component with diameter > maxIter would carry a wrong " +
          "cluster_rep; raise maxIter")
    val out = labels
      .join(labels.groupBy("label").agg(count(lit(1)).as("cluster_size")),
        "label")
      .select(col("id").as("doc_id"), col("label").as("cluster_rep"),
        col("cluster_size"))
      .orderBy("doc_id")
      .localCheckpoint()
    labels.unpersist()
    adj.unpersist()
    out
    } finally spark.conf.set(spKey, prevSP)
  }

  /** SimHash: 60-bit signature from token hashes — per-bit weighted
    * majority vote, expressed as bit-arithmetic aggregates (no UDF in the
    * hot path). Token hash is the cross-engine
    * [[graft.functions.PortableHash]] (60 usable bits), so the signature is
    * oracle-checkable bit for bit. */
  def simhash(docs: DataFrame): DataFrame = {
    val bits = 60
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("t"))
      .withColumn("h", graft.functions.PortableHash.h60(col("t")))
    val bitVotes = (0 until bits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"v$i")
    }
    val voted = tok.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    val sig = (0 until bits).map { i =>
      when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    voted.select(col("doc_id"), sig.as("simhash")).orderBy("doc_id")
  }

  /** Embedding-cosine near-dup: exact copies (ids +100000) and re-scaled
    * copies (ids +200000, cosine-invariant) injected, then banded sign-LSH
    * candidates verified by the exact quantized cosine ≥ threshold.
    *
    * Banding (the minhashLsh shape, reference Dedup.minhashLsh band/bucket
    * join): band b's bucket key is the 16-bit SIGN word of quantized
    * components [16b, 16b+16); candidates are the union over bands of
    * within-bucket pairs, deduplicated, then verified. floor(x·1000) keeps
    * the sign of x exactly (>=0 stays >=0, <0 stays <= -1), so any positive
    * rescale — the cosine-invariant near-dup class — matches in EVERY band:
    * full recall on dups. Random pairs collide in a 16-bit band w.p. ~2⁻¹⁶,
    * so candidate volume is ~bands·n²/2¹⁶ — a 2⁵⁶-fold cut vs. the previous
    * single 8-bit bucket's n²/2⁸, which was a quadratic self-join with a
    * constant discount (the round-4 verdict's scale-killer). Generic (not
    * rescale) high-cosine pairs flip few signs, so ≥1 of 4 disjoint bands
    * still matches with high probability — recall degrades gracefully
    * exactly as in MinHash banding. */
  /** The embedding corpus with PLANTED near-dups — exact copies
    * (ids +100000) and re-scaled copies (ids +200000, cosine-invariant) —
    * shared by the banded-LSH (q33) and semantic-cluster (q72) dedup
    * paths, so both are graded on known-dup recall. */
  def augmentedEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    e
      .unionByName(e.where(col("vec_id") % 50 === 0)
        .withColumn("vec_id", col("vec_id") + 100000L))
      .unionByName(e.where(col("vec_id") % 77 === 3)
        .withColumn("vec_id", col("vec_id") + 200000L)
        .withColumn("embedding",
          expr("transform(embedding, x -> x * CAST(2.0 AS FLOAT))")))
  }

  def embeddingNearDup(spark: SparkSession, dir: String,
      thresholdX1000: Int = 995, bands: Int = 4,
      bitsPerBand: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val qv = Similarity.quantize(augmentedEmbeddings(spark, dir)).select(
      col("vec_id"), col("qv"), col("norm2"))
    // exploded (vec_id, band, word) bucket rows: the candidate shuffle
    // carries 2 ints + a long per band, never the vectors themselves
    val bandCols = (0 until bands).map { b =>
      val word = (0 until bitsPerBand).map(j =>
        when(col("qv")(b * bitsPerBand + j) >= 0, lit(1 << j)).otherwise(lit(0))
          .cast("int")).reduce(_ + _)
      struct(lit(b).as("band"), word.as("word")).as(s"bb$b")
    }
    val buckets = qv
      .select(col("vec_id") +: bandCols: _*)
      .select(col("vec_id"), explode(array((0 until bands).map(b =>
        col(s"bb$b")): _*)).as("bb"))
      .select(col("vec_id"), col("bb.band"), col("bb.word"))
    val cand = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.word") === col("y.word") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      .distinct()
    // verification: exact integer dot + IEEE-double cosine on the candidate
    // set only (vectors join back by id — equi-joins, broadcastable by AQE
    // when small, shuffled-hash at corpus scale)
    cand
      .join(qv.as("a"), col("id_a") === col("a.vec_id"))
      .join(qv.as("b"), col("id_b") === col("b.vec_id"))
      .withColumn("dot", Similarity.dot(col("a.qv"), col("b.qv")))
      .withColumn("cos", col("dot").cast("double") /
        sqrt((col("a.norm2") * col("b.norm2")).cast("double")))
      .where(col("cos") * 1000 >= thresholdX1000)
      .select(col("id_a"), col("id_b"))
      .orderBy("id_a", "id_b")
  }

  /** Canonical-document selection (q74): the stage AFTER clustering — a
    * pipeline keeps ONE representative per duplicate cluster, and "lowest
    * doc_id" is rarely the right one; the standard policy keeps the
    * highest-quality member (here: most tokens, doc_id as the total
    * tiebreak). One row per cluster: representative label, chosen canonical
    * document, its token count, cluster size/token totals, and the tokens
    * DROPPED by keeping only the canonical member — the dedup savings
    * number a pipeline owner reports.
    *
    * Scale shape: the cluster relation is O(dup docs), orders of magnitude
    * below the corpus; the token join is an equi-join on doc_id (AQE
    * broadcasts the cluster side when small), and the per-cluster argmax is
    * a hash aggregate over `max(struct(tokens, -doc_id))` — no window, no
    * sort, bounded state per cluster. */
  def canonicalDocs(spark: SparkSession, dir: String): DataFrame = {
    val clusters = dupClusters(spark, dir)
    val toks = corpus(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
    clusters.join(toks, "doc_id")
      .groupBy(col("cluster_rep"))
      .agg(
        count(lit(1)).as("cluster_size"),
        sum("tokens").as("cluster_tokens"),
        max(struct(col("tokens"), (-col("doc_id")).as("neg_id")))
          .as("best"))
      .select(
        col("cluster_rep"),
        col("cluster_size"),
        (-col("best.neg_id")).as("canonical_doc"),
        col("best.tokens").as("canonical_tokens"),
        col("cluster_tokens"),
        (col("cluster_tokens") - col("best.tokens")).as("dropped_tokens"))
      .orderBy("cluster_rep")
  }

  /** SemDeDup-style semantic dedup (q72): cluster the corpus in embedding
    * space, then verify exact cosine ONLY within clusters — the other
    * classic near-dup scale path next to banded sign-LSH (q33).
    *
    * Clustering is one deterministic Lloyd assignment: seed centroids are
    * the element-wise integer means of `vec_id % k` strata (floor of an
    * exact-integer double division — bit-identical in DuckDB), and each
    * vector joins the centroid maximizing dot/√(‖c‖²+1) (the +1 makes a
    * degenerate all-zero centroid score 0 instead of NaN, whose ordering
    * differs across engines; ties break on centroid id). Exact and
    * positively-rescaled copies have identical cosines to every centroid,
    * so planted dup pairs always share a cluster — full recall on the
    * cosine-invariant dup class; generic near-threshold pairs can split
    * across cluster boundaries, which is exactly SemDeDup's documented
    * approximation.
    *
    * Plan at 100 TB: centroids are O(k·dim) and broadcast; assignment is
    * one narrow pass; the verify self-join shuffles on cluster id, so the
    * quadratic term is n²/k per cluster — k scales with corpus size to
    * bound it (here k=16 at fixture scale). */
  def semanticDedup(spark: SparkSession, dir: String, k: Int = 16,
      thresholdX1000: Int = 995): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val qv = Similarity.quantize(augmentedEmbeddings(spark, dir))
      .select(col("vec_id"), col("qv"), col("norm2"))
    val seeded = qv.withColumn("seed", col("vec_id") % k)
    // element-wise integer centroid means, re-nested in position order
    val cent = seeded
      .select(col("seed"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy("seed", "pos")
      .agg(floor(sum("v").cast("double") / count(lit(1))).cast("long").as("cv"))
      .groupBy("seed")
      .agg(expr("transform(array_sort(collect_list(struct(pos, cv)))," +
        " s -> s.cv)").as("cv"))
      .withColumn("cn2",
        expr("aggregate(cv, CAST(0 AS BIGINT), (a, v) -> a + v * v)"))
      .select(col("seed").as("cseed"), col("cv"), col("cn2"))
    val w = Window.partitionBy("vec_id").orderBy(desc("score"), asc("cseed"))
    val assigned = seeded
      .crossJoin(broadcast(cent))
      .withColumn("score", Similarity.dot(col("qv"), col("cv")).cast("double") /
        sqrt((col("cn2") + 1L).cast("double")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("cseed").as("cluster"), col("qv"),
        col("norm2"))
    assigned.as("a")
      .join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot", Similarity.dot(col("a.qv"), col("b.qv")))
      .withColumn("cos", col("dot").cast("double") /
        sqrt((col("a.norm2") * col("b.norm2")).cast("double")))
      .where(col("cos") * 1000 >= thresholdX1000)
      .select(col("a.cluster").as("cluster"), col("a.vec_id").as("id_a"),
        col("b.vec_id").as("id_b"),
        floor(col("cos") * 1000).cast("long").as("cos_x1000"))
      .orderBy("id_a", "id_b")
  }

  /** Incremental (cross-snapshot) dedup (q85): dedup an INCOMING batch of
    * documents against an already-ingested BASE corpus — the production
    * shape of corpus refreshes, where re-deduping the full corpus per crawl
    * is unaffordable. The fixture split is deterministic (doc_id mod 3 == 0
    * is the incoming batch, the rest is base) so the oracle re-derives it.
    * Two stages, both digest-keyed: (1) in-batch exact dedup — keeper is
    * min doc_id per digest among incoming; (2) keepers whose digest exists
    * in base are dropped. Per source: incoming docs, dropped in batch,
    * dropped against base, survivors, and the survivors' id checksum (the
    * surviving SET is pinned, not just its size).
    *
    * The split is a 40/60 hash gate on doc_id (PortableHash, like q54's
    * sampler) rather than a modulus: [[corpus]]'s exact-copy ids differ
    * from their originals by a constant, so any modular split would send
    * every dup pair to the SAME side (or strictly opposite sides) and
    * leave one drop category structurally empty — the hash split exercises
    * both in-batch and vs-base drops.
    *
    * Scale shape: both exchanges are keyed on the 16-byte `unhex(md5)` —
    * document bodies never shuffle ([[exact]]'s rule). The base side is
    * column-pruned to its digest before the join, so the join input is
    * ~16 B/doc regardless of corpus size; at 100 TB the base-digest scan is
    * the incremental path's whole read cost, and a persisted digest index
    * (or a bloom pre-filter on digest) slots in as the left side with the
    * same plan. Same 128-bit collision class as [[exact]] (text-keyed
    * DuckDB oracle would surface one as a t2 mismatch). */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = corpus(spark, dir)
      .select(col("doc_id"), col("source"),
        unhex(md5(col("text"))).as("digest"),
        (graft.functions.PortableHash.h60(col("doc_id").cast("string"))
          % 10L < 4L).as("is_incoming"))
    val incoming = docs.where(col("is_incoming"))
    val base = docs.where(!col("is_incoming"))
      .select(col("digest")).distinct()
      .withColumn("in_base", lit(true))
    incoming
      .withColumn("keep_id",
        min("doc_id").over(Window.partitionBy("digest")))
      .join(base, Seq("digest"), "left")
      .withColumn("in_base", coalesce(col("in_base"), lit(false)))
      .groupBy("source")
      .agg(
        count(lit(1)).as("incoming"),
        sum(when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L))
          .as("dropped_in_batch"),
        sum(when(col("doc_id") === col("keep_id") && col("in_base"), 1L)
          .otherwise(0L)).as("dropped_vs_base"),
        sum(when(col("doc_id") === col("keep_id") && !col("in_base"), 1L)
          .otherwise(0L)).as("survivors"),
        sum(when(col("doc_id") === col("keep_id") && !col("in_base"),
          col("doc_id") % 1000003L).otherwise(0L)).as("survivor_id_sum"))
      .orderBy("source")
  }

  /** One MERGE batch applied to a corpus state: upserts replace text,
    * deletes remove the row, untouched rows carry over — the state
    * transition [[corpusMerge]] classifies and [[corpusTimeTravel]]
    * chains. */
  private def applyBatch(state: DataFrame, batch: DataFrame): DataFrame =
    state.select(col("doc_id"), col("source").as("ssource"),
        col("text").as("stext"))
      .join(batch, Seq("doc_id"), "full_outer")
      .where(col("op").isNull || col("op") === "upsert")
      .select(col("doc_id"),
        coalesce(col("ssource"), col("isource")).as("source"),
        when(col("op") === "upsert", col("text2"))
          .otherwise(col("stext")).as("text"))

  /** q152: TIME TRAVEL — the corpus reconstructed AT EACH VERSION of a
    * two-batch maintenance history (v0 = the base snapshot, v1 = after
    * the q147 revision wave, v2 = after a second wave with different
    * overlap and delete rules). Each version's doc count, char mass and
    * id checksum pin the whole state — the "SELECT ... VERSION AS OF"
    * summary a versioned lakehouse table exposes. Versions are derived by
    * chaining the same full-outer transition, not stored — at scale the
    * states would be materialized incrementally with the checksums as
    * the cross-version audit. */
  def corpusTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash.h60(col("doc_id").cast("string"))
    val docs = Tables.documents(spark, dir)
    val v0 = docs.where(h % 10 < 7)
      .select(col("doc_id"), col("source"), col("text"))
    val b1 = docs.where(h % 10 >= 4)
      .select(col("doc_id"), col("source").as("isource"),
        concat(col("text"), lit(" v2")).as("text2"),
        when(col("doc_id") % 17 === 0, lit("delete"))
          .otherwise(lit("upsert")).as("op"))
    val b2 = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("source").as("isource"),
        concat(col("text"), lit(" v3")).as("text2"),
        when(col("doc_id") % 19 === 0, lit("delete"))
          .otherwise(lit("upsert")).as("op"))
    val v1 = applyBatch(v0, b1)
    val v2 = applyBatch(v1, b2)
    def summary(df: DataFrame, v: Long) =
      df.agg(count(lit(1)).as("docs"),
        sum(length(col("text")).cast("long")).as("chars"),
        sum(col("doc_id") % 1000003L).as("id_checksum"))
        .select(lit(v).as("version"), col("docs"), col("chars"),
          col("id_checksum"))
    summary(v0, 0L).union(summary(v1, 1L)).union(summary(v2, 2L))
      .orderBy("version")
  }

  /** q147: MERGE (upsert) maintenance — the Delta-style `MERGE INTO`
    * semantics an incrementally-maintained corpus needs, expressed as one
    * full-outer equi-join + row classification: an incoming batch of
    * revisions (hash-overlapped with the base like q85: base = h60 %10<7,
    * incoming = %10≥4, so inserts, updates and no-ops all occur) carries
    * upserts (revised `text || ' v2'`) and deletes (doc_id %17 = 0).
    * Each (base?, incoming?) combination classifies exactly one way —
    * deleted / noop_delete / updated / inserted / unchanged — and the
    * merged state's per-source counts, char mass and id checksum pin the
    * whole result relation, including WHICH text version survived.
    *
    * Scale shape: ONE shuffle join on the 8-byte doc_id (bucketing both
    * sides on doc_id makes it exchange-free, the BucketingSpec layout);
    * classification and the final projection are narrow; the output frame
    * is O(#sources). */
  def corpusMerge(spark: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash.h60(col("doc_id").cast("string"))
    val docs = Tables.documents(spark, dir)
    val base = docs.where(h % 10 < 7)
      .select(col("doc_id"), col("source").as("bsource"),
        col("text").as("btext"))
    val incoming = docs.where(h % 10 >= 4)
      .select(col("doc_id"), col("source").as("isource"),
        concat(col("text"), lit(" v2")).as("text2"),
        when(col("doc_id") % 17 === 0, lit("delete"))
          .otherwise(lit("upsert")).as("op"))
    base.join(incoming, Seq("doc_id"), "full_outer")
      .withColumn("cls",
        when(col("btext").isNotNull && col("op") === "delete", "deleted")
          .when(col("btext").isNull && col("op") === "delete", "noop_delete")
          .when(col("btext").isNotNull && col("op") === "upsert", "updated")
          .when(col("btext").isNull && col("op") === "upsert", "inserted")
          .otherwise("unchanged"))
      .withColumn("source", coalesce(col("bsource"), col("isource")))
      .withColumn("final_text",
        when(col("op") === "upsert", col("text2"))
          .when(col("op").isNull, col("btext")))
      .groupBy("source")
      .agg(
        sum(when(col("btext").isNotNull, 1L).otherwise(0L)).as("base_docs"),
        sum(when(col("op").isNotNull, 1L).otherwise(0L)).as("incoming_docs"),
        sum(when(col("cls") === "inserted", 1L).otherwise(0L)).as("inserted"),
        sum(when(col("cls") === "updated", 1L).otherwise(0L)).as("updated"),
        sum(when(col("cls") === "deleted", 1L).otherwise(0L)).as("deleted"),
        sum(when(col("cls") === "noop_delete", 1L).otherwise(0L))
          .as("noop_deletes"),
        sum(when(col("cls") === "unchanged", 1L).otherwise(0L))
          .as("unchanged"),
        count(col("final_text")).as("final_docs"),
        coalesce(sum(when(col("final_text").isNotNull,
          length(col("final_text")).cast("long"))), lit(0L))
          .as("final_chars"),
        coalesce(sum(when(col("final_text").isNotNull,
          col("doc_id") % 1000003L)), lit(0L)).as("id_checksum"))
      .orderBy("source")
  }
}
