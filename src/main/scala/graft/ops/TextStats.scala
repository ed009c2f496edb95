package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{PlanCache, Tables}

/** Text analysis over the documents table: quality scoring, language/source
  * distribution, token counting, document fingerprinting. All per-document
  * work is narrow (no shuffle); the rollups shuffle only tiny group keys. */
object TextStats {

  private def withTokens(docs: DataFrame): DataFrame =
    docs.withColumn("token_count", size(split(col("text"), " ")).cast("long"))

  /** Per-document quality metrics. All outputs integer-exact:
    * avg token length ×100 by integer division, counts via
    * length-difference tricks (cross-engine deterministic, no regex). */
  def quality(spark: SparkSession, dir: String): DataFrame =
    qualityOf(Tables.documents(spark, dir))

  def qualityOf(docs: DataFrame): DataFrame =
    withTokens(docs)
      .withColumn("len_chars", length(col("text")).cast("long"))
      .select(
        col("doc_id"),
        col("n_chars"),
        col("len_chars"),
        col("token_count"),
        floor((col("len_chars") - (col("token_count") - 1)) * 100 /
          col("token_count")).as("avg_token_len_x100"),
        (col("len_chars") -
          length(replace(col("text"), lit("."), lit(""))))
          .cast("long").as("period_count"),
        floor((col("len_chars") -
          length(replace(col("text"), lit(" the "), lit("")))) / 5)
          .as("the_count"),
        (col("token_count") < 20).as("is_short"))
      .orderBy("doc_id")

  /** Gopher-style composite quality FILTER (q73): the per-document metrics
    * of [[quality]] folded into a keep/drop verdict, rolled up per source —
    * the decision stage of a corpus-prep pipeline (the metrics stage alone
    * is q26). Rules (all deterministic integer arithmetic): 20 ≤ tokens,
    * mean token length in [3, 10] characters (×100 in [300, 1000]), at
    * least one occurrence of the top stopword (the classic Gopher trio of
    * length / word-shape / stopword gates; the synthetic corpus has no
    * sentence punctuation, so no terminator rule). Per source: docs, kept,
    * kept_x1000 survival rate — the number a pipeline owner watches to
    * catch a filter eating a source. One narrow scan + one tiny exchange
    * on `source`. */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val m = withTokens(Tables.documents(spark, dir))
      .withColumn("len_chars", length(col("text")).cast("long"))
      .withColumn("avg_token_len_x100",
        floor((col("len_chars") - (col("token_count") - 1)) * 100 /
          col("token_count")))
      .withColumn("the_count",
        floor((col("len_chars") -
          length(replace(col("text"), lit(" the "), lit("")))) / 5))
      .withColumn("kept",
        col("token_count") >= 20 &&
          col("avg_token_len_x100") >= 300 &&
          col("avg_token_len_x100") <= 1000 &&
          col("the_count") >= 1)
    m.groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept"),
        floor(sum(when(col("kept"), 1L).otherwise(0L)) * 1000 /
          count(lit(1))).as("kept_x1000"))
      .orderBy("source")
  }

  private val langMarkers = Map(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "))

  /** One integer score column per language (occurrence counting via the
    * length-difference trick — cross-engine deterministic). */
  private def langScoreCols =
    langMarkers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      ws.map(w => (length(col("text")) -
        length(replace(col("text"), lit(w), lit("")))) / w.length)
        .reduce(_ + _).cast("long").as(s"score_$lang")
    }

  /** (argmax language, max score) over the score columns; ties keep the
    * earlier language in sorted order, all-zero scores → "und". */
  private def langBest =
    langMarkers.keys.toSeq.sorted
      .foldLeft((lit("und"), lit(0L))) { case ((bl, bs), lang) =>
        val s = col(s"score_$lang")
        (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
      }

  /** Language-ID n-gram heuristic: score text against per-language marker
    * words by occurrence counting; emit argmax language + confidence. The
    * documents table carries a ground-truth `lang` for evaluation. */
  def langId(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("doc_id") +: col("lang").as("true_lang") +:
      langScoreCols: _*)
    val best = langBest
    scored.select(col("doc_id"), col("true_lang"),
      best._1.as("pred_lang"), best._2.as("pred_score"))
  }

  /** Sequence packing (concat-and-chunk): the standard pretraining shape —
    * documents concatenate in a deterministic order (per source, by doc_id)
    * and the token stream is sliced into fixed `seqLen`-token sequences. A
    * document's sequence assignment follows from its token OFFSET (sum of
    * all earlier docs' tokens), i.e. a distributed prefix sum.
    *
    * Scale shape: a plain `Window.partitionBy(source)` prefix sum funnels a
    * whole source through ONE sorted reducer — a scale-killer for a corpus
    * with few large sources. This is the classic two-level scan instead:
    * bounded windows inside `docsPerBucket`-sized doc_id buckets, plus a
    * per-source bucket-base prefix sum over the TINY (source, bucket)
    * subtotal table, joined back on the bucket key. Every window partition
    * is bounded; the only unbounded aggregation is a hash rollup.
    *
    * Per source: docs, total tokens, sequence count, docs split across a
    * sequence boundary, and the packed fill ratio (x1000; < 1000 only from
    * the final partially-filled sequence). */
  def packSequences(spark: SparkSession, dir: String, seqLen: Int = 2048,
      docsPerBucket: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = withTokens(Tables.documents(spark, dir))
      .select(col("source"), col("doc_id"), col("token_count"))
      .withColumn("bucket", floor(col("doc_id") / docsPerBucket))
    val inBucket = Window.partitionBy("source", "bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val byBucket = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = t.groupBy("source", "bucket")
      .agg(sum("token_count").as("bucket_tokens"))
      .withColumn("bucket_base",
        coalesce(sum("bucket_tokens").over(byBucket), lit(0L)))
      .select("source", "bucket", "bucket_base")
    val off = t
      .withColumn("in_bucket_off",
        coalesce(sum("token_count").over(inBucket), lit(0L)))
      .join(bases, Seq("source", "bucket"))
      .withColumn("off", col("bucket_base") + col("in_bucket_off"))
    off
      .withColumn("first_seq", floor(col("off") / seqLen))
      .withColumn("last_seq",
        floor((col("off") + col("token_count") - 1) / seqLen))
      .groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        sum("token_count").as("total_tokens"),
        floor((sum("token_count") + seqLen - 1) / seqLen).as("sequences"),
        sum(when(col("first_seq") =!= col("last_seq"), 1L).otherwise(0L))
          .as("crossing_docs"))
      .withColumn("fill_x1000",
        floor(col("total_tokens") * 1000 / (col("sequences") * seqLen)))
      .orderBy("source")
  }

  /** Benchmark-contamination detection: held-out evaluation documents that
    * leak into a training corpus are found by 5-gram overlap — any training
    * document sharing a shingle with the benchmark set is flagged with its
    * matched-shingle count and ratio.
    *
    * The benchmark here is a deterministic slice (doc_id % `benchMod`) of
    * the dup-injected corpus, standing in for an external eval set — the
    * injected exact/near copies of benchmark documents ARE the leaks the
    * operator must find. Scale shape: the benchmark shingle set is SMALL by
    * nature (eval sets are thousands of docs, not billions) — it
    * broadcasts; the corpus side stays a narrow scan + hash aggregate, and
    * the total/matched join is co-partitioned on doc_id (both sides exit a
    * doc_id aggregate). */
  def contamination(spark: SparkSession, dir: String,
      benchMod: Int = 101): DataFrame = {
    val sh = Dedup.corpusShingles(spark, dir)
    val bench = sh.where(col("doc_id") % benchMod === 0)
      .select("g").distinct()
    val cand = sh.where(col("doc_id") % benchMod =!= 0)
    val totals = cand.groupBy("doc_id").agg(count(lit(1)).as("shingles"))
    cand.join(broadcast(bench), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("matched"))
      .join(totals, "doc_id")
      .select(col("doc_id"), col("matched"), col("shingles"),
        floor(col("matched") * 1000 / col("shingles"))
          .as("contamination_x1000"))
      .orderBy("doc_id")
  }

  /** Builds and broadcasts the Cassandra-format bloom over the benchmark
    * shingle set (the q116 prefilter side). Exposed so the spec can replay
    * `mightContain` driver-side against the exact broadcast payload the
    * codegen probe uses. */
  def benchBloom(spark: SparkSession, dir: String, benchMod: Int = 101)
      : org.apache.spark.broadcast.Broadcast[
        graft.sources.filterdb.FilterDbFormat.Filter] = {
    import spark.implicits._
    import graft.sources.filterdb.FilterDbFormat
    val benchG = Dedup.corpusShingles(spark, dir)
      .where(col("doc_id") % benchMod === 0)
      .select("g").distinct().as[String].collect()
    val f = FilterDbFormat.create(math.max(1L, benchG.length.toLong))
    benchG.foreach(g =>
      f.add(g.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    spark.sparkContext.broadcast(f)
  }

  /** q116: the SCALE form of q61's contamination check — the two-phase
    * bloom-prefilter pattern production decontamination uses. Stage 1
    * broadcasts a FIXED-SIZE real bloom filter (the same murmur3/
    * OffHeapBitSet implementation that reads Filter.db) over the benchmark
    * shingles and probes every corpus shingle O(1), join-free; stage 2
    * exact-verifies only the survivors, so the output is IDENTICAL to
    * q61's (a bloom has no false negatives; the verify join removes
    * exactly the false positives — q116 shares q61's oracle).
    *
    * What changes at 100 TB: the broadcast is ~10 bits per bench shingle
    * instead of the full string set, and the exchange into the verify
    * join carries only the ~1%-ish surviving shingles instead of every
    * corpus shingle — the prefilter is where the 99% is saved. Benchmark
    * suites are small and fixed, so the driver-side bloom build is the
    * right shape (in production it would be built once and shipped).
    *
    * The probe itself is [[graft.functions.BloomMightContain]] — a codegen
    * `UnaryExpression` over the broadcast filter (the ClfScoreBcast
    * pattern), not a Scala UDF: the contamination hot path stays inside
    * whole-stage codegen with no per-row instrumentation (VERDICT r9
    * ask #6). */
  def contaminationBloom(spark: SparkSession, dir: String,
      benchMod: Int = 101): DataFrame = {
    val sh = Dedup.corpusShingles(spark, dir)
    val bench = sh.where(col("doc_id") % benchMod === 0)
      .select("g").distinct()
    val cand = sh.where(col("doc_id") % benchMod =!= 0)
    val totals = cand.groupBy("doc_id").agg(count(lit(1)).as("shingles"))
    cand.where(graft.functions.BloomMightContain.column(col("g"),
        benchBloom(spark, dir, benchMod)))
      .join(broadcast(bench), "g") // exact verify: removes bloom FPs
      .groupBy("doc_id").agg(count(lit(1)).as("matched"))
      .join(totals, "doc_id")
      .select(col("doc_id"), col("matched"), col("shingles"),
        floor(col("matched") * 1000 / col("shingles"))
          .as("contamination_x1000"))
      .orderBy("doc_id")
  }

  /** End-to-end training-corpus preparation — the operators above composed
    * the way a data pipeline actually runs them: quality gate (length),
    * language gate (langId == en), exact dedup (keep the lowest doc_id per
    * text), then a per-source yield rollup. One narrow pass derives every
    * per-doc signal; the only shuffles are the dedup groupBy — keyed on the
    * 16-byte `unhex(md5(text))` digest so the corpus body never enters an
    * exchange — and its keeper semi-join (doc_id keys; column pruning drops
    * `text` below the join). */
  def corpusPrep(spark: SparkSession, dir: String,
      minTokens: Int = 20, keepLang: String = "en"): DataFrame = {
    // over the dup-injected corpus (the dedup testbed, Dedup.corpus): the
    // exact-copy docs are dropped by the keeper semi-join, the suffixed
    // near-dups survive an EXACT dedup by design
    val docs = withTokens(Dedup.corpus(spark, dir))
    val scored = docs.select(col("doc_id") +: col("source") +: col("text") +:
      col("token_count") +: langScoreCols: _*)
    val kept = scored
      .withColumn("pred_lang", langBest._1)
      .where(col("token_count") >= minTokens &&
        col("pred_lang") === keepLang)
    val keepers = kept.groupBy(unhex(md5(col("text"))).as("digest"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    kept.join(keepers, Seq("doc_id"), "left_semi")
      .groupBy("source")
      .agg(
        count(lit(1)).as("docs_kept"),
        sum("token_count").as("total_tokens"),
        floor(sum("token_count") / count(lit(1))).as("tokens_per_doc"))
      .orderBy("source")
  }

  /** q145: the END-TO-END curation FUNNEL — every stage of a pretraining
    * data pipeline chained over the dup-injected corpus, reported as the
    * per-source survival funnel a pipeline owner actually watches:
    * docs_in → quality+language gate (q49's rules) → exact dedup (min-id
    * keeper) → benchmark decontamination (q61's 5-gram overlap: any
    * match, or benchmark membership itself, drops the doc) → token mass
    * → packed 2048-token sequence count + fill rate (the q60
    * concat-and-chunk arithmetic: sequences = ⌈tokens/2048⌉ per source).
    *
    * Scale shape: the funnel reuses the session-cached corpus + shingle
    * relations; each stage is a narrow filter or a semi/anti join on
    * 8-to-16-byte keys (digest keepers, broadcast benchmark shingles);
    * the five stage frames that meet at the end are all O(#sources).
    * The quality gate's survivors are session-cached as a SLIM
    * (doc_id, source, token_count, digest) projection — ~32 B/doc, never
    * the text — so the expensive corpus pass (language-score fold + md5)
    * runs ONCE instead of once per downstream branch (the r9 plan
    * audit's one suggestion for this query). */
  def fullPipeline(spark: SparkSession, dir: String, minTokens: Int = 20,
      keepLang: String = "en", benchMod: Int = 101,
      seqLen: Int = 2048): DataFrame = {
    val docs = withTokens(Dedup.corpus(spark, dir))
    val scored = docs.select(col("doc_id") +: col("source") +: col("text") +:
      col("token_count") +: langScoreCols: _*)
    val kept = graft.sources.PlanCache.cached(spark,
        s"pipe_kept|$dir|$minTokens|$keepLang")(
      scored.withColumn("pred_lang", langBest._1)
        .where(col("token_count") >= minTokens &&
          col("pred_lang") === keepLang)
        .select(col("doc_id"), col("source"), col("token_count"),
          unhex(md5(col("text"))).as("digest")))
    val keepers = kept.groupBy(col("digest"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val dd = kept.join(keepers, Seq("doc_id"), "left_semi")
    val sh = Dedup.corpusShingles(spark, dir)
    val bench = sh.where(col("doc_id") % benchMod === 0)
      .select("g").distinct()
    val contaminated = sh.join(broadcast(bench), "g")
      .select("doc_id").distinct()
    val clean = dd.where(col("doc_id") % benchMod =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    def stage(df: DataFrame, name: String) =
      df.groupBy("source").agg(count(lit(1)).as(name))
    val fin = clean.groupBy("source")
      .agg(count(lit(1)).as("after_decontam"),
        sum("token_count").as("tokens_kept"))
      .withColumn("sequences",
        expr(s"(tokens_kept + ${seqLen - 1}) div $seqLen"))
      .withColumn("fill_x1000",
        expr(s"floor(tokens_kept * 1000 / (sequences * $seqLen))"))
    stage(docs, "docs_in")
      .join(stage(kept, "after_quality"), Seq("source"), "left")
      .join(stage(dd, "after_dedup"), Seq("source"), "left")
      .join(fin, Seq("source"), "left")
      .na.fill(0L, Seq("after_quality", "after_dedup", "after_decontam",
        "tokens_kept", "sequences", "fill_x1000"))
      .orderBy("source")
  }

  /** q150: TEXTRANK keyword extraction (Mihalcea & Tarau, "TextRank:
    * Bringing Order into Texts", EMNLP 2004) — PageRank over the token
    * co-occurrence graph, made INTEGER-EXACT so the oracle replays every
    * iteration: ranks are fixed-point ×10⁶, the damped update is
    * r'(v) = 150000 + (850·Σ_{u∼v} (r(u) div deg(u))) div 1000 (floor at
    * every step, the d=0.85 standard), run `iters` rounds from a uniform
    * start. Top-k by (rank, token) is the keyword list.
    *
    * Scale shape: the graph is the DISTINCT adjacent-token edge set
    * (undirected: both directions materialized) — Zipf-bounded, far
    * smaller than the token stream; each iteration is one edge⋈rank join
    * co-partitioned on the 8-ish-byte token key + one aggregate, the
    * Pregel-per-superstep shape dupClustersDistributed already uses. At
    * web scale the node key would be the token hash with a final
    * hash→string join; strings keep q150 directly readable. */
  def textRank(spark: SparkSession, dir: String, iters: Int = 3,
      topK: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val e0 = docs
      .select(split(col("text"), " ").as("w"))
      .select(explode(expr(
        "transform(sequence(1, greatest(size(w) - 1, 1))," +
          " i -> struct(w[i-1] as src, w[i] as dst))")).as("p"))
      .select(col("p.src"), col("p.dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"),
      col("src").as("dst"))).distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesD = edges.join(deg, "src")
    var ranks = deg.select(col("src").as("node"),
      lit(1000000L).as("r"))
    (1 to iters).foreach { _ =>
      ranks = edgesD.join(ranks, edgesD("src") === ranks("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst").as("n2"))
        .agg(expr("150000 + (850 * sum(c)) div 1000").as("r"))
        .select(col("n2").as("node"), col("r"))
    }
    ranks
      .orderBy(desc("r"), col("node"))
      .limit(topK)
      .select(col("node").as("token"), col("r").as("rank_x1e6"))
  }

  /** Repetition-quality metrics (the Gopher-rules family: repeated-n-gram
    * fractions flag low-quality generated/boilerplate text). Per document:
    * total/distinct bigrams, the most-frequent bigram's count, and its
    * corpus-standard "top n-gram fraction" ×1000.
    *
    * Scale shape: one narrow explode, a (doc_id, bigram) partial-combined
    * hash aggregate, then a (doc_id) aggregate — shuffle keys are
    * high-cardinality composites, no windows, no per-doc collect. */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionOf(Tables.documents(spark, dir))

  def repetitionOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(size(w) - 1, 1))," +
          " i -> array_join(slice(w, i, 2), ' '))")).as("g"))
      .groupBy("doc_id", "g")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum("c").as("bigrams_total"),
        count(lit(1)).as("distinct_bigrams"),
        max("c").as("top_bigram_count"))
      .withColumn("top_bigram_x1000",
        floor(col("top_bigram_count") * 1000 / col("bigrams_total")))
      .orderBy("doc_id")

  /** Temperature-based data-mixing rates (the multilingual/multi-source
    * pretraining standard: sample source s with probability ∝ tokens_s^α,
    * α = 0.5, so small sources are up-weighted): per source, the weight
    * floor(sqrt(tokens)), its token allocation out of `budgetTokens`, the
    * per-mille sampling rate capped at 1000, and the resulting sampled
    * token count. Integer-exact end to end (IEEE sqrt is correctly rounded,
    * then floored — cross-engine deterministic).
    *
    * Scale shape: everything after [[tokenTotals]] operates on the
    * O(#sources) rollup. The grand-total weight comes from a 1-row
    * aggregate broadcast back via crossJoin (the Search.scala pattern) —
    * not an unpartitioned window, which plans as a single-partition
    * WindowExec and warns at runtime. */
  def mixingRates(spark: SparkSession, dir: String,
      budgetTokens: Long = 1000000L): DataFrame = {
    // localCheckpoint the O(#sources) rollup so the grand-total branch and
    // the per-source branch share ONE corpus scan instead of re-running the
    // tokenTotals lineage twice. NOTE: the checkpoint is EAGER — merely
    // constructing this DataFrame runs the tokenTotals corpus job, and the
    // checkpointed blocks live until session end. That is the intended
    // contract (every caller executes the frame), traded for never
    // double-scanning the corpus.
    val weighted = tokenTotals(spark, dir)
      .select(col("source"), col("docs"), col("total_tokens"))
      .withColumn("weight", floor(sqrt(col("total_tokens"))))
      .localCheckpoint()
    val totalWeight = weighted.agg(sum("weight").as("weight_total"))
    weighted
      .crossJoin(broadcast(totalWeight))
      .withColumn("alloc_tokens",
        floor(lit(budgetTokens) * col("weight") / col("weight_total")))
      .drop("weight_total")
      .withColumn("rate_x1000",
        least(lit(1000L), floor(col("alloc_tokens") * 1000 /
          col("total_tokens"))))
      .withColumn("sampled_tokens",
        floor(col("total_tokens") * col("rate_x1000") / 1000))
      .orderBy("source")
  }

  /** Deterministic token-budget selection (q75): the stage after
    * [[mixingRates]] — given each source's token allocation, SELECT the
    * actual documents. Documents are ranked inside their source by the
    * cross-engine PortableHash of doc_id (a reproducible shuffle: stable
    * under corpus growth and across engines, unlike `sample()`), and a
    * document is kept iff the running token total through it stays within
    * the source's allocation — i.e. a prefix-sum gate, the exact-budget
    * variant of q54's rate gate.
    *
    * Scale shape: a plain `Window.partitionBy(source)` running sum funnels
    * each source through ONE sorted reducer — a scale-killer when sources
    * are few and huge. Same two-level scan as [[packSequences]], with the
    * hash's high bits as the bucket so bucket index is the leading sort
    * key: bounded windows inside (source, bucket), a tiny per-source
    * bucket-base prefix sum joined back, and the allocation table
    * (O(#sources)) broadcast. Per source: docs, allocation, selected
    * docs/tokens, fill per mille of the allocation. */
  def budgetSelect(spark: SparkSession, dir: String,
      budgetTokens: Long = 1000000L, buckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val alloc = mixingRates(spark, dir, budgetTokens)
      .select(col("source"), col("alloc_tokens"))
    // h60 < 2^60; the top bits give `buckets` ranges that ORDER like h
    val bucketWidth = (1L << 60) / buckets
    val t = withTokens(Tables.documents(spark, dir))
      .select(col("source"), col("doc_id"), col("token_count"))
      .withColumn("h",
        graft.functions.PortableHash.h60(col("doc_id").cast("string")))
      .withColumn("bucket", floor(col("h") / bucketWidth))
    val inBucket = Window.partitionBy("source", "bucket")
      .orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byBucket = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = t.groupBy("source", "bucket")
      .agg(sum("token_count").as("bucket_tokens"))
      .withColumn("bucket_base",
        coalesce(sum("bucket_tokens").over(byBucket), lit(0L)))
      .select("source", "bucket", "bucket_base")
    t.withColumn("in_bucket_cum",
        sum("token_count").over(inBucket))
      .join(bases, Seq("source", "bucket"))
      .withColumn("cum", col("bucket_base") + col("in_bucket_cum"))
      .join(broadcast(alloc), "source")
      .withColumn("kept", col("cum") <= col("alloc_tokens"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        max("alloc_tokens").as("alloc_tokens"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("selected_docs"),
        sum(when(col("kept"), col("token_count")).otherwise(0L))
          .as("selected_tokens"))
      .withColumn("fill_x1000",
        floor(col("selected_tokens") * 1000 / col("alloc_tokens")))
      .orderBy("source")
  }

  /** Deterministic EPOCH SHUFFLE: the training-loader shape — every epoch
    * permutes the corpus by a seeded hash and splits it into `shards` files
    * consumed by data-parallel ranks. Shard assignment is
    * `h60(doc_id:epoch) mod shards`; the order WITHIN a shard is (h,
    * doc_id) ascending. Emits the per-shard manifest a loader audits: doc
    * and token counts plus an ORDER-SENSITIVE checksum
    * `Σ (h mod 1000003) · rank` — any transposition of two docs changes it,
    * so two independent runs (or engines) can prove they produced the same
    * permutation without exchanging the permutation itself.
    *
    * Scale shape: ranking within a shard is NOT a one-reducer-per-shard
    * sort — same two-level scan as [[packSequences]]/[[budgetSelect]]: h's
    * top bits give `buckets` ranges that order like h, intra-bucket
    * row_numbers run in bounded (shard, bucket) windows, and bucket bases
    * come from a prefix sum over the tiny (shard, bucket) count table. The
    * checksum rollup then hash-aggregates; nothing sorts more than a
    * bucket. */
  def epochShuffle(spark: SparkSession, dir: String, epoch: Int = 1,
      shards: Int = 8, buckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketWidth = (1L << 60) / buckets
    val t = withTokens(Tables.documents(spark, dir))
      .select(col("doc_id"), col("token_count"))
      .withColumn("h", graft.functions.PortableHash.h60(
        concat(col("doc_id").cast("string"), lit(s":$epoch"))))
      .withColumn("shard", (col("h") % shards).cast("long"))
      .withColumn("bucket", floor(col("h") / bucketWidth))
    val inBucket = Window.partitionBy("shard", "bucket").orderBy("h", "doc_id")
    val byBucket = Window.partitionBy("shard").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = t.groupBy("shard", "bucket")
      .agg(count(lit(1)).as("bucket_docs"))
      .withColumn("bucket_base",
        coalesce(sum("bucket_docs").over(byBucket), lit(0L)))
      .select("shard", "bucket", "bucket_base")
    t.withColumn("in_bucket_rk", row_number().over(inBucket).cast("long"))
      .join(bases, Seq("shard", "bucket"))
      .withColumn("rk", col("bucket_base") + col("in_bucket_rk"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("docs"),
        sum("token_count").as("tokens"),
        sum((col("h") % 1000003L) * col("rk")).as("order_check"))
      .orderBy("shard")
  }

  /** Language × source distribution rollup. */
  def langDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("docs"),
        sum("n_chars").as("total_chars"),
        floor(sum("n_chars") / count(lit(1))).as("avg_chars"))
      .orderBy("lang", "source")

  /** Token totals per source (whitespace tokenization). */
  def tokenTotals(spark: SparkSession, dir: String): DataFrame =
    withTokens(Tables.documents(spark, dir))
      .groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        sum("token_count").as("total_tokens"),
        floor(sum("token_count") / count(lit(1))).as("tokens_per_doc"))
      .orderBy("source")

  /** Corpus vocabulary top-K: token → (total occurrences, document
    * frequency), highest-occurrence first with the token string as a total
    * tiebreak. Partial map-side combine collapses the explode before the
    * shuffle; top-K is TakeOrderedAndProject (bounded memory at any corpus
    * size). */
  def vocabTopK(spark: SparkSession, dir: String, k: Int = 50): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("occurrences"), countDistinct("doc_id").as("docs"))
      .orderBy(desc("occurrences"), asc("token"))
      .limit(k)

  /** Deterministic stratified sampling rollup: a document is kept iff
    * PortableHash(doc_id) mod 1000 < ratePerMille — reproducible across
    * engines and runs, embarrassingly parallel (the only shuffle is the
    * tiny per-source rollup), and stable under corpus growth: a document's
    * keep/drop never changes as rows are added, unlike `sample()`/
    * TABLESAMPLE whose picks depend on partitioning. */
  def sampleRollup(spark: SparkSession, dir: String,
      ratePerMille: Int = 100): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("keep",
        graft.functions.PortableHash.h60(col("doc_id").cast("string"))
          % 1000 < ratePerMille)
      .groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("sampled_docs"),
        sum(when(col("keep"), col("n_chars"))).as("sampled_chars"))
      .orderBy("source")

  /** GPT-2-style pre-tokenizer regex: contraction suffixes, letter runs,
    * digit runs, punctuation runs, whitespace — the standard BPE input
    * segmentation. Counting these units approximates BPE token counts far
    * better than whitespace splitting (punctuation and numbers split off).
    * Oracle-checked: Java and RE2 dialects agree on this pattern class
    * (property classes, alternation, non-capturing groups); the codegen'd
    * `regexp_extract_all` keeps it one narrow pass. */
  def bpeTokenCounts(docs: DataFrame): DataFrame = {
    val pattern = "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
    docs
      .withColumn("bpe_tokens",
        size(regexp_extract_all(col("text"), lit(pattern), lit(0)))
          .cast("long"))
      .withColumn("ws_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        sum("bpe_tokens").as("total_bpe_tokens"),
        sum("ws_tokens").as("total_ws_tokens"),
        floor(sum("bpe_tokens") * 100 / sum("ws_tokens"))
          .as("bpe_per_ws_x100"))
      .orderBy("source")
  }

  /** Model-based quality scoring (q84): a fastText/DCLM-style LINEAR
    * classifier over hashed bag-of-words features — score(doc) =
    * Σ_tokens weight(h(token) mod B) with a literal weight table
    * (weight(b) = b mod 13 − 6 ∈ [−6, 6], B = 64 buckets), keep iff
    * score > 0. The token hash is the cross-engine
    * [[graft.functions.PortableHash]], so scores — not just verdicts —
    * are oracle-checkable; the TRAINED model (q104,
    * [[classifierQualityTrained]]) swaps its fitted weights into the
    * identical plan, spec-pinned. Per (lang, source):
    * docs, kept, kept_x1000 survival rate and the exact score sum — the
    * classifier analog of q73's rule-based gate.
    *
    * Scale shape: scoring is a NARROW per-document fold — the token array
    * never explodes into rows and never enters an exchange
    * (`aggregate(transform(split(...)))`, all inside whole-stage
    * codegen); the only shuffle is the O(#lang × #source) rollup. At
    * 100 TB this is one streaming pass over the corpus, the same shape a
    * GPU-free quality-classifier sweep needs. */
  /** The hashed-linear classifier's per-document score (shared by q84 and
    * q94): a narrow `aggregate(transform(split(...)))` fold, fully inside
    * whole-stage codegen. */
  private def clfScore: org.apache.spark.sql.Column = aggregate(
    transform(split(col("text"), " "),
      t => pmod(graft.functions.PortableHash.h60(t) % 64L, lit(13L)) - 6L),
    lit(0L), (acc, x) => acc + x)

  def classifierQuality(spark: SparkSession, dir: String): DataFrame = {
    val score = clfScore
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"), score.as("score"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("kept"),
        sum("score").as("score_sum"))
      .withColumn("kept_x1000", floor(col("kept") * 1000 / col("docs")))
      .orderBy("lang", "source")
  }

  /** Deterministic MULTILINGUAL augmentation of the documents corpus: the
    * driver fixture is pure ASCII, which left the whole char-vs-byte
    * semantics class (length, replace, substr, regex over 2/3/4-byte
    * UTF-8) structurally invisible to the oracle — the exact class of the
    * round-7 q92 strlen/length bug. Known doc_id residues get German
    * umlauts+ß (2-byte), French accents (2-byte), CJK (3-byte) and
    * supplementary-plane emoji (4-byte); the oracle replays the identical
    * `CASE` in DuckDB, and both engines count code points (verified:
    * Spark's UTF8String.numChars ≡ DuckDB `length`; DuckDB `strlen`
    * would count bytes and diverge on every planted doc). A narrow
    * projection — composes with any downstream text operator. */
  def intlDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).withColumn("text",
      when(col("doc_id") % 5 === 0,
        concat(lit("Über größere Qualität — schöne Grüße außerdem. "),
          col("text")))
        .when(col("doc_id") % 5 === 1,
          concat(col("text"), lit(" voilà déjà façon où ça réussi")))
        .when(col("doc_id") % 5 === 2,
          concat(col("text"), lit(" 数据 清洗 模型 训练 语料")))
        .when(col("doc_id") % 5 === 3,
          concat(col("text"), lit(" emoji 🦉🦉 fin")))
        .otherwise(col("text")))

  /** The q73 rule-gate verdict as a narrow per-document column (the
    * "planted" training label for the trained classifier). */
  private def ruleKeptCol(df: DataFrame): DataFrame =
    df.withColumn("len_chars", length(col("text")).cast("long"))
      .withColumn("avg_token_len_x100",
        floor((col("len_chars") - (col("token_count") - 1)) * 100 /
          col("token_count")))
      .withColumn("the_count",
        floor((col("len_chars") -
          length(replace(col("text"), lit(" the "), lit("")))) / 5))
      .withColumn("kept_rule",
        col("token_count") >= 20 &&
          col("avg_token_len_x100") >= 300 &&
          col("avg_token_len_x100") <= 1000 &&
          col("the_count") >= 1)

  /** Closed-form TRAINING of the hashed-linear classifier (q104): label
    * every document with the rule-based Gopher gate (q73's verdict — the
    * deterministic stand-in for human quality labels), count token
    * occurrences per hash bucket on each side, and fit the
    * Rocchio/Naive-Bayes-style centroid weight
    * `w(b) = floor((pos_b − neg_b) · 1000 / (pos_b + neg_b + 1))` —
    * integer-exact, so the DuckDB oracle replays the whole fit.
    *
    * Scale shape: ONE explode pass map-side combined into a 64-key
    * exchange (the model is B=64 cells no matter the corpus size); the
    * weight table collects driver-side at O(B) — the same explicitly
    * size-gated contract as the k-means centroid collect
    * (Similarity.scala). At 100 TB training stays a single corpus pass. */
  def trainedClassifierWeights(spark: SparkSession, dir: String): Array[Long] = {
    val labeled = ruleKeptCol(withTokens(Tables.documents(spark, dir)))
    val rows = labeled
      .select(col("kept_rule"), explode(split(col("text"), " ")).as("tok"))
      .select((graft.functions.PortableHash.h60(col("tok")) % 64L)
        .as("bucket"), col("kept_rule"))
      .groupBy("bucket")
      .agg(
        sum(when(col("kept_rule"), 1L).otherwise(0L)).as("pos"),
        sum(when(!col("kept_rule"), 1L).otherwise(0L)).as("neg"))
      .select(col("bucket"),
        floor((col("pos") - col("neg")) * 1000 /
          (col("pos") + col("neg") + 1)).as("w"))
      .collect() // O(64) rows — the model, not the data
    val arr = Array.fill(64)(0L)
    rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** The per-document score fold for an ARBITRARY weight vector — the
    * literal-weights q84 fold with the trained array swapped in: an
    * `element_at` on a 64-literal array inside the same narrow
    * `aggregate(transform(split(...)))`, fully whole-stage-codegen. The
    * plan SHAPE is identical to q84's (spec-asserted); only the embedded
    * literals differ — which is the broadcast-a-trained-model pattern of
    * the k-means assignment stage. */
  def clfScoreWith(weights: Array[Long]): org.apache.spark.sql.Column = {
    val w = array(weights.toIndexedSeq.map(lit(_)): _*)
    aggregate(
      transform(split(col("text"), " "),
        t => element_at(w,
          (graft.functions.PortableHash.h60(t) % 64L).cast("int") + 1)),
      lit(0L), (acc, x) => acc + x)
  }

  /** q104: the TRAINED classifier end-to-end — fit the 64-bucket weights
    * on the rule-gate labels, then score the corpus with the identical
    * narrow fold as q84 and roll up per (lang, source): docs, kept,
    * score_sum, agreement with the training labels, survival rate. The
    * oracle refits the same closed-form weights and rescoring in SQL, so
    * a single wrong weight or bucket breaks the hash. */
  def classifierQualityTrained(spark: SparkSession, dir: String): DataFrame = {
    val score = clfScoreWith(trainedClassifierWeights(spark, dir))
    ruleKeptCol(withTokens(Tables.documents(spark, dir)))
      .select(col("lang"), col("source"), score.as("score"), col("kept_rule"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("kept"),
        sum("score").as("score_sum"),
        sum(when((col("score") > 0) === col("kept_rule"), 1L).otherwise(0L))
          .as("agree"))
      .withColumn("kept_x1000", floor(col("kept") * 1000 / col("docs")))
      .orderBy("lang", "source")
  }

  /** Broadcast-weights form of the score fold (VERDICT r8 ask #2): the
    * same hash/bucket/sum semantics as [[clfScoreWith]], but the weight
    * table rides a `Broadcast[Array[Long]]` referenced by ONE plan object
    * instead of B embedded literals — the form that scales to a
    * fastText-style B~10⁶ hashed-linear model. Score parity with the
    * literal fold at B=64 and plan narrowness at B=65536 are spec-pinned
    * (TextStatsSpec). */
  def clfScoreBroadcast(spark: SparkSession, weights: Array[Long])
      : org.apache.spark.sql.Column =
    graft.functions.ClfScoreBcast.column(spark, col("text"), weights)

  /** q109: q104's trained classifier end-to-end with the BROADCAST scorer
    * swapped in for the literal fold — oracle-identical to q104 by
    * construction (same training, same scores, same rollup), proving the
    * model-size-scalable path produces the exact q104 answer. */
  def classifierQualityBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val score = clfScoreBroadcast(spark, trainedClassifierWeights(spark, dir))
    ruleKeptCol(withTokens(Tables.documents(spark, dir)))
      .select(col("lang"), col("source"), score.as("score"), col("kept_rule"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("kept"),
        sum("score").as("score_sum"),
        sum(when((col("score") > 0) === col("kept_rule"), 1L).otherwise(0L))
          .as("agree"))
      .withColumn("kept_x1000", floor(col("kept") * 1000 / col("docs")))
      .orderBy("lang", "source")
  }

  /** Filter-agreement matrix (q94) — the ablation diagnostic every
    * multi-stage filtering pipeline needs: for each pair of drop rules,
    * how many documents do they BOTH reject vs each alone, and the
    * Jaccard overlap — the number that says "this gate is redundant" or
    * "these two disagree, audit them" before burning a full corpus pass
    * on a filter that drops nothing new. Five gates, one per drop reason:
    * q73's composite rule split into `len` (too few tokens), `shape_low`/
    * `shape_high` (avg token length), `stop` (no stopword hits), plus
    * q84's `clf` (classifier score ≤ 0).
    *
    * Scale shape: every gate is a NARROW per-document expression, so one
    * streaming pass computes all five booleans; the corpus collapses into
    * the ≤2⁵-row gate-combination frame (tiny hash aggregate, map-side
    * combined), and the pair matrix is that frame cross-joined with the
    * 15-row literal pair table — zero further corpus passes, no joins
    * between per-filter result sets (the naive shape re-scans the corpus
    * K times and joins K result tables on doc_id). */
  def filterAgreement(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = withTokens(Tables.documents(spark, dir))
      .withColumn("len_chars", length(col("text")).cast("long"))
      .withColumn("atl_x100",
        floor((col("len_chars") - (col("token_count") - 1)) * 100 /
          col("token_count")))
      .withColumn("the_count",
        floor((col("len_chars") -
          length(replace(col("text"), lit(" the "), lit("")))) / 5))
      .select(
        (col("token_count") < 20).as("len"),
        (col("atl_x100") < 300).as("shape_low"),
        (col("atl_x100") > 1000).as("shape_high"),
        (col("the_count") < 1).as("stop"),
        (clfScore <= 0).as("clf"))
    val combos = m
      .groupBy("len", "shape_low", "shape_high", "stop", "clf")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("fm", map(
        lit("len"), col("len"), lit("shape_low"), col("shape_low"),
        lit("shape_high"), col("shape_high"), lit("stop"), col("stop"),
        lit("clf"), col("clf")))
    val names = Seq("clf", "len", "shape_high", "shape_low", "stop")
    val pairs = for { a <- names; b <- names if a <= b } yield (a, b)
    combos
      .crossJoin(broadcast(pairs.toDF("filter_a", "filter_b")))
      .select(col("filter_a"), col("filter_b"), col("cnt"),
        element_at(col("fm"), col("filter_a")).as("a_set"),
        element_at(col("fm"), col("filter_b")).as("b_set"))
      .groupBy("filter_a", "filter_b")
      .agg(
        sum(when(col("a_set") && col("b_set"), col("cnt")).otherwise(0L))
          .as("dropped_both"),
        sum(when(col("a_set") && !col("b_set"), col("cnt")).otherwise(0L))
          .as("dropped_a_only"),
        sum(when(col("b_set") && !col("a_set"), col("cnt")).otherwise(0L))
          .as("dropped_b_only"))
      .withColumn("union_docs",
        col("dropped_both") + col("dropped_a_only") + col("dropped_b_only"))
      .withColumn("jaccard_x1000",
        when(col("union_docs") > 0,
          floor(col("dropped_both") * 1000 / col("union_docs")))
          .otherwise(0L))
      .orderBy("filter_a", "filter_b")
  }

  /** Corpus drift monitor (q96) — the distribution-shift alarm between
    * two snapshots of a source (the q85 base/incoming split): per source,
    * the total-variation distance ×10⁶ between the base and incoming
    * token distributions,
    *
    *   TV = ½ Σ_t |c_base(t)/N_base − c_inc(t)/N_inc|
    *
    * computed integer-exactly by cross-multiplying before dividing once:
    * Σ|c_a·N_b − c_b·N_a| · 10⁶ / (2·N_a·N_b). A pipeline owner watches
    * this the way the reference's `summary` watches repair %: a source
    * whose incoming batch drifts is a crawler change or poisoning signal.
    * (At true 100 TB counts the int64 cross-products need DECIMAL(38) —
    * a type swap on the same plan.)
    *
    * Scale shape: ONE aggregate builds both sides' counts (conditional
    * sums keyed on `(source, xxhash64(token))` — no per-side frames, no
    * full-outer join, 8-byte token keys; the oracle keys on text, q21's
    * documented collision class); per-source totals broadcast back and
    * everything downstream is O(#sources × vocab). */
  def driftMonitor(spark: SparkSession, dir: String,
      decimal128: Boolean = false): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"),
        (graft.functions.PortableHash.h60(col("doc_id").cast("string"))
          % 10L < 4L).as("inc"),
        explode(split(col("text"), " ")).as("t"))
      .select(col("source"), col("inc"), xxhash64(col("t")).as("th"))
    val cnt = toks.groupBy("source", "th")
      .agg(sum(when(col("inc"), 0L).otherwise(1L)).as("ca"),
        sum(when(col("inc"), 1L).otherwise(0L)).as("cb"))
    driftRollup(cnt, decimal128)
  }

  /** The drift rollup over a per-(source, token-key) count frame
    * `(source, th, ca, cb)` — shared by the production int64 path and the
    * `decimal128` variant. The int64 path's TIGHTEST step is the final
    * scaling `num·10⁶` with `num ≤ 2·na·nb`, so it is exact only while
    * the side-total product stays under `na·nb ≲ 2⁴¹` (~2 M tokens a
    * side); the cross products |ca·nb − cb·na| break later (~2⁶³). Under
    * ANSI mode (Spark 4 default) exceeding either bound THROWS rather
    * than silently corrupting. With `decimal128 = true` the products, the
    * numerator sum and the scaled division run in DECIMAL(38,0) — even
    * adversarial 2³¹-counts against 2⁴⁰-totals (products ≈ 2⁷¹ ≈
    * 2.4·10²¹, scaled numerators ≲ 10³⁴) stay inside 38 digits. The final
    * `tv_x1e6 ∈ [0, 10⁶]` division is an EXACT floor (subtract the decimal
    * remainder first), so no HALF_UP rounding at the division scale can
    * perturb the integer result; a property test pins int64 ≡ decimal in
    * range and decimal-correct past the overflow bound. q96 keeps the
    * int64 default (exact at fixture scale, codegen-cheapest, DuckDB
    * replays it in HUGEINT); a 100 TB corpus has billions of tokens per
    * side and MUST pass `decimal128 = true` — ANSI makes forgetting loud
    * (throw), not wrong. */
  def driftRollup(cnt: DataFrame, decimal128: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val totals = cnt.groupBy("source")
      .agg(sum("ca").as("na"), sum("cb").as("nb"))
    def wide(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (decimal128) c.cast(DecimalType(19, 0)) else c
    val agg = cnt.join(broadcast(totals), "source")
      .groupBy("source")
      .agg(
        max("na").as("base_tokens"),
        max("nb").as("inc_tokens"),
        count(lit(1)).as("distinct_tokens"),
        sum(abs(wide(col("ca")) * wide(col("nb")) -
          wide(col("cb")) * wide(col("na")))).as("num"))
    val tv =
      if (decimal128) {
        val numScaled = col("num") * lit(1000000L).cast(DecimalType(19, 0))
        val denom = lit(2L).cast(DecimalType(19, 0)) *
          wide(col("base_tokens")) * wide(col("inc_tokens"))
        ((numScaled - numScaled % denom) / denom).cast("long")
      } else
        floor(col("num") * 1000000 /
          (lit(2L) * col("base_tokens") * col("inc_tokens")))
    agg
      .withColumn("tv_x1e6",
        when(col("base_tokens") > 0 && col("inc_tokens") > 0, tv)
          .otherwise(0L))
      .select(col("source"), col("base_tokens"), col("inc_tokens"),
        col("distinct_tokens"), col("tv_x1e6"))
      .orderBy("source")
  }

  /** BPE-ish subword count: whitespace tokens plus an extra unit per 4 chars
    * of long tokens — a deterministic proxy for subword tokenizers. */
  def subwordCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("tokens"),
        sum(greatest(ceil(length(col("t")) / 4), lit(1L)))
          .as("subword_units"))

  /** Distributed BPE tokenizer TRAINING (q90) — the iterative merge-rule
    * induction under every modern tokenizer (GPT-2/LLaMA vocabularies),
    * expressed with the scale shape industrial trainers use: the corpus
    * collapses ONCE into a word-frequency vocabulary (the only corpus-wide
    * exchange; Zipf makes |vocab| ≪ corpus), and every training iteration
    * then runs on the vocab table alone — adjacent-pair counts are a
    * narrow `transform` explode into a TINY hash aggregate (keys bounded
    * by symbol-alphabet², map-side combined), the winning rule is
    * `TakeOrderedAndProject(1)` with a total (freq desc, left, right)
    * order, and applying the rule is a narrow per-word `aggregate()` fold
    * (greedy left-to-right merge — provably equal to repeatedly merging
    * the leftmost occurrence, which is what the DuckDB oracle's recursive
    * CTE replays). Driver-coordinated like [[graft.ops.Similarity.kmeans]]:
    * 2 tiny actions per step, never a corpus-sized collect.
    *
    * Everything is integer/string-exact, so the oracle replays the FULL
    * trace: per step the rule (left, right, merged), its pair frequency
    * (counted over overlaps — which is why `tokens_after` is NOT simply
    * `before − pair_freq`: 'aaa' has two (a,a) pairs but one merge), the
    * post-merge corpus token count Σ freq·|syms|, and the distinct symbol
    * count (vocabulary growth: 26 chars + one new symbol per step unless
    * a source symbol is consumed entirely). */
  /** Shared BPE training loop (q90/q98): collapses the corpus to a
    * word-frequency vocab, runs `steps` merge inductions, and returns the
    * per-step trace plus the FINAL vocab frame `(word, freq, syms)`. The
    * two per-step stats actions are skipped when the caller only needs
    * the rules / final vocab (q98's apply path). */
  private def bpeCore(spark: SparkSession, dir: String, steps: Int,
      collectStats: Boolean)
      : (Seq[(Long, String, String, String, Long, Long, Long)], DataFrame) = {
    val vocab0 = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        array_remove(split(col("word"), ""), "").as("syms"))

    var vocab = vocab0.persist()
    val trace = Seq.newBuilder[(Long, String, String, String, Long, Long, Long)]
    for (step <- 1 to steps) {
      // adjacent pairs weighted by word frequency; (l, r) key space is
      // bounded by the current symbol alphabet squared
      val best = vocab
        .select(col("freq"), explode(expr(
          "transform(slice(syms, 1, size(syms) - 1), " +
            "(s, i) -> struct(s AS l, element_at(syms, i + 2) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("f"))
        .orderBy(desc("f"), asc("l"), asc("r"))
        .limit(1).collect()(0)
      val (a, b, f) = (best.getString(0), best.getString(1), best.getLong(2))
      val merged = a + b
      // greedy left-to-right merge: fold each word's symbols, merging when
      // the accumulator tail is `a` and the next symbol is `b`. A just-
      // merged tail can never retrigger (merged == a would need b empty),
      // so the fold is exactly the canonical single-pass BPE application.
      val fold = aggregate(col("syms"), typedLit(Seq.empty[String]),
        (acc, s) => when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(s))))
      val next = vocab
        .select(col("word"), col("freq"), fold.as("syms")).persist()
      if (collectStats) {
        // one tiny action: post-merge token mass and distinct-symbol count
        val st = next.select(col("freq"), explode(col("syms")).as("s"))
          .agg(sum("freq").as("tokens_after"),
            countDistinct("s").as("vocab_syms")).collect()(0)
        trace += ((step.toLong, a, b, merged, f, st.getLong(0),
          st.getLong(1)))
      } else {
        trace += ((step.toLong, a, b, merged, f, 0L, 0L))
      }
      vocab.unpersist()
      vocab = next
    }
    // the FINAL vocab stays persisted: bpeApply consumes it in a join, and
    // unpersisting here would force its consumer to recompute the whole
    // per-word merge-fold lineage (all `steps` folds plus the corpus word
    // aggregate). bpeTrain discards it, so its blocks age out with the
    // session (tiny: corpus-distinct-words sized); callers that hold the
    // frame may unpersist after their action.
    (trace.result(), vocab)
  }

  def bpeTrain(spark: SparkSession, dir: String, steps: Int = 3): DataFrame = {
    import spark.implicits._
    // the trace is already collected driver-side, so the final vocab's
    // cache blocks can be released immediately — only bpeApply needs them
    val (trace, vocab) = bpeCore(spark, dir, steps, collectStats = true)
    vocab.unpersist()
    trace
      .toDF("step", "left_sym", "right_sym", "merged", "pair_freq",
        "tokens_after", "vocab_syms")
      .orderBy("step")
  }

  /** BPE tokenizer APPLICATION (q98) — the second half of the q90 story:
    * tokenize the corpus with the trained merge rules and report what a
    * pipeline owner actually budgets on — per-source whitespace-token vs
    * BPE-token counts and the compression ratio ×1000. Application
    * reuses the training loop's per-word fold (words are tokenized once
    * in the Zipf-collapsed vocab, never per occurrence); the corpus then
    * joins its word stream to the final vocab's per-word token counts —
    * keyed on the word here for oracle parity (at 100 TB: hash keys, and
    * the vocab usually broadcasts — it is corpus-distinct-words sized). */
  def bpeApply(spark: SparkSession, dir: String, steps: Int = 3): DataFrame = {
    val (_, vocab) = bpeCore(spark, dir, steps, collectStats = false)
    val wordToks = vocab
      .select(col("word"), size(col("syms")).cast("long").as("toks"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .join(wordToks, "word")
      .groupBy("source")
      .agg(
        countDistinct("doc_id").as("docs"),
        count(lit(1)).as("ws_tokens"),
        sum("toks").as("bpe_tokens"))
      .withColumn("compression_x1000",
        floor(col("bpe_tokens") * 1000 / col("ws_tokens")))
      .orderBy("source")
  }

  /** N-gram LM quality scoring (q93) — the CCNet-style statistical filter:
    * score every document against a bigram language model and flag the
    * template-like outliers. The LM here is self-trained on the corpus
    * (production swaps in a reference-corpus count table with the same
    * plan); the score is integer-exact "surprisal bits":
    * `bits(N) − bits(count)` per bigram instance, where `bits(x) =
    * length(bin(x))` = floor(log2 x)+1 — exact in both engines (Spark
    * `bin` ≡ DuckDB `bin`, no leading zeros) and within 1 bit of
    * −log2(count/N). Low mean surprisal = the doc's bigrams are corpus-
    * common (duplicated/templated text: exactly what the planted dup docs
    * are); `common_docs` counts docs whose mean surprisal sits at least
    * `marginX1000` (milli-bits) below the corpus mean — a relative
    * threshold, so the flag survives corpus growth (bits(N) drifts up ~1
    * per doubling and an absolute cutoff would silently flag everything
    * or nothing). The corpus mean itself folds out of the count table
    * alone (Σ c·(bits(N)−bits(c)) / Σ c — instance sums grouped by
    * bigram), never a second corpus pass.
    *
    * Scale shape: the count table is a (bigram-hash) aggregate — 8-byte
    * exchange keys, never bigram text (q21's documented 64-bit collision
    * class; the oracle keys on text) — and scoring joins instances to
    * counts on the same hash, so Catalyst reuses the aggregate's exchange
    * on the build side; N rides in as a broadcast 1-row frame. Per-doc and
    * per-source rollups shuffle tiny keys. No corpus-wide windows, no
    * driver state: the LM "model" never leaves the cluster. */
  /** SQL fragment deriving the adjacent-bigram array from a token array
    * column `w` (single-token docs yield their lone word) — shared by the
    * batch scorer (q93) and the streaming stream-static scorer. */
  val BigramTransformSql: String =
    "transform(sequence(1, greatest(size(w) - 1, 1))," +
      " i -> array_join(slice(w, i, 2), ' '))"

  /** The trained bigram LM (q93's model): corpus bigram counts on 8-byte
    * hash keys, session-cached like the shingle/signature tables — the
    * batch scorer's three consumers (scoring join, N, corpus mean) and
    * any streaming re-scorer read ONE materialization instead of
    * re-aggregating the corpus per consumer. */
  def lmCounts(spark: SparkSession, dir: String): DataFrame =
    PlanCache.cached(spark, s"lm_bigram_counts|$dir")(
      Tables.documents(spark, dir)
        .select(split(col("text"), " ").as("w"))
        .select(explode(expr(BigramTransformSql)).as("g"))
        .select(xxhash64(col("g")).as("gh"))
        .groupBy("gh").agg(count(lit(1)).as("c")))

  def lmScore(spark: SparkSession, dir: String,
      marginX1000: Long = 150L): DataFrame = {
    val bg = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"),
        explode(expr(BigramTransformSql)).as("g"))
      .select(col("doc_id"), col("source"), xxhash64(col("g")).as("gh"))
    val counts = lmCounts(spark, dir)
    val total = counts.agg(sum("c").as("n_total"))
    val instBits = length(bin(col("n_total"))) - length(bin(col("c")))
    // corpus mean surprisal from the count table alone: instance sums
    // grouped by bigram (Σ c·bits ≡ Σ over instances)
    val corpus = counts.crossJoin(broadcast(total))
      .agg(floor(sum(col("c") * instBits) * 1000 / sum(col("c")))
        .as("corpus_x1000"))
    val perDoc = bg
      .join(counts, "gh")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("source"),
        instBits.cast("long").as("bits"),
        when(col("c") === 1, 1L).otherwise(0L).as("novel"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("nb"), sum("bits").as("sum_bits"),
        sum("novel").as("novel"))
      .withColumn("doc_x1000", floor(col("sum_bits") * 1000 / col("nb")))
    perDoc.crossJoin(broadcast(corpus))
      .groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        sum("nb").as("bigrams"),
        floor(sum(col("sum_bits")) * 1000 / sum(col("nb")))
          .as("avg_surprisal_x1000"),
        floor(sum(col("novel")) * 1000 / sum(col("nb"))).as("novel_x1000"),
        sum(when(col("doc_x1000") + marginX1000 <= col("corpus_x1000"), 1L)
          .otherwise(0L)).as("common_docs"))
      .orderBy("source")
  }

  /** Document fingerprint: position-weighted mod-prime polynomial over
    * per-token hashes (a rolling-hash signature). Token hash is the
    * cross-engine [[graft.functions.PortableHash]] (md5-derived), so the
    * whole fingerprint is oracle-checkable; swap in `xxhash64` for a
    * cheaper engine-locked variant. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val p = 1000000007L
    docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
      .withColumn("h", pmod(graft.functions.PortableHash.h60(col("t")), lit(p)))
      .withColumn("weighted", pmod(col("h") * (col("pos") + 1), lit(p)))
      .groupBy("doc_id")
      .agg(pmod(sum("weighted"), lit(p)).as("fingerprint"),
        count(lit(1)).as("tokens"))
      .orderBy("doc_id")
  }
}
