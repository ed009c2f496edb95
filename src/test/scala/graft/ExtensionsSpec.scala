package graft

import org.apache.spark.sql.functions._

import graft.ops._
import graft.sources.Tables

/** Specs for the LLM-data-pipeline extension operators. */
class ExtensionsSpec extends SparkSpec {

  test("exact dedup finds exactly the injected doc_id % 5 copies") {
    val rows = Dedup.exact(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    // every duplicate group stems from an injected copy: copies == 2 and the
    // keeper is the original doc_id (min of {id, id + 1000000})
    rows.foreach { r =>
      assert(r.getAs[Long]("copies") == 2L)
      assert(r.getAs[Long]("keeper") < 1000000L)
      assert(r.getAs[Long]("keeper") % 5 == 0)
    }
  }

  test("ngram jaccard pairs: exact copies score 1000, near-dups >= 800") {
    val rows = Dedup.ngramJaccard(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    // restrict to (original, exact copy) — an id_a in the 1M range is
    // itself an injected copy whose +1M counterpart is the suffixed near-dup
    val exactPairs = rows.filter(r =>
      r.getAs[Long]("id_a") < 1000000L &&
        r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + 1000000L)
    assert(exactPairs.nonEmpty)
    exactPairs.foreach(r => assert(r.getAs[Long]("jaccard_x1000") == 1000L))
    rows.foreach(r => assert(r.getAs[Long]("jaccard_x1000") >= 800L))
  }

  test("q157 split: zero cross-split dup pairs, partitions the corpus, " +
    "and a naive doc-hash split WOULD have leaked") {
    val rows = graft.ops.Dedup.leakFreeSplit(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cross_split_dup_pairs") == 0L)
      assert(r.getAs[Long]("train_docs") + r.getAs[Long]("val_docs") ==
        r.getAs[Long]("docs"))
    }
    assert(rows.map(_.getAs[Long]("val_docs")).sum > 0)
    // control: hashing DOC ids (ignoring clusters) does leak dup pairs
    import org.apache.spark.sql.functions._
    val naive = graft.ops.Dedup.corpus(spark, Sf0001)
      .select(col("doc_id"),
        (graft.functions.PortableHash.h60(
          concat(lit("split:"), col("doc_id").cast("string")))
          % 1000 < 100).as("is_val"))
    val leaked = graft.ops.Dedup.ngramPairsExact(spark, Sf0001)
      .join(naive.select(col("doc_id").as("id_a"),
        col("is_val").as("va")), "id_a")
      .join(naive.select(col("doc_id").as("id_b"),
        col("is_val").as("vb")), "id_b")
      .where(col("va") =!= col("vb")).count()
    assert(leaked > 0, "control should show naive doc-hash leakage")
  }

  test("q154 prefix-filtered join equals the all-pairs exact relation, " +
    "and its candidate set is a strict subset of all pairs") {
    val exact = Dedup.ngramPairsExact(spark, Sf0001)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val pf = Dedup.prefixPairs(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pf == exact)
    assert(pf.nonEmpty)
  }

  test("q155 SNM pairs are a subset of the exact relation with exact " +
    "scores, and identical-signature dups are recovered") {
    val exact = Dedup.ngramPairsExact(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val snm = Dedup.snmPairs(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
    assert(snm.nonEmpty)
    snm.foreach { case (pair, j) =>
      assert(exact.get(pair).contains(j), s"$pair not in exact relation")
    }
    // exact text copies share the signature, sort adjacent, and verify
    // at jaccard 1000 — the blocking must recover some of them
    assert(snm.exists(_._2 == 1000L))
  }

  test("ngram jaccard: a generous doc-frequency cap changes nothing") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    // every fixture bucket is far smaller than 1000 docs, so the cap is a
    // no-op on results (it only guards the quadratic tail at corpus scale)
    assert(canon(Dedup.ngramJaccard(spark, Sf0001, maxDocFreq = 1000)) ===
      canon(Dedup.ngramJaccard(spark, Sf0001)))
    // a cap of 2 keeps only 2-doc buckets: output must be a subset
    val all = canon(Dedup.ngramJaccard(spark, Sf0001))
      .map(r => (r.head, r(1))).toSet
    val capped = canon(Dedup.ngramJaccard(spark, Sf0001, maxDocFreq = 2))
      .map(r => (r.head, r(1)))
    capped.foreach(p => assert(all.contains(p)))
  }

  test("ngram doc-frequency guard bounds per-bucket pair volume") {
    import spark.implicits._
    // one stop-shingle shared by 50 docs (would alone emit C(50,2) = 1225
    // pairs) next to a pair of docs sharing 5 specific shingles
    val stop = (1L to 50L).map(id => (id, "the of and in to"))
    val specific = (1 to 5).flatMap(i =>
      Seq((100L, s"specific shingle number $i x"),
        (101L, s"specific shingle number $i x")))
    val sh = (stop ++ specific).toDF("doc_id", "g")
    // exact form: the stop bucket floods the pair space
    val exactPairs = Dedup.ngramPairsOf(sh, thresholdPct = 1, maxDocFreq = 0)
      .count()
    assert(exactPairs > 1000L)
    // guarded form (cap 10 < 50): the stop bucket is dropped entirely, so
    // pair volume collapses to the specific-shingle pair alone — the cap
    // bounds every bucket's contribution at C(cap, 2)
    val guarded = Dedup.ngramPairsOf(sh, thresholdPct = 1, maxDocFreq = 10)
      .collect()
    assert(guarded.length == 1)
    assert(guarded.head.getLong(0) == 100L && guarded.head.getLong(1) == 101L)
    // and the engine default IS guarded
    assert(Dedup.DefaultMaxDocFreq > 0)
  }

  test("dup clusters: labels converge to the component minimum") {
    // q56's oracle checks the full output at sf0.01; this pins the loop's
    // semantics at sf0.001 against a driver-side union-find ground truth
    val pairs = Dedup.ngramPairs(spark, Sf0001, maxDocFreq = 0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.map(id => id -> find(id)).toMap
    val got = Dedup.dupClusters(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet === truth.keySet)
    val sizes = truth.values.groupBy(identity).view.mapValues(_.size).toMap
    got.foreach { case (id, (rep, size)) =>
      assert(rep === truth(id), s"doc $id")
      assert(size === sizes(truth(id)).toLong, s"doc $id cluster size")
    }
  }

  test("dup clusters: distributed propagation equals the driver fast path") {
    // dupClusters routes small graphs (every fixture scale) to the driver
    // union-find; the distributed loop must produce IDENTICAL rows — this
    // is the guarantee that lets the fast path exist at all
    val local = Dedup.dupClusters(spark, Sf0001).collect().toSeq
    val dist = Dedup.dupClustersDistributed(spark, Sf0001).collect().toSeq
    assert(dist.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ===
      local.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
  }

  test("minhash LSH recovers the exact-duplicate pairs") {
    val lsh = Dedup.minhashLsh(spark, Sf0001)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Dedup.exact(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("keeper"),
        r.getAs[Long]("keeper") + 1000000L)).toSet
    // identical docs have identical signatures -> always same buckets
    assert(truth.subsetOf(lsh))
  }

  test("simhash: identical docs share identical signatures") {
    val corpus = Dedup.corpus(spark, Sf0001)
    val sig = Dedup.simhash(corpus)
    val joined = sig.as("a").join(sig.as("b"),
      col("a.doc_id") + 1000000L === col("b.doc_id") &&
        col("a.doc_id") < 1000000L)
    val diff = joined.where(col("a.simhash") =!= col("b.simhash"))
    assert(diff.count() == 0)
  }

  test("brute-force topk: ranks are 1..5 per query, neighbors distinct") {
    val rows = Similarity.bruteForceTopK(spark, Sf0001).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 8)
    byQuery.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.sameElements(1L to 5L))
      assert(rs.map(_.getAs[Long]("neighbor_id")).distinct.length == 5)
    }
  }

  test("LSH ANN hits overlap brute-force top-5 (recall sanity)") {
    val bf = Similarity.bruteForceTopK(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val ann = Similarity.lshTopK(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    assert(ann.nonEmpty)
    // approximate: we only require non-trivial overlap with the truth
    assert((ann intersect bf).nonEmpty)
  }

  test("IVF ANN hits overlap brute-force top-5 (recall sanity)") {
    val bf = Similarity.bruteForceTopK(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.ivfTopK(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(ivf.nonEmpty)
    // every query produced ranked neighbors and some overlap exists overall
    val overlap = ivf.count { case (q, n) => bf.getOrElse(q, Set.empty)(n) }
    assert(overlap > 0, s"no IVF/brute-force overlap in ${ivf.length} hits")
  }

  test("SQ8 shortlist+re-rank recovers most of brute-force top-5, " +
    "and its plan is join-free on the candidate side") {
    val bf = Similarity.bruteForceTopK(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val sq = Similarity.sq8TopK(spark, Sf0001).collect()
    val byQuery = sq.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 8)
    byQuery.values.foreach(rs =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.sameElements(1L to 5L)))
    // 8-bit-per-dim quantization + 32-wide shortlist + exact re-rank:
    // expect high (not necessarily perfect) agreement with the truth
    val hits = sq.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert((hits intersect bf).size >= (bf.size * 3) / 5,
      s"SQ8 recovered only ${(hits intersect bf).size}/${bf.size}")
  }

  test("embedding near-dup finds the injected exact/scaled copies") {
    val rows = Dedup.embeddingNearDup(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      b == a + 100000L || b == a + 200000L || b >= 100000L
    })
  }

  test("semantic dedup recovers every injected exact/rescaled copy pair " +
      "(cosine-invariant dups always share a cluster)") {
    val pairs = Dedup.semanticDedup(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val planted = Dedup.embeddingNearDup(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .filter { case (a, b) => b == a + 100000L || b == a + 200000L }
    assert(planted.nonEmpty)
    planted.foreach { p =>
      assert(pairs.contains(p), s"semantic dedup missed planted pair $p")
    }
  }

  test("canonical docs: one row per cluster, canonical is the best member") {
    val clusters = Dedup.dupClusters(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_rep")))
    val byCluster = clusters.groupBy(_._2)
    val rows = Dedup.canonicalDocs(spark, Sf0001).collect()
    assert(rows.length === byCluster.size)
    rows.foreach { r =>
      val rep = r.getAs[Long]("cluster_rep")
      val members = byCluster(rep).map(_._1).toSet
      assert(members.contains(r.getAs[Long]("canonical_doc")))
      assert(r.getAs[Long]("cluster_size") === members.size.toLong)
      assert(r.getAs[Long]("dropped_tokens") ===
        r.getAs[Long]("cluster_tokens") - r.getAs[Long]("canonical_tokens"))
      // an exact-copy cluster: every member has the same token count, so
      // the min-doc_id tiebreak must pick the representative itself
      assert(r.getAs[Long]("canonical_tokens") > 0L)
    }
  }

  test("budget select: two-level prefix-sum gate matches the plain window") {
    import org.apache.spark.sql.expressions.Window
    val out = TextStats.budgetSelect(spark, Sf0001).collect()
    assert(out.nonEmpty)
    // recompute with the naive one-window form and compare
    val docs = graft.sources.Tables.documents(spark, Sf0001)
      .withColumn("token_count",
        size(split(col("text"), " ")).cast("long"))
      .withColumn("h",
        graft.functions.PortableHash.h60(col("doc_id").cast("string")))
    val cum = docs.withColumn("cum",
      sum("token_count").over(Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val alloc = TextStats.mixingRates(spark, Sf0001)
      .select(col("source"), col("alloc_tokens"))
    val naive = cum.join(alloc, "source")
      .groupBy("source")
      .agg(sum(when(col("cum") <= col("alloc_tokens"), 1L).otherwise(0L))
          .as("selected_docs"),
        sum(when(col("cum") <= col("alloc_tokens"), col("token_count"))
          .otherwise(0L)).as("selected_tokens"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("selected_docs"), r.getAs[Long]("selected_tokens")))
      .toMap
    out.foreach { r =>
      val s = r.getAs[String]("source")
      assert((r.getAs[Long]("selected_docs"),
        r.getAs[Long]("selected_tokens")) === naive(s),
        s"two-level gate diverges from the plain window for source $s")
      assert(r.getAs[Long]("selected_tokens") <= r.getAs[Long]("alloc_tokens"))
    }
  }

  test("quality filter: per-source survival rates are sane") {
    val rows = graft.ops.TextStats.qualityFilter(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val docs = r.getAs[Long]("docs")
      val kept = r.getAs[Long]("kept")
      assert(kept >= 0L && kept <= docs)
      assert(r.getAs[Long]("kept_x1000") === kept * 1000L / docs)
    }
    // the filter is not vacuous: it keeps some documents and drops some
    val (d, k) = rows.foldLeft((0L, 0L)) { case ((d0, k0), r) =>
      (d0 + r.getAs[Long]("docs"), k0 + r.getAs[Long]("kept"))
    }
    assert(k > 0L, "filter dropped everything")
    assert(k < d, "filter kept everything — thresholds are vacuous")
  }

  test("text quality: token and char counts are consistent") {
    val rows = TextStats.quality(spark, Sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("len_chars") == r.getAs[Long]("n_chars"))
      assert(r.getAs[Long]("token_count") > 0)
    }
  }

  test("langId predicts en for english marker docs") {
    val docs = spark.createDataFrame(Seq(
      (1L, "the cat and the dog of the house", "en"),
      (2L, "der hund und die katze und der baum", "de"))).toDF("doc_id", "text", "lang")
    val out = TextStats.langId(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
  }

  test("BPE-ish regex token counts: at least one unit per whitespace token") {
    val rows = TextStats.bpeTokenCounts(Tables.documents(spark, Sf0001))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bpe, ws) = (r.getLong(2), r.getLong(3))
      assert(bpe >= ws, s"bpe=$bpe < ws=$ws for ${r.getString(0)}")
    }
  }

  test("fingerprint is deterministic across runs") {
    val docs = graft.sources.Tables.documents(spark, Sf0001)
    val a = TextStats.fingerprint(docs).collect().map(_.toSeq)
    val b = TextStats.fingerprint(docs).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("multimodal: features flow through mapPartitions stub decoder") {
    val feats = Multimodal.extractFeatures(spark, Sf0001).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.width >= 16 && f.height >= 16)
      assert(f.frames >= 1)
      if (f.media_type != "video") assert(f.frames == 1)
    }
  }

  test("multimodal: resize rewrites payloads narrow, frame sampling " +
    "explodes only videos at the requested stride") {
    val media = Multimodal.mediaTable(spark, Sf0001)
    val resized = Multimodal.resize(spark, media, 64, 64).collect()
    assert(resized.length == 500)
    resized.foreach { r =>
      assert(r.width == 64 && r.height == 64)
      assert(r.payload.length == 64 * 64 / 64)
    }
    val frames = Multimodal.sampleFrames(spark, media, everyN = 10).collect()
    assert(frames.nonEmpty)
    val videoIds = media.where(col("media_type") === "video")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(frames.map(_.doc_id).toSet.subsetOf(videoIds))
    frames.groupBy(_.doc_id).values.foreach { fs =>
      val idxs = fs.map(_.frame_idx).sorted.toSeq
      assert(idxs.head == 0 && idxs == idxs.indices.map(_ * 10))
    }
  }

  test("real codecs: BMP/WAV encode-decode roundtrip, chunk walking, " +
      "corrupt payloads throw") {
    import Multimodal.RealCodecs
    val bmp = RealCodecs.encodeBmp(17, 9, seed = 42L)
    // stride pads 3*17=51 to 52; real header size + pixel array
    assert(bmp.length === 54 + 52 * 9)
    val db = RealCodecs.decode(bmp)
    assert((db.format, db.width, db.height) === ("bmp", 17, 9))
    val wav = RealCodecs.encodeWav(11000, 2, 321, seed = 7L)
    assert(wav.length === 44 + 321 * 2 * 2)
    val dw = RealCodecs.decode(wav)
    assert((dw.format, dw.sampleRate, dw.channels, dw.samples) ===
      ("wav", 11000, 2, 321))
    // chunk walker: an extra chunk between WAVE and fmt must be skipped
    // (with odd-length padding) — splice a 3-byte "LIST" chunk in
    val extra = new Array[Byte](wav.length + 8 + 4)
    System.arraycopy(wav, 0, extra, 0, 12)
    extra(12) = 'L'; extra(13) = 'I'; extra(14) = 'S'; extra(15) = 'T'
    extra(16) = 3 // little-endian 3, padded to 4
    System.arraycopy(wav, 12, extra, 24, wav.length - 12)
    val de = RealCodecs.decode(extra)
    assert((de.sampleRate, de.channels, de.samples) === (11000, 2, 321))
    // corrupt media surfaces, never decodes to zeros
    intercept[java.io.IOException] {
      RealCodecs.decode("plainly not a container".getBytes("UTF-8"))
    }
    intercept[java.io.IOException] {
      RealCodecs.decode(java.util.Arrays.copyOf(
        "RIFF0000WAVE".getBytes("UTF-8"), 60)) // RIFF but no fmt/data
    }
  }

  test("media decode op: every real payload parses back to its doc_id's " +
      "derivation") {
    val rows = Multimodal.mediaDecode(spark, Sf0001).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 2 == 0) {
        assert(r.getAs[String]("format") === "bmp")
        assert(r.getAs[Long]("width") === 4 + id % 32)
        assert(r.getAs[Long]("height") === 4 + id % 24)
      } else {
        assert(r.getAs[String]("format") === "wav")
        assert(r.getAs[Long]("sample_rate") === 8000 + (id % 8) * 1000)
        assert(r.getAs[Long]("samples") === 100 + id % 400)
      }
    }
  }

  test("streaming sliding window: every event lands in exactly 4 windows") {
    val ev = Tables.events(spark, Sf0001)
    val total = ev.count()
    val windowed = graft.streaming.StreamingStats.slidingCounts(ev)
      .agg(sum("events")).collect()(0).getLong(0)
    assert(windowed === 4 * total) // 1h window / 15min slide = 4 overlaps
  }

  test("sessionize (mapGroupsWithState) counts every user event once") {
    val ev = Tables.events(spark, Sf0001)
    val sess = graft.streaming.StreamingStats.sessionize(spark, ev)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = ev.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess === expected)
  }

  test("streaming hourly counts match the batch rollup") {
    val streamed = graft.streaming.StreamingStats
      .runOnce(spark, Sf0001, "stream_hourly")
      .select(date_format(col("hour_start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("events"), col("value_x100"))
    val batch = EventsOps.hourly(spark, Sf0001)
      .select("hour", "event_type", "events", "value_x100")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("q198 watermark replay: controlled 4-batch arrival — the late " +
      "sliver whose window is still open folds in, the late sliver " +
      "whose window already emitted is dropped, and append emits " +
      "exactly the final-watermark frontier (round 16)") {
    val anchor = graft.streaming.StreamingStats.WatermarkAnchorUs
    val got = graft.streaming.StreamingStats
      .watermarkReplayOnce(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.events(spark, Sf0001)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("rh",
        expr(s"(unix_micros(ts) - $anchor) div 3600000000"))
    // the drop decision is REAL at this sf: hour 0 has an even-id sliver
    assert(ev.where(col("rh") === 0L && col("event_id") % 2 === 0)
      .count() > 0)
    // batch replay of the trajectory: staged hours, final watermark (ms,
    // as Spark tracks event time), the drop, and the emission frontier
    val staged = ev
      .where(col("rh").between(0L, 1L) ||
        (col("rh") >= 4L && col("rh") < 12L))
      .select("us", "rh", "event_type", "value", "event_id").collect()
    val wmMs = staged.map(_.getLong(0)).max / 1000L - 7200000L
    val expect = staged.toSeq
      .filterNot(r => r.getLong(1) == 0L && r.getLong(4) % 2 == 0L)
      .filter(r =>
        (anchor + (r.getLong(1) + 1L) * 3600000000L) / 1000L <= wmMs)
      .groupBy(r =>
        ((anchor + r.getLong(1) * 3600000000L) / 1000000L,
          r.getString(2)))
      .map { case (k, rs) => k -> (rs.length.toLong,
        rs.map(r => math.floor(r.getDouble(3) * 100).toLong).sum) }
    assert(got === expect)
  }

  test("q208 streaming dedup: a republication inside the watermark is " +
      "DROPPED while its key's state lives, and the same key " +
      "republished after eviction RE-EMITS at its new event time " +
      "(round 16)") {
    val anchor = graft.streaming.StreamingStats.WatermarkAnchorUs
    val got = graft.streaming.StreamingStats
      .dedupReplayOnce(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val ev = Tables.events(spark, Sf0001)
      .withColumn("rh",
        expr(s"(unix_micros(ts) - $anchor) div 3600000000"))
    val perHour = ev.where(col("rh") >= 0L && col("rh") < 10L)
      .groupBy("rh", "event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val dups = ev.where(col("rh") === 0L)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dups.values.sum > 0, "no republication keys at this sf")
    // the eviction driver is staged: hour-7 data pushes the check
    // watermark past every hour-0 expiry before batch 4
    assert(perHour.keys.exists(_._1 == 7L), "no hour-7 data at this sf")
    def ph(k: (Long, String)) = perHour.getOrElse(k, 0L)
    def g(k: (Long, String)) = got.getOrElse(k, 0L)
    dups.keys.foreach { t =>
      // the batch-2 republication (would land at rh 4) was dropped:
      // rh-4 emissions equal the raw hour-4 rows exactly
      assert(g((4L, t)) === ph((4L, t)),
        s"rh 4/$t: the live-state duplicate leaked through")
      // the batch-4 republication re-emitted: rh-8 carries the raw
      // hour-8 rows PLUS the republished keys
      assert(g((8L, t)) === ph((8L, t)) + dups(t),
        s"rh 8/$t: the post-eviction republication did not re-emit")
    }
    // nothing staged outside the drop was lost: totals balance
    val stagedTotal = perHour.filter { case ((rh, _), _) =>
      (rh >= 0L && rh < 2L) || (rh >= 4L && rh < 10L)
    }.values.sum
    assert(got.values.sum === stagedTotal + dups.values.sum)
  }

  test("q220 stream-stream join: an in-batch match and a late match " +
      "against live state both emit (with their distinct lags); the " +
      "same lateness after watermark eviction emits nothing " +
      "(round 16)") {
    val anchor = graft.streaming.StreamingStats.WatermarkAnchorUs
    val got = graft.streaming.StreamingStats
      .streamJoinReplayOnce(spark, Sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val h0 = Tables.events(spark, Sf0001)
      .withColumn("rh",
        expr(s"(unix_micros(ts) - $anchor) div 3600000000"))
      .where(col("rh").between(0L, 1L))
      .select("event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // all three cohorts are REAL at this sf — the drop claim has teeth
    assert(h0.exists(_._2 % 2 == 0L), "no even ids in hours [0,2)")
    assert(h0.exists(_._2 % 4 == 1L), "no ≡1 (mod 4) ids in hours [0,2)")
    assert(h0.exists(_._2 % 4 == 3L), "no ≡3 (mod 4) ids in hours [0,2)")
    val expect = h0.toSeq
      .filter(p => p._2 % 2 == 0L || p._2 % 4 == 1L)
      .groupBy(_._1)
      .map { case (t, ps) => t -> (
        ps.length.toLong,
        ps.map(_._2 % 1000003L).sum,
        ps.map(p => if (p._2 % 2 == 0L) 30L else 90L).sum) }
    assert(got === expect)
    // the evicted cohort's ids appear nowhere: the joined id_sum would
    // differ if any ≡3 id had leaked through
    val leaked = h0.filter(_._2 % 4 == 3L).map(_._2 % 1000003L).sum
    assert(leaked > 0L && got.values.map(_._2).sum ===
      expect.values.map(_._2).sum)
  }

  test("q215 transformWithState: per-key ValueState survives across " +
      "micro-batches — running totals are cumulative, sequences dense, " +
      "and the final totals equal the staged corpus (round 16)") {
    val anchor = graft.streaming.StreamingStats.WatermarkAnchorUs
    val rows = graft.streaming.StreamingStats
      .transformWithStateOnce(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    val ev = Tables.events(spark, Sf0001)
      .withColumn("rh",
        expr(s"(unix_micros(ts) - $anchor) div 3600000000"))
      .where(col("rh") >= 0L && col("rh") < 6L)
    val totals = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (t, rs) =>
      val seq = rs.map(_.getLong(1)).sorted.toSeq
      // appearance sequence is dense from 1 (the state's own counter)
      assert(seq === (1L to seq.length.toLong))
      // running totals are the prefix sums of the per-batch counts
      val ordered = rs.sortBy(_.getLong(1))
      ordered.foldLeft(0L) { (acc, r) =>
        val now = acc + r.getLong(2)
        assert(r.getLong(3) === now, s"$t seq ${r.getLong(1)}")
        now
      }
      // the last running total is the staged corpus count for the key
      assert(ordered.last.getLong(3) === totals(t), t)
    }
    // every staged type surfaced; at least one type spans >1 batch
    // (cross-batch state genuinely evolved)
    assert(byType.keySet === totals.keySet)
    assert(byType.values.exists(_.length > 1))
  }

  test("q202 source mixing: capped inverse-sqrt smoothing — the largest " +
      "source samples at exactly 1/2, smaller sources at strictly higher " +
      "rates, and the hash-threshold selection is deterministic " +
      "(round 16)") {
    import graft.ops.Mixing
    val rows = Mixing.sourceMix(spark, Sf0001).collect()
    assert(rows.length === 20)
    def l(r: org.apache.spark.sql.Row, n: String) =
      r.getLong(r.fieldIndex(n))
    val tMax = rows.map(l(_, "tokens")).max
    rows.foreach { r =>
      assert(l(r, "rate_x1e6") === Mixing.rateX1e6(tMax, l(r, "tokens")),
        s"${r.getString(0)} rate drifted from the pinned function")
      assert(l(r, "docs_kept") <= l(r, "docs"))
      assert(l(r, "tokens_kept") <= l(r, "tokens"))
    }
    // the head source is cut to half; every smaller source keeps more
    val head = rows.maxBy(l(_, "tokens"))
    assert(l(head, "rate_x1e6") === Mixing.RateScale / 2)
    rows.filter(r => l(r, "tokens") < tMax).foreach(r =>
      assert(l(r, "rate_x1e6") > Mixing.RateScale / 2))
    // selection is reproducible run to run
    val again = Mixing.sourceMix(spark, Sf0001).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    // and something was genuinely dropped somewhere
    assert(rows.exists(r => l(r, "docs_kept") < l(r, "docs")))
  }

  test("q203 source epochs: every source repeats at least twice toward " +
      "the uniform exposure target, fractional epochs materialize by " +
      "hash per document, and the explode-side checksum equals the " +
      "collapsed c(c+1)/2 form (round 16)") {
    import graft.ops.Mixing
    val rows = Mixing.sourceEpochs(spark, Sf0001).collect()
    assert(rows.length === 20)
    def l(r: org.apache.spark.sql.Row, n: String) =
      r.getLong(r.fieldIndex(n))
    // recompute the raw inputs for cross-checks
    val docs = Tables.documents(spark, Sf0001)
      .withColumn("token_count",
        size(split(col("text"), " ")).cast("long"))
      .select("source", "doc_id", "token_count").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perSource = docs.groupBy(_._1).view
      .mapValues(ds => (ds.length.toLong, ds.map(_._3).sum)).toMap
    val tMax = perSource.values.map(_._2).max
    rows.foreach { r =>
      val src = r.getString(r.fieldIndex("source"))
      val (nDocs, tokens) = perSource(src)
      assert(l(r, "exposure_x1e6") === Mixing.exposureX1e6(tMax, tokens))
      // at least 2 full epochs: emitted >= 2x the raw counts
      assert(l(r, "docs_emitted") >= 2 * nDocs)
      assert(l(r, "tokens_emitted") >= 2 * tokens)
      // and never more than the cap + 1 fractional
      assert(l(r, "docs_emitted") <= 5 * nDocs)
    }
    // some source genuinely lands a fractional (non-integer) epoch
    assert(rows.exists(r =>
      l(r, "docs_emitted") % perSource(
        r.getString(r.fieldIndex("source")))._1 != 0L))
    // deterministic
    val again = Mixing.sourceEpochs(spark, Sf0001).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("q205 streaming twin: the native session_window aggregate runs " +
      "as a stream — session state carries across micro-batches and " +
      "append emits exactly the sessions the final watermark closed " +
      "(round 16)") {
    import java.nio.file.Files
    val ev = Tables.events(spark, Sf0001)
      .withColumn("us", expr("unix_micros(ts)"))
    // two arrival batches split mid-corpus (day 15 of the month)
    val splitUs = graft.streaming.StreamingStats.WatermarkAnchorUs +
      15L * 86400L * 1000000L
    val ingest = Files.createTempDirectory("graft-session-stream")
    Seq(ev.where(col("us") < splitUs), ev.where(col("us") >= splitUs))
      .zipWithIndex.foreach { case (b, i) =>
        val tmp = Files.createTempDirectory("graft-session-part")
        b.select("ts", "user_id", "value").coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.toFile.listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dest = ingest.resolve(f"arrival-$i%03d.parquet")
        Files.move(part.toPath, dest)
        dest.toFile.setLastModified(60000L * (i + 1))
        ()
      }
    val schema = spark.read.parquet(ingest.toString).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(ingest.toString)
    val q = graft.ops.EventsOps
      .sessionWindowsOf(src.withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName("session_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("session_stream").collect()
      .map(_.toSeq).toSet
    // the emitted frontier: sessions whose end the final watermark
    // passed (watermark tracks event time in ms)
    val wmUs = (ev.agg(max("us")).head.getLong(0) / 1000L
      - 7200000L) * 1000L
    val expect = graft.ops.EventsOps
      .sessionWindowsOf(Tables.events(spark, Sf0001))
      .where(col("end_us") <= wmUs)
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got === expect)
    // and sessions do exist on both sides of the split (state was
    // genuinely built in both batches)
    assert(expect.exists(_(1).asInstanceOf[Long] < splitUs))
    assert(expect.exists(_(1).asInstanceOf[Long] >= splitUs))
  }

  test("streaming dedup drops re-arriving documents with bounded state") {
    import java.nio.file.{Files, Paths}
    val ingest = Files.createTempDirectory("graft-dedup-stream-")
    // the same document file arrives twice: every text is a duplicate
    Files.copy(Paths.get(s"$Sf0001/documents.parquet"),
      ingest.resolve("a.parquet"))
    Files.copy(Paths.get(s"$Sf0001/documents.parquet"),
      ingest.resolve("b.parquet"))
    val schema = spark.read.parquet(ingest.toString).schema
    // ts shifted off epoch 0: Spark's watermark starts at 0, and an event
    // time equal to it is already "late" — epoch-0 rows would be dropped
    val docs = spark.readStream.schema(schema).parquet(ingest.toString)
      .withColumn("ts", expr("timestamp_micros(doc_id + 86400000000)"))
    val q = graft.streaming.StreamingStats.dedupedDocs(docs)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("dedup_stream")
    val distinctTexts = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select("text").distinct().count()
    assert(out.count() === distinctTexts)
    assert(out.select("text_md5").distinct().count() === distinctTexts)
  }

  test("q147 merge: class counts satisfy the upsert accounting identities") {
    val rows = graft.ops.Dedup.corpusMerge(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    var anyUpdate = 0L; var anyInsert = 0L; var anyDelete = 0L
    rows.foreach { r =>
      def g(n: String) = r.getAs[Long](n)
      assert(g("base_docs") == g("unchanged") + g("updated") + g("deleted"))
      assert(g("incoming_docs") ==
        g("inserted") + g("updated") + g("deleted") + g("noop_deletes"))
      assert(g("final_docs") == g("unchanged") + g("updated") + g("inserted"))
      anyUpdate += g("updated"); anyInsert += g("inserted")
      anyDelete += g("deleted")
    }
    // the hash overlap makes every class occur somewhere in the corpus
    assert(anyUpdate > 0 && anyInsert > 0 && anyDelete > 0)
  }

  test("q153 embedding drift: shares sum to ~1e6 per side, shifts bounded") {
    val rows = graft.ops.Similarity.embeddingDrift(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val bs = rows.map(_.getAs[Long]("base_share_x1e6")).sum
    val is = rows.map(_.getAs[Long]("inc_share_x1e6")).sum
    // floor rounding loses < k millionths
    assert(bs > 1000000L - rows.length && bs <= 1000000L)
    assert(is > 1000000L - rows.length && is <= 1000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("shift_x1e6") <= 1000000L)
      assert(r.getAs[Long]("base_n") + r.getAs[Long]("inc_n") > 0)
    }
  }

  test("q152 time travel: v1 state agrees with q147's merge accounting") {
    val tt = graft.ops.Dedup.corpusTimeTravel(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("version") ->
        (r.getAs[Long]("docs"), r.getAs[Long]("chars"))).toMap
    assert(tt.keySet == Set(0L, 1L, 2L))
    val merge = graft.ops.Dedup.corpusMerge(spark, Sf0001).collect()
    val v1FromMerge = merge.map(_.getAs[Long]("final_docs")).sum
    val v1Chars = merge.map(_.getAs[Long]("final_chars")).sum
    assert(tt(1L) == ((v1FromMerge, v1Chars)))
    assert(tt(0L)._1 > 0 && tt(2L)._1 > 0)
  }

  test("q145 funnel stages are monotone and consistent with q49") {
    val rows = graft.ops.TextStats.fullPipeline(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val in = r.getAs[Long]("docs_in")
      val q = r.getAs[Long]("after_quality")
      val d = r.getAs[Long]("after_dedup")
      val c = r.getAs[Long]("after_decontam")
      assert(in >= q && q >= d && d >= c && c >= 0, r.toString)
      val toks = r.getAs[Long]("tokens_kept")
      val seqs = r.getAs[Long]("sequences")
      if (c > 0) {
        assert(seqs == (toks + 2047) / 2048)
        assert(r.getAs[Long]("fill_x1000") <= 1000L)
      }
    }
    // stage-2 counts agree with q49's docs_kept (same gate + dedup)
    val q49 = graft.ops.TextStats.corpusPrep(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("docs_kept")).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("after_dedup") == q49.getOrElse(r.getString(0), 0L)))
  }

  test("streaming KMV sketch equals the batch sketch bit-for-bit") {
    import java.nio.file.{Files, Paths}
    val ingest = Files.createTempDirectory("graft-kmv-stream-")
    graft.sources.TempDirs.register(ingest)
    // the corpus arrives as two chronological halves: the sketch's merge
    // must absorb both micro-batch states into the batch answer
    val all = spark.read.parquet(s"$Sf0001/documents.parquet")
    def stage(cond: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-kmv-half-")
      graft.sources.TempDirs.register(tmp)
      all.where(cond).coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, ingest.resolve(name))
    }
    stage(col("doc_id") % 2 === 0, "a.parquet")
    stage(col("doc_id") % 2 =!= 0, "b.parquet")
    val schema = all.schema
    val docs = spark.readStream.schema(schema).parquet(ingest.toString)
    val q = graft.streaming.StreamingStats.kmvDistinctTokens(docs)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("kmv_stream")
      .select("lang", "ndv_est", "kth_hash", "sketch_n").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val batch = graft.ops.Sketches.kmvDistinct(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getAs[Long]("ndv_est"),
        r.getAs[Long]("kth_hash"), r.getAs[Long]("sketch_n")))
      .sortBy(_._1).toSeq
    assert(streamed == batch)
  }

  test("streaming ivf-pq ingest: stream codes == batch codes, " +
      "stateless narrow encode") {
    import java.nio.file.{Files, Paths}
    val ingest = Files.createTempDirectory("graft-pq-stream-")
    Files.copy(Paths.get(s"$Sf0001/embeddings.parquet"),
      ingest.resolve("embeddings.parquet"))
    val schema = spark.read.parquet(ingest.toString).schema
    val emb = spark.readStream.schema(schema).parquet(ingest.toString)
    val q = graft.streaming.StreamingStats
      .pqEncodedVectors(spark, Sf0001, emb)
      .writeStream.format("memory").queryName("pq_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // stateless: the encode carries NO streaming state operators
    assert(q.lastProgress.stateOperators.isEmpty,
      s"unexpected streaming state: ${q.lastProgress.stateOperators.toSeq}")
    val streamed = spark.table("pq_stream")
    // bit-identical to the batch encoder over the same vectors
    val batch = graft.ops.Similarity.ivfPqEncodeQuantized(spark, Sf0001,
      graft.ops.Similarity.quantized(spark, Sf0001)
        .select("vec_id", "qv", "norm2"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming lm scoring == batch scoring (stream-static join)") {
    import java.nio.file.{Files, Paths}
    val ingest = Files.createTempDirectory("graft-lm-stream-")
    Files.copy(Paths.get(s"$Sf0001/documents.parquet"),
      ingest.resolve("documents.parquet"))
    val schema = spark.read.parquet(ingest.toString).schema
    val docs = spark.readStream.schema(schema).parquet(ingest.toString)
      .withColumn("ts", expr("timestamp_micros(doc_id + 86400000000)"))
    val q = graft.streaming.StreamingStats
      .lmScoredDocs(spark, Sf0001, docs)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("lm_stream").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    // batch expectation: the identical join/fold over the same model,
    // computed without any streaming machinery
    val counts = TextStats.lmCounts(spark, Sf0001)
    val nTotal = counts.agg(sum("c")).collect()(0).getLong(0)
    val nBits = 64L - java.lang.Long.numberOfLeadingZeros(nTotal)
    val expected = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(expr(TextStats.BigramTransformSql)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
      .join(counts, Seq("gh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nb"),
        sum(when(col("c").isNull, lit(nBits))
          .otherwise(lit(nBits) - length(bin(col("c"))).cast("long")))
          .as("sum_bits"))
      .withColumn("doc_x1000", floor(col("sum_bits") * 1000 / col("nb")))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out === expected)
    assert(out.nonEmpty)
  }

  test("streaming lm scoring keeps fully-OOV documents at ceiling surprisal") {
    import java.nio.file.Files
    val ingest = Files.createTempDirectory("graft-lm-oov-")
      .resolve("docs").toString
    // two docs whose every bigram is out-of-vocabulary (tokens the corpus
    // cannot contain). Neither may vanish.
    spark.createDataFrame(Seq(
      (900001L, "zzqx1 zzqx2 zzqx3 zzqx4"),
      (900002L, "zzqx1 zzqx2 zzqx3 zzqx4 zzqx5 zzqx6")
    )).toDF("doc_id", "text")
      .write.parquet(ingest)
    val schema = spark.read.parquet(ingest).schema
    val docs = spark.readStream.schema(schema).parquet(ingest)
      .withColumn("ts", expr("timestamp_micros(doc_id)"))
    val q = graft.streaming.StreamingStats
      .lmScoredDocs(spark, Sf0001, docs)
      .writeStream.format("memory").queryName("lm_oov_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("lm_oov_stream").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val counts = TextStats.lmCounts(spark, Sf0001)
    val nTotal = counts.agg(sum("c")).collect()(0).getLong(0)
    val nBits = 64L - java.lang.Long.numberOfLeadingZeros(nTotal)
    // every bigram OOV → nb = tokens - 1, sum_bits = nb * nBits,
    // doc_x1000 = nBits * 1000 (the ceiling)
    assert(out(900001L) === ((3L, 3L * nBits, nBits * 1000L)))
    assert(out(900002L) === ((5L, 5L * nBits, nBits * 1000L)))
  }

  test("as-of join: matches are strictly earlier clicks by the same user") {
    val ev = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us")).collect()
    val clicks = ev.filter(_.getString(2) == "click")
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(0)))
    val rows = EventsOps.errorAsofClick(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(!_.isNullAt(3))) // at least one matched error
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val (user, tsUs) = (r.getLong(1), r.getLong(2))
      val matched = r.getLong(3)
      assert(r.getLong(4) >= 0L) // lag never negative (strict-before frame)
      // the matched click is THE latest (ts, event_id) strictly before
      val expected = clicks
        .filter(c => c._1 == user && (c._2 < tsUs ||
          (c._2 == tsUs && c._3 < r.getLong(0))))
        .maxBy(c => (c._2, c._3))._3
      assert(matched == expected)
    }
    // unmatched errors truly have no prior click
    rows.filter(_.isNullAt(3)).foreach { r =>
      assert(!clicks.exists(c => c._1 == r.getLong(1) &&
        (c._2 < r.getLong(2) ||
          (c._2 == r.getLong(2) && c._3 < r.getLong(0)))))
    }
  }

  test("chunk dedup stats: shared never exceeds total, distinct <= chunks") {
    val rows = Dedup.chunkStats(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (chunks, shared, distinct) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(shared <= chunks && distinct <= chunks && distinct >= 1L)
    }
  }

  test("vocab top-k is ordered by occurrences desc with token tiebreak") {
    val rows = TextStats.vocabTopK(spark, Sf0001, k = 10).collect()
      .map(r => (r.getLong(1), r.getString(0)))
    assert(rows.nonEmpty && rows.length <= 10)
    rows.sliding(2).foreach {
      case Array((c1, t1), (c2, t2)) =>
        assert(c1 > c2 || (c1 == c2 && t1 < t2))
      case _ =>
    }
  }

  test("deterministic sampling: stable across runs, rate-0 keeps nothing") {
    val a = TextStats.sampleRollup(spark, Sf0001).collect().map(_.toSeq).toSeq
    val b = TextStats.sampleRollup(spark, Sf0001).collect().map(_.toSeq).toSeq
    assert(a === b)
    TextStats.sampleRollup(spark, Sf0001, ratePerMille = 0).collect()
      .foreach(r => assert(r.getLong(2) == 0L && r.isNullAt(3)))
    // rate 1000 keeps everything
    TextStats.sampleRollup(spark, Sf0001, ratePerMille = 1000).collect()
      .foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }

  test("sequence packing: two-level prefix sum equals the plain window") {
    import org.apache.spark.sql.expressions.Window
    // ground truth: single-window per-source offsets, computed here (the
    // engine avoids this shape because one source = one sorted reducer)
    val docs = Tables.documents(spark, Sf0001)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val seqLen = 2048
    val truth = docs
      .withColumn("off", coalesce(sum("tokens").over(w), lit(0L)))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"), sum("tokens").as("total_tokens"),
        floor((sum("tokens") + seqLen - 1) / seqLen).as("sequences"),
        sum(when(floor(col("off") / seqLen) =!=
          floor((col("off") + col("tokens") - 1) / seqLen), 1L)
          .otherwise(0L)).as("crossing_docs"))
      .withColumn("fill_x1000",
        floor(col("total_tokens") * 1000 / (col("sequences") * seqLen)))
      .orderBy("source").collect().toSeq
    // small buckets force multi-bucket bases — the two-level path is real
    val got = TextStats.packSequences(spark, Sf0001, seqLen,
      docsPerBucket = 16).collect().toSeq
    assert(got === truth)
    got.foreach { r =>
      assert(r.getAs[Long]("fill_x1000") > 0L &&
        r.getAs[Long]("fill_x1000") <= 1000L)
      assert(r.getAs[Long]("crossing_docs") < r.getAs[Long]("docs"))
    }
  }

  test("dup spans: injected copies fully covered, coverage bounded") {
    val rows = Dedup.dupSpans(spark, Sf0001).collect()
    val docs = Tables.documents(spark, Sf0001).count()
    assert(rows.length > docs.toInt) // corpus = docs + injected copies
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val cov = r.getAs[Long]("covered_tokens")
      assert(cov >= 0L && cov <= n)
      assert(r.getAs[Long]("dup_starts") <= math.max(n - 4, 0L))
      assert(r.getAs[Long]("dup_x1000") == math.floor(cov * 1000.0 / n))
    }
    // an exact copy shares every gram with its original: both fully covered
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    byId.keys.filter(id => id < 1000000L && id % 5 == 0).foreach { id =>
      for (d <- Seq(id, id + 1000000L); r <- byId.get(d)
           if r.getAs[Long]("n_tokens") >= 5) {
        assert(r.getAs[Long]("covered_tokens") == r.getAs[Long]("n_tokens"),
          s"exact-copy doc $d not fully covered")
        assert(r.getAs[Long]("dup_x1000") == 1000L)
      }
    }
    // a near-dup original (text is a strict prefix of its +2M copy) is
    // fully covered too
    byId.keys.filter(id => id < 1000000L && id % 7 == 0).foreach { id =>
      byId.get(id).filter(_.getAs[Long]("n_tokens") >= 5).foreach { r =>
        assert(r.getAs[Long]("covered_tokens") == r.getAs[Long]("n_tokens"))
      }
    }
    // the word-soup singles keep some unique grams — coverage is partial
    assert(rows.exists(r =>
      r.getAs[Long]("covered_tokens") < r.getAs[Long]("n_tokens")))
  }

  test("epoch shuffle: two-level rank equals the plain per-shard window") {
    import org.apache.spark.sql.expressions.Window
    val t = Tables.documents(spark, Sf0001)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("token_count"))
      .withColumn("h", graft.functions.PortableHash.h60(
        concat(col("doc_id").cast("string"), lit(":1"))))
      .withColumn("shard", (col("h") % 8).cast("long"))
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    val truth = t
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("docs"), sum("token_count").as("tokens"),
        sum((col("h") % 1000003L) * col("rk")).as("order_check"))
      .orderBy("shard").collect().toSeq
    // tiny buckets force real multi-bucket bases in the two-level path
    val got = TextStats.epochShuffle(spark, Sf0001, buckets = 16)
      .collect().toSeq
    assert(got === truth)
    val docs = Tables.documents(spark, Sf0001).count()
    assert(got.map(_.getAs[Long]("docs")).sum == docs)
    // a different epoch produces a different permutation (checksums move)
    val e2 = TextStats.epochShuffle(spark, Sf0001, epoch = 2, buckets = 16)
      .collect().toSeq
    assert(e2.map(_.getAs[Long]("order_check")) !=
      got.map(_.getAs[Long]("order_check")))
  }

  test("contamination: benchmark docs excluded, planted leak detected") {
    import spark.implicits._
    // doc 0 is benchmark (0 % 101 == 0); doc 5 copies half of doc 0's text
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (5L, "alpha beta gamma delta epsilon completely different tail here now"),
      (7L, "unrelated words that never appear in the benchmark document at all"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs)
    val bench = sh.where(col("doc_id") % 101 === 0).select("g").distinct()
    val cand = sh.where(col("doc_id") % 101 =!= 0)
    val totals = cand.groupBy("doc_id").agg(count(lit(1)).as("shingles"))
    val out = cand.join(broadcast(bench), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("matched"))
      .join(totals, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(5L) && out(5L) >= 1L) // the planted leak
    assert(!out.contains(0L)) // benchmark docs never flag themselves
    assert(!out.contains(7L)) // clean doc stays clean
    // and the fixture-backed operator returns only non-benchmark ids
    TextStats.contamination(spark, Sf0001).collect().foreach { r =>
      assert(r.getLong(0) % 101 != 0)
      assert(r.getLong(1) <= r.getLong(2))
    }
  }

  test("contamination bloom prefilter: identical relation to the exact " +
      "form; most shingles pruned; codegen probe, no UDF on the hot path") {
    val bloom = TextStats.contaminationBloom(spark, Sf0001).collect()
    val exact = TextStats.contamination(spark, Sf0001).collect()
    assert(bloom.map(_.toSeq).toSeq === exact.map(_.toSeq).toSeq)
    // probe/survivor counts recovered relationally (the Expression carries
    // no per-row instrumentation): probes = candidate shingles, survivors =
    // shingles passing the broadcast-bloom predicate
    val bc = TextStats.benchBloom(spark, Sf0001)
    val cand = graft.ops.Dedup.corpusShingles(spark, Sf0001)
      .where(col("doc_id") % 101 =!= 0)
    val probes = cand.count()
    val surv = cand.where(
      graft.functions.BloomMightContain.column(col("g"), bc))
    val survivors = surv.count()
    assert(probes > 0 && survivors.toDouble / probes < 0.5,
      s"prefilter too weak: $survivors of $probes survived")
    // codegen/driver parity: the executor-side predicate admits exactly the
    // shingles a driver-side replay of mightContain over the same broadcast
    // payload admits
    val gs = cand.select("g").distinct().collect().map(_.getString(0))
    val driverHits = gs.filter(g => bc.value.mightContain(
      g.getBytes(java.nio.charset.StandardCharsets.UTF_8))).toSet
    val execHits = surv.select("g").distinct()
      .collect().map(_.getString(0)).toSet
    assert(execHits === driverHits)
    // the hot path is a codegen Expression, not an interpreted UDF
    val plan = surv.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"probe missing:\n$plan")
    assert(!plan.contains("UDF"), s"interpreted UDF on the hot path:\n$plan")
  }

  test("corpus sink: partitioned layout, bounded files, pruned readback") {
    val out = graft.sources.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft-corpus-out-")).toString
    val docs = Tables.documents(spark, Sf0001)
    CorpusSink.writeParquet(docs, out, maxRecordsPerFile = 50L)
    // hive-partitioned directories, one per source
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    val sources = docs.select("source").distinct()
      .collect().map(_.getString(0)).toSet
    assert(dirs === sources.map(s => s"source=$s"))
    // bounded file sizes: no parquet file holds more than maxRecordsPerFile
    dirs.foreach { d =>
      new java.io.File(s"$out/$d").listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          assert(spark.read.parquet(f.toString).count() <= 50L)
        }
    }
    // readback equality
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    assert(back.select("doc_id").exceptAll(docs.select("doc_id")).count() === 0)
    // a source filter prunes at the partition-directory level
    val pruned = back.where(col("source") === sources.head)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("isnotnull(source"), s"expected partition pruning:\n$scan")
    assert(pruned.count() ===
      docs.where(col("source") === sources.head).count())
  }

  test("PortableHash: driver-side h60 equals the Spark column form") {
    import spark.implicits._
    // the oracle embeds driver-computed values (LSH plane coefficients), so
    // the three forms (Spark column, driver MessageDigest, DuckDB SQL) must
    // agree — the DuckDB form is pinned by the q22/q23/q29 oracle compare
    val samples = Seq("", "a", "hello world", "graft near duplicate suffix",
      "Ünïcode tökens §", "0:63", "7:0") ++
      (0 until 8).flatMap(p => (0 until 64).map(j => s"$p:$j"))
    val fromSpark = samples.toDF("s")
      .select(graft.functions.PortableHash.h60(col("s")).as("h"))
      .as[Long].collect().toSeq
    assert(fromSpark === samples.map(graft.functions.PortableHash.h60))
    assert(samples.map(graft.functions.PortableHash.h60).forall(_ >= 0L))
    // the native Hash60 expression is bit-identical to the pure-builtin
    // md5/substring/conv composition it replaced
    val fromBuiltin = samples.toDF("s")
      .select(graft.functions.PortableHash.h60Builtin(col("s")).as("h"))
      .as[Long].collect().toSeq
    assert(fromSpark === fromBuiltin)
    // a column built on a thread with NO active session must still analyze
    // (falls back to the builtin composition instead of a registry lookup)
    @volatile var detached: org.apache.spark.sql.Column = null
    val t = new Thread(() => {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      detached = graft.functions.PortableHash.h60(col("s"))
    })
    t.start(); t.join()
    val fromDetached = samples.toDF("s").select(detached.as("h"))
      .as[Long].collect().toSeq
    assert(fromDetached === fromBuiltin)
  }

  test("BinaryKeys: the native be_long/be_long_bytes expressions are " +
      "bit-identical to the builtin hex compositions, full sign domain " +
      "and short inputs included (round 13)") {
    import spark.implicits._
    // longs across the whole domain, including the top-bit-set range the
    // single-conv form would null out
    val longs = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue,
      0x7fffffff00000000L, 0x8000000000000001L, -987654321012345678L) ++
      (0 until 64).map(1L << _)
    val enc = longs.toDF("k")
    val nativeBytes = enc.select(
      graft.sources.BinaryKeys.beLongBytes(col("k")).as("b"))
      .as[Array[Byte]].collect().toSeq
    val builtinBytes = enc.select(
      graft.sources.BinaryKeys.beLongBytesBuiltin(col("k")).as("b"))
      .as[Array[Byte]].collect().toSeq
    assert(nativeBytes.map(_.toSeq) === builtinBytes.map(_.toSeq))
    // decode roundtrips and equals the builtin decode
    val dec = enc.select(graft.sources.BinaryKeys.beLong(
      graft.sources.BinaryKeys.beLongBytes(col("k"))).as("k2"))
      .as[Long].collect().toSeq
    assert(dec === longs)
    // arbitrary-LENGTH inputs: native mirrors the builtin's behavior
    // exactly (≤4 bytes → null; 5-7 bytes → hi-half ‖ remaining bytes)
    val varLen = (0 to 10).map(n =>
      Tuple1((0 until n).map(i => ((i * 37 + n * 11) % 256 - 128).toByte)
        .toArray))
    val vdf = varLen.toDF("b")
    val nat = vdf.select(graft.sources.BinaryKeys.beLong(col("b")).as("v"))
      .as[Option[Long]].collect().toSeq
    val blt = vdf.select(
      graft.sources.BinaryKeys.beLongBuiltin(col("b")).as("v"))
      .as[Option[Long]].collect().toSeq
    assert(nat === blt)
    assert(nat.take(5).forall(_.isEmpty) && nat.drop(5).forall(_.nonEmpty))
    // sessionless column construction still analyzes (builtin fallback)
    @volatile var detached: org.apache.spark.sql.Column = null
    val t = new Thread(() => {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      detached = graft.sources.BinaryKeys.beLong(col("b"))
    })
    t.start(); t.join()
    assert(vdf.select(detached.as("v")).as[Option[Long]].collect().toSeq
      === blt)
  }

  test("classifier quality: narrow fold matches the explode derivation") {
    import spark.implicits._
    val rows = TextStats.classifierQuality(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val docs = r.getAs[Long]("docs")
      val kept = r.getAs[Long]("kept")
      assert(kept >= 0L && kept <= docs)
      assert(r.getAs[Long]("kept_x1000") === kept * 1000L / docs)
    }
    // the hashed weights are not vacuous: the verdict splits the corpus
    val (d, k) = rows.foldLeft((0L, 0L)) { case ((d0, k0), r) =>
      (d0 + r.getAs[Long]("docs"), k0 + r.getAs[Long]("kept"))
    }
    assert(k > 0L && k < d)
    // independent plan: per-token rows via explode, same weights
    val exploded = Tables.documents(spark, Sf0001)
      .select(col("lang"), col("source"), col("doc_id"),
        explode(split(col("text"), " ")).as("t"))
      .withColumn("w",
        pmod(graft.functions.PortableHash.h60(col("t")) % 64L, lit(13L)) - 6L)
      .groupBy("lang", "source", "doc_id")
      .agg(sum("w").as("score"))
      .groupBy("lang", "source")
      .agg(sum("score").as("score_sum"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("kept"))
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        (r.getAs[Long]("score_sum"), r.getAs[Long]("kept")))
      .toMap
    rows.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[String]("source"))
      assert((r.getAs[Long]("score_sum"), r.getAs[Long]("kept")) ===
        exploded(key), s"fold vs explode diverge for $key")
    }
  }

  test("trained classifier (q104): fitted weights beat the q84 literals " +
      "on the rule labels, and the scoring plan SHAPE is identical") {
    val weights = TextStats.trainedClassifierWeights(spark, Sf0001)
    assert(weights.length === 64)
    assert(weights.exists(_ != 0L), "training must move some weight")
    val rows = TextStats.classifierQualityTrained(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    var docs = 0L; var agree = 0L
    rows.foreach { r =>
      docs += r.getAs[Long]("docs")
      agree += r.getAs[Long]("agree")
      assert(r.getAs[Long]("kept") <= r.getAs[Long]("docs"))
    }
    // the fit actually learned the labels: agreement well above coin-flip
    assert(agree * 1000L / docs > 600L,
      s"trained classifier agrees on only $agree / $docs")
    // plan parity: the trained fold lowers to the SAME physical node
    // sequence as the literal-weight q84 fold (only embedded literals
    // differ) — no explode, no extra exchange from swapping the model in
    def shape(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect { case p => p.nodeName }
        .filterNot(Set("AdaptiveSparkPlan", "ResultQueryStage"))
    val literal = TextStats.classifierQuality(spark, Sf0001)
    val trained = TextStats.classifierQualityTrained(spark, Sf0001)
    assert(shape(trained) === shape(literal))
    assert(!trained.queryExecution.executedPlan.toString.contains("Generate"),
      "scoring must stay a narrow fold (no explode)")
  }

  test("broadcast classifier (q109): exact score parity with the literal " +
      "fold at B=64, and a B=65536 model stays out of the plan tree") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, Sf0001)
    // B=64: per-document parity with the literal fold, not just rollups
    val weights = TextStats.trainedClassifierWeights(spark, Sf0001)
    val both = docs.select(col("doc_id"),
      TextStats.clfScoreWith(weights).as("lit_score"),
      TextStats.clfScoreBroadcast(spark, weights).as("bc_score"))
    assert(both.where(col("lit_score") =!= col("bc_score")).count() === 0L)
    // end-to-end: q109 == q104 bit-for-bit
    val q104 = TextStats.classifierQualityTrained(spark, Sf0001).collect()
    val q109 = TextStats.classifierQualityBroadcast(spark, Sf0001).collect()
    assert(q109.toSeq === q104.toSeq)
    // B=65536: the literal form would put 65k nodes in the plan; the
    // broadcast form's plan must stay O(1) in model size. Independent
    // evaluation path for values: element_at on a SINGLE array literal
    // (one Literal node holding ArrayData, Catalyst's own lookup).
    val big = Array.tabulate(65536)(i => ((i % 7) - 3).toLong)
    val bcBig = docs.select(col("doc_id"),
      TextStats.clfScoreBroadcast(spark, big).as("s"))
    val bucket = (graft.functions.PortableHash.h60(col("t")) % 65536L)
      .cast("int") + 1
    val expected = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"), element_at(lit(big), bucket).as("w"))
      .groupBy("doc_id").agg(sum("w").as("s"))
    assert(bcBig.join(expected, Seq("doc_id"))
      .where(bcBig("s") =!= expected("s")).count() === 0L)
    val planStr = bcBig.queryExecution.executedPlan.toString
    assert(!planStr.contains("Generate"), "broadcast scorer must stay narrow")
    assert(planStr.length < 20000,
      s"B=65536 plan tree should not carry the model (len=${planStr.length})")
    // same physical node sequence as the literal-fold plans
    def shape(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect { case p => p.nodeName }
        .filterNot(Set("AdaptiveSparkPlan", "ResultQueryStage"))
    assert(shape(TextStats.classifierQualityBroadcast(spark, Sf0001)) ===
      shape(TextStats.classifierQualityTrained(spark, Sf0001)))
  }

  test("intl corpus: multibyte UTF-8 actually lands in known docs (byte " +
      "count > char count), and the char-sensitive ops stay consistent") {
    import spark.implicits._
    val intl = TextStats.intlDocs(spark, Sf0001)
      .select(col("doc_id"), length(col("text")).as("chars"),
        octet_length(col("text")).as("bytes"))
      .collect()
    val (planted, plain) = intl.partition(_.getLong(0) % 5 < 4)
    assert(planted.nonEmpty && plain.nonEmpty)
    planted.foreach(r => assert(r.getInt(2) > r.getInt(1),
      s"doc ${r.getLong(0)} must contain multibyte chars"))
    plain.foreach(r => assert(r.getInt(2) === r.getInt(1),
      s"doc ${r.getLong(0)} is unmodified ASCII"))
    // emoji (4-byte, supplementary plane) count as ONE char in Spark
    val owl = Seq("a 🦉🦉 b").toDF("text")
      .select(length(col("text")), octet_length(col("text"))).head
    assert(owl.getInt(0) === 6 && owl.getInt(1) === 12)
    // the four re-oracled ops run non-vacuously over the intl corpus
    assert(TextStats.qualityOf(TextStats.intlDocs(spark, Sf0001))
      .count() > 0)
    assert(Cleanse.piiScanOf(Cleanse.plantPii(TextStats.intlDocs(
      spark, Sf0001))).collect().map(_.getAs[Long]("docs_with_pii")).sum > 0)
    assert(Cleanse.intlBoilerplate(spark, Sf0001).collect()
      .forall(_.getAs[Long]("chars_removed") > 0))
  }

  test("drift DECIMAL(38) variant: int64 ≡ decimal in range; decimal " +
      "stays exact past the int64 overflow bound (counts ~2^31, N ~2^40)") {
    import spark.implicits._
    // in range: both paths produce identical rows on moderate magnitudes
    val rnd = new scala.util.Random(11)
    // kept inside the int64 envelope END-TO-END: the tightest step is
    // num·10⁶ with num ≤ 2·na·nb, so side totals must satisfy
    // na·nb ≲ 2⁴¹ — 200 rows of counts < 2¹⁰ give na, nb ~ 2¹⁷
    val inRange = (0 until 200).map(i =>
      ("s" + i % 3, i.toLong, math.abs(rnd.nextLong()) % (1L << 10),
        math.abs(rnd.nextLong()) % (1L << 10)))
      .toDF("source", "th", "ca", "cb")
    val i64 = TextStats.driftRollup(inRange, decimal128 = false).collect()
    val dec = TextStats.driftRollup(inRange, decimal128 = true).collect()
    assert(i64.map(_.toSeq).toSeq === dec.map(_.toSeq).toSeq)
    // adversarial: per-token counts ~2^31 against side totals ~2^40 push
    // the cross products to ~2^71 — beyond int64
    val bigRows = Seq(
      (1L, (1L << 31) - 7L, 3L),
      (2L, 9L, (1L << 31) + 11L),
      (3L, (1L << 40) - 123L, 5L),
      (4L, 17L, (1L << 40) + 999L))
    val big = bigRows.map { case (th, ca, cb) => ("s", th, ca, cb) }
      .toDF("source", "th", "ca", "cb")
    val na = bigRows.map(r => BigInt(r._2)).sum
    val nb = bigRows.map(r => BigInt(r._3)).sum
    val num = bigRows.map { case (_, ca, cb) =>
      (BigInt(ca) * nb - BigInt(cb) * na).abs
    }.sum
    val expectTv = num * 1000000 / (2 * na * nb) // exact BigInt floor
    val d = TextStats.driftRollup(big, decimal128 = true).collect().head
    assert(d.getAs[Long]("base_tokens") === na.toLong)
    assert(d.getAs[Long]("inc_tokens") === nb.toLong)
    assert(d.getAs[Long]("tv_x1e6") === expectTv.toLong)
    // the int64 fold is genuinely past its bound here: under ANSI mode
    // (Spark 4 default) the long multiply overflows and THROWS — exactly
    // why the decimal128 variant exists
    intercept[ArithmeticException] { // SparkArithmeticException
      TextStats.driftRollup(big, decimal128 = false).collect()
    }
  }

  test("dup-span removal: bounded by coverage, copies are fully stripped") {
    val rem = Dedup.dupSpanRemoval(spark, Sf0001).collect()
    assert(rem.nonEmpty)
    rem.foreach { r =>
      assert(r.getAs[Long]("docs_touched") <= r.getAs[Long]("docs"))
      assert(r.getAs[Long]("tokens_removed") <= r.getAs[Long]("tokens_total"))
    }
    val removedTotal = rem.map(_.getAs[Long]("tokens_removed")).sum
    assert(removedTotal > 0L, "the injected exact copies must be masked")
    // removal ⊆ coverage: masking only non-keeper occurrences can never
    // strip more than q80's full duplicated-span coverage
    val cov = Dedup.dupSpans(spark, Sf0001).collect()
    val coveredTotal = cov.map(_.getAs[Long]("covered_tokens")).sum
    assert(removedTotal <= coveredTotal)
    val touchedTotal = rem.map(_.getAs[Long]("docs_touched")).sum
    val coveredDocs = cov.count(_.getAs[Long]("covered_tokens") > 0L)
    assert(touchedTotal <= coveredDocs)
    // an exact copy (doc_id + 1_000_000) is never the min-id keeper of any
    // of its grams ⇒ every one of its positions is masked: removal strips
    // at least the full token mass of the injected exact copies
    import spark.implicits._
    val copyTokens = Dedup.corpus(spark, Sf0001)
      .where(col("doc_id") >= 1000000L && col("doc_id") < 2000000L)
      .select(size(split(col("text"), " ")).cast("long")).as[Long]
      .collect().filter(_ >= 5L).sum // sub-k docs emit no grams
    assert(removedTotal >= copyTokens)
  }

  test("kmeans: distributed trace == driver brute-force replay") {
    val out = Similarity.kmeans(spark, Sf0001).collect()
    assert(out.nonEmpty && out.length <= 8)

    // exact driver replay over the collected quantized vectors (500×64
    // longs at sf0.001): same init, same integer distance, same tie rule,
    // same floor(mean) update — must agree cell-for-cell
    val vecs = Similarity.quantized(spark, Sf0001)
      .select("vec_id", "qv", "norm2").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray,
        r.getLong(2))).sortBy(_._1)
    val p = 1000003L
    var cents: Seq[(Long, Array[Long])] =
      vecs.take(8).map(v => (v._1, v._2)).toSeq
    def assign(): Array[(Long, Long, Long)] = // (vec_id, cid, d2)
      vecs.map { case (id, qv, n2) =>
        val best = cents.map { case (cid, cv) =>
          val dot = qv.zip(cv).map { case (a, b) => a * b }.sum
          val cn2 = cv.map(x => x * x).sum
          (n2 + cn2 - 2 * dot, cid)
        }.min
        (id, best._2, best._1)
      }
    val qvById = vecs.map(v => v._1 -> v._2).toMap
    for (_ <- 1 to 2) {
      val byC = assign().groupBy(_._2)
      cents = byC.toSeq.sortBy(_._1).map { case (cid, members) =>
        val rows = members.map(m => qvById(m._1))
        val cv = Array.tabulate(rows.head.length) { i =>
          math.floor(rows.map(_(i)).sum.toDouble / rows.length).toLong
        }
        (cid, cv)
      }
    }
    val fin = assign()
    val expect = fin.groupBy(_._2).map { case (cid, ms) =>
      cid -> (ms.length.toLong, ms.map(_._1 % p).sum, ms.map(_._3 % p).sum,
        cents.find(_._1 == cid).get._2.map(_ % p).sum)
    }
    assert(out.length === expect.size)
    out.foreach { r =>
      val e = expect(r.getAs[Long]("cluster"))
      assert((r.getAs[Long]("size"), r.getAs[Long]("members_sum"),
        r.getAs[Long]("d2_sum"), r.getAs[Long]("centroid_sum")) === e)
    }
    // every vector lands in exactly one cluster
    assert(out.map(_.getAs[Long]("size")).sum === vecs.length.toLong)
  }

  test("product quantization: m=1 degenerates to kmeans exactly; ADC " +
      "equals distance-to-assigned-centroid; default plan is join-free") {
    // (a) with one subspace the per-subspace Lloyd's IS q88's k-means:
    // identical seeds, tie rule and floor-mean updates
    val (subDim, books1) = Similarity.pqCodebooks(spark, Sf0001, m = 1)
    val km = Similarity.kmeansCentroids(spark, Sf0001)
    assert(subDim === 64)
    assert(books1.map(b => (b._2, b._3)) === km)

    // (b) m=1 ADC(q, x) must equal the exact d2 from q to x's assigned
    // centroid — replayed on the driver from the collected vectors
    val vecs = Similarity.quantized(spark, Sf0001)
      .select("vec_id", "qv", "norm2").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
      .sortBy(_._1)
    def d2(qv: Array[Long], n2: Long, cv: Seq[Long]): Long = {
      val cn2 = cv.map(x => x * x).sum
      val dot = qv.zip(cv).map { case (a, b) => a * b }.sum
      n2 + cn2 - 2 * dot
    }
    val codeOf = vecs.map { case (id, qv, n2) =>
      id -> km.map { case (cid, cv) => (d2(qv, n2, cv), cid) }.min._2
    }.toMap
    val centById = km.toMap
    val expect = vecs.filter(_._1 < 8).flatMap { case (qid, qqv, qn2) =>
      vecs.filter(_._1 >= 8).map { case (xid, _, _) =>
        (qid, xid) -> d2(qqv, qn2, centById(codeOf(xid)))
      }
    }.toMap
    val adc1 = Similarity.pqSearch(spark, Sf0001, m = 1).collect()
    assert(adc1.nonEmpty)
    adc1.foreach { r =>
      assert(r.getAs[Long]("adc_d2") === expect(
        (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))))
    }

    // (c) the default m=4 search: join-free plan (codebooks and query
    // tables ride as literals), well-formed per-query ranks, and the
    // approximation overlaps brute force
    val pq = Similarity.pqSearch(spark, Sf0001)
    val plan = pq.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"join in PQ plan:\n${plan.take(1500)}")
    val rows = pq.collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size === 8)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq ===
        (1L to 10L).toSeq)
    }
    val bf = Similarity.bruteForceTopK(spark, Sf0001).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) =>
        q -> rs.map(_.getAs[Long]("neighbor_id")).toSet
      }
    val overlap = rows.count { r =>
      bf.getOrElse(r.getAs[Long]("query_id"), Set.empty)(
        r.getAs[Long]("neighbor_id"))
    }
    assert(overlap > 0, s"no PQ/brute-force overlap in ${rows.length} hits")
  }

  test("pq re-rank (round 17): exact refine of the ADC shortlist — " +
      "recall >= raw ADC, distances exact, shortlist containment") {
    import graft.ops.Similarity
    val rr = Similarity.pqSearchRerank(spark, Sf0001).collect()
    val byQ = rr.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size === 8)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq ===
        (1L to 10L).toSeq)
    }
    // exact distances: every emitted d2 equals the brute-force grid's
    val vecs = Similarity.quantized(spark, Sf0001)
      .select("vec_id", "qv", "norm2").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector, r.getLong(2)))
    val byId = vecs.map(v => v._1 -> v).toMap
    def d2(a: (Long, Vector[Long], Long), b: (Long, Vector[Long], Long)) =
      a._3 + b._3 - 2L * a._2.lazyZip(b._2).map(_ * _).sum
    rr.foreach { r =>
      assert(r.getAs[Long]("d2") === d2(
        byId(r.getAs[Long]("query_id")),
        byId(r.getAs[Long]("neighbor_id"))))
    }
    // the refine stage can only help: per query, re-rank recall vs the
    // exact brute-force top-10 is at least raw ADC's
    val bf = Similarity.bruteForceTopK(spark, Sf0001).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) =>
        q -> rs.map(_.getAs[Long]("neighbor_id")).toSet
      }
    val adc = Similarity.pqSearch(spark, Sf0001).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) =>
        q -> rs.map(_.getAs[Long]("neighbor_id")).toSet
      }
    val rrSets = byQ.map { case (q, rs) =>
      q -> rs.map(_.getAs[Long]("neighbor_id")).toSet
    }
    val adcRecall = adc.map { case (q, s) => (s & bf(q)).size }.sum
    val rrRecall = rrSets.map { case (q, s) => (s & bf(q)).size }.sum
    assert(rrRecall >= adcRecall,
      s"re-rank recall $rrRecall < raw ADC recall $adcRecall")
  }

  test("ivf-pq: distributed IVFADC == full driver replay (coarse assign, " +
      "residual codes, probed-bucket ADC); scoring plan is join-free") {
    val out = Similarity.ivfPqSearch(spark, Sf0001)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"join in IVF-PQ plan:\n${plan.take(1500)}")
    val rows = out.collect()

    // independent driver replay from the collected vectors
    val vecs = Similarity.quantized(spark, Sf0001)
      .select("vec_id", "qv", "norm2").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector, r.getLong(2)))
      .sortBy(_._1)
    val coarse = Similarity.kmeansCentroids(spark, Sf0001)
    val (subDim, books) = Similarity.ivfPqCodebooks(spark, Sf0001)
    def d2(qv: Seq[Long], cv: Seq[Long]): Long = {
      val diff = qv.lazyZip(cv).map(_ - _)
      diff.map(v => v * v).sum
    }
    val bucketOf = vecs.map { case (id, qv, _) =>
      id -> coarse.map { case (cid, cv) => (d2(qv, cv), cid) }.min._2
    }.toMap
    val coarseById = coarse.toMap
    // residual codes for candidates
    def codesOf(id: Long, qv: Seq[Long]): Seq[Long] = {
      val rv = qv.lazyZip(coarseById(bucketOf(id))).map(_ - _)
      (0 until 4).map { s =>
        val rsv = rv.slice(s * subDim, (s + 1) * subDim)
        books.filter(_._1 == s)
          .map { case (_, cid, cv) => (d2(rsv, cv), cid) }.min._2
      }
    }
    val bookById = books.map { case (s, cid, cv) => (s, cid) -> cv }.toMap
    val expect = vecs.filter(_._1 < 8).flatMap { case (qid, qqv, _) =>
      val probed = coarse.map { case (cid, cv) => (d2(qqv, cv), cid) }
        .sorted.take(2).map(_._2).toSet
      vecs.filter(v => v._1 >= 8 && probed(bucketOf(v._1)))
        .map { case (xid, xqv, _) =>
          val b = bucketOf(xid)
          val rq = qqv.lazyZip(coarseById(b)).map(_ - _)
          val adc = codesOf(xid, xqv).zipWithIndex.map { case (cid, s) =>
            d2(rq.slice(s * subDim, (s + 1) * subDim), bookById((s, cid)))
          }.sum
          (qid, xid, adc)
        }
    }
    val expectTop = expect.groupBy(_._1).toSeq.flatMap { case (qid, cs) =>
      cs.sortBy(c => (c._3, c._2)).take(10).zipWithIndex.map {
        case ((_, xid, adc), i) => (qid, i + 1L, xid, adc)
      }
    }.toSet
    assert(rows.length === expectTop.size)
    rows.foreach { r =>
      assert(expectTop((r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("adc_d2"))),
        s"row not in replay: $r")
    }
    // every hit really is in a probed bucket
    rows.foreach { r =>
      val qid = r.getAs[Long]("query_id")
      val qqv = vecs.find(_._1 == qid).get._2
      val probed = coarse.map { case (cid, cv) => (d2(qqv, cv), cid) }
        .sorted.take(2).map(_._2).toSet
      assert(probed(bucketOf(r.getAs[Long]("neighbor_id"))))
    }
  }

  test("persisted ivf-pq index: identical results to the in-memory form; " +
      "scan prunes to the probed buckets; index stores only ids + codes") {
    val mem = Similarity.ivfPqSearch(spark, Sf0001).collect()
      .map(_.toSeq).toSeq
    val persisted = Similarity.ivfPqSearchPersisted(spark, Sf0001)
    assert(persisted.collect().map(_.toSeq).toSeq === mem)
    // static partition filter: the scan carries bucket IN (...) at the
    // partition level, so unprobed buckets' files are never read
    val plan = persisted.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("bucket"),
      s"no bucket partition pruning in plan:\n${plan.take(2000)}")
    assert(!plan.contains("Join"))
    // the on-disk index really is bucket-partitioned and carries only
    // the id + m code columns — no floats, no raw vectors
    val idx = new java.io.File(Similarity.ensureIvfPqIndex(spark, Sf0001))
    assert(idx.listFiles().exists(_.getName.startsWith("bucket=")))
    val cols = spark.read.parquet(idx.toString).schema.fieldNames.toSet
    assert(cols === Set("bucket", "neighbor_id",
      "code_0", "code_1", "code_2", "code_3"))
  }

  test("persisted ivf index: identical results to the in-memory form; " +
      "queries prune to the probed buckets' partitions") {
    val mem = Similarity.ivfSearch(spark, Sf0001).collect().map(_.toSeq).toSeq
    val persisted = Similarity.ivfSearchPersisted(spark, Sf0001)
    assert(persisted.collect().map(_.toSeq).toSeq === mem)
    // the on-disk layout is bucket-partitioned and the scan is pruned:
    // the plan carries a partition filter on bucket (dynamic pruning from
    // the broadcast probe side, or a pushed static one)
    val plan = persisted.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      (plan.toLowerCase.contains("dynamicpruning") ||
        plan.contains("bucket")),
      s"no partition pruning in plan:\n${plan.take(2000)}")
    // the index directory really is hive-partitioned by bucket
    val idx = new java.io.File(
      Similarity.ensureIvfIndex(spark, Sf0001))
    val parts = idx.listFiles().filter(_.getName.startsWith("bucket="))
    assert(parts.length === 8, parts.map(_.getName).mkString(","))
  }

  test("ivf over kmeans: probing all buckets == brute force exactly") {
    val ivfAll = Similarity.ivfSearch(spark, Sf0001, nprobe = 8)
      .select("query_id", "rank", "neighbor_id").collect().map(_.toSeq).toSeq
    val brute = Similarity.bruteForceTopK(spark, Sf0001).collect()
    // with every bucket probed the candidate sets coincide, so the ranked
    // results must be identical row-for-row (brute force has no cos col)
    assert(ivfAll.nonEmpty)
    assert(ivfAll === brute.map(_.toSeq).toSeq,
      "exhaustive probing diverged from brute force")
    // the default narrow probe returns well-formed top-k per query and is
    // a subset of each query's bucket-restricted candidates
    val ivf = Similarity.ivfSearch(spark, Sf0001).collect()
    assert(ivf.nonEmpty)
    val byQ = ivf.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ===
        (1L to rows.length.toLong))
    }
    // probed recall vs brute force is sane (>= 40% at nprobe=2 of 8 on the
    // synthetic corpus; exact value is data-dependent, equality above is
    // the real guarantee)
    val bruteSet = brute.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"))).toSet
    val hit = ivf.count(r => bruteSet((r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"))))
    assert(hit * 10 >= bruteSet.size * 4, s"recall collapsed: $hit/${bruteSet.size}")
  }

  test("pii scan: each planted artifact found once, redaction budget exact") {
    import spark.implicits._
    val rows = Cleanse.piiScan(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val ids = Tables.documents(spark, Sf0001)
      .select("doc_id").as[Long].collect()
    assert(rows.map(_.getAs[Long]("emails")).sum ===
      ids.count(_ % 11 == 0).toLong)
    assert(rows.map(_.getAs[Long]("ips")).sum ===
      ids.count(_ % 13 == 0).toLong)
    assert(rows.map(_.getAs[Long]("phones")).sum ===
      ids.count(_ % 17 == 0).toLong)
    // pii_chars is exactly what a regexp_replace redaction pass removes
    val piiChars = rows.map(_.getAs[Long]("pii_chars")).sum
    assert(piiChars > 0L)
    val redacted = Cleanse.piiCorpus(spark, Sf0001)
      .select(sum(length(col("text")) -
        length(regexp_replace(regexp_replace(regexp_replace(col("text"),
          Cleanse.EmailRe, ""), Cleanse.Ipv4Re, ""), Cleanse.PhoneRe, "")))
        .as("removed"))
      .collect()(0).getLong(0)
    assert(redacted === piiChars)
  }

  test("boilerplate: page chrome flagged, rare content kept") {
    val rows = Cleanse.boilerplate(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val docs = r.getAs[Long]("docs")
      val flagged = r.getAs[Long]("boilerplate_lines")
      val removed = r.getAs[Long]("removed_instances")
      // header + footer are on 100% of the source's pages — always
      // flagged; the cookie banner (~33%) may or may not clear 30% in a
      // small source, and nothing else can (promo is 2%, bodies unique)
      assert(flagged >= 2L && flagged <= 3L)
      assert(removed >= 2L * docs)
      assert(removed <= 2L * docs + docs / 3 + 1)
      assert(r.getAs[Long]("chars_removed") > 0L)
      assert(r.getAs[Long]("distinct_lines") > flagged)
    }
  }

  test("bpe training: distributed trace == driver replay") {
    val out = TextStats.bpeTrain(spark, Sf0001).collect()
    assert(out.length === 3)

    // exact driver replay: same vocab collapse, same (freq desc, l, r)
    // rule order, same greedy left-to-right merge fold
    val texts = Tables.documents(spark, Sf0001)
      .select("text").collect().map(_.getString(0))
    val freq = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ").filter(_.nonEmpty)
      .foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1L))
    var vocab: Seq[(Vector[String], Long)] =
      freq.toSeq.map { case (w, f) => (w.split("").toVector, f) }
    out.foreach { row =>
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val (bp, bf) = pairs.toSeq.minBy { case ((l, r), f) => (-f, l, r) }
      val merged = bp._1 + bp._2
      assert((row.getAs[String]("left_sym"), row.getAs[String]("right_sym"),
        row.getAs[String]("merged"), row.getAs[Long]("pair_freq")) ===
        (bp._1, bp._2, merged, bf))
      vocab = vocab.map { case (syms, f) =>
        (syms.foldLeft(Vector.empty[String]) { (acc, s) =>
          if (acc.nonEmpty && acc.last == bp._1 && s == bp._2)
            acc.init :+ merged
          else acc :+ s
        }, f)
      }
      val tokensAfter = vocab.map { case (s, f) => s.length * f }.sum
      val vocabSyms = vocab.flatMap(_._1).distinct.length.toLong
      assert(row.getAs[Long]("tokens_after") === tokensAfter)
      assert(row.getAs[Long]("vocab_syms") === vocabSyms)
    }
    // merging strictly shrinks the corpus token mass step over step
    val masses = out.map(_.getAs[Long]("tokens_after"))
    assert(masses.zip(masses.tail).forall(p => p._2 < p._1))
  }

  test("lm score: distributed == driver replay, relative flag is scale-sane") {
    val rows = TextStats.lmScore(spark, Sf0001).collect()
    assert(rows.nonEmpty)

    // exact driver replay: same bigram derivation (single-token docs get
    // their word as the lone "bigram"), same bin-length bits
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bigrams(t: String): Seq[String] = {
      val w = t.split(" ", -1)
      if (w.length < 2) Seq(w.mkString(" "))
      else w.sliding(2).map(_.mkString(" ")).toSeq
    }
    def bits(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach(d => bigrams(d._3).foreach(g =>
      counts(g) = counts.getOrElse(g, 0L) + 1L))
    val n = counts.values.sum
    val corpusX = counts.values
      .map(c => c * (bits(n) - bits(c))).sum * 1000 / n
    val bySource = docs.groupBy(_._2).map { case (src, ds) =>
      val per = ds.map { case (_, _, t) =>
        val gs = bigrams(t)
        val sb = gs.map(g => bits(n) - bits(counts(g))).sum
        (gs.size.toLong, sb, gs.count(g => counts(g) == 1L).toLong)
      }
      val nb = per.map(_._1).sum
      src -> (ds.length.toLong, nb,
        per.map(_._2).sum * 1000 / nb, per.map(_._3).sum * 1000 / nb,
        per.count(p => p._2 * 1000 / p._1 + 150 <= corpusX).toLong)
    }
    rows.foreach { r =>
      val exp = bySource(r.getAs[String]("source"))
      assert((r.getAs[Long]("docs"), r.getAs[Long]("bigrams"),
        r.getAs[Long]("avg_surprisal_x1000"), r.getAs[Long]("novel_x1000"),
        r.getAs[Long]("common_docs")) === exp,
        s"source ${r.getAs[String]("source")}")
    }
    // the relative flag catches outliers, not everything/nothing
    val flagged = rows.map(_.getAs[Long]("common_docs")).sum
    val total = rows.map(_.getAs[Long]("docs")).sum
    assert(flagged > 0L && flagged * 4 < total,
      s"flagged $flagged of $total")
  }

  test("filter agreement: matrix == driver replay off independent flags") {
    import spark.implicits._
    val rows = TextStats.filterAgreement(spark, Sf0001).collect()
    assert(rows.length === 15) // 5 diagonal + C(5,2) pairs

    // clf flag from an independent plan shape (explode + sum, not the
    // operator's narrow fold); the other four gates in plain Scala
    val clfByDoc = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id")
      .agg(sum(pmod(graft.functions.PortableHash.h60(col("t")) % 64L,
        lit(13L)) - 6L).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) <= 0L)).toMap
    val flags = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect().map { r =>
        val (id, t) = (r.getLong(0), r.getString(1))
        val tokens = t.split(" ", -1).length.toLong
        val atl = (t.length.toLong - (tokens - 1)) * 100 / tokens
        val the = (t.length.toLong -
          t.replace(" the ", "").length.toLong) / 5
        Map("len" -> (tokens < 20), "shape_low" -> (atl < 300),
          "shape_high" -> (atl > 1000), "stop" -> (the < 1),
          "clf" -> clfByDoc(id))
      }
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("filter_a"), r.getAs[String]("filter_b"))
      val both = flags.count(f => f(a) && f(b)).toLong
      val aOnly = flags.count(f => f(a) && !f(b)).toLong
      val bOnly = flags.count(f => f(b) && !f(a)).toLong
      val union = both + aOnly + bOnly
      assert((r.getAs[Long]("dropped_both"), r.getAs[Long]("dropped_a_only"),
        r.getAs[Long]("dropped_b_only"), r.getAs[Long]("union_docs"),
        r.getAs[Long]("jaccard_x1000")) ===
        (both, aOnly, bOnly, union,
          if (union > 0) both * 1000 / union else 0L), s"pair ($a, $b)")
      if (a == b) {
        assert(aOnly === 0L && bOnly === 0L)
        assert(r.getAs[Long]("jaccard_x1000") === (if (both > 0) 1000L else 0L))
      }
    }
  }

  test("keyword search: ranking == driver replay, top-k pushed down") {
    val out = Search.keywordSearch(spark, Sf0001).collect()
    assert(out.nonEmpty)

    // driver replay: same tokenization, same integer scoring, same order
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    def bits(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val dTotal = docs.length.toLong
    val expected = Search.Queries.flatMap { case (qid, terms) =>
      val dfs = terms.map(t =>
        t -> docs.count(_._2.contains(t)).toLong).toMap
      docs.flatMap { case (id, toks) =>
        val score = terms.map { t =>
          val tf = toks.count(_ == t).toLong
          if (tf == 0L) 0L
          else (bits(dTotal) - bits(dfs(t)) + 1) * (tf * 1000L / (tf + 1L))
        }.sum
        if (terms.exists(toks.contains)) Some((id, score)) else None
      }.sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, s), i) => (qid, i + 1L, id, s) }
    }
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === expected)

    // the rank filter must reach a WindowGroupLimit (map-side top-k), not
    // a full per-query sort behind one window
    val plan = Search.keywordSearch(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("png decode: q97 matches the generator; corruption throws") {
    val rows = Multimodal.pngDecode(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (4L + id % 16, 4L + id % 12)
      val n = (w * h * 3).toInt
      val sum =
        (0 until n).map(i => Multimodal.RealCodecs.pngPixel(id, i).toLong).sum
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
        (w, h, n.toLong, sum), s"doc $id")
    }
    // a flipped byte inside IDAT fails that chunk's CRC32 — it must
    // throw, never mis-decode
    val png = Multimodal.RealCodecs.encodePng(9, 7, 5L)
    val bad = png.clone()
    bad(45) = (bad(45) ^ 0x41).toByte
    intercept[java.io.IOException] { Multimodal.RealCodecs.decodePng(bad) }
    // truncated payloads surface as errors too
    intercept[Exception] { Multimodal.RealCodecs.decodePng(png.take(30)) }
    // a corrupt chunk length (oversized/negative) must throw the typed
    // IOException, not an ArrayIndexOutOfBoundsException
    val badLen = png.clone()
    badLen(8) = 0x7f.toByte // IHDR declared length now ~2^31
    intercept[java.io.IOException] { Multimodal.RealCodecs.decodePng(badLen) }
  }

  test("jpeg decode: q99 matches the uniform-gray formula; lossy content " +
      "is deterministic; corruption throws") {
    import Multimodal.RealCodecs
    val rows = Multimodal.jpegDecode(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (8L + id % 16, 8L + id % 12)
      val v = (id * 37) % 256
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
        (w, h, w * h * 3, 3 * v * w * h), s"doc $id")
    }
    // genuinely lossy content (non-uniform image, quality 0.7): the decode
    // must be deterministic run-to-run and dimension-exact, and the mean
    // per-channel error vs the source must stay small — this is the part
    // of the codec the uniform-gray oracle can't pin exactly
    val w = 24; val h = 16
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 11 + y * 7) % 256
      img.setRGB(x, y, (v << 16) | (((v + 80) % 256) << 8) | ((v + 160) % 256))
    }
    val out = new java.io.ByteArrayOutputStream
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    wr.setOutput(ios)
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.7f)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wr.dispose(); ios.close()
    val lossy = out.toByteArray
    val d1 = RealCodecs.decodeJpeg(lossy)
    val d2 = RealCodecs.decodeJpeg(lossy)
    assert(d1 === d2) // deterministic
    assert((d1.width, d1.height) === ((w, h)))
    // mean absolute per-channel-byte error ≤ 16 at quality 0.7
    var srcSum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val px = img.getRGB(x, y)
      srcSum += ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
    }
    assert(math.abs(d1.pixelSum - srcSum).toDouble / (w * h * 3) <= 16.0)
    // corrupt payloads must throw the typed IOException, never decode
    intercept[java.io.IOException] {
      RealCodecs.decodeJpeg("not a jpeg".getBytes)
    }
    intercept[java.io.IOException] {
      RealCodecs.decodeJpeg(lossy.take(20))
    }
    // and the sniffing decoder routes jpeg by magic
    assert(RealCodecs.decode(lossy).format === "jpeg")
  }

  test("corpus drift: TV == driver replay, bounded in [0, 1e6]") {
    val rows = TextStats.driftMonitor(spark, Sf0001).collect()
    assert(rows.nonEmpty)

    // split fetched via the engine's hash (not replicable in pure Scala),
    // everything downstream replayed on the driver
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("source"), col("text"),
        (graft.functions.PortableHash.h60(col("doc_id").cast("string"))
          % 10L < 4L).as("inc"))
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getBoolean(3)))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val counts =
        scala.collection.mutable.Map.empty[String, (Long, Long)]
      docs.filter(_._1 == src).foreach { case (_, text, inc) =>
        text.split(" ", -1).foreach { t =>
          val (a, b) = counts.getOrElse(t, (0L, 0L))
          counts(t) = if (inc) (a, b + 1L) else (a + 1L, b)
        }
      }
      val na = counts.values.map(_._1).sum
      val nb = counts.values.map(_._2).sum
      val num = counts.values.map { case (a, b) =>
        math.abs(a * nb - b * na)
      }.sum
      val tv =
        if (na > 0 && nb > 0) num * 1000000L / (2L * na * nb) else 0L
      assert((r.getAs[Long]("base_tokens"), r.getAs[Long]("inc_tokens"),
        r.getAs[Long]("distinct_tokens"), r.getAs[Long]("tv_x1e6")) ===
        (na, nb, counts.size.toLong, tv), s"source $src")
      assert(tv >= 0L && tv <= 1000000L)
    }
  }

  test("bpe apply: per-source compression == driver tokenizer replay") {
    val rows = TextStats.bpeApply(spark, Sf0001).collect()
    assert(rows.nonEmpty)

    // train the same 3 rules by driver replay, tokenize every distinct
    // word, then roll up the corpus word stream per source
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val freq = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach(_._3.split(" ").filter(_.nonEmpty)
      .foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1L))
    var vocab: Map[String, Vector[String]] =
      freq.keys.map(w => w -> w.split("").toVector).toMap
    for (_ <- 1 to 3) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (w, syms) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + freq(w)
        }
      }
      val ((l, r), _) = pairs.toSeq.minBy { case ((a, b), f) => (-f, a, b) }
      val merged = l + r
      vocab = vocab.map { case (w, syms) =>
        w -> syms.foldLeft(Vector.empty[String]) { (acc, s) =>
          if (acc.nonEmpty && acc.last == l && s == r) acc.init :+ merged
          else acc :+ s
        }
      }
    }
    val bySource = docs.groupBy(_._2).map { case (src, ds) =>
      val words = ds.flatMap(_._3.split(" ").filter(_.nonEmpty))
      val ws = words.length.toLong
      val bpe = words.map(w => vocab(w).length.toLong).sum
      src -> (ds.map(_._1).distinct.length.toLong, ws, bpe,
        bpe * 1000L / ws)
    }
    rows.foreach { r =>
      val exp = bySource(r.getAs[String]("source"))
      assert((r.getAs[Long]("docs"), r.getAs[Long]("ws_tokens"),
        r.getAs[Long]("bpe_tokens"),
        r.getAs[Long]("compression_x1000")) === exp,
        s"source ${r.getAs[String]("source")}")
      // 3 merges really fired: tokenized form is strictly shorter than
      // character count would be, and at most the whitespace form x word len
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("ws_tokens"))
    }
  }

  test("incremental dedup: categories partition the batch, both drops occur") {
    val rows = Dedup.incrementalDedup(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("incoming") ===
        r.getAs[Long]("dropped_in_batch") + r.getAs[Long]("dropped_vs_base") +
          r.getAs[Long]("survivors"))
    }
    // the hash split must exercise BOTH drop categories (a modular split
    // would structurally zero one of them — the regression this guards)
    assert(rows.map(_.getAs[Long]("dropped_in_batch")).sum > 0L)
    assert(rows.map(_.getAs[Long]("dropped_vs_base")).sum > 0L)
    assert(rows.map(_.getAs[Long]("survivors")).sum > 0L)
    // survivors carry exactly the distinct incoming digests absent from
    // base (recomputed with an independent digest-level plan)
    val docs = Dedup.corpus(spark, Sf0001)
      .select(col("doc_id"),
        md5(col("text")).as("digest"),
        (graft.functions.PortableHash.h60(col("doc_id").cast("string"))
          % 10L < 4L).as("is_incoming"))
    val expect = docs.where(col("is_incoming"))
      .join(docs.where(!col("is_incoming")).select("digest").distinct(),
        Seq("digest"), "left_anti")
      .select(countDistinct("digest")).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("survivors")).sum === expect)
  }
  test("round 17: streaming oracles run on the ROCKSDB state store — " +
      "provider pinned in the executed query's checkpoint metadata, " +
      "session conf restored after") {
    // sentinel ≠ ProbeStatePartitions so the restore is distinguishable
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
    graft.streaming.StreamingStats.watermarkReplayOnce(spark, Sf0001)
      .collect()
    val ckpt = graft.streaming.StreamingStats.lastCheckpoint.get()
    assert(ckpt != null, "replay recorded no checkpoint")
    // the EXECUTED query's config: OffsetSeqMetadata pins the state
    // store provider class into offsets/<batch> at query start
    val off = new java.io.File(ckpt, "offsets")
    val batchFiles = Option(off.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.forall(_.isDigit))
    assert(batchFiles.nonEmpty, s"no offset log under $off")
    val meta = new String(java.nio.file.Files.readAllBytes(
      batchFiles.minBy(_.getName.toInt).toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(meta.contains(graft.streaming.StreamingStats.RocksDbProvider),
      s"offsets metadata does not pin RocksDB:\n$meta")
    // the store materialized state under the checkpoint
    assert(new java.io.File(ckpt, "state").isDirectory)
    // and the wrapper restored the session to its prior provider
    assert(!spark.conf
      .getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
    // round 19 (VERDICT r18 Next #2): the replay's state is sized to
    // the PROBE partition count, not the session's shuffle partitions —
    // pinned the same way the provider is, in the executed query's
    // offsets metadata — and the wrapper restored the session conf
    assert(meta.contains("\"spark.sql.shuffle.partitions\":\"" +
      graft.streaming.StreamingStats.ProbeStatePartitions + "\""),
      s"offsets metadata does not pin the probe state partitions:\n$meta")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === "7",
      "wrapper must restore the session's shuffle partitions")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  test("round 18: the RocksDB store actually HOLDS the replay state — " +
      "stateOperators row counts and rocksdb custom metrics read off " +
      "the EXECUTED q208/q220 queries (a silent in-memory fallback " +
      "would carry no rocksdb metrics)") {
    import scala.jdk.CollectionConverters._
    def stateOps(run: => Unit) = {
      run
      val progress = graft.streaming.StreamingStats.lastProgress.get()
      assert(progress != null && progress.nonEmpty,
        "replay captured no progress events")
      val ops = progress.flatMap(_.stateOperators)
      assert(ops.nonEmpty, "no stateful-operator progress recorded")
      ops
    }
    // q208 keyed dedup state
    val dd = stateOps(graft.streaming.StreamingStats
      .dedupReplayOnce(spark, Sf0001).collect())
    assert(dd.map(_.numRowsTotal).max > 0,
      "dedup state store held no rows")
    val ddMetrics = dd.flatMap(_.customMetrics.keySet.asScala)
    assert(ddMetrics.exists(_.toLowerCase.contains("rocksdb")),
      s"dedup state metrics carry no rocksdb counters: " +
        s"${ddMetrics.distinct.sorted.mkString(",")}")
    // state bytes are accounted by the store (rocksdb SST/mem totals)
    assert(dd.flatMap(_.customMetrics.asScala)
      .exists { case (k, v) =>
        k.toLowerCase.contains("rocksdb") && v.longValue() > 0L },
      "every rocksdb counter is zero — state never touched the store")
    // q220 symmetric stream-stream join state (both sides buffered)
    val sj = stateOps(graft.streaming.StreamingStats
      .streamJoinReplayOnce(spark, Sf0001).collect())
    assert(sj.map(_.numRowsTotal).max > 0,
      "join state store held no rows")
    assert(sj.flatMap(_.customMetrics.keySet.asScala)
      .exists(_.toLowerCase.contains("rocksdb")),
      "join state metrics carry no rocksdb counters")
  }
}
