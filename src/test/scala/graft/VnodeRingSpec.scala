package graft

import graft.ops.{VnodeBootstrap, VnodeRing}

/** Round 17: the topology family at vnode granularity (VERDICT r16 ask
  * #1) — the pending-ranges calculus exercised at num_tokens=4 per
  * node, where ranges interleave and a departure's blast radius spans
  * the whole ring. */
class VnodeRingSpec extends SparkSpec {

  test("ring shape: 4 tokens per node, interleaved") {
    assert(VnodeRing.Owners.length === VnodeRing.Slots)
    (0 until VnodeRing.Nodes).foreach { n =>
      assert(VnodeRing.Owners.count(_ == n) === VnodeRing.VnodesPerNode)
    }
    // the assignment scatters: no node owns 3 consecutive slots
    (0 until VnodeRing.Slots).foreach { s =>
      val a = VnodeRing.Owners(s)
      assert(!(VnodeRing.Owners((s + 1) % VnodeRing.Slots) == a &&
        VnodeRing.Owners((s + 2) % VnodeRing.Slots) == a))
    }
  }

  test("replica walk skips same-owner tokens (slots 7,8 and the wrap)") {
    // slot 7 and 8 share owner 1: the naive "next token" second replica
    // of range 7 would be node 1 again; the real walk lands on slot 9
    assert(VnodeRing.Owners(7) === VnodeRing.Owners(8))
    assert(VnodeRing.oldReplicas(7)(1) === VnodeRing.Owners(9))
    // the 15 -> 0 wrap shares owner 0: range 15's walk skips slot 0
    assert(VnodeRing.Owners(15) === VnodeRing.Owners(0))
    assert(VnodeRing.oldReplicas(15)(1) === VnodeRing.Owners(1))
    // every replica pair is two distinct nodes
    (0 until VnodeRing.Slots).foreach { s =>
      assert(VnodeRing.oldReplicas(s).distinct.length === VnodeRing.Rf)
      assert(VnodeRing.survReplicas(s).distinct.length === VnodeRing.Rf)
    }
  }

  test("departure calculus: new ⊇ old∖{leaver}, gains iff leaver held") {
    (0 until VnodeRing.Slots).foreach { s =>
      val old = VnodeRing.oldReplicas(s).toSet
      val nw = VnodeRing.survReplicas(s).toSet
      assert(!nw.contains(VnodeRing.Leaving))
      assert((old - VnodeRing.Leaving).subsetOf(nw))
      assert(VnodeRing.gainerOf(s).isDefined ===
        old.contains(VnodeRing.Leaving))
      // untouched ranges keep their exact replica set
      if (!old.contains(VnodeRing.Leaving)) assert(nw === old)
    }
  }

  test("vnode blast radius: all three survivors gain, scattered ranges") {
    val gains = (0 until VnodeRing.Slots)
      .flatMap(s => VnodeRing.gainerOf(s).map(g => (s, g)))
    // node 3 replicated 9 of the 16 ranges
    assert(gains.length === 9)
    // every survivor gains somewhere — the property a single-token ring
    // cannot show (there, only the leaver's neighbors are touched)
    assert(gains.map(_._2).toSet === Set(0, 1, 2))
    // the gained ranges are NOT one contiguous arc of the ring
    val ranges = gains.map(_._1).toSet
    val arcs = (0 until VnodeRing.Slots).count(s =>
      ranges.contains(s) && !ranges.contains((s + 15) % 16))
    assert(arcs >= 3, s"gained ranges $ranges form only $arcs arcs")
  }

  test("executed vnode load: every view verified off real files at RF=2") {
    val rows = VnodeRing.loadRoundtrip(spark, Sf0001).collect()
    assert(rows.length === 2 * VnodeRing.Slots)
    assert(rows.forall(_.getAs[Boolean]("verified")))
    assert(rows.forall(_.getAs[Long]("holders") === 2L))
    // per-node holdings are the walk's (uneven — a real vnode effect)
    val held = rows.groupBy(_.getAs[Long]("node"))
      .view.mapValues(_.map(_.getAs[Long]("token_range")).toSet).toMap
    (0 until VnodeRing.Slots).foreach { s =>
      VnodeRing.oldReplicas(s).foreach(n =>
        assert(held(n.toLong).contains(s.toLong)))
    }
    // one real received sstable per node
    val files = Option(new java.io.File(
        VnodeRing.ensureLoaded(spark, Sf0001)).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .count(_.getName.endsWith("-Data.db"))
    assert(files === VnodeRing.Nodes)
  }

  test("executed vnode decommission: streams restore RF=2 everywhere") {
    val rows = VnodeRing.decommissionRoundtrip(spark, Sf0001).collect()
    assert(rows.forall(_.getAs[Boolean]("verified")))
    assert(rows.forall(_.getAs[Long]("holders") === 2L))
    assert(rows.forall(_.getAs[Long]("node") !== VnodeRing.Leaving.toLong))
    val streamed = rows.filter(_.getAs[String]("origin") == "streamed-in")
    assert(streamed.length === 9)
    assert(streamed.map(_.getAs[Long]("node")).toSet === Set(0L, 1L, 2L))
    // streamed views are exactly the calculus's gains
    val expect = (0 until VnodeRing.Slots)
      .flatMap(s => VnodeRing.gainerOf(s).map(g => (g.toLong, s.toLong)))
      .toSet
    assert(streamed.map(r => (r.getAs[Long]("node"),
      r.getAs[Long]("token_range"))).toSet === expect)
  }
  test("vnode bootstrap calculus: each joiner token splits one range; " +
      "gains scatter, untouched ranges keep their replicas") {
    import graft.ops.VnodeBootstrap
    // joiner primary exactly on its own 4 half-ranges (one split per
    // token: the preceding old token closes the rest of the sixteenth)
    val primaries = (0 until VnodeBootstrap.Slots).filter(h =>
      VnodeBootstrap.replicas(h, withJoiner = true).head ==
        VnodeBootstrap.Joiner)
    assert(primaries.toSet === VnodeBootstrap.JoinerSlots)
    (0 until VnodeBootstrap.Slots).foreach { h =>
      val before = VnodeBootstrap.replicas(h, withJoiner = false)
      val after = VnodeBootstrap.replicas(h, withJoiner = true)
      assert(before.distinct.length === 2)
      assert(after.distinct.length === 2)
      // the 32-half-range BEFORE view halves the 16-range q236 view
      assert(before === VnodeRing.oldReplicas(h / 2))
      // a range the joiner doesn't touch keeps its exact replica set
      if (!after.contains(VnodeBootstrap.Joiner)) assert(after === before)
      // at most one pre-join replica is displaced
      assert(before.count(n => !after.contains(n)) <= 1)
    }
    // pending transfers: each gained range streams from its pre-join
    // primary; gains land inside EVERY old node's territory
    val pending = VnodeBootstrap.pending
    assert(pending.nonEmpty)
    assert(pending.map(_._2).toSet === Set(0, 1, 2, 3))
    pending.foreach { case (h, src) =>
      assert(VnodeBootstrap.replicas(h, withJoiner = true)
        .contains(VnodeBootstrap.Joiner))
      assert(src === VnodeBootstrap.replicas(h, withJoiner = false).head)
    }
  }

  test("executed vnode bootstrap: every received view verified") {
    import graft.ops.VnodeBootstrap
    val rows = VnodeBootstrap.roundtrip(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("half_range")).toSet ===
      VnodeBootstrap.pending.map(_._1.toLong).toSet)
    assert(rows.forall(_.getAs[Boolean]("verified")))
    // one real received sstable per distinct source node
    val files = Option(new java.io.File(
        VnodeBootstrap.ensureBootstrapped(spark, Sf0001)).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .count(_.getName.endsWith("-Data.db"))
    assert(files === VnodeBootstrap.pending.map(_._2).distinct.length)
  }
  test("planning economy: vnode stream sources prune files at planning") {
    import org.apache.spark.sql.functions._
    import graft.sources.datadb.{DataDb, DataDbScan}
    val loaded = VnodeRing.ensureLoaded(spark, Sf0001)
    val full = DataDb.cells(spark, loaded,
      format = DataDbScan.FormatCassandra)
    // the decommission stream's source shape: the leaver's ONE file
    val leaver = full.where(col("sstable_id") ===
      VnodeRing.loadFileId(VnodeRing.Leaving.toLong))
    val lplan = leaver.queryExecution.executedPlan.toString
    assert(lplan.contains("sstable_id"),
      s"no pushed sstable_id filter:\n${lplan.take(800)}")
    assert(leaver.rdd.getNumPartitions < full.rdd.getNumPartitions,
      "the leaver filter must prune files at planning, not filter rows")
    // q238's retained scan pushes the survivors' isin the same way
    val plan238 = graft.ops.VnodeRing.decommissionRoundtrip(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan238.contains("In(sstable_id") ||
      plan238.contains("EqualTo(sstable_id"),
      "q238 retained scan does not push its sstable_id prefilter")
  }

  // ------------------------------------------------------------------
  // zero-copy disposition in the production bootstrap stream (round 18)

  test("zero-copy plan: fully-pending sixteenths link, half-pending " +
      "rewrite, untouched holdings skip") {
    val plan = VnodeBootstrap.zeroCopyPlan(spark, Sf0001)
    assert(plan.size === 32, "one row per (node, owned sixteenth)")
    val byTransport = plan.groupBy(_._5)
      .view.mapValues(_.map(t => (t._1, t._2)).toSet).toMap
    // sixteenths 1/5/9/13: BOTH halves pending from one source → linked
    assert(byTransport("linked") ===
      Set((2L, 1L), (0L, 5L), (3L, 9L), (1L, 13L)))
    // sixteenths 2/6/10/14: one half pending → rewritten
    assert(byTransport("rewritten") ===
      Set((1L, 2L), (3L, 6L), (0L, 10L), (2L, 14L)))
    assert(byTransport("skipped").size === 24)
    // a linked file's occupancy is exactly its requested set
    plan.collect { case (_, _, occ, req, "linked") => (occ, req) }
      .foreach { case (occ, req) => assert(occ === req) }
  }

  test("zero-copy execute: linked components are the SAME file as the " +
      "source holding; the rewritten remainder is a new file") {
    val sliced = new java.io.File(
      VnodeBootstrap.ensureSlicedHoldings(spark, Sf0001))
    val recv = new java.io.File(
      VnodeBootstrap.ensureZeroCopyBootstrapped(spark, Sf0001))
    val linked = Seq((2L, 1L), (0L, 5L), (3L, 9L), (1L, 13L))
    linked.foreach { case (n, s) =>
      val comps = Option(recv.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(VnodeBootstrap.sliceFileId(n, s)))
      assert(comps.nonEmpty, s"no linked components for node $n slice $s")
      comps.foreach { f =>
        val src = new java.io.File(sliced, f.getName)
        assert(java.nio.file.Files.isSameFile(f.toPath, src.toPath),
          s"${f.getName} is not a hard link of the source holding")
      }
      assert(comps.exists(_.getName.endsWith("-Data.db")))
      assert(comps.exists(_.getName.endsWith("-Summary.db")))
    }
    // rewritten remainders: one NEW sstable per source node, not a link
    Seq(0L, 1L, 2L, 3L).foreach { n =>
      val rw = new java.io.File(recv,
        s"nb-${VnodeBootstrap.ZcRewriteGenBase + n + 1}-big-Data.db")
      assert(rw.isFile, s"missing rewritten stream from node $n")
      assert(!new java.io.File(sliced, rw.getName).exists())
    }
  }

  test("zero-copy planning economy: the rewrite source prunes to the " +
      "half-pending files at planning; the plan reads only summary rows") {
    import org.apache.spark.sql.functions._
    import graft.sources.datadb.{DataDb, DataDbScan}
    val sliced = VnodeBootstrap.ensureSlicedHoldings(spark, Sf0001)
    val full = DataDb.cells(spark, sliced,
      format = DataDbScan.FormatCassandra)
    // the four half-pending files are the only rewrite input
    val rewritten = Seq((1L, 2L), (3L, 6L), (0L, 10L), (2L, 14L))
      .map { case (n, s) => VnodeBootstrap.sliceFileId(n, s) }
    val partial = full.where(col("sstable_id").isin(rewritten: _*))
    assert(partial.rdd.getNumPartitions < full.rdd.getNumPartitions,
      "the rewrite source must prune to the half-pending files at planning")
    val pplan = partial.queryExecution.executedPlan.toString
    assert(pplan.contains("In(sstable_id") ||
      pplan.contains("EqualTo(sstable_id"),
      s"rewrite scan does not push its sstable_id prefilter:\n" +
        pplan.take(600))
    // the coverage plan's input is the summary relation: ~1/4 of the
    // index entries, zero Data.db bytes
    val summaryRows = spark.read.format("sstable-summary").load(sliced)
      .count()
    val indexRows = graft.sources.indexdb.IndexDb.read(spark, sliced)
      .count()
    assert(summaryRows * 2 < indexRows)
  }

  test("zero-copy bootstrap converges transport-blind: digests equal " +
      "the sink-only bootstrap's") {
    val zc = VnodeBootstrap.zeroCopyRoundtrip(spark, Sf0001).collect()
    assert(zc.length === 12)
    assert(zc.forall(_.getAs[Boolean]("verified")))
    val byTransport = zc.groupBy(_.getAs[String]("transport"))
      .view.mapValues(_.map(_.getAs[Long]("half_range")).toSet).toMap
    assert(byTransport("linked") === Set(2L, 3L, 10L, 11L, 18L, 19L,
      26L, 27L))
    assert(byTransport("rewritten") === Set(4L, 12L, 20L, 28L))
    // same convergence as the rewrite-everything bootstrap (q242)
    val sinkOnly = VnodeBootstrap.roundtrip(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("half_range"), r.getAs[Long]("digest")))
      .toMap
    zc.foreach { r =>
      assert(r.getAs[Long]("digest") ===
        sinkOnly(r.getAs[Long]("half_range")))
    }
    // the non-pending half of a rewritten file never arrives
    import org.apache.spark.sql.functions._
    val halves = graft.sources.datadb.DataDb.cells(spark,
        VnodeBootstrap.ensureZeroCopyBootstrapped(spark, Sf0001),
        format = graft.sources.datadb.DataDbScan.FormatCassandra)
      .select(shiftright(graft.ops.AntiEntropy.token(col("key")),
        VnodeBootstrap.HalfShift).as("h"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(halves === VnodeBootstrap.pending.map(_._1.toLong).toSet)
  }
}
