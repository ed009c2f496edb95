package graft

import graft.ops.VnodeRing

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
    assert(VnodeRing.oldSecond(7) === VnodeRing.Owners(9))
    // the 15 -> 0 wrap shares owner 0: range 15's walk skips slot 0
    assert(VnodeRing.Owners(15) === VnodeRing.Owners(0))
    assert(VnodeRing.oldSecond(15) === VnodeRing.Owners(1))
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
}
