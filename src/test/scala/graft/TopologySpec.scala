package graft

import org.apache.spark.sql.functions._

import graft.ops.{ReadRepair, Rebuild}

/** Round-16 part-3 topology additions: multi-DC rebuild and blocking
  * read repair. */
class TopologySpec extends SparkSpec {

  test("rebuild: every DC2 view verified, each quarter held once") {
    val rows = Rebuild.roundtrip(spark, Sf0001).collect()
    assert(rows.length === 4)
    assert(rows.forall(_.getAs[Boolean]("verified")))
    assert(rows.forall(_.getAs[Long]("dc2_holders") === 1L))
    // ownership and sources are the NTS plan: node q/2 owns quarter q,
    // streamed from DC1 primary q
    rows.foreach { r =>
      val q = r.getAs[Long]("quarter")
      assert(r.getAs[Long]("node") === q / 2)
      assert(r.getAs[Long]("src_node") === q)
    }
    // DC2 jointly holds the whole ring exactly once
    val corpus = graft.sources.Fixtures.cells(spark, Sf0001).count()
    assert(rows.map(_.getAs[Long]("events")).sum === corpus)
    // four real streamed files exist
    val files = Option(new java.io.File(
        Rebuild.ensureRebuilt(spark, Sf0001)).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .count(_.getName.endsWith("-Data.db"))
    assert(files === 4)
  }

  test("read repair: read cohort converges, unread stays divergent") {
    val rows = ReadRepair.roundtrip(spark, Sf0001).collect()
    assert(rows.map(_.getAs[String]("cohort")).toSeq ===
      Seq("read", "unread"))
    assert(rows.forall(_.getAs[Boolean]("contract_held")))
    val read = rows(0); val unread = rows(1)
    // the workload's partitions all converge; every detected stale
    // partition was repaired by the diff
    assert(read.getAs[Long]("diverged_after") === 0L)
    assert(read.getAs[Long]("stale_partitions") > 0L)
    assert(read.getAs[Long]("repaired_partitions") ===
      read.getAs[Long]("stale_partitions"))
    assert(read.getAs[Long]("patched_events") > 0L)
    // read repair is NOT anti-entropy: unread divergence is untouched
    assert(unread.getAs[Long]("diverged_after") ===
      unread.getAs[Long]("stale_partitions"))
    assert(unread.getAs[Long]("diverged_after") > 0L)
    assert(unread.getAs[Long]("patched_events") === 0L)
  }

  test("merkle descent: log-cost localization — 13 of 127 nodes visited") {
    import graft.ops.MerkleRepair
    val rows = MerkleRepair.roundtrip(spark, Sf0001).collect()
    // 2·depth + 1 visits for a single divergent leaf
    assert(rows.length === 2 * MerkleRepair.Depth + 1)
    // the mismatch chain is exactly leaf 42's ancestor line; every
    // sibling off the chain verifies and stops
    rows.foreach { r =>
      val level = r.getAs[Long]("level").toInt
      val onChain = r.getAs[Long]("node_idx") ===
        (MerkleRepair.DivergentLeaf >> (MerkleRepair.Depth - level))
      assert(r.getAs[Boolean]("matched") === !onChain)
      val expect =
        if (!onChain) "verified-stop"
        else if (level < MerkleRepair.Depth) "descend" else "stream"
      assert(r.getAs[String]("action") === expect)
    }
    // exactly one stream target: the divergent leaf itself
    val streams = rows.filter(_.getAs[String]("action") == "stream")
    assert(streams.map(r => (r.getAs[Long]("level"),
      r.getAs[Long]("node_idx"))).toSeq ===
      Seq((MerkleRepair.Depth.toLong, MerkleRepair.DivergentLeaf)))
  }

  test("materialized view: covered read with the view key pushed down") {
    import graft.ops.MaterializedView
    import graft.sources.datadb.{DataDb, DataDbScan}
    val viewPath = MaterializedView.ensureView(spark, Sf0001)
    // the probed scan pushes the view key — no base scan, no full view
    // scan: planned ranges stay bounded by the probed partitions
    val probeBytes = MaterializedView.QueryValues.map(v =>
      java.nio.ByteBuffer.allocate(8).putLong(v).array())
    val probed = DataDb.read(spark, viewPath,
        format = DataDbScan.FormatCassandra)
      .where(col("key").isin(probeBytes: _*))
    assert(probed.queryExecution.executedPlan.toString.contains("In(key"),
      "view key filter not pushed into the scan")
    // the covered read reproduces the base-side derivation exactly
    val rows = MaterializedView.roundtrip(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("value")).toSeq ===
      MaterializedView.QueryValues)
    val base = graft.sources.Fixtures.cells(spark, Sf0001)
      .where(col("kind") === "CELL" && !col("is_tombstone"))
      .withColumn("v", col("size_bytes") % 61)
    rows.foreach { r =>
      val v = r.getAs[Long]("value")
      val expect = base.where(col("v") === v)
      assert(r.getAs[Long]("total_rows") === expect.count())
      assert(r.getAs[Long]("pre_rows") === expect
        .where(col("timestamp_us") < MaterializedView.UpdateFromUs)
        .count())
      // the write path maintained the view: deltas present
      assert(r.getAs[Long]("delta_rows") > 0L)
    }
  }

  test("snapshot: true hard links, zero bytes copied, state preserved") {
    import graft.ops.Snapshot
    import java.nio.file.{Files, Paths}
    val live = graft.sources.datadb.CassandraDataFixture
      .ensureFiles(spark, Sf0001, compressed = true)
    val snap = Snapshot.ensureSnapshot(spark, Sf0001)
    val liveFiles = Option(new java.io.File(live).listFiles())
      .getOrElse(Array.empty[java.io.File]).filter(_.isFile)
    assert(liveFiles.nonEmpty)
    // every component linked; each snapshot entry IS the live file
    // (same file key — a link, not a copy)
    liveFiles.foreach { f =>
      val s = Paths.get(snap, f.getName)
      assert(Files.exists(s), s"missing snapshot link for ${f.getName}")
      assert(Files.isSameFile(s, f.toPath),
        s"${f.getName} was copied, not hard-linked")
    }
    // the restored scan and the compacted live set disagree — the
    // snapshot genuinely preserves a state the live set no longer has
    val rows = Snapshot.roundtrip(spark, Sf0001).collect()
    val byState = rows.groupBy(_.getAs[String]("state"))
      .view.mapValues(_.map(_.getAs[Long]("events")).sum).toMap
    assert(byState("snapshot") > byState("compacted"),
      "compaction must have merged/purged events the snapshot kept")
    // the snapshot state equals the original corpus relation
    val corpus = graft.sources.Fixtures.cells(spark, Sf0001).count()
    assert(byState("snapshot") === corpus)
  }

  test("CAS registers: serial per-partition chains, both outcomes real") {
    import graft.ops.CasRegister
    val rows = CasRegister.roundtrip(spark, Sf0001).collect()
    assert(rows.length === CasRegister.Buckets)
    val (ops, applied, rejected, regs) = (
      rows.map(_.getAs[Long]("ops")).sum,
      rows.map(_.getAs[Long]("applied")).sum,
      rows.map(_.getAs[Long]("rejected")).sum,
      rows.map(_.getAs[Long]("registers")).sum)
    // conservation: every op either applied or rejected
    assert(applied + rejected === ops)
    // the condition genuinely bites in both directions
    assert(applied > 0L && rejected > 0L)
    // one register per partition key; ops cover the whole corpus
    val corpus = graft.sources.Fixtures.cells(spark, Sf0001)
    assert(regs === corpus.select("key").distinct().count())
    assert(ops === corpus.count())
    // register domain is {0, 1, 2}
    assert(rows.map(_.getAs[Long]("final_sum")).sum <= 2L * regs)
  }

  test("epoch shuffle: full coverage per epoch, epochs reshuffled") {
    import graft.ops.Mixing
    val rows = Mixing.epochShuffle(spark, Sf0001).collect()
    val docs = graft.sources.Tables.documents(spark, Sf0001).count()
    val byEpoch = rows.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet === Set(0L, 1L))
    byEpoch.foreach { case (_, bs) =>
      // every document exactly once per epoch
      assert(bs.map(_.getAs[Long]("docs")).sum === docs)
      // identical membership digest per epoch (same corpus)
      assert(bs.map(_.getAs[Long]("ids_digest")).sum ===
        byEpoch(0L).map(_.getAs[Long]("ids_digest")).sum)
    }
    // the reshuffle is real: per-batch contents differ between epochs
    def vec(e: Long) = byEpoch(e).sortBy(_.getAs[Long]("batch"))
      .map(_.getAs[Long]("ids_digest")).toSeq
    assert(vec(0L) !== vec(1L))
    // the plan's only window is partitioned — no global sort anywhere
    val plan = Mixing.epochShuffle(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition()"),
      "unpartitioned window found in the shuffle plan")
  }

  test("counters: max-clock merge is exact where shard-sum would not be") {
    import graft.ops.Counters
    val rows = Counters.roundtrip(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("exact")))
    val (shards, nodeShards, merged, deltas) = (
      rows.map(_.getAs[Long]("shard_rows")).sum,
      rows.map(_.getAs[Long]("node_shards")).sum,
      rows.map(_.getAs[Long]("merged_total")).sum,
      rows.map(_.getAs[Long]("delta_total")).sum)
    // the double-count trap is REAL in this corpus: strictly more
    // shard rows than (cell, node) pairs, so a naive shard-sum would
    // overcount — yet the max-clock merge lands exactly on the truth
    assert(shards > nodeShards)
    assert(merged === deltas)
  }

  test("incremental backup: flush-time links restore on top of the base") {
    import graft.ops.{CommitLog, IncrementalBackup}
    import java.nio.file.{Files, Paths}
    val flushes = CommitLog.flushedDir(spark, Sf0001)
    val backups = IncrementalBackup.ensureBackups(spark, Sf0001)
    // every flushed component linked, never copied
    val flushed = Option(new java.io.File(flushes).listFiles())
      .getOrElse(Array.empty[java.io.File]).filter(_.isFile)
    assert(flushed.nonEmpty)
    flushed.foreach { f =>
      val b = Paths.get(backups, f.getName)
      assert(Files.exists(b) && Files.isSameFile(b, f.toPath),
        s"${f.getName} not hard-linked into backups/")
    }
    // the restored union: snapshot tier == corpus; backup tier == the
    // recovery state (one winner per reconciled cell)
    val rows = IncrementalBackup.roundtrip(spark, Sf0001).collect()
    val byTier = rows.groupBy(_.getAs[String]("tier"))
      .view.mapValues(_.map(_.getAs[Long]("events")).sum).toMap
    val corpus = graft.sources.Fixtures.cells(spark, Sf0001)
    assert(byTier("snapshot") === corpus.count())
    assert(byTier("backup") === corpus
      .select("key", "clustering", "column_name").distinct().count())
  }

  test("read repair: the patch is the DIFF — only stale read events") {
    val patchPath = ReadRepair.ensurePatched(spark, Sf0001)
    val patch = graft.sources.datadb.DataDb.cells(spark, patchPath,
      format = graft.sources.datadb.DataDbScan.FormatCassandra)
    val bad = patch.where(
      col("timestamp_us") < ReadRepair.StaleFromUs ||
        pmod(col("key"), lit(ReadRepair.ReadMod)) =!= 0).count()
    assert(bad === 0L)
    assert(patch.count() > 0L)
  }
}
