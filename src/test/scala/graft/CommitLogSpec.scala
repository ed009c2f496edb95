package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.functions._

import graft.ops.CommitLog
import graft.sources.commitlog.CommitLogFormat
import graft.sources.commitlog.CommitLogFormat.Mutation

class CommitLogSpec extends SparkSpec {

  private def mut(i: Int): Mutation =
    Mutation(i.toLong, (i % 3).toLong, s"c${i % 2}", "CELL",
      1000L + i, if (i % 4 == 0) 3600L else -1L, 2147483647L,
      isTombstone = i % 5 == 0, isExpiring = i % 4 == 0,
      sizeBytes = (i % 61).toLong)

  private def segmentBytes(id: Long, ms: Seq[Mutation]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    CommitLogFormat.writeSegment(out, id, ms)
    out.flush()
    bos.toByteArray
  }

  test("commitlog codec: segment roundtrips with byte accounting") {
    val ms = (0 until 800).map(mut)
    val bytes = segmentBytes(42L, ms)
    val seg = CommitLogFormat.parseSegment(bytes)
    assert(seg.id === 42L)
    assert(seg.mutations === ms.toVector)
    assert(seg.bytes === bytes.length.toLong)
    // div-rule sections: 800 entries x 66-byte entries ≈ 2 sections
    val entryBytes = ms.map(CommitLogFormat.entryLength(_).toLong).sum
    val expectSections =
      ms.scanLeft(0L)(_ + CommitLogFormat.entryLength(_)).init
        .map(_ / CommitLogFormat.SectionBytes).distinct.size
    assert(seg.sections.size === expectSections)
    assert(seg.sections.size >= 2,
      "fixture must span >1 section or the cadence is untested")
    assert(bytes.length.toLong ===
      18L + 8L * (seg.sections.size + 1) + entryBytes)
    assert(seg.sections.map(_.entries).sum === ms.size)
  }

  test("commitlog codec: an empty segment is just header + stop marker") {
    val bytes = segmentBytes(7L, Nil)
    val seg = CommitLogFormat.parseSegment(bytes)
    assert(seg.mutations.isEmpty && seg.sections.isEmpty)
    assert(bytes.length === 26) // 18 header + 8 stop marker
  }

  test("commitlog codec: corruption fails closed at every layer") {
    val ms = (0 until 50).map(mut)
    val clean = segmentBytes(9L, ms)
    def corrupt(at: Int): Array[Byte] = {
      val b = clean.clone(); b(at) = (b(at) ^ 0x5a).toByte; b
    }
    // header CRC (byte inside the id field)
    assertThrows[IllegalArgumentException](
      CommitLogFormat.parseSegment(corrupt(6)))
    // sync marker CRC (first marker's CRC int lives at bytes 22-25)
    assertThrows[IllegalArgumentException](
      CommitLogFormat.parseSegment(corrupt(23)))
    // entry payload (first payload begins at 18 + 8 + 8)
    assertThrows[IllegalArgumentException](
      CommitLogFormat.parseSegment(corrupt(40)))
    // torn tail: a truncated segment never parses as complete
    assertThrows[Exception](
      CommitLogFormat.parseSegment(clean.dropRight(5)))
  }

  test("commitlog WAL: every logged mutation reads back, one per cell") {
    val corpus = graft.sources.Fixtures.cells(spark, Sf0001).count()
    val mu = CommitLog.mutations(spark, Sf0001)
    assert(mu.count() === corpus)
    // several segments, contiguous ids from 0
    val segs = mu.select("segment").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(segs.length >= 2, "corpus must span >1 segment")
    assert(segs.toSeq === (0L until segs.length).toSeq)
  }

  test("commitlog WAL guard (round 19, VERDICT r18 ask #3): a WAL dir " +
      "swept under the session memo fails with a LABELED error, not an " +
      "opaque AnalysisException from a missing-glob scan") {
    // a private alias tier (symlinked tables) so poisoning ITS memoized
    // WAL never touches the Sf0001 WAL the other tests share
    val alias = java.nio.file.Files
      .createTempDirectory("graft-walguard").toFile.getAbsolutePath
    for (t <- graft.sources.Tables.all)
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(alias, s"$t.parquet"),
        java.nio.file.Paths.get(Sf0001, s"$t.parquet"))
    // first use builds + verifies the WAL (write-time segment count)
    val wal = CommitLog.ensureWal(spark, alias)
    assert(CommitLog.mutations(spark, alias).count() > 0)
    // the r18 kill mechanism: the dir vanishes while the memo lives on
    graft.sources.TempDirs.deleteTree(java.nio.file.Paths.get(wal))
    val e = intercept[IllegalStateException] {
      CommitLog.mutations(spark, alias).count()
    }
    assert(e.getMessage.contains("WAL fixture missing"),
      s"expected the labeled guard, got: ${e.getMessage}")
    graft.sources.TempDirs.deleteTree(java.nio.file.Paths.get(alias))
  }

  test("commitlog segments report: byte accounting and CRC flags hold") {
    val rep = CommitLog.segments(spark, Sf0001).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      assert(r.getAs[Boolean]("crc_verified"))
      assert(r.getAs[Long]("file_bytes") ===
        18L + 8L * (r.getAs[Long]("sections") + 1L) +
          r.getAs[Long]("entry_bytes"))
      assert(r.getAs[Long]("first_ts_us") <= r.getAs[Long]("last_ts_us"))
    }
  }

  test("commitlog recovery: LWW state, tombstones kept, PITR bounded") {
    val full = CommitLog.replay(spark, Sf0001)
      .agg(sum("events"), sum("tombstones")).head
    val mu = CommitLog.mutations(spark, Sf0001)
    val stateSize = mu
      .select("key", "clustering", "column_name").distinct().count()
    // one winner per (key, clustering, column) — the memtable holds
    // exactly the reconciled state
    assert(full.getLong(0) === stateSize)
    // recovery NEVER purges: tombstone winners survive to the flush
    assert(full.getLong(1) > 0L)
    // PITR: nothing after the restore point in the flushed state, and
    // the full replay genuinely extends past it
    val pitrRows = CommitLog.pitr(spark, Sf0001)
      .agg(sum("events").as("e")).head.getLong(0)
    val boundedState = mu
      .where(col("timestamp_us") <= CommitLog.RestorePointUs)
      .select("key", "clustering", "column_name").distinct().count()
    assert(pitrRows === boundedState)
    assert(pitrRows < full.getLong(0))
  }

  test("batchlog: interrupted batches replay to completion, atomically") {
    import graft.ops.Batchlog
    val rows = Batchlog.roundtrip(spark, Sf0001).collect()
    assert(rows.length === Batchlog.Batches)
    assert(rows.forall(_.getAs[Boolean]("atomic")))
    rows.foreach { r =>
      val id = r.getAs[Long]("batch_id")
      if (Batchlog.completed(id)) {
        // completed: fully applied, no log, nothing replayed
        assert(!r.getAs[Boolean]("logged"))
        assert(r.getAs[Long]("replayed") === 0L)
        assert(r.getAs[Long]("applied_before") ===
          r.getAs[Long]("mutations"))
      } else {
        // interrupted: partial apply, full log, full replay
        assert(r.getAs[Boolean]("logged"))
        assert(r.getAs[Long]("applied_before") <
          r.getAs[Long]("mutations"))
        assert(r.getAs[Long]("replayed") === r.getAs[Long]("mutations"))
      }
    }
    // physical log files exist for EXACTLY the interrupted batches
    val crash = Batchlog.ensureCrash(spark, Sf0001)
    val logs = Option(new java.io.File(crash).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.startsWith(Batchlog.LogPrefix))
      .map(_.getName).sorted
    assert(logs.toSeq === (0L until Batchlog.Batches)
      .filterNot(Batchlog.completed).map(Batchlog.logName).sorted)
  }

  test("CDC sink log (ADVICE r18): the latest .compact file truly " +
      "SUPERSEDES earlier batches, and delete actions remove " +
      "previously-added paths") {
    val meta = java.nio.file.Files
      .createTempDirectory("graft-sinklog").toFile
    def write(name: String, lines: String*): Unit =
      java.nio.file.Files.write(
        new java.io.File(meta, name).toPath,
        ("v1" +: lines).mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    def add(p: String) = s"""{"path":"$p","size":1,"action":"add"}"""
    def del(p: String) = s"""{"path":"$p","size":1,"action":"delete"}"""
    // batch 0 adds A,B; batch 1 adds C; the compact at 1 retains only
    // A and C (B was retention-cleaned) — B must NOT be resurrected by
    // batch 0; batches 2..10 follow the compact (and "10" must sort
    // after "9" numerically), batch 10's delete drops C
    write("0", add("A"), add("B"))
    write("1", add("C"))
    write("1.compact", add("A"), add("C"))
    write("2", add("D"))
    write("9", add("E"))
    write("10", del("C"), add("F"))
    val got = graft.ops.CommitLog.committedSinkFiles(meta)
    assert(got.toSet === Set("A", "D", "E", "F"),
      s"expected compact supersession + delete application, got $got")
    // without any compact, all batches apply in order
    val meta2 = java.nio.file.Files
      .createTempDirectory("graft-sinklog2").toFile
    def write2(name: String, lines: String*): Unit =
      java.nio.file.Files.write(
        new java.io.File(meta2, name).toPath,
        ("v1" +: lines).mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    write2("0", add("A"), add("B"))
    write2("1", del("B"), add("C"))
    assert(graft.ops.CommitLog.committedSinkFiles(meta2).toSet ===
      Set("A", "C"))
    graft.sources.TempDirs.deleteTree(meta.toPath)
    graft.sources.TempDirs.deleteTree(meta2.toPath)
  }

  test("CDC resume: run 2 emits exactly the unseen segments, no replay") {
    val runs = CommitLog.cdcResume(spark, Sf0001).collect()
    assert(runs.map(_.getAs[Long]("run")).toSeq === Seq(1L, 2L))
    val r1 = runs(0); val r2 = runs(1)
    // disjoint, contiguous coverage: run 2 starts where run 1 stopped
    assert(r1.getAs[Long]("first_segment") === 0L)
    assert(r2.getAs[Long]("first_segment") ===
      r1.getAs[Long]("last_segment") + 1L)
    // exactly-once across the restart: nothing lost, nothing doubled
    val corpus = graft.sources.Fixtures.cells(spark, Sf0001).count()
    assert(r1.getAs[Long]("events") + r2.getAs[Long]("events") === corpus)
    assert(r2.getAs[Long]("events") > 0L)
  }
}
