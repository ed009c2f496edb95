package graft

import graft.ops.SummaryRedistribution
import graft.sources.datadb.{CassandraDataFixture, CassandraDataFormat}
import graft.sources.summarydb.SummaryDbFormat

/** Round 19: index-summary redistribution — only the Summary.db
  * component rewrites, resident entries halve per level, and the
  * point-read path's answers are level-invariant. */
class SummaryRedistributionSpec extends SparkSpec {

  private def entry(i: Int) = SummaryDbFormat.Entry(
    java.nio.ByteBuffer.allocate(8).putLong(i * 10L).array(), i * 100L)

  test("downsample rule: every 2^k-th entry kept (entry 0 always), " +
      "samplingLevel halves per level, header first/last unchanged") {
    val s = SummaryDbFormat.Summary(4, SummaryDbFormat.BaseSamplingLevel,
      9, (0 until 9).map(entry), entry(0).key, entry(8).key)
    val d1 = SummaryRedistribution.downsample(s, 1)
    assert(d1.entries.map(e => PointGetKey(e.key)) ===
      Seq(0L, 20L, 40L, 60L, 80L))
    assert(d1.samplingLevel === SummaryDbFormat.BaseSamplingLevel / 2)
    val d2 = SummaryRedistribution.downsample(s, 2)
    assert(d2.entries.map(e => PointGetKey(e.key)) === Seq(0L, 40L, 80L))
    assert(d2.samplingLevel === SummaryDbFormat.BaseSamplingLevel / 4)
    // identity level
    val d0 = SummaryRedistribution.downsample(s, 0)
    assert(d0.entries.length === 9 &&
      d0.samplingLevel === s.samplingLevel)
    // min/max keys live in the header tail, untouched at every level
    assert(java.util.Arrays.equals(d2.firstKey, s.firstKey))
    assert(java.util.Arrays.equals(d2.lastKey, s.lastKey))
  }

  private def PointGetKey(b: Array[Byte]): Long =
    java.nio.ByteBuffer.wrap(b).getLong

  test("executed redistribution: only Summary.db rewrites — every other " +
      "component is the SAME file (hard link), entry totals follow " +
      "ceil(entries/2^k)") {
    val src = new java.io.File(
      CassandraDataFixture.ensureFiles(spark, Sf0001, compressed = true))
    def summaries(d: java.io.File): Map[String, SummaryDbFormat.Summary] =
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(SummaryDbFormat.Suffix))
        .map { f =>
          f.getName -> SummaryDbFormat.parse(new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(
              java.nio.file.Files.readAllBytes(f.toPath))))
        }.toMap
    val base = summaries(src)
    assert(base.nonEmpty)
    for (level <- SummaryRedistribution.Levels.drop(1)) {
      val out = new java.io.File(
        SummaryRedistribution.ensureDownsampled(spark, Sf0001, level))
      val files = Option(out.listFiles()).getOrElse(Array.empty)
      assert(files.nonEmpty)
      files.foreach { f =>
        val srcFile = new java.io.File(src, f.getName)
        if (f.getName.endsWith(SummaryDbFormat.Suffix))
          // rewritten, never a link of the original
          assert(!java.nio.file.Files.isSameFile(f.toPath, srcFile.toPath),
            s"${f.getName} must be rewritten at level $level")
        else
          assert(java.nio.file.Files.isSameFile(f.toPath, srcFile.toPath),
            s"${f.getName} must hard-link the source at level $level")
      }
      // a complete sstable set came through (Data.db et al. present)
      assert(files.exists(_.getName.endsWith(CassandraDataFormat.Suffix)))
      val ds = summaries(out)
      assert(ds.keySet === base.keySet)
      val step = 1 << level
      ds.foreach { case (name, s) =>
        val b = base(name)
        assert(s.entries.length === (b.entries.length + step - 1) / step,
          s"$name level $level entry count")
        // the kept entries are exactly the 2^k-grid of the originals
        assert(s.entries.map(e => PointGetKey(e.key)) ===
          b.entries.zipWithIndex.collect {
            case (e, j) if j % step == 0 => PointGetKey(e.key)
          })
      }
    }
  }

  test("q246 report: probe checksums are LEVEL-INVARIANT — a coarser " +
      "summary widens the index scan window, never changes the answer") {
    val rows = SummaryRedistribution.report(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("level")).toSeq === Seq(0L, 1L, 2L))
    val probeCols =
      Seq("probed", "found_sstables", "events", "value_sum", "ts_sum")
    val anchor = probeCols.map(c => rows(0).getAs[Long](c))
    assert(anchor.head > 0L, "present probes must exist")
    rows.foreach { r =>
      assert(probeCols.map(c => r.getAs[Long](c)) === anchor,
        s"level ${r.getAs[Long]("level")} diverged")
    }
    // entries strictly shrink per level (the memory the redistribution
    // exists to reclaim), never below ceil(before/2^k)
    val after = rows.map(_.getAs[Long]("entries_after"))
    assert(after(0) === rows(0).getAs[Long]("entries_before"))
    assert(after(1) < after(0) && after(2) < after(1))
  }

  test("the degradation is MEASURED, not asserted: level-2 probes read " +
      "more Index.db entries than level-0, with identical answers") {
    import graft.ops.PointGet
    def measured(level: Int): (Long, (Long, Long, Long, Long, Long)) = {
      val path = SummaryRedistribution.ensureDownsampled(spark, Sf0001, level)
      PointGet.indexEntriesRead.reset()
      val agg = SummaryRedistribution.probeAggregate(spark, Sf0001, path)
      (PointGet.indexEntriesRead.sum, agg)
    }
    val (n0, a0) = measured(0)
    val (n1, a1) = measured(1)
    val (n2, a2) = measured(2)
    assert(n0 > 0L)
    // the answers never move…
    assert(a1 === a0 && a2 === a0)
    // …but the scan window grows monotonically with the level, and a
    // quarter-density summary costs strictly more than double the
    // baseline's entry reads (asymptotically ~4×; the per-scan +2
    // overhead of the found-entry/next-entry pair dampens it at
    // fixture interval)
    assert(n1 > n0, s"level 1 read $n1 entries vs level 0's $n0")
    assert(n2 > n1 && n2 > 2L * n0,
      s"level 2 read $n2 entries vs level 0's $n0 — expected > ${2L * n0}")
  }
}
