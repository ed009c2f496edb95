package graft

import org.apache.spark.sql.functions._

import graft.ops.Hints
import graft.sources.commitlog.CommitLogFormat

class HintsSpec extends SparkSpec {

  test("hinted handoff: one hint file per coordinator, ids encoded") {
    val outage = Hints.ensureOutage(spark, Sf0001)
    val hintFiles = Option(new java.io.File(outage).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.startsWith(CommitLogFormat.HintsPrefix))
      .sortBy(_.getName)
    assert(hintFiles.map(_.getName).toSeq === Hints.Coordinators
      .map { case (_, c) => CommitLogFormat.hintsName(Hints.Target, c) }
      .sorted)
    hintFiles.foreach { f =>
      val seg = CommitLogFormat.parseSegment(
        java.nio.file.Files.readAllBytes(f.toPath))
      assert(CommitLogFormat.hintsTargetOf(seg.id) === Hints.Target)
      assert(seg.mutations.nonEmpty)
      // every hinted mutation is inside the outage window
      assert(seg.mutations.forall(m =>
        m.timestampUs >= Hints.OutageStartUs &&
          m.timestampUs < Hints.OutageEndUs))
    }
  }

  test("hinted handoff: the node converges — every view verified") {
    val rows = Hints.roundtrip(spark, Sf0001).collect()
    // 2 quarters x 2 origins
    assert(rows.length === 4)
    assert(rows.forall(_.getAs[Boolean]("verified")))
    assert(rows.forall(_.getAs[Boolean]("converged")))
    // the retained half has the outage GAP: strictly fewer events than
    // the quarter corpus, and the hinted half fills exactly the rest
    rows.groupBy(_.getAs[Long]("quarter")).foreach { case (_, qs) =>
      val byOrigin = qs.map(r => r.getAs[String]("origin") ->
        r.getAs[Long]("events")).toMap
      val total = qs.head.getAs[Long]("quarter_events")
      assert(byOrigin("retained") < total)
      assert(byOrigin("retained") + byOrigin("hinted") === total)
    }
    // hint provenance: each quarter's hints came from ITS surviving
    // replica, never the target itself
    rows.filter(_.getAs[String]("origin") == "hinted").foreach { r =>
      val c = Hints.Coordinators.toMap.apply(r.getAs[Long]("quarter"))
      assert(r.getAs[Long]("coordinator") === c)
      assert(r.getAs[Long]("coordinator") !== Hints.Target)
    }
  }
}
