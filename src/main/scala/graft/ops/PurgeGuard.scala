package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The CONSERVATIVE PURGE GUARD shared by the executed minor (STCS) and
  * leveled (LCS) compactions, driven by SIDECAR METADATA the way real
  * Cassandra drives it (round 14, replacing the materialized
  * all-passthrough-keys join the round-13 implementations shuffled):
  *
  * A droppable tombstone (winner with `ldt < gcBefore`) may purge ONLY
  * if no sstable OUTSIDE its own compaction could hold its partition
  * key — otherwise it must survive to keep shadowing data the
  * compaction cannot see (Cassandra `CompactionController.
  * getPurgeEvaluator`: consult the min/max key ranges and Filter.db
  * blooms of the non-participating sstables; a bloom false-positive
  * just keeps a tombstone longer, never resurrects data).
  *
  * Two stages, so the exchange the old form paid disappears:
  *
  *  1. **Metadata prefilter — O(#files) sidecar reads, zero scan.**
  *     Each sstable's [firstKey, lastKey] comes from its own Summary.db
  *     tail and its bloom from Filter.db. A droppable winner becomes a
  *     CANDIDATE only if some outside sstable's range contains its key
  *     AND that bloom says may-contain. Range-disjoint layouts (LCS)
  *     prove the guard empty here and skip everything below.
  *  2. **Exact confirm — broadcast join, no big-side exchange.** The
  *     tiny candidate set broadcasts against the input scan (the big
  *     side streams through a BroadcastHashJoin); survivors of the
  *     equality check are the keys genuinely present outside. This
  *     keeps the relation EXACT — the DuckDB oracle replays the exact
  *     per-compaction rule, which a bloom false positive would break —
  *     while the metadata stage bounds the work: only candidate keys
  *     are confirmed, and with zero candidates no Spark job runs at
  *     all.
  *
  * At 100 TB the same shape holds: stage 1 is per-file metadata the
  * driver already holds (Cassandra keeps exactly these structures
  * resident), stage 2 broadcasts only droppable-tombstone keys that
  * survived stage 1 — typically a vanishing fraction of the corpus —
  * and never shuffles the passthrough data. A deployment content with
  * Cassandra's own semantics can stop after stage 1 (keep on
  * may-contain); stage 2 buys back exactness for the oracle. */
object PurgeGuard {

  /** One sstable's guard metadata: its compaction group (selected tier
    * number, or [[Passthrough]]), Summary.db key range, Filter.db
    * bloom. */
  final case class SstGuard(sstableId: String, group: Int,
      firstKey: Long, lastKey: Long,
      filter: graft.sources.filterdb.FilterDbFormat.Filter)

  /** Group id of never-participating sstables (distinct from every
    * selected tier, which are >= 1). */
  val Passthrough: Int = -1

  /** Load guard metadata for every sstable under `inPath` from its OWN
    * sidecars — O(#files) driver work, no data scan. `groupOf` maps the
    * normalized id (sst-<n>) to its compaction group. */
  def load(inPath: String, groupOf: String => Int): Seq[SstGuard] = {
    val d = new java.io.File(inPath)
    val bases = Option(d.listFiles((_, n) => n.endsWith("-Data.db")))
      .getOrElse(Array.empty[java.io.File])
      .map(_.getName.stripSuffix("-Data.db")).sorted.toSeq
    require(bases.nonEmpty, s"no sstables under $inPath")
    bases.map { base =>
      val gen = base.split("-")(1).toLong
      val id = s"sst-${gen - 1}"
      val summary = graft.sources.summarydb.SummaryDbFormat.parse(
        new java.io.DataInputStream(new java.io.BufferedInputStream(
          new java.io.FileInputStream(
            new java.io.File(d, base + "-Summary.db")))))
      val filterIn = new java.io.DataInputStream(
        new java.io.BufferedInputStream(new java.io.FileInputStream(
          new java.io.File(d,
            base + graft.sources.filterdb.FilterDbFormat.Suffix))))
      val filter =
        try graft.sources.filterdb.FilterDbFormat.parse(filterIn)
        finally filterIn.close()
      def be(b: Array[Byte]): Long = java.nio.ByteBuffer.wrap(b).getLong
      SstGuard(id, groupOf(id), be(summary.firstKey), be(summary.lastKey),
        filter)
    }
  }

  /** Stage-1 test: may some sstable outside `group` contain `key`?
    * Range check first (free), then the bloom (no false negatives, so a
    * false here is PROOF of absence). */
  def mayContainOutside(metas: Array[SstGuard], group: Int,
      key: Long): Boolean = {
    var i = 0
    while (i < metas.length) {
      val m = metas(i)
      if (m.group != group && m.firstKey <= key && key <= m.lastKey &&
          m.filter.mightContain(
            java.nio.ByteBuffer.allocate(8).putLong(key).array()))
        return true
      i += 1
    }
    false
  }

  /** Object-typed bridge for generated code (Janino resolves this flat
    * signature where a nested-class array type in a cast would not) —
    * same function, called per row from inside whole-stage codegen by
    * [[graft.functions.GuardMayContain]]. */
  def mayContainOutsideRef(guardsRef: Object, group: Int,
      key: Long): Boolean =
    mayContainOutside(guardsRef.asInstanceOf[Array[SstGuard]], group, key)

  /** True when metadata alone proves the guard empty for EVERY possible
    * winner: each participating sstable's key range is disjoint from
    * every sstable in a DIFFERENT group — passthrough sstables AND the
    * sstables of every other selected group, since in the multi-group
    * (STCS) semantics a sibling tier's sstable is just as "outside" a
    * winner's compaction as a never-selected one. No winner key (which
    * lies inside some participant's range) can then exist outside its
    * own compaction. The LCS invariant — levels partition the key
    * space — makes this the common case there. */
  def provablyEmpty(metas: Seq[SstGuard]): Boolean = {
    val participating = metas.filter(_.group != Passthrough)
    participating.forall(p => metas.forall(o =>
      o.group == p.group ||
        o.lastKey < p.firstKey || o.firstKey > p.lastKey))
  }

  /** The full guard relation for `winners` of a multi-group compaction:
    * (grp, gkey, in_guard=true) for exactly the droppable winners whose
    * key IS present in some sstable outside their group — stage-1
    * prefiltered, stage-2 exactly confirmed. `ev` must carry the
    * normalized `sstable_id`; `winners` must carry `key` and the
    * droppable predicate's inputs under `w`. Both joins broadcast the
    * SMALL side; `ev` never shuffles. The output columns are RENAMED
    * (`grp`/`gkey`) so joining the relation back to `winners` — whose
    * lineage it shares — is not an ambiguous self-join. */
  def blockedKeys(spark: SparkSession, metas: Seq[SstGuard],
      ev: DataFrame, winners: DataFrame, groupCol: Column,
      gcBeforeS: Long): DataFrame = {
    val bMetas = spark.sparkContext.broadcast(metas.toArray)
    // stage-1 prefilter as a codegen'd Expression (round 15): the guard
    // array is one broadcast reference object in the generated class and
    // the per-row range+bloom test stays inside whole-stage codegen —
    // the UDF form crossed the catalyst boundary per droppable winner
    val candidates = winners
      .where(col("w.is_tombstone") &&
        col("w.local_deletion_time_s") < lit(gcBeforeS))
      .select(groupCol.cast("int").as("grp"), col("key"))
      .where(graft.functions.GuardMayContain.column(
        col("grp"), col("key"), bMetas))
      .distinct()
    import spark.implicits._
    val groupDf = metas.map(m => (m.sstableId, m.group))
      .toDF("sstable_id", "ev_grp")
    val evGrouped = ev.select(col("sstable_id"), col("key").as("ev_key"))
      .join(broadcast(groupDf), Seq("sstable_id"), "inner")
    evGrouped.join(broadcast(candidates),
        evGrouped("ev_key") === candidates("key") &&
          evGrouped("ev_grp") =!= candidates("grp"), "inner")
      .select(col("grp"), col("key").as("gkey"))
      .distinct()
      .withColumn("in_guard", lit(true))
  }
}
