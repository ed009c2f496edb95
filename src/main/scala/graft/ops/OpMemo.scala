package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for executed-op fixture builds (round 16):
  * one string key → one built directory per live session, stopped
  * sessions swept on every lookup, the build itself running on the
  * caller's [[Slot]] so distinct keys build concurrently while
  * same-key callers share one build — the Compaction.ensureCompacted
  * discipline, extracted once so the eleven round-16 ops cannot
  * drift. */
private[ops] object OpMemo {

  private val memo =
    new java.util.HashMap[String, (SparkSession, Slot[String])]()

  def memoized(spark: SparkSession, key: String)(
      thunk: => String): String = {
    val full = s"${graft.sources.PlanCache.sessionKey(spark)}|$key"
    val slot = memo.synchronized {
      val it = memo.entrySet().iterator()
      while (it.hasNext)
        if (it.next().getValue._1.sparkContext.isStopped) it.remove()
      val hit = memo.get(full)
      if (hit != null) hit._2
      else {
        val s = new Slot(() => thunk)
        memo.put(full, (spark, s))
        s
      }
    }
    slot.value
  }

  private val valueMemo =
    new java.util.HashMap[String, (SparkSession, Slot[Any])]()

  /** Session-scoped memo for DRIVER-SIDE PLAN metadata (round 19): the
    * compaction strategies' selection tables are pure functions of an
    * immutable input set, already computed once inside the memoized
    * build — re-deriving them per roundtrip call re-ran the selection's
    * narrow aggregate job on every bench window (MinorCompaction's
    * tierTable established this memo discipline in round 14; this is
    * the same rule for non-String plan values). */
  def memoizedValue[T](spark: SparkSession, key: String)(
      thunk: => T): T = {
    val full = s"${graft.sources.PlanCache.sessionKey(spark)}|$key"
    val slot = valueMemo.synchronized {
      val it = valueMemo.entrySet().iterator()
      while (it.hasNext)
        if (it.next().getValue._1.sparkContext.isStopped) it.remove()
      val hit = valueMemo.get(full)
      if (hit != null) hit._2
      else {
        val s = new Slot[Any](() => thunk)
        valueMemo.put(full, (spark, s))
        s
      }
    }
    slot.value.asInstanceOf[T]
  }
}
