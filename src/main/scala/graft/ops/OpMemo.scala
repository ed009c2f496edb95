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
}
