package graft.functions

/** Presentation scalar functions (SURVEY §2.8) — pure Scala, applied
  * driver-side on collected report rows (the reference applies them
  * row-at-a-time while printing; they are not part of the relational
  * plan and never run distributed).
  */
object Formatters {

  /** X1: humanReadableByteCount (Util.java:42-52 semantics): SI 1000-based,
    * "<1000 → N B", else one decimal with k/M/G/T/P/E suffix. */
  def humanReadableByteCount(bytes: Long): String = {
    if (bytes < 1000L && bytes > -1000L) s"$bytes B"
    else {
      val exp = (math.log(math.abs(bytes.toDouble)) / math.log(1000)).toInt
      val pre = "kMGTPE".charAt(exp - 1)
      f"${bytes / math.pow(1000, exp)}%.1f ${pre}B"
    }
  }

  /** X2: humanReadableDateDiff (Util.java:66-98 semantics): "Nd Nh Nm Ns"
    * with leading zero components suppressed (a component prints once any
    * higher-order component has printed). */
  def humanReadableDateDiff(millis: Long): String = {
    val totalSeconds = millis / 1000
    val d = totalSeconds / 86400
    val h = (totalSeconds % 86400) / 3600
    val m = (totalSeconds % 3600) / 60
    val s = totalSeconds % 60
    val sb = new StringBuilder
    if (d > 0) sb.append(s"${d}d ")
    if (sb.nonEmpty || h > 0) sb.append(s"${h}h ")
    if (sb.nonEmpty || m > 0) sb.append(s"${m}m ")
    sb.append(s"${s}s")
    sb.toString
  }

  /** X3: UTC timestamp format yyyy-MM-dd HH:mm:ss.SSS (Util.java:26-27);
    * input microseconds (cell timestamps are µs — note the /1000 at
    * SSTableMetadataCollector.java:75-78). */
  def formatTimestampUs(us: Long): String = {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
    fmt.format(java.time.Instant.ofEpochMilli(us / 1000))
  }

  /** X6: repair percentage render "r/t p%" (SummaryCollector.java:65). */
  def repairRender(repaired: Long, total: Long, pct: Long): String =
    s"$repaired/$total $pct%"

  /** X7: sentinel handling — Integer.MAX_VALUE deletion time renders blank
    * (SSTableMetadataCollector.java:79-80); -1 TTL renders NO_TTL
    * (ColumnFamilyStatisticsCollector.java:188-192). */
  def formatDeletionTimeS(s: Long): String =
    if (s == Int.MaxValue.toLong) "" else formatTimestampUs(s * 1000000L)

  def formatTtl(ttlS: Long): String =
    if (ttlS == -1L) "NO_TTL" else humanReadableDateDiff(ttlS * 1000)
}
