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

  /** X2: humanReadableDateDiff — exact mirror of Util.java:66-98: days and
    * hours print only when >= 1 (so zero hours after days is omitted:
    * "1d 3m 4s"), minutes and seconds print unconditionally ("0m 5s"), and
    * the residual seconds are CEILed ("0m 2s" for 1500 ms). The space
    * before hours/minutes appears only once the builder already holds more
    * than one char — the reference's `sb.length() > 1` guard verbatim. */
  def humanReadableDateDiff(millis: Long): String = {
    var diff = millis
    val sb = new StringBuilder
    val days = diff / 86400000L
    diff -= days * 86400000L
    if (days >= 1) { sb.append(days); sb.append('d') }
    val hours = diff / 3600000L
    diff -= hours * 3600000L
    if (hours >= 1) {
      if (sb.length > 1) sb.append(' ')
      sb.append(hours); sb.append('h')
    }
    if (sb.length > 1) sb.append(' ')
    val minutes = diff / 60000L
    diff -= minutes * 60000L
    sb.append(minutes); sb.append("m ")
    sb.append(math.ceil(diff / 1000.0).round)
    sb.append('s')
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
