package graft.sources

import org.apache.spark.sql.connector.read.streaming.Offset

/** Streaming offset for immutable-file-arrival sources (the raw SSTable
  * readers): the set of already-processed file names, JSON-serialized
  * sorted. SSTable file names are generation-derived identifiers
  * ([A-Za-z0-9._-]), so plain quoting needs no escaping; anything else is
  * rejected at offset construction rather than corrupting a checkpoint.
  *
  * At fixture scale the list is tiny; a production deployment would compact
  * it to the max generation id per table (Cassandra's sstable names carry a
  * monotonically increasing generation), keeping offsets O(1). */
final case class FileSetOffset(files: Seq[String]) extends Offset {
  files.find(f => f.contains("\"") || f.contains("\\")).foreach(f =>
    throw new IllegalArgumentException(s"unsupported sstable file name: $f"))
  override def json(): String =
    files.sorted.map(f => "\"" + f + "\"").mkString("[", ",", "]")
}

object FileSetOffset {
  def fromJson(json: String): FileSetOffset = {
    val t = json.trim
    if (!t.startsWith("[") || !t.endsWith("]"))
      throw new IllegalArgumentException(s"corrupt file-set offset: $json")
    val body = t.substring(1, t.length - 1).trim
    if (body.isEmpty) FileSetOffset(Nil)
    else FileSetOffset(body.split(",").toSeq.map { s =>
      val q = s.trim
      if (q.length < 2 || !q.startsWith("\"") || !q.endsWith("\""))
        throw new IllegalArgumentException(
          s"corrupt file-set offset entry: $s")
      q.substring(1, q.length - 1)
    })
  }
}
