package graft.ops

/** REAL WARC/1.0 codec (ISO 28500 — the Common Crawl container, i.e. the
  * actual first-mile format of web-scale LLM corpus ingestion): records
  * framed as `WARC/1.0\r\n` + named headers + `\r\n\r\n` + a
  * Content-Length-delimited body + `\r\n\r\n`, stored as CONCATENATED
  * PER-RECORD GZIP MEMBERS exactly like Common Crawl's .warc.gz files
  * (readers must keep inflating across member boundaries — the quirk
  * that breaks naive gzip handling). The decoder streams members,
  * parses each record's headers, enforces Content-Length framing, and
  * folds the response payloads.
  *
  * The writer emits the canonical warcinfo / request / response triple
  * per capture; response bodies carry an HTTP envelope whose entity is
  * the deterministic per-id text. */
object Warc {

  final case class Probe(records: Int, responses: Int, responseBytes: Long,
      bodySum: Long, gzipMembers: Int)

  def capturesOf(id: Long): Int = 1 + (id % 3).toInt
  def bodyLenOf(id: Long, c: Int): Int = 40 + ((id + c * 131) % 400).toInt
  def bodyByteOf(id: Long, c: Int, i: Int): Int =
    (32 + (id * 7 + c * 13 + i * 3) % 95).toInt // printable ASCII

  private val Crlf = "\r\n"

  private def record(typ: String, extra: Seq[(String, String)],
      body: Array[Byte]): Array[Byte] = {
    val headers = Seq(
      "WARC-Type" -> typ,
      "WARC-Record-ID" -> s"<urn:uuid:graft-$typ>",
      "WARC-Date" -> "2026-01-01T00:00:00Z") ++ extra ++ Seq(
      "Content-Length" -> body.length.toString)
    val head = ("WARC/1.0" +: headers.map { case (k, v) => s"$k: $v" })
      .mkString("", Crlf, Crlf + Crlf)
    head.getBytes("US-ASCII") ++ body ++ (Crlf + Crlf).getBytes("US-ASCII")
  }

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  def encode(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(gzipMember(record("warcinfo",
      Seq("Content-Type" -> "application/warc-fields"),
      s"software: graft/9$Crlf".getBytes("US-ASCII"))))
    (0 until capturesOf(id)).foreach { c =>
      val url = s"https://example.org/doc/$id/$c"
      out.write(gzipMember(record("request",
        Seq("WARC-Target-URI" -> url, "Content-Type" ->
          "application/http;msgtype=request"),
        s"GET /doc/$id/$c HTTP/1.1${Crlf}Host: example.org$Crlf$Crlf"
          .getBytes("US-ASCII"))))
      val entity = Array.tabulate(bodyLenOf(id, c))(i =>
        bodyByteOf(id, c, i).toByte)
      val http = (s"HTTP/1.1 200 OK${Crlf}Content-Type: text/plain" +
        s"${Crlf}Content-Length: ${entity.length}$Crlf$Crlf")
        .getBytes("US-ASCII") ++ entity
      out.write(gzipMember(record("response",
        Seq("WARC-Target-URI" -> url, "Content-Type" ->
          "application/http;msgtype=response"),
        http)))
    }
    out.toByteArray
  }

  private def headers(block: String): Map[String, String] =
    block.split(Crlf).drop(1).filter(_.nonEmpty).map { l =>
      val i = l.indexOf(':')
      if (i < 0) throw new java.io.IOException(s"malformed header '$l'")
      l.substring(0, i).trim -> l.substring(i + 1).trim
    }.toMap

  def decode(b: Array[Byte]): Probe = {
    // member-by-member gzip walk (hand-rolled: java's GZIPInputStream
    // silently concatenates members, which is exactly what a WARC reader
    // must NOT be blind to) — magic/CM per header, raw-deflate inflate,
    // and the CRC32 + ISIZE trailer VERIFIED per member
    var moff = 0
    var members = 0
    val plainOut = new java.io.ByteArrayOutputStream()
    def le32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    while (moff < b.length) {
      if (b.length - moff < 18 || b(moff) != 0x1f.toByte ||
          b(moff + 1) != 0x8b.toByte || b(moff + 2) != 8)
        throw new java.io.IOException("bad gzip member header")
      if (b(moff + 3) != 0)
        throw new java.io.IOException("unexpected gzip FLG bits")
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(b, moff + 10, b.length - moff - 10)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1 << 14)
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch {
              case e: java.util.zip.DataFormatException =>
                throw new java.io.IOException("corrupt deflate data", e)
            }
          if (n == 0 && inf.needsInput())
            throw new java.io.IOException("truncated gzip member")
          out.write(buf, 0, n)
        }
        val data = out.toByteArray
        val crc = new java.util.zip.CRC32(); crc.update(data)
        val trailer = moff + 10 +
          (b.length - moff - 10 - inf.getRemaining)
        if (trailer + 8 > b.length)
          throw new java.io.IOException("truncated gzip trailer")
        if (le32(trailer) != crc.getValue)
          throw new java.io.IOException("gzip member CRC32 mismatch")
        if (le32(trailer + 4) != (data.length & 0xffffffffL))
          throw new java.io.IOException("gzip ISIZE mismatch")
        plainOut.write(data)
        members += 1
        moff = trailer + 8
      } finally inf.end()
    }
    val plain = plainOut.toByteArray
    // parse records over the inflated stream
    var off = 0
    var records = 0; var responses = 0
    var responseBytes = 0L; var bodySum = 0L
    while (off < plain.length) {
      val sep = {
        var i = off
        var found = -1
        while (found < 0 && i + 3 < plain.length) {
          if (plain(i) == '\r' && plain(i + 1) == '\n' &&
            plain(i + 2) == '\r' && plain(i + 3) == '\n') found = i
          i += 1
        }
        if (found < 0)
          throw new java.io.IOException("unterminated record header")
        found
      }
      val head = new String(plain, off, sep - off, "US-ASCII")
      if (!head.startsWith("WARC/1.0"))
        throw new java.io.IOException("record is not WARC/1.0")
      val hs = headers(head)
      val len = hs.getOrElse("Content-Length",
        throw new java.io.IOException("missing Content-Length")).toInt
      val bodyFrom = sep + 4
      val bodyTo = bodyFrom + len
      if (bodyTo + 4 > plain.length)
        throw new java.io.IOException("record body overruns file")
      if (!(plain(bodyTo) == '\r' && plain(bodyTo + 1) == '\n' &&
        plain(bodyTo + 2) == '\r' && plain(bodyTo + 3) == '\n'))
        throw new java.io.IOException("missing record separator")
      records += 1
      if (hs.get("WARC-Type").contains("response")) {
        responses += 1
        responseBytes += len
        // the HTTP entity after ITS OWN header/body split
        var i = bodyFrom
        var entity = -1
        while (entity < 0 && i + 3 < bodyTo) {
          if (plain(i) == '\r' && plain(i + 1) == '\n' &&
            plain(i + 2) == '\r' && plain(i + 3) == '\n') entity = i + 4
          i += 1
        }
        if (entity < 0)
          throw new java.io.IOException("response lacks an HTTP envelope")
        (entity until bodyTo).foreach(j => bodySum += plain(j) & 0xff)
      }
      off = bodyTo + 4
    }
    // Common Crawl's contract: one gzip member per record
    if (members != records)
      throw new java.io.IOException(
        s"$members gzip members but $records records")
    Probe(records, responses, responseBytes, bodySum, members)
  }

  /** q125: every document gets a deterministic .warc.gz capture set and
    * the full reader walks it back — per-member gzip CRC/ISIZE
    * verification, WARC record framing, HTTP envelope split, entity
    * byte fold. Narrow end to end (the file-granular shape Common Crawl
    * ingestion parallelizes by). */
  def warcIngest(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.sources.Tables.documents(spark, dir).select(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val p = decode(encode(id))
          (id, p.records.toLong, p.responses.toLong, p.responseBytes,
            p.bodySum, p.gzipMembers.toLong)
        }
      }
      .toDF("doc_id", "records", "responses", "response_bytes", "body_sum",
        "gzip_members")
      .localCheckpoint()
      .orderBy("doc_id")
  }
}
