package graft.sources.datadb

/** Single-threaded decode microbench (round 19, guide §1): times the raw
  * CassandraDataFormat event decode of a fixture directory's Data.db
  * files with NO Spark — the kernel's intrinsic throughput, separating
  * "the scan kernel is the cost" from "Spark's row fill / aggregation is
  * the cost" before any further kernel work. Run from sbt:
  *   runMain graft.sources.datadb.DecodeBench <dir-with-nb-files> [reps]
  */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    // arg is an sf dir: materialize the compressed real-format fixture
    // through the usual session-memoized writer, then time the decode
    // kernel alone (the session only builds files; timing is Spark-free)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fixture = CassandraDataFixture.ensureFiles(spark, args(0),
      compressed = true)
    // the timing loop is deliberately Spark-free: stop the session (and
    // its local[8] executor threads) before measuring (ADVICE r19 #5)
    spark.stop()
    val dir = java.nio.file.Paths.get(fixture)
    val reps = if (args.length > 1) args(1).toInt else 3
    val files = {
      val s = java.nio.file.Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.toString)
          .filter(_.endsWith(DataDbFormat.Suffix)).toArray.sorted
      } finally s.close()
    }
    require(files.nonEmpty, s"no ${DataDbFormat.Suffix} files under $dir")
    (1 to reps).foreach { rep =>
      var events = 0L
      var bytes = 0L
      var sink = 0L
      val t0 = System.nanoTime()
      files.foreach { f =>
        val base = f.stripSuffix(DataDbFormat.Suffix)
        def sidecar(suffix: String): Option[Array[Byte]] = {
          val p = java.nio.file.Paths.get(base + suffix)
          if (java.nio.file.Files.exists(p))
            Some(java.nio.file.Files.readAllBytes(p))
          else None
        }
        val stats = sidecar(CassandraDataFormat.StatsSuffix).getOrElse(
          sys.error(s"no Statistics.db for $f"))
        val header = CassandraDataFormat.parseHeader(
          graft.sources.statsdb.CassandraStatsFormat.componentBytes(
            stats, graft.sources.statsdb.CassandraStatsFormat.TypeHeader))
        val raw: java.io.InputStream =
          sidecar(graft.sources.compressioninfo.CompressionInfoFormat.Suffix)
            match {
            case Some(ci) =>
              val info =
                graft.sources.compressioninfo.CompressionInfoFormat.parse(ci)
              val len = java.nio.file.Files.size(java.nio.file.Paths.get(f))
              val raf = new java.io.RandomAccessFile(f, "r")
              val source =
                new graft.sources.compressioninfo.ChunkedData.RandomAccess {
                  override def readFully(position: Long, buf: Array[Byte],
                      off: Int, n: Int): Unit =
                    { raf.seek(position); raf.readFully(buf, off, n) }
                  override def close(): Unit = raf.close()
                }
              new graft.sources.compressioninfo.ChunkedData
                .ChunkedInputStream(source, info, len, 0L)
            case None => java.nio.file.Files.newInputStream(
              java.nio.file.Paths.get(f))
          }
        val counting = new graft.sources.CountingBufferedInput(raw, 1 << 18)
        CassandraDataFormat.events(counting, header).foreach { e =>
          events += 1
          sink += e.timestampUs + e.clustering + e.sizeBytes +
            e.columnNameBytes.length
        }
        bytes += counting.consumed
        raw.close()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"rep $rep: $events events, $bytes uncompressed bytes, " +
        f"$sec%.3f s (${events / sec / 1e6}%.2f M events/s) sink=$sink")
    }
  }
}
