package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataOutputStream, FileOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.indexdb.{IndexDb, IndexDbFormat, IndexDbScan, IndexDbScanBuilder}
import org.apache.spark.sql.sources.EqualTo

/** The raw Index.db DataSource V2: binary format codec, file reading via the
  * registered short name, column pruning, sstable_id filter → file pruning,
  * and offset-delta size derivation. */
class IndexDbSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-indexdb").toFile
    d.deleteOnExit()
    // aa: 3 entries, promoted-index junk the reader must skip
    val aa = new DataOutputStream(
      new FileOutputStream(new java.io.File(d, "aa-1-big-Index.db")))
    IndexDbFormat.writeEntry(aa, "k1".getBytes, 0L)
    IndexDbFormat.writeEntry(aa, "k2".getBytes, 100L, Array.fill(5)(0x7f.toByte))
    IndexDbFormat.writeEntry(aa, "k3".getBytes, 250L, Array.fill(17)(0xee.toByte))
    aa.close()
    // bb: multi-byte vint positions (past 1-, 2- and 5-byte boundaries)
    val bb = new DataOutputStream(
      new FileOutputStream(new java.io.File(d, "bb-2-big-Index.db")))
    IndexDbFormat.writeEntry(bb, "x".getBytes, 127L)
    IndexDbFormat.writeEntry(bb, "y".getBytes, 16384L)
    IndexDbFormat.writeEntry(bb, "z".getBytes, (1L << 40) + 3L)
    bb.close()
    // a non-index file that must be ignored by directory listing
    Files.write(new java.io.File(d, "aa-1-big-Data.db").toPath,
      Array[Byte](1, 2, 3))
    d.getAbsolutePath
  }

  test("unsigned vint round-trips across size boundaries") {
    val probes = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, (1L << 21) - 1,
      1L << 21, (1L << 49) - 5, Long.MaxValue)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    probes.foreach(IndexDbFormat.writeUnsignedVInt(out, _))
    val in = new java.io.DataInputStream(
      new ByteArrayInputStream(bos.toByteArray))
    probes.foreach { v =>
      assert(IndexDbFormat.readUnsignedVInt(in) === v, s"roundtrip of $v")
    }
  }

  test("reads all entries via the registered short name, skipping promoted " +
    "index and non-index files") {
    val rows = IndexDb.read(spark, dir)
      .select(col("sstable_id"), col("key").cast("string"), col("position"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows === Set(
      ("aa-1-big", "k1", 0L), ("aa-1-big", "k2", 100L),
      ("aa-1-big", "k3", 250L),
      ("bb-2-big", "x", 127L), ("bb-2-big", "y", 16384L),
      ("bb-2-big", "z", (1L << 40) + 3L)))
  }

  test("column pruning reaches the reader (position-only projection)") {
    val positions = IndexDb.read(spark, dir)
      .where(col("sstable_id") === "aa-1-big")
      .select("position").collect().map(_.getLong(0)).sorted
    assert(positions === Array(0L, 100L, 250L))
  }

  test("sstable_id filters prune whole files at planning time") {
    val builder = new IndexDbScanBuilder(Map("path" -> dir))
    builder.pushFilters(Array(EqualTo("sstable_id", "bb-2-big")))
    val scan = builder.build().asInstanceOf[IndexDbScan]
    assert(scan.planInputPartitions().length === 1)
    val unfiltered = new IndexDbScanBuilder(Map("path" -> dir))
      .build().asInstanceOf[IndexDbScan]
    assert(unfiltered.planInputPartitions().length === 2)
  }

  test("offset-delta size derivation matches IndexReader semantics") {
    import scala.jdk.CollectionConverters._
    val lengths = spark.createDataFrame(
      Seq(("aa-1-big", 400L), ("bb-2-big", (1L << 40) + 53L)))
      .toDF("sstable_id", "data_length")
    val sized = IndexDb.withSizes(IndexDb.read(spark, dir), lengths)
      .select(col("key").cast("string"), col("size"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sized === Map(
      "k1" -> 100L, "k2" -> 150L, "k3" -> 150L, // last = 400 - 250
      "x" -> 16257L, "y" -> ((1L << 40) + 3L - 16384L), "z" -> 50L))
    val section = IndexDb.sstableSection(IndexDb.read(spark, dir), lengths)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    // uncompressed_length = data_length - first position (bb starts at 127)
    assert(section === Array(("aa-1-big", 3L, 400L),
      ("bb-2-big", 3L, (1L << 40) + 53L - 127L)))
  }

  test("sstable-index streams newly arrived index files exactly once") {
    val src = java.nio.file.Paths.get(
      graft.sources.indexdb.IndexDbFixture.ensureFiles(spark, Sf0001))
    val in = graft.sources.TempDirs.register(
      Files.createTempDirectory("graft-idxstream-in"))
    val ckpt = graft.sources.TempDirs.register(
      Files.createTempDirectory("graft-idxstream-ckpt"))
    val outDir = graft.sources.TempDirs.register(
      Files.createTempDirectory("graft-idxstream-out"))
    def arrive(id: String): Unit =
      Files.copy(src.resolve(id + IndexDbFormat.Suffix),
        in.resolve(id + IndexDbFormat.Suffix))
    def drain(): Long = {
      val q = spark.readStream.format("sstable-index").load(in.toString)
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      spark.read.parquet(outDir.toString).count()
    }
    val bySst = IndexDb.read(spark, src.toString)
      .groupBy("sstable_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    arrive("sst-0"); arrive("sst-1")
    assert(drain() === bySst("sst-0") + bySst("sst-1"))
    arrive("sst-2")
    assert(drain() === bySst("sst-0") + bySst("sst-1") + bySst("sst-2"))
  }
}
