package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.functions._

import graft.sources.compressioninfo.{CassandraCompressionFixture, CompressionInfo, CompressionInfoFormat}

/** The real CompressionInfo.db component: codec roundtrip, the DSv2
  * per-chunk relation, and the lead()-delta compressed-size derivation. */
class CompressionInfoSpec extends SparkSpec {

  test("codec round-trips compressor, options, lengths and offsets") {
    val info = CompressionInfoFormat.Info(
      compressor = "LZ4Compressor",
      options = Seq("lz4_compressor_level" -> "3", "k" -> "v"),
      chunkLength = 65536,
      maxCompressedLength = Int.MaxValue,
      dataLength = (1L << 33) + 5L,
      offsets = Array(0L, 40000L, 81000L, (1L << 32) + 7L))
    val bos = new ByteArrayOutputStream()
    CompressionInfoFormat.write(new DataOutputStream(bos), info)
    val got = CompressionInfoFormat.parse(bos.toByteArray)
    assert(got.compressor === info.compressor)
    assert(got.options === info.options)
    assert(got.chunkLength === info.chunkLength)
    assert(got.maxCompressedLength === info.maxCompressedLength)
    assert(got.dataLength === info.dataLength)
    assert(got.offsets.toSeq === info.offsets.toSeq)
  }

  test("parse rejects implausible counts and chunk lengths") {
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    d.writeUTF("LZ4Compressor"); d.writeInt(0)
    d.writeInt(-5) // bad chunk length
    intercept[java.io.IOException](
      CompressionInfoFormat.parse(bos.toByteArray))
  }

  test("DSv2 emits one row per chunk; offsets are the documented prefix " +
      "sums; lead() deltas recover per-chunk sizes") {
    val dir = Sf0001
    val path = CassandraCompressionFixture.ensureFiles(spark, dir)
    val chunks = CompressionInfo.read(spark, path)
    val meta = graft.sources.Fixtures.sstableMeta(
        graft.sources.Fixtures.allPscan(spark, dir))
      .orderBy("sstable_id").collect()
    // chunk counts per generation match ⌈uncompressed / 65536⌉
    val byGen = chunks.groupBy("generation")
      .agg(count(lit(1)).as("cc"), min("data_length").as("dl"))
      .orderBy("generation").collect()
    assert(byGen.length === meta.length)
    byGen.zip(meta).foreach { case (g, m) =>
      val unc = m.getLong(m.fieldIndex("uncompressed_length"))
      assert(g.getAs[Long]("dl") === unc)
      assert(g.getAs[Long]("cc") === (unc + 65535) / 65536)
    }
    // per-chunk sizes via lead() equal base + (i % 7)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("generation").orderBy("chunk_index")
    val bad = chunks
      .withColumn("csize",
        lead("chunk_offset", 1).over(w) - col("chunk_offset"))
      .where(col("csize").isNotNull)
      .join(
        chunks.groupBy("generation").agg(min("data_length").as("dl")),
        "generation")
      .collect()
      .count { r =>
        val m = meta(r.getAs[Long]("generation").toInt - 1)
        val base = 65536L * m.getLong(m.fieldIndex("disk_length")) /
          m.getLong(m.fieldIndex("uncompressed_length"))
        r.getAs[Long]("csize") !==
          base + r.getAs[Long]("chunk_index") % 7
      }
    assert(bad === 0)
    // column pruning: a narrow projection still plans and reads
    assert(chunks.select("generation", "chunk_offset").count() ===
      chunks.count())
  }
}
