package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Fixtures
import graft.sources.bti.{BtiRowIndexFixture, BtiRowsFormat, BtiTrieFormat}

/** The bti (trie-indexed, Cassandra 5) POINT-LOOKUP and ROW-INDEX access
  * paths — q101 proved the full-scan walk; these prove the other half of
  * what the reference gets from cassandra-all (reference pom.xml:88-94):
  * per-key trie descent with the hash-byte filter, and the Rows.db
  * clustering-separator tries of large partitions. */
object BtiOps {

  /** q102: point-look-up EVERY fixture partition key in its sstable's
    * Partitions.db trie and emit the resolved position — the relation must
    * equal the full-scan/running-sum answer, which the oracle recomputes
    * from parquet. Misses surface as position −1 (and would break the
    * hash), so a single wrong trie descent is visible.
    *
    * Scale shape: the keys stay distributed; each task holds at most one
    * open trie per sstable it meets (tries are a few MB — the in-memory
    * random-access model the backward pointers require), loaded lazily
    * and cached per task. No shuffle is introduced at all: lookups are a
    * narrow map over the keys relation. At cluster scale the keys would
    * arrive pre-bucketed by sstable (corpus-sink bucketing); correctness
    * does not depend on it. */
  def lookupAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = graft.sources.bti.BtiFixture.ensureFiles(spark, dir)
    // NOTE (round 19): the output-side orderBy's sampling pass does run
    // the trie-walk map twice, but the walk is microseconds per key —
    // an input-side range sort was tried and measured SLOWER (the added
    // full-width key exchange costs more than the cheap second map), so
    // the original shape stays. The decode-once rewrite is reserved for
    // maps that do real codec work per row (q114/q115, the media family).
    val keys = Fixtures.liPscan(spark, dir)
      .select(col("sstable_id"), col("key")).as[(String, Long)]
    keys.mapPartitions { it =>
      val cache = scala.collection.mutable.Map.empty[String, Array[Byte]]
      it.map { case (sst, key) =>
        val trie = cache.getOrElseUpdate(sst,
          java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(path, sst + BtiTrieFormat.Suffix)))
        val kb = java.nio.ByteBuffer.allocate(8).putLong(key).array()
        (sst, key, BtiTrieFormat.lookup(trie, kb).getOrElse(-1L))
      }
    }.toDF("sstable_id", "key", "position")
      .orderBy("sstable_id", "key")
  }

  /** q103: the Rows.db row-index roundtrip, mirroring q79's big-format
    * proof. For every partition of the [[BtiRowIndexFixture]] set the scan
    * verifies: the stored key-hash byte recomputes (`hash_ok`), indexed
    * partitions' `~entryOffset` references resolve through Rows.db, each
    * entry's separator trie enumerates exactly `blockCount` blocks whose
    * separators DECODE through the composite clustering-prefix layout
    * ([[BtiRowIndexFixture.decodeSeparator]]) to the partition's modeled
    * first clusterings (`key * ClusteringStride + b`) and whose offsets
    * tile the partition at [[BtiRowIndexFixture.BlockBytes]] (`tiled_ok`),
    * open-marker deletion times decode with the correct structure (never
    * on block 0, all-or-nothing with one deletion time per partition —
    * `marker_ok`) and fold into `markers`/`md_sum`/`ldt_sum` for the
    * oracle to recompute from the partition scan,
    * and every partition's resolved Data.db position folds into `pos_sum`;
    * the oracle recomputes clustering sums, offsets and positions from the
    * parquet running sums. One task per sstable (a row index is ~1% of
    * data volume); no shuffle before the per-sstable rollup. */
  def rowIndexRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = BtiRowIndexFixture.ensureFiles(spark, dir)
    val B = BtiRowIndexFixture.BlockBytes
    val perSstable = spark.read.format("binaryFile")
      .load(s"$path/*${BtiTrieFormat.Suffix}")
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .map { case (p, trie) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        val sst = name.stripSuffix(BtiTrieFormat.Suffix)
        lazy val rows = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path, sst + BtiRowsFormat.Suffix))
        var partitions = 0L; var indexed = 0L; var blocks = 0L
        var sepSum = 0L; var offsSum = 0L; var posSum = 0L
        var tiledOk = 0L; var hashOk = 0L
        var markers = 0L; var mdSum = 0L; var ldtSum = 0L; var markerOk = 0L
        val stride = BtiRowIndexFixture.ClusteringStride
        BtiTrieFormat.fullScanWithHash(trie).foreach { case (k, h, pos) =>
          partitions += 1
          if (h == BtiTrieFormat.hashByte(k)) hashOk += 1
          val pkey = java.nio.ByteBuffer.wrap(k).getLong
          val resolved =
            if (pos >= 0) pos
            else {
              indexed += 1
              val entry = BtiRowsFormat.readEntry(rows, ~pos)
              var b = 0L
              var tiled = true
              // open-marker structure: block 0 never carries one, and
              // blocks 1..n-1 are all-or-nothing with ONE deletion time
              // (the fixture's whole-partition range-deletion model)
              var structOk = true
              var partMarkers = 0L
              var firstMarker: Option[(Long, Long)] = None
              BtiRowsFormat.blocks(rows, ~pos).foreach {
                case (sep, off, marker) =>
                  val cl = BtiRowIndexFixture.decodeSeparator(sep)
                  if (cl != pkey * stride + b || off != b * B) tiled = false
                  sepSum += cl % 1000003L
                  offsSum += off
                  marker.foreach { m =>
                    if (b == 0) structOk = false
                    if (firstMarker.isEmpty) firstMarker = Some(m)
                    else if (firstMarker.get != m) structOk = false
                    partMarkers += 1
                    mdSum += m._1 % 1000003L
                    ldtSum += m._2 % 1000003L
                  }
                  b += 1
              }
              if (partMarkers != 0L && partMarkers != b - 1) structOk = false
              if (structOk) markerOk += 1
              markers += partMarkers
              blocks += b
              if (tiled && b == entry.blockCount && b > 1) tiledOk += 1
              entry.dataPos
            }
          posSum += resolved % 1000003L
        }
        (sst, partitions, indexed, blocks, sepSum, offsSum, posSum,
          tiledOk, hashOk, markers, mdSum, ldtSum, markerOk)
      }
    perSstable.toDF("sstable_id", "partitions", "indexed", "blocks",
        "sep_sum", "offs_sum", "pos_sum", "tiled_ok", "hash_ok",
        "markers", "md_sum", "ldt_sum", "marker_ok")
      .orderBy("sstable_id")
  }
}
