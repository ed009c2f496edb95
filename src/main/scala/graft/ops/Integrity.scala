package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.datadb.CassandraDataFixture
import graft.sources.filterdb.FilterDbFormat

/** SSTable integrity components over the REAL per-sstable file set:
  * Filter.db bloom membership and Digest.crc32 verification — the two
  * sidecars a Cassandra operator checks when validating files off a node.
  *
  * Scale shapes, stated per op:
  *  - Bloom probes: filters are per-sstable and SMALL relative to data
  *    (~10 bits/key); here the 6 fixture filters broadcast and the probe
  *    relation stays distributed. At 100 TB the same plan holds per
  *    table-shard (broadcast joins keyed by sstable); probing the union
  *    of ALL filters of a 100k-sstable cluster would instead co-partition
  *    keys by sstable and load each filter once per task.
  *  - Digest: Spark's codegen'd `crc32` over `binaryFile` content — one
  *    task per sstable, no shuffle until the 6-row count. (binaryFile
  *    materializes a whole file per row; at multi-GB sstable sizes the
  *    streaming-CRC variant over split files with crc-combine replaces it.)
  */
object Integrity {

  /** q69: every present partition key probed against its sstable's REAL
    * Filter.db — `found` MUST equal `partitions` (bloom filters have no
    * false negatives; a hash/bit-layout bug here fails the oracle).
    * False-positive behavior on absent keys is pinned by the spec (rate,
    * not membership, is the only guarantee — not oracle material). */
  def bloomMembership(spark: SparkSession, dir: String): DataFrame = {
    val path = CassandraDataFixture.ensureFiles(spark, dir, compressed = false)
    val filters: Map[String, FilterDbFormat.Filter] = {
      val d = new java.io.File(path)
      d.listFiles().filter(_.getName.endsWith(FilterDbFormat.Suffix)).map { f =>
        val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
          new java.io.FileInputStream(f)))
        try f.getName.stripSuffix(FilterDbFormat.Suffix) ->
          FilterDbFormat.parse(in)
        finally in.close()
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(filters)
    val probe = udf { (gen: Long, key: Long) =>
      bc.value(s"nb-$gen-big").mightContain(
        java.nio.ByteBuffer.allocate(8).putLong(key).array())
    }
    // fixture sstable ids map sst-<g-1> ↔ nb-<g>-big
    val keys = graft.sources.Fixtures.cells(spark, dir)
      .select(col("sstable_id"), col("key")).distinct()
      .withColumn("gen",
        regexp_extract(col("sstable_id"), "sst-(\\d+)", 1).cast("long") + 1L)
    keys
      .withColumn("present", probe(col("gen"), col("key")))
      .groupBy("sstable_id")
      .agg(count(lit(1)).as("partitions"),
        sum(when(col("present"), 1L).otherwise(0L)).as("found"))
      .orderBy("sstable_id")
  }

  /** q76: REAL Summary.db roundtrip + cross-component consistency. Parses
    * each sstable's summary (IndexSummarySerializer layout: LE offsets/
    * positions inside a BE header — the component's documented quirk) and
    * verifies every summary entry points at a real Index.db entry holding
    * the SAME key: `positions_ok` MUST equal `entries`. Keys, counts,
    * interval and the first/last-key tail are oracle-recomputed from
    * parquet (per sstable: every MinIndexInterval-th partition in key
    * order).
    *
    * Scale shape: summaries are per-sstable and SMALL by design (1/128th
    * of the index at real sampling) — the summary side reads through the
    * `sstable-summary` DSv2 (round 13: per-entry rows, generation file
    * pruning static AND runtime, many tiny files per task), and the
    * Index.db side joins per (sstable, offset) with no wide exchange
    * (file-granular parses; fixture Index files are MBs per GB of data,
    * so whole-file rows hold far past fixture scale; a multi-GB index
    * would move this side onto the streaming DSv2 reader). */
  def summaryRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.sources.indexdb.IndexDbFormat
    val path = CassandraDataFixture.ensureFiles(spark, dir, compressed = false)
    def gen(p: String, suffix: String): Long =
      ("nb-(\\d+)-big" + suffix).r.findFirstMatchIn(p).get.group(1).toLong
    def keyLong(b: Array[Byte]): Long = java.nio.ByteBuffer.wrap(b).getLong
    val summaries = spark.read.format("sstable-summary").load(path)
      .select(col("generation").as("gen"),
        graft.sources.BinaryKeys.beLong(col("key")).as("key"),
        col("position").as("index_offset"),
        col("min_interval"),
        graft.sources.BinaryKeys.beLong(col("first_key")).as("first_key"),
        graft.sources.BinaryKeys.beLong(col("last_key")).as("last_key"))
    val indexEntries = spark.read.format("binaryFile")
      .load(s"$path/*${IndexDbFormat.Suffix}")
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val g = gen(p, java.util.regex.Pattern.quote(IndexDbFormat.Suffix))
        IndexDbFormat.entriesWithOffsets(
          new java.io.ByteArrayInputStream(bytes))
          .map(e => (g, e.offset, keyLong(e.key))).toVector
      }
      .toDF("gen", "index_offset", "index_key")
    summaries
      .join(indexEntries, Seq("gen", "index_offset"), "left")
      .groupBy("gen")
      .agg(
        count(lit(1)).as("entries"),
        max("min_interval").as("min_interval"),
        sum(col("key") % 1000003L).as("keys_sum"),
        max("first_key").as("first_key"),
        max("last_key").as("last_key"),
        sum(when(col("index_key") === col("key"), 1L).otherwise(0L))
          .as("positions_ok"))
      .select(
        concat(lit("sst-"), (col("gen") - 1L).cast("string"))
          .as("sstable_id"),
        col("entries"), col("min_interval"), col("keys_sum"),
        col("first_key"), col("last_key"), col("positions_ok"))
      .orderBy("sstable_id")
  }

  /** q79: REAL promoted (row) index roundtrip + tiling self-check. Every
    * Index.db entry's `RowIndexEntry` parses back (headerLength, partition
    * DeletionTime, IndexInfo blocks with clustering-prefix bounds, the
    * trailing block-offset table), and for each indexed partition the
    * engine verifies the blocks TILE the partition: block 0 starts at
    * headerLength (= key header + partition DeletionTime) and each
    * subsequent block starts where the previous ended — `tiled_ok` MUST
    * equal `indexed`. Block counts, boundary clusterings and boundary
    * kinds (marker bound vs row clustering) are oracle-recomputed from
    * parquet via the fixture's count-based block rule (boundary every
    * [[CassandraDataFixture.RowsPerBlock]] unfiltereds).
    *
    * Scale shape: one task per Index.db file (the row index is ~1% of
    * data volume); no shuffle before the per-sstable rollup. */
  def rowIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.sources.indexdb.IndexDbFormat
    import graft.sources.datadb.CassandraDataFormat
    val path = CassandraDataFixture.ensureFiles(spark, dir, compressed = false)
    val perPartition = spark.read.format("binaryFile")
      .load(s"$path/*${IndexDbFormat.Suffix}")
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val g = "nb-(\\d+)-big".r.findFirstMatchIn(p).get.group(1).toLong
        IndexDbFormat.fullEntries(new java.io.ByteArrayInputStream(bytes))
          .map { e =>
            if (e.promoted.isEmpty) (g, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
            else {
              val pi = CassandraDataFormat.parsePromotedIndex(e.promoted)
              val tiled =
                pi.headerLength == 2L + e.key.length + 12L &&
                  pi.blocks.headOption.exists(_.offset == pi.headerLength) &&
                  pi.blocks.sliding(2).forall {
                    case Seq(a, b) => b.offset == a.offset + a.width
                    case _ => true
                  }
              (g, 1L, pi.blocks.length.toLong,
                pi.blocks.map(_.firstClustering % 1000003L).sum,
                pi.blocks.map(_.lastClustering % 1000003L).sum,
                pi.blocks.map(_.firstKind.toLong).sum,
                pi.blocks.map(_.lastKind.toLong).sum,
                if (tiled) 1L else 0L)
            }
          }.toVector
      }
      .toDF("gen", "indexed", "blocks", "first_cl_sum", "last_cl_sum",
        "first_kind_sum", "last_kind_sum", "tiled")
    perPartition
      .groupBy("gen")
      .agg(
        count(lit(1)).as("partitions"),
        sum("indexed").as("indexed"),
        sum("blocks").as("blocks"),
        sum("first_cl_sum").as("first_cl_sum"),
        sum("last_cl_sum").as("last_cl_sum"),
        sum("first_kind_sum").as("first_kind_sum"),
        sum("last_kind_sum").as("last_kind_sum"),
        sum("tiled").as("tiled_ok"))
      .select(
        concat(lit("sst-"), (col("gen") - 1L).cast("string"))
          .as("sstable_id"),
        col("partitions"), col("indexed"), col("blocks"),
        col("first_cl_sum"), col("last_cl_sum"),
        col("first_kind_sum"), col("last_kind_sum"), col("tiled_ok"))
      .orderBy("sstable_id")
  }

  /** q110: the row-level metadata of the real format surfaced as typed
    * events — static-row cells, primary-key liveness (with/without row
    * TTL), row deletions and complex-column deletions — read back from
    * the FEATURE variant sstable set (a schema with a static column and a
    * complex regular, [[CassandraDataFixture.ensureFeatureFiles]]) and
    * rolled up per sstable with modular sums over every field, so one
    * mis-parsed flag, delta or value length anywhere in the row codec
    * breaks the hash against the oracle's parquet replay of the same
    * deterministic model. One task per sstable; no shuffle before the
    * tiny per-sstable rollup. */
  def rowLevelEvents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.sources.datadb.{CassandraDataFormat, DataDbFormat}
    val path = CassandraDataFixture.ensureFeatureFiles(spark, dir)
    val M = 1000003L
    val perSstable = spark.read.format("binaryFile")
      .load(s"$path/*${DataDbFormat.Suffix}")
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        val g = "fb-(\\d+)-big".r.findFirstMatchIn(p).get.group(1)
        var statics = 0L; var staticSize = 0L; var staticTs = 0L
        var liveness = 0L; var liveTs = 0L; var liveTtl = 0L; var liveLdt = 0L
        var rowDels = 0L; var rdelTs = 0L; var rdelLdt = 0L
        var cplxDels = 0L; var cdelTs = 0L; var cdelLdt = 0L
        var cells = 0L; var cellTs = 0L; var cellSize = 0L
        var partDels = 0L; var pdelTs = 0L; var pdelLdt = 0L
        var keysSum = 0L
        var lastKey: Long = Long.MinValue
        CassandraDataFormat.events(
            new java.io.ByteArrayInputStream(bytes),
            CassandraDataFixture.FeatureHeader).foreach { e =>
          val key = java.nio.ByteBuffer.wrap(e.key).getLong
          if (key != lastKey) { keysSum += key % M; lastKey = key }
          e.kindCode match {
            case DataDbFormat.KindCodeStaticCell =>
              statics += 1; staticSize += e.sizeBytes
              staticTs += e.timestampUs % M
              require(e.clustering == DataDbFormat.StaticClustering &&
                e.columnName == "s0")
            case DataDbFormat.KindCodeRowLiveness =>
              liveness += 1; liveTs += e.timestampUs % M
              liveTtl += e.ttlS; liveLdt += e.localDeletionTimeS % M
            case DataDbFormat.KindCodeRowDeletion =>
              rowDels += 1; rdelTs += e.timestampUs % M
              rdelLdt += e.localDeletionTimeS % M
            case DataDbFormat.KindCodeComplexDeletion =>
              cplxDels += 1; cdelTs += e.timestampUs % M
              cdelLdt += e.localDeletionTimeS % M
              require(e.columnName == "tags")
            case DataDbFormat.KindCodeCell =>
              cells += 1; cellTs += e.timestampUs % M
              cellSize += e.sizeBytes
            case DataDbFormat.KindCodePartitionDeletion =>
              partDels += 1; pdelTs += e.timestampUs % M
              pdelLdt += e.localDeletionTimeS % M
              require(e.clustering == DataDbFormat.PartitionClustering)
            case other => throw new java.io.IOException(
              s"unexpected event kind $other in feature set")
          }
        }
        (s"fb-$g", statics, staticSize, staticTs, liveness, liveTs,
          liveTtl, liveLdt, rowDels, rdelTs, rdelLdt, cplxDels, cdelTs,
          cdelLdt, cells, cellTs, cellSize, partDels, pdelTs, pdelLdt,
          keysSum)
      }
    perSstable.toDF("sstable_id", "statics", "static_size_sum",
        "static_ts_sum", "liveness", "live_ts_sum", "live_ttl_sum",
        "live_ldt_sum", "row_dels", "rdel_ts_sum", "rdel_ldt_sum",
        "complex_dels", "cdel_ts_sum", "cdel_ldt_sum", "cells",
        "cell_ts_sum", "cell_size_sum", "part_dels", "pdel_ts_sum",
        "pdel_ldt_sum", "keys_sum")
      .orderBy("sstable_id")
  }

  /** q129: complex STATIC columns roundtripped through the real row
    * codec — the last row-codec rejection, closed. The STATIC-COMPLEX
    * variant set ([[CassandraDataFixture.ensureStaticComplexFiles]])
    * carries a static map column (`stags`) next to a simple static
    * (`s0`) and a regular (`c0`); its static rows write path-ordered
    * multi-cell columns and (on the k%7 residue) a static complex
    * deletion. Every surfaced event field lands in a per-sstable
    * modular sum keyed BY COLUMN, so a cell mis-attributed between the
    * simple and complex static, a missing path read, or a deletion at
    * the wrong sentinel breaks the hash against the oracle's replay of
    * the same deterministic model. One task per sstable; no shuffle
    * before the tiny rollup. */
  def staticComplexEvents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.sources.datadb.{CassandraDataFormat, DataDbFormat}
    val path = CassandraDataFixture.ensureStaticComplexFiles(spark, dir)
    val M = 1000003L
    val perSstable = spark.read.format("binaryFile")
      .load(s"$path/*${DataDbFormat.Suffix}")
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        val g = "fs-(\\d+)-big".r.findFirstMatchIn(p).get.group(1)
        var s0Cells = 0L; var s0Size = 0L; var s0Ts = 0L
        var stagsCells = 0L; var stagsSize = 0L; var stagsTs = 0L
        var cplxDels = 0L; var cdelTs = 0L; var cdelLdt = 0L
        var liveness = 0L; var liveTs = 0L
        var regCells = 0L; var regSize = 0L; var regTs = 0L
        var keysSum = 0L
        var lastKey: Long = Long.MinValue
        CassandraDataFormat.events(
            new java.io.ByteArrayInputStream(bytes),
            CassandraDataFixture.StaticComplexHeader).foreach { e =>
          val key = java.nio.ByteBuffer.wrap(e.key).getLong
          if (key != lastKey) { keysSum += key % M; lastKey = key }
          e.kindCode match {
            case DataDbFormat.KindCodeStaticCell =>
              require(e.clustering == DataDbFormat.StaticClustering)
              if (e.columnName == "s0") {
                s0Cells += 1; s0Size += e.sizeBytes
                s0Ts += e.timestampUs % M
              } else {
                require(e.columnName == "stags")
                stagsCells += 1; stagsSize += e.sizeBytes
                stagsTs += e.timestampUs % M
              }
            case DataDbFormat.KindCodeComplexDeletion =>
              require(e.clustering == DataDbFormat.StaticClustering &&
                e.columnName == "stags")
              cplxDels += 1; cdelTs += e.timestampUs % M
              cdelLdt += e.localDeletionTimeS % M
            case DataDbFormat.KindCodeRowLiveness =>
              require(e.clustering == DataDbFormat.StaticClustering)
              liveness += 1; liveTs += e.timestampUs % M
            case DataDbFormat.KindCodeCell =>
              require(e.columnName == "c0")
              regCells += 1; regSize += e.sizeBytes
              regTs += e.timestampUs % M
            case other => throw new java.io.IOException(
              s"unexpected event kind $other in static-complex set")
          }
        }
        (s"fs-$g", s0Cells, s0Size, s0Ts, stagsCells, stagsSize, stagsTs,
          cplxDels, cdelTs, cdelLdt, liveness, liveTs,
          regCells, regSize, regTs, keysSum)
      }
    perSstable.toDF("sstable_id", "s0_cells", "s0_size_sum", "s0_ts_sum",
        "stags_cells", "stags_size_sum", "stags_ts_sum",
        "complex_dels", "cdel_ts_sum", "cdel_ldt_sum",
        "liveness", "live_ts_sum",
        "reg_cells", "reg_size_sum", "reg_ts_sum", "keys_sum")
      .orderBy("sstable_id")
  }

  /** q121: SHADOWING-AWARE purge accounting over the feature set — the
    * first operator consuming the PARTITION_DELETION events as semantics,
    * not just metadata: Cassandra's rule deletes every cell whose
    * timestamp is <= the partition deletion's markedForDeleteAt, so a
    * compaction would reclaim exactly those bytes. The fixture plants
    * deletions whose markedForDeleteAt BISECTS each deleted partition's
    * cell timestamps, so both branches of the comparison carry weight.
    *
    * Shape: the deletion relation is tiny relative to cells (deletions
    * are rare events) — broadcast per (sstable, key); cells stay
    * distributed and the rollup is one hash aggregate. At 100 TB the
    * same plan holds; a deletion-heavy corpus would co-partition both
    * sides on (sstable, key) instead. */
  def shadowedPurge(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.datadb.{DataDb, DataDbFormat, DataDbScan}
    val path = CassandraDataFixture.ensureFeatureFiles(spark, dir)
    // light-row-work scan (broadcast join + one hash rollup): fixed
    // split cap — see DataDbScan.LightRowWorkSplit
    val ev = DataDb.read(spark, path, format = DataDbScan.FormatCassandra,
        maxSplitBytes = DataDbScan.LightRowWorkSplit)
      .withColumn("k", graft.sources.BinaryKeys.beLong(col("key")))
    val pdel = ev
      .where(col("kind") === DataDbFormat.KindPartitionDeletion)
      .groupBy(col("sstable_id"), col("k"))
      .agg(max(col("timestamp_us")).as("mfda"))
    ev.where(col("kind").isin(DataDbFormat.KindCell,
        DataDbFormat.KindStaticCell))
      .join(broadcast(pdel), Seq("sstable_id", "k"), "left")
      .groupBy(regexp_extract(col("sstable_id"), "fb-(\\d+)", 0)
        .as("sstable_id"))
      .agg(
        countDistinct(when(col("mfda").isNotNull, col("k")))
          .as("deleted_partitions"),
        count(lit(1)).as("cells_total"),
        sum(when(col("timestamp_us") <= col("mfda"), 1L).otherwise(0L))
          .as("cells_shadowed"),
        sum(when(col("timestamp_us") <= col("mfda"), col("size_bytes"))
          .otherwise(0L)).as("shadowed_size_sum"),
        sum(when(col("mfda").isNull ||
          col("timestamp_us") > col("mfda"), 1L).otherwise(0L))
          .as("live_cells"))
      .orderBy("sstable_id")
  }

  /** q87: REAL CRC.db verification — recompute the UNCOMPRESSED variant's
    * per-chunk CRC32s at the sidecar's own stored chunk size and compare
    * element-wise (`DataIntegrityMetadata.ChecksumValidator`'s read-path
    * check). `crc_ok` folds chunk-count equality, per-chunk match and
    * non-emptiness; a single flipped Data.db byte flips exactly one chunk's
    * CRC (spec-pinned). Same per-file task grain + whole-file-bytes caveat
    * as q70 (a multi-GB file moves to streaming CRC over split ranges). */
  def crcVerify(spark: SparkSession, dir: String): DataFrame =
    crcVerifyAt(spark,
      CassandraDataFixture.ensureFiles(spark, dir, compressed = false))

  def crcVerifyAt(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import graft.sources.crcdb.CrcDbFormat
    def gen(p: String): Long =
      "nb-(\\d+)-big".r.findFirstMatchIn(p).get.group(1).toLong
    val sidecars = spark.read.format("binaryFile")
      .load(s"$path/*${CrcDbFormat.Suffix}")
      .select(col("path"), col("length"), col("content"))
      .as[(String, Long, Array[Byte])]
      .map { case (p, len, bytes) =>
        val c = CrcDbFormat.parse(new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(bytes)), len)
        (gen(p), c.chunkBytes, c.crcs.toArray)
      }.toDF("gen", "chunk_bytes", "stored")
    val data = spark.read.format("binaryFile").load(s"$path/*-Data.db")
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .map { case (p, bytes) => (gen(p), bytes) }
      .toDF("gen", "bytes")
    sidecars.join(data, "gen")
      .as[(Long, Int, Array[Int], Array[Byte])]
      .map { case (g, chunkBytes, stored, bytes) =>
        val computed = CrcDbFormat.chunkCrcs(bytes, chunkBytes)
        val ok = stored.nonEmpty &&
          computed.length == stored.length &&
          computed.iterator.zip(stored.iterator).forall(p => p._1 == p._2)
        (g, if (ok) 1L else 0L)
      }
      .toDF("gen", "crc_ok")
      .select(
        concat(lit("sst-"), (col("gen") - 1L).cast("string"))
          .as("sstable_id"),
        col("crc_ok"))
      .orderBy("sstable_id")
  }

  /** q70: recompute each Data.db file's CRC32 (as stored — compressed
    * bytes for the compressed variant) and compare with the Digest.crc32
    * sidecar, across BOTH fixture variants: 12 files, 12 matches. */
  def digestVerify(spark: SparkSession, dir: String): DataFrame = {
    val paths = Seq(
      CassandraDataFixture.ensureFiles(spark, dir, compressed = false),
      CassandraDataFixture.ensureFiles(spark, dir, compressed = true))
    val frames = paths.map { p =>
      val data = spark.read.format("binaryFile").load(s"$p/*-Data.db")
        .select(
          regexp_extract(col("path"), "(nb-\\d+-big)-Data\\.db", 1).as("sst"),
          crc32(col("content")).as("computed"))
      val digest = spark.read.format("binaryFile").load(s"$p/*-Digest.crc32")
        .select(
          regexp_extract(col("path"), "(nb-\\d+-big)-Digest\\.crc32", 1).as("sst"),
          decode(col("content"), "UTF-8").cast("long").as("stored"))
      data.join(digest, "sst")
    }
    frames.reduce(_ unionByName _)
      .agg(count(lit(1)).as("sstables"),
        sum(when(col("computed") === col("stored"), 1L).otherwise(0L))
          .as("matches"))
  }
}
