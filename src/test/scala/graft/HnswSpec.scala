package graft

import graft.ops.{Hnsw, Similarity}

/** q137: sharded HNSW must reproduce the brute-force cosine top-k exactly
  * at the gated scale (the beam is sized for full recall there), and must
  * be bit-deterministic across runs. */
class HnswSpec extends SparkSpec {

  private def pairs(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("hnsw top-k equals brute-force cosine top-k at sf0.001") {
    val bf = pairs(Similarity.bruteForceTopK(spark, Sf0001).collect())
    val hn = pairs(Hnsw.hnswTopK(spark, Sf0001).collect())
    assert(hn == bf)
  }

  test("hnsw is deterministic across runs") {
    val a = pairs(Hnsw.hnswTopK(spark, Sf0001).collect())
    val b = pairs(Hnsw.hnswTopK(spark, Sf0001).collect())
    assert(a == b)
  }

  test("levels are geometric-ish and capped") {
    val levels = (100L until 600L).map(Hnsw.levelOf(_, 4))
    assert(levels.max <= 4)
    val l0 = levels.count(_ == 0)
    // p=1/2 geometric: roughly half the nodes at level 0
    assert(l0 > 150 && l0 < 350, s"level-0 count $l0 of ${levels.size}")
  }

  test("persisted-index search is bit-identical to the in-memory build") {
    val mem = pairs(Hnsw.hnswTopK(spark, Sf0001).collect())
    val per = pairs(Hnsw.hnswSearchPersisted(spark, Sf0001).collect())
    assert(per == mem)
  }

  test("a single-shard graph also recovers the exact top-k") {
    val bf = pairs(Similarity.bruteForceTopK(spark, Sf0001).collect())
    val hn = pairs(Hnsw.hnswTopK(spark, Sf0001, shards = 1).collect())
    assert(hn == bf)
  }

  test("incremental ingest: micro-batch insertion into the persisted " +
      "shards is bit-identical to the full batch build (round 10)") {
    import org.apache.spark.sql.functions._

    // shard routing parity: the insert path's pmod(hash(vec_id), shards)
    // must be EXACTLY the build's repartition(shards, vec_id) assignment,
    // or arrivals would land in the wrong graph
    val full = Hnsw.buildHnswIndex(spark, Sf0001)
    val misrouted = spark.read.parquet(full)
      .where(pmod(hash(col("vec_id")), lit(4)) =!= col("shard").cast("int"))
      .count()
    assert(misrouted === 0L, "hash(vec_id) disagrees with HashPartitioning")

    // prefix index over vec_id in [8, 300); ids >= 300 arrive as TWO
    // id-monotone micro-batches (file source, one file per trigger)
    val prefix = Hnsw.buildHnswIndex(spark, Sf0001, upTo = Some(300L))
    val ingest = java.nio.file.Files.createTempDirectory("graft-hnsw-stream-")
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    emb.where(col("vec_id") >= 300 && col("vec_id") < 400)
      .coalesce(1).write.parquet(s"$ingest/b0")
    emb.where(col("vec_id") >= 400)
      .coalesce(1).write.parquet(s"$ingest/b1")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$ingest/b*")
    val (writer, currentPath) =
      graft.streaming.StreamingStats.hnswIngest(spark, prefix, stream)
    val q = writer
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected at least two non-empty micro-batches")
    val ingested = currentPath()
    assert(ingested !== prefix, "no micro-batch committed a new index")

    // the evolved INDEX equals the from-scratch build over everything —
    // adjacency, levels, vectors, shard placement, bit for bit
    val cols = Seq("shard", "vec_id", "level", "layer", "neighbors", "qv",
      "norm2").map(col)
    val got = spark.read.parquet(ingested).select(cols: _*)
    val want = spark.read.parquet(full).select(cols: _*)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)

    // and so does the search relation (the q139 contract)
    val searched = pairs(
      Hnsw.hnswSearchIndex(spark, Sf0001, ingested).collect())
    val batch = pairs(Hnsw.hnswSearchPersisted(spark, Sf0001).collect())
    assert(searched == batch)
  }
}
