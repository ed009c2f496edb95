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
}
