package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.KmvSketch
import graft.ops.Sketches

/** Unit laws for the bounded-state sketches (q133/q134): KMV monoid
  * properties and estimator exactness, Misra-Gries superset soundness,
  * and end-to-end shape at sf0.001. */
class SketchesSpec extends SparkSpec {

  private def agg(k: Int) = new KmvSketch.Agg(k)

  test("KMV reduce keeps the k smallest distinct hashes, sorted") {
    val a = agg(4)
    val buf = Seq(9L, 3L, 7L, 3L, 11L, 1L, 5L)
      .foldLeft(a.zero)((b, h) => a.reduce(b, KmvSketch.In(h)))
    assert(buf == Vector(1L, 3L, 5L, 7L))
  }

  test("KMV merge is commutative, associative, and equals bulk reduce") {
    val a = agg(5)
    val rnd = new scala.util.Random(42)
    val xs = Vector.fill(60)(rnd.nextInt(40).toLong + 1)
    val (l, r) = xs.splitAt(23)
    def run(v: Seq[Long]) =
      v.foldLeft(a.zero)((b, h) => a.reduce(b, KmvSketch.In(h)))
    val bulk = run(xs)
    assert(a.merge(run(l), run(r)) == bulk)
    assert(a.merge(run(r), run(l)) == bulk)
    val thirds = xs.grouped(20).map(run).toVector
    assert(thirds.reduceLeft(a.merge) == bulk)
    assert(a.merge(a.zero, bulk) == bulk && a.merge(bulk, a.zero) == bulk)
  }

  test("KMV estimator: exact below k, (k-1)*2^60/h_k at k, BigInt-safe") {
    val a = agg(4)
    val small = Seq(10L, 20L).foldLeft(a.zero)(
      (b, h) => a.reduce(b, KmvSketch.In(h)))
    assert(a.finish(small) == KmvSketch.Out(2L, -1L, 2L))
    // full sketch: h_k = 1L<<58 -> est = 3*2^60 / 2^58 = 12
    val full = Seq(1L, 2L, 3L, 1L << 58, 1L << 59).foldLeft(a.zero)(
      (b, h) => a.reduce(b, KmvSketch.In(h)))
    assert(a.finish(full) == KmvSketch.Out(12L, 1L << 58, 4L))
    // (k-1)<<60 overflows Long for k=1024; BigInt path must not
    val k1024 = KmvSketch.estimate(1024, Vector.tabulate(1024)(i => i + 1L))
    assert(k1024 == (BigInt(1023) << 60) / 1024)
  }

  test("q133 estimates within KMV error bound of the exact NDV at sf0.001") {
    val rows = Sketches.kmvDistinct(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("ndv_est")
      val exact = r.getAs[Long]("ndv_exact")
      val n = r.getAs[Long]("sketch_n")
      if (n < 64) assert(est == exact) // sketch not full -> exact
      else // 1/sqrt(64) = 12.5% expected; allow 4 sigma
        assert(math.abs(est - exact).toDouble / exact < 0.5,
          s"lang ${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("q134 heavy hitters equal the direct full-groupBy answer") {
    val hh = Sketches.heavyHitters(spark, Sf0001).collect()
    val tok = graft.sources.Tables.documents(spark, Sf0001)
      .select(explode(split(col("text"), " ")).as("token"))
    val n = tok.count()
    val direct = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 64 > n)
      .orderBy(desc("cnt"), col("token"))
      .collect()
    assert(hh.nonEmpty, "threshold n/64 should surface stopwords")
    assert(hh.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      direct.map(r => (r.getString(0), r.getLong(1))).toSeq)
    hh.foreach(r => assert(r.getAs[Long]("total_tokens") == n))
  }

  test("q138 set-algebra estimates are sane vs the exact pair overlaps") {
    val rows = Sketches.sketchSetOps(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val estU = r.getAs[Long]("est_union")
      val estI = r.getAs[Long]("est_intersect")
      val exU = r.getAs[Long]("exact_union")
      val exI = r.getAs[Long]("exact_intersect")
      assert(estI <= estU) // intersection can never exceed union
      assert(estU > 0 && exU > 0)
      // KMV error ~1/sqrt(64); allow a wide 4-sigma-ish band
      assert(math.abs(estU - exU).toDouble / exU < 0.5,
        s"${r.getString(0)}x${r.getString(1)}: estU $estU vs $exU")
      // intersection estimator is noisier (c/k scaled); sanity-bound only
      assert(estI >= 0 && estI <= estU)
      assert(exI <= exU)
    }
  }

  test("q138 under-full sketches give exact answers (small token universe)") {
    import spark.implicits._
    // tiny corpus: two sources, < 64 distinct tokens each
    val tmp = java.nio.file.Files.createTempDirectory("kmv-exact-")
    graft.sources.TempDirs.register(tmp)
    Seq(
      (1L, "a b c d", "en", "s1", 7L),
      (2L, "c d e f", "en", "s2", 7L),
      (3L, "a b", "en", "s1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Sketches.sketchSetOps(spark, tmp.toString).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("est_union") == r.getAs[Long]("exact_union"))
    assert(r.getAs[Long]("est_intersect") == r.getAs[Long]("exact_intersect"))
    assert(r.getAs[Long]("exact_union") == 6L) // a b c d e f
    assert(r.getAs[Long]("exact_intersect") == 2L) // c d
  }

  test("q134 plan recounts only candidates via a broadcast join") {
    val plan = Sketches.heavyHitters(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }
}
