package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al., "Counting
  * distinct elements in a data stream", RANDOM 2002) as a typed Spark
  * `Aggregator` — the "novel sketch" extension point of SURVEY §2.10.
  *
  * State is the k smallest DISTINCT h60 hashes seen, kept sorted — O(k)
  * longs per group regardless of input size, vs `count(distinct)` whose
  * exact-distinct state grows with the group's value universe. Because the
  * state is a set-union monoid restricted to its k minima, `merge` is
  * associative AND commutative, so Spark's partial aggregation applies:
  * each map task ships at most k longs per group into the exchange — at
  * 100 TB the shuffle carries `groups × k × 8` bytes, not one row per
  * distinct token.
  *
  * The estimator is the classic (k−1)·H / h_(k) with H = 2^60 (the h60
  * hash space), computed in exact BigInt floor division so the DuckDB
  * oracle can replay it bit-for-bit with HUGEINT arithmetic; a group with
  * fewer than k distinct hashes is exact by construction. Estimate quality
  * (±1/√k relative) is itself oracle-visible since the query emits the
  * exact NDV alongside.
  */
object KmvSketch {

  /** 2^60: the exclusive upper bound of the h60 hash space. */
  val HashSpace: Long = 1L << 60

  case class In(h: Long)

  /** est: k-th-minimum estimator (exact when sketch not full);
    * kth_hash: h_(k) when full, −1 otherwise; sketch_n: |state| ≤ k. */
  case class Out(ndv_est: Long, kth_hash: Long, sketch_n: Long)

  /** Estimator shared with [[graft.oracle.OracleSql]]'s HUGEINT replay:
    * floor((k−1)·2^60 / h_k) — nonnegative operands, so BigInt truncation
    * IS floor, matching DuckDB `//`. */
  def estimate(k: Int, buf: Vector[Long]): Long =
    if (buf.length < k) buf.length.toLong
    else ((BigInt(k - 1) << 60) / buf.last).toLong

  class Agg(k: Int) extends Aggregator[In, Vector[Long], Out] {
    require(k >= 2, s"KMV needs k >= 2, got $k")

    def zero: Vector[Long] = Vector.empty

    /** Sorted-insert iff h is a new value below the current k-th minimum.
      * O(log k) search + O(k) copy per *accepted* hash; rejections (the
      * overwhelming majority once the sketch saturates) are O(log k). A
      * mutable treap would shave the copy, but at k ≤ a few hundred the
      * vector copy is cache-friendly and allocation-light. */
    def reduce(buf: Vector[Long], in: In): Vector[Long] = {
      val h = in.h
      if (buf.length >= k && h >= buf.last) buf
      else {
        val i = lowerBound(buf, h)
        if (i < buf.length && buf(i) == h) buf // already present
        else {
          val grown = (buf.take(i) :+ h) ++ buf.drop(i)
          if (grown.length > k) grown.dropRight(1) else grown
        }
      }
    }

    /** Distinct-merge of two sorted vectors, truncated to the k minima —
      * the set-union-then-take-k monoid (commutative, associative,
      * property-tested in SketchesSpec). */
    def merge(a: Vector[Long], b: Vector[Long]): Vector[Long] = {
      val out = Vector.newBuilder[Long]
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < a.length || j < b.length)) {
        if (j >= b.length || (i < a.length && a(i) < b(j))) {
          out += a(i); i += 1
        } else if (i >= a.length || b(j) < a(i)) {
          out += b(j); j += 1
        } else { // equal head: emit once
          out += a(i); i += 1; j += 1
        }
        n += 1
      }
      out.result()
    }

    def finish(buf: Vector[Long]): Out =
      Out(estimate(k, buf),
        if (buf.length >= k) buf.last else -1L,
        buf.length.toLong)

    def bufferEncoder: Encoder[Vector[Long]] = ExpressionEncoder[Vector[Long]]()
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** The same sketch with the raw k-minimum list as its output — the form
    * set-algebra consumers ([[graft.ops.Sketches.sketchSetOps]]) compose:
    * union/intersection/Jaccard estimates all derive from the lists alone. */
  class ListAgg(k: Int) extends Aggregator[In, Vector[Long], Seq[Long]] {
    private val inner = new Agg(k)
    def zero: Vector[Long] = inner.zero
    def reduce(b: Vector[Long], in: In): Vector[Long] = inner.reduce(b, in)
    def merge(a: Vector[Long], b: Vector[Long]): Vector[Long] = inner.merge(a, b)
    def finish(buf: Vector[Long]): Seq[Long] = buf
    def bufferEncoder: Encoder[Vector[Long]] = inner.bufferEncoder
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** First index in sorted `buf` whose value is >= h. */
  private def lowerBound(buf: Vector[Long], h: Long): Int = {
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < h) lo = mid + 1 else hi = mid
    }
    lo
  }
}
