package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** graft.functions.DotI64 — the codegen'd similarity kernel. Checks the
  * generated-code path against both hand-computed values and the
  * interpreted `aggregate(zip_with(...))` form it replaced. */
class VectorKernelSpec extends SparkSpec {

  private def df = {
    GraftFunctions.ensureRegistered(spark)
    spark.createDataFrame(Seq(
      (1L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (2L, Seq(-7L, 0L), Seq(2L, 9L)),
      (3L, Seq.empty[Long], Seq.empty[Long]),
      (4L, Seq(1000000L, -1000000L), Seq(1000000L, 1000000L))))
      .toDF("id", "a", "b")
  }

  test("dot_i64 matches hand-computed dot products (incl. empty, negative)") {
    val rows = df.select(col("id"), GraftFunctions.dotI64(col("a"), col("b"))
      .as("d")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(1L -> 32L, 2L -> -14L, 3L -> 0L, 4L -> 0L))
  }

  test("dot_i64 is NULL on length mismatch, like the zip_with form") {
    val r = df.where(col("id") === 1L)
      .select(GraftFunctions.dotI64(col("a"), array(lit(1L))).as("d"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("dot_i64 agrees with the interpreted aggregate/zip_with form") {
    val interpreted = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, v) => acc + v)
    val diff = df
      .select((GraftFunctions.dotI64(col("a"), col("b")) - interpreted).as("d"))
      .agg(sum(abs(col("d")))).collect()(0).getLong(0)
    assert(diff === 0L)
  }

  test("dot_i64 is null on null input and usable via SQL after registration") {
    val r = df.limit(1)
      .select(GraftFunctions.dotI64(lit(null).cast("array<bigint>"), col("b")))
      .collect()(0)
    assert(r.isNullAt(0))
    df.createOrReplaceTempView("vk")
    val viaSql = spark.sql("SELECT sum(dot_i64(a, b)) FROM vk")
      .collect()(0).getLong(0)
    assert(viaSql === 32L - 14L + 0L + 0L)
  }
}
