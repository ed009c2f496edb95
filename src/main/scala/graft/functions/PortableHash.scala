package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine 60-bit hash: the first 15 hex chars of md5, parsed as an
  * integer. Always positive (< 2^60), identical in Spark
  * (`conv(substring(md5(s),1,15),16,10)`), DuckDB (hex parse via
  * `list_reduce`) and on the driver (`MessageDigest`) — so hash-keyed
  * operators (fingerprints, SimHash, MinHash) stay oracle-checkable instead
  * of being locked to an engine hash like murmur3/xxhash64.
  *
  * Scale note: md5 is ~3x the cost of murmur3 per call but both stay inside
  * whole-stage codegen; for a pure-Spark deployment `xxhash64`/`hash` are
  * drop-in replacements (only the oracle portability is lost). */
object PortableHash {

  /** Column form: the native [[Hash60]] expression (one static call in
    * whole-stage codegen; value-identical to the pure-builtin composition
    * `conv(substring(md5(c),1,15),16,10)`, which remains available as
    * [[h60Builtin]]). Falls back to the builtin composition when no session
    * is active on the calling thread — the registry-name lookup
    * (`portable_h60` via call_function) resolves only in sessions where
    * [[GraftFunctions.ensureRegistered]] ran, and a Column built on a bare
    * thread must still analyze everywhere. */
  def h60(c: Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) => GraftFunctions.ensureRegistered(s); GraftFunctions.hash60(c)
      case None => h60Builtin(c)
    }

  /** Pure-builtin column form (no function registration required). */
  def h60Builtin(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Driver-side form — for precomputing data-independent constants (e.g.
    * LSH hyperplane coefficients) that get embedded as literals in both the
    * Spark plan and the oracle SQL. */
  def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  /** DuckDB-dialect fragment computing [[h60]] of the SQL expression `e`
    * (DuckDB has no conv(); parse the hex prefix with a list fold). */
  def duck(e: String): String =
    s"list_reduce(list_transform(string_split(substr(md5($e),1,15),''), " +
      "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), " +
      "(a,b) -> a*16+b)"
}
