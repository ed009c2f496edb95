package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-cleansing operators for training-data pipelines: PII detection
  * (q91) and structural-boilerplate removal (q92) — the two scrub passes
  * that sit between raw crawl and dedup in every production pipeline
  * (C4/CCNet/RefinedWeb all run both).
  *
  * The synthetic documents contain no PII or page chrome, so each op
  * derives an augmented corpus with DETERMINISTIC planted artifacts
  * (mirroring [[Dedup.corpus]]'s planted duplicates and q61's planted
  * leaks) — identically derivable in DuckDB SQL, so the oracle checks real
  * positives, not vacuous zeros. */
object Cleanse {

  /** Email/IPv4/phone regexes written in the Java∩RE2 dialect overlap
    * (character classes, bounded repetition, `\b` word boundaries — no
    * lookaround, no backreferences) so Spark's codegen'd regexp and
    * DuckDB's RE2 match identically. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** documents with planted PII: emails on doc_id % 11, IPv4s on % 13,
    * phone numbers on % 17 (composites get several kinds). */
  def piiCorpus(spark: SparkSession, dir: String): DataFrame =
    plantPii(Tables.documents(spark, dir))

  def plantPii(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(
      col("text"),
      when(col("doc_id") % 11 === 0, concat(lit(" contact admin"),
        (col("doc_id") % 100).cast("string"), lit("@example.com for help")))
        .otherwise(lit("")),
      when(col("doc_id") % 13 === 0, concat(lit(" server 10."),
        (col("doc_id") % 200).cast("string"), lit(".0.1 responded")))
        .otherwise(lit("")),
      when(col("doc_id") % 17 === 0, concat(lit(" call 555-01"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit(" today")))
        .otherwise(lit(""))))

  private def matches(re: String): Column =
    regexp_extract_all(col("text"), lit(re), lit(0))

  private def matchedChars(re: String): Column =
    aggregate(matches(re), lit(0L), (acc, x) => acc + length(x))

  /** q91: PII scan rollup — per source, how many documents carry each PII
    * category, total match counts, and the redaction budget (characters a
    * `regexp_replace` pass would mask). One NARROW pass: every regex runs
    * inside whole-stage codegen per document, and the only exchange is the
    * O(#sources) rollup — the scan shape survives any corpus size. */
  def piiScan(spark: SparkSession, dir: String): DataFrame =
    piiScanOf(piiCorpus(spark, dir))

  /** The q91 scan over an arbitrary (already PII-planted) corpus. */
  def piiScanOf(pii: DataFrame): DataFrame =
    pii
      .select(col("source"),
        size(matches(EmailRe)).cast("long").as("emails"),
        size(matches(Ipv4Re)).cast("long").as("ips"),
        size(matches(PhoneRe)).cast("long").as("phones"),
        (matchedChars(EmailRe) + matchedChars(Ipv4Re) +
          matchedChars(PhoneRe)).as("pii_chars"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("emails") + col("ips") + col("phones") > 0, 1L)
          .otherwise(0L)).as("docs_with_pii"),
        sum("emails").as("emails"),
        sum("ips").as("ips"),
        sum("phones").as("phones"),
        sum("pii_chars").as("pii_chars"))
      .orderBy("source")

  /** documents as line-structured "pages": per-source header and footer on
    * every page (100% boilerplate), a cookie banner on doc_id % 3 (33% —
    * above threshold), a rare promo line on doc_id % 50 (2% — legitimate
    * content the filter must NOT strip), body in the middle. */
  def pageCorpus(spark: SparkSession, dir: String): DataFrame =
    pagesOf(Tables.documents(spark, dir))

  def pagesOf(docs: DataFrame): DataFrame = {
    val empty = array().cast("array<string>")
    docs.withColumn("lines", concat(
      array(concat(lit("subscribe to "), col("source"), lit(" newsletter"))),
      array(col("text")),
      when(col("doc_id") % 3 === 0,
        array(lit("accept our cookie policy"))).otherwise(empty),
      when(col("doc_id") % 50 === 0, array(concat(lit("promo code "),
        col("doc_id").cast("string")))).otherwise(empty),
      array(concat(lit("copyright "), col("source")))))
  }

  /** q92: CCNet-style structural boilerplate removal — a line occurring in
    * ≥ 30% of a source's documents is chrome (headers, footers, cookie
    * banners), everything rarer is content. Per source: document count,
    * line instances, distinct lines, how many distinct lines the filter
    * flags, the instances it would strip, and the character budget.
    *
    * Scale shape: the line relation exchanges on `(source, xxhash64(line))`
    * — 8-byte line keys, never line text (the oracle keys on the text form;
    * a 64-bit collision is q21's documented class); line length rides the
    * partial aggregate. The per-source doc totals are an O(#sources) frame
    * broadcast back, and every downstream frame is per-source tiny. */
  def boilerplate(spark: SparkSession, dir: String,
      threshPct: Int = 30): DataFrame =
    boilerplateOf(pageCorpus(spark, dir))

  /** q108: the boilerplate filter over the MULTILINGUAL page corpus — an
    * extra 50%-frequency chrome line carrying 2/3/4-byte UTF-8 characters
    * makes the flagged-line character budget (`chars_removed`) and the
    * line identity keys sensitive to byte-vs-char accounting in BOTH
    * engines (the round-7 q92 bug class, now oracle-visible). */
  def intlBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val empty = array().cast("array<string>")
    val pages = pagesOf(TextStats.intlDocs(spark, dir))
      .withColumn("lines", concat(col("lines"),
        when(col("doc_id") % 2 === 0,
          array(lit("große Änderung — 新しい規約 🦉 gilt"))).otherwise(empty)))
    boilerplateOf(pages)
  }

  def boilerplateOf(pages: DataFrame, threshPct: Int = 30): DataFrame = {
    val lines = pages
      .select(col("doc_id"), col("source"), explode(col("lines")).as("line"))
      .select(col("doc_id"), col("source"), xxhash64(col("line")).as("lh"),
        length(col("line")).cast("long").as("len"))
    val perLine = lines.groupBy("source", "lh")
      .agg(countDistinct("doc_id").as("line_docs"),
        count(lit(1)).as("occurrences"), max("len").as("len"))
    val perSource = pages.groupBy("source")
      .agg(count(lit(1)).as("docs"))
    perLine
      .join(broadcast(perSource), "source")
      .withColumn("flagged",
        col("line_docs") * 100 >= col("docs") * threshPct)
      .groupBy("source")
      .agg(
        max("docs").as("docs"),
        sum("occurrences").as("line_instances"),
        count(lit(1)).as("distinct_lines"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("boilerplate_lines"),
        sum(when(col("flagged"), col("occurrences")).otherwise(0L))
          .as("removed_instances"),
        sum(when(col("flagged"), col("occurrences") * col("len"))
          .otherwise(0L)).as("chars_removed"))
      .orderBy("source")
  }
}
