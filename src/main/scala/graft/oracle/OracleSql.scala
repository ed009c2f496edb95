package graft.oracle

import graft.ops.Dist

/** DuckDB-dialect SQL equivalents of every oracle-checked query. The driver
  * executes these over the same parquet tables (registered by base name) and
  * hash-compares against the Spark results, so every expression here must be
  * engine-exact: integer arithmetic, explicit floor() before narrowing
  * (DuckDB CAST rounds; Spark CAST truncates), explicit CAST(... AS BIGINT)
  * on aggregates (DuckDB SUM yields HUGEINT), no engine hash functions, no
  * float accumulation. Mirrors graft.sources.Fixtures / graft.ops.* 1:1. */
object OracleSql {

  val GcBeforeS = 2500L * 86400L

  /** DuckDB form of the cross-engine 60-bit hash (PortableHash.h60). */
  private def h60(e: String): String = graft.functions.PortableHash.duck(e)

  /** Plane p of Similarity's LSH hyperplanes as a DuckDB list literal —
    * the same driver-side constants the Spark plan embeds. */
  private def planeSql(p: Int): String =
    graft.ops.Similarity.planeCoeffs(8, 64)(p).mkString("[", ", ", "]")

  private val liDay =
    "CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)"
  private val oDay =
    "CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)"

  /** gcBefore at the non-default gc_grace = 500 days: fixture NOW (day
    * 4000) − 500 days — the q57/q58 parameterized-gc_grace check. */
  val GcAltS = 3500L * 86400L

  /** Mirror of Fixtures.lineitemCells + ordersCells + partitionScan +
    * partitions + sstableMeta as one CTE prefix, at an arbitrary
    * `gcBefore = now − gc_grace_seconds` cutoff (the engine threads the
    * same parameter through partitionScan). */
  def fixturesAt(gcBeforeS: Long): String = s"""
licells AS (
  SELECT 'ks1' AS keyspace, 'lineitem' AS tbl,
    'sst-' || (l_suppkey % 6) AS sstable_id,
    l_orderkey AS key,
    'key-' || l_orderkey AS key_formatted,
    CAST(l_linenumber % 3 AS BIGINT) AS clustering,
    CASE WHEN l_returnflag = 'R' AND l_linenumber = 7
         THEN 'range:' || (l_linenumber % 3)
         ELSE 'c' || (l_partkey % 2) END AS column_name,
    CASE WHEN l_returnflag = 'R' AND l_linenumber = 7
         THEN 'RANGE_TOMBSTONE_MARKER' ELSE 'CELL' END AS kind,
    $liDay * 86400000000 + l_orderkey * 10 + l_linenumber AS timestamp_us,
    CASE WHEN l_discount >= 0.06
         THEN CAST(floor(l_tax * 100) AS BIGINT) * 86400
         ELSE CAST(-1 AS BIGINT) END AS ttl_s,
    CASE WHEN l_returnflag = 'R' THEN $liDay * 86400
         ELSE CAST(2147483647 AS BIGINT) END AS local_deletion_time_s,
    (l_returnflag = 'R') AS is_tombstone,
    (l_discount >= 0.06 AND l_returnflag <> 'R') AS is_expiring,
    (l_partkey % 97 = 0 AND l_returnflag <> 'R') AS is_counter,
    (l_returnflag <> 'R') AS is_live,
    CAST(floor(l_extendedprice) AS BIGINT) % 10000 + 64 AS size_bytes
  FROM lineitem
),
ocells AS (
  SELECT 'ks1' AS keyspace, 'orders' AS tbl,
    'osst-' || (o_orderkey % 4) AS sstable_id,
    o_custkey AS key,
    'key-' || o_custkey AS key_formatted,
    o_orderkey AS clustering,
    'total' AS column_name,
    'CELL' AS kind,
    $oDay * 86400000000 + o_orderkey AS timestamp_us,
    CAST(-1 AS BIGINT) AS ttl_s,
    CASE WHEN o_orderstatus = 'F' AND o_orderkey % 5 = 0 THEN $oDay * 86400
         ELSE CAST(2147483647 AS BIGINT) END AS local_deletion_time_s,
    (o_orderstatus = 'F' AND o_orderkey % 5 = 0) AS is_tombstone,
    FALSE AS is_expiring,
    FALSE AS is_counter,
    NOT (o_orderstatus = 'F' AND o_orderkey % 5 = 0) AS is_live,
    CAST(floor(o_totalprice) AS BIGINT) % 8000 + 32 AS size_bytes
  FROM orders
),
cells AS (SELECT * FROM licells UNION ALL SELECT * FROM ocells),
pscan AS (
  SELECT keyspace, tbl, sstable_id, key, key_formatted,
    CAST(SUM(size_bytes) AS BIGINT) AS size,
    CAST(COUNT(DISTINCT clustering) AS BIGINT) AS row_count,
    CAST(COUNT(DISTINCT CASE WHEN is_tombstone THEN clustering END) AS BIGINT) AS row_delete_count,
    CAST(COUNT(CASE WHEN kind = 'CELL' THEN 1 END) AS BIGINT) AS cell_count,
    CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstone_count,
    CAST(SUM(CASE WHEN is_tombstone AND local_deletion_time_s < $gcBeforeS THEN 1 ELSE 0 END) AS BIGINT) AS droppable_tombstone_count,
    CAST(SUM(CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 1 ELSE 0 END) AS BIGINT) AS range_tombstone_count,
    CAST(SUM(CASE WHEN is_live THEN 1 ELSE 0 END) AS BIGINT) AS live_cell_count,
    CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT) AS expiring_cell_count,
    CAST(SUM(CASE WHEN is_counter THEN 1 ELSE 0 END) AS BIGINT) AS counter_cell_count,
    CAST(MIN(timestamp_us) AS BIGINT) AS min_timestamp_us,
    CAST(MAX(timestamp_us) AS BIGINT) AS max_timestamp_us,
    CAST(MIN(local_deletion_time_s) AS BIGINT) AS min_local_deletion_time_s,
    CAST(MAX(local_deletion_time_s) AS BIGINT) AS max_local_deletion_time_s
  FROM cells GROUP BY 1, 2, 3, 4, 5
),
parts AS (
  SELECT keyspace, tbl, key, key_formatted,
    CAST(COUNT(*) AS BIGINT) AS table_count,
    CAST(SUM(size) AS BIGINT) AS size,
    CAST(SUM(row_count) AS BIGINT) AS row_count,
    CAST(SUM(row_delete_count) AS BIGINT) AS row_delete_count,
    CAST(SUM(cell_count) AS BIGINT) AS cell_count,
    CAST(SUM(tombstone_count) AS BIGINT) AS tombstone_count,
    CAST(SUM(droppable_tombstone_count) AS BIGINT) AS droppable_tombstone_count
  FROM pscan GROUP BY 1, 2, 3, 4
),
liparts AS (SELECT * FROM parts WHERE tbl = 'lineitem'),
lipscan AS (SELECT * FROM pscan WHERE tbl = 'lineitem'),
meta AS (
  SELECT keyspace, tbl, sstable_id,
    CAST(COUNT(*) AS BIGINT) AS partition_count,
    CAST(SUM(size) AS BIGINT) AS uncompressed_length,
    CAST(MAX(size) AS BIGINT) AS max_partition_size,
    CAST(SUM(cell_count) AS BIGINT) AS cell_count,
    CAST(MIN(min_timestamp_us) AS BIGINT) AS min_timestamp_us,
    CAST(MAX(max_timestamp_us) AS BIGINT) AS max_timestamp_us,
    CAST(MIN(min_local_deletion_time_s) AS BIGINT) AS min_local_deletion_time_s,
    CAST(MAX(max_local_deletion_time_s) AS BIGINT) AS max_local_deletion_time_s,
    CAST(MAX(cell_count) AS BIGINT) AS max_column_count,
    CAST(SUM(droppable_tombstone_count) AS BIGINT) AS droppable_tombstone_count,
    CAST(floor(MAX(max_timestamp_us) / 1000) + 3600000 AS BIGINT) AS file_timestamp_ms,
    CAST(COUNT(*) AS BIGINT) AS estimated_keys,
    CAST(floor(SUM(cell_count) / COUNT(*)) AS BIGINT) AS avg_column_count,
    CAST(floor(SUM(droppable_tombstone_count) * 1000 / SUM(cell_count)) AS BIGINT)
      AS droppable_ratio_x1000,
    CAST(floor(SUM(size) * 3 / 5) AS BIGINT) AS disk_length,
    CAST(floor(SUM(size) / COUNT(*)) AS BIGINT) AS avg_partition_size,
    CAST(right(sstable_id, 1) AS INT) AS level,
    (CAST(right(sstable_id, 1) AS INT) % 2 = 0) AS is_repaired,
    CASE WHEN CAST(right(sstable_id, 1) AS INT) % 2 = 0
         THEN CAST(floor(MAX(max_timestamp_us) / 1000) AS BIGINT) END AS repaired_at_ms,
    CASE WHEN CAST(right(sstable_id, 1) AS INT) % 3 = 0 THEN 'STCS'
         WHEN CAST(right(sstable_id, 1) AS INT) % 3 = 1 THEN 'LCS'
         ELSE 'TWCS' END AS compaction_strategy
  FROM pscan GROUP BY 1, 2, 3
)"""

  /** The default-gc_grace CTE prefix every non-parameterized query uses. */
  val fixtures: String = fixturesAt(GcBeforeS)

  /** Mirror of TextStats.intlDocs: the deterministic multilingual
    * augmentation (2/3/4-byte UTF-8 planted on known doc_id residues).
    * DuckDB `length`/`replace`/`string_split` operate on characters like
    * Spark's — `strlen` would count bytes and break every planted doc. */
  private val intlCte: String = """intl AS (
  SELECT doc_id, lang, source, n_chars,
    CASE WHEN doc_id % 5 = 0
           THEN 'Über größere Qualität — schöne Grüße außerdem. ' || text
         WHEN doc_id % 5 = 1 THEN text || ' voilà déjà façon où ça réussi'
         WHEN doc_id % 5 = 2 THEN text || ' 数据 清洗 模型 训练 语料'
         WHEN doc_id % 5 = 3 THEN text || ' emoji 🦉🦉 fin'
         ELSE text END AS text
  FROM documents
)"""

  /** Shared q67/q68 derivation — the real big-format Data.db roundtrip
    * recomputed from parquet under CassandraDataFixture's representation
    * mapping (no TTL on deleted cells; size = value length = size_bytes
    * % 61, 0 when deleted or a marker). */
  private val cassandraRoundtripSql: String = s"""WITH $fixtures
SELECT sstable_id, CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(SUM(CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 1 ELSE 0 END) AS BIGINT) AS markers,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM((CASE WHEN is_tombstone THEN -1 ELSE ttl_s END) % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT) AS expiring,
  CAST(SUM(CASE WHEN is_live THEN 1 ELSE 0 END) AS BIGINT) AS live,
  CAST(SUM(CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END) AS BIGINT) AS value_sum,
  CAST(SUM(length(column_name) % 1000003) AS BIGINT) AS colname_len_sum
FROM licells GROUP BY 1 ORDER BY 1"""

  /** Shared q48/q83 derivation: purge top-10 recomputed from parquet
    * (same as q16's), with the Spark side running the whole LWW-merge
    * pipeline off raw binary files — engine-format (q48) or real-format
    * compressed Cassandra sstables (q83). */
  private lazy val purgeTopFromRawSql: String = s"""WITH $fixtures,
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, sstable_id DESC, size_bytes DESC,
             is_tombstone DESC, local_deletion_time_s DESC) AS rn
  FROM licells
),
purge AS (
  SELECT key, key_formatted,
    CAST(COUNT(DISTINCT sstable_id) AS BIGINT) AS table_count,
    CAST(SUM(size_bytes) AS BIGINT) AS size,
    CAST(SUM(CASE WHEN rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
         THEN size_bytes ELSE 0 END) AS BIGINT) AS merged_size
  FROM ranked GROUP BY 1, 2
)
SELECT key, key_formatted, table_count, size,
       size - merged_size AS reclaimable
FROM purge ORDER BY reclaimable DESC, size DESC, key LIMIT 10"""

  /** Shared q44/q71 derivation: cfstats totals recomputed from parquet
    * (same as q15's), with the Spark side running the whole pipeline off
    * raw binary files — engine-format (q44) or real-format compressed
    * Cassandra sstables (q71). */
  private lazy val cfstatsTotalsFromRawSql: String = s"""WITH $fixtures
SELECT CAST(COUNT(*) AS BIGINT) AS partition_count,
  CAST(SUM(row_count) AS BIGINT) AS row_count,
  CAST(SUM(row_delete_count) AS BIGINT) AS row_delete_count,
  CAST(SUM(cell_count) AS BIGINT) AS cell_count,
  CAST(SUM(tombstone_count) AS BIGINT) AS tombstone_count,
  CAST(SUM(droppable_tombstone_count) AS BIGINT) AS droppable_tombstone_count
FROM liparts"""

  /** Shared q88/q89 derivation: the full 2-iteration integer-exact Lloyd's
    * trace (init = vec_id < 8, squared-euclidean bigint distances with the
    * (d2, cid) tie rule, floor(mean) centroid updates), ending at the
    * converged centroids `c2 (cid, cv, cn2)`. */
  val kmeansTrace: String = """
c0 AS (SELECT vec_id AS cid, qv AS cv, norm2 AS cn2 FROM qn WHERE vec_id < 8),
d1 AS (
  SELECT q.vec_id, q.qv, q.norm2, c.cid,
    q.norm2 + c.cn2 - 2 * CAST(list_sum(list_transform(
      range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])) AS BIGINT) AS d2
  FROM qn q CROSS JOIN c0 c
),
a1 AS (
  SELECT vec_id, qv, norm2, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d1) WHERE rn = 1
),
u1 AS (
  SELECT cid, pos, CAST(floor(SUM(v) / COUNT(*)) AS BIGINT) AS cvp
  FROM (SELECT cid, UNNEST(qv) AS v, UNNEST(range(1, len(qv) + 1)) AS pos
        FROM a1)
  GROUP BY 1, 2
),
c1l AS (SELECT cid, list(cvp ORDER BY pos) AS cv FROM u1 GROUP BY cid),
c1 AS (SELECT cid, cv,
  CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn2 FROM c1l),
d2i AS (
  SELECT q.vec_id, q.qv, q.norm2, c.cid,
    q.norm2 + c.cn2 - 2 * CAST(list_sum(list_transform(
      range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])) AS BIGINT) AS d2
  FROM qn q CROSS JOIN c1 c
),
a2 AS (
  SELECT vec_id, qv, norm2, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d2i) WHERE rn = 1
),
u2 AS (
  SELECT cid, pos, CAST(floor(SUM(v) / COUNT(*)) AS BIGINT) AS cvp
  FROM (SELECT cid, UNNEST(qv) AS v, UNNEST(range(1, len(qv) + 1)) AS pos
        FROM a2)
  GROUP BY 1, 2
),
c2l AS (SELECT cid, list(cvp ORDER BY pos) AS cv FROM u2 GROUP BY cid),
c2 AS (SELECT cid, cv,
  CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn2 FROM c2l)"""

  /** One BPE training step for the q90 oracle: pair counts over the
    * previous vocab `v{k-1}`, the argmax rule `m{k}` under the total
    * (freq desc, left, right) order, and the post-merge vocab `v{k}` via a
    * recursive CTE that repeatedly merges the LEFTMOST (left, right)
    * occurrence — provably equal to the engine's greedy left-to-right fold
    * (a merged symbol can never retrigger the same rule: merged == left
    * would need an empty right). MATERIALIZED keeps DuckDB from
    * re-inlining the chain combinatorially. */
  private def bpeStep(k: Int): String = s"""
p$k AS MATERIALIZED (
  SELECT syms[i] AS l, syms[i+1] AS r, CAST(SUM(freq) AS BIGINT) AS f
  FROM v${k - 1}, UNNEST(range(1, len(syms))) t(i)
  GROUP BY 1, 2
),
m$k AS MATERIALIZED (
  SELECT l, r, l || r AS m, f FROM p$k ORDER BY f DESC, l, r LIMIT 1),
r$k AS (
  SELECT word, freq, syms FROM v${k - 1}
  UNION ALL
  SELECT word, freq,
    list_concat(list_concat(syms[1:i-1], [m]), syms[i+2:]) AS syms
  FROM (
    SELECT w.word, w.freq, w.syms, m.m,
      list_filter(range(1, len(w.syms)),
        i -> w.syms[i] = m.l AND w.syms[i+1] = m.r)[1] AS i
    FROM r$k w CROSS JOIN m$k m
  ) WHERE i IS NOT NULL
),
v$k AS MATERIALIZED (
  SELECT w.word, w.freq, w.syms FROM r$k w CROSS JOIN m$k m
  WHERE len(list_filter(range(1, len(w.syms)),
    i -> w.syms[i] = m.l AND w.syms[i+1] = m.r)) = 0
)"""

  private def bpeStepReport(k: Int): String = s"""
SELECT $k AS step, m.l AS left_sym, m.r AS right_sym, m.m AS merged,
  m.f AS pair_freq,
  (SELECT CAST(SUM(freq * len(syms)) AS BIGINT) FROM v$k) AS tokens_after,
  (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) FROM v$k, UNNEST(syms) t(s))
    AS vocab_syms
FROM m$k m"""

  /** Mirror of Dedup.corpus. */
  val corpus: String = """
corpus AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, lang, source, n_chars
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 2000000, text || ' graft near duplicate suffix',
         lang, source, n_chars + 28
  FROM documents WHERE doc_id % 7 = 0
)"""

  /** Mirror of Dedup.shingles over corpus (DuckDB list slices are 1-based
    * inclusive; range() is upper-exclusive, hence the +-1 offsets vs the
    * Spark sequence/slice form — both yield i in 1..max(len-4, 1)). */
  val shingles: String = """
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS g
  FROM toks, UNNEST(range(1, greatest(len(w) - 3, 2))) AS t(i)
)"""

  /** Shared q61/q116 derivation — benchmark contamination (benchMod 101)
    * over the dup-injected corpus: the exact/near copies of benchmark docs
    * are the leaks; 5-gram overlap of each non-benchmark doc vs the
    * benchmark set. q116's bloom prefilter must not change the relation
    * (no false negatives; its verify join removes the false positives). */
  private lazy val contaminationSql: String = s"""WITH $corpus, $shingles,
bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 101 = 0),
cand AS (SELECT doc_id, g FROM sh WHERE doc_id % 101 <> 0),
totals AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS shingles
           FROM cand GROUP BY 1),
m AS (
  SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS matched
  FROM cand c JOIN bench b ON c.g = b.g GROUP BY 1
)
SELECT m.doc_id, m.matched, t.shingles,
  CAST(floor(m.matched * 1000 / t.shingles) AS BIGINT) AS contamination_x1000
FROM m JOIN totals t ON m.doc_id = t.doc_id
ORDER BY m.doc_id"""

  /** Shared q89/q118 derivation - IVF over the trained k-means
    * centroids; the persisted form reads the same inverted file back
    * from bucket-partitioned parquet. */
  private lazy val ivfKmeansSql: String = s"""WITH $quantized, $kmeansTrace,
cass AS (
  SELECT vec_id AS neighbor_id, qv AS qb, norm2 AS nb2, cid AS bucket FROM (
    SELECT q.vec_id, q.qv, q.norm2, c.cid,
      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        q.norm2 + c.cn2 - 2 * CAST(list_sum(list_transform(
          range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])) AS BIGINT),
        c.cid) AS rn
    FROM qn q CROSS JOIN c2 c WHERE q.vec_id >= 8) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, qv AS qa, norm2 AS na2, cid AS bucket FROM (
    SELECT q.vec_id, q.qv, q.norm2, c.cid,
      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        q.norm2 + c.cn2 - 2 * CAST(list_sum(list_transform(
          range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])) AS BIGINT),
        c.cid) AS rn
    FROM qn q CROSS JOIN c2 c WHERE q.vec_id < 8) WHERE rn <= 2
),
scored AS (
  SELECT query_id, neighbor_id,
    CAST(list_sum(list_transform(range(1, len(qa) + 1), i -> qa[i] * qb[i])) AS DOUBLE)
      / sqrt(CAST(na2 * nb2 AS DOUBLE)) AS cos
  FROM probes p JOIN cass s USING (bucket)
),
rk AS (
  SELECT query_id, neighbor_id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
  CAST(floor(cos * 1000) AS BIGINT) AS cos_x1000
FROM rk WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Mirror of Similarity.quantize. */
  val quantized: String = """
qe AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
qn AS (
  SELECT vec_id, qv,
    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS norm2
  FROM qe
)"""

  /** R-6 percentile (pos = p·(n+1), linear interpolation) over the `sorted`
    * CTE — the exact double expression ReservoirHistogram.percentileR6
    * evaluates, so floor(·×1000) matches bit-for-bit. */
  private def r6pct(p: String): String =
    s"""(SELECT l.v + ($p * (nn.n + 1) - floor($p * (nn.n + 1))) * (u.v - l.v)
  FROM nn, sorted l, sorted u
  WHERE l.rk = CAST(floor($p * (nn.n + 1)) AS BIGINT) AND u.rk = l.rk + 1)"""

  private val base: Map[String, String] = Map(
    "q00_catalog" -> s"""WITH $fixtures
SELECT keyspace, tbl FROM meta GROUP BY 1, 2 ORDER BY 1, 2""",

    "q19_pstats_filtered" -> s"""WITH $fixtures,
fparts AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS table_count,
         CAST(SUM(size) AS BIGINT) AS size
  FROM lipscan WHERE sstable_id IN ('sst-0', 'sst-2', 'sst-4')
  GROUP BY 1
)
SELECT ${Dist.sql("size")},
    CAST(MIN(table_count) AS BIGINT) AS table_count_min,
    CAST(MAX(table_count) AS BIGINT) AS table_count_max
FROM fparts""",

    "q34_sstables_strategy_order" -> s"""WITH $fixtures
SELECT sstable_id, level, max_timestamp_us,
  CAST(row_number() OVER (ORDER BY max_timestamp_us, sstable_id) AS BIGINT) AS twcs_rank,
  CAST(row_number() OVER (ORDER BY level, sstable_id) AS BIGINT) AS lcs_rank,
  CAST(row_number() OVER (ORDER BY sstable_id) AS BIGINT) AS stcs_rank
FROM meta WHERE tbl = 'lineitem' ORDER BY sstable_id""",

    "q01_pstats_size_dist" -> s"""WITH $fixtures
SELECT ${Dist.sql("size")},
    CAST(MIN(table_count) AS BIGINT) AS table_count_min,
    CAST(MAX(table_count) AS BIGINT) AS table_count_max,
    CAST(floor(SUM(table_count) * 100 / COUNT(*)) AS BIGINT) AS table_count_avg_x100
FROM liparts""",

    // q158: the forecast re-derived from the cells relation — same
    // shifted floor division (nonnegative dividend, so truncation ==
    // floor in both engines), same cumulative windows.
    "q158_cfstats_ttl_forecast" -> s"""WITH $fixtures,
exp AS (
  SELECT tbl,
    ((timestamp_us // 1000000 + ttl_s) - 345600000 + 863136000)
      // 2592000 - 333 AS win,
    size_bytes
  FROM cells WHERE is_expiring
),
g AS (
  SELECT tbl, win, CAST(COUNT(*) AS BIGINT) AS cells,
    CAST(SUM(size_bytes) AS BIGINT) AS bytes
  FROM exp GROUP BY 1, 2
),
w AS (
  SELECT *,
    CAST(SUM(bytes) OVER (PARTITION BY tbl ORDER BY win
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_bytes,
    CAST(SUM(bytes) OVER (PARTITION BY tbl) AS BIGINT) AS tot
  FROM g
)
SELECT tbl, CAST(win AS BIGINT) AS window_30d, cells, bytes, cum_bytes,
  CAST(floor(cum_bytes * 1000 / tot) AS BIGINT) AS cum_x1000
FROM w ORDER BY tbl, window_30d""",

    // q144: the log-histogram sketch replayed — same bit-length buckets
    // (length(bin(x)) parity is the q93-established convention), same
    // cumulative pick, same integer interpolation (`//` on nonnegative
    // operands == Spark `div`; `<<` fully parenthesized — DuckDB shifts
    // bind looser than +).
    "q144_pstats_logq" -> s"""WITH $fixtures,
h AS (SELECT sstable_id, CAST(length(bin(size)) AS BIGINT) AS bucket,
        CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lipscan GROUP BY 1, 2),
c AS (SELECT *,
        SUM(cnt) OVER (PARTITION BY sstable_id ORDER BY bucket
          ROWS UNBOUNDED PRECEDING) AS cum,
        SUM(cnt) OVER (PARTITION BY sstable_id) AS n
      FROM h),
q500 AS (SELECT *, row_number() OVER (PARTITION BY sstable_id
    ORDER BY bucket) AS rn FROM c WHERE cum * 1000 >= n * 500),
q950 AS (SELECT *, row_number() OVER (PARTITION BY sstable_id
    ORDER BY bucket) AS rn FROM c WHERE cum * 1000 >= n * 950),
q990 AS (SELECT *, row_number() OVER (PARTITION BY sstable_id
    ORDER BY bucket) AS rn FROM c WHERE cum * 1000 >= n * 990),
est AS (
  SELECT a.sstable_id, CAST(a.n AS BIGINT) AS n,
    CAST((CAST(1 AS BIGINT) << (CAST(a.bucket AS INT) - 1))
      + (((CAST(1 AS BIGINT) << (CAST(a.bucket AS INT) - 1)) - 1)
         * (((500 * a.n + 999) // 1000) - (a.cum - a.cnt))) // a.cnt
      AS BIGINT) AS p500_est,
    CAST((CAST(1 AS BIGINT) << (CAST(b.bucket AS INT) - 1))
      + (((CAST(1 AS BIGINT) << (CAST(b.bucket AS INT) - 1)) - 1)
         * (((950 * b.n + 999) // 1000) - (b.cum - b.cnt))) // b.cnt
      AS BIGINT) AS p950_est,
    CAST((CAST(1 AS BIGINT) << (CAST(cc.bucket AS INT) - 1))
      + (((CAST(1 AS BIGINT) << (CAST(cc.bucket AS INT) - 1)) - 1)
         * (((990 * cc.n + 999) // 1000) - (cc.cum - cc.cnt))) // cc.cnt
      AS BIGINT) AS p990_est
  FROM (SELECT * FROM q500 WHERE rn = 1) a
  JOIN (SELECT * FROM q950 WHERE rn = 1) b ON a.sstable_id = b.sstable_id
  JOIN (SELECT * FROM q990 WHERE rn = 1) cc ON a.sstable_id = cc.sstable_id
)
SELECT * FROM est ORDER BY sstable_id""",

    // the reservoir aggregator's EXACT accumulators (q42's non-randomized
    // half): count/total/min/max are tracked outside the sample
    // (Histogram.java:57-74) and mean = exactTotal/exactCount
    // (Snapshot.java:66-68) — all recomputable relationally.
    "q42b_reservoir_exact" -> s"""WITH $fixtures
SELECT CAST(COUNT(*) AS BIGINT) AS count,
  CAST(SUM(size) AS BIGINT) AS total,
  CAST(MIN(size) AS BIGINT) AS min,
  CAST(MAX(size) AS BIGINT) AS max,
  CAST(floor(SUM(size) * 1000 / COUNT(*)) AS BIGINT) AS mean_x1000
FROM liparts""",

    // q42 (official, seeded): a full DuckDB replay of the engine's
    // deterministic Vitter-R fold, Java LCG arithmetic included. Because
    // the fold's slot choice r_i = |Random(i).nextLong()| % i depends only
    // on the 1-based element index i (seed = running count), the final
    // reservoir is closed-form relational: slot s = value of the LAST
    // i > 1028 with r_i = s, else the initial fill v_{s+1}. The LCG is
    // java.util.Random verbatim: scramble seed^0x5DEECE66D, two
    // next(32) = ((seed*0x5DEECE66D + 0xB) mod 2^48) >>> 16 steps (signed
    // 32-bit), nextLong = hi*2^32 + lo with signed-64 wrap — all exact in
    // HUGEINT. A single wrong LCG step, slot, or tie-break breaks the hash.
    "q42_reservoir_dist" -> s"""WITH $fixtures,
vals AS (SELECT size AS v,
  CAST(row_number() OVER (ORDER BY key) AS BIGINT) AS i FROM liparts),
r0 AS (SELECT i, v,
  (CAST(xor(i, 25214903917) AS HUGEINT) * 25214903917 + 11)
    % 281474976710656 AS s1
  FROM vals WHERE i > 1028),
r1 AS (SELECT i, v, s1,
  (s1 * 25214903917 + 11) % 281474976710656 AS s2 FROM r0),
r2 AS (SELECT i, v,
  s1 // 65536 - CASE WHEN s1 // 65536 >= 2147483648
    THEN 4294967296 ELSE 0 END AS hs,
  s2 // 65536 - CASE WHEN s2 // 65536 >= 2147483648
    THEN 4294967296 ELSE 0 END AS ls
  FROM r1),
r3 AS (SELECT i, v,
  CAST(abs((((hs * 4294967296 + ls + 9223372036854775808)
    % 18446744073709551616) + 18446744073709551616)
    % 18446744073709551616 - 9223372036854775808) % i AS BIGINT) AS r
  FROM r2),
hits AS (SELECT slot, v FROM (
  SELECT r AS slot, v,
    row_number() OVER (PARTITION BY r ORDER BY i DESC) AS rn
  FROM r3 WHERE r < 1028) t WHERE rn = 1),
init AS (SELECT i - 1 AS slot, v FROM vals WHERE i <= 1028),
samp AS (SELECT COALESCE(h.v, init.v) AS v
  FROM init LEFT JOIN hits h ON init.slot = h.slot),
sorted AS (SELECT v,
  CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS rk FROM samp),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM sorted),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
  CAST(SUM(v) AS BIGINT) AS tot, CAST(MIN(v) AS BIGINT) AS mn,
  CAST(MAX(v) AS BIGINT) AS mx FROM vals)
SELECT cnt AS count, tot AS total, mn AS min, mx AS max,
  CAST(floor(tot * 1000 / cnt) AS BIGINT) AS mean_x1000,
  CAST(floor(${r6pct("0.50")} * 1000) AS BIGINT) AS p50_x1000,
  CAST(floor(${r6pct("0.75")} * 1000) AS BIGINT) AS p75_x1000,
  CAST(floor(${r6pct("0.90")} * 1000) AS BIGINT) AS p90_x1000,
  CAST(floor(${r6pct("0.95")} * 1000) AS BIGINT) AS p95_x1000,
  CAST(floor(${r6pct("0.99")} * 1000) AS BIGINT) AS p99_x1000
FROM stats""",

    "q02_pstats_top_size" -> s"""WITH $fixtures
SELECT key, key_formatted, size, table_count FROM liparts
ORDER BY size DESC, key LIMIT 10""",

    "q03_pstats_top_tables" -> s"""WITH $fixtures
SELECT key, key_formatted, size, table_count FROM liparts
ORDER BY table_count DESC, size DESC, key LIMIT 10""",

    "q04_pstats_sstables" -> s"""WITH $fixtures
SELECT sstable_id, partition_count, avg_partition_size, max_partition_size,
       uncompressed_length
FROM meta WHERE tbl = 'lineitem' ORDER BY sstable_id""",

    "q05_summary" -> s"""WITH $fixtures
SELECT keyspace, tbl,
  CAST(COUNT(*) AS BIGINT) AS sstable_count,
  CAST(SUM(disk_length) AS BIGINT) AS disk_length,
  CAST(SUM(uncompressed_length) AS BIGINT) AS uncompressed_length,
  CAST(SUM(CASE WHEN is_repaired THEN 1 ELSE 0 END) AS BIGINT) AS repaired_count,
  CAST(SUM(CASE WHEN is_repaired THEN uncompressed_length ELSE 0 END) AS BIGINT) AS repaired_length,
  CAST(MAX(CASE WHEN is_repaired THEN repaired_at_ms END) AS BIGINT) AS max_repaired_at_ms,
  CAST(floor(SUM(CASE WHEN is_repaired THEN uncompressed_length ELSE 0 END) * 100
       / SUM(uncompressed_length)) AS BIGINT) AS repair_pct
FROM meta GROUP BY 1, 2 ORDER BY 1, 2""",

    "q06_sstables_meta" -> s"""WITH $fixtures
SELECT sstable_id, level, is_repaired, compaction_strategy,
  min_timestamp_us, max_timestamp_us,
  max_timestamp_us - min_timestamp_us AS duration_us,
  file_timestamp_ms, min_local_deletion_time_s, max_local_deletion_time_s,
  repaired_at_ms, partition_count, estimated_keys, cell_count,
  avg_column_count, max_column_count,
  droppable_tombstone_count, droppable_ratio_x1000,
  uncompressed_length, disk_length, max_partition_size, avg_partition_size
FROM meta WHERE tbl = 'lineitem' ORDER BY sstable_id""",

    "q07_cfstats_rows_dist" -> s"""WITH $fixtures
SELECT ${Dist.sql("row_count")} FROM liparts""",

    "q08_cfstats_cells_dist" -> s"""WITH $fixtures
SELECT ${Dist.sql("cell_count")} FROM liparts""",

    "q09_cfstats_tomb_dist" -> s"""WITH $fixtures
SELECT ${Dist.sql("tombstone_count")} FROM liparts WHERE tombstone_count > 0""",

    "q10_cfstats_top_wide" -> s"""WITH $fixtures
SELECT key, key_formatted, cell_count, size, row_count FROM liparts
ORDER BY cell_count DESC, size DESC, key LIMIT 10""",

    "q11_cfstats_top_tombstones" -> s"""WITH $fixtures
SELECT key, key_formatted, tombstone_count, droppable_tombstone_count, size
FROM liparts WHERE tombstone_count > 0
ORDER BY tombstone_count DESC, size DESC, key LIMIT 10""",

    "q12_cfstats_top_deleted" -> s"""WITH $fixtures
SELECT key, key_formatted, row_delete_count, size
FROM liparts WHERE row_delete_count > 0
ORDER BY row_delete_count DESC, size DESC, key LIMIT 10""",

    // flat mirror of the TtlMapAggregator output: per-(key, ttl) counts plus
    // per-key distinct-TTL and cell totals as window aggregates.
    "q37_ttl_map_agg" -> s"""WITH $fixtures,
h AS (
  SELECT key, ttl_s, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM licells WHERE kind = 'CELL' GROUP BY 1, 2
)
SELECT key, ttl_s, cnt,
  CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS distinct_ttls,
  CAST(SUM(cnt) OVER (PARTITION BY key) AS BIGINT) AS cells
FROM h ORDER BY key, ttl_s""",

    "q13_cfstats_ttl_hist" -> s"""WITH $fixtures
SELECT ttl_s, CAST(COUNT(*) AS BIGINT) AS cell_count
FROM licells WHERE kind = 'CELL' GROUP BY ttl_s ORDER BY ttl_s""",

    "q14_cfstats_sstable_stats" -> s"""WITH $fixtures
SELECT sstable_id,
  CAST(COUNT(*) AS BIGINT) AS partition_count,
  CAST(SUM(row_count) AS BIGINT) AS row_count,
  CAST(SUM(row_delete_count) AS BIGINT) AS row_delete_count,
  CAST(SUM(cell_count) AS BIGINT) AS cell_count,
  CAST(SUM(live_cell_count) AS BIGINT) AS live_cell_count,
  CAST(SUM(expiring_cell_count) AS BIGINT) AS expiring_cell_count,
  CAST(SUM(counter_cell_count) AS BIGINT) AS counter_cell_count,
  CAST(SUM(tombstone_count) AS BIGINT) AS tombstone_count,
  CAST(SUM(droppable_tombstone_count) AS BIGINT) AS droppable_tombstone_count,
  CAST(SUM(range_tombstone_count) AS BIGINT) AS range_tombstone_count,
  CAST(floor(SUM(live_cell_count) * 100 / greatest(SUM(cell_count), 1)) AS BIGINT) AS liveness_pct
FROM lipscan GROUP BY 1 ORDER BY 1""",

    "q15_cfstats_totals" -> s"""WITH $fixtures
SELECT CAST(COUNT(*) AS BIGINT) AS partition_count,
  CAST(SUM(row_count) AS BIGINT) AS row_count,
  CAST(SUM(row_delete_count) AS BIGINT) AS row_delete_count,
  CAST(SUM(cell_count) AS BIGINT) AS cell_count,
  CAST(SUM(tombstone_count) AS BIGINT) AS tombstone_count,
  CAST(SUM(droppable_tombstone_count) AS BIGINT) AS droppable_tombstone_count
FROM liparts""",

    "q16_purge_top" -> s"""WITH $fixtures,
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, sstable_id DESC, size_bytes DESC,
             is_tombstone DESC, local_deletion_time_s DESC) AS rn
  FROM licells
),
purge AS (
  SELECT key, key_formatted,
    CAST(COUNT(DISTINCT sstable_id) AS BIGINT) AS table_count,
    CAST(SUM(size_bytes) AS BIGINT) AS size,
    CAST(SUM(CASE WHEN rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
         THEN size_bytes ELSE 0 END) AS BIGINT) AS merged_size
  FROM ranked GROUP BY 1, 2
)
SELECT key, key_formatted, table_count, size,
       size - merged_size AS reclaimable
FROM purge ORDER BY reclaimable DESC, size DESC, key LIMIT 10""",

    "q17_purge_totals" -> s"""WITH $fixtures,
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, sstable_id DESC, size_bytes DESC,
             is_tombstone DESC, local_deletion_time_s DESC) AS rn
  FROM licells
),
purge AS (
  SELECT key,
    CAST(SUM(size_bytes) AS BIGINT) AS size,
    CAST(SUM(CASE WHEN rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
         THEN size_bytes ELSE 0 END) AS BIGINT) AS merged_size
  FROM ranked GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS partition_count,
  CAST(SUM(CASE WHEN size > merged_size THEN 1 ELSE 0 END) AS BIGINT) AS partitions_with_reclaimable,
  CAST(SUM(size) AS BIGINT) AS total_size,
  CAST(SUM(size - merged_size) AS BIGINT) AS total_reclaimable
FROM purge""",

    // q17 at a NON-default gc_grace (500 days → gcBefore = day 3500): the
    // engine threads gcBeforeS through Purge (PurgeStatisticBackend.java:47
    // reads it per table), the oracle recomputes with the same cutoff — a
    // tombstone deleted on day 3000 is droppable here but not at default.
    "q57_purge_gc_totals" -> s"""WITH ${fixturesAt(GcAltS)},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, sstable_id DESC, size_bytes DESC,
             is_tombstone DESC, local_deletion_time_s DESC) AS rn
  FROM licells
),
purge AS (
  SELECT key,
    CAST(SUM(size_bytes) AS BIGINT) AS size,
    CAST(SUM(CASE WHEN rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcAltS)
         THEN size_bytes ELSE 0 END) AS BIGINT) AS merged_size
  FROM ranked GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS partition_count,
  CAST(SUM(CASE WHEN size > merged_size THEN 1 ELSE 0 END) AS BIGINT) AS partitions_with_reclaimable,
  CAST(SUM(size) AS BIGINT) AS total_size,
  CAST(SUM(size - merged_size) AS BIGINT) AS total_reclaimable
FROM purge""",

    // q15 at the same non-default gc_grace: the droppable counter moves with
    // the cutoff while every other total stays — checked field by field.
    "q58_cfstats_gc_totals" -> s"""WITH ${fixturesAt(GcAltS)}
SELECT CAST(COUNT(*) AS BIGINT) AS partition_count,
  CAST(SUM(row_count) AS BIGINT) AS row_count,
  CAST(SUM(row_delete_count) AS BIGINT) AS row_delete_count,
  CAST(SUM(cell_count) AS BIGINT) AS cell_count,
  CAST(SUM(tombstone_count) AS BIGINT) AS tombstone_count,
  CAST(SUM(droppable_tombstone_count) AS BIGINT) AS droppable_tombstone_count
FROM liparts""",

    // the typed-Aggregator purge (q38) carries the SAME LWW total order as
    // the window form (PurgeAggregator.beats), so one SQL derivation checks
    // both shapes; this is the per-key (un-topped) purge frame.
    "q38_purge_agg" -> s"""WITH $fixtures,
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, sstable_id DESC, size_bytes DESC,
             is_tombstone DESC, local_deletion_time_s DESC) AS rn
  FROM licells
)
SELECT key, 'key-' || key AS key_formatted,
  CAST(COUNT(DISTINCT sstable_id) AS BIGINT) AS table_count,
  CAST(SUM(size_bytes) AS BIGINT) AS size,
  CAST(SUM(CASE WHEN rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
       THEN size_bytes ELSE 0 END) AS BIGINT) AS merged_size,
  CAST(SUM(size_bytes) AS BIGINT) -
  CAST(SUM(CASE WHEN rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
       THEN size_bytes ELSE 0 END) AS BIGINT) AS reclaimable
FROM ranked GROUP BY 1, 2 ORDER BY key""",

    // -f before the merge: ranks and sizes are computed over the filtered
    // cell stream only (ColumnFamilyBackend.java:80-89 semantics).
    "q45_purge_filtered" -> s"""WITH $fixtures,
fcells AS (SELECT * FROM licells WHERE sstable_id IN ('sst-1', 'sst-3', 'sst-5')),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, sstable_id DESC, size_bytes DESC,
             is_tombstone DESC, local_deletion_time_s DESC) AS rn
  FROM fcells
),
purge AS (
  SELECT key, key_formatted,
    CAST(COUNT(DISTINCT sstable_id) AS BIGINT) AS table_count,
    CAST(SUM(size_bytes) AS BIGINT) AS size,
    CAST(SUM(CASE WHEN rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
         THEN size_bytes ELSE 0 END) AS BIGINT) AS merged_size
  FROM ranked GROUP BY 1, 2
)
SELECT key, key_formatted, table_count, size,
       size - merged_size AS reclaimable
FROM purge ORDER BY reclaimable DESC, size DESC, key LIMIT 10""",

    // purge off raw Data.db files: same derivation as q16 — the binary
    // encode/parse roundtrip must be invisible to the purge semantics.
    "q48_purge_from_raw" -> purgeTopFromRawSql,

    "q18_index_offsets" -> s"""WITH $fixtures,
idx AS (
  SELECT sstable_id, key, size,
    CAST(COALESCE(SUM(size) OVER (PARTITION BY sstable_id ORDER BY key
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS position
  FROM lipscan
),
derived AS (
  SELECT sstable_id, size,
    COALESCE(lead(position) OVER (PARTITION BY sstable_id ORDER BY position),
      MAX(position + size) OVER (PARTITION BY sstable_id)) - position AS derived_size
  FROM idx
)
SELECT sstable_id, CAST(COUNT(*) AS BIGINT) AS entries,
  CAST(SUM(derived_size) AS BIGINT) AS derived_total,
  CAST(SUM(size) AS BIGINT) AS stored_total,
  CAST(SUM(CASE WHEN derived_size <> size THEN 1 ELSE 0 END) AS BIGINT) AS mismatches
FROM derived GROUP BY 1 ORDER BY 1""",

    // q156: the pushed count must equal the relational per-sstable
    // entry count — a skip-walk miscount (or a wrongly-pruned file)
    // lands here.
    "q156_pstats_pushdown_count" -> s"""WITH $fixtures
SELECT sstable_id, CAST(COUNT(*) AS BIGINT) AS entries
FROM lipscan GROUP BY 1 ORDER BY 1""",

    "q40_index_raw_roundtrip" -> s"""WITH $fixtures,
idx AS (
  SELECT sstable_id, key,
    CAST(COALESCE(SUM(size) OVER (PARTITION BY sstable_id ORDER BY key
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS position
  FROM lipscan
)
SELECT sstable_id, CAST(COUNT(*) AS BIGINT) AS entries,
  CAST(MIN(position) AS BIGINT) AS first_position,
  CAST(MAX(position) AS BIGINT) AS last_position,
  CAST(SUM(position % 1000003) AS BIGINT) AS positions_sum,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum
FROM idx GROUP BY 1 ORDER BY 1""",

    // X4 typed-key roundtrip: q40's shape over the composite-key fixture;
    // the rendered "orderkey:k<orderkey mod 97>" form is recomputed from
    // parquet, so every byte of the binary CompositeType decode is checked
    // (via the portable h60 checksum of the rendered string).
    "q59_index_composite_keys" -> s"""WITH $fixtures,
ck AS (
  SELECT sstable_id,
    CAST(key AS VARCHAR) || ':k' || CAST(key % 97 AS VARCHAR) AS key_str,
    CAST(COALESCE(SUM(size) OVER (PARTITION BY sstable_id ORDER BY key
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS position
  FROM lipscan
)
SELECT sstable_id, CAST(COUNT(*) AS BIGINT) AS entries,
  MIN(key_str) AS first_key, MAX(key_str) AS last_key,
  CAST(SUM(${h60("key_str")} % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(position % 1000003) AS BIGINT) AS positions_sum
FROM ck GROUP BY 1 ORDER BY 1""",

    // q63: rendered (uuid:int32:timestamp) composite keys recomputed
    // straight from parquet — uuid is the dashed md5 of the decimal key,
    // int32 = key%1000−500 (negatives render with the sign), timestamp =
    // key·1000 + key%997 ms rendered "yyyy-MM-dd HH:mm:ss.SSS" UTC (second
    // part via strftime, millis appended with lpad — strftime's
    // sub-second specifier is microseconds, which would not match Spark's
    // SSS).
    "q63_index_typed_keys" -> s"""WITH $fixtures,
tk AS (
  SELECT sstable_id,
    md5(CAST(key AS VARCHAR)) AS h,
    CAST(key % 1000 - 500 AS BIGINT) AS iv,
    key * 1000 + key % 997 AS ms,
    CAST(COALESCE(SUM(size) OVER (PARTITION BY sstable_id ORDER BY key
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS position
  FROM lipscan
),
ks AS (
  SELECT sstable_id, position,
    substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' || substr(h, 13, 4)
      || '-' || substr(h, 17, 4) || '-' || substr(h, 21, 12)
      || ':' || CAST(iv AS VARCHAR)
      || ':' || strftime(epoch_ms(ms), '%Y-%m-%d %H:%M:%S')
      || '.' || lpad(CAST(ms % 1000 AS VARCHAR), 3, '0') AS key_str
  FROM tk
)
SELECT sstable_id, CAST(COUNT(*) AS BIGINT) AS entries,
  MIN(key_str) AS first_key, MAX(key_str) AS last_key,
  CAST(SUM(${h60("key_str")} % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(position % 1000003) AS BIGINT) AS positions_sum
FROM ks GROUP BY 1 ORDER BY 1""",

    // per-sstable rollup of EVERY event field after the parquet → binary
    // Data.db → DSv2 roundtrip; recomputed here straight from parquet.
    // Sums are modular (% 1000003, matching SparkEntry.ChkMod): a raw
    // SUM(timestamp_us) overflows BIGINT in Spark past ~45k events/sstable.
    "q43_data_raw_roundtrip" -> s"""WITH $fixtures
SELECT sstable_id, CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(SUM(CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 1 ELSE 0 END) AS BIGINT) AS markers,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(ttl_s % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT) AS expiring,
  CAST(SUM(CASE WHEN is_counter THEN 1 ELSE 0 END) AS BIGINT) AS counters,
  CAST(SUM(CASE WHEN is_live THEN 1 ELSE 0 END) AS BIGINT) AS live,
  CAST(SUM(size_bytes % 1000003) AS BIGINT) AS size_sum
FROM licells GROUP BY 1 ORDER BY 1""",

    // REAL big-format Data.db roundtrip (q67 uncompressed, q68 the same
    // files LZ4-chunked behind a real CompressionInfo.db map — identical
    // oracle, so the compressed read must be byte-equivalent). The
    // representation mapping of CassandraDataFixture appears as CASE
    // expressions: a deleted cell carries no TTL in the real encoding
    // (reads back -1), and size_bytes is the parsed VALUE length —
    // size_bytes % 61 by construction, 0 for valueless (deleted/marker)
    // events. Counter bits are column-type-level in the real format and
    // deliberately not round-tripped.
    "q67_data_cassandra_roundtrip" -> cassandraRoundtripSql,
    "q68_data_compressed_roundtrip" -> cassandraRoundtripSql,
    // q128: the distributed export writes the SAME relation the q67/q68
    // fixtures hold, so the read-back rollup shares their oracle — a
    // write-side bug (ordering, framing, sidecars) breaks the hash.
    "q128_sstable_export" -> cassandraRoundtripSql,
    // q112: q67's derivation under the wide-partition remap (key%8 AS
    // key, original key AS clustering; marker names follow the reader's
    // 'range:'||clustering rule) — the Spark side reads the same relation
    // through MID-PARTITION ranges cut at promoted-index block boundaries.
    "q112_wide_partition_roundtrip" -> s"""WITH $fixtures,
wide AS (
  SELECT sstable_id, key % 8 AS wkey, key AS wclustering,
    CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 'range:' || key
         ELSE column_name END AS wcol,
    kind, timestamp_us, ttl_s, local_deletion_time_s,
    is_tombstone, is_expiring, is_live, size_bytes
  FROM licells
)
SELECT sstable_id, CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(SUM(CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 1 ELSE 0 END) AS BIGINT) AS markers,
  CAST(COUNT(DISTINCT wkey) AS BIGINT) AS partitions,
  CAST(SUM(wkey % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(wclustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM((CASE WHEN is_tombstone THEN -1 ELSE ttl_s END) % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT) AS expiring,
  CAST(SUM(CASE WHEN is_live THEN 1 ELSE 0 END) AS BIGINT) AS live,
  CAST(SUM(CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END) AS BIGINT) AS value_sum,
  CAST(SUM(length(wcol) % 1000003) AS BIGINT) AS colname_len_sum
FROM wide GROUP BY 1 ORDER BY 1""",
    // q114: the point-read path replayed relationally — present probes
    // (key%7==0) aggregate their cells across every sstable holding the
    // key; absent probes (the negations) must come back all-zero no
    // matter what the blooms false-positive on.
    "q114_point_get" -> s"""WITH $fixtures,
probes AS (
  SELECT DISTINCT key AS probe_key FROM licells WHERE key % 7 = 0 AND key > 0
  UNION ALL
  SELECT DISTINCT -key FROM licells WHERE key % 7 = 0 AND key > 0
),
hits AS (
  SELECT key,
    CAST(COUNT(DISTINCT sstable_id) AS BIGINT) AS found_sstables,
    CAST(COUNT(*) AS BIGINT) AS events,
    CAST(SUM(CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END) AS BIGINT) AS value_sum,
    CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum
  FROM licells WHERE key % 7 = 0 AND key > 0 GROUP BY 1
)
SELECT probe_key,
  CAST(COALESCE(found_sstables, 0) AS BIGINT) AS found_sstables,
  CAST(COALESCE(events, 0) AS BIGINT) AS events,
  CAST(COALESCE(value_sum, 0) AS BIGINT) AS value_sum,
  CAST(COALESCE(ts_sum, 0) AS BIGINT) AS ts_sum
FROM probes LEFT JOIN hits ON probes.probe_key = hits.key
ORDER BY probe_key""",
    // q159: the PUSHDOWN point read — the scan returns only rows of the
    // probed keys (absent negations contribute NOTHING: the bloom/index
    // pruning is strict, and Spark's residual filter removes any
    // false-positive partition rows anyway), so the oracle is the plain
    // per-key rollup over the present probes with the q67 representation
    // mapping (stored value length = size_bytes % 61, 0 when deleted).
    "q159_scan_point_pushdown" -> s"""WITH $fixtures
SELECT key, CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END) AS BIGINT) AS value_sum
FROM licells WHERE key % 1009 = 0 GROUP BY 1 ORDER BY 1""",
    // q160: the pushdown SLICE read — per-sstable rollup of the wide
    // remap's events for partition 3, clustering in [1200, 2800]; the
    // residual filter makes block selection invisible to the relation
    // (economy is spec-pinned), so the oracle is the plain filtered
    // rollup under q112's remap rules.
    "q160_scan_slice_pushdown" -> s"""WITH $fixtures,
wide AS (
  SELECT sstable_id, key % 8 AS wkey, key AS wclustering, kind,
    is_tombstone, timestamp_us, size_bytes
  FROM licells
)
SELECT sstable_id, CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(wclustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END) AS BIGINT) AS value_sum
FROM wide WHERE wkey = 3 AND wclustering BETWEEN 1200 AND 2800
GROUP BY 1 ORDER BY 1""",
    // q162: real compaction replayed from parquet. The Spark side ranks
    // SCAN-VISIBLE fields, so the oracle first applies the representation
    // mapping (deleted cells read back NO_TTL/-1 and value length 0; live
    // value length = size_bytes % 61), then the same total order per
    // (key, clustering, column_name), keeps rank-1 winners that are not
    // droppable tombstones, shards by key % N with N the VOLUME-ADAPTIVE
    // output count (round 11: ceil of the modeled input bytes —
    // 32 + value length per event — over the 1 MiB fixture-scale target,
    // Compaction.outputShards), and rolls up the same checksums the
    // read-back of the written sstables produces.
    "q162_compaction_roundtrip" -> s"""WITH $fixtures,
mapped AS (
  SELECT sstable_id, key, clustering, column_name, kind,
    timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring, is_live,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
vol AS (
  SELECT LEAST(4096, GREATEST(1,
    CAST(CEIL(SUM(32 + size_bytes) / 1048576.0) AS BIGINT))) AS n
  FROM mapped
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, sstable_id DESC, size_bytes DESC,
             is_tombstone DESC, local_deletion_time_s DESC,
             ttl_s DESC, is_expiring DESC, kind DESC) AS rn
  FROM mapped
),
winners AS (
  SELECT * FROM ranked
  WHERE rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
)
SELECT 'sst-' || CAST(key % (SELECT n FROM vol) AS VARCHAR) AS sstable_id,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(SUM(CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 1 ELSE 0 END) AS BIGINT) AS markers,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(ttl_s % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT) AS expiring,
  CAST(SUM(CASE WHEN is_live THEN 1 ELSE 0 END) AS BIGINT) AS live,
  CAST(SUM(size_bytes % 1000003) AS BIGINT) AS value_sum
FROM winners GROUP BY 1 ORDER BY 1""",
    // q163: value passthrough — live CELL events carry the payload
    // string 'v<key>:<clustering>:<ts>' as their stored bytes; the scan's
    // value column must surface exactly those bytes, so the per-sstable
    // (non-null count, length sum, h60 sum) of the decoded payloads is
    // recomputable directly from parquet.
    "q163_value_passthrough" -> s"""WITH $fixtures,
payload AS (
  SELECT sstable_id, kind,
    CASE WHEN kind = 'CELL' AND NOT is_tombstone
      THEN 'v' || CAST(key AS VARCHAR) || ':' || CAST(clustering AS VARCHAR)
        || ':' || CAST(timestamp_us AS VARCHAR) END AS v
  FROM licells
)
SELECT sstable_id, CAST(COUNT(*) AS BIGINT) AS events,
  CAST(COUNT(v) AS BIGINT) AS valued,
  CAST(COALESCE(SUM(length(v)), 0) AS BIGINT) AS len_sum,
  CAST(COALESCE(SUM(${h60("v")} % 1000003), 0) AS BIGINT) AS h60_sum
FROM payload GROUP BY 1 ORDER BY 1""",
    // q166: value bytes through the POINT-READ path — the pushed-probe
    // plan returns exactly the present keys' partitions, and the decoded
    // payload contents are checksummed per key.
    "q166_point_get_values" -> s"""WITH $fixtures,
pay AS (
  SELECT key,
    CASE WHEN kind = 'CELL' AND NOT is_tombstone
      THEN 'v' || CAST(key AS VARCHAR) || ':' || CAST(clustering AS VARCHAR)
        || ':' || CAST(timestamp_us AS VARCHAR) END AS v
  FROM licells WHERE key % 1009 = 0
)
SELECT key, CAST(COUNT(*) AS BIGINT) AS events,
  CAST(COUNT(v) AS BIGINT) AS valued,
  CAST(COALESCE(SUM(length(v)), 0) AS BIGINT) AS len_sum,
  CAST(COALESCE(SUM(${h60("v")} % 1000003), 0) AS BIGINT) AS h60_sum
FROM pay GROUP BY 1 ORDER BY 1""",
    // q168: value bytes through the SLICE path — q166's derivation
    // restricted to the pushed clustering range (the residual filter
    // makes block narrowing invisible to the relation; economy is
    // spec-pinned on the q160 family).
    "q168_slice_get_values" -> s"""WITH $fixtures,
pay AS (
  SELECT key,
    CASE WHEN kind = 'CELL' AND NOT is_tombstone
      THEN 'v' || CAST(key AS VARCHAR) || ':' || CAST(clustering AS VARCHAR)
        || ':' || CAST(timestamp_us AS VARCHAR) END AS v
  FROM licells
  WHERE key % 1009 = 0 AND clustering BETWEEN 1 AND 2
)
SELECT key, CAST(COUNT(*) AS BIGINT) AS events,
  CAST(COUNT(v) AS BIGINT) AS valued,
  CAST(COALESCE(SUM(length(v)), 0) AS BIGINT) AS len_sum,
  CAST(COALESCE(SUM(${h60("v")} % 1000003), 0) AS BIGINT) AS h60_sum
FROM pay GROUP BY 1 ORDER BY 1""",
    // q167: the purge pipeline sized by the ACTUAL stored value length —
    // over the value-bearing set each live cell's size is its payload's
    // byte length (markers/tombstones store nothing); the LWW merge and
    // reclaim accounting otherwise mirror q83's derivation. sstable ids
    // differ in NAME between engines (nb-<g>-big vs sst-<g-1>) but agree
    // in ORDER and COUNT, the only things the merge consumes.
    "q167_purge_value_sizes" -> s"""WITH $fixtures,
mcells AS (
  SELECT key, key_formatted, clustering, column_name, sstable_id,
    timestamp_us, is_tombstone, local_deletion_time_s,
    CASE WHEN kind = 'CELL' AND NOT is_tombstone
      THEN length('v' || CAST(key AS VARCHAR) || ':'
        || CAST(clustering AS VARCHAR) || ':'
        || CAST(timestamp_us AS VARCHAR))
      ELSE 0 END AS size_bytes
  FROM licells
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, sstable_id DESC, size_bytes DESC,
             is_tombstone DESC, local_deletion_time_s DESC) AS rn
  FROM mcells
),
purge AS (
  SELECT key, key_formatted,
    CAST(COUNT(DISTINCT sstable_id) AS BIGINT) AS table_count,
    CAST(SUM(size_bytes) AS BIGINT) AS size,
    CAST(SUM(CASE WHEN rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
         THEN size_bytes ELSE 0 END) AS BIGINT) AS merged_size
  FROM ranked GROUP BY 1, 2
)
SELECT key, key_formatted, table_count, size,
       size - merged_size AS reclaimable
FROM purge ORDER BY reclaimable DESC, size DESC, key LIMIT 10""",
    // q115: the slice read replayed relationally INCLUDING block
    // selection — the fixture's block trigger (every 2 unfiltereds in
    // clustering order, markers before the row of the same clustering) is
    // rebuilt with a row_number window, per-block clustering bounds
    // derived, and blocks_scanned = overlapping blocks. The event sums
    // are the plain in-range aggregates.
    "q115_slice_read" -> s"""WITH $fixtures,
wide AS (
  SELECT sstable_id, key % 8 AS wkey, key AS wcl, kind, is_tombstone,
    timestamp_us, size_bytes
  FROM licells
),
ks AS (SELECT UNNEST(range(0, 8)) AS wkey),
probes AS (
  SELECT wkey, CAST(0 AS BIGINT) AS lo, CAST(500 AS BIGINT) AS hi FROM ks
  UNION ALL
  SELECT wkey, wkey * 1000, wkey * 1000 + 999 FROM ks
),
unf AS (
  SELECT sstable_id, wkey, wcl, 0 AS sort_is_row FROM wide
  WHERE kind = 'RANGE_TOMBSTONE_MARKER'
  UNION ALL
  SELECT DISTINCT sstable_id, wkey, wcl, 1 FROM wide WHERE kind = 'CELL'
),
ordered AS (
  SELECT *, row_number() OVER (PARTITION BY sstable_id, wkey
    ORDER BY wcl, sort_is_row) - 1 AS rn
  FROM unf
),
blocks AS (
  SELECT sstable_id, wkey, rn // 2 AS blk, MIN(wcl) AS bmin, MAX(wcl) AS bmax
  FROM ordered GROUP BY 1, 2, 3
),
scanned AS (
  SELECT p.wkey, p.lo, p.hi, CAST(COUNT(*) AS BIGINT) AS blocks_scanned
  FROM probes p JOIN blocks b
    ON b.wkey = p.wkey AND b.bmax >= p.lo AND b.bmin <= p.hi
  GROUP BY 1, 2, 3
),
inrange AS (
  SELECT p.wkey, p.lo, p.hi,
    CAST(COUNT(w.wcl) AS BIGINT) AS events,
    CAST(COALESCE(SUM(CASE WHEN w.is_tombstone THEN 0
      ELSE w.size_bytes % 61 END), 0) AS BIGINT) AS value_sum,
    CAST(COALESCE(SUM(w.timestamp_us % 1000003), 0) AS BIGINT) AS ts_sum
  FROM probes p LEFT JOIN wide w
    ON w.wkey = p.wkey AND w.wcl BETWEEN p.lo AND p.hi
  GROUP BY 1, 2, 3
)
SELECT CAST(i.wkey AS BIGINT) AS wkey, CAST(i.lo AS BIGINT) AS lo,
  CAST(i.hi AS BIGINT) AS hi,
  CAST(COALESCE(s.blocks_scanned, 0) AS BIGINT) AS blocks_scanned,
  i.events, i.value_sum, i.ts_sum
FROM inrange i LEFT JOIN scanned s USING (wkey, lo, hi)
ORDER BY 1, 2""",
    // q111: q67's derivation grouped per chunk codec — the fixture rotates
    // gen % 4 over LZ4/Snappy/Deflate/Zstd and the Spark side reads the
    // name from each file's CompressionInfo.db, so this CASE replays the
    // rotation (sstable_id 'sst-N' ↔ gen N+1) independently of the files.
    "q111_multi_codec_roundtrip" -> s"""WITH $fixtures,
coded AS (
  SELECT *, CASE ((CAST(substr(sstable_id, 5) AS BIGINT) + 1) % 4)
    WHEN 0 THEN 'LZ4Compressor' WHEN 1 THEN 'SnappyCompressor'
    WHEN 2 THEN 'DeflateCompressor' ELSE 'ZstdCompressor' END AS compressor
  FROM licells
)
SELECT compressor,
  CAST(COUNT(DISTINCT sstable_id) AS BIGINT) AS sstables,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(SUM(CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 1 ELSE 0 END) AS BIGINT) AS markers,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM((CASE WHEN is_tombstone THEN -1 ELSE ttl_s END) % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT) AS expiring,
  CAST(SUM(CASE WHEN is_live THEN 1 ELSE 0 END) AS BIGINT) AS live,
  CAST(SUM(CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END) AS BIGINT) AS value_sum,
  CAST(SUM(length(column_name) % 1000003) AS BIGINT) AS colname_len_sum
FROM coded GROUP BY 1 ORDER BY 1""",
    // q69: a bloom filter admits NO false negatives — every present key
    // must probe true, so found == partitions exactly; both sides reduce
    // to the per-sstable distinct-key count.
    "q69_bloom_membership" -> s"""WITH $fixtures
SELECT sstable_id,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS found
FROM licells GROUP BY 1 ORDER BY 1""",
    // q76: Summary.db roundtrip — every MinIndexInterval(=4)-th partition
    // in key order per sstable, plus the first/last-key tail; positions_ok
    // must equal entries (the engine cross-checks each summary entry's
    // Index.db offset against the real index entry at that offset).
    "q76_summary_roundtrip" -> s"""WITH $fixtures,
sumk AS (SELECT DISTINCT sstable_id, key FROM licells),
sumr AS (
  SELECT sstable_id, key,
    row_number() OVER (PARTITION BY sstable_id ORDER BY key) - 1 AS rn
  FROM sumk
),
sumb AS (
  SELECT sstable_id, MIN(key) AS first_key, MAX(key) AS last_key
  FROM sumk GROUP BY 1
)
SELECT p.sstable_id, CAST(COUNT(*) AS BIGINT) AS entries,
  CAST(4 AS BIGINT) AS min_interval,
  CAST(SUM(p.key % 1000003) AS BIGINT) AS keys_sum,
  CAST(b.first_key AS BIGINT) AS first_key,
  CAST(b.last_key AS BIGINT) AS last_key,
  CAST(COUNT(*) AS BIGINT) AS positions_ok
FROM sumr p JOIN sumb b USING (sstable_id)
WHERE p.rn % 4 = 0
GROUP BY p.sstable_id, b.first_key, b.last_key ORDER BY 1""",
    // q79: the promoted (row) index — one unfiltered per marker EVENT plus
    // one per clustering with any cell, ordered (clustering, markers
    // first); partitions with > 2 unfiltereds are indexed, block boundary
    // every 2; boundary clusterings and kinds (marker bound = ordinal 1,
    // row clustering = 4) recomputed per block. tiled_ok is the engine's
    // byte-level self-check and must equal indexed.
    "q79_row_index" -> s"""WITH $fixtures,
riunf AS (
  SELECT sstable_id, key, clustering, 0 AS sub
  FROM licells WHERE kind = 'RANGE_TOMBSTONE_MARKER'
  UNION ALL
  SELECT DISTINCT sstable_id, key, clustering, 1 AS sub
  FROM licells WHERE kind = 'CELL'
),
riseq AS (
  SELECT *,
    row_number() OVER (PARTITION BY sstable_id, key
      ORDER BY clustering, sub) - 1 AS idx,
    COUNT(*) OVER (PARTITION BY sstable_id, key) AS n
  FROM riunf
),
riblk AS (
  SELECT sstable_id, key, idx // 2 AS b,
    arg_min(clustering, idx) AS first_cl,
    arg_max(clustering, idx) AS last_cl,
    arg_min(sub, idx) AS first_sub,
    arg_max(sub, idx) AS last_sub
  FROM riseq WHERE n > 2
  GROUP BY 1, 2, 3
),
ripp AS (
  SELECT sstable_id, key, COUNT(*) AS nblocks,
    SUM(first_cl % 1000003) AS fs, SUM(last_cl % 1000003) AS ls,
    SUM(CASE WHEN first_sub = 0 THEN 1 ELSE 4 END) AS fk,
    SUM(CASE WHEN last_sub = 0 THEN 1 ELSE 4 END) AS lk
  FROM riblk GROUP BY 1, 2
),
ritot AS (
  SELECT sstable_id, COUNT(DISTINCT key) AS partitions FROM riunf GROUP BY 1
)
SELECT t.sstable_id,
  CAST(t.partitions AS BIGINT) AS partitions,
  CAST(COALESCE(COUNT(p.key), 0) AS BIGINT) AS indexed,
  CAST(COALESCE(SUM(p.nblocks), 0) AS BIGINT) AS blocks,
  CAST(COALESCE(SUM(p.fs), 0) AS BIGINT) AS first_cl_sum,
  CAST(COALESCE(SUM(p.ls), 0) AS BIGINT) AS last_cl_sum,
  CAST(COALESCE(SUM(p.fk), 0) AS BIGINT) AS first_kind_sum,
  CAST(COALESCE(SUM(p.lk), 0) AS BIGINT) AS last_kind_sum,
  CAST(COALESCE(COUNT(p.key), 0) AS BIGINT) AS tiled_ok
FROM ritot t LEFT JOIN ripp p USING (sstable_id)
GROUP BY 1, t.partitions ORDER BY 1""",
    // q70: both variants' 6 Data.db files must match their Digest.crc32
    // sidecars; the oracle pins the file count from the fixture relation.
    "q70_digest_verify" -> s"""WITH $fixtures
SELECT CAST(COUNT(DISTINCT sstable_id) * 2 AS BIGINT) AS sstables,
  CAST(COUNT(DISTINCT sstable_id) * 2 AS BIGINT) AS matches
FROM licells""",
    // cfstats totals recomputed from parquet (same derivation as q15) —
    // the Spark side ran the whole pipeline off raw binary Data.db files.
    "q44_cfstats_from_raw" -> cfstatsTotalsFromRawSql,
    // q71: the SAME cfstats totals pipeline, but the input relation is the
    // REAL-format COMPRESSED sstables (CassandraDataFixture + the
    // format=cassandra row codec + chunk decompression). Every field the
    // totals consume (clustering, kind, is_tombstone, localDeletionTime)
    // round-trips exactly through the real encoding, so the derivation is
    // identical to q44's.
    "q71_cfstats_from_cassandra" -> cfstatsTotalsFromRawSql,

    // raw Statistics.db roundtrip: the full metadata table, every field of
    // both binary components (q46); the summary rollup off those files
    // shares q05's derivation (q47).
    "q46_stats_raw_roundtrip" -> s"""WITH $fixtures
SELECT keyspace, tbl, sstable_id, partition_count, uncompressed_length,
  max_partition_size, cell_count, min_timestamp_us, max_timestamp_us,
  disk_length, avg_partition_size, level, is_repaired, repaired_at_ms,
  compaction_strategy, file_timestamp_ms,
  min_local_deletion_time_s, max_local_deletion_time_s,
  estimated_keys, avg_column_count, max_column_count,
  droppable_tombstone_count, droppable_ratio_x1000
FROM meta ORDER BY sstable_id""",

    // q62: the REAL-format Statistics.db roundtrip recomputed from parquet.
    // Histogram semantics mirror Cassandra's EstimatedHistogram: the
    // fixture packs [offsets (avg, max), buckets (n−1, 1, overflow 0)], so
    // max() = max offset with a nonzero bucket and mean() = ceil in DOUBLE
    // arithmetic of (Σ bucket·offset)/n. droppable_x1000 is the
    // StreamingHistogram trapezoid estimate at b = gcBefore with bins at
    // b±86400: mb = m1 + (m2−m1)·(b−p1)/(p2−p1), s = (m1+mb)·(b−p1)/
    // (2(p2−p1)) + m1/2 — every factor folded to its exact double literal
    // in the same operation order the Scala reader uses.
    // q77: the "oa" version-gated tail, every field deterministic from the
    // fixture derivation (hostId/key-range/coverage are pure functions of
    // the generation; total_rows/min_timestamp prove the base layout).
    "q77_stats_oa_tail" -> s"""WITH $fixtures,
g AS (
  SELECT *, CAST(row_number() OVER (ORDER BY sstable_id) AS BIGINT) AS gen
  FROM meta
)
SELECT gen AS generation,
  gen * 1000003 AS host_id_msb,
  gen * 2000003 AS host_id_lsb,
  (gen % 2 = 0) AS has_partition_deletions,
  gen * 1000 + 1 AS first_key,
  gen * 1000 + 999 AS last_key,
  CAST(floor(CAST(gen AS DOUBLE) / 6.0 * 1000000.0) AS BIGINT)
    AS token_coverage_x1e6,
  partition_count AS total_rows,
  min_timestamp_us
FROM g ORDER BY 1""",

    // q100: the "oa" covered-clustering slice, recomputed from the fixture
    // derivation — k1 = gen%2+1 real start values (byte b of value j is
    // gen+j+b, so each value sums to 4·gen+4·j+6), one EMPTY on even gens,
    // one NULL on gen%3=0; k2 = gen%3+1 end values over base 2·gen. Kind
    // ordinals are INCL_START_BOUND=1 / INCL_END_BOUND=6.
    "q100_stats_oa_slice" -> s"""WITH $fixtures,
g AS (
  SELECT *, CAST(row_number() OVER (ORDER BY sstable_id) AS BIGINT) AS gen
  FROM meta
),
k AS (
  SELECT gen, partition_count,
    gen % 2 + 1 AS k1, gen % 3 + 1 AS k2,
    CASE WHEN gen % 2 = 0 THEN 1 ELSE 0 END AS n_empty,
    CASE WHEN gen % 3 = 0 THEN 1 ELSE 0 END AS n_null
  FROM g
)
SELECT gen AS generation,
  CAST(1 AS BIGINT) AS start_kind,
  CAST(6 AS BIGINT) AS end_kind,
  k1 + n_empty + n_null AS start_components,
  k2 AS end_components,
  CAST(n_null AS BIGINT) AS start_null_count,
  CAST(n_empty AS BIGINT) AS start_empty_count,
  k1 * (4 * gen + 6) + 2 * k1 * (k1 - 1) AS start_bytes_sum,
  k2 * (8 * gen + 6) + 2 * k2 * (k2 - 1) AS end_bytes_sum,
  partition_count AS total_rows
FROM k ORDER BY 1""",

    "q62_stats_real_format" -> s"""WITH $fixtures,
g AS (
  SELECT *, CAST(row_number() OVER (ORDER BY sstable_id) AS BIGINT) AS gen
  FROM meta
)
SELECT gen AS generation,
  'org.apache.cassandra.dht.Murmur3Partitioner' AS partitioner,
  CAST(10000 AS BIGINT) AS bloom_fp_x1e6,
  partition_count AS partition_size_count,
  max_partition_size AS partition_size_max,
  CAST(ceil(CAST((partition_count - 1) * avg_partition_size
    + max_partition_size AS DOUBLE) / partition_count) AS BIGINT)
    AS partition_size_mean,
  max_column_count AS column_count_max,
  CAST(ceil(CAST((partition_count - 1) * avg_column_count
    + max_column_count AS DOUBLE) / partition_count) AS BIGINT)
    AS column_count_mean,
  1700000 + gen AS commit_log_segment,
  gen * 1024 AS commit_log_pos,
  min_timestamp_us, max_timestamp_us,
  min_local_deletion_time_s AS min_ldt_s,
  max_local_deletion_time_s AS max_ldt_s,
  CAST(0 AS BIGINT) AS min_ttl_s,
  CAST(86400 AS BIGINT) AS max_ttl_s,
  CAST(floor(CAST(disk_length AS DOUBLE) / uncompressed_length * 1000000.0)
    AS BIGINT) AS compression_ratio_x1e6,
  CAST(level AS BIGINT) AS level,
  COALESCE(repaired_at_ms, 0) AS repaired_at_ms,
  (COALESCE(repaired_at_ms, 0) <> 0) AS is_repaired,
  gen % 2 + 1 AS min_clustering_components,
  gen % 3 + 1 AS max_clustering_components,
  FALSE AS has_legacy_counter_shards,
  cell_count AS total_columns_set,
  partition_count AS total_rows,
  CAST(floor(((CAST(droppable_tombstone_count AS DOUBLE)
    + (CAST(droppable_tombstone_count AS DOUBLE)
       + (17.0 - CAST(droppable_tombstone_count AS DOUBLE))
         * 86400.0 / 172800.0))
    * 86400.0 / 345600.0
    + CAST(droppable_tombstone_count AS DOUBLE) / 2.0) * 1000.0)
    AS BIGINT) AS droppable_x1000,
  FALSE AS is_transient
FROM g ORDER BY generation""",

    // q64: the real CompressionInfo.db chunk map recomputed from parquet —
    // chunk count = ⌈uncompressed/65536⌉, per-chunk compressed size =
    // base + (i mod 7) with base = 65536·disk ÷ uncompressed (integer), and
    // offsets the prefix sums (window over the regenerated chunk series).
    // The last chunk has no successor, so its csize is NULL on both sides
    // (Spark's lead() and the i < cc−1 filter here).
    "q64_compression_info" -> s"""WITH $fixtures,
g AS (
  SELECT *, CAST(row_number() OVER (ORDER BY sstable_id) AS BIGINT) AS gen
  FROM meta
),
ch AS (
  SELECT gen, uncompressed_length AS data_length,
    (65536 * disk_length) // uncompressed_length AS base,
    (uncompressed_length + 65535) // 65536 AS cc,
    u.i AS i
  FROM g, UNNEST(range(0, (uncompressed_length + 65535) // 65536)) AS u(i)
),
offs AS (
  SELECT gen, data_length, i, cc,
    CAST(i * base + COALESCE(SUM(i % 7) OVER (PARTITION BY gen ORDER BY i
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off,
    CAST(base + (i % 7) AS BIGINT) AS csize
  FROM ch
)
SELECT gen AS generation,
  'LZ4Compressor' AS compressor,
  CAST(65536 AS BIGINT) AS chunk_length,
  CAST(MIN(data_length) AS BIGINT) AS data_length,
  CAST(COUNT(*) AS BIGINT) AS chunk_count,
  CAST(SUM(off % 1000003) AS BIGINT) AS offsets_sum,
  CAST(SUM(CASE WHEN i < cc - 1 THEN csize % 1000003 END) AS BIGINT)
    AS csize_sum,
  CAST(MIN(CASE WHEN i < cc - 1 THEN csize END) AS BIGINT) AS min_csize,
  CAST(MAX(CASE WHEN i < cc - 1 THEN csize END) AS BIGINT) AS max_csize
FROM offs GROUP BY 1 ORDER BY 1""",

    "q47_summary_from_raw" -> s"""WITH $fixtures
SELECT keyspace, tbl,
  CAST(COUNT(*) AS BIGINT) AS sstable_count,
  CAST(SUM(disk_length) AS BIGINT) AS disk_length,
  CAST(SUM(uncompressed_length) AS BIGINT) AS uncompressed_length,
  CAST(SUM(CASE WHEN is_repaired THEN 1 ELSE 0 END) AS BIGINT) AS repaired_count,
  CAST(SUM(CASE WHEN is_repaired THEN uncompressed_length ELSE 0 END) AS BIGINT) AS repaired_length,
  CAST(MAX(CASE WHEN is_repaired THEN repaired_at_ms END) AS BIGINT) AS max_repaired_at_ms,
  CAST(floor(SUM(CASE WHEN is_repaired THEN uncompressed_length ELSE 0 END) * 100
       / SUM(uncompressed_length)) AS BIGINT) AS repair_pct
FROM meta GROUP BY 1, 2 ORDER BY 1, 2""",

    "q20_dedup_exact" -> s"""WITH $corpus
SELECT CAST(MIN(doc_id) AS BIGINT) AS keeper,
       CAST(COUNT(*) AS BIGINT) AS copies
FROM corpus GROUP BY text HAVING COUNT(*) > 1 ORDER BY keeper""",

    "q21_dedup_ngram" -> s"""WITH $corpus, $shingles,
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
szs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY 1)
SELECT p.id_a, p.id_b,
  CAST(floor(p.inter * 1000 / (sa.sz + sb.sz - p.inter)) AS BIGINT) AS jaccard_x1000
FROM pairs p
JOIN szs sa ON p.id_a = sa.doc_id
JOIN szs sb ON p.id_b = sb.doc_id
WHERE p.inter * 100 >= 80 * (sa.sz + sb.sz - p.inter)
ORDER BY 1, 2""",

    "q24_sim_topk" -> s"""WITH $quantized,
q AS (SELECT vec_id AS query_id, qv AS qa, norm2 AS na2 FROM qn WHERE vec_id < 8),
c AS (SELECT vec_id AS neighbor_id, qv AS qb, norm2 AS nb2 FROM qn WHERE vec_id >= 8),
scored AS (
  SELECT query_id, neighbor_id,
    CAST(list_sum(list_transform(range(1, len(qa) + 1), i -> qa[i] * qb[i])) AS DOUBLE)
      / sqrt(CAST(na2 * nb2 AS DOUBLE)) AS cos
  FROM q, c
),
rk AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id
FROM rk WHERE rank <= 5 ORDER BY query_id, rank""",

    // q72: one deterministic Lloyd assignment (integer centroid means via
    // floor-of-double division, scores dot/√(‖c‖²+1) with centroid-id
    // tiebreak), then the exact quantized cosine ≥ 0.995 WITHIN clusters —
    // every double computed from exact integers in the same operation
    // order as the Spark plan.
    "q72_semantic_dedup" -> """WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 50 = 0
  UNION ALL
  SELECT vec_id + 200000, list_transform(embedding, x -> CAST(x * 2 AS FLOAT))
  FROM embeddings WHERE vec_id % 77 = 3
),
qb AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM aug
),
qn AS (
  SELECT vec_id, qv,
    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS norm2,
    vec_id % 16 AS seed
  FROM qb
),
cpos AS (
  SELECT seed, i AS pos,
    CAST(floor(CAST(SUM(qv[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
  FROM qn, UNNEST(range(1, len(qv) + 1)) AS t(i)
  GROUP BY 1, 2
),
cent AS (
  SELECT seed AS cseed, list(cv ORDER BY pos) AS cv
  FROM cpos GROUP BY 1
),
centn AS (
  SELECT cseed, cv,
    CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn2
  FROM cent
),
scored AS (
  SELECT q.vec_id, q.qv, q.norm2, c.cseed,
    row_number() OVER (PARTITION BY q.vec_id ORDER BY
      CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
        i -> q.qv[i] * c.cv[i])) AS DOUBLE)
        / sqrt(CAST(c.cn2 + 1 AS DOUBLE)) DESC, c.cseed) AS rk
  FROM qn q, centn c
),
asg AS (
  SELECT vec_id, cseed AS cluster, qv, norm2 FROM scored WHERE rk = 1
),
pairs AS (
  SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
    CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
      i -> a.qv[i] * b.qv[i])) AS DOUBLE)
      / sqrt(CAST(a.norm2 * b.norm2 AS DOUBLE)) AS cos
  FROM asg a JOIN asg b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
)
SELECT cluster, id_a, id_b,
  CAST(floor(cos * 1000) AS BIGINT) AS cos_x1000
FROM pairs WHERE cos * 1000 >= 995 ORDER BY id_a, id_b""",

    // q73: the quality-filter verdict over q26's metric derivations,
    // rolled up per source.
    "q73_quality_filter" -> """WITH m AS (
  SELECT source,
    len(string_split(text, ' ')) AS token_count,
    floor((length(text) - (len(string_split(text, ' ')) - 1)) * 100
      / len(string_split(text, ' '))) AS atl_x100,
    floor((length(text) - length(replace(text, ' the ', ''))) / 5)
      AS the_count
  FROM documents
),
k AS (
  SELECT source,
    (token_count >= 20 AND atl_x100 >= 300 AND atl_x100 <= 1000
      AND the_count >= 1) AS is_kept
  FROM m
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT) AS kept,
  CAST(floor(SUM(CASE WHEN is_kept THEN 1 ELSE 0 END) * 1000 / COUNT(*))
    AS BIGINT) AS kept_x1000
FROM k GROUP BY 1 ORDER BY 1""",

    // q74: q56's connected components + per-cluster argmax(tokens,
    // tiebreak min doc_id) canonical member, via a deterministic
    // row_number (the engine's max(struct) aggregate picks identically).
    "q74_canonical_docs" -> s"""WITH RECURSIVE $corpus, $shingles,
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
szs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
dup AS (
  SELECT p.id_a, p.id_b FROM pairs p
  JOIN szs sa ON p.id_a = sa.doc_id
  JOIN szs sb ON p.id_b = sb.doc_id
  WHERE p.inter * 100 >= 80 * (sa.sz + sb.sz - p.inter)
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM dup
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM dup
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
walk(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst AS id, w.label FROM walk w JOIN edges e ON e.src = w.id
),
labels AS (SELECT id, MIN(label) AS label FROM walk GROUP BY id),
toksq AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
  FROM corpus
),
memb AS (
  SELECT l.label AS cluster_rep, l.id AS doc_id, t.tokens,
    row_number() OVER (PARTITION BY l.label
      ORDER BY t.tokens DESC, l.id ASC) AS rk
  FROM labels l JOIN toksq t ON t.doc_id = l.id
)
SELECT CAST(cluster_rep AS BIGINT) AS cluster_rep,
  CAST(COUNT(*) AS BIGINT) AS cluster_size,
  CAST(MAX(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS canonical_doc,
  CAST(MAX(CASE WHEN rk = 1 THEN tokens END) AS BIGINT) AS canonical_tokens,
  CAST(SUM(tokens) AS BIGINT) AS cluster_tokens,
  CAST(SUM(tokens) - MAX(CASE WHEN rk = 1 THEN tokens END) AS BIGINT)
    AS dropped_tokens
FROM memb GROUP BY 1 ORDER BY 1""",

    // q75: q66's allocations + a per-source prefix-sum gate over the
    // PortableHash(doc_id) ordering — the oracle uses the plain window;
    // the engine's two-level bucketed scan must agree exactly.
    "q75_budget_select" -> s"""WITH tt AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
    AS total_tokens
  FROM documents GROUP BY 1
),
w AS (
  SELECT *, CAST(floor(sqrt(total_tokens)) AS BIGINT) AS weight FROM tt
),
a AS (
  SELECT source, CAST(floor(1000000 * weight /
    CAST((SELECT SUM(weight) FROM w) AS BIGINT)) AS BIGINT) AS alloc_tokens
  FROM w
),
d AS (
  SELECT source, doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count,
    ${h60("CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
),
c AS (
  SELECT *, CAST(SUM(token_count) OVER (PARTITION BY source
    ORDER BY h, doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM d
)
SELECT c.source, CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(MAX(alloc_tokens) AS BIGINT) AS alloc_tokens,
  CAST(SUM(CASE WHEN cum <= alloc_tokens THEN 1 ELSE 0 END) AS BIGINT)
    AS selected_docs,
  CAST(SUM(CASE WHEN cum <= alloc_tokens THEN token_count ELSE 0 END)
    AS BIGINT) AS selected_tokens,
  CAST(floor(SUM(CASE WHEN cum <= alloc_tokens THEN token_count ELSE 0 END)
    * 1000 / MAX(alloc_tokens)) AS BIGINT) AS fill_x1000
FROM c JOIN a ON c.source = a.source GROUP BY 1 ORDER BY 1""",

    // mirror of Dedup.dupSpans (k = 5) over the dup-injected corpus: grams
    // keyed on text (the engine's xxhash64 keys are the q21 equivalence
    // class); interval union via the same lag-window contribution rule.
    "q80_dup_spans" -> s"""WITH $corpus,
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
nt AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM toks),
grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS s, array_to_string(w[i:i+4], ' ') AS g
  FROM toks, UNNEST(range(1, len(w) - 3)) AS t(i)
  WHERE len(w) >= 5
),
dup AS (SELECT g FROM grams GROUP BY g HAVING MIN(doc_id) <> MAX(doc_id)),
runs AS (
  SELECT gr.doc_id, gr.s,
    lag(gr.s) OVER (PARTITION BY gr.doc_id ORDER BY gr.s) AS ps
  FROM grams gr JOIN dup USING (g)
),
cov AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_starts,
    CAST(SUM(CASE WHEN ps IS NULL THEN 5 ELSE LEAST(5, s - ps) END)
      AS BIGINT) AS covered_tokens
  FROM runs GROUP BY 1
)
SELECT n.doc_id, n.n_tokens,
  CAST(COALESCE(c.dup_starts, 0) AS BIGINT) AS dup_starts,
  CAST(COALESCE(c.covered_tokens, 0) AS BIGINT) AS covered_tokens,
  CAST(floor(COALESCE(c.covered_tokens, 0) * 1000 / n.n_tokens) AS BIGINT)
    AS dup_x1000
FROM nt n LEFT JOIN cov c USING (doc_id) ORDER BY n.doc_id""",

    // mirror of TextStats.epochShuffle (epoch 1, 8 shards): the oracle
    // ranks with the plain per-shard window — the engine's two-level
    // bucketed rank must be value-identical by construction.
    "q81_epoch_shuffle" -> s"""WITH d AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count,
    ${h60("CAST(doc_id AS VARCHAR) || ':1'")} AS h
  FROM documents
),
r AS (
  SELECT *, h % 8 AS shard,
    CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
      AS BIGINT) AS rk
  FROM d
)
SELECT CAST(shard AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(token_count) AS BIGINT) AS tokens,
  CAST(SUM((h % 1000003) * rk) AS BIGINT) AS order_check
FROM r GROUP BY 1 ORDER BY 1""",

    "q26_text_quality" -> """SELECT doc_id, n_chars,
  CAST(length(text) AS BIGINT) AS len_chars,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count,
  CAST(floor((length(text) - (len(string_split(text, ' ')) - 1)) * 100
       / len(string_split(text, ' '))) AS BIGINT) AS avg_token_len_x100,
  CAST(length(text) - length(replace(text, '.', '')) AS BIGINT) AS period_count,
  CAST(floor((length(text) - length(replace(text, ' the ', ''))) / 5) AS BIGINT) AS the_count,
  (len(string_split(text, ' ')) < 20) AS is_short
FROM documents ORDER BY doc_id""",

    "q27_lang_dist" -> """SELECT lang, source,
  CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(floor(SUM(n_chars) / COUNT(*)) AS BIGINT) AS avg_chars
FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",

    // q202: the training mixture — per-source capped inverse-sqrt
    // smoothing (rate = min(1, sqrt(Tmax/Ts)/2), pinned IEEE op order)
    // with deterministic hash-threshold selection.
    "q202_source_mix" -> s"""WITH t AS (
  SELECT source, doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count
  FROM documents
),
per_source AS (
  SELECT source, CAST(SUM(token_count) AS BIGINT) AS tokens
  FROM t GROUP BY 1
),
mx AS (SELECT MAX(tokens) AS tmax FROM per_source),
rates AS (
  SELECT source, tokens,
    CAST(floor(LEAST(1.0,
      sqrt(CAST(tmax AS DOUBLE) / CAST(tokens AS DOUBLE)) / 2.0)
      * 1000000.0) AS BIGINT) AS rate_x1e6
  FROM per_source, mx
),
tagged AS (
  SELECT t.source, t.doc_id, t.token_count, r.rate_x1e6,
    (${h60("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000
      < r.rate_x1e6) AS kept
  FROM t JOIN rates r USING (source)
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(token_count) AS BIGINT) AS tokens,
  CAST(MAX(rate_x1e6) AS BIGINT) AS rate_x1e6,
  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
  CAST(SUM(CASE WHEN kept THEN token_count ELSE 0 END) AS BIGINT)
    AS tokens_kept,
  CAST(COALESCE(SUM(CASE WHEN kept THEN doc_id % 1000003 END), 0)
    AS BIGINT) AS kept_id_checksum
FROM tagged GROUP BY 1 ORDER BY 1""",

    // q205: native event-time session windows — islands per user with
    // a NEW session at gap >= 30 min (session_window's end bound is
    // exclusive: an event exactly one gap after the previous one opens
    // a new session), end = last event + gap.
    "q205_session_windows" -> """WITH sev AS (
  SELECT user_id, epoch_us(ts) AS us,
    CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
),
marked AS (
  SELECT *, CASE WHEN lag(us) OVER w IS NULL
      OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
  FROM sev WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
islands AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
    ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, CAST(MIN(us) AS BIGINT) AS start_us,
  CAST(MAX(us) + 1800000000 AS BIGINT) AS end_us,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(v) AS BIGINT) AS value_x100
FROM islands GROUP BY user_id, sid ORDER BY 1, 2""",

    // q203: the upsampling half — exposure = min(4, 2*Tmax/Ts) epochs
    // (pinned IEEE op order); the per-rep checksum collapses to
    // c(c+1)/2 per document.
    "q203_source_epochs" -> s"""WITH t AS (
  SELECT source, doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count
  FROM documents
),
per_source AS (
  SELECT source, CAST(SUM(token_count) AS BIGINT) AS tokens
  FROM t GROUP BY 1
),
mx AS (SELECT MAX(tokens) AS tmax FROM per_source),
exposures AS (
  SELECT source,
    CAST(floor(LEAST(4.0,
      (2.0 * CAST(tmax AS DOUBLE)) / CAST(tokens AS DOUBLE))
      * 1000000.0) AS BIGINT) AS exposure_x1e6
  FROM per_source, mx
),
tagged AS (
  SELECT t.source, t.doc_id, t.token_count, e.exposure_x1e6,
    e.exposure_x1e6 // 1000000 +
      CASE WHEN ${h60("'epoch:' || CAST(doc_id AS VARCHAR)")} % 1000000
             < e.exposure_x1e6 % 1000000 THEN 1 ELSE 0 END AS copies
  FROM t JOIN exposures e USING (source)
)
SELECT source, CAST(MAX(exposure_x1e6) AS BIGINT) AS exposure_x1e6,
  CAST(SUM(copies) AS BIGINT) AS docs_emitted,
  CAST(SUM(copies * token_count) AS BIGINT) AS tokens_emitted,
  CAST(SUM((doc_id % 1000003) * (copies * (copies + 1) // 2)) AS BIGINT)
    AS emitted_checksum
FROM tagged GROUP BY 1 ORDER BY 1""",

    "q28_token_totals" -> """WITH t AS (
  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count
  FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(token_count) AS BIGINT) AS total_tokens,
  CAST(floor(SUM(token_count) / COUNT(*)) AS BIGINT) AS tokens_per_doc
FROM t GROUP BY 1 ORDER BY 1""",

    // q133: the KMV estimator replayed exactly — the k minimum distinct
    // h60 hashes per language via a ranked window, then the same integer
    // estimator floor((k−1)·2^60 / h_k) in HUGEINT floor division (both
    // operands nonnegative, so `//` matches the engine's BigInt
    // truncation). A language with fewer than k distinct hashes is exact.
    "q133_distinct_kmv" -> s"""WITH tok AS (
  SELECT lang, ${h60("t")} AS h FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
),
d AS (SELECT DISTINCT lang, h FROM tok),
r AS (SELECT lang, h,
        row_number() OVER (PARTITION BY lang ORDER BY h) AS rn,
        count(*) OVER (PARTITION BY lang) AS ndv
      FROM d),
g AS (SELECT lang, MAX(ndv) AS ndv,
        MAX(CASE WHEN rn = 64 THEN h END) AS kth
      FROM r WHERE rn <= 64 GROUP BY lang)
SELECT lang,
  CASE WHEN ndv < 64 THEN CAST(ndv AS BIGINT)
       ELSE CAST((CAST(63 AS HUGEINT) * 1152921504606846976) // kth
            AS BIGINT) END AS ndv_est,
  CAST(COALESCE(kth, -1) AS BIGINT) AS kth_hash,
  CAST(LEAST(ndv, 64) AS BIGINT) AS sketch_n,
  CAST(ndv AS BIGINT) AS ndv_exact
FROM g ORDER BY lang""",

    // q134: exact heavy hitters (freq·64 > total tokens) — the oracle is
    // the direct full-vocabulary aggregate; the engine's Misra-Gries
    // candidate pruning + exact recount must produce the identical
    // relation (the sketch only prunes, by its superset guarantee).
    "q134_heavy_hitters" -> """WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
tot AS (SELECT COUNT(*) AS n FROM tok),
c AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token)
SELECT token, CAST(cnt AS BIGINT) AS cnt, CAST(n AS BIGINT) AS total_tokens
FROM c, tot WHERE cnt * 64 > n ORDER BY cnt DESC, token""",

    // q138: KMV set algebra replayed — per-source k-min lists via ranked
    // windows, per-pair merged k-th minimum, common-below-K count, then
    // the same HUGEINT estimators ((k−1)·2^60/K and c·est_union/k; both
    // `//`s on nonnegative operands == the engine's BigInt truncation).
    // The exact union/intersection ride alongside, like q133's exact NDV.
    "q138_sketch_setops" -> s"""WITH tok AS (
  SELECT source, ${h60("t")} AS h FROM (
    SELECT source, unnest(string_split(text, ' ')) AS t FROM documents)
),
d AS (SELECT DISTINCT source, h FROM tok),
nd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ndv FROM d GROUP BY 1),
sk AS (SELECT source, h FROM (
  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM d) WHERE rn <= 64),
pr AS (SELECT a.source AS sa, b.source AS sb
       FROM nd a JOIN nd b ON a.source < b.source),
mu AS (SELECT p.sa, p.sb, s.h
       FROM pr p JOIN sk s ON s.source IN (p.sa, p.sb)
       GROUP BY 1, 2, 3),
mr AS (SELECT sa, sb, h,
        row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn,
        COUNT(*) OVER (PARTITION BY sa, sb) AS msize
       FROM mu),
kk AS (SELECT sa, sb, MAX(CASE WHEN rn = 64 THEN h END) AS kth,
        MAX(msize) AS msize
       FROM mr GROUP BY 1, 2),
cc AS (SELECT k.sa, k.sb, COUNT(*) AS c
       FROM kk k
       JOIN sk x ON x.source = k.sa
       JOIN sk y ON y.source = k.sb AND y.h = x.h
       WHERE x.h <= COALESCE(k.kth, 9223372036854775807)
       GROUP BY 1, 2),
es AS (
  SELECT k.sa, k.sb, k.msize, COALESCE(c.c, 0) AS c,
    CASE WHEN k.msize < 64 THEN CAST(k.msize AS BIGINT)
         ELSE CAST((CAST(63 AS HUGEINT) * 1152921504606846976) // k.kth
              AS BIGINT) END AS est_union
  FROM kk k LEFT JOIN cc c ON k.sa = c.sa AND k.sb = c.sb),
es2 AS (
  SELECT sa, sb, c, est_union,
    CASE WHEN msize < 64 THEN CAST(c AS BIGINT)
         ELSE CAST((CAST(c AS HUGEINT) * est_union) // 64 AS BIGINT)
    END AS est_intersect,
    CAST(c * 1000 // LEAST(64, msize) AS BIGINT) AS jaccard_x1000
  FROM es),
exact AS (SELECT x.source AS sa, y.source AS sb,
    CAST(COUNT(*) AS BIGINT) AS exact_intersect
  FROM d x JOIN d y ON x.h = y.h AND x.source < y.source GROUP BY 1, 2)
SELECT e.sa AS source_a, e.sb AS source_b,
  CAST(e.c AS BIGINT) AS c_common, e.est_union, e.est_intersect,
  e.jaccard_x1000,
  na.ndv + nb.ndv - COALESCE(x.exact_intersect, 0) AS exact_union,
  COALESCE(x.exact_intersect, 0) AS exact_intersect
FROM es2 e
JOIN nd na ON na.source = e.sa
JOIN nd nb ON nb.source = e.sb
LEFT JOIN exact x ON x.sa = e.sa AND x.sb = e.sb
ORDER BY source_a, source_b""",

    // mirror of TextStats.packSequences (seqLen 2048): the oracle uses the
    // plain per-source prefix sum — the engine's two-level bucketed scan
    // must be value-identical to the single-window form by construction.
    "q60_pack_sequences" -> """WITH t AS (
  SELECT source, doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
  FROM documents
),
o AS (
  SELECT source, tokens,
    COALESCE(SUM(tokens) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM t
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(tokens) AS BIGINT) AS total_tokens,
  CAST(floor((SUM(tokens) + 2047) / 2048) AS BIGINT) AS sequences,
  CAST(SUM(CASE WHEN floor(off / 2048) <> floor((off + tokens - 1) / 2048)
       THEN 1 ELSE 0 END) AS BIGINT) AS crossing_docs,
  CAST(floor(SUM(tokens) * 1000 /
       (floor((SUM(tokens) + 2047) / 2048) * 2048)) AS BIGINT) AS fill_x1000
FROM o GROUP BY 1 ORDER BY 1""",

    // mirror of TextStats.contamination (benchMod 101) over the
    // dup-injected corpus: the exact/near copies of benchmark docs are the
    // leaks; 5-gram overlap of each non-benchmark doc vs the benchmark set.
    "q61_contamination" -> contaminationSql,
    // q116: the bloom-prefiltered form MUST return the identical relation
    // (the bloom has no false negatives; the verify join removes exactly
    // the false positives) — same oracle derivation.
    "q116_contamination_bloom" -> contaminationSql,

    "q30_events_hourly" -> """SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
  event_type,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_x100,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "q31_events_sessions" -> """WITH lagd AS (
  SELECT user_id, ts,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
marks AS (
  SELECT user_id,
    CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS s
  FROM lagd
)
SELECT user_id, CAST(SUM(s) AS BIGINT) AS sessions,
  CAST(COUNT(*) AS BIGINT) AS events
FROM marks GROUP BY 1 ORDER BY 1""",

    "q35_subword_counts" -> """WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tokens,
  CAST(SUM(greatest(CAST(ceil(length(tok) / 4) AS BIGINT), 1)) AS BIGINT) AS subword_units
FROM t GROUP BY 1 ORDER BY 1""",

    // mirrors TextStats.langId's fold: best label = earliest lang (de<en<fr)
    // attaining the running max, score must strictly exceed to take over.
    "q36_langid" -> """WITH s AS (
  SELECT doc_id, lang AS true_lang,
    CAST((length(text) - length(replace(text, ' the ', ''))) / 5
       + (length(text) - length(replace(text, ' and ', ''))) / 5
       + (length(text) - length(replace(text, ' of ', ''))) / 4 AS BIGINT) AS s_en,
    CAST((length(text) - length(replace(text, ' der ', ''))) / 5
       + (length(text) - length(replace(text, ' und ', ''))) / 5
       + (length(text) - length(replace(text, ' die ', ''))) / 5 AS BIGINT) AS s_de,
    CAST((length(text) - length(replace(text, ' le ', ''))) / 4
       + (length(text) - length(replace(text, ' et ', ''))) / 4
       + (length(text) - length(replace(text, ' les ', ''))) / 5 AS BIGINT) AS s_fr
  FROM documents
)
SELECT doc_id, true_lang,
  CASE WHEN s_fr > greatest(s_de, s_en, 0) THEN 'fr'
       WHEN s_en > greatest(s_de, 0) THEN 'en'
       WHEN s_de > 0 THEN 'de'
       ELSE 'und' END AS pred_lang,
  greatest(s_de, s_en, s_fr, CAST(0 AS BIGINT)) AS pred_score
FROM s ORDER BY doc_id""",

    // Java and RE2 regex dialects agree on this pattern class (\p{L}/\p{N}
    // runs, alternation, non-capturing groups) — verified over the fixture
    // corpus; '' escapes the leading apostrophe of the contraction branch.
    "q41_bpe_tokens" -> """WITH t AS (
  SELECT source,
    CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS BIGINT) AS bpe,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS ws
  FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(bpe) AS BIGINT) AS total_bpe_tokens,
  CAST(SUM(ws) AS BIGINT) AS total_ws_tokens,
  CAST(floor(SUM(bpe) * 100 / SUM(ws)) AS BIGINT) AS bpe_per_ws_x100
FROM t GROUP BY 1 ORDER BY 1""",

    // q78: the real-container decode roundtrip — every decoded field is a
    // pure function of doc_id (BMP: 54-byte headers + 4-padded 24-bpp
    // rows; WAV: 44-byte RIFF/PCM16 header + data chunk).
    "q78_media_decode" -> """SELECT doc_id,
  CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS format,
  CAST(CASE WHEN doc_id % 2 = 0
    THEN 54 + (((3 * (4 + doc_id % 32) + 3) // 4) * 4) * (4 + doc_id % 24)
    ELSE 44 + (100 + doc_id % 400) * (1 + doc_id % 2) * 2
  END AS BIGINT) AS n_bytes,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 4 + doc_id % 32 ELSE 0 END AS BIGINT)
    AS width,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 4 + doc_id % 24 ELSE 0 END AS BIGINT)
    AS height,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 0
    ELSE 8000 + (doc_id % 8) * 1000 END AS BIGINT) AS sample_rate,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 + doc_id % 2 END AS BIGINT)
    AS channels,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 100 + doc_id % 400 END AS BIGINT)
    AS samples,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 0
    ELSE ((100 + doc_id % 400) * 1000) // (8000 + (doc_id % 8) * 1000)
  END AS BIGINT) AS duration_ms
FROM documents ORDER BY doc_id""",

    "q32_multimodal_meta" -> """SELECT doc_id,
  CAST(strlen(text) AS BIGINT) AS n_bytes,
  CAST(ascii(text) AS BIGINT) AS first_byte,
  CAST(floor(strlen(text) / 256) + 1 AS BIGINT) AS frames_stub
FROM documents ORDER BY doc_id""",

    // ---- hash-keyed / ANN queries: oracle-checkable because every hash in
    // the Spark plan is the cross-engine PortableHash (md5-derived) or an
    // embedded literal, and all scoring is integer or IEEE-double exact ----

    // mirror of TextStats.fingerprint: position-weighted mod-prime
    // polynomial over per-token h60 (Spark pos is 0-based with (pos+1)
    // weights = DuckDB's 1-based aligned-unnest position).
    "q29_doc_fingerprint" -> s"""WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents
)
SELECT doc_id,
  CAST(SUM(((${h60("t")} % 1000000007) * pos) % 1000000007) % 1000000007
       AS BIGINT) AS fingerprint,
  CAST(COUNT(*) AS BIGINT) AS tokens
FROM tok GROUP BY 1 ORDER BY 1""",

    // mirror of Dedup.simhash: per-bit weighted majority vote over the 60
    // usable bits of each token's h60.
    "q23_dedup_simhash" -> s"""WITH $corpus,
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM corpus),
th AS (SELECT doc_id, ${h60("t")} AS h FROM tok),
votes AS (
  SELECT doc_id, bit,
    CAST(SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v
  FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS bit) bits
  GROUP BY 1, 2
)
SELECT doc_id,
  CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END)
       AS BIGINT) AS simhash
FROM votes GROUP BY 1 ORDER BY 1""",

    // q155: the SNM blocking replayed exactly — same simhash sort key
    // (q23's derivation), a GLOBAL rank (the engine's two-level rank is
    // provably the same order: the bucket is the sort key's top byte),
    // the same w=8 window join, then the shared exact verify. String
    // shingle keys here vs xxhash64 in the engine: q21's documented
    // collision class.
    "q155_dedup_snm" -> s"""WITH $corpus, $shingles,
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM corpus),
th AS (SELECT doc_id, ${h60("t")} AS h FROM tok),
votes AS (
  SELECT doc_id, bit,
    CAST(SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS BIGINT)
      AS v
  FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS bit) bits
  GROUP BY 1, 2
),
sg AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END)
         AS BIGINT) AS simhash
  FROM votes GROUP BY 1
),
rk AS (SELECT doc_id, row_number() OVER (ORDER BY simhash, doc_id) AS rn
       FROM sg),
cand AS (
  SELECT LEAST(a.doc_id, b.doc_id) AS id_a,
         GREATEST(a.doc_id, b.doc_id) AS id_b
  FROM rk a JOIN rk b ON b.rn > a.rn AND b.rn <= a.rn + 8
  GROUP BY 1, 2
),
ssz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM cand c
  JOIN sh x ON x.doc_id = c.id_a
  JOIN sh y ON y.doc_id = c.id_b AND y.g = x.g
  GROUP BY 1, 2
),
j AS (
  SELECT i.id_a, i.id_b, i.inter, sa.sz AS sz_a, sb.sz AS sz_b
  FROM inter i
  JOIN ssz sa ON sa.doc_id = i.id_a
  JOIN ssz sb ON sb.doc_id = i.id_b
)
SELECT id_a, id_b,
  CAST(floor(inter * 1000 / (sz_a + sz_b - inter)) AS BIGINT)
    AS jaccard_x1000
FROM j WHERE inter * 100 >= 80 * (sz_a + sz_b - inter)
ORDER BY id_a, id_b""",

    // mirror of Dedup.minhashSignatures + minhashLsh: k=32 permutations
    // h_i = (hc·(2i+2) + 7919(i+1)) mod 2^31−1 over shingle h60s; LSH bands
    // of 4 rows joined on the comma-joined band signature; candidates kept
    // at ≥ ceil(0.7·32) = 23 matching signature positions.
    "q22_dedup_minhash" -> s"""WITH $corpus, $shingles,
hc AS (SELECT doc_id, ${h60("g")} % 2147483647 AS hc FROM sh),
sigs AS (
  SELECT doc_id, i,
    CAST(MIN((hc * (2 * i + 2) + 7919 * (i + 1)) % 2147483647) AS BIGINT) AS h
  FROM hc CROSS JOIN (SELECT unnest(range(0, 32)) AS i) perms
  GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, i // 4 AS band,
    string_agg(CAST(h AS VARCHAR), ',' ORDER BY i) AS bucket
  FROM sigs GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
m AS (
  SELECT c.id_a, c.id_b,
    CAST(SUM(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) AS BIGINT) AS sig_matches
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.id_a
  JOIN sigs sb ON sb.doc_id = c.id_b AND sb.i = sa.i
  GROUP BY 1, 2
)
SELECT id_a, id_b, sig_matches FROM m WHERE sig_matches >= 23 ORDER BY 1, 2""",

    // mirror of Dedup.embeddingNearDup: augmented corpus (exact copies,
    // 2x-rescaled copies — float x2 is exact), floor(x·1000) quantization,
    // 4 banded 16-bit sign-word buckets (union of within-band pair joins,
    // deduplicated), exact integer dot + IEEE-double cosine verification.
    "q33_dedup_embedding" -> s"""WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 50 = 0
  UNION ALL
  SELECT vec_id + 200000, list_transform(embedding, x -> CAST(x * 2 AS FLOAT))
  FROM embeddings WHERE vec_id % 77 = 3
),
qe AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM aug
),
qb AS (
  SELECT vec_id, qv,
    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS norm2
  FROM qe
),
bands AS (
  ${(0 until 4).map(b =>
      s"SELECT vec_id, $b AS band, ${(0 until 16).map(j =>
        s"(CASE WHEN qv[${b * 16 + j + 1}] >= 0 THEN ${1 << j} ELSE 0 END)")
        .mkString("\n    + ")} AS word\n  FROM qb")
    .mkString("\n  UNION ALL\n  ")}
),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.word = y.word AND x.vec_id < y.vec_id
)
SELECT c.id_a, c.id_b
FROM cand c
JOIN qb a ON a.vec_id = c.id_a
JOIN qb b ON b.vec_id = c.id_b
WHERE (CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * b.qv[i]))
            AS DOUBLE)
       / sqrt(CAST(a.norm2 * b.norm2 AS DOUBLE))) * 1000 >= 995
ORDER BY 1, 2""",

    // mirror of Similarity.lshTopK: the hyperplane coefficients are the
    // SAME literals the Spark plan embeds (Similarity.planeCoeffs);
    // multi-probe = original bucket + each single-bit flip.
    "q25_sim_lsh_ann" -> s"""WITH $quantized,
sig AS (
  SELECT vec_id, qv, norm2,
    ${(0 until 8).map(p =>
      s"(CASE WHEN list_sum(list_transform(range(1, 65), " +
        s"j -> qv[j] * (${planeSql(p)})[j])) >= 0 THEN ${1 << p} ELSE 0 END)")
      .mkString("\n    + ")} AS bucket
  FROM qn
),
probes AS (
  SELECT vec_id AS query_id, qv AS qa, norm2 AS na2, xor(bucket, f) AS bucket
  FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS f) fl
  WHERE vec_id < 8
),
cands AS (
  SELECT vec_id AS neighbor_id, qv AS qb, norm2 AS nb2, bucket
  FROM sig WHERE vec_id >= 8
),
scored AS (
  SELECT p.query_id, c.neighbor_id,
    CAST(list_sum(list_transform(range(1, 65), i -> p.qa[i] * c.qb[i]))
         AS DOUBLE)
      / sqrt(CAST(p.na2 * c.nb2 AS DOUBLE)) AS cos
  FROM cands c JOIN probes p USING (bucket)
),
rk AS (
  SELECT query_id, neighbor_id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
  CAST(floor(cos * 1000) AS BIGINT) AS cos_x1000
FROM rk WHERE rank <= 5 ORDER BY query_id, rank""",

    // mirror of Similarity.ivfTopK: centroids = first 16 candidate vectors,
    // integer-dot list assignment with (score desc, list_id asc) tiebreak,
    // nProbe=3 probed lists per query, cosine top-5.
    "q39_sim_ivf_ann" -> s"""WITH $quantized,
cands AS (SELECT vec_id, qv, norm2 FROM qn WHERE vec_id >= 8),
centroids AS (
  SELECT centroid_vec, cv,
    CAST(row_number() OVER (ORDER BY centroid_vec) AS BIGINT) AS list_id
  FROM (SELECT vec_id AS centroid_vec, qv AS cv FROM cands
        ORDER BY vec_id LIMIT 16)
),
cscore AS (
  SELECT c.vec_id, c.qv, c.norm2, ce.list_id,
    CAST(list_sum(list_transform(range(1, 65), i -> c.qv[i] * ce.cv[i]))
         AS BIGINT) AS score
  FROM cands c CROSS JOIN centroids ce
),
assigned AS (
  SELECT vec_id AS neighbor_id, qv AS qb, norm2 AS nb2, list_id
  FROM (SELECT *, row_number() OVER
          (PARTITION BY vec_id ORDER BY score DESC, list_id) AS rn
        FROM cscore)
  WHERE rn = 1
),
qscore AS (
  SELECT q.vec_id, q.qv, q.norm2, ce.list_id,
    CAST(list_sum(list_transform(range(1, 65), i -> q.qv[i] * ce.cv[i]))
         AS BIGINT) AS score
  FROM (SELECT vec_id, qv, norm2 FROM qn WHERE vec_id < 8) q
  CROSS JOIN centroids ce
),
probes AS (
  SELECT vec_id AS query_id, qv AS qa, norm2 AS na2, list_id
  FROM (SELECT *, row_number() OVER
          (PARTITION BY vec_id ORDER BY score DESC, list_id) AS rk
        FROM qscore)
  WHERE rk <= 3
),
scored AS (
  SELECT p.query_id, a.neighbor_id,
    CAST(list_sum(list_transform(range(1, 65), i -> p.qa[i] * a.qb[i]))
         AS DOUBLE)
      / sqrt(CAST(p.na2 * a.nb2 AS DOUBLE)) AS cos
  FROM assigned a JOIN probes p USING (list_id)
),
rk AS (
  SELECT query_id, neighbor_id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
  CAST(floor(cos * 1000) AS BIGINT) AS cos_x1000
FROM rk WHERE rank <= 5 ORDER BY query_id, rank""",

    // mirror of TextStats.repetition: bigrams via the q21 slice pattern
    // (range is upper-exclusive and slices clamp in both engines), counts
    // per (doc, bigram), then the per-doc Gopher top-n-gram fraction.
    "q65_repetition" -> """WITH
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bg AS (
  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
  FROM toks, UNNEST(range(1, greatest(len(w), 2))) AS t(i)
),
bc AS (
  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2
)
SELECT doc_id,
  CAST(SUM(c) AS BIGINT) AS bigrams_total,
  CAST(COUNT(*) AS BIGINT) AS distinct_bigrams,
  CAST(MAX(c) AS BIGINT) AS top_bigram_count,
  CAST(floor(MAX(c) * 1000 / CAST(SUM(c) AS BIGINT)) AS BIGINT)
    AS top_bigram_x1000
FROM bc GROUP BY 1 ORDER BY 1""",

    // mirror of TextStats.mixingRates: weight = floor(sqrt(tokens)) (IEEE
    // sqrt is correctly rounded — cross-engine identical), double division
    // before each floor exactly as Spark's `/` behaves on longs.
    "q66_mixing_rates" -> """WITH
tt AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
  FROM documents GROUP BY 1
),
w AS (
  SELECT *, CAST(floor(sqrt(total_tokens)) AS BIGINT) AS weight FROM tt
),
a AS (
  SELECT *, CAST(floor(1000000 * weight /
    CAST((SELECT SUM(weight) FROM w) AS BIGINT)) AS BIGINT) AS alloc_tokens
  FROM w
),
r AS (
  SELECT *, least(CAST(1000 AS BIGINT),
    CAST(floor(alloc_tokens * 1000 / total_tokens) AS BIGINT)) AS rate_x1000
  FROM a
)
SELECT source, docs, total_tokens, weight, alloc_tokens, rate_x1000,
  CAST(floor(total_tokens * rate_x1000 / 1000) AS BIGINT) AS sampled_tokens
FROM r ORDER BY source""",

    // mirror of TextStats.corpusPrep: quality gate (>= 20 tokens), language
    // gate (argmax marker score == en, q36's derivation), exact dedup
    // keeping the lowest doc_id per text, per-source yield rollup.
    "q49_corpus_prep" -> s"""WITH $corpus, s AS (
  SELECT doc_id, source, text,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count,
    CAST((length(text) - length(replace(text, ' the ', ''))) / 5
       + (length(text) - length(replace(text, ' and ', ''))) / 5
       + (length(text) - length(replace(text, ' of ', ''))) / 4 AS BIGINT) AS s_en,
    CAST((length(text) - length(replace(text, ' der ', ''))) / 5
       + (length(text) - length(replace(text, ' und ', ''))) / 5
       + (length(text) - length(replace(text, ' die ', ''))) / 5 AS BIGINT) AS s_de,
    CAST((length(text) - length(replace(text, ' le ', ''))) / 4
       + (length(text) - length(replace(text, ' et ', ''))) / 4
       + (length(text) - length(replace(text, ' les ', ''))) / 5 AS BIGINT) AS s_fr
  FROM corpus
),
kept AS (
  SELECT * FROM s
  WHERE token_count >= 20
    AND (CASE WHEN s_fr > greatest(s_de, s_en, 0) THEN 'fr'
              WHEN s_en > greatest(s_de, 0) THEN 'en'
              WHEN s_de > 0 THEN 'de'
              ELSE 'und' END) = 'en'
),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS docs_kept,
  CAST(SUM(token_count) AS BIGINT) AS total_tokens,
  CAST(floor(SUM(token_count) / COUNT(*)) AS BIGINT) AS tokens_per_doc
FROM kept JOIN keepers USING (doc_id)
GROUP BY 1 ORDER BY 1""",

    // q145: the whole funnel replayed — q49's gate + text-keyed dedup,
    // q61's benchmark shingle overlap as an anti-filter, q60's
    // concat-and-chunk sequence arithmetic, all joined per source.
    "q145_full_pipeline" -> s"""WITH $corpus, $shingles, s AS (
  SELECT doc_id, source, text,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count,
    CAST((length(text) - length(replace(text, ' the ', ''))) / 5
       + (length(text) - length(replace(text, ' and ', ''))) / 5
       + (length(text) - length(replace(text, ' of ', ''))) / 4 AS BIGINT) AS s_en,
    CAST((length(text) - length(replace(text, ' der ', ''))) / 5
       + (length(text) - length(replace(text, ' und ', ''))) / 5
       + (length(text) - length(replace(text, ' die ', ''))) / 5 AS BIGINT) AS s_de,
    CAST((length(text) - length(replace(text, ' le ', ''))) / 4
       + (length(text) - length(replace(text, ' et ', ''))) / 4
       + (length(text) - length(replace(text, ' les ', ''))) / 5 AS BIGINT) AS s_fr
  FROM corpus
),
kept AS (
  SELECT * FROM s
  WHERE token_count >= 20
    AND (CASE WHEN s_fr > greatest(s_de, s_en, 0) THEN 'fr'
              WHEN s_en > greatest(s_de, 0) THEN 'en'
              WHEN s_de > 0 THEN 'de'
              ELSE 'und' END) = 'en'
),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text),
dd AS (SELECT kept.* FROM kept JOIN keepers USING (doc_id)),
bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 101 = 0),
cont AS (SELECT DISTINCT c.doc_id FROM sh c JOIN bench b ON c.g = b.g),
clean AS (SELECT * FROM dd WHERE doc_id % 101 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM cont)),
s0 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_in
       FROM corpus GROUP BY 1),
s1 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS after_quality
       FROM kept GROUP BY 1),
s2 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS after_dedup
       FROM dd GROUP BY 1),
s3 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS after_decontam,
         CAST(SUM(token_count) AS BIGINT) AS tokens_kept
       FROM clean GROUP BY 1),
f AS (SELECT *, CAST((tokens_kept + 2047) // 2048 AS BIGINT) AS sequences
      FROM s3),
f2 AS (SELECT *, CAST(floor(tokens_kept * 1000 / (sequences * 2048))
         AS BIGINT) AS fill_x1000 FROM f)
SELECT s0.source, s0.docs_in,
  COALESCE(s1.after_quality, 0) AS after_quality,
  COALESCE(s2.after_dedup, 0) AS after_dedup,
  COALESCE(f2.after_decontam, 0) AS after_decontam,
  COALESCE(f2.tokens_kept, 0) AS tokens_kept,
  COALESCE(f2.sequences, 0) AS sequences,
  COALESCE(f2.fill_x1000, 0) AS fill_x1000
FROM s0 LEFT JOIN s1 USING (source) LEFT JOIN s2 USING (source)
LEFT JOIN f2 USING (source)
ORDER BY source""",

    // q150: all three TextRank iterations unrolled — same fixed-point
    // damped update, floor at every step, same (rank, token) tiebreak.
    "q150_textrank" -> """WITH t AS (
  SELECT string_split(text, ' ') AS w FROM documents
),
p AS (
  SELECT unnest(list_transform(range(1, len(w)), i ->
    struct_pack(src := w[i], dst := w[i+1]))) AS pr FROM t
),
e0 AS (SELECT DISTINCT pr.src AS src, pr.dst AS dst FROM p
       WHERE pr.src <> pr.dst),
edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
r1 AS (SELECT e.dst AS node,
         CAST(150000 + (850 * SUM(r0.r // d.deg)) // 1000 AS BIGINT) AS r
       FROM edges e JOIN r0 ON e.src = r0.node
       JOIN deg d ON e.src = d.src GROUP BY 1),
r2 AS (SELECT e.dst AS node,
         CAST(150000 + (850 * SUM(r1.r // d.deg)) // 1000 AS BIGINT) AS r
       FROM edges e JOIN r1 ON e.src = r1.node
       JOIN deg d ON e.src = d.src GROUP BY 1),
r3 AS (SELECT e.dst AS node,
         CAST(150000 + (850 * SUM(r2.r // d.deg)) // 1000 AS BIGINT) AS r
       FROM edges e JOIN r2 ON e.src = r2.node
       JOIN deg d ON e.src = d.src GROUP BY 1)
SELECT node AS token, r AS rank_x1e6 FROM r3
ORDER BY r DESC, node LIMIT 20""",

    // q148: the ordered funnel replayed with the same staged
    // conditional-min joins.
    "q148_events_funnel" -> """WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
u1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM e
       WHERE event_type = 'signup' GROUP BY 1),
u2 AS (SELECT e.user_id, MIN(ts_us) AS t2 FROM e JOIN u1 USING (user_id)
       WHERE event_type = 'click' AND ts_us > t1 GROUP BY 1),
u3 AS (SELECT e.user_id, MIN(ts_us) AS t3 FROM e JOIN u2 USING (user_id)
       WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY 1)
SELECT
  CAST((SELECT COUNT(DISTINCT user_id) FROM e) AS BIGINT) AS users_total,
  CAST((SELECT COUNT(*) FROM u1) AS BIGINT) AS step1_signup,
  CAST((SELECT COUNT(*) FROM u2) AS BIGINT) AS step2_click,
  CAST((SELECT COUNT(*) FROM u3) AS BIGINT) AS step3_purchase,
  CAST(floor((SELECT COUNT(*) FROM u2) * 1000.0
    / (SELECT COUNT(*) FROM u1)) AS BIGINT) AS conv2_x1000,
  CAST(floor((SELECT COUNT(*) FROM u3) * 1000.0
    / (SELECT COUNT(*) FROM u2)) AS BIGINT) AS conv3_x1000""",

    // q149: retention re-derived with the same integer day windows.
    "q149_events_retention" -> """WITH e AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
c AS (SELECT user_id, MIN(day) AS day0 FROM e GROUP BY 1)
SELECT day0,
  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS cohort_users,
  CAST(COUNT(DISTINCT CASE WHEN e.day - c.day0 BETWEEN 1 AND 7
    THEN e.user_id END) AS BIGINT) AS retained_w1,
  CAST(COUNT(DISTINCT CASE WHEN e.day - c.day0 BETWEEN 8 AND 14
    THEN e.user_id END) AS BIGINT) AS retained_w2,
  CAST(COUNT(DISTINCT CASE WHEN e.day - c.day0 BETWEEN 15 AND 28
    THEN e.user_id END) AS BIGINT) AS retained_w4
FROM e JOIN c USING (user_id)
GROUP BY 1 ORDER BY 1""",

    // q152: both merge transitions replayed; each version's summary must
    // match the engine's chained full-outer reconstruction exactly.
    "q152_corpus_timetravel" -> s"""WITH v0 AS (
  SELECT doc_id, source, text FROM documents
  WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 10 < 7
),
b1 AS (
  SELECT doc_id, source AS isource, text || ' v2' AS text2,
    CASE WHEN doc_id % 17 = 0 THEN 'delete' ELSE 'upsert' END AS op
  FROM documents
  WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 10 >= 4
),
v1 AS (
  SELECT COALESCE(s.doc_id, b.doc_id) AS doc_id,
    COALESCE(s.source, b.isource) AS source,
    CASE WHEN b.op = 'upsert' THEN b.text2 ELSE s.text END AS text
  FROM v0 s FULL OUTER JOIN b1 b ON s.doc_id = b.doc_id
  WHERE b.op IS NULL OR b.op = 'upsert'
),
b2 AS (
  SELECT doc_id, source AS isource, text || ' v3' AS text2,
    CASE WHEN doc_id % 19 = 0 THEN 'delete' ELSE 'upsert' END AS op
  FROM documents WHERE doc_id % 3 = 0
),
v2 AS (
  SELECT COALESCE(s.doc_id, b.doc_id) AS doc_id,
    COALESCE(s.source, b.isource) AS source,
    CASE WHEN b.op = 'upsert' THEN b.text2 ELSE s.text END AS text
  FROM v1 s FULL OUTER JOIN b2 b ON s.doc_id = b.doc_id
  WHERE b.op IS NULL OR b.op = 'upsert'
)
SELECT CAST(0 AS BIGINT) AS version, CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(length(text)) AS BIGINT) AS chars,
  CAST(SUM(doc_id % 1000003) AS BIGINT) AS id_checksum FROM v0
UNION ALL
SELECT 1, CAST(COUNT(*) AS BIGINT), CAST(SUM(length(text)) AS BIGINT),
  CAST(SUM(doc_id % 1000003) AS BIGINT) FROM v1
UNION ALL
SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(length(text)) AS BIGINT),
  CAST(SUM(doc_id % 1000003) AS BIGINT) FROM v2
ORDER BY version""",

    // q147: MERGE replayed as the same full-outer classification; the
    // char mass + id checksum pin which text version each row kept.
    "q147_corpus_merge" -> s"""WITH b AS (
  SELECT doc_id, source AS bsource, text AS btext FROM documents
  WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 10 < 7
),
i AS (
  SELECT doc_id, source AS isource, text || ' v2' AS text2,
    CASE WHEN doc_id % 17 = 0 THEN 'delete' ELSE 'upsert' END AS op
  FROM documents
  WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 10 >= 4
),
m AS (
  SELECT COALESCE(b.doc_id, i.doc_id) AS doc_id,
    COALESCE(b.bsource, i.isource) AS source, b.btext, i.text2, i.op
  FROM b FULL OUTER JOIN i ON b.doc_id = i.doc_id
),
c AS (
  SELECT *,
    CASE WHEN btext IS NOT NULL AND op = 'delete' THEN 'deleted'
         WHEN btext IS NULL AND op = 'delete' THEN 'noop_delete'
         WHEN btext IS NOT NULL AND op = 'upsert' THEN 'updated'
         WHEN btext IS NULL AND op = 'upsert' THEN 'inserted'
         ELSE 'unchanged' END AS cls,
    CASE WHEN op = 'upsert' THEN text2
         WHEN op IS NULL THEN btext END AS final_text
  FROM m
)
SELECT source,
  CAST(SUM(CASE WHEN btext IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS base_docs,
  CAST(SUM(CASE WHEN op IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS incoming_docs,
  CAST(SUM(CASE WHEN cls = 'inserted' THEN 1 ELSE 0 END) AS BIGINT)
    AS inserted,
  CAST(SUM(CASE WHEN cls = 'updated' THEN 1 ELSE 0 END) AS BIGINT)
    AS updated,
  CAST(SUM(CASE WHEN cls = 'deleted' THEN 1 ELSE 0 END) AS BIGINT)
    AS deleted,
  CAST(SUM(CASE WHEN cls = 'noop_delete' THEN 1 ELSE 0 END) AS BIGINT)
    AS noop_deletes,
  CAST(SUM(CASE WHEN cls = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
    AS unchanged,
  CAST(COUNT(final_text) AS BIGINT) AS final_docs,
  CAST(COALESCE(SUM(CASE WHEN final_text IS NOT NULL
    THEN length(final_text) END), 0) AS BIGINT) AS final_chars,
  CAST(COALESCE(SUM(CASE WHEN final_text IS NOT NULL
    THEN doc_id % 1000003 END), 0) AS BIGINT) AS id_checksum
FROM c GROUP BY 1 ORDER BY 1""",

    // q146: the STCS what-if re-derived from the meta rollup — same
    // bit-length tiers, same threshold flag, same reclaim ratio.
    "q146_sstables_stcs" -> s"""WITH $fixtures
SELECT tbl, CAST(length(bin(uncompressed_length)) AS BIGINT) AS tier,
  CAST(COUNT(*) AS BIGINT) AS sstables,
  CAST(SUM(uncompressed_length) AS BIGINT) AS total_bytes,
  CAST(MIN(uncompressed_length) AS BIGINT) AS min_bytes,
  CAST(MAX(uncompressed_length) AS BIGINT) AS max_bytes,
  CAST(SUM(droppable_tombstone_count) AS BIGINT) AS droppable_tombstones,
  CAST(SUM(cell_count) AS BIGINT) AS cells,
  COUNT(*) >= 4 AS would_compact,
  CAST(floor(SUM(droppable_tombstone_count) * 1000 / SUM(cell_count))
    AS BIGINT) AS reclaim_x1000
FROM meta GROUP BY 1, 2 ORDER BY 1, 2""",

    // mirror of IndexDb.sstableSection off raw files (q50): sizes from
    // Index.db offset deltas, last partition closed by the Statistics.db
    // uncompressed length; recomputed here from the parquet derivations.
    "q50_pstats_raw_sizes" -> s"""WITH $fixtures,
idx AS (
  SELECT sstable_id, key,
    CAST(COALESCE(SUM(size) OVER (PARTITION BY sstable_id ORDER BY key
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS position
  FROM lipscan
),
sized AS (
  SELECT i.sstable_id,
    CAST(COALESCE(lead(i.position) OVER (PARTITION BY i.sstable_id
        ORDER BY i.position), m.uncompressed_length) - i.position
      AS BIGINT) AS size
  FROM idx i JOIN meta m ON i.sstable_id = m.sstable_id AND m.tbl = 'lineitem'
)
SELECT sstable_id, CAST(COUNT(*) AS BIGINT) AS partition_count,
  CAST(MAX(size) AS BIGINT) AS max_partition_size,
  CAST(SUM(size) AS BIGINT) AS uncompressed_length,
  CAST(floor(SUM(size) / COUNT(*)) AS BIGINT) AS avg_partition_size
FROM sized GROUP BY 1 ORDER BY 1""",

    // q101: the bti Partitions.db trie full-scan must reproduce EXACTLY
    // the big-format Index.db answer on the same logical data — the
    // oracle is q50's SQL verbatim (the format is invisible to the
    // relation, which is the point).
    "q101_pstats_bti" -> s"""WITH $fixtures,
idx AS (
  SELECT sstable_id, key,
    CAST(COALESCE(SUM(size) OVER (PARTITION BY sstable_id ORDER BY key
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS position
  FROM lipscan
),
sized AS (
  SELECT i.sstable_id,
    CAST(COALESCE(lead(i.position) OVER (PARTITION BY i.sstable_id
        ORDER BY i.position), m.uncompressed_length) - i.position
      AS BIGINT) AS size
  FROM idx i JOIN meta m ON i.sstable_id = m.sstable_id AND m.tbl = 'lineitem'
)
SELECT sstable_id, CAST(COUNT(*) AS BIGINT) AS partition_count,
  CAST(MAX(size) AS BIGINT) AS max_partition_size,
  CAST(SUM(size) AS BIGINT) AS uncompressed_length,
  CAST(floor(SUM(size) / COUNT(*)) AS BIGINT) AS avg_partition_size
FROM sized GROUP BY 1 ORDER BY 1""",

    // q102: the bti point-lookup relation IS the partition index —
    // (sstable, key, running-sum position) recomputed from parquet; any
    // wrong trie descent, payload decode or hash-filter rejection breaks
    // the row hash.
    "q102_bti_lookup" -> s"""WITH $fixtures,
idx AS (
  SELECT sstable_id, key,
    CAST(COALESCE(SUM(size) OVER (PARTITION BY sstable_id ORDER BY key
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS position
  FROM lipscan
)
SELECT sstable_id, key, position FROM idx ORDER BY 1, 2""",

    // q103: the bti Rows.db roundtrip — the oracle recomputes the block
    // model (blocks = ceil(size / 4096), separator clustering prefixes
    // key*4096+b, offsets b*4096, data positions = running sums) from
    // parquet; sep_sum replays the engine's decode of every composite
    // separator (per-block modular sum needs the per-block unnest, the
    // ordinal model's closed form no longer applies); tiled_ok and
    // hash_ok are engine-verified structural checks that must equal the
    // indexed / partition counts.
    "q103_bti_row_index" -> s"""WITH $fixtures,
idx AS (
  SELECT sstable_id, key, size,
    CAST(COALESCE(SUM(size) OVER (PARTITION BY sstable_id ORDER BY key
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS position
  FROM lipscan
),
b AS (
  SELECT i.sstable_id, i.key, i.position,
    CAST(floor((i.size + 4095) / 4096) AS BIGINT) AS nblocks,
    p.range_tombstone_count AS rtc,
    p.min_timestamp_us AS mts, p.min_local_deletion_time_s AS mldt
  FROM idx i JOIN lipscan p
    ON i.sstable_id = p.sstable_id AND i.key = p.key
),
seps AS (
  SELECT sstable_id,
    CAST(SUM((key * 4096 + bb.b) % 1000003) AS BIGINT) AS sep_sum
  FROM b, LATERAL unnest(generate_series(0, nblocks - 1)) AS bb(b)
  WHERE nblocks > 1
  GROUP BY 1
)
SELECT b.sstable_id,
  CAST(COUNT(*) AS BIGINT) AS partitions,
  CAST(SUM(CASE WHEN nblocks > 1 THEN 1 ELSE 0 END) AS BIGINT) AS indexed,
  CAST(SUM(CASE WHEN nblocks > 1 THEN nblocks ELSE 0 END) AS BIGINT) AS blocks,
  CAST(COALESCE(ANY_VALUE(s.sep_sum), 0) AS BIGINT) AS sep_sum,
  CAST(SUM(CASE WHEN nblocks > 1 THEN nblocks * (nblocks - 1) / 2 * 4096 ELSE 0 END) AS BIGINT) AS offs_sum,
  CAST(SUM(position % 1000003) AS BIGINT) AS pos_sum,
  CAST(SUM(CASE WHEN nblocks > 1 THEN 1 ELSE 0 END) AS BIGINT) AS tiled_ok,
  CAST(COUNT(*) AS BIGINT) AS hash_ok,
  CAST(SUM(CASE WHEN nblocks > 1 AND rtc > 0 THEN nblocks - 1 ELSE 0 END)
    AS BIGINT) AS markers,
  CAST(SUM(CASE WHEN nblocks > 1 AND rtc > 0
    THEN (nblocks - 1) * (mts % 1000003) ELSE 0 END) AS BIGINT) AS md_sum,
  CAST(SUM(CASE WHEN nblocks > 1 AND rtc > 0
    THEN (nblocks - 1) * (mldt % 1000003) ELSE 0 END) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN nblocks > 1 THEN 1 ELSE 0 END) AS BIGINT) AS marker_ok
FROM b LEFT JOIN seps s ON b.sstable_id = s.sstable_id
GROUP BY 1 ORDER BY 1""",

    // mirror of EventsOps.errorAsofClick: strict (ts, event_id)-before
    // frame makes the as-of match total — no tie ambiguity between engines.
    "q51_events_asof" -> """WITH u AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
    CASE WHEN event_type = 'click' THEN event_id END AS click_id,
    CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_ts_us
  FROM events WHERE event_type IN ('click', 'error')
), w AS (
  SELECT event_id, user_id, event_type, ts_us,
    last_value(click_id IGNORE NULLS) OVER (PARTITION BY user_id
      ORDER BY ts_us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_id,
    last_value(click_ts_us IGNORE NULLS) OVER (PARTITION BY user_id
      ORDER BY ts_us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_ts_us
  FROM u
)
SELECT event_id, user_id, ts_us, prev_click_id,
  ts_us - prev_click_ts_us AS lag_us
FROM w WHERE event_type = 'error' ORDER BY event_id""",

    "q55_events_props_json" -> """SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events GROUP BY 1 ORDER BY 1""",

    // q136: the range join replayed as the DIRECT non-equi join (the form
    // the engine's bucket decomposition must be relation-identical to).
    // Same sessionization as q31; epoch_us keeps the µs arithmetic exact.
    "q136_events_range_join" -> """WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
),
lagd AS (
  SELECT user_id, event_id, ts_us,
    lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
  FROM e
),
marks AS (
  SELECT user_id, event_id, ts_us,
    CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS s
  FROM lagd
),
sess AS (
  SELECT user_id, event_id, ts_us,
    SUM(s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marks
),
iv AS (
  SELECT user_id AS owner_id, session_id,
    CAST(MIN(ts_us) AS BIGINT) AS start_us,
    CAST(MAX(ts_us) AS BIGINT) AS end_us,
    CAST(COUNT(*) AS BIGINT) AS own_events
  FROM sess GROUP BY 1, 2
),
top AS (
  SELECT *, end_us - start_us AS duration_us FROM iv
  ORDER BY duration_us DESC, owner_id, session_id LIMIT 50
),
hits AS (
  SELECT t.owner_id, t.session_id,
    CAST(COUNT(e.event_id) AS BIGINT) AS xuser_events,
    CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS xusers
  FROM top t LEFT JOIN e
    ON e.ts_us >= t.start_us AND e.ts_us <= t.end_us
      AND e.user_id <> t.owner_id
  GROUP BY 1, 2
)
SELECT t.owner_id, t.start_us, t.end_us, t.duration_us, t.own_events,
  h.xuser_events, h.xusers
FROM top t JOIN hits h ON t.owner_id = h.owner_id
  AND t.session_id = h.session_id
ORDER BY xuser_events DESC, t.owner_id, t.start_us""",

    // q140: the Morton interleave replayed with DuckDB's own bit
    // operators (the same magic-mask spread chain, staged through CTE
    // columns), the two bucketings, the 16-box grid off the exact maxima
    // (`//` == Spark's `div` on these nonnegative operands), and the
    // per-box file-touch counts.
    "q140_events_zorder_skip" -> """WITH e0 AS (
  SELECT event_id, user_id AS ux, epoch_us(ts) // 3600000000 AS uy
  FROM events
),
mx AS (SELECT MIN(ux) AS umin, MAX(ux) AS umax,
              MIN(uy) AS hmin, MAX(uy) AS hmax FROM e0),
e AS (
  SELECT event_id,
    (ux - umin) * 65536 // (umax - umin + 1) AS sx,
    (uy - hmin) * 65536 // (hmax - hmin + 1) AS sy
  FROM e0, mx
),
s1 AS (SELECT event_id, sx, sy,
  ((sx & 65535) | ((sx & 65535) << 8)) & 16711935 AS x1,
  ((sy & 65535) | ((sy & 65535) << 8)) & 16711935 AS y1 FROM e),
s2 AS (SELECT *, (x1 | (x1 << 4)) & 252645135 AS x2,
  (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
s3 AS (SELECT *, (x2 | (x2 << 2)) & 858993459 AS x3,
  (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
s4 AS (SELECT *, (x3 | (x3 << 1)) & 1431655765 AS xs,
  (y3 | (y3 << 1)) & 1431655765 AS ys FROM s3),
zb AS (SELECT event_id, sx, sy,
  ((xs | (ys << 1)) >> 26) AS zbucket,
  sy * 64 // 65536 AS lbucket FROM s4),
boxes AS (
  SELECT t.range AS box_id,
    CASE WHEN t.range < 8 THEN t.range * 8192
         ELSE (t.range - 8) * 8192 END AS xlo,
    CASE WHEN t.range < 8 THEN (t.range + 1) * 8192
         ELSE (t.range - 7) * 8192 END AS xhi,
    CASE WHEN t.range < 8 THEN t.range * 8192
         ELSE (15 - t.range) * 8192 END AS ylo,
    CASE WHEN t.range < 8 THEN (t.range + 1) * 8192
         ELSE (16 - t.range) * 8192 END AS yhi
  FROM range(0, 16) t
)
SELECT b.box_id, CAST(COUNT(*) AS BIGINT) AS rows_matched,
  CAST(COUNT(DISTINCT zbucket) AS BIGINT) AS zorder_files,
  CAST(COUNT(DISTINCT lbucket) AS BIGINT) AS linear_files
FROM zb, boxes b
WHERE sx >= b.xlo AND sx < b.xhi AND sy >= b.ylo AND sy < b.yhi
GROUP BY 1 ORDER BY 1""",

    // q142: CUBE replayed with DuckDB's own CUBE; gid re-derived from the
    // NULL pattern (no natural nulls in either dimension), matching
    // Spark grouping_id()'s first-column-MSB bitmask.
    "q142_events_cube" -> """SELECT event_type,
  strftime(ts, '%Y-%m-%d') AS day,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
    AS value_x100_sum,
  CAST(GROUPING(event_type) * 2 + GROUPING(day) AS BIGINT) AS gid
FROM events GROUP BY CUBE (event_type, day)""",

    // q143: the pivot as explicit conditional sums — the relational
    // definition the PIVOT sugar lowers to.
    "q143_events_pivot" -> """SELECT strftime(ts, '%Y-%m-%d') AS day,
  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
    AS click,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
    AS error,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
    AS purchase,
  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
    AS signup,
  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
    AS view
FROM events GROUP BY 1 ORDER BY 1""",

    // q141: the salted join's contract — the plain (unsalted) join; the
    // engine's salt must be invisible in the relation.
    "q141_events_skew_join" -> """WITH f AS (
  SELECT event_id,
    CASE WHEN user_id < 75 THEN 0 ELSE user_id END AS skey,
    event_type, CAST(floor(value * 100) AS BIGINT) AS value_x100
  FROM events
),
d AS (SELECT skey, MIN(event_id) AS owner_tag FROM f GROUP BY 1)
SELECT f.skey, CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(f.value_x100) AS BIGINT) AS value_x100_sum,
  CAST(COUNT(DISTINCT f.event_type) AS BIGINT) AS types,
  CAST(MIN(d.owner_tag) AS BIGINT) AS owner_tag
FROM f JOIN d ON f.skey = d.skey
GROUP BY 1 ORDER BY 1""",

    // string chunk keys here vs xxhash64 keys in the Spark plan: equal
    // unless two distinct chunks collide in 64 bits (q21's documented class)
    "q52_chunk_dedup" -> """WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
), ch AS (
  SELECT doc_id, source, array_to_string(w[i.i:i.i+9], ' ') AS chunk
  FROM words, LATERAL (SELECT unnest(generate_series(1, len(w), 10)) AS i) i
), freq AS (
  SELECT chunk, COUNT(*) AS c FROM ch GROUP BY 1
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS chunks,
  CAST(SUM(CASE WHEN f.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS shared_chunks,
  CAST(COUNT(DISTINCT ch.chunk) AS BIGINT) AS distinct_chunks
FROM ch JOIN freq f USING (chunk)
GROUP BY 1 ORDER BY 1""",

    "q53_vocab_topk" -> """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS occurrences,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS docs
FROM tok GROUP BY 1
ORDER BY occurrences DESC, token LIMIT 50""",

    // mirror of TextStats.sampleRollup's PortableHash(doc_id) % 1000 < 100
    "q54_sample_stratified" -> s"""WITH d AS (
  SELECT source, n_chars,
    (${h60("CAST(doc_id AS VARCHAR)")} % 1000 < 100) AS keep
  FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS sampled_docs,
  CAST(SUM(CASE WHEN keep THEN n_chars END) AS BIGINT) AS sampled_chars
FROM d GROUP BY 1 ORDER BY 1""",

    // connected components of the q21 near-dup pair graph via a recursive
    // CTE: walk accumulates every (node, reachable-node) pair — finite, so
    // UNION-dedup recursion terminates; min over reachable ids = the
    // propagated label the Spark loop converges to.
    // q157: the leak-free split re-derived from the TRANSITIVE CLOSURE —
    // same dup threshold, same component labels (q56's walk), same
    // group-hash split; the audit column is recomputed here, so an
    // engine split that leaked a dup pair across sides would mismatch.
    "q157_dedup_split" -> s"""WITH RECURSIVE $corpus, $shingles,
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
szs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
dup AS (
  SELECT p.id_a, p.id_b FROM pairs p
  JOIN szs sa ON p.id_a = sa.doc_id
  JOIN szs sb ON p.id_b = sb.doc_id
  WHERE p.inter * 100 >= 80 * (sa.sz + sb.sz - p.inter)
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM dup
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM dup
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
walk(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst AS id, w.label FROM walk w JOIN edges e ON e.src = w.id
),
labels AS (SELECT id, MIN(label) AS label FROM walk GROUP BY id),
grp AS (
  SELECT c.doc_id, c.source,
    CAST(len(string_split(c.text, ' ')) AS BIGINT) AS token_count,
    COALESCE(l.label, c.doc_id) AS group_id
  FROM corpus c LEFT JOIN labels l ON l.id = c.doc_id
),
tagged AS (
  SELECT *,
    (${h60("'split:' || CAST(group_id AS VARCHAR)")} % 1000 < 100) AS is_val
  FROM grp
),
leaks AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN ta.is_val <> tb.is_val
    THEN 1 ELSE 0 END), 0) AS BIGINT) AS cross_split_dup_pairs
  FROM dup d
  JOIN tagged ta ON ta.doc_id = d.id_a
  JOIN tagged tb ON tb.doc_id = d.id_b
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(CASE WHEN NOT is_val THEN 1 ELSE 0 END) AS BIGINT) AS train_docs,
  CAST(SUM(CASE WHEN is_val THEN 1 ELSE 0 END) AS BIGINT) AS val_docs,
  CAST(SUM(CASE WHEN NOT is_val THEN token_count ELSE 0 END) AS BIGINT)
    AS train_tokens,
  CAST(SUM(CASE WHEN is_val THEN token_count ELSE 0 END) AS BIGINT)
    AS val_tokens,
  (SELECT cross_split_dup_pairs FROM leaks) AS cross_split_dup_pairs
FROM tagged GROUP BY 1 ORDER BY 1""",

    "q56_dup_clusters" -> s"""WITH RECURSIVE $corpus, $shingles,
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
szs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
dup AS (
  SELECT p.id_a, p.id_b FROM pairs p
  JOIN szs sa ON p.id_a = sa.doc_id
  JOIN szs sb ON p.id_b = sb.doc_id
  WHERE p.inter * 100 >= 80 * (sa.sz + sb.sz - p.inter)
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM dup
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM dup
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
walk(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst AS id, w.label FROM walk w JOIN edges e ON e.src = w.id
),
labels AS (SELECT id, MIN(label) AS label FROM walk GROUP BY id)
SELECT l.id AS doc_id, CAST(l.label AS BIGINT) AS cluster_rep,
  CAST(s.cluster_size AS BIGINT) AS cluster_size
FROM labels l
JOIN (SELECT label, COUNT(*) AS cluster_size FROM labels GROUP BY 1) s
  USING (label)
ORDER BY doc_id""",

    // q86: removal-stage mirror of q80 — keeper filter before the same
    // run-length window, rolled up per source (gram keyed by TEXT here vs
    // xxhash64 in the engine: q21's documented collision class).
    "q86_dup_span_removal" -> s"""WITH $corpus,
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
nt AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM toks),
grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS s, array_to_string(w[i:i+4], ' ') AS g
  FROM toks, UNNEST(range(1, len(w) - 3)) AS t(i)
  WHERE len(w) >= 5
),
dupk AS (
  SELECT g, MIN(doc_id) AS keeper FROM grams
  GROUP BY g HAVING MIN(doc_id) <> MAX(doc_id)
),
runs AS (
  SELECT gr.doc_id, gr.s,
    lag(gr.s) OVER (PARTITION BY gr.doc_id ORDER BY gr.s) AS ps
  FROM grams gr JOIN dupk d USING (g)
  WHERE gr.doc_id <> d.keeper
),
rem AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN ps IS NULL THEN 5 ELSE LEAST(5, s - ps) END)
      AS BIGINT) AS removed_tokens
  FROM runs GROUP BY 1
)
SELECT c.source,
  CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(CASE WHEN COALESCE(r.removed_tokens, 0) > 0 THEN 1 ELSE 0 END)
    AS BIGINT) AS docs_touched,
  CAST(SUM(n.n_tokens) AS BIGINT) AS tokens_total,
  CAST(SUM(COALESCE(r.removed_tokens, 0)) AS BIGINT) AS tokens_removed,
  CAST(floor(SUM(COALESCE(r.removed_tokens, 0)) * 1000 / SUM(n.n_tokens))
    AS BIGINT) AS removed_x1000
FROM corpus c
JOIN nt n USING (doc_id)
LEFT JOIN rem r USING (doc_id)
GROUP BY 1 ORDER BY 1""",

    // q87: the invariant the component guarantees — every sstable's chunk
    // CRCs verify (the spec pins the negative: one flipped byte fails
    // exactly one chunk); sstable ids recomputed from parquet.
    "q87_crc_verify" -> s"""WITH $fixtures
SELECT sstable_id, CAST(1 AS BIGINT) AS crc_ok
FROM lipscan GROUP BY 1 ORDER BY 1""",

    // q91: planted-PII corpus re-derived, the same three regexes run
    // through DuckDB's RE2 (the patterns live in the Java∩RE2 overlap).
    "q91_pii_scan" -> """WITH pii AS (
  SELECT source,
    text || CASE WHEN doc_id % 11 = 0 THEN ' contact admin' ||
        CAST(doc_id % 100 AS VARCHAR) || '@example.com for help'
      ELSE '' END
      || CASE WHEN doc_id % 13 = 0 THEN ' server 10.' ||
        CAST(doc_id % 200 AS VARCHAR) || '.0.1 responded' ELSE '' END
      || CASE WHEN doc_id % 17 = 0 THEN ' call 555-01' ||
        lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' today'
      ELSE '' END AS text
  FROM documents
),
per AS (
  SELECT source,
    CAST(len(regexp_extract_all(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
      AS emails,
    CAST(len(regexp_extract_all(text,
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS ips,
    CAST(len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) AS BIGINT)
      AS phones,
    CAST(COALESCE(list_sum(list_transform(regexp_extract_all(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'),
        x -> length(x))), 0)
      + COALESCE(list_sum(list_transform(regexp_extract_all(text,
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'), x -> length(x))), 0)
      + COALESCE(list_sum(list_transform(regexp_extract_all(text,
        '\b\d{3}-\d{4}\b'), x -> length(x))), 0) AS BIGINT) AS pii_chars
  FROM pii
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(CASE WHEN emails + ips + phones > 0 THEN 1 ELSE 0 END)
    AS BIGINT) AS docs_with_pii,
  CAST(SUM(emails) AS BIGINT) AS emails,
  CAST(SUM(ips) AS BIGINT) AS ips,
  CAST(SUM(phones) AS BIGINT) AS phones,
  CAST(SUM(pii_chars) AS BIGINT) AS pii_chars
FROM per GROUP BY 1 ORDER BY 1""",

    // q92: planted page chrome re-derived; line keyed by TEXT here vs
    // xxhash64 in the engine (q21's documented collision class).
    "q92_boilerplate" -> """WITH pages AS (
  SELECT doc_id, source,
    list_concat(list_concat(list_concat(list_concat(
      ['subscribe to ' || source || ' newsletter'], [text]),
      CASE WHEN doc_id % 3 = 0 THEN ['accept our cookie policy']
        ELSE CAST([] AS VARCHAR[]) END),
      CASE WHEN doc_id % 50 = 0 THEN
        ['promo code ' || CAST(doc_id AS VARCHAR)]
        ELSE CAST([] AS VARCHAR[]) END),
      ['copyright ' || source]) AS lines
  FROM documents
),
lns AS (
  -- length(): CHARACTER count, matching Spark's length() on the engine
  -- side (strlen counts bytes and diverges on non-ASCII text)
  SELECT doc_id, source, l AS line, CAST(length(l) AS BIGINT) AS len
  FROM pages, UNNEST(lines) t(l)),
perline AS (
  SELECT source, line, COUNT(DISTINCT doc_id) AS line_docs,
    CAST(COUNT(*) AS BIGINT) AS occurrences, MAX(len) AS len
  FROM lns GROUP BY 1, 2),
persrc AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS docs FROM pages GROUP BY 1)
SELECT p.source, MAX(s.docs) AS docs,
  CAST(SUM(p.occurrences) AS BIGINT) AS line_instances,
  CAST(COUNT(*) AS BIGINT) AS distinct_lines,
  CAST(SUM(CASE WHEN p.line_docs * 100 >= s.docs * 30 THEN 1 ELSE 0 END)
    AS BIGINT) AS boilerplate_lines,
  CAST(SUM(CASE WHEN p.line_docs * 100 >= s.docs * 30 THEN p.occurrences
    ELSE 0 END) AS BIGINT) AS removed_instances,
  CAST(SUM(CASE WHEN p.line_docs * 100 >= s.docs * 30 THEN
    p.occurrences * p.len ELSE 0 END) AS BIGINT) AS chars_removed
FROM perline p JOIN persrc s USING (source)
GROUP BY 1 ORDER BY 1""",

    // q90: the full 3-step BPE training trace — per step the winning rule,
    // its (overlap-counted) pair frequency, and post-merge token mass +
    // distinct-symbol count; recursive CTEs replay the merge application.
    "q90_bpe_train" -> s"""WITH RECURSIVE
words AS (
  SELECT w AS word FROM documents, UNNEST(string_split(text, ' ')) t(w)
  WHERE w <> ''
),
v0 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
    string_split(word, '') AS syms
  FROM words GROUP BY word
),
${bpeStep(1)}, ${bpeStep(2)}, ${bpeStep(3)}
SELECT CAST(step AS BIGINT) AS step, left_sym, right_sym, merged, pair_freq,
  tokens_after, vocab_syms
FROM (${bpeStepReport(1)} UNION ALL ${bpeStepReport(2)}
  UNION ALL ${bpeStepReport(3)})
ORDER BY step""",

    // q98: the trained tokenizer APPLIED — the same v3 vocab the q90
    // trace ends on, joined back to the corpus word stream; per source,
    // whitespace vs BPE token counts and compression ratio.
    "q98_bpe_apply" -> s"""WITH RECURSIVE
words AS (
  SELECT w AS word FROM documents, UNNEST(string_split(text, ' ')) t(w)
  WHERE w <> ''
),
v0 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
    string_split(word, '') AS syms
  FROM words GROUP BY word
),
${bpeStep(1)}, ${bpeStep(2)}, ${bpeStep(3)},
docw AS (
  SELECT doc_id, source, w AS word
  FROM documents, UNNEST(string_split(text, ' ')) t(w)
  WHERE w <> ''
),
wt AS (SELECT word, CAST(len(syms) AS BIGINT) AS toks FROM v3)
SELECT source,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS docs,
  CAST(COUNT(*) AS BIGINT) AS ws_tokens,
  CAST(SUM(toks) AS BIGINT) AS bpe_tokens,
  CAST(floor(CAST(SUM(toks) AS BIGINT) * 1000 / COUNT(*)) AS BIGINT)
    AS compression_x1000
FROM docw JOIN wt USING (word)
GROUP BY 1 ORDER BY 1""",

    // q93: self-trained bigram LM scoring re-derived with TEXT-keyed
    // bigram counts (engine keys on xxhash64 — q21's documented collision
    // class); bits(x) = length(bin(x)) is exact in both engines.
    "q93_lm_score" -> """WITH
toks AS (SELECT doc_id, source, string_split(text, ' ') AS w
  FROM documents),
bg AS (
  SELECT doc_id, source, array_to_string(w[i:i+1], ' ') AS g
  FROM toks, UNNEST(range(1, greatest(len(w), 2))) AS t(i)
),
gc AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1),
nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM gc),
cm AS (
  SELECT floor(CAST(SUM(c * (length(bin(n_total)) - length(bin(c))))
      AS BIGINT) * 1000 / CAST(SUM(c) AS BIGINT)) AS corpus_x1000
  FROM gc CROSS JOIN nt
),
per AS (
  SELECT doc_id, source,
    CAST(COUNT(*) AS BIGINT) AS nb,
    CAST(SUM(length(bin(n_total)) - length(bin(c))) AS BIGINT) AS sum_bits,
    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel
  FROM bg JOIN gc USING (g) CROSS JOIN nt
  GROUP BY 1, 2
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(nb) AS BIGINT) AS bigrams,
  CAST(floor(CAST(SUM(sum_bits) AS BIGINT) * 1000 /
    CAST(SUM(nb) AS BIGINT)) AS BIGINT) AS avg_surprisal_x1000,
  CAST(floor(CAST(SUM(novel) AS BIGINT) * 1000 /
    CAST(SUM(nb) AS BIGINT)) AS BIGINT) AS novel_x1000,
  CAST(SUM(CASE WHEN floor(sum_bits * 1000 / nb) + 150 <= corpus_x1000
    THEN 1 ELSE 0 END) AS BIGINT) AS common_docs
FROM per CROSS JOIN cm GROUP BY 1 ORDER BY 1""",

    // q94: the five drop gates re-derived per doc (q73's rule split into
    // its constituents + q84's classifier sign), then the 15 unordered
    // filter pairs aggregated straight off the per-doc flags.
    "q94_filter_agreement" -> s"""WITH m AS (
  SELECT doc_id,
    len(string_split(text, ' ')) AS token_count,
    floor((length(text) - (len(string_split(text, ' ')) - 1)) * 100
      / len(string_split(text, ' '))) AS atl_x100,
    floor((length(text) - length(replace(text, ' the ', ''))) / 5)
      AS the_count,
    (SELECT CAST(SUM((${h60("t")} % 64) % 13 - 6) AS BIGINT)
     FROM UNNEST(string_split(text, ' ')) AS u(t)) AS clf_score
  FROM documents
),
f AS (
  SELECT doc_id,
    (token_count < 20) AS f_len,
    (atl_x100 < 300) AS f_shape_low,
    (atl_x100 > 1000) AS f_shape_high,
    (the_count < 1) AS f_stop,
    (clf_score <= 0) AS f_clf
  FROM m
),
names(filter_a) AS (VALUES ('clf'), ('len'), ('shape_high'),
  ('shape_low'), ('stop')),
pairs AS (
  SELECT a.filter_a, b.filter_a AS filter_b
  FROM names a CROSS JOIN names b WHERE a.filter_a <= b.filter_a
),
fv AS (
  SELECT doc_id, filter_a, filter_b,
    CASE filter_a WHEN 'clf' THEN f_clf WHEN 'len' THEN f_len
      WHEN 'shape_high' THEN f_shape_high
      WHEN 'shape_low' THEN f_shape_low ELSE f_stop END AS a_set,
    CASE filter_b WHEN 'clf' THEN f_clf WHEN 'len' THEN f_len
      WHEN 'shape_high' THEN f_shape_high
      WHEN 'shape_low' THEN f_shape_low ELSE f_stop END AS b_set
  FROM f CROSS JOIN pairs
),
agg AS (
  SELECT filter_a, filter_b,
    CAST(SUM(CASE WHEN a_set AND b_set THEN 1 ELSE 0 END) AS BIGINT)
      AS dropped_both,
    CAST(SUM(CASE WHEN a_set AND NOT b_set THEN 1 ELSE 0 END) AS BIGINT)
      AS dropped_a_only,
    CAST(SUM(CASE WHEN b_set AND NOT a_set THEN 1 ELSE 0 END) AS BIGINT)
      AS dropped_b_only
  FROM fv GROUP BY 1, 2
)
SELECT filter_a, filter_b, dropped_both, dropped_a_only, dropped_b_only,
  CAST(dropped_both + dropped_a_only + dropped_b_only AS BIGINT)
    AS union_docs,
  CAST(CASE WHEN dropped_both + dropped_a_only + dropped_b_only > 0
    THEN floor(dropped_both * 1000 /
      (dropped_both + dropped_a_only + dropped_b_only))
    ELSE 0 END AS BIGINT) AS jaccard_x1000
FROM agg ORDER BY 1, 2""",

    // q95: BM25-lite retrieval re-derived — same literal query workload,
    // same integer idf_bits × saturating-tf scoring, same (score desc,
    // doc_id) total rank order.
    "q95_keyword_search" -> """WITH
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
  FROM documents),
qt(query_id, term) AS (VALUES
  (1, 'dup'), (1, 'scan'),
  (2, 'spark'), (2, 'query'), (2, 'fast'),
  (3, 'hash'), (3, 'join'), (3, 'merge'),
  (4, 'window'), (4, 'filter'),
  (5, 'customer'), (5, 'data'), (5, 'slow')),
d AS (SELECT CAST(COUNT(*) AS BIGINT) AS d_total FROM documents),
tf AS (
  SELECT query_id, term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks JOIN qt ON t = term GROUP BY 1, 2, 3
),
dfr AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tf GROUP BY 1
),
sc AS (
  SELECT query_id, doc_id,
    CAST(SUM((length(bin(d_total)) - length(bin(df)) + 1) *
      floor(tf * 1000 / (tf + 1))) AS BIGINT) AS score
  FROM tf JOIN dfr USING (term) CROSS JOIN d GROUP BY 1, 2
),
rk AS (
  SELECT query_id, doc_id, score,
    row_number() OVER (PARTITION BY query_id
      ORDER BY score DESC, doc_id) AS rank
  FROM sc
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
  doc_id, score
FROM rk WHERE rank <= 10 ORDER BY 1, 2""",

    // q96: base/incoming token-distribution drift, TEXT-keyed tokens
    // (engine keys xxhash64), same q85 hash split, same cross-multiplied
    // integer TV.
    "q96_corpus_drift" -> s"""WITH d AS (
  SELECT source,
    (${h60("CAST(doc_id AS VARCHAR)")} % 10 < 4) AS inc,
    string_split(text, ' ') AS w
  FROM documents
),
tk AS (SELECT source, inc, t FROM d, UNNEST(w) AS u(t)),
c AS (
  SELECT source, t,
    CAST(SUM(CASE WHEN inc THEN 0 ELSE 1 END) AS BIGINT) AS ca,
    CAST(SUM(CASE WHEN inc THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM tk GROUP BY 1, 2
),
tot AS (
  SELECT source, CAST(SUM(ca) AS BIGINT) AS na,
    CAST(SUM(cb) AS BIGINT) AS nb
  FROM c GROUP BY 1
)
SELECT c.source,
  MAX(na) AS base_tokens,
  MAX(nb) AS inc_tokens,
  CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
  CAST(CASE WHEN MAX(na) > 0 AND MAX(nb) > 0 THEN
    floor(CAST(SUM(abs(ca * nb - cb * na)) AS BIGINT) * 1000000 /
      (2 * MAX(na) * MAX(nb)))
    ELSE 0 END AS BIGINT) AS tv_x1e6
FROM c JOIN tot USING (source)
GROUP BY 1 ORDER BY 1""",

    // q97: PNG roundtrip fields — dimensions and the pixel checksum are
    // pure functions of doc_id (byte i = (doc_id*7 + i*13) % 251), so the
    // oracle recomputes what the engine's full decode reconstructs.
    "q97_png_decode" -> """WITH p AS (
  SELECT doc_id, 4 + doc_id % 16 AS w, 4 + doc_id % 12 AS h
  FROM documents
),
s AS (
  SELECT doc_id, w, h,
    CAST(SUM((doc_id * 7 + i * 13) % 251) AS BIGINT) AS pixel_sum
  FROM p, UNNEST(range(0, w * h * 3)) AS t(i)
  GROUP BY 1, 2, 3
)
SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
  CAST(w * h * 3 AS BIGINT) AS pixel_bytes, pixel_sum
FROM s ORDER BY doc_id""",

    // q151: image dedup re-derived from the pixel-generator formula —
    // the engine must get the same two moments OUT OF THE REAL DECODE.
    "q151_dedup_image" -> """WITH g AS (
  SELECT doc_id, doc_id % 97 AS seed FROM documents
),
p AS (SELECT doc_id, seed, 4 + seed % 16 AS w, 4 + seed % 12 AS h FROM g),
s AS (
  SELECT doc_id, w, h,
    CAST(SUM((seed * 7 + i * 13) % 251) AS BIGINT) AS pixel_sum,
    CAST(SUM(((seed * 7 + i * 13) % 251) * (i + 1)) AS BIGINT) AS wsum
  FROM p, UNNEST(range(0, w * h * 3)) AS t(i)
  GROUP BY 1, 2, 3
)
SELECT CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
  pixel_sum, wsum,
  CAST(COUNT(*) AS BIGINT) AS copies,
  CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
  CAST(SUM(doc_id % 1000003) AS BIGINT) AS id_checksum
FROM s GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""",

    // q99: JPEG roundtrip through the JDK codec. Uniform gray v at
    // compression quality 1.0 decodes byte-exactly (Y=v/Cb=Cr=128 is an
    // exact color transform, all AC coefficients zero, quant tables all
    // 1s), so the decoded pixel sum is exactly 3·v·w·h — the oracle
    // recomputes what the engine's real Huffman/IDCT decode returned.
    // q113: the MP4 probe's fields are pure functions of doc_id (the
    // container is the real part; these formulas are what the writer
    // embeds and the box walker must recover). // is integer division.
    // q125: the WARC roundtrip — record/member counts and byte sums are
    // per-id formulas; the HTTP envelope length depends on the entity
    // length's DIGIT COUNT (Content-Length header), replayed exactly.
    "q125_warc_ingest" -> """WITH caps AS (
  SELECT doc_id, 1 + doc_id % 3 AS captures FROM documents
),
percap AS (
  SELECT doc_id, c, 40 + ((doc_id + c * 131) % 400) AS n
  FROM caps, UNNEST(range(0, captures)) AS t(c)
),
resp AS (
  SELECT doc_id,
    CAST(SUM(63 + (CASE WHEN n < 100 THEN 2 ELSE 3 END) + n) AS BIGINT)
      AS response_bytes
  FROM percap GROUP BY 1
),
body AS (
  SELECT doc_id,
    CAST(SUM(32 + (doc_id * 7 + c * 13 + i * 3) % 95) AS BIGINT) AS body_sum
  FROM percap, UNNEST(range(0, n)) AS t2(i)
  GROUP BY 1
)
SELECT d.doc_id,
  CAST(1 + 2 * (1 + d.doc_id % 3) AS BIGINT) AS records,
  CAST(1 + d.doc_id % 3 AS BIGINT) AS responses,
  r.response_bytes, b.body_sum,
  CAST(1 + 2 * (1 + d.doc_id % 3) AS BIGINT) AS gzip_members
FROM documents d
JOIN resp r ON d.doc_id = r.doc_id
JOIN body b ON d.doc_id = b.doc_id
ORDER BY d.doc_id""",
    // q126: TAR roundtrip — file sizes/bytes are per-id formulas; blocks
    // replay the 512-byte framing (1 header block + padded data blocks
    // per file + the two end-of-archive zero blocks).
    "q126_tar_ingest" -> """WITH f AS (
  SELECT doc_id, k, 30 + ((doc_id + k * 89) % 300) AS sz
  FROM documents, UNNEST(range(0, 2 + doc_id % 3)) AS t(k)
),
b AS (
  SELECT doc_id,
    CAST(COUNT(*) AS BIGINT) AS files,
    CAST(SUM(sz) AS BIGINT) AS total_bytes,
    CAST(SUM(1 + (sz + 511) // 512) + 2 AS BIGINT) AS blocks
  FROM f GROUP BY 1
),
s AS (
  SELECT doc_id,
    CAST(SUM(32 + (doc_id * 11 + k * 17 + i * 5) % 95) AS BIGINT) AS body_sum
  FROM f, UNNEST(range(0, sz)) AS t2(i) GROUP BY 1
)
SELECT b.doc_id, b.files, b.total_bytes, s.body_sum, b.blocks
FROM b JOIN s ON b.doc_id = s.doc_id ORDER BY b.doc_id""",
    // q127: ZIP roundtrip — entry counts/sizes/bytes per id; stored =
    // even entry ordinals, deflated = odd.
    "q127_zip_ingest" -> """WITH f AS (
  SELECT doc_id, k, 25 + ((doc_id + k * 67) % 350) AS sz
  FROM documents, UNNEST(range(0, 1 + doc_id % 3)) AS t(k)
),
b AS (
  SELECT doc_id,
    CAST(COUNT(*) AS BIGINT) AS entries,
    CAST(SUM(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS stored,
    CAST(SUM(CASE WHEN k % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS deflated,
    CAST(SUM(sz) AS BIGINT) AS uncompressed_bytes
  FROM f GROUP BY 1
),
s AS (
  SELECT doc_id,
    CAST(SUM(32 + (doc_id * 29 + k * 31 + i * 7) % 95) AS BIGINT) AS body_sum
  FROM f, UNNEST(range(0, sz)) AS t2(i) GROUP BY 1
)
SELECT b.doc_id, b.entries, b.stored, b.deflated, b.uncompressed_bytes,
  s.body_sum
FROM b JOIN s ON b.doc_id = s.doc_id ORDER BY b.doc_id""",
    // q123: the H.264 header probe — profile/level/dims/refs are per-id
    // formulas recovered through the real NAL walk + Exp-Golomb SPS.
    "q123_h264_probe" -> """SELECT doc_id,
  CAST(CASE doc_id % 3 WHEN 0 THEN 66 WHEN 1 THEN 77 ELSE 88 END AS BIGINT) AS profile,
  CAST(31 AS BIGINT) AS level,
  CAST((8 + doc_id % 113) * 16 AS BIGINT) AS width,
  CAST((5 + doc_id % 61) * 16 AS BIGINT) AS height,
  CAST(1 + doc_id % 4 AS BIGINT) AS ref_frames,
  CAST(3 AS BIGINT) AS nals
FROM documents ORDER BY doc_id""",
    // q124: the Opus TOC probe — framing code, stereo bit, frame count
    // and the RFC 6716 config->duration table replayed per id.
    "q124_opus_toc" -> """WITH t AS (
  SELECT doc_id, doc_id % 32 AS config, doc_id % 4 AS code,
    20 + doc_id % 200 AS fl
  FROM documents
),
d AS (
  SELECT *, CASE WHEN config < 12 THEN config % 4
    WHEN config < 16 THEN config % 2 + 4
    ELSE config % 4 + 6 END AS idx
  FROM t
)
SELECT doc_id, CAST(config AS BIGINT) AS config,
  CAST(doc_id % 2 AS BIGINT) AS stereo,
  CAST(CASE code WHEN 0 THEN 1 WHEN 3 THEN 3 ELSE 2 END AS BIGINT) AS frames,
  CAST((CASE idx WHEN 0 THEN 10000 WHEN 1 THEN 20000 WHEN 2 THEN 40000
    WHEN 3 THEN 60000 WHEN 4 THEN 10000 WHEN 5 THEN 20000 WHEN 6 THEN 2500
    WHEN 7 THEN 5000 WHEN 8 THEN 10000 ELSE 20000 END)
    * (CASE code WHEN 0 THEN 1 WHEN 3 THEN 3 ELSE 2 END) AS BIGINT) AS duration_us,
  CAST(CASE code WHEN 0 THEN fl WHEN 1 THEN 2 * fl
    WHEN 2 THEN 1 + 2 * fl ELSE 1 + 3 * fl END AS BIGINT) AS payload_bytes
FROM d ORDER BY doc_id""",
    // q122: the Ogg/Opus transport probe — per-id formulas recovered
    // through real page framing (pages/packets counts are structural
    // constants of the writer's 4-page, 3-packet layout).
    "q122_ogg_probe" -> """SELECT doc_id,
  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
  CAST(312 + doc_id % 100 AS BIGINT) AS preskip,
  CAST(48000 AS BIGINT) AS input_rate,
  CAST(300 + doc_id % 700 AS BIGINT) AS audio_bytes,
  CAST(3 AS BIGINT) AS packets,
  CAST(960 * (doc_id % 8 + 1) AS BIGINT) AS granule,
  CAST(4 AS BIGINT) AS pages
FROM documents ORDER BY doc_id""",
    // q120: the FLAC roundtrip — rate/blocksize/order are per-id
    // formulas; the decoded PCM sum must equal the generator's sum, so
    // the predictor + rice machinery is value-checked, not just framed.
    "q120_flac_decode" -> """WITH p AS (
  SELECT doc_id, 256 + doc_id % 512 AS n FROM documents
),
s AS (
  SELECT doc_id, n,
    CAST(SUM((doc_id * 31 + i * 7) % 4001 - 2000) AS BIGINT) AS sample_sum
  FROM p, UNNEST(range(0, n)) AS t(i) GROUP BY 1, 2
)
SELECT doc_id,
  CAST(8000 + (doc_id % 5) * 8000 AS BIGINT) AS sample_rate,
  CAST(n AS BIGINT) AS n_samples,
  CAST(doc_id % 3 AS BIGINT) AS pred_order,
  sample_sum
FROM s ORDER BY doc_id""",
    // q119: the WebM probe's fields are pure functions of doc_id — the
    // EBML container walk is the real part; these are what the writer
    // embeds and the walker must recover.
    "q119_webm_probe" -> """SELECT doc_id,
  CAST(2000 + (doc_id % 997) * 3 AS BIGINT) AS duration_ms,
  CAST(320 + (doc_id % 16) * 8 AS BIGINT) AS width,
  CAST(180 + (doc_id % 9) * 12 AS BIGINT) AS height,
  'V_VP9' AS video_codec,
  CASE WHEN doc_id % 4 <> 0 THEN 'A_OPUS' ELSE '' END AS audio_codec,
  CAST(CASE WHEN doc_id % 4 <> 0 THEN 2 ELSE 1 END AS BIGINT) AS tracks,
  CAST(32 + doc_id % 512 AS BIGINT) AS cluster_bytes
FROM documents ORDER BY doc_id""",
    "q113_mp4_probe" -> """SELECT doc_id,
  (3000 + (doc_id % 1000) * 7) * 1000 // (600 + (doc_id % 5) * 200) AS duration_ms,
  CAST(160 + (doc_id % 8) * 16 AS BIGINT) AS width,
  CAST(90 + (doc_id % 6) * 18 AS BIGINT) AS height,
  'avc1' AS video_codec,
  CASE WHEN doc_id % 3 <> 0 THEN 'Opus' ELSE '' END AS audio_codec,
  CAST(CASE WHEN doc_id % 3 <> 0 THEN 2 ELSE 1 END AS BIGINT) AS tracks,
  CAST(64 + doc_id % 256 AS BIGINT) AS mdat_bytes
FROM documents ORDER BY doc_id""",
    "q99_jpeg_decode" -> """SELECT doc_id,
  CAST(8 + doc_id % 16 AS BIGINT) AS width,
  CAST(8 + doc_id % 12 AS BIGINT) AS height,
  CAST((8 + doc_id % 16) * (8 + doc_id % 12) * 3 AS BIGINT) AS pixel_bytes,
  CAST(3 * ((doc_id * 37) % 256) * (8 + doc_id % 16) * (8 + doc_id % 12)
    AS BIGINT) AS pixel_sum
FROM documents ORDER BY doc_id""",

    // q88: the ENTIRE 2-iteration Lloyd's trace replayed relationally —
    // possible only because every step is integer-exact (squared-euclidean
    // bigint distances, floor(mean) centroid updates re-read as integers).
    // Tie rule (min d2, min cid) is the row_number ordering; an
    // empty-cluster centroid drops out in both engines identically.
    "q88_kmeans" -> s"""WITH $quantized, $kmeansTrace,
d3 AS (
  SELECT q.vec_id, c.cid,
    q.norm2 + c.cn2 - 2 * CAST(list_sum(list_transform(
      range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])) AS BIGINT) AS d2
  FROM qn q CROSS JOIN c2 c
),
a3 AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d3) WHERE rn = 1
),
csum AS (
  SELECT cid, CAST(list_sum(list_transform(cv, x -> x % 1000003))
    AS BIGINT) AS centroid_sum
  FROM c2
)
SELECT a.cid AS cluster,
  CAST(COUNT(*) AS BIGINT) AS size,
  CAST(SUM(a.vec_id % 1000003) AS BIGINT) AS members_sum,
  CAST(SUM(a.d2 % 1000003) AS BIGINT) AS d2_sum,
  CAST(MIN(s.centroid_sum) AS BIGINT) AS centroid_sum
FROM a3 a JOIN csum s ON a.cid = s.cid
GROUP BY 1 ORDER BY 1""",

    // q117: cluster-balanced subsample — final assignment under the
    // trained centroids (identical d3/a3 derivation to q88), then keep
    // the first 10 per cluster in deterministic multiplicative-hash
    // order. The hash is modular-safe 64-bit arithmetic on both engines.
    "q117_cluster_sample" -> s"""WITH $quantized, $kmeansTrace,
d3 AS (
  SELECT q.vec_id, c.cid,
    q.norm2 + c.cn2 - 2 * CAST(list_sum(list_transform(
      range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])) AS BIGINT) AS d2
  FROM qn q CROSS JOIN c2 c
),
a3 AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d3) WHERE rn = 1
),
ranked AS (
  SELECT cid, vec_id,
    row_number() OVER (PARTITION BY cid
      ORDER BY ((vec_id % 1000003) * 2654435761) % 1000003, vec_id) AS rank
  FROM a3
)
SELECT CAST(cid AS BIGINT) AS cluster, CAST(vec_id AS BIGINT) AS vec_id,
  CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY 1, 3""",
    // q153: the same trained-centroid assignment, split base/incoming,
    // TV contributions in exact cross-multiplied fractions.
    "q153_sim_drift" -> s"""WITH $quantized, $kmeansTrace,
d3 AS (
  SELECT q.vec_id, c.cid,
    q.norm2 + c.cn2 - 2 * CAST(list_sum(list_transform(
      range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])) AS BIGINT) AS d2
  FROM qn q CROSS JOIN c2 c
),
a3 AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d3) WHERE rn = 1
),
per AS (
  SELECT cid,
    CAST(SUM(CASE WHEN vec_id % 10 < 7 THEN 1 ELSE 0 END) AS BIGINT)
      AS base_n,
    CAST(SUM(CASE WHEN vec_id % 10 >= 7 THEN 1 ELSE 0 END) AS BIGINT)
      AS inc_n
  FROM a3 GROUP BY 1
),
tot AS (SELECT SUM(base_n) AS nb, SUM(inc_n) AS ni FROM per)
SELECT CAST(cid AS BIGINT) AS cluster, base_n, inc_n,
  CAST(floor(base_n * 1000000 / nb) AS BIGINT) AS base_share_x1e6,
  CAST(floor(inc_n * 1000000 / ni) AS BIGINT) AS inc_share_x1e6,
  CAST(floor(abs(base_n * ni - inc_n * nb) * 1000000 / (nb * ni))
    AS BIGINT) AS shift_x1e6
FROM per, tot ORDER BY cluster""",

    // q89: IVF over the q88 index — candidate bucketing and query probing
    // re-derived from the same trained centroids (c2), exact cosine only
    // inside probed buckets; cosine text identical to q24's.
    "q89_sim_ivf_kmeans" -> ivfKmeansSql,
    // q118: the persisted-index form MUST return the identical relation
    // (the same inverted file, read back from bucket-partitioned parquet
    // with partition pruning) — same oracle derivation.
    "q118_sim_ivf_persisted" -> ivfKmeansSql,

    // q130: product quantization + ADC — the full pipeline replayed:
    // per-subspace 2-iteration Lloyd's (m=4 subspaces of 16 dims, seeds =
    // the 8 smallest vec_ids' subvectors, q88's floor-mean + (d2, cid)
    // tie rules), candidate encoding by per-subspace argmin under the
    // trained codebooks, per-query exact subspace distance tables, ADC =
    // sum of the m table entries, top-10 per query by (adc_d2, vec_id).
    "q130_sim_pq_adc" -> s"""WITH $pqAdcCtes
SELECT query_id,
  CAST(rn AS BIGINT) AS rank, neighbor_id, adc_d2
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY adc_d2, neighbor_id) AS rn FROM adc)
WHERE rn <= 10 ORDER BY query_id, rank""",

    // q131: IVF-PQ (IVFADC) replayed end to end — coarse k-means (the
    // shared kmeansTrace), per-vector residuals against the assigned
    // coarse centroid, per-subspace residual codebooks (2 Lloyd's
    // iterations, q88's rules, seeds = the 8 smallest vec_ids' residual
    // subvectors), candidate codes, per-query nprobe=2 coarse probes,
    // and ADC = sum of exact residual-subspace distances from the
    // query's per-bucket residual to each coded centroid. Top-10 per
    // query by (adc_d2, vec_id) over the probed buckets only.
    "q131_sim_ivfpq" -> s"""WITH $quantized, $kmeansTrace,
asg AS (SELECT vec_id, qv, norm2, cid AS bucket FROM (
    SELECT q.vec_id, q.qv, q.norm2, c.cid,
      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        q.norm2 + c.cn2 - 2 * CAST(list_sum(list_transform(
          range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])) AS BIGINT),
        c.cid) AS rn
    FROM qn q CROSS JOIN c2 c) WHERE rn = 1),
res AS (
  SELECT a.vec_id, a.bucket,
    list_transform(range(1, len(a.qv) + 1),
      i -> a.qv[i] - c.cv[i]) AS rv
  FROM asg a JOIN c2 c ON a.bucket = c.cid),
rsub AS (SELECT vec_id, bucket, s,
    list_slice(rv, s*16+1, s*16+16) AS sv
  FROM res, UNNEST([0, 1, 2, 3]) AS t(s)),
rsubn AS (SELECT vec_id, bucket, s, sv,
  CAST(list_sum(list_transform(sv, x -> x * x)) AS BIGINT) AS sn2
  FROM rsub),
rpc0 AS (SELECT s, vec_id AS cid, sv AS cv, sn2 AS cn2
  FROM rsubn WHERE vec_id < 8),
rpd1 AS (
  SELECT q.vec_id, q.s, q.sv, q.sn2, c.cid,
    q.sn2 + c.cn2 - 2 * CAST(list_sum(list_transform(
      range(1, len(q.sv) + 1), i -> q.sv[i] * c.cv[i])) AS BIGINT) AS d2
  FROM rsubn q JOIN rpc0 c ON q.s = c.s),
rpa1 AS (SELECT vec_id, s, sv, sn2, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid)
      AS rn FROM rpd1) WHERE rn = 1),
rpu1 AS (SELECT s, cid, pos,
    CAST(floor(SUM(v) / COUNT(*)) AS BIGINT) AS cvp
  FROM (SELECT s, cid, UNNEST(sv) AS v,
          UNNEST(range(1, len(sv) + 1)) AS pos FROM rpa1)
  GROUP BY 1, 2, 3),
rpc1l AS (SELECT s, cid, list(cvp ORDER BY pos) AS cv
  FROM rpu1 GROUP BY s, cid),
rpc1 AS (SELECT s, cid, cv,
  CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn2
  FROM rpc1l),
rpd2 AS (
  SELECT q.vec_id, q.s, q.sv, q.sn2, c.cid,
    q.sn2 + c.cn2 - 2 * CAST(list_sum(list_transform(
      range(1, len(q.sv) + 1), i -> q.sv[i] * c.cv[i])) AS BIGINT) AS d2
  FROM rsubn q JOIN rpc1 c ON q.s = c.s),
rpa2 AS (SELECT vec_id, s, sv, sn2, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid)
      AS rn FROM rpd2) WHERE rn = 1),
rpu2 AS (SELECT s, cid, pos,
    CAST(floor(SUM(v) / COUNT(*)) AS BIGINT) AS cvp
  FROM (SELECT s, cid, UNNEST(sv) AS v,
          UNNEST(range(1, len(sv) + 1)) AS pos FROM rpa2)
  GROUP BY 1, 2, 3),
rpc2l AS (SELECT s, cid, list(cvp ORDER BY pos) AS cv
  FROM rpu2 GROUP BY s, cid),
rpc2 AS (SELECT s, cid, cv,
  CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn2
  FROM rpc2l),
codes AS (SELECT vec_id, bucket, s, cid FROM (
    SELECT q.vec_id, q.bucket, q.s, c.cid,
      row_number() OVER (PARTITION BY q.vec_id, q.s ORDER BY
        q.sn2 + c.cn2 - 2 * CAST(list_sum(list_transform(
          range(1, len(q.sv) + 1), i -> q.sv[i] * c.cv[i])) AS BIGINT),
        c.cid) AS rn
    FROM rsubn q JOIN rpc2 c ON q.s = c.s WHERE q.vec_id >= 8)
  WHERE rn = 1),
probes AS (SELECT vec_id AS qid, qv, cid AS bucket FROM (
    SELECT q.vec_id, q.qv, c.cid,
      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        q.norm2 + c.cn2 - 2 * CAST(list_sum(list_transform(
          range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])) AS BIGINT),
        c.cid) AS rn
    FROM qn q CROSS JOIN c2 c WHERE q.vec_id < 8) WHERE rn <= 2),
qres AS (
  SELECT p.qid, p.bucket, s,
    list_slice(list_transform(range(1, len(p.qv) + 1),
      i -> p.qv[i] - c.cv[i]), s*16+1, s*16+16) AS sv
  FROM probes p JOIN c2 c ON p.bucket = c.cid,
    UNNEST([0, 1, 2, 3]) AS t(s)),
qtab AS (
  SELECT q.qid, q.bucket, q.s, c.cid,
    CAST(list_sum(list_transform(q.sv, x -> x * x)) AS BIGINT) + c.cn2
      - 2 * CAST(list_sum(list_transform(
        range(1, len(q.sv) + 1), i -> q.sv[i] * c.cv[i])) AS BIGINT) AS dq
  FROM qres q JOIN rpc2 c ON q.s = c.s),
adc AS (
  SELECT t.qid AS query_id, x.vec_id AS neighbor_id,
    CAST(SUM(t.dq) AS BIGINT) AS adc_d2
  FROM codes x JOIN qtab t
    ON x.bucket = t.bucket AND x.s = t.s AND x.cid = t.cid
  GROUP BY 1, 2)
SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id, adc_d2
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY adc_d2, neighbor_id) AS rn FROM adc)
WHERE rn <= 10 ORDER BY query_id, rank""",

    // q135: SQ8 replayed end to end — per-dim (min, span) trained over the
    // candidates, the all-integer encode→decode grid snap (both `//`s hit
    // nonnegative operands, so DuckDB truncation == Spark `div` == floor),
    // the dequantized-cosine shortlist of 32, then the exact-dot re-rank.
    "q135_sim_sq8" -> s"""WITH $quantized,
q AS (SELECT vec_id AS query_id, qv AS qa, norm2 AS na2 FROM qn WHERE vec_id < 8),
c0 AS (SELECT vec_id AS neighbor_id, qv AS qb, norm2 AS nb2 FROM qn WHERE vec_id >= 8),
dims AS (
  SELECT j, MIN(v) AS mn, GREATEST(MAX(v) - MIN(v), 1) AS span
  FROM (SELECT unnest(qb) AS v, unnest(range(1, len(qb) + 1)) AS j FROM c0)
  GROUP BY j
),
mml AS (SELECT list(mn ORDER BY j) AS mn, list(span ORDER BY j) AS span
        FROM dims),
c AS (
  SELECT neighbor_id, qb, nb2,
    list_transform(range(1, len(qb) + 1), i ->
      mn[i] + ((((qb[i] - mn[i]) * 255) // span[i]) * span[i]) // 255) AS deq
  FROM c0, mml
),
sq AS (
  SELECT query_id, neighbor_id, qa, qb, na2, nb2,
    CAST(list_sum(list_transform(range(1, len(qa) + 1), i -> qa[i] * deq[i]))
        AS DOUBLE)
      / sqrt(CAST(na2 * CAST(list_sum(list_transform(deq, v -> v * v))
        AS BIGINT) AS DOUBLE)) AS cos_q
  FROM q, c
),
sl AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cos_q DESC, neighbor_id) AS apx_rank FROM sq
),
ex AS (
  SELECT query_id, neighbor_id,
    CAST(list_sum(list_transform(range(1, len(qa) + 1), i -> qa[i] * qb[i]))
        AS DOUBLE)
      / sqrt(CAST(na2 * nb2 AS DOUBLE)) AS cos
  FROM sl WHERE apx_rank <= 32
),
rk AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
      AS rank
  FROM ex
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id
FROM rk WHERE rank <= 5 ORDER BY query_id, rank""",

    // q82: partition counts from parquet; the size decomposition is pinned
    // by the Spark-side tiling invariant (sum(size)==data_length, sizes>0),
    // asserted here as the constant it must equal — same class as q79's
    // tiled_ok == indexed.
    "q82_pstats_from_cassandra" -> s"""WITH $fixtures
SELECT sstable_id,
  CAST(COUNT(*) AS BIGINT) AS partition_count,
  CAST(1 AS BIGINT) AS tiled_ok
FROM lipscan GROUP BY 1 ORDER BY 1""",

    // q83: purge off real-format compressed sstables — q48's derivation
    // over the real codec's representation mapping: the 'nb' files store
    // ACTUAL value bytes, so cell size is the mapped value length
    // (size_bytes % 61; 0 for tombstones — CassandraDataFixture's
    // documented mapping, the same one q67's roundtrip pins). Merge
    // ordering stays deterministic: within a (key, clustering, column)
    // group each sstable holds at most one cell, so the sstable_id
    // tiebreak resolves everything after timestamp.
    "q83_purge_from_cassandra" -> s"""WITH $fixtures,
mcells AS (
  SELECT key, key_formatted, clustering, column_name, sstable_id,
    timestamp_us, is_tombstone, local_deletion_time_s,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, sstable_id DESC, size_bytes DESC,
             is_tombstone DESC, local_deletion_time_s DESC) AS rn
  FROM mcells
),
purge AS (
  SELECT key, key_formatted,
    CAST(COUNT(DISTINCT sstable_id) AS BIGINT) AS table_count,
    CAST(SUM(size_bytes) AS BIGINT) AS size,
    CAST(SUM(CASE WHEN rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
         THEN size_bytes ELSE 0 END) AS BIGINT) AS merged_size
  FROM ranked GROUP BY 1, 2
)
SELECT key, key_formatted, table_count, size,
       size - merged_size AS reclaimable
FROM purge ORDER BY reclaimable DESC, size DESC, key LIMIT 10""",

    // q84: hashed linear classifier — per-token bucket weights re-derived
    // relationally (unnest) where Spark folds the token array in place.
    "q84_classifier_quality" -> s"""WITH tok AS (
  SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS t
  FROM documents
),
sc AS (
  SELECT doc_id, min(lang) AS lang, min(source) AS source,
    CAST(SUM((${h60("t")} % 64) % 13 - 6) AS BIGINT) AS score
  FROM tok GROUP BY doc_id
)
SELECT lang, source,
  CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
  CAST(SUM(score) AS BIGINT) AS score_sum,
  CAST(floor(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) * 1000 / COUNT(*))
    AS BIGINT) AS kept_x1000
FROM sc GROUP BY 1, 2 ORDER BY 1, 2""",

    // q104: the TRAINED classifier — the oracle refits the closed-form
    // Rocchio/NB bucket weights on the q73 rule labels and rescores, so
    // a single wrong weight, bucket or label breaks the hash.
    "q104_classifier_trained" -> s"""WITH m AS (
  SELECT doc_id, lang, source, text,
    CAST(length(text) AS BIGINT) AS len_chars,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count
  FROM documents
),
lab AS (
  SELECT doc_id, lang, source, text,
    (token_count >= 20
      AND floor((len_chars - (token_count - 1)) * 100 / token_count) >= 300
      AND floor((len_chars - (token_count - 1)) * 100 / token_count) <= 1000
      AND floor((len_chars - length(replace(text, ' the ', ''))) / 5) >= 1)
      AS kept_rule
  FROM m
),
tok AS (
  SELECT doc_id, kept_rule, unnest(string_split(text, ' ')) AS t FROM lab
),
bt AS (SELECT doc_id, kept_rule, ${h60("t")} % 64 AS bucket FROM tok),
w AS (
  SELECT bucket,
    CAST(floor((SUM(CASE WHEN kept_rule THEN 1 ELSE 0 END)
      - SUM(CASE WHEN NOT kept_rule THEN 1 ELSE 0 END)) * 1000
      / (COUNT(*) + 1)) AS BIGINT) AS w
  FROM bt GROUP BY 1
),
score AS (
  SELECT b.doc_id, CAST(SUM(COALESCE(w.w, 0)) AS BIGINT) AS score
  FROM bt b LEFT JOIN w ON b.bucket = w.bucket
  GROUP BY 1
),
sc2 AS (
  SELECT l.lang, l.source, s.score, l.kept_rule
  FROM lab l JOIN score s ON l.doc_id = s.doc_id
)
SELECT lang, source,
  CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
  CAST(SUM(score) AS BIGINT) AS score_sum,
  CAST(SUM(CASE WHEN (score > 0) = kept_rule THEN 1 ELSE 0 END) AS BIGINT)
    AS agree,
  CAST(floor(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) * 1000 / COUNT(*))
    AS BIGINT) AS kept_x1000
FROM sc2 GROUP BY 1, 2 ORDER BY 1, 2""",

    // q105–q108: the char-sensitive operators re-run over the multilingual
    // corpus — identical bodies to q26/q65/q91/q92 with `documents`
    // swapped for the intl CTE, so any byte-vs-char divergence (length,
    // replace, split, regex position) between the engines now surfaces.
    "q105_intl_quality" -> s"""WITH $intlCte
SELECT doc_id, n_chars,
  CAST(length(text) AS BIGINT) AS len_chars,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count,
  CAST(floor((length(text) - (len(string_split(text, ' ')) - 1)) * 100
       / len(string_split(text, ' '))) AS BIGINT) AS avg_token_len_x100,
  CAST(length(text) - length(replace(text, '.', '')) AS BIGINT) AS period_count,
  CAST(floor((length(text) - length(replace(text, ' the ', ''))) / 5) AS BIGINT) AS the_count,
  (len(string_split(text, ' ')) < 20) AS is_short
FROM intl ORDER BY doc_id""",

    "q106_intl_repetition" -> s"""WITH $intlCte,
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM intl),
bg AS (
  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
  FROM toks, UNNEST(range(1, greatest(len(w), 2))) AS t(i)
),
bc AS (
  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2
)
SELECT doc_id,
  CAST(SUM(c) AS BIGINT) AS bigrams_total,
  CAST(COUNT(*) AS BIGINT) AS distinct_bigrams,
  CAST(MAX(c) AS BIGINT) AS top_bigram_count,
  CAST(floor(MAX(c) * 1000 / CAST(SUM(c) AS BIGINT)) AS BIGINT)
    AS top_bigram_x1000
FROM bc GROUP BY 1 ORDER BY 1""",

    "q107_intl_pii" -> s"""WITH $intlCte,
pii AS (
  SELECT source,
    text || CASE WHEN doc_id % 11 = 0 THEN ' contact admin' ||
        CAST(doc_id % 100 AS VARCHAR) || '@example.com for help'
      ELSE '' END
      || CASE WHEN doc_id % 13 = 0 THEN ' server 10.' ||
        CAST(doc_id % 200 AS VARCHAR) || '.0.1 responded' ELSE '' END
      || CASE WHEN doc_id % 17 = 0 THEN ' call 555-01' ||
        lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' today'
      ELSE '' END AS text
  FROM intl
),
per AS (
  SELECT source,
    CAST(len(regexp_extract_all(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
      AS emails,
    CAST(len(regexp_extract_all(text,
      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS ips,
    CAST(len(regexp_extract_all(text, '\\b\\d{3}-\\d{4}\\b')) AS BIGINT)
      AS phones,
    CAST(COALESCE(list_sum(list_transform(regexp_extract_all(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'),
        x -> length(x))), 0)
      + COALESCE(list_sum(list_transform(regexp_extract_all(text,
        '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'), x -> length(x))), 0)
      + COALESCE(list_sum(list_transform(regexp_extract_all(text,
        '\\b\\d{3}-\\d{4}\\b'), x -> length(x))), 0) AS BIGINT) AS pii_chars
  FROM pii
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(CASE WHEN emails + ips + phones > 0 THEN 1 ELSE 0 END)
    AS BIGINT) AS docs_with_pii,
  CAST(SUM(emails) AS BIGINT) AS emails,
  CAST(SUM(ips) AS BIGINT) AS ips,
  CAST(SUM(phones) AS BIGINT) AS phones,
  CAST(SUM(pii_chars) AS BIGINT) AS pii_chars
FROM per GROUP BY 1 ORDER BY 1""",

    "q108_intl_boilerplate" -> s"""WITH $intlCte,
pages AS (
  SELECT doc_id, source,
    list_concat(list_concat(list_concat(list_concat(list_concat(
      ['subscribe to ' || source || ' newsletter'], [text]),
      CASE WHEN doc_id % 3 = 0 THEN ['accept our cookie policy']
        ELSE CAST([] AS VARCHAR[]) END),
      CASE WHEN doc_id % 50 = 0 THEN
        ['promo code ' || CAST(doc_id AS VARCHAR)]
        ELSE CAST([] AS VARCHAR[]) END),
      ['copyright ' || source]),
      CASE WHEN doc_id % 2 = 0 THEN ['große Änderung — 新しい規約 🦉 gilt']
        ELSE CAST([] AS VARCHAR[]) END) AS lines
  FROM intl
),
lns AS (
  SELECT doc_id, source, l AS line, CAST(length(l) AS BIGINT) AS len
  FROM pages, UNNEST(lines) t(l)),
perline AS (
  SELECT source, line, COUNT(DISTINCT doc_id) AS line_docs,
    CAST(COUNT(*) AS BIGINT) AS occurrences, MAX(len) AS len
  FROM lns GROUP BY 1, 2),
persrc AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS docs FROM pages GROUP BY 1)
SELECT p.source, MAX(s.docs) AS docs,
  CAST(SUM(p.occurrences) AS BIGINT) AS line_instances,
  CAST(COUNT(*) AS BIGINT) AS distinct_lines,
  CAST(SUM(CASE WHEN p.line_docs * 100 >= s.docs * 30 THEN 1 ELSE 0 END)
    AS BIGINT) AS boilerplate_lines,
  CAST(SUM(CASE WHEN p.line_docs * 100 >= s.docs * 30 THEN p.occurrences
    ELSE 0 END) AS BIGINT) AS removed_instances,
  CAST(SUM(CASE WHEN p.line_docs * 100 >= s.docs * 30 THEN
    p.occurrences * p.len ELSE 0 END) AS BIGINT) AS chars_removed
FROM perline p JOIN persrc s USING (source)
GROUP BY 1 ORDER BY 1""",

    // q85: incremental dedup — same hash split, window keeper and base
    // membership re-derived relationally over the dup-injected corpus.
    "q85_incremental_dedup" -> s"""WITH $corpus,
d AS (
  SELECT doc_id, source, md5(text) AS digest,
    (${h60("CAST(doc_id AS VARCHAR)")} % 10 < 4) AS is_incoming
  FROM corpus
),
inc AS (SELECT doc_id, source, digest FROM d WHERE is_incoming),
basec AS (SELECT DISTINCT digest FROM d WHERE NOT is_incoming),
k AS (
  SELECT i.doc_id, i.source,
    MIN(i.doc_id) OVER (PARTITION BY i.digest) AS keep_id,
    (b.digest IS NOT NULL) AS in_base
  FROM inc i LEFT JOIN basec b ON i.digest = b.digest
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS incoming,
  CAST(SUM(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS BIGINT)
    AS dropped_in_batch,
  CAST(SUM(CASE WHEN doc_id = keep_id AND in_base THEN 1 ELSE 0 END)
    AS BIGINT) AS dropped_vs_base,
  CAST(SUM(CASE WHEN doc_id = keep_id AND NOT in_base THEN 1 ELSE 0 END)
    AS BIGINT) AS survivors,
  CAST(SUM(CASE WHEN doc_id = keep_id AND NOT in_base
    THEN doc_id % 1000003 ELSE 0 END) AS BIGINT) AS survivor_id_sum
FROM k GROUP BY 1 ORDER BY 1"""
  )

  /** q110: the feature-variant row codec — the oracle replays the
    * deterministic model (CassandraDataFixture.writeFeatureAll) from
    * parquet: per distinct l_orderkey k, sstable fb-(k%4), rows at
    * clusterings 0..k%3, static rows / pk liveness / row deletions /
    * complex deletions on the documented residue classes. Every field of
    * every surfaced event lands in a modular sum, so one mis-parsed
    * flag, delta or value length anywhere breaks the hash. */
  private val q110Sql: String = """WITH
ks AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS k FROM lineitem),
base AS (SELECT k, 'fb-' || (k % 4) AS sstable_id, k % 3 AS maxc FROM ks),
rows_ AS (SELECT k, sstable_id, maxc,
  unnest(generate_series(0, maxc)) AS c FROM base),
perkey AS (
  SELECT sstable_id,
    CAST(SUM(CASE WHEN k%3=0 THEN 1 ELSE 0 END) AS BIGINT) AS statics,
    CAST(SUM(CASE WHEN k%3=0 THEN k%23 ELSE 0 END) AS BIGINT) AS static_size_sum,
    CAST(SUM(CASE WHEN k%3=0 THEN (1000000000000 + k) % 1000003 ELSE 0 END) AS BIGINT) AS static_ts_sum,
    CAST(SUM(CASE WHEN k%11=0 THEN 1 ELSE 0 END)
      + SUM(CASE WHEN k%3=0 AND k%17=0 THEN 1 ELSE 0 END) AS BIGINT) AS row_dels,
    CAST(SUM(CASE WHEN k%11=0 THEN (2000000000000 + k) % 1000003 ELSE 0 END)
      + SUM(CASE WHEN k%3=0 AND k%17=0 THEN (2000000000000 + k + 5) % 1000003 ELSE 0 END) AS BIGINT) AS rdel_ts_sum,
    CAST(SUM(CASE WHEN k%11=0 THEN (600000000 + k%100) % 1000003 ELSE 0 END)
      + SUM(CASE WHEN k%3=0 AND k%17=0 THEN (600000000 + k%70) % 1000003 ELSE 0 END) AS BIGINT) AS rdel_ldt_sum,
    CAST(SUM(CASE WHEN k%9=0 THEN 1 ELSE 0 END) AS BIGINT) AS s_liv,
    CAST(SUM(CASE WHEN k%9=0 THEN (1000000000000 + k + 5) % 1000003 ELSE 0 END) AS BIGINT) AS s_liv_ts,
    CAST(SUM(CASE WHEN k%9=0 THEN -1 ELSE 0 END) AS BIGINT) AS s_liv_ttl,
    CAST(SUM(CASE WHEN k%9=0 THEN 2147483647 % 1000003 ELSE 0 END) AS BIGINT) AS s_liv_ldt,
    CAST(SUM(CASE WHEN k%19=0 THEN 1 ELSE 0 END) AS BIGINT) AS part_dels,
    CAST(SUM(CASE WHEN k%19=0 THEN (1000000000000 + k*10 + 2) % 1000003 ELSE 0 END) AS BIGINT) AS pdel_ts_sum,
    CAST(SUM(CASE WHEN k%19=0 THEN (700000000 + k%40) % 1000003 ELSE 0 END) AS BIGINT) AS pdel_ldt_sum,
    CAST(SUM(k % 1000003) AS BIGINT) AS keys_sum
  FROM base GROUP BY 1),
perrow AS (
  SELECT sstable_id,
    CAST(SUM(CASE WHEN k%2=0 THEN 1 ELSE 0 END) AS BIGINT) AS liveness,
    CAST(SUM(CASE WHEN k%2=0 THEN (1000000000000 + k*10 + c) % 1000003 ELSE 0 END) AS BIGINT) AS live_ts_sum,
    CAST(SUM(CASE WHEN k%2=0 THEN (CASE WHEN k%10=0 THEN 3600 ELSE -1 END) ELSE 0 END) AS BIGINT) AS live_ttl_sum,
    CAST(SUM(CASE WHEN k%2=0 THEN (CASE WHEN k%10=0 THEN 500000000 + k%1000 ELSE 2147483647 END) % 1000003 ELSE 0 END) AS BIGINT) AS live_ldt_sum,
    CAST(SUM(CASE WHEN k%13=0 THEN 1 ELSE 0 END) AS BIGINT) AS complex_dels,
    CAST(SUM(CASE WHEN k%13=0 THEN (3000000000000 + k) % 1000003 ELSE 0 END) AS BIGINT) AS cdel_ts_sum,
    CAST(SUM(CASE WHEN k%13=0 THEN (700000000 + k%50) % 1000003 ELSE 0 END) AS BIGINT) AS cdel_ldt_sum,
    CAST(COUNT(*) * 3 AS BIGINT) AS cells,
    CAST(SUM((1000000000000 + k*10 + c + 1) % 1000003
      + (1000000000000 + k*10 + c + 2) % 1000003
      + (1000000000000 + k*10 + c + 3) % 1000003) AS BIGINT) AS cell_ts_sum,
    CAST(SUM((k+c) % 31 + (k+c) % 7 + (k+c+1) % 7) AS BIGINT) AS cell_size_sum
  FROM rows_ GROUP BY 1)
SELECT p.sstable_id, statics, static_size_sum, static_ts_sum,
  CAST(liveness + s_liv AS BIGINT) AS liveness,
  CAST(live_ts_sum + s_liv_ts AS BIGINT) AS live_ts_sum,
  CAST(live_ttl_sum + s_liv_ttl AS BIGINT) AS live_ttl_sum,
  CAST(live_ldt_sum + s_liv_ldt AS BIGINT) AS live_ldt_sum,
  row_dels, rdel_ts_sum, rdel_ldt_sum,
  complex_dels, cdel_ts_sum, cdel_ldt_sum,
  cells, cell_ts_sum, cell_size_sum,
  part_dels, pdel_ts_sum, pdel_ldt_sum, keys_sum
FROM perkey p JOIN perrow r ON p.sstable_id = r.sstable_id
ORDER BY 1"""

  /** q109 (broadcast-weights classifier) must reproduce q104's answer
    * bit-for-bit — the literal and broadcast score folds are the same
    * function — so it shares q104's refit-and-rescore oracle verbatim. */
  val queries: Map[String, String] =
    base +
      // q132 (persisted IVF-PQ) must reproduce q131's relation exactly —
      // same codes, same probes, same ADC — so it shares its oracle.
      ("q132_sim_ivfpq_persisted" -> base("q131_sim_ivfpq")) +
      // q154 (prefix-filtered join) must reproduce the all-pairs exact
      // Jaccard relation — the prefix principle loses nothing, so it
      // shares q21's oracle; a dropped candidate surfaces as a row
      // mismatch here.
      ("q154_dedup_prefix" -> base("q21_dedup_ngram")) +
      // q137 (sharded HNSW + exact re-rank) is beam-sized for full recall
      // at the gated scales, so its contract is exactly the brute-force
      // cosine top-k — q24's oracle. A beam miss anywhere surfaces as a
      // hash mismatch here.
      ("q137_sim_hnsw" -> base("q24_sim_topk")) +
      // q139 (persisted HNSW) reloads the exact build-time graphs, so it
      // must reproduce q137's relation — same brute-force oracle.
      ("q139_sim_hnsw_persisted" -> base("q24_sim_topk")) +
      // q161 (incremental ingest): id-monotone insertion into the loaded
      // prefix graphs equals a full build, so the search must reproduce
      // the same brute-force top-k — same oracle again.
      ("q161_sim_hnsw_ingest" -> base("q24_sim_topk")) +
      // q165 (probe keys via a JOIN + runtime filtering) returns exactly
      // the present-key point-read relation — q159's oracle verbatim.
      ("q165_scan_runtime_point" -> base("q159_scan_point_pushdown")) +
      ("q109_classifier_broadcast" -> base("q104_classifier_trained")) +
      ("q110_row_level_events" -> q110Sql) +
      ("q129_static_complex_roundtrip" -> q129Sql) +
      ("q121_shadowed_purge" -> q121Sql) +
      ("q164_feature_compaction" -> q164Sql) +
      // q169 (co-partitioned deletion joins) computes the identical
      // survivor relation through shuffle-hash joins — q164's oracle.
      ("q169_feature_compaction_copart" -> q164Sql) +
      // q171: size-tiered minor compaction — tier assignment (the key%13
      // size-diverse set), per-sstable model bytes, bit-length tiering,
      // >=2-member selection, per-tier LWW, the PER-TIER conservative
      // purge guard (a tier's droppable tombstone survives when any
      // sstable outside THAT tier's compaction — passthrough or another
      // selected tier — holds the key) and both rollup halves, all
      // replayed from parquet.
      ("q171_minor_compaction" -> q171Sql) +
      // q186: STCS re-ingestion — the compacted state re-tiers off its
      // own real files, exposing the cascade (the small merge is
      // selected again beside the passthrough; the big one is stable).
      ("q186_minor_reingest" -> q186Sql) +
      // q188: EXECUTED TWCS — window assignment from max timestamps,
      // whole-sstable drop gated by the q178 blocker relation, the
      // ≥2-member window's LWW merge, blocked/passthrough survivors.
      ("q188_twcs_compaction" -> q188Sql) +
      // q189: three-replica repair — leaf-correlated divergence, the
      // per-leaf direction matrix, and all three convergence flags.
      ("q189_repair_matrix" -> q189Sql) +
      // q190: the TWCS what-if planner (read-only decision table).
      ("q190_twcs_whatif" -> q190Sql) +
      // q192: the matrix session's closing act — mark all 3 replicas.
      ("q192_repair_matrix_mark" -> q192Sql) +
      // q194: multi-source merge repair under uniform divergence.
      ("q194_repair_multisource" -> q194Sql) +
      // q196: the steady-state incremental-repair loop.
      ("q196_incremental_loop" -> q196Sql) +
      // q197: TWCS with in-window STCS — window assignment composed
      // with the size ladder inside each window; only the qualifying
      // (window, tier) group merges.
      ("q197_twcs_stcs" -> q197Sql) +
      // q198: the watermark trajectory under a controlled arrival
      // order — batch assignment, the late-inside keep, the
      // late-outside drop, and the final-watermark emission frontier.
      ("q198_streaming_watermark" -> q198Sql) +
      // q206: UNIFIED compaction (UCS) — token-span-normalized density
      // levels, the per-level regime split (tiered T4 at level 0,
      // leveled overlap-islands above), the per-group LWW merge +
      // guard, and the fixed-ring-shard output split.
      ("q206_ucs_compaction" -> q206Sql) +
      // q207: sstableloader — ring ownership × RF replication: per
      // (node, owned quarter) the plan fan-in, the received
      // events/digest, corpus equality, and the holder count.
      ("q207_bulk_load" -> q207Sql) +
      // q208: dropDuplicatesWithinWatermark under controlled arrival —
      // the republication inside the watermark drops, the one after
      // state eviction re-emits at its new event time.
      ("q208_streaming_dedup" -> q208Sql) +
      // q209: sstablerepairedset --is-unrepaired — the fully-marked
      // node reads nothing; after the reset the incremental digest
      // reads exactly the reset generations.
      ("q209_repairedset" -> q209Sql) +
      // q210: sstabledowngrade — 'oa' → 'nb': the full-cycle stats
      // roundtrip is byte-identical to the original, data untouched,
      // scans event-identical.
      ("q210_sstable_downgrade" -> q210Sql) +
      // q211: UCS re-ingestion — the compacted state re-planned from
      // scratch lands STABLE: shard outputs one level up and disjoint,
      // the island output beside the originals, nothing selects.
      ("q211_ucs_reingest" -> q211Sql) +
      // q212: nodetool cleanup after the ring doubles — each old node
      // keeps exactly its two still-replicated eighths, the retained
      // views partition the ring, dropped volume accounted per node.
      ("q212_cleanup" -> q212Sql) +
      // q213: node bootstrap — each new node streams its eighths from
      // its predecessor; cleaned + bootstrapped views converge to a
      // full RF=2 ring, every view digest-matching the corpus.
      ("q213_bootstrap" -> q213Sql) +
      // q214: sstablepartitions — per sstable, the partitions crossing
      // the size / cell / tombstone thresholds with their flags.
      ("q214_sstable_partitions" -> q214Sql) +
      // q215: transformWithState — per-key ValueState running totals
      // across controlled micro-batches, replayed as window sums.
      ("q215_transform_with_state" -> q215Sql) +
      // q216: nodetool garbagecollect — every sstable rewrites ALONE:
      // within-file LWW shadowing + the guarded droppable purge, per
      // file reclaim accounting off the real rewritten bytes.
      ("q216_garbage_collect" -> q216Sql) +
      // q217: nodetool decommission — the leaving node streams each
      // held quarter to its new replica; the 3-node ring restores RF=2
      // with only the neighbors touched.
      ("q217_decommission" -> q217Sql) +
      // q218: nodetool removenode — the DEAD node cannot stream; each
      // under-replicated quarter re-replicates survivor→survivor from
      // its one remaining live replica, restoring RF=2.
      ("q218_remove_node" -> q218Sql) +
      // q219: nodetool move — node 1's token shifts one eighth: gained
      // ranges stream from the minimal pre-move replica, lost ranges
      // are cleaned away locally; the reshaped ring keeps RF=2.
      ("q219_move" -> q219Sql) +
      // q236: the vnode bulk load — 16 interleaved tokens, 4 per node;
      // the RF=2 distinct-owner walk derived relationally in SQL, the
      // holdings verified off the real received files.
      ("q236_vnode_load" -> q236Sql) +
      // q237: vnode pending-ranges — the departure calculus per range
      // (ownership merge + survivor walk), Scala walk vs SQL walk.
      ("q237_vnode_pending" -> q237Sql) +
      // q238: executed vnode decommission — node 3's 9 scattered
      // ranges stream to gainers on ALL THREE survivors; every
      // survivor view digest-verifies and RF=2 holds per range.
      ("q238_vnode_decommission" -> q238Sql) +
      // q241: vnode bootstrap calculus — the joiner's 4 mid-range
      // tokens SPLIT an existing range each; before/after replicas,
      // pending transfers and cleanup debt per half-range.
      ("q241_vnode_split" -> q241Sql) +
      // q242: executed vnode bootstrap — the joiner streams each
      // gained half-range from its pre-join primary's real file.
      ("q242_vnode_bootstrap" -> q242Sql) +
      // q243: the ZERO-COPY vnode bootstrap (round 18) — range-sliced
      // source holdings; a sixteenth file whose every occupied half is
      // pending from its owner links whole, a half-pending file
      // rewrites only the requested half; digests transport-blind.
      ("q243_vnode_zero_copy" -> q243Sql) +
      // q244: the zero-copy coverage plan — per sliced source file,
      // occupied (corpus-derived here, Summary.db-derived in the
      // engine) vs requested halves and the transport decision.
      ("q244_zero_copy_plan" -> q244Sql) +
      // q245: the coverage-confirm audit — the Summary.db SAMPLING RULE
      // replayed relationally vs the Index.db-confirmed occupancy.
      ("q245_coverage_confirm" -> q245Sql) +
      // q246: index-summary redistribution — entry counts replay the
      // sampling arithmetic (entries = ceil(partitions/interval),
      // level k keeps ceil(entries/2^k)); the probe checksums are the
      // level-invariant present-probe rollup.
      ("q246_summary_redistribution" -> q246Sql) +
      // q247: DSIR importance-resampled data selection — the hashed
      // bucket model, the integer floor-log2 LLR table and the
      // deterministic top-K replayed relationally end to end.
      ("q247_dsir_select" -> q247Sql) +
      // q239: zero-copy streaming — fully-covered sstables hard-link
      // (entire-sstable transfer), partial files rewrite only the
      // requested remainder; convergence is transport-blind.
      ("q239_zero_copy_stream" -> q239Sql) +
      // q240: PQ-ADC + exact re-rank — the compressed codes shortlist
      // 40 candidates per query (q130's bit-exact ADC derivation), the
      // exact d2 refines the shortlist only, final top-10 exact-ordered.
      ("q240_sim_pq_rerank" -> s"""WITH $pqAdcCtes,
pshort AS (SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY adc_d2, neighbor_id) AS rn FROM adc)
  WHERE rn <= 40),
pexact AS (
  SELECT s.query_id, s.neighbor_id,
    nq2.norm2 + nn.norm2 - 2 * CAST(list_sum(list_transform(
      range(1, len(nq2.qv) + 1), i -> nq2.qv[i] * nn.qv[i]))
      AS BIGINT) AS d2
  FROM pshort s
  JOIN qn nq2 ON nq2.vec_id = s.query_id
  JOIN qn nn ON nn.vec_id = s.neighbor_id)
SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id, d2
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY d2, neighbor_id) AS rn FROM pexact)
WHERE rn <= 10 ORDER BY query_id, rank""") +
      // q220: stream-stream inner join under controlled arrival — the
      // even cohort joins in-batch (lag 30), the ≡1 (mod 4) cohort
      // joins live state late (lag 90), the ≡3 cohort arrives after
      // eviction and is dropped.
      ("q220_stream_join" -> q220Sql) +
      // q221: commitlog recovery — CRC-clean replay of the whole log,
      // LWW memtable reconciliation (NO purge: recovery keeps
      // tombstones), flushed shards re-read off the real files.
      ("q221_commitlog_replay" -> commitlogReplaySql(None)) +
      // q222: the per-segment commitlog report — append order, div-rule
      // segment/section cuts and file byte accounting all replayed via
      // one window cumulative sum.
      ("q222_commitlog_segments" -> q222Sql) +
      // q223: point-in-time restore — the same replay bounded at the
      // restore point; later mutations are discarded before reconcile.
      ("q223_commitlog_pitr" ->
        commitlogReplaySql(Some(graft.ops.CommitLog.RestorePointUs))) +
      // q224: the CDC consumer's exactly-once resume — run 1 drains
      // segments [0, K), the consumer restarts from its checkpoint,
      // run 2 emits exactly [K, n): no replay, no loss.
      ("q224_cdc_resume" -> q224Sql) +
      // q225: hinted handoff — the down node's outage-window writes
      // are stored as per-coordinator hint files and replayed on
      // recovery; retained + hinted sum back to the full corpus.
      ("q225_hinted_handoff" -> q225Sql) +
      // q226: nodetool rebuild — a new DC joins at NTS RF=1; each of
      // its nodes streams every owned quarter from the quarter's DC1
      // primary, each received view digest-equal to the corpus.
      ("q226_rebuild" -> q226Sql) +
      // q227: blocking read repair — per-read digest mismatch, the
      // per-replica DIFF mutation, read cohort converges, unread
      // cohort stays divergent.
      ("q227_read_repair" -> q227Sql) +
      // q228: the batchlog — interrupted batches' surviving log files
      // replay to completion; reconciled state proves eventual
      // atomicity, idempotent over the partially-applied prefix.
      ("q228_batchlog" -> q228Sql) +
      // q229: Merkle descent — a single-leaf divergence localized by
      // comparing exactly 2·depth+1 of the 127 tree nodes; matching
      // subtrees stop unvisited, the mismatch chain ends in 'stream'.
      ("q229_merkle_descent" -> q229Sql) +
      // q230: materialized view — the covered read off the re-keyed
      // view's real files (key pushed down, base never scanned), with
      // the maintenance delta appended by the write path.
      ("q230_materialized_view" -> q230Sql) +
      // q231: snapshot + restore — the hard-linked snapshot reproduces
      // the original per-file relation after a major compaction has
      // replaced the live set with the winners.
      ("q231_snapshot_restore" -> q231Sql) +
      // q232: lightweight transactions — per-partition serial CAS
      // chains (the Paxos contract), walked by a recursive CTE; the
      // engine's per-key state machine must land on identical applied
      // counts, final registers and digests.
      ("q232_cas_register" -> q232Sql) +
      // q233: deterministic epoch shuffling — hash-bucket batches per
      // epoch, within-batch order pinned by an order-weighted digest;
      // no global sort anywhere.
      ("q233_epoch_shuffle" -> q233Sql) +
      // q234: distributed counters — cumulative shards per (cell,
      // node, sstable), the max-clock merge rule, and the exactness
      // invariant (merged == plain delta sum: no loss, no double
      // count) despite a shard table bigger than (cell, node).
      ("q234_counters" -> q234Sql) +
      // q235: incremental backups — the restored set (full snapshot ∪
      // flush-time links) reproduces base corpus + recovery state.
      ("q235_incremental_backup" -> q235Sql) +
      // q204: sstableofflinerelevel — first-fit runs + volume-ranked
      // levels off the flat set, rewritten levels re-read + disjoint.
      ("q204_offline_relevel" -> q204Sql) +
      // q201: sstablescrub — per-partition isolated salvage of a
      // corrupted file; survivors re-read from the rewritten sstables.
      ("q201_sstable_scrub" -> q201Sql) +
      // q200: sstableupgrade — 'nb' -> 'oa' version rewrite: data
      // identical through the production scan, components complete,
      // new fields carry the derivable values.
      ("q200_sstable_upgrade" -> q200Sql) +
      // q199: primary-range (-pr) repair — leaf ownership partitions
      // the ring; the union of per-owner plans is the full q189 matrix.
      ("q199_repair_primary_range" -> (q189Ctes + """
SELECT leaf, CAST(leaf % 3 AS BIGINT) AS owner,
  CAST(COALESCE(s0, -1) AS BIGINT) AS src_for_r0,
  CAST(COALESCE(s1, -1) AS BIGINT) AS src_for_r1,
  CAST(COALESCE(s2, -1) AS BIGINT) AS src_for_r2,
  CAST((CASE WHEN COALESCE(s0, -1) >= 0 THEN 1 ELSE 0 END) +
       (CASE WHEN COALESCE(s1, -1) >= 0 THEN 1 ELSE 0 END) +
       (CASE WHEN COALESCE(s2, -1) >= 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS streams
FROM srcs ORDER BY leaf""")) +
      // q195: the STANDING TWCS window frontier (streaming).
      ("q195_streaming_windows" -> (q188Ctes + s"""
SELECT sstable_id, CAST(maxts AS BIGINT) AS max_ts_us,
  CAST(maxldt AS BIGINT) AS max_ldt_s,
  CAST(swin AS BIGINT) AS win, (maxldt < $GcBeforeS) AS expired
FROM xstats ORDER BY 1""")) +
      // q193: the STANDING streaming STCS size ladder.
      ("q193_streaming_tiers" -> (q171Ctes + """
SELECT g.sstable_id, p.bytes AS model_bytes,
  CAST(g.tier AS BIGINT) AS tier, g.selected
FROM tagged g JOIN persst p USING (sstable_id) ORDER BY 1""")) +
      // q191: TWCS re-ingestion — the compacted state is STABLE.
      ("q191_twcs_reingest" -> q191Sql) +
      // q172: leveled compaction — ntile(4) L1 ranges + ts%10 L0 flush
      // assignment, sidecar-equivalent min/max range discovery, overlap
      // selection, one LWW merge over L0+partners, unconditional purge
      // (the guard set is provably empty), boundary re-partition and
      // both rollup halves, replayed from parquet.
      ("q172_leveled_compaction" -> q172Sql) +
      // q175: LCS re-ingestion — round 1 replayed as q172's kept
      // relation, its outputs re-entering round 2 as the L1 partners of
      // the fresh (ts-shifted) L0 flushes; second merge, unconditional
      // purge, boundary re-partition and both rollup halves.
      ("q175_leveled_reingest" -> q175Sql) +
      // q183: multi-level LCS — P1 seeds L2, the fresh flush re-enters
      // at L0, R2 retains its droppable tombstones (L2 holds the keys),
      // P2's 3-way L1→L2 merge purges them at the bottom; final state.
      ("q183_leveled_multilevel" -> q183Sql) +
      // q185: the LCS what-if planner over the q183 final state.
      ("q185_lcs_whatif" -> q185Sql) +
      // q173: anti-entropy leaf digests — the tiered re-binning replays
      // as the base multiset (every leaf matches), the compacted set as
      // the LWW-winners-minus-purged multiset; per-leaf counts and
      // 60-bit content digests recomputed from parquet.
      ("q173_antientropy_digest" -> q173Sql) +
      // q176: token-range ranges-to-stream — the differing leaves of
      // the base-vs-compacted token ring with their range bounds.
      ("q176_antientropy_ranges" -> q176Sql) +
      // q177: incremental digest — per-set (base/partial/full) event and
      // leaf counts plus the content digest of the UNREPAIRED half.
      ("q177_incremental_digest" -> q177Sql) +
      // q178: sstableexpiredblockers — TWCS band assignment, per-sstable
      // stats (min/max ts, max ldt, key range), fully-expired candidacy
      // and the blocker join, all replayed from parquet.
      ("q178_expired_blockers" -> q178Sql) +
      // q179: sstablesplit — victim, quarter assignment, shard rollups.
      ("q179_sstable_split" -> q179Sql) +
      // q181: the STREAMING token-leaf digest — complete-mode standing
      // state over the base set, same relation as q176's base side.
      ("q181_streaming_leaf_digest" -> q181Sql) +
      // q187: the STREAMING cfstats totals — complete-mode standing
      // per-sstable counters over the real compressed base set; the
      // real-format representation mapping is q67's (no TTL on deleted
      // cells, value length = size_bytes % 61, 0 when deleted/marker).
      ("q187_streaming_cfstats" -> s"""WITH $fixtures
SELECT sstable_id,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(CASE WHEN is_live THEN 1 ELSE 0 END) AS BIGINT) AS live,
  CAST(SUM(CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END) AS BIGINT) AS size
FROM licells GROUP BY 1 ORDER BY 1""") +
      // q182: the EXECUTED repair — diverge, detect, stream, converge.
      ("q182_repair_execute" -> q182Sql) +
      // q184: ...then MARK — the marked set's incremental digest is zero.
      ("q184_repair_mark_cycle" -> q184Sql) +
      // q180: sstablelevelreset — the leveled set's per-level counts
      // flip from {0:2, 1:4} to {0:6}; events unchanged (metadata-only).
      ("q180_level_reset" -> s"""WITH $fixtures,
b AS (SELECT CAST(COUNT(*) AS BIGINT) AS events FROM licells)
SELECT 'base' AS set_name, CAST(6 AS BIGINT) AS sstables,
  CAST(2 AS BIGINT) AS l0, CAST(4 AS BIGINT) AS l1,
  CAST(1 AS BIGINT) AS max_level, events FROM b
UNION ALL
SELECT 'reset', CAST(6 AS BIGINT), CAST(6 AS BIGINT), CAST(0 AS BIGINT),
  CAST(0 AS BIGINT), events FROM b
ORDER BY set_name""") +
      // q174: incremental-repair marking — base set unrepaired, marked
      // copy fully repaired at the stamped constant, event counts equal
      // (the rewrite was metadata-only).
      ("q174_mark_repaired" -> s"""WITH $fixtures,
b AS (
  SELECT CAST(COUNT(DISTINCT sstable_id) AS BIGINT) AS sstables,
    CAST(COUNT(*) AS BIGINT) AS events
  FROM licells
)
SELECT 'base' AS set_name, sstables,
  CAST(0 AS BIGINT) AS repaired_sstables,
  CAST(0 AS BIGINT) AS repaired_at_ms, events FROM b
UNION ALL
SELECT 'repaired', sstables, sstables,
  CAST(1600000000000 AS BIGINT), events FROM b
ORDER BY set_name""") +
      // q170: the sstable-summary DSv2 relation — every 4th distinct
      // partition key per sstable in key order, with an order-pinning
      // (entry_index, key) checksum and the header constants.
      ("q170_summary_source" -> s"""WITH $fixtures,
sumk AS (SELECT DISTINCT sstable_id, key FROM licells),
sumr AS (
  SELECT sstable_id, key,
    row_number() OVER (PARTITION BY sstable_id ORDER BY key) - 1 AS rn
  FROM sumk
),
sumb AS (
  SELECT sstable_id, MIN(key) AS first_key, MAX(key) AS last_key
  FROM sumk GROUP BY 1
),
ent AS (
  SELECT sstable_id, key, rn // 4 AS entry_index
  FROM sumr WHERE rn % 4 = 0
)
SELECT e.sstable_id, CAST(COUNT(*) AS BIGINT) AS entries,
  CAST(4 AS BIGINT) AS min_interval,
  CAST(128 AS BIGINT) AS sampling_level,
  CAST(COUNT(*) AS BIGINT) AS size_at_full_sampling,
  CAST(SUM(e.key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM((e.entry_index + 1) * (e.key % 1000003)) AS BIGINT) AS ordered_keys_sum,
  CAST(b.first_key AS BIGINT) AS first_key,
  CAST(b.last_key AS BIGINT) AS last_key
FROM ent e JOIN sumb b USING (sstable_id)
GROUP BY e.sstable_id, b.first_key, b.last_key ORDER BY 1""")

  /** q129: the static-complex variant's deterministic model
    * (CassandraDataFixture.writeStaticComplexAll) replayed from parquet:
    * per distinct l_orderkey k, sstable fs-(k%3), a static row with one
    * s0 cell (k%13 bytes, ts T0+k) and 1+k%2 stags cells ((k+i)%9
    * bytes, ts T0+k+3+i), pk liveness iff k%5==0, static complex
    * deletion iff k%7==0, and one regular c0 cell (k%17 bytes,
    * ts T0+k*2). */
  private lazy val q129Sql: String = """WITH
ks AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS k FROM lineitem),
base AS (SELECT k, 'fs-' || (k % 3) AS sstable_id FROM ks)
SELECT sstable_id,
  CAST(COUNT(*) AS BIGINT) AS s0_cells,
  CAST(SUM(k % 13) AS BIGINT) AS s0_size_sum,
  CAST(SUM((1000000000000 + k) % 1000003) AS BIGINT) AS s0_ts_sum,
  CAST(SUM(1 + k % 2) AS BIGINT) AS stags_cells,
  CAST(SUM((k % 9) + CASE WHEN k % 2 = 1 THEN (k + 1) % 9 ELSE 0 END) AS BIGINT) AS stags_size_sum,
  CAST(SUM((1000000000000 + k + 3) % 1000003
    + CASE WHEN k % 2 = 1 THEN (1000000000000 + k + 4) % 1000003 ELSE 0 END) AS BIGINT) AS stags_ts_sum,
  CAST(SUM(CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS complex_dels,
  CAST(SUM(CASE WHEN k % 7 = 0 THEN (3000000000000 + k) % 1000003 ELSE 0 END) AS BIGINT) AS cdel_ts_sum,
  CAST(SUM(CASE WHEN k % 7 = 0 THEN (700000000 + k % 30) % 1000003 ELSE 0 END) AS BIGINT) AS cdel_ldt_sum,
  CAST(SUM(CASE WHEN k % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS liveness,
  CAST(SUM(CASE WHEN k % 5 = 0 THEN (1000000000000 + k + 1) % 1000003 ELSE 0 END) AS BIGINT) AS live_ts_sum,
  CAST(COUNT(*) AS BIGINT) AS reg_cells,
  CAST(SUM(k % 17) AS BIGINT) AS reg_size_sum,
  CAST(SUM((1000000000000 + k * 2) % 1000003) AS BIGINT) AS reg_ts_sum,
  CAST(SUM(k % 1000003) AS BIGINT) AS keys_sum
FROM base GROUP BY 1 ORDER BY 1"""

  /** q164: the EXECUTED deletion-shadowing compaction (round 11)
    * replayed from the feature model (CassandraDataFixture
    * .writeFeatureAll) at both gc cutoffs. Survival rules, mirroring
    * FeatureCompaction.ensureCompacted exactly:
    *  - cells/statics survive iff newer than every covering deletion
    *    (partition mfda; row deletion of their clustering — the static
    *    row's own for statics; plus the complex deletion for tags);
    *  - pk liveness survives iff newer than max(partition, row deletion);
    *  - deletions survive iff not superseded by a higher level AND
    *    local_deletion_time >= gcBefore (shadowed data is removed
    *    unconditionally — major-compaction semantics).
    * Output shards replay the volume-adaptive ceil(sum(32+size)/1MiB)
    * function over the model's full input event inventory; the rollup is
    * the per-(gc, shard, key) → per-(gc, shard) two-level aggregate the
    * Spark read-back computes. gc A (D1+50) bisects row/static-row
    * deletion retention; gc B (D2+20) bisects partition/complex deletion
    * retention. */
  /** Integer bit-length ladder (DuckDB-safe replacement for
    * floor(log2)+1 — float log at power-of-two boundaries is not
    * bit-deterministic across engines; a CASE ladder over integer
    * comparisons is). */
  private def bitLenSql(x: String): String =
    (40 to 2 by -1).map(b => s"WHEN $x >= ${1L << (b - 1)} THEN $b")
      .mkString("CASE ", " ", " ELSE 1 END")

  /** q173: anti-entropy leaf digests — see [[graft.ops.AntiEntropy]]. */
  /** q179: sstablesplit — victim selection (largest modeled volume),
    * the running-sum quarter assignment over the victim's partitions in
    * key order, and every shard's rollup, replayed from parquet. */
  private lazy val q179Sql: String = s"""WITH $fixtures,
smapped AS (
  SELECT sstable_id, key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
spersst AS (
  SELECT sstable_id, CAST(SUM(32 + size_bytes) AS BIGINT) AS b
  FROM smapped GROUP BY 1
),
svictim AS (
  SELECT sstable_id, b FROM spersst ORDER BY b DESC, sstable_id DESC LIMIT 1
),
sev AS (
  SELECT m.* FROM smapped m
  WHERE m.sstable_id = (SELECT sstable_id FROM svictim)
),
spart AS (
  SELECT key, CAST(SUM(32 + size_bytes) AS BIGINT) AS pb
  FROM sev GROUP BY 1
),
scum AS (SELECT key, SUM(pb) OVER (ORDER BY key) AS cum, pb FROM spart),
sshard AS (
  SELECT key,
    LEAST((cum - pb) * 4 // (SELECT b FROM svictim), 3) AS shard
  FROM scum
)
SELECT 'shard-' || CAST(shard AS VARCHAR) AS unit,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(COUNT(DISTINCT e.key) AS BIGINT) AS partitions,
  CAST(MIN(e.key) AS BIGINT) AS first_key,
  CAST(MAX(e.key) AS BIGINT) AS last_key,
  CAST(SUM(32 + size_bytes) AS BIGINT) AS model_bytes,
  CAST(SUM(e.key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(ttl_s % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(size_bytes % 1000003) AS BIGINT) AS value_sum
FROM sev e JOIN sshard s ON e.key = s.key
GROUP BY 1 ORDER BY unit"""

  /** q182: the EXECUTED repair — divergent replicas ((key+clustering)%97
    * slivers), leaf digests, differing-leaf streaming and the converged
    * re-verification, all replayed from parquet. */
  private lazy val q182Sql: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    val span = 1L << graft.ops.AntiEntropy.TokenLeafShift
    s"""WITH $fixtures,
rmapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    (key + clustering) % 97 AS sliver
  FROM licells
),
rev AS (
  SELECT *, $evHash % 1000003 AS eh,
    ${h60("CAST(key AS VARCHAR)")} // $span AS leaf
  FROM rmapped
),
la AS (
  SELECT leaf, CAST(COUNT(*) AS BIGINT) AS a_events,
    CAST(SUM(eh) AS BIGINT) AS a_digest
  FROM rev WHERE sliver <> 0 GROUP BY 1
),
lb AS (
  SELECT leaf, CAST(COUNT(*) AS BIGINT) AS b_events,
    CAST(SUM(eh) AS BIGINT) AS b_digest
  FROM rev WHERE sliver <> 1 GROUP BY 1
),
d AS (
  SELECT leaf FROM la FULL OUTER JOIN lb USING (leaf)
  WHERE COALESCE(a_digest, -1) <> COALESCE(b_digest, -2)
),
uni AS (
  SELECT leaf, CAST(COUNT(*) AS BIGINT) AS u_events,
    CAST(SUM(eh) AS BIGINT) AS u_digest
  FROM (SELECT DISTINCT key, clustering, column_name, kind, timestamp_us,
          ttl_s, local_deletion_time_s, size_bytes, eh, leaf
        FROM rev) GROUP BY 1
),
aft_a AS (
  SELECT leaf, CAST(SUM(eh) AS BIGINT) AS a2_digest
  FROM (SELECT DISTINCT key, clustering, column_name, kind, timestamp_us,
          ttl_s, local_deletion_time_s, size_bytes, eh, leaf
        FROM rev
        WHERE sliver <> 0
           OR (leaf IN (SELECT leaf FROM d) AND sliver <> 1))
  GROUP BY 1
),
aft_b AS (
  SELECT leaf, CAST(SUM(eh) AS BIGINT) AS b2_digest
  FROM (SELECT DISTINCT key, clustering, column_name, kind, timestamp_us,
          ttl_s, local_deletion_time_s, size_bytes, eh, leaf
        FROM rev
        WHERE sliver <> 1
           OR (leaf IN (SELECT leaf FROM d) AND sliver <> 0))
  GROUP BY 1
)
SELECT leaf, a_events, b_events,
  (COALESCE(a_digest, -1) <> COALESCE(b_digest, -2)) AS differed,
  u_events AS converged_events,
  (a2_digest = u_digest) AS a_converged,
  (b2_digest = u_digest) AS b_converged
FROM la FULL OUTER JOIN lb USING (leaf)
  FULL OUTER JOIN uni USING (leaf)
  FULL OUTER JOIN aft_a USING (leaf)
  FULL OUTER JOIN aft_b USING (leaf)
ORDER BY leaf"""
  }

  /** q184: the repair session's closing act — converged replica A (own
    * files + the streamed-in sstable, raw events, duplicates and all)
    * digests everything while unmarked; once repairedAt stamps land,
    * the incremental digest reads nothing. */
  private lazy val q184Sql: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    val span = 1L << graft.ops.AntiEntropy.TokenLeafShift
    s"""WITH $fixtures,
rmapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    (key + clustering) % 97 AS sliver
  FROM licells
),
rev AS (
  SELECT *, $evHash % 1000003 AS eh,
    ${h60("CAST(key AS VARCHAR)")} // $span AS leaf
  FROM rmapped
),
la AS (
  SELECT leaf, CAST(SUM(eh) AS BIGINT) AS a_digest
  FROM rev WHERE sliver <> 0 GROUP BY 1
),
lb AS (
  SELECT leaf, CAST(SUM(eh) AS BIGINT) AS b_digest
  FROM rev WHERE sliver <> 1 GROUP BY 1
),
d AS (
  SELECT leaf FROM la FULL OUTER JOIN lb USING (leaf)
  WHERE COALESCE(a_digest, -1) <> COALESCE(b_digest, -2)
),
n AS (
  SELECT CAST(COUNT(DISTINCT sstable_id) + 1 AS BIGINT) AS sst
  FROM licells
),
conv AS (
  SELECT eh, leaf FROM rev WHERE sliver <> 0
  UNION ALL
  SELECT eh, leaf FROM rev
  WHERE sliver <> 1 AND leaf IN (SELECT leaf FROM d)
)
SELECT 'converged' AS state, n.sst AS sstables,
  n.sst AS unrepaired_sstables,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(COUNT(DISTINCT leaf) AS BIGINT) AS leaves,
  CAST(SUM(eh) AS BIGINT) AS digest
FROM conv, n GROUP BY n.sst
UNION ALL
SELECT 'marked', n.sst, CAST(0 AS BIGINT),
  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM n
ORDER BY state"""
  }

  /** q181: the streaming token-leaf digest — the q176 base-side relation
    * (the standing complete-mode state must equal the batch fold). */
  private lazy val q181Sql: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    val span = 1L << graft.ops.AntiEntropy.TokenLeafShift
    s"""WITH $fixtures,
amapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
aev AS (
  SELECT *, $evHash % 1000003 AS eh,
    ${h60("CAST(key AS VARCHAR)")} // $span AS leaf
  FROM amapped
)
SELECT leaf, CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(eh) AS BIGINT) AS digest
FROM aev GROUP BY 1 ORDER BY leaf"""
  }

  /** q178: sstableexpiredblockers over the TWCS-banded set — see
    * [[graft.ops.ExpiredBlockers]] for the semantics being checked. */
  private lazy val q178Sql: String = s"""WITH $fixtures,
tmap AS (
  SELECT CASE WHEN is_tombstone AND local_deletion_time_s < $GcBeforeS
              THEN 'sst-' || CAST(4 + (CASE WHEN timestamp_us // 86400000000 < 1200
                                            THEN 0 ELSE 1 END) AS VARCHAR)
              ELSE 'sst-' || CAST(LEAST(timestamp_us // 86400000000 // 640, 3)
                                  AS VARCHAR) END AS sstable_id,
    key, timestamp_us, local_deletion_time_s
  FROM licells
),
tstats AS (
  SELECT sstable_id, MIN(key) AS fk, MAX(key) AS lk,
    MIN(timestamp_us) AS mints, MAX(timestamp_us) AS maxts,
    MAX(local_deletion_time_s) AS maxldt
  FROM tmap GROUP BY 1
)
SELECT c.sstable_id AS blocked_id,
  CAST(c.maxts AS BIGINT) AS blocked_max_ts,
  CAST(c.maxldt AS BIGINT) AS blocked_max_ldt,
  b.sstable_id AS blocker_id,
  CAST(b.mints AS BIGINT) AS blocker_min_ts
FROM tstats c JOIN tstats b
  ON c.maxldt < $GcBeforeS AND b.maxldt >= $GcBeforeS
  AND b.fk <= c.lk AND b.lk >= c.fk AND b.mints <= c.maxts
ORDER BY 1, 4"""

  /** q176: differing TOKEN ranges between the base set and the executed
    * major compaction — the oracle recomputes the token-ring binning
    * (portable h60 of the key, 64 equal 2^54-wide leaves), both digests
    * and keeps only differing leaves with their range bounds. */
  private lazy val q176Sql: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    val span = 1L << graft.ops.AntiEntropy.TokenLeafShift
    s"""WITH $fixtures,
amapped AS (
  SELECT sstable_id, key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
aev AS (
  SELECT *, $evHash % 1000003 AS eh,
    ${h60("CAST(key AS VARCHAR)")} // $span AS leaf
  FROM amapped
),
aleaf AS (
  SELECT leaf, CAST(COUNT(*) AS BIGINT) AS base_events,
    CAST(SUM(eh) AS BIGINT) AS base_digest
  FROM aev GROUP BY 1
),
aranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, sstable_id DESC, size_bytes DESC,
             is_tombstone DESC, local_deletion_time_s DESC,
             ttl_s DESC, is_expiring DESC, kind DESC) AS rn
  FROM aev
),
acomp AS (
  SELECT leaf, CAST(COUNT(*) AS BIGINT) AS compacted_events,
    CAST(SUM(eh) AS BIGINT) AS compacted_digest
  FROM aranked
  WHERE rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
  GROUP BY 1
)
SELECT leaf,
  CAST(leaf * $span AS BIGINT) AS token_lo,
  CAST(leaf * $span + ${span - 1} AS BIGINT) AS token_hi,
  a.base_events, c.compacted_events, a.base_digest, c.compacted_digest
FROM aleaf a FULL OUTER JOIN acomp c USING (leaf)
WHERE COALESCE(a.base_digest, -1) <> COALESCE(c.compacted_digest, -2)
ORDER BY leaf"""
  }

  /** q177: the incremental digest — base digests everything, the
    * partial marking leaves sst-3/4/5 (gens 4-6) unrepaired, the full
    * marking leaves NOTHING to digest. */
  private lazy val q177Sql: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    val span = 1L << graft.ops.AntiEntropy.TokenLeafShift
    s"""WITH $fixtures,
amapped AS (
  SELECT sstable_id, key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
aev AS (
  SELECT *, $evHash % 1000003 AS eh,
    ${h60("CAST(key AS VARCHAR)")} // $span AS leaf
  FROM amapped
),
nsst AS (SELECT CAST(COUNT(DISTINCT sstable_id) AS BIGINT) AS n FROM aev)
SELECT 'base' AS set_name, n AS sstables, n AS unrepaired_sstables,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(COUNT(DISTINCT leaf) AS BIGINT) AS leaves,
  CAST(COALESCE(SUM(eh), 0) AS BIGINT) AS digest
FROM aev, nsst GROUP BY n
UNION ALL
SELECT 'full', n, CAST(0 AS BIGINT),
  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM nsst
UNION ALL
SELECT 'partial', n, CAST(3 AS BIGINT),
  CAST(COUNT(*) AS BIGINT),
  CAST(COUNT(DISTINCT leaf) AS BIGINT),
  CAST(COALESCE(SUM(eh), 0) AS BIGINT)
FROM aev, nsst
WHERE sstable_id IN ('sst-3', 'sst-4', 'sst-5') GROUP BY n
ORDER BY set_name"""
  }

  /** q210: sstabledowngrade (round 16) — the downgraded set's scan must
    * equal the parquet derivation per sstable (count, partitions,
    * commutative digest), with component parity, Data.db identity and
    * the nb → oa → nb Statistics.db roundtrip exact (engine-computed
    * off the real bytes; the oracle states the expected verdicts). */
  private lazy val q210Sql: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
dmapped AS (
  SELECT sstable_id, key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
)
SELECT sstable_id AS unit,
  TRUE AS components_match, TRUE AS data_bytes_equal,
  TRUE AS stats_roundtrip_exact,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(SUM($evHash % 1000003) AS BIGINT) AS digest
FROM dmapped GROUP BY 1 ORDER BY unit"""
  }

  /** q209: sstablerepairedset (round 16) — the executed reset replayed:
    * the fully-marked set digests nothing; flipping gens 1–3 (sstables
    * sst-0/1/2) back to unrepaired makes the incremental digest read
    * exactly those files' events (the other half stays planning-pruned).
    * Complements q177, whose partial marking leaves the OTHER half
    * (sst-3/4/5) unrepaired. */
  private lazy val q209Sql: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    val span = 1L << graft.ops.AntiEntropy.TokenLeafShift
    s"""WITH $fixtures,
rmapped AS (
  SELECT sstable_id, key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
rev AS (
  SELECT *, $evHash % 1000003 AS eh,
    ${h60("CAST(key AS VARCHAR)")} // $span AS leaf
  FROM rmapped
),
rn AS (SELECT CAST(COUNT(DISTINCT sstable_id) AS BIGINT) AS n FROM rev)
SELECT 'marked' AS state, n AS sstables,
  CAST(0 AS BIGINT) AS unrepaired_sstables,
  CAST(0 AS BIGINT) AS events, CAST(0 AS BIGINT) AS leaves,
  CAST(0 AS BIGINT) AS digest
FROM rn
UNION ALL
SELECT 'reset', n, CAST(3 AS BIGINT),
  CAST(COUNT(*) AS BIGINT),
  CAST(COUNT(DISTINCT leaf) AS BIGINT),
  CAST(COALESCE(SUM(eh), 0) AS BIGINT)
FROM rev, rn
WHERE sstable_id IN ('sst-0', 'sst-1', 'sst-2') GROUP BY n
ORDER BY state"""
  }

  private lazy val q173Sql: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
amapped AS (
  SELECT sstable_id, key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
aev AS (SELECT *, $evHash % 1000003 AS eh FROM amapped),
aleaf AS (
  SELECT key % 64 AS leaf, CAST(COUNT(*) AS BIGINT) AS base_events,
    CAST(SUM(eh) AS BIGINT) AS base_digest
  FROM aev GROUP BY 1
),
aranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, sstable_id DESC, size_bytes DESC,
             is_tombstone DESC, local_deletion_time_s DESC,
             ttl_s DESC, is_expiring DESC, kind DESC) AS rn
  FROM aev
),
acomp AS (
  SELECT key % 64 AS leaf, CAST(COUNT(*) AS BIGINT) AS compacted_events,
    CAST(SUM(eh) AS BIGINT) AS compacted_digest
  FROM aranked
  WHERE rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
  GROUP BY 1
)
SELECT a.leaf, a.base_events, a.base_digest,
  a.base_events AS tiered_events,
  c.compacted_events,
  TRUE AS tiered_matches,
  (COALESCE(c.compacted_digest, -1) = a.base_digest) AS compacted_matches
FROM aleaf a LEFT JOIN acomp c USING (leaf)
ORDER BY leaf"""
  }

  /** q172: leveled compaction replayed end to end — see
    * [[graft.ops.LeveledCompaction]] for the semantics being checked. */
  private lazy val q172Sql: String = s"""WITH $fixtures,
lkeys AS (
  SELECT key, NTILE(4) OVER (ORDER BY key) AS tile
  FROM (SELECT DISTINCT key FROM licells)
),
lmapped AS (
  SELECT CASE WHEN k.tile IN (2, 3) AND m.timestamp_us % 10 < 3
              THEN 'sst-' || CAST(m.timestamp_us % 2 AS VARCHAR)
              ELSE 'sst-' || CAST(k.tile + 1 AS VARCHAR) END AS sstable_id,
    m.key, m.clustering, m.column_name, m.kind, m.timestamp_us,
    CASE WHEN m.is_tombstone THEN -1 ELSE m.ttl_s END AS ttl_s,
    m.local_deletion_time_s, m.is_tombstone, m.is_expiring,
    CASE WHEN m.is_tombstone THEN 0 ELSE m.size_bytes % 61 END AS size_bytes
  FROM licells m JOIN lkeys k USING (key)
),
bounds AS (
  SELECT sstable_id, MIN(key) AS fk, MAX(key) AS lk
  FROM lmapped GROUP BY 1
),
l0span AS (
  SELECT MIN(fk) AS f, MAX(lk) AS l FROM bounds
  WHERE sstable_id IN ('sst-0', 'sst-1')
),
lpartners AS (
  SELECT b.sstable_id, b.fk, b.lk
  FROM bounds b, l0span s
  WHERE b.sstable_id NOT IN ('sst-0', 'sst-1')
    AND b.fk <= s.l AND b.lk >= s.f
),
lranked AS (
  SELECT m.*,
    row_number() OVER (PARTITION BY m.key, m.clustering, m.column_name
      ORDER BY m.timestamp_us DESC, m.sstable_id DESC, m.size_bytes DESC,
               m.is_tombstone DESC, m.local_deletion_time_s DESC,
               m.ttl_s DESC, m.is_expiring DESC, m.kind DESC) AS rn
  FROM lmapped m
  WHERE m.sstable_id IN ('sst-0', 'sst-1')
     OR m.sstable_id IN (SELECT sstable_id FROM lpartners)
),
lpasskeys AS (
  SELECT DISTINCT key FROM lmapped
  WHERE sstable_id NOT IN ('sst-0', 'sst-1')
    AND sstable_id NOT IN (SELECT sstable_id FROM lpartners)
),
lkept AS (
  SELECT *,
    LEAST((SELECT COUNT(*) FROM lpartners p WHERE p.lk < lranked.key),
          (SELECT COUNT(*) - 1 FROM lpartners)) AS oidx
  FROM lranked
  WHERE rn = 1 AND (
    NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
    OR key IN (SELECT key FROM lpasskeys))
)
SELECT 'L1-new-' || CAST(oidx AS VARCHAR) AS unit,
  'compacted' AS action,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(SUM(CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 1 ELSE 0 END) AS BIGINT) AS markers,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(MIN(key) AS BIGINT) AS first_key,
  CAST(MAX(key) AS BIGINT) AS last_key,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(ttl_s % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT) AS expiring,
  CAST(SUM(size_bytes % 1000003) AS BIGINT) AS value_sum
FROM lkept GROUP BY 1, 2
UNION ALL
SELECT m.sstable_id AS unit,
  'passthrough' AS action,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(SUM(CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 1 ELSE 0 END) AS BIGINT) AS markers,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(MIN(key) AS BIGINT) AS first_key,
  CAST(MAX(key) AS BIGINT) AS last_key,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(ttl_s % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT) AS expiring,
  CAST(SUM(size_bytes % 1000003) AS BIGINT) AS value_sum
FROM lmapped m
WHERE m.sstable_id NOT IN ('sst-0', 'sst-1')
  AND m.sstable_id NOT IN (SELECT sstable_id FROM lpartners)
GROUP BY 1, 2
ORDER BY unit"""

  /** q175: the SECOND leveled round (re-ingestion) replayed end to end —
    * round 1 is exactly [[q172Sql]]'s lkept relation; its outputs come
    * back labeled by their READBACK ids (sst-910/sst-911, the level-1
    * partners of round 2), the fresh L0 re-writes the original L0's
    * events 1e9 µs later split by preserved ts parity, and round 2
    * merges with the unconditional leveled purge (the passthrough tiles
    * stay key-disjoint; the guard term is kept for exactness). */
  private lazy val q175Sql: String = s"""WITH $fixtures,
lkeys AS (
  SELECT key, NTILE(4) OVER (ORDER BY key) AS tile
  FROM (SELECT DISTINCT key FROM licells)
),
lmapped AS (
  SELECT CASE WHEN k.tile IN (2, 3) AND m.timestamp_us % 10 < 3
              THEN 'sst-' || CAST(m.timestamp_us % 2 AS VARCHAR)
              ELSE 'sst-' || CAST(k.tile + 1 AS VARCHAR) END AS sstable_id,
    m.key, m.clustering, m.column_name, m.kind, m.timestamp_us,
    CASE WHEN m.is_tombstone THEN -1 ELSE m.ttl_s END AS ttl_s,
    m.local_deletion_time_s, m.is_tombstone, m.is_expiring,
    CASE WHEN m.is_tombstone THEN 0 ELSE m.size_bytes % 61 END AS size_bytes
  FROM licells m JOIN lkeys k USING (key)
),
bounds AS (
  SELECT sstable_id, MIN(key) AS fk, MAX(key) AS lk
  FROM lmapped GROUP BY 1
),
l0span AS (
  SELECT MIN(fk) AS f, MAX(lk) AS l FROM bounds
  WHERE sstable_id IN ('sst-0', 'sst-1')
),
lpartners AS (
  SELECT b.sstable_id, b.fk, b.lk
  FROM bounds b, l0span s
  WHERE b.sstable_id NOT IN ('sst-0', 'sst-1')
    AND b.fk <= s.l AND b.lk >= s.f
),
lranked AS (
  SELECT m.*,
    row_number() OVER (PARTITION BY m.key, m.clustering, m.column_name
      ORDER BY m.timestamp_us DESC, m.sstable_id DESC, m.size_bytes DESC,
               m.is_tombstone DESC, m.local_deletion_time_s DESC,
               m.ttl_s DESC, m.is_expiring DESC, m.kind DESC) AS rn
  FROM lmapped m
  WHERE m.sstable_id IN ('sst-0', 'sst-1')
     OR m.sstable_id IN (SELECT sstable_id FROM lpartners)
),
lpasskeys AS (
  SELECT DISTINCT key FROM lmapped
  WHERE sstable_id NOT IN ('sst-0', 'sst-1')
    AND sstable_id NOT IN (SELECT sstable_id FROM lpartners)
),
lkept AS (
  SELECT *,
    LEAST((SELECT COUNT(*) FROM lpartners p WHERE p.lk < lranked.key),
          (SELECT COUNT(*) - 1 FROM lpartners)) AS oidx
  FROM lranked
  WHERE rn = 1 AND (
    NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
    OR key IN (SELECT key FROM lpasskeys))
),
r1out AS (
  SELECT 'sst-' || CAST(910 + oidx AS VARCHAR) AS sstable_id,
    key, clustering, column_name, kind, timestamp_us, ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring, size_bytes
  FROM lkept
),
newl0 AS (
  SELECT 'sst-' || CAST(6 + ((timestamp_us + 1000000000) % 2) AS VARCHAR)
      AS sstable_id,
    key, clustering, column_name, kind,
    timestamp_us + 1000000000 AS timestamp_us,
    ttl_s, local_deletion_time_s, is_tombstone, is_expiring, size_bytes
  FROM lmapped WHERE sstable_id IN ('sst-0', 'sst-1')
),
part2 AS (
  SELECT * FROM r1out UNION ALL SELECT * FROM newl0
),
r2ranked AS (
  SELECT p.*,
    row_number() OVER (PARTITION BY p.key, p.clustering, p.column_name
      ORDER BY p.timestamp_us DESC, p.sstable_id DESC, p.size_bytes DESC,
               p.is_tombstone DESC, p.local_deletion_time_s DESC,
               p.ttl_s DESC, p.is_expiring DESC, p.kind DESC) AS rn
  FROM part2 p
),
r2kept AS (
  SELECT r.*,
    CASE WHEN r.key <= (SELECT MAX(key) FROM lkept WHERE oidx = 0)
         THEN 0 ELSE 1 END AS oidx
  FROM r2ranked r
  WHERE rn = 1 AND (
    NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
    OR key IN (SELECT key FROM lpasskeys))
)
SELECT 'L1-new2-' || CAST(oidx AS VARCHAR) AS unit,
  'compacted' AS action,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(SUM(CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 1 ELSE 0 END) AS BIGINT) AS markers,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(MIN(key) AS BIGINT) AS first_key,
  CAST(MAX(key) AS BIGINT) AS last_key,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(ttl_s % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT) AS expiring,
  CAST(SUM(size_bytes % 1000003) AS BIGINT) AS value_sum
FROM r2kept GROUP BY 1, 2
UNION ALL
SELECT m.sstable_id AS unit,
  'passthrough' AS action,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(SUM(CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 1 ELSE 0 END) AS BIGINT) AS markers,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(MIN(key) AS BIGINT) AS first_key,
  CAST(MAX(key) AS BIGINT) AS last_key,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(ttl_s % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT) AS expiring,
  CAST(SUM(size_bytes % 1000003) AS BIGINT) AS value_sum
FROM lmapped m
WHERE m.sstable_id NOT IN ('sst-0', 'sst-1')
  AND m.sstable_id NOT IN (SELECT sstable_id FROM lpartners)
GROUP BY 1, 2
ORDER BY unit"""

  /** q183: MULTI-LEVEL LCS replayed end to end — round 1 (q172's kept
    * relation), the P1 promotion of sst-2 to two L2 halves, the fresh
    * ts-shifted flush, R2's flush-into-empty-L1 (droppable tombstones
    * retained via the keys the L2 halves still hold), and P2's genuine
    * 3-way L1→L2 merge with the bottom-level purge; the final state's
    * per-sstable level-stamped rollup. */
  private lazy val q183Sql: String =
    q183Ctes + """
SELECT sstable_id, level,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(SUM(CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 1 ELSE 0 END) AS BIGINT) AS markers,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(MIN(key) AS BIGINT) AS first_key,
  CAST(MAX(key) AS BIGINT) AS last_key,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(CASE WHEN is_tombstone AND local_deletion_time_s < """ +
      s"$GcBeforeS" + """
               THEN 1 ELSE 0 END) AS BIGINT) AS droppable_tombstones,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(ttl_s % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(size_bytes % 1000003) AS BIGINT) AS value_sum
FROM finalev GROUP BY 1, 2 ORDER BY sstable_id"""

  /** The q183 chain's WITH-prefix (shared with q185's planner view):
    * everything through the final state's `finalev` relation. */
  private lazy val q183Ctes: String = s"""WITH $fixtures,
lkeys AS (
  SELECT key, NTILE(4) OVER (ORDER BY key) AS tile
  FROM (SELECT DISTINCT key FROM licells)
),
lmapped AS (
  SELECT CASE WHEN k.tile IN (2, 3) AND m.timestamp_us % 10 < 3
              THEN 'sst-' || CAST(m.timestamp_us % 2 AS VARCHAR)
              ELSE 'sst-' || CAST(k.tile + 1 AS VARCHAR) END AS sstable_id,
    m.key, m.clustering, m.column_name, m.kind, m.timestamp_us,
    CASE WHEN m.is_tombstone THEN -1 ELSE m.ttl_s END AS ttl_s,
    m.local_deletion_time_s, m.is_tombstone, m.is_expiring,
    CASE WHEN m.is_tombstone THEN 0 ELSE m.size_bytes % 61 END AS size_bytes
  FROM licells m JOIN lkeys k USING (key)
),
bounds AS (
  SELECT sstable_id, MIN(key) AS fk, MAX(key) AS lk
  FROM lmapped GROUP BY 1
),
l0span AS (
  SELECT MIN(fk) AS f, MAX(lk) AS l FROM bounds
  WHERE sstable_id IN ('sst-0', 'sst-1')
),
lpartners AS (
  SELECT b.sstable_id, b.fk, b.lk
  FROM bounds b, l0span s
  WHERE b.sstable_id NOT IN ('sst-0', 'sst-1')
    AND b.fk <= s.l AND b.lk >= s.f
),
lranked AS (
  SELECT m.*,
    row_number() OVER (PARTITION BY m.key, m.clustering, m.column_name
      ORDER BY m.timestamp_us DESC, m.sstable_id DESC, m.size_bytes DESC,
               m.is_tombstone DESC, m.local_deletion_time_s DESC,
               m.ttl_s DESC, m.is_expiring DESC, m.kind DESC) AS rn
  FROM lmapped m
  WHERE m.sstable_id IN ('sst-0', 'sst-1')
     OR m.sstable_id IN (SELECT sstable_id FROM lpartners)
),
lpasskeys AS (
  SELECT DISTINCT key FROM lmapped
  WHERE sstable_id NOT IN ('sst-0', 'sst-1')
    AND sstable_id NOT IN (SELECT sstable_id FROM lpartners)
),
lkept AS (
  SELECT *,
    LEAST((SELECT COUNT(*) FROM lpartners p WHERE p.lk < lranked.key),
          (SELECT COUNT(*) - 1 FROM lpartners)) AS oidx
  FROM lranked
  WHERE rn = 1 AND (
    NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
    OR key IN (SELECT key FROM lpasskeys))
),
-- P1: promote sst-2 (the lowest-first-key L1; tiles pin it) — single-
-- source LWW collapse, unconditional purge (every other unit's range is
-- disjoint), byte-balanced split into two L2 halves
p1ranked AS (
  SELECT m.*,
    row_number() OVER (PARTITION BY m.key, m.clustering, m.column_name
      ORDER BY m.timestamp_us DESC, m.sstable_id DESC, m.size_bytes DESC,
               m.is_tombstone DESC, m.local_deletion_time_s DESC,
               m.ttl_s DESC, m.is_expiring DESC, m.kind DESC) AS rn
  FROM lmapped m WHERE m.sstable_id = 'sst-2'
),
p1kept AS (
  SELECT * FROM p1ranked
  WHERE rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
),
p1part AS (
  SELECT key, CAST(SUM(32 + size_bytes) AS BIGINT) AS pb
  FROM p1kept GROUP BY 1
),
p1cum AS (SELECT key, SUM(pb) OVER (ORDER BY key) AS cum, pb FROM p1part),
p1shard AS (
  SELECT key,
    LEAST((cum - pb) * 2 // (SELECT SUM(pb) FROM p1part), 1) AS shard
  FROM p1cum
),
p1b AS (SELECT MAX(key) AS boundary FROM p1shard WHERE shard = 0),
-- F: the same hot keys written again 2e9 µs later (deletes included)
flush AS (
  SELECT key, clustering, column_name, kind,
    timestamp_us + 2000000000 AS timestamp_us,
    ttl_s, local_deletion_time_s, is_tombstone, is_expiring, size_bytes
  FROM lmapped WHERE sstable_id = 'sst-2'
),
-- R2: flush into the emptied L1 range — droppable tombstones RETAINED
-- exactly for the keys the L2 halves still hold
r2ranked AS (
  SELECT f.*,
    row_number() OVER (PARTITION BY f.key, f.clustering, f.column_name
      ORDER BY f.timestamp_us DESC, f.size_bytes DESC,
               f.is_tombstone DESC, f.local_deletion_time_s DESC,
               f.ttl_s DESC, f.is_expiring DESC, f.kind DESC) AS rn
  FROM flush f
),
r2kept AS (
  SELECT * FROM r2ranked
  WHERE rn = 1 AND (
    NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
    OR key IN (SELECT key FROM p1kept))
),
-- P2: the genuine L1→L2 merge — the new L1 ('sst-970') with BOTH halves
-- ('sst-950'/'sst-951'), LWW across sources, bottom-level purge, outputs
-- re-partitioned on the replaced halves' boundary
p2src AS (
  SELECT 'sst-970' AS sstable_id, key, clustering, column_name, kind,
    timestamp_us, ttl_s, local_deletion_time_s, is_tombstone,
    is_expiring, size_bytes
  FROM r2kept
  UNION ALL
  SELECT 'sst-95' || CAST(s.shard AS VARCHAR), p.key, p.clustering,
    p.column_name, p.kind, p.timestamp_us, p.ttl_s,
    p.local_deletion_time_s, p.is_tombstone, p.is_expiring, p.size_bytes
  FROM p1kept p JOIN p1shard s USING (key)
),
p2ranked AS (
  SELECT m.*,
    row_number() OVER (PARTITION BY m.key, m.clustering, m.column_name
      ORDER BY m.timestamp_us DESC, m.sstable_id DESC, m.size_bytes DESC,
               m.is_tombstone DESC, m.local_deletion_time_s DESC,
               m.ttl_s DESC, m.is_expiring DESC, m.kind DESC) AS rn
  FROM p2src m
),
p2kept AS (
  SELECT *,
    CASE WHEN key <= (SELECT boundary FROM p1b) THEN 0 ELSE 1 END AS shard
  FROM p2ranked
  WHERE rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
),
-- the FINAL state: round-1 outputs + sst-5 at L1, P2's outputs at L2
finalev AS (
  SELECT 'sst-' || CAST(910 + oidx AS VARCHAR) AS sstable_id,
    CAST(1 AS BIGINT) AS level, key, clustering, column_name, kind,
    timestamp_us, ttl_s, local_deletion_time_s, is_tombstone, size_bytes
  FROM lkept
  UNION ALL
  SELECT 'sst-5', CAST(1 AS BIGINT), key, clustering, column_name, kind,
    timestamp_us, ttl_s, local_deletion_time_s, is_tombstone, size_bytes
  FROM lmapped WHERE sstable_id = 'sst-5'
  UNION ALL
  SELECT 'sst-98' || CAST(shard AS VARCHAR), CAST(2 AS BIGINT), key,
    clustering, column_name, kind, timestamp_us, ttl_s,
    local_deletion_time_s, is_tombstone, size_bytes
  FROM p2kept
)"""

  /** q185: the LCS what-if planner over the q183 final state — per-level
    * population, modeled volume vs the level's budget (base × 10^(n−1),
    * real LCS's geometric ladder), and the NEXT victim (lowest first key
    * at the deepest over-budget level). */
  private lazy val q185Sql: String =
    q183Ctes + s"""
, lvl AS (
  SELECT level, CAST(COUNT(DISTINCT sstable_id) AS BIGINT) AS sstables,
    CAST(SUM(32 + size_bytes) AS BIGINT) AS model_bytes
  FROM finalev GROUP BY 1
),
budgets AS (
  SELECT level, sstables, model_bytes,
    CAST(${graft.ops.LeveledPromotion.BaseBudgetBytes} *
      CAST(round(power(10, GREATEST(level - 1, 0))) AS BIGINT)
      AS BIGINT) AS budget_bytes
  FROM lvl
),
deepest AS (
  SELECT MAX(level) AS dl FROM budgets WHERE model_bytes > budget_bytes
),
vict AS (
  SELECT f.level, f.sstable_id,
    row_number() OVER (PARTITION BY f.level
      ORDER BY MIN(f.key), f.sstable_id) AS rnk
  FROM finalev f GROUP BY f.level, f.sstable_id
)
SELECT b.level, b.sstables, b.model_bytes, b.budget_bytes,
  (b.model_bytes > b.budget_bytes) AS over_budget,
  CASE WHEN b.level = (SELECT dl FROM deepest)
       THEN (SELECT v.sstable_id FROM vict v
             WHERE v.level = b.level AND v.rnk = 1)
       ELSE NULL END AS next_victim
FROM budgets b ORDER BY b.level"""

  /** q171: size-tiered minor compaction replayed end to end — see
    * [[graft.ops.MinorCompaction]] for the semantics being checked. */
  private lazy val q171Sql: String = q171Ctes + q171Select

  /** q186: STCS re-ingestion — the q171 compacted state (tier outputs +
    * passthrough) re-enters the size ladder; each unit re-derives its
    * tier from its own model bytes, exposing the CASCADE: the small
    * tiers' merge joins the passthrough's class (selected again — the
    * next minor), the big merge sits alone, stable. */
  private lazy val q186Sql: String = q171Ctes + s""",
newstate AS (
  SELECT 'sst-' || CAST(900 + tier AS VARCHAR) AS sstable_id,
    CAST(SUM(32 + size_bytes) AS BIGINT) AS model_bytes
  FROM kept GROUP BY tier
  UNION ALL
  SELECT m.sstable_id, CAST(SUM(32 + size_bytes) AS BIGINT)
  FROM tmapped m JOIN tagged g USING (sstable_id)
  WHERE NOT g.selected GROUP BY 1
),
ntier AS (
  SELECT sstable_id, model_bytes,
    ${bitLenSql("GREATEST(model_bytes // 16384, 1)")} AS tier
  FROM newstate
),
ncnt AS (SELECT tier, CAST(COUNT(*) AS BIGINT) AS members
         FROM ntier GROUP BY 1)
SELECT t.sstable_id, t.model_bytes, CAST(t.tier AS BIGINT) AS tier,
  (c.members >= 2) AS selected
FROM ntier t JOIN ncnt c USING (tier) ORDER BY t.sstable_id"""

  /** q189: the three-replica matrix repair — replica r's merged view
    * misses the sliver ((key+clustering)%29 == 0) of leaves ≡ r mod 3;
    * the matrix picks, per (leaf, target), the lowest-indexed matching
    * source; convergence folds own ∪ streamed per replica. All merged
    * (DISTINCT) views, mirroring the Merkle-over-read-path semantics
    * the operator implements. */
  /** Shared q189/q192 helpers: replica r's hole predicate, per-replica
    * merged leaf CTE, and the matrix source-selection CASE. */
  private def r3Hole(r: Int, q: String = "") =
    s"(${q}leaf % 3 = $r AND ${q}sliver = 0)"
  private def r3Lcte(r: Int) = s"""
l$r AS (
  SELECT leaf, CAST(COUNT(*) AS BIGINT) AS e$r,
    CAST(SUM(eh) AS BIGINT) AS d$r
  FROM dev WHERE NOT ${r3Hole(r)} GROUP BY 1
)"""
  // source for target t: -1 when t already matches the union, else
  // the lowest index among the OTHER replicas whose digest matches
  private def r3SrcCase(t: Int) = {
    val others = (0 until 3).filter(_ != t)
    s"CASE WHEN COALESCE(d$t, -1) = du THEN -1 " +
      others.map(o => s"WHEN COALESCE(d$o, -1) = du THEN $o ")
        .mkString + "END AS s" + t
  }

  /** The q189 chain's WITH-prefix (shared with q192): the sliver
    * mapping, hashed events, merged (distinct) views, per-replica and
    * union leaf digests, and the `srcs` direction matrix. */
  private lazy val q189Ctes: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    val span = 1L << graft.ops.AntiEntropy.TokenLeafShift
    s"""WITH $fixtures,
rmapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    (key + clustering) % 29 AS sliver
  FROM licells
),
rev AS (
  SELECT *, $evHash % 1000003 AS eh,
    ${h60("CAST(key AS VARCHAR)")} // $span AS leaf
  FROM rmapped
),
dev AS (
  SELECT DISTINCT key, clustering, column_name, kind, timestamp_us,
    ttl_s, local_deletion_time_s, size_bytes, eh, leaf, sliver
  FROM rev
),${r3Lcte(0)},${r3Lcte(1)},${r3Lcte(2)},
uni AS (
  SELECT leaf, CAST(COUNT(*) AS BIGINT) AS eu,
    CAST(SUM(eh) AS BIGINT) AS du
  FROM dev GROUP BY 1
),
m AS (
  SELECT uni.leaf, eu, du, e0, d0, e1, d1, e2, d2
  FROM uni LEFT JOIN l0 USING (leaf) LEFT JOIN l1 USING (leaf)
    LEFT JOIN l2 USING (leaf)
),
srcs AS (
  SELECT leaf, ${r3SrcCase(0)}, ${r3SrcCase(1)}, ${r3SrcCase(2)}
  FROM m
)"""
  }

  private lazy val q189Sql: String = {
    // post-repair view of replica r: own events, plus — when the matrix
    // streams source s to r — s's events in that leaf
    def pcte(r: Int) = s"""
p$r AS (
  SELECT d.leaf, CAST(SUM(d.eh) AS BIGINT) AS pd$r
  FROM dev d JOIN srcs s ON d.leaf = s.leaf
  WHERE NOT ${r3Hole(r, "d.")}
     ${(0 until 3).filter(_ != r).map(o =>
        s"OR (s.s$r = $o AND NOT ${r3Hole(o, "d.")})").mkString("\n     ")}
  GROUP BY 1
)"""
    q189Ctes + s""",${pcte(0)},${pcte(1)},${pcte(2)}
SELECT m.leaf,
  COALESCE(e0, 0) AS r0_events, COALESCE(e1, 0) AS r1_events,
  COALESCE(e2, 0) AS r2_events, eu AS u_events,
  CAST(s.s0 AS BIGINT) AS src_for_r0,
  CAST(s.s1 AS BIGINT) AS src_for_r1,
  CAST(s.s2 AS BIGINT) AS src_for_r2,
  (pd0 = du) AS r0_converged, (pd1 = du) AS r1_converged,
  (pd2 = du) AS r2_converged
FROM m JOIN srcs s USING (leaf)
  LEFT JOIN p0 USING (leaf) LEFT JOIN p1 USING (leaf)
  LEFT JOIN p2 USING (leaf)
ORDER BY m.leaf"""
  }

  /** q192: the matrix session's closing act — per replica, the RAW
    * incremental triple of the converged set (own files ∪ its streamed
    * sstables; the incremental digest reads raw rows, so no distinct)
    * vs the marked set's zero row. */
  private lazy val q192Sql: String = {
    def conv(r: Int) = s"""
conv$r AS (
  SELECT eh, leaf FROM rev WHERE NOT ${r3Hole(r)}
  ${(0 until 3).filter(_ != r).map(o => s"""
  UNION ALL
  SELECT v.eh, v.leaf FROM rev v JOIN srcs s ON v.leaf = s.leaf
  WHERE s.s$r = $o AND NOT ${r3Hole(o, "v.")}""").mkString}
),
ns$r AS (
  SELECT CAST((SELECT COUNT(DISTINCT sstable_id) FROM licells) +
    (SELECT COUNT(DISTINCT s$r) FROM srcs WHERE s$r >= 0)
    AS BIGINT) AS sst
)"""
    def rows(r: Int) = s"""
SELECT 'r$r-converged' AS state, ns.sst AS sstables,
  ns.sst AS unrepaired_sstables,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(COUNT(DISTINCT leaf) AS BIGINT) AS leaves,
  CAST(SUM(eh) AS BIGINT) AS digest
FROM conv$r, ns$r ns GROUP BY ns.sst
UNION ALL
SELECT 'r$r-marked', ns.sst, CAST(0 AS BIGINT),
  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM ns$r ns"""
    q189Ctes + s""",${conv(0)},${conv(1)},${conv(2)}
${rows(0)}
UNION ALL
${rows(1)}
UNION ALL
${rows(2)}
ORDER BY state"""
  }

  /** q194: the multi-source merge repair — uniform (leaf-uncorrelated)
    * divergence with sliver (key+clustering)%31 == r per replica; per
    * (leaf, target) the plan streams from the lowest matching replica
    * when one exists, else from ALL others; convergence folds the
    * merged union per replica. */
  private lazy val q194Sql: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    val span = 1L << graft.ops.AntiEntropy.TokenLeafShift
    def hole(r: Int, q: String = "") = s"(${q}sliver = $r)"
    def mt(r: Int) = s"(COALESCE(d$r, -1) = du)"
    def lcte(r: Int) = s"""
l$r AS (
  SELECT leaf, CAST(SUM(eh) AS BIGINT) AS d$r
  FROM dev WHERE NOT ${hole(r)} GROUP BY 1
)"""
    def pcte(r: Int) = {
      val Seq(a, b) = (0 until 3).filter(_ != r)
      s"""
p$r AS (
  SELECT d.leaf, CAST(SUM(d.eh) AS BIGINT) AS pd$r
  FROM dev d JOIN m ON d.leaf = m.leaf
  WHERE NOT ${hole(r, "d.")}
     OR (NOT ${mt(r)} AND CASE
          WHEN ${mt(a)} THEN NOT ${hole(a, "d.")}
          WHEN ${mt(b)} THEN NOT ${hole(b, "d.")}
          ELSE (NOT ${hole(a, "d.")} OR NOT ${hole(b, "d.")}) END)
  GROUP BY 1
)"""
    }
    def nsrc(r: Int) = {
      val Seq(a, b) = (0 until 3).filter(_ != r)
      s"CAST(CASE WHEN ${mt(r)} THEN 0 " +
        s"WHEN ${mt(a)} OR ${mt(b)} THEN 1 ELSE 2 END AS BIGINT) " +
        s"AS nsrc_r$r"
    }
    s"""WITH $fixtures,
rmapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    (key + clustering) % 31 AS sliver
  FROM licells
),
rev AS (
  SELECT *, $evHash % 1000003 AS eh,
    ${h60("CAST(key AS VARCHAR)")} // $span AS leaf
  FROM rmapped
),
dev AS (
  SELECT DISTINCT key, clustering, column_name, kind, timestamp_us,
    ttl_s, local_deletion_time_s, size_bytes, eh, leaf, sliver
  FROM rev
),${lcte(0)},${lcte(1)},${lcte(2)},
uni AS (
  SELECT leaf, CAST(COUNT(*) AS BIGINT) AS eu,
    CAST(SUM(eh) AS BIGINT) AS du
  FROM dev GROUP BY 1
),
m AS (
  SELECT uni.leaf, eu, du, d0, d1, d2
  FROM uni LEFT JOIN l0 USING (leaf) LEFT JOIN l1 USING (leaf)
    LEFT JOIN l2 USING (leaf)
),${pcte(0)},${pcte(1)},${pcte(2)}
SELECT m.leaf, eu AS u_events,
  ${mt(0)} AS r0_matched, ${mt(1)} AS r1_matched, ${mt(2)} AS r2_matched,
  ${nsrc(0)}, ${nsrc(1)}, ${nsrc(2)},
  (pd0 = du) AS r0_converged, (pd1 = du) AS r1_converged,
  (pd2 = du) AS r2_converged
FROM m LEFT JOIN p0 USING (leaf) LEFT JOIN p1 USING (leaf)
  LEFT JOIN p2 USING (leaf)
ORDER BY m.leaf"""
  }

  /** The q188 chain's WITH-prefix (shared with q190's what-if and
    * q191's re-ingestion): the twcsx band mapping, per-sstable stats,
    * expiry+blocker tagging, window buckets and the merged-window
    * `xkept` relation. */
  private lazy val q188Ctes: String = s"""WITH $fixtures,
xmapped AS (
  SELECT CASE WHEN is_tombstone AND local_deletion_time_s < $GcBeforeS THEN
           CASE WHEN timestamp_us // 86400000000 < 1920 THEN 'sst-4'
                ELSE 'sst-5' END
         WHEN timestamp_us // 86400000000 < 2560 THEN 'sst-0'
         WHEN timestamp_us // 86400000000 < 3200 THEN 'sst-1'
         ELSE 'sst-' || CAST(2 + (key + clustering) % 2 AS VARCHAR)
         END AS sstable_id,
    key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
  WHERE (is_tombstone AND local_deletion_time_s < $GcBeforeS)
     OR timestamp_us // 86400000000 >= 1920
),
xstats AS (
  SELECT sstable_id, MIN(key) AS fk, MAX(key) AS lk,
    MIN(timestamp_us) AS mints, MAX(timestamp_us) AS maxts,
    MAX(local_deletion_time_s) AS maxldt,
    (MAX(timestamp_us) // 86400000000) // 640 AS swin
  FROM xmapped GROUP BY 1
),
xtag AS (
  SELECT s.*, (s.maxldt < $GcBeforeS) AS expired,
    CASE WHEN s.maxldt < $GcBeforeS THEN EXISTS (
        SELECT 1 FROM xstats b WHERE b.maxldt >= $GcBeforeS
          AND b.fk <= s.lk AND b.lk >= s.fk AND b.mints <= s.maxts)
      ELSE FALSE END AS is_blocked
  FROM xstats s
),
xmulti AS (
  SELECT swin, CAST(COUNT(*) AS BIGINT) AS members
  FROM xtag WHERE NOT expired GROUP BY 1 HAVING COUNT(*) >= 2
),
xranked AS (
  SELECT m.*, t.swin, w.members, row_number() OVER (
      PARTITION BY t.swin, m.key, m.clustering, m.column_name
      ORDER BY m.timestamp_us DESC, m.sstable_id DESC, m.size_bytes DESC,
               m.is_tombstone DESC, m.local_deletion_time_s DESC,
               m.ttl_s DESC, m.is_expiring DESC, m.kind DESC) AS rn
  FROM xmapped m JOIN xtag t USING (sstable_id)
  JOIN xmulti w ON t.swin = w.swin
  WHERE NOT t.expired
),
xoutkeys AS (
  -- keys held by some sstable OUTSIDE window w's merge: expired files
  -- still on disk, and every live file of another window
  SELECT DISTINCT w.swin, m.key
  FROM xmapped m JOIN xtag t USING (sstable_id)
  CROSS JOIN (SELECT swin FROM xmulti) w
  WHERE t.expired OR t.swin <> w.swin
),
xkept AS (
  SELECT * FROM xranked
  WHERE rn = 1 AND (
    NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
    OR EXISTS (SELECT 1 FROM xoutkeys o
               WHERE o.swin = xranked.swin AND o.key = xranked.key))
)"""

  /** q188: the executed TWCS cycle over the twcsx banded set — window
    * assignment (max write-day div 640 per sstable), fully-expired
    * candidacy, the q178 blocker rule deciding drop vs blocked, the
    * ≥2-member live window's LWW merge under the per-window
    * conservative purge guard, and one rollup row per unit. See
    * [[graft.ops.TwcsCompaction]] for the semantics being checked. */
  private lazy val q188Sql: String = q188Ctes + s""",
xunits AS (
  SELECT 'window-' || CAST(swin AS VARCHAR) AS unit,
    'compacted' AS action, swin, members AS sstables_in,
    key, clustering, column_name, kind, timestamp_us, ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring, size_bytes
  FROM xkept
  UNION ALL
  SELECT m.sstable_id AS unit,
    CASE WHEN t.expired AND t.is_blocked THEN 'blocked'
         WHEN t.expired THEN 'dropped'
         ELSE 'passthrough' END AS action,
    t.swin, CAST(1 AS BIGINT) AS sstables_in,
    m.key, m.clustering, m.column_name, m.kind, m.timestamp_us, m.ttl_s,
    m.local_deletion_time_s, m.is_tombstone, m.is_expiring, m.size_bytes
  FROM xmapped m JOIN xtag t USING (sstable_id)
  WHERE t.expired OR t.swin NOT IN (SELECT swin FROM xmulti)
)
SELECT unit, action, CAST(swin AS BIGINT) AS win,
  CAST(MAX(sstables_in) AS BIGINT) AS sstables_in,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(SUM(CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 1 ELSE 0 END) AS BIGINT) AS markers,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(ttl_s % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT) AS expiring,
  CAST(SUM(size_bytes % 1000003) AS BIGINT) AS value_sum
FROM xunits GROUP BY 1, 2, 3 ORDER BY unit"""

  /** q197: TWCS with IN-WINDOW STCS (round 16) — the twcsst banded
    * set's window assignment (max write-day div 640 per sstable)
    * composed with the in-window size ladder (bit-length of modeled
    * bytes div 2 KiB): only a (window, tier) group with ≥2 members
    * LWW-merges (under the per-group conservative purge guard — the
    * droppable set is confined to the old band, so nothing purges);
    * the big flush sharing the newest window passes through. See
    * [[graft.ops.TwcsStcsCompaction]]. */
  private lazy val q197Sql: String = s"""WITH $fixtures,
ymapped AS (
  SELECT CASE WHEN timestamp_us // 86400000000 < 2560 THEN 'sst-0'
         WHEN timestamp_us // 86400000000 < 3200 THEN 'sst-1'
         ELSE CASE (key + clustering) % 6
              WHEN 0 THEN 'sst-2' WHEN 1 THEN 'sst-3'
              ELSE 'sst-4' END END AS sstable_id,
    key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
ystats AS (
  SELECT sstable_id,
    (MAX(timestamp_us) // 86400000000) // 640 AS swin,
    CAST(SUM(32 + size_bytes) AS BIGINT) AS bytes
  FROM ymapped GROUP BY 1
),
ytier AS (
  SELECT sstable_id, swin,
    ${bitLenSql("GREATEST(bytes // 2048, 1)")} AS stier
  FROM ystats
),
ysel AS (
  SELECT swin, stier, CAST(COUNT(*) AS BIGINT) AS members
  FROM ytier GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
yranked AS (
  SELECT m.*, t.swin, t.stier, w.members, row_number() OVER (
      PARTITION BY t.swin, t.stier, m.key, m.clustering, m.column_name
      ORDER BY m.timestamp_us DESC, m.sstable_id DESC, m.size_bytes DESC,
               m.is_tombstone DESC, m.local_deletion_time_s DESC,
               m.ttl_s DESC, m.is_expiring DESC, m.kind DESC) AS rn
  FROM ymapped m JOIN ytier t USING (sstable_id)
  JOIN ysel w ON t.swin = w.swin AND t.stier = w.stier
),
youtkeys AS (
  -- keys held by some sstable OUTSIDE group (w): other windows, other
  -- tiers of the same window (including the lone big flush)
  SELECT DISTINCT w.swin, w.stier, m.key
  FROM ymapped m JOIN ytier t USING (sstable_id)
  CROSS JOIN (SELECT swin, stier FROM ysel) w
  WHERE t.swin <> w.swin OR t.stier <> w.stier
),
ykept AS (
  SELECT * FROM yranked
  WHERE rn = 1 AND (
    NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
    OR EXISTS (SELECT 1 FROM youtkeys o
               WHERE o.swin = yranked.swin AND o.stier = yranked.stier
                 AND o.key = yranked.key))
),
yunits AS (
  SELECT 'win-' || CAST(swin AS VARCHAR) || '-tier-' ||
      CAST(stier AS VARCHAR) AS unit,
    'compacted' AS action, swin, stier, members AS sstables_in,
    key, clustering, column_name, timestamp_us, ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring, size_bytes
  FROM ykept
  UNION ALL
  SELECT m.sstable_id AS unit, 'passthrough' AS action,
    t.swin, t.stier, CAST(1 AS BIGINT) AS sstables_in,
    m.key, m.clustering, m.column_name, m.timestamp_us, m.ttl_s,
    m.local_deletion_time_s, m.is_tombstone, m.is_expiring, m.size_bytes
  FROM ymapped m JOIN ytier t USING (sstable_id)
  WHERE NOT EXISTS (SELECT 1 FROM ysel s
                    WHERE s.swin = t.swin AND s.stier = t.stier)
)
SELECT unit, action, CAST(swin AS BIGINT) AS win,
  CAST(stier AS BIGINT) AS tier,
  CAST(MAX(sstables_in) AS BIGINT) AS sstables_in,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(ttl_s % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT)
    AS tombstones,
  CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT)
    AS expiring,
  CAST(SUM(size_bytes % 1000003) AS BIGINT) AS value_sum
FROM yunits GROUP BY 1, 2, 3, 4 ORDER BY unit"""

  /** q206: UNIFIED compaction (round 16) — the full UCS decision chain
    * replayed from parquet: the fixture's (key, clustering, timestamp,
    * token) assignment, per-sstable modeled bytes + token span, the
    * span-normalized density, the adaptive base m = total/32, the
    * floor(log4) level ladder, the per-level regime split (level 0
    * merges when ≥4 members exist; levels ≥1 group into overlap islands
    * over [min_tok, max_tok] spans and merge only ≥2-member islands),
    * the per-group LWW winners, the conservative purge guard (EXISTS an
    * outside holder), and the fixed-ring-quarter output shard split. */
  /** The shared UCS decision chain (q206 + q211): fixture assignment,
    * per-sstable bytes + token span, density, the adaptive base, the
    * floor(log4) ladder, overlap islands, group selection, LWW winners
    * and the guard — everything through `ukept`/`uassign`. */
  private lazy val ucsChainSql: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    s"""umapped AS (
  SELECT CASE WHEN (key + clustering) % 4 = 3
         THEN 'sst-' || CAST((((key + clustering) % 8) // 4) * 2
                             + timestamp_us % 2 AS VARCHAR)
         ELSE 'sst-' || CAST(CASE
              WHEN $tok // 144115188075855872 <= 1 THEN 4
              WHEN $tok // 144115188075855872 <= 3 THEN 5
              WHEN $tok // 144115188075855872 = 4
                THEN 6 + timestamp_us % 2
              ELSE 8 END AS VARCHAR) END AS sstable_id,
    key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    $tok AS tok
  FROM licells
),
ustats AS (
  SELECT sstable_id, CAST(SUM(32 + size_bytes) AS BIGINT) AS bytes,
    MIN(tok) AS mn, MAX(tok) AS mx
  FROM umapped GROUP BY 1
),
ubase AS (
  SELECT GREATEST(CAST(SUM(bytes) AS BIGINT) // 32, 1) AS m FROM ustats
),
udens AS (
  SELECT sstable_id, bytes, mn, mx,
    bytes * 65536 //
      ((mx // 17592186044416) - (mn // 17592186044416) + 1) AS density
  FROM ustats
),
ulev AS (
  SELECT d.*,
    (${bitLenSql("GREATEST(density // m, 1)")} - 1) // 2 AS level
  FROM udens d, ubase
),
uprev AS (
  SELECT *, MAX(mx) OVER (PARTITION BY level ORDER BY mn, sstable_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM ulev WHERE level >= 1
),
uisl AS (
  SELECT *, SUM(CASE WHEN prev_max IS NULL OR mn > prev_max
                     THEN 1 ELSE 0 END)
      OVER (PARTITION BY level ORDER BY mn, sstable_id) AS island
  FROM uprev
),
ugroups AS (
  SELECT CAST(0 AS BIGINT) AS level, CAST(0 AS BIGINT) AS island,
    CAST(0 AS BIGINT) AS lo, CAST(COUNT(*) AS BIGINT) AS members
  FROM ulev WHERE level = 0 HAVING COUNT(*) >= 4
  UNION ALL
  SELECT CAST(level AS BIGINT), CAST(island AS BIGINT),
    CAST(MIN(mn) AS BIGINT), CAST(COUNT(*) AS BIGINT)
  FROM uisl GROUP BY level, island HAVING COUNT(*) >= 2
),
ug AS (
  SELECT *, row_number() OVER (ORDER BY level, lo) - 1 AS g FROM ugroups
),
uassign AS (
  SELECT t.sstable_id, u.g, u.members, u.level AS glevel
  FROM uisl t JOIN ug u ON u.level = t.level AND u.island = t.island
  UNION ALL
  SELECT t.sstable_id, u.g, u.members, u.level AS glevel
  FROM ulev t JOIN ug u ON u.level = 0 AND t.level = 0
),
uranked AS (
  SELECT m.*, a.g, a.members, a.glevel, row_number() OVER (
      PARTITION BY a.g, m.key, m.clustering, m.column_name
      ORDER BY m.timestamp_us DESC, m.sstable_id DESC, m.size_bytes DESC,
               m.is_tombstone DESC, m.local_deletion_time_s DESC,
               m.ttl_s DESC, m.is_expiring DESC, m.kind DESC) AS rn
  FROM umapped m JOIN uassign a USING (sstable_id)
),
uoutkeys AS (
  SELECT DISTINCT w.g, m.key
  FROM umapped m LEFT JOIN uassign a USING (sstable_id)
  CROSS JOIN (SELECT g FROM ug) w
  WHERE a.g IS NULL OR a.g <> w.g
),
ukept AS (
  SELECT * FROM uranked
  WHERE rn = 1 AND (
    NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
    OR EXISTS (SELECT 1 FROM uoutkeys o
               WHERE o.g = uranked.g AND o.key = uranked.key))
)"""
  }

  private lazy val q206Sql: String = s"""WITH $fixtures,
$ucsChainSql,
uunits AS (
  SELECT 'cmp-' || CAST(g AS VARCHAR) || '-s' ||
      CAST(tok // 288230376151711744 AS VARCHAR) AS unit,
    'compacted' AS action, glevel AS level,
    tok // 288230376151711744 AS shard, members AS sstables_in,
    key, clustering, column_name, timestamp_us, ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring, size_bytes
  FROM ukept
  UNION ALL
  SELECT m.sstable_id AS unit, 'passthrough' AS action, t.level,
    CAST(-1 AS BIGINT) AS shard, CAST(1 AS BIGINT) AS sstables_in,
    m.key, m.clustering, m.column_name, m.timestamp_us, m.ttl_s,
    m.local_deletion_time_s, m.is_tombstone, m.is_expiring, m.size_bytes
  FROM umapped m JOIN ulev t USING (sstable_id)
  WHERE NOT EXISTS (SELECT 1 FROM uassign a
                    WHERE a.sstable_id = m.sstable_id)
)
SELECT unit, action, CAST(level AS BIGINT) AS level,
  CAST(shard AS BIGINT) AS shard,
  CAST(MAX(sstables_in) AS BIGINT) AS sstables_in,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(ttl_s % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT)
    AS tombstones,
  CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT)
    AS expiring,
  CAST(SUM(size_bytes % 1000003) AS BIGINT) AS value_sum
FROM uunits GROUP BY 1, 2, 3, 4 ORDER BY unit"""

  /** q211: UCS re-ingestion (round 16) — the compacted state re-derived
    * from parquet (output units = the kept winners per (group, shard),
    * passthrough originals carried), then the ENTIRE planning pass run
    * again over it: bytes, spans, density, the adaptive base, levels,
    * islands, selection. The steady-state verdict (every file
    * passthrough, no group selects) is the replay's OUTPUT, not an
    * assumption — a mis-sized output or a broken shard split would
    * re-select and break the hash. */
  private lazy val q211Sql: String = s"""WITH $fixtures,
$ucsChainSql,
rstate AS (
  SELECT 'sst-' || CAST(1400 + g * 4 + tok // 288230376151711744
      AS VARCHAR) AS unit,
    key, size_bytes, tok
  FROM ukept
  UNION ALL
  SELECT m.sstable_id AS unit, m.key, m.size_bytes, m.tok
  FROM umapped m
  WHERE NOT EXISTS (SELECT 1 FROM uassign a
                    WHERE a.sstable_id = m.sstable_id)
),
rstats AS (
  SELECT unit, CAST(SUM(32 + size_bytes) AS BIGINT) AS bytes,
    MIN(tok) AS mn, MAX(tok) AS mx
  FROM rstate GROUP BY 1
),
rbase AS (
  SELECT GREATEST(CAST(SUM(bytes) AS BIGINT) // 32, 1) AS m FROM rstats
),
rdens AS (
  SELECT unit, bytes,
    (mx // 17592186044416) - (mn // 17592186044416) + 1 AS span_units,
    bytes * 65536 //
      ((mx // 17592186044416) - (mn // 17592186044416) + 1) AS density,
    mn, mx
  FROM rstats
),
rlev AS (
  SELECT d.*, density // m AS ratio,
    (${bitLenSql("GREATEST(density // m, 1)")} - 1) // 2 AS level
  FROM rdens d, rbase
),
rprev AS (
  SELECT *, MAX(mx) OVER (PARTITION BY level ORDER BY mn, unit
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM rlev WHERE level >= 1
),
risl AS (
  SELECT *, SUM(CASE WHEN prev_max IS NULL OR mn > prev_max
                     THEN 1 ELSE 0 END)
      OVER (PARTITION BY level ORDER BY mn, unit) AS island
  FROM rprev
),
rgroups AS (
  SELECT CAST(0 AS BIGINT) AS level, CAST(0 AS BIGINT) AS island,
    CAST(0 AS BIGINT) AS lo
  FROM rlev WHERE level = 0 HAVING COUNT(*) >= 4
  UNION ALL
  SELECT CAST(level AS BIGINT), CAST(island AS BIGINT),
    CAST(MIN(mn) AS BIGINT)
  FROM risl GROUP BY level, island HAVING COUNT(*) >= 2
),
rg AS (
  SELECT *, row_number() OVER (ORDER BY level, lo) - 1 AS g FROM rgroups
),
rassign AS (
  SELECT t.unit, u.g
  FROM risl t JOIN rg u ON u.level = t.level AND u.island = t.island
  UNION ALL
  SELECT t.unit, u.g
  FROM rlev t JOIN rg u ON u.level = 0 AND t.level = 0
)
SELECT l.unit, CAST(l.bytes AS BIGINT) AS model_bytes,
  CAST(l.span_units AS BIGINT) AS span_units,
  CAST(l.density AS BIGINT) AS density,
  CAST(l.ratio AS BIGINT) AS ratio,
  CAST(l.level AS BIGINT) AS level,
  COALESCE('merge-g' || CAST(a.g AS VARCHAR), 'passthrough') AS action
FROM rlev l LEFT JOIN rassign a USING (unit)
ORDER BY l.unit"""

  /** q212: nodetool cleanup (round 16) — the ring-doubling ownership
    * arithmetic replayed: old node n keeps eighths {2n, 2n+7 mod 8}
    * and drops {2n+1, 2n+6 mod 8}; each retained view's events +
    * digest equal the corpus's for that eighth (the engine computes
    * them off the REAL cleaned files), the views partition the ring
    * (holders = 1), and the dropped count is the two foreign eighths'
    * corpus volume. */
  private lazy val q212Sql: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
cmapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    $tok AS tok
  FROM licells
),
ccorp AS (
  SELECT tok // 144115188075855872 AS eighth,
    CAST(COUNT(*) AS BIGINT) AS corpus_events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS corpus_digest
  FROM cmapped GROUP BY 1
),
cnodes AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(n)),
ckept AS (
  SELECT n, (2 * n) % 8 AS eighth FROM cnodes
  UNION ALL
  SELECT n, (2 * n + 7) % 8 FROM cnodes
),
cdrop AS (
  SELECT x.n, CAST(SUM(c.corpus_events) AS BIGINT) AS node_dropped
  FROM cnodes x JOIN ccorp c
    ON c.eighth = (2 * x.n + 1) % 8 OR c.eighth = (2 * x.n + 6) % 8
  GROUP BY x.n
)
SELECT CAST(k.n AS BIGINT) AS node, CAST(k.eighth AS BIGINT) AS eighth,
  c.corpus_events AS events, c.corpus_digest AS digest,
  c.corpus_events, c.corpus_digest,
  TRUE AS verified, d.node_dropped, CAST(1 AS BIGINT) AS holders
FROM ckept k
JOIN ccorp c ON c.eighth = k.eighth
JOIN cdrop d ON d.n = k.n
ORDER BY node, eighth"""
  }

  /** q213: node bootstrap (round 16) — the converged doubled ring
    * replayed: old nodes (even positions) keep eighths {2n, 2n+7 mod
    * 8}, new nodes (odd positions p) receive {p, p+6... p−1} from
    * their predecessor (p−1)/2; every view's events + digest equal the
    * corpus's for its eighth (engine-computed off the real cleaned +
    * bootstrapped files) and every eighth is held by exactly RF=2
    * nodes. */
  private lazy val q213Sql: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
bmapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    $tok AS tok
  FROM licells
),
bcorp AS (
  SELECT tok // 144115188075855872 AS eighth,
    CAST(COUNT(*) AS BIGINT) AS corpus_events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS corpus_digest
  FROM bmapped GROUP BY 1
),
bviews AS (
  SELECT 2 * n AS position, (2 * n) % 8 AS eighth,
    'old-cleaned' AS origin, CAST(-1 AS BIGINT) AS source
  FROM (VALUES (0), (1), (2), (3)) t(n)
  UNION ALL
  SELECT 2 * n, (2 * n + 7) % 8, 'old-cleaned', CAST(-1 AS BIGINT)
  FROM (VALUES (0), (1), (2), (3)) t(n)
  UNION ALL
  SELECT p, p % 8, 'new-bootstrapped', CAST((p - 1) // 2 AS BIGINT)
  FROM (VALUES (1), (3), (5), (7)) t(p)
  UNION ALL
  SELECT p, (p + 7) % 8, 'new-bootstrapped', CAST((p - 1) // 2 AS BIGINT)
  FROM (VALUES (1), (3), (5), (7)) t(p)
)
SELECT CAST(v.position AS BIGINT) AS position,
  CAST(v.eighth AS BIGINT) AS eighth, v.origin, v.source,
  c.corpus_events AS events, c.corpus_digest AS digest,
  c.corpus_events, c.corpus_digest,
  TRUE AS verified, CAST(2 AS BIGINT) AS holders
FROM bviews v JOIN bcorp c ON c.eighth = v.eighth
ORDER BY position, eighth"""
  }

  /** q214: sstablepartitions (round 16) — the threshold report over the
    * per-sstable pscan grain (the real tool inspects files one by one):
    * partitions crossing size ≥ 20000 / cells ≥ 4 / tombstones ≥ 3,
    * each with the dimensions that flagged it. */
  private lazy val q214Sql: String = s"""WITH $fixtures
SELECT sstable_id, key, size, cell_count, tombstone_count,
  (size >= 20000) AS over_size,
  (cell_count >= 4) AS over_cells,
  (tombstone_count >= 3) AS over_tombstones
FROM lipscan
WHERE size >= 20000 OR cell_count >= 4 OR tombstone_count >= 3
ORDER BY sstable_id, key"""

  /** The PQ/ADC CTE chain shared by q130 and q240: per-subspace
    * 2-iteration Lloyd's, candidate codes, per-query exact subspace
    * distance tables, and the full (query, candidate) ADC relation. */
  private lazy val pqAdcCtes: String = s"""$quantized,
sub0 AS (SELECT vec_id, s, list_slice(qv, s*16+1, s*16+16) AS sv
  FROM qn, UNNEST([0, 1, 2, 3]) AS t(s)),
subn AS (SELECT vec_id, s, sv,
  CAST(list_sum(list_transform(sv, x -> x * x)) AS BIGINT) AS sn2
  FROM sub0),
pc0 AS (SELECT s, vec_id AS cid, sv AS cv, sn2 AS cn2
  FROM subn WHERE vec_id < 8),
pd1 AS (
  SELECT q.vec_id, q.s, q.sv, q.sn2, c.cid,
    q.sn2 + c.cn2 - 2 * CAST(list_sum(list_transform(
      range(1, len(q.sv) + 1), i -> q.sv[i] * c.cv[i])) AS BIGINT) AS d2
  FROM subn q JOIN pc0 c ON q.s = c.s),
pa1 AS (SELECT vec_id, s, sv, sn2, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid)
      AS rn FROM pd1) WHERE rn = 1),
pu1 AS (SELECT s, cid, pos,
    CAST(floor(SUM(v) / COUNT(*)) AS BIGINT) AS cvp
  FROM (SELECT s, cid, UNNEST(sv) AS v,
          UNNEST(range(1, len(sv) + 1)) AS pos FROM pa1)
  GROUP BY 1, 2, 3),
pc1l AS (SELECT s, cid, list(cvp ORDER BY pos) AS cv
  FROM pu1 GROUP BY s, cid),
pc1 AS (SELECT s, cid, cv,
  CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn2
  FROM pc1l),
pd2 AS (
  SELECT q.vec_id, q.s, q.sv, q.sn2, c.cid,
    q.sn2 + c.cn2 - 2 * CAST(list_sum(list_transform(
      range(1, len(q.sv) + 1), i -> q.sv[i] * c.cv[i])) AS BIGINT) AS d2
  FROM subn q JOIN pc1 c ON q.s = c.s),
pa2 AS (SELECT vec_id, s, sv, sn2, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid)
      AS rn FROM pd2) WHERE rn = 1),
pu2 AS (SELECT s, cid, pos,
    CAST(floor(SUM(v) / COUNT(*)) AS BIGINT) AS cvp
  FROM (SELECT s, cid, UNNEST(sv) AS v,
          UNNEST(range(1, len(sv) + 1)) AS pos FROM pa2)
  GROUP BY 1, 2, 3),
pc2l AS (SELECT s, cid, list(cvp ORDER BY pos) AS cv
  FROM pu2 GROUP BY s, cid),
pc2 AS (SELECT s, cid, cv,
  CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn2
  FROM pc2l),
pd3 AS (
  SELECT q.vec_id, q.s, c.cid,
    q.sn2 + c.cn2 - 2 * CAST(list_sum(list_transform(
      range(1, len(q.sv) + 1), i -> q.sv[i] * c.cv[i])) AS BIGINT) AS d2
  FROM subn q JOIN pc2 c ON q.s = c.s),
codes AS (SELECT vec_id, s, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid)
      AS rn FROM pd3 WHERE vec_id >= 8) WHERE rn = 1),
qtab AS (SELECT vec_id AS qid, s, cid, d2 AS dq
  FROM pd3 WHERE vec_id < 8),
adc AS (
  SELECT t.qid AS query_id, x.vec_id AS neighbor_id,
    CAST(SUM(t.dq) AS BIGINT) AS adc_d2
  FROM codes x JOIN qtab t ON x.s = t.s AND x.cid = t.cid
  GROUP BY 1, 2)"""

  /** The vnode ring walk (round 17), derived RELATIONALLY from just
    * the (slot, owner) token VALUES — an independent SQL replay of the
    * engine's iterative Scala walk (ops/VnodeRing.scala):
    *  - `vold2`/`vold`: full-ring RF=2 — the second replica is the
    *    first clockwise token owned by a DISTINCT node (same-owner
    *    tokens skipped via the u.node <> t.node join);
    *  - `vown`: with node 3's tokens removed, each range merges into
    *    the first SURVIVING token at or clockwise-after it (off >= 0);
    *  - `vns2`/`vnew`: the survivor-ring second — first surviving
    *    token after the owning slot with a distinct owner;
    *  - `vgain`: new ⊇ old∖{leaver}, so at most one node gains. */
  private lazy val vnodeTokenValues: String =
    graft.ops.VnodeRing.Owners.zipWithIndex
      .map { case (n, s) => s"($s, $n)" }.mkString(", ")

  private lazy val vnodeWalkCtes: String = {
    val k = graft.ops.VnodeRing.Slots
    val leaving = graft.ops.VnodeRing.Leaving
    s"""vtok AS (SELECT * FROM (VALUES $vnodeTokenValues) t(slot, node)),
vold2 AS (
  SELECT t.slot, u.node,
    row_number() OVER (PARTITION BY t.slot
      ORDER BY (u.slot - t.slot + $k) % $k) AS rn
  FROM vtok t JOIN vtok u ON u.node <> t.node
),
vold AS (
  SELECT t.slot, t.node AS old_primary, s.node AS old_second
  FROM vtok t JOIN (SELECT slot, node FROM vold2 WHERE rn = 1) s
    USING (slot)
),
vsurv AS (SELECT * FROM vtok WHERE node <> $leaving),
vownr AS (
  SELECT t.slot, u.slot AS own_slot, u.node AS new_primary,
    row_number() OVER (PARTITION BY t.slot
      ORDER BY (u.slot - t.slot + $k) % $k) AS rn
  FROM vtok t CROSS JOIN vsurv u
),
vown AS (SELECT slot, own_slot, new_primary FROM vownr WHERE rn = 1),
vns2 AS (
  SELECT o.slot, u.node AS new_second,
    row_number() OVER (PARTITION BY o.slot
      ORDER BY (u.slot - o.own_slot + $k) % $k) AS rn
  FROM vown o JOIN vsurv u
    ON u.node <> o.new_primary AND u.slot <> o.own_slot
),
vnew AS (
  SELECT o.slot, o.new_primary, s.new_second
  FROM vown o JOIN (SELECT slot, new_second FROM vns2 WHERE rn = 1) s
    USING (slot)
),
vgain AS (
  SELECT slot, CASE
    WHEN n.new_primary NOT IN (o.old_primary, o.old_second)
      THEN n.new_primary
    WHEN n.new_second NOT IN (o.old_primary, o.old_second)
      THEN n.new_second
    ELSE -1 END AS gainer
  FROM vold o JOIN vnew n USING (slot)
)"""
  }

  /** The per-range corpus digests shared by q236/q238 (scan
    * representation, sixteenth ranges). */
  private lazy val vnodeCorpCtes: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""vmapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    $tok AS tok
  FROM licells
),
vcorp AS (
  SELECT tok // 72057594037927936 AS rng,
    CAST(COUNT(*) AS BIGINT) AS corpus_events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS corpus_digest
  FROM vmapped GROUP BY 1
)"""
  }

  /** q236: the vnode bulk load — every (node, range) holding off the
    * real received files must equal the relationally-derived replica
    * table joined with the corpus digests; RF=2 holders everywhere. */
  private lazy val q236Sql: String =
    s"""WITH $fixtures,
$vnodeWalkCtes,
$vnodeCorpCtes,
vreps AS (
  SELECT slot, old_primary AS node, TRUE AS is_primary FROM vold
  UNION ALL
  SELECT slot, old_second AS node, FALSE AS is_primary FROM vold
)
SELECT CAST(r.node AS BIGINT) AS node,
  CAST(r.slot AS BIGINT) AS token_range, r.is_primary,
  c.corpus_events AS events, c.corpus_digest AS digest,
  c.corpus_events, c.corpus_digest, TRUE AS verified,
  CAST(2 AS BIGINT) AS holders
FROM vreps r JOIN vcorp c ON c.rng = r.slot
ORDER BY node, token_range"""

  /** q237: the pending-ranges calculus at vnode granularity — the
    * engine's Scala walk vs this SQL derivation, hash-compared. */
  private lazy val q237Sql: String =
    s"""WITH $vnodeWalkCtes
SELECT CAST(v.slot AS BIGINT) AS token_range,
  CAST(o.old_primary AS BIGINT) AS old_primary,
  CAST(o.old_second AS BIGINT) AS old_second,
  CAST(n.new_primary AS BIGINT) AS new_primary,
  CAST(n.new_second AS BIGINT) AS new_second,
  CAST(g.gainer AS BIGINT) AS gainer
FROM vtok v JOIN vold o USING (slot) JOIN vnew n USING (slot)
  JOIN vgain g USING (slot)
ORDER BY token_range"""

  /** q238: the executed vnode decommission — retained + streamed-in
    * survivor views, each digest-equal to its range's corpus slice,
    * RF=2 holders restored on every range. */
  private lazy val q238Sql: String =
    s"""WITH $fixtures,
$vnodeWalkCtes,
$vnodeCorpCtes,
vviews AS (
  SELECT slot, old_primary AS node, 'retained' AS origin
  FROM vold WHERE old_primary <> ${graft.ops.VnodeRing.Leaving}
  UNION ALL
  SELECT slot, old_second AS node, 'retained' AS origin
  FROM vold WHERE old_second <> ${graft.ops.VnodeRing.Leaving}
  UNION ALL
  SELECT slot, gainer AS node, 'streamed-in' AS origin
  FROM vgain WHERE gainer <> -1
)
SELECT CAST(v.node AS BIGINT) AS node,
  CAST(v.slot AS BIGINT) AS token_range, v.origin,
  c.corpus_events AS events, c.corpus_digest AS digest,
  c.corpus_events, c.corpus_digest, TRUE AS verified,
  CAST(2 AS BIGINT) AS holders
FROM vviews v JOIN vcorp c ON c.rng = v.slot
ORDER BY node, token_range, origin"""

  /** q239: zero-copy (entire-sstable) streaming — the disposition rule
    * (a file links iff the transfer covers EVERY range its span
    * touches, per the 12-singles + 2-pairs slicing) re-derived in SQL,
    * joined with the per-range corpus digests; the engine's digests
    * come off the real received files (linked components + the
    * rewritten remainder). */
  private lazy val q239Sql: String = {
    val trans = graft.ops.ZeroCopyStream.TransferRanges.toSeq.sorted
      .map(r => s"($r)").mkString(", ")
    val all = (0 until graft.ops.ZeroCopyStream.Slots)
      .map(r => s"($r)").mkString(", ")
    s"""WITH $fixtures,
$vnodeCorpCtes,
ztrans AS (SELECT * FROM (VALUES $trans) t(rng)),
zfiles AS (
  SELECT r.rng, CASE WHEN r.rng <= 11 THEN r.rng
    WHEN r.rng <= 13 THEN 50 ELSE 51 END AS fid
  FROM (VALUES $all) r(rng)
),
zcover AS (
  SELECT fid, BOOL_AND(rng IN (SELECT rng FROM ztrans)) AS fully
  FROM zfiles GROUP BY fid
),
zdisp AS (
  SELECT f.rng,
    CASE WHEN c.fully THEN 'linked' ELSE 'rewritten' END AS origin
  FROM zfiles f JOIN zcover c USING (fid)
  WHERE f.rng IN (SELECT rng FROM ztrans)
)
SELECT CAST(d.rng AS BIGINT) AS token_range, d.origin,
  c.corpus_events AS events, c.corpus_digest AS digest,
  c.corpus_events, c.corpus_digest, TRUE AS verified
FROM zdisp d JOIN vcorp c ON c.rng = d.rng
ORDER BY token_range"""
  }

  /** The vnode BOOTSTRAP walk (round 17) — the range-SPLITTING half of
    * the calculus, derived relationally over 32 half-sixteenth ranges:
    * the 16 original tokens top the odd half-slots, the joiner's 4
    * tokens the even half-slots {4,12,20,28}; ownership = first
    * occupied slot clockwise, RF=2 = owner + next distinct owner, run
    * over BOTH token sets (before/after). */
  private lazy val vnodeBootCtes: String = {
    val k = graft.ops.VnodeBootstrap.Slots
    val oldToks = graft.ops.VnodeRing.Owners.zipWithIndex
      .map { case (n, s) => s"(${2 * s + 1}, $n)" }.mkString(", ")
    val joinToks = graft.ops.VnodeBootstrap.JoinerSlots.toSeq.sorted
      .map(sl => s"($sl, ${graft.ops.VnodeBootstrap.Joiner})")
      .mkString(", ")
    val halves = (0 until k).map(h => s"($h)").mkString(", ")
    def walk(tag: String, toks: String): String =
      s"""vb${tag}own AS (
  SELECT h.h, u.slot AS own_slot, u.node AS p,
    row_number() OVER (PARTITION BY h.h
      ORDER BY (u.slot - h.h + $k) % $k) AS rn
  FROM vbh h CROSS JOIN $toks u
),
vb${tag}p AS (SELECT h, own_slot, p FROM vb${tag}own WHERE rn = 1),
vb${tag}s AS (
  SELECT b.h, u.node AS s2,
    row_number() OVER (PARTITION BY b.h
      ORDER BY (u.slot - b.own_slot + $k) % $k) AS rn
  FROM vb${tag}p b JOIN $toks u
    ON u.node <> b.p AND u.slot <> b.own_slot
),
vb$tag AS (
  SELECT b.h, b.p AS primary_n, s.s2 AS second_n
  FROM vb${tag}p b
  JOIN (SELECT h, s2 FROM vb${tag}s WHERE rn = 1) s USING (h)
)"""
    s"""vbold AS (SELECT * FROM (VALUES $oldToks) t(slot, node)),
vball AS (SELECT * FROM vbold
  UNION ALL SELECT * FROM (VALUES $joinToks) j(slot, node)),
vbh AS (SELECT * FROM (VALUES $halves) t(h)),
${walk("b", "vbold")},
${walk("a", "vball")},
vbsplit AS (
  SELECT b.h, b.primary_n AS old_primary, b.second_n AS old_second,
    a.primary_n AS new_primary, a.second_n AS new_second,
    (a.primary_n = ${graft.ops.VnodeBootstrap.Joiner}
      OR a.second_n = ${graft.ops.VnodeBootstrap.Joiner}) AS joiner_gains,
    CASE WHEN a.primary_n = ${graft.ops.VnodeBootstrap.Joiner}
        OR a.second_n = ${graft.ops.VnodeBootstrap.Joiner}
      THEN b.primary_n ELSE -1 END AS stream_source,
    (CASE WHEN b.primary_n NOT IN (a.primary_n, a.second_n)
       THEN 1 ELSE 0 END
     + CASE WHEN b.second_n NOT IN (a.primary_n, a.second_n)
       THEN 1 ELSE 0 END) AS cleanup_debt
  FROM vbb b JOIN vba a USING (h)
)"""
  }

  /** q241: the vnode range-splitting calculus — the engine's Scala walk
    * over before/after token sets vs this SQL derivation. */
  private lazy val q241Sql: String =
    s"""WITH $vnodeBootCtes
SELECT CAST(h AS BIGINT) AS half_range,
  CAST(old_primary AS BIGINT) AS old_primary,
  CAST(old_second AS BIGINT) AS old_second,
  CAST(new_primary AS BIGINT) AS new_primary,
  CAST(new_second AS BIGINT) AS new_second,
  joiner_gains,
  CAST(stream_source AS BIGINT) AS stream_source,
  CAST(cleanup_debt AS BIGINT) AS cleanup_debt
FROM vbsplit ORDER BY half_range"""

  /** q242: the executed vnode bootstrap — the joiner's received views
    * per gained half-range, streamed from each range's pre-join
    * primary, digest-equal to the corpus slice. */
  private lazy val q242Sql: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
$vnodeBootCtes,
vbmapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    $tok AS tok
  FROM licells
),
vbcorp AS (
  SELECT tok // 36028797018963968 AS rng,
    CAST(COUNT(*) AS BIGINT) AS corpus_events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS corpus_digest
  FROM vbmapped GROUP BY 1
)
SELECT CAST(s.h AS BIGINT) AS half_range,
  CAST(s.stream_source AS BIGINT) AS stream_source,
  c.corpus_events AS events, c.corpus_digest AS digest,
  c.corpus_events, c.corpus_digest, TRUE AS verified
FROM vbsplit s JOIN vbcorp c ON c.rng = s.h
WHERE s.joiner_gains ORDER BY half_range"""
  }

  /** Shared tail for the zero-copy bootstrap pair (round 18): corpus
    * cells tokenized, occupied half-ranges, the pending request set and
    * the per-file coverage rule — every column re-derived relationally
    * (occupancy from the corpus, the request from the SQL ring walk),
    * independent of the engine's Summary.db sampling and Scala walk. */
  private def zeroCopyBootCtes(tokExpr: String): String =
    s"""vzmapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    $tokExpr AS tok
  FROM licells
),
vzcorp AS (
  SELECT tok // 36028797018963968 AS rng,
    CAST(COUNT(*) AS BIGINT) AS corpus_events,
    CAST(SUM(${zeroCopyEvHash} % 1000003) AS BIGINT) AS corpus_digest
  FROM vzmapped GROUP BY 1
),
vzocc AS (SELECT DISTINCT tok // 36028797018963968 AS h FROM vzmapped),
vzreqh AS (SELECT h, stream_source FROM vbsplit WHERE joiner_gains),
vzhold AS (
  SELECT DISTINCT h // 2 AS s, primary_n AS node FROM vbb
  UNION
  SELECT DISTINCT h // 2 AS s, second_n AS node FROM vbb
),
vzcover AS (
  SELECT hd.node, hd.s,
    CAST(COUNT(*) AS BIGINT) AS occupied_halves,
    CAST(COUNT(CASE WHEN rq.h IS NOT NULL THEN 1 END) AS BIGINT)
      AS requested_halves,
    CASE
      WHEN COUNT(CASE WHEN rq.h IS NOT NULL THEN 1 END) = 0
        THEN 'skipped'
      WHEN COUNT(CASE WHEN rq.h IS NULL THEN 1 END) = 0
        THEN 'linked'
      ELSE 'rewritten' END AS transport
  FROM vzhold hd
  JOIN vzocc o ON o.h // 2 = hd.s
  LEFT JOIN vzreqh rq ON rq.stream_source = hd.node AND rq.h = o.h
  GROUP BY hd.node, hd.s
)"""

  private lazy val zeroCopyEvHash: String =
    h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")

  /** q243: the zero-copy vnode bootstrap — per pending half-range, the
    * transport its bytes took under the per-file coverage rule, with
    * digests (transport-blind) equal to the corpus slice. */
  private lazy val q243Sql: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    s"""WITH $fixtures,
$vnodeBootCtes,
${zeroCopyBootCtes(tok)}
SELECT CAST(r.h AS BIGINT) AS half_range,
  CAST(r.stream_source AS BIGINT) AS stream_source,
  cv.transport,
  c.corpus_events AS events, c.corpus_digest AS digest,
  c.corpus_events, c.corpus_digest, TRUE AS verified
FROM vzreqh r
JOIN vzcover cv ON cv.node = r.stream_source AND cv.s = r.h // 2
JOIN vzcorp c ON c.rng = r.h
ORDER BY half_range"""
  }

  /** q244: the zero-copy coverage plan — one row per sliced source
    * file (node, owned sixteenth): occupied vs requested half-range
    * counts and the transport decision. */
  private lazy val q244Sql: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    s"""WITH $fixtures,
$vnodeBootCtes,
${zeroCopyBootCtes(tok)}
SELECT CAST(cv.node AS BIGINT) AS node,
  CAST(cv.s AS BIGINT) AS sixteenth,
  cv.occupied_halves, cv.requested_halves, cv.transport
FROM vzcover cv
ORDER BY node, sixteenth"""
  }

  /** q245 (round 19): the coverage-confirm audit — per sliced source
    * file, the SAMPLE-GRID occupancy (every MinIndexInterval-th
    * partition in key order, plus the header's first/last — the
    * Summary.db sampling rule replayed relationally) vs the full
    * occupancy, and whether the grid was complete. */
  private lazy val q245Sql: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    val interval =
      graft.sources.datadb.CassandraDataFixture.MinIndexInterval
    s"""WITH $fixtures,
$vnodeBootCtes,
${zeroCopyBootCtes(tok)},
vcparts AS (
  SELECT DISTINCT hd.node, hd.s, m.key,
    m.tok // 36028797018963968 AS h
  FROM vzhold hd
  JOIN vzmapped m ON m.tok // 36028797018963968 // 2 = hd.s
),
vcranked AS (
  SELECT node, s, h,
    ROW_NUMBER() OVER (PARTITION BY node, s ORDER BY key) - 1 AS rk,
    COUNT(*) OVER (PARTITION BY node, s) AS np
  FROM vcparts
)
SELECT CAST(node AS BIGINT) AS node, CAST(s AS BIGINT) AS sixteenth,
  CAST(COUNT(DISTINCT CASE WHEN rk % $interval = 0 OR rk = np - 1
    THEN h END) AS BIGINT) AS sampled_halves,
  CAST(COUNT(DISTINCT h) AS BIGINT) AS occupied_halves,
  COUNT(DISTINCT CASE WHEN rk % $interval = 0 OR rk = np - 1 THEN h END)
    = COUNT(DISTINCT h) AS grid_complete
FROM vcranked
GROUP BY node, s
ORDER BY node, sixteenth"""
  }

  /** q246 (round 19): index-summary redistribution — per downsampling
    * level, the resident-entry arithmetic (a file's summary holds
    * ceil(partitions/MinIndexInterval) entries; level k keeps every
    * 2^k-th) and the LEVEL-INVARIANT present-probe checksums (the
    * point-read path may scan a wider index window, never return a
    * different answer). */
  private lazy val q246Sql: String = {
    val interval =
      graft.sources.datadb.CassandraDataFixture.MinIndexInterval
    s"""WITH $fixtures,
sgp AS (
  SELECT sstable_id, COUNT(DISTINCT key) AS np FROM licells GROUP BY 1
),
sge AS (SELECT sstable_id, (np + $interval - 1) // $interval AS entries
  FROM sgp),
slv AS (SELECT * FROM (VALUES (0, 1), (1, 2), (2, 4)) t(lvl, step)),
sent AS (
  SELECT l.lvl, l.step,
    CAST(SUM(e.entries) AS BIGINT) AS entries_before,
    CAST(SUM((e.entries + l.step - 1) // l.step) AS BIGINT)
      AS entries_after
  FROM slv l CROSS JOIN sge e GROUP BY l.lvl, l.step
),
sprobe AS (
  SELECT
    CAST(COUNT(DISTINCT key) AS BIGINT) AS probed,
    CAST(COUNT(*) AS BIGINT) AS events,
    CAST(SUM(CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END)
      AS BIGINT) AS value_sum,
    CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum
  FROM licells WHERE key % 7 = 0 AND key > 0
),
sfound AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS found_sstables FROM (
    SELECT DISTINCT key, sstable_id FROM licells
    WHERE key % 7 = 0 AND key > 0) t
)
SELECT CAST(e.lvl AS BIGINT) AS level,
  CAST(128 // e.step AS BIGINT) AS sampling_level,
  e.entries_before, e.entries_after,
  p.probed, f.found_sstables, p.events, p.value_sum, p.ts_sum
FROM sent e CROSS JOIN sprobe p CROSS JOIN sfound f
ORDER BY level"""
  }

  /** q247 (round 19): DSIR importance-resampled data selection — the
    * hashed-unigram bucket model (portable h60 % B), the add-1-smoothed
    * floor-log2 LLR per bucket (bit lengths, so both engines stay in
    * exact integers) and the deterministic top-K of the non-target
    * pool by summed log importance weight. */
  private lazy val q247Sql: String = {
    val b = graft.ops.DataSelection.Buckets
    val k = graft.ops.DataSelection.TopK
    val lang = graft.ops.DataSelection.TargetLang
    s"""WITH toks AS (
  SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS w
  FROM documents),
tb AS (
  SELECT doc_id, lang, source,
    CAST(${h60("w")} % $b AS BIGINT) AS b
  FROM toks),
bc AS (
  SELECT b,
    CAST(SUM(CASE WHEN lang = '$lang' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
    CAST(SUM(CASE WHEN lang <> '$lang' THEN 1 ELSE 0 END) AS BIGINT) AS cs
  FROM tb GROUP BY 1),
tot AS (
  SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cs) AS BIGINT) AS ts
  FROM bc),
llr AS (
  SELECT b,
    CAST(length(bin(ct + 1)) - length(bin(cs + 1))
       + length(bin(ts + $b)) - length(bin(tt + $b)) AS BIGINT) AS llr
  FROM bc CROSS JOIN tot)
SELECT doc_id, lang, source,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(llr) AS BIGINT) AS weight
FROM tb JOIN llr USING (b)
WHERE lang <> '$lang'
GROUP BY 1, 2, 3
ORDER BY weight DESC, doc_id
LIMIT $k"""
  }

  /** q217: nodetool decommission (round 16) — the ring-shrink
    * arithmetic replayed: node 3 leaves, node 2's primary range
    * extends over quarters {2, 3}, the successor rule hands quarter 2
    * to node 0 and quarter 3 to node 2 (both streamed from the leaving
    * node), node 1 untouched; every surviving view's events + digest
    * equal the corpus's for its quarter (engine-computed off the real
    * retained + streamed files) and every quarter keeps RF=2 holders. */
  private lazy val q217Sql: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
dmapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    $tok AS tok
  FROM licells
),
dcorp AS (
  SELECT tok // 288230376151711744 AS quarter,
    CAST(COUNT(*) AS BIGINT) AS corpus_events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS corpus_digest
  FROM dmapped GROUP BY 1
),
dviews AS (
  SELECT * FROM (VALUES
    (0, 0, 'retained'), (0, 3, 'retained'), (0, 2, 'streamed-in'),
    (1, 0, 'retained'), (1, 1, 'retained'),
    (2, 1, 'retained'), (2, 2, 'retained'), (2, 3, 'streamed-in'))
    t(node, quarter, origin)
)
SELECT CAST(v.node AS BIGINT) AS node,
  CAST(v.quarter AS BIGINT) AS quarter, v.origin,
  c.corpus_events AS events, c.corpus_digest AS digest,
  c.corpus_events, c.corpus_digest,
  TRUE AS verified, CAST(2 AS BIGINT) AS holders
FROM dviews v JOIN dcorp c ON c.quarter = v.quarter
ORDER BY node, quarter"""
  }

  /** q218: nodetool removenode (round 16) — the dead-node shrink
    * replayed: node 3 is unreachable, so the surviving replica of each
    * of its ranges streams the re-replication (quarter 2: node 2 →
    * node 0; quarter 3: node 0 → node 2); the converged holdings are
    * q217's, but every streamed view's source is a SURVIVOR — the
    * engine computes the same digests off the real survivor-sourced
    * streams, so a read of the dead node's file would break them. */
  private lazy val q218Sql: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
rmapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    $tok AS tok
  FROM licells
),
rcorp AS (
  SELECT tok // 288230376151711744 AS quarter,
    CAST(COUNT(*) AS BIGINT) AS corpus_events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS corpus_digest
  FROM rmapped GROUP BY 1
),
rviews AS (
  SELECT * FROM (VALUES
    (0, 0, 'retained', 0), (0, 3, 'retained', 0),
    (0, 2, 'streamed-in', 2),
    (1, 0, 'retained', 1), (1, 1, 'retained', 1),
    (2, 1, 'retained', 2), (2, 2, 'retained', 2),
    (2, 3, 'streamed-in', 0))
    t(node, quarter, origin, src_node)
)
SELECT CAST(v.node AS BIGINT) AS node,
  CAST(v.quarter AS BIGINT) AS quarter, v.origin,
  CAST(v.src_node AS BIGINT) AS src_node,
  c.corpus_events AS events, c.corpus_digest AS digest,
  c.corpus_events, c.corpus_digest,
  TRUE AS verified, CAST(2 AS BIGINT) AS holders
FROM rviews v JOIN rcorp c ON c.quarter = v.quarter
ORDER BY node, quarter"""
  }

  /** q219: nodetool move (round 16) — the token-shift arithmetic
    * replayed: node 1 moves one eighth clockwise; primary spans become
    * 0:{0,1,2} 1:{3,4} 2:{5} 3:{6,7}; under RF=2 successor replication
    * node 0 gains eighth 2 (streamed) and node 1 gains eighth 4
    * (streamed), while nodes 2 and 3 drop one eighth each (cleaned
    * local rewrites); every post-move view digest-equals the corpus
    * for its eighth and every eighth keeps exactly 2 holders. */
  private lazy val q219Sql: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
mmapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    $tok AS tok
  FROM licells
),
mcorp AS (
  SELECT tok // 144115188075855872 AS eighth,
    CAST(COUNT(*) AS BIGINT) AS corpus_events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS corpus_digest
  FROM mmapped GROUP BY 1
),
mviews AS (
  SELECT * FROM (VALUES
    (0, 0, 'retained'), (0, 1, 'retained'), (0, 6, 'retained'),
    (0, 7, 'retained'), (0, 2, 'streamed-in'),
    (1, 0, 'retained'), (1, 1, 'retained'), (1, 2, 'retained'),
    (1, 3, 'retained'), (1, 4, 'streamed-in'),
    (2, 3, 'cleaned'), (2, 4, 'cleaned'), (2, 5, 'cleaned'),
    (3, 5, 'cleaned'), (3, 6, 'cleaned'), (3, 7, 'cleaned'))
    t(node, eighth, origin)
)
SELECT CAST(v.node AS BIGINT) AS node,
  CAST(v.eighth AS BIGINT) AS eighth, v.origin,
  c.corpus_events AS events, c.corpus_digest AS digest,
  c.corpus_events, c.corpus_digest,
  TRUE AS verified, CAST(2 AS BIGINT) AS holders
FROM mviews v JOIN mcorp c ON c.eighth = v.eighth
ORDER BY node, eighth"""
  }

  /** q220: stream-stream inner join (round 16) — the join-state
    * trajectory replayed: every event_id appears once per side, so
    * each id joins at most once; the emitted set is exactly hours
    * [0, 2)'s even ids (matched in-batch, 30 min lag) plus ids ≡ 1 (mod
    * 4) (matched against live state, 90-minute lag); the ids ≡ 3 (mod
    * 4) arrive with the same 90-minute lag AFTER the watermark evicted
    * the left state and contribute nothing — the engine's lag_min_sum
    * proves which arrival joined each id. */
  private lazy val q220Sql: String = {
    val anchor = graft.streaming.StreamingStats.WatermarkAnchorUs
    s"""WITH sj AS (
  SELECT event_type, event_id,
    CASE WHEN event_id % 2 = 0 THEN 30 ELSE 90 END AS lag_min
  FROM events
  WHERE (epoch_us(ts) - $anchor) // 3600000000 BETWEEN 0 AND 1
    AND (event_id % 2 = 0 OR event_id % 4 = 1)
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(event_id % 1000003) AS BIGINT) AS id_sum,
  CAST(SUM(lag_min) AS BIGINT) AS lag_min_sum
FROM sj GROUP BY 1 ORDER BY 1"""
  }

  /** q221/q223: commitlog recovery (round 16) — the WAL's mutations
    * are the licells corpus verbatim (logging is lossless for every
    * serialized field), so replay reduces to: apply the scan
    * representation mapping (the flush writes what a scan renders),
    * LWW-rank per (key, clustering, column_name) on the memtable
    * reconcile order — timestamp, then the value-size/flag tiebreaks;
    * there is NO sstable tiebreak because a memtable has no files —
    * keep rank-1 winners WITHOUT any purge (recovery never drops
    * tombstones), shard by the volume-adaptive rule over the STATE's
    * modeled bytes, and roll up the read-back checksums. The PITR
    * variant (q223) bounds the log at the restore point BEFORE
    * reconciliation. */
  private def commitlogReplaySql(boundUs: Option[Long]): String = {
    val boundFilter =
      boundUs.map(t => s"WHERE timestamp_us <= $t").getOrElse("")
    s"""WITH $fixtures,
logged AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
  $boundFilter
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, size_bytes DESC, is_tombstone DESC,
             local_deletion_time_s DESC, ttl_s DESC, is_expiring DESC,
             kind DESC) AS rn
  FROM logged
),
winners AS (SELECT * FROM ranked WHERE rn = 1),
vol AS (
  SELECT LEAST(4096, GREATEST(1,
    CAST(CEIL(SUM(32 + size_bytes) / 1048576.0) AS BIGINT))) AS n
  FROM winners
)
SELECT 'sst-' || CAST(key % (SELECT n FROM vol) AS VARCHAR) AS sstable_id,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(ttl_s % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(size_bytes % 1000003) AS BIGINT) AS value_sum
FROM winners GROUP BY 1 ORDER BY 1"""
  }

  /** q222: the per-segment commitlog report (round 16) — the append
    * order is the full-field total order (ties are byte-identical
    * entries, interchangeable across engines), the exclusive running
    * sum of entry lengths gives each entry's byte start, and the
    * div-rule cuts derive segment and section; file bytes are header
    * (18) + 8 per marker (sections + the final stop) + entry bytes. */
  private lazy val q222Sql: String = {
    val segB = graft.sources.commitlog.CommitLogFormat.SegmentBytes
    val secB = graft.sources.commitlog.CommitLogFormat.SectionBytes
    val feb = graft.sources.commitlog.CommitLogFormat.FixedEntryBytes
    s"""WITH $fixtures,
sized AS (
  SELECT *, $feb + length(column_name) + length(kind) AS entry_len
  FROM licells
),
cums AS (
  SELECT *, COALESCE(SUM(entry_len) OVER (
    ORDER BY timestamp_us, key, clustering, column_name, kind, ttl_s,
             local_deletion_time_s, is_tombstone, is_expiring, size_bytes
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM sized
),
segd AS (
  SELECT *, cum // $segB AS segment,
    (cum - MIN(cum) OVER (PARTITION BY cum // $segB)) // $secB AS section
  FROM cums
)
SELECT CAST(segment AS BIGINT) AS segment,
  CAST(COUNT(*) AS BIGINT) AS entries,
  CAST(COUNT(DISTINCT section) AS BIGINT) AS sections,
  CAST(SUM(entry_len) AS BIGINT) AS entry_bytes,
  CAST(18 + 8 * (COUNT(DISTINCT section) + 1) + SUM(entry_len) AS BIGINT)
    AS file_bytes,
  CAST(MIN(timestamp_us) AS BIGINT) AS first_ts_us,
  CAST(MAX(timestamp_us) AS BIGINT) AS last_ts_us,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT)
    AS tombstones,
  TRUE AS crc_verified
FROM segd GROUP BY 1 ORDER BY 1"""
  }

  /** q224: CDC exactly-once resume (round 16) — the div-rule replay
    * assigns each mutation its segment; run 1 is segments `[0, K)`
    * with K = ceil(n/2), run 2 the rest. The engine's two physically
    * separate sink dirs (one per consumer lifetime, offsets resumed
    * from the shared checkpoint) must roll up to exactly this split —
    * a re-delivered segment inflates run 2, a lost one deflates it. */
  private lazy val q224Sql: String = {
    val segB = graft.sources.commitlog.CommitLogFormat.SegmentBytes
    val feb = graft.sources.commitlog.CommitLogFormat.FixedEntryBytes
    s"""WITH $fixtures,
sized AS (
  SELECT *, $feb + length(column_name) + length(kind) AS entry_len
  FROM licells
),
cums AS (
  SELECT *, COALESCE(SUM(entry_len) OVER (
    ORDER BY timestamp_us, key, clustering, column_name, kind, ttl_s,
             local_deletion_time_s, is_tombstone, is_expiring, size_bytes
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM sized
),
segd AS (SELECT *, cum // $segB AS segment FROM cums),
runs AS (
  SELECT *, CASE WHEN segment <
      (SELECT (COUNT(DISTINCT segment) + 1) // 2 FROM segd)
    THEN 1 ELSE 2 END AS run
  FROM segd
)
SELECT CAST(run AS BIGINT) AS run,
  CAST(COUNT(DISTINCT segment) AS BIGINT) AS segments,
  CAST(MIN(segment) AS BIGINT) AS first_segment,
  CAST(MAX(segment) AS BIGINT) AS last_segment,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT)
    AS tombstones
FROM runs GROUP BY 1 ORDER BY 1"""
  }

  /** q225: hinted handoff (round 16) — the target (node 3) holds
    * quarters {2, 3}; writes in the outage window land as hints at
    * each quarter's surviving replica (q2 → node 2, q3 → node 0) and
    * replay on recovery. The engine reads REAL files for both halves
    * (the gapped sstable and the replayed hint flushes), so each
    * (quarter, origin) view must digest-equal the corpus split, and
    * the per-quarter origin sums must reassemble the full corpus. */
  private lazy val q225Sql: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    val t1 = graft.ops.Hints.OutageStartUs
    val t2 = graft.ops.Hints.OutageEndUs
    s"""WITH $fixtures,
hmapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    $tok AS tok
  FROM licells
),
held AS (
  SELECT *, tok // 288230376151711744 AS quarter,
    CASE WHEN timestamp_us >= $t1 AND timestamp_us < $t2
      THEN 'hinted' ELSE 'retained' END AS origin
  FROM hmapped
  WHERE tok // 288230376151711744 IN (2, 3)
),
splits AS (
  SELECT quarter, origin, CAST(COUNT(*) AS BIGINT) AS corpus_events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS corpus_digest
  FROM held GROUP BY 1, 2
),
totals AS (
  SELECT quarter, CAST(COUNT(*) AS BIGINT) AS quarter_events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS quarter_digest
  FROM held GROUP BY 1
),
coords AS (
  SELECT * FROM (VALUES
    (2, 'retained', 3), (2, 'hinted', 2),
    (3, 'retained', 3), (3, 'hinted', 0))
    t(quarter, origin, coordinator)
)
SELECT CAST(s.quarter AS BIGINT) AS quarter, s.origin,
  CAST(c.coordinator AS BIGINT) AS coordinator,
  s.corpus_events AS events, s.corpus_digest AS digest,
  s.corpus_events, s.corpus_digest, TRUE AS verified,
  t.quarter_events, t.quarter_digest, TRUE AS converged
FROM splits s
JOIN coords c ON c.quarter = s.quarter AND c.origin = s.origin
JOIN totals t ON t.quarter = s.quarter
ORDER BY 1, 2"""
  }

  /** q226: nodetool rebuild (round 16) — DC2 joins at NTS RF=1 (node
    * 0 owns quarters {0,1}, node 1 owns {2,3}); each quarter streams
    * from its DC1 primary. The engine computes each view's digest off
    * the REAL received file, so a wrong source filter or a mis-owned
    * quarter breaks the hash; dc2_holders = 1 pins per-DC RF. */
  private lazy val q226Sql: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
bmapped AS (
  SELECT key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    $tok AS tok
  FROM licells
),
bcorp AS (
  SELECT tok // 288230376151711744 AS quarter,
    CAST(COUNT(*) AS BIGINT) AS corpus_events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS corpus_digest
  FROM bmapped GROUP BY 1
),
bviews AS (
  SELECT * FROM (VALUES
    (0, 0, 0), (0, 1, 1), (1, 2, 2), (1, 3, 3))
    t(node, quarter, src_node)
)
SELECT CAST(v.node AS BIGINT) AS node,
  CAST(v.quarter AS BIGINT) AS quarter,
  CAST(v.src_node AS BIGINT) AS src_node,
  c.corpus_events AS events, c.corpus_digest AS digest,
  c.corpus_events, c.corpus_digest,
  TRUE AS verified, CAST(1 AS BIGINT) AS dc2_holders
FROM bviews v JOIN bcorp c ON c.quarter = v.quarter
ORDER BY node, quarter"""
  }

  /** q227: blocking read repair (round 16) — replica B misses every
    * event at/after the stale point, the workload reads `key % 3 = 0`;
    * a partition is digest-stale iff it has any stale event (the count
    * alone differs), the diff patch carries exactly the read cohort's
    * stale events, and only the read cohort converges. */
  private lazy val q227Sql: String = {
    val t = graft.ops.ReadRepair.StaleFromUs
    val m = graft.ops.ReadRepair.ReadMod
    s"""WITH $fixtures,
rrmapped AS (
  SELECT key, timestamp_us FROM licells
),
perkey AS (
  SELECT key,
    CASE WHEN key % $m = 0 THEN 'read' ELSE 'unread' END AS cohort,
    CAST(SUM(CASE WHEN timestamp_us >= $t THEN 1 ELSE 0 END) AS BIGINT)
      AS stale_events
  FROM rrmapped GROUP BY 1, 2
)
SELECT cohort,
  CAST(COUNT(*) AS BIGINT) AS partitions,
  CAST(SUM(CASE WHEN stale_events > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS stale_partitions,
  CAST(CASE WHEN cohort = 'read' THEN SUM(stale_events)
    ELSE 0 END AS BIGINT) AS patched_events,
  CAST(CASE WHEN cohort = 'read'
    THEN SUM(CASE WHEN stale_events > 0 THEN 1 ELSE 0 END)
    ELSE 0 END AS BIGINT) AS repaired_partitions,
  CAST(CASE WHEN cohort = 'read' THEN 0
    ELSE SUM(CASE WHEN stale_events > 0 THEN 1 ELSE 0 END)
    END AS BIGINT) AS diverged_after,
  TRUE AS contract_held
FROM perkey GROUP BY 1 ORDER BY 1"""
  }

  /** q228: the batchlog (round 16) — the batched window's events by
    * `key % 8`; batches `id % 3 == 0` completed (fully applied, log
    * gone), the rest applied only their `clustering = 0` prefix and
    * keep a full log file. Replay re-applies full batches; the LWW
    * reconciliation of (partial ∪ replay) equals the full batch's —
    * the engine computes it off real files, the oracle replays it. */
  private lazy val q228Sql: String = {
    val t = graft.ops.Batchlog.BatchedFromUs
    val n = graft.ops.Batchlog.Batches
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
blm AS (
  SELECT key % $n AS batch_id, key, clustering, column_name, kind,
    timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells WHERE timestamp_us >= $t
),
stats AS (
  SELECT batch_id, CAST(COUNT(*) AS BIGINT) AS mutations,
    CAST(SUM(CASE WHEN batch_id % 3 = 0 OR clustering = 0
      THEN 1 ELSE 0 END) AS BIGINT) AS applied_before,
    CAST(CASE WHEN batch_id % 3 = 0 THEN 0 ELSE COUNT(*) END AS BIGINT)
      AS replayed
  FROM blm GROUP BY 1
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, size_bytes DESC, is_tombstone DESC,
             local_deletion_time_s DESC, ttl_s DESC, is_expiring DESC,
             kind DESC) AS rn
  FROM blm
),
state AS (
  SELECT batch_id, CAST(COUNT(*) AS BIGINT) AS state_events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS state_digest
  FROM ranked WHERE rn = 1 GROUP BY 1
)
SELECT s.batch_id AS batch_id, s.mutations, s.applied_before,
  s.replayed, (s.batch_id % 3 <> 0) AS logged,
  t.state_events, t.state_digest, TRUE AS atomic
FROM stats s JOIN state t ON t.batch_id = s.batch_id
ORDER BY 1"""
  }

  /** q229: Merkle descent (round 16) — node digests are additive
    * rollups of the 64 leaf digests; replica B lacks leaf 42's events
    * at/after the stale point, so exactly the root, the divergent
    * leaf's ancestor chain and those ancestors' siblings are visited:
    * a node (level, idx) is enqueued iff its parent (level−1, idx//2)
    * is leaf 42's ancestor (idx//2 = 42 >> (7−level)). */
  private lazy val q229Sql: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    val t = graft.ops.MerkleRepair.StaleFromUs
    val dl = graft.ops.MerkleRepair.DivergentLeaf
    s"""WITH $fixtures,
mkm AS (
  SELECT $tok >> 54 AS leaf, timestamp_us,
    ($evHash % 1000003) AS eh
  FROM (
    SELECT key, clustering, column_name, kind, timestamp_us,
      CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
      local_deletion_time_s,
      CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
    FROM licells
  )
),
mleaves AS (
  SELECT leaf,
    CAST(SUM(eh) AS BIGINT) AS a_digest,
    CAST(SUM(CASE WHEN leaf = $dl AND timestamp_us >= $t
      THEN 0 ELSE eh END) AS BIGINT) AS b_digest
  FROM mkm GROUP BY 1
),
mnodes AS (
  SELECT l.gl AS level, i.gi AS node_idx
  FROM generate_series(0, 6) l(gl), generate_series(0, 63) i(gi)
  WHERE i.gi < (1 << l.gl)
),
magg AS (
  SELECT n.level, n.node_idx,
    CAST(1 << (6 - n.level) AS BIGINT) AS span_leaves,
    CAST(COALESCE(SUM(lv.a_digest), 0) AS BIGINT) AS a_digest,
    CAST(COALESCE(SUM(lv.b_digest), 0) AS BIGINT) AS b_digest
  FROM mnodes n LEFT JOIN mleaves lv
    ON lv.leaf >= n.node_idx * (1 << (6 - n.level))
   AND lv.leaf < (n.node_idx + 1) * (1 << (6 - n.level))
  GROUP BY 1, 2
),
mvisited AS (
  SELECT * FROM magg
  WHERE level = 0
     OR node_idx // 2 = ($dl >> (7 - level))
)
SELECT CAST(level AS BIGINT) AS level,
  CAST(node_idx AS BIGINT) AS node_idx,
  span_leaves, a_digest, b_digest,
  (a_digest = b_digest) AS matched,
  CASE WHEN a_digest = b_digest THEN 'verified-stop'
       WHEN level < 6 THEN 'descend' ELSE 'stream' END AS action
FROM mvisited ORDER BY 1, 2"""
  }

  /** q230: materialized view (round 16) — the view's rows are the
    * base's live cells re-keyed by value length; the probed values'
    * pre/delta split, base-key cardinality and unpacked-PK digests are
    * all recomputable from the base relation. */
  private lazy val q230Sql: String = {
    val t = graft.ops.MaterializedView.UpdateFromUs
    val vs = graft.ops.MaterializedView.QueryValues.mkString(", ")
    val digest = h60("CAST(base_key AS VARCHAR) || ':' || " +
      "CAST(base_clustering AS VARCHAR) || ':' || " +
      "CAST(base_col AS VARCHAR) || ':' || " +
      "CAST(timestamp_us AS VARCHAR)")
    s"""WITH $fixtures,
mvq AS (
  SELECT size_bytes % 61 AS value, key AS base_key,
    clustering AS base_clustering,
    CASE WHEN column_name = 'c1' THEN 1 ELSE 0 END AS base_col,
    timestamp_us
  FROM licells
  WHERE kind = 'CELL' AND NOT is_tombstone
    AND size_bytes % 61 IN ($vs)
)
SELECT CAST(value AS BIGINT) AS value,
  CAST(SUM(CASE WHEN timestamp_us < $t THEN 1 ELSE 0 END) AS BIGINT)
    AS pre_rows,
  CAST(SUM(CASE WHEN timestamp_us >= $t THEN 1 ELSE 0 END) AS BIGINT)
    AS delta_rows,
  CAST(COUNT(*) AS BIGINT) AS total_rows,
  CAST(COUNT(DISTINCT base_key) AS BIGINT) AS base_keys,
  CAST(SUM(base_key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM($digest % 1000003) AS BIGINT) AS digest
FROM mvq GROUP BY 1 ORDER BY 1"""
  }

  /** q231: snapshot + restore (round 16) — the snapshot state is the
    * original per-sstable relation verbatim; the compacted state is
    * q162's winners under the volume-adaptive shard rule. Both roll up
    * with the same event checksum the restored/live scans produce. */
  private lazy val q231Sql: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
snmapped AS (
  SELECT sstable_id, key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
snap AS (
  SELECT 'snapshot' AS state, sstable_id,
    CAST(COUNT(*) AS BIGINT) AS events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS digest
  FROM snmapped GROUP BY 2
),
snvol AS (
  SELECT LEAST(4096, GREATEST(1,
    CAST(CEIL(SUM(32 + size_bytes) / 1048576.0) AS BIGINT))) AS n
  FROM snmapped
),
snranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, sstable_id DESC, size_bytes DESC,
             is_tombstone DESC, local_deletion_time_s DESC,
             ttl_s DESC, is_expiring DESC, kind DESC) AS rn
  FROM snmapped
),
snwinners AS (
  SELECT * FROM snranked
  WHERE rn = 1 AND NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
),
sncomp AS (
  SELECT 'compacted' AS state,
    'sst-' || CAST(key % (SELECT n FROM snvol) AS VARCHAR) AS sstable_id,
    CAST(COUNT(*) AS BIGINT) AS events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS digest
  FROM snwinners GROUP BY 2
)
SELECT * FROM snap UNION ALL SELECT * FROM sncomp
ORDER BY state, sstable_id"""
  }

  /** q232: CAS registers (round 16) — the sequential chain replayed
    * with a RECURSIVE CTE: one iteration per op index, every key
    * advancing in parallel; applied iff the op's expected value equals
    * the register the previous applied op left. Ties beyond
    * (ts, expected, newval) are identical ops, so the walk is
    * order-insensitive exactly where the engine's sort is. */
  private lazy val q232Sql: String = {
    val opHash = h60("CAST(o.key AS VARCHAR) || ':' || " +
      "CAST(o.expected AS VARCHAR) || ':' || CAST(o.newval AS VARCHAR) " +
      "|| ':' || CAST(o.timestamp_us AS VARCHAR)")
    val finHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(reg AS VARCHAR)")
    val b = graft.ops.CasRegister.Buckets
    s"""WITH RECURSIVE $fixtures,
cops AS (
  SELECT key,
    row_number() OVER (PARTITION BY key
      ORDER BY timestamp_us, expected, newval) AS rn,
    expected, newval, timestamp_us
  FROM (
    SELECT key, clustering AS expected,
      (CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END) % 3
        AS newval,
      timestamp_us
    FROM licells
  )
),
ccnt AS (SELECT key, MAX(rn) AS n FROM cops GROUP BY 1),
cwalk AS (
  SELECT key, 0 AS rn, CAST(0 AS BIGINT) AS reg,
    CAST(0 AS BIGINT) AS applied, CAST(0 AS BIGINT) AS adig
  FROM ccnt
  UNION ALL
  SELECT w.key, w.rn + 1,
    CASE WHEN o.expected = w.reg THEN o.newval ELSE w.reg END,
    w.applied + CASE WHEN o.expected = w.reg THEN 1 ELSE 0 END,
    w.adig + CASE WHEN o.expected = w.reg
      THEN ($opHash % 1000003) ELSE 0 END
  FROM cwalk w JOIN cops o ON o.key = w.key AND o.rn = w.rn + 1
),
cfin AS (
  SELECT w.key, w.reg, w.applied, w.adig, c.n
  FROM cwalk w JOIN ccnt c ON c.key = w.key AND w.rn = c.n
)
SELECT CAST(key % $b AS BIGINT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS registers,
  CAST(SUM(n) AS BIGINT) AS ops,
  CAST(SUM(applied) AS BIGINT) AS applied,
  CAST(SUM(n - applied) AS BIGINT) AS rejected,
  CAST(SUM(reg) AS BIGINT) AS final_sum,
  CAST(SUM(adig) AS BIGINT) AS applied_digest,
  CAST(SUM($finHash % 1000003) AS BIGINT) AS final_digest
FROM cfin GROUP BY 1 ORDER BY 1"""
  }

  /** q233: deterministic epoch shuffling (round 16) — the identical
    * hash arithmetic: batch = h60('shuffle:<e>:<id>') mod B, position
    * by (hash, id) within (epoch, batch), the order-weighted digest
    * pinning the exact visiting sequence. */
  private lazy val q233Sql: String = {
    val b = graft.ops.Mixing.ShuffleBatches
    val h = h60("'shuffle:' || CAST(epoch AS VARCHAR) || ':' || " +
      "CAST(doc_id AS VARCHAR)")
    s"""WITH sdocs AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count
  FROM documents
),
placed AS (
  SELECT e.epoch, d.doc_id, d.token_count,
    ($h) % $b AS batch, ($h) AS h
  FROM sdocs d, (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT)))
    e(epoch)
),
ordered AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY epoch, batch
    ORDER BY h, doc_id) AS BIGINT) AS pos
  FROM placed
)
SELECT CAST(epoch AS BIGINT) AS epoch, CAST(batch AS BIGINT) AS batch,
  CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(token_count) AS BIGINT) AS tokens,
  CAST(SUM(doc_id % 1000003) AS BIGINT) AS ids_digest,
  CAST(SUM(pos * (doc_id % 1000003)) AS BIGINT) AS order_digest
FROM ordered GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** q234: distributed counters (round 16) — the same shard algebra:
    * read-before-write running sums per (cell, node), per-sstable
    * shards at the latest clock, the max-(clock, count) merge winner,
    * and per-bucket rollups with the exactness invariant. */
  private lazy val q234Sql: String = {
    val n = graft.ops.Counters.Nodes
    val b = graft.ops.Counters.Buckets
    s"""WITH $fixtures,
cinc AS (
  SELECT key, clustering, column_name, sstable_id, timestamp_us,
    (key + clustering) % $n AS node, size_bytes AS delta
  FROM licells WHERE kind = 'CELL' AND NOT is_tombstone
),
crun AS (
  SELECT *, SUM(delta) OVER (
    PARTITION BY key, clustering, column_name, node
    ORDER BY timestamp_us, delta, sstable_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM cinc
),
cshards AS (
  SELECT key, clustering, column_name, node, sstable_id,
    timestamp_us AS clock, run AS count
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY key, clustering, column_name, node, sstable_id
      ORDER BY timestamp_us DESC, run DESC, sstable_id DESC) AS rn
    FROM crun
  ) WHERE rn = 1
),
cwinners AS (
  SELECT key, clustering, column_name, node, clock, count
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY key, clustering, column_name, node
      ORDER BY clock DESC, count DESC) AS rn
    FROM cshards
  ) WHERE rn = 1
),
cpercell AS (
  SELECT key, clustering, column_name,
    CAST(SUM(count) AS BIGINT) AS merged,
    CAST(SUM(clock % 1000003) AS BIGINT) AS clock_digest,
    CAST(COUNT(*) AS BIGINT) AS nodes
  FROM cwinners GROUP BY 1, 2, 3
),
cshardcounts AS (
  SELECT key, clustering, column_name,
    CAST(COUNT(*) AS BIGINT) AS shard_rows
  FROM cshards GROUP BY 1, 2, 3
),
cdeltas AS (
  SELECT key, clustering, column_name,
    CAST(SUM(delta) AS BIGINT) AS delta_total
  FROM cinc GROUP BY 1, 2, 3
)
SELECT CAST(p.key % $b AS BIGINT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS cells,
  CAST(SUM(s.shard_rows) AS BIGINT) AS shard_rows,
  CAST(SUM(p.nodes) AS BIGINT) AS node_shards,
  CAST(SUM(p.merged) AS BIGINT) AS merged_total,
  CAST(SUM(d.delta_total) AS BIGINT) AS delta_total,
  CAST(SUM(p.clock_digest) AS BIGINT) AS clock_digest,
  TRUE AS exact
FROM cpercell p
JOIN cshardcounts s USING (key, clustering, column_name)
JOIN cdeltas d USING (key, clustering, column_name)
GROUP BY 1 ORDER BY 1"""
  }

  /** q235: incremental backups (round 16) — the snapshot tier is the
    * verbatim per-sstable base relation; the backup tier is q221's
    * recovery state (LWW winners, NO purge) under the volume-adaptive
    * shard rule — the flush-time links hold exactly the post-snapshot
    * write activity. */
  private lazy val q235Sql: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
ibmapped AS (
  SELECT sstable_id, key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
ibsnap AS (
  SELECT 'snapshot' AS tier, sstable_id,
    CAST(COUNT(*) AS BIGINT) AS events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS digest
  FROM ibmapped GROUP BY 2
),
ibranked AS (
  SELECT *, row_number() OVER (PARTITION BY key, clustering, column_name
    ORDER BY timestamp_us DESC, size_bytes DESC, is_tombstone DESC,
             local_deletion_time_s DESC, ttl_s DESC, is_expiring DESC,
             kind DESC) AS rn
  FROM ibmapped
),
ibwinners AS (SELECT * FROM ibranked WHERE rn = 1),
ibvol AS (
  SELECT LEAST(4096, GREATEST(1,
    CAST(CEIL(SUM(32 + size_bytes) / 1048576.0) AS BIGINT))) AS n
  FROM ibwinners
),
ibback AS (
  SELECT 'backup' AS tier,
    'sst-' || CAST(key % (SELECT n FROM ibvol) AS VARCHAR) AS sstable_id,
    CAST(COUNT(*) AS BIGINT) AS events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS digest
  FROM ibwinners GROUP BY 2
)
SELECT * FROM ibback UNION ALL SELECT * FROM ibsnap
ORDER BY tier, sstable_id"""
  }

  /** q216: nodetool garbagecollect (round 16) — the single-sstable
    * compaction replayed per file: within-file LWW rank (cross-file
    * duplicates untouched), the droppable winner's purge decided by an
    * EXISTS against every OTHER file, and the per-unit reclaim split
    * (shadowed / purged / kept) with checksums over the kept rows. */
  private lazy val q216Sql: String = s"""WITH $fixtures,
gmapped AS (
  SELECT sstable_id, key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
granked AS (
  SELECT *, row_number() OVER (
      PARTITION BY sstable_id, key, clustering, column_name
      ORDER BY timestamp_us DESC, sstable_id DESC, size_bytes DESC,
               is_tombstone DESC, local_deletion_time_s DESC,
               ttl_s DESC, is_expiring DESC, kind DESC) AS rn
  FROM gmapped
),
gkept AS (
  SELECT * FROM granked
  WHERE rn = 1 AND (
    NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
    OR EXISTS (SELECT 1 FROM gmapped o
               WHERE o.sstable_id <> granked.sstable_id
                 AND o.key = granked.key))
),
gin AS (
  SELECT sstable_id, CAST(COUNT(*) AS BIGINT) AS events_in,
    CAST(SUM(CASE WHEN is_tombstone AND local_deletion_time_s <
      $GcBeforeS THEN 1 ELSE 0 END) AS BIGINT) AS droppable_in,
    CAST(SUM(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS shadowed,
    CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS winners
  FROM granked GROUP BY 1
),
gout AS (
  SELECT sstable_id, CAST(COUNT(*) AS BIGINT) AS events_out,
    CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions_out,
    CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT)
      AS tombstones_out,
    CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
    CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
    CAST(SUM(size_bytes % 1000003) AS BIGINT) AS value_sum
  FROM gkept GROUP BY 1
)
SELECT i.sstable_id AS unit, i.events_in, i.droppable_in, i.shadowed,
  i.winners - o.events_out AS purged,
  o.events_out, o.partitions_out, o.tombstones_out,
  o.keys_sum, o.ts_sum, o.value_sum
FROM gin i JOIN gout o USING (sstable_id)
ORDER BY unit"""

  /** q215: transformWithState (round 16) — the arbitrary-state API's
    * per-key ValueState trajectory replayed in SQL: batch assignment
    * (hours [0,2)/[2,4)/[4,6), one file per micro-batch), per-batch
    * count + id checksum per event type, the appearance sequence
    * (row_number over batches where the key appears) and the running
    * total (window sum) — one emitted row per (key, batch). */
  private lazy val q215Sql: String = {
    val anchor = graft.streaming.StreamingStats.WatermarkAnchorUs
    s"""WITH tev AS (
  SELECT event_type, event_id,
    (epoch_us(ts) - $anchor) // 3600000000 AS rh
  FROM events
),
tstaged AS (
  SELECT event_type, event_id,
    CASE WHEN rh < 2 THEN 0 WHEN rh < 4 THEN 1 ELSE 2 END AS b
  FROM tev WHERE rh >= 0 AND rh < 6
),
tbatch AS (
  SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS events,
    CAST(SUM(event_id % 1000003) % 1000003 AS BIGINT) AS id_sum
  FROM tstaged GROUP BY 1, 2
)
SELECT event_type,
  CAST(row_number() OVER (PARTITION BY event_type ORDER BY b)
    AS BIGINT) AS seq,
  events,
  CAST(SUM(events) OVER (PARTITION BY event_type ORDER BY b)
    AS BIGINT) AS running_events,
  id_sum
FROM tbatch ORDER BY event_type, seq"""
  }

  /** q208: streaming dedup (round 16) — the
    * dropDuplicatesWithinWatermark trajectory replayed in SQL: the
    * staged arrival is hours [0,2) ∪ [4,10) plus every hour-0 event
    * republished twice (ts+4h in batch 2, ts+8h in batch 4); the
    * batch-2 republication arrives while its keys' dedup state is
    * live (dropped), the batch-4 one after the watermark evicted the
    * state (re-emitted at its new hour-8 event time) — measured Spark
    * 4.1.2 semantics, see StreamingStats.dedupReplayOnce. */
  private lazy val q208Sql: String = {
    val anchor = graft.streaming.StreamingStats.WatermarkAnchorUs
    s"""WITH dev AS (
  SELECT event_type, value, event_id,
    (epoch_us(ts) - $anchor) // 3600000000 AS rh
  FROM events
),
emitted AS (
  SELECT rh, event_type, event_id, value FROM dev
  WHERE (rh >= 0 AND rh < 2) OR (rh >= 4 AND rh < 10)
  UNION ALL
  SELECT rh + 8 AS rh, event_type, event_id, value FROM dev
  WHERE rh = 0
)
SELECT CAST(rh AS BIGINT) AS rh, event_type,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(event_id % 1000003) AS BIGINT) AS id_sum,
  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_x100
FROM emitted GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** q207: sstableloader (round 16) — the ring model replayed from
    * parquet: 4 equal primary quarters, RF=2 clockwise replicas, the
    * per-quarter source fan-in off each sstable's [min_tok, max_tok]
    * span, and each node's expected received events + digest per owned
    * quarter (≡ the corpus's, since streaming is multiset-preserving);
    * the engine computes the same numbers off the REAL received
    * sstables, so a mis-routed or dropped event breaks the hash. */
  private lazy val q207Sql: String = {
    val tok = h60("CAST(key AS VARCHAR)")
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
lmapped AS (
  SELECT CASE WHEN (key + clustering) % 4 = 3
         THEN 'sst-' || CAST((((key + clustering) % 8) // 4) * 2
                             + timestamp_us % 2 AS VARCHAR)
         ELSE 'sst-' || CAST(CASE
              WHEN $tok // 144115188075855872 <= 1 THEN 4
              WHEN $tok // 144115188075855872 <= 3 THEN 5
              WHEN $tok // 144115188075855872 = 4
                THEN 6 + timestamp_us % 2
              ELSE 8 END AS VARCHAR) END AS sstable_id,
    key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes,
    $tok AS tok
  FROM licells
),
lspans AS (
  SELECT sstable_id, MIN(tok) AS mn, MAX(tok) AS mx
  FROM lmapped GROUP BY 1
),
lq AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(quarter)),
lfan AS (
  SELECT q.quarter, CAST(COUNT(*) AS BIGINT) AS src_sstables
  FROM lq q JOIN lspans s
    ON s.mn // 288230376151711744 <= q.quarter
   AND q.quarter <= s.mx // 288230376151711744
  GROUP BY 1
),
lcorpus AS (
  SELECT tok // 288230376151711744 AS quarter,
    CAST(COUNT(*) AS BIGINT) AS corpus_events,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS corpus_digest
  FROM lmapped GROUP BY 1
),
lreplica AS (
  SELECT q.quarter, (q.quarter + r.r) % 4 AS node
  FROM lq q, (VALUES (0), (1)) r(r)
)
SELECT CAST(p.node AS BIGINT) AS node,
  CAST(p.quarter AS BIGINT) AS quarter,
  f.src_sstables,
  c.corpus_events AS events, c.corpus_digest AS digest,
  c.corpus_events, c.corpus_digest,
  TRUE AS verified,
  CAST(2 AS BIGINT) AS holders
FROM lreplica p
JOIN lcorpus c ON c.quarter = p.quarter
JOIN lfan f ON f.quarter = p.quarter
ORDER BY node, quarter"""
  }

  /** q198: the watermark replay (round 16) — the controlled 3-batch
    * arrival of [[graft.streaming.StreamingStats.watermarkReplayOnce]]
    * rebuilt in SQL. The staged set is hours [0,2) ∪ [4,12) of the
    * events table; the hour-0 even-id sliver arrives in batch 3 AFTER
    * the watermark (max event time of batches 1–2 minus 2 h, in
    * milliseconds — Spark tracks event time in ms) passed its window,
    * so it is dropped; the hour-1 even-id sliver arrives in batch 2
    * BEFORE the watermark passed (the post-batch-1 watermark sits
    * before hour 0), so it is kept. Append mode's final table is every
    * window whose end ≤ the FINAL watermark (max staged time − 2 h). */
  private lazy val q198Sql: String = {
    val anchor = graft.streaming.StreamingStats.WatermarkAnchorUs
    s"""WITH wev AS (
  SELECT epoch_us(ts) AS us, event_type, value, event_id,
    (epoch_us(ts) - $anchor) // 3600000000 AS rh
  FROM events
),
staged AS (
  SELECT * FROM wev WHERE (rh >= 0 AND rh < 2) OR (rh >= 4 AND rh < 12)
),
wm AS (SELECT (max(us) // 1000) - 7200000 AS wm_ms FROM staged),
kept AS (
  SELECT * FROM staged WHERE NOT (rh = 0 AND event_id % 2 = 0)
)
SELECT CAST(($anchor + rh * 3600000000) // 1000000 AS BIGINT)
    AS hour_start_s,
  event_type, CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_x100
FROM kept, wm
WHERE ($anchor + (rh + 1) * 3600000000) // 1000 <= wm.wm_ms
GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** q200: sstableupgrade (round 16) — the upgraded 'oa' set must be
    * event-identical to the 'nb' set through the production scan
    * (count + commutative digest both equal the parquet derivation),
    * byte-identical on Data.db, component-complete, and its new
    * version-gated fields must carry exactly the derivable values
    * (first/last key, min/max timestamp, the covered slice's
    * clustering bounds). */
  private lazy val q200Sql: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
umapped AS (
  SELECT sstable_id, key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
uagg AS (
  SELECT sstable_id AS unit,
    CAST(COUNT(*) AS BIGINT) AS events,
    CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS digest,
    CAST(MIN(key) AS BIGINT) AS first_key,
    CAST(MAX(key) AS BIGINT) AS last_key,
    CAST(MIN(timestamp_us) AS BIGINT) AS min_ts_us,
    CAST(MAX(timestamp_us) AS BIGINT) AS max_ts_us,
    CAST(MIN(clustering) AS BIGINT) AS min_clustering,
    CAST(MAX(clustering) AS BIGINT) AS max_clustering
  FROM umapped GROUP BY 1
)
SELECT unit,
  events AS events_nb, partitions AS partitions_nb, digest AS digest_nb,
  events AS events_oa, partitions AS partitions_oa, digest AS digest_oa,
  TRUE AS components_match, TRUE AS data_bytes_equal,
  first_key, last_key, min_ts_us, max_ts_us,
  min_clustering, max_clustering,
  TRUE AS coverage_consistent
FROM uagg ORDER BY unit"""
  }

  /** q201: sstablescrub (round 16) — exactly one partition (sst-2's
    * smallest key ≡ 0 mod 97, whole byte range overwritten) is
    * corrupted, so the salvaged output is the corpus minus that
    * partition; the Digest.crc32 verdict flags only the corrupted
    * file. Everything else replays from parquet under the read-back
    * representation mapping. */
  private lazy val q201Sql: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    s"""WITH $fixtures,
smapped AS (
  SELECT sstable_id, key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
victim AS (
  SELECT MIN(key) AS vk FROM smapped
  WHERE sstable_id = 'sst-2' AND key % ${graft.ops.Scrub.VictimKeyMod} = 0
),
stotal AS (
  SELECT sstable_id, CAST(COUNT(DISTINCT key) AS BIGINT)
    AS partitions_total
  FROM smapped GROUP BY 1
),
kept AS (
  SELECT s.* FROM smapped s, victim v
  WHERE NOT (s.sstable_id = 'sst-2' AND s.key = v.vk)
),
sagg AS (
  SELECT sstable_id,
    CAST(COUNT(*) AS BIGINT) AS events,
    CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions_salvaged,
    CAST(SUM($evHash % 1000003) AS BIGINT) AS digest
  FROM kept GROUP BY 1
)
SELECT a.sstable_id AS unit, a.events, a.partitions_salvaged, a.digest,
  (a.sstable_id <> 'sst-2') AS digest_ok,
  t.partitions_total,
  CAST(CASE WHEN a.sstable_id = 'sst-2' THEN 1 ELSE 0 END AS BIGINT)
    AS partitions_skipped,
  CAST(CASE WHEN a.sstable_id = 'sst-2' THEN (SELECT vk FROM victim)
       ELSE -1 END AS BIGINT) AS skipped_key
FROM sagg a JOIN stotal t USING (sstable_id) ORDER BY unit"""
  }

  /** q204: sstableofflinerelevel (round 16) — the flat (level-reset)
    * leveled set's first-fit run assignment replayed as a DuckDB
    * recursive CTE (one interval per step, run state = per-run last
    * keys as a list), then volume-ranked leveling; within-level
    * disjointness holds by construction (runs are chains) so the
    * re-check column is 0 and the re-read level equals the plan. */
  private lazy val q204Sql: String = s"""WITH RECURSIVE $fixtures,
lkeys AS (
  SELECT key, NTILE(4) OVER (ORDER BY key) AS tile
  FROM (SELECT DISTINCT key FROM licells)
),
lmapped AS (
  SELECT CASE WHEN k.tile IN (2, 3) AND m.timestamp_us % 10 < 3
              THEN 'sst-' || CAST(m.timestamp_us % 2 AS VARCHAR)
              ELSE 'sst-' || CAST(k.tile + 1 AS VARCHAR) END AS sstable_id,
    m.key,
    CASE WHEN m.is_tombstone THEN 0 ELSE m.size_bytes % 61 END AS size_bytes
  FROM licells m JOIN lkeys k USING (key)
),
rbounds AS (
  SELECT sstable_id, CAST(MIN(key) AS BIGINT) AS fk,
    CAST(MAX(key) AS BIGINT) AS lk,
    CAST(SUM(32 + size_bytes) AS BIGINT) AS model_bytes
  FROM lmapped GROUP BY 1
),
rranked AS (
  SELECT *, row_number() OVER (ORDER BY fk, sstable_id) AS rn
  FROM rbounds
),
rassign(rn, lasts, sstable_id, run) AS (
  SELECT 0, CAST([] AS BIGINT[]), CAST(NULL AS VARCHAR), 0
  UNION ALL
  SELECT o.rn,
    CASE WHEN j.j IS NULL THEN list_append(a.lasts, o.lk)
         ELSE list_concat(list_concat(
                a.lasts[1:j.j-1], [o.lk]),
                a.lasts[j.j+1:len(a.lasts)]) END,
    o.sstable_id,
    CAST(COALESCE(j.j, len(a.lasts) + 1) AS INT)
  FROM rassign a
  JOIN rranked o ON o.rn = a.rn + 1
  CROSS JOIN LATERAL (SELECT NULLIF(list_position(
    list_transform(a.lasts, x -> x < o.fk), true), 0) AS j) j
),
runs AS (SELECT sstable_id, run FROM rassign WHERE rn > 0),
runvol AS (
  SELECT r.run, SUM(b.model_bytes) AS rbytes
  FROM runs r JOIN rbounds b USING (sstable_id) GROUP BY 1
),
lvls AS (
  SELECT run, CAST(row_number() OVER (ORDER BY rbytes, run) AS BIGINT)
    AS lvl
  FROM runvol
)
SELECT b.sstable_id, b.fk AS first_key, b.lk AS last_key, b.model_bytes,
  CAST(r.run AS BIGINT) AS run, l.lvl, l.lvl AS lvl_reread,
  CAST(0 AS BIGINT) AS level_overlaps
FROM rbounds b JOIN runs r USING (sstable_id) JOIN lvls l USING (run)
ORDER BY b.sstable_id"""

  /** q196: the steady-state incremental loop — the flush is the
    * key%101 sliver re-written FlushShiftUs later through the real
    * sink (cassandra read-back representation), the only unrepaired
    * file beside the fully-marked base; the incremental triple reads
    * exactly it, then zero once marked. */
  private lazy val q196Sql: String = {
    val evHash = h60("CAST(key AS VARCHAR) || ':' || " +
      "CAST(clustering AS VARCHAR) || ':' || column_name || ':' || " +
      "kind || ':' || CAST(timestamp_us AS VARCHAR) || ':' || " +
      "CAST(ttl_s AS VARCHAR) || ':' || " +
      "CAST(local_deletion_time_s AS VARCHAR) || ':' || " +
      "CAST(size_bytes AS VARCHAR)")
    val span = 1L << graft.ops.AntiEntropy.TokenLeafShift
    s"""WITH $fixtures,
fmapped AS (
  SELECT key, clustering, column_name, kind,
    timestamp_us + ${graft.ops.Repair.FlushShiftUs} AS timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells WHERE key % ${graft.ops.Repair.FlushSliverMod} = 0
),
fev AS (
  SELECT $evHash % 1000003 AS eh,
    ${h60("CAST(key AS VARCHAR)")} // $span AS leaf
  FROM fmapped
),
n AS (
  SELECT CAST(COUNT(DISTINCT sstable_id) + 1 AS BIGINT) AS sst
  FROM licells
)
SELECT 'flushed' AS state, n.sst AS sstables,
  CAST(1 AS BIGINT) AS unrepaired_sstables,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(COUNT(DISTINCT leaf) AS BIGINT) AS leaves,
  CAST(SUM(eh) AS BIGINT) AS digest
FROM fev, n GROUP BY n.sst
UNION ALL
SELECT 'marked', n.sst, CAST(0 AS BIGINT),
  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM n
ORDER BY state"""
  }

  /** Shared q190/q191 decision select: per-sstable window, expiry,
    * blocker count and next action over a stats relation named `s`
    * with a live-multi-window relation named by `multi`. */
  private def twcsDecisionSelect(stats: String, multi: String): String = s"""
SELECT s.sstable_id, CAST(s.swin AS BIGINT) AS win,
  (s.maxldt < $GcBeforeS) AS expired,
  CAST(CASE WHEN s.maxldt < $GcBeforeS THEN
    (SELECT COUNT(*) FROM $stats b WHERE b.maxldt >= $GcBeforeS
       AND b.fk <= s.lk AND b.lk >= s.fk AND b.mints <= s.maxts)
    ELSE 0 END AS BIGINT) AS blockers,
  CASE WHEN s.maxldt < $GcBeforeS AND NOT EXISTS
         (SELECT 1 FROM $stats b WHERE b.maxldt >= $GcBeforeS
            AND b.fk <= s.lk AND b.lk >= s.fk AND b.mints <= s.maxts)
       THEN 'drop'
       WHEN s.maxldt < $GcBeforeS THEN 'blocked'
       WHEN s.swin IN (SELECT swin FROM $multi) THEN 'compact'
       ELSE 'passthrough' END AS action
FROM $stats s ORDER BY 1"""

  /** q190: the TWCS what-if planner — the q188 decision table alone,
    * no execution. */
  private lazy val q190Sql: String =
    q188Ctes + twcsDecisionSelect("xstats", "xmulti")

  /** q191: TWCS re-ingestion — the post-compaction state (merged
    * window outputs + passthrough + the blocked survivor; the dropped
    * file gone) re-enters the decision table: steady state (every live
    * window single-member, nothing to compact; the blocked candidate
    * still blocked). */
  private lazy val q191Sql: String = q188Ctes + s""",
newunits AS (
  SELECT 'sst-' || CAST(${graft.ops.TwcsCompaction.OutGenBase} + swin
      AS VARCHAR) AS sstable_id,
    key, timestamp_us, local_deletion_time_s
  FROM xkept
  UNION ALL
  SELECT m.sstable_id, m.key, m.timestamp_us, m.local_deletion_time_s
  FROM xmapped m JOIN xtag t USING (sstable_id)
  WHERE (t.expired AND t.is_blocked)
     OR (NOT t.expired AND t.swin NOT IN (SELECT swin FROM xmulti))
),
nstats AS (
  SELECT sstable_id, MIN(key) AS fk, MAX(key) AS lk,
    MIN(timestamp_us) AS mints, MAX(timestamp_us) AS maxts,
    MAX(local_deletion_time_s) AS maxldt,
    (MAX(timestamp_us) // 86400000000) // 640 AS swin
  FROM newunits GROUP BY 1
),
nmulti AS (
  SELECT swin FROM nstats WHERE maxldt >= $GcBeforeS
  GROUP BY 1 HAVING COUNT(*) >= 2
)""" + twcsDecisionSelect("nstats", "nmulti")

  /** The q171 chain's WITH-prefix (shared with q186): everything through
    * the per-tier `kept` relation. */
  private lazy val q171Ctes: String = s"""WITH $fixtures,
tmapped AS (
  SELECT CASE WHEN (key + clustering) % 13 <= 2
                THEN 'sst-' || CAST((key + clustering) % 13 AS VARCHAR)
              WHEN (key + clustering) % 13 <= 4 THEN 'sst-3'
              WHEN (key + clustering) % 13 <= 8 THEN 'sst-4'
              ELSE 'sst-5' END AS sstable_id,
    key, clustering, column_name, kind, timestamp_us,
    CASE WHEN is_tombstone THEN -1 ELSE ttl_s END AS ttl_s,
    local_deletion_time_s, is_tombstone, is_expiring,
    CASE WHEN is_tombstone THEN 0 ELSE size_bytes % 61 END AS size_bytes
  FROM licells
),
persst AS (
  SELECT sstable_id, CAST(SUM(32 + size_bytes) AS BIGINT) AS bytes
  FROM tmapped GROUP BY 1
),
tiers AS (
  SELECT sstable_id,
    ${bitLenSql("GREATEST(bytes // 16384, 1)")} AS tier
  FROM persst
),
selcnt AS (
  SELECT tier, CAST(COUNT(*) AS BIGINT) AS members FROM tiers GROUP BY 1
),
tagged AS (
  SELECT t.sstable_id, t.tier, (s.members >= 2) AS selected, s.members
  FROM tiers t JOIN selcnt s USING (tier)
),
outkeys AS (
  -- (tier, key) pairs where some sstable OUTSIDE that tier's compaction
  -- (passthrough OR another selected tier) holds the key — each tier is
  -- a SEPARATE compaction, so its guard consults everything else
  SELECT DISTINCT w.tier, m.key
  FROM tmapped m JOIN tagged g USING (sstable_id)
  CROSS JOIN (SELECT DISTINCT tier FROM tagged WHERE selected) w
  WHERE NOT g.selected OR g.tier <> w.tier
),
ranked AS (
  SELECT m.*, g.tier, g.members,
    row_number() OVER (
      PARTITION BY g.tier, m.key, m.clustering, m.column_name
      ORDER BY m.timestamp_us DESC, m.sstable_id DESC, m.size_bytes DESC,
               m.is_tombstone DESC, m.local_deletion_time_s DESC,
               m.ttl_s DESC, m.is_expiring DESC, m.kind DESC) AS rn
  FROM tmapped m JOIN tagged g USING (sstable_id)
  WHERE g.selected
),
kept AS (
  SELECT * FROM ranked
  WHERE rn = 1 AND (
    NOT (is_tombstone AND local_deletion_time_s < $GcBeforeS)
    OR EXISTS (SELECT 1 FROM outkeys o
               WHERE o.tier = ranked.tier AND o.key = ranked.key))
)"""

  private lazy val q171Select: String = s"""
SELECT 'tier-' || CAST(tier AS VARCHAR) AS unit,
  'compacted' AS action,
  MAX(members) AS sstables_in,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(SUM(CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 1 ELSE 0 END) AS BIGINT) AS markers,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(ttl_s % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT) AS expiring,
  CAST(SUM(size_bytes % 1000003) AS BIGINT) AS value_sum
FROM kept GROUP BY 1, 2
UNION ALL
SELECT m.sstable_id AS unit,
  'passthrough' AS action,
  CAST(1 AS BIGINT) AS sstables_in,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CASE WHEN kind = 'CELL' THEN 1 ELSE 0 END) AS BIGINT) AS cells,
  CAST(SUM(CASE WHEN kind = 'RANGE_TOMBSTONE_MARKER' THEN 1 ELSE 0 END) AS BIGINT) AS markers,
  CAST(COUNT(DISTINCT key) AS BIGINT) AS partitions,
  CAST(SUM(key % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(clustering % 1000003) AS BIGINT) AS clustering_sum,
  CAST(SUM(timestamp_us % 1000003) AS BIGINT) AS ts_sum,
  CAST(SUM(ttl_s % 1000003) AS BIGINT) AS ttl_sum,
  CAST(SUM(local_deletion_time_s % 1000003) AS BIGINT) AS ldt_sum,
  CAST(SUM(CASE WHEN is_tombstone THEN 1 ELSE 0 END) AS BIGINT) AS tombstones,
  CAST(SUM(CASE WHEN is_expiring THEN 1 ELSE 0 END) AS BIGINT) AS expiring,
  CAST(SUM(size_bytes % 1000003) AS BIGINT) AS value_sum
FROM tmapped m JOIN tagged g USING (sstable_id)
WHERE NOT g.selected
GROUP BY 1, 2
ORDER BY unit"""

  private lazy val q164Sql: String = """WITH
ks AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS k FROM lineitem),
base AS (SELECT k, k % 3 AS maxc,
  CASE WHEN k % 19 = 0 THEN 1000000000000 + k*10 + 2 END AS pd_ts,
  CASE WHEN k % 3 = 0 AND k % 17 = 0 THEN 2000000000000 + k + 5 END AS srd_ts
  FROM ks),
rows_ AS (SELECT k, pd_ts,
  CASE WHEN k % 13 = 0 THEN 3000000000000 + k END AS cd_ts,
  unnest(generate_series(0, maxc)) AS c FROM base),
rowx AS (SELECT k, c, pd_ts, cd_ts,
  CASE WHEN k % 11 = 0 AND c = 0 THEN 2000000000000 + k END AS rd_ts
  FROM rows_),
vol AS (
  SELECT LEAST(4096, GREATEST(1, CAST(CEIL((
    (SELECT SUM(CASE WHEN k % 19 = 0 THEN 32 ELSE 0 END
       + CASE WHEN k % 3 = 0 THEN 32 + k % 23 ELSE 0 END
       + CASE WHEN k % 9 = 0 THEN 32 ELSE 0 END
       + CASE WHEN k % 3 = 0 AND k % 17 = 0 THEN 32 ELSE 0 END) FROM ks)
    + (SELECT SUM(CASE WHEN k % 2 = 0 THEN 32 ELSE 0 END
       + CASE WHEN k % 11 = 0 AND c = 0 THEN 32 ELSE 0 END
       + CASE WHEN k % 13 = 0 THEN 32 ELSE 0 END
       + 32 + (k + c) % 31 + 64 + (k + c) % 7 + (k + c + 1) % 7)
       FROM rowx)
    ) / 1048576.0) AS BIGINT))) AS n),
gcs AS (SELECT UNNEST([600000050, 700000020]) AS gc),
ev AS (
  SELECT g.gc, b.k, 'PD' AS kind, b.pd_ts AS ts,
    CAST(NULL AS BIGINT) AS ttl, 700000000 + b.k % 40 AS ldt,
    CAST(NULL AS BIGINT) AS sz
  FROM base b, gcs g
  WHERE b.pd_ts IS NOT NULL AND 700000000 + b.k % 40 >= g.gc
  UNION ALL
  SELECT g.gc, b.k, 'SC', 1000000000000 + b.k, NULL, NULL, b.k % 23
  FROM base b, gcs g
  WHERE b.k % 3 = 0 AND 1000000000000 + b.k >
    GREATEST(COALESCE(b.pd_ts, -1), COALESCE(b.srd_ts, -1))
  UNION ALL
  SELECT g.gc, b.k, 'LV', 1000000000000 + b.k + 5, -1, 2147483647, NULL
  FROM base b, gcs g
  WHERE b.k % 9 = 0 AND 1000000000000 + b.k + 5 >
    GREATEST(COALESCE(b.pd_ts, -1), COALESCE(b.srd_ts, -1))
  UNION ALL
  SELECT g.gc, b.k, 'RD', b.srd_ts, NULL, 600000000 + b.k % 70, NULL
  FROM base b, gcs g
  WHERE b.srd_ts IS NOT NULL AND b.srd_ts > COALESCE(b.pd_ts, -1)
    AND 600000000 + b.k % 70 >= g.gc
  UNION ALL
  SELECT g.gc, r.k, 'LV', 1000000000000 + r.k*10 + r.c,
    CASE WHEN r.k % 10 = 0 THEN 3600 ELSE -1 END,
    CASE WHEN r.k % 10 = 0 THEN 500000000 + r.k % 1000 ELSE 2147483647 END,
    NULL
  FROM rowx r, gcs g
  WHERE r.k % 2 = 0 AND 1000000000000 + r.k*10 + r.c >
    GREATEST(COALESCE(r.pd_ts, -1), COALESCE(r.rd_ts, -1))
  UNION ALL
  SELECT g.gc, r.k, 'RD', r.rd_ts, NULL, 600000000 + r.k % 100, NULL
  FROM rowx r, gcs g
  WHERE r.rd_ts IS NOT NULL AND r.rd_ts > COALESCE(r.pd_ts, -1)
    AND 600000000 + r.k % 100 >= g.gc
  UNION ALL
  SELECT g.gc, r.k, 'CD', r.cd_ts, NULL, 700000000 + r.k % 50, NULL
  FROM rowx r, gcs g
  WHERE r.cd_ts IS NOT NULL AND r.cd_ts >
    GREATEST(COALESCE(r.pd_ts, -1), COALESCE(r.rd_ts, -1))
    AND 700000000 + r.k % 50 >= g.gc
  UNION ALL
  SELECT g.gc, r.k, 'CE', 1000000000000 + r.k*10 + r.c + 1, NULL, NULL,
    (r.k + r.c) % 31
  FROM rowx r, gcs g
  WHERE 1000000000000 + r.k*10 + r.c + 1 >
    GREATEST(COALESCE(r.pd_ts, -1), COALESCE(r.rd_ts, -1))
  UNION ALL
  SELECT g.gc, r.k, 'CE', 1000000000000 + r.k*10 + r.c + 2 + t.i,
    NULL, NULL, (r.k + r.c + t.i) % 7
  FROM rowx r, gcs g, UNNEST([0, 1]) AS t(i)
  WHERE 1000000000000 + r.k*10 + r.c + 2 + t.i >
    GREATEST(COALESCE(r.pd_ts, -1), COALESCE(r.rd_ts, -1),
      COALESCE(r.cd_ts, -1))
),
perkey AS (
  SELECT gc, k % (SELECT n FROM vol) AS shard, k,
    SUM(CASE WHEN kind = 'SC' THEN 1 ELSE 0 END) AS statics,
    SUM(CASE WHEN kind = 'SC' THEN ts % 1000003 ELSE 0 END) AS static_ts_sum,
    SUM(CASE WHEN kind = 'SC' THEN sz ELSE 0 END) AS static_size_sum,
    SUM(CASE WHEN kind = 'LV' THEN 1 ELSE 0 END) AS liveness,
    SUM(CASE WHEN kind = 'LV' THEN ts % 1000003 ELSE 0 END) AS live_ts_sum,
    SUM(CASE WHEN kind = 'LV' THEN ttl ELSE 0 END) AS live_ttl_sum,
    SUM(CASE WHEN kind = 'LV' THEN ldt % 1000003 ELSE 0 END) AS live_ldt_sum,
    SUM(CASE WHEN kind = 'RD' THEN 1 ELSE 0 END) AS row_dels,
    SUM(CASE WHEN kind = 'RD' THEN ts % 1000003 ELSE 0 END) AS rdel_ts_sum,
    SUM(CASE WHEN kind = 'RD' THEN ldt % 1000003 ELSE 0 END) AS rdel_ldt_sum,
    SUM(CASE WHEN kind = 'CD' THEN 1 ELSE 0 END) AS complex_dels,
    SUM(CASE WHEN kind = 'CD' THEN ts % 1000003 ELSE 0 END) AS cdel_ts_sum,
    SUM(CASE WHEN kind = 'CD' THEN ldt % 1000003 ELSE 0 END) AS cdel_ldt_sum,
    SUM(CASE WHEN kind = 'CE' THEN 1 ELSE 0 END) AS cells,
    SUM(CASE WHEN kind = 'CE' THEN ts % 1000003 ELSE 0 END) AS cell_ts_sum,
    SUM(CASE WHEN kind = 'CE' THEN sz ELSE 0 END) AS cell_size_sum,
    SUM(CASE WHEN kind = 'PD' THEN 1 ELSE 0 END) AS part_dels,
    SUM(CASE WHEN kind = 'PD' THEN ts % 1000003 ELSE 0 END) AS pdel_ts_sum,
    SUM(CASE WHEN kind = 'PD' THEN ldt % 1000003 ELSE 0 END) AS pdel_ldt_sum
  FROM ev GROUP BY 1, 2, 3)
SELECT CAST(gc AS BIGINT) AS gc_before_s,
  'fb-' || CAST(shard AS VARCHAR) AS sstable_id,
  CAST(COUNT(*) AS BIGINT) AS partitions,
  CAST(SUM(k % 1000003) AS BIGINT) AS keys_sum,
  CAST(SUM(statics) AS BIGINT) AS statics,
  CAST(SUM(static_ts_sum) AS BIGINT) AS static_ts_sum,
  CAST(SUM(static_size_sum) AS BIGINT) AS static_size_sum,
  CAST(SUM(liveness) AS BIGINT) AS liveness,
  CAST(SUM(live_ts_sum) AS BIGINT) AS live_ts_sum,
  CAST(SUM(live_ttl_sum) AS BIGINT) AS live_ttl_sum,
  CAST(SUM(live_ldt_sum) AS BIGINT) AS live_ldt_sum,
  CAST(SUM(row_dels) AS BIGINT) AS row_dels,
  CAST(SUM(rdel_ts_sum) AS BIGINT) AS rdel_ts_sum,
  CAST(SUM(rdel_ldt_sum) AS BIGINT) AS rdel_ldt_sum,
  CAST(SUM(complex_dels) AS BIGINT) AS complex_dels,
  CAST(SUM(cdel_ts_sum) AS BIGINT) AS cdel_ts_sum,
  CAST(SUM(cdel_ldt_sum) AS BIGINT) AS cdel_ldt_sum,
  CAST(SUM(cells) AS BIGINT) AS cells,
  CAST(SUM(cell_ts_sum) AS BIGINT) AS cell_ts_sum,
  CAST(SUM(cell_size_sum) AS BIGINT) AS cell_size_sum,
  CAST(SUM(part_dels) AS BIGINT) AS part_dels,
  CAST(SUM(pdel_ts_sum) AS BIGINT) AS pdel_ts_sum,
  CAST(SUM(pdel_ldt_sum) AS BIGINT) AS pdel_ldt_sum
FROM perkey GROUP BY 1, 2 ORDER BY 1, 2"""

  /** q121: the shadowing rule replayed from the feature model — the
    * deleted partitions are k%19==0 with markedForDeleteAt = T0+k*10+2,
    * so a regular cell (ts offset o at clustering c) is shadowed iff
    * c + o <= 2 and a static cell (ts = T0 + k) always is. */
  private lazy val q121Sql: String = """WITH
ks AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS k FROM lineitem),
base AS (SELECT k, 'fb-' || (k % 4) AS sstable_id, k % 3 AS maxc,
  (k % 19 = 0) AS deleted FROM ks),
rows_ AS (SELECT k, sstable_id, deleted,
  unnest(generate_series(0, maxc)) AS c FROM base),
cells AS (
  SELECT sstable_id, k, deleted, c, o,
    CASE o WHEN 1 THEN (k+c) % 31 WHEN 2 THEN (k+c) % 7
      ELSE (k+c+1) % 7 END AS sz,
    (deleted AND c + o <= 2) AS shadowed
  FROM rows_, UNNEST([1, 2, 3]) AS t(o)
  UNION ALL
  SELECT sstable_id, k, deleted, -1, 0, k % 23, deleted
  FROM base WHERE k % 3 = 0
)
SELECT sstable_id,
  CAST(COUNT(DISTINCT CASE WHEN deleted THEN k END) AS BIGINT) AS deleted_partitions,
  CAST(COUNT(*) AS BIGINT) AS cells_total,
  CAST(SUM(CASE WHEN shadowed THEN 1 ELSE 0 END) AS BIGINT) AS cells_shadowed,
  CAST(SUM(CASE WHEN shadowed THEN sz ELSE 0 END) AS BIGINT) AS shadowed_size_sum,
  CAST(SUM(CASE WHEN shadowed THEN 0 ELSE 1 END) AS BIGINT) AS live_cells
FROM cells GROUP BY 1 ORDER BY 1"""
}
