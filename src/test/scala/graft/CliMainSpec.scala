package graft

import graft.cli.Main

/** The CLI front-end: the reference's exact command/option grammar
  * (cli/CLI.java:9-20 + per-command usage blocks) parsed and dispatched to
  * the report library. */
class CliMainSpec extends SparkSpec {

  test("parse: reference grammar accepted, options in any order") {
    assert(Main.parse(Seq("summary")) === Right(Main.Opts("summary")))
    val p = Main.parse(Seq("pstats", "-n", "5", "-f", "sst-1-Data.db,sst-3",
      "-b", "ks1", "lineitem"))
    assert(p === Right(Main.Opts("pstats", topN = 5, files = Seq("sst-1",
      "sst-3"), batch = true, keyspace = "ks1", table = "lineitem")))
    // -f before -n, -t snapshot name, index store resolution (F9)
    val q = Main.parse(Seq("cfstats", "-f", "sst-2", "-t", "snap1", "-n",
      "3", "ks1", "lineitem.by_email"))
    assert(q === Right(Main.Opts("cfstats", topN = 3,
      snapshot = Some("snap1"), files = Seq("sst-2"), keyspace = "ks1",
      table = "lineitem")))
  }

  test("parse: -V/--version is an informational Left carrying the " +
      "engine + Spark + Scala versions (reference cli/VersionParser.java)") {
    assert(Main.parse(Seq("-V")) === Left(Main.versionString))
    assert(Main.parse(Seq("--version")) === Left(Main.versionString))
    assert(Main.versionString.startsWith(s"graft ${Main.Version} (Spark "))
    assert(Main.versionString.contains(org.apache.spark.SPARK_VERSION))
  }

  test("parse: usage errors never construct a session") {
    assert(Main.parse(Nil).isLeft)
    assert(Main.parse(Seq("frobnicate")).isLeft)
    assert(Main.parse(Seq("pstats", "ks1")).isLeft) // missing table
    assert(Main.parse(Seq("summary", "extra")).isLeft)
    assert(Main.parse(Seq("pstats", "-n", "zero", "ks1", "lineitem")).isLeft)
    assert(Main.parse(Seq("pstats", "-n", "-4", "ks1", "lineitem")).isLeft)
    assert(Main.parse(Seq("purge", "-x", "ks1", "lineitem")).isLeft)
    assert(Main.parse(Seq("help", "pstats")) === Left(Main.usage("pstats")))
    // conflicting compact mode flags are usage errors, not silently
    // resolved by dispatch order (round 14): at most one strategy,
    // --sidecar-sized only on the major path, --again only with
    // --leveled, repair's --ranges/--incremental mutually exclusive
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--minor", "--leveled")).isLeft)
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--sidecar-sized", "--minor")).isLeft)
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--twcs", "--minor")).isLeft)
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--twcs", "--leveled")).isLeft)
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--twcs", "--sidecar-sized")).isLeft)
    // bare --twcs = the read-only what-if (like --leveled)
    assert(Main.parse(Seq("compact", "--twcs")) ===
      Right(Main.Opts("compact", twcs = true)))
    // --ucs: one strategy max, what-if without --execute, no --again
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--ucs", "--twcs")).isLeft)
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--ucs", "--sidecar-sized")).isLeft)
    assert(Main.parse(Seq("compact", "--ucs", "--again")).isLeft)
    assert(Main.parse(Seq("compact", "--ucs")) ===
      Right(Main.Opts("compact", ucs = true)))
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--ucs")) === Right(Main.Opts("compact", execute = true,
      ucs = true, keyspace = "ks1", table = "lineitem")))
    // --again applies to --leveled or --twcs, execute-only
    assert(Main.parse(Seq("compact", "--twcs", "--again")).isLeft)
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--minor", "--again")).isLeft)
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--twcs", "--again")) === Right(Main.Opts("compact",
      execute = true, twcs = true, again = true, keyspace = "ks1",
      table = "lineitem")))
    assert(Main.parse(Seq("repair", "ks1", "lineitem", "--matrix"))
      .isLeft) // --matrix requires --execute
    assert(Main.parse(Seq("repair", "ks1", "lineitem", "--execute",
      "--matrix")) === Right(Main.Opts("repair", execute = true,
      matrix = true, keyspace = "ks1", table = "lineitem")))
    assert(Main.parse(Seq("repair", "ks1", "lineitem", "--execute",
      "--matrix", "--mark")) === Right(Main.Opts("repair",
      execute = true, matrix = true, mark = true, keyspace = "ks1",
      table = "lineitem")))
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--twcs")) === Right(Main.Opts("compact", execute = true,
      twcs = true, keyspace = "ks1", table = "lineitem")))
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--sidecar-sized", "--leveled")).isLeft)
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--again")).isLeft)
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--minor", "--again")).isLeft)
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--promote")).isLeft)
    assert(Main.parse(Seq("compact", "--execute", "ks1", "lineitem",
      "--leveled", "--again", "--promote")).isLeft)
    assert(Main.parse(Seq("repair", "ks1", "lineitem", "--ranges",
      "--incremental")).isLeft)
    assert(Main.parse(Seq("repair", "ks1", "lineitem", "--execute",
      "--ranges")).isLeft)
    assert(Main.parse(Seq("repair", "ks1", "lineitem", "--mark")).isLeft)
    assert(Main.parse(Seq("repair", "ks1")).isLeft)
  }

  test("parse: -g overrides gc_grace; gcBefore = fixture NOW - gc_grace") {
    val g = Main.parse(Seq("purge", "-g", "43200000", "ks1", "lineitem"))
      .toOption.get
    assert(g.gcGraceS === Some(43200000L)) // 500 days
    assert(g.gcBeforeS === graft.sources.Fixtures.NowS - 43200000L)
    // default when absent
    val d = Main.parse(Seq("purge", "ks1", "lineitem")).toOption.get
    assert(d.gcBeforeS === graft.sources.Fixtures.GcBeforeS)
    // non-numeric / negative are usage errors
    assert(Main.parse(Seq("purge", "-g", "soon", "ks1", "lineitem")).isLeft)
    assert(Main.parse(Seq("purge", "-g", "-1", "ks1", "lineitem")).isLeft)
  }

  test("dispatch: each command renders its report sections") {
    def collect(args: String*): String = {
      val sb = new StringBuilder
      val o = Main.parse(args.toIndexedSeq).toOption.get
      assert(Main.run(spark, Sf0001, o, s => { sb.append(s); () }) === 0)
      sb.toString
    }
    assert(collect("summary").contains("Summary"))
    assert(collect("sstables", "ks1", "lineitem").contains("SSTables"))
    val ps = collect("pstats", "-n", "3", "ks1", "lineitem")
    assert(ps.contains("Partition size distribution") &&
      ps.contains("Largest partitions (top 3)"))
    assert(collect("cfstats", "ks1", "lineitem").contains("Totals"))
    assert(collect("purge", "-n", "2", "ks1", "lineitem")
      .contains("Most reclaimable partitions (top 2)"))
  }

  test("parse: extension commands dedup/pack/contaminate") {
    assert(Main.parse(Seq("dedup", "exact")) ===
      Right(Main.Opts("dedup", method = "exact")))
    assert(Main.parse(Seq("dedup", "-n", "5", "clusters")) ===
      Right(Main.Opts("dedup", topN = 5, method = "clusters")))
    assert(Main.parse(Seq("pack")) === Right(Main.Opts("pack")))
    assert(Main.parse(Seq("pack", "-l", "512")) ===
      Right(Main.Opts("pack", seqLen = 512)))
    assert(Main.parse(Seq("contaminate", "-n", "3")) ===
      Right(Main.Opts("contaminate", topN = 3)))
    // usage errors: unknown method, missing method, stray positional,
    // -l outside pack, bad -l value
    assert(Main.parse(Seq("dedup", "fuzzy")).isLeft)
    assert(Main.parse(Seq("dedup")).isLeft)
    assert(Main.parse(Seq("pack", "extra")).isLeft)
    assert(Main.parse(Seq("contaminate", "-l", "512")).isLeft)
    assert(Main.parse(Seq("pack", "-l", "0")).isLeft)
    assert(Main.parse(Seq("help", "dedup")) === Left(Main.usage("dedup")))
  }

  test("dispatch: extension commands render their reports") {
    def collect(args: String*): String = {
      val sb = new StringBuilder
      val o = Main.parse(args.toIndexedSeq).toOption.get
      assert(Main.run(spark, Sf0001, o, s => { sb.append(s); () }) === 0)
      sb.toString
    }
    assert(collect("dedup", "-n", "4", "exact").contains("Dedup (exact, top 4)"))
    assert(collect("dedup", "clusters").contains("Dedup (clusters, top 10)"))
    assert(collect("pack", "-l", "256").contains("Sequence packing (seq_len 256)"))
    assert(collect("contaminate").contains("Benchmark contamination (top 10)"))
    val verify = collect("verify")
    assert(verify.contains("Bloom filter membership (Filter.db)"))
    assert(verify.contains("Data.db digest verification (Digest.crc32)"))
    assert(verify.contains("Partition-index summary (Summary.db)"))
    assert(verify.contains("Promoted row index (Index.db)"))
    assert(collect("quality").contains("Quality filter survival by source"))
    assert(collect("canon", "-n", "3")
      .contains("Canonical documents (top 3 by dropped tokens)"))
    assert(collect("select", "-B", "50000")
      .contains("Token-budget selection (budget 50000)"))
    assert(collect("classify")
      .contains("Classifier quality survival by (lang, source)"))
    assert(collect("ingest")
      .contains("Incremental dedup (incoming vs base) by source"))
  }

  test("parse: classify/ingest grammar") {
    assert(Main.parse(Seq("classify")) === Right(Main.Opts("classify")))
    assert(Main.parse(Seq("ingest")) === Right(Main.Opts("ingest")))
    assert(Main.parse(Seq("classify", "extra")).isLeft)
    assert(Main.parse(Seq("ingest", "-l", "5")).isLeft)
    assert(Main.parse(Seq("help", "ingest")) === Left(Main.usage("ingest")))
  }

  test("parse: quality/canon/select grammar") {
    assert(Main.parse(Seq("quality")) === Right(Main.Opts("quality")))
    assert(Main.parse(Seq("canon", "-n", "7")) ===
      Right(Main.Opts("canon", topN = 7)))
    assert(Main.parse(Seq("select", "-B", "250000")) ===
      Right(Main.Opts("select", budgetTokens = 250000L)))
    // -B outside select, bad/zero budget, stray positionals
    assert(Main.parse(Seq("quality", "extra")).isLeft)
    assert(Main.parse(Seq("pack", "-B", "100")).isLeft)
    assert(Main.parse(Seq("select", "-B", "0")).isLeft)
    assert(Main.parse(Seq("select", "-B", "abc")).isLeft)
    assert(Main.parse(Seq("help", "select")) === Left(Main.usage("select")))
  }

  test("parse: scrub/chrome/bpe grammar") {
    assert(Main.parse(Seq("scrub")) === Right(Main.Opts("scrub")))
    assert(Main.parse(Seq("chrome")) === Right(Main.Opts("chrome")))
    assert(Main.parse(Seq("bpe", "-s", "2")) ===
      Right(Main.Opts("bpe", bpeSteps = 2)))
    // -s outside bpe, bad/zero steps, stray positionals
    assert(Main.parse(Seq("scrub", "extra")).isLeft)
    assert(Main.parse(Seq("chrome", "-s", "2")).isLeft)
    assert(Main.parse(Seq("bpe", "-s", "0")).isLeft)
    assert(Main.parse(Seq("bpe", "-s", "abc")).isLeft)
    assert(Main.parse(Seq("help", "bpe")) === Left(Main.usage("bpe")))
  }

  test("dispatch: scrub/chrome/bpe render their reports") {
    def collect(args: String*): String = {
      val sb = new StringBuilder
      val o = Main.parse(args.toIndexedSeq).toOption.get
      assert(Main.run(spark, Sf0001, o, s => { sb.append(s); () }) === 0)
      sb.toString
    }
    assert(collect("scrub").contains("PII scan by source"))
    assert(collect("chrome").contains("Boilerplate line removal by source"))
    assert(collect("bpe", "-s", "2").contains("BPE training trace (2 merges)"))
    assert(collect("lm").contains("LM surprisal scoring by source"))
    assert(Main.parse(Seq("lm")) === Right(Main.Opts("lm")))
    assert(Main.parse(Seq("lm", "extra")).isLeft)
    assert(collect("agree").contains("Filter agreement matrix"))
    assert(Main.parse(Seq("agree", "extra")).isLeft)
    assert(collect("search", "-n", "3")
      .contains("Keyword search (top 3 per query)"))
    assert(Main.parse(Seq("search", "extra")).isLeft)
    assert(collect("drift").contains("Corpus drift (TV x1e6) by source"))
    assert(Main.parse(Seq("drift", "extra")).isLeft)
    assert(collect("pipeline").contains("Curation funnel"))
    assert(Main.parse(Seq("pipeline", "extra")).isLeft)
    assert(collect("compact").contains("STCS compaction what-if"))
    assert(Main.parse(Seq("compact", "extra")).isLeft)
    assert(collect("tokenize", "-s", "2")
      .contains("BPE tokenization (2 merges) by source"))
    assert(Main.parse(Seq("tokenize", "-s", "0")).isLeft)
  }

  test("parse: verify takes no positionals") {
    assert(Main.parse(Seq("verify")) === Right(Main.Opts("verify")))
    assert(Main.parse(Seq("verify", "extra")).isLeft)
    assert(Main.parse(Seq("help", "verify")) === Left(Main.usage("verify")))
  }

  test("lookup: grammar requires <ks> <cf> <long key>; dispatch resolves " +
      "a real key through the bti tries and misses an absent one") {
    assert(Main.parse(Seq("lookup", "ks1", "lineitem", "42")) ===
      Right(Main.Opts("lookup", keyspace = "ks1", table = "lineitem",
        key = 42L)))
    assert(Main.parse(Seq("lookup", "ks1", "lineitem")).isLeft)
    assert(Main.parse(Seq("lookup", "ks1", "lineitem", "notakey")).isLeft)
    assert(Main.parse(Seq("help", "lookup")) === Left(Main.usage("lookup")))
    // a key that exists in the fixture set
    val key = graft.sources.Fixtures.liPscan(spark, Sf0001)
      .select("key").head.getLong(0)
    def collect(k: Long): String = {
      val sb = new StringBuilder
      val o = Main.parse(Seq("lookup", "ks1", "lineitem", k.toString))
        .toOption.get
      assert(Main.run(spark, Sf0001, o, s => { sb.append(s); () }) === 0)
      sb.toString
    }
    val hit = collect(key)
    assert(hit.contains(s"key=$key") && hit.contains("yes") &&
      hit.contains("direct"))
    val miss = collect(Long.MaxValue) // no fixture key reaches 2^63-1
    assert(miss.contains("no") && !miss.contains("yes"))
  }

  test("get: point-reads a present key off the real sstables and reports " +
      "bloom misses for an absent one") {
    assert(Main.parse(Seq("get", "ks1", "lineitem", "42")) ===
      Right(Main.Opts("get", keyspace = "ks1", table = "lineitem",
        key = 42L)))
    assert(Main.parse(Seq("get", "ks1", "lineitem")).isLeft)
    def collect(k: Long): String = {
      val sb = new StringBuilder
      val o = Main.parse(Seq("get", "ks1", "lineitem", k.toString))
        .toOption.get
      assert(Main.run(spark, Sf0001, o, s => { sb.append(s); () }) === 0)
      sb.toString
    }
    val key = graft.sources.Fixtures.liPscan(spark, Sf0001)
      .select("key").head.getLong(0)
    val hit = collect(key)
    assert(hit.contains(s"key=$key") && hit.contains("found"))
    val miss = collect(Long.MaxValue) // no fixture key reaches 2^63-1
    assert(!miss.contains("found") && miss.contains("miss"))
  }

  test("slice: grammar takes <ks> <cf> <key> <lo> <hi>; dispatch reads " +
      "only overlapping blocks and an out-of-domain slice reads none") {
    assert(Main.parse(Seq("slice", "ks1", "lineitem", "3", "0", "500")) ===
      Right(Main.Opts("slice", keyspace = "ks1", table = "lineitem",
        key = 3L, sliceLo = 0L, sliceHi = 500L)))
    assert(Main.parse(Seq("slice", "ks1", "lineitem", "3")).isLeft)
    def collect(k: Long, lo: Long, hi: Long): String = {
      val sb = new StringBuilder
      val o = Main.parse(Seq("slice", "ks1", "lineitem", k.toString,
        lo.toString, hi.toString)).toOption.get
      assert(Main.run(spark, Sf0001, o, s => { sb.append(s); () }) === 0)
      sb.toString
    }
    val hit = collect(3L, 0L, 500L)
    assert(hit.contains("range=[0, 500]"))
    // some sstable read >= 1 block for the wide key 3 low band
    assert(hit.linesIterator.exists(l =>
      l.contains("nb-") && !l.contains("| 0 |")))
    val empty = collect(3L, 900000000L, 900000999L)
    // out-of-domain range: zero blocks in every row
    assert(empty.linesIterator.filter(_.contains("nb-"))
      .forall(_.matches(".*\\|\\s*0\\s*\\|\\s*0\\s*\\|\\s*0\\s*\\|.*")))
  }

  test("dispatch: unknown column family is a usage failure (rc 2)") {
    val sb = new StringBuilder
    val o = Main.parse(Seq("pstats", "ks9", "nope")).toOption.get
    assert(Main.run(spark, Sf0001, o, s => { sb.append(s); () }) === 2)
    assert(sb.toString.contains("Unknown column family: ks9.nope"))
  }

  // GOLDEN end-to-end reports (VERDICT r9 ask #5): the COMPLETE composed
  // ASCII output of all five reference commands at sf0.001, frozen
  // byte-for-byte. The TableBuilder alignment rules are unit-tested
  // elsewhere; these pin the full section composition, ordering, number
  // formatting and sentinel rendering end to end — any drift in any
  // report stage surfaces as a one-line diff here. Regenerate
  // deliberately with GRAFT_REGEN_GOLDEN=1 sbt "testOnly *CliMainSpec*".
  private val goldenCommands = Seq(
    "summary" -> Seq("summary"),
    "sstables" -> Seq("sstables", "ks1", "lineitem"),
    "pstats" -> Seq("pstats", "ks1", "lineitem"),
    "cfstats" -> Seq("cfstats", "ks1", "lineitem"),
    "purge" -> Seq("purge", "ks1", "lineitem"),
    // beyond the reference's five: the binary access paths end to end —
    // integrity sweep, bti trie lookup, big-format point get and
    // clustering slice (positions/counts are pure functions of the
    // deterministic fixture content, so the bytes freeze cleanly)
    "verify" -> Seq("verify"),
    "lookup" -> Seq("lookup", "ks1", "lineitem", "42"),
    "get" -> Seq("get", "ks1", "lineitem", "42"),
    "slice" -> Seq("slice", "ks1", "lineitem", "3", "0", "500"),
    "compact" -> Seq("compact"),
    // the EXECUTE path (round 11): real compaction run at a non-default
    // gc_grace (500 days -> gcBefore day 3500, more droppable than the
    // read-only what-if's default) and its output rollup frozen
    "compact_execute" ->
      Seq("compact", "--execute", "ks1", "lineitem", "-g", "43200000"),
    // the PRODUCTION sizing path (round 13): fan-out from the sidecar
    // data_length sum — at sf0.001 both sizings compute one shard, so
    // the rollup body matches compact_execute and only the header names
    // the sizing source
    "compact_execute_sidecar" ->
      Seq("compact", "--execute", "ks1", "lineitem", "-g", "43200000",
        "--sidecar-sized"),
    // size-tiered MINOR compaction (round 13): selection + conservative
    // purge, per-unit rollup frozen at the default gc
    "compact_execute_minor" ->
      Seq("compact", "--execute", "ks1", "lineitem", "--minor"),
    // leveled compaction (round 13): L0 + overlapping L1 partners,
    // range-repartitioned outputs, disjoint passthrough
    "compact_execute_leveled" ->
      Seq("compact", "--execute", "ks1", "lineitem", "--leveled"),
    // the anti-entropy cycle (round 13): digest comparison + repair
    // marking, both halves' rollups frozen
    "repair" -> Seq("repair", "ks1", "lineitem"),
    // round 14: the re-ingestion round (level stamps consumed), the
    // ranges-to-stream relation and the incremental (repaired-skipping)
    // digest, each frozen
    "compact_execute_leveled_again" ->
      Seq("compact", "--execute", "ks1", "lineitem", "--leveled",
        "--again"),
    "repair_ranges" -> Seq("repair", "ks1", "lineitem", "--ranges"),
    "repair_incremental" ->
      Seq("repair", "ks1", "lineitem", "--incremental"),
    // sstableexpiredblockers (round 14): expiry + overlap decided from
    // the real sidecars of the TWCS-banded set
    "blockers" -> Seq("blockers", "ks1", "lineitem"),
    // sstablesplit (round 14): the largest sstable quartered in key
    // order, partitions intact, shards read back from the real files
    "split" -> Seq("split", "ks1", "lineitem"),
    // sstablelevelreset (round 14): per-level counts flip, data intact
    "levelreset" -> Seq("levelreset", "ks1", "lineitem"),
    // the EXECUTED repair loop (round 14): diverge -> detect -> stream
    // real sstables both ways -> converge, per-leaf relation frozen
    "repair_execute" -> Seq("repair", "ks1", "lineitem", "--execute"),
    // multi-level LCS (round 14): the 4-step promotion chain's final
    // level-stamped state frozen
    "compact_execute_leveled_promote" ->
      Seq("compact", "--execute", "ks1", "lineitem", "--leveled",
        "--promote"),
    // the repair session's closing act (round 14): converge, mark,
    // nothing left for the next incremental digest
    "repair_execute_mark" ->
      Seq("repair", "ks1", "lineitem", "--execute", "--mark"),
    // the LCS what-if planner (round 14): read-only counterpart of the
    // STCS what-if, over the multi-level final state
    "compact_leveled_whatif" -> Seq("compact", "--leveled"),
    // executed TWCS (round 15): drop/blocked/merge/passthrough branches
    // of the time-window cycle, per-unit rollup frozen
    "compact_execute_twcs" ->
      Seq("compact", "--execute", "ks1", "lineitem", "--twcs"),
    // three-replica matrix repair (round 15): per-leaf direction
    // matrix + all three convergence flags frozen
    "repair_execute_matrix" ->
      Seq("repair", "ks1", "lineitem", "--execute", "--matrix"),
    // TWCS what-if (round 15): the read-only decision table
    "compact_twcs_whatif" -> Seq("compact", "--twcs"),
    // TWCS re-ingestion (round 15): the compacted state's steady state
    "compact_execute_twcs_again" ->
      Seq("compact", "--execute", "ks1", "lineitem", "--twcs",
        "--again"),
    // matrix mark cycle (round 15): all 3 replicas marked, zero reads
    "repair_execute_matrix_mark" ->
      Seq("repair", "ks1", "lineitem", "--execute", "--matrix",
        "--mark"),
    // sstableupgrade (round 16): 'nb' -> 'oa' version rewrite, data
    // byte-identical, new fields carrying the derivable values
    "upgrade" -> Seq("upgrade", "ks1", "lineitem"),
    // the unified planner (round 16): one verb, strategy detected from
    // each state's own sidecars, per-strategy decision tables
    "compact_plan" -> Seq("compact", "--plan"),
    // sstablescrub (round 16): digest verdict, skipped partition,
    // salvaged counts off the rewritten files
    "salvage" -> Seq("salvage", "ks1", "lineitem"),
    // sstableofflinerelevel (round 16): first-fit runs, volume-ranked
    // levels, rewritten sidecars re-read + invariant-checked
    "relevel" -> Seq("relevel", "ks1", "lineitem"),
    // UCS what-if (round 16): density, ladder ratio, level and next
    // action per sstable — the read-only decision table
    "compact_ucs_whatif" -> Seq("compact", "--ucs"),
    // executed UCS (round 16): the tiered level-0 merge's 4 shard
    // outputs, the leveled overlap-island merge, disjoint passthrough
    "compact_execute_ucs" ->
      Seq("compact", "--execute", "ks1", "lineitem", "--ucs"),
    // sstableloader (round 16): ring ownership x RF replication, each
    // received view verified digest-by-digest against the corpus
    "load" -> Seq("load", "ks1", "lineitem"),
    // sstablerepairedset (round 16): stamps withdrawn from half the
    // marked node; the incremental digest re-opens exactly those files
    "repairedset" -> Seq("repairedset", "ks1", "lineitem"),
    // sstabledowngrade (round 16): the full version cycle reproduces
    // the original 'nb' files bit-for-bit
    "downgrade" -> Seq("downgrade", "ks1", "lineitem"),
    // UCS re-ingestion (round 16): the compacted state's re-derived
    // ladder — steady state, nothing selects
    "compact_execute_ucs_again" ->
      Seq("compact", "--execute", "ks1", "lineitem", "--ucs",
        "--again"),
    // nodetool cleanup (round 16): the ring doubles; retained views
    // partition the ring, dropped volume accounted per node
    "cleanup" -> Seq("cleanup", "ks1", "lineitem"),
    // node bootstrap (round 16): the doubled cluster converges to a
    // full RF=2 ring, every view digest-matching the corpus
    "bootstrap" -> Seq("bootstrap", "ks1", "lineitem"),
    // sstablepartitions (round 16): the per-sstable threshold report
    "partitions" -> Seq("partitions", "ks1", "lineitem"),
    // nodetool garbagecollect (round 16): single-sstable compaction,
    // per-file reclaim split off the real rewritten bytes
    "garbagecollect" -> Seq("garbagecollect", "ks1", "lineitem"),
    // nodetool decommission (round 16): the shrink side of the
    // topology family — RF=2 restored, neighbors-only blast radius
    "decommission" -> Seq("decommission", "ks1", "lineitem"),
    // nodetool removenode (round 16): the dead-node shrink — each
    // under-replicated range re-replicates survivor-to-survivor
    "removenode" -> Seq("removenode", "ks1", "lineitem"),
    // nodetool move (round 16): the token shift — gained ranges stream
    // in, lost ranges cleaned away, RF=2 kept everywhere
    "move" -> Seq("move", "ks1", "lineitem"),
    // commitlog (round 16): the WAL segment report + the recovered
    // flush state — CRC-verified replay through the real sink
    "commitlog" -> Seq("commitlog", "ks1", "lineitem"),
    // hinted handoff (round 16): per-coordinator hint files replayed,
    // retained + hinted reassembling the corpus
    "hints" -> Seq("hints", "ks1", "lineitem"),
    // nodetool rebuild (round 16): DC2 joins at NTS RF=1, streaming
    // each quarter from its DC1 primary
    "rebuild" -> Seq("rebuild", "ks1", "lineitem"),
    // blocking read repair (round 16): the per-read diff converges the
    // read cohort; unread partitions stay divergent
    "readrepair" -> Seq("readrepair", "ks1", "lineitem"),
    // batchlog (round 16): interrupted batches replay to completion
    "batchlog" -> Seq("batchlog", "ks1", "lineitem"),
    // merkle descent (round 16): log-cost divergence localization
    "merkle" -> Seq("merkle", "ks1", "lineitem"),
    // materialized view (round 16): covered reads, write-path deltas
    "mview" -> Seq("mview", "ks1", "lineitem"),
    // snapshot + restore (round 16): hard links surviving compaction
    "snapshot" -> Seq("snapshot", "ks1", "lineitem"),
    // lightweight transactions (round 16): per-partition CAS chains
    "cas" -> Seq("cas", "ks1", "lineitem"),
    // distributed counters (round 16): max-clock shard merge
    "counters" -> Seq("counters", "ks1", "lineitem"),
    // incremental backup (round 16): snapshot + flush-time links
    "backup" -> Seq("backup", "ks1", "lineitem"),
    // vnode ring (round 17): pending-ranges calculus + executed
    // decommission at 4 tokens per node
    "vnodes" -> Seq("vnodes", "ks1", "lineitem"),
    // index-summary redistribution (round 19): memory-pressure
    // downsampling, level-invariant point-read checksums
    "summaryredist" -> Seq("summaryredist", "ks1", "lineitem"))

  for ((name, args) <- goldenCommands)
    test(s"golden report: $name output matches the frozen fixture " +
        "byte-for-byte") {
      val sb = new StringBuilder
      val o = Main.parse(args.toIndexedSeq).toOption.get
      assert(Main.run(spark, Sf0001, o, s => { sb.append(s); () }) === 0)
      val got = sb.toString
      val golden = java.nio.file.Paths.get(
        "src/test/resources/golden", s"$name.txt")
      if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
        java.nio.file.Files.createDirectories(golden.getParent)
        java.nio.file.Files.write(golden,
          got.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } else {
        assert(java.nio.file.Files.exists(golden),
          s"golden fixture missing: $golden (regenerate with GRAFT_REGEN_GOLDEN=1)")
        val want = new String(java.nio.file.Files.readAllBytes(golden),
          java.nio.charset.StandardCharsets.UTF_8)
        if (got != want) {
          val gl = got.linesIterator.toVector
          val wl = want.linesIterator.toVector
          val firstDiff = gl.zipAll(wl, "<EOF>", "<EOF>")
            .indexWhere { case (a, b) => a != b }
          fail(s"golden mismatch for $name at line ${firstDiff + 1}:\n" +
            s"  got:  ${gl.lift(firstDiff).getOrElse("<EOF>")}\n" +
            s"  want: ${wl.lift(firstDiff).getOrElse("<EOF>")}")
        }
      }
    }
}
