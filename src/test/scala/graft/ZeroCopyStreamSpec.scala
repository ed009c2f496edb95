package graft

import graft.ops.ZeroCopyStream

/** Round 17: entire-sstable (zero-copy) streaming — covered files
  * link, partial files rewrite, convergence is transport-blind. */
class ZeroCopyStreamSpec extends SparkSpec {

  test("plan: coverage decided per file off the Summary sidecars") {
    val plan = ZeroCopyStream.plan(spark, Sf0001).toMap
    // three isolated singles + the fully-covered pair link whole
    assert(plan(3201L) === "linked") // range 1
    assert(plan(3204L) === "linked") // range 4
    assert(plan(3205L) === "linked") // range 5
    assert(plan(ZeroCopyStream.PairGenA) === "linked") // ranges 12-13
    // the 14-15 pair is only half requested: rewrite
    assert(plan(ZeroCopyStream.PairGenB) === "rewritten")
    // unrequested singles move nothing
    assert(plan(3200L) === "skipped")
    assert(plan.values.count(_ == "linked") === 4)
    assert(plan.values.count(_ == "rewritten") === 1)
    assert(plan.values.count(_ == "skipped") === 9)
  }

  test("linked components are the SAME file (zero bytes copied)") {
    val sliced = new java.io.File(ZeroCopyStream.ensureSliced(spark, Sf0001))
    val recv = new java.io.File(ZeroCopyStream.ensureStreamed(spark, Sf0001))
    val linkedGens = Seq(3202L, 3205L, 3206L, 3251L) // nb gen = code + 1
    linkedGens.foreach { g =>
      val comps = Option(recv.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(s"nb-$g-big"))
      assert(comps.nonEmpty, s"no linked components for nb-$g-big")
      comps.foreach { f =>
        val src = new java.io.File(sliced, f.getName)
        assert(java.nio.file.Files.isSameFile(f.toPath, src.toPath),
          s"${f.getName} is not a hard link of the source")
      }
      // a complete sstable arrived: Data.db plus its sidecars
      assert(comps.exists(_.getName.endsWith("-Data.db")))
      assert(comps.exists(_.getName.endsWith("-Index.db")))
      assert(comps.exists(_.getName.endsWith("-Statistics.db")))
    }
    // the rewritten remainder is a NEW file, not a link
    val rw = new java.io.File(recv,
      s"nb-${ZeroCopyStream.RewriteGen + 1}-big-Data.db")
    assert(rw.isFile)
    assert(!new java.io.File(sliced, rw.getName).exists())
  }

  test("convergence is transport-blind: every range digest-verified") {
    val rows = ZeroCopyStream.roundtrip(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("token_range")).toSeq ===
      ZeroCopyStream.TransferRanges.toSeq.sorted)
    assert(rows.forall(_.getAs[Boolean]("verified")))
    val byOrigin = rows.groupBy(_.getAs[String]("origin"))
      .view.mapValues(_.map(_.getAs[Long]("token_range")).toSet).toMap
    assert(byOrigin("linked") === Set(1L, 4L, 5L, 12L, 13L))
    assert(byOrigin("rewritten") === Set(14L))
    // the rewritten path shipped only the requested half of its file:
    // range 15 never arrives
    val recvd = graft.sources.datadb.DataDb.cells(spark,
        ZeroCopyStream.ensureStreamed(spark, Sf0001),
        format = graft.sources.datadb.DataDbScan.FormatCassandra)
    import org.apache.spark.sql.functions._
    val ranges = recvd.select(
        shiftright(graft.ops.AntiEntropy.token(col("key")),
          ZeroCopyStream.SlotShift).as("r"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(ranges === ZeroCopyStream.TransferRanges)
  }
  test("planning economy: the partial-rewrite source prunes to its file") {
    import org.apache.spark.sql.functions._
    import graft.sources.datadb.{DataDb, DataDbScan}
    val sliced = ZeroCopyStream.ensureSliced(spark, Sf0001)
    val full = DataDb.cells(spark, sliced,
      format = DataDbScan.FormatCassandra)
    val partial = full.where(col("sstable_id").isin(
      s"nb-${ZeroCopyStream.PairGenB + 1}-big"))
    assert(partial.rdd.getNumPartitions < full.rdd.getNumPartitions,
      "the rewrite source must prune to the partial file at planning")
  }

  test("round 19 (ADVICE r18 / VERDICT r18 Next #5): an occupied range " +
      "whose every partition dodges the sample grid cannot slip a file " +
      "into 'linked' — candidate occupancy is confirmed off Index.db") {
    import org.apache.spark.sql.functions._
    val shift = ZeroCopyStream.SlotShift
    val interval = graft.sources.datadb.CassandraDataFixture.MinIndexInterval
    // slot of every candidate key under the production tokenizer
    val slots = spark.range(0, 4000)
      .select(col("id"), shiftright(
        graft.ops.AntiEntropy.token(col("id")), shift).as("slot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // victim slot S = the most key-rich slot, so the greedy pick below
    // always finds material
    val s = slots.groupBy(_._2).maxBy(_._2.length)._1
    // build an ASCENDING key list (ascending = the sink's write order =
    // the summary's sample order) where every SAMPLED position (each
    // interval-th partition, which covers the header's first/last too)
    // avoids S and exactly one interior UNSAMPLED position carries S
    val n = 2 * interval + 1
    val it = slots.iterator
    val picked = (0 until n).map { p =>
      val needS = p == 1 // interior, not ≡0 mod interval, not last
      it.find(kv => (kv._2 == s) == needS)
        .getOrElse(fail(s"candidate pool exhausted at position $p"))._1
    }
    assert(picked === picked.sorted, "greedy pick must stay ascending")
    // one real sstable through the production sink
    val out = graft.sources.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft-occfix"))
    import spark.implicits._
    picked.toDF("key")
      .select(lit("sst-900").as("sstable_id"), col("key"),
        lit(0L).as("clustering"), lit("c0").as("column_name"),
        lit("CELL").as("kind"), lit(1000L).as("timestamp_us"),
        lit(-1L).as("ttl_s"), lit(2147483647L).as("local_deletion_time_s"),
        lit(false).as("is_tombstone"), lit(false).as("is_expiring"),
        lit(10L).as("size_bytes"))
      .write.format("sstable-data")
      .option("path", out.toString).option("compressed", "true")
      .mode("append").save()
    val gen = 901L // sink id "sst-900" → file nb-901-big → generation 901
    val sampledOcc = graft.ops.SummaryCoverage
      .occupiedRanges(spark, out.toString, shift)(gen)
    val confirmedOcc = graft.ops.SummaryCoverage
      .confirmOccupied(spark, out.toString, shift, Set(gen))(gen)
    // the sample grid is blind to S; the Index.db confirm is not
    assert(!sampledOcc.contains(s),
      "fixture defeated: the sample grid saw the victim slot")
    assert(confirmedOcc.contains(s))
    // the exact flip the advice warned about: a request covering the
    // SAMPLED occupancy would have linked the whole file (shipping the
    // S rows to a joiner that never asked for them); the confirmed
    // occupancy demotes it to the safe rewrite
    val requested = sampledOcc
    assert(sampledOcc.subsetOf(requested))
    assert(!confirmedOcc.subsetOf(requested))
  }

  test("round 19 planning economy: the occupancy confirm opens ONLY the " +
      "candidate files — the isin stays on the raw sstable_id and " +
      "prunes at planning") {
    import org.apache.spark.sql.functions._
    val sliced = ZeroCopyStream.ensureSliced(spark, Sf0001)
    val full = graft.sources.indexdb.IndexDb.read(spark, sliced)
    val candidates = Set(3202L, 3205L) // two of the 14 sliced files
    val confirm = graft.ops.SummaryCoverage.confirmScan(
      spark, sliced, ZeroCopyStream.SlotShift, candidates)
    // file-granular planning: one input partition per surviving file
    assert(confirm.rdd.getNumPartitions === candidates.size)
    assert(confirm.rdd.getNumPartitions < full.rdd.getNumPartitions,
      "the confirm must prune files at planning, not filter rows")
    val plan = confirm.queryExecution.executedPlan.toString
    assert(plan.contains("In(sstable_id") ||
      plan.contains("EqualTo(sstable_id"),
      s"no pushed sstable_id predicate:\n${plan.take(800)}")
    // and it returns exactly the candidates' rows
    assert(confirm.select(col("sstable_id")).distinct()
      .collect().map(_.getString(0)).toSet ===
      candidates.map(g => s"nb-$g-big"))
  }

  test("round 18: summary-planned occupancy equals the full Index.db " +
      "occupancy, at a fraction of the input rows") {
    import org.apache.spark.sql.functions._
    val sliced = ZeroCopyStream.ensureSliced(spark, Sf0001)
    // the authoritative (every-partition) occupancy off Index.db — the
    // sampled summary plan must reach the SAME disposition for every
    // file (pins both ADVICE r17's interior-gap concern and sampling
    // adequacy; an occupancy undercount would flip a pair file)
    val tokenOf = shiftright(graft.functions.PortableHash.h60(
      graft.sources.BinaryKeys.beLong(col("key")).cast("string")),
      ZeroCopyStream.SlotShift)
    val fullOcc = graft.sources.indexdb.IndexDb.read(spark, sliced)
      .select(col("sstable_id"), tokenOf.as("r"))
      .groupBy("sstable_id").agg(collect_set("r").as("rs"))
      .collect()
      .map { row =>
        val gen = "nb-(\\d+)-big".r.findFirstMatchIn(row.getString(0))
          .get.group(1).toLong - 1L
        gen -> row.getSeq[Long](1).toSet
      }.toMap
    val expected = fullOcc.map { case (g, touched) =>
      g -> (if (touched.subsetOf(ZeroCopyStream.TransferRanges)) "linked"
        else if (touched.exists(ZeroCopyStream.TransferRanges)) "rewritten"
        else "skipped")
    }
    assert(ZeroCopyStream.plan(spark, Sf0001).toMap === expected)
    // economy: the summary relation hands the planner ~1/4 of the
    // index's rows (MinIndexInterval sampling), never a Data.db byte
    val summaryRows = spark.read.format("sstable-summary").load(sliced)
      .count()
    val indexRows = graft.sources.indexdb.IndexDb.read(spark, sliced)
      .count()
    assert(summaryRows * 2 < indexRows,
      s"summary $summaryRows rows should be well under index $indexRows")
  }
}
