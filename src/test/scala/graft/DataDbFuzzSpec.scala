package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataOutputStream}

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.datadb.{CassandraDataFormat => F, DataDbFormat => E}
import graft.sources.datadb.CassandraDataFormat.{ColumnSpec, SerializationHeaderInfo, WriteCell, WriteMarker, WriteRow, WriteStaticRow, WriteUnfiltered}

/** Property fuzzing of the Data.db codec itself (round 18, VERDICT r17
  * ask #4 — the largest parser, the one every scan trusts, was the one
  * reader family without property fuzz). Same template as
  * [[SidecarFuzzSpec]]:
  *
  *  - **roundtrip**: arbitrary generated partitions (rows with
  *    simple/complex/counter/fixed/variable cells, pk liveness, row
  *    and complex deletions, static rows, range markers and
  *    boundaries, partition deletions) write through the production
  *    [[F.Writer]] and must parse back — via [[F.events]] — to exactly
  *    the event list an INDEPENDENT model derives from the generated
  *    structures (field-exact, value bytes included);
  *  - **flips**: any flipped byte either parses (values bounded by the
  *    reader's explicit guards) or raises a typed IOException — never
  *    a crash-class failure or an unbounded allocation (the real
  *    format carries no CRC in the row stream, faithful to Cassandra);
  *  - **truncation**: every strict prefix either fails closed or
  *    parses to a clean PREFIX of the full event list (a cut exactly
  *    on a partition boundary is a valid shorter file).
  *
  * Deterministic seeds throughout. */
final class DataDbFuzzSpec extends AnyFunSuite {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val P = F.Marshal.Prefix

  private def check[A](gen: Gen[A], runs: Int)(body: (A, Int) => Unit): Unit =
    (0 until runs).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(52118L + i)), i)
    }

  // ------------------------------------------------------------------
  // generators

  private def bytesGen(min: Int, max: Int): Gen[Array[Byte]] =
    Gen.choose(min, max).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)).map(_.toArray))

  private val SimpleTypes = Seq(
    P + "LongType", P + "Int32Type", P + "BooleanType", P + "DoubleType",
    P + "ShortType", P + "UTF8Type", P + "BytesType",
    P + "CounterColumnType", P + "EmptyType")

  private val ComplexTypes = Seq(
    P + s"SetType(${P}UTF8Type)",
    P + s"MapType(${P}UTF8Type,${P}LongType)",
    P + s"ListType(${P}Int32Type)",
    P + s"MapType(${P}BytesType,${P}BytesType)")

  private def specsGen(n: Int, prefix: String): Gen[Vector[ColumnSpec]] =
    Gen.listOfN(n, Gen.oneOf(SimpleTypes ++ ComplexTypes)).map { types =>
      types.zipWithIndex.map { case (t, i) =>
        ColumnSpec(s"$prefix$i".getBytes(Utf8), t)
      }.toVector
    }

  private val headerGen: Gen[SerializationHeaderInfo] = for {
    minTs <- Gen.choose(0L, 1L << 40)
    minLdt <- Gen.choose(0L, 1L << 28)
    minTtl <- Gen.choose(0L, 1L << 16)
    nReg <- Gen.choose(1, 5)
    regs <- specsGen(nReg, "c")
    nStat <- Gen.choose(0, 2)
    stats <- specsGen(nStat, "s")
  } yield SerializationHeaderInfo(minTs, minLdt, minTtl,
    P + "BytesType", Seq(P + "LongType"), stats, regs)

  /** A value the WRITER accepts for this spec: exact fixed length or a
    * variable-length blob; empty sometimes (→ CellHasEmptyValue). */
  private def valueGen(spec: ColumnSpec): Gen[Array[Byte]] = {
    val fixed = spec.valueFixedLen
    if (spec.valueAbsent || fixed == 0) Gen.const(Array.emptyByteArray)
    else if (fixed > 0) Gen.oneOf(
      bytesGen(fixed, fixed), Gen.const(Array.emptyByteArray))
    else Gen.oneOf(bytesGen(1, 24), Gen.const(Array.emptyByteArray))
  }

  private def cellGen(h: SerializationHeaderInfo, spec: ColumnSpec,
      colIdx: Int): Gen[WriteCell] = for {
    deleted <- Gen.frequency(4 -> false, 1 -> true)
    expiring <- Gen.frequency(3 -> false, 1 -> true)
    ts <- Gen.choose(h.minTimestampUs, h.minTimestampUs + (1L << 40))
    ldt <- Gen.choose(h.minLocalDeletionTimeS,
      h.minLocalDeletionTimeS + (1L << 28))
    ttl <- Gen.choose(h.minTtlS, h.minTtlS + (1L << 16))
    path <- bytesGen(0, 12)
    value <- valueGen(spec)
  } yield WriteCell(colIdx, path, deleted, expiring, ts, ttl, ldt, value)

  private def metaGen(h: SerializationHeaderInfo)
      : Gen[(Option[(Long, Long, Long)], Option[(Long, Long)],
        Option[(Long, Long)])] = for {
    pk <- Gen.option(for {
      ts <- Gen.choose(h.minTimestampUs, h.minTimestampUs + (1L << 40))
      ttl <- Gen.frequency(1 -> Gen.const(-1L),
        2 -> Gen.choose(h.minTtlS, h.minTtlS + (1L << 16)))
      ldt <- Gen.choose(h.minLocalDeletionTimeS,
        h.minLocalDeletionTimeS + (1L << 28))
    } yield (ts, ttl, ldt))
    del <- Gen.option(Gen.zip(
      Gen.choose(h.minTimestampUs, h.minTimestampUs + (1L << 40)),
      Gen.choose(h.minLocalDeletionTimeS,
        h.minLocalDeletionTimeS + (1L << 28))))
    cdel <- Gen.option(Gen.zip(
      Gen.choose(h.minTimestampUs, h.minTimestampUs + (1L << 40)),
      Gen.choose(h.minLocalDeletionTimeS,
        h.minLocalDeletionTimeS + (1L << 28))))
  } yield (pk, del, cdel)

  private def rowGen(h: SerializationHeaderInfo): Gen[WriteRow] = {
    val regs = h.regularColumns
    for {
      clustering <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      chosen <- Gen.someOf(regs.indices)
      cellLists <- Gen.sequence[List[List[WriteCell]], List[WriteCell]](
        chosen.toList.sorted.map { idx =>
          if (regs(idx).isComplex)
            Gen.choose(1, 3).flatMap(k =>
              Gen.listOfN(k, cellGen(h, regs(idx), idx)))
          else cellGen(h, regs(idx), idx).map(List(_))
        })
      emptyComplex <- Gen.someOf(
        regs.indices.filter(regs(_).isComplex))
      meta <- metaGen(h)
    } yield WriteRow(clustering, cellLists.flatten,
      pkLiveness = meta._1, rowDeletion = meta._2,
      complexDeletion = meta._3, emptyComplexColumns = emptyComplex.toSeq)
  }

  private def staticGen(h: SerializationHeaderInfo): Gen[WriteStaticRow] = {
    val stats = h.staticColumns
    for {
      chosen <- Gen.someOf(stats.indices)
      cellLists <- Gen.sequence[List[List[WriteCell]], List[WriteCell]](
        chosen.toList.sorted.map { idx =>
          if (stats(idx).isComplex)
            Gen.choose(1, 2).flatMap(k =>
              Gen.listOfN(k, cellGen(h, stats(idx), idx)))
          else cellGen(h, stats(idx), idx).map(List(_))
        })
      meta <- metaGen(h)
    } yield WriteStaticRow(cellLists.flatten,
      pkLiveness = meta._1, rowDeletion = meta._2,
      complexDeletion = meta._3)
  }

  private def markerGen(h: SerializationHeaderInfo): Gen[WriteMarker] = for {
    clustering <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    kind <- Gen.oneOf(F.KindExclEndBound, F.KindInclStartBound,
      F.KindExclEndInclStartBoundary, F.KindInclEndExclStartBoundary,
      F.KindInclEndBound, F.KindExclStartBound)
    ts <- Gen.choose(h.minTimestampUs, h.minTimestampUs + (1L << 40))
    ldt <- Gen.choose(h.minLocalDeletionTimeS,
      h.minLocalDeletionTimeS + (1L << 28))
  } yield WriteMarker(clustering, kind, ts, ldt)

  private final case class GenPartition(key: Array[Byte],
      deletion: Option[(Long, Long)], unfiltereds: List[WriteUnfiltered])

  private def partitionGen(h: SerializationHeaderInfo): Gen[GenPartition] =
    for {
      key <- bytesGen(0, 20)
      deletion <- Gen.option(Gen.zip(
        Gen.choose(0L, 1L << 50), Gen.choose(0L, Int.MaxValue - 1L)))
      static <-
        if (h.staticColumns.nonEmpty)
          Gen.option(staticGen(h)).map(_.toList)
        else Gen.const(Nil)
      n <- Gen.choose(0, 6)
      body <- Gen.listOfN(n, Gen.frequency(
        3 -> rowGen(h).map(u => u: WriteUnfiltered),
        1 -> markerGen(h).map(u => u: WriteUnfiltered)))
    } yield GenPartition(key, deletion, static ++ body)

  private val fileGen: Gen[(SerializationHeaderInfo, List[GenPartition])] =
    for {
      h <- headerGen
      n <- Gen.choose(1, 4)
      parts <- Gen.listOfN(n, partitionGen(h))
    } yield (h, parts)

  // ------------------------------------------------------------------
  // the independent model: expected events from the generated structures

  private final case class Ev(key: Seq[Byte], clustering: Long,
      column: String, kind: Int, flags: Int, ts: Long, ttl: Long,
      ldt: Long, size: Long, value: Option[Seq[Byte]])

  private def cellEv(key: Array[Byte], clustering: Long, spec: ColumnSpec,
      kind: Int, c: WriteCell): Ev = {
    val hasValue = !spec.valueAbsent && !c.isDeleted && c.value != null &&
      c.value.length > 0
    val size = if (hasValue) c.value.length.toLong else 0L
    val value =
      if (c.isDeleted) None
      else if (hasValue) Some(c.value.toSeq)
      else Some(Seq.empty[Byte])
    Ev(key.toSeq, clustering, spec.name, kind,
      E.flagsOf(c.isDeleted, c.isExpiring, spec.isCounter, !c.isDeleted),
      c.timestampUs,
      if (c.isExpiring) c.ttlS else F.NoTtlS,
      if (c.isDeleted || c.isExpiring) c.localDeletionTimeS
      else F.NoDeletionTimeS,
      size, value)
  }

  private def rowLike(key: Array[Byte], clustering: Long, cellKind: Int,
      columns: Seq[ColumnSpec], cells: Seq[WriteCell],
      pk: Option[(Long, Long, Long)], del: Option[(Long, Long)],
      cdel: Option[(Long, Long)], emptyComplex: Seq[Int]): List[Ev] = {
    val out = List.newBuilder[Ev]
    pk.foreach { case (ts, ttl, ldt) =>
      val hasTtl = ttl >= 0
      out += Ev(key.toSeq, clustering, "", E.KindCodeRowLiveness,
        E.flagsOf(tombstone = false, expiring = hasTtl, counter = false,
          live = true),
        ts, if (hasTtl) ttl else F.NoTtlS,
        if (hasTtl) ldt else F.NoDeletionTimeS, 0L, None)
    }
    del.foreach { case (ts, ldt) =>
      out += Ev(key.toSeq, clustering, "", E.KindCodeRowDeletion,
        E.flagsOf(tombstone = true, expiring = false, counter = false,
          live = false), ts, F.NoTtlS, ldt, 0L, None)
    }
    val present = (cells.map(_.columnIdx) ++ emptyComplex).distinct.sorted
    present.foreach { colIdx =>
      if (columns(colIdx).isComplex) {
        cdel.foreach { case (ts, ldt) =>
          out += Ev(key.toSeq, clustering, columns(colIdx).name,
            E.KindCodeComplexDeletion,
            E.flagsOf(tombstone = true, expiring = false, counter = false,
              live = false), ts, F.NoTtlS, ldt, 0L, None)
        }
        cells.filter(_.columnIdx == colIdx).foreach(c =>
          out += cellEv(key, clustering, columns(colIdx), cellKind, c))
      } else out += cellEv(key, clustering, columns(colIdx), cellKind,
        cells.find(_.columnIdx == colIdx).get)
    }
    out.result()
  }

  private def expectedEvents(h: SerializationHeaderInfo,
      parts: List[GenPartition]): List[Ev] =
    parts.flatMap { p =>
      val head = p.deletion.map { case (mfda, ldt) =>
        Ev(p.key.toSeq, E.PartitionClustering, "",
          E.KindCodePartitionDeletion,
          E.flagsOf(tombstone = true, expiring = false, counter = false,
            live = false), mfda, F.NoTtlS, ldt, 0L, None)
      }.toList
      head ++ p.unfiltereds.flatMap {
        case r: WriteRow =>
          rowLike(p.key, r.clustering, E.KindCodeCell, h.regularColumns,
            r.cells, r.pkLiveness, r.rowDeletion, r.complexDeletion,
            r.emptyComplexColumns)
        case s: WriteStaticRow =>
          rowLike(p.key, E.StaticClustering, E.KindCodeStaticCell,
            h.staticColumns, s.cells, s.pkLiveness, s.rowDeletion,
            s.complexDeletion, Nil)
        case m: WriteMarker =>
          List(Ev(p.key.toSeq, m.clustering, s"range:${m.clustering}",
            E.KindCodeMarker,
            E.flagsOf(tombstone = true, expiring = false, counter = false,
              live = false),
            m.markedForDeleteAtUs, F.NoTtlS, m.localDeletionTimeS, 0L,
            None))
      }
    }

  // ------------------------------------------------------------------
  // write + parse plumbing

  private def writeFile(h: SerializationHeaderInfo,
      parts: List[GenPartition]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new F.Writer(new DataOutputStream(bos), h)
    parts.foreach { p =>
      w.writePartitionStart(p.key, p.deletion)
      p.unfiltereds.foreach(w.write)
      w.writePartitionEnd()
    }
    bos.toByteArray
  }

  private def parse(bytes: Array[Byte], h: SerializationHeaderInfo,
      keepValues: Boolean): List[Ev] =
    F.events(new ByteArrayInputStream(bytes), h,
      keepValues = keepValues).map { e =>
      Ev(e.key.toSeq, e.clustering, e.columnName, e.kindCode, e.flags,
        e.timestampUs, e.ttlS, e.localDeletionTimeS, e.sizeBytes,
        Option(e.value).map(_.toSeq))
    }.toList

  // ------------------------------------------------------------------
  // properties

  test("Data.db: arbitrary generated partitions parse to exactly the " +
      "model's events, value bytes included") {
    check(fileGen, runs = 60) { case ((h, parts), i) =>
      val bytes = writeFile(h, parts)
      val expected = expectedEvents(h, parts)
      assert(parse(bytes, h, keepValues = true) === expected,
        s"fixture $i diverged from the model")
      // the value-skipping scan path reads the same stream shape:
      // identical events with no value bytes retained
      assert(parse(bytes, h, keepValues = false) ===
        expected.map(_.copy(value = None)),
        s"fixture $i value-skip path diverged")
    }
  }

  test("Data.db: the serialization HEADER roundtrips byte-exactly") {
    check(headerGen, runs = 60) { (h, i) =>
      val b1 = F.serializeHeader(h)
      val parsed = F.parseHeader(b1)
      assert(java.util.Arrays.equals(F.serializeHeader(parsed), b1),
        s"header $i did not roundtrip")
    }
  }

  test("Data.db: flips never crash nor demand unbounded allocation " +
      "(no row-stream CRC, faithful to the real format)") {
    val (h, parts) = fileGen.pureApply(Gen.Parameters.default, Seed(77L))
    val clean = writeFile(h, parts)
    assert(clean.length > 100, "fixture too small to fuzz")
    val flipGen = for {
      at <- Gen.choose(0, clean.length - 1)
      x <- Gen.choose(1, 255)
    } yield (at, x)
    check(flipGen, runs = 500) { case ((at, x), _) =>
      val b = clean.clone(); b(at) = (b(at) ^ x).toByte
      try {
        val got = parse(b, h, keepValues = true)
        // a flip may decode to a different VALID stream, but the
        // reader's explicit guards bound every claimed size
        got.foreach(e => assert(e.size <= (1L << 28)))
        assert(got.length <= clean.length,
          "more events than bytes — runaway synthesis")
      } catch {
        case _: java.io.IOException => () // typed fail-closed (incl. EOF)
      }
    }
  }

  // ------------------------------------------------------------------
  // the promoted (row) index — RowIndexEntry.IndexedEntry, the structure
  // the split planner trusts for mid-partition starts

  private val indexInfoGen: Gen[F.IndexInfo] = for {
    fk <- Gen.choose(0, 7)
    fc <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    lk <- Gen.choose(0, 7)
    lc <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    offset <- Gen.choose(0L, 1L << 50)
    width <- Gen.choose(0L, 1L << 40)
    marker <- Gen.option(Gen.zip(Gen.choose(0L, 1L << 50),
      Gen.choose(0L, Int.MaxValue.toLong)))
  } yield F.IndexInfo(fk, fc, lk, lc, offset, width, marker)

  private val promotedGen: Gen[F.PromotedIndex] = for {
    headerLength <- Gen.choose(0L, 1L << 40)
    ldt <- Gen.choose(0L, Int.MaxValue.toLong)
    mfda <- Gen.choose(0L, 1L << 50)
    n <- Gen.choose(0, 24)
    blocks <- Gen.listOfN(n, indexInfoGen)
  } yield F.PromotedIndex(headerLength, ldt, mfda, blocks.toIndexedSeq)

  test("promoted index: arbitrary block lists roundtrip exactly, " +
      "offset table verified") {
    check(promotedGen, runs = 60) { (p, i) =>
      assert(F.parsePromotedIndex(F.serializePromotedIndex(p)) === p,
        s"promoted index $i did not roundtrip")
    }
  }

  test("promoted index: flips never crash (offset-table verification " +
      "catches structural shifts); truncation at every prefix fails " +
      "closed") {
    val clean = F.serializePromotedIndex(
      promotedGen.pureApply(Gen.Parameters.default, Seed(33L)))
    val flipGen = for {
      at <- Gen.choose(0, clean.length - 1)
      x <- Gen.choose(1, 255)
    } yield (at, x)
    check(flipGen, runs = 400) { case ((at, x), _) =>
      val b = clean.clone(); b(at) = (b(at) ^ x).toByte
      try {
        val p = F.parsePromotedIndex(b)
        // a value-neutral flip may parse; the count guard bounds blocks
        assert(p.blocks.length <= (1 << 24))
      } catch {
        case _: java.io.IOException => ()
        case _: IllegalArgumentException => () // require() guards
      }
    }
    (0 until clean.length).foreach { n =>
      assertThrows[Exception] {
        F.parsePromotedIndex(clean.take(n))
      }
    }
  }

  test("Data.db: truncation at every prefix fails closed or parses to " +
      "a clean prefix of the full event list (partition-boundary cuts " +
      "are valid shorter files)") {
    val (h, parts) = fileGen.pureApply(Gen.Parameters.default, Seed(99L))
    val clean = writeFile(h, parts)
    val expected = parse(clean, h, keepValues = true)
    var parsedOk = 0
    (0 until clean.length).foreach { n =>
      try {
        val got = parse(clean.take(n), h, keepValues = true)
        assert(got === expected.take(got.length),
          s"prefix $n parsed to a NON-prefix of the full stream")
        parsedOk += 1
      } catch {
        case _: java.io.IOException => ()
      }
    }
    // only partition-boundary cuts may parse: far fewer than byte count
    assert(parsedOk <= parts.length + 1,
      s"$parsedOk prefixes parsed — more than the partition boundaries")
  }
}
