package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.PurgeAggregator
import graft.agg.PurgeAggregator.{Buf, Cell, Winner}

/** ScalaCheck properties (SURVEY §5.2): collate is a commutative semigroup
  * (merge order must not matter, mirroring PartitionStatistics.java:118-130),
  * top-N ≡ sort+limit, TTL-map merge ≡ multiset union, purge invariants. */
class PropertiesSpec extends AnyFunSuite {

  /** Deterministic property loop (scalatestplus-scalacheck is not in the
    * offline dependency set, so drive Gen directly with fixed seeds). */
  private def checkProp[T](gen: Gen[T], trials: Int = 200)(f: T => Boolean): Unit =
    (0 until trials).foreach { i =>
      val v = gen.pureApply(Gen.Parameters.default, Seed(42L + i))
      assert(f(v), s"property failed for: $v")
    }

  private val genCell: Gen[Cell] = for {
    key <- Gen.choose(0L, 5L)
    clustering <- Gen.choose(0L, 3L)
    col <- Gen.oneOf("c0", "c1")
    sst <- Gen.oneOf("sst-0", "sst-1", "sst-2")
    ts <- Gen.choose(0L, 100L)
    ldt <- Gen.choose(0L, 100L)
    tomb <- Gen.oneOf(true, false)
    size <- Gen.choose(1L, 1000L)
  } yield Cell(key, clustering, col, sst, ts, ldt, tomb, size)

  private def agg = new PurgeAggregator.Agg(50L)

  test("purge buffer merge is associative and commutative in effect") {
    checkProp(Gen.listOfN(12, genCell)) { cells =>
      val a = agg
      // fold in given order vs reversed order vs split-merge
      val inOrder = cells.foldLeft(a.zero)(a.reduce)
      val reversed = cells.reverse.foldLeft(a.zero)(a.reduce)
      val (l, r) = cells.splitAt(cells.length / 2)
      val split = a.merge(
        l.foldLeft(a.zero)(a.reduce), r.foldLeft(a.zero)(a.reduce))
      a.finish(inOrder) == a.finish(reversed) &&
        a.finish(inOrder) == a.finish(split)
    }
  }

  test("purge invariants: 0 <= reclaimable <= size; infinite gc_grace " +
    "means tombstones are never purged") {
    checkProp(Gen.listOfN(10, genCell)) { cells =>
      val a = agg
      val r = a.finish(cells.foldLeft(a.zero)(a.reduce))
      val neverPurge = new PurgeAggregator.Agg(Long.MinValue)
      val r2 = neverPurge.finish(cells.foldLeft(neverPurge.zero)(neverPurge.reduce))
      r.reclaimable >= 0 && r.reclaimable <= r.size &&
        r2.reclaimable >= 0 && r2.reclaimable >= {
          // without gc purging, reclaimable comes only from shadowing
          0L
        } && r2.merged_size >= r.merged_size
    }
  }

  test("collate (fieldwise sum + tableCount) is order-independent") {
    case class P(size: Long, rows: Long, cells: Long, ttl: Map[Long, Long])
    def collate(a: P, b: P): P = P(a.size + b.size, a.rows + b.rows,
      a.cells + b.cells,
      (a.ttl.keySet ++ b.ttl.keySet).map(k =>
        k -> (a.ttl.getOrElse(k, 0L) + b.ttl.getOrElse(k, 0L))).toMap)
    val genP = for {
      s <- Gen.choose(0L, 100L); r <- Gen.choose(0L, 10L)
      c <- Gen.choose(0L, 50L)
      ttl <- Gen.mapOf(Gen.zip(Gen.choose(-1L, 5L), Gen.choose(1L, 9L)))
    } yield P(s, r, c, ttl)
    checkProp(Gen.nonEmptyListOf(genP)) { ps =>
      val f = ps.reduce(collate)
      val g = ps.reverse.reduce(collate)
      f == g
    }
  }

  test("TTL-map Aggregator merge == multiset union, any split/order") {
    import graft.agg.TtlMapAggregator
    import graft.agg.TtlMapAggregator.TtlCell
    val a = new TtlMapAggregator.Agg
    val genTtls = Gen.nonEmptyListOf(Gen.choose(-1L, 6L))
    val genSplit = for {
      ts <- genTtls; cut <- Gen.choose(0, 10)
    } yield (ts, cut)
    checkProp(genSplit) { case (ts, cut) =>
      val expected = ts.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val (l, r) = ts.splitAt(cut % (ts.size + 1))
      def fold(xs: List[Long]) = xs.foldLeft(a.zero)((m, t) => a.reduce(m, TtlCell(t)))
      a.finish(a.merge(fold(l), fold(r))) == expected &&
        a.finish(a.merge(fold(r), fold(l))) == expected
    }
  }

  test("unsigned vint codec round-trips the full 64-bit domain") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
    import graft.sources.indexdb.IndexDbFormat
    val genV = Gen.oneOf(
      Gen.choose(0L, 256L),
      Gen.choose(Long.MinValue, Long.MaxValue), // incl. top-bit-set (9-byte)
      // cluster around the 7-bit-per-byte encoding boundaries
      Gen.choose(0, 8).flatMap(k =>
        Gen.choose(-2L, 2L).map(d => (1L << (7 * (k + 1))) + d)))
    checkProp(genV, trials = 500) { v =>
      val bos = new ByteArrayOutputStream()
      IndexDbFormat.writeUnsignedVInt(new DataOutputStream(bos), v)
      val in = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
      IndexDbFormat.readUnsignedVInt(in) == v && in.read() == -1
    }
  }

  test("signed (zigzag) vint codec round-trips arbitrary longs") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
    import graft.sources.indexdb.IndexDbFormat
    val genV = Gen.oneOf(
      Gen.choose(-256L, 256L),
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.const(Long.MinValue), Gen.const(Long.MaxValue), Gen.const(-1L))
    checkProp(genV, trials = 500) { v =>
      val bos = new ByteArrayOutputStream()
      IndexDbFormat.writeVInt(new DataOutputStream(bos), v)
      val in = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
      IndexDbFormat.readVInt(in) == v && in.read() == -1
    }
  }

  test("Summary.db codec round-trips arbitrary entry sets") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
    import graft.sources.summarydb.SummaryDbFormat
    val genEntry = for {
      keyLen <- Gen.choose(1, 24)
      key <- Gen.listOfN(keyLen, Gen.choose(Byte.MinValue, Byte.MaxValue))
      pos <- Gen.oneOf(Gen.choose(0L, 1024L),
        Gen.choose(0L, Long.MaxValue / 2))
    } yield SummaryDbFormat.Entry(key.toArray, pos)
    val genSummary = for {
      n <- Gen.choose(1, 12)
      entries <- Gen.listOfN(n, genEntry)
      interval <- Gen.choose(1, 128)
      first <- Gen.listOfN(4, Gen.choose(Byte.MinValue, Byte.MaxValue))
      last <- Gen.listOfN(6, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield SummaryDbFormat.Summary(interval, 128, entries.length,
      entries.toVector, first.toArray, last.toArray)
    checkProp(genSummary, trials = 200) { s =>
      val bos = new ByteArrayOutputStream()
      SummaryDbFormat.write(new DataOutputStream(bos), s)
      val got = SummaryDbFormat.parse(new DataInputStream(
        new ByteArrayInputStream(bos.toByteArray)))
      got.minIndexInterval == s.minIndexInterval &&
        got.entries.length == s.entries.length &&
        got.entries.zip(s.entries).forall { case (a, b) =>
          a.position == b.position && a.key.toSeq == b.key.toSeq
        } &&
        got.firstKey.toSeq == s.firstKey.toSeq &&
        got.lastKey.toSeq == s.lastKey.toSeq
    }
  }

  test("promoted-index codec round-trips arbitrary block lists") {
    import graft.sources.datadb.CassandraDataFormat
    val kinds = Seq(CassandraDataFormat.KindInclStartBound,
      CassandraDataFormat.KindClustering,
      CassandraDataFormat.KindInclEndBound)
    val genBlock = for {
      fk <- Gen.oneOf(kinds); lk <- Gen.oneOf(kinds)
      fc <- Gen.choose(-8L, 1L << 40); lc <- Gen.choose(-8L, 1L << 40)
      off <- Gen.choose(0L, 1L << 30)
      width <- Gen.oneOf(Gen.choose(1L, 256L),
        Gen.choose(60000L, 80000L)) // straddles the 64 KiB delta base
      marker <- Gen.option(Gen.zip(
        Gen.choose(0L, 1L << 50), Gen.choose(0L, Int.MaxValue.toLong)))
    } yield CassandraDataFormat.IndexInfo(fk, fc, lk, lc, off, width, marker)
    val genIdx = for {
      n <- Gen.choose(1, 10)
      blocks <- Gen.listOfN(n, genBlock)
      hl <- Gen.choose(10L, 64L)
      ldt <- Gen.choose(0L, Int.MaxValue.toLong)
      mfda <- Gen.oneOf(Gen.const(Long.MinValue), Gen.choose(0L, 1L << 50))
    } yield CassandraDataFormat.PromotedIndex(hl, ldt, mfda, blocks.toVector)
    checkProp(genIdx, trials = 200) { p =>
      val got = CassandraDataFormat.parsePromotedIndex(
        CassandraDataFormat.serializePromotedIndex(p))
      got == p
    }
  }

  test("BMP/WAV codecs round-trip arbitrary dimensions and rates") {
    import graft.ops.Multimodal.RealCodecs
    val genBmp = Gen.zip(Gen.choose(1, 200), Gen.choose(1, 120),
      Gen.choose(0L, 1L << 40))
    checkProp(genBmp, trials = 150) { case (w, h, seed) =>
      val d = RealCodecs.decode(RealCodecs.encodeBmp(w, h, seed))
      d.format == "bmp" && d.width == w && d.height == h
    }
    val genWav = for {
      rate <- Gen.choose(1000, 192000)
      ch <- Gen.choose(1, 8)
      samples <- Gen.choose(1, 4000)
      seed <- Gen.choose(0L, 1L << 40)
    } yield (rate, ch, samples, seed)
    checkProp(genWav, trials = 150) { case (rate, ch, samples, seed) =>
      val d = RealCodecs.decode(RealCodecs.encodeWav(rate, ch, samples, seed))
      d.format == "wav" && d.sampleRate == rate && d.channels == ch &&
        d.samples == samples
    }
  }

  test("MP4 container codec round-trips arbitrary ids through both box " +
      "version layouts; truncation rejected") {
    import graft.ops.Multimodal.Mp4
    checkProp(Gen.choose(0L, 1L << 40), trials = 200) { id =>
      val p = Mp4.decode(Mp4.encode(id))
      p.durationMs == Mp4.durationUnitsOf(id) * 1000L / Mp4.timescaleOf(id) &&
        p.width == Mp4.widthOf(id) && p.height == Mp4.heightOf(id) &&
        p.videoCodec == "avc1" &&
        p.audioCodec == (if (Mp4.hasAudioOf(id)) "Opus" else "") &&
        p.trackCount == (if (Mp4.hasAudioOf(id)) 2 else 1) &&
        p.mdatBytes == Mp4.mdatLenOf(id).toLong
    }
    // a truncated file must error, never silently return partial metadata
    val whole = Mp4.encode(2L) // even id: exercises the largesize path
    intercept[java.io.IOException] {
      Mp4.decode(java.util.Arrays.copyOf(whole, whole.length - 10))
    }
    intercept[java.io.IOException] {
      Mp4.decode("nope".getBytes("US-ASCII"))
    }
  }

  test("EBML/WebM container codec round-trips arbitrary ids through sized " +
      "and unknown-size Segments; truncation rejected") {
    import graft.ops.Multimodal.Ebml
    checkProp(Gen.choose(0L, 1L << 40), trials = 200) { id =>
      val p = Ebml.decode(Ebml.encode(id))
      p.durationMs == Ebml.durationMsOf(id) &&
        p.width == Ebml.widthOf(id) && p.height == Ebml.heightOf(id) &&
        p.videoCodec == "V_VP9" &&
        p.audioCodec == (if (Ebml.hasAudioOf(id)) "A_OPUS" else "") &&
        p.trackCount == (if (Ebml.hasAudioOf(id)) 2 else 1) &&
        p.clusterBytes == Ebml.clusterLenOf(id).toLong
    }
    // truncation must error in BOTH framing forms — the sized Segment
    // (even id) and the unknown-size streaming Segment (odd id)
    Seq(2L, 3L).foreach { id =>
      val whole = Ebml.encode(id)
      intercept[java.io.IOException] {
        Ebml.decode(java.util.Arrays.copyOf(whole, whole.length - 7))
      }
    }
    intercept[java.io.IOException] { Ebml.decode("RIFF".getBytes("US-ASCII")) }
  }

  test("decoder robustness: random bytes never hang, OOM or silently " +
      "succeed — every binary parser fails closed") {
    import graft.ops.{Flac, Multimodal}
    import graft.sources.datadb.{CassandraDataFixture, CassandraDataFormat}
    val genBytes = for {
      n <- Gen.choose(0, 4096)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield {
      val r = new scala.util.Random(seed)
      val b = new Array[Byte](n); r.nextBytes(b); b
    }
    // each decoder must throw a CONTROLLED exception (IOException or the
    // explicit require/assert classes) — never loop forever, never
    // allocate implausibly, never return a bogus success
    def failsClosed(name: String, f: Array[Byte] => Any)
        (b: Array[Byte]): Boolean =
      try { f(b); false } catch {
        case _: java.io.IOException => true
        case _: IllegalArgumentException => true
        case _: IllegalStateException => true
        case e: Throwable =>
          fail(s"$name leaked ${e.getClass.getName}: ${e.getMessage}")
      }
    val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
      "mp4" -> (b => Multimodal.Mp4.decode(b)),
      "ebml" -> (b => Multimodal.Ebml.decode(b)),
      "ogg" -> (b => Multimodal.Ogg.decode(b)),
      "h264" -> (b => Multimodal.H264.decode(b)),
      "warc" -> (b => graft.ops.Warc.decode(b)),
      "tar" -> (b => graft.ops.Archives.Tar.decode(b)),
      "zip" -> (b => graft.ops.Archives.Zip.decode(b)),
      "flac" -> (b => Flac.decode(b)),
      "png" -> (b => Multimodal.RealCodecs.decodePng(b)),
      "media" -> (b => Multimodal.RealCodecs.decode(b)),
      "cassandra-rows" -> (b => {
        val l = CassandraDataFormat.events(
          new java.io.ByteArrayInputStream(b),
          CassandraDataFixture.FeatureHeader).toList
        // an empty stream parses to an empty relation — that IS the
        // fail-closed outcome for 0 bytes; any nonempty success on
        // random bytes would be a real hole
        if (l.isEmpty) throw new java.io.IOException("empty parse")
        l
      }))
    decoders.foreach { case (name, f) =>
      checkProp(genBytes, trials = 80)(failsClosed(name, f))
      // and with each format's own magic prepended (a header that LOOKS
      // right but carries garbage must also fail closed)
      val magic = Map("mp4" -> Array[Byte](0, 0, 0, 16, 'f', 't', 'y', 'p'),
        "ebml" -> Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte),
        "ogg" -> "OggS".getBytes("US-ASCII"),
        "flac" -> "fLaC".getBytes("US-ASCII"),
        "png" -> Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
          .map(_.toByte))
      magic.get(name).foreach { m =>
        checkProp(genBytes, trials = 40)(b =>
          failsClosed(name, f)(m ++ b))
      }
    }
  }

  test("TAR and ZIP codecs round-trip arbitrary ids; tar checksum and " +
      "zip entry CRC catch corruption") {
    import graft.ops.Archives.{Tar, Zip}
    checkProp(Gen.choose(0L, 1L << 40), trials = 100) { id =>
      val t = Tar.decode(Tar.encode(id))
      val files = Tar.filesOf(id)
      t.files == files &&
        t.totalBytes == (0 until files).map(Tar.sizeOf(id, _).toLong).sum &&
        t.blocks == (0 until files)
          .map(k => 1 + (Tar.sizeOf(id, k) + 511) / 512).sum + 2
    }
    checkProp(Gen.choose(0L, 1L << 40), trials = 100) { id =>
      val z = Zip.decode(Zip.encode(id))
      val n = Zip.entriesOf(id)
      z.entries == n && z.stored + z.deflated == n &&
        z.uncompressedBytes ==
          (0 until n).map(Zip.sizeOf(id, _).toLong).sum
    }
    // corruption negatives: a flipped header byte breaks the tar
    // checksum; a flipped payload byte breaks the zip entry CRC
    val tar = Tar.encode(4L).clone()
    tar(130) = (tar(130) ^ 0x01).toByte // inside the mode field
    intercept[java.io.IOException] { Tar.decode(tar) }
    val zip = Zip.encode(4L).clone()
    zip(40) = (zip(40) ^ 0x04).toByte // inside the first entry's payload
    intercept[java.io.IOException] { Zip.decode(zip) }
  }

  test("WARC codec round-trips arbitrary ids; per-member gzip CRC " +
      "catches corruption; record framing enforced") {
    import graft.ops.Warc
    checkProp(Gen.choose(0L, 1L << 40), trials = 100) { id =>
      val p = Warc.decode(Warc.encode(id))
      val caps = Warc.capturesOf(id)
      p.records == 1 + 2 * caps && p.responses == caps &&
        p.gzipMembers == p.records &&
        p.bodySum == (0 until caps).map { c =>
          (0 until Warc.bodyLenOf(id, c))
            .map(i => Warc.bodyByteOf(id, c, i).toLong).sum
        }.sum
    }
    val whole = Warc.encode(3L)
    // flip a byte in the middle of some member's deflate payload: the
    // member CRC32 must catch it
    val bad = whole.clone()
    bad(whole.length / 2) = (bad(whole.length / 2) ^ 0x11).toByte
    val ex = intercept[java.io.IOException] { Warc.decode(bad) }
    assert(ex.getMessage.nonEmpty)
    intercept[java.io.IOException] { Warc.decode("WARC/1.0".getBytes) }
  }

  test("H.264 header codec round-trips arbitrary ids; emulation " +
      "prevention escapes/strips; Opus TOC round-trips all 4 codes") {
    import graft.ops.Multimodal.{H264, OpusToc}
    checkProp(Gen.choose(0L, 1L << 40), trials = 150) { id =>
      val s = H264.decode(H264.encode(id))
      s.profile == H264.profileOf(id) && s.level == 31 &&
        s.width == H264.widthOf(id) && s.height == H264.heightOf(id) &&
        s.maxRefFrames == H264.refFramesOf(id) && s.nalCount == 3
    }
    // the stub slice payload embeds 00 00 0x runs — assert the WIRE
    // actually carries emulation-prevention bytes (escape is live)
    val wire = H264.encode(7L)
    val hasEp = (0 until wire.length - 2).exists(i =>
      wire(i) == 0 && wire(i + 1) == 0 && wire(i + 2) == 3)
    assert(hasEp, "no emulation-prevention byte on the wire")
    intercept[java.io.IOException] { H264.decode(Array[Byte](1, 2, 3)) }
    checkProp(Gen.choose(0L, 1L << 40), trials = 200) { id =>
      val t = OpusToc.decode(OpusToc.encode(id))
      t.config == OpusToc.configOf(id) &&
        t.stereo == OpusToc.stereoOf(id) &&
        t.frames == Seq(1, 2, 2, 3)(OpusToc.codeOf(id)) &&
        t.durationUs == OpusToc.durationUsOf(t.config) * t.frames
    }
    intercept[java.io.IOException] { OpusToc.decode(Array.emptyByteArray) }
  }

  test("Ogg transport round-trips arbitrary ids incl. the page-spanning " +
      "packet; page CRC catches a flipped bit") {
    import graft.ops.Multimodal.Ogg
    checkProp(Gen.choose(0L, 1L << 40), trials = 150) { id =>
      val p = Ogg.decode(Ogg.encode(id))
      p.channels == Ogg.channelsOf(id) && p.preskip == Ogg.preskipOf(id) &&
        p.inputRate == 48000L &&
        p.audioBytes == Ogg.audioLenOf(id).toLong &&
        p.packets == 3 && p.granule == Ogg.granuleOf(id) && p.pages == 4
    }
    val whole = Ogg.encode(9L)
    val bad = whole.clone()
    bad(40) = (bad(40) ^ 0x20).toByte // inside page 0's payload
    val ex = intercept[java.io.IOException] { Ogg.decode(bad) }
    assert(ex.getMessage.contains("CRC"))
    intercept[java.io.IOException] { Ogg.decode("Nope".getBytes("US-ASCII")) }
  }

  test("FLAC codec round-trips arbitrary ids through all three fixed " +
      "predictor orders; both CRCs catch a flipped bit") {
    import graft.ops.Flac
    checkProp(Gen.choose(0L, 1L << 40), trials = 120) { id =>
      val d = Flac.decode(Flac.encode(id))
      d.sampleRate == Flac.sampleRateOf(id) &&
        d.nSamples == Flac.nSamplesOf(id) &&
        d.order == Flac.orderOf(id) &&
        d.sampleSum == (0 until Flac.nSamplesOf(id))
          .map(i => Flac.sampleOf(id, i).toLong).sum
    }
    val whole = Flac.encode(5L)
    // flip one bit in the residual region: CRC-16 must catch it
    val bad = whole.clone()
    bad(bad.length - 10) = (bad(bad.length - 10) ^ 0x10).toByte
    val ex = intercept[java.io.IOException] { Flac.decode(bad) }
    assert(ex.getMessage.toLowerCase.contains("crc") ||
      ex.getMessage.contains("truncated"))
    // flip one bit in the frame header: CRC-8 must catch it
    val bad2 = whole.clone()
    val frameStart = 4 + 4 + 34 // magic + metadata header + STREAMINFO
    bad2(frameStart + 3) = (bad2(frameStart + 3) ^ 0x01).toByte
    intercept[java.io.IOException] { Flac.decode(bad2) }
  }

  test("PNG codec round-trips arbitrary dimensions through all 5 filters") {
    import graft.ops.Multimodal.RealCodecs
    // h >= 5 makes the encoder's rotating per-row filter cover types 0-4,
    // so the decoder's Sub/Up/Average/Paeth reconstruction is all proven
    val gen = Gen.zip(Gen.choose(1, 40), Gen.choose(5, 30),
      Gen.choose(0L, 1L << 40))
    checkProp(gen, trials = 80) { case (w, h, seed) =>
      val d = RealCodecs.decodePng(RealCodecs.encodePng(w, h, seed))
      val expect =
        (0 until w * h * 3).map(i => RealCodecs.pngPixel(seed, i).toLong).sum
      d.width == w && d.height == h && d.pixelSum == expect
    }
  }

  test("composite key encoding round-trips arbitrary (long, utf8) pairs") {
    import java.nio.charset.StandardCharsets.UTF_8
    import graft.sources.KeyValidator._
    val comp = CompositeKey(LongKey, Utf8Key)
    val genPair = for {
      l <- Gen.oneOf(Gen.choose(Long.MinValue, Long.MaxValue),
        Gen.oneOf(0L, -1L, Long.MinValue, Long.MaxValue))
      s <- Gen.oneOf(Gen.asciiPrintableStr,
        Gen.listOf(Gen.oneOf('ü', 'ß', '§', '中', 'a', ' ')).map(_.mkString))
    } yield (l, s)
    checkProp(genPair, trials = 300) { case (l, s) =>
      val bytes = comp.encode(Seq(l, s))
      // driver-side structural parse pins the CompositeType layout:
      // 2-byte BE length + component bytes + end-of-component 0, twice
      def len(at: Int) = ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)
      val sBytes = s.getBytes(UTF_8)
      len(0) == 8 &&
        java.nio.ByteBuffer.wrap(bytes, 2, 8).getLong == l &&
        bytes(10) == 0 &&
        len(11) == sBytes.length &&
        new String(bytes, 13, sBytes.length, UTF_8) == s &&
        bytes(13 + sBytes.length) == 0 &&
        bytes.length == 14 + sBytes.length
    }
  }

  test("bounded top-N heap semantics == sort + limit") {
    checkProp(Gen.listOf(Gen.choose(-1000L, 1000L))) { xs =>
      val n = 10
      // reference uses MinMaxPriorityQueue.maximumSize(n); model it
      val heap = xs.foldLeft(List.empty[Long]) { (acc, x) =>
        (x :: acc).sorted(Ordering[Long].reverse).take(n)
      }
      heap == xs.sorted(Ordering[Long].reverse).take(n)
    }
  }

  test("winner ordering (beats) is a strict total order on distinct cells") {
    val genW = for {
      ts <- Gen.choose(0L, 3L); sst <- Gen.oneOf("a", "b")
      sz <- Gen.choose(1L, 3L); t <- Gen.oneOf(true, false)
      ldt <- Gen.choose(0L, 2L)
    } yield Winner(ts, sst, sz, t, ldt)
    // antisymmetry via reduce: winner of (x then y) == winner of (y then x)
    checkProp(Gen.zip(genW, genW)) { case (x, y) =>
      val a = agg
      val cx = Cell(1, 0, "c0", x.sstable_id, x.timestamp_us,
        x.local_deletion_time_s, x.is_tombstone, x.size_bytes)
      val cy = Cell(1, 0, "c0", y.sstable_id, y.timestamp_us,
        y.local_deletion_time_s, y.is_tombstone, y.size_bytes)
      val xy = a.finish(List(cx, cy).foldLeft(a.zero)(a.reduce))
      val yx = a.finish(List(cy, cx).foldLeft(a.zero)(a.reduce))
      xy == yx
    }
  }

  test("sstable-data stream offsets round-trip through checkpoint JSON") {
    import graft.sources.FileSetOffset
    val genName = for {
      n <- Gen.choose(1, 12)
      cs <- Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('.', '_', '-')))
    } yield cs.mkString + "-Data.db"
    checkProp(Gen.listOf(genName)) { names =>
      val rt = FileSetOffset.fromJson(FileSetOffset(names).json())
      rt.files.toSet == names.toSet && rt.files == rt.files.sorted
    }
    // corrupt checkpoints fail loudly, never parse as empty
    Seq("", "{", "[\"a", "[a]").foreach { bad =>
      intercept[IllegalArgumentException](FileSetOffset.fromJson(bad))
    }
    // names that would corrupt the hand-rolled JSON are rejected at
    // construction, not discovered at recovery time
    intercept[IllegalArgumentException](FileSetOffset(Seq("a\"b")))
  }

  test("Index.db skip-count agrees with the entry reader on any stream") {
    import graft.sources.indexdb.IndexDbFormat
    val gen = for {
      n <- Gen.choose(0, 2048)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield {
      val r = new scala.util.Random(seed)
      val b = new Array[Byte](n); r.nextBytes(b); b
    }
    checkProp(gen, trials = 120) { b =>
      def count(): Either[String, Long] =
        try Right(IndexDbFormat.countEntries(
          new java.io.ByteArrayInputStream(b)))
        catch { case e: Throwable => Left(e.getClass.getName) }
      def walk(): Either[String, Long] =
        try Right(IndexDbFormat.entries(
          new java.io.ByteArrayInputStream(b)).size.toLong)
        catch { case e: Throwable => Left(e.getClass.getName) }
      // the q156 kernel must never disagree with the row reader: same
      // count on parseable streams, both throwing on truncated ones
      (count(), walk()) match {
        case (Right(a), Right(w)) => a == w
        case (Left(_), Left(_)) => true
        case _ => false
      }
    }
  }

  test("KMV monoid laws hold under random streams and random splits") {
    import graft.agg.KmvSketch
    val a = new KmvSketch.Agg(8)
    def run(xs: Seq[Long]) =
      xs.foldLeft(a.zero)((b, h) => a.reduce(b, KmvSketch.In(h)))
    val gen = for {
      xs <- Gen.listOfN(40, Gen.choose(1L, 30L))
      cut <- Gen.choose(0, 40)
    } yield (xs, cut)
    checkProp(gen) { case (xs, cut) =>
      val (l, r) = xs.splitAt(cut)
      val bulk = run(xs)
      // split-merge == bulk, both orders; identity; idempotent re-merge
      a.merge(run(l), run(r)) == bulk &&
        a.merge(run(r), run(l)) == bulk &&
        a.merge(a.zero, bulk) == bulk &&
        a.merge(bulk, bulk) == bulk &&
        // state really is the k smallest distinct values
        bulk == xs.distinct.sorted.take(8).toVector
    }
  }

  test("Misra-Gries partition union is a superset of true heavy hitters") {
    // the q134 soundness argument, property-checked: for random streams
    // split into random partitions, the union of per-partition MG
    // candidate sets contains every item with global freq*k > n
    val k = 8
    def mg(xs: Seq[Long]): Set[Long] = {
      val counters = scala.collection.mutable.Map.empty[Long, Long]
      xs.foreach { t =>
        if (counters.contains(t)) counters(t) += 1
        else if (counters.size < k) counters(t) = 1
        else counters.keys.toSeq.foreach { c =>
          counters(c) -= 1
          if (counters(c) == 0) counters.remove(c)
        }
      }
      counters.keySet.toSet
    }
    val gen = for {
      xs <- Gen.listOfN(120, Gen.frequency(
        5 -> Gen.choose(0L, 2L),       // skewed head
        3 -> Gen.choose(3L, 40L)))     // long tail
      nParts <- Gen.choose(1, 5)
    } yield (xs, nParts)
    checkProp(gen) { case (xs, nParts) =>
      val parts = xs.zipWithIndex.groupBy(_._2 % nParts)
        .values.map(_.map(_._1)).toSeq
      val cands = parts.map(mg).foldLeft(Set.empty[Long])(_ ++ _)
      val n = xs.length
      val heavy = xs.groupBy(identity).collect {
        case (t, os) if os.length.toLong * k > n => t
      }.toSet
      heavy.subsetOf(cands)
    }
  }

  test("PurgeGuard stage-1 prefilter never false-negatives: every key " +
      "genuinely outside a group passes mayContainOutside (round 14)") {
    // the safety half of the metadata purge guard: if the prefilter ever
    // said "no outside sstable can hold this key" for a key that IS
    // outside, the exact-confirm join would never see it and a tombstone
    // would purge over live data. Random sstable populations → real
    // Summary ranges + real Filter.db blooms → the implication must hold
    // for every (group, key held outside that group).
    import graft.ops.PurgeGuard
    import graft.sources.filterdb.FilterDbFormat
    val genSst = for {
      group <- Gen.choose(-1, 2)
      keys <- Gen.nonEmptyListOf(Gen.choose(0L, 400L)).map(_.distinct)
    } yield (group, keys)
    val gen = Gen.nonEmptyListOf(genSst).map(_.take(6))
    checkProp(gen, trials = 120) { ssts =>
      val guards = ssts.zipWithIndex.map { case ((group, keys), i) =>
        val f = FilterDbFormat.create(keys.length.toLong)
        keys.foreach(k => f.add(
          java.nio.ByteBuffer.allocate(8).putLong(k).array()))
        PurgeGuard.SstGuard(s"sst-$i", group, keys.min, keys.max, f)
      }.toArray
      ssts.zipWithIndex.forall { case ((group, keys), i) =>
        // every key this sstable holds must be may-contained for ANY
        // other group's perspective (this sstable is outside them)
        val otherGroups = (Seq(-1, 0, 1, 2).toSet - group) + 99
        keys.forall(k => otherGroups.forall(g =>
          g == group || PurgeGuard.mayContainOutside(guards, g, k)))
      }
    }
  }
}
