package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract run as a
  * partition-local typed transformation (the Scala analog of
  * `mapInPandas` batches — same schema/partitioning contract).
  *
  * Two tiers of decode:
  *  - [[RealCodecs]] — REAL BMP and WAV container parsing (pure-JVM byte
  *    work, no external libraries; q78 roundtrips every header field);
  *  - [[FakeDecoder]] — a clearly marked deterministic STUB standing in
  *    for the LOSSY DSP-bound codecs that genuinely need libraries this
  *    container lacks (H.264 video / Opus audio — images and lossless
  *    audio are NOT on that list: PNG/BMP decode is hand-rolled here,
  *    JPEG rides the JDK's own `javax.imageio` codec, and FLAC is a real
  *    hand-rolled codec in [[graft.ops.Flac]]; the MP4/WebM CONTAINER
  *    layers are real too, [[Mp4]]/[[Ebml]]); the Spark-side plumbing — binary
  *    schema, batch iteration, feature schema, partition preservation —
  *    is real and tested; swap [[FakeDecoder.decode]] for a codec at
  *    deployment. */
object Multimodal {

  // DECODE-ONCE presentation sorts (round 19, guide §1.2): an output-side
  // `orderBy` directly over an opaque decode map ran every codec TWICE
  // per action — the range partitioner's sampling pass re-executes the
  // child plan. Every decoder below therefore `localCheckpoint()`s its
  // O(#docs) narrow output first (the dupClusters precedent): the decode
  // runs once, and both the sampling pass and the sort exchange read the
  // materialized rows. Same rows, same order, same hash.

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, frames: Int, checksum: Long)

  /** STUB decoder: derives deterministic pseudo-metadata from payload bytes.
    * Replace with a real codec (e.g. javax.imageio / ffmpeg bindings) in a
    * real deployment — the call-site contract is the only thing tests pin. */
  object FakeDecoder {
    def decode(payload: Array[Byte], mediaType: String): (Int, Int, Int) = {
      val n = payload.length
      val w = 16 + (n % 1024)
      val h = 16 + ((n / 7) % 768)
      val frames = if (mediaType == "video") 1 + (n % 240) else 1
      (w, h, frames)
    }
  }

  /** Synthesize a media table from documents: text bytes stand in for the
    * opaque payload (binary column), media type assigned round-robin. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Partition-local decode + feature extraction. No shuffle: narrow
    * mapPartitions over whatever partitioning the payload table has. */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val (w, h, f) = FakeDecoder.decode(r.payload, r.media_type)
        val checksum = r.payload.foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
          w, h, f, checksum)
      }
    }
  }

  case class ResizedMedia(doc_id: Long, media_type: String,
      payload: Array[Byte], width: Int, height: Int)
  case class Frame(doc_id: Long, frame_idx: Int, frame_payload: Array[Byte])

  /** Resize plumbing: narrow per-row payload rewrite (STUB kernel scales the
    * byte buffer to the target pixel count; a real build calls the codec).
    * The shape is what matters at scale: payload-in/payload-out, no shuffle,
    * partitioning preserved. */
  def resize(spark: SparkSession, media: DataFrame,
      width: Int, height: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val target = math.max(1, (width * height) / 64) // STUB "pixel" bytes
        val out = java.util.Arrays.copyOf(r.payload, target)
        ResizedMedia(r.doc_id, r.media_type, out, width, height)
      }
    }
  }

  /** Frame sampling: video payloads flatMap to one row per kept frame
    * (every `everyN`-th of the stub-decoded frame count) — the UDTF/explode
    * shape for media. Output cardinality is data-dependent; downstream ops
    * see ordinary rows. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      everyN: Int = 10): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      if (r.media_type != "video") Iterator.empty
      else {
        val (_, _, frames) = FakeDecoder.decode(r.payload, r.media_type)
        Iterator.range(0, frames, everyN).map { i =>
          // STUB frame bytes: a deterministic slice keyed by frame index
          val off = if (r.payload.isEmpty) 0 else i % r.payload.length
          Frame(r.doc_id, i,
            java.util.Arrays.copyOfRange(r.payload, off,
              math.min(off + 16, r.payload.length)))
        }
      }
    }
  }

  /** Relational metadata view (oracle-checkable): byte length and lead byte
    * straight from the binary column, plus stubbed frame count. */
  def metadata(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      ascii(col("text")).cast("long").as("first_byte"),
      (floor(octet_length(col("text")) / 256) + 1).as("frames_stub"))
      .orderBy("doc_id")

  /** REAL container codecs for the media formats pure-JVM byte code can
    * encode AND decode without external libraries: BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, 24-bpp bottom-up, 4-byte row padding), WAV
    * (RIFF/WAVE with PCM16 `fmt ` + `data` chunks), and — because zlib
    * ships in the JDK — full PNG (signature, CRC32-checked chunks, IHDR,
    * zlib-deflated IDAT, all five scanline filters), plus JPEG through
    * the JDK's bundled `javax.imageio` codec. These replace the
    * [[FakeDecoder]] stub for formats where a stub was never necessary;
    * the remaining deployment swaps are the codecs whose decoders are
    * genuinely library-bound (H.264/Opus).
    * BMP/WAV fields little-endian, PNG/JPEG big-endian, per each spec. */
  object RealCodecs {

    final case class Decoded(format: String, width: Int, height: Int,
        sampleRate: Int, channels: Int, samples: Int)

    private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    }
    private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
      b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
    }
    private def rd16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def rd32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

    /** BMP row stride: 24-bpp rows pad to 4 bytes. */
    def bmpStride(width: Int): Int = (3 * width + 3) & ~3

    def encodeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
      val stride = bmpStride(width)
      val size = 54 + stride * height
      val b = new Array[Byte](size)
      b(0) = 'B'; b(1) = 'M'
      le32(b, 2, size)
      le32(b, 10, 54) // pixel-array offset
      le32(b, 14, 40) // BITMAPINFOHEADER size
      le32(b, 18, width)
      le32(b, 22, height) // positive = bottom-up
      le16(b, 26, 1) // planes
      le16(b, 28, 24) // bpp
      le32(b, 34, stride * height) // image size
      var i = 54
      while (i < size) { b(i) = ((seed + i) * 31).toByte; i += 1 }
      b
    }

    def encodeWav(sampleRate: Int, channels: Int, samples: Int,
        seed: Long): Array[Byte] = {
      val dataLen = samples * channels * 2
      val b = new Array[Byte](44 + dataLen)
      b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
      le32(b, 4, 36 + dataLen)
      b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
      b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
      le32(b, 16, 16) // PCM fmt chunk length
      le16(b, 20, 1) // PCM
      le16(b, 22, channels)
      le32(b, 24, sampleRate)
      le32(b, 28, sampleRate * channels * 2) // byte rate
      le16(b, 32, channels * 2) // block align
      le16(b, 34, 16) // bits per sample
      b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
      le32(b, 40, dataLen)
      var i = 44
      while (i < b.length) { b(i) = ((seed * 17 + i) % 251).toByte; i += 1 }
      b
    }

    private def be32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v >> 24).toByte; b(off + 1) = (v >> 16).toByte
      b(off + 2) = (v >> 8).toByte; b(off + 3) = v.toByte
    }
    private def rbe32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    private val PngSig =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10)

    /** Deterministic raw pixel byte stream for the PNG fixtures: byte i of
      * a doc's image is `(seed·7 + i·13) mod 251` — recomputable in SQL,
      * so the decode roundtrip's pixel checksum is oracle-checkable. */
    def pngPixel(seed: Long, i: Int): Int = ((seed * 7 + i * 13L) % 251L).toInt

    private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String,
        data: Array[Byte]): Unit = {
      val hdr = new Array[Byte](8)
      be32(hdr, 0, data.length)
      hdr(4) = typ(0).toByte; hdr(5) = typ(1).toByte
      hdr(6) = typ(2).toByte; hdr(7) = typ(3).toByte
      out.write(hdr)
      out.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(hdr, 4, 4)
      crc.update(data)
      val c = new Array[Byte](4)
      be32(c, 0, crc.getValue.toInt)
      out.write(c)
    }

    /** 8-bit RGB non-interlaced PNG. Each scanline's filter type rotates
      * through 0–4 (None/Sub/Up/Average/Paeth) by row index, so a decoder
      * must implement ALL five unfilters to reproduce the pixels — the
      * roundtrip proves the real filter algebra, not just the container
      * walk. */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val bpp = 3
      val raw = Array.tabulate(width * height * bpp)(i => pngPixel(seed, i))
      def px(row: Int, i: Int): Int = // i indexes bytes within the row
        if (i < 0) 0 else raw(row * width * bpp + i)
      val filtered = new Array[Byte](height * (1 + width * bpp))
      var o = 0
      for (row <- 0 until height) {
        val f = row % 5
        filtered(o) = f.toByte; o += 1
        for (i <- 0 until width * bpp) {
          val a = px(row, i - bpp) // left
          val b = if (row == 0) 0 else px(row - 1, i) // up
          val c = if (row == 0) 0 else px(row - 1, i - bpp) // up-left
          val pred = f match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) / 2
            case 4 => // Paeth
              val p = a + b - c
              val (pa, pb, pc) =
                (math.abs(p - a), math.abs(p - b), math.abs(p - c))
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          }
          filtered(o) = (px(row, i) - pred).toByte; o += 1
        }
      }
      val deflater = new java.util.zip.Deflater
      deflater.setInput(filtered)
      deflater.finish()
      val zbuf = new java.io.ByteArrayOutputStream
      val tmp = new Array[Byte](4096)
      while (!deflater.finished())
        zbuf.write(tmp, 0, deflater.deflate(tmp))
      deflater.end()
      val out = new java.io.ByteArrayOutputStream
      out.write(PngSig)
      val ihdr = new Array[Byte](13)
      be32(ihdr, 0, width); be32(ihdr, 4, height)
      ihdr(8) = 8 // bit depth
      ihdr(9) = 2 // color type: truecolor RGB
      pngChunk(out, "IHDR", ihdr)
      pngChunk(out, "IDAT", zbuf.toByteArray)
      pngChunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }

    final case class PngDecoded(width: Int, height: Int, pixelSum: Long,
        weightedSum: Long)

    /** Full PNG parse: signature, chunk walk with per-chunk CRC32
      * verification (a flipped byte anywhere must throw, not mis-decode),
      * IHDR field checks, IDAT inflate, and the five-filter scanline
      * reconstruction. Returns the reconstructed pixel checksum. */
    def decodePng(payload: Array[Byte]): PngDecoded = {
      require(payload.length > 8 &&
        PngSig.indices.forall(i => payload(i) == PngSig(i)),
        "not a PNG signature")
      var off = 8
      var w = 0; var h = 0
      val idat = new java.io.ByteArrayOutputStream
      var sawEnd = false
      while (!sawEnd && off + 12 <= payload.length) {
        val len = rbe32(payload, off)
        // declared length must be validated BEFORE any indexed access: a
        // corrupt negative/oversized len must surface as the typed
        // corrupt-media IOException, not an ArrayIndexOutOfBoundsException
        if (len < 0 || off.toLong + 12 + len > payload.length)
          throw new java.io.IOException(
            s"PNG chunk length $len overruns payload (${payload.length} B)")
        val typ = new String(payload, off + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32
        crc.update(payload, off + 4, 4 + len)
        if (crc.getValue.toInt != rbe32(payload, off + 8 + len))
          throw new java.io.IOException(s"PNG $typ chunk CRC mismatch")
        typ match {
          case "IHDR" =>
            w = rbe32(payload, off + 8)
            h = rbe32(payload, off + 12)
            if (payload(off + 16) != 8 || payload(off + 17) != 2 ||
              payload(off + 20) != 0)
              throw new java.io.IOException("unsupported PNG variant")
          case "IDAT" => idat.write(payload, off + 8, len)
          case "IEND" => sawEnd = true
          case _ => () // ancillary chunks skipped
        }
        off += 12 + len
      }
      if (!sawEnd) throw new java.io.IOException("PNG missing IEND")
      val inflater = new java.util.zip.Inflater
      inflater.setInput(idat.toByteArray)
      val bpp = 3
      val stride = 1 + w * bpp
      val filtered = new Array[Byte](h * stride)
      var got = 0
      while (got < filtered.length && !inflater.finished()) {
        val n = inflater.inflate(filtered, got, filtered.length - got)
        if (n == 0 && inflater.needsInput())
          throw new java.io.IOException("PNG IDAT truncated")
        got += n
      }
      inflater.end()
      if (got != filtered.length)
        throw new java.io.IOException("PNG pixel data short")
      val raw = new Array[Int](w * h * bpp)
      def px(row: Int, i: Int): Int =
        if (i < 0) 0 else raw(row * w * bpp + i)
      var sum = 0L
      var wsum = 0L // Σ pixel_i·(i+1): the q151 dedup fingerprint's 2nd moment
      for (row <- 0 until h) {
        val f = filtered(row * stride) & 0xff
        for (i <- 0 until w * bpp) {
          val x = filtered(row * stride + 1 + i) & 0xff
          val a = px(row, i - bpp)
          val b = if (row == 0) 0 else px(row - 1, i)
          val c = if (row == 0) 0 else px(row - 1, i - bpp)
          val pred = f match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) / 2
            case 4 =>
              val p = a + b - c
              val (pa, pb, pc) =
                (math.abs(p - a), math.abs(p - b), math.abs(p - c))
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            case other =>
              throw new java.io.IOException(s"bad PNG filter $other")
          }
          val v = (x + pred) & 0xff
          val idx = row * w * bpp + i
          raw(idx) = v
          sum += v
          wsum += v.toLong * (idx + 1)
        }
      }
      PngDecoded(w, h, sum, wsum)
    }

    final case class JpegDecoded(width: Int, height: Int, pixelSum: Long)

    /** JPEG encode via the JDK's own `javax.imageio` codec (ships in every
      * stock JDK — no external library). Memory-backed image streams, not
      * ImageIO's default file cache: executor-local codec work must never
      * churn temp files per image. */
    def encodeJpeg(width: Int, height: Int, gray: Int,
        quality: Float = 1f): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val rgb = (gray << 16) | (gray << 8) | gray
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      writer.dispose()
      ios.close()
      out.toByteArray
    }

    /** JPEG decode via `javax.imageio`. The payload must carry the JPEG
      * SOI magic, and a payload ImageIO cannot parse throws the typed
      * corrupt-media IOException (ImageIO.read signals failure by
      * returning null — that must never decode to zeros). Returns
      * dimensions plus the decoded-RGB pixel sum: JPEG is lossy, so
      * callers pin the DECODED checksum, never the encoded bytes. */
    def decodeJpeg(payload: Array[Byte]): JpegDecoded = {
      if (payload.length < 3 || payload(0) != 0xff.toByte ||
        payload(1) != 0xd8.toByte || payload(2) != 0xff.toByte)
        throw new java.io.IOException("not a JPEG SOI marker")
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload)))
      if (img == null)
        throw new java.io.IOException("JPEG decode failed")
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          x += 1
        }
        y += 1
      }
      JpegDecoded(img.getWidth, img.getHeight, sum)
    }

    /** Sniffs the container magic and parses the header fields. WAV walks
      * the RIFF chunk list (fmt /data may be preceded by other chunks in
      * the wild). Throws on anything that is neither — corrupt media must
      * surface, not decode to zeros. */
    def decode(payload: Array[Byte]): Decoded = {
      if (payload.length >= 3 && payload(0) == 0xff.toByte &&
        payload(1) == 0xd8.toByte && payload(2) == 0xff.toByte) {
        val d = decodeJpeg(payload)
        Decoded("jpeg", d.width, d.height, 0, 0, 0)
      } else if (payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M') {
        Decoded("bmp", rd32(payload, 18), rd32(payload, 22), 0, 0, 0)
      } else if (payload.length >= 44 && rd32(payload, 0) == 0x46464952
          && rd32(payload, 8) == 0x45564157) { // "RIFF", "WAVE"
        var off = 12
        var rate = 0; var ch = 0; var dataLen = -1
        while (off + 8 <= payload.length && (rate == 0 || dataLen < 0)) {
          val id = rd32(payload, off)
          val len = rd32(payload, off + 4)
          if (id == 0x20746d66) { // "fmt "
            ch = rd16(payload, off + 10)
            rate = rd32(payload, off + 12)
          } else if (id == 0x61746164) { // "data"
            dataLen = len
          }
          off += 8 + len + (len & 1) // chunks pad to even length
        }
        if (rate <= 0 || ch <= 0 || dataLen < 0)
          throw new java.io.IOException("WAV missing fmt/data chunk")
        Decoded("wav", 0, 0, rate, ch, dataLen / (ch * 2))
      } else throw new java.io.IOException("unknown media container")
    }
  }

  /** Real media table: one REAL container payload per document — BMP for
    * even doc_ids, WAV for odd — every header field a pure function of
    * doc_id so the decode roundtrip is oracle-recomputable. Payload build
    * is a narrow mapPartitions (the corpus-scale shape: payloads are
    * generated/stored next to the row, never shuffled). */
  /** REAL ISO-BMFF (MP4) CONTAINER codec — the metadata layer of the one
    * media family whose CODEC decode (H.264/Opus) is genuinely
    * library-bound and stays stubbed. The container itself is pure byte
    * structure (ISO/IEC 14496-12): length-prefixed boxes with fourcc
    * types, 64-bit `largesize` escapes, version-0/1 time fields, 16.16
    * fixed-point track dimensions — everything a training pipeline needs
    * to filter/route video BEFORE paying for a frame decode (duration,
    * dimensions, codec fourcc, track layout, payload size).
    *
    * Writer emits `ftyp` + `moov(mvhd, trak(tkhd, mdia(mdhd, hdlr,
    * minf(stbl(stsd(avc1/Opus))))) ...)` + `mdat`; the parser is a real
    * recursive box walker (container boxes recursed, unknown boxes
    * skipped by their declared size, truncation always an error). */
  object Mp4 {

    final case class Probe(durationMs: Long, width: Int, height: Int,
        videoCodec: String, audioCodec: String, trackCount: Int,
        mdatBytes: Long)

    private def be16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write((v >>> 8) & 0xff); o.write(v & 0xff)
    }
    private def be32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
      o.write((v >>> 8) & 0xff); o.write(v & 0xff)
    }
    private def be64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
      be32(o, (v >>> 32).toInt); be32(o, v.toInt)
    }
    private def fourcc(o: java.io.ByteArrayOutputStream, s: String): Unit =
      o.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

    /** `size + type + body` box (the standard 32-bit form). */
    private def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      be32(o, 8 + body.length); fourcc(o, typ); o.write(body)
      o.toByteArray
    }

    /** The `size==1` escape: an 8-byte `largesize` follows the type —
      * how real >4 GiB mdat boxes are framed. */
    private def largeBox(typ: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      be32(o, 1); fourcc(o, typ); be64(o, 16L + body.length); o.write(body)
      o.toByteArray
    }

    private def bytes(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(); f(o); o.toByteArray
    }

    /** Deterministic per-id parameters (the oracle replays these). */
    def timescaleOf(id: Long): Long = 600L + (id % 5) * 200L
    def durationUnitsOf(id: Long): Long = 3000L + (id % 1000) * 7L
    def widthOf(id: Long): Int = 160 + (id % 8).toInt * 16
    def heightOf(id: Long): Int = 90 + (id % 6).toInt * 18
    def hasAudioOf(id: Long): Boolean = id % 3 != 0
    def mdatLenOf(id: Long): Int = 64 + (id % 256).toInt

    def encode(id: Long): Array[Byte] = {
      val version = (id % 2).toInt // exercise BOTH mvhd/tkhd/mdhd layouts
      val ts = timescaleOf(id)
      val dur = durationUnitsOf(id)
      val w = widthOf(id); val h = heightOf(id)

      val mvhd = box("mvhd", bytes { o =>
        o.write(version); o.write(0); be16(o, 0) // version + 24-bit flags
        if (version == 1) {
          be64(o, 0L); be64(o, 0L); be32(o, ts.toInt); be64(o, dur)
        } else {
          be32(o, 0); be32(o, 0); be32(o, ts.toInt); be32(o, dur.toInt)
        }
        be32(o, 0x00010000); be16(o, 0x0100); be16(o, 0) // rate, volume
        (0 until 2).foreach(_ => be32(o, 0)) // reserved
        // unity matrix
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(be32(o, _))
        (0 until 6).foreach(_ => be32(o, 0)) // pre_defined
        be32(o, 3) // next_track_ID
      })

      def tkhd(trackId: Int, tw: Int, th: Int) = box("tkhd", bytes { o =>
        o.write(version); o.write(0); be16(o, 7) // flags: enabled+in movie
        if (version == 1) {
          be64(o, 0L); be64(o, 0L); be32(o, trackId); be32(o, 0); be64(o, dur)
        } else {
          be32(o, 0); be32(o, 0); be32(o, trackId); be32(o, 0)
          be32(o, dur.toInt)
        }
        (0 until 2).foreach(_ => be32(o, 0)) // reserved
        be16(o, 0); be16(o, 0); be16(o, 0); be16(o, 0) // layer..reserved
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(be32(o, _))
        be32(o, tw << 16); be32(o, th << 16) // 16.16 fixed
      })

      def mdhd = box("mdhd", bytes { o =>
        o.write(version); o.write(0); be16(o, 0)
        if (version == 1) {
          be64(o, 0L); be64(o, 0L); be32(o, ts.toInt); be64(o, dur)
        } else {
          be32(o, 0); be32(o, 0); be32(o, ts.toInt); be32(o, dur.toInt)
        }
        be16(o, 0x55c4); be16(o, 0) // language 'und', pre_defined
      })

      def hdlr(kind: String) = box("hdlr", bytes { o =>
        be32(o, 0); be32(o, 0); fourcc(o, kind)
        (0 until 3).foreach(_ => be32(o, 0))
        o.write(0) // empty null-terminated name
      })

      // sample entries: only the SampleEntry envelope + the fields the
      // probe surfaces; the codec config blob is a deterministic stub
      // (the H.264/Opus payloads are the part that stays FakeDecoder's)
      def sampleEntry(format: String, body: Array[Byte]) =
        box(format, bytes { o =>
          (0 until 6).foreach(_ => o.write(0)) // reserved
          be16(o, 1) // data_reference_index
          o.write(body)
        })
      val avc1 = sampleEntry("avc1", bytes { o =>
        be16(o, 0); be16(o, 0); (0 until 3).foreach(_ => be32(o, 0))
        be16(o, w); be16(o, h)
        be32(o, 0x00480000); be32(o, 0x00480000) // 72 dpi
        be32(o, 0); be16(o, 1) // frame_count
        val name = "stub".getBytes("US-ASCII")
        o.write(name.length); o.write(name)
        (0 until 31 - name.length).foreach(_ => o.write(0))
        be16(o, 24); be16(o, 0xffff) // depth, pre_defined -1
      })
      val opus = sampleEntry("Opus", bytes { o =>
        (0 until 2).foreach(_ => be32(o, 0)) // reserved
        be16(o, 2); be16(o, 16) // channelcount, samplesize
        be16(o, 0); be16(o, 0)
        be32(o, 48000 << 16) // samplerate 16.16 (Opus-in-ISOBMFF fixes 48k)
      })

      def stsd(entry: Array[Byte]) = box("stsd", bytes { o =>
        be32(o, 0); be32(o, 1); o.write(entry)
      })
      def trak(trackId: Int, kind: String, entry: Array[Byte],
          tw: Int, th: Int) =
        box("trak", tkhd(trackId, tw, th) ++ box("mdia",
          mdhd ++ hdlr(kind) ++ box("minf", box("stbl", stsd(entry)))))

      val traks = trak(1, "vide", avc1, w, h) ++
        (if (hasAudioOf(id)) trak(2, "soun", opus, 0, 0)
         else Array.emptyByteArray)
      val moov = box("moov", mvhd ++ traks)
      val ftyp = box("ftyp", bytes { o =>
        fourcc(o, "isom"); be32(o, 512); fourcc(o, "isom"); fourcc(o, "avc1")
      })
      val mdatBody = Array.tabulate(mdatLenOf(id))(i =>
        ((id * 31 + i * 7) % 251).toByte)
      // even ids take the 64-bit largesize path, odd the 32-bit one
      val mdat =
        if (id % 2 == 0) largeBox("mdat", mdatBody) else box("mdat", mdatBody)
      ftyp ++ moov ++ mdat
    }

    private def rbe16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def rbe32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def rbe64(b: Array[Byte], o: Int): Long =
      (rbe32(b, o) << 32) | rbe32(b, o + 4)
    private def typ(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private val Containers =
      Set("moov", "trak", "mdia", "minf", "stbl")

    /** The real box walk: size/type header, `size==1` → 64-bit largesize,
      * `size==0` → extends to end-of-enclosure; containers recursed,
      * leaves handed to `leaf` with their body range. */
    private def walk(b: Array[Byte], from: Long, to: Long,
        leaf: (String, Long, Long) => Unit): Unit = {
      var off = from
      while (off < to) {
        if (off + 8 > to) throw new java.io.IOException("truncated box header")
        var size = rbe32(b, off.toInt)
        val t = typ(b, off.toInt + 4)
        var hdr = 8L
        if (size == 1) {
          if (off + 16 > to)
            throw new java.io.IOException("truncated largesize")
          size = rbe64(b, off.toInt + 8); hdr = 16L
        } else if (size == 0) size = to - off
        if (size < hdr || off + size > to)
          throw new java.io.IOException(s"box '$t' overruns enclosure")
        if (Containers(t)) walk(b, off + hdr, off + size, leaf)
        else leaf(t, off + hdr, off + size)
        off += size
      }
    }

    def decode(b: Array[Byte]): Probe = {
      if (b.length < 8 || typ(b, 4) != "ftyp")
        throw new java.io.IOException("not an ISO-BMFF file (no ftyp)")
      var timescale = 0L; var duration = -1L
      var width = 0; var height = 0
      var videoCodec = ""; var audioCodec = ""
      var tracks = 0; var mdat = 0L
      // per-trak state: tkhd dims land before hdlr tells us the kind
      var tkW = 0; var tkH = 0; var pendingCodec = ""
      walk(b, 0L, b.length.toLong, { (t, from, to) =>
        val o = from.toInt
        t match {
          case "mvhd" =>
            val v = b(o) & 0xff
            if (v == 1) { timescale = rbe32(b, o + 20); duration = rbe64(b, o + 24) }
            else { timescale = rbe32(b, o + 12); duration = rbe32(b, o + 16) }
          case "tkhd" =>
            tracks += 1
            val v = b(o) & 0xff
            val dimOff = o + (if (v == 1) 96 else 84) - 8
            tkW = (rbe32(b, dimOff) >>> 16).toInt
            tkH = (rbe32(b, dimOff + 4) >>> 16).toInt
          case "stsd" =>
            if (rbe32(b, o + 4) >= 1) pendingCodec = typ(b, o + 12)
          case "hdlr" =>
            typ(b, o + 8) match {
              case "vide" => width = tkW; height = tkH
              case _ => ()
            }
          case "mdat" => mdat += to - from
          case _ => ()
        }
        // hdlr arrives before stsd inside mdia, so bind the codec kind
        // when the stsd closes: classify by the entry fourcc itself
        if (t == "stsd" && pendingCodec.nonEmpty) {
          if (pendingCodec == "avc1") videoCodec = pendingCodec
          else audioCodec = pendingCodec
          pendingCodec = ""
        }
      })
      if (timescale <= 0 || duration < 0)
        throw new java.io.IOException("missing mvhd")
      Probe(duration * 1000L / timescale, width, height, videoCodec,
        audioCodec, tracks, mdat)
    }
  }

  /** REAL EBML/Matroska (WebM) CONTAINER codec — the other dominant video
    * wrapper, structurally unlike ISO-BMFF: elements are (ID, size, body)
    * where both ID and size are EBML variable-length integers whose
    * LENGTH is encoded by the leading byte's marker-bit position (the
    * UTF-8 idea applied to integers), and a master element may carry the
    * reserved ALL-ONES "unknown size" and simply run to the end of its
    * enclosure — the live-streaming form real muxers emit for Segment.
    * The walker handles both; the codec payloads (VP9/Opus) stay
    * stubbed as library-bound, exactly like [[Mp4]]. */
  object Ebml {

    final case class Probe(durationMs: Long, width: Int, height: Int,
        videoCodec: String, audioCodec: String, trackCount: Int,
        clusterBytes: Long)

    // canonical element IDs (Matroska/WebM public registry), stored as
    // their on-disk byte sequences (IDs keep their marker bit)
    private val IdEbml = Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte)
    private val IdDocType = Array(0x42, 0x82).map(_.toByte)
    private val IdSegment = Array(0x18, 0x53, 0x80, 0x67).map(_.toByte)
    private val IdInfo = Array(0x15, 0x49, 0xA9, 0x66).map(_.toByte)
    private val IdTimestampScale = Array(0x2A, 0xD7, 0xB1).map(_.toByte)
    private val IdDuration = Array(0x44, 0x89).map(_.toByte)
    private val IdTracks = Array(0x16, 0x54, 0xAE, 0x6B).map(_.toByte)
    private val IdTrackEntry = Array(0xAE).map(_.toByte)
    private val IdTrackType = Array(0x83).map(_.toByte)
    private val IdCodecId = Array(0x86).map(_.toByte)
    private val IdVideo = Array(0xE0).map(_.toByte)
    private val IdPixelWidth = Array(0xB0).map(_.toByte)
    private val IdPixelHeight = Array(0xBA).map(_.toByte)
    private val IdAudio = Array(0xE1).map(_.toByte)
    private val IdChannels = Array(0x9F).map(_.toByte)
    private val IdCluster = Array(0x1F, 0x43, 0xB6, 0x75).map(_.toByte)
    private val IdSimpleBlock = Array(0xA3).map(_.toByte)

    /** Size vint: shortest length whose 7·len-bit payload holds the value
      * (the all-ones payload is reserved for "unknown"). */
    private def encodeSize(v: Long): Array[Byte] = {
      var len = 1
      while (len < 8 && v >= (1L << (7 * len)) - 1) len += 1
      val out = new Array[Byte](len)
      var i = len - 1
      var rest = v
      while (i >= 0) { out(i) = (rest & 0xff).toByte; rest >>>= 8; i -= 1 }
      out(0) = (out(0) | (0x80 >>> (len - 1))).toByte
      out
    }

    /** The reserved unknown-size vint (1-byte form 0xFF). */
    private val UnknownSize = Array(0xFF.toByte)

    private def bytesOf(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(); f(o); o.toByteArray
    }

    private def element(id: Array[Byte], body: Array[Byte]): Array[Byte] =
      bytesOf { o => o.write(id); o.write(encodeSize(body.length.toLong))
        o.write(body) }

    /** Big-endian minimal-length unsigned integer body. */
    private def uintBody(v: Long): Array[Byte] = {
      var len = 1
      while (len < 8 && v >= (1L << (8 * len))) len += 1
      val out = new Array[Byte](len)
      var i = len - 1; var rest = v
      while (i >= 0) { out(i) = (rest & 0xff).toByte; rest >>>= 8; i -= 1 }
      out
    }

    private def floatBody(v: Double): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putDouble(v).array()

    // deterministic per-id parameters (the oracle replays these)
    def durationMsOf(id: Long): Long = 2000L + (id % 997) * 3L
    def widthOf(id: Long): Int = 320 + (id % 16).toInt * 8
    def heightOf(id: Long): Int = 180 + (id % 9).toInt * 12
    def hasAudioOf(id: Long): Boolean = id % 4 != 0
    def clusterLenOf(id: Long): Int = 32 + (id % 512).toInt

    def encode(id: Long): Array[Byte] = {
      val header = element(IdEbml,
        element(IdDocType, "webm".getBytes("US-ASCII")))
      val info = element(IdInfo,
        element(IdTimestampScale, uintBody(1000000L)) ++
          element(IdDuration, floatBody(durationMsOf(id).toDouble)))
      def track(tpe: Long, codec: String, extra: Array[Byte]) =
        element(IdTrackEntry,
          element(IdTrackType, uintBody(tpe)) ++
            element(IdCodecId, codec.getBytes("US-ASCII")) ++ extra)
      val video = track(1L, "V_VP9",
        element(IdVideo,
          element(IdPixelWidth, uintBody(widthOf(id).toLong)) ++
            element(IdPixelHeight, uintBody(heightOf(id).toLong))))
      val audio =
        if (hasAudioOf(id))
          track(2L, "A_OPUS", element(IdAudio,
            element(IdChannels, uintBody(2L))))
        else Array.emptyByteArray
      val tracks = element(IdTracks, video ++ audio)
      val cluster = element(IdCluster,
        element(IdSimpleBlock, Array.tabulate(clusterLenOf(id))(i =>
          ((id * 17 + i * 5) % 251).toByte)))
      val segBody = info ++ tracks ++ cluster
      // odd ids: the live-streaming form — Segment declares UNKNOWN size
      // and runs to end of file; even ids: the normal sized form
      val segment =
        if (id % 2 == 1) bytesOf { o =>
          o.write(IdSegment); o.write(UnknownSize); o.write(segBody)
        }
        else element(IdSegment, segBody)
      header ++ segment
    }

    /** Reads one vint at `off`; returns (value, lengthBytes, isAllOnes).
      * For IDs the caller keeps the raw bytes instead. */
    private def readVint(b: Array[Byte], off: Long,
        to: Long): (Long, Int, Boolean) = {
      if (off >= to) throw new java.io.IOException("truncated vint")
      val first = b(off.toInt) & 0xff
      if (first == 0) throw new java.io.IOException("invalid vint lead 0x00")
      val len = java.lang.Integer.numberOfLeadingZeros(first) - 23
      if (off + len > to) throw new java.io.IOException("truncated vint body")
      var v = (first & (0xff >>> len)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b((off + i).toInt) & 0xff); i += 1 }
      val allOnes = v == (1L << (7 * len)) - 1
      (v, len, allOnes)
    }

    private def idLen(b: Array[Byte], off: Long): Int = {
      val first = b(off.toInt) & 0xff
      if (first == 0) throw new java.io.IOException("invalid id lead 0x00")
      java.lang.Integer.numberOfLeadingZeros(first) - 23
    }

    private def sameId(b: Array[Byte], off: Long, len: Int,
        id: Array[Byte]): Boolean =
      len == id.length && id.indices.forall(i => b(off.toInt + i) == id(i))

    private val Masters = Seq(IdSegment, IdInfo, IdTracks, IdTrackEntry,
      IdVideo, IdAudio, IdCluster)

    private def readUint(b: Array[Byte], from: Long, to: Long): Long = {
      var v = 0L
      var i = from
      while (i < to) { v = (v << 8) | (b(i.toInt) & 0xff); i += 1 }
      v
    }

    def decode(b: Array[Byte]): Probe = {
      var timescale = 0L; var durationMs = -1L
      var width = 0; var height = 0
      var videoCodec = ""; var audioCodec = ""
      var tracks = 0; var clusterBytes = 0L
      var trackType = 0L; var trackCodec = ""
      def walk(from: Long, to: Long): Unit = {
        var off = from
        while (off < to) {
          val il = idLen(b, off)
          if (il < 1 || il > 4 || off + il > to)
            throw new java.io.IOException("bad element id")
          val idOff = off
          val (size, sl, unknown) = readVint(b, off + il, to)
          val bodyFrom = off + il + sl
          val bodyTo = if (unknown) to else bodyFrom + size
          if (bodyTo > to)
            throw new java.io.IOException("element overruns enclosure")
          def is(id: Array[Byte]) = sameId(b, idOff, il, id)
          if (is(IdTrackEntry)) { trackType = 0L; trackCodec = "" }
          if (Masters.exists(is)) walk(bodyFrom, bodyTo)
          else if (is(IdTimestampScale)) timescale = readUint(b, bodyFrom, bodyTo)
          else if (is(IdDuration)) {
            if (bodyTo - bodyFrom != 8)
              throw new java.io.IOException("non-f64 Duration unsupported")
            durationMs = java.nio.ByteBuffer
              .wrap(b, bodyFrom.toInt, 8).getDouble.toLong
          }
          else if (is(IdTrackType)) trackType = readUint(b, bodyFrom, bodyTo)
          else if (is(IdCodecId))
            trackCodec = new String(b, bodyFrom.toInt,
              (bodyTo - bodyFrom).toInt, "US-ASCII")
          else if (is(IdPixelWidth)) width = readUint(b, bodyFrom, bodyTo).toInt
          else if (is(IdPixelHeight)) height = readUint(b, bodyFrom, bodyTo).toInt
          else if (is(IdSimpleBlock)) clusterBytes += bodyTo - bodyFrom
          if (is(IdTrackEntry)) {
            tracks += 1
            if (trackType == 1L) videoCodec = trackCodec
            else if (trackType == 2L) audioCodec = trackCodec
          }
          off = bodyTo
        }
      }
      if (b.length < 4 || !sameId(b, 0L, 4, IdEbml))
        throw new java.io.IOException("not an EBML file")
      walk(0L, b.length.toLong)
      if (timescale != 1000000L || durationMs < 0)
        throw new java.io.IOException("missing Info")
      Probe(durationMs, width, height, videoCodec, audioCodec, tracks,
        clusterBytes)
    }
  }

  /** q119: REAL WebM/Matroska container probe — EBML marker-bit varints,
    * master-element recursion, and the unknown-size streaming Segment on
    * odd ids; the oracle replays the per-id parameter formulas. Narrow
    * end to end like q113. */
  def webmProbe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val p = Ebml.decode(Ebml.encode(id))
          (id, p.durationMs, p.width.toLong, p.height.toLong,
            p.videoCodec, p.audioCodec, p.trackCount.toLong, p.clusterBytes)
        }
      }
      .toDF("doc_id", "duration_ms", "width", "height", "video_codec",
        "audio_codec", "tracks", "cluster_bytes")
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** REAL Ogg TRANSPORT codec (the container Opus audio actually ships
    * in): page framing with the spec's own unreflected CRC-32 (poly
    * 0x04C11DB7, init 0, CRC field zeroed during computation), BOS/EOS
    * flags, 64-bit granule positions, and the LACING rule — a packet is a
    * run of 255-valued lacing segments ended by one < 255, and a packet
    * whose page ends on a 255 CONTINUES onto the next page (header flag
    * 0x01), which the reader must stitch. OpusHead/OpusTags parse per
    * RFC 7845; the Opus audio payload itself stays the stub's. */
  object Ogg {

    final case class Probe(channels: Int, preskip: Int, inputRate: Long,
        audioBytes: Long, packets: Int, granule: Long, pages: Int)

    def channelsOf(id: Long): Int = 1 + (id % 2).toInt
    def preskipOf(id: Long): Int = 312 + (id % 100).toInt
    def audioLenOf(id: Long): Int = 300 + (id % 700).toInt
    def granuleOf(id: Long): Long = 960L * (id % 8 + 1)

    /** The Ogg CRC-32: unreflected, polynomial 0x04C11DB7, init 0, no
      * final xor (NOT the zlib crc32). */
    private val CrcTable: Array[Int] = Array.tabulate(256) { i =>
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
        j += 1
      }
      r
    }

    private def crc(b: Array[Byte]): Int = {
      var c = 0
      var i = 0
      while (i < b.length) {
        c = (c << 8) ^ CrcTable(((c >>> 24) ^ (b(i) & 0xff)) & 0xff)
        i += 1
      }
      c
    }

    private def le(o: java.io.ByteArrayOutputStream, v: Long,
        bytes: Int): Unit = {
      var i = 0
      while (i < bytes) { o.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }

    /** One page. `lacings` describe the payload's packet segmentation;
      * the CRC is computed with its own field zeroed, then patched in. */
    private def page(headerType: Int, granule: Long, serial: Long,
        seq: Long, lacings: Array[Int], payload: Array[Byte]): Array[Byte] = {
      require(lacings.sum == payload.length && lacings.length <= 255)
      val o = new java.io.ByteArrayOutputStream()
      o.write("OggS".getBytes("US-ASCII"))
      o.write(0) // version
      o.write(headerType)
      le(o, granule, 8); le(o, serial, 4); le(o, seq, 4)
      le(o, 0L, 4) // CRC placeholder
      o.write(lacings.length)
      lacings.foreach(o.write)
      o.write(payload)
      val bytes = o.toByteArray
      val c = crc(bytes)
      bytes(22) = (c & 0xff).toByte
      bytes(23) = ((c >>> 8) & 0xff).toByte
      bytes(24) = ((c >>> 16) & 0xff).toByte
      bytes(25) = ((c >>> 24) & 0xff).toByte
      bytes
    }

    /** Lacing run for a packet that ENDS in this page. */
    private def lacingsOf(len: Int): Array[Int] = {
      val full = len / 255
      val rem = len % 255
      Array.fill(full)(255) :+ rem // rem == 0 terminates a 255-multiple
    }

    def encode(id: Long): Array[Byte] = {
      val serial = 0x6772616CL + (id % 97) // deterministic per id
      val head = {
        val o = new java.io.ByteArrayOutputStream()
        o.write("OpusHead".getBytes("US-ASCII"))
        o.write(1) // version
        o.write(channelsOf(id))
        le(o, preskipOf(id).toLong, 2)
        le(o, 48000L, 4) // input sample rate (informational, fixed 48k)
        le(o, 0L, 2) // output gain
        o.write(0) // mapping family
        o.toByteArray
      }
      val tags = {
        val o = new java.io.ByteArrayOutputStream()
        o.write("OpusTags".getBytes("US-ASCII"))
        val vendor = "graft".getBytes("US-ASCII")
        le(o, vendor.length.toLong, 4); o.write(vendor)
        le(o, 0L, 4) // no comments
        o.toByteArray
      }
      val audio = Array.tabulate(audioLenOf(id))(i =>
        ((id * 13 + i * 11) % 251).toByte)
      // the audio packet SPANS two pages: page 2 carries exactly 255
      // bytes under a single 255 lacing (unterminated), page 3 continues
      // it (header flag 0x01) and terminates with a proper lacing run
      val part1 = java.util.Arrays.copyOfRange(audio, 0, 255)
      val part2 = java.util.Arrays.copyOfRange(audio, 255, audio.length)
      page(0x02, 0L, serial, 0L, lacingsOf(head.length), head) ++
        page(0x00, 0L, serial, 1L, lacingsOf(tags.length), tags) ++
        page(0x00, -1L, serial, 2L, Array(255), part1) ++
        page(0x04 | 0x01, granuleOf(id), serial, 3L,
          lacingsOf(part2.length), part2)
    }

    def decode(b: Array[Byte]): Probe = {
      var off = 0
      var pages = 0
      var serial = Long.MinValue
      var lastSeq = -1L
      var granule = 0L
      var sawEos = false
      val packets = Vector.newBuilder[Array[Byte]]
      var pending = new java.io.ByteArrayOutputStream()
      var midPacket = false
      while (off < b.length) {
        if (sawEos) throw new java.io.IOException("data past EOS page")
        if (off + 27 > b.length)
          throw new java.io.IOException("truncated page header")
        if (!(b(off) == 'O' && b(off + 1) == 'g' && b(off + 2) == 'g' &&
            b(off + 3) == 'S'))
          throw new java.io.IOException("bad capture pattern")
        if (b(off + 4) != 0)
          throw new java.io.IOException("unsupported Ogg version")
        val hType = b(off + 5) & 0xff
        def rle(from: Int, n: Int): Long = {
          var v = 0L
          var i = n - 1
          while (i >= 0) { v = (v << 8) | (b(off + from + i) & 0xff); i -= 1 }
          v
        }
        val g = rle(6, 8)
        val ser = rle(14, 4)
        val seq = rle(18, 4)
        val storedCrc = rle(22, 4).toInt
        val nSegs = b(off + 26) & 0xff
        if (off + 27 + nSegs > b.length)
          throw new java.io.IOException("truncated segment table")
        val lacings = Array.tabulate(nSegs)(i => b(off + 27 + i) & 0xff)
        val payloadLen = lacings.sum
        val end = off + 27 + nSegs + payloadLen
        if (end > b.length) throw new java.io.IOException("truncated page")
        // CRC over the page with its CRC field zeroed
        val copy = java.util.Arrays.copyOfRange(b, off, end)
        copy(22) = 0; copy(23) = 0; copy(24) = 0; copy(25) = 0
        if (crc(copy) != storedCrc)
          throw new java.io.IOException(s"page $seq CRC mismatch")
        if (serial == Long.MinValue) serial = ser
        else if (ser != serial)
          throw new java.io.IOException("serial changed mid-stream")
        if (seq != lastSeq + 1)
          throw new java.io.IOException(s"page sequence gap at $seq")
        lastSeq = seq
        if (((hType & 0x01) != 0) != midPacket)
          throw new java.io.IOException("continuation flag mismatch")
        if ((hType & 0x04) != 0) { sawEos = true; granule = g }
        var p = off + 27 + nSegs
        lacings.foreach { l =>
          pending.write(b, p, l)
          p += l
          if (l < 255) {
            packets += pending.toByteArray
            pending = new java.io.ByteArrayOutputStream()
            midPacket = false
          } else midPacket = true
        }
        pages += 1
        off = end
      }
      if (!sawEos) throw new java.io.IOException("no EOS page")
      if (midPacket) throw new java.io.IOException("unterminated packet")
      val pkts = packets.result()
      if (pkts.isEmpty ||
          !pkts.head.startsWith("OpusHead".getBytes("US-ASCII")))
        throw new java.io.IOException("first packet is not OpusHead")
      val head = pkts.head
      val channels = head(9) & 0xff
      val preskip = (head(10) & 0xff) | ((head(11) & 0xff) << 8)
      val rate = (head(12) & 0xffL) | ((head(13) & 0xffL) << 8) |
        ((head(14) & 0xffL) << 16) | ((head(15) & 0xffL) << 24)
      if (pkts.length < 2 ||
          !pkts(1).startsWith("OpusTags".getBytes("US-ASCII")))
        throw new java.io.IOException("second packet is not OpusTags")
      val audioBytes = pkts.drop(2).map(_.length.toLong).sum
      Probe(channels, preskip, rate, audioBytes, pkts.length, granule,
        pages)
    }
  }

  /** REAL H.264 BITSTREAM-HEADER codec — the layer of the one remaining
    * video stub that is pure byte/bit structure, no DSP: Annex-B NAL
    * framing (start codes, forbidden_zero_bit, nal_ref_idc, types) with
    * the EMULATION-PREVENTION rule (any 0x000000/1/2/3 in the RBSP is
    * escaped to 0x000003xx on the wire; the parser must strip the 0x03),
    * and the Sequence Parameter Set parsed field-by-field with real
    * Exp-Golomb ue(v) coding — profile/level, frame numbering ranges,
    * reference frame count, and the macroblock-grid dimensions that yield
    * the picture's width/height. Everything below slice data (macroblock
    * entropy decode, the actual DSP) stays the stub's. */
  object H264 {

    final case class Sps(profile: Int, level: Int, width: Int, height: Int,
        maxRefFrames: Int, nalCount: Int)

    private final class BitWriter {
      val out = new java.io.ByteArrayOutputStream()
      private var acc = 0
      private var n = 0
      def bit(v: Int): Unit = {
        acc = (acc << 1) | (v & 1); n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
      }
      def bits(v: Long, count: Int): Unit =
        (count - 1 to 0 by -1).foreach(i => bit(((v >> i) & 1).toInt))
      /** Exp-Golomb ue(v): leadingZeros(bitlen(v+1)-1) zeros + (v+1). */
      def ue(v: Long): Unit = {
        val x = v + 1
        val len = 64 - java.lang.Long.numberOfLeadingZeros(x)
        bits(0L, len - 1); bits(x, len)
      }
      /** rbsp_trailing_bits: stop bit + align. */
      def stop(): Unit = { bit(1); while (n != 0) bit(0) }
    }

    private final class BitReader(b: Array[Byte]) {
      private var pos = 0
      private var bitPos = 0
      def bit(): Int = {
        if (pos >= b.length)
          throw new java.io.IOException("truncated RBSP")
        val v = (b(pos) >> (7 - bitPos)) & 1
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; pos += 1 }
        v
      }
      def bits(count: Int): Long =
        (0 until count).foldLeft(0L)((a, _) => (a << 1) | bit())
      def ue(): Long = {
        var zeros = 0
        while (bit() == 0) {
          zeros += 1
          if (zeros > 32) throw new java.io.IOException("ue(v) overflow")
        }
        ((1L << zeros) | bits(zeros)) - 1
      }
    }

    /** Escape the RBSP: any 00 00 0x (x<=3) gets an emulation-prevention
      * 03 inserted — the defining wire quirk of H.264 byte streams. */
    private def escape(rbsp: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      var zeros = 0
      rbsp.foreach { by =>
        if (zeros >= 2 && (by & 0xff) <= 3) { o.write(3); zeros = 0 }
        o.write(by & 0xff)
        zeros = if (by == 0) zeros + 1 else 0
      }
      o.toByteArray
    }

    private def unescape(b: Array[Byte], from: Int, to: Int): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      var zeros = 0
      var i = from
      while (i < to) {
        val by = b(i) & 0xff
        if (zeros >= 2 && by == 3) zeros = 0 // strip emulation prevention
        else {
          o.write(by)
          zeros = if (by == 0) zeros + 1 else 0
        }
        i += 1
      }
      o.toByteArray
    }

    def widthOf(id: Long): Int = (8 + (id % 113).toInt) * 16
    def heightOf(id: Long): Int = (5 + (id % 61).toInt) * 16
    def refFramesOf(id: Long): Int = 1 + (id % 4).toInt
    /** Baseline/Main/Extended — the profiles whose SPS has no chroma
      * block (High-profile SPS adds chroma_format_idc and scaling lists,
      * which this header-layer parser rejects rather than half-reads). */
    def profileOf(id: Long): Int = Seq(66, 77, 88)((id % 3).toInt)

    /** An Annex-B stream: SPS + PPS + one (stub-payload) IDR NAL. */
    def encode(id: Long): Array[Byte] = {
      val w = new BitWriter
      w.bits(profileOf(id).toLong, 8)
      w.bits(0L, 8) // constraint flags + reserved
      w.bits(31L, 8) // level_idc 3.1
      w.ue(0L) // seq_parameter_set_id
      w.ue(4L) // log2_max_frame_num_minus4
      w.ue(0L) // pic_order_cnt_type
      w.ue(4L) // log2_max_pic_order_cnt_lsb_minus4
      w.ue(refFramesOf(id).toLong) // max_num_ref_frames
      w.bit(0) // gaps_in_frame_num_value_allowed
      w.ue(widthOf(id).toLong / 16 - 1) // pic_width_in_mbs_minus1
      w.ue(heightOf(id).toLong / 16 - 1) // pic_height_in_map_units_minus1
      w.bit(1) // frame_mbs_only
      w.bit(1) // direct_8x8_inference
      w.bit(0) // frame_cropping
      w.bit(0) // vui_parameters_present
      w.stop()
      val sps = w.out.toByteArray
      val o = new java.io.ByteArrayOutputStream()
      def nal(refIdc: Int, typ: Int, rbsp: Array[Byte]): Unit = {
        o.write(0); o.write(0); o.write(0); o.write(1) // start code
        o.write((refIdc << 5) | typ)
        o.write(escape(rbsp))
      }
      nal(3, 7, sps)
      // PPS: ids 0/0, entropy CAVLC, minimal flags — parsed only as a NAL
      val p = new BitWriter
      p.ue(0L); p.ue(0L); p.bit(0); p.bit(0); p.ue(0L); p.ue(0L); p.ue(0L)
      p.bit(0); p.bits(0L, 2); p.ue(0L); p.ue(0L); p.ue(0L); p.bit(0)
      p.bit(0); p.bit(0); p.stop()
      nal(3, 8, p.out.toByteArray)
      // IDR slice payload: deterministic STUB bytes crafted to NEED
      // emulation prevention (every 16 bytes a 00 00 0x run with
      // x <= 3) — proves the escape/unescape path on the wire
      val slice = Array.tabulate(64 + (id % 64).toInt) { i =>
        if (i % 16 < 2) 0.toByte
        else if (i % 16 == 2) ((i / 16 + id) % 4).toByte
        else ((id * 19 + i * 3) % 251).toByte
      }
      nal(3, 5, slice)
      o.toByteArray
    }

    def decode(b: Array[Byte]): Sps = {
      // Annex-B scan: split on 00 00 (00) 01 start codes
      val starts = Vector.newBuilder[Int]
      var i = 0
      while (i + 3 < b.length) {
        if (b(i) == 0 && b(i + 1) == 0 &&
            (b(i + 2) == 1 || (b(i + 2) == 0 && i + 3 < b.length &&
              b(i + 3) == 1)))
          starts += (if (b(i + 2) == 1) i + 3 else i + 4)
        i += 1
      }
      val ss = starts.result().distinct.sorted
      if (ss.isEmpty) throw new java.io.IOException("no NAL start code")
      var sps: Sps = null
      var count = 0
      ss.zipAll(ss.drop(1), -1, b.length).foreach { case (from, toRaw) =>
        // the next start code begins 3-4 bytes before its payload start
        val to = if (toRaw == b.length) toRaw
        else if (b(toRaw - 4) == 0) toRaw - 4 else toRaw - 3
        if (from >= to) throw new java.io.IOException("empty NAL")
        val hdr = b(from) & 0xff
        if ((hdr & 0x80) != 0)
          throw new java.io.IOException("forbidden_zero_bit set")
        count += 1
        if ((hdr & 0x1f) == 7) {
          val rbsp = unescape(b, from + 1, to)
          val r = new BitReader(rbsp)
          val profile = r.bits(8).toInt
          r.bits(8) // constraints
          val level = r.bits(8).toInt
          if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128).contains(profile))
            throw new java.io.IOException("high-profile SPS unsupported")
          r.ue() // sps id
          r.ue() // log2_max_frame_num_minus4
          val poc = r.ue()
          if (poc == 0) r.ue()
          else if (poc != 2)
            throw new java.io.IOException(s"poc type $poc unsupported")
          val refs = r.ue().toInt
          r.bit() // gaps allowed
          val wMbs = r.ue() + 1
          val hMap = r.ue() + 1
          val frameOnly = r.bit()
          if (frameOnly == 0) r.bit() // mb_adaptive
          r.bit() // direct_8x8
          val crop = r.bit()
          if (crop == 1) { r.ue(); r.ue(); r.ue(); r.ue() }
          sps = Sps(profile, level, (wMbs * 16).toInt,
            (hMap * 16 * (if (frameOnly == 1) 1 else 2)).toInt, refs, 0)
        }
      }
      if (sps == null) throw new java.io.IOException("no SPS in stream")
      sps.copy(nalCount = count)
    }
  }

  /** q123: REAL H.264 bitstream-header probe — Annex-B NAL walk with
    * emulation-prevention stripping (the IDR stub payload is crafted to
    * force escapes on the wire) and a field-by-field Exp-Golomb SPS
    * parse; the oracle replays profile/dims/ref-frame formulas. Only the
    * slice-data DSP below this layer remains stubbed. */
  def h264Probe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val s = H264.decode(H264.encode(id))
          (id, s.profile.toLong, s.level.toLong, s.width.toLong,
            s.height.toLong, s.maxRefFrames.toLong, s.nalCount.toLong)
        }
      }
      .toDF("doc_id", "profile", "level", "width", "height", "ref_frames",
        "nals")
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** REAL Opus packet TOC codec (RFC 6716 §3) — the self-delimiting
    * packet layer above the DSP: the 1-byte TOC (config → mode +
    * bandwidth + frame duration; stereo flag; frame-count code) and the
    * code-dependent framing (code 0 one frame; code 1 two equal; code 2
    * two with a 1-2-byte length prefix; code 3 CBR/VBR with padding).
    * Everything a router/splitter needs from an Opus stream without
    * touching the codec. */
  object OpusToc {

    final case class Toc(config: Int, stereo: Boolean, frames: Int,
        durationUs: Long, payloadBytes: Long)

    /** Frame duration per config (RFC 6716 table): SILK 10/20/40/60 ms,
      * hybrid 10/20, CELT 2.5/5/10/20. */
    def durationUsOf(config: Int): Long = {
      val idx = config match {
        case c if c < 12 => c % 4 // SILK: 10/20/40/60
        case c if c < 16 => (c % 2) + 4 // hybrid: 10/20
        case c => c % 4 + 6 // CELT: 2.5/5/10/20
      }
      Array(10000L, 20000L, 40000L, 60000L, 10000L, 20000L,
        2500L, 5000L, 10000L, 20000L)(idx)
    }

    def configOf(id: Long): Int = (id % 32).toInt
    def stereoOf(id: Long): Boolean = id % 2 == 1
    def codeOf(id: Long): Int = (id % 4).toInt
    def frameLenOf(id: Long): Int = 20 + (id % 200).toInt

    def encode(id: Long): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      val code = codeOf(id)
      o.write((configOf(id) << 3) | (if (stereoOf(id)) 4 else 0) | code)
      val fl = frameLenOf(id)
      def frame(): Unit =
        (0 until fl).foreach(i => o.write(((id * 23 + i * 7) % 251).toInt))
      code match {
        case 0 => frame()
        case 1 => frame(); frame() // two EQUAL frames, no length bytes
        case 2 =>
          // first frame's length self-delimited: 1 byte if < 252, else
          // 252 + second_byte*4 in two bytes
          if (fl < 252) o.write(fl)
          else { o.write(252 + (fl - 252) % 4); o.write((fl - 252) / 4) }
          frame(); frame()
        case _ =>
          o.write(3) // frame count 3, CBR, no padding
          frame(); frame(); frame()
      }
      o.toByteArray
    }

    def decode(b: Array[Byte]): Toc = {
      if (b.isEmpty) throw new java.io.IOException("empty Opus packet")
      val toc = b(0) & 0xff
      val config = toc >> 3
      val stereo = (toc & 4) != 0
      var off = 1
      def remaining = b.length - off
      val frames = (toc & 3) match {
        case 0 => 1
        case 1 =>
          if (remaining % 2 != 0)
            throw new java.io.IOException("code-1 frames must split evenly")
          2
        case 2 =>
          if (remaining < 1) throw new java.io.IOException("truncated code 2")
          val b1 = b(off) & 0xff
          val len1 =
            if (b1 < 252) { off += 1; b1 }
            else {
              if (remaining < 2)
                throw new java.io.IOException("truncated length")
              val v = b1 + (b(off + 1) & 0xff) * 4; off += 2; v
            }
          if (remaining < len1)
            throw new java.io.IOException("frame 1 overruns packet")
          2
        case _ =>
          if (remaining < 1) throw new java.io.IOException("truncated code 3")
          val fc = b(off) & 0xff
          off += 1
          if ((fc & 0x80) != 0)
            throw new java.io.IOException("VBR code-3 unsupported")
          if ((fc & 0x40) != 0)
            throw new java.io.IOException("padded code-3 unsupported")
          val n = fc & 0x3f
          if (n == 0) throw new java.io.IOException("zero frame count")
          if (remaining % n != 0)
            throw new java.io.IOException("CBR frames must split evenly")
          n
      }
      Toc(config, stereo, frames,
        durationUsOf(config) * frames, (b.length - 1).toLong)
    }
  }

  /** q124: REAL Opus packet-TOC probe — all four framing codes exercised
    * by id residue, mode/bandwidth/duration recovered from the config
    * field; the DSP below the packet layer is the stub's last audio
    * occupant. */
  def opusTocProbe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val t = OpusToc.decode(OpusToc.encode(id))
          (id, t.config.toLong, if (t.stereo) 1L else 0L, t.frames.toLong,
            t.durationUs, t.payloadBytes)
        }
      }
      .toDF("doc_id", "config", "stereo", "frames", "duration_us",
        "payload_bytes")
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** q122: REAL Ogg/Opus transport probe — page CRCs (the spec's own
    * polynomial), lacing-run packet reassembly INCLUDING a packet that
    * spans a page boundary via the continuation flag, BOS/EOS, granule
    * positions, RFC 7845 OpusHead/OpusTags. The Opus audio payload stays
    * stubbed; everything wrapping it is now real. Narrow end to end. */
  def oggProbe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val p = Ogg.decode(Ogg.encode(id))
          (id, p.channels.toLong, p.preskip.toLong, p.inputRate,
            p.audioBytes, p.packets.toLong, p.granule, p.pages.toLong)
        }
      }
      .toDF("doc_id", "channels", "preskip", "input_rate", "audio_bytes",
        "packets", "granule", "pages")
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** q120: REAL FLAC decode roundtrip ([[graft.ops.Flac]]) — every
    * document gets a deterministic mono/16-bit FLAC stream (samples,
    * fixed-predictor order 0/1/2 and rate are pure functions of doc_id),
    * then the full decoder reconstructs the exact PCM through the
    * predictor algebra: bit-level frame header with CRC-8, rice-coded
    * residuals (zigzag, unary + k-bit), CRC-16 footer. The decoded sample
    * sum equals the generator formula's sum, which the oracle recomputes
    * in SQL — lossless audio is now a REAL codec; Opus (lossy, DSP-bound)
    * is the stub's only remaining audio occupant. Narrow end to end. */
  def flacDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val d = graft.ops.Flac.decode(graft.ops.Flac.encode(id))
          (id, d.sampleRate.toLong, d.nSamples.toLong, d.order.toLong,
            d.sampleSum)
        }
      }
      .toDF("doc_id", "sample_rate", "n_samples", "pred_order",
        "sample_sum")
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** q113: REAL MP4 container probe — every document gets a deterministic
    * ISO-BMFF file (both mvhd/tkhd version layouts, the 64-bit largesize
    * mdat escape on even ids) and the box walker parses every surfaced
    * field back out; the oracle replays the per-id parameter formulas.
    * Narrow end to end (encode+decode in one mapPartitions; only the
    * final presentation sort exchanges). */
  def mp4Probe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val p = Mp4.decode(Mp4.encode(id))
          (id, p.durationMs, p.width.toLong, p.height.toLong,
            p.videoCodec, p.audioCodec, p.trackCount.toLong, p.mdatBytes)
        }
      }
      .toDF("doc_id", "duration_ms", "width", "height", "video_codec",
        "audio_codec", "tracks", "mdat_bytes")
      .localCheckpoint()
      .orderBy("doc_id")
  }

  def realMediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          if (id % 2 == 0)
            MediaRow(id, "bmp", RealCodecs.encodeBmp(
              4 + (id % 32).toInt, 4 + (id % 24).toInt, id))
          else
            MediaRow(id, "wav", RealCodecs.encodeWav(
              8000 + (id % 8).toInt * 1000, 1 + (id % 2).toInt,
              100 + (id % 400).toInt, id))
        }
      }
  }

  /** q97: REAL PNG decode roundtrip — every document gets a deterministic
    * 8-bit RGB PNG (dimensions and the raw pixel stream are pure functions
    * of doc_id), then the decoder parses it fully back out: CRC32-checked
    * chunk walk, IDAT zlib inflate, five-filter scanline reconstruction.
    * The emitted pixel checksum equals the generator formula's sum, which
    * the oracle recomputes in SQL — proving the filter algebra and the
    * inflate path, not just the header walk. The compressed payload size
    * is JDK-zlib-version-dependent and deliberately NOT a column. Narrow
    * end to end (mapPartitions encode+decode; only the final sort
    * exchanges). */
  def pngDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 4 + (id % 16).toInt
          val h = 4 + (id % 12).toInt
          val d = RealCodecs.decodePng(RealCodecs.encodePng(w, h, id))
          (id, d.width.toLong, d.height.toLong,
            (d.width * d.height * 3).toLong, d.pixelSum)
        }
      }
      .toDF("doc_id", "width", "height", "pixel_bytes", "pixel_sum")
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** q151: IMAGE DEDUP on the DECODED-pixel fingerprint — the multimodal
    * face of the dedup family. A synthetic web-crawl gallery where many
    * documents reference the same underlying image (image seed =
    * doc_id % gallery, the CDN-duplication shape); every payload really
    * decodes through the q97 PNG path, and duplicates key on the decoded
    * domain — (w, h, Σpx, Σpx·(i+1)) — NOT the payload bytes, so
    * re-encodings of identical pixels (different filter rotations,
    * ancillary chunks) still collapse, which byte-hash dedup misses. One
    * cluster row per distinct image with copy count, min-doc keeper and
    * id checksum. The oracle recomputes both pixel moments from the
    * generator formula: a wrong decode ANYWHERE (filter algebra, CRC,
    * inflate) surfaces as a hash mismatch here too.
    *
    * Scale shape: decode is narrow mapPartitions (the codec kernel
    * shape); the dedup exchange carries the 32-byte fingerprint per
    * image, never pixels. */
  def imageDedup(spark: SparkSession, dir: String,
      gallery: Int = 97): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val seed = id % gallery
          val w = 4 + (seed % 16).toInt
          val h = 4 + (seed % 12).toInt
          val d = RealCodecs.decodePng(RealCodecs.encodePng(w, h, seed))
          (id, d.width.toLong, d.height.toLong, d.pixelSum, d.weightedSum)
        }
      }
      .toDF("doc_id", "width", "height", "pixel_sum", "wsum")
      .groupBy("width", "height", "pixel_sum", "wsum")
      .agg(count(lit(1)).as("copies"), min("doc_id").as("keeper_id"),
        sum(col("doc_id") % 1000003L).as("id_checksum"))
      .localCheckpoint()
      .orderBy("width", "height", "pixel_sum", "wsum")
  }

  /** q99: REAL JPEG decode roundtrip through the JDK's `javax.imageio`
    * codec — the dominant real-world image type, wrongly classed as
    * library-bound until round 7. Each document gets a deterministic
    * uniform-grayscale JPEG (dimensions and the gray level are pure
    * functions of doc_id) encoded at compression quality 1.0, then fully
    * decoded back: Huffman entropy decode, dequantize, IDCT, YCbCr→RGB.
    *
    * Why uniform gray is the oracle-checkable slice of a LOSSY codec: for
    * r=g=b=v the color transform is exact (Y=v, Cb=Cr=128), a uniform
    * block's AC coefficients are all zero, and at quality 1.0 every quant
    * table entry is 1 — so the DC value, the only nonzero coefficient,
    * survives quantization exactly and the decode returns v byte-for-byte
    * (probe-verified over 600 (w,h,v) combinations). The decoded pixel sum
    * is therefore SQL-recomputable as 3·v·w·h while the decode still
    * exercises the full real codec path. Non-uniform (genuinely lossy)
    * content is covered by a ScalaTest spec that pins decode determinism
    * and error bounds instead of exact values. Narrow end to end. */
  def jpegDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 8 + (id % 16).toInt
          val h = 8 + (id % 12).toInt
          val v = ((id * 37) % 256).toInt
          val d = RealCodecs.decodeJpeg(RealCodecs.encodeJpeg(w, h, v))
          (id, d.width.toLong, d.height.toLong,
            (d.width * d.height * 3).toLong, d.pixelSum)
        }
      }
      .toDF("doc_id", "width", "height", "pixel_bytes", "pixel_sum")
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** q78: REAL media decode — parse every payload's actual container
    * header back out (BMP dimensions; WAV rate/channels/sample count +
    * derived duration). Narrow end to end: encode and decode both ride
    * mapPartitions, the only exchange is the final presentation sort. */
  def mediaDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    realMediaTable(spark, dir)
      .mapPartitions { it =>
        it.map { r =>
          val d = RealCodecs.decode(r.payload)
          (r.doc_id, d.format, r.payload.length.toLong,
            d.width.toLong, d.height.toLong, d.sampleRate.toLong,
            d.channels.toLong, d.samples.toLong,
            if (d.sampleRate == 0) 0L
            else d.samples.toLong * 1000L / d.sampleRate)
        }
      }
      .toDF("doc_id", "format", "n_bytes", "width", "height",
        "sample_rate", "channels", "samples", "duration_ms")
      .localCheckpoint()
      .orderBy("doc_id")
  }
}
