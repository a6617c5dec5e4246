package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed partition-wise in batches.
  *
  * Two decode paths share the same batched `mapPartitions` boundary
  * (the Scala analogue of `mapInPandas` batches):
  *
  *  - [[fakeDecode]] — deterministic arithmetic on the payload length,
  *    kept as the oracle mode for the length-derived query family
  *    (`m_media_decode` and its consumers), since arbitrary media bytes
  *    are not DuckDB-replayable.
  *  - [[realDecode]] — a REAL image codec (`javax.imageio`, on every
  *    JVM): format sniffing, dimensions, raster band count, and an
  *    exact integer-arithmetic 8×8 average perceptual hash. The
  *    registered query `m_real_decode` feeds it deterministic synthetic
  *    PNGs ([[syntheticPng]]) whose decoded properties are pure
  *    arithmetic on `doc_id`, so the real decode is still oracle-gated:
  *    the bytes genuinely round-trip through the PNG codec and DuckDB
  *    independently computes what the decode must recover.
  */
object MultimodalOps {

  /** Decoded-media metadata record (what a real codec would emit). */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      format: String)

  /** Deterministic fake decode of a media payload. A real pipeline
    * swaps only this function for a codec call; schema, batching and
    * partitioning are unchanged. */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      width = (n % 64).toInt + 16,
      height = (n % 48).toInt + 16,
      n_frames = (n % 8).toInt + 1,
      format = if (n % 2 == 0) "fake-rgb8" else "fake-yuv420")
  }

  /** Decoded-media metadata from the REAL codec path. `decode_ok`
    * false (with zeroed fields and format `undecodable`) marks bytes no
    * installed reader accepts — the corrupt-input row survives loudly
    * instead of killing the batch, the same skip-don't-die philosophy
    * as the corrupt-file scan paths. */
  final case class RealMediaMeta(
      doc_id: Long,
      n_bytes: Long,
      decode_ok: Boolean,
      width: Int,
      height: Int,
      channels: Int,
      format: String,
      phash: Long)

  /** Real image decode via `javax.imageio`: sniffs the container format
    * from the byte stream, decodes the first image, and reports
    * dimensions, raster band count, and an 8×8 average perceptual hash.
    *
    * The hash is computed with EXACT integer arithmetic (per-block
    * channel sums compared against the global mean by
    * cross-multiplication), never float resampling, so it is
    * bit-reproducible across JVMs and replayable by any engine that can
    * do the same sums. Block (bx,by) covers columns
    * [bx·w/8, (bx+1)·w/8) × rows [by·h/8, (by+1)·h/8) (floor bounds);
    * bit by·8+bx is set iff the block's mean luma ≥ the image mean.
    * Long cross-products bound exactness to ≤ ~8.8e8 pixels per image
    * (765·(wh)²/64 < 2^63) — far above any sane frame.
    */
  def realDecode(docId: Long, payload: Array[Byte]): RealMediaMeta = {
    val failed = RealMediaMeta(docId, payload.length.toLong,
      decode_ok = false, 0, 0, 0, "undecodable", 0L)
    try {
      javax.imageio.ImageIO.setUseCache(false) // no executor temp files
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) failed
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
          val img = reader.read(0)
          val (w, h) = (img.getWidth, img.getHeight)
          val channels = img.getRaster.getNumBands
          // per-block and global luma sums (r+g+b of the sRGB view:
          // uniform across source color models, exact integers)
          val blockSum = new Array[Long](64)
          var total = 0L
          var y = 0
          while (y < h) {
            val by = y * 8 / h
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val luma = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              blockSum(by * 8 + (x * 8 / w)) += luma
              total += luma
              x += 1
            }
            y += 1
          }
          val totalArea = w.toLong * h
          var phash = 0L
          var i = 0
          while (i < 64) {
            val bx = i % 8; val by = i / 8
            val bw = ((bx + 1) * w / 8) - (bx * w / 8)
            val bh = ((by + 1) * h / 8) - (by * h / 8)
            val area = bw.toLong * bh
            // blockMean >= imageMean  ⟺  blockSum/area >= total/totalArea
            if (area > 0 && blockSum(i) * totalArea >= total * area)
              phash |= 1L << i
            i += 1
          }
          RealMediaMeta(docId, payload.length.toLong, decode_ok = true,
            w, h, channels, fmt, phash)
        } finally reader.dispose()
      }
      } finally if (iis != null) iis.close() // memory-backed but Closeable
    } catch { case scala.util.control.NonFatal(_) => failed }
  }

  /** Deterministic synthetic PNG for a document: a w×h two-band image
    * (top half gray `a = 20 + id%160`, bottom half gray `a+40`; w,h
    * multiples of 8 so the 8×8 hash blocks never straddle the halves). Everything the
    * decode recovers is arithmetic on `doc_id`:
    * w = 16 + (id%8)·8, h = 16 + (id%6)·8, channels = 3, format `png`,
    * and phash = bits 32..63 set (bottom four block-rows brighter than
    * the mean) = 0xFFFFFFFF00000000 = -4294967296.
    */
  def syntheticPng(docId: Long): Array[Byte] =
    twoBandPng(
      w = 16 + (docId % 8).toInt * 8,
      h = 16 + (docId % 6).toInt * 8,
      // gray levels stay within 8-bit: a <= 179, so a+40 <= 219 < 256
      a = (docId % 160).toInt + 20,
      splitRow = (16 + (docId % 6).toInt * 8) / 2)

  /** The shared two-band PNG synthesizer: rows above `splitRow` fill
    * gray `a`, the rest `a+40` (caller keeps a ≤ 215 so both bands
    * stay within 8 bits), encoded through the real PNG codec. */
  private def twoBandPng(w: Int, h: Int, a: Int,
      splitRow: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val v = if (y < splitRow) a else a + 40
      val rgb = (v << 16) | (v << 8) | v
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** REAL-codec ingest: synthesize one PNG payload per document
    * executor-side, push the bytes through [[realDecode]] at the same
    * batched `mapPartitions` boundary as [[mediaDecode]], and emit the
    * decoded metadata. `n_bytes` (the encoder's output size) is not
    * engine-independent, so the registered projection carries the
    * decode-recoverable columns only; the full record (including
    * n_bytes) is the API surface.
    */
  def realMediaDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // loadBalanced: the decode is CPU-heavy per row and the local
    // corpus is one parquet file -> one task (Tables.loadBalanced's
    // exact use case); at scale the repartition collapses to a no-op
    realDecodeColumns(Tables.loadBalanced(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long])
  }

  /** The ONE real-image decode pipeline both execution modes share:
    * ids → batched synthetic-PNG [[realDecode]] → the oracle's seven
    * columns. [[realMediaDecode]] (batch) and the streaming
    * `st_media_decode` call exactly this, so the "oracle shared
    * verbatim" claim is structural — the paths cannot drift. */
  def realDecodeColumns(
      ids: org.apache.spark.sql.Dataset[Long]): DataFrame = {
    import ids.sparkSession.implicits._
    ids
      .mapPartitions(_.grouped(64).flatMap(batch =>
        batch.map(id => realDecode(id, syntheticPng(id)))))
      .toDF()
      .select(col("doc_id"), col("decode_ok"), col("width"),
        col("height"), col("channels"), col("format"), col("phash"))
  }

  /** Decoded-audio metadata from the REAL RIFF/WAVE parser. */
  final case class WavMeta(
      doc_id: Long,
      n_bytes: Long,
      decode_ok: Boolean,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_samples: Long,
      /** Σ|sample| over the decoded PCM16 frames — a real signal
        * statistic computed from the data chunk's actual bytes, so a
        * decoder that misparses the chunk layout or endianness cannot
        * pass by header luck. */
      sum_abs_amplitude: Long)

  /** Real audio decode: walk the RIFF chunk list (the WAVE container,
    * a PUBLIC layout: "RIFF" size "WAVE", then tagged chunks; `fmt `
    * carries PCM format/channels/rate/bits, `data` the frames; chunks
    * pad to even offsets), take the format from `fmt ` and the PCM16
    * little-endian samples from `data`. Unknown chunks are SKIPPED by
    * their declared size — real WAVs carry LIST/INFO/fact chunks, and
    * a parser that assumes `data` follows `fmt ` directly misreads
    * them. Non-RIFF or non-PCM16 payloads yield a flagged row, never
    * a batch kill. */
  def wavDecode(docId: Long, payload: Array[Byte]): WavMeta = {
    val failed = WavMeta(docId, payload.length.toLong,
      decode_ok = false, 0, 0, 0, 0L, 0L)
    def u16(o: Int) = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(payload, o, 4, "US-ASCII")
    try {
      if (payload.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
        return failed
      var o = 12
      var rate = 0; var channels = 0; var bits = 0
      var dataOff = -1; var dataLen = 0L
      while (o + 8 <= payload.length) {
        val id = tag(o); val sz = u32(o + 4)
        // a declared chunk bigger than the file (or u32 values whose
        // Int truncation would make the advance non-positive and spin
        // the walk forever) marks corrupt bytes: flag, don't hang
        if (sz > payload.length.toLong - o - 8) return failed
        if (id == "fmt ") {
          // a PCM fmt chunk declares >= 16 bytes; a smaller declared
          // size would make the reads below silently consume the NEXT
          // chunk's bytes as format fields — corrupt, flag loudly
          if (sz < 16) return failed
          if (u16(o + 8) != 1) return failed // PCM only
          channels = u16(o + 10)
          rate = u32(o + 12).toInt
          bits = u16(o + 22)
        } else if (id == "data") { dataOff = o + 8; dataLen = sz }
        o += 8 + sz.toInt + (sz.toInt & 1) // chunks pad to even
      }
      if (rate == 0 || dataOff < 0 || bits != 16) return failed
      val nSamples = dataLen / (2L * channels)
      var sum = 0L
      var i = dataOff
      val end = dataOff + dataLen.toInt
      while (i + 1 < end) {
        val s = ((payload(i) & 0xff) | (payload(i + 1) << 8)).toShort
        sum += math.abs(s.toLong)
        i += 2
      }
      WavMeta(docId, payload.length.toLong, decode_ok = true,
        rate, channels, bits, nSamples, sum)
    } catch { case scala.util.control.NonFatal(_) => failed }
  }

  /** Deterministic synthetic WAV for a document: PCM16 mono/stereo
    * with every header field and sample arithmetic on `doc_id` —
    * rate = 8000 + (id%4)·4000, channels = 1 + id%2,
    * n = 100 + id%50 frames, sample s(k) for flat frame index k =
    * ((id·31 + k·17) mod 65536) − 32768. A junk `LIST` chunk sits
    * between `fmt ` and `data` so a decoder that does not genuinely
    * walk the chunk list fails loudly. */
  def syntheticWav(docId: Long): Array[Byte] = {
    val rate = 8000 + (docId % 4).toInt * 4000
    val channels = 1 + (docId % 2).toInt
    val frames = 100 + (docId % 50).toInt
    val nFlat = frames * channels
    val junk = "not-audio-metadata".getBytes("US-ASCII")
    val dataLen = nFlat * 2
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    out.writeBytes("RIFF")
    le32(4 + (8 + 16) + (8 + junk.length) + (8 + dataLen))
    out.writeBytes("WAVE")
    out.writeBytes("fmt "); le32(16)
    le16(1); le16(channels); le32(rate.toLong)
    le32(rate.toLong * channels * 2); le16(channels * 2); le16(16)
    out.writeBytes("LIST"); le32(junk.length.toLong); out.write(junk)
    out.writeBytes("data"); le32(dataLen.toLong)
    var k = 0
    while (k < nFlat) {
      le16((((docId * 31 + k.toLong * 17) % 65536L).toInt - 32768) & 0xffff)
      k += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** REAL-audio ingest: one synthetic WAV per document, parsed through
    * [[wavDecode]] at the same batched boundary. Every output column
    * is doc_id arithmetic DuckDB replays — including the Σ|sample|
    * over the REAL PCM bytes. */
  def wavMediaDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
    ids
      .mapPartitions(_.grouped(64).flatMap(batch =>
        batch.map(id => wavDecode(id, syntheticWav(id)))))
      .toDF()
      .select(col("doc_id"), col("decode_ok"), col("sample_rate"),
        col("channels"), col("bits"), col("n_samples"),
        col("sum_abs_amplitude"))
  }

  /** Synthetic 32×32 video-frame PNG: gray levels vary per (doc,
    * frame) so the codec cannot shortcut, but the two-band SPLIT ROW
    * sits at block-row 2 or 4 by `(doc_id+frame)` parity — so the
    * REAL average-hash collapses every frame to one of exactly two
    * phashes (bits 16..63 = -65536, bits 32..63 = -4294967296), the
    * collision structure a perceptual-hash dedup exists to find. */
  def syntheticFramePng(docId: Long, frame: Int): Array[Byte] =
    twoBandPng(w = 32, h = 32,
      a = 20 + ((docId * 7 + frame * 13) % 160).toInt,
      splitRow = if ((docId + frame) % 2 == 0) 8 else 16)

  /** Cross-video frame dedup over REALLY-decoded frames: every doc
    * contributes `1 + id%4` synthetic PNG frames, each decoded
    * through [[realDecode]] (genuine ImageIO round trip, genuine
    * 8×8 average hash), then frames group by their DECODED phash —
    * the real-codec form of [[frameDedup]]'s fingerprint role. The
    * output is the collision census (frames and distinct docs per
    * phash); the oracle replays it from (doc_id, frame) parity, so a
    * codec or hash misread changes the grouping and fails the run. */
  def realFrameDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // loadBalanced: per-frame JPEG/PNG codec work, one-file local scan
    val ids = Tables.loadBalanced(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
    ids
      .flatMap(id => (0 until (1 + id % 4).toInt).map(k => (id, k)))
      .mapPartitions(_.grouped(64).flatMap(batch =>
        batch.map { case (id, k) =>
          realDecode(id, syntheticFramePng(id, k)) }))
      .toDF()
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("doc_id")).as("n_docs"))
      .select(col("phash"), col("n_frames"), col("n_docs"))
  }

  /** Probed video-container metadata from the REAL ISO BMFF (MP4)
    * box walk. Decode of the streams themselves needs codecs this
    * container honestly does not ship — the probe is the metadata
    * half a video pipeline runs first (what/ how long/ how many
    * tracks) and the frame-sample/feature stages consume. */
  final case class Mp4Meta(
      doc_id: Long,
      n_bytes: Long,
      decode_ok: Boolean,
      major_brand: String,
      timescale: Long,
      duration_ms: Long,
      n_tracks: Int,
      n_boxes: Int)

  /** Real ISO BMFF probe: walk the top-level box list ([size:4 BE]
    * [type:4], size 1 = 64-bit largesize follows, size 0 = to EOF —
    * the PUBLIC ISO/IEC 14496-12 framing), take the brand from
    * `ftyp`, recurse into `moov` for `mvhd` (version 0: 32-bit
    * timescale + duration; version 1: 64-bit duration) and count
    * `trak` children. Unknown boxes skip by their declared size —
    * real files carry free/skip/udta/mdat the probe must step over.
    * Non-BMFF bytes yield a flagged row. */
  def mp4Probe(docId: Long, payload: Array[Byte]): Mp4Meta = {
    val failed = Mp4Meta(docId, payload.length.toLong,
      decode_ok = false, "", 0L, 0L, 0, 0)
    def u32(o: Int): Long =
      ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
        ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
    def u64(o: Int): Long =
      (u32(o) << 32) | u32(o + 4)
    def tag(o: Int) = new String(payload, o, 4, "US-ASCII")
    try {
      var brand = ""
      var timescale = 0L
      var duration = 0L
      var tracks = 0
      var boxes = 0
      var sawMvhd = false
      def walk(start: Int, end: Int, depth: Int): Unit = {
        var o = start
        while (o + 8 <= end) {
          boxes += 1
          val size32 = u32(o)
          val boxType = tag(o + 4)
          var header = 8
          val size =
            if (size32 == 1L) { header = 16; u64(o + 8) }
            else if (size32 == 0L) (end - o).toLong
            else size32
          if (size < header || o + size > end)
            throw new java.io.EOFException(s"box $boxType size $size")
          val body = o + header
          boxType match {
            case "ftyp" if depth == 0 => brand = tag(body)
            case "moov" => walk(body, (o + size).toInt, depth + 1)
            case "trak" if depth == 1 => tracks += 1
            case "mvhd" if depth == 1 =>
              sawMvhd = true
              val version = payload(body) & 0xff
              if (version == 1) {
                timescale = u32(body + 20)
                duration = u64(body + 24)
              } else {
                timescale = u32(body + 12)
                duration = u32(body + 16)
              }
            case _ => () // free/skip/udta/mdat/...: step over
          }
          o += size.toInt
        }
      }
      if (payload.length < 12 || tag(4) != "ftyp") return failed
      walk(0, payload.length, 0)
      if (!sawMvhd || timescale == 0) return failed
      Mp4Meta(docId, payload.length.toLong, decode_ok = true, brand,
        timescale, duration * 1000L / timescale, tracks, boxes)
    } catch { case scala.util.control.NonFatal(_) => failed }
  }

  /** Deterministic synthetic MP4 skeleton: `ftyp` (brand isom), a
    * junk `free` box, `moov` holding `mvhd` (timescale =
    * 1000 + (id%10)·100, duration = (5 + id%20)·timescale/10 ticks)
    * and 1 + id%3 empty `trak` boxes, then an opaque `mdat`. Every
    * probed field is doc_id arithmetic; the box framing is the real
    * ISO layout (the junk boxes force a genuine walk). Two framing
    * variants rotate by doc_id so BOTH spec-only probe branches sit
    * under the oracle's hash gate: id%4==1 writes a VERSION-1 mvhd
    * (64-bit creation/modification/duration — the post-2038 layout),
    * id%4==2 frames mdat with size32=1 + 64-bit LARGESIZE. A probe
    * that misreads either yields wrong duration fields or a flagged
    * row — both hash-visible. */
  def syntheticMp4(docId: Long): Array[Byte] = {
    val timescale = 1000L + (docId % 10) * 100L
    val durationTicks = (5L + docId % 20) * timescale / 10L
    val nTraks = 1 + (docId % 3).toInt
    val bos = new java.io.ByteArrayOutputStream()
    def box(name: String, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + body.length)
      out.putInt(8 + body.length)
      out.put(name.getBytes("US-ASCII")); out.put(body)
      out.array()
    }
    // ISO/IEC 14496-12 §4.2: size32 == 1 ⇒ the 64-bit largesize
    // follows the type word
    def box64(name: String, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(16 + body.length)
      out.putInt(1)
      out.put(name.getBytes("US-ASCII"))
      out.putLong(16L + body.length)
      out.put(body)
      out.array()
    }
    bos.write(box("ftyp",
      "isomiso2".getBytes("US-ASCII"))) // brand + compatible
    bos.write(box("free", Array.fill[Byte](7)(0x5f)))
    val mvhd =
      if (docId % 4 == 1) {
        val b = java.nio.ByteBuffer.allocate(32)
        b.putInt(0x01000000)             // version 1 + flags
        b.putLong(0L); b.putLong(0L)     // creation/modification (64-bit)
        b.putInt(timescale.toInt)
        b.putLong(durationTicks)
        box("mvhd", b.array())
      } else {
        val b = java.nio.ByteBuffer.allocate(100)
        b.putInt(0)                      // version 0 + flags
        b.putInt(0); b.putInt(0)         // creation/modification
        b.putInt(timescale.toInt)
        b.putInt(durationTicks.toInt)
        box("mvhd", b.array())
      }
    val traks = (0 until nTraks).map(i =>
      box("trak", Array.fill[Byte](4 + i)(0x74)))
    bos.write(box("moov", mvhd ++ traks.flatten))
    val mdatBody = Array.fill[Byte]((docId % 32).toInt)(0x6d)
    bos.write(
      if (docId % 4 == 2) box64("mdat", mdatBody)
      else box("mdat", mdatBody))
    bos.toByteArray
  }

  /** REAL-video-container ingest: one synthetic MP4 per document,
    * probed through [[mp4Probe]] at the same batched boundary. */
  def mp4MediaProbe(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
    ids
      .mapPartitions(_.grouped(64).flatMap(batch =>
        batch.map(id => mp4Probe(id, syntheticMp4(id)))))
      .toDF()
      .select(col("doc_id"), col("decode_ok"), col("major_brand"),
        col("timescale"), col("duration_ms"), col("n_tracks"))
  }

  /** Genuinely DECODED video: per-frame metadata off an MJPEG-in-AVI
    * container. AVI is RIFF (the same walk [[wavDecode]] does, with
    * LIST sub-containers) and MJPEG frames are plain JPEGs the JVM's
    * own ImageIO reads — so unlike the MP4 probe (H.264 honestly
    * isn't on a bare JVM) every frame here round-trips a REAL lossy
    * codec and a REAL pixel hash. */
  final case class AviMeta(
      doc_id: Long,
      n_bytes: Long,
      decode_ok: Boolean,
      /** avih dwMicroSecPerFrame — container timing, header-read. */
      us_per_frame: Long,
      /** `00dc` frames found AND successfully JPEG-decoded. */
      n_frames: Int,
      /** First decoded frame's real pixel dimensions. */
      width: Int,
      height: Int,
      /** Distinct REAL phashes across the decoded frames — the
        * dedup-relevant collision census ([[syntheticFrameJpeg]]
        * designs exactly two classes; JPEG's loss on band-aligned
        * flats must not smear them). */
      n_phash_classes: Int)

  /** Real MJPEG-AVI decode: verify `RIFF…AVI `, walk the chunk list
    * (PUBLIC layout: `LIST` chunks carry a 4-byte list type then
    * sub-chunks; `hdrl` holds `avih` with dwMicroSecPerFrame at
    * body+0; `movi` holds the stream data, video frames tagged
    * `00dc`/`00db`), JPEG-decode every frame through the SAME
    * [[realDecode]] the image pipeline uses, and census their real
    * phashes. Corrupt bytes — bad magic, lying chunk sizes,
    * undecodable frames — yield a flagged row, never a hang or a
    * batch kill (the RIFF walk's EOF/advance guards are shared with
    * [[wavDecode]]'s, the property-pinned pattern). */
  def aviDecode(docId: Long, payload: Array[Byte]): AviMeta = {
    val failed = AviMeta(docId, payload.length.toLong,
      decode_ok = false, 0L, 0, 0, 0, 0)
    try {
      val (usPerFrame, frames) = aviWalk(docId, payload)
      if (usPerFrame == 0L || frames.isEmpty) return failed
      AviMeta(docId, payload.length.toLong, decode_ok = true,
        usPerFrame, frames.size, frames.head.width, frames.head.height,
        frames.map(_.phash).distinct.size)
    } catch { case scala.util.control.NonFatal(_) => failed }
  }

  /** The decoded frames themselves (container order) — corrupt bytes
    * surface as an EMPTY frame list, the per-file flag of the frame
    * consumers ([[aviFrameDedup]]'s census simply has nothing from a
    * rotten file, the same row-not-batch blast radius). */
  def aviFrames(docId: Long, payload: Array[Byte]): Seq[RealMediaMeta] =
    try {
      val (us, frames) = aviWalk(docId, payload)
      if (us == 0L) Seq.empty else frames
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** The RIFF/AVI walk both consumers share: returns
    * (avih dwMicroSecPerFrame, decoded frames in container order);
    * THROWS on corrupt bytes — wrappers decide the flag shape. */
  private def aviWalk(docId: Long,
      payload: Array[Byte]): (Long, Vector[RealMediaMeta]) = {
    def u32(o: Int): Long =
      (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(payload, o, 4, "US-ASCII")
    if (payload.length < 12 || tag(0) != "RIFF" || tag(8) != "AVI ")
      throw new java.io.EOFException("not a RIFF/AVI container")
    var usPerFrame = 0L
    var frames = Vector.empty[RealMediaMeta]
    // one walker for the top level and LIST bodies alike; depth
    // bounds recursion on adversarial nesting
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 4) throw new java.io.EOFException("over-nested RIFF")
      var o = start
      while (o + 8 <= end) {
        val id = tag(o); val sz = u32(o + 4)
        if (sz > end.toLong - o - 8)
          throw new java.io.EOFException(s"chunk $id size $sz")
        val body = o + 8
        if (id == "LIST" && sz >= 4) {
          // list type word, then sub-chunks
          walk(body + 4, body + sz.toInt, depth + 1)
        } else if (id == "avih" && sz >= 4) {
          usPerFrame = u32(body)
        } else if ((id == "00dc" || id == "00db") && sz > 0) {
          val frame = java.util.Arrays.copyOfRange(
            payload, body, body + sz.toInt)
          val m = realDecode(docId, frame)
          if (!m.decode_ok)
            throw new java.io.EOFException("undecodable frame")
          frames :+= m
        }
        o += 8 + sz.toInt + (sz.toInt & 1) // chunks pad to even
      }
    }
    walk(12, payload.length, 0)
    (usPerFrame, frames)
  }

  /** The frame-PNG design pushed through a REAL lossy codec: the same
    * 32×32 two-band split-at-block-row-2-or-4 image as
    * [[syntheticFramePng]], JPEG-encoded. The split row aligns with
    * the 8×8 hash blocks and every band sits ≥ 10 gray levels from
    * the global mean (splitRow 8: bands at mean−30/mean+10;
    * splitRow 16: mean±20), so JPEG's ±1-2-level error on flat
    * block-aligned bands cannot flip a block's side of the
    * threshold — the two designed phash classes (bits 16..63 /
    * bits 32..63) survive the loss EXACTLY, which is the property a
    * perceptual hash exists to have. */
  def syntheticFrameJpeg(docId: Long, frame: Int): Array[Byte] = {
    val w = 32; val h = 32
    val a = 20 + ((docId * 7 + frame * 13) % 160).toInt
    val splitRow = if ((docId + frame) % 2 == 0) 8 else 16
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val v = if (y < splitRow) a else a + 40
      val rgb = (v << 16) | (v << 8) | v
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic MJPEG-AVI: `RIFF AVI ` holding
    * `LIST hdrl (avih)` — dwMicroSecPerFrame = 40000 + (id%5)·10000 —
    * a junk `JUNK` chunk (real muxers pad with them; a walker that
    * assumes `movi` follows `hdrl` directly misreads), and
    * `LIST movi` with 1 + id%4 JPEG `00dc` frames. */
  def syntheticAvi(docId: Long): Array[Byte] = {
    val usPerFrame = 40000L + (docId % 5) * 10000L
    val nFrames = 1 + (docId % 4).toInt
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val out = java.nio.ByteBuffer
        .allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes("US-ASCII"))
      out.putInt(body.length)
      out.put(body)
      out.array()
    }
    def list(listType: String, bodies: Array[Byte]*): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ bodies.flatten)
    val avih = {
      val b = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(usPerFrame.toInt)       // dwMicroSecPerFrame
      b.putInt(0); b.putInt(0); b.putInt(0)
      b.putInt(nFrames)                // dwTotalFrames
      chunk("avih", b.array())
    }
    val frames = (0 until nFrames).map(k =>
      chunk("00dc", syntheticFrameJpeg(docId, k)))
    val body = "AVI ".getBytes("US-ASCII") ++
      list("hdrl", avih) ++
      chunk("JUNK", Array.fill[Byte](11)(0x4a)) ++
      list("movi", frames: _*)
    chunk("RIFF", body)
  }

  /** Registered `m_avi_decode`: genuinely decoded VIDEO frames — the
    * modality triple's last real-decode gap closed. Each document's
    * MJPEG-AVI round-trips container walk → per-frame JPEG decode →
    * real phash census; `id % 20 == 10` documents carry truncated
    * bytes (flagged rows — per-file corrupt tolerance under the hash
    * gate). The oracle replays every column from doc_id arithmetic:
    * the phash-class count is 1 for single-class frame sets and 2
    * otherwise — frame k's class is (id+k) parity, so only the frame
    * count drives it (≥ 2 frames ⇒ both parities ⇒ 2). */
  def aviMediaDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // loadBalanced: container walk + per-frame JPEG decode per row
    val ids = Tables.loadBalanced(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
    ids
      .mapPartitions(_.grouped(64).flatMap(batch =>
        batch.map { id =>
          val bytes = syntheticAvi(id)
          aviDecode(id,
            if (id % 20 == 10) java.util.Arrays.copyOf(bytes, 40)
            else bytes)
        }))
      .toDF()
      .select(col("doc_id"), col("decode_ok"), col("us_per_frame"),
        col("n_frames"), col("width"), col("height"),
        col("n_phash_classes"))
  }

  /** Registered `m_avi_frame_dedup`: [[realFrameDedup]]'s census with
    * the VIDEO CONTAINER and the LOSSY codec in the loop — every
    * document's MJPEG-AVI walked, every frame JPEG-decoded, frames
    * grouped by their decoded phash. Shares `m_real_frame_dedup`'s
    * oracle VERBATIM: the same (doc, frame) design must land in the
    * same two hash classes whether it rode PNG bytes or a JPEG inside
    * an AVI — a cross-CODEC invariant (a drift in either codec, the
    * container walk, or the hash regroups the census and fails the
    * shared arithmetic). */
  def aviFrameDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // loadBalanced: JPEG encode+decode per frame, one-file local scan
    val ids = Tables.loadBalanced(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
    ids
      .mapPartitions(_.grouped(16).flatMap(batch =>
        batch.flatMap(id => aviFrames(id, syntheticAvi(id)))))
      .toDF()
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("doc_id")).as("n_docs"))
      .select(col("phash"), col("n_frames"), col("n_docs"))
  }

  /** One decoded-file row of the real-FILE ingestion path. */
  final case class FileMediaMeta(
      doc_id: Long,
      modality: String,
      decode_ok: Boolean,
      width: Option[Int],
      sample_rate: Option[Int],
      duration_ms: Option[Long])

  /** The asset-tree membership rule, shared verbatim by the writer
    * and the oracle: every fifth document with id below this cap, so
    * the FIXTURE's file count stays bounded as SF grows (fixture
    * generation cost must not scale with the corpus — the OPERATOR
    * under test is per-file and covered at any membership size; the
    * cap is ≥ the whole id space at the verify SF). Mirrored in the
    * `m_file_ingest` oracle SQL — change BOTH or neither. */
  val AssetIdCap = 1000L

  /** Write a deterministic on-disk asset tree — one PNG, one WAV and
    * one MP4 file per member document (`img_<id>.png` /
    * `aud_<id>.wav` / `vid_<id>.mp4`), with every `id % 20 == 10`
    * document's files TRUNCATED to 40 bytes (the per-file corrupt
    * case a real lake always has). Files are written DISTRIBUTEDLY
    * (id-bucket tasks through the session Hadoop FS, checksum
    * sidecars off — these are fixture payloads, not durable data),
    * the same sink discipline as the SSTable fixtures. Caller owns
    * deletion — registered queries should use [[assetDirShared]]
    * instead, which writes the tree ONCE per (JVM, sfDir) the way
    * `binaryFixtureShared` memoizes the SSTable fixture: the batch
    * and streaming ingest queries exercise the READ path, and paying
    * the 600-file write twice per bench run was pure fixture cost. */
  def writeAssetDir(spark: SparkSession,
      sfDir: String): java.nio.file.Path = {
    import spark.implicits._
    val out = graft.Scratch.dir("graft-assets-")
    val outStr = out.toString
    val hconf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long")).as[Long]
      .filter((id: Long) => id % 5 == 0 && id < AssetIdCap)
      .groupByKey(id => (id % 32).toInt)
      .mapGroups { (_, ids) =>
        val fs = org.apache.hadoop.fs.FileSystem.get(
          java.net.URI.create(outStr), hconf.value.value)
        fs.setWriteChecksum(false)
        var n = 0
        ids.foreach { id =>
          def emit(name: String, bytes: Array[Byte]): Unit = {
            val b =
              if (id % 20 == 10) java.util.Arrays.copyOf(bytes, 40)
              else bytes
            val os = fs.create(new org.apache.hadoop.fs.Path(
              s"$outStr/$name"), true)
            try os.write(b) finally os.close()
            n += 1
          }
          emit(s"img_$id.png", syntheticPng(id))
          emit(s"aud_$id.wav", syntheticWav(id))
          emit(s"vid_$id.mp4", syntheticMp4(id))
        }
        n
      }
      .collect() // per-bucket file counts; the bytes never leave executors
    out
  }

  /** Registered `m_file_ingest`: the real-FILE multimodal ingestion
    * boundary — `spark.read.format("binaryFile")` over an asset
    * directory, feeding the SAME [[realDecode]]/[[wavDecode]]/
    * [[mp4Probe]] functions the in-memory queries use (one decode
    * pipeline, two ingestion modes — the `st_media_decode` argument
    * again, now for files). `binaryFile` keeps whole files per row
    * (the format is unsplittable — exactly right for opaque media
    * payloads) and the decode stays in 64-payload batches inside
    * `mapPartitions`. Truncated files yield flagged rows; the batch
    * never dies. The oracle replays every column from doc_id
    * arithmetic. At 100 TB this is the shape that matters: listing
    * parallelizes over Spark's file index, payload bytes stream
    * executor-side only, and a corrupt object costs one flagged row,
    * not a job. */
  private val assetDirCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The asset tree memoized per (JVM, sfDir) — owned by the cache
    * for the JVM's lifetime (Scratch cleans at exit), shared by the
    * batch and streaming ingest queries. */
  def assetDirShared(spark: SparkSession, sfDir: String): String =
    assetDirCache.getOrElseUpdate(sfDir,
      writeAssetDir(spark, sfDir).toString)

  def fileIngest(spark: SparkSession, sfDir: String): DataFrame =
    fileDecodeColumns(
      spark.read.format("binaryFile").load(assetDirShared(spark, sfDir)))

  /** The ONE file-decode pipeline both execution modes share
    * ([[fileIngest]] batch, `st_file_ingest` streaming): binaryFile
    * rows → modality dispatch by filename → the three codecs in
    * 64-payload batches — so the shared oracle is structural, the
    * same argument as `realDecodeColumns`. */
  def fileDecodeColumns(bin: DataFrame): DataFrame = {
    import bin.sparkSession.implicits._
    val name = "(img|aud|vid)_(\\d+)\\.".r
    bin
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (path, bytes) =>
        val m = name.findFirstMatchIn(path.split('/').last)
          .getOrElse(throw new IllegalArgumentException(
            s"foreign file in the asset dir: $path"))
        val id = m.group(2).toLong
        m.group(1) match {
          case "img" =>
            val r = realDecode(id, bytes)
            FileMediaMeta(id, "img", r.decode_ok,
              if (r.decode_ok) Some(r.width) else None, None, None)
          case "aud" =>
            val r = wavDecode(id, bytes)
            FileMediaMeta(id, "aud", r.decode_ok, None,
              if (r.decode_ok) Some(r.sample_rate) else None, None)
          case _ =>
            val r = mp4Probe(id, bytes)
            FileMediaMeta(id, "vid", r.decode_ok, None, None,
              if (r.decode_ok) Some(r.duration_ms) else None)
        }
      }))
      .toDF()
  }

  /** Binary ingest → partition-wise batched decode → typed metadata.
    * `mapPartitions` processes each partition as one batch (no per-row
    * driver round-trips); output is a typed Dataset with a stable
    * schema, ready to join back to the document corpus.
    */
  def mediaDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    // explicit record batches inside each partition (the shape a
    // vectorized decode — mapInPandas / Arrow — consumes): the codec
    // swap point receives a Seq of payloads, not one row at a time
    media
      .mapPartitions(_.grouped(64).flatMap(batch =>
        batch.map { case (id, bytes) => fakeDecode(id, bytes) }))
      .toDF()
  }

  /** Frame-sampling shape: every decoded asset contributes n_frames
    * rows (posexplode of a synthesized frame index), the schema a video
    * pipeline feeds to a feature extractor. */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    mediaDecode(spark, sfDir)
      .select(col("doc_id"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1)))
      .select(col("doc_id"), col("col").as("frame_idx"), col("n_frames"))

  /** Resize planning: fit each decoded asset into a 32×32 box
    * preserving aspect ratio. Pure integer arithmetic (`DIV`) so the
    * result is bit-identical on any engine — no float rounding. This
    * is the metadata half of a resize; the pixel half is the same
    * batched codec boundary as [[mediaDecode]] (swap `fakeDecode` for
    * decode+scale), which is why no second stub is needed. Output
    * bytes assume 3 bytes/px (the fake-rgb8 shape).
    */
  def resize(spark: SparkSession, sfDir: String): DataFrame =
    mediaDecode(spark, sfDir)
      .select(
        col("doc_id"), col("width"), col("height"),
        expr("CAST(width AS BIGINT) * 32 DIV greatest(width, height)")
          .as("out_w"),
        expr("CAST(height AS BIGINT) * 32 DIV greatest(width, height)")
          .as("out_h"))
      .withColumn("out_bytes", col("out_w") * col("out_h") * 3)

  /** Per-frame feature extraction shape: each sampled frame yields a
    * fixed-width feature vector (flattened to scalar columns f0..f3 —
    * the schema an ANN index ingests; see SimilarityOps for the
    * consumer side). Features are deterministic arithmetic on
    * (doc_id, frame_idx) — a real extractor swaps the projection for a
    * model call at the same batch boundary as the decode. Stays a pure
    * codegen projection: zero shuffles on top of frameSample.
    */
  def featureExtract(spark: SparkSession, sfDir: String): DataFrame = {
    def feat(j: Int) =
      (((col("doc_id") * 31 + col("frame_idx")) * 17 + j) % 1000)
        .cast("double") / 1000.0
    frameSample(spark, sfDir)
      .select(col("doc_id"), col("frame_idx"),
        feat(0).as("f0"), feat(1).as("f1"), feat(2).as("f2"),
        feat(3).as("f3"))
  }

  /** Cross-video frame-level dedup — the multimodal analogue of
    * substring dedup: every sampled frame fingerprints (its quantized
    * feature vector packed into one integer — the role a perceptual
    * hash plays over real pixels), a fingerprint seen in ≥ 2 distinct
    * videos marks its frames duplicated, and each video reports its
    * duplicated-frame exposure (intro/outro cards, stock footage,
    * re-uploads). Consumes [[featureExtract]]'s OUTPUT — the vectors a
    * real extractor yields — so quantization is `round(f·1000)`
    * (exact: features are k/1000 by construction, and the round
    * recovers k identically in both engines; a real pipeline would
    * coarsen here, trading recall for tolerance). Scale shape =
    * `d_substring_dedup`'s: fingerprint-keyed aggregation and a join
    * back, (doc_id, fp) rows only, nothing quadratic.
    */
  def frameDedup(spark: SparkSession, sfDir: String): DataFrame = {
    def q(c: Column): Column = round(c * 1000, 0).cast("long")
    val fp = featureExtract(spark, sfDir)
      .select(col("doc_id"),
        (q(col("f0")) * 1000000000L + q(col("f1")) * 1000000L +
          q(col("f2")) * 1000L + q(col("f3"))).as("fp"))
      // two consumers (dup set + per-doc probe): materialize once
      .localCheckpoint()
    val dup = fp.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("fp"))
    val dupPerDoc = fp.join(dup, "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_frames"))
    fp.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"))
      .join(dupPerDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup_frames"))
      .select(col("doc_id"),
        col("n_frames").cast("long").as("n_frames"),
        col("n_dup_frames").cast("long").as("n_dup_frames"),
        round(col("n_dup_frames").cast("double") /
          col("n_frames").cast("double"), 6).as("dup_ratio"))
  }
}
