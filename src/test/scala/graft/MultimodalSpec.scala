package graft

import graft.ops.MultimodalOps
import org.apache.spark.sql.functions._

/** Multimodal plumbing invariants beyond the oracle rows: geometric
  * bounds the resize must respect, and frame/feature fan-out shape.
  */
class MultimodalSpec extends SparkSpec {

  test("resize fits every asset inside the 32x32 box, preserving aspect sign") {
    val r = MultimodalOps.resize(spark, sfDir)
    assert(r.filter(col("out_w") > 32 || col("out_h") > 32).count() === 0)
    assert(r.filter(col("out_w") < 1 || col("out_h") < 1).count() === 0)
    // the longer input side maps to the longer (or equal) output side
    assert(r.filter(col("width") >= col("height") &&
      col("out_w") < col("out_h")).count() === 0)
    assert(r.filter(col("height") >= col("width") &&
      col("out_h") < col("out_w")).count() === 0)
    assert(r.count() ===
      Tables.load(spark, sfDir, "documents").count())
  }

  test("featureExtract emits one fixed-width row per sampled frame, values in [0,1)") {
    val frames = MultimodalOps.frameSample(spark, sfDir)
    val feats = MultimodalOps.featureExtract(spark, sfDir)
    assert(feats.count() === frames.count())
    val oob = Seq("f0", "f1", "f2", "f3").map(c =>
      col(c) < 0.0 || col(c) >= 1.0).reduce(_ || _)
    assert(feats.filter(oob).count() === 0)
  }

  test("realDecode reads a real PNG: dims, bands, format, exact average hash") {
    // a 24x16 image, left half dark / right half bright: hash blocks
    // never straddle the halves, so the expected bit pattern is exact
    val img = new java.awt.image.BufferedImage(
      24, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 24) {
      val v = if (x < 12) 30 else 130
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val m = MultimodalOps.realDecode(7L, baos.toByteArray)
    assert(m.decode_ok)
    assert(m.width === 24 && m.height === 16)
    assert(m.channels === 3)
    assert(m.format === "png")
    assert(m.n_bytes === baos.size().toLong)
    // left 4 block-columns below the mean (bit 0), right 4 at/above
    // (bit 1) in every block-row: bits bx>=4 set for all by
    val expected = (0 until 64).foldLeft(0L)((acc, i) =>
      if (i % 8 >= 4) acc | (1L << i) else acc)
    assert(m.phash === expected)
  }

  test("realDecode reads a real JPEG: format sniffed from bytes, dims exact") {
    val img = new java.awt.image.BufferedImage(
      40, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 40) img.setRGB(x, y, 0x808080)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", baos)
    val m = MultimodalOps.realDecode(9L, baos.toByteArray)
    assert(m.decode_ok)
    assert(m.width === 40 && m.height === 24)
    assert(m.format === "jpeg")
    // JPEG is lossy but a uniform image stays (near-)uniform; every
    // block mean equals the image mean, so every hash bit is set
    assert(m.phash === -1L)
  }

  test("realDecode on undecodable bytes: loud skip row, not a crash") {
    val m = MultimodalOps.realDecode(3L, Array[Byte](1, 2, 3, 4, 5))
    assert(!m.decode_ok)
    assert(m.format === "undecodable")
    assert(m.width === 0 && m.height === 0 && m.phash === 0L)
    assert(m.n_bytes === 5L)
    // empty payload too
    assert(!MultimodalOps.realDecode(4L, Array.emptyByteArray).decode_ok)
  }

  test("wavDecode: real RIFF chunk walk — fields, samples, junk chunks, foreign decoder agreement") {
    for (id <- Seq(0L, 7L, 49L, 123L)) {
      val bytes = MultimodalOps.syntheticWav(id)
      val m = MultimodalOps.wavDecode(id, bytes)
      assert(m.decode_ok, s"doc $id")
      assert(m.sample_rate === 8000 + (id % 4).toInt * 4000)
      assert(m.channels === 1 + (id % 2).toInt)
      assert(m.bits === 16)
      assert(m.n_samples === 100 + id % 50)
      val nFlat = m.n_samples * m.channels
      val expectedSum = (0L until nFlat).map(k =>
        math.abs((id * 31 + k * 17) % 65536 - 32768)).sum
      assert(m.sum_abs_amplitude === expectedSum, s"doc $id")
      // the synthetic container is a REAL WAV: the JDK's own audio
      // system (an independent RIFF implementation) must agree on
      // format and frame count — proving the writer emits the public
      // layout and not a private dialect our parser colludes with
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(ais.getFormat.getSampleRate.toInt === m.sample_rate)
      assert(ais.getFormat.getChannels === m.channels)
      assert(ais.getFormat.getSampleSizeInBits === 16)
      assert(ais.getFrameLength === m.n_samples)
      ais.close()
    }
    // non-RIFF, truncated, and float-PCM payloads: flagged, not thrown
    assert(!MultimodalOps.wavDecode(1L, Array[Byte](1, 2, 3)).decode_ok)
    assert(!MultimodalOps.wavDecode(1L,
      "RIFFxxxxWAVE".getBytes("US-ASCII")).decode_ok)
    val nonPcm = MultimodalOps.syntheticWav(3L)
    nonPcm(20) = 3 // fmt audioFormat: 1 (PCM) -> 3 (IEEE float)
    assert(!MultimodalOps.wavDecode(3L, nonPcm).decode_ok)
    // a lying chunk size (0xFFFFFFF8: Int truncation would zero the
    // walk's advance) flags instead of hanging the executor
    val lying = MultimodalOps.syntheticWav(5L)
    java.nio.ByteBuffer.wrap(lying).putInt(16, 0xFFFFFFF8)
    assert(!MultimodalOps.wavDecode(5L, lying).decode_ok)
  }

  test("mp4Probe: real ISO BMFF box walk — brand, mvhd, traks, largesize, junk boxes") {
    // ids cover all fixture framings: %4==1 → version-1 mvhd,
    // %4==2 → 64-bit largesize mdat, else the v0/size32 base form
    for (id <- Seq(0L, 1L, 3L, 19L, 42L)) {
      val m = MultimodalOps.mp4Probe(id, MultimodalOps.syntheticMp4(id))
      assert(m.decode_ok, s"doc $id")
      assert(m.major_brand === "isom")
      assert(m.timescale === 1000 + (id % 10) * 100)
      assert(m.duration_ms === (5 + id % 20) * 100)
      assert(m.n_tracks === 1 + (id % 3).toInt)
      // junk boxes (free, mdat) were walked, not choked on
      assert(m.n_boxes >= 4 + m.n_tracks)
    }
    // a 64-bit largesize box and an mvhd v1 (64-bit duration) parse
    val ts = 600L
    val mvhd1 = {
      val b = java.nio.ByteBuffer.allocate(112)
      b.putInt(0x01000000) // version 1
      b.putLong(0L); b.putLong(0L)
      b.putInt(ts.toInt); b.putLong(ts * 9)
      b.array()
    }
    def box(name: String, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + body.length)
      out.putInt(8 + body.length)
      out.put(name.getBytes("US-ASCII")); out.put(body)
      out.array()
    }
    val inner = box("mvhd", mvhd1)
    val largeMoov = {
      val out = java.nio.ByteBuffer.allocate(16 + inner.length)
      out.putInt(1) // size=1: 64-bit largesize follows the type
      out.put("moov".getBytes("US-ASCII"))
      out.putLong(16L + inner.length)
      out.put(inner)
      out.array()
    }
    val m1 = MultimodalOps.mp4Probe(9L,
      box("ftyp", "mp42mp42".getBytes("US-ASCII")) ++ largeMoov)
    assert(m1.decode_ok && m1.major_brand === "mp42")
    assert(m1.timescale === ts && m1.duration_ms === 9000L)
    // non-BMFF and lying box sizes: flagged, never thrown
    assert(!MultimodalOps.mp4Probe(1L, Array[Byte](1, 2, 3, 4)).decode_ok)
    val lying = MultimodalOps.syntheticMp4(1L)
    java.nio.ByteBuffer.wrap(lying).putInt(0, Int.MaxValue)
    assert(!MultimodalOps.mp4Probe(1L, lying).decode_ok)
  }

  test("aviDecode: MJPEG frames inside the RIFF/AVI container decode " +
    "through the real JPEG codec into the designed phash classes") {
    for (id <- Seq(0L, 1L, 5L, 23L)) {
      val m = MultimodalOps.aviDecode(id, MultimodalOps.syntheticAvi(id))
      assert(m.decode_ok, s"doc $id")
      assert(m.us_per_frame === 40000 + (id % 5) * 10000)
      assert(m.n_frames === 1 + (id % 4).toInt)
      assert(m.width === 32 && m.height === 32)
      // frame k's split row rides (id+k) parity: one frame → one
      // class, more → exactly TWO — JPEG's loss must not smear them
      assert(m.n_phash_classes === (if (id % 4 == 0) 1 else 2))
    }
    // corrupt shapes: bad magic, truncation, a lying chunk size, an
    // undecodable frame — all flagged, never thrown, never hung
    assert(!MultimodalOps.aviDecode(1L, Array[Byte](1, 2, 3)).decode_ok)
    val valid = MultimodalOps.syntheticAvi(1L)
    assert(!MultimodalOps.aviDecode(1L,
      java.util.Arrays.copyOf(valid, 40)).decode_ok)
    val lying = valid.clone()
    // first LIST chunk's size dword → absurd
    java.nio.ByteBuffer.wrap(lying)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(16, Int.MaxValue)
    assert(!MultimodalOps.aviDecode(1L, lying).decode_ok)
    // a WAV is valid RIFF but not AVI: flagged by the form type
    assert(!MultimodalOps.aviDecode(1L,
      MultimodalOps.syntheticWav(1L)).decode_ok)
  }

  test("cross-codec invariant: a frame's phash is identical whether " +
    "it rode PNG bytes or a JPEG inside an AVI container") {
    for (id <- Seq(0L, 3L, 14L)) {
      val viaAvi = MultimodalOps.aviFrames(id, MultimodalOps.syntheticAvi(id))
      assert(viaAvi.size === 1 + (id % 4).toInt)
      viaAvi.zipWithIndex.foreach { case (m, k) =>
        val viaPng = MultimodalOps.realDecode(
          id, MultimodalOps.syntheticFramePng(id, k))
        assert(m.phash === viaPng.phash, s"doc $id frame $k")
      }
    }
    // corrupt container: EMPTY frames, the census simply misses it
    assert(MultimodalOps.aviFrames(1L, Array[Byte](9, 9, 9)).isEmpty)
  }

  test("fileIngest: binaryFile rows feed the same three codecs; " +
    "truncated files flag per-file, never kill the batch") {
    val df = MultimodalOps.fileIngest(spark, sfDir).collect()
    // membership derived from the corpus itself, not a hardcoded count
    val members = graft.Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id").cast("long"))
      .collect().map(_.getLong(0))
      .filter(id => id % 5 == 0 && id < MultimodalOps.AssetIdCap)
    assert(members.nonEmpty)
    assert(df.length === members.length * 3)
    df.foreach { r =>
      val id = r.getLong(0)
      val corrupt = id % 20 == 10
      assert(r.getBoolean(2) === !corrupt, s"doc $id decode_ok")
      r.getString(1) match {
        case "img" =>
          if (!corrupt) assert(r.getInt(3) === 16 + (id % 8).toInt * 8)
          else assert(r.isNullAt(3))
        case "aud" =>
          if (!corrupt) assert(r.getInt(4) === 8000 + (id % 4).toInt * 4000)
          else assert(r.isNullAt(4))
        case "vid" =>
          if (!corrupt) assert(r.getLong(5) === (5 + id % 20) * 100)
          else assert(r.isNullAt(5))
      }
    }
  }

  test("realMediaDecode: every synthetic PNG decodes through the real codec") {
    val r = MultimodalOps.realMediaDecode(spark, sfDir).localCheckpoint()
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(r.count() === nDocs)
    assert(r.filter(!col("decode_ok")).count() === 0)
    assert(r.filter(col("format") =!= "png").count() === 0)
    assert(r.filter(col("phash") =!= -4294967296L).count() === 0)
  }

  test("realFrameDedup: decoded phashes collapse to the two designed collision classes") {
    val rows = MultimodalOps.realFrameDedup(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("phash")).toSet ===
      Set(-65536L, -4294967296L))
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    // frames conserve: sum over classes = sum over docs of 1 + id%4
    val total = rows.map(_.getAs[Long]("n_frames")).sum
    assert(total === (0L until nDocs).map(1 + _ % 4).sum)
    // both classes really span many docs — collisions are cross-video
    assert(rows.forall(_.getAs[Long]("n_docs") > nDocs / 3))
  }

  test("frameDedup: totals conserve frames, exposure bounded, dups genuinely cross-video") {
    val fd = MultimodalOps.frameDedup(spark, sfDir).localCheckpoint()
    val frames = MultimodalOps.frameSample(spark, sfDir)
    // every video reports, totals conserve the sampled frames
    assert(fd.count() ===
      Tables.load(spark, sfDir, "documents").count())
    assert(fd.agg(sum("n_frames")).head().getLong(0) === frames.count())
    // exposure is a ratio; some cross-video dup must exist at this
    // fingerprint density (≈2000 frames over 1000 fingerprint slots)
    assert(fd.filter(col("n_dup_frames") > col("n_frames")).count() === 0)
    assert(fd.agg(sum("n_dup_frames")).head().getLong(0) > 0,
      "no cross-video duplicates found; the test proves nothing")
  }
}
