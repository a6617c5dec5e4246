package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}

import com.clearspring.analytics.stream.cardinality.{
  HyperLogLogPlus, ICardinality}

/** The per-file partition-key cardinality sketch — the reference's
  * PRIMARY key-count estimate. Cassandra stores a clearspring
  * `HyperLogLogPlus(13, 25)` in every SSTable's Statistics.db as the
  * COMPACTION metadata component (`MetadataCollector.defaultCardinality`)
  * and the reference reads it back per file, merges across files for
  * the table estimate (`NoTTLReader.getApproximateKeyCount`,
  * `NoTTLReader.java:152-216`; `mergeCardinalities` `:252-264`) and
  * ratios merged-vs-summed for the compaction gain
  * (`estimateCompactionGain`, `:221-250`).
  *
  * This module is the engine's literal twin, built on the SAME
  * clearspring library (stream-lib ships with Spark), so the sketch
  * bytes our sinks write are what a real Cassandra writes and a real
  * Cassandra's bytes are what our inventory reads:
  *   - keys are hashed with Cassandra's own `MurmurHash.hash2_64`
  *     (64-bit MurmurHash2, seed 0 — `MetadataCollector.addKey`) and
  *     offered pre-hashed, exactly the write path's arithmetic;
  *   - the component layout is `CompactionMetadata.serializer`'s:
  *     a 32-bit length + `HyperLogLogPlus.getBytes()` on 3.0+, with
  *     a leading 32-bit ancestor count (+ one int per ancestor) on
  *     the pre-3.0 ("ka"/"la") layout.
  *
  * Scale shape: sketches are ~1-5 KB per FILE (catalog-sized, like
  * every sidecar this inventory touches); the merge is
  * register-wise max over 8 KB register sets — the whole
  * cross-generation estimate costs one pass over file METADATA, never
  * a key. That is the point of the operator: when Index.db is lost
  * (the one case exact counting fails) the estimate Cassandra itself
  * would serve is still one sidecar read away.
  */
object KeyCardinality {

  /** `MetadataCollector.cardinality`'s parameters: p=13 (8192
    * registers, rsd ≈ 1.04/√8192 ≈ 1.15%), sp=25 (sparse mode —
    * exact-by-construction for small files). */
  val P = 13
  val SP = 25

  def newSketch(): HyperLogLogPlus = new HyperLogLogPlus(P, SP)

  /** Cassandra's `MurmurHash.hash2_64(key, offset, length, 0)` —
    * 64-bit MurmurHash2 (Austin Appleby's MurmurHash64A) as the
    * PUBLIC Apache Cassandra utility implements it, byte-for-byte:
    * little-endian 8-byte lanes, and tail bytes SIGN-EXTENDED into
    * the xor (Cassandra inherits Java's signed byte in `(long) b`
    * without masking — matching that quirk is what makes our sketch
    * of a key set equal theirs). */
  def hash2_64(data: Array[Byte], offset: Int, length: Int,
      seed: Long): Long = {
    val m = 0xc6a4a7935bd1e995L
    val r = 47
    var h = (seed & 0xffffffffL) ^ (m * length)
    val lenLongs = length >> 3
    var i = 0
    while (i < lenLongs) {
      val i8 = offset + (i << 3)
      var k =
        (data(i8) & 0xffL) |
          ((data(i8 + 1) & 0xffL) << 8) |
          ((data(i8 + 2) & 0xffL) << 16) |
          ((data(i8 + 3) & 0xffL) << 24) |
          ((data(i8 + 4) & 0xffL) << 32) |
          ((data(i8 + 5) & 0xffL) << 40) |
          ((data(i8 + 6) & 0xffL) << 48) |
          ((data(i8 + 7) & 0xffL) << 56)
      k *= m; k ^= k >>> r; k *= m
      h ^= k; h *= m
      i += 1
    }
    val tail = offset + (lenLongs << 3)
    ((length & 7): @annotation.switch) match {
      case 7 =>
        h ^= data(tail + 6).toLong << 48
        h ^= data(tail + 5).toLong << 40
        h ^= data(tail + 4).toLong << 32
        h ^= data(tail + 3).toLong << 24
        h ^= data(tail + 2).toLong << 16
        h ^= data(tail + 1).toLong << 8
        h ^= data(tail).toLong; h *= m
      case 6 =>
        h ^= data(tail + 5).toLong << 40
        h ^= data(tail + 4).toLong << 32
        h ^= data(tail + 3).toLong << 24
        h ^= data(tail + 2).toLong << 16
        h ^= data(tail + 1).toLong << 8
        h ^= data(tail).toLong; h *= m
      case 5 =>
        h ^= data(tail + 4).toLong << 32
        h ^= data(tail + 3).toLong << 24
        h ^= data(tail + 2).toLong << 16
        h ^= data(tail + 1).toLong << 8
        h ^= data(tail).toLong; h *= m
      case 4 =>
        h ^= data(tail + 3).toLong << 24
        h ^= data(tail + 2).toLong << 16
        h ^= data(tail + 1).toLong << 8
        h ^= data(tail).toLong; h *= m
      case 3 =>
        h ^= data(tail + 2).toLong << 16
        h ^= data(tail + 1).toLong << 8
        h ^= data(tail).toLong; h *= m
      case 2 =>
        h ^= data(tail + 1).toLong << 8
        h ^= data(tail).toLong; h *= m
      case 1 =>
        h ^= data(tail).toLong; h *= m
      case _ => ()
    }
    h ^= h >>> r; h *= m; h ^= h >>> r
    h
  }

  /** `MetadataCollector.addKey`: hash the raw partition-key bytes,
    * offer pre-hashed (the sketch never sees the key itself). */
  def addKey(sketch: HyperLogLogPlus, key: Array[Byte]): Unit =
    sketch.offerHashed(hash2_64(key, 0, key.length, 0L))

  /** One sketch over an iterator of encoded partition keys — the
    * sink-side collector (streams; never materializes the key set). */
  def sketchOf(keys: IterableOnce[Array[Byte]]): HyperLogLogPlus = {
    val s = newSketch()
    keys.iterator.foreach(addKey(s, _))
    s
  }

  /** The 3.0+ COMPACTION component body:
    * `CompactionMetadata.serializer.serialize` =
    * `ByteBufferUtil.writeWithLength(cardinalityEstimator.getBytes())`
    * — a 32-bit big-endian length + the clearspring wire bytes. */
  def writeComponent(sketch: HyperLogLogPlus): Array[Byte] = {
    val bytes = sketch.getBytes
    val bos = new ByteArrayOutputStream(bytes.length + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(bytes.length)
    out.write(bytes)
    out.flush()
    bos.toByteArray
  }

  /** The pre-3.0 COMPACTION component body: a 32-bit ancestor count
    * and one 32-bit generation per ancestor precede the sketch (the
    * 2.x `CompactionMetadata` carried the compaction lineage; 3.0
    * dropped it). The ka fixture writes a designed lineage the
    * inventory oracle replays. */
  def writeComponent2x(sketch: HyperLogLogPlus,
      ancestors: Seq[Int] = Nil): Array[Byte] = {
    val bytes = sketch.getBytes
    val bos = new ByteArrayOutputStream(bytes.length + 8)
    val out = new DataOutputStream(bos)
    out.writeInt(ancestors.size)
    ancestors.foreach(out.writeInt)
    out.writeInt(bytes.length)
    out.write(bytes)
    out.flush()
    bos.toByteArray
  }

  /** The 2.x component's ancestor list alone (`getAncestors`,
    * `NoTTLReader.java:1947-1958` — the generations this file was
    * compacted from, the lineage `sstablemetadata` prints; 3.0
    * dropped the field). None on corrupt framing — same degrade
    * posture as the sketch parse. */
  def readAncestors(body: Array[Byte]): Option[Seq[Int]] =
    try {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(body))
      val n = in.readInt()
      if (n < 0 || n > body.length / 4) None
      else Some(Seq.fill(n)(in.readInt()))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Parse a component body back to the sketch. `oldEra` skips the
    * ancestor list. Corrupt bytes flag as None — the caller falls
    * back to summary estimates, the reference's own CASSANDRA-10676
    * posture (`NoTTLReader.java:178-185`). */
  def readComponent(body: Array[Byte], oldEra: Boolean)
      : Option[HyperLogLogPlus] =
    try {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(body))
      if (oldEra) {
        val nAnc = in.readInt()
        if (nAnc < 0 || nAnc > body.length / 4) return None
        var i = 0
        while (i < nAnc) { in.readInt(); i += 1 }
      }
      val len = in.readInt()
      if (len < 0 || len > body.length) return None
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      Some(HyperLogLogPlus.Builder.build(bytes))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** `NoTTLReader.getApproximateKeyCount` (`NoTTLReader.java:152-216`):
    * when EVERY file carries a sketch, the estimate is the merged
    * sketch's cardinality; if ANY lacks one the whole answer falls
    * back to summing the per-file index-summary estimates — seeded
    * from the reference's own `count = -1` (its fallback is one less
    * than the sum; mirrored, quirk and all, because this IS that
    * operator). */
  def approximateKeyCount(
      files: Seq[(Option[HyperLogLogPlus], Long)]): Long = {
    var count = -1L
    if (files.nonEmpty && files.forall(_._1.isDefined)) {
      val sketches = files.map(_._1.get)
      // a CardinalityMergeException (mismatched precisions on a
      // foreign file) demotes to the summary fallback, as the
      // reference's catch does (`NoTTLReader.java:197-202`)
      count =
        try mergeSketches(sketches).cardinality()
        catch { case scala.util.control.NonFatal(_) => -1L }
    }
    if (count < 0)
      files.foreach { case (_, estimatedKeys) => count += estimatedKeys }
    count
  }

  /** `NoTTLReader.mergeCardinalities` (`NoTTLReader.java:252-264`):
    * merge into a fresh (13,25) base — the merged estimate never
    * mutates a file's own sketch. */
  def mergeSketches(sketches: Seq[HyperLogLogPlus]): ICardinality = {
    val base: ICardinality = newSketch()
    base.merge(sketches.toArray[ICardinality]: _*)
  }

  /** `NoTTLReader.estimateCompactionGain` (`NoTTLReader.java:221-250`):
    * merged cardinality over summed cardinalities of the overlapping
    * set — "how much of the keys we would keep if the sstables were
    * compacted together". 1.0 when nothing contributes. */
  def compactionGain(sketches: Seq[HyperLogLogPlus]): Double = {
    val before = sketches.map(_.cardinality()).sum
    if (before == 0L) 1.0
    else mergeSketches(sketches).cardinality().toDouble / before
  }
}
