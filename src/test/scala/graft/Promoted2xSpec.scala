package graft

import java.io.ByteArrayInputStream

import graft.sources.{BigFormat, OldFormat}

/** The 2.x ("ka"/"la") PROMOTED index — 2.1's
  * `o.a.c.db.RowIndexEntry.IndexedEntry` + `IndexHelper.IndexInfo`
  * layout (fixed-width, raw composite cell-name bounds, offsets from
  * the row start) and the sliced partition read that consumes it
  * (the reference's `NoTTLSSTableNamesIterator.readIndexedColumns`,
  * cassandra-2 lines 156-225, applied to a clustering slice). */
class Promoted2xSpec extends SparkSpec {

  private val schema = OldFormat.schemaOfCql(
    graft.model.CqlSchema.parse(
      "CREATE TABLE graft.t (id text, ck text, len text, src text, " +
        "PRIMARY KEY (id, ck))")
      .fold(e => fail(e), identity))

  private def cell(ck: String, name: String, ts: Long,
      value: String): OldFormat.Cell2 =
    OldFormat.Cell2(Seq(ck), name, ts, None, None, Some(value),
      deleted = false, counter = false)

  private def widePartition(key: String, n: Int): OldFormat.Partition2 =
    OldFormat.Partition2(key, None,
      (0 until n).flatMap { i =>
        val ck = f"c$i%04d"
        Seq(cell(ck, "len", 1000L + i, i.toString),
          cell(ck, "src", 2000L + i, s"s$i"))
      })

  test("writePromoted2x/readPromoted2x round-trip, deletion and bounds") {
    val blocks = Seq(
      OldFormat.IndexInfo2x(Array[Byte](1, 2), Array[Byte](3), 14L, 100L),
      OldFormat.IndexInfo2x(Array[Byte](4), Array[Byte](5, 6, 7), 114L,
        90L))
    for (del <- Seq(None, Some(123456789L))) {
      val rt = OldFormat.readPromoted2x(
        OldFormat.writePromoted2x(OldFormat.Promoted2x(del, blocks)), "t")
      assert(rt.deletionUs === del)
      assert(rt.blocks.size === 2)
      assert(rt.blocks.map(_.offset) === Seq(14L, 114L))
      assert(rt.blocks.map(_.width) === Seq(100L, 90L))
      assert(rt.blocks.head.firstName.toSeq === Seq[Byte](1, 2))
      assert(rt.blocks.last.lastName.toSeq === Seq[Byte](5, 6, 7))
    }
    // non-ascending offsets are a loud reject, never a misparse
    val bad = OldFormat.writePromoted2x(OldFormat.Promoted2x(None,
      blocks.reverse))
    assertThrows[IllegalArgumentException](
      OldFormat.readPromoted2x(bad, "t"))
  }

  test("writeDataFileIndexed block math: first offset is the row header, widths tile the row, single-block stays unpromoted") {
    val wide = widePartition("w", 40)
    val slim = OldFormat.Partition2("s", None, Seq(cell("c0", "len", 1L,
      "x")))
    val (bytes, index) = OldFormat.writeDataFileIndexed(
      Seq(wide, slim), schema, columnIndexSize = 256)
    assert(index.size === 2)
    val byKey = index.map(e =>
      BigFormat.renderValue(schema.keyType, e._1) -> e).toMap
    // the slim partition gains nothing over its position: unpromoted
    assert(byKey("s")._3.isEmpty)
    val (wKey, wPos, wProm) = byKey("w")
    assert(wProm.nonEmpty)
    val pr = OldFormat.readPromoted2x(wProm, "t")
    assert(pr.blocks.size >= 3, s"designed >=3 blocks, got ${pr.blocks.size}")
    // 2.1 offsets are from the ROW START and include the row header,
    // so the reader seeks basePosition + offset directly
    val headerSize = 2L + wKey.length + 4 + 8
    assert(pr.blocks.head.offset === headerSize)
    // blocks tile the atom span contiguously
    pr.blocks.zip(pr.blocks.tail).foreach { case (a, b) =>
      assert(a.offset + a.width === b.offset)
    }
    // every non-final block crossed the threshold; and re-decoding the
    // whole partition off the data bytes still yields every atom (the
    // promoted payload is pure metadata)
    pr.blocks.dropRight(1).foreach(b => assert(b.width >= 256))
    val whole = OldFormat.partitions(schema,
      new ByteArrayInputStream(bytes, wPos.toInt,
        bytes.length - wPos.toInt), "t").next()
    assert(whole.atoms.size === 80)
  }

  test("a promoted partition carrying range tombstones refuses loudly (2.1 repeats open markers; this writer does not)") {
    val rt = OldFormat.Tombstone2(Seq("c0000"), startInclusive = true,
      Seq("c0001"), endInclusive = true, 5L)
    val p = OldFormat.Partition2("w", None,
      widePartition("w", 40).atoms :+ rt)
    val e = intercept[IllegalArgumentException](
      OldFormat.writeDataFileIndexed(Seq(p), schema,
        columnIndexSize = 256))
    assert(e.getMessage.contains("range tombstones"))
    // the same partition under a slim threshold (single block) writes
    // fine — only PROMOTION triggers the refusal
    val (_, idx) = OldFormat.writeDataFileIndexed(Seq(p), schema,
      columnIndexSize = 1 << 20)
    assert(idx.head._3.isEmpty)
  }

  test("readPartitionSliced2x decodes exactly the overlapping blocks; residual-filtered result equals the whole decode") {
    val wide = widePartition("w", 60)
    val (bytes, index) = OldFormat.writeDataFileIndexed(
      Seq(wide), schema, columnIndexSize = 256)
    val (_, pos, prom) = index.head
    val pr = OldFormat.readPromoted2x(prom, "t")
    assert(pr.blocks.size >= 4)
    def openAt(p: Long) = new ByteArrayInputStream(
      bytes, p.toInt, bytes.length - p.toInt)
    val enc = (s: String) =>
      BigFormat.encodeValue(BigFormat.Utf8Type, s)
    // a middle band: block-aligned SUPERSET of the slice, trimmed by
    // the residual filter to exactly the whole-decode's band
    val lo = "c0020"; val hi = "c0039"
    val sliced = OldFormat.readPartitionSliced2x(schema, openAt, pos, pr,
      Seq(enc(lo)), Seq(enc(hi)), "t")
    assert(sliced.key === "w")
    val inBand = (a: OldFormat.Atom2) => a match {
      case c: OldFormat.Cell2 =>
        c.clustering.head >= lo && c.clustering.head <= hi
      case _ => false
    }
    val whole = OldFormat.partitions(schema, openAt(pos), "t").next()
    assert(sliced.atoms.filter(inBand) === whole.atoms.filter(inBand))
    // the sliced decode read a strict subset of the atoms
    assert(sliced.atoms.size < whole.atoms.size)
    assert(sliced.atoms.nonEmpty)
    // open-ended bounds: lo-only reaches the tail, hi-only the head
    val tail = OldFormat.readPartitionSliced2x(schema, openAt, pos, pr,
      Seq(enc("c0050")), Nil, "t")
    assert(tail.atoms.filter(inBand).isEmpty)
    assert(tail.atoms.exists {
      case c: OldFormat.Cell2 => c.clustering.head == "c0059"
      case _ => false
    })
    val head = OldFormat.readPartitionSliced2x(schema, openAt, pos, pr,
      Nil, Seq(enc("c0005")), "t")
    assert(head.atoms.exists {
      case c: OldFormat.Cell2 => c.clustering.head == "c0000"
      case _ => false
    })
    assert(head.atoms.size < whole.atoms.size)
    // a disjoint band past the data decodes nothing
    val none = OldFormat.readPartitionSliced2x(schema, openAt, pos, pr,
      Seq(enc("c9990")), Seq(enc("c9999")), "t")
    assert(none.atoms.isEmpty)
  }

  test("COMPACT STORAGE slice serving refuses (raw comparator names carry no composite framing)") {
    val compact = OldFormat.schemaOfCql(
      graft.model.CqlSchema.parse(
        "CREATE TABLE graft.t (id text, ck text, value text, " +
          "PRIMARY KEY (id, ck)) WITH COMPACT STORAGE")
        .fold(e => fail(e), identity))
    val e = intercept[IllegalArgumentException](
      OldFormat.readPartitionSliced2x(compact,
        _ => new ByteArrayInputStream(Array.emptyByteArray), 0L,
        OldFormat.Promoted2x(None, Nil), Nil, Nil, "t"))
    assert(e.getMessage.contains("COMPACT STORAGE"))
  }
}
