package graft

import graft.model.CellModel
import graft.ops.TtlOps
import org.apache.spark.sql.functions._

/** Round-trip invariants translated from the reference's integration
  * tests (SURVEY §5; `Cassandra3TTLRemoverTest.java:70-192`): expired
  * rows are invisible before the strip, everything is visible after,
  * and nothing else changes (values, writetimes, row count, order).
  */
class TtlOpsSpec extends SparkSpec {

  test("ttlStrip preserves row count and drops every TTL") {
    val ev = Tables.load(spark, sfDir, "events")
    val stripped = TtlOps.ttlStrip(spark, sfDir)
    assert(stripped.count() === ev.count())
    assert(stripped.filter(col("ttl_after").isNotNull).count() === 0)
  }

  test("ttlStrip preserves values and writetimes byte-for-byte") {
    val cells = CellModel.cellify(Tables.load(spark, sfDir, "events"))
      .select(col("event_id"), col("value"), col("writetime_us"))
    val stripped = TtlOps.ttlStrip(spark, sfDir)
      .select(col("event_id"), col("value"), col("writetime_us"))
    // anti-joins in both directions => exact multiset equality on keys
    assert(cells.exceptAll(stripped).count() === 0)
    assert(stripped.exceptAll(cells).count() === 0)
  }

  test("expired rows are invisible before the strip, visible after (the reference's 0-then-3 assertion)") {
    val cells = CellModel.cellify(Tables.load(spark, sfDir, "events"))
    val expired = cells.filter(
      col("ttl_s").isNotNull && col("expire_us") <= CellModel.NowMicros)
    val visible = TtlOps.visibleAt(spark, sfDir)
    // before: no expired row is visible
    assert(visible.join(expired, Seq("event_id"), "left_semi").count() === 0)
    // after: every row (incl. previously expired) survives the strip
    val stripped = TtlOps.ttlStrip(spark, sfDir)
    assert(
      stripped.join(expired, Seq("event_id"), "left_semi").count() ===
        expired.count())
    assert(expired.count() > 0, "test data must contain expired rows")
  }

  test("cellKindDispatch strips EXPIRING only; COUNTER/PLAIN/TOMBSTONE pass through") {
    val out = TtlOps.cellKindDispatch(spark, sfDir)
    assert(out.filter(col("kind") === "EXPIRING" && col("ttl_s").isNotNull)
      .count() === 0)
    val cells = CellModel.cellify(Tables.load(spark, sfDir, "events"))
      .select(col("event_id"), col("ttl_s"))
    val passthrough = out.filter(col("kind") =!= "EXPIRING")
      .select(col("event_id"), col("ttl_s"))
    assert(passthrough.exceptAll(
      cells.join(passthrough.select("event_id"), "event_id")
        .select(col("event_id"), col("ttl_s"))).count() === 0)
    // counter cells exist and pass through verbatim even when they carry
    // liveness metadata (NoTTLColumnSerializer.java:26-50: counter body
    // copied untouched) — COUNTER outranks EXPIRING in the dispatch
    val counters = out.filter(col("kind") === "COUNTER")
    assert(counters.count() > 0)
    assert(counters.filter(col("ttl_s").isNotNull).count() > 0,
      "some counter cells must retain their (untouched) TTL metadata")
  }

  test("tombstonePairing: opens precede closes, one pair per two markers") {
    val pairs = TtlOps.tombstonePairing(spark, sfDir)
    assert(pairs.filter(col("close_us") < col("open_us")).count() === 0)
    val errCounts = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "error")
      .groupBy("user_id").count()
    val expected = errCounts.agg(
      sum(ceil(col("count") / 2.0)).cast("long")).head().getLong(0)
    assert(pairs.count() === expected)
  }

  test("deletionPreserve: every input partition survives, incl. deletion-only ones") {
    val ev = Tables.load(spark, sfDir, "events")
    val out = TtlOps.deletionPreserve(spark, sfDir)
    // the §7.4-item-3 invariant: no grouped transform may drop a
    // partition — every input user_id appears in the output
    val inUsers = ev.select("user_id").distinct()
    val outUsers = out.select("user_id").distinct()
    assert(inUsers.exceptAll(outUsers).count() === 0)
    assert(outUsers.exceptAll(inUsers).count() === 0)
    // deletion-only partitions exist, carry exactly one marker row and
    // zero data rows (partition deletion supersedes all rows)
    val deleted = out.filter(col("user_id") % 10 === 7)
    assert(deleted.filter(col("kind") === "PARTITION_DELETION").count() > 0)
    assert(deleted.filter(col("kind") =!= "PARTITION_DELETION").count() === 0)
    assert(deleted.groupBy("user_id").count()
      .filter(col("count") =!= 1).count() === 0)
    // row deletions survive verbatim (value nulled, liveness untouched)
    val rowDel = out.filter(col("kind") === "ROW_DELETION")
    assert(rowDel.count() ===
      ev.filter(col("user_id") % 10 =!= 7 && col("event_type") === "error")
        .count())
    assert(rowDel.filter(col("deletion_us") =!= col("writetime_us"))
      .count() === 0)
    // live rows are stripped: no TTL info in the output schema's kind=ROW
    assert(out.filter(col("kind") === "ROW" && col("deletion_us").isNotNull)
      .count() === 0)
  }

  test("sortedSink: partition-local order by (user_id, writetime_us, event_id)") {
    import org.apache.spark.sql.Row
    val ds = TtlOps.sortedSink(spark, sfDir)
      .select("user_id", "writetime_us", "event_id")
    val violations = ds.rdd.mapPartitions { it =>
      var prev: Option[(Long, Long, Long)] = None
      var bad = 0L
      it.foreach { case Row(u: Long, w: Long, e: Long) =>
        prev.foreach { p => if (Ordering[(Long, Long, Long)].gt(p, (u, w, e))) bad += 1 }
        prev = Some((u, w, e))
      }
      Iterator.single(bad)
    }.sum()
    assert(violations === 0.0)
  }

  test("lwwMerge: shadowing, partial shadow, and LWW winners are exact") {
    val merged = TtlOps.lwwMergeAudit(spark, sfDir).collect()
      .map(r => (r.getString(0).toLong, r.getString(2)) -> r).toMap
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.keys.foreach { id =>
      val len = merged.get(id -> "len")
      val src = merged.get(id -> "src")
      if (id % 10 == 9) {
        // partition tombstone at +1000 shadows every generation
        assert(len.isEmpty && src.isEmpty, s"doc $id not fully shadowed")
      } else if (id % 7 == 3) {
        // row tombstone at +50 kills gen-1 (+0/+10); only a gen-2
        // re-write at +100 (id%3==0) survives — the partial shadow
        assert(src.isEmpty, s"doc $id: shadowed src cell resurrected")
        if (id % 3 == 0) {
          assert(len.exists(_.getString(3) == (docs(id) + 1).toString),
            s"doc $id: surviving re-write missing or wrong")
          assert(len.exists(_.getLong(5) == 1L), "shadowed versions counted")
        } else assert(len.isEmpty, s"doc $id: shadowed len resurrected")
      } else {
        // no tombstone: src always survives; len is the LWW winner —
        // the +100 re-write (value n_chars+1) when id%3==0, else gen-1
        assert(src.isDefined, s"doc $id: src cell lost")
        val expect =
          if (id % 3 == 0) (docs(id) + 1).toString else docs(id).toString
        assert(len.exists(_.getString(3) == expect),
          s"doc $id: LWW winner wrong")
        assert(len.exists(_.getLong(5) == (if (id % 3 == 0) 2L else 1L)),
          s"doc $id: version count wrong")
      }
    }
  }

  test("lwwMerge range shadowing: bound coverage, exclusivity, re-write survival") {
    val merged = TtlOps.lwwRangeAudit(spark, sfDir).collect()
      .map(r => (r.getString(0).toLong, r.getString(1)) ->
        (r.getString(3), r.getLong(5))).toMap
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, n) =>
      // 'a' sits below both ranges: always visible, one version
      assert(merged.get(id -> "a").contains((n.toString, 1L)),
        s"doc $id: clustering a wrong")
      // 'c' is inside [b,d]: the base write dies on even ids; the
      // +100 re-write (id%3==0) outlives the +60 range
      val baseOk = id % 2 != 0
      val rewrite = id % 3 == 0
      val cExpect =
        if (rewrite) Some(((n + 10).toString, (if (baseOk) 2L else 1L)))
        else if (baseOk) Some(((n + 1).toString, 1L))
        else None
      assert(merged.get(id -> "c") == cExpect, s"doc $id: clustering c " +
        s"got ${merged.get(id -> "c")}, want $cExpect")
      // 'e' is covered only by the exclusive-start (d, e] range
      val eExpect = if (id % 5 == 1) None else Some(((n + 2).toString, 1L))
      assert(merged.get(id -> "e") == eExpect,
        s"doc $id: clustering e wrong")
    }
  }

  test("skew-safe LWW strategy produces the identical frame on both fixtures") {
    def same(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Unit = {
      assert(a.count() === b.count(), "row counts differ")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "row sets differ between merge strategies")
    }
    same(TtlOps.lwwMergeAudit(spark, sfDir),
      TtlOps.lwwSkewAudit(spark, sfDir))
    // the range path too: bound pairing + coverage via the joined
    // aggregate must match the window-collected form
    same(TtlOps.lwwRangeAudit(spark, sfDir),
      TtlOps.lwwMergeSkewSafe(TtlOps.lwwRangeFixture(spark, sfDir)))
  }

  test("lwwAsOf: tombstones in the future of the cut do not shadow yet") {
    val asof = TtlOps.lwwAsOfAudit(spark, sfDir)
      .select(col("partition_key")).distinct()
      .collect().map(_.getString(0).toLong).toSet
    val ids = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val cut = (TtlOps.LwwAsOfCutUs - TtlOps.LwwBaseUs) / 1000000L
    ids.foreach { id =>
      val anythingWritten = id <= cut
      val pdelHappened = id % 10 == 9 && id + 1000 <= cut
      val rowDelHappened = id % 7 == 3 && id + 50 <= cut
      val rewriteSurvives = id % 3 == 0 && id + 100 <= cut
      // visible as of T iff some write happened, the partition
      // tombstone hasn't, and either no row tombstone happened or the
      // later gen-2 re-write outlives it
      val expectVisible = anythingWritten && !pdelHappened &&
        (!rowDelHappened || rewriteSurvives)
      assert(asof.contains(id) == expectVisible,
        s"doc $id: as-of visibility expected $expectVisible")
    }
  }
}
