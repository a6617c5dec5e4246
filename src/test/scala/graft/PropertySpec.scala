package graft

import graft.model.CellModel
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated invariants for the cell model (SURVEY §5's
  * translated strategy, item 3): on arbitrary inputs — not just the
  * driver corpus — the TTL strip preserves values, writetimes and row
  * count, nulls every TTL, and makes every row permanently live.
  * Deterministic seeds keep the suite reproducible.
  */
/** Top-level so Spark can derive an Encoder (inner classes need an
  * outer-scope instance). */
final case class RawEvent(
    event_id: Long, user_id: Long, event_type: String,
    value: Double, ts: Long)

class PropertySpec extends SparkSpec {

  private val genEvent: Gen[RawEvent] = for {
    id <- Gen.chooseNum(0L, 1000000L)
    user <- Gen.chooseNum(1L, 50L)
    tpe <- Gen.oneOf("view", "click", "purchase", "signup", "error")
    value <- Gen.chooseNum(-1e6, 1e6)
    // epoch-nanos around the pinned NowMicros, ± ~60 days
    ts <- Gen.chooseNum(
      CellModel.NowMicros * 1000L - 5000000000L * 1000000L,
      CellModel.NowMicros * 1000L + 5000000000L * 1000000L)
  } yield RawEvent(id, user, tpe, value, ts)

  private def sample(seed: Long, n: Int): Seq[RawEvent] =
    Gen.listOfN(n, genEvent)
      .apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))
      // event_id is the row identity in the cell model — dedupe
      .distinctBy(_.event_id)

  for (seed <- Seq(1L, 42L, 20260812L)) {
    test(s"ttl-strip invariants hold on generated data (seed=$seed)") {
      import spark.implicits._
      val raw = sample(seed, 500).toDF()
      val cells = CellModel.cellify(raw)
      val stripped = cells.withColumn("cell", CellModel.stripCell(col("cell")))

      // row count preserved (no grouped transform drops rows)
      assert(stripped.count() === raw.count())

      // every output TTL is NO_TTL and every row is live at any instant
      assert(stripped.filter(col("cell.ttl_s").isNotNull).count() === 0)
      assert(stripped
        .filter(!CellModel.isLive(col("cell"), Long.MaxValue))
        .count() === 0)

      // values and writetimes byte-identical (multiset equality)
      val before = cells.select(
        col("event_id"), col("cell.value"), col("cell.writetime_us"))
      val after = stripped.select(
        col("event_id"), col("cell.value"), col("cell.writetime_us"))
      assert(before.exceptAll(after).count() === 0)
      assert(after.exceptAll(before).count() === 0)

      // rows that were expired (dead at NowMicros) become visible after
      // the strip — the reference's 0-then-N assertion, generalized
      val expired = cells
        .filter(!CellModel.isLive(col("cell"), CellModel.NowMicros))
      val expiredCount = expired.count()
      val visibleAfter = stripped
        .filter(CellModel.isLive(col("cell"), CellModel.NowMicros))
        .join(expired.select("event_id"), Seq("event_id"), "left_semi")
      assert(visibleAfter.count() === expiredCount)
    }
  }
}
