package graft

import graft.sources.RestorableMeter
import org.scalatest.funsuite.AnyFunSuite

/** Cassandra's `RestorableMeter` semantics (the 15m/120m EWMA pair
  * behind `system.sstable_activity` and the summary-redistribution
  * hotness input): first-tick initialization, per-tick decay,
  * multi-interval tick batching, mark placement, and the
  * restore-then-keep-decaying contract. */
class RestorableMeterSpec extends AnyFunSuite {
  private val T = RestorableMeter.TickIntervalNanos
  private val d15 = math.exp(-5.0 / 900.0)
  private val d120 = math.exp(-5.0 / 7200.0)

  test("constant input pins both rates at count/interval exactly " +
    "(first tick initializes, later ticks see zero delta)") {
    val m = RestorableMeter.fresh(0L)
    (0 until 20).foreach(i => m.mark(10, i * T + 1))
    m.tickTo(20 * T)
    assert(math.abs(m.fifteenMinuteRate - 2.0) < 1e-12) // 10 per 5s
    assert(math.abs(m.twoHourRate - 2.0) < 1e-12)
    assert(m.count === 200L)
  }

  test("silence decays by exp(-tick/window) per tick — the two " +
    "windows at their own alphas") {
    val m = RestorableMeter.fresh(0L)
    (0 until 12).foreach(i => m.mark(5, i * T + 1))
    m.tickTo(12 * T)        // flush the burst: both rates at 1.0
    assert(math.abs(m.fifteenMinuteRate - 1.0) < 1e-12)
    m.tickTo((12 + 7) * T)  // 7 silent ticks
    assert(math.abs(m.fifteenMinuteRate - math.pow(d15, 7)) < 1e-12)
    assert(math.abs(m.twoHourRate - math.pow(d120, 7)) < 1e-12)
    // 120m decays slower than 15m, always
    assert(m.twoHourRate > m.fifteenMinuteRate)
  }

  test("a long gap ticks ONCE with the uncounted marks and then " +
    "zeros — equivalent to mark, one tick, then silence") {
    val a = RestorableMeter.fresh(0L)
    a.mark(5, 1)
    a.tickTo(10 * T)        // one 10-interval jump
    val b = RestorableMeter.fresh(0L)
    b.mark(5, 1)
    // exact multiples: the strict boundary rule groups these into
    // two-interval batches, but the total tick count (1 with marks +
    // 9 silent) is the same — decay is multiplicative
    (1 to 10).foreach(i => b.tickTo(i * T))
    // the jump path computes the 9 silent ticks closed-form
    // (pow(1-alpha, 9)), the single-tick path multiplies nine times —
    // same EWMA value within float association noise, not bit-equal
    assert(math.abs(a.fifteenMinuteRate - b.fifteenMinuteRate) < 1e-12)
    assert(math.abs(a.twoHourRate - b.twoHourRate) < 1e-12)
    assert(math.abs(a.fifteenMinuteRate - math.pow(d15, 9)) < 1e-12)
  }

  test("sub-interval time never ticks; marks accumulate until the " +
    "boundary passes") {
    val m = RestorableMeter.fresh(0L)
    m.mark(3, 100)
    m.mark(4, T - 1)
    assert(m.fifteenMinuteRate === 0.0) // uninitialized, no tick yet
    // metrics-core's STRICT bound: an age of exactly one interval is
    // still inside the open interval — no tick (Cassandra's meter
    // defers to the same rule)
    m.tickTo(T)
    assert(m.fifteenMinuteRate === 0.0)
    m.mark(0, T) // marks on the boundary instant join the interval
    m.tickTo(T + 1)
    assert(math.abs(m.fifteenMinuteRate - 7.0 / 5.0) < 1e-12)
  }

  test("restore starts INITIALIZED at the persisted rates and decays " +
    "from them — never re-initializes on the next tick") {
    val m = RestorableMeter.restore(2.4, 1.2, 0L)
    // per-second → per-nanosecond → per-second roundtrip: 1e9 is not
    // a power of two, so allow an ulp
    assert(math.abs(m.fifteenMinuteRate - 2.4) < 1e-12)
    assert(math.abs(m.twoHourRate - 1.2) < 1e-12)
    assert(m.count === 0L) // the count does not persist into the EWMA
    m.tickTo(3 * T)
    assert(math.abs(m.fifteenMinuteRate - 2.4 * math.pow(d15, 3)) < 1e-12)
    assert(math.abs(m.twoHourRate - 1.2 * math.pow(d120, 3)) < 1e-12)
    // a restored meter keeps absorbing new traffic
    m.mark(50, 3 * T + 1)
    m.tickTo(4 * T + 1)
    val before = 2.4 * math.pow(d15, 3)
    val alpha = RestorableMeter.Alpha15
    assert(math.abs(m.fifteenMinuteRate -
      (before + alpha * (10.0 - before))) < 1e-12)
  }

  test("snapshot/restore roundtrip is rate-exact") {
    val m = RestorableMeter.fresh(0L)
    (0 until 9).foreach(i => m.mark(7, i * T + 1))
    m.tickTo(11 * T)
    val (r15, r120) = m.snapshot
    val back = RestorableMeter.restore(r15, r120, 11 * T)
    // tick both two more silent intervals in lockstep
    m.tickTo(13 * T); back.tickTo(13 * T)
    assert(math.abs(m.fifteenMinuteRate - back.fifteenMinuteRate) < 1e-12)
    assert(math.abs(m.twoHourRate - back.twoHourRate) < 1e-12)
  }
}
