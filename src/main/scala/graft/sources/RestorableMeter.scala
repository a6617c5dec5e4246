package graft.sources

/** Cassandra's `RestorableMeter` (the PUBLIC
  * `org.apache.cassandra.metrics.RestorableMeter` semantics): two
  * exponentially-weighted moving averages over 15-minute and
  * 120-minute windows, ticked on a fixed 5-second cadence, whose
  * CURRENT RATES are persistable and restorable — the property the
  * name is about, and what lets `system.sstable_activity` survive a
  * restart. The reference's summary-redistribution path weighs every
  * file by this meter's 15-minute rate (`IndexSummaryManager`'s
  * hotness input, read off `SSTableReader.getReadMeter`).
  *
  * Deterministic by construction: the clock is SUPPLIED (nanos), not
  * sampled — the engine's oracle replays traces exactly, and at scale
  * callers feed whatever clock discipline their executor has. The
  * EWMA math is the textbook/metrics-core form Cassandra uses:
  * per-tick `rate += alpha * (instant - rate)` with
  * `alpha = 1 - exp(-interval / window)`, instant rates kept
  * per-nanosecond internally and served per-second.
  *
  * Not thread-safe: one meter per (file, executor) — the same
  * single-writer discipline the component cache uses.
  */
final class RestorableMeter private (
    private var r15: Double,           // per-nanosecond EWMA
    private var r120: Double,
    private var initialized: Boolean,  // restored meters start true
    startNanos: Long) {

  import RestorableMeter._

  private var lastTick: Long = startNanos
  private var uncounted: Long = 0L
  private var totalCount: Long = 0L

  /** Total marks since construction (restore resets it, as
    * Cassandra's does not persist the count into the EWMA). */
  def count: Long = totalCount

  /** Record `n` reads at absolute time `nowNanos` (monotonic,
    * caller-supplied). Ticks any elapsed 5-second intervals FIRST —
    * marks land in the interval that contains them. */
  def mark(n: Long, nowNanos: Long): Unit = {
    tickIfNecessary(nowNanos)
    uncounted += n
    totalCount += n
  }

  /** Advance the clock without marking (an idle file still decays). */
  def tickTo(nowNanos: Long): Unit = tickIfNecessary(nowNanos)

  private def tickIfNecessary(nowNanos: Long): Unit = {
    val age = nowNanos - lastTick
    // STRICT bound, as metrics-core's `tickIfNecessary` (which
    // Cassandra's meter defers to): an age of EXACTLY one interval
    // does not tick — the boundary instant still belongs to the
    // open interval, and marks landing there accumulate into it.
    if (age > TickIntervalNanos) {
      val ticks = age / TickIntervalNanos
      lastTick += ticks * TickIntervalNanos
      // only the FIRST tick sees the uncounted marks; the remaining
      // k-1 ticks of a long silence are pure geometric decay,
      // computed CLOSED-FORM — a restored meter ticked against a
      // real epoch/uptime clock jumps by ~1e8 intervals, and looping
      // the EWMA once per interval would spin for seconds per meter
      val instant = uncounted.toDouble / TickIntervalNanos
      uncounted = 0L
      if (initialized) {
        r15 += Alpha15 * (instant - r15)
        r120 += Alpha120 * (instant - r120)
      } else {
        r15 = instant
        r120 = instant
        initialized = true
      }
      val silent = ticks - 1
      if (silent > 0) {
        r15 *= math.pow(1.0 - Alpha15, silent.toDouble)
        r120 *= math.pow(1.0 - Alpha120, silent.toDouble)
      }
    }
  }

  /** 15-minute EWMA rate, events per second. */
  def fifteenMinuteRate: Double = r15 * NanosPerSecond

  /** 120-minute EWMA rate, events per second. */
  def twoHourRate: Double = r120 * NanosPerSecond

  /** The persistable state — exactly what Cassandra's
    * `sstable_activity` row holds (rates per second). */
  def snapshot: (Double, Double) = (fifteenMinuteRate, twoHourRate)
}

object RestorableMeter {
  /** The reference cadence: EWMAs tick every 5 seconds. */
  val TickIntervalNanos: Long = 5L * 1000 * 1000 * 1000
  val NanosPerSecond: Double = 1e9
  /** alpha = 1 - exp(-tickSeconds / windowSeconds). */
  val Alpha15: Double = 1.0 - math.exp(-5.0 / (60.0 * 15))
  val Alpha120: Double = 1.0 - math.exp(-5.0 / (60.0 * 120))

  /** A fresh meter: rates start uninitialized (the first tick SETS
    * the rate rather than decaying toward it, metrics-core's
    * first-tick rule). */
  def fresh(startNanos: Long = 0L): RestorableMeter =
    new RestorableMeter(0.0, 0.0, initialized = false, startNanos)

  /** Restore from persisted per-second rates — the constructor
    * Cassandra runs on every sstable at startup. A restored meter is
    * INITIALIZED: its next tick decays from the restored value
    * instead of discarding it. */
  def restore(fifteenMinuteRate: Double, twoHourRate: Double,
      startNanos: Long = 0L): RestorableMeter =
    new RestorableMeter(fifteenMinuteRate / NanosPerSecond,
      twoHourRate / NanosPerSecond, initialized = true, startNanos)
}
