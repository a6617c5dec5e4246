package graft.sources

/** The per-executor read-activity ledger — the engine's slot for the
  * reference reader's `readMeter` field and its scheduled persist
  * (`NoTTLReader.java:126` holds a [[RestorableMeter]] per open
  * sstable; `:2288-2332` syncs it to `system.sstable_activity` on a
  * five-minute schedule). Here the meter population is keyed by
  * (epoch, sstable): the EPOCH is a caller-chosen namespace (one UUID
  * per tracking run) so concurrent tracked scans in one JVM — or the
  * same registered audit re-run in a long-lived session — never blend
  * marks, and [[drop]] retires a run's meters wholesale.
  *
  * Scale model: meters live where the reads happen — one registry per
  * executor JVM, exactly like the reference's per-replica meters. A
  * lake-wide activity table is the SUM of the per-executor snapshots
  * (EWMA rates are additive across disjoint mark streams: each
  * executor meters the reads it served), which is what
  * [[SSTableMetadata.writeActivity]] materializes. Marks are cheap
  * (one map probe + O(1) EWMA math under a per-meter lock, once per
  * task per file), so tracking costs nothing visible against a real
  * scan.
  */
object ActivityRegistry {
  private val meters = new java.util.concurrent.ConcurrentHashMap[
    (String, String), RestorableMeter]()

  /** Record `n` reads of `sstable` under `epoch` at the supplied
    * clock. First mark creates the meter born at that instant (the
    * reference constructs a fresh meter when an sstable opens with no
    * persisted row). Meters are single-writer by contract; concurrent
    * tasks of one executor serialize on the meter's own lock. */
  def mark(epoch: String, sstable: String, n: Long,
      nowNanos: Long): Unit = {
    val m = meters.computeIfAbsent((epoch, sstable),
      _ => RestorableMeter.fresh(nowNanos))
    m.synchronized(m.mark(n, nowNanos))
  }

  /** Tick every meter of `epoch` to `nowNanos` and return
    * (sstable, reads, rate15/s, rate120/s) rows, sstable-sorted.
    * Ticking is idempotent for a fixed clock, so repeated snapshots
    * (one per probe task on the same executor) agree exactly. */
  def snapshot(epoch: String,
      nowNanos: Long): Seq[(String, Long, Double, Double)] = {
    import scala.jdk.CollectionConverters._
    meters.entrySet().asScala.toSeq
      .filter(_.getKey._1 == epoch)
      .map { e =>
        val m = e.getValue
        m.synchronized {
          m.tickTo(nowNanos)
          (e.getKey._2, m.count, m.fifteenMinuteRate, m.twoHourRate)
        }
      }
      .sortBy(_._1)
  }

  /** Retire every meter of `epoch` (end of a tracking run). */
  def drop(epoch: String): Unit = {
    import scala.jdk.CollectionConverters._
    meters.keySet().asScala.filter(_._1 == epoch)
      .toSeq.foreach(meters.remove)
  }
}
