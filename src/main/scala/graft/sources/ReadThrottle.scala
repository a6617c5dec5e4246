package graft.sources

import java.io.InputStream

import org.apache.hadoop.fs.FSDataInputStream

/** The reference's rate-limited data read in its LITERAL form
  * (S11): `NoTTLReader.getScanner(RateLimiter)` /
  * `openDataReader(limiter)` (`NoTTLReader.java:1791-1794,
  * 1987-1991`; the scanner threads it at `NoTTLScanner.java:47-55`)
  * throttle the bytes the scan pulls off the Data.db file so an
  * offline bulk job cannot starve co-resident readers of disk
  * bandwidth. Re-expressed for the DSv2 connector as a
  * `maxBytesPerSec` read option: every Data.db byte a task consumes
  * passes a per-JVM token bucket shared by all tasks of that
  * executor — the reference's own sharing shape (one `RateLimiter`
  * instance serves every scanner of the process), so a 32-slot
  * executor stays at the configured aggregate rate instead of 32×
  * it. Index/Filter/Summary sidecar reads stay unthrottled, as the
  * reference's do.
  *
  * The bucket is Guava-`SmoothBursty`-shaped ("pay forward"): an
  * acquire never waits for its OWN permits, only for debt left by
  * earlier acquires — so one oversized read doesn't stall its
  * caller, it slows the following ones. Time sources are injectable
  * so the arithmetic is spec-pinned on a virtual clock; production
  * uses nanoTime + parkNanos. */
object ReadThrottle {

  final class ByteRateLimiter(
      val bytesPerSec: Double,
      nanoTime: () => Long = () => System.nanoTime(),
      sleep: Long => Unit =
        nanos => java.util.concurrent.locks.LockSupport.parkNanos(nanos)) {
    require(bytesPerSec > 0, s"maxBytesPerSec must be > 0: $bytesPerSec")
    private var nextFreeNanos = Long.MinValue
    private var acquiredBytes = 0L

    /** Block until the bucket admits `bytes`; returns the nanos
      * actually waited (0 on an un-backlogged bucket). */
    def acquire(bytes: Long): Long = {
      require(bytes >= 0, s"acquire($bytes)")
      if (bytes == 0) return 0L
      var waitNanos = 0L
      synchronized {
        val now = nanoTime()
        if (nextFreeNanos == Long.MinValue) nextFreeNanos = now
        waitNanos = math.max(0L, nextFreeNanos - now)
        // pay forward: this acquire's cost lands on the NEXT caller
        nextFreeNanos = math.max(nextFreeNanos, now) +
          (bytes * 1e9 / bytesPerSec).toLong
        acquiredBytes += bytes
      }
      if (waitNanos > 0) sleep(waitNanos)
      waitNanos
    }

    def totalAcquiredBytes: Long = synchronized(acquiredBytes)
  }

  /** One limiter per (JVM, rate) — every task of an executor that
    * reads with the same `maxBytesPerSec` shares the bucket, the
    * reference's one-RateLimiter-per-process shape. */
  private val limiters =
    new java.util.concurrent.ConcurrentHashMap[Double, ByteRateLimiter]()
  def limiterFor(bytesPerSec: Double): ByteRateLimiter =
    limiters.computeIfAbsent(bytesPerSec,
      r => new ByteRateLimiter(r))
  /** Spec hook: drop shared buckets so a suite's rates don't leak
    * backlog into the next test. */
  private[graft] def resetForTest(): Unit = limiters.clear()

  /** Per-reader accounting the DSv2 task metrics report: the shared
    * limiter cannot attribute waits to tasks, so each reader's
    * wrapped streams tally their own. */
  final class Account {
    @volatile var waitNanos: Long = 0L
    @volatile var bytes: Long = 0L
  }

  /** A seekable throttled view over an `FSDataInputStream`: ON-DISK
    * bytes are metered as they are consumed (after the read — the
    * pay-forward bucket makes pre/post equivalent one buffer apart),
    * seeks reposition without consuming permits (a seek moves no
    * data). Implements Hadoop's `Seekable`/`PositionedReadable` so
    * it can wear an `FSDataInputStream` shell and serve every
    * call-site shape the reader has (sequential scan, chunk-map
    * seeks, positioned reads). */
  final class ThrottledSeekableStream(in: FSDataInputStream,
      limiter: ByteRateLimiter, account: Account)
      extends InputStream with org.apache.hadoop.fs.Seekable
      with org.apache.hadoop.fs.PositionedReadable {
    private def meter(n: Int): Int = {
      if (n > 0) {
        account.bytes += n
        account.waitNanos += limiter.acquire(n.toLong)
      }
      n
    }
    override def read(): Int = {
      val b = in.read()
      if (b >= 0) meter(1)
      b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      meter(in.read(b, off, len))
    override def skip(n: Long): Long = in.skip(n)
    override def available(): Int = in.available()
    override def close(): Unit = in.close()
    override def seek(pos: Long): Unit = in.seek(pos)
    override def getPos: Long = in.getPos
    override def seekToNewSource(targetPos: Long): Boolean =
      in.seekToNewSource(targetPos)
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int = meter(in.read(position, buffer, offset, length))
    override def readFully(position: Long, buffer: Array[Byte],
        offset: Int, length: Int): Unit = {
      in.readFully(position, buffer, offset, length)
      meter(length)
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }

  /** Wrap a data stream for a reader: same `FSDataInputStream`
    * surface, every consumed byte metered into `account` through the
    * JVM-shared bucket for `bytesPerSec`. */
  def wrap(in: FSDataInputStream, bytesPerSec: Double,
      account: Account): FSDataInputStream =
    new FSDataInputStream(new ThrottledSeekableStream(in,
      limiterFor(bytesPerSec), account))
}
