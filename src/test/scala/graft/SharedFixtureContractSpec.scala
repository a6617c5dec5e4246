package graft

import graft.sources.SSTableBinaryV2

/** The shared-fixture READ-ONLY contract, executable: the per-JVM
  * memoized fixture trees ([[SSTableBinaryV2.binaryFixtureShared]],
  * [[SSTableBinaryV2.plainGenSetShared]],
  * [[graft.ops.MultimodalOps.assetDirShared]]) are consumed by ~20
  * registered audits on the promise that every consumer only READS
  * them — anything that junks a Data.db, rewrites a Statistics.db or
  * deletes a component must build a private copy, because a mutation
  * here poisons every later query in the JVM. That promise used to
  * live in comments; this spec snapshots the trees (path, length,
  * mtime, content CRC) and re-checks after EVERY consumer query, so
  * a poisoned fixture becomes a named spec failure — "query X
  * mutated file Y" — instead of a mystery oracle miss three queries
  * later. */
class SharedFixtureContractSpec extends SparkSpec {

  /** Every registered query that reads a shared fixture tree
    * (compiled from the call sites of the three Shared accessors). */
  private val consumers = Seq(
    "src_sstable_binary", "src_sstable_roundtrip", "src_sstable_split",
    "src_sstable_split_lz4", "src_sstable_token_range",
    "src_sstable_token_typed", "src_sstable_point",
    "src_sstable_point_lz4", "src_sstable_scrub", "src_sstable_digest",
    "src_sstable_stats", "src_sstable_relevel", "src_sstable_keycount",
    "src_sstable_metadata", "src_sstable_summary_budget",
    "src_sstable_read_meter", "src_sstable_expired_blockers",
    "src_sstable_dump_export", "m_file_ingest", "st_file_ingest",
    "st_sstable_ingest", "st_sstable_sink")

  /** The fixture's own scratch dir: accessors may return a SUBPATH of
    * it (`<scratch>/graft/documents` from the plain-set accessor), so
    * walk up to the outermost `graft-*` Scratch ancestor — the dir is
    * exclusive to the fixture, and snapshotting from there makes a
    * mutation of a SIBLING path (a stray keyspace dir, a sidecar
    * dropped next to the tree) a contract violation too, not just
    * mutations inside the returned subtree. */
  private def scratchRootOf(root: String): java.nio.file.Path = {
    var p = java.nio.file.Paths.get(root)
    var r = p
    while (p != null) {
      if (p.getFileName != null &&
        p.getFileName.toString.startsWith("graft-")) r = p
      p = p.getParent
    }
    r
  }

  private def snapshot(root: String): Map[String, (Long, Long, Long)] = {
    val p = scratchRootOf(root)
    val walk = java.nio.file.Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map { f =>
          val crc = new java.util.zip.CRC32()
          crc.update(java.nio.file.Files.readAllBytes(f))
          f.toString -> ((java.nio.file.Files.size(f),
            java.nio.file.Files.getLastModifiedTime(f).toMillis,
            crc.getValue))
        }.toMap
    } finally walk.close()
  }

  test("every shared-fixture consumer leaves the shared trees " +
    "byte-identical (the mutating audits keep private copies)") {
    val roots = Seq(
      SSTableBinaryV2.binaryFixtureShared(spark, sfDir),
      SSTableBinaryV2.plainGenSetShared(spark, sfDir),
      graft.ops.MultimodalOps.assetDirShared(spark, sfDir))
    val missing = consumers.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty,
      s"consumer list drifted off the registry: $missing")
    val before = roots.map(r => r -> snapshot(r)).toMap
    assert(before.values.map(_.size).sum > 0, "empty shared fixtures")
    consumers.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      roots.foreach { r =>
        val now = snapshot(r)
        val was = before(r)
        val changed = (was.keySet ++ now.keySet).filter(k =>
          was.get(k) != now.get(k))
        assert(changed.isEmpty,
          s"query '$name' mutated the shared tree $r: " +
            changed.toSeq.sorted.take(5).mkString(", "))
      }
    }
  }
}
