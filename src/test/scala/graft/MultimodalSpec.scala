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
