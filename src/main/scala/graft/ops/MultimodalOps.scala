package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed partition-wise in batches.
  *
  * The decode step is a STUB — image/audio codecs are not in this
  * container — but everything Spark-side is real: the binary column,
  * the schema of the decoded metadata, the `mapPartitions` batch shape
  * (the Scala analogue of `mapInPandas` batches), and the partitioning.
  * The fake decode is deterministic arithmetic on the payload length so
  * it is oracle-checkable.
  */
object MultimodalOps {

  /** Decoded-media metadata record (what a real codec would emit). */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      format: String)

  /** Deterministic fake decode of a media payload. A real pipeline
    * swaps only this function for a codec call; schema, batching and
    * partitioning are unchanged. */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      width = (n % 64).toInt + 16,
      height = (n % 48).toInt + 16,
      n_frames = (n % 8).toInt + 1,
      format = if (n % 2 == 0) "fake-rgb8" else "fake-yuv420")
  }

  /** Binary ingest → partition-wise batched decode → typed metadata.
    * `mapPartitions` processes each partition as one batch (no per-row
    * driver round-trips); output is a typed Dataset with a stable
    * schema, ready to join back to the document corpus.
    */
  def mediaDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    // explicit record batches inside each partition (the shape a
    // vectorized decode — mapInPandas / Arrow — consumes): the codec
    // swap point receives a Seq of payloads, not one row at a time
    media
      .mapPartitions(_.grouped(64).flatMap(batch =>
        batch.map { case (id, bytes) => fakeDecode(id, bytes) }))
      .toDF()
  }

  /** Frame-sampling shape: every decoded asset contributes n_frames
    * rows (posexplode of a synthesized frame index), the schema a video
    * pipeline feeds to a feature extractor. */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    mediaDecode(spark, sfDir)
      .select(col("doc_id"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1)))
      .select(col("doc_id"), col("col").as("frame_idx"), col("n_frames"))

  /** Resize planning: fit each decoded asset into a 32×32 box
    * preserving aspect ratio. Pure integer arithmetic (`DIV`) so the
    * result is bit-identical on any engine — no float rounding. This
    * is the metadata half of a resize; the pixel half is the same
    * batched codec boundary as [[mediaDecode]] (swap `fakeDecode` for
    * decode+scale), which is why no second stub is needed. Output
    * bytes assume 3 bytes/px (the fake-rgb8 shape).
    */
  def resize(spark: SparkSession, sfDir: String): DataFrame =
    mediaDecode(spark, sfDir)
      .select(
        col("doc_id"), col("width"), col("height"),
        expr("CAST(width AS BIGINT) * 32 DIV greatest(width, height)")
          .as("out_w"),
        expr("CAST(height AS BIGINT) * 32 DIV greatest(width, height)")
          .as("out_h"))
      .withColumn("out_bytes", col("out_w") * col("out_h") * 3)

  /** Per-frame feature extraction shape: each sampled frame yields a
    * fixed-width feature vector (flattened to scalar columns f0..f3 —
    * the schema an ANN index ingests; see SimilarityOps for the
    * consumer side). Features are deterministic arithmetic on
    * (doc_id, frame_idx) — a real extractor swaps the projection for a
    * model call at the same batch boundary as the decode. Stays a pure
    * codegen projection: zero shuffles on top of frameSample.
    */
  def featureExtract(spark: SparkSession, sfDir: String): DataFrame = {
    def feat(j: Int) =
      (((col("doc_id") * 31 + col("frame_idx")) * 17 + j) % 1000)
        .cast("double") / 1000.0
    frameSample(spark, sfDir)
      .select(col("doc_id"), col("frame_idx"),
        feat(0).as("f0"), feat(1).as("f1"), feat(2).as("f2"),
        feat(3).as("f3"))
  }

  /** Cross-video frame-level dedup — the multimodal analogue of
    * substring dedup: every sampled frame fingerprints (its quantized
    * feature vector packed into one integer — the role a perceptual
    * hash plays over real pixels), a fingerprint seen in ≥ 2 distinct
    * videos marks its frames duplicated, and each video reports its
    * duplicated-frame exposure (intro/outro cards, stock footage,
    * re-uploads). Consumes [[featureExtract]]'s OUTPUT — the vectors a
    * real extractor yields — so quantization is `round(f·1000)`
    * (exact: features are k/1000 by construction, and the round
    * recovers k identically in both engines; a real pipeline would
    * coarsen here, trading recall for tolerance). Scale shape =
    * `d_substring_dedup`'s: fingerprint-keyed aggregation and a join
    * back, (doc_id, fp) rows only, nothing quadratic.
    */
  def frameDedup(spark: SparkSession, sfDir: String): DataFrame = {
    def q(c: Column): Column = round(c * 1000, 0).cast("long")
    val fp = featureExtract(spark, sfDir)
      .select(col("doc_id"),
        (q(col("f0")) * 1000000000L + q(col("f1")) * 1000000L +
          q(col("f2")) * 1000L + q(col("f3"))).as("fp"))
      // two consumers (dup set + per-doc probe): materialize once
      .localCheckpoint()
    val dup = fp.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("fp"))
    val dupPerDoc = fp.join(dup, "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_frames"))
    fp.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"))
      .join(dupPerDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup_frames"))
      .select(col("doc_id"),
        col("n_frames").cast("long").as("n_frames"),
        col("n_dup_frames").cast("long").as("n_dup_frames"),
        round(col("n_dup_frames").cast("double") /
          col("n_frames").cast("double"), 6).as("dup_ratio"))
  }
}
