package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Dynamic partition pruning: when the fact table is
  * directory-partitioned on the join key and the dimension side
  * carries a selective filter, the optimizer injects the dim's key set
  * as a RUNTIME partition filter on the fact scan — whole directories
  * are skipped based on data only known after the dim is evaluated.
  * At 100 TB this is the star-schema scan saver: a date-partitioned
  * fact joined to "last week's" dimension rows reads 7 directories,
  * not 2,500. The static analogue (a literal predicate on the
  * partition column) is pinned in SinkSpec; this spec pins the
  * runtime-injected variant.
  */
class DppSpec extends SparkSpec {

  test("a filtered dimension prunes fact partitions at runtime") {
    val out = graft.Scratch.dir("graft-dpp-").toString + "/events"
    Tables.load(spark, sfDir, "events")
      .write.partitionBy("event_type").parquet(out)
    val fact = spark.read.parquet(out)
    import spark.implicits._
    // two conditions the pruning rule needs, learned the hard way:
    // the dim must be a FILE source (over a local relation the
    // optimizer folds the filter into the relation, leaving no
    // predicate node to key on), and the filter must be a LIKELY
    // SELECTIVE predicate shape — an equality/In/Like comparison; a
    // bare boolean attribute does not qualify
    val dimPath =
      graft.Scratch.dir("graft-dpp-dim-").toString + "/dim"
    Seq(
      ("purchase", "active"), ("click", "off"), ("view", "off"),
      ("signup", "off"), ("error", "off"))
      .toDF("etype", "status").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)

    val q = fact.join(dim, fact("event_type") === dim("etype"))
      .filter(col("status") === "active")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")), 2)
          .cast("double").as("sv"))

    // the injected runtime filter shows up as dynamicpruning#N in the
    // fact scan's PartitionFilters
    val p = q.queryExecution.executedPlan.toString()
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$p")

    // and the answer equals the statically-filtered aggregate
    val expect = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")), 2)
          .cast("double").as("sv"))
    assert(q.collect().toSeq == expect.collect().toSeq)
  }
}
