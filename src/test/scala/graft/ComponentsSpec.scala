package graft

import graft.ops.DedupOps

/** Star-contraction connected components: the deep-graph path label
  * propagation cannot serve (its rounds scale with graph DIAMETER; a
  * chain of serial near-copies can be arbitrarily deep). Checked
  * against exact closures computed independently, and against the
  * propagation path on the real LSH fixture graph.
  */
class ComponentsSpec extends SparkSpec {

  private def edgesDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph deeper than the propagation cap converges in O(log n) rounds") {
    // a 41-node chain (diameter 40 — double the propagation cap of 20);
    // exact closure: every node's component is 0. maxRounds=10 is the
    // O(log n) claim made executable: propagation would need 40 rounds.
    val chain = (0L until 40L).map(i => (i, i + 1))
    val got = labelMap(DedupOps.starContraction(edgesDf(chain), maxRounds = 10))
    assert(got === (0L to 40L).map(_ -> 0L).toMap)
  }

  test("multiple components, arbitrary edge orientation, duplicate edges") {
    // two chains + one triangle, edges deliberately reversed/duplicated;
    // exact closure by construction
    val edges = (100L until 125L).map(i => (i + 1, i)) ++ // chain 100..125
      (500L until 530L).map(i => (i, i + 1)) ++           // chain 500..530
      Seq((900L, 901L), (901L, 902L), (902L, 900L),       // triangle
        (900L, 901L), (901L, 900L))                       // duplicates
    val got = labelMap(DedupOps.starContraction(edgesDf(edges)))
    val want =
      (100L to 125L).map(_ -> 100L) ++
        (500L to 530L).map(_ -> 500L) ++
        (900L to 902L).map(_ -> 900L)
    assert(got === want.toMap)
  }

  test("random graphs: star contraction equals union-find exact components") {
    // seeded sparse random graphs (deterministic — no flaky coverage):
    // sparse edge probability yields long chains and isolated pairs,
    // the shapes that stress contraction; the oracle is an in-test
    // union-find over the collected edges with min-id relabeling
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(ra max rb) = ra min rb
      }
      // min-id labeling: the root chain always compresses toward the
      // smaller id because union parks the larger root under the smaller
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val edges = for {
        a <- 0 until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.04
      } yield (a.toLong, b.toLong)
      if (edges.nonEmpty) {
        val got = labelMap(DedupOps.starContraction(edgesDf(edges)))
        val want = unionFind(n, edges)
          .filter { case (node, _) => // contraction labels edge nodes only
            edges.exists(e => e._1 == node || e._2 == node)
          }
        assert(got === want, s"seed $seed: components diverge")
      }
    }
  }

  test("dedupComponents falls back to star contraction and matches propagation") {
    // maxIters=0 skips the propagation loop entirely, forcing the
    // star-contraction path over the REAL fixture LSH graph; it must
    // produce exactly the converged propagation labeling (both assign
    // min doc_id per component) — the equivalence that makes the
    // fallback safe to take silently at scale.
    val viaStars = DedupOps.dedupComponents(spark, sfDir, DedupOps.Md5,
      maxIters = 0)
    val viaProp = DedupOps.dedupComponents(spark, sfDir, DedupOps.Md5)
    assert(viaStars.count() === viaProp.count())
    assert(viaStars.exceptAll(viaProp).isEmpty &&
      viaProp.exceptAll(viaStars).isEmpty,
      "star-contraction labeling diverges from converged propagation")
  }
}
