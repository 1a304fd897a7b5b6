package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge DataFrames. Connected components
  * live in [[Dedup.clusterPairs]] (label propagation + pointer jumping);
  * here: triangle enumeration, the canonical "two-hop plus closing edge"
  * shuffle pattern.
  */
object Graph {

  /** All triangles (x < y < z) of an undirected graph given as canonical
    * edges (pa < pb, distinct). Two equi-joins on the edge list: the
    * wedge join (e1.pb = e2.pa) builds two-hop paths with the smallest
    * vertex in the middle position excluded by the canonical orientation,
    * and the closing join checks (x, z). Because every edge is stored
    * once in sorted orientation, each triangle is produced exactly once —
    * no post-hoc dedup shuffle. Skew note: wedge fan-out is Σ deg²; at
    * scale, cap or salt super-nodes before this join.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val e = edges.select(col("pa"), col("pb"))
    e.as("e1").join(e.as("e2"), col("e1.pb") === col("e2.pa"))
      .join(e.as("e3"),
        col("e3.pa") === col("e1.pa") && col("e3.pb") === col("e2.pb"))
      .select(col("e1.pa").as("x"), col("e1.pb").as("y"), col("e2.pb").as("z"))
  }

  /** PageRank in INTEGER arithmetic: ranks are fixed-point longs scaled
    * by `scale`, per-edge contributions are floor divisions, and the 0.85
    * damping factor is the exact rational 85/100 — so every iteration is
    * reproducible bit-for-bit in any engine (floating-point PageRank sums
    * in partition order and drifts). Oracle-checked against a DuckDB
    * recursive CTE running the identical integer recurrence.
    *
    * `edges` is directed (src, dst); pass both directions for undirected
    * graphs — that also guarantees no vertex lacks in-edges. Each
    * iteration is one shuffle keyed on dst (contribution sum) plus the
    * vertex left join; intermediates are lineage-truncated per the
    * iterative-operator rule (see Dedup.clusterPairs).
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
               scale: Long = 1000000000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d")).localCheckpoint()
    val verts = deg.select(col("src").as("p"))
    val n = verts.count()
    val r0 = scale / n
    val base = (15L * r0) / 100L
    var rank = verts.withColumn("rank", lit(r0)).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = rank.join(e, rank("p") === e("src"))
        .join(deg, "src")
        .select(col("dst"), expr("rank div d").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      rank = verts.join(contrib, verts("p") === contrib("dst"), "left")
        .select(col("p"),
          (lit(base) + expr("(85 * coalesce(s, 0)) div 100")).as("rank"))
        .localCheckpoint()
    }
    rank
  }

  /** Canonical co-occurrence edges: vertices u sharing at least one key
    * with v (u < v), deduplicated. The self-join keys on the shared
    * attribute, so parallelism scales with its cardinality.
    */
  def coOccurrenceEdges(df: DataFrame, vertexCol: String, keyCol: String): DataFrame = {
    val ps = df.select(col(vertexCol).as("p"), col(keyCol).as("s")).distinct()
    ps.as("a").join(ps.as("b"),
        col("a.s") === col("b.s") && col("a.p") < col("b.p"))
      .select(col("a.p").as("pa"), col("b.p").as("pb")).distinct()
  }
}
