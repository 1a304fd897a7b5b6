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
