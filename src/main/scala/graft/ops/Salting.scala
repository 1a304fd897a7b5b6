package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Explicit key-salting for skewed equi-joins.
  *
  * A join key with a handful of hot values collapses the shuffle onto a
  * handful of tasks no matter how many executors exist. Salting restores
  * parallelism deterministically: the skewed (probe) side gets a salt in
  * [0, salts) and the small (build) side is replicated once per salt
  * value, so the shuffle key (key, salt) spreads each hot key over
  * `salts` tasks. The result is row-identical to the plain equi-join.
  *
  * AQE's skew-join handles the sort-merge case adaptively at runtime;
  * this helper is the explicit, planner-independent form — the right
  * tool when the skew is known ahead of time (e.g. a language or
  * source-domain column in a training-data pipeline, where one value can
  * be half the corpus) or when AQE is unavailable (streaming).
  */
object Salting {

  /** Inner/left salted equi-join of a skewed fact side against a small
    * dimension side. The build side grows ×`salts` — keep it small, as
    * with any replicated join. (Right/full joins would see unmatched dim
    * rows `salts` times; unsupported by design.)
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, skewedKey: String,
                 dimKey: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner | left, got '$joinType'")
    // unique-per-row hash -> uniform salt, independent of data values
    // (hashing row CONTENT would send identical hot rows to one task)
    val probe = skewed.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val build = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    probe.join(build,
        probe(skewedKey) === build(dimKey) && probe("__salt") === build("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Heavy-hitter diagnostic: the top-k keys by row count with each key's
    * share of the table — the pre-flight that decides whether a join
    * needs `saltedJoin`/AQE skew handling and how many salts.
    *
    * Scale shape: one shuffle (the key count, with map-side partials);
    * the total is a broadcast scalar; top-k is distributed orderBy+limit
    * (per-partition limits, then one merge of k-row heads — the key
    * summaries are never globally sorted through a single task); the
    * rank window runs on the k survivors only.
    */
  def skewStats(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("total"))
    val top = counts.crossJoin(broadcast(total))
      .orderBy(col("n").desc, col("key")).limit(topK)
      .select(col("key"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("share"))
    // rank the <= topK survivors without a Window node (sorted-struct
    // pack — Ranks.smallRank; bounded by the limit above)
    Ranks.smallRank(top, Seq(-col("n"), col("key")), "rank")
  }
}
