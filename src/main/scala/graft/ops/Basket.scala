package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Market-basket mining beyond raw co-occurrence counts: association
  * rules with support / confidence / lift. The reference has no
  * relational surface at all (it stops at byte-level conversion,
  * /root/reference/crates/evolution-parser/src/parser.rs:1-40); this is
  * §7.5 extension surface next to the co-purchase pair counts.
  *
  * Scale shape: the pair fan-out is the order-keyed self-join —
  * C(basket, 2) per order, bounded by basket size, never corpus² — and
  * the marginals are one aggregate joined back on the item id
  * (broadcast-able at catalog sizes, an ordinary id-keyed join beyond).
  * All metrics are truncating ×10⁶ fixed point against exact integer
  * counts, so any engine replays them bit-for-bit. Long bound:
  * n_pair·10⁶·n_orders < 2⁶³ (cast to decimals beyond ~9·10⁶ orders per
  * hot pair — i.e. never for real baskets).
  */
object Basket {

  /** Association rules a→b over (order, item) pairs: for each co-bought
    * UNORDERED pair (a < b), support counts plus directional confidence
    * n(ab)/n(a), n(ab)/n(b) and symmetric lift n(ab)·N/(n(a)·n(b)),
    * top-k by (lift desc, pa, pb).
    */
  def assocRules(df: DataFrame, orderCol: String, itemCol: String,
                 k: Int = 20, minPairs: Long = 2L): DataFrame = {
    val ps = df.select(col(orderCol).as("o"), col(itemCol).as("p")).distinct()
    val nOrders = ps.select("o").distinct().count()
    val item = ps.groupBy("p").agg(count(lit(1)).as("n_item"))
    val pairs = ps.as("a").join(ps.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairs)
    pairs
      .join(item.select(col("p").as("pa"), col("n_item").as("n_a")), "pa")
      .join(item.select(col("p").as("pb"), col("n_item").as("n_b")), "pb")
      .select(col("pa"), col("pb"), col("n_pair"), col("n_a"), col("n_b"),
        expr("n_pair * 1000000 div n_a").as("conf_ab_x1e6"),
        expr("n_pair * 1000000 div n_b").as("conf_ba_x1e6"),
        expr(s"n_pair * 1000000 * ${nOrders}L div (n_a * n_b)").as("lift_x1e6"))
      .orderBy(col("lift_x1e6").desc, col("pa"), col("pb"))
      .limit(k)
  }
}
