package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** The id-sub-block all-pairs grid — the ONE implementation of the
  * trickiest join condition in the codebase, shared by every operator
  * that must scan all unordered pairs within a (possibly hot) key block.
  *
  * A plain equi-join on the block key alone is a scale trap twice over:
  * few distinct keys means a handful of shuffle partitions carry ALL the
  * quadratic work (a 1000-executor cluster idles 990), and if one side
  * broadcasts, the probe side's input partitioning caps parallelism
  * instead. So each block splits into `g` sub-blocks by id, and pairs are
  * covered by the (i <= j) cell grid: the left role explodes to cells
  * (sb, j) for j >= sb, the right role to (i, sb) for i <= sb. A pair
  * with sub-blocks (x, y), x < y, meets in exactly cell (x, y); x == y
  * pairs meet on the diagonal, gated by id ordering so each unordered
  * pair appears ONCE, in arbitrary orientation. That turns k hot keys
  * into k·g·(g+1)/2 balanced keys with the same total pair count, and
  * neither side ever needs to fit in memory. Both sides are
  * explode-derived (invisible to the size estimator), so the join is
  * pinned shuffle-hash — a broadcast here would ship a corpus-sized
  * frame.
  *
  * Returns the join of `df.as("a")` with `df.as("b")`: select through the
  * `a.` / `b.` qualifiers. Callers computing symmetric scores (dot,
  * intersection counts) may least/greatest the ids — IEEE-commutative
  * arithmetic cannot change a bit under the orientation swap.
  */
object Grid {
  def allPairs(df: DataFrame, idCol: String, g: Int,
               keyCols: Seq[String] = Nil): DataFrame = {
    val e = df.withColumn("__sb", pmod(col(idCol), lit(g)).cast("int"))
    val lhs = e.withColumn("__cj", explode(sequence(col("__sb"), lit(g - 1))))
    val rhs = e.withColumn("__ci", explode(sequence(lit(0), col("__sb"))))
    val cond = keyCols.map(kc => col(s"a.$kc") === col(s"b.$kc"))
      .foldLeft(
        col("a.__sb") === col("b.__ci") && col("a.__cj") === col("b.__sb") &&
          (col("a.__sb") < col("a.__cj") ||
            col(s"a.$idCol") < col(s"b.$idCol")))(_ && _)
    lhs.as("a").hint("shuffle_hash").join(rhs.as("b").hint("shuffle_hash"), cond)
  }
}
