package graft

import graft.ops.Linkage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf30 golden-record probe (test scope, run by hand): the full
  * q_golden_record pipeline (linkage → decide → goldenRecord merge)
  * exact vs maxBlockPairs-capped, with the SURVIVORSHIP delta — how many
  * merged customer records differ in any output column between the two
  * regimes. One variant per step but both in one invocation: the diff
  * needs both frames, and each is localCheckpointed so the second build
  * never rescans the first's lineage (the heavy candidate pass runs once
  * per variant regardless of JVM warmth — the DELTA is the point here,
  * the wall numbers are secondary to ProbeLinkCap's fresh-JVM ones).
  *
  *   sbt "Test/runMain graft.ProbeGolden /tmp/sf30"
  */
object ProbeGolden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val cust = spark.read.parquet(s"$dir/customer.parquet")
      def golden(cap: Long): (org.apache.spark.sql.DataFrame, Long, Double) = {
        val t0 = System.nanoTime()
        val g = Linkage.goldenRecord(
          Linkage.decide(Linkage.linkCustomers(cust, maxBlockPairs = cap), 18, 5)
            .filter(col("zone") === "match")).localCheckpoint()
        val n = g.count()
        (g, n, (System.nanoTime() - t0) / 1e9)
      }
      val (ge, nE, tE) = golden(Long.MaxValue)
      val (gc, nC, tC) = golden(100000L)
      // survivorship delta: records present in exactly one regime, plus
      // records present in both whose merged fields differ
      val joined = ge.as("e").join(gc.as("c"), Seq("c_custkey"), "full_outer")
      val onlyExact = joined.filter(col("c.n_matched").isNull).count()
      val onlyCapped = joined.filter(col("e.n_matched").isNull).count()
      val fieldDiff = joined.filter(col("e.n_matched").isNotNull &&
        col("c.n_matched").isNotNull &&
        (col("e.n_matched") =!= col("c.n_matched") ||
          col("e.best_name") =!= col("c.best_name") ||
          col("e.max_bal") =!= col("c.max_bal"))).count()
      println(f"$dir%-10s golden exact=$nE%9d (${tE}%7.1fs) capped=$nC%9d " +
        f"(${tC}%7.1fs) only_exact=$onlyExact%6d only_capped=$onlyCapped%6d " +
        f"field_diff=$fieldDiff%6d")
    }
    spark.stop()
  }
}
