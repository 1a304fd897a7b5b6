package graft

import graft.ops.Linkage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf30 linkage-cap probe: the maxBlockPairs contract says the cap is
  * the >=sf30 opt-in once pass-A's residual n²/cells growth dominates.
  * Measure, at a given scale: exact blocked-pair count + time, capped
  * count + time, and the capped path's TRUE-MATCH recall (score >= 18
  * pairs kept vs exact) — the number the contract promises stays whole
  * because pass B's bounded name-digit blocks catch every fixture-true
  * pair.
  *
  *   sbt "Test/runMain graft.ProbeLinkCap /tmp/sf30"
  */
object ProbeLinkCap {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val cust = spark.read.parquet(s"$dir/customer.parquet")
      var t0 = System.nanoTime()
      val exact = Linkage.linkCustomers(cust, maxBlockPairs = Long.MaxValue)
        .filter(col("fs_score") >= 18)
        .select("d_id", "c_custkey").distinct().localCheckpoint()
      val nExactMatches = exact.count()
      val tExact = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val capped = Linkage.linkCustomers(cust, maxBlockPairs = 100000L)
        .filter(col("fs_score") >= 18)
        .select("d_id", "c_custkey").distinct().localCheckpoint()
      val nCapMatches = capped.count()
      val tCap = (System.nanoTime() - t0) / 1e9
      val kept = capped.join(exact, Seq("d_id", "c_custkey"), "left_semi").count()
      println(f"$dir%-10s exact_matches=$nExactMatches%9d t=$tExact%7.1fs " +
        f"cap_matches=$nCapMatches%9d t=$tCap%7.1fs recall=${kept.toDouble / nExactMatches}%.4f")
    }
    spark.stop()
  }
}
