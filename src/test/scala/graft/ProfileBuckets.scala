package graft

import graft.ops.Ranks
import org.apache.spark.sql.functions._

/** Micro-bench (test scope, run by hand): per-row tagging cost of
  * Ranks.prefixCounts as the bucket count scales. With the binary-search
  * RangeBucketId kernel the wall time should stay FLAT from 32 to 16384
  * buckets (O(log buckets) per row, constant generated-code size); the
  * retired when-chain form grew linearly and hit codegen splitting.
  *
  *   sbt "Test/runMain graft.ProfileBuckets"
  */
object ProfileBuckets {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val g = spark.range(0, 2000000)
      .select((col("id") * 2654435761L % 100000000L).as("v"),
        (col("id") % 5 + 1).as("c"))
      .groupBy("v").agg(sum("c").as("c"))
      .localCheckpoint()
    g.count() // materialize outside the timed region
    for (b <- Seq(32, 128, 1024, 4096, 16384); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = Ranks.prefixCounts(g, "v", Seq("c"), buckets = b).count()
      println(f"buckets=$b%6d rep=$rep rows=$n took=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
