package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession

/** Capped-LSH diagnostics: candidate counts and bucket-size tails at a
  * given cap, per scale — interprets the sf10 soak's capped-path cost.
  *
  *   sbt "Test/runMain graft.ProbeCap /tmp/sf3 /tmp/sf10"
  */
object ProbeCap {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      for (cap <- Seq(50, 200)) {
        val t0 = System.nanoTime()
        val n = Dedup.lshCandidatePairs(docs, "text", "doc_id",
          maxBucket = cap).count()
        println(f"$dir%-10s cap=$cap%4d cand=$n%12d " +
          f"t=${(System.nanoTime() - t0) / 1e9}%6.1fs")
      }
    }
    spark.stop()
  }
}
