package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession

/** Clean-JVM capped dedup end-to-end timing (generation + verification +
  * clustering) — ProbeSoak measured the capped pass right after the
  * exact pass in one JVM, where 114M-candidate GC pressure pollutes the
  * number.
  *
  *   sbt "Test/runMain graft.ProbeCapCluster /tmp/sf10"
  */
object ProbeCapCluster {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val n = Dedup.clusterPairs(
        Dedup.minhashLsh(docs, "text", "doc_id", maxBucket = 50)).count()
      println(f"$dir%-10s capped_cluster rows=$n%8d " +
        f"t=${(System.nanoTime() - t0) / 1e9}%6.1fs")
    }
    spark.stop()
  }
}
