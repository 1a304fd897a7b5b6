package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession

/** DEFAULT-ARG dedup end-to-end at scale: what a user gets when they
  * point `dedupByMinhash`/`minhashLsh` at a corpus with no tuning —
  * since r11 that is the size-aware dispatcher. Prints the regime the
  * probe chose, its work estimates, and the wall time of the full
  * pipeline (banding + probe + verification + clustering), one scale
  * per JVM invocation (sequential heavy passes in one JVM pollute each
  * other's GC — see PLANS.md r10 soak notes).
  *
  *   sbt "Test/runMain graft.ProbeAutoCluster /tmp/sf10"
  */
object ProbeAutoCluster {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val d = Dedup.minhashLshAuto(docs, "text", "doc_id")
      val n = Dedup.clusterPairs(d.pairs).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"$dir%-10s auto_cluster regime=${d.regime}%-6s docs=${d.nDocs}%8d " +
        f"est_cand=${d.estCandidates}%10d retention=${d.candidateRetention}%.4f " +
        f"max_bucket=${d.maxBucketObserved}%7d rows=$n%8d t=$t%6.1fs")
    }
    spark.stop()
  }
}
