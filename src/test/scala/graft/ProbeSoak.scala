package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Soak diagnostics (test scope, run by hand): candidate-pair counts of
  * the superlinear-sloped soak queries at several scale factors — the
  * question "is the TIME superlinear, or the WORK?" answered with the
  * exact work measure each operator's complexity statement is in terms
  * of (LSH candidate pairs; linkage block pairs).
  *
  *   sbt "Test/runMain graft.ProbeSoak /tmp/sf1 /tmp/sf3 ..."
  */
object ProbeSoak {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()
      // exact legs stay explicitly exact: the default is now the
      // dispatcher, and this probe's whole point is the exact work curve
      val nCand = Dedup.lshCandidatePairs(docs, "text", "doc_id",
        maxBucket = Int.MaxValue).count()
      val nPairs = Dedup.minhashLsh(docs, "text", "doc_id",
        maxBucket = Int.MaxValue).count()
      var t0 = System.nanoTime()
      val exactN = Dedup.clusterPairs(
        Dedup.minhashLsh(docs, "text", "doc_id", maxBucket = Int.MaxValue)).count()
      val tExact = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val cappedN = Dedup.clusterPairs(
        Dedup.minhashLsh(docs, "text", "doc_id", maxBucket = 50)).count()
      val tCapped = (System.nanoTime() - t0) / 1e9
      // linkage candidate pairs (the q_link_matches / q_golden_record
      // work measure): dirty mentions blocked against customers, scored
      // 1:1 — the count IS the blocked-pair count. Also time the
      // documented >=sf30 mitigation (maxBlockPairs) to prove the capped
      // slope at each scale.
      val cust = spark.read.parquet(s"$dir/customer.parquet")
      var tl = System.nanoTime()
      val nLink = graft.ops.Linkage
        .linkCustomers(cust, maxBlockPairs = Long.MaxValue).count()
      val tExactLink = (System.nanoTime() - tl) / 1e9
      tl = System.nanoTime()
      val nLinkCap = graft.ops.Linkage
        .linkCustomers(cust, maxBlockPairs = 100000L).count()
      val tCapLink = (System.nanoTime() - tl) / 1e9
      println(f"$dir%-10s docs=$nDocs%8d lsh_cand=$nCand%10d verified=$nPairs%7d " +
        f"cluster_exact=$tExact%6.1fs($exactN) cluster_cap50=$tCapped%6.1fs($cappedN) " +
        f"link_cand=$nLink%10d ${tExactLink}%.1fs link_cap=$nLinkCap%10d ${tCapLink}%.1fs")
    }
    spark.stop()
  }
}
