package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-minhash dispatcher probe (test scope, run by hand):
  * base = doc_id%10 < 8, incoming = rest; exact vs dispatched-default
  * wall + surviving-count at a given scale, one mode per flag so heavy
  * passes can run in separate JVMs.
  *
  *   sbt "Test/runMain graft.ProbeIncremental /tmp/sf10 auto"
  *   sbt "Test/runMain graft.ProbeIncremental /tmp/sf10 exact"
  */
object ProbeIncremental {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = if (args.length > 1) args(1) else "auto"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.filter(pmod(col("doc_id"), lit(10)) < 8)
    val incoming = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    val cap = mode match {
      case "exact" => Int.MaxValue
      case "auto"  => Dedup.AutoBucket
      case m       => m.stripPrefix("cap=").toInt
    }
    val t0 = System.nanoTime()
    val n = Dedup.incrementalMinhash(base, incoming, "text", "doc_id",
      maxBucket = cap).count()
    println(f"$dir%-10s incr mode=$mode survivors=$n%9d " +
      f"t=${(System.nanoTime() - t0) / 1e9}%6.1fs")
    spark.stop()
  }
}
