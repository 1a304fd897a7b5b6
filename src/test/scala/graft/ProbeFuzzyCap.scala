package graft

import graft.ops.FuzzyJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fuzzy-join cap recall measurement (test scope, run by hand): one
  * variant per JVM invocation (same-JVM sequencing pollutes GC — see
  * PLANS.md r10 soak notes). Modes:
  *
  *   sbt "Test/runMain graft.ProbeFuzzyCap /tmp/sf10 buckets"  — variant-hash bucket histogram
  *   sbt "Test/runMain graft.ProbeFuzzyCap /tmp/sf10 exact"    — exact pass (count + wall)
  *   sbt "Test/runMain graft.ProbeFuzzyCap /tmp/sf10 cap=64"   — capped pass (count + wall)
  *
  * Capped output is a SUBSET of exact (gating only removes candidates),
  * so recall = capped count / exact count — no pair-set diff needed.
  */
object ProbeFuzzyCap {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = if (args.length > 1) args(1) else "exact"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        element_at(split(trim(col("p_name")), "\\s+"), -1).as("blk"))
    mode match {
      case "buckets" =>
        // the folded-key bucket distribution the cap acts on: decade
        // histogram + C(m,2) candidate mass per decade
        val vh = p.select(col("p_partkey"),
            explode(graft.functions.HashColumns
              .deletionVariantHashes(col("p_name"), 2)).as("vh"),
            col("blk"), col("p_brand"))
          .select(xxhash64(col("vh"), col("blk"), col("p_brand")).as("h"))
        val hist = vh.groupBy("h").agg(count(lit(1)).as("m"))
          .select(floor(log10(col("m"))).cast("int").as("decade"), col("m"))
          .groupBy("decade").agg(count(lit(1)).as("n_buckets"),
            max("m").as("max_m"),
            sum(expr("(m * (m - 1)) div 2")).as("cand_mass"))
          .orderBy("decade").collect()
        hist.foreach(r => println(
          f"$dir%-10s fuzzy buckets decade=${r.getInt(0)} " +
            f"n=${r.getLong(1)}%12d max_m=${r.getLong(2)}%8d mass=${r.getLong(3)}%14d"))
      case m =>
        val cap = if (m.startsWith("cap=")) m.stripPrefix("cap=").toInt
                  else Int.MaxValue
        val nbh = if (m.startsWith("nbh=")) m.stripPrefix("nbh=").toInt
                  else Int.MaxValue
        val t0 = System.nanoTime()
        val n = FuzzyJoin.editDistanceSelfJoin(p, "p_partkey", "p_name",
          Seq("blk", "p_brand"), maxEdits = 2, maxBucket = cap,
          maxNeighborhood = nbh).count()
        println(f"$dir%-10s fuzzy mode=$m pairs=$n%10d " +
          f"t=${(System.nanoTime() - t0) / 1e9}%6.1fs")
    }
    spark.stop()
  }
}
