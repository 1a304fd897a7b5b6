package graft

import org.apache.spark.sql.SparkSession

/** Fuzzy-join output-size probe: is the sf30 wall-time slope the WORK
  * (result pairs grow superlinearly as the bounded name space saturates
  * and duplicate names multiply) or the plan?
  *
  *   sbt "Test/runMain graft.ProbeFuzzy /tmp/sf3 /tmp/sf30"
  */
object ProbeFuzzy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val parts = spark.read.parquet(s"$dir/part.parquet")
      val nParts = parts.count()
      val nNames = parts.select("p_name").distinct().count()
      val t0 = System.nanoTime()
      val nPairs = Queries.all("q_fuzzy_join")(spark, dir).count()
      println(f"$dir%-10s parts=$nParts%9d distinct_names=$nNames%9d " +
        f"fuzzy_pairs=$nPairs%10d t=${(System.nanoTime() - t0) / 1e9}%6.1fs")
    }
    spark.stop()
  }
}
