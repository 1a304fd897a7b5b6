package graft

import org.apache.spark.sql.SparkSession

/** TPC-H analog scale probe (test scope, run by hand): times the four
  * round-14 shape analogs (q2/q11/q16/q21) at scale factors 10x and
  * 100x past the bench fixture and prints each executed plan's exchange
  * count plus the join strategies AQE settled on — the record that the
  * shapes keep their intended plan (broadcast dims, semi/anti shuffled
  * on the order key, no cartesian) as the fact tables grow.
  *
  *   python3 tools/gen_sf.py 1 /tmp/sf1 && python3 tools/gen_sf.py 10 /tmp/sf10
  *   SPARK_DRIVER_MEM=32g sbt "Test/runMain graft.ProbeTpch /tmp/sf1 /tmp/sf10"
  */
object ProbeTpch {
  private val names = Seq("q2_min_cost_supplier", "q11_important_stock",
    "q11_important_stock_scaled", "q16_supplier_cnt", "q21_waiting_supplier")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args; name <- names) {
      var rows = -1L
      // keep the rep-2 DataFrame: after its count() the AdaptiveSparkPlan
      // already reports its final form, so no extra execution is needed
      var last: org.apache.spark.sql.DataFrame = null
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        last = Queries.all(name)(spark, dir)
        rows = last.count()
        (System.nanoTime() - t0) / 1e9
      }
      val plan = last.queryExecution.executedPlan.toString
      def n(sub: String) = plan.linesIterator.count(_.contains(sub))
      println(f"TPCH $dir $name rows=$rows%6d " +
        f"rep1=${times(0)}%7.2fs rep2=${times(1)}%7.2fs " +
        s"exchanges=${n("Exchange")} bhj=${n("BroadcastHashJoin")} " +
        s"smj=${n("SortMergeJoin")} shj=${n("ShuffledHashJoin")} " +
        s"cartesian=${n("Cartesian")}")
    }
    spark.stop()
  }
}
