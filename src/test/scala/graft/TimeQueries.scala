package graft
/** Quick per-query timing harness (test scope, run by hand):
  *   sbt "Test/runMain graft.TimeQueries <sfDir> <name> [name...]" */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = args.head
    spark.read.parquet(s"$dir/lineitem.parquet").count() // warm FS
    for (name <- args.tail; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = Queries.all(name)(spark, dir).count()
      println(f"TIME $name rep=$rep rows=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
