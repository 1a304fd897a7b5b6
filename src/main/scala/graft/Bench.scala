package graft
import org.apache.spark.sql.SparkSession
/** Per-round benchmark main: runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
  * Each query is fully executed via count() (all are ordered/aggregated,
  * so count forces the complete plan).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup on the smallest sf so per-query numbers measure
    // the plan, not first-use compilation.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // optional comma-separated subset for local perf iteration (the
    // driver never sets this, so round benches always cover everything)
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1)))
      .map { case (name, fn) =>
      def once(): Double = {
        // isolate queries: drop caches left by prior ops, settle the heap
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 } catch {
          case t: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${t.getClass.getName}: ${t.getMessage}")
            -1.0
        }
      }
      // best of 2 runs measures the plan's steady-state cost; when the two
      // disagree by >30% a transient (host contention, GC) polluted one of
      // them, so a third run breaks the tie — the round-4 bench recorded
      // 1.5-2.7x phantom regressions from exactly such a window (same code
      // re-measured at round-3 times on an idle host). Sub-second queries
      // also get a third run: scheduling noise is additive and ±0.15 s
      // reads as a 1.5x swing on them, while the rerun costs almost
      // nothing — min-of-N converges to the true cost.
      var times = Seq(once(), once()).filter(_ >= 0)
      if (times.size == 2 && (times.max > times.min * 1.3 || times.min < 0.7))
        times = (times :+ once()).filter(_ >= 0)
      // a failed query reports -1, never a plausible-looking duration
      (name, if (times.nonEmpty) times.min else -1.0, times.nonEmpty)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
