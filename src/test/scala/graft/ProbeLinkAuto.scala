package graft

import graft.ops.Linkage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement main for the r12 linkage dispatcher (VERDICT r11 task 1):
  * on a CONSTRUCTED degenerate-key corpus — one constant blocking key
  * over n rows per side, a unique-name backstop pass — forced-exact is
  * n² by design while the dispatcher must gate the degenerate pass and
  * finish in backstop time. Also times the customer fixture (designed
  * keys, routes exact) to price the probe tax on the honest path.
  *
  *   sbt -batch "runMain graft.ProbeLinkAuto <n> [sfDir...]"
  */
object ProbeLinkAuto {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    // degenerate corpus: every row in ONE block on pass A
    val l = spark.range(n).select(col("id").as("l_id"),
      concat(lit("name"), col("id")).as("l_name")).localCheckpoint()
    val r = spark.range(n).select((col("id") + 10000000L).as("r_id"),
      concat(lit("name"), col("id")).as("r_name")).localCheckpoint()
    val passes = Seq(
      (lit("K"), lit("K")),
      (col("l_name"), col("r_name")))

    val d = Linkage.candidatesAuto(l, r, "l_id", "r_id", passes)
    d.passes.foreach(p => println(
      s"pass ${p.pass}: regime=${p.regime} estPairs=${p.estPairs} " +
        s"gated=${p.estPairsGated} overCapBlocks=${p.overCapBlocks}"))
    val nDispatched = t(s"dispatched (n=$n)") { d.pairs.count() }
    val nExact = t(s"forced exact (n=$n)") {
      Linkage.candidates(l, r, "l_id", "r_id", passes,
        maxBlockPairs = Long.MaxValue).count()
    }
    println(s"pairs: dispatched=$nDispatched exact=$nExact " +
      s"(exact includes the ${n}x$n degenerate block)")

    // probe tax on designed keys: the customer fixture routes exact
    args.drop(1).foreach { dir =>
      val cust = spark.read.parquet(s"$dir/customer.parquet").localCheckpoint()
      // 3 alternating reps: rep 1 pays codegen/JIT for both paths
      (1 to 3).foreach { i =>
        val nForced = t(s"$dir forced exact rep$i") {
          Linkage.linkCustomers(cust, maxBlockPairs = Long.MaxValue).count()
        }
        val nAuto = t(s"$dir auto rep$i") {
          Linkage.linkCustomers(cust).count()
        }
        println(s"$dir rep$i pairs: auto=$nAuto forced=$nForced " +
          (if (nAuto == nForced) "IDENTICAL" else "DIFFER"))
      }
    }
    spark.stop()
  }
}
