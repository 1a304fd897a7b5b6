package graft

import graft.ops.Linkage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Linkage-dispatcher routing check on the REAL customer fixture at
  * scale (r12): prints each pass's probe decision (regime, estPairs,
  * pairs/row, skipped blocks) WITHOUT running the candidate join — the
  * probe is the only job, so sf30 costs seconds, not the 45-minute
  * full-linkage soak. Pins the PLANS.md claim that the designed keys'
  * fan-out stays ~85-90 pairs/row (exact regime) at every measured sf.
  *
  *   sbt -batch "Test/runMain graft.ProbeLinkRouting /tmp/sf1 /tmp/sf10 /tmp/sf30"
  */
object ProbeLinkRouting {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val cust = spark.read.parquet(s"$dir/customer.parquet")
      val dirty = Linkage.dirtyCustomers(cust)
      val t0 = System.nanoTime()
      val d = Linkage.candidatesAuto(dirty, cust, "d_id", "c_custkey", Seq(
        (concat_ws("|", col("d_nat"), col("d_seg"),
          floor(col("d_bal") / 100).cast("int")),
          concat_ws("|", col("c_nationkey"), col("c_mktsegment"),
            floor(col("c_acctbal").cast("decimal(12,2)") / 100).cast("int"))),
        (substring(col("d_name"), 10, 7),
          substring(col("c_name"), 10, 7))))
      val probeSec = (System.nanoTime() - t0) / 1e9
      val nRows = d.nLeft + d.nRight
      println(f"$dir%-12s regime=${d.regime}%-6s rows=$nRows%9d probe=$probeSec%5.1f s")
      d.passes.foreach { p =>
        println(f"  pass ${p.pass}: ${p.regime}%-6s estPairs=${p.estPairs}%12d " +
          f"(${p.estPairs.toDouble / math.max(nRows, 1L)}%7.1f/row) " +
          f"overCapBlocks=${p.overCapBlocks}")
      }
    }
    spark.stop()
  }
}
