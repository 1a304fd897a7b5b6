package graft
import graft.ops.{Linkage, Pipeline}
import org.apache.spark.sql.functions._
/** sf10 linkage soak (test scope, run by hand): measures per-pass block
  * fan-out on 1.5M customers and whether the 100k maxBlockPairs pin
  * would engage.  sbt "Test/runMain graft.SoakLinkage [dir]" */
object SoakLinkage {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val dirty = Linkage.dirtyCustomers(customer).localCheckpoint()
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
    val passA = Linkage.blockSizes(dirty, customer,
      concat_ws("|", col("d_nat"), col("d_seg"), floor(col("d_bal") / 100).cast("int")),
      concat_ws("|", col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal").cast("decimal(12,2)") / 100).cast("int")))
    val passB = Linkage.blockSizes(dirty, customer,
      substring(col("d_name"), 10, 7), substring(col("c_name"), 10, 7))
    for ((nm, bs) <- Seq("A" -> passA, "B" -> passB)) {
      val agg = t(s"pass $nm blockSizes") {
        bs.agg(count(lit(1)).as("blocks"), max("n_pairs").as("max_pairs"),
          sum("n_pairs").as("total_pairs")).collect()(0) }
      println(s"pass $nm: blocks=${agg.getLong(0)} maxPairsPerBlock=${agg.getLong(1)} " +
        s"totalCandidates=${agg.getLong(2)} capEngagedAt100k=${agg.getLong(1) > 100000L}")
    }
    val m = t("linkCustomers full (score all candidates)") {
      Linkage.linkCustomers(customer).agg(count(lit(1))).collect()(0).getLong(0) }
    println(s"scored candidate pairs (deduped): $m")
    spark.stop()
  }
}
