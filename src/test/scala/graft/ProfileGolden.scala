package graft

import graft.ops.Linkage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main (test scope, never ships): decompose
  * q_golden_record's cost into linkage / checkpoint / consumers.
  * Run: sbt "Test/runMain graft.ProfileGolden /root/testdata/sf0.1"
  */
object ProfileGolden {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    t("warmup count")(customer.count())
    val scored = Linkage.linkCustomers(customer)
    t("scored.count")(scored.count())
    val dec = Linkage.decide(Linkage.linkCustomers(customer), 18, 5)
      .filter(col("zone") === "match")
    t("decide.count")(dec.count())
    val m = t("localCheckpoint") {
      Linkage.decide(Linkage.linkCustomers(customer), 18, 5)
        .filter(col("zone") === "match").localCheckpoint()
    }
    t("consumers") {
      val names = m.select(col("c_custkey"), col("d_name").as("nm"),
          col("d_bal").as("bal"))
        .unionByName(m.select(col("c_custkey"), col("c_name").as("nm"),
          col("c_acctbal").cast("decimal(12,2)").as("bal")).distinct())
      val w = org.apache.spark.sql.expressions.Window.partitionBy("c_custkey")
        .orderBy(length(col("nm")).desc, col("nm").desc)
      val best = names.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("c_custkey"), col("nm").as("best_name"))
      val agg = m.groupBy("c_custkey")
        .agg(countDistinct("d_id").cast("int").as("n_matched"))
      val mb = names.groupBy("c_custkey")
        .agg(max("bal").cast("double").as("max_bal"))
      agg.join(best, "c_custkey").join(mb, "c_custkey").count()
    }
    spark.stop()
  }
}
