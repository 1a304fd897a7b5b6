package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileRanks {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"STAGE $name: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    spark.read.parquet(s"$dir/orders.parquet").count()
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    t("mannWhitneyU warm1") {
      graft.ops.Stats.mannWhitneyU(o, col("o_orderpriority") === "1-URGENT",
        col("o_totalprice").cast("decimal(12,2)")).count()
    }
    t("mannWhitneyU warm2") {
      graft.ops.Stats.mannWhitneyU(o, col("o_orderpriority") === "1-URGENT",
        col("o_totalprice").cast("decimal(12,2)")).count()
    }
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    t("rfm-style triple rank") {
      val c = orders.groupBy("o_custkey")
        .agg(max("o_orderdate").as("rd"), count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("monetary"))
        .localCheckpoint()
      val n = c.count()
      def rankOf(sc: org.apache.spark.sql.Column, name: String) =
        graft.ops.Ranks.globalRank(c.select(col("o_custkey"), sc.as("__s")),
            col("__s"), col("o_custkey"), name)
          .select(col("o_custkey"), graft.ops.Ranks.ntileOfRank(col(name), lit(n), 5).as(name))
      c.join(rankOf(col("frequency"), "f"), "o_custkey")
        .join(rankOf(-col("frequency"), "f2"), "o_custkey")
        .join(rankOf(-col("monetary"), "m"), "o_custkey").count()
    }
    spark.stop()
  }
}
