package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming state-scale probe (test scope, run by hand): how far does
  * each state store backend carry dropDuplicatesWithinWatermark's live
  * digest state inside a constrained heap? Every key is generated
  * distinct and every event timestamp sits inside the watermark
  * horizon, so NOTHING evicts — after the drain the state holds all
  * nKeys at once, which is exactly the regime a 100 TB ingest's dedup
  * horizon creates. The backend runs in its own JVM invocation so a
  * heap death can't pollute the other backend's measurement:
  *
  *   SPARK_DRIVER_MEM=4g sbt "Test/runMain graft.ProbeStateScale heap 2000000 8000000"
  *   SPARK_DRIVER_MEM=4g sbt "Test/runMain graft.ProbeStateScale rocksdb 2000000 8000000"
  *
  * Prints per run: drain wall, state rows, the provider's own
  * memoryUsedBytes, and JVM used-heap after a GC — the heap provider's
  * figure must grow linearly with keys while RocksDB's stays at its
  * bounded block-cache cap.
  */
object ProbeStateScale {
  def main(args: Array[String]): Unit = {
    val backend = args.head
    val sizes = args.tail.map(_.toLong)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(nKeys: Long): Unit = {
      val landing = java.nio.file.Files
        .createTempDirectory("graft_statescale").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_statescale_ckpt").toString
      // 16 files -> 4 micro-batches of 4: exercises cross-batch state
      // growth plus (rocksdb) per-batch changelog commits
      spark.range(nKeys).select(
          col("id").as("doc_id"),
          concat(lit("doc text "), col("id")).as("text"))
        .repartition(16).write.mode("overwrite").parquet(landing)
      val src = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 4).parquet(landing)
        .withColumn("ts", timestamp_micros(lit(86400000000L)))
      def drain(): Unit = {
        val q = graft.streaming.Streams.dedupStream(src, "text", "ts")
          .writeStream.format("noop")
          .option("checkpointLocation", ckpt).start()
        try {
          q.processAllAvailable()
          val so = q.lastProgress.stateOperators(0)
          System.gc(); Thread.sleep(200); System.gc()
          val heapMb = (Runtime.getRuntime.totalMemory() -
            Runtime.getRuntime.freeMemory()) / (1024 * 1024)
          println(f"STATE backend=$backend%-8s keys=$nKeys%9d " +
            f"stateRows=${so.numRowsTotal}%9d " +
            f"stateMemMB=${so.memoryUsedBytes / (1024 * 1024)}%6d " +
            f"jvmHeapMB=$heapMb%6d")
        } finally q.stop()
      }
      val t0 = System.nanoTime()
      if (backend == "rocksdb")
        graft.streaming.Streams.withRocksDbState(spark)(drain())
      else drain()
      println(f"STATE backend=$backend%-8s keys=$nKeys%9d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    sizes.foreach(run)
    spark.stop()
  }
}
