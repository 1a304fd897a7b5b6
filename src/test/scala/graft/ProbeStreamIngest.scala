package graft

import graft.schema.{Alignment, FixedColumn, FixedSchema, FlfType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** stream_flf_ingest profiling (VERDICT r11 task 7: +13% normalized over
  * two rounds — attribute micro-batch overhead vs real work). Replays
  * the query's exact shape (flf lines landed as text files → streaming
  * FlfParse → memory sink, maxFilesPerTrigger=16) three times in one
  * JVM and prints, per run, the engine's own duration breakdown summed
  * over micro-batches: addBatch (the parse+sink work) vs latestOffset /
  * getBatch / queryPlanning / walCommit / commitOffsets (pure
  * micro-batch machinery), plus wall outside triggers.
  *
  *   sbt -batch "Test/runMain graft.ProbeStreamIngest /root/testdata/sf0.1"
  */
object ProbeStreamIngest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the query's landing fixture: flf lines of the lineitem table
    val landing = java.nio.file.Files.createTempDirectory("probe_flf").toString
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val line = concat(
      lpad(col("l_orderkey").cast("string"), 12, "0"),
      lpad(col("l_linenumber").cast("string"), 4, " "),
      rpad(col("l_returnflag"), 2, "_"), rpad(col("l_linestatus"), 2, "_"),
      lpad(col("l_quantity").cast("long").cast("string"), 6, " "),
      lpad(format_number(col("l_extendedprice"), 2), 14, " "))
    li.select(line.as("value")).write.mode("overwrite").text(landing)
    val schema = FixedSchema(name = "probe", version = 1, columns = Seq(
      FixedColumn("l_orderkey", 0, 12, FlfType.Int64T, Alignment.Right, '0',
        isNullable = true),
      FixedColumn("l_linenumber", 12, 4, FlfType.Int32T, Alignment.Right, ' ',
        isNullable = true),
      FixedColumn("l_returnflag", 16, 2, FlfType.Utf8T, Alignment.Left, '_',
        isNullable = true),
      FixedColumn("l_linestatus", 18, 2, FlfType.Utf8T, Alignment.Left, '_',
        isNullable = true),
      FixedColumn("l_quantity", 20, 6, FlfType.Int32T, Alignment.Right, ' ',
        isNullable = true),
      FixedColumn("l_extendedprice", 26, 14, FlfType.Utf8T, Alignment.Right, ' ',
        isNullable = true)))

    val sums = scala.collection.concurrent.TrieMap[String, Long]()
    var batches = 0
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        batches += 1
        e.progress.durationMs.forEach { (k, v) =>
          sums.updateWith(k) {
            case Some(x) => Some(x + v.toLong)
            case None    => Some(v.toLong)
          }
          ()
        }
      }
    }
    spark.streams.addListener(listener)

    (1 to 3).foreach { rep =>
      sums.clear(); batches = 0
      val qname = s"probe_flf_$rep"
      val t0 = System.nanoTime()
      val q = graft.streaming.Streams.flfIngest(spark, landing, schema)
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      // give the async listener a beat to drain
      Thread.sleep(500)
      val n = spark.table(qname).count()
      val parts = sums.toSeq.sortBy(-_._2)
        .map { case (k, v) => f"$k=${v / 1000.0}%.2fs" }.mkString(" ")
      val trig = sums.getOrElse("triggerExecution", 0L) / 1000.0
      println(f"rep$rep wall=$wall%6.2fs rows=$n batches=$batches " +
        f"inTrigger=$trig%.2fs outsideTrigger=${wall - trig}%.2fs :: $parts")
    }
    spark.stop()
  }
}
