package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** RocksDB state store backend (Streams.withRocksDbState) — the scale
  * path for streaming state: the default heap provider holds every live
  * key in executor memory, so a 100 TB ingest's digest/session state is
  * an OOM by construction; RocksDB keeps it on executor-local disk
  * behind a bounded block cache. Result parity with the default backend
  * is oracle-pinned by stream_dedup_rocksdb; this spec pins what the
  * oracle can't see:
  *
  *  1. the provider is actually ENGAGED — rocksdb custom metrics appear
  *     in the query progress, and the state checkpoint carries
  *     `.changelog` delta files (changelog checkpointing). A silently
  *     ignored conf would pass result parity without ever exercising
  *     the backend;
  *  2. a checkpoint written by the RocksDB backend RESTARTS: stop after
  *     the first drain, land a replayed copy plus a fresh batch, start a
  *     fresh query from the same checkpoint — the recovered digest state
  *     must drop the replay, and the file sink holds each digest exactly
  *     once;
  *  3. the helper restores prior session confs (set, and unset-before)
  *     so batch work on the shared session is unaffected.
  */
class RocksDbStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag)
    java.nio.file.Files.delete(d)
    d.toString
  }

  /** ids [lo, hi) as the stream_dedup-shaped document frame: ts spans
    * ≤30 min (half the 1 h horizon) from one day past the epoch clamp.
    */
  private def docs(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(
      col("id").as("doc_id"),
      concat(lit("doc text "), col("id") % 60).as("text"),
      timestamp_micros((lit(86400L) + col("id") % 1800L) * 1000000L).as("ts"))

  private def startDedup(landing: String, out: String, ckpt: String) = {
    val schema = docs(0, 1).drop("ts").schema
    val src = spark.readStream.schema(schema).parquet(landing)
      .withColumn("ts",
        timestamp_micros((lit(86400L) + col("doc_id") % 1800L) * 1000000L))
    graft.streaming.Streams.dedupStream(src, "text", "ts")
      .select(md5(col("text")).as("digest"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
  }

  test("rocksdb backend engages, writes changelogs, and restarts from its checkpoint") {
    val landing = freshDir("graft_rocksdb_landing")
    val out = freshDir("graft_rocksdb_out")
    val ckpt = freshDir("graft_rocksdb_ckpt")
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try graft.streaming.Streams.withRocksDbState(spark) {
      docs(0, 50).drop("ts").write.mode("append").parquet(landing)
      val q1 = startDedup(landing, out, ckpt)
      try {
        q1.processAllAvailable()
        // 1a. engaged: the stateful operator reports rocksdb metrics
        val metricKeys = q1.lastProgress.stateOperators
          .flatMap(_.customMetrics.keySet.asScala)
        assert(metricKeys.exists(_.startsWith("rocksdb")),
          s"no rocksdb custom metrics in ${metricKeys.mkString(",")}")
      } finally q1.stop()
      // 1b. changelog checkpointing: delta files, not just SST snapshots.
      // Files.walk holds a directory handle until closed (ADVICE r14).
      val walk = java.nio.file.Files
        .walk(java.nio.file.Paths.get(ckpt, "state"))
      val changelogs =
        try walk.iterator().asScala.count(_.toString.endsWith(".changelog"))
        finally walk.close()
      assert(changelogs > 0, "no .changelog files under the state checkpoint")

      // 2. restart: replay batch 1 plus a fresh batch; recovered digest
      // state must drop the replay, the sink must stay exactly-once
      docs(0, 50).drop("ts").write.mode("append").parquet(landing)
      docs(50, 80).drop("ts").write.mode("append").parquet(landing)
      val q2 = startDedup(landing, out, ckpt)
      try q2.processAllAvailable() finally q2.stop()
      val perDigest = spark.read.parquet(out)
        .groupBy("digest").count().collect()
      assert(perDigest.length == 60, s"expected 60 digests (text is id%60), got ${perDigest.length}")
      assert(perDigest.forall(_.getLong(1) == 1L),
        "a digest was emitted more than once across restart/replay")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }

  test("withRocksDbState restores prior session confs") {
    val memKey = "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(memKey, "123")         // set-before: restored to value
    spark.conf.unset(provKey)             // unset-before: back to default
    // providerClass carries a session DEFAULT (the heap provider), so
    // getOption never reads None for it — restoration is value-level
    val priorProv = spark.conf.get(provKey)
    graft.streaming.Streams.withRocksDbState(spark, maxMemoryMB = 512) {
      assert(spark.conf.get(memKey) == "512")
      assert(spark.conf.get(provKey).contains("RocksDBStateStoreProvider"))
    }
    assert(spark.conf.get(memKey) == "123")
    assert(spark.conf.get(provKey) == priorProv)
    spark.conf.unset(memKey)
  }
}
