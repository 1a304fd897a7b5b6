package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Arrow IPC sink/source round-trip coverage beyond the convert schema:
  * every type the engine's tables use (plus nested arrays/structs), null
  * patterns, multiple batches per file, and multi-partition layouts.
  */
class IpcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("ipc round-trips all column types, nulls, and nested values") {
    val df = spark.range(0, 500, 1, 3).select(
      col("id"),
      (col("id") % 2 === 0).as("b"),
      col("id").cast("int").as("i32"),
      col("id").cast("short").as("i16"),
      (col("id") * 1.5).cast("float").as("f32"),
      (col("id") * 2.5).as("f64"),
      concat(lit("s"), col("id")).as("s"),
      when(col("id") % 7 === 0, lit(null)).otherwise(concat(lit("n"), col("id")))
        .as("nullable_s"),
      encode(concat(lit("b"), col("id")), "UTF-8").as("bin"),
      date_add(lit("2024-01-01").cast("date"), col("id").cast("int")).as("d"),
      timestamp_micros(col("id") * 1000000L).as("ts"),
      timestamp_micros(col("id") * 1000000L).cast("timestamp_ntz").as("ts_ntz"),
      array(col("id"), col("id") * 2).as("arr"),
      struct(col("id").as("x"), concat(lit("y"), col("id")).as("y")).as("st"),
      when(col("id") % 5 === 0, lit(null).cast("bigint")).otherwise(col("id"))
        .as("nullable_l"))
    val out = java.nio.file.Files.createTempDirectory("graft_ipc_types").toString + "/t"
    // small batch size forces multiple record batches per part file
    graft.sources.IpcSink.write(df, out, mode = "overwrite", maxRecordsPerBatch = 64)
    val back = graft.sources.IpcSource.read(spark, out)
    assert(back.schema == df.schema)
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    val a = df.collect().sortBy(key)
    val b = back.collect().sortBy(key)
    assert(b.length == 500)
    assert(a.zip(b).forall { case (x, y) => x == y },
      a.zip(b).find { case (x, y) => x != y }.toString)
  }

  test("ipc sink honors save modes") {
    val df = spark.range(3).toDF("id")
    val out = java.nio.file.Files.createTempDirectory("graft_ipc_mode").toString + "/m"
    graft.sources.IpcSink.write(df, out)
    intercept[IllegalStateException] { graft.sources.IpcSink.write(df, out) }
    graft.sources.IpcSink.write(df, out, mode = "ignore") // no-op, no error
    graft.sources.IpcSink.write(spark.range(5).toDF("id"), out, mode = "overwrite")
    assert(graft.sources.IpcSource.read(spark, out).count() == 5)
  }

  test("ipc source reads an empty frame (schema-only part file)") {
    val df = spark.range(10).toDF("id").filter(col("id") < 0)
    val out = java.nio.file.Files.createTempDirectory("graft_ipc_empty").toString + "/e"
    graft.sources.IpcSink.write(df, out, mode = "overwrite")
    val back = graft.sources.IpcSource.read(spark, out)
    assert(back.schema.fieldNames.toSeq == Seq("id") && back.count() == 0)
  }

  test("ipc source ignores uncommitted temp files from failed attempts") {
    val out = java.nio.file.Files.createTempDirectory("graft_ipc_tmpf").toString + "/t"
    graft.sources.IpcSink.write(spark.range(9).toDF("id"), out)
    // a crashed attempt's leftover: garbage bytes under the temp naming
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, ".part-00099-42.arrow.tmp"),
      Array[Byte](1, 2, 3))
    assert(graft.sources.IpcSource.read(spark, out).count() == 9)
  }

  test("ipc sink writes a schema-only part for a zero-partition plan") {
    // an empty LocalRelation optimizes to an RDD with ZERO partitions:
    // no task runs, so the partition-0 guard can't write the schema file
    val df = Seq.empty[(Long, String)].toDF("id", "s")
    val out = java.nio.file.Files.createTempDirectory("graft_ipc_zero").toString + "/z"
    graft.sources.IpcSink.write(df, out, mode = "overwrite")
    val back = graft.sources.IpcSource.read(spark, out)
    assert(back.schema.fieldNames.toSeq == Seq("id", "s") && back.count() == 0)
  }

  test("ipc source refuses a partially committed sink directory") {
    val out = java.nio.file.Files.createTempDirectory("graft_ipc_nosucc").toString + "/p"
    graft.sources.IpcSink.write(spark.range(5).toDF("id").coalesce(1), out)
    java.nio.file.Files.delete(java.nio.file.Paths.get(out, "_SUCCESS"))
    val e = intercept[IllegalArgumentException] {
      graft.sources.IpcSource.read(spark, out)
    }
    assert(e.getMessage.contains("_SUCCESS"))
    // an individual part file still opens directly (the escape hatch)
    val part = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".arrow")).head
    assert(graft.sources.IpcSource.read(spark, part.getAbsolutePath).count() == 5)
  }

  test("ipc source reads several paths as one frame (the real escape hatch)") {
    val out = java.nio.file.Files.createTempDirectory("graft_ipc_multi").toString + "/m"
    graft.sources.IpcSink.write(spark.range(10).toDF("id").repartition(3), out)
    java.nio.file.Files.delete(java.nio.file.Paths.get(out, "_SUCCESS"))
    // after inspecting a partially committed dir, the intact parts can be
    // passed individually — one read call, one DataFrame, no union needed
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".arrow")).map(_.getAbsolutePath).toSeq
    assert(parts.size == 3)
    val back = graft.sources.IpcSource.read(spark, parts)
    assert(back.count() == 10)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) == 45L)
  }

  test("ipc source packs skewed file sizes into byte-balanced tasks") {
    // pure planning check: 1 big + 7 small files into 4 bins must put the
    // big file alone and spread the small ones, not leave one task with
    // all the bytes (the straggler an externally produced mix causes)
    val files = Seq(("big", 1000L), ("s1", 10L), ("s2", 10L), ("s3", 10L),
      ("s4", 10L), ("s5", 10L), ("s6", 10L), ("s7", 10L))
    val groups = graft.sources.IpcSource.packBySize(files, 4)
    assert(groups.flatten.sorted == files.map(_._1).sorted)
    assert(groups.exists(_ == Seq("big")))
    val loads = groups.map(_.map(f => files.toMap.apply(f)).sum)
    assert(loads.filterNot(_ == 1000L).forall(_ <= 30L), loads.toString)

    // end-to-end: mixed-size parts read back balanced across tasks
    val out = java.nio.file.Files.createTempDirectory("graft_ipc_skew").toString + "/s"
    val skewed = spark.range(0, 10000, 1, 1).toDF("id")
      .union(spark.range(10000, 10040, 1, 4).toDF("id"))
    graft.sources.IpcSink.write(skewed, out, mode = "overwrite")
    val back = graft.sources.IpcSource.read(spark, out)
    assert(back.count() == 10040)
    val perTask = back.rdd.mapPartitions(it => Iterator(it.size)).collect()
    // the 10k-row file dominates; no other task may also carry thousands
    assert(perTask.max >= 10000)
    assert(perTask.filter(_ < 10000).forall(_ <= 40), perTask.mkString(","))
  }

  test("packBySize holds the LPT balance bound on random size mixes") {
    // greedy LPT guarantee: max bin load <= total/bins + largest file —
    // checked over random mixes so externally produced layouts (many
    // tiny files, one giant, power-law) can't regress the planner
    val gen = new scala.util.Random(20260813)
    for (_ <- 1 to 200) {
      val n = 1 + gen.nextInt(40)
      val bins = 1 + gen.nextInt(8)
      val files = (0 until n).map(i => (s"f$i", 1L + gen.nextInt(1 << 20).toLong))
      val groups = graft.sources.IpcSource.packBySize(files, bins)
      assert(groups.flatten.sorted == files.map(_._1).sorted) // partition, no loss
      assert(groups.size <= bins)
      val sizes = files.toMap
      val loads = groups.map(_.map(sizes).sum)
      val bound = files.map(_._2).sum / bins + files.map(_._2).max
      assert(loads.max <= bound, s"max=${loads.max} bound=$bound n=$n bins=$bins")
    }
  }

  test("ipc source reads a single .arrow file path directly") {
    val out = java.nio.file.Files.createTempDirectory("graft_ipc_one").toString + "/d"
    graft.sources.IpcSink.write(spark.range(7).toDF("id").coalesce(1), out)
    val part = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".arrow")).head
    val back = graft.sources.IpcSource.read(spark, part.getAbsolutePath)
    assert(back.collect().map(_.getLong(0)).sorted.toSeq == (0L until 7L))
  }
}
