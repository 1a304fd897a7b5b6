package graft

import graft.flf.FlfParse
import graft.schema.{Alignment, FixedColumn, FixedSchema, FlfType}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Try

/** Streaming crash-recovery — IvfCrashSpec's CrashFs pattern applied to
  * the two stateful streaming commit protocols (VERDICT r11 task 3):
  * kill the writer at sampled filesystem-mutation points (inside AND
  * between micro-batch commits; CrashFs keeps failing after the first
  * injected crash, modeling a hard process kill), restart a FRESH query
  * from the same checkpoint, drain, and assert the result is the batch
  * oracle EXACTLY — at-least-once replay must dedup to exactly-once.
  *
  *  - flf ingest → parquet file sink: exactly-once comes from the sink's
  *    _spark_metadata log (a replayed batch's orphan files are invisible
  *    to readers; a committed batchId is skipped on replay).
  *  - CDC MERGE loop (Streams.cdcApply): exactly-once comes from the
  *    .prev/.next snapshot-swap protocol plus the merge itself being
  *    idempotent per batch (last-writer-wins on (key, seq) — re-merging
  *    a batch onto its own result is a fixed point).
  *
  * Unlike IvfCrashSpec the full enumeration is not affordable here (one
  * streamed run makes hundreds of mutations), so the spec samples ~8
  * points spread uniformly across the measured mutation count of an
  * uncrashed run, plus the first and last — every sampled point still
  * exercises an arbitrary torn state because the kill leaves ALL later
  * writes of that run failing.
  */
class StreamCrashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ensureScheme(): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.crash.impl", classOf[CrashFs].getName)

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag)
    java.nio.file.Files.delete(d)
    d.toString
  }

  /** Sampled crash points over `nMutations` of the uncrashed run. */
  private def samplePoints(nMutations: Int, n: Int = 8): Seq[Int] =
    ((1 to n).map(i => math.max(1, i * nMutations / (n + 1))) ++
      Seq(1, math.max(1, nMutations - 1))).distinct.sorted

  // --- 1. flf ingest → parquet sink --------------------------------------

  private val flfSchema = FixedSchema(name = "crash_flf", version = 1,
    columns = Seq(
      FixedColumn("id", 0, 8, FlfType.Int64T, Alignment.Right, '0',
        isNullable = false),
      FixedColumn("tag", 8, 6, FlfType.Utf8T, Alignment.Left, '_',
        isNullable = true)))

  private def flfLine(i: Long): String = {
    val id = i.toString
    ("0" * (8 - id.length)) + id + s"t${i % 7}".padTo(6, '_')
  }

  /** 6 landing files → 6 micro-batches at maxFilesPerTrigger=1, so the
    * kill windows include several BETWEEN-commit points.
    */
  private lazy val flfLanding: String = {
    val d = java.nio.file.Files.createTempDirectory("crash_landing").toString
    // ids start at 1: an all-zero id field trims to '' -> NULL -> the
    // strict-mode abort (the documented non-nullable parse contract)
    (0 until 6).foreach { f =>
      val rows = (f * 20 + 1 to (f + 1) * 20).map(i => flfLine(i.toLong))
      java.nio.file.Files.write(java.nio.file.Paths.get(d, s"f$f.txt"),
        (rows.mkString("\n") + "\n").getBytes("UTF-8"))
    }
    d
  }

  private lazy val flfExpected: Set[(Long, String)] =
    (1L to 120L).map(i => (i, s"t${i % 7}")).toSet

  private def runFlf(out: String, ckpt: String): Unit = {
    val parsed = graft.streaming.Streams.flfIngest(spark,
      s"file:$flfLanding", flfSchema, filesPerTrigger = 1)
    val q = graft.streaming.Streams.flfIngestToParquet(parsed, out, ckpt)
      .start()
    try q.processAllAvailable() finally Try(q.stop())
  }

  private def readFlfOut(out: String): Set[(Long, String)] =
    spark.read.parquet(out).select("id", "tag")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("flf ingest: crash at sampled mutation points, restart from " +
    "checkpoint, drained sink == batch parse exactly (no dup, no loss)") {
    ensureScheme()
    // measure the uncrashed run's mutation count (and its answer)
    CrashFs.disarm()
    val refRoot = freshDir("crash_flf_ref")
    val before = CrashFs.mutations.get()
    runFlf(s"crash://$refRoot/out", s"crash://$refRoot/ckpt")
    val nMut = CrashFs.mutations.get() - before
    assert(readFlfOut(s"crash://$refRoot/out") == flfExpected)
    info(s"flf ingest: $nMut mutations in the uncrashed run; sampling " +
      s"${samplePoints(nMut).size} crash points")
    for (k <- samplePoints(nMut)) {
      val root = freshDir(s"crash_flf_$k")
      val (out, ckpt) = (s"crash://$root/out", s"crash://$root/ckpt")
      CrashFs.arm(k)
      val crashed = Try(runFlf(out, ckpt)).isFailure
      CrashFs.disarm()
      withClue(s"flf crash point $k (crashed=$crashed): ") {
        // restart from the same checkpoint and drain
        runFlf(out, ckpt)
        assert(readFlfOut(out) == flfExpected,
          "restarted sink diverged from the batch parse")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(refRoot))
  }

  // --- 2. CDC MERGE loop --------------------------------------------------

  // keys 0..59: seed = k % 3 == 0 (price k+0.5); change feed in 4 files
  // (one per micro-batch at maxFilesPerTrigger=1):
  //   seq 0: INSERT k % 3 != 0      (price k)
  //   seq 1: UPDATE k % 4 == 1      (price 2k)
  //   seq 2: DELETE k % 4 == 2
  //   seq 3: UPDATE k % 5 == 3      (price k+10)
  private lazy val cdcExpected: Set[(Long, Double)] = {
    val state = scala.collection.mutable.Map[Long, Double]()
    (0L until 60L).foreach(k => if (k % 3 == 0) state(k) = k + 0.5)
    (0L until 60L).foreach(k => if (k % 3 != 0) state(k) = k.toDouble)
    (0L until 60L).foreach(k => if (k % 4 == 1) state(k) = 2.0 * k)
    (0L until 60L).foreach(k => if (k % 4 == 2) state.remove(k))
    (0L until 60L).foreach(k => if (k % 5 == 3) state(k) = k + 10.0)
    state.toSet
  }

  private lazy val cdcChanges: String = {
    val d = java.nio.file.Files.createTempDirectory("crash_cdc_feed").toString
    def w(step: Int, df: DataFrame): Unit =
      df.write.parquet(s"$d/step$step") // one dir per file-batch
    val ks = spark.range(60).select(col("id").as("k"))
    w(0, ks.filter(col("k") % 3 =!= 0).select(col("k"), lit("I").as("op"),
      lit(0L).as("seq"), col("k").cast("double").as("price")))
    w(1, ks.filter(col("k") % 4 === 1).select(col("k"), lit("U").as("op"),
      lit(1L).as("seq"), (col("k") * 2).cast("double").as("price")))
    w(2, ks.filter(col("k") % 4 === 2).select(col("k"), lit("D").as("op"),
      lit(2L).as("seq"), col("k").cast("double").as("price")))
    w(3, ks.filter(col("k") % 5 === 3).select(col("k"), lit("U").as("op"),
      lit(3L).as("seq"), (col("k") + 10).cast("double").as("price")))
    d
  }

  private def runCdc(snap: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(s"$cdcChanges/step0").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$cdcChanges/step*")
    val q = graft.streaming.Streams
      .cdcApply(src, snap, "k", "op", "seq", ckpt).start()
    try q.processAllAvailable() finally Try(q.stop())
  }

  private def readSnap(snap: String): Set[(Long, Double)] =
    spark.read.parquet(snap).select("k", "price")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

  private def seedSnap(snap: String): Unit =
    spark.range(60).select(col("id").as("k"))
      .filter(col("k") % 3 === 0)
      .select(col("k"), (col("k") + 0.5).cast("double").as("price"))
      .write.parquet(snap)

  test("CDC MERGE: crash at sampled mutation points, restart from " +
    "checkpoint, final snapshot == last-writer-wins batch oracle") {
    ensureScheme()
    CrashFs.disarm()
    val refRoot = freshDir("crash_cdc_ref")
    seedSnap(s"crash://$refRoot/snap")
    val before = CrashFs.mutations.get()
    runCdc(s"crash://$refRoot/snap", s"crash://$refRoot/ckpt")
    val nMut = CrashFs.mutations.get() - before
    assert(readSnap(s"crash://$refRoot/snap") == cdcExpected)
    info(s"cdc merge: $nMut mutations in the uncrashed run; sampling " +
      s"${samplePoints(nMut).size} crash points")
    for (k <- samplePoints(nMut)) {
      val root = freshDir(s"crash_cdc_$k")
      val (snap, ckpt) = (s"crash://$root/snap", s"crash://$root/ckpt")
      seedSnap(snap)
      CrashFs.arm(k)
      val crashed = Try(runCdc(snap, ckpt)).isFailure
      CrashFs.disarm()
      withClue(s"cdc crash point $k (crashed=$crashed): ") {
        runCdc(snap, ckpt)
        assert(readSnap(snap) == cdcExpected,
          "restarted CDC snapshot diverged from the batch oracle")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(refRoot))
  }
}
