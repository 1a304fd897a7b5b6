package graft

import graft.ops.Similarity
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataOutputStream, Path => HPath, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

/** Crash-injecting local filesystem: every MUTATING call (create, append,
  * rename, delete, mkdirs) ticks a global countdown and throws once it is
  * exhausted — and keeps throwing, modeling a hard process kill where no
  * later write of the same process can succeed either. Reads and listings
  * never tick: a crashed writer cannot corrupt what a reader sees except
  * through the mutations it already made. Registered under the `crash://`
  * scheme (fs.crash.impl); paths map to the local filesystem.
  */
class CrashFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("crash:///")
  override def getScheme: String = "crash"

  override def create(f: HPath, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    CrashFs.tick(s"create $f")
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  override def append(f: HPath, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream = {
    CrashFs.tick(s"append $f")
    super.append(f, bufferSize, progress)
  }

  override def rename(src: HPath, dst: HPath): Boolean = {
    CrashFs.tick(s"rename $src -> $dst")
    super.rename(src, dst)
  }

  override def delete(p: HPath, recursive: Boolean): Boolean = {
    CrashFs.tick(s"delete $p")
    super.delete(p, recursive)
  }

  override def mkdirs(p: HPath, permission: FsPermission): Boolean = {
    CrashFs.tick(s"mkdirs $p")
    super.mkdirs(p, permission)
  }
}

object CrashFs {
  final class CrashInjected(msg: String)
    extends RuntimeException(s"injected crash at: $msg")

  private val remaining = new AtomicInteger(Int.MaxValue)
  val mutations = new AtomicInteger(0)

  def tick(what: String): Unit = {
    mutations.incrementAndGet()
    if (remaining.decrementAndGet() < 0) throw new CrashInjected(what)
  }

  /** allow exactly `n` further mutations, then fail every one after. */
  def arm(n: Int): Unit = remaining.set(n)
  def disarm(): Unit = remaining.set(Int.MaxValue)
}

/** Crash-point ENUMERATION for the persisted IVF index's maintenance
  * protocol (PLANS.md claims every crash point is repaired by the next
  * maintenance entry's marker sweep — this spec proves it by killing the
  * writer between EVERY filesystem mutation of append/compact/dropTag and
  * asserting, at each point: (a) a reader still resolves a complete,
  * search-consistent snapshot; (b) re-running the interrupted maintenance
  * op repairs the layout; (c) the post-repair search is bit-identical to
  * a never-crashed run).
  */
class IvfCrashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  import spark.implicits._

  private def ensureScheme(): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.crash.impl", classOf[CrashFs].getName)

  private def copyDir(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    }
  }

  private def vecs(n: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i => (i, Array.fill(4)(rnd.nextFloat() * 2 - 1)))
  }

  private def searchRows(path: String): Seq[(Long, Long, Double)] = {
    val queries = vecs(5, 7).toDF("vec_id", "embedding")
    Similarity.ivfKnnFromIndex(spark, path, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
  }

  private def cellIds(path: String): Set[Long] =
    spark.read.parquet(Similarity.ivfCellsPath(spark, path))
      .select("vec_id").collect().map(_.getLong(0)).toSet

  /** Build the shared healthy fixture once: a versioned index with one
    * committed batch and one compaction behind it (so a grace snapshot
    * exists and version > 0 — the layout mid-life, not freshly built).
    */
  private lazy val fixture: java.nio.file.Path = {
    ensureScheme()
    val root = java.nio.file.Files.createTempDirectory("ivfcrash_fixture")
    val path = root.toString
    val df = vecs(40, 11).toDF("vec_id", "embedding")
    Similarity.writeIvfIndex(df.filter(col("vec_id") < 24), path,
      k = 3, iters = 2, dim = 4)
    Similarity.ivfIndexAppend(spark, path,
      df.filter(col("vec_id") >= 24 && col("vec_id") < 32))
    Similarity.ivfIndexCompact(spark, path)
    root
  }

  private val batchIds = (32L until 40L).toSet
  private def batchDf = vecs(40, 11).toDF("vec_id", "embedding")
    .filter(col("vec_id") >= 32)

  /** Enumerate crash points of `op` on copies of the fixture.
    *
    * @param opName   label for failure messages
    * @param op       the maintenance operation under test (crash-armed)
    * @param repair   the documented recovery procedure (runs disarmed)
    * @param duringOk invariant that must hold on the torn layout BEFORE
    *                 repair (reader-visible consistency)
    */
  private def enumerateCrashes(opName: String)(op: String => Unit)
                              (repair: String => Unit)
                              (duringOk: String => Unit): Unit = {
    ensureScheme()
    // reference: the op completed with no crash
    val refDir = java.nio.file.Files.createTempDirectory(s"ivf_${opName}_ref")
    java.nio.file.Files.delete(refDir)
    copyDir(fixture, refDir)
    CrashFs.disarm()
    val before = CrashFs.mutations.get()
    op(s"crash://$refDir")
    val nMutations = CrashFs.mutations.get() - before
    val reference = searchRows(s"crash://$refDir")
    assert(nMutations > 0, s"$opName made no filesystem mutations?")
    info(s"$opName: $nMutations filesystem mutations to enumerate")

    for (k <- 0 until nMutations) {
      val dir = java.nio.file.Files.createTempDirectory(s"ivf_${opName}_$k")
      java.nio.file.Files.delete(dir)
      copyDir(fixture, dir)
      val p = s"crash://$dir"
      CrashFs.arm(k)
      val crashed =
        try { op(p); false }
        catch { case _: Throwable => true }
      CrashFs.disarm()
      withClue(s"$opName crash point $k (crashed=$crashed): ") {
        // (a) the torn layout is still a complete snapshot for readers
        duringOk(p)
        // (b) the documented repair completes...
        repair(p)
        // (c) ...and search is bit-identical to the never-crashed run
        assert(searchRows(p) == reference, "post-repair search diverged")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(refDir.toFile)
  }

  test("tagged append: a crash between ANY two filesystem mutations leaves " +
    "a readable snapshot; same-tag replay repairs; search bit-identical") {
    val base = cellIds(s"crash://$fixture")
    enumerateCrashes("append") { p =>
      Similarity.ivfIndexAppendWith(
        Similarity.readIvfCodebook(spark, p), p, batchDf,
        commitTag = Some("b7"))
    } { p =>
      Similarity.ivfIndexAppendWith(
        Similarity.readIvfCodebook(spark, p), p, batchDf,
        commitTag = Some("b7"))
    } { p =>
      // every pre-existing row is visible; at worst part of the
      // in-flight batch is missing (the documented torn-state contract)
      val ids = cellIds(p)
      assert((base -- ids).isEmpty, s"base rows lost: ${base -- ids}")
      assert((ids -- base -- batchIds).isEmpty, s"alien rows: ${ids -- base -- batchIds}")
    }
  }

  test("compaction: a crash between ANY two filesystem mutations leaves a " +
    "complete resolvable version; re-running compaction repairs; search " +
    "bit-identical") {
    val expectIds = cellIds(s"crash://$fixture")
    enumerateCrashes("compact") { p =>
      Similarity.ivfIndexCompact(spark, p)
    } { p =>
      Similarity.ivfIndexCompact(spark, p)
    } { p =>
      // compaction moves no rows in or out: whatever version resolves
      // must carry the full corpus
      assert(cellIds(p) == expectIds, "torn compaction lost rows")
    }
  }

  test("dropTag: a crash between ANY two filesystem mutations never " +
    "deletes a non-tag file; re-running dropTag repairs") {
    // fixture variant: one tagged batch committed on top
    val tagged = java.nio.file.Files.createTempDirectory("ivf_dropfix")
    java.nio.file.Files.delete(tagged)
    copyDir(fixture, tagged)
    CrashFs.disarm()
    Similarity.ivfIndexAppendWith(
      Similarity.readIvfCodebook(spark, s"crash://$tagged"),
      s"crash://$tagged", batchDf, commitTag = Some("b9"))
    val withBatch = cellIds(s"crash://$tagged")
    val base = withBatch -- batchIds

    val refDir = java.nio.file.Files.createTempDirectory("ivf_drop_ref")
    java.nio.file.Files.delete(refDir)
    copyDir(tagged, refDir)
    val before = CrashFs.mutations.get()
    Similarity.ivfIndexDropTag(spark, s"crash://$refDir", "b9")
    val n = CrashFs.mutations.get() - before
    val reference = searchRows(s"crash://$refDir")
    assert(cellIds(s"crash://$refDir") == base)

    for (k <- 0 until n) {
      val dir = java.nio.file.Files.createTempDirectory(s"ivf_drop_$k")
      java.nio.file.Files.delete(dir)
      copyDir(tagged, dir)
      val p = s"crash://$dir"
      CrashFs.arm(k)
      try Similarity.ivfIndexDropTag(spark, p, "b9")
      catch { case _: Throwable => () }
      CrashFs.disarm()
      withClue(s"dropTag crash point $k: ") {
        val ids = cellIds(p)
        assert((base -- ids).isEmpty, "dropTag deleted a non-tag row")
        Similarity.ivfIndexDropTag(spark, p, "b9")
        assert(cellIds(p) == base, "post-repair rows wrong")
        assert(searchRows(p) == reference, "post-repair search diverged")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(refDir.toFile)
    org.apache.commons.io.FileUtils.deleteQuietly(tagged.toFile)
  }
}
