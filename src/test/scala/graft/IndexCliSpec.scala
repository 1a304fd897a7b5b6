package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `evolution index build|knn-graph` driven through the REAL CLI entry
  * (`Evolution.main`) in a forked JVM — main() owns its session and
  * stops it in `finally`, so an in-suite call would kill the shared
  * test session. The fork also exercises the r13 session() fallback
  * path end-to-end (no spark.master configured → local mode).
  */
class IndexCliSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def runCli(cliArgs: String*): String = {
    val (rc, out) = ForkedJvm.run("graft.Evolution", args = cliArgs,
      env = Map("SPARK_GRAFT_CPUS" -> "4"), maxHeap = "4g")
    assert(rc == 0, s"evolution ${cliArgs.mkString(" ")} failed (rc=$rc):\n${out.takeRight(3000)}")
    out
  }

  test("index build + knn-graph CLI: persisted index in, symmetric edge list out") {
    val dir = java.nio.file.Files.createTempDirectory("idxcli").toString
    val rnd = new scala.util.Random(29)
    (0L until 40L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
      .write.parquet(s"$dir/emb.parquet")
    val o1 = runCli("index", "build", "-i", s"$dir/emb.parquet",
      "-o", s"$dir/idx", "-k", "4", "--iters", "2", "--dim", "8")
    assert(o1.contains("index build: wrote codebook + cells"))
    val o2 = runCli("index", "knn-graph", "-x", s"$dir/idx",
      "-o", s"$dir/edges.parquet", "-k", "3", "--n-probe", "2")
    assert(o2.contains("index knn-graph: wrote symmetrized edge list"))
    val edges = spark.read.parquet(s"$dir/edges.parquet")
      .as[(Long, Long)].collect().toSet
    assert(edges.nonEmpty)
    assert(edges.forall { case (a, b) => a != b && edges.contains((b, a)) })
    // every vector contributes: 40 vertices x >=3 picks, symmetrized
    assert(edges.size >= 40 * 3 / 2)
  }
}
