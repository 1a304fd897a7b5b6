package graft

import graft.ops.{Graph, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The SCATTERED-neighbor counter-fixture to ProbeKnnGraph (VERDICT r13
  * §4): on the clustered sf1 corpus probes beat refinement at equal wall
  * (nProbe=4 recall 0.74 vs nProbe=2+2 rounds 0.52), but that corpus has
  * few cells and strong cluster structure — every true neighbor is
  * reachable by probing a handful of cells. This fixture is the opposite
  * regime the knnGraphRefined scaladoc hypothesizes about: ISOTROPIC
  * vectors (uniform Gaussian, no cluster structure) over MANY cells
  * (cells ≫ nProbe budget), where a vector's true neighbors scatter
  * across arbitrary Voronoi regions and each extra probe buys only
  * 1/cells more corpus mass. Measures recall + wall for nProbe ∈
  * {1,2,4,8} and for nProbe=2 + NN-Descent rounds ∈ {1,2,3}, so the
  * equal-wall comparison can be read off directly.
  *
  *   sbt "Test/runMain graft.ProbeKnnScattered [n] [nCells] [dim]"
  */
object ProbeKnnScattered {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = if (args.length > 0) args(0).toInt else 50000
    val nCells = if (args.length > 1) args(1).toInt else 64
    val dim = if (args.length > 2) args(2).toInt else 64
    // seeded per-column Gaussians: isotropic, no cluster structure at all
    val emb = spark.range(n.toLong).repartition(32)
      .select(col("id").as("vec_id"),
        array((0 until dim).map(j => randn(1337L + j)): _*)
          .cast("array<float>").as("embedding"))
      .localCheckpoint()
    val idx = java.nio.file.Files.createTempDirectory("knng_scat").toString
    val (_, tIdx) = Timed {
      Similarity.writeIvfIndex(emb, idx, k = nCells, iters = 2, dim = dim)
    }
    val (eb, tBrute) = Timed {
      val g = Graph.knnGraphBrute(emb, k = 3).localCheckpoint()
      (g, g.count())
    }
    val sizes = spark.read.parquet(Similarity.ivfCellsPath(spark, idx))
      .groupBy("cell").count().collect().map(_.getLong(1)).sorted.reverse
    println(f"scattered n=$n%8d dim=$dim%3d cells=$nCells%4d " +
      f"(nonempty=${sizes.length}%4d top=${sizes.head}%6d) " +
      f"index_build=${tIdx}%6.2fs brute=${tBrute}%7.2fs truth_edges=${eb._2}%9d")
    for (p <- Seq(1, 2, 4, 8)) {
      val ((ei, nE), tIvf) = Timed {
        val g = Graph.knnGraph(spark, idx, k = 3, nProbe = p).localCheckpoint()
        (g, g.count())
      }
      val hit = ei.join(eb._1, Seq("src", "dst")).count()
      println(f"  nProbe=$p%2d          ivf=${tIvf}%7.2fs edges=$nE%9d " +
        f"recall=${hit.toDouble / eb._2}%.4f speedup=${tBrute / tIvf}%5.1fx")
    }
    for (r <- Seq(1, 2, 3)) {
      val ((er, nR), tRef) = Timed {
        val g = Graph.knnGraphRefined(spark, idx, k = 3, nProbe = 2,
          rounds = r).localCheckpoint()
        (g, g.count())
      }
      val hitR = er.join(eb._1, Seq("src", "dst")).count()
      println(f"  nProbe= 2+refine$r  ivf=${tRef}%7.2fs edges=$nR%9d " +
        f"recall=${hitR.toDouble / eb._2}%.4f speedup=${tBrute / tRef}%5.1fx")
    }
    spark.stop()
  }
}
