package graft

import graft.ops.{Graph, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** kNN-graph build probe (test scope, run by hand): brute-force vs the
  * IVF-index-backed Graph.knnGraph at each nProbe, with edge recall vs
  * the brute truth — the measurement behind the q_eval_knn_graph_recall
  * tuning table and the PLANS.md brute-vs-IVF entry (VERDICT r12 §2).
  * Walls are same-JVM sequential (relative, not fresh-JVM absolute);
  * the index build is timed separately since a real corpus amortizes it
  * across many consumers.
  *
  *   sbt "Test/runMain graft.ProbeKnnGraph /tmp/sf1 [nCells]"
  */
object ProbeKnnGraph {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val nCells = if (args.length > 1) args(1).toInt else 8
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint()
    val n = emb.count()
    val idx = java.nio.file.Files.createTempDirectory("knng_idx").toString
    val (_, tIdx) = Timed {
      Similarity.writeIvfIndex(emb, idx, k = nCells, iters = 2, dim = 64)
    }
    val (eb, tBrute) = Timed {
      val g = Graph.knnGraphBrute(emb, k = 3).localCheckpoint()
      (g, g.count())
    }
    // cell balance: the IVF scan-cost model assumes ~n/nCells per cell;
    // a hot cell makes the self-join quadratic AND recall poor (many
    // centroids idle). Same report as q_eval_ivf_cell_balance.
    val sizes = spark.read.parquet(Similarity.ivfCellsPath(spark, idx))
      .groupBy("cell").count().collect().map(_.getLong(1)).sorted.reverse
    val pairMass = sizes.map(s => s.toDouble * s).sum
    println(f"$dir%-10s n=$n%8d cells=$nCells%4d (nonempty=${sizes.length}%3d " +
      f"top=${sizes.head}%6d pair_mass=${pairMass / 1e6}%8.1fM of " +
      f"${n.toDouble * n / 1e6}%8.1fM brute) index_build=${tIdx}%6.2fs " +
      f"brute=${tBrute}%7.2fs truth_edges=${eb._2}%9d")
    for (p <- Seq(1, 2, 4)) {
      val ((ei, nE), tIvf) = Timed {
        val g = Graph.knnGraph(spark, idx, k = 3, nProbe = p).localCheckpoint()
        (g, g.count())
      }
      val hit = ei.join(eb._1, Seq("src", "dst")).count()
      println(f"  nProbe=$p%2d ivf=${tIvf}%7.2fs edges=$nE%9d hit=$hit%9d " +
        f"recall=${hit.toDouble / eb._2}%.4f speedup_vs_brute=${tBrute / tIvf}%5.1fx")
    }
    // the refinement knob at fixed probe cost: nProbe=2 base + 1 and 2
    // NN-Descent rounds (linear-cost recall vs paying more probes)
    for (r <- Seq(1, 2)) {
      val ((er, nR), tRef) = Timed {
        val g = Graph.knnGraphRefined(spark, idx, k = 3, nProbe = 2,
          rounds = r).localCheckpoint()
        (g, g.count())
      }
      val hitR = er.join(eb._1, Seq("src", "dst")).count()
      println(f"  nProbe= 2+refine$r ivf=${tRef}%7.2fs edges=$nR%9d hit=$hitR%9d " +
        f"recall=${hitR.toDouble / eb._2}%.4f speedup_vs_brute=${tBrute / tRef}%5.1fx")
    }
    spark.stop()
  }
}
