package graft

import graft.ops.{Dedup, Graph, Pipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative-graph scale probe (test scope, run by hand; VERDICT r14 #1):
  * the bench fixtures bound every iterative graph operator at ~600-2000
  * vertices, which proves correctness but says nothing about the two
  * ways iterated self-joins die at 100x — lineage growth (per-iteration
  * wall creeping UP with the iteration index when an intermediate is not
  * truncated) and hub skew (a power-law vertex whose per-key fan-in
  * concentrates one task). This probe generates a deterministic Zipf
  * edge set at three decades and measures BOTH:
  *
  *   - per-iteration wall for pageRank / labelPropagation (runs at
  *     iters 1, 3, 5: with truncated lineage the wall is affine in
  *     iters, so slope(3->5) must match slope(1->3));
  *   - total wall + rounds for kCore, bfsHops (from the mega-hub), and
  *     connected components (Dedup.clusterPairs), whose loops
  *     self-terminate;
  *   - the degree distribution actually generated (max/p99), so the
  *     hub stress is on the record, not assumed.
  *
  * Edge generation: src and dst are drawn independently Zipf(s=1) over
  * n = m/10 vertices via the exact inverse CDF floor(exp(u·ln(n+1)))-1,
  * u from md5(id) — deterministic, engine-reproducible (the md5Hash60
  * contract), no RNG. Vertex 0's expected degree is m·ln2/ln(n+1) — a
  * genuine linear-fraction hub (~5% of all edge endpoints at n=1e6),
  * harsher than most real power laws.
  *
  *   SPARK_DRIVER_MEM=32g sbt "Test/runMain graft.ProbeGraphScale 100000 1000000 10000000"
  */
object ProbeGraphScale {

  private def zipfU(salt: String, n: Long) = {
    val m30 = 1L << 30
    val u = pmod(Pipeline.md5Hash60(concat(lit(salt), col("id"))), lit(m30))
      .cast("double") / m30.toDouble
    least(floor(exp(u * math.log(n + 1.0)) - 1).cast("long"), lit(n - 1))
  }

  def main(args: Array[String]): Unit = {
    // "lp357" as the first arg runs ONLY labelPropagation, at iters
    // {3,5,7}, single-rep: the saturation check for the fourth decade,
    // where slope(1->3) < slope(3->5) is expected (frontier growth — the
    // labeled set expands from the seeds toward |V|) and the question is
    // whether slope(5->7) ~= slope(3->5) (affine past saturation) or
    // keeps growing (a genuine per-round defect).
    val lpOnly = args.headOption.contains("lp357")
    val sizeArgs = if (lpOnly) args.tail else args
    val sizes = if (sizeArgs.nonEmpty) sizeArgs.map(_.toLong).toSeq
                else Seq(100000L, 1000000L, 10000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (m <- sizes) {
      val n = m / 10
      // Partitions sized to the decade, as a real cluster would size them
      // (floor 64 keeps the three recorded decades' plans unchanged). The
      // first 100M attempt pinned 64 partitions = ~2M edge rows per task
      // and OOM'd a 48 GiB heap in shuffle write: a fixed partition count
      // is itself a thing that does not survive a decade jump.
      val parts = math.max(64L, m / 500000L).toInt
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      // directed Zipf edges, self-loops dropped; materialized once so
      // every operator under test reads the same in-memory frame and the
      // measured walls exclude generation
      val directed = spark.range(m)
        .select(zipfU("s", n).as("src"), zipfU("d", n).as("dst"))
        .filter(col("src") =!= col("dst"))
        .localCheckpoint()
      val sym = directed
        .union(directed.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint()
      val und = sym.filter(col("src") < col("dst"))
        .select(col("src").as("pa"), col("dst").as("pb")).localCheckpoint()
      // each timed run leaves its internal localCheckpoint blocks behind;
      // without sweeping them the later runs measure block-manager
      // pressure, not the plan (observed: w3 > w5 on identical code).
      // The probe's own base frames are kept alive.
      val keep = spark.sparkContext.getPersistentRDDs.keySet
      def sweep(): Unit = {
        spark.sparkContext.getPersistentRDDs
          .filterNot(kv => keep.contains(kv._1))
          .values.foreach(_.unpersist(true))
        System.gc()
      }
      val deg = sym.groupBy("src").agg(count(lit(1)).as("d"))
        .agg(max("d").as("mx"), expr("percentile(d, 0.99)").as("p99"),
          count(lit(1)).as("nv"), sum("d").as("ne"))
        .collect()(0)
      println(f"GRAPHSCALE m=$m%9d  verts=${deg.getLong(2)}%8d " +
        f"symEdges=${deg.getLong(3)}%9d maxDeg=${deg.getLong(0)}%8d " +
        f"p99Deg=${deg.getDouble(1)}%8.0f")

      // per-iteration linearity: affine wall => truncated lineage.
      // min-of-2 reps per point: single-shot walls on this VM swing 2-3x
      // with page-cache/GC state, which would read as phantom slope
      def iterSlopes(name: String, run: Int => DataFrame,
                     points: Seq[Int] = Seq(1, 3, 5),
                     reps: Int = 2): Unit = {
        val walls = points.map { it =>
          Seq.fill(reps) {
            val (_, w) = time(run(it).count()); sweep(); w
          }.min
        }
        val ws = points.zip(walls)
          .map { case (p, w) => f"w$p=$w%7.2fs" }.mkString(" ")
        val slopes = points.zip(walls).sliding(2).map { case Seq((pa, wa), (pb, wb)) =>
          f"perIter($pa->$pb)=${(wb - wa) / (pb - pa)}%6.2fs"
        }.mkString(" ")
        println(f"GRAPHSCALE m=$m%9d  $name%-12s $ws $slopes")
      }
      val seeds = spark.range(0, n, 97)
        .select(col("id").as("v"), pmod(col("id"), lit(7)).as("label"))
      if (lpOnly) {
        iterSlopes("labelprop", it => Graph.labelPropagation(und, seeds, it),
          points = Seq(3, 5, 7), reps = 1)
        sweep()
      } else {
      iterSlopes("pagerank", it => Graph.pageRank(sym, iters = it))
      iterSlopes("labelprop", it => Graph.labelPropagation(und, seeds, it))

      val sources = spark.range(1).select(lit(0L).as("v")) // the mega-hub
      val (bfsRows, bfsW) = time(Graph.bfsHops(und, sources, 6).count())
      println(f"GRAPHSCALE m=$m%9d  bfs          wall=$bfsW%7.2fs reached=$bfsRows%9d")
      sweep()

      val (coreRows, coreW) = time(Graph.kCore(und, k = 8).count())
      println(f"GRAPHSCALE m=$m%9d  kcore8       wall=$coreW%7.2fs survivors=$coreRows%9d")
      sweep()

      val (ccRows, ccW) = time(
        Dedup.clusterPairs(und.select(col("pa").as("a_id"),
          col("pb").as("b_id"))).count())
      println(f"GRAPHSCALE m=$m%9d  concomp      wall=$ccW%7.2fs verts=$ccRows%9d")
      sweep()
      }
    }
    spark.stop()
  }
}
