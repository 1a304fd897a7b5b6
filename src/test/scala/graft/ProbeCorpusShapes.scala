package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dispatcher-threshold measurement on ADVERSARIAL corpus shapes
  * (VERDICT r11 task 4): the 96-collisions/doc LSH threshold, the
  * cap=50, and the new 8-pairs/gram-row stop-gram threshold were tuned
  * on the driver-shaped corpus; this main measures routing, retention,
  * wall, and verified-pair recall on tools/gen_corpus.py's
  * boilerplate-heavy and Zipf-vocabulary shapes.
  *
  *   python3 tools/gen_corpus.py boilerplate 20000 target/corpora/boilerplate_20000.parquet
  *   sbt -batch "Test/runMain graft.ProbeCorpusShapes target/corpora/boilerplate_20000.parquet ..."
  *
  * Each corpus plants 2% near-dups (text-edit copies) and writes the
  * planted (a_id, b_id) list alongside (<corpus>.pairs.parquet), so
  * recall is measured against the ACTUAL ground truth: planted-true =
  * planted ∩ the exact run's result (a planted pair the exact operator
  * itself rejects — jaccard under threshold after heavy edits — is not
  * a positive either path owes). Exact baselines are skipped when the
  * probe's own estimate says they are >2e8 raw candidates (the
  * measurement would be the n² run the dispatcher exists to refuse).
  */
object ProbeCorpusShapes {
  def main(args: Array[String]): Unit = {
    // raise to force an exact baseline past the default refusal, e.g.
    // GRAFT_PROBE_EXACT_BUDGET=3000000000 for one boilerplate span run
    val exactBudget =
      sys.env.getOrElse("GRAFT_PROBE_EXACT_BUDGET", "200000000").toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    args.foreach { path =>
      val docs = spark.read.parquet(path).localCheckpoint()
      val planted = spark.read.parquet(
        path.stripSuffix(".parquet") + ".pairs.parquet").localCheckpoint()
      println(s"== $path (${planted.count()} planted pairs) ==")

      // --- MinHash-LSH dispatcher ---
      val d = Dedup.minhashLshAuto(docs, "text", "doc_id", probeFloorDocs = 0)
      val cPerDoc = d.estCandidates.toDouble / math.max(d.nDocs, 1L)
      println(f"lsh   regime=${d.regime}%-6s docs=${d.nDocs}%7d " +
        f"rawCand=${d.estCandidates}%12d (${cPerDoc}%9.1f/doc) " +
        f"maxBucket=${d.maxBucketObserved}%7d retention=${d.candidateRetention}%.4f")
      val (nDisp, tDisp) = t { d.pairs.localCheckpoint().count() }
      println(f"lsh   dispatched: $nDisp%9d verified pairs in $tDisp%7.1f s")
      if (d.estCandidates < exactBudget) {
        val (exact, tEx) = t {
          Dedup.minhashLsh(docs, "text", "doc_id", maxBucket = Int.MaxValue)
            .localCheckpoint()
        }
        val nEx = exact.count()
        val hit = d.pairs.join(exact, Seq("a_id", "b_id"), "left_semi").count()
        val pTrue = exact.join(planted, Seq("a_id", "b_id"), "left_semi")
          .localCheckpoint()
        val pAll = pTrue.count()
        val pKept = d.pairs.join(pTrue, Seq("a_id", "b_id"), "left_semi").count()
        println(f"lsh   exact:      $nEx%9d verified pairs in $tEx%7.1f s " +
          f"recall=${hit.toDouble / math.max(nEx, 1L)}%.4f " +
          f"planted-recall=${pKept.toDouble / math.max(pAll, 1L)}%.4f ($pKept/$pAll)")
      } else println("lsh   exact:      SKIPPED (probe estimate > 2e8 raw candidates)")

      // --- stop-gram shared-span dispatcher ---
      val sp = Dedup.sharedNgramPairsAuto(docs, "text", "doc_id", n = 8)
      val pPerRow = sp.estPairs.toDouble / math.max(sp.nGramRows, 1L)
      println(f"span  regime=${sp.regime}%-6s gramRows=${sp.nGramRows}%9d " +
        f"estPairs=${sp.estPairs}%12d (${pPerRow}%9.2f/row) " +
        f"maxGramDocs=${sp.maxGramDocsObserved}%7d retention=${sp.pairRetention}%.4f")
      val (nSpan, tSpan) = t { sp.pairs.localCheckpoint().count() }
      println(f"span  dispatched: $nSpan%9d pairs in $tSpan%7.1f s")
      if (sp.estPairs < exactBudget) {
        val (exactSpan, tEx) = t {
          Dedup.sharedNgramPairs(docs, "text", "doc_id", n = 8,
            maxGramDocs = Int.MaxValue).localCheckpoint()
        }
        val nEx = exactSpan.count()
        // planted-true = planted ∩ exact span pairs (the GENERATOR's
        // list, not a reconstruction — r12 review: an n_shared heuristic
        // silently dropped hard planted pairs from the denominator)
        val pTrue = exactSpan.join(planted, Seq("a_id", "b_id"), "left_semi")
          .localCheckpoint()
        val pAll = pTrue.count()
        val pKept = sp.pairs.join(pTrue, Seq("a_id", "b_id"), "left_semi").count()
        println(f"span  exact:      $nEx%9d pairs in $tEx%7.1f s " +
          f"planted-pair recall=${pKept.toDouble / math.max(pAll, 1L)}%.4f ($pKept/$pAll)")
      } else println("span  exact:      SKIPPED (probe estimate > 2e8 pairs)")
    }
    spark.stop()
  }
}
