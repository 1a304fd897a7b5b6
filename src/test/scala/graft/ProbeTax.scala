package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession

/** The sf100 dispatcher probe-tax measurement (test scope, run by hand —
  * VERDICT r13 §2): end-to-end totals for the span and LSH dispatchers
  * against their no-probe baselines, on the same corpus as ProbeDecade.
  *
  * The r13 table recorded the span probe at 569 s against an 86 s routed
  * plan — but the probe's wall was dominated by materializing a 240M-row
  * gram checkpoint the EXACT route never reads (its self-join shares one
  * exchange). This harness records, at sf100:
  *
  *   SPAN a. sampled pre-probe (r14 default) + checkpoint-free routed —
  *           the new end-to-end total and the probe's share of it;
  *        b. exact checkpointed probe (probeSampleMod = 1, the r13 path)
  *           + checkpoint-consuming routed — the old total;
  *        c. forced exact from scratch (no probe at all) — the floor.
  *   LSH  a. auto dispatch (probe + routed);
  *        b. forced capped at the dispatcher's cap, from scratch — the
  *           band checkpoint is work the capped route pays regardless,
  *           so a−b isolates the probe aggregate's true incremental tax
  *           (the reuse proof).
  *
  *   SPARK_DRIVER_MEM=96g sbt "Test/runMain graft.ProbeTax /tmp/sf100"
  */
object ProbeTax {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      println(s"=== $dir docs=${docs.count()} ===")

      // SPAN a: sampled pre-probe + checkpoint-free exact route
      val (dNew, tNewProbe) = Timed {
        Dedup.sharedNgramPairsAuto(docs, "text", "doc_id")
      }
      val (nNew, tNewRouted) = Timed(dNew.pairs.count())
      val newTotal = tNewProbe + tNewRouted
      println(f"SPAN sampled  probeMode=${dNew.probeMode} regime=${dNew.regime} " +
        f"gramRows~${dNew.nGramRows}%d est~${dNew.estPairs}%d " +
        f"probe=${tNewProbe}%7.1fs routed=${tNewRouted}%7.1fs " +
        f"total=${newTotal}%7.1fs probeShare=${100 * tNewProbe / newTotal}%5.1f%% " +
        f"pairs=$nNew%d")

      // SPAN c: forced exact from scratch — the no-probe floor
      val (nFloor, tFloor) = Timed {
        Dedup.sharedNgramPairs(docs, "text", "doc_id",
          maxGramDocs = Int.MaxValue).count()
      }
      println(f"SPAN forced-exact (no probe)            " +
        f"total=${tFloor}%7.1fs pairs=$nFloor%d")

      // SPAN b: the r13 checkpointed probe + checkpoint-consuming route
      val (dOld, tOldProbe) = Timed {
        Dedup.sharedNgramPairsAuto(docs, "text", "doc_id", probeSampleMod = 1)
      }
      val (nOld, tOldRouted) = Timed(dOld.pairs.count())
      println(f"SPAN exact-probe (r13) regime=${dOld.regime} " +
        f"probe=${tOldProbe}%7.1fs routed=${tOldRouted}%7.1fs " +
        f"total=${tOldProbe + tOldRouted}%7.1fs pairs=$nOld%d")

      // LSH a: auto dispatch (r15: sampled pre-probe on a clear
      // decision, exact probe riding the band checkpoint otherwise)
      val (dLsh, tLshProbe) = Timed {
        Dedup.minhashLshAuto(docs, "text", "doc_id")
      }
      val (nLsh, tLshRouted) = Timed(dLsh.pairs.count())
      val lshTotal = tLshProbe + tLshRouted
      println(f"LSH  auto     probeMode=${dLsh.probeMode} " +
        f"regime=${dLsh.regime} cap=${dLsh.cap} " +
        f"probe=${tLshProbe}%7.1fs routed=${tLshRouted}%7.1fs " +
        f"total=$lshTotal%7.1fs " +
        f"probeShare=${100 * tLshProbe / lshTotal}%5.1f%% pairs=$nLsh%d")

      // LSH a': the r14 exact-probe path (probeSampleMod = 1) — band
      // checkpoint + count job + bucket aggregate before routing
      val (dLshOld, tLshOldProbe) = Timed {
        Dedup.minhashLshAuto(docs, "text", "doc_id", probeSampleMod = 1)
      }
      val (nLshOld, tLshOldRouted) = Timed(dLshOld.pairs.count())
      println(f"LSH  exact-probe (r14) regime=${dLshOld.regime} " +
        f"probe=${tLshOldProbe}%7.1fs routed=${tLshOldRouted}%7.1fs " +
        f"total=${tLshOldProbe + tLshOldRouted}%7.1fs pairs=$nLshOld%d")

      // LSH b: forced capped from scratch at the same cap — pays the
      // same band checkpoint, skips only the probe aggregate
      val (nLshF, tLshF) = Timed {
        Dedup.minhashLsh(docs, "text", "doc_id",
          maxBucket = Dedup.DefaultCappedBucket).count()
      }
      println(f"LSH  forced-capped (no probe)           " +
        f"total=${tLshF}%7.1fs pairs=$nLshF%d")
    }
    spark.stop()
  }
}
