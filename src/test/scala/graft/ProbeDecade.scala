package graft

import graft.ops.{Dedup, Linkage, Pipeline, Ranks}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The sf100 decade validation (test scope, run by hand — VERDICT r12
  * §6): every self-defending dispatcher plus the composed corpus
  * pipeline, one decade beyond the sf30 constants validation. For each
  * family: the probe's dispatch decision (regime / estimated vs capped
  * pair mass / retention), the routed plan's wall and output size —
  * the record of whether the tuned constants (96/doc, cap 50, 256/row,
  * 100k block pairs, 8·gramRows) still route sanely when the corpus
  * grows 3.3× past the largest prior validation.
  *
  * Inputs are the gen_sf_partial tables (documents + customer only —
  * the dispatcher soak never reads lineitem):
  *
  *   python3 tools/gen_sf_partial.py 100 /tmp/sf100
  *   SPARK_DRIVER_MEM=96g sbt "Test/runMain graft.ProbeDecade /tmp/sf100"
  */
object ProbeDecade {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()
      println(s"=== $dir docs=$nDocs ===")

      // 1. MinHash-LSH dispatcher
      val (dLsh, tLshProbe) = Timed {
        Dedup.minhashLshAuto(docs, "text", "doc_id")
      }
      val (nLshPairs, tLsh) = Timed(dLsh.pairs.count())
      println(f"LSH   regime=${dLsh.regime}%-6s probed=${dLsh.probed} " +
        f"est=${dLsh.estCandidates}%12d capped=${dLsh.estCandidatesCapped}%12d " +
        f"maxBucket=${dLsh.maxBucketObserved}%8d retention=${dLsh.candidateRetention}%.4f " +
        f"probe=${tLshProbe}%6.1fs pairs=$nLshPairs%9d wall=${tLsh}%7.1fs")

      // 2. shared-span dispatcher
      val (dSpan, tSpanProbe) = Timed {
        Dedup.sharedNgramPairsAuto(docs, "text", "doc_id")
      }
      val (nSpanPairs, tSpan) = Timed(dSpan.pairs.count())
      println(f"SPAN  regime=${dSpan.regime}%-6s gramRows=${dSpan.nGramRows}%12d " +
        f"est=${dSpan.estPairs}%12d capped=${dSpan.estPairsCapped}%12d " +
        f"maxK=${dSpan.maxGramDocsObserved}%8d retention=${dSpan.pairRetention}%.4f " +
        f"probe=${tSpanProbe}%6.1fs pairs=$nSpanPairs%9d wall=${tSpan}%7.1fs")

      // 3. blocked-linkage dispatcher (the linkCustomers passes, via the
      // metadata-bearing entry point)
      val cust = spark.read.parquet(s"$dir/customer.parquet")
      val dirty = Linkage.dirtyCustomers(cust)
      val (dLink, tLinkProbe) = Timed {
        Linkage.candidatesAuto(dirty, cust, "d_id", "c_custkey", Seq(
          (concat_ws("|", col("d_nat"), col("d_seg"),
            floor(col("d_bal") / 100).cast("int")),
            concat_ws("|", col("c_nationkey"), col("c_mktsegment"),
              floor(col("c_acctbal").cast("decimal(12,2)") / 100).cast("int"))),
          (substring(col("d_name"), 10, 7),
            substring(col("c_name"), 10, 7))))
      }
      val (nLinkPairs, tLink) = Timed(dLink.pairs.count())
      val passes = dLink.passes.map(p =>
        f"p${p.pass}:${p.regime}(est=${p.estPairs} over=${p.overCapBlocks})")
        .mkString(" ")
      println(f"LINK  regime=${dLink.regime}%-6s nL=${dLink.nLeft}%9d " +
        f"nR=${dLink.nRight}%9d $passes probe=${tLinkProbe}%6.1fs " +
        f"pairs=$nLinkPairs%12d wall=${tLink}%7.1fs")

      // 4. grouped-percentiles dispatcher: c_acctbal is a continuous
      // domain (~1.1M distincts at sf100 >> 2^16) — must route EXACT
      // (bufferless); the buffered regime here would be the memory cliff
      val (pr, tRank) = Timed {
        val r = Ranks.groupedPercentiles(cust, col("c_mktsegment"),
          col("c_acctbal"), Seq(0.25, 0.5, 0.75))
        (r, r.count())
      }
      println(f"RANK  rows=${pr._2}%4d wall=${tRank}%7.1fs " +
        "(continuous domain: exact kernel expected — verify via plan in RanksSpec)")

      // 5. composed corpus pipeline, library defaults (AUTO near-dup)
      val (p, tPipe) = Timed {
        val out = Pipeline.corpusPipeline(
          docs.filter(col("doc_id") % 997 =!= 0),
          docs.filter(col("doc_id") % 997 === 0),
          budgetTokens = 800L, contextLen = 256, shards = 8)
        (out, out.count())
      }
      println(f"PIPE  rows=${p._2}%9d wall=${tPipe}%7.1fs " +
        f"exchanges=${exchanges(p._1)}")
    }
    spark.stop()
  }
}
