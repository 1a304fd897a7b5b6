package graft

import graft.ops.{Dedup, Pipeline, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The COMPOSITION gate (VERDICT r11 task 2): 384 isolated oracle-green
  * queries don't prove that operator composition holds checkpoint and
  * shuffle discipline — this main runs the full corpus pipeline
  * (lang → quality → dispatcher-routed near-dup dedup → decontaminate →
  * token-budget sample → pack) at sf1/sf10 BOTH ways:
  *
  *   composed — Pipeline.corpusPipeline, one declarative job;
  *   staged   — the same five stages, each materialized
  *              (localCheckpoint) before the next starts, the way a
  *              5-script Airflow pipeline would run them.
  *
  * and asserts the survivor sets are IDENTICAL, then reports wall time,
  * final-plan exchange count, and Spark job count for each.
  *
  *   sbt -batch "Test/runMain graft.ProbeCorpusPipeline /tmp/sf1 /tmp/sf10"
  */
object ProbeCorpusPipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })

    def exchanges(df: DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .map(_.dropWhile(c => !c.isLetter))
        .count(l => l.startsWith("Exchange"))

    args.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val evalSet = docs.filter(col("doc_id") % 997 === 0).localCheckpoint()
      val train = docs.filter(col("doc_id") % 997 =!= 0).localCheckpoint()
      val totTok = train.agg(
        sum(size(graft.ops.TextAnalysis.tokens(col("text"))))).collect()(0).getLong(0)
      // a budget that BINDS (~60% of the mean per-source token mass)
      val budget = (totTok * 0.6 / 20).toLong
      println(s"== $dir: ${train.count()} train docs, $totTok tokens, " +
        s"budget=$budget tokens/source ==")

      def run(tag: String)(f: => DataFrame): DataFrame = {
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        val out = f.localCheckpoint()
        val n = out.count()
        println(f"$tag%-9s ${(System.nanoTime() - t0) / 1e9}%7.1f s  " +
          f"rows=$n%8d  jobs=${jobs.get() - j0}%3d")
        out
      }

      val nTok = size(graft.ops.TextAnalysis.tokens(col("text"))).cast("long")
      val composedPlan = Pipeline.corpusPipeline(train, evalSet,
        budgetTokens = budget, contextLen = 512, shards = 8)
      println(s"composed final-plan exchanges: ${exchanges(composedPlan)}")
      val composed = run("composed") {
        Pipeline.corpusPipeline(train, evalSet,
          budgetTokens = budget, contextLen = 512, shards = 8)
      }

      val t0 = System.nanoTime()
      val j0 = jobs.get()
      val gated = run("  gate") {
        train.filter(TextAnalysis.langId(col("text")) === "en")
          .withColumn("quality", TextAnalysis.qualityScore(col("text")))
          .filter(col("quality") >= 0.5)
      }
      val deduped = run("  dedup") {
        Dedup.dedupByMinhash(gated, "text", "doc_id")
      }
      val clean = run("  decon") {
        Pipeline.decontaminate(deduped, evalSet, "text", "doc_id")
      }
      val sampled = run("  budget") {
        Pipeline.tokenBudgetSample(clean, "source", "doc_id", nTok, budget)
      }
      val staged = run("  pack") {
        Pipeline.packSequences(
          sampled.select(col("doc_id"), col("source"), col("quality"),
            nTok.as("__toks")),
          "doc_id", col("__toks"), 512, 8).drop("__toks")
      }
      println(f"staged    ${(System.nanoTime() - t0) / 1e9}%7.1f s  total  " +
        f"jobs=${jobs.get() - j0}%3d")

      val cols = composed.columns.sorted.map(col).toSeq
      val diff = composed.select(cols: _*).except(staged.select(cols: _*)).count() +
        staged.select(cols: _*).except(composed.select(cols: _*)).count()
      println(s"composed-vs-staged row diff: $diff " +
        (if (diff == 0) "IDENTICAL" else "<<< DIVERGED"))
    }
    spark.stop()
  }
}
