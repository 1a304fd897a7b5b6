package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Classifier-evaluation metrics from a (actual, predicted) column pair —
  * the scoring step of any labeling/filtering model in a data pipeline
  * (language-ID, quality classifiers, toxicity filters).
  *
  * Everything reduces over the confusion-matrix counts: one shuffle of
  * (actual, predicted) keys, map-side combined; the per-class and kappa
  * math is then a fixed sequence of integer-fed IEEE divisions on the
  * classes×classes table — deterministic at any scale, any partitioning.
  */
object Eval {

  /** One row per actual class: tp/fp/fn, precision, recall, F1.
    * Derivations use the marginal identities fp = colsum − tp and
    * fn = rowsum − tp, so only the confusion counts are ever shuffled.
    */
  def confusionMetrics(df: DataFrame, actualCol: String, predCol: String): DataFrame = {
    val cm = df.groupBy(col(actualCol).as("actual"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
    val na = cm.groupBy(col("actual").as("c")).agg(sum("n").as("na"))
    val np = cm.groupBy(col("pred").as("c")).agg(sum("n").as("np"))
    val tp = cm.filter(col("actual") === col("pred"))
      .select(col("actual").as("c"), col("n").as("tp"))
    na.join(tp, Seq("c"), "left").join(np, Seq("c"), "left")
      .select(col("c"), coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("np"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (col("na") - coalesce(col("tp"), lit(0L))).as("fn"),
        when(coalesce(col("np"), lit(0L)) > 0,
          round(coalesce(col("tp"), lit(0L)).cast("double") / col("np"), 6)).as("prec"),
        round(coalesce(col("tp"), lit(0L)).cast("double") / col("na"), 6).as("rec"),
        when(col("na") + coalesce(col("np"), lit(0L)) > 0,
          round(lit(2.0) * coalesce(col("tp"), lit(0L)) / (col("na") + coalesce(col("np"), lit(0L))), 6))
          .as("f1"))
  }

  /** Overall accuracy and Cohen's kappa. Marginal products accumulate as
    * decimals so 100 TB-scale counts cannot overflow; N² is formed in
    * doubles for the same reason.
    */
  def kappa(df: DataFrame, actualCol: String, predCol: String): DataFrame = {
    val cm = df.groupBy(col(actualCol).as("actual"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n")).localCheckpoint() // three consumers
    val na = cm.groupBy(col("actual").as("c")).agg(sum("n").as("na"))
    val np = cm.groupBy(col("pred").as("c")).agg(sum("n").as("np"))
    val marg = na.join(np, "c")
      .agg(sum(col("na").cast("decimal(19,0)") * col("np").cast("decimal(19,0)"))
        .cast("double").as("sum_prod"))
    val tot = cm.agg(
      sum(when(col("actual") === col("pred"), col("n")).otherwise(0L))
        .cast("double").as("hit"),
      sum("n").cast("double").as("nn"))
    tot.crossJoin(marg)
      .select(round(col("hit") / col("nn"), 6).as("accuracy"),
        round((col("hit") / col("nn") - col("sum_prod") / (col("nn") * col("nn")))
          / (lit(1.0) - col("sum_prod") / (col("nn") * col("nn"))), 6).as("kappa"))
  }

  /** Total-variation distance between the token distributions of a
    * deterministic train/rest split — the leakage/skew audit that a split
    * didn't bias the unigram distribution. TV = ½·Σ|p_i − q_i| computed
    * in EXACT integers (Σ|c_i·T₂ − d_i·T₁| over the common denominator
    * T₁·T₂), collapsed to a double by one IEEE division at the end — no
    * per-term float accumulation, so the number is bit-identical in any
    * engine. One token-count shuffle (vocabulary-sized), then constant
    * rows; products stay under 2^63 up to ~10^9-token corpora per side,
    * with DECIMAL(38) the documented upgrade path beyond.
    */
  def splitTokenTv(docs: DataFrame, textCol: String, idCol: String,
                   trainCut: Int = 80): DataFrame = {
    val labeled = Pipeline.splitAssign(docs, idCol, Seq(trainCut),
      Seq("train", "rest"))
    val toks = labeled.select(col("split"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy("tok").agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("c"),
      sum(when(col("split") =!= "train", 1L).otherwise(0L)).as("d"))
    val totals = counts.agg(sum("c").as("t1"), sum("d").as("t2"))
    counts.crossJoin(broadcast(totals))
      .agg(first(col("t1")).as("n_train_toks"), first(col("t2")).as("n_rest_toks"),
        sum(abs(col("c") * col("t2") - col("d") * col("t1"))).as("tv_num"))
      .select(col("n_train_toks"), col("n_rest_toks"),
        round(col("tv_num").cast("double") /
          (lit(2.0) * col("n_train_toks") * col("n_rest_toks")), 6).as("tv"))
  }
}
