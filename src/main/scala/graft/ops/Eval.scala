package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Classifier-evaluation metrics from a (actual, predicted) column pair —
  * the scoring step of any labeling/filtering model in a data pipeline
  * (language-ID, quality classifiers, toxicity filters).
  *
  * Everything reduces over the confusion-matrix counts: one shuffle of
  * (actual, predicted) keys, map-side combined; the per-class and kappa
  * math is then a fixed sequence of integer-fed IEEE divisions on the
  * classes×classes table — deterministic at any scale, any partitioning.
  *
  * CHECKPOINT CONVENTION: operators whose inputs feed the multi-action
  * Ranks machinery (`rocAuc`, the ranking evaluators) `localCheckpoint()`
  * small aggregate frames at PLAN-CONSTRUCTION time — eager Spark jobs
  * run when the DataFrame is BUILT, and the (aggregate-sized) checkpoint
  * blocks stay pinned for the session; see the matching note on
  * [[Stats]].
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

  /** Exact ROC-AUC of a score against a binary label, via the tie-averaged
    * rank-sum identity AUC = (R₁ − n₁(n₁+1)/2) / (n₁·n₂) — the
    * Mann–Whitney U normalization (same counts-then-prefix-sum shape as
    * [[Stats.mannWhitneyU]]: scores are distinct-compressed first, then
    * the global cumulative count comes from [[Ranks.prefixCounts]] —
    * range-bucketed two-pass prefix sums, no unpartitioned window — so a
    * CONTINUOUS score column, where distinct values ≈ rows, never plans
    * a single-task sort). `auc_2x_num` = 2·U₁ stays an exact integer;
    * the AUC itself is one IEEE division.
    */
  def rocAuc(df: DataFrame, isPos: org.apache.spark.sql.Column,
             scoreCol: org.apache.spark.sql.Column): DataFrame = {
    val g = df.select(isPos.as("a"), scoreCol.as("v"))
      .groupBy("v").agg(sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        count(lit(1)).as("c"))
      .localCheckpoint() // consumers: boundary sample + the cum pass
    val ranked = Ranks.prefixCounts(g, "v", Seq("c"))
      .select(col("ca"), col("c"), (col("c_cum") - col("c")).as("rlo"))
    ranked.agg(sum("ca").as("n1"), (sum("c") - sum("ca")).as("n2"),
        sum(col("ca") * (lit(2) * col("rlo") + col("c") + 1)).as("r1x2"))
      .select(col("n1").cast("int").as("n_pos"), col("n2").cast("int").as("n_neg"),
        (col("r1x2") - col("n1") * (col("n1") + 1)).as("auc_2x_num"),
        round((col("r1x2") - col("n1") * (col("n1") + 1)).cast("double") /
          (lit(2) * col("n1") * col("n2")).cast("double"), 6).as("auc"))
  }

  /** Calibration/reliability table of a probability score (given in exact
    * integer MILLI-units, 0..1000) against a binary outcome: per bin the
    * count, positive count, exact milli-sum, mean predicted probability,
    * observed positive rate, and |gap| — the per-bin contributions to
    * expected calibration error. All aggregates are integers (map-side
    * combined, bins-sized result); each output ratio is one fixed IEEE
    * expression.
    */
  def calibrationBins(df: DataFrame, isPos: org.apache.spark.sql.Column,
                      pMilli: org.apache.spark.sql.Column,
                      bins: Int = 10): DataFrame = {
    val bin = least(floor(pMilli * bins / 1000).cast("int"), lit(bins - 1))
    df.select(bin.as("bin"), when(isPos, 1L).otherwise(0L).as("pos"),
        pMilli.cast("long").as("pm"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum("pos").as("n_pos"),
        sum("pm").as("sum_milli"))
      .select(col("bin"), col("n"), col("n_pos"), col("sum_milli"),
        round(col("sum_milli").cast("double") / (col("n") * 1000).cast("double"), 6)
          .as("mean_p"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"),
        round(abs(col("sum_milli").cast("double") / (col("n") * 1000).cast("double")
          - col("n_pos").cast("double") / col("n").cast("double")), 6)
          .as("abs_gap"))
      .orderBy("bin")
  }

  /** McNemar's paired test for two classifiers judged on the SAME
    * examples — the discordant-pair counts b (A right, B wrong) and c
    * (A wrong, B right), both accuracies, and the χ² statistic
    * (b−c)²/(b+c) in truncating ×10⁶ fixed point. Exact integers end to
    * end (one narrow projection + one aggregate); the marginal counts a
    * model comparison actually needs, not a float p-value.
    */
  def mcnemar(df: DataFrame, truth: org.apache.spark.sql.Column,
              predA: org.apache.spark.sql.Column,
              predB: org.apache.spark.sql.Column): DataFrame = {
    val t = df.select(truth.as("y"), predA.as("pa"), predB.as("pb"))
      .select((col("pa") === col("y")).as("okA"), (col("pb") === col("y")).as("okB"))
    t.agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("okA"), 1L).otherwise(0L)).as("n_ok_a"),
        sum(when(col("okB"), 1L).otherwise(0L)).as("n_ok_b"),
        sum(when(col("okA") && !col("okB"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("okA") && col("okB"), 1L).otherwise(0L)).as("c"))
      .select(col("n"), col("n_ok_a"), col("n_ok_b"), col("b"), col("c"),
        when(col("b") + col("c") === 0, 0L)
          .otherwise(expr("(b - c) * (b - c) * 1000000 div (b + c)"))
          .as("mcnemar_x1e6"))
  }

  /** Isotonic (PAV) recalibration of the binned reliability table: the
    * unique non-decreasing fit to the per-bin positive rates under L2,
    * via pool-adjacent-violators — the standard post-hoc calibration
    * map for a quality/classifier score. The DISTRIBUTED work is the
    * binning aggregate (same bin formula as [[calibrationBins]]); the
    * pooling runs driver-side over the ≤ `bins` collected rows (the
    * codebook rule) with EXACT rational compares — a violation is
    * `pos_i·n_j > pos_j·n_i`, cross-multiplied longs, no float rates —
    * so the result replays bit-for-bit in any engine. The PAV fixpoint
    * is merge-order independent, which is why this stack form and the
    * oracle's leftmost-first recursive form agree exactly. Output: one
    * row per occupied bin with its pooled rate in truncating ×10⁶
    * fixed point (monotone non-decreasing by construction).
    */
  def isotonicCalibration(df: DataFrame, isPos: org.apache.spark.sql.Column,
                          pMilli: org.apache.spark.sql.Column,
                          bins: Int = 10): DataFrame = {
    val spark = df.sparkSession
    val bin = least(floor(pMilli * bins / 1000).cast("int"), lit(bins - 1))
    val a = df.select(bin.as("bin"), when(isPos, 1L).otherwise(0L).as("pos"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum("pos").as("n_pos"))
      .orderBy("bin").collect() // ≤ bins rows by construction
    case class P(lo: Int, hi: Int, n: Long, pos: Long)
    val pools = scala.collection.mutable.ArrayBuffer[P]()
    a.foreach { r =>
      var cur = P(r.getInt(0), r.getInt(0), r.getLong(1), r.getLong(2))
      while (pools.nonEmpty && pools.last.pos * cur.n > cur.pos * pools.last.n) {
        val t = pools.remove(pools.length - 1)
        cur = P(t.lo, cur.hi, t.n + cur.n, t.pos + cur.pos)
      }
      pools += cur
    }
    import spark.implicits._
    a.toSeq.map { r =>
      val b = r.getInt(0)
      val pl = pools.find(p => p.lo <= b && b <= p.hi).get
      (b, r.getLong(1), r.getLong(2), pl.pos * 1000000L / pl.n)
    }.toDF("bin", "n", "n_pos", "iso_rate_x1e6")
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

  /** Rank-position discounts for NDCG, quantized to integers:
    * `round(10^12 / log2(i+1))` computed ONCE here and emitted as
    * literals into both engines' plans, so no transcendental is ever
    * evaluated at query time — the metric is exactly "NDCG with
    * discounts quantized at 1e-12", deterministic on any engine.
    */
  def ndcgDiscountsFp(k: Int): Seq[Long] =
    (1 to k).map(i => math.round(1e12 / (math.log(i + 1.0) / math.log(2.0))))

  /** NDCG@k of a retrieval `run` (query_id, doc_id, rnk) against graded
    * `truth` (query_id, doc_id, gain): DCG and ideal-DCG accumulate as
    * exact BIGINT sums of gain × quantized-discount terms, so the only
    * float op is the final division. Runs are top-k bounded per query, so
    * the join + aggregation touch O(queries × k) rows — evaluating a
    * ranking system never re-touches the corpus.
    */
  def ndcgAtK(run: DataFrame, truth: DataFrame, k: Int = 10): DataFrame = {
    val discArr = array(ndcgDiscountsFp(k).map(lit): _*)
    val dcg = run.filter(col("rnk") <= k)
      .join(truth, Seq("query_id", "doc_id"), "left")
      .select(col("query_id"),
        (coalesce(col("gain"), lit(0L)).cast("long")
          * element_at(discArr, col("rnk").cast("int"))).as("term_fp"))
      .groupBy("query_id").agg(sum("term_fp").as("dcg_fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("gain").desc, col("doc_id"))
    val ideal = truth.withColumn("irn", row_number().over(w))
      .filter(col("irn") <= k)
      .select(col("query_id"), (col("gain").cast("long")
        * element_at(discArr, col("irn").cast("int"))).as("iterm_fp"))
      .groupBy("query_id").agg(sum("iterm_fp").as("idcg_fp"))
    dcg.join(ideal, "query_id")
      .select(col("query_id"),
        when(col("idcg_fp") > 0,
          round(col("dcg_fp").cast("double") / col("idcg_fp"), 6)).as("ndcg"))
  }

  /** Per-query reciprocal rank of the first relevant hit in the top-k
    * (10^9 div rank, 0 when nothing relevant ranks), the exact-integer
    * building block of MRR: averaging the returned `rr_fp` over queries
    * and dividing once by 10^9 gives MRR with a single float op.
    */
  def reciprocalRankAtK(run: DataFrame, truth: DataFrame, k: Int = 10): DataFrame = {
    val firstRel = run.filter(col("rnk") <= k)
      .join(truth.select("query_id", "doc_id"), Seq("query_id", "doc_id"), "leftsemi")
      .groupBy("query_id").agg(min("rnk").as("first_rel"))
    run.select("query_id").distinct()
      .join(firstRel, Seq("query_id"), "left")
      .select(col("query_id"), col("first_rel").cast("int").as("first_rel"),
        coalesce(expr("1000000000L div first_rel"), lit(0L)).as("rr_fp"))
  }

  /** Label-noise screen over a labeled embedding table (the kNN-
    * disagreement heuristic behind confident-learning cleanup): each
    * vector's k nearest neighbors vote, and a row whose own label differs
    * from the neighborhood plurality is flagged as suspect. Vote ties
    * break on the smaller label, so the flag set is deterministic.
    *
    * Scale shape: inherits bruteForceKnn's scan (queries broadcast,
    * corpus spread, map-side group-limited top-k) — swap in the IVF path
    * for corpus-scale sweeps; after that everything is votes-sized:
    * one (q_id, label) count, one plurality rank, two label joins.
    */
  def labelNoiseKnn(df: DataFrame, k: Int, labelCol: String = "label",
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val lbl = df.select(col(idCol), col(labelCol))
    val knn = Similarity.bruteForceKnn(df, df, k, idCol, vecCol)
    val votes = knn
      .join(lbl.select(col(idCol).as("n_id"), col(labelCol).as("n_label")),
        Seq("n_id"))
      .groupBy(col("q_id"), col("n_label"))
      .agg(count(lit(1)).as("nv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("nv").desc, col("n_label"))
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id"), col("n_label").as("knn_label"),
        col("nv").cast("int").as("n_agree"))
      .join(lbl.select(col(idCol).as("q_id"), col(labelCol)), Seq("q_id"))
      .select(col("q_id").as(idCol), col(labelCol),
        col("knn_label"), col("n_agree"),
        (col("knn_label") =!= col(labelCol)).as("flagged"))
  }

  /** Murphy decomposition of the Brier score over the same milli-unit
    * probability bins as [[calibrationBins]]: BS = REL − RES + UNC
    * (up to within-bin variance of p, reported as the residual), with
    * REL = Σn_k(p̄_k−ō_k)²/N (calibration), RES = Σn_k(ō_k−ō)²/N
    * (resolution/sharpness), UNC = ō(1−ō). Everything in truncating
    * ×10⁶ fixed point: per-bin means are `·10⁶ div n` integers, the
    * k ≤ bins squared-gap terms sum exactly, and the raw BS is the
    * exact integer Σ(pm−1000·o)² div N — zero float accumulation, so
    * the decomposition is reproducible on any engine or partitioning.
    */
  def brierDecomposition(df: DataFrame, isPos: org.apache.spark.sql.Column,
                         pMilli: org.apache.spark.sql.Column,
                         bins: Int = 10): DataFrame = {
    def d38(c: org.apache.spark.sql.Column) =
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val bin = least(floor(pMilli * bins / 1000).cast("int"), lit(bins - 1))
    val b = df.select(bin.as("bin"), when(isPos, 1L).otherwise(0L).as("pos"),
        pMilli.cast("long").as("pm"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum("pos").as("n_pos"),
        sum("pm").as("sum_milli"),
        sum(d38((col("pm") - lit(1000) * col("pos"))
          * (col("pm") - lit(1000) * col("pos")))).as("se"))
    val tot = b.agg(sum("n").cast("long").as("nn"),
        sum("n_pos").cast("long").as("np"))
      .withColumn("obar", expr("np * 1000000 div nn"))
    b.crossJoin(broadcast(tot))
      .select(col("n"), col("se"),
        expr("sum_milli * 1000 div n").as("pbar"),
        expr("n_pos * 1000000 div n").as("obk"), col("nn"), col("np"),
        col("obar"))
      .groupBy("nn", "np", "obar")
      .agg(sum(d38(col("se"))).cast("decimal(38,0)").as("se_sum"),
        sum(d38(col("n")) * d38(col("pbar") - col("obk"))
          * d38(col("pbar") - col("obk"))).as("rel_n"),
        sum(d38(col("n")) * d38(col("obk") - col("obar"))
          * d38(col("obk") - col("obar"))).as("res_n"))
      .select(col("nn").as("n"), col("np").as("n_pos"),
        expr("se_sum div nn").cast("long").as("brier_x1e6"),
        expr("rel_n div (nn * cast(1000000 as decimal(38,0)))").cast("long")
          .as("rel_x1e6"),
        expr("res_n div (nn * cast(1000000 as decimal(38,0)))").cast("long")
          .as("res_x1e6"),
        expr("obar * (1000000 - obar) div 1000000").cast("long")
          .as("unc_x1e6"))
  }

  /** Two-proportion z-test (pooled): the conversion-rate A/B read.
    * Exact integer arm totals (one aggregate), then one fixed IEEE
    * sequence — p̂₁−p̂₂ over the pooled-variance standard error. The
    * companion to [[srmCheck]]: run that first, then this.
    */
  def twoProportionZ(df: DataFrame, isA: org.apache.spark.sql.Column,
                     isConv: org.apache.spark.sql.Column): DataFrame = {
    val g = df.select(isA.as("a"), when(isConv, 1L).otherwise(0L).as("conv"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("a"), col("conv")).otherwise(0L)).as("x1"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("n2"),
        sum(when(!col("a"), col("conv")).otherwise(0L)).as("x2"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val p1 = d(col("x1")) / d(col("n1"))
    val p2 = d(col("x2")) / d(col("n2"))
    val pp = d(col("x1") + col("x2")) / d(col("n1") + col("n2"))
    g.select(col("n1"), col("x1"), col("n2"), col("x2"),
      round(p1 - p2, 6).as("p_diff"),
      round((p1 - p2) / sqrt(pp * (lit(1) - pp)
        * (lit(1.0) / d(col("n1")) + lit(1.0) / d(col("n2")))), 6).as("z"))
  }

  /** Sample-ratio-mismatch check for a deterministic 50/50 hash split —
    * the first thing to verify before reading ANY A/B result. Arms come
    * from the md5 parity of the unit id (the engine's standing
    * deterministic-assignment primitive), the χ² against the expected
    * even split is the exact (n₁−n₂)²·10⁶ div N, and z = (n₁−n₂)/√N is
    * the one IEEE combination. Emitted per stratum plus the pooled row
    * (stratum = NULL), so a per-segment imbalance shows even when the
    * pool looks balanced.
    */
  def srmCheck(df: DataFrame, unitCol: org.apache.spark.sql.Column,
               stratumCol: org.apache.spark.sql.Column): DataFrame = {
    val armed = df.select(unitCol.as("u"), stratumCol.cast("string").as("stratum"))
      .select(col("stratum"),
        (pmod(Pipeline.md5Hash60(col("u").cast("string")), lit(2)) === 0)
          .as("arm_a"))
    val cube = armed.groupBy(col("stratum"))
      .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm_a"), 0L).otherwise(1L)).as("n2"))
    val pooled = cube.agg(sum("n1").as("n1"), sum("n2").as("n2"))
      .withColumn("stratum", lit(null).cast("string"))
    cube.unionByName(pooled)
      .select(col("stratum"), col("n1"), col("n2"),
        expr("(n1 - n2) * (n1 - n2) * 1000000 div (n1 + n2)").as("chi2_x1e6"),
        round((col("n1") - col("n2")).cast("double")
          / sqrt((col("n1") + col("n2")).cast("double")), 6).as("z"))
  }

  /** Split-conformal prediction coverage: the distribution-free interval
    * guarantee check. md5-bucket the ids into train/calibration/test
    * (60/20/20, engine-deterministic); fit the trivial per-segment-mean
    * model on train; take q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest absolute
    * calibration residual (the finite-sample conformal quantile — TYPE-1,
    * no interpolation); report the fraction of test rows with
    * |y − ŷ| ≤ q̂, which conformal theory lower-bounds by 1−α. Residuals
    * quantize once to ×10⁶ integers, so the rank lookup
    * ([[Ranks.prefixCounts]] — no single-task sort) and the coverage
    * compare are exact. One aggregate per split + one broadcast of the
    * segment means; nothing row-scaled collects.
    */
  def conformalCoverage(df: DataFrame, idCol: Column, segCol: Column,
                        yCol: Column, alphaPct: Int = 10): DataFrame = {
    require(alphaPct > 0 && alphaPct < 100, "alphaPct in (0, 100)")
    def d38(c: Column): Column =
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val bucket = pmod(Pipeline.md5Hash60(idCol), lit(100))
    val base = df.select(segCol.as("seg"), yCol.cast("long").as("y"),
        bucket.as("b"))
      .localCheckpoint() // consumers: three split passes
    val model = base.filter(col("b") < 60).groupBy("seg")
      .agg(sum(d38(col("y"))).as("sy"), count(lit(1)).as("cy"))
      .select(col("seg"),
        (col("sy").cast("double") / col("cy").cast("double")).as("pred"))
    def residuals(split: Column): DataFrame =
      base.filter(split).join(broadcast(model), "seg")
        .select(floor(abs(col("y").cast("double") - col("pred")) * 1e6 + 0.5)
          .cast("long").as("r_q"))
    val cal = residuals(col("b") >= 60 && col("b") < 80)
      .groupBy("r_q").agg(count(lit(1)).as("c"))
      .localCheckpoint() // consumers: count + the rank pass
    val nCal = cal.agg(sum("c")).collect()(0).getLong(0)
    val rank = math.ceil((nCal + 1) * (100 - alphaPct) / 100.0).toLong
    // rank can exceed n_cal on a small calibration set: the conformal
    // convention is q-hat = +infinity (every test point covered) — a
    // sentinel row, NOT an empty frame that would annihilate the
    // cross join and report n_test = 0
    val spark2 = df.sparkSession
    import spark2.implicits._
    val qhat =
      if (rank > nCal) Seq(Long.MaxValue).toDF("qhat_q")
      else Ranks.prefixCounts(cal, "r_q", Seq("c"))
        .filter(col("c_cum") >= rank && col("c_cum") - col("c") < rank)
        .select(col("r_q").as("qhat_q"))
    val nTrain = base.filter(col("b") < 60).count()
    residuals(col("b") >= 80).crossJoin(broadcast(qhat))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("r_q") <= col("qhat_q"), 1L).otherwise(0L))
          .as("n_covered"), first("qhat_q").as("qhat_q"))
      .select(lit(nTrain).as("n_train"), lit(nCal).as("n_cal"),
        col("n_test"), col("n_covered"),
        round(col("qhat_q").cast("double") / 1e6, 6).as("q_hat"),
        round(col("n_covered").cast("double") / col("n_test").cast("double"),
          6).as("coverage"))
  }

  /** Qini / uplift-gains table: rank by uplift score descending, cut
    * into `k` tiles, and per tile report both arms' exact counts, the
    * per-tile uplift (treated − control conversion rate), and the
    * CUMULATIVE Qini value g(d) = X_t(d) − X_c(d)·N_t(d)/N_c(d) — the
    * standard evaluation of a targeting model that predicts WHO is
    * persuadable, not who converts ([[liftGains]] scores the latter).
    * Same machinery: range-bucketed global rank, exact NTILE, prefix
    * sums; Qini's single IEEE division per tile on exact cross-products.
    * Tiles whose cumulative control arm is empty report NULL.
    */
  def qini(df: DataFrame, scoreCol: Column, treatedCol: Column,
           convCol: Column, idCol: Column, k: Int = 10): DataFrame = {
    def d38(c: Column): Column =
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val base = df.select(idCol.as("id"), scoreCol.as("score"),
        treatedCol.as("t"), convCol.cast("long").as("y"))
      .localCheckpoint() // consumers: count + the rank pass
    val n = base.count()
    val tiled = Ranks.globalRank(base, -col("score"), col("id"), "rk")
      .withColumn("tile", Ranks.ntileOfRank(col("rk"), lit(n), k))
    val g = tiled.groupBy("tile").agg(
        sum(when(col("t"), 1L).otherwise(0L)).as("nt"),
        sum(when(col("t"), col("y")).otherwise(0L)).as("xt"),
        sum(when(!col("t"), 1L).otherwise(0L)).as("nc"),
        sum(when(!col("t"), col("y")).otherwise(0L)).as("xc"))
      .localCheckpoint() // Ranks deterministic-input contract, pass 2
    Ranks.prefixCounts(g, "tile", Seq("nt", "xt", "nc", "xc"))
      .select(col("tile"), col("nt"), col("xt"), col("nc"), col("xc"),
        when(col("nt") > 0 && col("nc") > 0,
          round((d38(col("xt")) * col("nc") - d38(col("xc")) * col("nt"))
            .cast("double") / (d38(col("nt")) * col("nc")).cast("double"), 6))
          .as("uplift"),
        when(col("nc_cum") > 0,
          round((d38(col("xt_cum")) * col("nc_cum")
            - d38(col("xc_cum")) * col("nt_cum")).cast("double")
            / col("nc_cum").cast("double"), 6)).as("qini_cum"))
  }

  /** Expected / maximum calibration error: the one-number summary of
    * [[calibrationBins]] — ECE = Σ (n_b/N)·|gap_b|, MCE = max |gap_b|.
    * Each bin's |gap| is the table's already-6-dp value re-quantized to
    * an exact ×10⁶ integer, so the weighted reduction is an exact
    * integer sum (order-free); MCE is a plain max. Bins-sized input —
    * nothing here scales with rows.
    */
  def ece(df: DataFrame, isPos: Column, pMilli: Column,
          bins: Int = 10): DataFrame = {
    val b = calibrationBins(df, isPos, pMilli, bins)
    b.agg(sum("n").cast("long").as("n"),
        count(lit(1)).cast("int").as("k_bins"),
        sum(col("n") * floor(col("abs_gap") * 1e6 + 0.5)).as("ece_q"),
        max(col("abs_gap")).as("mce"))
      .select(col("n"), col("k_bins"),
        round(col("ece_q").cast("double")
          / (col("n").cast("double") * 1e6), 6).as("ece"),
        col("mce"))
  }

  /** Lift / gains table: rank rows by score descending (id tie-break),
    * cut into `k` tiles (exact NTILE semantics), and per tile report the
    * positive count, rate, CUMULATIVE capture of all positives, and lift
    * over the base rate — the classic model-targeting readout ("the top
    * decile captures X% of converters at Y× base"). The global rank uses
    * [[Ranks.globalRank]] (range-bucketed, no single-task sort), the
    * tiles the exact [[Ranks.ntileOfRank]] formula, and the k-row
    * cumulative the same prefix machinery — nothing unpartitioned
    * anywhere. Rates are exact rationals taking one IEEE division each;
    * lift = (pos·N)/(n·P) stays exact until its single division.
    */
  def liftGains(df: DataFrame, scoreCol: Column, labelCol: Column,
                idCol: Column, k: Int = 10): DataFrame = {
    def d38(c: Column): Column =
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val base = df.select(idCol.as("id"), scoreCol.as("score"),
        labelCol.cast("long").as("y"))
      .localCheckpoint() // consumers: count + the rank pass
    val n = base.count()
    val tiled = Ranks.globalRank(base, -col("score"), col("id"), "rk")
      .withColumn("tile", Ranks.ntileOfRank(col("rk"), lit(n), k))
    val g = tiled.groupBy("tile")
      .agg(count(lit(1)).as("n"), sum("y").as("pos"))
      .localCheckpoint() // consumers: totals + the prefix pass
    val tot = g.agg(sum("n").cast("long").as("nn"),
      sum("pos").cast("long").as("pp"))
    Ranks.prefixCounts(g, "tile", Seq("pos"))
      .crossJoin(broadcast(tot))
      .select(col("tile"), col("n").cast("long").as("n"),
        col("pos").cast("long").as("pos"),
        round(col("pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"),
        round(col("pos_cum").cast("double") / col("pp").cast("double"), 6)
          .as("cum_capture"),
        round((d38(col("pos")) * col("nn")).cast("double")
          / (d38(col("n")) * col("pp")).cast("double"), 6).as("lift"))
  }
}
