package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the validation gate a pipeline runs
  * before publishing a table. Each rule reduces to ONE aggregation
  * returning (rule, n_violations); `run` unions the one-row results, so a
  * full rule suite costs one pass per rule with nothing collected to the
  * driver beyond the counts.
  *
  * At 100 TB: notNull/inRange are map-side partial counts (no shuffle of
  * data rows); unique ships one count-distinct sketch-shuffle; foreignKey
  * is a broadcast/shuffled anti join counting orphans.
  */
object Quality {

  def notNull(df: DataFrame, colName: String): DataFrame =
    df.agg(count(when(col(colName).isNull, 1)).as("n_violations"))
      .select(lit(s"not_null:$colName").as("rule"), col("n_violations"))

  def inRange(df: DataFrame, colName: String, loIncl: Any, hiExcl: Any): DataFrame =
    df.agg(count(when(col(colName) < lit(loIncl) || col(colName) >= lit(hiExcl)
        || col(colName).isNull, 1)).as("n_violations"))
      .select(lit(s"in_range:$colName").as("rule"), col("n_violations"))

  def unique(df: DataFrame, colName: String): DataFrame =
    df.agg((count(col(colName)) - countDistinct(col(colName))).as("n_violations"))
      .select(lit(s"unique:$colName").as("rule"), col("n_violations"))

  /** Orphan rows: values of `fkCol` absent from `dim`'s `pkCol`. */
  def foreignKey(df: DataFrame, fkCol: String, dim: DataFrame,
                 pkCol: String): DataFrame =
    df.join(dim.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(s"foreign_key:$fkCol").as("rule"), col("n_violations"))

  /** Union the one-row rule results into the validation report. */
  def run(rules: Seq[DataFrame]): DataFrame =
    rules.reduce(_ union _)

  /** Privacy audit before publishing a derived table: per
    * quasi-identifier equivalence class, the class size (k-anonymity —
    * classes smaller than `k` re-identify their members) and the number
    * of DISTINCT sensitive values (l-diversity — classes with fewer than
    * `l` reveal the sensitive attribute even when k holds). One
    * aggregation over the QI key: class sizes partial-count map-side;
    * the distinct-sensitive count shuffles (qi, sensitive) pairs once.
    * Classes are bounded by the QI domain, not the row count, so the
    * report stays small at any scale.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 k: Long, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_risk", col("class_size") < k)
      .withColumn("l_risk", col("n_sensitive") < l)
  }

  /** Distribution-drift monitor between two dataset versions: per
    * category bin, both counts and the bin's two-sample chi-square
    * contribution (o1·n2 − o2·n1)² / (n1·n2·(o1+o2)) — algebraically
    * identical to Σ(o−e)²/e with pooled expectations (expand E_i =
    * n_i·(o1+o2)/N and the N factors cancel), but the numerator and
    * denominator stay INTEGERS until one final division, so
    * the statistic hash-matches across engines (PSI/KL need per-bin
    * logs; at a fixed bin count chi-square ranks drift the same way).
    * Compare Σ contrib against χ²(bins−1) offline for a trigger.
    *
    * Scale shape: each side reduces map-side to its histogram (bins ≪
    * rows), then a bins-sized full-outer join + a broadcast of the
    * 1-row totals. Nothing row-sized ever shuffles.
    */
  def histDrift(oldDf: DataFrame, newDf: DataFrame, binCol: String): DataFrame =
    histDriftCounts(
      oldDf.groupBy(col(binCol).as("bin")).agg(count(lit(1)).as("o1")),
      newDf.groupBy(col(binCol).as("bin")).agg(count(lit(1)).as("o2")))

  /** Differentially-private category counts via the Laplace mechanism
    * with a SEEDED, engine-replayable noise draw: u from the md5 of
    * (seed | category) — 52 mantissa bits, shifted to (0,1) — and
    * noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|), the inverse-CDF Laplace
    * sample at sensitivity 1 (one row added/removed moves one count by
    * one). The deterministic seed makes a pipeline re-run publish the
    * SAME release (and lets this eval verify the mechanism end-to-end);
    * a production caller rotates the seed per release and publishes
    * `n_noisy` only — `n` is included here for the verification harness.
    * One category-sized aggregate; the noise is a per-category scalar
    * expression.
    */
  def dpNoisyCounts(df: DataFrame, catCol: String, epsilon: Double,
                    seed: String): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val m = 4503599627370496L // 2^52
    val u = (pmod(graft.ops.Pipeline.md5Hash60(
      concat(lit(seed), lit("|"), col("bin").cast("string"))), lit(m))
      .cast("double") + 0.5) / m.toDouble
    val cdev = u - 0.5
    val noise = (-lit(1.0 / epsilon)) * signum(cdev) *
      log(lit(1d) - lit(2d) * abs(cdev))
    df.groupBy(col(catCol).as("bin")).agg(count(lit(1)).as("n"))
      .withColumn("noise", round(floor(noise * 1e6 + 0.5) / 1e6, 6))
      .select(col("bin"), col("n"),
        col("noise"),
        round(col("n") + col("noise"), 6).as("n_noisy"),
        lit(epsilon).as("epsilon"))
  }

  /** Population Stability Index between two cohorts over a caller-chosen
    * bin column — the standard model-monitoring drift score
    * PSI = Σ (p_i − q_i)·ln(p_i/q_i). One aggregate per side (the raw
    * rows are scanned once each), then a bins-sized full-outer join.
    * Each bin term multiplies the EXACT decimal cross-product difference
    * (o1·n2 − o2·n1 = (p−q)·n1·n2) by ln of the same exact rational,
    * quantized once to 1e12 fixed point; the reduction is an exact
    * decimal sum — order-free, bit-stable under any partitioning. Bins
    * empty on either side have an undefined log ratio: they are COUNTED
    * (`k_zero`) but excluded from the sum, the conventional alternative
    * to smoothing (callers who want smoothing pre-add pseudo-counts to
    * the histograms and call [[psiCounts]]).
    */
  def psi(a: DataFrame, b: DataFrame, binCol: String): DataFrame =
    psiCounts(
      a.groupBy(col(binCol).as("bin")).agg(count(lit(1)).as("o1")),
      b.groupBy(col(binCol).as("bin")).agg(count(lit(1)).as("o2")))

  /** [[psi]] over pre-aggregated `(bin, o1)` / `(bin, o2)` histograms. */
  def psiCounts(h1: DataFrame, h2: DataFrame): DataFrame = {
    val j = joinedCounts(h1, h2)
    val n12 = col("n1") * col("n2") // decimal: totals are summed as d38
    val live = col("o1") > 0 && col("o2") > 0
    j.agg(count(lit(1)).cast("int").as("k_bins"),
        sum(when(!live, 1)).cast("int").as("k_zero"),
        first(col("n1")).cast("long").as("n_a"),
        first(col("n2")).cast("long").as("n_b"),
        sum(when(live, (col("o1") * col("n2") - col("o2") * col("n1")) *
          qln(col("o1") * col("n2"), col("o2") * col("n1")))).as("psi_q"),
        first(n12).as("n12"))
      .select(col("k_bins"), coalesce(col("k_zero"), lit(0)).as("k_zero"),
        col("n_a"), col("n_b"),
        round(coalesce(col("psi_q"), lit(0)).cast("double")
          / (col("n12").cast("double") * 1e12), 6).as("psi"))
  }

  /** Distribution-drift panel between two cohorts of one categorical
    * column: total variation distance, the two-sample χ² statistic,
    * Jensen–Shannon divergence (nats), and Hellinger distance in ONE
    * bins-sized reduce over the same exact cross-product machinery as
    * [[psi]] — TVD and JSD fold exact decimal terms (JSD log args are
    * exact rationals, quantized once to 1e12); χ² and the Hellinger
    * affinity take one IEEE combination per bin, quantized to fixed
    * point so their sums stay order-free. Zero-count JSD terms are
    * exactly 0 by definition (x·ln x → 0), so NO bins are excluded.
    */
  def categoricalDrift(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    val j = joinedCounts(
      a.groupBy(col(catCol).as("bin")).agg(count(lit(1)).as("o1")),
      b.groupBy(col(catCol).as("bin")).agg(count(lit(1)).as("o2")))
    val dlt = col("o1") * col("n2") - col("o2") * col("n1")
    val mix = col("o1") * col("n2") + col("o2") * col("n1")
    // χ²_j = dlt²/(n1·n2·(o1+o2)) — the pooled-expectation identity with
    // the N factors cancelled; dlt squared IN DOUBLE (a d38 square would
    // overflow 38 digits once the per-side totals pass ~1e9.5 rows);
    // both engines share the shape
    val chi2Term = dlt.cast("double") * dlt.cast("double") /
      (col("n1") * col("n2") * (col("o1") + col("o2"))).cast("double")
    val hellTerm = sqrt((col("o1") * col("o2")).cast("double") /
      (col("n1") * col("n2")).cast("double"))
    j.agg(count(lit(1)).cast("int").as("k_bins"),
        first(col("n1")).cast("long").as("n_a"),
        first(col("n2")).cast("long").as("n_b"),
        sum(abs(dlt)).as("tvd_num"),
        sum(floor(chi2Term * 1e6 + 0.5)).cast("long").as("chi2_q"),
        sum(when(col("o1") > 0,
            col("o1") * col("n2") * qln(lit(2) * col("o1") * col("n2"), mix))
            .otherwise(lit(0))
          + when(col("o2") > 0,
            col("o2") * col("n1") * qln(lit(2) * col("o2") * col("n1"), mix))
            .otherwise(lit(0))).as("jsd_q"),
        sum(floor(hellTerm * 1e12 + 0.5)).cast("long").as("hell_q"),
        first(col("n1") * col("n2")).as("n12"))
      .select(col("k_bins"), col("n_a"), col("n_b"),
        round(col("tvd_num").cast("double")
          / (col("n12").cast("double") * 2d), 6).as("tvd"),
        round(col("chi2_q").cast("double") / 1e6, 6).as("chi2"),
        round(col("jsd_q").cast("double")
          / (col("n12").cast("double") * 2e12), 6).as("jsd_nats"),
        round(sqrt(greatest(lit(0d),
          lit(1d) - col("hell_q").cast("double") / 1e12)), 6).as("hellinger"))
  }

  /** Shared drift plumbing: full-outer bin join with zero-filled counts
    * as exact decimals plus broadcast d38 totals `n1`, `n2`.
    */
  private def joinedCounts(h1: DataFrame, h2: DataFrame): DataFrame = {
    def d38(c: Column): Column =
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val j = h1.join(h2, Seq("bin"), "full_outer")
      .select(col("bin"), d38(coalesce(col("o1"), lit(0L))).as("o1"),
        d38(coalesce(col("o2"), lit(0L))).as("o2"))
    val tot = j.agg(sum("o1").as("n1"), sum("o2").as("n2"))
    j.crossJoin(broadcast(tot))
  }

  /** See [[Exact.qln12]] — one shared definition of the grain. */
  private def qln(num: Column, den: Column): Column = Exact.qln12(num, den)

  /** [[histDrift]] over PRE-AGGREGATED histograms `(bin, o1)` / `(bin,
    * o2)` — for counts that already exist (a streaming aggregation's
    * state, a stored profile) so the raw rows are never re-scanned.
    */
  def histDriftCounts(h1: DataFrame, h2: DataFrame): DataFrame = {
    val j = h1.join(h2, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("o1"), lit(0L)).as("o1"),
        coalesce(col("o2"), lit(0L)).as("o2"))
    val tot = j.agg(sum("o1").as("n1"), sum("o2").as("n2"))
    val dlt = col("o1") * col("n2") - col("o2") * col("n1")
    j.crossJoin(broadcast(tot))
      .select(col("bin"), col("o1").cast("int").as("o1"),
        col("o2").cast("int").as("o2"),
        round((dlt * dlt).cast("double") /
            (col("n1") * col("n2") * (col("o1") + col("o2"))).cast("double"),
          6).as("contrib"))
  }
}
