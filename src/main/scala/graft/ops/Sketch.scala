package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed sketches with DETERMINISTIC (md5-seeded) hash families, so
  * estimates are reproducible across engines, partitionings and re-runs —
  * the property that makes them oracle-checkable and, at 100 TB, makes two
  * runs of the same curation job agree.
  *
  *  - Count-min sketch: a fixed `depth × width` grid of EXACT integer cell
  *    counts (the only shuffle ships (r, bucket) keys — the sketch itself
  *    is ~KB regardless of corpus size); point estimates never
  *    under-count.
  *  - KMV (bottom-k) signatures: per key, the k smallest distinct 60-bit
  *    token hashes — a fixed-size set synopsis whose pairwise Jaccard
  *    estimate needs only the two signatures, never the raw sets.
  */
object Sketch {

  private def bucketOf(r: Column, tok: Column, width: Int): Column =
    pmod(Pipeline.md5Hash60(concat(r.cast("string"), lit("|"), tok)), lit(width))

  /** One row per occupied cell: (r, bucket, c). `df` carries one row per
    * token OCCURRENCE. Map-side partial aggregation collapses each input
    * partition to ≤ depth×width rows before the (tiny) shuffle.
    */
  def cmsCells(df: DataFrame, tokenCol: String,
               depth: Int = 4, width: Int = 256): DataFrame =
    df.select(col(tokenCol).as("tok"),
        explode(lit((0 until depth).toArray)).as("r"))
      .select(col("r"), bucketOf(col("r"), col("tok"), width).as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("c"))

  /** Point-estimate counts for `candidates` (one row per token in column
    * `tokenCol`): min over the depth rows of the candidate's cell — the
    * classic CMS upper-bound estimate. The cells side is sketch-sized, so
    * it broadcasts.
    */
  def cmsEstimate(cells: DataFrame, candidates: DataFrame, tokenCol: String,
                  depth: Int = 4, width: Int = 256): DataFrame =
    candidates.select(col("*"), explode(lit((0 until depth).toArray)).as("r"))
      .withColumn("bucket", bucketOf(col("r"), col(tokenCol), width))
      .join(broadcast(cells), Seq("r", "bucket"), "left")
      .groupBy(candidates.columns.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("n_est"))

  /** Per-key KMV signature: the k smallest DISTINCT md5-60bit hashes of
    * the token column, as a sorted array. `WindowGroupLimit` forwards at
    * most k rows per key from each input partition, so the shuffle carries
    * O(keys × k × partitions), not the vocabulary.
    */
  def bottomKSignatures(df: DataFrame, keyCol: String, tokenCol: String,
                        k: Int = 128): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy("h")
    df.select(col(keyCol), Pipeline.md5Hash60(col(tokenCol)).as("h")).distinct()
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .groupBy(keyCol).agg(sort_array(collect_list("h")).as("sig"))
  }

  /** Distinct-count estimate from a KMV signature: with h uniform on
    * [0, 2^60), the k-th smallest distinct hash h_k estimates cardinality
    * as `(k-1) · 2^60 / h_k` — the deterministic (md5) alternative to
    * HLL: same one-pass, fixed-size-synopsis shape, but reproducible
    * across engines, so it hash-checks. Signatures shorter than k (small
    * sets) fall back to their exact size.
    */
  def kmvDistinct(sigs: DataFrame, keyCol: String, k: Int = 128): DataFrame =
    sigs.select(col(keyCol),
      when(size(col("sig")) < k, size(col("sig")).cast("double"))
        .otherwise(round(lit((k - 1).toDouble) * lit(1.152921504606846976e18)
          / element_at(col("sig"), k), 6))
        .as("est_distinct"))

  /** Deterministic hash-reservoir quantile sketch: per key, the k rows
    * with the smallest md5(idCol) form a uniform sample that is
    * MERGEABLE (the k smallest of a union are the k smallest of the
    * merged per-part k-smallest sets — the KMV property, applied to row
    * selection instead of distinct hashes) and reproducible, so the
    * estimate hash-checks across engines. Quantile q reads the sorted
    * sample at index floor(q·(n-1)) — the lower-value rule, no
    * interpolation, hence no float arithmetic to drift. The plan is the
    * KMV shape: map-side WindowGroupLimit keeps ≤ k rows per partition
    * before the per-key shuffle, so sketch cost is keys × k, not rows.
    * `idCol` should be unique per row (it is the sampling key); if ids
    * repeat, the (hash, value) order still makes the selection
    * deterministic, though no longer uniform over rows.
    */
  def quantileSketch(df: DataFrame, keyCol: String, valueCol: String,
                     idCol: String, k: Int = 64,
                     qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy("u", "v")
    val sample = df.select(col(keyCol), col(valueCol).cast("double").as("v"),
        md5(col(idCol).cast("string")).as("u"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy(keyCol).agg(sort_array(collect_list("v")).as("vals"))
    val qcols = qs.map { q =>
      element_at(col("vals"),
        (floor(lit(q) * (size(col("vals")) - 1)) + 1).cast("int"))
        .as(s"p${(q * 100).round}")
    }
    sample.select(col(keyCol) +: qcols: _*)
  }

  /** Pairwise Jaccard estimates from KMV signatures: for each key pair,
    * take the k smallest of the union of the two signatures and count how
    * many appear in both — `|tk ∩ A_k ∩ B_k| / k`. The join is over
    * signature rows (one per key), so cost is pairs × k, independent of
    * corpus size.
    */
  def kmvJaccard(sigs: DataFrame, keyCol: String, k: Int = 128): DataFrame = {
    val a = sigs.select(col(keyCol).as("key_a"), col("sig").as("sig_a"))
    val b = sigs.select(col(keyCol).as("key_b"), col("sig").as("sig_b"))
    a.join(b, col("key_a") < col("key_b"))
      .withColumn("tk",
        slice(array_sort(array_distinct(concat(col("sig_a"), col("sig_b")))), 1, k))
      .select(col("key_a"), col("key_b"),
        round(size(array_intersect(array_intersect(col("tk"), col("sig_a")),
          col("sig_b"))).cast("double") / lit(k), 6).as("est_jaccard"))
  }

  /** Pairwise CONTAINMENT estimates from KMV signatures: for each ordered
    * key pair (a, b), `C(a,b) = |tk ∩ A ∩ B| / |tk ∩ A|` where tk is the
    * k smallest of the union of the two signatures — the asymmetric
    * "fraction of a inside b" that Jaccard hides (a small doc wholly
    * quoted by a large one has high containment but low Jaccard, the
    * subset-duplication case a dedup pipeline must see). Same
    * signature-pair cost model as kmvJaccard: pairs × k, independent of
    * corpus size. Keys whose tk∩A is empty report null.
    */
  def kmvContainment(sigs: DataFrame, keyCol: String, k: Int = 128): DataFrame = {
    val a = sigs.select(col(keyCol).as("key_a"), col("sig").as("sig_a"))
    val b = sigs.select(col(keyCol).as("key_b"), col("sig").as("sig_b"))
    a.join(b, col("key_a") =!= col("key_b"))
      .withColumn("tk",
        slice(array_sort(array_distinct(concat(col("sig_a"), col("sig_b")))), 1, k))
      .withColumn("tka", array_intersect(col("tk"), col("sig_a")))
      .select(col("key_a"), col("key_b"),
        when(size(col("tka")) > 0,
          round(size(array_intersect(col("tka"), col("sig_b"))).cast("double")
            / size(col("tka")), 6)).as("est_containment"))
  }

  /** `(60 - log2 m) + 1`: the rho of an all-zero word, i.e. one past the
    * bit width of the hash remainder after the register index is split
    * off. 55 for the default m=64.
    */
  def hllShift(m: Int): Int = 61 - java.lang.Integer.numberOfTrailingZeros(m)

  /** The standard bias-correction constant alpha_m (Flajolet et al.
    * 2007, Fig. 3).
    */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1 + 1.079 / m)
  }

  /** HyperLogLog registers over the deterministic md5 hash family
    * (Flajolet et al. 2007): the 60-bit hash splits into a register index
    * `j = h mod m` and a (60 − log2 m)-bit word `w = h div m`; the
    * register keeps the max of `rho(w)` = position of w's leftmost 1-bit
    * in that window (all-zeros → hllShift(m)). `rho` is computed with
    * INTEGER/string ops only (`hllShift(m) - len(bin(w) minus leading
    * zeros)`), no log2, so any engine reproduces the registers
    * bit-for-bit. `max` is idempotent and order-free: map-side partial
    * aggregation collapses each input partition to ≤ keys×m rows before
    * the (tiny) shuffle, and two register frames for disjoint corpora
    * merge by the same groupBy — the mergeability HLL is used for at
    * 100 TB.
    */
  def hllRegisters(df: DataFrame, keyCol: String, tokenCol: String,
                   m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    df.select(col(keyCol), Pipeline.md5Hash60(col(tokenCol)).as("h"))
      .select(col(keyCol), pmod(col("h"), lit(m)).as("j"),
        expr(s"h div $m").as("w"))
      .withColumn("rho",
        lit(hllShift(m)) - length(expr("trim(LEADING '0' FROM bin(w))")))
      .groupBy(col(keyCol), col("j")).agg(max(col("rho")).as("mj"))
  }

  /** Linear-counting table `m·ln(m/V)` for V = 1..m zero registers —
    * the HLL small-range correction, quantized ONCE here (same
    * discipline as the NDCG discounts: the transcendental is evaluated
    * driver-side and shipped as literals, so both engines read identical
    * doubles and no ln runs at query time).
    */
  def hllLcTable(m: Int): Seq[Double] =
    (1 to m).map(v => m * math.log(m.toDouble / v))

  /** HLL estimate from a register frame: `alpha_m · m² / Σ 2^(-M_j)`,
    * with the harmonic sum kept EXACT — each register contributes the
    * integer `2^(hllShift(m)-M_j)` (absent registers contribute the full
    * `2^hllShift(m)`), summed as BIGINT, so the only float ops are the
    * constant product and one final division, reproducible in any
    * engine. Below the classic `2.5m` small-range threshold with empty
    * registers present, the estimate switches to linear counting via the
    * quantized `hllLcTable` lookup — accurate in both regimes, still
    * hash-identical across engines.
    */
  def hllEstimate(regs: DataFrame, keyCol: String, m: Int = 64): DataFrame = {
    val shift = hllShift(m)
    val twoShift = 1L << shift
    val lcArr = array(hllLcTable(m).map(lit): _*)
    regs.groupBy(keyCol)
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $shift - mj)")).as("sp"),
        count(lit(1)).as("np"))
      .withColumn("raw",
        lit(hllAlpha(m)) * lit(m.toDouble * m) * lit(twoShift.toDouble)
          / (col("sp") + (lit(m.toLong) - col("np")) * lit(twoShift)))
      .withColumn("v", lit(m) - col("np"))
      .select(col(keyCol),
        // classic small-range rule: below 2.5m with empty registers,
        // linear counting beats the raw harmonic estimate
        round(when(col("v") > 0 && col("raw") <= lit(2.5 * m),
            element_at(lcArr, col("v").cast("int")))
          .otherwise(col("raw")), 6).as("est_distinct"))
  }

  /** Equi-join SIZE estimate from KMV synopses — what a planner (or a
    * cost gate before an expensive join) wants without touching the
    * data twice: per side, the KMV distinct estimate d̂ and row count n;
    * the key-overlap estimate Î = Ĵ·(d̂a+d̂b)/(1+Ĵ) from the pairwise
    * Jaccard identity; then |A⋈B| ≈ Î · (na/d̂a) · (nb/d̂b) under
    * per-key uniformity. Everything reuses the deterministic md5
    * synopses, so the estimate is engine-reproducible; the exact join
    * size Σ_k c_a(k)·c_b(k) rides along (counts-only join, no payload)
    * with the relative error.
    *
    * Scale shape: two KMV passes (map-side WindowGroupLimit, k rows per
    * side survive), one counts-only aggregation per side for n, and the
    * exact companion is a frequency-vector join — never the row payload.
    *
    * Contract: meaningful when BOTH sides carry ≥ k distinct keys —
    * below that the Jaccard synopsis divides by k regardless (the
    * kmvJaccard small-set behavior) and the overlap estimate biases
    * low. Tiny inputs should drop k accordingly.
    */
  def kmvJoinSize(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
                  k: Int = 128): DataFrame = {
    val sides = a.select(col(aKey).as("tok")).withColumn("side", lit("a"))
      .unionByName(b.select(col(bKey).as("tok")).withColumn("side", lit("b")))
    val counts = sides.groupBy("side").agg(count(lit(1)).as("n"))
    val sigs = bottomKSignatures(sides, "side", "tok", k)
    val d = kmvDistinct(sigs, "side", k)
    val exact = a.groupBy(col(aKey).as("kk")).agg(count(lit(1)).as("ca"))
      .join(b.groupBy(col(bKey).as("kk")).agg(count(lit(1)).as("cb")), "kk")
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("n_exact"))
    val est = round(
      col("ej") * (col("da") + col("db")) / (lit(1.0) + col("ej"))
        * (col("na").cast("double") / col("da"))
        * (col("nb").cast("double") / col("db")), 6)
    counts.filter(col("side") === "a").select(col("n").as("na"))
      .crossJoin(counts.filter(col("side") === "b").select(col("n").as("nb")))
      .crossJoin(d.filter(col("side") === "a").select(col("est_distinct").as("da")))
      .crossJoin(d.filter(col("side") === "b").select(col("est_distinct").as("db")))
      .crossJoin(kmvJaccard(sigs, "side", k).select(col("est_jaccard").as("ej")))
      .crossJoin(exact)
      .select(est.as("est_join"), col("n_exact"),
        round((est - col("n_exact")) / col("n_exact"), 6).as("rel_err"))
  }

  /** Bloom-filter false-positive eval with an ENGINE-NEUTRAL bloom:
    * k md5-derived bit positions per key (`md5("b<i>|" + key) mod m` —
    * the [[Pipeline.md5Hash60]] construction, so any engine replays the
    * exact bit set), membership = all k positions set. Builds the bits
    * from `build`'s keys, probes `probe`'s distinct keys, and scores
    * the bloom against the exact semi-join truth: pass/true/false-
    * positive counts, the observed FPP among true non-members, and the
    * fill factor. This is the measurement behind choosing m and k for
    * [[Pipeline.bloomSemiJoin]]-style prefilters at scale.
    * Scale shape: bits ≤ m rows; the probe explodes k rows per key and
    * joins the (broadcastable) bit set; truth is one semi join.
    */
  def bloomFppEval(build: DataFrame, probe: DataFrame, buildKey: Column,
                   probeKey: Column, m: Int, k: Int = 4): DataFrame = {
    require(m > 0 && k > 0 && k <= 8, "need m > 0 and 1 <= k <= 8")
    val spark = build.sparkSession
    import spark.implicits._
    def positions(keys: DataFrame): DataFrame =
      keys.crossJoin((0 until k).toDF("i"))
        .select(col("key"), col("i"), pmod(Pipeline.md5Hash60(
          concat(lit("b"), col("i"), lit("|"), col("key").cast("string"))),
          lit(m.toLong)).as("pos"))
    val a = build.select(buildKey.as("key")).distinct()
      .localCheckpoint() // consumers: bits + the exact-truth semi join
    val b = probe.select(probeKey.as("key")).distinct()
      .localCheckpoint() // consumers: probe explode + truth + count
    val bits = positions(a).select("pos").distinct()
      .localCheckpoint() // consumers: fill count + the probe join
    val pass = positions(b).join(bits, "pos")
      .groupBy("key").agg(count(lit(1)).as("hits"))
      .filter(col("hits") === k).select("key")
    val truth = b.join(a, Seq("key"), "left_semi")
    val counts = a.agg(count(lit(1)).as("n_build"))
      .crossJoin(b.agg(count(lit(1)).as("n_probe")))
      .crossJoin(truth.agg(count(lit(1)).as("n_true")))
      .crossJoin(pass.agg(count(lit(1)).as("n_pass")))
      .crossJoin(bits.agg(count(lit(1)).as("bits_set")))
    counts.select(col("n_build"), col("n_probe"), col("n_true"),
      col("n_pass"), (col("n_pass") - col("n_true")).as("n_false_pos"),
      // NULL when every probe is a member (no non-member to false-flag;
      // an ANSI 0-divide would abort)
      when(col("n_probe") > col("n_true"),
        round((col("n_pass") - col("n_true")).cast("double")
          / (col("n_probe") - col("n_true")).cast("double"), 6))
        .as("fpp_observed"),
      lit(m).as("m"), lit(k).as("k"),
      round(col("bits_set").cast("double") / m.toDouble, 6).as("fill"))
  }
}
