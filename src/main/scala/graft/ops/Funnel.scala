package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Ordered n-step funnel over an event stream: for each user, step 1 is
  * their earliest step-1 event; step i is their earliest step-i event
  * STRICTLY AFTER step i-1 (optionally within `withinMicros` of it).
  * Returns one row per user who completed step 1, with nullable epoch-
  * micros columns t1..tn — the conversion analysis every event pipeline
  * runs.
  *
  * Scale shape: one filtered aggregation plus one join per step, ALL
  * keyed on the user column, so every exchange reuses the same hash
  * partitioning; the accumulator narrows to one row per step-1 user
  * after the first aggregation and each step's filter prunes the event
  * scan to that step's type.
  */
object Funnel {

  def funnel(events: DataFrame, steps: Seq[String],
             typeCol: String = "event_type", userCol: String = "user_id",
             tsCol: String = "ts",
             withinMicros: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel requires at least one step")
    val tsm = events.schema(tsCol).dataType match {
      case TimestampType => unix_micros(col(tsCol))
      // session TZ applies symmetrically; wall-clock order preserved
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType))
      case _ => col(tsCol).cast("long")
    }
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      tsm.as("tsm"))
    var acc = ev.filter(col("et") === steps.head)
      .groupBy("u").agg(min("tsm").as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val step = ev.filter(col("et") === s).select(col("u"), col("tsm").as("ts_s"))
      val inWindow = withinMicros
        .map(wm => col("ts_s") <= col(prev) + wm)
        .getOrElse(lit(true))
      acc = acc.join(step, Seq("u"), "left")
        .withColumn("ts_ok", when(col("ts_s") > col(prev) && inWindow, col("ts_s")))
        .groupBy(col("u") +: (1 to i).map(j => col(s"t$j")): _*)
        .agg(min("ts_ok").as(cur))
    }
    acc.withColumnRenamed("u", userCol)
  }

  /** Step-by-step conversion counts from a `funnel` result: one row per
    * step with the number of users whose tN is non-null.
    */
  def conversions(funnelDf: DataFrame, steps: Seq[String]): DataFrame = {
    val counts = steps.indices.map(i => count(col(s"t${i + 1}")).as(s"n${i + 1}"))
    val wide = funnelDf.agg(counts.head, counts.tail: _*)
    val stackArgs = steps.zipWithIndex
      .map { case (s, i) => s"${i + 1}, '$s', n${i + 1}" }.mkString(", ")
    wide.selectExpr(
      s"stack(${steps.size}, $stackArgs) as (step, step_name, n_users)")
  }

  /** Markov removal-effect attribution (Anderl et al.): build the
    * first-order journey chain (start → touchpoints → conv/null,
    * truncated at the first conversion), compute the absorbing
    * conversion probability, then for each channel REMOVE it (its
    * incoming traffic is lost to null) and re-solve — a channel's
    * attribution is how much total conversion collapses without it,
    * normalized over channels. The principled alternative to last-touch
    * ([[graft.Queries]] `q_attribution_lasttouch`).
    *
    * Exactness/replayability: the chain solve is `iters` rounds of
    * p(s) ← ⌊Σ_t n(s→t)·p(t) / n(s)⌋ in ×10⁶ integer fixed point —
    * truncating division once per state per round, so any engine
    * replays the identical integers (a recursive CTE does). Removal
    * effects 10⁶ − ⌊p₋c·10⁶/p_all⌋ stay integers; only the share takes
    * an IEEE division.
    *
    * Scale shape: journeys reduce to the (cur,next)-cell table in one
    * pass (two partitioned windows + one aggregate); the chain solve
    * runs driver-side on that ≤ (states+1)² cell table — bounded by the
    * event-type domain, never by rows.
    */
  /** Shared journey plumbing: per-user event index, first-conversion
    * position, and the journey truncated at (and including) the first
    * conversion. Columns: u, t, idx, fp (null = never converted).
    */
  private def journeys(events: DataFrame, userCol: String, tsCol: String,
                       tieCol: String, typeCol: String,
                       convType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("u").orderBy("ts", "tie")
    val seq0 = events.select(col(userCol).as("u"), col(typeCol).as("t"),
        col(tsCol).as("ts"), col(tieCol).as("tie"))
      .withColumn("idx", row_number().over(w))
    val fp = seq0.filter(col("t") === convType)
      .groupBy("u").agg(min("idx").as("fp"))
    seq0.join(fp, Seq("u"), "left")
      .filter(col("fp").isNull || col("idx") <= col("fp"))
  }

  def removalEffectAttribution(events: DataFrame, userCol: String,
                               tsCol: String, tieCol: String,
                               typeCol: String, convType: String,
                               iters: Int = 60): DataFrame = {
    val spark = events.sparkSession
    import org.apache.spark.sql.expressions.Window
    val kept = journeys(events, userCol, tsCol, tieCol, typeCol, convType)
    val kw = Window.partitionBy("u").orderBy("idx")
    def mapTo(c: Column): Column =
      when(c === convType, "conv").otherwise(c)
    val step = kept.withColumn("nxt0", lead("t", 1).over(kw))
    val mids = step.filter(col("t") =!= convType)
      .select(col("t").as("cur"),
        coalesce(mapTo(col("nxt0")), lit("null")).as("nxt"))
    val starts = step.filter(col("idx") === 1)
      .select(lit("start").as("cur"), mapTo(col("t")).as("nxt"))
    // BOUNDED collect: one cell per (state+1)² of the event-type domain
    val cells = mids.union(starts).groupBy("cur", "nxt")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val tn = cells.groupBy(_._1).map { case (s, cs) => s -> cs.map(_._3).sum }
    val channels = cells.map(_._2).filter(t => t != "conv" && t != "null")
      .distinct.sorted
    val byCur = cells.groupBy(_._1) // one index, not a scan per state/iter
    def solve(removed: Option[String]): Long = {
      val states = tn.keys.toSeq
      var p = states.map(_ -> 0L).toMap
      for (_ <- 1 to iters) {
        p = states.map { s =>
          // BigInt accumulate: n·p can graze Long range at 100 TB counts
          val num = byCur(s).map { case (_, t, n) =>
            val pv =
              if (t == "conv") 1000000L
              else if (t == "null" || removed.contains(t)) 0L
              else p.getOrElse(t, 0L)
            BigInt(n) * pv
          }.sum
          s -> (num / tn(s)).toLong
        }.toMap
      }
      p.getOrElse("start", 0L)
    }
    val pAll = solve(None)
    val rows = channels.map { c =>
      val pc = solve(Some(c))
      val effQ = 1000000L - pc * 1000000L / math.max(pAll, 1L)
      (c, pc, effQ)
    }
    val effSum = rows.map(_._3).sum
    import spark.implicits._
    rows.toSeq.toDF("channel", "p_q", "eff_q")
      .select(col("channel"),
        round(lit(pAll).cast("double") / 1e6, 6).as("p_conv_all"),
        round(col("p_q").cast("double") / 1e6, 6).as("p_conv_without"),
        round(col("eff_q").cast("double") / 1e6, 6).as("removal_effect"),
        (if (effSum == 0L) lit(0d) // no collapse anywhere → zero shares
         else round(col("eff_q").cast("double") / effSum.toDouble, 6))
          .as("attribution_share"))
  }

  /** Exact Shapley-value attribution over journey CHANNEL SETS with the
    * cumulative-worth coalition function v(S) = CONVERSIONS from
    * journeys whose touched-channel set ⊆ S (a subset-sum zeta transform
    * of the exact-set counts — monotone, so every φ ≥ 0, and efficiency
    * gives Σφ = v(C) − v(∅) = exactly the touch-attributable
    * conversions). Each channel's credit is the textbook Shapley average
    * φ_c = Σ_{S ⊆ C∖c} |S|!·(|C|−|S|−1)!/|C|! · (v(S∪c) − v(S)) — the
    * order-free axiom-clean attribution the removal-effect chain
    * approximates. EXACT end to end: integer conversion counts, BigInt
    * factorial weights; one IEEE division per output row.
    *
    * Scale shape: journeys reduce to per-SET (n, x) cells in one pass;
    * the Shapley sum runs driver-side over all 2^|C| subsets — bounded
    * by the CHANNEL DOMAIN (≤ `maxChannels`, default 12 → 4096 subsets),
    * never by rows.
    */
  def shapleyAttribution(events: DataFrame, userCol: String, tsCol: String,
                         tieCol: String, typeCol: String, convType: String,
                         maxChannels: Int = 12): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val kept = journeys(events, userCol, tsCol, tieCol, typeCol, convType)
      .localCheckpoint() // consumers: the set aggregate + the user list
    val sets = kept.filter(col("t") =!= convType)
      .groupBy("u").agg(sort_array(collect_set(col("t"))).as("chs"))
    val usr = kept.groupBy("u").agg(max(col("fp")).isNotNull.as("conv"))
    // BOUNDED collect: one cell per observed channel SET (≤ 2^|C|)
    val cells = usr.join(sets, Seq("u"), "left")
      .select(coalesce(col("chs"), array()).as("chs"), col("conv"))
      .groupBy("chs").agg(count(lit(1)).as("n"),
        sum(when(col("conv"), 1L).otherwise(0L)).as("x"))
      .collect()
      .map(r => (r.getSeq[String](0), r.getLong(1), r.getLong(2)))
    val channels = cells.flatMap(_._1).distinct.sorted
    val nc = channels.length
    require(nc >= 1 && nc <= maxChannels,
      s"shapleyAttribution: $nc channels (bound $maxChannels) — the " +
        "2^|C| subset sweep needs a bounded channel domain")
    val bit = channels.zipWithIndex.toMap
    val vq = new Array[Long](1 << nc) // exact-set conversion counts…
    cells.foreach { case (chs, _, x) =>
      val m = chs.map(bit).foldLeft(0)((a, b) => a | (1 << b))
      vq(m) = x
    }
    // …zeta-transformed in place to the cumulative worth v(S) = Σ_{T⊆S} x_T
    for (i <- 0 until nc; m <- vq.indices)
      if ((m & (1 << i)) != 0) vq(m) += vq(m ^ (1 << i))
    val fact = (1 to nc).scanLeft(BigInt(1))(_ * _) // fact(k) = k!, k = 0..nc
    def phiNum(c: Int): BigInt = {
      var s = BigInt(0)
      val b = 1 << bit(channels(c))
      var m = 0
      while (m < vq.length) {
        if ((m & b) == 0) {
          val k = Integer.bitCount(m)
          s += fact(k) * fact(nc - k - 1) * (vq(m | b) - vq(m))
        }
        m += 1
      }
      s
    }
    val nums = channels.indices.map(phiNum)
    val den = fact(nc).toDouble
    val tot = nums.sum.toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    channels.zip(nums).map { case (c, n) =>
      // tot = 0 ⇔ no touch-attributable conversions at all — every
      // share is 0 by definition, not NaN
      (c, r6(n.toDouble / den), if (tot == 0d) 0d else r6(n.toDouble / tot))
    }.toSeq.toDF("channel", "shapley", "share")
  }
}
