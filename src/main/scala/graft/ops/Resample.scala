package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: bucket an event stream onto a fixed-step grid,
  * materialize the missing buckets (the "spine"), and forward-fill gaps —
  * the alignment step before any windowed feature or rate computation.
  *
  * Scale shape: ONE shuffle on the key. The per-key min/max aggregation,
  * the spine explode, the left join back to the observed buckets, and the
  * forward-fill window all hash-partition on the same key column, so
  * Catalyst reuses a single exchange. The spine is generated per key with
  * `sequence()` — row fan-out is (key's time span / step), never a global
  * cross join against a calendar table.
  */
object Resample {

  /** Per-key counts on an hourly grid over each key's observed [min, max]
    * hour span, with nulls (empty buckets) and a forward-filled copy.
    * Output: key, h, n (null on gaps), n_fill (last seen count).
    */
  def hourlyCountsFilled(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val h = date_trunc("hour", col(tsCol))
    val observed = df.groupBy(col(keyCol), h.as("h")).agg(count(lit(1)).as("n"))
    val spine = observed.groupBy(keyCol)
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col(keyCol),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
    val w = Window.partitionBy(keyCol).orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(observed, Seq(keyCol, "h"), "left")
      .select(col(keyCol), col("h"), col("n"),
        last("n", ignoreNulls = true).over(w).as("n_fill"))
  }

  /** Throttle/rate-limit dedup: per key, keep an event iff it is at least
    * `minGapMicros` after the PREVIOUSLY KEPT event (the first event of a
    * key is always kept). This is the data-dependent recursion window
    * functions cannot express — whether an event is kept depends on which
    * earlier events were kept, not on any fixed frame — so it runs as the
    * classic secondary-sort fold: repartition on the key columns,
    * sortWithinPartitions on (key, ts, tie-break), then one O(1)-state
    * linear pass per partition. (Gap-based sessionize-and-keep-first is
    * the DIFFERENT semantics: a dense burst longer than the gap suppresses
    * everything after its head, while throttle re-emits every minGap.)
    *
    * Scale shape: one shuffle on the key, an in-partition sort, a narrow
    * fold — the same cost class as any windowed pass, with no per-key
    * materialization (a million-event key streams through). Input rows
    * must carry `tsMicrosCol` (already an integer micros column) and a
    * unique `tieCol` for a total order.
    */
  def throttleEvents(df: DataFrame, keyCols: Seq[String], tsMicrosCol: String,
                     tieCol: String, minGapMicros: Long): DataFrame = {
    val cols = df.columns
    val ki = keyCols.map(k => cols.indexOf(k))
    val ti = cols.indexOf(tsMicrosCol)
    require(ki.forall(_ >= 0) && ti >= 0, "key/ts columns must exist")
    val tsField = df.schema(tsMicrosCol)
    require(tsField.dataType == org.apache.spark.sql.types.LongType,
      s"tsMicrosCol '$tsMicrosCol' must be LongType (integer micros), " +
        s"got ${tsField.dataType.simpleString}")
    val sorted = df.repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols :+ tsMicrosCol :+ tieCol).map(col): _*)
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    sorted.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      var lastKept = Long.MinValue
      rows.filter { r =>
        val k = ki.map(r.get)
        if (r.isNullAt(ti)) throw new IllegalArgumentException(
          s"throttleEvents: null in ts column at ordinal $ti — a null " +
            "timestamp has no throttle position (coalesce or filter first)")
        val ts = r.getLong(ti)
        if (k != curKey) { curKey = k; lastKept = ts; true }
        else if (ts - lastKept >= minGapMicros) { lastKept = ts; true }
        else false
      }
    }(enc)
  }

  /** Largest-Triangle-Three-Buckets downsampling (mean-anchor variant —
    * Steinarsson 2013, the fixed-anchor form that parallelizes): keep
    * the global first and last points; cut the interior into `buckets`
    * equal-count tiles (exact NTILE semantics via [[Ranks]] — no
    * single-task sort); in each tile keep the point maximizing the
    * triangle area against the NEIGHBOR TILE MEANS (first/last point at
    * the edges) — the perceptually-faithful series thinning a dashboard
    * runs before plotting millions of points. Tile means are exact
    * integer sums taking one IEEE division each; each candidate's area
    * is one fixed double expression quantized to ×10⁶, so the per-tile
    * argmax (max area, then min t) is deterministic on any engine and
    * partitioning. `tCol` must be unique per row; `tCol`/`vCol` integer.
    * One rank pass + tiles-sized joins — nothing unpartitioned.
    */
  def lttb(df: DataFrame, tCol: Column, vCol: Column,
           buckets: Int): DataFrame = {
    require(buckets >= 1, "need at least one interior bucket")
    val base = df.select(tCol.as("t"), vCol.as("v"))
      .localCheckpoint() // consumers: edge lookup + the flagged pass
    val edges = base.agg(min("t").as("t_lo"), max("t").as("t_hi"))
    // ONE flagged pass (r16): edge and interior rows used to be two
    // separately checkpointed scans of base × broadcast(edges); flagging
    // once and filtering the checkpointed result halves those jobs
    val flagged = base.crossJoin(broadcast(edges))
      .select(col("t"), col("v"), (col("t") === col("t_lo")).as("is_first"),
        (col("t") === col("t_hi")).as("is_last"))
      .localCheckpoint() // consumers: edge points + the interior rank pass
    val edgePts = flagged.filter(col("is_first") || col("is_last"))
    val interior = flagged.filter(!col("is_first") && !col("is_last"))
      .select("t", "v")
    // the rank pass's boundary sample already counts the interior —
    // reuse it instead of a separate count job (r16)
    val (ranked, nInt) =
      Ranks.globalRankCounted(interior, col("t"), col("t"), "rk")
    val tiled = ranked
      .withColumn("tile", Ranks.ntileOfRank(col("rk"), lit(nInt), buckets))
    val m = tiled.groupBy("tile")
      .agg(sum("t").as("st"), sum("v").as("sv"), count(lit(1)).as("c"))
    val firstPt = edgePts.filter(col("is_first"))
      .select(col("t").as("t0"), col("v").as("v0"))
    val lastPt = edgePts.filter(col("is_last"))
      .select(col("t").as("t9"), col("v").as("v9"))
    def meanOf(side: String, shift: Int) = m.select(
      (col("tile") - shift).as("tile"),
      (col("st").cast("double") / col("c").cast("double")).as(s"t$side"),
      (col("sv").cast("double") / col("c").cast("double")).as(s"v$side"))
    val anchors = m.select(col("tile"))
      .join(meanOf("l", -1), Seq("tile"), "left")   // tile-1's mean
      .join(meanOf("r", 1), Seq("tile"), "left")    // tile+1's mean
      .crossJoin(broadcast(firstPt)).crossJoin(broadcast(lastPt))
      .select(col("tile"),
        coalesce(col("tl"), col("t0").cast("double")).as("tl"),
        coalesce(col("vl"), col("v0").cast("double")).as("vl"),
        coalesce(col("tr"), col("t9").cast("double")).as("tr"),
        coalesce(col("vr"), col("v9").cast("double")).as("vr"))
    val scored = tiled.join(broadcast(anchors), "tile")
      .withColumn("area_q", floor(abs(
        col("tl") * (col("v").cast("double") - col("vr"))
          + col("t").cast("double") * (col("vr") - col("vl"))
          + col("tr") * (col("vl") - col("v").cast("double"))) * 1e6 + 0.5)
        .cast("long"))
    // per-tile argmax (max area, ties to min t) as ONE map-side-combined
    // aggregate (r16): min_by over the (−area_q, t) struct picks exactly
    // the row the old max-join → tie-join → select-back chain picked
    // (t is unique per row, so the winner is unique) — replacing two
    // aggregates, two broadcast joins, and the checkpoint `scored`
    // needed to feed them. Strictly fewer shuffles at any scale.
    val sel = scored.groupBy("tile")
      .agg(min_by(struct(col("t"), col("v")),
        struct((-col("area_q")).as("na"), col("t"))).as("p"))
      .select(col("p.t").as("t"), col("p.v").as("v"))
    edgePts.select("t", "v").union(sel)
  }

  /** OHLC bars: per time bucket, the first/highest/lowest/last value plus
    * the count and exact volume — the canonical downsampling of a tick
    * stream. ONE aggregation over the bucket key (map-side partial
    * min/max/min_by/max_by, no window, no self-join): open/close resolve
    * by `min_by`/`max_by` over the scalar composite key
    * micros·10¹⁰ + tie (exact as DECIMAL(38,0); doubles would collide
    * above 2⁵³), so ties at the same timestamp break deterministically by
    * `tieCol` — `tieCol` must be unique within a bucket and non-negative
    * below 10¹⁰. `valCol` should be an exact (integer/decimal) value —
    * cents, not dollars — so `volume` is an exact sum.
    */
  def ohlcBars(df: DataFrame, tsCol: Column, valCol: Column, tieCol: Column,
               bucket: String = "hour"): DataFrame = {
    def d38(c: Column): Column =
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val key = d38(unix_micros(tsCol.cast("timestamp"))) *
      lit(10000000000L) + tieCol
    df.select(date_trunc(bucket, tsCol).as("bar"), key.as("k"),
        valCol.as("v"))
      .groupBy("bar")
      .agg(count(lit(1)).as("n_ticks"),
        min_by(col("v"), col("k")).as("open"),
        max(col("v")).as("high"), min(col("v")).as("low"),
        max_by(col("v"), col("k")).as("close"),
        sum(col("v")).as("volume"))
  }
}
