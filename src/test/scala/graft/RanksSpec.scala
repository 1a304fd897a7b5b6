package graft

import graft.ops.Ranks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ranks.prefixCounts / globalRank / ntileOfRank must be BIT-IDENTICAL to
  * the unpartitioned-window forms they replace — bucket boundaries only
  * move work, never results.
  */
class RanksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("prefixCounts equals the global cumulative sum, at several bucket counts") {
    // deterministic pseudo-random per-value frame incl. negative values
    val g = spark.range(0, 500)
      .select((col("id") * 7919 % 1000 - 300).as("v"),
        (col("id") % 5 + 1).as("c"), (col("id") % 3).as("d"))
      .groupBy("v").agg(sum("c").as("c"), sum("d").as("d"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = g.select(col("v"), sum("c").over(w).as("c_cum"),
        sum("d").over(w).as("d_cum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (b <- Seq(1, 3, 16, 128, 4096)) {
      val got = Ranks.prefixCounts(g, "v", Seq("c", "d"), buckets = b)
        .collect().map(r => r.getAs[Long]("v") ->
          (r.getAs[Long]("c_cum"), r.getAs[Long]("d_cum"))).toMap
      assert(got == expect, s"buckets=$b")
    }
  }

  test("globalRank equals row_number over (sort, tie), desc via negation") {
    val df = spark.range(0, 300)
      .select(col("id").as("k"), (col("id") * 131 % 40).as("s"))
    val w = Window.orderBy(col("s"), col("k"))
    val expect = df.withColumn("rn", row_number().over(w).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (b <- Seq(7, 128, 4096)) {
      val got = Ranks.globalRank(df, col("s"), col("k"), "rnk", buckets = b)
        .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("rnk")).toMap
      assert(got == expect, s"buckets=$b")
    }
    // descending: -s asc == s desc (ties by k asc in both)
    val wd = Window.orderBy(col("s").desc, col("k"))
    val expectD = df.withColumn("rn", row_number().over(wd).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val gotD = Ranks.globalRank(df, -col("s"), col("k"), "rnk", buckets = 5)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("rnk")).toMap
    assert(gotD == expectD)
  }

  test("ntileOfRank matches NTILE for n below, at, and above k") {
    for (n <- Seq(3, 5, 7, 12, 100)) {
      val df = spark.range(1, n + 1).select(col("id").as("r"))
      val expect = df.withColumn("t", ntile(5).over(Window.orderBy("r")))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = df.select(col("r"),
          Ranks.ntileOfRank(col("r"), lit(n.toLong), 5).as("t"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expect, s"n=$n")
    }
  }

  test("prefixCountsBy: multi-column order with strings, nulls and decimals " +
    "matches the window form") {
    val g = spark.range(0, 400).select(
      concat(lit("k"), lpad((col("id") % 37).cast("string"), 2, "0")).as("a"),
      when(col("id") % 11 === 0, lit(null))
        .otherwise(((col("id") * 13 % 50) - 10).cast("decimal(12,2)")).as("b"),
      col("id").as("tie"), (col("id") % 7 + 1).as("c"))
    val w = Window.orderBy(col("a"), col("b"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = g.select(col("tie"), sum("c").over(w).as("c_cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (b <- Seq(1, 13, 128)) {
      val got = Ranks.prefixCountsBy(g, Seq("a", "b", "tie"), Seq("c"), buckets = b)
        .collect().map(r => r.getAs[Long]("tie") -> r.getAs[Long]("c_cum")).toMap
      assert(got == expect, s"buckets=$b")
    }
  }

  test("prefixMinExclusive equals the strict-prefix window min; sentinel on first row") {
    val g = spark.range(0, 400)
      .select((col("id") * 131 % 97).as("k"), col("id").as("tie"),
        ((col("id") * 7919) % 1000 - 200).as("v"))
      .groupBy("k", "tie").agg(min("v").as("v"))
    val w = Window.orderBy("k", "tie")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = g.withColumn("pm", min("v").over(w))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) Long.MaxValue else r.getLong(3))).toMap
    for (b <- Seq(1, 9, 128)) {
      val got = Ranks.prefixMinExclusive(g, Seq("k", "tie"), "v", buckets = b)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          r.getAs[Long]("v_premin")).toMap
      assert(got == expect, s"buckets=$b")
    }
  }

  test("smallRank equals row_number over the same order on a bounded frame") {
    val df = spark.range(0, 40)
      .select(col("id").as("k"), (col("id") * 17 % 7).as("s"),
        concat(lit("w"), (col("id") % 5).cast("string")).as("t"))
    val w = Window.orderBy(col("s").desc, col("t"), col("k"))
    val expect = df.withColumn("r", row_number().over(w))
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    val got = Ranks.smallRank(df, Seq(-col("s"), col("t"), col("k")), "r")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Int]("r")).toMap
    assert(got == expect)
  }

  test("globalRank: -0.0 and 0.0 tie exactly as Spark's window order does") {
    // the descending idiom (-col) manufactures -0.0 from 0.0 scores; the
    // kernel must treat them EQUAL (Spark normalizes floating zeros in
    // ordering keys) or bucket ids stop being monotone in the window
    // order and ranks diverge on the tie run
    val df = spark.range(0, 200)
      .select(col("id").as("k"),
        when(col("id") % 3 === 0, -lit(0.0))
          .when(col("id") % 3 === 1, lit(0.0))
          .otherwise((col("id") % 7).cast("double") - 3.0).as("s"))
    val w = Window.orderBy(col("s"), col("k"))
    val expect = df.withColumn("rn", row_number().over(w).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (b <- Seq(4, 16, 64)) {
      val got = Ranks.globalRank(df, col("s"), col("k"), "rnk", buckets = b)
        .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("rnk")).toMap
      assert(got == expect, s"buckets=$b")
    }
  }

  test("prefixMinExclusive: an all-null bucket contributes nothing, not zero") {
    // keys 100..119 carry only null values; the window form's min skips
    // them, so later keys' strict-prefix min must stay 5, not drop to 0
    val g = spark.range(0, 200)
      .select(col("id").as("k"),
        when(col("id") >= 100 && col("id") < 120, lit(null))
          .otherwise((col("id") % 37) + 5).as("v"))
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    val expect = g.withColumn("pm", min("v").over(w))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) Long.MaxValue else r.getLong(2))).toMap
    for (b <- Seq(1, 8, 32)) {
      val got = Ranks.prefixMinExclusive(g, Seq("k"), "v", buckets = b)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("v_premin")).toMap
      assert(got == expect, s"buckets=$b")
    }
  }

  test("bucket kernel: interpreted (codegen-off) evaluation matches codegen") {
    // RangeBucketId/BucketOffset carry both doGenCode and eval paths;
    // force the interpreted path once so a drift between them cannot
    // hide behind whole-stage codegen being on everywhere else
    val g = spark.range(0, 300)
      .select((col("id") * 7919 % 500).as("v"), (col("id") % 5 + 1).as("c"))
      .groupBy("v").agg(sum("c").as("c"))
    val expect = Ranks.prefixCounts(g, "v", Seq("c"), buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val got = Ranks.prefixCounts(g, "v", Seq("c"), buckets = 16)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("prefixCounts: empty input and single-value input") {
    val empty = Seq.empty[(Long, Long)].toDF("v", "c")
    assert(Ranks.prefixCounts(empty, "v", Seq("c")).count() == 0)
    val one = Seq((42L, 3L)).toDF("v", "c")
    val r = Ranks.prefixCounts(one, "v", Seq("c")).collect().head
    assert(r.getAs[Long]("v") == 42L && r.getAs[Long]("c_cum") == 3L)
  }

  test("sampleRows: a contract-violating hot tuple cannot flood the driver") {
    // replicate md5Hash60 driver-side to FIND a value whose hash falls
    // under the sample cut — so the adversarial case (a duplicate-heavy
    // tuple that IS sampled) triggers deterministically, not at the
    // ~1% rate chance would give it
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val k = 256
    val nFill = 300
    val nHot = 20000
    val n = nHot + nFill
    val cut = math.ceil(k.toDouble / n * (1L << 60).toDouble).toLong
    val hot = (0 until 10000).map(i => s"hot$i").find(hash60(_) < cut).get
    // 20k duplicates of the hot tuple + distinct filler: violates the
    // one-row-per-distinct-tuple contract sampleRows documents
    val df = (Seq.fill(nHot)(hot) ++ (0 until nFill).map(i => f"fill$i%04d"))
      .toDF("v")
    val sample = Ranks.sampleRows(df, Seq("v"), k)
    assert(sample.length <= 16 * k,
      s"driver sample must stay capped, got ${sample.length}")
    assert(sample.nonEmpty && sample.forall(_.getString(0) == hot))
    // and the cap degrades only the bucketing, never the results:
    // ranks over the duplicate-heavy frame are still a permutation with
    // the filler block ranked correctly relative to the hot block
    val withTie = df.withColumn("t", monotonically_increasing_id())
      .localCheckpoint()
    val ranked = Ranks.globalRank(withTie, col("v"), col("t"), "rnk")
      .collect()
    assert(ranked.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to n).toSeq)
    val fillRanks = ranked.filter(_.getString(0).startsWith("fill"))
      .map(_.getAs[Long]("rnk")).sorted.toSeq
    assert(fillRanks == (1L to nFill.toLong).toSeq,
      "\"fill...\" sorts before \"hot...\" so filler must occupy ranks 1..nFill")
  }

  test("percentilesExact is bit-identical to Spark's percentile() on a " +
    "duplicate-heavy frame, including edge fractions") {
    // 700 rows, many duplicates, negatives, non-uniform spacing
    val df = spark.range(0, 700)
      .select(((col("id") * 131 % 97) * (col("id") % 7 - 3)).cast("double")
        .as("v"))
      .localCheckpoint()
    val fr = Seq(0.0, 0.1, 0.25, 0.5, 0.733, 0.9, 1.0)
    val frSql = fr.map(p => s"${p}D").mkString("array(", ", ", ")")
    val expect = df.agg(expr(s"percentile(v, $frSql)").as("qs"))
      .collect()(0).getSeq[Double](0)
    val got = Ranks.percentilesExact(df, col("v"), fr)
      .orderBy("i").collect().map(_.getAs[Double]("value")).toSeq
    assert(got == expect.toSeq) // same interpolation shape → same bits
  }

  test("groupedPercentilesExact is bit-identical to the quantile_cont " +
    "shape per group (Spark's builtin lerp may differ in the last ulp)") {
    val df = spark.range(0, 900)
      .select(concat(lit("g"), (col("id") % 4)).as("g"),
        ((col("id") * 131 % 89) * (col("id") % 5 - 2)).cast("double").as("v"))
      .filter(col("g") =!= "g3" || col("id") < 12) // one tiny group
      .localCheckpoint()
    val fr = Seq(0.1, 0.5, 0.9)
    // reference: the DuckDB/percentilesExact lerp lo + (hi−lo)·frac,
    // replayed on the driver from the sorted group values
    val byG = df.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    val expect = byG.map { case (g, vs) =>
      g -> fr.map { p =>
        val h = p * (vs.size - 1)
        val lo = math.floor(h).toInt
        val hi = math.min(lo + 1, vs.size - 1)
        vs(lo) + (vs(hi) - vs(lo)) * (h - math.floor(h))
      }
    }
    val got = Ranks.groupedPercentilesExact(df, col("g"), col("v"), fr)
      .collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getAs[Double]("value")).toSeq)
      .toMap
    assert(got == expect)
    // and at the 6-dp publication grain the builtin agrees too
    val frSql = fr.map(p => s"${p}D").mkString("array(", ", ", ")")
    val builtin = df.groupBy("g")
      .agg(expr(s"percentile(v, $frSql)").as("qs")).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).map(v =>
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toMap
    got.foreach { case (g, vs) =>
      assert(vs.map(v => BigDecimal(v).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) == builtin(g).toSeq, g)
    }
  }

  test("groupedPercentiles keeps the NULL group in BOTH regimes " +
    "(SQL GROUP BY semantics; r11 ADVICE)") {
    // a third of the rows carry a NULL group key; standard GROUP BY puts
    // them in their own group, and the dispatcher's two regimes must
    // agree on it — the exact path's offset/rank joins key null-safely
    // (<=>) for exactly this case
    val df = spark.range(0, 300)
      .select(when(col("id") % 3 === 0, lit(null))
          .otherwise(concat(lit("g"), col("id") % 3)).as("g"),
        ((col("id") * 131 % 97) - 40).cast("double").as("v"))
      .localCheckpoint()
    val fr = Seq(0.25, 0.5, 0.9)
    def run(threshold: Long) = Ranks.groupedPercentiles(df, col("g"),
        col("v"), fr, maxBufferedDistinct = threshold)
      .collect()
      .map(r => (Option(r.get(0)), r.getInt(1),
        BigDecimal(r.getAs[Double]("value"))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet
    val buffered = run(Long.MaxValue)
    val exact = run(0L)
    assert(buffered == exact, s"regimes disagree:\n$buffered\nvs\n$exact")
    assert(buffered.exists(_._1.isEmpty), "NULL group was dropped")
    assert(buffered.count(_._1.isEmpty) == fr.size)
  }
}
