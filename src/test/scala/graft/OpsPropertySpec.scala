package graft

import graft.ops.{Quality, Ranks, Resample, Stats}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants for the round-9 statistics/rank machinery —
  * fixed-seed ScalaCheck frames (deterministic CI), each property chosen
  * so a violation is a LOGIC bug, not float noise:
  *   - percentilesExact ≡ Spark's built-in percentile() bit-for-bit
  *     (duplicates, negatives, any fraction set)
  *   - PSI ≥ 0 with equality iff the cohorts' live-bin distributions
  *     match exactly (Gibbs' inequality on the quantized terms)
  *   - the drift panel's measures respect their analytic ranges and all
  *     vanish on identical cohorts
  *   - OHLC invariants: low ≤ open/close ≤ high, volume = exact sum,
  *     tick counts partition the input
  */
class OpsPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("percentilesExact equals percentile() on random duplicate-heavy " +
    "frames at random fraction sets") {
    val frameGen = for {
      n <- Gen.chooseNum(1, 400)
      dom <- Gen.chooseNum(1, 50) // small domain → heavy duplicates
      vs <- Gen.listOfN(n, Gen.chooseNum(-dom, dom))
    } yield vs.map(_.toDouble * 1.5 - 0.25)
    val fracGen = Gen.nonEmptyListOf(Gen.oneOf(
      0.0, 0.01, 0.1, 0.25, 0.5, 0.617, 0.75, 0.9, 0.99, 1.0)).map(_.distinct)
    for (seed <- 1L to 8L) {
      val vs = sample(frameGen, seed)
      val fr = sample(fracGen, seed + 100)
      val df = vs.toDF("v").localCheckpoint()
      val frSql = fr.map(p => s"${p}D").mkString("array(", ", ", ")")
      val expect = df.agg(expr(s"percentile(v, $frSql)"))
        .collect()(0).getSeq[Double](0)
      val got = Ranks.percentilesExact(df, col("v"), fr)
        .orderBy("i").collect().map(_.getAs[Double]("value")).toSeq
      assert(got == expect.toSeq, s"seed=$seed fr=$fr n=${vs.size}")
    }
  }

  test("psi is non-negative and zero exactly on identical cohorts") {
    val histGen = Gen.listOfN(6, Gen.chooseNum(0, 40))
    for (seed <- 1L to 8L) {
      val h1 = sample(histGen, seed)
      val h2 = sample(histGen, seed + 50)
      def expand(h: Seq[Int]) = h.zipWithIndex
        .flatMap { case (c, b) => Seq.fill(c)(s"b$b") }
      val (a, b) = (expand(h1), expand(h2))
      if (a.nonEmpty && b.nonEmpty) {
        val r = Quality.psi(a.toDF("bin"), b.toDF("bin"), "bin")
          .collect().head
        assert(r.getAs[Double]("psi") >= 0.0, s"seed=$seed h1=$h1 h2=$h2")
        val self = Quality.psi(a.toDF("bin"), a.toDF("bin"), "bin")
          .collect().head
        assert(self.getAs[Double]("psi") == 0.0 &&
          self.getAs[Int]("k_zero") == 0)
      }
    }
  }

  test("drift panel: measures stay in range and vanish on identical " +
    "cohorts") {
    val histGen = Gen.listOfN(5, Gen.chooseNum(0, 30))
    for (seed <- 1L to 8L) {
      val h1 = sample(histGen, seed)
      val h2 = sample(histGen, seed + 77)
      def expand(h: Seq[Int]) = h.zipWithIndex
        .flatMap { case (c, b) => Seq.fill(c)(s"c$b") }
      val (a, b) = (expand(h1), expand(h2))
      if (a.nonEmpty && b.nonEmpty) {
        val r = Quality.categoricalDrift(a.toDF("c"), b.toDF("c"), "c")
          .collect().head
        val (tvd, hell, jsd) = (r.getAs[Double]("tvd"),
          r.getAs[Double]("hellinger"), r.getAs[Double]("jsd_nats"))
        assert(tvd >= 0.0 && tvd <= 1.0, s"seed=$seed tvd=$tvd")
        assert(hell >= 0.0 && hell <= 1.0, s"seed=$seed hell=$hell")
        // JSD is bounded by ln 2 (plus one 6-dp rounding grain)
        assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-6, s"seed=$seed jsd=$jsd")
        assert(r.getAs[Double]("chi2") >= 0.0)
        val z = Quality.categoricalDrift(a.toDF("c"), a.toDF("c"), "c")
          .collect().head
        assert(z.getAs[Double]("tvd") == 0.0 && z.getAs[Double]("jsd_nats") == 0.0
          && z.getAs[Double]("hellinger") == 0.0 && z.getAs[Double]("chi2") == 0.0)
      }
    }
  }

  test("ohlc bars: low <= open, close <= high; volume is the exact sum; " +
    "ticks partition the input") {
    val rowGen = for {
      n <- Gen.chooseNum(1, 300)
      rows <- Gen.listOfN(n, for {
        h <- Gen.chooseNum(0, 5) // hour bucket
        m <- Gen.chooseNum(0, 59)
        v <- Gen.chooseNum(-500L, 500L)
      } yield (f"2024-03-01 $h%02d:$m%02d:00", v))
    } yield rows
    for (seed <- 1L to 6L) {
      val rows = sample(rowGen, seed).zipWithIndex
        .map { case ((ts, v), i) => (ts, i.toLong, v) }
      val df = rows.toDF("ts", "id", "v")
        .select(col("ts").cast("timestamp_ntz").as("ts"), col("id"), col("v"))
      val got = Resample.ohlcBars(df, col("ts"), col("v"), col("id"))
        .collect()
      assert(got.map(_.getAs[Long]("n_ticks")).sum == rows.size.toLong)
      assert(got.map(_.getAs[Long]("volume")).sum == rows.map(_._3).sum)
      got.foreach { r =>
        val (o, h, l, c) = (r.getAs[Long]("open"), r.getAs[Long]("high"),
          r.getAs[Long]("low"), r.getAs[Long]("close"))
        assert(l <= o && o <= h && l <= c && c <= h, s"seed=$seed row=$r")
      }
    }
  }

  test("jackknife ratio: the CI brackets theta and collapses on " +
    "constant-ratio buckets") {
    val gen = Gen.listOfN(30, for {
      g <- Gen.chooseNum(0, 5)
      x <- Gen.chooseNum(1L, 1000L)
      y <- Gen.chooseNum(1L, 20L)
    } yield (g, x, y))
    for (seed <- 1L to 6L) {
      val rows = sample(gen, seed)
      val df = rows.toDF("g", "x", "y")
      val r = Stats.jackknifeRatio(df, col("g"), col("x"), col("y"))
        .collect().head
      val (th, lo, hi) = (r.getAs[Double]("theta"),
        r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo <= th && th <= hi, s"seed=$seed $r")
      assert(r.getAs[Double]("se_jack") >= 0.0)
    }
  }
}
