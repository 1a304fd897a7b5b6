package graft

import graft.ops._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Record linkage (Fellegi-Sunter), DSIR importance weights, EWMA, MAD
  * outliers, snapshot diff — the round-8 op additions.
  */
class LinkageSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // --- Linkage -------------------------------------------------------------

  val left = Seq(
    (1L, "alice", "NY"), (2L, "bob", "NY"), (3L, "carol", "CA"))
    .toDF("l_id", "l_name", "l_state")
  val right = Seq(
    (10L, "alice", "NY"), (20L, "bobb", "NY"), (30L, "carol", "WA"))
    .toDF("r_id", "r_name", "r_state")

  test("candidates: multi-pass union dedups pairs and never cross-joins") {
    val pairs = Linkage.candidates(left, right, "l_id", "r_id", Seq(
      (col("l_state"), col("r_state")),                  // state block
      (substring(col("l_name"), 1, 3), substring(col("r_name"), 1, 3))))
    val got = pairs.select("l_id", "r_id").as[(Long, Long)].collect().toSet
    // state NY: (1,10),(1,20),(2,10),(2,20); name prefix: ali/bob/car passes
    assert(got == Set((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 30L)))
    // (3,30) found ONLY by the name pass (states differ) — multi-pass matters
    val stateOnly = Linkage.candidates(left, right, "l_id", "r_id",
      Seq((col("l_state"), col("r_state"))))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(!stateOnly.contains((3L, 30L)))
  }

  test("candidates maxBlockPairs: hot block skipped in its pass, backstop pass still catches") {
    // NY block fans out 2x2=4 > cap 2, so the state pass drops it; the
    // name-prefix pass (1x1 blocks) still finds the NY true pairs
    val capped = Linkage.candidates(left, right, "l_id", "r_id", Seq(
      (col("l_state"), col("r_state")),
      (substring(col("l_name"), 1, 3), substring(col("r_name"), 1, 3))),
      maxBlockPairs = 2L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 10L), (2L, 20L), (3L, 30L)))
    // the auto default routes this linear-fan-out corpus EXACT: same
    // result as a forced-exact call
    val exact = Linkage.candidates(left, right, "l_id", "r_id",
      Seq((col("l_state"), col("r_state"))))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(exact == Set((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L)))
    val forced = Linkage.candidates(left, right, "l_id", "r_id",
      Seq((col("l_state"), col("r_state"))), maxBlockPairs = Long.MaxValue)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(exact == forced)
  }

  test("blockKeep gate: wrapped-Long block products are REFUSED (double arithmetic)") {
    // ADVICE r12 (medium): 3037000500² wraps Long to a negative that
    // would pass `<= cap` in Long arithmetic — the in-plan keep gate of
    // a capped pass must refuse that block, exactly like the probe,
    // which already sums pair mass in double. No real corpus of that
    // size fits a test, so the gate expression is extracted and checked
    // on literal counts spanning the wrap boundary.
    val counts = Seq(
      (1L, 1L),                     // 1 pair: keep
      (100L, 1000L),                // 1e5: keep
      (3037000500L, 3037000500L),   // Long-wraps NEGATIVE: must refuse
      (4294967296L, 4294967296L),   // 2^32·2^32 Long-wraps to exactly 0: must refuse
      (Long.MaxValue, Long.MaxValue)).toDF("nl", "nr")
    val kept = counts
      .filter(Linkage.blockKeep(col("nl"), col("nr"), cap = 100000L))
      .as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 1L), (100L, 1000L)),
      s"wrapped products leaked through the keep gate: $kept")
    // sanity: the Long forms really do wrap under (documents the bug)
    assert(3037000500L * 3037000500L < 0L)
    assert(4294967296L * 4294967296L == 0L)
  }

  test("candidatesAuto: degenerate blocking key flips its pass to capped, " +
    "backstop pass keeps every true pair (regime pin)") {
    // 600 left x 600 right rows sharing ONE constant block key: that
    // pass is all-pairs in disguise (360k pairs over 1200 rows = 300/row
    // > the 256/row routing threshold), and with the 100k default block
    // cap its single block is skipped outright. The id-suffix backstop
    // pass (<=1x1 blocks by construction) is immune.
    val l = spark.range(600).select(col("id").as("l_id"),
      concat(lit("name"), col("id")).as("l_name"))
    val r = spark.range(600).select((col("id") + 1000).as("r_id"),
      concat(lit("name"), col("id")).as("r_name"))
    val d = Linkage.candidatesAuto(l, r, "l_id", "r_id", Seq(
      (lit("K"), lit("K")),                       // degenerate: one block
      (col("l_name"), col("r_name"))))            // backstop: unique names
    assert(d.regime == "capped" && d.nLeft == 600 && d.nRight == 600)
    assert(d.passes(0).regime == "capped" && d.passes(0).estPairs == 360000L
      && d.passes(0).overCapBlocks == 1 && d.passes(0).estPairsGated == 0L)
    assert(d.passes(1).regime == "exact" && d.passes(1).estPairs == 600L)
    // the degenerate pass contributes nothing; the backstop finds all
    // 600 true pairs and ONLY those — no all-pairs blowup in the result
    val got = d.pairs.select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(got == (0L until 600L).map(i => (i, i + 1000)).toSet)
    // forced exact on the same corpus IS all-pairs: the plan the
    // dispatcher exists to refuse at scale
    val exactN = Linkage.candidates(l, r, "l_id", "r_id",
      Seq((lit("K"), lit("K"))), maxBlockPairs = Long.MaxValue).count()
    assert(exactN == 360000L)
    // and a well-designed corpus routes exact on every pass
    val ok = Linkage.candidatesAuto(l, r, "l_id", "r_id",
      Seq((col("l_name"), col("r_name"))))
    assert(ok.regime == "exact" && ok.passes.forall(_.cap == Long.MaxValue))
  }

  test("fuzzyJoin: deletion-neighborhood candidates find all <=2-edit pairs, " +
    "exact by default") {
    val parts = Seq(
      (1L, "smith widget large", "B1"),
      (2L, "smith widgit large", "B1"),  // 1 edit from 1
      (3L, "smith widgets large", "B1"), // 1 edit from 1, 2 from 2
      (4L, "smith widget large", "B2"),  // same name, different block
      (5L, "jones gadget small", "B1"))  // unrelated
      .toDF("p_id", "p_name", "p_brand")
      .withColumn("blk", element_at(split(trim(col("p_name")), "\\s+"), -1))
    val got = FuzzyJoin.editDistanceSelfJoin(parts, "p_id", "p_name",
        Seq("blk", "p_brand"), maxEdits = 2)
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 2)))
    // brute-force ground truth within blocks: nothing missed
    val rows = parts.select("p_id", "p_name", "p_brand", "blk")
      .as[(Long, String, String, String)].collect()
    val brute = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._3 == b._3 && a._4 == b._4
      d = {
        val l = org.apache.commons.text.similarity.LevenshteinDistance
          .getDefaultInstance.apply(a._2, b._2)
        l.intValue
      } if d <= 2
    } yield (a._1, b._1, d)).toSet
    assert(got == brute)
  }

  test("fuzzyJoin maxBucket: hot variant bucket skipped, small-bucket pairs survive") {
    // 8 identical names form hot variant buckets; one separate 1-edit
    // pair lives in small buckets — the Linkage.maxBlockPairs contract
    // shape applied to the variant-hash key
    val hot = (1L to 8L).map(i => (i, "alpha beta gamma", "B1"))
    // the edit sits in a NON-last token: blk (last token) must agree
    val pair = Seq((100L, "quantum flux drive", "B1"),
      (101L, "quantun flux drive", "B1"))
    val parts = (hot ++ pair).toDF("p_id", "p_name", "p_brand")
      .withColumn("blk", element_at(split(trim(col("p_name")), "\\s+"), -1))
    val exact = FuzzyJoin.editDistanceSelfJoin(parts, "p_id", "p_name",
        Seq("blk", "p_brand"), maxEdits = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.size == 8 * 7 / 2 + 1 && exact.contains((100L, 101L)))
    val capped = FuzzyJoin.editDistanceSelfJoin(parts, "p_id", "p_name",
        Seq("blk", "p_brand"), maxEdits = 2, maxBucket = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // hot family suppressed together (identical names share ALL variant
    // buckets), the small pair survives
    assert(capped == Set((100L, 101L)))
  }

  test("fuzzyJoin maxNeighborhood: each record keeps k nearest, union semantics") {
    // 6 identical names: 15 exact pairs; with k=2 each record keeps its
    // 2 smallest-id neighbors (all dist 0) and a pair survives if EITHER
    // endpoint keeps it -> exactly {(1,2),(1,3),(2,3)} ∪ {(1,j),(2,j): j>=4}
    val parts = (1L to 6L).map(i => (i, "alpha beta gamma", "B1"))
      .toDF("p_id", "p_name", "p_brand")
      .withColumn("blk", element_at(split(trim(col("p_name")), "\\s+"), -1))
    val got = FuzzyJoin.editDistanceSelfJoin(parts, "p_id", "p_name",
        Seq("blk", "p_brand"), maxEdits = 2, maxNeighborhood = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val want = Set((1L, 2L), (1L, 3L), (2L, 3L),
      (1L, 4L), (2L, 4L), (1L, 5L), (2L, 5L), (1L, 6L), (2L, 6L))
    assert(got == want)
    // the un-capped default is unchanged: all 15 pairs
    val exact = FuzzyJoin.editDistanceSelfJoin(parts, "p_id", "p_name",
        Seq("blk", "p_brand"), maxEdits = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.size == 15)
  }

  test("score + decide: level precedence, pattern, integer weights, zones") {
    val pairs = Linkage.candidates(left, right, "l_id", "r_id",
      Seq((lit(1), lit(1)))) // tiny all-pairs block: 9 pairs, test-only
    val comps = Seq(
      Linkage.Comparator("name", Seq(
        (col("l_name") === col("r_name"), 10),
        (levenshtein(col("l_name"), col("r_name")) <= 1, 6)), -5),
      Linkage.Comparator("state", Seq((col("l_state") === col("r_state"), 3)), -2))
    val scored = Linkage.decide(Linkage.score(pairs, comps), upper = 10, lower = 4)
    val byPair = scored.select("l_id", "r_id", "name_lv", "pattern", "fs_score", "zone")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getString(3), r.getInt(4), r.getString(5))).toMap
    assert(byPair((1L, 10L)) == ((2, "n2|s1", 13, "match")))   // exact + state
    assert(byPair((2L, 20L)) == ((1, "n1|s1", 9, "possible"))) // lev 1 + state
    assert(byPair((3L, 30L)) == ((2, "n2|s0", 8, "possible"))) // exact, state off
    assert(byPair((1L, 20L))._4 == "nonmatch")
    // weights are pure integers: score equals the hand sum for every pair
    scored.collect().foreach { r =>
      val nameW = r.getAs[Int]("name_lv") match {
        case 2 => 10; case 1 => 6; case _ => -5 }
      val stW = if (r.getAs[Int]("state_lv") == 1) 3 else -2
      assert(r.getAs[Int]("fs_score") == nameW + stW)
    }
  }

  test("dirtyCustomers is deterministic and linkCustomers finds every true pair") {
    val cust = (0L until 300L).toDF("c_custkey")
      .select(col("c_custkey"),
        format_string("Customer#%09d", col("c_custkey")).as("c_name"),
        (col("c_custkey") % 25).cast("int").as("c_nationkey"),
        (col("c_custkey").cast("double") / 7.0).as("c_acctbal"),
        element_at(array(lit("AUTOMOBILE"), lit("BUILDING"), lit("FURNITURE"),
          lit("HOUSEHOLD"), lit("MACHINERY")),
          (col("c_custkey") % 5 + 1).cast("int")).as("c_mktsegment"))
    val d1 = Linkage.dirtyCustomers(cust).collect().map(_.toString).sorted
    val d2 = Linkage.dirtyCustomers(cust).collect().map(_.toString).sorted
    assert(d1.sameElements(d2) && d1.length == 200) // 2/3 of 300
    val matches = Linkage.linkCustomers(cust)
      .filter(col("fs_score") >= 18 && col("d_id") === col("c_custkey"))
    assert(matches.count() == 200) // every dirty record links home
  }

  test("linkCustomers cap engaged: pass-A hot block drops, pass B still links every record") {
    // FORCE-ENGAGE the maxBlockPairs contingency (what happens at
    // >= sf30 when attribute cells outgrow the cap): every customer
    // shares ONE (nation, segment, $100-bucket) cell, so pass A is a
    // single 200x300 = 60000-pair block that the 10000 cap drops, while
    // pass B's name-digit blocks (~67x100 pairs) survive — and recall
    // must ride entirely on pass B: every dirty record still links home.
    val cust = (0L until 300L).toDF("c_custkey")
      .select(col("c_custkey"),
        format_string("Customer#%09d", col("c_custkey")).as("c_name"),
        lit(7).as("c_nationkey"),
        (col("c_custkey").cast("double") / 7.0).as("c_acctbal"),
        lit("BUILDING").as("c_mktsegment"))
    val capped = Linkage.linkCustomers(cust, maxBlockPairs = 10000L)
      .filter(col("fs_score") >= 18 && col("d_id") === col("c_custkey"))
    assert(capped.count() == 200)
    // sanity: the cap really engaged — candidate volume shrank vs exact
    val nExact = Linkage.linkCustomers(cust).count()
    val nCapped = Linkage.linkCustomers(cust, maxBlockPairs = 10000L).count()
    assert(nCapped < nExact, s"cap did not engage: $nCapped vs $nExact")
  }

  test("dedupByMinhashPriority keeps the preferred-source copy, not min-id") {
    val near = Seq(
      (0L, "the cat sat on the mat and looked at the dog", "raw"),
      (5L, "the cat sat on the mat and looked at the dog", "curated"), // dup, better source
      (9L, "totally unrelated text about gardening tulips roses", "raw"))
      .toDF("doc_id", "text", "source")
    val prio = when(col("source") === "curated", 0).otherwise(1)
    val kept = Dedup.dedupByMinhashPriority(near, "text", "doc_id", prio)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(5L, 9L)) // min-id dedup would keep 0L instead
    val keptMinId = Dedup.dedupByMinhash(near, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(keptMinId == Set(0L, 9L))
  }

  // --- DSIR ----------------------------------------------------------------

  test("dsirWeights: target-like docs outweigh off-domain docs; mean of exact ratios") {
    val docs = Seq(
      (0L, "alpha beta alpha beta", true),   // target
      (1L, "alpha beta", false),             // raw, pure target vocabulary
      (2L, "gamma delta", false),            // raw, pure off-domain
      (3L, "alpha gamma", false))            // raw, mixed
      .toDF("doc_id", "text", "is_t")
    val w = TextAnalysis.dsirWeights(docs, col("is_t"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(w.keySet == Set(1L, 2L, 3L))
    assert(w(1L)._1 == 2 && w(2L)._1 == 2 && w(3L)._1 == 2)
    // hand computation: nt=4, ns=6, V=4; ratio(tok) = (ct+1)(ns+V)/((cs+1)(nt+V))
    // alpha: ct=2, cs=2 -> 3*10/(3*8)=1.25 ; beta: 2,1 -> 30/16=1.875
    // gamma: 0,2 -> 10/24 ; delta: 0,1 -> 10/16=0.625
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(w(1L)._2 == r6((1.25 + 1.875) / 2))
    assert(w(2L)._2 == r6((10.0 / 24 + 0.625) / 2))
    assert(w(3L)._2 == r6((1.25 + 10.0 / 24) / 2))
    assert(w(1L)._2 > w(3L)._2 && w(3L)._2 > w(2L)._2)
  }

  // --- EWMA ----------------------------------------------------------------

  test("ewmaLast folds s=(s+x)/2 in event order; singleton returns its value") {
    val df = Seq(
      ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 40.0),
      ("b", 1, 7.5))
      .toDF("k", "seq", "x")
    val got = Stats.ewmaLast(df, "k", Seq(col("seq")), "x")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // a: s1=10, s2=15, s3=27.5 (exact dyadic arithmetic)
    assert(got("a") == ((3, 27.5)))
    assert(got("b") == ((1, 7.5)))
    // order sensitivity: reversing the sequence changes the fold
    val rev = Stats.ewmaLast(df.withColumn("seq", -col("seq")), "k",
      Seq(col("seq")), "x").filter(col("k") === "a")
      .collect().head.getDouble(2)
    assert(rev == 20.0) // fold order 40,20,10: s1=40, s2=30, s3=20
  }

  // --- MAD -----------------------------------------------------------------

  test("madOutliers: lower median, exact MAD, 3-MAD outlier count") {
    val vals = Seq(10, 11, 12, 13, 14, 100).map(v => ("g", BigDecimal(v)))
    val df = vals.toDF("grp", "v")
      .select(col("grp"), col("v").cast("decimal(12,2)").as("v"))
    val r = Stats.madOutliers(df, "grp", col("v")).collect().head
    // sorted: 10..14,100; n=6 -> lower median idx 3 -> 12
    // devs: 2,1,0,1,2,88 sorted: 0,1,1,2,2,88 -> mad idx 3 = 1
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("med") == 12.0)
    assert(r.getAs[Double]("mad") == 1.0)
    assert(r.getAs[Int]("n_outliers") == 1) // only 88 > 3*1
  }

  test("corrMatrix: exact +1/-1 on linear columns, all pairs emitted once") {
    val df = Seq((1, 2, 3), (2, 4, 2), (3, 6, 1))
      .toDF("a", "b", "c") // b = 2a (corr +1), c = 4-a (corr -1)
    val got = Stats.corrMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(got(("a", "b")) == 1.0 && got(("a", "c")) == -1.0 &&
      got(("b", "c")) == -1.0)
  }

  // --- snapshot diff -------------------------------------------------------

  test("snapshotDiff: added/removed/changed incl. null-safe payload compare") {
    val oldV = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None: Option[String], 30.0), (4L, Some("d"), 40.0))
      .toDF("k", "s", "x")
    val newV = Seq((1L, Some("a"), 10.0),            // unchanged -> absent
      (2L, Some("B"), 20.0),                          // changed payload
      (3L, Some("c"), 30.0),                          // null -> value = changed
      (5L, Some("e"), 50.0))                          // added
      .toDF("k", "s", "x")
    val got = Merge.snapshotDiff(oldV, newV, "k")
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }
}
