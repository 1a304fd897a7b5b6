package graft

import graft.ops._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val docs = (0L until 200L).map(i =>
    (i, s"document number $i with shared vocabulary tokens", s"src${i % 4}", s"lang${i % 3}"))
    .toDF("doc_id", "text", "source", "lang")

  test("hashSample is deterministic, a subset, and roughly at rate") {
    val a = Pipeline.hashSample(docs, "doc_id", mod = 4, keep = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Pipeline.hashSample(docs.repartition(7), "doc_id", mod = 4, keep = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b) // stable under re-run and re-partitioning
    assert(a.subsetOf((0L until 200L).toSet))
    assert(a.size > 20 && a.size < 80) // ~25% of 200
  }

  test("splitAssign is exhaustive, disjoint, stable, and near the cuts") {
    val split = Pipeline.splitAssign(docs, "doc_id",
      cuts = Seq(80, 90), labels = Seq("train", "val", "test"))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 200)          // exhaustive: every row labeled
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts("train") > counts("val"))   // proportions follow the cuts
    // stable: the same ids land in the same split under any partitioning
    val a = split.select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Pipeline.splitAssign(docs.repartition(7), "doc_id",
        cuts = Seq(80, 90), labels = Seq("train", "val", "test"))
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Pipeline.splitAssign(docs, "doc_id", Seq(90, 80), Seq("a", "b", "c"))
    }
  }

  test("weightedSample is partitioning-invariant and weight-biased") {
    val rows = (0L until 400L).map(i => (i, if (i < 20) 10000.0 else 1.0))
      .toDF("id", "w")
    def ids(df: org.apache.spark.sql.DataFrame) = Pipeline
      .weightedSample(df, "id", "w", k = 30)
      .collect().map(_.getLong(0)).toSet
    val a = ids(rows.repartition(1))
    val b = ids(rows.repartition(13, col("id")))
    assert(a == b && a.size == 30) // the SAMPLE is a function of the data only
    // 20 ids carry 10000x the weight of the other 380: with arrival times
    // Exp(w) the probability any heavy id misses a k=30 draw is ~1e-4 —
    // and the draw is deterministic here, so this asserts the bias wiring
    assert((0L until 20L).toSet.subsetOf(a), a.toString)
  }

  test("stratifiedSample returns exactly n per stratum, deterministically") {
    val out = Pipeline.stratifiedSample(docs, "lang", "doc_id", nPerStratum = 5)
    val perStratum = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum.values.toSet == Set(5L))
    val again = Pipeline.stratifiedSample(docs, "lang", "doc_id", nPerStratum = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("mixtureSample honors 0 and 100 percent rates; unknown sources drop") {
    val out = Pipeline.mixtureSample(docs, "source", "doc_id",
      Map("src0" -> 100, "src1" -> 0, "src2" -> 50))
    val bySource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("src0") == 50L)         // rate 100 keeps every row
    assert(!bySource.contains("src1"))      // rate 0 drops all
    assert(!bySource.contains("src3"))      // absent from the map drops all
    assert(bySource("src2") > 5L && bySource("src2") < 45L)
  }

  test("decontaminate drops exactly the docs sharing an eval shingle") {
    val train = Seq(
      (0L, "alpha beta gamma delta"),      // shares 3-gram with eval
      (1L, "epsilon zeta eta theta"),      // disjoint
      (2L, "iota kappa lambda mu")).toDF("doc_id", "text")
    val ev = Seq((100L, "prefix alpha beta gamma suffix")).toDF("doc_id", "text")
    val clean = Pipeline.decontaminate(train, ev, "text", "doc_id", shingleN = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(1L, 2L))
  }

  test("redactPii masks emails and phone runs and counts them") {
    val df = Seq("reach me at jo.na+1@corp.example.org or +1-555-0199 today").toDF("t")
    val out = df.select(
      Pipeline.redactPii($"t").as("r"),
      Pipeline.countPattern($"t", Pipeline.emailPattern).as("ne"),
      Pipeline.countPattern($"t", Pipeline.phonePattern).as("np")).head()
    assert(out.getString(0).contains("<EMAIL>"))
    assert(out.getString(0).contains("<PHONE>"))
    assert(!out.getString(0).contains("@"))
    assert(out.getInt(1) == 1 && out.getInt(2) == 1)
  }

  test("bloomSemiJoin equals the exact semi join") {
    val fact = (0L until 1000L).map(i => (i, i % 100)).toDF("k", "payload")
    val dim = Seq(3L, 7L, 500L, 999L, 1500L).toDF("dk") // 1500 matches nothing
    val got = Pipeline.bloomSemiJoin(fact, dim, "k", "dk", expectedDimRows = 10L)
      .select("k").collect().map(_.getLong(0)).toSet
    val expected = fact.join(dim, $"k" === $"dk", "left_semi")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got == Set(3L, 7L, 500L, 999L))
  }

  test("chunkDocuments covers every character with overlapping windows") {
    val df = Seq((1L, "abcdefghij"), (2L, "abc"), (3L, "")).toDF("doc_id", "text")
    val got = Pipeline.chunkDocuments(df, chunkSize = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // doc 1 (10 chars): offsets 0,3,6,9 -> overlapping 4-char windows
    assert(got.filter(_._1 == 1L).toSeq ==
      Seq((1L, 0, 0, "abcd"), (1L, 1, 3, "defg"), (1L, 2, 6, "ghij"), (1L, 3, 9, "j")))
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0, 0, "abc")))
    assert(!got.exists(_._1 == 3L)) // empty text yields no chunks
    // reassembling stride-aligned prefixes reproduces the document
    val rebuilt = got.filter(_._1 == 1L).sortBy(_._2)
      .map(_._4.take(3)).mkString
    assert(rebuilt == "abcdefghij")
  }

  test("truncateTokens caps at the budget and flags the cut") {
    val df = Seq((1L, "a b c d e"), (2L, "x y")).toDF("doc_id", "text")
    val got = Pipeline.truncateTokens(df, maxTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(got(1L) == (("a b c", 5, true)))
    assert(got(2L) == (("x y", 2, false)))
  }

  test("curate drops wrong-language, low-quality, and duplicate docs") {
    val df = Seq(
      (0L, "many unique interesting words alpha beta gamma delta epsilon zeta", "web"),
      (1L, "many unique interesting words alpha beta gamma delta epsilon zeta", "web"), // dup of 0
      (2L, "the the the the the the the the", "web"),                // stopword slop
      (3L, "palabras extrañas del señor ñandú", "web"),              // not English
      (4L, "another perfectly reasonable distinct document here", "books"))
      .toDF("doc_id", "text", "source")
    val kept = Pipeline.curate(df, lang = "en", minQuality = 0.5,
        sampleMod = 1, sampleKeep = 1) // mod 1 = no downsampling
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 4L))
  }

  test("packSequences lays out a contiguous token stream per shard") {
    val df = (0L until 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Pipeline.packSequences(df, "doc_id", lit(100L) + col("doc_id") % 7,
        contextLen = 256, shards = 4)
      .select("doc_id", "shard", "window_id", "off", "n_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.forall { case (_, _, _, off, _) => off >= 0 && off < 256 })
    // within a shard, ordered by doc_id, each doc starts where the
    // previous stream position left off: start == cum_prev
    out.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, win, off, n) =>
        assert(win == cum / 256 && off == cum % 256)
        cum += n
      }
    }
    // deterministic under re-partitioning
    val again = Pipeline.packSequences(df.repartition(7), "doc_id",
        lit(100L) + col("doc_id") % 7, contextLen = 256, shards = 4)
      .select("doc_id", "shard", "window_id", "off", "n_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("sessionWindows splits on gap and matches batch semantics") {
    val dir = java.nio.file.Files.createTempDirectory("sessstream")
    val gap = 30L * 60 * 1000000
    Seq( // user 1: two sessions (gap > 30 min); user 2: one session
      graft.streaming.Streams.SessEvent(1L, 10L, 0L),
      graft.streaming.Streams.SessEvent(1L, 11L, 60L * 1000000),
      graft.streaming.Streams.SessEvent(1L, 12L, gap + 61L * 1000000 + 1),
      graft.streaming.Streams.SessEvent(2L, 20L, 5L * 1000000))
      .toDS().write.parquet(s"$dir/in")
    val src = spark.readStream
      .schema("user_id long, event_id long, ts_micros long")
      .parquet(s"$dir/in").as[graft.streaming.Streams.SessEvent]
    val q = graft.streaming.Streams.sessionWindows(src, gap)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sessions_out")
      .orderBy("user_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }
}
