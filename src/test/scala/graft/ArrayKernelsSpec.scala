package graft

import graft.functions.ArrayKernels
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ArrayKernelsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("sortedIntersectCount matches size(array_intersect) on sorted distinct arrays") {
    val df = Seq(
      (Array(1L, 3L, 5L, 9L), Array(3L, 4L, 5L, 10L)),
      (Array(1L, 2L), Array(3L, 4L)),
      (Array.empty[Long], Array(1L)),
      (Array(7L), Array(7L))).toDF("a", "b")
    val got = df.select(
      ArrayKernels.sortedIntersectCount($"a", $"b").as("k"),
      size(array_intersect($"a", $"b")).as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("sortedIntersectCount is null-safe") {
    val df = Seq((Some(Array(1L)), Option.empty[Array[Long]])).toDF("a", "b")
    val got = df.select(ArrayKernels.sortedIntersectCount($"a", $"b")).collect()
    assert(got.head.isNullAt(0))
  }

  test("floatDot equals the interpreted sequential fold bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      ArrayKernels.floatDot($"a", $"b").as("k"),
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("ref")).collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact, not approx
  }

  test("floatL2SubDist equals the composed unrolled chain bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val dim = 32
    val rows = Seq.fill(40)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val df = rows.map(Tuple1(_)).toDF("v")
    // every subspace offset, including the last; centroids random per test
    for (offset <- Seq(0, 8, 24)) {
      val centroid = Array.fill(8)(rnd.nextFloat() * 2 - 1)
      val got = df.select(
        ArrayKernels.floatL2SubDist($"v", offset, centroid.map(_.toDouble)).as("k"),
        graft.ops.Similarity.pqSubDistComposed($"v", offset, centroid).as("ref")).collect()
      got.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact, not approx
    }
  }

  test("floatL2SubDist is null-safe") {
    val df = Seq(Tuple1(Option.empty[Array[Float]])).toDF("v")
    val got = df.select(
      ArrayKernels.floatL2SubDist($"v", 0, Array(1.0, 2.0))).collect()
    assert(got.head.isNullAt(0))
  }

  test("jaroWinkler matches the published reference values") {
    import graft.functions.JaroWinkler.compute
    assert(math.abs(compute("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(compute("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(compute("abc", "abc") == 1.0)
    assert(compute("abc", "xyz") == 0.0)
    assert(compute("", "x") == 0.0)
    // symmetric, bounded, and the Winkler boost never lowers jaro
    for ((a, b) <- Seq(("scan", "span"), ("merge", "mergesort"), ("a", "ab"))) {
      assert(compute(a, b) == compute(b, a))
      assert(compute(a, b) >= 0.0 && compute(a, b) <= 1.0)
    }
  }

  test("jaroWinkler expression evaluates under codegen and is null-safe") {
    val df = Seq(("martha", "marhta"), ("alpha", null))
      .toDF("a", "b")
    val got = df.select(graft.functions.JaroWinkler.jaroWinkler($"a", $"b")).collect()
    assert(math.abs(got(0).getDouble(0) - 0.9611111111111111) < 1e-15)
    assert(got(1).isNullAt(0))
  }

  test("kernels survive whole-stage codegen over a real scan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val n = emb.select(ArrayKernels.floatDot($"embedding", $"embedding").as("d"))
      .filter($"d" > 0).count()
    assert(n == 100)
  }

  // slow reference: build each deletion variant STRING explicitly and hash
  // it directly (maxDel=0 yields just the whole-string hash) — the kernel's
  // O(1)-per-variant prefix-polynomial arithmetic must agree exactly.
  // Deletions are CODE-POINT-level, the unit Spark's levenshtein counts.
  private def directVariantHashes(s: String, maxDel: Int): Set[Long] = {
    import org.apache.spark.unsafe.types.UTF8String
    def h(v: String): Long = graft.functions.HashKernels
      .deletionVariantHashes(UTF8String.fromString(v), 0)
      .toLongArray().head
    val cps = s.codePoints().toArray
    def drop(idx: Int*): String = {
      val sb = new java.lang.StringBuilder
      cps.indices.filterNot(idx.contains).foreach(i => sb.appendCodePoint(cps(i)))
      sb.toString
    }
    val dels1 = cps.indices.map(i => drop(i))
    val dels2 = for {
      i <- cps.indices; j <- cps.indices if i < j
    } yield drop(i, j)
    (Seq(s) ++ (if (maxDel >= 1) dels1 else Nil) ++
      (if (maxDel >= 2) dels2 else Nil)).map(h).toSet
  }

  test("deletionVariantHashes prefix-hash arithmetic matches direct variant hashing") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(13)
    val words = Seq("", "a", "ab", "part 12345 tomato",
      "ünïcödé名前") ++ Seq.fill(40)(
      (0 until (1 + rnd.nextInt(20))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    for (w <- words; k <- Seq(1, 2)) {
      val got = graft.functions.HashKernels
        .deletionVariantHashes(UTF8String.fromString(w), k).toLongArray().toSet
      assert(got == directVariantHashes(w, k), s"word '$w' maxDel $k")
    }
  }

  test("deletionVariantHashes has zero false negatives for edit distance <= 2") {
    val rnd = new scala.util.Random(17)
    def mutate(s: String, ops: Int): String = (1 to ops).foldLeft(s) { (t, _) =>
      if (t.isEmpty) "x"
      else rnd.nextInt(3) match {
        case 0 => val i = rnd.nextInt(t.length); t.substring(0, i) + t.substring(i + 1)
        case 1 => val i = rnd.nextInt(t.length + 1)
          t.substring(0, i) + ('a' + rnd.nextInt(26)).toChar + t.substring(i)
        case _ => val i = rnd.nextInt(t.length)
          t.substring(0, i) + ('a' + rnd.nextInt(26)).toChar + t.substring(i + 1)
      }
    }
    import org.apache.spark.unsafe.types.UTF8String
    for (_ <- 1 to 200) {
      val a = (0 until (3 + rnd.nextInt(15)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val b = mutate(a, 1 + rnd.nextInt(2)) // lev(a, b) <= 2 by construction
      val ha = graft.functions.HashKernels
        .deletionVariantHashes(UTF8String.fromString(a), 2).toLongArray().toSet
      val hb = graft.functions.HashKernels
        .deletionVariantHashes(UTF8String.fromString(b), 2).toLongArray().toSet
      assert(ha.intersect(hb).nonEmpty, s"'$a' vs '$b'")
    }
  }

  test("deletionVariantHashes counts deletions in code points like levenshtein") {
    import org.apache.spark.unsafe.types.UTF8String
    // one astral (surrogate-pair) substitution = levenshtein 1 = one
    // deletion from each side to a common string; a UTF-16 char-level
    // kernel would need 2 deletions and silently lose the candidate
    val a = "x𝄞y part"  // 𝄞
    val b = "x😀y part"  // 😀
    def hs(s: String) = graft.functions.HashKernels
      .deletionVariantHashes(UTF8String.fromString(s), 1).toLongArray().toSet
    assert(hs(a).intersect(hs(b)).nonEmpty)
    // variant count follows code-point length, not char length
    val l = a.codePointCount(0, a.length)
    assert(graft.functions.HashKernels
      .deletionVariantHashes(UTF8String.fromString(a), 2).toLongArray().length
      == 1 + l + l * (l - 1) / 2)
  }

  test("deletionVariantHashes expression runs under codegen and is null-safe") {
    val df = Seq(Some("part 42 peach"), None).toDF("s")
    val got = df.select(
      graft.functions.HashColumns.deletionVariantHashes($"s", 2).as("v")).collect()
    val l = "part 42 peach".length
    assert(got(0).getSeq[Long](0).length == 1 + l + l * (l - 1) / 2)
    assert(got(1).isNullAt(0))
  }
}
