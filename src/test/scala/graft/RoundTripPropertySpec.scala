package graft

import graft.flf.{FlfFormat, FlfParse}
import graft.schema._
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The round-trip invariant from SURVEY.md §5:
  * `parse(format(df, schema), schema) == df` for schema-conforming data,
  * across generated schemas (dtype/alignment/pad combinations) and
  * generated values — the property the reference only exercises manually
  * via mock → convert → inspect. Uses ScalaCheck generators with fixed
  * seeds (deterministic CI).
  */
class RoundTripPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // Pad symbols that can never collide with rendered value text:
  // digits/sign/dot excluded so numeric round-trips are unambiguous.
  private val safePads = Gen.oneOf(' ', '*', ';', '#', '_')
  private val alignments = Gen.oneOf(Alignment.Left, Alignment.Right, Alignment.Center)

  private val colGen: Gen[(FlfType, Alignment, Char)] = for {
    t <- Gen.oneOf(FlfType.Int64T, FlfType.Int32T, FlfType.Float64T,
      FlfType.BooleanT, FlfType.Utf8T)
    a <- alignments
    p <- safePads
  } yield (t, a, p)

  private def cellWidth(t: FlfType): Int = t match {
    case FlfType.Utf8T | FlfType.LargeUtf8T => 12
    case FlfType.BooleanT                   => 6
    case _                                  => 24
  }

  private def valueGen(t: FlfType): Gen[Any] = t match {
    case FlfType.Int64T   => Gen.chooseNum(-1000000000L, 1000000000L)
    case FlfType.Int32T   => Gen.chooseNum(-1000000, 1000000)
    case FlfType.Float64T => Gen.chooseNum(-1e9, 1e9).map(v => math.rint(v * 100) / 100)
    case FlfType.BooleanT => Gen.oneOf(true, false)
    case _                => Gen.oneOf("alpha", "Beta", "γδε", "日本語", "x")
  }

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("property: parse(format(df)) == df over 20 random schemas and value sets") {
    for (trial <- 0 until 20) {
      val nCols = 1 + sample(Gen.chooseNum(0, 4), trial * 131 + 1)
      var off = 0
      val cols = (0 until nCols).map { i =>
        val (t, a, p) = sample(colGen, trial * 131 + 10 + i)
        val w = cellWidth(t)
        val c = FixedColumn(s"c$i", off, w, t, a, p, isNullable = true)
        off += w
        c
      }
      val schema = FixedSchema("prop", 1, cols)
      val nRows = 1 + sample(Gen.chooseNum(0, 29), trial * 131 + 7)
      val rows = (0 until nRows).map { r =>
        Row.fromSeq(cols.zipWithIndex.map { case (c, i) =>
          sample(valueGen(c.dtype), trial * 100003 + r * 97 + i)
        })
      }
      val df = spark.createDataFrame(rows.asJava, schema.toStructType)
      val back = FlfParse.parse(FlfFormat.format(df, schema), schema)
      val expect = df.collect().map(_.toSeq).toSeq
      val got = back.collect().map(_.toSeq).toSeq
      assert(got == expect,
        s"round-trip mismatch on trial $trial, schema=${cols.map(c => (c.dtype, c.alignment, c.padSymbol))}")
    }
  }
}
