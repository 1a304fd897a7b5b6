package graft

import graft.flf.{FlfFormat, FlfParse}
import graft.mock.Mocker
import graft.schema._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class SchemaSpec extends AnyFunSuite {

  // Fixture A — reference examples/full/res/example_schema.json (FIXTURES.md §2)
  val exampleJson: String =
    """{
      |  "name": "EvolutionExampleSchema",
      |  "version": 1337,
      |  "columns": [
      |    {"name": "cool",     "offset": 0,  "length": 9,  "dtype": "Int32",   "alignment": "Right",  "pad_symbol": "Underscore", "is_nullable": false},
      |    {"name": "salary",   "offset": 9,  "length": 20, "dtype": "Float16", "alignment": "Left",   "pad_symbol": "Asterisk",   "is_nullable": false},
      |    {"name": "name",     "offset": 29, "length": 30, "dtype": "Utf8",    "alignment": "Center", "pad_symbol": "Semicolon",  "is_nullable": true},
      |    {"name": "employed", "offset": 59, "length": 8,  "dtype": "Boolean", "alignment": "Center", "pad_symbol": "Zero",       "is_nullable": true}
      |  ]
      |}""".stripMargin

  test("schema round-trips from JSON with defaults and enums") {
    val s = FixedSchema.fromJson(exampleJson)
    assert(s.name == "EvolutionExampleSchema" && s.version == 1337L)
    assert(s.rowLength == 67)
    assert(s.columns.map(_.padSymbol) == Seq('_', '*', ';', '0'))
    assert(s.columns(1).dtype == FlfType.Float16T)
    assert(s.toStructType.fields.map(_.nullable).toSeq == Seq(false, false, true, true))
    // Float16 widens to FloatType; Boolean maps to BooleanType
    assert(s.toStructType("salary").dataType.typeName == "float")
    assert(s.toStructType("employed").dataType.typeName == "boolean")
  }

  test("defaults: alignment Right, pad Whitespace when omitted") {
    val s = FixedSchema.fromJson(
      """{"name":"d","version":1,"columns":[{"name":"x","offset":0,"length":4,"dtype":"Int32","is_nullable":true}]}""")
    assert(s.columns.head.alignment == Alignment.Right)
    assert(s.columns.head.padSymbol == ' ')
  }

  test("malformed JSON (trailing comma) fails like serde") {
    val bad = """{"name":"x","version":1,"columns":[{"name":"a","offset":0,"length":1,"dtype":"Utf8","is_nullable":true},]}"""
    assertThrows[SchemaError](FixedSchema.fromJson(bad))
  }

  test("invalid dtype / alignment / pad symbol / empty columns fail") {
    assertThrows[SchemaError](FixedSchema.fromJson(
      """{"name":"x","version":1,"columns":[{"name":"a","offset":0,"length":1,"dtype":"Decimal","is_nullable":true}]}"""))
    assertThrows[SchemaError](FixedSchema.fromJson(
      """{"name":"x","version":1,"columns":[{"name":"a","offset":0,"length":1,"dtype":"Utf8","alignment":"Middle","is_nullable":true}]}"""))
    assertThrows[SchemaError](FixedSchema.fromJson(
      """{"name":"x","version":1,"columns":[{"name":"a","offset":0,"length":1,"dtype":"Utf8","pad_symbol":"Tilde","is_nullable":true}]}"""))
    assertThrows[SchemaError](FixedSchema.fromJson("""{"name":"x","version":1,"columns":[]}"""))
    assertThrows[SchemaError](FixedSchema.fromJson("""{"version":1,"columns":[]}"""))
  }

  test("all 21 pad symbols resolve") {
    assert(PadSymbol.table.size == 21)
    assert(PadSymbol.table.values.toSet.size == 21)
  }
}

class FlfParseSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val schemaA: FixedSchema = FixedSchema.fromJson(new SchemaSpec().exampleJson)

  test("fixture A example row parses to expected values") {
    // 67-char row from FIXTURES.md §2
    val row = "_____1234-42.5***************;;;;;;;;;;;;Alice;;;;;;;;;;;;;000true0"
    assert(row.length == 67)
    val got = FlfParse.parse(Seq(row).toDF("value"), schemaA).collect().head
    assert(got.getInt(0) == 1234)
    assert(got.getFloat(1) == -42.5f)
    assert(got.getString(2) == "Alice")
    assert(got.getBoolean(3) == true)
  }

  test("nullable garbage -> NULL, job continues (N1)") {
    val row = "_____1234-42.5***************;;;;;;;;;;;;Alice;;;;;;;;;;;;;0banana0"
    val got = FlfParse.parse(Seq(row).toDF("value"), schemaA).collect().head
    assert(got.isNullAt(3))
  }

  test("non-nullable garbage aborts the job (N2 strict abort)") {
    val row = "____12ab_-42.5***************;;;;;;;;;;;;Alice;;;;;;;;;;;;;000true0"
    val ex = intercept[Exception] {
      FlfParse.parse(Seq(row).toDF("value"), schemaA).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("strict-mode abort")))
  }

  test("quarantine mode flags non-nullable failures, keeps raw line, nullable nulls pass") {
    val good = "_____1234-42.5***************;;;;;;;;;;;;Alice;;;;;;;;;;;;;000true0"
    val badNN = "____12ab_-42.5***************;;;;;;;;;;;;Alice;;;;;;;;;;;;;000true0" // cool unparseable
    val badN = "_____1234-42.5***************;;;;;;;;;;;;Alice;;;;;;;;;;;;;0banana0" // employed (nullable) garbage
    val got = FlfParse.parseQuarantine(
        Seq(good, badNN, badN).toDF("value"), schemaA)
      .collect().map(r => r.getString(0) -> r.getBoolean(r.length - 1)).toMap
    assert(got(good) == false)
    assert(got(badNN) == true) // non-nullable 'cool' failed -> quarantined
    assert(got(badN) == false) // nullable failure stays append-or-null
    // the split is exhaustive and the raw line survives for repair
    val q = FlfParse.parseQuarantine(Seq(good, badNN).toDF("value"), schemaA)
    assert(q.filter(org.apache.spark.sql.functions.col("_quarantined"))
      .select("value").collect()
      .map(_.getString(0)).toSeq == Seq(badNN))
  }

  test("boolean grammar is strict: only 'true'/'false' (C1)") {
    // Spark's loose cast would accept 't'/'1'; the reference does not.
    val rows = Seq("t", "1", "TRUE", "true", "false").map(v =>
      f"$v%-8s".replace(' ', '0'))
    val schema = FixedSchema(name = "b", version = 1, columns = Seq(
      FixedColumn("b", 0, 8, FlfType.BooleanT, Alignment.Left, '0', isNullable = true)))
    val got = FlfParse.parse(rows.toDF("value"), schema).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(got.toSeq == Seq(None, None, None, Some(true), Some(false)))
  }

  test("multi-byte UTF-8: offsets count characters, not bytes") {
    // 'Åsa' and '日本' occupy 3 and 2 character cells regardless of bytes
    val schema = FixedSchema(name = "u", version = 1, columns = Seq(
      FixedColumn("a", 0, 6, FlfType.Utf8T, Alignment.Left, '*', isNullable = true),
      FixedColumn("n", 6, 4, FlfType.Int32T, Alignment.Right, '0', isNullable = false)))
    val got = FlfParse.parse(Seq("Åsa日本*0042").toDF("value"), schema).collect().head
    assert(got.getString(0) == "Åsa日本")
    assert(got.getInt(1) == 42)
  }

  test("int overflow -> NULL on nullable (C3 overflow => None)") {
    val schema = FixedSchema(name = "o", version = 1, columns = Seq(
      FixedColumn("i", 0, 12, FlfType.Int16T, Alignment.Right, ' ', isNullable = true)))
    val got = FlfParse.parse(Seq("       99999").toDF("value"), schema).collect().head
    assert(got.isNullAt(0))
  }

  test("fixture B: defaults, LargeUtf8, hyphen-padded bool, dash in column name") {
    // FIXTURES.md §3 (reference test_valid_schema.json), trimmed to the
    // interesting columns
    val schema = FixedSchema.fromJson(
      """{"name":"ValidTestSchema","version":1337,"columns":[
        |{"name":"id","offset":0,"length":9,"dtype":"Int32","is_nullable":false},
        |{"name":"employed","offset":9,"length":5,"dtype":"Boolean","pad_symbol":"Hyphen","is_nullable":true},
        |{"name":"pet-name","offset":14,"length":50,"dtype":"LargeUtf8","alignment":"Left","pad_symbol":"Asterisk","is_nullable":true}
        |]}""".stripMargin)
    assert(schema.columns.head.alignment == Alignment.Right) // default
    val row = "      123-true" + "Rex" + "*" * 47
    assert(row.length == 64)
    val got = FlfParse.parse(Seq(row).toDF("value"), schema).collect().head
    assert(got.getInt(0) == 123)
    assert(got.getBoolean(1) == true)
    assert(got.getString(2) == "Rex")
    // dash in the column name round-trips through the DataFrame schema
    assert(FlfParse.parse(Seq(row).toDF("value"), schema).columns.toSeq ==
      Seq("id", "employed", "pet-name"))
  }

  test("EOF without trailing newline still parses the final row") {
    val dir = java.nio.file.Files.createTempDirectory("flfeof")
    java.nio.file.Files.write(dir.resolve("data.flf"),
      "00000001\n00000002".getBytes("UTF-8")) // no trailing \n
    val schema = FixedSchema(name = "e", version = 1, columns = Seq(
      FixedColumn("id", 0, 8, FlfType.Int64T, Alignment.Right, '0', isNullable = false)))
    val got = FlfParse.read(spark, dir.toString, schema).orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("center alignment trims both sides; digits as pad symbols work") {
    val schema = FixedSchema(name = "c", version = 1, columns = Seq(
      FixedColumn("v", 0, 11, FlfType.Int32T, Alignment.Center, '9', isNullable = true)))
    val got = FlfParse.parse(Seq("99991234999").toDF("value"), schema).collect().head
    assert(got.getInt(0) == 1234)
  }
}

class ConvertMetricsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("convert observes row and per-column null counters on the write pass") {
    val dir = java.nio.file.Files.createTempDirectory("obsconv")
    val schemaJson =
      """{"name":"m","version":1,"columns":[
        |{"name":"id","offset":0,"length":6,"dtype":"Int64","alignment":"Right","pad_symbol":"Zero","is_nullable":false},
        |{"name":"score","offset":6,"length":4,"dtype":"Int32","alignment":"Right","pad_symbol":"Whitespace","is_nullable":true}
        |]}""".stripMargin
    java.nio.file.Files.writeString(dir.resolve("schema.json"), schemaJson)
    java.nio.file.Files.writeString(dir.resolve("in.flf"),
      "000001  42\n000002 bad\n000003    \n") // one garbage + one all-pad null
    val metrics = Evolution.convert(spark, s"$dir/in.flf", s"$dir/schema.json",
      s"$dir/out.parquet")
    assert(metrics("n_rows") == 3L)
    assert(metrics("nulls__score") == 2L)
    // the counters piggybacked on the real write: output exists and matches
    assert(spark.read.parquet(s"$dir/out.parquet").count() == 3L)
  }

  test("convert --quarantine routes non-nullable failures aside instead of aborting") {
    val dir = java.nio.file.Files.createTempDirectory("qconv")
    val schemaJson =
      """{"name":"m","version":1,"columns":[
        |{"name":"id","offset":0,"length":6,"dtype":"Int64","alignment":"Right","pad_symbol":"Zero","is_nullable":false},
        |{"name":"score","offset":6,"length":4,"dtype":"Int32","alignment":"Right","pad_symbol":"Whitespace","is_nullable":true}
        |]}""".stripMargin
    java.nio.file.Files.writeString(dir.resolve("schema.json"), schemaJson)
    java.nio.file.Files.writeString(dir.resolve("in.flf"),
      "000001  42\n00bad!  77\n000003    \n") // row 2: non-nullable id garbage
    // strict mode aborts on the bad id…
    val ex = intercept[Exception] {
      Evolution.convert(spark, s"$dir/in.flf", s"$dir/schema.json",
        s"$dir/strict.parquet")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("strict-mode abort")))
    // …quarantine mode converts the clean rows and sidelines the bad line
    val metrics = Evolution.convert(spark, s"$dir/in.flf", s"$dir/schema.json",
      s"$dir/out.parquet", quarantine = Some(s"$dir/bad"))
    assert(metrics("n_rows") == 2L)
    assert(metrics("n_quarantined") == 1L)
    assert(spark.read.parquet(s"$dir/out.parquet").count() == 2L)
    assert(spark.read.text(s"$dir/bad").collect()
      .map(_.getString(0)).toSeq == Seq("00bad!  77"))
  }
}

class CurateCliSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def corpus(dir: String): String = {
    val filler = (0 until 60).map(i => s"word$i").mkString(" ")
    val p = s"$dir/docs.parquet"
    Seq(
      (0L, s"the cat and dog of $filler"),   // gopher-passing
      (1L, s"the cat and dog of $filler"),   // exact dup of 0
      (2L, s"THE  cat and dog of $filler"),  // case/space variant of 0
      (3L, "short doc"),                     // fails gopher word count
      (4L, s"the bird and fish of $filler")) // distinct, passing
      .toDF("doc_id", "text").write.mode("overwrite").parquet(p)
    p
  }

  test("curate ops: dedup, sample, split, gopher filter, normalize end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("curate").toString
    val in = corpus(dir)

    val d = Evolution.curate(spark, "dedup-exact", in, s"$dir/dedup")
    assert(d == Map("n_in" -> 5L, "n_out" -> 4L)) // doc 1 dropped, 2 kept (differs)
    assert(spark.read.parquet(s"$dir/dedup").select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(0L, 2L, 3L, 4L))

    // normalize then dedup: the case/space variant now collapses too
    Evolution.curate(spark, "normalize", in, s"$dir/norm")
    val d2 = Evolution.curate(spark, "dedup-exact", s"$dir/norm", s"$dir/dedup2")
    assert(d2("n_out") == 3L) // docs 0, 3, 4

    val g = Evolution.curate(spark, "gopher-filter", in, s"$dir/gopher")
    assert(spark.read.parquet(s"$dir/gopher").select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L, 4L)) // 3 too short

    val sp = Evolution.curate(spark, "split", in, s"$dir/split")
    val splits = spark.read.parquet(s"$dir/split")
    assert(sp("n_out") == 5L)
    assert(splits.columns.contains("split"))
    assert(splits.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")))

    val h = Evolution.curate(spark, "sample-hash", in, s"$dir/sample",
      mod = 2, keep = 1)
    assert(h("n_out") > 0L && h("n_out") < 5L) // a real deterministic subset

    // token-budget with each doc its own stratum: only the 2-token doc
    // fits a 50-token budget (the 65-token docs overflow immediately)
    val tb = Evolution.curate(spark, "token-budget", in, s"$dir/tb",
      stratumCol = "doc_id", budget = 50L)
    assert(tb("n_out") == 1L)
    assert(spark.read.parquet(s"$dir/tb").select("doc_id").collect()
      .map(_.getLong(0)).toSeq == Seq(3L))

    val ep = Evolution.curate(spark, "epoch-shuffle", in, s"$dir/epoch",
      epoch = 1, shards = 4)
    val shuffled = spark.read.parquet(s"$dir/epoch")
    assert(ep("n_out") == 5L)
    assert(shuffled.columns.contains("shard") && shuffled.columns.contains("pos"))

    // url-dedup: tracking params / case / port variants collapse to one
    // canonical form; the min-id row survives per form
    val urls = Seq(
      (0L, "HTTPS://WWW.A.COM:443/p?utm_source=x&b=2&a=1"),
      (1L, "https://a.com/p?a=1&b=2"),
      (2L, "https://a.com/p?a=1&b=2#frag"),
      (3L, "https://a.com/q?a=1")).toDF("doc_id", "url")
    urls.write.mode("overwrite").parquet(s"$dir/urls")
    val ud = Evolution.curate(spark, "url-dedup", s"$dir/urls", s"$dir/urldedup")
    assert(ud == Map("n_in" -> 4L, "n_out" -> 2L))
    assert(spark.read.parquet(s"$dir/urldedup").select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(0L, 3L))

    // audit: total accounting — one row per input doc, kept + flags
    val au = Evolution.curate(spark, "audit", in, s"$dir/audit",
      mod = 2, keep = 1)
    val audit = spark.read.parquet(s"$dir/audit")
    assert(au("n_out") == 5L)
    assert(audit.columns.toSet ==
      Set("doc_id", "f_lang", "f_quality", "f_dup", "f_sample", "kept"))

    val e = intercept[IllegalArgumentException] {
      Evolution.curate(spark, "nope", in, s"$dir/x")
    }
    assert(e.getMessage.contains("unknown curate op"))
  }

  test("analyze ops: heaps, vocab-coverage, zipf, quality reports end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("analyze").toString
    val in = s"$dir/docs"
    (0L until 20L).map(i => (i, s"tok${i % 7} tok${i % 3} common"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val nh = Evolution.analyze(spark, "heaps", in, s"$dir/heaps", bucketDocs = 5)
    assert(nh == 4L)
    val heaps = spark.read.parquet(s"$dir/heaps").orderBy("bucket").collect()
    assert(heaps.last.getAs[Long]("tokens_seen") == 60L)
    assert(heaps.last.getAs[Long]("vocab") == 8L) // tok0..tok6 + common
    val nc = Evolution.analyze(spark, "vocab-coverage", in, s"$dir/cov",
      ks = Seq(1, 11))
    assert(nc == 2L)
    val cov = spark.read.parquet(s"$dir/cov").orderBy("k").collect()
    assert(cov.head.getAs[Long]("covered") == 20L) // "common", once per doc
    assert(cov.last.getAs[Long]("coverage_x1e6") == 1000000L)
    assert(Evolution.analyze(spark, "zipf", in, s"$dir/zipf") == 1L) // 8 ranks, all decade 0
    assert(Evolution.analyze(spark, "quality", in, s"$dir/q") == 20L)
    val e = intercept[IllegalArgumentException] {
      Evolution.analyze(spark, "nope", in, s"$dir/x")
    }
    assert(e.getMessage.contains("unknown analyze op"))
  }

  test("analyze drift ops: psi/drift compare -i against -j; hill reports " +
    "the tail index") {
    val dir = java.nio.file.Files.createTempDirectory("analyze2").toString
    val ref = s"$dir/ref"; val cur = s"$dir/cur"
    (0L until 20L).map(i => (i, if (i % 4 == 0) "web" else "books"))
      .toDF("doc_id", "source").write.mode("overwrite").parquet(ref)
    (0L until 20L).map(i => (i, if (i % 2 == 0) "web" else "books"))
      .toDF("doc_id", "source").write.mode("overwrite").parquet(cur)
    assert(Evolution.analyze(spark, "psi", cur, s"$dir/psi",
      input2 = Some(ref)) == 1L)
    val psi = spark.read.parquet(s"$dir/psi").collect().head
    assert(psi.getAs[Double]("psi") > 0.0) // 25/75 → 50/50 drifted
    assert(Evolution.analyze(spark, "drift", cur, s"$dir/panel",
      input2 = Some(ref)) == 1L)
    assert(spark.read.parquet(s"$dir/panel").collect().head
      .getAs[Double]("tvd") == 0.25)
    // psi without -j is a usage error, not a silent self-compare
    val e = intercept[RuntimeException] {
      Evolution.analyze(spark, "psi", cur, s"$dir/y")
    }
    assert(e.getMessage.contains("-j"))
    // distinct tokens with freqs 16,8,4,2,1 ×2: top-2 both 16, ref 8
    (0L until 10L).map(i => (i, (s"t$i " * (1 << (4 - i.toInt % 5))).trim))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/txt")
    assert(Evolution.analyze(spark, "hill", s"$dir/txt", s"$dir/hill",
      k = 2) == 1L)
    val hill = spark.read.parquet(s"$dir/hill").collect().head
    assert(hill.getAs[Long]("f_ref") == 8L)
    assert(math.abs(hill.getAs[Double]("hill_alpha") - 1.0 / math.log(2.0))
      < 1e-5)
  }
}

class FlfEvolveSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val v1 = FixedSchema("ev", 1, Seq(
    FixedColumn("id", 0, 6, FlfType.Int64T, Alignment.Right, '0', isNullable = true),
    FixedColumn("w", 6, 8, FlfType.Utf8T, Alignment.Left, ' ', isNullable = true)))
  private val v2 = FixedSchema("ev", 2, Seq(
    v1.columns.head,
    FixedColumn("w", 6, 8, FlfType.Utf8T, Alignment.Left, ' ', isNullable = true),
    FixedColumn("score", 14, 5, FlfType.Int32T, Alignment.Right, ' ', isNullable = true)))

  test("parseEvolving null-fills columns a generation predates") {
    val g1 = Seq("000001alpha   ").toDF("value")
    val g2 = Seq("000002beta       42").toDF("value")
    val got = graft.flf.FlfParse.parseEvolving(Seq((g1, v1), (g2, v2)))
      .orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(got(0).isNullAt(2) && got(1).getInt(2) == 42)
    assert(got.map(_.getString(1)).toSeq == Seq("alpha", "beta"))
  }

  test("parseEvolving drops columns the newest schema removed") {
    val v2drop = FixedSchema("ev", 2, Seq(v1.columns.head))
    val g1 = Seq("000007gone    ").toDF("value")
    val got = graft.flf.FlfParse.parseEvolving(Seq((g1, v1), (g1, v2drop)))
    assert(got.columns.toSeq == Seq("id"))
    assert(got.count() == 2)
  }

  test("parseEvolving rejects dtype drift on a shared column name") {
    val v2bad = FixedSchema("ev", 2, Seq(
      v1.columns.head,
      FixedColumn("w", 6, 8, FlfType.Int32T, Alignment.Right, ' ', isNullable = true)))
    val g = Seq("000001alpha   ").toDF("value")
    val e = intercept[IllegalArgumentException] {
      graft.flf.FlfParse.parseEvolving(Seq((g, v1), (g, v2bad)))
    }
    assert(e.getMessage.contains("column 'w'"))
  }
}

class FlfFormatSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("center padding splits floor-left / ceil-right like the reference padder") {
    val schema = FixedSchema(name = "c", version = 1, columns = Seq(
      FixedColumn("name", 0, 30, FlfType.Utf8T, Alignment.Center, ';', isNullable = true)))
    val line = FlfFormat.format(Seq("Alice").toDF("name"), schema).as[String].collect().head
    assert(line == ";" * 12 + "Alice" + ";" * 13) // FIXTURES.md §2 expected cell
  }

  test("round-trip: parse(format(df)) == df for schema-conforming data") {
    val schema = FixedSchema(name = "rt", version = 1, columns = Seq(
      FixedColumn("id", 0, 10, FlfType.Int64T, Alignment.Right, '0', isNullable = false),
      FixedColumn("word", 10, 12, FlfType.Utf8T, Alignment.Left, '*', isNullable = true),
      FixedColumn("flag", 22, 6, FlfType.BooleanT, Alignment.Center, '-', isNullable = true),
      FixedColumn("score", 28, 14, FlfType.Float64T, Alignment.Right, ' ', isNullable = true)))
    val df = Seq(
      (1L, "alpha", true, 1.5),
      (-42L, "beta", false, -0.25),
      (999999999L, "gamma", true, 1024.0)).toDF("id", "word", "flag", "score")
    val back = FlfParse.parse(FlfFormat.format(df, schema), schema)
    val a = df.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("mocked data round-trips through flf for every dtype (EP2 + EP1)") {
    val schema = FixedSchema(name = "mock", version = 1, columns = Seq(
      FixedColumn("b", 0, 6, FlfType.BooleanT, Alignment.Left, ' ', isNullable = true),
      FixedColumn("f32", 6, 18, FlfType.Float32T, Alignment.Right, ' ', isNullable = true),
      FixedColumn("f64", 24, 26, FlfType.Float64T, Alignment.Right, ' ', isNullable = true),
      FixedColumn("i16", 50, 7, FlfType.Int16T, Alignment.Right, ' ', isNullable = true),
      FixedColumn("i32", 57, 12, FlfType.Int32T, Alignment.Right, ' ', isNullable = true),
      FixedColumn("i64", 69, 14, FlfType.Int64T, Alignment.Right, ' ', isNullable = true),
      FixedColumn("s", 83, 16, FlfType.Utf8T, Alignment.Left, ' ', isNullable = true)))
    val df = Mocker.mock(spark, schema, 500, seed = 7, numPartitions = 4).cache()
    val back = FlfParse.parse(FlfFormat.format(df, schema), schema)
    assert(df.count() == 500)
    val a = df.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("all 21 pad symbols round-trip for every alignment") {
    for (align <- Seq(Alignment.Left, Alignment.Right, Alignment.Center);
         (_, pad) <- PadSymbol.table.toSeq.sortBy(_._2)) {
      val schema = FixedSchema(name = "pads", version = 1, columns = Seq(
        FixedColumn("w", 0, 12, FlfType.Utf8T, align, pad, isNullable = true)))
      val df = Seq("abc", "XY").toDF("w")
      val back = FlfParse.parse(FlfFormat.format(df, schema), schema)
      assert(back.collect().map(_.getString(0)).toSet == Set("abc", "XY"),
        s"pad '$pad' alignment $align")
    }
  }

  test("mocker ranges respect the reference distributions") {
    val schema = FixedSchema(name = "r", version = 1, columns = Seq(
      FixedColumn("f16", 0, 12, FlfType.Float16T, Alignment.Right, ' ', isNullable = true),
      FixedColumn("i16", 12, 7, FlfType.Int16T, Alignment.Right, ' ', isNullable = true),
      FixedColumn("s", 19, 16, FlfType.Utf8T, Alignment.Left, ' ', isNullable = true)))
    val rows = Mocker.mock(spark, schema, 2000, seed = 11).collect()
    assert(rows.forall(r => math.abs(r.getFloat(0)) <= 256f))
    assert(rows.forall(r => math.abs(r.getShort(1).toInt) <= 10000))
    assert(rows.forall(r => r.getString(2).nonEmpty))
    // seeded => deterministic
    val again = Mocker.mock(spark, schema, 2000, seed = 11).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}

/** SliceFixedLine (fused one-pass cell extraction) must agree with the
  * composed substring/trim path on every alignment, pad, and multi-byte
  * edge — including mocked data for every dtype.
  */
class SliceFixedLineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def check(schema: FixedSchema, lines: Seq[String]): Unit = {
    val df = lines.toDF("value")
    val fused = FlfParse.parse(df, schema).collect().map(_.toSeq)
    val composed = FlfParse.parseComposed(df, schema).collect().map(_.toSeq)
    assert(fused.toSeq == composed.toSeq)
  }

  test("fused slicer == composed path on fixture A + edge rows") {
    val schema = FixedSchema(name = "a", version = 1, columns = Seq(
      FixedColumn("cool", 0, 9, FlfType.Int32T, Alignment.Right, '_', isNullable = true),
      FixedColumn("salary", 9, 20, FlfType.Float32T, Alignment.Left, '*', isNullable = true),
      FixedColumn("name", 29, 30, FlfType.Utf8T, Alignment.Center, ';', isNullable = true),
      FixedColumn("employed", 59, 8, FlfType.BooleanT, Alignment.Center, '0', isNullable = true)))
    check(schema, Seq(
      "_____1234-42.5***************;;;;;;;;;;;;Alice;;;;;;;;;;;;;000true0",
      "_________********************;;;;;;;;;;;;;;;;;;;;;;;;;;;;;;00000000",
      "garbage",                         // short row: clamped cells
      "",                                // empty row
      "_____1234-42.5***************;;;;;;;;;;;;Überläuferin;;;;;000true0")) // multi-byte
  }

  test("fused slicer == composed path on code-point fuzz incl. astral plane") {
    val schema = FixedSchema(name = "f", version = 1, columns = Seq(
      FixedColumn("a", 0, 4, FlfType.Utf8T, Alignment.Right, '0', isNullable = true),
      FixedColumn("b", 4, 5, FlfType.Utf8T, Alignment.Center, ' ', isNullable = true),
      FixedColumn("c", 9, 3, FlfType.Utf8T, Alignment.Left, '*', isNullable = true)))
    val rnd = new scala.util.Random(41)
    // BMP ASCII + pads + multi-byte BMP + astral (surrogate-pair) chars
    val pool = Array("0", " ", "*", "a", "é", "漢", "😀", "𐀀")
    val lines = (1 to 400).map(_ =>
      (0 until rnd.nextInt(16)).map(_ => pool(rnd.nextInt(pool.length))).mkString)
    check(schema, lines)
  }

  test("fused slicer == composed path on mocked data for a wide mixed schema") {
    val schema = FixedSchema(name = "w", version = 1, columns = Seq(
      FixedColumn("i16", 0, 7, FlfType.Int16T, Alignment.Right, '0', isNullable = true),
      FixedColumn("i64", 7, 14, FlfType.Int64T, Alignment.Right, ' ', isNullable = true),
      FixedColumn("f64", 21, 24, FlfType.Float64T, Alignment.Left, ' ', isNullable = true),
      FixedColumn("u", 45, 12, FlfType.Utf8T, Alignment.Center, '.', isNullable = true),
      FixedColumn("b", 57, 7, FlfType.BooleanT, Alignment.Left, '-', isNullable = true)))
    val flf = FlfFormat.format(graft.mock.Mocker.mock(spark, schema, 300, seed = 5), schema)
    check(schema, flf.collect().map(_.getString(0)).toSeq)
  }
}

/** Sink-target coverage (SURVEY.md §2.5 W1/W3): ORC is a built-in source
  * and must convert end-to-end; avro/delta/iceberg connectors are not
  * bundled in this distribution, so the engine must fail with an explicit
  * missing-connector message (strictly more than the reference, where
  * these targets are `todo!()` — examples/delta/src/main.rs:28-30).
  */
class TargetSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val schemaJson =
    """{"name":"t","version":1,"columns":[
      |{"name":"id","offset":0,"length":8,"dtype":"Int64","alignment":"Right","pad_symbol":"Zero","is_nullable":false},
      |{"name":"w","offset":8,"length":8,"dtype":"Utf8","alignment":"Left","pad_symbol":"Whitespace","is_nullable":true}]}"""
      .stripMargin

  private def setup(): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_target")
    val sp = dir.resolve("schema.json")
    java.nio.file.Files.writeString(sp, schemaJson)
    Evolution.mock(spark, sp.toString, dir.resolve("m.flf").toString, nRows = 500, seed = 3)
    (dir.toString, sp.toString)
  }

  test("orc target converts end-to-end and re-reads with the declared schema") {
    val (dir, sp) = setup()
    Evolution.convert(spark, s"$dir/m.flf", sp, s"$dir/out.orc", Target.Orc)
    val back = spark.read.orc(s"$dir/out.orc")
    assert(back.count() == 500)
    assert(back.schema.fieldNames.toSeq == Seq("id", "w"))
    assert(back.schema("id").dataType.typeName == "long")
  }

  test("write modes: default refuses to overwrite; --truncate-existing replaces") {
    val (dir, sp) = setup()
    Evolution.convert(spark, s"$dir/m.flf", sp, s"$dir/out_mode", mode = "errorifexists")
    intercept[Exception] { // force-create-new semantics (writer.rs:173-179)
      Evolution.convert(spark, s"$dir/m.flf", sp, s"$dir/out_mode", mode = "errorifexists")
    }
    Evolution.convert(spark, s"$dir/m.flf", sp, s"$dir/out_mode", mode = "overwrite")
    assert(spark.read.parquet(s"$dir/out_mode").count() == 500)
  }

  test("ipc target writes real Arrow IPC files that an Arrow reader round-trips") {
    val (dir, sp) = setup()
    val metrics = Evolution.convert(spark, s"$dir/m.flf", sp, s"$dir/out.ipc",
      Target.Ipc, coalesce1 = true)
    assert(metrics("n_rows") == 500L) // observe() metrics fire for the RDD write
    val parts = new java.io.File(s"$dir/out.ipc").listFiles()
      .filter(_.getName.endsWith(".arrow")).sortBy(_.getName)
    assert(parts.nonEmpty)
    assert(new java.io.File(s"$dir/out.ipc/_SUCCESS").exists())
    // independent re-read through the Arrow runtime (not our writer code)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    var n = 0L
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (p <- parts) {
      val ch = java.nio.channels.FileChannel.open(p.toPath)
      val rd = new org.apache.arrow.vector.ipc.ArrowFileReader(ch, alloc)
      try {
        assert(rd.getVectorSchemaRoot.getSchema.getFields.size == 2)
        while (rd.loadNextBatch()) {
          val root = rd.getVectorSchemaRoot
          val idVec = root.getVector("id").asInstanceOf[org.apache.arrow.vector.BigIntVector]
          for (i <- 0 until root.getRowCount) ids += idVec.get(i)
          n += root.getRowCount
        }
      } finally { rd.close(); ch.close() }
    }
    alloc.close()
    assert(n == 500)
    // values must match what the parquet path produces for the same input
    Evolution.convert(spark, s"$dir/m.flf", sp, s"$dir/out.parquet", Target.Parquet)
    val expected = spark.read.parquet(s"$dir/out.parquet")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids.sorted.toSeq == expected)
    // and IpcSource closes the loop inside the engine: full-row equality
    val back = graft.sources.IpcSource.read(spark, s"$dir/out.ipc")
    assert(back.schema.fieldNames.toSeq == Seq("id", "w"))
    val parquetRows = spark.read.parquet(s"$dir/out.parquet")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val ipcRows = back.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(ipcRows == parquetRows)
  }

  // Lakehouse-connector integration cases: gated on the connector actually
  // being on the classpath (zero-egress containers ship without the jars),
  // so they report CANCELED here and run for real wherever delta-spark /
  // iceberg-spark-runtime is deployed. Reference parity for these targets
  // is todo!() (examples/delta/src/main.rs:28-30) — this is extra ground.
  for ((target, providerClass) <- Seq(
      Target.Delta -> "org.apache.spark.sql.delta.sources.DeltaDataSource",
      Target.Iceberg -> "org.apache.iceberg.spark.source.IcebergSource"))
    test(s"${target.format} target round-trips when its connector jar is present") {
      val present =
        try { Class.forName(providerClass); true }
        catch { case _: ClassNotFoundException => false }
      assume(present, s"${target.format} connector not on the classpath")
      val (dir, sp) = setup()
      Evolution.convert(spark, s"$dir/m.flf", sp, s"$dir/it_${target.format}", target)
      val back = spark.read.format(target.format).load(s"$dir/it_${target.format}")
      assert(back.count() == 500)
      assert(back.schema.fieldNames.toSeq == Seq("id", "w"))
    }

  test("absent-connector targets fail with an explicit message, not a stack of class errors") {
    val (dir, sp) = setup()
    for (t <- Seq(Target.Avro, Target.Delta)) {
      val e = intercept[UnsupportedOperationException] {
        Evolution.convert(spark, s"$dir/m.flf", sp, s"$dir/out_${t.format}", t)
      }
      assert(e.getMessage.contains(t.format))
    }
  }
}
