package graft

import graft.flf.FlfParse
import graft.functions.HashColumns
import graft.mock.Mocker
import graft.ops._
import graft.schema._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import scala.collection.mutable

/** The engine's declared query surface: one entry per operator from
  * SURVEY.md §2 (flf kernel family) plus the general relational surface
  * (§2.7) and the LLM-data-pipeline extensions (§7.5). Each SQL-expressible
  * query carries an equivalent DuckDB oracle; float discipline throughout:
  * reductions run over exact decimals (cast to double at the end), ratios
  * are single deterministic IEEE divisions, and every query is fully
  * ordered with unique tie-breakers.
  */
object Queries {

  private val reg =
    mutable.LinkedHashMap[String, ((SparkSession, String) => DataFrame, Option[String])]()

  private def q(name: String, oracleSql: String)(fn: (SparkSession, String) => DataFrame): Unit =
    reg(name) = (fn, Some(oracleSql))
  private def qRowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Unit =
    reg(name) = (fn, None)

  def all: Map[String, (SparkSession, String) => DataFrame] =
    reg.view.mapValues(_._1).toMap
  def oracle: Map[String, String] =
    reg.collect { case (n, (_, Some(sql))) => n -> sql }.toMap

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** One-time landing-directory setup for streaming queries, cached per
    * (query, sfDir): the bench runs each query twice and takes the best,
    * which should measure the STREAM's steady state, not re-pay the batch
    * write that fabricates its input.
    */
  /** Run `body` with spark.sql.shuffle.partitions pinned to `n`,
    * restoring the prior value afterwards — stateful streaming creates
    * one state store per shuffle partition, so the stream queries pin a
    * small count around start() (see each call site).
    */
  private def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prior = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prior)
  }

  private val landingCache = new scala.collection.concurrent.TrieMap[String, String]()
  private def cachedLanding(key: String)(build: String => Unit): String =
    landingCache.getOrElseUpdate(key, {
      val d = java.nio.file.Files
        .createTempDirectory("graft_landing").toString
      build(d)
      d
    })

  /** Normalize the events timestamp to TIMESTAMP_NTZ microseconds however
    * Spark surfaced the parquet ns column (NTZ / LTZ / legacy long).
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    // Spark rejects parquet TIMESTAMP(NANOS) outright without this.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = tbl(s, dir, "events")
    df.schema("ts").dataType match {
      case LongType => // legacy nanos-as-long: integer-divide to micros
        df.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case TimestampType => df.withColumn("ts", col("ts").cast(TimestampNTZType))
      case _             => df
    }
  }

  private def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))
  /** price * (1 - discount) as exact decimal (scale-pinned on both engines). */
  private def discPrice(price: Column, disc: Column): Column =
    dec(price, 12, 2) * dec(lit(1) - dec(disc, 4, 2), 4, 2)
  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))"

  // ===========================================================================
  // flf kernel family — SURVEY.md §2.1–2.6 expressed as DuckDB-checkable
  // queries: W2/G2 (format), P1–P4 + C1–C4 + N1 (parse), round-trip.
  // ===========================================================================

  /** The fixed-width layout used by the flf queries (over lineitem). */
  private val flfCols = Seq(
    FixedColumn("l_orderkey", 0, 12, FlfType.Int64T, Alignment.Right, '0', isNullable = true),
    FixedColumn("l_linenumber", 12, 4, FlfType.Int32T, Alignment.Right, ' ', isNullable = true),
    FixedColumn("l_returnflag", 16, 2, FlfType.Utf8T, Alignment.Left, '_', isNullable = true),
    FixedColumn("l_linestatus", 18, 2, FlfType.Utf8T, Alignment.Left, '_', isNullable = true),
    FixedColumn("l_quantity", 20, 6, FlfType.Int32T, Alignment.Right, ' ', isNullable = true),
    FixedColumn("l_extendedprice", 26, 14, FlfType.Float64T, Alignment.Right, ' ', isNullable = true),
    FixedColumn("l_discount", 40, 6, FlfType.Float64T, Alignment.Left, '*', isNullable = true),
    FixedColumn("l_returned", 46, 8, FlfType.BooleanT, Alignment.Center, '0', isNullable = true))

  private def flfLine(): Column = concat(
    lpad(col("l_orderkey").cast("string"), 12, "0"),
    lpad(col("l_linenumber").cast("string"), 4, " "),
    rpad(col("l_returnflag"), 2, "_"),
    rpad(col("l_linestatus"), 2, "_"),
    lpad(col("l_quantity").cast("int").cast("string"), 6, " "),
    lpad(dec(col("l_extendedprice"), 12, 2).cast("string"), 14, " "),
    rpad(dec(col("l_discount"), 4, 2).cast("string"), 6, "*"),
    // center-padded cell (W2's floor-left/ceil-right rule) via the library
    graft.flf.FlfFormat.formatColumn(
      when(col("l_returnflag") === "R", "true").otherwise("false"), flfCols.last))

  private val flfLineSql =
    """lpad(CAST(l_orderkey AS VARCHAR), 12, '0') ||
      |lpad(CAST(l_linenumber AS VARCHAR), 4, ' ') ||
      |rpad(l_returnflag, 2, '_') ||
      |rpad(l_linestatus, 2, '_') ||
      |lpad(CAST(CAST(l_quantity AS INT) AS VARCHAR), 6, ' ') ||
      |lpad(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR), 14, ' ') ||
      |rpad(CAST(CAST(l_discount AS DECIMAL(4,2)) AS VARCHAR), 6, '*') ||
      |rpad(repeat('0', CAST(floor((8 - length(CASE WHEN l_returnflag = 'R' THEN 'true' ELSE 'false' END)) / 2.0) AS INT)) ||
      |  CASE WHEN l_returnflag = 'R' THEN 'true' ELSE 'false' END, 8, '0')"""
      .stripMargin.replace("\n", " ")

  q("flf_format",
    s"""SELECT l_orderkey, l_linenumber, $flfLineSql AS line
       |FROM lineitem ORDER BY l_orderkey, l_linenumber"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), flfLine().as("line"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val flfParseSql =
    """WITH lines AS (SELECT """ + flfLineSql + """ AS line FROM lineitem)
      |SELECT TRY_CAST(trim(LEADING '0' FROM substring(line, 1, 12)) AS BIGINT) AS l_orderkey,
      |  TRY_CAST(trim(LEADING ' ' FROM substring(line, 13, 4)) AS INT) AS l_linenumber,
      |  trim(TRAILING '_' FROM substring(line, 17, 2)) AS l_returnflag,
      |  trim(TRAILING '_' FROM substring(line, 19, 2)) AS l_linestatus,
      |  TRY_CAST(trim(LEADING ' ' FROM substring(line, 21, 6)) AS INT) AS l_quantity,
      |  TRY_CAST(trim(LEADING ' ' FROM substring(line, 27, 14)) AS DOUBLE) AS l_extendedprice,
      |  TRY_CAST(trim(TRAILING '*' FROM substring(line, 41, 6)) AS DOUBLE) AS l_discount,
      |  CASE trim(BOTH '0' FROM substring(line, 47, 8))
      |    WHEN 'true' THEN true WHEN 'false' THEN false END AS l_returned
      |FROM lines ORDER BY l_orderkey, l_linenumber"""
      .stripMargin.replace("\n", " ")

  q("flf_parse", flfParseSql) { (s, dir) =>
    val lines = tbl(s, dir, "lineitem").select(flfLine().as("value"))
    lines.select(flfCols.map(c => FlfParse.parseColumn(col("value"), c)): _*)
      .orderBy("l_orderkey", "l_linenumber")
  }

  q("flf_quarantine",
    // the third null policy: rows whose NON-NULLABLE cells fail to parse
    // are flagged and routed aside (raw line retained) instead of
    // aborting the whole job (strict) or silently nulling (lenient) —
    // every 97th order's quantity window is corrupted at fabrication
    // time in BOTH engines, and the split + per-side aggregates must
    // agree exactly
    s"""WITH l0 AS (SELECT l_orderkey AS src_key, $flfLineSql AS l FROM lineitem),
       |lines AS (SELECT CASE WHEN src_key % 97 = 0
       |  THEN substring(l, 1, 20) || 'XXXXXX' || substring(l, 27, 28)
       |  ELSE l END AS line FROM l0),
       |p AS (SELECT
       |  TRY_CAST(trim(LEADING '0' FROM substring(line, 1, 12)) AS BIGINT) AS l_orderkey,
       |  trim(TRAILING '_' FROM substring(line, 17, 2)) AS l_returnflag,
       |  TRY_CAST(trim(LEADING ' ' FROM substring(line, 21, 6)) AS INT) AS l_quantity
       |  FROM lines)
       |SELECT (l_orderkey IS NULL OR l_quantity IS NULL) AS quarantined,
       |  l_returnflag, COUNT(*) AS n, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
       |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val qSchema = FixedSchema(name = "lineitem_q", version = 1,
      columns = flfCols.map {
        case c if c.name == "l_orderkey" || c.name == "l_quantity" =>
          c.copy(isNullable = false)
        case c => c
      })
    // stage the formatted line once: the corrupt branch references it
    // three times, and a staged projection guarantees the 30-column
    // pad/concat evaluates once per row regardless of subexpression
    // elimination in the CASE. fanOutScan (r16): the fused
    // format+corrupt+parse kernel is the whole cost of this query and
    // ran on the scan's single split — rebalance first (no-op once the
    // input has real splits; see Pipeline.fanOutScan)
    val lines = Pipeline.fanOutScan(tbl(s, dir, "lineitem"),
        xxhash64(col("l_orderkey"), col("l_linenumber")))
      .select(col("l_orderkey"), flfLine().as("l"))
      .select(when(col("l_orderkey") % 97 === 0,
          concat(substring(col("l"), 1, 20), lit("XXXXXX"),
            substring(col("l"), 27, 28)))
        .otherwise(col("l")).as("value"))
    FlfParse.parseQuarantine(lines, qSchema)
      .groupBy(col("_quarantined").as("quarantined"), col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").cast("long").as("sum_qty"))
      .orderBy("quarantined", "l_returnflag")
  }

  q("stream_flf_ingest", flfParseSql) { (s, dir) =>
    // the reference's CORE pipeline as an unbounded stream: fixed-length
    // lines land in a directory, Streams.flfIngest parses them through
    // the identical FlfParse columns incrementally — same oracle as the
    // batch flf_parse, checking that batch and streaming convert agree
    // landing written as ~cores text FILES (r17, VERDICT r16 #1): the
    // file-stream source assigns whole files to tasks, so the r16
    // one-file landing parsed its first micro-batch on ONE task no
    // matter how many cores waited (measured 2.9 s of one-task parse).
    // fanOutScan spreads the single-split lineitem scan to session
    // width before the write — same rows, 32 files, 32-task parse.
    val landing = cachedLanding(s"flf:$dir") { d =>
      Pipeline.fanOutScan(tbl(s, dir, "lineitem"),
          xxhash64(col("l_orderkey"), col("l_linenumber")))
        .select(flfLine().as("value"))
        .write.mode("overwrite").text(d)
    }
    val schema = FixedSchema(name = "li_stream", version = 1, columns = flfCols)
    val qname = "graft_stream_flf"
    // one trigger covers the whole landing (r17): the landing is written
    // ~defaultParallelism files wide (fanOutScan above), and the default
    // 16-files/trigger split it into TWO micro-batches at 32 cores —
    // each batch pays its own offset/commit-log fsyncs and sink round-
    // trip for zero added coverage (the incremental-parse contract is
    // the file-stream source itself, not the batch count)
    val query = graft.streaming.Streams.flfIngest(s, landing, schema,
        filesPerTrigger = math.max(16, s.sparkContext.defaultParallelism))
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try query.processAllAvailable() finally query.stop()
    s.table(qname).orderBy("l_orderkey", "l_linenumber")
  }

  q("stream_flf_quarantine",
    // ingest-time quarantine on an unbounded stream: parseQuarantine is
    // a narrow projection, so it composes with the file stream as-is —
    // bad rows are flagged (not dropped, not fatal) while the stream
    // keeps flowing; the complete-mode split counts must equal the batch
    // quarantine split exactly
    s"""WITH l0 AS (SELECT l_orderkey AS src_key, $flfLineSql AS l FROM lineitem),
       |lines AS (SELECT CASE WHEN src_key % 97 = 0
       |  THEN substring(l, 1, 20) || 'XXXXXX' || substring(l, 27, 28)
       |  ELSE l END AS line FROM l0),
       |p AS (SELECT
       |  TRY_CAST(trim(LEADING '0' FROM substring(line, 1, 12)) AS BIGINT) AS l_orderkey,
       |  trim(TRAILING '_' FROM substring(line, 17, 2)) AS l_returnflag,
       |  TRY_CAST(trim(LEADING ' ' FROM substring(line, 21, 6)) AS INT) AS l_quantity
       |  FROM lines)
       |SELECT (l_orderkey IS NULL OR l_quantity IS NULL) AS quarantined,
       |  l_returnflag, COUNT(*) AS n
       |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")) { (s, dir) =>
    // multi-file landing, as in stream_flf_ingest (r17)
    val landing = cachedLanding(s"flfq:$dir") { d =>
      Pipeline.fanOutScan(tbl(s, dir, "lineitem"),
          xxhash64(col("l_orderkey"), col("l_linenumber")))
        .select(when(col("l_orderkey") % 97 === 0,
            concat(substring(flfLine(), 1, 20), lit("XXXXXX"),
              substring(flfLine(), 27, 28)))
          .otherwise(flfLine()).as("value"))
        .write.mode("overwrite").text(d)
    }
    val qSchema = FixedSchema(name = "li_q_stream", version = 1,
      columns = flfCols.map {
        case c if c.name == "l_orderkey" || c.name == "l_quantity" =>
          c.copy(isNullable = false)
        case c => c
      })
    val src = s.readStream.text(landing)
    val split = FlfParse.parseQuarantine(src, qSchema)
      .groupBy(col("_quarantined").as("quarantined"), col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
    val qname = "graft_stream_flfq"
    withShufflePartitions(s, 4) {
      val query = split.writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
      try query.processAllAvailable() finally query.stop()
    }
    s.table(qname).orderBy("quarantined", "l_returnflag")
  }

  q("flf_roundtrip",
    """WITH lines AS (SELECT l_orderkey, l_quantity, l_returnflag, """ + flfLineSql +
      """ AS line FROM lineitem)
      |SELECT COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN TRY_CAST(trim(LEADING '0' FROM substring(line, 1, 12)) AS BIGINT) = l_orderkey
      |    AND TRY_CAST(trim(LEADING ' ' FROM substring(line, 21, 6)) AS INT) = CAST(l_quantity AS INT)
      |    AND trim(TRAILING '_' FROM substring(line, 17, 2)) = l_returnflag
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_match
      |FROM lines"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val li = tbl(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"), flfLine().as("value"))
    val parsed = li.select(col("l_orderkey").as("orig_key"),
      col("l_quantity").as("orig_qty"), col("l_returnflag").as("orig_flag"),
      FlfParse.parseColumn(col("value"), flfCols(0)),
      FlfParse.parseColumn(col("value"), flfCols(4)),
      FlfParse.parseColumn(col("value"), flfCols(2)))
    parsed.agg(
      count(lit(1)).as("n_total"),
      sum(when(col("l_orderkey") === col("orig_key") &&
        col("l_quantity") === col("orig_qty").cast("int") &&
        col("l_returnflag") === col("orig_flag"), 1L).otherwise(0L)).as("n_match"))
  }

  q("flf_cast_policy",
    """SELECT CAST(SUM(CASE WHEN b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bool_null,
      |  CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
      |  CAST(SUM(CASE WHEN i IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_int_null,
      |  CAST(SUM(i) AS BIGINT) AS sum_i
      |FROM (SELECT
      |  CASE trim(TRAILING '#' FROM CASE l_returnflag WHEN 'R' THEN 'true####'
      |    WHEN 'A' THEN 'false###' ELSE 'TRUE####' END)
      |    WHEN 'true' THEN true WHEN 'false' THEN false END AS b,
      |  TRY_CAST(trim(LEADING '0' FROM CASE WHEN l_linenumber > 4 THEN 'garbage'
      |    ELSE lpad(CAST(l_linenumber AS VARCHAR), 7, '0') END) AS INT) AS i
      |FROM lineitem)"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val li = tbl(s, dir, "lineitem")
    val boolRaw = when(col("l_returnflag") === "R", "true####")
      .when(col("l_returnflag") === "A", "false###").otherwise("TRUE####")
    val intRaw = when(col("l_linenumber") > 4, lit("garbage"))
      .otherwise(lpad(col("l_linenumber").cast("string"), 7, "0"))
    val b = FlfParse.castStrict(rtrim(boolRaw, "#"), FlfType.BooleanT)
    val i = FlfParse.castStrict(ltrim(intRaw, "0"), FlfType.Int32T)
    li.select(b.as("b"), i.as("i")).agg(
      sum(when(col("b").isNull, 1L).otherwise(0L)).as("n_bool_null"),
      sum(when(col("b") === true, 1L).otherwise(0L)).as("n_true"),
      sum(when(col("i").isNull, 1L).otherwise(0L)).as("n_int_null"),
      sum(col("i").cast("long")).as("sum_i"))
  }

  // CSV / JSON-lines source-sink round-trips: the text-format ingestion
  // surface beyond fixed-width (SURVEY.md §2.5 extension). Each writes the
  // table through the format and aggregates the re-read copy; the oracle
  // aggregates the original parquet, so any serialization loss breaks the
  // hash. Values chosen to round-trip exactly (ints, strings, decimals as
  // strings, doubles via shortest-repr printing).

  private val roundtripAggSql =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_key
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
      .stripMargin.replace("\n", " ")

  private def roundtripAgg(df: DataFrame): DataFrame =
    df.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("int")).cast("long").as("sum_qty"),
        sum(dec(col("l_extendedprice"), 12, 2)).cast("double").as("sum_price"),
        sum("l_orderkey").cast("long").as("sum_key"))
      .orderBy("l_returnflag")

  private def roundtripInput(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_returnflag"),
      col("l_quantity").cast("int").as("l_quantity"),
      dec(col("l_extendedprice"), 12, 2).cast("string").as("l_extendedprice"))

  q("q_csv_roundtrip", roundtripAggSql) { (s, dir) =>
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_csv_roundtrip"
    roundtripInput(s, dir).write.mode("overwrite").option("header", "true").csv(out)
    roundtripAgg(s.read.option("header", "true")
      .schema("l_orderkey bigint, l_returnflag string, l_quantity int, l_extendedprice string")
      .csv(out))
  }

  q("q_jsonl_roundtrip", roundtripAggSql) { (s, dir) =>
    // JSON-lines: the de-facto interchange format for training corpora
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_roundtrip"
    roundtripInput(s, dir).write.mode("overwrite").json(out)
    roundtripAgg(s.read
      .schema("l_orderkey bigint, l_returnflag string, l_quantity int, l_extendedprice string")
      .json(out))
  }

  q("q_xml_roundtrip", roundtripAggSql) { (s, dir) =>
    // XML: Spark 4 ships the former spark-xml as a built-in source —
    // rowTag-framed records, schema-on-read like the csv/jsonl paths.
    // XML is NOT block-splittable (records span lines), so read
    // parallelism = file count: repartition before the write so the
    // sf0.1 single-split input becomes one file per core instead of one
    // file total (measured 1.7 s -> 0.3 s on the read side; the same
    // rule at 100 TB — parallelize a non-splittable codec by file count)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_xml_roundtrip"
    roundtripInput(s, dir).repartition(s.sparkContext.defaultParallelism)
      .write.mode("overwrite").option("rowTag", "row").xml(out)
    roundtripAgg(s.read.option("rowTag", "row")
      .schema("l_orderkey bigint, l_returnflag string, l_quantity int, l_extendedprice string")
      .xml(out))
  }

  q("q_ipc_roundtrip", roundtripAggSql) { (s, dir) =>
    // Arrow IPC: the zero-copy interchange format — write through IpcSink
    // (Spark rows → Arrow record batches) and read back through IpcSource
    // (Arrow → ColumnarBatch rows); the oracle checks the loop is lossless
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_ipc_roundtrip"
    graft.sources.IpcSink.write(roundtripInput(s, dir), out, mode = "overwrite")
    roundtripAgg(graft.sources.IpcSource.read(s, out))
  }

  q("q_orc_roundtrip", roundtripAggSql) { (s, dir) =>
    // ORC: the other columnar interchange format Spark ships natively —
    // splittable, predicate-pushdown-capable, schema-carrying, so unlike
    // the text formats no read schema is declared; the loop must preserve
    // types as well as values for the oracle hash to survive
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_orc_roundtrip"
    roundtripInput(s, dir).write.mode("overwrite").orc(out)
    roundtripAgg(s.read.orc(out))
  }

  q("q_partitioned_layout",
    """SELECT l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_key
      |FROM lineitem WHERE l_returnflag = 'R'
      |GROUP BY l_linestatus ORDER BY l_linestatus"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // Hive-style partitioned layout: write partitioned by the filter
    // column, read back one partition. The filter is satisfied by
    // DIRECTORY pruning at plan time (PartitionFilters, PlanSpec-
    // guarded), so the 'R' scan never opens the other partitions' files
    // — at 100 TB this is the difference between listing one directory
    // and scanning the table. The oracle aggregates the unpartitioned
    // parquet with the same predicate: any row misrouted by the
    // partitioned write breaks the hash.
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_part_layout"
    val src = tbl(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linestatus"), col("l_returnflag"),
      col("l_quantity").cast("int").as("l_quantity"))
    graft.ops.Bucketing.writePartitioned(src, out, "l_returnflag")
    s.read.parquet(out).filter(col("l_returnflag") === "R")
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum("l_quantity").cast("long").as("sum_qty"),
        sum("l_orderkey").cast("long").as("sum_key"))
      .orderBy("l_linestatus")
  }

  q("q_partition_backfill",
    // backfill one partition via DYNAMIC partition overwrite (the
    // reprocess-one-day primitive): only the 'F' directory is rewritten
    // (doubled prices); the oracle applies the same correction to the
    // unpartitioned source, so a backfill that leaked into any other
    // partition — or missed part of its own — breaks the hash
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  round(CAST(SUM(CASE WHEN o_orderstatus = 'F'
      |    THEN CAST(o_totalprice AS DECIMAL(12,2)) * 2
      |    ELSE CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 2) AS total
      |FROM orders GROUP BY 1 ORDER BY 1"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val src = tbl(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    // base partitioned table cached per sfDir (bench runs the query
    // repeatedly — only the backfill itself should be re-measured, and
    // temp dirs must not accumulate one table copy per iteration); the
    // backfill is idempotent: 'F' is always recomputed from src
    val out = cachedLanding(s"backfill:$dir") { d =>
      Bucketing.writePartitioned(src, s"$d/orders", "o_orderstatus")
    } + "/orders"
    // the corrected recomputation of ONE partition
    val fixed = src.filter(col("o_orderstatus") === "F")
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    Bucketing.backfillPartitions(fixed, out, "o_orderstatus")
    s.read.parquet(out)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(12,2)")).cast("double"), 2)
          .as("total"))
      .orderBy("o_orderstatus")
  }

  // ===========================================================================
  // General relational surface — SURVEY.md §2.7 (joins, aggs, windows,
  // sorts, set ops, scalar functions, grouping sets).
  // ===========================================================================

  q("q1_agg",
    s"""SELECT l_returnflag, l_linestatus,
       |  SUM(l_quantity) AS sum_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base,
       |  CAST(SUM($discPriceSql) AS DOUBLE) AS sum_disc_price,
       |  CAST(SUM($discPriceSql * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
       |  SUM(l_quantity) / COUNT(*) AS avg_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       |  COUNT(*) AS n
       |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val li = tbl(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) <= lit("1998-09-02").cast("date"))
    val dp = discPrice(col("l_extendedprice"), col("l_discount"))
    li.groupBy("l_returnflag", "l_linestatus").agg(
        sum("l_quantity").as("sum_qty"),
        sum(dec(col("l_extendedprice"), 12, 2)).cast("double").as("sum_base"),
        sum(dp).cast("double").as("sum_disc_price"),
        sum(dp * dec(lit(1) + dec(col("l_tax"), 4, 2), 4, 2)).cast("double").as("sum_charge"),
        (sum("l_quantity") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"), 12, 2)).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  q("q3_join_topk",
    s"""SELECT l_orderkey, CAST(SUM($discPriceSql) AS DOUBLE) AS revenue,
       |  o_orderdate
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
       |  AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey LIMIT 10"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val c = tbl(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = tbl(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) < lit("1998-03-15").cast("date"))
    val li = tbl(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) > lit("1998-03-15").cast("date"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate")
      .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
  }

  q("q5_join_broadcast",
    s"""SELECT n_name, CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
       |FROM region JOIN nation ON n_regionkey = r_regionkey
       |  JOIN supplier ON s_nationkey = n_nationkey
       |  JOIN lineitem ON l_suppkey = s_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
       |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
       |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
       |GROUP BY n_name ORDER BY n_name"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    broadcast(tbl(s, dir, "region"))
      .join(broadcast(tbl(s, dir, "nation")), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(tbl(s, dir, "supplier")), col("s_nationkey") === col("n_nationkey"))
      .join(tbl(s, dir, "lineitem"), col("l_suppkey") === col("s_suppkey"))
      .join(tbl(s, dir, "orders").filter(
        to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date") &&
          to_date(col("o_orderdate")) < lit("1997-01-01").cast("date")),
        col("o_orderkey") === col("l_orderkey"))
      .join(tbl(s, dir, "customer"),
        col("c_custkey") === col("o_custkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy("n_name")
  }

  q("q6_filter_pushdown",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1997-01-01").cast("date") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg((sum(dec(col("l_extendedprice"), 12, 2) * dec(col("l_discount"), 4, 2)))
        .cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  q("q_join_semi",
    """SELECT c_nationkey, COUNT(*) AS n FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "customer")
      .join(tbl(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      .orderBy("c_nationkey")
  }

  q("q_join_anti",
    """SELECT c_mktsegment, COUNT(*) AS n FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "customer")
      .join(tbl(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }

  q("q_join_outer",
    """SELECT n_name, COUNT(c_custkey) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
      |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "nation")
      .join(tbl(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"), "left")
      .groupBy("n_name")
      .agg(count(col("c_custkey")).as("n_cust"),
        sum(dec(col("c_acctbal"), 12, 2)).cast("double").as("sum_bal"))
      .orderBy("n_name")
  }

  q("q_join_full",
    // FULL OUTER: early vs late purchasers; both null sides exercised
    """WITH a AS (SELECT o_custkey AS ck, COUNT(*) AS n_early FROM orders
      |  WHERE o_orderdate < TIMESTAMP '1996-01-01' AND o_custkey < 500 GROUP BY 1),
      |b AS (SELECT o_custkey AS ck, COUNT(*) AS n_late FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1999-01-01' AND o_custkey < 500 GROUP BY 1)
      |SELECT coalesce(a.ck, b.ck) AS ck, a.n_early, b.n_late
      |FROM a FULL JOIN b ON a.ck = b.ck ORDER BY ck"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val o = tbl(s, dir, "orders").filter(col("o_custkey") < 500)
    val a = o.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .groupBy(col("o_custkey").as("ck_a")).agg(count(lit(1)).as("n_early"))
    val b = o.filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .groupBy(col("o_custkey").as("ck_b")).agg(count(lit(1)).as("n_late"))
    a.join(b, col("ck_a") === col("ck_b"), "full")
      .select(coalesce(col("ck_a"), col("ck_b")).as("ck"),
        col("n_early"), col("n_late"))
      .orderBy("ck")
  }

  q("q_cross_join",
    // the one intentionally shuffle-free Cartesian in the surface: both
    // sides are broadcast-sized dimensions
    """SELECT a.r_name AS ra, b.r_name AS rb FROM region a CROSS JOIN region b
      |ORDER BY ra, rb""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val r = tbl(s, dir, "region")
    r.select(col("r_name").as("ra"))
      .crossJoin(r.select(col("r_name").as("rb")))
      .orderBy("ra", "rb")
  }

  q("q_scd2_intervals",
    // type-2 slowly-changing-dimension build: each order version carries
    // [valid_from, valid_to) via lead(); one window shuffle on the key
    """SELECT o_custkey, CAST(ROW_NUMBER() OVER w AS INT) AS version, o_orderkey,
      |  o_orderdate AS valid_from, lead(o_orderdate) OVER w AS valid_to,
      |  (lead(o_orderdate) OVER w IS NULL) AS is_current
      |FROM orders WHERE o_custkey < 200
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, version"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    tbl(s, dir, "orders").filter(col("o_custkey") < 200)
      .select(col("o_custkey"),
        row_number().over(w).cast("int").as("version"), col("o_orderkey"),
        col("o_orderdate").as("valid_from"),
        lead("o_orderdate", 1).over(w).as("valid_to"),
        lead("o_orderdate", 1).over(w).isNull.as("is_current"))
      .orderBy("o_custkey", "version")
  }

  q("q_window_rank",
    """SELECT c_nationkey, c_custkey, c_acctbal, rn, rnk FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
      |    rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |  FROM customer)
      |WHERE rn <= 3 ORDER BY c_nationkey, rn"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
    tbl(s, dir, "customer")
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"), rank().over(w).as("rnk"))
      .filter(col("rn") <= 3)
      .orderBy("c_nationkey", "rn")
  }

  q("q_window_running",
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running,
      |  lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event
      |FROM events WHERE user_id < 20 ORDER BY user_id, event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, dir).filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        sum(dec(col("value"), 18, 4))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running"),
        lag("event_id", 1).over(w).as("prev_event"))
      .orderBy("user_id", "event_id")
  }

  q("q_window_frame",
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) / COUNT(*) OVER w AS mov_avg
      |FROM events WHERE user_id < 10
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    events(s, dir).filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"),
        (sum(dec(col("value"), 18, 4)).over(w).cast("double") /
          count(lit(1)).over(w)).as("mov_avg"))
      .orderBy("user_id", "event_id")
  }

  q("q_window_extras",
    // rank ratios round via floor(x*1e6 + 0.5)/1e6 — pure IEEE double ops
    // that evaluate bit-identically on both engines. round(x, 6) does
    // NOT: Spark rounds the double's shortest DECIMAL representation
    // (BigDecimal.valueOf) while DuckDB rounds the binary value, and a
    // ratio like 41/640 prints as the exact midpoint "0.0640625" — Spark
    // says 0.064063, DuckDB 0.064062. Found by the sf0.1 oracle sweep;
    // sf0.01 group sizes never produced a midpoint-printing ratio.
    """SELECT c_custkey, c_nationkey,
      |  dense_rank() OVER w AS drnk, ntile(4) OVER w AS q4,
      |  first_value(c_custkey) OVER w AS richest,
      |  floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pr,
      |  floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cd
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_nationkey, c_custkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
    tbl(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        dense_rank().over(w).as("drnk"), ntile(4).over(w).as("q4"),
        first(col("c_custkey")).over(w).as("richest"),
        (floor(percent_rank().over(w) * 1e6 + 0.5) / 1e6).as("pr"),
        (floor(cume_dist().over(w) * 1e6 + 0.5) / 1e6).as("cd"))
      .orderBy("c_nationkey", "c_custkey")
  }

  q("q_join_null_anti",
    """SELECT c_mktsegment, COUNT(*) AS n FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // NOT IN: null-aware anti-join semantics (plans as a broadcast
    // null-aware anti join when the subquery side is small)
    tbl(s, dir, "customer").createOrReplaceTempView("graft_customer_na")
    tbl(s, dir, "orders").createOrReplaceTempView("graft_orders_na")
    s.sql(
      """SELECT c_mktsegment, COUNT(*) AS n FROM graft_customer_na
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM graft_orders_na WHERE o_totalprice > 150000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  q("q_salted_join",
    """WITH dim AS (SELECT l_returnflag AS rf, COUNT(*) AS rf_n FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, COUNT(*) AS n, MIN(rf_n) AS rf_total
      |FROM lineitem JOIN dim ON l_returnflag = rf
      |GROUP BY l_returnflag ORDER BY l_returnflag"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // l_returnflag has 3 values — the textbook skewed key: a plain
    // shuffle join collapses onto 3 tasks regardless of cluster size.
    // Salting spreads each hot key over 8 tasks; result is identical.
    val li = tbl(s, dir, "lineitem")
    val dim = li.groupBy(col("l_returnflag").as("rf")).agg(count(lit(1)).as("rf_n"))
    Salting.saltedJoin(li, dim, "l_returnflag", "rf", salts = 8)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), min("rf_n").as("rf_total"))
      .orderBy("l_returnflag")
  }

  q("q_skew_stats",
    """WITH k AS (SELECT l_suppkey AS key, COUNT(*) AS n FROM lineitem GROUP BY 1),
      |t AS (SELECT SUM(n) AS total FROM k),
      |top AS (SELECT key, n, round(CAST(n AS DOUBLE) / (SELECT total FROM t), 6) AS share
      |  FROM k ORDER BY n DESC, key LIMIT 20)
      |SELECT key, n, share,
      |  CAST(row_number() OVER (ORDER BY n DESC, key) AS INT) AS rank
      |FROM top ORDER BY rank"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // heavy-hitter pre-flight for join/agg planning: per-key share of the
    // table, distributed top-k (orderBy+limit never single-partitions the
    // key summaries; the rank window runs on the 20 survivors)
    Salting.skewStats(tbl(s, dir, "lineitem"), "l_suppkey", topK = 20)
      .orderBy("rank")
  }

  q("q_profile_columns",
    """SELECT col_name, n_rows, n_nonnull, n_distinct, min_s, max_s FROM (
      |  SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
      |    COUNT(o_orderkey) AS n_nonnull, COUNT(DISTINCT o_orderkey) AS n_distinct,
      |    CAST(MIN(o_orderkey) AS VARCHAR) AS min_s, CAST(MAX(o_orderkey) AS VARCHAR) AS max_s
      |  FROM orders
      |  UNION ALL SELECT 'o_custkey', COUNT(*), COUNT(o_custkey), COUNT(DISTINCT o_custkey),
      |    CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR) FROM orders
      |  UNION ALL SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
      |    COUNT(DISTINCT o_orderstatus),
      |    CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR) FROM orders
      |  UNION ALL SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
      |    COUNT(DISTINCT o_orderpriority),
      |    CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR) FROM orders)
      |ORDER BY col_name"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // the one-pass profiler: all four columns' stats come from a single
    // scan (multi-distinct via Expand), where the oracle's UNION ALL
    // formulation scans once per column
    Profile.profile(tbl(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
      .orderBy("col_name")
  }

  q("q_fuzzy_join",
    // fuzzy self-join (edit distance <= 2 within a (last-token, brand)
    // block). Candidates come from a DELETION-NEIGHBORHOOD equi-join
    // (Mor-Fraenkel / SymSpell): an edit script of k <= 2 ops deletes at
    // most k chars from each side to reach a common string, so two names
    // within distance 2 MUST share a <=2-deletion variant — joining on
    // xxhash64(variant) has zero false negatives (hash collisions only
    // ADD candidates; verification removes them). Variant count is
    // O(len^2) per row — linear in the corpus — where the plain
    // (block, brand) equi-join was quadratic inside each block: at sf1
    // (200k parts, names sharing a constant prefix) candidates drop
    // 25.8M -> 0.84M against 143k true pairs, 91 s -> ~8 s. Survivors
    // pay a banded levenshtein(_, _, 2) (O(len·k), early-exit) instead
    // of the full O(len^2) DP. The oracle keeps the declarative
    // quadratic formulation — outputs are identical by the argument
    // above.
    """WITH p AS (SELECT p_partkey, p_name, p_brand,
      |  regexp_split_to_array(trim(p_name), '\s+')[-1] AS blk FROM part)
      |SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
      |  a.p_name AS a_name, b.p_name AS b_name,
      |  levenshtein(a.p_name, b.p_name) AS dist
      |FROM p a JOIN p b ON a.blk = b.blk AND a.p_brand = b.p_brand
      |  AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY a_id, b_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // the full plan rationale (deletion-neighborhood candidates, fused
    // variant-hash kernel, folded join key, explode-aware shuffle sizing,
    // banded verification) lives with the extracted operator — see
    // ops/FuzzyJoin.scala; default = EXACT (maxBucket opt-in only)
    val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_name"),
      col("p_brand"),
      element_at(split(trim(col("p_name")), "\\s+"), -1).as("blk"))
    graft.ops.FuzzyJoin.editDistanceSelfJoin(p, "p_partkey", "p_name",
        Seq("blk", "p_brand"), maxEdits = 2)
      .orderBy("a_id", "b_id")
  }

  q("q_null_semantics",
    // the null-semantics parity suite: COUNT(*) vs COUNT(col), null-safe
    // equality (<=> / IS NOT DISTINCT FROM) in a join key, and NULLS
    // FIRST ordering on a nullable aggregate
    """WITH c AS (SELECT c_custkey, c_nationkey,
      |    CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      |  FROM customer WHERE c_custkey < 200),
      |g AS (SELECT c_nationkey, COUNT(*) AS n_all, COUNT(bal) AS n_bal,
      |    COUNT(CASE WHEN bal IS NULL THEN 1 END) AS n_null, MIN(bal) AS min_bal
      |  FROM c GROUP BY 1),
      |p AS (SELECT a.c_nationkey AS nk, COUNT(*) AS n_pairs
      |  FROM c a JOIN c b ON a.c_nationkey = b.c_nationkey
      |    AND a.bal IS NOT DISTINCT FROM b.bal AND a.c_custkey < b.c_custkey
      |  GROUP BY 1)
      |SELECT g.c_nationkey, n_all, n_bal, n_null, min_bal,
      |  coalesce(p.n_pairs, 0) AS n_nullsafe_pairs
      |FROM g LEFT JOIN p ON p.nk = g.c_nationkey
      |ORDER BY min_bal NULLS FIRST, c_nationkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val c = tbl(s, dir, "customer").filter(col("c_custkey") < 200)
      .select(col("c_custkey"), col("c_nationkey"),
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("bal"))
    val g = c.groupBy("c_nationkey").agg(count(lit(1)).as("n_all"),
      count(col("bal")).as("n_bal"),
      count(when(col("bal").isNull, 1)).as("n_null"), min("bal").as("min_bal"))
    val p = c.as("a").join(c.as("b"),
        col("a.c_nationkey") === col("b.c_nationkey")
          && (col("a.bal") <=> col("b.bal"))
          && col("a.c_custkey") < col("b.c_custkey"))
      .groupBy(col("a.c_nationkey").as("nk")).agg(count(lit(1)).as("n_pairs"))
    g.join(p, g("c_nationkey") === p("nk"), "left")
      .select(col("c_nationkey"), col("n_all"), col("n_bal"), col("n_null"),
        col("min_bal"), coalesce(col("n_pairs"), lit(0L)).as("n_nullsafe_pairs"))
      .orderBy(col("min_bal").asc_nulls_first, col("c_nationkey"))
  }

  q("q_merge_partials",
    // incremental aggregation: two independently-aggregated partitions
    // (e.g. yesterday's rollup + today's delta) merge algebraically —
    // count/sum/min/max re-aggregate, avg derives from merged sums. The
    // oracle computes the direct full aggregate; equality IS the claim.
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
      |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty
      |FROM lineitem GROUP BY 1 ORDER BY 1"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val li = tbl(s, dir, "lineitem")
    def partial(pred: Column) = li.filter(pred)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"), 12, 2)).as("s"),
        min("l_quantity").as("mn"), max("l_quantity").as("mx"))
    val merged = partial(pmod(col("l_orderkey"), lit(2)) === 0)
      .union(partial(pmod(col("l_orderkey"), lit(2)) === 1))
      .groupBy("l_returnflag")
      .agg(sum("n").as("n"), sum("s").as("s"), min("mn").as("min_qty"),
        max("mx").as("max_qty"))
    merged.select(col("l_returnflag"), col("n"),
        col("s").cast("double").as("sum_qty"), col("min_qty"), col("max_qty"),
        round(col("s").cast("double") / col("n"), 6).as("avg_qty"))
      .orderBy("l_returnflag")
  }

  q("q_gini_impurity",
    // concentration diagnostic per categorical column: exact value counts
    // (decimal squares, overflow-proof), one double combination at the end
    """WITH c1 AS (SELECT o_orderstatus AS v, COUNT(*) AS c FROM orders GROUP BY 1),
      |g1 AS (SELECT COUNT(*) AS n_distinct, CAST(SUM(c) AS DOUBLE) AS t,
      |  CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS DOUBLE) AS sq FROM c1),
      |c2 AS (SELECT o_orderpriority AS v, COUNT(*) AS c FROM orders GROUP BY 1),
      |g2 AS (SELECT COUNT(*) AS n_distinct, CAST(SUM(c) AS DOUBLE) AS t,
      |  CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS DOUBLE) AS sq FROM c2)
      |SELECT col_name, n_distinct, gini FROM (
      |  SELECT 'o_orderstatus' AS col_name, n_distinct,
      |    round((t * t - sq) / (t * t), 6) AS gini FROM g1
      |  UNION ALL SELECT 'o_orderpriority', n_distinct,
      |    round((t * t - sq) / (t * t), 6) FROM g2)
      |ORDER BY col_name"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Profile.giniImpurity(tbl(s, dir, "orders"),
        Seq("o_orderstatus", "o_orderpriority"))
      .orderBy("col_name")
  }

  q("q_quality_checks",
    // the validation gate: each rule is one aggregation returning a
    // violation count; FK orphans via anti join
    """SELECT rule, n_violations FROM (
      |  SELECT 'not_null:o_orderkey' AS rule,
      |    COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_violations FROM orders
      |  UNION ALL SELECT 'in_range:o_totalprice',
      |    COUNT(CASE WHEN o_totalprice < 0.0 OR o_totalprice >= 10000000.0
      |      OR o_totalprice IS NULL THEN 1 END) FROM orders
      |  UNION ALL SELECT 'unique:o_orderkey',
      |    COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) FROM orders
      |  UNION ALL SELECT 'foreign_key:o_custkey', COUNT(*) FROM orders o
      |    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |ORDER BY rule"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val o = tbl(s, dir, "orders")
    Quality.run(Seq(
        Quality.notNull(o, "o_orderkey"),
        Quality.inRange(o, "o_totalprice", 0.0, 10000000.0),
        Quality.unique(o, "o_orderkey"),
        Quality.foreignKey(o, "o_custkey", tbl(s, dir, "customer"), "c_custkey")))
      .orderBy("rule")
  }

  q("q_kanonymity",
    // privacy audit before publishing: per (nation, segment) equivalence
    // class, k-anonymity (class_size < 10 re-identifies) and l-diversity
    // (fewer than 8 distinct balances leaks the sensitive attribute);
    // one aggregation on the QI key, report bounded by the QI domain
    """SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size,
      |  COUNT(DISTINCT c_acctbal) AS n_sensitive,
      |  (COUNT(*) < 10) AS k_risk,
      |  (COUNT(DISTINCT c_acctbal) < 8) AS l_risk
      |FROM customer GROUP BY 1, 2 ORDER BY 1, 2"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Quality.kAnonymity(tbl(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 10, l = 8)
      .orderBy("c_nationkey", "c_mktsegment")
  }

  q("q_quantile_normalize",
    // rank-based feature scaling to [0,1] per group: integer ranks with a
    // unique tiebreak, one IEEE division — no percent_rank float drift
    """SELECT c_custkey, c_nationkey, rn,
      |  CASE WHEN n > 1 THEN round(CAST(rn - 1 AS DOUBLE) / (n - 1), 6) END AS pct
      |FROM (SELECT c_custkey, c_nationkey,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |      ORDER BY c_acctbal, c_custkey) AS INT) AS rn,
      |    COUNT(*) OVER (PARTITION BY c_nationkey) AS n
      |  FROM customer)
      |ORDER BY c_nationkey, rn"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    val wn = Window.partitionBy("c_nationkey")
    tbl(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        row_number().over(w).cast("int").as("rn"),
        count(lit(1)).over(wn).as("n"))
      .select(col("c_custkey"), col("c_nationkey"), col("rn"),
        when(col("n") > 1,
          round((col("rn") - 1).cast("double") / (col("n") - 1), 6)).as("pct"))
      .orderBy("c_nationkey", "rn")
  }

  q("q_topk_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)
  }

  q("q_sort_multi",
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus, l_orderkey, l_linenumber LIMIT 100"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
      .orderBy("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber").limit(100)
  }

  q("q_setops",
    """SELECT op, nationkey FROM (
      |  SELECT 'both' AS op, nationkey FROM
      |    (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT 'cust_only' AS op, nationkey FROM
      |    (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT 'any' AS op, nationkey FROM
      |    (SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
      |) ORDER BY op, nationkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val c = tbl(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val su = tbl(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    c.intersect(su).withColumn("op", lit("both"))
      .unionByName(c.except(su).withColumn("op", lit("cust_only")))
      .unionByName(c.union(su).distinct().withColumn("op", lit("any")))
      .select("op", "nationkey")
      .orderBy("op", "nationkey")
  }

  q("q_setops_all",
    """SELECT op, nationkey FROM (
      |  SELECT 'i_all' AS op, nationkey FROM
      |    (SELECT c_nationkey AS nationkey FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT 'e_all' AS op, nationkey FROM
      |    (SELECT c_nationkey AS nationkey FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier)
      |) ORDER BY op, nationkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // multiset (bag) semantics: duplicates preserved up to the matched count
    val c = tbl(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val su = tbl(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    c.intersectAll(su).withColumn("op", lit("i_all"))
      .unionByName(c.exceptAll(su).withColumn("op", lit("e_all")))
      .select("op", "nationkey")
      .orderBy("op", "nationkey")
  }

  q("q_udaf_wavg",
    s"""SELECT l_returnflag,
       |  round(CAST(SUM($discPriceSql * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) /
       |        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 6) AS wavg_price,
       |  COUNT(*) AS n
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // typed Aggregator UDAF (exact-decimal state, so partial-merge order
    // cannot change the result) — quantity-weighted mean discounted price
    val wavg = udaf(graft.functions.Aggregators.weightedAvg)
    tbl(s, dir, "lineitem").groupBy("l_returnflag")
      .agg(round(wavg(
          discPrice(col("l_extendedprice"), col("l_discount")) * dec(col("l_quantity"), 12, 2),
          dec(col("l_quantity"), 12, 2)).as("w"), 6).as("wavg_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  q("q_agg_distinct",
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  CAST(SUM(DISTINCT CAST(l_quantity AS INT)) AS BIGINT) AS sum_dq
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "lineitem").groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        sum_distinct(col("l_quantity").cast("int")).cast("long").as("sum_dq"))
      .orderBy("l_returnflag")
  }

  q("q_rollup",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "lineitem").rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  q("q_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "orders").cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"), 12, 2)).cast("double").as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  q("q_string_funcs",
    """SELECT p_partkey, upper(p_name) AS uname, length(p_name) AS len,
      |  substring(p_name, 1, 5) AS pre, replace(p_name, ' ', '_') AS slug,
      |  concat_ws('|', p_brand, p_type) AS bt,
      |  CASE WHEN p_type LIKE '%ECO%' THEN 1 ELSE 0 END AS is_eco,
      |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
      |  CAST(len(string_split(p_name, ' ')) AS INT) AS n_words
      |FROM part ORDER BY p_partkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "part").select(
        col("p_partkey"), upper(col("p_name")).as("uname"),
        length(col("p_name")).as("len"), substring(col("p_name"), 1, 5).as("pre"),
        regexp_replace(col("p_name"), " ", "_").as("slug"),
        concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
        when(col("p_type").like("%ECO%"), 1).otherwise(0).as("is_eco"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        size(split(col("p_name"), " ")).as("n_words"))
      .orderBy("p_partkey")
  }

  q("q_string_distance",
    """SELECT p_partkey,
      |  CAST(levenshtein(p_brand, p_type) AS INT) AS lev,
      |  reverse(p_name) AS rname,
      |  translate(p_name, 'aeiou', '.....') AS tname,
      |  repeat(p_brand, 2) AS bb,
      |  CAST(strpos(p_name, 'a') AS INT) AS pos_a,
      |  left(p_name, 4) AS l4, right(p_name, 4) AS r4
      |FROM part ORDER BY p_partkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "part").select(col("p_partkey"),
        levenshtein(col("p_brand"), col("p_type")).as("lev"),
        reverse(col("p_name")).as("rname"),
        translate(col("p_name"), "aeiou", ".....").as("tname"),
        repeat(col("p_brand"), 2).as("bb"),
        instr(col("p_name"), "a").as("pos_a"),
        expr("left(p_name, 4)").as("l4"), expr("right(p_name, 4)").as("r4"))
      .orderBy("p_partkey")
  }

  q("q_date_funcs",
    """SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
      |  COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"), 12, 2)).cast("double").as("total"))
      .orderBy("y", "m")
  }

  q("q_math_funcs",
    // restricted to operations with exact cross-engine semantics: sqrt is
    // IEEE-correctly-rounded, abs/floor/ceil/sign/pmod/greatest/least are
    // integral or exact; ln/exp/pow are libm-dependent and excluded
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_extendedprice * -1) AS abs_price,
      |  round(sqrt(l_extendedprice), 6) AS sqrt_price,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
      |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn,
      |  CAST(mod(l_orderkey, 7) AS BIGINT) AS m7,
      |  greatest(l_quantity, l_discount * 100) AS g,
      |  least(l_quantity, l_discount * 100) AS l
      |FROM lineitem WHERE l_orderkey < 200
      |ORDER BY l_orderkey, l_linenumber"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "lineitem").filter(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_extendedprice") * -1).as("abs_price"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
        floor(col("l_extendedprice")).cast("long").as("floor_p"),
        ceil(col("l_extendedprice")).cast("long").as("ceil_p"),
        signum(col("l_discount") - 0.05).as("sgn"),
        pmod(col("l_orderkey"), lit(7)).cast("long").as("m7"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
        least(col("l_quantity"), col("l_discount") * 100).as("l"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  q("q_regex_funcs",
    // Java and RE2 agree on this restricted syntax (classes, bounded
    // repetition, alternation); both engines return '' on no-match
    """SELECT doc_id,
      |  regexp_extract(text, '([a-z]{7,})', 1) AS long_word,
      |  substring(regexp_replace(text, '[aeiou]', '', 'g'), 1, 40) AS devowel40,
      |  CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT) AS n_vowels,
      |  CASE WHEN regexp_matches(text, ' (data|customer) ') THEN 1 ELSE 0 END AS mentions
      |FROM documents ORDER BY doc_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "documents").select(col("doc_id"),
        regexp_extract(col("text"), "([a-z]{7,})", 1).as("long_word"),
        substring(regexp_replace(col("text"), "[aeiou]", ""), 1, 40).as("devowel40"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[aeiou]", ""))).as("n_vowels"),
        when(col("text").rlike(" (data|customer) "), 1).otherwise(0).as("mentions"))
      .orderBy("doc_id")
  }

  q("q_bitwise_funcs",
    """SELECT l_orderkey, l_linenumber,
      |  l_orderkey & l_partkey AS band, l_orderkey | l_partkey AS bor,
      |  xor(l_orderkey, l_partkey) AS bxor,
      |  l_orderkey << 3 AS shl, l_partkey >> 2 AS shr,
      |  CAST(bit_count(l_orderkey) AS INT) AS bits
      |FROM lineitem WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "lineitem").filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").bitwiseAND(col("l_partkey")).as("band"),
        col("l_orderkey").bitwiseOR(col("l_partkey")).as("bor"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("bxor"),
        shiftleft(col("l_orderkey"), 3).as("shl"),
        shiftright(col("l_partkey"), 2).as("shr"),
        bit_count(col("l_orderkey")).as("bits"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  q("q_hash_funcs",
    """SELECT p_partkey, md5(p_name) AS h_md5, sha256(p_name) AS h_sha256,
      |  substring(md5(p_brand), 1, 8) AS brand8
      |FROM part ORDER BY p_partkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "part").select(col("p_partkey"),
        md5(col("p_name")).as("h_md5"), sha2(col("p_name"), 256).as("h_sha256"),
        substring(md5(col("p_brand")), 1, 8).as("brand8"))
      .orderBy("p_partkey")
  }

  q("q_sequence_hof",
    // higher-order functions over generated arrays; the oracle is the
    // closed-form arithmetic, so any lambda-eval drift hash-fails
    """SELECT l_orderkey, l_linenumber, k,
      |  k * (k + 1) // 2 AS tri,
      |  k * (k + 1) * (2 * k + 1) // 6 AS sumsq,
      |  k // 2 AS n_even
      |FROM (SELECT l_orderkey, l_linenumber,
      |  CAST(l_quantity AS BIGINT) AS k FROM lineitem WHERE l_orderkey < 300)
      |ORDER BY l_orderkey, l_linenumber"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val k = col("l_quantity").cast("long")
    tbl(s, dir, "lineitem").filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"), col("l_linenumber"), k.as("k"),
        aggregate(sequence(lit(1L), k), lit(0L), (acc, x) => acc + x).as("tri"),
        aggregate(transform(sequence(lit(1L), k), x => x * x),
          lit(0L), (acc, x) => acc + x).as("sumsq"),
        size(filter(sequence(lit(1L), k), x => x % 2 === 0))
          .cast("long").as("n_even"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  q("q_try_arith",
    // try_* null-on-failure semantics under ANSI mode: division by zero,
    // out-of-bounds element access, and failed string casts all yield NULL
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice / NULLIF(l_quantity - 25, 0) AS safe_div,
      |  ([l_orderkey])[2] AS oob,
      |  TRY_CAST(l_returnflag AS INT) AS flag_int
      |FROM lineitem WHERE l_orderkey < 300
      |ORDER BY l_orderkey, l_linenumber"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "lineitem").filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_extendedprice"), col("l_quantity") - 25).as("safe_div"),
        try_element_at(array(col("l_orderkey")), lit(2)).as("oob"),
        expr("try_cast(l_returnflag AS INT)").as("flag_int"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  q("q_width_bucket",
    // DuckDB lacks width_bucket; the oracle is the bucket arithmetic
    // (floor(n*(v-lo)/(hi-lo))+1 with the out-of-range conventions).
    // 2q/11 stays >= 1/11 away from integers for non-multiples, so the
    // floor is rounding-safe across engines
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  CASE WHEN l_quantity < 0 THEN 0 WHEN l_quantity >= 55 THEN 11
      |    ELSE CAST(FLOOR(10.0 * l_quantity / 55.0) AS BIGINT) + 1 END AS wb
      |FROM lineitem WHERE l_orderkey < 300
      |ORDER BY l_orderkey, l_linenumber"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "lineitem").filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        width_bucket(col("l_quantity"), lit(0.0), lit(55.0), lit(10L)).as("wb"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  q("q_stats_moments",
    // exact decimal power sums -> one fixed double combination per group;
    // built-in stddev/corr accumulate doubles in partition order and are
    // not reproducible across engines or partitionings
    """WITH s AS (SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, n,
      |  round(sx / CAST(n AS DOUBLE), 6) AS mean_x,
      |  round((CAST(n AS DOUBLE) * sxx - sx * sx) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)), 6) AS var_x,
      |  round(sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6) AS std_x,
      |  round((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)), 6) AS covar_xy,
      |  round((CAST(n AS DOUBLE) * sxy - sx * sy) / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr_xy,
      |  round((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope_xy
      |FROM s ORDER BY l_returnflag"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.moments(tbl(s, dir, "lineitem"), "l_returnflag",
        "l_quantity", "l_extendedprice")
      .orderBy("l_returnflag")
  }

  q("q_case_buckets",
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
      |  WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS bucket,
      |  COUNT(*) AS n, MIN(o_orderkey) AS min_key
      |FROM orders GROUP BY 1 ORDER BY bucket"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "orders")
      .groupBy(when(col("o_totalprice") < 50000, "low")
        .when(col("o_totalprice") < 150000, "mid").otherwise("high").as("bucket"))
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("min_key"))
      .orderBy("bucket")
  }

  q("q_histogram_numeric",
    // equal-width binning with literal edges: bin = floor(x / w) is one
    // exact double division per row (w is a power-of-ten-ish literal that
    // both engines hold bit-identically); counts/min/max shuffle 20 rows
    """SELECT CAST(least(floor(o_totalprice / 30000.0), 19) AS INT) AS bin,
      |  CAST(least(floor(o_totalprice / 30000.0), 19) AS INT) * 30000.0 AS lo_edge,
      |  COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
      |FROM orders GROUP BY 1, 2 ORDER BY bin"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val bin = least(floor(col("o_totalprice") / 30000.0), lit(19)).cast("int")
    tbl(s, dir, "orders")
      .groupBy(bin.as("bin"), (bin * 30000.0).as("lo_edge"))
      .agg(count(lit(1)).as("n"),
        min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .orderBy("bin")
  }

  q("q_events_hourly",
    """SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"), 18, 4)).cast("double").as("sum_value"))
      .orderBy("h", "event_type")
  }

  q("q_events_sliding",
    """WITH x AS (SELECT event_type, time_bucket(INTERVAL '30 minutes', ts) AS b FROM events),
      |w AS (SELECT event_type, unnest([b, b - INTERVAL 30 MINUTE]) AS ws FROM x)
      |SELECT ws, event_type, COUNT(*) AS n FROM w GROUP BY 1, 2 ORDER BY 1, 2"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // sliding event-time windows (1 h window, 30 min slide): Spark's
    // window() explodes each event into the 2 overlapping windows — same
    // shuffle volume as a tumbling window at 2x row fan-out, epoch-aligned
    // boundaries on both engines
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type")
  }

  q("q_cohort_retention",
    // two user-keyed aggregations reuse one partitioning; week offsets are
    // exact integer day-diffs of week-truncated stamps (Monday start on
    // both engines); retention is a single IEEE division
    """WITH fw AS (SELECT user_id AS u, min(date_trunc('week', ts)) AS cohort_week
      |  FROM events GROUP BY 1),
      |aw AS (SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS week FROM events),
      |j AS (SELECT fw.cohort_week,
      |  CAST(date_diff('day', CAST(fw.cohort_week AS DATE), CAST(aw.week AS DATE)) // 7 AS INT) AS week_offset
      |  FROM aw JOIN fw ON aw.u = fw.u),
      |cs AS (SELECT cohort_week, COUNT(*) AS n_cohort FROM fw GROUP BY 1)
      |SELECT j.cohort_week, j.week_offset, COUNT(*) AS n_active, cs.n_cohort,
      |  round(CAST(COUNT(*) AS DOUBLE) / cs.n_cohort, 6) AS retention
      |FROM j JOIN cs ON j.cohort_week = cs.cohort_week
      |WHERE j.week_offset <= 8
      |GROUP BY 1, 2, 4 ORDER BY 1, 2"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Cohort.weeklyRetention(events(s, dir)).orderBy("cohort_week", "week_offset")
  }

  q("q_anomaly_zscore",
    // integer trailing-window sums are exact under any window-evaluation
    // strategy (segment tree vs streaming), so the z-score's one double
    // combination per row matches bit-for-bit across engines
    """WITH c AS (SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |wz AS (SELECT event_type, h, n, COUNT(*) OVER wnd AS w_n,
      |  SUM(n) OVER wnd AS s1, SUM(n * n) OVER wnd AS s2 FROM c
      |  WINDOW wnd AS (PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, h, n, CASE WHEN w_n = 24
      |  AND CAST(w_n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) <> 0
      |  THEN round((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(w_n AS DOUBLE))
      |    / sqrt((CAST(w_n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |      / (CAST(w_n AS DOUBLE) * (CAST(w_n AS DOUBLE) - 1))), 6) END AS zscore
      |FROM wz ORDER BY event_type, h"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val hourly = events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    Stats.trailingZScore(hourly, "event_type", "h", "n", lookback = 24)
      .orderBy("event_type", "h")
  }

  q("q_window_median",
    // rolling exact median of hourly counts (25-row window): integer
    // inputs, interpolation parity proven by q_percentiles
    """WITH c AS (SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, h, n, round(quantile_cont(n, 0.5) OVER (
      |  PARTITION BY event_type ORDER BY h
      |  ROWS BETWEEN 24 PRECEDING AND CURRENT ROW), 6) AS med25
      |FROM c ORDER BY event_type, h"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, 0)
    events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .withColumn("med25", round(expr("percentile(n, 0.5)").over(w), 6))
      .orderBy("event_type", "h")
  }

  q("q_mode_by_group",
    // deterministic mode: value counts ranked with an explicit value
    // tiebreak (built-in mode() ties are engine-arbitrary)
    """SELECT l_returnflag, l_quantity AS mode_qty, n FROM (
      |  SELECT l_returnflag, l_quantity, COUNT(*) AS n,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY COUNT(*) DESC, l_quantity) AS rk
      |  FROM lineitem GROUP BY 1, 2)
      |WHERE rk = 1 ORDER BY l_returnflag"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("n").desc, col("l_quantity"))
    tbl(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_quantity").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
      .orderBy("l_returnflag")
  }

  q("q_resample_gapfill",
    // hourly spine per user over their observed span, counts left-joined
    // back, gaps forward-filled — all four steps reuse ONE hash
    // partitioning on user_id
    """WITH obs AS (SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n
      |  FROM events WHERE event_type = 'purchase' AND user_id < 40 GROUP BY 1, 2),
      |spine AS (SELECT user_id, unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
      |  FROM obs GROUP BY user_id)
      |SELECT s.user_id, s.h, o.n,
      |  last_value(o.n IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_fill
      |FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.h = o.h
      |ORDER BY s.user_id, s.h"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Resample.hourlyCountsFilled(
        events(s, dir).filter(col("event_type") === "purchase" && col("user_id") < 40),
        "user_id", "ts")
      .orderBy("user_id", "h")
  }

  q("q_json_props",
    """SELECT event_type,
      |  CAST(SUM(TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS INT)) AS BIGINT) AS sum_k,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    events(s, dir).groupBy("event_type")
      .agg(sum(regexp_extract(col("props"), "([0-9]+)", 1).try_cast("int").cast("long"))
        .as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  q("q_map_json",
    """SELECT event_type,
      |  array_to_string(json_keys(props), ',') AS ks,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
      |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
      |  COUNT(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // real JSON parsing (vs q_json_props's regexp fallback): from_json to
    // a MapType + map_keys/element_at — narrow codegen'd projection
    val m = from_json(col("props"), MapType(StringType, IntegerType))
    events(s, dir)
      .select(col("event_type"),
        concat_ws(",", map_keys(m)).as("ks"),
        element_at(m, "k").as("k"))
      .groupBy("event_type", "ks")
      .agg(sum(col("k").cast("long")).as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"), count(lit(1)).as("n"))
      .orderBy("event_type", "ks")
  }

  q("q_asof_join",
    """SELECT event_id, user_id, o_orderkey, o_orderdate FROM (
      |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
      |    row_number() OVER (PARTITION BY e.event_id
      |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
      |WHERE rn = 1 ORDER BY event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // custom sort-merge AsOfJoinExec (graft.plans); ops.AsOfJoin is the
    // compose-built-ins fallback, proven equivalent in OpsSpec
    graft.plans.AsOfJoinPlan.asofMerge(events(s, dir), tbl(s, dir, "orders"),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate", rightTie = "o_orderkey")
      .select("event_id", "user_id", "o_orderkey", "o_orderdate")
      .orderBy("event_id")
  }

  q("q_asof_forward",
    // forward direction: for each order, the FIRST event at or after the
    // order date from the same user (ts is excluded from the output:
    // Spark reads the nanos column truncated to micros, DuckDB keeps
    // nanos — event_id identifies the row exactly)
    """SELECT o_orderkey, o_custkey, event_id FROM (
      |  SELECT o.o_orderkey, o.o_custkey, e.event_id,
      |    row_number() OVER (PARTITION BY o.o_orderkey
      |      ORDER BY e.ts ASC, e.event_id DESC) AS rn
      |  FROM orders o JOIN events e
      |    ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate)
      |WHERE rn = 1 ORDER BY o_orderkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    graft.plans.AsOfJoinPlan.asofMergeForward(tbl(s, dir, "orders"), events(s, dir),
        leftKey = "o_custkey", rightKey = "user_id",
        leftTime = "o_orderdate", rightTime = "ts", rightTie = "event_id")
      .select("o_orderkey", "o_custkey", "event_id")
      .orderBy("o_orderkey")
  }

  q("q_asof_nearest",
    // nearest in either direction, past wins ties: rank all same-user
    // orders by |orderdate - event ts| (micros both sides in the oracle)
    """SELECT event_id, user_id, o_orderkey FROM (
      |  SELECT e.event_id, e.user_id, o.o_orderkey,
      |    row_number() OVER (PARTITION BY e.event_id
      |      ORDER BY abs(epoch_us(o.o_orderdate) - epoch_us(e.ts)),
      |        CASE WHEN o.o_orderdate <= e.ts THEN 0 ELSE 1 END,
      |        o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o ON o.o_custkey = e.user_id)
      |WHERE rn = 1 ORDER BY event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    graft.plans.AsOfJoinPlan.asofMergeNearest(events(s, dir), tbl(s, dir, "orders"),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate", rightTie = "o_orderkey",
        leftId = "event_id")
      .select("event_id", "user_id", "o_orderkey")
      .orderBy("event_id")
  }

  q("q_asof_broadcast",
    // same logical result as q_asof_join; physically the right side is
    // collected + broadcast and the left streams with ZERO exchanges —
    // the dimension-history-lookup plan for a huge fact table
    """SELECT event_id, user_id, o_orderkey, o_orderdate FROM (
      |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
      |    row_number() OVER (PARTITION BY e.event_id
      |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
      |WHERE rn = 1 ORDER BY event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    graft.plans.AsOfJoinPlan.asofMerge(events(s, dir), tbl(s, dir, "orders"),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate", rightTie = "o_orderkey",
        broadcastRight = Some(true))
      .select("event_id", "user_id", "o_orderkey", "o_orderdate")
      .orderBy("event_id")
  }

  q("q_asof_outer",
    """SELECT event_id, user_id, o_orderkey, o_orderdate FROM (
      |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
      |    row_number() OVER (PARTITION BY e.event_id
      |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e LEFT JOIN orders o
      |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
      |WHERE rn = 1 ORDER BY event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // left-outer as-of: events with no prior order keep a null right side
    graft.plans.AsOfJoinPlan.asofMerge(events(s, dir), tbl(s, dir, "orders"),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate", rightTie = "o_orderkey",
        joinType = "left_outer")
      .select("event_id", "user_id", "o_orderkey", "o_orderdate")
      .orderBy("event_id")
  }

  q("q_asof_tolerance",
    """SELECT event_id, user_id, o_orderkey, o_orderdate FROM (
      |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
      |    row_number() OVER (PARTITION BY e.event_id
      |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      |      AND o.o_orderdate >= e.ts - INTERVAL 9000 DAY)
      |WHERE rn = 1 ORDER BY event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // bounded-lookback as-of. 9000 days ≈ 24.6 y: the synthetic events
    // sit in 2024 while orders span 1995–2001, so this bound lands
    // mid-corpus — some events keep their match, stale ones drop.
    graft.plans.AsOfJoinPlan.asofMerge(events(s, dir), tbl(s, dir, "orders"),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate", rightTie = "o_orderkey",
        tolerance = Some(9000L * 86400L * 1000000L)) // micros
      .select("event_id", "user_id", "o_orderkey", "o_orderdate")
      .orderBy("event_id")
  }

  q("q_sessionize",
    """WITH g AS (SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
      |  FROM events WHERE user_id < 50
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, ts,
      |  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS session_id FROM g)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
      |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // 30-minute-gap sessionization — one shuffle on user_id; the lag,
    // the running session counter, and the final per-session rollup all
    // reuse that partitioning (no second exchange until the rollup).
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, dir).filter(col("user_id") < 50)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L).otherwise(0L))
      .withColumn("session_id", sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("ts").as("session_start"),
        max("ts").as("session_end"))
      .orderBy("user_id", "session_id")
  }

  q("q_range_join",
    """WITH w AS (SELECT DISTINCT date_trunc('week', ts) + INTERVAL 12 HOUR AS w_start
      |  FROM events)
      |SELECT w_start, COUNT(e.event_id) AS n
      |FROM w LEFT JOIN events e
      |  ON e.ts >= w.w_start AND e.ts < w.w_start + INTERVAL 24 HOUR
      |GROUP BY w_start ORDER BY w_start"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // Interval-containment (range) join, rewritten scale-first: fan each
    // 24 h window out to the 2 calendar days it can overlap, equi-join on
    // the day bucket, keep the range predicate as a residual filter. At
    // 100 TB this is a broadcast hash join probing the fact table once —
    // never the O(n·m) nested-loop a raw range predicate would plan.
    val ev = events(s, dir).withColumn("d", date_trunc("DAY", col("ts")))
    val w = events(s, dir).select(
        (date_trunc("WEEK", col("ts")) + expr("INTERVAL 12 HOURS")).as("w_start"))
      .distinct()
    val wx = w.withColumn("d", explode(array(
      date_trunc("DAY", col("w_start")),
      date_trunc("DAY", col("w_start") + expr("INTERVAL 24 HOURS")))))
    broadcast(wx).join(ev,
        wx("d") === ev("d") && ev("ts") >= wx("w_start") &&
          ev("ts") < wx("w_start") + expr("INTERVAL 24 HOURS"), "left")
      .groupBy("w_start").agg(count(col("event_id")).as("n"))
      .orderBy("w_start")
  }

  q("q_copurchase_pairs",
    // market-basket pair mining: the order-keyed self-join fans out to
    // C(items,2) per order (bounded by basket size, never corpus²); the
    // pair-count shuffle ships only (pa, pb) keys with map-side partials
    """WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |pairs AS (SELECT a.p AS pa, b.p AS pb FROM ps a
      |  JOIN ps b ON a.o = b.o AND a.p < b.p)
      |SELECT pa, pb, COUNT(*) AS n FROM pairs GROUP BY 1, 2
      |ORDER BY n DESC, pa, pb LIMIT 20"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val ps = tbl(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    ps.as("a").join(ps.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pa"), col("pb")).limit(20)
  }

  q("q_twap",
    // time-weighted average price: integer-micros interval weights from
    // lead(), exact decimal value*weight products, one IEEE division
    """WITH h AS (SELECT o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS v,
      |    epoch_us(lead(o_orderdate) OVER w) - epoch_us(o_orderdate) AS wt
      |  FROM orders WHERE o_custkey < 200
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      |SELECT o_custkey, COUNT(wt) AS n_intervals, CAST(SUM(wt) AS BIGINT) AS total_micros,
      |  round(CAST(SUM(v * wt) AS DOUBLE) / SUM(wt), 6) AS twap
      |FROM h WHERE wt IS NOT NULL GROUP BY 1 ORDER BY 1"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    tbl(s, dir, "orders").filter(col("o_custkey") < 200)
      .select(col("o_custkey"), dec(col("o_totalprice"), 12, 2).as("v"),
        // o_orderdate surfaces as NTZ; UTC session makes the LTZ cast
        // wall-clock-preserving, matching DuckDB's epoch_us
        (unix_micros(lead("o_orderdate", 1).over(w).cast(TimestampType))
          - unix_micros(col("o_orderdate").cast(TimestampType))).as("wt"))
      .filter(col("wt").isNotNull)
      .groupBy("o_custkey")
      .agg(count(col("wt")).as("n_intervals"), sum("wt").as("total_micros"),
        round(sum(col("v") * col("wt")).cast("double") / sum("wt"), 6).as("twap"))
      .orderBy("o_custkey")
  }

  q("q_graph_triangles",
    // triangle counting in the parts-sharing-a-supplier graph: canonical
    // (pa < pb) edges make each triangle appear exactly once in the
    // wedge-plus-closing-edge join — the standard distributed algorithm
    """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
      |  WHERE l_partkey < 300),
      |e AS (SELECT DISTINCT a.p AS pa, b.p AS pb FROM ps a
      |  JOIN ps b ON a.s = b.s AND a.p < b.p),
      |tri AS (SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z FROM e e1
      |  JOIN e e2 ON e1.pb = e2.pa
      |  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
      |SELECT (SELECT COUNT(*) FROM e) AS n_edges,
      |  (SELECT COUNT(*) FROM tri) AS n_triangles"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // the oracle has no hot-key cap, which is sound here because
    // l_partkey < 300 bounds every supplier at 300 distinct parts —
    // far under the explicit 10k cap (the skew defense stays opt-in;
    // coOccurrenceEdges defaults to exact)
    val edges = Graph.coOccurrenceEdges(
        tbl(s, dir, "lineitem").filter(col("l_partkey") < 300),
        "l_partkey", "l_suppkey", hotKeyCap = 10000)
      .localCheckpoint() // three consumers (two join sides + the count)
    Graph.triangles(edges).agg(count(lit(1)).as("n_triangles"))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
      .select(col("n_edges"), col("n_triangles"))
  }

  q("q_graph_pagerank",
    // integer fixed-point PageRank (scale 1e12, damping 85/100 exact) on
    // the symmetric 3-NN cosine graph — every iteration is integer
    // arithmetic, so the DuckDB recursive CTE reproduces it bit-for-bit.
    // The cohort is BOUNDED (vec_id < 2000): brute all-pairs 3-NN on a
    // corpus-scaled cohort is quadratic — an unbounded graph build must
    // go through the IVF/LSH candidate paths (ops/Similarity)
    """WITH RECURSIVE
      |q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id % 10 < 3 AND vec_id < 2000),
      |c AS (SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings WHERE vec_id % 10 < 3 AND vec_id < 2000),
      |s AS (SELECT q_id, n_id,
      |  list_sum(list_transform(range(1, len(q_vec) + 1), i -> CAST(q_vec[i] AS DOUBLE) * CAST(n_vec[i] AS DOUBLE))) /
      |  (sqrt(list_sum(list_transform(range(1, len(q_vec) + 1), i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE)))) *
      |   sqrt(list_sum(list_transform(range(1, len(n_vec) + 1), i -> CAST(n_vec[i] AS DOUBLE) * CAST(n_vec[i] AS DOUBLE))))) AS cosim
      |  FROM q JOIN c ON q_id != n_id),
      |r AS (SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY round(cosim, 6) DESC, n_id) AS rn FROM s),
      |e0 AS (SELECT q_id AS pa, n_id AS pb FROM r WHERE rn <= 3),
      |edges AS (SELECT DISTINCT src, dst FROM
      |  (SELECT pa AS src, pb AS dst FROM e0 UNION ALL SELECT pb, pa FROM e0)),
      |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
      |verts AS (SELECT src AS p FROM deg),
      |nv AS (SELECT COUNT(*) AS n FROM verts),
      |pr(iter, p, rank) AS (
      |  SELECT 0, p, 1000000000000 // (SELECT n FROM nv) FROM verts
      |  UNION ALL
      |  SELECT pr.iter + 1, e.dst,
      |    (15 * (1000000000000 // (SELECT n FROM nv))) // 100
      |      + (85 * SUM(pr.rank // deg.d)) // 100
      |  FROM pr JOIN edges e ON pr.p = e.src JOIN deg ON deg.src = pr.p
      |  WHERE pr.iter < 5 GROUP BY 1, 2)
      |SELECT p, rank FROM pr WHERE iter = 5 ORDER BY rank DESC, p LIMIT 25"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val sub = tbl(s, dir, "embeddings")
      .filter(pmod(col("vec_id"), lit(10)) < 3 && col("vec_id") < 2000)
    val knn = Similarity.bruteForceKnn(sub, sub, k = 3)
      .select(col("q_id").as("pa"), col("n_id").as("pb"))
    val edges = knn.select(col("pa").as("src"), col("pb").as("dst"))
      .union(knn.select(col("pb").as("src"), col("pa").as("dst"))).distinct()
    Graph.pageRank(edges, iters = 5)
      .orderBy(col("rank").desc, col("p")).limit(25)
  }

  q("q_unpivot",
    """SELECT p_partkey, attr, val FROM (
      |  SELECT p_partkey, 'retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val FROM part
      |  UNION ALL SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part)
      |ORDER BY p_partkey, attr"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "part")
      .select(col("p_partkey"), col("p_retailprice").cast("double").as("retailprice"),
        col("p_size").cast("double").as("size"))
      .unpivot(Array(col("p_partkey")), Array(col("retailprice"), col("size")),
        "attr", "val")
      .orderBy("p_partkey", "attr")
  }

  q("q_pivot",
    """SELECT date_trunc('day', ts) AS d,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'error') AS error,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'view') AS view
      |FROM events GROUP BY 1 ORDER BY 1"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy("d")
  }

  q("q_percentiles",
    // deliberately exercises Spark's BUILT-IN exact percentile — the
    // interpolation-parity witness the distributed form is checked
    // against (RanksSpec). Scale caveat: the built-in packs each group's
    // values into one aggregation buffer; row-scaled groups should use
    // Ranks.percentilesExact (see q_qq_deciles) instead.
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS med_qty,
      |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
      |  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "lineitem").groupBy("l_returnflag")
      .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("med_qty"),
        round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25_price"),
        round(expr("percentile(l_extendedprice, 0.75)"), 6).as("p75_price"))
      .orderBy("l_returnflag")
  }

  q("q_group_percentiles",
    // per-group exact price quartiles through the SIZE-AWARE dispatcher
    // Ranks.groupedPercentiles: a per-group approx_count_distinct probe
    // routes bounded domains to the built-in percentile() aggregation
    // buffer (fast) and continuous domains to the bufferless prefix-pass
    // machinery (no per-task memory cliff at 100 TB). Both regimes'
    // plans are pinned in PlanSpec; the throughput tradeoff is measured
    // in PLANS.md. Values agree at the 6-dp publication grain (lerp
    // shapes documented at Ranks.percentilesExact)
    """WITH q AS (SELECT l_returnflag AS g,
      |    unnest(quantile_cont(CAST(l_extendedprice AS DOUBLE),
      |      [0.25, 0.5, 0.75])) AS v,
      |    unnest([1, 2, 3]) AS i
      |  FROM lineitem GROUP BY 1)
      |SELECT g AS l_returnflag,
      |  round(MAX(CASE WHEN i = 1 THEN v END), 6) AS p25_price,
      |  round(MAX(CASE WHEN i = 2 THEN v END), 6) AS med_price,
      |  round(MAX(CASE WHEN i = 3 THEN v END), 6) AS p75_price
      |FROM q GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val pr = Ranks.groupedPercentiles(tbl(s, dir, "lineitem"),
      col("l_returnflag"), col("l_extendedprice"), Seq(0.25, 0.5, 0.75))
    pr.groupBy(col("g").as("l_returnflag"))
      .agg(round(max(when(col("i") === 1, col("value"))), 6).as("p25_price"),
        round(max(when(col("i") === 2, col("value"))), 6).as("med_price"),
        round(max(when(col("i") === 3, col("value"))), 6).as("p75_price"))
      .orderBy("l_returnflag")
  }

  q("q_grouping_sets",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM graft_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  q("q_collect_agg",
    """SELECT c_nationkey,
      |  string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segs,
      |  COUNT(*) AS n
      |FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
      |GROUP BY c_nationkey ORDER BY c_nationkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "customer").select("c_nationkey", "c_mktsegment").distinct()
      .groupBy("c_nationkey")
      .agg(concat_ws(",", sort_array(collect_list(col("c_mktsegment")))).as("segs"),
        count(lit(1)).as("n"))
      .orderBy("c_nationkey")
  }

  q("q_array_funcs",
    """WITH g AS (SELECT c_nationkey, list_sort(list(c_custkey)) AS ks
      |  FROM customer GROUP BY c_nationkey)
      |SELECT c_nationkey, CAST(len(ks) AS INT) AS n,
      |  array_to_string(ks[1:5], ',') AS first5,
      |  list_contains(ks, 1) AS has_1,
      |  ks[1] AS min_k, ks[-1] AS max_k,
      |  CAST(len(list_filter(ks, k -> k % 2 = 0)) AS INT) AS n_even
      |FROM g ORDER BY c_nationkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // array surface over a grouped collect: sort/slice/contains/index/
    // filter (arrays stringified where output — engines agree on values,
    // not on nested-type hash encodings)
    tbl(s, dir, "customer").groupBy("c_nationkey")
      .agg(sort_array(collect_list(col("c_custkey"))).as("ks"))
      .select(col("c_nationkey"), size(col("ks")).as("n"),
        concat_ws(",", slice(col("ks"), 1, 5).cast("array<string>")).as("first5"),
        array_contains(col("ks"), 1L).as("has_1"),
        element_at(col("ks"), 1).as("min_k"), element_at(col("ks"), -1).as("max_k"),
        size(filter(col("ks"), k => k % 2 === 0)).as("n_even"))
      .orderBy("c_nationkey")
  }

  q("q_approx_distinct",
    // HLL sketch values are engine-specific, but the sketch's ERROR BOUND
    // is not: the oracle pins the exact distinct counts and expects the
    // approximate path to land within 3x the configured rsd (0.05), so
    // the approximate operator is verified, not just executed. A Spark
    // HLL++ regression (or a wrong column wired into the sketch) flips
    // within_rsd to false and fails the hash check.
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
      |  true AS within_rsd
      |FROM lineitem GROUP BY 1 ORDER BY 1"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "lineitem").groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), rsd = 0.05).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double")
          / col("exact_parts") <= 0.15).as("within_rsd"))
      .orderBy("l_returnflag")
  }

  // ===========================================================================
  // LLM-data-pipeline extensions — dedup, similarity search, text analysis
  // (SURVEY.md §7.5; first-class per BASELINE.json north star).
  // ===========================================================================

  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"
  /** DuckDB mirror of TextAnalysis.shingles(text, n). */
  private def shinglesSqlN(n: Int): String = {
    val parts = (0 until n).map(j => s"$toksSql[i+$j]").mkString(", ")
    s"list_distinct(list_transform(range(1, CASE WHEN len($toksSql) >= $n THEN len($toksSql) - ${n - 2} ELSE 1 END, 1), " +
      s"i -> concat_ws(' ', $parts)))"
  }
  private val shinglesSql = shinglesSqlN(3)
  /** DuckDB mirror of Pipeline.md5Hash60 (60-bit md5 prefix as BIGINT). */
  private def md5Hash60Sql(c: String): String =
    s"('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15))::BIGINT"

  /** DuckDB mirror of Sketch.hllEstimate from (sp, np) aggregates: raw
    * harmonic estimate with the linear-counting small-range correction,
    * whose m·ln(m/V) table is quantized driver-side into literals shared
    * with the Spark plan (no ln at query time in either engine).
    */
  private def hllEstSql(m: Int, sp: String, np: String): String = {
    val shift = Sketch.hllShift(m)
    val twoShift = 1L << shift
    val lc = Sketch.hllLcTable(m).mkString("[", ", ", "]")
    val raw = s"(${Sketch.hllAlpha(m)}::DOUBLE * ${m.toDouble * m}::DOUBLE" +
      s" * ${twoShift.toDouble}::DOUBLE" +
      s" / ($sp + ($m - $np) * CAST($twoShift AS BIGINT)))"
    s"round(CASE WHEN $m - $np > 0 AND $raw <= ${2.5 * m}" +
      s" THEN ($lc)[$m - $np] ELSE $raw END, 6)"
  }

  q("dedup_exact",
    """SELECT md5(text) AS digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keep_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Dedup.exact(tbl(s, dir, "documents"), "text", "doc_id").orderBy("keep_id")
  }

  q("dedup_exact_materialized",
    // the exact-dedup MATERIALIZATION (full rows of each digest family's
    // min-id keeper — what `curate dedup-exact` writes): digest
    // aggregate + semi join, the corpus never collected
    """SELECT d.doc_id, d.source FROM documents d
      |JOIN (SELECT md5(text) AS dg, MIN(doc_id) AS keep_id
      |  FROM documents GROUP BY 1) k
      |ON md5(d.text) = k.dg AND d.doc_id = k.keep_id
      |ORDER BY d.doc_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Dedup.dedupExact(tbl(s, dir, "documents"), "text", "doc_id")
      .select("doc_id", "source").orderBy("doc_id")
  }

  q("dedup_exact_normalized",
    // canonical exact dedup: digests over the NFC+lower+whitespace
    // canonical form, so case/spacing/composition variants of the same
    // text collapse into one family — the normalize kernel feeding the
    // dedup pipeline (plain exact dedup misses all three variant axes)
    """SELECT md5(regexp_replace(regexp_replace(lower(nfc_normalize(text)),
      |  '^[ \t\n\r\f\x0B]+|[ \t\n\r\f\x0B]+$', '', 'g'),
      |  '[ \t\n\r\f\x0B]+', ' ', 'g')) AS digest,
      |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keep_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Dedup.exact(
        tbl(s, dir, "documents")
          .withColumn("text", graft.functions.NormalizeText(col("text"))),
        "text", "doc_id")
      .orderBy("keep_id")
  }

  q("dedup_incremental",
    // new-batch dedup against the already-kept corpus: batch self-dedup
    // (min-id per digest) then bloom-prefiltered exact anti-join against
    // the base digests — the base is never re-deduped or re-shuffled
    // (see Pipeline.incrementalDedup)
    """WITH base AS (SELECT md5(text) AS digest FROM documents WHERE doc_id % 10 < 8),
      |inc AS (SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 10 >= 8),
      |keep AS (SELECT doc_id, digest FROM (SELECT doc_id, digest,
      |  MIN(doc_id) OVER (PARTITION BY digest) AS m FROM inc) WHERE doc_id = m)
      |SELECT doc_id, digest FROM keep
      |WHERE digest NOT IN (SELECT digest FROM base) ORDER BY doc_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val docs = tbl(s, dir, "documents")
    Pipeline.incrementalDedup(
        docs.filter(col("doc_id") % 10 < 8),
        docs.filter(col("doc_id") % 10 >= 8), "text", "doc_id")
      .select(col("doc_id"), col("__digest").as("digest"))
      .orderBy("doc_id")
  }

  q("dedup_ngram_jaccard",
    s"""WITH sh AS (SELECT doc_id, lang, floor(length(text) / 64.0) AS bucket,
       |  $shinglesSql AS s FROM documents)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  round(len(list_intersect(a.s, b.s))::DOUBLE /
       |        len(list_distinct(list_concat(a.s, b.s))), 6) AS jac
       |FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |  AND abs(a.bucket - b.bucket) <= 1
       |WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
       |      len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.5
       |ORDER BY a_id, b_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Dedup.ngramJaccardPairs(tbl(s, dir, "documents"), "text", "doc_id", "lang",
      shingleN = 3, threshold = 0.5).orderBy("a_id", "b_id")
  }

  /** The minhash-LSH pair pipeline as a reusable DuckDB CTE chain ending
    * in `pairs(a_id, b_id, jac)` (threshold applied), mirroring
    * Dedup.minhashLsh expression-for-expression (Kirsch-Mitzenmacher
    * double hashing: h_i(t) = h1(t) + i*h2(t) over 60/56-bit md5 slices,
    * exact in BIGINT).
    */
  private def minhashPairsCtes(bands: Int, rows: Int, where: String = ""): String = {
    val k = bands * rows
    val sigEntries = (0 until k)
      .map(i => "list_min(list_transform(s, t -> " +
        "('0x' || substr(md5(t), 1, 15))::BIGINT + " +
        s"$i * ('0x' || substr(md5(t), 16, 14))::BIGINT))").mkString(", ")
    val bandSelects = (0 until bands).map { b =>
      val parts = (1 to rows).map(r => s"sig[${b * rows + r}]::VARCHAR").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($parts) AS digest FROM sig"
    }.mkString(" UNION ALL ")
    s"""sh AS (SELECT doc_id, $shinglesSql AS s FROM documents $where),
       |sig AS (SELECT doc_id, s, [$sigEntries] AS sig FROM sh),
       |bands AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.digest = b.digest
       |    AND a.doc_id < b.doc_id),
       |pairs AS (SELECT a_id, b_id, jac FROM (SELECT a_id, b_id,
       |  round(len(list_intersect(x.s, y.s))::DOUBLE /
       |        len(list_distinct(list_concat(x.s, y.s))), 6) AS jac
       |  FROM cand JOIN sh x ON x.doc_id = a_id JOIN sh y ON y.doc_id = b_id)
       |  WHERE jac >= 0.5)"""
      .stripMargin.replace("\n", " ")
  }

  q("q_eval_lsh_sweep", {
    // LSH parameter sweep: the (bands, rows) tuning table. Each config's
    // candidate generator is replayed exactly (same two-part md5 minhash
    // family); truth is the bounded-sample exact jaccard >= 0.5 set the
    // recall eval uses. (9,1) maximizes recall, (1,9) precision, (3,3)
    // sits on the S-curve knee — the table a practitioner reads before
    // committing a 100 TB dedup run to one configuration.
    val where = "WHERE doc_id % 3 = 0 AND doc_id < 5000"
    def cfgCtes(tag: String, bands: Int, rows: Int): String = {
      val k = bands * rows
      val sigEntries = (0 until k)
        .map(i => "list_min(list_transform(s, t -> " +
          "('0x' || substr(md5(t), 1, 15))::BIGINT + " +
          s"$i * ('0x' || substr(md5(t), 16, 14))::BIGINT))").mkString(", ")
      val bandSelects = (0 until bands).map { b =>
        val parts = (1 to rows).map(r => s"sig[${b * rows + r}]::VARCHAR")
          .mkString(" || '|' || ")
        s"SELECT doc_id, $b AS band, md5($parts) AS digest FROM sig_$tag"
      }.mkString(" UNION ALL ")
      s"""sig_$tag AS (SELECT doc_id, s, [$sigEntries] AS sig FROM sh),
         |bands_$tag AS ($bandSelects),
         |cand_$tag AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands_$tag a JOIN bands_$tag b ON a.band = b.band
         |    AND a.digest = b.digest AND a.doc_id < b.doc_id),
         |hit_$tag AS (SELECT c.a_id FROM cand_$tag c JOIN truth t
         |  ON c.a_id = t.a_id AND c.b_id = t.b_id)""".stripMargin
    }
    def cfgRow(tag: String, bands: Int, rows: Int): String =
      s"""SELECT $bands AS n_bands, $rows AS n_rows,
         |  (SELECT COUNT(*) FROM truth) AS n_truth,
         |  (SELECT COUNT(*) FROM cand_$tag) AS n_cand,
         |  (SELECT COUNT(*) FROM hit_$tag) AS n_hit,
         |  CASE WHEN (SELECT COUNT(*) FROM cand_$tag) = 0 THEN NULL
         |    ELSE round((SELECT COUNT(*) FROM hit_$tag)::DOUBLE /
         |      (SELECT COUNT(*) FROM cand_$tag), 6) END AS precision_lsh,
         |  CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN NULL
         |    ELSE round((SELECT COUNT(*) FROM hit_$tag)::DOUBLE /
         |      (SELECT COUNT(*) FROM truth), 6) END AS recall_lsh""".stripMargin
    val cfgs = Seq(("b1r9", 1, 9), ("b3r3", 3, 3), ("b9r1", 9, 1))
    (s"""WITH sh AS (SELECT doc_id, $shinglesSql AS s FROM documents $where),
        |truth AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
        |        len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.5),
        |""".stripMargin +
      cfgs.map { case (t, b, r) => cfgCtes(t, b, r) }.mkString(",\n") + "\n" +
      cfgs.map { case (t, b, r) => cfgRow(t, b, r) }.mkString(" UNION ALL ") +
      " ORDER BY n_bands, n_rows").replace("\n", " ")
  }) { (s, dir) =>
    val docs = tbl(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0 && col("doc_id") < 5000)
    val sh = docs.select(col("doc_id"),
        sort_array(transform(TextAnalysis.shingles(col("text"), 3),
          t => xxhash64(t))).as("sx"))
      .localCheckpoint()
    val truth = Grid.allPairs(sh, "doc_id", g = 8)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"),
        graft.functions.ArrayKernels.sortedIntersectCount(
          col("a.sx"), col("b.sx")).as("__i"),
        size(col("a.sx")).as("__na"), size(col("b.sx")).as("__nb"))
      .filter(round(col("__i").cast("double") /
        (col("__na") + col("__nb") - col("__i")), 6) >= 0.5)
      .select("a_id", "b_id")
      .localCheckpoint() // three configs probe it; compute the truth once
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val rows = Seq((1, 9), (3, 3), (9, 1)).map { case (b, r) =>
      // two consumers (count + hit join): checkpoint the bounded
      // candidate set so the band self-join runs once per config
      // PIN the exact regime: this query MEASURES candidate recall, so
      // the dispatcher's cap would confound the very metric it reports
      // (ADVICE r11); the Auto default stays the library contract
      val cand = Dedup.lshCandidatePairs(docs, "text", "doc_id",
          shingleN = 3, bands = b, rows = r, maxBucket = Int.MaxValue)
        .localCheckpoint()
      val hit = cand.join(truth, Seq("a_id", "b_id"))
      cand.agg(count(lit(1)).as("n_cand"))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .crossJoin(nTruth)
        .select(lit(b).as("n_bands"), lit(r).as("n_rows"), col("n_truth"),
          col("n_cand"), col("n_hit"),
          when(col("n_cand") === 0, lit(null).cast("double"))
            .otherwise(round(col("n_hit").cast("double") / col("n_cand"), 6))
            .as("precision_lsh"),
          when(col("n_truth") === 0, lit(null).cast("double"))
            .otherwise(round(col("n_hit").cast("double") / col("n_truth"), 6))
            .as("recall_lsh"))
    }
    rows.reduce(_ unionByName _).orderBy("n_bands", "n_rows")
  }

  q("dedup_incremental_minhash", {
    // near-dup incremental filter: incoming (doc_id%10>=8) dropped when
    // an LSH band collides with a base doc AND exact jaccard >= 0.5 —
    // same sig/band/verify replay as minhashPairsCtes, across the split
    val k = 9 // bands * rows
    val sigEntries = (0 until k)
      .map(i => "list_min(list_transform(s, t -> " +
        "('0x' || substr(md5(t), 1, 15))::BIGINT + " +
        s"$i * ('0x' || substr(md5(t), 16, 14))::BIGINT))").mkString(", ")
    val bandSelects = (0 until 3).map { b =>
      val parts = (1 to 3).map(r => s"sig[${b * 3 + r}]::VARCHAR").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($parts) AS digest FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH sh AS (SELECT doc_id, $shinglesSql AS s FROM documents),
       |sig AS (SELECT doc_id, s, [$sigEntries] AS sig FROM sh),
       |bands AS ($bandSelects),
       |cand AS (SELECT DISTINCT i.doc_id AS i_id, b.doc_id AS b_id
       |  FROM bands i JOIN bands b ON i.band = b.band AND i.digest = b.digest
       |  WHERE i.doc_id % 10 >= 8 AND b.doc_id % 10 < 8),
       |cont AS (SELECT DISTINCT i_id FROM (SELECT i_id,
       |  round(len(list_intersect(x.s, y.s))::DOUBLE /
       |        len(list_distinct(list_concat(x.s, y.s))), 6) AS jac
       |  FROM cand JOIN sh x ON x.doc_id = i_id JOIN sh y ON y.doc_id = b_id)
       |  WHERE jac >= 0.5)
       |SELECT doc_id FROM documents WHERE doc_id % 10 >= 8
       |  AND doc_id NOT IN (SELECT i_id FROM cont) ORDER BY doc_id"""
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val docs = tbl(s, dir, "documents")
    // oracle replays EXACT LSH — pin the regime so the published SQL is
    // true at EVERY scale, not just below the dispatcher's flip point
    // (ADVICE r11); Auto remains the library default
    Dedup.incrementalMinhash(
        docs.filter(col("doc_id") % 10 < 8),
        docs.filter(col("doc_id") % 10 >= 8), "text", "doc_id",
        maxBucket = Int.MaxValue)
      .select("doc_id").orderBy("doc_id")
  }

  q("dedup_prefix_jaccard",
    // exact similarity join via PPJoin-style prefix filtering: candidates
    // key on each set's rarest tokens (df-ascending order), so posting-
    // list size bounds the fan-out on a natural vocabulary; zero false
    // negatives, unlike the LSH band join. (This corpus's ~31-token
    // vocabulary makes every posting list long — worst case for the
    // filter, which is exactly why both paths exist.)
    """WITH t0 AS (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS tok
      |    FROM documents WHERE doc_id % 7 < 2),
      |dfq AS (SELECT tok, COUNT(*) AS df FROM t0 GROUP BY 1),
      |rk AS (SELECT t0.doc_id, t0.tok,
      |    ROW_NUMBER() OVER (PARTITION BY t0.doc_id ORDER BY dfq.df, t0.tok) AS rnk,
      |    COUNT(*) OVER (PARTITION BY t0.doc_id) AS sz
      |  FROM t0 JOIN dfq ON t0.tok = dfq.tok),
      |pfx AS (SELECT doc_id, tok FROM rk WHERE rnk <= sz - CAST(ceil(0.8 * sz) AS INT) + 1),
      |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id FROM pfx a
      |  JOIN pfx b ON a.tok = b.tok AND a.doc_id < b.doc_id),
      |sets AS (SELECT doc_id, list_sort(list(tok)) AS s, COUNT(*) AS n FROM t0 GROUP BY 1),
      |v AS (SELECT a_id, b_id, len(list_intersect(sa.s, sb.s)) AS i, sa.n AS na, sb.n AS nb
      |  FROM cand JOIN sets sa ON sa.doc_id = cand.a_id JOIN sets sb ON sb.doc_id = cand.b_id)
      |SELECT a_id, b_id, round(CAST(i AS DOUBLE) / (na + nb - i), 6) AS jac
      |FROM v WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.8 ORDER BY a_id, b_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Dedup.prefixJaccardPairs(
        tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(7)) < 2),
        "text", "doc_id", threshold = 0.8)
      .orderBy("a_id", "b_id")
  }

  q("dedup_minhash_lsh",
    s"WITH ${minhashPairsCtes(bands = 3, rows = 3)} " +
      "SELECT a_id, b_id, jac FROM pairs ORDER BY a_id, b_id") { (s, dir) =>
    // REGIME PIN (ADVICE r11): every dedup_*/q_eval_* oracle below
    // replays EXACT LSH (minhashPairsCtes), so these queries state
    // maxBucket = Int.MaxValue explicitly -- the declared SQL spec then
    // holds at any corpus size, instead of silently diverging past the
    // dispatcher's flip point. The LIBRARY default everywhere else
    // remains AutoBucket (probe + route), regime-pinned in OpsSpec and
    // measured in PLANS.md.
    Dedup.minhashLsh(tbl(s, dir, "documents"), "text", "doc_id",
      shingleN = 3, bands = 3, rows = 3, threshold = 0.5,
      maxBucket = Int.MaxValue).orderBy("a_id", "b_id")
  }

  q("dedup_auto_dispatch",
    // the DISPATCHER itself, oracle-backed — SCALE-TRUE (ADVICE r12): the
    // oracle DERIVES the dispatch from the corpus instead of hardcoding
    // the sub-floor literals, replaying the full decision procedure —
    // probe paid iff n_docs > 8192 (DefaultProbeFloorDocs); regime exact
    // iff unprobed or raw band collisions ΣC(k,2) ≤ 96·n_docs
    // (DefaultMaxCandidatesPerDoc); pairs = the exact replay in the exact
    // regime, the ≤50-bucket (DefaultCappedBucket) replay in the capped
    // one. The declared spec now holds at ANY corpus size, like the rest
    // of the dedup_* family.
    s"""WITH ${minhashPairsCtes(bands = 3, rows = 3)},
       |nd AS (SELECT COUNT(*) AS n_docs FROM sh WHERE len(s) > 0),
       |bk AS (SELECT band, digest, COUNT(*) AS k FROM bands
       |  WHERE digest IS NOT NULL GROUP BY 1, 2),
       |pm AS (SELECT COALESCE(SUM(CAST(k AS DOUBLE) * (k - 1) / 2), 0) AS cand FROM bk),
       |rg AS (SELECT n_docs, n_docs > 8192 AS probed,
       |    CASE WHEN n_docs <= 8192 OR cand <= 96.0 * n_docs
       |      THEN 'exact' ELSE 'capped' END AS regime
       |  FROM nd, pm),
       |keepb AS (SELECT band, digest FROM bk WHERE k <= 50),
       |candc AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN keepb kb ON a.band = kb.band AND a.digest = kb.digest
       |  JOIN bands b ON a.band = b.band AND a.digest = b.digest
       |    AND a.doc_id < b.doc_id),
       |pairsc AS (SELECT a_id, b_id FROM (SELECT a_id, b_id,
       |  round(len(list_intersect(x.s, y.s))::DOUBLE /
       |        len(list_distinct(list_concat(x.s, y.s))), 6) AS jac
       |  FROM candc JOIN sh x ON x.doc_id = a_id JOIN sh y ON y.doc_id = b_id)
       |  WHERE jac >= 0.5)
       |SELECT regime, probed, n_docs,
       |  CASE WHEN regime = 'exact' THEN (SELECT COUNT(*) FROM pairs)
       |       ELSE (SELECT COUNT(*) FROM pairsc) END AS n_pairs
       |FROM rg"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val d = Dedup.minhashLshAuto(tbl(s, dir, "documents"), "text", "doc_id")
    d.pairs.agg(count(lit(1)).as("n_pairs"))
      .select(lit(d.regime).as("regime"), lit(d.probed).as("probed"),
        lit(d.nDocs).as("n_docs"), col("n_pairs"))
  }

  q("dedup_shared_ngram",
    // exact shared-span criterion: any two docs sharing a verbatim
    // 8-token window pair up — the windowed suffix-array substring test,
    // keyed on the window itself (no hashing, no verification step)
    s"""WITH gr AS (SELECT doc_id, unnest(${shinglesSqlN(8)}) AS g FROM documents)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
       |FROM gr a JOIN gr b ON a.g = b.g AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id ORDER BY a_id, b_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Dedup.sharedNgramPairs(tbl(s, dir, "documents"), "text", "doc_id", n = 8,
        maxGramDocs = Int.MaxValue) // exact-regime pin (see dedup_minhash_lsh)
      .orderBy("a_id", "b_id")
  }

  q("q_eval_span_cap_sweep", {
    // the stop-gram gate's tuning table (the q_eval_lsh_bucket_sweep
    // pattern for sharedNgramPairs): pair recall under three explicit
    // maxGramDocs caps vs the exact pair set. A pair survives cap c iff
    // its MINIMUM shared-window posting count <= c, and capped pairs
    // are always a SUBSET of exact pairs, so recall = n_pairs/n_truth
    // with no intersection join. Run this before trusting a cap on a
    // new corpus — the dispatcher default's cap is 50.
    s"""WITH gr AS (SELECT doc_id, unnest(${shinglesSqlN(8)}) AS g FROM documents),
       |kc AS (SELECT g, COUNT(*) AS k FROM gr GROUP BY g),
       |pr AS (SELECT kc.k, a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM gr a JOIN gr b ON a.g = b.g AND a.doc_id < b.doc_id
       |  JOIN kc ON kc.g = a.g),
       |agg AS (SELECT a_id, b_id, MIN(k) AS min_k FROM pr GROUP BY 1, 2),
       |caps(c) AS (VALUES (1000000), (20), (3))
       |SELECT c AS max_gram_docs, COUNT(*) AS n_truth,
       |  COUNT(*) FILTER (WHERE min_k <= c) AS n_pairs,
       |  round(COUNT(*) FILTER (WHERE min_k <= c)::DOUBLE / COUNT(*), 6)
       |    AS recall
       |FROM agg, caps GROUP BY c ORDER BY max_gram_docs DESC"""
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val docs = tbl(s, dir, "documents")
    // two consumers per cap arm reference truth; compute it once
    val truth = Dedup.sharedNgramPairs(docs, "text", "doc_id", n = 8,
      maxGramDocs = Int.MaxValue).select("a_id", "b_id").localCheckpoint()
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    Seq(1000000, 20, 3).map { cap =>
      Dedup.sharedNgramPairs(docs, "text", "doc_id", n = 8, maxGramDocs = cap)
        .agg(count(lit(1)).as("n_pairs"))
        .crossJoin(nTruth)
        .select(lit(cap).as("max_gram_docs"), col("n_truth"), col("n_pairs"),
          round(col("n_pairs").cast("double") / col("n_truth"), 6).as("recall"))
    }.reduce(_ union _).orderBy(col("max_gram_docs").desc)
  }

  q("dedup_span_clusters",
    // shared-span pairs -> connected components: the family view of
    // exact-substring dedup (dedup_cluster's pipeline with the span
    // criterion as the edge set); the oracle closes the same graph with
    // a recursive transitive closure
    s"""WITH RECURSIVE gr AS (SELECT doc_id, unnest(${shinglesSqlN(8)}) AS g FROM documents),
       |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id FROM gr a
       |  JOIN gr b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION ALL SELECT b_id, a_id FROM pairs),
       |reach AS (SELECT src AS doc_id, src AS r FROM edges
       |  UNION SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id)
       |SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val pairs = Dedup.sharedNgramPairs(tbl(s, dir, "documents"), "text",
      "doc_id", n = 8, maxGramDocs = Int.MaxValue) // exact-regime pin
    Dedup.clusterPairs(pairs.select("a_id", "b_id")).orderBy("doc_id")
  }

  q("dedup_incremental_span",
    // incremental exact-substring filter: an incoming doc (doc_id%10>=8)
    // drops when it shares any verbatim 8-token window with a kept base
    // doc — the span criterion applied across the base/incoming split
    s"""WITH grb AS (SELECT doc_id, unnest(${shinglesSqlN(8)}) AS g
       |  FROM documents WHERE doc_id % 10 < 8),
       |gri AS (SELECT doc_id, unnest(${shinglesSqlN(8)}) AS g
       |  FROM documents WHERE doc_id % 10 >= 8),
       |drop0 AS (SELECT DISTINCT i.doc_id FROM gri i JOIN grb b ON i.g = b.g)
       |SELECT doc_id FROM documents WHERE doc_id % 10 >= 8
       |  AND doc_id NOT IN (SELECT doc_id FROM drop0) ORDER BY doc_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val docs = tbl(s, dir, "documents")
    Dedup.incrementalSharedNgram(
        docs.filter(col("doc_id") % 10 < 8),
        docs.filter(col("doc_id") % 10 >= 8), "text", "doc_id", n = 8)
      .select("doc_id").orderBy("doc_id")
  }

  q("q_eval_dedup_recall", {
    // candidate CTEs replayed over the capped sample (every third doc,
    // bounded by an absolute id); the unreferenced pairs CTE is harmless
    val ctes = minhashPairsCtes(bands = 3, rows = 3, where = "WHERE doc_id % 3 = 0 AND doc_id < 5000")
    s"""WITH $ctes,
       |truth AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
       |        len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.5),
       |hit AS (SELECT c.a_id, c.b_id FROM cand c JOIN truth t
       |  ON c.a_id = t.a_id AND c.b_id = t.b_id)
       |SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
       |  (SELECT COUNT(*) FROM cand) AS n_cand,
       |  (SELECT COUNT(*) FROM hit) AS n_hit,
       |  CASE WHEN (SELECT COUNT(*) FROM cand) = 0 THEN NULL
       |    ELSE round((SELECT COUNT(*) FROM hit)::DOUBLE /
       |      (SELECT COUNT(*) FROM cand), 6) END AS precision_lsh,
       |  CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN NULL
       |    ELSE round((SELECT COUNT(*) FROM hit)::DOUBLE /
       |      (SELECT COUNT(*) FROM truth), 6) END AS recall_lsh"""
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    // LSH quality eval: band-collision candidates vs exact >= 0.5 jaccard
    // ground truth. Truth is inherently all-pairs, so it runs on a
    // BOUNDED deterministic sample (doc_id % 3, capped at an absolute id
    // bound) — the standard way to audit an LSH configuration at scale:
    // truth on a fixed-size sample, candidates from the production band
    // join. The absolute cap is what keeps the quadratic truth constant
    // as the corpus grows (a proportional sample measured 30x from
    // sf0.1 to sf1; the cap holds it at the sf0.1 cost at any scale).
    // The all-pairs truth scan runs on the shared id-sub-block grid
    // (Grid.allPairs) so the quadratic work spreads over G*(G+1)/2
    // balanced shuffle keys.
    val docs = tbl(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0 && col("doc_id") < 5000)
    // exact-regime pin: recall evaluation (see dedup_minhash_lsh note)
    val cand = Dedup.lshCandidatePairs(docs, "text", "doc_id",
      shingleN = 3, bands = 3, rows = 3, maxBucket = Int.MaxValue)
    val sh = docs.select(col("doc_id"),
        sort_array(transform(TextAnalysis.shingles(col("text"), 3),
          t => xxhash64(t))).as("sx"))
      .localCheckpoint() // two grid roles scan it; cut the md5 upstream
    val truth = Grid.allPairs(sh, "doc_id", g = 8)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"),
        graft.functions.ArrayKernels.sortedIntersectCount(
          col("a.sx"), col("b.sx")).as("__i"),
        size(col("a.sx")).as("__na"), size(col("b.sx")).as("__nb"))
      .filter(round(col("__i").cast("double") /
        (col("__na") + col("__nb") - col("__i")), 6) >= 0.5)
      .select("a_id", "b_id")
    val hit = cand.join(truth, Seq("a_id", "b_id"))
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        when(col("n_cand") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_hit").cast("double") / col("n_cand"), 6))
          .as("precision_lsh"),
        when(col("n_truth") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_hit").cast("double") / col("n_truth"), 6))
          .as("recall_lsh"))
  }

  q("q_eval_lsh_bucket_sweep", {
    // the maxBucket (stop-shingle cap) tuning table: for each cap the
    // candidate count, hit count, precision and recall vs the exact
    // >= 0.5-jaccard truth on the bounded sample — so the cap the
    // 100 TB dedup run commits to is a MEASURED recall trade-off, not a
    // scaladoc claim (pairs with q_eval_lsh_sweep, which tunes
    // bands x rows; this tunes the bucket gate at fixed 3x3). The
    // 1000000 row is the effectively-exact reference (no sample bucket
    // comes near it); 5 and 2 force the gate to drop dup-family
    // buckets, trading recall for candidate volume.
    val where = "WHERE doc_id % 3 = 0 AND doc_id < 5000"
    val k = 9
    val sigEntries = (0 until k)
      .map(i => "list_min(list_transform(s, t -> " +
        "('0x' || substr(md5(t), 1, 15))::BIGINT + " +
        s"$i * ('0x' || substr(md5(t), 16, 14))::BIGINT))").mkString(", ")
    val bandSelects = (0 until 3).map { b =>
      val parts = (1 to 3).map(r => s"sig[${b * 3 + r}]::VARCHAR")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($parts) AS digest FROM sig"
    }.mkString(" UNION ALL ")
    def capCtes(cap: Int): String =
      s"""keep_c$cap AS (SELECT band, digest FROM bands
         |  GROUP BY 1, 2 HAVING COUNT(*) <= $cap),
         |bk_c$cap AS (SELECT b.doc_id, b.band, b.digest FROM bands b
         |  JOIN keep_c$cap USING (band, digest)),
         |cand_c$cap AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bk_c$cap a JOIN bk_c$cap b ON a.band = b.band
         |    AND a.digest = b.digest AND a.doc_id < b.doc_id),
         |hit_c$cap AS (SELECT c.a_id FROM cand_c$cap c JOIN truth t
         |  ON c.a_id = t.a_id AND c.b_id = t.b_id)""".stripMargin
    def capRow(cap: Int): String =
      s"""SELECT $cap AS max_bucket,
         |  (SELECT COUNT(*) FROM truth) AS n_truth,
         |  (SELECT COUNT(*) FROM cand_c$cap) AS n_cand,
         |  (SELECT COUNT(*) FROM hit_c$cap) AS n_hit,
         |  CASE WHEN (SELECT COUNT(*) FROM cand_c$cap) = 0 THEN NULL
         |    ELSE round((SELECT COUNT(*) FROM hit_c$cap)::DOUBLE /
         |      (SELECT COUNT(*) FROM cand_c$cap), 6) END AS precision_lsh,
         |  CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN NULL
         |    ELSE round((SELECT COUNT(*) FROM hit_c$cap)::DOUBLE /
         |      (SELECT COUNT(*) FROM truth), 6) END AS recall_lsh""".stripMargin
    val caps = Seq(1000000, 5, 2)
    (s"""WITH sh AS (SELECT doc_id, $shinglesSql AS s FROM documents $where),
        |truth AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
        |        len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.5),
        |sig AS (SELECT doc_id, s, [$sigEntries] AS sig FROM sh),
        |bands AS ($bandSelects),
        |""".stripMargin +
      caps.map(capCtes).mkString(",\n") + "\n" +
      caps.map(capRow).mkString(" UNION ALL ") +
      " ORDER BY max_bucket").replace("\n", " ")
  }) { (s, dir) =>
    val docs = tbl(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0 && col("doc_id") < 5000)
    val sh = docs.select(col("doc_id"),
        sort_array(transform(TextAnalysis.shingles(col("text"), 3),
          t => xxhash64(t))).as("sx"))
      .localCheckpoint()
    val truth = Grid.allPairs(sh, "doc_id", g = 8)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"),
        graft.functions.ArrayKernels.sortedIntersectCount(
          col("a.sx"), col("b.sx")).as("__i"),
        size(col("a.sx")).as("__na"), size(col("b.sx")).as("__nb"))
      .filter(round(col("__i").cast("double") /
        (col("__na") + col("__nb") - col("__i")), 6) >= 0.5)
      .select("a_id", "b_id")
      .localCheckpoint() // three cap configs probe it; compute truth once
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    // ONE band build for all three caps (r16): the shingle + minhash +
    // band-digest work is cap-independent, so compute it once and gate
    // per cap — the old per-cap lshCandidatePairs calls re-shingled the
    // corpus three times. Lazy: the first cap's candidate checkpoint
    // materializes it.
    val bandsF = Dedup.lshBandFrame(docs, "text", "doc_id",
        shingleN = 3, bands = 3, rows = 3)
      .localCheckpoint(false)
    val rowsOut = Seq(1000000, 5, 2).map { cap =>
      val cand = Dedup.lshCandidatePairsFromBands(bandsF, maxBucket = cap)
        .localCheckpoint() // two consumers: count + hit join
      val hit = cand.join(truth, Seq("a_id", "b_id"))
      cand.agg(count(lit(1)).as("n_cand"))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .crossJoin(nTruth)
        .select(lit(cap).as("max_bucket"), col("n_truth"),
          col("n_cand"), col("n_hit"),
          when(col("n_cand") === 0, lit(null).cast("double"))
            .otherwise(round(col("n_hit").cast("double") / col("n_cand"), 6))
            .as("precision_lsh"),
          when(col("n_truth") === 0, lit(null).cast("double"))
            .otherwise(round(col("n_hit").cast("double") / col("n_truth"), 6))
            .as("recall_lsh"))
    }
    rowsOut.reduce(_ unionByName _).orderBy("max_bucket")
  }

  /** Shared CTE prefix computing per-doc 60-bit simhash signatures,
    * mirroring Dedup.simhashSignatures.
    */
  private def simhashSigCte(bits: Int): String = {
    val votes = (0 until bits)
      .map(j => s"SUM(CASE WHEN ((hv >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS v$j").mkString(", ")
    val sigExpr = (0 until bits)
      .map(j => s"(CASE WHEN v$j >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM t),
       |v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id),
       |s AS (SELECT doc_id, $sigExpr AS sig FROM v)""".stripMargin.replace("\n", " ")
  }

  q("dedup_simhash",
    simhashSigCte(60) +
      " SELECT sig, MIN(doc_id) AS keep_id, COUNT(*) AS n_docs" +
      " FROM s GROUP BY sig ORDER BY keep_id") { (s, dir) =>
    Dedup.simhashFamilies(tbl(s, dir, "documents"), "text", "doc_id")
      .select("sig", "keep_id", "n_docs").orderBy("keep_id")
  }

  q("dedup_simhash_hamming", {
    val bandSelects = (0 until 4).map(j =>
      s"SELECT doc_id, sig, $j AS band, (sig >> ${j * 15}) & 32767 AS bv FROM s")
      .mkString(" UNION ALL ")
    simhashSigCte(60) +
      s""", bands AS ($bandSelects),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         |  bit_count(xor(a.sig, b.sig)) AS hamming
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv
         |    AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id, CAST(hamming AS INT) AS hamming FROM cand
         |WHERE hamming <= 3 ORDER BY a_id, b_id""".stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    Dedup.simhashHammingPairs(tbl(s, dir, "documents"), "text", "doc_id")
      .orderBy("a_id", "b_id")
  }

  q("q_correlated_subquery",
    """SELECT o_custkey, COUNT(*) AS n FROM orders o
      |WHERE o_totalprice > (SELECT 2 * CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
      |  / COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |GROUP BY o_custkey ORDER BY o_custkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // correlated scalar subquery: Catalyst decorrelates to an aggregate +
    // self-join on the correlation key (no per-row re-execution); exact
    // decimal sum -> one double division -> doubled, same IEEE both engines
    tbl(s, dir, "orders").createOrReplaceTempView("graft_orders_corr")
    s.sql(
      """SELECT o_custkey, COUNT(*) AS n FROM graft_orders_corr o
        |WHERE o_totalprice > (SELECT 2 * CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |  / COUNT(*) FROM graft_orders_corr o2 WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
  }

  q("q_exists_subquery",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_totalprice > 200000)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_totalprice < 10000)
      |ORDER BY c_custkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // correlated EXISTS / NOT EXISTS: Catalyst decorrelates to a left-semi
    // plus a left-anti join on the correlation key — two hash joins, no
    // per-row subquery execution
    tbl(s, dir, "customer").createOrReplaceTempView("graft_customer_ex")
    tbl(s, dir, "orders").createOrReplaceTempView("graft_orders_ex")
    s.sql(
      """SELECT c_custkey, c_name FROM graft_customer_ex
        |WHERE EXISTS (SELECT 1 FROM graft_orders_ex
        |    WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |  AND NOT EXISTS (SELECT 1 FROM graft_orders_ex
        |    WHERE o_custkey = c_custkey AND o_totalprice < 10000)
        |ORDER BY c_custkey""".stripMargin)
  }

  q("q_window_range",
    """SELECT user_id, event_id,
      |  CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(value AS DOUBLE)
      |    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near
      |FROM events WHERE user_id < 10 ORDER BY user_id, event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // RANGE frame (value-based, not row-based): frame membership depends
    // only on the order value, so ties in `value` cannot perturb the count
    events(s, dir).filter(col("user_id") < 10)
      .createOrReplaceTempView("graft_events_range")
    s.sql(
      """SELECT user_id, event_id,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(value AS DOUBLE)
        |    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_near
        |FROM graft_events_range ORDER BY user_id, event_id""".stripMargin)
  }

  q("q_scalar_subquery",
    """SELECT o_orderpriority, COUNT(*) AS n FROM orders
      |WHERE o_totalprice * (SELECT COUNT(*) FROM orders) >
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) FROM orders)
      |GROUP BY 1 ORDER BY 1"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "orders").createOrReplaceTempView("graft_orders")
    // above-average filter with an exact-arithmetic threshold: price*N >
    // exact_sum compares identically in any engine (no double reduction)
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS n FROM graft_orders
        |WHERE o_totalprice * (SELECT COUNT(*) FROM graft_orders) >
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) FROM graft_orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  private def knnOracleSql(joinCond: String): String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
       |  FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id AS n_id, embedding AS n_vec, label AS n_label FROM embeddings),
       |s AS (SELECT q_id, n_id,
       |  list_sum(list_transform(range(1, len(q_vec) + 1),
       |    i -> CAST(q_vec[i] AS DOUBLE) * CAST(n_vec[i] AS DOUBLE))) /
       |  (sqrt(list_sum(list_transform(range(1, len(q_vec) + 1),
       |    i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE)))) *
       |   sqrt(list_sum(list_transform(range(1, len(n_vec) + 1),
       |    i -> CAST(n_vec[i] AS DOUBLE) * CAST(n_vec[i] AS DOUBLE))))) AS cosim
       |  FROM q JOIN c ON $joinCond),
       |r AS (SELECT q_id, n_id, round(cosim, 6) AS cosim,
       |  row_number() OVER (PARTITION BY q_id ORDER BY round(cosim, 6) DESC, n_id) AS rn
       |  FROM s)
       |SELECT q_id, n_id, cosim AS cos FROM r WHERE rn <= 5 ORDER BY q_id, n_id"""
      .stripMargin.replace("\n", " ")

  q("dedup_embedding_cosine",
    """WITH e AS (SELECT vec_id, label, embedding,
      |  sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
      |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
      |  FROM embeddings)
      |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |  round(list_sum(list_transform(range(1, len(a.embedding) + 1),
      |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |    / (a.nrm * b.nrm), 6) AS cos
      |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE round(list_sum(list_transform(range(1, len(a.embedding) + 1),
      |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |    / (a.nrm * b.nrm), 6) >= 0.2
      |ORDER BY a_id, b_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // Embedding-cosine near-dup: pairs above a cosine threshold, blocked
    // by the coarse cell (label). ~10 distinct labels would put ALL the
    // quadratic work on ~10 shuffle keys, so the pair scan runs on the
    // shared id-sub-block grid (Grid.allPairs: label×G·(G+1)/2 balanced
    // keys, each unordered pair met exactly once, shuffle-hash pinned).
    val e = tbl(s, dir, "embeddings").select(col("vec_id"), col("label"),
      col("embedding"), Similarity.l2Norm(col("embedding")).as("nrm"))
    Grid.allPairs(e, "vec_id", g = 8, keyCols = Seq("label"))
      .select(least(col("a.vec_id"), col("b.vec_id")).as("a_id"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("b_id"),
        // dot and norm-product are IEEE-commutative, so the orientation
        // swap behind least/greatest cannot change a bit of the result
        round(Similarity.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .filter(col("cos") >= 0.2)
      .orderBy("a_id", "b_id")
  }

  q("knn_cosine_brute", knnOracleSql("q_id != n_id")) { (s, dir) =>
    val emb = tbl(s, dir, "embeddings")
    Similarity.bruteForceKnn(emb, emb.filter(col("vec_id") < 10), k = 5)
      .orderBy("q_id", "n_id")
  }

  q("knn_hard_negatives", knnOracleSql("q_label != n_label")) { (s, dir) =>
    // contrastive-training hard negatives: most-similar DIFFERENT-label
    // vectors; label mismatch implies id mismatch, so the oracle's only
    // condition is the label inequality
    val emb = tbl(s, dir, "embeddings")
    Similarity.hardNegativeKnn(emb, emb.filter(col("vec_id") < 10), k = 5)
      .orderBy("q_id", "n_id")
  }

  q("knn_cosine_ivf", knnOracleSql("q_label = n_label AND q_id != n_id")) { (s, dir) =>
    val emb = tbl(s, dir, "embeddings")
    Similarity.ivfKnn(emb, emb.filter(col("vec_id") < 10), k = 5, cellCol = "label")
      .orderBy("q_id", "n_id")
  }

  q("q_negative_sampling",
    // contrastive training's OTHER negative source: uniform random
    // different-label negatives, seeded per (query, candidate) by md5 so
    // the draw is reproducible across engines and re-runs (the same
    // determinism contract as the weighted sampler's md5 uniforms)
    """WITH q AS (SELECT vec_id AS q_id, label AS q_label FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS n_id, label AS n_label FROM embeddings),
      |s AS (SELECT q_id, n_id,
      |  md5(CAST(q_id AS VARCHAR) || '|' || CAST(n_id AS VARCHAR)) AS u
      |  FROM q JOIN c ON q_label != n_label),
      |r AS (SELECT q_id, n_id,
      |  row_number() OVER (PARTITION BY q_id ORDER BY u, n_id) AS rn FROM s)
      |SELECT q_id, n_id FROM r WHERE rn <= 5 ORDER BY q_id, n_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // queries broadcast (tiny side); the corpus streams through one scan
    // spread across the shuffle width; per-query top-k is a window over
    // the md5 rank — map-side group-limited like every other sampler
    val emb = tbl(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"))
    val c = Similarity.spreadForScan(
      emb.select(col("vec_id").as("n_id"), col("label").as("n_label")))
    val w = Window.partitionBy("q_id").orderBy("u", "n_id")
    c.join(broadcast(q), col("q_label") =!= col("n_label"))
      .select(col("q_id"), col("n_id"),
        md5(concat(col("q_id").cast("string"), lit("|"),
          col("n_id").cast("string"))).as("u"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q_id", "n_id").orderBy("q_id", "n_id")
  }

  q("knn_cosine_ivf_coarse",
    """WITH cent AS (SELECT vec_id AS cid, embedding AS cvec,
      |  sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
      |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS cnrm
      |  FROM embeddings WHERE vec_id < 8),
      |e AS (SELECT vec_id, embedding,
      |  sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
      |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |a AS (SELECT e.vec_id, e.embedding, e.nrm, c.cid,
      |  list_sum(list_transform(range(1, len(e.embedding) + 1),
      |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE))) / (e.nrm * c.cnrm) AS ccos
      |  FROM e CROSS JOIN cent c),
      |cell AS (SELECT vec_id, embedding, nrm, cid AS cell FROM
      |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM a)
      |  WHERE rn = 1),
      |q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_norm, cell FROM cell WHERE vec_id < 10),
      |cc AS (SELECT vec_id AS n_id, embedding AS n_vec, nrm AS n_norm, cell FROM cell),
      |s AS (SELECT q_id, n_id,
      |  round(list_sum(list_transform(range(1, len(q_vec) + 1),
      |    i -> CAST(q_vec[i] AS DOUBLE) * CAST(n_vec[i] AS DOUBLE))) / (q_norm * n_norm), 6) AS cos
      |  FROM q JOIN cc USING (cell) WHERE q_id != n_id),
      |r AS (SELECT q_id, n_id, cos,
      |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM s)
      |SELECT q_id, n_id, cos FROM r WHERE rn <= 5 ORDER BY q_id, n_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // real IVF shape: a tiny centroid codebook (here the first 8 vectors;
    // an offline k-means codebook drops into the same signature) becomes
    // plan-time literals, assignment is a narrow argmax projection, and
    // search shuffles on the cell id only
    val emb = tbl(s, dir, "embeddings")
    val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    Similarity.ivfCentroidKnn(emb, emb.filter(col("vec_id") < 10), k = 5, centroids)
      .orderBy("q_id", "n_id")
  }

  q("q_eval_ivf_sweep", {
    // IVF nProbe sweep: recall@5 vs exact brute-force truth for
    // nProbe ∈ {1, 2, 4} over the same 8-cell index — the accuracy/cost
    // tuning table for the ANN knob (mirrors q_eval_lsh_sweep). Truth
    // and per-config results use the same (cos desc, n_id) tie-break, so
    // the hit sets are deterministic in both engines.
    val shared =
      """cent AS (SELECT vec_id AS cid, embedding AS cvec,
        |  sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS cnrm
        |  FROM embeddings WHERE vec_id < 8),
        |e AS (SELECT vec_id, embedding,
        |  sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |a AS (SELECT e.vec_id, e.embedding, e.nrm, c.cid,
        |  list_sum(list_transform(range(1, len(e.embedding) + 1),
        |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE))) / (e.nrm * c.cnrm) AS ccos
        |  FROM e CROSS JOIN cent c),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM a),
        |cellc AS (SELECT vec_id, embedding, nrm, cid AS cell FROM ranked WHERE rn = 1),
        |bs AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |  round(list_sum(list_transform(range(1, len(q.embedding) + 1),
        |    i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE))) / (q.nrm * n.nrm), 6) AS cos
        |  FROM e q JOIN e n ON q.vec_id != n.vec_id WHERE q.vec_id < 10),
        |truth AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM bs)
        |  WHERE rn <= 5)""".stripMargin
    def cfg(p: Int): String =
      s"""cellq_$p AS (SELECT vec_id, embedding, nrm, cid AS cell FROM ranked
         |  WHERE rn <= $p AND vec_id < 10),
         |s_$p AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |  round(list_sum(list_transform(range(1, len(q.embedding) + 1),
         |    i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE))) / (q.nrm * n.nrm), 6) AS cos
         |  FROM cellq_$p q JOIN cellc n USING (cell) WHERE q.vec_id != n.vec_id),
         |r_$p AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM s_$p)
         |  WHERE rn <= 5),
         |h_$p AS (SELECT r.q_id FROM r_$p r JOIN truth t
         |  ON t.q_id = r.q_id AND t.n_id = r.n_id)""".stripMargin
    def row(p: Int): String =
      s"""SELECT $p AS n_probe,
         |  (SELECT COUNT(*) FROM truth) AS n_truth,
         |  (SELECT COUNT(*) FROM h_$p) AS n_hit,
         |  round((SELECT COUNT(*) FROM h_$p)::DOUBLE /
         |    (SELECT COUNT(*) FROM truth), 6) AS recall_at_5""".stripMargin
    ("WITH " + shared + ", " + Seq(1, 2, 4).map(cfg).mkString(", ") + " " +
      Seq(1, 2, 4).map(row).mkString(" UNION ALL ") +
      " ORDER BY n_probe").replace("\n", " ")
  }) { (s, dir) =>
    val emb = tbl(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    val truth = Similarity.bruteForceKnn(emb, queries, k = 5)
      .select("q_id", "n_id").localCheckpoint() // probed by three configs
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    Seq(1, 2, 4).map { p =>
      val hits = Similarity.ivfMultiProbeKnn(emb, queries, k = 5,
          centroids, nProbe = p)
        .select("q_id", "n_id").join(truth, Seq("q_id", "n_id"))
      hits.agg(count(lit(1)).as("n_hit")).crossJoin(nTruth)
        .select(lit(p).as("n_probe"), col("n_truth"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_truth"), 6)
            .as("recall_at_5"))
    }.reduce(_ unionByName _).orderBy("n_probe")
  }

  q("knn_cosine_ivf_persisted",
    // the PERSISTED-index path: codebook + precomputed cell assignments
    // written once per corpus (cached per sfDir like the stream
    // landings) and read back at query time — floats round-trip parquet
    // losslessly, so the result is bit-identical to the in-memory
    // trained path and shares its oracle
    kmeansKnnOracleSql(k = 8, iters = 2, dim = 64, topK = 5, nQueries = 10)) { (s, dir) =>
    val emb = tbl(s, dir, "embeddings")
    val idx = cachedLanding(s"ivfidx:$dir") { d =>
      Similarity.writeIvfIndex(emb, d, k = 8, iters = 2, dim = 64)
    }
    Similarity.ivfKnnFromIndex(s, idx, emb.filter(col("vec_id") < 10), k = 5)
      .orderBy("q_id", "n_id")
  }

  q("knn_cosine_ivf_persisted_incremental",
    // INCREMENTAL index maintenance: build from the kept base
    // (vec_id%10<8 — the incremental-dedup split convention), then
    // APPEND the incoming batch with ivfIndexAppend (stored-codebook
    // assignment, cell-partition append, no retrain/rebuild). The
    // oracle trains on the base only (trainWhere through the shared
    // k-means chain) and assigns every vector with that codebook —
    // exactly what build+append leaves on disk, so search over the
    // appended index hash-matches a from-scratch assignment of the
    // full corpus
    kmeansKnnOracleSql(k = 8, iters = 2, dim = 64, topK = 5, nQueries = 10,
      trainWhere = "WHERE vec_id % 10 < 8")) { (s, dir) =>
    val emb = tbl(s, dir, "embeddings")
    val idx = cachedLanding(s"ivfidxinc:$dir") { d =>
      Similarity.writeIvfIndex(emb.filter(col("vec_id") % 10 < 8), d,
        k = 8, iters = 2, dim = 64)
      Similarity.ivfIndexAppend(s, d, emb.filter(col("vec_id") % 10 >= 8))
    }
    Similarity.ivfKnnFromIndex(s, idx, emb.filter(col("vec_id") < 10), k = 5)
      .orderBy("q_id", "n_id")
  }

  q("knn_cosine_ivf_persisted_compacted",
    // COMPACTION closes the maintenance loop ivfIndexAppend opened:
    // build on the kept base, append the incoming batch in TWO separate
    // commits (each its own set of small parquet files), then
    // ivfIndexCompact rewrites the cell partitions co-located on the
    // cell id — codebook and rows untouched, so search over the
    // compacted index hash-matches the same base-trained oracle as the
    // incremental path (bit-identity is the compaction contract;
    // AdviceRegressionSpec also proves the file count drops)
    kmeansKnnOracleSql(k = 8, iters = 2, dim = 64, topK = 5, nQueries = 10,
      trainWhere = "WHERE vec_id % 10 < 8")) { (s, dir) =>
    val emb = tbl(s, dir, "embeddings")
    val idx = cachedLanding(s"ivfidxcmp:$dir") { d =>
      Similarity.writeIvfIndex(emb.filter(col("vec_id") % 10 < 8), d,
        k = 8, iters = 2, dim = 64)
      Similarity.ivfIndexAppend(s, d, emb.filter(col("vec_id") % 10 === 8))
      Similarity.ivfIndexAppend(s, d, emb.filter(col("vec_id") % 10 === 9))
      Similarity.ivfIndexCompact(s, d)
    }
    Similarity.ivfKnnFromIndex(s, idx, emb.filter(col("vec_id") < 10), k = 5)
      .orderBy("q_id", "n_id")
  }

  q("q_eval_ivf_cell_balance", {
    // index-health report: per-cell population of the persisted IVF
    // index plus the ×1000 fixed-point load factor (1000 ≡ perfectly
    // balanced). The IVF scan-cost model assumes ~1/n_cells per query —
    // this is the report that says whether that bound actually holds or
    // a hot cell is quietly carrying a linear fraction of the corpus
    // (the same failure mode the LSH maxBucket sweep measures). Oracle
    // replays the shared k-means assignment chain and counts cells.
    ((kmeansCellCtes(k = 8, iters = 2, dim = 64) ++ Seq(
      "pc AS (SELECT cell, COUNT(*) AS n_vecs FROM cellt GROUP BY 1)",
      "t AS (SELECT SUM(n_vecs) AS tot FROM pc)"))
      .mkString("WITH ", ", ", "") +
      " SELECT CAST(cell AS INT) AS cell, CAST(n_vecs AS BIGINT) AS n_vecs," +
      " CAST(n_vecs * 8 * 1000 // tot AS BIGINT) AS load_x1000" +
      " FROM pc, t ORDER BY cell").stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val idx = cachedLanding(s"ivfidx:$dir") { d =>
      Similarity.writeIvfIndex(tbl(s, dir, "embeddings"), d,
        k = 8, iters = 2, dim = 64)
    }
    val pc = s.read.parquet(Similarity.ivfCellsPath(s, idx))
      .groupBy("cell").agg(count(lit(1)).as("n_vecs"))
    val t = pc.agg(sum("n_vecs").as("tot"))
    pc.crossJoin(broadcast(t))
      .select(col("cell").cast("int").as("cell"), col("n_vecs"),
        expr("n_vecs * 8 * 1000 div tot").as("load_x1000"))
      .orderBy("cell")
  }

  q("q_eval_knn_graph_recall", {
    // ANN-backed kNN-GRAPH construction (Graph.knnGraph, VERDICT r12 §2):
    // the 3-NN cosine graph built through the persisted IVF index's
    // precomputed cells vs the brute-force truth graph, swept over the
    // nProbe recall-vs-cost knob — edge recall per nProbe is THE tuning
    // table a corpus-scale graph build reads before trusting a
    // (cells, nProbe) pair (edges crossing all probed cells are the
    // measured loss). Oracle replays the shared k-means chain, the
    // ranked query-side cell assignment against the trained codebook,
    // both graph builds, and the symmetrized-edge intersections.
    val dotE = duckDotE(64) _
    val probes = Seq(1, 2, 4)
    def cfg(p: Int): Seq[String] = Seq(
      s"""si_$p AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |  round(${dotE("CAST(q.embedding[i] AS DOUBLE)", "CAST(n.embedding[i] AS DOUBLE)")} /
         |    (q.nrm * n.nrm), 6) AS cos
         |  FROM rkq qa JOIN e q ON q.vec_id = qa.vec_id AND qa.rn <= $p
         |  JOIN cw n ON n.cell = qa.cell AND n.vec_id != q.vec_id)""",
      s"""ri_$p AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn
         |  FROM si_$p) WHERE rn <= 3)""",
      s"""ei_$p AS (SELECT DISTINCT src, dst FROM (SELECT q_id AS src, n_id AS dst
         |  FROM ri_$p UNION ALL SELECT n_id, q_id FROM ri_$p))""",
      s"""hit_$p AS (SELECT ei.src FROM ei_$p ei JOIN eb
         |  ON ei.src = eb.src AND ei.dst = eb.dst)""")
    def row(p: Int): String =
      s"""SELECT $p AS n_probe,
         |  (SELECT COUNT(*) FROM eb) AS n_truth_edges,
         |  (SELECT COUNT(*) FROM ei_$p) AS n_ivf_edges,
         |  (SELECT COUNT(*) FROM hit_$p) AS n_hit,
         |  round((SELECT COUNT(*) FROM hit_$p)::DOUBLE /
         |    (SELECT COUNT(*) FROM eb), 6) AS edge_recall""".stripMargin
    ((kmeansCellCtes(k = 8, iters = 2, dim = 64) ++ Seq(
      s"""cw AS (SELECT e.vec_id, e.embedding, e.nrm, c.cell
         |  FROM e JOIN cellt c USING (vec_id))""",
      // ranked query-side assignment against the TRAINED codebook (c2 =
      // the 2-iteration chain's final centroids) — the ivfAssignCells
      // contract: cos DESC, centroid id ASC
      s"""rkq AS (SELECT e.vec_id, c.cid AS cell,
         |  row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${dotE("CAST(e.embedding[i] AS DOUBLE)", "c.cv[i]")} /
         |      (e.nrm * sqrt(${dotE("c.cv[i]", "c.cv[i]")})) DESC, c.cid) AS rn
         |  FROM e CROSS JOIN c2 c)""",
      s"""sb AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |  round(${dotE("CAST(q.embedding[i] AS DOUBLE)", "CAST(n.embedding[i] AS DOUBLE)")} /
         |    (q.nrm * n.nrm), 6) AS cos
         |  FROM e q JOIN e n ON q.vec_id != n.vec_id)""",
      s"""rb AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn
         |  FROM sb) WHERE rn <= 3)""",
      s"""eb AS (SELECT DISTINCT src, dst FROM (SELECT q_id AS src, n_id AS dst
         |  FROM rb UNION ALL SELECT n_id, q_id FROM rb))""") ++
      probes.flatMap(cfg))
      .mkString("WITH ", ", ", " ") +
      probes.map(row).mkString(" UNION ALL ") + " ORDER BY n_probe")
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val emb = tbl(s, dir, "embeddings")
    val idx = cachedLanding(s"ivfidx:$dir") { d =>
      Similarity.writeIvfIndex(emb, d, k = 8, iters = 2, dim = 64)
    }
    // the truth feeds all three configs (count + hit join each):
    // checkpoint it and each config's bounded edge set
    val eb = Graph.knnGraphBrute(emb, k = 3).localCheckpoint()
    val nT = eb.agg(count(lit(1)).as("n_truth_edges"))
    Seq(1, 2, 4).map { p =>
      // exact-regime pin (the dedup_minhash_lsh convention): this
      // oracle replays the plain cell join, so the declared SQL holds at
      // any corpus size; AutoCellVecs stays the library default
      val ei = Graph.knnGraph(s, idx, k = 3, nProbe = p,
        maxCellVecs = Int.MaxValue).localCheckpoint()
      val hit = ei.join(eb, Seq("src", "dst"))
      ei.agg(count(lit(1)).as("n_ivf_edges"))
        .crossJoin(nT)
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(lit(p).as("n_probe"), col("n_truth_edges"),
          col("n_ivf_edges"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_truth_edges"), 6)
            .as("edge_recall"))
    }.reduce(_ unionByName _).orderBy("n_probe")
  }

  q("q_eval_knn_graph_refine", {
    // NN-Descent refinement (Similarity.knnRefine / Graph.knnGraphRefined):
    // per-round edge recall vs the brute truth, starting from the
    // nProbe=2 IVF graph — the LINEAR-cost recall path (≤4nk² rescored
    // candidates per round) vs paying more probes. The base MUST cross
    // cells: an nProbe=1 graph is cell-confined (every edge lives inside
    // one k-means cell, so the two-hop closure can never leave it and
    // refinement is measurably a no-op — the flat-recall finding this
    // eval's first draft surfaced); nProbe=2's second-best-cell edges
    // are the bridges refinement amplifies. Oracle replays the k-means
    // chain, the ranked 2-cell assignment, the base top-k, and both
    // refinement rounds (undirected two-hop expansion → exact rescore →
    // top-k). READ THE TABLE AGAINST THE PROBE COLUMN of
    // q_eval_knn_graph_recall before spending rounds: on both measured
    // corpus shapes (clustered sf1 AND the isotropic scattered fixture,
    // PLANS.md r14) probes reached ~1.7x the recall of refinement at
    // equal wall, and refinement converged by round 2 — its ceiling is
    // the base graph's bridge reach, so rounds > 0 pay off only under a
    // frozen per-vector scan budget on a strongly clustered corpus.
    val dotE = duckDotE(64) _
    val rounds = Seq(0, 1, 2)
    def cosSql(qa: String, na: String): String =
      s"""round(${dotE(s"CAST($qa.embedding[i] AS DOUBLE)", s"CAST($na.embedding[i] AS DOUBLE)")} /
         |    ($qa.nrm * $na.nrm), 6)""".stripMargin
    def refine(j: Int): Seq[String] = Seq(
      s"""und_$j AS (SELECT q_id, n_id FROM r$j
         |  UNION SELECT n_id, q_id FROM r$j)""",
      s"""cand_$j AS (SELECT DISTINCT q_id, n_id FROM (
         |  SELECT a.q_id, b.n_id FROM und_$j a JOIN und_$j b ON a.n_id = b.q_id
         |  UNION ALL SELECT q_id, n_id FROM und_$j) WHERE q_id != n_id)""",
      s"""sc_$j AS (SELECT c.q_id, c.n_id, ${cosSql("q", "n")} AS cos
         |  FROM cand_$j c JOIN e q ON q.vec_id = c.q_id
         |  JOIN e n ON n.vec_id = c.n_id)""",
      s"""r${j + 1} AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn
         |  FROM sc_$j) WHERE rn <= 3)""")
    def edges(j: Int): Seq[String] = Seq(
      s"""ed_$j AS (SELECT DISTINCT src, dst FROM (SELECT q_id AS src, n_id AS dst
         |  FROM r$j UNION ALL SELECT n_id, q_id FROM r$j))""",
      s"""hit_$j AS (SELECT ed.src FROM ed_$j ed JOIN eb
         |  ON ed.src = eb.src AND ed.dst = eb.dst)""")
    def row(j: Int): String =
      s"""SELECT $j AS n_rounds,
         |  (SELECT COUNT(*) FROM eb) AS n_truth_edges,
         |  (SELECT COUNT(*) FROM ed_$j) AS n_refined_edges,
         |  (SELECT COUNT(*) FROM hit_$j) AS n_hit,
         |  round((SELECT COUNT(*) FROM hit_$j)::DOUBLE /
         |    (SELECT COUNT(*) FROM eb), 6) AS edge_recall""".stripMargin
    ((kmeansCellCtes(k = 8, iters = 2, dim = 64) ++ Seq(
      s"""cw AS (SELECT e.vec_id, e.embedding, e.nrm, c.cell
         |  FROM e JOIN cellt c USING (vec_id))""",
      // ranked query-side assignment against the trained codebook (the
      // ivfAssignCells contract) — the base graph probes TWO cells
      s"""rkq AS (SELECT e.vec_id, c.cid AS cell,
         |  row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${dotE("CAST(e.embedding[i] AS DOUBLE)", "c.cv[i]")} /
         |      (e.nrm * sqrt(${dotE("c.cv[i]", "c.cv[i]")})) DESC, c.cid) AS rn
         |  FROM e CROSS JOIN c2 c)""",
      s"""si AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id, ${cosSql("q", "n")} AS cos
         |  FROM rkq qa JOIN e q ON q.vec_id = qa.vec_id AND qa.rn <= 2
         |  JOIN cw n ON n.cell = qa.cell AND n.vec_id != q.vec_id)""",
      s"""r0 AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn
         |  FROM si) WHERE rn <= 3)""",
      s"""sb AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id, ${cosSql("q", "n")} AS cos
         |  FROM e q JOIN e n ON q.vec_id != n.vec_id)""",
      s"""rb AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn
         |  FROM sb) WHERE rn <= 3)""",
      s"""eb AS (SELECT DISTINCT src, dst FROM (SELECT q_id AS src, n_id AS dst
         |  FROM rb UNION ALL SELECT n_id, q_id FROM rb))""") ++
      Seq(0, 1).flatMap(refine) ++ rounds.flatMap(edges))
      .mkString("WITH ", ", ", " ") +
      rounds.map(row).mkString(" UNION ALL ") + " ORDER BY n_rounds")
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val emb = tbl(s, dir, "embeddings")
    val idx = cachedLanding(s"ivfidx:$dir") { d =>
      Similarity.writeIvfIndex(emb, d, k = 8, iters = 2, dim = 64)
    }
    val eb = Graph.knnGraphBrute(emb, k = 3).localCheckpoint()
    val nT = eb.agg(count(lit(1)).as("n_truth_edges"))
    // ONE base build shared across the three stages (the trajectory —
    // per-rounds knnGraphRefined calls would rebuild it each time)
    // exact-regime pin, as in q_eval_knn_graph_recall
    Graph.knnGraphRefinedTrajectory(s, idx, k = 3, nProbe = 2, rounds = 2,
        maxCellVecs = Int.MaxValue)
      .zipWithIndex.map { case (ei0, r) =>
        val ei = ei0.localCheckpoint()
        val hit = ei.join(eb, Seq("src", "dst"))
        ei.agg(count(lit(1)).as("n_refined_edges"))
          .crossJoin(nT)
          .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
          .select(lit(r).as("n_rounds"), col("n_truth_edges"),
            col("n_refined_edges"), col("n_hit"),
            round(col("n_hit").cast("double") / col("n_truth_edges"), 6)
              .as("edge_recall"))
      }.reduce(_ unionByName _).orderBy("n_rounds")
  }

  q("q_knn_graph_auto_dispatch", {
    // the kNN-graph DISPATCHER itself, oracle-backed and SCALE-TRUE (the
    // dedup_auto_dispatch convention): the oracle derives the regime
    // from the stored cell histogram — exact while the hottest cell ≤
    // 4096 (Graph.DefaultMaxCellVecs), else the md5-sub-bucketed replay
    // (salt = md5Hash60(id) mod ceil(|cell|/4096), the split the capped
    // engine plan performs) — so the declared SQL holds at any corpus
    // size and the capped branch is validated on a constructed hot-cell
    // corpus (PLANS.md r13).
    val dotE = duckDotE(64) _
    def cosSql(qa: String, na: String): String =
      s"""round(${dotE(s"CAST($qa.embedding[i] AS DOUBLE)", s"CAST($na.embedding[i] AS DOUBLE)")} /
         |    ($qa.nrm * $na.nrm), 6)""".stripMargin
    def topEdges(tag: String, from: String, joinOn: String): Seq[String] = Seq(
      s"""si_$tag AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |  ${cosSql("q", "n")} AS cos
         |  FROM $from q JOIN $from n ON $joinOn AND q.vec_id != n.vec_id)""",
      s"""r_$tag AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn
         |  FROM si_$tag) WHERE rn <= 3)""",
      s"""ed_$tag AS (SELECT DISTINCT src, dst FROM (SELECT q_id AS src, n_id AS dst
         |  FROM r_$tag UNION ALL SELECT n_id, q_id FROM r_$tag))""")
    ((kmeansCellCtes(k = 8, iters = 2, dim = 64) ++ Seq(
      s"""cw AS (SELECT e.vec_id, e.embedding, e.nrm, c.cell
         |  FROM e JOIN cellt c USING (vec_id))""",
      s"""hs AS (SELECT cell, COUNT(*) AS ck FROM cellt GROUP BY 1)""",
      s"""rg AS (SELECT (SELECT COUNT(*) FROM cellt) AS n_vecs,
         |  (SELECT MAX(ck) FROM hs) AS max_cell,
         |  CASE WHEN (SELECT MAX(ck) FROM hs) <= 4096
         |    THEN 'exact' ELSE 'capped' END AS regime)""",
      s"""sw AS (SELECT cw.vec_id, cw.embedding, cw.nrm, cw.cell,
         |  ('0x' || substr(md5(CAST(cw.vec_id AS VARCHAR)), 1, 15))::BIGINT
         |    % GREATEST(CAST(ceil(hs.ck / 4096.0) AS BIGINT), 1) AS salt
         |  FROM cw JOIN hs USING (cell))""") ++
      topEdges("x", "cw", "q.cell = n.cell") ++
      topEdges("c", "sw", "q.cell = n.cell AND q.salt = n.salt"))
      .mkString("WITH ", ", ", " ") +
      """SELECT regime, n_vecs, CAST(max_cell AS BIGINT) AS max_cell,
        |  CASE WHEN regime = 'exact' THEN (SELECT COUNT(*) FROM ed_x)
        |       ELSE (SELECT COUNT(*) FROM ed_c) END AS n_edges
        |FROM rg""".stripMargin)
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val emb = tbl(s, dir, "embeddings")
    val idx = cachedLanding(s"ivfidx:$dir") { d =>
      Similarity.writeIvfIndex(emb, d, k = 8, iters = 2, dim = 64)
    }
    val d = Graph.knnGraphAuto(s, idx, k = 3)
    d.edges.agg(count(lit(1)).as("n_edges"))
      .select(lit(d.regime).as("regime"), lit(d.nVecs).as("n_vecs"),
        lit(d.maxCellObserved).as("max_cell"), col("n_edges"))
  }

  q("stream_ivf_ingest",
    // STREAMING index maintenance: the embedding batches arrive as a
    // file-source stream and foreachBatch-append into the persisted
    // index (Streams.ivfIngest). Append order never affects assignment
    // (frozen codebook), so the drained index is bit-identical to a
    // batch build over base+batches — the same base-trained oracle as
    // the incremental and compacted paths
    kmeansKnnOracleSql(k = 8, iters = 2, dim = 64, topK = 5, nQueries = 10,
      trainWhere = "WHERE vec_id % 10 < 8")) { (s, dir) =>
    val emb = tbl(s, dir, "embeddings")
    val root = cachedLanding(s"ivfidxstr:$dir") { d =>
      Similarity.writeIvfIndex(emb.filter(col("vec_id") % 10 < 8),
        s"$d/index", k = 8, iters = 2, dim = 64)
      val batches = emb.filter(col("vec_id") % 10 >= 8)
        .select("vec_id", "embedding")
      // two landed files = at least one real micro-batch boundary
      batches.filter(col("vec_id") % 10 === 8).write.mode("append")
        .parquet(s"$d/batches")
      batches.filter(col("vec_id") % 10 === 9).write.mode("append")
        .parquet(s"$d/batches")
      val src = s.readStream.schema(batches.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$d/batches")
      val query = graft.streaming.Streams
        .ivfIngest(src, s"$d/index", s"$d/ckpt").start()
      try query.processAllAvailable() finally query.stop()
    }
    Similarity.ivfKnnFromIndex(s, s"$root/index",
        emb.filter(col("vec_id") < 10), k = 5)
      .orderBy("q_id", "n_id")
  }

  q("knn_cosine_ivf_probe2",
    // the coarse-IVF oracle with the query side assigned to its TWO
    // nearest cells (rn <= 2) — corpus stays single-cell, so each (q, n)
    // pair meets at most once and no dedup precedes the top-k window
    """WITH cent AS (SELECT vec_id AS cid, embedding AS cvec,
      |  sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
      |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS cnrm
      |  FROM embeddings WHERE vec_id < 8),
      |e AS (SELECT vec_id, embedding,
      |  sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
      |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |a AS (SELECT e.vec_id, e.embedding, e.nrm, c.cid,
      |  list_sum(list_transform(range(1, len(e.embedding) + 1),
      |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE))) / (e.nrm * c.cnrm) AS ccos
      |  FROM e CROSS JOIN cent c),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM a),
      |cellc AS (SELECT vec_id, embedding, nrm, cid AS cell FROM ranked WHERE rn = 1),
      |cellq AS (SELECT vec_id, embedding, nrm, cid AS cell FROM ranked
      |  WHERE rn <= 2 AND vec_id < 10),
      |s AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
      |  round(list_sum(list_transform(range(1, len(q.embedding) + 1),
      |    i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE))) / (q.nrm * n.nrm), 6) AS cos
      |  FROM cellq q JOIN cellc n USING (cell) WHERE q.vec_id != n.vec_id),
      |r AS (SELECT q_id, n_id, cos,
      |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM s)
      |SELECT q_id, n_id, cos FROM r WHERE rn <= 5 ORDER BY q_id, n_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // multi-probe IVF: nProbe = 2 nearest cells per query — the recall
    // knob between single-probe IVF and brute force, at 2× the probe
    // cost on the (small) query side only
    val emb = tbl(s, dir, "embeddings")
    val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    Similarity.ivfMultiProbeKnn(emb, emb.filter(col("vec_id") < 10), k = 5,
        centroids, nProbe = 2)
      .orderBy("q_id", "n_id")
  }

  /** DuckDB replay of `Similarity.kmeansCodebook` + cell-restricted
    * search: each Lloyd iteration is one assignment CTE (the cosine
    * argmax every knn oracle already replays bit-for-bit) plus one
    * fixed-point mean CTE (exact integer arithmetic — order-independent
    * sums, one truncating division on offset-nonnegative values, one
    * EXACT float re-entry since |mean| < 2^20 fits a float mantissa).
    * Centroids flow through the chain as CTE rows, not literals, so the
    * oracle trains the same codebook the Spark side trains.
    */
  private def duckDotE(dim: Int)(a: String, b: String): String =
    s"list_sum(list_transform(range(1, ${dim + 1}), i -> $a * $b))"

  /** The training chain alone, ending in `cellt(vec_id, cell)` — the
    * final post-training assignment — plus `e(vec_id, embedding, nrm)`.
    * Shared by the trained-IVF search oracle and the semantic-dedup
    * oracles. `trainWhere` restricts the TRAINING population (seeds,
    * assignments, centroid means) to a subset, while `e`/`cellt` always
    * cover every row — the incremental case: train on the kept base,
    * assign base and incoming alike.
    */
  private def kmeansCellCtes(k: Int, iters: Int, dim: Int,
                             trainWhere: String = ""): Seq[String] = {
    val r = s"range(1, ${dim + 1})"
    val dotE = duckDotE(dim) _
    val header = Seq(
      s"""e AS (SELECT vec_id, embedding,
         |  sqrt(${dotE("CAST(embedding[i] AS DOUBLE)", "CAST(embedding[i] AS DOUBLE)")}) AS nrm
         |  FROM embeddings)""",
      s"""et AS (SELECT * FROM e $trainWhere)""",
      // fixed-point coords, pre-offset by 2^20 so every sum is nonnegative
      s"""sv AS (SELECT vec_id, list_transform(embedding,
         |  x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT) + 1048576) AS s
         |  FROM embeddings $trainWhere)""",
      s"""c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
         |  FROM (SELECT vec_id, embedding FROM et ORDER BY vec_id LIMIT $k))""")
    def assign(aName: String, cName: String, eName: String) =
      s"""$aName AS (SELECT vec_id, cell FROM (
         |  SELECT e.vec_id, c.cid AS cell, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${dotE("CAST(e.embedding[i] AS DOUBLE)", "c.cv[i]")} /
         |      (e.nrm * sqrt(${dotE("c.cv[i]", "c.cv[i]")})) DESC, c.cid) AS rn
         |  FROM $eName e CROSS JOIN $cName c) WHERE rn = 1)"""
    def update(mName: String, aName: String, prevC: String, cName: String) = Seq(
      s"""$mName AS (SELECT a.cell AS cid, t.i,
         |  (SUM(sv.s[t.i]) // COUNT(*)) - 1048576 AS cm
         |  FROM $aName a JOIN sv USING (vec_id) CROSS JOIN $r AS t(i)
         |  GROUP BY a.cell, t.i)""",
      // float re-entry is exact (|cm| < 2^20); empty cells keep the old row
      s"""$cName AS (SELECT p.cid, CASE WHEN m.cv IS NULL THEN p.cv ELSE m.cv END AS cv
         |  FROM $prevC p LEFT JOIN (SELECT cid, list_transform(
         |    list(CAST(CAST(cm AS DOUBLE) / 1048576.0 AS FLOAT) ORDER BY i),
         |    x -> CAST(x AS DOUBLE)) AS cv FROM $mName GROUP BY cid) m USING (cid))""")
    val rounds = (0 until iters).flatMap { it =>
      assign(s"a$it", s"c$it", "et") +: update(s"m${it + 1}", s"a$it", s"c$it", s"c${it + 1}")
    }
    (header ++ rounds) :+ assign("cellt", s"c$iters", "e")
  }

  private def kmeansKnnOracleSql(k: Int, iters: Int, dim: Int,
                                 topK: Int, nQueries: Int,
                                 trainWhere: String = ""): String = {
    val dotE = duckDotE(dim) _
    val tail = Seq(
      s"""q AS (SELECT e.vec_id AS q_id, e.embedding AS q_vec, e.nrm AS q_norm, cellt.cell
         |  FROM e JOIN cellt USING (vec_id) WHERE vec_id < $nQueries)""",
      s"""cc AS (SELECT e.vec_id AS n_id, e.embedding AS n_vec, e.nrm AS n_norm, cellt.cell
         |  FROM e JOIN cellt USING (vec_id))""",
      s"""s2 AS (SELECT q_id, n_id,
         |  round(${dotE("CAST(q_vec[i] AS DOUBLE)", "CAST(n_vec[i] AS DOUBLE)")} /
         |    (q_norm * n_norm), 6) AS cos
         |  FROM q JOIN cc USING (cell) WHERE q_id != n_id)""",
      s"""r2 AS (SELECT q_id, n_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM s2)""")
    ((kmeansCellCtes(k, iters, dim, trainWhere) ++ tail)
      .mkString("WITH ", ", ", "") +
      s" SELECT q_id, n_id, cos FROM r2 WHERE rn <= $topK ORDER BY q_id, n_id")
      .stripMargin.replace("\n", " ")
  }

  q("knn_cosine_ivf_kmeans",
    kmeansKnnOracleSql(k = 8, iters = 2, dim = 64, topK = 5, nQueries = 10)) { (s, dir) =>
    // the TRAINED IVF path: 2 Lloyd iterations produce the codebook (all
    // arithmetic engine-reproducible — see kmeansCodebook), assignment is
    // a narrow literal-codebook projection, search shuffles on cell only
    val emb = tbl(s, dir, "embeddings")
    val codebook = Similarity.kmeansCodebook(emb, k = 8, iters = 2, dim = 64)
    val withCell = emb.withColumn("cell",
      Similarity.ivfAssignCell(col("embedding"), codebook))
    Similarity.ivfKnn(withCell, withCell.filter(col("vec_id") < 10), k = 5,
        cellCol = "cell")
      .orderBy("q_id", "n_id")
  }

  q("dedup_semantic", {
    // SemDeDup replay: the shared k-means chain assigns every vector to
    // its trained cell; a vector drops when an earlier same-cell vector
    // is within cosine tau. NOT IN is safe — vec_id is never NULL.
    val dotE = duckDotE(64) _
    ((kmeansCellCtes(k = 8, iters = 2, dim = 64) ++ Seq(
      s"""cw AS (SELECT e.vec_id, e.embedding, e.nrm, c.cell
         |  FROM e JOIN cellt c USING (vec_id))""",
      s"""drops AS (SELECT DISTINCT b.vec_id
         |  FROM cw a JOIN cw b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE round(${dotE("CAST(a.embedding[i] AS DOUBLE)", "CAST(b.embedding[i] AS DOUBLE)")} /
         |    (a.nrm * b.nrm), 6) >= 0.2)"""))
      .mkString("WITH ", ", ", "") +
      " SELECT vec_id, cell FROM cw WHERE vec_id NOT IN" +
      " (SELECT vec_id FROM drops) ORDER BY vec_id")
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    // semantic dedup on LEARNED clusters: train the codebook, assign,
    // early-drop within each cell — the embedding-space keep-first rule
    val emb = tbl(s, dir, "embeddings")
    val codebook = Similarity.kmeansCodebook(emb, k = 8, iters = 2, dim = 64)
    Similarity.semanticDedup(emb, codebook, tau = 0.2).orderBy("vec_id")
  }

  q("dedup_incremental_semantic", {
    // incremental SemDeDup replay: train on the kept base (vec_id%10<8)
    // only — et/sv/c0 carry the trainWhere — then cellt assigns every
    // vector; an incoming vector drops when any same-cell BASE vector is
    // within tau. Aliases x/bb avoid capturing the list lambda's i.
    val dotE = duckDotE(64) _
    ((kmeansCellCtes(k = 8, iters = 2, dim = 64,
      trainWhere = "WHERE vec_id % 10 < 8") ++ Seq(
      s"""cw AS (SELECT e.vec_id, e.embedding, e.nrm, c.cell
         |  FROM e JOIN cellt c USING (vec_id))""",
      s"""drops AS (SELECT DISTINCT x.vec_id
         |  FROM cw x JOIN cw bb ON x.cell = bb.cell
         |  WHERE x.vec_id % 10 >= 8 AND bb.vec_id % 10 < 8
         |    AND round(${dotE("CAST(x.embedding[i] AS DOUBLE)", "CAST(bb.embedding[i] AS DOUBLE)")} /
         |    (x.nrm * bb.nrm), 6) >= 0.3)"""))
      .mkString("WITH ", ", ", "") +
      " SELECT vec_id, cell FROM cw WHERE vec_id % 10 >= 8 AND vec_id NOT IN" +
      " (SELECT vec_id FROM drops) ORDER BY vec_id")
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    // the embedding-space incremental filter: codebook trained on the
    // kept corpus, incoming batch assigned and dropped against it only
    val emb = tbl(s, dir, "embeddings")
    val base = emb.filter(col("vec_id") % 10 < 8)
    val inc = emb.filter(col("vec_id") % 10 >= 8)
    val codebook = Similarity.kmeansCodebook(base, k = 8, iters = 2, dim = 64)
    Similarity.semanticFilter(base, inc, codebook, tau = 0.3).orderBy("vec_id")
  }

  q("knn_pq_adc", {
    // DuckDB mirror of Similarity.pqKnn: the seeded codebooks embed as
    // exact double literals; list_sum(list_transform(...)) reproduces the
    // Spark side's left-associated distance chains bit-for-bit (the same
    // contract every other knn oracle relies on).
    val books = Similarity.pqCodebooks(dim = 64, m = 4, k = 4)
    def centroidLit(c: Array[Float]): String =
      c.map(f => java.lang.Double.toString(f.toDouble)).mkString("[", ",", "]")
    def distSql(j: Int, c: Array[Float]): String = {
      val off = j * c.length
      val lit = centroidLit(c)
      s"list_sum(list_transform(range(1, ${c.length + 1}), " +
        s"i -> (CAST(embedding[$off + i] AS DOUBLE) - ($lit)[i]) * " +
        s"(CAST(embedding[$off + i] AS DOUBLE) - ($lit)[i])))"
    }
    def distList(j: Int): String =
      books(j).map(c => distSql(j, c)).mkString("[", ", ", "]")
    val codeCols = books.indices
      .map(j => s"list_position(d$j, list_min(d$j)) AS c$j").mkString(", ")
    val dlists = books.indices.map(j => s"${distList(j)} AS d$j").mkString(", ")
    val adc = books.indices.map(j => s"q.d$j[c.c$j]").mkString(" + ")
    s"""WITH d AS (SELECT vec_id, $dlists FROM embeddings),
       |c AS (SELECT vec_id AS n_id, $codeCols FROM d),
       |q AS (SELECT vec_id AS q_id, d0, d1, d2, d3 FROM d WHERE vec_id < 10),
       |s AS (SELECT q_id, n_id, round($adc, 6) AS adc
       |  FROM q JOIN c ON q_id != n_id),
       |r AS (SELECT q_id, n_id, adc,
       |  row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS rn FROM s)
       |SELECT q_id, n_id, adc FROM r WHERE rn <= 5 ORDER BY q_id, n_id"""
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    // product-quantization ADC search: corpus as m centroid codes, each
    // query pair scored by m table lookups — the compressed-domain ANN
    // path (compose with IVF cells for the full IVF-PQ index)
    val emb = tbl(s, dir, "embeddings")
    Similarity.pqKnn(emb, emb.filter(col("vec_id") < 10), k = 5,
        Similarity.pqCodebooks(dim = 64, m = 4, k = 4))
      .orderBy("q_id", "n_id")
  }

  q("knn_two_stage", {
    // the knn_pq_adc shortlist CTEs (rn <= 20) re-ranked by the exact
    // cosine every knn oracle replays — stage 1's approximate order only
    // selects WHICH pairs reach stage 2, so the final hash needs bit
    // agreement on the shortlist membership (same rounded-adc ranking as
    // knn_pq_adc) and on the exact re-rank chain (same as knn_cosine_*)
    val books = Similarity.pqCodebooks(dim = 64, m = 4, k = 4)
    def centroidLit(c: Array[Float]): String =
      c.map(f => java.lang.Double.toString(f.toDouble)).mkString("[", ",", "]")
    def distSql(j: Int, c: Array[Float]): String = {
      val off = j * c.length
      val lit = centroidLit(c)
      s"list_sum(list_transform(range(1, ${c.length + 1}), " +
        s"i -> (CAST(embedding[$off + i] AS DOUBLE) - ($lit)[i]) * " +
        s"(CAST(embedding[$off + i] AS DOUBLE) - ($lit)[i])))"
    }
    def distList(j: Int): String =
      books(j).map(c => distSql(j, c)).mkString("[", ", ", "]")
    val codeCols = books.indices
      .map(j => s"list_position(d$j, list_min(d$j)) AS c$j").mkString(", ")
    val dlists = books.indices.map(j => s"${distList(j)} AS d$j").mkString(", ")
    val adc = books.indices.map(j => s"q.d$j[c.c$j]").mkString(" + ")
    s"""WITH d AS (SELECT vec_id, $dlists FROM embeddings),
       |c AS (SELECT vec_id AS n_id, $codeCols FROM d),
       |q AS (SELECT vec_id AS q_id, d0, d1, d2, d3 FROM d WHERE vec_id < 10),
       |s AS (SELECT q_id, n_id, round($adc, 6) AS adc
       |  FROM q JOIN c ON q_id != n_id),
       |sl AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
       |  row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS rn FROM s)
       |  WHERE rn <= 20),
       |e AS (SELECT vec_id, embedding,
       |  sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
       |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |x AS (SELECT sl.q_id, sl.n_id,
       |  round(list_sum(list_transform(range(1, len(qe.embedding) + 1),
       |    i -> CAST(qe.embedding[i] AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE))) /
       |    (qe.nrm * ne.nrm), 6) AS cos
       |  FROM sl JOIN e qe ON qe.vec_id = sl.q_id JOIN e ne ON ne.vec_id = sl.n_id),
       |r AS (SELECT q_id, n_id, cos,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM x)
       |SELECT q_id, n_id, cos FROM r WHERE rn <= 5 ORDER BY q_id, n_id"""
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    // two-stage retrieval: PQ-ADC shortlist (20 per query, compressed
    // domain) re-ranked by exact cosine to the final 5 — the bounded-
    // full-precision-touch architecture production ANN converges on
    val emb = tbl(s, dir, "embeddings")
    Similarity.twoStageKnn(emb, emb.filter(col("vec_id") < 10), kFinal = 5,
        kShortlist = 20, Similarity.pqCodebooks(dim = 64, m = 4, k = 4))
      .orderBy("q_id", "n_id")
  }

  q("knn_ivf_pq", {
    // the knn_pq_adc oracle with the IVF cell (label) carried through and
    // added to the join condition — same literal codebooks, same
    // bit-exact distance chains
    val books = Similarity.pqCodebooks(dim = 64, m = 4, k = 4)
    def centroidLit(c: Array[Float]): String =
      c.map(f => java.lang.Double.toString(f.toDouble)).mkString("[", ",", "]")
    def distSql(j: Int, c: Array[Float]): String = {
      val off = j * c.length
      val lit = centroidLit(c)
      s"list_sum(list_transform(range(1, ${c.length + 1}), " +
        s"i -> (CAST(embedding[$off + i] AS DOUBLE) - ($lit)[i]) * " +
        s"(CAST(embedding[$off + i] AS DOUBLE) - ($lit)[i])))"
    }
    def distList(j: Int): String =
      books(j).map(c => distSql(j, c)).mkString("[", ", ", "]")
    val codeCols = books.indices
      .map(j => s"list_position(d$j, list_min(d$j)) AS c$j").mkString(", ")
    val dlists = books.indices.map(j => s"${distList(j)} AS d$j").mkString(", ")
    val adc = books.indices.map(j => s"q.d$j[c.c$j]").mkString(" + ")
    s"""WITH d AS (SELECT vec_id, label, $dlists FROM embeddings),
       |c AS (SELECT vec_id AS n_id, label, $codeCols FROM d),
       |q AS (SELECT vec_id AS q_id, label, d0, d1, d2, d3 FROM d WHERE vec_id < 10),
       |s AS (SELECT q_id, n_id, round($adc, 6) AS adc
       |  FROM q JOIN c ON q.label = c.label AND q_id != n_id),
       |r AS (SELECT q_id, n_id, adc,
       |  row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS rn FROM s)
       |SELECT q_id, n_id, adc FROM r WHERE rn <= 5 ORDER BY q_id, n_id"""
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    // full IVF-PQ index: coarse cell restricts candidates, PQ ADC scores
    // them in the compressed domain — the two reductions compose
    val emb = tbl(s, dir, "embeddings")
    Similarity.ivfPqKnn(emb, emb.filter(col("vec_id") < 10), k = 5,
        Similarity.pqCodebooks(dim = 64, m = 4, k = 4), cellCol = "label")
      .orderBy("q_id", "n_id")
  }

  q("q_pca_power",
    // dominant principal direction by fixed-point power iteration: the
    // corpus pass builds the dim^2 second-moment grid (order-free integer
    // sums of floor(xi*xj*1e12)); 6 integer M*v rounds then run on the
    // synopsis alone — all reproduced bit-for-bit by the recursive CTE
    """WITH RECURSIVE
      |sub AS (SELECT embedding AS e FROM embeddings WHERE vec_id % 10 < 3),
      |cells AS (SELECT i.i, j.j,
      |    SUM(CAST(floor(CAST(e[i.i] AS DOUBLE) * CAST(e[j.j] AS DOUBLE) * 1000000000000) AS BIGINT)) AS m0
      |  FROM sub CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
      |    CROSS JOIN (SELECT unnest(range(1, 65)) AS j) j
      |  GROUP BY 1, 2),
      |m AS (SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, m0 // 1000000 AS m FROM cells),
      |pi(iter, i, v) AS (
      |  SELECT 0, CAST(i.i AS INT), CAST(1000000 AS BIGINT)
      |  FROM (SELECT unnest(range(1, 65)) AS i) i
      |  UNION ALL
      |  SELECT iter + 1, i, w // (CASE WHEN mx // 1000000 = 0 THEN 1 ELSE mx // 1000000 END)
      |  FROM (SELECT pi.iter AS iter, m.i AS i, SUM(m.m * pi.v) AS w,
      |      MAX(abs(SUM(m.m * pi.v))) OVER () AS mx
      |    FROM pi JOIN m ON m.j = pi.i WHERE pi.iter < 6
      |    GROUP BY pi.iter, m.i))
      |SELECT i, v FROM pi WHERE iter = 6 ORDER BY abs(v) DESC, i LIMIT 8"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.topComponentFixedPoint(
        tbl(s, dir, "embeddings").filter(pmod(col("vec_id"), lit(10)) < 3)
          .select(col("embedding")),
        "embedding", dim = 64, iters = 6)
      .orderBy(abs(col("v")).desc, col("i")).limit(8)
  }

  q("q_eval_ann_recall",
    // index-quality self-evaluation: recall@5 of the IVF (cell-restricted)
    // index against exact brute force — the hit count is an integer set
    // intersection per query, so the metric is engine-exact
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
       |  FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id AS n_id, embedding AS n_vec, label AS n_label FROM embeddings),
       |s AS (SELECT q_id, q_label, n_id, n_label,
       |  list_sum(list_transform(range(1, len(q_vec) + 1),
       |    i -> CAST(q_vec[i] AS DOUBLE) * CAST(n_vec[i] AS DOUBLE))) /
       |  (sqrt(list_sum(list_transform(range(1, len(q_vec) + 1),
       |    i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE)))) *
       |   sqrt(list_sum(list_transform(range(1, len(n_vec) + 1),
       |    i -> CAST(n_vec[i] AS DOUBLE) * CAST(n_vec[i] AS DOUBLE))))) AS cosim
       |  FROM q JOIN c ON q_id != n_id),
       |exact AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
       |  row_number() OVER (PARTITION BY q_id ORDER BY round(cosim, 6) DESC, n_id) AS rn
       |  FROM s) WHERE rn <= 5),
       |ann AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
       |  row_number() OVER (PARTITION BY q_id ORDER BY round(cosim, 6) DESC, n_id) AS rn
       |  FROM s WHERE q_label = n_label) WHERE rn <= 5),
       |inter AS (SELECT e.q_id, COUNT(*) AS hits FROM exact e
       |  JOIN ann a ON a.q_id = e.q_id AND a.n_id = e.n_id GROUP BY 1)
       |SELECT qq.q_id, COALESCE(i.hits, 0) AS hits,
       |  round(CAST(COALESCE(i.hits, 0) AS DOUBLE) / 5, 6) AS recall_at_5
       |FROM (SELECT DISTINCT q_id FROM exact) qq LEFT JOIN inter i ON i.q_id = qq.q_id
       |ORDER BY qq.q_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val emb = tbl(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceKnn(emb, queries, k = 5)
      .select(col("q_id"), col("n_id"))
    val ann = Similarity.ivfKnn(emb, queries, k = 5, cellCol = "label")
      .select(col("q_id").as("a_qid"), col("n_id").as("a_nid"))
    val hits = exact.join(ann,
        col("q_id") === col("a_qid") && col("n_id") === col("a_nid"))
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    exact.select("q_id").distinct()
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / 5, 6).as("recall_at_5"))
      .orderBy("q_id")
  }

  q("q_embedding_centroids",
    """SELECT label, CAST(pos AS INT) AS pos, round(avg(x), 6) AS c,
      |  COUNT(*) AS n_vecs
      |FROM (SELECT label, generate_subscripts(embedding, 1) AS pos,
      |  CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)
      |GROUP BY 1, 2 ORDER BY 1, 2"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // per-label centroids in long format: map-side partial averages mean
    // the shuffle carries label x dim summaries, never the vectors
    Similarity.labelCentroids(tbl(s, dir, "embeddings"), "label")
      .orderBy("label", "pos")
  }

  q("knn_cosine_sq8",
    """WITH e AS (SELECT vec_id, embedding,
      |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS raw FROM embeddings),
      |sc AS (SELECT vec_id, embedding,
      |  CASE WHEN raw = 0.0 THEN 1.0 ELSE raw END AS scale FROM e),
      |co AS (SELECT vec_id, list_transform(embedding,
      |  x -> CAST(round(CAST(x AS DOUBLE) / scale * 127.0) AS BIGINT)) AS code FROM sc),
      |n AS (SELECT vec_id, code,
      |  sqrt(CAST(list_sum(list_transform(code, x -> x * x)) AS DOUBLE)) AS nrm FROM co),
      |q AS (SELECT vec_id AS q_id, code AS q_code, nrm AS q_norm FROM n WHERE vec_id < 10),
      |s AS (SELECT q_id, vec_id AS n_id,
      |  round(CAST(list_sum(list_transform(range(1, len(q_code) + 1),
      |    i -> q_code[i] * code[i])) AS DOUBLE) / (q_norm * nrm), 6) AS cos
      |  FROM q JOIN n ON q_id != vec_id),
      |r AS (SELECT q_id, n_id, cos,
      |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM s)
      |SELECT q_id, n_id, cos FROM r WHERE rn <= 5 ORDER BY q_id, n_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // int8 scalar-quantized kNN: the 4x-compressed rung below PQ — the
    // inner loop is exact integer arithmetic over the codes, one IEEE
    // division per pair, so ranks reproduce on any engine
    val emb = tbl(s, dir, "embeddings")
    Similarity.sq8Knn(emb, emb.filter(col("vec_id") < 10), k = 5)
      .orderBy("q_id", "n_id")
  }

  q("text_stats",
    s"""WITH w AS (SELECT doc_id, lang, source, n_chars, $toksSql AS w FROM documents)
       |SELECT doc_id, lang, source, n_chars,
       |  CAST(len(w) AS INT) AS n_tokens,
       |  CAST(len(list_distinct(w)) AS INT) AS n_distinct,
       |  round(len(list_distinct(w))::DOUBLE / len(w), 6) AS ttr,
       |  round(CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / len(w), 6) AS mean_token_len,
       |  CAST(list_sum(list_transform(w, t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS est_subword_tokens
       |FROM w ORDER BY doc_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val st = TextAnalysis.stats(tbl(s, dir, "documents"), "text")
    st.select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("n_tokens"), col("n_distinct"), round(col("ttr"), 6).as("ttr"),
        round(col("mean_token_len"), 6).as("mean_token_len"), col("est_subword_tokens"))
      .orderBy("doc_id")
  }

  q("text_quality",
    s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents)
       |SELECT doc_id,
       |  round((len(list_distinct(w))::DOUBLE / len(w)) * 0.4
       |    + least(1.0, len(w) / 100.0) * 0.3
       |    + (1 - len(list_filter(w, t -> t IN ('the', 'a')))::DOUBLE / len(w)) * 0.3,
       |  6) AS quality
       |FROM w ORDER BY doc_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")
  }

  q("text_langid",
    """SELECT lang, CASE
      |  WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
      |  WHEN regexp_matches(text, '[\x{3040}-\x{30ff}]') THEN 'ja'
      |  WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
      |  WHEN regexp_matches(text, '[¡¿ñ]') THEN 'es'
      |  WHEN regexp_matches(text, '[äöüß]') THEN 'de'
      |  WHEN regexp_matches(text, '[çàâêîôûœ]') THEN 'fr'
      |  ELSE 'en' END AS predicted, COUNT(*) AS n
      |FROM documents GROUP BY 1, 2 ORDER BY 1, 2"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "documents")
      .groupBy(col("lang"), TextAnalysis.langId(col("text")).as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  q("text_explode_tokens",
    s"""WITH toks AS (SELECT doc_id, $toksSql AS w FROM documents WHERE doc_id < 50)
       |SELECT doc_id, CAST(generate_subscripts(w, 1) AS INT) AS pos, unnest(w) AS tok
       |FROM toks ORDER BY doc_id, pos"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).cast("int").as("pos"), col("tok"))
      .orderBy("doc_id", "pos")
  }

  private val langIdSql =
    """CASE
      |  WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
      |  WHEN regexp_matches(text, '[\x{3040}-\x{30ff}]') THEN 'ja'
      |  WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
      |  WHEN regexp_matches(text, '[¡¿ñ]') THEN 'es'
      |  WHEN regexp_matches(text, '[äöüß]') THEN 'de'
      |  WHEN regexp_matches(text, '[çàâêîôûœ]') THEN 'fr'
      |  ELSE 'en' END""".stripMargin.replace("\n", " ")

  q("q_eval_confusion",
    // classifier scoring (langid vs ground truth): per-class tp/fp/fn
    // via marginal identities — only confusion counts ever shuffle
    s"""WITH cm AS (SELECT lang AS actual, $langIdSql AS pred, COUNT(*) AS n
       |  FROM documents GROUP BY 1, 2),
       |na AS (SELECT actual AS c, SUM(n) AS na FROM cm GROUP BY 1),
       |np AS (SELECT pred AS c, SUM(n) AS np FROM cm GROUP BY 1),
       |tp AS (SELECT actual AS c, SUM(n) AS tp FROM cm WHERE actual = pred GROUP BY 1)
       |SELECT na.c, CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp,
       |  CAST(COALESCE(np.np, 0) - COALESCE(tp.tp, 0) AS BIGINT) AS fp,
       |  CAST(na.na - COALESCE(tp.tp, 0) AS BIGINT) AS fn,
       |  CASE WHEN COALESCE(np.np, 0) > 0
       |    THEN round(CAST(COALESCE(tp.tp, 0) AS DOUBLE) / np.np, 6) END AS prec,
       |  round(CAST(COALESCE(tp.tp, 0) AS DOUBLE) / na.na, 6) AS rec,
       |  CASE WHEN na.na + COALESCE(np.np, 0) > 0
       |    THEN round(2.0 * COALESCE(tp.tp, 0) / (na.na + COALESCE(np.np, 0)), 6) END AS f1
       |FROM na LEFT JOIN tp ON tp.c = na.c LEFT JOIN np ON np.c = na.c
       |ORDER BY na.c""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val d = tbl(s, dir, "documents")
      .select(col("lang"), TextAnalysis.langId(col("text")).as("pred"))
    Eval.confusionMetrics(d, "lang", "pred").orderBy("c")
  }

  q("q_eval_kappa",
    s"""WITH cm AS (SELECT lang AS actual, $langIdSql AS pred, COUNT(*) AS n
       |  FROM documents GROUP BY 1, 2),
       |na AS (SELECT actual AS c, SUM(n) AS na FROM cm GROUP BY 1),
       |np AS (SELECT pred AS c, SUM(n) AS np FROM cm GROUP BY 1),
       |marg AS (SELECT CAST(SUM(CAST(na.na AS DECIMAL(19,0)) * CAST(np.np AS DECIMAL(19,0))) AS DOUBLE) AS sum_prod
       |  FROM na JOIN np ON na.c = np.c),
       |tot AS (SELECT CAST(SUM(CASE WHEN actual = pred THEN n ELSE 0 END) AS DOUBLE) AS hit,
       |  CAST(SUM(n) AS DOUBLE) AS nn FROM cm)
       |SELECT round(hit / nn, 6) AS accuracy,
       |  round((hit / nn - sum_prod / (nn * nn)) / (1.0 - sum_prod / (nn * nn)), 6) AS kappa
       |FROM tot CROSS JOIN marg""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val d = tbl(s, dir, "documents")
      .select(col("lang"), TextAnalysis.langId(col("text")).as("pred"))
    Eval.kappa(d, "lang", "pred")
      .select(col("accuracy"), col("kappa"))
  }

  q("text_fingerprint",
    s"""SELECT md5(array_to_string(list_sort(list_distinct($toksSql)), ' ')) AS fp,
       |  MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
       |FROM documents GROUP BY 1 ORDER BY keep_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "documents")
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
      .orderBy("keep_id")
  }

  q("text_minhash_fingerprint",
    s"""SELECT doc_id, list_min(list_transform($shinglesSql, s -> md5(s))) AS fp
       |FROM documents WHERE length(trim(text)) > 0 ORDER BY doc_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // winnowing-style rolling fingerprint: min shingle hash, robust to
    // local edits (doc-level narrow projection, no shuffle)
    tbl(s, dir, "documents").filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        TextAnalysis.minShingleFingerprint(col("text"), 3).as("fp"))
      .orderBy("doc_id")
  }

  q("text_subword_tokens",
    s"""WITH w AS (SELECT doc_id, $toksSql AS w,
       |  list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t != '') AS sw
       |  FROM documents)
       |SELECT doc_id, CAST(len(w) AS INT) AS n_ws_tokens,
       |  CAST(len(sw) AS INT) AS n_subwords,
       |  CAST(len(list_distinct(sw)) AS INT) AS n_distinct_subwords
       |FROM w ORDER BY doc_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // BPE-ish token accounting: whitespace tokens vs alphanumeric-run
    // subword units (the ~vocabulary-independent size estimate)
    val sw = filter(split(lower(col("text")), "[^a-z0-9]+", -1), t => t =!= "")
    tbl(s, dir, "documents").select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("n_ws_tokens"),
        size(sw).as("n_subwords"),
        size(array_distinct(sw)).as("n_distinct_subwords"))
      .orderBy("doc_id")
  }

  q("text_ngram_topk",
    s"""WITH t AS (SELECT doc_id, $toksSql AS w FROM documents),
       |g AS (SELECT unnest(list_transform(range(1, len(w), 1),
       |  i -> w[i] || ' ' || w[i+1])) AS gram FROM t WHERE len(w) >= 2)
       |SELECT gram, COUNT(*) AS n FROM g GROUP BY gram
       |ORDER BY n DESC, gram LIMIT 20"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // corpus-level bigram frequencies (duplicates kept, unlike the
    // distinct shingle set): explode -> hash agg with map-side partials
    // -> top-k; the only full-data exchange carries (gram, partial count).
    // One-pass WordNGrams kernel — the composed sequence/element_at form
    // re-inlines the token split per gram after projection collapse
    // (O(tokens²) per doc, measured 39 s at sf0.1 vs ~1 s fused).
    tbl(s, dir, "documents")
      .select(explode(graft.functions.WordNGrams(col("text"), 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(20)
  }

  q("text_tfidf_topk",
    // ln-free TF-IDF weight (tf * N / df): exact integer product + one
    // IEEE division, so the ranking is reproducible in any engine; df is
    // vocabulary-sized -> broadcast side of the tf join
    s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |dfq AS (SELECT tok, COUNT(DISTINCT doc_id) AS dfreq FROM toks GROUP BY 1),
       |nd AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
       |scored AS (SELECT tf.doc_id, tf.tok, tf.tf, dfq.dfreq,
       |  CAST(tf.tf * nd.nd AS DOUBLE) / dfq.dfreq AS tfidf
       |  FROM tf JOIN dfq ON tf.tok = dfq.tok CROSS JOIN nd)
       |SELECT doc_id, CAST(rk AS INT) AS rk, tok, tf, dfreq, round(tfidf, 6) AS tfidf
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |  ORDER BY tfidf DESC, tok) AS rk FROM scored)
       |WHERE rk <= 3 AND doc_id < 80 ORDER BY doc_id, rk"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.tfidfTopK(tbl(s, dir, "documents"), k = 3)
      .filter(col("doc_id") < 80)
      .orderBy("doc_id", "rk")
  }

  q("text_bm25_topk",
    // BM25 retrieval with exact integer fixed-point scoring (rational
    // idf surrogate, ln-free — see TextAnalysis.bm25TopK): with k1=6/5,
    // b=3/4 the whole per-term score is two truncating integer
    // divisions, so DuckDB replays it bit-for-bit
    s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |stats AS (SELECT COUNT(DISTINCT doc_id) AS n, COUNT(*) AS t FROM toks),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
       |qt AS (SELECT * FROM (VALUES
       |  ('q_analytics', 'query'), ('q_analytics', 'filter'), ('q_analytics', 'join'),
       |  ('q_streaming', 'stream'), ('q_streaming', 'window'), ('q_streaming', 'scan'),
       |  ('q_physical', 'hash'), ('q_physical', 'merge'), ('q_physical', 'sort'),
       |  ('q_physical', 'table')) AS v(query_id, tok)),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       |  WHERE tok IN (SELECT tok FROM qt) GROUP BY 1, 2),
       |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
       |scored AS (SELECT qt.query_id, tf.doc_id,
       |  CAST(SUM(((2 * (s.n - dfq.df) + 1) * 1000000 // (2 * dfq.df + 1))
       |    * ((22 * s.t * tf.tf * 1000000) // (10 * s.t * tf.tf + 3 * s.t + 9 * dl.dl * s.n)))
       |    AS BIGINT) AS score_fp
       |  FROM qt JOIN tf USING (tok) JOIN dfq USING (tok)
       |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s GROUP BY 1, 2)
       |SELECT query_id, CAST(rnk AS INT) AS rnk, doc_id, score_fp
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |  ORDER BY score_fp DESC, doc_id) AS rnk FROM scored)
       |WHERE rnk <= 10 ORDER BY query_id, rnk"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.bm25TopK(tbl(s, dir, "documents"), Seq(
        "q_analytics" -> "query filter join",
        "q_streaming" -> "stream window scan",
        "q_physical" -> "hash merge sort table"), k = 10)
      .orderBy("query_id", "rnk")
  }

  q("q_hybrid_rrf",
    // Hybrid retrieval: BM25 and TF-IDF runs over the same query set,
    // fused by reciprocal-rank fusion with exact fixed-point arithmetic
    // (10^9 div (60+rank)) — both runs and the fusion replay bit-for-bit
    s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |stats AS (SELECT COUNT(DISTINCT doc_id) AS n, COUNT(*) AS t FROM toks),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
       |qt AS (SELECT * FROM (VALUES
       |  ('q_analytics', 'query'), ('q_analytics', 'filter'), ('q_analytics', 'join'),
       |  ('q_streaming', 'stream'), ('q_streaming', 'window'), ('q_streaming', 'scan'),
       |  ('q_physical', 'hash'), ('q_physical', 'merge'), ('q_physical', 'sort'),
       |  ('q_physical', 'table')) AS v(query_id, tok)),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       |  WHERE tok IN (SELECT tok FROM qt) GROUP BY 1, 2),
       |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
       |bscored AS (SELECT qt.query_id, tf.doc_id,
       |  CAST(SUM(((2 * (s.n - dfq.df) + 1) * 1000000 // (2 * dfq.df + 1))
       |    * ((22 * s.t * tf.tf * 1000000) // (10 * s.t * tf.tf + 3 * s.t + 9 * dl.dl * s.n)))
       |    AS BIGINT) AS score_fp
       |  FROM qt JOIN tf USING (tok) JOIN dfq USING (tok)
       |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s GROUP BY 1, 2),
       |brun AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id
       |  ORDER BY score_fp DESC, doc_id) AS rnk FROM bscored),
       |nd AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
       |tscored AS (SELECT qt.query_id, tf.doc_id,
       |  CAST(SUM(tf.tf * nd.nd * 1000000 // dfq.df) AS BIGINT) AS score_fp
       |  FROM qt JOIN tf USING (tok) JOIN dfq USING (tok) CROSS JOIN nd GROUP BY 1, 2),
       |trun AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id
       |  ORDER BY score_fp DESC, doc_id) AS rnk FROM tscored),
       |u AS (SELECT query_id, doc_id, rnk FROM brun WHERE rnk <= 10
       |  UNION ALL SELECT query_id, doc_id, rnk FROM trun WHERE rnk <= 10),
       |f AS (SELECT query_id, doc_id,
       |  CAST(SUM(1000000000 // (60 + rnk)) AS BIGINT) AS rrf_fp,
       |  COUNT(*) AS n_runs FROM u GROUP BY 1, 2)
       |SELECT query_id, CAST(rnk AS INT) AS rnk, doc_id, rrf_fp, n_runs
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |  ORDER BY rrf_fp DESC, doc_id) AS rnk FROM f)
       |WHERE rnk <= 10 ORDER BY query_id, rnk"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val docs = tbl(s, dir, "documents")
    val qs = Seq(
      "q_analytics" -> "query filter join",
      "q_streaming" -> "stream window scan",
      "q_physical" -> "hash merge sort table")
    val bm = TextAnalysis.bm25TopK(docs, qs, k = 10)
    val ti = TextAnalysis.tfidfRetrieveTopK(docs, qs, k = 10)
    TextAnalysis.rrfFuse(Seq(bm, ti), k = 10)
      .orderBy("query_id", "rnk")
  }

  q("q_sketch_cms", {
    def hp(r: String, tok: String) =
      s"('0x' || substr(md5(CAST($r AS VARCHAR) || '|' || $tok), 1, 15))::BIGINT % 256"
    s"""WITH toks AS (SELECT unnest($toksSql) AS tok FROM documents),
       |cells AS (SELECT r, ${hp("r", "tok")} AS bucket, COUNT(*) AS c
       |  FROM toks CROSS JOIN (SELECT unnest(range(4)) AS r) GROUP BY 1, 2),
       |top AS (SELECT tok, COUNT(*) AS n_true FROM toks GROUP BY 1
       |  ORDER BY n_true DESC, tok LIMIT 20),
       |probe AS (SELECT t.tok, t.n_true, c.c FROM top t
       |  CROSS JOIN (SELECT unnest(range(4)) AS r) rr
       |  JOIN cells c ON c.r = rr.r AND c.bucket = ${hp("rr.r", "t.tok")})
       |SELECT tok, n_true, MIN(c) AS n_est FROM probe GROUP BY 1, 2
       |ORDER BY n_true DESC, tok"""
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    // count-min sketch: the grid of exact integer cell counts is ~KB no
    // matter the corpus size; estimates are min-over-rows upper bounds
    val toks = tbl(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val cells = Sketch.cmsCells(toks, "tok")
    val top = toks.groupBy("tok").agg(count(lit(1)).as("n_true"))
      .orderBy(col("n_true").desc, col("tok")).limit(20)
    Sketch.cmsEstimate(cells, top, "tok")
      .orderBy(col("n_true").desc, col("tok"))
  }

  q("q_sketch_kmv_distinct",
    // KMV cardinality estimation: (k-1)*2^60/h_k from the bottom-k
    // synopsis, next to the exact distinct count — the deterministic
    // HLL alternative (hash-checkable, unlike approx_count_distinct)
    s"""WITH tk0 AS (SELECT source, unnest($toksSql) AS tok FROM documents),
       |st AS (SELECT DISTINCT source, tok FROM tk0),
       |sh AS (SELECT DISTINCT source, ${md5Hash60Sql("tok")} AS h FROM st),
       |rk AS (SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk,
       |  COUNT(*) OVER (PARTITION BY source) AS nh FROM sh),
       |est AS (SELECT source, CASE WHEN nh < 128 THEN CAST(nh AS DOUBLE)
       |    ELSE round(127.0 * 1152921504606846976.0 / h, 6) END AS est_distinct
       |  FROM rk WHERE rk = CASE WHEN nh < 128 THEN 1 ELSE 128 END),
       |ex AS (SELECT source, COUNT(*) AS n_exact FROM st GROUP BY 1)
       |SELECT e.source, e.est_distinct, x.n_exact FROM est e
       |JOIN ex x ON x.source = e.source ORDER BY e.source"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val st = tbl(s, dir, "documents")
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .distinct()
    val sigs = Sketch.bottomKSignatures(st, "source", "tok", k = 128)
    val exact = st.groupBy("source").agg(count(lit(1)).as("n_exact"))
    Sketch.kmvDistinct(sigs, "source", k = 128)
      .join(exact, "source")
      .select(col("source"), col("est_distinct"), col("n_exact"))
      .orderBy("source")
  }

  /** Shared oracle for the batch and streaming quantile sketches: the
    * 64 rows with the smallest (md5(event_id), value) per event type are
    * a uniform mergeable sample; quantiles read the sorted sample at
    * floor(q*(n-1)) — no interpolation, so the estimate is bit-identical
    * in any engine.
    */
  private val quantileSketchSql =
    """WITH r AS (SELECT event_type, CAST(value AS DOUBLE) AS v,
      |  row_number() OVER (PARTITION BY event_type
      |    ORDER BY md5(CAST(event_id AS VARCHAR)), CAST(value AS DOUBLE)) AS rn FROM events),
      |s AS (SELECT event_type, list_sort(list(v)) AS vals
      |  FROM r WHERE rn <= 64 GROUP BY 1)
      |SELECT event_type,
      |  vals[CAST(floor(0.5 * (len(vals) - 1)) AS BIGINT) + 1] AS p50,
      |  vals[CAST(floor(0.9 * (len(vals) - 1)) AS BIGINT) + 1] AS p90,
      |  vals[CAST(floor(0.99 * (len(vals) - 1)) AS BIGINT) + 1] AS p99
      |FROM s ORDER BY event_type"""
      .stripMargin.replace("\n", " ")

  q("q_sketch_quantiles", quantileSketchSql) { (s, dir) =>
    Sketch.quantileSketch(tbl(s, dir, "events"), "event_type", "value",
        "event_id", k = 64)
      .orderBy("event_type")
  }

  q("q_sketch_kmv_jaccard",
    // KMV bottom-k signatures: pairwise source similarity from fixed-size
    // synopses, checked against the exact token-set Jaccard
    s"""WITH tk0 AS (SELECT source, unnest($toksSql) AS tok FROM documents),
       |st AS (SELECT DISTINCT source, tok FROM tk0),
       |sh AS (SELECT DISTINCT source, ${md5Hash60Sql("tok")} AS h FROM st),
       |rk AS (SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk FROM sh),
       |sigs AS (SELECT source, list_sort(list(h)) AS sig FROM rk WHERE rk <= 128 GROUP BY source),
       |pairs AS (SELECT a.source AS key_a, b.source AS key_b, a.sig AS sa, b.sig AS sb
       |  FROM sigs a JOIN sigs b ON a.source < b.source),
       |est AS (SELECT key_a, key_b,
       |  round(CAST(len(list_intersect(list_intersect(
       |    list_sort(list_distinct(sa || sb))[1:128], sa), sb)) AS DOUBLE) / 128, 6) AS est_jaccard
       |  FROM pairs),
       |sz AS (SELECT source, COUNT(*) AS sz FROM st GROUP BY 1),
       |iv AS (SELECT x.source AS key_a, y.source AS key_b, COUNT(*) AS ni
       |  FROM st x JOIN st y ON x.tok = y.tok AND x.source < y.source GROUP BY 1, 2)
       |SELECT e.key_a, e.key_b, e.est_jaccard,
       |  round(CAST(iv.ni AS DOUBLE) / (sa.sz + sb.sz - iv.ni), 6) AS exact_jaccard
       |FROM est e JOIN iv ON iv.key_a = e.key_a AND iv.key_b = e.key_b
       |JOIN sz sa ON sa.source = e.key_a JOIN sz sb ON sb.source = e.key_b
       |ORDER BY e.key_a, e.key_b"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val st = tbl(s, dir, "documents")
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .distinct()
    val sigs = Sketch.bottomKSignatures(st, "source", "tok", k = 128)
    val est = Sketch.kmvJaccard(sigs, "source", k = 128)
    val sizes = st.groupBy("source").agg(count(lit(1)).as("sz"))
    val inter = st.as("x").join(st.as("y"),
        col("x.tok") === col("y.tok") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("key_a"), col("y.source").as("key_b"))
      .agg(count(lit(1)).as("ni"))
    est.join(inter, Seq("key_a", "key_b"))
      .join(sizes.select(col("source").as("key_a"), col("sz").as("sza")), "key_a")
      .join(sizes.select(col("source").as("key_b"), col("sz").as("szb")), "key_b")
      .select(col("key_a"), col("key_b"), col("est_jaccard"),
        round(col("ni").cast("double") / (col("sza") + col("szb") - col("ni")), 6)
          .as("exact_jaccard"))
      .orderBy("key_a", "key_b")
  }

  q("q_eval_ranking", {
    val discVals = Eval.ndcgDiscountsFp(10).zipWithIndex
      .map { case (d, i) => s"(${i + 1}, ${d})" }.mkString(", ")
    // NDCG@10 + reciprocal rank of the TF-IDF run against BM25-graded
    // truth (gain = 11 - bm25 rank): discounts are integer literals
    // quantized once in Scala (round(10^12/log2(i+1))) and shared with
    // the oracle, so DCG sums are exact BIGINTs — no transcendental and
    // no float accumulation anywhere, one final division per metric
    s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |stats AS (SELECT COUNT(DISTINCT doc_id) AS n, COUNT(*) AS t FROM toks),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
       |qt AS (SELECT * FROM (VALUES
       |  ('q_analytics', 'query'), ('q_analytics', 'filter'), ('q_analytics', 'join'),
       |  ('q_streaming', 'stream'), ('q_streaming', 'window'), ('q_streaming', 'scan'),
       |  ('q_physical', 'hash'), ('q_physical', 'merge'), ('q_physical', 'sort'),
       |  ('q_physical', 'table')) AS v(query_id, tok)),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       |  WHERE tok IN (SELECT tok FROM qt) GROUP BY 1, 2),
       |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
       |bscored AS (SELECT qt.query_id, tf.doc_id,
       |  CAST(SUM(((2 * (s.n - dfq.df) + 1) * 1000000 // (2 * dfq.df + 1))
       |    * ((22 * s.t * tf.tf * 1000000) // (10 * s.t * tf.tf + 3 * s.t + 9 * dl.dl * s.n)))
       |    AS BIGINT) AS score_fp
       |  FROM qt JOIN tf USING (tok) JOIN dfq USING (tok)
       |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s GROUP BY 1, 2),
       |truth AS (SELECT query_id, doc_id, 11 - rnk AS gain
       |  FROM (SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY score_fp DESC, doc_id) AS rnk FROM bscored) WHERE rnk <= 10),
       |nd AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
       |tscored AS (SELECT qt.query_id, tf.doc_id,
       |  CAST(SUM(tf.tf * nd.nd * 1000000 // dfq.df) AS BIGINT) AS score_fp
       |  FROM qt JOIN tf USING (tok) JOIN dfq USING (tok) CROSS JOIN nd GROUP BY 1, 2),
       |trun AS (SELECT query_id, doc_id, rnk FROM (SELECT query_id, doc_id,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score_fp DESC, doc_id) AS rnk
       |  FROM tscored) WHERE rnk <= 10),
       |disc AS (SELECT * FROM (VALUES $discVals) AS d(i, dfp)),
       |dcg AS (SELECT t.query_id,
       |  CAST(SUM(coalesce(tr.gain, 0) * d.dfp) AS BIGINT) AS dcg_fp
       |  FROM trun t LEFT JOIN truth tr ON tr.query_id = t.query_id AND tr.doc_id = t.doc_id
       |  JOIN disc d ON d.i = t.rnk GROUP BY 1),
       |ideal AS (SELECT query_id, CAST(SUM(gain * d.dfp) AS BIGINT) AS idcg_fp
       |  FROM (SELECT query_id, gain, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY gain DESC, doc_id) AS irn FROM truth) x
       |  JOIN disc d ON d.i = x.irn WHERE x.irn <= 10 GROUP BY 1),
       |frel AS (SELECT t.query_id, MIN(t.rnk) AS first_rel FROM trun t
       |  JOIN truth tr ON tr.query_id = t.query_id AND tr.doc_id = t.doc_id GROUP BY 1)
       |SELECT q.query_id, round(CAST(dcg.dcg_fp AS DOUBLE) / ideal.idcg_fp, 6) AS ndcg,
       |  CAST(frel.first_rel AS INT) AS first_rel,
       |  CAST(coalesce(1000000000 // frel.first_rel, 0) AS BIGINT) AS rr_fp
       |FROM (SELECT DISTINCT query_id FROM trun) q
       |JOIN dcg ON dcg.query_id = q.query_id
       |JOIN ideal ON ideal.query_id = q.query_id
       |LEFT JOIN frel ON frel.query_id = q.query_id
       |ORDER BY q.query_id""".stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val docs = tbl(s, dir, "documents")
    val qs = Seq(
      "q_analytics" -> "query filter join",
      "q_streaming" -> "stream window scan",
      "q_physical" -> "hash merge sort table")
    val truth = TextAnalysis.bm25TopK(docs, qs, k = 10)
      .select(col("query_id"), col("doc_id"), (lit(11) - col("rnk")).cast("long").as("gain"))
    val run = TextAnalysis.tfidfRetrieveTopK(docs, qs, k = 10)
    Eval.ndcgAtK(run, truth, k = 10)
      .join(Eval.reciprocalRankAtK(run, truth, k = 10), "query_id")
      .orderBy("query_id")
  }

  q("q_sketch_kmv_containment",
    // asymmetric containment |A∩B|/|A| from the same KMV signatures as
    // kmv_jaccard — the subset-duplication signal Jaccard hides — next to
    // the exact containment from the token sets
    s"""WITH tk0 AS (SELECT source, unnest($toksSql) AS tok FROM documents),
       |st AS (SELECT DISTINCT source, tok FROM tk0),
       |sh AS (SELECT DISTINCT source, ${md5Hash60Sql("tok")} AS h FROM st),
       |rk AS (SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk FROM sh),
       |sigs AS (SELECT source, list_sort(list(h)) AS sig FROM rk WHERE rk <= 128 GROUP BY source),
       |pairs AS (SELECT a.source AS key_a, b.source AS key_b, a.sig AS sa, b.sig AS sb
       |  FROM sigs a JOIN sigs b ON a.source != b.source),
       |est AS (SELECT key_a, key_b,
       |  CASE WHEN len(list_intersect(list_sort(list_distinct(sa || sb))[1:128], sa)) > 0
       |    THEN round(CAST(len(list_intersect(list_intersect(
       |        list_sort(list_distinct(sa || sb))[1:128], sa), sb)) AS DOUBLE)
       |      / len(list_intersect(list_sort(list_distinct(sa || sb))[1:128], sa)), 6)
       |    END AS est_containment FROM pairs),
       |sz AS (SELECT source, COUNT(*) AS sz FROM st GROUP BY 1),
       |iv AS (SELECT x.source AS key_a, y.source AS key_b, COUNT(*) AS ni
       |  FROM st x JOIN st y ON x.tok = y.tok AND x.source != y.source GROUP BY 1, 2)
       |SELECT e.key_a, e.key_b, e.est_containment,
       |  round(CAST(coalesce(iv.ni, 0) AS DOUBLE) / sa.sz, 6) AS exact_containment
       |FROM est e LEFT JOIN iv ON iv.key_a = e.key_a AND iv.key_b = e.key_b
       |JOIN sz sa ON sa.source = e.key_a
       |ORDER BY e.key_a, e.key_b""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val st = tbl(s, dir, "documents")
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .distinct()
    val sigs = Sketch.bottomKSignatures(st, "source", "tok", k = 128)
    val est = Sketch.kmvContainment(sigs, "source", k = 128)
    val sizes = st.groupBy("source").agg(count(lit(1)).as("sz"))
    val inter = st.as("x").join(st.as("y"),
        col("x.tok") === col("y.tok") && col("x.source") =!= col("y.source"))
      .groupBy(col("x.source").as("key_a"), col("y.source").as("key_b"))
      .agg(count(lit(1)).as("ni"))
    est.join(inter, Seq("key_a", "key_b"), "left")
      .join(sizes.select(col("source").as("key_a"), col("sz").as("sza")), "key_a")
      .select(col("key_a"), col("key_b"), col("est_containment"),
        round(coalesce(col("ni"), lit(0L)).cast("double") / col("sza"), 6)
          .as("exact_containment"))
      .orderBy("key_a", "key_b")
  }

  q("q_sketch_hll_merge",
    // HLL register MERGE: per-source register tables max-merge into one
    // global sketch whose estimate equals the sketch built over the whole
    // corpus directly (hash ignores the key) — the operation a 100 TB
    // pipeline runs across shards/days instead of re-scanning history.
    // The oracle computes the direct global sketch; equality IS the test.
    s"""WITH tk0 AS (SELECT source, unnest($toksSql) AS tok FROM documents),
       |st AS (SELECT DISTINCT tok FROM tk0),
       |hh AS (SELECT ${md5Hash60Sql("tok")} AS h FROM st),
       |r AS (SELECT h % 64 AS j, h // 64 AS w FROM hh),
       |rr AS (SELECT j, MAX(55 - length(trim(LEADING '0' FROM bin(w)))) AS mj
       |  FROM r GROUP BY 1),
       |sm AS (SELECT CAST(SUM(CAST(1 AS BIGINT) << (55 - mj)) AS BIGINT) AS sp,
       |  COUNT(*) AS np FROM rr),
       |ex AS (SELECT COUNT(*) AS n_exact FROM st)
       |SELECT 'all' AS scope,
       |  ${hllEstSql(64, "s.sp", "s.np")} AS est_distinct,
       |  x.n_exact
       |FROM sm s CROSS JOIN ex x""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val st = tbl(s, dir, "documents")
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .distinct()
    // build PER-SOURCE register tables, then merge them by register max —
    // never re-touching the token stream — and estimate from the merge
    val perSource = Sketch.hllRegisters(st, "source", "tok", m = 64)
    val merged = perSource.withColumn("scope", lit("all"))
      .groupBy("scope", "j").agg(max("mj").as("mj"))
    val exact = st.select("tok").distinct().agg(count(lit(1)).as("n_exact"))
    Sketch.hllEstimate(merged, "scope", m = 64)
      .crossJoin(exact)
      .select(col("scope"), col("est_distinct"), col("n_exact"))
  }

  q("q_eval_hll_error", {
    // HLL precision sweep: m ∈ {16, 64, 256} registers over the corpus
    // 3-gram shingle universe (thousands of values — the raw-regime the
    // sketch exists for, unlike the 31-token vocabulary) — the
    // memory/accuracy table (stderr ~ 1.04/sqrt(m)) a pipeline reads
    // before sizing a 100 TB cardinality job; small-range linear
    // counting applies automatically where raw ≤ 2.5m
    def cfg(m: Int): String = {
      val shift = Sketch.hllShift(m)
      s"""SELECT $m AS m, ${hllEstSql(m, "sm.sp", "sm.np")} AS est_distinct
         |FROM (SELECT CAST(SUM(CAST(1 AS BIGINT) << ($shift - mj)) AS BIGINT) AS sp,
         |  COUNT(*) AS np
         |  FROM (SELECT j, MAX($shift - length(trim(LEADING '0' FROM bin(w)))) AS mj
         |    FROM (SELECT h % $m AS j, h // $m AS w FROM hh) GROUP BY 1)) sm"""
        .stripMargin
    }
    s"""WITH st AS (SELECT DISTINCT g FROM
       |  (SELECT unnest($shinglesSql) AS g FROM documents)),
       |hh AS (SELECT ${md5Hash60Sql("g")} AS h FROM st),
       |ex AS (SELECT COUNT(*) AS n_exact FROM st),
       |cfgs AS (${Seq(16, 64, 256).map(cfg).mkString(" UNION ALL ")})
       |SELECT c.m, c.est_distinct, x.n_exact,
       |  round((c.est_distinct - x.n_exact) / x.n_exact, 6) AS rel_err
       |FROM cfgs c CROSS JOIN ex x ORDER BY c.m"""
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val st = tbl(s, dir, "documents")
      .select(explode(TextAnalysis.shingles(col("text"), 3)).as("g"))
      .distinct()
      .withColumn("grp", lit("all"))
      .localCheckpoint() // three register builds scan it
    val exact = st.agg(count(lit(1)).as("n_exact"))
    Seq(16, 64, 256).map { m =>
      Sketch.hllEstimate(Sketch.hllRegisters(st, "grp", "g", m), "grp", m)
        .select(lit(m).as("m"), col("est_distinct"))
    }.reduce(_ unionByName _)
      .crossJoin(exact)
      .select(col("m"), col("est_distinct"), col("n_exact"),
        round((col("est_distinct") - col("n_exact")) / col("n_exact"), 6)
          .as("rel_err"))
      .orderBy("m")
  }

  q("q_sketch_hll_windowed",
    // time-bucketed cardinality ("distinct users per hour") as one HLL
    // register table keyed by the hour — the sketch-per-window form that
    // absorbs late data by max-merge instead of recount; estimate next
    // to the exact count per window
    s"""WITH ev AS (SELECT DISTINCT date_trunc('hour', ts) AS hour, user_id FROM events),
       |hh AS (SELECT DISTINCT hour, ${md5Hash60Sql("user_id")} AS h FROM ev),
       |r AS (SELECT hour, h % 64 AS j, h // 64 AS w FROM hh),
       |rr AS (SELECT hour, j,
       |  MAX(55 - length(trim(LEADING '0' FROM bin(w)))) AS mj
       |  FROM r GROUP BY 1, 2),
       |sm AS (SELECT hour, CAST(SUM(CAST(1 AS BIGINT) << (55 - mj)) AS BIGINT) AS sp,
       |  COUNT(*) AS np FROM rr GROUP BY 1),
       |ex AS (SELECT hour, COUNT(*) AS n_exact FROM ev GROUP BY 1)
       |SELECT s.hour,
       |  ${hllEstSql(64, "s.sp", "s.np")} AS est_distinct,
       |  x.n_exact
       |FROM sm s JOIN ex x ON x.hour = s.hour ORDER BY s.hour"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val ev = events(s, dir)
      .select(date_trunc("hour", col("ts")).as("hour"), col("user_id"))
      .distinct()
    val regs = Sketch.hllRegisters(ev, "hour", "user_id", m = 64)
    val exact = ev.groupBy("hour").agg(count(lit(1)).as("n_exact"))
    Sketch.hllEstimate(regs, "hour", m = 64)
      .join(exact, "hour")
      .select(col("hour"), col("est_distinct"), col("n_exact"))
      .orderBy("hour")
  }

  q("q_sketch_hll",
    // HyperLogLog distinct sketch with the md5 hash family: register
    // index = h mod 64, rho from integer/string bit-length (no log2), the
    // harmonic sum kept exact as Σ 2^(55-Mj) in BIGINT — so the classic
    // probabilistic counter is bit-reproducible and hash-checkable (the
    // property approx_count_distinct lacks). Exact count alongside.
    s"""WITH tk0 AS (SELECT source, unnest($toksSql) AS tok FROM documents),
       |st AS (SELECT DISTINCT source, tok FROM tk0),
       |hh AS (SELECT DISTINCT source, ${md5Hash60Sql("tok")} AS h FROM st),
       |r AS (SELECT source, h % 64 AS j, h // 64 AS w FROM hh),
       |rr AS (SELECT source, j,
       |  MAX(55 - length(trim(LEADING '0' FROM bin(w)))) AS mj
       |  FROM r GROUP BY 1, 2),
       |sm AS (SELECT source, CAST(SUM(CAST(1 AS BIGINT) << (55 - mj)) AS BIGINT) AS sp,
       |  COUNT(*) AS np FROM rr GROUP BY 1),
       |ex AS (SELECT source, COUNT(*) AS n_exact FROM st GROUP BY 1)
       |SELECT s.source,
       |  ${hllEstSql(64, "s.sp", "s.np")} AS est_distinct,
       |  x.n_exact
       |FROM sm s JOIN ex x ON x.source = s.source ORDER BY s.source"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val st = tbl(s, dir, "documents")
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .distinct()
    val regs = Sketch.hllRegisters(st, "source", "tok", m = 64)
    val exact = st.groupBy("source").agg(count(lit(1)).as("n_exact"))
    Sketch.hllEstimate(regs, "source", m = 64)
      .join(exact, "source")
      .select(col("source"), col("est_distinct"), col("n_exact"))
      .orderBy("source")
  }

  // ===========================================================================
  // Corpus-curation pipeline — decontamination, deterministic sampling,
  // mixture weighting, PII redaction, bloom prefiltering (ops.Pipeline).
  // ===========================================================================

  q("q_decontaminate", {
    val sh5 = shinglesSqlN(5)
    s"""WITH sh AS (SELECT doc_id, source, $sh5 AS s FROM documents),
       |ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 17 = 0),
       |contam AS (SELECT DISTINCT doc_id FROM
       |  (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 17 != 0)
       |  WHERE g IN (SELECT g FROM ev))
       |SELECT source, COUNT(*) AS n_clean, MIN(doc_id) AS min_id
       |FROM documents WHERE doc_id % 17 != 0
       |  AND doc_id NOT IN (SELECT doc_id FROM contam)
       |GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    // benchmark decontamination: train docs sharing any 5-gram shingle
    // with the eval slice (doc_id % 17 = 0) are dropped. Eval grams and
    // the contaminated-id set both broadcast; the train side is only
    // exploded + hashed map-side (the 100 TB-safe orientation).
    val docs = tbl(s, dir, "documents")
    val train = docs.filter(col("doc_id") % 17 =!= 0)
    val ev = docs.filter(col("doc_id") % 17 === 0)
    Pipeline.decontaminate(train, ev, "text", "doc_id", shingleN = 5)
      .groupBy("source")
      .agg(count(lit(1)).as("n_clean"), min("doc_id").as("min_id"))
      .orderBy("source")
  }

  q("q_sample_hash",
    s"""SELECT lang, COUNT(*) AS n, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
       |FROM documents WHERE ${md5Hash60Sql("doc_id")} % 20 = 0
       |GROUP BY lang ORDER BY lang""".stripMargin.replace("\n", " ")) { (s, dir) =>
    // deterministic 5% sample: stable across runs/partitionings/engines
    // (df.sample() is neither); a pure narrow filter, no shuffle
    Pipeline.hashSample(tbl(s, dir, "documents"), "doc_id", mod = 20, keep = 1)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("lang")
  }

  q("q_sample_weighted",
    // Efraimidis-Spirakis weighted sample: priority -ln(u)/w with u a
    // deterministic md5-derived uniform — the oracle replays the exact
    // float pipeline (52-bit hash → one ln, one division: both engines'
    // libm log differ at most in the last ulp, and the top-k boundary
    // gap over hundreds of docs is astronomically wider than an ulp)
    """WITH p AS (SELECT doc_id, n_chars,
      |    -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
      |        / 4503599627370496.0) / CAST(n_chars AS DOUBLE) AS arrival
      |  FROM documents)
      |SELECT doc_id, n_chars FROM p ORDER BY arrival LIMIT 25"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // NOTE: driver compare re-sorts rows, so the LIMIT-selected SET is
    // what is checked — membership is the sampling semantics
    Pipeline.weightedSample(tbl(s, dir, "documents")
        .select(col("doc_id"), col("n_chars")), "doc_id", "n_chars", k = 25)
      .orderBy("doc_id")
  }

  q("q_split_train_val",
    // deterministic disjoint train/val/test assignment: exhaustive,
    // non-overlapping, stable across runs/partitionings/engines — the
    // property random splits lack and leakage audits require
    s"""WITH s AS (SELECT doc_id, lang,
       |  CASE WHEN ${md5Hash60Sql("doc_id")} % 100 < 80 THEN 'train'
       |       WHEN ${md5Hash60Sql("doc_id")} % 100 < 90 THEN 'val'
       |       ELSE 'test' END AS split FROM documents)
       |SELECT split, lang, COUNT(*) AS n,
       |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
       |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Pipeline.splitAssign(tbl(s, dir, "documents"), "doc_id",
        cuts = Seq(80, 90), labels = Seq("train", "val", "test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))
      .orderBy("split", "lang")
  }

  q("q_split_token_tv",
    // split-skew audit: total-variation distance between train/rest
    // unigram distributions, exact-integer numerator over the common
    // denominator, one IEEE division at the end (see Eval.splitTokenTv)
    s"""WITH s AS (SELECT doc_id, text,
       |  CASE WHEN ${md5Hash60Sql("doc_id")} % 100 < 80 THEN 'train'
       |       ELSE 'rest' END AS split FROM documents),
       |t AS (SELECT split, unnest($toksSql) AS tok FROM s),
       |c AS (SELECT tok, SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS c,
       |  SUM(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) AS d FROM t GROUP BY 1),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t1, CAST(SUM(d) AS BIGINT) AS t2 FROM c),
       |n AS (SELECT CAST(SUM(abs(c * t2 - d * t1)) AS BIGINT) AS tv_num
       |  FROM c CROSS JOIN tot)
       |SELECT t1 AS n_train_toks, t2 AS n_rest_toks,
       |  round(CAST(tv_num AS DOUBLE) / (2.0 * t1 * t2), 6) AS tv
       |FROM n CROSS JOIN tot""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Eval.splitTokenTv(tbl(s, dir, "documents"), "text", "doc_id", trainCut = 80)
  }

  q("q_sample_stratified",
    s"""SELECT lang, rn, doc_id FROM (
       |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
       |    ORDER BY ${md5Hash60Sql("doc_id")}, doc_id) AS rn FROM documents)
       |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin.replace("\n", " ")) { (s, dir) =>
    // fixed-n-per-stratum deterministic sample (hash-ordered rank)
    Pipeline.stratifiedSample(tbl(s, dir, "documents"), "lang", "doc_id", nPerStratum = 20)
      .select("lang", "rn", "doc_id")
      .orderBy("lang", "rn")
  }

  private val mixtureRates: Seq[(String, Int)] =
    (0 until 20).map(i => s"src$i" -> Seq(60, 30, 10)(i % 3))

  q("q_sample_budget",
    // exact per-stratum row budgets (the "n docs per source" training
    // mixture): md5-hash rank within source, budgets broadcast
    s"""WITH b AS (SELECT source, 5 + (length(source) % 7) AS budget
       |  FROM (SELECT DISTINCT source FROM documents)),
       |r AS (SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source
       |  ORDER BY ${md5Hash60Sql("doc_id")}, doc_id) AS rn FROM documents)
       |SELECT r.source, r.doc_id, CAST(r.rn AS INT) AS rn FROM r
       |JOIN b ON b.source = r.source WHERE r.rn <= b.budget
       |ORDER BY r.source, r.rn""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val docs = tbl(s, dir, "documents")
    val budgets = docs.select("source").distinct()
      .withColumn("budget", lit(5) + pmod(length(col("source")), lit(7)))
    Pipeline.budgetSample(docs, "source", "doc_id", budgets)
      .select(col("source"), col("doc_id"), col("rn").cast("int").as("rn"))
      .orderBy("source", "rn")
  }

  q("q_shuffle_epoch",
    // deterministic epoch shuffle: the epoch-1 training order as
    // (shard, pos) — epoch-salted hash shard + within-shard hash rank, so
    // the permutation is stable across runs/engines WITHOUT a global sort
    // (the rank window parallelizes across the 8 shards)
    s"""WITH h AS (SELECT doc_id,
       |  ${md5Hash60Sql("concat('e1|', doc_id)")} AS h FROM documents)
       |SELECT doc_id, CAST(h % 8 AS INT) AS shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS INT) AS pos
       |FROM h ORDER BY shard, pos""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Pipeline.epochShuffle(tbl(s, dir, "documents"), "doc_id",
        epoch = 1, nShards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  q("q_sample_token_budget",
    // TOKEN-budget mixture: per source, keep the hash-ordered prefix of
    // docs whose cumulative token count fits 400 tokens — the "N tokens
    // per source" training mix (vs q_sample_budget's doc counts); the
    // cumulative sum is monotone along the unique hash order, so the
    // kept set is a deterministic prefix on any engine
    s"""WITH t AS (SELECT source, doc_id,
       |  CAST(len($toksSql) AS BIGINT) AS n_tok,
       |  ${md5Hash60Sql("doc_id")} AS h FROM documents),
       |c AS (SELECT source, doc_id, n_tok,
       |  CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok FROM t)
       |SELECT source, doc_id, CAST(n_tok AS INT) AS n_tok, cum_tok
       |FROM c WHERE cum_tok <= 400 ORDER BY source, doc_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Pipeline.tokenBudgetSample(tbl(s, dir, "documents"), "source", "doc_id",
        size(TextAnalysis.tokens(col("text"))), budget = 400L)
      .select(col("source"), col("doc_id"),
        col("n_tok").cast("int").as("n_tok"), col("cum_tok"))
      .orderBy("source", "doc_id")
  }

  q("q_trimmed_mean",
    // robust location: drop values outside the exact PHYSICAL 5th/95th
    // percentile elements (rank 1+(n−1)·p div 100 — integer selection,
    // tie-order-proof), average the rest over an exact decimal sum.
    // Bounds come from a spillable rank window, never a per-group
    // in-memory buffer (the percentile()/collect_list 100 TB trap)
    """WITH g AS (SELECT l_returnflag, l_extendedprice AS v FROM lineitem),
      |r AS (SELECT l_returnflag, v,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n FROM g),
      |bnd AS (SELECT l_returnflag,
      |    MIN(CASE WHEN rn = 1 + (n - 1) * 5 // 100 THEN v END) AS plo,
      |    MIN(CASE WHEN rn = 1 + (n - 1) * 95 // 100 THEN v END) AS phi
      |  FROM r WHERE rn = 1 + (n - 1) * 5 // 100
      |    OR rn = 1 + (n - 1) * 95 // 100 GROUP BY 1)
      |SELECT g.l_returnflag, COUNT(*) AS n_kept,
      |  round(CAST(SUM(CAST(v AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS trimmed_mean
      |FROM g JOIN bnd b ON g.l_returnflag = b.l_returnflag
      |WHERE v >= b.plo AND v <= b.phi
      |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.trimmedMean(tbl(s, dir, "lineitem"), "l_returnflag", "l_extendedprice")
      .orderBy("l_returnflag")
  }

  q("q_mixture_weights", {
    val rateSql = mixtureRates
      .map { case (src, r) => s"WHEN source = '$src' THEN $r" }.mkString(" ")
    s"""SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS min_id
       |FROM documents WHERE ${md5Hash60Sql("doc_id")} % 100 < (CASE $rateSql ELSE 0 END)
       |GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    // training-mix materialization: per-source keep-rates (60/30/10%)
    // applied as one deterministic narrow filter
    Pipeline.mixtureSample(tbl(s, dir, "documents"), "source", "doc_id", mixtureRates.toMap)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), min("doc_id").as("min_id"))
      .orderBy("source")
  }

  q("q_sample_temperature",
    // temperature-smoothed (α=1/2) mixture budgets: per-source √n
    // weights as EXACT integer square roots (floor(sqrt) corrected by
    // one compare each way, so libm ulp differences cannot shift it),
    // one truncating division per source against the exact weight total
    """WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
      |s AS (SELECT source, n_docs, n_docs * 1000000 AS x,
      |  CAST(floor(sqrt(CAST(n_docs * 1000000 AS DOUBLE))) AS BIGINT) AS s0 FROM c),
      |w AS (SELECT source, n_docs, CASE WHEN (s0+1)*(s0+1) <= x THEN s0+1
      |  WHEN s0*s0 > x THEN s0-1 ELSE s0 END AS w_fp FROM s),
      |t AS (SELECT SUM(w_fp) AS tw FROM w)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(w_fp AS BIGINT) AS w_fp,
      |  CAST(w_fp * 10000 // tw AS BIGINT) AS alloc_docs
      |FROM w, t ORDER BY source""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Pipeline.temperatureBudgets(tbl(s, dir, "documents"), "source",
      budget = 10000L).orderBy("source")
  }

  q("q_logrank",
    // log-rank (Mantel-Cox) comparison of even- vs odd-user lifetime
    // distributions (every subject an event — censoring is exercised by
    // the spec's hand fixture): at-risk sets from exclusive cumulative
    // counts, hypergeometric expectation/variance per event time in
    // ×1e6 truncating fixed point, one double combination for the χ² —
    // the companion test to q_km_survival over the same lifetimes
    """WITH u AS (SELECT user_id, MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
      |  FROM events GROUP BY 1),
      |dur AS (SELECT user_id % 2 = 0 AS a, (mx - mn) // 3600000000 AS t,
      |    1 AS d FROM u),
      |g AS (SELECT t, COUNT(*) AS c, SUM(d) AS dd,
      |    SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
      |    SUM(CASE WHEN a THEN d ELSE 0 END) AS da FROM dur GROUP BY 1),
      |tt AS (SELECT SUM(c) AS nn, SUM(ca) AS na FROM g),
      |km AS (SELECT dd, da,
      |    nn - coalesce(SUM(c) OVER w, 0) AS nr,
      |    na - coalesce(SUM(ca) OVER w, 0) AS nra
      |  FROM g, tt WINDOW w AS (ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |terms AS (SELECT da, dd * nra * 1000000 // nr AS e_fp,
      |    (dd * (nr - dd) * 1000000 // GREATEST(nr - 1, 1))
      |      * nra // nr * (nr - nra) // nr AS v_fp
      |  FROM km WHERE dd > 0),
      |s AS (SELECT SUM(da) AS o_a, SUM(e_fp) AS e, SUM(v_fp) AS v FROM terms)
      |SELECT CAST(nn AS BIGINT) AS n, CAST(na AS BIGINT) AS n_a,
      |  CAST(o_a AS BIGINT) AS o_a, CAST(e AS BIGINT) AS e_a_x1e6,
      |  CAST(v AS BIGINT) AS v_x1e6,
      |  round(CAST(CAST(o_a AS BIGINT) * 1000000 - CAST(e AS BIGINT) AS DOUBLE)
      |    * CAST(CAST(o_a AS BIGINT) * 1000000 - CAST(e AS BIGINT) AS DOUBLE)
      |    / (CAST(CAST(v AS BIGINT) AS DOUBLE) * 1.0e6), 6) AS logrank_chi2
      |FROM s, tt""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val u = events(s, dir).groupBy("user_id")
      .agg(min(unix_micros(col("ts").cast(TimestampType))).as("mn"),
        max(unix_micros(col("ts").cast(TimestampType))).as("mx"))
    val dur = u.select((col("user_id") % 2 === 0).as("a"),
      expr("(mx - mn) div 3600000000").as("t"), lit(1L).as("d"))
    Stats.logRank(dur, col("a"), col("t"), col("d"))
  }

  /** DuckDB CTE chain for the hourly event-count acf at lags 1..6;
    * ends in `ac(lag, n_pairs, acf)` — shared by the acf and pacf
    * oracles.
    */
  private val acfHourlyCtes: String =
    """h AS (SELECT CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS v FROM events GROUP BY 1),
      |l AS (SELECT lag FROM (VALUES (1), (2), (3), (4), (5), (6)) x(lag)),
      |j AS (SELECT l.lag, CAST(a.v AS DECIMAL(18,0)) AS x,
      |    CAST(b.v AS DECIMAL(18,0)) AS y
      |  FROM h a CROSS JOIN l JOIN h b ON b.t = a.t + l.lag),
      |s AS (SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      |  FROM j GROUP BY 1),
      |ac AS (SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS acf
      |FROM s)""".stripMargin

  q("q_acf_hourly",
    // autocorrelation of the hourly event-count series at lags 1..6:
    // pairwise-complete Pearson over the shifted-index equi-join, exact
    // decimal power sums per lag, one IEEE combination each (the
    // rolling_corr float discipline applied to the time domain)
    s"""WITH $acfHourlyCtes
      |SELECT lag, n_pairs, acf FROM ac ORDER BY lag"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val h = events(s, dir)
      .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
        .cast("long").as("t"))
      .agg(count(lit(1)).as("v"))
    Stats.acf(h, col("t"), col("v"), maxLag = 6).orderBy("lag")
  }

  q("q_ccf_hourly",
    // cross-correlation of click vs view hourly counts at lags −3..3:
    // which stream LEADS shows as the peak-lag sign; same shifted-index
    // join + exact decimal power sums as the acf
    """WITH hx AS (SELECT CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS v FROM events WHERE event_type = 'click' GROUP BY 1),
      |hy AS (SELECT CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS v FROM events WHERE event_type = 'view' GROUP BY 1),
      |l AS (SELECT lag FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3)) x(lag)),
      |j AS (SELECT l.lag, CAST(a.v AS DECIMAL(18,0)) AS x,
      |    CAST(b.v AS DECIMAL(18,0)) AS y
      |  FROM hx a CROSS JOIN l JOIN hy b ON b.t = a.t + l.lag),
      |s AS (SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      |  FROM j GROUP BY 1)
      |SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS ccf
      |FROM s ORDER BY lag""".stripMargin.replace("\n", " ")) { (s, dir) =>
    def hourly(et: String) = events(s, dir).filter(col("event_type") === et)
      .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
        .cast("long").as("t"))
      .agg(count(lit(1)).as("v"))
    Stats.ccf(hourly("click"), hourly("view"), "t", "v", maxLag = 3)
      .orderBy("lag")
  }

  q("q_mase_hourly",
    // seasonal MASE: |v_t − v_{t−24}| vs the one-step naive |v_t −
    // v_{t−1}|, pairwise-complete — one truncating division of exact
    // cross-multiplied integer sums; below 1e6 = the daily cycle beats
    // last-value persistence
    """WITH h AS (SELECT CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS v FROM events GROUP BY 1),
      |se AS (SELECT COUNT(*) AS n_season, SUM(abs(a.v - b.v)) AS sum_season
      |  FROM h a JOIN h b ON a.t = b.t + 24),
      |na AS (SELECT COUNT(*) AS n_naive, SUM(abs(a.v - b.v)) AS sum_naive
      |  FROM h a JOIN h b ON a.t = b.t + 1)
      |SELECT CAST(n_season AS BIGINT) AS n_season,
      |  CAST(sum_season AS BIGINT) AS sum_season,
      |  CAST(n_naive AS BIGINT) AS n_naive, CAST(sum_naive AS BIGINT) AS sum_naive,
      |  CAST(sum_season * n_naive * 1000000 // (n_season * sum_naive) AS BIGINT)
      |    AS mase_x1e6
      |FROM se, na""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val h = events(s, dir)
      .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
        .cast("long").as("t"))
      .agg(count(lit(1)).as("v"))
    Stats.seasonalMase(h, col("t"), col("v"), season = 24)
  }

  q("q_runs_test",
    // Wald-Wolfowitz runs test on the above-mean indicator of the
    // hourly series: run count from adjacent-index joins (no window),
    // exact cross-multiplied mean comparison, E and V in ×1e6
    // truncating fixed point, one double z combination
    """WITH h AS (SELECT CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS v FROM events GROUP BY 1),
      |tt AS (SELECT COUNT(*) AS n, SUM(v) AS sv FROM h),
      |ind AS (SELECT t, v * n > sv AS hi FROM h, tt),
      |bd AS (SELECT SUM(CASE WHEN a.hi <> b.hi THEN 1 ELSE 0 END) AS chg
      |  FROM ind a JOIN ind b ON a.t = b.t + 1),
      |cn AS (SELECT SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS n1,
      |  SUM(CASE WHEN NOT hi THEN 1 ELSE 0 END) AS n2 FROM ind),
      |s AS (SELECT n1, n2, chg + 1 AS runs,
      |    1000000 + 2 * n1 * n2 * 1000000 // (n1 + n2) AS e_x1e6,
      |    (2 * n1 * n2 * 1000000 // ((n1 + n2) * (n1 + n2)))
      |      * (2 * n1 * n2 - n1 - n2) // GREATEST(n1 + n2 - 1, 1) AS v_x1e6
      |  FROM cn, bd)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST(runs AS BIGINT) AS runs, CAST(e_x1e6 AS BIGINT) AS e_x1e6,
      |  CAST(v_x1e6 AS BIGINT) AS v_x1e6,
      |  round(CAST(CAST(runs AS BIGINT) * 1000000 - CAST(e_x1e6 AS BIGINT)
      |      AS DOUBLE) /
      |    sqrt(CAST(CAST(v_x1e6 AS BIGINT) AS DOUBLE) * 1.0e6), 6) AS z
      |FROM s""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val h = events(s, dir)
      .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
        .cast("long").as("t"))
      .agg(count(lit(1)).as("v"))
    Stats.runsTest(h, col("t"), col("v"))
  }

  q("q_pacf_hourly",
    // partial autocorrelation via Levinson-Durbin over the SAME rounded
    // acf vector: the oracle's recursive CTE replays the recursion
    // operation for operation (ascending-fold dot products, one
    // subtraction, one division per order), so the doubles match bit
    // for bit; the engine runs it driver-side over the 6 collected
    // values — the codebook rule
    s"""WITH RECURSIVE $acfHourlyCtes,
      |rr AS (SELECT list(acf ORDER BY lag) AS r FROM ac),
      |st(m, phis, e, pacfs) AS (
      |  SELECT 1, [r[1]], 1.0e0 - r[1] * r[1], [r[1]] FROM rr
      |  UNION ALL
      |  SELECT m + 1,
      |    list_append(list_transform(range(1, m + 1),
      |      i -> phis[i] - kap * phis[m + 1 - i]), kap),
      |    e * (1.0e0 - kap * kap),
      |    list_append(pacfs, kap)
      |  FROM (SELECT m, phis, e, pacfs,
      |      (r[m + 1] - list_reduce(list_transform(range(1, m + 1),
      |        j -> phis[j] * r[m + 1 - j]), (a, b) -> a + b)) / e AS kap
      |    FROM st, rr) WHERE m < 6),
      |fin AS (SELECT pacfs FROM st ORDER BY m DESC LIMIT 1)
      |SELECT ac.lag, ac.acf, round(fin.pacfs[ac.lag], 6) AS pacf
      |FROM ac, fin ORDER BY ac.lag""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val h = events(s, dir)
      .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
        .cast("long").as("t"))
      .agg(count(lit(1)).as("v"))
    Stats.pacf(h, col("t"), col("v"), maxLag = 6).orderBy("lag")
  }

  q("q_gini_spend",
    // Gini coefficient of per-customer spend: windowless global ranks
    // with a unique tie-break, exact decimal numerator/denominator,
    // one IEEE combination on the single result row
    """WITH s AS (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))
      |    * 100) AS BIGINT) AS cents FROM orders GROUP BY 1),
      |r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS r FROM s),
      |a AS (SELECT COUNT(*) AS n, SUM(CAST(cents AS DECIMAL(38,0))) AS sv,
      |  SUM(CAST(2 * r * cents AS DECIMAL(38,0))) AS s2rv FROM r)
      |SELECT CAST(n AS BIGINT) AS n,
      |  round((CAST(s2rv AS DOUBLE) - (n + 1) * CAST(sv AS DOUBLE))
      |    / (n * CAST(sv AS DOUBLE)), 6) AS gini FROM a"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val spend = tbl(s, dir, "orders").groupBy("o_custkey")
      .agg((sum(dec(col("o_totalprice"), 12, 2) * 100)).cast("long").as("cents"))
    Stats.gini(spend, col("cents"), col("o_custkey"))
  }

  q("q_lorenz_deciles",
    // Lorenz curve at spend deciles: NTILE over the same unique-ranked
    // order (ntileOfRank is NTILE-exact), per-decile and cumulative
    // value shares — cumulative sums windowless over the 10 bucket rows
    """WITH s AS (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))
      |    * 100) AS BIGINT) AS cents FROM orders GROUP BY 1),
      |r AS (SELECT cents, NTILE(10) OVER (ORDER BY cents, o_custkey) AS bucket FROM s),
      |g AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS v_sum FROM r GROUP BY 1),
      |t AS (SELECT SUM(v_sum) AS v_tot FROM g),
      |c AS (SELECT bucket, n_rows, v_sum,
      |  SUM(v_sum) OVER (ORDER BY bucket) AS v_cum FROM g)
      |SELECT CAST(bucket AS INT) AS bucket, n_rows, v_sum,
      |  round(CAST(v_sum AS DOUBLE) / CAST(v_tot AS DOUBLE), 6) AS share,
      |  round(CAST(v_cum AS DOUBLE) / CAST(v_tot AS DOUBLE), 6) AS cum_share
      |FROM c, t ORDER BY bucket""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val spend = tbl(s, dir, "orders").groupBy("o_custkey")
      .agg((sum(dec(col("o_totalprice"), 12, 2) * 100)).cast("long").as("cents"))
    Stats.lorenzBuckets(spend, col("cents"), col("o_custkey"), k = 10)
      .orderBy("bucket")
  }

  q("q_hhi_supplier",
    // Herfindahl-Hirschman revenue concentration across suppliers:
    // ×1e6 truncating shares against the exact cents total, HHI = Σ
    // share² — all integers
    """WITH g AS (SELECT l_suppkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * 100) AS BIGINT) AS gv FROM lineitem GROUP BY 1),
      |t AS (SELECT SUM(gv) AS t, COUNT(*) AS n_groups FROM g),
      |s AS (SELECT n_groups, gv * 1000000 // t AS share_fp FROM g, t)
      |SELECT CAST(n_groups AS BIGINT) AS n_groups,
      |  CAST(SUM(share_fp * share_fp) // 1000000 AS BIGINT) AS hhi_x1e6
      |FROM s GROUP BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val li = tbl(s, dir, "lineitem")
      .select(col("l_suppkey"), (dec(col("l_extendedprice"), 12, 2) * 100).as("c"))
    Stats.hhi(li, col("l_suppkey"), col("c"))
  }

  q("q_eval_mcnemar",
    // McNemar's paired comparison of two classifiers on the same docs:
    // discordant counts, accuracies, (b−c)²·1e6/(b+c) — exact integers
    """WITH p AS (SELECT lang = 'en' AS y,
      |  LEAST(999, n_chars % 500 + CASE WHEN lang = 'en' THEN 300 ELSE 100 END)
      |    >= 500 AS pa,
      |  n_chars % 3 = 0 AS pb FROM documents),
      |t AS (SELECT (pa = y) AS oka, (pb = y) AS okb FROM p),
      |a AS (SELECT COUNT(*) AS n,
      |  SUM(CASE WHEN oka THEN 1 ELSE 0 END) AS n_ok_a,
      |  SUM(CASE WHEN okb THEN 1 ELSE 0 END) AS n_ok_b,
      |  SUM(CASE WHEN oka AND NOT okb THEN 1 ELSE 0 END) AS b,
      |  SUM(CASE WHEN NOT oka AND okb THEN 1 ELSE 0 END) AS c FROM t)
      |SELECT CAST(n AS BIGINT) AS n, CAST(n_ok_a AS BIGINT) AS n_ok_a,
      |  CAST(n_ok_b AS BIGINT) AS n_ok_b, CAST(b AS BIGINT) AS b,
      |  CAST(c AS BIGINT) AS c,
      |  CAST(CASE WHEN b + c = 0 THEN 0
      |    ELSE (b - c) * (b - c) * 1000000 // (b + c) END AS BIGINT)
      |    AS mcnemar_x1e6 FROM a""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val d = tbl(s, dir, "documents")
    val pm = least(lit(999), col("n_chars") % 500
      + when(col("lang") === "en", 300).otherwise(100))
    Eval.mcnemar(d, col("lang") === "en", pm >= 500, col("n_chars") % 3 === 0)
  }

  q("q_assoc_rules",
    // association rules over co-bought part pairs: support, directional
    // confidence, symmetric lift — ×1e6 truncating fixed point against
    // exact counts, top-20 by (lift desc, pa, pb)
    """WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |no AS (SELECT COUNT(DISTINCT o) AS n_orders FROM ps),
      |item AS (SELECT p, COUNT(*) AS n_item FROM ps GROUP BY 1),
      |pairs AS (SELECT a.p AS pa, b.p AS pb, COUNT(*) AS n_pair FROM ps a
      |  JOIN ps b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2
      |  HAVING COUNT(*) >= 2),
      |s AS (SELECT pa, pb, n_pair, ia.n_item AS n_a, ib.n_item AS n_b
      |  FROM pairs JOIN item ia ON ia.p = pa JOIN item ib ON ib.p = pb)
      |SELECT pa, pb, CAST(n_pair AS BIGINT) AS n_pair,
      |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(n_pair * 1000000 // n_a AS BIGINT) AS conf_ab_x1e6,
      |  CAST(n_pair * 1000000 // n_b AS BIGINT) AS conf_ba_x1e6,
      |  CAST(n_pair * 1000000 * n_orders // (n_a * n_b) AS BIGINT) AS lift_x1e6
      |FROM s, no ORDER BY lift_x1e6 DESC, pa, pb LIMIT 20"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Basket.assocRules(tbl(s, dir, "lineitem"), "l_orderkey", "l_partkey",
      k = 20, minPairs = 2L)
  }

  q("text_pii_redact", {
    // DuckDB single-quoted literals pass backslashes through verbatim,
    // so the Java pattern strings embed unchanged
    val e = Pipeline.emailPattern
    val p = Pipeline.phonePattern
    s"""WITH p AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
       |  || '@mail.example.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$e')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '$p')) AS INT) AS n_phones,
       |  md5(regexp_replace(regexp_replace(t, '$e', '<EMAIL>', 'g'), '$p', '<PHONE>', 'g')) AS digest
       |FROM p ORDER BY doc_id""".stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    // PII scrub over a deterministically PII-enriched corpus (the raw
    // synthetic text has none): count + mask emails/phones, digest the
    // redacted text. RE2-compatible patterns — both engines agree.
    val pii = concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    tbl(s, dir, "documents")
      .select(col("doc_id"), pii.as("t"))
      .select(col("doc_id"),
        Pipeline.countPattern(col("t"), Pipeline.emailPattern).as("n_emails"),
        Pipeline.countPattern(col("t"), Pipeline.phonePattern).as("n_phones"),
        md5(Pipeline.redactPii(col("t"))).as("digest"))
      .orderBy("doc_id")
  }

  q("q_bloom_join",
    """SELECT o_orderpriority, COUNT(*) AS n, MIN(o_orderkey) AS min_key
      |FROM orders WHERE EXISTS (SELECT 1 FROM customer
      |  WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // bloom-prefiltered semi join: the fact table is cut map-side by a
    // broadcast bloom of the filtered dim keys before the exact confirm
    // join — result is exactly the semi join (false positives removed)
    val dim = tbl(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    Pipeline.bloomSemiJoin(tbl(s, dir, "orders"), dim, "o_custkey", "c_custkey",
        expectedDimRows = 50000L)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("min_key"))
      .orderBy("o_orderpriority")
  }

  q("text_token_histogram",
    s"""WITH t AS (SELECT CAST(len($toksSql) AS INT) AS n_tokens FROM documents)
       |SELECT LEAST(CAST(floor(n_tokens / 8.0) AS INT), 12) AS bin,
       |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
       |FROM t GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
    // token-length distribution (the pre-training length histogram):
    // one narrow kernel projection + one tiny aggregation
    tbl(s, dir, "documents")
      .select(size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
      .groupBy(least(floor(col("n_tokens") / 8).cast("int"), lit(12)).as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").cast("long").as("sum_tokens"))
      .orderBy("bin")
  }

  q("text_repetition",
    s"""WITH t AS (SELECT doc_id, $toksSql AS w FROM documents),
       |g AS (SELECT doc_id, w,
       |  list_transform(range(1, CASE WHEN len(w) >= 2 THEN len(w) ELSE 1 END, 1),
       |    i -> w[i] || ' ' || w[i+1]) AS g2,
       |  list_transform(range(1, CASE WHEN len(w) >= 3 THEN len(w) - 1 ELSE 1 END, 1),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS g3
       |  FROM t)
       |SELECT doc_id, CAST(len(g2) AS INT) AS n_bigrams,
       |  round(CASE WHEN len(g2) > 0 THEN CAST(list_max(list_transform(list_distinct(g2),
       |    gg -> len(list_filter(g2, x -> x = gg)))) AS DOUBLE) / len(g2)
       |    ELSE 0.0 END, 6) AS top_bigram_frac,
       |  round(CASE WHEN len(g3) > 0 THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
       |    ELSE 0.0 END, 6) AS dup_trigram_frac,
       |  round(CASE WHEN len(w) > 1 THEN CAST(len(list_filter(range(1, len(w), 1),
       |    i -> w[i] = w[i+1])) AS DOUBLE) / (len(w) - 1)
       |    ELSE 0.0 END, 6) AS adj_dup_frac
       |FROM g ORDER BY doc_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    // Gopher-style repetition/quality signals: a pure narrow projection
    // (per-document work only — no shuffle, scales with input splits)
    TextAnalysis.repetitionSignals(tbl(s, dir, "documents")).orderBy("doc_id")
  }

  q("text_gopher_rules",
    // Gopher quality GATES (Rae et al. §A1.1): per-document boolean rules
    // with every ratio in integer cross-multiplied form — no float to
    // drift — plus the conjunction; a pure narrow projection
    s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents),
       |m AS (SELECT doc_id, CAST(len(w) AS INT) AS n_words,
       |  list_sum(list_transform(w, t -> CAST(length(t) AS BIGINT))) AS sum_len,
       |  len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS n_alpha,
       |  len(list_filter(w, t -> t LIKE '#%' OR t LIKE '%...' OR t LIKE '%…')) AS n_symbol,
       |  len(list_filter(list_distinct(w),
       |    t -> t IN ('the','be','to','of','and','that','have','with'))) AS n_stop
       |  FROM w)
       |SELECT doc_id, n_words,
       |  (n_words BETWEEN 50 AND 100000) AS ok_words,
       |  (sum_len >= 3 * n_words AND sum_len <= 10 * n_words) AS ok_wlen,
       |  (10 * n_symbol <= n_words) AS ok_symbol,
       |  (10 * n_alpha >= 8 * n_words) AS ok_alpha,
       |  (n_stop >= 2) AS ok_stop,
       |  ((n_words BETWEEN 50 AND 100000)
       |    AND (sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
       |    AND (10 * n_symbol <= n_words)
       |    AND (10 * n_alpha >= 8 * n_words)
       |    AND (n_stop >= 2)) AS pass
       |FROM m ORDER BY doc_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.gopherRules(tbl(s, dir, "documents")).orderBy("doc_id")
  }

  q("text_normalize",
    // canonical normalization before dedup/tokenization: Unicode NFC +
    // root-locale lowercase + whitespace collapse as one compiled kernel
    // (Spark has no NFC built-in; native Expression per the preference
    // order, never a UDF); hash equality with DuckDB's nfc_normalize
    // proves byte-identical canonical forms across engines. The
    // whitespace class is explicit on both sides — Java trim and RE2 \s
    // disagree at the edges (see NormalizeText)
    """SELECT doc_id,
      |  regexp_replace(regexp_replace(lower(nfc_normalize(text)),
      |    '^[ \t\n\r\f\x0B]+|[ \t\n\r\f\x0B]+$', '', 'g'),
      |    '[ \t\n\r\f\x0B]+', ' ', 'g') AS norm
      |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.NormalizeText(col("text")).as("norm"))
      .orderBy("doc_id")
  }

  q("text_skipgrams",
    // word2vec-style (center, context) pair extraction at window ±2:
    // pair generation is a narrow higher-order transform (no self-join,
    // no positional explode); the only shuffle is the final pair count
    s"""WITH w AS (SELECT $toksSql AS w FROM documents),
       |fp AS (SELECT unnest(flatten(list_transform(range(1, len(w), 1), i ->
       |  list_transform(range(i+1, least(i+2, len(w))+1, 1), j -> [w[i], w[j]])))) AS p
       |  FROM w WHERE len(w) >= 2),
       |pairs AS (SELECT p[1] AS w1, p[2] AS w2 FROM fp
       |  UNION ALL SELECT p[2] AS w1, p[1] AS w2 FROM fp)
       |SELECT w1, w2, COUNT(*) AS n FROM pairs GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.skipGramPairs(tbl(s, dir, "documents"), window = 2)
      .orderBy("w1", "w2")
  }

  q("text_collocations",
    // collocations ranked by the ln-free PMI surrogate n_ab·T·10^6 div
    // (n_a·n_b) — integer-exact, same order as PMI; unigram counts are
    // vocabulary-sized (broadcast side), top-k is orderBy+limit
    s"""WITH w AS (SELECT $toksSql AS w FROM documents),
       |fp AS (SELECT unnest(flatten(list_transform(range(1, len(w), 1), i ->
       |  list_transform(range(i+1, least(i+2, len(w))+1, 1), j -> [w[i], w[j]])))) AS p
       |  FROM w WHERE len(w) >= 2),
       |pairs AS (SELECT p[1] AS w1, p[2] AS w2 FROM fp
       |  UNION ALL SELECT p[2] AS w1, p[1] AS w2 FROM fp),
       |pc AS (SELECT w1, w2, COUNT(*) AS n FROM pairs GROUP BY 1, 2
       |  HAVING COUNT(*) >= 5),
       |uni AS (SELECT tok, COUNT(*) AS cnt
       |  FROM (SELECT unnest(w) AS tok FROM w) GROUP BY 1),
       |tot AS (SELECT SUM(cnt) AS t FROM uni),
       |scored AS (SELECT pc.w1, pc.w2, pc.n,
       |  CAST(pc.n * t.t * 1000000 // (a.cnt * b.cnt) AS BIGINT) AS score_fp
       |  FROM pc JOIN uni a ON a.tok = pc.w1 JOIN uni b ON b.tok = pc.w2
       |  CROSS JOIN tot t)
       |SELECT CAST(rk AS INT) AS rk, w1, w2, n, score_fp FROM (
       |  SELECT *, ROW_NUMBER() OVER (ORDER BY score_fp DESC, w1, w2) AS rk
       |  FROM scored) WHERE rk <= 20 ORDER BY rk"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.collocationsTopK(tbl(s, dir, "documents"),
        window = 2, k = 20, minCount = 5)
      .orderBy("rk")
  }

  q("q_chunk_documents",
    """WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE doc_id < 100),
      |o AS (SELECT doc_id, text, n,
      |  unnest(range(0, greatest(((n - 1) // 96) * 96 + 1, 1), 96)) AS off FROM t)
      |SELECT doc_id, CAST(off // 96 AS INT) AS chunk_id, CAST(off AS INT) AS off,
      |  substr(text, CAST(off AS INT) + 1, 128) AS chunk
      |FROM o WHERE off < n ORDER BY doc_id, chunk_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // overlapping 128-char chunks on a 96 stride (33% overlap — the
    // RAG/embedding-ingest layout); narrow fan-out, no shuffle
    Pipeline.chunkDocuments(tbl(s, dir, "documents").filter(col("doc_id") < 100),
        chunkSize = 128, stride = 96)
      .orderBy("doc_id", "chunk_id")
  }

  q("q_truncate_tokens",
    s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents)
       |SELECT doc_id, array_to_string(w[1:32], ' ') AS text,
       |  CAST(len(w) AS INT) AS n_tok_orig, len(w) > 32 AS truncated
       |FROM w ORDER BY doc_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    // context-length guard: cap each doc at its first 32 tokens and
    // account for the dropped volume
    Pipeline.truncateTokens(tbl(s, dir, "documents"), maxTokens = 32)
      .select("doc_id", "text", "n_tok_orig", "truncated")
      .orderBy("doc_id")
  }

  q("q_pack_sequences",
    s"""WITH t AS (SELECT doc_id, CAST(len($toksSql) AS INT) AS n_tok,
       |  ${md5Hash60Sql("doc_id")} % 8 AS shard FROM documents),
       |c AS (SELECT doc_id, shard, n_tok,
       |  sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       |  CAST((cum - n_tok) // 2048 AS BIGINT) AS window_id,
       |  CAST((cum - n_tok) % 2048 AS BIGINT) AS off, n_tok
       |FROM c ORDER BY doc_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    // tokenize-and-pack plan: greedy concatenation into 2048-token
    // training windows, hash-sharded so the running sum parallelizes
    // (one shuffle; windows/offsets reuse the shard partitioning)
    Pipeline.packSequences(tbl(s, dir, "documents"), "doc_id",
        size(TextAnalysis.tokens(col("text"))), contextLen = 2048, shards = 8)
      .select("doc_id", "shard", "window_id", "off", "n_tok")
      .orderBy("doc_id")
  }

  q("q_zorder_layout", {
    def interleaveSql(x: String, y: String, bits: Int): String =
      (0 until bits).flatMap(i => Seq(
        s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
    val z = interleaveSql("CAST(o_custkey AS BIGINT)",
      "CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT)", 16)
    s"""WITH t AS (SELECT ($z) AS zval FROM orders)
       |SELECT CAST(zval >> 20 AS BIGINT) AS bucket, COUNT(*) AS n,
       |  CAST(MIN(zval) AS BIGINT) AS min_z, CAST(MAX(zval) AS BIGINT) AS max_z
       |FROM t GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    // Z-order layout key (customer × order-day): bucket stats prove the
    // Morton interleave bit-for-bit; writeZordered sorts by this key so
    // parquet footer min/max prune scans on EITHER dimension
    tbl(s, dir, "orders")
      .select(Bucketing.zorderKey(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date")), 16).as("zval"))
      .groupBy(shiftright(col("zval"), 20).as("bucket"))
      .agg(count(lit(1)).as("n"), min("zval").as("min_z"), max("zval").as("max_z"))
      .orderBy("bucket")
  }

  q("q_curate_pipeline",
    s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS w FROM documents
       |  WHERE (CASE
       |    WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |    WHEN regexp_matches(text, '[\\x{3040}-\\x{30ff}]') THEN 'ja'
       |    WHEN regexp_matches(text, '[\\x{0400}-\\x{04ff}]') THEN 'ru'
       |    WHEN regexp_matches(text, '[¡¿ñ]') THEN 'es'
       |    WHEN regexp_matches(text, '[äöüß]') THEN 'de'
       |    WHEN regexp_matches(text, '[çàâêîôûœ]') THEN 'fr'
       |    ELSE 'en' END) = 'en'),
       |s AS (SELECT doc_id, source, text,
       |  round((len(list_distinct(w))::DOUBLE / len(w)) * 0.4
       |    + least(1.0, len(w) / 100.0) * 0.3
       |    + (1 - len(list_filter(w, t -> t IN ('the', 'a')))::DOUBLE / len(w)) * 0.3,
       |  6) AS quality FROM t),
       |f AS (SELECT * FROM s WHERE quality >= 0.5),
       |d AS (SELECT doc_id, source, quality,
       |  MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep FROM f)
       |SELECT doc_id, source, quality FROM d
       |WHERE doc_id = keep AND ${md5Hash60Sql("doc_id")} % 2 = 0
       |ORDER BY doc_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    // the full curation funnel composed end to end: language filter →
    // quality threshold → exact dedup → deterministic 50% downsample.
    // Everything except the dedup's digest shuffle runs map-side in one
    // codegen stage over the scan.
    Pipeline.curate(tbl(s, dir, "documents"), lang = "en", minQuality = 0.5,
        sampleMod = 2, sampleKeep = 1)
      .select("doc_id", "source", "quality")
      .orderBy("doc_id")
  }

  q("q_corpus_pipeline", {
    // the FULL corpus pipeline as ONE oracle-backed query (r12; the
    // composition gate's correctness half — ProbeCorpusPipeline holds
    // the staged-equivalence + cost half at sf1/sf10): lang gate →
    // quality gate → near-dup MinHash dedup (exact regime: the oracle
    // replays exact LSH; the dispatcher default is regime-pinned
    // elsewhere) → 13-gram decontamination against the doc_id%997 eval
    // slice → 800-token budget per source in md5-hash order → pack into
    // 256-token windows over 4 md5 shards.
    val langCase = """(CASE
      |    WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
      |    WHEN regexp_matches(text, '[\x{3040}-\x{30ff}]') THEN 'ja'
      |    WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
      |    WHEN regexp_matches(text, '[¡¿ñ]') THEN 'es'
      |    WHEN regexp_matches(text, '[äöüß]') THEN 'de'
      |    WHEN regexp_matches(text, '[çàâêîôûœ]') THEN 'fr'
      |    ELSE 'en' END)""".stripMargin
    val qualityExpr = s"""round((len(list_distinct($toksSql))::DOUBLE / len($toksSql)) * 0.4
      |    + least(1.0, len($toksSql) / 100.0) * 0.3
      |    + (1 - len(list_filter($toksSql, t -> t IN ('the', 'a')))::DOUBLE / len($toksSql)) * 0.3,
      |  6)""".stripMargin
    val gateWhere = s"WHERE doc_id % 997 != 0 AND $langCase = 'en' AND $qualityExpr >= 0.5"
    s"""WITH RECURSIVE ${minhashPairsCtes(bands = 3, rows = 3, where = gateWhere)},
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION ALL SELECT b_id, a_id FROM pairs),
       |reach AS (SELECT src AS doc_id, src AS r FROM edges
       |  UNION SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
       |cl AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
       |f AS (SELECT doc_id, source, text, $qualityExpr AS quality,
       |  len($toksSql) AS n_tok FROM documents $gateWhere),
       |surv0 AS (SELECT * FROM f WHERE doc_id NOT IN
       |  (SELECT doc_id FROM cl WHERE cluster_id != doc_id)),
       |evg AS (SELECT DISTINCT unnest(${shinglesSqlN(13)}) AS g
       |  FROM documents WHERE doc_id % 997 = 0),
       |cont AS (SELECT DISTINCT sg.doc_id FROM
       |  (SELECT doc_id, unnest(${shinglesSqlN(13)}) AS g FROM surv0) sg
       |  JOIN evg USING (g)),
       |surv AS (SELECT * FROM surv0 WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
       |tb AS (SELECT doc_id, source, quality, n_tok,
       |  SUM(n_tok) OVER (PARTITION BY source
       |    ORDER BY ${md5Hash60Sql("doc_id")}, doc_id
       |    ROWS UNBOUNDED PRECEDING) AS cum_tok FROM surv),
       |sel AS (SELECT doc_id, source, quality, n_tok,
       |  ${md5Hash60Sql("doc_id")} % 4 AS shard FROM tb WHERE cum_tok <= 800),
       |pk AS (SELECT doc_id, source, quality, n_tok, shard,
       |  SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
       |    ROWS UNBOUNDED PRECEDING) AS cum FROM sel)
       |SELECT doc_id, source, quality, CAST(n_tok AS BIGINT) AS n_tok,
       |  CAST(shard AS BIGINT) AS shard,
       |  CAST((cum - n_tok) // 256 AS BIGINT) AS window_id,
       |  CAST((cum - n_tok) % 256 AS BIGINT) AS "off"
       |FROM pk ORDER BY doc_id""".stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val docs = tbl(s, dir, "documents")
    // REGIME PIN (ADVICE r12): this oracle replays EXACT LSH, so the
    // engine pins the pipeline's near-dup stage exact — the declared
    // SQL then holds at ANY corpus size, like the rest of the dedup_*
    // family. AutoBucket stays the library default for corpusPipeline.
    Pipeline.corpusPipeline(
        docs.filter(col("doc_id") % 997 =!= 0),
        docs.filter(col("doc_id") % 997 === 0),
        budgetTokens = 800L, contextLen = 256, shards = 4,
        dedupMaxBucket = Int.MaxValue)
      .orderBy("doc_id")
  }

  // ONE oracle + ONE body for the stream_sessionize pair (review r15):
  // the twin's whole contract is "identical oracle to the base — the
  // backend must be invisible in the result", and two verbatim copies
  // would let a future base-oracle fix silently strand the twin on the
  // stale oracle, passing individually while proving nothing.
  private val sessionizeOracleSql =
    """WITH g AS (SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
      |  FROM events WHERE user_id < 50
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, ts,
      |  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS session_id FROM g)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
      |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id"""
      .stripMargin.replace("\n", " ")

  private def runSessionize(s: SparkSession, dir: String, qname: String,
                            rocksDb: Boolean): DataFrame = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s.readStream.schema(tbl(s, dir, "events").schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val micros = src.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case _ => unix_micros(col("ts"))
    }
    val evs = src.filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"), micros.as("ts_micros"))
      .as[graft.streaming.Streams.SessEvent]
    def drain(): Unit = {
      val query = graft.streaming.Streams.sessionWindows(evs)
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      try query.processAllAvailable() finally query.stop()
    }
    withShufflePartitions(s, 4) {
      if (rocksDb) graft.streaming.Streams.withRocksDbState(s)(drain())
      else drain()
    }
    // session timezone is UTC, so LTZ micros render the same wall clock
    // as the oracle's naive timestamps once cast to NTZ
    s.table(qname)
      .select(col("user_id"), col("session_id"), col("n_events"),
        timestamp_micros(col("start_micros")).cast(TimestampNTZType).as("session_start"),
        timestamp_micros(col("end_micros")).cast(TimestampNTZType).as("session_end"))
      .orderBy("user_id", "session_id")
  }

  // oracle: the batch sessionization (q_sessionize) — the streaming
  // operator's single-batch output is provably identical
  q("stream_sessionize", sessionizeOracleSql) { (s, dir) =>
    runSessionize(s, dir, "graft_stream_sessionize", rocksDb = false)
  }

  // stream_sessionize under the RocksDB state store (VERDICT r14 #4):
  // flatMapGroupsWithState's per-user open-session record is exactly
  // the live state a 100 TB ingest holds for every active user at
  // once — the heap provider's OOM-by-construction regime
  // (ProbeStateScale: ~340 B/key, dead between 8M and 16M keys at
  // 4 GiB). Identical oracle to stream_sessionize: the backend must
  // be invisible in the result.
  q("stream_sessionize_rocksdb", sessionizeOracleSql) { (s, dir) =>
    runSessionize(s, dir, "graft_stream_sessionize_rocksdb", rocksDb = true)
  }

  q("q_funnel",
    """WITH t1 AS (SELECT user_id AS u, MIN(epoch_us(ts)) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (SELECT t1.u, MIN(epoch_us(e.ts)) AS t2 FROM events e JOIN t1 ON e.user_id = t1.u
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1 GROUP BY 1),
      |t3 AS (SELECT t2.u, MIN(epoch_us(e.ts)) AS t3 FROM events e JOIN t2 ON e.user_id = t2.u
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2 GROUP BY 1)
      |SELECT 1 AS step, 'view' AS step_name, (SELECT COUNT(*) FROM t1) AS n_users
      |UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM t2)
      |UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM t3)
      |ORDER BY step""".stripMargin.replace("\n", " ")) { (s, dir) =>
    // 3-step ordered funnel (view -> click -> purchase): every exchange
    // keys on user_id, so the partitioning is computed once and reused
    val steps = Seq("view", "click", "purchase")
    Funnel.conversions(Funnel.funnel(events(s, dir), steps), steps)
      .orderBy("step")
  }

  // ONE oracle + ONE body for the stream_interval_join pair (review
  // r15) — same rationale as the sessionize pair above.
  private val intervalJoinOracleSql =
    """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
      |  v.ts AS view_ts, c.ts AS click_ts
      |FROM events v JOIN events c ON c.user_id = v.user_id
      |  AND v.event_type = 'view' AND c.event_type = 'click'
      |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
      |WHERE v.user_id < 30
      |ORDER BY v.user_id, view_id, click_id"""
      .stripMargin.replace("\n", " ")

  private def runIntervalJoin(s: SparkSession, dir: String, qname: String,
                              rocksDb: Boolean): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = tbl(s, dir, "events").schema
    def src = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    def toTs: Column = schema("ts").dataType match {
      case LongType => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case _ => col("ts")
    }
    val views = src.filter(col("user_id") < 30 && col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), toTs.as("l_ts"))
    val clicks = src.filter(col("user_id") < 30 && col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        toTs.as("r_ts"))
    def drain(): Unit = {
      val query = graft.streaming.Streams
        .intervalJoin(views, clicks, "user_id", "c_user_id", "1 HOUR")
        .select(col("user_id"), col("view_id"), col("click_id"),
          col("l_ts").cast(TimestampNTZType).as("view_ts"),
          col("r_ts").cast(TimestampNTZType).as("click_ts"))
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      try query.processAllAvailable() finally query.stop()
    }
    withShufflePartitions(s, 4) {
      if (rocksDb) graft.streaming.Streams.withRocksDbState(s)(drain())
      else drain()
    }
    s.table(qname).orderBy("user_id", "view_id", "click_id")
  }

  // oracle: the batch range join — single-batch append output of a
  // watermarked stream-stream interval join is exactly the batch result
  q("stream_interval_join", intervalJoinOracleSql) { (s, dir) =>
    runIntervalJoin(s, dir, "graft_stream_interval_join", rocksDb = false)
  }

  // stream_interval_join under the RocksDB state store (VERDICT r14
  // #4): the stream-stream join buffers BOTH sides' in-horizon rows in
  // the state store — O(rate x horizon) live rows, the largest state
  // footprint of any operator here, so it is the first to need the
  // disk-backed store at ingest scale. Identical oracle to
  // stream_interval_join: the backend must be invisible in the result.
  q("stream_interval_join_rocksdb", intervalJoinOracleSql) { (s, dir) =>
    runIntervalJoin(s, dir, "graft_stream_interval_join_rocksdb",
      rocksDb = true)
  }

  q("stream_interval_left_outer",
    // oracle: the batch LEFT range join. A streaming left-outer join only
    // emits an unmatched left row (NULL right side) once the watermark
    // passes l_ts + window + delay, from a LATER micro-batch — so the
    // bounded source is drained through a landing dir in three runs: the
    // real data, then two sentinel batches that push the watermark past
    // every real row's join window (checkpointed restarts carry the state)
    """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
      |  v.ts AS view_ts, c.ts AS click_ts
      |FROM events v LEFT JOIN events c ON c.user_id = v.user_id
      |  AND c.event_type = 'click' AND c.ts >= v.ts
      |  AND c.ts <= v.ts + INTERVAL 1 HOUR
      |WHERE v.event_type = 'view' AND v.user_id < 30
      |ORDER BY v.user_id, view_id, click_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    import s.implicits._
    val ev = events(s, dir)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast(TimestampType).as("ts"))
    val root = java.nio.file.Files.createTempDirectory("graft_louter")
    // the fabricated input (data + sentinel batches) is reused across
    // bench iterations; the sink/checkpoint dirs must stay per-run
    val in = cachedLanding(s"louter:$dir") { d =>
      val maxTs = ev.agg(max("ts")).head.getTimestamp(0)
      def sentinel(batch: String, offsetDays: Int): Unit = {
        val ts = new java.sql.Timestamp(maxTs.getTime + offsetDays * 86400000L)
        Seq((-1L, 999999L, "view", ts), (-2L, 999999L, "click", ts))
          .toDF("event_id", "user_id", "event_type", "ts")
          .coalesce(1) // one file -> exactly one micro-batch per sentinel
          .write.parquet(s"$d/$batch")
      }
      // ev is multi-file; write it as ONE file so batch 1 = all real
      // data. The landing keeps only the oracle's user_id < 30 slice —
      // the stream re-applies the same predicate, so this is purely a
      // smaller fabricated input, not a semantic change.
      ev.filter(col("user_id") < 30).coalesce(1).write.parquet(s"$d/b1")
      // ONE sentinel suffices in the single-run variant: the batch after
      // it re-reads no files but applies the advanced watermark (Spark's
      // no-data micro-batch), evicting every real left row and emitting
      // its NULL-padded result there
      sentinel("b2", 3)
    }
    val ckpt = root.resolve("ckpt").toString
    def run(): Unit = {
      // data + sentinel consumed in ONE trigger: the watermark computed
      // at the end of batch 0 (from the sentinel's max event time) is
      // applied by the following no-data micro-batch, which evicts every
      // real left row and emits its NULL-padded result — two micro-
      // batches total. The multi-batch variant of the same semantics
      // (watermark advancing across data batches) is proven in
      // StreamingSpec's restart test.
      // ONE file-stream source shared by both join branches (a streaming
      // self-join): halves the per-batch source listing + offset WAL
      // versus two independent sources over the same dir
      val src = s.readStream.schema(ev.schema)
        .option("recursiveFileLookup", "true").parquet(in)
      // push the oracle's user_id < 30 into BOTH stream sides (sound for
      // a left-outer equi-key join: left rows outside the filter aren't
      // wanted, right rows outside it can't equi-match a kept left row) —
      // join state holds ~0.2% of the events instead of all of them. The
      // sentinel user (999999) must survive the filter: its rows are
      // what advance the watermark past the real data's join windows.
      val keep = col("user_id") < 30 || col("user_id") === 999999L
      val views = src.filter(keep && col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("l_ts"))
      val clicks = src.filter(keep && col("event_type") === "click")
        .select(col("user_id").as("c_user_id"),
          col("event_id").as("click_id"), col("ts").as("r_ts"))
      // memory sink: skips the FileStreamSink's per-batch file commit +
      // _spark_metadata manifest — the result is ~500 rows
      val query = graft.streaming.Streams
        .intervalJoinLeftOuter(views, clicks, "user_id", "c_user_id", "1 HOUR")
        .select(col("user_id"), col("view_id"), col("click_id"),
          col("l_ts").as("view_ts"), col("r_ts").as("click_ts"))
        .writeStream.format("memory").queryName("graft_stream_louter")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try query.processAllAvailable() finally query.stop()
    }
    // the pushed user_id filter leaves ~30 users of state: one shuffle
    // partition means one set of join state stores per micro-batch
    // instead of four, and stream-stream joins pay 4 stores per side
    // per partition per batch
    withShufflePartitions(s, 1) { run() }
    s.table("graft_stream_louter").filter(col("user_id") < 30)
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts").cast(TimestampNTZType).as("view_ts"),
        col("click_ts").cast(TimestampNTZType).as("click_ts"))
      .orderBy("user_id", "view_id", "click_id")
  }

  q("stream_token_counts",
    // oracle: the batch token count — a complete-mode streaming
    // aggregation over one bounded batch is exactly the batch groupBy
    s"""WITH toks AS (SELECT doc_id, $toksSql AS w FROM documents WHERE doc_id < 100)
       |SELECT tok, COUNT(*) AS n FROM (SELECT unnest(w) AS tok FROM toks)
       |GROUP BY tok ORDER BY tok""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val src = s.readStream.schema(tbl(s, dir, "documents").schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val counts = src.filter(col("doc_id") < 100)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
    val qname = "graft_stream_tokens"
    // stateful streaming creates one state store per shuffle partition;
    // 4 covers this cardinality and cuts per-batch store overhead 8x
    withShufflePartitions(s, 4) {
      val query = counts.writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
      try query.processAllAvailable() finally query.stop()
    }
    s.table(qname).orderBy("tok")
  }

  // ONE body for the stream_quantiles pair (review r15; the oracle was
  // already the shared quantileSketchSql)
  private def runStreamQuantiles(s: SparkSession, dir: String, qname: String,
                                 rocksDb: Boolean): DataFrame = {
    import s.implicits._
    val src = s.readStream.schema(tbl(s, dir, "events").schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val rows = src.select(col("event_type"), col("event_id"),
        col("value").cast("double").as("value"))
      .as[graft.streaming.Streams.QRow]
    def drain(): Unit = {
      val query = graft.streaming.Streams.quantileState(rows, k = 64)
        .writeStream.format("memory").queryName(qname)
        .outputMode("update").start()
      try query.processAllAvailable() finally query.stop()
    }
    withShufflePartitions(s, 4) {
      if (rocksDb) graft.streaming.Streams.withRocksDbState(s)(drain())
      else drain()
    }
    s.table(qname).orderBy("event_type")
  }

  // the quantile sketch as STREAMING STATE: mergeability (k smallest
  // of a union = k smallest of merged k-smallest sets) is what makes
  // the per-batch state fold correct — O(k) state per key forever, and
  // a bounded single batch reproduces the batch sketch bit-for-bit
  q("stream_quantiles", quantileSketchSql) { (s, dir) =>
    runStreamQuantiles(s, dir, "graft_stream_quantiles", rocksDb = false)
  }

  // stream_quantiles under the RocksDB state store (VERDICT r14 #4):
  // mapGroupsWithState's O(k)-per-key sketch state is small per key
  // but the KEY COUNT is unbounded (per-entity production keys), so
  // the backend question is the same capacity question as dedup.
  // Identical oracle to stream_quantiles: the backend must be
  // invisible in the result — the sketch fold's bit-for-bit
  // determinism (md5 bottom-k, exact tie order) survives the state
  // serialization round-trip through RocksDB or it is a defect.
  q("stream_quantiles_rocksdb", quantileSketchSql) { (s, dir) =>
    runStreamQuantiles(s, dir, "graft_stream_quantiles_rocksdb",
      rocksDb = true)
  }

  q("stream_funnel",
    // oracle: the batch 3-step funnel per user — the O(1)-state streaming
    // funnel over one sorted bounded batch is exactly the batch result
    """WITH t1 AS (SELECT user_id AS u, MIN(epoch_us(ts)) AS t1 FROM events
      |  WHERE event_type = 'view' AND user_id < 50 GROUP BY 1),
      |t2 AS (SELECT t1.u, MIN(epoch_us(e.ts)) AS t2 FROM events e JOIN t1 ON e.user_id = t1.u
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1 GROUP BY 1),
      |t3 AS (SELECT t2.u, MIN(epoch_us(e.ts)) AS t3 FROM events e JOIN t2 ON e.user_id = t2.u
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2 GROUP BY 1)
      |SELECT t1.u AS user_id, t1.t1, t2.t2, t3.t3 FROM t1
      |LEFT JOIN t2 ON t2.u = t1.u LEFT JOIN t3 ON t3.u = t1.u
      |ORDER BY user_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s.readStream.schema(tbl(s, dir, "events").schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val micros = src.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case _ => unix_micros(col("ts"))
    }
    val evs = src.filter(col("user_id") < 50)
      .select(col("user_id"), col("event_type"), micros.as("ts_micros"))
      .as[graft.streaming.Streams.FunnelEvent]
    val qname = "graft_stream_funnel"
    withShufflePartitions(s, 4) {
      val query = graft.streaming.Streams
        .funnelSteps(evs, Seq("view", "click", "purchase"))
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      try query.processAllAvailable() finally query.stop()
    }
    s.table(qname).orderBy("user_id")
  }

  q("stream_cms_cells", {
    def hp(r: String, tok: String) =
      s"('0x' || substr(md5(CAST($r AS VARCHAR) || '|' || $tok), 1, 15))::BIGINT % 256"
    // streaming heavy-hitter sketch: the CMS grid aggregates incrementally
    // (complete mode); a bounded single batch equals the batch sketch.
    // The streaming state is the <=1024-cell grid, never the vocabulary.
    s"""WITH toks AS (SELECT unnest($toksSql) AS tok FROM documents),
       |cells AS (SELECT r, ${hp("r", "tok")} AS bucket, COUNT(*) AS c
       |  FROM toks CROSS JOIN (SELECT unnest(range(4)) AS r) GROUP BY 1, 2)
       |SELECT r, bucket, c FROM cells ORDER BY r, bucket"""
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val src = s.readStream.schema(tbl(s, dir, "documents").schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    // spread the tokenize (r17, guide §2.5): the streaming parquet source
    // reads the single corpus file as ONE task (no AQE in streams), so
    // the whole tokenize+explode kernel serialized there; one explicit
    // id-keyed exchange of (doc_id, text) fans it to session width
    // before the CPU. The ≤1024-cell partial aggregate still collapses
    // map-side, so the stateful shuffle below is unchanged.
    val fanned = src.select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism, xxhash64(col("doc_id")))
    val cells = Sketch.cmsCells(
      fanned.select(explode(TextAnalysis.tokens(col("text"))).as("tok")), "tok")
    val qname = "graft_stream_cms"
    // ≤1024 grid cells: 4 state stores are plenty (see stream_token_counts)
    withShufflePartitions(s, 4) {
      val query = cells.writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
      try query.processAllAvailable() finally query.stop()
    }
    s.table(qname).orderBy("r", "bucket")
  }

  q("stream_hll", {
    // streaming cardinality sketch: HLL registers aggregate incrementally
    // (register max is idempotent + order-free, so no distinct() is
    // needed upstream); the streaming state is the ≤ sources×64 register
    // grid, never the vocabulary — the cardinality member of the
    // streaming sketch family (cms = frequency, quantiles = distribution)
    s"""WITH tk0 AS (SELECT source, unnest($toksSql) AS tok FROM documents),
       |hh AS (SELECT DISTINCT source, ${md5Hash60Sql("tok")} AS h FROM tk0),
       |r AS (SELECT source, h % 64 AS j, h // 64 AS w FROM hh),
       |rr AS (SELECT source, j,
       |  CAST(MAX(55 - length(trim(LEADING '0' FROM bin(w)))) AS INT) AS mj
       |  FROM r GROUP BY 1, 2)
       |SELECT source, j, mj FROM rr ORDER BY source, j"""
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val src = s.readStream.schema(tbl(s, dir, "documents").schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    // same one-task-tokenize spread as stream_cms_cells (r17, §2.5)
    val fanned = src.select(col("doc_id"), col("source"), col("text"))
      .repartition(s.sparkContext.defaultParallelism, xxhash64(col("doc_id")))
    val regs = Sketch.hllRegisters(
      fanned.select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok")),
      "source", "tok", m = 64)
    val qname = "graft_stream_hll"
    // ≤ sources×64 register cells: 4 state stores are plenty
    withShufflePartitions(s, 4) {
      val query = regs.writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
      try query.processAllAvailable() finally query.stop()
    }
    s.table(qname).orderBy("source", "j")
  }

  q("stream_dedup",
    // ingest-time exact dedup (dropDuplicatesWithinWatermark): the corpus
    // lands TWICE (the re-ingest/replay scenario) and the stream must
    // emit each digest once — the oracle is the distinct digest set of
    // the corpus landed once. Output is the digest, so the result is
    // deterministic no matter which physical copy survives.
    "SELECT md5(text) AS digest FROM documents GROUP BY 1 ORDER BY 1") { (s, dir) =>
    val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
    val landing = cachedLanding(s"dedup:$dir") { d =>
      docs.write.mode("append").parquet(d)
      docs.write.mode("append").parquet(d) // the replayed batch
    }
    // +1 day: Spark clamps the watermark at epoch 0, so an event AT the
    // epoch (doc_id 0) would be classified late and silently dropped;
    // mod 1800 bounds the ts SPAN at 30 min — half the 1 h horizon at
    // ANY corpus size, so no replayed copy can ever be late even if the
    // files split across micro-batches
    val src = s.readStream.schema(docs.schema).parquet(landing)
      .withColumn("ts",
        timestamp_micros((lit(86400L) + col("doc_id") % 1800L) * 1000000L))
    val qname = "graft_stream_dedup"
    // digest-keyed dedup state: 4 stores cover it (see stream_token_counts)
    withShufflePartitions(s, 4) {
      val query = graft.streaming.Streams.dedupStream(src, "text", "ts")
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      try query.processAllAvailable() finally query.stop()
    }
    s.table(qname).select(md5(col("text")).as("digest")).orderBy("digest")
  }

  q("stream_dedup_rocksdb",
    // stream_dedup's semantics under the RocksDB state store — the
    // backend a 100 TB ingest actually runs: the default heap provider
    // holds every live digest in executor memory, an OOM by construction
    // at billions of in-horizon keys, while RocksDB keeps the digest set
    // on executor-local disk behind a bounded block cache with
    // changelog (delta-only) checkpoint uploads. Identical oracle to
    // stream_dedup: the state backend must be invisible in the result.
    "SELECT md5(text) AS digest FROM documents GROUP BY 1 ORDER BY 1") { (s, dir) =>
    val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
    val landing = cachedLanding(s"dedup:$dir") { d =>
      docs.write.mode("append").parquet(d)
      docs.write.mode("append").parquet(d) // the replayed batch
    }
    // same epoch-clamp/span-bound ts construction as stream_dedup
    val src = s.readStream.schema(docs.schema).parquet(landing)
      .withColumn("ts",
        timestamp_micros((lit(86400L) + col("doc_id") % 1800L) * 1000000L))
    val qname = "graft_stream_dedup_rocksdb"
    withShufflePartitions(s, 4) {
      graft.streaming.Streams.withRocksDbState(s) {
        val query = graft.streaming.Streams.dedupStream(src, "text", "ts")
          .writeStream.format("memory").queryName(qname)
          .outputMode("append").start()
        try query.processAllAvailable() finally query.stop()
      }
    }
    s.table(qname).select(md5(col("text")).as("digest")).orderBy("digest")
  }

  // ===========================================================================
  // Rows-only queries (no SQL-expressible oracle): mocker, LSH-ANN,
  // multimodal plumbing.
  // ===========================================================================

  q("dedup_cluster",
    // end-to-end dedup: MinHash-LSH pairs -> connected components ->
    // (doc, canonical keeper = min reachable doc_id). The oracle computes
    // the same families via a recursive transitive closure over the
    // oracle-side pair graph.
    s"""WITH RECURSIVE ${minhashPairsCtes(bands = 3, rows = 3)},
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION ALL SELECT b_id, a_id FROM pairs),
       |reach AS (SELECT src AS doc_id, src AS r FROM edges
       |  UNION SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id)
       |SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val pairs = Dedup.minhashLsh(tbl(s, dir, "documents"), "text", "doc_id",
      maxBucket = Int.MaxValue) // exact-regime pin (see dedup_minhash_lsh)
    Dedup.clusterPairs(pairs).orderBy("doc_id")
  }

  q("dedup_survivor_weights",
    // dedup with multiplicity preserved: each cluster keeper carries its
    // family size as a weight — the "keep one copy, reweight the loss"
    // form of dedup a training pipeline uses instead of discarding
    // duplicate mass entirely
    s"""WITH RECURSIVE ${minhashPairsCtes(bands = 3, rows = 3)},
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION ALL SELECT b_id, a_id FROM pairs),
       |reach AS (SELECT src AS doc_id, src AS r FROM edges
       |  UNION SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
       |cl AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id)
       |SELECT cluster_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS weight
       |FROM cl GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY 1"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val pairs = Dedup.minhashLsh(tbl(s, dir, "documents"), "text", "doc_id",
      maxBucket = Int.MaxValue) // exact-regime pin (see dedup_minhash_lsh)
    Dedup.clusterPairs(pairs)
      .groupBy("cluster_id").agg(count(lit(1)).as("weight"))
      .filter(col("weight") > 1)
      .select(col("cluster_id").as("doc_id"), col("weight"))
      .orderBy("doc_id")
  }

  q("dedup_survivors",
    // the dedup MATERIALIZATION: everything dedup_cluster diagnoses,
    // then actually dropped — survivors (cluster keepers + untouched
    // docs) summarized per source
    s"""WITH RECURSIVE ${minhashPairsCtes(bands = 3, rows = 3)},
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION ALL SELECT b_id, a_id FROM pairs),
       |reach AS (SELECT src AS doc_id, src AS r FROM edges
       |  UNION SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
       |cl AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
       |dropped AS (SELECT doc_id FROM cl WHERE cluster_id != doc_id)
       |SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
       |GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Dedup.dedupByMinhash(tbl(s, dir, "documents"), "text", "doc_id",
        maxBucket = Int.MaxValue) // exact-regime pin (see dedup_minhash_lsh)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source")
  }

  q("dedup_priority_survivors",
    // dedup with a CURATION POLICY: the cluster keeper is the copy from
    // the most-preferred source (higher srcN wins here), not min-id —
    // how mirror/re-crawl corpora keep the curated copy. Keeper election
    // is an associative min(struct(prio, id)) per cluster.
    s"""WITH RECURSIVE ${minhashPairsCtes(bands = 3, rows = 3)},
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION ALL SELECT b_id, a_id FROM pairs),
       |reach AS (SELECT src AS doc_id, src AS r FROM edges
       |  UNION SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
       |cl AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
       |prio AS (SELECT cl.doc_id, cl.cluster_id,
       |    -CAST(substr(d.source, 4, 2) AS INT) AS p
       |  FROM cl JOIN documents d ON cl.doc_id = d.doc_id),
       |keep AS (SELECT cluster_id, doc_id AS keeper_id FROM
       |  (SELECT cluster_id, doc_id,
       |     row_number() OVER (PARTITION BY cluster_id ORDER BY p, doc_id) AS rn
       |   FROM prio) WHERE rn = 1),
       |dropped AS (SELECT prio.doc_id FROM prio JOIN keep USING (cluster_id)
       |  WHERE prio.doc_id != keep.keeper_id)
       |SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
       |GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val docs = tbl(s, dir, "documents")
    Dedup.dedupByMinhashPriority(docs, "text", "doc_id",
        -substring(col("source"), 4, 2).cast("int"),
        maxBucket = Int.MaxValue) // exact-regime pin (see dedup_minhash_lsh)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source")
  }

  q("mock_generate",
    // Generation is random but its CONTRACT is not: row count, per-dtype
    // value ranges (Mocker ±1e6/±1e9, reference lib.rs:34-39), name-list
    // membership, and zero nulls hold for every seed — so the invariant
    // table is a constant the oracle states directly. Any generator drift
    // out of the reference's ranges breaks the match.
    """SELECT CAST(1000 AS BIGINT) AS n_rows, CAST(1000 AS BIGINT) AS n_id_in_range,
      |  CAST(1000 AS BIGINT) AS n_name_in_list, CAST(1000 AS BIGINT) AS n_score_in_range,
      |  CAST(1000 AS BIGINT) AS n_active_set, CAST(0 AS BIGINT) AS n_nulls"""
      .stripMargin.replace("\n", " ")) { (s, _) =>
    val schema = FixedSchema(name = "bench", version = 1, columns = Seq(
      FixedColumn("id", 0, 10, FlfType.Int64T, Alignment.Right, '0', isNullable = false),
      FixedColumn("name", 10, 16, FlfType.Utf8T, Alignment.Left, ' ', isNullable = true),
      FixedColumn("score", 26, 14, FlfType.Float32T, Alignment.Right, ' ', isNullable = true),
      FixedColumn("active", 40, 6, FlfType.BooleanT, Alignment.Left, ' ', isNullable = true)))
    Mocker.mock(s, schema, 1000, seed = 42).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("id").between(-1000000000L, 1000000000L), 1L).otherwise(0L))
        .as("n_id_in_range"),
      sum(when(col("name").isin(Mocker.firstNames: _*), 1L).otherwise(0L))
        .as("n_name_in_list"),
      sum(when(col("score").between(-1e6f, 1e6f), 1L).otherwise(0L))
        .as("n_score_in_range"),
      sum(when(col("active").isNotNull, 1L).otherwise(0L)).as("n_active_set"),
      sum(when(col("id").isNull || col("name").isNull || col("score").isNull ||
        col("active").isNull, 1L).otherwise(0L)).as("n_nulls"))
  }

  /** The seeded hyperplanes embed as exact double literals: the Spark
    * kernel computes (double)vec[i] * (double)plane[i], and
    * Double.toString round-trips through DuckDB's decimal parser to the
    * identical double, so bucket bits (and therefore candidate sets)
    * agree bit-for-bit.
    */
  private def lshBucketSql(dim: Int, planes: Int): String =
    Similarity.hyperplanes(dim, planes).zipWithIndex
      .map { case (plane, p) =>
        val lit = plane.map(f => java.lang.Double.toString(f.toDouble))
          .mkString("[", ",", "]")
        s"(CASE WHEN list_sum(list_transform(range(1, ${dim + 1}), " +
          s"i -> CAST(embedding[i] AS DOUBLE) * ($lit)[i])) >= 0 " +
          s"THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")

  q("knn_cosine_lsh", {
    val bucketExpr = lshBucketSql(dim = 64, planes = 4)
    s"""WITH e AS (SELECT vec_id, embedding,
       |  sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
       |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm,
       |  $bucketExpr AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_norm, bucket
       |  FROM e WHERE vec_id < 10),
       |c AS (SELECT vec_id AS n_id, embedding AS n_vec, nrm AS n_norm, bucket FROM e),
       |s AS (SELECT q_id, n_id,
       |  round(list_sum(list_transform(range(1, len(q_vec) + 1),
       |    i -> CAST(q_vec[i] AS DOUBLE) * CAST(n_vec[i] AS DOUBLE))) / (q_norm * n_norm), 6) AS cos
       |  FROM q JOIN c USING (bucket) WHERE q_id != n_id),
       |r AS (SELECT q_id, n_id, cos,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM s)
       |SELECT q_id, n_id, cos FROM r WHERE rn <= 5 ORDER BY q_id, n_id"""
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val emb = tbl(s, dir, "embeddings")
    Similarity.lshKnn(emb, emb.filter(col("vec_id") < 10), k = 5, dim = 64, planes = 4)
      .orderBy("q_id", "n_id")
  }

  q("stream_embedding_dedup", {
    // ingest-time near-dup VECTOR filter: embeddings land twice (replay)
    // and the stream keeps one survivor per LSH bucket within the
    // watermark. The emitted BUCKET set is arrival-order-invariant (which
    // physical row survives is not), so the oracle is the distinct bucket
    // set of the corpus landed once, with the plan-time literal planes
    // replayed in SQL.
    val bucketExpr = lshBucketSql(dim = 64, planes = 4)
    s"""WITH e AS (SELECT CAST($bucketExpr AS BIGINT) AS bucket FROM embeddings)
       |SELECT bucket FROM e GROUP BY 1 ORDER BY 1"""
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val emb = tbl(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val landing = cachedLanding(s"embdedup:$dir") { d =>
      emb.write.mode("append").parquet(d)
      emb.write.mode("append").parquet(d) // the replayed batch
    }
    // +1 day / mod 1800: same epoch-clamp + span bounds as stream_dedup
    val src = s.readStream.schema(emb.schema).parquet(landing)
      .withColumn("ts",
        timestamp_micros((lit(86400L) + col("vec_id") % 1800L) * 1000000L))
    val qname = "graft_stream_embedding_dedup"
    withShufflePartitions(s, 4) {
      val query = graft.streaming.Streams
        .dedupVectorStream(src, "embedding", "ts", dim = 64, planes = 4)
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      try query.processAllAvailable() finally query.stop()
    }
    // no distinct(): the span (30 min) is inside the horizon (1 h), so the
    // stream itself must emit each bucket exactly once — a dedup failure
    // should fail the oracle hash, not be masked here
    s.table(qname).select(col("__bucket").as("bucket")).orderBy("bucket")
  }

  q("stream_events_hourly",
    // A real Structured Streaming execution: file-source readStream over
    // the events parquet, watermarked tumbling-window aggregation,
    // memory sink drained to completion. The oracle is the IDENTICAL SQL
    // as the batch q_events_hourly — checking the core streaming claim
    // (batch and streaming window aggregation share semantics) against
    // DuckDB instead of merely asserting it.
    """SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s.readStream.schema(tbl(s, dir, "events").schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    // watermarks require TIMESTAMP (LTZ) event time; session TZ is UTC so
    // the wall-clock values match the batch NTZ variant
    val normalized = src.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => src.withColumn("ts", col("ts").cast(TimestampType))
    }
    val qname = "graft_stream_hourly"
    // stateful streaming creates one state store per shuffle partition;
    // 4 is plenty for this key cardinality and cuts per-batch overhead
    withShufflePartitions(s, 4) {
      val query = graft.streaming.Streams.windowedCounts(normalized)
        .writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
      try query.processAllAvailable() finally query.stop()
    }
    // watermarks forced LTZ event time; session TZ is UTC, so casting back
    // to NTZ restores the exact wall-clock values the batch oracle emits
    s.table(qname)
      .withColumn("h", col("h").cast(TimestampNTZType))
      .orderBy("h", "event_type")
  }

  q("multimodal_decode_real",
    // The pixel generator is a pure integer hash of (id, x, y) and PNG is
    // lossless, so the oracle REPLAYS the generator in SQL: any byte the
    // encoder writes or the decoder reads differently breaks the match.
    // Means round via floor(x*1e6+0.5)/1e6 — pure IEEE ops, bit-identical
    // across engines (Spark round() and DuckDB round() disagree on exact
    // decimal midpoints, which s/128 grids do hit).
    """WITH ids AS (SELECT doc_id AS id, CAST(8 + doc_id % 9 AS INT) AS w,
      |    CAST(8 + doc_id % 7 AS INT) AS h
      |  FROM documents WHERE doc_id < 50),
      |px AS (SELECT id, w, h,
      |    ((id * 1315423911 + gx.x * 2654435761 + gy.y * 40503) & 16777215) AS v
      |  FROM ids, (SELECT unnest(range(16)) AS x) gx, (SELECT unnest(range(14)) AS y) gy
      |  WHERE gx.x < w AND gy.y < h)
      |SELECT id, w AS width, h AS height,
      |  floor(SUM((v >> 16) & 255) / (w * h) * 1e6 + 0.5) / 1e6 AS mean_r,
      |  floor(SUM((v >> 8) & 255) / (w * h) * 1e6 + 0.5) / 1e6 AS mean_g,
      |  floor(SUM(v & 255) / (w * h) * 1e6 + 0.5) / 1e6 AS mean_b
      |FROM px GROUP BY id, w, h ORDER BY id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // REAL codec path: synthesize actual PNGs (deterministic pixels),
    // decode them with the JDK's ImageIO inside mapPartitions, and report
    // per-channel means — narrow plan, one codec call per row, the shape
    // of a 100 TB image-quality filtering pass
    val ids = tbl(s, dir, "documents").filter(col("doc_id") < 50).select("doc_id")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val media = ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        org.apache.spark.sql.Row(id, Multimodal.syntheticPng(
          id, 8 + (id % 9).toInt, 8 + (id % 7).toInt))
      }
    }(enc)
    Multimodal.decodeImageStats(media, "doc_id")
      .select(col("id"), col("width"), col("height"),
        (floor(col("mean_r") * 1e6 + 0.5) / 1e6).as("mean_r"),
        (floor(col("mean_g") * 1e6 + 0.5) / 1e6).as("mean_g"),
        (floor(col("mean_b") * 1e6 + 0.5) / 1e6).as("mean_b"))
      .orderBy("id")
  }

  q("multimodal_audio_real",
    // PCM samples are a pure integer hash of (id, i) and WAV is lossless
    // 16-bit PCM, so the oracle replays the generator: duration/peak are
    // integer-exact, RMS is one correctly-rounded sqrt on both engines,
    // then the same floor-round as the image means.
    """WITH ids AS (SELECT doc_id AS id, CAST(400 + doc_id % 100 AS INT) AS n
      |  FROM documents WHERE doc_id < 50),
      |smp AS (SELECT id, n,
      |    (((id * 1315423911 + g.i * 2654435761) & 65535) - 32768) AS v
      |  FROM ids, (SELECT unnest(range(500)) AS i) g WHERE g.i < n)
      |SELECT id, 8000 AS sample_rate, n AS n_samples,
      |  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
      |  CAST(MAX(abs(v)) AS INT) AS peak,
      |  floor(sqrt(SUM(v * v) / n) * 1e6 + 0.5) / 1e6 AS rms
      |FROM smp GROUP BY id, n ORDER BY id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // REAL audio path: synthesize actual RIFF/WAVE files (deterministic
    // 16-bit PCM), decode with the JDK's AudioSystem, report duration /
    // peak / RMS — integer sums, one sqrt
    val ids = tbl(s, dir, "documents").filter(col("doc_id") < 50).select("doc_id")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val media = ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        org.apache.spark.sql.Row(id, Multimodal.syntheticWav(
          id, 8000, 400 + (id % 100).toInt))
      }
    }(enc)
    Multimodal.decodeAudioStats(media, "doc_id")
      .select(col("id"), col("sample_rate"), col("n_samples"),
        col("duration_ms"), col("peak"),
        (floor(col("rms") * 1e6 + 0.5) / 1e6).as("rms"))
      .orderBy("id")
  }

  q("multimodal_phash_dedup",
    // The image families are doc_id % 40 by construction, so the expected
    // keeper/dup-count table is pure SQL — but the Spark side only gets
    // there through the REAL pipeline (PNG decode → aHash64 → banded
    // hamming join): any codec or hash instability, or a cross-family
    // 64-bit hash collision, breaks the match.
    """WITH fam AS (SELECT doc_id,
      |    MIN(doc_id) OVER (PARTITION BY doc_id % 40) AS keep_id
      |  FROM documents WHERE doc_id < 500)
      |SELECT keep_id, COUNT(*) AS n_dups FROM fam
      |WHERE doc_id != keep_id GROUP BY 1 ORDER BY 1"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // perceptual near-dup image families: 500 REAL PNGs drawn from 40
    // distinct pixel seeds (doc_id % 40) — decode + aHash per row, banded
    // hamming self-join, connected families via the min-id keeper
    import org.apache.spark.sql.Row
    val ids = tbl(s, dir, "documents").filter(col("doc_id") < 500).select("doc_id")
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
    val media = ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, Multimodal.syntheticPng(id % 40, 32, 24))
      }
    }(enc)
    val pairs = Multimodal.phashPairs(media, "doc_id", maxHamming = 0)
    // keeper of each duplicate = the smallest id it collides with;
    // family size = keeper's duplicate count + itself
    pairs.groupBy("b_id").agg(min("a_id").as("keep_id"))
      .groupBy("keep_id").agg(count(lit(1)).as("n_dups"))
      .orderBy("keep_id")
  }

  q("multimodal_features",
    // The feature stub accumulates byte/255 per slot in FLOAT — IEEE
    // single-precision ops are deterministic, so DuckDB replays the exact
    // same add sequence by casting to FLOAT after every step (verified
    // bit-equal); the checksum then sums the 16 floats in DOUBLE in slot
    // order, mirroring Spark's aggregate() fold.
    """WITH b AS (SELECT doc_id AS id, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS L FROM documents),
      |f AS (SELECT id, list_transform(range(0, 16), j ->
      |    CASE WHEN j < L THEN
      |      list_reduce(
      |        list_transform(range(0, (L - j + 15) // 16),
      |          m -> CAST(CAST(('0x' || substr(hx, CAST(2*(j + 16*m) + 1 AS INT), 2))::INT AS FLOAT)
      |                 / CAST(255 AS FLOAT) AS FLOAT)),
      |        (acc, x) -> CAST(acc + x AS FLOAT))
      |    ELSE CAST(0 AS FLOAT) END) AS feats FROM b)
      |SELECT id, len(feats) AS n_dims,
      |  round(list_reduce(list_transform(feats, x -> CAST(x AS DOUBLE)),
      |    (a, x) -> a + x), 4) AS checksum
      |FROM f ORDER BY id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val media = Multimodal.fabricate(tbl(s, dir, "documents"), "text", "image")
    Multimodal.extractFeatures(media, "doc_id", dim = 16)
      .select(col("id"), size(col("features")).as("n_dims"),
        round(aggregate(col("features"), lit(0.0), (acc, x) => acc + x.cast("double")), 4)
          .as("checksum"))
      .orderBy("id")
  }

  q("multimodal_resize",
    // the resize stub's byte-strided sampling is exact integer math over
    // the UTF-8 payload length, so the oracle replays it in SQL:
    // target = max(1, min(L, 64)); stride = max(1, L/target);
    // n_bytes = max(1, L/stride)
    """WITH b AS (SELECT doc_id AS id, octet_length(encode(text)) AS L FROM documents)
      |SELECT id,
      |  GREATEST(1, L // GREATEST(1, L // GREATEST(1, LEAST(L, 64)))) AS n_bytes,
      |  64 AS w, 64 AS h
      |FROM b ORDER BY id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val media = Multimodal.fabricate(tbl(s, dir, "documents"), "text", "image")
    Multimodal.resize(media, "doc_id", w = 64, h = 64)
      .select(col("id"), length(col("payload")).as("n_bytes"),
        col("media_meta.width").as("w"), col("media_meta.height").as("h"))
      .orderBy("id")
  }

  q("multimodal_frame_sample",
    // deterministic sampling grid: duration = 10 ms per character, step =
    // max(duration/4, 1), samples at 0, step, ..., <= duration — integer
    // arithmetic both engines replay exactly (doc_id < 100 rather than
    // LIMIT so row membership is deterministic on any engine/order)
    """WITH d AS (SELECT doc_id, length(text) * 10 AS dur
      |  FROM documents WHERE doc_id < 100),
      |s AS (SELECT doc_id, dur, GREATEST(dur // 4, 1) AS step FROM d)
      |SELECT doc_id, unnest(range(0, dur // step + 1)) AS sample_idx,
      |  unnest(list_transform(range(0, dur // step + 1), i -> i * step)) AS sample_ms,
      |  dur AS duration_ms
      |FROM s ORDER BY doc_id, sample_idx"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // deterministic frame/sample grid over fabricated video rows
    val media = Multimodal.fabricate(
      tbl(s, dir, "documents").filter(col("doc_id") < 100), "text", "video")
    Multimodal.sampleGrid(media, "doc_id", samples = 4)
      .select(col("doc_id"), col("sample_idx"), col("sample_ms"),
        col("media_meta.duration_ms").as("duration_ms"))
      .orderBy("doc_id", "sample_idx")
  }

  // ===========================================================================
  // Classic OLAP query shapes — the TPC-H patterns (Q4, Q7–Q10, Q12–Q15,
  // Q17–Q20, Q22) adapted to this schema (no partsupp/commitdate/shipmode).
  // These exercise the decision-support plan space end-to-end: correlated
  // EXISTS, multi-way broadcast joins, conditional-aggregation shares,
  // left-join histograms, scalar-subquery max, HAVING semi joins, and
  // NOT EXISTS + population-threshold predicates. Exact-decimal discipline
  // throughout: sums/thresholds run over decimals or integers, with a
  // single double cast (or one IEEE division) at the very end.
  // ===========================================================================

  q("q4_priority_exists",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE))
      |GROUP BY o_orderpriority ORDER BY o_orderpriority"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val o = tbl(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("1996-07-01").cast("date") &&
        to_date(col("o_orderdate")) < lit("1996-10-01").cast("date"))
    val li = tbl(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
    o.join(li, col("l_orderkey") === col("o_orderkey") &&
        to_date(col("l_shipdate")) > to_date(col("o_orderdate")), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  q("q7_nation_volume",
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS INT) AS l_year,
       |  CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
       |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
       |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
       |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
       |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
       |  AND n1.n_name IN ('NATION_1','NATION_2')
       |  AND n2.n_name IN ('NATION_1','NATION_2')
       |  AND n1.n_name <> n2.n_name
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val n1 = broadcast(tbl(s, dir, "nation")
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
    val n2 = broadcast(tbl(s, dir, "nation")
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation")))
    tbl(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1998-01-01").cast("date"))
      .join(broadcast(tbl(s, dir, "supplier")), col("s_suppkey") === col("l_suppkey"))
      .join(n1, col("n1_key") === col("s_nationkey"))
      .join(tbl(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .join(tbl(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .join(n2, col("n2_key") === col("c_nationkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  q("q8_market_share",
    s"""WITH vol AS (
       |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       |    $discPriceSql AS volume, n1.n_name AS supp_nation
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |    JOIN supplier ON s_suppkey = l_suppkey
       |    JOIN orders ON o_orderkey = l_orderkey
       |    JOIN customer ON c_custkey = o_custkey
       |    JOIN nation n1 ON n1.n_nationkey = s_nationkey
       |    JOIN nation n2 ON n2.n_nationkey = c_nationkey
       |    JOIN region ON r_regionkey = n2.n_regionkey
       |  WHERE r_name = 'ASIA' AND p_type = 'PROMO')
       |SELECT o_year,
       |  CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume END) AS DOUBLE)
       |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
       |FROM vol GROUP BY o_year ORDER BY o_year"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val n1 = broadcast(tbl(s, dir, "nation")
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
    val n2 = broadcast(tbl(s, dir, "nation")
      .select(col("n_nationkey").as("n2_key"),
        col("n_regionkey").as("n2_regionkey")))
    val vol = tbl(s, dir, "lineitem")
      .join(broadcast(tbl(s, dir, "part").filter(col("p_type") === "PROMO")),
        col("p_partkey") === col("l_partkey"))
      .join(broadcast(tbl(s, dir, "supplier")), col("s_suppkey") === col("l_suppkey"))
      .join(n1, col("n1_key") === col("s_nationkey"))
      .join(tbl(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .join(tbl(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .join(n2, col("n2_key") === col("c_nationkey"))
      .join(broadcast(tbl(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("r_regionkey") === col("n2_regionkey"))
      .select(year(col("o_orderdate")).as("o_year"),
        discPrice(col("l_extendedprice"), col("l_discount")).as("volume"),
        col("supp_nation"))
    vol.groupBy("o_year")
      .agg((sum(when(col("supp_nation") === "NATION_5", col("volume"))).cast("double")
        / sum(col("volume")).cast("double")).as("mkt_share"))
      .orderBy("o_year")
  }

  q("q9_profit_proxy",
    s"""SELECT n_name, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit FROM (
       |  SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
       |    $discPriceSql - CAST(p_retailprice AS DECIMAL(12,2))
       |      * CAST(0.5 AS DECIMAL(2,1)) * CAST(l_quantity AS INT) AS amount
       |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
       |    JOIN part ON p_partkey = l_partkey
       |    JOIN orders ON o_orderkey = l_orderkey
       |    JOIN nation ON n_nationkey = s_nationkey
       |  WHERE p_name LIKE '%bolt%') profit
       |GROUP BY n_name, o_year ORDER BY n_name, o_year"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val amount = discPrice(col("l_extendedprice"), col("l_discount")) -
      dec(col("p_retailprice"), 12, 2) * lit("0.5").cast(DecimalType(2, 1)) *
        col("l_quantity").cast("int")
    tbl(s, dir, "lineitem")
      .join(broadcast(tbl(s, dir, "supplier")), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(tbl(s, dir, "part").filter(col("p_name").like("%bolt%"))),
        col("p_partkey") === col("l_partkey"))
      .join(tbl(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(tbl(s, dir, "nation")), col("n_nationkey") === col("s_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).as("o_year"), amount.as("amount"))
      .groupBy("n_name", "o_year")
      .agg(sum("amount").cast("double").as("sum_profit"))
      .orderBy("n_name", "o_year")
  }

  q("q10_returned_top",
    s"""SELECT c_custkey, c_name, CAST(SUM($discPriceSql) AS DOUBLE) AS revenue,
       |  CAST(c_acctbal AS DOUBLE) AS acctbal, n_name
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON l_orderkey = o_orderkey
       |  JOIN nation ON n_nationkey = c_nationkey
       |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-10-01'
       |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
       |  AND l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "customer")
      .join(tbl(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >= lit("1996-10-01").cast("date") &&
          to_date(col("o_orderdate")) < lit("1997-01-01").cast("date")),
        col("c_custkey") === col("o_custkey"))
      .join(tbl(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(tbl(s, dir, "nation")), col("n_nationkey") === col("c_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal").cast("double").as("acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
  }

  q("q12_delay_buckets",
    """SELECT CASE
      |    WHEN datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) < 30 THEN 'fast'
      |    WHEN datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) < 90 THEN 'medium'
      |    ELSE 'slow' END AS delay_bucket,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1 ORDER BY 1"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val delay = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    tbl(s, dir, "orders")
      .join(tbl(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(when(delay < 30, "fast").when(delay < 90, "medium").otherwise("slow")
        .as("delay_bucket"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_count"))
      .orderBy("delay_bucket")
  }

  q("q13_order_histogram",
    """WITH co AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |SELECT c_count, COUNT(*) AS custdist FROM co
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "customer")
      .join(tbl(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  q("q14_promo_share",
    s"""SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $discPriceSql END) AS DOUBLE)
       |    * 100.0 / CAST(SUM($discPriceSql) AS DOUBLE) AS promo_share
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
       |  AND CAST(l_shipdate AS DATE) < DATE '1996-10-01'"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val dp = discPrice(col("l_extendedprice"), col("l_discount"))
    tbl(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-09-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1996-10-01").cast("date"))
      .join(broadcast(tbl(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg((sum(when(col("p_type") === "PROMO", dp)).cast("double") * 100.0
        / sum(dp).cast("double")).as("promo_share"))
  }

  q("q15_top_supplier",
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no, SUM($discPriceSql) AS total_rev
       |  FROM lineitem
       |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
       |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
       |FROM supplier JOIN revenue ON s_suppkey = supplier_no
       |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
       |ORDER BY s_suppkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val rev = tbl(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1996-04-01").cast("date"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("mx"))
    tbl(s, dir, "supplier")
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(mx), col("total_rev") === col("mx"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  q("q17_small_qty_revenue",
    """WITH pq AS (SELECT l_partkey AS pk, COUNT(*) AS cnt,
      |    CAST(SUM(CAST(l_quantity AS INT)) AS BIGINT) AS sq
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n
      |FROM lineitem JOIN part ON p_partkey = l_partkey JOIN pq ON pk = l_partkey
      |WHERE p_brand = 'Brand#11' AND 5 * CAST(l_quantity AS INT) * cnt < sq"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // exact integer form of "qty < 0.2 * avg(qty) per part":
    // 5 * qty * cnt < sum(qty) — no float thresholds anywhere
    val pq = tbl(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("int")).as("sq"))
    tbl(s, dir, "lineitem")
      .join(broadcast(tbl(s, dir, "part").filter(col("p_brand") === "Brand#11")),
        col("p_partkey") === col("l_partkey"))
      .join(pq, col("pk") === col("l_partkey"))
      .filter(lit(5) * col("l_quantity").cast("int") * col("cnt") < col("sq"))
      .agg((sum(dec(col("l_extendedprice"), 12, 2)).cast("double") / 7.0)
        .as("avg_yearly"), count(lit(1)).as("n"))
  }

  q("q18_volume_customers",
    """WITH big AS (SELECT l_orderkey AS bok,
      |    CAST(SUM(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS INT)) > 300)
      |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      |  CAST(o_totalprice AS DOUBLE) AS totalprice, sum_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN big ON bok = o_orderkey
      |ORDER BY totalprice DESC, o_orderkey LIMIT 50"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val big = tbl(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("bok"))
      .agg(sum(col("l_quantity").cast("int")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    tbl(s, dir, "customer")
      .join(tbl(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(big, col("bok") === col("o_orderkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice").cast("double").as("totalprice"), col("sum_qty"))
      .orderBy(col("totalprice").desc, col("o_orderkey")).limit(50)
  }

  q("q19_or_pushdown",
    s"""SELECT CAST(SUM($discPriceSql) AS DOUBLE) AS revenue, COUNT(*) AS n
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "lineitem")
      .join(broadcast(tbl(s, dir, "part")), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"), count(lit(1)).as("n"))
  }

  q("q20_semi_agg",
    """SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_type = 'PROMO' GROUP BY l_suppkey
      |  HAVING SUM(CAST(l_quantity AS INT)) > 100)
      |ORDER BY s_suppkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val promo = tbl(s, dir, "lineitem")
      .join(broadcast(tbl(s, dir, "part").filter(col("p_type") === "PROMO")),
        col("p_partkey") === col("l_partkey"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_quantity").cast("int")).as("tq"))
      .filter(col("tq") > 100)
    tbl(s, dir, "supplier")
      .join(promo, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name").orderBy("s_suppkey")
  }

  q("q22_idle_customers",
    """WITH pos AS (SELECT COUNT(*) AS cnt,
      |    SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS tot
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer, pos
      |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * cnt > tot
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // "acctbal above the positive-population mean" in exact decimal form:
    // bal * cnt > sum  (one broadcast row, no float mean anywhere)
    val pos = tbl(s, dir, "customer").filter(col("c_acctbal") > 0.0)
      .agg(count(lit(1)).as("cnt"), sum(dec(col("c_acctbal"), 12, 2)).as("tot"))
    tbl(s, dir, "customer")
      .crossJoin(broadcast(pos))
      .filter(dec(col("c_acctbal"), 12, 2) * col("cnt") > col("tot"))
      .join(tbl(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"), 12, 2)).cast("double").as("totacctbal"))
      .orderBy("c_nationkey")
  }

  q("q2_min_cost_supplier",
    // TPC-H q2 shape (correlated min-cost subquery against a per-group
    // scalar bound) re-based on the tables this corpus carries: the
    // missing partsupp relation is derived as the observed (part,
    // supplier) supply pairs in lineitem with cost = MIN(extendedprice)
    // — same join topology (part × supply × supplier × nation × region,
    // cost = regional per-part minimum), exact decimal cost equality
    """WITH supply AS (
      |  SELECT l_partkey AS pk, l_suppkey AS sk,
      |    MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
      |  FROM lineitem GROUP BY 1, 2),
      | rsupply AS (
      |  SELECT pk, sk, cost, s_acctbal, s_name, n_name
      |  FROM supply JOIN supplier ON s_suppkey = sk
      |    JOIN nation ON n_nationkey = s_nationkey
      |    JOIN region ON r_regionkey = n_regionkey
      |  WHERE r_name = 'ASIA'),
      | best AS (SELECT pk AS bpk, MIN(cost) AS mincost FROM rsupply GROUP BY 1)
      |SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
      |  p_partkey, p_type, CAST(cost AS DOUBLE) AS cost
      |FROM part JOIN rsupply ON pk = p_partkey
      |  JOIN best ON bpk = p_partkey AND cost = mincost
      |WHERE p_size = 15
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // the p_size filter prunes BOTH the supply branch and the per-part
    // minimum before the self-join (the min is per part, so restricting
    // parts first is equivalent and removes 49/50 of the agg + join
    // work); supplier×nation×region collapses to one broadcast dim
    val parts = broadcast(tbl(s, dir, "part").filter(col("p_size") === 15)
      .select("p_partkey", "p_type"))
    val asiaSupp = broadcast(tbl(s, dir, "supplier")
      .join(broadcast(tbl(s, dir, "nation")
        .join(tbl(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))),
        col("n_nationkey") === col("s_nationkey"))
      .select("s_suppkey", "s_acctbal", "s_name", "n_name"))
    val rsupply = tbl(s, dir, "lineitem")
      .join(parts, col("p_partkey") === col("l_partkey"))
      .join(asiaSupp, col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("p_partkey"), col("p_type"), col("l_suppkey"),
        col("s_acctbal"), col("s_name"), col("n_name"))
      .agg(min(dec(col("l_extendedprice"), 12, 2)).as("cost"))
    val best = rsupply.groupBy(col("p_partkey").as("bpk"))
      .agg(min(col("cost")).as("mincost"))
    rsupply.join(best, col("bpk") === col("p_partkey") &&
        col("cost") === col("mincost"))
      .select(col("s_acctbal").cast("double").as("s_acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"), col("p_type"),
        col("cost").cast("double").as("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey")).limit(100)
  }

  q("q11_important_stock",
    // TPC-H q11 shape: per-group value vs a GLOBAL scalar threshold
    // (group HAVING against a fraction of the grand total), partsupp
    // value re-based as regional per-part revenue. Exact decimal
    // threshold form as in q22: val * 2000 > tot — no float fraction
    """WITH v AS (
      |  SELECT l_partkey AS p_partkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS pval
      |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      |    JOIN nation ON n_nationkey = s_nationkey
      |    JOIN region ON r_regionkey = n_regionkey
      |  WHERE r_name = 'EUROPE' GROUP BY 1),
      | t AS (SELECT SUM(pval) AS tot FROM v)
      |SELECT p_partkey, CAST(pval AS DOUBLE) AS value
      |FROM v, t WHERE pval * 2000 > tot
      |ORDER BY value DESC, p_partkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val euroSupp = broadcast(tbl(s, dir, "supplier")
      .join(broadcast(tbl(s, dir, "nation")
        .join(tbl(s, dir, "region").filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))),
        col("n_nationkey") === col("s_nationkey"))
      .select("s_suppkey"))
    val v = tbl(s, dir, "lineitem")
      .join(euroSupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(dec(col("l_extendedprice"), 12, 2)).as("pval"))
    val tot = v.agg(sum(col("pval")).as("tot"))
    v.crossJoin(broadcast(tot))
      .filter(col("pval") * 2000 > col("tot"))
      .select(col("p_partkey"), col("pval").cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  q("q11_important_stock_scaled",
    // The SF-NORMALIZED q11 (VERDICT r14 #3): official TPC-H q11 divides
    // its HAVING fraction by the scale factor so selectivity stays
    // constant as the corpus grows; the fixed-fraction analog above is
    // empty at sf>=1 by construction. SF is derived from a table count —
    // supplier carries SF x 10,000 rows — so fraction f0/SF with
    // f0 = 0.00001 becomes the EXACT integer predicate
    // pval * ns * 10 > tot (f0/SF = f0 x 10000/ns = 0.1/ns). f0 is
    // calibrated to this generator's revenue spread: uniform
    // extendedprice over ~30 lineitems/part puts the max part value at
    // ~3.3x the mean at every SF (the official 0.0001 needs 20x-mean
    // outliers this generator never produces), so the 2x-mean threshold
    // selects a stable ~1-3% of parts at every scale — non-empty at
    // sf0.01 (99 rows) through the ProbeTpch decades. Same plan shape
    // as q11: dims broadcast, one part-keyed aggregate, the group-vs-
    // global HAVING via a broadcast one-row scalar (tot, ns).
    """WITH v AS (
      |  SELECT l_partkey AS p_partkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS pval
      |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      |    JOIN nation ON n_nationkey = s_nationkey
      |    JOIN region ON r_regionkey = n_regionkey
      |  WHERE r_name = 'EUROPE' GROUP BY 1),
      | t AS (SELECT SUM(pval) AS tot FROM v),
      | sc AS (SELECT COUNT(*) AS ns FROM supplier)
      |SELECT p_partkey, CAST(pval AS DOUBLE) AS value
      |FROM v, t, sc WHERE pval * ns * 10 > tot
      |ORDER BY value DESC, p_partkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val euroSupp = broadcast(tbl(s, dir, "supplier")
      .join(broadcast(tbl(s, dir, "nation")
        .join(tbl(s, dir, "region").filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))),
        col("n_nationkey") === col("s_nationkey"))
      .select("s_suppkey"))
    val v = tbl(s, dir, "lineitem")
      .join(euroSupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(dec(col("l_extendedprice"), 12, 2)).as("pval"))
    // both scalars ride ONE broadcast one-row frame: the value total and
    // the supplier count the SF normalization derives from
    val scalars = v.agg(sum(col("pval")).as("tot"))
      .crossJoin(tbl(s, dir, "supplier").agg(count(lit(1)).as("ns")))
    v.crossJoin(broadcast(scalars))
      .filter(col("pval") * col("ns") * 10 > col("tot"))
      .select(col("p_partkey"), col("pval").cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  q("q16_supplier_cnt",
    // TPC-H q16 shape: distinct-count per part attribute triple with a
    // NOT IN supplier-exclusion subquery (complaint suppliers proxied by
    // low account balance — the corpus carries no s_comment)
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // NOT IN over a non-null key = left_anti (broadcast: the exclusion
    // side is a filtered dim); the part predicate prunes 42/50 sizes
    // before the fact-table join
    val bad = tbl(s, dir, "supplier").filter(col("s_acctbal") < 500)
      .select("s_suppkey")
    val parts = tbl(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    tbl(s, dir, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(parts), col("p_partkey") === col("l_partkey"))
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  q("q21_waiting_supplier",
    // TPC-H q21 shape — the multi-correlated EXISTS + NOT EXISTS
    // self-join on the fact table. The corpus has no commit/receipt
    // dates, so "kept waiting" is proxied by the returned flag: finished
    // orders where supplier s returned a line, SOME other supplier also
    // supplied the order, and NO other supplier's line was returned —
    // identical join topology (l1 ⋉ l2, l1 ▷ l3 with the <> residual)
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation, region
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // the EXISTS legs stay equi-joins on l_orderkey with the supplier
    // inequality as a RESIDUAL condition (semi + anti, shuffled on the
    // order key — per-order fan-in is bounded by lines-per-order, so no
    // skew at any corpus size); the region-filtered supplier dim is
    // broadcast and applied FIRST, pruning l1 before the self-joins
    val li = tbl(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_returnflag")
    val asiaSupp = broadcast(tbl(s, dir, "supplier")
      .join(broadcast(tbl(s, dir, "nation")
        .join(tbl(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))),
        col("n_nationkey") === col("s_nationkey"))
      .select("s_suppkey", "s_name"))
    val fOrders = tbl(s, dir, "orders")
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    val l1 = li.filter(col("l_returnflag") === "R")
      .join(asiaSupp, col("s_suppkey") === col("l_suppkey"))
      .join(fOrders, col("o_orderkey") === col("l_orderkey"), "left_semi")
    val l2 = li.select(col("l_orderkey").as("l2_ok"), col("l_suppkey").as("l2_sk"))
    val l3 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("l3_ok"), col("l_suppkey").as("l3_sk"))
    l1.join(l2, col("l_orderkey") === col("l2_ok") &&
        col("l_suppkey") =!= col("l2_sk"), "left_semi")
      .join(l3, col("l_orderkey") === col("l3_ok") &&
        col("l_suppkey") =!= col("l3_sk"), "left_anti")
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(100)
  }

  q("q_window_nth",
    """SELECT user_id, event_id, value,
      |  nth_value(value, 3) OVER w AS v3,
      |  lag(value, 2) OVER w AS lag2,
      |  lead(value, 2, -1.0) OVER w AS lead2
      |FROM events WHERE user_id < 40
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, dir).filter(col("user_id") < 40)
      .select(col("user_id"), col("event_id"), col("value"),
        nth_value(col("value"), 3).over(w).as("v3"),
        lag(col("value"), 2).over(w).as("lag2"),
        lead(col("value"), 2, -1.0).over(w).as("lead2"))
      .orderBy("user_id", "event_id")
  }

  q("q_merge_upsert",
    // CDC MERGE: deterministic change set (deletes %37, balance-zeroing
    // updates %10, inserts keyed +1000000 for %100) applied to the
    // customer snapshot via ops.Merge (anti join + union — no windows,
    // no sorts, one exchange per side)
    """WITH chg AS (
      |  SELECT c_custkey AS k, CASE WHEN c_custkey % 37 = 0 THEN 'D' ELSE 'U' END AS op,
      |    c_name, c_nationkey, CAST(0.00 AS DECIMAL(12,2)) AS bal, c_mktsegment
      |  FROM customer WHERE c_custkey % 37 = 0 OR c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'I', 'NEW_' || CAST(c_custkey AS VARCHAR),
      |    0, CAST(100.00 AS DECIMAL(12,2)), 'MACHINERY'
      |  FROM customer WHERE c_custkey % 100 = 0),
      |survivors AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    CAST(c_acctbal AS DECIMAL(12,2)) AS bal, c_mktsegment
      |  FROM customer WHERE c_custkey NOT IN (SELECT k FROM chg)),
      |merged AS (
      |  SELECT * FROM survivors UNION ALL
      |  SELECT k, c_name, c_nationkey, bal, c_mktsegment FROM chg WHERE op <> 'D')
      |SELECT c_custkey, c_name, CAST(c_nationkey AS INT) AS c_nationkey,
      |  CAST(bal AS DOUBLE) AS bal, c_mktsegment
      |FROM merged ORDER BY c_custkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val target = tbl(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        dec(col("c_acctbal"), 12, 2).as("bal"), col("c_mktsegment"))
    val mutations = tbl(s, dir, "customer")
      .filter(col("c_custkey") % 37 === 0 || col("c_custkey") % 10 === 0)
      .select(col("c_custkey"),
        when(col("c_custkey") % 37 === 0, "D").otherwise("U").as("op"),
        col("c_name"), col("c_nationkey"),
        lit("0.00").cast(DecimalType(12, 2)).as("bal"), col("c_mktsegment"))
    val inserts = tbl(s, dir, "customer")
      .filter(col("c_custkey") % 100 === 0)
      .select((col("c_custkey") + 1000000).as("c_custkey"), lit("I").as("op"),
        concat(lit("NEW_"), col("c_custkey").cast("string")).as("c_name"),
        lit(0).as("c_nationkey"),
        lit("100.00").cast(DecimalType(12, 2)).as("bal"),
        lit("MACHINERY").as("c_mktsegment"))
    Merge.applyChanges(target, mutations.unionByName(inserts), "c_custkey", "op")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("bal").cast("double").as("bal"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  q("q_posexplode",
    // LATERAL-view positional explode; the oracle zips unnest(w) with
    // unnest(range(len(w))) for the same 0-based ordinality
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      |  FROM documents WHERE doc_id < 50),
      |u AS (SELECT doc_id, unnest(w) AS tok, unnest(range(len(w))) AS pos FROM toks)
      |SELECT doc_id, CAST(pos AS INT) AS pos, tok FROM u
      |ORDER BY doc_id, pos"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"), col("tok"))
      .orderBy("doc_id", "pos")
  }

  q("q_recursive_cte",
    // native WITH RECURSIVE (Spark 4 and DuckDB): walk the implicit
    // binary tree parent(k) = k div 2 from the root, per-level rollup.
    // Strictly-increasing keys make the recursion provably acyclic.
    """WITH RECURSIVE tree AS (
      |  SELECT CAST(1 AS BIGINT) AS k, 0 AS depth
      |  UNION ALL
      |  SELECT c.c_custkey, t.depth + 1
      |  FROM customer c JOIN tree t ON c.c_custkey // 2 = t.k
      |  WHERE c.c_custkey > 1 AND c.c_custkey <= 200)
      |SELECT depth, COUNT(*) AS n, MIN(k) AS min_k, MAX(k) AS max_k
      |FROM tree GROUP BY depth ORDER BY depth"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "customer").createOrReplaceTempView("customer_rec")
    s.sql(
      """WITH RECURSIVE tree AS (
        |  SELECT CAST(1 AS BIGINT) AS k, 0 AS depth
        |  UNION ALL
        |  SELECT c.c_custkey, t.depth + 1
        |  FROM customer_rec c JOIN tree t ON c.c_custkey div 2 = t.k
        |  WHERE c.c_custkey > 1 AND c.c_custkey <= 200)
        |SELECT depth, COUNT(*) AS n, MIN(k) AS min_k, MAX(k) AS max_k
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin)
  }

  q("q_join_right",
    // right outer completes the join matrix: order side nulls out for
    // customers who never ordered
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      |  COUNT(*) AS n_rows
      |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey ORDER BY c_custkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "orders")
      .join(tbl(s, dir, "customer"), col("o_custkey") === col("c_custkey"),
        "right_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"), count(lit(1)).as("n_rows"))
      .orderBy("c_custkey")
  }

  q("q_grouping_id",
    // GROUPING() disambiguates rollup-produced NULLs from data NULLs —
    // the marker every BI layer depends on
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls, COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"), col("g_rf"), col("g_ls"), col("n"))
      .orderBy(col("g_rf"), col("g_ls"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  q("flf_evolve",
    // the reference's namesake scenario, oracle-checked: generation-1
    // files (3 columns) and generation-2 files (adds l_returnflag) parse
    // under their OWN layouts and evolve into the newest schema; the
    // v1 half null-fills the column it predates
    """WITH ev AS (SELECT l_orderkey, CAST(l_quantity AS INT) AS q,
      |    CASE WHEN l_orderkey % 2 = 1 THEN l_returnflag END AS rf
      |  FROM lineitem)
      |SELECT rf AS l_returnflag, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sum_qty
      |FROM ev GROUP BY rf ORDER BY rf NULLS FIRST"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val v1 = FixedSchema("ev", 1, Seq(
      FixedColumn("l_orderkey", 0, 12, FlfType.Int64T, Alignment.Right, '0', isNullable = true),
      FixedColumn("l_linenumber", 12, 4, FlfType.Int32T, Alignment.Right, ' ', isNullable = true),
      FixedColumn("l_quantity", 16, 6, FlfType.Int32T, Alignment.Right, ' ', isNullable = true)))
    val v2 = FixedSchema("ev", 2, v1.columns :+
      FixedColumn("l_returnflag", 22, 2, FlfType.Utf8T, Alignment.Left, '_', isNullable = true))
    val base = tbl(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("int").as("l_quantity"), col("l_returnflag"))
    val gen1 = graft.flf.FlfFormat.format(base.filter(col("l_orderkey") % 2 === 0), v1)
    val gen2 = graft.flf.FlfFormat.format(base.filter(col("l_orderkey") % 2 === 1), v2)
    FlfParse.parseEvolving(Seq((gen1, v1), (gen2, v2)))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  }

  q("q_session_window",
    // the built-in session_window operator (merge events closer than the
    // gap); oracle = the islands formulation with the SAME strict
    // boundary (a gap of exactly 30min starts a new session)
    """WITH g AS (SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
      |  FROM events WHERE user_id < 50
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, ts,
      |  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS sid FROM g)
      |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    events(s, dir).filter(col("user_id") < 50)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"), col("n_events"))
      .orderBy("user_id", "session_start")
  }

  q("q_hof_extras",
    // the remaining higher-order-function family: zip_with, exists,
    // forall, aggregate — DuckDB mirrors via list_zip/filter/reduce
    """WITH g AS (SELECT c_nationkey, list_sort(list(c_custkey))[1:8] AS ks
      |  FROM customer GROUP BY c_nationkey)
      |SELECT c_nationkey,
      |  CAST(len(ks) AS INT) AS n,
      |  CAST(list_reduce(list_transform(list_zip(ks, list_transform(ks, k -> k + 10)),
      |    p -> p[1] * p[2]), (acc, x) -> acc + x) AS BIGINT) AS sum_products,
      |  len(list_filter(ks, k -> k % 7 = 0)) > 0 AS has_mult7,
      |  len(list_filter(ks, k -> NOT (k >= 0))) = 0 AS all_pos,
      |  CAST(list_reduce(ks, (acc, k) -> acc + k) AS BIGINT) AS total
      |FROM g ORDER BY c_nationkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(slice(sort_array(collect_list(col("c_custkey"))), 1, 8).as("ks"))
      .select(col("c_nationkey"),
        size(col("ks")).as("n"),
        aggregate(
          zip_with(col("ks"), transform(col("ks"), k => k + 10), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("sum_products"),
        exists(col("ks"), k => k % 7 === 0).as("has_mult7"),
        forall(col("ks"), k => k >= 0).as("all_pos"),
        aggregate(col("ks"), lit(0L), (acc, k) => acc + k).as("total"))
      .orderBy("c_nationkey")
  }

  q("q_jaro_winkler",
    // custom codegen JaroWinkler expression vs DuckDB's native
    // jaro_winkler_similarity over all vocabulary word pairs — double
    // arithmetic, identical term order, rounded to 6 decimals
    s"""WITH v AS (SELECT DISTINCT unnest($toksSql) AS w FROM documents),
       |p AS (SELECT a.w AS w1, b.w AS w2 FROM v a JOIN v b ON a.w < b.w)
       |SELECT w1, w2, round(jaro_winkler_similarity(w1, w2), 6) AS jw
       |FROM p WHERE jaro_winkler_similarity(w1, w2) >= 0.6
       |ORDER BY w1, w2"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val vocab = tbl(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("w")).distinct()
    val jw = graft.functions.JaroWinkler.jaroWinkler(col("w1"), col("w2"))
    vocab.select(col("w").as("w1"))
      .join(vocab.select(col("w").as("w2")), col("w1") < col("w2"))
      .filter(jw >= 0.6)
      .select(col("w1"), col("w2"), round(jw, 6).as("jw"))
      .orderBy("w1", "w2")
  }

  q("q_bpe_pair_freqs",
    // the first BPE merge, distributed: corpus compresses to the
    // vocabulary (groupBy word) BEFORE the char-pair fan-out, so
    // adjacent-pair counting runs on vocab-sized data — the scale trick
    // that makes tokenizer training tractable on a 100 TB corpus
    """WITH sw AS (SELECT unnest(list_filter(
      |    regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t != '')) AS w
      |  FROM documents),
      |v AS (SELECT w, COUNT(*) AS f FROM sw GROUP BY w),
      |p AS (SELECT f, unnest(list_transform(range(1, length(w), 1),
      |    i -> substring(w, CAST(i AS INT), 2))) AS pair
      |  FROM v WHERE length(w) >= 2)
      |SELECT pair, CAST(SUM(f) AS BIGINT) AS n FROM p GROUP BY pair
      |ORDER BY n DESC, pair LIMIT 20"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val units = filter(split(lower(col("text")), "[^a-z0-9]+", -1), t => t =!= "")
    val vocab = tbl(s, dir, "documents")
      .select(explode(units).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    vocab.filter(length(col("w")) >= 2)
      .select(col("f"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum("f").as("n"))
      .orderBy(col("n").desc, col("pair")).limit(20)
  }

  /** Shared oracle CTE chain for the BPE queries: vocabulary, char-level
    * unit lists, then per-round (argmax pair b_k, split merge m_k, greedy
    * fold apply w_k) — DuckDB's list_reduce mirrors Spark's aggregate().
    * m_k joins in as LEFT JOIN ON TRUE: if a round finds no pair (corpus
    * exhausted before `rounds` merges) m_k is empty, and a cross join
    * would silently EMPTY every later w_k while Spark keeps the units —
    * with the left join the fold's NULL comparisons are falsy, so an
    * exhausted round is the identity on both engines.
    */
  private def bpeCtes(rounds: Int): String = {
    def round(k: Int) =
      s"""b$k AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS n FROM (
         |    SELECT freq, unnest(list_transform(range(1, len(u)),
         |      i -> u[i] || ' ' || u[i+1])) AS pair FROM w${k - 1})
         |  GROUP BY pair ORDER BY n DESC, pair LIMIT 1),
         |m$k AS (SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b FROM b$k),
         |w$k AS (SELECT w, freq, list_reduce(list_transform(u, s -> [s]),
         |    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.a AND x[1] = m.b
         |      THEN acc[1:-2] || [acc[-1] || x[1]] ELSE acc || x END) AS u
         |  FROM w${k - 1} LEFT JOIN m$k m ON TRUE)""".stripMargin
    s"""words AS (SELECT w, COUNT(*) AS freq FROM
       |    (SELECT unnest($toksSql) AS w FROM documents) GROUP BY w),
       |w0 AS (SELECT w, freq, list_transform(range(1, length(w) + 1),
       |    i -> substring(w, CAST(i AS INT), 1)) AS u
       |  FROM words WHERE length(w) >= 2),
       |${(1 to rounds).map(round).mkString(",\n")}""".stripMargin
  }

  q("text_bpe_merges", {
    // full iterative BPE TRAINING: each round's argmax merge + greedy
    // re-tokenize, replayed round-for-round in SQL
    val finalSel = (1 to 6)
      .map(k => s"SELECT $k AS round, pair, n FROM b$k")
      .mkString(" UNION ALL ")
    s"WITH ${bpeCtes(6)} $finalSel ORDER BY round".replace("\n", " ")
  }) { (s, dir) =>
    TextAnalysis.bpeMerges(tbl(s, dir, "documents"), "text", rounds = 6)
      .orderBy("round")
  }

  q("text_bpe_vocab",
    // the ENCODE half: apply the 6 learned merges, emit the resulting
    // top-20 subword vocabulary with corpus-weighted frequencies — the
    // oracle replays training AND encoding through the same CTE chain
    s"""WITH ${bpeCtes(6)}
       |SELECT unit, CAST(SUM(freq) AS BIGINT) AS n FROM
       |  (SELECT freq, unnest(u) AS unit FROM w6)
       |GROUP BY unit ORDER BY n DESC, unit LIMIT 20"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.bpeVocab(tbl(s, dir, "documents"), "text", rounds = 6)
      .orderBy(col("n").desc, col("unit")).limit(20)
  }

  q("text_bpe_encode",
    // per-DOCUMENT encoding with the 6 corpus-trained merges: each
    // distinct word encodes once in the unit table (w6), documents join
    // their tokens against it and reassemble in position order — the
    // oracle replays training through the same CTE chain, then encodes
    s"""WITH ${bpeCtes(6)},
       |t AS (SELECT doc_id, $toksSql AS ws FROM documents WHERE doc_id < 50),
       |dt AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
       |    i -> {'pos': i, 'w': ws[i]})) AS s FROM t),
       |p AS (SELECT doc_id, s.pos AS pos, s.w AS w FROM dt),
       |enc AS (SELECT p.doc_id, p.pos, COALESCE(w6.u, [p.w]) AS u
       |  FROM p LEFT JOIN w6 ON p.w = w6.w),
       |agg AS (SELECT doc_id, flatten(list(u ORDER BY pos)) AS units
       |  FROM enc GROUP BY doc_id)
       |SELECT doc_id, CAST(len(units) AS INT) AS n_units,
       |  array_to_string(units, ' ') AS encoded
       |FROM agg ORDER BY doc_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.bpeEncode(tbl(s, dir, "documents"), "text", "doc_id", rounds = 6)
      .filter(col("doc_id") < 50)
      .orderBy("doc_id")
  }

  q("text_lm_score",
    // corpus-trained bigram LM scoring (CCNet-style statistical filter):
    // mean transition probability per doc, log-free for cross-engine bit
    // exactness — each p is one exact-int IEEE division, summed in
    // DOCUMENT order (list ORDER BY pos ≡ Spark sort_array fold)
    s"""WITH t AS (SELECT doc_id, $toksSql AS w FROM documents),
       |pr AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
       |    i -> {'pos': i, 'bg': w[i] || ' ' || w[i+1], 'prev': w[i]})) AS s FROM t),
       |p2 AS (SELECT doc_id, s.pos AS pos, s.bg AS bg, s.prev AS prev FROM pr),
       |uni AS (SELECT tok AS prev, COUNT(*) AS cw FROM
       |  (SELECT unnest(w) AS tok FROM t) GROUP BY 1),
       |bi AS (SELECT bg, COUNT(*) AS cb FROM p2 GROUP BY bg),
       |j AS (SELECT doc_id, pos, CAST(cb AS DOUBLE) / cw AS p
       |  FROM p2 JOIN bi USING (bg) JOIN uni USING (prev)),
       |a AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams,
       |    list(p ORDER BY pos) AS ps FROM j GROUP BY doc_id)
       |SELECT doc_id, n_bigrams,
       |  floor(list_reduce(ps, (acc, x) -> acc + x) / n_bigrams * 1e6 + 0.5) / 1e6
       |    AS lm_score
       |FROM a ORDER BY doc_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.bigramLmScore(tbl(s, dir, "documents")).orderBy("doc_id")
  }

  q("text_html_strip",
    // web-corpus extraction: wrap each document in deterministic markup
    // (entities included), then strip tags + decode the five core
    // entities + collapse whitespace. The tag regex and the literal
    // replace chain (amp LAST) are engine-identical; DuckDB regexes get
    // the 'g' flag to match Spark's replace-all default
    """WITH d AS (SELECT doc_id,
      |  '<html><head><title>t</title></head><body><p id="d' || doc_id || '">'
      |    || replace(text, ' the ', ' &amp; ') || '</p>'
      |    || CASE WHEN doc_id % 3 = 0
      |         THEN '<br/><span class="x">&lt;tag&gt;</span>' ELSE '' END
      |    || '</body></html>' AS html FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(html, '<[^>]*>')) AS INT) AS n_tags,
      |  CAST(length(html) AS INT) AS n_raw_chars,
      |  trim(regexp_replace(
      |    replace(replace(replace(replace(replace(
      |      regexp_replace(html, '<[^>]*>', '', 'g'),
      |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      |      '&amp;', '&'),
      |    '\s+', ' ', 'g')) AS extracted
      |FROM d ORDER BY doc_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val html = concat(
      lit("<html><head><title>t</title></head><body><p id=\"d"),
      col("doc_id").cast("string"), lit("\">"),
      replace(col("text"), lit(" the "), lit(" &amp; ")), lit("</p>"),
      when(col("doc_id") % 3 === 0,
        lit("<br/><span class=\"x\">&lt;tag&gt;</span>")).otherwise(lit("")),
      lit("</body></html>"))
    TextAnalysis.htmlStrip(tbl(s, dir, "documents"), html).orderBy("doc_id")
  }

  q("text_script_profile",
    // Unicode script routing over a deterministically multilingualized
    // corpus (the mojibake-audit dirtying discipline): per doc, counts
    // of Latin/Cyrillic/CJK/digit code points by explicit BMP ranges
    // (identical in Java and RE2 regex) and the dominant script
    """WITH d AS (SELECT doc_id, text ||
      |    CASE WHEN doc_id % 4 = 0 THEN repeat(' дата', 120)
      |         WHEN doc_id % 4 = 1 THEN repeat(' 数据', 200)
      |         WHEN doc_id % 4 = 2 THEN ' données 123' ELSE '' END AS txt
      |  FROM documents)
      |SELECT doc_id, CAST(length(txt) AS INT) AS n_chars,
      |  CAST(len(regexp_extract_all(txt, '[A-Za-z]')) AS INT) AS n_latin,
      |  CAST(len(regexp_extract_all(txt, '[\x{0400}-\x{04FF}]')) AS INT) AS n_cyrillic,
      |  CAST(len(regexp_extract_all(txt, '[\x{4E00}-\x{9FFF}]')) AS INT) AS n_cjk,
      |  CAST(len(regexp_extract_all(txt, '[0-9]')) AS INT) AS n_digit,
      |  CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk THEN 'latin'
      |       WHEN n_cyrillic >= n_cjk THEN 'cyrillic' ELSE 'cjk' END AS dominant
      |FROM d ORDER BY doc_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val dirty = concat(col("text"),
      when(col("doc_id") % 4 === 0, repeat(lit(" дата"), 120))
        .when(col("doc_id") % 4 === 1, repeat(lit(" 数据"), 200))
        .when(col("doc_id") % 4 === 2, lit(" données 123")).otherwise(lit("")))
    TextAnalysis.scriptProfile(tbl(s, dir, "documents"), dirty).orderBy("doc_id")
  }

  q("text_lm_kneser_ney", {
    // Kneser-Ney-smoothed bigram LM (the CCNet-filter upgrade): absolute
    // discount D=3/4 plus continuation-probability backoff, log-free —
    // each p_KN is one fixed IEEE expression of integer counts,
    // replicated operator-for-operator here, and the per-doc mean folds
    // in document order (list ORDER BY pos == sort_array fold)
    s"""WITH t AS (SELECT doc_id, $toksSql AS w FROM documents),
       |pr AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
       |    i -> {'pos': i, 'w1': w[i], 'w2': w[i+1]})) AS s FROM t),
       |p2 AS (SELECT doc_id, s.pos AS pos, s.w1 AS w1, s.w2 AS w2 FROM pr),
       |bi AS (SELECT w1, w2, COUNT(*) AS cb FROM p2 GROUP BY 1, 2),
       |lft AS (SELECT w1, SUM(cb) AS cw1, COUNT(*) AS n1l FROM bi GROUP BY 1),
       |rgt AS (SELECT w2, COUNT(*) AS n1r FROM bi GROUP BY 1),
       |tt AS (SELECT COUNT(*) AS tt FROM bi),
       |j AS (SELECT doc_id, pos,
       |    (GREATEST(CAST(cb AS DOUBLE) - 0.75, 0.0) / cw1)
       |    + (0.75 * n1l / cw1) * (CAST(n1r AS DOUBLE) / tt) AS p
       |  FROM p2 JOIN bi USING (w1, w2) JOIN lft USING (w1)
       |  JOIN rgt USING (w2) CROSS JOIN tt),
       |a AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams,
       |    list(p ORDER BY pos) AS ps FROM j GROUP BY doc_id)
       |SELECT doc_id, n_bigrams,
       |  floor(list_reduce(ps, (acc, x) -> acc + x) / n_bigrams * 1e6 + 0.5) / 1e6
       |    AS kn_score
       |FROM a ORDER BY doc_id""".stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    TextAnalysis.kneserNeyLmScore(tbl(s, dir, "documents")).orderBy("doc_id")
  }

  q("q_repeated_spans",
    // exact-substring dedup signal (Lee et al. style, token-window
    // approximation): 8-token spans occurring in >1 document, rolled up
    // per document — the per-doc "how much of me is boilerplate" score.
    // Span counting shuffles hashed span keys; the repeated-span set is
    // tiny and broadcasts back for the per-doc rollup.
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      |  FROM documents),
      |s AS (SELECT doc_id, unnest(list_transform(range(1, len(w)-6, 1),
      |    i -> array_to_string(w[i:i+7], ' '))) AS span FROM t WHERE len(w) >= 8),
      |d AS (SELECT span FROM s GROUP BY span HAVING COUNT(DISTINCT doc_id) > 1)
      |SELECT s.doc_id, COUNT(DISTINCT s.span) AS n_repeated_spans
      |FROM s JOIN d ON s.span = d.span
      |GROUP BY s.doc_id ORDER BY s.doc_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val spans = tbl(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 8)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("w")) - 7),
        i => concat_ws(" ", slice(col("w"), i, lit(8))))).as("span"))
      .localCheckpoint() // two consumers: repeated-set build + rollup
    val repeated = spans.groupBy("span")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") > 1)
      .select("span")
    spans.join(broadcast(repeated), "span")
      .groupBy("doc_id").agg(countDistinct("span").as("n_repeated_spans"))
      .orderBy("doc_id")
  }

  q("text_chunk_dedup",
    // the REMOVAL half of boilerplate dedup (q_repeated_spans is the
    // score): C4/RefinedWeb-style line-level dedup at 16-token chunk
    // granularity (this corpus has no newlines, so fixed chunks stand in
    // for lines) — drop every chunk occurring in more than one document,
    // reassemble the rest in order. A document that is pure boilerplate
    // disappears entirely; both engines agree on that by construction.
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |c AS (SELECT doc_id, i AS chunk_idx,
      |  array_to_string(w[(i-1)*16+1 : (i-1)*16+16], ' ') AS chunk FROM
      |  (SELECT doc_id, w, unnest(range(1, CAST(ceil(len(w) / 16.0) AS BIGINT) + 1)) AS i FROM t)),
      |d AS (SELECT chunk FROM c GROUP BY chunk HAVING COUNT(DISTINCT doc_id) > 1),
      |k AS (SELECT doc_id, chunk_idx, chunk FROM c
      |  WHERE chunk NOT IN (SELECT chunk FROM d))
      |SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_clean
      |FROM k GROUP BY doc_id ORDER BY doc_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // chunk key shuffles once; the repeated-chunk set is an aggregated
    // frame small enough for Catalyst to broadcast into the anti-join
    val t = tbl(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
    val c = t.select(col("doc_id"),
        explode(sequence(lit(1L),
          ceil(size(col("w")) / lit(16.0)).cast("long"))).as("chunk_idx"),
        col("w"))
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", expr("slice(w, int((chunk_idx - 1) * 16 + 1), 16)"))
          .as("chunk"))
      .localCheckpoint() // two consumers: repeated-set build + keep join
    val d = c.groupBy("chunk").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") > 1).select("chunk")
    c.join(d, Seq("chunk"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
        s => s.getField("chunk")), " ").as("text_clean"))
      .orderBy("doc_id")
  }

  q("q_variant_json",
    // Spark 4 VariantType: parse_json once, typed variant_get extraction —
    // the open-schema ingestion path (vs q_map_json's fixed MapType);
    // oracle = DuckDB's native JSON extraction
    """SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k,
      |  CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
      |  json_extract(props, '$.missing') IS NULL AS no_such_field
      |FROM events WHERE event_id < 3000 ORDER BY event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val v = parse_json(col("props"))
    events(s, dir).filter(col("event_id") < 3000)
      .select(col("event_id"),
        variant_get(v, "$.k", "int").as("k"),
        (variant_get(v, "$.k", "int") % 10).as("k_mod"),
        variant_get(v, "$.missing", "string").isNull.as("no_such_field"))
      .orderBy("event_id")
  }

  q("q_lateral_join",
    // correlated LATERAL derived table (Spark 4 + DuckDB syntax parity):
    // per-nation top balance and count computed in the lateral subquery
    """SELECT n_nationkey, n_name, l.cnt, l.top_bal
      |FROM nation, LATERAL (
      |  SELECT COUNT(*) AS cnt,
      |    CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS top_bal
      |  FROM customer WHERE c_nationkey = n_nationkey) l
      |ORDER BY n_nationkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "nation").createOrReplaceTempView("nation_lat")
    tbl(s, dir, "customer").createOrReplaceTempView("customer_lat")
    s.sql(
      """SELECT n_nationkey, n_name, l.cnt, l.top_bal
        |FROM nation_lat, LATERAL (
        |  SELECT COUNT(*) AS cnt,
        |    CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS top_bal
        |  FROM customer_lat WHERE c_nationkey = n_nationkey) l
        |ORDER BY n_nationkey""".stripMargin)
  }

  q("q_minmax_by",
    // arg-max/arg-min with an EXACT composite ordering key (decimal
    // balance scaled + unique custkey) so ties are impossible and both
    // engines pick the same row deterministically
    """SELECT c_nationkey,
      |  arg_max(c_name, CAST(c_acctbal AS DECIMAL(12,2)) * 1000000 + c_custkey) AS top_name,
      |  arg_min(c_name, CAST(c_acctbal AS DECIMAL(12,2)) * 1000000 + c_custkey) AS bottom_name,
      |  COUNT(*) AS n
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val key = dec(col("c_acctbal"), 12, 2) * 1000000 + col("c_custkey")
    tbl(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(max_by(col("c_name"), key).as("top_name"),
        min_by(col("c_name"), key).as("bottom_name"),
        count(lit(1)).as("n"))
      .orderBy("c_nationkey")
  }

  q("q_bool_aggs",
    """SELECT c_nationkey,
      |  bool_and(c_acctbal > 0.0) AS all_positive,
      |  bool_or(c_acctbal < -900.0) AS any_deep_debt,
      |  CAST(count_if(c_mktsegment = 'BUILDING') AS BIGINT) AS n_building,
      |  COUNT(*) AS n
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(bool_and(col("c_acctbal") > 0.0).as("all_positive"),
        bool_or(col("c_acctbal") < -900.0).as("any_deep_debt"),
        count_if(col("c_mktsegment") === "BUILDING").as("n_building"),
        count(lit(1)).as("n"))
      .orderBy("c_nationkey")
  }

  q("q_url_funcs",
    // parse_url over deterministically synthesized URLs; the oracle
    // recomputes host/path/query-param with regexps
    """WITH u AS (SELECT event_id,
      |    'https://shop.example.com/' || event_type || '/page?user=' || CAST(user_id AS VARCHAR) || '&ref=mail' AS url
      |  FROM events WHERE event_id < 2000)
      |SELECT event_id, url,
      |  regexp_extract(url, 'https://([^/]+)/', 1) AS host,
      |  regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
      |  regexp_extract(url, '[?&]user=([^&]*)', 1) AS user_param
      |FROM u ORDER BY event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    events(s, dir).filter(col("event_id") < 2000)
      .select(col("event_id"),
        concat(lit("https://shop.example.com/"), col("event_type"),
          lit("/page?user="), col("user_id").cast("string"), lit("&ref=mail"))
          .as("url"))
      .select(col("event_id"), col("url"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("user")).as("user_param"))
      .orderBy("event_id")
  }

  q("q_interval_arith",
    // date results compare as ISO strings: DuckDB DATE surfaces as a
    // midnight timestamp through pandas, Spark DATE as a date — the
    // string forms are identical on both engines
    """SELECT event_id,
      |  CAST(ts + INTERVAL 90 MINUTE AS TIMESTAMP) AS ts_plus,
      |  CAST(CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS VARCHAR) AS week_start,
      |  CAST(last_day(CAST(ts AS DATE)) AS VARCHAR) AS month_end,
      |  CAST(CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS VARCHAR) AS plus2m,
      |  CAST(isodow(CAST(ts AS DATE)) AS INT) - 1 AS wd
      |FROM events WHERE event_id < 2000 ORDER BY event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    events(s, dir).filter(col("event_id") < 2000)
      .select(col("event_id"),
        (col("ts") + expr("INTERVAL 90 MINUTES")).as("ts_plus"),
        date_trunc("week", col("ts").cast("date")).cast("date").cast("string").as("week_start"),
        last_day(col("ts").cast("date")).cast("string").as("month_end"),
        add_months(col("ts").cast("date"), 2).cast("string").as("plus2m"),
        weekday(col("ts").cast("date")).as("wd"))
      .orderBy("event_id")
  }

  // ===========================================================================
  // Record linkage / entity resolution (Fellegi-Sunter): multi-pass blocking,
  // literal-integer log-odds scoring, three-zone decisions. ops/Linkage.scala.
  // ===========================================================================

  /** The decided customer-linkage frame, MATERIALIZED once per sfDir
    * (VERDICT r12 §4): q_link_zones and q_golden_record consume the
    * same scored/decided pairs q_link_matches measures live — replaying
    * the full linkage per consumer re-paid the probe + 2.2M-pair
    * score/decide three times per bench pass (q_golden_record alone
    * 5.4 s at sf0.1). Same cached-fixture discipline as the IVF-index
    * queries (the build cost lands once, in whichever consumer runs
    * first); oracles are UNCHANGED — they still replay linkage from the
    * base tables, so the fixture is itself oracle-checked through every
    * consumer. q_link_matches stays on the live path: it is the query
    * that measures the dispatcher-routed linkage itself.
    */
  private def linkDecided(s: SparkSession, dir: String): DataFrame = {
    val d = cachedLanding(s"linkdecided:$dir") { p =>
      Linkage.decide(Linkage.linkCustomers(tbl(s, dir, "customer")), 18, 5)
        .write.parquet(s"$p/decided.parquet")
    }
    s.read.parquet(s"$d/decided.parquet")
  }

  /** DuckDB mirror of Linkage.dirtyCustomers + linkCustomers: the dirty
    * fixture, both blocking passes, and the FS-scored pair frame.
    */
  private val linkCtes =
    """hsrc AS (SELECT *, ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT AS hh
      |  FROM customer),
      |d AS (SELECT c_custkey AS d_id,
      |    CASE hh % 4 WHEN 0 THEN upper(c_name)
      |                WHEN 1 THEN substr(c_name, 1, length(c_name) - 1)
      |                WHEN 2 THEN c_name || ' '
      |                ELSE c_name END AS d_name,
      |    CASE WHEN hh % 7 = 0 THEN (c_nationkey + 1) % 25 ELSE c_nationkey END AS d_nat,
      |    CASE WHEN hh % 5 = 0 THEN CAST(c_acctbal AS DECIMAL(12,2)) + CAST(0.07 AS DECIMAL(12,2))
      |         ELSE CAST(c_acctbal AS DECIMAL(12,2)) END AS d_bal,
      |    c_mktsegment AS d_seg
      |  FROM hsrc WHERE c_custkey % 3 != 2),
      |pa AS (SELECT d.d_id, c.c_custkey FROM d JOIN customer c
      |  ON CAST(d.d_nat AS VARCHAR) || '|' || d.d_seg || '|' ||
      |     CAST(CAST(floor(d.d_bal / 100) AS INT) AS VARCHAR)
      |   = CAST(c.c_nationkey AS VARCHAR) || '|' || c.c_mktsegment || '|' ||
      |     CAST(CAST(floor(CAST(c.c_acctbal AS DECIMAL(12,2)) / 100) AS INT) AS VARCHAR)),
      |pb AS (SELECT d.d_id, c.c_custkey FROM d JOIN customer c
      |  ON substr(d.d_name, 10, 7) = substr(c.c_name, 10, 7)),
      |cand AS (SELECT DISTINCT d_id, c_custkey
      |  FROM (SELECT * FROM pa UNION ALL SELECT * FROM pb)),
      |pr AS (SELECT cand.d_id, cand.c_custkey, d.d_name, d.d_nat, d.d_bal, d.d_seg,
      |    c.c_name, c.c_nationkey, CAST(c.c_acctbal AS DECIMAL(12,2)) AS c_bal, c.c_mktsegment
      |  FROM cand JOIN d ON cand.d_id = d.d_id JOIN customer c ON cand.c_custkey = c.c_custkey),
      |lv AS (SELECT d_id, c_custkey,
      |    CASE WHEN d_name = c_name THEN 2
      |         WHEN levenshtein(lower(d_name), lower(c_name)) <= 2 THEN 1 ELSE 0 END AS name_lv,
      |    CASE WHEN abs(d_bal - c_bal) <= CAST(0.10 AS DECIMAL(12,2)) THEN 1 ELSE 0 END AS bal_lv,
      |    CASE WHEN d_nat = c_nationkey THEN 1 ELSE 0 END AS key_lv,
      |    CASE WHEN d_seg = c_mktsegment THEN 1 ELSE 0 END AS seg_lv
      |  FROM pr),
      |fs AS (SELECT d_id, c_custkey,
      |    'n' || name_lv || '|b' || bal_lv || '|k' || key_lv || '|s' || seg_lv AS pattern,
      |    (CASE name_lv WHEN 2 THEN 20 WHEN 1 THEN 12 ELSE -10 END)
      |    + (CASE bal_lv WHEN 1 THEN 6 ELSE -4 END)
      |    + (CASE key_lv WHEN 1 THEN 3 ELSE -2 END)
      |    + (CASE seg_lv WHEN 1 THEN 3 ELSE -2 END) AS fs_score
      |  FROM lv)""".stripMargin

  /** Benford expected first-digit frequencies log10(1 + 1/d), d = 1..9,
    * quantized driver-side at 1e-6 (shared literal strings → identical
    * doubles in both engines; no log10 at query time).
    */
  private val benfordP: Seq[String] = Seq("0.30103", "0.176091", "0.124939",
    "0.09691", "0.079181", "0.066947", "0.057992", "0.051153", "0.045757")

  q("q_corr_matrix", {
    // one-pass pairwise Pearson matrix from exact decimal power sums —
    // the multi-column generalization of q_stats_moments; the table is
    // scanned ONCE for all k(k-1)/2 pairs
    val cs = Seq("l_quantity" -> "q", "l_extendedprice" -> "ep",
      "l_discount" -> "di", "l_tax" -> "tx")
    val prs = for (i <- cs.indices; j <- cs.indices if i < j) yield (cs(i), cs(j))
    val sums = cs.map { case (_, a) =>
      s"CAST(SUM($a) AS DOUBLE) AS s_$a, CAST(SUM($a*$a) AS DOUBLE) AS ss_$a"
    }.mkString(", ")
    val sps = prs.map { case ((_, a), (_, b)) =>
      s"CAST(SUM($a*$b) AS DOUBLE) AS sp_${a}_$b" }.mkString(", ")
    val rows = prs.map { case ((ca, a), (cb, b)) =>
      s"""SELECT '$ca' AS x_col, '$cb' AS y_col,
         | round((n*sp_${a}_$b - s_$a*s_$b) /
         |   (sqrt(n*ss_$a - s_$a*s_$a) * sqrt(n*ss_$b - s_$b*s_$b)), 6) AS corr
         | FROM w""".stripMargin
    }.mkString(" UNION ALL ")
    s"""WITH d AS (SELECT ${cs.map { case (c, a) =>
        s"CAST($c AS DECIMAL(12,2)) AS $a" }.mkString(", ")} FROM lineitem),
       |w AS (SELECT COUNT(*) AS n, $sums, $sps FROM d)
       |SELECT x_col, y_col, corr FROM ($rows) ORDER BY x_col, y_col"""
      .stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    Stats.corrMatrix(tbl(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy("x_col", "y_col")
  }

  q("q_quality_benford", {
    // Benford first-digit screen over order totals: observed counts vs
    // the log10(1+1/d) expectation. The nine expected frequencies are
    // QUANTIZED DRIVER-SIDE literals (same discipline as the NDCG/HLL
    // tables) — no log10 at query time in either engine. (Synthetic
    // uniform prices will NOT follow Benford — the deviation column is
    // the point: this is the fraud/quality alarm reading.)
    s"""WITH f AS (SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1) AS d
       |  FROM orders),
       |o AS (SELECT d, COUNT(*) AS n_obs FROM f WHERE d BETWEEN '1' AND '9' GROUP BY d),
       |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM o)
       |SELECT d, n_obs,
       |  floor(CAST(n_total AS DOUBLE) * ([${benfordP.mkString(", ")}])[CAST(d AS INT)]
       |    * 1e6 + 0.5) / 1e6 AS expected,
       |  floor((n_obs - CAST(n_total AS DOUBLE) * ([${benfordP.mkString(", ")}])[CAST(d AS INT)])
       |    / (CAST(n_total AS DOUBLE) * ([${benfordP.mkString(", ")}])[CAST(d AS INT)])
       |    * 1e6 + 0.5) / 1e6 AS rel_dev
       |FROM o CROSS JOIN t ORDER BY d""".stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val first = substring(dec(col("o_totalprice"), 12, 2).cast("string"), 1, 1)
    val obs = tbl(s, dir, "orders").select(first.as("d"))
      .filter(col("d") >= "1" && col("d") <= "9")
      .groupBy("d").agg(count(lit(1)).as("n_obs"))
    val total = obs.agg(sum("n_obs").as("n_total"))
    val pd = element_at(array(benfordP.map(p => lit(p.toDouble)): _*),
      col("d").cast("int"))
    val exp = col("n_total").cast("double") * pd
    obs.crossJoin(broadcast(total))
      .select(col("d"), col("n_obs"),
        (floor(exp * 1e6 + 0.5) / 1e6).as("expected"),
        (floor((col("n_obs") - exp) / exp * 1e6 + 0.5) / 1e6).as("rel_dev"))
      .orderBy("d")
  }

  q("q_data_card",
    // the per-source "data card": document/char volume, language spread
    // (Gini impurity — exact rational (n² - Σnl²)/n², no logs), english
    // share, mean doc length. One narrow two-level aggregation; every
    // float is one division or one multiply of exact integer sums.
    """WITH bylang AS (SELECT source, lang, COUNT(*) AS nl, SUM(n_chars) AS cl
      |  FROM documents GROUP BY source, lang),
      |agg AS (SELECT source,
      |    CAST(SUM(nl) AS BIGINT) AS n_docs,
      |    CAST(SUM(cl) AS BIGINT) AS sum_chars,
      |    COUNT(*) AS n_langs,
      |    CAST(SUM(nl * nl) AS BIGINT) AS sl2,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN nl ELSE 0 END) AS BIGINT) AS n_en
      |  FROM bylang GROUP BY source)
      |SELECT source, n_docs, sum_chars, n_langs,
      |  floor(CAST(sum_chars AS DOUBLE) / n_docs * 1e6 + 0.5) / 1e6 AS mean_chars,
      |  floor(CAST(n_docs * n_docs - sl2 AS DOUBLE) / (n_docs * n_docs) * 1e6 + 0.5) / 1e6
      |    AS lang_gini,
      |  floor(CAST(n_en AS DOUBLE) / n_docs * 1e6 + 0.5) / 1e6 AS pct_en
      |FROM agg ORDER BY source""".stripMargin.replace("\n", " ")) { (s, dir) =>
    def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    val bylang = tbl(s, dir, "documents")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("nl"), sum("n_chars").as("cl"))
    bylang.groupBy("source")
      .agg(sum("nl").as("n_docs"), sum("cl").as("sum_chars"),
        count(lit(1)).as("n_langs"), sum(col("nl") * col("nl")).as("sl2"),
        sum(when(col("lang") === "en", col("nl")).otherwise(0L)).as("n_en"))
      .select(col("source"), col("n_docs"), col("sum_chars"), col("n_langs"),
        r6(col("sum_chars").cast("double") / col("n_docs")).as("mean_chars"),
        r6((col("n_docs") * col("n_docs") - col("sl2")).cast("double")
          / (col("n_docs") * col("n_docs"))).as("lang_gini"),
        r6(col("n_en").cast("double") / col("n_docs")).as("pct_en"))
      .orderBy("source")
  }

  q("q_link_blocking",
    // multi-pass blocking pre-flight: per-pass pair fan-out + the distinct
    // union the scorer actually sees. Each pass is an equi-join (shuffle
    // on its key); no cross join exists anywhere in the linker.
    s"""WITH $linkCtes
       |SELECT 'pass_block' AS pass, COUNT(*) AS n_pairs, COUNT(DISTINCT d_id) AS n_left FROM pa
       |UNION ALL SELECT 'pass_name', COUNT(*), COUNT(DISTINCT d_id) FROM pb
       |UNION ALL SELECT 'union_distinct', COUNT(*), COUNT(DISTINCT d_id) FROM cand
       |ORDER BY pass""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val cust = tbl(s, dir, "customer")
    val dirty = Linkage.dirtyCustomers(cust)
    def pass(lk: Column, rk: Column): DataFrame =
      dirty.withColumn("__bk", lk).join(cust.withColumn("__bk", rk), "__bk")
        .select("d_id", "c_custkey")
    val pa = pass(
      concat_ws("|", col("d_nat"), col("d_seg"),
        floor(col("d_bal") / 100).cast("int")),
      concat_ws("|", col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal").cast("decimal(12,2)") / 100).cast("int")))
    val pb = pass(substring(col("d_name"), 10, 7),
      substring(col("c_name"), 10, 7))
    def counted(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_pairs"), countDistinct("d_id").as("n_left"))
        .select(lit(name).as("pass"), col("n_pairs"), col("n_left"))
    counted(pa, "pass_block")
      .unionByName(counted(pb, "pass_name"))
      .unionByName(counted(pa.unionByName(pb).distinct(), "union_distinct"))
      .orderBy("pass")
  }

  q("q_link_matches",
    // the match zone: every candidate pair scoring >= 18 under the literal
    // FS weights, with its agreement pattern — what an automated merge
    // would act on (q_link_zones carries the confusion table)
    s"""WITH $linkCtes
       |SELECT d_id, c_custkey, pattern, fs_score FROM fs
       |WHERE fs_score >= 18 ORDER BY d_id, c_custkey"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // DELIBERATELY the Auto default (vs the dedup_* exact pins): the r11
    // verdict's done-criterion is these queries green THROUGH the
    // dispatcher, and routing is probe-verified exact on this fixture
    // from sf0.01 to sf30 (ProbeLinkRouting: pass fan-out 4.7-131
    // pairs/row vs the 256 threshold), so oracle and engine agree at
    // every verification scale; a corpus where they would not is a
    // corpus where exact IS the wrong plan
    Linkage.linkCustomers(tbl(s, dir, "customer"))
      .filter(col("fs_score") >= 18)
      .select("d_id", "c_custkey", "pattern", "fs_score")
      .orderBy("d_id", "c_custkey")
  }

  q("q_link_zones",
    // FS three-zone decision quality: counts and score ranges per
    // (zone, is-actually-the-same-record) cell — the linker's confusion
    // table, including the clerical-review band
    s"""WITH $linkCtes
       |SELECT CASE WHEN fs_score >= 18 THEN 'match'
       |            WHEN fs_score >= 5 THEN 'possible' ELSE 'nonmatch' END AS zone,
       |  (d_id = c_custkey) AS is_true, COUNT(*) AS n,
       |  MIN(fs_score) AS min_s, MAX(fs_score) AS max_s
       |FROM fs GROUP BY 1, 2 ORDER BY 1, 2"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    linkDecided(s, dir)
      .groupBy(col("zone"), (col("d_id") === col("c_custkey")).as("is_true"))
      .agg(count(lit(1)).as("n"),
        min("fs_score").as("min_s"), max("fs_score").as("max_s"))
      .orderBy("zone", "is_true")
  }

  // ===========================================================================
  // DSIR importance weighting (TextAnalysis.dsirWeights): resample the raw
  // pool toward a target domain via smoothed unigram likelihood ratios.
  // ===========================================================================

  /** DuckDB mirror of TextAnalysis.dsirWeights with target = src0. */
  private val dsirCtes =
    s"""t AS (SELECT doc_id, source, $toksSql AS w FROM documents),
       |tk0 AS (SELECT doc_id, source = 'src0' AS is_t,
       |    unnest(list_transform(range(1, len(w) + 1),
       |      i -> {'pos': i, 'tok': w[i]})) AS s FROM t),
       |tok AS (SELECT doc_id, is_t, s.pos AS pos, s.tok AS tok FROM tk0),
       |cnt AS (SELECT tok, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
       |    SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cs FROM tok GROUP BY tok),
       |tot AS (SELECT SUM(ct) AS nt, SUM(cs) AS ns, COUNT(*) AS v FROM cnt),
       |r AS (SELECT tok, CAST((ct + 1) * (ns + v) AS DOUBLE)
       |    / CAST((cs + 1) * (nt + v) AS DOUBLE) AS p FROM cnt, tot),
       |j AS (SELECT doc_id, pos, p FROM tok JOIN r USING (tok) WHERE NOT is_t),
       |a AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_toks,
       |    list(p ORDER BY pos) AS ps FROM j GROUP BY doc_id),
       |wts AS (SELECT doc_id, n_toks,
       |    floor(list_reduce(ps, (acc, x) -> acc + x) / n_toks * 1e6 + 0.5) / 1e6
       |      AS dsir_w FROM a)""".stripMargin

  q("q_dsir_weights",
    s"""WITH $dsirCtes
       |SELECT doc_id, n_toks, dsir_w FROM wts ORDER BY doc_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val docs = tbl(s, dir, "documents")
    TextAnalysis.dsirWeights(docs, col("source") === "src0").orderBy("doc_id")
  }

  q("q_dsir_resample",
    // the resampling step: top-30 raw-pool docs by domain affinity
    // (doc_id tiebreak pins the LIMIT boundary; the driver compares the
    // selected SET, which is deterministic)
    s"""WITH $dsirCtes
       |SELECT w.doc_id, d2.source, w.dsir_w
       |FROM wts w JOIN documents d2 ON w.doc_id = d2.doc_id
       |ORDER BY w.dsir_w DESC, w.doc_id LIMIT 30"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val docs = tbl(s, dir, "documents")
    TextAnalysis.dsirWeights(docs, col("source") === "src0")
      .join(docs.select("doc_id", "source"), "doc_id")
      .orderBy(col("dsir_w").desc, col("doc_id"))
      .limit(30)
      .select("doc_id", "source", "dsir_w")
  }

  // ===========================================================================
  // Robust time-series / stats additions: EWMA (dyadic alpha, bit-exact
  // ordered fold) and median/MAD outlier summaries. ops/Stats.scala.
  // ===========================================================================

  q("q_ewma_events",
    // per-user final EWMA of event value (alpha = 1/2): both engines fold
    // the identical IEEE sequence over the (ts, event_id)-ordered list
    """WITH a AS (SELECT user_id, COUNT(*) AS n,
      |    list(value ORDER BY ts, event_id) AS xs
      |  FROM events GROUP BY user_id)
      |SELECT user_id, CAST(n AS INT) AS n,
      |  floor(list_reduce(xs, (acc, x) -> acc * 0.5e0 + x * 0.5e0) * 1e6 + 0.5) / 1e6
      |    AS ewma
      |FROM a ORDER BY user_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.ewmaLast(events(s, dir), "user_id",
        Seq(col("ts"), col("event_id")), "value")
      .orderBy("user_id")
  }

  q("q_anomaly_mad",
    // robust outliers per order priority: lower median + MAD in exact
    // decimals (physical element selection, no interpolation), outlier =
    // deviation > 3 MAD
    """WITH g AS (SELECT o_orderpriority AS grp,
      |    CAST(o_totalprice AS DECIMAL(12,2)) AS v FROM orders),
      |m AS (SELECT grp, COUNT(*) AS n, list(v ORDER BY v) AS vs FROM g GROUP BY grp),
      |m2 AS (SELECT grp, n, vs[CAST((n + 1) // 2 AS INT)] AS med, vs FROM m),
      |d AS (SELECT grp, n, med,
      |    list_sort(list_transform(vs, x -> abs(x - med))) AS ds FROM m2),
      |d2 AS (SELECT grp, n, med, ds[CAST((n + 1) // 2 AS INT)] AS mad, ds FROM d)
      |SELECT grp, n, CAST(med AS DOUBLE) AS med, CAST(mad AS DOUBLE) AS mad,
      |  CAST(len(list_filter(ds, x -> x > mad * 3)) AS INT) AS n_outliers
      |FROM d2 ORDER BY grp""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.madOutliers(
        tbl(s, dir, "orders").select(col("o_orderpriority").as("grp"),
          dec(col("o_totalprice"), 12, 2).as("v")),
        "grp", col("v"), k = 3)
      .orderBy("grp")
  }

  q("q_snapshot_diff",
    // dataset-version diff (Merge.snapshotDiff): one full-outer join on
    // the key, output proportional to the delta — added / removed /
    // changed keys between two deterministic snapshot fixtures
    """WITH o AS (SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 13 = 0 THEN 'P' ELSE o_orderstatus END AS o_orderstatus,
      |    o_totalprice FROM orders WHERE o_orderkey % 17 != 5),
      |n AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 11 != 3),
      |j AS (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
      |         WHEN n.o_orderkey IS NULL THEN 'removed'
      |         WHEN (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
      |           OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice) THEN 'changed'
      |    END AS change
      |  FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey)
      |SELECT o_orderkey, change FROM j WHERE change IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val orders = tbl(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val oldV = orders.filter(col("o_orderkey") % 17 =!= 5)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 13 === 0, "P").otherwise(col("o_orderstatus")))
    val newV = orders.filter(col("o_orderkey") % 11 =!= 3)
    Merge.snapshotDiff(oldV, newV, "o_orderkey").orderBy("o_orderkey")
  }

  // ===========================================================================
  // Round-6 batch additions: offline CUSUM change-point screen, wedge-join
  // link prediction, log-free lexical diversity (Simpson repeat probability).
  // ===========================================================================

  q("q_cusum_changepoint",
    // per-user mean-shift screen: argmax |S_i| of the centered cumulative
    // sum, kept integer as D_i = n·C_i − i·T over micro-scaled values —
    // both engines run the identical integer recurrence
    """WITH s AS (SELECT user_id,
      |    row_number() OVER w AS i,
      |    SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) OVER w AS c,
      |    SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) OVER (PARTITION BY user_id) AS t,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |d AS (SELECT user_id, i, n, abs(n * c - i * t) AS d_abs FROM s),
      |r AS (SELECT user_id, i, n, d_abs,
      |    row_number() OVER (PARTITION BY user_id ORDER BY d_abs DESC, i) AS rn FROM d)
      |SELECT user_id, CAST(n AS INT) AS n, CAST(i AS INT) AS cp_pos,
      |  round(CAST(d_abs AS DOUBLE) / (n * 1e6), 6) AS cp_stat
      |FROM r WHERE rn = 1 ORDER BY user_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.cusumChangePoint(events(s, dir), "user_id",
        Seq(col("ts"), col("event_id")), "value")
      .orderBy("user_id")
  }

  q("q_graph_link_predict",
    // missing-link candidates in the parts-sharing-a-supplier graph:
    // common-neighbor counts from the center-keyed wedge join, Jaccard
    // via the exact union identity deg(x)+deg(y)−common
    """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
      |  WHERE l_partkey < 300),
      |e AS (SELECT DISTINCT a.p AS pa, b.p AS pb FROM ps a
      |  JOIN ps b ON a.s = b.s AND a.p < b.p),
      |nb AS (SELECT pa AS v, pb AS u FROM e UNION ALL SELECT pb, pa FROM e),
      |deg AS (SELECT v, COUNT(*) AS d FROM nb GROUP BY 1),
      |w AS (SELECT a.u AS x, b.u AS y, COUNT(*) AS common FROM nb a
      |  JOIN nb b ON a.v = b.v AND a.u < b.u GROUP BY 1, 2),
      |cand AS (SELECT x, y, common FROM w
      |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = w.x AND e.pb = w.y))
      |SELECT x AS pa, y AS pb, CAST(common AS INT) AS common,
      |  round(CAST(common AS DOUBLE) / (dx.d + dy.d - common), 6) AS jaccard
      |FROM cand JOIN deg dx ON dx.v = x JOIN deg dy ON dy.v = y
      |ORDER BY common DESC, pa, pb LIMIT 20"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // same bounded fixture as q_graph_triangles (every supplier ≤ 300
    // parts), so the explicit cap is inert and the oracle needs none
    val edges = Graph.coOccurrenceEdges(
      tbl(s, dir, "lineitem").filter(col("l_partkey") < 300),
      "l_partkey", "l_suppkey", hotKeyCap = 10000)
    Graph.linkPredict(edges)
      .orderBy(col("common").desc, col("pa"), col("pb")).limit(20)
  }

  q("q_drift_chisq",
    // dataset-version drift monitor: per-priority counts of the two
    // snapshot fixtures plus each bin's two-sample chi-square
    // contribution — integer cross-products, one division at the end
    """WITH h1 AS (SELECT o_orderpriority AS bin, COUNT(*) AS o1 FROM orders
      |  WHERE o_orderkey % 17 != 5 GROUP BY 1),
      |h2 AS (SELECT o_orderpriority AS bin, COUNT(*) AS o2 FROM orders
      |  WHERE o_orderkey % 11 != 3 GROUP BY 1),
      |j AS (SELECT coalesce(h1.bin, h2.bin) AS bin, coalesce(o1, 0) AS o1,
      |    coalesce(o2, 0) AS o2 FROM h1 FULL JOIN h2 ON h1.bin = h2.bin),
      |t AS (SELECT SUM(o1) AS n1, SUM(o2) AS n2 FROM j)
      |SELECT bin, CAST(o1 AS INT) AS o1, CAST(o2 AS INT) AS o2,
      |  round(CAST((o1 * n2 - o2 * n1) * (o1 * n2 - o2 * n1) AS DOUBLE) /
      |     CAST(n1 * n2 * (o1 + o2) AS DOUBLE), 6) AS contrib
      |FROM j, t ORDER BY bin""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val orders = tbl(s, dir, "orders").select("o_orderkey", "o_orderpriority")
    Quality.histDrift(
        orders.filter(col("o_orderkey") % 17 =!= 5),
        orders.filter(col("o_orderkey") % 11 =!= 3),
        "o_orderpriority")
      .orderBy("bin")
  }

  q("stream_cdc_upsert",
    // the CDC MERGE loop end-to-end: a seeded parquet snapshot receives a
    // 4-step change feed (insert / update / delete / late upsert) through
    // Streams.cdcApply; strictly increasing seq makes the final snapshot
    // last-writer-wins per key however the files batch — which is exactly
    // what the oracle computes, plus the untouched seed rows
    """WITH o AS (SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
      |    o_orderstatus AS status FROM orders WHERE o_orderkey < 4000),
      |ch AS (
      |  SELECT k, 'I' AS op, 0 AS seq, price, status FROM o WHERE k % 3 != 0
      |  UNION ALL SELECT k, 'U', 1, CAST(price * 2 AS DECIMAL(12,2)), status FROM o WHERE k % 4 = 1
      |  UNION ALL SELECT k, 'D', 2, price, status FROM o WHERE k % 4 = 2
      |  UNION ALL SELECT k, 'U', 3, CAST(price + 10 AS DECIMAL(12,2)), status FROM o WHERE k % 5 = 3),
      |last AS (SELECT k, op, price, status,
      |    row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn FROM ch),
      |fin AS (SELECT k, price, status FROM last WHERE rn = 1 AND op != 'D'
      |  UNION ALL
      |  SELECT k, price, status FROM o
      |  WHERE k % 3 = 0 AND k NOT IN (SELECT k FROM ch))
      |SELECT k, status, CAST(price AS DOUBLE) AS price FROM fin ORDER BY k"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val o = tbl(s, dir, "orders").filter(col("o_orderkey") < 4000)
      .select(col("o_orderkey").as("k"),
        dec(col("o_totalprice"), 12, 2).as("price"),
        col("o_orderstatus").as("status"))
    val landing = cachedLanding(s"cdc:$dir") { d =>
      def w(df: DataFrame): Unit = df.write.mode("append").parquet(d)
      w(o.filter(col("k") % 3 =!= 0).select(col("k"), lit("I").as("op"),
        lit(0L).as("seq"), col("price"), col("status")))
      w(o.filter(col("k") % 4 === 1).select(col("k"), lit("U").as("op"),
        lit(1L).as("seq"), dec(col("price") * 2, 12, 2).as("price"), col("status")))
      w(o.filter(col("k") % 4 === 2).select(col("k"), lit("D").as("op"),
        lit(2L).as("seq"), col("price"), col("status")))
      w(o.filter(col("k") % 5 === 3).select(col("k"), lit("U").as("op"),
        lit(3L).as("seq"), dec(col("price") + 10, 12, 2).as("price"), col("status")))
    }
    // snapshot + checkpoint are FRESH per run (the stream mutates the
    // snapshot in place; re-using one across runs would re-merge onto the
    // final state — idempotent here, but fresh dirs keep the measured way
    // the real loop runs: seed, stream, read)
    val root = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val snap = s"$root/snap"
    o.filter(col("k") % 3 === 0).write.parquet(snap)
    val src = s.readStream.schema(s.read.parquet(landing).schema).parquet(landing)
    withShufflePartitions(s, 4) {
      val query = graft.streaming.Streams
        .cdcApply(src, snap, "k", "op", "seq", s"$root/ckpt").start()
      try query.processAllAvailable() finally query.stop()
    }
    s.read.parquet(snap)
      .select(col("k"), col("status"), col("price").cast("double").as("price"))
      .orderBy("k")
  }

  /** Unrolled DuckDB replay of `Similarity.kCenterCoreset` (k = 6 over
    * the vec_id %% 5 = 0 subset): each step computes the running min
    * squared-L2 distance (rounded 6, same as the Spark fold) to the
    * chosen set and picks the farthest point, ties to the smaller id.
    */
  private def kCenterOracle(k: Int): String = {
    def d2(a: String, b: String): String =
      s"round(list_sum(list_transform(range(1, len($a) + 1), i -> " +
        s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
        s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))), 6)"
    // the chosen center's vector enters as a 1-row CROSS JOIN (DuckDB
    // cannot subscript a parenthesized scalar subquery)
    def cv(c: String): String =
      s"CROSS JOIN (SELECT embedding AS v FROM emb " +
        s"WHERE vec_id = (SELECT id FROM $c)) cv"
    val sb = new StringBuilder
    sb ++= "WITH emb AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0), "
    sb ++= "c1 AS (SELECT MIN(vec_id) AS id FROM emb), "
    sb ++= s"m1 AS (SELECT e.vec_id, ${d2("e.embedding", "cv.v")} AS md " +
      s"FROM emb e ${cv("c1")}), "
    for (i <- 2 to k) {
      val prev = s"m${i - 1}"
      val excl = (1 until i).map(j => s"SELECT id FROM c$j").mkString(" UNION ALL ")
      sb ++= s"c$i AS (SELECT vec_id AS id, md FROM $prev WHERE vec_id NOT IN ($excl) " +
        "ORDER BY md DESC, vec_id LIMIT 1), "
      if (i < k)
        sb ++= s"m$i AS (SELECT p.vec_id, LEAST(p.md, " +
          s"${d2("e.embedding", "cv.v")}) AS md " +
          s"FROM $prev p JOIN emb e ON p.vec_id = e.vec_id ${cv(s"c$i")}), "
    }
    sb.setLength(sb.length - 2) // drop the trailing ", " after the last CTE
    sb ++= " SELECT 1 AS sel_order, (SELECT id FROM c1) AS vec_id, 0.0e0 AS md"
    for (i <- 2 to k) sb ++= s" UNION ALL SELECT $i, id, md FROM c$i"
    sb ++= " ORDER BY sel_order"
    sb.toString
  }

  q("q_coreset_kcenter", kCenterOracle(6)) { (s, dir) =>
    // farthest-point sampling: maximally spread prototypes for coreset
    // distillation / diverse seeding; k rows ever reach the driver
    Similarity.kCenterCoreset(
        tbl(s, dir, "embeddings").filter(col("vec_id") % 5 === 0), k = 6)
      .orderBy("sel_order")
  }

  q("q_label_noise",
    // kNN-disagreement label screen: 5 nearest neighbors vote; a row
    // whose own label loses the plurality (ties to the smaller label)
    // is flagged as suspect training data
    // vec_id < 2000 is the ABSOLUTE cap (inert at sf0.01): the audit's
    // kNN truth is quadratic, so its sample must not scale with the
    // corpus — the round-6 eval-cap rule; corpus-scale screening swaps
    // in the IVF path behind the same vote logic
    """WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
      |  FROM embeddings WHERE vec_id % 10 < 3 AND vec_id < 2000),
      |c AS (SELECT vec_id AS n_id, embedding AS n_vec, label AS n_label
      |  FROM embeddings WHERE vec_id % 10 < 3 AND vec_id < 2000),
      |s AS (SELECT q_id, n_id, n_label,
      |  list_sum(list_transform(range(1, len(q_vec) + 1), i -> CAST(q_vec[i] AS DOUBLE) * CAST(n_vec[i] AS DOUBLE))) /
      |  (sqrt(list_sum(list_transform(range(1, len(q_vec) + 1), i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE)))) *
      |   sqrt(list_sum(list_transform(range(1, len(n_vec) + 1), i -> CAST(n_vec[i] AS DOUBLE) * CAST(n_vec[i] AS DOUBLE))))) AS cosim
      |  FROM q JOIN c ON q_id != n_id),
      |r AS (SELECT q_id, n_label,
      |    row_number() OVER (PARTITION BY q_id ORDER BY round(cosim, 6) DESC, n_id) AS rn FROM s),
      |v AS (SELECT q_id, n_label, COUNT(*) AS nv FROM r WHERE rn <= 5 GROUP BY 1, 2),
      |m AS (SELECT q_id, n_label, nv,
      |    row_number() OVER (PARTITION BY q_id ORDER BY nv DESC, n_label) AS mrn FROM v)
      |SELECT m.q_id AS vec_id, q.q_label AS label, m.n_label AS knn_label,
      |  CAST(nv AS INT) AS n_agree, m.n_label != q.q_label AS flagged
      |FROM m JOIN q ON m.q_id = q.q_id WHERE mrn = 1 ORDER BY vec_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Eval.labelNoiseKnn(
        tbl(s, dir, "embeddings")
          .filter(pmod(col("vec_id"), lit(10)) < 3 && col("vec_id") < 2000),
        k = 5)
      .orderBy("vec_id")
  }

  q("q_winsorize",
    // robust per-priority mean: clamp at the exact physical p05/p95
    // elements, exact decimal clamped sum, one final division
    """WITH g AS (SELECT o_orderpriority AS grp,
      |    CAST(o_totalprice AS DECIMAL(12,2)) AS v FROM orders),
      |m AS (SELECT grp, COUNT(*) AS n, list(v ORDER BY v) AS vs FROM g GROUP BY 1),
      |b AS (SELECT grp, n, vs[CAST(1 + (n - 1) * 5 // 100 AS INT)] AS lo,
      |    vs[CAST(1 + (n - 1) * 95 // 100 AS INT)] AS hi FROM m),
      |j AS (SELECT g.grp, n, lo, hi, LEAST(GREATEST(v, lo), hi) AS cv
      |  FROM g JOIN b ON g.grp = b.grp)
      |SELECT grp, CAST(n AS INT) AS n, CAST(lo AS DOUBLE) AS lo,
      |  CAST(hi AS DOUBLE) AS hi,
      |  round(CAST(SUM(cv) AS DOUBLE) / n, 6) AS mean_w
      |FROM j GROUP BY grp, n, lo, hi ORDER BY grp"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.winsorizedMean(tbl(s, dir, "orders"), "o_orderpriority",
        dec(col("o_totalprice"), 12, 2))
      .orderBy("grp")
  }

  q("q_scd2_lookup",
    // point-in-time enrichment: each event joined to the dimension
    // VERSION valid at its timestamp — the SCD2 intervals consumed
    // through the custom as-of exec (latest valid_from <= ts)
    """WITH v AS (SELECT o_custkey, ROW_NUMBER() OVER w AS version, o_orderkey,
      |    o_orderdate AS valid_from FROM orders WHERE o_custkey < 200
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |j AS (SELECT e.event_id, e.user_id, v.version, v.o_orderkey,
      |    row_number() OVER (PARTITION BY e.event_id
      |      ORDER BY v.valid_from DESC, v.version DESC) AS rn
      |  FROM events e JOIN v ON v.o_custkey = e.user_id AND v.valid_from <= e.ts)
      |SELECT event_id, user_id, CAST(version AS INT) AS version, o_orderkey
      |FROM j WHERE rn = 1 ORDER BY event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val versions = tbl(s, dir, "orders").filter(col("o_custkey") < 200)
      .select(col("o_custkey"), row_number().over(w).cast("int").as("version"),
        col("o_orderkey"), col("o_orderdate").as("valid_from"))
    graft.plans.AsOfJoinPlan.asofMerge(events(s, dir), versions,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "valid_from", rightTie = "version")
      .select("event_id", "user_id", "version", "o_orderkey")
      .orderBy("event_id")
  }

  q("q_attribution_lasttouch",
    // marketing attribution: each purchase credits the most recent PRIOR
    // click of the same user (IGNORE NULLS last_value over the
    // everything-before-me frame); null = organic purchase
    """WITH e AS (SELECT user_id, event_id, ts, event_type, value FROM events
      |  WHERE user_id < 100),
      |a AS (SELECT user_id, event_id, event_type, value,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_event_id
      |  FROM e)
      |SELECT event_id, user_id, click_event_id, value FROM a
      |WHERE event_type = 'purchase' ORDER BY event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, dir).filter(col("user_id") < 100)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w).as("click_event_id"))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "click_event_id", "value")
      .orderBy("event_id")
  }

  q("q_graph_clustering_coef",
    // local clustering coefficient 2t/d(d-1) per vertex of the
    // parts-sharing-a-supplier graph — integer triangle counts and
    // degrees, one division; top-25 most clique-like vertices
    """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
      |  WHERE l_partkey < 300),
      |e AS (SELECT DISTINCT a.p AS pa, b.p AS pb FROM ps a
      |  JOIN ps b ON a.s = b.s AND a.p < b.p),
      |tri AS (SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z FROM e e1
      |  JOIN e e2 ON e1.pb = e2.pa
      |  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
      |tv AS (SELECT unnest([x, y, z]) AS v FROM tri),
      |tc AS (SELECT v, COUNT(*) AS t FROM tv GROUP BY 1),
      |nb AS (SELECT pa AS v FROM e UNION ALL SELECT pb FROM e),
      |dg AS (SELECT v, COUNT(*) AS d FROM nb GROUP BY 1),
      |c AS (SELECT dg.v, d, coalesce(t, 0) AS t FROM dg LEFT JOIN tc
      |  ON dg.v = tc.v WHERE d >= 2)
      |SELECT v, CAST(d AS INT) AS d, CAST(t AS INT) AS t,
      |  round(CAST(t * 2 AS DOUBLE) / (d * (d - 1)), 6) AS coef
      |FROM c ORDER BY coef DESC, v LIMIT 25"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val edges = Graph.coOccurrenceEdges(
      tbl(s, dir, "lineitem").filter(col("l_partkey") < 300),
      "l_partkey", "l_suppkey", hotKeyCap = 10000)
    Graph.clusteringCoefficient(edges)
      .orderBy(col("coef").desc, col("v")).limit(25)
  }

  q("q_sketch_join_size",
    // join-size estimation BEFORE running the join: KMV distinct + row
    // counts per side, key overlap from the Jaccard identity, |A⋈B| ≈
    // Î·(na/d̂a)·(nb/d̂b); the exact Σ c_a·c_b companion rides along
    s"""WITH ka AS (SELECT o_custkey AS tok FROM orders),
       |kb AS (SELECT user_id AS tok FROM events),
       |sha AS (SELECT DISTINCT ${md5Hash60Sql("tok")} AS h FROM ka),
       |shb AS (SELECT DISTINCT ${md5Hash60Sql("tok")} AS h FROM kb),
       |cna AS (SELECT COUNT(*) AS na FROM ka),
       |cnb AS (SELECT COUNT(*) AS nb FROM kb),
       |ra AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk,
       |  COUNT(*) OVER () AS nh FROM sha),
       |rb AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk,
       |  COUNT(*) OVER () AS nh FROM shb),
       |eda AS (SELECT CASE WHEN nh < 128 THEN CAST(nh AS DOUBLE)
       |    ELSE round(127.0 * 1152921504606846976.0 / h, 6) END AS da
       |  FROM ra WHERE rk = CASE WHEN nh < 128 THEN 1 ELSE 128 END),
       |edb AS (SELECT CASE WHEN nh < 128 THEN CAST(nh AS DOUBLE)
       |    ELSE round(127.0 * 1152921504606846976.0 / h, 6) END AS db
       |  FROM rb WHERE rk = CASE WHEN nh < 128 THEN 1 ELSE 128 END),
       |siga AS (SELECT h FROM ra WHERE rk <= 128),
       |sigb AS (SELECT h FROM rb WHERE rk <= 128),
       |u AS (SELECT DISTINCT h FROM (SELECT h FROM siga UNION ALL SELECT h FROM sigb)),
       |tk AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk FROM u),
       |ji AS (SELECT round(CAST(COUNT(*) AS DOUBLE) / 128, 6) AS ej FROM tk
       |  WHERE rk <= 128 AND h IN (SELECT h FROM siga) AND h IN (SELECT h FROM sigb)),
       |ex AS (SELECT CAST(coalesce(SUM(ca * cb), 0) AS BIGINT) AS n_exact FROM
       |  (SELECT tok AS kk, COUNT(*) AS ca FROM ka GROUP BY 1) x JOIN
       |  (SELECT tok AS kk, COUNT(*) AS cb FROM kb GROUP BY 1) y ON x.kk = y.kk),
       |est AS (SELECT round(ej * (da + db) / (1e0 + ej)
       |    * (CAST(na AS DOUBLE) / da) * (CAST(nb AS DOUBLE) / db), 6) AS est_join,
       |  n_exact FROM ji, eda, edb, cna, cnb, ex)
       |SELECT est_join, n_exact,
       |  round((est_join - n_exact) / n_exact, 6) AS rel_err FROM est"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Sketch.kmvJoinSize(
      tbl(s, dir, "orders").select("o_custkey"), "o_custkey",
      events(s, dir).select("user_id"), "user_id", k = 128)
  }

  q("stream_drift",
    // live drift monitoring: the streaming half's complete-mode type
    // histogram against the static reference half, scored with the same
    // integer chi-square contributions as the batch monitor
    """WITH h1 AS (SELECT event_type AS bin, COUNT(*) AS o1 FROM events
      |  WHERE event_id % 2 = 0 GROUP BY 1),
      |h2 AS (SELECT event_type AS bin, COUNT(*) AS o2 FROM events
      |  WHERE event_id % 2 = 1 GROUP BY 1),
      |j AS (SELECT coalesce(h1.bin, h2.bin) AS bin, coalesce(o1, 0) AS o1,
      |    coalesce(o2, 0) AS o2 FROM h1 FULL JOIN h2 ON h1.bin = h2.bin),
      |t AS (SELECT SUM(o1) AS n1, SUM(o2) AS n2 FROM j)
      |SELECT bin, CAST(o1 AS INT) AS o1, CAST(o2 AS INT) AS o2,
      |  round(CAST((o1 * n2 - o2 * n1) * (o1 * n2 - o2 * n1) AS DOUBLE) /
      |     CAST(n1 * n2 * (o1 + o2) AS DOUBLE), 6) AS contrib
      |FROM j, t ORDER BY bin""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val ev = events(s, dir).select("event_id", "event_type")
    val landing = cachedLanding(s"drift:$dir") { d =>
      ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(d)
    }
    val qname = "graft_stream_drift"
    withShufflePartitions(s, 4) {
      val query = s.readStream.schema(s.read.parquet(landing).schema)
        .parquet(landing)
        .groupBy(col("event_type").as("bin")).agg(count(lit(1)).as("o2"))
        .writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
      try query.processAllAvailable() finally query.stop()
    }
    val ref = ev.filter(col("event_id") % 2 === 0)
      .groupBy(col("event_type").as("bin")).agg(count(lit(1)).as("o1"))
    Quality.histDriftCounts(ref, s.table(qname)).orderBy("bin")
  }

  q("multimodal_audio_fingerprint",
    // equal-content audio dedup through REAL WAV decode: block-energy
    // vectors digest the PCM, seeds repeat every 20 ids so the family
    // structure is known; the oracle replays the integer PCM generator
    """WITH ids AS (SELECT doc_id AS id, doc_id % 20 AS seed,
      |    CAST(400 + doc_id % 20 AS INT) AS n FROM documents WHERE doc_id < 50),
      |smp AS (SELECT id, n, g.i,
      |    (((seed * 1315423911 + g.i * 2654435761) & 65535) - 32768) AS v
      |  FROM ids, (SELECT unnest(range(420)) AS i) g WHERE g.i < n),
      |blk AS (SELECT id, i // 128 AS b, SUM(v * v) AS e FROM smp GROUP BY 1, 2),
      |fp AS (SELECT id, CAST(COUNT(*) AS INT) AS n_blocks,
      |    CAST(SUM(e) AS BIGINT) AS total_energy,
      |    string_agg(CAST(e AS VARCHAR), ',' ORDER BY b) AS sig FROM blk GROUP BY 1),
      |fam AS (SELECT sig, MIN(id) AS family FROM fp GROUP BY 1)
      |SELECT fp.id, n_blocks, total_energy, fam.family,
      |  fp.id != fam.family AS is_dup
      |FROM fp JOIN fam ON fp.sig = fam.sig ORDER BY fp.id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val ids = tbl(s, dir, "documents").filter(col("doc_id") < 50).select("doc_id")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val media = ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        org.apache.spark.sql.Row(id,
          Multimodal.syntheticWav(id % 20, 8000, 400 + (id % 20).toInt))
      }
    }(enc)
    val fp = Multimodal.audioEnergyFingerprint(media, "doc_id", blockSize = 128)
    val fam = fp.groupBy("digest").agg(min(col("id")).as("family"))
    fp.join(fam, "digest")
      .select(col("id"), col("n_blocks"), col("total_energy"), col("family"),
        (col("id") =!= col("family")).as("is_dup"))
      .orderBy("id")
  }

  q("text_vocab_prune",
    // the tokenizer min_df/max_df gate, audited before adoption: kept
    // vocabulary size and per-source OOV rate under df >= 3 AND
    // df <= half the corpus (integer cross-multiplied ratio)
    s"""WITH toks AS (SELECT source, unnest($toksSql) AS tok FROM documents),
       |dt AS (SELECT DISTINCT doc_id, unnest($toksSql) AS tok FROM documents),
       |dfq AS (SELECT tok, COUNT(*) AS dfq FROM dt GROUP BY 1),
       |nd AS (SELECT COUNT(*) AS nd FROM documents),
       |kept AS (SELECT tok FROM dfq, nd WHERE dfq >= 3 AND dfq * 2 <= nd * 1),
       |vs AS (SELECT COUNT(*) AS vocab_size FROM kept),
       |cov AS (SELECT source, COUNT(*) AS n_tokens,
       |    SUM(CASE WHEN tok IN (SELECT tok FROM kept) THEN 1 ELSE 0 END) AS n_covered
       |  FROM toks GROUP BY 1)
       |SELECT source, CAST(n_tokens AS INT) AS n_tokens,
       |  CAST(n_covered AS INT) AS n_covered, CAST(vocab_size AS INT) AS vocab_size,
       |  round(CAST(n_tokens - n_covered AS DOUBLE) / n_tokens, 6) AS oov_rate
       |FROM cov, vs ORDER BY source"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.vocabPruneStats(tbl(s, dir, "documents"),
        minDf = 3, maxDfNum = 1, maxDfDen = 2)
      .orderBy("source")
  }

  q("text_heaps_law",
    // vocabulary-growth curve (Heaps' law): cumulative tokens and
    // distinct types at 50-doc checkpoints; each type charges its FIRST
    // document, cumulative sums via the windowless prefix machinery —
    // all integers, bit-exact
    s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |pb AS (SELECT doc_id // 50 AS bucket, COUNT(*) AS toks FROM toks GROUP BY 1),
       |ft AS (SELECT tok, MIN(doc_id) AS first_id FROM toks GROUP BY 1),
       |nt AS (SELECT first_id // 50 AS bucket, COUNT(*) AS new_types FROM ft GROUP BY 1),
       |g AS (SELECT pb.bucket, pb.toks, COALESCE(nt.new_types, 0) AS new_types
       |  FROM pb LEFT JOIN nt USING (bucket))
       |SELECT CAST(bucket AS BIGINT) AS bucket,
       |  CAST((bucket + 1) * 50 AS BIGINT) AS docs_seen,
       |  CAST(SUM(toks) OVER (ORDER BY bucket) AS BIGINT) AS tokens_seen,
       |  CAST(SUM(new_types) OVER (ORDER BY bucket) AS BIGINT) AS vocab
       |FROM g ORDER BY bucket"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.heapsLaw(tbl(s, dir, "documents"), bucketDocs = 50)
      .orderBy("bucket")
  }

  q("text_vocab_coverage",
    // tokenizer-budget planning table: share of all token OCCURRENCES
    // the k most frequent types cover, k in {10, 100, 1000} — global
    // rank by (freq desc, tok) via the windowless rank kernel, one
    // truncating integer division per row
    s"""WITH toks AS (SELECT unnest($toksSql) AS tok FROM documents),
       |f AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY 1),
       |r AS (SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rnk FROM f),
       |t AS (SELECT SUM(freq) AS total FROM f),
       |c AS (SELECT ks.k, SUM(CASE WHEN rnk <= ks.k THEN freq ELSE 0 END) AS covered
       |  FROM r CROSS JOIN (VALUES (10), (100), (1000)) ks(k) GROUP BY 1)
       |SELECT CAST(k AS INT) AS k, CAST(covered AS BIGINT) AS covered,
       |  CAST(total AS BIGINT) AS total,
       |  CAST(covered * 1000000 // total AS BIGINT) AS coverage_x1e6
       |FROM c, t ORDER BY k"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.vocabCoverage(tbl(s, dir, "documents"), Seq(10, 100, 1000))
      .orderBy("k")
  }

  q("text_zipf_decades",
    // Zipf profile by rank decade (ranks [10^d, 10^(d+1))): mean
    // freq×rank product per decade, ×1000 truncating — flat across
    // decades is Zipf; a collapsing tail decade is the vocab-prune
    // threshold. Decade = decimal-digit count of the rank, exact
    s"""WITH toks AS (SELECT unnest($toksSql) AS tok FROM documents),
       |f AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY 1),
       |r AS (SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rnk FROM f),
       |d AS (SELECT length(CAST(rnk AS VARCHAR)) - 1 AS decade,
       |    COUNT(*) AS n_tokens, SUM(freq * rnk) AS fr_sum FROM r GROUP BY 1)
       |SELECT CAST(decade AS INT) AS decade, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(fr_sum AS BIGINT) AS fr_sum,
       |  CAST(fr_sum * 1000 // n_tokens AS BIGINT) AS fr_avg_x1000
       |FROM d ORDER BY decade"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.zipfDecades(tbl(s, dir, "documents"))
      .orderBy("decade")
  }

  /** Messy-URL fixture (Spark side): deterministic from doc_id — case,
    * default ports, www, tracking params, param order, fragments all
    * vary so canonicalization has real work per rule.
    */
  private def messyUrl(d: Column): Column = concat(
    when(d % 2 === 0,
      concat(lit("HTTPS://WWW.Site"), (d % 5).cast("string"),
        lit(".COM:443/p/"), (d % 17).cast("string")))
      .otherwise(concat(lit("http://site"), (d % 5).cast("string"),
        lit(".com:80/p/"), (d % 17).cast("string"))),
    when(d % 3 === 0, lit("?b=2&utm_source=feed&a=1"))
      .when(d % 3 === 1, lit("?a=1&b=2&gclid=xyz")).otherwise(lit("")),
    when(d % 4 === 0, lit("#frag")).otherwise(lit("")))

  /** DuckDB CTE chain replaying the same fixture + every
    * [[TextAnalysis.canonicalizeUrl]] rule; ends in `canon(doc_id, curl)`.
    */
  private val urlCanonCtes: String = {
    val fixture =
      """CASE WHEN doc_id % 2 = 0
        |    THEN 'HTTPS://WWW.Site' || (doc_id % 5) || '.COM:443/p/' || (doc_id % 17)
        |    ELSE 'http://site' || (doc_id % 5) || '.com:80/p/' || (doc_id % 17) END ||
        |  CASE doc_id % 3 WHEN 0 THEN '?b=2&utm_source=feed&a=1'
        |    WHEN 1 THEN '?a=1&b=2&gclid=xyz' ELSE '' END ||
        |  CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END""".stripMargin
    s"""u AS (SELECT doc_id, $fixture AS url FROM documents),
       |c AS (SELECT doc_id, regexp_replace(url, '#.*$$', '') AS nf FROM u),
       |p AS (SELECT doc_id,
       |    lower(regexp_extract(nf, '^([^:/?#]+)://', 1)) AS scheme,
       |    lower(regexp_extract(nf, '^[^:/?#]+://([^/?#]*)', 1)) AS hostport,
       |    regexp_extract(nf, '^[^:/?#]+://[^/?#]*(.*)$$', 1) AS pathq FROM c),
       |h AS (SELECT *, regexp_replace(CASE
       |      WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
       |      WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
       |      ELSE hostport END, '^www\\.', '') AS host FROM p),
       |pq AS (SELECT *, regexp_extract(pathq, '^([^?]*)', 1) AS path,
       |    CASE WHEN contains(pathq, '?')
       |      THEN regexp_replace(pathq, '^[^?]*\\?', '') ELSE '' END AS query FROM h),
       |qq AS (SELECT *, COALESCE(array_to_string(list_sort(list_filter(
       |      string_split(query, '&'),
       |      x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid)='))),
       |    '&'), '') AS cq FROM pq),
       |canon AS (SELECT doc_id, scheme || '://' || host ||
       |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
       |    (CASE WHEN cq = '' THEN '' ELSE '?' || cq END) AS curl FROM qq)"""
      .stripMargin
  }

  q("q_url_canonicalize",
    // URL canonicalization + dedup (the crawl-pipeline normalization:
    // case, default ports, www, tracking params, param order, fragments
    // all collapse). The messy-URL fixture derives deterministically
    // from doc_id in BOTH engines; the oracle replays every rule with
    // the same regex/list primitives — exact strings end to end
    s"""WITH $urlCanonCtes
       |SELECT curl, CAST(COUNT(*) AS BIGINT) AS n_urls,
       |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
       |FROM canon GROUP BY 1 ORDER BY curl"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.canonicalizeUrl(messyUrl(col("doc_id"))).as("curl"))
      .groupBy("curl")
      .agg(count(lit(1)).as("n_urls"), min("doc_id").as("first_doc"))
      .orderBy("curl")
  }

  q("stream_url_dedup",
    // ingest-time canonical-URL dedup: the crawl frontier lands the SAME
    // pages under tracking-param/case/port variants (and the whole feed
    // replays once — the at-least-once scenario); the stream
    // canonicalizes per row and keeps one row per canonical form. The
    // oracle is the distinct canonical-URL set — deterministic no matter
    // which physical variant arrived first.
    s"""WITH $urlCanonCtes
       |SELECT DISTINCT curl FROM canon ORDER BY curl"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val docs = tbl(s, dir, "documents").select(col("doc_id"))
    val landing = cachedLanding(s"urldedup:$dir") { d =>
      docs.write.mode("append").parquet(d)
      docs.write.mode("append").parquet(d) // the replayed feed
    }
    val src = s.readStream.schema(docs.schema).parquet(landing)
      .withColumn("curl",
        TextAnalysis.canonicalizeUrl(messyUrl(col("doc_id"))))
      // same epoch-clamp + span-bounding discipline as stream_dedup
      .withColumn("ts",
        timestamp_micros((lit(86400L) + col("doc_id") % 1800L) * 1000000L))
    val qname = "graft_stream_url_dedup"
    withShufflePartitions(s, 4) {
      val query = graft.streaming.Streams.dedupStream(src, "curl", "ts")
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      try query.processAllAvailable() finally query.stop()
    }
    s.table(qname).select(col("curl")).distinct().orderBy("curl")
  }

  q("q_spearman",
    // Spearman rank correlation of quantity vs price, windowless: exact
    // integer doubled average ranks from the prefix machinery, CENTERED
    // so the power sums cancel nothing (Σu = 0 exactly) — the oracle's
    // window form replays the identical integers, one IEEE combination
    """WITH base AS (SELECT CAST(l_quantity AS DECIMAL(12,2)) AS x,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) AS y FROM lineitem),
      |nn AS (SELECT COUNT(*) AS n FROM base),
      |gx AS (SELECT x, COUNT(*) AS c FROM base GROUP BY 1),
      |rx AS (SELECT x, 2 * SUM(c) OVER (ORDER BY x) - c + 1 AS r2 FROM gx),
      |gy AS (SELECT y, COUNT(*) AS c FROM base GROUP BY 1),
      |ry AS (SELECT y, 2 * SUM(c) OVER (ORDER BY y) - c + 1 AS r2 FROM gy),
      |j AS (SELECT rx.r2 - (nn.n + 1) AS ux, ry.r2 - (nn.n + 1) AS uy
      |  FROM base JOIN rx USING (x) JOIN ry USING (y) CROSS JOIN nn),
      |s AS (SELECT COUNT(*) AS n, SUM(CAST(ux * uy AS DECIMAL(38,0))) AS suv,
      |  SUM(CAST(ux * ux AS DECIMAL(38,0))) AS suu,
      |  SUM(CAST(uy * uy AS DECIMAL(38,0))) AS svv FROM j)
      |SELECT CAST(n AS BIGINT) AS n, round(CAST(suv AS DOUBLE) /
      |  (sqrt(CAST(suu AS DOUBLE)) * sqrt(CAST(svv AS DOUBLE))), 6) AS rho
      |FROM s""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.spearman(tbl(s, dir, "lineitem"),
      dec(col("l_quantity"), 12, 2), dec(col("l_extendedprice"), 12, 2))
  }

  q("q_cramers_v",
    // Cramér's V association of nation × market segment: contingency
    // lifts in truncating ×1e6 fixed point, χ² from an exact decimal
    // sum (clamped at 0 — truncation can push independence a hair
    // negative), one IEEE sqrt on the single result row
    """WITH cells AS (SELECT c_nationkey AS a, c_mktsegment AS b, COUNT(*) AS o
      |  FROM customer GROUP BY 1, 2),
      |ra AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY 1),
      |cb AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY 1),
      |tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT a) AS ka,
      |  COUNT(DISTINCT b) AS kb FROM cells),
      |l AS (SELECT n, ka, kb, o * (o * 1000000 * n // (ra * cb)) AS olift
      |  FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot),
      |s AS (SELECT n, ka, kb, SUM(CAST(olift AS DECIMAL(38,0))) AS s
      |  FROM l GROUP BY 1, 2, 3)
      |SELECT CAST(n AS BIGINT) AS n, CAST(ka AS BIGINT) AS ka,
      |  CAST(kb AS BIGINT) AS kb,
      |  CAST(GREATEST(s - CAST(n AS DECIMAL(38,0)) * 1000000, 0) AS BIGINT)
      |    AS chi2_x1e6,
      |  round(sqrt(CAST(GREATEST(s - CAST(n AS DECIMAL(38,0)) * 1000000, 0)
      |      AS DOUBLE) /
      |    CAST(n * (LEAST(ka, kb) - 1) * 1000000 AS DOUBLE)), 6) AS cramers_v
      |FROM s""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.cramersV(tbl(s, dir, "customer"),
      col("c_nationkey"), col("c_mktsegment"))
  }

  q("q_rolling_corr",
    // trailing-20 Pearson correlation of quantity vs price per supplier:
    // exact decimal power sums over a ROWS frame, one fixed IEEE
    // combination per emitted row; incomplete/degenerate windows drop
    """WITH g AS (SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
      |    CAST(l_quantity AS DECIMAL(12,2)) AS x,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) AS y
      |  FROM lineitem WHERE l_suppkey < 20),
      |s AS (SELECT l_suppkey, row_number() OVER wo AS rn,
      |    COUNT(*) OVER w AS n, SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
      |    SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy,
      |    SUM(x * y) OVER w AS sxy
      |  FROM g WINDOW
      |    wo AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber),
      |    w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT l_suppkey, CAST(rn AS INT) AS rn,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr
      |FROM s WHERE n = 20 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      |ORDER BY l_suppkey, rn""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.rollingCorr(tbl(s, dir, "lineitem").filter(col("l_suppkey") < 20),
        "l_suppkey",
        Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")),
        dec(col("l_quantity"), 12, 2), dec(col("l_extendedprice"), 12, 2),
        window = 20)
      .orderBy("l_suppkey", "rn")
  }

  /** Unrolled DuckDB replay of `Graph.kCore(k = 3)` over the
    * parts-sharing-a-supplier fixture: `rounds` peel passes (drop
    * degree-<k vertices, keep edges with both endpoints surviving);
    * peeling is monotone, so rounds beyond convergence are no-ops.
    */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    // MATERIALIZED: each round references the previous edge set three
    // times (degree count + both endpoint filters) — inlined CTEs would
    // re-expand the whole chain exponentially
    sb ++= "WITH p AS (SELECT o_orderkey % 3000 AS a, o_custkey % 3000 AS b FROM orders), "
    sb ++= "e0 AS MATERIALIZED (SELECT DISTINCT LEAST(a, b) AS pa, GREATEST(a, b) AS pb FROM p WHERE a != b), "
    for (i <- 0 until rounds) {
      sb ++= s"d$i AS MATERIALIZED (SELECT v, COUNT(*) AS d FROM (SELECT pa AS v FROM e$i UNION ALL SELECT pb FROM e$i) GROUP BY 1), "
      sb ++= s"k$i AS MATERIALIZED (SELECT v FROM d$i WHERE d >= $k), "
      sb ++= s"e${i + 1} AS MATERIALIZED (SELECT pa, pb FROM e$i WHERE pa IN (SELECT v FROM k$i) AND pb IN (SELECT v FROM k$i)), "
    }
    sb ++= s"fin AS (SELECT v, COUNT(*) AS d FROM (SELECT pa AS v FROM e$rounds UNION ALL SELECT pb FROM e$rounds) GROUP BY 1) "
    sb ++= "SELECT v, CAST(d AS INT) AS d FROM fin ORDER BY v"
    sb.toString
  }

  /** The k-core fixture is the ORDER-HASH graph (endpoints o_orderkey
    * and o_custkey mod 3000): near-random with spread degrees, so at
    * sf0.01 the 6-core peel genuinely cascades (3 rounds, half the
    * vertices drop) — the supplier co-occurrence graph is too close to
    * complete to ever peel.
    */
  q("q_graph_kcore", kCoreOracle(6, 12)) { (s, dir) =>
    val p = tbl(s, dir, "orders")
      .select((col("o_orderkey") % 3000).as("a"), (col("o_custkey") % 3000).as("b"))
      .filter(col("a") =!= col("b"))
    val edges = p.select(least(col("a"), col("b")).as("pa"),
      greatest(col("a"), col("b")).as("pb")).distinct()
    Graph.kCore(edges, k = 6, maxIters = 12).orderBy("v")
  }

  q("stream_ewma",
    // the O(1)-state streaming EWMA scorer driver-green: integer fold
    // s ← (3s + v·2^32) div 4 per event type, replayed row-for-row by a
    // recursive CTE (single-batch landing, per-batch sort = oracle order)
    """WITH RECURSIVE e AS (SELECT event_type, event_id, epoch_us(ts) AS tsm,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events WHERE user_id < 40),
      |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY tsm, event_id) AS rn FROM e),
      |rec(rn, event_type, event_id, s, spike) AS (
      |  SELECT rn, event_type, event_id, cents * 4294967296, FALSE FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.rn, r.event_type, r.event_id,
      |    (3 * rec.s + r.cents * 4294967296) // 4,
      |    r.cents * 4294967296 > 2 * rec.s
      |  FROM rec JOIN r ON r.event_type = rec.event_type AND r.rn = rec.rn + 1)
      |SELECT event_type, event_id, s AS smoothed, spike FROM rec
      |ORDER BY event_type, event_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val ev = events(s, dir).filter(col("user_id") < 40)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts").cast(TimestampType)).as("ts_micros"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val landing = cachedLanding(s"ewma:$dir") { d =>
      ev.write.mode("append").parquet(d)
    }
    val qname = "graft_stream_ewma"
    withShufflePartitions(s, 4) {
      import s.implicits._
      val src = s.readStream.schema(s.read.parquet(landing).schema)
        .parquet(landing).as[graft.streaming.Streams.EwmaRow]
      val query = graft.streaming.Streams.ewmaState(src)
        .toDF().writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      try query.processAllAvailable() finally query.stop()
    }
    s.table(qname)
      .select(col("event_type"), col("event_id"),
        col("s").as("smoothed"), col("spike"))
      .orderBy("event_type", "event_id")
  }

  q("q_ols_by_group",
    // per-flag regression price = a + b·quantity with R², all from the
    // six exact decimal power sums (one shuffle of six numbers per group)
    """WITH g AS (SELECT l_returnflag AS grp,
      |    CAST(l_quantity AS DECIMAL(12,2)) AS x,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) AS y FROM lineitem),
      |s AS (SELECT grp, COUNT(*) AS n,
      |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(x * x) AS DOUBLE) AS sxx,
      |    CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(y * y) AS DOUBLE) AS syy,
      |    CAST(SUM(x * y) AS DOUBLE) AS sxy
      |  FROM g GROUP BY 1)
      |SELECT grp, n,
      |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
      |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept,
      |  round((n * sxy - sx * sy) * (n * sxy - sx * sy) /
      |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
      |FROM s ORDER BY grp""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.olsFit(tbl(s, dir, "lineitem")
        .select(col("l_returnflag").as("grp"),
          col("l_quantity"), col("l_extendedprice")),
        "grp", "l_quantity", "l_extendedprice")
      .orderBy("grp")
  }

  q("q_pareto_abc",
    // ABC/Pareto inventory classification: cumulative revenue share with
    // integer cross-multiplied 80/95 boundaries. The cumsum runs in
    // exact integer CENTS through Ranks.prefixCountsBy (range-bucketed
    // distributed prefix sums over (rev desc, part) — no unpartitioned
    // window, so the plan holds at any catalog cardinality); cents_cum
    // /100 = the oracle's decimal cumsum exactly, and the class
    // comparisons cross-multiply so both engines compare integers
    """WITH r AS (SELECT l_partkey AS part,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      |  FROM lineitem WHERE l_partkey < 500 GROUP BY 1),
      |t AS (SELECT SUM(rev) AS tot FROM r),
      |c AS (SELECT part, rev, SUM(rev) OVER (ORDER BY rev DESC, part) AS cum FROM r)
      |SELECT part, CAST(rev AS DOUBLE) AS rev,
      |  CASE WHEN cum * 100 <= tot * 80 THEN 'A'
      |       WHEN cum * 100 <= tot * 95 THEN 'B' ELSE 'C' END AS abc
      |FROM c, t ORDER BY part""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val r = tbl(s, dir, "lineitem").filter(col("l_partkey") < 500)
      .groupBy(col("l_partkey").as("part"))
      .agg(sum(dec(col("l_extendedprice"), 12, 2)).as("rev"))
    val c = r.select(col("part"), col("rev"),
      (col("rev") * 100).cast("long").as("cents"), (-col("rev")).as("nrev"))
      .localCheckpoint() // consumers: total + the 4 Ranks actions
    val tot = c.agg(sum("cents").as("totc"))
    Ranks.prefixCountsBy(c, Seq("nrev", "part"), Seq("cents"))
      .crossJoin(broadcast(tot))
      .select(col("part"), col("rev").cast("double").as("rev"),
        when(col("cents_cum") * 100 <= col("totc") * 80, "A")
          .when(col("cents_cum") * 100 <= col("totc") * 95, "B")
          .otherwise("C").as("abc"))
      .orderBy("part")
  }

  q("q_seasonality_profile",
    // hour-of-week activity profile with per-cell chi-square deviation
    // from uniform — (168·o − T)²/(168·T), integers until one division
    """WITH e AS (SELECT isodow(ts) AS dow, hour(ts) AS hod FROM events),
      |c AS (SELECT dow, hod, COUNT(*) AS n FROM e GROUP BY 1, 2),
      |t AS (SELECT SUM(n) AS tot FROM c)
      |SELECT CAST(dow AS INT) AS dow, CAST(hod AS INT) AS hod,
      |  CAST(n AS INT) AS n,
      |  round(CAST((168 * n - tot) * (168 * n - tot) AS DOUBLE) /
      |    CAST(168 * tot AS DOUBLE), 6) AS contrib
      |FROM c, t ORDER BY dow, hod""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val c = events(s, dir)
      .select((weekday(col("ts")) + 1).as("dow"), hour(col("ts")).as("hod"))
      .groupBy("dow", "hod").agg(count(lit(1)).as("n"))
    val t = c.agg(sum("n").as("tot"))
    c.crossJoin(broadcast(t))
      .select(col("dow").cast("int").as("dow"), col("hod").cast("int").as("hod"),
        col("n").cast("int").as("n"),
        round(((lit(168) * col("n") - col("tot"))
            * (lit(168) * col("n") - col("tot"))).cast("double")
          / (lit(168) * col("tot")).cast("double"), 6).as("contrib"))
      .orderBy("dow", "hod")
  }

  q("q_join_fanout_histogram",
    // join-skew preflight: per-key fanout products c_a·c_b bucketed by
    // DIGIT COUNT (string length — log-free), with keys and rows per
    // bucket; pairs with q_sketch_join_size as the pre-join report
    """WITH ca AS (SELECT o_custkey AS kk, COUNT(*) AS ca FROM orders GROUP BY 1),
      |cb AS (SELECT user_id AS kk, COUNT(*) AS cb FROM events GROUP BY 1),
      |p AS (SELECT ca.kk, ca.ca * cb.cb AS fanout FROM ca JOIN cb ON ca.kk = cb.kk)
      |SELECT CAST(length(CAST(fanout AS VARCHAR)) AS INT) AS digits,
      |  CAST(COUNT(*) AS INT) AS n_keys,
      |  CAST(SUM(fanout) AS BIGINT) AS n_rows
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val ca = tbl(s, dir, "orders")
      .groupBy(col("o_custkey").as("kk")).agg(count(lit(1)).as("ca"))
    val cb = events(s, dir)
      .groupBy(col("user_id").as("kk")).agg(count(lit(1)).as("cb"))
    ca.join(cb, "kk")
      .select((col("ca") * col("cb")).as("fanout"))
      .groupBy(length(col("fanout").cast("string")).cast("int").as("digits"))
      .agg(count(lit(1)).cast("int").as("n_keys"), sum("fanout").as("n_rows"))
      .orderBy("digits")
  }

  q("q_hilbert_layout",
    // Hilbert curve distance (customer × order-day): bucket stats prove
    // the per-level quadrant+rotation recurrence bit-for-bit against a
    // recursive-CTE replay; writeHilbert sorts by this key for tighter
    // file rectangles than Morton at range-predicate pruning
    """WITH RECURSIVE pts AS (SELECT o_orderkey AS id, CAST(o_custkey AS BIGINT) AS x0,
      |    CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT) AS y0
      |  FROM orders),
      |h(id, x, y, d, lvl) AS (
      |  SELECT id, x0, y0, CAST(0 AS BIGINT), 0 FROM pts
      |  UNION ALL
      |  SELECT id,
      |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 65535 - y ELSE y END) ELSE x END,
      |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 65535 - x ELSE x END) ELSE y END,
      |    d + s * s * xor(rx * 3, ry), lvl + 1
      |  FROM (SELECT id, x, y, d, lvl, (CAST(1 AS BIGINT) << (15 - lvl)) AS s,
      |      CASE WHEN (x & (CAST(1 AS BIGINT) << (15 - lvl))) > 0 THEN 1 ELSE 0 END AS rx,
      |      CASE WHEN (y & (CAST(1 AS BIGINT) << (15 - lvl))) > 0 THEN 1 ELSE 0 END AS ry
      |    FROM h WHERE lvl < 16) t),
      |f AS (SELECT id, d AS hval FROM h WHERE lvl = 16)
      |SELECT CAST(hval >> 20 AS BIGINT) AS bucket, COUNT(*) AS n,
      |  CAST(MIN(hval) AS BIGINT) AS min_h, CAST(MAX(hval) AS BIGINT) AS max_h
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "orders")
      .select(Bucketing.hilbertKey(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date")), 16)
        .as("hval"))
      .groupBy(shiftright(col("hval"), 20).as("bucket"))
      .agg(count(lit(1)).as("n"), min("hval").as("min_h"), max("hval").as("max_h"))
      .orderBy("bucket")
  }

  q("q_item_item_cosine",
    // item-item collaborative similarity: co-order counts normalized by
    // sqrt of each item's order count — integer counts, two sqrts and
    // one division per surviving pair; degree joins broadcast
    """WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
      |  WHERE l_partkey < 300),
      |ci AS (SELECT p, COUNT(*) AS c FROM ps GROUP BY 1),
      |pairs AS (SELECT a.p AS pa, b.p AS pb, COUNT(*) AS cij FROM ps a
      |  JOIN ps b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2)
      |SELECT pa, pb, CAST(cij AS INT) AS cij,
      |  round(CAST(cij AS DOUBLE) /
      |    (sqrt(CAST(ca.c AS DOUBLE)) * sqrt(CAST(cb.c AS DOUBLE))), 6) AS cosine
      |FROM pairs JOIN ci ca ON ca.p = pa JOIN ci cb ON cb.p = pb
      |ORDER BY cosine DESC, pa, pb LIMIT 20"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val ps = tbl(s, dir, "lineitem").filter(col("l_partkey") < 300)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val ci = ps.groupBy("p").agg(count(lit(1)).as("c"))
    val pairs = ps.as("a").join(ps.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("cij"))
    pairs
      .join(broadcast(ci.select(col("p").as("pa"), col("c").as("ca"))), Seq("pa"))
      .join(broadcast(ci.select(col("p").as("pb"), col("c").as("cb"))), Seq("pb"))
      .select(col("pa"), col("pb"), col("cij").cast("int").as("cij"),
        round(col("cij").cast("double") /
          (sqrt(col("ca").cast("double")) * sqrt(col("cb").cast("double"))), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("pa"), col("pb")).limit(20)
  }

  q("text_feature_hash",
    // the hashing-trick vectorizer: tokens land in md5 % 256 buckets,
    // per-doc sparse counts — fixed-width features with no vocabulary
    // to ship; collisions are the accepted tradeoff, the bucket space
    // is the knob
    s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents
       |  WHERE doc_id < 20)
       |SELECT doc_id, CAST(${md5Hash60Sql("tok")} % 256 AS INT) AS bucket,
       |  CAST(COUNT(*) AS INT) AS n
       |FROM toks GROUP BY 1, 2 ORDER BY doc_id, bucket"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "documents").filter(col("doc_id") < 20)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"),
        (Pipeline.md5Hash60(col("tok")) % 256).cast("int").as("bucket"))
      .agg(count(lit(1)).cast("int").as("n"))
      .orderBy("doc_id", "bucket")
  }

  q("text_sentence_split",
    // sentence segmentation on terminal punctuation runs: per-doc
    // positional sentences with exact char/word counts — the unit most
    // quality filters and sentence-level dedup operate on
    s"""WITH sen AS (SELECT doc_id,
       |    generate_subscripts(regexp_split_to_array(text, '[.!?]+\\s+'), 1) AS pos,
       |    unnest(regexp_split_to_array(text, '[.!?]+\\s+')) AS s
       |  FROM documents WHERE doc_id < 50)
       |SELECT doc_id, CAST(pos AS INT) AS pos, CAST(length(s) AS INT) AS n_chars,
       |  CAST(len(regexp_split_to_array(trim(s), '\\s+')) AS INT) AS n_words
       |FROM sen WHERE length(s) > 0 ORDER BY doc_id, pos"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    tbl(s, dir, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id"),
        posexplode(split(col("text"), "[.!?]+\\s+")).as(Seq("pos0", "s")))
      .filter(length(col("s")) > 0)
      .select(col("doc_id"), (col("pos0") + 1).cast("int").as("pos"),
        length(col("s")).cast("int").as("n_chars"),
        size(split(trim(col("s")), "\\s+")).cast("int").as("n_words"))
      .orderBy("doc_id", "pos")
  }

  q("q_feature_chisq",
    // R×C contingency association screen (the log-free feature-selection
    // score): per cell N·(N·o − r·c)²/(N·r·c) — integer cross products,
    // one division; Σ over cells compares against χ²((R−1)(C−1))
    """WITH o AS (SELECT o_orderpriority AS f, o_orderstatus AS cls FROM orders),
      |cell AS (SELECT f, cls, COUNT(*) AS n FROM o GROUP BY 1, 2),
      |r AS (SELECT f, SUM(n) AS rn FROM cell GROUP BY 1),
      |c AS (SELECT cls, SUM(n) AS cn FROM cell GROUP BY 1),
      |t AS (SELECT SUM(n) AS tot FROM cell)
      |SELECT cell.f, cell.cls, CAST(cell.n AS INT) AS n,
      |  round(CAST(tot * cell.n - rn * cn AS DOUBLE) *
      |    (CAST(tot * cell.n - rn * cn AS DOUBLE) /
      |     CAST(tot * rn * cn AS DOUBLE)), 6) AS contrib
      |FROM cell JOIN r ON cell.f = r.f JOIN c ON cell.cls = c.cls, t
      |ORDER BY cell.f, cell.cls""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val cell = tbl(s, dir, "orders")
      .select(col("o_orderpriority").as("f"), col("o_orderstatus").as("cls"))
      .groupBy("f", "cls").agg(count(lit(1)).as("n"))
    val r = cell.groupBy("f").agg(sum("n").as("rn"))
    val c = cell.groupBy("cls").agg(sum("n").as("cn"))
    val t = cell.agg(sum("n").as("tot"))
    // deviation d is a BIGINT, but d² would overflow at large SFs —
    // square in double (d < 2^53, so the conversion is exact)
    val d = (col("tot") * col("n") - col("rn") * col("cn")).cast("double")
    cell.join(broadcast(r), "f").join(broadcast(c), "cls")
      .crossJoin(broadcast(t))
      .select(col("f"), col("cls"), col("n").cast("int").as("n"),
        round(d * (d /
          (col("tot") * col("rn") * col("cn")).cast("double")), 6).as("contrib"))
      .orderBy("f", "cls")
  }

  q("q_curate_audit",
    // the curation funnel's accounting twin: every document with one
    // boolean per gate (lang → quality → dup-among-passers → sample),
    // kept rows provably equal to q_curate_pipeline's survivors
    s"""WITH b AS (SELECT doc_id, text, ($langIdSql) != 'en' AS f_lang,
       |    round((len(list_distinct(w))::DOUBLE / len(w)) * 0.4
       |      + least(1.0, len(w) / 100.0) * 0.3
       |      + (1 - len(list_filter(w, t -> t IN ('the', 'a')))::DOUBLE / len(w)) * 0.3,
       |      6) < 0.5 AS f_quality
       |  FROM (SELECT doc_id, text, $toksSql AS w FROM documents)),
       |d AS (SELECT doc_id, text, f_lang, f_quality,
       |    (NOT f_lang AND NOT f_quality) AS pass,
       |    MIN(CASE WHEN NOT f_lang AND NOT f_quality THEN doc_id END)
       |      OVER (PARTITION BY md5(text)) AS keepid
       |  FROM b)
       |SELECT doc_id, f_lang, f_quality,
       |  (pass AND doc_id != keepid) AS f_dup,
       |  (pass AND doc_id = keepid AND ${md5Hash60Sql("doc_id")} % 2 != 0) AS f_sample,
       |  (pass AND doc_id = keepid AND ${md5Hash60Sql("doc_id")} % 2 = 0) AS kept
       |FROM d ORDER BY doc_id""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Pipeline.curateAudit(tbl(s, dir, "documents"), lang = "en",
        minQuality = 0.5, sampleMod = 2, sampleKeep = 1)
      .orderBy("doc_id")
  }

  q("multimodal_tile_stats",
    // region statistics through REAL PNG decode: 2×2 tile channel sums,
    // integer-only output (tile index = coord·2/dim, the aHash cell
    // rule); oracle replays the pixel generator with the same mapping
    """WITH ids AS (SELECT doc_id AS id, CAST(8 + doc_id % 9 AS INT) AS w,
      |    CAST(8 + doc_id % 7 AS INT) AS h FROM documents WHERE doc_id < 50),
      |px AS (SELECT id, w, h, gx.x, gy.y,
      |    ((id * 1315423911 + gx.x * 2654435761 + gy.y * 40503) & 16777215) AS v
      |  FROM ids, (SELECT unnest(range(16)) AS x) gx, (SELECT unnest(range(14)) AS y) gy
      |  WHERE gx.x < w AND gy.y < h)
      |SELECT id, CAST(y * 2 // h AS INT) AS tr, CAST(x * 2 // w AS INT) AS tc,
      |  COUNT(*) AS n_px,
      |  CAST(SUM((v >> 16) & 255) AS BIGINT) AS sum_r,
      |  CAST(SUM((v >> 8) & 255) AS BIGINT) AS sum_g,
      |  CAST(SUM(v & 255) AS BIGINT) AS sum_b
      |FROM px GROUP BY 1, 2, 3 ORDER BY id, tr, tc"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val ids = tbl(s, dir, "documents").filter(col("doc_id") < 50).select("doc_id")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val media = ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        org.apache.spark.sql.Row(id, Multimodal.syntheticPng(
          id, 8 + (id % 9).toInt, 8 + (id % 7).toInt))
      }
    }(enc)
    Multimodal.tileChannelSums(media, "doc_id", grid = 2)
      .orderBy("id", "tr", "tc")
  }

  q("q_mannwhitney_u",
    // nonparametric two-sample test on order values: tie-averaged ranks
    // kept as integers (2·avgrank = 2·(#below) + #equal + 1), so 2·U and
    // the rank-biserial effect size are exact
    """WITH g AS (SELECT CAST(o_totalprice AS DECIMAL(12,2)) AS v,
      |    SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS ca,
      |    COUNT(*) AS c
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') GROUP BY 1),
      |r AS (SELECT ca, c, coalesce(SUM(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rlo FROM g),
      |t AS (SELECT SUM(ca) AS n1, SUM(c) - SUM(ca) AS n2,
      |    SUM(ca * (2 * rlo + c + 1)) AS r1x2 FROM r)
      |SELECT CAST(n1 AS INT) AS n1, CAST(n2 AS INT) AS n2,
      |  CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u2x,
      |  round(1.0e0 - CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) /
      |    CAST(n1 * n2 AS DOUBLE), 6) AS rank_biserial
      |FROM t""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val o = tbl(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    Stats.mannWhitneyU(o, col("o_orderpriority") === "1-URGENT",
      dec(col("o_totalprice"), 12, 2))
  }

  q("q_mannwhitney_continuous",
    // the CONTINUOUS-domain stress of the rank-statistic family: the
    // score is a distinct-per-row double (md5-hash uniform on [0,1) —
    // both engines compute the identical IEEE value), so per-value
    // compression buys nothing and the cumulative counts MUST come from
    // the range-bucketed prefix sums (PlanSpec holds "no unpartitioned
    // Window" on this plan; the old Window.orderBy form would sort the
    // whole corpus in one task)
    """WITH g AS (SELECT
      |    CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE)
      |      / 1152921504606846976.0 AS v,
      |    SUM(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END) AS ca,
      |    COUNT(*) AS c
      |  FROM orders GROUP BY 1),
      |r AS (SELECT ca, c, coalesce(SUM(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rlo FROM g),
      |t AS (SELECT SUM(ca) AS n1, SUM(c) - SUM(ca) AS n2,
      |    SUM(ca * (2 * rlo + c + 1)) AS r1x2 FROM r)
      |SELECT CAST(n1 AS INT) AS n1, CAST(n2 AS INT) AS n2,
      |  CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u2x,
      |  round(1.0e0 - CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) /
      |    CAST(n1 * n2 AS DOUBLE), 6) AS rank_biserial
      |FROM t""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.mannWhitneyU(tbl(s, dir, "orders"), col("o_custkey") % 2 === 0,
      Pipeline.md5Hash60(col("o_orderkey")).cast("double")
        / lit(1.152921504606846976e18))
  }

  q("q_ks_test",
    // exact two-sample Kolmogorov–Smirnov: D·n1·n2 = max |c1·n2 − c2·n1|
    // over the pooled per-value ECDFs (integer), argmax ties to the
    // smallest value, one division at the end
    """WITH g AS (SELECT CAST(o_totalprice AS DECIMAL(12,2)) AS v,
      |    SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS da,
      |    SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END) AS db
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') GROUP BY 1),
      |t AS (SELECT SUM(da) AS n1, SUM(db) AS n2 FROM g),
      |c AS (SELECT v, SUM(da) OVER w AS c1, SUM(db) OVER w AS c2 FROM g
      |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |d AS (SELECT v, n1, n2, abs(c1 * n2 - c2 * n1) AS dnum FROM c, t)
      |SELECT CAST(n1 AS INT) AS n1, CAST(n2 AS INT) AS n2,
      |  CAST(v AS DOUBLE) AS at_value,
      |  round(CAST(dnum AS DOUBLE) / CAST(n1 * n2 AS DOUBLE), 6) AS ks_d
      |FROM d ORDER BY dnum DESC, v LIMIT 1"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val o = tbl(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    Stats.ksTest(o, col("o_orderpriority") === "1-URGENT",
      dec(col("o_totalprice"), 12, 2))
  }

  q("q_bootstrap_ci", {
    val thr = Stats.poissonThresholds60
    val b = 32
    def idx(q: Double): Int = 1 + math.floor(q * (b - 1)).toInt
    val wExpr = thr.map(t => s"CASE WHEN u >= $t THEN 1 ELSE 0 END")
      .mkString(" + ")
    val uExpr = md5Hash60Sql("(CAST(rep AS VARCHAR) || '_' || CAST(id AS VARCHAR))")
    // deterministic Poisson bootstrap: per (replica, row) weight from the
    // md5 uniform against driver-quantized Poisson(1) cdf thresholds —
    // the one-pass distributed bootstrap, reproducible in any engine
    s"""WITH base AS (SELECT o_orderkey AS id, CAST(o_totalprice AS DECIMAL(12,2)) AS x
       |  FROM orders WHERE o_custkey < 300),
       |reps AS (SELECT id, x, r.rep FROM base, (SELECT unnest(range($b)) AS rep) r),
       |wts AS (SELECT rep, x, ($wExpr) AS w FROM
       |  (SELECT rep, x, $uExpr AS u FROM reps)),
       |m AS (SELECT rep, round(CAST(SUM(x * w) AS DOUBLE) / SUM(w), 6) AS m
       |  FROM wts GROUP BY 1),
       |s AS (SELECT list(m ORDER BY m) AS ms FROM m)
       |SELECT $b AS b, ms[${idx(0.05)}] AS ci_lo, ms[${idx(0.5)}] AS median,
       |  ms[${idx(0.95)}] AS ci_hi FROM s""".stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    Stats.bootstrapMeanCI(
      tbl(s, dir, "orders").filter(col("o_custkey") < 300),
      col("o_orderkey"), dec(col("o_totalprice"), 12, 2), b = 32)
  }

  q("q_causal_did",
    // difference-in-differences over the event panel: the four exact
    // cell sums (treat × period), four means, one fixed combination —
    // the workhorse quasi-experimental estimator
    """WITH e AS (SELECT user_id % 2 = 0 AS treat,
      |    ts >= TIMESTAMP '2024-01-16' AS post,
      |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v FROM events),
      |c AS (SELECT treat, post, COUNT(*) AS n, SUM(v) AS s FROM e GROUP BY 1, 2),
      |m AS (SELECT
      |  MAX(CASE WHEN treat AND post THEN CAST(s AS DOUBLE) / n END) AS tp,
      |  MAX(CASE WHEN treat AND NOT post THEN CAST(s AS DOUBLE) / n END) AS tr,
      |  MAX(CASE WHEN NOT treat AND post THEN CAST(s AS DOUBLE) / n END) AS cp,
      |  MAX(CASE WHEN NOT treat AND NOT post THEN CAST(s AS DOUBLE) / n END) AS cr,
      |  SUM(n) AS n_total FROM c)
      |SELECT CAST(n_total AS INT) AS n_total,
      |  round((tp - tr) / 1e6, 6) AS delta_treat,
      |  round((cp - cr) / 1e6, 6) AS delta_control,
      |  round(((tp - tr) - (cp - cr)) / 1e6, 6) AS did
      |FROM m""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val e = events(s, dir).select(
      (col("user_id") % 2 === 0).as("treat"),
      (col("ts") >= lit("2024-01-16").cast(TimestampNTZType)).as("post"),
      floor(col("value") * 1e6 + 0.5).cast("long").as("v"))
    val c = e.groupBy("treat", "post")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    val mean = col("s").cast("double") / col("n")
    c.agg(
        max(when(col("treat") && col("post"), mean)).as("tp"),
        max(when(col("treat") && !col("post"), mean)).as("tr"),
        max(when(!col("treat") && col("post"), mean)).as("cp"),
        max(when(!col("treat") && !col("post"), mean)).as("cr"),
        sum("n").as("n_total"))
      .select(col("n_total").cast("int").as("n_total"),
        round((col("tp") - col("tr")) / 1e6, 6).as("delta_treat"),
        round((col("cp") - col("cr")) / 1e6, 6).as("delta_control"),
        round(((col("tp") - col("tr")) - (col("cp") - col("cr"))) / 1e6, 6)
          .as("did"))
  }

  q("q_cuped",
    // CUPED variance reduction: θ = cov(X,Y)/var(X) over per-user
    // PRE/POST totals (exact integer sums — means would be divisions),
    // reporting the adjusted-variance reduction an experiment gains
    """WITH u AS (SELECT user_id,
      |    SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
      |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS x,
      |    SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
      |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS y
      |  FROM events GROUP BY 1),
      |s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy FROM u)
      |SELECT CAST(n AS INT) AS n,
      |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
      |    (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS theta,
      |  round(1.0e0 -
      |    ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) *
      |     ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
      |      ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
      |       (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))), 6)
      |    AS var_ratio
      |FROM s""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val cut = lit("2024-01-16").cast(TimestampNTZType)
    // cents, not micro-units: per-user totals get SQUARED in the power
    // sums, and micro-scaled squares overflow BIGINT
    val v = floor(col("value") * 100 + 0.5).cast("long")
    val u = events(s, dir).groupBy("user_id")
      .agg(sum(when(col("ts") < cut, v).otherwise(0L)).as("x"),
        sum(when(col("ts") >= cut, v).otherwise(0L)).as("y"))
    val t = u.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val n = col("n").cast("double")
    val cov = n * col("sxy") - col("sx").cast("double") * col("sy")
    val vx = n * col("sxx") - col("sx").cast("double") * col("sx")
    val vy = n * col("syy") - col("sy").cast("double") * col("sy")
    // var(Y−θX)/var(Y) = 1 − ρ²: the fraction of variance CUPED keeps
    t.select(col("n").cast("int").as("n"),
      round(cov / vx, 6).as("theta"),
      round(lit(1.0) - (cov * (cov / (vx * vy))), 6).as("var_ratio"))
  }

  q("q_rfm_segments",
    // RFM segmentation: per-customer recency/frequency/monetary with
    // quintile scores (NTILE over total orders with id tie-breaks) and
    // the classic champion/loyal/at-risk labels; top-50 by composite
    """WITH c AS (SELECT o_custkey,
      |    date_diff('day', MAX(o_orderdate), TIMESTAMP '2001-08-02') AS recency_days,
      |    COUNT(*) AS frequency,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS monetary
      |  FROM orders GROUP BY 1),
      |sc AS (SELECT *,
      |    NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey) AS r_score,
      |    NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
      |    NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      |  FROM c)
      |SELECT o_custkey, CAST(recency_days AS INT) AS recency_days,
      |  CAST(frequency AS INT) AS frequency, round(monetary, 2) AS monetary,
      |  r_score, f_score, m_score,
      |  CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
      |       WHEN f_score <= 2 THEN 'loyal'
      |       WHEN r_score >= 4 THEN 'at_risk' ELSE 'regular' END AS segment
      |FROM sc ORDER BY r_score + f_score + m_score, o_custkey LIMIT 50"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    // NTILE(5) without the three global unpartitioned windows (each was
    // a |customers|-sized single-task sort): per dimension a range-
    // bucketed global rank (Ranks.globalRank — descending dims negate),
    // then the exact NTILE formula from (rank, n). Same quintile values
    // INCLUDING at the boundaries — ties still break by o_custkey
    // through the rank's tie column, so the result is bit-identical to
    // the window form and the oracle keeps its NTILE.
    val ref = lit("2001-08-02").cast("date")
    val c = tbl(s, dir, "orders").groupBy("o_custkey")
      .agg(datediff(ref, max("o_orderdate")).as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(dec(col("o_totalprice"), 12, 2)).cast("double").as("monetary"))
      .localCheckpoint() // consumers: 3 rank passes + the score join
    val n = c.count()
    def rankOf(sortCol: Column, name: String): DataFrame =
      Ranks.globalRank(c.select(col("o_custkey"), sortCol.as("__s")),
          col("__s"), col("o_custkey"), name)
        .select(col("o_custkey"), Ranks.ntileOfRank(col(name), lit(n), 5)
          .as(name))
    val sc = c
      .join(rankOf(col("recency_days"), "r_score"), "o_custkey")
      .join(rankOf(-col("frequency"), "f_score"), "o_custkey")
      .join(rankOf(-col("monetary"), "m_score"), "o_custkey")
    sc.select(col("o_custkey"), col("recency_days").cast("int").as("recency_days"),
        col("frequency").cast("int").as("frequency"),
        round(col("monetary"), 2).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        when(col("r_score") <= 2 && col("f_score") <= 2, "champion")
          .when(col("f_score") <= 2, "loyal")
          .when(col("r_score") >= 4, "at_risk")
          .otherwise("regular").as("segment"))
      .orderBy(col("r_score") + col("f_score") + col("m_score"), col("o_custkey"))
      .limit(50)
  }

  /** DuckDB CTE chain for the right-censored user-lifetime Kaplan–Meier
    * curve — the two-level grid fold kaplanMeier defines (per-block
    * factor products, carry across blocks; block width mirrors the
    * operator's enforced max(64, ceil(span/4096)) auto-scale). Ends in
    * `km_out(t, d, n_risk, s_t)` — shared by the survival-curve and
    * RMST oracles.
    */
  private val kmSurvivalCtes: String =
    """u AS (SELECT user_id, MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx,
      |    MAX(ts) < TIMESTAMP '2024-01-29' AS ev FROM events GROUP BY 1),
      |dur AS (SELECT (mx - mn) // 3600000000 AS t,
      |    CASE WHEN ev THEN 1 ELSE 0 END AS d FROM u),
      |g AS (SELECT t, SUM(d) AS d, COUNT(*) AS c FROM dur GROUP BY 1),
      |tt AS (SELECT SUM(c) AS n_tot FROM g),
      |km AS (SELECT t, d,
      |    n_tot - coalesce(SUM(c) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      |  FROM g, tt),
      |bwc AS (SELECT GREATEST(64, CAST(ceil(
      |    (CAST(MAX(t) AS DOUBLE) - MIN(t) + 1) / 4096) AS BIGINT)) AS bw FROM g),
      |fb AS (SELECT t // (SELECT bw FROM bwc) AS bk, list(t ORDER BY t) AS ts,
      |    list(d ORDER BY t) AS ds, list(n_risk ORDER BY t) AS ns,
      |    list(1.0e0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) ORDER BY t) AS fs
      |  FROM km GROUP BY 1),
      |pb AS (SELECT bk, list_reduce(fs, (a, b) -> a * b) AS p FROM fb),
      |bl AS (SELECT list(bk ORDER BY bk) AS bks, list(p ORDER BY bk) AS ps FROM pb),
      |cr AS (SELECT bks[CAST(i AS INT)] AS bk,
      |    CASE WHEN i = 1 THEN 1.0e0
      |      ELSE list_reduce(ps[1:CAST(i AS INT) - 1], (a, b) -> a * b) END AS carry
      |  FROM bl, (SELECT unnest(range(1, (SELECT len(bks) FROM bl) + 1)) AS i) ix),
      |ex AS (SELECT bk, ts, ds, ns, fs, unnest(range(1, len(ts) + 1)) AS i FROM fb),
      |km_out AS (SELECT ts[CAST(i AS INT)] AS t, CAST(ds[CAST(i AS INT)] AS INT) AS d,
      |  CAST(ns[CAST(i AS INT)] AS INT) AS n_risk,
      |  round(list_reduce(list_prepend(carry, fs[1:CAST(i AS INT)]), (a, b) -> a * b), 6) AS s_t
      |FROM ex JOIN cr USING (bk))""".stripMargin

  /** The Spark side of [[kmSurvivalCtes]]: right-censored user-lifetime
    * durations in hours.
    */
  private def kmDurations(s: SparkSession, dir: String): DataFrame = {
    val u = events(s, dir).groupBy("user_id")
      .agg(min(unix_micros(col("ts").cast(TimestampType))).as("mn"),
        max(unix_micros(col("ts").cast(TimestampType))).as("mx"),
        (max(col("ts")) < lit("2024-01-29").cast(TimestampNTZType)).as("ev"))
    u.select(expr("(mx - mn) div 3600000000").as("t"),
      when(col("ev"), 1).otherwise(0).as("d"))
  }

  q("q_km_survival",
    // Kaplan–Meier user-lifetime curve (right-censored at 2024-01-29):
    // at-risk counts from per-duration cumulative counts, the survival
    // prefix product as the TWO-LEVEL grid fold kaplanMeier defines
    // (per-block factor products, then a carry across blocks — both
    // engines replay the identical IEEE sequence) — no logs. The block
    // width MIRRORS the operator's enforced grid (max(64, ceil(span /
    // 4096))), so the oracle tracks the auto-scale instead of silently
    // diverging if the duration span ever outgrows 64·4096
    s"""WITH $kmSurvivalCtes
      |SELECT t, d, n_risk, s_t FROM km_out ORDER BY t"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.kaplanMeier(kmDurations(s, dir), col("t"), col("d")).orderBy("t")
  }

  q("q_rmst",
    // restricted mean survival time on [0, 700h]: area under the K-M
    // curve — each interval term re-quantizes the published 6-dp S(t)
    // to an exact ×1e6 integer times the exact clipped interval width,
    // so the area is an exact integer sum; leading [0, t1) at S = 1
    s"""WITH $kmSurvivalCtes,
      |f AS (SELECT t, CAST(floor(s_t * 1e6 + 0.5) AS BIGINT) AS s6
      |  FROM km_out WHERE t < 700),
      |nx AS (SELECT t, s6, lead(t) OVER (ORDER BY t) AS t_next FROM f),
      |a AS (SELECT SUM(s6 * (LEAST(coalesce(t_next, 700), 700) - t))
      |    AS area_q, MIN(t) AS t_first, COUNT(*) AS k FROM nx)
      |SELECT CAST(700 AS BIGINT) AS tau, CAST(k AS INT) AS k_times,
      |  round(CAST(t_first * 1000000 + area_q AS DOUBLE) / 1e6, 6) AS rmst
      |FROM a""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.rmst(kmDurations(s, dir), col("t"), col("d"), tau = 700L)
  }

  q("q_nelson_aalen",
    // Nelson–Aalen cumulative hazard over the SAME censored lifetimes as
    // q_km_survival: per-duration hazard d/n quantized once to 1e12 fixed
    // point, then an EXACT integer prefix sum (no order-dependent float
    // accumulation) — the additive companion to the K-M product curve
    """WITH u AS (SELECT user_id, MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx,
      |    MAX(ts) < TIMESTAMP '2024-01-29' AS ev FROM events GROUP BY 1),
      |dur AS (SELECT (mx - mn) // 3600000000 AS t,
      |    CASE WHEN ev THEN 1 ELSE 0 END AS d FROM u),
      |g AS (SELECT t, SUM(d) AS d, COUNT(*) AS c FROM dur GROUP BY 1),
      |tt AS (SELECT SUM(c) AS n_tot FROM g),
      |na AS (SELECT t, d,
      |    n_tot - coalesce(SUM(c) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      |  FROM g, tt),
      |h AS (SELECT t, d, n_risk, CAST(floor(CAST(d AS DOUBLE)
      |    / CAST(n_risk AS DOUBLE) * 1e12 + 0.5) AS BIGINT) AS hq FROM na)
      |SELECT t, CAST(d AS INT) AS d, CAST(n_risk AS INT) AS n_risk,
      |  round(CAST(SUM(hq) OVER (ORDER BY t) AS DOUBLE) / 1e12, 6) AS h_t
      |FROM h ORDER BY t""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val u = events(s, dir).groupBy("user_id")
      .agg(min(unix_micros(col("ts").cast(TimestampType))).as("mn"),
        max(unix_micros(col("ts").cast(TimestampType))).as("mx"),
        (max(col("ts")) < lit("2024-01-29").cast(TimestampNTZType)).as("ev"))
    val dur = u.select(expr("(mx - mn) div 3600000000").as("t"),
      when(col("ev"), 1).otherwise(0).as("d"))
    Stats.nelsonAalen(dur, col("t"), col("d")).orderBy("t")
  }

  q("q_mutual_info",
    // mutual information (nats) between document language and source,
    // with marginal entropies and the normalized MI — the
    // feature-redundancy / label-leakage screen; every cell term takes
    // ln of an exact decimal rational, is quantized once to 1e12 fixed
    // point, and the reductions are exact decimal sums (order-free)
    """WITH cells AS (SELECT lang AS x, source AS y, COUNT(*) AS nij
      |  FROM documents GROUP BY 1, 2),
      |mx AS (SELECT x, SUM(nij) AS ni FROM cells GROUP BY 1),
      |my AS (SELECT y, SUM(nij) AS nj FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM cells),
      |mi AS (SELECT SUM(CAST(nij AS DECIMAL(38,0)) * CAST(floor(ln(
      |    CAST(CAST(nij AS DECIMAL(38,0)) * n AS DOUBLE)
      |    / CAST(CAST(ni AS DECIMAL(38,0)) * nj AS DOUBLE)) * 1e12 + 0.5)
      |    AS BIGINT)) AS mi_q
      |  FROM cells JOIN mx USING (x) JOIN my USING (y), tot),
      |hx AS (SELECT CAST(COUNT(*) AS INT) AS k_x,
      |    SUM(CAST(ni AS DECIMAL(38,0)) * CAST(floor(ln(
      |      CAST(n AS DOUBLE) / CAST(ni AS DOUBLE)) * 1e12 + 0.5) AS BIGINT))
      |    AS hx_q FROM mx, tot),
      |hy AS (SELECT CAST(COUNT(*) AS INT) AS k_y,
      |    SUM(CAST(nj AS DECIMAL(38,0)) * CAST(floor(ln(
      |      CAST(n AS DOUBLE) / CAST(nj AS DOUBLE)) * 1e12 + 0.5) AS BIGINT))
      |    AS hy_q FROM my, tot)
      |SELECT n, k_x, k_y,
      |  round(CAST(mi_q AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12), 6) AS mi_nats,
      |  round(CAST(hx_q AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12), 6) AS h_x,
      |  round(CAST(hy_q AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12), 6) AS h_y,
      |  round(CAST(mi_q AS DOUBLE)
      |    / sqrt(CAST(hx_q AS DOUBLE) * CAST(hy_q AS DOUBLE)), 6) AS nmi
      |FROM mi, hx, hy, tot""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.mutualInfo(tbl(s, dir, "documents"), col("lang"), col("source"))
  }

  q("q_psi_deciles",
    // Population Stability Index of the order-price distribution between
    // even- and odd-orderkey cohorts over fixed $50k price bins (exact
    // cents via DECIMAL(12,2), capped at bin 9): per-bin exact decimal
    // cross-products, one 1e12-quantized log each, exact sum — the
    // model-monitoring drift score as a single bins-sized reduce
    """WITH b AS (SELECT o_orderkey % 2 = 0 AS even,
      |    LEAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      // 5000000, 9) AS bin FROM orders),
      |h1 AS (SELECT bin, COUNT(*) AS o1 FROM b WHERE even GROUP BY 1),
      |h2 AS (SELECT bin, COUNT(*) AS o2 FROM b WHERE NOT even GROUP BY 1),
      |j AS (SELECT bin, CAST(coalesce(o1, 0) AS DECIMAL(38,0)) AS o1,
      |    CAST(coalesce(o2, 0) AS DECIMAL(38,0)) AS o2
      |  FROM h1 FULL OUTER JOIN h2 USING (bin)),
      |tot AS (SELECT SUM(o1) AS n1, SUM(o2) AS n2 FROM j)
      |SELECT CAST(COUNT(*) AS INT) AS k_bins,
      |  CAST(coalesce(SUM(CASE WHEN o1 = 0 OR o2 = 0 THEN 1 END), 0) AS INT)
      |    AS k_zero,
      |  CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
      |  round(CAST(coalesce(SUM(CASE WHEN o1 > 0 AND o2 > 0 THEN
      |      (o1 * n2 - o2 * n1) * CAST(floor(ln(CAST(o1 * n2 AS DOUBLE)
      |        / CAST(o2 * n1 AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) END), 0)
      |    AS DOUBLE) / (CAST(n1 * n2 AS DOUBLE) * 1e12), 6) AS psi
      |FROM j, tot GROUP BY n1, n2""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val b = tbl(s, dir, "orders").select(
      (col("o_orderkey") % 2 === 0).as("even"),
      least(expr(
        "cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint) div 5000000"),
        lit(9L)).as("bin"))
    Quality.psi(b.filter(col("even")).select("bin"),
      b.filter(!col("even")).select("bin"), "bin")
  }

  q("q_drift_panel",
    // four drift measures between even- and odd-doc_id document cohorts
    // over the source distribution in ONE bins-sized reduce: exact-sum
    // TVD and JSD (1e12-quantized exact-rational logs), fixed-point χ²
    // and Hellinger (one IEEE combination per bin, quantized so the
    // reduction is order-free)
    """WITH h1 AS (SELECT source AS bin, COUNT(*) AS o1 FROM documents
      |  WHERE doc_id % 2 = 0 GROUP BY 1),
      |h2 AS (SELECT source AS bin, COUNT(*) AS o2 FROM documents
      |  WHERE doc_id % 2 = 1 GROUP BY 1),
      |j AS (SELECT bin, CAST(coalesce(o1, 0) AS DECIMAL(38,0)) AS o1,
      |    CAST(coalesce(o2, 0) AS DECIMAL(38,0)) AS o2
      |  FROM h1 FULL OUTER JOIN h2 USING (bin)),
      |tot AS (SELECT SUM(o1) AS n1, SUM(o2) AS n2 FROM j),
      |t AS (SELECT o1, o2, n1, n2, o1 * n2 - o2 * n1 AS dlt,
      |    o1 * n2 + o2 * n1 AS mix FROM j, tot)
      |SELECT CAST(COUNT(*) AS INT) AS k_bins,
      |  CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
      |  round(CAST(SUM(abs(dlt)) AS DOUBLE)
      |    / (2 * CAST(n1 * n2 AS DOUBLE)), 6) AS tvd,
      |  round(CAST(SUM(CAST(floor(CAST(dlt AS DOUBLE) * CAST(dlt AS DOUBLE)
      |        / CAST(n1 * n2 * (o1 + o2) AS DOUBLE) * 1e6 + 0.5) AS BIGINT))
      |    AS DOUBLE) / 1e6, 6) AS chi2,
      |  round(CAST(SUM(CASE WHEN o1 > 0 THEN o1 * n2 * CAST(floor(ln(
      |        CAST(2 * o1 * n2 AS DOUBLE) / CAST(mix AS DOUBLE)) * 1e12 + 0.5)
      |        AS BIGINT) ELSE 0 END
      |      + CASE WHEN o2 > 0 THEN o2 * n1 * CAST(floor(ln(
      |        CAST(2 * o2 * n1 AS DOUBLE) / CAST(mix AS DOUBLE)) * 1e12 + 0.5)
      |        AS BIGINT) ELSE 0 END) AS DOUBLE)
      |    / (2 * CAST(n1 * n2 AS DOUBLE) * 1e12), 6) AS jsd_nats,
      |  round(sqrt(GREATEST(0, 1 - CAST(SUM(CAST(floor(sqrt(
      |      CAST(o1 * o2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)) * 1e12 + 0.5)
      |      AS BIGINT)) AS DOUBLE) / 1e12)), 6) AS hellinger
      |FROM t GROUP BY n1, n2""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val d = tbl(s, dir, "documents")
    Quality.categoricalDrift(
      d.filter(col("doc_id") % 2 === 0).select("source"),
      d.filter(col("doc_id") % 2 === 1).select("source"), "source")
  }

  q("q_ohlc_bars",
    // hourly OHLC bars over the event value stream (exact cents): ONE
    // map-side-partial aggregation — open/close via min_by/max_by on the
    // scalar composite key micros·1e10 + event_id (exact as d38/HUGEINT;
    // a double key would collide above 2^53), volume an exact sum
    """WITH t AS (SELECT date_trunc('hour', ts) AS bar,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
      |    CAST(epoch_us(ts) AS HUGEINT) * 10000000000 + event_id AS k
      |  FROM events)
      |SELECT bar, CAST(COUNT(*) AS BIGINT) AS n_ticks,
      |  arg_min(v, k) AS open, MAX(v) AS high, MIN(v) AS low,
      |  arg_max(v, k) AS close, CAST(SUM(v) AS BIGINT) AS volume
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Resample.ohlcBars(events(s, dir), col("ts"),
      floor(col("value") * 100 + 0.5).cast("long"), col("event_id"))
      .orderBy("bar")
  }

  q("q_compaction_plan",
    // lakehouse small-file compaction PLAN: assign each file (docs stand
    // in, n_chars = bytes) to an output bin by its start offset in the
    // id-ordered byte stream — cumulative sums from bucket-partitioned
    // prefix machinery, no single-task window; next-fit guarantee: bins
    // overshoot the 8 KB target by at most one file
    """WITH c AS (SELECT doc_id, n_chars,
      |    SUM(n_chars) OVER (ORDER BY doc_id) AS cum FROM documents),
      |b AS (SELECT (cum - n_chars) // 8192 AS bin, n_chars, doc_id FROM c)
      |SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS INT) AS n_files,
      |  CAST(SUM(n_chars) AS BIGINT) AS bytes,
      |  MIN(doc_id) AS first_id, MAX(doc_id) AS last_id,
      |  round(CAST(SUM(n_chars) AS DOUBLE) / 8192, 6) AS fill
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Bucketing.compactionPlan(tbl(s, dir, "documents")
        .select("doc_id", "n_chars"), "doc_id", "n_chars", 8192L)
      .orderBy("bin")
  }

  q("q_stratified_kfold",
    // stratified 5-fold cross-validation assignment: within each
    // language stratum, rows rank by md5-hash order (doc_id tie-break)
    // and fold = (rank−1) mod 5 — per-stratum fold sizes differ by ≤ 1,
    // deterministic on any engine; reported as the (lang, fold) balance
    s"""WITH a AS (SELECT lang, n_chars,
      |    (row_number() OVER (PARTITION BY lang
      |      ORDER BY ${md5Hash60Sql("doc_id")}, doc_id) - 1) % 5 AS fold
      |  FROM documents)
      |SELECT lang, CAST(fold AS INT) AS fold, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Pipeline.stratifiedKFold(tbl(s, dir, "documents"), "lang", "doc_id", 5)
      .groupBy("lang", "fold")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("lang", "fold")
  }

  q("q_power_mde",
    // two-proportion power analysis of the even/odd-user purchase rates:
    // per-arm n to detect the observed lift at α=0.05 / 80% power
    // (unpooled normal approximation) and the minimum detectable effect
    // at the current smaller arm — z quantiles pinned as shared literals
    """WITH u AS (SELECT user_id,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
      |  FROM events GROUP BY 1),
      |g AS (SELECT user_id % 2 = 0 AS g, COUNT(*) AS n, SUM(c) AS x
      |  FROM u GROUP BY 1),
      |two AS (SELECT MAX(CASE WHEN g THEN n END) AS n1,
      |    MAX(CASE WHEN g THEN x END) AS x1,
      |    MAX(CASE WHEN NOT g THEN n END) AS n2,
      |    MAX(CASE WHEN NOT g THEN x END) AS x2 FROM g),
      |p AS (SELECT n1, x1, n2, x2,
      |    CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
      |    CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
      |    1.9599639845400545 + 0.8416212335729143 AS z FROM two),
      |v AS (SELECT *, p1 * (1 - p1) + p2 * (1 - p2) AS vsum, p1 - p2 AS dlt
      |  FROM p)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
      |  CAST(n2 AS BIGINT) AS n2, CAST(x2 AS BIGINT) AS x2,
      |  round(p1, 6) AS p1, round(p2, 6) AS p2,
      |  CASE WHEN dlt <> 0 THEN CAST(ceil(z * z * vsum / (dlt * dlt))
      |    AS BIGINT) END AS n_per_arm_req,
      |  round(z * sqrt(vsum / CAST(LEAST(n1, n2) AS DOUBLE)), 6) AS mde_at_n
      |FROM v""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val u = events(s, dir).groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("c"))
    Stats.powerTwoProportion(u, col("user_id") % 2 === 0, col("c"))
  }

  q("q_direct_standardization",
    // Simpson's-paradox-proof rate comparison: even/odd-user purchase
    // rates adjusted to the POOLED hour-of-day mix (direct
    // standardization) — per-stratum exact-rational terms, one IEEE
    // division each, 1e12-quantized, exact integer sums per group
    """WITH cells AS (SELECT user_id % 2 = 0 AS g, EXTRACT(hour FROM ts) AS s,
      |    COUNT(*) AS n_gs,
      |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x_gs
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT s, SUM(n_gs) AS n_s FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_tot FROM st),
      |t AS (SELECT g, n_gs, x_gs, CAST(floor(
      |    CAST(CAST(n_s AS DECIMAL(38,0)) * x_gs AS DOUBLE)
      |    / CAST(CAST(n_tot AS DECIMAL(38,0)) * n_gs AS DOUBLE) * 1e12 + 0.5)
      |    AS BIGINT) AS term_q
      |  FROM cells JOIN st USING (s), tot)
      |SELECT g, CAST(SUM(n_gs) AS BIGINT) AS n, CAST(SUM(x_gs) AS BIGINT) AS x,
      |  CAST(COUNT(*) AS INT) AS k_strata,
      |  round(CAST(SUM(CAST(x_gs AS DECIMAL(38,0))) AS DOUBLE)
      |    / CAST(SUM(CAST(n_gs AS DECIMAL(38,0))) AS DOUBLE), 6) AS crude_rate,
      |  round(CAST(SUM(term_q) AS DOUBLE) / 1e12, 6) AS adj_rate
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val e = events(s, dir)
    Stats.directStandardization(e, col("user_id") % 2 === 0, hour(col("ts")),
        when(col("event_type") === "purchase", 1L).otherwise(0L))
      .orderBy("g")
  }

  q("q_qq_deciles",
    // decile QQ table of order price between even/odd-orderkey cohorts —
    // the drift DIAGNOSTIC that says WHERE the distributions diverge
    // (PSI says how much): interpolated deciles per cohort (parity
    // proven by q_percentiles), gap per decile
    """WITH o AS (SELECT o_orderkey % 2 = 0 AS even,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS v FROM orders),
      |e AS (SELECT unnest(quantile_cont(v,
      |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS q,
      |    unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS i FROM o WHERE even),
      |d AS (SELECT unnest(quantile_cont(v,
      |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS q,
      |    unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS i FROM o WHERE NOT even)
      |SELECT CAST(e.i AS INT) AS decile, round(e.q, 6) AS q_even,
      |  round(d.q, 6) AS q_odd, round(e.q - d.q, 6) AS qq_gap
      |FROM e JOIN d USING (i) ORDER BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
    // NOT `percentile(v, array(...))`: Spark's exact percentile packs the
    // whole cohort into one aggregation buffer (measured 7.8× on a 10×
    // input) — Ranks.percentilesExact resolves the same interpolated
    // order statistics from distributed prefix counts, bit-identically
    val o = tbl(s, dir, "orders").select(
      (col("o_orderkey") % 2 === 0).as("even"),
      dec(col("o_totalprice"), 12, 2).cast("double").as("v"))
    val fr = (1 to 9).map(_ / 10.0)
    def decs(c: DataFrame, name: String): DataFrame =
      Ranks.percentilesExact(c, col("v"), fr)
        .select(col("i"), col("value").as(name))
    val e = decs(o.filter(col("even")), "q_even")
    val d = decs(o.filter(!col("even")), "q_odd")
    e.join(d, "i")
      .select(col("i").cast("int").as("decile"),
        round(col("q_even"), 6).as("q_even"), round(col("q_odd"), 6).as("q_odd"),
        round(col("q_even") - col("q_odd"), 6).as("qq_gap"))
      .orderBy("decile")
  }

  q("q_bh_fdr",
    // Benjamini–Hochberg FDR over 25 per-nation two-proportion z-tests
    // (md5-parity arms, high-balance conversion): two-sided p ×1e9 via
    // the SHARED Zelen–Severo normal-CDF polynomial (one quantization),
    // exact-integer step-up compares, rank without a single-task sort —
    // the multiple-testing discipline a segment drilldown needs
    s"""WITH r AS (SELECT c_nationkey AS s,
      |    ${md5Hash60Sql("c_custkey")} % 2 = 0 AS a,
      |    CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END AS c FROM customer),
      |cells AS (SELECT s, CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN a THEN c ELSE 0 END) AS BIGINT) AS x1,
      |    CAST(SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(SUM(CASE WHEN NOT a THEN c ELSE 0 END) AS BIGINT) AS x2
      |  FROM r GROUP BY 1),
      |mm AS (SELECT COUNT(*) AS m FROM cells),
      |v AS (SELECT *, n1 > 0 AND n2 > 0 AND x1 + x2 > 0
      |    AND x1 + x2 < n1 + n2 AS valid,
      |    CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
      |    CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
      |    CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) AS ppool
      |  FROM cells),
      |zz AS (SELECT s, n1, x1, n2, x2, valid, CASE WHEN valid THEN
      |    (p1 - p2) / sqrt(ppool * (1 - ppool)
      |      * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
      |    ELSE 0 END AS zraw FROM v),
      |kk AS (SELECT *, 1 / (1 + 0.2316419 * abs(zraw)) AS k FROM zz),
      |pq AS (SELECT s, n1, x1, n2, x2,
      |    CASE WHEN valid THEN round(zraw, 6) ELSE 0 END AS z,
      |    CASE WHEN valid THEN LEAST(CAST(floor(2 * (exp(abs(zraw) * abs(zraw)
      |      * (-0.5)) * 0.3989422804014327) * (k * (0.319381530 + k *
      |      ((-0.356563782) + k * (1.781477937 + k * ((-1.821255978) + k
      |      * 1.330274429))))) * 1e9 + 0.5) AS BIGINT), 1000000000)
      |    ELSE 1000000000 END AS p_q FROM kk),
      |rk AS (SELECT *, row_number() OVER (ORDER BY p_q, s) AS rank FROM pq),
      |km AS (SELECT MAX(CASE WHEN CAST(p_q AS DECIMAL(38,0)) * (m * 1000)
      |    <= CAST(rank AS DECIMAL(38,0)) * 50000000000 THEN rank END) AS kmax
      |  FROM rk, mm)
      |SELECT s, n1, x1, n2, x2, z,
      |  round(CAST(p_q AS DOUBLE) / 1e9, 6) AS p_value,
      |  CAST(rank AS INT) AS rank,
      |  rank <= coalesce(kmax, 0) AS significant
      |FROM rk, km ORDER BY s""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.bhFdrTwoProportion(tbl(s, dir, "customer"), col("c_nationkey"),
        pmod(Pipeline.md5Hash60(col("c_custkey")), lit(2)) === 0,
        when(col("c_acctbal") > 5000, 1L).otherwise(0L))
      .orderBy("s")
  }

  q("q_audience_overlap",
    // audience-overlap matrix: for every ordered pair of event types,
    // the exact user-set intersection, Jaccard, and containment — the
    // segment-overlap report behind audience planning; one distinct
    // (type, user) projection self-joined on user
    """WITH tu AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
      |sz AS (SELECT t, COUNT(*) AS n FROM tu GROUP BY 1),
      |ix AS (SELECT a.t AS t_a, b.t AS t_b, COUNT(*) AS n_both
      |  FROM tu a JOIN tu b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2)
      |SELECT t_a, t_b, CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
      |  CAST(n_both AS BIGINT) AS n_both,
      |  round(CAST(n_both AS DOUBLE) / CAST(sa.n + sb.n - n_both AS DOUBLE), 6)
      |    AS jaccard,
      |  round(CAST(n_both AS DOUBLE) / CAST(LEAST(sa.n, sb.n) AS DOUBLE), 6)
      |    AS containment
      |FROM ix JOIN sz sa ON sa.t = t_a JOIN sz sb ON sb.t = t_b
      |ORDER BY 1, 2""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val tu = events(s, dir).select(col("event_type").as("t"),
      col("user_id").as("u")).distinct()
      .localCheckpoint() // consumers: sizes + both sides of the pair join
    val sz = tu.groupBy("t").agg(count(lit(1)).as("n"))
    val ix = tu.select(col("t").as("t_a"), col("u"))
      .join(tu.select(col("t").as("t_b"), col("u")), "u")
      .filter(col("t_a") < col("t_b"))
      .groupBy("t_a", "t_b").agg(count(lit(1)).as("n_both"))
    ix.join(broadcast(sz.select(col("t").as("t_a"), col("n").as("n_a"))), "t_a")
      .join(broadcast(sz.select(col("t").as("t_b"), col("n").as("n_b"))), "t_b")
      .select(col("t_a"), col("t_b"), col("n_a"), col("n_b"), col("n_both"),
        round(col("n_both").cast("double")
          / (col("n_a") + col("n_b") - col("n_both")).cast("double"), 6)
          .as("jaccard"),
        round(col("n_both").cast("double")
          / least(col("n_a"), col("n_b")).cast("double"), 6).as("containment"))
      .orderBy("t_a", "t_b")
  }

  q("q_attribution_removal",
    // Markov removal-effect attribution: journey chain (start →
    // touchpoints → conv/null, truncated at first purchase), absorbing
    // conversion probability in ×1e6 integer fixed point (60 truncating
    // iterations — the CTE replays them bit-for-bit via absorbing
    // self-loops), channel credit = normalized conversion collapse when
    // the channel's incoming traffic is lost
    """WITH RECURSIVE
      |seq0 AS (SELECT user_id AS u, event_type AS t,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx
      |  FROM events),
      |fp AS (SELECT u, MIN(idx) AS fp FROM seq0 WHERE t = 'purchase' GROUP BY 1),
      |kept AS (SELECT seq0.u, seq0.t, seq0.idx FROM seq0 LEFT JOIN fp USING (u)
      |  WHERE fp IS NULL OR idx <= fp),
      |st AS (SELECT u, t, idx,
      |    lead(t) OVER (PARTITION BY u ORDER BY idx) AS nxt0 FROM kept),
      |tr AS (SELECT t AS cur, coalesce(CASE WHEN nxt0 = 'purchase'
      |      THEN 'conv' ELSE nxt0 END, 'null') AS nxt
      |    FROM st WHERE t <> 'purchase'
      |  UNION ALL SELECT 'start', CASE WHEN t = 'purchase' THEN 'conv'
      |      ELSE t END FROM st WHERE idx = 1),
      |cells0 AS (SELECT cur, nxt, COUNT(*) AS n FROM tr GROUP BY 1, 2),
      |cells AS (SELECT * FROM cells0
      |  UNION ALL SELECT 'conv', 'conv', 1 UNION ALL SELECT 'null', 'null', 1),
      |tnn AS (SELECT cur, SUM(n) AS tn FROM cells GROUP BY 1),
      |rem AS (SELECT '__all__' AS removed
      |  UNION ALL SELECT DISTINCT nxt FROM cells0 WHERE nxt NOT IN ('conv', 'null')),
      |pr(removed, iter, s, p) AS (
      |  SELECT removed, 0, cur, CAST(CASE WHEN cur = 'conv' THEN 1000000
      |    ELSE 0 END AS BIGINT) FROM rem, (SELECT DISTINCT cur FROM cells) c
      |  UNION ALL
      |  SELECT pr.removed, pr.iter + 1, c.cur,
      |    CAST(SUM(c.n * CASE WHEN c.nxt = pr.removed THEN 0 ELSE pr.p END)
      |      // t.tn AS BIGINT)
      |  FROM pr JOIN cells c ON c.nxt = pr.s JOIN tnn t ON t.cur = c.cur
      |  WHERE pr.iter < 60 GROUP BY pr.removed, pr.iter, c.cur, t.tn),
      |fin AS (SELECT removed, p FROM pr WHERE iter = 60 AND s = 'start'),
      |pa AS (SELECT p AS p_all FROM fin WHERE removed = '__all__'),
      |ef AS (SELECT removed AS channel, p AS p_q,
      |    1000000 - p * 1000000 // GREATEST(p_all, 1) AS eff_q
      |  FROM fin, pa WHERE removed <> '__all__'),
      |es AS (SELECT SUM(eff_q) AS eff_sum FROM ef)
      |SELECT channel, round(CAST(p_all AS DOUBLE) / 1e6, 6) AS p_conv_all,
      |  round(CAST(p_q AS DOUBLE) / 1e6, 6) AS p_conv_without,
      |  round(CAST(eff_q AS DOUBLE) / 1e6, 6) AS removal_effect,
      |  round(CAST(eff_q AS DOUBLE) / CAST(eff_sum AS DOUBLE), 6)
      |    AS attribution_share
      |FROM ef, es, pa ORDER BY channel""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Funnel.removalEffectAttribution(events(s, dir), "user_id", "ts",
      "event_id", "event_type", convType = "purchase").orderBy("channel")
  }

  q("q_eval_qini",
    // Qini / uplift table: users decile-ranked by view count, arms from
    // the md5 parity — per tile both arms' exact counts, the uplift
    // rate difference, and cumulative Qini X_t − X_c·N_t/N_c (exact
    // cross-products, one IEEE division per tile); scores WHO is
    // persuadable where q_lift_gains scores who converts
    s"""WITH u AS (SELECT user_id,
      |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS score,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      |  FROM events GROUP BY 1),
      |a AS (SELECT user_id, score, y,
      |    ${md5Hash60Sql("user_id")} % 2 = 0 AS t FROM u),
      |r AS (SELECT *, NTILE(10) OVER (ORDER BY score DESC, user_id) AS tile
      |  FROM a),
      |g AS (SELECT tile, SUM(CASE WHEN t THEN 1 ELSE 0 END) AS nt,
      |    SUM(CASE WHEN t THEN y ELSE 0 END) AS xt,
      |    SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS nc,
      |    SUM(CASE WHEN NOT t THEN y ELSE 0 END) AS xc FROM r GROUP BY 1),
      |c AS (SELECT tile, nt, xt, nc, xc, SUM(nt) OVER w AS ntc,
      |    SUM(xt) OVER w AS xtc, SUM(nc) OVER w AS ncc, SUM(xc) OVER w AS xcc
      |  FROM g WINDOW w AS (ORDER BY tile))
      |SELECT CAST(tile AS INT) AS tile, CAST(nt AS BIGINT) AS nt,
      |  CAST(xt AS BIGINT) AS xt, CAST(nc AS BIGINT) AS nc,
      |  CAST(xc AS BIGINT) AS xc,
      |  CASE WHEN nt > 0 AND nc > 0 THEN round(CAST(CAST(xt AS DECIMAL(38,0))
      |    * nc - CAST(xc AS DECIMAL(38,0)) * nt AS DOUBLE)
      |    / CAST(CAST(nt AS DECIMAL(38,0)) * nc AS DOUBLE), 6) END AS uplift,
      |  CASE WHEN ncc > 0 THEN round(CAST(CAST(xtc AS DECIMAL(38,0)) * ncc
      |    - CAST(xcc AS DECIMAL(38,0)) * ntc AS DOUBLE)
      |    / CAST(ncc AS DOUBLE), 6) END AS qini_cum
      |FROM c ORDER BY tile""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val u = events(s, dir).groupBy("user_id")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    Eval.qini(u, col("score"),
        pmod(Pipeline.md5Hash60(col("user_id")), lit(2)) === 0,
        col("y"), col("user_id"), k = 10)
      .orderBy("tile")
  }

  q("q_causal_iv",
    // instrumental-variable (Wald) estimate: md5-parity encouragement as
    // the instrument, per-user views as exposure, purchases as outcome —
    // cross-multiplied exact-decimal arm sums, ONE IEEE division for
    // β_IV (plus first stage and ITT); the LATE companion to
    // q_causal_did/q_cuped
    s"""WITH u AS (SELECT user_id,
      |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x,
      |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      |  FROM events GROUP BY 1),
      |a AS (SELECT ${md5Hash60Sql("user_id")} % 2 = 0 AS z, x, y FROM u),
      |g AS (SELECT CAST(SUM(CASE WHEN z THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |  CAST(SUM(CASE WHEN z THEN x ELSE 0 END) AS BIGINT) AS sx1,
      |  CAST(SUM(CASE WHEN z THEN y ELSE 0 END) AS BIGINT) AS sy1,
      |  CAST(SUM(CASE WHEN NOT z THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |  CAST(SUM(CASE WHEN NOT z THEN x ELSE 0 END) AS BIGINT) AS sx0,
      |  CAST(SUM(CASE WHEN NOT z THEN y ELSE 0 END) AS BIGINT) AS sy0 FROM a),
      |d AS (SELECT n1, n0,
      |    CAST(sx1 AS DECIMAL(38,0)) * n0 - CAST(sx0 AS DECIMAL(38,0)) * n1 AS dx,
      |    CAST(sy1 AS DECIMAL(38,0)) * n0 - CAST(sy0 AS DECIMAL(38,0)) * n1 AS dy,
      |    CAST(n1 AS DECIMAL(38,0)) * n0 AS nn FROM g)
      |SELECT n1, n0,
      |  round(CAST(dx AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS first_stage,
      |  round(CAST(dy AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS itt,
      |  CASE WHEN dx <> 0 THEN round(CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE), 6)
      |    END AS beta_iv
      |FROM d""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val u = events(s, dir).groupBy("user_id")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    Stats.ivWald(u,
      pmod(Pipeline.md5Hash60(col("user_id")), lit(2)) === 0,
      col("x"), col("y"))
  }

  q("q_causal_rdd",
    // sharp regression discontinuity at zero account balance: local
    // linear fits on ±$2000 windows of acctbal cents, order count as
    // the outcome — exact decimal power sums per side, one IEEE
    // division per coefficient, effect = the intercept jump at 0
    """WITH oc AS (SELECT o_custkey, COUNT(*) AS y FROM orders GROUP BY 1),
      |r AS (SELECT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x,
      |    coalesce(y, 0) AS y FROM customer
      |  LEFT JOIN oc ON o_custkey = c_custkey),
      |b AS (SELECT x, y, x >= 0 AS side FROM r
      |  WHERE x >= -200000 AND x <= 200000),
      |g AS (SELECT side, COUNT(*) AS n, SUM(CAST(x AS DECIMAL(38,0))) AS sx,
      |    SUM(CAST(y AS DECIMAL(38,0))) AS sy,
      |    SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
      |    SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy FROM b GROUP BY 1),
      |l AS (SELECT CAST(n AS BIGINT) AS n_l,
      |    CASE WHEN n * sxx - sx * sx <> 0 THEN round(CAST(sy * sxx
      |      - sx * sxy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS a_l,
      |    CASE WHEN n * sxx - sx * sx <> 0 THEN round(CAST(n * sxy
      |      - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS b_l
      |  FROM g WHERE NOT side),
      |rr AS (SELECT CAST(n AS BIGINT) AS n_r,
      |    CASE WHEN n * sxx - sx * sx <> 0 THEN round(CAST(sy * sxx
      |      - sx * sxy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS a_r,
      |    CASE WHEN n * sxx - sx * sx <> 0 THEN round(CAST(n * sxy
      |      - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS b_r
      |  FROM g WHERE side)
      |SELECT CAST(200000 AS BIGINT) AS bandwidth, n_l, n_r, a_l, b_l,
      |  a_r, b_r, round(a_r - a_l, 6) AS rdd_effect
      |FROM l, rr""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val oc = tbl(s, dir, "orders").groupBy("o_custkey")
      .agg(count(lit(1)).as("y"))
    val r = tbl(s, dir, "customer")
      .join(oc, col("o_custkey") === col("c_custkey"), "left")
      .select(floor(col("c_acctbal") * 100 + 0.5).cast("long").as("run"),
        coalesce(col("y"), lit(0L)).as("y"))
    Stats.rdd(r, col("run"), col("y"), bandwidth = 200000L)
  }

  q("q_rake_weights", {
    // raking / IPF: weights making the odd-doc_id half's (lang, source)
    // margins match the even half's — 8 alternating row/col passes in
    // ×1e6 truncating integers, unrolled here as 16 mechanical CTE
    // steps so DuckDB replays the identical fixed-point sequence
    val steps = (1 to 8).flatMap { i =>
      val (p1, p2, p0) = (s"w${2 * i - 1}", s"w${2 * i}", s"w${2 * i - 2}")
      Seq(
        s"""$p1 AS MATERIALIZED (SELECT w.r, w.c, w.n, CAST(w.w
           |    * coalesce((SELECT t FROM tr WHERE tr.r = w.r), 0) * 1000000
           |    // GREATEST((SELECT SUM(p.n * p.w) FROM $p0 p WHERE p.r = w.r), 1)
           |    AS HUGEINT) AS w FROM $p0 w)""",
        s"""$p2 AS MATERIALIZED (SELECT w.r, w.c, w.n, CAST(w.w
           |    * coalesce((SELECT t FROM tc WHERE tc.c = w.c), 0) * 1000000
           |    // GREATEST((SELECT SUM(p.n * p.w) FROM $p1 p WHERE p.c = w.c), 1)
           |    AS HUGEINT) AS w FROM $p1 w)""")
    }.mkString(",\n")
    s"""WITH cells AS MATERIALIZED (SELECT lang AS r, source AS c, COUNT(*) AS n
      |  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1, 2),
      |nn AS (SELECT SUM(n) AS n FROM cells),
      |rr AS (SELECT lang AS k, COUNT(*) AS n FROM documents
      |  WHERE doc_id % 2 = 0 GROUP BY 1),
      |cc AS (SELECT source AS k, COUNT(*) AS n FROM documents
      |  WHERE doc_id % 2 = 0 GROUP BY 1),
      |rn AS (SELECT SUM(n) AS n FROM rr),
      |tr AS (SELECT k AS r, n * (SELECT n FROM nn) // (SELECT n FROM rn) AS t
      |  FROM rr),
      |tc AS (SELECT k AS c, n * (SELECT n FROM nn) // (SELECT n FROM rn) AS t
      |  FROM cc),
      |w0 AS MATERIALIZED (SELECT r, c, n, CAST(1000000 AS HUGEINT) AS w FROM cells),
      |$steps
      |SELECT r AS lang, c AS source, CAST(n AS BIGINT) AS n,
      |  round(CAST(w AS DOUBLE) / 1e6, 6) AS weight,
      |  round(CAST(n AS DOUBLE) * CAST(w AS DOUBLE) / 1e6, 6) AS n_weighted
      |FROM w16 ORDER BY 1, 2""".stripMargin.replace("\n", " ")
  }) { (s, dir) =>
    val d = tbl(s, dir, "documents")
    Stats.rake(d.filter(col("doc_id") % 2 === 1),
        d.filter(col("doc_id") % 2 === 0), "lang", "source")
      .orderBy("lang", "source")
  }

  q("q_attribution_shapley",
    // exact Shapley attribution over journey channel SETS with the
    // cumulative worth v(S) = CONVERSIONS from journeys touching ⊆ S
    // (subset-sum of exact-set counts — monotone, φ ≥ 0, Σφ = the
    // touch-attributable conversions); integer factorial weights over
    // all 2^|C| subsets (channel-domain-bounded), one IEEE division per
    // output row; the axiom-clean companion to q_attribution_removal
    """WITH seq0 AS (SELECT user_id AS u, event_type AS t,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx
      |  FROM events),
      |fp AS (SELECT u, MIN(idx) AS fp FROM seq0 WHERE t = 'purchase' GROUP BY 1),
      |kept AS (SELECT seq0.u, seq0.t, seq0.idx, fp FROM seq0 LEFT JOIN fp USING (u)
      |  WHERE fp IS NULL OR idx <= fp),
      |sets AS (SELECT u, list_sort(list_distinct(list(t))) AS chs FROM kept
      |  WHERE t <> 'purchase' GROUP BY u),
      |usr AS (SELECT u, MAX(fp) IS NOT NULL AS conv FROM kept GROUP BY u),
      |j AS (SELECT usr.u, usr.conv, coalesce(chs, []) AS chs
      |  FROM usr LEFT JOIN sets USING (u)),
      |cidx AS (SELECT c, row_number() OVER (ORDER BY c) - 1 AS i
      |  FROM (SELECT DISTINCT unnest(chs) AS c FROM j)),
      |nch AS (SELECT CAST(COUNT(*) AS INT) AS nc FROM cidx),
      |jm AS (SELECT j.u, j.conv, coalesce(SUM(1 << i), 0) AS mask
      |  FROM j LEFT JOIN (SELECT u, unnest(chs) AS ch FROM j) e ON e.u = j.u
      |  LEFT JOIN cidx ON cidx.c = e.ch GROUP BY j.u, j.conv),
      |vtab AS (SELECT mask, COUNT(*) AS n,
      |    SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS x FROM jm GROUP BY 1),
      |subsets AS (SELECT unnest(range(0, (SELECT 1 << nc FROM nch))) AS m),
      |vq AS (SELECT m, (SELECT coalesce(SUM(x), 0) FROM vtab
      |    WHERE (mask | m) = m) AS v FROM subsets),
      |fact AS (SELECT k, f FROM (VALUES (0, 1), (1, 1), (2, 2), (3, 6),
      |    (4, 24), (5, 120), (6, 720), (7, 5040), (8, 40320), (9, 362880),
      |    (10, 3628800), (11, 39916800), (12, 479001600)) t(k, f)),
      |phi AS (SELECT ci.c, SUM(fs.f * fns.f * (v2.v - vq.v)) AS num
      |  FROM cidx ci
      |  JOIN vq ON (vq.m >> ci.i) & 1 = 0
      |  JOIN vq v2 ON v2.m = (vq.m | (1 << ci.i))
      |  JOIN fact fs ON fs.k = bit_count(vq.m)
      |  JOIN fact fns ON fns.k = (SELECT nc FROM nch) - bit_count(vq.m) - 1
      |  GROUP BY ci.c),
      |den AS (SELECT f AS cf FROM fact WHERE k = (SELECT nc FROM nch)),
      |tot AS (SELECT SUM(num) AS tt FROM phi)
      |SELECT c AS channel,
      |  round(CAST(num AS DOUBLE) / CAST(cf AS DOUBLE), 6) AS shapley,
      |  round(CAST(num AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS share
      |FROM phi, den, tot ORDER BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Funnel.shapleyAttribution(events(s, dir), "user_id", "ts", "event_id",
      "event_type", convType = "purchase").orderBy("channel")
  }

  q("q_markov_entropy_rate",
    // predictability of the event stream: first-order Markov entropy
    // rate −Σ (n/N)·ln(n/tn) over the q_markov_transitions cells, plus
    // 1 − H/ln k — exact decimal cell sums, 1e12-quantized exact-
    // rational logs, three final IEEE divisions
    """WITH p AS (SELECT event_type AS cur, lead(event_type) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events),
      |c AS (SELECT cur, nxt, COUNT(*) AS n FROM p WHERE nxt IS NOT NULL
      |  GROUP BY 1, 2),
      |t AS (SELECT cur, SUM(n) AS tn FROM c GROUP BY 1),
      |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
      |    CAST(COUNT(DISTINCT cur) AS BIGINT) AS k FROM c),
      |h AS (SELECT SUM(CAST(n AS DECIMAL(38,0)) * CAST(floor(
      |    ln(CAST(n AS DOUBLE) / CAST(tn AS DOUBLE)) * 1e12 + 0.5)
      |    AS BIGINT)) AS h_q FROM c JOIN t USING (cur))
      |SELECT nn AS n_transitions, CAST(k AS INT) AS k_states,
      |  round(-CAST(h_q AS DOUBLE) / (CAST(nn AS DOUBLE) * 1e12), 6)
      |    AS entropy_rate_nats,
      |  round(ln(CAST(k AS DOUBLE)), 6) AS max_entropy_nats,
      |  round(1 + CAST(h_q AS DOUBLE)
      |    / (CAST(nn AS DOUBLE) * 1e12 * ln(CAST(k AS DOUBLE))), 6)
      |    AS predictability
      |FROM h, tt""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val p = events(s, dir)
      .select(col("event_type").as("cur"),
        lead("event_type", 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
    Stats.entropyRate(p, col("cur"), col("nxt"))
  }

  q("q_dp_noisy_counts",
    // Laplace-mechanism DP release of the language histogram (ε=1,
    // sensitivity 1) with a SEEDED md5 inverse-CDF draw — the same
    // release on every re-run, replayable by any engine; production
    // publishes n_noisy only (n is the verification column here)
    s"""WITH c AS (SELECT lang AS bin, COUNT(*) AS n FROM documents GROUP BY 1),
      |u AS (SELECT bin, n,
      |    (CAST(${md5Hash60Sql("'r9|' || bin")} % 4503599627370496 AS DOUBLE)
      |      + 0.5) / 4503599627370496 AS uu FROM c),
      |z AS (SELECT bin, n, round(CAST(floor(((-1.0) * sign(uu - 0.5)
      |    * ln(1 - 2 * abs(uu - 0.5))) * 1e6 + 0.5) AS BIGINT) / 1e6, 6)
      |    AS noise FROM u)
      |SELECT bin, n, noise, round(n + noise, 6) AS n_noisy,
      |  CAST(1.0 AS DOUBLE) AS epsilon
      |FROM z ORDER BY bin""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Quality.dpNoisyCounts(tbl(s, dir, "documents"), "lang",
      epsilon = 1.0, seed = "r9").orderBy("bin")
  }

  q("text_hill_tail",
    // Hill tail-index of the token-frequency distribution: α over the
    // top-100 tokens against the 101st as threshold — the quantitative
    // Zipf-tail estimate behind vocab/dedup mass decisions; only k+1
    // (tok, f) rows leave the cluster
    s"""WITH toks AS (SELECT unnest($toksSql) AS tok FROM documents),
      |f AS (SELECT tok, COUNT(*) AS f FROM toks WHERE len(tok) > 0
      |  GROUP BY 1),
      |top AS (SELECT tok, f FROM f ORDER BY f DESC, tok LIMIT 101),
      |ref AS (SELECT f AS f_ref FROM top ORDER BY f ASC, tok DESC LIMIT 1),
      |tk AS (SELECT tok, f FROM top ORDER BY f DESC, tok LIMIT 100)
      |SELECT CAST(COUNT(*) AS INT) AS k, CAST(f_ref AS BIGINT) AS f_ref,
      |  round(CAST(COUNT(*) AS DOUBLE) * 1e12 / CAST(SUM(CAST(floor(
      |    ln(CAST(f AS DOUBLE) / CAST(f_ref AS DOUBLE)) * 1e12 + 0.5)
      |    AS BIGINT)) AS DOUBLE), 6) AS hill_alpha
      |FROM tk, ref GROUP BY f_ref""".stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.hillTailIndex(tbl(s, dir, "documents"), col("text"), k = 100)
  }

  q("q_jackknife_ratio",
    // bucket-jackknife SE of a RATIO metric (avg order value, cents)
    // over 40 custkey buckets: leave-one-out estimates from group totals
    // alone, each one IEEE division quantized to 1e6, variance as exact
    // decimal algebra — the A/B-platform machinery for ratio metrics
    """WITH r AS (SELECT o_custkey % 40 AS g,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
      |    1 AS y FROM orders),
      |g AS (SELECT g, SUM(CAST(x AS DECIMAL(38,0))) AS sn,
      |    SUM(CAST(y AS DECIMAL(38,0))) AS sd FROM r GROUP BY 1),
      |t AS (SELECT SUM(sn) AS nn, SUM(sd) AS dd, COUNT(*) AS gg FROM g),
      |loo AS (SELECT CAST(floor(CAST(nn - sn AS DOUBLE)
      |    / CAST(dd - sd AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS t_q FROM g, t),
      |s AS (SELECT SUM(CAST(t_q AS DECIMAL(38,0))) AS tt FROM loo),
      |d AS (SELECT SUM((CAST(t_q AS DECIMAL(38,0)) * gg - tt)
      |    * (CAST(t_q AS DECIMAL(38,0)) * gg - tt)) AS ss FROM loo, s, t),
      |q AS (SELECT CAST(gg AS INT) AS g_buckets,
      |    CAST(nn AS DOUBLE) / CAST(dd AS DOUBLE) AS th,
      |    sqrt(CAST(gg - 1 AS DOUBLE) / CAST(gg AS DOUBLE)
      |      * CAST(ss AS DOUBLE)
      |      / (CAST(gg AS DOUBLE) * CAST(gg AS DOUBLE) * 1e12)) AS se
      |  FROM d, s, t)
      |SELECT g_buckets, round(th, 6) AS theta, round(se, 6) AS se_jack,
      |  round(th - 1.9599639845400545 * se, 6) AS ci_lo,
      |  round(th + 1.9599639845400545 * se, 6) AS ci_hi
      |FROM q""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.jackknifeRatio(tbl(s, dir, "orders"), col("o_custkey") % 40,
      (dec(col("o_totalprice"), 12, 2) * 100).cast("long"), lit(1L))
  }

  q("q_conformal_coverage",
    // split-conformal interval check: md5 60/20/20 split, per-language
    // mean model on train, q̂ = the ⌈(n_cal+1)·0.9⌉-th smallest |residual|
    // (type-1, ×1e6 exact), test coverage ≥ 90% by the conformal
    // guarantee — all ranks from prefix counts, no single-task sort
    s"""WITH b AS (SELECT lang AS seg, n_chars AS y,
      |    ${md5Hash60Sql("doc_id")} % 100 AS bk FROM documents),
      |m AS (SELECT seg, CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS pred FROM b WHERE bk < 60 GROUP BY 1),
      |cal AS (SELECT CAST(floor(abs(CAST(y AS DOUBLE) - pred) * 1e6 + 0.5)
      |    AS BIGINT) AS r_q FROM b JOIN m USING (seg)
      |  WHERE bk >= 60 AND bk < 80),
      |nc AS (SELECT COUNT(*) AS n_cal FROM nc0),
      |qh AS (SELECT MIN(r_q) AS qhat_q FROM
      |  (SELECT r_q, row_number() OVER (ORDER BY r_q) AS rn FROM cal), nc
      |  WHERE rn = CAST(ceil((n_cal + 1) * 90 / 100.0) AS BIGINT)),
      |ts AS (SELECT CAST(floor(abs(CAST(y AS DOUBLE) - pred) * 1e6 + 0.5)
      |    AS BIGINT) AS r_q FROM b JOIN m USING (seg) WHERE bk >= 80),
      |tr AS (SELECT COUNT(*) AS n_train FROM b WHERE bk < 60)
      |SELECT n_train, n_cal, COUNT(*) AS n_test,
      |  CAST(SUM(CASE WHEN r_q <= qhat_q THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_covered,
      |  round(CAST(qhat_q AS DOUBLE) / 1e6, 6) AS q_hat,
      |  round(CAST(SUM(CASE WHEN r_q <= qhat_q THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
      |FROM ts, qh, nc, tr GROUP BY n_train, n_cal, qhat_q"""
      .stripMargin.replace("nc0", "cal").replace("\n", " ")) { (s, dir) =>
    Eval.conformalCoverage(tbl(s, dir, "documents"), col("doc_id"),
      col("lang"), col("n_chars"), alphaPct = 10)
  }

  q("stream_psi",
    // streaming drift monitor: the even-doc_id source histogram is the
    // stored REFERENCE; the odd half streams in (complete-mode category
    // counts) and PSI is scored against the reference — the production
    // shape of a feed-drift alarm; oracle = the batch PSI between halves
    """WITH h1 AS (SELECT source AS bin, COUNT(*) AS o1 FROM documents
      |  WHERE doc_id % 2 = 0 GROUP BY 1),
      |h2 AS (SELECT source AS bin, COUNT(*) AS o2 FROM documents
      |  WHERE doc_id % 2 = 1 GROUP BY 1),
      |j AS (SELECT bin, CAST(coalesce(o1, 0) AS DECIMAL(38,0)) AS o1,
      |    CAST(coalesce(o2, 0) AS DECIMAL(38,0)) AS o2
      |  FROM h1 FULL OUTER JOIN h2 USING (bin)),
      |tot AS (SELECT SUM(o1) AS n1, SUM(o2) AS n2 FROM j)
      |SELECT CAST(COUNT(*) AS INT) AS k_bins,
      |  CAST(coalesce(SUM(CASE WHEN o1 = 0 OR o2 = 0 THEN 1 END), 0) AS INT)
      |    AS k_zero,
      |  CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
      |  round(CAST(coalesce(SUM(CASE WHEN o1 > 0 AND o2 > 0 THEN
      |      (o1 * n2 - o2 * n1) * CAST(floor(ln(CAST(o1 * n2 AS DOUBLE)
      |        / CAST(o2 * n1 AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) END), 0)
      |    AS DOUBLE) / (CAST(n1 * n2 AS DOUBLE) * 1e12), 6) AS psi
      |FROM j, tot GROUP BY n1, n2""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val d = tbl(s, dir, "documents")
    val ref = d.filter(col("doc_id") % 2 === 0)
      .groupBy(col("source").as("bin")).agg(count(lit(1)).as("o1"))
    val src = s.readStream.schema(d.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val counts = src.filter(col("doc_id") % 2 === 1)
      .groupBy(col("source").as("bin")).agg(count(lit(1)).as("o2"))
    val qname = "graft_stream_psi"
    withShufflePartitions(s, 4) {
      val query = counts.writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
      try query.processAllAvailable() finally query.stop()
    }
    Quality.psiCounts(ref, s.table(qname))
  }

  q("q_skipping_eval",
    // data-skipping effectiveness: 64 simulated equal-count files under
    // the natural (orderkey) vs clustered (custkey-sorted) layout, zone
    // maps per file, and the file/row scan cost of the range predicate
    // o_custkey in [100, 200) under each — the quantitative case for
    // layout work (exact NTILE files, no single-task sort)
    """WITH r AS (SELECT o_orderkey AS ord, o_custkey AS p, o_orderkey AS id
      |  FROM orders),
      |l1 AS (SELECT p, NTILE(64) OVER (ORDER BY ord, id) AS f FROM r),
      |g1 AS (SELECT f, MIN(p) AS mn, MAX(p) AS mx, COUNT(*) AS c
      |  FROM l1 GROUP BY 1),
      |s1 AS (SELECT 'natural' AS layout, CAST(COUNT(*) AS INT) AS n_files,
      |  CAST(coalesce(SUM(CASE WHEN mn < 200 AND mx >= 100 THEN 1 END), 0) AS INT) AS n_hit,
      |  CAST(coalesce(SUM(CASE WHEN mn < 200 AND mx >= 100 THEN c END), 0) AS BIGINT) AS rows_scanned,
      |  CAST(SUM(c) AS BIGINT) AS n_rows FROM g1),
      |l2 AS (SELECT p, NTILE(64) OVER (ORDER BY p, id) AS f FROM r),
      |g2 AS (SELECT f, MIN(p) AS mn, MAX(p) AS mx, COUNT(*) AS c
      |  FROM l2 GROUP BY 1),
      |s2 AS (SELECT 'clustered' AS layout, CAST(COUNT(*) AS INT) AS n_files,
      |  CAST(coalesce(SUM(CASE WHEN mn < 200 AND mx >= 100 THEN 1 END), 0) AS INT) AS n_hit,
      |  CAST(coalesce(SUM(CASE WHEN mn < 200 AND mx >= 100 THEN c END), 0) AS BIGINT) AS rows_scanned,
      |  CAST(SUM(c) AS BIGINT) AS n_rows FROM g2)
      |SELECT layout, n_files, n_hit, rows_scanned, n_rows,
      |  round(1 - CAST(n_hit AS DOUBLE) / CAST(n_files AS DOUBLE), 6)
      |    AS prune_rate
      |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2) ORDER BY layout"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Bucketing.skippingEval(tbl(s, dir, "orders"), col("o_orderkey"),
      col("o_custkey"), col("o_orderkey"), lo = 100L, hi = 200L, files = 64)
      .orderBy("layout")
  }

  q("q_bloom_fpp",
    // bloom-filter design eval with an engine-neutral md5 bloom
    // (k=4 positions per key mod m=2048): build on high-balance
    // customers, probe distinct order custkeys, score pass counts
    // against the exact semi-join truth — observed FPP + fill factor
    s"""WITH a AS (SELECT DISTINCT c_custkey AS key FROM customer
      |  WHERE c_acctbal > 5000),
      |b AS (SELECT DISTINCT o_custkey AS key FROM orders),
      |ii AS (SELECT i FROM (VALUES (0), (1), (2), (3)) x(i)),
      |bits AS (SELECT DISTINCT
      |    ${md5Hash60Sql("'b' || i || '|' || CAST(key AS VARCHAR)")} % 2048 AS pos
      |  FROM a CROSS JOIN ii),
      |pp AS (SELECT key,
      |    ${md5Hash60Sql("'b' || i || '|' || CAST(key AS VARCHAR)")} % 2048 AS pos
      |  FROM b CROSS JOIN ii),
      |pass AS (SELECT key FROM pp JOIN bits USING (pos)
      |  GROUP BY key HAVING COUNT(*) = 4),
      |c AS (SELECT (SELECT COUNT(*) FROM a) AS n_build,
      |  (SELECT COUNT(*) FROM b) AS n_probe,
      |  (SELECT COUNT(*) FROM b WHERE key IN (SELECT key FROM a)) AS n_true,
      |  (SELECT COUNT(*) FROM pass) AS n_pass,
      |  (SELECT COUNT(*) FROM bits) AS bits_set)
      |SELECT n_build, n_probe, n_true, n_pass,
      |  n_pass - n_true AS n_false_pos,
      |  round(CAST(n_pass - n_true AS DOUBLE)
      |    / CAST(n_probe - n_true AS DOUBLE), 6) AS fpp_observed,
      |  CAST(2048 AS INT) AS m, CAST(4 AS INT) AS k,
      |  round(CAST(bits_set AS DOUBLE) / 2048, 6) AS fill
      |FROM c""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Sketch.bloomFppEval(
      tbl(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey")),
      tbl(s, dir, "orders").select(col("o_custkey")),
      col("c_custkey"), col("o_custkey"), m = 2048, k = 4)
  }

  q("stream_lttb",
    // the dashboard loop end-to-end: the hourly series aggregates as a
    // STREAM (complete mode), then LTTB thins the monitor's series to
    // 24 tiles + endpoints — oracle = the identical batch pipeline
    """WITH h AS (SELECT CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS v FROM events GROUP BY 1),
      |ed AS (SELECT MIN(t) AS t_lo, MAX(t) AS t_hi FROM h),
      |fp AS (SELECT t AS t0, v AS v0 FROM h, ed WHERE t = t_lo),
      |lp AS (SELECT t AS t9, v AS v9 FROM h, ed WHERE t = t_hi),
      |i AS (SELECT t, v, NTILE(24) OVER (ORDER BY t) AS tile FROM h, ed
      |  WHERE t <> t_lo AND t <> t_hi),
      |m AS (SELECT tile, SUM(t) AS st, SUM(v) AS sv, COUNT(*) AS c
      |  FROM i GROUP BY 1),
      |an AS (SELECT m.tile,
      |    coalesce(CAST(ml.st AS DOUBLE) / ml.c, CAST(t0 AS DOUBLE)) AS tl,
      |    coalesce(CAST(ml.sv AS DOUBLE) / ml.c, CAST(v0 AS DOUBLE)) AS vl,
      |    coalesce(CAST(mr.st AS DOUBLE) / mr.c, CAST(t9 AS DOUBLE)) AS tr,
      |    coalesce(CAST(mr.sv AS DOUBLE) / mr.c, CAST(v9 AS DOUBLE)) AS vr
      |  FROM m LEFT JOIN m ml ON ml.tile = m.tile - 1
      |    LEFT JOIN m mr ON mr.tile = m.tile + 1, fp, lp),
      |sc AS (SELECT i.tile, t, v, CAST(floor(abs(
      |    tl * (CAST(v AS DOUBLE) - vr) + CAST(t AS DOUBLE) * (vr - vl)
      |    + tr * (vl - CAST(v AS DOUBLE))) * 1e6 + 0.5) AS BIGINT) AS area_q
      |  FROM i JOIN an ON an.tile = i.tile),
      |mxq AS (SELECT tile, MAX(area_q) AS mxa FROM sc GROUP BY 1),
      |pk AS (SELECT sc.tile, MIN(t) AS t FROM sc JOIN mxq
      |  ON mxq.tile = sc.tile AND area_q = mxa GROUP BY 1),
      |sel AS (SELECT sc.t, sc.v FROM sc JOIN pk
      |  ON pk.tile = sc.tile AND pk.t = sc.t)
      |SELECT t, v FROM (SELECT t0 AS t, v0 AS v FROM fp
      |  UNION ALL SELECT t9, v9 FROM lp UNION ALL SELECT t, v FROM sel)
      |ORDER BY t""".stripMargin.replace("\n", " ")) { (s, dir) =>
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s.readStream.schema(tbl(s, dir, "events").schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val normalized = src.schema("ts").dataType match {
      case LongType =>
        src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => src.withColumn("ts", col("ts").cast(TimestampType))
    }
    val hourly = normalized
      .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
        .cast("long").as("t"))
      .agg(count(lit(1)).as("v"))
    val qname = "graft_stream_lttb"
    withShufflePartitions(s, 4) {
      val query = hourly.writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
      try query.processAllAvailable() finally query.stop()
    }
    Resample.lttb(s.table(qname), col("t"), col("v"), buckets = 24)
      .orderBy("t")
  }

  q("q_value_bands",
    // hour-of-day monitoring bands: exact p10/p50/p90 of the event value
    // (cents) per hour of day via the grouped distributed percentile —
    // 24 groups, no per-group aggregation buffer, no per-group
    // single-task window
    """WITH e AS (SELECT CAST(lpad(CAST(EXTRACT(hour FROM ts) AS VARCHAR), 2, '0')
      |    AS VARCHAR) AS hod,
      |    CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS DOUBLE) AS v
      |  FROM events),
      |q AS (SELECT hod, unnest(quantile_cont(v, [0.1, 0.5, 0.9])) AS qv,
      |    unnest([1, 2, 3]) AS i FROM e GROUP BY 1)
      |SELECT hod, round(MAX(CASE WHEN i = 1 THEN qv END), 6) AS p10_cents,
      |  round(MAX(CASE WHEN i = 2 THEN qv END), 6) AS p50_cents,
      |  round(MAX(CASE WHEN i = 3 THEN qv END), 6) AS p90_cents
      |FROM q GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val e = events(s, dir).select(
      lpad(hour(col("ts")).cast("string"), 2, "0").as("hod"),
      floor(col("value") * 100 + 0.5).cast("long").cast("double").as("v"))
    Ranks.groupedPercentilesExact(e, col("hod"), col("v"),
        Seq(0.1, 0.5, 0.9))
      .groupBy(col("g").as("hod"))
      .agg(round(max(when(col("i") === 1, col("value"))), 6).as("p10_cents"),
        round(max(when(col("i") === 2, col("value"))), 6).as("p50_cents"),
        round(max(when(col("i") === 3, col("value"))), 6).as("p90_cents"))
      .orderBy("hod")
  }

  q("q_lttb_downsample",
    // LTTB series thinning (mean-anchor variant) of the hourly event
    // counts to 48 tiles + the two endpoints: per tile keep the point
    // with max triangle area vs the neighbor-tile means — exact NTILE
    // tiles, exact-integer tile sums, one quantized double area per
    // candidate, argmax by (area, min t)
    """WITH h AS (SELECT CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS v FROM events GROUP BY 1),
      |ed AS (SELECT MIN(t) AS t_lo, MAX(t) AS t_hi FROM h),
      |fp AS (SELECT t AS t0, v AS v0 FROM h, ed WHERE t = t_lo),
      |lp AS (SELECT t AS t9, v AS v9 FROM h, ed WHERE t = t_hi),
      |i AS (SELECT t, v, NTILE(48) OVER (ORDER BY t) AS tile FROM h, ed
      |  WHERE t <> t_lo AND t <> t_hi),
      |m AS (SELECT tile, SUM(t) AS st, SUM(v) AS sv, COUNT(*) AS c
      |  FROM i GROUP BY 1),
      |an AS (SELECT m.tile,
      |    coalesce(CAST(ml.st AS DOUBLE) / ml.c, CAST(t0 AS DOUBLE)) AS tl,
      |    coalesce(CAST(ml.sv AS DOUBLE) / ml.c, CAST(v0 AS DOUBLE)) AS vl,
      |    coalesce(CAST(mr.st AS DOUBLE) / mr.c, CAST(t9 AS DOUBLE)) AS tr,
      |    coalesce(CAST(mr.sv AS DOUBLE) / mr.c, CAST(v9 AS DOUBLE)) AS vr
      |  FROM m LEFT JOIN m ml ON ml.tile = m.tile - 1
      |    LEFT JOIN m mr ON mr.tile = m.tile + 1, fp, lp),
      |sc AS (SELECT i.tile, t, v, CAST(floor(abs(
      |    tl * (CAST(v AS DOUBLE) - vr) + CAST(t AS DOUBLE) * (vr - vl)
      |    + tr * (vl - CAST(v AS DOUBLE))) * 1e6 + 0.5) AS BIGINT) AS area_q
      |  FROM i JOIN an ON an.tile = i.tile),
      |mxq AS (SELECT tile, MAX(area_q) AS mxa FROM sc GROUP BY 1),
      |pk AS (SELECT sc.tile, MIN(t) AS t FROM sc JOIN mxq
      |  ON mxq.tile = sc.tile AND area_q = mxa GROUP BY 1),
      |sel AS (SELECT sc.t, sc.v FROM sc JOIN pk
      |  ON pk.tile = sc.tile AND pk.t = sc.t)
      |SELECT t, v FROM (SELECT t0 AS t, v0 AS v FROM fp
      |  UNION ALL SELECT t9, v9 FROM lp UNION ALL SELECT t, v FROM sel)
      |ORDER BY t""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val h = events(s, dir)
      .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
        .cast("long").as("t"))
      .agg(count(lit(1)).as("v"))
    Resample.lttb(h, col("t"), col("v"), buckets = 48).orderBy("t")
  }

  q("q_graph_ppr",
    // personalized PageRank on the same BOUNDED 3-NN cosine graph as
    // q_graph_pagerank (vec_id < 2000 — see the quadratic-build note
    // there), teleporting to the p%7=0 seed set — integer fixed point
    // throughout, so the recursive CTE replays every iteration
    // bit-for-bit; top-25 "most related to the seeds"
    """WITH RECURSIVE
      |q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id % 10 < 3 AND vec_id < 2000),
      |c AS (SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings WHERE vec_id % 10 < 3 AND vec_id < 2000),
      |s AS (SELECT q_id, n_id,
      |  list_sum(list_transform(range(1, len(q_vec) + 1), i -> CAST(q_vec[i] AS DOUBLE) * CAST(n_vec[i] AS DOUBLE))) /
      |  (sqrt(list_sum(list_transform(range(1, len(q_vec) + 1), i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE)))) *
      |   sqrt(list_sum(list_transform(range(1, len(n_vec) + 1), i -> CAST(n_vec[i] AS DOUBLE) * CAST(n_vec[i] AS DOUBLE))))) AS cosim
      |  FROM q JOIN c ON q_id != n_id),
      |r AS (SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY round(cosim, 6) DESC, n_id) AS rn FROM s),
      |e0 AS (SELECT q_id AS pa, n_id AS pb FROM r WHERE rn <= 3),
      |edges AS (SELECT DISTINCT src, dst FROM
      |  (SELECT pa AS src, pb AS dst FROM e0 UNION ALL SELECT pb, pa FROM e0)),
      |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
      |verts AS (SELECT src AS p FROM deg),
      |seeds AS (SELECT p FROM verts WHERE p % 7 = 0),
      |nsd AS (SELECT COUNT(*) AS n FROM seeds),
      |pr(iter, p, rank) AS (
      |  SELECT 0, v.p, CASE WHEN sd.p IS NOT NULL
      |    THEN 1000000000000 // (SELECT n FROM nsd) ELSE 0 END
      |  FROM verts v LEFT JOIN seeds sd ON v.p = sd.p
      |  UNION ALL
      |  SELECT pr.iter + 1, e.dst,
      |    (CASE WHEN sd.p IS NOT NULL
      |      THEN (15 * (1000000000000 // (SELECT n FROM nsd))) // 100 ELSE 0 END)
      |      + (85 * SUM(pr.rank // deg.d)) // 100
      |  FROM pr JOIN edges e ON pr.p = e.src JOIN deg ON deg.src = pr.p
      |    LEFT JOIN seeds sd ON sd.p = e.dst
      |  WHERE pr.iter < 5 GROUP BY 1, 2, sd.p)
      |SELECT p, rank FROM pr WHERE iter = 5 ORDER BY rank DESC, p LIMIT 25"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val sub = tbl(s, dir, "embeddings")
      .filter(pmod(col("vec_id"), lit(10)) < 3 && col("vec_id") < 2000)
    val knn = Similarity.bruteForceKnn(sub, sub, k = 3)
      .select(col("q_id").as("pa"), col("n_id").as("pb"))
    // CHECKPOINT the kNN edge build before fanning out consumers (r16):
    // `seeds` below and two seed-sizing actions inside
    // personalizedPageRank each re-executed the whole brute-force kNN
    // build (measured: the 16.5 s-task-time build stage ran THREE times
    // per query — 55 jobs, 32 s total task time). Lazy: ppr's own first
    // sizing probe is the materializing action.
    val edges = knn.select(col("pa").as("src"), col("pb").as("dst"))
      .union(knn.select(col("pb").as("src"), col("pa").as("dst"))).distinct()
      .localCheckpoint(false)
    val seeds = edges.select(col("src").as("p")).distinct()
      .filter(pmod(col("p"), lit(7)) === 0)
    Graph.personalizedPageRank(edges, seeds, iters = 5)
      .orderBy(col("rank").desc, col("p")).limit(25)
  }

  q("q_sequential_sprt",
    // Wald SPRT over per-user conversions in user_id order (H0 p=0.2 vs
    // H1 p=0.3, α=β=0.05): the two per-observation log terms and both
    // boundaries quantize ONCE to 1e12 fixed point, the running LLR is
    // an exact integer prefix sum — first-crossing positions + decision
    """WITH u AS (SELECT user_id AS i,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
      |  FROM events GROUP BY 1),
      |k AS (SELECT CAST(floor(ln(0.3 / 0.2) * 1e12 + 0.5) AS BIGINT) AS la,
      |  CAST(floor(ln((1 - 0.3) / (1 - 0.2)) * 1e12 + 0.5) AS BIGINT) AS lb,
      |  CAST(floor(ln((1 - 0.05) / 0.05) * 1e12 + 0.5) AS BIGINT) AS up,
      |  CAST(floor(ln(0.05 / (1 - 0.05)) * 1e12 + 0.5) AS BIGINT) AS dn),
      |c AS (SELECT i, SUM(x * la + (1 - x) * lb) OVER (ORDER BY i) AS cum,
      |    up, dn FROM u, k)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  round(CAST(arg_max(cum, i) AS DOUBLE) / 1e12, 6) AS llr_final,
      |  MIN(CASE WHEN cum >= up THEN i END) AS first_h1,
      |  MIN(CASE WHEN cum <= dn THEN i END) AS first_h0,
      |  CASE WHEN MIN(CASE WHEN cum >= up THEN i END) IS NOT NULL
      |      AND (MIN(CASE WHEN cum <= dn THEN i END) IS NULL
      |        OR MIN(CASE WHEN cum >= up THEN i END)
      |          <= MIN(CASE WHEN cum <= dn THEN i END)) THEN 'accept_h1'
      |    WHEN MIN(CASE WHEN cum <= dn THEN i END) IS NOT NULL
      |      THEN 'accept_h0' ELSE 'continue' END AS decision
      |FROM c GROUP BY up, dn""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val u = events(s, dir).groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("x"))
    Stats.sprtBernoulli(u, col("user_id"), col("x"), p0 = 0.2, p1 = 0.3)
  }

  q("q_lift_gains",
    // gains/lift table: users decile-ranked by view count (converter
    // label = any purchase) — per decile the positive rate, cumulative
    // capture of all converters, and lift over base rate; NTILE without
    // the single-task sort (range-bucketed global rank + exact formula)
    """WITH u AS (SELECT user_id,
      |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS score,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      |  FROM events GROUP BY 1),
      |r AS (SELECT *, NTILE(10) OVER (ORDER BY score DESC, user_id) AS tile
      |  FROM u),
      |g AS (SELECT tile, COUNT(*) AS n, SUM(y) AS pos FROM r GROUP BY 1),
      |t AS (SELECT SUM(n) AS nn, SUM(pos) AS pp FROM g),
      |c AS (SELECT tile, n, pos, SUM(pos) OVER (ORDER BY tile) AS pos_cum
      |  FROM g)
      |SELECT CAST(tile AS INT) AS tile, CAST(n AS BIGINT) AS n,
      |  CAST(pos AS BIGINT) AS pos,
      |  round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
      |  round(CAST(pos_cum AS DOUBLE) / CAST(pp AS DOUBLE), 6) AS cum_capture,
      |  round(CAST(CAST(pos AS DECIMAL(38,0)) * nn AS DOUBLE)
      |    / CAST(CAST(n AS DECIMAL(38,0)) * pp AS DOUBLE), 6) AS lift
      |FROM c, t ORDER BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val u = events(s, dir).groupBy("user_id")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    Eval.liftGains(u, col("score"), col("y"), col("user_id"), k = 10)
      .orderBy("tile")
  }

  q("stream_ohlc",
    // streaming OHLC bars: the q_ohlc_bars aggregation as a watermarked
    // tumbling-window streaming query (complete mode, memory sink) —
    // the oracle is the IDENTICAL batch SQL, checking that streaming
    // min_by/max_by open/close resolution matches a batch recompute
    """WITH t AS (SELECT date_trunc('hour', ts) AS bar,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
      |    CAST(epoch_us(ts) AS HUGEINT) * 10000000000 + event_id AS k
      |  FROM events)
      |SELECT bar, CAST(COUNT(*) AS BIGINT) AS n_ticks,
      |  arg_min(v, k) AS open, MAX(v) AS high, MIN(v) AS low,
      |  arg_max(v, k) AS close, CAST(SUM(v) AS BIGINT) AS volume
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s.readStream.schema(tbl(s, dir, "events").schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val normalized = src.schema("ts").dataType match {
      case LongType =>
        src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => src.withColumn("ts", col("ts").cast(TimestampType))
    }
    val qname = "graft_stream_ohlc"
    withShufflePartitions(s, 4) {
      val query = graft.streaming.Streams.ohlcStream(normalized,
          floor(col("value") * 100 + 0.5).cast("long"), col("event_id"))
        .writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
      try query.processAllAvailable() finally query.stop()
    }
    s.table(qname)
      .withColumn("bar", col("bar").cast(TimestampNTZType))
      .orderBy("bar")
  }

  q("q_funnel_latency",
    // step-to-step conversion latency: exact physical median seconds per
    // transition of the view→click→purchase funnel
    """WITH t1 AS (SELECT user_id AS u, MIN(epoch_us(ts)) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (SELECT t1.u, MIN(epoch_us(e.ts)) AS t2 FROM events e JOIN t1 ON e.user_id = t1.u
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1 GROUP BY 1),
      |t3 AS (SELECT t2.u, MIN(epoch_us(e.ts)) AS t3 FROM events e JOIN t2 ON e.user_id = t2.u
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2 GROUP BY 1),
      |a AS (SELECT 1 AS step, t2.t2 - t1.t1 AS dm FROM t2 JOIN t1 ON t2.u = t1.u
      |  UNION ALL SELECT 2, t3.t3 - t2.t2 FROM t3 JOIN t2 ON t3.u = t2.u),
      |g AS (SELECT step, COUNT(*) AS n, list(dm ORDER BY dm) AS ds FROM a GROUP BY 1)
      |SELECT step, CAST(n AS INT) AS n,
      |  round(CAST(ds[CAST((n + 1) // 2 AS INT)] AS DOUBLE) / 1e6, 6) AS median_s
      |FROM g ORDER BY step""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val f = Funnel.funnel(events(s, dir), Seq("view", "click", "purchase"))
    val a = f.filter(col("t2").isNotNull)
      .select(lit(1).as("step"), (col("t2") - col("t1")).as("dm"))
      .unionByName(f.filter(col("t3").isNotNull)
        .select(lit(2).as("step"), (col("t3") - col("t2")).as("dm")))
    a.groupBy("step")
      .agg(count(lit(1)).as("n"), sort_array(collect_list("dm")).as("ds"))
      .select(col("step"), col("n").cast("int").as("n"),
        round(element_at(col("ds"), expr("int((n + 1) div 2)")).cast("double")
          / 1e6, 6).as("median_s"))
      .orderBy("step")
  }

  q("q_golden_record",
    // survivorship / golden-record build over the linkage matches: per
    // matched customer, the longest (tie: lexicographically greatest)
    // name across sources and the maximum balance — MDM's merge step
    s"""WITH $linkCtes,
       |m AS (SELECT pr.* FROM fs JOIN pr
       |    ON fs.d_id = pr.d_id AND fs.c_custkey = pr.c_custkey
       |  WHERE fs.fs_score >= 18),
       |names AS (SELECT c_custkey, d_name AS nm, d_bal AS bal FROM m
       |  UNION ALL SELECT DISTINCT c_custkey, c_name, c_bal FROM m),
       |best AS (SELECT c_custkey, nm, row_number() OVER (PARTITION BY c_custkey
       |    ORDER BY length(nm) DESC, nm DESC) AS rn FROM names),
       |agg AS (SELECT c_custkey, COUNT(DISTINCT d_id) AS n_matched FROM m GROUP BY 1),
       |mb AS (SELECT c_custkey, MAX(bal) AS max_bal FROM names GROUP BY 1)
       |SELECT agg.c_custkey, CAST(n_matched AS INT) AS n_matched,
       |  best.nm AS best_name, CAST(max_bal AS DOUBLE) AS max_bal
       |FROM agg JOIN best ON agg.c_custkey = best.c_custkey AND best.rn = 1
       |JOIN mb ON mb.c_custkey = agg.c_custkey
       |ORDER BY agg.c_custkey""".stripMargin.replace("\n", " ")) { (s, dir) =>
    // the merge rationale (duplicate-insensitive single-groupBy, no
    // localCheckpoint — which also dropped AQE on the 2.2M-pair linkage
    // plan and cost ~2.5 s at sf0.1) lives with the extracted operator,
    // Linkage.goldenRecord. (The oracle's DISTINCT on the c-side union
    // arm only dedups rows that max/countDistinct ignore anyway.)
    // Matches come from the materialized per-sfDir fixture (linkDecided)
    // — the oracle still replays the full linkage from the base tables.
    val m = linkDecided(s, dir).filter(col("zone") === "match")
    Linkage.goldenRecord(m).orderBy("c_custkey")
  }

  q("q_markov_transitions",
    // first-order behavior model: event-type transition counts and
    // probabilities from per-user lead() sequences — exact integer
    // counts, one division per cell
    """WITH p AS (SELECT event_type AS cur, lead(event_type) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events),
      |c AS (SELECT cur, nxt, COUNT(*) AS n FROM p WHERE nxt IS NOT NULL
      |  GROUP BY 1, 2),
      |t AS (SELECT cur, SUM(n) AS tn FROM c GROUP BY 1)
      |SELECT c.cur, c.nxt, CAST(n AS INT) AS n,
      |  round(CAST(n AS DOUBLE) / tn, 6) AS p
      |FROM c JOIN t ON c.cur = t.cur ORDER BY 1, 2"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val c = events(s, dir)
      .select(col("event_type").as("cur"),
        lead("event_type", 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
    val t = c.groupBy("cur").agg(sum("n").as("tn"))
    c.join(broadcast(t), "cur")
      .select(col("cur"), col("nxt"), col("n").cast("int").as("n"),
        round(col("n").cast("double") / col("tn"), 6).as("p"))
      .orderBy("cur", "nxt")
  }

  q("q_sankey_paths",
    // top first-3-step user journeys (the Sankey/flow view): ordered
    // per-user prefix paths counted exactly
    """WITH r AS (SELECT user_id, event_type, row_number() OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events),
      |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM r WHERE rn <= 3 GROUP BY 1)
      |SELECT path, COUNT(*) AS n FROM p GROUP BY 1
      |ORDER BY n DESC, path LIMIT 20""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, dir)
      .select(col("user_id"), col("event_type").as("et"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .groupBy("user_id")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("rn"), col("et")))),
        e => e.getField("et")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(20)
  }

  q("text_tokenizer_stats",
    // per-source tokenizer accounting: UTF-8 bytes, whitespace words,
    // subword units, fertility (subwords/word) and bytes/subword — the
    // tokenizer-choice metrics a corpus report leads with
    s"""WITH w AS (SELECT source, octet_length(encode(text)) AS nb, len($toksSql) AS nw,
       |    len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
       |      t -> t != '')) AS ns
       |  FROM documents)
       |SELECT source, CAST(SUM(nb) AS BIGINT) AS n_bytes,
       |  CAST(SUM(nw) AS BIGINT) AS n_words, CAST(SUM(ns) AS BIGINT) AS n_subwords,
       |  round(CAST(SUM(ns) AS DOUBLE) / SUM(nw), 6) AS fertility,
       |  round(CAST(SUM(nb) AS DOUBLE) / SUM(ns), 6) AS bytes_per_subword
       |FROM w GROUP BY 1 ORDER BY source""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val sw = filter(split(lower(col("text")), "[^a-z0-9]+", -1), t => t =!= "")
    tbl(s, dir, "documents")
      .select(col("source"), octet_length(col("text")).as("nb"),
        size(TextAnalysis.tokens(col("text"))).as("nw"), size(sw).as("ns"))
      .groupBy("source")
      .agg(sum("nb").as("n_bytes"), sum("nw").as("n_words"),
        sum("ns").as("n_subwords"))
      .select(col("source"), col("n_bytes"), col("n_words"), col("n_subwords"),
        round(col("n_subwords").cast("double") / col("n_words"), 6)
          .as("fertility"),
        round(col("n_bytes").cast("double") / col("n_subwords"), 6)
          .as("bytes_per_subword"))
      .orderBy("source")
  }

  q("text_lexical_diversity",
    // log-free diversity per document: type-token ratio and the Simpson
    // repeat probability Σc(c−1)/n(n−1) — exact integer counts, one IEEE
    // division each
    s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |c AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
       |a AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS types,
       |    SUM(c * (c - 1)) AS coll FROM c GROUP BY 1)
       |SELECT doc_id, CAST(n AS INT) AS n_tokens, CAST(types AS INT) AS n_types,
       |  round(CAST(types AS DOUBLE) / n, 6) AS ttr,
       |  CASE WHEN n > 1 THEN round(CAST(coll AS DOUBLE) / (n * (n - 1)), 6)
       |    ELSE 0.0 END AS rep_prob
       |FROM a ORDER BY doc_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.lexicalDiversity(tbl(s, dir, "documents"))
      .orderBy("doc_id")
  }

  q("q_welch_ttest",
    // Welch's unequal-variance t-test (the default A/B significance
    // test): exact decimal power sums per arm, then one fixed IEEE
    // sequence for t and the Welch–Satterthwaite df
    """WITH g AS (SELECT o_orderpriority = '1-URGENT' AS a, COUNT(*) AS n,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) *
      |      CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS q
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') GROUP BY 1),
      |t AS (SELECT SUM(CASE WHEN a THEN n END) AS n1,
      |    MAX(CASE WHEN a THEN s END) AS s1, MAX(CASE WHEN a THEN q END) AS q1,
      |    SUM(CASE WHEN NOT a THEN n END) AS n2,
      |    MAX(CASE WHEN NOT a THEN s END) AS s2, MAX(CASE WHEN NOT a THEN q END) AS q2
      |  FROM g),
      |d AS (SELECT n1, n2, s1, s2,
      |    ((CAST(n1 AS DOUBLE) * q1 - s1 * s1) /
      |     (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1))) / CAST(n1 AS DOUBLE) AS se1,
      |    ((CAST(n2 AS DOUBLE) * q2 - s2 * s2) /
      |     (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1))) / CAST(n2 AS DOUBLE) AS se2
      |  FROM t)
      |SELECT CAST(n1 AS INT) AS n1, CAST(n2 AS INT) AS n2,
      |  round(s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE), 6) AS mean_diff,
      |  round((s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE)) / sqrt(se1 + se2), 6) AS t_stat,
      |  round((se1 + se2) * (se1 + se2) /
      |    (se1 * se1 / (CAST(n1 AS DOUBLE) - 1) + se2 * se2 / (CAST(n2 AS DOUBLE) - 1)), 6)
      |    AS df_welch
      |FROM d""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val o = tbl(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    Stats.welchT(o, col("o_orderpriority") === "1-URGENT",
      dec(col("o_totalprice"), 12, 2))
  }

  q("q_eval_auc",
    // exact ROC-AUC of "length predicts English" via the tie-averaged
    // rank-sum identity: 2·U1 stays integer (auc_2x_num), scores are
    // distinct-compressed before the single rank window
    """WITH g AS (SELECT n_chars AS v,
      |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ca, COUNT(*) AS c
      |  FROM documents GROUP BY 1),
      |r AS (SELECT ca, c, coalesce(SUM(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rlo FROM g),
      |t AS (SELECT SUM(ca) AS n1, SUM(c) - SUM(ca) AS n2,
      |    SUM(ca * (2 * rlo + c + 1)) AS r1x2 FROM r)
      |SELECT CAST(n1 AS INT) AS n_pos, CAST(n2 AS INT) AS n_neg,
      |  CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS auc_2x_num,
      |  round(CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) /
      |    CAST(2 * n1 * n2 AS DOUBLE), 6) AS auc
      |FROM t""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Eval.rocAuc(tbl(s, dir, "documents"), col("lang") === "en", col("n_chars"))
  }

  q("q_eval_calibration",
    // reliability table of a synthetic probability (exact milli-units)
    // against the English label: per-bin mean predicted p vs observed
    // rate plus |gap| — the ECE decomposition, integers until 3 divisions
    """WITH p AS (SELECT lang = 'en' AS pos,
      |    LEAST(999, n_chars % 500 + CASE WHEN lang = 'en' THEN 300 ELSE 100 END) AS pm
      |  FROM documents),
      |b AS (SELECT CAST(LEAST(floor(pm * 10 / 1000), 9) AS INT) AS bin,
      |    CASE WHEN pos THEN 1 ELSE 0 END AS pos, pm FROM p),
      |a AS (SELECT bin, COUNT(*) AS n, SUM(pos) AS n_pos, SUM(pm) AS sum_milli
      |  FROM b GROUP BY 1)
      |SELECT bin, n, CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(sum_milli AS BIGINT) AS sum_milli,
      |  round(CAST(sum_milli AS DOUBLE) / CAST(n * 1000 AS DOUBLE), 6) AS mean_p,
      |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
      |  round(abs(CAST(sum_milli AS DOUBLE) / CAST(n * 1000 AS DOUBLE)
      |    - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS abs_gap
      |FROM a ORDER BY bin""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val d = tbl(s, dir, "documents")
    val pm = least(lit(999), col("n_chars") % 500
      + when(col("lang") === "en", 300).otherwise(100))
    Eval.calibrationBins(d, col("lang") === "en", pm, bins = 10)
  }

  q("q_eval_ece",
    // expected + maximum calibration error: the one-number summary of
    // the q_eval_calibration table — per-bin 6-dp |gap| re-quantized to
    // exact ×1e6 integers, n-weighted exact sum for ECE, plain max for
    // MCE
    """WITH p AS (SELECT lang = 'en' AS pos,
      |    LEAST(999, n_chars % 500 + CASE WHEN lang = 'en' THEN 300 ELSE 100 END) AS pm
      |  FROM documents),
      |b AS (SELECT CAST(LEAST(floor(pm * 10 / 1000), 9) AS INT) AS bin,
      |    CASE WHEN pos THEN 1 ELSE 0 END AS pos, pm FROM p),
      |a AS (SELECT bin, COUNT(*) AS n, SUM(pos) AS n_pos, SUM(pm) AS sum_milli
      |  FROM b GROUP BY 1),
      |gp AS (SELECT n,
      |    round(abs(CAST(sum_milli AS DOUBLE) / CAST(n * 1000 AS DOUBLE)
      |      - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS abs_gap
      |  FROM a)
      |SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(COUNT(*) AS INT) AS k_bins,
      |  round(CAST(SUM(n * CAST(floor(abs_gap * 1e6 + 0.5) AS BIGINT))
      |    AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) * 1e6), 6) AS ece,
      |  MAX(abs_gap) AS mce
      |FROM gp""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val d = tbl(s, dir, "documents")
    val pm = least(lit(999), col("n_chars") % 500
      + when(col("lang") === "en", 300).otherwise(100))
    Eval.ece(d, col("lang") === "en", pm, bins = 10)
  }

  q("q_eval_isotonic",
    // isotonic (PAV) recalibration of the same reliability table: the
    // oracle replays pool-adjacent-violators as a recursive CTE over a
    // pool list, merging the LEFTMOST violating pair per step with
    // exact cross-multiplied rational compares (the fixpoint is
    // merge-order independent, so the engine's driver-side stack form
    // lands on identical pools); pooled rates in truncating ×1e6 fixed
    // point, monotone by construction
    """WITH RECURSIVE p AS (SELECT lang = 'en' AS pos,
      |    LEAST(999, n_chars % 500 + CASE WHEN lang = 'en' THEN 300 ELSE 100 END) AS pm
      |  FROM documents),
      |b AS (SELECT CAST(LEAST(floor(pm * 10 / 1000), 9) AS INT) AS bin,
      |    CASE WHEN pos THEN 1 ELSE 0 END AS pos FROM p),
      |a AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(pos) AS BIGINT) AS n_pos FROM b GROUP BY 1),
      |st(i, pools) AS (
      |  SELECT 0, list({'lo': bin, 'hi': bin, 'n': n, 'pos': n_pos} ORDER BY bin) FROM a
      |  UNION ALL
      |  SELECT i + 1,
      |    list_slice(pools, 1, k - 1) ||
      |      [{'lo': pools[k].lo, 'hi': pools[k+1].hi,
      |        'n': pools[k].n + pools[k+1].n, 'pos': pools[k].pos + pools[k+1].pos}] ||
      |      list_slice(pools, k + 2, len(pools))
      |  FROM (SELECT i, pools, list_position(
      |      list_transform(range(1, len(pools)),
      |        j -> pools[j].pos * pools[j+1].n > pools[j+1].pos * pools[j].n), true) AS k
      |    FROM st) WHERE k > 0),
      |fin AS (SELECT pools FROM st ORDER BY i DESC LIMIT 1),
      |pr AS (SELECT unnest(pools) AS pl FROM fin)
      |SELECT a.bin, a.n, a.n_pos,
      |  CAST(pl.pos * 1000000 // pl.n AS BIGINT) AS iso_rate_x1e6
      |FROM a JOIN pr ON a.bin BETWEEN pl.lo AND pl.hi ORDER BY a.bin"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val d = tbl(s, dir, "documents")
    val pm = least(lit(999), col("n_chars") % 500
      + when(col("lang") === "en", 300).otherwise(100))
    Eval.isotonicCalibration(d, col("lang") === "en", pm, bins = 10)
      .orderBy("bin")
  }

  /** Unrolled multi-source BFS oracle over the order-hash graph: round i
    * expands frontier hop = i−1 through both edge directions, then folds
    * with a min — MATERIALIZED per round (each CTE is referenced twice).
    */
  private def bfsOracle(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= "WITH p AS (SELECT o_orderkey % 3000 AS a, o_custkey % 3000 AS b FROM orders), "
    sb ++= "e AS MATERIALIZED (SELECT DISTINCT LEAST(a, b) AS pa, GREATEST(a, b) AS pb FROM p WHERE a != b), "
    sb ++= "h0 AS MATERIALIZED (SELECT v, 0 AS hop FROM (SELECT pa AS v FROM e UNION SELECT pb FROM e) WHERE v < 20), "
    for (i <- 1 to rounds) {
      sb ++= s"n$i AS MATERIALIZED (SELECT e.pb AS v FROM e JOIN h${i - 1} f ON f.v = e.pa AND f.hop = ${i - 1} " +
        s"UNION ALL SELECT e.pa FROM e JOIN h${i - 1} f ON f.v = e.pb AND f.hop = ${i - 1}), "
      sb ++= s"h$i AS MATERIALIZED (SELECT v, MIN(hop) AS hop FROM " +
        s"(SELECT v, hop FROM h${i - 1} UNION ALL SELECT v, $i FROM n$i) GROUP BY 1), "
    }
    sb.setLength(sb.length - 2)
    sb ++= s" SELECT v, CAST(hop AS INT) AS hop FROM h$rounds ORDER BY v"
    sb.toString
  }

  q("q_graph_bfs_hops", bfsOracle(3)) { (s, dir) =>
    // multi-source BFS on the order-hash graph (the k-core fixture):
    // min hops from the 20 lowest vertex ids, bounded at 3 rounds —
    // frontier join + min-fold per round, lineage truncated per round
    val p = tbl(s, dir, "orders")
      .select((col("o_orderkey") % 3000).as("a"), (col("o_custkey") % 3000).as("b"))
      .filter(col("a") =!= col("b"))
    val edges = p.select(least(col("a"), col("b")).as("pa"),
      greatest(col("a"), col("b")).as("pb")).distinct()
    val sources = edges.select(col("pa").as("v"))
      .union(edges.select(col("pb").as("v")))
      .filter(col("v") < 20).distinct()
    Graph.bfsHops(edges, sources, maxHops = 3).orderBy("v")
  }

  q("multimodal_audio_segments",
    // energy-threshold activity segmentation (the VAD primitive) through
    // REAL WAV decode: threshold 45.4e9 splits the full 128-sample blocks
    // by seed and always drops the short tail block, so islands vary;
    // the oracle replays the integer PCM generator + the same island rule
    """WITH ids AS (SELECT doc_id AS id, doc_id % 20 AS seed,
      |    CAST(400 + doc_id % 20 AS INT) AS n FROM documents WHERE doc_id < 50),
      |smp AS (SELECT id, n, g.i,
      |    (((seed * 1315423911 + g.i * 2654435761) & 65535) - 32768) AS v
      |  FROM ids, (SELECT unnest(range(420)) AS i) g WHERE g.i < n),
      |blk AS (SELECT id, i // 128 AS b, SUM(v * v) AS e FROM smp GROUP BY 1, 2),
      |act AS (SELECT id, b, e, b - row_number() OVER (PARTITION BY id ORDER BY b) AS grp
      |  FROM blk WHERE e >= 45400000000),
      |seg AS (SELECT id, MIN(b) AS start_block, MAX(b) AS end_block,
      |    CAST(COUNT(*) AS INT) AS n_blocks, CAST(SUM(e) AS BIGINT) AS energy
      |  FROM act GROUP BY id, grp)
      |SELECT id, CAST(row_number() OVER (PARTITION BY id ORDER BY start_block) - 1 AS INT) AS seg,
      |  CAST(start_block AS INT) AS start_block, CAST(end_block AS INT) AS end_block,
      |  n_blocks, energy
      |FROM seg ORDER BY id, seg""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val ids = tbl(s, dir, "documents").filter(col("doc_id") < 50).select("doc_id")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val media = ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        org.apache.spark.sql.Row(id,
          Multimodal.syntheticWav(id % 20, 8000, 400 + (id % 20).toInt))
      }
    }(enc)
    Multimodal.audioActiveSegments(media, "doc_id", blockSize = 128,
        threshold = 45400000000L)
      .orderBy("id", "seg")
  }

  q("text_readability",
    // per-source Flesch reading ease from exact integer counts: words,
    // vowel-group syllables (the classic heuristic), and terminal-
    // punctuation sentences (min 1 per doc for space-joined corpora)
    s"""WITH w AS (SELECT source, len($toksSql) AS nw,
       |    len(regexp_extract_all(text, '[aeiouy]+')) AS ny,
       |    len(regexp_split_to_array(text, '[.!?]+\\s+')) AS ns
       |  FROM documents),
       |a AS (SELECT source, COUNT(*) AS n_docs, SUM(nw) AS n_words,
       |    SUM(ny) AS n_syllables, SUM(ns) AS n_sentences FROM w GROUP BY 1)
       |SELECT source, n_docs, CAST(n_words AS BIGINT) AS n_words,
       |  CAST(n_syllables AS BIGINT) AS n_syllables,
       |  CAST(n_sentences AS BIGINT) AS n_sentences,
       |  round(CAST(n_words AS DOUBLE) / n_sentences, 6) AS words_per_sentence,
       |  round(CAST(n_syllables AS DOUBLE) / n_words, 6) AS syll_per_word,
       |  round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
       |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6) AS flesch
       |FROM a ORDER BY source""".stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.readability(tbl(s, dir, "documents")).orderBy("source")
  }

  q("text_mojibake_audit",
    // encoding-health screen over a deterministically dirtied corpus:
    // replacement-char docs, C0 control chars (minus tab/NL/CR), and the
    // non-ASCII ratio — the pre-ingest mojibake gate, exact counts
    """WITH d AS (SELECT source, text ||
      |    CASE WHEN doc_id % 7 = 0 THEN chr(65533)
      |         WHEN doc_id % 5 = 0 THEN chr(7)
      |         WHEN doc_id % 3 = 0 THEN chr(233) ELSE '' END AS txt
      |  FROM documents),
      |c AS (SELECT source, length(txt) AS nc,
      |    CASE WHEN contains(txt, chr(65533)) THEN 1 ELSE 0 END AS repl,
      |    len(regexp_extract_all(txt, '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS ctrl,
      |    len(regexp_extract_all(txt, '[^\x00-\x7F]')) AS nona FROM d)
      |SELECT source, COUNT(*) AS n_docs, CAST(SUM(nc) AS BIGINT) AS n_chars,
      |  CAST(SUM(repl) AS BIGINT) AS n_repl_docs,
      |  CAST(SUM(ctrl) AS BIGINT) AS n_ctrl_chars,
      |  CAST(SUM(nona) AS BIGINT) AS n_nonascii_chars,
      |  round(1.0e0 - CAST(SUM(nona) AS DOUBLE) / SUM(nc), 6) AS ascii_ratio
      |FROM c GROUP BY 1 ORDER BY source""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val d = tbl(s, dir, "documents")
    val dirty = concat(col("text"),
      when(col("doc_id") % 7 === 0, lit("\ufffd"))
        .when(col("doc_id") % 5 === 0, lit("\u0007"))
        .when(col("doc_id") % 3 === 0, lit("\u00e9")).otherwise(lit("")))
    TextAnalysis.encodingAudit(d, dirty).orderBy("source")
  }

  q("q_interval_merge",
    // stitch overlapping intervals per key (the interval-union /
    // session-stitch primitive): each event spans [ts, ts+1h]; a new
    // island starts where start exceeds the running max end of ALL
    // prior intervals — one user_id exchange feeds both window passes
    """WITH iv AS (SELECT user_id, epoch_us(ts) AS s0, epoch_us(ts) + 3600000000 AS e0,
      |    event_id FROM events WHERE user_id < 100),
      |m AS (SELECT user_id, s0, e0, event_id,
      |    max(e0) OVER (PARTITION BY user_id ORDER BY s0, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM iv),
      |g AS (SELECT user_id, s0, e0,
      |    SUM(CASE WHEN pmax IS NULL OR s0 > pmax THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY s0, event_id
      |        ROWS UNBOUNDED PRECEDING) AS island FROM m)
      |SELECT user_id, CAST(island AS BIGINT) AS island,
      |  MIN(s0) AS start_us, MAX(e0) AS end_us, COUNT(*) AS n_intervals
      |FROM g GROUP BY user_id, island ORDER BY user_id, island"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val iv = events(s, dir).filter(col("user_id") < 100)
      .select(col("user_id"),
        unix_micros(col("ts").cast(TimestampType)).as("s0"),
        (unix_micros(col("ts").cast(TimestampType)) + 3600000000L).as("e0"),
        col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("s0", "event_id")
    val m = iv.withColumn("pmax",
      max("e0").over(w.rowsBetween(Window.unboundedPreceding, -1)))
    m.withColumn("island",
        sum(when(col("pmax").isNull || col("s0") > col("pmax"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "island")
      .agg(min("s0").as("start_us"), max("e0").as("end_us"),
        count(lit(1)).as("n_intervals"))
      .orderBy("user_id", "island")
  }

  q("q_weighted_median",
    // exact weighted median per segment: the smallest balance whose
    // cumulative weight reaches half the total (2·cum ≥ tot in exact
    // integers — no division); weights are deterministic small ints
    """WITH t AS (SELECT c_mktsegment AS seg,
      |    CAST(c_acctbal AS DECIMAL(12,2)) AS v,
      |    1 + c_custkey % 5 AS wt, c_custkey FROM customer),
      |c AS (SELECT seg, v, wt, c_custkey,
      |    SUM(wt) OVER (PARTITION BY seg ORDER BY v, c_custkey
      |      ROWS UNBOUNDED PRECEDING) AS cw,
      |    SUM(wt) OVER (PARTITION BY seg) AS tw FROM t),
      |r AS (SELECT seg, v, cw, tw,
      |    row_number() OVER (PARTITION BY seg ORDER BY v, c_custkey) AS rn
      |  FROM c WHERE 2 * cw >= tw)
      |SELECT seg, CAST(v AS DOUBLE) AS w_median,
      |  CAST(tw AS BIGINT) AS total_weight FROM r WHERE rn = 1 ORDER BY seg"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val t = tbl(s, dir, "customer")
      .select(col("c_mktsegment").as("seg"),
        dec(col("c_acctbal"), 12, 2).as("v"),
        (lit(1) + col("c_custkey") % 5).as("wt"), col("c_custkey"))
    val ws = Window.partitionBy("seg").orderBy("v", "c_custkey")
    val c = t
      .withColumn("cw",
        sum("wt").over(ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw", sum("wt").over(Window.partitionBy("seg")))
      .filter(lit(2) * col("cw") >= col("tw"))
    c.withColumn("rn", row_number().over(ws))
      .filter(col("rn") === 1)
      .select(col("seg"), col("v").cast("double").as("w_median"),
        col("tw").cast("long").as("total_weight"))
      .orderBy("seg")
  }

  q("q_eval_pr_curve",
    // precision/recall at ten score thresholds from one histogram pass:
    // per-milli-bucket counts cum-summed from the top — the threshold
    // sweep is bins-sized, never a corpus rescan per threshold
    """WITH p AS (SELECT lang = 'en' AS pos,
      |    LEAST(999, n_chars % 500 + CASE WHEN lang = 'en' THEN 300 ELSE 100 END) AS pm
      |  FROM documents),
      |h AS (SELECT pm, SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
      |    COUNT(*) AS n FROM p GROUP BY 1),
      |t AS (SELECT unnest(range(10)) * 100 AS thr),
      |a AS (SELECT thr, SUM(CASE WHEN pm >= thr THEN np ELSE 0 END) AS tp,
      |    SUM(CASE WHEN pm >= thr THEN n - np ELSE 0 END) AS fp,
      |    SUM(CASE WHEN pm < thr THEN np ELSE 0 END) AS fn
      |  FROM t, h GROUP BY 1)
      |SELECT CAST(thr AS INT) AS thr, CAST(tp AS BIGINT) AS tp,
      |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
      |  CASE WHEN tp + fp > 0 THEN round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
      |  CASE WHEN tp + fn > 0 THEN round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall
      |FROM a ORDER BY thr""".stripMargin.replace("\n", " ")) { (s, dir) =>
    import s.implicits._
    val p = tbl(s, dir, "documents")
      .select((col("lang") === "en").as("pos"),
        least(lit(999), col("n_chars") % 500
          + when(col("lang") === "en", 300).otherwise(100)).as("pm"))
    val h = p.groupBy("pm")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        count(lit(1)).as("n"))
    val thr = (0 until 10).map(_ * 100).toDF("thr")
    broadcast(thr).crossJoin(h)
      .groupBy("thr")
      .agg(sum(when(col("pm") >= col("thr"), col("np")).otherwise(0L)).as("tp"),
        sum(when(col("pm") >= col("thr"), col("n") - col("np")).otherwise(0L)).as("fp"),
        sum(when(col("pm") < col("thr"), col("np")).otherwise(0L)).as("fn"))
      .select(col("thr").cast("int").as("thr"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
          .as("precision"),
        when(col("tp") + col("fn") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fn")), 6))
          .as("recall"))
      .orderBy("thr")
  }

  q("q_skyline_2d",
    // 2D Pareto skyline (dominance query): parts minimizing (size,
    // price) jointly — no other part is ≤ on both with < on one. The
    // oracle states the NOT EXISTS semantics directly; the engine runs
    // the O(n log n) sweep: per-x minimum, then a running strict-prefix
    // minimum over x — two window passes, no self-join
    """WITH t AS (SELECT p_partkey, p_size,
      |    CAST(p_retailprice AS DECIMAL(12,2)) AS price FROM part)
      |SELECT p_partkey, p_size, CAST(price AS DOUBLE) AS price FROM t p
      |WHERE NOT EXISTS (SELECT 1 FROM t q
      |  WHERE q.p_size <= p.p_size AND q.price <= p.price
      |    AND (q.p_size < p.p_size OR q.price < p.price))
      |ORDER BY p_size, p_partkey""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val t = tbl(s, dir, "part")
      .select(col("p_partkey"), col("p_size"),
        dec(col("p_retailprice"), 12, 2).as("price"))
    // per-size minimum price, then the strict-prefix running minimum
    // (Ranks.prefixMinExclusive over integer cents — no unpartitioned
    // window, MaxValue sentinel = "no smaller size", so the first size
    // survives the same < comparison): a size-group survives iff its
    // min price undercuts every smaller size's minimum; surviving rows
    // are those AT the group minimum
    val gmin = t.groupBy("p_size").agg(min("price").as("ymin"))
      .withColumn("cents", (col("ymin") * 100).cast("long"))
      .localCheckpoint() // consumers: the 4 Ranks actions
    val sky = Ranks.prefixMinExclusive(gmin, Seq("p_size"), "cents")
      .filter(col("cents") < col("cents_premin"))
      .select(col("p_size").as("sk_size"), col("ymin"))
    t.join(sky, col("p_size") === col("sk_size") && col("price") === col("ymin"))
      .select(col("p_partkey"), col("p_size"),
        col("price").cast("double").as("price"))
      .orderBy("p_size", "p_partkey")
  }

  q("q_event_throttle",
    // throttle/rate-limit dedup: keep an event iff ≥24h after the LAST
    // KEPT event of its (user, type) — the data-dependent recursion no
    // window frame expresses; oracle replays the fold row-for-row with a
    // recursive CTE (the stream_ewma discipline)
    """WITH RECURSIVE e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS tsm
      |  FROM events WHERE user_id < 60),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |    ORDER BY tsm, event_id) AS rn FROM e),
      |rec(user_id, event_type, rn, tsm_kept, event_id, tsm, kept) AS (
      |  SELECT user_id, event_type, rn, tsm, event_id, tsm, TRUE FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.user_id, r.event_type, r.rn,
      |    CASE WHEN r.tsm - rec.tsm_kept >= 86400000000 THEN r.tsm ELSE rec.tsm_kept END,
      |    r.event_id, r.tsm, r.tsm - rec.tsm_kept >= 86400000000
      |  FROM rec JOIN r ON r.user_id = rec.user_id
      |    AND r.event_type = rec.event_type AND r.rn = rec.rn + 1)
      |SELECT user_id, event_type, event_id, tsm FROM rec WHERE kept
      |ORDER BY user_id, event_type, event_id"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val ev = events(s, dir).filter(col("user_id") < 60)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts").cast(TimestampType)).as("tsm"))
    Resample.throttleEvents(ev, Seq("user_id", "event_type"), "tsm",
        "event_id", minGapMicros = 86400000000L)
      .orderBy("user_id", "event_type", "event_id")
  }

  /** Unrolled synchronous label-propagation oracle over the order-hash
    * graph: seeds (v < 30, label = v % 3) stay fixed; per round the
    * plurality label among labeled neighbors, ties to the smallest label.
    */
  /** CTE chain replaying [[Graph.labelPropagation]] round by round over
    * the orders mod-3000 graph; `finalSelect` (beginning with ", " to
    * continue the CTE list) lets consumers build on the `e` edge set and
    * final `l<rounds>` label CTEs — empty = the plain label listing.
    */
  private def labelPropOracle(rounds: Int, finalSelect: String = ""): String = {
    val sb = new StringBuilder
    sb ++= "WITH p AS (SELECT o_orderkey % 3000 AS a, o_custkey % 3000 AS b FROM orders), "
    sb ++= "e AS MATERIALIZED (SELECT DISTINCT LEAST(a, b) AS pa, GREATEST(a, b) AS pb FROM p WHERE a != b), "
    sb ++= "s AS MATERIALIZED (SELECT v, CAST(v % 3 AS INT) AS label FROM " +
      "(SELECT pa AS v FROM e UNION SELECT pb FROM e) WHERE v < 30), "
    sb ++= "l0 AS MATERIALIZED (SELECT v, label FROM s), "
    for (i <- 1 to rounds) {
      sb ++= s"v$i AS MATERIALIZED (SELECT e.pb AS v, l.label FROM e JOIN l${i - 1} l ON l.v = e.pa " +
        s"UNION ALL SELECT e.pa, l.label FROM e JOIN l${i - 1} l ON l.v = e.pb), "
      sb ++= s"c$i AS MATERIALIZED (SELECT v, label, COUNT(*) AS cnt FROM v$i GROUP BY 1, 2), "
      sb ++= s"b$i AS MATERIALIZED (SELECT v, label FROM (SELECT v, label, " +
        s"row_number() OVER (PARTITION BY v ORDER BY cnt DESC, label) AS rn FROM c$i) WHERE rn = 1), "
      sb ++= s"l$i AS MATERIALIZED (SELECT v, label FROM s UNION ALL " +
        s"SELECT v, label FROM b$i WHERE v NOT IN (SELECT v FROM s)), "
    }
    sb.setLength(sb.length - 2)
    if (finalSelect.nonEmpty) sb ++= finalSelect
    else sb ++= s" SELECT v, label FROM l$rounds ORDER BY v"
    sb.toString
  }

  q("q_graph_label_prop", labelPropOracle(3)) { (s, dir) =>
    // deterministic synchronous label propagation: communities spread
    // from 30 seed vertices in 3 rounds — edge join + argmax window +
    // seed-priority union per round (Graph.labelPropagation)
    val p = tbl(s, dir, "orders")
      .select((col("o_orderkey") % 3000).as("a"), (col("o_custkey") % 3000).as("b"))
      .filter(col("a") =!= col("b"))
    val edges = p.select(least(col("a"), col("b")).as("pa"),
      greatest(col("a"), col("b")).as("pb")).distinct()
    val seeds = edges.select(col("pa").as("v"))
      .union(edges.select(col("pb").as("v"))).distinct()
      .filter(col("v") < 30)
      .withColumn("label", (col("v") % 3).cast("int"))
    Graph.labelPropagation(edges, seeds, iters = 3).orderBy("v")
  }

  q("q_anova_f",
    // one-way ANOVA F of account balance (cents) across market segments:
    // ×1e6 truncating fixed-point group means (positive-sum domain, div
    // == //), SSB/SSW as exact DECIMAL(38,0) sums in the scaled space,
    // two IEEE divisions at the end — no k-term double sum anywhere
    """WITH r AS (SELECT c_mktsegment AS g,
      |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v FROM customer),
      |g AS (SELECT g, COUNT(*) AS n, SUM(v) AS s FROM r GROUP BY 1),
      |gm AS (SELECT g, n, CAST(s AS HUGEINT) * 1000000 // n AS m FROM g),
      |t AS (SELECT SUM(n) AS nn, COUNT(*) AS k, SUM(s) AS ss FROM g),
      |tm AS (SELECT nn, k, CAST(ss AS HUGEINT) * 1000000 // nn AS mm FROM t),
      |sb AS (SELECT SUM(CAST(n AS HUGEINT) * (m - mm) * (m - mm)) AS ssb FROM gm, tm),
      |sw AS (SELECT SUM((CAST(v AS HUGEINT) * 1000000 - m)
      |    * (CAST(v AS HUGEINT) * 1000000 - m)) AS ssw FROM r JOIN gm USING (g))
      |SELECT CAST(k AS INT) AS k_groups, CAST(nn AS BIGINT) AS n,
      |  CAST(ssb AS DOUBLE) AS ssb, CAST(ssw AS DOUBLE) AS ssw,
      |  round(CAST(ssb AS DOUBLE) / (k - 1) / (CAST(ssw AS DOUBLE) / (nn - k)), 6)
      |    AS f_stat,
      |  round(CAST(ssb AS DOUBLE) / CAST(ssb + ssw AS DOUBLE), 6) AS eta2
      |FROM sb, sw, tm""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.anovaF(tbl(s, dir, "customer"), col("c_mktsegment"),
      floor(col("c_acctbal") * 100 + 0.5).cast("long"))
  }

  q("q_levene",
    // Levene's homogeneity-of-variance test (mean-centered): |deviation
    // from the ×1e6 fixed-point group mean| per event value, then the
    // same exact-decimal ANOVA F over those deviations (inner scale
    // ×1e3) — the variance pre-check before any pooled t-test
    """WITH r AS (SELECT event_type AS g,
      |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v FROM events),
      |g1 AS (SELECT g, COUNT(*) AS n, SUM(v) AS s FROM r GROUP BY 1),
      |m1 AS (SELECT g, CAST(s AS HUGEINT) * 1000000 // n AS m FROM g1),
      |z AS (SELECT r.g, abs(CAST(v AS HUGEINT) * 1000000 - m) AS z
      |  FROM r JOIN m1 USING (g)),
      |g2 AS (SELECT g, COUNT(*) AS n, SUM(z) AS s FROM z GROUP BY 1),
      |gm AS (SELECT g, n, CAST(s AS HUGEINT) * 1000 // n AS m FROM g2),
      |t AS (SELECT SUM(n) AS nn, COUNT(*) AS k, SUM(s) AS ss FROM g2),
      |tm AS (SELECT nn, k, CAST(ss AS HUGEINT) * 1000 // nn AS mm FROM t),
      |sb AS (SELECT SUM(CAST(n AS HUGEINT) * (m - mm) * (m - mm)) AS ssb FROM gm, tm),
      |sw AS (SELECT SUM((z.z * 1000 - m) * (z.z * 1000 - m)) AS ssw
      |  FROM z JOIN gm USING (g))
      |SELECT CAST(k AS INT) AS k_groups, CAST(nn AS BIGINT) AS n,
      |  CAST(ssb AS DOUBLE) AS ssb, CAST(ssw AS DOUBLE) AS ssw,
      |  round(CAST(ssb AS DOUBLE) / (k - 1) / (CAST(ssw AS DOUBLE) / (nn - k)), 6)
      |    AS f_stat,
      |  round(CAST(ssb AS DOUBLE) / CAST(ssb + ssw AS DOUBLE), 6) AS eta2
      |FROM sb, sw, tm""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.levene(events(s, dir), col("event_type"),
      floor(col("value") * 1000 + 0.5).cast("long"))
  }

  q("q_kruskal_wallis",
    // Kruskal-Wallis H across the five market segments: doubled
    // tie-averaged ranks (2r = 2p+c+1) stay integral, prefix counts
    // come from the windowless rank machinery, per-group (2R)² div n in
    // truncating fixed point, exact tie correction — the k-group rank
    // test completing the MW-U family
    """WITH r AS (SELECT c_mktsegment AS g,
      |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v FROM customer),
      |vg AS (SELECT v, g, COUNT(*) AS cgv FROM r GROUP BY 1, 2),
      |pv AS (SELECT v, SUM(cgv) AS c FROM vg GROUP BY 1),
      |pre AS (SELECT v, c, COALESCE(SUM(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p FROM pv),
      |ties AS (SELECT SUM(CAST(c AS HUGEINT) * c * c - c) AS tie FROM pre),
      |grp AS (SELECT g, SUM(cgv) AS n,
      |    SUM(CAST(cgv AS HUGEINT) * (2 * p + c + 1)) AS r2
      |  FROM vg JOIN pre USING (v) GROUP BY 1),
      |gt AS (SELECT g, n, CAST(r2 AS HUGEINT) * r2 // n AS t_fp FROM grp),
      |tot AS (SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(t_fp) AS t FROM gt)
      |SELECT CAST(k AS INT) AS k_groups, CAST(nn AS BIGINT) AS n,
      |  CAST(t AS BIGINT) AS t_sum, CAST(tie AS BIGINT) AS tie_sum,
      |  round(3 * CAST(t AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE))
      |    - 3 * CAST(nn + 1 AS DOUBLE), 6) AS h,
      |  round((3 * CAST(t AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE))
      |    - 3 * CAST(nn + 1 AS DOUBLE))
      |    / (1 - CAST(tie AS DOUBLE)
      |      / CAST(CAST(nn AS HUGEINT) * nn * nn - nn AS DOUBLE)), 6) AS h_adj
      |FROM tot, ties""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.kruskalWallis(tbl(s, dir, "customer"), col("c_mktsegment"),
      floor(col("c_acctbal") * 100 + 0.5).cast("long"))
  }

  q("q_burstiness",
    // inter-arrival burstiness per event type: millisecond gaps from
    // each user's (ts, event_id)-ordered stream (partitioned window,
    // state = one user's history), exact integer power sums, CV² in
    // truncating ×1e6 fixed point and Goh-Barabási B = (σ−μ)/(σ+μ)
    // with one IEEE sqrt — B → 1 bursty, → 0 Poisson-like, < 0 regular
    """WITH e AS (SELECT user_id AS u, event_type AS key,
      |    epoch_us(ts) // 1000 AS t, event_id AS i FROM events),
      |l AS (SELECT key, lead(t) OVER (PARTITION BY u ORDER BY t, i) - t AS gap
      |  FROM e),
      |gp AS (SELECT key, gap FROM l WHERE gap IS NOT NULL),
      |a AS (SELECT key, COUNT(*) AS n, SUM(CAST(gap AS HUGEINT)) AS s,
      |    SUM(CAST(gap AS HUGEINT) * gap) AS q FROM gp GROUP BY 1)
      |SELECT key, CAST(n AS BIGINT) AS n_gaps, CAST(s AS BIGINT) AS sum_ms,
      |  CAST((n * q - s * s) * 1000000 // (s * s) AS BIGINT) AS cv2_x1e6,
      |  round((sqrt(CAST(n * q - s * s AS DOUBLE)) - CAST(s AS DOUBLE))
      |    / (sqrt(CAST(n * q - s * s AS DOUBLE)) + CAST(s AS DOUBLE)), 6)
      |    AS burstiness
      |FROM a ORDER BY key""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.burstiness(events(s, dir), col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 1000"), col("event_id"))
      .orderBy("key")
  }

  q("q_graph_assortativity",
    // degree assortativity of the parts-sharing-a-supplier graph:
    // Pearson of endpoint degrees over both edge orientations — exact
    // integer power sums (by symmetry only three ship), one IEEE
    // combination; negative r = hubs attach to leaves
    """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
      |  WHERE l_partkey < 300),
      |e AS (SELECT DISTINCT a.p AS pa, b.p AS pb FROM ps a
      |  JOIN ps b ON a.s = b.s AND a.p < b.p),
      |nb AS (SELECT pa AS v FROM e UNION ALL SELECT pb FROM e),
      |d AS (SELECT v, COUNT(*) AS dg FROM nb GROUP BY 1),
      |pr AS (SELECT da.dg AS x, db.dg AS y FROM e
      |  JOIN d da ON e.pa = da.v JOIN d db ON e.pb = db.v),
      |sm AS (SELECT 2 * COUNT(*) AS m2, SUM(CAST(x AS HUGEINT) + y) AS sx,
      |  SUM(CAST(x AS HUGEINT) * x + CAST(y AS HUGEINT) * y) AS sxx,
      |  2 * SUM(CAST(x AS HUGEINT) * y) AS sxy FROM pr)
      |SELECT CAST(m2 AS BIGINT) AS n_endpoints,
      |  round(CAST(m2 * sxy - sx * sx AS DOUBLE)
      |    / CAST(m2 * sxx - sx * sx AS DOUBLE), 6) AS assortativity
      |FROM sm""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Graph.assortativity(Graph.coOccurrenceEdges(
      tbl(s, dir, "lineitem").filter(col("l_partkey") < 300),
      "l_partkey", "l_suppkey"))
  }

  q("q_graph_modularity", labelPropOracle(3,
    """, vts AS (SELECT DISTINCT v FROM
      |  (SELECT pa AS v FROM e UNION ALL SELECT pb AS v FROM e)),
      |vc AS (SELECT vts.v, COALESCE(l.label, -vts.v - 1) AS c
      |  FROM vts LEFT JOIN l3 l ON l.v = vts.v),
      |wc AS MATERIALIZED (SELECT ca.c AS ca, cb.c AS cb FROM e
      |  JOIN vc ca ON e.pa = ca.v JOIN vc cb ON e.pb = cb.v),
      |mm AS (SELECT COUNT(*) AS m FROM wc),
      |ic AS (SELECT ca AS c, COUNT(*) AS in_c FROM wc WHERE ca = cb GROUP BY 1),
      |tc AS (SELECT c, COUNT(*) AS tot_c FROM
      |  (SELECT ca AS c FROM wc UNION ALL SELECT cb FROM wc) GROUP BY 1),
      |ag AS (SELECT COUNT(*) AS n_communities,
      |    SUM(4 * mm.m * CAST(COALESCE(in_c, 0) AS HUGEINT)
      |      - CAST(tot_c AS HUGEINT) * tot_c) AS q4m2
      |  FROM tc LEFT JOIN ic USING (c), mm)
      |SELECT CAST(mm.m AS BIGINT) AS m_edges,
      |  CAST(n_communities AS BIGINT) AS n_communities,
      |  CAST(q4m2 AS BIGINT) AS q4m2,
      |  CAST(CASE WHEN q4m2 < 0 THEN -1 WHEN q4m2 > 0 THEN 1 ELSE 0 END
      |    * (abs(q4m2) * 1000000 // (4 * CAST(mm.m AS HUGEINT) * mm.m)) AS BIGINT)
      |    AS modularity_x1e6
      |FROM ag, mm""".stripMargin.replace("\n", " "))) { (s, dir) =>
    // Newman modularity of the 3-round label-prop communities over the
    // SAME orders mod-3000 graph — Q·4m² exactly in integers (unlabeled
    // vertices = singleton communities), one sign-split ×1e6 division
    val p = tbl(s, dir, "orders")
      .select((col("o_orderkey") % 3000).as("a"), (col("o_custkey") % 3000).as("b"))
      .filter(col("a") =!= col("b"))
    // lazy checkpoint (r16): the edge build (scan + distinct) otherwise
    // re-executes in each of its THREE consumers' action chains — the
    // seed sizing inside labelPropagation, labelPropagation's own nb
    // build, and modularity's e build
    val edges = p.select(least(col("a"), col("b")).as("pa"),
      greatest(col("a"), col("b")).as("pb")).distinct()
      .localCheckpoint(false)
    val seeds = edges.select(col("pa").as("v"))
      .union(edges.select(col("pb").as("v"))).distinct()
      .filter(col("v") < 30)
      .withColumn("label", (col("v") % 3).cast("int"))
    Graph.modularity(edges, Graph.labelPropagation(edges, seeds, iters = 3))
  }

  q("q_eval_brier",
    // Murphy decomposition of the Brier score over the calibration
    // bins: BS (exact integer Σ(p−o)² div N), reliability, resolution,
    // uncertainty — all in truncating ×1e6 fixed point, zero float
    // accumulation
    """WITH p AS (SELECT lang = 'en' AS pos,
      |    LEAST(999, n_chars % 500 + CASE WHEN lang = 'en' THEN 300 ELSE 100 END) AS pm
      |  FROM documents),
      |b AS (SELECT CAST(LEAST(floor(pm * 10 / 1000), 9) AS INT) AS bin,
      |    CASE WHEN pos THEN 1 ELSE 0 END AS pos, pm FROM p),
      |a AS (SELECT bin, COUNT(*) AS n, SUM(pos) AS n_pos, SUM(pm) AS sum_milli,
      |    SUM(CAST(pm - 1000 * pos AS HUGEINT) * (pm - 1000 * pos)) AS se
      |  FROM b GROUP BY 1),
      |t AS (SELECT SUM(n) AS nn, SUM(n_pos) AS np FROM a),
      |tm AS (SELECT nn, np, CAST(np AS HUGEINT) * 1000000 // nn AS obar FROM t),
      |pb AS (SELECT n, se, CAST(sum_milli AS HUGEINT) * 1000 // n AS pbar,
      |    CAST(n_pos AS HUGEINT) * 1000000 // n AS obk FROM a),
      |ag AS (SELECT SUM(se) AS se_sum,
      |    SUM(CAST(n AS HUGEINT) * (pbar - obk) * (pbar - obk)) AS rel_n,
      |    SUM(CAST(n AS HUGEINT) * (obk - obar) * (obk - obar)) AS res_n
      |  FROM pb, tm)
      |SELECT CAST(nn AS BIGINT) AS n, CAST(np AS BIGINT) AS n_pos,
      |  CAST(se_sum // nn AS BIGINT) AS brier_x1e6,
      |  CAST(rel_n // (nn * CAST(1000000 AS HUGEINT)) AS BIGINT) AS rel_x1e6,
      |  CAST(res_n // (nn * CAST(1000000 AS HUGEINT)) AS BIGINT) AS res_x1e6,
      |  CAST(obar * (1000000 - obar) // 1000000 AS BIGINT) AS unc_x1e6
      |FROM ag, tm""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val d = tbl(s, dir, "documents")
    val pm = least(lit(999), col("n_chars") % 500
      + when(col("lang") === "en", 300).otherwise(100))
    Eval.brierDecomposition(d, col("lang") === "en", pm, bins = 10)
  }

  q("q_ab_srm",
    // sample-ratio-mismatch check for the deterministic md5-parity
    // 50/50 split: per-stratum and pooled (stratum = NULL) arm counts,
    // χ² vs the even split in exact ×1e6 fixed point, z in one IEEE
    // step — run this BEFORE reading any A/B result
    s"""WITH a AS (SELECT c_mktsegment AS stratum,
      |    ${md5Hash60Sql("c_custkey")} % 2 = 0 AS arm_a FROM customer),
      |c AS (SELECT stratum, SUM(CASE WHEN arm_a THEN 1 ELSE 0 END) AS n1,
      |    SUM(CASE WHEN arm_a THEN 0 ELSE 1 END) AS n2 FROM a GROUP BY 1),
      |u AS (SELECT * FROM c UNION ALL
      |  SELECT CAST(NULL AS VARCHAR), SUM(n1), SUM(n2) FROM c)
      |SELECT stratum, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST((n1 - n2) * (n1 - n2) * 1000000 // (n1 + n2) AS BIGINT) AS chi2_x1e6,
      |  round(CAST(n1 - n2 AS DOUBLE) / sqrt(CAST(n1 + n2 AS DOUBLE)), 6) AS z
      |FROM u ORDER BY stratum NULLS FIRST"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    Eval.srmCheck(tbl(s, dir, "customer"), col("c_custkey"), col("c_mktsegment"))
      .orderBy(asc_nulls_first("stratum"))
  }

  q("text_source_similarity",
    // corpus-mix comparison: pairwise cosine between per-source unigram
    // tf vectors — integer dot products via ONE token-keyed join (fan-out
    // bounded by the source-pair count), integer norms, one IEEE
    // sqrt+division per pair
    s"""WITH tf AS (SELECT source AS g, tok, COUNT(*) AS f FROM
      |  (SELECT source, unnest($toksSql) AS tok FROM documents)
      |  WHERE tok <> '' GROUP BY 1, 2),
      |nm AS (SELECT g, SUM(CAST(f AS HUGEINT) * f) AS n2 FROM tf GROUP BY 1),
      |dt AS (SELECT a.g AS ga, b.g AS gb, SUM(CAST(a.f AS HUGEINT) * b.f) AS dot
      |  FROM tf a JOIN tf b ON a.tok = b.tok AND a.g < b.g GROUP BY 1, 2)
      |SELECT ga, gb, CAST(dot AS BIGINT) AS dot,
      |  round(CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE)), 6)
      |    AS cosine
      |FROM dt JOIN nm na ON dt.ga = na.g JOIN nm nb ON dt.gb = nb.g
      |ORDER BY ga, gb""".stripMargin.replace("\n", " ")) { (s, dir) =>
    TextAnalysis.sourceCosine(tbl(s, dir, "documents"), col("source"))
      .orderBy("ga", "gb")
  }

  q("q_mann_kendall",
    // Mann-Kendall monotonic-trend test + Sen's slope on the hourly
    // event-count series: exact sign sums and tie-corrected Var·18 over
    // the span-bounded pair join, continuity-corrected z, and the
    // physical lower-middle pairwise slope (exact dv/dt reported)
    """WITH h AS (SELECT CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS v FROM events GROUP BY 1),
      |p AS (SELECT b.v - a.v AS dv, b.t - a.t AS dt FROM h a JOIN h b ON b.t > a.t),
      |sa AS (SELECT COUNT(*) AS m,
      |    SUM(CASE WHEN dv > 0 THEN 1 WHEN dv < 0 THEN -1 ELSE 0 END) AS s FROM p),
      |tn AS (SELECT COUNT(*) AS t FROM h),
      |tie AS (SELECT COALESCE(SUM(CAST(c AS HUGEINT) * (c - 1) * (2 * c + 5)), 0)
      |    AS ts FROM (SELECT v, COUNT(*) AS c FROM h GROUP BY 1) WHERE c > 1),
      |sen AS (SELECT dv, dt FROM
      |  (SELECT dv, dt, row_number() OVER (ORDER BY CAST(dv AS DOUBLE) / dt,
      |    dv, dt) AS rn FROM p), sa WHERE rn = (m - 1) // 2 + 1)
      |SELECT t AS n_points, CAST(m AS BIGINT) AS n_pairs, CAST(s AS BIGINT) AS s,
      |  CAST(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5) - ts AS BIGINT) AS var18,
      |  round(CAST(s - CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END
      |      AS DOUBLE)
      |    / sqrt(CAST(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5) - ts AS DOUBLE)
      |      / 18.0), 6) AS z,
      |  sen.dv AS sen_dv, sen.dt AS sen_dt,
      |  round(CAST(sen.dv AS DOUBLE) / CAST(sen.dt AS DOUBLE), 6) AS sen_slope
      |FROM tn, sa, tie, sen""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val h = events(s, dir)
      .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
        .cast("long").as("t"))
      .agg(count(lit(1)).as("v"))
    Stats.mannKendall(h, col("t"), col("v"))
  }

  q("q_kendall_tau",
    // Kendall's tau-b between the click and view hourly series:
    // concordant/discordant/tied pair counts exactly over the
    // span-bounded pair join, one IEEE combination — the rank
    // correlation completing Spearman (which assumes no heavy ties)
    """WITH hx AS (SELECT CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS v FROM events WHERE event_type = 'click' GROUP BY 1),
      |hy AS (SELECT CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS v FROM events WHERE event_type = 'view' GROUP BY 1),
      |j AS (SELECT hx.t, hx.v AS xv, hy.v AS yv FROM hx JOIN hy USING (t)),
      |p AS (SELECT b.xv - a.xv AS dx, b.yv - a.yv AS dy
      |  FROM j a JOIN j b ON b.t > a.t),
      |ag AS (SELECT COUNT(*) AS n0,
      |  SUM(CASE WHEN dx <> 0 AND dy <> 0 AND ((dx > 0) = (dy > 0))
      |    THEN 1 ELSE 0 END) AS c,
      |  SUM(CASE WHEN dx <> 0 AND dy <> 0 AND ((dx > 0) <> (dy > 0))
      |    THEN 1 ELSE 0 END) AS d,
      |  SUM(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS n1,
      |  SUM(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS n2 FROM p)
      |SELECT CAST(n0 AS BIGINT) AS n0, CAST(c AS BIGINT) AS c,
      |  CAST(d AS BIGINT) AS d, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  round(CAST(c - d AS DOUBLE)
      |    / sqrt(CAST(CAST(n0 - n1 AS HUGEINT) * (n0 - n2) AS DOUBLE)), 6)
      |    AS tau_b
      |FROM ag""".stripMargin.replace("\n", " ")) { (s, dir) =>
    def hourly(et: String) = events(s, dir).filter(col("event_type") === et)
      .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
        .cast("long").as("t"))
      .agg(count(lit(1)).as("v"))
    Stats.kendallTau(hourly("click"), hourly("view"), "t", "v")
  }

  q("q_seasonal_decomp",
    // classical decomposition of the hourly series at period 24:
    // half-weight-ended centered MA trend in exact ×1e6 fixed point
    // (one 25-way literal fan-out + ONE shifted-index join, gap-robust),
    // seasonal index per hour-of-day as the exact detrended sum + one
    // IEEE division — the additive X-11 opening move, windowless
    s"""WITH h AS (SELECT CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS v FROM events GROUP BY 1),
      |o AS (SELECT k, w FROM (VALUES ${(-12 to 12).map(k =>
            s"($k, ${if (math.abs(k) == 12) 1 else 2})").mkString(", ")}) x(k, w)),
      |f AS (SELECT h.t, o.w, n.v AS nv FROM h CROSS JOIN o
      |  JOIN h n ON n.t = h.t + o.k),
      |tr AS (SELECT t, COUNT(*) AS cnt, SUM(w * nv) AS s2p FROM f GROUP BY 1),
      |td AS (SELECT t, s2p * 1000000 // 48 AS trend_fp FROM tr WHERE cnt = 25),
      |dd AS (SELECT CAST(h.t % 24 AS INT) AS phase,
      |    h.v * 1000000 - trend_fp AS d_fp FROM td JOIN h USING (t))
      |SELECT phase, COUNT(*) AS n_points, CAST(SUM(d_fp) AS BIGINT) AS d_sum,
      |  round(CAST(SUM(d_fp) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1e6), 6)
      |    AS seasonal
      |FROM dd GROUP BY 1 ORDER BY phase""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val h = events(s, dir)
      .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
        .cast("long").as("t"))
      .agg(count(lit(1)).as("v"))
    Stats.seasonalDecompose(h, col("t"), col("v"), period = 24)
      .orderBy("phase")
  }

  q("q_two_proportion",
    // pooled two-proportion z-test of per-user HEAVY-purchaser status
    // (>= 14 purchases — near the per-user median at every sf, so
    // neither pooled rate degenerates to 0/1) between the md5-parity
    // arms: exact integer arm totals, one fixed IEEE sequence for
    // p-diff and z — the standard conversion read behind q_ab_srm's gate
    s"""WITH u AS (SELECT user_id,
      |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
      |      THEN 1 ELSE 0 END AS conv
      |  FROM events GROUP BY 1),
      |a AS (SELECT ${md5Hash60Sql("user_id")} % 2 = 0 AS arm, conv FROM u),
      |g AS (SELECT SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS n1,
      |    SUM(CASE WHEN arm THEN conv ELSE 0 END) AS x1,
      |    SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS n2,
      |    SUM(CASE WHEN NOT arm THEN conv ELSE 0 END) AS x2 FROM a)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
      |  CAST(n2 AS BIGINT) AS n2, CAST(x2 AS BIGINT) AS x2,
      |  round(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |    - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS p_diff,
      |  round((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |      - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
      |    / sqrt((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
      |      * (1 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
      |      * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))), 6) AS z
      |FROM g""".stripMargin.replace("\n", " ")) { (s, dir) =>
    val u = events(s, dir).groupBy("user_id")
      .agg(when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        >= 14, 1L).otherwise(0L).as("conv"))
    Eval.twoProportionZ(u,
      pmod(graft.ops.Pipeline.md5Hash60(col("user_id").cast("string")),
        lit(2)) === 0,
      col("conv") === 1L)
  }

  q("stream_srm",
    // the 20th streaming query: RUNNING sample-ratio-mismatch monitoring
    // — complete-mode arm counts over the replayed event feed, the same
    // exact ×1e6 chi-square as the batch q_ab_srm; catches a broken
    // assignment WHILE the experiment ingests, not after
    s"""WITH a AS (SELECT ${md5Hash60Sql("user_id")} % 2 = 0 AS arm FROM events),
      |g AS (SELECT SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS n1,
      |    SUM(CASE WHEN arm THEN 0 ELSE 1 END) AS n2 FROM a)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST((n1 - n2) * (n1 - n2) * 1000000 // (n1 + n2) AS BIGINT)
      |    AS chi2_x1e6
      |FROM g""".stripMargin.replace("\n", " ")) { (s, dir) =>
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s.readStream.schema(tbl(s, dir, "events").schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val armed = src.select(
      (pmod(graft.ops.Pipeline.md5Hash60(col("user_id").cast("string")),
        lit(2)) === 0).as("arm"))
      .groupBy("arm").agg(count(lit(1)).as("n"))
    val qname = "graft_stream_srm"
    withShufflePartitions(s, 4) {
      val query = armed.writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
      try query.processAllAvailable() finally query.stop()
    }
    s.table(qname)
      .agg(sum(when(col("arm"), col("n")).otherwise(0L)).cast("long").as("n1"),
        sum(when(!col("arm"), col("n")).otherwise(0L)).cast("long").as("n2"))
      .select(col("n1"), col("n2"),
        expr("(n1 - n2) * (n1 - n2) * 1000000 div (n1 + n2)").cast("long")
          .as("chi2_x1e6"))
  }

  q("q_embedding_drift",
    // embedding-distribution drift between the even/odd vec_id cohorts:
    // per-dim coordinate sums on the 2^20 grid, centroid deltas as
    // cross-multiplied integers over the common na·nb denominator (the
    // dims reduce is an exact decimal sum), squared centroid distance +
    // centroid cosine (scale cancels) + the most-shifted dimension
    """WITH q AS (SELECT vec_id % 2 = 0 AS a,
      |    generate_subscripts(embedding, 1) - 1 AS dim,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1048576 + 0.5) AS BIGINT) AS q
      |  FROM embeddings),
      |cnt AS (SELECT SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
      |    SUM(CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END) AS nb FROM embeddings),
      |bd AS (SELECT dim, SUM(CASE WHEN a THEN q ELSE 0 END) AS sa,
      |    SUM(CASE WHEN NOT a THEN q ELSE 0 END) AS sb FROM q GROUP BY 1),
      |dd AS (SELECT dim, na, nb,
      |    CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na AS ddn,
      |    CAST(sa AS HUGEINT) AS sa, CAST(sb AS HUGEINT) AS sb FROM bd, cnt),
      |ag AS (SELECT na, nb, COUNT(*) AS n_dims, SUM(ddn * ddn) AS d2n,
      |    SUM(sa * sb) AS sab, SUM(sa * sa) AS saa, SUM(sb * sb) AS sbb
      |  FROM dd GROUP BY 1, 2),
      |tp AS (SELECT dim AS top_dim, ddn AS top_ddn FROM dd
      |  ORDER BY ddn * ddn DESC, dim LIMIT 1)
      |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  CAST(n_dims AS INT) AS n_dims,
      |  round(CAST(d2n AS DOUBLE)
      |    / ((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 1048576.0)
      |      * (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 1048576.0)), 6)
      |    AS centroid_dist2,
      |  round(CAST(sab AS DOUBLE)
      |    / sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE)), 6) AS centroid_cos,
      |  CAST(top_dim AS INT) AS top_dim,
      |  round(CAST(top_ddn AS DOUBLE)
      |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 1048576.0), 6)
      |    AS top_dim_shift
      |FROM ag, tp""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Similarity.embeddingDrift(tbl(s, dir, "embeddings"), col("vec_id") % 2 === 0)
  }

  q("q_theilsen_by_group",
    // per-stream Theil-Sen robust trend: each event type's hourly
    // series gets the physical lower-middle pairwise slope — outliers
    // in single hours cannot move it, unlike the OLS fit; span-bounded
    // pair join, one partitioned sort per group
    """WITH h AS (SELECT event_type AS g,
      |    CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS v FROM events GROUP BY 1, 2),
      |p AS (SELECT a.g, b.v - a.v AS dv, b.t - a.t AS dt
      |  FROM h a JOIN h b ON a.g = b.g AND b.t > a.t),
      |r AS (SELECT g, dv, dt,
      |    row_number() OVER (PARTITION BY g
      |      ORDER BY CAST(dv AS DOUBLE) / dt, dv, dt) AS rn,
      |    COUNT(*) OVER (PARTITION BY g) AS m FROM p)
      |SELECT g, CAST(m AS BIGINT) AS n_pairs, dv AS sen_dv, dt AS sen_dt,
      |  round(CAST(dv AS DOUBLE) / CAST(dt AS DOUBLE), 6) AS sen_slope
      |FROM r WHERE rn = (m - 1) // 2 + 1 ORDER BY g"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val h = events(s, dir)
      .groupBy(col("event_type").as("g"),
        (unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
          .cast("long").as("t"))
      .agg(count(lit(1)).as("v"))
    Stats.senSlopeByGroup(h, col("g"), col("t"), col("v")).orderBy("g")
  }

  q("q_cochran_armitage",
    // Cochran-Armitage trend test: does the share of FINISHED orders
    // rise monotonically with the priority digit? T·N and the variance
    // pieces exactly in integers over the 5 dose rows, one IEEE
    // combination — the ordered-category completion of the chi-square
    """WITH r AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS x FROM orders),
      |g AS (SELECT w, COUNT(*) AS n, SUM(x) AS x FROM r GROUP BY 1),
      |t AS (SELECT SUM(n) AS nn, SUM(x) AS xx FROM g),
      |p AS (SELECT COUNT(*) AS k,
      |    SUM(CAST(w AS HUGEINT) * (CAST(x AS HUGEINT) * nn - CAST(n AS HUGEINT) * xx)) AS tn,
      |    SUM(CAST(w AS HUGEINT) * w * n) AS w2n,
      |    SUM(CAST(w AS HUGEINT) * n) AS wn FROM g, t)
      |SELECT CAST(k AS INT) AS k_doses, CAST(nn AS BIGINT) AS n,
      |  CAST(xx AS BIGINT) AS x, CAST(tn AS BIGINT) AS t_n,
      |  round(CAST(tn AS DOUBLE)
      |    / sqrt(CAST(CAST(xx AS HUGEINT) * (nn - xx) * (nn * w2n - wn * wn)
      |        AS DOUBLE) / CAST(nn AS DOUBLE)), 6) AS z
      |FROM p, t""".stripMargin.replace("\n", " ")) { (s, dir) =>
    Stats.cochranArmitage(tbl(s, dir, "orders"),
      substring(col("o_orderpriority"), 1, 1).cast("long"),
      col("o_orderstatus") === "F")
  }

  q("q_feature_bins",
    // equal-frequency feature binning of order totals (cents): NTILE
    // deciles via the windowless global-rank machinery, per-bin count,
    // exact min/max/sum, mean in one IEEE step — the bin-edge table a
    // feature pipeline persists
    """WITH r AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
      |    o_orderkey AS tie FROM orders),
      |b AS (SELECT v, ntile(10) OVER (ORDER BY v, tie) AS bin FROM r)
      |SELECT CAST(bin AS INT) AS bin, COUNT(*) AS n, MIN(v) AS min_cents,
      |  MAX(v) AS max_cents, CAST(SUM(v) AS BIGINT) AS sum_cents,
      |  round(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0, 6)
      |    AS mean_dollars
      |FROM b GROUP BY 1 ORDER BY bin""".stripMargin.replace("\n", " ")) { (s, dir) =>
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    val base = tbl(s, dir, "orders")
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("v"),
        col("o_orderkey").as("tie"))
      .localCheckpoint() // Ranks deterministic-input contract (4 actions)
    val n = base.count()
    Ranks.globalRank(base, col("v"), col("tie"), "r")
      .withColumn("bin", Ranks.ntileOfRank(col("r"), lit(n), 10).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min("v").as("min_cents"),
        max("v").as("max_cents"), sum(d38(col("v"))).cast("long").as("sum_cents"))
      .withColumn("mean_dollars",
        round(col("sum_cents").cast("double") / col("n").cast("double") / 100.0, 6))
      .orderBy("bin")
  }

  q("stream_topk",
    // complete-mode streaming heavy hitters: the running top-15 tokens —
    // sort+limit is legal in complete mode because the full aggregate
    // state re-emits per batch; oracle = the batch top-k
    s"""WITH toks AS (SELECT doc_id, $toksSql AS w FROM documents WHERE doc_id < 200)
       |SELECT tok, COUNT(*) AS n FROM (SELECT unnest(w) AS tok FROM toks)
       |GROUP BY tok ORDER BY n DESC, tok LIMIT 15"""
      .stripMargin.replace("\n", " ")) { (s, dir) =>
    val src = s.readStream.schema(tbl(s, dir, "documents").schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val top = src.filter(col("doc_id") < 200)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(15)
    val qname = "graft_stream_topk"
    withShufflePartitions(s, 4) {
      val query = top.writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
      try query.processAllAvailable() finally query.stop()
    }
    s.table(qname).orderBy(col("n").desc, col("tok"))
  }
}
