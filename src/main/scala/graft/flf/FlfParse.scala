package graft.flf

import graft.schema._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The convert read path: fixed-length text lines → typed DataFrame.
  *
  * Spark-first re-expression of the reference's extract → trim → cast
  * pipeline (reference: crates/evolution-builder/src/builder.rs:54-64,
  * crates/evolution-parser/src/datatype.rs:37-178). The whole plan is a
  * single narrow `select` over `spark.read.text` — no shuffle, fully
  * whole-stage-codegen'd; Hadoop's LineRecordReader provides the
  * newline-aligned chunk splitting the reference hand-rolls
  * (crates/evolution-slicer/src/slicer.rs:159-266).
  */
object FlfParse {

  /** Read a fixed-length file into a typed DataFrame. */
  def read(spark: SparkSession, path: String, schema: FixedSchema): DataFrame =
    parse(spark.read.text(path), schema)

  /** Parse a DataFrame of lines (column `value: string`) per the schema:
    * one fused SliceFixedLine walk per row (all cells extracted + trimmed
    * in O(line length), independent of column count), then the strict
    * typed cast + null policy per cell in built-in operators. Staged in
    * two projections so the slicer evaluates once (CollapseProject keeps
    * non-cheap producers used more than once in their own projection).
    */
  def parse(lines: DataFrame, schema: FixedSchema): DataFrame = {
    val alignCode: Alignment => Int = {
      case Alignment.Left => 0; case Alignment.Right => 1; case Alignment.Center => 2
    }
    val cells = graft.functions.SliceFixedLine(col("value"),
      schema.columns.map(_.offset), schema.columns.map(_.length),
      schema.columns.map(c => alignCode(c.alignment)),
      schema.columns.map(_.padSymbol))
    lines.select(cells.as("__cells"))
      .select(schema.columns.zipWithIndex.map { case (c, i) =>
        fromTrimmed(col("__cells").getItem(i), c)
      }: _*)
  }

  /** Schema evolution — the reference's namesake scenario: a fleet of
    * fixed-length files written under successive schema generations
    * (`FixedSchema.version`), each with its own layout, evolved into ONE
    * table shaped by the newest generation. Every generation parses with
    * its own offsets/pads/types; columns align by NAME to the newest
    * schema; columns a generation predates null-fill; columns the newest
    * schema dropped are omitted. The union is narrow (no shuffle): each
    * input split parses straight into the target shape.
    *
    * Generations must agree on the dtype of any shared column name
    * (checked up front — silently casting e.g. an old Int32 into a new
    * Utf8 would mask real layout bugs).
    */
  def parseEvolving(generations: Seq[(DataFrame, FixedSchema)]): DataFrame = {
    require(generations.nonEmpty, "parseEvolving requires at least one generation")
    val target = generations.last._2
    for ((_, g) <- generations; c <- g.columns) {
      target.columns.find(_.name == c.name).foreach { tc =>
        require(tc.dtype == c.dtype,
          s"column '${c.name}': generation ${g.version} declares ${c.dtype}, " +
            s"newest generation ${target.version} declares ${tc.dtype}")
      }
    }
    generations.map { case (lines, gen) =>
      val parsed = parse(lines, gen)
      target.columns.map { tc =>
        if (gen.columns.exists(_.name == tc.name)) parsed.col(tc.name)
        else lit(null).cast(tc.dtype.sparkType).as(tc.name)
      } match { case cols => parsed.select(cols: _*) }
    }.reduce(_.unionByName(_))
  }

  /** Per-column composed parse (substring → trim → cast), the semantic
    * reference for the fused slicer; cross-checked in FlfSpec.
    */
  def parseComposed(lines: DataFrame, schema: FixedSchema): DataFrame =
    lines.select(schema.columns.map(c => parseColumn(col("value"), c)): _*)

  /** The per-column parse expression, composable into any plan. */
  def parseColumn(line: Column, c: FixedColumn): Column = {
    val raw = substring(line, c.offset + 1, c.length)
    fromTrimmed(trimPad(raw, c), c)
  }

  /** Strict cast + null policy from an already-trimmed cell (reference:
    * builder/datatype.rs:66-86 + column.rs:123-131): parse failure on a
    * nullable column → NULL; on a non-nullable column the first bad row
    * aborts the whole job (N2 strict abort).
    */
  def fromTrimmed(trimmed: Column, c: FixedColumn): Column = {
    val parsed = castStrict(trimmed, c.dtype)
    val checked =
      if (c.isNullable) parsed
      else
        when(parsed.isNull,
          raise_error(concat(
            lit(s"strict-mode abort: non-nullable column '${c.name}' failed to parse value '"),
            trimmed, lit("'"))))
          .otherwise(parsed)
    checked.as(c.name)
  }

  /** QUARANTINE-mode parse — the third null policy (the reference has
    * two: append-or-null for nullable columns, whole-job strict abort
    * for non-nullable, builder/column.rs:123-131). Strict abort is the
    * wrong tool at 100 TB — one bad row a billion rows in kills the job
    * and loses the partition's work. Here every column parses leniently
    * (null on failure) and `_quarantined` flags rows where any
    * NON-NULLABLE column failed; callers split on the flag and route bad
    * rows — raw line retained for repair — to a side sink while the good
    * rows commit. A pure narrow projection like the strict path.
    */
  def parseQuarantine(lines: DataFrame, schema: FixedSchema,
                      lineCol: String = "value"): DataFrame = {
    val reserved = schema.columns.map(_.name)
      .filter(n => n == lineCol || n == "_quarantined")
    require(reserved.isEmpty,
      s"parseQuarantine reserves column name(s) '$lineCol' (raw line) and " +
        s"'_quarantined' (flag); rename schema column(s) ${reserved.mkString(", ")} " +
        "or pass a different lineCol")
    val parsedCols = schema.columns.map { c =>
      castStrict(trimPad(substring(col(lineCol), c.offset + 1, c.length), c),
        c.dtype).as(c.name)
    }
    val bad = schema.columns.filterNot(_.isNullable)
      .map(c => col(c.name).isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    lines.select(col(lineCol) +: parsedCols: _*)
      .withColumn("_quarantined", bad)
  }

  /** Strip the pad symbol according to alignment (reference:
    * crates/evolution-parser/src/trimmer.rs:88-94): Left-aligned values are
    * padded on the right → rtrim; Right-aligned → ltrim; Center → both.
    */
  def trimPad(raw: Column, c: FixedColumn): Column = {
    val pad = c.padSymbol.toString
    c.alignment match {
      case Alignment.Left   => rtrim(raw, pad)
      case Alignment.Right  => ltrim(raw, pad)
      case Alignment.Center => trim(raw, pad)
    }
  }

  /** Typed cast with the reference's parse grammar:
    *  - Boolean accepts exactly "true"/"false" (Rust `str::parse::<bool>`,
    *    reference: parser/datatype.rs:37-70) — stricter than Spark's cast,
    *    so expressed as an explicit `when` chain.
    *  - Numerics: `try_cast` returns NULL on garbage/overflow, the same
    *    observable semantics as the reference's `None`
    *    (parser/datatype.rs:115-142; SURVEY.md §2.3 C2/C3) — and is
    *    independent of the session's `spark.sql.ansi.enabled` setting
    *    (ANSI is on by default in Spark 4, where a plain cast would throw).
    *  - Utf8 never fails (parser/datatype.rs:145-178).
    */
  def castStrict(trimmed: Column, t: FlfType): Column = t match {
    case FlfType.BooleanT =>
      when(trimmed === "true", lit(true))
        .when(trimmed === "false", lit(false))
        .otherwise(lit(null).cast("boolean"))
    case other => trimmed.try_cast(other.sparkType)
  }
}
