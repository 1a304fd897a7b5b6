package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality pre-flight a pipeline runs before
  * trusting a new 100 TB drop: per-column non-null count, exact distinct
  * count, and min/max (stringified for a uniform schema).
  *
  * Two passes, each cheap, instead of Spark's one-scan multi-distinct
  * plan: n distinct aggregates + string min/max buffers force
  * Expand(n+1) + Sort + SortAggregate — at 100 TB that SORTS five
  * corpora; measured 4x slower than this split even at sf0.1. Pass A is
  * a plain global aggregate (count/min/max in the column's OWN type —
  * numeric ordering preserved — then stringified). Pass B stacks the
  * profiled columns into narrow (pos, value) rows and counts distinct
  * values per column in one group-aggregate. Distinct counts are over
  * the STRING rendering of each value, chosen injective per type: binary
  * columns render as base64 (a plain string cast would collapse distinct
  * byte strings under UTF-8 replacement chars), -0.0 floats/doubles are
  * normalized to 0.0 before the cast so the count matches native
  * countDistinct (which treats them equal), and arrays/structs render as
  * JSON (the default cast erases element boundaries: Seq("a, b") and
  * Seq("a", "b") both print "[a, b]"), with -0.0 normalized inside
  * float/double arrays. Two documented limits: -0.0 nested deeper than
  * one array level (e.g. inside structs) still renders signed, and MAP
  * columns are rejected up front — Pass A's min/max needs an orderable
  * type, which maps are not. Never one job per column.
  * On empty input every column still gets its row (n_nonnull = 0,
  * n_distinct = 0, null min/max) — the empty-drop case is exactly what a
  * pre-flight exists to catch.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val mapCols = cols.filter(c => df.schema.fields.exists(f =>
      f.name == c && f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]))
    require(mapCols.isEmpty,
      s"profile cannot handle MAP columns (min/max needs an orderable type): ${mapCols.mkString(", ")}")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nn`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    val basic = wide.selectExpr("__total as n_rows",
      s"stack(${cols.size}, $stackArgs) as (col_name, n_nonnull, min_s, max_s)")
    val names = array(cols.map(lit): _*)
    val fieldType = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val rendered = cols.map { c =>
      fieldType.get(c) match {
        case Some(org.apache.spark.sql.types.BinaryType) => base64(col(c))
        case Some(org.apache.spark.sql.types.DoubleType) |
             Some(org.apache.spark.sql.types.FloatType) =>
          // -0.0 === 0.0 in Spark comparisons; collapse before stringify.
          when(col(c) === 0, lit(0).cast(fieldType(c))).otherwise(col(c))
            .cast("string")
        case Some(org.apache.spark.sql.types.ArrayType(et, _))
            if et == org.apache.spark.sql.types.DoubleType ||
              et == org.apache.spark.sql.types.FloatType =>
          // JSON keeps element boundaries, but -0.0 elements must be
          // normalized first (countDistinct normalizes them recursively)
          to_json(transform(col(c),
            x => when(x === 0, lit(0).cast(et)).otherwise(x)))
        case Some(_: org.apache.spark.sql.types.ArrayType) |
             Some(_: org.apache.spark.sql.types.StructType) =>
          // the default string cast is NOT injective for nested types —
          // Seq("a, b") and Seq("a", "b") both render "[a, b]"; JSON
          // escaping keeps element boundaries (and base64-encodes nested
          // binary). Floats/doubles nested deeper than one array level
          // keep the -0.0 caveat (scaladoc).
          to_json(col(c))
        case _ => col(c).cast("string")
      }
    }
    val distincts = df
      .select(posexplode(array(rendered: _*)).as(Seq("pos", "value")))
      .groupBy("pos").agg(countDistinct(col("value")).as("n_distinct"))
      .select(element_at(names, col("pos") + 1).as("col_name"),
        col("n_distinct"))
    // Left join: on empty input Pass B yields zero rows, but every Pass-A
    // row must survive with n_distinct = 0.
    basic.join(distincts, Seq("col_name"), "left")
      .withColumn("n_distinct", coalesce(col("n_distinct"), lit(0L)))
      .select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_s", "max_s")
  }

  /** Gini impurity (1 − Σ pᵢ²) per categorical column — the concentration
    * diagnostic: 0 = one value dominates entirely, → 1 = evenly spread
    * over many values. Counts are exact (value-count aggregation per
    * column, decimal squares so 100 TB-scale counts cannot overflow); the
    * impurity is one fixed double combination `(t² − Σc²) / t²`.
    */
  def giniImpurity(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "giniImpurity requires at least one column")
    val perCol = cols.map { c =>
      val counts = df.groupBy(col(c)).agg(count(lit(1)).as("c"))
      val sums = counts.agg(
        count(lit(1)).as("n_distinct"),
        sum(col("c")).cast("double").as("t"),
        sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
          .cast("double").as("sq"))
      sums.select(lit(c).as("col_name"), col("n_distinct"),
        round((col("t") * col("t") - col("sq")) / (col("t") * col("t")), 6)
          .as("gini"))
    }
    perCol.reduce(_ union _)
  }
}
