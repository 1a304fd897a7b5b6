package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Ordered n-step funnel over an event stream: for each user, step 1 is
  * their earliest step-1 event; step i is their earliest step-i event
  * STRICTLY AFTER step i-1 (optionally within `withinMicros` of it).
  * Returns one row per user who completed step 1, with nullable epoch-
  * micros columns t1..tn — the conversion analysis every event pipeline
  * runs.
  *
  * Scale shape: one filtered aggregation plus one join per step, ALL
  * keyed on the user column, so every exchange reuses the same hash
  * partitioning; the accumulator narrows to one row per step-1 user
  * after the first aggregation and each step's filter prunes the event
  * scan to that step's type.
  */
object Funnel {

  def funnel(events: DataFrame, steps: Seq[String],
             typeCol: String = "event_type", userCol: String = "user_id",
             tsCol: String = "ts",
             withinMicros: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel requires at least one step")
    val tsm = events.schema(tsCol).dataType match {
      case TimestampType => unix_micros(col(tsCol))
      // session TZ applies symmetrically; wall-clock order preserved
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType))
      case _ => col(tsCol).cast("long")
    }
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      tsm.as("tsm"))
    var acc = ev.filter(col("et") === steps.head)
      .groupBy("u").agg(min("tsm").as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val step = ev.filter(col("et") === s).select(col("u"), col("tsm").as("ts_s"))
      val inWindow = withinMicros
        .map(wm => col("ts_s") <= col(prev) + wm)
        .getOrElse(lit(true))
      acc = acc.join(step, Seq("u"), "left")
        .withColumn("ts_ok", when(col("ts_s") > col(prev) && inWindow, col("ts_s")))
        .groupBy(col("u") +: (1 to i).map(j => col(s"t$j")): _*)
        .agg(min("ts_ok").as(cur))
    }
    acc.withColumnRenamed("u", userCol)
  }

  /** Step-by-step conversion counts from a `funnel` result: one row per
    * step with the number of users whose tN is non-null.
    */
  def conversions(funnelDf: DataFrame, steps: Seq[String]): DataFrame = {
    val counts = steps.indices.map(i => count(col(s"t${i + 1}")).as(s"n${i + 1}"))
    val wide = funnelDf.agg(counts.head, counts.tail: _*)
    val stackArgs = steps.zipWithIndex
      .map { case (s, i) => s"${i + 1}, '$s', n${i + 1}" }.mkString(", ")
    wide.selectExpr(
      s"stack(${steps.size}, $stackArgs) as (step, step_name, n_users)")
  }
}
