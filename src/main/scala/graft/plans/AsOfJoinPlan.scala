package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Cast, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.GraftBridge

/** Whole-operator as-of join (SURVEY.md preference order (c): custom
  * `LogicalPlan` + `Strategy` + `SparkPlan` for semantics Spark lacks).
  *
  * For each left row, emit it joined with the LAST right row (in
  * (rightTime, tie) order) whose key matches and rightTime <= leftTime
  * (optionally also leftTime - rightTime <= tolerance). Unmatched left
  * rows are dropped (inner) or emitted with a null right side
  * (left_outer).
  *
  * Physical execution is a single sort-merge pass per co-partition:
  * both children are hash-clustered on the key and sorted by
  * (key, time[, tie]), then merged O(n+m) with a one-row lag buffer —
  * no per-left-row scan of the right side, unlike the compose-built-ins
  * fallback (ops.AsOfJoin: equi-join × argmax window), and no unbounded
  * state. This is the shape that survives a right side with millions of
  * rows per key at 100 TB.
  *
  * Scope: key/time/tie evaluate to long-backed internals (integral
  * types, date = int days, both timestamp flavors = long micros).
  * Key and time types are validated at PLAN TIME: comparing raw
  * internals across representations (e.g. DateType days vs TimestampType
  * micros) would silently match almost everything, so mixed time types
  * are either widened to a common type (Date vs TimestampNTZ) or
  * rejected with an explicit error (ADVICE r1).
  */
final case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression,
    isOuter: Boolean, tolerance: Option[Long],
    broadcastRight: Option[Boolean]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (isOuter) right.output.map(_.withNullability(true)) else right.output)
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tie, outer, tol, bcast) =>
      // Broadcast selection mirrors Spark's equi-join planning: the
      // caller's explicit choice (Some) always wins — Some(false) pins
      // the distributed sort-merge exec even when a stats underestimate
      // would auto-broadcast; with None the right side broadcasts when
      // its estimated size fits under spark.sql.autoBroadcastJoinThreshold
      // (set -1 to disable, exactly as with regular joins).
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val auto = threshold > 0 && r.stats.sizeInBytes <= threshold
      (if (bcast.getOrElse(auto))
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, outer, tol)
       else AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, outer, tol)) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression,
    isOuter: Boolean, tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (isOuter) right.output.map(_.withNullability(true)) else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTie, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val schema = output
    val outer = isOuter
    val tol = tolerance
    val nRightCols = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val project = UnsafeProjection.create(schema.map(_.dataType).toArray)
      val nullRight: InternalRow = new GenericInternalRow(nRightCols)
      new Iterator[InternalRow] {
        private var rHead: InternalRow = _          // lookahead right row
        private var rHeadKey = 0L
        private var rHeadTime = 0L
        private var rHaveHead = false
        // last right row with (candKey, time <= current left time)
        private var cand: InternalRow = _
        private var candKey = 0L
        private var candTime = 0L
        private var haveCand = false
        private var pending: InternalRow = _        // next joined output

        private def advanceRight(): Unit = {
          rHaveHead = false
          while (!rHaveHead && rIter.hasNext) {
            val r = rIter.next()
            val k = rk.eval(r)
            val t = rt.eval(r)
            if (k != null && t != null) {
              rHead = r.copy()
              rHeadKey = asLong(k); rHeadTime = asLong(t)
              rHaveHead = true
            }
          }
        }

        private def asLong(v: Any): Long = v match {
          case l: java.lang.Long    => l
          case i: java.lang.Integer => i.toLong
          case s: java.lang.Short   => s.toLong
          case other => throw new IllegalArgumentException(
            s"as-of join requires long-backed key/time, got ${other.getClass}")
        }

        advanceRight()

        private def computeNext(): Unit = {
          // (invoked lazily from hasNext/next)
          pending = null
          while (pending == null && lIter.hasNext) {
            val l = lIter.next()
            val kRaw = lk.eval(l)
            val tRaw = lt.eval(l)
            if (kRaw != null && tRaw != null) {
              val k = asLong(kRaw); val t = asLong(tRaw)
              // pull right rows up to (k, t): the last one seen is the match
              while (rHaveHead &&
                (rHeadKey < k || (rHeadKey == k && rHeadTime <= t))) {
                if (rHeadKey == k) {
                  cand = rHead; candKey = rHeadKey; candTime = rHeadTime
                  haveCand = true
                }
                advanceRight()
              }
              val matched = haveCand && candKey == k && candTime <= t &&
                tol.forall(d => t - candTime <= d)
              if (matched) pending = project(joiner(l, cand))
              else if (outer) pending = project(joiner(l, nullRight))
            } else if (outer) {
              pending = project(joiner(l, nullRight))
            }
          }
        }

        // Lazy advance: the UnsafeProjection buffer backing `pending` is
        // reused, so the next row may only be computed after the caller
        // has consumed the current one (hasNext → next → use → hasNext).
        private var computed = false
        override def hasNext: Boolean = {
          if (!computed) { computeNext(); computed = true }
          pending != null
        }
        override def next(): InternalRow = {
          if (!computed) { computeNext(); computed = true }
          computed = false
          pending
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

/** Broadcast-right as-of join: the right side is collected once, grouped
  * per key into (time, tie)-sorted arrays, and broadcast; each left
  * partition streams IN PLACE doing one binary search per row. Neither
  * side is exchanged or sorted — the plan a dimension-history lookup
  * against a huge fact table wants at 100 TB (same rationale as Spark's
  * own BroadcastHashJoin, with as-of instead of equality semantics).
  * Chosen via `asofMerge(..., broadcastRight = Some(true))`, or
  * auto-selected under the broadcast threshold when the caller passes
  * None; the caller asserts the right side fits in executor memory,
  * exactly like `broadcast(df)` on a regular join (`Some(false)` pins
  * the distributed exec).
  */
final case class BroadcastAsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression,
    isOuter: Boolean, tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (isOuter) right.output.map(_.withNullability(true)) else right.output)

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long    => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short   => s.toLong
    case other => throw new IllegalArgumentException(
      s"as-of join requires long-backed key/time, got ${other.getClass}")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val rtie = BindReferences.bindReference(rightTie, right.output)
    // collect + group + sort the right side once on the driver
    val grouped = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[(Long, Long, InternalRow)]]()
    right.executeCollect().foreach { r =>
      val k = rk.eval(r); val t = rt.eval(r)
      if (k != null && t != null) {
        val tie = rtie.eval(r)
        val buf = grouped.computeIfAbsent(asLong(k),
          _ => scala.collection.mutable.ArrayBuffer.empty)
        buf += ((asLong(t), if (tie == null) Long.MinValue else asLong(tie), r))
      }
    }
    val built = new java.util.HashMap[Long, (Array[Long], Array[InternalRow])](grouped.size * 2)
    grouped.forEach { (k, buf) =>
      val sorted = buf.sortBy(e => (e._1, e._2))
      built.put(k, (sorted.map(_._1).toArray, sorted.map(_._3).toArray))
    }
    val bc = session.sparkContext.broadcast(built)
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val schema = output
    val outer = isOuter
    val tol = tolerance
    val nRightCols = right.output.size
    left.execute().mapPartitions { iter =>
      val joiner = new JoinedRow
      val project = UnsafeProjection.create(schema.map(_.dataType).toArray)
      val nullRight: InternalRow = new GenericInternalRow(nRightCols)
      val lookup = bc.value
      iter.flatMap { l =>
        val kRaw = lkB.eval(l)
        val tRaw = ltB.eval(l)
        if (kRaw == null || tRaw == null) {
          if (outer) Iterator.single(project(joiner(l, nullRight))) else Iterator.empty
        } else {
          val t = asLong(tRaw)
          val entry = lookup.get(asLong(kRaw))
          var matched: InternalRow = null
          if (entry != null) {
            val times = entry._1
            // rightmost index with times(idx) <= t
            var lo = 0; var hi = times.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) <= t) lo = mid + 1 else hi = mid
            }
            val idx = lo - 1
            if (idx >= 0 && tol.forall(d => t - times(idx) <= d)) matched = entry._2(idx)
          }
          if (matched != null) Iterator.single(project(joiner(l, matched)))
          else if (outer) Iterator.single(project(joiner(l, nullRight)))
          else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

object AsOfJoinPlan {

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def isLongBacked(dt: DataType): Boolean = dt match {
    case ShortType | IntegerType | LongType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  /** Plan-time validation + widening of the (leftTime, rightTime) pair.
    * Internals are only comparable within the same representation:
    * DateType is int DAYS, both timestamp flavors are long MICROS —
    * comparing days against micros silently matches nearly every row
    * (ADVICE r1). Date vs TimestampNTZ widens (timezone-free cast);
    * any pairing involving the session-timezone-dependent TimestampType
    * must be cast explicitly by the caller.
    */
  private def isTimeLike(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def alignTimes(lt: Expression, rt: Expression): (Expression, Expression) =
    (lt.dataType, rt.dataType) match {
      case (a, b) if a == b && isLongBacked(a) => (lt, rt)
      case (a, b) if isIntegral(a) && isIntegral(b) => (lt, rt)
      case (a, b) if isTimeLike(a) && isTimeLike(b) =>
        // widen to a common wall-clock representation (TimestampNTZ
        // micros): Date→NTZ is midnight expansion; LTZ→NTZ renders the
        // instant in the session timezone — exactly how the SQL oracle
        // compares a naive timestamp against a zoned one. The analyzer's
        // ResolveTimeZone fills the cast's timeZoneId.
        (if (a == TimestampNTZType) lt else Cast(lt, TimestampNTZType),
          if (b == TimestampNTZType) rt else Cast(rt, TimestampNTZType))
      case (a, b) => throw new IllegalArgumentException(
        s"as-of join time columns have incomparable types $a vs $b: " +
          "internal representations differ (DateType = days, timestamps = " +
          "micros); cast both sides to one comparable type explicitly")
    }

  /** Register the planner strategy on the session (idempotent) and build
    * the as-of join DataFrame.
    *
    * @param joinType  "inner" (drop unmatched left rows) or "left_outer"
    *                  (emit them with a null right side)
    * @param tolerance max allowed leftTime - rightTime, in the time
    *                  column's native unit (micros for timestamps, days
    *                  for dates, raw difference for integral types)
    * @param broadcastRight Some(true) FORCES collect + broadcast of the
    *                  right side (stream the left in place, no exchange
    *                  on either side) regardless of size, as with
    *                  `broadcast(df)` on a regular join; Some(false) PINS
    *                  the distributed sort-merge exec so a logical-stats
    *                  underestimate can never trigger a driver-side
    *                  collect of a large right side; None (default)
    *                  auto-selects the broadcast exec when the right
    *                  side's estimated size fits under
    *                  spark.sql.autoBroadcastJoinThreshold; -1 disables.
    */
  def asofMerge(left: DataFrame, right: DataFrame,
                leftKey: String, rightKey: String,
                leftTime: String, rightTime: String,
                rightTie: String,
                joinType: String = "inner",
                tolerance: Option[Long] = None,
                broadcastRight: Option[Boolean] = None): DataFrame = {
    val isOuter = joinType match {
      case "inner" => false
      case "left_outer" => true
      case other => throw new IllegalArgumentException(
        s"as-of join supports inner | left_outer, got '$other'")
    }
    val spark: SparkSession = left.sparkSession
    val existing = spark.experimental.extraStrategies
    if (!existing.exists(_.isInstanceOf[AsOfJoinStrategy.type]))
      spark.experimental.extraStrategies = existing :+ AsOfJoinStrategy
    val lPlan = GraftBridge.logicalPlan(left)
    val rPlan = GraftBridge.logicalPlan(right)
    def resolve(plan: LogicalPlan, name: String): Expression =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column '$name' not found"))
    val (lk, rk) = (resolve(lPlan, leftKey), resolve(rPlan, rightKey))
    if (!(lk.dataType == rk.dataType && isLongBacked(lk.dataType)) &&
        !(isIntegral(lk.dataType) && isIntegral(rk.dataType)))
      throw new IllegalArgumentException(
        s"as-of join key columns have incomparable types " +
          s"${lk.dataType} vs ${rk.dataType}")
    val (lt, rt) = alignTimes(resolve(lPlan, leftTime), resolve(rPlan, rightTime))
    GraftBridge.ofRows(spark, AsOfJoinNode(lPlan, rPlan,
      lk, rk, lt, rt, resolve(rPlan, rightTie), isOuter, tolerance, broadcastRight))
  }

  /** Forward-direction as-of: for each left row, the EARLIEST right row
    * with `rightTime >= leftTime` (pandas merge_asof direction='forward';
    * the "next event after" lookup). Implemented by running the verified
    * backward merge over negated time axes — backward-on(-t) is exactly
    * forward-on(t) — so the sort-merge exec, outer handling, and the
    * one-row-lag memory bound all carry over unchanged. Tolerance bounds
    * the LOOKAHEAD window `[leftTime, leftTime + tolerance]`, in micros
    * for timestamps and days for dates. Among equal right times the
    * highest `rightTie` wins (same convention as backward).
    */
  def asofMergeForward(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       rightTie: String,
                       joinType: String = "inner",
                       tolerance: Option[Long] = None,
                       broadcastRight: Option[Boolean] = None): DataFrame = {
    val lNeg = "__asof_fwd_lt"
    val rNeg = "__asof_fwd_rt"
    asofMerge(
      left.withColumn(lNeg, -timeToLong(left, leftTime)),
      right.withColumn(rNeg, -timeToLong(right, rightTime)),
      leftKey, rightKey, lNeg, rNeg, rightTie,
      joinType, tolerance, broadcastRight)
      .drop(lNeg, rNeg)
  }

  /** A time-like/integral column as comparable longs: micros for
    * timestamps (session TZ applies symmetrically, preserving wall-clock
    * order), days for dates, the raw value for integrals.
    */
  private def timeToLong(df: DataFrame,
                         c: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, unix_date, unix_micros}
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case DateType => unix_date(col(c)).cast(LongType)
      case ShortType | IntegerType | LongType => col(c).cast(LongType)
      case other => throw new IllegalArgumentException(
        s"as-of join requires a time-like or integral column, '$c' is $other")
    }
  }

  /** Nearest-direction as-of: for each left row, the right row whose time
    * is CLOSEST to the left time in either direction (merge_asof
    * direction='nearest'), ties broken toward the past. Composed from
    * one backward and one forward merge — two passes over the sorted
    * co-partitions, still no per-key state beyond one row each — then a
    * per-left-row argmin over the (at most two) candidates. `leftId`
    * must uniquely identify left rows (the argmin window key).
    * Tolerance bounds BOTH directions' windows.
    */
  def asofMergeNearest(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       rightTie: String, leftId: String,
                       joinType: String = "inner",
                       tolerance: Option[Long] = None,
                       broadcastRight: Option[Boolean] = None): DataFrame = {
    import org.apache.spark.sql.functions.{abs, col, row_number, when}
    require(joinType == "inner" || joinType == "left_outer",
      s"as-of nearest supports inner | left_outer, got '$joinType'")
    val b = asofMerge(left, right, leftKey, rightKey, leftTime, rightTime,
      rightTie, "left_outer", tolerance, broadcastRight)
    val f = asofMergeForward(left, right, leftKey, rightKey, leftTime, rightTime,
      rightTie, "left_outer", tolerance, broadcastRight)
    def withDist(df: DataFrame, dir: Int): DataFrame =
      df.withColumn("__asof_dt",
          abs(timeToLong(df, rightTime) - timeToLong(df, leftTime)))
        .withColumn("__asof_dir", org.apache.spark.sql.functions.lit(dir))
    // positional union: both merges emit left ++ right in the same order
    // (and the key may legitimately appear once per side)
    val unioned = withDist(b, 0).union(withDist(f, 1))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(leftId))
      .orderBy(when(col("__asof_dt").isNull, 1).otherwise(0).asc,
        col("__asof_dt").asc, col("__asof_dir").asc)
    val picked = unioned.withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_dt", "__asof_dir", "__asof_rn")
    if (joinType == "left_outer") picked
    else picked.filter(col(rightTie).isNotNull)
  }
}
