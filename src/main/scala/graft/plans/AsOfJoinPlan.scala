package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.GraftBridge

/** Whole-operator as-of join (SURVEY.md preference order (c): custom
  * `LogicalPlan` + `Strategy` + `SparkPlan` for semantics Spark lacks).
  *
  * For each left row, emit it joined with the LAST right row (in
  * (rightTime, tie) order) whose key matches and rightTime <= leftTime;
  * left rows with no match are dropped (inner as-of).
  *
  * Physical execution is a single sort-merge pass per co-partition:
  * both children are hash-clustered on the key and sorted by
  * (key, time[, tie]), then merged O(n+m) with a one-row lag buffer —
  * no per-left-row scan of the right side, unlike the compose-built-ins
  * fallback (ops.AsOfJoin: equi-join × argmax window), and no unbounded
  * state. This is the shape that survives a right side with millions of
  * rows per key at 100 TB.
  *
  * v1 scope: key evaluates to Long, time/tie evaluate to Long-backed
  * types (integer types, timestamps — Spark's internal representation
  * for both timestamp flavors is Long micros).
  */
final case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

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
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val project = UnsafeProjection.create(schema.map(_.dataType).toArray)
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
            s"as-of join v1 requires long-backed key/time, got ${other.getClass}")
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
              if (haveCand && candKey == k && candTime <= t) {
                pending = project(joiner(l, cand))
              }
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

object AsOfJoinPlan {
  /** Register the planner strategy on the session (idempotent) and build
    * the as-of join DataFrame.
    */
  def asofMerge(left: DataFrame, right: DataFrame,
                leftKey: String, rightKey: String,
                leftTime: String, rightTime: String,
                rightTie: String): DataFrame = {
    val spark: SparkSession = left.sparkSession
    val existing = spark.experimental.extraStrategies
    if (!existing.exists(_.isInstanceOf[AsOfJoinStrategy.type]))
      spark.experimental.extraStrategies = existing :+ AsOfJoinStrategy
    val lPlan = GraftBridge.logicalPlan(left)
    val rPlan = GraftBridge.logicalPlan(right)
    def resolve(plan: LogicalPlan, name: String): Expression =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column '$name' not found"))
    GraftBridge.ofRows(spark, AsOfJoinNode(lPlan, rPlan,
      resolve(lPlan, leftKey), resolve(rPlan, rightKey),
      resolve(lPlan, leftTime), resolve(rPlan, rightTime),
      resolve(rPlan, rightTie)))
  }
}
