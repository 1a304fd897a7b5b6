package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Range-bucket id of an order tuple against a sorted boundary list —
  * `lower_bound` by BINARY SEARCH over boundaries held as one plan
  * reference object (the [[SliceFixedLine]] kernel pattern).
  *
  * This replaces the literal `Σ_b 1[tuple > boundary_b]` when-chain that
  * [[graft.ops.Ranks]] first shipped: that form is O(buckets) chained
  * comparisons PER ROW, and since the bucket count scales with cluster
  * parallelism (4× shuffle partitions), per-row cost grew with the
  * cluster — ~8 000 comparisons per row at 2 000 partitions, enough to
  * trip codegen method-size splitting. Here the boundaries live in ONE
  * referenced Spec object, the per-row cost is O(log buckets) with no
  * generated-code growth at all, and whole-stage codegen sees a single
  * static call.
  *
  * Comparison semantics match Spark's ascending NULLS FIRST sort order
  * exactly (lexicographic across the tuple, per-column by Catalyst's own
  * interpreted ordering over internal values) — the same order
  * `Ranks.boundaries` sorts its sample with, so a row's bucket id equals
  * the number of boundaries strictly below it. Bucket ids are therefore
  * monotone in the tuple, which is the only property the prefix-sum
  * results depend on; boundary placement only moves work.
  */
case class RangeBucketId(children: Seq[Expression], spec: RangeBucketId.Spec)
    extends Expression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Any](children.length)
    var i = 0
    while (i < vals.length) { vals(i) = children(i).eval(input); i += 1 }
    spec.bucketOf(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val specRef = ctx.addReferenceObj("rangeBucketSpec", spec,
      classOf[RangeBucketId.Spec].getName)
    val arr = ctx.freshName("tuple")
    val evals = children.map(_.genCode(ctx))
    val fill = evals.zipWithIndex.map { case (e, i) =>
      code"""
        |${e.code}
        |$arr[$i] = ${e.isNull} ? null : (Object) ${e.value};"""
    }.reduce(_ + _)
    ev.copy(
      code = code"""
        |Object[] $arr = new Object[${children.length}];$fill
        |int ${ev.value} = $specRef.bucketOf($arr);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object RangeBucketId {

  /** Sorted boundary tuples (Catalyst internal values) + their column
    * types. Orderings rebuild lazily on each executor after serialization.
    */
  final class Spec(val types: Array[DataType], val bnds: Array[Array[Any]])
      extends Serializable {

    @transient private lazy val ords: Array[Ordering[Any]] =
      types.map(t => TypeUtils.getInterpretedOrdering(t))

    // Spark's sort/window comparison NORMALIZES floating zeros
    // (-0.0 == 0.0, via NormalizeFloatingNumbers on ordering keys), but
    // the raw interpreted orderings use Double.compare (-0.0 < 0.0).
    // Normalize before comparing so bucket ids stay monotone in the
    // window's order when a float/double order column carries both
    // zeros — which the "negate at the call site" descending idiom
    // produces naturally from a 0.0 value.
    @transient private lazy val norm: Array[Any => Any] = types.map {
      case org.apache.spark.sql.types.DoubleType =>
        (v: Any) => { val d = v.asInstanceOf[Double]; if (d == 0.0d) (0.0d: Any) else v }
      case org.apache.spark.sql.types.FloatType =>
        (v: Any) => { val f = v.asInstanceOf[Float]; if (f == 0.0f) (0.0f: Any) else v }
      case _ => identity[Any] _
    }

    /** Count of boundaries strictly below `row` = index of the first
      * boundary ≥ `row` in the sorted list (classic lower bound).
      */
    def bucketOf(row: Array[Any]): Int = {
      var lo = 0
      var hi = bnds.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cmp(row, bnds(mid)) > 0) lo = mid + 1 else hi = mid
      }
      lo
    }

    /** Lexicographic tuple compare, null smallest (Spark asc NULLS FIRST).
      * Public so [[graft.ops.Ranks]] can driver-sort its boundary sample
      * with EXACTLY the ordering the kernel searches with.
      */
    def compare(a: Array[Any], b: Array[Any]): Int = cmp(a, b)

    private def cmp(a: Array[Any], b: Array[Any]): Int = {
      var j = 0
      while (j < a.length) {
        val x = a(j)
        val y = b(j)
        if (x == null || y == null) {
          if (x != null) return 1
          if (y != null) return -1
        } else {
          val c = ords(j).compare(norm(j)(x), norm(j)(y))
          if (c != 0) return c
        }
        j += 1
      }
      0
    }
  }

  /** Build the bucket-id column from boundary tuples already in Catalyst
    * INTERNAL form, sorted ascending under [[Spec.compare]].
    */
  def fromInternal(cols: Seq[Column], types: Array[DataType],
                   bnds: Array[Array[Any]]): Column =
    GraftBridge.column(RangeBucketId(cols.map(GraftBridge.expression),
      new Spec(types, bnds)))

  /** External (Row collect) values → internal, one converter per column. */
  def toInternal(types: Array[DataType],
                 rows: Array[org.apache.spark.sql.Row]): Array[Array[Any]] = {
    val conv = types.map(t => CatalystTypeConverters.createToCatalystConverter(t))
    rows.map { r =>
      Array.tabulate[Any](types.length)(j =>
        if (r.get(j) == null) null else conv(j)(r.get(j)))
    }
  }
}

/** O(1) broadcast-offset lookup `offsets[bucketId]` — the windowless
  * cross-bucket offset application of [[graft.ops.Ranks]], previously an
  * `element_at` over an `array(lit, lit, …)` whose generated code grew
  * linearly with the bucket count. The long[] ships as one plan
  * reference object; generated code is a single array read.
  */
case class BucketOffset(child: Expression, offsets: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = offsets(input.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketOffsets", offsets, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref[$c];")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BucketOffset {
  def apply(bucket: Column, offsets: Array[Long]): Column =
    GraftBridge.column(BucketOffset(GraftBridge.expression(bucket), offsets))
}
