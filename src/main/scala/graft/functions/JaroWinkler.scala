package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Jaro-Winkler similarity as a codegen'd Catalyst expression — the fuzzy
  * string metric Spark lacks (it ships only levenshtein). Standard
  * definition: Jaro similarity (match window ⌊max(|a|,|b|)/2⌋−1,
  * half-transposition count) plus the Winkler common-prefix boost
  * (p = 0.1, prefix ≤ 4, applied when jaro > 0.7). The combination order
  * of the three double terms is fixed left-to-right, matching DuckDB's
  * `jaro_winkler_similarity` bit-for-bit on the oracle corpus — verified
  * in q_jaro_winkler, property-tested against levenshtein-based sanity
  * bounds in ArrayKernelsSpec.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.compute(l.toString, r.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler$$.MODULE$$.compute($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroWinkler {

  /** Also invoked from generated code. */
  def compute(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, l2)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val t = transpositions / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro > 0.7) {
      var prefix = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (prefix < maxP && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
      jaro + prefix * 0.1 * (1.0 - jaro)
    } else jaro
  }

  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(
      JaroWinkler(GraftBridge.expression(a), GraftBridge.expression(b)))
}
