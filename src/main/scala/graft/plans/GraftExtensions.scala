package graft.plans

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session-extension entry point: registers the engine's planner
  * strategies AND its custom kernels as SQL functions, so a deployment
  * enables the whole surface for every session via config instead of the
  * call-time injection the Scala API uses:
  *
  * {{{
  * spark.sql.extensions=graft.plans.GraftExtensions
  * // or: SparkSession.builder().withExtensions(new GraftExtensions)
  * // then: SELECT jaro_winkler(a, b), simhash60(token_hashes60(text)) ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(args: Seq[Expression], n: Int, fn: String): Seq[Expression] = {
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument${if (n == 1) "" else "s"}, got ${args.length}")
    args
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)

    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]"),
      (args: Seq[Expression]) => { arity(args, 2, "jaro_winkler"); JaroWinkler(args(0), args(1)) }))

    ext.injectFunction((FunctionIdentifier("float_dot"),
      info("float_dot", "float_dot(a, b) - double dot product of two float arrays"),
      (args: Seq[Expression]) => { arity(args, 2, "float_dot"); FloatDotProduct(args(0), args(1)) }))

    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - common elements of two sorted long arrays"),
      (args: Seq[Expression]) => { arity(args, 2, "sorted_intersect_count"); SortedIntersectCount(args(0), args(1)) }))

    ext.injectFunction((FunctionIdentifier("token_hashes60"),
      info("token_hashes60", "token_hashes60(text) - 60-bit md5 hash per whitespace token"),
      (args: Seq[Expression]) => TokenHashes60(arity(args, 1, "token_hashes60").head)))

    ext.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(hashes) - 60-bit simhash of a token-hash array"),
      (args: Seq[Expression]) => SimHash60(arity(args, 1, "simhash60").head)))

    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(shingle_hashes, k) - k-element minhash"),
      (args: Seq[Expression]) => { arity(args, 2, "minhash_signature"); MinHashSignature(args(0),
        litInt(args(1), "minhash_signature", "k")) }))

    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct n-word shingles"),
      (args: Seq[Expression]) => { arity(args, 2, "word_shingles"); WordShingles(args(0),
        litInt(args(1), "word_shingles", "n")) }))

    ext.injectFunction((FunctionIdentifier("normalize_text"),
      info("normalize_text",
        "normalize_text(s) - NFC + root-locale lowercase + whitespace collapse"),
      (args: Seq[Expression]) => NormalizeText(arity(args, 1, "normalize_text").head)))

    ext.injectFunction((FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(text, n) - all n-word grams in order"),
      (args: Seq[Expression]) => { arity(args, 2, "word_ngrams"); WordNGrams(args(0),
        litInt(args(1), "word_ngrams", "n")) }))
  }
}
