package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused hashing kernels for the dedup operators. Each replaces an
  * interpreted higher-order-function pyramid with one compiled pass while
  * reproducing the composed/oracle arithmetic bit-for-bit:
  *
  *  - TokenHashes60(text)  == transform(split(trim(text),"\\s+"),
  *                              t -> conv(substring(md5(t),1,15),16,10)::long)
  *  - SimHash60(hashes)    == the 60 per-bit ±1 vote aggregates of
  *                              Dedup.simhashFromHashes
  *  - MinHashSignature(s,k)== array_min over h1+i·h2 per shingle
  *                              (Kirsch-Mitzenmacher; 60/56-bit md5 slices)
  *
  * All md5 slices are nibble arithmetic on the raw digest — no hex-string
  * materialization, no base-16 string parse, one MessageDigest call per
  * token/shingle. The composed forms are kept in graft.ops.Dedup as the
  * semantic reference; OpsSpec property-checks kernel == composed.
  */
object HashKernels {

  private val md5Local: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  /** Big-endian value of `len` nibbles of `d` starting at nibble `from` —
    * identical to parsing the corresponding md5 hex substring base 16.
    */
  private def nibbleSlice(d: Array[Byte], from: Int, len: Int): Long = {
    var v = 0L
    var i = from
    val end = from + len
    while (i < end) {
      val nib =
        if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xF
        else d(i >> 1) & 0xF
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** 60-bit token hashes: split on \s+ after ASCII-space trim (Spark
    * split limit -1 semantics, including the [""] result for empty
    * input), then the first 15 md5 nibbles per token.
    */
  def tokenHashes60(input: UTF8String): ArrayData = {
    var s = input.toString
    var lo = 0; var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s = s.substring(lo, hi)
    val words = s.split("\\s+", -1)
    val digest = md5Local.get()
    val out = new Array[Any](words.length)
    var i = 0
    while (i < words.length) {
      digest.reset()
      out(i) = nibbleSlice(digest.digest(words(i).getBytes(StandardCharsets.UTF_8)), 0, 15)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 60-bit SimHash from token hashes: per-bit ±1 votes, sign per bit. */
  def simhash60(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 60) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** k minhashes in one pass: per shingle one md5, h1/h2 = 60/56-bit
    * slices, running minimum of h1 + i·h2 per signature entry (the
    * incremental `+ h2` equals i·h2 exactly — max value 2^60 + k·2^56
    * stays far below Long.MaxValue for any practical k).
    *
    * An empty shingle array yields Long.MaxValue entries where the
    * composed form yields nulls; both are per-band CONSTANTS, so the LSH
    * candidate classes (and every downstream result) are identical —
    * empty docs collide with each other either way and are dropped by
    * the exact-Jaccard verification.
    */
  /** Hashes of a string and ALL its variants with up to `maxDel` (1 or 2)
    * character deletions, O(1) per variant via polynomial prefix hashes —
    * the Mor-Fraenkel / SymSpell candidate key for edit-distance joins:
    * lev(a, b) <= k implies a and b share a <=k-deletion variant (an edit
    * script of k ops deletes at most k chars from each side to reach a
    * common string), so an equi-join on these hashes has zero false
    * negatives. Hash collisions only ever ADD candidates; the caller
    * verifies survivors with levenshtein. Output size is
    * 1 + l + l(l-1)/2 per row — intended for short join keys (names,
    * titles, codes); long-text similarity belongs to the n-gram/minhash
    * family instead.
    *
    * Variant hash = 64-bit wraparound polynomial over CODE POINTS with
    * the variant's length mixed into a murmur finalizer (so
    * same-polynomial different-length strings cannot collide
    * structurally). Deletions are code-point-level — the same unit
    * Spark's levenshtein counts — so the no-false-negative guarantee
    * holds for supplementary-plane characters too (a UTF-16 char-level
    * deletion would need 2 units to remove one astral character and the
    * candidate would be silently lost).
    */
  def deletionVariantHashes(input: UTF8String, maxDel: Int): ArrayData = {
    val cps = input.toString.codePoints().toArray
    val l = cps.length
    val B = 0x100000001b3L // FNV-1a prime; any odd 64-bit constant works
    // P(t) = polynomial hash of cps[0,t); pow(t) = B^t (mod 2^64)
    val p = new Array[Long](l + 1)
    val pow = new Array[Long](l + 1)
    p(0) = 0xcbf29ce484222325L
    pow(0) = 1L
    var t = 0
    while (t < l) {
      p(t + 1) = p(t) * B + cps(t)
      pow(t + 1) = pow(t) * B
      t += 1
    }
    @inline def fmix(v0: Long, len: Int): Long = {
      var v = v0 ^ (len.toLong * 0x9e3779b97f4a7c15L)
      v ^= v >>> 33; v *= 0xff51afd7ed558ccdL
      v ^= v >>> 33; v *= 0xc4ceb9fe1a85ec53L
      v ^ (v >>> 33)
    }
    val n1 = if (maxDel >= 1) l else 0
    val n2 = if (maxDel >= 2) l * (l - 1) / 2 else 0
    val out = new Array[Any](1 + n1 + n2)
    out(0) = fmix(p(l), l)
    var w = 1
    if (maxDel >= 1) {
      // delete position i (1-based): prefix s[0,i-1) ++ suffix s[i,l)
      var i = 1
      while (i <= l) {
        out(w) = fmix(p(i - 1) * pow(l - i) + (p(l) - p(i) * pow(l - i)), l - 1)
        w += 1; i += 1
      }
    }
    if (maxDel >= 2) {
      // delete i < j: s[0,i-1) ++ s[i,j-1) ++ s[j,l)
      var i = 1
      while (i < l) {
        var j = i + 1
        while (j <= l) {
          val h1 = p(i - 1) * pow(j - 1 - i) + (p(j - 1) - p(i) * pow(j - 1 - i))
          out(w) = fmix(h1 * pow(l - j) + (p(l) - p(j) * pow(l - j)), l - 2)
          w += 1; j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val digest = md5Local.get()
    var i = 0
    while (i < n) {
      digest.reset()
      val d = digest.digest(shingles.getUTF8String(i).getBytes)
      val h1 = nibbleSlice(d, 0, 15)
      val h2 = nibbleSlice(d, 15, 14)
      var hj = h1
      var j = 0
      while (j < k) {
        if (hj < mins(j)) mins(j) = hj
        hj += h2
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) { out(j) = mins(j); j += 1 }
    new GenericArrayData(out)
  }
}

case class TokenHashes60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_hashes60 expects STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.tokenHashes60(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels$$.MODULE$$.tokenHashes60($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SimHash60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects ARRAY<BIGINT> input (token_hashes60 output), got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash60(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels$$.MODULE$$.simhash60($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class DeletionVariantHashes(child: Expression, maxDel: Int)
    extends UnaryExpression {
  require(maxDel == 1 || maxDel == 2,
    s"deletion_variant_hashes supports maxDel 1 or 2, got $maxDel")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deletion_variant_hashes expects STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.deletionVariantHashes(input.asInstanceOf[UTF8String], maxDel)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels$$.MODULE$$.deletionVariantHashes($c, $maxDel);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects ARRAY<STRING> shingles, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels$$.MODULE$$.minhashSig($c, $k);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashColumns {
  def tokenHashes60(text: Column): Column =
    GraftBridge.column(TokenHashes60(GraftBridge.expression(text)))
  def simhash60(hashes: Column): Column =
    GraftBridge.column(SimHash60(GraftBridge.expression(hashes)))
  def minhashSignature(shingles: Column, k: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(shingles), k))
  def deletionVariantHashes(text: Column, maxDel: Int): Column =
    GraftBridge.column(DeletionVariantHashes(GraftBridge.expression(text), maxDel))
}
