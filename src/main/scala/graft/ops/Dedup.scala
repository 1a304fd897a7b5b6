package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for training-data pipelines, each designed
  * around Spark's shuffle model so the same plan holds at 100 TB:
  *
  *  - exact:      hash-groupBy on a content digest — one shuffle on md5,
  *                perfectly balanced unless the corpus is one document.
  *  - MinHash-LSH: shingle → k minhashes → banded bucket-join. Candidate
  *                generation is a shuffle on (band, bandHash) — never a
  *                cross join — then only candidate pairs are verified.
  *  - SimHash:    64-bit signature via per-bit majority vote over token
  *                hashes; near-dups collide on bit-prefix buckets.
  *  - n-gram Jaccard: exact verification kernel (also usable standalone
  *                with a blocking key).
  *
  * Hashing is md5-based everywhere (not Spark's xxhash64) so every
  * signature is reproducible in any engine — the DuckDB oracle mirrors
  * these pipelines expression-for-expression.
  */
object Dedup {

  /** Exact dedup: group by content digest, keep the lowest id.
    * `count` is the family size (1 = unique).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Jaccard similarity of two string-array columns (distinct-element
    * semantics on both sides of the ratio).
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** k seeded minhashes of a shingle array: element i is
    * min over shingles of md5(shingle || "#i"). Lexicographic min over the
    * 32-hex digest equals numeric min over the 128-bit value.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(shingleCol, s => md5(concat(s, lit("#" + i)))))): _*)

  /** MinHash-LSH near-duplicate pairs over `df(idCol, textCol)`.
    *
    * Pipeline: shingle → signature(bands*rows) → explode one row per band
    * with a band digest → self-join on (band, digest) for candidates →
    * verify exact shingle Jaccard >= threshold. The only shuffles are the
    * band-bucket exchange and the two verification joins on id — all
    * key-partitioned, no quadratic blowup. Skewed buckets (boilerplate
    * documents) are bounded by the band digest's 128-bit spread; AQE's
    * skew-join handles the rest.
    */
  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
                 shingleN: Int = 3, bands: Int = 3, rows: Int = 3,
                 threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"),
      TextAnalysis.shingles(col(textCol), shingleN).as("s"))
    val sig = sh.select(col("doc_id"), col("s"),
      minhashSignature(col("s"), bands * rows).as("sig"))
    val bandRows = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws("|", slice(col("sig"), b * rows + 1, lit(rows))))))
        .as(Seq("band", "digest")))
    val cand = bandRows.as("a")
      .join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.digest") === col("b.digest") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    cand
      .join(sh.select(col("doc_id"), col("s").as("s_a")), col("a_id") === col("doc_id"))
      .drop("doc_id")
      .join(sh.select(col("doc_id"), col("s").as("s_b")), col("b_id") === col("doc_id"))
      .select(col("a_id"), col("b_id"), round(jaccard(col("s_a"), col("s_b")), 6).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** Blocked n-gram Jaccard near-dup pairs: exact pairwise similarity
    * within a blocking key (e.g. language) — the brute-force baseline the
    * LSH path approximates. The block join is a key-partitioned shuffle;
    * quadratic only within a block, so blocks must be chosen small at
    * scale.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        blockCol: String, shingleN: Int = 3,
                        threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"), col(blockCol).as("block"),
      TextAnalysis.shingles(col(textCol), shingleN).as("s"))
    sh.as("a").join(sh.as("b"),
        col("a.block") === col("b.block") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        round(jaccard(col("a.s"), col("b.s")), 6).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** 60-bit SimHash over whitespace tokens. Each token contributes ±1 to
    * every bit position according to its md5; the signature bit is the
    * sign of the vote. 60 bits (15 hex chars) keeps the value in a signed
    * long on any engine. Near-dup candidates = equal signatures (or equal
    * on rotated prefixes for Hamming-distance search).
    */
  def simhash(text: Column, bits: Int = 60): Column = {
    val tokenHashes = transform(TextAnalysis.tokens(text),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val votes = (0 until bits).map { j =>
      aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
    }
    votes.zipWithIndex.map { case (v, j) =>
      when(v >= 0, lit(1L) * (1L << j)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** SimHash dedup families: documents sharing a signature. */
  def simhashFamilies(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), simhash(col(textCol)).as("sig"))
      .groupBy("sig")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_docs"),
        sort_array(collect_list("doc_id")).as("doc_ids"))
}
