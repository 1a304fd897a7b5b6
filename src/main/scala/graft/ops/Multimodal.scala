package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct, processed per-partition
  * in batches. The Spark-side machinery (schema, partitioning, batch
  * shape, deterministic output) is real; the actual media codecs are
  * STUBBED behind `decodeStub` — image/audio libraries are not available
  * in this container, and a real deployment swaps the stub for a codec
  * call with the identical signature.
  */
object Multimodal {

  /** Canonical multimodal schema fragment: payload + typed metadata. */
  val mediaMeta: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),  // image|audio|video
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Attach a payload + metadata struct derived from an existing column —
    * used by tests to fabricate media rows from text bytes.
    */
  def fabricate(df: DataFrame, srcCol: String, modality: String): DataFrame =
    df.withColumn("payload", encode(col(srcCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit(modality).as("modality"),
        lit(s"application/x-fake-$modality").as("mime"),
        (length(col(srcCol)) % 640).cast("int").as("width"),
        (length(col(srcCol)) % 480).cast("int").as("height"),
        (length(col(srcCol)) * 10L).as("duration_ms")))

  /** STUB decode: a real implementation calls the media codec here
    * (`??? // e.g. ImageIO.read / ffmpeg`). The stub derives a
    * deterministic fixed-length feature vector from the payload bytes so
    * the full pipeline — batch iteration, schema, partition parallelism —
    * is exercised end-to-end and testable.
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Per-partition batched feature extraction — the Scala analogue of a
    * pandas-UDF-over-mapInPandas pipeline: each task iterates its
    * partition once, decodes in-place, and emits (id, features). Narrow,
    * no shuffle; parallelism = input splits.
    */
  def extractFeatures(df: DataFrame, idCol: String, dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), decodeStub(r.getAs[Array[Byte]](1), dim).toSeq)
        }
      }(enc)
  }

  /** STUB resize: a real implementation decodes, scales to (w, h), and
    * re-encodes here (`??? // e.g. Thumbnails/ffmpeg scale`). The stub
    * keeps the batched per-partition shape and produces a deterministic
    * payload of the right order of magnitude (byte-strided sample) plus
    * correctly updated metadata, so downstream schema/partition behavior
    * is exercised for real.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, math.min(payload.length, w * h / 64))
    val stride = math.max(1, payload.length / target)
    val out = new Array[Byte](math.max(1, payload.length / stride))
    var i = 0
    while (i < out.length) { out(i) = payload(i * stride); i += 1 }
    out
  }

  /** Per-partition batched resize — same mapPartitions shape as
    * extractFeatures; emits the resized payload with metadata rewritten
    * to the target dimensions.
    */
  def resize(df: DataFrame, idCol: String, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("media_meta", mediaMeta, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col("payload"), col("media_meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val meta = r.getStruct(2)
          Row(r.getLong(0), resizeStub(r.getAs[Array[Byte]](1), w, h),
            Row(meta.getString(0), meta.getString(1), w, h, meta.get(4)))
        }
      }(enc)
  }

  /** Deterministic frame/sample selection for time-media: emit
    * `sample_idx` rows per media row (the sampling grid a video decoder
    * would fill) — demonstrates the fan-out shape without the codec.
    */
  def sampleGrid(df: DataFrame, idCol: String, samples: Int): DataFrame = {
    val dur = coalesce(col("media_meta.duration_ms"), lit(0L))
    val step = greatest((dur / lit(samples)).cast("long"), lit(1L))
    df.select(col(idCol), col("media_meta"),
      posexplode(sequence(lit(0L), dur, step)).as(Seq("sample_idx", "sample_ms")))
  }
}
