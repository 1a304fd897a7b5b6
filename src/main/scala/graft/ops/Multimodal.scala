package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct, processed per-partition
  * in batches. The IMAGE path is fully real — PNG encode/decode/resize via
  * the JDK's javax.imageio (`syntheticPng`/`decodeImage`/`resizeImageNN`/
  * `decodeImageStats`), no external library needed. Audio/video codecs are
  * not available in this container, so those paths keep the deterministic
  * STUB (`decodeStub`/`resizeStub`) — the Spark-side machinery (schema,
  * partitioning, batch shape) is identical, and a deployment swaps the
  * stub for the codec call with the same signature.
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

  // ==========================================================================
  // REAL image codec path — javax.imageio ships with the JDK, so PNG
  // decode/encode needs no external library. The stubs above remain the
  // pattern for codecs that genuinely aren't present (audio/video).
  // ==========================================================================

  /** Deterministic synthetic PNG: pixel (x,y) is a fixed integer hash of
    * (seed, x, y) — a REAL compressed image whose decoded pixels are
    * exactly reproducible, used to exercise the codec path end-to-end.
    */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = seed * 1315423911L + x * 2654435761L + y * 40503L
        img.setRGB(x, y, (v & 0xffffffL).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real PNG decode via ImageIO: (width, height, row-major RGB ints). */
  def decodeImage(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val w = img.getWidth
    val h = img.getHeight
    (w, h, img.getRGB(0, 0, w, h, null, 0, w))
  }

  /** Real resize: decode, nearest-neighbor sample on integer pixel
    * coordinates (hand-rolled — Graphics2D interpolation is not
    * bit-specified), re-encode PNG. Deterministic on any JVM.
    */
  def resizeImageNN(payload: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    val (w, h, px) = decodeImage(payload)
    val out = new java.awt.image.BufferedImage(
      tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < th) {
      var x = 0
      while (x < tw) {
        out.setRGB(x, y, px((y * h / th) * w + (x * w / tw)))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Batched REAL decode + per-channel statistics: one codec call per
    * row inside mapPartitions (narrow, no shuffle), integer channel sums
    * reduced to means with one division each — the image analogue of the
    * text quality signals, and the shape a 100 TB media-filtering pass
    * runs (decode cost dominates; parallelism = input splits).
    */
  def decodeImageStats(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, px) = decodeImage(r.getAs[Array[Byte]](1))
          var sr = 0L; var sg = 0L; var sb = 0L
          var i = 0
          while (i < px.length) {
            val p = px(i)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            i += 1
          }
          val n = (w * h).toDouble
          Row(r.getLong(0), w, h, sr / n, sg / n, sb / n)
        }
      }(enc)
  }

  /** Per-tile channel sums of a REAL decoded image on a grid×grid
    * partition (tile index = coord·grid / dim, the aHash cell rule) —
    * the region-statistics primitive behind crop-quality checks, border
    * detection, and tile-level near-dup. INTEGER-ONLY output (sums +
    * pixel counts, no means), so results are bit-exact anywhere and the
    * caller picks its own precision. grid² rows per image via a narrow
    * flatMap.
    */
  def tileChannelSums(df: DataFrame, idCol: String, grid: Int = 2): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tr", IntegerType, nullable = false),
      StructField("tc", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val (w, h, px) = decodeImage(r.getAs[Array[Byte]](1))
          val n = new Array[Long](grid * grid)
          val sr = new Array[Long](grid * grid)
          val sg = new Array[Long](grid * grid)
          val sb = new Array[Long](grid * grid)
          var y = 0
          while (y < h) {
            val ty = y * grid / h
            var x = 0
            while (x < w) {
              val i = ty * grid + x * grid / w
              val p = px(y * w + x)
              n(i) += 1
              sr(i) += (p >> 16) & 0xff; sg(i) += (p >> 8) & 0xff; sb(i) += p & 0xff
              x += 1
            }
            y += 1
          }
          (0 until grid * grid).map(i =>
            Row(r.getLong(0), i / grid, i % grid, n(i), sr(i), sg(i), sb(i)))
        }
      }(enc)
  }

  /** 64-bit average-hash (aHash) of a REAL decoded image: integer-only
    * 8x8 block-mean downsample of the grayscale plane, thresholded at the
    * integer global mean — the standard perceptual fingerprint for
    * near-duplicate image detection. Pure integer arithmetic end to end,
    * so the hash is bit-identical on any JVM/architecture.
    */
  def aHash64(payload: Array[Byte]): Long = {
    val (w, h, px) = decodeImage(payload)
    val cell = new Array[Long](64)
    val cnt = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        val g = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
        val i = by * 8 + x * 8 / w
        cell(i) += g
        cnt(i) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    var total = 0L
    while (i < 64) { cell(i) = cell(i) / math.max(cnt(i), 1L); total += cell(i); i += 1 }
    val mean = total / 64
    var hash = 0L
    i = 0
    while (i < 64) { if (cell(i) > mean) hash |= (1L << i); i += 1 }
    hash
  }

  /** Perceptual near-duplicate image detection: one REAL decode + aHash
    * per row (narrow mapPartitions — the 100 TB-scan shape where codec
    * cost dominates), then the same banded LSH self-join as simhash text
    * dedup: 4 × 16-bit bands guarantee any pair within Hamming distance 3
    * shares a band (pigeonhole), XOR popcount verifies exactly. Never a
    * cross join; shuffle volume is rows × bands.
    */
  def phashPairs(df: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sig", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val sigs = df.select(col(idCol).cast("long").as("id"), col("payload"))
      .mapPartitions { rows =>
        rows.map(r => Row(r.getLong(0), aHash64(r.getAs[Array[Byte]](1))))
      }(enc)
      .localCheckpoint() // eager: the band self-join scans this twice
    val bands = 4
    val bandBits = 16
    val mask = (1L << bandBits) - 1
    val bandRows = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map(j =>
        shiftright(col("sig"), j * bandBits).bitwiseAND(mask)): _*))
        .as(Seq("band", "bv")))
    bandRows.as("a").join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Deterministic synthetic WAV (16-bit mono little-endian PCM): sample i
    * is an integer hash of (seed, i) — a REAL RIFF/WAVE container written
    * by the JDK's javax.sound.sampled, decodable by any audio stack.
    */
  def syntheticWav(seed: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (((seed * 1315423911L + i * 2654435761L) & 0xffffL) - 32768L).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real WAV decode via AudioSystem: (sampleRate, 16-bit PCM samples). */
  def decodeWav(payload: Array[Byte]): (Int, Array[Short]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
      i += 1
    }
    (fmt.getSampleRate.toInt, out)
  }

  /** Batched REAL audio decode + signal statistics: duration, peak, and
    * RMS from exact integer sums (one sqrt at the end) — the audio
    * analogue of decodeImageStats, same narrow mapPartitions shape.
    */
  def decodeAudioStats(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("peak", IntegerType, nullable = false),
      StructField("rms", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (rate, pcm) = decodeWav(r.getAs[Array[Byte]](1))
          var sumSq = 0L
          var peak = 0
          var i = 0
          while (i < pcm.length) {
            val v = pcm(i).toInt
            sumSq += v.toLong * v
            if (math.abs(v) > peak) peak = math.abs(v)
            i += 1
          }
          Row(r.getLong(0), rate, pcm.length,
            pcm.length * 1000L / rate, peak,
            math.sqrt(sumSq.toDouble / pcm.length))
        }
      }(enc)
  }

  /** Audio fingerprint from REAL WAV decode: fixed-size blocks of the
    * PCM stream reduce to exact integer energies Σv², and the md5 of the
    * comma-joined energy vector is the content digest — the
    * equal-content audio dedup signal (the pHash analogue for sound;
    * a band-quantized variant drops in behind the same digest column
    * for near-dup). Narrow mapPartitions, one row out per media row.
    */
  def audioEnergyFingerprint(df: DataFrame, idCol: String,
                             blockSize: Int = 128): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_blocks", IntegerType, nullable = false),
      StructField("total_energy", LongType, nullable = false),
      StructField("digest", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (_, pcm) = decodeWav(r.getAs[Array[Byte]](1))
          val nb = (pcm.length + blockSize - 1) / blockSize
          val energies = new Array[Long](math.max(nb, 1))
          var i = 0
          while (i < pcm.length) {
            val v = pcm(i).toLong
            energies(i / blockSize) += v * v
            i += 1
          }
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(energies.mkString(",").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          Row(r.getLong(0), nb, energies.sum, digest)
        }
      }(enc)
  }

  /** Energy-threshold activity segmentation (the VAD-shaped primitive)
    * through REAL WAV decode: block the 16-bit PCM into `blockSize`-sample
    * windows, mark a block active when its exact integer energy Σv² meets
    * `threshold`, and emit one row per maximal run of consecutive active
    * blocks — (id, seg, start/end block, block count, exact total energy).
    *
    * Same narrow mapPartitions shape as [[decodeAudioStats]]: codec work
    * is per-row, output is segments-sized, nothing shuffles. The island
    * detection is a single in-kernel pass (per-row data is already local),
    * not a window function — no sort, no state.
    */
  def audioActiveSegments(df: DataFrame, idCol: String, blockSize: Int,
                          threshold: Long): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("seg", IntegerType, nullable = false),
      StructField("start_block", IntegerType, nullable = false),
      StructField("end_block", IntegerType, nullable = false),
      StructField("n_blocks", IntegerType, nullable = false),
      StructField("energy", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val (_, pcm) = decodeWav(r.getAs[Array[Byte]](1))
          val nb = (pcm.length + blockSize - 1) / blockSize
          val energies = new Array[Long](math.max(nb, 1))
          var i = 0
          while (i < pcm.length) {
            val v = pcm(i).toLong
            energies(i / blockSize) += v * v
            i += 1
          }
          val segs = scala.collection.mutable.ArrayBuffer.empty[Row]
          var b = 0
          var start = -1
          var acc = 0L
          while (b <= nb) {
            val active = b < nb && energies(b) >= threshold
            if (active) {
              if (start < 0) { start = b; acc = 0L }
              acc += energies(b)
            } else if (start >= 0) {
              segs += Row(r.getLong(0), segs.length, start, b - 1, b - start, acc)
              start = -1
            }
            b += 1
          }
          segs
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
