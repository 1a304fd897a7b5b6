package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.graftbridge.GraftArrow
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Arrow IPC "file" (Feather v2) source — the read half of [[IpcSink]],
  * so IPC data round-trips entirely inside the engine and external Arrow
  * producers (pyarrow, polars, arrow-rs) can hand data in without a
  * parquet detour.
  *
  * Distribution model: one task per part file (IPC files are not
  * block-splittable the way parquet row groups are, but a sink that
  * wrote N partitions reads back at the same parallelism). Each task
  * streams batch-by-batch through Spark's own ArrowColumnVector /
  * ColumnarBatch adapters — memory is bounded by one record batch, the
  * unit [[IpcSink]] capped at write time.
  */
object IpcSource {

  /** Read a `.arrow` file or a directory of `part-*.arrow` files. */
  def read(spark: SparkSession, input: String): DataFrame =
    read(spark, Seq(input))

  /** Read several `.arrow` files/directories as one frame (first file's
    * schema wins; all must match). This is also the real escape hatch the
    * `_SUCCESS` gate refers to: after inspecting a partially committed
    * directory, pass the intact part files individually.
    */
  def read(spark: SparkSession, inputs: Seq[String]): DataFrame = {
    require(inputs.nonEmpty, "IpcSource.read needs at least one path")
    val sc = spark.sparkContext
    val sized: Seq[(String, Long)] = inputs.flatMap { input =>
      val inPath = new Path(input)
      val fs = inPath.getFileSystem(sc.hadoopConfiguration)
      if (fs.getFileStatus(inPath).isDirectory) {
        val parts = fs.listStatus(inPath)
          .filter(_.getPath.getName.endsWith(".arrow"))
          .sortBy(_.getPath.getName)
        // a directory in IpcSink's own part-NNNNN layout without _SUCCESS
        // is a partially committed job (the sink has no job-level temp
        // dir) — refuse to silently read it as complete data; externally
        // named .arrow files carry no such contract and pass through
        if (parts.nonEmpty &&
            parts.forall(_.getPath.getName.matches("part-\\d{5}\\.arrow")))
          require(fs.exists(new Path(inPath, "_SUCCESS")),
            s"$input has IpcSink part files but no _SUCCESS marker — " +
              "refusing to read a partially committed job (after " +
              "inspection, pass the intact part files individually to " +
              "read(spark, paths))")
        parts.map(s => (s.getPath.toString, s.getLen)).toSeq
      } else Seq((input, fs.getFileStatus(inPath).getLen))
    }
    require(sized.nonEmpty, s"no .arrow files under ${inputs.mkString(", ")}")
    // schema from the first file's footer (driver-side metadata read only)
    val schema = {
      val headPath = new Path(sized.head._1)
      val fs = headPath.getFileSystem(sc.hadoopConfiguration)
      val ch = channel(fs.open(headPath), sized.head._2)
      val alloc = GraftArrow.childAllocator("graft-ipc-schema")
      val rd = new org.apache.arrow.vector.ipc.ArrowFileReader(ch, alloc)
      try GraftArrow.sparkSchema(rd.getVectorSchemaRoot.getSchema)
      finally { rd.close(); alloc.close() }
    }
    val bcConf = GraftArrow.broadcastConf(sc)
    // IPC files are not block-splittable, so task granularity is the file:
    // pack files into ≤ defaultParallelism byte-balanced groups (greedy
    // LPT) so externally produced mixed-size files don't leave one task
    // with all the bytes while the rest idle
    val groups = packBySize(sized, math.min(sized.length,
      math.max(1, sc.defaultParallelism)))
    val rows = sc.parallelize(groups, groups.length).flatMap { group =>
      group.iterator.flatMap { f =>
        val p = new Path(f)
        val pfs = p.getFileSystem(GraftArrow.confOf(bcConf))
        val ch = channel(pfs.open(p), pfs.getFileStatus(p).getLen)
        val alloc = GraftArrow.childAllocator(s"graft-ipc-read")
        val rd = new org.apache.arrow.vector.ipc.ArrowFileReader(ch, alloc)
        GraftArrow.readerRows(rd, Seq(rd, alloc))
      }
    }
    GraftArrow.internalCreateDataFrame(spark, rows, schema)
  }

  /** Greedy LPT packing: files descending by size, each into the
    * currently-lightest bin — ≤ (4/3)·OPT makespan, deterministic
    * (size ties break on name, bin ties on index). Empty bins dropped.
    */
  private[graft] def packBySize(files: Seq[(String, Long)],
                                  bins: Int): Seq[Seq[String]] = {
    val byBin = Array.fill(bins)(Vector.empty[String])
    val load = new Array[Long](bins)
    files.sortBy { case (f, len) => (-len, f) }.foreach { case (f, len) =>
      val i = load.indices.minBy(load(_))
      byBin(i) = byBin(i) :+ f
      load(i) += len
    }
    byBin.toSeq.filter(_.nonEmpty)
  }

  /** Hadoop input stream as the SeekableByteChannel the Arrow reader
    * needs (array-buffered: ByteBufferReadable is not guaranteed by
    * every filesystem implementation).
    */
  private def channel(in: FSDataInputStream, len: Long)
      : java.nio.channels.SeekableByteChannel =
    new java.nio.channels.SeekableByteChannel {
      private var open = true
      override def read(dst: java.nio.ByteBuffer): Int = {
        val want = dst.remaining()
        if (want == 0) 0
        else {
          val buf = new Array[Byte](want)
          val n = in.read(buf, 0, want)
          if (n > 0) dst.put(buf, 0, n)
          n
        }
      }
      override def write(src: java.nio.ByteBuffer): Int =
        throw new java.nio.channels.NonWritableChannelException
      override def position(): Long = in.getPos
      override def position(p: Long): java.nio.channels.SeekableByteChannel = {
        in.seek(p); this
      }
      override def size(): Long = len
      override def truncate(s: Long): java.nio.channels.SeekableByteChannel =
        throw new java.nio.channels.NonWritableChannelException
      override def isOpen: Boolean = open
      override def close(): Unit = { open = false; in.close() }
    }
}
