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
  def read(spark: SparkSession, input: String): DataFrame = {
    val sc = spark.sparkContext
    val inPath = new Path(input)
    val fs = inPath.getFileSystem(sc.hadoopConfiguration)
    val files =
      if (fs.getFileStatus(inPath).isDirectory)
        fs.listStatus(inPath).map(_.getPath)
          .filter(_.getName.endsWith(".arrow")).sortBy(_.getName).map(_.toString).toSeq
      else Seq(input)
    require(files.nonEmpty, s"no .arrow files under $input")
    // schema from the first file's footer (driver-side metadata read only)
    val schema = {
      val ch = channel(fs.open(new Path(files.head)),
        fs.getFileStatus(new Path(files.head)).getLen)
      val alloc = GraftArrow.childAllocator("graft-ipc-schema")
      val rd = new org.apache.arrow.vector.ipc.ArrowFileReader(ch, alloc)
      try GraftArrow.sparkSchema(rd.getVectorSchemaRoot.getSchema)
      finally { rd.close(); alloc.close() }
    }
    val bcConf = GraftArrow.broadcastConf(sc)
    val rows = sc.parallelize(files, files.length).flatMap { f =>
      val p = new Path(f)
      val pfs = p.getFileSystem(GraftArrow.confOf(bcConf))
      val ch = channel(pfs.open(p), pfs.getFileStatus(p).getLen)
      val alloc = GraftArrow.childAllocator(s"graft-ipc-read")
      val rd = new org.apache.arrow.vector.ipc.ArrowFileReader(ch, alloc)
      GraftArrow.readerRows(rd, Seq(rd, alloc))
    }
    GraftArrow.internalCreateDataFrame(spark, rows, schema)
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
