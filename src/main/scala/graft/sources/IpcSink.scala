package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.GraftArrow

/** Arrow IPC "file" (Feather v2) sink — the reference's `Target::Ipc`
  * (crates/evolution-target/src/target.rs:34), which the reference itself
  * leaves `todo!()`; here it is a real write path built entirely from the
  * Arrow runtime Spark already bundles (arrow-vector + the internal
  * row→vector ArrowWriter), no extra jars.
  *
  * Layout mirrors the built-in file sinks: one `part-NNNNN.arrow` per
  * non-empty partition plus `_SUCCESS`. Tasks write a per-attempt temp
  * file and rename it into place, so retries and speculative duplicates
  * are idempotent; a failed JOB may still leave committed part files
  * (no job-level temporary directory), which `overwrite` cleans up —
  * acceptable for an export sink whose consumers key on `_SUCCESS`.
  * Each file carries the full schema, so any Arrow reader (pyarrow,
  * polars, DuckDB, arrow-rs) opens parts independently — the property
  * that makes IPC the zero-copy interchange format for handing a
  * 100 TB corpus partition-by-partition to non-JVM consumers.
  */
object IpcSink {

  def write(df: DataFrame, output: String, mode: String = "errorifexists",
            maxRecordsPerBatch: Int = 4096): Unit = {
    val spark = df.sparkSession
    val out = new Path(output)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    mode.toLowerCase match {
      case "errorifexists" | "error" =>
        if (fs.exists(out)) throw new IllegalStateException(
          s"path $output already exists (save mode errorifexists)")
      case "overwrite" => if (fs.exists(out)) fs.delete(out, true)
      case "ignore"    => if (fs.exists(out)) return
      case other => throw new IllegalArgumentException(
        s"ipc sink supports errorifexists | overwrite | ignore, got '$other'")
    }
    fs.mkdirs(out)
    val schema = df.schema
    val tz = spark.conf.get("spark.sql.session.timeZone")
    val bcConf = GraftArrow.broadcastConf(spark.sparkContext)
    val dir = out.toString
    val batch = maxRecordsPerBatch
    // tracked execution: observe() metrics attached upstream still fire,
    // and the write shows as one SQL execution in the UI
    val rdd = GraftArrow.internalRowRdd(df)
    if (rdd.getNumPartitions == 0) {
      // a zero-partition plan (e.g. an empty LocalRelation) runs no tasks,
      // so the "partition 0 lands the schema" guard never fires — write a
      // schema-only part from the driver so readers get an empty frame
      // with the right schema instead of a _SUCCESS-only directory
      val part = new Path(out, "part-00000.arrow")
      val os = fs.create(part, true)
      try GraftArrow.writeIpcFile(schema, tz, batch, Iterator.empty, os)
      finally os.close()
      fs.create(new Path(out, "_SUCCESS"), true).close()
      return
    }
    GraftArrow.withTrackedExecution(df, "ipc write") {
      rdd.foreachPartition { rows =>
        val ctx = org.apache.spark.TaskContext.get()
        val pid = if (ctx != null) ctx.partitionId() else 0
        if (rows.hasNext || pid == 0) { // partition 0 always lands the schema
          val part = new Path(dir, f"part-$pid%05d.arrow")
          val pfs = part.getFileSystem(GraftArrow.confOf(bcConf))
          // per-attempt temp + rename makes task retries and speculative
          // duplicates idempotent: a half-written file from a failed
          // attempt never carries the final name, and the losing attempt
          // of a rename race just discards its temp (at 1000 executors,
          // retries are routine, not exceptional)
          val attempt = if (ctx != null) ctx.taskAttemptId() else 0L
          val tmp = new Path(dir, f".part-$pid%05d-$attempt.arrow.tmp")
          val os = pfs.create(tmp, true)
          try GraftArrow.writeIpcFile(schema, tz, batch, rows, os)
          finally os.close()
          if (!pfs.rename(tmp, part)) {
            pfs.delete(tmp, false)
            if (!pfs.exists(part)) throw new java.io.IOException(
              s"could not commit $tmp to $part")
          }
        }
      }
    }
    fs.create(new Path(out, "_SUCCESS"), true).close()
  }
}
