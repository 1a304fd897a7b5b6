package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** CDC-style MERGE: apply a change set (insert / update / delete rows)
  * to a key-unique snapshot, producing the next snapshot.
  *
  * This is the table-maintenance primitive the reference's converter
  * pipeline never needs (it only ever appends), but any 100 TB lakehouse
  * table does: upserting a day of mutations into a customer snapshot,
  * folding a Debezium/CDC feed into parquet, compacting a slowly
  * changing dimension. Same observable semantics as `MERGE INTO t USING
  * c ON t.k = c.k WHEN MATCHED AND op='D' THEN DELETE WHEN MATCHED THEN
  * UPDATE SET * WHEN NOT MATCHED AND op<>'D' THEN INSERT *`, expressed
  * with plain joins so it runs on any format Spark can write.
  *
  * Plan shape: ONE left-anti join of the snapshot against touched keys
  * (shuffle on the key — or map-side if the change set broadcasts, the
  * common case: a day's mutations are tiny next to the snapshot) plus a
  * union of the replacement rows. The snapshot is never sorted or
  * windowed; cost is O(snapshot + changes) with a single exchange each.
  *
  * Requirements: `target` is key-unique; `changes` is key-unique (one
  * final state per key — pre-compact a multi-mutation feed first, e.g.
  * with a max_by(ts) aggregation); both sides share the payload schema.
  */
object Merge {

  /** Next snapshot after applying `changes` (op column: 'I' | 'U' | 'D')
    * to `target`. Payload columns = target columns; `changes` must carry
    * the same columns plus `opCol`.
    */
  def applyChanges(target: DataFrame, changes: DataFrame,
                   key: String, opCol: String,
                   broadcastChanges: Boolean = true): DataFrame = {
    val payload = target.columns.toSeq
    val touched0 = changes.select(col(key))
    val touched = if (broadcastChanges) broadcast(touched0) else touched0
    val survivors = target.join(touched, Seq(key), "left_anti")
    val replacements = changes
      .filter(col(opCol) =!= "D")
      .select(payload.map(col): _*)
    survivors.unionByName(replacements)
  }

  /** Snapshot diff — the inverse of `applyChanges`: given two key-unique
    * table versions, emit one row per differing key with `change` ∈
    * {'added', 'removed', 'changed'}. Payloads compare null-safely
    * column-by-column (`<=>`), so a null→value flip counts as a change.
    *
    * This is the dataset-versioning primitive (what changed between
    * yesterday's curated corpus and today's?) — diff two snapshots, audit
    * the delta, or derive the CDC feed that `applyChanges` would replay.
    *
    * Scale shape: ONE full-outer shuffle join on the key; the comparison
    * is a narrow projection. Identical rows drop before any further
    * stage, so output is proportional to the delta, not the table.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String): DataFrame = {
    val payload = oldDf.columns.filterNot(_ == key).toSeq
    require(payload.toSet == newDf.columns.filterNot(_ == key).toSet,
      "snapshotDiff requires identical payload schemas")
    val o = oldDf.select(col(key) +: lit(1).as("__o") +:
      payload.map(c => col(c).as(s"o_$c")): _*)
    val n = newDf.select(col(key) +: lit(1).as("__n") +:
      payload.map(c => col(c).as(s"n_$c")): _*)
    val same = payload.map(c => col(s"o_$c") <=> col(s"n_$c")).reduce(_ && _)
    o.join(n, Seq(key), "full_outer")
      .withColumn("change",
        when(col("__o").isNull, "added")
          .when(col("__n").isNull, "removed")
          .when(!same, "changed"))
      .filter(col("change").isNotNull)
      .select(col(key), col("change"))
  }
}
