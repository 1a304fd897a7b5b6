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
}
