package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge / upsert compaction: apply a change stream to a base
  * snapshot with latest-wins semantics — the operation behind incremental
  * table maintenance (Hive ACID / Delta / Iceberg MERGE INTO re-expressed
  * as a plain Spark plan over parquet).
  *
  * Scale design: one hash shuffle on the key columns; the per-key
  * row_number window runs inside the same exchange (keys are unique-ish,
  * so no skewed window partitions), and nothing is collected to the
  * driver. At 100 TB this is the standard compaction shape: base and
  * deltas co-partitioned by key, one exchange, streaming top-1 per key.
  */
object Upsert {

  /** Merge `changes` into `base`: per key, the row with the highest
    * `versionCol` wins (ties broken toward the change side, then by
    * `tieCol` descending — deterministic for any input); winners flagged
    * true in `deleteCol` (when present in `changes`) are dropped, i.e. a
    * delete tombstone removes the key. Output columns = base columns
    * (minus `versionCol` unless `keepVersionCol` — a persisted table
    * that will be upserted AGAIN must keep the winners' versions for the
    * next merge's conflict resolution, see [[SnapshotTable.upsert]]).
    */
  def latestWins(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      versionCol: String, tieCol: String, deleteCol: String = "_deleted",
      keepVersionCol: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "latestWins needs at least one key column")
    val outCols =
      if (keepVersionCol) base.columns
      else base.columns.filterNot(_ == versionCol)
    val withDel =
      if (changes.columns.contains(deleteCol)) changes
      else changes.withColumn(deleteCol, lit(false))
    // base rows never delete; change rows outrank base at equal version
    val midCols = outCols.filterNot(c => keyCols.contains(c) || c == versionCol)
    val all = base.withColumn(deleteCol, lit(false)).withColumn("_src", lit(0))
      .select((keyCols ++ midCols ++
        Seq(versionCol, deleteCol, "_src")).map(col): _*)
      .unionByName(withDel.withColumn("_src", lit(1))
        .select((keyCols ++ midCols ++
          Seq(versionCol, deleteCol, "_src")).map(col): _*))
    // last resort: a content hash over the full row INCLUDING the delete
    // flag, so even a tombstone vs a same-content update tying on
    // (version, side, tieCol) resolves the same way on every run / task
    // retry — deterministic for ANY input, as documented
    val allCols = struct((keyCols ++ midCols ++
      Seq(versionCol, deleteCol)).map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc, col(tieCol).desc,
        xxhash64(allCols).desc)
    all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col(deleteCol))
      .select(outCols.map(col): _*)
  }
}
