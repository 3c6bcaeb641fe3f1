package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate MATERIALIZED VIEW over a
  * [[SnapshotTable]] — the lakehouse "incremental view maintenance"
  * primitive (Delta/Materialize-style): the view holds
  * `groupBy(key) → (n_rows, Σvalue)` for one snapshot version, and a
  * refresh advances it to the current version by applying only the CDC
  * DELTA between the two versions ([[SnapshotTable.changes]] — O(files
  * touched), never a table rescan), merged into the view with one
  * key-domain-sized full-outer join. Per-refresh cost is
  * O(delta + |view|), independent of the TABLE's row count — the whole
  * point at 100 TB, where "recompute the aggregate nightly" rescans
  * everything and "maintain from CDC" touches only what changed. At
  * larger key domains the view fileset would be hash-bucketed by key so
  * the merge co-partitions; the merge is already a plain shuffle join
  * that AQE sizes.
  *
  * EXACTNESS (what lets a refreshed view hash-equal a from-scratch
  * rebuild, and the DuckDB full-recompute oracle): the summed value is
  * converted to integer CENTS at ingestion — `round(value·100)` is
  * exact for the ≤2-decimal currency values this targets — so every
  * sum is INT64 arithmetic: associative, commutative, order-free.
  * Incremental (+post −pre) maintenance is then algebraically identical
  * to recomputation, with no float-accumulation-order drift possible.
  * The served `sum_value` divides once by 100 at read time (one double
  * division per key — the same double on every engine).
  *
  * The view is itself a [[FilesetLog]] store: each refresh publishes the
  * merged aggregate fileset in ONE atomic manifest commit whose entry
  * tag records the SNAPSHOT VERSION the view reflects — crash between
  * write and publish leaves the previous view serving (never a torn
  * view), and concurrent readers get snapshot isolation like every
  * manifest store here. Old view versions are vacuumable via
  * [[FilesetLog]]-style reclamation of unreferenced agg filesets.
  */
object MaterializedView {

  private val AggKind = "A"

  /** Create the view at `mvDir` reflecting `tableDir`'s CURRENT version:
    * one full aggregation scan (paid once — every later refresh is
    * delta-sized). Returns the snapshot version the view reflects.
    */
  def create(spark: SparkSession, tableDir: String, mvDir: String,
      keyCol: String, valueCol: String): Long = {
    require(FilesetLog.current(spark, mvDir).isEmpty,
      s"a materialized view already exists under $mvDir — refresh() it")
    val v = SnapshotTable.currentVersion(spark, tableDir).getOrElse(
      throw new IllegalArgumentException(s"no snapshot table under $tableDir"))
    val agg = SnapshotTable.read(spark, tableDir, Some(v))
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col(valueCol) * 100).cast("long")).as("sum_cents"))
    commitView(spark, mvDir, agg, v)
    v
  }

  /** Advance the view to the table's current version by applying the
    * CDC delta (fromV, toV]: inserts and update POST-images add, deletes
    * and update PRE-images subtract — counts and cent-sums are both
    * signed INT64, so the merge is exact and order-free. Keys whose row
    * count reaches zero leave the view. No-op (and no new view version)
    * when the view is already current. Returns (fromVersion, toVersion).
    *
    * `tableKeyCol` is the TABLE's merge key (what
    * [[SnapshotTable.changes]] diffs rows by); `keyCol` is the VIEW's
    * group key — they are usually different (a view groups by a
    * dimension, the table merges by its primary key).
    */
  def refresh(spark: SparkSession, tableDir: String, mvDir: String,
      tableKeyCol: String, keyCol: String, valueCol: String): (Long, Long) = {
    val m = FilesetLog.current(spark, mvDir).getOrElse(
      throw new IllegalArgumentException(s"no view under $mvDir — create() first"))
    val es = FilesetLog.entries(spark, mvDir, m).filter(_.kind == AggKind)
    val v0 = es.map(_.tag).distinct match {
      case Seq(t) => t
      case other => throw new IllegalStateException(
        s"view manifest must carry one snapshot version, got $other")
    }
    val v1 = SnapshotTable.currentVersion(spark, tableDir).getOrElse(
      throw new IllegalArgumentException(s"no snapshot table under $tableDir"))
    require(v1 >= v0, s"table at v$v1 is OLDER than the view's v$v0 — " +
      "was the table replaced? rebuild the view (a restore commits a NEW " +
      "version and refreshes fine)")
    if (v1 == v0) return (v0, v0)
    // a vacuum that dropped v0's manifest breaks the CDC base — fail
    // with the remedy, not manifestLines' bare missing-version error
    require(SnapshotTable.versions(spark, tableDir).contains(v0),
      s"the view reflects v$v0 but that version was vacuumed from " +
        s"$tableDir — the CDC delta can no longer be computed; rebuild " +
        "the view (delete it and create()), or keep vacuum retention " +
        "above the refresh cadence")
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val delta = SnapshotTable.changes(spark, tableDir, tableKeyCol, v0, v1)
      .select(col(keyCol).as("key"), sign.as("sg"),
        (sign * round(col(valueCol) * 100).cast("long")).as("sc"))
      .groupBy("key")
      .agg(sum(col("sg")).as("dn"), sum(col("sc")).as("ds"))
    val old = spark.read.parquet(es.map(_.file): _*)
    val merged = old.join(delta, Seq("key"), "full_outer")
      .select(col("key"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_rows"),
        (coalesce(col("sum_cents"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("sum_cents"))
      .filter(col("n_rows") > 0)
    commitView(spark, mvDir, merged, v1)
    (v0, v1)
  }

  /** The view's aggregate, served from its CURRENT committed version:
    * (key, n_rows, sum_value) — sum_value = cents / 100, one double
    * division per key.
    */
  def serve(spark: SparkSession, mvDir: String): DataFrame = {
    val m = FilesetLog.current(spark, mvDir).getOrElse(
      throw new IllegalArgumentException(s"no view under $mvDir"))
    val es = FilesetLog.entries(spark, mvDir, m).filter(_.kind == AggKind)
    spark.read.parquet(es.map(_.file): _*)
      .select(col("key"), col("n_rows"),
        (col("sum_cents").cast("double") / 100.0).as("sum_value"))
  }

  /** The snapshot version the current view reflects (freshness probe). */
  def reflectedVersion(spark: SparkSession, mvDir: String): Long = {
    val m = FilesetLog.current(spark, mvDir).getOrElse(
      throw new IllegalArgumentException(s"no view under $mvDir"))
    FilesetLog.entries(spark, mvDir, m).filter(_.kind == AggKind)
      .map(_.tag).distinct.head
  }

  /** Streaming maintenance: tail a change-row feed (the
    * [[SnapshotTable.maintainStream]] shape — post-images plus
    * `_deleted` tombstones), upsert each micro-batch into the table AND
    * advance the view to the fresh version in the same foreachBatch —
    * the view is then CONTINUOUSLY fresh, one delta-sized refresh per
    * commit, never a rescan. Arrival batching is invisible: per-key
    * latest-wins makes the table content slicing-independent, and the
    * view's integer-cents algebra makes k incremental refreshes equal
    * one (or a from-scratch rebuild) exactly.
    */
  def maintainStream(spark: SparkSession, changesDir: String,
      schema: org.apache.spark.sql.types.StructType,
      tableDir: String, mvDir: String, tableKeyCol: String,
      versionCol: String, tieCol: String, keyCol: String, valueCol: String,
      checkpoint: String,
      maxFilesPerTrigger: Int = 1): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(changesDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          SnapshotTable.upsert(batch.sparkSession, tableDir, batch,
            tableKeyCol, versionCol, tieCol)
          refresh(batch.sparkSession, tableDir, mvDir,
            tableKeyCol, keyCol, valueCol)
          ()
        }
      }
      .start()

  private def commitView(spark: SparkSession, mvDir: String, agg: DataFrame,
      snapshotV: Long): Unit = {
    val m = FilesetLog.current(spark, mvDir).getOrElse(0L)
    val files = FilesetLog.writeFileset(agg,
      s"$mvDir/agg/" + f"v${m + 1}%05d" + s"_${FilesetLog.nonce()}")
    FilesetLog.commit(spark, mvDir, m + 1,
      files.map(FilesetLog.Entry(AggKind, snapshotV, _)))
  }
}
