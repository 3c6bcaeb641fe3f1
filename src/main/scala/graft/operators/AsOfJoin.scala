package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-travel) join: for each left row, the most recent right row
  * with right.time <= left.time within the same key — the operator Spark
  * lacks natively (DuckDB: ASOF JOIN; kdb: aj).
  *
  * Implemented as union → per-key window (last_value ignoreNulls) →
  * filter, NOT as an inequality join: one hash shuffle on the key, then a
  * linear within-partition sort — O(n log n) per key group and no range
  * cross-product, which is the shape that survives 100 TB (an inequality
  * join would rescan the right side per left row).
  *
  * Tie rule: right rows at exactly left.time are visible (<=); among
  * right ties on time the largest `rightOrder` wins (deterministic).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (its columns are returned packed)
    * @param keyCols    equality keys
    * @param timeCol    event-time column name present on both sides
    * @param rightOrder tie-break column on the right side
    * @param payload    right columns to carry (renamed with `asof_` prefix)
    * @param toleranceSeconds  when set, a match older than this many
    *                   seconds before left.time is discarded (NULL
    *                   payload) — the bounded-staleness form every
    *                   time-series feature join wants (pandas
    *                   merge_asof's `tolerance`). Exact by construction:
    *                   the as-of match IS the newest candidate, so if it
    *                   falls outside the window no other right row can
    *                   be inside it. The window is inclusive
    *                   (right.time >= left.time - T), measured in exact
    *                   epoch micros.
    */
  def leftAsOf(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String,
      rightOrder: String, payload: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame = {
    toleranceSeconds.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    val leftCols = left.columns.toSeq
    // the matched right row's own time rides as a hidden struct field so
    // the tolerance test can compare it against left.time after the fold
    val payloadStruct = struct(payload.map(col) :+ col(timeCol).as("_asof_t"): _*)
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)) :+
        org.apache.spark.sql.types.StructField("_asof_t", right.schema(timeCol).dataType))
    val l = left
      .withColumn("_asof_side", lit(1))
      .withColumn("_asof_ord", lit(Long.MaxValue))
      .withColumn("_asof_payload", lit(null).cast(payloadType))
    val r = right
      // SQL equality semantics: a NULL key matches nothing, but the window
      // partitioning below would group NULLs together — drop unmatchable
      // right rows up front (null-key left rows then see only left rows in
      // their partition and correctly get a null payload)
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select((keyCols :+ timeCol :+ rightOrder).distinct.map(col) :+
        payloadStruct.as("_asof_payload"): _*)
      .withColumn("_asof_side", lit(0))
      .withColumn("_asof_ord", col(rightOrder).cast("long"))
    // align schemas: right rows carry nulls for left-only columns
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (r.columns.contains(c)) df else df.withColumn(c, lit(null).cast(dataTypeOf(l, c)))
    }.select(l.columns.toSeq.map(col): _*)
    val unioned = l.unionByName(rAligned)
    // right rows sort before left rows at equal time (side 0 < 1), so a
    // right row at exactly left.time is visible to that left row
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("_asof_side").asc, col("_asof_ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_asof_match", last("_asof_payload", ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
    val bounded = toleranceSeconds match {
      case None => matched
      case Some(t) => matched.withColumn("_asof_match",
        when(col("_asof_match").isNotNull &&
          unix_micros(col(timeCol)) - unix_micros(col("_asof_match._asof_t"))
            <= lit(t * 1000000L),
          col("_asof_match")))
    }
    bounded
      .select(leftCols.map(col) :+ col("_asof_match"): _*)
      .select(leftCols.map(col) ++ payload.map(p =>
        col(s"_asof_match.$p").as(s"asof_$p")): _*)
  }

  private def dataTypeOf(df: DataFrame, c: String) = df.schema(c).dataType
}
