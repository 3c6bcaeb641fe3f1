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
    */
  def leftAsOf(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String,
      rightOrder: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_asof_side", lit(1))
      .withColumn("_asof_ord", lit(Long.MaxValue))
      .withColumn("_asof_payload", lit(null).cast(structType(right, payload)))
    val r = right
      // SQL equality semantics: a NULL key matches nothing, but the window
      // partitioning below would group NULLs together — drop unmatchable
      // right rows up front (null-key left rows then see only left rows in
      // their partition and correctly get a null payload)
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select((keyCols :+ timeCol :+ rightOrder).distinct.map(col) :+
        struct(payload.map(col): _*).as("_asof_payload"): _*)
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
    unioned
      .withColumn("_asof_match", last("_asof_payload", ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
      .select(leftCols.map(col) :+ col("_asof_match"): _*)
      .select(leftCols.map(col) ++ payload.map(p =>
        col(s"_asof_match.$p").as(s"asof_$p")): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(cols.map(c => df.schema(c)))

  private def dataTypeOf(df: DataFrame, c: String) = df.schema(c).dataType
}
