package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: pair left rows with right rows of the same key
  * whose time lies in [left.time - gap, left.time].
  *
  * Spark turns a raw inequality join into a per-key nested loop; this
  * implementation bands time into gap-width buckets instead: each right
  * row is visible to its own and the following bucket, the join runs on
  * (key, bucket) equality — a plain hash join — and the exact interval
  * predicate filters the ≤2× banded candidates. Work stays O(matches),
  * the shape that survives 100 TB of events.
  */
object RangeJoin {

  /** Inner interval join; returns left columns + `payload` right columns
    * (prefixed `r_`). `timeCol` must be a timestamp on both sides.
    */
  def withinPreceding(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, gapSeconds: Long,
      payload: Seq[String]): DataFrame = {
    val l = left.withColumn("_bucket", floor(col(timeCol).cast("long") / gapSeconds))
    val r0 = right.select(
      (Seq(keyCol, timeCol) ++ payload).distinct.map(c => col(c).as(s"r_$c")): _*)
    // a right row at bucket b can match left rows in buckets b and b+1
    val r = r0.withColumn("_bucket",
      explode(array(floor(col(s"r_$timeCol").cast("long") / gapSeconds),
        floor(col(s"r_$timeCol").cast("long") / gapSeconds) + 1)))
    l.join(r, l(keyCol) === r(s"r_$keyCol") && l("_bucket") === r("_bucket"))
      .filter(col(s"r_$timeCol") >= col(timeCol) - expr(s"INTERVAL $gapSeconds SECONDS") &&
        col(s"r_$timeCol") <= col(timeCol))
      .drop("_bucket", s"r_$keyCol")
  }

  /** Left-outer counting variant: every left row with the number of right
    * rows in its preceding window (0 when none).
    */
  def countPreceding(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, gapSeconds: Long,
      leftId: String): DataFrame = {
    val matched = withinPreceding(left, right, keyCol, timeCol, gapSeconds, Seq.empty)
      .groupBy(leftId).agg(count(lit(1)).as("n_matches"))
    left.join(matched, Seq(leftId), "left_outer")
      .withColumn("n_matches", coalesce(col("n_matches"), lit(0L)))
  }
}
