package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys. AQE's skew-join handles sort-merge skew
  * at runtime; these helpers cover the cases AQE can't: skewed
  * aggregations and broadcast-infeasible skewed joins, by spreading one
  * hot key over `salts` synthetic sub-keys.
  */
object Salting {

  /** Deterministic-per-row salt in [0, salts): hashed from the given
    * distinct-ish column so re-runs place rows identically.
    */
  def salt(c: Column, salts: Int): Column = pmod(xxhash64(c), lit(salts.toLong))

  /** Two-phase skew-safe aggregation: sum/count per (key, salt) — spreads
    * a hot key over `salts` reducers — then a cheap final combine over the
    * tiny (key, salt) space. Result identical to a direct groupBy (sums
    * are decimal-exact, order-free).
    */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
      saltSrc: String, salts: Int = 16): DataFrame =
    df.withColumn("_salt", salt(col(saltSrc), salts))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("_s"), count(lit(1)).as("_c"))
      .groupBy(keyCol)
      .agg(sum("_s").cast("double").as("total"), sum("_c").as("cnt"))

  /** Skewed equi-join: the big (skewed) side gets a per-row salt, the
    * small side is replicated ×salts; joining on (key, salt) splits each
    * hot key's rows across `salts` tasks. Row-for-row equivalent to the
    * direct join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltSrc: String, salts: Int = 16): DataFrame = {
    val salted = big.withColumn("_salt", salt(col(saltSrc), salts))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated,
      salted(bigKey) === replicated(smallKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
