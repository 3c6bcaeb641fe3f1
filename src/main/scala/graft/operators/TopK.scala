package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-stage per-key top-k: partition-local top-k first, then a final
  * top-k over the survivors.
  *
  * A single `row_number() over (partition by key)` funnels EVERY
  * candidate row for one key through one task — fine at test scale, an
  * OOM/straggler when one query's candidates are terabytes. Instead:
  *
  *  1. salt each row with its input partition id and take the top-k
  *     within every (key, salt) group — parallelism scales with the
  *     input partitioning, no configuration;
  *  2. the final per-key window then ranks at most k·P survivors per
  *     key (P = input partitions), never the full candidate set.
  *
  * Top-k under a TOTAL order (callers must tiebreak, e.g. by id) is
  * associative, so the result is byte-identical to the one-window plan —
  * the ANN driver oracles and recall specs pin this.
  */
object TopK {

  /** Rank rows per `keyCol` by `order` (which MUST be a total order —
    * include a unique tiebreaker) and keep `rankCol` <= k.
    */
  def perKey(df: DataFrame, keyCol: String, order: Seq[Column], k: Int,
      rankCol: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val salt = "__graft_topk_salt"
    val partialRk = "__graft_topk_rk"
    // spark_partition_id is evaluated in the map stage (a Project), so the
    // salt is the physical input partition: co-located rows share a salt
    // and every input partition contributes at most k survivors per key
    val partial = Window.partitionBy(col(keyCol), col(salt)).orderBy(order: _*)
    val survivors = df.withColumn(salt, spark_partition_id())
      .withColumn(partialRk, row_number().over(partial))
      .filter(col(partialRk) <= k)
      .drop(salt, partialRk)
    val fin = Window.partitionBy(keyCol).orderBy(order: _*)
    survivors.withColumn(rankCol, row_number().over(fin))
      .filter(col(rankCol) <= k)
  }
}
