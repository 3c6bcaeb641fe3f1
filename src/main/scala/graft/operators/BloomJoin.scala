package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-pruned join: build a bloom filter over the (filtered) dimension
  * keys with a DISTRIBUTED aggregate, then drop fact rows that cannot
  * match BEFORE the join's shuffle — the runtime-filter pattern Spark's
  * own InjectRuntimeFilter applies when its thresholds allow, exposed as
  * an explicit operator for pipelines that know their dim side is
  * selective (at 100 TB, pruning the fact scan ahead of the exchange is
  * the difference between shuffling 100 TB and shuffling the ~match set).
  *
  * The sketch is built by `BloomFilterAggregate` on the executors (only
  * the compact bitmap reaches the driver), then rides into the fact-side
  * filter as a literal probed by the codegen'd `might_contain` — false
  * positives are removed by the exact join, so the result is identical
  * to the plain join.
  */
object BloomJoin {

  /** Serialized bloom filter of `dim[keyCol]`, built distributed. Null
    * when the dim side is empty.
    */
  def buildBloom(dim: DataFrame, keyCol: String, expectedItems: Long,
      numBits: Long): Array[Byte] = {
    val hashed = new XxHash64(Seq(ColumnBridge.expression(col(keyCol))))
    val agg = new BloomFilterAggregate(hashed,
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    dim.agg(ColumnBridge.column(agg).as("bf")).head.getAs[Array[Byte]](0)
  }

  /** might_contain probe of a pre-built sketch against a key column. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Inner join with the fact side pre-pruned by a bloom of the dim keys.
    * Result is exactly `fact JOIN dim` — the bloom only removes rows the
    * join would drop anyway.
    */
  def prunedJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    // XxHash64 hashes the PHYSICAL type: 5 (int) and 5L (long) hash
    // differently even though the join coerces them equal, so a type
    // mismatch would make the probe silently prune every true match
    require(fact.schema(factKey).dataType == dim.schema(dimKey).dataType,
      s"bloom join keys must have identical types; got " +
        s"${fact.schema(factKey).dataType} vs ${dim.schema(dimKey).dataType} " +
        "(cast one side first)")
    // standard bloom sizing: m = -n ln(p) / (ln 2)^2
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bloom = buildBloom(dim, dimKey, expectedItems, numBits)
    val pruned =
      if (bloom == null) fact.filter(lit(false)) // empty dim: nothing joins
      else fact.filter(mightContain(bloom, col(factKey)))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
