package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H}
import graft.functions.expr.GraftFunctions
import graft.sources.Tables

/** Stage timing for the ngram-Jaccard PPJoin plan (dev tool). */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val threshold = 0.5
    val docsRaw = Tables.load(spark, sfDir, "documents")
    timed("docs count")(println("  n=" + docsRaw.count()))
    val docs = docsRaw.select(col("doc_id").as("id"),
      H.shingles(col("text"), 3).as("sh"))
      .withColumn("sz", size(col("sh")))
      .filter(col("sz") > 0)
    timed("shingle")(println("  sum sz=" + docs.agg(sum("sz")).first()))
    val inv = docs.select(col("id"), col("sz"), explode(col("sh")).as("shingle"))
    timed("inv")(println("  n=" + inv.count()))
    val dfreq = inv.groupBy("shingle").agg(count(lit(1)).as("docfreq"))
      .filter(col("docfreq") >= 2)
    timed("dfreq")(println("  n=" + dfreq.count()))
    val joined = inv.join(dfreq, "shingle")
    timed("inv join dfreq")(println("  n=" + joined.count()))
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("docfreq").asc, col("shingle").asc)
    val prefixW = joined
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= col("sz") - ceil(col("sz") * threshold) + 1)
      .select("shingle", "id", "sz")
    timed("prefix window")(println("  n=" + prefixW.count()))
    // alternative: within-row prefix via collect_list + array_sort + slice
    val prefixR = joined
      .groupBy("id").agg(any_value(col("sz")).as("sz"),
        collect_list(struct(col("docfreq"), col("shingle"))).as("cl"))
      .withColumn("pref", slice(array_sort(col("cl")), lit(1),
        (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")))
      .select(col("id"), col("sz"), explode(col("pref.shingle")).as("shingle"))
    timed("prefix rowwise")(println("  n=" + prefixR.count()))

    def pairsFrom(prefix: org.apache.spark.sql.DataFrame, tag: String) = {
      val a = prefix.select(col("shingle"), col("id").as("a"), col("sz").as("a_sz"))
      val b = prefix.select(col("shingle"), col("id").as("b"), col("sz").as("b_sz"))
      val candidates = a.join(b, Seq("shingle"))
        .filter(col("a") < col("b"))
        .filter(col("b_sz") >= col("a_sz") * threshold &&
          col("a_sz") >= col("b_sz") * threshold)
        .select("a", "b").distinct()
      timed(s"candidates $tag")(println("  n=" + candidates.count()))
      val verified = candidates
        .join(docs.select(col("id").as("a"), col("sh").as("a_sh"), col("sz").as("a_sz")), "a")
        .join(docs.select(col("id").as("b"), col("sh").as("b_sh"), col("sz").as("b_sz")), "b")
        .withColumn("inter", GraftFunctions.sortedIntersectSize(col("a_sh"), col("b_sh")).cast("double"))
        .withColumn("jaccard", col("inter") / (col("a_sz") + col("b_sz") - col("inter")))
        .filter(col("jaccard") >= threshold)
      timed(s"verify $tag")(println("  n=" + verified.count()))
    }
    pairsFrom(prefixW, "window")
    pairsFrom(prefixR, "rowwise")
    spark.stop()
  }
}
