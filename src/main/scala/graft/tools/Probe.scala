package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H}
import graft.functions.expr.GraftFunctions
import graft.sources.Tables

/** Ad-hoc stage timing / cardinality probe (dev tool, not part of the
  * driver contract).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // If launched with -Dspark.sql.extensions=graft.GraftExtensions, the
    // graft SQL functions resolve; demonstrate the deploy-style SQL path.
    try {
      Tables.load(spark, sfDir, "documents").createOrReplaceTempView("documents")
      val r = spark.sql(
        """SELECT doc_id, graft_simhash64(graft_word_shingles(text, 1)) AS sig,
          |       size(graft_word_shingles(text, 3)) AS n_shingles
          |FROM documents ORDER BY doc_id LIMIT 3""".stripMargin).collect()
      println("[probe] extensions SQL: " + r.mkString("; "))
    } catch {
      case e: Exception => println("[probe] extensions SQL unavailable: " + e.getMessage.linesIterator.next())
    }

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // drive the streaming-dedup pipeline end-to-end (replayed source ->
    // watermarked dropDuplicates -> parquet sink)
    if (sys.env.contains("PROBE_STREAMING")) {
      val src = "/root/repo/target/scratch/probe_dup_events"
      val out = "/root/repo/target/scratch/probe_dedup_out"
      val ck = "/root/repo/target/scratch/probe_dedup_ck"
      Seq(out, ck).foreach { d =>
        def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
        rm(new java.io.File(d))
      }
      val ev = Tables.load(spark, sfDir, "events")
      ev.union(ev).write.mode("overwrite").parquet(src)
      val q = graft.streaming.EventStreams.streamingDedup(
        spark.readStream.schema(spark.read.parquet(src).schema).parquet(src), Seq("event_id"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      println(s"[probe] streaming dedup: in=${ev.count() * 2} out=${spark.read.parquet(out).count()}")
      spark.stop()
      return
    }

    val docsRaw = Tables.load(spark, sfDir, "documents")
    timed("docs count")(println("  n=" + docsRaw.count()))

    timed("tokens only")(println("  n=" + docsRaw.select(
      graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .agg(sum(size(col("t")))).first()))
    timed("shingles only")(println("  n=" + docsRaw.select(
      H.shingles(col("text"), 3).as("sh")).agg(sum(size(col("sh")))).first()))
    timed("shingles sorted")(println("  n=" + docsRaw.select(
      array_sort(H.shingles(col("text"), 3)).as("sh")).agg(sum(size(col("sh")))).first()))
    timed("sig only")(println("  n=" + docsRaw.select(
      GraftFunctions.minhashSignature(H.shingles(col("text"), 3), 64).as("sig"))
      .filter(element_at(col("sig"), 1) =!= 0L).count()))
    timed("bandkeys full")(println("  n=" + docsRaw.select(
      H.lshBandKeys(GraftFunctions.minhashSignature(H.shingles(col("text"), 3), 64), 16, 4).as("bk"))
      .select(explode(col("bk")).as("b")).filter(col("b.key") =!= 0L).count()))

    val docs = docsRaw.select(col("doc_id").as("id"),
      H.shingles(col("text"), 3).as("sh"))
      .withColumn("sz", size(col("sh")))
      .withColumn("sig", GraftFunctions.minhashSignature(col("sh"), 64))
    timed("shingle+sig")(println("  n=" + docs.count()))

    val banded = docs.select(col("id"), explode(H.lshBandKeys(col("sig"), 16, 4)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    timed("banding")(println("  n=" + banded.count()))

    val smallBuckets = banded.groupBy("band", "key").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz").between(2, 1000))
    timed("bucket sizes")(println("  buckets=" + smallBuckets.count()
      + " maxsz=" + smallBuckets.agg(max("bsz")).first().getLong(0)))

    val sized = banded.join(smallBuckets.select("band", "key"), Seq("band", "key"), "left_semi")
    val a = sized.select(col("band"), col("key"), col("id").as("a"))
    val b = sized.select(col("band"), col("key"), col("id").as("b"))
    val rawPairs = a.join(b, Seq("band", "key")).filter(col("a") < col("b"))
    timed("raw pairs")(println("  n=" + rawPairs.count()))
    val pairs = rawPairs.select("a", "b").distinct()
    timed("distinct pairs")(println("  n=" + pairs.count()))

    val verified = pairs
      .join(docs.select(col("id").as("a"), col("sh").as("a_sh"), col("sz").as("a_sz")), "a")
      .join(docs.select(col("id").as("b"), col("sh").as("b_sh"), col("sz").as("b_sz")), "b")
      .withColumn("inter", GraftFunctions.sortedIntersectSize(col("a_sh"), col("b_sh")).cast("double"))
      .withColumn("jaccard", col("inter") / (col("a_sz") + col("b_sz") - col("inter")))
      .filter(col("jaccard") >= 0.8)
    timed("verify")(println("  n=" + verified.count()))

    spark.stop()
  }
}
