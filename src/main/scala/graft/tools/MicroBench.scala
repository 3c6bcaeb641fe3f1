package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the library surface): isolated min-of-N timing
  * for a handful of `SparkEntry.queries` names — outlier re-adjudication
  * on a host with intermittent external load, without paying a full
  * Bench sweep. The full Bench run stays the artifact of record; this
  * answers "is that one number contention or code".
  *
  * Usage: tools/run.sh graft.tools.MicroBench <sfDir> <name>[,name...] [reps]
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length >= 3) args(2).toInt else 3
    val spark = graft.GraftExtensions.withSessionDefaults(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.all.foreach(n =>
      graft.sources.Tables.load(spark, sfDir, n).count())
    names.foreach { n => // warmup: codegen/JIT outside the timed reps
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      graft.operators.Dedup.releaseCaches()
      spark.catalog.clearCache()
    }
    names.foreach { n =>
      var best = Double.MaxValue
      (0 until reps).foreach { _ =>
        graft.operators.Dedup.releaseCaches()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[micro] $n%-24s $best%7.3f s (min of $reps)")
    }
    spark.stop()
  }
}
