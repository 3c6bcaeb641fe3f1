package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the library surface): run ONE SparkEntry query
  * and print every Spark job it triggers — wall time, callsite, stage
  * count — so a multi-write operator (store builds, snapshot upserts)
  * shows where its seconds actually go. Guide §1: measure first,
  * per-operator, before touching anything.
  *
  * Usage: tools/run.sh graft.tools.JobProfile <sfDir> <queryName> [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length >= 3) args(2).toInt else 1
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

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String, Int)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = e.stageInfos.lastOption.map { si =>
          si.details.linesIterator.find(l => l.contains("graft."))
            .map(_.trim).getOrElse(si.name)
        }.getOrElse("?")
        starts.put(e.jobId, (System.nanoTime(), site, e.stageInfos.size))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, site, nStages) =>
          rows.add((e.jobId, (System.nanoTime() - t0) / 1e9, site, nStages))
        }
      }
    }
    // warmup (codegen/JIT) outside the profiled rep
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    graft.operators.Dedup.releaseCaches()
    spark.catalog.clearCache()
    (0 until reps).foreach { r =>
      rows.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200) // let late JobEnd events drain
      import scala.jdk.CollectionConverters._
      val all = rows.asScala.toSeq.sortBy(_._1)
      println(f"[jobprofile] $name rep=$r total=$total%.3f s, jobs=${all.size}")
      all.foreach { case (id, sec, site, nStages) =>
        println(f"[jobprofile]   job=$id%4d $sec%7.3f s stages=$nStages%2d  $site")
      }
      val bySite = all.groupBy(_._3).view
        .mapValues(js => (js.size, js.map(_._2).sum)).toSeq.sortBy(-_._2._2)
      println(f"[jobprofile] by callsite:")
      bySite.foreach { case (site, (n, sec)) =>
        println(f"[jobprofile]   $sec%7.3f s  n=$n%3d  $site")
      }
      val jobSum = all.map(_._2).sum
      println(f"[jobprofile] job-covered=$jobSum%.3f s, driver/planning gap=${total - jobSum}%.3f s")
      graft.operators.Dedup.releaseCaches()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
