package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for every SparkEntry query (or a
  * comma-separated subset) to <outDir>/<name>.txt — the optimization
  * round's plan-audit input and the judge's plan-claim evidence.
  *
  * Usage: tools/run.sh graft.tools.PlanDump <sfDir> <outDir> [names]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only: Option[Set[String]] =
      if (args.length >= 3) Some(args(2).split(",").map(_.trim).toSet) else None
    val spark = graft.GraftExtensions.withSessionDefaults(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // match graft.Bench's session so dumped plans are the bench's plans
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries
      .filter(kv => only.forall(_.contains(kv._1)))
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          // GRAFT_EXECUTED_PLAN=1: run the query first and dump the
          // POST-EXECUTION plan, so AQE's runtime rewrites (coalesced
          // reads, SMJ→SHJ conversions) are visible — explain() before
          // execution only shows the initial plan (guide §7.2)
          val plan =
            if (sys.env.get("GRAFT_EXECUTED_PLAN").contains("1")) {
              // collect() executes THIS Dataset's queryExecution (count()
              // would plan a separate aggregate), so AdaptiveSparkPlan
              // prints its FINAL, runtime-rewritten tree afterwards
              df.collect()
              df.queryExecution.executedPlan.toString
            } else df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/$name.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
        graft.operators.Dedup.releaseCaches()
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
