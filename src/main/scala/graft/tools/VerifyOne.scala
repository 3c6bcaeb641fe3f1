package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the library surface): single-query Verify — dump
  * one `SparkEntry.queries` result to parquet and its oracle SQL next to
  * it, for targeted DuckDB comparison while iterating on an oracle
  * (`tools/selfcheck.py` equivalent for one name; the full Verify run
  * stays the gate of record).
  *
  * Usage: tools/run.sh graft.tools.VerifyOne <name> <sfDir> <outDir>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.sql"), sql)
    }
    spark.stop()
  }
}
