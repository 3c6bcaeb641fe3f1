package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all suites (Test/fork runs them in one JVM). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  def scratch(name: String): String = {
    val d = s"/root/repo/target/test-scratch/$name"
    new java.io.File(d).mkdirs()
    d
  }
}
