ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vscodeparquetvisualizerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Bench/Verify print a machine-parsed JSON line that must be the LAST
// stdout line even under `sbt runMain`: route forked output straight to
// stdout (instead of sbt's [info]-prefixed logger) and drop the trailing
// [success] banner.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Each forked test JVM gets its OWN round-trip scratch root (@pid expands
// to the JVM pid inside graft.Scratch): parallel test groups — and a test
// run concurrent with graft.Verify — must never share per-query scratch
// dirs (the r17 q58_codecs flake was exactly that collision).
Test / javaOptions +=
  "-Dgraft.scratch.dir=/root/repo/target/test-scratch/rt_@pid"
// With 8 concurrent test JVMs on one 32-core host, each JVM would size
// its GC/JIT/Spark-default thread pools for all 32 CPUs (the first
// parallel run burned 31 CPU-minutes of SYS time in thread churn). Cap
// what each forked JVM believes it owns; Spark task parallelism stays
// the explicit local[4].
Test / javaOptions += "-XX:ActiveProcessorCount=6"

// ---- parallel forked test groups --------------------------------------
// Run sequentially in one forked JVM the suite is ~18 min of wall — the
// driver's verify window stopped fitting it (r17: VERIFY cut off
// mid-suite with zero failures). Suites are packed into N groups
// balanced by their measured durations (r18 -oD timing) and the groups
// run as N CONCURRENT forked JVMs: wall time collapses to the largest
// bin. Process isolation (not in-JVM parallel suites) is deliberate —
// several suites temporarily mutate shared session conf
// (spark.sql.adaptive.enabled, outputTimestampType) and PlanSpec asserts
// plan shapes, so sharing one SparkSession across concurrent suites
// would race; separate JVMs each build their own session and their own
// @pid-scoped scratch root.
val suiteSeconds: Map[String, Double] = Map(
  "SnapshotTableSpec" -> 95, "SnapshotTableIndexCdcMvSpec" -> 95,
  "DedupSpec" -> 85, "TextFunctionsSpec" -> 71, "PqIndexSpec" -> 44,
  "StreamingSpec" -> 36, "NearDupStoreSpec" -> 35, "ApproxSpec" -> 32,
  "SkippingIndexSpec" -> 26, "PaginatorSpec" -> 26, "PlanSpec" -> 26,
  "DedupStoreSpec" -> 24, "EventAnalyticsSpec" -> 21, "CurationSpec" -> 21,
  "ComponentsSpec" -> 20, "IvfIndexSpec" -> 11, "MultimodalSpec" -> 6,
  "TableMaintenanceSpec" -> 5, "LayoutSpec" -> 5, "BpeSpec" -> 5,
)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val nGroups = 6
  // greedy longest-first bin pack; suites without a measurement assume 8s
  val sorted = tests.sortBy(t =>
    -suiteSeconds.getOrElse(t.name.stripPrefix("graft."), 8.0))
  val bins = Vector.fill(nGroups)(
    scala.collection.mutable.ArrayBuffer.empty[TestDefinition])
  val loads = Array.fill(nGroups)(0.0)
  sorted.foreach { t =>
    val i = loads.indices.minBy(loads)
    bins(i) += t
    loads(i) += suiteSeconds.getOrElse(t.name.stripPrefix("graft."), 8.0)
  }
  bins.zipWithIndex.filter(_._1.nonEmpty).map { case (ts, i) =>
    Tests.Group(s"g$i", ts.toSeq,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }
}
// default caps forked test groups at 1 — allow the bins to actually run
// concurrently (8 × local[4] sessions on a 32-core host)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 8),
  Tags.limitAll(16),
)
