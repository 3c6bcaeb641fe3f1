package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver-generated star schema (TESTDATA.md) plus
  * generic file loading by extension, mirroring the reference's
  * read-function dispatch (reference: src/duckdb-backend.ts:152-164).
  *
  * At 100 TB each "table" would be a directory of many parquet files /
  * partitions; `spark.read.parquet(dir)` handles both transparently, so
  * nothing here assumes single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read nanos as long and convert (floor) to micros.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table of a scale-factor dir as a temp view. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Write a table bucketed+sorted by join key into the session catalog.
    * Two tables bucketed the same way join with ZERO shuffle (asserted in
    * PlanSpec) — at 100 TB this turns every recurring fact-fact join on
    * the bucket key into a local sort-merge.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", s"${scratchWarehouse}/$table")
      .saveAsTable(table)

  /** Write partitioned by a derived date column — readers filtering on
    * `dt` scan only matching directories (partition pruning, asserted in
    * PlanSpec).
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("dt", org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col(tsCol)))
      .write.mode("overwrite").partitionBy("dt").parquet(path)

  /** Schema-evolution read: union the schemas of all files in a table
    * dir (columns added over time come back null-filled for old files).
    */
  def openMerged(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** Compact a small-file table directory to `numFiles` files (the
    * perpetual lakehouse maintenance job: file listing + open overhead
    * dominates scans once file count ≫ executor count). Rewrites to a
    * temp dir then swaps, so readers never see a half-written table.
    */
  def compact(spark: SparkSession, dir: String, numFiles: Int): Unit = {
    val tmp = dir + "__compact_tmp"
    spark.read.parquet(dir).repartition(numFiles)
      .write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(dir))
  }

  private def scratchWarehouse: String = {
    val d = "/root/repo/target/scratch/warehouse"
    new java.io.File(d).mkdirs()
    d
  }

  /** Open a file by extension, like the reference dispatches read_parquet /
    * read_csv / read_avro on file type. CSV/JSON get schema inference with
    * headers, matching DuckDB read_csv's auto-detection defaults.
    */
  def open(spark: SparkSession, path: String): DataFrame = {
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    ext match {
      case "csv" | "tsv" =>
        spark.read
          .option("header", "true")
          .option("inferSchema", "true")
          .option("delimiter", if (ext == "tsv") "\t" else ",")
          .csv(path)
      case "json" | "ndjson" | "jsonl" => spark.read.json(path)
      case "avro" => spark.read.format("avro").load(path)
      case _ => spark.read.parquet(path) // parquet/pq/parq default, like reference
    }
  }
}
