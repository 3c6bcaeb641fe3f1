package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.sources.Tables

/** The reference's query workflow as a Spark-native engine
  * (reference: src/worker.ts QueryHelper + README `defaultQuery`):
  *
  *  - a file is "opened" and exposed to user SQL as `data` (the reference
  *    rewrites `FROM data` to `read_parquet('path')`; we register a temp
  *    view, which keeps the rewrite in the catalog instead of the string),
  *  - running a query caches the result as `query_result` so paging,
  *    searching and exporting re-use it without re-running the user SQL
  *    (the reference materializes a DuckDB `query_result` table;
  *    reference: src/worker.ts:294-310),
  *  - schema-driven column autocomplete
  *    (reference: tabular-document-editor.ts suggestions).
  *
  * Scale note: `persist(MEMORY_AND_DISK)` spills gracefully; on a cluster
  * the cached result is partition-distributed, so page N touches only the
  * partitions AQE needs for the offset/limit.
  */
final class QueryEngine(val spark: SparkSession, val path: String) {

  val data: DataFrame = Tables.open(spark, path)
  data.createOrReplaceTempView("data")

  private var cached: Option[DataFrame] = None

  def defaultQuery: String = "SELECT *\nFROM data\nLIMIT 1000"

  /** Run user SQL; result becomes the new `query_result`. */
  def query(sql: String): DataFrame = {
    cached.foreach(_.unpersist(blocking = false))
    val out = spark.sql(sql).persist(StorageLevel.MEMORY_AND_DISK)
    out.createOrReplaceTempView("query_result")
    cached = Some(out)
    out
  }

  def queryResult: DataFrame = cached.getOrElse(query(defaultQuery))

  /** Paginator over the current query result. */
  def paginator: Paginator = new Paginator(queryResult)

  /** Paginator over the raw file (the reference's Data tab pages the file
    * directly; reference: src/duckdb-paginator.ts readFromFile).
    */
  def dataPaginator: Paginator = new Paginator(data)

  def schema: DataFrame = SchemaInspector.describe(queryResult)

  def metadata: DataFrame = MetadataInspector.fileMetadata(spark, path)

  /** Column-name autocomplete: case-insensitive prefix > substring rank
    * (reference: tabular-document-editor.ts editor completions).
    */
  def suggestColumns(prefix: String): Seq[String] = {
    val p = prefix.toLowerCase
    val cols = data.columns.toSeq
    if (p.isEmpty) cols
    else {
      val pre = cols.filter(_.toLowerCase.startsWith(p))
      val sub = cols.filter(c => !c.toLowerCase.startsWith(p) && c.toLowerCase.contains(p))
      pre ++ sub
    }
  }

  /** Export the current query result, dispatching on the reference's
    * export-type names (reference: src/worker.ts:268-330 — csv / json /
    * ndjson / parquet / excel).
    */
  def export(exportType: String, path: String): Unit = {
    import graft.exporters.Exporter
    exportType.toLowerCase match {
      case "csv" => Exporter.csv(queryResult, path)
      case "json" => Exporter.json(queryResult, path)
      case "ndjson" => Exporter.ndjson(queryResult, path)
      case "parquet" => Exporter.parquet(queryResult, path)
      case "excel" | "xlsx" => Exporter.excel(queryResult, path)
      case other => throw new IllegalArgumentException(s"Unsupported export type: $other")
    }
  }

  /** Copy-to-clipboard rendering of one result page (reference copy
    * button): TSV text of the requested page.
    */
  def copyPage(req: PageRequest): String =
    graft.exporters.Exporter.toTsvString(paginator.page(req))

  def close(): Unit = {
    cached.foreach(_.unpersist(blocking = false))
    cached = None
  }
}
