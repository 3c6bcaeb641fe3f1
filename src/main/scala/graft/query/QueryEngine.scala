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

  /** Export, dispatching on the reference's export-type names
    * (reference: src/worker.ts:268-330 — csv / json / ndjson / parquet /
    * excel). Mirrors the reference's export semantics:
    *
    *  - the active free-text search and sort are applied to the exported
    *    rows (reference: worker.ts:294-317 builds
    *    `SELECT * FROM query_result [WHERE <search>] [ORDER BY ...]`),
    *  - `tab = "schema"` exports the Schema tab itself — the DESCRIBE
    *    result of the opened file (reference: worker.ts:274-284 creates
    *    `schema_result` from `DESCRIBE SELECT * FROM read_xx(path)`).
    */
  def export(exportType: String, path: String,
             search: Option[String] = None,
             sort: Option[SortSpec] = None,
             tab: String = "query"): Unit = {
    import graft.exporters.Exporter
    import org.apache.spark.sql.functions.col
    val base =
      if (tab == "schema") SchemaInspector.describe(data) else queryResult
    val searched = search.filter(_.nonEmpty).fold(base)(Search.search(base, _))
    val frame = sort.fold(searched) { s =>
      searched.orderBy(if (s.ascending) col(s.field).asc else col(s.field).desc)
    }
    exportType.toLowerCase match {
      case "csv" => Exporter.csv(frame, path)
      case "json" => Exporter.json(frame, path)
      case "ndjson" => Exporter.ndjson(frame, path)
      case "parquet" => Exporter.parquet(frame, path)
      case "excel" | "xlsx" => Exporter.excel(frame, path)
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
