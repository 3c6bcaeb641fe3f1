package graft.exporters

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Query-result export, mirroring the reference's export menu
  * (reference: src/worker.ts:268-430 — csv / json / ndjson / parquet /
  * excel). Every format except Excel is a distributed `df.write` (scales
  * to any result size); Excel is an inherently single-file driver-side
  * format, streamed row-by-row via `toLocalIterator` with the same
  * unsupported-column filtering the reference applies
  * (reference: src/worker.ts:346-396 drops LIST/ARRAY/DECIMAL for Excel).
  */
object Exporter {

  /** Distributed CSV; complex columns are JSON-encoded strings, matching
    * the reference's stringified cell rendering.
    */
  def csv(df: DataFrame, path: String): Unit =
    stringifyComplex(df).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  /** ndJSON — one JSON object per line (Spark's native JSON sink). */
  def ndjson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** JSON array (the reference's `json` mode): each row rendered with
    * to_json, lines joined into one top-level array. Distributed render;
    * only the final concatenation is single-stream (inherent to the
    * format — a single JSON array has one root).
    */
  def json(df: DataFrame, path: String): Unit = {
    val rendered = df.select(to_json(struct(df.columns.toSeq.map(col): _*)).as("j"))
    val it = rendered.toLocalIterator()
    // explicit UTF-8: FileWriter would use the platform charset and corrupt
    // non-ASCII values on non-UTF-8 locales
    val out = new java.io.PrintWriter(new java.io.BufferedWriter(
      java.nio.file.Files.newBufferedWriter(java.nio.file.Paths.get(path),
        java.nio.charset.StandardCharsets.UTF_8), 1 << 20))
    try {
      out.print("[")
      var first = true
      while (it.hasNext) {
        if (!first) out.print(",")
        out.print(it.next().getString(0))
        first = false
      }
      out.print("]")
    } finally out.close()
  }

  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Excel .xlsx. Mirrors the reference's Excel column policy
    * (reference: src/worker.ts:346-396): LIST/ARRAY/DECIMAL columns are
    * dropped, STRUCT columns are kept as their JSON rendering (worker.ts
    * `TO_JSON("col")`); maps — which Spark renders like structs — get the
    * same JSON treatment. Row cap guards the xlsx hard limit.
    */
  def excel(df: DataFrame, path: String, maxRows: Int = 1048575): Unit = {
    val kept = df.schema.fields.flatMap { f =>
      f.dataType match {
        case _: ArrayType | _: DecimalType => None // reference drops these
        case _: StructType | _: MapType => Some(to_json(col(f.name)).as(f.name))
        case _ => Some(col(f.name))
      }
    }
    require(kept.nonEmpty,
      "No supported columns found for Excel export. All columns contain unsupported data types (LIST, ARRAY, DECIMAL).")
    val slim = df.select(kept.toSeq: _*).limit(maxRows)
    XlsxWriter.write(slim, path)
  }

  /** Page-to-clipboard rendering (reference copy button): TSV text.
    * Driver-side by nature (it builds one String); `maxRows` guards
    * against an unbounded frame being collected — a clipboard page is
    * small, so the default cap is generous.
    */
  def toTsvString(df: DataFrame, maxRows: Int = 100000): String = {
    val sb = new StringBuilder
    sb.append(df.columns.mkString("\t")).append('\n')
    val str = stringifyComplex(df.limit(maxRows))
    str.collect().foreach { r =>
      sb.append((0 until r.length).map(i => if (r.isNullAt(i)) "" else String.valueOf(r.get(i))).mkString("\t")).append('\n')
    }
    sb.result()
  }

  /** Render struct/array/map columns as JSON strings (reference:
    * src/backend.ts convertObjectsToJSONStrings).
    */
  def stringifyComplex(df: DataFrame): DataFrame =
    df.select(df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }: _*)
}
