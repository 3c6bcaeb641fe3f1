package graft.query

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Schema-as-table inspection, mirroring the reference's Schema tab
  * (reference: src/duckdb-backend.ts initializeSchema runs
  * `DESCRIBE SELECT * FROM query_result`; src/duckdb-schema-converter.ts
  * renders nested types). Emits DuckDB-style type strings so the surface
  * matches what reference users see.
  */
object SchemaInspector {

  /** DuckDB-style rendering of a Spark DataType
    * (cf. reference src/duckdb-schema-converter.ts parseTypeString, which
    * parses exactly these strings back into arrow types).
    */
  def duckTypeName(dt: DataType): String = dt match {
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case StringType => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case BinaryType => "BLOB"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP WITH TIME ZONE"
    case TimestampNTZType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case ArrayType(e, _) => s"${duckTypeName(e)}[]"
    case MapType(k, v, _) => s"MAP(${duckTypeName(k)}, ${duckTypeName(v)})"
    case StructType(fields) =>
      fields.map(f => s"""\"${f.name}\" ${duckTypeName(f.dataType)}""").mkString("STRUCT(", ", ", ")")
    case other => other.sql
  }

  /** One row per column: (column_name, column_type, null) — the DESCRIBE
    * shape the reference's schema tab paginates over.
    */
  def describe(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rows = df.schema.fields.toSeq.map { f =>
      Row(f.name, duckTypeName(f.dataType), if (f.nullable) "YES" else "NO")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("column_name", StringType, nullable = false),
        StructField("column_type", StringType, nullable = false),
        StructField("null", StringType, nullable = false))))
  }

  /** Flattened leaf paths (a.b.c; array elements as a[].b, map entries as
    * m.key / m.value) with types — the "struct tree" view the reference
    * shows when clicking a nested schema cell. Like the reference's tree
    * (duckdb-schema-converter.ts:201-206 renders LIST element fields as
    * expandable children, :287-306 parses LIST/MAP element types), the
    * recursion continues through arrays and maps whose elements carry
    * further structure; scalar-element arrays stay one leaf (`T[]`),
    * matching the flat DESCRIBE rendering.
    */
  def leafPaths(schema: StructType, prefix: String = ""): Seq[(String, String)] = {
    def nested(dt: DataType): Boolean = dt match {
      case _: StructType | _: MapType => true
      case ArrayType(e, _) => nested(e)
      case _ => false
    }
    def expand(path: String, dt: DataType): Seq[(String, String)] = dt match {
      case s: StructType =>
        s.fields.toSeq.flatMap(f => expand(s"$path.${f.name}", f.dataType))
      case ArrayType(e, _) if nested(e) => expand(s"$path[]", e)
      case MapType(k, v, _) =>
        expand(s"$path.key", k) ++ expand(s"$path.value", v)
      case leaf => Seq(path -> duckTypeName(leaf))
    }
    schema.fields.toSeq.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      expand(path, f.dataType)
    }
  }
}
