package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Free-text search within a result set, mirroring the reference's
  * behavior (reference: src/worker.ts:136-165): every column is matched
  * with `CAST(col AS TEXT) LIKE '%s%'`, OR-ed together; string columns
  * skip the cast.
  *
  * Compiles to ONE codegen'd filter over the scan — no shuffle, no
  * collect — so it runs at full scan throughput on any cluster size.
  */
object Search {

  /** LIKE-escape the user string (literal match, as in the reference). */
  private def likePattern(s: String): String =
    "%" + s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_") + "%"

  def predicate(df: DataFrame, searchString: String): Column = {
    val pat = likePattern(searchString)
    val preds = df.schema.fields.map { f =>
      val c = f.dataType match {
        case StringType => col(f.name)
        // Complex values are matched on their JSON rendering, like the
        // reference matches the stringified cell content.
        case _: StructType | _: ArrayType | _: MapType => to_json(col(f.name))
        case _ => col(f.name).cast(StringType)
      }
      c.like(pat)
    }
    preds.reduceOption(_ || _).getOrElse(lit(false))
  }

  def search(df: DataFrame, searchString: String): DataFrame =
    if (searchString == null || searchString.isEmpty) df
    else df.filter(predicate(df, searchString))
}
