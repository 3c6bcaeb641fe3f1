package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType}

/** Timestamp/date rendering for display and export, mirroring the
  * reference's datetime settings (reference: src/backend.ts
  * convertBigIntToString — ISO8601 / RFC2822 / custom pattern, UTC or
  * local; date columns render date-only).
  *
  * Implemented as `date_format` columns so formatting happens inside
  * codegen on the executors, not in a driver loop over results.
  */
object DateTimeFormat {

  val ISO8601 = "ISO8601"
  val RFC2822 = "RFC2822"

  /** Map the reference's format names (and its date-and-time pattern
    * tokens YYYY/DD/mm/ss) onto java.time patterns.
    */
  def pattern(format: String, dateOnly: Boolean): String = format match {
    case ISO8601 => if (dateOnly) "yyyy-MM-dd" else "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
    case RFC2822 => if (dateOnly) "EEE, dd MMM yyyy" else "EEE, dd MMM yyyy HH:mm:ss zzz"
    case custom => custom
      .replace("YYYY", "yyyy").replace("DD", "dd")
      .replace("Z", "XXX")
  }

  /** Format a timestamp/date column; `useUTC=false` renders in the
    * session timezone (the Spark analogue of local time).
    */
  def format(c: Column, dt: DataType, fmt: String = ISO8601, useUTC: Boolean = true): Column = {
    val p = pattern(fmt, dt == DateType)
    val src = if (useUTC || dt == DateType) c
      else from_utc_timestamp(c, java.util.TimeZone.getDefault.getID)
    date_format(src, p)
  }
}
