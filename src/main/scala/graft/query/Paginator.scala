package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sort direction + field, as the reference models it
  * (reference: src/paginator.ts:1-12 QueryObject/SortObject).
  */
final case class SortSpec(field: String, ascending: Boolean = true)

/** One page request. `pageSize=None` means "all" (reference page size
  * `all`); `search` applies the free-text filter before paging.
  */
final case class PageRequest(
    pageNumber: Int = 1,
    pageSize: Option[Int] = Some(20),
    sort: Option[SortSpec] = None,
    search: Option[String] = None)

/** Scalable pagination over any DataFrame, mirroring the reference's
  * paginator semantics (reference: src/duckdb-paginator.ts:29-60 builds
  * `SELECT * FROM src [ORDER BY f dir] LIMIT n OFFSET m`) as a Spark plan:
  * filter → global sort → offset → limit. No driver-side collect; Spark's
  * `CollectLimit`/`GlobalLimit` with AQE prunes the sort to the pages
  * needed, and the source DataFrame can be cached by the caller for
  * repeated paging (QueryEngine does this for query results).
  *
  * Pages are made stable by appending the remaining columns as
  * tiebreakers: the reference inherits DuckDB's stable single-file scan
  * order, which a distributed engine must instead guarantee by total
  * ordering.
  */
final class Paginator(df: DataFrame) {

  def totalItems: Long = df.count()

  def totalPages(pageSize: Option[Int]): Long = pageSize match {
    case None => 1L
    case Some(s) => math.ceil(totalItems.toDouble / s).toLong
  }

  def page(req: PageRequest): DataFrame = {
    require(req.pageNumber >= 1, "Page number cannot be 0")
    val searched = req.search.fold(df)(s => Search.search(df, s))
    val sorted = req.sort match {
      case Some(SortSpec(f, asc)) =>
        val primary = if (asc) col(f).asc else col(f).desc
        val ties = searched.columns.filter(_ != f).map(col(_).asc)
        searched.orderBy(primary +: ties.toSeq: _*)
      case None => searched
    }
    req.pageSize match {
      case Some(s) => sorted.offset((req.pageNumber - 1) * s).limit(s)
      case None => sorted
    }
  }

  def firstPage(req: PageRequest): DataFrame = page(req.copy(pageNumber = 1))
  def lastPage(req: PageRequest): DataFrame =
    page(req.copy(pageNumber = totalPages(req.pageSize).toInt.max(1)))
  def nextPage(req: PageRequest): DataFrame = {
    val tp = totalPages(req.pageSize)
    require(req.pageNumber <= tp, "No more pages available.")
    page(req)
  }
  def gotoPage(req: PageRequest): DataFrame = {
    val tp = totalPages(req.pageSize)
    require(req.pageNumber >= 1 && req.pageNumber <= tp, "Invalid page number.")
    page(req)
  }
}
