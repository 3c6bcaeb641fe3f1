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

/** Opaque position of the LAST row of a page in its total order:
  * the user sort value (None when the request had no sort) plus the
  * synthetic tiebreaker. Produced by [[Paginator.cursorOfPage]], consumed
  * by [[Paginator.pageAfter]] — the keyset (seek) handle that makes
  * "next page" O(page) at any depth.
  */
final case class PageCursor(sortValue: Option[Any], rid: Long)

/** Scalable pagination over any DataFrame, mirroring the reference's
  * paginator semantics (reference: src/duckdb-paginator.ts:29-60 builds
  * `SELECT * FROM src [ORDER BY f dir] LIMIT n OFFSET m`) as a Spark plan:
  * filter → global sort → offset → limit. No driver-side collect; a
  * sorted page compiles to `TakeOrderedAndProject` (per-partition top-K,
  * not a full shuffle sort), and the source DataFrame can be cached by
  * the caller for repeated paging (QueryEngine does this for query
  * results).
  *
  * Pages are made stable by ONE synthetic tiebreaker — xxhash64 over all
  * columns — instead of sorting by every remaining column: the reference
  * inherits DuckDB's stable single-file scan order, which a distributed
  * engine must instead guarantee by a total order, and on a wide table a
  * single long comparison per tie is the scale-safe way to get one. A
  * value-derived hash is deterministic across jobs and partitionings
  * (unlike monotonically_increasing_id, which shifts with shuffle fetch
  * order on uncached inputs); rows identical in every column share a
  * hash, and any order among full duplicates is content-identical.
  */
final class Paginator(df: DataFrame) {

  // the synthetic tiebreaker would silently replace (and then drop) a
  // user column of the same name, and the hash would cover the wrong data
  require(!df.columns.contains(Paginator.RID),
    s"input already has a '${Paginator.RID}' column — rename it before paging")

  private val withRid = {
    // maps aren't hashable (or orderable) in Spark — leave them out of
    // the tiebreaker; ties then only collapse rows equal in all other
    // columns, which a map-keyed UI page can live with
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    df.withColumn(Paginator.RID,
      if (cols.isEmpty) lit(0L) else xxhash64(cols.toSeq: _*))
  }

  private def normalized(search: Option[String]): Option[String] =
    search.filter(s => s != null && s.nonEmpty)

  /** Item count with the free-text search applied — the bound every page
    * navigation validates against, mirroring the reference's
    * `query_result_filtered` flow (reference: src/worker.ts:134-180
    * materializes the searched result and pages/counts THAT).
    */
  def totalItems(search: Option[String]): Long =
    normalized(search).fold(df)(s => df.filter(Search.predicate(df, s))).count()

  def totalItems: Long = totalItems(None)

  def totalPages(pageSize: Option[Int], search: Option[String]): Long = pageSize match {
    case None => 1L
    case Some(s) => math.ceil(totalItems(search).toDouble / s).toLong
  }

  def totalPages(pageSize: Option[Int]): Long = totalPages(pageSize, None)

  def page(req: PageRequest): DataFrame = {
    require(req.pageNumber >= 1, "Page number cannot be 0")
    // search predicate is built from the ORIGINAL columns so the synthetic
    // row id can't produce phantom matches
    val searched = normalized(req.search)
      .fold(withRid)(s => withRid.filter(Search.predicate(df, s)))
    val sorted = req.sort match {
      case Some(SortSpec(f, asc)) =>
        val primary = if (asc) col(f).asc else col(f).desc
        searched.orderBy(primary, col(Paginator.RID).asc)
      case None =>
        // no user sort: a deterministic hash total order (NOT the file's
        // scan order — a distributed engine has no stable natural order)
        searched.orderBy(col(Paginator.RID).asc)
    }
    val paged = req.pageSize match {
      case Some(s) => sorted.offset((req.pageNumber - 1) * s).limit(s)
      case None => sorted
    }
    paged.drop(Paginator.RID)
  }

  // ---- keyset (seek) pagination ----------------------------------------
  //
  // page() above mirrors the reference's LIMIT/OFFSET semantics
  // (duckdb-paginator.ts:29-60), whose cost at page N is offset+limit rows
  // per partition — fine for a UI hopping around small results, wrong for
  // walking deep into 100 TB. The seek form replaces the offset with a
  // FILTER on the last-seen (sort value, tiebreaker): the predicate pushes
  // into the scan and the page compiles to a plain top-k
  // (TakeOrderedAndProject over the filtered rows), so "next page" costs
  // O(page) at ANY depth. Spec'd page-equal to the offset path and
  // plan-asserted in PlanSpec.
  //
  // Null sort values are not seekable (a null cursor comparison silently
  // drops rows): pageAfter requires them absent from the sort column —
  // the standard keyset contract (make the sort key NOT NULL or coalesce).

  private def searched(search: Option[String]): DataFrame =
    normalized(search).fold(withRid)(s => withRid.filter(Search.predicate(df, s)))

  /** Rows strictly after `cursor` in the (sort, rid) total order. The
    * exact condition is a disjunction involving the derived tiebreaker
    * (not scannable), so a REDUNDANT range conjunct on the sort column
    * alone is added — that one pushes into the parquet scan (min/max
    * row-group pruning + PushedFilters), which is where the
    * depth-independence actually comes from.
    */
  private def afterCursor(search: Option[String], sort: Option[SortSpec],
      cursor: PageCursor): DataFrame = {
    val base = searched(search)
    sort match {
      case Some(SortSpec(f, asc)) =>
        val v = cursor.sortValue.getOrElse(throw new IllegalArgumentException(
          s"cursor has no sort value but the request sorts by '$f'"))
        require(v != null, "null sort values are not seekable")
        val range = if (asc) col(f) >= lit(v) else col(f) <= lit(v)
        val strict = if (asc) col(f) > lit(v) else col(f) < lit(v)
        base.filter(range &&
          (strict || (col(f) === lit(v) && col(Paginator.RID) > lit(cursor.rid))))
      case None =>
        base.filter(col(Paginator.RID) > lit(cursor.rid))
    }
  }

  private def ordered(df0: DataFrame, sort: Option[SortSpec]): DataFrame = sort match {
    case Some(SortSpec(f, asc)) =>
      df0.orderBy(if (asc) col(f).asc else col(f).desc, col(Paginator.RID).asc)
    case None => df0.orderBy(col(Paginator.RID).asc)
  }

  /** The page of rows strictly AFTER `cursor` in the request's total
    * order — `pageNumber` is ignored (the cursor is the position).
    * Requires a bounded pageSize.
    */
  def pageAfter(req: PageRequest, cursor: PageCursor): DataFrame = {
    val size = req.pageSize.getOrElse(
      throw new IllegalArgumentException("pageAfter requires a bounded pageSize"))
    ordered(afterCursor(req.search, req.sort, cursor), req.sort)
      .limit(size).drop(Paginator.RID)
  }

  /** Cursor at the last row of the page `req` describes — or, with
    * `after` set, of the page following that cursor (so a deep walk
    * never pays an offset). One single-row job; None on an empty page.
    */
  def cursorOfPage(req: PageRequest, after: Option[PageCursor] = None): Option[PageCursor] = {
    val size = req.pageSize.getOrElse(
      throw new IllegalArgumentException("cursorOfPage requires a bounded pageSize"))
    // with a cursor the page starts right at it; without one, the offset
    // is the (paid-once) entry point into the walk
    val base = after match {
      case Some(c) => afterCursor(req.search, req.sort, c)
      case None => searched(req.search)
    }
    val inverted = req.sort match {
      case Some(SortSpec(f, asc)) =>
        Seq(if (asc) col(f).desc else col(f).asc, col(Paginator.RID).desc)
      case None => Seq(col(Paginator.RID).desc)
    }
    val pageFrame = after match {
      case Some(_) => ordered(base, req.sort).limit(size)
      case None =>
        ordered(base, req.sort).offset((req.pageNumber - 1) * size).limit(size)
    }
    val lastRow = pageFrame.orderBy(inverted: _*).limit(1)
      .select(req.sort.map(s => Seq(col(s.field))).getOrElse(Seq.empty) :+ col(Paginator.RID): _*)
      .collect().headOption
    lastRow.map { r =>
      req.sort match {
        case Some(_) => PageCursor(Some(r.get(0)), r.getLong(1))
        case None => PageCursor(None, r.getLong(0))
      }
    }
  }

  def firstPage(req: PageRequest): DataFrame = page(req.copy(pageNumber = 1))
  def lastPage(req: PageRequest): DataFrame =
    page(req.copy(pageNumber = totalPages(req.pageSize, req.search).toInt.max(1)))
  def nextPage(req: PageRequest): DataFrame = {
    val tp = totalPages(req.pageSize, req.search)
    require(req.pageNumber <= tp, "No more pages available.")
    page(req)
  }
  def gotoPage(req: PageRequest): DataFrame = {
    val tp = totalPages(req.pageSize, req.search)
    require(req.pageNumber >= 1 && req.pageNumber <= tp, "Invalid page number.")
    page(req)
  }
}

object Paginator {
  /** Synthetic tiebreaker column name (dropped from every page). */
  val RID = "__graft_rid"
}
