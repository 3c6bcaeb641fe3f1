package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the judged coverage claim: every operator key listed in
  * SURVEY.md §2 must have a gate entry in SparkEntry.queries, every
  * oracle must point at a real query, and rows marked `sql` in the
  * SURVEY tables must actually carry a DuckDB oracle.
  */
class CoverageSpec extends AnyFunSuite {

  private lazy val surveyRows: Seq[(String, String)] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val s2 = text.split("## §2")(1).split("## §3")(0)
    // table rows: | `key` | description | oracle |
    val row = raw"\|\s*`([a-z0-9_]+)`\s*\|[^|]*\|\s*([^|]+)\|".r
    row.findAllMatchIn(s2).map(m => (m.group(1), m.group(2).trim)).toSeq
  }

  test("every SURVEY §2 operator key has a SparkEntry.queries gate entry") {
    assert(surveyRows.nonEmpty, "SURVEY §2 tables must parse")
    val keys = SparkEntry.queries.keySet
    val missing = surveyRows.map(_._1).filterNot(keys.contains)
    assert(missing.isEmpty, s"SURVEY §2 rows without a gate entry: $missing")
  }

  test("every queries entry is inventoried in SURVEY §2") {
    val inventoried = surveyRows.map(_._1).toSet
    val unlisted = SparkEntry.queries.keySet.filterNot(inventoried.contains)
    assert(unlisted.isEmpty, s"gate entries missing from SURVEY §2: $unlisted")
  }

  test("no gate query emits array/map/struct columns (driver hashes frames in pandas)") {
    // The driver's correctness harness loads each result into pandas and
    // sort_values + hashes it — numpy arrays (from array/map/struct
    // columns) are unhashable, so such a gate errors instead of being
    // checked (the r5 text_hash_embed failure). Guard the whole surface:
    // every gate output schema must be scalar/string only; vectors must
    // be rendered to deterministic strings before leaving the gate.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val spark = TestSpark.spark
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val bad = q(spark, TestSpark.sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
              f.dataType.isInstanceOf[MapType] ||
              f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        bad
    }
    assert(offenders.isEmpty,
      s"gate outputs the driver cannot hash (stringify them): $offenders")
  }

  test("SURVEY rows marked sql carry a DuckDB oracle, and oracles map to queries") {
    val oracled = SparkEntry.oracleSql.keySet
    val sqlMarked = surveyRows.filter(_._2.startsWith("sql")).map(_._1)
    val unOracled = sqlMarked.filterNot(oracled.contains)
    assert(unOracled.isEmpty, s"SURVEY says sql-oracled but no oracle: $unOracled")
    val dangling = oracled.filterNot(SparkEntry.queries.keySet.contains)
    assert(dangling.isEmpty, s"oracles without a query: $dangling")
  }
}
