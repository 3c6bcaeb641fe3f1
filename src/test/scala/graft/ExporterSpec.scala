package graft

import java.util.zip.ZipFile

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.exporters.{Exporter, XlsxWriter}
import graft.sources.Tables

class ExporterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val nation = Tables.load(spark, TestSpark.sf, "nation")

  test("csv round-trip") {
    val out = TestSpark.scratch("exp_csv")
    Exporter.csv(nation, out)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.count() == 25)
    assert(back.columns.toSeq == nation.columns.toSeq)
  }

  test("ndjson round-trip") {
    val out = TestSpark.scratch("exp_ndjson")
    Exporter.ndjson(nation, out)
    val back = spark.read.json(out)
    assert(back.count() == 25)
  }

  test("json array is valid single-document JSON") {
    val out = TestSpark.scratch("exp_json") + "/nation.json"
    Exporter.json(nation.orderBy("n_nationkey"), out)
    val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)))
    assert(txt.startsWith("[") && txt.endsWith("]"))
    // crude but dependency-free: 25 objects
    assert(txt.count(_ == '{') == 25)
  }

  test("parquet round-trip") {
    val out = TestSpark.scratch("exp_parquet")
    Exporter.parquet(nation, out)
    assert(spark.read.parquet(out).count() == 25)
  }

  test("xlsx is a valid zip with header + rows, complex cols dropped") {
    val out = TestSpark.scratch("exp_xlsx") + "/nation.xlsx"
    val withArray = nation.withColumn("arr", array(lit(1), lit(2)))
    Exporter.excel(withArray, out)
    val zip = new ZipFile(out)
    try {
      val sheet = zip.getInputStream(zip.getEntry("xl/worksheets/sheet1.xml"))
      val xml = scala.io.Source.fromInputStream(sheet).mkString
      assert(xml.contains("<t>n_name</t>"))
      assert(!xml.contains("arr"), "array column must be dropped like the reference")
      assert(xml.sliding(5).count(_ == "<row ") == 26) // header + 25
      assert(zip.getEntry("[Content_Types].xml") != null)
    } finally zip.close()
  }

  test("xlsx keeps struct columns as their JSON rendering, like the reference") {
    // reference worker.ts:381-383 renders STRUCT via TO_JSON instead of
    // dropping it (only LIST/ARRAY/DECIMAL are excluded)
    val out = TestSpark.scratch("exp_xlsx_struct") + "/nation.xlsx"
    val withStruct = nation.limit(3)
      .withColumn("st", struct(col("n_nationkey").as("k"), col("n_name").as("n")))
    Exporter.excel(withStruct, out)
    val zip = new ZipFile(out)
    try {
      val sheet = zip.getInputStream(zip.getEntry("xl/worksheets/sheet1.xml"))
      val xml = scala.io.Source.fromInputStream(sheet).mkString
        .replace("&quot;", "\"")
      assert(xml.contains("<t>st</t>"), "struct column must be kept")
      assert(xml.contains("\"k\":"), "struct cells must be JSON-rendered")
    } finally zip.close()
  }

  test("json array export is UTF-8 regardless of platform charset") {
    val out = TestSpark.scratch("exp_json_utf8") + "/unicode.json"
    val df = spark.range(1).select(lit("naïve — 日本語").as("s"))
    Exporter.json(df, out)
    val txt = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(txt.contains("naïve — 日本語"))
  }

  test("excel with only unsupported columns fails like the reference") {
    val onlyArr = nation.select(array(col("n_nationkey")).as("arr"))
    val out = TestSpark.scratch("exp_xlsx_bad") + "/bad.xlsx"
    val e = intercept[IllegalArgumentException](Exporter.excel(onlyArr, out))
    assert(e.getMessage.contains("No supported columns"))
  }

  test("tsv clipboard rendering stringifies complex values") {
    val df = nation.limit(2).withColumn("s", struct(lit(1).as("a")))
    val tsv = Exporter.toTsvString(df)
    val lines = tsv.split('\n')
    assert(lines.head == "n_nationkey\tn_name\tn_regionkey\ts")
    assert(lines.length == 3)
    assert(lines(1).endsWith("""{"a":1}"""))
  }
}
