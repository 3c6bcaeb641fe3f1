package graft.exporters

import java.io.{BufferedOutputStream, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Minimal OOXML .xlsx writer using only the JDK (an xlsx is a zip of XML
  * parts). Streams rows from `toLocalIterator` — driver memory stays O(1)
  * in rows. Inline strings, no shared-string table (valid per ECMA-376 and
  * accepted by Excel/LibreOffice), numbers/booleans typed natively.
  *
  * Replaces the reference's exceljs dependency (reference:
  * src/worker.ts:214-217) without adding one.
  */
object XlsxWriter {

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c if c >= ' ' || c == '\t' || c == '\n' || c == '\r' => sb.append(c)
      case _ => () // control chars are invalid in XML 1.0
    }
    sb.result()
  }

  private def colRef(i: Int): String = { // 0 -> A, 25 -> Z, 26 -> AA
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.result()
  }

  def write(df: DataFrame, path: String): Unit = {
    val zip = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path), 1 << 20))
    val w = new OutputStreamWriter(zip, StandardCharsets.UTF_8)
    def part(name: String)(body: => Unit): Unit = {
      zip.putNextEntry(new ZipEntry(name)); body; w.flush(); zip.closeEntry()
    }
    try {
      part("[Content_Types].xml") {
        w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
      }
      part("_rels/.rels") {
        w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
      }
      part("xl/workbook.xml") {
        w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
      }
      part("xl/_rels/workbook.xml.rels") {
        w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
      }
      part("xl/worksheets/sheet1.xml") {
        w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
        // header row
        w.write("""<row r="1">""")
        df.columns.zipWithIndex.foreach { case (c, i) =>
          w.write(s"""<c r="${colRef(i)}1" t="inlineStr"><is><t>${xmlEscape(c)}</t></is></c>""")
        }
        w.write("</row>")
        val types = df.schema.fields.map(_.dataType)
        var rowNum = 2
        val it = df.toLocalIterator()
        while (it.hasNext) {
          val r = it.next()
          w.write(s"""<row r="$rowNum">""")
          var i = 0
          while (i < types.length) {
            if (!r.isNullAt(i)) {
              val ref = s"${colRef(i)}$rowNum"
              types(i) match {
                case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
                  w.write(s"""<c r="$ref"><v>${r.get(i)}</v></c>""")
                case BooleanType =>
                  w.write(s"""<c r="$ref" t="b"><v>${if (r.getBoolean(i)) 1 else 0}</v></c>""")
                case _ =>
                  w.write(s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(String.valueOf(r.get(i)))}</t></is></c>""")
              }
            }
            i += 1
          }
          w.write("</row>")
          rowNum += 1
        }
        w.write("</sheetData></worksheet>")
      }
    } finally { w.flush(); zip.close() }
  }
}
