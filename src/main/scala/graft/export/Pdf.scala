package graft.export

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dependency-free minimal PDF writer (PDF 1.4, uncompressed,
  * Helvetica) — enough to render line-oriented tabular reports, which
  * is exactly what the reference's reportlab flow produces
  * (app.py:638-702: title + table rows). The environment ships no PDF
  * library; PDF itself is a plain-text object graph with a byte-offset
  * xref table, so a faithful S9 sink needs ~100 lines, not a
  * dependency.
  *
  * Layout: US Letter, 10 pt text, 12 pt leading, 60 lines/page,
  * multi-page via one content stream per page. Text is Latin-1
  * (PDF StandardEncoding); characters outside it degrade to '?'.
  */
object Pdf {

  private val PageW = 612
  private val PageH = 792
  private val LinesPerPage = 60

  private def escape(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c if c >= 32 && c < 127 => c.toString
      case c if c >= 160 && c <= 255 => c.toString
      case _ => "?"
    }

  /** Serialize `lines` as a multi-page PDF; returns the bytes. */
  def render(lines: Seq[String]): Array[Byte] = {
    val pages = if (lines.isEmpty) Seq(Seq("")) else
      lines.grouped(LinesPerPage).toSeq
    val nPages = pages.length
    // object ids: 1 catalog, 2 pages, 3 font, then per page i:
    // (4 + 2i) page object, (5 + 2i) its content stream
    val nObjs = 3 + 2 * nPages

    val out = new ByteArrayOutputStream()
    val offsets = new Array[Long](nObjs + 1)
    def put(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def beginObj(id: Int): Unit = { offsets(id) = out.size().toLong; put(s"$id 0 obj\n") }

    put("%PDF-1.4\n")
    beginObj(1)
    put("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    put(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>\nendobj\n")
    beginObj(3)
    put("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")

    pages.zipWithIndex.foreach { case (pageLines, i) =>
      val pageId = 4 + 2 * i
      val contentId = 5 + 2 * i
      beginObj(pageId)
      put(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $PageW $PageH] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents $contentId 0 R >>\nendobj\n")
      val body = new StringBuilder
      body.append("BT\n/F1 10 Tf\n12 TL\n72 ").append(PageH - 72).append(" Td\n")
      pageLines.foreach { l =>
        body.append('(').append(escape(l)).append(") Tj\nT*\n")
      }
      body.append("ET\n")
      val stream = body.toString
      beginObj(contentId)
      put(s"<< /Length ${stream.getBytes(StandardCharsets.ISO_8859_1).length} >>\nstream\n")
      put(stream)
      put("endstream\nendobj\n")
    }

    val xrefAt = out.size().toLong
    put(s"xref\n0 ${nObjs + 1}\n")
    put("0000000000 65535 f \n")
    (1 to nObjs).foreach(id => put(f"${offsets(id)}%010d 00000 n \n"))
    put(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  def write(lines: Seq[String], outPath: String): Unit = {
    Files.createDirectories(Paths.get(outPath).getParent)
    Files.write(Paths.get(outPath), render(lines))
    ()
  }
}
