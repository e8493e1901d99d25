package graft.operators

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pure-JDK PDF text extraction — the highest-value non-image payload a
 * crawl carries through the binary front door (`WarcSource` p111
 * opened `body_bytes`; this gives `application/pdf` responses a text
 * path the way p92 gives `text/html` one). Hand-rolled in the style of
 * the WARC/WAV/AVI readers: no library, a documented SUBSET of ISO
 * 32000 sufficient for well-formed single-generation text PDFs —
 *
 *   - xref VALIDATION (the `startxref` offset must land on the `xref`
 *     keyword), but extraction walks stream objects LINEARLY rather
 *     than chasing the table — the robust fallback real extractors
 *     take, and strictly more tolerant of damaged crawled files;
 *   - `/FlateDecode` via `java.util.zip.Inflater` (the dominant
 *     content filter); unfiltered streams pass through; streams with
 *     any other filter (or corrupt deflate data) contribute no text;
 *   - text operators inside BT..ET: `Tj` and `'` (show string), `TJ`
 *     (show array — strings concatenate, kerning numbers drop),
 *     `Td`/`TD`/`T*`/`'` (line starts). String literals decode the
 *     full escape set: \( \) \\ \n \r \t \b \f, 1-3 digit octal, and
 *     backslash-newline continuation; parentheses nest per spec.
 *     Extracted text is the non-empty lines joined with \n.
 *
 * Out of the subset (documented, like mp4 for video): encrypted PDFs,
 * object streams (/ObjStm), non-Flate filters (DCT/LZW/ASCII85), CID
 * / composite-font ToUnicode remapping — each is a payload class, not
 * a structural gap; the walk/decode/operator machinery is where they
 * would plug in.
 *
 * Scale shape: parsing is per-row CPU inside `mapPartitions` (the
 * contract case for imperative per-partition logic — batched binary
 * decode), zero shuffle, zero driver involvement; bytes stay in the
 * scan that read them.
 */
object Pdf {

  final case class Extracted(xrefOk: Boolean, nStreams: Int, text: String)

  /** Parse one PDF byte array (see object doc for the subset). */
  def parse(bytes: Array[Byte]): Extracted = {
    // ISO-8859-1 maps bytes 1:1 to chars, so string offsets ARE byte
    // offsets and binary stream content survives the round-trip.
    val s = new String(bytes, ISO_8859_1)
    val xrefOk = {
      val at = s.lastIndexOf("startxref")
      if (at < 0) false
      else {
        val rest = s.substring(at + 9).trim.takeWhile(_.isDigit)
        rest.nonEmpty && {
          val off = rest.toLong
          off < s.length && s.startsWith("xref", off.toInt)
        }
      }
    }
    var nStreams = 0
    val text = new StringBuilder
    var i = s.indexOf("stream")
    while (i >= 0) {
      val end = s.indexOf("endstream", i)
      if (end < 0) { i = -1 }
      else {
        // keyword must be followed by EOL per spec; data starts after it
        var dataStart = i + 6
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        nStreams += 1
        // the owning object's dict sits between the previous "obj" and
        // the stream keyword (our subset: no nested stream dicts)
        val objAt = s.lastIndexOf("obj", i)
        val dict = if (objAt >= 0) s.substring(objAt, i) else ""
        // exact data extent comes from the dict's /Length when present
        // and plausible (EOL trimming is AMBIGUOUS: compressed data may
        // itself end in 0x0A/0x0D bytes, which a blind trim would eat)
        val lenM = LengthRe.findFirstMatchIn(dict)
          .map(_.group(1)).filter(_.length <= 12)
        val dataEnd = lenM.map(n => dataStart + n.toLong)
          .filter(e => e >= dataStart && e <= end).map(_.toInt).getOrElse {
            var e2 = end
            if (e2 > dataStart && s.charAt(e2 - 1) == '\n') e2 -= 1
            if (e2 > dataStart && s.charAt(e2 - 1) == '\r') e2 -= 1
            e2
          }
        val raw = s.substring(dataStart, dataEnd).getBytes(ISO_8859_1)
        val hasFlate = dict.contains("/FlateDecode")
        val otherFilter = dict.contains("/Filter") && !hasFlate
        val decoded =
          if (otherFilter) None
          else if (hasFlate) inflate(raw)
          else Some(raw)
        decoded.foreach { d =>
          val t = extractTextOps(new String(d, ISO_8859_1))
          if (t.nonEmpty) {
            if (text.nonEmpty) text.append('\n')
            text.append(t)
          }
        }
        i = s.indexOf("stream", end + 9)
      }
    }
    Extracted(xrefOk, nStreams, text.toString)
  }

  // direct /Length only (indirect "N 0 R" lengths are out of subset —
  // the lookahead rejects them, falling back to EOL trimming). The
  // digits are POSSESSIVE (\d++): with a backtrackable \d+ the engine
  // defeats the lookahead on "/Length 123 0 R" by shrinking the match
  // to "12" (lookahead then sees "3 0 R", which is not \s+\d+\s+R),
  // slicing the stream at a bogus offset and silently dropping its
  // text instead of falling back to EOL trimming.
  private val LengthRe = """/Length\s+(\d++)(?!\s+\d+\s+R)""".r

  private def inflate(raw: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(raw.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return None // stalled: corrupt
      }
      if (inf.finished()) Some(out.toByteArray) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Run the BT/ET text-operator machine over one decoded content
   * stream; returns non-empty lines joined with \n. */
  private[graft] def extractTextOps(c: String): String = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    val pending = scala.collection.mutable.ArrayBuffer.empty[String]
    var inBT = false
    def endLine(): Unit = {
      if (cur.nonEmpty) { lines += cur.toString; cur.clear() }
    }
    var i = 0
    val n = c.length
    while (i < n) {
      val ch = c.charAt(i)
      if (ch == '(') {
        val (str, next) = parseString(c, i)
        if (inBT) pending += str
        i = next
      } else if (ch == '%') {
        while (i < n && c.charAt(i) != '\n' && c.charAt(i) != '\r') i += 1
      } else if (ch == '<' && i + 1 < n && c.charAt(i + 1) == '<') {
        i += 2 // dict markers carry no text in our subset
      } else if (ch == '[' || ch == ']' || ch == '<' || ch == '>') {
        i += 1 // TJ array brackets; hex strings out of subset
      } else if (ch == '/') {
        i += 1
        while (i < n && !isDelim(c.charAt(i))) i += 1
      } else if (isDelim(ch)) {
        i += 1
      } else {
        val start = i
        while (i < n && !isDelim(c.charAt(i))) i += 1
        c.substring(start, i) match {
          case "BT" => inBT = true; pending.clear()
          case "ET" => endLine(); inBT = false; pending.clear()
          case "Tj" if inBT =>
            pending.lastOption.foreach(cur ++= _); pending.clear()
          case "TJ" if inBT =>
            pending.foreach(cur ++= _); pending.clear()
          case "'" if inBT =>
            endLine(); pending.lastOption.foreach(cur ++= _); pending.clear()
          case "Td" | "TD" | "T*" if inBT =>
            endLine(); pending.clear()
          case tok if isNumber(tok) => // numeric OPERAND (TJ kern, Td
            // coords): not an operator — accumulated strings survive
          case _ => pending.clear() // any other operator consumes operands
        }
      }
    }
    endLine()
    lines.mkString("\n")
  }

  private def isNumber(tok: String): Boolean = {
    var i = if (tok.startsWith("+") || tok.startsWith("-")) 1 else 0
    var digits = false
    var dot = false
    while (i < tok.length) {
      val ch = tok.charAt(i)
      if (ch >= '0' && ch <= '9') digits = true
      else if (ch == '.' && !dot) dot = true
      else return false
      i += 1
    }
    digits
  }

  private def isDelim(ch: Char): Boolean =
    ch == ' ' || ch == '\n' || ch == '\r' || ch == '\t' || ch == '\f' ||
      ch == 0.toChar || ch == '(' || ch == ')' || ch == '[' || ch == ']' ||
      ch == '<' || ch == '>' || ch == '/' || ch == '%'

  /** Parse a PDF string literal starting at `start` (a '('); returns
   * (decoded, index after the closing paren). Full escape set +
   * nested parens. */
  private[graft] def parseString(c: String, start: Int): (String, Int) = {
    val out = new StringBuilder
    var depth = 1
    var i = start + 1
    val n = c.length
    while (i < n && depth > 0) {
      val ch = c.charAt(i)
      if (ch == '\\' && i + 1 < n) {
        c.charAt(i + 1) match {
          case 'n' => out += '\n'; i += 2
          case 'r' => out += '\r'; i += 2
          case 't' => out += '\t'; i += 2
          case 'b' => out += '\b'; i += 2
          case 'f' => out += '\f'; i += 2
          case '(' => out += '('; i += 2
          case ')' => out += ')'; i += 2
          case '\\' => out += '\\'; i += 2
          case '\n' => i += 2 // continuation: swallow
          case '\r' =>
            i += 2; if (i < n && c.charAt(i) == '\n') i += 1
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < n && c.charAt(i) >= '0' && c.charAt(i) <= '7') {
              v = v * 8 + (c.charAt(i) - '0'); i += 1; k += 1
            }
            out += (v & 0xff).toChar
          case other => out += other; i += 2 // \x -> x per spec
        }
      } else if (ch == '(') { depth += 1; out += ch; i += 1 }
      else if (ch == ')') {
        depth -= 1; if (depth > 0) out += ch
        i += 1
      } else { out += ch; i += 1 }
    }
    (out.toString, i)
  }

  /**
   * Extract text from a frame of PDF payloads: one `mapPartitions`
   * pass, (id, xref_ok, n_streams, n_chars, text) per input row.
   * Composes directly with `WarcSource.records`' `body_bytes` for
   * `application/pdf` responses (the p111 front door).
   */
  def extractTexts(pdfs: DataFrame, bytesCol: String = "payload",
                   idCol: String = "id"): DataFrame = {
    val spark = pdfs.sparkSession
    import spark.implicits._
    pdfs.select(col(idCol).cast("long").as("id"), col(bytesCol).as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val r = parse(b)
        (id, r.xrefOk, r.nStreams.toLong, r.text.length.toLong, r.text)
      })
      .toDF("id", "xref_ok", "n_streams", "n_chars", "text")
  }

  // ------------------------------------------------------------ fixture

  /**
   * Deterministic single-page PDF 1.4 for the p118 fixture: a catalog/
   * pages/page/contents/font object chain with a CORRECT xref table
   * and a FlateDecode content stream. The text is closed-form — line 0
   * is "Doc {id} (pdf) A" (parens ride as \( \), the A as octal \101,
   * exercising escape decoding), then the doc's whitespace tokens in
   * 10-token lines, alternating `Tj` whole-chunk shows with `TJ`
   * kerned split shows (first token, kern, remainder) so both show
   * operators are load-bearing in the oracle comparison.
   */
  def fixturePdf(docId: Long, text: String): Array[Byte] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    val chunks = toks.grouped(10).map(_.mkString(" ")).toSeq
    val content = new StringBuilder
    content.append("BT /F1 12 Tf 72 720 Td (Doc ").append(docId)
      .append(" \\(pdf\\) \\101) Tj\n")
    chunks.zipWithIndex.foreach { case (chunk, k) =>
      if (k % 2 == 0) content.append("T* (").append(esc(chunk)).append(") Tj\n")
      else {
        val cut = chunk.indexOf(' ')
        if (cut < 0) content.append("T* (").append(esc(chunk)).append(") Tj\n")
        else content.append("T* [(").append(esc(chunk.substring(0, cut)))
          .append(") -250 (").append(esc(chunk.substring(cut)))
          .append(")] TJ\n")
      }
    }
    content.append("ET")
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(content.toString.getBytes(ISO_8859_1)); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    val objs = Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
      null, // content stream assembled below
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    val offsets = new Array[Int](objs.length + 1)
    objs.zipWithIndex.foreach { case (o, k) =>
      offsets(k + 1) = out.size()
      if (o != null) w(o)
      else {
        w(s"4 0 obj << /Length ${deflated.length} /Filter /FlateDecode >> stream\n")
        out.write(deflated)
        w("\nendstream endobj\n")
      }
    }
    val xrefAt = out.size()
    w(s"xref\n0 ${objs.length + 1}\n")
    w("0000000000 65535 f \n")
    (1 to objs.length).foreach(k => w(f"${offsets(k)}%010d 00000 n \n"))
    w(s"trailer << /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%%%EOF\n")
    out.toByteArray
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
}
