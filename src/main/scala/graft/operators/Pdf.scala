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
 * ENCRYPTED PDFs (r16): the standard security handler with an EMPTY
 * user password — the dominant encrypted-crawl class (files encrypted
 * only to restrict printing/copying; any reader opens them) — is IN
 * the subset for both RC4-128 (V2/R3) and AES-128-CBC (V4/R4 AESV2),
 * pure JDK (`javax.crypto` ships AES/CBC; RC4 is 15 lines): the file
 * key derives per ISO 32000-1 §7.6.3.3 Algorithm 2 from the padded
 * empty password, /O, /P, and /ID[0]; each stream decrypts under its
 * per-object MD5 key (Algorithm 1; +sAlT for AES, IV = first 16
 * bytes) BEFORE filters apply. The /U entry is VALIDATED first
 * (Algorithm 4/5) — a file whose password is genuinely non-empty
 * fails the check and contributes no text rather than garbage.
 *
 * Out of the subset (documented, like mp4 for video): non-empty user
 * passwords and R5/R6 (AES-256) handlers, object streams (/ObjStm),
 * non-Flate filters (DCT/LZW/ASCII85), CID / composite-font ToUnicode
 * remapping — each is a payload class, not a structural gap; the
 * walk/decode/operator machinery is where they would plug in. Note
 * /ObjStm never holds CONTENT streams (ISO 32000-1 §7.5.7 forbids
 * streams inside object streams), so the linear stream walk already
 * extracts text from most PDF 1.5+ files — the gap is metadata
 * resolution, not text.
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
    val crypt = resolveCrypt(s)
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
        val sliced = s.substring(dataStart, dataEnd).getBytes(ISO_8859_1)
        // encryption applies to the stream bytes BEFORE any filter
        val rawOpt: Option[Array[Byte]] = crypt match {
          case NoCrypt => Some(sliced)
          case CryptUnsupported => None
          case StdCrypt(fk, aes) =>
            objHeader(s, objAt) match {
              case Some((num, gen)) => decryptStream(fk, aes, num, gen, sliced)
              case None => None
            }
        }
        val hasFlate = dict.contains("/FlateDecode")
        val otherFilter = dict.contains("/Filter") && !hasFlate
        val decoded = rawOpt.flatMap { raw =>
          if (otherFilter) None
          else if (hasFlate) inflate(raw)
          else Some(raw)
        }
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

  // --------------------------------------------- standard security handler

  private sealed trait Crypt
  private case object NoCrypt extends Crypt
  private case object CryptUnsupported extends Crypt
  private final case class StdCrypt(fileKey: Array[Byte], aes: Boolean)
      extends Crypt

  /** ISO 32000-1 §7.6.3.3: the 32-byte password padding constant. */
  private val PadBytes: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val st = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + st(i) + key(i % key.length)) & 0xff
      val t = st(i); st(i) = st(j); st(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + st(x)) & 0xff
      val t = st(x); st(x) = st(y); st(y) = t
      out(k) = (data(k) ^ st((st(x) + st(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** Algorithm 2: the file encryption key for the EMPTY user password.
   * (R4 /EncryptMetadata false would append FFFFFFFF — we keep the
   * default-true case in the subset.) */
  private def fileKey(o: Array[Byte], p: Int, id0: Array[Byte], r: Int,
                      keyLen: Int): Array[Byte] = {
    val pLe = Array[Byte](p.toByte, (p >> 8).toByte, (p >> 16).toByte,
      (p >> 24).toByte)
    var h = md5(PadBytes, o, pLe, id0)
    if (r >= 3) for (_ <- 0 until 50) h = md5(h.take(keyLen))
    h.take(keyLen)
  }

  /** Algorithm 1: the per-object key (MD5 of file key + obj/gen LE
   * bytes, +sAlT for AESV2), truncated to min(keyLen+5, 16). */
  private def objKey(fk: Array[Byte], num: Int, gen: Int,
                     aes: Boolean): Array[Byte] = {
    val ext = Array[Byte](num.toByte, (num >> 8).toByte, (num >> 16).toByte,
      gen.toByte, (gen >> 8).toByte)
    val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.empty[Byte]
    md5(fk, ext, salt).take(math.min(fk.length + 5, 16))
  }

  /** Algorithm 3: the /O value for empty owner AND user passwords. */
  private[graft] def ownerValue(r: Int, keyLen: Int): Array[Byte] = {
    var h = md5(PadBytes)
    if (r >= 3) for (_ <- 0 until 50) h = md5(h)
    val rk = h.take(keyLen)
    var o = rc4(rk, PadBytes)
    if (r >= 3) for (i <- 1 to 19) o = rc4(rk.map(b => (b ^ i).toByte), o)
    o
  }

  /** Algorithm 4 (R2) / 5 (R3+): the /U value for the empty user
   * password — what a conforming reader validates the password
   * against. R3+ compares the first 16 bytes only; the tail is
   * arbitrary padding (we write zeros). */
  private[graft] def userValue(fk: Array[Byte], r: Int,
                               id0: Array[Byte]): Array[Byte] = {
    if (r == 2) rc4(fk, PadBytes)
    else {
      var u = rc4(fk, md5(PadBytes, id0))
      for (i <- 1 to 19) u = rc4(fk.map(b => (b ^ i).toByte), u)
      u ++ new Array[Byte](16)
    }
  }

  private def decryptStream(fk: Array[Byte], aes: Boolean, num: Int,
                            gen: Int, data: Array[Byte]): Option[Array[Byte]] = {
    val ek = objKey(fk, num, gen, aes)
    if (!aes) Some(rc4(ek, data))
    else if (data.length < 16 || (data.length - 16) % 16 != 0) None
    else
      try {
        val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(ek, "AES"),
          new javax.crypto.spec.IvParameterSpec(data.take(16)))
        Some(c.doFinal(data, 16, data.length - 16))
      } catch { case _: java.security.GeneralSecurityException => None }
  }

  /** (objnum, gen) of the object whose `obj` keyword ends at objAt. */
  private def objHeader(s: String, objAt: Int): Option[(Int, Int)] =
    if (objAt < 0) None
    else ObjHeadRe.findFirstMatchIn(
      s.substring(math.max(0, objAt - 24), objAt))
      .map(m => (m.group(1).toInt, m.group(2).toInt))
  private val ObjHeadRe = """(\d+)\s+(\d+)\s*$""".r

  /** Locate and resolve the trailer's /Encrypt dictionary: NoCrypt when
   * absent, StdCrypt when it is a supported standard-handler shape AND
   * the empty user password validates against /U, CryptUnsupported
   * otherwise (non-empty password, R5/R6, exotic filters) — streams
   * then contribute no text rather than garbage. */
  private def resolveCrypt(s: String): Crypt = {
    // /Encrypt is a TRAILER key (ISO 32000-1 §7.5.5): anchor the search
    // to the last trailer dict — the same anchoring IdRe already gets —
    // so a coincidental "/Encrypt N G R" inside an uncompressed content
    // stream (a PDF documenting PDF syntax) can't flip an unencrypted
    // file to CryptUnsupported and silently drop all its text. Fall
    // back to the whole file only when no trailer keyword exists at
    // all (cross-reference-STREAM files carry the key in the XRef
    // stream dict instead of a classic trailer).
    val trailerAt = s.lastIndexOf("trailer")
    val hay = if (trailerAt >= 0) s.substring(trailerAt) else s
    val encRef = EncRefRe.findAllMatchIn(hay).toSeq.lastOption
      .getOrElse(return NoCrypt)
    val (num, gen) = (encRef.group(1).toInt, encRef.group(2).toInt)
    // anchored header match: a bare indexOf("6 0 obj") would hit the
    // digit-suffix of a longer object number ("16 0 obj") or a binary
    // fluke inside a stream, reading the wrong dictionary and silently
    // dropping a supported file's text. Of the anchored candidates,
    // take the first whose dict names the Standard handler.
    val headRe = (s"(?<![0-9])$num\\s+$gen\\s+obj").r
    val dict = headRe.findAllMatchIn(s).map { m =>
      val endAt = s.indexOf("endobj", m.start)
      s.substring(m.start, if (endAt < 0) s.length else endAt)
    }.find(_.contains("/Standard")).getOrElse(return CryptUnsupported)
    def intField(name: String): Option[Int] =
      s"""/$name\\s+(-?\\d+)""".r.findFirstMatchIn(dict).map(_.group(1).toInt)
    def strField(name: String): Option[Array[Byte]] = {
      val hex = s"""/$name\\s*<([0-9A-Fa-f]+)>""".r
      hex.findFirstMatchIn(dict).map(m =>
        m.group(1).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
        .orElse {
          val at = s"""/$name\\s*\\(""".r.findFirstMatchIn(dict)
          at.map(m => parseString(dict, m.end - 1)._1.getBytes(ISO_8859_1))
        }
    }
    val v = intField("V").getOrElse(0)
    val r = intField("R").getOrElse(0)
    val p = intField("P").getOrElse(return CryptUnsupported)
    val o = strField("O").getOrElse(return CryptUnsupported)
    val u = strField("U").getOrElse(return CryptUnsupported)
    val aes = dict.contains("/AESV2")
    // /Length must be read from the TOP-LEVEL encrypt dict only: the
    // V4 /CF crypt-filter subdict carries its own /Length in BYTES
    // (not bits) — matching "/CF << /StdCF << ... /Length 16 >> >>"
    // would parse keyLen as 2 and reject a supported file. And a legal
    // V4 dict may omit the top-level /Length entirely: the effective
    // default there is 128 bits (AESV2 keys are 128-bit), not the
    // spec's literal 40.
    val keyLen = {
      val cfAt = dict.indexOf("/CF")
      val top = if (cfAt >= 0) dict.substring(0, cfAt) else dict
      """/Length\s+(-?\d+)""".r.findFirstMatchIn(top)
        .map(_.group(1).toInt)
        .getOrElse(if (v == 4) 128 else 40) / 8
    }
    val supported =
      ((v == 1 || v == 2) && (r == 2 || r == 3) && !aes) ||
        (v == 4 && r == 4 && aes)
    if (!supported || o.length < 32 || keyLen < 5 || keyLen > 16)
      return CryptUnsupported
    val id0 = IdRe.findFirstMatchIn(s.substring(s.lastIndexOf("trailer")
      .max(0))).map(m =>
      m.group(1).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      .getOrElse(Array.empty[Byte])
    val fk = fileKey(o, p, id0, r, if (v == 1) 5 else keyLen)
    val expectU = userValue(fk, r, id0)
    val checkLen = if (r == 2) 32 else 16
    if (u.length >= checkLen &&
      java.util.Arrays.equals(u.take(checkLen), expectU.take(checkLen)))
      StdCrypt(fk, aes)
    else CryptUnsupported
  }
  private val EncRefRe = """/Encrypt\s+(\d+)\s+(\d+)\s+R""".r
  private val IdRe = """/ID\s*\[\s*<([0-9A-Fa-f]+)>""".r

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
  def fixturePdf(docId: Long, text: String): Array[Byte] =
    buildPdf(docId, text, encrypt = None)

  /** Encrypted twin of [[fixturePdf]] under the standard security
   * handler with EMPTY owner and user passwords (open-to-read,
   * restricted-permissions — the dominant encrypted-crawl class):
   * aes=false → RC4-128 (V2/R3), aes=true → AES-128-CBC (V4/R4
   * AESV2, deterministic per-doc IV). Same object chain and content;
   * /Encrypt dict + /ID land in the trailer and the content stream is
   * encrypted under its per-object key BEFORE the file assembles. */
  def fixturePdfEncrypted(docId: Long, text: String,
                          aes: Boolean): Array[Byte] =
    buildPdf(docId, text, encrypt = Some(aes))

  private def buildPdf(docId: Long, text: String,
                       encrypt: Option[Boolean]): Array[Byte] = {
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
    def hex(b: Array[Byte]): String = b.map("%02X".format(_)).mkString
    // handler parameters + the encrypted payload, when requested
    val encInfo = encrypt.map { aes =>
      val r = if (aes) 4 else 3
      val keyLen = 16
      val o = ownerValue(r, keyLen)
      val perm = -3904 // print allowed, modify/copy restricted
      val id0 = md5(s"graft-id-$docId".getBytes(ISO_8859_1))
      val fk = fileKey(o, perm, id0, r, keyLen)
      val u = userValue(fk, r, id0)
      val dict =
        if (!aes)
          s"6 0 obj << /Filter /Standard /V 2 /R 3 /Length 128 /P $perm" +
            s" /O <${hex(o)}> /U <${hex(u)}> >> endobj\n"
        else
          s"6 0 obj << /Filter /Standard /V 4 /R 4 /Length 128 /P $perm" +
            s" /O <${hex(o)}> /U <${hex(u)}>" +
            " /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>" +
            " /StmF /StdCF /StrF /StdCF >> endobj\n"
      (aes, fk, id0, dict)
    }
    val payload = encInfo match {
      case None => deflated
      case Some((aes, fk, _, _)) =>
        val ek = objKey(fk, 4, 0, aes)
        if (!aes) rc4(ek, deflated)
        else {
          val iv = md5(s"graft-iv-$docId".getBytes(ISO_8859_1))
          val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
          c.init(javax.crypto.Cipher.ENCRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(ek, "AES"),
            new javax.crypto.spec.IvParameterSpec(iv))
          iv ++ c.doFinal(deflated)
        }
    }
    val objs = Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
      null, // content stream assembled below
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
    ) ++ encInfo.map(_._4).toSeq
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    val offsets = new Array[Int](objs.length + 1)
    objs.zipWithIndex.foreach { case (o, k) =>
      offsets(k + 1) = out.size()
      if (o != null) w(o)
      else {
        w(s"4 0 obj << /Length ${payload.length} /Filter /FlateDecode >> stream\n")
        out.write(payload)
        w("\nendstream endobj\n")
      }
    }
    val xrefAt = out.size()
    w(s"xref\n0 ${objs.length + 1}\n")
    w("0000000000 65535 f \n")
    (1 to objs.length).foreach(k => w(f"${offsets(k)}%010d 00000 n \n"))
    val encTrailer = encInfo.map { case (_, _, id0, _) =>
      s" /Encrypt 6 0 R /ID [<${hex(id0)}> <${hex(id0)}>]"
    }.getOrElse("")
    w(s"trailer << /Size ${objs.length + 1} /Root 1 0 R$encTrailer >>" +
      s"\nstartxref\n$xrefAt\n%%%%EOF\n")
    out.toByteArray
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
}
