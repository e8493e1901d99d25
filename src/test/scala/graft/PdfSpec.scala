package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.operators.Pdf
import org.apache.spark.sql.functions._

class PdfSpec extends SparkSpec {

  import spark.implicits._

  test("fixturePdf round-trip: xref validates, FlateDecode, Tj + TJ text") {
    val text = "  alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron  "
    val pdf = Pdf.fixturePdf(7L, text)
    // structural sanity: header, one content stream, a real xref table
    val s = new String(pdf, ISO_8859_1)
    assert(s.startsWith("%PDF-1.4"))
    val r = Pdf.parse(pdf)
    assert(r.xrefOk, "startxref offset must land on the xref keyword")
    assert(r.nStreams == 1)
    // closed-form expected text: header line (escapes: \( \) and octal
    // \101 = 'A'), then 10-token chunks — chunk 0 via Tj, chunk 1 via a
    // kerned TJ whose strings must concatenate with the kern dropped
    assert(r.text ==
      "Doc 7 (pdf) A\n" +
        "alpha beta gamma delta epsilon zeta eta theta iota kappa\n" +
        "lambda mu nu xi omicron")
  }

  test("string literals: nesting, full escape set, octal, continuation") {
    def t(content: String): String = Pdf.extractTextOps(content)
    assert(t("BT (a (nested) b) Tj ET") == "a (nested) b")
    assert(t("BT (tab\\there\\nnl) Tj ET") == "tab\there\nnl")
    assert(t("BT (oct \\101\\102\\7!) Tj ET") == "oct AB!")
    // backslash-newline continuation swallows the EOL
    assert(t("BT (one\\\ntwo) Tj ET") == "onetwo")
    // unknown escape drops the backslash, keeps the char
    assert(t("BT (x\\zy) Tj ET") == "xzy")
  }

  test("text operators: line starts, show-string forms, operand discipline") {
    def t(content: String): String = Pdf.extractTextOps(content)
    // Td/TD/T* start lines; ' shows after a line start
    assert(t("BT 72 720 Td (l1) Tj 0 -14 TD (l2) Tj T* (l3) Tj (l4) ' ET") ==
      "l1\nl2\nl3\nl4")
    // TJ concatenates strings, drops kerning numbers
    assert(t("BT [(Hel) -20 (lo) 31 ( wor) (ld)] TJ ET") == "Hello world")
    // strings outside BT..ET never show; a non-show operator consumes
    // its string operands (ToUnicode-ish noise must not leak)
    assert(t("(outside) Tj BT (keep) Tj ET (after)") == "keep")
    assert(t("BT (gone) Tf (kept) Tj ET") == "kept")
    // comments are skipped to EOL
    assert(t("BT % noise (not text) Tj\n(real) Tj ET") == "real")
    // name tokens are skipped atomically even when glued to delimiters
    assert(t("BT /F1 12 Tf (x) Tj ET") == "x")
  }

  test("stream handling: unfiltered pass-through, non-Flate skipped, corrupt deflate") {
    def obj(dict: String, data: Array[Byte]): Array[Byte] =
      (s"9 0 obj $dict stream\n".getBytes(ISO_8859_1)) ++ data ++
        "\nendstream endobj\n".getBytes(ISO_8859_1)
    val plain = obj("<< /Length 15 >>", "BT (raw) Tj ET".getBytes(ISO_8859_1))
    val dct = obj("<< /Filter /DCTDecode >>", Array[Byte](1, 2, 3))
    val corrupt = obj("<< /Filter /FlateDecode >>",
      "not deflate data".getBytes(ISO_8859_1))
    val r = Pdf.parse("%PDF-1.4\n".getBytes(ISO_8859_1) ++
      plain ++ dct ++ corrupt)
    assert(r.nStreams == 3)
    assert(r.text == "raw") // only the unfiltered stream contributes
    assert(!r.xrefOk)       // no startxref at all
    // a startxref pointing into the void fails validation, parse still works
    val bad = Pdf.parse(plain ++ "startxref\n2\n%%EOF".getBytes(ISO_8859_1))
    assert(!bad.xrefOk && bad.text == "raw")
  }

  test("/Length slices exactly: compressed data ending in EOL bytes survives") {
    // find a content whose DEFLATED form ends in \r or \n — the case
    // where blind EOL-trimming before `endstream` eats a data byte and
    // kills the inflate (a real 1-in-128 fixture failure, doc 344)
    def deflated(c: String): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(c.getBytes(ISO_8859_1)); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val (content, data) = Iterator.from(0)
      .map(k => (s"BT (pad$k) Tj ET", deflated(s"BT (pad$k) Tj ET")))
      .find { case (_, d) => d.last == '\r'.toByte || d.last == '\n'.toByte }
      .get
    val pdf = s"9 0 obj << /Length ${data.length} /Filter /FlateDecode >> stream\n"
      .getBytes(ISO_8859_1) ++ data ++ "\nendstream endobj\n".getBytes(ISO_8859_1)
    val r = Pdf.parse(pdf)
    assert(r.text == content.drop(4).takeWhile(_ != ')'),
      s"EOL-final deflate byte must survive: got '${r.text}'")
    // indirect /Length (out of subset) falls back to EOL trimming
    val raw = "BT (ind) Tj ET"
    val pdf2 = s"9 0 obj << /Length 4 0 R >> stream\n".getBytes(ISO_8859_1) ++
      raw.getBytes(ISO_8859_1) ++ "\nendstream endobj\n".getBytes(ISO_8859_1)
    assert(Pdf.parse(pdf2).text == "ind")
    // MULTI-digit indirect length: a backtrackable \d+ defeats the
    // lookahead by matching the digit prefix ("12" of "123 0 R"),
    // slicing a Flate stream at a bogus offset so inflate fails and
    // the text silently drops. The possessive \d++ must reject the
    // whole reference and fall back to EOL trimming.
    val raw3 = "BT (indirect multi) Tj ET"
    val pdf3 = s"9 0 obj << /Length 123 0 R >> stream\n"
      .getBytes(ISO_8859_1) ++ raw3.getBytes(ISO_8859_1) ++
      "\nendstream endobj\n".getBytes(ISO_8859_1)
    assert(Pdf.parse(pdf3).text == "indirect multi")
    // and the Flate variant the advisory named: indirect length +
    // FlateDecode must still inflate via the EOL-trim fallback (pick a
    // payload whose deflate does NOT end in EOL bytes, where the
    // fallback is exact; EOL-final deflate is the fallback's known
    // 1-in-128 blind spot, covered above for direct lengths)
    val (content4, d4) = Iterator.from(0)
      .map(k => (s"BT (flate ind$k) Tj ET", deflated(s"BT (flate ind$k) Tj ET")))
      .find { case (_, d) => d.last != '\r'.toByte && d.last != '\n'.toByte }
      .get
    val pdf4 = s"9 0 obj << /Length 123 0 R /Filter /FlateDecode >> stream\n"
      .getBytes(ISO_8859_1) ++ d4 ++
      "\nendstream endobj\n".getBytes(ISO_8859_1)
    assert(Pdf.parse(pdf4).text == content4.drop(4).takeWhile(_ != ')'),
      s"got '${Pdf.parse(pdf4).text}'")
  }

  test("encrypted PDFs: RC4-128 and AES-128 empty-password round-trips") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu"
    val expected = "Doc 7 (pdf) A\n" +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa\n" +
      "lambda mu"
    for (aes <- Seq(false, true)) {
      val pdf = Pdf.fixturePdfEncrypted(7L, text, aes)
      val s = new String(pdf, ISO_8859_1)
      assert(s.contains("/Encrypt 6 0 R") && s.contains("/Standard"), s"aes=$aes")
      if (aes) assert(s.contains("/AESV2"))
      // the plaintext content must NOT appear in the encrypted bytes
      assert(!s.contains("alpha beta"), s"aes=$aes leaked plaintext")
      val r = Pdf.parse(pdf)
      assert(r.xrefOk && r.nStreams == 1, s"aes=$aes")
      assert(r.text == expected, s"aes=$aes got '${r.text}'")
    }
    // same doc, plain vs both encryptions: identical extracted text
    assert(Pdf.parse(Pdf.fixturePdf(7L, text)).text == expected)
  }

  test("RC4 matches the published test vector (round-trips can't catch shared bugs)") {
    // The classic vector (Schneier, Applied Cryptography; widely
    // published): key "Key", plaintext "Plaintext" ->
    // BB F3 16 E8 D9 40 AF 0A D3
    val ct = Pdf.rc4("Key".getBytes(ISO_8859_1),
      "Plaintext".getBytes(ISO_8859_1))
    assert(ct.map("%02X".format(_)).mkString == "BBF316E8D940AF0AD3")
    // and the second canonical pair: "Wiki"/"pedia" -> 1021BF0420
    val ct2 = Pdf.rc4("Wiki".getBytes(ISO_8859_1),
      "pedia".getBytes(ISO_8859_1))
    assert(ct2.map("%02X".format(_)).mkString == "1021BF0420")
  }

  test("encrypted PDFs: wrong password / unsupported handlers degrade to no text") {
    val pdf = Pdf.fixturePdfEncrypted(3L, "one two three", aes = false)
    val s = new String(pdf, ISO_8859_1)
    // tamper /O (the password record): /U validation must fail and the
    // file contribute NO text (never RC4 garbage)
    val oAt = s.indexOf("/O <") + 4
    val tampered = s.substring(0, oAt) +
      (if (s.charAt(oAt) == '0') '1' else '0') + s.substring(oAt + 1)
    val rt = Pdf.parse(tampered.getBytes(ISO_8859_1))
    assert(rt.nStreams == 1 && rt.text == "", s"got '${rt.text}'")
    // unsupported revision (R 5) likewise degrades cleanly
    val r5 = s.replace("/V 2 /R 3", "/V 5 /R 5")
    assert(Pdf.parse(r5.getBytes(ISO_8859_1)).text == "")
    // and the untampered file still reads (control)
    assert(Pdf.parse(pdf).text.contains("one two three"))
  }

  test("ToUnicode CMap parsing: bfchar, bfrange increment, array, surrogates") {
    // bfchar with a multi-char (ligature) destination
    val m1 = Pdf.parseToUnicode(
      """2 beginbfchar
        |<0041> <0061>
        |<0042> <00660069>
        |endbfchar""".stripMargin)
    assert(m1(0x41) == "a" && m1(0x42) == "fi")
    // bfrange incremental destination: lo..hi map to dst, dst+1, ...
    val m2 = Pdf.parseToUnicode(
      "1 beginbfrange\n<0010> <0012> <0041>\nendbfrange")
    assert(m2 == Map(0x10 -> "A", 0x11 -> "B", 0x12 -> "C"))
    // bfrange array destination: one explicit dst per code
    val m3 = Pdf.parseToUnicode(
      "1 beginbfrange\n<0005> <0007> [<0058> <20AC> <00660066006C>]\nendbfrange")
    assert(m3 == Map(5 -> "X", 6 -> "€", 7 -> "ffl"))
    // surrogate pair destination (U+1F600) decodes to a 2-char string
    val m4 = Pdf.parseToUnicode(
      "1 beginbfchar\n<0009> <D83DDE00>\nendbfchar")
    assert(m4(9) == new String(Character.toChars(0x1F600)))
    // multiple blocks accumulate; codespacerange hex must NOT leak in
    val m5 = Pdf.parseToUnicode(
      """1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 beginbfchar
        |<0001> <0031>
        |endbfchar
        |1 beginbfchar
        |<0002> <0032>
        |endbfchar""".stripMargin)
    assert(m5 == Map(1 -> "1", 2 -> "2"))
  }

  test("CID shows map through the current font; simple fonts stay byte-decoded") {
    val cmap = Map(0x48 -> "H", 0x69 -> "i", 0x21 -> "!")
    val fonts = Map("FC" -> cmap)
    def t(c: String): String = Pdf.extractTextOps(c, fonts)
    // hex show under the CID font: 2-byte groups through the map;
    // unmapped CIDs (0x7777) and an odd trailing byte drop silently
    assert(t("BT /FC 12 Tf <00480069> Tj ET") == "Hi")
    assert(t("BT /FC 12 Tf <0048777700690021> Tj ET") == "Hi!")
    assert(t("BT /FC 12 Tf <004800690021FF> Tj ET") == "Hi!")
    // literal show under the CID font: same 2-byte grouping
    assert(t("BT /FC 12 Tf ( H i) Tj ET") == "Hi")
    // whitespace inside hex strings is legal; odd digit count pads 0
    assert(t("BT /FC 12 Tf <0048 006 9> Tj ET") == "Hi")
    // font switches take effect mid-stream: /F1 is simple (absent from
    // fonts) so its hex decodes byte-per-char, then /FC maps CIDs
    assert(t("BT /F1 10 Tf <4869> Tj T* /FC 10 Tf <00480069> Tj ET") ==
      "Hi\nHi")
    // a Type0 font with an EMPTY map contributes nothing (no mojibake)
    assert(Pdf.extractTextOps("BT /FE 1 Tf <00480069> Tj ET",
      Map("FE" -> Map.empty[Int, String])) == "")
    // TJ arrays of hex strings concatenate with kerns dropped
    assert(t("BT /FC 12 Tf [<0048> -250 <00690021>] TJ ET") == "Hi!")
  }

  test("fixturePdfCid round-trips: plain, RC4, AES — CMap-driven, not pass-through") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu"
    val expected = "Doc 9 (cid) A\n" +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa\n" +
      "lambda mu"
    for (enc <- Seq(None, Some(false), Some(true))) {
      val pdf = Pdf.fixturePdfCid(9L, text, enc)
      val s = new String(pdf, ISO_8859_1)
      assert(s.contains("/Type0") && s.contains("/Identity-H") &&
        s.contains("/ToUnicode"), s"enc=$enc")
      // neither the plaintext nor its shifted-CID hex may appear raw
      assert(!s.contains("alpha beta"), s"enc=$enc leaked plaintext")
      val r = Pdf.parse(pdf)
      assert(r.text == expected, s"enc=$enc got '${r.text}'")
    }
    // tamper the CMap ref to a missing object: Type0 with unreadable
    // ToUnicode must contribute NO text (never raw CID mojibake)
    val s = new String(Pdf.fixturePdfCid(9L, text, None), ISO_8859_1)
    val broken = s.replace("/ToUnicode 7 0 R", "/ToUnicode 99 0 R")
    assert(Pdf.parse(broken.getBytes(ISO_8859_1)).text == "")
  }

  test("/Encrypt resolution anchors to the trailer, not stream content") {
    // An UNENCRYPTED file whose content stream happens to contain the
    // token "/Encrypt 99 0 R" (a PDF documenting PDF syntax — the
    // advisory's case): a whole-file scan finds it, fails to resolve
    // object 99, and flips the file to CryptUnsupported, silently
    // dropping all text. The trailer-anchored search must ignore it.
    val content = "BT (see /Encrypt 99 0 R in trailers) Tj ET"
    val pdf = (s"%PDF-1.4\n9 0 obj << /Length ${content.length} >> stream\n" +
      content + "\nendstream endobj\n" +
      "trailer << /Size 2 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
      .getBytes(ISO_8859_1)
    val r = Pdf.parse(pdf)
    assert(r.text == "see /Encrypt 99 0 R in trailers", s"got '${r.text}'")
    // control: a REAL /Encrypt in the trailer still resolves (the
    // encrypted fixture's trailer carries one and round-trips above)
    // and a trailer-less file still falls back to the whole-file scan
    // (drop the trailer from an encrypted fixture: the /Encrypt ref
    // must still be found and the text still decrypt)
    val enc = new String(Pdf.fixturePdfEncrypted(5L, "x y z", aes = false),
      ISO_8859_1)
    val tAt = enc.lastIndexOf("trailer")
    val gtAt = enc.indexOf(">>", tAt)
    val noTrailer = enc.substring(0, tAt) +
      enc.substring(tAt, gtAt + 2)
        .replace("trailer << ", "").replace(" >>", "")
        .replace("/Size 7 /Root 1 0 R ", "") +
      enc.substring(gtAt + 2)
    assert(Pdf.parse(noTrailer.getBytes(ISO_8859_1)).text.contains("x y z"))
  }

  test("V4 keyLen: /CF subdict /Length (bytes) must not shadow the top-level bits") {
    // A legal V4 dict may omit the top-level /Length while the /CF
    // crypt-filter subdict carries "/Length 16" in BYTES — reading that
    // as bits gives keyLen 2 and rejects a supported file. The default
    // for V4 is 128 bits, so stripping the top-level entry from the
    // AES fixture must leave the text extractable.
    val enc = new String(Pdf.fixturePdfEncrypted(8L, "aes cf case", aes = true),
      ISO_8859_1)
    assert(enc.contains("/Length 128 ") && enc.contains("/CF <<"))
    val stripped = enc.replace("/V 4 /R 4 /Length 128 ", "/V 4 /R 4 ")
    val r = Pdf.parse(stripped.getBytes(ISO_8859_1))
    assert(r.text.contains("aes cf case"), s"got '${r.text}'")
  }

  test("extractTexts: DataFrame pass, binary-safe, per-row independence") {
    val pdfs = Seq(
      (1L, Pdf.fixturePdf(1L, "one two three")),
      (2L, Array[Byte](0x25, 0x50)), // truncated garbage: no streams
      (3L, Pdf.fixturePdf(3L, "a b c d e f g h i j k"))
    ).toDF("id", "payload")
    val out = Pdf.extractTexts(pdfs).orderBy("id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[String]("text") == "Doc 1 (pdf) A\none two three")
    assert(out(0).getAs[Boolean]("xref_ok") && out(0).getAs[Long]("n_streams") == 1L)
    assert(out(1).getAs[String]("text") == "" &&
      out(1).getAs[Long]("n_streams") == 0L && !out(1).getAs[Boolean]("xref_ok"))
    assert(out(2).getAs[String]("text") ==
      "Doc 3 (pdf) A\na b c d e f g h i j\nk")
    assert(out.forall(r =>
      r.getAs[Long]("n_chars") == r.getAs[String]("text").length))
  }

  test("plan shape: one narrow mapPartitions pass, zero exchanges") {
    val pdfs = Seq((1L, Pdf.fixturePdf(1L, "x y z"))).toDF("id", "payload")
    val plan = Pdf.extractTexts(pdfs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("malformed inputs degrade, never throw (review-caught hardening)") {
    // 8-digit hex in a bfchar SRC slot (a surrogate-pair destination
    // shifted into the src position by a dropped token): skipped
    val m = Pdf.parseToUnicode(
      "2 beginbfchar\n<D83DDE00> <0041>\n<0042> <0062>\nendbfchar")
    assert(m == Map(0x42 -> "b"))
    // absurd object numbers in font refs / encrypt refs / lengths must
    // fail to MATCH, not throw NumberFormatException
    val bad = ("%PDF-1.4\n" +
      "3 0 obj << /Type /Page /Resources << /Font << /F1 99999999999 0 R" +
      " >> >> >> endobj\n" +
      "9 0 obj << /Length 99999999999999 >> stream\nBT (ok) Tj ET\n" +
      "endstream endobj\n" +
      "trailer << /Encrypt 88888888888 0 R >>\n" +
      "startxref\n99999999999999999999\n%%EOF\n").getBytes(ISO_8859_1)
    val r = Pdf.parse(bad)
    assert(r.text == "ok" && !r.xrefOk, r)
    // extractTexts backstop: even a parser bug surfaces as an empty
    // row, never a task-killing exception (feed truly pathological
    // bytes through the DataFrame path)
    val rows = Pdf.extractTexts(Seq(
      (1L, bad),
      (2L, Array.fill(64)(0x3c.toByte)) // all '<'
    ).toDF("id", "payload")).orderBy("id").collect()
    assert(rows.length == 2)
  }

  test("stray '<' never swallows later text (hex scan aborts on non-hex)") {
    // binary-ish junk with a lone '<' and no '>' until after a real
    // BT..ET block: the hex-string scan must abort and one-char-skip,
    // preserving the show text that follows
    val t1 = Pdf.extractTextOps("q < junk junk BT (Hello) Tj ET >")
    assert(t1 == "Hello", s"got '$t1'")
    // '<' at very end of stream: no hang, no throw
    assert(Pdf.extractTextOps("BT (x) Tj ET <") == "x")
    // whitespace-only hex content still parses as a hex string
    assert(Pdf.extractTextOps("BT /F 1 Tf <4 8> Tj ET") == "H")
  }

  test("filter cascades: AHx/A85 codecs, array order, encryption composes outside") {
    // codec unit vector: the published "Hello" encoding begins 87cUR
    // (one full group = "Hell"), pinning base-85 digit order
    assert(Pdf.ascii85Decode("87cUR~>".getBytes(ISO_8859_1))
      .map(new String(_, ISO_8859_1)) == Some("Hell"))
    assert(Pdf.ascii85Encode("Hell".getBytes(ISO_8859_1)) == "87cUR~>")
    // z shorthand; partial group; whitespace tolerance
    assert(Pdf.ascii85Decode("z~>".getBytes(ISO_8859_1))
      .map(_.toSeq) == Some(Seq[Byte](0, 0, 0, 0)))
    val round = "graft!".getBytes(ISO_8859_1)
    assert(Pdf.ascii85Decode(
      Pdf.ascii85Encode(round).replace("8", " 8").getBytes(ISO_8859_1))
      .map(_.toSeq) == Some(round.toSeq))
    // a lone trailing char and out-of-range chars are malformed
    assert(Pdf.ascii85Decode("87cUR!~>".getBytes(ISO_8859_1)).isEmpty)
    assert(Pdf.ascii85Decode("\u00ff".getBytes(ISO_8859_1)).isEmpty)
    // AHx: whitespace, odd-digit pad, '>' terminator, bad char
    assert(Pdf.asciiHexDecode("4 86\n5>".getBytes(ISO_8859_1))
      .map(new String(_, ISO_8859_1)) == Some("He"))
    assert(Pdf.asciiHexDecode("47>".getBytes(ISO_8859_1))
      .map(_.toSeq) == Some(Seq('G'.toByte)))
    assert(Pdf.asciiHexDecode("4x>".getBytes(ISO_8859_1)).isEmpty)
    // end-to-end: all three modes, plain and RC4-encrypted, same text
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu"
    val expected = "Doc 7 (pdf) A\n" +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa\n" +
      "lambda mu"
    for (mode <- Seq(0, 1, 2); enc <- Seq(None, Some(false))) {
      val pdf = Pdf.fixturePdfFiltered(7L, text, mode, enc)
      val sdoc = new String(pdf, ISO_8859_1)
      if (mode == 1) assert(sdoc.contains("/ASCIIHexDecode"))
      if (mode == 2) assert(sdoc.contains("/ASCII85Decode"))
      val r = Pdf.parse(pdf)
      assert(r.text == expected, s"mode=$mode enc=$enc got '${r.text}'")
    }
    // unknown filters in a cascade still degrade to no text
    val lzw = ("9 0 obj << /Length 4 /Filter [/LZWDecode /FlateDecode] >>" +
      " stream\nXXXX\nendstream endobj\n").getBytes(ISO_8859_1)
    assert(Pdf.parse(lzw).text == "")
    // an UNREADABLE or unknown predictor still degrades: no text, no
    // garbage (supported predictors have their own test below)
    val pred = ("9 0 obj << /Length 4 /Filter /FlateDecode" +
      " /DecodeParms << /Predictor 12 0 R >> >> stream\nXXXX\nendstream" +
      " endobj\n").getBytes(ISO_8859_1)
    assert(Pdf.parse(pred).text == "")
  }

  test("LZW + RunLength filters: round-trips, EarlyChange, ObjStm, degrades") {
    // codec round-trips, including table growth PAST the 9->10-bit
    // width boundary (the tabulated sequence creates >500 dict
    // entries) under BOTH EarlyChange schedules
    val long = Array.tabulate[Byte](6000)(i =>
      ((i * 31 + (i >> 3) * 7 + (i >> 7) * 13) % 251).toByte)
    for (ec <- Seq(0, 1)) {
      val enc = Pdf.lzwEncode(long, ec)
      assert(Pdf.lzwDecode(enc, ec).map(_.toSeq) == Some(long.toSeq),
        s"ec=$ec long round-trip")
    }
    // the two schedules genuinely diverge: decoding an ec=1 stream
    // with ec=0 must NOT silently reproduce the input
    assert(Pdf.lzwDecode(Pdf.lzwEncode(long, 1), 0)
      .map(_.toSeq) != Some(long.toSeq))
    // KwKwK (code == next, the entry still being built)
    val kwk = Array.tabulate[Byte](64)(i =>
      (if (i % 2 == 0) 'a' else 'b').toByte)
    assert(Pdf.lzwDecode(Pdf.lzwEncode(kwk)).map(_.toSeq) == Some(kwk.toSeq))
    assert(Pdf.lzwDecode(Pdf.lzwEncode(Array.empty[Byte]))
      .map(_.toSeq) == Some(Seq.empty[Byte]))
    // malformed: a first code referencing an undefined table slot
    // (9-bit 258 = bytes 0x81 0x00) degrades, never garbage
    assert(Pdf.lzwDecode(Array(0x81.toByte, 0x00.toByte)).isEmpty)
    // TRUNCATED streams degrade even when the cut code's consumed
    // prefix bits are zero (review-caught: >=8 residual bits is an
    // unfinished code, not byte-alignment pad).
    // The explicit shape: a lone zero byte is 8 residual bits — an
    // unfinished 9-bit code, NOT byte-alignment pad -> must degrade
    assert(Pdf.lzwDecode(Array[Byte](0)).isEmpty)
    // while <=7 residual zero bits after complete codes stay lenient
    // (missing EOD): 2 bytes = one 9-bit literal + 7 zero pad bits
    assert(Pdf.lzwDecode(Array[Byte](0x30, 0x80.toByte))
      .map(_.toSeq) == Some(Seq('a'.toByte)))
    // RunLength: mixed literal/repeat round-trip + spec vectors
    val mixed = ("aaaaabcdefgggggggggggghi" + "x" * 300).getBytes("US-ASCII")
    assert(Pdf.runLengthDecode(Pdf.runLengthEncode(mixed))
      .map(_.toSeq) == Some(mixed.toSeq))
    assert(Pdf.runLengthDecode(Array[Byte](2, 'a', 'b', 'c'))
      .map(_.toSeq) == Some("abc".getBytes("US-ASCII").toSeq))
    assert(Pdf.runLengthDecode(Array[Byte](254.toByte, 'z'))
      .map(_.toSeq) == Some(Seq.fill(3)('z'.toByte)))
    // truncated literal run / truncated repeat run degrade; EOD stops
    assert(Pdf.runLengthDecode(Array[Byte](5, 1, 2)).isEmpty)
    assert(Pdf.runLengthDecode(Array[Byte](200.toByte)).isEmpty)
    assert(Pdf.runLengthDecode(Array[Byte](0, 'q', 128.toByte, 9, 9))
      .map(_.toSeq) == Some(Seq('q'.toByte)))
    // end-to-end: the four content-stream lanes + the LZW ObjStm twin
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu"
    val expected = "Doc 5 (pdf) A\n" +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa\n" +
      "lambda mu"
    for (mode <- Seq(0, 1, 2, 3)) {
      val pdf = Pdf.fixturePdfLzw(5L, text, mode)
      val sdoc = new String(pdf, ISO_8859_1)
      if (mode == 2) assert(sdoc.contains("/RunLengthDecode"))
      else assert(sdoc.contains("/LZWDecode"))
      if (mode == 1) assert(sdoc.contains("/Predictor 12"))
      if (mode == 3) assert(sdoc.contains("/EarlyChange 0"))
      val r = Pdf.parse(pdf)
      assert(r.text == expected, s"mode=$mode got '${r.text}'")
    }
    val objstm = Pdf.fixturePdfCidObjStm(5L, text, predictor = true,
      lzw = true)
    val so = new String(objstm, ISO_8859_1)
    assert(so.contains("/LZWDecode") && so.contains("/Predictor 12") &&
      so.contains("/ObjStm") && !so.contains("/Type0"))
    val ro = Pdf.parse(objstm)
    assert(ro.xrefOk && ro.nStreams == 3, ro)
    assert(ro.text == expected.replace("(pdf)", "(cid)"), s"got '${ro.text}'")
    // a CORRUPT LZW content stream degrades to no text
    val bad = ("9 0 obj << /Length 2 /Filter /LZWDecode >> stream\n")
      .getBytes(ISO_8859_1) ++ Array(0x81.toByte, 0x00.toByte) ++
      "\nendstream endobj\n".getBytes(ISO_8859_1)
    assert(Pdf.parse(bad).text == "")
    // an /EarlyChange value outside {0,1} is unreadable: stream drops
    val badEc = ("9 0 obj << /Length 4 /Filter /LZWDecode" +
      " /DecodeParms << /EarlyChange 2 >> >> stream\nXXXX\n" +
      "endstream endobj\n").getBytes(ISO_8859_1)
    assert(Pdf.parse(badEc).text == "")
  }

  test("image XObjects: DCT bytes extract through cascades; non-DCT degrades") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val jpeg = graft.operators.Multimodal.dhashImageJpeg(42L)
    for (mode <- Seq(0, 1)) {
      val pdf = Pdf.fixturePdfImage(42L, text, jpeg, mode)
      val sdoc = new String(pdf, ISO_8859_1)
      assert(sdoc.contains("/DCTDecode") && sdoc.contains("/Im1"))
      if (mode == 1) assert(sdoc.contains("/ASCIIHexDecode"))
      // the embedded bytes come back EXACTLY (cascades undone, JPEG
      // untouched) — identical bytes are what makes the cross-door
      // dHash pairing exact despite JPEG's lossy decode
      val imgs = Pdf.extractImageBytes(pdf)
      assert(imgs.length == 1, s"mode=$mode n=${imgs.length}")
      assert(imgs(0).toSeq == jpeg.toSeq, s"mode=$mode bytes differ")
      // the imageio path decodes what came out
      assert(graft.operators.Multimodal.imageDHash(imgs(0)).isDefined)
      // and TEXT extraction still works on the same file (the Do/cm
      // operators are inert to the text machine)
      val r = Pdf.parse(pdf)
      assert(r.xrefOk && r.nStreams == 2 && r.text.startsWith("Doc 42"), r)
    }
    // raw-sample lanes (r19, p162): Flate+Predictor-15 at REAL image
    // geometry (/Colors 3, bpp-3 left neighbors) and LZW — both
    // LOSSLESS, so the extracted image's dHash equals the closed-form
    // expectedDHash exactly
    val rgb = graft.operators.Multimodal.dhashImageRgbBytes(42L)
    for (mode <- Seq(0, 1, 2)) {
      val pdf = Pdf.fixturePdfImageRaw(42L, text, rgb, 72, 64, mode)
      val sdoc = new String(pdf, ISO_8859_1)
      if (mode == 0) assert(sdoc.contains("/Predictor 15") &&
        sdoc.contains("/Colors 3") && sdoc.contains("/DeviceRGB"))
      if (mode == 1) assert(sdoc.contains("/LZWDecode"))
      if (mode == 2) assert(sdoc.contains("/DeviceGray") &&
        sdoc.contains("/Colors 1"))
      val imgs = Pdf.extractImageBytes(pdf)
      assert(imgs.length == 1, s"raw mode=$mode n=${imgs.length}")
      assert(graft.operators.Multimodal.imageDHash(imgs(0)) ==
        Some(graft.operators.Multimodal.expectedDHash(42L)),
        s"raw mode=$mode dhash")
      val r = Pdf.parse(pdf)
      assert(r.xrefOk && r.text.startsWith("Doc 42"), r)
    }
    // a geometry/sample-count mismatch degrades — no wrong image
    val short = java.util.Arrays.copyOf(rgb, rgb.length - 3)
    val bad = Pdf.fixturePdfImageRaw(42L, text,
      java.util.Arrays.copyOf(short, rgb.length), 72, 64, 1)
    // (same length, zero-padded tail: still extracts — length is the
    // guard, content is free) — now a DECLARED-size mismatch:
    val lying = new String(Pdf.fixturePdfImageRaw(42L, text, rgb, 72, 64, 1),
      ISO_8859_1).replace("/Width 72", "/Width 71").getBytes(ISO_8859_1)
    assert(Pdf.extractImageBytes(lying).isEmpty)
    assert(Pdf.extractImageBytes(bad).length == 1)
    // an image-free PDF yields no images
    assert(Pdf.extractImageBytes(Pdf.fixturePdf(42L, text)).isEmpty)
    // raw-sample guards (raw Flate IS in the subset since r19, so
    // these pin the DEGRADES): corrupt deflate and missing /ColorSpace
    val flate = ("6 0 obj << /Type /XObject /Subtype /Image /Width 8" +
      " /Height 8 /BitsPerComponent 8 /Filter /FlateDecode /Length 4" +
      " >> stream\nXXXX\nendstream endobj\n").getBytes(ISO_8859_1)
    assert(Pdf.extractImageBytes(flate).isEmpty)
    // a /Decode remap array means the stored samples are not the
    // rendered ones — no image, never a WRONG one (review-caught)
    val inverted = new String(
      Pdf.fixturePdfImageRaw(42L, text, rgb, 72, 64, 0), ISO_8859_1)
      .replace("/BitsPerComponent 8", "/BitsPerComponent 8 /Decode [1 0]")
      .getBytes(ISO_8859_1)
    assert(Pdf.extractImageBytes(inverted).isEmpty)
    // a stencil mask (/ImageMask true) and an /SMask TARGET are not
    // content — both skipped (review-caught: an alpha mask passes
    // every raw-branch guard and its gradient dHash collides across
    // unrelated docs)
    val stencil = new String(
      Pdf.fixturePdfImageRaw(42L, text, rgb, 72, 64, 2), ISO_8859_1)
      .replace("/ColorSpace /DeviceGray",
        "/ColorSpace /DeviceGray /ImageMask true").getBytes(ISO_8859_1)
    assert(Pdf.extractImageBytes(stencil).isEmpty)
    val masked = new String(
      Pdf.fixturePdfImageRaw(42L, text, rgb, 72, 64, 2), ISO_8859_1)
      .replace("/Contents 4 0 R", "/Contents 4 0 R /SMask 6 0 R")
      .getBytes(ISO_8859_1)
    assert(Pdf.extractImageBytes(masked).isEmpty)
    // RunLength-final raw samples are in the subset too (the same
    // pipeline decodes them)
    val rlGray = Array.tabulate[Byte](72 * 64)(i => rgb(i * 3))
    val rlPdf = ("6 0 obj << /Type /XObject /Subtype /Image /Width 72" +
      " /Height 64 /ColorSpace /DeviceGray /BitsPerComponent 8" +
      " /Filter /RunLengthDecode /Length " +
      s"${Pdf.runLengthEncode(rlGray).length} >> stream\n")
      .getBytes(ISO_8859_1) ++ Pdf.runLengthEncode(rlGray) ++
      "\nendstream endobj\n".getBytes(ISO_8859_1)
    val rlImgs = Pdf.extractImageBytes(rlPdf)
    assert(rlImgs.length == 1)
    assert(graft.operators.Multimodal.imageDHash(rlImgs(0)) ==
      Some(graft.operators.Multimodal.expectedDHash(42L)))
  }

  test("xref-stream trailers: /Root, /ID, /Encrypt resolve through startxref") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu"
    val expected = "Doc 11 (cid) A\n" +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa\n" +
      "lambda mu"
    for (enc <- Seq(None, Some(false), Some(true))) {
      val pdf = Pdf.fixturePdfXrefStream(11L, text, enc)
      val sdoc = new String(pdf, ISO_8859_1)
      // genuinely no classical trailer, fonts invisible (ObjStm), and
      // the xref entries ride a predictor
      assert(!sdoc.contains("trailer") && !sdoc.contains("/Type0"))
      assert(sdoc.contains("/XRef") && sdoc.contains("/Predictor 12"))
      val r = Pdf.parse(pdf)
      assert(r.xrefOk, s"enc=$enc xrefOk")
      assert(r.nStreams == 4, s"enc=$enc nStreams=${r.nStreams}")
      assert(r.text == expected, s"enc=$enc got '${r.text}'")
    }
    // a startxref that points nowhere: xrefOk false; the PLAIN lane
    // still extracts (object scan is offset-free), and the ENCRYPTED
    // lane still finds /Encrypt through the lenient whole-file
    // fallback — never garbage either way
    def breakStartxref(pdf: Array[Byte]): Array[Byte] = {
      val sd = new String(pdf, ISO_8859_1)
      (sd.substring(0, sd.lastIndexOf("startxref")) +
        "startxref\n0\n%%EOF\n").getBytes(ISO_8859_1)
    }
    val rb = Pdf.parse(breakStartxref(Pdf.fixturePdfXrefStream(11L, text)))
    assert(!rb.xrefOk && rb.text == expected, rb.xrefOk + " " + rb.text)
    val re = Pdf.parse(breakStartxref(
      Pdf.fixturePdfXrefStream(11L, text, Some(false))))
    assert(!re.xrefOk && re.text == expected, re.xrefOk + " " + re.text)
  }

  test("stream predictors: PNG row filters, TIFF differencing, parms alignment") {
    // round-trips through the writer-side encoders: the PNG encoder
    // cycles tags 0..4 so None/Sub/Up/Average/Paeth are ALL exercised,
    // and the data length is deliberately NOT a multiple of columns
    // (partial final row, as real encoders emit)
    val data = (0 until 203).map(i => ((i * 37 + i / 16) % 251).toByte).toArray
    val png = Pdf.PredParms(12, 1, 8, 16)
    assert(Pdf.unpredict(Pdf.pngPredictEncode(data, 16), png)
      .map(_.toSeq) == Some(data.toSeq))
    val tiff = Pdf.PredParms(2, 1, 8, 16)
    assert(Pdf.unpredict(Pdf.tiffPredictEncode(data, 16), tiff)
      .map(_.toSeq) == Some(data.toSeq))
    // predictor 1 is a pass-through; unknown values and unknown PNG
    // row tags are malformed; a tag byte with no row data is malformed
    assert(Pdf.unpredict(data, Pdf.PredParms(1, 1, 8, 16))
      .map(_.toSeq) == Some(data.toSeq))
    assert(Pdf.unpredict(data, Pdf.PredParms(7, 1, 8, 16)).isEmpty)
    assert(Pdf.unpredict(Array[Byte](5, 1, 2), png).isEmpty)
    assert(Pdf.unpredict(Array[Byte](0, 1, 2, 3), Pdf.PredParms(12, 1, 8, 3))
      .map(_.toSeq) == Some(Seq[Byte](1, 2, 3)))
    // TIFF sub-byte components are out of subset; absurd geometry too
    assert(Pdf.unpredict(data, Pdf.PredParms(2, 1, 4, 16)).isEmpty)
    assert(Pdf.unpredict(data, Pdf.PredParms(12, 3, 8, 900000000)).isEmpty)
    // crafted geometry INSIDE the bit guard (130*8*1e6 bits) on a tiny
    // stream must clamp its buffers to the data, not allocate
    // declared-row-sized arrays (review-caught); identity row decodes
    val tiny = Array[Byte](0, 1, 2, 3) // tag 0 + 3 bytes
    assert(Pdf.unpredict(tiny, Pdf.PredParms(12, 130, 8, 1000000))
      .map(_.toSeq) == Some(Seq[Byte](1, 2, 3)))
    // end-to-end: the three content-stream lanes + the ObjStm twin
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu"
    val expected = "Doc 5 (pdf) A\n" +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa\n" +
      "lambda mu"
    for (mode <- Seq(0, 1, 2)) {
      val pdf = Pdf.fixturePdfPredictor(5L, text, mode)
      val sdoc = new String(pdf, ISO_8859_1)
      assert(sdoc.contains("/Predictor " + (if (mode == 1) "2" else "12")))
      if (mode == 2) assert(sdoc.contains("[null <<"))
      val r = Pdf.parse(pdf)
      assert(r.text == expected, s"mode=$mode got '${r.text}'")
    }
    val objstm = Pdf.fixturePdfCidObjStm(5L, text, predictor = true)
    val so = new String(objstm, ISO_8859_1)
    assert(so.contains("/Predictor 12") && so.contains("/ObjStm") &&
      !so.contains("/Type0"))
    val ro = Pdf.parse(objstm)
    assert(ro.xrefOk && ro.nStreams == 3, ro)
    assert(ro.text == expected.replace("(pdf)", "(cid)"), s"got '${ro.text}'")
    // explicit literal /Predictor 1 is the spec-default pass-through:
    // the stream must DECODE, not drop (review-caught)
    def defl(b: Array[Byte]): Array[Byte] = {
      val dd = new java.util.zip.Deflater()
      dd.setInput(b); dd.finish()
      val o = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      while (!dd.finished()) o.write(buf, 0, dd.deflate(buf))
      dd.end(); o.toByteArray
    }
    val body1 = defl("BT (ok) Tj ET".getBytes(ISO_8859_1))
    val p1 = (s"9 0 obj << /Length ${body1.length} /Filter /FlateDecode" +
      " /DecodeParms << /Predictor 1 >> >> stream\n").getBytes(ISO_8859_1) ++
      body1 ++ "\nendstream endobj\n".getBytes(ISO_8859_1)
    assert(Pdf.parse(p1).text == "ok", Pdf.parse(p1).text)
    // a predictor'd parms entry PAST the filter list is unreadable
    val bad = ("9 0 obj << /Length 4 /Filter /FlateDecode /DecodeParms" +
      " [null << /Predictor 12 /Columns 4 >>] >> stream\nXXXX\n" +
      "endstream endobj\n").getBytes(ISO_8859_1)
    assert(Pdf.parse(bad).text == "")
    // indirect geometry (present but unreadable) drops the stream
    // rather than decode with a guessed default
    val ind = ("9 0 obj << /Length 4 /Filter /FlateDecode /DecodeParms" +
      " << /Predictor 12 /Columns 16 0 R >> >> stream\nXXXX\n" +
      "endstream endobj\n").getBytes(ISO_8859_1)
    assert(Pdf.parse(ind).text == "")
    // a WHOLLY indirect /DecodeParms value ('/DecodeParms 12 0 R')
    // may hide a predictor the subset cannot see: the stream must
    // DROP, not decode without un-predicting (advisor-caught) — the
    // flate body is valid, so a missed guard would emit its text
    val wholeInd = (s"9 0 obj << /Length ${body1.length} /Filter" +
      " /FlateDecode /DecodeParms 12 0 R >> stream\n")
      .getBytes(ISO_8859_1) ++ body1 ++
      "\nendstream endobj\n".getBytes(ISO_8859_1)
    assert(Pdf.parse(wholeInd).text == "")
    val wholeIndDp = (s"9 0 obj << /Length ${body1.length} /Filter" +
      " /FlateDecode /DP 12 0 R >> stream\n")
      .getBytes(ISO_8859_1) ++ body1 ++
      "\nendstream endobj\n".getBytes(ISO_8859_1)
    assert(Pdf.parse(wholeIndDp).text == "")
    // ...but the legal bare-null form means NO parms and must DECODE
    // (review-caught: the indirect-value guard was over-dropping it)
    val nullParms = (s"9 0 obj << /Length ${body1.length} /Filter" +
      " /FlateDecode /DecodeParms null >> stream\n")
      .getBytes(ISO_8859_1) ++ body1 ++
      "\nendstream endobj\n".getBytes(ISO_8859_1)
    assert(Pdf.parse(nullParms).text == "ok", Pdf.parse(nullParms).text)
  }

  test("/ObjStm: compressed-resident page + font dicts resolve (PDF 1.5 CID path)") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu"
    val expected = "Doc 9 (cid) A\n" +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa\n" +
      "lambda mu"
    val pdf = Pdf.fixturePdfCidObjStm(9L, text)
    val sdoc = new String(pdf, ISO_8859_1)
    // the fonts are genuinely invisible in the raw bytes
    assert(sdoc.contains("/ObjStm") && !sdoc.contains("/Type0") &&
      !sdoc.contains("/F1"))
    val r = Pdf.parse(pdf)
    assert(r.xrefOk && r.nStreams == 3, r) // content + CMap + ObjStm
    assert(r.text == expected, s"got '${r.text}'")
    // a corrupt ObjStm (undecodable) loses the font reference itself,
    // so the CID hex falls to the simple-font byte path: the result
    // must carry NO recognizable text (a few control-char line scraps
    // are the documented floor — the /Font map was inside the broken
    // stream, so "this name is Type0" is unknowable) and never throw
    val at = sdoc.indexOf("/ObjStm")
    val streamAt = sdoc.indexOf("stream", at)
    val broken = pdf.clone()
    broken(streamAt + 8) = 0x00 // corrupt the first deflate byte
    val rb = Pdf.parse(broken)
    assert(!rb.text.contains("alpha") && !rb.text.contains("Doc"), rb.text)
    // malformed N/First clamp instead of throwing
    val badN = sdoc.replace("/N 3 ", "/N 999999999 ")
    assert(Pdf.parse(badN.getBytes(ISO_8859_1)).text == expected)
    val badFirst = sdoc.replace(s"/First ", "/First 999999 X")
    Pdf.parse(badFirst.getBytes(ISO_8859_1)) // must not throw
  }

  test("AES-256 (V5): R5 and R6 empty-password round-trips, tamper rejection") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu"
    val expected = "Doc 7 (pdf) A\n" +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa\n" +
      "lambda mu"
    for (r6 <- Seq(false, true)) {
      val pdf = Pdf.fixturePdfEncryptedV5(7L, text, r6)
      val sdoc = new String(pdf, ISO_8859_1)
      assert(sdoc.contains("/V 5") && sdoc.contains("/AESV3"), s"r6=$r6")
      assert(sdoc.contains(if (r6) "/R 6" else "/R 5"))
      assert(!sdoc.contains("alpha beta"), s"r6=$r6 leaked plaintext")
      val r = Pdf.parse(pdf)
      assert(r.xrefOk && r.nStreams == 1, s"r6=$r6")
      assert(r.text == expected, s"r6=$r6 got '${r.text}'")
      // R5 and R6 derive DIFFERENT hashes from the same salts: the /U
      // of one must not validate under the other's revision
      val flipped = sdoc.replace(
        if (r6) "/R 6" else "/R 5", if (r6) "/R 5" else "/R 6")
      assert(Pdf.parse(flipped.getBytes(ISO_8859_1)).text == "",
        s"r6=$r6 cross-revision /U must not validate")
      // tampered /U hash: validation fails, no text, no garbage
      val uAt = sdoc.indexOf("/U <") + 4
      val tampered = sdoc.substring(0, uAt) +
        (if (sdoc.charAt(uAt) == '0') '1' else '0') + sdoc.substring(uAt + 1)
      assert(Pdf.parse(tampered.getBytes(ISO_8859_1)).text == "")
    }
    // Algorithm 2.B is deterministic and R5 != R6 on identical input
    val h5 = Pdf.hash2B(Array.empty, Array.fill(8)(1: Byte), Array.empty, 5)
    val h6 = Pdf.hash2B(Array.empty, Array.fill(8)(1: Byte), Array.empty, 6)
    assert(h5.length == 32 && h6.length == 32)
    assert(!java.util.Arrays.equals(h5, h6))
    assert(java.util.Arrays.equals(h6,
      Pdf.hash2B(Array.empty, Array.fill(8)(1: Byte), Array.empty, 6)))
    // V5 without AESV3 (an exotic CFM) stays unsupported
    val pdf6 = new String(Pdf.fixturePdfEncryptedV5(7L, text, r6 = true),
      ISO_8859_1)
    assert(Pdf.parse(pdf6.replace("/AESV3", "/AESXX")
      .getBytes(ISO_8859_1)).text == "")
  }

  test("a /Filter the parser cannot read drops the stream (no raw passthrough)") {
    // indirect filter spec: legal PDF, out of subset — the stream must
    // contribute nothing, never its raw encoded bytes
    val pdf = ("9 0 obj << /Length 14 /Filter 12 0 R >> stream\n" +
      "BT (raw) Tj ET\nendstream endobj\n").getBytes(ISO_8859_1)
    assert(Pdf.parse(pdf).text == "")
  }
}
