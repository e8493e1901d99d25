package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Table-driven + deterministic-fuzz lock on the two HTML5-spec
 * surfaces the r18/r19 advisors kept finding edges in:
 * `decode_html_entities` (HashExpressions.DecodeHtmlEntities) and the
 * charset prescan (`WarcSource.prescanCharset` / `decodeText`).
 * The reference tables ride IN THE TEST, independently transcribed
 * from the published specs (HTML 4.01 §24.2 Latin-1 entity table;
 * HTML5 §13.2.3.2 meta prescan; WHATWG encoding spec cp1252 index),
 * so a drift in either implementation fails against public data, not
 * against itself.
 */
class EntityCharsetFuzzSpec extends AnyFunSuite {
  private def dec(s: String): String =
    graft.functions.HashExpressions.DecodeHtmlEntities.decode(s)

  // HTML 4.01 §24.2: all 96 Latin-1 names, independently transcribed
  // (name -> codepoint). The implementation builds its table from a
  // positional list; this one is explicit pairs.
  private val Latin1: Seq[(String, Int)] = Seq(
    "nbsp" -> 160, "iexcl" -> 161, "cent" -> 162, "pound" -> 163,
    "curren" -> 164, "yen" -> 165, "brvbar" -> 166, "sect" -> 167,
    "uml" -> 168, "copy" -> 169, "ordf" -> 170, "laquo" -> 171,
    "not" -> 172, "shy" -> 173, "reg" -> 174, "macr" -> 175,
    "deg" -> 176, "plusmn" -> 177, "sup2" -> 178, "sup3" -> 179,
    "acute" -> 180, "micro" -> 181, "para" -> 182, "middot" -> 183,
    "cedil" -> 184, "sup1" -> 185, "ordm" -> 186, "raquo" -> 187,
    "frac14" -> 188, "frac12" -> 189, "frac34" -> 190, "iquest" -> 191,
    "Agrave" -> 192, "Aacute" -> 193, "Acirc" -> 194, "Atilde" -> 195,
    "Auml" -> 196, "Aring" -> 197, "AElig" -> 198, "Ccedil" -> 199,
    "Egrave" -> 200, "Eacute" -> 201, "Ecirc" -> 202, "Euml" -> 203,
    "Igrave" -> 204, "Iacute" -> 205, "Icirc" -> 206, "Iuml" -> 207,
    "ETH" -> 208, "Ntilde" -> 209, "Ograve" -> 210, "Oacute" -> 211,
    "Ocirc" -> 212, "Otilde" -> 213, "Ouml" -> 214, "times" -> 215,
    "Oslash" -> 216, "Ugrave" -> 217, "Uacute" -> 218, "Ucirc" -> 219,
    "Uuml" -> 220, "Yacute" -> 221, "THORN" -> 222, "szlig" -> 223,
    "agrave" -> 224, "aacute" -> 225, "acirc" -> 226, "atilde" -> 227,
    "auml" -> 228, "aring" -> 229, "aelig" -> 230, "ccedil" -> 231,
    "egrave" -> 232, "eacute" -> 233, "ecirc" -> 234, "euml" -> 235,
    "igrave" -> 236, "iacute" -> 237, "icirc" -> 238, "iuml" -> 239,
    "eth" -> 240, "ntilde" -> 241, "ograve" -> 242, "oacute" -> 243,
    "ocirc" -> 244, "otilde" -> 245, "ouml" -> 246, "divide" -> 247,
    "oslash" -> 248, "ugrave" -> 249, "uacute" -> 250, "ucirc" -> 251,
    "uuml" -> 252, "yacute" -> 253, "thorn" -> 254, "yuml" -> 255)

  test("every HTML4 Latin-1 name decodes; named == numeric == hex") {
    for ((name, cp) <- Latin1) {
      // nbsp itself decodes to the nbsp CHARACTER here (the cleaning
      // chain normalizes it to a space later, a separate stage)
      val want = new String(Character.toChars(cp))
      assert(dec(s"&$name;") == want, s"&$name;")
      assert(dec(s"&#$cp;") == want, s"&#$cp;")
      assert(dec(f"&#x$cp%X;") == want, f"&#x$cp%X;")
      assert(dec(f"&#x$cp%x;") == want, s"lowercase hex $name")
    }
  }

  test("HTML5 uppercase legacy aliases (the r19 advisor fix)") {
    assert(dec("&AMP;") == "&" && dec("&LT;") == "<" &&
      dec("&GT;") == ">" && dec("&QUOT;") == "\"")
    assert(dec("&COPY;") == "©" && dec("&REG;") == "®" &&
      dec("&TRADE;") == "™")
    // but HTML5 defines NO uppercase alias for the rest of the table
    assert(dec("&NBSP;") == "&NBSP;")
    assert(dec("&EACUTE;") == "&EACUTE;")
  }

  test("numeric references: cp1252 remap window per the encoding spec") {
    // WHATWG encoding spec, windows-1252 index: &#128;..&#159; remap
    // to the cp1252 characters browsers render (Word-exported pages)
    val cp1252: Map[Int, Int] = Map(
      128 -> 0x20AC, 130 -> 0x201A, 131 -> 0x0192, 132 -> 0x201E,
      133 -> 0x2026, 134 -> 0x2020, 135 -> 0x2021, 136 -> 0x02C6,
      137 -> 0x2030, 138 -> 0x0160, 139 -> 0x2039, 140 -> 0x0152,
      142 -> 0x017D, 145 -> 0x2018, 146 -> 0x2019, 147 -> 0x201C,
      148 -> 0x201D, 149 -> 0x2022, 150 -> 0x2013, 151 -> 0x2014,
      152 -> 0x02DC, 153 -> 0x2122, 154 -> 0x0161, 155 -> 0x203A,
      156 -> 0x0153, 158 -> 0x017E, 159 -> 0x0178)
    for ((src, want) <- cp1252)
      assert(dec(s"&#$src;") == new String(Character.toChars(want)),
        s"&#$src;")
    // the five cp1252 holes map to nothing printable: pass through
    for (hole <- Seq(129, 141, 143, 144, 157))
      assert(dec(s"&#$hole;") == s"&#$hole;", s"hole $hole")
  }

  test("numeric references: control/surrogate/out-of-range discipline") {
    // TAB/LF/CR are inline whitespace to a renderer -> plain space
    // (a raw LF would forge a paragraph break in htmlToText)
    assert(dec("&#9;") == " " && dec("&#10;") == " " && dec("&#13;") == " ")
    // other controls, DEL, NUL: source text intact, never a control
    // char into the corpus
    for (c <- Seq(0, 1, 8, 11, 31, 127))
      assert(dec(s"&#$c;") == s"&#$c;", s"control $c")
    // surrogates and beyond-Unicode: intact
    assert(dec("&#xD800;") == "&#xD800;")
    assert(dec("&#xDFFF;") == "&#xDFFF;")
    assert(dec("&#x110000;") == "&#x110000;")
    // accumulator clamp: absurd digit strings neither overflow nor
    // decode (within the 32-char numeric window)
    assert(dec("&#99999999999999999999999999;") ==
      "&#99999999999999999999999999;")
    // zero-padding decodes (browsers do) ...
    assert(dec("&#0000000233;") == "é")
    assert(dec("&#x0000000E9;") == "é")
    // ... until the terminator falls outside the bounded 32-char
    // window (the O(n*m) guard)
    assert(dec("&#" + "0" * 40 + "233;") == "&#" + "0" * 40 + "233;")
  }

  test("no semicolon, unknown names, bare ampersands: intact") {
    assert(dec("&amp x") == "&amp x")
    assert(dec("&bogus;") == "&bogus;")
    assert(dec("R&D; A&B") == "R&D; A&B") // D is not a known name
    assert(dec("&;") == "&;")
    assert(dec("&#;") == "&#;")
    assert(dec("&#x;") == "&#x;")
    assert(dec("a & b && c &") == "a & b && c &")
    // pass-once: double-encoded text surfaces the single encoding
    assert(dec("&amp;amp;") == "&amp;")
    assert(dec("&amp;#233;") == "&#233;")
  }

  test("fuzz: encode->decode round-trips arbitrary text (seeded)") {
    val rnd = new scala.util.Random(42)
    def encode(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }
    for (_ <- 0 until 500) {
      val s = (0 until rnd.nextInt(60)).map { _ =>
        rnd.nextInt(6) match {
          case 0 => "&"
          case 1 => Seq("<", ">", "\"", ";", "#").apply(rnd.nextInt(5))
          case 2 => ('a' + rnd.nextInt(26)).toChar.toString
          case 3 => rnd.nextInt(10).toString
          case 4 => Seq("é", "ü", "€", "中", "😀")
            .apply(rnd.nextInt(5))
          case _ => " "
        }
      }.mkString
      assert(dec(encode(s)) == s, s"round-trip of ${s.take(80)}")
    }
  }

  test("fuzz: random safe codepoints decode through hex references (seeded)") {
    val rnd = new scala.util.Random(7)
    var n = 0
    while (n < 500) {
      val cp = rnd.nextInt(0x10FFFF) + 1
      val safe = cp >= 0x20 && cp != 0x7F && !(cp >= 0x80 && cp <= 0x9F) &&
        !(cp >= 0xD800 && cp <= 0xDFFF)
      if (safe) {
        assert(dec(f"&#x$cp%X;") == new String(Character.toChars(cp)),
          f"&#x$cp%X;")
        n += 1
      }
    }
  }

  // ------------------------------------------------ charset prescan

  private def prescan(head: String): Option[String] =
    graft.sources.WarcSource.prescanCharset(head)

  test("prescan: HTML5 meta forms, quoting, and hijack guards") {
    assert(prescan("<meta charset=utf-8>") == Some("utf-8"))
    assert(prescan("""<meta charset="ISO-8859-1">""") == Some("ISO-8859-1"))
    assert(prescan("<meta charset='big5'>") == Some("big5"))
    assert(prescan(
      """<meta http-equiv="Content-Type" content="text/html; charset=big5">""")
      == Some("big5"))
    // attribute order + case-insensitive http-equiv value
    assert(prescan(
      """<meta content="text/html; charset=gbk" http-equiv=CONTENT-TYPE>""")
      == Some("gbk"))
    // a charset= substring in an unrelated attribute must NOT hijack
    assert(prescan(
      """<meta name=description content="fix charset=big5 errors">""").isEmpty)
    // content WITHOUT http-equiv is not a declaration
    assert(prescan(
      """<meta content="text/html; charset=big5">""").isEmpty)
    // quoted '>' inside a value doesn't truncate the tag capture
    assert(prescan("""<meta content="a > b" charset=big5>""") == Some("big5"))
    // bare apostrophe in an unquoted value neither truncates nor
    // pairs with a later quote
    assert(prescan("""<meta content=O'Brien charset=shift_jis>""")
      == Some("shift_jis"))
    // first declaration wins (document order, as the prescan walks)
    assert(prescan("<meta charset=utf-8><meta charset=big5>")
      == Some("utf-8"))
    // an EMPTY charset attribute is no declaration; scanning continues
    assert(prescan("""<meta charset=""><meta charset=big5>""")
      == Some("big5"))
    assert(prescan("no meta here at all").isEmpty)
  }

  test("decodeText: BOM > header > prescan > UTF-8; utf-16 label remap") {
    def dt(bytes: Array[Byte], ct: String): String =
      graft.sources.WarcSource.decodeText(bytes, ct)
    // BOM beats a contradicting header
    val bomUtf8 = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
      "café".getBytes("UTF-8")
    assert(dt(bomUtf8, "text/html; charset=ISO-8859-1") == "café")
    // header charset decodes legacy bytes
    assert(dt("café".getBytes("ISO-8859-1"),
      "text/html; charset=ISO-8859-1") == "café")
    // prescan applies to html only; unknown names fall through to
    // UTF-8 (REPLACE, never throw)
    val meta = """<meta charset=ISO-8859-1>caf""".getBytes("ISO-8859-1") ++
      Array(0xE9.toByte)
    assert(dt(meta, "text/html").endsWith("café"))
    assert(dt(Array(0xE9.toByte), "text/plain; charset=no-such-charset")
      == "�")
    // a BOM-less utf-16 LABEL is an authoring error: remapped to
    // UTF-8 per the HTML5 prescan rule (8-bit bytes as UTF-16 would
    // mojibake the whole body)
    assert(dt("plain ascii".getBytes("US-ASCII"),
      "text/html; charset=utf-16") == "plain ascii")
  }
}
