package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{HashExpressions => HE, TextFunctions => TF}

/**
 * Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation
 * of Rare Words with Subword Units" — the public algorithm): learn a
 * merge list from a bounded sample, then segment every corpus word into
 * subwords by replaying the merges in order. This upgrades the
 * "BPE-ish regex" token counter (P10) to a real trained subword
 * tokenizer while keeping the engine's two scale rules: the trained
 * artifact is O(numMerges) and rides as expression literals, and
 * corpus encoding is ONE narrow scan through a native expression.
 *
 * Determinism (what makes the SQL oracle possible):
 *  - sample = first `sampleN` docs in id order, words from the same
 *    lower/trim/whitespace tokenizer every other operator uses;
 *  - pair counts include overlapping occurrences (the classic
 *    reference implementation's counting);
 *  - best pair = highest count, ties to the lexicographically smallest
 *    (a, b) — identical String ordering on both engines for BMP text;
 *  - one merge application = left-greedy non-overlapping replacement,
 *    realized as literal `replace` over a boundary-delimited symbol
 *    string: `·a··b·` (· = U+001F; every symbol wrapped in single
 *    separators, so boundaries between symbols are doubled). The
 *    delimiters make a match possible ONLY at whole-symbol positions —
 *    a bare-separator join would let merge (a,b) fire across the
 *    suffix of a longer symbol like "aa" — while the shared boundary
 *    still lets back-to-back merges chain ("·a··a··a··a·" with merge
 *    (a,a) → "·aa··aa·", exactly the fold). String.replace and SQL
 *    replace both scan left to right and resume after each
 *    replacement, which IS the BPE fold — so Scala training, the
 *    native encode expression, and the oracle's CTE chain all share
 *    one semantics by construction.
 * Symbols are Unicode code points on BOTH engines: the JVM side
 * segments with codePoints() so a surrogate pair stays one symbol
 * (splitting to UTF-16 units would strand lone surrogates, which
 * UTF8String then mangles into replacement bytes) and SQL string
 * functions are code-point/byte-substring based — so BMP and
 * supplementary-plane text segment identically everywhere. Tokens must
 * not contain U+001F (no whitespace tokenizer produces it).
 */
object Bpe {

  private val Sep = "\u001f"
  private val Bnd = Sep + Sep

  /** ·c1··c2··c3· — every symbol (one code point, surrogate pairs kept
   * whole) wrapped in single separators. */
  private def joinChars(w: String): String =
    Sep + w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).mkString(Bnd) + Sep

  private def splitSyms(joined: String): Array[String] =
    joined.substring(1, joined.length - 1).split(Bnd)

  private def applyMerge(joined: String, a: String, b: String): String =
    joined.replace(Sep + a + Bnd + b + Sep, Sep + a + b + Sep)

  /**
   * Deterministic BPE training on the first `sampleN` docs (id order).
   * Returns the merge list in application order; stops early when no
   * adjacent pair remains. Driver cost is O(sample text · numMerges).
   */
  def trainMerges(docs: DataFrame, numMerges: Int, sampleN: Int = 32,
                  textCol: String = "text", idCol: String = "doc_id"): Seq[(String, String)] = {
    val words: Seq[(String, Long)] = docs
      .select(col(idCol), TF.tokens(col(textCol)).as("t"))
      .orderBy(col(idCol)).limit(sampleN)
      .collect()
      .iterator.flatMap(_.getSeq[String](1))
      .filter(_.nonEmpty)
      .toSeq.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      .toSeq
    trainCore(words, numMerges)
  }

  /** The shared greedy-merge trainer over (word, freq) rows — words
   * already in their final symbol space (raw tokens for char-level,
   * alphabet-mapped pretokens for byte-level). */
  private def trainCore(words: Seq[(String, Long)],
                        numMerges: Int): Seq[(String, String)] = {
    // Seq, not Map: merge application could in principle collide two
    // representations, and the oracle's CTE rows don't re-aggregate —
    // keeping rows keeps pair counts identical by construction.
    var enc: Seq[(String, Long)] = words.map { case (w, f) => joinChars(w) -> f }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      enc.foreach { case (j, f) =>
        val syms = splitSyms(j)
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pc(p) = pc.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val (a, b) = pc.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
        merges += ((a, b))
        enc = enc.map { case (j, f) => applyMerge(j, a, b) -> f }
        k += 1
      }
    }
    merges.toSeq
  }

  // ------------------------------------------------------- byte level

  /**
   * GPT-2-STYLE pretokenizer (Radford et al. 2019 — the public
   * pattern): contractions, optional-space-led letter runs, digit
   * runs, punctuation runs, whitespace runs. One deliberate,
   * documented deviation: the original's trailing-whitespace branch
   * `\s+(?!\S)` uses a LOOKAHEAD, which RE2-family engines (the SQL
   * oracle, and any non-backtracking production matcher) cannot
   * express — we drop it, so a whitespace run before a word binds to
   * the run (`"a  b"` → `["a", "  ", "b"]`) instead of donating its
   * last space to the word. Everything a crawl corpus hits —
   * case-sensitivity, leading-space word units ('Ġword'), digit/punct
   * splits, no-OOV byte coverage — is preserved, and ONE pattern
   * serves Spark, the trainer, and the DuckDB oracle identically.
   */
  val PretokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Pretoken array of a text column (document order, case preserved,
   * whitespace significant — the byte-level contract). */
  def pretokens(text: Column): Column =
    regexp_extract_all(text, lit(PretokenPattern), lit(0))

  /**
   * BYTE-LEVEL BPE training (the GPT-2 lineage p41's char-level rung
   * feeds into): pretokens' UTF-8 bytes ride the printable byte
   * alphabet (`HashExpressions.ByteAlphabet` — space is 'Ġ'), merges
   * train on those single-char byte symbols with the SAME greedy
   * trainer as char-level. Any UTF-8 input is encodable with zero OOV;
   * decode is exact (`byteAlphabetInverse`).
   */
  def trainMergesBytes(docs: DataFrame, numMerges: Int, sampleN: Int = 32,
                       textCol: String = "text",
                       idCol: String = "doc_id"): Seq[(String, String)] = {
    val words: Seq[(String, Long)] = docs
      .select(col(idCol), pretokens(col(textCol)).as("t"))
      .orderBy(col(idCol)).limit(sampleN)
      .collect()
      .iterator.flatMap(_.getSeq[String](1))
      .filter(_.nonEmpty)
      .map(HE.mapToAlphabet)
      .toSeq.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      .toSeq
    trainCore(words, numMerges)
  }

  /** Byte-level corpus encoding: one narrow scan — pretokenize, map
   * each pretoken through the byte alphabet (native expression), then
   * the SAME single-pass rank-heap segmentation as char-level (mapped
   * chars are single BMP code points, so the symbol machinery is
   * shared verbatim). Returns (id, subwords) in alphabet space;
   * `decodeBytes` inverts. */
  def encodeBytes(docs: DataFrame, merges: Seq[(String, String)],
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("id"),
      HE.bpeEncodeFast(
        transform(pretokens(col(textCol)), t => HE.byteAlphabet(t)),
        merges).as("subwords"))

  /** Exact decode of an alphabet-space subword array back to the
   * original text — the no-OOV guarantee byte-level BPE exists for. */
  def decodeBytes(subwords: Column): Column =
    HE.byteAlphabetInverse(concat_ws("", subwords))

  /** Per-doc byte-level tokenizer statistics: pretoken count, subword
   * count, UTF-8 byte count, and the two fertility ratios a mixture /
   * packing stage consumes. One narrow codegen'd scan. */
  def statsBytes(docs: DataFrame, merges: Seq[(String, String)],
                 textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val pt = pretokens(col(textCol))
    docs
      .select(col(idCol).as("id"),
        size(pt).cast("long").as("n_pretokens"),
        size(HE.bpeEncodeFast(transform(pt, t => HE.byteAlphabet(t)), merges))
          .cast("long").as("n_subwords"),
        aggregate(pt, lit(0L), (a, w) => a + octet_length(w).cast("long"))
          .as("n_bytes"))
      .select(col("id"), col("n_pretokens"), col("n_subwords"), col("n_bytes"),
        round(when(col("n_pretokens") > 0,
          col("n_subwords").cast("double") / col("n_pretokens"))
          .otherwise(lit(0.0)), 6).as("subwords_per_pretoken"),
        round(when(col("n_bytes") > 0,
          col("n_subwords").cast("double") / col("n_bytes"))
          .otherwise(lit(0.0)), 6).as("subwords_per_byte"))
  }

  /** Corpus encoding: one narrow scan, each doc's words segmented into
   * subwords by the native single-pass rank-heap expression — per-word
   * cost independent of merge-list size, so this is the path that holds
   * at a production tokenizer's 32k-50k merges. The literal replay twin
   * (`encodeReplay`) computes the identical segmentation O(numMerges)x
   * slower and exists because the SQL oracle can only mirror the replay
   * fold; p41's oracle hash plus BpeSpec's equivalence sweep pin the two
   * together. Returns (id, subwords). */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("id"),
      HE.bpeEncodeFast(TF.tokens(col(textCol)), merges).as("subwords"))

  /** Oracle-twin encoding via literal merge replay (see `encode`). */
  def encodeReplay(docs: DataFrame, merges: Seq[(String, String)],
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("id"),
      HE.bpeEncode(TF.tokens(col(textCol)), merges).as("subwords"))

  /** Per-doc tokenizer statistics — the shape a mixture/packing stage
   * consumes. Output: (id, n_words, n_subwords, subwords_per_word). */
  def stats(docs: DataFrame, merges: Seq[(String, String)],
            textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).as("id"),
        size(filter(TF.tokens(col(textCol)), w => w =!= lit("")))
          .cast("long").as("n_words"),
        size(HE.bpeEncodeFast(TF.tokens(col(textCol)), merges))
          .cast("long").as("n_subwords"))
      .select(col("id"), col("n_words"), col("n_subwords"),
        round(when(col("n_words") > 0,
          col("n_subwords").cast("double") / col("n_words").cast("double"))
          .otherwise(lit(0.0)), 6).as("subwords_per_word"))

  /** Per-language fertility under the BYTE-level tokenizer — p115's
   * measurement re-run on the byte rung (fertility_byte replaces
   * fertility_char: bytes are what the byte tokenizer actually saw).
   * Same shape: one narrow codegen'd scan into one language-keyed
   * aggregation with map-side combine, ratios AFTER the sums. */
  def fertilityBytes(docs: DataFrame, merges: Seq[(String, String)],
                     langCol: String = "lang", textCol: String = "text")
      : DataFrame = {
    val pt = pretokens(col(textCol))
    docs
      .select(col(langCol).as("lang"),
        size(pt).cast("long").as("np"),
        size(HE.bpeEncodeFast(transform(pt, t => HE.byteAlphabet(t)), merges))
          .cast("long").as("ns"),
        aggregate(pt, lit(0L), (a, w) => a + octet_length(w).cast("long"))
          .as("nb"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("np").as("n_pretokens"),
        sum("ns").as("n_subwords"), sum("nb").as("n_bytes"))
      .select(col("lang"), col("n_docs"), col("n_pretokens"),
        col("n_subwords"), col("n_bytes"),
        round(when(col("n_pretokens") > 0,
          col("n_subwords").cast("double") / col("n_pretokens"))
          .otherwise(lit(0.0)), 6).as("fertility_pretoken"),
        round(when(col("n_bytes") > 0,
          col("n_subwords").cast("double") / col("n_bytes"))
          .otherwise(lit(0.0)), 6).as("fertility_byte"))
  }

  /**
   * Per-language tokenizer fertility — the subword-efficiency signal
   * multilingual mixtures weigh languages by: under ONE tokenizer,
   * high-fertility languages pay more subwords for the same words or
   * characters, skewing any token-denominated budget (the published
   * multilingual-tokenizer evaluations report exactly these ratios).
   * fertility_word = subwords/word, fertility_char = subwords/char
   * (characters of the tokenized words — the denominator the
   * tokenizer actually saw, not raw-text bytes).
   *
   * Scale shape: one narrow scan (the native BPE encode + two array
   * folds, all codegen'd — text never leaves its partition) into one
   * language-keyed aggregation with map-side combine; ratios computed
   * AFTER the sums, so per-doc skew can't bias them. Output ordered
   * by the caller.
   */
  def fertility(docs: DataFrame, merges: Seq[(String, String)],
                langCol: String = "lang", textCol: String = "text")
      : DataFrame = {
    val toks = filter(TF.tokens(col(textCol)), w => w =!= lit(""))
    docs
      .select(col(langCol).as("lang"),
        size(toks).cast("long").as("nw"),
        size(HE.bpeEncodeFast(TF.tokens(col(textCol)), merges))
          .cast("long").as("ns"),
        aggregate(toks, lit(0L), (a, w) => a + length(w).cast("long"))
          .as("nc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("nw").as("n_words"),
        sum("ns").as("n_subwords"), sum("nc").as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_subwords"), col("n_chars"),
        round(when(col("n_words") > 0,
          col("n_subwords").cast("double") / col("n_words"))
          .otherwise(lit(0.0)), 6).as("fertility_word"),
        round(when(col("n_chars") > 0,
          col("n_subwords").cast("double") / col("n_chars"))
          .otherwise(lit(0.0)), 6).as("fertility_char"))
  }
}
