package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE training + native encoding on hand-computable corpora. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("training: pair counts, tie-breaks, early stop") {
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    // words: aa x2, ab x1. Round 1 pairs: (a,a)=2, (a,b)=1 -> merge (a,a).
    // Round 2: aa is one symbol, only [a,b] has a pair -> merge (a,b).
    // Round 3: no pairs anywhere -> early stop despite numMerges = 5.
    val merges = Bpe.trainMerges(docs, numMerges = 5, sampleN = 4)
    assert(merges == Seq(("a", "a"), ("a", "b")))
  }

  test("training tie-break picks the lexicographically smallest pair") {
    // "ba" and "ab" each contribute one pair: (a,b)=1 and (b,a)=1 tie;
    // (a,b) < (b,a) must win.
    val docs = Seq((1L, "ba ab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, numMerges = 1, sampleN = 4)
    assert(merges == Seq(("a", "b")))
  }

  test("encoding is boundary-safe and left-greedy") {
    val merges = Seq(("a", "a"), ("a", "b"))
    val docs = Seq((1L, "aab aaa b")).toDF("doc_id", "text")
    val sub = Bpe.encode(docs, merges).collect()(0).getSeq[String](1)
    // "aab": (a,a) -> [aa, b]; then (a,b) must NOT fire across the
    // suffix of symbol "aa" (the boundary-delimiter guarantee).
    // "aaa": left-greedy (a,a) -> [aa, a].
    assert(sub == Seq("aa", "b", "aa", "a", "b"))
    val st = Bpe.stats(docs, merges).collect()(0)
    assert(st.getLong(1) == 3L && st.getLong(2) == 5L)
    assert(math.abs(st.getDouble(3) - 5.0 / 3.0) < 1e-6)
  }

  test("zero merges degrade to character segmentation; empty inputs are empty") {
    val docs = Seq((1L, "ab c")).toDF("doc_id", "text")
    val sub = Bpe.encode(docs, Seq.empty).collect()(0).getSeq[String](1)
    assert(sub == Seq("a", "b", "c"))
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Bpe.trainMerges(emptyDocs, numMerges = 3) == Seq.empty)
    assert(Bpe.stats(emptyDocs, Seq.empty).count() == 0)
    // empty text tokenizes to [""], which encodes to no subwords
    val blank = Seq((1L, "")).toDF("doc_id", "text")
    val r = Bpe.stats(blank, Seq.empty).collect()(0)
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getDouble(3) == 0.0)
  }

  test("single-character words survive merges that don't apply") {
    val merges = Seq(("x", "y"))
    val docs = Seq((1L, "a b 罗")).toDF("doc_id", "text")
    val sub = Bpe.encode(docs, merges).collect()(0).getSeq[String](1)
    assert(sub == Seq("a", "b", "罗"))
  }

  test("rank-heap encode is bit-identical to merge replay, merges small to large") {
    // The production encode path (single-pass rank heap, cost independent
    // of merge count) must equal the oracle-twin replay (one pass per
    // merge) EXACTLY — p41's oracle hash depends on it. Sweep real
    // fixture text with trained merge lists of several sizes, plus the
    // adversarial overlap/chaining corpus.
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    val adversarial = Seq(
      (9001L, "aaaa aab abab banana bananas abracadabra"),
      (9002L, "xaxa axax aaxx xxaa"),
      (9003L, "𐍈𐍈a a𐍈𐍈 mixed𐍈text")
    ).toDF("doc_id", "text")
    for (m <- Seq(0, 8, 64, 256)) {
      val merges = Bpe.trainMerges(fixture, numMerges = m, sampleN = 64)
      val docs = fixture.select("doc_id", "text").unionAll(adversarial)
      val both = Bpe.encode(docs, merges).withColumnRenamed("subwords", "fast")
        .join(Bpe.encodeReplay(docs, merges)
          .withColumnRenamed("subwords", "replay"), "id")
        .collect()
      assert(both.nonEmpty)
      both.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"fast != replay for doc ${r.get(0)} at $m merges")
      }
    }
  }

  test("fertility: per-language sums then ratios, hand-computed") {
    // merges trained on the en doc: "aa aa ab" -> merge (a,a) then (a,b)
    val docs = Seq(
      (1L, "aa aa ab", "en"),       // encodes: [aa],[aa],[ab] = 3 subwords
      (2L, "aa b", "de"),           // [aa],[b] = 2 subwords
      (3L, "abc", "de")             // [ab],[c] = 2 subwords
    ).toDF("doc_id", "text", "lang")
    val merges = Bpe.trainMerges(docs.limit(1), numMerges = 5, sampleN = 1)
    val out = Bpe.fertility(docs, merges).orderBy("lang").collect()
    // de: 2 docs, 3 words, 4 subwords, 6 chars
    assert(out(0).getAs[String]("lang") == "de" &&
      out(0).getAs[Long]("n_docs") == 2L &&
      out(0).getAs[Long]("n_words") == 3L &&
      out(0).getAs[Long]("n_subwords") == 4L &&
      out(0).getAs[Long]("n_chars") == 6L)
    assert(out(0).getAs[Double]("fertility_word") == 1.333333)
    assert(out(0).getAs[Double]("fertility_char") == 0.666667)
    // en: 1 doc, 3 words, 3 subwords, 6 chars -> 1.0 / 0.5
    assert(out(1).getAs[Long]("n_subwords") == 3L &&
      out(1).getAs[Double]("fertility_word") == 1.0 &&
      out(1).getAs[Double]("fertility_char") == 0.5)
  }

  test("supplementary-plane code points segment whole, never as surrogates") {
    // U+10348 (𐍈) and an emoji are outside the BMP: code-point
    // segmentation must keep each as ONE symbol — UTF-16-unit splitting
    // would emit lone surrogates, which UTF8String mangles into
    // replacement bytes ('?' / U+FFFD).
    val docs = Seq((1L, "a𐍈b 😀")).toDF("doc_id", "text")
    val sub = Bpe.encode(docs, Seq.empty).collect()(0).getSeq[String](1)
    assert(sub == Seq("a", "𐍈", "b", "😀"))
    // and merges still chain across them
    val merged = Bpe.encode(docs, Seq(("a", "𐍈")))
      .collect()(0).getSeq[String](1)
    assert(merged == Seq("a𐍈", "b", "😀"))
  }

  test("byte alphabet: the GPT-2 table, injective, exact inverse") {
    import graft.functions.{HashExpressions => HE}
    // published table landmarks: printable Latin-1 is identity; the 68
    // excluded bytes map to 256+n in order — space is 'Ġ' (U+0120),
    // newline 'Ċ' (U+010A), tab 'ĉ' (U+0109), byte 0 is U+0100
    assert(HE.mapToAlphabet("A") == "A" && HE.mapToAlphabet("~") == "~")
    assert(HE.mapToAlphabet(" ") == "\u0120")
    assert(HE.mapToAlphabet("\n") == "\u010a")
    assert(HE.mapToAlphabet("\t") == "\u0109")
    assert(HE.mapToAlphabet("\u0000") == "\u0100")
    // multi-byte UTF-8: one mapped char PER BYTE (é = C3 A9, emoji = 4)
    assert(HE.mapToAlphabet("é").length == 2)
    assert(HE.mapToAlphabet("😀").length == 4)
    // exact inverse on ASCII, Latin-1, CJK, supplementary plane
    for (t <- Seq("hello world", "café\nnaïve", "日本語", "a𐍈b 😀!",
      "mixed: é日😀 x")) {
      assert(HE.unmapFromAlphabet(HE.mapToAlphabet(t)) == t, t)
    }
    // injectivity over all 256 bytes
    val images = (0 until 256).map(b =>
      HE.mapToAlphabet(new String(Array(b.toByte),
        java.nio.charset.StandardCharsets.ISO_8859_1)))
    // NOTE: ISO_8859_1 only covers bytes 0-255 -> chars 0-255, whose
    // UTF-8 encoding differs; map the raw byte array instead
    val raw = (0 until 256).map(b => graft.functions.HashExpressions
      .ByteToChar(b))
    assert(raw.distinct.length == 256)
  }

  test("byte-level pretokenizer: contractions, space-led units, whitespace runs") {
    val docs = Seq((1L, "I'll say Don't stop 123 x9 ... a  b")).toDF("doc_id", "text")
    val pts = docs.select(Bpe.pretokens(col("text")).as("p"))
      .collect()(0).getSeq[String](0)
    // contractions split; letters/digits/punct take a leading space;
    // the double space binds as a RUN (the documented RE2-safe
    // deviation from GPT-2's lookahead branch)
    assert(pts == Seq("I", "'ll", " say", " Don", "'t", " stop", " 123",
      " x", "9", " ...", " a", "  ", "b"), pts)
  }

  test("byte-level encode: space-aware merges, zero OOV, exact decode") {
    val docs = Seq(
      (1L, "the cat the cat the cat"),
      (2L, "caf\u00e9 \ud83d\ude00 caf\u00e9")).toDF("doc_id", "text")
    val merges = Bpe.trainMergesBytes(docs, numMerges = 8, sampleN = 2)
    // byte-level merges learn ACROSS the space boundary: ' the' (Ġthe)
    // style units must appear among learned merges' outputs
    val enc = Bpe.encodeBytes(docs, merges)
    val rows = enc.orderBy("id").collect()
    val sub1 = rows(0).getSeq[String](1)
    assert(sub1.nonEmpty)
    // decode inverts exactly for BOTH docs — including the emoji and
    // the accented char, which char-level BPE cannot byte-round-trip
    val dec = enc.select(col("id"), Bpe.decodeBytes(col("subwords")).as("t"))
      .orderBy("id").collect()
    assert(dec(0).getString(1) == "the cat the cat the cat")
    assert(dec(1).getString(1) == "caf\u00e9 \ud83d\ude00 caf\u00e9")
    // zero merges: subwords are single alphabet chars, still decodable
    val dec0 = Bpe.encodeBytes(docs, Seq.empty)
      .select(col("id"), Bpe.decodeBytes(col("subwords")).as("t"))
      .orderBy("id").collect()
    assert(dec0(1).getString(1) == "caf\u00e9 \ud83d\ude00 caf\u00e9")
  }

  test("byte-level stats: counts and ratios, hand-computed") {
    val docs = Seq((1L, "ab ab"), (2L, "")).toDF("doc_id", "text")
    // pretokens of doc 1: ["ab", " ab"]; bytes = 2 + 3 = 5
    val out = Bpe.statsBytes(docs, Seq.empty).orderBy("id").collect()
    assert(out(0).getAs[Long]("n_pretokens") == 2L)
    assert(out(0).getAs[Long]("n_bytes") == 5L)
    assert(out(0).getAs[Long]("n_subwords") == 5L) // no merges: 1/byte
    assert(out(0).getAs[Double]("subwords_per_pretoken") == 2.5)
    assert(out(0).getAs[Double]("subwords_per_byte") == 1.0)
    assert(out(1).getAs[Long]("n_pretokens") == 0L &&
      out(1).getAs[Long]("n_subwords") == 0L &&
      out(1).getAs[Double]("subwords_per_byte") == 0.0)
    // with the (a,b) merge: doc 1 segments ["ab", "\u0120", "a", "b"]?
    // no — merge (a,b) applies in BOTH pretokens: ["ab", "\u0120", "ab"]
    val m = Bpe.statsBytes(docs, Seq(("a", "b"))).orderBy("id").collect()
    assert(m(0).getAs[Long]("n_subwords") == 3L)
  }

  test("byte-level fertility: per-language sums then ratios, hand-computed") {
    val docs = Seq(
      (1L, "aa aa", "xx"),   // pretokens ["aa", " aa"] -> 5 bytes
      (2L, "aa", "xx"),      // ["aa"] -> 2 bytes
      (3L, "b", "yy")        // ["b"] -> 1 byte
    ).toDF("doc_id", "text", "lang")
    val out = Bpe.fertilityBytes(docs, Seq.empty).orderBy("lang").collect()
    // xx: 2 docs, 3 pretokens, 7 bytes, 7 subwords (no merges)
    assert(out(0).getAs[String]("lang") == "xx")
    assert(out(0).getAs[Long]("n_docs") == 2L &&
      out(0).getAs[Long]("n_pretokens") == 3L &&
      out(0).getAs[Long]("n_bytes") == 7L &&
      out(0).getAs[Long]("n_subwords") == 7L)
    assert(out(0).getAs[Double]("fertility_byte") == 1.0)
    assert(out(1).getAs[String]("lang") == "yy" &&
      out(1).getAs[Long]("n_bytes") == 1L)
    // with merge (a,a): "aa" folds to one subword in both pretokens of
    // doc 1 and in doc 2 -> xx subwords = 1 + (1 for the mapped space? no:
    // " aa" maps to [Ġ, a, a] -> [Ġ, aa] = 2) -> 1 + 2 + 1 = 4
    val m = Bpe.fertilityBytes(docs, Seq(("a", "a"))).orderBy("lang").collect()
    assert(m(0).getAs[Long]("n_subwords") == 4L)
  }
}
