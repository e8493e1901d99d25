package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Subtitle/caption parsing (P168 — the text half of video-text corpus
 * curation: WebVTT and SRT files carry the aligned transcripts that
 * video-caption datasets train on, and both formats are published
 * public specs — W3C WebVTT and the de-facto SubRip format).
 *
 * One row per cue: (id, cue_idx, start_ms, end_ms, text) — exact
 * integer milliseconds, text lines joined with a single space (cue
 * text is inline content; a raw newline would forge paragraph breaks
 * downstream, the htmlToText rule).
 *
 * Spark-first shape: the WHOLE parse is codegen'd Column work — cues
 * split on blank lines, the timing line found positionally (the first
 * line containing `-->`; VTT ids and SRT indexes both precede it),
 * timestamps decomposed by regexp (hours OPTIONAL, as WebVTT allows
 * `MM:SS.mmm`; the millisecond separator is `.` in VTT and `,` in
 * SRT — one character class reads both) — one narrow scan, one
 * generator, no UDFs, no shuffle. Malformed cues (no timing line,
 * unparseable timestamps) drop; a `WEBVTT` header block or NOTE block
 * has no timing line, so it drops the same way.
 */
object Subtitles {

  private val TsPattern =
    "(?:(\\d{1,3}):)?(\\d{2}):(\\d{2})[.,](\\d{3})"
  private val LinePattern =
    s"$TsPattern\\s*-->\\s*$TsPattern"

  private def tsMs(line: Column, base: Int): Column = {
    def grp(k: Int): Column =
      coalesce(nullif(regexp_extract(line, LinePattern, base + k),
        lit("")), lit("0")).cast("long")
    ((grp(0) * 60 + grp(1)) * 60 + grp(2)) * 1000 + grp(3)
  }

  /** Parse a subtitle document column (VTT or SRT, auto-detected per
   * cue by structure, not by header) into exploded cue rows. The cue
   * text is every line AFTER the timing line — SRT indexes and VTT
   * cue ids PRECEDE it and must not leak into the transcript. */
  def cues(docs: DataFrame, idCol: String = "doc_id",
           textCol: String = "body"): DataFrame = {
    val blocks = split(regexp_replace(col(textCol), "\r\n", "\n"),
      "\n{2,}")
    val pos = array_position(
      transform(col("__lines"), l => l.contains("-->")), true)
    val timing = col("__lines")(col("__pos").cast("int") - 1)
    docs
      .select(col(idCol).cast("long").as("id"),
        posexplode(blocks).as(Seq("cue_idx", "__cue")))
      .select(col("id"), col("cue_idx").cast("long"),
        split(col("__cue"), "\n").as("__lines"))
      .withColumn("__pos", pos)
      .where(col("__pos") > 0 && timing.rlike(LinePattern))
      .select(col("id"), col("cue_idx"),
        tsMs(timing, 1).as("start_ms"),
        tsMs(timing, 5).as("end_ms"),
        trim(array_join(
          slice(col("__lines"), (col("__pos") + 1).cast("int"),
            size(col("__lines"))), " ")).as("text"))
  }
}
