package graft

import org.apache.spark.sql.functions._
import graft.operators.Subtitles

class SubtitlesSpec extends SparkSpec {
  import spark.implicits._

  private def parse(body: String): Seq[(Long, Long, Long, String)] =
    Subtitles.cues(Seq((1L, body)).toDF("doc_id", "body"))
      .orderBy("cue_idx")
      .collect()
      .map(r => (r.getAs[Long]("cue_idx"), r.getAs[Long]("start_ms"),
        r.getAs[Long]("end_ms"), r.getAs[String]("text"))).toSeq

  test("vtt: header/NOTE blocks drop, ids don't leak, settings ignored") {
    val vtt = "WEBVTT - with a title\n\nNOTE\nan authoring comment\n\n" +
      "intro-cue\n00:00:01.500 --> 00:00:04.000 align:start size:80%\n" +
      "Hello there\nsecond line\n\n" +
      "00:01:00.000 --> 01:02:03.250\nNo id on this one"
    assert(parse(vtt) == Seq(
      (2L, 1500L, 4000L, "Hello there second line"),
      (3L, 60000L, 3723250L, "No id on this one")))
  }

  test("srt: comma millis, index lines stripped, CRLF tolerated") {
    val srt = "1\r\n00:00:00,000 --> 00:00:02,500\r\nFirst cue\r\n\r\n" +
      "2\r\n10:20:30,400 --> 10:20:31,000\r\nSecond\r\nand more"
    assert(parse(srt) == Seq(
      (0L, 0L, 2500L, "First cue"),
      (1L, 37230400L, 37231000L, "Second and more")))
  }

  test("hour field is optional (WebVTT MM:SS.mmm) and may exceed 99") {
    val vtt = "WEBVTT\n\n05:10.250 --> 05:12.000\nshort form\n\n" +
      "100:00:00.000 --> 100:00:01.000\nlong movie"
    assert(parse(vtt) == Seq(
      (1L, 310250L, 312000L, "short form"),
      (2L, 360000000L, 360001000L, "long movie")))
  }

  test("malformed cues drop, never garble") {
    val junk = "WEBVTT\n\nnot a cue at all\n\n" +
      "00:00:xx.000 --> 00:00:02.000\nbad start\n\n" +
      "00:00:01.000 --> 00:00:02.000\ngood one"
    val rows = parse(junk)
    assert(rows.map(_._4) == Seq("good one"), rows)
  }
}
