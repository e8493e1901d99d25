package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * MP4 / ISO-BMFF container metadata — the one multimodal format whose
 * FRAME decode is documented out (no pure-JDK inter-frame codec;
 * `Multimodal.scala`), but whose CONTAINER is pure structure: a box
 * tree of [size:4][fourcc:4][payload], big-endian, that a pipeline can
 * walk to get everything short of pixels — duration, track layout,
 * codecs, sample counts. That metadata is what video-corpus curation
 * actually filters on first (clip length, has-audio, codec allowlist)
 * before any expensive decode, so the container walk is the missing
 * front half of the video family. Hand-rolled in the WARC/WAV/AVI/PDF
 * reader style.
 *
 * Subset (ISO 14496-12, version-0 full boxes — what fixture-grade and
 * most real captures carry):
 *   - top-level walk: ftyp / moov / mdat / free recognized, unknown
 *     boxes skipped by size; a box whose size runs past its parent
 *     ends the walk (truncated capture — parse what preceded it);
 *   - moov → mvhd (movie timescale + duration) and trak* → tkhd
 *     (track id) + mdia → mdhd (media timescale + duration), hdlr
 *     (handler fourcc), minf → stbl → stsd (first sample-entry codec
 *     fourcc) + stsz (sample count);
 *   - version-1 (64-bit) boxes, edit lists, and fragmented mp4 (moof)
 *     are out of subset — fields parse as absent, never wrong.
 *
 * Output: one row PER TRACK — (id, major_brand, movie_duration_ms,
 * n_tracks, track_id, handler, codec, n_samples, duration_ms), with
 * durations as exact integral div(duration * 1000, timescale).
 *
 * Scale shape: parsing is batched per-row CPU inside `mapPartitions`
 * (the contract case — binary decode), zero shuffle, zero driver
 * work; payloads never leave the scan that read them.
 */
object Mp4 {

  final case class Track(trackId: Long, handler: String, codec: String,
                         nSamples: Long, durationMs: Long)
  final case class Movie(majorBrand: String, durationMs: Long,
                         tracks: Seq[Track])

  private def be32(b: Array[Byte], at: Int): Long =
    if (at + 4 > b.length) -1L
    else ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
      ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)

  private def fourcc(b: Array[Byte], at: Int): String =
    if (at + 4 > b.length) ""
    else new String(b, at, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Walk the children of [from, until): invoke f(type, payloadFrom,
   * payloadUntil) per well-formed box; stop at the first box whose
   * declared size is absurd or overruns the parent. */
  private def walk(b: Array[Byte], from: Int, until: Int)
                  (f: (String, Int, Int) => Unit): Unit = {
    var at = from
    while (at + 8 <= until) {
      val size = be32(b, at)
      val typ = fourcc(b, at + 4)
      if (size < 8 || at + size > until) return // truncated/corrupt: stop
      f(typ, at + 8, at + size.toInt)
      at += size.toInt
    }
  }

  private def divMs(duration: Long, timescale: Long): Long =
    if (timescale <= 0) 0L else duration * 1000L / timescale

  /** Parse one MP4 byte array (see object doc for the subset). */
  def parse(bytes: Array[Byte]): Movie = {
    var brand = ""
    var movieMs = 0L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Track]
    walk(bytes, 0, bytes.length) {
      case ("ftyp", p, _) => brand = fourcc(bytes, p)
      case ("moov", moovP, moovU) =>
        walk(bytes, moovP, moovU) {
          case ("mvhd", p, _) if bytes(p) == 0 => // version 0 only
            movieMs = divMs(be32(bytes, p + 16), be32(bytes, p + 12))
          case ("trak", trakP, trakU) =>
            var trackId = 0L
            var handler = ""
            var codec = ""
            var nSamples = 0L
            var trackMs = 0L
            walk(bytes, trakP, trakU) {
              case ("tkhd", p, _) if bytes(p) == 0 =>
                trackId = be32(bytes, p + 12)
              case ("mdia", mdiaP, mdiaU) =>
                walk(bytes, mdiaP, mdiaU) {
                  case ("mdhd", p, _) if bytes(p) == 0 =>
                    trackMs = divMs(be32(bytes, p + 16), be32(bytes, p + 12))
                  case ("hdlr", p, _) =>
                    handler = fourcc(bytes, p + 8)
                  case ("minf", minfP, minfU) =>
                    walk(bytes, minfP, minfU) {
                      case ("stbl", stblP, stblU) =>
                        walk(bytes, stblP, stblU) {
                          case ("stsd", p, u) =>
                            if (be32(bytes, p + 4) >= 1 && p + 16 <= u)
                              codec = fourcc(bytes, p + 12)
                          case ("stsz", p, _) =>
                            nSamples = be32(bytes, p + 8)
                          case _ =>
                        }
                      case _ =>
                    }
                  case _ =>
                }
              case _ =>
            }
            tracks += Track(trackId, handler, codec, nSamples, trackMs)
          case _ =>
        }
      case _ =>
    }
    Movie(brand, movieMs, tracks.toSeq)
  }

  /**
   * Container metadata of a frame of MP4 payloads: one `mapPartitions`
   * pass, one output row per TRACK (videos with no parsable moov yield
   * one row with null track fields, so corrupt captures stay visible).
   */
  def containerMeta(videos: DataFrame, bytesCol: String = "payload",
                    idCol: String = "id"): DataFrame = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.select(col(idCol).cast("long").as("id"), col(bytesCol).as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        val m = parse(b)
        if (m.tracks.isEmpty)
          Seq((id, m.majorBrand, m.durationMs, 0L,
            null.asInstanceOf[java.lang.Long], null.asInstanceOf[String],
            null.asInstanceOf[String], null.asInstanceOf[java.lang.Long],
            null.asInstanceOf[java.lang.Long]))
        else m.tracks.map(t => (id, m.majorBrand, m.durationMs,
          m.tracks.size.toLong, java.lang.Long.valueOf(t.trackId),
          t.handler, t.codec, java.lang.Long.valueOf(t.nSamples),
          java.lang.Long.valueOf(t.durationMs)))
      })
      .toDF("id", "major_brand", "movie_duration_ms", "n_tracks",
        "track_id", "handler", "codec", "n_samples", "duration_ms")
  }

  // ------------------------------------------------------------ fixture

  private def be(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def cc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be(8L + body.length) ++ cc(typ) ++ body
  }

  private def full0(typ: String, payload: Array[Byte]*): Array[Byte] =
    box(typ, (Array[Byte](0, 0, 0, 0) +: payload): _*)

  /** Deterministic version-0 MP4: ftyp(isom) + moov(mvhd timescale 600
   * + one 25fps video track, plus an audio track on odd ids) + mdat.
   * Track t: n samples, media timescale 1000, duration n*40 ms; movie
   * duration = max track duration re-expressed in timescale 600. */
  def fixtureMp4(docId: Long): Array[Byte] = {
    val nVideo = docId % 50 + 10
    val hasAudio = docId % 2 == 1
    val nAudio = docId % 30 + 5
    val movieDur600 = math.max(nVideo, if (hasAudio) nAudio else 0L) * 24
    def trak(trackId: Long, handler: String, codec: String,
             n: Long): Array[Byte] = {
      val sampleEntry = box(codec, be(0), be(0), be(0), be(0))
      val stbl = box("stbl",
        full0("stsd", be(1), sampleEntry),
        full0("stsz", be(0), be(n), Array.fill(n.toInt * 4)(1: Byte)),
        full0("stco", be(0)))
      val minf = box("minf", stbl)
      val mdhd = full0("mdhd", be(0), be(0), be(1000), be(n * 40))
      val hdlr = full0("hdlr", be(0), cc(handler), be(0), be(0), be(0))
      val mdia = box("mdia", mdhd, hdlr, minf)
      val tkhd = full0("tkhd", be(0), be(0), be(trackId), be(0),
        be(n * 40 * 600 / 1000))
      box("trak", tkhd, mdia)
    }
    val traks = Seq(trak(1, "vide", "avc1", nVideo)) ++
      (if (hasAudio) Seq(trak(2, "soun", "mp4a", nAudio)) else Nil)
    val mvhd = full0("mvhd", be(0), be(0), be(600), be(movieDur600))
    val moov = box("moov", (mvhd +: traks): _*)
    val ftyp = box("ftyp", cc("isom"), be(0x200), cc("isom"), cc("mp41"))
    val mdat = box("mdat", Array.fill(16)(0x42: Byte))
    ftyp ++ moov ++ mdat
  }
}
