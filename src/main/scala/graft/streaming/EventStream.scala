package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * Structured Streaming ingest over the events schema (SURVEY.md §2 P15):
 * watermarked dedup -> tumbling-window aggregation, plus a stateful
 * gap-sessionizer via flatMapGroupsWithState. The batch twins
 * (operators.Sessionize) compute identical results on a static frame —
 * the StreamingSpec asserts that parity.
 *
 * Scale design: state is keyed by event_id (dedup) and user_id
 * (sessions) — both high-cardinality, so state distributes evenly across
 * executors; the watermark bounds state size (late events beyond it are
 * dropped and their dedup/session state evicted). Window aggregation is a
 * streaming partial-agg: only (window, event_type) groups live in state.
 */
object EventStream {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Normalize `ts` to TimestampType whatever the parquet stored:
   * TIMESTAMP(NANOS) arrives as long (via the legacy nanosAsLong conf)
   * and is floored to micros — the same truncation DuckDB's reader
   * applies — while TIMESTAMP_NTZ (micros) is cast under the UTC
   * session timezone, which is value-preserving. The generator has
   * shipped both encodings across rounds, so the readers detect the
   * unit from the file footer instead of hard-coding it. */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }

  /** Batch read of an events parquet with ts-unit auto-detection — the
   * single reader every batch twin and oracle-checked key goes through. */
  def readBatch(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(path))
  }

  /** File-based streaming source over an events parquet directory.
   * Streaming sources need an explicit schema, so the stored ts type is
   * probed from the footer with a batch schema read (metadata-only —
   * no data scan), then normalized identically to `readBatch`. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // A stream may start against a directory populated only later; the
    // footer probe then has nothing to read, so fall back to the default
    // TimestampType schema rather than failing startup (r10 advice).
    val storedTs =
      try spark.read.parquet(dir).schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException => TimestampType }
    val srcSchema = StructType(schema.fields.map(f =>
      if (f.name == "ts") f.copy(dataType = storedTs) else f))
    normalizeTs(spark.readStream.schema(srcSchema).parquet(dir))
  }

  /** Exactly-once event-id dedup within the watermark horizon. */
  def deduped(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("event_id")

  /** Tumbling-window per-type aggregation (streaming twin of
   * Sessionize.tumblingAgg). n_users is APPROXIMATE (HLL) — streaming
   * aggregation state cannot hold per-window distinct sets, and Spark
   * rejects count_distinct on streaming frames; the batch twin computes
   * it exactly. Pass `watermark = ""` when the input already carries one
   * (e.g. downstream of `deduped`) — redefining it is disallowed. */
  def windowedCounts(events: DataFrame, widthMinutes: Int = 60,
                     watermark: String = "10 minutes"): DataFrame =
    (if (watermark.isEmpty) events else events.withWatermark("ts", watermark))
      .groupBy(window(col("ts"), s"$widthMinutes minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 4).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("n_users"), col("total_value"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(sessionIdx: Long, lastTs: Long, nEvents: Long,
                                startTs: Long, totalValue: Double)
  final case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
                              session_start: Timestamp, session_end: Timestamp,
                              total_value: Double)

  /** Full-precision epoch micros of a Timestamp (getTime alone floors to
   * millis — gap arithmetic must match the batch twin's unix_micros). */
  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000L

  private def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  /**
   * Stateful gap-based sessionizer: emits a session row when the gap to
   * the next event exceeds `gapMinutes` or the state times out (no events
   * for the gap duration). Timeout modes: ProcessingTimeTimeout (default)
   * closes idle sessions by wall clock; EventTimeTimeout closes them when
   * the watermark passes last-event + gap (set a watermark on `events`
   * first — the production setting); NoTimeout for deterministic tests
   * (only in-batch gaps close sessions). Gap arithmetic is in event-time
   * MICROSECONDS, matching operators.Sessionize.sessions exactly.
   */
  def sessionize(spark: SparkSession, events: DataFrame, gapMinutes: Int = 30,
                 timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())
      : Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val processingTime = timeout == GroupStateTimeout.ProcessingTimeTimeout()
    val eventTime = timeout == GroupStateTimeout.EventTimeTimeout()
    events.select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.sessionIdx, s.nEvents,
              tsFromMicros(s.startTs), tsFromMicros(s.lastTs), s.totalValue))
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.lastTs <= gapUs =>
                  cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.sessionIdx, s.nEvents,
                    tsFromMicros(s.startTs), tsFromMicros(s.lastTs), s.totalValue)
                  cur = Some(SessionState(s.sessionIdx + 1, t, 1L, t, e.value))
                case None =>
                  cur = Some(SessionState(1L, t, 1L, t, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (processingTime) state.setTimeoutDuration(gapUs / 1000L)
              else if (eventTime) state.setTimeoutTimestamp((s.lastTs + gapUs) / 1000L)
            }
            closed.reverseIterator
          }
      }
  }
}
