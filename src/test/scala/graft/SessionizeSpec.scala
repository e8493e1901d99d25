package graft

import java.sql.Timestamp

import graft.operators.Sessionize
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {

  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  // user 1: events at 0, 10, 20 min (one session), then 60, 65 (second);
  // user 2: single event.
  private lazy val events = Seq(
    (1L, ts(0), 1L, "view", 1.0, "{}"),
    (2L, ts(10), 1L, "click", 2.0, "{}"),
    (3L, ts(20), 1L, "view", 3.0, "{}"),
    (4L, ts(60), 1L, "purchase", 4.0, "{}"),
    (5L, ts(65), 1L, "view", 5.0, "{}"),
    (6L, ts(5), 2L, "view", 7.0, "{}")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("gap-based sessionization splits on gaps > threshold") {
    val res = Sessionize.sessions(events, gapMinutes = 30)
      .orderBy("user_id", "session_idx").collect()
    assert(res.length == 3)
    val s1 = res(0)
    assert(s1.getAs[Long]("user_id") == 1L && s1.getAs[Long]("session_idx") == 1L)
    assert(s1.getAs[Long]("n_events") == 3L)
    assert(s1.getAs[Double]("total_value") == 6.0)
    assert(s1.getAs[Timestamp]("session_start") == ts(0))
    assert(s1.getAs[Timestamp]("session_end") == ts(20))
    val s2 = res(1)
    assert(s2.getAs[Long]("session_idx") == 2L && s2.getAs[Long]("n_events") == 2L)
    val s3 = res(2)
    assert(s3.getAs[Long]("user_id") == 2L && s3.getAs[Long]("n_events") == 1L)
  }

  test("a gap of exactly the threshold does NOT split") {
    val two = Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(30), 1L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(Sessionize.sessions(two, gapMinutes = 30).count() == 1)
  }

  test("tumbling window aggregation per (window, type)") {
    val res = Sessionize.tumblingAgg(events, widthMinutes = 60)
      .orderBy("window_start", "event_type").collect()
    // hour 1: views(3 users1+2 events... ) — events 1,2,3,6 in window 0; 4,5 in window 1
    val w0 = res.filter(_.getAs[Timestamp]("window_start").getTime ==
      (1700000000000L / 3600000L) * 3600000L)
    assert(w0.map(_.getAs[Long]("n_events")).sum == 4L)
    val views0 = w0.find(_.getAs[String]("event_type") == "view").get
    assert(views0.getAs[Long]("n_events") == 3L)
    assert(views0.getAs[Long]("n_users") == 2L)
  }
}
