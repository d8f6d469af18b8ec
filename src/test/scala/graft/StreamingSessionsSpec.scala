package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming sessionization (flatMapGroupsWithState + event-time timeout):
  * sessions close on in-stream gaps AND on watermark timeouts, and agree
  * with the batch w8 semantics. */
class StreamingSessionsSpec extends SparkSpec {
  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("gap within a batch splits sessions; watermark timeout closes the tail") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val ms = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStream.streamingSessions(
        ms.toDF.toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then an event 2 h
      // later in the SAME batch → first session closes on the in-stream gap
      ms.addData((1L, ts(1, 0), 1.0), (1L, ts(1, 10), 2.0), (1L, ts(3, 30), 4.0))
      q.processAllAvailable()
      val afterB1 = spark.table("sessions").collect()
      assert(afterB1.length === 1)
      assert(afterB1.head.getLong(3) === 2L)        // n_events
      assert(afterB1.head.getLong(4) === 300L)      // value_cents 100+200
      // another user far in the future advances the watermark past
      // user 1's open-session timeout (3:30 + 30 min + 1 h watermark delay)
      ms.addData((2L, ts(9, 0), 1.0))
      q.processAllAvailable()
      ms.addData((2L, ts(9, 1), 1.0)) // extra batch so the timeout fires
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .filter(col("user_id") === 1L).orderBy("session_start").collect()
      assert(sessions.length === 2)
      assert(sessions(1).getLong(3) === 1L) // the 3:30 singleton, closed by timeout
      assert(sessions(1).getTimestamp(1) === ts(3, 30))
    } finally q.stop()
  }

  test("streaming sessions agree with the batch w8 aggregation") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val rows = Seq(
      (1L, ts(1, 0), 1.5), (1L, ts(1, 20), 2.5), (1L, ts(2, 30), 1.0),
      (2L, ts(1, 5), 4.0), (2L, ts(4, 0), 0.25))
    val ms = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStream.streamingSessions(ms.toDF.toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("sessions_parity")
      .outputMode("append").start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      ms.addData((99L, ts(23, 0), 0.0)) // watermark push closes everything
      q.processAllAvailable()
      ms.addData((99L, ts(23, 1), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sessions_parity")
        .filter(col("user_id") < 99L)
        .select("user_id", "session_start", "session_end", "n_events", "value_cents")
        .orderBy("user_id", "session_start").collect()
      // batch reference: same gap rule over the same rows
      val batch = Seq(
        (1L, ts(1, 0), ts(1, 20), 2L, 400L),  // 1:00+1:20 one session
        (1L, ts(2, 30), ts(2, 30), 1L, 100L), // 70-min gap → new session
        (2L, ts(1, 5), ts(1, 5), 1L, 400L),
        (2L, ts(4, 0), ts(4, 0), 1L, 25L))
      assert(streamed.map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4))).toSeq === batch)
    } finally q.stop()
  }
}
