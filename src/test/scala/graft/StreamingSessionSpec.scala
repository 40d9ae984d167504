package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamOps
import graft.streaming.StreamOps.UserEvent

class StreamingSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionizeStream closes a session on an in-batch gap") {
    val input = MemoryStream[UserEvent](spark)
    val q = StreamOps.sessionizeStream(input.toDS(), gapSeconds = 1800L)
      .writeStream.format("memory").queryName("sessions_gap")
      .outputMode("append").start()
    try {
      input.addData(
        UserEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
        UserEvent(1L, ts("2024-01-01 10:10:00"), 2.0),
        UserEvent(1L, ts("2024-01-01 12:00:00"), 4.0)) // 110-min gap closes s1
      q.processAllAvailable()
      val rows = spark.table("sessions_gap").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3), r.getDouble(4)))
      assert(rows.toSeq == Seq((1L, ts("2024-01-01 10:00:00"), 2L, 3.0)))
    } finally q.stop()
  }

  test("sessionizeStream emits an open session when the watermark passes its deadline") {
    val input = MemoryStream[UserEvent](spark)
    val q = StreamOps.sessionizeStream(
      input.toDS(), gapSeconds = 1800L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sessions_wm")
      .outputMode("append").start()
    try {
      input.addData(UserEvent(1L, ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // another user's much later event pushes the watermark past
      // user 1's gap deadline (10:30) → user 1's session times out
      input.addData(UserEvent(2L, ts("2024-01-01 13:00:00"), 5.0))
      q.processAllAvailable()
      input.addData(UserEvent(2L, ts("2024-01-01 13:01:00"), 5.0))
      q.processAllAvailable()
      val u1 = spark.table("sessions_wm").collect().filter(_.getLong(0) == 1L)
        .map(r => (r.getTimestamp(1), r.getLong(3), r.getDouble(4)))
      assert(u1.toSeq == Seq((ts("2024-01-01 10:00:00"), 1L, 1.0)))
    } finally q.stop()
  }
}
