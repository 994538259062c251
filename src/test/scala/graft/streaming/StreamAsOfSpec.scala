package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Stream-stream as-of join: the watermarked streaming operator must agree
  * with the batch asOfJoin on the same data (batch parity), across
  * out-of-order arrival, cross-batch buffering, and keys with no match. */
class StreamAsOfSpec extends SparkSpec {

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  // (id, key, ts-minute) lefts; (key, ts-minute, v) rights
  private val lefts = Seq(
    (1L, 1L, 10), (2L, 1L, 25), (3L, 2L, 15), (4L, 2L, 5), (5L, 3L, 30))
  private val rights = Seq(
    (1L, 8, 1.5), (1L, 20, 2.5), (2L, 15, 7.0), (2L, 40, 9.0))
  // key 3 has no rights at all -> null match

  private def batchExpected: Set[(Long, Option[Long], Option[Double])] = {
    import spark.implicits._
    val l = lefts.map { case (id, k, m) => (id, k, ts(m)) }.toDF("id", "key", "ts")
    val r = rights.map { case (k, m, v) => (k, ts(m), v) }.toDF("key", "ts", "v")
    EventStream.asOfJoin(l, r, "key", "ts", Seq("ts", "v")).collect()
      .map(x => (x.getLong(0),
        Option(x.getTimestamp(3)).map(_.getTime),
        if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toSet
  }

  test("streaming as-of equals batch as-of across out-of-order batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lm = MemoryStream[(Long, Long, Timestamp)]
    val rm = MemoryStream[(Long, Timestamp, Double)]
    // the lateness bound must admit every fixture row (the engine drops
    // rows at-or-behind the watermark BEFORE the operator; with delay 0 a
    // row tying the previous batch's max event time is already late)
    val q = EventStream.asOfJoinStream(
        lm.toDF().toDF("id", "key", "ts"), rm.toDF().toDF("key", "ts", "v"),
        watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("asof_out").outputMode("append").start()
    // batch 1: first rights + an early left, out of order within the batch
    rm.addData((1L, ts(8), 1.5), (2L, ts(15), 7.0))
    lm.addData((1L, 1L, ts(10)), (4L, 2L, ts(5)))
    q.processAllAvailable()
    // batch 2: later rows; watermark (max event time) matures batch-1 lefts
    rm.addData((1L, ts(20), 2.5))
    lm.addData((3L, 2L, ts(15)), (2L, 1L, ts(25)), (5L, 3L, ts(30)))
    q.processAllAvailable()
    // batch 3: a late right for key 2 + a far-future flush row advances the
    // watermark past every left, so all pending lefts emit
    rm.addData((2L, ts(40), 9.0), (99L, ts(600), 0.0))
    q.processAllAvailable()
    // one more batch so the event-time timeouts fire for quiet keys
    rm.addData((99L, ts(700), 0.0))
    q.processAllAvailable()
    val got = spark.table("asof_out").collect()
      .map(x => (x.getLong(0),
        Option(x.getTimestamp(3)).map(_.getTime),
        if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toSet
    q.stop()
    val want = batchExpected
    assert(got == want, s"\nmissing=${want -- got}\nextra=${got -- want}")
    assert(got.size == lefts.size) // every left emitted exactly once
  }

  test("streaming as-of: right-side state compacts to one row behind the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lm = MemoryStream[(Long, Long, Timestamp)]
    val rm = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStream.asOfJoinStream(
        lm.toDF().toDF("id", "key", "ts"), rm.toDF().toDF("key", "ts", "v"))
      .writeStream.format("memory").queryName("asof_compact").outputMode("append").start()
    // many rights far in the past, then the watermark passes them all
    rm.addData((1L, ts(1), 1.0), (1L, ts(2), 2.0), (1L, ts(3), 3.0))
    q.processAllAvailable()
    rm.addData((99L, ts(500), 0.0)) // watermark >> all key-1 rights
    q.processAllAvailable()
    // a left far after the compaction point must still find the LATEST
    // old right (3.0) — the one row the compaction is required to keep
    lm.addData((7L, 1L, ts(520)))
    q.processAllAvailable()
    rm.addData((99L, ts(900), 0.0)) // mature the left
    q.processAllAvailable()
    val got = spark.table("asof_compact").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toSet
    q.stop()
    assert(got == Set((7L, Some(3.0))))
  }
}
