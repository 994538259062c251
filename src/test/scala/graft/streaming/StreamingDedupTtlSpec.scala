package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamingDedupTtlSpec extends SparkSpec {

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("firstSeenTtl: dups suppressed within TTL, re-admitted after expiry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup.firstSeenTtl(
        mem.toDF().toDF("doc_id", "ts", "text"), ttl = "30 minutes")
      .writeStream.format("memory").queryName("ttl").outputMode("append").start()
    // batch 1: A first seen at t+0, duplicate at t+5 -> one emission
    mem.addData((1L, ts(0), "content A"), (2L, ts(5), "content A"))
    q.processAllAvailable()
    // batch 2: unrelated content far in the future advances the watermark
    // past A's TTL (0 + 30min) -> A's state times out and is removed
    mem.addData((3L, ts(120), "content B"))
    q.processAllAvailable()
    // batch 3: A re-arrives AFTER its TTL window -> re-admitted as new
    mem.addData((4L, ts(130), "content A"))
    q.processAllAvailable()
    val out = spark.table("ttl").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(out == Set(1L, 3L, 4L))
  }

  test("firstSeenTtl: rows behind the watermark are dropped pre-operator; boundary rows clamp, not crash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup.firstSeenTtl(
        mem.toDF().toDF("doc_id", "ts", "text"), ttl = "30 minutes",
        watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("ttl3").outputMode("append").start()
    mem.addData((1L, ts(300), "future content")) // watermark -> 15:00 - 2h = 13:00
    q.processAllAvailable()
    // strictly-late first arrival (10:00 < watermark 13:00): the engine's
    // late-row filter drops it BEFORE the group function, so it neither
    // emits nor reaches setTimeoutTimestamp — no crash path
    mem.addData((2L, ts(0), "stale content"))
    q.processAllAvailable()
    // boundary first arrival: ts just past the watermark (equality is
    // dropped too) survives the late filter, and ts + ttl lands past the
    // watermark — legal timeout (the max(.., watermark+1ms) clamp covers
    // ttl ~ 0 configurations where ts + ttl would NOT clear the watermark
    // and would otherwise kill the query)
    mem.addData((4L, ts(181), "boundary content"))
    q.processAllAvailable()
    mem.addData((3L, ts(310), "third content"))
    q.processAllAvailable()
    val out = spark.table("ttl3").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(out == Set(1L, 4L, 3L)) // stale row dropped; boundary row emitted
  }

  test("firstSeenTtl: within-TTL behavior matches plain firstSeen") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup.firstSeenTtl(
        mem.toDF().toDF("doc_id", "ts", "text"), ttl = "10 hours")
      .writeStream.format("memory").queryName("ttl2").outputMode("append").start()
    mem.addData((1L, ts(0), "x"), (2L, ts(1), "y"))
    q.processAllAvailable()
    mem.addData((3L, ts(2), "x"), (4L, ts(3), "z"))
    q.processAllAvailable()
    val out = spark.table("ttl2").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(out == Set(1L, 2L, 4L)) // 3 is a cross-batch duplicate of 1
  }
}
