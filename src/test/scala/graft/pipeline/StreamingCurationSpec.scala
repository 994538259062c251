package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingCurationSpec extends SparkSpec {

  private val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  test("curateStream: quality gate + cross-batch first-seen dedup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Curation.curateStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cur").outputMode("append").start()
    // batch 1: one good doc, one too-short doc
    mem.addData((1L, good), (2L, "short doc"))
    q.processAllAvailable()
    // batch 2: an exact duplicate of 1 (later batch!) and a fresh good doc
    mem.addData((3L, good), (4L, good + " more tokens here"))
    q.processAllAvailable()
    val out = spark.table("cur").collect().map(_.getLong(0)).toSet
    q.stop()
    // 2 fails quality map-side; 3 is dropped by the cross-batch state store
    assert(out == Set(1L, 4L))
  }

  test("corpusStatsWindowed: stream equals the batch plan on the same docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rows = Seq(
      (1L, t(0), good, "web"), (2L, t(1), "tiny", "web"),
      (3L, t(2), good + " x", "code"), (4L, t(7), good, "web"))
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val q = Curation.corpusStatsWindowed(
        mem.toDF().toDF("doc_id", "ts", "text", "source"))
      .writeStream.format("memory").queryName("cw").outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("cw").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    q.stop()
    val batch = Curation.corpusStatsWindowed(
        rows.toDF("doc_id", "ts", "text", "source"), watermark = false)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(streamed == batch)
    // two web docs in the 10:00 window, one of them quality
    assert(batch.exists { case (_, s, d, _, ql) => s == "web" && d == 2 && ql == 1 })
  }

  test("curateStream quality gate agrees with batch curate on the same docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq((10L, good), (11L, "tiny"), (12L, ("the " * 12).trim))
    val mem = MemoryStream[(Long, String)]
    val q = Curation.curateStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cur2").outputMode("append").start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    val streamed = spark.table("cur2").collect().map(_.getLong(0)).toSet
    q.stop()
    val batchKept = Curation.curate(docs.toDF("doc_id", "text"), 50)
      .filter(org.apache.spark.sql.functions.col("drop_reason") =!= "duplicate")
      .filter(org.apache.spark.sql.functions.col("keep"))
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batchKept)
  }
}
