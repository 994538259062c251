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
