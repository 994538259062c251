package graft.streaming

import graft.SparkSpec
import graft.cind.CindEngine
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class TripleStreamSpec extends SparkSpec {

  val batch1 = Seq(
    "<s:1> <p:name> \"alpha\" .",
    "<s:2> <p:name> \"alpha\" .",
    "# a comment to drop",
    "<s:1> <p:kind> \"x\" .")
  val batch2 = Seq(
    "<s:3> <p:name> \"alpha\" .",
    "<s:1> <p:kind> \"x\" <g:graph> .") // N-Quads 4th term tolerated

  test("streaming condition counts accumulate across micro-batches and match batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = TripleStream.conditionCounts(TripleStream.parseLines(mem.toDS()))
      .writeStream.format("memory").queryName("cc").outputMode("complete").start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    val streamed = spark.table("cc")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    q.stop()

    // the exact batch plan over the union of both micro-batches
    val batch = CindEngine.conditionCounts(
      TripleStream.parseLines((batch1 ++ batch2).toDS()))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(streamed == batch)
    // spot values: pred condition <p:name> seen 3x, obj condition "alpha" 3x
    assert(streamed.contains((2, "<p:name>", "", 3L)))
    assert(streamed.contains((4, "\"alpha\"", "", 3L)))
  }

  test("snapshot discovery over micro-batches converges to batch discovery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // minSupport 1 so the tiny fixture yields CINDs at all
    val tmp = java.nio.file.Files.createTempDirectory("snap").toString
    val mem = MemoryStream[String]
    @volatile var last: Set[(Int, String, String, Int, String, String, Long)] = Set.empty
    val q = TripleStream.discoverSnapshots(
      TripleStream.parseLines(mem.toDS()), 1, s"$tmp/data", s"$tmp/ckpt") {
      (cinds, _) =>
        last = cinds.collect()
          .map(c => (c.dep_code, c.dep_v1, c.dep_v2, c.ref_code, c.ref_v1, c.ref_v2, c.support))
          .toSet
    }
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val batch = CindEngine.allCinds(
      TripleStream.parseLines((batch1 ++ batch2).toDS()), 1).collect()
      .map(c => (c.dep_code, c.dep_v1, c.dep_v2, c.ref_code, c.ref_v1, c.ref_v2, c.support))
      .toSet
    assert(last == batch && last.nonEmpty)
  }
}
