package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profile of one query: duration + shuffle volume per stage,
  * largest first. Local diagnostic for "where does the time go" — the
  * shuffle-bytes column is the number that predicts 100 TB behavior.
  * Usage: `sbt 'runMain graft.tools.StageProfile cind_all /root/testdata/sf0.1'`. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val query = if (args.nonEmpty) args(0) else "cind_all"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        rows.add((si.stageId,
          si.name.split("\n").head.take(60),
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          si.numTasks.toLong))
      }
    })
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(query)(spark, dir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let listener drain
    import scala.jdk.CollectionConverters._
    println(f"%nTOTAL ${total}%.1f s — stages by duration:")
    println(f"${"stage"}%6s ${"ms"}%8s ${"shufR MB"}%9s ${"shufW MB"}%9s ${"tasks"}%6s  name")
    rows.asScala.toSeq.sortBy(-_._3).take(25).foreach { case (id, name, ms, sr, sw, nt) =>
      println(f"$id%6d $ms%8d ${sr / 1e6}%9.1f ${sw / 1e6}%9.1f $nt%6d  $name")
    }
    spark.stop()
  }
}
