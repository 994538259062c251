package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Interleaved same-JVM A/B for the encoded-lines persist valve
  * (spark.graft.cind.persistEncodedLines): the r14 sequential three-arm
  * bench runs showed a monotone box drift larger than the effect, so this
  * alternates arms per rep inside ONE session (clearCache between runs)
  * and reports wall + total executor CPU per arm.
  * Usage: Exp3 [sfDir] [reps] [q1,q2,...] [arm1,arm2,...]
  */
object Exp3 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val queries = (if (args.length > 2) args(2) else
      "cind_all,cind_all_bloom,cind_all_tworound,cind_all_hybrid,cind_all_s2l")
      .split(",").toSeq
    val arms = (if (args.length > 3) args(3) else "always,never").split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        cpuNs.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime)
    })
    case class R(wall: Double, cpu: Double)
    def once(q: String, arm: String): R = {
      spark.catalog.clearCache()
      spark.conf.set("spark.graft.cind.persistEncodedLines", arm)
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      R(wall, (cpuNs.get() - c0) / 1e9)
    }
    queries.foreach { q =>
      arms.foreach(a => once(q, a)) // unmeasured warmup, one per arm
      val res = collection.mutable.Map[String, collection.mutable.Buffer[R]]()
      for (_ <- 1 to reps; a <- arms)
        res.getOrElseUpdate(a, collection.mutable.Buffer[R]()) += once(q, a)
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      arms.foreach { a =>
        val rs = res(a)
        println(f"$q%-24s $a%-7s wallMin=${rs.map(_.wall).min}%6.2f " +
          f"wallMed=${med(rs.map(_.wall).toSeq)}%6.2f cpuMed=${med(rs.map(_.cpu).toSeq)}%6.1f")
      }
    }
    spark.stop()
  }
}
