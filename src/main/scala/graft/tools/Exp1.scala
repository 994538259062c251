package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway A/B for the line-formation exchange (the measured max stage of
  * every CIND strategy). Variants:
  *   A  groupBy(join_val)                        — current shape
  *   B  groupBy(xxhash64(join_val), join_val)    — 8-byte sort prefix
  *   C  A but with objectHashAggregate fallback threshold raised to 4M
  * Reports wall AND total executor CPU time (the box's wall noise is 5x;
  * CPU time is the stable signal). Interleaved reps, noop sink. */
object Exp1 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
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
    val triples = graft.rdf.TripleSource.derive(spark, dir)
    val pruned = graft.cind.CindEngine.prunedCaptureInstances(triples, 10)

    def a() = pruned.groupBy("join_val")
      .agg(collect_set(struct(col("code"), col("v1"), col("v2"))).as("caps"))
    def b() = pruned.withColumn("jh", xxhash64(col("join_val")))
      .groupBy("jh", "join_val")
      .agg(collect_set(struct(col("code"), col("v1"), col("v2"))).as("caps"))
      .drop("jh")

    case class R(wall: Double, cpu: Double)
    def time(name: String, f: () => org.apache.spark.sql.DataFrame,
        thresh: Option[String] = None): R = {
      spark.catalog.clearCache()
      thresh.foreach(t =>
        spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", t))
      val c0 = cpuNs.get()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val c = (cpuNs.get() - c0) / 1e9
      thresh.foreach(_ =>
        spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128"))
      println(f"$name: wall=$s%.2f cpu=$c%.1f"); R(s, c)
    }
    time("warmA", a _); time("warmB", b _)
    val as = collection.mutable.Buffer[R]()
    val bs = collection.mutable.Buffer[R]()
    val cs = collection.mutable.Buffer[R]()
    for (_ <- 1 to reps) {
      as += time("A", a _)
      bs += time("B", b _)
      cs += time("C", a _, Some((4 * 1000 * 1000).toString))
    }
    def med(xs: collection.Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"A cpu med=${med(as.map(_.cpu))}%.1f wall min=${as.map(_.wall).min}%.2f")
    println(f"B cpu med=${med(bs.map(_.cpu))}%.1f wall min=${bs.map(_.wall).min}%.2f")
    println(f"C cpu med=${med(cs.map(_.cpu))}%.1f wall min=${cs.map(_.wall).min}%.2f")
    spark.stop()
  }
}
