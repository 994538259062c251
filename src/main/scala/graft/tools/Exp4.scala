package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of spark.sql.shuffle.partitions for the bounded
  * streaming harness queries: each micro-batch pays per-partition state
  * store open/commit + task overhead, so tiny fixture states on 32
  * partitions may be mostly fixed cost. Alternates partition counts per
  * rep inside one JVM. Usage: Exp4 [sfDir] [reps] [q1,...] [p1,p2,...]
  */
object Exp4 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val queries = (if (args.length > 2) args(2) else
      "events_sessions_stream,events_window_users_stream,events_join_stream")
      .split(",").toSeq
    val parts = (if (args.length > 3) args(3) else "32,8,2").split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(q: String, p: String): Double = {
      spark.catalog.clearCache()
      StreamDiag.unloadProviders()
      // rowsPerStatePartition=0 disables StreamDriver's adaptive override
      // so the raw shuffle-partition arm is actually what runs
      spark.conf.set("spark.graft.stream.rowsPerStatePartition", "0")
      spark.conf.set("spark.sql.shuffle.partitions", p)
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(q)(spark, dir).count()
      finally {
        spark.conf.set("spark.sql.shuffle.partitions", cpus)
        spark.conf.unset("spark.graft.stream.rowsPerStatePartition")
      }
      (System.nanoTime() - t0) / 1e9
    }
    queries.foreach { q =>
      parts.foreach(p => once(q, p)) // warmup
      val res = collection.mutable.Map[String, collection.mutable.Buffer[Double]]()
      for (_ <- 1 to reps; p <- parts)
        res.getOrElseUpdate(p, collection.mutable.Buffer[Double]()) += once(q, p)
      parts.foreach { p =>
        val rs = res(p).sorted
        println(f"$q%-32s parts=$p%-4s min=${rs.min}%6.2f med=${rs(rs.size / 2)}%6.2f")
      }
    }
    spark.stop()
  }
}
