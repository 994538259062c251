package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway: print inferred schemas (DDL form) of every testdata table and
  * count driver jobs for inferred vs explicit-schema reads. */
object Exp2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val tables = Seq("customer", "orders", "supplier", "nation", "region",
      "part", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"""  "$t" -> "${df.schema.toDDL}",""")
    }
    Thread.sleep(300)
    println(s"jobs after inferred reads: ${jobs.get()}")
    val j0 = jobs.get()
    val df2 = spark.read.schema(
      spark.read.parquet(s"$dir/lineitem.parquet").schema
    ).parquet(s"$dir/lineitem.parquet")
    df2.queryExecution.executedPlan // force planning
    Thread.sleep(300)
    println(s"jobs for explicit-schema read+plan: ${jobs.get() - j0 - 1}") // -1: the inferred read inside
    spark.stop()
  }
}
