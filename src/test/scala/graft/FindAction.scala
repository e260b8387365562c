package graft

// Dev tool (test scope, not shipped): prints which registered plan builders
// trigger Spark jobs during construction. Run:
//   sbt "Test/runMain graft.FindAction"
object FindAction {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config(Tables.NanosAsLongConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })
    SparkEntry.all.filterNot(q => SparkEntry.actionfulQueries(q.name)).foreach { q =>
      val before = jobs.get()
      q.plan(spark, "/root/testdata/sf0.001")
      Thread.sleep(300)
      val after = jobs.get()
      if (after != before) println(s"ACTION ${q.name}: ${after - before} job(s)")
    }
    println("done")
    spark.stop()
  }
}
