package graft

// Dev tool (test scope): time plan BUILD + count together, N reps —
// needed for queries whose builder itself runs jobs (dedup_clusters).
// Usage: sbt "Test/runMain graft.TimeQuery <name> [sfDir] [reps]"
object TimeQuery {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(Tables.NanosAsLongConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[time] run$i $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
