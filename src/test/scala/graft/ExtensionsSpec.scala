package graft

import org.apache.spark.sql.SparkSession

/** Session-extension wiring: a `withExtensions`-built session must resolve
  * the graft SQL functions (injectFunction) and carry the TopK planner
  * strategy (injectPlannerStrategy) — no imperative register calls. */
class ExtensionsSpec extends SparkSuite {

  test("withExtensions session: graft functions resolve and TopK strategy is planned") {
    val orig = spark // force shared-session init before we detach
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // getOrCreate now builds a NEW session on the existing SparkContext with
    // the extensions applied (the shared suite session would otherwise be
    // returned as-is and the extension point never exercised)
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()
    try {
      assert(s2 ne orig)
      val r = s2.sql(
        """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                  graft_l2norm(array(3.0D, 4.0D)) AS n,
                  graft_simhash64(array('a', 'b')) AS h""").head()
      assert(r.getAs[Double]("d") == 11.0)
      assert(r.getAs[Double]("n") == 5.0)
      assert(r.getAs[Long]("h") != 0L)
      assert(s2.sessionState.planner.strategies.contains(plans.TopKStrategy),
        "injected TopK strategy missing from the session planner")
    } finally {
      // do NOT stop s2 — it shares the suite's SparkContext; just restore
      // the shared session as default/active
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("TopKRewrite: window top-k idiom is auto-rewritten and result-identical") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      def topk(s: SparkSession) = {
        import s.implicits._
        val df = (1 to 200).map(i => (i % 7, i, (i * 37) % 101)).toDF("k", "id", "v")
        df.withColumn("rn", row_number().over(
            Window.partitionBy("k").orderBy(col("v").desc, col("id"))))
          .filter(col("rn") <= 3)
          .orderBy("k", "rn")
      }
      val rewritten = topk(s2)
      assert(rewritten.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        "optimizer rule did not insert TopKPerKey under the window")
      val expected = topk(orig).collect().map(_.toSeq).toSeq
      assert(!topk(orig).queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(rewritten.collect().map(_.toSeq).toSeq == expected)

      // conjunctive filter: the rn bound is one conjunct among others, and
      // an equality selects an exact rank — recomputed ranks must agree
      def shaped(s: SparkSession, pred: org.apache.spark.sql.Column) = {
        import s.implicits._
        val df = (1 to 200).map(i => (i % 7, i, (i * 37) % 101)).toDF("k", "id", "v")
        df.withColumn("rn", row_number().over(
            Window.partitionBy("k").orderBy(col("v").desc, col("id"))))
          .filter(pred).orderBy("k", "rn", "id")
      }
      val conj = shaped(s2, col("rn") <= 4 && col("v") % 2 === 1)
      assert(conj.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(conj.collect().map(_.toSeq).toSeq ==
        shaped(orig, col("rn") <= 4 && col("v") % 2 === 1).collect().map(_.toSeq).toSeq)
      val eq = shaped(s2, col("rn") === 3)
      assert(eq.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(eq.collect().map(_.toSeq).toSeq ==
        shaped(orig, col("rn") === 3).collect().map(_.toSeq).toSeq)

      // GLOBAL top-k (empty partitionBy): the rule must NOT fire —
      // TopKPerKey(keys=Nil) fails ClusteredDistribution's non-empty
      // require at planning, and Spark already plans this idiom optimally.
      // Regression: this previously crashed any extensions-built session.
      def globalTopk(s: SparkSession) = {
        import s.implicits._
        val df = (1 to 200).map(i => (i, (i * 37) % 101)).toDF("id", "v")
        df.withColumn("rn", row_number().over(
            Window.orderBy(col("v").desc, col("id"))))
          .filter(col("rn") <= 5).orderBy("rn")
      }
      val g = globalTopk(s2)
      assert(!g.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        "rewrite must leave global (unpartitioned) top-k to Spark")
      assert(g.collect().map(_.toSeq).toSeq ==
        globalTopk(orig).collect().map(_.toSeq).toSeq)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("imperative registration path: VectorExpressions.register on the shared session") {
    functions.VectorExpressions.register(spark)
    val d = spark.sql("SELECT graft_dot(array(1.0D, 0.0D), array(1.0D, 5.0D)) AS d")
      .head().getAs[Double]("d")
    assert(d == 1.0)
  }

  test("imperative registration path: UrlExpressions.register on the shared session") {
    functions.UrlExpressions.register(spark)
    val c = spark.sql(
      "SELECT graft_url_canonicalize('HTTP://U:P@H.COM:80/a/../b?z=1&a=2&utm_x=3#f') AS c")
      .head().getAs[String]("c")
    assert(c == "http://h.com/b?a=2&z=1")
  }

  test("imperative registration path: TextNormExpressions.register on the shared session") {
    functions.TextNormExpressions.register(spark)
    // NFC: combining acute composes; mojibake: one garble level inverts
    val r = spark.sql(
      "SELECT graft_nfc_normalize('Cafe\u0301') AS n, " +
        "graft_mojibake_repair('caf\u00c3\u00a9') AS m").head()
    assert(r.getAs[String]("n") == "Caf\u00e9")
    assert(r.getAs[String]("m") == "caf\u00e9")
  }
}
