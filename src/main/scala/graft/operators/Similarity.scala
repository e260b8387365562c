package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{GraftQuery, Tables}
import graft.functions.LshPlanes

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Two paths, per the standard ANN playbook:
  *  - brute-force cosine top-k: broadcast the (small) query set, compute
  *    dot products scan-side with higher-order functions — fully
  *    distributed, no shuffle until the final per-query top-k. The
  *    correctness baseline.
  *  - LSH-bucketed (random hyperplanes): 16 sign bits per vector; only
  *    bucket-mates are scored. At 100 TB this turns O(n·q) into
  *    O(n + bucket·q) at some recall cost (measured in SimilaritySpec).
  *
  * Floating-point determinism: dot products are folded left-to-right with
  * `aggregate` (same order DuckDB's `list_reduce` uses), so both engines
  * produce bit-identical doubles; ranking keys are rounded to 6 decimals
  * with vec_id tiebreaks.
  */
object Similarity {

  /** embeddings with the float vector widened to double + L2 norm. */
  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("norm", expr(
        "sqrt(aggregate(v, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x))"))

  private val dotExpr =
    "aggregate(zip_with(v, qv, (a, b) -> a * b), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"

  def queries: Seq[GraftQuery] = Seq(

    // ---- L2 norms (exercises the array fold in both engines) -------------
    GraftQuery(
      "embedding_norms",
      (s, dir) => vecs(s, dir)
        .select(col("vec_id"), col("label"), round(col("norm"), 4).as("l2_norm"))
        .orderBy("vec_id"),
      Some("""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings)
        SELECT vec_id, label,
               round(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(v, x -> x * x)), (acc, x) -> acc + x)), 4) AS l2_norm
        FROM e
        ORDER BY vec_id""")),

    // ---- brute-force cosine top-k per query vector -----------------------
    GraftQuery(
      "cosine_topk",
      (s, dir) => {
        val e = vecs(s, dir)
        val q = e.select(col("vec_id").as("qid"), col("v").as("qv"),
          col("norm").as("qnorm")).filter(col("qid") < 5)
        val scored = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("cos", expr(dotExpr) / (col("norm") * col("qnorm")))
        val w = Window.partitionBy("qid")
          .orderBy(round(col("cos"), 6).desc, col("vec_id"))
        scored
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("qid"), col("rank"), col("vec_id"),
            round(col("cos"), 4).as("cosine"))
          .orderBy("qid", "rank")
      },
      Some("""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings),
        q AS (SELECT vec_id qid, v qv, norm qnorm FROM e WHERE vec_id < 5),
        scored AS (
          SELECT qid, vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])),
                   (acc, x) -> acc + x) / (norm * qnorm) AS cos
          FROM e CROSS JOIN q
          WHERE vec_id != qid),
        ranked AS (
          SELECT qid, vec_id, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY round(cos, 6) DESC, vec_id) AS rank
          FROM scored)
        SELECT qid, rank, vec_id, round(cos, 4) AS cosine
        FROM ranked
        WHERE rank <= 10
        ORDER BY qid, rank""")),

    // ---- LSH-bucketed ANN (random-hyperplane signs, multi-table) ---------
    // Classic multi-probe-free LSH: `tables` independent hash tables, each
    // hashing a vector to a `planesPerTable`-bit bucket (sign of the dot
    // product with a fixed ±1 hyperplane). The plane matrix is a
    // deterministic literal baked into the plan — a broadcast-free constant,
    // one fused zip_with/aggregate per plane, no per-row hashing. Scoring
    // happens only for bucket-mates, so work is O(n·tables + candidates·d)
    // instead of O(n·q·d). No SQL oracle (plane constants aren't worth
    // replicating in SQL); recall vs cosine_topk is asserted in
    // SimilaritySpec.
    GraftQuery(
      "ann_lsh_topk",
      (s, dir) => {
        val e = vecs(s, dir).withColumn("buckets", LshPlanes.bucketsCol(col("v")))
          .select(col("vec_id"), col("v"), col("norm"),
            explode(col("buckets")).as("bk"))
          .select(col("vec_id"), col("v"), col("norm"),
            col("bk.table").as("table"), col("bk.bucket").as("bucket"))
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("norm").as("qnorm"),
            col("table").as("qtable"), col("bucket").as("qbucket"))
        val cand = e.join(broadcast(q),
            col("table") === col("qtable") && col("bucket") === col("qbucket") &&
            col("vec_id") =!= col("qid"))
          .select("qid", "qv", "qnorm", "vec_id", "v", "norm")
          .dropDuplicates("qid", "vec_id")
        val scored = cand
          .withColumn("cos", expr(dotExpr) / (col("norm") * col("qnorm")))
        val w = Window.partitionBy("qid")
          .orderBy(round(col("cos"), 6).desc, col("vec_id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("qid"), col("rank"), col("vec_id"),
            round(col("cos"), 4).as("cosine"))
          .orderBy("qid", "rank")
      },
      None),

    // ---- per-label centroids (long format: label × dimension) ------------
    // Elementwise mean via posexplode + exact decimal sums: the float →
    // decimal(18,8) cast is the same correctly-rounded conversion in both
    // engines, and decimal sums are order-independent at any parallelism.
    GraftQuery(
      "label_centroids",
      (s, dir) => Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("label", "dim")
        .agg(round(
          sum(col("x").cast(DecimalType(18, 8))).cast(DoubleType) / count(lit(1)),
          6).as("mean"))
        .filter(col("dim") < 8)
        .orderBy("label", "dim"),
      Some("""
        SELECT label, dim - 1 AS dim,
               round(CAST(sum(CAST(x AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6) AS mean
        FROM (SELECT label, unnest(embedding) x,
                     generate_subscripts(embedding, 1) dim
              FROM embeddings)
        WHERE dim - 1 < 8
        GROUP BY label, dim
        ORDER BY label, dim"""))
  )
}
