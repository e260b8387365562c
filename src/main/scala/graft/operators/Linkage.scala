package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Record-linkage / entity-resolution operators: approximate string
  * matching across catalog-style tables. The reference has no string
  * similarity anywhere (its keys are exact device ids); this family
  * extends the engine the same way the dedup stack does for documents —
  * and it is the classic data-cleaning join a curation pipeline runs
  * against product/entity catalogs before training on them.
  *
  * Scale discipline: an edit-distance join must NEVER be a cartesian
  * product with a distance filter — levenshtein is O(|a|·|b|) per pair
  * and the pair space is O(n²). The shape here is the standard blocked
  * join: collapse to DISTINCT names first (the value domain is much
  * smaller than the row count — 64 names across 2 000 parts here, and at
  * web scale titles/entities repeat the same way), then self-join only
  * within a cheap deterministic blocking key, and run the DP distance on
  * the candidates that survive. Recall within a block is exact; cross-
  * block misses are the documented trade (mirrored in the oracle, so the
  * check is still hash-exact). Hot blocks are bounded by the value
  * domain of the key; a skewed key would compose with the source_cap /
  * TopKPerKey cap the same way the LSH stacks cap hot buckets.
  */
object Linkage {

  /** Max edit distance for a candidate pair to count as a fuzzy match. */
  private val MaxEditDistance = 2

  /** Hot-block cap: a blocking key shared by d names contributes
    * d·(d−1)/2 DP comparisons, so one degenerate key (empty noun, a
    * tokenizer artifact) re-opens the quadratic door the blocking closed.
    * Blocks above the cap are dropped — same stance and same oracle
    * mirroring as Dedup.MaxGramDocFreq; on the testdata the largest block
    * is 8, so the cap is the 100 TB safety rail, not an output change. */
  private val MaxBlockSize = 1000L

  /** DISTINCT names with their canonical key and blocking key, hot blocks
    * dropped — the shared front half of both linkage queries. */
  private def blockedNames(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .groupBy(col("p_name").as("name"))
      .agg(min("p_partkey").as("pk"))
      .withColumn("blk", substring_index(col("name"), " ", -1))
      // the block-size window shares the self-join's shuffle key, so
      // the cap costs no extra exchange
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("blk")))
      .filter(col("bsz") <= MaxBlockSize)

  /** Within-block pairs at edit distance ≤ [[MaxEditDistance]]. */
  private def fuzzyPairs(s: SparkSession, dir: String): DataFrame = {
    val names = blockedNames(s, dir)
    val a = names.select(col("blk"), col("name").as("name_a"), col("pk").as("pk_a"))
    val b = names.select(col("blk"), col("name").as("name_b"), col("pk").as("pk_b"))
    a.join(b, "blk")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= MaxEditDistance)
  }

  /** Shared DuckDB CTE text for the blocked capped name set + pairs. */
  private def sqlFuzzyCtes: String = s"""
        names AS (SELECT p_name AS name, min(p_partkey) AS pk
                  FROM part GROUP BY 1),
        b0 AS (SELECT name, pk, string_split(name, ' ')[-1] AS blk FROM names),
        b AS (SELECT name, pk, blk FROM (
                SELECT b0.*, count(*) OVER (PARTITION BY blk) bsz FROM b0)
              WHERE bsz <= $MaxBlockSize),
        fp AS (SELECT a.name AS name_a, c.name AS name_b,
                      levenshtein(a.name, c.name) AS dist,
                      a.pk AS pk_a, c.pk AS pk_b
               FROM b a JOIN b c USING (blk)
               WHERE a.name < c.name
                 AND levenshtein(a.name, c.name) <= $MaxEditDistance)"""

  def queries: Seq[GraftQuery] = Seq(

    // ---- blocked edit-distance self-join over part names -----------------
    // Blocking key = last token (the head noun of "adjective noun" names):
    // within-block pairs get exact levenshtein; the DISTINCT-first
    // collapse means the join input is the name DOMAIN, not the table.
    // Both engines implement textbook Levenshtein, so the distance is
    // engine-portable and the whole operator oracle-checkable.
    GraftQuery(
      "fuzzy_join",
      (s, dir) => fuzzyPairs(s, dir)
        .select("name_a", "name_b", "dist", "pk_a", "pk_b")
        .orderBy("name_a", "name_b"),
      Some(s"""
        WITH $sqlFuzzyCtes
        SELECT name_a, name_b, dist, pk_a, pk_b
        FROM fp
        ORDER BY name_a, name_b""")),

    // ---- entity resolution: connected components over fuzzy matches ------
    // The second half of record linkage: fuzzy pairs are EDGES, entities
    // are the connected components (A≈B, B≈C ⇒ one entity even when A-C
    // exceeds the distance bound). Reuses the dedup stack's hybrid CC
    // engine over the capped blocked pair set — edges only, never the
    // name space — and the same recursive-CTE oracle discipline, so the
    // whole resolution is hash-checked. Builder RUNS jobs (CC
    // convergence), hence its entry in SparkEntry.actionfulQueries.
    GraftQuery(
      "entity_clusters",
      (s, dir) => {
        val pairs = fuzzyPairs(s, dir)
          .select(col("pk_a").as("doc_a"), col("pk_b").as("doc_b"))
        val labels = Dedup.connectedComponents(pairs)
          .select(col("doc_id").as("pk"), col("label"))
        blockedNames(s, dir)
          .join(labels, Seq("pk"))
          .groupBy("label")
          .agg(count(lit(1)).as("cluster_size"),
            concat_ws(",", array_sort(collect_list(col("name")))).as("member_names"))
          .select(col("label").as("cluster_id"), col("cluster_size"),
            col("member_names"))
          .orderBy("cluster_id")
      },
      Some(s"""
        WITH RECURSIVE $sqlFuzzyCtes,
        edges AS (SELECT pk_a AS a, pk_b AS b FROM fp
                  UNION SELECT pk_b, pk_a FROM fp),
        reach(id, label) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id),
        labels AS (SELECT id, min(label) AS label FROM reach GROUP BY id)
        SELECT min(l.label) AS cluster_id, count(*) AS cluster_size,
               string_agg(n.name, ',' ORDER BY n.name) AS member_names
        FROM labels l JOIN b n ON l.id = n.pk
        GROUP BY l.label
        ORDER BY cluster_id"""))
  )
}
