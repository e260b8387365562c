package graft

import org.apache.spark.sql.functions._

import graft.operators.PartitionedLayout

/** Dynamic-partition-pruning gates over the directory-partitioned layout.
  *
  * ComponentSpec pins STATIC pruning (a literal on the partition column).
  * This suite pins the star-join regime: the selective predicate lives on
  * the DIMENSION, so only a runtime `dynamicpruning` subquery can stop the
  * fact scan from reading every directory — at 100 TB the difference
  * between scanning one nation's partitions and scanning all of them. */
class LayoutSpec extends SparkSuite {

  private val FactPath = "/tmp/graft_layout_fact"

  /** Cache key = source identity (length|mtime of the orders file — the
    * Tables events-probe discipline): the harness driver regenerates
    * testdata in place between rounds, and a _SUCCESS-only check would
    * compare a DPP join over the OLD fact against expectations from the
    * NEW orders (review finding). */
  private def sourceKey(): String = {
    val f = new java.io.File(s"$sf/orders.parquet")
    s"${f.length}|${f.lastModified}"
  }

  private def ensureFact(): Unit = {
    // orders partitioned by the customer's nation (a 25-ary partition
    // column derived via a one-off broadcast join — the write-time cost
    // that buys every later query its pruning)
    val marker = new java.io.File(s"$FactPath/source.key")
    if (new java.io.File(s"$FactPath/_SUCCESS").isFile && marker.isFile &&
        new String(java.nio.file.Files.readAllBytes(marker.toPath),
          "UTF-8") == sourceKey()) return
    val withNation = Tables.orders(spark, sf)
      .join(broadcast(Tables.customer(spark, sf)
          .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_totalprice"),
        col("c_nationkey").as("nation_key"))
    PartitionedLayout.writePartitioned(withNation, FactPath, "nation_key")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$FactPath/source.key"),
      sourceKey().getBytes("UTF-8"))
  }

  test("dimension-side filter prunes fact partitions via dynamicpruning") {
    ensureFact()
    val dppConf = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    assert(spark.conf.get(dppConf) == "true",
      "Spark 4 defaults DPP on; the suite must not have disabled it")
    // the dim filter is data-derived (first nation name) so the gate
    // keeps working on regenerated testdata; DPP's benefit heuristic
    // engages even at this scale because the fact side is partitioned
    // on the join key and the dim filter is selective
    val dimName = Tables.nation(spark, sf)
      .orderBy(col("n_nationkey").asc_nulls_last).limit(1)
      .collect().head.getAs[String]("n_name")
    val q = PartitionedLayout.dppJoin(spark, FactPath, "nation_key",
      Tables.nation(spark, sf).select("n_nationkey", "n_name"),
      "n_nationkey", col("n_name") === dimName)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamicpruning subquery on the fact scan:\n${plan.take(1500)}")
    // semantics unchanged by the layout: parity with the unpartitioned join
    val exp = Tables.orders(spark, sf)
      .join(broadcast(Tables.customer(spark, sf)
          .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf)
          .filter(col("n_name") === dimName).select("n_nationkey"),
        col("c_nationkey") === col("n_nationkey"))
      .count()
    assert(q.count() == exp,
      "DPP-pruned join row count diverges from the unpartitioned join")
  }

  test("static pruning still engages on the same layout (regression guard)") {
    ensureFact()
    val q = spark.read.parquet(FactPath).filter(col("nation_key") === 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("nation_key"),
      "literal partition predicate no longer reaches PartitionFilters")
  }

  test("packedShards: one file per shard, and the manifest accounts for every token") {
    // the export gate (round-12 verdict item 4): write chat_pack's packed
    // chats one file per shard, then prove a reader holding ONLY the
    // manifest can fully account for the layout — file count, per-shard
    // chat/token/assistant sums, and the order-sensitive id digest
    val dir = "/tmp/graft_packed_shards"
    val pc = operators.ChatData.packedChats(spark, sf)
      .select("doc_id", "lang", "source", "n_tokens", "a_tokens", "shard_id")
    operators.Sinks.packedShards(pc, dir, Seq("lang", "shard_id"), "doc_id")
    val shardDirs = for {
      l <- new java.io.File(dir).listFiles.toSeq if l.isDirectory
      sd <- l.listFiles.toSeq if sd.isDirectory
    } yield sd
    assert(shardDirs.nonEmpty, "no shard directories written")
    shardDirs.foreach { sd =>
      val files = sd.listFiles.filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$sd holds ${files.length} data files, want 1")
    }
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    val manifest = SparkEntry.queries("export_manifest")(spark, sf).collect()
    val back = spark.read.parquet(dir)
      .select(col("lang"), col("shard_id").cast("long").as("shard_id"),
        col("doc_id"), col("n_tokens"), col("a_tokens")).collect()
      .groupBy(r => (Option(r.getAs[String]("lang")), r.getAs[Long]("shard_id")))
    assert(manifest.length == back.size,
      s"manifest rows ${manifest.length} != written shards ${back.size}")
    var tokensAccounted = 0L
    manifest.foreach { m =>
      val key = (Option(m.getAs[String]("lang")), m.getAs[Long]("shard_id"))
      val rows = back(key)
      assert(rows.length.toLong == m.getAs[Long]("n_chats"), s"$key chat count")
      assert(rows.map(_.getAs[Long]("n_tokens")).sum ==
        m.getAs[Long]("total_tokens"), s"$key token mass")
      assert(rows.map(_.getAs[Long]("a_tokens")).sum ==
        m.getAs[Long]("assistant_tokens"), s"$key assistant mass")
      assert(md5hex(rows.map(_.getAs[Long]("doc_id")).sorted.mkString(",")) ==
        m.getAs[String]("digest"), s"$key id digest")
      tokensAccounted += m.getAs[Long]("total_tokens")
    }
    // nothing escaped the manifest: the packed frame's full token mass
    val packedTotal = pc.agg(sum("n_tokens")).head.getLong(0)
    assert(tokensAccounted == packedTotal,
      s"manifest accounts $tokensAccounted of $packedTotal packed tokens")
  }

  test("packedShards (corpus lane): one file per shard, manifest accounts for every token") {
    // the pretraining twin of the chat gate (round-13 verdict item 3):
    // write pack_sequences' packed docs one file per shard, then prove a
    // reader holding ONLY corpus_export_manifest can fully account for
    // the layout — file count, per-shard doc/token sums, source mix, and
    // the order-sensitive id digest
    val dir = "/tmp/graft_packed_corpus_shards"
    val pd = operators.Curation.packedDocs(spark, sf)
      .select("doc_id", "lang", "source", "n_tokens", "shard_id")
    operators.Sinks.packedShards(pd, dir, Seq("lang", "shard_id"), "doc_id")
    val shardDirs = for {
      l <- new java.io.File(dir).listFiles.toSeq if l.isDirectory
      sd <- l.listFiles.toSeq if sd.isDirectory
    } yield sd
    assert(shardDirs.nonEmpty, "no shard directories written")
    shardDirs.foreach { sd =>
      val files = sd.listFiles.filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$sd holds ${files.length} data files, want 1")
    }
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    val manifest =
      SparkEntry.queries("corpus_export_manifest")(spark, sf).collect()
    val back = spark.read.parquet(dir)
      .select(col("lang"), col("shard_id").cast("long").as("shard_id"),
        col("doc_id"), col("n_tokens"),
        coalesce(col("source"), lit("")).as("src")).collect()
      .groupBy(r => (Option(r.getAs[String]("lang")),
        Option(r.getAs[Any]("shard_id")).map(_.asInstanceOf[Long])))
    assert(manifest.length == back.size,
      s"manifest rows ${manifest.length} != written shards ${back.size}")
    var tokensAccounted = 0L
    manifest.foreach { m =>
      val key = (Option(m.getAs[String]("lang")),
        Option(m.getAs[Any]("shard_id")).map(_.asInstanceOf[Long]))
      val rows = back(key)
      assert(rows.length.toLong == m.getAs[Long]("n_docs"), s"$key doc count")
      val toks = rows.flatMap(r => Option(r.getAs[Any]("n_tokens")))
        .map(_.asInstanceOf[Long])
      assert((toks.isEmpty && m.isNullAt(m.fieldIndex("total_tokens"))) ||
        toks.sum == m.getAs[Long]("total_tokens"), s"$key token mass")
      val mix = rows.groupBy(_.getAs[String]("src")).toSeq
        .sortBy(_._1).map { case (s, rs) => s"$s:${rs.length}" }.mkString(",")
      assert(mix == m.getAs[String]("source_mix"), s"$key source mix")
      assert(md5hex(rows.map(_.getAs[Long]("doc_id")).sorted.mkString(",")) ==
        m.getAs[String]("digest"), s"$key id digest")
      tokensAccounted += Option(m.getAs[Any]("total_tokens"))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    }
    // nothing escaped the manifest: the packed frame's full token mass
    val packedTotal = pd.agg(sum("n_tokens")).head.getLong(0)
    assert(tokensAccounted == packedTotal,
      s"manifest accounts $tokensAccounted of $packedTotal packed tokens")
  }
}
