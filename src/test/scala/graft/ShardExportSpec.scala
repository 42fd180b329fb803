package graft

import org.apache.spark.sql.functions._

import graft.operators.ShardExport
import graft.store.SnapshotStore

/** Shard-export contract: the physical training-data layout must (1)
  * partition the corpus exactly (every doc in exactly one shard, no
  * loss, no duplication), (2) respect the budget up to one straddling
  * document, (3) be byte-reproducible per epoch and a DIFFERENT
  * permutation across epochs, (4) publish atomically (pinned readers
  * keep the old epoch), and (5) write one file per shard.
  */
class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private val Budget = 256L

  private def docs = spark.range(500)
    .select(col("id").as("doc_id"),
      concat_ws(" ", (0 to 6).map(i =>
        concat(lit("w"), (col("id") * 7 + i) % 97)): _*).as("text"))

  test("shards partition the corpus exactly; budget overrun bounded by one doc") {
    val root = tmpDir("shard-export") + "/export"
    ShardExport.export(spark, docs, "doc_id", "text", epoch = 0,
      budgetTokens = Budget, root = root)
    val back = ShardExport.readShards(spark, root)
    // Exact partition: same doc set, once each, text intact.
    assert(back.count() == 500)
    assert(back.select("doc_id").distinct().count() == 500)
    assert(back.select($"doc_id", $"text").except(
      docs.select($"doc_id", $"text")).count() == 0)
    // Each doc is 7 whitespace tokens.
    val man = ShardExport.manifest(spark, root)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(man.map(_._2).sum == 500 && man.map(_._3).sum == 3500)
    // Dense shard ids from 0; every shard within budget + one doc (7).
    assert(man.map(_._1).toSeq == man.indices)
    assert(man.dropRight(1).forall { case (_, _, tok) =>
      tok >= Budget - 7 + 1 && tok < Budget + 7 })
    // Manifest equals a re-aggregation of the shard files themselves.
    val fromFiles = back.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens"))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(fromFiles.toSeq == man.toSeq)
  }

  test("deterministic per epoch, different permutation across epochs, one file per shard") {
    val r1 = tmpDir("shard-det") + "/e0a"
    val r2 = tmpDir("shard-det") + "/e0b"
    val r3 = tmpDir("shard-det") + "/e1"
    ShardExport.export(spark, docs, "doc_id", "text", 0, Budget, r1)
    ShardExport.export(spark,
      docs.repartition(13), // layout must not matter
      "doc_id", "text", 0, Budget, r2)
    ShardExport.export(spark, docs, "doc_id", "text", 1, Budget, r3)
    def assignment(root: String) = ShardExport.readShards(spark, root)
      .select($"doc_id", $"shard_id").as[(Long, Int)].collect().toSet
    assert(assignment(r1) == assignment(r2))
    assert(assignment(r1) != assignment(r3)) // epoch reshuffles
    // One parquet data file per shard directory.
    val shardsDir = java.nio.file.Paths.get(
      SnapshotStore.resolve(r1) + "/shards")
    val perDir = java.nio.file.Files.list(shardsDir).iterator()
    var checked = 0
    perDir.forEachRemaining { d =>
      if (java.nio.file.Files.isDirectory(d)) {
        val parts = java.nio.file.Files.list(d).iterator()
        var n = 0
        parts.forEachRemaining(p =>
          if (p.getFileName.toString.endsWith(".parquet")) n += 1)
        assert(n == 1, s"shard dir $d has $n part files")
        checked += 1
      }
    }
    assert(checked > 1)
  }

  test("re-export publishes a new snapshot; pinned readers keep the old epoch") {
    val root = tmpDir("shard-snap") + "/export"
    val v1 = ShardExport.export(spark, docs, "doc_id", "text", 0, Budget, root)
    val v2 = ShardExport.export(spark, docs, "doc_id", "text", 1, Budget, root)
    assert(v1 == 1 && v2 == 2)
    val e0 = ShardExport.readShards(spark, root, Some(v1))
      .select($"doc_id", $"shard_id").as[(Long, Int)].collect().toSet
    val head = ShardExport.readShards(spark, root)
      .select($"doc_id", $"shard_id").as[(Long, Int)].collect().toSet
    assert(e0 != head) // head is epoch 1; pinned v1 still epoch 0
    assert(SnapshotStore.currentVersion(root).contains(2))
  }
}
