package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.VamanaIndex

/** Pins the build-shuffle placement contract: every shard's graph
  * build gets its OWN task. A plain `repartition(n, $"shard")`
  * murmur3-collides for small n (at 8 shards it stacks 2-3 builds on
  * one straggler — the sf10-rehearsal serialization), so the build
  * tail repartitions on a murmur3 preimage of the shard id instead;
  * this spec fails if either the preimage table or Spark's
  * `repartition` hash semantics ever drift. */
class ShardPlacementSpec extends AnyFunSuite {
  val spark = SparkSpecBase.spark
  import spark.implicits._

  test("shardPreimages inverts the seed-42 murmur3 partition hash") {
    for (n <- Seq(2, 3, 8, 17, 32, 160)) {
      val pre = VamanaIndex.shardPreimages(n)
      assert(pre.length === n)
      pre.zipWithIndex.foreach { case (j, s) =>
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(j, 42)
        assert(((h % n) + n) % n === s, s"preimage $j for shard $s of $n")
      }
    }
  }

  test("placeByShard gives every shard its own task — no hash stacking") {
    val n = 8
    val df = spark.range(400)
      .select($"id", ($"id" % n).cast("int").as("shard"))
    val perPartition = VamanaIndex.placeByShard(df, n)
      .select($"shard").rdd
      .mapPartitionsWithIndex { (pi, it) =>
        val shards = it.map(_.getInt(0)).toSet
        if (shards.isEmpty) Iterator.empty else Iterator((pi, shards))
      }
      .collect().toMap
    assert(perPartition.size === n, "all shards present, each task non-empty")
    assert(perPartition.values.forall(_.size == 1),
      s"one build per task, got $perPartition")
  }
}
