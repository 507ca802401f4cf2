package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.TopK

class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  test("TopK aggregator matches window-function top-k incl. tie-breaks") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 5000).map { i =>
      (i % 7L, rnd.nextLong(1000), rnd.nextInt(50).toDouble) // deliberate dist ties
    }
    val df = rows.toDF("q_id", "id", "dist")
    val tk = TopK.topk(10)
    val got = df.groupBy($"q_id").agg(tk($"id", $"dist").as("tk"))
      .select($"q_id", posexplode(arrays_zip($"tk.ids", $"tk.dists")))
      .select($"q_id", $"col.ids".as("id"), $"col.dists".as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted

    val w = Window.partitionBy($"q_id").orderBy($"dist", $"id")
    val exp = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 10)
      .select($"q_id", $"id", $"dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted

    assert(got.sameElements(exp))
  }

  test("groups smaller than k return all elements sorted") {
    val df = Seq((1L, 10L, 3.0), (1L, 11L, 1.0), (1L, 12L, 2.0)).toDF("q_id", "id", "dist")
    val tk = TopK.topk(10)
    val got = df.groupBy($"q_id").agg(tk($"id", $"dist").as("tk"))
      .select($"tk.ids").as[Seq[Long]].head()
    assert(got == Seq(11L, 12L, 10L))
  }

  test("distinct variant matches window top-k over pre-dedup'd candidates") {
    // replicate every candidate 1-3x (as an overlapped index would),
    // with bit-identical dists per id — the distinct aggregate must
    // agree with dedup-then-rank, across many partitions so both the
    // reduce and merge paths dedup
    val rnd = new scala.util.Random(7)
    val base = (0 until 2000).map { i =>
      (i % 5L, rnd.nextLong(400), rnd.nextInt(40).toDouble)
    }.distinct
    val replicated = base.flatMap(r => Seq.fill(1 + rnd.nextInt(3))(r))
    val df = replicated.toDF("q_id", "id", "dist").repartition(16)
    val tk = TopK.topkDistinct(10)
    val got = df.groupBy($"q_id").agg(tk($"id", $"dist").as("tk"))
      .select($"q_id", posexplode(arrays_zip($"tk.ids", $"tk.dists")))
      .select($"q_id", $"col.ids".as("id"), $"col.dists".as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted

    val w = Window.partitionBy($"q_id").orderBy($"dist", $"id")
    val exp = base.toDF("q_id", "id", "dist")
      .groupBy($"q_id", $"id").agg(min($"dist").as("dist"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 10)
      .select($"q_id", $"id", $"dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted

    assert(got.sameElements(exp))
  }
}
