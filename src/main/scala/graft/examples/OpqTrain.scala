package graft.examples

import org.apache.spark.sql.SparkSession

/** Offline OPQ rotation training — produces the frozen
  * `opq_rotation.txt` artifact [[graft.operators.Opq.Rotation]]
  * ships (the [[BpeTrain]] pattern: train once over the corpus,
  * commit the artifact, replay it deterministically in both
  * engines). Usage:
  *
  *   runMain graft.examples.OpqTrain <sfDir> <outFile>
  *
  * Distributed step: the corpus scan (here collected sorted by
  * vec_id so the moment accumulation order is fixed — at real scale
  * the second-moment matrix would be a map-side-combined aggregate of
  * dim² partials, the same shape as [[graft.operators.VectorSumAgg]];
  * the 64×64 result is driver-sized either way). Local step:
  * covariance → cyclic Jacobi eigendecomposition → eigenvalue
  * allocation (Ge et al., CVPR'13 §5) → float-rounded rotation,
  * written one output dimension per line. */
object OpqTrain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OpqTrain <sfDir> <outFile>")
    val sfDir = args(0)
    val out = args(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-opq-train")
      .getOrCreate()
    import spark.implicits._
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1).map(_._2)
    val (cnt, _, cov) = graft.operators.Opq.moments(vecs.iterator)
    System.err.println(s"[opq-train] covariance over $cnt vectors")
    val t0 = System.nanoTime()
    val (eig, v) = graft.operators.Opq.jacobiEigen(cov, graft.operators.Opq.Dim)
    System.err.println(f"[opq-train] jacobi in ${(System.nanoTime() - t0) / 1e6}%.1f ms; " +
      f"eig range [${eig.min}%.3e, ${eig.max}%.3e]")
    // allocate for the SAME (m, subDim) shape the serving path
    // derives from the PQ constants — literals here would silently
    // desync the trained rotation if PQ.M/SubDim ever change
    val order = graft.operators.Opq.allocate(eig,
      graft.operators.PQ.M, graft.operators.PQ.SubDim)
    val rot = graft.operators.Opq.buildRotation(v, order)
    val n = graft.operators.Opq.Dim
    val body = (0 until n).map { j =>
      (0 until n).map(i => rot(j * n + i).toString).mkString(" ")
    }.mkString("", "\n", "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out), body.getBytes("UTF-8"))
    System.err.println(s"[opq-train] wrote $out")
    spark.stop()
  }
}
