package graft

import org.scalatest.funsuite.AnyFunSuite

/** The front-door example stays runnable: selection shrinks the
  * corpus, the saved+reloaded capped-overlap index serves, and both
  * serving modes score against the ivecs ground-truth FILE. */
class PipelineDemoSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark

  test("PipelineDemo runs end to end at sf0.001 with sane selection and recall") {
    val work = java.nio.file.Files.createTempDirectory("graft_demo_spec").toString
    val r = examples.PipelineDemo.run(spark, SparkSpecBase.sf001, work)
    assert(r.nDocs > 0 && r.nSelected > 0 && r.nSelected < r.nDocs,
      s"selection should drop some docs: ${r.nSelected}/${r.nDocs}")
    // each r16 stage may only shrink the set, and the mix must bite
    assert(r.nAfterSem <= r.nSelected && r.nAfterMix <= r.nAfterSem,
      s"stages grew the set: ${r.nSelected} -> ${r.nAfterSem} -> ${r.nAfterMix}")
    assert(r.nAfterMix > 0 && r.nAfterMix < r.nSelected,
      s"semantic dedup + mixing dropped nothing: ${r.nAfterMix}/${r.nSelected}")
    assert(r.nVectors == r.nAfterMix,
      s"index corpus ${r.nVectors} != final selection ${r.nAfterMix}")
    // full (all-shard, id-distinct) search over the overlap index must
    // dominate the routed mode, and both clear serving floors
    assert(r.recallFull >= r.recallRouted - 1e-9,
      s"full ${r.recallFull} < routed ${r.recallRouted}")
    assert(r.recallFull >= 0.9, s"full recall ${r.recallFull}")
    assert(r.recallRouted >= 0.6, s"routed recall ${r.recallRouted}")
    // the reloaded index carried its persisted serving schedule
    assert(r.schedule.contains("\"dispatch_k_threshold\""), r.schedule)
    // the stitched filtered step served from its reloaded
    // label-partitioned layout at a plain beam
    assert(r.recallFiltered >= 0.9,
      s"filtered recall ${r.recallFiltered} (label ${r.filteredLabel})")
  }
}
