package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SimilaritySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("LSH ANN achieves useful recall against brute force") {
    val exact = Similarity.q45CosineTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val approx = Similarity.q46AnnLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 4 tables × 4 bits over 64-dim near-uniform vectors: collision
    // probability for the ~0.45-cosine true neighbors is ≈0.5 while
    // probing ≈25% of the corpus; assert recall is well above both the
    // random-subset baseline and the old single-table behavior.
    assert(recall > 0.25, s"recall $recall")
    val rerun = Similarity.q46AnnLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    assert(rerun === approx) // deterministic
  }

  test("IVF ANN beats LSH-level recall with 4/16 cells probed") {
    val exact = Similarity.q45CosineTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Similarity.q55AnnIvf(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // probing the 4 nearest of 16 cells examines ~25% of the corpus;
    // cells are similarity-aligned so recall should clearly beat the
    // probed fraction
    assert(recall > 0.35, s"recall $recall")
  }

  test("brute-force top-k is exhaustive and correctly ranked") {
    val rows = Similarity.q45CosineTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size === 50)
    byQ.values.foreach { rs =>
      val sims = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("sim"))
      assert(sims.sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      })
    }
  }
}
