package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Retrieval-quality gate for the ANN tier (r14 VERDICT #6): the oracle
 * gates pin determinism and SQL-exactness of each method's candidate
 * arithmetic, but none of them measured recall@k against brute-force
 * ground truth — a parameter regression (numPlanes occupancy, nprobe,
 * rerank depth) could degrade retrieval while staying oracle-green.
 *
 * Everything here is deterministic (sin-based clustered corpus, splitmix64
 * planes, seeded k-means), so the measured recalls are EXACT constants —
 * pinned to the digit. A pin moving means retrieval quality changed:
 * deliberate tuning updates the pin, a regression fails the build.
 */
class AnnQualitySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val k = 10

  // a HARD deterministic retrieval task: 25 loose clusters (member noise
  // at the same scale as the center signal, so true neighbors sit at
  // cosine ~0.6-0.8, not 0.95) among 1000 decoys — near the quality edge
  // where a parameter regression actually moves recall, which is what
  // makes the pins a canary rather than a rubber stamp
  private lazy val corpus = {
    val members = for (c <- 0 until 25; m <- 0 until 16) yield {
      val id = (c * 16 + m).toLong
      (id, Array.tabulate(dim)(j =>
        (math.sin(j * 0.29 + c * 1.13) + 0.9 * math.sin(m * 1.7 + j * 0.53 + c)).toFloat))
    }
    val decoys = (1000L until 2000L).map(i => (i,
      Array.tabulate(dim)(j => math.sin(i * 2.9 + j * 1.3 + 7).toFloat)))
    (members ++ decoys).toDF("vec_id", "embedding").persist()
  }

  // five query vectors, one per sampled cluster center, perturbed enough
  // that the true top-10 mixes cluster members with strong decoys
  private lazy val queries: Seq[Seq[Float]] = (0 until 5).map { qi =>
    val c = qi * 5
    Array.tabulate(dim)(j =>
      (math.sin(j * 0.29 + c * 1.13) + 0.3 * math.sin(j * 0.91 + qi)).toFloat).toSeq
  }

  private lazy val truths: Seq[Set[Long]] = queries.map(q =>
    Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, k)
      .select("id").as[Long].collect().toSet)

  private def recallAt10(retrieve: Seq[Float] => Seq[Long]): Double = {
    val per = queries.zip(truths).map { case (q, truth) =>
      retrieve(q).count(truth).toDouble / truth.size
    }
    per.sum / per.size
  }

  test("recall@10 pins: every ANN method against brute-force ground truth") {
    val lsh = recallAt10(q =>
      Similarity.lshTopKMultiTable(corpus, "vec_id", "embedding", q, k,
        numPlanes = 12, numTables = 16).select("id").as[Long].collect().toSeq)
    val ivf = recallAt10(q =>
      Similarity.ivfTopK(corpus, "vec_id", "embedding", q, k,
        nlist = 16, nprobe = 4, iters = 2).select("id").as[Long].collect().toSeq)
    val pq = recallAt10(q =>
      Pq.pqTopK(corpus, "vec_id", "embedding", q, k = k,
        m = 8, ksub = 16, rerank = 100, iters = 2).select("id").as[Long].collect().toSeq)
    val ivfpq = recallAt10(q =>
      Pq.ivfPqTopK(corpus, "vec_id", "embedding", q, k = k, nlist = 16,
        nprobe = 8, m = 8, ksub = 16, rerank = 100, iters = 2)
        .select("id").as[Long].collect().toSeq)
    info(f"recall@10  lsh=$lsh%.3f ivf=$ivf%.3f pq=$pq%.3f ivfpq=$ivfpq%.3f")
    // quality floors: the contract a parameter regression must not break.
    // LSH's floor is lower BY DESIGN: random-hyperplane buckets target the
    // near-dup regime (cosine >= ~0.9, where FunctionsSpec pins multi-table
    // recall >= 0.7 at the same parameters); this corpus's 0.6-0.8
    // neighbors are the regime IVF/PQ exist for
    assert(lsh >= 0.45, s"multi-table LSH recall@10 degraded: $lsh")
    assert(ivf >= 0.85, s"IVF recall@10 degraded: $ivf")
    assert(pq >= 0.9, s"PQ recall@10 degraded: $pq")
    assert(ivfpq >= 0.85, s"IVF-PQ recall@10 degraded: $ivfpq")
    // exact pins: deterministic corpus + seeded structures => constants;
    // a deliberate retuning updates these, anything else is a regression
    assert(math.abs(lsh - RecallPins.lsh) < 1e-9, s"lsh recall moved: $lsh != ${RecallPins.lsh}")
    assert(math.abs(ivf - RecallPins.ivf) < 1e-9, s"ivf recall moved: $ivf != ${RecallPins.ivf}")
    assert(math.abs(pq - RecallPins.pq) < 1e-9, s"pq recall moved: $pq != ${RecallPins.pq}")
    assert(math.abs(ivfpq - RecallPins.ivfpq) < 1e-9,
      s"ivfpq recall moved: $ivfpq != ${RecallPins.ivfpq}")
  }

  // measured once on the deterministic corpus above and pinned
  private object RecallPins {
    val lsh = 0.52
    val ivf = 0.96
    val pq = 1.0
    val ivfpq = 0.96
  }
}
