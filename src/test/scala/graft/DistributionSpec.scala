package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution gates over the REGISTERED label/class-producing
  * queries — the r14 lesson generalized: a hash oracle verifies
  * AGREEMENT, not INFORMATIVENESS. The r14 lang-id-teacher candidate
  * was hash-green against its own oracle while labeling EVERY document
  * 'en' (the fixture word soup contains 'a'/'the'), i.e. semantically
  * useless. Each test here names one distribution invariant of a
  * registered query's output — required classes present, minimum
  * distinct cardinality, no single value holding degenerate mass —
  * so a regression to a constant labeler fails THIS suite even while
  * the oracle stays green.
  */
class DistributionSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  /** The shared helper (the r14 x69 kept-fraction gate generalized):
    * `col` must carry ≥ `minDistinct` distinct values, every value in
    * `required` must be present, and no single value may hold more
    * than `maxShare` of the mass (row count, or the sum of
    * `weightCol` for pre-aggregated outputs — distribution gates care
    * about mass, not group-row counts). */
  private def assertDistribution(df: DataFrame, colName: String,
      minDistinct: Int, required: Set[String] = Set.empty,
      maxShare: Double = 1.0, weightCol: Option[String] = None): Unit = {
    val w = weightCol.map(col).getOrElse(lit(1L)).cast("long")
    val byVal = df.groupBy(col(colName).cast("string").as("v"))
      .agg(sum(w).as("n")).collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1))
      .toMap
    assert(byVal.size >= minDistinct,
      s"$colName: only ${byVal.size} distinct value(s): ${byVal.take(8)}")
    val missing = required -- byVal.keySet
    assert(missing.isEmpty, s"$colName: required values absent: $missing " +
      s"(got ${byVal.keySet.take(8)})")
    if (maxShare < 1.0) {
      val total = byVal.values.sum.toDouble
      val (topV, topN) = byVal.maxBy(_._2)
      assert(total > 0 && topN / total <= maxShare,
        s"$colName degenerate: '$topV' holds ${topN / total} of the mass")
    }
  }

  test("x50 split assignment: all three splits present, train majority " +
      "but never the whole corpus") {
    assertDistribution(graft.ops.Sampling.splitCounts(spark, sf), "split",
      minDistinct = 3, required = Set("train", "val", "test"),
      maxShare = 0.95, weightCol = Some("n"))
  }

  test("x71 leakage-free splits: all three splits present by doc mass " +
      "(cluster-keyed assignment must not collapse a split)") {
    assertDistribution(graft.ops.Sampling.leakageFreeSplit(spark, sf),
      "split", minDistinct = 3, required = Set("train", "val", "test"),
      maxShare = 0.95, weightCol = Some("n_docs"))
  }

  test("x31 language id: multiple languages detected, no constant-label " +
      "collapse (the r14 teacher failure class)") {
    assertDistribution(graft.ops.TextAnalysis.langId(spark, sf), "lang",
      minDistinct = 3, maxShare = 0.8)
  }

  test("x52 mixture sample: every configured source survives sampling") {
    assertDistribution(graft.ops.Sampling.mixtureSample(spark, sf),
      "source", minDistinct = 2, maxShare = 0.95)
  }

  test("x84 clusters: sizes self-consistent, no singleton labels; the " +
      "registered fixture's one-giant-component truth is pinned") {
    import spark.implicits._
    val got = graft.ops.Similarity.knnClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // cluster_size must equal the actual member count per label — a
    // drifted window partition would silently misreport sizes while
    // row hashes still matched a same-bug oracle
    val sizes = got.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    got.foreach { case (v, c, s) =>
      assert(s == sizes(c), s"vec $v cluster $c reports size $s != ${sizes(c)}")
    }
    // labels exist only for nodes with mutual edges ⇒ every cluster
    // has ≥ 2 members and isolated vectors are EXCLUDED (rows < corpus)
    assert(sizes.values.min >= 2L, "singleton cluster leaked into x84")
    val corpus = Tables.embeddings(spark, sf).count()
    assert(got.length < corpus,
      "every vector clustered — the mutual filter dropped nothing, " +
        "which this fixture's isolated vectors make impossible")
    // distribution NOTE, pinned: on the registered synthetic blob the
    // mutual-kNN graph is one giant component (uniform embeddings, no
    // distance threshold — the operator's planted-cluster behavior is
    // gated in DedupSimilaritySpec on a multi-cluster fixture). If
    // this count ever grows past the sanity bound it means the
    // fixture/operator changed shape and the gate should be revisited.
    assert(sizes.size >= 1 && sizes.size <= got.length / 2)
  }
}
