package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Multimodal, Similarity}

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  test("MinHash-LSH verified pairs equal exact Jaccard pairs") {
    val lsh = Dedup.minhashLshPairs(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardPairs(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
    assert(exact.nonEmpty) // fixture plants near-dup pairs
  }

  test("x13 shingle df-cap leaves the fixture pair set unchanged") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", Dedup.shingles($"text").as("sh"))
      .withColumn("nsh", size($"sh"))
      .persist()
    try {
      def pairs(cap: Long) = Dedup.jaccardPairsOf(docs, cap)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val nDocs = docs.count()
      val cap = math.max(Dedup.ShingleDfCapFloor,
        math.ceil(Dedup.ShingleDfCapFraction * nDocs).toLong)
      // the guard must actually bite on the fixture for this test to mean
      // anything: some shingle's document frequency exceeds the cap
      val maxDf = docs.select(explode($"sh").as("s"))
        .groupBy($"s").count().agg(max($"count")).collect()(0).getLong(0)
      assert(maxDf > cap, s"fixture maxDf=$maxDf cap=$cap — cap never bites")
      assert(pairs(cap) == pairs(Long.MaxValue))
      assert(pairs(cap).nonEmpty)
    } finally docs.unpersist()
  }

  test("x16's curated-subset cap path matches the uncapped join too") {
    // corpusCuration runs jaccardPairsOf over the quality-filtered subset
    // with a cap derived from the SUBSET size — gate that shipped path
    // directly, not just the full-fixture x13 path
    val sh = Dedup.curationShingled(spark, sf)
    def pairs(cap: Long) = Dedup.jaccardPairsOf(sh, cap)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(-1L) == pairs(Long.MaxValue))
  }

  test("x17 clusters: pair endpoints co-clustered, id is the member min") {
    val clusters = Dedup.dupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pairs = Dedup.jaccardPairs(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // every verified near-dup pair lands in one cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split")
    }
    // the cluster id is the minimum member id, size matches membership
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
      assert(members.values.forall(_._2 == members.size))
    }
  }

  test("exact dedup groups cover all docs") {
    val agg = Dedup.exactDedup(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_copies")).collect()(0).getLong(0)
    assert(agg == Tables.documents(spark, sf).count())
  }

  test("simhash expression signatures equal the relational formulation") {
    val a = Dedup.simhashSigs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.simhashSigsViaAgg(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("simhash near-dup pairs include the planted near-dups") {
    val sim = Dedup.simhashPairs(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardPairs(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 0.98-Jaccard near-dups have near-identical word multisets → tiny
    // hamming distance; simhash must catch a large majority
    val caught = exact.count(sim.contains).toDouble / exact.size
    assert(caught >= 0.8, s"simhash caught only $caught of planted pairs")
  }

  test("ANN sketch-rescore recall@5 vs brute force") {
    val bf = Similarity.bruteForceTopK(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshTopK(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.count(ann.contains).toDouble / bf.size
    // full-precision scan fraction is 1/3 by construction (ntile(3));
    // the sketch pass touches only the 32-dim projection table
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("x14 tiled cosine join: no nested-loop/cartesian over the corpus") {
    val plan = Similarity.cosineNearDupPairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("frame sampling: mapPartitions plumbing equals expression form") {
    val a = Multimodal.frameSample(spark, sf).collect().map(_.toSeq)
    val b = Multimodal.frameSampleViaMapPartitions(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
