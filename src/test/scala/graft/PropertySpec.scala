package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.nlp.{Cleaner, Normalize}

/** Property-based checks (SURVEY §5.3) over deterministic ScalaCheck
  * samples (no scalatest-plus bridge in the offline cache, so sampling is
  * manual and seeded). The normalization alphabet excludes combining
  * diacritics/ligatures: like the reference, the chain is not idempotent
  * when stripping a diacritic exposes a new word-final ه — the fixture
  * goldens cover those literal paths instead. */
class PropertySpec extends AnyFunSuite {

  private val arabicBase = "ابتثجحخدذرزسشصضطظعغفقكلمنهويةىأإآ"
  private val alphabet: Gen[Char] = Gen.frequency(
    (6, Gen.oneOf(arabicBase.toSeq)),
    (3, Gen.alphaLowerChar),
    (1, Gen.numChar),
    (2, Gen.const(' ')),
    (1, Gen.oneOf('+', '،', ',', ';')))
  private val text: Gen[String] = Gen.listOf(alphabet).map(_.mkString)

  private def samples(n: Int = 400): Seq[String] = {
    val params = Gen.Parameters.default.withSize(40)
    var seed = Seed(42L)
    (0 until n).map { _ =>
      val s = text.pureApply(params, seed)
      seed = seed.next
      s
    }
  }

  test("Fs.jsonQuote round-trips any string through a real JSON parser") {
    // the one escaper both Verify's oracle dump and CleanApi's CLI
    // share: its output must parse back to the exact input, including
    // control chars, quotes, backslashes, and unicode
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val hostile = Seq("", "\"", "\\", "\n\r\t", "a\u0000b", "\u001f",
      "plain", "مرحبا \"بالعالم\"", "tab\there\nand\\there",
      "SELECT * FROM t WHERE a = 'x\ny'")
    for (s <- hostile ++ samples(100)) {
      val parsed = mapper.readTree(Fs.jsonQuote(s))
      assert(parsed.isTextual && parsed.asText() == s,
        s"round-trip diverged for <${s.take(40)}>")
    }
  }

  test("normalize is idempotent") {
    for (s <- samples()) {
      val once = Normalize.normalize(s)
      assert(Normalize.normalize(once) == once, s"input=<$s>")
    }
  }

  test("normalize never yields leading/trailing/double spaces") {
    for (s <- samples()) {
      val n = Normalize.normalize(s)
      assert(n == n.trim && !n.contains("  "), s"input=<$s>")
    }
  }

  test("token_sort_ratio is symmetric, bounded, reflexive") {
    val ss = samples()
    for ((a, b) <- ss.zip(ss.reverse)) {
      val r = Cleaner.tokenSortRatio(a, b)
      assert(r >= 0.0 && r <= 100.0)
      assert(math.abs(r - Cleaner.tokenSortRatio(b, a)) < 1e-9)
      assert(Cleaner.tokenSortRatio(a, a) == 100.0)
    }
  }

  test("indel distance: identity, empty, symmetry, upper bound") {
    val ss = samples(200)
    for ((a, b) <- ss.zip(ss.reverse)) {
      val d = Cleaner.indelDistance(a, b)
      assert(d == Cleaner.indelDistance(b, a))
      assert(d <= a.length + b.length)
      assert(Cleaner.indelDistance(a, a) == 0)
      assert(Cleaner.indelDistance(a, "") == a.length)
    }
  }

  test("extract_all_locations output is deduped and canonical-only") {
    val canonicals = graft.nlp.Locations.master.keySet
    for (s <- samples()) {
      val locs = Cleaner.extractAllLocations(s)
      assert(locs.distinct == locs)
      assert(locs.forall(canonicals.contains))
    }
  }

  test("simhash64 byte-level splitting equals a string-split reference") {
    import org.apache.spark.unsafe.types.UTF8String
    for (s <- samples()) {
      val got = graft.functions.ExprImpl.simhash64(UTF8String.fromString(s))
      val votes = new Array[Int](64)
      s.split(" ").filter(_.nonEmpty).foreach { w =>
        val h = graft.functions.ExprImpl.fnv1a64(UTF8String.fromString(w))
        (0 until 64).foreach { j =>
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        }
      }
      val ref = (0 until 64).foldLeft(0L) { (acc, j) =>
        if (votes(j) > 0) acc | (1L << j) else acc
      }
      assert(got == ref, s"input=<$s>")
    }
  }

  test("x01 approx_count_distinct within 2% of the exact count per group") {
    val spark = SparkSuite.spark
    val sf = SparkSuite.sf
    val approx = graft.ops.Relational.x01ApproxDistinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.ops.Relational.g02CountDistinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex) <= math.max(1L, (ex * 0.02).toLong),
        s"group $k: approx $ap vs exact $ex exceeds 2%")
    }
  }

  test("x52 admission hash is overflow-safe and monotone at doc_id ≈ 2⁴⁰") {
    // The r6 fix exists FOR this regime: with the old Knuth multiplier
    // (2654435761 > 2³¹) the masked-key product exceeded 2⁶³ — Spark
    // wrapped negative (admitting everything), DuckDB raised BIGINT
    // overflow. Fixture doc_ids are small, so the green x52 row alone
    // would pass with the broken hash too; this pins the at-scale claim.
    val spark = SparkSuite.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ids: Seq[Long] = (0 until 2048).map(i => (1L << 40) + i * 104729L) ++
      (0 until 64).map(i => (1L << 31) - 32 + i) ++ // 2³¹ boundary
      (0 until 64).map(i => (1L << 32) - 32 + i) ++ // 2³² mask boundary
      Seq(0L, 1L, Long.MaxValue)
    // the test ids must actually exercise the overflow regime: the OLD
    // multiplier wraps negative on them (guards against a fixture that
    // never bites)
    val oldWraps = ids.count(id => (id & 4294967295L) * 2654435761L < 0)
    assert(oldWraps > 0, "no test id triggers the old overflow — regime untested")
    val got = ids.toDF("doc_id")
      .select($"doc_id", graft.ops.Sampling.admitPermille($"doc_id").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // (a) no negative wrap, always a permille bucket
    got.foreach { case (id, h) =>
      assert(h >= 0 && h < 1000, s"doc_id=$id h=$h out of [0,1000)")
    }
    // engine-independent semantics: matches an exact BigInt reference
    got.foreach { case (id, h) =>
      val ref = (((BigInt(id) & BigInt(4294967295L)) * BigInt(1640531527L))
        .mod(BigInt(4294967296L))).mod(BigInt(1000)).toLong
      assert(h == ref, s"doc_id=$id h=$h ref=$ref")
    }
    // (b) weight-monotonicity: kept set only grows with the weight
    def kept(w: Long) = got.collect { case (id, h) if h < w => id }.toSet
    assert(kept(250).subsetOf(kept(500)) && kept(500).subsetOf(kept(1000)))
    // hash spreads: sequential high ids don't collapse into few buckets
    assert(got.values.toSet.size > 500, s"only ${got.values.toSet.size} distinct buckets")
  }

  test("x54 water-fill: caps respected, budget filled, level uniform") {
    val spark = SparkSuite.spark
    val rows = graft.ops.Sampling.unimaxAlloc(spark, SparkSuite.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val k = rows.length
    assert(k > 1)
    val (capped, uncapped) = rows.partition(_._5)
    // the fixture must exercise BOTH branches or the oracle row is weak
    assert(capped.nonEmpty, "no source hits its cap — water level never bites")
    assert(uncapped.nonEmpty, "every source capped — budget never binds")
    // capped sources get exactly their cap; nobody exceeds it
    capped.foreach { case (s, _, cap, alloc, _) =>
      assert(alloc == cap, s"$s capped but alloc=$alloc cap=$cap") }
    rows.foreach { case (s, _, cap, alloc, _) =>
      assert(alloc <= cap, s"$s alloc=$alloc exceeds cap=$cap") }
    // one shared water level θ, at or above every capped source's cap
    val levels = uncapped.map(_._4).distinct
    assert(levels.length == 1, s"non-uniform water level: ${levels.toSeq}")
    assert(capped.map(_._3).max <= levels.head)
    // budget exhausted up to integer-floor slack (< 1 token per source)
    val budget = rows.map(_._2).sum * graft.ops.Sampling.UnimaxBudgetPermille / 1000
    val total = rows.map(_._4).sum
    assert(total <= budget, s"total=$total over budget=$budget")
    assert(budget - total < k, s"under-filled: total=$total budget=$budget")
  }

  test("x49 packing: offsets tile each source; seq count = ceil(total/len)") {
    val spark = SparkSuite.spark
    val C = graft.ops.Sampling.PackSeqLen
    val rows = graft.ops.Sampling.sequencePack(spark, SparkSuite.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, docs) =>
      // offsets tile the source's token stream with no gap or overlap
      var expectedOff = 0L
      docs.sortBy(_._2).foreach { case (_, id, n, off, first, last, crosses) =>
        assert(off == expectedOff, s"$src doc $id off=$off expected=$expectedOff")
        expectedOff += n
        // sequence indices follow from the offsets and nothing else
        assert(first == off / C && last == (off + n - 1) / C)
        assert(crosses == (first != last))
      }
      // the packed shard count is exactly ceil(total / seqlen)
      val total = docs.map(_._3).sum
      assert(docs.map(_._6).max == (total - 1) / C,
        s"$src: last sequence index vs total=$total")
    }
    // the fixture must actually exercise boundary-crossing docs
    assert(rows.exists(_._7), "no doc crosses a sequence boundary")
    assert(rows.exists(!_._7), "every doc crosses — fixture degenerate")
  }

  test("trip type is always one of the reference's categories") {
    val cats = Set("Invalid Data", "Airport Transfer", "Admin/Management",
      "Round Trip", "Nile Cruise", "Special Operations", "Multi-Destination",
      "Standard Transfer", "Undefined")
    for (s <- samples()) {
      val t = Cleaner.categorizeTripType(s, Cleaner.extractAllLocations(s))
      assert(cats.contains(t), s"input=<$s> type=$t")
    }
  }

  test("x82 snapshot-diff algebra: diff(a,a) empty; membership decides " +
      "status on random snapshot pairs") {
    val spark = SparkSuite.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def snap(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text").select($"doc_id",
        sha2($"text", 256).as("h"))
    val ids = (0L until 64L)
    // a) identical snapshots diff to nothing
    val a = snap(ids.map(i => (i, s"doc $i")))
    assert(graft.ops.Pipeline.snapshotDiffOf(a, a).isEmpty,
      "diff of identical snapshots must be empty")
    // b) randomized pairs: membership + content decide status exactly
    val gen = for {
      oldMask <- Gen.listOfN(64, Gen.oneOf(true, false))
      newMask <- Gen.listOfN(64, Gen.oneOf(true, false))
      chgMask <- Gen.listOfN(64, Gen.oneOf(true, false))
    } yield (oldMask, newMask, chgMask)
    for (seed <- 0 until 3) {
      val (om, nm, cm) = gen(Gen.Parameters.default,
        Seed(4242L + seed)).get
      val oldRows = ids.filter(i => om(i.toInt)).map(i => (i, s"doc $i"))
      val newRows = ids.filter(i => nm(i.toInt)).map(i =>
        (i, if (cm(i.toInt)) s"doc $i CHANGED" else s"doc $i"))
      val got = graft.ops.Pipeline
        .snapshotDiffOf(snap(oldRows), snap(newRows))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val expect = ids.flatMap { i =>
        (om(i.toInt), nm(i.toInt)) match {
          case (false, true)                 => Some(i -> "added")
          case (true, false)                 => Some(i -> "removed")
          case (true, true) if cm(i.toInt)   => Some(i -> "changed")
          case _                             => None
        }
      }
      assert(got == expect.sortBy(_._1),
        s"seed $seed: diff algebra violated")
    }
    // c) null-hash semantics (a caller's null text): NULL on exactly
    // one side is a CHANGE — the naive `o_h =!= n_h` filter evaluated
    // to NULL there and silently reported the doc unchanged; NULL on
    // both sides is unchanged (IS DISTINCT FROM semantics, mirrored in
    // the oracle and the streamed updater)
    val oldN = Seq((1L, "same"), (2L, null), (3L, null))
      .toDF("doc_id", "h")
    val newN = Seq((1L, "same"), (2L, "now-crawled"), (3L, null))
      .toDF("doc_id", "h")
    val gotN = graft.ops.Pipeline.snapshotDiffOf(oldN, newN)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(gotN == Seq(2L -> "changed"),
      s"null-hash semantics violated: $gotN")
  }
}
