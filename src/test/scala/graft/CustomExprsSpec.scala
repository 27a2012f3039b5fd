package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.CustomExprs
import graft.nlp.Cleaner

class CustomExprsSpec extends AnyFunSuite {
  lazy val spark = { val s = SparkSuite.spark; CustomExprs.register(s); s }
  val sf = SparkSuite.sf

  test("TokenSortRatio expression == pure-Scala scorer (via SQL)") {
    import spark.implicits._
    val pairs = Seq(
      ("مطارر القاهرة", "مطار القاهرة"),
      ("b a", "a b"), ("abc", "xyz"), ("", ""), ("x", ""))
    val got = pairs.toDF("a", "b")
      .selectExpr("token_sort_ratio(a, b) AS r")
      .collect().map(_.getDouble(0))
    pairs.zip(got).foreach { case ((a, b), r) =>
      assert(math.abs(r - Cleaner.tokenSortRatio(a, b)) < 1e-9, s"($a,$b)")
    }
  }

  test("TokenSortRatio survives whole-stage codegen over a real table") {
    import spark.implicits._
    val n = Tables.documents(spark, sf)
      .select(CustomExprs.token_sort_ratio($"text", lit("spark data join")).as("r"))
      .filter($"r" > 0).count()
    assert(n > 0)
  }

  test("fnv1a64 groups coincide with sha256 groups on documents") {
    import spark.implicits._
    val d = Tables.documents(spark, sf)
    val byFnv = d.groupBy(CustomExprs.fnv1a64($"text")).count().count()
    val bySha = d.groupBy(sha2($"text", 256)).count().count()
    assert(byFnv == bySha)
  }

  test("fnv1a64 matches a known FNV-1a test vector") {
    import spark.implicits._
    // published FNV-1a 64 test vectors: "" -> 0xcbf29ce484222325,
    // "a" -> 0xaf63dc4c8601ec8c
    val got = Seq("", "a").toDF("s")
      .selectExpr("fnv1a64(s)").collect().map(_.getLong(0))
    assert(got(0) == 0xcbf29ce484222325L)
    assert(got(1) == 0xaf63dc4c8601ec8cL)
  }

  test("array_combinations2 emits sorted-order pairs i<j") {
    import spark.implicits._
    val rows = Seq(Seq("a", "b", "c"), Seq("x"), Seq[String]())
      .toDF("arr")
      .selectExpr("array_combinations2(arr) AS (a, b)")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("array_intersect_count ≡ size(array_intersect) — dups, empties, " +
      "nulls, randomized") {
    import spark.implicits._
    // hand cases covering the built-in's corner semantics: distinct
    // count (dups in a count once), null-matches-null, empty sides
    val hand: Seq[(Seq[String], Seq[String])] = Seq(
      (Seq("a", "b", "a", "c"), Seq("a", "c", "d")),
      (Seq("a", "a", "a"), Seq("a")),
      (Seq(), Seq("a")),
      (Seq("a"), Seq()),
      (Seq(null, "a"), Seq(null, "b")),
      (Seq(null, null), Seq(null)),
      (Seq("x", null), Seq("x")),
      (Seq("", "a"), Seq("", "b")))
    val rnd = new scala.util.Random(11)
    val fuzz = (0 until 200).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(12))(
        if (rnd.nextInt(10) == 0) null
        else ("s" + rnd.nextInt(8)): String)
      (arr(), arr())
    }
    val df = (hand ++ fuzz).toDF("a", "b")
      .selectExpr("array_intersect_count(a, b) AS fast",
        "size(array_intersect(a, b)) AS builtin",
        "a", "b")
    val bad = df.filter($"fast" =!= $"builtin").collect()
    assert(bad.isEmpty, s"divergence: ${bad.take(3).mkString("; ")}")
    // null-through on null input, like the built-in
    val nulls = Seq((null, Seq("a")), (Seq("a"), null))
      .toDF("a", "b")
      .selectExpr("array_intersect_count(a, b) AS fast").collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("word_count ≡ size(split(s, ' ')) — empties, runs of spaces, " +
      "multibyte, randomized") {
    import spark.implicits._
    val hand = Seq("", " ", "  ", "a", "a b", "a  b", " a b ",
      "tab\tis not a split char", "عربي نص with مزيج mixed",
      "trailing space ", " leading")
    val rnd = new scala.util.Random(5)
    val alphabet = "ab شن €\t"
    val fuzz = (0 until 300).map(_ =>
      Seq.fill(rnd.nextInt(24))(alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    val bad = (hand ++ fuzz).toDF("s")
      .selectExpr("word_count(s) AS fast", "size(split(s, ' ')) AS builtin", "s")
      .filter($"fast" =!= $"builtin").collect()
    assert(bad.isEmpty, s"divergence: ${bad.take(3).mkString("; ")}")
    val nul = Seq[String](null).toDF("s")
      .selectExpr("word_count(s) AS f").collect()
    assert(nul.head.isNullAt(0))
  }
}
