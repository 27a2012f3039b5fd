package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.nlp.{Goldens, Normalize}

/** The Column-expression normalization chains must agree with the pure
  * Scala implementations (and therefore with the reference goldens). */
class NormalizeColSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("normalizeCol == reference goldens on fixtures") {
    val df = Goldens.raw.zipWithIndex
      .map { case (r, i) => (i, r.getOrElse("")) }.toDF("vid", "s")
    val got = df.select($"vid", Normalize.normalizeCol($"s").as("n"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    for (i <- Goldens.raw.indices)
      assert(got(i) == Goldens.normalized(i), s"vid=$i")
  }

  test("cleanTextCol == reference goldens on fixtures") {
    val df = Goldens.raw.zipWithIndex
      .map { case (r, i) => (i, r.orNull) }.toDF("vid", "s")
    val got = df.select($"vid", Normalize.cleanTextCol($"s").as("n"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    for (i <- Goldens.raw.indices)
      assert(got(i) == Goldens.cleanText(i), s"vid=$i")
  }

  test("normalizeCol == pure Scala on assorted adversarial strings") {
    val inputs = Seq(
      "مطارررر", "ســـلام", "هدية هـ", "café THE the", "a  b   c",
      "ﻵ ﻷ", "أإآٱ", "على ى", "12 ساعه", "x+y,z؛w", "", "   ",
      "and or the to", "aaaa bbbb", "مُحَمَّد")
    val df = inputs.toDF("s")
    val got = df.select(Normalize.normalizeCol($"s")).collect().map(_.getString(0))
    inputs.zip(got).foreach { case (in, g) =>
      assert(g == Normalize.normalize(in), s"input=<$in>")
    }
  }
}
