package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Dataset-splitting / sampling operators of a training-data pipeline.
  *
  *  - x50 deterministic split: train/val/test assignment must be a pure
  *    function of the document key (reproducible across runs, engines and
  *    re-partitions — never `rand()`), here `doc_id mod 10` → 8/1/1.
  *    Map-only + one aggregation shuffle.
  *  - x51 per-source cap: "at most K documents per domain" is the
  *    standard anti-domination guard before training. One shuffle on
  *    `source`, per-group ordered row_number, cap filter. At 100 TB a
  *    pre-pass aggregation can skip sorting sources already under the
  *    cap; AQE handles the skewed-source partitions.
  */
object Sampling {

  /** x50 — deterministic 80/10/10 split, audited per (split, lang). */
  def splitCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("split",
        when($"doc_id" % 10 < 8, "train")
          .when($"doc_id" % 10 === 8, "val")
          .otherwise("test"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n"))
      .orderBy($"split", $"lang")
  }

  val splitCountsSql: String =
    """SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
      |            WHEN doc_id % 10 = 8 THEN 'val'
      |            ELSE 'test' END AS split,
      |       lang, COUNT(*) AS n
      |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  private val CapPerSource = 100

  /** x51 — keep at most [[CapPerSource]] docs per source (doc_id order). */
  def sourceCap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id")
    Tables.documents(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= CapPerSource)
      .select($"source", $"doc_id", $"rk".cast("int").as("rk"))
      .orderBy($"source", $"doc_id")
  }

  val sourceCapSql: String =
    s"""SELECT source, doc_id, CAST(rk AS INT) AS rk FROM (
       |  SELECT source, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rk
       |  FROM documents) t
       |WHERE rk <= $CapPerSource ORDER BY source, doc_id""".stripMargin
}
