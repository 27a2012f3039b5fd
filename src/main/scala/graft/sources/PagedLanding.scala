package graft.sources

import java.io.File
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Trips

/** Deterministic "landed pages" fixture for the paged source: the same
  * trip-record stream the reference's fetch loop would have written, 30
  * records per page (Main.py:86), derived from orders so the DuckDB
  * oracle can reproduce the aggregates straight from the parquet table.
  */
object PagedLanding {

  val PageSize = 30

  def landingDir(sfDir: String): File =
    new File("/tmp/graft_pages_v2_" + sfDir.replaceAll("[^a-zA-Z0-9.]", "_"))

  /** Write page files once per sfDir (atomic rename; reruns reuse).
    *
    * Scale design: pages are written BY EXECUTORS, not the driver — the
    * trips frame is range-partitioned by trip_key, globally indexed with
    * `zipWithIndex` (one extra count pass, still distributed), shuffled by
    * page id so each page lands wholly in one task, and serialized there.
    * Driver memory is O(1); the only driver step is the final atomic
    * rename. On a cluster the landing path would be shared storage; in
    * local mode executors share /tmp with the driver, same contract
    * (page i = rows [i·30, (i+1)·30) in trip_key order, page_%05d.json). */
  def ensureLanded(spark: SparkSession, sfDir: String): String = synchronized {
    import spark.implicits._
    val dir = landingDir(sfDir)
    if (dir.exists()) return dir.getAbsolutePath
    val tmp = new File(dir.getAbsolutePath + ".tmp")
    if (tmp.exists()) tmp.listFiles().foreach(_.delete())
    tmp.mkdirs()
    val tmpPath = tmp.getAbsolutePath
    val pageSize = PageSize

    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // persisted: the sorted lineage (scan + range shuffle + sort) would
    // otherwise be recomputed by each of zipWithIndex's count job, the
    // range-partitioner sampling pass, and the write job
    val sortedRdd = Trips.raw(spark, sfDir)
      .select($"trip_key", $"confirm_status", $"sale_price_raw",
        when($"trip_key" % 19 === 18, lit(null).cast("long"))
          .otherwise(($"trip_key" * 3) % 10000).as("entry_number"),
        $"station", $"date_str", $"end_location", $"km_start_str",
        $"km_return_str", $"car_number")
      .repartitionByRange(shufflePartitions, $"trip_key")
      .sortWithinPartitions($"trip_key")
      .rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    try sortedRdd.zipWithIndex()
      .map { case (row, idx) => (idx / pageSize, (idx, row)) }
      .groupByKey(new org.apache.spark.HashPartitioner(shufflePartitions))
      .foreach { case (page, members) =>
        val mapper = new ObjectMapper()
        val arr = mapper.createArrayNode()
        members.toSeq.sortBy(_._1).foreach { case (_, r) =>
          val o = arr.addObject()
          o.put("serialId", r.getLong(0))
          o.put("confirm_status", r.getBoolean(1))
          if (r.isNullAt(2)) o.putNull("sale_price")
          else o.put("sale_price", r.getDouble(2))
          def putStr(field: String, idx: Int): Unit =
            if (r.isNullAt(idx)) o.putNull(field) else o.put(field, r.getString(idx))
          putStr("date", 5); putStr("end_location", 6)
          putStr("km_start", 7); putStr("km_return", 8); putStr("car_number", 9)
          val e = o.putObject("entry")
          if (r.isNullAt(3)) e.putNull("number") else e.put("number", r.getLong(3))
          val s = o.putObject("station")
          if (r.isNullAt(4)) s.putNull("name") else s.put("name", r.getString(4))
        }
        mapper.writerWithDefaultPrettyPrinter()
          .writeValue(new File(tmpPath, f"page_$page%05d.json"), arr)
      }
    finally sortedRdd.unpersist(blocking = false)
    // the rename is the atomic publish step — losing the race to a
    // concurrent lander is fine (its committed dir is byte-identical),
    // but any other failure must be LOUD: returning the path of a dir
    // that never appeared would make the paged source plan zero
    // partitions and read an empty corpus with no error
    if (!tmp.renameTo(dir)) {
      require(dir.isDirectory,
        s"failed to publish landing dir $dir (rename from $tmp)")
      // lost the publish race to a concurrent lander: its committed
      // dir is byte-identical, but our fully-written tmp would
      // otherwise stay orphaned on disk
      graft.Fs.deleteRecursively(tmp.toPath)
    }
    dir.getAbsolutePath
  }

  /** s04 — land → DSv2 parallel page read → P1 filter → P2 flatten →
    * aggregate per station. */
  def pagedSourceAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = ensureLanded(spark, sfDir)
    spark.read.format("graft.sources.PagedJsonSource")
      .option("limit", PageSize.toString) // protocol invariant enforced per page
      .load(dir)
      .filter($"confirm_status" === true)                          // P1
      .select($"serialId", $"sale_price",
        $"entry.number".as("entry_number"),                        // P2
        $"station.name".as("station_name"))
      .groupBy($"station_name")
      .agg(count(lit(1)).as("n"),
        sum($"sale_price".cast("decimal(18,2)")).cast("double").as("total"),
        sum($"entry_number").as("sum_entry"))
      .orderBy($"station_name".asc_nulls_first)
  }

  val pagedSourceAggSql: String =
    """SELECT
      |  CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'Station A'
      |       WHEN 1 THEN 'Station B' ELSE NULL END AS station_name,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(CASE WHEN o_orderkey % 23 = 22 THEN NULL
      |                     ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  CAST(SUM(CASE WHEN o_orderkey % 19 = 18 THEN NULL
      |           ELSE (o_orderkey * 3) % 10000 END) AS BIGINT) AS sum_entry
      |FROM orders WHERE (o_orderkey % 11) <> 0
      |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin
}
