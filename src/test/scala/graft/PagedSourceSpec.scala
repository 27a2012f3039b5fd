package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{PagedLanding, PagedJsonSource}

class PagedSourceSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  test("batch read: one partition per page, records round-trip") {
    val dir = PagedLanding.ensureLanded(spark, sf)
    val df = spark.read.format("graft.sources.PagedJsonSource").load(dir)
    val nPages = new File(dir).listFiles().count(_.getName.startsWith("page_"))
    assert(df.rdd.getNumPartitions == nPages)
    assert(df.count() == Tables.orders(spark, sf).count())
    // nested struct fields arrive intact
    val flat = df.select(col("serialId"), col("entry.number"), col("station.name"))
    assert(flat.filter(col("number").isNotNull).count() > 0)
  }

  test("micro-batch stream: checkpointed page resume reads new pages only") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_page_resume")
    val pages = new File(work.toFile, "pages"); pages.mkdirs()
    val ckpt = new File(work.toFile, "ckpt").getAbsolutePath
    val out = new File(work.toFile, "out"); out.mkdirs()

    def writePage(i: Int, ids: Seq[Long]): Unit = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val arr = mapper.createArrayNode()
      ids.foreach { id =>
        val o = arr.addObject()
        o.put("serialId", id); o.put("confirm_status", true)
        o.put("sale_price", id * 1.5)
        o.putObject("entry").put("number", id * 3)
        o.putObject("station").put("name", s"S${id % 2}")
      }
      mapper.writeValue(new File(pages, f"page_$i%05d.json"), arr)
    }

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.PagedJsonSource")
        .schema(PagedJsonSource.schema)
        .load(pages.getAbsolutePath)
        .writeStream.format("parquet")
        .option("path", out.getAbsolutePath)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writePage(0, Seq(1L, 2L, 3L))
    writePage(1, Seq(4L, 5L))
    runOnce()
    val first = spark.read.parquet(out.getAbsolutePath)
    assert(first.count() == 5)

    // land two more pages; the SAME checkpoint must resume at page 2
    writePage(2, Seq(6L))
    writePage(3, Seq(7L, 8L))
    runOnce()
    val second = spark.read.parquet(out.getAbsolutePath)
    assert(second.count() == 8) // 5 old (not re-read) + 3 new
    assert(second.select("serialId").distinct().count() == 8)
  }

  test("streaming trip cycle equals the batch master transform") {
    import org.apache.spark.sql.functions._
    val dir = PagedLanding.ensureLanded(spark, sf)
    val streamed = graft.streaming.Streaming.runToMemory(spark,
      graft.streaming.Streaming.tripCycle(spark, dir), "trip_cycle")
    val got = streamed
      .select(col("serialId"), col("date"), col("sale_price"),
        col("Total_KM"), col("Car_Num"), col("end_location"),
        col("Trip_Type"), col("num_locations"))
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.Transform.master(spark, sf)
      .select(col("trip_key").as("serialId"), col("date"), col("sale_price"),
        col("Total_KM"), col("Car_Num"), col("end_location"),
        col("Trip_Type"), col("num_locations"))
      .collect().map(_.toSeq).toSet
    assert(got == batch)
  }
}
