package graft.sources

import java.util
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1/S2 — the reference's paginated REST extraction (Main.py:330-357,
  * 489-511) re-expressed as a DataSource V2 batch source: a landing
  * directory of page files (`page_*.json`, each a JSON array of raw trip
  * records with nested `entry`/`station` objects) becomes a table with
  * ONE InputPartition PER PAGE, so Spark schedules page reads in parallel
  * exactly where the reference used a ThreadPoolExecutor. Per-page reads
  * are wrapped in the Retry util (S4/S5 analog).
  *
  * Usage: spark.read.format("graft.sources.PagedJsonSource").load(dir)
  */
class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedJsonTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

object PagedJsonSource {
  /** Raw record shape as landed from the API (pre-P2 flatten). */
  val schema: StructType = StructType(Seq(
    StructField("serialId", LongType),
    StructField("confirm_status", BooleanType),
    StructField("sale_price", DoubleType),
    StructField("date", StringType),
    StructField("end_location", StringType),
    StructField("km_start", StringType),
    StructField("km_return", StringType),
    StructField("car_number", StringType),
    StructField("entry", StructType(Seq(StructField("number", LongType)))),
    StructField("station", StructType(Seq(StructField("name", StringType))))))
}

class PagedJsonTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"paged_json($path)"
  override def schema(): StructType = PagedJsonSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = PagedJsonSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        PagedJsonTable.groupPages(PagedJsonTable.listPages(path))
      override def createReaderFactory(): PartitionReaderFactory =
        new PagePartitionReaderFactory
      override def toMicroBatchStream(checkpointLocation: String)
          : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
        new PagedMicroBatchStream(path)
    }
}

object PagedJsonTable {
  /** Cap on planned partitions: pages are tiny, and one-task-per-page
    * recreates the small-files problem — group consecutive pages into at
    * most this many splits (parallel enough for any executor count here;
    * a cluster deployment would size this from the scan stats). */
  val MaxPartitions = 128

  def listPages(path: String): Array[java.io.File] =
    Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("page_") && f.getName.endsWith(".json"))
      .sortBy(_.getName)

  def groupPages(pages: Array[java.io.File]): Array[InputPartition] = {
    if (pages.isEmpty) return Array.empty
    val chunk = math.max(1, math.ceil(pages.length.toDouble / MaxPartitions).toInt)
    pages.grouped(chunk)
      .map(g => PagePartition(g.map(_.getAbsolutePath).toSeq): InputPartition)
      .toArray
  }
}

/** S3 — checkpointed pagination as a MicroBatchStream: the offset is the
  * page index, so Spark's offset log gives exactly the reference's
  * "resume from current_page" behavior (Main.py:109-163,475-481): a
  * restarted query with the same checkpoint re-reads nothing and picks
  * up newly landed pages only. */
class PagedMicroBatchStream(path: String)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  case class PageOffset(page: Int) extends Offset {
    override def json(): String = page.toString
  }

  override def initialOffset(): Offset = PageOffset(0)
  override def latestOffset(): Offset =
    PageOffset(PagedJsonTable.listPages(path).length)
  override def deserializeOffset(json: String): Offset =
    PageOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].page
    val e = end.asInstanceOf[PageOffset].page
    PagedJsonTable.groupPages(PagedJsonTable.listPages(path).slice(s, e))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PagePartitionReaderFactory
}

case class PagePartition(files: Seq[String]) extends InputPartition

class PagePartitionReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PageReader(partition.asInstanceOf[PagePartition].files)
}

class PageReader(files: Seq[String]) extends PartitionReader[InternalRow] {
  private lazy val records: Iterator[JsonNode] = {
    import scala.jdk.CollectionConverters._
    val mapper = new ObjectMapper()
    files.iterator.flatMap { file =>
      val root = Retry.withRetries(attempts = 5, baseDelayMs = 10) {
        mapper.readTree(new java.io.File(file))
      }
      root.elements().asScala
    }
  }
  private var current: InternalRow = _

  private def str(n: JsonNode): Any =
    if (n == null || n.isNull) null else UTF8String.fromString(n.asText())
  private def lng(n: JsonNode): Any =
    if (n == null || n.isNull) null else java.lang.Long.valueOf(n.asLong())
  private def dbl(n: JsonNode): Any =
    if (n == null || n.isNull) null else java.lang.Double.valueOf(n.asDouble())
  private def bool(n: JsonNode): Any =
    if (n == null || n.isNull) null else java.lang.Boolean.valueOf(n.asBoolean())

  override def next(): Boolean = {
    if (!records.hasNext) return false
    val r = records.next()
    val entry =
      if (r.get("entry") == null || r.get("entry").isNull) null
      else new GenericInternalRow(Array[Any](lng(r.get("entry").get("number"))))
    val station =
      if (r.get("station") == null || r.get("station").isNull) null
      else new GenericInternalRow(Array[Any](str(r.get("station").get("name"))))
    current = new GenericInternalRow(Array[Any](
      lng(r.get("serialId")), bool(r.get("confirm_status")),
      dbl(r.get("sale_price")), str(r.get("date")), str(r.get("end_location")),
      str(r.get("km_start")), str(r.get("km_return")), str(r.get("car_number")),
      entry, station))
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** S4 — retry/backoff wrapper (robust_api_call analog, Main.py:167-208). */
object Retry {
  def withRetries[T](attempts: Int, baseDelayMs: Long)(f: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f
      catch {
        case e: Throwable =>
          last = e
          Thread.sleep(math.min(baseDelayMs * (1L << i), 5000))
      }
      i += 1
    }
    throw last
  }
}
