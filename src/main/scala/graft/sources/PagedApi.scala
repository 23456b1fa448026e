package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 wrapper for the reference's paged-API scan family
  * (SURVEY §2.1 S1–S5: Ticketmaster `size=200` pages,
  * ticketmaster_spider.py:20,39; SeatGeek `per_page=50`,
  * seatgeek_spider.py:22; ArcGIS 1000-record pages with `where` /
  * `outFields` request parameters, nashville_arcgis.py:10-18) expressed
  * at Spark's SOURCE tier instead of a driver-side fetch loop:
  *
  *  - `planInputPartitions` emits ONE partition PER PAGE, so a
  *    1000-executor cluster fetches pages concurrently — the reference
  *    walks pages sequentially in a single spider process.
  *  - `SupportsPushDownFilters` is the `where=` analogue: supported
  *    predicates travel to the backend, and only matching rows cross
  *    the wire (Spark still re-applies them — pushdown is an
  *    optimization, never a correctness dependency).
  *  - `SupportsPushDownRequiredColumns` is the `outFields=` analogue:
  *    the backend serves only requested columns.
  *
  * The transport is injectable ([[PagedApi.backend]]) exactly like
  * `AiExtract`'s extractor and `BinaryOps`' decoder: this container has
  * zero egress, so tests inject a deterministic in-memory page server;
  * a production backend would speak HTTP with the reference's retry /
  * delay / concurrency envelope (BASELINE.md). */
object PagedApi {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false)))

  final case class ApiRow(id: Long, name: String, category: String,
      price: Double)

  /** In-memory "API". Volatile so executor threads (same JVM in
    * local mode) see test fixtures; a distributed deployment would
    * resolve the backend from options instead of shared state. */
  @volatile var backend: IndexedSeq[ApiRow] = IndexedSeq.empty

  /** Observability for specs: what actually got pushed to the source. */
  val pushedFilterLog = new java.util.concurrent.ConcurrentLinkedQueue[String]
  val requestedColumnsLog = new java.util.concurrent.ConcurrentLinkedQueue[String]

  private[sources] def eval(f: Filter, r: ApiRow): Boolean = f match {
    case EqualTo("category", v)      => r.category == v
    case EqualTo("id", v)            => r.id == v
    case GreaterThan("price", v)     => r.price > v.asInstanceOf[Number].doubleValue()
    case GreaterThanOrEqual("price", v) => r.price >= v.asInstanceOf[Number].doubleValue()
    case LessThan("price", v)        => r.price < v.asInstanceOf[Number].doubleValue()
    case LessThanOrEqual("price", v) => r.price <= v.asInstanceOf[Number].doubleValue()
    case IsNotNull(_)                => true // schema is non-nullable
    case _ => throw new IllegalStateException(s"unsupported pushed: $f")
  }

  private[sources] def supported(f: Filter): Boolean = f match {
    case EqualTo("category", _) | EqualTo("id", _) | IsNotNull(_) => true
    case GreaterThan("price", _) | GreaterThanOrEqual("price", _) |
         LessThan("price", _) | LessThanOrEqual("price", _) => true
    case _ => false
  }
}

class PagedApiProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedApi.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedApiTable(properties.getOrDefault("pagesize", "200").toInt)
}

final class PagedApiTable(pageSize: Int) extends Table with SupportsRead {
  override def name(): String = s"paged_api(pageSize=$pageSize)"
  override def schema(): StructType = PagedApi.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedApiScanBuilder(
      options.getOrDefault("pagesize", pageSize.toString).toInt)
}

final class PagedApiScanBuilder(pageSize: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PagedApi.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(PagedApi.supported)
    pushed = sup
    sup.foreach(f => PagedApi.pushedFilterLog.add(f.toString))
    unsup // Spark keeps evaluating these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
    PagedApi.requestedColumnsLog.add(
      requiredSchema.fieldNames.mkString(","))
  }

  override def build(): Scan = new PagedApiScan(pageSize, pushed, required)
}

final class PagedApiScan(pageSize: Int, filters: Array[Filter],
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedApiScan pushed=[${filters.mkString(",")}] " +
      s"fields=[${required.fieldNames.mkString(",")}]"

  // the "count then page" pattern every paged API supports (ArcGIS
  // returnCountOnly, Ticketmaster page.totalElements): partition count
  // is known before any page body is fetched
  override def planInputPartitions(): Array[InputPartition] = {
    val n = PagedApi.backend.size
    val pages = math.max(1, (n + pageSize - 1) / pageSize)
    (0 until pages).map(p =>
      PagedPartition(p * pageSize,
        math.min((p + 1) * pageSize, n)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(filters, required)
}

final case class PagedPartition(start: Int, end: Int) extends InputPartition

final class PagedReaderFactory(filters: Array[Filter],
    required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[PagedPartition]
    new PartitionReader[InternalRow] {
      private val it = PagedApi.backend.slice(part.start, part.end)
        .iterator.filter(r => filters.forall(PagedApi.eval(_, r)))
      private var cur: PagedApi.ApiRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow =
        new GenericInternalRow(required.fieldNames.map {
          case "id"       => cur.id
          case "name"     => UTF8String.fromString(cur.name)
          case "category" => UTF8String.fromString(cur.category)
          case "price"    => cur.price
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
