package graft.sources.rest

import java.util.{Map => JMap}
import scala.collection.JavaConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Paginated-REST DataSourceV2 — the one custom Catalyst-adjacent
  * component (SURVEY §7.3): it reproduces the reference's serial page
  * loop semantics (getDataSerially, reference src/index.ts:171-308)
  * inside a DSv2 `PartitionReader`, with the engine-side behaviors:
  *
  *  - offset and cursor pagination protocols (src/index.ts:226-231);
  *    stop on total-limit, short page (offset mode) or missing cursor
  *    (src/index.ts:273-282)
  *  - bounded retry with interval (fetchData, src/index.ts:36-90)
  *  - wall-clock timeout that KEEPS partial data (src/index.ts:256-262)
  *  - rate limiting via minimum inter-request interval
  *    (src/index.ts:234-243)
  *  - page-size clamp maxItemsPerPage (src/index.ts:145-161)
  *
  * Pushdown: required-column pruning (the adapters' client-side
  * re-projection, P2) and limit pushdown (stops the page loop early).
  * A cursor chain is inherently serial, so the scan is ONE
  * InputPartition; at 100 TB this source is an ingest edge — land to
  * parquet once, then everything downstream is partitioned columnar.
  *
  * Wire protocol (JSON): `GET url?limit=N&offset=M` →
  * `{"data": [{...}, ...], "nextOffset": "tok"?}` — nextOffset only in
  * cursor mode.
  *
  * Options: url, schema (DDL, required), pageType=offset|cursor,
  * itemsPerPage, maxItemsPerPage, totalLimit, maxRetries,
  * retryIntervalMs, requestsPerSecond, timeoutMs.
  */
class RestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType.fromDDL(Option(options.get("schema"))
      .getOrElse(throw new IllegalArgumentException("graft-rest requires a 'schema' DDL option")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new RestTable(schema, properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = true
}

final class RestTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-rest:${props.getOrElse("url", "?")}"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(schema, props ++ options.asScala)
}

final class RestScanBuilder(fullSchema: StructType, opts: Map[String, String])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var prunedSchema: StructType = fullSchema
  private var pushedLimit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit =
    prunedSchema = requiredSchema

  override def pushLimit(limit: Int): Boolean = { pushedLimit = limit; true }

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = prunedSchema
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      Array(RestPartition(opts, prunedSchema.toDDL, pushedLimit)) // serial page chain ⇒ 1 partition
    override def createReaderFactory(): PartitionReaderFactory =
      new PartitionReaderFactory {
        override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
          val rp = p.asInstanceOf[RestPartition]
          val schema = if (rp.schemaDdl.trim.isEmpty) new StructType() // count(): all columns pruned
            else StructType.fromDDL(rp.schemaDdl)
          new RestPartitionReader(rp.opts, schema, rp.limit)
        }
      }
  }
}

final case class RestPartition(opts: Map[String, String], schemaDdl: String, limit: Int)
    extends InputPartition

/** The serial page loop, executor-side. */
final class RestPartitionReader(opts: Map[String, String], schema: StructType, pushedLimit: Int)
    extends PartitionReader[InternalRow] {

  private val url = opts("url")
  private val pageType = opts.getOrElse("pagetype", "offset")
  private val maxItemsPerPage = opts.getOrElse("maxitemsperpage", "1000").toInt
  // endpoint clamp negotiation (reference src/index.ts:145-161)
  private val itemsPerPage = math.min(opts.getOrElse("itemsperpage", "100").toInt, maxItemsPerPage)
  private val totalLimit0 = opts.getOrElse("totallimit", "1000000").toLong // DEFAULT_CONFIG, src/index.ts:31-34
  private val totalLimit = if (pushedLimit >= 0) math.min(pushedLimit.toLong, totalLimit0) else totalLimit0
  private val maxRetries = opts.getOrElse("maxretries", "0").toInt
  private val retryIntervalMs = opts.getOrElse("retryintervalms", "1000").toLong
  private val timeoutMs = opts.getOrElse("timeoutms", "30000").toLong // src/index.ts:33
  private val minIntervalMs = opts.get("requestspersecond").map(r => (1000.0 / r.toDouble).toLong).getOrElse(0L)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val startedAt = System.currentTimeMillis()
  private var lastRequestAt = 0L
  private var offset = 0L
  private var cursor: String = null
  private var exhausted = false
  private var emitted = 0L
  private var page: Iterator[com.fasterxml.jackson.databind.JsonNode] = Iterator.empty
  private var current: InternalRow = _

  private def fetchPage(): Unit = {
    // wall-clock budget: keep partial data (src/index.ts:256-262)
    if (System.currentTimeMillis() - startedAt > timeoutMs) { exhausted = true; return }
    // rate limit (src/index.ts:234-243)
    if (minIntervalMs > 0) {
      val wait = lastRequestAt + minIntervalMs - System.currentTimeMillis()
      if (wait > 0) Thread.sleep(wait)
    }
    // cursor mode: the FIRST request carries no offset (the server
    // defines the chain start); offset mode sends the page arithmetic
    val pageUrl =
      if (pageType == "cursor")
        if (cursor == null) s"$url?limit=$itemsPerPage"
        else s"$url?limit=$itemsPerPage&offset=$cursor"
      else s"$url?limit=$itemsPerPage&offset=$offset"

    // bounded retry (fetchData, src/index.ts:36-90)
    var attempt = 0
    var body: String = null
    while (body == null) {
      lastRequestAt = System.currentTimeMillis()
      try {
        val conn = new java.net.URL(pageUrl).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(10000)
        if (conn.getResponseCode >= 400)
          throw new java.io.IOException(s"HTTP ${conn.getResponseCode}")
        body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      } catch {
        case e: Exception if attempt < maxRetries =>
          attempt += 1
          Thread.sleep(retryIntervalMs)
        case e: Exception => throw e
      }
    }

    val root = mapper.readTree(body)
    val data = root.get("data")
    val n = if (data == null) 0 else data.size()
    page = if (n == 0) Iterator.empty else data.elements().asScala
    if (pageType == "cursor") {
      val next = root.get("nextOffset")
      cursor = if (next == null || next.isNull) null else next.asText()
      if (cursor == null) exhausted = true // missing cursor stops (src/index.ts:273-282)
    } else {
      offset += itemsPerPage
      if (n < itemsPerPage) exhausted = true // short page stops
    }
    if (n == 0) exhausted = true
  }

  override def next(): Boolean = {
    if (emitted >= totalLimit) return false // global cap (src/index.ts:284-286)
    while (!page.hasNext && !exhausted) fetchPage()
    if (!page.hasNext) return false
    val node = page.next()
    val values: Array[Any] = schema.fields.map { f =>
      val v = node.get(f.name)
      if (v == null || v.isNull) null
      else f.dataType match {
        case LongType    => v.asLong()
        case IntegerType => v.asInt()
        case DoubleType  => v.asDouble()
        case BooleanType => v.asBoolean()
        case _           => UTF8String.fromString(v.asText())
      }
    }
    current = new GenericInternalRow(values)
    emitted += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
