package graft.sources.v2

import graft.sources.RawBar
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.time.Instant
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** Executor-side window fetch: one call per InputPartition, running ON the
  * executor. Implementations must have a public no-arg constructor — the
  * class NAME travels in the serialized reader factory and is instantiated
  * per partition (the per-partition codec/HTTP-client init seam).
  */
trait WindowFetcher extends Serializable {
  def fetch(symbol: String, fromMs: Long, toMs: Long): Iterator[RawBar]
}

/** DataSourceV2 form of the connector scale path (SURVEY §2.1 S6/S7: "at
  * scale the per-(symbol, window) fetch plan becomes the input-partition
  * list of a DataSourceV2"). The single-node connectors ([[graft.sources.BinanceSource]],
  * [[graft.sources.IbkrSource]]) fetch on the driver and `createDataFrame`;
  * this source plans one InputPartition per (symbol, window-chunk) so a
  * cluster fetches hundreds of symbol-windows concurrently, each partition
  * re-using one fetcher instance (connection/pacing state lives per
  * executor task, like the reference's per-worker IB session).
  *
  * Options:
  *  - `symbols`   comma-separated logical symbols (required)
  *  - `from`,`to` ISO-8601 instants, half-open [from, to) (required)
  *  - `windowHours` chunk size per partition (default 8 — the reference's
  *    3×8h day chunking, ingest_cli.py:17)
  *  - `fetcher`   FQCN of the [[WindowFetcher]] (required; injected I/O —
  *    this sandbox has no egress, tests use a deterministic fake)
  *  - `source`    value for the source column (default "v2")
  *
  * Emits bar-START stamps exactly as fetched; bar-end shift and canonical
  * schema enforcement stay downstream (normalize.py semantics), same as the
  * single-node connectors.
  */
class CandleFetchSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CandleFetchSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new CandleFetchTable()
}

object CandleFetchSource {
  val schema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", DoubleType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("source", StringType, nullable = false)))
}

private[v2] class CandleFetchTable extends Table with SupportsRead {
  override def name(): String = "graft-candle-fetch"
  override def schema(): StructType = CandleFetchSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CandleScan(options)
}

private[v2] class CandleScan(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {

  private def required(k: String): String = {
    val v = options.get(k)
    require(v != null && v.nonEmpty, s"CandleFetchSource: missing option '$k'")
    v
  }

  override def build(): Scan = this
  override def readSchema(): StructType = CandleFetchSource.schema
  override def toBatch: Batch = this
  override def description(): String = "graft candle window-fetch scan"

  override def planInputPartitions(): Array[InputPartition] = {
    val symbols = required("symbols").split(",").map(_.trim).filter(_.nonEmpty)
    val fromMs = Instant.parse(required("from")).toEpochMilli
    val toMs = Instant.parse(required("to")).toEpochMilli
    require(fromMs < toMs, "CandleFetchSource: from must precede to")
    val windowMs = options.getLong("windowHours", 8L) * 3600000L
    require(windowMs > 0, s"CandleFetchSource: windowHours must be positive")
    for {
      symbol <- symbols
      start <- fromMs until toMs by windowMs
    } yield CandleFetchPartition(symbol, start, math.min(start + windowMs, toMs))
      : InputPartition
  }

  override def createReaderFactory(): PartitionReaderFactory =
    CandleReaderFactory(required("fetcher"), options.getOrDefault("source", "v2"))
}

/** One (symbol, window) unit of fetch work. */
case class CandleFetchPartition(symbol: String, fromMs: Long, toMs: Long)
  extends InputPartition

case class CandleReaderFactory(fetcherClass: String, source: String)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CandleFetchPartition]
    new PartitionReader[InternalRow] {
      // per-partition init seam: one fetcher (connection, pacing state) per task
      private val fetcher = Class.forName(fetcherClass)
        .getDeclaredConstructor().newInstance().asInstanceOf[WindowFetcher]
      // half-open clip ENFORCED here, never trusted to the fetcher:
      // BinanceSource.fetch clips deliberately because the reference pager
      // is inclusive-end (client.py:133 keeps ts <= end) — a fetcher with
      // that behavior would otherwise emit every window-boundary bar into
      // BOTH adjacent partitions, double-counting (symbol, ts) rows at
      // each internal boundary of the scan
      private val it = fetcher.fetch(p.symbol, p.fromMs, p.toMs)
        .filter(b => b.openTimeMs >= p.fromMs && b.openTimeMs < p.toMs)
      private var current: RawBar = _

      override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }

      override def get(): InternalRow = InternalRow(
        current.openTimeMs * 1000L, // epoch micros
        current.open, current.high, current.low, current.close, current.volume,
        UTF8String.fromString(p.symbol), UTF8String.fromString(source))

      override def close(): Unit = ()
    }
  }
}
