package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._
import scala.util.Try

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The reference's CoinGecko price-history source
  * (/root/reference/updatescript.py:15-21,40,49) as a native DataSource V2
  * connector — the Spark-idiomatic form of a custom source: ingestion
  * lands the HTTP payloads as JSON-lines snapshots (no network inside the
  * engine), and this `TableProvider` turns a snapshot directory into a
  * `Table` whose scans
  *
  *   - PRUNE COLUMNS at the reader (`SupportsPushDownRequiredColumns`):
  *     `select(price)` never materializes coin/date fields, which is the
  *     difference between reading 1 column and all of them off a 100 TB
  *     landing zone;
  *   - PUSH coin equality/membership filters into the partition reader
  *     (`SupportsPushDownFilters`): a `coin = 'polkadot'` probe skips
  *     non-matching rows before they ever become InternalRows — the same
  *     contract the parquet scan gives the watermark filter;
  *   - parallelize ONE PARTITION PER FILE: a day's snapshot directory of
  *     K files scans K-wide with no driver-side parsing;
  *   - STREAM the directory (`MICRO_BATCH_READ`): each trigger admits the
  *     files that landed since the committed filename watermark.
  *
  * The flat output schema matches [[JsonFixtureSource.coingeckoHistory]]
  * (coin, price_date, price), including PERMISSIVE handling of malformed
  * lines (null fields, never a task failure); the nested
  * `market_data.current_price.usd` path and the reference's `d-M-yyyy`
  * date format are handled inside the reader. Registered as
  * `spark.read.format("graft-history")` via the `DataSourceRegister`
  * service file.
  */
class HistoryV2Source extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-history"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HistoryV2Source.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new HistoryTable(HistoryV2Source.roots(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object HistoryV2Source {
  /** Flat reader schema — what the pipeline consumes, not the raw payload. */
  val SCHEMA: StructType = StructType.fromDDL(
    "coin STRING, price_date DATE, price DOUBLE")

  /** The load() arguments as given — kept unexpanded so a STREAM over an
    * initially empty directory still knows where to look on later
    * triggers (expanding eagerly would leave it blind forever).
    */
  private[graft] def roots(properties: JMap[String, String]): Seq[String] = {
    val opts = properties.asScala
    opts.get("paths")
      .map(p => new ObjectMapper().readTree(p).elements().asScala
        .map(_.asText()).toSeq)
      .orElse(opts.get("path").map(Seq(_)))
      .getOrElse(Seq.empty)
  }

  /** Root paths → concrete sorted file list (directories expand one
    * level). Each path resolves its OWN FileSystem, so non-default
    * schemes (s3a://, hdfs://) work the way the built-in sources do.
    */
  private[graft] def expand(roots: Seq[String]): Seq[String] =
    roots.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(new Configuration())
      if (fs.getFileStatus(path).isDirectory)
        fs.listStatus(path).toSeq.filter(_.isFile).map(_.getPath.toString)
      else Seq(p)
    }.sorted
}

private[graft] class HistoryTable(roots: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft-history(${roots.mkString(",")})"
  override def schema(): StructType = HistoryV2Source.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HistoryScanBuilder(roots)
}

private[graft] class HistoryScanBuilder(roots: Seq[String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = HistoryV2Source.SCHEMA
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept coin equality/membership; everything else stays post-scan.
    * Accepted filters are FULLY applied in the reader (exact string
    * compare), so they are not returned for re-evaluation.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo("coin", _: String) => true
      case In("coin", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    pushed = ours
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val coins: Option[Set[String]] = {
      val sets = pushed.toSeq.map {
        case EqualTo("coin", v: String) => Set(v)
        case In("coin", vs) => vs.map(_.asInstanceOf[String]).toSet
        case f => sys.error(s"unreachable: $f")
      }
      if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
    }
    HistoryScan(roots, required, coins)
  }
}

private[graft] case class HistoryScan(roots: Seq[String], required: StructType,
    coins: Option[Set[String]]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-history pruned=[${required.fieldNames.mkString(",")}] " +
      s"pushedCoins=${coins.map(_.mkString("{", ",", "}")).getOrElse("*")}"

  override def planInputPartitions(): Array[InputPartition] =
    HistoryV2Source.expand(roots)
      .map(f => HistoryFilePartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    HistoryReaderFactory(required.fieldNames, coins)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new HistoryMicroBatchStream(roots, required.fieldNames, coins)
}

/** Filename-watermark offsets over an append-only snapshot directory: the
  * offset is the LARGEST (lexicographically) file path consumed, and each
  * micro-batch admits the files in (watermark, latest] — so a restarted
  * query resumes from the committed watermark without reprocessing, and a
  * file landing with an out-of-order (smaller) name is skipped rather
  * than silently shifting already-committed batches, which is what a
  * positional (count-based) offset would do. Exactly-once therefore
  * requires monotonically named snapshot files (landing-timestamp names —
  * standard landing-zone practice); the connector's pruning and coin
  * pushdown still apply inside each batch's readers.
  */
private[graft] class HistoryMicroBatchStream(roots: Seq[String],
    fields: Array[String], coins: Option[Set[String]])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def watermarkOf(files: Seq[String]): FileWatermarkOffset =
    FileWatermarkOffset(if (files.isEmpty) "" else files.max)

  @volatile private var availableNowCap: Option[FileWatermarkOffset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(watermarkOf(HistoryV2Source.expand(roots)))

  override def initialOffset(): Offset = FileWatermarkOffset("")

  override def latestOffset(): Offset =
    availableNowCap.getOrElse(watermarkOf(HistoryV2Source.expand(roots)))

  // SupportsAdmissionControl variant (via SupportsTriggerAvailableNow):
  // no rate limiting — every landed file is admitted each trigger
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    latestOffset()

  override def deserializeOffset(json: String): Offset =
    FileWatermarkOffset(new ObjectMapper().readTree(json).get("w").asText())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[FileWatermarkOffset].w
    val to = end.asInstanceOf[FileWatermarkOffset].w
    HistoryV2Source.expand(roots)
      .filter(f => f > from && f <= to)
      .map(f => HistoryFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    HistoryReaderFactory(fields, coins)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[graft] case class FileWatermarkOffset(w: String) extends Offset {
  override def json(): String = {
    val mapper = new ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("w", w)
    mapper.writeValueAsString(node)
  }
}

private[graft] case class HistoryFilePartition(file: String) extends InputPartition

private[graft] case class HistoryReaderFactory(fields: Array[String],
    coins: Option[Set[String]]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new HistoryPartitionReader(
      partition.asInstanceOf[HistoryFilePartition].file, fields, coins)
}

/** Per-partition JSON-lines reader: one Jackson mapper and one open stream
  * per partition (the once-per-partition pattern the multimodal decoder
  * uses), rows filtered and projected BEFORE InternalRow construction.
  * PERMISSIVE like the declared-schema json reader: a malformed line or
  * an unparseable field yields nulls, never a task failure — dirty data
  * is quarantined downstream, not allowed to kill a 100 TB scan.
  */
private[graft] class HistoryPartitionReader(file: String, fields: Array[String],
    coins: Option[Set[String]]) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val dateFmt = java.time.format.DateTimeFormatter.ofPattern("d-M-yyyy")
  private val reader: java.io.BufferedReader = {
    val path = new Path(file)
    val fs = path.getFileSystem(new Configuration())
    new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(path), "UTF-8"))
  }
  private val lines: java.util.Iterator[String] = reader.lines().iterator()
  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null && lines.hasNext) {
      val line = lines.next().trim
      if (line.nonEmpty) {
        val node = Try(mapper.readTree(line)).getOrElse(null)
        val coin =
          if (node == null) null
          else Option(node.get("id")).map(_.asText()).orNull
        if (coins.forall(cs => coin != null && cs.contains(coin))) {
          current = project(node, coin)
        }
      }
    }
    current != null
  }

  private def field(node: JsonNode, path: String*): Option[JsonNode] =
    path.foldLeft(Option(node)) { (n, k) => n.flatMap(x => Option(x.get(k))) }

  private def project(node: JsonNode, coin: String): InternalRow = {
    val row = new GenericInternalRow(fields.length)
    fields.indices.foreach { i =>
      fields(i) match {
        case "coin" =>
          row.update(i, if (coin == null) null else UTF8String.fromString(coin))
        case "price_date" =>
          val d = field(node, "date").map(_.asText()).flatMap { s =>
            Try(java.lang.Integer.valueOf(
              java.time.LocalDate.parse(s, dateFmt).toEpochDay.toInt)).toOption
          }.orNull
          row.update(i, d)
        case "price" =>
          val p = field(node, "market_data", "current_price", "usd")
            .filter(_.isNumber).map(n => java.lang.Double.valueOf(n.asDouble()))
            .orNull
          row.update(i, p)
        case other => sys.error(s"unknown column $other")
      }
    }
    row
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
