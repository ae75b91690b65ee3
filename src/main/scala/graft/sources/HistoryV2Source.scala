package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

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
  *     K files scans K-wide with no driver-side parsing.
  *
  * The flat output schema matches [[JsonFixtureSource.coingeckoHistory]]
  * (coin, price_date, price); the nested `market_data.current_price.usd`
  * path and the reference's `d-M-yyyy` date format are handled inside the
  * reader. Registered as `spark.read.format("graft-history")` via the
  * `DataSourceRegister` service file.
  */
class HistoryV2Source extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-history"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HistoryV2Source.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new HistoryTable(HistoryV2Source.paths(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object HistoryV2Source {
  /** Flat reader schema — what the pipeline consumes, not the raw payload. */
  val SCHEMA: StructType = StructType.fromDDL(
    "coin STRING, price_date DATE, price DOUBLE")

  /** Option map → concrete file list (directories expand one level). */
  private[graft] def paths(properties: JMap[String, String]): Seq[String] = {
    val opts = properties.asScala
    val raw = opts.get("paths")
      .map(p => new ObjectMapper().readTree(p).elements().asScala
        .map(_.asText()).toSeq)
      .orElse(opts.get("path").map(Seq(_)))
      .getOrElse(Seq.empty)
    val fs = org.apache.hadoop.fs.FileSystem.get(new Configuration())
    raw.flatMap { p =>
      val path = new Path(p)
      if (fs.getFileStatus(path).isDirectory)
        fs.listStatus(path).toSeq.filter(_.isFile).map(_.getPath.toString)
      else Seq(p)
    }
  }
}

private[graft] class HistoryTable(files: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft-history(${files.mkString(",")})"
  override def schema(): StructType = HistoryV2Source.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HistoryScanBuilder(files)
}

/** Builder state: the table's option-time file list is re-resolved per
  * stream trigger via the parent directories, so a snapshot directory
  * gains streaming semantics — each newly landed file becomes part of the
  * next micro-batch.
  */
private[graft] class HistoryScanBuilder(files: Seq[String]) extends ScanBuilder
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
    HistoryScan(files, required, coins)
  }
}

private[graft] case class HistoryScan(files: Seq[String], required: StructType,
    coins: Option[Set[String]]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-history pruned=[${required.fieldNames.mkString(",")}] " +
      s"pushedCoins=${coins.map(_.mkString("{", ",", "}")).getOrElse("*")}"

  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => HistoryFilePartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    HistoryReaderFactory(required.fieldNames, coins)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new HistoryMicroBatchStream(files, required.fieldNames, coins)
}

/** File-position offsets over an append-only snapshot directory: the
  * offset is "how many files (in lexicographic path order) have been
  * consumed", so each micro-batch is exactly the files that landed since
  * the last committed batch — the same contract as Spark's own FileStream
  * source, with the connector's pruning and coin pushdown still applied
  * inside each batch's readers. Exactly-once riding on the offset log:
  * a restarted query replans from the committed file position. Files must
  * be append-only (snapshots are); rewrites are a new path.
  */
private[graft] class HistoryMicroBatchStream(initialFiles: Seq[String],
    fields: Array[String], coins: Option[Set[String]])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // the directories (and any explicit files) this table was created over;
  // re-listing them per trigger is what turns the snapshot dir into a stream
  private val dirs: Seq[Path] =
    initialFiles.map(f => new Path(f).getParent).distinct

  private def listFiles(): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new Configuration())
    dirs.flatMap { d =>
      fs.listStatus(d).toSeq.filter(_.isFile).map(_.getPath.toString)
    }.sorted
  }

  @volatile private var availableNowCap: Option[FilePosOffset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(FilePosOffset(listFiles().length))

  override def initialOffset(): Offset = FilePosOffset(0)

  override def latestOffset(): Offset =
    availableNowCap.getOrElse(FilePosOffset(listFiles().length))

  // SupportsAdmissionControl variant (via SupportsTriggerAvailableNow):
  // no rate limiting — every landed file is admitted each trigger
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    latestOffset()

  override def deserializeOffset(json: String): Offset =
    FilePosOffset(new ObjectMapper().readTree(json).get("n").asInt())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[FilePosOffset].n
    val to = end.asInstanceOf[FilePosOffset].n
    listFiles().slice(from, to)
      .map(f => HistoryFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    HistoryReaderFactory(fields, coins)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[graft] case class FilePosOffset(n: Int) extends Offset {
  override def json(): String = s"""{"n":$n}"""
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
  */
private[graft] class HistoryPartitionReader(file: String, fields: Array[String],
    coins: Option[Set[String]]) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val dateFmt = java.time.format.DateTimeFormatter.ofPattern("d-M-yyyy")
  private val lines: java.util.Iterator[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new Configuration())
    val in = fs.open(new Path(file))
    new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
      .lines().iterator()
  }
  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null && lines.hasNext) {
      val line = lines.next().trim
      if (line.nonEmpty) {
        val node = mapper.readTree(line)
        val coin = Option(node.get("id")).map(_.asText()).orNull
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
          val d = field(node, "date").map(_.asText()).map { s =>
            java.lang.Integer.valueOf(
              java.time.LocalDate.parse(s, dateFmt).toEpochDay.toInt)
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
  override def close(): Unit = ()
}
