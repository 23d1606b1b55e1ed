package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 packaging of the WARC loader —
  * `spark.read.format("warc").option("crawl_id", id).load(glob)` — the
  * idiomatic shape SURVEY.md §2 S2 names for the reference's
  * CommonCrawl loader (loaders/commoncrawl_loader.py:66-145): one input
  * partition per WARC file (a .warc.gz member is not splittable — the
  * reference shards at file granularity too), record parse + HTML
  * extraction inside the reader, so `spark.read` IS the extract
  * pipeline and Catalyst sees an ordinary table.
  *
  * Column pruning is pushed into the reader, which then emits only the
  * required fields per row. The extractor itself always runs — row
  * MEMBERSHIP depends on it (non-HTML responses, short pages, and
  * extraction failures are dropped), and a scan whose row count changed
  * with the projection would be a correctness bug, not an
  * optimization. Filters stay Spark-side (row-level predicates don't
  * prune WARC bytes; file-level pruning is the path glob).
  *
  * Scale shape: files enumerate on the driver (names only); each task
  * streams ONE file's bytes through the record iterator — no file list
  * broadcast, no whole-corpus state anywhere.
  */
final class WarcDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(new CaseInsensitiveStringMap(properties))
}

object WarcDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("crawl_id", StringType, nullable = false),
    StructField("warc_path", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("warc_date", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("text_length", LongType, nullable = false)))

  /** Expand path globs into concrete `(path, length)` pairs (each
    * entry is ONE glob — commas/braces inside a Hadoop glob are
    * preserved; lengths ride along from the listing's FileStatus, so
    * statistics never need per-file RPCs).
    */
  private[sources] def listFiles(paths: Seq[String],
      hadoopConf: org.apache.hadoop.conf.Configuration): Seq[(String, Long)] =
    paths.map(_.trim).filter(_.nonEmpty).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(hadoopConf)
      val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      matched.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }.map(st => (st.getPath.toString, st.getLen))
    }.sortBy(_._1)
}

private final class WarcTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"warc(${options.get("paths")})"
  override def schema(): StructType = WarcDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // merge table properties (carry the load() paths) over scan options
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
    new WarcScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private final class WarcScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownLimit {
  private var required: StructType = WarcDataSource.Schema
  private var limit: Option[Int] = None
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  // per-partition limit (the DSv2 contract — Spark still applies the
  // global LIMIT): a `.limit(n)` / max_samples read stops parsing each
  // warc file after n extracted rows instead of draining it
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed: Boolean = true
  override def build(): Scan = new WarcScan(options, required, limit)
}

private final class WarcScan(options: CaseInsensitiveStringMap, required: StructType,
    limit: Option[Int]) extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"warc required=[${required.fieldNames.mkString(",")}]" +
      limit.map(n => s" PushedLimit=$n").getOrElse("")

  /** Size estimate for the optimizer (join-side selection): the summed
    * archive bytes from the one shared listing — conservative
    * (extracted text is smaller) but enough to keep a warc scan off
    * the broadcast side of a join.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private lazy val bytes = java.util.OptionalLong.of(
      partitions.map(_.asInstanceOf[WarcInputPartition].length).sum)
    override def sizeInBytes(): java.util.OptionalLong = bytes
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  // listed ONCE per scan: Spark's planInputPartitions call and the
  // statistics estimate share this (a 10k-file S3 glob is expensive)
  private lazy val partitions: Array[InputPartition] = {
    val raw = Option(options.get("paths"))
      .orElse(Option(options.get("path")))
      .getOrElse(throw new IllegalArgumentException(
        "warc source needs a path: spark.read.format(\"warc\").load(glob)"))
    // load(...) serializes its varargs as a JSON array into "paths" —
    // parse it as JSON (NOT comma-split: Hadoop brace-globs like
    // {CC-2024-01,CC-2024-02} legitimately contain commas)
    val globs: Seq[String] =
      if (raw.startsWith("[")) {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = mapper.readTree(raw)
        (0 until node.size()).map(node.get(_).asText())
      } else Seq(raw)
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    WarcDataSource.listFiles(globs, conf)
      .map { case (f, len) => WarcInputPartition(f, len): InputPartition }.toArray
  }

  override def planInputPartitions(): Array[InputPartition] = partitions

  override def createReaderFactory(): PartitionReaderFactory = {
    val crawlId = Option(options.get("crawl_id")).getOrElse("")
    val fields = required.fieldNames.toSeq
    WarcReaderFactory(crawlId, fields, limit)
  }
}

private final case class WarcInputPartition(file: String, length: Long)
    extends InputPartition

private final case class WarcReaderFactory(crawlId: String, fields: Seq[String],
    limit: Option[Int]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val wp = partition.asInstanceOf[WarcInputPartition]
    new WarcPartitionReader(wp.file, wp.length, crawlId, fields, limit)
  }
}

/** Streams one WARC file: gunzip-if-needed, record iterate, HTML
  * extract, emitting only the pruned fields. (Executor-side Hadoop
  * conf is the default one — sufficient for file:/hdfs defaults; a
  * deployment with custom FS credentials would thread a
  * SerializableConfiguration through the factory.)
  */
private final class WarcPartitionReader(
    file: String, fileLength: Long, crawlId: String, fields: Seq[String],
    limit: Option[Int])
    extends PartitionReader[InternalRow] {

  private var emitted = 0

  private val docs: Iterator[Warc.WarcDoc] = {
    val path = new Path(file)
    val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val len = fileLength
    // the record framer works over one in-memory byte array (like
    // Spark's own binaryFile source, capped at Int.MaxValue): a >2 GiB
    // member must fail LOUDLY — an Int cast would allocate a negative
    // or truncated buffer and silently mis-parse
    require(len <= Int.MaxValue - 16,
      s"warc file $file is $len bytes — beyond the 2 GiB single-buffer " +
        "limit; split the archive (CommonCrawl ships ~1 GiB members)")
    val in = fs.open(path)
    val bytes = try {
      val buf = new Array[Byte](len.toInt)
      in.readFully(0, buf)
      buf
    } finally in.close()
    Warc.extractDocs(crawlId, file, bytes)
  }

  private var current: Warc.WarcDoc = _

  override def next(): Boolean =
    if (limit.exists(emitted >= _)) false
    else if (docs.hasNext) { current = docs.next(); emitted += 1; true }
    else false

  override def get(): InternalRow = {
    val vals = fields.map {
      case "crawl_id" => UTF8String.fromString(current.crawl_id)
      case "warc_path" => UTF8String.fromString(current.warc_path)
      case "url" => UTF8String.fromString(current.url)
      case "warc_date" => UTF8String.fromString(current.warc_date)
      case "title" => UTF8String.fromString(current.title)
      case "text" => UTF8String.fromString(current.text)
      case "text_length" => current.text_length
      case other => throw new IllegalStateException(s"unknown column $other")
    }
    InternalRow.fromSeq(vals)
  }

  override def close(): Unit = ()
}
