package graft.sources.v2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: a deterministic synthetic-document generator —
  * `spark.read.format("graft-docs").option("rows", N).option("numPartitions", P)`
  * yields `(doc_id, lang, text)` with no files behind it, so pipeline
  * operators can be exercised at ANY scale factor without staging
  * data. The full v2 read surface is implemented, not stubbed:
  *
  *  - **filter pushdown** ([[SupportsPushDownFilters]]): range/equality
  *    predicates on `doc_id` narrow the generated id interval BEFORE
  *    partition planning, so a selective filter plans fewer input
  *    partitions (the generator's analog of parquet row-group pruning);
  *    handled filters are consumed (no residual re-evaluation), all
  *    others stay with Spark.
  *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *    reader materializes only requested fields — a `doc_id`-only scan
  *    never pays text generation.
  *
  * Rows are pure functions of `doc_id` (splitmix-style bit mixing), so
  * any two scans — any cluster, any partitioning — agree bit-for-bit,
  * which is what makes the source usable in correctness harnesses.
  */
class DocGenSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = DocGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = properties.asScala
    val rows = opts.getOrElse("rows", "1000").toLong
    val numPartitions = opts.getOrElse("numpartitions",
      opts.getOrElse("numPartitions", "8")).toInt
    // fail at table resolution, not at partition planning: numPartitions=0
    // would otherwise surface as a divide-by-zero deep in planInputPartitions
    // and negative rows as a silently-empty scan
    require(rows >= 0, s"graft-docs: rows must be >= 0, got $rows")
    require(numPartitions >= 1,
      s"graft-docs: numPartitions must be >= 1, got $numPartitions")
    new DocGenTable(rows, numPartitions)
  }
}

object DocGen {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val langs = graft.functions.TextFns.stopwords.map(_._1)
  private val vocab: Map[String, IndexedSeq[String]] =
    graft.functions.TextFns.stopwords.map { case (lg, stops) =>
      lg -> (stops ++ (0 until 40).map(k => s"w${lg}$k")).toIndexedSeq
    }.toMap

  /** splitmix64 finalizer — deterministic, well-mixed per (doc, pos). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def langOf(docId: Long): String =
    langs((((mix(docId) >>> 1) % langs.size)).toInt)

  def textOf(docId: Long): String = {
    val lg = langOf(docId)
    val words = vocab(lg)
    // >>> 1, never .abs: Long.MinValue.abs is negative and would index
    // out of bounds (and break the >=20-words invariant)
    val n = 20 + ((mix(docId * 31 + 7) >>> 1) % 30).toInt
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(words(((mix(docId * 1315423911L + i) >>> 1) % words.size).toInt))
      i += 1
    }
    sb.toString
  }
}

private[v2] class DocGenTable(rows: Long, numPartitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-docs($rows)"
  override def schema(): StructType = DocGen.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(rows, numPartitions)
}

private[v2] class DocGenScanBuilder(rows: Long, numPartitions: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required: StructType = DocGen.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition {
      case EqualTo("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case IsNotNull("doc_id") => true // non-nullable: vacuously handled
      case _ => false
    }
    // saturating +1: `doc_id = Long.MaxValue` / `> MaxValue` must clamp,
    // not overflow to Long.MinValue (which would silently widen the range)
    def incSat(x: Long): Long = if (x == Long.MaxValue) x else x + 1
    handled.foreach {
      case EqualTo(_, v) =>
        val x = v.toString.toLong; lo = math.max(lo, x); hi = math.min(hi, incSat(x))
      case GreaterThan(_, v) => lo = math.max(lo, incSat(v.toString.toLong))
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, v.toString.toLong)
      case LessThan(_, v) => hi = math.min(hi, v.toString.toLong)
      case LessThanOrEqual(_, v) => hi = math.min(hi, incSat(v.toString.toLong))
      case _ => ()
    }
    pushed = handled
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new DocGenScan(rows, lo, hi, numPartitions, required)
}

private[v2] case class DocGenRange(start: Long, end: Long) extends InputPartition

private[v2] class DocGenScan(rows: Long, lo: Long, hi: Long, numPartitions: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftDocGen range=[$lo,$hi) cols=[${required.fieldNames.mkString(",")}]"
  /** Chunks are aligned to the FULL-range grid (rows/numPartitions per
    * chunk) and only chunks intersecting the pushed-down [lo,hi) are
    * planned — the generator's analog of parquet row-group pruning: a
    * selective predicate plans fewer partitions, not the same number
    * of thinner ones. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array(DocGenRange(0, 0)) // empty scan, one no-op reader
    val per = math.max(1L, (rows + numPartitions - 1) / numPartitions)
    val first = lo / per
    val last = (hi - 1) / per
    (first to last).map { c =>
      DocGenRange(math.max(lo, c * per), math.min(hi, (c + 1) * per))
    }.toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required)
}

private[v2] class DocGenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[DocGenRange]
    new PartitionReader[InternalRow] {
      private var id = range.start - 1
      private val fields = required.fieldNames
      override def next(): Boolean = { id += 1; id < range.end }
      override def get(): InternalRow = {
        val vals = fields.map {
          case "doc_id" => java.lang.Long.valueOf(id)
          case "lang" => UTF8String.fromString(DocGen.langOf(id))
          case "text" => UTF8String.fromString(DocGen.textOf(id))
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}
