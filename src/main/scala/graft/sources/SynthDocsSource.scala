package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `source_custom` — a complete DataSource V2 connector (SURVEY.md §2.A:
  * the extension surface a Spark-native lake library must speak to add
  * its own stores): `spark.read.format("graft-synth")` generates a
  * deterministic synthetic document corpus executor-side.
  *
  * The full V2 read stack is implemented, not stubbed:
  *   - `TableProvider`/`DataSourceRegister` (short name registration),
  *   - `SupportsPushDownRequiredColumns` — column pruning reaches the
  *     generator, so unselected columns are never materialized,
  *   - `SupportsPushDownFilters` on doc_id bounds — range filters CLIP
  *     the per-partition id ranges at planning time, so a
  *     `doc_id < k` query plans fewer/smaller input partitions
  *     (partition pruning, spec-asserted),
  *   - deterministic per-row generation (pure function of doc_id) —
  *     retried tasks reproduce identical rows, and the DuckDB oracle
  *     can regenerate the same corpus from `range()` (hash-matched).
  *
  * The same five classes are what a real connector to an asset store or
  * feature service implements; only `read(id)` changes. Options:
  * `rows` (default 1000), `partitions` (default 8).
  */
class SynthDocsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt)
}

object SynthDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val langs = Array("en", "de", "es", "fr")

  /** Pure deterministic row content for id `i` (the "store read"). */
  def lang(i: Long): String = langs((i % 4).toInt)
  def source(i: Long): String = s"synth${i % 3}"
  def text(i: Long): String =
    s"synthetic document $i body token${i % 7} token${i % 11} end"
}

class SynthDocsTable(rows: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-synth($rows)"
  override def schema(): StructType = SynthDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthDocsScanBuilder(rows, partitions)
}

class SynthDocsScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SynthDocs.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("doc_id", _: Long) => true
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case EqualTo("doc_id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("doc_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = accepted
    // accepted bounds are fully applied by range clipping — Spark need
    // not re-evaluate them (returning them anyway is allowed but would
    // add a redundant Filter node); everything else stays post-scan
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SynthDocsScan(lo, hi, rows, partitions, required)
}

case class SynthDocsRange(lo: Long, hi: Long) extends InputPartition

class SynthDocsScan(lo: Long, hi: Long, rows: Long, partitions: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** The slice width comes from the UNFILTERED table (rows/partitions),
    * and only slices intersecting the filter-clipped [lo, hi) are
    * planned — so a doc_id range predicate prunes whole input
    * partitions, exactly like partition pruning on a keyed layout.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) Array.empty
    else {
      val per = math.max(1L, (rows + partitions - 1) / partitions)
      val first = lo / per * per // slice-aligned start
      (first until hi by per)
        .map(s => SynthDocsRange(math.max(s, lo), math.min(s + per, hi)))
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthDocsReaderFactory(required.fieldNames)
}

class SynthDocsReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SynthDocsRange]
    new PartitionReader[InternalRow] {
      private var i = r.lo - 1
      override def next(): Boolean = { i += 1; i < r.hi }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "doc_id" => i
          case "lang" => UTF8String.fromString(SynthDocs.lang(i))
          case "source" => UTF8String.fromString(SynthDocs.source(i))
          case "text" => UTF8String.fromString(SynthDocs.text(i))
        })
      override def close(): Unit = ()
    }
  }
}
