package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Count, Max, Min, Sum}
import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.expressions.{Expressions, Literal}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 batch source: a deterministic synthetic `documents`
  * generator (`spark.read.format("graft-docs").option("rows", n)
  * .option("partitions", p)`), shaped like the fixture table
  * (doc_id, text, lang, source, n_chars).
  *
  * Purpose: the engine's source surface beyond file formats — the DSv2
  * contract a warehouse/table connector implements. Scale properties the
  * implementation demonstrates:
  *  - **Partition planning**: `rows` split into `partitions` contiguous
  *    id ranges, one `InputPartition` each — parallelism is declared at
  *    planning time, rows are generated executor-side, nothing
  *    materializes on the driver.
  *  - **Column pruning pushdown** (`SupportsPushDownRequiredColumns`):
  *    the reader generates ONLY the projected columns — `select(doc_id)`
  *    never synthesizes text (asserted on the scan output in SourceSpec).
  *  - **Filter pushdown** (`SupportsPushDownFilters`): doc_id range
  *    predicates narrow the id span at PLANNING time (whole input
  *    partitions outside the range are never created — the connector
  *    analogue of partition pruning), and `lang = v` is evaluated
  *    reader-side before any other column is synthesized. Accepted
  *    filters are removed from the query plan; everything else stays a
  *    residual Spark re-applies.
  *  - **Aggregate pushdown** (`SupportsPushDownAggregates`, COMPLETE
  *    mode): ungrouped COUNT(*) / MIN(doc_id) / MAX(doc_id) over the
  *    (range-pruned) id span are answered at PLANNING time from the
  *    span bounds — the scan emits ONE pre-aggregated row and generates
  *    zero data rows, the connector analogue of answering count/min/max
  *    from catalog statistics or parquet footers. Declined (ordinary
  *    scan + Spark-side aggregation) whenever a reader-side filter,
  *    grouping, or any other aggregate is involved.
  *  - **Limit / top-N pushdown** (`SupportsPushDownLimit` /
  *    `SupportsPushDownTopN`): LIMIT n clamps the generated span to its
  *    first n ids at planning time (exact, Spark's GlobalLimit may
  *    drop); ORDER BY doc_id [DESC] LIMIT n narrows the span to the only
  *    n ids that can appear in the answer (partial — Spark keeps the
  *    final sort+limit). Both decline under a reader-side lang filter.
  *  - **Runtime filtering** (`SupportsRuntimeV2Filtering`): a join whose
  *    selective broadcast build side completes first plans a
  *    dynamic-pruning IN filter on doc_id against this scan; the scan
  *    narrows its span to the IN set's [min, max+1) envelope BEFORE
  *    input partitions are planned — the connector analogue of dynamic
  *    partition pruning. Under-application is safe by contract (runtime
  *    filters are semi-join reductions; the join re-filters), so only
  *    exact IN/= predicates narrow and everything else is ignored.
  *  - **Determinism**: every cell is a pure function of doc_id (splitmix
  *    mixing), so retried/speculated tasks produce identical rows — the
  *    same property the hash-sampling ops rely on.
  */
class DocsSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-docs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocsSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    {
      val rows = properties.getOrDefault("rows", "1000").toLong
      val parts = properties.getOrDefault("partitions", "4").toInt
      val layout = DocsSource.requireLayout(properties.getOrDefault("layout", "range"))
      require(rows >= 0, s"rows must be >= 0, got $rows")
      // parts <= 0 would divide by zero (or degrade to one partition per
      // row) in planInputPartitions — reject at table resolution
      require(parts >= 1, s"partitions must be >= 1, got $parts")
      new DocsTable(rows, parts, layout)
    }
}

object DocsSource {
  /** Validate a layout value wherever it enters (table properties or
    * scan options) — one definition of the accepted set. */
  private[sources] def requireLayout(l: String): String = {
    require(l == "range" || l == "bucket", s"layout must be range|bucket, got $l")
    l
  }

  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  val Langs: Array[String] = Array("en", "en", "en", "es", "fr", "de")
  val Sources: Array[String] = Array("web", "wiki", "news", "forum")
  val Vocab: Array[String] =
    ("the a of and to in merge join spark shuffle partition broadcast " +
      "codegen filter scan window stream batch hash sort agg map reduce " +
      "plan query data table row column").split(" ")

  def mix(v0: Long): Long = {
    var v = v0 + 0x9E3779B97F4A7C15L
    v ^= v >>> 30; v *= 0xBF58476D1CE4E5B9L
    v ^= v >>> 27; v *= 0x94D049BB133111EBL
    v ^ (v >>> 31)
  }

  /** Saturating +1 / +, ONE definition for every pushdown/runtime-filter
    * bound computation: an accepted filter is removed from the plan, so a
    * wrapped bound silently inverts span semantics (`> MaxValue` returns
    * everything, `<= MaxValue` nothing). Previously duplicated at each
    * site — a fix to one copy could miss its twins. */
  private[sources] def satInc(v: Long): Long =
    if (v == Long.MaxValue) Long.MaxValue else v + 1
  private[sources] def satAdd(a: Long, b: Long): Long =
    if (a > Long.MaxValue - b) Long.MaxValue else a + b

  /** Single-field column reference test shared by aggregate pushdown,
    * top-N pushdown, and runtime filtering. Case-insensitive: the two
    * previous copies disagreed (exact vs ignore-case), and Spark's
    * default resolution is case-insensitive. */
  private[sources] def isColRef(
      e: org.apache.spark.sql.connector.expressions.Expression,
      name: String): Boolean =
    e match {
      case n: NamedReference => n.fieldNames.length == 1 &&
        n.fieldNames()(0).equalsIgnoreCase(name)
      case _ => false
    }

  private[sources] def isDocIdRef(
      e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    isColRef(e, "doc_id")

  def langOf(id: Long): String =
    Langs(math.floorMod(mix(id + 7), Langs.length.toLong).toInt)

  def textOf(id: Long): String = {
    val n = 20 + (math.floorMod(mix(id), 30L)).toInt
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(Vocab(math.floorMod(mix(id * 31 + i), Vocab.length.toLong).toInt))
      i += 1
    }
    sb.toString
  }
}

class DocsTable(rows: Long, parts: Int, layout: String = "range")
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  /** The DSv2 METADATA-COLUMN contract (the Iceberg `_file`/`_pos`
    * shape): `_gen_bucket` = floorMod(doc_id, parts), the partition
    * provenance of each generated row. Hidden from `SELECT *` (Spark
    * only materializes metadata columns when NAMED), synthesized by the
    * reader like any projected column when requested, and equal by
    * definition to the catalog's `bucket(parts, doc_id)` function —
    * SourceSpec pins the hide/show contract and that three-way
    * agreement (reader, MetadataColumn, FunctionCatalog all derive from
    * one floorMod). */
  override def metadataColumns():
      Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_gen_bucket"
      override def dataType(): DataType = IntegerType
      override def isNullable: Boolean = false
      override def comment(): String =
        s"generation bucket: floorMod(doc_id, $parts)"
    })
  // the layout changes plan shape (SPJ vs shuffle), so it must be
  // visible wherever the table prints — two joins of same-sized tables
  // are otherwise indistinguishable in explain output
  override def name(): String =
    if (layout == "bucket") s"graft_docs($rows,bucket)" else s"graft_docs($rows)"
  override def schema(): StructType = DocsSource.Schema
  // advertise the bucket layout at the TABLE level too (what a catalog
  // would publish); the load-bearing report for storage-partitioned
  // joins is the SCAN's outputPartitioning below
  override def partitioning(): Array[Transform] =
    if (layout == "bucket") Array(Expressions.bucket(parts, "doc_id"))
    else Array.empty
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // a scan-level layout override is validated like the table-level one:
    // a typo must fail loudly, not silently degrade to the range layout
    // and cost the user their shuffle-free join
    val l = DocsSource.requireLayout(options.getOrDefault("layout", layout))
    new DocsScanBuilder(rows, parts, options.getLong("rowsPerBatch", 1000L), l)
  }
}

class DocsScanBuilder(rows: Long, parts: Int, rowsPerBatch: Long = 1000L,
    layout: String = "range")
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {
  private var required: StructType = DocsSource.Schema
  private var lo = 0L
  private var hi = rows
  private var langEq: Option[String] = None
  private var accepted: Array[Filter] = Array.empty
  private var aggFuncs: Option[Array[AggregateFunc]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  import DocsSource.{satInc => inc, satAdd, isDocIdRef => isDocId}

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case EqualTo("doc_id", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, inc(v.longValue)); true
      case GreaterThan("doc_id", v: Number) =>
        lo = math.max(lo, inc(v.longValue)); true
      case GreaterThanOrEqual("doc_id", v: Number) =>
        lo = math.max(lo, v.longValue); true
      case LessThan("doc_id", v: Number) =>
        hi = math.min(hi, v.longValue); true
      case LessThanOrEqual("doc_id", v: Number) =>
        hi = math.min(hi, inc(v.longValue)); true
      // the guard matters: an accepted filter is REMOVED from the plan,
      // so a SECOND, conflicting lang equality must stay residual (Spark
      // then evaluates it over the already-filtered rows → empty set)
      // rather than overwrite the first last-write-wins — normally
      // ConstantPropagation folds `lang='en' AND lang='fr'` to false
      // before pushdown, but a session excluding that rule still pushes
      // both
      case EqualTo("lang", v: String) if langEq.forall(_ == v) =>
        langEq = Some(v); true
      case IsNotNull(_) => true // every generated column is non-null
      case _ => false
    }
    accepted = ok
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  // Complete pushdown only — the answers are O(1) functions of the
  // pruned [lo, hi) span. A pushed lang filter makes count depend on
  // actual row generation, so it declines; Spark then aggregates the
  // ordinary scan. (doc_id is non-null, so COUNT(doc_id) == COUNT(*).)
  private def answerable(agg: Aggregation): Boolean =
    langEq.isEmpty && agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case c: Count => !c.isDistinct && isDocId(c.column)
        case m: Min => isDocId(m.column)
        case m: Max => isDocId(m.column)
        case _ => false
      }

  // GROUPED aggregates take the PARTIAL-pushdown contract instead
  // (supportCompletePushDown stays false): group values depend on actual
  // row generation, so the scan cannot answer at plan time — but it CAN
  // iterate its id slice executor-side and ship one partial row per
  // (partition, lang), which Spark's final HashAggregate merges
  // (count -> sum of partials, min -> min, ...). The contract is kept
  // deliberately narrow and honest: group-by must be exactly `lang`, no
  // pushed lang equality (a reader-side filter composing with group
  // partials is a second contract this source doesn't claim), and every
  // aggregate must be decomposable (count/min/max over doc_id,
  // sum over n_chars) — anything else declines to the ordinary scan,
  // which is what keeps `src_docs_pushdown`'s declined-under-filter
  // plan (its group key is `source`, with lang pushed) intact.
  private def answerableGrouped(agg: Aggregation): Boolean =
    langEq.isEmpty && agg.groupByExpressions.length == 1 &&
      DocsSource.isColRef(agg.groupByExpressions()(0), "lang") &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case c: Count => !c.isDistinct && isDocId(c.column)
        case m: Min => isDocId(m.column)
        case m: Max => isDocId(m.column)
        case s: Sum => !s.isDistinct && DocsSource.isColRef(s.column, "n_chars")
        case _ => false
      }

  // Limit pushdown: ids are generated in span order, so LIMIT n is
  // exactly the first n ids of the pruned span — clamp hi at planning
  // time (out-of-span partitions are never created) and report FULLY
  // pushed so Spark drops its own GlobalLimit. A pushed lang filter
  // drops rows reader-side, making the clamp wrong — decline there.
  override def pushLimit(limit: Int): Boolean = {
    if (langEq.isDefined || limit < 0) false
    else {
      hi = math.min(hi, satAdd(lo, limit))
      true
    }
  }
  // one override serves BOTH interfaces (same default-method signature):
  // plain limit is exact (Spark may drop its GlobalLimit), top-N is
  // partial (Spark keeps the sort+limit over our narrowed span)
  private var topNPushed = false
  override def isPartiallyPushed(): Boolean = topNPushed

  // Top-N pushdown on doc_id: ascending keeps the first n ids, descending
  // the last n. PARTIAL only — multiple input partitions read in
  // parallel, so Spark keeps the final sort+limit and we just stop
  // generating rows that cannot be in the answer.
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    if (langEq.isDefined || limit < 0 || orders.length != 1) return false
    val o = orders(0)
    if (!isDocId(o.expression())) return false
    topNPushed = true
    if (o.direction() == SortDirection.ASCENDING) {
      hi = math.min(hi, satAdd(lo, limit))
    } else {
      lo = math.max(lo, if (hi < Long.MinValue + limit) Long.MinValue else hi - limit)
    }
    true
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean = answerable(agg)

  private var groupedAgg = false
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (answerable(agg)) { aggFuncs = Some(agg.aggregateExpressions); true }
    else if (answerableGrouped(agg)) {
      aggFuncs = Some(agg.aggregateExpressions); groupedAgg = true; true
    } else false
  }

  override def build(): Scan = aggFuncs match {
    case Some(funcs) if groupedAgg =>
      new DocsGroupAggScan(parts, math.max(lo, 0L), math.min(hi, rows), funcs)
    case Some(funcs) => new DocsAggScan(math.max(lo, 0L), math.min(hi, rows), funcs)
    case None        => new DocsScan(rows, parts, required, lo, hi, langEq,
      rowsPerBatch, layout)
  }
}

/** The pre-aggregated scan: one partition, one row, values computed from
  * the pruned id span at plan time — no document is ever synthesized. */
class DocsAggScan(lo: Long, hi: Long, funcs: Array[AggregateFunc])
    extends Scan with Batch {

  private val n = math.max(0L, hi - lo)
  // positional contract: one output column per aggregate expression, in
  // Aggregation order; min/max are NULL on an empty span (count stays 0)
  private val values: Array[Any] = funcs.map {
    case _: CountStar => n
    case _: Count     => n
    case _: Min       => if (n > 0) lo else null
    case _: Max       => if (n > 0) hi - 1 else null
    case f => throw new IllegalArgumentException(s"unanswerable aggregate $f")
  }

  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case (f, i) => StructField(s"agg_$i", LongType,
      nullable = !f.isInstanceOf[CountStar] && !f.isInstanceOf[Count])
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-docs pushed-agg range=[$lo,$hi) ${funcs.mkString(", ")}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(DocsRange(0, 1))

  override def createReaderFactory(): PartitionReaderFactory = {
    val vals = values
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow =
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
          override def close(): Unit = ()
        }
    }
  }
}

/** The grouped PARTIAL-pushdown scan (`supportCompletePushDown` = false
  * for any grouped aggregation): each input partition iterates its id
  * slice executor-side and emits ONE row per lang present in the slice,
  * carrying that slice's partial (count / min / max / sum) values — the
  * scan ships group PARTIALS, never rows, and Spark plans its own final
  * aggregation above, rewriting count -> sum-of-partials, min -> min,
  * max -> max, sum -> sum (the V2ScanRelationPushDown partial contract,
  * the one JDBC sources use). At 100 TB this is the difference between
  * an exchange carrying |corpus| rows and one carrying
  * |partitions| x |langs| rows: the full scan work still happens, but
  * it happens inside the source where the data lives, and only the
  * bounded partial relation crosses the wire. Accumulator state per
  * partition is |langs| x 4 longs — bounded by the column's domain,
  * never by the span. */
class DocsGroupAggScan(parts: Int, lo: Long, hi: Long,
    funcs: Array[AggregateFunc]) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  import DocsSource.satAdd

  // a well-behaved source reports what it knows: the partial relation is
  // at most one row per (planned partition, distinct lang) — and never
  // more rows than the span itself (a 2-id span cannot emit 32 partials)
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val span = math.max(0L, hi - lo)
    val n = math.min(span,
      planInputPartitions().length.toLong * DocsSource.Langs.distinct.length)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): util.OptionalLong =
        util.OptionalLong.of(math.max(1L, n * (16L + 8L * funcs.length)))
      override def numRows(): util.OptionalLong = util.OptionalLong.of(n)
    }
  }

  // positional contract: group-by columns first, then one column per
  // aggregate expression in Aggregation order (Spark splits
  // readSchema's attributes at groupBy.length and asserts total width)
  override def readSchema(): StructType = StructType(
    StructField("lang", StringType, nullable = false) +:
      funcs.zipWithIndex.map { case (f, i) =>
        StructField(s"agg_$i", LongType,
          nullable = !f.isInstanceOf[CountStar] && !f.isInstanceOf[Count])
      })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-docs pushed-group-agg range=[$lo,$hi) groupBy=lang " +
      funcs.mkString(", ")

  override def planInputPartitions(): Array[InputPartition] = {
    // same contiguous-span split + pruning as the ordinary range scan:
    // out-of-span partitions are never created
    val span = math.max(0L, hi - lo)
    val per = math.max(1L, span / parts + (if (span % parts == 0) 0 else 1))
    (lo until hi by per)
      .map(s => DocsRange(s, math.min(hi, satAdd(s, per))))
      .filter(r => r.start < r.end)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // resolve each aggregate to an accumulator slot ONCE, driver-side —
    // an unanswerable function (the builder vets, but belt-and-braces)
    // fails at planning, not per row on an executor
    val slots: Array[Int] = funcs.map {
      case _: CountStar => 0
      case c: Count if !c.isDistinct && DocsSource.isDocIdRef(c.column) => 0
      case m: Min if DocsSource.isDocIdRef(m.column) => 1
      case m: Max if DocsSource.isDocIdRef(m.column) => 2
      case s: Sum if !s.isDistinct && DocsSource.isColRef(s.column, "n_chars") => 3
      case f => throw new IllegalArgumentException(s"unanswerable grouped aggregate $f")
    }
    val needSum = slots.contains(3)
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val DocsRange(start, end) = partition: @unchecked
        new PartitionReader[InternalRow] {
          // the whole slice folds into |langs|-bounded state on first
          // advance; iteration order is first-appearance (deterministic:
          // a pure function of the slice), and Spark's final aggregate
          // owns cross-partition ordering anyway
          private var out: Iterator[InternalRow] = null
          private var cur: InternalRow = null
          override def next(): Boolean = {
            if (out == null) {
              val acc = scala.collection.mutable.LinkedHashMap[String, Array[Long]]()
              var id = start
              while (id < end) {
                val a = acc.getOrElseUpdate(DocsSource.langOf(id),
                  Array(0L, Long.MaxValue, Long.MinValue, 0L))
                a(0) += 1
                if (id < a(1)) a(1) = id
                if (id > a(2)) a(2) = id
                // text synthesizes ONLY when a sum(n_chars) was pushed —
                // count/min/max partials never pay the generator
                if (needSum) a(3) += DocsSource.textOf(id).length.toLong
                id += 1
              }
              out = acc.iterator.map { case (lang, a) =>
                val vals = new Array[Any](slots.length + 1)
                vals(0) = UTF8String.fromString(lang)
                var i = 0
                while (i < slots.length) { vals(i + 1) = a(slots(i)); i += 1 }
                new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
              }
            }
            if (out.hasNext) { cur = out.next(); true } else false
          }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
  }
}

class DocsScan(rows: Long, parts: Int, required: StructType,
               lo: Long, hi: Long, langEq: Option[String],
               rowsPerBatch: Long = 1000L, layout: String = "range")
    extends Scan with Batch
    with SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Streaming read path: the id space replayed as micro-batches of
    * `rowsPerBatch` ids. Offsets are plain high-water doc_ids, and every
    * cell is a pure function of doc_id, so REPLAYING an epoch after
    * recovery regenerates byte-identical rows — paired with the graft-mem
    * sink's per-epoch high-water mark this is exactly-once end to end
    * (StreamingSpec/SourceSpec). NOTE: Spark's micro-batch path builds
    * the scan without running the pushdown rules, so `required`/`lo`/
    * `hi`/`langEq` are always at their defaults here — the stream
    * generates the full schema for every admitted id and Spark filters/
    * projects above the scan (correct, just not pruned at the source the
    * way the batch path is). */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new DocsMicroBatchStream(parts, math.max(0L, lo), math.min(rows, hi),
      math.max(1L, rowsPerBatch), required.fieldNames, langEq)

  // Post-pushdown statistics: the planner sees the PRUNED span's row
  // count and a per-row size over only the PROJECTED columns, so a small
  // (or well-filtered) generated table qualifies for automatic broadcast
  // under autoBroadcastJoinThreshold with no hint — the same role parquet
  // footer/catalog stats play for file tables. A pushed lang filter keeps
  // the span estimate (reader-side selectivity is unknown); an
  // OVER-estimate can only miss a broadcast, never OOM one.
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val n = math.max(0L, hi - lo)
    val perRow = required.fieldNames.map {
      case "text" => 35L * 8   // texts are 20-49 tokens × avg token+space bytes
      case "doc_id" | "n_chars" => 8L
      case _ => 16L
    }.sum + 16L
    // saturating multiply: a huge generated span must report a huge size,
    // not a wrapped-negative one clamped to 1 byte (which would broadcast
    // an enormous table — exactly the OOM this estimate exists to avoid)
    val size =
      if (n != 0 && perRow > Long.MaxValue / n) Long.MaxValue
      else math.max(1L, n * perRow)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(size)
      override def numRows(): util.OptionalLong = util.OptionalLong.of(n)
    }
  }
  override def description(): String =
    s"graft-docs rows=$rows range=[$lo,$hi)${langEq.fold("")(l => s" lang=$l")}"

  // Runtime-narrowed span (DPP analogue): starts at the planning-time
  // bounds; a dynamic-pruning IN/= filter on doc_id — produced by a join
  // whose broadcast build side completed first — tightens it before
  // partitions are planned. Runtime filters are semi-join REDUCTIONS:
  // under-applying them (we keep only the [min, max] envelope of the IN
  // set) is always safe because the join re-filters, so rows between
  // surviving ids merely cost generation, never correctness.
  @volatile private var rlo: Long = lo
  @volatile private var rhi: Long = hi

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("doc_id"))

  override def filter(predicates: Array[Predicate]): Unit = {
    import DocsSource.{satInc => inc, isDocIdRef => isDocId}
    def lit(e: org.apache.spark.sql.connector.expressions.Expression): Option[Long] =
      e match {
        case l: Literal[_] => l.value match {
          case x: java.lang.Long    => Some(x.longValue)
          case x: java.lang.Integer => Some(x.longValue)
          case _                    => None
        }
        case _ => None
      }
    // inc saturates, mirroring the builder: a Long.MaxValue id in the
    // build side must not wrap rhi to MinValue and empty the scan —
    // that would OVER-apply a reduction-only filter and drop valid rows
    predicates.foreach { p =>
      val kids = p.children()
      p.name() match {
        case "IN" if kids.nonEmpty && isDocId(kids.head) =>
          val vs = kids.drop(1).flatMap(lit)
          // only narrow when EVERY element parsed — a partial parse could
          // otherwise drop ids the filter still allows
          if (vs.nonEmpty && vs.length == kids.length - 1) {
            rlo = math.max(rlo, vs.min)
            rhi = math.min(rhi, inc(vs.max))
          } else if (kids.length == 1) {
            rhi = rlo // IN () — nothing survives
          }
        case "=" if kids.length == 2 && isDocId(kids(0)) =>
          lit(kids(1)).foreach { v =>
            rlo = math.max(rlo, v); rhi = math.min(rhi, inc(v))
          }
        case _ => () // non-exact predicate: ignore (reduction-only contract)
      }
    }
    if (DocsScan.recordRuntimeSpans) DocsScan.lastRuntimeSpan = Some((rlo, rhi))
  }

  /** Storage-partitioned-join report: under the bucket layout every
    * input partition holds exactly the ids with `doc_id % parts ==
    * bucket` and carries that bucket as its partition key
    * ([[DocsBucketRange.partitionKey]]), so the scan's output is
    * key-grouped by `bucket(parts, doc_id)`. Two bucket-layout scans
    * with the same modulus joined on doc_id are then co-partitioned by
    * construction and Spark (with `spark.sql.sources.v2.bucketing
    * .enabled`) plans the join with NO shuffle on either side — the
    * DSv2 analogue of the bucketed-table join in BucketingSpec, and how
    * modern table formats (Iceberg-style SPJ) join fact tables at
    * 100 TB without paying an exchange. The default range layout keeps
    * contiguous spans (better for range pruning) and reports unknown. */
  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (layout == "bucket")
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(Expressions.bucket(parts, "doc_id")), parts)
    else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(parts)

  override def planInputPartitions(): Array[InputPartition] = {
    // intersect with the pushed [lo, hi) AND the runtime-narrowed
    // [rlo, rhi) — out-of-range partitions are pruned before tasks
    // launch, mirroring how a partitioned table prunes directories
    // (statically) and skips DPP-pruned partitions (dynamically)
    if (layout == "bucket") {
      // one partition per residue class mod `parts`; ALL buckets are
      // emitted (possibly empty) so co-partitioned sides always report
      // identical key sets to the SPJ matcher
      val end = math.min(rows, rhi)
      Array.tabulate(parts)(b => DocsBucketRange(b, parts, math.max(0L, rlo), end))
    } else {
      // overflow-safe ceil-div: (rows + parts - 1) wraps negative for
      // rows near Long.MaxValue, collapsing per to 1 and asking the
      // driver to materialize ~2^63 range objects
      val per = math.max(1L, rows / parts + (if (rows % parts == 0) 0 else 1))
      (0L until rows by per)
        .map(s => DocsRange(math.max(s, rlo), math.min(math.min(rows, s + per), rhi)))
        .filter(r => r.start < r.end)
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    DocsScan.readerFactory(required.fieldNames, langEq, parts)
}

case class DocsRange(start: Long, end: Long) extends InputPartition

/** Bucket-layout partition: the ids in [start, end) with
  * `id % parts == bucket`. The partition key is the bucket number — the
  * value `bucket(parts, doc_id)` takes on every row in the partition —
  * which is what lets Spark group and match partitions across join sides
  * without an exchange. */
case class DocsBucketRange(bucket: Int, parts: Int, start: Long, end: Long)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bucket))
}

object DocsScan {
  /** Test observability hook: when enabled, the last runtime-narrowed
    * span a [[DocsScan.filter]] call produced (driver-side only;
    * SourceSpec asserts the DPP round trip actually narrowed the
    * generator). Off by default so concurrent production queries never
    * touch shared state. */
  @volatile var recordRuntimeSpans: Boolean = false
  @volatile var lastRuntimeSpan: Option[(Long, Long)] = None

  /** Shared by the batch scan and the micro-batch stream — the factory
    * ships to executors and must capture only serializable locals. */
  // parts is REQUIRED (no default): it feeds the _gen_bucket metadata
  // column, and a defaulted value would silently emit wrong buckets for
  // any table whose partition count differs
  private[graft] def readerFactory(fields: Array[String],
      langEq: Option[String], parts: Int): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        // range partitions walk contiguous ids; bucket partitions stride
        // through their residue class (first id >= start in the class).
        // All id arithmetic saturates: a span ending within `step` of
        // Long.MaxValue must terminate, not wrap negative and re-enter
        // the `id < end` window emitting ids the pushed (and removed)
        // filter excluded — the same saturation contract the builder's
        // inc() keeps on the pushdown side.
        val (first, end, step) = partition match {
          case DocsRange(s, e) => (s, e, 1L)
          case b: DocsBucketRange =>
            val off = java.lang.Math.floorMod(b.bucket - b.start, b.parts.toLong)
            val f = if (b.start > Long.MaxValue - off) b.end // overflow: empty
                    else b.start + off
            (f, b.end, b.parts.toLong)
        }
        new PartitionReader[InternalRow] {
          private var id = first
          private var started = false
          // saturating advance: overflow → jump to `end` (exhausted)
          private def advance(): Unit = {
            val n = id + step
            id = if (n < id) end else n
          }
          // lang computed by the pushdown check is carried into get() so
          // a pushed lang filter + projected lang column hashes once, not
          // twice, per emitted row
          private var lang: String = _
          override def next(): Boolean = {
            // the pushed lang filter is checked BEFORE any other column
            // is synthesized — non-matching ids cost one hash each
            if (started) advance() else started = true
            if (langEq.isDefined) {
              val want = langEq.get
              lang = null
              while (id < end && { lang = DocsSource.langOf(id); lang != want })
                advance()
            }
            id < end
          }
          // field names resolve to int codes ONCE per reader — the row
          // loop below dispatches on a tableswitch instead of paying a
          // per-cell string match on every emitted row (this loop is what
          // the scan benchmarks measure); unknown columns fail at reader
          // construction, before any row is generated
          private val codes: Array[Int] = fields.map {
            case "doc_id" => 0
            case "text" => 1
            case "lang" => 2
            case "source" => 3
            case "n_chars" => 4
            case "_gen_bucket" => 5 // metadata column, only when NAMED
            case other => throw new IllegalArgumentException(s"unknown column $other")
          }
          override def get(): InternalRow = {
            // generate only the projected columns; text is the expensive
            // one and is synthesized at most once per row
            var text: String = null
            def textOnce: String = {
              if (text == null) text = DocsSource.textOf(id)
              text
            }
            val values = new Array[Any](codes.length)
            var i = 0
            while (i < codes.length) {
              values(i) = codes(i) match {
                case 0 => id
                case 1 => UTF8String.fromString(textOnce)
                case 2 => UTF8String.fromString(
                  if (lang != null) lang else DocsSource.langOf(id))
                case 3 => UTF8String.fromString(
                  DocsSource.Sources(math.floorMod(DocsSource.mix(id + 13),
                    DocsSource.Sources.length.toLong).toInt))
                case 5 => math.floorMod(id, parts.toLong).toInt
                case _ => textOnce.length.toLong
              }
              i += 1
            }
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
          }
          override def close(): Unit = ()
        }
      }
    }
}

/** Micro-batch stream over the generated id space: offsets are high-water
  * doc_ids, each batch covers [start, end) split across `parts` ranges.
  * Determinism makes epoch replay exact — the recovery contract the
  * graft-mem streaming sink's epoch high-water mark completes. */
class DocsMicroBatchStream(parts: Int, lo: Long, hi: Long, rowsPerBatch: Long,
    fields: Array[String], langEq: Option[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  override def initialOffset(): Offset = DocsOffset(lo)

  // Admission control is the CORRECT home for rate limiting: latestOffset()
  // must report all available data (the end of the span) or
  // Trigger.AvailableNow/Once would fix their final target at one batch
  // and terminate "successfully" with most of the stream unread. The
  // per-trigger pacing lives in latestOffset(start, limit) instead, where
  // the engine tells us how much to admit from `start`.
  override def latestOffset(): Offset = DocsOffset(hi)

  override def reportLatestOffset(): Offset = DocsOffset(hi)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = math.max(lo, start.asInstanceOf[DocsOffset].v)
    val step = math.max(1L, limit match {
      case m: ReadMaxRows => m.maxRows()
      case _              => hi - s // allAvailable and anything else
    })
    // saturating add: a max-rows limit near a Long.MaxValue span end must
    // clamp to hi, not wrap negative and move the offset BACKWARDS
    val next = if (s > Long.MaxValue - step) Long.MaxValue else s + step
    DocsOffset(math.min(hi, next))
  }

  override def deserializeOffset(json: String): Offset =
    DocsOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DocsOffset].v
    val e = end.asInstanceOf[DocsOffset].v
    val span = math.max(0L, e - s)
    if (span == 0) Array.empty
    else {
      // overflow-safe ceil-div, same as the batch path (DocsScan
      // .planInputPartitions): span + parts - 1 wraps negative for spans
      // near Long.MaxValue (Trigger.Once admits the whole span in one
      // batch), collapsing per to 1 and materializing ~2^63 ranges
      val per = math.max(1L, span / parts + (if (span % parts == 0) 0 else 1))
      (s until e by per).map(x => DocsRange(x, math.min(e, x + per))).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    DocsScan.readerFactory(fields, langEq, parts)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class DocsOffset(v: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = v.toString
}
