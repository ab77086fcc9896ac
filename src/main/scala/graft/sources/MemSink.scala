package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 batch SINK (`df.write.format("graft-mem").option("name", t)`)
  * — the write half of the connector contract [[DocsSource]] demonstrates
  * for reads, with the full two-phase commit protocol:
  *
  *  - each task's [[DataWriter]] buffers ITS OWN rows and surrenders them
  *    only inside its `commit()` message — an aborted/speculated task's
  *    buffer is discarded by `abort()` and never reaches the table, which
  *    is exactly how DSv2 achieves task-level atomicity;
  *  - the driver-side [[BatchWrite.commit]] installs all task messages
  *    atomically (append or truncate-then-install for overwrite mode),
  *    so readers never observe a half-written table;
  *  - `SupportsTruncate` maps `mode("overwrite")` onto the builder.
  *
  * The STREAMING write path (`df.writeStream.format("graft-mem")`) runs
  * the same task-buffered two-phase protocol per micro-batch, plus the
  * property streaming adds on top: **epoch idempotence**. After a
  * failure, Structured Streaming replays the last epoch from the
  * checkpoint and re-calls `commit(epochId, ...)` — the sink keeps a
  * per-(table, query) high-water mark and silently skips an epoch it
  * already installed, which is exactly how a DSv2 sink turns at-least-
  * once delivery into exactly-once tables. Complete output mode maps to
  * truncate-per-epoch through the same `SupportsTruncate` hook.
  *
  * The backing store is an in-JVM registry keyed by table name — the
  * right scale model for TESTS of the protocol (local[n] executors share
  * the JVM); a production connector swaps the registry for its remote
  * store and the protocol code is unchanged. SourceSpec drives append,
  * overwrite, and read-back; StreamingSpec drives micro-batch appends
  * and replayed-epoch idempotence.
  */
class MemSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mem"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemSink.tables.get(MemSink.nameOf(options))
      .map(_._1).getOrElse(new StructType())

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MemTable(properties.getOrDefault("name", "default"), schema)
}

object MemSink {
  /** table name -> (schema, committed rows). Rows are stored as plain
    * Seq[Any] copies so they're independent of Spark's reused buffers. */
  val tables: TrieMap[String, (StructType, Vector[Seq[Any]])] = TrieMap.empty

  /** (table#queryId) -> highest committed epoch: replayed epochs after a
    * streaming recovery are skipped, not double-installed. */
  val committedEpochs: TrieMap[String, Long] = TrieMap.empty

  def nameOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("name")).getOrElse("default")

  def rows(name: String): Vector[Seq[Any]] =
    tables.get(name).map(_._2).getOrElse(Vector.empty)

  /** Driver-side atomic install shared by the batch and streaming commit:
    * overwrite/complete replaces, append extends — but never across
    * schemas (appended Seq[Any] rows are interpreted positionally by
    * readers, so a silent schema mismatch would mix incompatible row
    * shapes under one stored schema). */
  private[sources] def install(name: String, schema: StructType,
                               truncate: Boolean, incoming: Vector[Seq[Any]]): Unit = {
    tables.updateWith(name) {
      case Some((sch, existing)) if !truncate =>
        if (sch != schema)
          throw new IllegalStateException(
            s"append schema ${schema.simpleString} does not match table schema ${sch.simpleString}")
        Some((sch, existing ++ incoming))
      case _ => Some((schema, incoming))
    }
    ()
  }

  /** The task-side buffered writer shared by batch and streaming: rows
    * surrender only via the commit message (see class doc). */
  private[sources] def bufferedWriter(s: StructType): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var buf = Vector.empty[Seq[Any]]
      override def write(record: InternalRow): Unit = {
        // own the bytes FIRST: copy() gives the row a private buffer,
        // so nested values (UnsafeArrayData/UnsafeRow returned by
        // toSeq for array/map/struct columns) keep pointing at memory
        // this writer owns — toSeq on the ORIGINAL row returned views
        // into Spark's reused task buffer, and every buffered row's
        // nested data silently became the last record's. Top-level
        // strings convert to JVM String for test-friendly equality.
        val owned = record.copy()
        buf = buf :+ owned.toSeq(s).map {
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
          case other => other
        }
      }
      override def commit(): WriterCommitMessage = MemCommit(buf)
      override def abort(): Unit = buf = Vector.empty
      override def close(): Unit = ()
    }

  private[sources] def gather(messages: Array[WriterCommitMessage]): Vector[Seq[Any]] =
    messages.toVector.flatMap {
      case MemCommit(rows) => rows
      case other => throw new IllegalStateException(s"unexpected commit $other")
    }
}

class MemTable(name: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_mem($name)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(name, info.queryId(), info.schema(), truncate = false)
}

class MemWriteBuilder(name: String, queryId: String, schema: StructType,
                      truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder =
    new MemWriteBuilder(name, queryId, schema, truncate = true)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemBatchWrite(name, schema, truncate)
    override def toStreaming: StreamingWrite =
      new MemStreamingWrite(name, queryId, schema, truncate)
  }
}

/** One task's committed rows, shipped to the driver commit. */
case class MemCommit(rows: Vector[Seq[Any]]) extends WriterCommitMessage

class MemBatchWrite(name: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val s = schema
    new DataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
        MemSink.bufferedWriter(s)
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    MemSink.install(name, schema, truncate, MemSink.gather(messages))

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Per-micro-batch two-phase commit. `truncate` here is Complete output
  * mode: each epoch replaces the table (the epoch IS the full result);
  * Append mode extends it. Replayed epochs (recovery re-runs the last
  * micro-batch from the checkpoint) are detected by the per-(table,
  * query) high-water mark and skipped — commit must be idempotent for
  * the sink to be exactly-once. */
class MemStreamingWrite(name: String, queryId: String, schema: StructType,
                        truncate: Boolean)
    extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val s = schema
    new StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
                                epochId: Long): DataWriter[InternalRow] =
        MemSink.bufferedWriter(s)
    }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val key = s"$name#$queryId"
    if (MemSink.committedEpochs.get(key).exists(_ >= epochId)) return
    MemSink.install(name, schema, truncate, MemSink.gather(messages))
    MemSink.committedEpochs.put(key, epochId)
    ()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}
