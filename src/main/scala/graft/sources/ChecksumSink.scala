package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Verifying in-memory sink — the WRITE half of the DataSourceV2 story
  * (the Datagen connector covers the read half's four pushdown tiers).
  *
  * What this demonstrates is the V2 batch COMMIT PROTOCOL, for real:
  * per-task [[DataWriter]]s fold rows into three longs, task commit()
  * emits a [[WriterCommitMessage]], and the DRIVER — and only the
  * driver — decides the job outcome: [[BatchWrite.commit]] publishes
  * the aggregated stats atomically; a failed task or job routes to
  * [[BatchWrite.abort]] and publishes NOTHING (spec-pinned). That
  * all-or-nothing contract is exactly what a real table format's
  * manifest/metadata swap provides; here the "table" is a stats
  * registry so the protocol is observable in-process.
  *
  * Scale shape: writer state is O(1) per task (count + two checksums)
  * regardless of row count, and both checksums are COMMUTATIVE
  * (wrapping sum + xor of per-row hashes), so any partitioning, task
  * order, or retry schedule that delivers each partition exactly once
  * commits identical stats — the spec replays the same frame under a
  * different repartition and asserts equality. The per-row hash mixes
  * every column through a Knuth multiplicative step (the same constant
  * family as functions/HashKernels), so reordered COLUMNS do change
  * the hash while reordered ROWS do not.
  *
  * Usage:
  * {{{
  *   df.write.format(classOf[ChecksumSinkProvider].getName)
  *     .option("runId", "myRun").mode("append").save()
  *   val stats = ChecksumSink.committed.get("myRun")
  * }}}
  */
class ChecksumSinkProvider extends TableProvider {
  // the sink accepts whatever schema the query writes (ACCEPT_ANY_SCHEMA);
  // inferSchema is only consulted for reads, which this table refuses
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChecksumSinkTable(
      properties.getOrDefault("runId", "default"),
      properties.getOrDefault("failWrites", "false").toBoolean)
}

object ChecksumSink {
  /** Published stats of one committed write job. */
  case class Stats(rows: Long, hashSum: Long, hashXor: Long)

  /** runId -> committed stats; written ONLY by BatchWrite.commit. */
  val committed = new java.util.concurrent.ConcurrentHashMap[String, Stats]()
  /** runIds whose job aborted (for spec visibility into the abort path). */
  val aborted = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private final val Mix = 0x9E3779B97F4A7C15L // golden-ratio multiplicative step

  /** Deterministic per-row hash over all columns: field order matters,
    * row order must not (rows combine commutatively upstream). */
  def rowHash(row: InternalRow, schema: StructType): Long = {
    var h = 1L
    var i = 0
    while (i < schema.length) {
      val f = if (row.isNullAt(i)) 0L else schema(i).dataType match {
        case LongType => row.getLong(i)
        case IntegerType => row.getInt(i).toLong
        case DoubleType => java.lang.Double.doubleToLongBits(row.getDouble(i))
        case FloatType => java.lang.Float.floatToIntBits(row.getFloat(i)).toLong
        case BooleanType => if (row.getBoolean(i)) 1L else 0L
        case StringType => row.getUTF8String(i).hashCode.toLong // murmur3 over bytes: JVM-stable
        case TimestampType => row.getLong(i)
        case DateType => row.getInt(i).toLong
        case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toUnscaledLong
        case other => throw new IllegalArgumentException(s"checksum sink: unsupported type $other")
      }
      h = h * Mix + f
      i += 1
    }
    h
  }
}

class ChecksumSinkTable(runId: String, failWrites: Boolean) extends Table with SupportsWrite {
  override def name(): String = s"graft_checksum_sink($runId)"
  override def schema(): StructType = new StructType()
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    override def build(): Write = new Write {
      override def toBatch: BatchWrite = new ChecksumBatchWrite(runId, failWrites, info.schema())
    }
  }
}

case class ChecksumTaskStats(rows: Long, hashSum: Long, hashXor: Long) extends WriterCommitMessage

class ChecksumBatchWrite(runId: String, failWrites: Boolean, schema: StructType) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    ChecksumWriterFactory(failWrites, schema)

  /** The atomic publish: runs on the driver, once, only if every task
    * committed. Task messages aggregate commutatively so the partition
    * order Spark delivers them in is irrelevant. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L; var sum = 0L; var xor = 0L
    messages.foreach { case ChecksumTaskStats(r, s, x) => rows += r; sum += s; xor ^= x }
    ChecksumSink.committed.put(runId, ChecksumSink.Stats(rows, sum, xor))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // publish NOTHING — the committed view never sees a partial job
    ChecksumSink.aborted.add(runId)
  }
}

case class ChecksumWriterFactory(failWrites: Boolean, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var sum = 0L
      private var xor = 0L

      override def write(row: InternalRow): Unit = {
        if (failWrites && partitionId == 0 && rows == 3)
          throw new java.io.IOException("injected write failure (spec: abort publishes nothing)")
        val h = ChecksumSink.rowHash(row, schema)
        rows += 1; sum += h; xor ^= h
      }

      override def commit(): WriterCommitMessage = ChecksumTaskStats(rows, sum, xor)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
