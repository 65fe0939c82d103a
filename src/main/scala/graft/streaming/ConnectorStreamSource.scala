package graft.streaming

import java.util

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.MonotonicGate.Update

/** First-class Structured Streaming SOURCE for connector feeds: a
  * DataSourceV2 `MicroBatchStream` over a named, BOUNDED push buffer.
  *
  * The reference's streaming connectors push updates into a bounded mpsc
  * channel (capacity 1024, borsa/src/router/stream.rs:56) that the router
  * consumes. The Spark-native analog is a real source:
  *
  * {{{
  * val buf = StreamBuffer.register("quotes-p0")          // session side
  * buf.push(Update("AAPL", arrival, ts))                 // connector push
  * val df = ConnectorStreamSource.readStream(spark, "quotes-p0")
  * df.writeStream...                                     // plan side
  * }}}
  *
  * Design:
  *  - offsets are monotone row indices; each micro-batch reads the
  *    [start, end) slice, and `commit(end)` frees the prefix — so the
  *    buffer holds only uncommitted rows;
  *  - the buffer is bounded (default 1024 like the reference): a full
  *    buffer blocks `push` up to its timeout and then REJECTS (counted in
  *    [[StreamBuffer.dropped]]) — slow-consumer protection that degrades
  *    like the reference's bounded channel instead of exhausting driver
  *    memory (router_stream_slow_consumer.rs);
  *  - one logical consumer per buffer (the committing query); the
  *    supervisor starts at most one session query per (chain, provider),
  *    which is exactly that cardinality.
  *
  * The buffer lives on the DRIVER (sessions are driver-side control
  * plane); partitions ship their slice to executors. That bounds a
  * per-provider feed to driver memory — the same boundary the reference's
  * in-process channel has.
  */
object ConnectorStreamSource {

  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("arrival", LongType, nullable = false),
    StructField("ts", LongType, nullable = false)))

  /** The readStream entry point (usable as a production
    * `QuerySessionRunner.sourceFor`).
    */
  def readStream(spark: SparkSession, buffer: String): DataFrame =
    spark.readStream
      .format(classOf[GraftStreamProvider].getName)
      .option("buffer", buffer)
      .load()
}

/** Named bounded update buffer; see [[ConnectorStreamSource]]. */
final class StreamBuffer(val name: String, capacity: Int) {
  private val rows = mutable.Queue.empty[(Long, Update)]
  private var nextIdx = 0L
  private var firstIdx = 0L
  private var droppedCount = 0L

  /** Append one update. Blocks while the buffer is full for up to
    * `timeoutMs` (0 = don't wait); a still-full buffer rejects the update
    * and counts it. Returns true iff accepted.
    */
  def push(u: Update, timeoutMs: Long = 0L): Boolean = synchronized {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (rows.size >= capacity) {
      val leftMs = (deadline - System.nanoTime()) / 1000000L
      if (leftMs <= 0) { droppedCount += 1; return false }
      wait(leftMs)
    }
    rows.enqueue((nextIdx, u))
    nextIdx += 1
    true
  }

  def dropped: Long = synchronized(droppedCount)
  def earliest: Long = synchronized(firstIdx)
  def latest: Long = synchronized(nextIdx)

  def slice(start: Long, end: Long): Seq[Update] = synchronized {
    rows.iterator.filter { case (i, _) => i >= start && i < end }.map(_._2).toSeq
  }

  /** Free the committed prefix; unblocks waiting producers. */
  def trimTo(end: Long): Unit = synchronized {
    while (rows.nonEmpty && rows.head._1 < end) rows.dequeue()
    if (end > firstIdx) firstIdx = end
    notifyAll()
  }
}

object StreamBuffer {
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, StreamBuffer]()

  /** Register (or replace) a named buffer. Capacity default = the
    * reference's channel bound (stream.rs:56).
    */
  def register(name: String, capacity: Int = 1024): StreamBuffer = {
    val b = new StreamBuffer(name, capacity)
    registry.put(name, b)
    b
  }
  def get(name: String): Option[StreamBuffer] = Option(registry.get(name))
  def unregister(name: String): Unit = registry.remove(name)
}

/** `spark.readStream.format(<this class name>)` provider. */
final class GraftStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ConnectorStreamSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val name = Option(properties.get("buffer")).getOrElse(
      throw new IllegalArgumentException("graft-stream requires option 'buffer'"))
    new GraftStreamTable(name)
  }
}

private final class GraftStreamTable(bufferName: String) extends Table with SupportsRead {
  override def name(): String = s"graft-stream($bufferName)"
  override def schema(): StructType = ConnectorStreamSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ConnectorStreamSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftMicroBatchStream(bufferName)
      }
    }
}

private final case class GraftOffset(idx: Long) extends Offset {
  override def json(): String = idx.toString
}

private final class GraftMicroBatchStream(bufferName: String) extends MicroBatchStream {
  private def buffer: StreamBuffer =
    StreamBuffer.get(bufferName).getOrElse(
      throw new IllegalStateException(s"stream buffer '$bufferName' is not registered"))

  override def initialOffset(): Offset = GraftOffset(buffer.earliest)
  override def latestOffset(): Offset = GraftOffset(buffer.latest)
  override def deserializeOffset(json: String): Offset = GraftOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].idx
    val e = end.asInstanceOf[GraftOffset].idx
    Array(GraftStreamPartition(buffer.slice(s, e)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftStreamReaderFactory

  /** The committed prefix is never re-read: free it so producers unblock. */
  override def commit(end: Offset): Unit =
    buffer.trimTo(end.asInstanceOf[GraftOffset].idx)

  override def stop(): Unit = ()
}

private final case class GraftStreamPartition(updates: Seq[Update]) extends InputPartition

private object GraftStreamReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val it = partition.asInstanceOf[GraftStreamPartition].updates.iterator
    new PartitionReader[InternalRow] {
      private var current: Update = _
      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current.symbol), current.arrival, current.ts)
      override def close(): Unit = ()
    }
  }
}
