package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import scala.collection.mutable

/** Streaming observability — the CloudWatch log-stream analog of the
  * reference's delivery pipeline (reference cdk_stacks/firehose.py:126-130,
  * 143-147; SURVEY.md §3.2 stage 6). Collects per-batch input rates and row
  * counts; the reference's "is the pipeline moving" signal, queryable
  * in-process instead of via a log service. */
object MetricsListener {
  final case class BatchMetric(batchId: Long, numInputRows: Long,
                               inputRowsPerSecond: Double,
                               processedRowsPerSecond: Double)
}

final class MetricsListener extends StreamingQueryListener {
  import MetricsListener.BatchMetric

  /** Retained window: a continuously-running query must not grow driver
    * memory, so only the most recent batches are kept verbatim; the input
    * row count is a running total. */
  private val maxRetained = 1024
  private val metrics = mutable.ArrayDeque[BatchMetric]()
  private var inputRows = 0L

  def batches: Seq[BatchMetric] = metrics.synchronized(metrics.toVector)
  def totalInputRows: Long = metrics.synchronized(inputRows)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    metrics.synchronized {
      inputRows += p.numInputRows
      metrics += BatchMetric(p.batchId, p.numInputRows,
        p.inputRowsPerSecond, p.processedRowsPerSecond)
      while (metrics.size > maxRetained) metrics.removeHead()
    }
  }
}
