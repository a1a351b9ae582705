package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job metrics via SparkListener (north-rule "per-partition lineage and
  * row-count/byte metrics"): per-stage input/output/shuffle volumes and
  * task counts, collected during a pipeline run and appended to the table's
  * metrics log. Stage metrics aggregate executor-side task metrics — no
  * driver-side data movement. */
final class StageMetricsListener extends SparkListener {
  private val stages = new ConcurrentLinkedQueue[String]()
  private val jobsEnded = new java.util.concurrent.atomic.AtomicInteger(0)

  override def onJobEnd(e: SparkListenerJobEnd): Unit = jobsEnded.incrementAndGet()

  def jobsSeen: Int = jobsEnded.get()

  /** Block until this listener has observed at least `atLeast` job-end
    * events (bounded by `timeoutMs`). Events are delivered FIFO per
    * listener, so seeing job N's end implies all earlier stage events have
    * been delivered too. */
  def awaitJobs(atLeast: Int, timeoutMs: Long): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (jobsEnded.get() < atLeast && System.nanoTime() < deadline)
      Thread.sleep(2)
    jobsEnded.get() >= atLeast
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val info = sc.stageInfo
    val m = info.taskMetrics
    stages.add(
      s"""{"stage":${info.stageId},"name":${quote(info.name.takeWhile(_ != '\n'))},""" +
        s""""tasks":${info.numTasks},"input_bytes":${m.inputMetrics.bytesRead},""" +
        s""""input_records":${m.inputMetrics.recordsRead},""" +
        s""""output_bytes":${m.outputMetrics.bytesWritten},""" +
        s""""output_records":${m.outputMetrics.recordsWritten},""" +
        s""""shuffle_read_bytes":${m.shuffleReadMetrics.totalBytesRead},""" +
        s""""shuffle_write_bytes":${m.shuffleWriteMetrics.bytesWritten},""" +
        s""""executor_run_ms":${m.executorRunTime}}""")
  }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def drainTo(path: String): Int = {
    val dir = Paths.get(path).getParent
    if (dir != null) Files.createDirectories(dir)
    val sb = new StringBuilder
    var n = 0
    var line = stages.poll()
    while (line != null) {
      sb.append(line).append('\n')
      n += 1
      line = stages.poll()
    }
    Files.writeString(Paths.get(path), sb.toString,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    n
  }
}

object Metrics {
  /** Run `body` with stage metrics captured, appending them to
    * `tableDir/metrics.jsonl`. Returns (result, #stages recorded). */
  def withStageMetrics[T](spark: SparkSession, tableDir: String)(body: => T): (T, Int) = {
    val listener = new StageMetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = body
      // stage-completed events are delivered asynchronously on the listener
      // bus; run a marker job and wait for its job-end — FIFO delivery then
      // guarantees every stage event from `body` has arrived (deterministic,
      // unlike a fixed sleep)
      val before = listener.jobsSeen
      spark.sparkContext.parallelize(Seq(0), 1).count()
      listener.awaitJobs(before + 1, 15000)
      (r, listener.drainTo(s"$tableDir/metrics.jsonl"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
