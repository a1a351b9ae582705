package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job metrics via SparkListener (north-rule "per-partition lineage and
  * row-count/byte metrics"): per-stage input/output/shuffle volumes and
  * task counts, collected during a pipeline run and appended to the table's
  * metrics log. Stage metrics aggregate executor-side task metrics — no
  * driver-side data movement. */
final class StageMetricsListener extends SparkListener {
  private val stages = new ConcurrentLinkedQueue[String]()
  // marker-job barrier state: the marker is identified EXPLICITLY by its
  // spark.jobGroup.id (counting job-ends would be racy — a late-delivered
  // end event from the body itself could satisfy the wait before the body's
  // last stage events arrive)
  private val markerJobIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  @volatile private var markerGroup: String = null
  @volatile private var markerEnded = false

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    val grp =
      if (e.properties == null) null
      else e.properties.getProperty("spark.jobGroup.id")
    if (grp != null && grp == markerGroup) markerJobIds.add(e.jobId)
  }

  override def onJobEnd(e: SparkListenerJobEnd): Unit =
    if (markerJobIds.contains(e.jobId)) markerEnded = true

  /** Arm the barrier for a marker job tagged with job group `group`. */
  def armMarker(group: String): Unit = {
    markerGroup = group
    markerEnded = false
  }

  /** Block until the armed marker job's end event has been delivered
    * (bounded by `timeoutMs`). Events are delivered FIFO per listener, so
    * the marker's job-end implies every earlier stage event has arrived. */
  def awaitMarker(timeoutMs: Long): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!markerEnded && System.nanoTime() < deadline)
      Thread.sleep(2)
    markerEnded
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
      // bus; run a marker job — identified by a unique job group, so a
      // late-delivered end event from `body` can never satisfy the wait —
      // and block on ITS end: FIFO delivery then guarantees every stage
      // event from `body` has arrived (deterministic, unlike a fixed sleep)
      val group = s"graft-metrics-marker-${System.nanoTime()}"
      listener.armMarker(group)
      val sc = spark.sparkContext
      val (prevGroup, prevDesc) = (sc.getLocalProperty("spark.jobGroup.id"),
        sc.getLocalProperty("spark.job.description"))
      sc.setJobGroup(group, "metrics barrier")
      try sc.parallelize(Seq(0), 1).count()
      finally sc.setJobGroup(prevGroup, prevDesc)
      listener.awaitMarker(15000)
      (r, listener.drainTo(s"$tableDir/metrics.jsonl"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
