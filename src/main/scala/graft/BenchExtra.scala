package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Optimization-round helper (guide §1): times individual SparkEntry
  * queries under the EXACT per-query methodology of [[Bench]] (same
  * session config, same `fn(spark, sfDir).count()` action) so changes can
  * be measured in isolation without paying the full bench's scaling
  * blocks. Optionally dumps `explain("formatted")` per query to
  * `plans/r06/<query>_<tag>.txt` (the judge's plan-evidence files).
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra [--reps N] [--plans TAG] q117_intersects_join ..."
  * With no query names, runs the full set once (a cheap whole-surface
  * sweep). SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  */
object BenchExtra {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    var reps = 1
    var plansTag: Option[String] = None
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--plans" => plansTag = Some(args(i + 1)); i += 2
        case q => names += q; i += 1
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val all = SparkEntry.queries
    val picked: Seq[String] =
      if (names.isEmpty) all.keys.toSeq.sorted else names.toSeq
    val spark = session(cpus)
    val out = new StringBuilder
    picked.foreach { name =>
      val fn = all.getOrElse(name, sys.error(s"unknown query $name"))
      spark.sparkContext.setJobDescription(name)
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          println(s"[benchextra] $name FAILED: ${e.getMessage}"); -1L }
        (System.nanoTime() - t0) / 1e9
      }
      plansTag.foreach { tag =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val dir = Paths.get("plans/r06")
        Files.createDirectories(dir)
        Files.write(dir.resolve(s"${name}_$tag.txt"),
          txt.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
          StandardOpenOption.WRITE)
      }
      val line = name + ": " +
        times.map(t => f"$t%.3f").mkString("[", ",", "]")
      println("[benchextra] " + line)
      out.append(line).append('\n')
    }
    println("[benchextra] done\n" + out)
    spark.stop()
  }
}
