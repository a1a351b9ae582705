package graft.tools
import org.apache.spark.sql.SparkSession
object TimeNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    // warmup pass (codegen + JIT), then measure
    for (pass <- 0 to 1; q <- Seq("q59_compaction", "q62_hull_simplify",
        "q63_per_key_sample", "q64_sessionize", "q65_vocab", "q66_asof_join",
        "q67_hll_sketch", "q68_cms_sketch",
        "q69_distance", "q70_intersects")) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sf).count()
      if (pass == 1)
        println(f"$q%-22s ${(System.nanoTime()-t0)/1e9}%7.2f s  ($n rows)")
    }
    spark.stop()
  }
}
