package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support for repeated co-located joins (the prompt's
  * "bucketing for co-located joins"): write both sides bucketed by the join
  * key and subsequent equi-joins on that key plan with **zero Exchange** on
  * either side — at 100 TB this converts every recurring join/agg on the
  * key into a shuffle-free map-side operation, paying the shuffle once at
  * write time. */
object Bucketed {

  /** Save as a bucketed+sorted managed table (in-memory catalog + local
    * warehouse in this sandbox; identical API against a real metastore). */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    buckets: Int): Unit = {
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two tables bucketed on the same key: no shuffle either side. */
  def cologicalJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    keyCol: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keyCol)
}
