package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink (SURVEY §2.1 extension beyond the reference's
  * CSV/xlsx): Spark's built-in `orc` datasource with the library's
  * defaults pinned — snappy compression and predicate pushdown left ON so
  * filters reach the ORC reader's row-group statistics, mirroring the
  * parquet posture (`PushedFilters` visible in `.explain`, proven in
  * OrcTablesSpec).
  *
  * Exists so a user choosing ORC for interchange (Hive estates, Trino
  * readers) gets the same scan-pruning behavior the parquet paths get —
  * not because ORC needs special code. Tables written here read back
  * byte-identical (round-trip spec).
  */
object OrcTables {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "snappy").orc(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
