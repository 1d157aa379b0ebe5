package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for selected registry queries to files —
  * the plan evidence the optimization rounds commit under `plans/rNN/`.
  *
  * Usage: `runMain graft.PlanDump <outDir> <q1,q2,...> [suffix]`
  * Writes `<outDir>/<queryName>_<suffix>.txt` (suffix defaults to
  * "plan"). Reads the data dir from SPARK_GRAFT_SF_DIR and cores from
  * SPARK_GRAFT_CPUS — the bench's environment contract, so the dumped
  * plan is the one the bench actually runs. Queries whose body REQUIREs
  * side effects still execute them (the plan of the RETURNED frame is
  * what is captured). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <q1,q2,...> [suffix]")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val prefixes = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val suffix = if (args.length > 2) args(2) else "plan"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plandump] wrote $name")
        } catch { case t: Throwable =>
          println(s"[plandump] $name failed: $t")
        }
      }
    spark.stop()
  }
}
