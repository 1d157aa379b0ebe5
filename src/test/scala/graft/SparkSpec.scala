package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** One SparkSession for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  /** Rows of a 1-column DF as a sorted list of strings (order-free compare). */
  def col1[T](df: DataFrame): Seq[String] =
    df.collect().map(r => String.valueOf(r.get(0))).toSeq.sorted

  /** Set confs for the block, restoring the PRIOR session values (not
    * the defaults — conf.unset would lose a value the session had set). */
  def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  def rowsAsStrings(df: DataFrame): Seq[String] =
    df.collect()
      .map(_.toSeq.map(String.valueOf).mkString(""))
      .toSeq
      .sorted
}
