package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** The co-located assignment layout (`coLocate = true`): the SemDeDup
  * blocking key (centroid_id) IS the identity partition key, so the
  * within-bucket self-join plans storage-partitioned — zero shuffle of
  * the assignment table — while every maintenance operation
  * (appendBatch replay, drift, retrain) keeps its contract. */
class IvfBucketedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cat = {
    val r = java.nio.file.Files.createTempDirectory("graft_ivfb").toString
    spark.conf.set("spark.sql.catalog.graft_ivfb",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ivfb.root", r)
    "graft_ivfb"
  }

  private val sf = "/root/testdata/sf0.001"
  private def available = new java.io.File(s"$sf/embeddings.parquet").exists()
  private def embs = spark.read.parquet(s"$sf/embeddings.parquet")

  /** Shuffles beneath each non-broadcast join (AQE-aware) — the
    * co-location proof inspects join inputs, not the whole plan. */
  private def joinShuffles(df: DataFrame): Seq[Int] = {
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    def below(p: SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      self + unwrap(p).map(below).sum
    }
    def joins(p: SparkPlan): Seq[BaseJoinExec] = p match {
      case j: BaseJoinExec => Seq(j)
      case other => unwrap(other).flatMap(joins)
    }
    joins(df.queryExecution.executedPlan)
      .filterNot(_.isInstanceOf[BroadcastHashJoinExec])
      .map(j => j.children.map(below).sum)
  }

  test("co-located assignment: identical semantic-dup pairs, and the " +
      "within-bucket self-join plans ZERO shuffles beneath it") {
    assume(available)
    cat
    val base = embs.filter(col("vec_id") % 10 < 8)
    val fresh = embs.filter(col("vec_id") % 10 >= 8)
    IvfIndex.build(spark, cat, "ns", "dflt", base, "vec_id", "embedding",
      k = 8)
    IvfIndex.assignBatch(spark, cat, "ns", "dflt", fresh, "vec_id",
      "embedding", "b1")
    IvfIndex.build(spark, cat, "ns", "colo", base, "vec_id", "embedding",
      k = 8, coLocate = true)
    IvfIndex.assignBatch(spark, cat, "ns", "colo", fresh, "vec_id",
      "embedding", "b1")
    IvfIndex.isCoLocated(spark, cat, "ns", "colo") shouldBe true
    IvfIndex.isCoLocated(spark, cat, "ns", "dflt") shouldBe false
    // layout on disk: centroid_id value dirs
    val root = spark.conf.get(s"spark.sql.catalog.$cat.root")
    val dirs = new java.io.File(s"$root/ns/colo_assign").listFiles()
      .filter(_.isDirectory).map(_.getName).filterNot(_.startsWith("_"))
    all(dirs.toSeq) should startWith("centroid_id=")

    def pairsOf(df: DataFrame) = df.select("a_id", "b_id", "centroid_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val colo = IvfIndex.semanticDupPairs(spark, cat, "ns", "colo",
        embs, "vec_id", "embedding", minCosine = 0.9)
      val dflt = IvfIndex.semanticDupPairs(spark, cat, "ns", "dflt",
        embs, "vec_id", "embedding", minCosine = 0.9)
      pairsOf(colo) shouldBe pairsOf(dflt)
      // the assignment self-join: no exchange under either input (the
      // id-joins back to the embeddings legitimately shuffle above it)
      val js = joinShuffles(
        IvfIndex.assignment(spark, cat, "ns", "colo")
          .select(col("vec_id"), col("centroid_id")).as("x")
          .join(IvfIndex.assignment(spark, cat, "ns", "colo")
            .select(col("vec_id"), col("centroid_id")).as("y"),
            col("x.centroid_id") === col("y.centroid_id") &&
              col("x.vec_id") < col("y.vec_id")))
      js should not be empty
      all(js) shouldBe 0
    }
  }

  test("co-located maintenance: replay converges, retrain re-partitions " +
      "under the new centroids and drops absorbed batches") {
    assume(available)
    cat
    val base = embs.filter(col("vec_id") % 10 < 8)
    val fresh = embs.filter(col("vec_id") % 10 >= 8)
    IvfIndex.build(spark, cat, "ns", "m", base, "vec_id", "embedding",
      k = 4, coLocate = true)
    IvfIndex.assignBatch(spark, cat, "ns", "m", fresh, "vec_id",
      "embedding", "b1")
    val before = IvfIndex.assignment(spark, cat, "ns", "m")
      .collect().map(_.toString).sorted.toSeq
    IvfIndex.assignBatch(spark, cat, "ns", "m", fresh, "vec_id",
      "embedding", "b1") // re-delivery
    IvfIndex.assignment(spark, cat, "ns", "m")
      .collect().map(_.toString).sorted.toSeq shouldBe before
    // retrain on the full corpus: every row re-lands under baseBatch,
    // the absorbed batch's rows are deleted
    IvfIndex.retrain(spark, cat, "ns", "m", embs, "vec_id", "embedding",
      k = 8)
    val asg = IvfIndex.assignment(spark, cat, "ns", "m")
    asg.filter(col("batch") =!= "base").count() shouldBe 0
    asg.count() shouldBe embs.count()
    // post-retrain the served top-k equals the in-memory IVF twin
    val served = IvfIndex.topK(spark, cat, "ns", "m", embs, "vec_id",
      "embedding", col("vec_id") < 5, k = 3, nprobe = 2)
    val twin = graft.operators.Similarity.ivfTopK(embs, "vec_id",
        "embedding", col("vec_id") < 5,
        graft.operators.Similarity.ivfCentroids(embs, "vec_id",
          "embedding", 8), k = 3, nprobe = 2)
      .select(col("q_id").cast("string").as("q_id"),
        col("n_id").cast("string").as("n_id"), col("cosine"), col("rank"))
    served.exceptAll(twin).count() shouldBe 0
    twin.exceptAll(served).count() shouldBe 0
  }

  test("a reader racing batch replays only ever sees committed " +
      "assignment states (snapshot-pinned serves)") {
    assume(available)
    cat
    val base = embs.filter(col("vec_id") % 10 < 8)
    val freshA = embs.filter(col("vec_id") % 10 === 8)
    val freshB = embs.filter(col("vec_id") % 10 === 9)
    IvfIndex.build(spark, cat, "ns", "race", base, "vec_id", "embedding",
      k = 8, coLocate = true)
    def land(v: org.apache.spark.sql.DataFrame): Unit =
      IvfIndex.assignBatch(spark, cat, "ns", "race", v, "vec_id",
        "embedding", "b1")
    def ids(): Set[String] = IvfIndex.driftReport(spark, cat, "ns",
      "race").collect() // any pinned serve works; use the cheap one
      .map(_.toString).toSet // not compared — forces the pinned read
    land(freshA)
    val nA = IvfIndex.semanticDupPairs(spark, cat, "ns", "race", embs,
      "vec_id", "embedding", -1.0).count()
    land(freshB) // REVISED batch content replaces, never appends
    val nB = IvfIndex.semanticDupPairs(spark, cat, "ns", "race", embs,
      "vec_id", "embedding", -1.0).count()
    nA should not be nB
    val torn = new java.util.concurrent.atomic.AtomicReference[String](null)
    // FINITE paced storm: the contract under test is CONSISTENCY (a
    // read returns a committed state or fails loudly, never a torn
    // one) — a writer replaying continuously at land-latency rate
    // legitimately starves pinned readers (every scan's files retire
    // mid-read; each failure is loud), which is a different property.
    // Six paced lands give reads real overlap windows; once the storm
    // ends, reads deterministically succeed, so the success target is
    // load-independent.
    val writer = new Thread(() => {
      try (0 until 6).foreach { i =>
        land(if (i % 2 == 0) freshA else freshB)
        Thread.sleep(1000)
      } catch { case t: Throwable =>
        torn.compareAndSet(null, s"writer failed: $t") }
    })
    writer.start()
    var ok = 0
    var attempts = 0
    while (ok < 6 && attempts < 300) {
      attempts += 1
      try {
        val n = IvfIndex.semanticDupPairs(spark, cat, "ns", "race", embs,
          "vec_id", "embedding", -1.0).count()
        if (n != nA && n != nB)
          torn.compareAndSet(null, s"torn read: $n pairs (not $nA/$nB)")
        ids() // exercise the pinned monitoring serve under the storm too
        ok += 1
      } catch { case scala.util.control.NonFatal(_) => () } // loud retry
    }
    writer.join(120000)
    torn.get() shouldBe null
    ok shouldBe 6
  }
}
