package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, Quality, Similarity}

class R6dOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- multi-probe LSH

  test("multiProbeCandidates pairs exactly the bucket-Hamming<=1 vectors") {
    val embs = (1L to 40L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val buckets = Similarity.lshBucketed(embs, "vec_id", "embedding", 8, 64)
      .select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    val expect = (for {
      a <- buckets.keys; b <- buckets.keys if a < b
      if Integer.bitCount(buckets(a) ^ buckets(b)) <= 1
    } yield (a, b)).toSet
    val got = Similarity.multiProbeCandidates(embs, "vec_id", "embedding",
      8, 64).select("a_id", "b_id").as[(Long, Long)].collect()
    got.toSet shouldBe expect
    got.length shouldBe got.toSet.size // each pair exactly once
  }

  test("probe_dist is the bucket xor popcount") {
    val embs = (1L to 20L).map { i =>
      val rnd = new scala.util.Random(i + 7)
      (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    Similarity.multiProbeCandidates(embs, "vec_id", "embedding", 8, 64)
      .collect().foreach { r =>
        r.getAs[Int]("probe_dist") shouldBe Integer.bitCount(
          r.getAs[Int]("bucket_a") ^ r.getAs[Int]("bucket_b"))
        r.getAs[Int]("probe_dist") should be <= 1
      }
  }

  // -------------------------------------------- concentration profile

  test("gini and hhi match closed forms") {
    // group g: values 1,2,3,4 -> gini = 2*(1+4+9+16)-(5*10) / (4*10) = 0.25
    // hhi = (1+4+9+16)/100 = 0.30
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0),
      ("g", 4L, 4.0)).toDF("grp0", "id", "v")
    val row = Quality.concentrationProfile(df, col("grp0"), col("id"),
      col("v").cast("decimal(18,2)")).collect().head
    row.getAs[Long]("n") shouldBe 4L
    row.getAs[Double]("total") shouldBe 10.0
    row.getAs[Double]("gini") shouldBe 0.25 // dyadic -> exact at 2^-30
    // 0.30 is not dyadic: quantized to floor(0.30 * 2^30) / 2^30
    row.getAs[Double]("hhi") shouldBe (322122547.0 / 1073741824.0)
  }

  test("perfect equality gives gini 0 and hhi 1/n; monopoly gives hhi 1") {
    val eq = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0),
      ("a", 4L, 5.0), ("b", 9L, 7.0)).toDF("g", "id", "v")
    val got = Quality.concentrationProfile(eq, col("g"), col("id"),
        col("v").cast("decimal(18,2)"))
      .collect().map(r => r.getString(0) -> r).toMap
    got("a").getAs[Double]("gini") shouldBe 0.0
    got("a").getAs[Double]("hhi") shouldBe 0.25
    got("b").getAs[Double]("gini") shouldBe 0.0 // single entity
    got("b").getAs[Double]("hhi") shouldBe 1.0
  }

  test("zero-total group emits NULL metrics") {
    val df = Seq(("z", 1L, 0.0), ("z", 2L, 0.0)).toDF("g", "id", "v")
    val row = Quality.concentrationProfile(df, col("g"), col("id"),
      col("v").cast("decimal(18,2)")).collect().head
    row.isNullAt(row.fieldIndex("gini")) shouldBe true
    row.isNullAt(row.fieldIndex("hhi")) shouldBe true
  }

  // -------------------------------------------- lateness profile

  test("latenessProfile buckets against the per-key high-water mark") {
    val t0 = 1700000000000000L // µs
    val events = Seq(
      // user 1: in-order, then one 5s-late, then one 90s-late arrival
      (1L, 1L, t0), (2L, 1L, t0 + 10000000L),
      (3L, 1L, t0 + 5000000L),   // 5s behind hi=+10s
      (4L, 1L, t0 + 20000000L),
      (5L, 1L, t0 - 70000000L),  // 90s behind hi=+20s
      // user 2: strictly in order
      (6L, 2L, t0), (7L, 2L, t0 + 1000000L)
    ).toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = EventOps.latenessProfile(events, col("user_id"), col("ts"),
        col("event_id"))
      .select("bucket", "n_events").as[(String, Long)].collect().toMap
    got("on_time") shouldBe 5L
    got("within_10s") shouldBe 1L
    got("within_10m") shouldBe 1L
    got.values.sum shouldBe 7L
  }

  test("lateness shares sum to one") {
    val events = Seq((1L, 1L, 1000000L), (2L, 1L, 2000000L),
      (3L, 2L, 500000L)).toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val shares = EventOps.latenessProfile(events, col("user_id"),
      col("ts"), col("event_id")).select("share").as[Double].collect()
    shares.sum shouldBe 1.0 +- 1e-12
  }

  // -------------------------------------------- k-anonymity audit

  test("kAnonymityAudit flags combos under k") {
    val df = (Seq.fill(6)(("US", "A")) ++ Seq.fill(2)(("US", "B")) ++
      Seq.fill(5)(("DE", "A"))).toDF("country", "seg")
    val got = Quality.kAnonymityAudit(df,
        Seq(("country", col("country")), ("seg", col("seg"))), k = 5)
      .select("country", "seg", "n", "at_risk")
      .as[(String, String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    got(("US", "A")) shouldBe ((6L, false))
    got(("US", "B")) shouldBe ((2L, true))
    got(("DE", "A")) shouldBe ((5L, false))
  }
}
