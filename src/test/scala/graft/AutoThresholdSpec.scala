package graft

import graft.operators.NearDup

class AutoThresholdSpec extends SparkSpec {
  import spark.implicits._

  // corpus with a clear bimodal structure: near-identical pairs (high
  // sim) and partially-overlapping pairs (low sim)
  private def bimodal = {
    val dups = (1 to 20).flatMap { i =>
      val base = s"a$i b$i c$i d$i e$i f$i g$i h$i"
      Seq((i * 2L, base), (i * 2L + 1, base + s" x$i"))
    }
    val near = (100 to 119).flatMap { i =>
      Seq((i * 2L, s"p$i q$i r$i s$i t$i u$i v$i w$i"),
        (i * 2L + 1, s"p$i q$i r$i z1$i z2$i z3$i z4$i z5$i"))
    }
    (dups ++ near).toDF("doc_id", "text")
  }

  test("the valley lands between the near-miss and duplicate modes") {
    val got = NearDup.autoThreshold(bimodal, "doc_id", "text", minSim = 0.0).collect()
    got.length shouldBe 1
    val r = got.head
    r.getAs[Int]("low_mode_bin") should be < r.getAs[Int]("valley_bin")
    r.getAs[Int]("valley_bin") should be <= r.getAs[Int]("high_mode_bin")
    val t = r.getAs[Double]("threshold")
    t should be > 0.05
    t should be < 1.0
  }

  test("a unimodal (all-high) corpus yields no cut") {
    val dupsOnly = (1 to 10).flatMap { i =>
      val base = s"a$i b$i c$i d$i e$i f$i g$i h$i"
      Seq((i * 2L, base), (i * 2L + 1, base + s" x$i"))
    }.toDF("doc_id", "text")
    NearDup.autoThreshold(dupsOnly, "doc_id", "text", minSim = 0.0).count() shouldBe 0L
  }
}
