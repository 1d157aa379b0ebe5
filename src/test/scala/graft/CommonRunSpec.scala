package graft

import graft.operators.NearDup

class CommonRunSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq((1L, 2L)).toDF("a_id", "b_id")

  test("a lifted contiguous passage yields one long run") {
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh"),
      (2L, "xx yy aa bb cc dd ee zz")).toDF("doc_id", "text")
    val got = NearDup.commonRunLengths(docs, "doc_id", "text", pairs)
      .collect().head
    // shared token run "aa bb cc dd ee" = 5 tokens = 3 tri-shingles
    got.getAs[Long]("max_run") shouldBe 3L
    got.getAs[Long]("n_matches") shouldBe 3L
  }

  test("scattered shared phrases yield short runs despite many matches") {
    val docs = Seq(
      (1L, "aa bb cc p1 dd ee ff p2 gg hh ii"),
      (2L, "aa bb cc q1 dd ee ff q2 gg hh ii")).toDF("doc_id", "text")
    val got = NearDup.commonRunLengths(docs, "doc_id", "text", pairs)
      .collect().head
    got.getAs[Long]("max_run") shouldBe 1L // 3-token islands = 1 shingle
    got.getAs[Long]("n_matches") shouldBe 3L
  }

  test("offset does not matter: runs live on diagonals") {
    val docs = Seq(
      (1L, "aa bb cc dd"),
      (2L, "z1 z2 z3 z4 z5 aa bb cc dd")).toDF("doc_id", "text")
    NearDup.commonRunLengths(docs, "doc_id", "text", pairs)
      .collect().head.getAs[Long]("max_run") shouldBe 2L
  }

  test("disjoint docs are absent from the output") {
    val docs = Seq(
      (1L, "aa bb cc dd"), (2L, "ww xx yy zz")).toDF("doc_id", "text")
    NearDup.commonRunLengths(docs, "doc_id", "text", pairs)
      .count() shouldBe 0L
  }

  test("repeated shingles inside a doc do not merge distinct runs") {
    // "aa bb cc" appears twice in doc 1: two diagonals, two runs
    val docs = Seq(
      (1L, "aa bb cc zz aa bb cc"),
      (2L, "aa bb cc")).toDF("doc_id", "text")
    val got = NearDup.commonRunLengths(docs, "doc_id", "text", pairs)
      .collect().head
    got.getAs[Long]("max_run") shouldBe 1L // each occurrence: 1 shingle
    got.getAs[Long]("n_matches") shouldBe 2L
  }
}
