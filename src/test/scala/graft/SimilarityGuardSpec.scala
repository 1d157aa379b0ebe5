package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The brute-force similarity paths driver-broadcast one side; their
  * "must be small" contract is enforced by a fail-fast row-cap guard
  * (conf spark.graft.similarity.maxBroadcastRows). These tests prove an
  * oversized side throws BEFORE any broadcast is constructed, that the
  * candidates path is exempt (it never broadcasts the corpus), and that
  * under-cap behavior is unchanged. */
class SimilarityGuardSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embeddings = (0 until 40)
    .map(i => (i.toLong, Array.tabulate(8)(d => (((i * 31 + d * 7) % 13) - 6).toFloat)))
    .toDF("vec_id", "emb")

  private def withCap[T](cap: Long)(body: => T): T = {
    spark.conf.set(Similarity.MaxBroadcastRowsKey, cap.toString)
    try body
    finally spark.conf.unset(Similarity.MaxBroadcastRowsKey)
  }

  test("cosineTopK fails fast when the query side exceeds the cap") {
    withCap(10) {
      val e = intercept[IllegalArgumentException] {
        // predicate matches 20 rows > cap 10; must throw at call time,
        // before the crossJoin/broadcast plan is even built
        Similarity.cosineTopK(embeddings, "vec_id", "emb",
          col("vec_id") < 20, k = 3)
      }
      e.getMessage should include(Similarity.MaxBroadcastRowsKey)
      e.getMessage should include("ivfTopK")
    }
  }

  test("quantizedCosineTopK fails fast when the query side exceeds the cap") {
    withCap(10) {
      intercept[IllegalArgumentException] {
        Similarity.quantizedCosineTopK(embeddings, "vec_id", "emb",
          col("vec_id") < 20, k = 3)
      }
    }
  }

  test("cosineNearDupPairs without candidates refuses an over-cap corpus; " +
    "the candidates path is exempt") {
    withCap(10) {
      val e = intercept[IllegalArgumentException] {
        Similarity.cosineNearDupPairs(embeddings, "vec_id", "emb",
          threshold = 0.9, candidates = None)
      }
      e.getMessage should include("candidates")
      // with explicit candidate pairs nothing is broadcast wholesale:
      // the same over-cap corpus is fine
      val cand = Seq((0L, 1L), (2L, 3L)).toDF("a_id", "b_id")
      Similarity.cosineNearDupPairs(embeddings, "vec_id", "emb",
        threshold = -1.0, candidates = Some(cand)).count() shouldBe 2L
    }
  }

  test("under-cap queries pass the guard and return the same results") {
    val unguarded = Similarity.cosineTopK(embeddings, "vec_id", "emb",
      col("vec_id") < 5, k = 3).collect().map(_.toSeq).toSet
    withCap(10) {
      val guarded = Similarity.cosineTopK(embeddings, "vec_id", "emb",
        col("vec_id") < 5, k = 3).collect().map(_.toSeq).toSet
      guarded shouldBe unguarded
      guarded.size shouldBe 15 // 5 queries x top-3
    }
  }
}
