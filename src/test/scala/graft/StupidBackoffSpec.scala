package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** Stupid Backoff trigram scoring: every backoff level verified against
  * hand-computed scores on a corpus small enough to count by eye. */
class StupidBackoffSpec extends SparkSpec {
  import spark.implicits._

  // model: "a b c a b c" -> unigrams a:2 b:2 c:2 (N=6);
  // bigrams "a b":2 "b c":2 "c a":1; trigrams "a b c":2 "b c a":1 "c a b":1
  private val model = Seq((0L, "a b c a b c")).toDF("id", "text")
  private val alpha = 0.4

  private def score(evalText: String) =
    Corpus.stupidBackoffScore(
      eval = Seq((1L, evalText)).toDF("id", "text"),
      model = model, idCol = "id", textCol = "text", alpha = alpha)
      .collect().head

  private def grid(lnS: Double): Double =
    math.floor(lnS * 1073741824.0) / 1073741824.0

  test("seen trigram scores c3/c2(prefix), level 0") {
    val r = score("a b c")
    r.getAs[Long]("n_transitions") shouldBe 1L
    r.getAs[Long]("n_seen") shouldBe 1L
    // S(c | a b) = c3("a b c") / c2("a b") = 2/2 = 1 -> 0 nats
    r.getAs[Double]("sb_nats") shouldBe -grid(math.log(1.0))
  }

  test("unseen trigram with seen suffix bigram backs off once") {
    // "c a" seen? trigram "b a b" unseen; suffix bigram "a b" seen (2),
    // c1(a) = 2 -> S = alpha * 2/2
    val r = score("b a b")
    r.getAs[Long]("n_bo1") shouldBe 1L
    r.getAs[Double]("sb_nats") shouldBe -grid(math.log((alpha * 2.0) / 2.0))
  }

  test("unseen bigram with seen last unigram backs off twice") {
    // trigram "a a c" unseen, bigram "a c" unseen, c1(c)=2, N=6
    val r = score("a a c")
    r.getAs[Long]("n_bo2") shouldBe 1L
    r.getAs[Double]("sb_nats") shouldBe
      -grid(math.log((alpha * alpha * 2.0) / 6.0))
  }

  test("OOV last word takes the alpha^3/N floor") {
    val r = score("a b z")
    r.getAs[Long]("n_oov") shouldBe 1L
    r.getAs[Double]("sb_nats") shouldBe
      -grid(math.log(alpha * alpha * alpha / 6.0))
  }

  test("multi-transition doc averages the per-transition grid values") {
    // "a b c a" -> trigrams "a b c" (level 0, ln 1), "b c a"
    // (seen, c3=1 / c2("b c")=2 -> ln 0.5)
    val r = score("a b c a")
    r.getAs[Long]("n_transitions") shouldBe 2L
    r.getAs[Long]("n_seen") shouldBe 2L
    val expected = -(grid(math.log(1.0)) + grid(math.log(0.5))) / 2.0
    r.getAs[Double]("sb_nats") shouldBe expected
  }

  test("docs under 3 tokens emit nothing; self-scoring never backs off") {
    Corpus.stupidBackoffScore(Seq((1L, "a b")).toDF("id", "text"),
      model, "id", "text").count() shouldBe 0L
    val self = Corpus.stupidBackoffScore(model, model, "id", "text")
      .collect().head
    self.getAs[Long]("n_seen") shouldBe self.getAs[Long]("n_transitions")
  }
}
