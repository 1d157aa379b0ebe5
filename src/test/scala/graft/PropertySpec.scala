package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.{Clusters, Corpus, Dedup, Scd2, Windows}

/** Property-based invariants (SURVEY §5.2.4), plain ScalaCheck `Properties`
  * (runs under sbt's native ScalaCheck framework; no scalatestplus bridge in
  * the offline cache). Few rounds — each property round-trips through Spark. */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withMaxSize(30)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, Int, Int)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.choose(0, 5)
      pref <- Gen.choose(0, 100)
      v <- Gen.choose(0, 1000)
    } yield (k, pref, v))

  property("dedup keeps exactly one row per key, the max-preference one") =
    Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "pref", "v")
      val out = Dedup.keepFirst(df, Seq("k"),
        Seq(col("pref").desc, col("v").desc)).collect()
      val expected = rows.groupBy(_._1).map { case (k, g) => k -> g.max }
      out.length == expected.size && out.forall { r =>
        (r.getInt(0), r.getInt(1), r.getInt(2)) == expected(r.getInt(0))
      }
    }

  property("rolling ROWS sum equals brute-force recomputation") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-100, 100))) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => ("g", i, v.toLong) }
        .toDF("g", "seq", "v")
      val out = Windows.rollingSum(df, Seq(col("g")), Seq(col("seq")),
          col("v"), 7, "roll")
        .orderBy("seq").select("roll").as[Long].collect().toSeq
      val brute = vs.indices.map(i => vs.slice((i - 6).max(0), i + 1).map(_.toLong).sum)
      out == brute
    }

  private val snapGen: Gen[List[(Int, String)]] = Gen.listOf(for {
    k <- Gen.choose(0, 8)
    attr <- Gen.oneOf("A", "B", "C")
  } yield (k, attr)).map(_.distinctBy(_._1))

  property("SCD2 invariants hold across a random merge chain") =
    Prop.forAll(snapGen.suchThat(_.nonEmpty), snapGen, snapGen) { (s0, s1, s2) =>
      val tracked = Seq("attr")
      val d0 = Scd2.initialLoad(s0.toDF("key", "attr"), tracked)
      val d1 = Scd2.merge(d0, s1.toDF("key", "attr"), Seq("key"), tracked,
        "2024-01-01")
      val d2 = Scd2.merge(d1, s2.toDF("key", "attr"), Seq("key"), tracked,
        "2024-02-01")

      val atMostOneCurrent = d2.filter(col("is_current")).groupBy("key").count()
        .filter(col("count") > 1).count() == 0
      val seen = (s0 ++ s1 ++ s2).map(_._1).toSet
      val everyKeyCurrent = d2.filter(col("is_current"))
        .select("key").as[Int].collect().toSet == seen
      val noOpenHistory = d2.filter(!col("is_current") &&
        col("effective_to") === to_date(lit(Scd2.OpenEnd))).count() == 0

      atMostOneCurrent && everyKeyCurrent && noOpenHistory
    }

  private val tokCountsGen: Gen[List[Int]] =
    Gen.nonEmptyListOf(Gen.choose(1, 200))

  property("packSequences conserves tokens and packs contiguously") =
    Prop.forAll(tokCountsGen) { ns =>
      val docs = ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }
        .toDF("id", "n")
      val out = Corpus.packSequences(docs, "id", shard = lit(0),
          tokenCount = col("n"), budget = 100)
        .orderBy("doc_id")
        .select("n_tok", "start_offset", "bin", "bin_offset")
        .as[(Long, Long, Long, Long)].collect().toList
      // conservation: offsets are the exclusive prefix sums of token counts
      val prefix = ns.map(_.toLong).scanLeft(0L)(_ + _).init
      val offsetsOk = out.map(_._2) == prefix
      // bin/bin_offset are exactly start div/mod budget
      val binsOk = out.forall { case (_, s, b, o) => b == s / 100 && o == s % 100 }
      offsetsOk && binsOk
    }

  private val edgesGen: Gen[List[(Long, Long)]] = Gen.listOf(for {
    a <- Gen.choose(0L, 15L)
    b <- Gen.choose(0L, 15L) if a != b
  } yield (a, b))

  property("connectedComponents matches a driver-side union-find") =
    Prop.forAll(edgesGen) { edges =>
      val verts = (0L to 15L).toList
      val parent = scala.collection.mutable.Map(verts.map(v => v -> v): _*)
      def find(v: Long): Long =
        if (parent(v) == v) v else { val r = find(parent(v)); parent(v) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
      }
      val expected = verts.groupBy(find).flatMap { case (_, vs) =>
        val m = vs.min; vs.map(_ -> m)
      }
      val got = Clusters.connectedComponents(verts.toDF("id"), "id",
          edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      got == expected
    }
}
