package graft

import org.apache.spark.sql.functions._

import graft.operators.Dims

class DimsSpec extends SparkSpec {
  import spark.implicits._

  test("buildDim: dense deterministic surrogate keys over distinct keys") {
    val src = Seq("b", "a", "b", "c").toDF("nk")
    val dim = Dims.buildDim(src, Seq("nk"), "k")
    dim.orderBy("k").select("nk", "k").as[(String, Long)].collect().toSeq shouldBe
      Seq(("a", 1L), ("b", 2L), ("c", 3L))
  }

  test("buildDim dispatches to the distributed numbering above the " +
    "single-task key threshold") {
    val src = Tables.customer(spark, "/root/testdata/sf0.001")
      .select($"c_name".as("nk"))
    val small = Dims.buildDim(src, Seq("nk"), "k") // default cap: windowed
    spark.conf.set(Dims.MaxSingleTaskKeysKey, "10")
    try {
      val dispatched = Dims.buildDim(src, Seq("nk"), "k")
      // above the cap there must be no global (empty-partitionBy) window
      // in the plan — the distributed numbering already executed it away
      dispatched.queryExecution.executedPlan.toString should
        not include "windowspecdefinition(nk"
      // and the output is identical to the single-task path
      dispatched.count() shouldBe small.count()
      small.except(dispatched).count() shouldBe 0
      dispatched.except(small).count() shouldBe 0
    } finally spark.conf.unset(Dims.MaxSingleTaskKeysKey)
  }

  test("insertOnlyMerge: existing keys stable, new keys appended past max") {
    val existing = Dims.buildDim(Seq("a", "b").toDF("nk"), Seq("nk"), "k")
    val merged = Dims.insertOnlyMerge(existing,
      Seq("b", "c", "d").toDF("nk"), Seq("nk"), "k")
    merged.orderBy("k").select("nk", "k").as[(String, Long)].collect().toSeq shouldBe
      Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L))
  }

  test("buildDimDistributed: identical keys to buildDim, no global window") {
    val src = Tables.customer(spark, "/root/testdata/sf0.001")
      .select($"c_name".as("nk"))
    val global = Dims.buildDim(src, Seq("nk"), "k")
    val dist = Dims.buildDimDistributed(src, Seq("nk"), "k", partitions = 4)
    dist.count() shouldBe global.count()
    global.except(dist).count() shouldBe 0
    dist.except(global).count() shouldBe 0
    // keys are dense 1..n
    dist.agg(min($"k"), max($"k")).as[(Long, Long)].head() shouldBe
      ((1L, global.count()))
    // and the plan has no empty-partitionBy window
    val plan = Dims.buildDimDistributed(src, Seq("nk"), "k", partitions = 4)
      .queryExecution.executedPlan.toString
    plan should not include "windowspecdefinition(nk"
  }

  test("insertOnlyMergeDistributed == insertOnlyMerge, no global window") {
    val all = Tables.customer(spark, "/root/testdata/sf0.001")
      .select($"c_name".as("nk"))
    // deterministic "prior" slice (limit() could pick different rows per
    // evaluation of the lazy plans below); localCheckpoint freezes the
    // buildDim window OUT of the merged plan so the no-window assertion
    // below covers only the merge machinery
    val existing = Dims.buildDim(all.filter($"nk" < "Customer#000000800"),
      Seq("nk"), "k").localCheckpoint()
    val windowed = Dims.insertOnlyMerge(existing, all, Seq("nk"), "k")
    val dist = Dims.insertOnlyMergeDistributed(existing, all, Seq("nk"), "k",
      partitions = 4)
    dist.count() shouldBe windowed.count()
    windowed.except(dist).count() shouldBe 0
    dist.except(windowed).count() shouldBe 0
    val plan = Dims.insertOnlyMergeDistributed(existing, all, Seq("nk"), "k",
      partitions = 4).queryExecution.executedPlan.toString
    plan should not include "windowspecdefinition(nk"
  }

  test("insertOnlyMerge is idempotent when nothing is new") {
    val existing = Dims.buildDim(Seq("a", "b").toDF("nk"), Seq("nk"), "k")
    val merged = Dims.insertOnlyMerge(existing, Seq("a", "b").toDF("nk"),
      Seq("nk"), "k")
    merged.count() shouldBe 2
  }

  test("insertOnlyMerge is idempotent for natural keys containing NULL") {
    // a plain anti-join never matches NULL keys, so a nullable-key dim row
    // (e.g. geography with empty postal code) would gain a fresh surrogate
    // key on every run; the null-safe join must keep it stable
    val incoming = Seq(("x", Some("1")), ("y", None), ("y", None))
      .toDF("city", "postal")
    val existing = Dims.buildDim(incoming, Seq("city", "postal"), "k")
      .localCheckpoint()
    val run2 = Dims.insertOnlyMerge(existing, incoming,
      Seq("city", "postal"), "k")
    run2.count() shouldBe 2
    run2.except(existing).count() shouldBe 0
    val run2d = Dims.insertOnlyMergeDistributed(existing, incoming,
      Seq("city", "postal"), "k", partitions = 2)
    run2d.count() shouldBe 2
    run2d.except(existing).count() shouldBe 0
  }

  test("dotted natural-key column names work end-to-end (quoted, not " +
    "parsed as struct-field paths)") {
    // "addr.city" is a legal flat column name; unquoted col() would try
    // to resolve it as struct field `city` inside column `addr` and throw
    val incoming = Seq(("x", "1"), ("y", "2"))
      .toDF("addr.city", "geo.postal")
    val dim = Dims.buildDim(incoming, Seq("addr.city", "geo.postal"), "k")
    dim.count() shouldBe 2
    val existing = dim.localCheckpoint()
    val withNew = Seq(("x", "1"), ("z", "3")).toDF("addr.city", "geo.postal")
    val run2 = Dims.insertOnlyMerge(existing, withNew,
      Seq("addr.city", "geo.postal"), "k")
    run2.count() shouldBe 3
    run2.except(existing).count() shouldBe 1 // only z is new
    val run2d = Dims.insertOnlyMergeDistributed(existing, withNew,
      Seq("addr.city", "geo.postal"), "k", partitions = 2)
    run2d.select("k").except(run2.select("k")).count() shouldBe 0
  }

  test("broadcastIfSmall: hint below the cap, planner's choice above it, " +
    "identical join output either side") {
    val dim = Tables.customer(spark, "/root/testdata/sf0.001")
      .select($"c_custkey".as("k"), $"c_name".as("name"))
    val fact = Tables.orders(spark, "/root/testdata/sf0.001")
      .select($"o_custkey".as("k"), $"o_totalprice")
    // disable BOTH auto-broadcast thresholds so the over-cap assert is
    // deterministic (the planner would otherwise broadcast the small dim
    // on its own size estimate); restore prior values, never unset
    val prevA = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevB = spark.conf
      .getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      // under the cap: the hint forces a broadcast join even with the
      // size-based thresholds off
      val hinted = fact.join(Dims.broadcastIfSmall(dim), Seq("k"))
      hinted.queryExecution.executedPlan.toString should
        include("BroadcastExchange")
      // over the cap: NO BroadcastExchange on the dim side — the planner
      // falls back to its own (sort-merge) choice
      spark.conf.set(Dims.MaxBroadcastDimRowsKey, "10")
      val unhinted = fact.join(Dims.broadcastIfSmall(dim), Seq("k"))
      unhinted.queryExecution.executedPlan.toString should
        not include "BroadcastExchange"
      // output identical both sides of the cap
      hinted.count() shouldBe unhinted.count()
      hinted.except(unhinted).count() shouldBe 0
      unhinted.except(hinted).count() shouldBe 0
    } finally {
      spark.conf.unset(Dims.MaxBroadcastDimRowsKey)
      prevA.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      prevB.fold(spark.conf.unset(
        "spark.sql.adaptive.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
    }
  }

  test("star-schema fact is identical whether its dims broadcast or not " +
    "(guarded hint both sides of the cap)") {
    val csv = "/root/reference/Project1/superstore.csv"
    assume(new java.io.File(csv).exists())
    val below = graft.superstore.Pipeline.run(spark, csv).fact
      .localCheckpoint()
    spark.conf.set(Dims.MaxBroadcastDimRowsKey, "10") // every dim exceeds
    try {
      val above = graft.superstore.Pipeline.run(spark, csv).fact
      above.count() shouldBe below.count()
      above.except(below).count() shouldBe 0
      below.except(above).count() shouldBe 0
    } finally spark.conf.unset(Dims.MaxBroadcastDimRowsKey)
  }
}
