package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Clusters

/** Durable-checkpoint parity for every iterative graph op: passing
  * `checkpointDir` must change ONLY the snapshot storage (reliable parquet
  * round-trips instead of `localCheckpoint`), never the result — and each
  * loop must prune its own intermediate rounds, keeping at most the
  * snapshots the returned plan still reads (Spark never deletes reliable
  * checkpoints on its own).
  */
class DurableCheckpointSpec extends SparkSpec {
  import spark.implicits._

  // shared fixture: two triangles bridged by a chain + a pendant — has
  // nontrivial cores, communities, hop distances, and truss support
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L),      // triangle A
    (3L, 4L), (4L, 5L),                // bridge chain
    (5L, 6L), (6L, 7L), (5L, 7L),      // triangle B
    (7L, 8L)                           // pendant
  ).toDF("a", "b")
  private val nodes = (1L to 8L).toDF("id")

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  /** Run `op` with None and with a fresh temp dir; assert identical rows
    * and that intermediate step dirs were pruned down to `maxKept`. */
  private def parity(name: String, maxKept: Int)(
      op: Option[String] => DataFrame): Unit = {
    val local = rows(op(None))
    val dir = java.nio.file.Files.createTempDirectory(s"graft_${name}_ckpt")
    val durable = rows(op(Some(dir.toString)))
    withClue(s"$name durable vs local: ") { durable shouldBe local }
    val runDirs = Option(dir.toFile.listFiles()).get
      .filter(f => f.isDirectory && f.getName.startsWith("run_"))
    runDirs.length shouldBe 1
    val stepDirs = Option(runDirs.head.listFiles()).get
      .filter(f => f.isDirectory && f.getName.startsWith("step_"))
    withClue(s"$name unpruned step dirs: ") {
      stepDirs.length should be <= maxKept
    }
  }

  test("connectedComponents: durable == local, rounds pruned (iterative path)") {
    // smallGraphMaxEdges = 0 forces the iterative loop — the union-find
    // fast path takes no snapshots at all, so it would vacuously pass
    parity("cc", maxKept = 2) { ckpt =>
      Clusters.connectedComponents(nodes, "id",
        edges.select(col("a").as("a_id"), col("b").as("b_id")),
        "a_id", "b_id", checkpointDir = ckpt, smallGraphMaxEdges = 0L)
    }
  }

  test("pageRankInt: durable == local, rounds pruned") {
    // returned plan reads the final ranks snapshot only
    parity("pagerank", maxKept = 1) { ckpt =>
      Clusters.pageRankInt(edges, "a", "b", iters = 3, checkpointDir = ckpt)
    }
  }

  test("kCore: durable == local, rounds pruned") {
    parity("kcore", maxKept = 1) { ckpt =>
      Clusters.kCore(edges, "a", "b", k = 2, checkpointDir = ckpt)
    }
  }

  test("labelPropagation: durable == local, rounds pruned") {
    // returned plan reads the final labels snapshot twice (labels + sizes);
    // the symmetric edge snapshot is prunable only after the last round
    parity("lpa", maxKept = 2) { ckpt =>
      Clusters.labelPropagation(nodes, "id", edges, "a", "b", rounds = 3,
        checkpointDir = ckpt)
    }
  }

  test("graphVoronoi: durable == local, rounds pruned") {
    parity("voronoi", maxKept = 1) { ckpt =>
      Clusters.graphVoronoi(nodes, "id", col("id") === 1L || col("id") === 6L,
        edges, "a", "b", maxHops = 4, checkpointDir = ckpt)
    }
  }

  test("kTruss: durable == local, rounds pruned") {
    parity("ktruss", maxKept = 1) { ckpt =>
      Clusters.kTruss(edges, "a", "b", k = 3, rounds = 2,
        checkpointDir = ckpt)
    }
  }

  test("kTruss with degree cap: durable == local, rounds pruned") {
    parity("ktruss_cap", maxKept = 1) { ckpt =>
      Clusters.kTruss(edges, "a", "b", k = 3, rounds = 2,
        maxDegree = Some(3), checkpointDir = ckpt)
    }
  }

  test("bfsHops: durable == local, rounds pruned") {
    parity("bfs", maxKept = 1) { ckpt =>
      Clusters.bfsHops(nodes, "id", col("id") === 1L, edges, "a", "b",
        maxHops = 3, checkpointDir = ckpt)
    }
  }
}
