package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.sources.QuirkCsvVersions

/** MODEL-BASED randomized check of snapshot resolution: a seeded random
  * mutation history (adds, retires, replace-in-place via retiredAliases)
  * runs against the REAL commit path while a trivial in-memory model
  * tracks the expected (name -> bytes) state per version; afterwards
  * EVERY version's snapshotListing must reproduce the model's file set
  * byte-for-byte, and vacuum must cut history at exactly the pinned
  * horizon. Hand-written specs pin the known interesting cases; this one
  * sweeps the composition space (retire-then-re-add, multi-replace of
  * one name, interleaved lineages) that hand cases miss. */
class QuirkCsvVersionModelSpec extends SparkSpec {

  private val Trials = 3
  private val OpsPerTrial = 30

  test("random histories: every version's snapshot equals the model, " +
      "byte-for-byte") {
    runTrials(seedBase = 42, expectCheckpoints = false)
  }

  test("random histories under an aggressive CHECKPOINT cadence: " +
      "rolled-up resolution equals the model at every version, " +
      "including versions below, at, and above each checkpoint") {
    withSQLConf(QuirkCsvVersions.CheckpointEveryKey -> "5") {
      runTrials(seedBase = 4200, expectCheckpoints = true)
    }
  }

  private def runTrials(seedBase: Int, expectCheckpoints: Boolean): Unit = {
    (1 to Trials).foreach { trial =>
      val rnd = new scala.util.Random(seedBase + trial)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_vm$trial").toString
      val dir = new Path(root)
      val fs = dir.getFileSystem(new Configuration())
      fs.mkdirs(dir)
      QuirkCsvVersions.writeMarker(fs, dir)
      // model: version -> (relpath -> bytes); version 0 = empty table
      var live = Map.empty[String, String]
      val states = scala.collection.mutable.ArrayBuffer(live)
      var nextId = 0
      def write(rel: String, content: String): Path = {
        val p = new Path(dir, rel)
        val out = fs.create(p, true)
        out.write(content.getBytes("ISO-8859-1")); out.close()
        p
      }
      (1 to OpsPerTrial).foreach { _ =>
        val adds = scala.collection.mutable.ArrayBuffer.empty[Path]
        val retires = scala.collection.mutable.ArrayBuffer.empty[Path]
        val aliases =
          scala.collection.mutable.ArrayBuffer.empty[(Path, String)]
        var next = live
        // retire/replace candidates come from the PRE-COMMIT live set,
        // one lifecycle step per relpath per commit — the commit()
        // caller contract (the real write paths target files from prior
        // commits only; commit rejects violations loudly)
        val prior = live.keySet.toSeq.sorted
        val touched = scala.collection.mutable.Set.empty[String]
        // 1-2 fresh adds
        (0 until 1 + rnd.nextInt(2)).foreach { _ =>
          nextId += 1
          val rel = s"part-f$nextId.csv"
          val content = s"k\nv$nextId\n"
          adds += write(rel, content)
          next += (rel -> content)
        }
        // maybe retire one pre-existing live file
        if (prior.nonEmpty && rnd.nextBoolean()) {
          val rel = prior(rnd.nextInt(prior.size))
          touched += rel
          retires += new Path(dir, rel)
          next -= rel
        }
        // maybe REPLACE one pre-existing live file in place
        // (streaming-replay shape): old bytes move aside, new bytes land
        // under the SAME name, the commit retires the aside as a
        // prior-incarnation (P) event under the original relpath
        if (prior.nonEmpty && rnd.nextInt(3) == 0) {
          val rel = prior(rnd.nextInt(prior.size))
          if (!touched.contains(rel)) {
            val aside = new Path(dir, s".$rel.pre-replay")
            require(fs.rename(new Path(dir, rel), aside))
            nextId += 1
            val content = s"k\nreplay$nextId\n"
            adds += write(rel, content)
            aliases += ((aside, rel))
            next += (rel -> content)
          }
        }
        QuirkCsvVersions.commit(fs, dir, "op", adds.toSeq, retires.toSeq,
          retiredAliases = aliases.toSeq)
        live = next
        states += live
      }
      if (expectCheckpoints) {
        // the cadence must actually have rolled up — otherwise this
        // test silently degenerates into the full-log path
        val ckpts = fs.listStatus(new Path(dir, QuirkCsvVersions.LogDirName))
          .map(_.getPath.getName).count(_.startsWith("ckpt-"))
        withClue(s"trial $trial: ")(ckpts should be >= 2)
      }
      // every version reconstructs the model exactly, bytes included
      val current = QuirkCsvVersions.liveListing(root)
      def bytesOf(p: String): String = {
        val in = fs.open(new Path(p))
        try {
          val st = fs.getFileStatus(new Path(p))
          val buf = new Array[Byte](st.getLen.toInt)
          in.readFully(buf)
          new String(buf, "ISO-8859-1")
        } finally in.close()
      }
      states.zipWithIndex.foreach { case (expected, v) =>
        val snap = QuirkCsvVersions
          .snapshotListing(fs, dir, v.toLong, current)
          .map(f => new Path(f.path) -> f)
        val got = snap.map { case (p, f) =>
          // resolve the LOGICAL relpath: attic files live under
          // _graft_attic/vNNN/<rel>
          val rel0 = QuirkCsvVersions.relpathOf(dir, p)
          val rel = if (rel0.startsWith("_graft_attic/"))
            rel0.split("/", 3)(2) else rel0
          rel -> bytesOf(f.path)
        }.toMap
        withClue(s"trial $trial version $v: ") {
          got shouldBe expected
        }
      }
      // vacuum pins an exact horizon: below throws, at/above still serves
      val cur = QuirkCsvVersions.currentVersion(fs, dir)
      val horizon = QuirkCsvVersions.vacuum(fs, dir, (cur / 2).toInt)
      (0L until horizon).foreach { v =>
        an[Exception] should be thrownBy
          QuirkCsvVersions.snapshotListing(fs, dir, v, current)
      }
      (horizon to cur).foreach { v =>
        QuirkCsvVersions.snapshotListing(fs, dir, v, current)
          .size shouldBe states(v.toInt).size
      }
    }
  }
}
