package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The CTAS commit race the exists-check alone cannot see: when a
  * concurrent CREATE lands the final directory between the loser's
  * `exists` check and its `rename`, Hadoop's rename moves the staging
  * dir INTO the winner's table (POSIX mv-into-dir) and returns true —
  * without the post-rename landing check, the losing CTAS would report
  * success while its data sits as a hidden `.staged-*` subdir inside
  * the other table. Deterministic replay: a FilterFileSystem lies
  * `exists(finalDir) == false` exactly once (the race window), the real
  * filesystem underneath already holds the winner. */
class QuirkCsvStagedRaceSpec extends AnyFunSuite with Matchers {

  test("a CREATE losing the commit race throws and leaves no nested " +
      "residue inside the winner's table") {
    val rootDir = java.nio.file.Files.createTempDirectory("graft_race")
    val root = new Path(rootDir.toString)
    val raw = root.getFileSystem(new Configuration())
    val finalDir = new Path(root, "t")
    val stagedDir = new Path(root, ".staged-t-deadbeef")

    // the winner's table is already on disk
    raw.mkdirs(finalDir)
    val w = raw.create(new Path(finalDir, "part-winner.csv"), false)
    w.write("k\nwinner\n".getBytes("ISO-8859-1")); w.close()
    // the loser's staged output
    raw.mkdirs(stagedDir)
    val l = raw.create(new Path(stagedDir, "part-loser.csv"), false)
    l.write("k\nloser\n".getBytes("ISO-8859-1")); l.close()

    // the race window: exists(finalDir) reads false ONCE (the loser's
    // pre-check ran before the winner landed); everything else is real
    val lying = new FilterFileSystem(raw) {
      private var lied = false
      override def exists(p: Path): Boolean =
        if (!lied && p == finalDir) { lied = true; false }
        else super.exists(p)
    }

    val staged = new QuirkCsvStagedTable(null, lying, stagedDir, finalDir,
      Identifier.of(Array("ns"), "t"), replace = false, orCreate = false)
    a[TableAlreadyExistsException] should be thrownBy
      staged.commitStagedChanges()

    // the winner's table is intact and carries NO nested staging dir
    raw.exists(new Path(finalDir, "part-winner.csv")) shouldBe true
    raw.listStatus(finalDir).map(_.getPath.getName).toSeq shouldBe
      Seq("part-winner.csv")
    // the loser's staging is gone from everywhere
    raw.exists(stagedDir) shouldBe false
  }
}
