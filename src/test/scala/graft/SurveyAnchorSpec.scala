package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SURVEY.md →  registry drift gate: every query anchor the survey's
  * coverage prose cites (the §8 matrix rows for the 51 §2 reference
  * operators, and any other `qNN` mention) must name a query that is
  * actually registered — renaming or dropping a query without updating
  * SURVEY turns this spec red, closing the last doc-drift hole
  * (`OperatorIndexSpec` already pins the registry TOTAL and the
  * OPERATORS.md row set; this pins the per-row anchors).
  *
  * Anchors are 2-3 digit `qNN` tokens (bare or with a full `_name`
  * suffix — query names are zero-padded from q01, so single-digit
  * tokens like the `q8_dot` int8-dot FUNCTION are not query anchors). */
class SurveyAnchorSpec extends AnyFunSuite with Matchers {

  test("every SURVEY.md query anchor resolves to a registered query") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val registered = Queries.all.map(_.name).toSet
    val prefixes = registered.map(_.split("_")(0))

    val bare = """\bq\d{2,3}\b""".r.findAllIn(survey).toSet
    val full = """\bq\d{2,3}_[a-z0-9_]+""".r.findAllIn(survey).toSet

    val missingBare = bare.filterNot(prefixes.contains).toSeq.sorted
    withClue("SURVEY.md cites query numbers with no registered query " +
      "(renamed or dropped without updating the survey): ") {
      missingBare shouldBe empty
    }
    val missingFull = full.filterNot(registered.contains).toSeq.sorted
    withClue("SURVEY.md cites full query names not in the registry: ") {
      missingFull shouldBe empty
    }
    // sanity: the gate actually sees the matrix (§8 anchors the 51
    // reference rows from q01 up)
    bare.size should be > 100
  }
}
