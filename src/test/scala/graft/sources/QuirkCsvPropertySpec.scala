package graft.sources

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Pure-function invariants of the graftcsv dialect and zone-map
  * bounds, over arbitrary latin-1 payloads (no Spark round-trips, so
  * hundreds of cases are cheap). */
object QuirkCsvPropertySpec extends Properties("graftcsv") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  // latin-1 payload WITHOUT line breaks (the dialect's record contract);
  // weighted toward the troublemakers: quotes, commas, semicolons, 0xFF
  private val charGen: Gen[Char] = Gen.frequency(
    6 -> Gen.choose(32, 126).map(_.toChar),
    1 -> Gen.oneOf('"', ',', ';', 'ÿ', ' '),
    1 -> Gen.choose(0xa0, 0xff).map(_.toChar))
  private val fieldGen: Gen[String] =
    Gen.listOf(charGen).map(_.mkString)
  private val rowGen: Gen[List[Option[String]]] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n,
      Gen.frequency(5 -> fieldGen.map(Some(_)), 1 -> Gen.const(None))))

  /** The writer's row serialization (QuirkCsvWriter.write without IO). */
  private def serialize(row: List[Option[String]]): String =
    row.map {
      case Some(v) => QuirkCsv.formatField(v)
      case None => ""
    }.mkString(",")

  /** The reader's line decode (next() without IO) — the SAME
    * strip+parse helpers the production reader calls, not a copy. */
  private def parse(line: String, cols: Int): Array[String] =
    QuirkCsv.parseLine(QuirkCsv.stripLineQuirks(line), cols)

  property("write -> read round-trips every row exactly") =
    Prop.forAll(rowGen) { row =>
      val back = parse(serialize(row), row.length)
      val expected = row.map(_.orNull)
      // short rows pad with null on the reader side; compare padded
      val padded = back.toList.padTo(row.length, null)
      padded == expected
    }

  property("round-trip survives CRLF and the trailing-; quirk injectors") =
    Prop.forAll(rowGen) { row =>
      // a quirky producer appends ';' and CRLF — the reader must strip
      // exactly those and still recover the row
      val line = serialize(row) + ";" + "\r"
      parse(line, row.length).toList.padTo(row.length, null) ==
        row.map(_.orNull)
    }

  /** Adversarial alphabet for the wrapped-row detector: rows built only
    * from quotes/commas maximize collisions between "a line that starts
    * and ends with quotes" and a genuine wrapped row. */
  private val nastyField: Gen[String] =
    Gen.listOf(Gen.oneOf('"', ',', 'a')).map(_.mkString)

  property("quote/comma-heavy multi-column rows round-trip") =
    Prop.forAll(Gen.choose(2, 4).flatMap(n =>
      Gen.listOfN(n, nastyField))) { row =>
      parse(serialize(row.map(Option(_))), row.length).toList
        .padTo(row.length, null) == row
    }

  property("boundDown is a lower bound, capped, latin-1") =
    Prop.forAll(fieldGen) { v =>
      val b = QuirkCsv.boundDown(v)
      b != null && b.compareTo(v) <= 0 && b.length <= 257 &&
        b.forall(_ <= 'ÿ')
    }

  property("boundUp is an upper bound, capped, latin-1") =
    Prop.forAll(fieldGen) { v =>
      val b = QuirkCsv.boundUp(v)
      // either truncated-and-bumped (short, strictly latin-1 so the
      // sidecar's ISO-8859-1 encode preserves it — the 0xFF regression)
      // or the exact value itself (unbumpable fallback)
      b != null && b.compareTo(v) >= 0 &&
        ((b eq v) || (b.length <= 257 && b.forall(_ <= 'ÿ')))
    }

  property("bounds bracket every value in a written set") =
    Prop.forAll(Gen.nonEmptyListOf(fieldGen)) { vs =>
      val mn = QuirkCsv.boundDown(vs.min)
      val mx = QuirkCsv.boundUp(vs.max)
      vs.forall(v => mn.compareTo(v) <= 0 && mx.compareTo(v) >= 0)
    }
}
