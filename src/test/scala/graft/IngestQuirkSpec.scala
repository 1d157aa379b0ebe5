package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import graft.superstore.Ingest

/** Each §1.4 CSV quirk as an isolated fixture (SURVEY §5.2.1): the repair
  * steps must each work alone, not only in the real file's combination. */
class IngestQuirkSpec extends SparkSpec {
  import spark.implicits._

  private val header = "Row ID,Order ID,Order Date,Ship Date,Ship Mode," +
    "Customer ID,Customer Name,Segment,Country,City,State,Postal Code," +
    "Region,Product ID,Category,Sub-Category,Product Name,Sales,Quantity," +
    "Discount,Profit"

  private def row(id: Int, product: String = "Plain Product",
                  sales: String = "10.00"): String =
    s"$id,CA-2016-0000$id,1/2/2016,1/5/2016,Second Class,CG-1,Jane Doe," +
      s"Consumer,United States,Henderson,Kentucky,42420,South,FUR-1," +
      s"Furniture,Bookcases,$product,$sales,1,0,1.50"

  private def write(lines: Seq[String], sep: String = "\n",
                    charset: String = "UTF-8"): String = {
    val f = Files.createTempFile("quirk", ".csv")
    Files.write(f, lines.mkString(sep).getBytes(charset))
    f.toString
  }

  test("clean file parses as-is") {
    val p = write(Seq(header, row(1), row(2)))
    Ingest.readRaw(spark, p).count() shouldBe 2
  }

  test("quirk 1: trailing semicolons stripped from every line") {
    val p = write(Seq(header + ";", row(1) + ";", row(2) + ";"))
    val raw = Ingest.readRaw(spark, p)
    raw.count() shouldBe 2
    // last column must parse numerically (no ';' residue)
    raw.filter($"Profit" =!= "1.50").count() shouldBe 0
  }

  test("quirk 2: fully-quoted rows unwrapped with doubled quotes repaired") {
    val inner = row(2, "\"\"Deluxe Chair, Rounded\"\"")
    val p = write(Seq(header, row(1), "\"" + inner + "\";"))
    val raw = Ingest.readRaw(spark, p)
    raw.count() shouldBe 2
    raw.filter($"ProductName" === "Deluxe Chair, Rounded").count() shouldBe 1
    raw.filter($"RowID" === "2" && $"Sales" === "10.00").count() shouldBe 1
  }

  test("quirk 3: embedded commas inside quoted fields on normal rows") {
    val p = write(Seq(header, row(1, "\"Chair, Rounded Back\"")))
    val raw = Ingest.readRaw(spark, p)
    raw.filter($"ProductName" === "Chair, Rounded Back").count() shouldBe 1
    raw.filter($"Quantity" === "1").count() shouldBe 1 // columns not shifted
  }

  test("quirk 4: 0xA0 bytes decode as NBSP via latin-1") {
    val p = write(Seq(header, row(1, "Konftel Phone")), charset = "ISO-8859-1")
    val raw = Ingest.readRaw(spark, p)
    raw.filter($"ProductName" === "Konftel Phone").count() shouldBe 1
  }

  test("quirk 5: CRLF line endings") {
    val p = write(Seq(header, row(1), row(2)), sep = "\r\n")
    val raw = Ingest.readRaw(spark, p)
    raw.count() shouldBe 2
    raw.filter($"Profit" =!= "1.50").count() shouldBe 0 // no \r residue
  }

  test("all quirks combined in one file") {
    val wrapped = "\"" + row(3, "\"\"Combo, Item\"\"") + "\";"
    val p = write(Seq(header + ";", row(1) + ";", wrapped,
      row(4, "K P") + ";"), sep = "\r\n", charset = "ISO-8859-1")
    val raw = Ingest.readRaw(spark, p)
    raw.count() shouldBe 3
    raw.filter($"ProductName" === "Combo, Item").count() shouldBe 1
    raw.filter($"ProductName" === "K P").count() shouldBe 1
  }

  test("a normal row whose quotes collapse to exactly two is NOT unwrapped") {
    // quoted first field + quoted-empty last field: starts and ends with a
    // quote and undoubles to two quotes, but they are not the line's outer
    // characters — the repair must leave the row alone
    val tricky = "\"1\",CA-2016-00001,1/2/2016,1/5/2016,Second Class,CG-1," +
      "Jane Doe,Consumer,United States,Henderson,Kentucky,42420,South," +
      "FUR-1,Furniture,Bookcases,Plain Product,10.00,1,0,\"\""
    val p = write(Seq(header, tricky))
    val raw = Ingest.readRaw(spark, p)
    raw.count() shouldBe 1
    raw.filter($"RowID" === "1").count() shouldBe 1
    raw.filter($"Quantity" === "1").count() shouldBe 1 // columns not shifted
    raw.filter($"Profit".isNull || $"Profit" === "").count() shouldBe 1
  }

  test("excelCompat drops exactly the wrapped rows") {
    val wrapped = "\"" + row(3) + "\";"
    val p = write(Seq(header, row(1) + ";", wrapped, row(4) + ";"))
    Ingest.readRaw(spark, p, excelCompat = true).count() shouldBe 2
    Ingest.readRaw(spark, p, excelCompat = false).count() shouldBe 3
  }
}
