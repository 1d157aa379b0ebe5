package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The catalog FUNCTION library — DataSourceV2's `FunctionCatalog` tier,
  * the last previously-untouched rung of Spark's extension surface: these
  * are SQL-addressable functions loaded THROUGH a catalog plugin
  * ([[QuirkCsvCatalog]]), not session-registered UDFs, so a pure-SQL user
  * of the raw layer gets the engine's text/vector primitives with zero
  * Scala:
  *
  * {{{
  *   SELECT graft_cat.lib.token_count(text)    -- whitespace tokens
  *   SELECT graft_cat.lib.int_dot(q8a, q8b)    -- exact int64 dot product
  *   SELECT source, graft_cat.lib.xor_checksum(text)  -- content fingerprint
  * }}}
  *
  * Scalar functions implement the MAGIC METHOD (`invoke` with exact
  * JVM-type signatures): Spark's resolver then plans a direct codegen'd
  * `Invoke` call instead of the row-boxing `produceResult` path — the
  * same "stay inside whole-stage codegen" rule the rest of the engine
  * follows. `produceResult` is still provided as the documented fallback.
  *
  * Cross-engine determinism (the oracle contract): `token_count` is the
  * `TextFunctions.tokens` convention (Java `\s+`, empties dropped);
  * `int_dot` is exact integer math; `xor_checksum` XORs a 60-bit md5
  * slice — `conv(substr(md5(v),1,15),16,10)` here, and in DuckDB
  * `CAST('0x' || substr(md5(v),1,15) AS BIGINT)` — XOR is commutative,
  * so the result is partition-order independent BY CONSTRUCTION (the
  * property that makes it a valid distributed table checksum).
  */
object GraftFunctions {

  /** Function names exposed by the catalog (any namespace). */
  val names: Seq[String] = Seq("token_count", "int_dot", "xor_checksum")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "token_count" => Some(TokenCountUnbound)
    case "int_dot" => Some(IntDotUnbound)
    case "xor_checksum" => Some(XorChecksumUnbound)
    case _ => None
  }

  // ------------------------------------------------------ token_count

  object TokenCountUnbound extends UnboundFunction {
    override def name(): String = "token_count"
    override def description(): String =
      "token_count(text STRING) -> INT: whitespace-separated non-empty " +
        "token count (the TextFunctions.tokens convention); NULL for NULL"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1 &&
        inputType.fields(0).dataType == StringType,
        s"token_count takes (STRING), got ${inputType.catalogString}")
      new TokenCount
    }
  }

  class TokenCount extends ScalarFunction[Integer] {
    override def name(): String = "token_count"
    override def canonicalName(): String = "graft.token_count"
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = true

    /** Magic method — resolved by name+signature, planned as a codegen'd
      * Invoke. Spark passes reference-typed arguments through UNCHECKED
      * (a NULL input arrives as a null UTF8String), so the method handles
      * null itself and returns boxed. One pass, no array allocation:
      * count maximal non-blank runs (equivalent to
      * split("\\s+").filterNot(_.isEmpty).length — Java \s is exactly
      * the 6 chars tested below). */
    def invoke(s: UTF8String): Integer = {
      if (s == null) return null
      val str = s.toString
      var i = 0
      var count = 0
      var inTok = false
      while (i < str.length) {
        val c = str.charAt(i)
        val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
          c == '\f' || c == '\r'
        if (!ws && !inTok) { count += 1; inTok = true }
        else if (ws) inTok = false
        i += 1
      }
      count
    }

    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(0)) null else invoke(input.getUTF8String(0))
  }

  // ---------------------------------------------------------- int_dot

  object IntDotUnbound extends UnboundFunction {
    override def name(): String = "int_dot"
    override def description(): String =
      "int_dot(a ARRAY<BIGINT>, b ARRAY<BIGINT>) -> BIGINT: exact integer " +
        "dot product (quantized-embedding scoring); lengths must match"
    override def bind(inputType: StructType): BoundFunction = {
      val ok = inputType.fields.length == 2 && inputType.fields.forall {
        f => f.dataType == ArrayType(LongType) ||
          f.dataType == ArrayType(LongType, containsNull = false)
      }
      require(ok,
        s"int_dot takes (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          inputType.catalogString)
      new IntDot
    }
  }

  class IntDot extends ScalarFunction[java.lang.Long] {
    override def name(): String = "int_dot"
    override def canonicalName(): String = "graft.int_dot"
    override def inputTypes(): Array[DataType] =
      Array(ArrayType(LongType), ArrayType(LongType))
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = true

    /** Magic method: primitive-array access on ArrayData. Reference args
      * arrive unchecked (see [[TokenCount.invoke]]) — null in, null out. */
    def invoke(a: ArrayData, b: ArrayData): java.lang.Long = {
      if (a == null || b == null) return null
      val n = a.numElements()
      require(b.numElements() == n,
        s"int_dot length mismatch: $n vs ${b.numElements()}")
      var i = 0
      var acc = 0L
      while (i < n) {
        acc += a.getLong(i) * b.getLong(i)
        i += 1
      }
      Long.box(acc)
    }

    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else invoke(input.getArray(0), input.getArray(1))
  }

  // ----------------------------------------------------- xor_checksum

  object XorChecksumUnbound extends UnboundFunction {
    override def name(): String = "xor_checksum"
    override def description(): String =
      "xor_checksum(v STRING) -> BIGINT aggregate: XOR of 60-bit md5 " +
        "slices — an order-independent content fingerprint for table " +
        "integrity checks. NULLs contribute nothing and an empty or " +
        "all-NULL group returns 0 (the XOR fold identity) — note SQL " +
        "bit_xor aggregates return NULL there, so a cross-engine " +
        "replay is COALESCE(bit_xor(...), 0)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1 &&
        inputType.fields(0).dataType == StringType,
        s"xor_checksum takes (STRING), got ${inputType.catalogString}")
      new XorChecksum
    }
  }

  class XorChecksum extends AggregateFunction[java.lang.Long, java.lang.Long] {
    override def name(): String = "xor_checksum"
    override def canonicalName(): String = "graft.xor_checksum"
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false

    override def newAggregationState(): java.lang.Long = Long.box(0L)

    override def update(state: java.lang.Long,
                        input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) state
      else Long.box(state.longValue() ^ hash60(input.getUTF8String(0)))

    override def merge(s1: java.lang.Long,
                       s2: java.lang.Long): java.lang.Long =
      Long.box(s1.longValue() ^ s2.longValue())

    override def produceResult(state: java.lang.Long): java.lang.Long = state

    /** First 15 hex chars of md5 as a non-negative long (60 bits) — the
      * same value as Spark SQL `conv(substring(md5(v),1,15),16,10)` and
      * DuckDB `CAST('0x' || substr(md5(v),1,15) AS BIGINT)`. */
    private def hash60(v: UTF8String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(v.toString.getBytes(StandardCharsets.UTF_8))
      // 15 hex chars = bytes 0..6 fully + high nibble of byte 7
      var acc = 0L
      var i = 0
      while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
      (acc << 4) | ((d(7) & 0xf0L) >> 4)
    }
  }
}
