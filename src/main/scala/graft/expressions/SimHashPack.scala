package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** SimHash fingerprint over a token-array column, packed into one long.
  *
  * The DataFrame formulation (`NearDup.simHash`) explodes tokens to rows
  * and folds them back with a `bits`-wide SUM aggregate — one full shuffle
  * of the tokenized corpus per fingerprint pass. This expression computes
  * the identical signature in a single fused pass per document: no
  * explode, no aggregate, no exchange; fingerprinting becomes a scalar
  * projection that pipelines into whatever scan or join needs it — the
  * (b)-tier of SURVEY §7.3's preference order, replacing a whole-operator
  * shuffle rather than just a slow scalar.
  *
  * Bit votes replicate the aggregate formulation exactly, nibble for
  * nibble: token → md5, hex digit j/4, bit (nibble >> (j%4)) & 1 votes
  * ±1 on position j; positive vote sums set fingerprint bits. Results are
  * bit-identical to `NearDup.simHash` and to the differential oracle's
  * unrolled SQL (both read the same md5 nibbles). NULL array → NULL; NULL
  * elements are skipped (the aggregate's SUM ignores them); an empty or
  * all-NULL array packs to 0L, where the explode-based operator instead
  * emits no row — callers keep their `size(tokens) > 0` filters.
  */
case class SimHashPack(child: Expression, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if bits >= 1 && bits <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"simhash_pack bits must be in [1, 64], got $bits")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"simhash_pack expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_pack"

  override protected def nullSafeEval(a: Any): Any =
    SimHashPack.compute(a.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.expressions.SimHashPack.compute($a, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashPack =
    copy(child = newChild)
}

object SimHashPack {
  // MessageDigest is stateful; one instance per codegen'd task thread
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** One-pass signature: identical votes to the explode+SUM aggregate. */
  def compute(tokens: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = tokens.numElements()
    val md = digests.get()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        md.reset()
        // UTF8String.getBytes is the UTF-8 encoding md5() hashes in SQL
        val dig = md.digest(tokens.getUTF8String(t).getBytes)
        var j = 0
        while (j < bits) {
          val hexIdx = j >> 2 // hex digit j/4 of the digest string
          val nib =
            (dig(hexIdx >> 1) >> (if ((hexIdx & 1) == 0) 4 else 0)) & 0xF
          votes(j) += (((nib >> (j & 3)) & 1) << 1) - 1
          j += 1
        }
      }
      t += 1
    }
    var packed = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) packed |= 1L << j
      j += 1
    }
    packed
  }
}
