package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{BpeEncode, FloatVecCosine, JaroWinklerPpm, NormalizeUnicode, PhraseMatchCount, QuantizedDot, RegexHashReplace, SimHashPack, SortedCommonCount}

/** Session extensions: registers the library's native expressions as SQL
  * functions so both `spark.sql("vec_cosine(a, b)")` and
  * `call_function("vec_cosine", ...)` resolve.
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or inject programmatically via `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // opt-in range-join acceleration (spark.graft.rangeJoin.binWidth > 0)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    // physical planning for the grouped top-k logical node, plus
    // group-key filter pushdown through it
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.GroupedTopKFilterPushdown)
    // opt-in window-top-k rewrite (spark.graft.topk.rewriteWindow=true)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
  }
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[FloatVecCosine].getName, "vec_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_cosine expects (array<float>, array<float>)")
        FloatVecCosine(args.head, args(1))
      }),
    (FunctionIdentifier("q8_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, "q8_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "q8_dot expects (array<bigint>, array<double>)")
        QuantizedDot(args.head, args(1))
      }),
    (FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[NormalizeUnicode].getName, "unicode_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "unicode_normalize expects (string, 'NFC'|'NFD'|'NFKC'|'NFKD')")
        val form = args(1) match {
          case lit: org.apache.spark.sql.catalyst.expressions.Literal
              if lit.value != null =>
            NormalizeUnicode.forName(lit.value.toString)
          case other => throw new IllegalArgumentException(
            s"unicode_normalize form must be a string literal, got $other")
        }
        NormalizeUnicode(args.head, form)
      }),
    (FunctionIdentifier("simhash_pack"),
      new ExpressionInfo(classOf[SimHashPack].getName, "simhash_pack"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "simhash_pack expects (array<string>, bits literal)")
        val bits = args(1) match {
          case lit: org.apache.spark.sql.catalyst.expressions.Literal
              if lit.dataType == org.apache.spark.sql.types.IntegerType &&
                lit.value != null => lit.value.asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"simhash_pack bits must be an integer literal, got $other")
        }
        SimHashPack(args.head, bits)
      }),
    (FunctionIdentifier("sorted_common"),
      new ExpressionInfo(classOf[SortedCommonCount].getName, "sorted_common"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "sorted_common expects (array<bigint>, array<bigint>)")
        SortedCommonCount(args.head, args(1))
      }),
    (FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "bpe_encode expects (string, array<string> merges literal)")
        val merges = args(1) match {
          case lit: org.apache.spark.sql.catalyst.expressions.Literal
              if lit.value != null =>
            lit.value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
              .toArray[org.apache.spark.unsafe.types.UTF8String](
                org.apache.spark.sql.types.StringType)
              .map(_.toString).toSeq
          case other => throw new IllegalArgumentException(
            s"bpe_encode merges must be an array literal, got $other")
        }
        BpeEncode(args.head, merges)
      }),
    (FunctionIdentifier("jaro_winkler_ppm"),
      new ExpressionInfo(classOf[JaroWinklerPpm].getName, "jaro_winkler_ppm"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "jaro_winkler_ppm expects (string, string)")
        JaroWinklerPpm(args.head, args(1))
      }),
    (FunctionIdentifier("regex_hash_replace"),
      new ExpressionInfo(classOf[RegexHashReplace].getName,
        "regex_hash_replace"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "regex_hash_replace expects (string, pattern literal, prefix literal)")
        def strLit(e: Expression, what: String): String = e match {
          case lit: org.apache.spark.sql.catalyst.expressions.Literal
              if lit.dataType == org.apache.spark.sql.types.StringType &&
                lit.value != null => lit.value.toString
          case other => throw new IllegalArgumentException(
            s"regex_hash_replace $what must be a string literal, got $other")
        }
        RegexHashReplace(args.head, strLit(args(1), "pattern"),
          strLit(args(2), "prefix"))
      }),
    (FunctionIdentifier("phrase_count"),
      new ExpressionInfo(classOf[PhraseMatchCount].getName, "phrase_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "phrase_count expects (string, array<string> phrases literal)")
        // accept both a Literal array and SQL's array('a','b') CreateArray
        // (any foldable array expression evaluates at registration time)
        val phrases = args(1) match {
          case e if e.foldable && e.dataType.isInstanceOf[
              org.apache.spark.sql.types.ArrayType] =>
            val v = e.eval()
            require(v != null, "phrase_count phrases must not be NULL")
            v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
              .toArray[org.apache.spark.unsafe.types.UTF8String](
                org.apache.spark.sql.types.StringType)
              .map(_.toString).toSeq
          case other => throw new IllegalArgumentException(
            s"phrase_count phrases must be a foldable array, got $other")
        }
        PhraseMatchCount(args.head, phrases)
      }))

  /** Imperative registration for sessions built without the extension. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
