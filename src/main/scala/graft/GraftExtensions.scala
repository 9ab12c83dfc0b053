package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{SimHash64FromTokens, TextExpressions, TokenCountInSet,
  TokenNGrams, VectorDot, VectorL2Sq, VectorExpressions, XxHashArray}

/** Idiomatic library installation point: the codegen'd graft kernels
  * as permanent SQL functions via `SparkSessionExtensions`, so a
  * cluster user enables the whole library with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * and every session — including pure-SQL clients over Thrift — can
  * call `graft_vector_dot`, `graft_token_ngrams`, etc. without any
  * driver-side code. The query builders in `graft.ops` also register
  * the same functions imperatively (`TextExpressions.register` /
  * `VectorExpressions.register`) so they work on stock sessions; the
  * two paths install identical builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
        builder))
    }
    // The native ASOF JOIN planner strategy (graft.plans.AsofJoinPlan
    // → AsofJoinExec); sessions built without extensions get it
    // per-session via experimental.extraStrategies in
    // AsofJoinNative.join.
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}

object GraftExtensions {

  /** (name, usage, builder) for every graft SQL function; shared by
    * the extension injection above and kept in lockstep with the
    * imperative `register` paths. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    (VectorExpressions.FnName,
      "graft_vector_dot(a, b) - codegen'd dot product over array<double>",
      (es: Seq[Expression]) => VectorDot(es(0), es(1))),
    (VectorExpressions.L2FnName,
      "graft_vector_l2sq(a, b) - codegen'd squared L2 distance",
      (es: Seq[Expression]) => VectorL2Sq(es(0), es(1))),
    (VectorExpressions.MaxAbsFnName,
      "graft_vector_max_abs(a) - codegen'd max |element| (int8 quantization scale)",
      (es: Seq[Expression]) => graft.plans.VectorMaxAbs(es(0))),
    (VectorExpressions.QuantizeFnName,
      "graft_vector_quantize_int8(a, scale) - codegen'd symmetric int8 codes",
      (es: Seq[Expression]) => graft.plans.VectorQuantizeInt8(es(0), es(1))),
    (TextExpressions.NGramsFnName,
      "graft_token_ngrams(tokens, n, emitWholeShortDoc) - word n-grams",
      (es: Seq[Expression]) => TokenNGrams(
        es(0), es(1).eval().asInstanceOf[Int],
        es(2).eval().asInstanceOf[Boolean])),
    (TextExpressions.HashArrayFnName,
      "graft_xxhash_array(arr, seed) - xxhash64 of every array element",
      (es: Seq[Expression]) => XxHashArray(es(0),
        es(1).eval() match {
          case l: Long => l
          case i: Int => i.toLong
        })),
    (TextExpressions.SimHashFnName,
      "graft_simhash64(tokens) - 64-bit SimHash of a token array",
      (es: Seq[Expression]) => SimHash64FromTokens(es(0))),
    (TextExpressions.CountInSetFnName,
      "graft_count_in_set(tokens, set) - tokens contained in a fixed set",
      (es: Seq[Expression]) => TokenCountInSet(es(0),
        es(1).eval().asInstanceOf[ArrayData]
          .toArray[UTF8String](StringType).toSeq.map(_.toString))),
    (TextExpressions.NormalizeFnName,
      "graft_text_normalize(s) - Unicode canonicalization (NFD mark-strip, NFC, lower, ws-collapse)",
      (es: Seq[Expression]) => graft.plans.TextNormalize(es(0))))
}
