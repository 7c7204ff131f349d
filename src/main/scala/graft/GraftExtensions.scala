package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.NativeKernels._
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.types.StringType

/** SparkSessionExtensions wiring: exposes the native kernels to SQL
  * users (`SELECT vec_dot(a.embedding, b.embedding) …`), so the whole
  * operator surface is reachable from `spark.sql` as well as the
  * DataFrame API.
  *
  * Use `spark.sql.extensions=graft.GraftExtensions` or
  * [[GraftExtensions.install]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.NativeKernels", name),
        (args: Seq[Expression]) => {
          require(args.length == arity, s"$name expects $arity argument(s)")
          builder(args)
        }))
    }
}

object GraftExtensions {

  private val registrations: Seq[(String, Int, Seq[Expression] => Expression)] =
    Seq(
      ("vec_dot", 2, args => VecDot(args(0), args(1))),
      ("vec_sqdist", 2, args => VecSqDist(args(0), args(1))),
      ("vec_sqdist_l", 2, args => VecSqDistL(args(0), args(1))),
      ("word_tokens", 1, args => Tokens(Cast(args.head, StringType))),
      ("word_shingles_3", 1, args => WordShingles(Cast(args.head, StringType), 3)),
      ("minhash_sig_16", 1, args => MinHashSignature(args.head, 16)),
      ("simhash_32", 1, args => SimHash(args.head, 32)),
      ("hash64", 1, args => Hash64(Cast(args.head, StringType))),
      ("winnow_fp_4_4", 1,
        args => WinnowedFingerprints(Cast(args.head, StringType), 4, 4)))

  /** Register the functions on an already-built session (tests, REPL).
    * Also registers the typed top-k aggregator as a SQL UDAF
    * (`SELECT graft_topk(price, orderkey, linenumber) … GROUP BY …`). */
  def install(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registrations.foreach { case (name, arity, builder) =>
      registry.createOrReplaceTempFunction(
        name,
        (args: Seq[Expression]) => {
          require(args.length == arity, s"$name expects $arity argument(s)")
          builder(args)
        },
        "scala_udf")
    }
    spark.udf.register("graft_topk3",
      org.apache.spark.sql.functions.udaf(graft.functions.GroupedTopK.TopK(3)))
    // the sketch aggregators behind x05/x07 (KMV distinct), x08/t42
    // (bottom-k sample), and t38/e11 (bounded top-k docs), so the SQL
    // surface can run the same bounded-state aggregations the
    // DataFrame queries use
    spark.udf.register("graft_kmv128",
      org.apache.spark.sql.functions.udaf(graft.functions.KMinValues.KMV(128)))
    spark.udf.register("graft_bottomk128",
      org.apache.spark.sql.functions.udaf(graft.functions.Sampling.BottomK(128)))
    spark.udf.register("graft_topdocs10",
      org.apache.spark.sql.functions.udaf(graft.functions.GroupedTopK.TopDocs(10)))
  }
}
