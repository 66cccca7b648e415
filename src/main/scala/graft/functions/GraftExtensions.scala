package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * functions for SQL use (`SELECT md5_prefix64(col) …`). Installed by
  * GraftSession via `withExtensions`; also usable with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (FunctionIdentifier("md5_prefix64"),
        new ExpressionInfo(classOf[Md5Prefix64].getName, "md5_prefix64"),
        (children: Seq[Expression]) => Md5Prefix64(children.head)))
    // the alias-materialization barrier (see EvalOnce scaladoc), for SQL
    // users hitting the same pushdown re-evaluation trap
    e.injectFunction(
      (FunctionIdentifier("eval_once"),
        new ExpressionInfo(classOf[EvalOnce].getName, "eval_once"),
        (children: Seq[Expression]) => EvalOnce(children.head)))
    e.injectFunction(
      (FunctionIdentifier("simhash16"),
        new ExpressionInfo(classOf[Simhash16].getName, "simhash16"),
        (children: Seq[Expression]) => children match {
          case Seq(toks) => Simhash16(toks, "")
          case Seq(toks, org.apache.spark.sql.catalyst.expressions
            .Literal(s: org.apache.spark.unsafe.types.UTF8String,
              org.apache.spark.sql.types.StringType)) =>
            Simhash16(toks, s.toString)
          case _ => throw new IllegalArgumentException(
            "simhash16(tokens[, salt]) requires a literal STRING salt")
        }))
    e.injectFunction(
      (FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
        (children: Seq[Expression]) => children match {
          case Seq(toks, org.apache.spark.sql.catalyst.expressions
            .Literal(k: Int, org.apache.spark.sql.types.IntegerType)) =>
            MinhashSig(toks, k)
          case _ => throw new IllegalArgumentException(
            "minhash_sig(tokens, k) requires a literal INT signature length")
        }))
    e.injectFunction(
      (FunctionIdentifier("qdot"),
        new ExpressionInfo(classOf[QDot].getName, "qdot"),
        (children: Seq[Expression]) => children match {
          case Seq(a, b) => QDot(a, b)
          case _ => throw new IllegalArgumentException(
            "qdot(a, b) takes 2 ARRAY<BIGINT> arguments")
        }))
    // sketch probes (ops/Sketches): the BINARY argument is a serialized
    // spark.util.sketch BloomFilter / CountMinSketch, typically bound as
    // a parameter (spark.sql(..., Map("sk" -> bytes)))
    e.injectFunction(
      (FunctionIdentifier("bloom_might_contain"),
        new ExpressionInfo(classOf[BloomMightContain].getName,
          "bloom_might_contain"),
        (children: Seq[Expression]) => children match {
          case Seq(k, sk) => BloomMightContain(k, sk)
          case _ => throw new IllegalArgumentException(
            "bloom_might_contain(key, sketch_bytes) takes 2 arguments")
        }))
    e.injectFunction(
      (FunctionIdentifier("cms_estimate"),
        new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
        (children: Seq[Expression]) => children match {
          case Seq(k, sk) => CmsEstimate(k, sk)
          case _ => throw new IllegalArgumentException(
            "cms_estimate(key, sketch_bytes) takes 2 arguments")
        }))
    e.injectFunction(
      (FunctionIdentifier("char_ngram_profile"),
        new ExpressionInfo(classOf[CharNgramProfile].getName,
          "char_ngram_profile"),
        (children: Seq[Expression]) => children match {
          case Seq(s, org.apache.spark.sql.catalyst.expressions
            .Literal(n: Int, org.apache.spark.sql.types.IntegerType)) =>
            CharNgramProfile(s, n)
          case _ => throw new IllegalArgumentException(
            "char_ngram_profile(text, n) requires a literal INT width")
        }))
    // SQL UPDATE / MERGE INTO / arbitrary-predicate DELETE on graft
    // catalog tables (see GraftDmlRule's scaladoc)
    e.injectPostHocResolutionRule(session =>
      new graft.sources.GraftDmlRule(session))
    // SQL views on graft catalogs: DDL intercepted at parse time (the
    // analyzer rejects V2 view DDL before extension rules run), reads
    // expanded by a resolution rule (see GraftViews' scaladoc)
    e.injectParser((session, delegate) =>
      new graft.sources.GraftViewParser(session, delegate))
    e.injectResolutionRule(session =>
      new graft.sources.GraftViewReadRule(session))
  }
}
