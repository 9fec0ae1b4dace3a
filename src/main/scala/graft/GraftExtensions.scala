package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarityExpr, IntDotExpr, MeteredSizeExpr}

/** Session-extensions entry point — register graft's native functions
  * in any Spark session via config, no code changes:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * ...
  * SELECT metered_size(headers, body) FROM log
  * SELECT cosine_sim(embedding, query_vec) FROM embeddings
  * }}}
  *
  * `metered_size` is the codegen'd Catalyst expression for the
  * reference's metering formula (envelope.rs:74-78) — the unit of
  * every byte limit, quota and storage metric — so SQL users meter
  * exactly like the engine does. `cosine_sim` is the fused
  * dot-product/norms loop the similarity operators run on.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("metered_size"),
      new ExpressionInfo(classOf[MeteredSizeExpr].getName, "metered_size"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "metered_size(headers, body) takes exactly 2 arguments")
        MeteredSizeExpr(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "cosine_sim(a, b) takes exactly 2 arguments")
        CosineSimilarityExpr(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("int_dot"),
      new ExpressionInfo(classOf[IntDotExpr].getName, "int_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "int_dot(a, b) takes exactly 2 arguments")
        IntDotExpr(exprs(0), exprs(1))
      }))
  }
}
