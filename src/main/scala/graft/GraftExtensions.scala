package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Standard Spark plugin entry point (SURVEY.md §7.4 path (c)): makes
  * every graft native expression available to plain SQL on any session
  * built with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * This is the deployment-grade alternative to
  * [[graft.functions.GraftFunctions.register]] (which installs the same
  * functions imperatively on an already-built session): a cluster
  * operator adds one config line and every job — including pure-SQL
  * ones — sees `unwrap`, `vec_dot`, `rolling_hash`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("unwrap"),
      info("unwrap", "unwrap(expr) - fails on NULL, narrows nullability"),
      (exprs: Seq[Expression]) => GraftFunctions.Unwrap(exprs.head)))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - float-vector dot product"),
      (exprs: Seq[Expression]) =>
        GraftFunctions.FloatVecDot(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash",
        "rolling_hash(s) - Karp-Rabin 64-bit rolling hash"),
      (exprs: Seq[Expression]) => GraftFunctions.RollingHash(exprs.head)))
    ext.injectFunction((FunctionIdentifier("morton"),
      info("morton",
        "morton(a, b) - z-order interleave of the low 16 bits"),
      (exprs: Seq[Expression]) =>
        GraftFunctions.mortonExpr(exprs.head, exprs(1))))
    // whole-operator extensions: planned sort-merge as-of join and
    // sort-free grouped top-k
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.BandJoinStrategy)
  }
}
