package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatDot, FloatVector}

/** Session-extension entry point — the deployment-grade way to wire
  * the engine's custom Catalyst expressions into EVERY session of a
  * cluster, without per-session registration calls:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   // or programmatically:
  *   SparkSession.builder().withExtensions(new GraftExtensions)…
  *
  * Registers `float_dot` (codegen'd float-vector dot product) as a
  * built-in-style function: visible to `spark.sql`, usable in views,
  * and resolved by the analyzer like any other function. Per-session
  * registration for ad-hoc use remains available via
  * `graft.functions.FloatVector.registerSql`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // transparent aggregate rewrite over registered materialized views
    // (graft.plans.MvRewrite, io28): a no-op until a view is
    // registered for the session, strict-match + fall-back by design.
    // Live sessions can opt in without extensions via MvRewrite.enable.
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (args: Seq[Expression]) => FloatVector.builder(args)))
    // the text kernels behind the dedup pack, as SQL functions — a SQL
    // user can build shingles / LSH band sketches without touching the
    // Scala API: e.g.
    //   SELECT doc_id, explode(graft_minhash_bands(
    //     graft_shingles(text, 3), 16, 4)) FROM docs
    // arg validation (positive INT literals, arity, divisibility)
    // happens inside TextKernelExprs at ANALYSIS time — a malformed
    // SQL call fails with a readable message, never per-row
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo("graft.functions.TextKernels", "graft_shingles"),
      (args: Seq[Expression]) => graft.functions.TextKernelExprs.shingles(args)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo("graft.functions.TextKernels", "graft_minhash_bands"),
      (args: Seq[Expression]) => graft.functions.TextKernelExprs.minhashBands(args)))
    ext.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo("graft.functions.TextKernels", "graft_ngrams"),
      (args: Seq[Expression]) => graft.functions.TextKernelExprs.ngrams(args)))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo("graft.functions.TextKernels", "graft_nfc"),
      (args: Seq[Expression]) => graft.functions.TextKernelExprs.nfc(args)))
    // fused text→bands form (skips the intermediate shingle array):
    //   SELECT doc_id, explode(graft_minhash_bands_text(text, 3, 16, 4))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_bands_text"),
      new ExpressionInfo("graft.functions.TextKernels", "graft_minhash_bands_text"),
      (args: Seq[Expression]) => graft.functions.TextKernelExprs.minhashBandsText(args)))
  }
}
