package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression combinators shared across operators. */
object ColExprs {

  /** Let-binding for Column expressions: evaluate `e` ONCE and hand it to
    * `body` as a lambda variable — multiple reads of a lambda variable do
    * NOT re-evaluate the bound expression. Implemented as
    * `get(transform(array(e), a => body(a)), 0)`; the one-element array
    * wrapper is O(1).
    *
    * Use whenever a kernel must reference a COMPUTED array (HOF chain,
    * tokenization, n-gram build) more than once: Spark's higher-order
    * functions are interpreted (CodegenFallback), so codegen-level
    * subexpression elimination never deduplicates the repeated subtree,
    * and in nested cascades k references cost k^depth evaluations.
    *
    * Null semantics: `e == null` binds `a` as null (`array(null)` is a
    * one-element array holding null), so `body` must be null-safe exactly
    * as if it received the raw expression. */
  def once(e: Column)(body: Column => Column): Column =
    get(transform(array(e), a => body(a)), lit(0))
}
