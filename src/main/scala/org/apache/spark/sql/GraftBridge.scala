package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> catalyst Expression bridge. Spark 4 made the conversion
  * utilities `private[sql]`; custom Expressions (graft.expressions.*) still
  * need them, so this object re-exports the two calls from inside the sql
  * package — the standard idiom for Spark extension libraries.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Test access: the optimizer rules a SparkSessionExtensions would
    * install (the builder hook itself is private[sql]).
    */
  def optimizerRules(ext: SparkSessionExtensions, session: SparkSession)
      : Seq[catalyst.rules.Rule[catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(session)

  /** Test access: execute an arbitrary logical plan (e.g. one an optimizer
    * rule just transformed) in a session that doesn't have the extension
    * installed — the shared test session is built once, so rule EXECUTION
    * bugs can't be reproduced through it with SQL alone.
    */
  def ofRows(session: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)

  /** Register a SQL function on an ALREADY-RUNNING session — the runtime
    * counterpart of SparkSessionExtensions.injectFunction for sessions
    * built before the extension existed (tests share one session; a
    * notebook attaches to a live cluster session the same way).
    */
  def registerFunction(session: SparkSession, name: String, usage: String,
      builder: Seq[Expression] => Expression): Unit =
    session.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(
        catalyst.FunctionIdentifier(name),
        // 5-arg ctor is (className, db, NAME, usage, arguments) — the
        // 3-arg one is (className, db, name), which would register the
        // usage text AS the function name
        new catalyst.expressions.ExpressionInfo(
          classOf[GraftBridge.type].getName, null, name, usage, ""),
        builder)
}
