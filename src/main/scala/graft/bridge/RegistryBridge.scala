package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Minimal accessor for the session FunctionRegistry (which is
  * `private[sql]`), so graft can register native expressions on an
  * already-built session — the same mechanism `SparkSessionExtensions`
  * uses at build time. Public-API alternative: build the session with
  * `graft.functions.GraftExtensions`.
  */
object RegistryBridge {
  def install(spark: SparkSession, f: FunctionRegistry => Unit): Unit =
    f(spark.sessionState.functionRegistry)
}
