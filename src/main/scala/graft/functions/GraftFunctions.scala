package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.GraftColumns

/** Public surface for graft's custom Catalyst expressions: Column
  * builders for Scala callers and a session registrar for SQL callers
  * (the engine's §2.9 extension point — registered at runtime so it
  * works on any session, including one the host application built).
  */
object GraftFunctions {

  /** Codegen'd dot product over two array<double> columns. */
  def array_dot(a: Column, b: Column): Column =
    GraftColumns.column(
      ArrayDot(GraftColumns.expression(a), GraftColumns.expression(b)))

  /** Codegen'd polynomial rolling hash over an array<long> column. */
  def array_poly_hash(a: Column): Column =
    GraftColumns.column(ArrayPolyHash(GraftColumns.expression(a)))

  /** Cassandra's Murmur3Partitioner token of a string/binary key. */
  def murmur3_token(a: Column): Column =
    GraftColumns.column(Murmur3Token(GraftColumns.expression(a)))

  /** The REAL ring token of a rendered key under a declared marshal
    * key type — the token the sink sorts by and the reader ranges by
    * on typed tables (see [[Murmur3TokenTyped]]). */
  def murmur3_token_typed(a: Column, keyType: String): Column =
    GraftColumns.column(
      Murmur3TokenTyped(GraftColumns.expression(a), keyType))

  /** Register every graft function on a session for SQL use
    * (`SELECT array_dot(a, b) ...`). Idempotent. */
  def register(spark: SparkSession): Unit = {
    GraftColumns.registerFunction(spark, "array_dot",
      exprs => ArrayDot(exprs(0), exprs(1)))
    GraftColumns.registerFunction(spark, "array_poly_hash",
      exprs => ArrayPolyHash(exprs(0)))
    GraftColumns.registerFunction(spark, "murmur3_token",
      exprs => Murmur3Token(exprs(0)))
    GraftColumns.registerFunction(spark, "murmur3_token_typed",
      exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          "murmur3_token_typed(key, type) takes exactly two " +
            s"arguments, got ${exprs.length}")
        exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            Murmur3TokenTyped(exprs(0), s.toString)
          case other => throw new IllegalArgumentException(
            "murmur3_token_typed(key, type): the marshal key type " +
              s"must be a string literal, got $other")
        }
      })
  }
}
