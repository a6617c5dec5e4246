package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cassandra's Murmur3Partitioner token of a partition key — the
  * 64-bit ring position `Murmur3Partitioner.getToken` assigns
  * (first word of `MurmurHash.hash3_x64_128(key, 0)`, with the
  * Long.MinValue → MaxValue normalization the partitioner applies).
  *
  * Over a `string` column the token is taken of the UTF-8 bytes —
  * exactly the engine's key carry for text-keyed tables (UTF8Type
  * encodes as the rendered bytes); over `binary` the bytes are hashed
  * verbatim (the already-encoded key of any type). Codegen'd scalar,
  * no shuffle at any scale. With [[graft.plans.PushClusteringSlice]]
  * active, `murmur3_token(partition_key) BETWEEN lo AND hi` filters
  * over the `sstable-big` connector turn into token-range IO pruning
  * (Index.db walks + Summary.db file skips) automatically.
  */
case class Murmur3Token(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or binary, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "murmur3_token"

  override protected def nullSafeEval(v: Any): Any = v match {
    case u: UTF8String => graft.sources.BigFormat.murmur3Token(u.getBytes)
    case b: Array[Byte] => graft.sources.BigFormat.murmur3Token(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes =
        if (child.dataType == StringType) s"$a.getBytes()" else a
      s"${ev.value} = graft.sources.BigFormat.murmur3Token($bytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Murmur3Token =
    copy(child = newChild)
}

/** The REAL partitioner token of a rendered key string under a
  * declared marshal type: encodes the string through the table's key
  * type (a bigint's "42" → its 8-byte form, a composite's ':'-join →
  * its length-framed blob — [[graft.sources.BigFormat.encodeValue]])
  * before hashing, exactly the token the SSTable sink sorts by and
  * the reader's ring gates compare. [[Murmur3Token]] over a string
  * column coincides with this only for text key types; anything that
  * derives ring positions for a TYPED table (the CLI's
  * `--out-generations` bucketing) must use this form or its buckets
  * drift off the real ring. Codegen'd scalar, no shuffle. */
case class Murmur3TokenTyped(child: Expression, keyType: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires the rendered key string, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "murmur3_token_typed"

  override protected def nullSafeEval(v: Any): Any = {
    val rendered = v.asInstanceOf[UTF8String].toString
    graft.sources.BigFormat.murmur3Token(
      graft.sources.BigFormat.encodeValue(keyType, rendered))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kt = ctx.addReferenceObj("keyType", keyType, "java.lang.String")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.sources.BigFormat.murmur3Token(
         |  graft.sources.BigFormat.encodeValue($kt, $a.toString()));
         |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Murmur3TokenTyped = copy(child = newChild)
}
