package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Native SHA-512/256 expression (F1, rpc.js:320-322): binary → binary with
  * doGenCode emitting a direct static call — no UDF row conversion, no
  * closure serialization. The digest itself is Crypto.sha512_256 (JDK,
  * ThreadLocal instance); codegen only removes the per-row UDF plumbing,
  * which dominated f1_block_id_join's profile. */
case class Sha512_256(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sha512_256 expects binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_sha512_256"

  override def nullSafeEval(input: Any): Any =
    graft.functions.Crypto.sha512_256(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Crypto.sha512_256($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sha512_256 {
  val info = new ExpressionInfo(classOf[Sha512_256].getName, "graft_sha512_256")
}
