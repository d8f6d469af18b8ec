package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the embedding hot loop (SURVEY §2.11:
  * promote to codegen where benchmarks demand — the knn/near-dup joins
  * evaluate a dot product per candidate pair, and the higher-order-function
  * formulation (zip_with + aggregate) is interpreted per element).
  *
  * `graft_dot(a, b)` compiles to a tight primitive double loop inside
  * whole-stage codegen: no lambda dispatch, no boxing, no closures — the
  * form a 100 TB similarity pass needs. Accumulation is index-ascending,
  * so results are bit-identical to the sequential HOF fold (and to the
  * DuckDB oracle's list_sum).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val info = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")
}

/** `graft_isect(a, b)` — |a ∩ b| for two array<long> SORTED ASCENDING
  * (callers sort once at set-build time, e.g. Dedup's hashed-shingle
  * memo): a single allocation-free two-pointer merge per evaluation.
  *
  * Exists because `size(array_intersect(a, b))` builds a hash set and a
  * result array PER CALL — and when a derived filter (d4's
  * `jaccard_bp >= 5000`) is pushed into a join condition, Catalyst inlines
  * the intersect into every occurrence of the derived column (~15× in the
  * expanded ExactRatio CASE), so the hash-set cost multiplies. Measured at
  * sf1: d4's verify joins dropped 60 s → ~2 s with this expression; the
  * merge is so cheap the duplicate inlined evaluations stop mattering.
  *
  * Precondition is the caller's: on UNSORTED input the count is simply
  * wrong (no runtime sortedness check — it would cost the pass this
  * expression removes). Duplicate elements count once per aligned run,
  * so inputs should be sets (array_distinct) — both preconditions hold by
  * construction for the one producer ([[graft.operators.Dedup]]).
  *
  * NULL ELEMENTS are skipped in both eval paths (a null is never a match):
  * the in-repo producer emits non-null arrays, but the function is
  * SQL-registered and callable on arbitrary arrays, and an unguarded
  * getLong would read a null slot as 0 and silently miscount (ADVICE r8). */
case class SortedLongIntersect(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_isect expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_isect"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var acc = 0L
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { acc += 1L; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val acc = ctx.freshName("acc")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0;
         |long $acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i)) { $i++; continue; }
         |  if ($b.isNullAt($j)) { $j++; continue; }
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $acc++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersect {
  val info = new ExpressionInfo(classOf[SortedLongIntersect].getName, "graft_isect")
}
