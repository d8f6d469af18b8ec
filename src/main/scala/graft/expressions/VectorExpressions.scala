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

/** `graft_argmax_cell(v, scale, cents, aux, mode)` — row-local argmax of a
  * per-centroid score over a FOLDABLE codebook, returning the winning
  * centroid's INDEX (0-based, ascending order of the `cents` array; callers
  * map index → cell_id). Modes (mode is a foldable string):
  *
  *   - "dot": score_c = ⟨v, cents[c]⟩                      (k-means training)
  *   - "cos": score_c = ⟨v, cents[c]⟩ / (scale · aux[c])   (serving; scale =
  *            the row's norm, aux = centroid norms)
  *   - "l2":  score_c = 2·⟨v, cents[c]⟩ − aux[c]           (PQ; aux = ‖c‖²)
  *
  * Ties break to the SMALLER index and NaN sorts greatest — exactly the
  * (score DESC, cell_id ASC) total order of the two plans this replaces
  * (the k-literal `greatest()` unroll and the broadcast-join + max(struct)
  * form): strict `>` while scanning ascending keeps the earlier index on
  * equal scores (including −0.0 vs 0.0, which SQLOrderingUtil.compareDoubles
  * also treats as equal), and the explicit NaN branch replicates
  * nanSafeCompareDoubles' NaN-greatest rule. Dot products accumulate
  * index-ascending over min(|v|, dim) — bit-identical to graft_dot and the
  * oracle's list_sum fold.
  *
  * Why an expression and not the join form: the join scored n·k THIN ROWS
  * through a partial aggregate and re-joined the payload — at the sf100
  * rehearsal (n = 2 M, k = 1415) that is 2.8 B row materializations for a
  * row-local argmax (memo:cell_asg 240 s). This loop does the same flops
  * with zero row traffic. Why not the unrolled greatest(): k literal struct
  * scores inflate analysis and generated code O(k·dim) — and re-planning
  * with fresh centroid literals (k-means iterations) recompiled per round;
  * here the codebook lives in the references array, so the generated source
  * is constant and the codegen cache hits across iterations. */
case class CellArgmax(vec: Expression, scale: Expression, cents: Expression,
                      aux: Expression, mode: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(vec, scale, cents, aux, mode)
  override def nullable: Boolean = vec.nullable || scale.nullable
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_argmax_cell"

  override def checkInputDataTypes(): TypeCheckResult = {
    def dArr(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true; case _ => false }
    def dArr2(t: DataType) = t match {
      case ArrayType(ArrayType(DoubleType, _), _) => true; case _ => false }
    if (!dArr(vec.dataType))
      TypeCheckResult.TypeCheckFailure("vec must be array<double>")
    else if (scale.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure("scale must be double")
    else if (!dArr2(cents.dataType) || !cents.foldable)
      TypeCheckResult.TypeCheckFailure("cents must be a foldable array<array<double>>")
    else if (!dArr(aux.dataType) || !aux.foldable)
      TypeCheckResult.TypeCheckFailure("aux must be a foldable array<double>")
    else if (mode.dataType != org.apache.spark.sql.types.StringType || !mode.foldable)
      TypeCheckResult.TypeCheckFailure("mode must be a foldable string")
    else {
      val m = mode.eval(null).toString
      if (m != "dot" && m != "cos" && m != "l2")
        TypeCheckResult.TypeCheckFailure(s"unknown mode '$m' (dot|cos|l2)")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  // codebook flattened row-major (k·dim) once per plan; lives in the codegen
  // references array, never in generated source
  private lazy val (flat: Array[Double], dim: Int) = {
    val a = cents.eval(null).asInstanceOf[ArrayData]
    val k = a.numElements()
    val d = if (k == 0) 0 else a.getArray(0).numElements()
    val f = new Array[Double](k * d)
    var c = 0
    while (c < k) {
      val row = a.getArray(c)
      var i = 0
      while (i < d) { f(c * d + i) = row.getDouble(i); i += 1 }
      c += 1
    }
    (f, d)
  }
  private lazy val auxArr: Array[Double] = {
    val a = aux.eval(null).asInstanceOf[ArrayData]
    val out = new Array[Double](a.numElements())
    var i = 0
    while (i < out.length) { out(i) = a.getDouble(i); i += 1 }
    out
  }
  private lazy val modeId: Int = mode.eval(null).toString match {
    case "dot" => 0; case "cos" => 1; case "l2" => 2
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val sc = scale.eval(input)
    if (sc == null) return null
    CellArgmax.argmax(v.asInstanceOf[ArrayData],
      sc.asInstanceOf[Double], flat, auxArr, dim, modeId)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val vc = vec.genCode(ctx)
    val sc = scale.genCode(ctx)
    val flatRef = ctx.addReferenceObj("centsFlat", flat, "double[]")
    val auxRef = ctx.addReferenceObj("auxArr", auxArr, "double[]")
    ev.copy(code =
      code"""
        ${vc.code}
        ${sc.code}
        boolean ${ev.isNull} = ${vc.isNull} || ${sc.isNull};
        int ${ev.value} = -1;
        if (!${ev.isNull}) {
          ${ev.value} = graft.expressions.CellArgmax.argmax(
            ${vc.value}, ${sc.value}, $flatRef, $auxRef,
            $flatRef.length / $auxRef.length, $modeId);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), scale = newChildren(1), cents = newChildren(2),
      aux = newChildren(3), mode = newChildren(4))
}

object CellArgmax {
  val info = new ExpressionInfo(classOf[CellArgmax].getName, "graft_argmax_cell")

  /** The shared eval/codegen kernel (static forwarder — callable from
    * generated Java). See the class doc for the exact comparison contract. */
  def argmax(v: ArrayData, scale: Double, flat: Array[Double],
             aux: Array[Double], dim: Int, mode: Int): Int = {
    val k = aux.length
    val vn = v.numElements()
    val n = if (vn < dim) vn else dim
    var best = -1
    var bestScore = 0.0
    var c = 0
    while (c < k) {
      var acc = 0.0
      val off = c * dim
      var i = 0
      while (i < n) { acc += v.getDouble(i) * flat(off + i); i += 1 }
      val score =
        if (mode == 0) acc
        else if (mode == 1) acc / (scale * aux(c))
        else 2.0 * acc - aux(c)
      if (best < 0 || score > bestScore ||
          (java.lang.Double.isNaN(score) && !java.lang.Double.isNaN(bestScore))) {
        best = c; bestScore = score
      }
      c += 1
    }
    best
  }
}

/** `graft_simhash(hs, nbits)` — the SimHash bit-vote signature over an
  * array of 32-char lowercase-hex digests in ONE pass: for bit p (1-based),
  * each digest votes +1 iff its p-th hex character is ≥ '8', else −1
  * (a NULL digest or a digest shorter than p chars votes −1, matching the
  * `substring(h, p, 1) >= "8"` fold it replaces: NULL comparison and "" ≥
  * "8" both fall to the otherwise(−1) branch); bit p of the result is set
  * iff its vote sum is > 0. Returns a long with the low `nbits` bits.
  *
  * Replaces nbits interpreted aggregate() folds per row (16 for d3's
  * per-token signature, 32 for the shingle signature the d8/cc family
  * builds on), each re-scanning the digest array with a per-element
  * substring allocation — the votes are commutative integer sums, so one
  * array scan accumulating all nbits counters is value-identical.
  * PRECONDITION (the graft_isect convention): digests are ASCII (the one
  * producer emits md5 hex), so byte indexing equals the old substring's
  * code-point indexing. */
case class SimHashBits(hs: Expression, nbits: Expression) extends BinaryExpression {
  override def left: Expression = hs
  override def right: Expression = nbits

  override def checkInputDataTypes(): TypeCheckResult = hs.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _)
      if nbits.dataType == org.apache.spark.sql.types.IntegerType && nbits.foldable =>
      val n = nbits.eval(null).asInstanceOf[Int]
      if (n >= 1 && n <= 63) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"nbits must be in [1, 63], got $n")
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_simhash expects (array<string>, foldable int)")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  // a NULL digest ARRAY yields 0, not NULL — the fold this replaces summed
  // nbits `when(bitVote > 0, bit).otherwise(0)` terms, and a null array
  // nulls every vote, landing every term in otherwise(0)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = hs.eval(input)
    if (a == null) 0L
    else SimHashBits.signature(a.asInstanceOf[ArrayData],
      nbits.eval(input).asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ac = hs.genCode(ctx)
    val bc = nbits.genCode(ctx)
    ev.copy(code =
      code"""
        ${ac.code}
        ${bc.code}
        boolean ${ev.isNull} = false;
        long ${ev.value} = ${ac.isNull} ? 0L :
          graft.expressions.SimHashBits.signature(${ac.value}, ${bc.value});
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(hs = newLeft, nbits = newRight)
}

object SimHashBits {
  val info = new ExpressionInfo(classOf[SimHashBits].getName, "graft_simhash")

  /** Static kernel (see class doc): one pass over the digest array,
    * accumulating all nbits vote counters; ASCII byte p-1 ≥ '8' is the
    * old `substring(h, p, 1) >= "8"` on hex digests. */
  def signature(hs: ArrayData, nbits: Int): Long = {
    val n = hs.numElements()
    val votes = new Array[Int](nbits)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) {
        var p = 0
        while (p < nbits) { votes(p) -= 1; p += 1 }
      } else {
        val s = hs.getUTF8String(i)
        val len = s.numBytes()
        var p = 0
        while (p < nbits) {
          if (p < len && s.getByte(p) >= '8') votes(p) += 1 else votes(p) -= 1
          p += 1
        }
      }
      i += 1
    }
    var out = 0L
    var p = 0
    while (p < nbits) {
      if (votes(p) > 0) out |= (1L << p)
      p += 1
    }
    out
  }
}

/** `graft_minhash(hs, seeds)` — all k MinHash signatures over a pre-hashed
  * shingle array in ONE pass: element j of the result is min over the
  * array of (h XOR seeds[j]), skipping NULL elements; an empty (or
  * all-NULL) array yields a NULL element — exactly
  * `array_min(transform(hs, h => h ^ seed_j))` per seed, which the band
  * signature previously ran as k interpreted transform passes each
  * allocating an intermediate array per row (the signature pass is the
  * dominant cost of every LSH index build/admit). `seeds` is foldable
  * array<long>; XOR and long compare are exact, so signatures (and every
  * persisted band index) are bit-identical to the per-seed folds. */
case class MinHashXor(hs: Expression, seeds: Expression) extends BinaryExpression {
  override def left: Expression = hs
  override def right: Expression = seeds

  override def checkInputDataTypes(): TypeCheckResult =
    (hs.dataType, seeds.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) if seeds.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_minhash expects (array<bigint>, foldable array<bigint>)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  private lazy val seedArr: Array[Long] = {
    val a = seeds.eval(null).asInstanceOf[ArrayData]
    val out = new Array[Long](a.numElements())
    var i = 0
    while (i < out.length) { out(i) = a.getLong(i); i += 1 }
    out
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashXor.mins(a.asInstanceOf[ArrayData], seedArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("mhSeeds", seedArr, "long[]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      s"${ev.value} = graft.expressions.MinHashXor.mins($a, $seedsRef);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(hs = newLeft, seeds = newRight)
}

object MinHashXor {
  val info = new ExpressionInfo(classOf[MinHashXor].getName, "graft_minhash")

  /** Static kernel: per seed, min over non-null (h ^ seed); no non-null
    * element → null slot (array_min semantics). */
  def mins(hs: ArrayData, seeds: Array[Long]): ArrayData = {
    val n = hs.numElements()
    val k = seeds.length
    val out = new Array[Any](k)
    val acc = new Array[Long](k)
    var any = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        if (!any) {
          var j = 0
          while (j < k) { acc(j) = h ^ seeds(j); j += 1 }
          any = true
        } else {
          var j = 0
          while (j < k) {
            val x = h ^ seeds(j)
            if (x < acc(j)) acc(j) = x
            j += 1
          }
        }
      }
      i += 1
    }
    if (any) {
      var j = 0
      while (j < k) { out(j) = acc(j); j += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `graft_pq_codes(v, subCents, subSqs)` — the full product-quantization
  * encode in ONE row-local pass: for each of the M subspaces, the argmax
  * over its K codewords of 2·⟨v_sub, cw⟩ − ‖cw‖² (≡ argmin reconstruction
  * L2), returned as an array<int> of M codes (code = codeword index; the
  * producers pin codeword ids to 0..K−1 positionally).
  *
  * subCents is a foldable array<array<array<double>>> (M × K × subDim),
  * subSqs a foldable array<array<double>> (M × K) of Scala-computed ‖cw‖²
  * (ascending-fold — the exact literals the previous unrolled form embedded).
  * Score arithmetic, tie order (smaller code), and NaN rule match the
  * unrolled `greatest()` per-subspace argmax bit for bit; the subspace dot
  * reads v[m·subDim + i] directly, which removes the 2·M·K slice() array
  * allocations per row that made the encode allocation-bound (memo:pq_codes
  * 115 s at sf100 for ~4 GFLOP of real work). */
case class PqCodes(vec: Expression, cents: Expression, sqs: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(vec, cents, sqs)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  override def checkInputDataTypes(): TypeCheckResult = {
    def dArr(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true; case _ => false }
    val c3 = cents.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false }
    val s2 = sqs.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true; case _ => false }
    if (!dArr(vec.dataType))
      TypeCheckResult.TypeCheckFailure("vec must be array<double>")
    else if (!c3 || !cents.foldable)
      TypeCheckResult.TypeCheckFailure(
        "subCents must be a foldable array<array<array<double>>>")
    else if (!s2 || !sqs.foldable)
      TypeCheckResult.TypeCheckFailure(
        "subSqs must be a foldable array<array<double>>")
    else TypeCheckResult.TypeCheckSuccess
  }

  // (M, K, subDim) + both tables flattened row-major, resolved once per plan
  private lazy val (flat: Array[Double], sqFlat: Array[Double], m_ : Int,
      k_ : Int, sub_ : Int) = {
    val a = cents.eval(null).asInstanceOf[ArrayData]
    val mm = a.numElements()
    val kk = if (mm == 0) 0 else a.getArray(0).numElements()
    val ss = if (kk == 0) 0 else a.getArray(0).getArray(0).numElements()
    val f = new Array[Double](mm * kk * ss)
    val q = new Array[Double](mm * kk)
    val sq = sqs.eval(null).asInstanceOf[ArrayData]
    var m = 0
    while (m < mm) {
      val km = a.getArray(m); val sm = sq.getArray(m)
      var c = 0
      while (c < kk) {
        val row = km.getArray(c)
        var i = 0
        while (i < ss) { f((m * kk + c) * ss + i) = row.getDouble(i); i += 1 }
        q(m * kk + c) = sm.getDouble(c)
        c += 1
      }
      m += 1
    }
    (f, q, mm, kk, ss)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      PqCodes.encode(v.asInstanceOf[ArrayData], flat, sqFlat, m_, k_, sub_))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val vc = vec.genCode(ctx)
    val flatRef = ctx.addReferenceObj("pqCentsFlat", flat, "double[]")
    val sqRef = ctx.addReferenceObj("pqSqFlat", sqFlat, "double[]")
    val shape = ctx.addReferenceObj("pqShape", Array(m_, k_, sub_), "int[]")
    ev.copy(code =
      code"""
        ${vc.code}
        boolean ${ev.isNull} = ${vc.isNull};
        ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
            graft.expressions.PqCodes.encode(${vc.value}, $flatRef, $sqRef,
              $shape[0], $shape[1], $shape[2]));
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), cents = newChildren(1), sqs = newChildren(2))
}

object PqCodes {
  val info = new ExpressionInfo(classOf[PqCodes].getName, "graft_pq_codes")

  /** Static kernel (see class doc): per subspace m, argmax over its K
    * codewords of 2·dot − ‖cw‖², dot folding ascending over the v slice
    * that exists (graft_dot's min-length rule on the old slice() form). */
  def encode(v: ArrayData, flat: Array[Double], sq: Array[Double],
             mm: Int, kk: Int, sub: Int): Array[Int] = {
    val vn = v.numElements()
    val out = new Array[Int](mm)
    var m = 0
    while (m < mm) {
      val voff = m * sub
      val avail = vn - voff
      val n = if (avail <= 0) 0 else if (avail < sub) avail else sub
      var best = -1
      var bestScore = 0.0
      var c = 0
      while (c < kk) {
        var acc = 0.0
        val coff = (m * kk + c) * sub
        var i = 0
        while (i < n) { acc += v.getDouble(voff + i) * flat(coff + i); i += 1 }
        val score = 2.0 * acc - sq(m * kk + c)
        if (best < 0 || score > bestScore ||
            (java.lang.Double.isNaN(score) && !java.lang.Double.isNaN(bestScore))) {
          best = c; bestScore = score
        }
        c += 1
      }
      out(m) = best
      m += 1
    }
    out
  }
}
