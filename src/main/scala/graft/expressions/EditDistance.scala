package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_lev(s, t, k)` — THRESHOLD-BANDED Levenshtein distance: the exact
  * edit distance when it is ≤ k, else −1. The band IS the fuzzy-dedup
  * verify contract (operators/Dedup.editVerify): distances beyond the flag
  * radius are not part of the answer, so the DP never fills cells that
  * could only prove "far apart" — Ukkonen's O(min(n,m)·k) band with an
  * early exit as soon as a full row exceeds k, and the |n−m| > k length
  * check (dist ≥ length gap) as its O(1) first line.
  *
  * Why not Spark's built-in `levenshtein(s, t, threshold)`: measured
  * ~16 ms per ~300-char pair on the sf1 candidate set (256k pairs = 128 s
  * on 32 cores) — three orders of magnitude over the arithmetic cost of
  * the band. This expression runs the DP over the raw UTF8 BYTES when both
  * inputs are pure ASCII (byte edits ≡ char edits there; one flat array
  * access per cell, two reused int rows, no per-cell decode) and falls
  * back to a CODE-POINT band for multi-byte inputs (one decode pass, then
  * the same flat-array DP) — the same code-point semantics as Spark's
  * builtin `levenshtein`, spec-compared against it on fixtures including
  * astral-plane characters. Honest oracle boundary: DuckDB's
  * `levenshtein` is BYTE-based (lev('é','x') = 2 there), so the d10/d10b
  * DuckDB gate agrees only on ASCII corpora — which the testdata is; a
  * non-ASCII corpus keeps Spark-side correctness (builtin parity) but
  * would need a byte-normalized oracle.
  *
  * k is a per-ROW expression (the decision radius depends on each pair's
  * max length) — the built-in only accepts a literal threshold, which
  * forced a loose power-of-two band bucketing. k < 0 returns −1 (an empty
  * band proves nothing is within it; keeps the expression total). */
case class BandedLevenshtein(first: Expression, second: Expression,
                             third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
      third.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lev expects (string, string, bigint), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lev"

  override def nullSafeEval(a: Any, b: Any, k: Any): Any =
    BandedLevenshtein.dist(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, k) =>
      s"${ev.value} = graft.expressions.BandedLevenshtein.dist($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BandedLevenshtein {
  val info = new ExpressionInfo(classOf[BandedLevenshtein].getName, "graft_lev")

  /** Exact distance if ≤ k, else −1. Called from generated code. */
  def dist(a: UTF8String, b: UTF8String, k: Long): Long = {
    if (k < 0L) return -1L
    // ASCII ⇒ bytes are chars: run the band over the raw byte arrays
    if (a.numBytes == a.numChars && b.numBytes == b.numChars) {
      bandedBytes(a.getBytes, b.getBytes, math.min(k, Int.MaxValue - 2L).toInt)
    } else {
      // CODE POINTS, not UTF-16 units (ADVICE r10): an astral character is
      // ONE edit in Spark's builtin — charAt-based iteration counted its
      // surrogate pair as two (DuckDB parity boundary: see the class doc)
      bandedCodePoints(a.toString.codePoints.toArray,
        b.toString.codePoints.toArray, math.min(k, Int.MaxValue - 2L).toInt)
    }
  }

  private def bandedBytes(s: Array[Byte], t: Array[Byte], k: Int): Long = {
    val n = s.length; val m = t.length
    if (math.abs(n - m) > k) return -1L
    val inf = k + 1
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k); val hi = math.min(m, i + k)
      cur(lo - 1) = if (lo == 1 && i <= k) i else inf
      var rowMin = cur(lo - 1)
      j = lo
      while (j <= hi) {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        var d = prev(j - 1) + cost
        val del = (if (j <= i + k - 1) prev(j) else inf) + 1
        if (del < d) d = del
        val ins = cur(j - 1) + 1
        if (ins < d) d = ins
        if (d > inf) d = inf
        cur(j) = d
        if (d < rowMin) rowMin = d
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf
      if (rowMin > k) return -1L
      // copy the band (and the inf sentinel just past it) into prev
      var c = lo - 1
      while (c <= math.min(m, hi + 1)) { prev(c) = cur(c); c += 1 }
      i += 1
    }
    val res = prev(m)
    if (res > k) -1L else res.toLong
  }

  private def bandedCodePoints(s: Array[Int], t: Array[Int], k: Int): Long = {
    val n = s.length; val m = t.length
    if (math.abs(n - m) > k) return -1L
    val inf = k + 1
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k); val hi = math.min(m, i + k)
      cur(lo - 1) = if (lo == 1 && i <= k) i else inf
      var rowMin = cur(lo - 1)
      j = lo
      while (j <= hi) {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        var d = prev(j - 1) + cost
        val del = (if (j <= i + k - 1) prev(j) else inf) + 1
        if (del < d) d = del
        val ins = cur(j - 1) + 1
        if (ins < d) d = ins
        if (d > inf) d = inf
        cur(j) = d
        if (d < rowMin) rowMin = d
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf
      if (rowMin > k) return -1L
      var c = lo - 1
      while (c <= math.min(m, hi + 1)) { prev(c) = cur(c); c += 1 }
      i += 1
    }
    val res = prev(m)
    if (res > k) -1L else res.toLong
  }
}
