// Lives under org.apache.spark.sql for private[sql] plumbing (see
// CleanTextExpr). Public facade: graft.functions.native_fns.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen'd expression —
  * the entity-resolution scorer for the blocking operators
  * (`Dedup.sortedNeighborhoodPairs`, `EditDistJoin`): cheap enough to
  * run on every candidate pair, and unlike edit distance it rewards
  * shared prefixes, which is what typo'd names actually preserve.
  *
  * Semantics pinned to the de-facto standard (and probed against
  * DuckDB's `jaro_winkler_similarity`, which is the oracle):
  *   - Jaro: match window ⌊max(|a|,|b|)/2⌋−1, transpositions halved;
  *     either side empty → 0.0 (both-empty included).
  *   - Winkler boost ONLY when jaro > 0.7: jw = j + ℓ·0.1·(1−j) with
  *     ℓ = common prefix capped at 4.
  *
  * Comparison is per UTF-16 char — identical to byte/codepoint
  * comparison on ASCII, which is the blocking-key domain; oracle
  * queries round to 6 dp since the last-ulp summation order inside
  * other engines is not contractual.
  *
  * The work happens in a static helper invoked from BOTH the
  * interpreted eval and the generated code (the standard Spark pattern
  * for nontrivial string kernels — StringUtils-style): the expression
  * stays inside whole-stage codegen with primitive UTF8String inputs
  * and no boxing; only the O(|a|+window) kernel is a call.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.JaroWinklerExpr" +
        s".similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {

  /** Static kernel shared by interpreted eval and generated code. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!matchedB(j) && a.charAt(i) == b.charAt(j)) {
          matchedA(i) = true; matchedB(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val cap = math.min(4, math.min(la, lb))
    while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  def jaro_winkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinklerExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
