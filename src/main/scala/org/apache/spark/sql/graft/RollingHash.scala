// Lives under org.apache.spark.sql for private[sql] plumbing (see
// CleanTextExpr). Public facade: graft.functions.native_fns.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin rolling/polynomial fingerprint over a string's UTF-8 bytes:
  * `h = Σ b_i · B^(n-1-i) mod P` with base 257 and P = 2^61-1 — the
  * content-defined fingerprint of the builder brief ("document
  * fingerprinting (rolling hash)"). Position-sensitive (unlike the
  * sorted-token-set fingerprint in TextAnalysis) and incrementally
  * extendable, which is what makes rolling hashes the primitive for
  * content-defined chunking.
  *
  * A native expression (tier b) because per-byte modular arithmetic has
  * no efficient built-in composition (an explode per character would
  * shuffle-amplify 1000×), and no portable SQL form — so no DuckDB
  * oracle; semantics are pinned by unit tests against a reference
  * implementation.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {

  val Base = 257L
  val Mod = (1L << 61) - 1 // Mersenne prime 2^61-1

  /** (a*b) mod 2^61-1 without overflow, via 128-bit multiply. */
  private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product into mod 2^61-1: (x mod 2^61) + (x >> 61)
    val lo61 = lo & Mod
    val carry = (hi << 3) | (lo >>> 61)
    var r = lo61 + carry
    if (r >= Mod) r -= Mod
    r
  }

  /** Public + static so generated code can call it. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = mulMod(h, Base) + (bytes(i) & 0xff)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  def rolling_hash(c: Column): Column =
    ExpressionUtils.column(RollingHash(ExpressionUtils.expression(c)))
}
