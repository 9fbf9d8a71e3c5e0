// Lives under org.apache.spark.sql for private[sql] plumbing (see
// CleanTextExpr). Public facade: graft.functions.native_fns (and
// graft.io.ZoneMap, the one consumer).
package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the manifest layer (`graft.io.ZoneMap`) —
  * both run once per MANIFEST row (|files|), never per data row, so a
  * UDF was never a throughput problem; they are expressions because an
  * engine whose extension tier is codegen'd Catalyst expressions
  * should not carry serialization-boundary UDFs for mechanical
  * per-row work anywhere.
  */
object ManifestExprs {

  /** Hadoop-Path normalization of a path/URI string — scheme kept,
    * `//` runs collapsed, trailing `/` trimmed — the exact equivalence
    * used to match `input_file_name()` output against file listings.
    * Codegen'd via a static call; NOT the built-in `url_decode` (form
    * decoding turns a literal `+` into a space) and nothing built-in
    * reproduces hadoop's normalization.
    */
  def norm_path(c: Column): Column =
    ExpressionUtils.column(PathNormExpr(ExpressionUtils.expression(c)))

  /** Per-row Bloom probe: true if `key` may be in the ROW'S OWN
    * serialized `spark.util.sketch.BloomFilter` bytes; false =
    * definitely absent. The codegen'd built-in
    * `BloomFilterMightContain` requires a FOLDABLE (plan-constant)
    * filter — here the filter is the per-row data (one per manifest
    * row), which only this expression can express. Deserializes per
    * row by necessity; |files|-scale by contract.
    */
  def bloom_probe(bloom: Column, key: Column): Column =
    ExpressionUtils.column(BloomProbeExpr(
      ExpressionUtils.expression(bloom),
      ExpressionUtils.expression(key)))
}

case class PathNormExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "norm_path"

  override def nullSafeEval(s: Any): Any =
    PathNormExpr.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.PathNormExpr.normalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): PathNormExpr = copy(child = newChild)
}

object PathNormExpr {
  /** The JVM-side normalization (shared with codegen): parse as URI if
    * scheme-qualified, else as a bare path; fall back to the raw-path
    * constructor on any parse failure.
    */
  def normalize(s: UTF8String): UTF8String =
    UTF8String.fromString(normalizeString(s.toString))

  def normalizeString(s: String): String = {
    val p =
      try {
        val u = new java.net.URI(s)
        if (u.getScheme != null) new org.apache.hadoop.fs.Path(u)
        else new org.apache.hadoop.fs.Path(s)
      } catch {
        case _: Exception => new org.apache.hadoop.fs.Path(s)
      }
    p.toString
  }
}

case class BloomProbeExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override def nullSafeEval(bytes: Any, key: Any): Any =
    BloomProbeExpr.mightContain(bytes.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"org.apache.spark.sql.graft.BloomProbeExpr.mightContain($b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbeExpr =
    copy(left = newLeft, right = newRight)
}

object BloomProbeExpr {
  def mightContain(bytes: Array[Byte], key: Long): Boolean =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new ByteArrayInputStream(bytes))
      .mightContainLong(key)
}
