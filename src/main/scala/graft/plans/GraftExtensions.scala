package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graft.{CleanTextExpr, QuantizedDot, RollingHash, StripAccents, UnicodeNormalize}

/** Engine extension point (SURVEY §4): registers every tier of graft's
  * custom-operator stack — native expressions for SQL use, the
  * window-top-k optimizer rewrite, and the planner strategy for the
  * bounded-heap grouped top-k operator. (The reference itself needs none
  * of these — its ops are all Catalyst built-ins — they are the
  * beyond-reference engine surface.)
  *
  * Usage:
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  * or config: spark.sql.extensions=graft.plans.GraftExtensions
  * After which: SELECT clean_text(col) FROM ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cleanTextDescriptor)
    ext.injectFunction(GraftExtensions.quantizedDotDescriptor)
    ext.injectFunction(GraftExtensions.doubleDotDescriptor)
    ext.injectFunction(GraftExtensions.unicodeNormalizeDescriptor)
    ext.injectFunction(GraftExtensions.stripAccentsDescriptor)
    ext.injectFunction(GraftExtensions.rollingHashDescriptor)
    ext.injectFunction(GraftExtensions.jaroWinklerDescriptor)
    ext.injectFunction(GraftExtensions.bucketIndexDescriptor)
    // aggregate tier (TypedImperativeAggregates)
    ext.injectFunction(GraftExtensions.mgSketchDescriptor)
    ext.injectFunction(GraftExtensions.kllMergeDescriptor)
    // whole-operator tier: grouped top-k via per-key bounded heaps
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKPerKeyStrategy)
    // optimizer tier: window row_number top-k idiom → the heap operator
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.WindowTopKRewrite)
  }
}

object GraftExtensions {

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map("functionName" -> name,
            "expectedNum" -> n.toString,
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      build(children)
    }

  val cleanTextDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("clean_text"),
    new ExpressionInfo(classOf[CleanTextExpr].getName, "clean_text"),
    arity("clean_text", 1)(children => CleanTextExpr(children.head)))

  val quantizedDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("quantized_dot"),
    new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
    arity("quantized_dot", 2)(children => QuantizedDot(children(0), children(1))))

  val doubleDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("double_dot"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.graft.DoubleDot].getName, "double_dot"),
    arity("double_dot", 2)(children =>
      org.apache.spark.sql.graft.DoubleDot(children(0), children(1))))

  val unicodeNormalizeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("unicode_normalize"),
    new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
    arity("unicode_normalize", 2)(children => children(1) match {
      // the normalization form must be a literal: it selects the codegen
      // path at plan time, exactly like the pattern arg of RLIKE
      case org.apache.spark.sql.catalyst.expressions.Literal(f, _)
          if f != null =>
        UnicodeNormalize(children.head, f.toString)
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INVALID_PARAMETER_VALUE.PATTERN",
        messageParameters = Map("parameter" -> "form",
          "functionName" -> "unicode_normalize",
          "value" -> "non-literal"))
    }))

  val stripAccentsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("strip_accents"),
    new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
    arity("strip_accents", 1)(children => StripAccents(children.head)))

  val rollingHashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
    arity("rolling_hash", 1)(children => RollingHash(children.head)))

  val jaroWinklerDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.graft.JaroWinklerExpr].getName,
      "jaro_winkler"),
    arity("jaro_winkler", 2)(children =>
      org.apache.spark.sql.graft.JaroWinklerExpr(children(0), children(1))))

  val bucketIndexDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bucket_index"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.graft.BucketIndex].getName,
      "bucket_index"),
    arity("bucket_index", 2)(children =>
      org.apache.spark.sql.graft.BucketIndex(children(0), children(1))))

  /** The `k` parameter of the aggregate tier must be a foldable
    * integer: it sizes driver/executor state at PLAN time (exactly
    * like the form argument of unicode_normalize). */
  private def literalK(name: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, dt)
        if v != null && Seq[org.apache.spark.sql.types.DataType](
          org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType,
          org.apache.spark.sql.types.ShortType,
          org.apache.spark.sql.types.ByteType).contains(dt) =>
      v.toString.toInt
    case _ => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INVALID_PARAMETER_VALUE.PATTERN",
      messageParameters = Map("parameter" -> "k",
        "functionName" -> name, "value" -> "non-literal"))
  }

  // aggregate tier: the analyzer wraps a bare AggregateFunction from a
  // registry builder in its AggregateExpression, same as built-ins
  val mgSketchDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("mg_sketch"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.graft.MisraGriesAgg].getName,
      "mg_sketch"),
    arity("mg_sketch", 2)(children =>
      org.apache.spark.sql.graft.MisraGriesAgg(children(0),
        literalK("mg_sketch", children(1)))))

  val kllMergeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kll_merge"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.graft.KllMergeAgg].getName,
      "kll_merge"),
    arity("kll_merge", 2)(children =>
      org.apache.spark.sql.graft.KllMergeAgg(children(0),
        literalK("kll_merge", children(1)))))

  private val allDescriptors = Seq(cleanTextDescriptor,
    quantizedDotDescriptor, doubleDotDescriptor, unicodeNormalizeDescriptor,
    stripAccentsDescriptor, rollingHashDescriptor, jaroWinklerDescriptor,
    bucketIndexDescriptor, mgSketchDescriptor, kllMergeDescriptor)

  /** Imperative registration on an existing session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    allDescriptors.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "scala_udf")
    }
}
