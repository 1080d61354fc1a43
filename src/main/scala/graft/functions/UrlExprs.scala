package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String
import graft.canon.UrlCanon

/** Native Catalyst expressions for the URL hot path.
  *
  * The RFC-3986 canonicalizer runs on EVERY spawned link of every superstep
  * (candidate dedup keys, north rule) — at crawl scale that is the single
  * hottest scalar function in the engine. As a `ScalaUDF` each call pays
  * closure dispatch + CatalystTypeConverters boxing and acts as a codegen
  * fence; as a native `UnaryExpression` with `doGenCode` the call inlines
  * into whole-stage codegen as one static method invocation on the
  * already-materialized `UTF8String`.
  */
abstract class UrlStringExpr extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  /** Fully-qualified static method the codegen calls; must accept and
    * return String and be total for non-null input.
    */
  protected def staticFn: String

  protected def call(s: String): String

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(call(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString($staticFn($c.toString()))")
}

/** `canon_url(url)` — RFC-3986 canonical form (see [[UrlCanon.canonicalize]]). */
case class UrlCanonExpr(child: Expression) extends UrlStringExpr {
  override protected def staticFn: String = "graft.canon.UrlCanon.canonicalize"
  override protected def call(s: String): String = UrlCanon.canonicalize(s)
  override def prettyName: String = "canon_url"
  override protected def withNewChildInternal(newChild: Expression): UrlCanonExpr =
    copy(child = newChild)
}

/** `url_host(url)` — lowercased host component (see [[UrlCanon.host]]). */
case class UrlHostExpr(child: Expression) extends UrlStringExpr {
  override protected def staticFn: String = "graft.canon.UrlCanon.host"
  override protected def call(s: String): String = UrlCanon.host(s)
  override def prettyName: String = "url_host"
  override protected def withNewChildInternal(newChild: Expression): UrlHostExpr =
    copy(child = newChild)
}

/** Session extension registering the native URL functions for SQL use:
  * `spark.sql.extensions=graft.functions.GraftExtensions`, then
  * `SELECT canon_url(url), url_host(url) ...`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("canon_url"),
      new ExpressionInfo(classOf[UrlCanonExpr].getName, "canon_url"),
      (exprs: Seq[Expression]) => UrlCanonExpr(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("url_host"),
      new ExpressionInfo(classOf[UrlHostExpr].getName, "url_host"),
      (exprs: Seq[Expression]) => UrlHostExpr(exprs.head)))
    ext.injectFunction(VecExprs.registration)
  }
}
