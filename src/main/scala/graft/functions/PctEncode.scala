package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 percent-encoding as a native Catalyst expression with
  * whole-stage codegen (SURVEY.md §7.3 `UriTemplateExpand`'s scalar
  * core).
  *
  * Why custom: URI minting runs this on every templated field of every
  * row; the built-in formulation is a 4-pass chain
  * (`url_encode` + three `replace`s — application/x-www-form-urlencoded
  * fixed up to RFC 3986), i.e. four string materializations per value.
  * This expression is ONE pass over the UTF-8 bytes, zero-copy when
  * nothing needs escaping, and stays inside the codegen'd stage.
  *
  * Semantics are byte-identical to the chain (unreserved set
  * `A-Za-z0-9 - _ . ~`, everything else — including each byte of a
  * multi-byte UTF-8 sequence — becomes uppercase %XX), which the spec
  * property-checks against the chain on random unicode strings.
  */
@ExpressionDescription(
  usage = "_FUNC_(str) - RFC 3986 percent-encodes str (unreserved chars pass through).")
case class PctEncode(child: Expression) extends UnaryExpression {

  // callers guarantee a STRING child (the rule compiler casts every
  // template field); checkInputDataTypes guards miswiring
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_pct_encode expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_pct_encode"

  override protected def nullSafeEval(input: Any): Any =
    PctEncode.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PctEncode$$.MODULE$$.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): PctEncode =
    copy(child = newChild)
}

object PctEncode {

  private val HEX = "0123456789ABCDEF".getBytes

  @inline private def unreserved(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
    (b >= '0' && b <= '9') || b == '-' || b == '_' || b == '.' || b == '~'

  /** Single-pass encoder over the UTF-8 bytes; returns the input
    * object unchanged when no byte needs escaping.
    */
  def encode(s: UTF8String): UTF8String = {
    val in = s.getBytes
    var escapes = 0
    var i = 0
    while (i < in.length) { if (!unreserved(in(i))) escapes += 1; i += 1 }
    if (escapes == 0) return s
    val out = new Array[Byte](in.length + 2 * escapes)
    var o = 0
    i = 0
    while (i < in.length) {
      val b = in(i)
      if (unreserved(b)) { out(o) = b; o += 1 }
      else {
        out(o) = '%'
        out(o + 1) = HEX((b >> 4) & 0xf)
        out(o + 2) = HEX(b & 0xf)
        o += 3
      }
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column-API lift. */
  def apply(c: Column): Column = ColumnBridge.column(PctEncode(ColumnBridge.expression(c)))
}
