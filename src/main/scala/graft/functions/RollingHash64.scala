package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * h ← h·31 + byte (64-bit wraparound). The native-Expression tier of
  * document fingerprinting (SURVEY.md §4 candidate (b)): one pass over
  * the bytes, fully inside whole-stage codegen — no UDF serialization,
  * no object allocation per row.
  *
  * Not oracle-checked: DuckDB BIGINT arithmetic traps on overflow
  * rather than wrapping, so the twin would need 128-bit emulation; the
  * contract is pinned by RollingHash64.reference + unit tests instead.
  */
case class RollingHash64(child: Expression)
    extends UnaryExpression {

  // no ImplicitCastInputTypes (its AbstractDataType is private[sql]);
  // callers pass strings — the SQL registration casts explicitly
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any =
    RollingHash64.reference(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 31L + (long)($bytes[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {

  /** Reference implementation the Expression (both eval paths) must
    * agree with. */
  def reference(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  /** Column API: `rolling_hash64($"text")`. */
  def rolling_hash64(c: Column): Column =
    Bridge.column(RollingHash64(Bridge.expression(c)))
}
