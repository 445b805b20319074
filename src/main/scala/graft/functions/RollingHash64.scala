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

/** Per-window rolling hashes over a token array: element i of the
  * output is `RollingHash64` of the w-token window
  * `toks(i) ⧺ " " ⧺ … ⧺ toks(i+w-1)` — WITHOUT materializing any
  * window string. One pass builds prefix hashes P(x) = H(S[0..x)) over
  * the virtual space-joined document S plus a 31^k power table; each
  * window hash is then the O(1) range extraction
  * H(S[u..v)) = P(v) − P(u)·31^(v−u) (mod 2^64, Java long wraparound).
  * Total cost O(document bytes + windows) per row, independent of w —
  * the property that makes every-offset substring indexing affordable
  * at 100 TB, where the naive re-hash pays O(w · bytes) and allocates
  * a window string per position.
  *
  * The same composition law H(A ⧺ B) = H(A)·31^|B| + H(B) is what the
  * DuckDB oracle uses to rebuild window hashes from per-token folds
  * (ext/DedupOps.scala d65) — the oracle check pins the algebra the
  * rolling extraction relies on, at every window of the fixture.
  *
  * Returns n−w+1 hashes, or an empty array when the document has
  * fewer than w tokens. Null token elements (never produced by
  * TextOps.tokens) hash as empty strings. */
case class RollingWindowHash64(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"window size must be >= 1, got $w")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_window_hash64"

  override def nullSafeEval(input: Any): Any =
    RollingWindowHash64.windows(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingWindowHash64.windows($c, $w);")

  override protected def withNewChildInternal(
      newChild: Expression): RollingWindowHash64 = copy(child = newChild)
}

object RollingWindowHash64 {

  /** Shared by both eval paths (interpreted + codegen static call).
    * Scratch arrays are O(document bytes) per row — KB-scale for the
    * corpus shape this serves; freed per row. */
  def windows(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    if (n < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val toks = new Array[Array[Byte]](n)
    var total = 0
    var k = 0
    while (k < n) {
      val u = arr.getUTF8String(k)
      val b = if (u == null) Array.emptyByteArray else u.getBytes
      toks(k) = b
      total += b.length
      k += 1
    }
    val sLen = total + (n - 1) // single-space separators
    val pow = new Array[Long](sLen + 1)
    pow(0) = 1L
    var i = 1
    while (i <= sLen) { pow(i) = pow(i - 1) * 31L; i += 1 }
    val starts = new Array[Int](n)
    val pref = new Array[Long](sLen + 1)
    var off = 0
    var h = 0L
    k = 0
    while (k < n) {
      if (k > 0) { h = h * 31L + 32L; off += 1; pref(off) = h }
      starts(k) = off
      val b = toks(k)
      var j = 0
      while (j < b.length) {
        h = h * 31L + (b(j) & 0xffL); off += 1; pref(off) = h; j += 1
      }
      k += 1
    }
    val out = new Array[Long](n - w + 1)
    i = 0
    while (i <= n - w) {
      val u = starts(i)
      val v = starts(i + w - 1) + toks(i + w - 1).length
      out(i) = pref(v) - pref(u) * pow(v - u)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Column API: `rolling_window_hash64($"toks", 5)`. */
  def rolling_window_hash64(c: Column, w: Int): Column =
    Bridge.column(RollingWindowHash64(Bridge.expression(c), w))
}
