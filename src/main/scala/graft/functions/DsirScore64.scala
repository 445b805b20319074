package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Row-local DSIR scoring as ONE codegen'd expression: for a token
  * array, fold Σ model[md5_60("dsir:" + tok[i] + " " + tok[i+1]) mod m]
  * over all bigrams, returning [n_feats, w_micro] — the whole
  * data-selection scorer as a per-row loop with zero explode, zero
  * join, zero exchange.
  *
  * Why an Expression and not the Column-API spellings (the SURVEY §4
  * preference ladder, resolved by measurement — SCALE_DECADE round 14):
  *  - the exploded bigram stream + broadcast model join + per-doc
  *    re-aggregation is codegen'd but pays a doc-keyed exchange whose
  *    partial aggregation cannot collapse (millions of groups), and
  *    read second-decade exponent 1.04–1.06 whether the final
  *    re-attach was a sort-merge join (round 13) or a union (round
  *    14) — the aggregate itself is the super-linear term;
  *  - the higher-order-function fold (`transform` + `aggregate` over
  *    a literal array) has no exchange at all but evaluates
  *    INTERPRETED per element — md5, concat, and the fold each
  *    allocate through the expression interpreter — and measured
  *    WORSE: exponent 1.18, sf10 228 s vs the join plan's 151 s.
  * This expression keeps both halves: the fold's no-exchange dataflow
  * and whole-stage codegen's tight loop (one MessageDigest reused
  * across the row's bigrams, byte-level updates, no per-element
  * boxing).
  *
  * The hash is EXACTLY [[graft.ext.TextOps.md5Long]]'s contract — the
  * first 15 hex chars of the true MD5 as a 60-bit integer (the first
  * 60 bits of the digest, big-endian) — so the DuckDB oracle
  * (`('0x' || substr(md5(…), 1, 15))::BIGINT % m`) and every existing
  * t74/t76 oracle row pin this implementation bit-for-bit; the spec
  * additionally pins expression-vs-Column-API equality on the fixture
  * corpus so the byte-level reimplementation cannot drift.
  *
  * The model rides the expression as a codegen REFERENCE OBJECT
  * (`ctx.addReferenceObj`), not a literal array expression — m cells
  * regardless of corpus size (the e125 bounded-collect contract). */
case class DsirScore64(child: Expression, model: Array[Long])
    extends UnaryExpression {
  require(model.nonEmpty, "DSIR model must have at least one bucket")

  // value equality over the model (round-14 advice): the case-class
  // default compares Array[Long] by reference, so two separately-built
  // but identical scorers would never canonicalize equal — silently
  // disabling Catalyst CSE / exchange reuse across them
  override def equals(other: Any): Boolean = other match {
    case DsirScore64(c, m) =>
      child == c && java.util.Arrays.equals(model, m)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(model)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dsir_score64"

  override def nullSafeEval(input: Any): Any =
    DsirScore64.score(input.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("dsirModel", model, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DsirScore64.score($c, $modelRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): DsirScore64 = copy(child = newChild)
}

object DsirScore64 {

  private val prefix = "dsir:".getBytes("UTF-8")

  /** Shared by both eval paths (interpreted + codegen static call):
    * one MD5 digest instance reused across the row's bigrams; the
    * 60-bit truncation is (digest[0..6] ‖ high nibble of digest[7]),
    * the big-endian first 15 hex chars. */
  def score(arr: ArrayData, model: Array[Long]): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array(0L, 0L))
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = model.length
    var acc = 0L
    var prev = arr.getUTF8String(0).getBytes
    var i = 1
    while (i < n) {
      val cur = arr.getUTF8String(i).getBytes
      md.reset()
      md.update(prefix)
      md.update(prev)
      md.update(' '.toByte)
      md.update(cur)
      val d = md.digest()
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v = (v << 4) | ((d(7) & 0xffL) >>> 4)
      acc += model((v % m).toInt)
      prev = cur
      i += 1
    }
    new GenericArrayData(Array(n - 1L, acc))
  }

  /** Column API: `dsir_score64($"toks", model)` → [n_feats, w_micro]. */
  def dsir_score64(c: Column, model: Array[Long]): Column =
    Bridge.column(DsirScore64(Bridge.expression(c), model))
}
