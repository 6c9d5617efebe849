package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd portable polynomial string hash:
  * fold `acc = (acc * 31 + codepoint) mod 1000000007` over the
  * codepoints of the input, seed 7.
  *
  * WHY a custom Expression: the reference formulation
  * (graft.functions.portableStringHashHof) is split("") + a higher-order
  * aggregate — one interpreted lambda dispatch PER CHARACTER, plus the
  * materialized per-character string array. The hash gates sampling,
  * fingerprints chunks, and keys the minhash token stream, so at corpus
  * scale it runs per token of every document. This expression emits one
  * tight primitive loop into whole-stage codegen; the only per-value
  * cost left is the single UTF8String -> String decode feeding the
  * codepoint walk (vs one allocated string + lambda frame per CHARACTER
  * in the HOF form).
  *
  * Semantics are IDENTICAL to the HOF twin (test-pinned, including
  * non-BMP input): Java's empty-regex split advances by codepoints
  * (surrogate pairs never split, JDK 8+), and `ascii()` returns
  * `codePointAt(0)` — so both formulations fold over full codepoints,
  * matching DuckDB's `string_split(s, '')` + `ascii()` oracle exactly.
  * Null input -> null; empty string -> the seed (7).
  */
case class PortablePolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "portable_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      s"""
        java.lang.String $s = $c.toString();
        long $h = 7L;
        int $i = 0;
        while ($i < $s.length()) {
          int $cp = $s.codePointAt($i);
          $h = ($h * 31L + $cp) % 1000000007L;
          $i += java.lang.Character.charCount($cp);
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PortablePolyHash =
    copy(child = newChild)
}

object PortablePolyHash {
  /** Column API. */
  def apply(c: Column): Column =
    GraftSqlBridge.column(PortablePolyHash(GraftSqlBridge.expression(c)))
}
