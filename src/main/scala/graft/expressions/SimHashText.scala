package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused native SimHash of a text column: tokenize on single spaces,
  * portable-polyhash each token (seed 7, `acc*31 + codepoint mod
  * 1000000007` — [[PortablePolyHash]]'s fold), tally each of `bits`
  * sign bits (±1 per token), set bit k in the signature when its tally
  * is positive.
  *
  * WHY a custom Expression: the reference formulation
  * (`Dedup.simhashFromHashes` over `transform(tokens, polyhash)`) runs
  * `bits` interpreted higher-order `aggregate` passes over the token
  * array per document — 24 lambda-dispatch sweeps plus two materialized
  * arrays. This is the per-ROW signature the streaming near-dup dedup
  * keys its state on (`StreamingOps.nearDupDedup`), so it sits on the
  * ingest hot path where an explode-to-aggregate rewrite
  * (`simhashSignatures`, the batch fast path) cannot follow: a
  * pre-dedup aggregation would change the stream's row grain. One
  * codegen'd loop, zero allocation beyond a reused tally array.
  *
  * Semantics are IDENTICAL to
  * `simhashFromHashes(transform(split(text, " "), polyhash), bits)`
  * (test-pinned): Java's regex split on `" "` with limit -1 makes every
  * space a boundary — consecutive/leading/trailing spaces contribute
  * EMPTY tokens (hash = the seed 7), and `""` splits to one empty
  * token — the manual walk below closes a token at every space and at
  * end-of-input, reproducing exactly that. Hashes lie in [0, 1e9+7), so
  * `floor(h / 2^k) mod 2` is the plain shift-mask probe for every k.
  * Null input -> null.
  */
case class SimHashText(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash_text"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val tallies = new Array[Int](bits)
    val n = s.length
    var h = 7L
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        var k = 0
        while (k < bits) {
          if (((h >> k) & 1L) == 1L) tallies(k) += 1 else tallies(k) -= 1
          k += 1
        }
        h = 7L
        i += 1
      } else {
        val cp = s.codePointAt(i)
        h = (h * 31L + cp) % 1000000007L
        i += Character.charCount(cp)
      }
    }
    var sig = 0L
    var k = 0
    while (k < bits) {
      if (tallies(k) > 0) sig |= 1L << k
      k += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tallies = ctx.addMutableState("int[]", "simhashTallies",
      v => s"$v = new int[$bits];")
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val cp = ctx.freshName("cp")
      val sig = ctx.freshName("sig")
      s"""
        java.lang.String $s = $c.toString();
        java.util.Arrays.fill($tallies, 0);
        int $n = $s.length();
        long $h = 7L;
        int $i = 0;
        while ($i <= $n) {
          if ($i == $n || $s.charAt($i) == ' ') {
            for (int $k = 0; $k < $bits; $k++) {
              if ((($h >> $k) & 1L) == 1L) $tallies[$k]++; else $tallies[$k]--;
            }
            $h = 7L;
            $i++;
          } else {
            int $cp = $s.codePointAt($i);
            $h = ($h * 31L + $cp) % 1000000007L;
            $i += java.lang.Character.charCount($cp);
          }
        }
        long $sig = 0L;
        for (int $k = 0; $k < $bits; $k++) {
          if ($tallies[$k] > 0) $sig |= 1L << $k;
        }
        ${ev.value} = $sig;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashText =
    copy(child = newChild)
}

object SimHashText {
  /** Column API. */
  def apply(c: Column, bits: Int): Column =
    GraftSqlBridge.column(SimHashText(GraftSqlBridge.expression(c), bits))
}
