package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar code-point kernels for the multimodal byte-DSP stubs, with
  * whole-stage codegen — the [[BandEnergies]] playbook applied to the
  * remaining interpreted per-character folds (r13 VERDICT item 3):
  *
  * - `cp_sum(str)`: Σ code points — the K140 scene_cut luma proxy.
  *   Replaces `aggregate(filter(split(frame, ''), …), acc + ascii(c))`,
  *   an interpreted boxed-lambda fold per frame character.
  * - `lap_energy(str)`: Σ over interior positions of
  *   (cp[i−1] − 2·cp[i] + cp[i+1])² — the K118 variance-of-Laplacian
  *   blur detector shared by mm_blur_detect and the streaming media
  *   gate. Replaces a fold whose every step paid SIX element_at +
  *   ascii evaluations. Strings with < 3 code points yield 0 (the
  *   callers filter those out; the empty fold also gave 0).
  *
  * Semantics note (the BandEnergies contract): Spark `split(s, '')`
  * and `ascii` both operate on CODE POINTS (surrogate pairs stay
  * whole), as do DuckDB `string_split`/`ascii` — so one codePointAt
  * loop reproduces the HOF arithmetic exactly, astral chars included.
  */
case class CpSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cp_sum expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "cp_sum"

  override def nullSafeEval(str: Any): Any =
    CpSum.compute(str.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $t.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc += (long) $cp;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CpSum =
    copy(child = newChild)
}

object CpSum {
  /** Shared by the interpreted path and tests. */
  def compute(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc += cp.toLong
      i += Character.charCount(cp)
    }
    acc
  }
}

case class LapEnergy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lap_energy expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "lap_energy"

  override def nullSafeEval(str: Any): Any =
    LapEnergy.compute(str.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |String $s = $t.toString();
         |long $acc = 0L;
         |int $i = 0;
         |int $n = 0;      // code points consumed
         |long $a = 0L;    // cp[k-2]
         |long $b = 0L;    // cp[k-1]
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  if ($n >= 2) {
         |    long $d = $a - 2L * $b + (long) $cp;
         |    $acc += $d * $d;
         |  }
         |  $a = $b;
         |  $b = (long) $cp;
         |  $n++;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LapEnergy =
    copy(child = newChild)
}

object LapEnergy {
  /** Shared by the interpreted path and tests. */
  def compute(s: String): Long = {
    var acc = 0L
    var i = 0
    var n = 0
    var a = 0L
    var b = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (n >= 2) {
        val d = a - 2L * b + cp.toLong
        acc += d * d
      }
      a = b
      b = cp.toLong
      n += 1
      i += Character.charCount(cp)
    }
    acc
  }
}
