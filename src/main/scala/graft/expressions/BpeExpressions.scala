package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * BPE scoring as native Catalyst expressions: the learned merge table
 * rides INSIDE the expression (sorted pair keys + parallel ranks via
 * `addReferenceObj` — the TrigramRarity state-carrying pattern; a
 * few-hundred-merge table is a handful of KB of plan state), so token
 * counting fuses into whole-stage codegen: no UDF, no broadcast join, no
 * Dataset-encoder boundary on the corpus scan. Not SQL-registrable (the
 * model is not literal-expressible); built by
 * [[graft.functions.Bpe.withTokenCount]] / `withEncoded`.
 */
case class BpeTokenCount(child: Expression, pairKeys: Array[String], ranks: Array[Int],
                         byteLevel: Boolean = false)
    extends UnaryExpression {
  require(pairKeys.length == ranks.length, "bpe_token_count: keys/ranks must be parallel")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.BpeKernels.tokenCount(
      input.asInstanceOf[UTF8String].toString, pairKeys, ranks, byteLevel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keysRef = ctx.addReferenceObj("bpeKeys", pairKeys, "java.lang.String[]")
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernels.tokenCount($c.toString(), $keysRef, $ranksRef, $byteLevel);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** The token stream itself (word order preserved) — the materialization
  * half, for pipelines that persist tokenized corpora. */
case class BpeEncode(child: Expression, pairKeys: Array[String], ranks: Array[Int],
                     byteLevel: Boolean = false)
    extends UnaryExpression {
  require(pairKeys.length == ranks.length, "bpe_encode: keys/ranks must be parallel")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(graft.functions.BpeKernels.encodeText(
      input.asInstanceOf[UTF8String].toString, pairKeys, ranks, byteLevel)
      .map(UTF8String.fromString(_): AnyRef))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keysRef = ctx.addReferenceObj("bpeKeys", pairKeys, "java.lang.String[]")
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "int[]")
    nullSafeCodeGen(ctx, ev, c => {
      val toks = ctx.freshName("bpeToks")
      val arr = ctx.freshName("bpeArr")
      val i = ctx.freshName("i")
      s"""java.lang.String[] $toks =
         |  graft.functions.BpeKernels.encodeText($c.toString(), $keysRef, $ranksRef, $byteLevel);
         |Object[] $arr = new Object[$toks.length];
         |for (int $i = 0; $i < $toks.length; $i++) {
         |  $arr[$i] = org.apache.spark.unsafe.types.UTF8String.fromString($toks[$i]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
