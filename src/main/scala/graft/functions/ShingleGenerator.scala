package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SURVEY §2.10: the GENERATOR surface — a custom table-valued expression
  * (one input row → many output rows), the third member of the UDF-surface
  * trio next to scalar Expressions (DotProduct/HammingDistance) and the
  * typed Aggregator (VectorCentroid).
  *
  * Emits every n-token shingle of a whitespace-tokenized text with its
  * position — the dedup family's hot construction
  * ([[graft.operators.Dedup]] builds the same shingles via
  * explode(transform(sequence(...))); this is the operator form, usable
  * from SQL as `SELECT doc_id, s.* FROM docs LATERAL VIEW shingles(text, 3) s`).
  * Planned by the stock GenerateExec (CodegenFallback — generators run
  * interpreted inside Generate); per-row work is a single tokenizer
  * pass + slices, no per-shingle expression-tree evaluation.
  */
case class ShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles requires a STRING input, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(' ')
      if (toks.length < n) Iterator.empty
      else (0 to toks.length - n).iterator.map { i =>
        InternalRow(i, UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}
