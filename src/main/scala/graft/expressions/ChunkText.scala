package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Chunker

/** Generator expression for the recursive text chunker (G3): one input
  * text row → N (chunk_idx, chunk) rows, planned as a native `Generate`
  * node like `explode`. Versus the `Dataset.flatMap` formulation this
  * skips the case-class encoder round-trip (rows stay `InternalRow` /
  * `UTF8String` end-to-end) and composes in `select` next to other
  * columns. The chunking core is shared with [[Chunker.chunk]], so the
  * property-tested invariants (size cap, overlap carry, min length)
  * hold identically. CodegenFallback: generators run row-at-a-time
  * either way, and the recursion is not expressible as a codegen
  * template.
  */
case class ChunkText(child: Expression, size: Int = 400,
                     overlap: Int = 50)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else Chunker.chunk(t.asInstanceOf[UTF8String].toString, size, overlap)
      .iterator.zipWithIndex.map { case (c, i) =>
        InternalRow(i, UTF8String.fromString(c))
      }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
