package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels. Spark's higher-order functions
  * (`zip_with` + `aggregate`) evaluate an interpreted lambda per
  * element — profiling this engine showed HOF interpretation dominating
  * every similarity-join plan. These expressions compile to a tight
  * primitive loop inside whole-stage codegen, the SURVEY.md §4 "custom
  * codegen Expression for cosine" item (hot inner loop of the J5/J6
  * similarity joins, M5 — qdrant_io_manager.py:33).
  */
abstract class VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  protected def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  /** Java accessor snippet for element `i` of array variable `v`. */
  protected def getJava(v: String, t: DataType, i: String): String = t match {
    case FloatType => s"(double) $v.getFloat($i)"
    case _ => s"$v.getDouble($i)"
  }
}

/** Dot product of two equal-length numeric arrays (double result). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elementType(left), elementType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      // a null element nulls the whole result, like the HOF twin
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += get(a, ta, i) * get(b, tb, i); i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, dot) =
        (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("dot"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $dot += ${getJava(a, elementType(left), i)}
         |    * ${getJava(b, elementType(right), i)};
         |}
         |if (!${ev.isNull}) { ${ev.value} = $dot; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Shared primitive kernels callable from both `eval` and generated
  * code (plain object → static forwarders, so codegen emits one
  * non-virtual call per row; the loop itself is JIT-compiled once,
  * unlike an interpreted HOF lambda per element).
  */
object VectorKernels {

  /** Reconstruct an approximate vector from PQ codes: the
    * concatenation of each subspace's selected codeword. Null codes →
    * null vector.
    */
  def pqReconstruct(codes: ArrayData,
                    codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    if (codes.numElements() != m) return null
    var dim = 0
    var mi = 0
    while (mi < m) { dim += codebooks(mi)(0).length; mi += 1 }
    val out = new Array[Double](dim)
    var pos = 0
    mi = 0
    while (mi < m) {
      if (codes.isNullAt(mi)) return null
      val book = codebooks(mi)
      val c = codes.getInt(mi)
      if (c < 0 || c >= book.length) return null
      val word = book(c)
      System.arraycopy(word, 0, out, pos, word.length)
      pos += word.length
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** `vec + sign·centroids[cell]`: the residual (sign = −1) and the
    * reconstruction offset (sign = +1) of residual-encoded IVF-PQ.
    * Null vector elements or an out-of-range cell → null (consistent
    * with the other kernels). Centroid dimensions beyond the vector's
    * are ignored; vector dimensions beyond the centroid's pass
    * through unshifted.
    */
  def cellOffset(cell: Int, vec: ArrayData, isFloat: Boolean,
                 centroids: Array[Array[Double]], sign: Double): ArrayData = {
    if (cell < 0 || cell >= centroids.length) return null
    val cent = centroids(cell)
    val dim = vec.numElements()
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      val v = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      out(i) = v + (if (i < cent.length) sign * cent(i) else 0.0)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Ids of the `n` centroids nearest to `vec` (squared L2), ascending
    * by (distance, id) — the tie-break keeps results total-ordered and
    * reproducible. Returns null when any element is null (consistent
    * with the binary kernels above).
    */
  def nearestCells(vec: ArrayData, isFloat: Boolean,
                   centroids: Array[Array[Double]], n: Int): ArrayData = {
    val dim = vec.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val nlist = centroids.length
    val dists = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val cent = centroids(c)
      val m = math.min(dim, cent.length)
      var d = 0.0
      i = 0
      while (i < m) { val x = v(i) - cent(i); d += x * x; i += 1 }
      dists(c) = d
      c += 1
    }
    // selection of the top n (nprobe ≪ nlist, so n passes beat a sort)
    val k = math.min(n, nlist)
    val out = new Array[Int](k)
    val used = new Array[Boolean](nlist)
    var j = 0
    while (j < k) {
      var best = -1
      var bd = Double.PositiveInfinity
      c = 0
      while (c < nlist) {
        if (!used(c) && dists(c) < bd) { bd = dists(c); best = c }
        c += 1
      }
      // NaN input vectors make every distance NaN, so `< bd` never
      // fires and `best` stays -1 — honor the null contract instead
      // of indexing with -1
      if (best < 0) return null
      used(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Top-`nProbe` nearest centroid ids for a vector — the IVF coarse
  * quantizer assignment. The centroid table rides along as a codegen
  * reference object (`ctx.addReferenceObj`), NOT as inlined literal
  * structs: at nlist=4096 a literal formulation is an expression-tree
  * bomb (4096 struct nodes re-analyzed per plan), while a reference
  * object is one opaque pointer and one JIT-compiled loop.
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]],
                        nProbe: Int) extends UnaryExpression {

  override def prettyName: String = "graft_nearest_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> input, got ${other.sql}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    VectorKernels.nearestCells(v.asInstanceOf[ArrayData], isFloat,
      centroids, nProbe)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
      s"""
         |${ev.value} = graft.expressions.VectorKernels.nearestCells(
         |  $c, $isFloat, $cents, $nProbe);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `vec + sign·centroids[cell]` — residual-encoded IVF-PQ's encode
  * (sign = −1: subtract the cell centroid before PQ-coding) and
  * search (sign = +1: add it back onto the reconstructed residual)
  * halves. `left` = cell id (int), `right` = vector; centroids ride
  * as a codegen reference object like [[NearestCells]].
  */
case class CellOffset(left: Expression, right: Expression,
                      centroids: Array[Array[Double]], sign: Int)
    extends BinaryExpression {

  override def prettyName: String = "graft_cell_offset"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (int cell, array<float|double> vec), " +
          s"got ${l.sql} / ${r.sql}")
    }

  private def isFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(c: Any, v: Any): Any =
    VectorKernels.cellOffset(c.asInstanceOf[Int], v.asInstanceOf[ArrayData],
      isFloat, centroids, sign.toDouble)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, v) => {
      val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
      s"""
         |${ev.value} = graft.expressions.VectorKernels.cellOffset(
         |  $c, $v, $isFloat, $cents, ${sign.toDouble});
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Decode PQ codes back to the approximate vector (concatenated
  * codewords). The codebooks ride along as a referenced object, not
  * inlined literals — m×k×subdim literal structs would be the same
  * expression-tree bomb the IVF centroids avoid.
  */
case class PqReconstruct(child: Expression,
                         codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def prettyName: String = "graft_pq_reconstruct"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<int> codes, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.pqReconstruct(v.asInstanceOf[ArrayData], codebooks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val books = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      s"""
         |${ev.value} = graft.expressions.VectorKernels.pqReconstruct(
         |  $c, $books);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity; NULL when either vector has zero norm (matching
  * the HOF formulation in graft.functions.Vectors.cosine).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elementType(left), elementType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      // a null element nulls the whole result, like the HOF twin
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = get(a, ta, i); val y = get(b, tb, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na > 0.0 && nb > 0.0) dot / (math.sqrt(na) * math.sqrt(nb))
    else null
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(i, n, dot, na, nb, x, y) = Seq("i", "n", "dot", "na", "nb",
        "x", "y").map(ctx.freshName)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = ${getJava(a, elementType(left), i)};
         |  double $y = ${getJava(b, elementType(right), i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if (!${ev.isNull} && $na > 0.0 && $nb > 0.0) {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na)
         |    * java.lang.Math.sqrt($nb));
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
