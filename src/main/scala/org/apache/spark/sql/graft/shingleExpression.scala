package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles from a token array, in first-occurrence
  * order (same semantics as transform+concat_ws+array_distinct, which
  * this replaces): the higher-order-function formulation re-evaluates
  * the child token expression per element inside the lambda — O(tokens)
  * regex splits per row — while this expression evaluates its child
  * once and builds shingles in a single native pass.
  */
case class ShingleArray(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val seen = new mutable.LinkedHashSet[UTF8String]
    val space = UTF8String.fromString(" ")
    i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](2 * k - 1)
      var j = 0
      while (j < k) {
        parts(2 * j) = toks(i + j)
        if (j < k - 1) parts(2 * j + 1) = space
        j += 1
      }
      seen += UTF8String.concat(parts: _*)
      i += 1
    }
    new GenericArrayData(seen.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
