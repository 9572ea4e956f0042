package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd geohash encoder expression: `geohash_encode(lat, lon)` →
  * 12-char geohash (the partitioning/sort key of the WOD layout,
  * reference `DatasetYearTrain.java:130-137`), making the spatial key
  * derivable in SQL over any lat/lon table.
  */
case class GeohashEncode(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = StringType
  override def prettyName: String = "geohash_encode"

  override def nullSafeEval(lat: Any, lon: Any): Any =
    UTF8String.fromString(graft.wod.Geohash.encode(
      lat.asInstanceOf[Double], lon.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lon) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.wod.Geohash.encode($lat, $lon, 12));""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}
