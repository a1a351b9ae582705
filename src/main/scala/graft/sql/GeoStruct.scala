package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

import graft.core.{Geom, GeomTypes, Wkb}

/** Geometry <-> Spark SQL struct codec.
  *
  * Physical encoding (SURVEY.md §1.5): one struct column holding the
  * GeoArrow-style flat layout — interleaved coords + offset arrays — so
  * geometry stays columnar inside Tungsten rows with no per-row object
  * graph. GEOMETRYCOLLECTION (which has no native GeoArrow layout either,
  * `/root/reference/R/infer-default.R:128-129`) rides in the `gc` field as
  * WKB, mirroring the reference's "collections stay serialized" rule.
  */
object GeoStruct {

  val dataType: StructType = StructType(Seq(
    StructField("gtype", IntegerType, nullable = false),
    StructField("dims", IntegerType, nullable = false),
    StructField("srid", IntegerType, nullable = false),
    // arrays are value-present in every encoded geometry, but the fields
    // stay nullable so case-class encoders (Array[_] members are nullable
    // in Catalyst) line up with this type without a lossy cast
    StructField("coords", ArrayType(DoubleType, containsNull = false), nullable = true),
    StructField("o0", ArrayType(IntegerType, containsNull = false), nullable = true),
    StructField("o1", ArrayType(IntegerType, containsNull = false), nullable = true),
    StructField("gc", BinaryType, nullable = true)))

  val boxType: StructType = StructType(Seq(
    StructField("xmin", DoubleType, nullable = false),
    StructField("ymin", DoubleType, nullable = false),
    StructField("xmax", DoubleType, nullable = false),
    StructField("ymax", DoubleType, nullable = false)))

  def encode(g: Geom): InternalRow = {
    if (g == null) return null
    val gcBytes: Array[Byte] =
      if (g.geomType == GeomTypes.Collection) Wkb.write(g) else null
    val coords =
      if (g.geomType == GeomTypes.Collection) Geom.emptyDoubles else g.coords
    val o0 = if (g.geomType == GeomTypes.Collection) Geom.emptyInts else g.o0
    val o1 = if (g.geomType == GeomTypes.Collection) Geom.emptyInts else g.o1
    new GenericInternalRow(Array[Any](
      g.geomType, g.dims, g.srid,
      UnsafeArrayData.fromPrimitiveArray(coords),
      UnsafeArrayData.fromPrimitiveArray(o0),
      UnsafeArrayData.fromPrimitiveArray(o1),
      gcBytes))
  }

  def decode(row: InternalRow): Geom = {
    if (row == null) return null
    val gtype = row.getInt(0)
    if (gtype == GeomTypes.Collection) {
      val wkb = row.getBinary(6)
      val g = Wkb.parse(wkb)
      // srid may have been updated on the struct after encoding
      if (g.srid == row.getInt(2)) g
      else new Geom(g.geomType, g.dims, row.getInt(2), g.coords, g.o0, g.o1, g.parts)
    } else {
      new Geom(
        gtype, row.getInt(1), row.getInt(2),
        row.getArray(3).toDoubleArray(),
        row.getArray(4).toIntArray(),
        row.getArray(5).toIntArray(), null)
    }
  }

  def encodeBox(box: Array[Double]): InternalRow =
    new GenericInternalRow(Array[Any](box(0), box(1), box(2), box(3)))

  def longArray(a: Array[Long]): ArrayData = UnsafeArrayData.fromPrimitiveArray(a)
  def intArray(a: Array[Int]): ArrayData = UnsafeArrayData.fromPrimitiveArray(a)
}
