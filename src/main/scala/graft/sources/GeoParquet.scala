package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sql.{Geo, GeoSchema}

/** GeoParquet-style interchange (SURVEY.md §2B "scan/source"): geometry
  * serialized as a WKB `binary` column, with file-level geo metadata in a
  * `_geo_metadata.json` sidecar (Spark's public writer cannot set custom
  * parquet footer key-values; the sidecar carries the same payload:
  * version, primary column, encoding, crs, bbox). Reading re-decodes WKB
  * into the native struct and re-attaches the column metadata.
  *
  * The WKB round-trip preserves the reference's encode/decode semantics
  * exactly (R2/W2), so foreign readers see standard ISO WKB. */
object GeoParquet {

  def write(df: DataFrame, geomCol: String, path: String,
            crs: Option[String] = Some(GeoSchema.Crs84Projjson)): Unit = {
    val spark = df.sparkSession
    Geo.register(spark)
    val wkbDf = df.withColumn(geomCol, call_function("st_aswkb", col(geomCol)))
    wkbDf.write.mode("overwrite").parquet(path)
    // file-level bbox from the box aggregate (kernel K8)
    val box = df.agg(call_function("st_box_agg", col(geomCol))).collect()(0)
      .getStruct(0)
    val bbox = s"[${box.getDouble(0)},${box.getDouble(1)},${box.getDouble(2)},${box.getDouble(3)}]"
    val crsJson = crs.map(c =>
      if (c.trim.startsWith("{")) c
      else "\"" + GeoSchema.jsonEscape(c) + "\"").getOrElse("null")
    val colJson = GeoSchema.jsonEscape(geomCol)
    val meta =
      s"""{"version":"1.1.0","primary_column":"$colJson","columns":{"$colJson":
         |{"encoding":"WKB","geometry_types":[],"crs":$crsJson,"bbox":$bbox}}}"""
        .stripMargin.replace("\n", "")
    Files.writeString(Paths.get(path, "_geo_metadata.json"), meta)
  }

  def read(spark: SparkSession, path: String, geomCol: String): DataFrame = {
    Geo.register(spark)
    val df = spark.read.parquet(path)
      .withColumn(geomCol, call_function("st_geomfromwkb", col(geomCol)))
    val metaPath = Paths.get(path, "_geo_metadata.json")
    if (Files.exists(metaPath)) {
      val json = Files.readString(metaPath)
      val crs = extractCrs(json)
      val inferred = GeoSchema.inferGeoType(df, geomCol)
      if (!inferred.isWkbFallback)
        GeoSchema.withGeoMetadata(df, geomCol, inferred.geometryType,
          inferred.dims, crs)
      else df
    } else df
  }

  /** Native GeoArrow-layout emit: the geometry column is written in the
    * reference's physical layout (`/root/reference/src/geoarrow.c:25-43`)
    * instead of WKB — separate (struct-of-arrays; parquet stores each
    * ordinate in its own column chunk, the layout sf/GDAL emit by default)
    * or interleaved. The sidecar records (encoding, dims, coord_type) so
    * [[readNative]] reconstructs without being told. */
  def writeNative(df: DataFrame, geomCol: String, path: String,
                  geometryType: String, dims: String = "xy",
                  coordType: String = "separate",
                  crs: Option[String] = Some(GeoSchema.Crs84Projjson)): Unit = {
    val spark = df.sparkSession
    Geo.register(spark)
    df.withColumn(geomCol, call_function("st_tonative", col(geomCol),
        lit(geometryType), lit(dims), lit(coordType)))
      .write.mode("overwrite").parquet(path)
    val crsJson = crs.map(c =>
      if (c.trim.startsWith("{")) c
      else "\"" + GeoSchema.jsonEscape(c) + "\"").getOrElse("null")
    val colJson = GeoSchema.jsonEscape(geomCol)
    val meta =
      s"""{"version":"1.1.0","primary_column":"$colJson","columns":{"$colJson":
         |{"encoding":"geoarrow.${geometryType.toLowerCase}","dims":"${dims.toLowerCase}",
         |"coord_type":"${coordType.toLowerCase}","crs":$crsJson}}}"""
        .stripMargin.replace("\n", "")
    Files.writeString(Paths.get(path, "_geo_metadata.json"), meta)
  }

  /** Reads a native-layout GeoParquet table written by [[writeNative]] (or
    * any parquet whose sidecar declares a geoarrow.* encoding), decoding the
    * nested layout back to the engine's geometry struct and re-attaching
    * crs metadata. */
  def readNative(spark: SparkSession, path: String, geomCol: String): DataFrame = {
    Geo.register(spark)
    val json = Files.readString(Paths.get(path, "_geo_metadata.json"))
    val enc = extractString(json, "encoding").getOrElse(
      throw new IllegalArgumentException(s"no geoarrow encoding in sidecar at $path"))
    require(enc.startsWith("geoarrow."), s"not a native geoarrow encoding: $enc")
    val gt = enc.stripPrefix("geoarrow.")
    val dims = extractString(json, "dims").getOrElse("xy")
    val ct = extractString(json, "coord_type").getOrElse("separate")
    val crs = extractCrs(json)
    val df = spark.read.parquet(path)
      .withColumn(geomCol, call_function("st_fromnative", col(geomCol),
        lit(gt), lit(dims), lit(ct)))
    val typeInt = Seq("point", "linestring", "polygon", "multipoint",
      "multilinestring", "multipolygon").indexOf(gt) + 1
    val dimsInt = Seq("xy", "xyz", "xym", "xyzm").indexOf(dims) + 1
    if (typeInt > 0 && dimsInt > 0)
      GeoSchema.withGeoMetadata(df, geomCol, typeInt, dimsInt, crs)
    else df
  }

  private def extractString(json: String, key: String): Option[String] = {
    val k = "\"" + key + "\":"
    val i = json.indexOf(k)
    if (i < 0) return None
    val rest = json.substring(i + k.length).trim
    if (!rest.startsWith("\"")) return None
    var j = 1
    while (j < rest.length && rest.charAt(j) != '"') {
      if (rest.charAt(j) == '\\') j += 1
      j += 1
    }
    if (j < rest.length) Some(GeoSchema.jsonUnescape(rest.substring(1, j))) else None
  }

  private def extractCrs(json: String): Option[String] = {
    val key = "\"crs\":"
    val i = json.indexOf(key)
    if (i < 0) return None
    val rest = json.substring(i + key.length).trim
    if (rest.startsWith("null")) None
    else if (rest.startsWith("{")) {
      // balanced-brace slice
      var depth = 0; var j = 0; var inStr = false
      while (j < rest.length) {
        val c = rest.charAt(j)
        if (inStr) { if (c == '\\') j += 1 else if (c == '"') inStr = false }
        else {
          if (c == '"') inStr = true
          else if (c == '{') depth += 1
          else if (c == '}') { depth -= 1; if (depth == 0) return Some(rest.substring(0, j + 1)) }
        }
        j += 1
      }
      None
    } else if (rest.startsWith("\"")) {
      // scan to the closing quote honoring escapes, then unescape the body
      var j = 1
      while (j < rest.length && rest.charAt(j) != '"') {
        if (rest.charAt(j) == '\\') j += 1
        j += 1
      }
      if (j < rest.length) Some(GeoSchema.jsonUnescape(rest.substring(1, j)))
      else None
    } else None
  }
}
