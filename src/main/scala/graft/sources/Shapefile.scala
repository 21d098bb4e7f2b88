package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ESRI shapefile ingest (reference SURVEY.md §2.1, GeoManager shapefile →
  * parquet with geometry + bbox). Pure-JVM parser of the PUBLIC format
  * ("ESRI Shapefile Technical Description", 1998) — no GeoTools dependency.
  *
  * Scale story: shapefiles cap at 2 GB per file, so real datasets are tiled
  * into many .shp/.dbf pairs. Ingest parallelizes over FILES via Spark's
  * `binaryFile` source — each executor task parses whole file pairs locally
  * (the format is not splittable mid-file: record offsets are only known
  * after a sequential walk), then the result is columnar parquet where all
  * downstream geo ops (grid-bucketed point-in-polygon, bbox pruning) are
  * fully distributed. One 2 GB file = one task is the format's own floor.
  *
  * Output geometry matches `graft.operators.Geo`'s model: the outer ring as
  * a flat array<double> [x0,y0,x1,y1,...] plus minX/minY/maxX/maxY bbox
  * columns, so `Geo.pointInPolygonJoin` consumes it directly.
  */
object Shapefile {

  /** One shapefile record: `rings` holds each part as a flat [x,y,...] array
    * (points are a single 1-coordinate ring). */
  final case class ShpShape(recordNo: Int, shapeType: Int,
                            minX: Double, minY: Double, maxX: Double, maxY: Double,
                            rings: Array[Array[Double]])

  final case class DbfField(name: String, fieldType: Char, length: Int, decimals: Int)

  // ---------------------------------------------------------------- parsing

  /** Parse a .shp main file (header + variable-length records). */
  def parseShp(bytes: Array[Byte]): Seq[ShpShape] = {
    require(bytes.length >= 100, s"shp too short: ${bytes.length} bytes")
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val fileCode = be.getInt(0)
    require(fileCode == 9994, s"not a shapefile (file code $fileCode)")
    val fileLenBytes = be.getInt(24).toLong * 2
    val out = Seq.newBuilder[ShpShape]
    var pos = 100
    while (pos + 8 <= math.min(fileLenBytes, bytes.length.toLong)) {
      val recNo = be.getInt(pos)
      // FILE-SUPPLIED sizes are validated BEFORE any allocation (round 17):
      // one corrupt/truncated record among thousands of tiles used to
      // request a multi-GB array (numPoints from garbage bytes) or crash
      // copyOfRange — an executor OOM that takes co-resident tasks down
      // and retries 4x. Corrupt records now raise by name.
      val contentLenBytes = be.getInt(pos + 4).toLong * 2
      require(contentLenBytes >= 4 && pos + 8 + contentLenBytes <= bytes.length,
        s"shp record $recNo: content length $contentLenBytes exceeds the " +
          s"file's remaining ${bytes.length - pos - 8} bytes — corrupt or " +
          "truncated record")
      val le = ByteBuffer.wrap(bytes, pos + 8, contentLenBytes.toInt)
        .order(ByteOrder.LITTLE_ENDIAN)
      val shapeType = le.getInt
      shapeType match {
        case 0 => // null shape: no geometry
          out += ShpShape(recNo, 0, 0, 0, 0, 0, Array.empty)
        case 1 => // Point
          require(contentLenBytes >= 4 + 16,
            s"shp record $recNo: point record shorter than 20 bytes")
          val x = le.getDouble; val y = le.getDouble
          out += ShpShape(recNo, 1, x, y, x, y, Array(Array(x, y)))
        case 3 | 5 => // PolyLine | Polygon
          require(contentLenBytes >= 4 + 32 + 8,
            s"shp record $recNo: poly record shorter than its fixed header")
          val minX = le.getDouble; val minY = le.getDouble
          val maxX = le.getDouble; val maxY = le.getDouble
          val numParts = le.getInt
          val numPoints = le.getInt
          // every count must fit the record's OWN byte budget: parts are
          // 4 bytes, points 16 — anything else is a corrupt size field
          require(numParts >= 0 && numPoints >= 0 &&
            4L + 32 + 8 + numParts.toLong * 4 + numPoints.toLong * 16
              <= contentLenBytes,
            s"shp record $recNo: numParts=$numParts numPoints=$numPoints " +
              s"exceed the record's $contentLenBytes content bytes — " +
              "corrupt size fields")
          val partOffsets = Array.fill(numParts)(le.getInt)
          partOffsets.indices.foreach { p =>
            val from = partOffsets(p)
            val until = if (p + 1 < numParts) partOffsets(p + 1) else numPoints
            require(from >= 0 && from <= until && until <= numPoints,
              s"shp record $recNo: part offsets not monotone within " +
                s"[0, $numPoints] (part $p: $from..$until) — corrupt " +
                "part index")
          }
          val flat = new Array[Double](numPoints * 2)
          var i = 0
          while (i < numPoints * 2) { flat(i) = le.getDouble; i += 1 }
          val rings = Array.tabulate(numParts) { p =>
            val from = partOffsets(p)
            val until = if (p + 1 < numParts) partOffsets(p + 1) else numPoints
            java.util.Arrays.copyOfRange(flat, from * 2, until * 2)
          }
          out += ShpShape(recNo, shapeType, minX, minY, maxX, maxY, rings)
        case other =>
          throw new IllegalArgumentException(s"unsupported shape type $other (record $recNo)")
      }
      pos += 8 + contentLenBytes.toInt
    }
    out.result()
  }

  /** Parse a .dbf (dBase III) attribute file → (fields, one string-map per
    * LIVE record, deleted rows skipped). Numbers stay strings here; the
    * reader casts via the declared field type when building the DataFrame.
    * WARNING: skipping deleted rows loses POSITIONAL alignment with the
    * .shp record sequence — positional pairing must use [[parseDbfSlots]]
    * (a soft-deleted record at slot k would otherwise shift every later
    * shape's attributes up by one, a silent misassignment). */
  def parseDbf(bytes: Array[Byte]): (Seq[DbfField], Seq[Map[String, String]]) = {
    val (fs, slots) = parseDbfSlots(bytes)
    (fs, slots.flatten)
  }

  /** Positional .dbf parse: one slot per PHYSICAL record in file order,
    * `None` for soft-deleted ('*'-flagged) slots — the alignment-safe
    * form [[read]] pairs against .shp records (spec: strictly 1:1 by
    * position, deleted attribute records delete the feature). */
  def parseDbfSlots(bytes: Array[Byte]): (Seq[DbfField], Seq[Option[Map[String, String]]]) = {
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = le.getInt(4)
    val headerSize = le.getShort(8) & 0xffff
    val recordSize = le.getShort(10) & 0xffff
    val fields = Seq.newBuilder[DbfField]
    var fp = 32
    while (fp + 32 <= headerSize && bytes(fp) != 0x0d) {
      val nameEnd = {
        var e = fp; while (e < fp + 11 && bytes(e) != 0) e += 1; e
      }
      val name = new String(bytes, fp, nameEnd - fp, StandardCharsets.US_ASCII)
      val fieldType = bytes(fp + 11).toChar
      val length = bytes(fp + 16) & 0xff
      val decimals = bytes(fp + 17) & 0xff
      fields += DbfField(name, fieldType, length, decimals)
      fp += 32
    }
    val fs = fields.result()
    val rows = Seq.newBuilder[Option[Map[String, String]]]
    var rp = headerSize
    var r = 0
    while (r < numRecords && rp + recordSize <= bytes.length) {
      if (bytes(rp) != '*') {
        var off = rp + 1
        val m = Map.newBuilder[String, String]
        fs.foreach { f =>
          m += f.name -> new String(bytes, off, f.length, StandardCharsets.US_ASCII).trim
          off += f.length
        }
        rows += Some(m.result())
      } else rows += None // '*' marks a deleted record: slot kept for alignment
      rp += recordSize
      r += 1
    }
    (fs, rows.result())
  }

  // ---------------------------------------------------------------- reading

  /** Read a directory (or glob) of .shp/.dbf pairs into a DataFrame:
    * (source, record_no, shape_type, minX, minY, maxX, maxY, ring, rings,
    * n_parts, n_points, attrs map<string,string>).
    *
    * `ring` is the first (outer) part flattened — directly consumable by
    * `Geo.pointInPolygonJoin`. Files parse in parallel (one task per pair);
    * .dbf attributes pair positionally with .shp records per the spec.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shp = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.shp").load(dir)
      .select(regexp_replace(col("path"), "\\.shp$", "").as("stem"),
        col("content").as("shp"))
    val dbf = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.dbf").load(dir)
      .select(regexp_replace(col("path"), "\\.dbf$", "").as("stem"),
        col("content").as("dbf"))
    // left join: a .shp without attributes is still valid per the spec
    shp.join(dbf, Seq("stem"), "left")
      .as[(String, Array[Byte], Array[Byte])]
      .flatMap { case (stem, shpBytes, dbfBytes) =>
        val shapes = parseShp(shpBytes)
        val source = stem.substring(stem.lastIndexOf('/') + 1)
        // positional pairing via SLOTS (round 17): a soft-deleted .dbf
        // record keeps its slot, so later shapes never inherit a
        // different record's attributes; the deleted slot's feature is
        // dropped whole (shape + attrs together, shapelib semantics).
        // A live-record count that disagrees with the shape count is a
        // corrupt pair — raise by name, never mis-pair silently.
        val slots: Seq[Option[Map[String, String]]] = Option(dbfBytes) match {
          case Some(b) =>
            val (_, s) = parseDbfSlots(b)
            require(s.length == shapes.length,
              s"$source: .dbf has ${s.length} record slots but .shp has " +
                s"${shapes.length} shapes — corrupt pair (the formats are " +
                "strictly 1:1 positional)")
            s
          case None => Seq.fill(shapes.length)(Some(Map.empty[String, String]))
        }
        shapes.zip(slots).collect { case (sh, Some(attrs)) =>
          (source, sh.recordNo, sh.shapeType,
            sh.minX, sh.minY, sh.maxX, sh.maxY,
            sh.rings.headOption.getOrElse(Array.empty[Double]),
            sh.rings, sh.rings.length,
            sh.rings.map(_.length / 2).sum, attrs)
        }
      }
      .toDF("source", "record_no", "shape_type", "minX", "minY", "maxX", "maxY",
        "ring", "rings", "n_parts", "n_points", "attrs")
  }

  // ---------------------------------------------------------------- writing

  /** Write a .shp polygon file (type 5). For tests and for the parquet →
    * shapefile export direction. Rings: flat [x,y,...] arrays per shape. */
  def writeShp(path: String, shapes: Seq[Array[Array[Double]]]): Unit = {
    val records = shapes.zipWithIndex.map { case (rings, i) =>
      val numPoints = rings.map(_.length / 2).sum
      val contentLen = 4 + 32 + 4 + 4 + 4 * rings.length + 16 * numPoints
      val buf = ByteBuffer.allocate(8 + contentLen)
      val xs = rings.flatMap(r => r.indices.collect { case j if j % 2 == 0 => r(j) })
      val ys = rings.flatMap(r => r.indices.collect { case j if j % 2 == 1 => r(j) })
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(i + 1)               // record number, 1-based
      buf.putInt(contentLen / 2)      // content length in 16-bit words
      buf.order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(5)                   // polygon
      buf.putDouble(xs.min); buf.putDouble(ys.min)
      buf.putDouble(xs.max); buf.putDouble(ys.max)
      buf.putInt(rings.length); buf.putInt(numPoints)
      var off = 0
      rings.foreach { r => buf.putInt(off); off += r.length / 2 }
      rings.foreach { r => r.foreach(buf.putDouble) }
      buf.array()
    }
    val allX = shapes.flatMap(_.flatMap(r => r.indices.collect { case j if j % 2 == 0 => r(j) }))
    val allY = shapes.flatMap(_.flatMap(r => r.indices.collect { case j if j % 2 == 1 => r(j) }))
    val totalLen = 100 + records.map(_.length).sum
    val header = ByteBuffer.allocate(100)
    header.order(ByteOrder.BIG_ENDIAN)
    header.putInt(9994)
    header.position(24); header.putInt(totalLen / 2)
    header.order(ByteOrder.LITTLE_ENDIAN)
    header.position(28); header.putInt(1000)
    header.putInt(5)
    header.putDouble(if (allX.isEmpty) 0 else allX.min)
    header.putDouble(if (allY.isEmpty) 0 else allY.min)
    header.putDouble(if (allX.isEmpty) 0 else allX.max)
    header.putDouble(if (allY.isEmpty) 0 else allY.max)
    // z/m ranges stay zero (2D shapes)
    val out = new java.io.FileOutputStream(path)
    try { out.write(header.array()); records.foreach(out.write) } finally out.close()
  }

  /** Write a .dbf (dBase III) attribute file pairing positionally with the
    * shapes of the sibling .shp. All values serialized per field width:
    * 'C' right-padded, 'N' left-padded. */
  def writeDbf(path: String, fields: Seq[DbfField], rows: Seq[Seq[String]]): Unit = {
    val headerSize = 32 + 32 * fields.length + 1
    val recordSize = 1 + fields.map(_.length).sum
    val buf = ByteBuffer.allocate(headerSize + recordSize * rows.length + 1)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x03.toByte)
    buf.put(Array[Byte](126, 1, 1))  // last-update date (any valid value)
    buf.putInt(rows.length)
    buf.putShort(headerSize.toShort)
    buf.putShort(recordSize.toShort)
    buf.position(32)
    fields.foreach { f =>
      val name = f.name.getBytes(StandardCharsets.US_ASCII).take(10)
      val start = buf.position()
      buf.put(name); buf.position(start + 11)
      buf.put(f.fieldType.toByte)
      buf.position(start + 16)
      buf.put(f.length.toByte); buf.put(f.decimals.toByte)
      buf.position(start + 32)
    }
    buf.put(0x0d.toByte)
    rows.foreach { row =>
      buf.put(' '.toByte)
      fields.zip(row).foreach { case (f, v) =>
        val s = if (f.fieldType == 'N') v.reverse.padTo(f.length, ' ').reverse.take(f.length)
                else v.padTo(f.length, ' ').take(f.length)
        buf.put(s.getBytes(StandardCharsets.US_ASCII))
      }
    }
    buf.put(0x1a.toByte)
    val out = new java.io.FileOutputStream(path)
    try out.write(buf.array(), 0, buf.position()) finally out.close()
  }
}
