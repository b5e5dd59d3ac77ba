package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal DataSource V2 for xlsx — the Spark-native form of the
  * reference's Excel scan (S1/S2/S3: /root/reference/tasks/spider.go:21-74,
  * /root/reference/test/excel_test.go:12-38): sheet 1, first row =
  * header, every cell a string (exactly the reference's reader
  * semantics, /root/reference/tasks/spider.go:46-50).
  *
  * Zero new dependencies: xlsx is a zip of XML — JDK ZipFile + StAX.
  * Usage: `spark.read.format("graft-excel").load(path)` (registered via
  * DataSourceRegister) or the FQCN.
  *
  * Scale notes: one InputPartition per file — an xlsx (deflate inside
  * zip) is not range-splittable, so parallelism comes from many files,
  * which is how a 100 TB Excel-fed ingest would arrive anyway. The
  * parse is streaming (StAX pull), never materializing the sheet.
  */
class ExcelDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-excel"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExcelDataSource.inferSchema(ExcelDataSource.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ExcelTable(schema, properties.get("path"))
}

object ExcelDataSource {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-excel requires .load(path)")
    p
  }

  /** Header row (row 1) of sheet 1 → all-string schema. */
  def inferSchema(path: String): StructType = {
    val rows = readRows(path, limit = 1)
    val header = rows.headOption.getOrElse(
      throw new IllegalArgumentException(s"empty sheet in $path"))
    StructType(header.map(name => StructField(name, StringType, nullable = true)))
  }

  /** Stream sheet-1 rows as string vectors (shared strings resolved). */
  def readRows(path: String, limit: Int = Int.MaxValue): Vector[Vector[String]] = {
    val zip = new ZipFile(path)
    try {
      val shared: IndexedSeq[String] = Option(zip.getEntry("xl/sharedStrings.xml")) match {
        case None => IndexedSeq.empty
        case Some(e) =>
          val xml = XMLInputFactory.newInstance()
            .createXMLStreamReader(zip.getInputStream(e))
          val out = ArrayBuffer[String]()
          val cur = new StringBuilder
          var inSi = false
          while (xml.hasNext) {
            xml.next() match {
              case XMLStreamConstants.START_ELEMENT if xml.getLocalName == "si" =>
                inSi = true; cur.clear()
              case XMLStreamConstants.CHARACTERS if inSi =>
                cur.append(xml.getText)
              case XMLStreamConstants.END_ELEMENT if xml.getLocalName == "si" =>
                inSi = false; out += cur.toString
              case _ =>
            }
          }
          out.toIndexedSeq
      }
      val sheet = Option(zip.getEntry("xl/worksheets/sheet1.xml"))
        .orElse(Option(zip.getEntry("xl/worksheets/sheet.xml")))
        .getOrElse(throw new IllegalArgumentException(s"no sheet1 in $path"))
      val xml = XMLInputFactory.newInstance()
        .createXMLStreamReader(zip.getInputStream(sheet))
      val rows = ArrayBuffer[Vector[String]]()
      var row = ArrayBuffer[String]()
      var cellType = ""
      var cellRef = ""
      var inV = false
      val v = new StringBuilder
      def colIndex(ref: String): Int = {
        var i = 0
        var idx = 0
        while (i < ref.length && ref.charAt(i).isLetter) {
          idx = idx * 26 + (ref.charAt(i) - 'A' + 1); i += 1
        }
        idx - 1
      }
      while (xml.hasNext && rows.length < limit) {
        xml.next() match {
          case XMLStreamConstants.START_ELEMENT => xml.getLocalName match {
            case "row" => row = ArrayBuffer[String]()
            case "c" =>
              cellType = Option(xml.getAttributeValue(null, "t")).getOrElse("")
              cellRef = Option(xml.getAttributeValue(null, "r")).getOrElse("")
            case "v" => inV = true; v.clear()
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS if inV => v.append(xml.getText)
          case XMLStreamConstants.END_ELEMENT => xml.getLocalName match {
            case "v" =>
              inV = false
              val raw = v.toString
              val value = if (cellType == "s") shared(raw.toInt) else raw
              // place at the cell's declared column (gaps → empty string)
              val at = if (cellRef.nonEmpty) colIndex(cellRef) else row.length
              while (row.length < at) row += ""
              row += value
            case "row" => rows += row.toVector
            case _ =>
          }
          case _ =>
        }
      }
      rows.toVector
    } finally zip.close()
  }
}

class ExcelTable(schema: StructType, path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-excel:$path"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ExcelScan(schema, path)
    }
}

class ExcelScan(schema: StructType, path: String) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(ExcelPartition(path))
  override def createReaderFactory(): PartitionReaderFactory =
    new ExcelReaderFactory(schema)
}

case class ExcelPartition(path: String) extends InputPartition

class ExcelReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[ExcelPartition].path
    new PartitionReader[InternalRow] {
      // skip the header row, like the reference (tasks/spider.go:45)
      private val rows = ExcelDataSource.readRows(path).drop(1).iterator
      private var current: Vector[String] = _
      override def next(): Boolean = {
        if (rows.hasNext) { current = rows.next(); true } else false
      }
      override def get(): InternalRow = {
        val vals = (0 until schema.length).map { i =>
          if (i < current.length) UTF8String.fromString(current(i)) else null
        }
        InternalRow.fromSeq(vals)
      }
      override def close(): Unit = ()
    }
  }
}
