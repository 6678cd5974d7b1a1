package graft.sources

import graft.core.ChunkPlanner
import graft.evidence.{EvidenceOpen, EvidenceRef}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util

/** DataSource V2 evidence table (SURVEY §1.1 / §7.3 "optional custom DSv2
  * source"): exposes a raw image as a table of overlapping chunk rows
  *
  * {{{
  * spark.read.format("graft.sources.EvidenceSource")
  *   .option("path", "/data/image.dd")
  *   .option("chunkSize", 512L * 1024 * 1024)
  *   .option("overlap", 65536)
  *   .load()    // (chunk_id LONG, start LONG, valid_length LONG, data BINARY)
  * }}}
  *
  * `planInputPartitions` emits one partition per chunk, so scan
  * parallelism == chunk count and each task preads exactly its range —
  * the shape that scales to a 1000-executor cluster. Column pruning is
  * honored: a query that never touches `data` never reads the image
  * payload (only the header for the length).
  */
class EvidenceSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EvidenceSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    // container dispatch: raw | ewf | auto (default sniffs the EWF
    // signature, so .E01 images need no flag)
    new EvidenceTable(
      opts.get("path"),
      Option(opts.get("format")).getOrElse("auto"),
      Option(opts.get("chunksize")).map(_.toLong).getOrElse(512L * 1024 * 1024),
      Option(opts.get("overlap")).map(_.toLong).getOrElse(65536L))
  }
}

object EvidenceSource {
  val Schema: StructType = StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("valid_length", LongType, nullable = false),
    StructField("data", BinaryType, nullable = false)))
}

private[sources] class EvidenceTable(path: String, format: String, chunkSize: Long, overlap: Long)
    extends Table with SupportsRead {
  require(path != null, "graft evidence source requires option 'path'")
  override def name(): String = s"evidence(`$path`)"
  override def schema(): StructType = EvidenceSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EvidenceScanBuilder(EvidenceOpen.ref(path, format), chunkSize, overlap)
}

private[sources] class EvidenceScanBuilder(ref: EvidenceRef, chunkSize: Long, overlap: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = EvidenceSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val len = {
        val r = ref.open()
        try r.length finally r.close()
      }
      ChunkPlanner.planLocal(len, chunkSize, overlap)
        .map(c => EvidenceChunkPartition(c.id, c.start, c.length, c.validLength): InputPartition)
        .toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new EvidenceReaderFactory(ref, required)
  }
}

private[sources] case class EvidenceChunkPartition(
    id: Long, start: Long, length: Long, validLength: Long) extends InputPartition

private[sources] class EvidenceReaderFactory(ref: EvidenceRef, schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EvidenceChunkPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      private lazy val reader = ref.open()

      override def next(): Boolean = !emitted

      override def get(): InternalRow = {
        emitted = true
        val values = schema.fields.map {
          _.name match {
            case "chunk_id" => p.id
            case "start" => p.start
            case "valid_length" => p.validLength
            case "data" =>
              val buf = new Array[Byte](p.length.toInt)
              var got = 0
              var n = 1
              while (got < buf.length && n > 0) {
                n = reader.readAt(p.start + got, buf, got, buf.length - got)
                got += n
              }
              if (got == buf.length) buf else java.util.Arrays.copyOf(buf, got)
          }
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }

      override def close(): Unit = reader.close()
    }
  }
}
