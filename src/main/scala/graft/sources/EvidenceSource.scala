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
    if (Option(options.get("mode")).contains("hits")) EvidenceSource.HitsSchema
    else EvidenceSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    val format = Option(opts.get("format")).getOrElse("auto")
    val chunkSize = Option(opts.get("chunksize")).map(_.toLong).getOrElse(512L * 1024 * 1024)
    val overlap = Option(opts.get("overlap")).map(_.toLong).getOrElse(65536L)
    // container dispatch: raw | ewf | auto (default sniffs the EWF
    // signature, so .E01 images need no flag)
    if (Option(opts.get("mode")).contains("hits"))
      new EvidenceHitsTable(path, format, chunkSize, overlap,
        Option(opts.get("types")).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
    else
      new EvidenceTable(path, format, chunkSize, overlap)
  }
}

object EvidenceSource {
  val Schema: StructType = StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("valid_length", LongType, nullable = false),
    StructField("data", BinaryType, nullable = false)))

  /** `mode=hits` schema: signature-scan matches after overlap-ownership
    * dedup, one row per hit.
    */
  val HitsSchema: StructType = StructType(Seq(
    StructField("global_offset", LongType, nullable = false),
    StructField("file_type", StringType, nullable = false),
    StructField("pattern_id", StringType, nullable = false)))
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

/** `mode=hits`: the signature scan itself runs INSIDE the DSv2 scan, and
  * `file_type` predicates push down into automaton construction — a
  * `WHERE file_type IN ('jpeg','png')` compiles an Aho–Corasick over
  * just those types' patterns, so the per-byte scan work shrinks with
  * the query instead of scanning all 43 patterns and filtering rows
  * after (the `--types` semantics of the reference's
  * filter_file_types, src/config.rs, applied at the source).
  */
private[sources] class EvidenceHitsTable(path: String, format: String,
    chunkSize: Long, overlap: Long, types: Option[Seq[String]])
    extends Table with SupportsRead {
  require(path != null, "graft evidence source requires option 'path'")
  override def name(): String = s"evidence_hits(`$path`)"
  override def schema(): StructType = EvidenceSource.HitsSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EvidenceHitsScanBuilder(EvidenceOpen.ref(path, format), chunkSize, overlap, types)
}

private[sources] class EvidenceHitsScanBuilder(ref: EvidenceRef, chunkSize: Long,
    overlap: Long, typesOption: Option[Seq[String]])
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In}

  // LIMIT n caps each partition's emitted hit rows at n (partial
  // pushdown — Spark's CollectLimit still trims globally, so results
  // stay exact). A preview `LIMIT 100` over a 100 TB image then
  // finishes after the first partition instead of shipping every hit
  // row; the byte scan itself stays chunk-granular (a chunk is the
  // atom of work). Spark only pushes the limit when no residual
  // filter sits between it and the scan, so the cap can never starve
  // a filtered query of rows.
  private var limitN: Option[Int] = None

  override def pushLimit(limit: Int): Boolean = {
    limitN = Some(limit)
    true
  }
  override def isPartiallyPushed(): Boolean = true

  private var required: StructType = EvidenceSource.HitsSchema
  private var pushed: Array[Filter] = Array.empty
  // Some(true) = COUNT(*) GROUP BY file_type pushed; Some(false) =
  // global COUNT(*) pushed. Partial-aggregate contract: each partition
  // emits its own counts and Spark's final agg sums them, so the scan
  // ships one row per (partition, type) instead of one row per hit —
  // at a 100 TB image that is the scan→agg traffic collapsing from
  // billions of hit rows to |partitions|·|types|.
  private var aggMode: Option[Boolean] = None

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.CountStar
    val oneCountStar = agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar]
    val gb = agg.groupByExpressions
    val grouped = gb.length == 1 && (gb(0) match {
      case f: NamedReference => f.fieldNames.toSeq == Seq("file_type")
      case _ => false
    })
    if (oneCountStar && (grouped || gb.isEmpty)) { aggMode = Some(grouped); true }
    else false
  }
  // None = no pruning (full pattern set); Some(s) = AND-intersection of
  // the `types` option (the --types analog for WHERE-less jobs) and
  // every accepted file_type predicate
  private var allowedTypes: Option[Set[String]] = typesOption.map(_.toSet)

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = filters.filter {
      case EqualTo("file_type", _: String) => true
      case In("file_type", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    accepted.foreach {
      case EqualTo(_, v: String) => intersect(Set(v))
      case In(_, vs) => intersect(vs.map(_.asInstanceOf[String]).toSet)
      case _ => ()
    }
    pushed = accepted
    // Return EVERY filter as residual: pruning the pattern set is a
    // performance hint, not an exact evaluation — filterFileTypes is
    // case-insensitive and expands container families (docx→zip,
    // doc→ole), so the pruned scan can emit rows the predicate
    // rejects (e.g. 'zip' rows for a 'docx' ask). Spark re-applies
    // the predicate post-scan, keeping results exact while the
    // automaton still compiles only the asked-for patterns.
    filters
  }

  private def intersect(s: Set[String]): Unit =
    allowedTypes = Some(allowedTypes.fold(s)(_ intersect s))

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = aggMode match {
    case Some(grouped) => new EvidenceHitsCountScan(ref, chunkSize, overlap,
      allowedTypes.map(_.toSeq.sorted), grouped)
    case None => new EvidenceHitsScan(ref, chunkSize, overlap,
      allowedTypes.map(_.toSeq.sorted), required, limitN)
  }
}

/** Pushed-COUNT scan: one partial-count row per (partition, file_type)
  * (or one per partition for a global COUNT(*)); Spark's final
  * aggregation sums the partials.
  */
private[graft] class EvidenceHitsCountScan(ref: EvidenceRef, chunkSize: Long,
    overlap: Long, val pushedTypes: Option[Seq[String]], grouped: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType =
    if (grouped) StructType(Seq(
      StructField("file_type", StringType, nullable = false),
      StructField("count", LongType, nullable = false)))
    else StructType(Seq(StructField("count", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"graft evidence hits, PushedAggregation: count(*)" +
      (if (grouped) " group by file_type" else "") +
      s", PushedTypes: ${pushedTypes.map(_.mkString("[", ",", "]")).getOrElse("ALL")}"

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
    new EvidenceHitsCountReaderFactory(ref, pushedTypes, grouped)
}

private[sources] class EvidenceHitsCountReaderFactory(ref: EvidenceRef,
    types: Option[Seq[String]], grouped: Boolean)
    extends PartitionReaderFactory {
  @transient private lazy val scan: graft.scan.SignatureScan =
    EvidenceHitsReaderFactory.scanFor(types)

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EvidenceChunkPartition]
    new PartitionReader[InternalRow] {
      private lazy val reader = ref.open()
      private var rows: Iterator[InternalRow] = _

      private def ensure(): Unit = if (rows == null) {
        val buf = new Array[Byte](p.length.toInt)
        var got = 0
        var n = 1
        while (got < buf.length && n > 0) {
          n = reader.readAt(p.start + got, buf, got, buf.length - got)
          got += n
        }
        val chunk = graft.core.ScanChunk(p.id, p.start, p.length, p.validLength)
        val hits = scan.normalize(chunk, scan.scanChunk(chunk, buf, got))
        rows =
          if (grouped)
            hits.groupBy(h => scan.patterns(h.patternId).fileTypeId)
              .toSeq.sortBy(_._1)
              .map { case (ft, hs) => InternalRow(
                org.apache.spark.unsafe.types.UTF8String.fromString(ft),
                hs.size.toLong) }
              .iterator
          else Iterator.single(InternalRow(hits.size.toLong))
      }

      override def next(): Boolean = { ensure(); rows.hasNext }
      override def get(): InternalRow = rows.next()
      override def close(): Unit = reader.close()
    }
  }
}

private[graft] class EvidenceHitsScan(ref: EvidenceRef, chunkSize: Long,
    overlap: Long, val pushedTypes: Option[Seq[String]], required: StructType,
    val pushedLimit: Option[Int] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft evidence hits, PushedTypes: ${pushedTypes.map(_.mkString("[", ",", "]")).getOrElse("ALL")}" +
      pushedLimit.map(n => s", PushedLimit: $n").getOrElse("")

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
    new EvidenceHitsReaderFactory(ref, chunkSize, overlap, pushedTypes, required,
      pushedLimit)
}

private[sources] object EvidenceHitsReaderFactory {
  // PartitionReaderFactory instances deserialize once PER TASK, so a
  // lazy val would recompile the automaton for every chunk partition.
  // This JVM-level cache (keyed by the pruned type set) makes the
  // compile once-per-executor for real — at a 100 TB image's ~200k
  // partitions that is the difference between 1 and 200k compiles.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.scan.SignatureScan]()

  private[sources] def scanFor(types: Option[Seq[String]]): graft.scan.SignatureScan =
    cache.computeIfAbsent(types.map(_.mkString(",")).getOrElse(" ALL"), _ => {
      val (cfg, _) = graft.carve.EngineConfig.filterFileTypes(
        graft.carve.EngineConfig(), types, disableZip = false)
      graft.scan.SignatureScan(cfg)
    })
}

private[sources] class EvidenceHitsReaderFactory(ref: EvidenceRef, chunkSize: Long,
    overlap: Long, types: Option[Seq[String]], schema: StructType,
    limit: Option[Int] = None)
    extends PartitionReaderFactory {
  @transient private lazy val scan: graft.scan.SignatureScan =
    EvidenceHitsReaderFactory.scanFor(types)

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EvidenceChunkPartition]
    new PartitionReader[InternalRow] {
      private lazy val reader = ref.open()
      private var hits: Iterator[graft.core.NormalizedHit] = _

      private def ensure(): Unit = if (hits == null) {
        val buf = new Array[Byte](p.length.toInt)
        var got = 0
        var n = 1
        while (got < buf.length && n > 0) {
          n = reader.readAt(p.start + got, buf, got, buf.length - got)
          got += n
        }
        val chunk = graft.core.ScanChunk(p.id, p.start, p.length, p.validLength)
        val all = scan.normalize(chunk, scan.scanChunk(chunk, buf, got)).iterator
        hits = limit.fold(all)(all.take)
      }

      override def next(): Boolean = { ensure(); hits.hasNext }

      override def get(): InternalRow = {
        val h = hits.next()
        val pat = scan.patterns(h.patternId)
        InternalRow.fromSeq(schema.fields.toIndexedSeq.map {
          _.name match {
            case "global_offset" => h.globalOffset
            case "file_type" =>
              org.apache.spark.unsafe.types.UTF8String.fromString(pat.fileTypeId)
            case "pattern_id" =>
              org.apache.spark.unsafe.types.UTF8String.fromString(pat.patternId)
          }
        })
      }

      override def close(): Unit = reader.close()
    }
  }
}

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
