package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.OptionalLong

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** `.fvecs` — the vector-corpus interchange format every public ANN
  * benchmark ships (SIFT1B/GIST/Deep1B: one `[dim:int32-LE][dim ×
  * float32-LE]` record per vector, row id = record position). The
  * reference ingests its vector corpus from parquet
  * (Program.cs:31-99); a user switching benchmarks ingests fvecs, so
  * the library reads it natively — as a real DataSourceV2 `Table`, not
  * a driver-side loader:
  *
  *  - **Splittable scan.** fvecs has no footer/index, but the record
  *    size is constant per corpus, so byte-range splits are pure
  *    arithmetic: each [[FvecsInputPartition]] is
  *    (file, startRecord, nRecords) aligned to record boundaries, and
  *    executors seek straight to `startRecord × recordSize`. A 100 TB
  *    corpus scans with the same parallelism as parquet — no central
  *    row-group metadata needed.
  *  - **Global row ids for free.** The vector's corpus position IS its
  *    id (that's how ivecs ground-truth files address neighbors), and
  *    position = cumulative record offset across the name-sorted file
  *    list — each split knows its `globalStart` at plan time, so `idx`
  *    costs nothing: no zipWithIndex pass, no window, no exchange
  *    (contrast q08's two-pass global sort).
  *  - **Column pruning.** `SupportsPushDownRequiredColumns`: an
  *    idx-only query (e.g. `count`, id-range checks) never converts
  *    float payloads — the reader skips records by seek arithmetic.
  *
  * Write side ([[Fvecs.write]]): range-repartition by id +
  * sortWithinPartitions, then each task streams its partition to one
  * `part-NNNNN.fvecs` via the Hadoop FileSystem API (works on any
  * scheme, no driver collect). Name-sorted part files concatenate to
  * the id order, so read-side `idx` = global id rank — regardless of
  * where the (sampled) range bounds happened to fall.
  */
object Fvecs {

  val IdxField = "idx"
  val VecField = "vec"

  /** Payload element kind. fvecs (float32) and ivecs (int32) share the
    * 4-byte component layout; bvecs (SIFT1B's base/query format) packs
    * UNSIGNED 1-byte components — surfaced widened to int, the lossless
    * Spark type for 0-255. The kind travels through the plan (not
    * inferred from the schema: bvecs and ivecs both read as
    * `array<int>`, only the record width differs). */
  sealed abstract class Elem(val bytes: Int, val ints: Boolean)
  case object F32 extends Elem(4, ints = false)
  case object I32 extends Elem(4, ints = true)
  case object U8 extends Elem(1, ints = true)
  def elemOf(s: String): Elem =
    if ("int".equalsIgnoreCase(s)) I32
    else if ("byte".equalsIgnoreCase(s)) U8
    else F32

  def schemaFor(e: Elem): StructType = StructType(Seq(
    StructField(IdxField, LongType, nullable = false),
    StructField(VecField,
      ArrayType(if (e.ints) IntegerType else FloatType, containsNull = false),
      nullable = false)))
  val Schema: StructType = schemaFor(F32)

  /** Write `df`'s (idCol, vecCol) as a directory of fvecs part files in
    * global idCol order. `numFiles` bounds write parallelism; boundary
    * placement is sampling-dependent but the concatenated order (the
    * only thing the format encodes) is exactly the id order. */
  def write(df: DataFrame, idCol: String, vecCol: String, dir: String,
            numFiles: Int = 8): Unit =
    writeAs(df, idCol, vecCol, dir, numFiles, F32)

  /** ivecs twin (int32 payloads — ground-truth neighbor lists). */
  def writeIvecs(df: DataFrame, idCol: String, vecCol: String, dir: String,
                 numFiles: Int = 8): Unit =
    writeAs(df, idCol, vecCol, dir, numFiles, I32)

  /** bvecs twin (unsigned-byte payloads — SIFT1B base/query vectors).
    * Values must already be 0-255; out-of-range components fail the
    * write rather than silently truncating a corpus. */
  def writeBvecs(df: DataFrame, idCol: String, vecCol: String, dir: String,
                 numFiles: Int = 8): Unit =
    writeAs(df, idCol, vecCol, dir, numFiles, U8)

  private def writeAs(df: DataFrame, idCol: String, vecCol: String, dir: String,
                      numFiles: Int, elem: Elem): Unit = {
    val spark = df.sparkSession
    val confSer = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val out = new Path(dir)
    val fs = out.getFileSystem(confSer.value)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    val elemSql = if (elem.ints) "array<int>" else "array<float>"
    val elemBytes = elem.bytes
    val u8 = elem == U8
    df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast(elemSql).as("v"))
      .repartitionByRange(numFiles, col("id"))
      .sortWithinPartitions("id")
      .foreachPartition { (it: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val p = new Path(dir, f"part-$pid%05d.fvecs")
        val stream = p.getFileSystem(confSer.value).create(p, true)
        try {
          it.foreach { r =>
            val n = r.getSeq[Any](1).length
            val buf = ByteBuffer.allocate(4 + elemBytes * n).order(ByteOrder.LITTLE_ENDIAN)
            buf.putInt(n)
            if (u8) r.getSeq[Int](1).foreach { v =>
              require(v >= 0 && v <= 255, s"bvecs component $v out of unsigned-byte range")
              buf.put(v.toByte)
            }
            else if (elem.ints) r.getSeq[Int](1).foreach(buf.putInt)
            else r.getSeq[Float](1).foreach(buf.putFloat)
            stream.write(buf.array())
          }
        } finally stream.close()
      }
  }

  /** Convenience batch reader (the DSv2 path): `(idx, vec)` over every
    * `.fvecs` part under `dir`, name-sorted. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("fvecs").load(dir)

  /** ivecs twin: `(idx, vec: array<int>)`. */
  def readIvecs(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("fvecs").option("elements", "int").load(dir)

  /** bvecs twin: `(idx, vec: array<int>)`, components widened 0-255. */
  def readBvecs(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("fvecs").option("elements", "byte").load(dir)

  /** q116: the export → DSv2 re-ingest differential, summarized as a
    * per-`idx%16`-bucket (count, Σ norm-micros) report the DuckDB
    * oracle reproduces from the parquet side with `row_number() - 1`
    * as idx. Proves the full loop — record-aligned splits, plan-time
    * global ids, LE float payloads — is LOSSLESS: any dropped/dup
    * record shifts every later idx to another bucket, any byte-level
    * corruption moves a norm; both break the hash. The clean filter
    * mirrors the oracles' cleanEmb guard (a null-element row cannot be
    * encoded as fvecs floats). Norms go integer (round·1e6 → long, the
    * q82 recipe) BEFORE the bucket sum so the aggregate is
    * order-independent-exact on both engines. */
  def roundtripReport(emb: DataFrame, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val clean = emb.where(size(col("embedding")) === 64 &&
      size(filter(col("embedding"), x => x.isNull)) === 0)
    write(clean, "vec_id", "embedding", dir)
    read(emb.sparkSession, dir)
      .select(pmod(col("idx"), lit(16L)).as("bucket"),
        round(graft.functions.VectorFunctions.dot(col("vec"), col("vec")) * 1000000d)
          .cast("long").as("norm_u"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"), sum("norm_u").as("sum_norm_u"))
      .orderBy("bucket")
  }
}

/** DSv2 entry point; registered as short name `fvecs` via
  * META-INF/services (also reachable as
  * `format("graft.sources.FvecsDataSource")`). */
class FvecsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "fvecs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Fvecs.schemaFor(Fvecs.elemOf(options.get("elements")))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "fvecs source requires a path")
    new FvecsTable(path, Fvecs.elemOf(properties.get("elements")))
  }
}

class FvecsTable(path: String, elem: Fvecs.Elem = Fvecs.F32) extends Table with SupportsRead {
  override def name(): String = s"fvecs:$path"
  override def schema(): StructType = Fvecs.schemaFor(elem)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FvecsScanBuilder(path, elem)
}

class FvecsScanBuilder(path: String, elem: Fvecs.Elem)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = Fvecs.schemaFor(elem)
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Preserve our field order; an empty prune (count(*)) keeps zero fields.
    required = StructType(Fvecs.schemaFor(elem).fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  }
  override def build(): Scan = {
    val spark = SparkSession.active
    val confSer = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val targetSplitBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    new FvecsScan(path, required, elem, confSer, targetSplitBytes)
  }
}

/** One record-aligned byte range of one file. `globalStart` is the
  * corpus position of the range's first record (plan-time cumulative
  * sum over the name-sorted file list). */
case class FvecsInputPartition(file: String, dim: Int, elemBytes: Int,
                               startRecord: Long, nRecords: Long,
                               globalStart: Long) extends InputPartition

class FvecsScan(path: String, required: StructType, elem: Fvecs.Elem,
                confSer: SerializableConfiguration, targetSplitBytes: Long)
  extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"fvecs scan of $path"

  // Planned once; file listing + one 4-byte dim probe per file (driver,
  // O(#files) — the same cost class as parquet footer planning).
  private lazy val files: Seq[(String, Long, Int)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(confSer.value)
    val stats =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".fvecs"))
          .sortBy(_.getPath.getName).toSeq
      else Seq(fs.getFileStatus(p))
    stats.filter(_.getLen > 0).map { s =>
      val in = fs.open(s.getPath)
      val dimBuf = new Array[Byte](4)
      try in.readFully(0L, dimBuf) finally in.close()
      val dim = ByteBuffer.wrap(dimBuf).order(ByteOrder.LITTLE_ENDIAN).getInt
      require(dim > 0 && dim < (1 << 24), s"implausible fvecs dim $dim in ${s.getPath}")
      val recordSize = 4L + elem.bytes.toLong * dim
      require(s.getLen % recordSize == 0,
        s"${s.getPath}: length ${s.getLen} not a multiple of record size $recordSize")
      (s.getPath.toString, s.getLen / recordSize, dim)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = Seq.newBuilder[InputPartition]
    var globalStart = 0L
    for ((file, nRecs, dim) <- files) {
      val recordSize = 4L + elem.bytes.toLong * dim
      val splitRecs = math.max(1L, targetSplitBytes / recordSize)
      var start = 0L
      while (start < nRecs) {
        val n = math.min(splitRecs, nRecs - start)
        parts += FvecsInputPartition(file, dim, elem.bytes, start, n, globalStart + start)
        start += n
      }
      globalStart += nRecs
    }
    parts.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FvecsReaderFactory(required, confSer)

  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = files.map(_._2).sum
    private val bytes = files.map(f => f._2 * (4L + elem.bytes.toLong * f._3)).sum
    override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
    override def numRows(): OptionalLong = OptionalLong.of(rows)
  }
}

class FvecsReaderFactory(required: StructType, confSer: SerializableConfiguration)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FvecsInputPartition]
    new FvecsPartitionReader(p, required, confSer)
  }
}

class FvecsPartitionReader(p: FvecsInputPartition, required: StructType,
                           confSer: SerializableConfiguration)
  extends PartitionReader[InternalRow] {

  private val needIdx = required.fieldNames.contains(Fvecs.IdxField)
  private val needVec = required.fieldNames.contains(Fvecs.VecField)
  // The partition carries the component WIDTH (1 for .bvecs, 4 for
  // .fvecs/.ivecs); the pruned schema's element type resolves the
  // remaining 4-byte ambiguity (int32 vs float32). bvecs components
  // widen unsigned (& 0xff) to int.
  private val byteElems = p.elemBytes == 1
  private val intElems = required.fields.find(_.name == Fvecs.VecField)
    .exists(_.dataType == ArrayType(IntegerType, containsNull = false))
  private val recordSize = 4 + p.elemBytes * p.dim
  private val path = new Path(p.file)
  private val in = path.getFileSystem(confSer.value).open(path)
  in.seek(p.startRecord * recordSize)

  private val recBuf = new Array[Byte](recordSize)
  private var i = 0L
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (i >= p.nRecords) return false
    if (needVec) {
      in.readFully(recBuf)
      val bb = ByteBuffer.wrap(recBuf).order(ByteOrder.LITTLE_ENDIAN)
      val d = bb.getInt
      require(d == p.dim, s"fvecs record $i in ${p.file}: dim $d != ${p.dim}")
      val vec =
        if (byteElems) {
          val ints = new Array[Int](p.dim)
          var j = 0
          while (j < p.dim) { ints(j) = bb.get() & 0xff; j += 1 }
          UnsafeArrayData.fromPrimitiveArray(ints)
        } else if (intElems) {
          val ints = new Array[Int](p.dim)
          bb.asIntBuffer().get(ints)
          UnsafeArrayData.fromPrimitiveArray(ints)
        } else {
          val floats = new Array[Float](p.dim)
          bb.asFloatBuffer().get(floats)
          UnsafeArrayData.fromPrimitiveArray(floats)
        }
      current =
        if (needIdx) new GenericInternalRow(Array[Any](p.globalStart + i, vec))
        else new GenericInternalRow(Array[Any](vec))
    } else {
      // idx-only (or count(*)) projection: never read the payload.
      in.seek((p.startRecord + i + 1) * recordSize.toLong)
      current =
        if (needIdx) new GenericInternalRow(Array[Any](p.globalStart + i))
        else new GenericInternalRow(Array.empty[Any])
    }
    i += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
