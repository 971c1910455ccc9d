package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns
  * with typed metadata, plus per-partition decode / feature-extract
  * plumbing — the Scala analog of Pandas-UDF `mapInPandas` stages
  * (Dataset.mapPartitions keeps the same batch-iterator shape; one
  * decoder instance per partition, rows streamed through it).
  *
  * The DECODE step is a deterministic STUB: this container has no
  * image/audio codecs, so `decode` parses bytes with a trivial
  * deterministic routine where a real deployment would call the codec
  * (clearly marked below). Everything around it — the media schema,
  * the binary column handling, partitioning, the batched iterator
  * plumbing, and the feature shapes — is real and tested.
  */
object Multimodal {

  /** media table schema: opaque payload + typed metadata, the shape a
    * 100 TB media lake lands in (payloads in parquet binary columns or
    * object-store refs; metadata queryable without touching bytes).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false))), nullable = false)))

  val HistBins = 16

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("hist", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Wrap any DataFrame with an id and a string payload column into
    * media rows (the payload bytes become the opaque binary). Lets the
    * documents table stand in for a media lake deterministically.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      modality: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      encode(col(payloadCol), "UTF-8").as("bytes"),
      struct(lit(format).as("format"),
        length(col(payloadCol)).cast("int").as("n_bytes")).as("meta"))

  /** Per-partition feature extraction over raw bytes: byte count,
    * polynomial checksum, and a byte-value histogram (value % bins).
    *
    * ??? REAL-CODEC BOUNDARY: a production build decodes `bytes` with
    * an image/audio library here (one codec instance per partition,
    * exactly this iterator shape). This container has none, so the
    * "decode" is the deterministic byte walk below — the plumbing
    * around it is what this operator tests.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    media.select("media_id", "modality", "bytes").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val modality = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val hist = new Array[Long](HistBins)
        var checksum = 0L
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          hist(b % HistBins) += 1
          checksum = (checksum * 31 + b) % 1000000007L
          i += 1
        }
        Row(id, modality, bytes.length, checksum, hist.toSeq)
      }
    }(enc)
  }

  /** Metadata-only stage: "resize" plan for images / "frame-sample"
    * plan for video expressed as a target-spec column — at scale this
    * is the stage that decides per-row work BEFORE bytes are touched,
    * so the expensive decode only runs on rows that survive.
    */
  def planTransform(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("transform",
      when(col("meta.n_bytes") > maxBytes, lit("downsample"))
        .otherwise(lit("passthrough")))
}
