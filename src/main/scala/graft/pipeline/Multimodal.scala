package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
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

  /** Resize stage: binary → smaller binary, per partition, media
    * schema in = media schema out (so stages compose into a pipeline).
    *
    * ??? REAL-CODEC BOUNDARY: a production image resize decodes,
    * scales, and re-encodes here. The deterministic stand-in keeps
    * every k-th byte with stride k = ceil(n/targetBytes) — a real
    * byte-level downsample whose output the DuckDB oracle recomputes
    * exactly (driver q39).
    */
  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes > 0)
    val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(mediaSchema))
    media.select("media_id", "modality", "bytes", "meta").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](2)
        val meta = r.getStruct(3)
        val out =
          if (bytes.length <= targetBytes) bytes
          else {
            val k = (bytes.length + targetBytes - 1) / targetBytes
            val n = (bytes.length - 1) / k + 1
            Array.tabulate(n)(j => bytes(j * k))
          }
        Row(r.getLong(0), r.getString(1), out,
          Row(meta.getString(0), out.length))
      }
    }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Frame-sample stage: one media row explodes into one row per
    * sampled fixed-size frame (every `everyN`-th of the `frameSize`
    * byte frames) — the video-keyframe shape: a 100 TB corpus fans out
    * map-side, no shuffle, and downstream stages see per-frame rows.
    *
    * ??? REAL-CODEC BOUNDARY: production splits on container keyframes;
    * the stand-in splits the byte stream at fixed offsets, which the
    * oracle recomputes exactly (driver q40).
    */
  def frameSample(media: DataFrame, frameSize: Int, everyN: Int): DataFrame = {
    require(frameSize > 0 && everyN > 0)
    val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(frameSchema))
    media.select("media_id", "modality", "bytes").mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val modality = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val nFrames = (bytes.length + frameSize - 1) / frameSize
        (0 until nFrames).iterator.filter(_ % everyN == 0).map { j =>
          val from = j * frameSize
          val until = math.min(from + frameSize, bytes.length)
          val frame = java.util.Arrays.copyOfRange(bytes, from, until)
          var checksum = 0L
          var i = 0
          while (i < frame.length) {
            checksum = (checksum * 31 + (frame(i) & 0xff)) % 1000000007L
            i += 1
          }
          Row(id, modality, j, frame, frame.length, checksum)
        }
      }
    }(enc)
  }
}
