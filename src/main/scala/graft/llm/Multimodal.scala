package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column handling: media travel as opaque `binary` columns with
 * a typed metadata struct; per-item decode / feature-extraction runs as a
 * partition-local batched pipeline (`mapPartitions` — the JVM analogue of
 * a pandas-batch UDF: one iterator per partition, amortized per-batch
 * setup, no per-row driver involvement).
 *
 * The actual media codecs are NOT available in this environment, so
 * [[FakeCodec]] is a clearly-marked deterministic stand-in that parses a
 * tiny synthetic header; the Spark-side plumbing — schema, batch shape,
 * partition distribution, null handling — is real and is what the
 * operators test.
 *
 * Scale notes: binary payloads dominate partition size, so callers should
 * lower `spark.sql.files.maxPartitionBytes` for media tables; decode is
 * embarrassingly parallel and shuffle-free.
 */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // codec/container name
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val FeatureSchema: StructType = StructType(Seq(
    StructField("decoded_ok", BooleanType),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType),
    StructField("brightness", DoubleType))) // stand-in scalar feature

  /**
   * STUB CODEC — deterministic fake. A real deployment swaps this for an
   * actual decoder (JavaCV/TwelveMonkeys/etc.); signature and batch
   * behavior stay identical. "Header": byte0=width/16, byte1=height/16.
   */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Boolean, Int, Int, Double) =
      if (payload == null || payload.length < 2) (false, 0, 0, 0.0)
      else {
        val w = (payload(0) & 0xFF) * 16
        val h = (payload(1) & 0xFF) * 16
        // "brightness" = mean byte value of the body — deterministic
        val body = payload.drop(2)
        val mean = if (body.isEmpty) 0.0
          else body.map(b => (b & 0xFF).toDouble).sum / body.length
        (true, w, h, mean / 255.0)
      }
  }

  private def checksum(bytes: Array[Byte]): Long =
    if (bytes == null) 0L else bytes.foldLeft(1469598103934665603L) {
      (h, b) => (h ^ (b & 0xFF)) * 1099511628211L // FNV-1a
    }

  /**
   * Decode + feature-extract: binary `payloadCol` → appended `meta`
   * (MediaMetaSchema) and `features` (FeatureSchema) structs. Runs
   * partition-local with no shuffle; `batchSize` controls how many
   * payloads are materialized at once (the pandas-batch analogue).
   */
  def decodeAndFeaturize(df: DataFrame, payloadCol: String = "payload",
                         mediaType: String = "image",
                         batchSize: Int = 64): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("meta", MediaMetaSchema), StructField("features", FeatureSchema)))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch codec setup would go here in a real decoder
        batch.iterator.map { row =>
          val payload = row.getAs[Array[Byte]](payloadIdx)
          val (ok, w, h, brightness) = FakeCodec.decode(payload)
          val nBytes = if (payload == null) 0L else payload.length.toLong
          val meta = Row(mediaType, "fake", w, h, 0L)
          val features = Row(ok, nBytes, checksum(payload), brightness)
          Row.fromSeq(row.toSeq ++ Seq(meta, features))
        }
      }
    }(enc)
  }

  /** Frame-sampling plan for video payloads: one output row per sampled
    * frame index (pure plan — `posexplode` over a sequence; the frame
    * extraction itself is the codec's job). */
  def sampleFrames(df: DataFrame, nFrames: Column, everyNth: Int): DataFrame =
    df.withColumn("frame_index",
      explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(everyNth))))

  /** Deterministic synthetic media table for tests/benchmarks: payload
    * bytes are a function of the id, so decode results are stable. */
  def syntheticMediaTable(spark: SparkSession, n: Int,
                          bodyBytes: Int = 256): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val body = Array.tabulate(bodyBytes)(j => ((i * 31 + j) % 251).toByte)
      val header = Array(((i % 64) + 1).toByte, ((i % 48) + 1).toByte)
      (i, header ++ body)
    }.toDF("media_id", "payload")
  }
}
