package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract
  * run per-partition in batches.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): [[decodeImageStub]] parses a deterministic fake header
  * instead of invoking a codec. Everything around it — schema contract,
  * partition-batched execution, null handling for corrupt payloads — is
  * the real production shape; swapping the stub for an actual decoder
  * changes one function.
  */
object Multimodal {

  /** Metadata contract for a decoded image payload. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, true),
    StructField("width", IntegerType, true),
    StructField("height", IntegerType, true),
    StructField("n_bytes", LongType, false),
    StructField("ok", BooleanType, false)))

  /** STUB decoder: reads a fake 8-byte header `[fmt, w16, h16, pad]`.
    * Replace with a real codec call in production (the ??? path).
    * Returns (format, width, height) or None for corrupt payloads. */
  def decodeImageStub(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes == null || bytes.length < 6) return None
    val fmt = bytes(0) match {
      case 1 => "png"
      case 2 => "jpeg"
      case 3 => "webp"
      case _ => return None
    }
    val w = ((bytes(1) & 0xff) << 8) | (bytes(2) & 0xff)
    val h = ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    if (w == 0 || h == 0) None else Some((fmt, w, h))
  }

  /** Encode a fake payload (test/data-gen helper, the inverse stub). */
  def encodeImageStub(fmt: String, w: Int, h: Int,
                      payloadLen: Int): Array[Byte] = {
    val id: Byte = fmt match {
      case "png" => 1; case "jpeg" => 2; case "webp" => 3; case _ => 0
    }
    Array[Byte](id, ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte, 0) ++
      Array.fill[Byte](payloadLen)(0x5a)
  }

  /** Attach decoded metadata to a binary column, partition-batched.
    * Output = input columns + `meta` struct. Corrupt rows get
    * meta.ok=false instead of failing the job. */
  def withImageMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("meta", imageMetaSchema, false))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val n = if (bytes == null) 0L else bytes.length.toLong
        val meta = decodeImageStub(bytes) match {
          case Some((f, w, h)) => Row(f, w, h, n, true)
          case None            => Row(null, null, null, n, false)
        }
        Row.fromSeq(row.toSeq :+ meta)
      }
    }(enc)
  }

  /** Deterministic "feature extraction" over the payload: a 4-dim feature
    * vector from byte statistics (the real version would run a model in
    * the same partition-batched shape). */
  def extractFeatures(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(DoubleType, false), false))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val fs =
          if (bytes == null || bytes.isEmpty) Seq(0.0, 0.0, 0.0, 0.0)
          else {
            val n = bytes.length.toDouble
            val mean = bytes.map(b => (b & 0xff).toDouble).sum / n
            Seq(n, mean, (bytes.head & 0xff).toDouble,
              (bytes.last & 0xff).toDouble)
          }
        Row.fromSeq(row.toSeq :+ fs)
      }
    }(enc)
  }

  /** Frame-sample stub: pick every `stride`-th chunk of `frameLen` bytes
    * from a video-ish payload (the partitioned slicing pattern real frame
    * extraction uses). */
  def sampleFrames(df: DataFrame, binCol: String, frameLen: Int,
                   stride: Int): DataFrame = {
    require(frameLen > 0 && stride > 0)
    df.withColumn("frames",
      transform(
        sequence(lit(0),
          greatest((length(col(binCol)) / (frameLen * stride)).cast("int")
            - 1, lit(-1))),
        i => substring(col(binCol), (i * frameLen * stride + 1).cast("int"),
          lit(frameLen))))
  }
}
