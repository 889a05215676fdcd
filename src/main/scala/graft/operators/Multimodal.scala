package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction /
  * frame-sampling run as batch-shaped partition transforms.
  *
  * The Spark-side architecture is real — schema, partition iterators,
  * batch shape, encoder plumbing all work at scale (an iterator-to-
  * iterator `mapPartitions`, so a 100 TB scan streams through without
  * materializing a partition).
  *
  * STUB: this container has no image/audio codec libraries, so
  * [[decodeStub]] derives deterministic pseudo-metadata from the raw
  * bytes instead of a real decode. A production deployment swaps
  * `decodeOne` for a JNI/codec call with the same signature; nothing
  * else changes.
  */
object Multimodal {

  /** Media metadata produced by decode. */
  val metaSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("format", StringType)))

  /** Attach an opaque binary payload column (here: UTF-8 bytes of a text
    * column stand in for real image bytes). */
  def withBlob(df: DataFrame, srcCol: String, blobCol: String = "blob"): DataFrame =
    df.withColumn(blobCol, col(srcCol).cast("binary"))

  /** The per-payload decode stub — the seam where a real codec plugs in. */
  private def decodeOne(id: Long, bytes: Array[Byte]): Row = {
    val n = bytes.length.toLong
    val fmt = (n % 3) match {
      case 0 => "rgb"; case 1 => "rgba"; case _ => "gray"
    }
    Row(id, n, n % 640L, n % 480L, fmt)
  }

  /** Batch decode over partition iterators (the Scala analog of a
    * `mapInPandas` batch UDF): no per-row task overhead, no partition
    * materialization — pure iterator pipeline. */
  def decodeStub(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { it =>
      it.map { r => decodeOne(r.getLong(idIdx), r.getAs[Array[Byte]](blobIdx)) }
    }(Encoders.row(metaSchema))
  }

  /** Frame sampling: n equal-stride byte slices of the payload (stands in
    * for video frame extraction) as an array<binary> column. */
  def frameSample(df: DataFrame, blobCol: String, n: Int, frameLen: Int = 16): DataFrame = {
    val strided = expr(s"transform(sequence(0, ${n - 1}), i -> " +
      s"substring($blobCol, 1 + i * greatest(1, int(length($blobCol) / $n)), $frameLen))")
    df.withColumn("frames", strided)
  }

  /** Deterministic fake featurizer: fixed-size Array[Float] from byte
    * statistics (the seam for a real embedding model; batch-shaped). */
  def featurizeStub(df: DataFrame, idCol: String, blobCol: String, dim: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("feat", ArrayType(FloatType))))
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val d = dim
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val feat = Array.tabulate(d) { k =>
          var s = 0L
          var i = k
          while (i < bytes.length) { s += bytes(i) & 0xff; i += d }
          (s % 1000L).toFloat / 1000f
        }
        Row(r.getLong(idIdx), feat.toSeq)
      }
    }(Encoders.row(outSchema))
  }
}
