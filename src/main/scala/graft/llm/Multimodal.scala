package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY §2.8): opaque binary payloads + typed
  * metadata, joined with their embeddings, with a partition-wise
  * feature-extraction stage.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB — but the Spark-side plumbing that the
  * brief asks for is real and tested: binary column + metadata struct
  * schema, docs⋈embeddings join, and a mapPartitions batch pass with an
  * explicit output schema (the same shape a Pandas-UDF/mapInPandas decode
  * would have on a cluster with codecs installed).
  */
object Multimodal {

  /** documents ⋈ embeddings on doc_id = vec_id with a typed media struct:
    * (modality, byte_len, payload binary). One hash-partitioned equi-join
    * on a unique key — broadcast or shuffle chosen by size at plan time. */
  def joined(docs: DataFrame, embeddings: DataFrame): DataFrame =
    docs.join(embeddings, docs("doc_id") === embeddings("vec_id"))
      .select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("label"), size(col("embedding")).as("emb_dim"),
        struct(
          lit("text/plain").as("modality"),
          octet_length(col("text")).as("byte_len"),
          encode(col("text"), "UTF-8").as("payload")).as("media"),
        col("embedding"))

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", IntegerType),
    StructField("first_byte", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Partition-wise "decode + featurize" pass over the binary payload.
    *
    * STUB: a real deployment decodes the payload with a codec (image
    * resize, audio frame sampling) inside this partition loop — the batch
    * shape, schema, and partitioning are exactly what that code would use.
    * Here the extracted features are deterministic functions of the bytes
    * so tests and the oracle can pin the plumbing.
    */
  private val resizeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("src_bytes", IntegerType),
    StructField("thumb_dim", IntegerType),
    StructField("thumb", BinaryType)))

  /** Shared scaffold for the partition-wise decode stubs: project
    * (doc_id, payload), run the per-doc function over each partition with
    * an explicit output schema. NULL payloads (NULL-text docs) arrive as
    * empty byte arrays — the same first-class treatment Dedup gives them. */
  private def payloadPass(joinedDf: DataFrame, schema: StructType)(
      perDoc: (Long, Array[Byte]) => Iterator[Row]): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    joinedDf.select(col("doc_id"), col("media.payload").as("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val bytes = Option(r.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          perDoc(r.getLong(0), bytes)
        }
      }(enc)
  }

  /** Partition-wise "resize" pass: STUB — production swaps the byte
    * truncation for a codec resize; the batch shape (one row in → one
    * smaller binary out, explicit schema) is the real contract. */
  def resizeStub(joinedDf: DataFrame, maxDim: Int = 8): DataFrame =
    payloadPass(joinedDf, resizeSchema) { (id, bytes) =>
      // ---- STUB resize: a real codec downsamples here ----
      Iterator.single(Row(id, bytes.length, maxDim, bytes.take(maxDim * maxDim)))
    }

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType)))

  /** Partition-wise frame sampling: every `every`-th 64-byte "frame"
    * becomes its own row — the 1-to-N flatMap shape real video sampling
    * has. STUB: production replaces the fixed-width slicing with a
    * demuxer. */
  def frameSampleStub(joinedDf: DataFrame, every: Int = 4): DataFrame = {
    require(every > 0, "sampling stride must be positive")
    payloadPass(joinedDf, frameSchema) { (id, bytes) =>
      // ---- STUB demux: fixed 64-byte frames, keep every nth ----
      bytes.grouped(64).zipWithIndex
        .filter(_._2 % every == 0)
        .map { case (frame, idx) => Row(id, idx, frame) }
    }
  }

  def extractFeaturesStub(joinedDf: DataFrame): DataFrame =
    payloadPass(joinedDf, featureSchema) { (id, bytes) =>
      // ---- STUB decode: replace with codec calls in production ----
      val firstByte = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val nFrames = bytes.length / 64 // fake 64-byte "frames"
      val feats = Array.tabulate(4)(i =>
        if (bytes.length > i) (bytes(i) & 0xff).toFloat / 255f else 0f)
      Iterator.single(Row(id, bytes.length, firstByte, nFrames, feats))
    }
}
