package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-payload media expressions — the multimodal feature /
  * header stages as codegen projections over BinaryType, replacing the
  * catalog's last imperative `mapPartitions` hot paths (round-9
  * playbook: one generated method call, compiled-Scala byte loops,
  * whole-stage fusion preserved). The decode STUB semantics are
  * unchanged and still deterministic byte math, so the DuckDB oracles
  * replay them bit-for-bit; a real codec deployment swaps the stub
  * arithmetic inside [[MediaFeatures.extract]] for codec calls — the
  * expression shape (binary in, typed struct out) is what that code
  * would use.
  */

/** The feature-extraction stub as one struct projection:
  * (byte_len, first_byte, n_frames, features[4]) — byte identities the
  * oracle pins. NULL payload yields NULL (callers coalesce NULL-text
  * docs to empty bytes first, the same first-class treatment the
  * mapPartitions form gave them). */
case class MediaFeatures(child: Expression) extends UnaryExpression {

  override def prettyName: String = "media_features"
  override def dataType: DataType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("first_byte", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false)))
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.sql}")
  }

  /** public: called from generated code. */
  def extract(bytes: Array[Byte]): InternalRow = {
    // ---- STUB decode: replace with codec calls in production ----
    val firstByte = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val nFrames = bytes.length / 64 // fake 64-byte "frames"
    val feats = new Array[Float](4)
    var i = 0
    while (i < 4) {
      feats(i) = if (bytes.length > i) (bytes(i) & 0xff).toFloat / 255f else 0f
      i += 1
    }
    InternalRow(bytes.length, firstByte, nFrames, new GenericArrayData(feats))
  }

  override def nullSafeEval(a: Any): Any =
    extract(a.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mediaFeatures", this,
      classOf[MediaFeatures].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.extract($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MediaFeatures = copy(child = newChild)
}

/** PNG-IHDR / JPEG-SOFn header decode as one struct projection:
  * (format, width, height), all-NULL fields for non-image payloads —
  * REAL byte parsing ([[graft.llm.Multimodal.imageDims]]'s logic,
  * shared), not a stub. NULL payload yields a NULL struct (callers
  * coalesce first). */
case class ImageHeader(child: Expression) extends UnaryExpression {

  override def prettyName: String = "image_header"
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.sql}")
  }

  /** public: called from generated code. */
  def header(bytes: Array[Byte]): InternalRow =
    graft.llm.Multimodal.imageDims(bytes) match {
      case Some((f, w, h)) => InternalRow(UTF8String.fromString(f), w, h)
      case None => InternalRow(null, null, null)
    }

  override def nullSafeEval(a: Any): Any =
    header(a.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("imageHeader", this,
      classOf[ImageHeader].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.header($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ImageHeader = copy(child = newChild)
}

/** The frame-sampling stub's demux as one array projection: the payload's
  * fixed 64-byte "frames", keeping every `every`-th, each as
  * (frame_idx, frame) — `explode` above it restores the 1-to-N generator
  * shape (GenerateExec stays inside whole-stage codegen), replacing the
  * catalog's last `mapPartitions` path. STUB: production swaps the
  * fixed-width slicing inside [[FrameSlices.slices]] for a demuxer; the
  * expression shape (binary in, array of typed frames out) is what that
  * code would use. Empty payload yields an empty array (zero rows after
  * explode — the flatMap contract); NULL payload yields NULL (callers
  * coalesce NULL-text docs to empty bytes first). */
case class FrameSlices(child: Expression, every: Int)
    extends UnaryExpression {
  require(every > 0, s"sampling stride must be positive, got $every")

  override def prettyName: String = "frame_slices"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.sql}")
  }

  /** public: called from generated code. */
  def slices(bytes: Array[Byte]): GenericArrayData = {
    // ---- STUB demux: fixed 64-byte frames, keep every nth ----
    val nFrames = (bytes.length + 63) / 64
    val out = new Array[Any]((nFrames + every - 1) / every)
    var i = 0
    var j = 0
    while (i < nFrames) {
      if (i % every == 0) {
        val start = i * 64
        out(j) = InternalRow(i, java.util.Arrays.copyOfRange(
          bytes, start, math.min(start + 64, bytes.length)))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    slices(a.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("frameSlices", this,
      classOf[FrameSlices].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.slices($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : FrameSlices = copy(child = newChild)
}

object MediaExpressions {
  def mediaFeatures(payload: Column): Column =
    ColumnBridge.column(MediaFeatures(ColumnBridge.expression(payload)))

  def imageHeader(payload: Column): Column =
    ColumnBridge.column(ImageHeader(ColumnBridge.expression(payload)))

  def frameSlices(payload: Column, every: Int): Column =
    ColumnBridge.column(
      FrameSlices(ColumnBridge.expression(payload), every))
}
