package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §2.8): opaque binary payloads + typed
  * metadata, joined with their embeddings, with native decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The container has no image/audio codecs, so the decode steps are
  * clearly-marked deterministic STUBs — but the Spark-side plumbing that
  * the brief asks for is real and tested: binary column + metadata struct
  * schema, docs⋈embeddings join, and every per-payload stage as a native
  * codegen projection ([[graft.functions.MediaFeatures]] /
  * [[graft.functions.ImageHeader]] / [[graft.functions.FrameSlices]] or
  * plain built-ins) — whole-stage-fused, no partition loops; a cluster
  * with codecs installed swaps the stub byte math inside those
  * expressions for codec calls.
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

  /** NULL payloads (NULL-text docs) coalesce to empty bytes — the same
    * first-class treatment Dedup gives them, applied before the native
    * expressions (which are null-intolerant like every other graft
    * expression). */
  private def payloadOrEmpty: org.apache.spark.sql.Column =
    coalesce(col("media.payload"), lit(Array.emptyByteArray))

  /** The "resize" pass: STUB — production swaps the byte truncation for
    * a codec resize (one row in → one smaller binary out, same contract).
    * Pure built-in projections (`octet_length` + binary `substring`),
    * whole-stage-fused with the join — no partition loop. */
  def resizeStub(joinedDf: DataFrame, maxDim: Int = 8): DataFrame =
    joinedDf.select(col("doc_id"),
      octet_length(payloadOrEmpty).as("src_bytes"),
      lit(maxDim).as("thumb_dim"),
      // ---- STUB resize: a real codec downsamples here ----
      substring(payloadOrEmpty, 1, maxDim * maxDim).as("thumb"))

  /** Frame sampling: every `every`-th 64-byte "frame" becomes its own
    * row — the 1-to-N generator shape real video sampling has, as the
    * native [[graft.functions.FrameSlices]] array projection + `explode`
    * (stays inside whole-stage codegen — no partition loop). STUB:
    * production replaces the fixed-width slicing inside the expression
    * with a demuxer. Zero-byte payloads demux to zero rows. */
  def frameSampleStub(joinedDf: DataFrame, every: Int = 4): DataFrame = {
    require(every > 0, "sampling stride must be positive")
    joinedDf.select(col("doc_id"),
        explode(graft.functions.MediaExpressions
          .frameSlices(payloadOrEmpty, every)).as("_f"))
      .select(col("doc_id"), col("_f.frame_idx"), col("_f.frame"))
  }

  private val pngMagic =
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)

  /** REAL (not stubbed) image-header decode: PNG IHDR and JPEG SOFn
    * dimensions parsed straight from the payload bytes — pure byte
    * arithmetic, deterministic, no codec library involved. Returns
    * (format, width, height), or None for payloads that are not images
    * (the text fixtures, truncated headers, unknown formats). */
  private[graft] def imageDims(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (bytes.length >= 24 && bytes.take(8).sameElements(pngMagic)) {
      // PNG: the IHDR chunk is mandatory and first —
      // magic(8) length(4) "IHDR"(4) width(4) height(4)
      if (bytes.slice(12, 16).sameElements("IHDR".getBytes("US-ASCII")))
        Some(("png", u32(16), u32(20)))
      else None
    } else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk the segment chain to the first SOFn frame header —
      // FF Cn len(2) precision(1) height(2) width(2)
      var i = 2
      while (i + 9 < bytes.length) {
        if (u8(i) != 0xff) return None
        val marker = u8(i + 1)
        if (marker >= 0xd0 && marker <= 0xd9) i += 2 // standalone marker
        else {
          val len = u16(i + 2)
          if (len < 2) return None
          if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
            return Some(("jpeg", u16(i + 7), u16(i + 5)))
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** Image-header extraction — the one multimodal stage with REAL
    * structure parsing ([[imageDims]], via the native
    * [[graft.functions.ImageHeader]] expression): image payloads yield
    * their format and pixel dimensions, non-image payloads keep their row
    * with NULL format/dims (a mixed-modality corpus must not silently
    * drop its text docs). A whole-stage-fused projection since round 10 —
    * no partition loop. */
  def imageHeaders(joinedDf: DataFrame): DataFrame =
    joinedDf.select(col("doc_id"),
      octet_length(payloadOrEmpty).as("byte_len"),
      graft.functions.MediaExpressions.imageHeader(payloadOrEmpty).as("_h"))
      .select(col("doc_id"), col("byte_len"), col("_h.format"),
        col("_h.width"), col("_h.height"))

  /** "Decode + featurize" over the binary payload as one native struct
    * projection ([[graft.functions.MediaFeatures]]) — STUB decode
    * semantics unchanged (deterministic byte math the oracle pins); a
    * real deployment swaps the stub arithmetic inside the expression for
    * codec calls. Replaced the catalog's last `mapPartitions` hot path
    * in round 10: the stage now whole-stage-fuses with the join above
    * it. */
  def extractFeaturesStub(joinedDf: DataFrame): DataFrame =
    joinedDf.select(col("doc_id"),
      graft.functions.MediaExpressions.mediaFeatures(payloadOrEmpty).as("_f"))
      .select(col("doc_id"), col("_f.byte_len"), col("_f.first_byte"),
        col("_f.n_frames"), col("_f.features"))
}
