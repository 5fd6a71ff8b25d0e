package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter membership over md5-hex gram keys, the broadcast-bitset
  * half of [[graft.llm.Curation.decontaminateBloom]]: the benchmark
  * fingerprint ships as an O(mBits) REFERENCE OBJECT (8 KiB at the 64k
  * default — the same bounded index-metadata envelope as IVF centroids
  * and PQ codebooks), so the 100 TB train side never joins, shuffles, or
  * broadcasts per-gram rows — each gram tests `hashes` bits in place
  * inside whole-stage codegen.
  *
  * The `hashes` positions are independent 8-hex-char slices of the md5
  * key (the [[TextExpressions]] minhash family's slice-derivation
  * convention), each mod mBits — which is exactly reproducible in the
  * DuckDB oracle (`CAST('0x' || substring(key, 1+8j, 8) AS BIGINT) %
  * mBits`), so false positives are DETERMINISTIC and hash-gated, not
  * statistical hand-waving. */
case class BloomHit(child: Expression, bits: Array[Long],
    mBits: Int, hashes: Int) extends UnaryExpression {

  require(mBits > 0 && mBits % 64 == 0,
    s"mBits must be a positive multiple of 64, got $mBits")
  require(hashes >= 1 && hashes <= 4,
    s"hashes must be in [1,4] (md5 has 32 hex chars = 4 slices), " +
      s"got $hashes")
  require(bits.length == mBits / 64,
    s"bits carries ${bits.length} words for mBits=$mBits " +
      s"(expected ${mBits / 64})")

  override def prettyName: String = "bloom_hit"
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an md5-hex string, got ${t.sql}")
  }

  /** public: called from generated code. */
  def hit(key: UTF8String): Boolean = {
    val s = key.toString
    var j = 0
    while (j < hashes) {
      var v = 0L
      var i = j * 8
      val end = i + 8
      while (i < end) {
        v = (v << 4) | Character.digit(s.charAt(i), 16).toLong
        i += 1
      }
      val pos = (v % mBits).toInt
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      j += 1
    }
    true
  }

  override def nullSafeEval(a: Any): Any = hit(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomHit", this,
      classOf[BloomHit].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.hit($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomHit = copy(child = newChild)
}

object BloomExpressions {
  def bloomHit(key: Column, bits: Array[Long], mBits: Int,
      hashes: Int): Column =
    ColumnBridge.column(
      BloomHit(ColumnBridge.expression(key), bits, mBits, hashes))
}
