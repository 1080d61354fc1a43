package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernels for the text-sketch hot path.
  *
  * The dedup/sketch operators all start from the same per-document work:
  * tokenize, poly-31-hash each token ([[PortableHash.poly]]), roll 3-gram
  * shingle hashes, and reduce them into a sketch (distinct set, 128 MinHash
  * mins, or a 64-bit SimHash). Expressed with higher-order functions that
  * pipeline is `CodegenFallback`: `split` materializes a 1-char-string array
  * per token and `aggregate`/`transform` pay an interpreted lambda per
  * element — and the MinHash/SimHash reductions additionally needed an
  * `explode` + `groupBy(doc_id)` SHUFFLE of every (doc, hash) row just to
  * fold per-doc values that never depend on any other row.
  *
  * These expressions compute each sketch in one tight primitive loop per
  * document (the [[VecMath]] pattern — `doGenCode` emits a single static
  * call), which both removes the lambda overhead and, more importantly at
  * 100 TB, turns the MinHash-signature and SimHash stages into PURE MAPS
  * that ride the ingest scan: no token/shingle rows are ever shuffled; only
  * per-doc sketches (128 longs / 1 long) reach the banding join.
  *
  * Values are bit-identical to the higher-order forms they replace (same
  * recurrences over the same Unicode code points — an ASCII fast path scans
  * the UTF-8 bytes directly, which coincides for ASCII), so every DuckDB
  * oracle that was green against the old pipeline stays green, and
  * cross-engine parity holds on arbitrary Unicode text (both engines fold
  * whole code points — see [[PortableHash.poly]]).
  */
object TextHash {

  import PortableHash.{M, aConst, bConst}

  /** Per-token poly-31 hashes of the space-separated tokens of `text`
    * (empty tokens from repeated separators are skipped — identical to
    * `filter(split(text, " "), t => t =!= "")` + [[PortableHash.poly]]).
    */
  private def tokenHashes(text: UTF8String): Array[Long] = {
    val bytes = text.getBytes
    var ascii = true
    var i = 0
    while (i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) tokenHashesAscii(bytes) else tokenHashesUtf16(text.toString)
  }

  private def tokenHashesAscii(b: Array[Byte]): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](16)
    var h = 0L
    var len = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c == ' ') {
        if (len > 0) { out += h; h = 0L; len = 0 }
      } else {
        h = (h * 31 + c) % M
        len += 1
      }
      i += 1
    }
    if (len > 0) out += h
    out.toArray
  }

  /** Non-ASCII fallback: fold one value PER CODE POINT, exactly like the
    * replaced plan — Java's empty-pattern `split(c, "")` keeps surrogate
    * pairs together as ONE element (the regex engine is code-point aware)
    * and Spark's `ascii()` on that element evaluates
    * `codePointAt(0)` — the FULL code point (e.g. 128512 for U+1F600), not
    * the high surrogate. So a supplementary character contributes a single
    * `(h*31 + codePoint) % M` step with a 2-unit advance, which also
    * matches DuckDB's `ascii()` over `string_split(text, '')` (whole code
    * points): non-BMP text hashes identically across BOTH the replaced
    * Spark plan and the oracle engine.
    */
  private def tokenHashesUtf16(s: String): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](16)
    var h = 0L
    var len = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ') {
        if (len > 0) { out += h; h = 0L; len = 0 }
        i += 1
      } else {
        val cp = s.codePointAt(i)
        h = (h * 31 + cp.toLong) % M
        len += 1
        i += Character.charCount(cp)
      }
    }
    if (len > 0) out += h
    out.toArray
  }

  /** Distinct word-3-gram shingle hashes of `text` in first-seen order
    * ([[PortableHash.shingle3]] over the token hashes). Empty array when
    * the doc has fewer than 3 tokens — callers filter `size > 0`, matching
    * the old `size(th) >= 3` doc filter.
    */
  def shingles(text: UTF8String): ArrayData = {
    val th = tokenHashes(text)
    if (th.length < 3) return ArrayData.toArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](th.length * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Long](th.length)
    var i = 0
    while (i + 2 < th.length) {
      val sh = ((th(i) * 131 + th(i + 1)) % M * 131 + th(i + 2)) % M
      if (seen.add(sh)) out += sh
      i += 1
    }
    ArrayData.toArrayData(out.toArray)
  }

  /** MinHash signature: element p is `min over shh of mix_p(shh)` — the
    * per-doc fold the old plan computed as `perms` aggregate columns over
    * exploded shingle rows (one shuffle per corpus it no longer pays).
    * Input must be non-empty (callers filter `size > 0` first).
    */
  def minhash(shh: ArrayData, perms: Int): ArrayData = {
    val hs = shh.toLongArray()
    val out = new Array[Long](perms)
    var p = 0
    while (p < perms) {
      val a = aConst(p)
      val b = bConst(p)
      var m = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val v = (hs(i) * a + b) % M
        if (v < m) m = v
        i += 1
      }
      out(p) = m
      p += 1
    }
    ArrayData.toArrayData(out)
  }

  /** 64-bit SimHash of `text`: bit b of each token-OCCURRENCE's vote vector
    * is bit 15 of `mix_b(poly(token))`; signature bit b is set when the
    * vote sum is positive. Null when the doc has no tokens (such docs never
    * appeared in the old explode + groupBy plan either).
    */
  def simhash(text: UTF8String): java.lang.Long = {
    val th = tokenHashes(text)
    if (th.isEmpty) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var b = 0
      while (b < 64) {
        val m = (h * aConst(b) + bConst(b)) % M
        if (((m >> 15) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }
}

/** `text_shingles(text)` — distinct 3-gram shingle hashes as `array<bigint>`. */
case class TextShinglesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(s: Any): Any =
    TextHash.shingles(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.shingles($c)")

  override def prettyName: String = "text_shingles"
  override protected def withNewChildInternal(newChild: Expression): TextShinglesExpr =
    copy(child = newChild)
}

/** `minhash_sigs(shh, perms)` — MinHash signature of an `array<bigint>`
  * shingle set as `array<bigint>` of length `perms` (a plan constant).
  */
case class MinhashSigsExpr(child: Expression, perms: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    TextHash.minhash(a.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhash($c, $perms)")

  override def prettyName: String = "minhash_sigs"
  override protected def withNewChildInternal(newChild: Expression): MinhashSigsExpr =
    copy(child = newChild)
}

/** `simhash64(text)` — 64-bit SimHash signature; null for token-less docs. */
case class Simhash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(s: Any): Any =
    TextHash.simhash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("simhash")
      s"""
      java.lang.Long $r = graft.functions.TextHash.simhash($c);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.longValue(); }
      """
    })

  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(newChild: Expression): Simhash64Expr =
    copy(child = newChild)
}

/** Column bindings for the native text-sketch expressions. */
object TextHashExprs {
  private def toExpr(c: Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
  private def toCol(e: Expression) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  def text_shingles(c: Column): Column = toCol(TextShinglesExpr(toExpr(c)))

  def minhash_sigs(c: Column, perms: Int): Column =
    toCol(MinhashSigsExpr(toExpr(c), perms))

  def simhash64(c: Column): Column = toCol(Simhash64Expr(toExpr(c)))
}
