package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused byte-fallback id codec — the single-pass, codegen'd form of
  * the encode/decode compositions [[graft.ext.TextAnalysis]] first
  * built from higher-order built-ins (split → transform → forall /
  * aggregate). Same semantics to the byte (the SQL compositions are
  * kept verbatim in TextAnalysis doc comments and the spec pins the
  * round trip); what changes is the evaluation shape, which the HOF
  * form got badly wrong at scale (measured r18, sf0.1, noop sink):
  *
  *  - Spark's higher-order functions are NOT whole-stage-codegen'd:
  *    every lambda evaluation is an interpreted Expression walk, and
  *    the encode lambda referenced the segmentation `g` twice
  *    (`forall(g, …)` then `transform(g, …)`), so the BPE merge loop /
  *    Viterbi DP ran TWICE per word, interpreted.
  *  - the decode was `aggregate(ids, struct(txt, hx), concat…)`:
  *    immutable UTF8String concat per id makes one document's decode
  *    O(tokens²) in copied bytes — a 100k-token document costs ~10¹⁰
  *    byte copies. The fused walk is one StringBuilder pass, O(tokens).
  *
  * The vocab/rank tables are driver-known constructor state, shipped
  * once per plan as compiled reference objects (the
  * [[BpeEncodeSupport]] discipline), never per-row columns.
  */
object ByteFallbackSupport {

  import graft.ext.TextAnalysis.{ByteIdBase, EowId}

  /** Piece → id, last entry wins on duplicates (Scala `toMap`
    * semantics, which the HOF form's `typedLit(vocab.toMap)` had).
    */
  def compileVocab(pieces: Array[String],
      ids: Array[Int]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), ids(i)); i += 1 }
    m
  }

  /** Id → piece, last entry wins on duplicates. */
  def compileReverse(pieces: Array[String],
      ids: Array[Int]): java.util.HashMap[Integer, String] = {
    val m = new java.util.HashMap[Integer, String](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(ids(i), pieces(i)); i += 1 }
    m
  }

  /** Shared encode walk: lower → split(" ") → skip empties → per word
    * segment via `segment`, emit piece ids when EVERY piece is in
    * vocab, else the word's UTF-8 bytes (b+1), then [[EowId]].
    * `lower` and the split match the HOF form exactly: the same
    * UTF8String.toLowerCase the Lower expression calls, and a
    * single-space regex split keeping (then skipping) empties.
    */
  private def encodeWith(text: UTF8String,
      vocab: java.util.HashMap[String, Integer],
      segment: UTF8String => ArrayData): ArrayData = {
    val words = text.toLowerCase.toString.split(" ", -1)
    val out = new java.util.ArrayList[Integer]()
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        val pieces = segment(UTF8String.fromString(word))
        val n = pieces.numElements()
        var allInVocab = true
        val pieceIds = new Array[Integer](n)
        var i = 0
        while (i < n && allInVocab) {
          val id = vocab.get(pieces.getUTF8String(i).toString)
          if (id == null) allInVocab = false else pieceIds(i) = id
          i += 1
        }
        if (allInVocab) {
          var k = 0
          while (k < n) { out.add(pieceIds(k)); k += 1 }
        } else {
          val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var b = 0
          while (b < bytes.length) {
            out.add(Integer.valueOf((bytes(b) & 0xff) + ByteIdBase))
            b += 1
          }
        }
        out.add(Integer.valueOf(EowId))
      }
      w += 1
    }
    val arr = new Array[Any](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i).intValue(); i += 1 }
    new GenericArrayData(arr)
  }

  def encodeBpe(text: UTF8String,
      ranks: java.util.HashMap[String, Integer],
      vocab: java.util.HashMap[String, Integer]): ArrayData =
    encodeWith(text, vocab, w => BpeEncodeSupport.encode(w, ranks))

  def encodeUnigram(text: UTF8String, table: UnigramEncodeSupport.Table,
      vocab: java.util.HashMap[String, Integer]): ArrayData =
    encodeWith(text, vocab, w => UnigramEncodeSupport.encode(w, table))

  /** Single-pass decode: byte ids buffer raw bytes, a subword id or
    * [[EowId]] flushes them through one UTF-8 decode, then appends the
    * piece or a space; trailing spaces trimmed. Fails loud mid-walk on
    * id ≤ 0 (reserved/foreign), on unmapped high ids, AND on byte-id
    * runs that are not valid UTF-8 (CharsetDecoder REPORT →
    * MALFORMED_CHARACTER_CODING, the exact surface Spark 4's `decode`
    * expression raised in the HOF form this replaced — ADVICE r18
    * flagged the silent-U+FFFD regression of `new String(bytes)`).
    * Valid encode output never trips it: byte-fallback words emit
    * their complete UTF-8 byte run before any flush boundary.
    */
  def decode(ids: ArrayData,
      rvocab: java.util.HashMap[Integer, String]): UTF8String = {
    val n = ids.numElements()
    val txt = new java.lang.StringBuilder()
    val pending = new java.io.ByteArrayOutputStream()
    // one decoder per row, reused across flushes (decode() resets it)
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    def flush(): Unit = if (pending.size() > 0) {
      try txt.append(dec.decode(java.nio.ByteBuffer.wrap(pending.toByteArray)))
      catch { case _: java.nio.charset.CharacterCodingException =>
        throw GraftColumnBridge.malformedCharacterCoding("decode", "UTF-8")
      }
      pending.reset()
    }
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      if (id == EowId) { flush(); txt.append(' ') }
      else if (id <= 0)
        throw raiseLike(s"decodeIdsByteFallback: reserved/invalid id " +
          s"$id in stream")
      else if (id <= 256) pending.write(id - ByteIdBase)
      else {
        val piece = rvocab.get(Integer.valueOf(id))
        if (piece == null)
          throw raiseLike(s"decodeIdsByteFallback: unmapped id $id in stream")
        flush(); txt.append(piece)
      }
      i += 1
    }
    flush()
    var end = txt.length()
    while (end > 0 && txt.charAt(end - 1) == ' ') end -= 1
    UTF8String.fromString(txt.substring(0, end))
  }

  /** The raise_error exception shape (USER_RAISED_EXCEPTION), so a
    * caller catching the HOF form's failure catches this one.
    */
  private def raiseLike(msg: String): Throwable =
    GraftColumnBridge.userRaisedException(msg)
}

/** `encode_ids_byte_fallback(text)` under fixed BPE merge rules + id
  * vocab (both driver-known, shipped as compiled reference objects).
  */
case class BpeIdsByteFallbackExpr(child: Expression,
    rules: Seq[(String, String)], vocab: Seq[(String, Int)])
    extends UnaryExpression {

  private lazy val ranks =
    BpeEncodeSupport.compile(rules.map(r => Array(r._1, r._2)).toArray)
  private lazy val vmap = ByteFallbackSupport.compileVocab(
    vocab.map(_._1).toArray, vocab.map(_._2).toArray)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"encode_ids_byte_fallback needs a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    ByteFallbackSupport.encodeBpe(input.asInstanceOf[UTF8String], ranks, vmap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bfRanks", ranks,
      classOf[java.util.HashMap[String, Integer]].getName)
    val vocabRef = ctx.addReferenceObj("bfVocab", vmap,
      classOf[java.util.HashMap[String, Integer]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ByteFallbackSupport.encodeBpe($c, $ranksRef, $vocabRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeIdsByteFallbackExpr = copy(child = newChild)
}

/** The unigram twin: Viterbi segmentation under a trained piece table
  * in place of the BPE merge walk; same id space, same fallback.
  */
case class UnigramIdsByteFallbackExpr(child: Expression,
    pieces: Seq[(String, Double)], vocab: Seq[(String, Int)])
    extends UnaryExpression {

  private lazy val table = UnigramEncodeSupport.compile(
    pieces.map(_._1).toArray, pieces.map(_._2).toArray)
  private lazy val vmap = ByteFallbackSupport.compileVocab(
    vocab.map(_._1).toArray, vocab.map(_._2).toArray)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"encode_ids_byte_fallback needs a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    ByteFallbackSupport.encodeUnigram(input.asInstanceOf[UTF8String], table, vmap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bfPieces", table,
      classOf[UnigramEncodeSupport.Table].getName)
    val vocabRef = ctx.addReferenceObj("bfVocab", vmap,
      classOf[java.util.HashMap[String, Integer]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ByteFallbackSupport.encodeUnigram($c, $tableRef, $vocabRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramIdsByteFallbackExpr = copy(child = newChild)
}

/** `decode_ids_byte_fallback(ids)` under a fixed reverse vocab. */
case class DecodeIdsByteFallbackExpr(child: Expression,
    vocab: Seq[(String, Int)]) extends UnaryExpression {

  private lazy val rmap = ByteFallbackSupport.compileReverse(
    vocab.map(_._1).toArray, vocab.map(_._2).toArray)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"decode_ids_byte_fallback needs array<int>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    ByteFallbackSupport.decode(input.asInstanceOf[ArrayData], rmap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rmapRef = ctx.addReferenceObj("bfReverse", rmap,
      classOf[java.util.HashMap[Integer, String]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ByteFallbackSupport.decode($c, $rmapRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): DecodeIdsByteFallbackExpr = copy(child = newChild)
}

object ByteFallbackFunctions {

  def encode_ids_byte_fallback(text: Column,
      rules: Seq[(String, String)], vocab: Seq[(String, Int)]): Column =
    GraftColumnBridge.column(BpeIdsByteFallbackExpr(
      GraftColumnBridge.expression(text), rules, vocab))

  def unigram_ids_byte_fallback(text: Column,
      pieces: Seq[(String, Double)], vocab: Seq[(String, Int)]): Column =
    GraftColumnBridge.column(UnigramIdsByteFallbackExpr(
      GraftColumnBridge.expression(text), pieces, vocab))

  def decode_ids_byte_fallback(ids: Column,
      vocab: Seq[(String, Int)]): Column =
    GraftColumnBridge.column(DecodeIdsByteFallbackExpr(
      GraftColumnBridge.expression(ids), vocab))
}
