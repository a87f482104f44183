package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed model-table lookups for the n-gram LM scorers.
  *
  * Why these exist: `element_at(<map literal>, key)` is a LINEAR scan
  * of the literal's ArrayBasedMapData — O(V) string comparisons per
  * lookup. The LM scorers (CCNet perplexity, DSIR importance weights)
  * do one bigram-table lookup per token position, so a V=64 model with
  * a few thousand observed bigrams costs `positions × table` string
  * equality checks per document — the dominant cost of d34/d36/d50/st08
  * (measured; see NOTES.md). These expressions hold the same tables as
  * transient java HashMaps keyed by UTF8String (O(1) per lookup) and
  * run the whole per-document fold in ONE eval — no `sequence` /
  * `transform` / `aggregate` HOF chain (those are CodegenFallback,
  * interpreted per element).
  *
  * Bit-exactness contract: every sum below accumulates in the SAME
  * left-to-right position order as the HOF chain it replaces, over the
  * SAME precomputed doubles — results are bit-identical and all pinned
  * oracles hold.
  */
object LookupFunctions {

  /** `transform(toks, w -> w ∈ vocab ? w : unk)` in one pass. */
  def unkMapTokens(toks: Column, vocab: Iterable[String], unkToken: String): Column =
    ExpressionUtils.column(UnkMapTokens(ExpressionUtils.expression(toks),
      vocab.toArray.sorted.toSeq, unkToken))

  /** Σ over tokens of `table(w')` (w' = unk-mapped against the table's
    * key set), missing key → `unkLog`. Empty array → 0.0; null → null. */
  def unigramLogSum(toks: Column, table: Map[String, Double],
                    unkToken: String, unkLog: Double): Column = {
    val ks = table.keys.toArray.sorted.toSeq
    ExpressionUtils.column(UnigramLogSum(ExpressionUtils.expression(toks),
      ks, ks.map(table), unkToken, unkLog))
  }

  /** Σ over adjacent token pairs of
    * `biTable("w1' w2'") orElse perWordDef(w1') orElse constDef`
    * with tokens unk-mapped against `vocab`. Fewer than two tokens →
    * 0.0 (callers needing SQL `when(size>=2,...)` null semantics keep
    * their outer guard); null array → null. */
  def bigramLogSum(toks: Column, vocab: Iterable[String],
                   biTable: Map[String, Double], perWordDef: Map[String, Double],
                   constDef: Double, unkToken: String): Column = {
    val bk = biTable.keys.toArray.sorted.toSeq
    val dk = perWordDef.keys.toArray.sorted.toSeq
    ExpressionUtils.column(BigramLogSum(ExpressionUtils.expression(toks),
      vocab.toArray.sorted.toSeq, bk, bk.map(biTable), dk, dk.map(perWordDef),
      constDef, unkToken))
  }

  /** Σ over token TRIPLES of
    * `triTable("w1' w2' w3'") orElse biTable("w2' w3'") orElse
    * uniTable(w3')` with tokens unk-mapped against `vocab` — the
    * stupid-backoff fold (Brants et al. 2007). `uniTable` must cover
    * every vocab word plus the unk token, so the final level always
    * hits. Fewer than three tokens → 0.0 (callers keep their outer
    * `when(size>=3,...)` null guard); null array → null. */
  def trigramBackoffLogSum(toks: Column, vocab: Iterable[String],
                           triTable: Map[String, Double],
                           biTable: Map[String, Double],
                           uniTable: Map[String, Double],
                           unkToken: String): Column = {
    val tk = triTable.keys.toArray.sorted.toSeq
    val bk = biTable.keys.toArray.sorted.toSeq
    val uk = uniTable.keys.toArray.sorted.toSeq
    ExpressionUtils.column(TrigramBackoffLogSum(ExpressionUtils.expression(toks),
      vocab.toArray.sorted.toSeq, tk, tk.map(triTable), bk, bk.map(biTable),
      uk, uk.map(uniTable), unkToken))
  }

  private[functions] def buildSet(keys: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](keys.length * 2)
    keys.foreach(k => s.add(UTF8String.fromString(k)))
    s
  }

  private[functions] def buildMap(keys: Seq[String], values: Seq[Double])
      : java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](keys.length * 2)
    keys.iterator.zip(values.iterator).foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), v)
    }
    m
  }
}

/** One-pass unk-mapping of a string array against a vocab set. A null
  * ELEMENT maps to unk (matching `element_at(map, null) -> null ->
  * otherwise(unk)` in the `when`-chain this replaces). */
case class UnkMapTokens(child: Expression, vocabKeys: Seq[String], unkToken: String)
    extends UnaryExpression with RefEvalCodegen {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def javaResultType: String =
    "org.apache.spark.sql.catalyst.util.ArrayData"
  @transient private lazy val vocab = LookupFunctions.buildSet(vocabKeys)
  @transient private lazy val unk = UTF8String.fromString(unkToken)
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val w = if (a.isNullAt(i)) null else a.getUTF8String(i)
      // clone: getUTF8String can return a VIEW into a reused row
      // buffer; the output array outlives this row
      out(i) = if (w != null && vocab.contains(w)) w.clone() else unk
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): UnkMapTokens = copy(child = c)
  override def prettyName: String = "unk_map_tokens"
}

/** See [[LookupFunctions.unigramLogSum]]. */
case class UnigramLogSum(child: Expression, keys: Seq[String],
                         values: Seq[Double], unkToken: String, unkLog: Double)
    extends UnaryExpression with RefEvalCodegen {
  override def dataType: DataType = DoubleType
  override protected def javaResultType: String = "Double"
  @transient private lazy val table = LookupFunctions.buildMap(keys, values)
  @transient private lazy val unk = UTF8String.fromString(unkToken)
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0d
    var i = 0
    while (i < n) {
      val w0 = if (a.isNullAt(i)) null else a.getUTF8String(i)
      val w = if (w0 != null && table.containsKey(w0)) w0 else unk
      val hit = table.get(w)
      s += (if (hit != null) hit.doubleValue() else unkLog)
      i += 1
    }
    s
  }
  override protected def withNewChildInternal(c: Expression): UnigramLogSum = copy(child = c)
  override def prettyName: String = "unigram_log_sum"
}

/** See [[LookupFunctions.bigramLogSum]]. */
case class BigramLogSum(child: Expression, vocabKeys: Seq[String],
                        biKeys: Seq[String], biValues: Seq[Double],
                        defKeys: Seq[String], defValues: Seq[Double],
                        constDef: Double, unkToken: String)
    extends UnaryExpression with RefEvalCodegen {
  override def dataType: DataType = DoubleType
  override protected def javaResultType: String = "Double"
  @transient private lazy val vocab = LookupFunctions.buildSet(vocabKeys)
  @transient private lazy val biTable = LookupFunctions.buildMap(biKeys, biValues)
  @transient private lazy val defTable = LookupFunctions.buildMap(defKeys, defValues)
  @transient private lazy val unk = UTF8String.fromString(unkToken)
  @transient private lazy val space = UTF8String.fromString(" ")
  private def mapped(a: ArrayData, i: Int): UTF8String = {
    val w = if (a.isNullAt(i)) null else a.getUTF8String(i)
    if (w != null && vocab.contains(w)) w else unk
  }
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n < 2) return 0.0d
    var s = 0.0d
    var w1 = mapped(a, 0)
    var i = 1
    while (i < n) {
      val w2 = mapped(a, i)
      val bi = biTable.get(UTF8String.concat(w1, space, w2))
      val term =
        if (bi != null) bi.doubleValue()
        else {
          val d = defTable.get(w1)
          if (d != null) d.doubleValue() else constDef
        }
      s += term
      w1 = w2
      i += 1
    }
    s
  }
  override protected def withNewChildInternal(c: Expression): BigramLogSum = copy(child = c)
  override def prettyName: String = "bigram_log_sum"
}

/** See [[LookupFunctions.trigramBackoffLogSum]]. The three levels are
  * probed longest-context-first per position; accumulation is the same
  * strict left-to-right position fold as the sibling scorers, so the
  * result is bit-identical to the SQL `list_reduce` replay. */
case class TrigramBackoffLogSum(child: Expression, vocabKeys: Seq[String],
                                triKeys: Seq[String], triValues: Seq[Double],
                                biKeys: Seq[String], biValues: Seq[Double],
                                uniKeys: Seq[String], uniValues: Seq[Double],
                                unkToken: String)
    extends UnaryExpression with RefEvalCodegen {
  override def dataType: DataType = DoubleType
  override protected def javaResultType: String = "Double"
  @transient private lazy val vocab = LookupFunctions.buildSet(vocabKeys)
  @transient private lazy val triTable = LookupFunctions.buildMap(triKeys, triValues)
  @transient private lazy val biTable = LookupFunctions.buildMap(biKeys, biValues)
  @transient private lazy val uniTable = LookupFunctions.buildMap(uniKeys, uniValues)
  @transient private lazy val unk = UTF8String.fromString(unkToken)
  @transient private lazy val space = UTF8String.fromString(" ")
  private def mapped(a: ArrayData, i: Int): UTF8String = {
    val w = if (a.isNullAt(i)) null else a.getUTF8String(i)
    if (w != null && vocab.contains(w)) w else unk
  }
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n < 3) return 0.0d
    var s = 0.0d
    var w1 = mapped(a, 0)
    var w2 = mapped(a, 1)
    var i = 2
    while (i < n) {
      val w3 = mapped(a, i)
      val tri = triTable.get(UTF8String.concat(w1, space, w2, space, w3))
      val term =
        if (tri != null) tri.doubleValue()
        else {
          val bi = biTable.get(UTF8String.concat(w2, space, w3))
          if (bi != null) bi.doubleValue()
          else uniTable.get(w3).doubleValue() // total: covers vocab + unk
        }
      s += term
      w1 = w2
      w2 = w3
      i += 1
    }
    s
  }
  override protected def withNewChildInternal(c: Expression): TrigramBackoffLogSum = copy(child = c)
  override def prettyName: String = "trigram_backoff_log_sum"
}
