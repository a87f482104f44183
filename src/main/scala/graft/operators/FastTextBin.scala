package graft.operators

import java.io.{BufferedInputStream, DataOutputStream, FileInputStream, FileOutputStream}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructType}

/** fastText `.bin` supervised-model loader — the reference's
  * lid.176.bin seam (reference: src/llm_data_pipeline/quality/
  * model.py:267-340 loads `fasttext.load_model(path)` and predicts
  * `(label, prob)` per text). This reads the PUBLIC fastText file
  * format (magic 793712314, version 12: args, dictionary, dense input
  * matrix of nwords+bucket rows, dense output matrix) and reproduces
  * the supervised prediction path: tokens -> word ids + char-ngram
  * bucket ids (+ word-ngram line hashes) -> mean of input rows ->
  * output matrix -> softmax -> argmax label.
  *
  * Faithful to the public reference implementation:
  *  - FNV-1a 32-bit token hash with fastText's SIGN-EXTENDED byte XOR
  *    (`h ^= int8_t(c)`), the detail that changes every hash of
  *    non-ASCII text;
  *  - char n-grams over `<word>` (BOW/EOW added), UTF-8
  *    continuation-byte aware, skipping the 1-gram that is just BOW or
  *    ends at EOW (the `n == 1 && (i == 0 || j == size)` rule);
  *  - OOV tokens contribute ONLY their char-ngram bucket ids; in-dict
  *    tokens contribute their word id + char-ngrams (when maxn > 0);
  *  - word-ngram hashes: `h = h * 116049371 + h_next` over the raw
  *    token FNV hashes, bucketed;
  *  - predict appends the EOS token (`</s>`) like the real
  *    `predict(text)` does (it feeds the line reader a newline).
  *
  * Quantized models (`quant_` flag set, .ftz) are product-quantized —
  * out of scope here; the loader fails fast on them with a clear
  * message. */
object FastTextBin {

  val Magic = 793712314
  val Version = 12
  val Eos = "</s>"
  val Bow = "<"; val Eow = ">"

  /** Loaded model: `words` maps token -> dict id (0..nwords-1);
    * `labels(i)` is output row i's label; `input` is the
    * (nwords + bucket) x dim embedding table, row-major; `output` is
    * nlabels x dim. */
  case class FtModel(dim: Int, bucket: Int, minn: Int, maxn: Int,
                     wordNgrams: Int, nwords: Int,
                     words: Map[String, Int], labels: Array[String],
                     input: Array[Float], output: Array[Float])
      extends Serializable {

    /** fastText's FNV-1a with sign-extended bytes. */
    def hash(s: String): Int = {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var h = 0x811c9dc5 // 2166136261
      var i = 0
      while (i < bytes.length) {
        h = h ^ bytes(i) // sign-extended: int8_t semantics
        h = h * 16777619
        i += 1
      }
      h
    }

    private def unsigned(h: Int): Long = h.toLong & 0xffffffffL

    /** Char n-gram bucket ids of one token (BOW/EOW wrapped), the
      * `computeSubwords` rule. Returns ABSOLUTE input-matrix row ids
      * (nwords + bucket index). */
    def subwordIds(token: String): Seq[Int] = {
      if (maxn <= 0) return Seq.empty
      val w = (Bow + token + Eow).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      while (i < w.length) {
        if ((w(i) & 0xc0) != 0x80) { // start only at UTF-8 lead bytes
          var j = i
          var n = 1
          while (j < w.length && n <= maxn) {
            var k = j + 1
            while (k < w.length && (w(k) & 0xc0) == 0x80) k += 1 // absorb continuations
            j = k
            if (n >= minn && !(n == 1 && (i == 0 || j == w.length))) {
              val ng = new String(w, i, j - i, java.nio.charset.StandardCharsets.UTF_8)
              out += nwords + (unsigned(hash(ng)) % bucket).toInt
            }
            n += 1
          }
        }
        i += 1
      }
      out.toSeq
    }

    /** The supervised `getLine` + `addWordNgrams` input-id bag for one
      * normalized text. */
    def lineIds(text: String): Array[Int] = {
      val tokens = text.split("\\s+").filter(_.nonEmpty) :+ Eos
      val ids = scala.collection.mutable.ArrayBuffer[Int]()
      val tokenHashes = scala.collection.mutable.ArrayBuffer[Int]()
      tokens.foreach { t =>
        words.get(t) match {
          case Some(wid) =>
            ids += wid
            if (maxn > 0 && t != Eos) ids ++= subwordIds(t) // EOS gets no subwords
          case None =>
            if (t != Eos) ids ++= subwordIds(t)
        }
        tokenHashes += hash(t) // EOS hash IS in the word-ngram stream (getLine)
      }
      if (wordNgrams > 1) {
        // fastText stores token hashes as int32 and converts each to
        // uint64 with SIGN extension (`uint64_t h = hashes[i]` over a
        // vector<int32_t>) — plain .toLong reproduces that; masking to
        // the low 32 bits would diverge for every hash with the top
        // bit set (~half of tokens).
        var i = 0
        while (i < tokenHashes.length) {
          var h = tokenHashes(i).toLong
          var j = i + 1
          while (j < tokenHashes.length && j < i + wordNgrams) {
            h = h * 116049371L + tokenHashes(j).toLong
            ids += nwords + (java.lang.Long.remainderUnsigned(h, bucket.toLong)).toInt
            j += 1
          }
          i += 1
        }
      }
      ids.toArray
    }

    /** `(label, prob)` top-1 prediction; `("__label__unknown", 0.0)`
      * for empty/whitespace-only text — the reference wrapper
      * normalizes and falls back BEFORE predicting (quality/model.py
      * LanguageFilter.predict: `if not text: return unknown`), so an
      * empty line never scores through the bare EOS token. */
    def predict(text: String): (String, Double) = {
      if (text.trim.isEmpty) return ("__label__unknown", 0.0)
      val ids = lineIds(text)
      if (ids.isEmpty || labels.isEmpty) return ("__label__unknown", 0.0)
      val hidden = new Array[Double](dim)
      ids.foreach { id =>
        val off = id * dim
        var d = 0
        while (d < dim) { hidden(d) += input(off + d); d += 1 }
      }
      var d = 0
      while (d < dim) { hidden(d) /= ids.length; d += 1 }
      val scores = new Array[Double](labels.length)
      var li = 0
      while (li < labels.length) {
        val off = li * dim
        var s = 0.0
        var k = 0
        while (k < dim) { s += output(off + k) * hidden(k); k += 1 }
        scores(li) = s
        li += 1
      }
      val mx = scores.max
      var z = 0.0
      li = 0
      while (li < labels.length) { z += math.exp(scores(li) - mx); li += 1 }
      var best = 0
      li = 1
      while (li < labels.length) { // first max wins (fastText heap order)
        if (scores(li) > scores(best)) best = li
        li += 1
      }
      (labels(best), math.exp(scores(best) - mx) / z)
    }
  }

  // ============================ reading ============================

  private final class In(path: String) {
    private val s = new BufferedInputStream(new FileInputStream(path), 1 << 20)
    def i32(): Int = { // little-endian
      val a = s.read(); val b = s.read(); val c = s.read(); val d = s.read()
      if (d < 0) throw new IllegalArgumentException(s"truncated .bin: $path")
      a | (b << 8) | (c << 16) | (d << 24)
    }
    def i64(): Long = (i32().toLong & 0xffffffffL) | (i32().toLong << 32)
    def f64(): Double = java.lang.Double.longBitsToDouble(i64())
    def i8(): Int = {
      val v = s.read()
      if (v < 0) throw new IllegalArgumentException(s"truncated .bin: $path")
      v
    }
    def cstring(): String = {
      val out = new java.io.ByteArrayOutputStream()
      var b = s.read()
      while (b > 0) { out.write(b); b = s.read() }
      if (b < 0) throw new IllegalArgumentException(s"truncated .bin: $path")
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    }
    def floats(n: Long): Array[Float] = {
      // bound is floats-per-BYTE-buffer: n*4 must fit an Int, so the
      // require must fire before `n.toInt * 4` can overflow
      require(n <= (Int.MaxValue - 8) / 4, s"matrix too large for a local load: $n floats")
      val buf = new Array[Byte](n.toInt * 4)
      var read = 0
      while (read < buf.length) {
        val r = s.read(buf, read, buf.length - read)
        if (r < 0) throw new IllegalArgumentException(s"truncated .bin: $path")
        read += r
      }
      val fb = java.nio.ByteBuffer.wrap(buf)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
      val out = new Array[Float](n.toInt)
      fb.get(out)
      out
    }
    def close(): Unit = s.close()
  }

  /** Load a `.bin` supervised model (format version 12, the public
    * layout every released lid/quality model uses). */
  def read(path: String): FtModel = {
    val in = new In(path)
    try {
      require(in.i32() == Magic,
        s"$path is not a fastText .bin (bad magic)")
      val version = in.i32()
      require(version <= Version,
        s"$path is format version $version; this loader supports <= $Version")
      // Args (args.cc save order)
      val dim = in.i32()
      in.i32() // ws
      in.i32() // epoch
      in.i32() // minCount
      in.i32() // neg
      val wordNgrams = in.i32()
      in.i32() // loss
      in.i32() // model (sup=3)
      val bucket = in.i32()
      val minn = in.i32()
      val maxn = in.i32()
      in.i32() // lrUpdateRate
      in.f64() // t
      // Dictionary (dictionary.cc save order)
      val size = in.i32()
      val nwords = in.i32()
      val nlabels = in.i32()
      in.i64() // ntokens
      val pruneSize = in.i64()
      val words = scala.collection.mutable.LinkedHashMap[String, Int]()
      val labels = scala.collection.mutable.ArrayBuffer[String]()
      var wi = 0
      var i = 0
      while (i < size) {
        val w = in.cstring()
        in.i64() // count
        val tpe = in.i8()
        if (tpe == 0) { words(w) = wi; wi += 1 } else labels += w
        i += 1
      }
      require(wi == nwords && labels.length == nlabels,
        s"$path dictionary inconsistent: $wi/$nwords words, ${labels.length}/$nlabels labels")
      var p = 0L
      while (p < pruneSize) { in.i32(); in.i32(); p += 1 }
      val quant = in.i8()
      require(quant == 0,
        s"$path is a quantized (.ftz) model — only dense .bin models are supported")
      val rows = in.i64(); val cols = in.i64()
      require(cols == dim, s"$path input matrix cols $cols != dim $dim")
      require(rows == nwords.toLong + bucket,
        s"$path input matrix rows $rows != nwords+bucket ${nwords.toLong + bucket}")
      val input = in.floats(rows * cols)
      val qout = in.i8()
      require(qout == 0, s"$path has a quantized output matrix — unsupported")
      val oRows = in.i64(); val oCols = in.i64()
      require(oCols == dim && oRows == nlabels.toLong,
        s"$path output matrix ${oRows}x$oCols != ${nlabels}x$dim")
      val output = in.floats(oRows * oCols)
      FtModel(dim, bucket, minn, maxn, wordNgrams, nwords,
        words.toMap, labels.toArray, input, output)
    } finally in.close()
  }

  // ============================ writing ============================

  /** Write a dense supervised `.bin` in the same public layout —
    * fixture construction for the zero-egress gate (and an export
    * seam: a model assembled here loads in real fastText). `wordRows`
    * are (token -> embedding) for dict words IN DICT ORDER;
    * `labelRows` are (label -> output row) in output order; bucket
    * rows not listed default to zero. */
  def write(path: String, dim: Int, bucket: Int, minn: Int, maxn: Int,
            wordNgrams: Int, wordRows: Seq[(String, Array[Float])],
            labelRows: Seq[(String, Array[Float])],
            bucketRows: Map[Int, Array[Float]] = Map.empty): Unit = {
    require(wordRows.forall(_._2.length == dim) &&
      labelRows.forall(_._2.length == dim), "embedding dim mismatch")
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      new FileOutputStream(path), 1 << 20))
    def i32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def i64(v: Long): Unit = { i32(v.toInt); i32((v >> 32).toInt) }
    def f32(v: Float): Unit = i32(java.lang.Float.floatToIntBits(v))
    try {
      i32(Magic); i32(Version)
      i32(dim); i32(5); i32(5); i32(1); i32(5) // ws epoch minCount neg
      i32(wordNgrams); i32(3); i32(3) // loss=softmax model=sup
      i32(bucket); i32(minn); i32(maxn); i32(100) // lrUpdateRate
      i64(java.lang.Double.doubleToLongBits(1e-4)) // t
      // dictionary
      i32(wordRows.length + labelRows.length)
      i32(wordRows.length); i32(labelRows.length)
      i64(1000L) // ntokens (informational)
      i64(0L) // pruneidx_size
      wordRows.foreach { case (w, _) =>
        out.write(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.write(0); i64(100L); out.write(0) // count, type=word
      }
      labelRows.foreach { case (l, _) =>
        out.write(l.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.write(0); i64(100L); out.write(1) // count, type=label
      }
      out.write(0) // quant_ = false
      i64(wordRows.length.toLong + bucket); i64(dim.toLong)
      wordRows.foreach(_._2.foreach(f32))
      val zero = new Array[Float](dim)
      (0 until bucket).foreach { b =>
        bucketRows.getOrElse(b, zero).foreach(f32)
      }
      out.write(0) // qout_ = false
      i64(labelRows.length.toLong); i64(dim.toLong)
      labelRows.foreach(_._2.foreach(f32))
    } finally out.close()
  }

  // ====================== DataFrame integration ======================

  /** Append `outCol` (top-1 label) and `probCol` to each row — the
    * executor-singleton broadcast pattern (R4/P7), zero shuffle, NULL
    * text -> NULL label (the [[TrainedLid.predict]] convention). */
  def predictDf(df: DataFrame, textCol: String, model: FtModel,
                outCol: String = "lang_pred_ft",
                probCol: String = "lang_prob_ft"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val tIdx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(df.schema.fields)
      .add(outCol, StringType, nullable = true)
      .add(probCol, DoubleType, nullable = true)
    df.mapPartitions { it =>
      val m = bc.value
      it.map { r =>
        if (r.isNullAt(tIdx)) Row.fromSeq(r.toSeq :+ null :+ null)
        else {
          // the reference normalizes to single-space joined tokens
          // before predicting (quality/model.py LanguageFilter.normalize)
          val (label, prob) = m.predict(r.getString(tIdx))
          Row.fromSeq(r.toSeq :+ label :+ prob)
        }
      }
    }(Encoders.row(outSchema))
  }
}
