package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Constant-length sequence packer — the reference's
  * ConstantLengthDataset (reference: src/llm_data_pipeline/tokenizer/
  * run.py:109-214) re-expressed for distributed execution.
  *
  * Semantics per stream: concatenate every document's token ids plus one
  * EOS per document (skipping the EOS when the document already ends
  * with it — `ensure_eos` dedupe, reference: tokenizer/run.py:147-160),
  * emit fixed `seqLen` chunks with carry-over across documents, and
  * run-length metadata (`seq_id` per token, `seq_lens`, `offsets`,
  * reference: tokenizer/run.py:73-103) for block-diagonal attention.
  *
  * Distribution contract: packing is PARTITION-LOCAL. Rows are
  * range-partitioned and sorted by `orderCol`, each partition packs its
  * own stream, and each partition's tail remainder is dropped (or padded
  * when `padTail`). Exact single-stream reference parity holds on one
  * partition — that configuration is what the oracle checks; the
  * multi-partition deviation (one partial chunk per partition boundary)
  * is the documented price of linear scale-out.
  */
object Packer {

  private val chunkSchema = StructType(Seq(
    StructField("part_id", IntegerType, nullable = false),
    StructField("chunk_in_part", LongType, nullable = false),
    StructField("input_ids", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("seq_id", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("seq_lens", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("offsets", ArrayType(IntegerType, containsNull = false), nullable = false)))

  /** Pure streaming packer over one iterator of (already ordered)
    * documents' token arrays. Emits (input_ids, seq_id, seq_lens,
    * offsets) tuples of exactly `seqLen` tokens. */
  def packStream(docs: Iterator[Array[Int]], seqLen: Int, eosId: Int,
                 padTail: Boolean): Iterator[(Array[Int], Array[Int], Array[Int], Array[Int])] =
    new Iterator[(Array[Int], Array[Int], Array[Int], Array[Int])] {
      private val idBuf = new ArrayBuffer[Int]()
      private val sidBuf = new ArrayBuffer[Int]()
      private var nextDocId = 0
      private var exhausted = false

      private def fill(): Unit = {
        while (idBuf.length < seqLen && docs.hasNext) {
          val ids = docs.next()
          idBuf ++= ids
          // ensure exactly one trailing EOS per document
          if (ids.isEmpty || ids.last != eosId) idBuf += eosId
          val docLen = idBuf.length - sidBuf.length
          var i = 0
          while (i < docLen) { sidBuf += nextDocId; i += 1 }
          nextDocId += 1
        }
        if (!docs.hasNext && idBuf.length < seqLen) {
          if (padTail && idBuf.nonEmpty) {
            while (idBuf.length < seqLen) { idBuf += eosId; sidBuf += nextDocId - 1 }
          } else if (!padTail) {
            idBuf.clear(); sidBuf.clear()
          }
          exhausted = true
        }
      }

      override def hasNext: Boolean = {
        if (idBuf.length < seqLen && !exhausted) fill()
        idBuf.length >= seqLen
      }

      override def next(): (Array[Int], Array[Int], Array[Int], Array[Int]) = {
        if (!hasNext) throw new NoSuchElementException
        val ids = idBuf.take(seqLen).toArray
        val sids = sidBuf.take(seqLen).toArray
        idBuf.remove(0, seqLen)
        sidBuf.remove(0, seqLen)
        val (local, lens, offs) = runsFromSids(sids)
        (ids, local, lens, offs)
      }
    }

  /** Run-length encode global doc ids within a chunk into (local seq_id,
    * seq_lens, offsets) — reference: tokenizer/run.py:73-103. */
  def runsFromSids(sids: Array[Int]): (Array[Int], Array[Int], Array[Int]) = {
    val local = new Array[Int](sids.length)
    val lens = new ArrayBuffer[Int]()
    val offs = new ArrayBuffer[Int]()
    var run = -1
    var prev = Int.MinValue
    var i = 0
    while (i < sids.length) {
      if (sids(i) != prev) {
        run += 1; prev = sids(i)
        offs += i; lens += 0
      }
      local(i) = run
      lens(lens.length - 1) += 1
      i += 1
    }
    (local, lens.toArray, offs.toArray)
  }

  /** DataFrame API: pack `tokensCol` (array<int>) into `seqLen` chunks.
    * `numPartitions = 1` gives exact single-stream reference semantics;
    * larger values give partition-local packing at linear scale. */
  def pack(df: DataFrame, orderCol: String, tokensCol: String, seqLen: Int,
           eosId: Int, padTail: Boolean = false, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val prepared0 = df.select(col(orderCol).cast("long").as("__ord"), col(tokensCol).as("__toks"))
    val prepared =
      if (numPartitions == 1) prepared0.coalesce(1).sortWithinPartitions("__ord")
      else if (numPartitions > 1) prepared0.repartitionByRange(numPartitions, col("__ord"))
        .sortWithinPartitions("__ord")
      else prepared0.repartitionByRange(col("__ord")).sortWithinPartitions("__ord")
    val enc = org.apache.spark.sql.Encoders.row(chunkSchema)
    prepared.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val docs = rows.map { r =>
        val s = r.getSeq[Int](1)
        s.toArray
      }
      packStream(docs, seqLen, eosId, padTail).zipWithIndex.map {
        case ((ids, sid, lens, offs), i) =>
          Row(pid, i.toLong, ids.toSeq, sid.toSeq, lens.toSeq, offs.toSeq)
      }
    }(enc)
  }
}
