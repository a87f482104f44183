package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

import java.io.InputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Consumer side of the sharded binary token export
  * (PipelineSteps.ExportStep): reads `export_tokens.shards/` directly
  * via its `manifest.json`, making the driver-side concat file
  * optional. At 100 TB the concat is a convenience artifact for
  * single-file consumers; a distributed training loader instead maps
  * its global token range onto shard-local offsets through the
  * manifest and reads only the bytes it owns — no concat pass, no
  * single-writer bottleneck, O(1) metadata per reader.
  *
  * The reference ships the single flat file only (reference:
  * src/llm_data_pipeline/export/run.py:36-163); the manifest +
  * shard-range reader is the scale path layered on the same bytes.
  * All I/O goes through the Hadoop FileSystem API, so the shards may
  * live on HDFS/S3A/NFS/file: exactly like the writer side.
  */
object ExportReader {

  /** One manifest entry plus its cumulative global position. */
  case class Shard(name: String, tokens: Long, bytes: Long,
                   tokenOffset: Long, byteOffset: Long)

  private val EntryRe =
    """\{"shard":"([^"]+)","tokens":(\d+),"bytes":(\d+)\}""".r

  /** Parse `manifest.json` and attach cumulative token/byte offsets in
    * manifest (= partition) order. */
  def readManifest(conf: Configuration, shardsDir: String): Seq[Shard] = {
    val dir = new HPath(shardsDir)
    val fs = dir.getFileSystem(conf)
    val in = fs.open(new HPath(dir, "manifest.json"))
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    var tokOff = 0L
    var byteOff = 0L
    val entries = EntryRe.findAllMatchIn(text).map { m =>
      val s = Shard(m.group(1), m.group(2).toLong, m.group(3).toLong,
        tokOff, byteOff)
      tokOff += s.tokens
      byteOff += s.bytes
      s
    }.toSeq
    // fail loudly on format drift: a writer-side change to the manifest
    // layout must not read as "empty export"
    require(entries.nonEmpty || text.trim == "[]",
      s"unparseable manifest at $shardsDir: ${text.take(120)}")
    entries
  }

  /** One logical stream over all shards in manifest order —
    * byte-identical to the concat file without requiring it. */
  def open(conf: Configuration, shardsDir: String): InputStream = {
    val dir = new HPath(shardsDir)
    val fs = dir.getFileSystem(conf)
    val shards = readManifest(conf, shardsDir).iterator
    val streams = new java.util.Enumeration[InputStream] {
      def hasMoreElements: Boolean = shards.hasNext
      def nextElement(): InputStream =
        fs.open(new HPath(dir, shards.next().name))
    }
    new java.io.SequenceInputStream(streams)
  }

  private def bytesPerToken(dtype: String): Int = dtype match {
    case "uint16" => 2
    case "int32"  => 4
    case other => throw new IllegalArgumentException(s"dtype: $other")
  }

  /** Total token count, from metadata only. */
  def totalTokens(conf: Configuration, shardsDir: String): Long =
    readManifest(conf, shardsDir).map(_.tokens).sum

  /** Read tokens [from, from + count) of the global stream, seeking to
    * shard-local offsets — the distributed-loader primitive: reader k
    * of N calls this with its own contiguous range and touches only the
    * shards (and byte ranges) it owns. uint16 decodes unsigned,
    * mirroring the writer's wrap semantics. Convenience overload;
    * loaders issuing many slices should parse the manifest once and use
    * the `shards` overload below (one remote read per call otherwise). */
  def tokenSlice(conf: Configuration, shardsDir: String, dtype: String,
                 from: Long, count: Int): Array[Int] =
    tokenSlice(conf, shardsDir, readManifest(conf, shardsDir), dtype, from, count)

  /** As above, against a pre-parsed manifest — O(1) remote metadata for
    * a loader that slices repeatedly. */
  def tokenSlice(conf: Configuration, shardsDir: String, shards: Seq[Shard],
                 dtype: String, from: Long, count: Int): Array[Int] = {
    require(from >= 0 && count >= 0, s"range [$from, +$count)")
    val bpt = bytesPerToken(dtype)
    val dir = new HPath(shardsDir)
    val fs = dir.getFileSystem(conf)
    val out = new Array[Int](count)
    var filled = 0
    val wanted = shards.iterator
      .filter(s => s.tokenOffset + s.tokens > from && filled < count)
    while (wanted.hasNext && filled < count) {
      val s = wanted.next()
      val localFrom = math.max(0L, from - s.tokenOffset)
      val localN = math.min(s.tokens - localFrom, (count - filled).toLong).toInt
      if (localN > 0) {
        val in = fs.open(new HPath(dir, s.name))
        try {
          in.seek(localFrom * bpt)
          val buf = new Array[Byte](localN * bpt)
          in.readFully(buf)
          val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < localN) {
            out(filled + i) =
              if (bpt == 2) bb.getShort(i * 2) & 0xffff else bb.getInt(i * 4)
            i += 1
          }
          filled += localN
        } finally in.close()
      }
    }
    require(filled == count,
      s"range [$from, +$count) exceeds the ${shards.map(_.tokens).sum}-token export")
    out
  }
}
