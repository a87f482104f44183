package graft

import graft.functions.{CharEntropy, CharShingleHashes, CosineSim, DeflateRatio, L2SqDist, MaxMultiplicity, MinHashSignature, NormalizeNfkc, RollingHash64, SignBuckets, SimHash64, XxHash64String}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for the engine's custom expressions, so the
  * same operators are reachable from `spark.sql(...)` as from the Column
  * API:
  *
  *   SELECT graft_minhash(text, 128, 5, 42), graft_simhash(text, 2),
  *          graft_xxhash64(text, 0), graft_rolling_hash(text) FROM docs
  *
  * Install either at session build time
  * (`.withExtensions(new GraftExtensions)`) or post-hoc on a live
  * session (`GraftExtensions.register(spark)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit =
    builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[MinHashSignature].getName, name), builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$what must be a long literal, got $other")
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash" -> { args =>
      args match {
        case Seq(c)          => MinHashSignature(c, 128, 5, 42L)
        case Seq(c, k)       => MinHashSignature(c, intArg(k, "k"), 5, 42L)
        case Seq(c, k, n)    => MinHashSignature(c, intArg(k, "k"), intArg(n, "ngram"), 42L)
        case Seq(c, k, n, s) => MinHashSignature(c, intArg(k, "k"), intArg(n, "ngram"), longArg(s, "seed"))
        case _ => throw new IllegalArgumentException("graft_minhash(text[, k[, ngram[, seed]]])")
      }
    },
    "graft_simhash" -> { args =>
      args match {
        case Seq(c)    => SimHash64(c, 2)
        case Seq(c, n) => SimHash64(c, intArg(n, "ngram"))
        case _ => throw new IllegalArgumentException("graft_simhash(text[, ngram])")
      }
    },
    "graft_xxhash64" -> { args =>
      args match {
        case Seq(c)    => XxHash64String(c, 0L)
        case Seq(c, s) => XxHash64String(c, longArg(s, "seed"))
        case _ => throw new IllegalArgumentException("graft_xxhash64(text[, seed])")
      }
    },
    "graft_deflate_ratio" -> { args =>
      args match {
        case Seq(c) => DeflateRatio(c)
        case _ => throw new IllegalArgumentException("graft_deflate_ratio(text)")
      }
    },
    "graft_rolling_hash" -> { args =>
      args match {
        case Seq(c) => RollingHash64(c)
        case _ => throw new IllegalArgumentException("graft_rolling_hash(text)")
      }
    },
    "graft_nfkc" -> { args =>
      args match {
        case Seq(c) => NormalizeNfkc(c)
        case _ => throw new IllegalArgumentException("graft_nfkc(text)")
      }
    },
    "graft_cosine_sim" -> { args =>
      args match {
        case Seq(a, b) => CosineSim(a, b)
        case _ => throw new IllegalArgumentException("graft_cosine_sim(vec, vec)")
      }
    },
    "graft_l2_sq" -> { args =>
      args match {
        case Seq(a, b) => L2SqDist(a, b)
        case _ => throw new IllegalArgumentException("graft_l2_sq(vec, vec)")
      }
    },
    "graft_char_entropy" -> { args =>
      args match {
        case Seq(c) => CharEntropy(c)
        case _ => throw new IllegalArgumentException("graft_char_entropy(text)")
      }
    },
    "graft_max_multiplicity" -> { args =>
      args match {
        case Seq(c) => MaxMultiplicity(c)
        case _ => throw new IllegalArgumentException("graft_max_multiplicity(array<bigint>)")
      }
    },
    "graft_sign_buckets" -> { args =>
      args match {
        case Seq(v)          => SignBuckets(v, 12, 7L, 1)
        case Seq(v, p)       => SignBuckets(v, intArg(p, "planes"), 7L, 1)
        case Seq(v, p, s)    => SignBuckets(v, intArg(p, "planes"), longArg(s, "seed"), 1)
        case Seq(v, p, s, t) => SignBuckets(v, intArg(p, "planes"), longArg(s, "seed"), intArg(t, "tables"))
        case _ => throw new IllegalArgumentException("graft_sign_buckets(vec[, planes[, seed[, tables]]])")
      }
    },
    "graft_char_shingles" -> { args =>
      args match {
        case Seq(c)    => CharShingleHashes(c, 5)
        case Seq(c, n) => CharShingleHashes(c, intArg(n, "ngram"))
        case _ => throw new IllegalArgumentException("graft_char_shingles(text[, ngram])")
      }
    },
    // the span-dedup family's candidate kernel (x15/st26): text →
    // array<binary> of stride-1 window-token 16-byte fingerprints,
    // bit-identical to the Column-API operators' candidates — a SQL
    // user can state the whole ExactSubstr pipeline (see q49). Built
    // by Column composition rather than a bespoke Expression: the
    // let-binding shape in Dedup.spanFingerprints is the logic.
    "graft_span_fingerprints" -> { args =>
      import org.apache.spark.sql.graftbridge.ColumnBridge
      args match {
        case Seq(c) => ColumnBridge.eagerExpression(
          graft.operators.Dedup.spanFingerprints(ColumnBridge.column(c), 8))
        case Seq(c, w) => ColumnBridge.eagerExpression(
          graft.operators.Dedup.spanFingerprints(ColumnBridge.column(c), intArg(w, "window")))
        case _ => throw new IllegalArgumentException("graft_span_fingerprints(text[, window])")
      }
    })

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}
