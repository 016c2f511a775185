package graft.queries

import graft.Tables
import graft.operators.{IvfIndex, Pq}
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Build-once fixtures for the ANN gates: the PQ codebook, the IVF-PQ
  * model and the persisted IVF index are pure functions of (sfDir, source
  * fingerprint, params) — training them inside every gate execution pays
  * the one-time model cost per query, the same anti-pattern the archive
  * and bucketed-events fixtures already solve for the fact table
  * ([[graft.Tables.eventsArchived]], [[graft.Tables.eventsByUser]]). At
  * production scale an ANN model is trained once and served for months;
  * the per-fingerprint cache is the single-node stand-in for that.
  *
  * Concurrency: within a JVM, builders run under the object lock; across
  * processes (Bench and Verify sharing an sfDir), each builder writes to a
  * private temp path and atomically renames into place — first writer
  * wins, losers discard their temp. Models are deterministic (hash-sampled
  * init, fixed Lloyd rounds), so any winner's bytes are THE bytes.
  *
  * Model file layout (bit-exact, doubles as raw long bits):
  * `[nCents, dim, cents…] [m, k, dSub, book…]`.
  */
object AnnFixtures {

  private def root(d: String): Path = {
    val src = Paths.get(d, "embeddings.parquet")
    val fp =
      if (Files.exists(src))
        s"${Files.size(src)}-${Files.getLastModifiedTime(src).toMillis}"
      else "missing"
    val tag = d.replaceAll("[^A-Za-z0-9._-]", "_")
    Paths.get("target", "graft-ann", s"$tag-$fp").toAbsolutePath
  }

  /** The cached (centroids, codebook) model at `leaf`, built by `build` on
    * first use. `cents` may be empty for PQ-only models.
    */
  def cachedModel(d: String, leaf: String)(
      build: => (Array[Array[Double]], Pq.Codebook))
      : (Array[Array[Double]], Pq.Codebook) = AnnFixtures.synchronized {
    val p = root(d).resolve(s"$leaf.bin")
    if (!Files.exists(p)) {
      val (cents, book) = build
      val tmp = p.resolveSibling(
        s"$leaf.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      Files.createDirectories(tmp.getParent)
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        Files.newOutputStream(tmp)))
      try {
        out.writeInt(cents.length)
        out.writeInt(cents.headOption.map(_.length).getOrElse(0))
        cents.foreach(_.foreach(x => out.writeLong(java.lang.Double.doubleToRawLongBits(x))))
        out.writeInt(book.length)
        out.writeInt(book.headOption.map(_.length).getOrElse(0))
        out.writeInt(book.headOption.flatMap(_.headOption).map(_.length).getOrElse(0))
        book.foreach(_.foreach(_.foreach(x =>
          out.writeLong(java.lang.Double.doubleToRawLongBits(x)))))
      } finally out.close()
      // atomic promote; a concurrent winner's file is byte-identical
      try Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.io.IOException => Files.deleteIfExists(tmp) }
    }
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(p)))
    try {
      val (nc, dim) = (in.readInt(), in.readInt())
      val cents = Array.fill(nc, dim)(java.lang.Double.longBitsToDouble(in.readLong()))
      val (m, k, dSub) = (in.readInt(), in.readInt(), in.readInt())
      val book = Array.fill(m, k, dSub)(java.lang.Double.longBitsToDouble(in.readLong()))
      (cents, book)
    } finally in.close()
  }

  /** PQ codebook over the embeddings table (q_ann_pq). */
  def pqBook(s: SparkSession, d: String, m: Int, k: Int, iters: Int): Pq.Codebook =
    cachedModel(d, s"pq-m$m-k$k-i$iters") {
      (Array.empty, Pq.train(Tables.embeddings(s, d), "vec_id", "embedding",
        m, k, iters))
    }._2

  /** SQ8 per-dimension bounds over the embeddings table (q_ann_sq8) —
    * reusing the model file layout with the two bound vectors in the
    * centroid slot and an empty codebook.
    */
  def sqBounds(s: SparkSession, d: String): graft.operators.Sq.Bounds = {
    val (vecs, _) = cachedModel(d, "sq8-bounds") {
      val b = graft.operators.Sq.train(Tables.embeddings(s, d), "embedding")
      (Array(b.mins, b.scales), Array.empty)
    }
    graft.operators.Sq.Bounds(vecs(0), vecs(1))
  }

  /** Persisted IVF index over the embeddings table (q_ann_ivf_index),
    * built into a fingerprinted directory exactly once; the search half of
    * the gate reads only the probed cell partitions via DPP.
    */
  def ivfIndexDir(s: SparkSession, d: String, nlist: Int): String =
    cachedDir(d, s"ivf-n$nlist") { tmp =>
      IvfIndex.build(Tables.embeddings(s, d), "vec_id", "embedding",
        nlist, tmp)
    }

  /** Persisted IVF-SQ8 index over the embeddings table (q_ann_ivf_sq8):
    * coarse cells + residual SQ8 codes, built once per source fingerprint;
    * search reads only the probed cell partitions via DPP.
    */
  def ivfSq8IndexDir(s: SparkSession, d: String, nlist: Int): String =
    cachedDir(d, s"ivfsq8-n$nlist") { tmp =>
      IvfIndex.buildSq8(Tables.embeddings(s, d), "vec_id", "embedding",
        nlist, tmp)
    }

  /** Persisted inverted text index over the documents table
    * (q_text_index_search) — fingerprinted on documents.parquet; the
    * search half prunes statically to the query vocabulary's buckets.
    */
  def textIndexDir(s: SparkSession, d: String, nBuckets: Int): String = {
    val src = Paths.get(d, "documents.parquet")
    val fp =
      if (Files.exists(src))
        s"${Files.size(src)}-${Files.getLastModifiedTime(src).toMillis}"
      else "missing"
    val tag = d.replaceAll("[^A-Za-z0-9._-]", "_")
    cachedDirAt(Paths.get("target", "graft-ann", s"docs-$tag-$fp").toAbsolutePath,
      s"textidx2-b$nBuckets") { tmp =>
      graft.operators.TextIndex.build(Tables.documents(s, d),
        "doc_id", "text", tmp, nBuckets)
    }
  }

  /** Split-then-append variant of [[textIndexDir]] (q_text_index_append):
    * first 60% of doc ids built, the rest appended — searches must answer
    * identically to the one-shot index.
    */
  def textIndexAppendDir(s: SparkSession, d: String, nBuckets: Int): String = {
    val src = Paths.get(d, "documents.parquet")
    val fp =
      if (Files.exists(src))
        s"${Files.size(src)}-${Files.getLastModifiedTime(src).toMillis}"
      else "missing"
    val tag = d.replaceAll("[^A-Za-z0-9._-]", "_")
    cachedDirAt(Paths.get("target", "graft-ann", s"docs-$tag-$fp").toAbsolutePath,
      s"textidx2-append-b$nBuckets") { tmp =>
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, d)
      val cut = docs.agg(org.apache.spark.sql.functions.max("doc_id"))
        .head().getLong(0) * 6 / 10
      graft.operators.TextIndex.build(docs.where(col("doc_id") <= cut),
        "doc_id", "text", tmp, nBuckets)
      graft.operators.TextIndex.append(docs.where(col("doc_id") > cut),
        "doc_id", "text", tmp)
    }
  }

  /** Build-once directory fixture keyed on the embeddings fingerprint:
    * `build` writes into a private temp path that is atomically promoted
    * to `leaf` — first writer wins, losers discard (the builds are
    * deterministic, so any winner's bytes are THE bytes).
    */
  private def cachedDir(d: String, leaf: String)(build: String => Unit): String =
    cachedDirAt(root(d), leaf)(build)

  private def cachedDirAt(rootPath: Path, leaf: String)(
      build: String => Unit): String =
    AnnFixtures.synchronized {
      val dir = rootPath.resolve(leaf)
      if (!Files.exists(dir)) {
        val tmp = dir.resolveSibling(
          s"$leaf.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
        build(tmp.toString)
        try Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.io.IOException => // a concurrent winner promoted first
            Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
              .forEach(p => Files.deleteIfExists(p))
        }
      }
      dir.toString
    }
}
