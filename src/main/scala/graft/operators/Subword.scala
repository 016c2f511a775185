package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Corpus-learned subword segmentation: greedy longest-prefix-match
  * against a vocabulary of the most frequent word prefixes — the
  * WordPiece/unigram-style max-match tokenizer one rung above the
  * regex pre-splitter ([[TextOps.bpeishTokens]]), with the vocabulary
  * LEARNED from the corpus instead of fixed. Token counts under a
  * learned vocab are the planning input for packing/budget decisions
  * (how many trained-tokenizer tokens will this corpus cost?).
  *
  * Vocabulary: the `vocabSize` most frequent prefixes of length
  * 2..`maxLen` over all token occurrences (ties lexicographic), plus the
  * implicit single-character fallback, so segmentation always succeeds.
  * Encoding: from each position take the LONGEST vocabulary entry
  * matching there, else consume one character.
  *
  * Scale shape: vocabulary learning is one partial-agg shuffle on the
  * prefix key + a TakeOrderedAndProject (top-V heap, no global sort);
  * the learned table (V rows, bounded by the parameter like the IVF
  * centroids) is collected and closed over by the encoder. Encoding
  * itself runs per DISTINCT word — the caller groups tokens first, so
  * the greedy loop pays vocabulary cost, not corpus cost. The loop is a
  * UDF by necessity (sequential max-match has no builtin), on the
  * smallest possible input.
  */
object Subword {

  /** Learn the top-`vocabSize` prefix vocabulary (count desc, prefix asc
    * — deterministic at ties). Bounded collect: V strings.
    */
  def learnVocabulary(df: DataFrame, textCol: String, vocabSize: Int = 64,
      maxLen: Int = 6): Seq[String] = {
    require(vocabSize > 0 && maxLen >= 2)
    df.select(explode(TextOps.tokens(col(textCol))).as("__w"))
      .where(length(col("__w")) >= 2)
      .select(explode(transform(
        sequence(lit(2), least(lit(maxLen), length(col("__w")))),
        l => col("__w").substr(lit(1), l))).as("__p"))
      .groupBy("__p").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__p").asc)
      .limit(vocabSize)
      .select("__p").collect().map(_.getString(0)).toSeq
  }

  /** Greedy max-match piece count per word under `vocab` (+ the implicit
    * 1-char fallback).
    */
  def pieceCounter(vocab: Seq[String], maxLen: Int = 6): UserDefinedFunction = {
    val byLen: Map[Int, Set[String]] =
      vocab.groupBy(_.length).map { case (l, vs) => l -> vs.toSet }
    udf { (w: String) =>
      var pos = 0
      var n = 0
      while (pos < w.length) {
        var step = 1
        var l = math.min(maxLen, w.length - pos)
        while (l >= 2 && step == 1) {
          if (byLen.get(l).exists(_.contains(w.substring(pos, pos + l)))) step = l
          l -= 1
        }
        pos += step
        n += 1
      }
      n
    }
  }

  /** Per-group subword token totals: learn the vocabulary, encode each
    * DISTINCT (group, word) once, weight by occurrence count.
    */
  def subwordTokens(df: DataFrame, textCol: String, groupCol: String,
      vocabSize: Int = 64, maxLen: Int = 6): DataFrame = {
    val vocab = learnVocabulary(df, textCol, vocabSize, maxLen)
    val pieces = pieceCounter(vocab, maxLen)
    df.select(col(groupCol), explode(TextOps.tokens(col(textCol))).as("__w"))
      .groupBy(groupCol, "__w").agg(count(lit(1)).as("__cnt"))
      .select(col(groupCol), (col("__cnt") * pieces(col("__w"))).as("__pieces"))
      .groupBy(groupCol)
      .agg(sum("__pieces").cast("long").as("subword_tokens"))
  }

  /** [[pieceCounter]] that also counts the 1-char FALLBACK pieces — the
    * positions no vocabulary piece covered. Returns (pieces, fallbacks).
    */
  def pieceAndFallbackCounter(vocab: Seq[String],
      maxLen: Int = 6): UserDefinedFunction = {
    val byLen: Map[Int, Set[String]] =
      vocab.groupBy(_.length).map { case (l, vs) => l -> vs.toSet }
    udf { (w: String) =>
      var pos = 0
      var n = 0
      var f = 0
      while (pos < w.length) {
        var step = 1
        var l = math.min(maxLen, w.length - pos)
        while (l >= 2 && step == 1) {
          if (byLen.get(l).exists(_.contains(w.substring(pos, pos + l)))) step = l
          l -= 1
        }
        if (step == 1) f += 1
        pos += step
        n += 1
      }
      (n, f)
    }
  }

  /** Tokenizer-coverage (OOV) report per group: subword tokens, 1-char
    * fallback pieces, and the fallback rate — the vocabulary-fit monitor
    * of a tokenization pipeline (a source whose fallback rate spikes is
    * written in a script/style the learned vocabulary never saw, and will
    * tokenize into garbage-length sequences downstream).
    *
    * Same scale shape as [[subwordTokens]]: the learned vocabulary is a
    * driver-side Seq (top-V, bounded), each DISTINCT (group, word) is
    * encoded once, occurrence counts weight the fold.
    */
  def oovReport(df: DataFrame, textCol: String, groupCol: String,
      vocabSize: Int = 64, maxLen: Int = 6): DataFrame = {
    val vocab = learnVocabulary(df, textCol, vocabSize, maxLen)
    val enc = pieceAndFallbackCounter(vocab, maxLen)
    df.select(col(groupCol), explode(TextOps.tokens(col(textCol))).as("__w"))
      .groupBy(groupCol, "__w").agg(count(lit(1)).as("__cnt"))
      .select(col(groupCol), col("__cnt"), enc(col("__w")).as("__e"))
      .groupBy(groupCol)
      .agg(sum(col("__cnt") * col("__e._1")).cast("long").as("subword_tokens"),
        sum(col("__cnt") * col("__e._2")).cast("long").as("fallback_pieces"))
      .withColumn("oov_rate",
        round(col("fallback_pieces") / col("subword_tokens"), 6))
  }

  /** Tokenizer-efficiency report per group: whitespace tokens, UTF-8
    * text bytes, subword tokens under the learned vocabulary, FERTILITY
    * (subword pieces per whitespace word — the standard tokenizer-fit
    * metric; high fertility on a language means the vocabulary
    * fragments it) and bytes-per-token (compression — what a token
    * budget actually buys in raw data). The per-group numbers are two
    * tiny aggregates (group cardinality rows each) null-safe-joined, so
    * the corpus is scanned for counting only; the vocabulary is the
    * same bounded top-`vocabSize` model as [[subwordTokens]].
    */
  def fertilityReport(df: DataFrame, textCol: String, groupCol: String,
      vocabSize: Int = 64, maxLen: Int = 6): DataFrame = {
    val vocab = learnVocabulary(df, textCol, vocabSize, maxLen)
    val pieces = pieceCounter(vocab, maxLen)
    // ONE counting scan (was two + a join): posexplode rides the per-doc
    // byte count on the token at position 0 — the whitespace tokenizer
    // never returns an empty array, so every document contributes its
    // bytes exactly once — and ws_tokens is just the occurrence total, so
    // the doc-grain byte/word base and the word-grain piece fold come out
    // of the same pass over the corpus (r15: one less corpus scan at any
    // scale; the encode loop still runs per DISTINCT (group, word)).
    df.select(col(groupCol), octet_length(col(textCol)).cast("long").as("__b"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("__pos", "__w")))
      .groupBy(groupCol, "__w")
      .agg(count(lit(1)).as("__cnt"),
        sum(when(col("__pos") === 0, col("__b")).otherwise(lit(0L))).as("__b0"))
      .groupBy(groupCol)
      .agg(sum("__cnt").cast("long").as("ws_tokens"),
        sum("__b0").cast("long").as("text_bytes"),
        sum(col("__cnt") * pieces(col("__w"))).cast("long").as("subword_tokens"))
      .select(col(groupCol), col("ws_tokens"), col("text_bytes"),
        col("subword_tokens"),
        when(col("ws_tokens") > 0,
          round(col("subword_tokens") / col("ws_tokens"), 6)).as("fertility"),
        when(col("subword_tokens") > 0,
          round(col("text_bytes") / col("subword_tokens"), 6))
          .as("bytes_per_token"))
  }

  // ---- iterative BPE merge learning (Sennrich et al. 2016) ----------------

  /** Learn `nMerges` byte-pair-encoding merges from the corpus — the
    * ACTUAL BPE training loop (count adjacent symbol pairs over the
    * word dictionary, merge the most frequent pair everywhere, repeat),
    * as opposed to [[learnVocabulary]]'s single-shot prefix heuristic.
    *
    * Spark-first scale shape (the published algorithm's own structure):
    * BPE learns from the WORD-FREQUENCY DICTIONARY, not the corpus —
    * the one corpus-scale pass here is the distributed word count,
    * capped at the top `maxWords` types by (count desc, word asc) like
    * every bounded model in this repo (IVF centroids, the subword
    * vocabulary, LM tables). The merge loop then runs on that bounded
    * dictionary driver-side: nMerges × O(dictionary) with incremental
    * pair recounts, corpus-size-independent.
    *
    * Determinism contract: pair ranks order by (count desc, left asc,
    * right asc); merge application is leftmost-first non-overlapping
    * (so ("v","v") on "vvv" yields [vv, v]); the loop stops early when
    * no adjacent pair remains anywhere in the dictionary.
    *
    * @return merges in learned order: (rank 1.., left, right)
    */
  def learnBpeMerges(df: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 50000): Seq[(Int, String, String)] = {
    require(nMerges > 0 && maxWords > 0)
    val dict = df
      .select(explode(TextOps.tokens(lower(col(textCol)))).as("__w"))
      .where(length(col("__w")) >= 2)
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] =
      dict.map { case (w, c) => (w.toCharArray.map(_.toString), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: (String, String) = null
        var bestC = -1L
        counts.foreach { case (k, v) =>
          if (v > bestC || (v == bestC &&
              (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
            best = k; bestC = v
          }
        }
        merges += ((rank, best._1, best._2))
        words = words.map { case (syms, c) => (mergePair(syms, best), c) }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Leftmost-first non-overlapping application of one merge. */
  private def mergePair(syms: Array[String],
      m: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Piece count per word under a learned merge list (applied in rank
    * order) — the [[pieceCounter]] of the BPE path. Per DISTINCT word,
    * like every encoder here.
    */
  def bpePieceCounter(merges: Seq[(Int, String, String)]): UserDefinedFunction = {
    val ordered = merges.sortBy(_._1).map(m => (m._2, m._3)).toArray
    udf { (w: String) =>
      var syms: Array[String] = w.toCharArray.map(_.toString)
      ordered.foreach { m => syms = mergePair(syms, m) }
      syms.length
    }
  }

  /** Per-group BPE token totals under learned merges — the trained-
    * tokenizer cost estimate ([[subwordTokens]]' BPE sibling): learn on
    * the corpus, encode each DISTINCT (group, word) once, weight by
    * occurrence count.
    */
  def bpeTokens(df: DataFrame, textCol: String, groupCol: String,
      nMerges: Int, maxWords: Int = 50000): DataFrame = {
    val pieces = bpePieceCounter(learnBpeMerges(df, textCol, nMerges, maxWords))
    df.select(col(groupCol), explode(TextOps.tokens(lower(col(textCol)))).as("__w"))
      .groupBy(groupCol, "__w").agg(count(lit(1)).as("__cnt"))
      .select(col(groupCol), (col("__cnt") * pieces(col("__w"))).as("__pieces"))
      .groupBy(groupCol)
      .agg(sum("__pieces").cast("long").as("bpe_tokens"))
  }
}
