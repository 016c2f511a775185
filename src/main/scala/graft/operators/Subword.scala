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
}
