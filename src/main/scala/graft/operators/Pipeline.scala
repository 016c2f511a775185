package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The end-to-end curation pipeline: the composition a training-data run
  * actually executes as ONE job over a raw corpus —
  *
  *   exact dedup (keep-min) → MinHash near-dup pairs → connected
  *   components (keep each component's min id) → n-gram benchmark
  *   decontamination → per-source token-budget mixing → sequence packing.
  *
  * Each stage is the already-gated operator ([[Dedup]], [[Curation]],
  * [[Sampling]], [[Packing]]); this object pins their composition: stage
  * boundaries persist exactly once (the deduped corpus feeds signature
  * computation, the component join, AND the decontamination grams —
  * without the persist the signature UDF re-runs per consumer), and
  * everything downstream of the pair join operates on ids + token counts,
  * never re-shuffling text.
  *
  * Scale: inherits each operator's design — 16-byte exact-dedup keys,
  * banded LSH with bucket caps, edge-list-only CC, broadcast decontam
  * grams, map-side mix filter, two-phase packing scan. The only full-text
  * shuffles in the whole pipeline are the exact-dedup key group and the
  * one-time corpus persist.
  */
object Pipeline {

  /** Run the full pipeline. Output: one row per surviving document with
    * (idCol, srcCol, n_tokens, start_tok, first_seq, last_seq) — the
    * packed training-sequence manifest.
    *
    * @param decontamBenchmark documents whose `decontamN`-grams must not
    *   appear in the output corpus (the held-out eval set)
    * @param budgetTokens per-`srcCol` token budget for the mixing stage
    * @param packBudget tokens per packed training sequence
    */
  def curate(docs: DataFrame, idCol: String, textCol: String, srcCol: String,
      minhashThreshold: Double, decontamBenchmark: DataFrame, decontamN: Int,
      budgetTokens: Long, packBudget: Int): DataFrame = {
    // stage 1: exact dedup, keep the smallest id per text; join the
    // surviving ids back for the payload (exactKeepMin shuffles only
    // (16-byte hash, id) pairs — never the text)
    val s1Ids = Dedup.exactKeepMin(docs, textCol, idCol).select(idCol)
    val s1 = docs.join(s1Ids, Seq(idCol), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // stage 2: near-dup pairs -> components -> keep each component's
      // min — Dedup.nearDupComponents (signature cache managed inside,
      // pairs feed straight into the component builder's edge-list
      // checkpoint; no pair-staging round trip).
      val compRenamed = Dedup.nearDupComponents(s1, idCol, textCol,
        minhashThreshold)
      val s2 = s1.join(compRenamed, Seq(idCol), "left")
        .where(col("component").isNull || col("component") === col(idCol))
        .drop("component")

      // stage 3 + manifest in ONE corpus pass: the old shape ran the
      // decontam probe (tokenize + gram explode + broadcast semi +
      // distinct + anti-join) and THEN tokenized the corpus again for the
      // manifest's token counts — two tokenizations of every surviving
      // document where one suffices. The benchmark gram set (already
      // bounded by the broadcast join it used to feed) collects once and
      // rides a broadcast variable into a fused per-document probe
      // (token count + early-exit contamination flag, one pass, no gram
      // rows, no distinct shuffle, no anti-join). Null-text documents
      // keep their null count and survive, exactly as under the anti-join.
      val sc = docs.sparkSession.sparkContext
      val benchSet = sc.broadcast(
        Curation.benchmarkGramSet(decontamBenchmark, textCol, decontamN))
      try {
        val probe = Curation.tokenCountContamUdf(benchSet, decontamN)

        // Nothing downstream of stage 3 reads text: the mix decides on
        // (id, source, token count) and packing on (id, token count).
        // Persist the SLIM manifest once — tokenBudgetMix alone walks its
        // input twice (the per-source rates aggregate, then the keep
        // join), so an unpersisted manifest re-runs the fused probe
        // corpus pass per walk and drags the text column through the mix
        // join (measured at sf10: extra corpus passes ≈ 20% of the whole
        // pipeline, BENCH_NOTES r15). The corpus is touched exactly three
        // times total: the s1 persist, the signature pass, and this
        // manifest pass.
        val slim = s2
          .select(col(idCol), col(srcCol),
            probe(TextOps.tokens(col(textCol))).as("__p"))
          .where(col("__p").isNull || !col("__p._2"))
          .select(col(idCol), col(srcCol), col("__p._1").as("__n"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          // stage 4: per-source token-budget mix (integer-exact rates,
          // map-side keep filter) — slim in, slim out, so the unpersisted
          // s4 recomputes only a broadcast-join filter over the cached
          // manifest
          val s4 = Sampling.tokenBudgetMix(
            slim, srcCol, col(idCol), "__n", budgetTokens)
          // stage 5: pack the kept docs into fixed-budget training
          // sequences. The result (one row per surviving doc, ids +
          // offsets only) is staged so every corpus-stage cache can be
          // released before return.
          val packed = Packing.packOffsets(
            s4.select(col(idCol), col("__n")), idCol, "__n", packBudget)
          Staged.materialize(
            s4.select(col(idCol), col(srcCol)).join(packed, Seq(idCol)))
        } finally slim.unpersist(false)
      } finally benchSet.unpersist(false)
    } finally s1.unpersist(false)
  }

  /** The classify→dedup→mix composition as one staged job: hashed
    * quality-classifier gate ([[Classifier.scoreTokens]]) → winnow
    * clone-pair dedup dropping each pair's b-side
    * ([[Dedup.winnowClonePairsTokens]]) → per-source token-budget mix
    * ([[Sampling.tokenBudgetMix]]). Output: one row per surviving
    * document — (srcCol, idCol, n_tokens), the mix manifest (ids and
    * counts only, staged; the corpus cache releases before return).
    *
    * Perf shape (BENCH_NOTES round 12, both measured):
    *  - the corpus tokenizes ONCE into a persisted token column that
    *    all three stages read;
    *  - the scored frame persists UNFILTERED — `where(keep)` would
    *    inline the md5 feature fold into the filter and Catalyst pushes
    *    that below any exchange onto the scan tasks (serial on
    *    few-file input); caching scored-then-filtering keeps the fold
    *    above the repartition, once and parallel.
    */
  def classifyDedupMix(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, budgetTokens: Long, classifierThreshold: Double = 0.5,
      k: Int = 3, w: Int = 4, minShared: Int = 3,
      maxDocsPerFp: Int = 64): DataFrame = {
    val nPart = docs.sparkSession.sessionState.conf.numShufflePartitions
    val toked = docs.repartition(nPart, col(idCol))
      .select(col(idCol), col(srcCol),
        TextOps.tokens(lower(col(textCol))).as("__tk"))
    val scored = Classifier.scoreTokens(toked, "__tk",
        threshold = classifierThreshold)
      .select(col(idCol), col(srcCol), col("__tk"), col("keep"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val kept = scored.where(col("keep")).select(idCol, srcCol, "__tk")
      val losers = Dedup.winnowClonePairsTokens(kept, idCol, "__tk",
          k, w, minShared, maxDocsPerFp)
        .select(col("b_id").as(idCol)).distinct()
      // slim manifest before the mix: tokenBudgetMix walks its input twice
      // (rates aggregate + keep join), and `deduped`'s lineage contains the
      // winnow pair join — unpersisted, that pair join would run twice
      // (same double-walk fixed in curate, BENCH_NOTES r15)
      val deduped = kept.join(losers, Seq(idCol), "left_anti")
        .select(col(srcCol), col(idCol),
          size(col("__tk")).cast("long").as("n_tokens"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try Staged.materialize(
        Sampling.tokenBudgetMix(deduped, srcCol, col(idCol), "n_tokens",
          budgetTokens))
      finally deduped.unpersist(false)
    } finally scored.unpersist(false)
  }

  /** The quality-gated packing composition: rule-filter the corpus
    * ([[Curation.qualityRulesWithCount]], map-side — the word count rides
    * along from the same stats pass, so the corpus is scanned and
    * tokenized exactly once and there is NO join back) and pack the
    * surviving documents into no-split training bins
    * ([[Packing.packBinsNoSplit]], deterministic hash shards). The filter
    * never shuffles, so the whole composition costs exactly the pack's
    * one shard exchange; output is a pure function of the data
    * (cluster-size / partitioning independent).
    * Output: one row per kept doc — (idCol, shard, bin, n_tokens).
    */
  def qualityPack(docs: DataFrame, idCol: String, textCol: String,
      packBudget: Int, nShards: Int): DataFrame = {
    val kept = Curation.qualityRulesWithCount(docs, idCol, textCol)
      .where(col("keep") === 1)
      .select(col(idCol), col("n_words"))
    Packing.packBinsNoSplit(kept, idCol, "n_words", packBudget, nShards)
  }

  /** Dataset-card report: every per-source statistic a corpus release
    * note needs — doc and token counts, exact duplicate rate (distinct
    * texts), language spread, quality and PII incidence — from ONE scan
    * of the corpus. The two exact count-distincts ride Catalyst's expand
    * rewrite inside the same aggregation; nothing scans the corpus twice.
    */
  /** First-drop attribution across an ordered stage sequence — the
    * "which stage lost my data" observable a curation run reads next to
    * [[corpusReport]]: for every input document, the name of the FIRST
    * stage whose survivor set lacks it (`'kept'` for documents that
    * survive every stage). Complements the per-stage counters a funnel
    * report gives: attribution is per-document, so it joins back to any
    * slice (per-source drop rates, per-language decontam incidence).
    *
    * `stages` are `(name, survivors)` in pipeline order, each survivors
    * frame carrying `idCol`. With sequentially-derived stages (stage i
    * computed on stage i−1's survivors — the normal pipeline shape) the
    * sets are nested and "first missing" is exactly "the stage that
    * dropped it"; with independent membership sets it still reports the
    * first predicate the document fails.
    *
    * Scale shape: the operator touches only id columns — one id-keyed
    * left join per stage over monotonically shrinking survivor sets, no
    * text movement; attribution itself is a null-chase projection.
    * Callers should hand in STAGED survivor frames (the
    * [[graft.operators.Staged]] discipline) — each survivors frame is
    * consumed once here, but deriving frames lazily from each other
    * re-executes the upstream stages per reference.
    */
  def attrition(docs: DataFrame, idCol: String,
      stages: Seq[(String, DataFrame)]): DataFrame = {
    require(stages.nonEmpty, "attrition needs at least one stage")
    val flagged = stages.zipWithIndex.foldLeft(docs.select(col(idCol))) {
      case (acc, ((_, ids), i)) =>
        acc.join(ids.select(col(idCol)).withColumn(s"__s$i", lit(1)),
          Seq(idCol), "left")
    }
    val attributed = stages.zipWithIndex.foldRight(lit("kept")) {
      case (((name, _), i), rest) =>
        when(col(s"__s$i").isNull, lit(name)).otherwise(rest)
    }
    flagged.select(col(idCol), attributed.as("dropped_by"))
  }

  def corpusReport(docs: DataFrame, textCol: String, srcCol: String,
      langCol: String): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    docs
      .select(col(srcCol).as("source"), col(langCol).as("__lang"),
        col(textCol).as("__text"), toks.as("__tk"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("__tk"))).cast("long").as("n_tokens"),
        countDistinct(col("__text")).as("n_distinct_texts"),
        countDistinct(col("__lang")).as("n_langs"),
        sum(TextOps.qualityFlag(col("__tk"), length(col("__text"))))
          .cast("long").as("quality_docs"),
        sum(when(Curation.piiCount(col("__text")) > 0, 1L).otherwise(0L))
          .cast("long").as("pii_docs"))
  }

  /** Per-source KL divergence of the token distribution from the whole
    * corpus — KL(P_src ‖ P_corpus) = Σ_w p_s(w)·ln(p_s(w)/p_c(w)) — the
    * mixture-drift monitor of a multi-source pipeline: a source whose KL
    * jumps between releases changed its content profile, and a source
    * with outlier KL is the one skewing the mix. Zero-probability terms
    * cannot occur (every source token is a corpus token by construction).
    *
    * Scale shape: one exploded shuffle builds the (source, token) counts;
    * corpus token counts derive from the SAME table by a second
    * vocabulary-sized aggregate (no second corpus scan); the join is
    * token-keyed, vocabulary-sized; the final fold is one row per source.
    * Output: (source, n_tokens, n_vocab, kl) — kl rounded to 4.
    */
  def sourceDivergence(docs: DataFrame, srcCol: String,
      textCol: String): DataFrame = {
    val sw = docs
      .select(col(srcCol).as("source"),
        explode(graft.operators.TextOps.tokens(lower(col(textCol)))).as("__w"))
      .groupBy("source", "__w").agg(count(lit(1)).as("__csw"))
    val srcTot = sw.groupBy("source")
      .agg(sum("__csw").as("__ns"), count(lit(1)).as("n_vocab"))
    val corpTot = sw.groupBy("__w").agg(sum("__csw").as("__cw"))
      .crossJoin(broadcast(sw.agg(sum("__csw").as("__n"))))
    sw.join(srcTot, Seq("source"))
      .join(corpTot, Seq("__w"))
      .select(col("source"), col("__ns"), col("n_vocab"),
        ((col("__csw") / col("__ns")) *
          log((col("__csw") / col("__ns")) / (col("__cw") / col("__n"))))
          .as("__term"))
      .groupBy("source")
      .agg(max("__ns").cast("long").as("n_tokens"),
        max("n_vocab").cast("long").as("n_vocab"),
        round(sum("__term"), 4).as("kl"))
  }
}
