package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Dedup, Multimodal, Pq, Similarity, TextOps, TextRank}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate queries for the training-data-pipeline operator suite: dedup
  * (exact, MinHash-LSH, SimHash, word-set Jaccard, embedding cosine),
  * similarity search (brute-force + LSH ANN), text analysis (lang-id,
  * quality, token counts, fingerprints) and multimodal plumbing.
  *
  * Hash-based operators (minhash/simhash/LSH/fingerprints) are
  * engine-specific, so their gates emit exact pinnable values (planted
  * counts, corpus sizes) plus recall/invariant flags the DuckDB oracle
  * asserts; set algebra, counts, md5 fingerprints and cosine rankings are
  * directly SQL-expressible. Every entry is oracle-checked.
  */
object PipelineQueries {

  /** documents ∪ a mutated copy (ids shifted by 100000): the mutated texts
    * are near- but not exact duplicates, giving the near-dup operators a
    * known planted signal.
    */
  private def doubledDocs(s: SparkSession, d: String, mutate: Boolean): DataFrame = {
    val docs = Tables.documents(s, d)
    val copy0 = docs.withColumn("doc_id", col("doc_id") + 100000)
    val copy = if (mutate) copy0.withColumn("text", concat(col("text"), lit(" zz yy xx"))) else copy0
    docs.unionByName(copy)
  }

  val defs: Seq[QueryDef] = Seq(
    // --- dedup: exact ------------------------------------------------------
    // dedup key includes lang: the same text can occur under two languages
    // (it does at sf0.1), and a text-only dedup would keep an arbitrary
    // lang while the per-lang distinct count sees both
    QueryDef("q_dedup_exact",
      """SELECT lang, CAST(COUNT(DISTINCT text) AS BIGINT) AS cnt
        |FROM documents GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
      Dedup.exact(doubledDocs(s, d, mutate = false), Seq("lang", "text"))
        .groupBy("lang").agg(count(lit(1)).as("cnt"))
        .orderBy("lang")
    },

    QueryDef("q_dedup_exact_keepmin",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(mid) AS BIGINT) AS id_sum
        |FROM (SELECT MIN(doc_id) AS mid FROM documents GROUP BY text)""".stripMargin) { (s, d) =>
      Dedup.exactKeepMin(doubledDocs(s, d, mutate = false), "text", "doc_id")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
    },

    // --- pipeline attrition: per-document FIRST-DROP attribution across a
    // four-stage deterministic funnel (exact keep-min → Gopher quality →
    // 3-gram decontam vs the doc_id<10 benchmark → 200-token source
    // budget; every stage computed on the previous stage's survivors).
    // Input is the DOUBLED corpus (verbatim clones at +100000) so the
    // exact-dup stage provably attributes every clone at any scale. The
    // oracle replays all four predicates sequentially — each fragment is
    // the corresponding single-stage gate's oracle, composed.
    QueryDef("q_pipeline_attrition",
      """WITH input AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, text, source FROM documents),
        |s1 AS (SELECT MIN(doc_id) AS doc_id FROM input GROUP BY text),
        |toks AS (SELECT d.doc_id AS id,
        |           unnest(string_split_regex(trim(d.text), '\s+')) AS tok
        |         FROM input d JOIN s1 USING (doc_id)),
        |perdoc AS (SELECT id, COUNT(*) AS n_words, SUM(len(tok)) AS n_wchars,
        |    COUNT(DISTINCT tok) AS n_types,
        |    SUM(CASE WHEN tok IN ('the','a','of','and','to','in','is')
        |        THEN 1 ELSE 0 END) AS n_stop
        |  FROM toks GROUP BY 1),
        |maxf AS (SELECT id, MAX(c) AS max_freq
        |         FROM (SELECT id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2)
        |         GROUP BY 1),
        |s2 AS (SELECT id AS doc_id FROM perdoc JOIN maxf USING (id)
        |       WHERE n_words >= 30 AND n_wchars >= 4*n_words
        |         AND n_wchars <= 10*n_words AND n_stop >= 2
        |         AND 2*n_types >= n_words AND 10*max_freq <= n_words),
        |tok2 AS (SELECT doc_id, unnest(ts) AS t, unnest(range(1, len(ts)+1)) AS i
        |         FROM (SELECT d.doc_id, string_split_regex(trim(d.text), '\s+') AS ts
        |               FROM input d JOIN s2 USING (doc_id))),
        |g2 AS (SELECT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS gram
        |       FROM tok2 a JOIN tok2 b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |                   JOIN tok2 c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
        |btok AS (SELECT doc_id, unnest(ts) AS t, unnest(range(1, len(ts)+1)) AS i
        |         FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
        |               FROM input WHERE doc_id < 10)),
        |bg AS (SELECT DISTINCT a.t || ' ' || b.t || ' ' || c.t AS gram
        |       FROM btok a JOIN btok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |                   JOIN btok c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
        |contam AS (SELECT DISTINCT g2.doc_id FROM g2 JOIN bg USING (gram)),
        |s3 AS (SELECT doc_id FROM s2
        |       WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
        |t AS (SELECT d.source, d.doc_id,
        |        len(string_split_regex(trim(d.text), '\s+')) AS n
        |      FROM input d JOIN s3 USING (doc_id)),
        |tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS actual FROM t GROUP BY source),
        |r AS (SELECT source, CASE WHEN actual <= 200 THEN CAST(65536 AS BIGINT)
        |        ELSE CAST(13107200 // actual AS BIGINT) END AS rate16 FROM tot),
        |s4 AS (SELECT doc_id FROM t JOIN r USING (source)
        |       WHERE rate16 >= 65536
        |          OR substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |             < lpad(lower(to_hex(rate16)), 4, '0'))
        |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
        |  CASE WHEN s1.doc_id IS NULL THEN 'exact_dup'
        |       WHEN s2.doc_id IS NULL THEN 'quality'
        |       WHEN s3.doc_id IS NULL THEN 'decontam'
        |       WHEN s4.doc_id IS NULL THEN 'budget'
        |       ELSE 'kept' END AS dropped_by
        |FROM input d
        |LEFT JOIN s1 USING (doc_id) LEFT JOIN s2 USING (doc_id)
        |LEFT JOIN s3 USING (doc_id) LEFT JOIN s4 USING (doc_id)
        |ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      import graft.operators.{Curation, Pipeline, Sampling, Staged}
      val docs = doubledDocs(s, d, mutate = false)
      val s1 = Staged.materialize(
        Dedup.exactKeepMin(docs, "text", "doc_id").select("doc_id"))
      val d1 = docs.join(s1, Seq("doc_id"), "left_semi")
      // the quality stage's stats pass already counts words with the mix
      // tokenizer — stage the count alongside the survivor ids so the mix
      // manifest never re-tokenizes the corpus (one full text pass saved;
      // attrition itself only reads the id column of each stage frame)
      val s2 = Staged.materialize(
        Curation.qualityRulesWithCount(d1, "doc_id", "text")
          .where(col("keep").cast("int") === 1)
          .select(col("doc_id"), col("n_words").cast("long").as("n")))
      val d2 = docs.join(s2.select("doc_id"), Seq("doc_id"), "left_semi")
      val s3 = Staged.materialize(
        s2.join(
          Curation.contaminatedIds(d2, docs.where(col("doc_id") < 10),
            "doc_id", "text", 3),
          Seq("doc_id"), "left_anti"))
      val s4 = Sampling.tokenBudgetMix(
        docs.select(col("source"), col("doc_id")).join(s3, Seq("doc_id")),
        "source", col("doc_id"), "n", 200L).select("doc_id")
      Pipeline.attrition(docs, "doc_id", Seq(
        "exact_dup" -> s1, "quality" -> s2, "decontam" -> s3, "budget" -> s4))
        .orderBy("doc_id")
    },

    // --- dedup: MinHash LSH. The hash values are engine-specific, but the
    // RECALL CONTRACT is checkable: every planted near-dup pair (mutated
    // copy at id+100000) must be found. The oracle pins the planted-pair
    // count exactly and asserts the flag (the HLL-tolerance gate pattern).
    QueryDef("q_dedup_minhash",
      """SELECT CAST((SELECT COUNT(*) FROM documents
        |  WHERE len(string_split_regex(trim(text), '\s+')) >= 3) AS BIGINT) AS planted,
        |  TRUE AS all_planted_found
        |""".stripMargin) { (s, d) =>
      // docs shorter than 3 tokens have no shingles, hence no signature;
      // the planted count is a second aggregate branch of the SAME job
      // (crossJoin of two 1-row aggregates), not a separate counting job
      val planted = Tables.documents(s, d)
        .where(size(TextOps.tokens(col("text"))) >= 3)
        .agg(count(lit(1)).as("planted"))
      Dedup.minhashNearDups(doubledDocs(s, d, mutate = true), "doc_id", "text", 0.35)
        .where(col("b_id") === col("a_id") + 100000)
        .agg(count(lit(1)).as("found"))
        .crossJoin(planted)
        .select(col("planted"),
          (col("found") === col("planted")).as("all_planted_found"))
    },

    // --- dedup: duplicated spans (exact substring-dedup signal, Lee et
    // al. ACL 2022 — repeated >= L-token windows are the trimming
    // target). Duplication depends only on span CONTENT equality, so the
    // oracle recomputes multiplicities over the span STRINGS while the
    // engine counts by 64-bit span hash — identical answers (collisions
    // at corpus scale ~2^-30). Planted signal: the exact copies make
    // every window of every long-enough doc duplicated.
    QueryDef("q_dedup_spans",
      """WITH input AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 200
        |  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 200),
        |tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM input),
        |sp AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ts) - 18),
        |    i -> array_to_string(ts[i:i+19], ' '))) AS s
        |  FROM tk WHERE len(ts) >= 20),
        |occ AS (SELECT s FROM sp GROUP BY s HAVING COUNT(*) >= 2)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_spans
        |FROM sp JOIN occ USING (s) WHERE doc_id < 100000
        |GROUP BY 1 ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).where(col("doc_id") < 200)
        .select("doc_id", "text")
      val input = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + 100000))
      Dedup.duplicateSpans(input, "doc_id", "text", spanTokens = 20)
        .where(col("doc_id") < 100000)
        .groupBy("doc_id").agg(count(lit(1)).as("dup_spans"))
        .orderBy("doc_id")
    },

    // --- dedup: span TRIMMING (the actionable half of q_dedup_spans —
    // keep one canonical occurrence per repeated window, cut the rest,
    // rebuild the text). The oracle reproduces the whole pipeline in SQL
    // — window extraction, canonical pick by (doc_id, start), token-index
    // removal, string_agg rebuild — and the gate compares the REBUILT
    // TEXT by md5, so the trim semantics are pinned byte-exactly.
    QueryDef("q_dedup_span_trim",
      """WITH input AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 120
        |  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 120),
        |tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM input),
        |sp AS (
        |  SELECT doc_id, i - 1 AS start, array_to_string(ts[i:i+19], ' ') AS s
        |  FROM tk, unnest(range(1, len(ts) - 18)) AS u(i)
        |  WHERE len(ts) >= 20),
        |occ AS (SELECT s FROM sp GROUP BY s HAVING COUNT(*) >= 2),
        |flagged AS (
        |  SELECT sp.doc_id, sp.start, sp.s,
        |    row_number() OVER (PARTITION BY sp.s ORDER BY sp.doc_id, sp.start) AS rn
        |  FROM sp JOIN occ USING (s)),
        |removed AS (
        |  SELECT DISTINCT doc_id, CAST(unnest(range(start, start + 20)) AS BIGINT) AS ti
        |  FROM flagged WHERE rn > 1),
        |toks AS (
        |  SELECT tk.doc_id, i - 1 AS ti, ts[i] AS tok
        |  FROM tk, unnest(range(1, len(ts) + 1)) AS u(i)),
        |kept AS (
        |  SELECT t.doc_id, t.ti, t.tok FROM toks t
        |  LEFT JOIN removed r ON r.doc_id = t.doc_id AND r.ti = t.ti
        |  WHERE r.ti IS NULL),
        |rebuilt AS (
        |  SELECT i.doc_id,
        |    CASE WHEN i.doc_id IN (SELECT doc_id FROM removed)
        |      THEN COALESCE((SELECT string_agg(k.tok, ' ' ORDER BY k.ti)
        |                     FROM kept k WHERE k.doc_id = i.doc_id), '')
        |      ELSE i.text END AS txt
        |  FROM input i)
        |SELECT doc_id,
        |  CAST(CASE WHEN txt = '' THEN 0
        |       ELSE len(string_split_regex(trim(txt), '\s+')) END AS BIGINT) AS n_tokens,
        |  md5(txt) AS fp
        |FROM rebuilt ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).where(col("doc_id") < 120)
        .select("doc_id", "text")
      val input = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + 100000))
      Dedup.trimDuplicateSpans(input, "doc_id", "text", spanTokens = 20)
        .select(col("doc_id"),
          when(col("text") === "", 0L)
            .otherwise(size(graft.operators.TextOps.tokens(col("text"))).cast("long"))
            .as("n_tokens"),
          md5(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // --- dedup: SimHash. Banding recall contract: the banded join must
    // find EXACTLY the planted pairs within the Hamming radius (ground
    // truth computed in-query via direct id join — no LSH involved).
    QueryDef("q_dedup_simhash",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, TRUE AS banding_exact
        |FROM documents""".stripMargin) { (s, d) =>
      val planted = doubledDocs(s, d, mutate = true)
      val sh = Dedup.simhash(planted, "doc_id", "text")
      // ground truth is another aggregate branch of the SAME job
      val truth = sh.select(col("doc_id").as("a_id"), col("simhash").as("a_sh"))
        .join(sh.select((col("doc_id") - 100000).as("a_id"), col("simhash").as("b_sh")), "a_id")
        .where(bit_count(col("a_sh").bitwiseXOR(col("b_sh"))) <= 6)
        .agg(count(lit(1)).as("truth"))
      Dedup.simhashNearDups(planted, "doc_id", "text", 6)
        .where(col("b_id") === col("a_id") + 100000)
        .agg(count(lit(1)).as("found"))
        .crossJoin(truth)
        .crossJoin(Tables.documents(s, d).agg(count(lit(1)).as("n_docs")))
        .select(col("n_docs"), (col("found") === col("truth")).as("banding_exact"))
    },

    // --- dedup: exact word-set Jaccard (integer outputs → exact oracle) ----
    // doc-frequency cap (maxDf=20) mirrored in the oracle's `rare` CTE: hot
    // tokens are dropped from both intersection and set sizes before the
    // token self-join, bounding per-token fan-out at maxDf² at any scale.
    QueryDef("q_jaccard_pairs",
      """WITH alltoks AS (
        |  SELECT doc_id AS id, unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS tok
        |  FROM documents WHERE doc_id < 25),
        |rare AS (SELECT tok FROM alltoks GROUP BY tok HAVING COUNT(*) <= 20),
        |toks AS (SELECT id, t.tok FROM alltoks t JOIN rare USING (tok)),
        |sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY id),
        |inter AS (
        |  SELECT a.id AS a_id, b.id AS b_id, CAST(COUNT(*) AS BIGINT) AS inter_cnt
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id, inter_cnt, sa.n + sb.n - inter_cnt AS union_cnt
        |FROM inter
        |JOIN sizes sa ON sa.id = a_id
        |JOIN sizes sb ON sb.id = b_id
        |WHERE 5 * inter_cnt >= sa.n + sb.n
        |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""".stripMargin) { (s, d) =>
      Dedup.wordSetPairs(Tables.documents(s, d).where(col("doc_id") < 25),
          "doc_id", "text", maxDf = 20)
        .where(col("inter_cnt") * 5 >= col("union_cnt") + col("inter_cnt"))
        .orderBy("a_id", "b_id")
    },

    // --- dedup: embedding cosine pairs (double math → exact-enough oracle;
    // ids only, no float in the output)
    // BOUNDED-SUBSET CONTRACT: exact all-pairs is inherently O(n²)·d — the
    // gate runs it on a fixed-size id slice so its cost is scale-invariant
    // (the cap, not the sf, bounds the pair space). The scale path for
    // full-corpus near-dup is lshNearPairs (q_ann_lsh).
    QueryDef("q_emb_near_dup",
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 4000 AND b.vec_id < 4000
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.42
        |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""".stripMargin) { (s, d) =>
      Similarity.exactPairsBlocked(
          Tables.embeddings(s, d).where(col("vec_id") < 4000),
          "vec_id", "embedding", 0.42)
        .select("a_id", "b_id")
        .orderBy("a_id", "b_id")
    },

    // --- similarity search: brute-force cosine top-k ------------------------
    QueryDef("q_ann_topk",
      """SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                      CAST(c.embedding AS DOUBLE[])) DESC,
        |               c.vec_id) AS rank
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 5 AND c.vec_id != q.vec_id)
        |WHERE rank <= 3
        |ORDER BY query_id NULLS FIRST, rank NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.topKCosine(emb, "vec_id", "embedding",
        emb.where(col("vec_id") < 5), 3)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    },

    // --- similarity search: LSH-bucketed ANN (scale path). Planted signal:
    // a lightly-perturbed copy of each vector (cos ≈ 0.999) that multi-table
    // LSH must recover at ≥90% recall; the oracle pins the corpus size and
    // asserts the recall flag.
    QueryDef("q_ann_lsh",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors, TRUE AS recall_ok
        |FROM embeddings""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val perturbed = emb
        .withColumn("vec_id", col("vec_id") + 100000)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            (x.cast("double") + sin(i.cast("double") * 0.7) * 0.03).cast("float")))
      Similarity.lshNearPairs(emb.unionByName(perturbed), "vec_id", "embedding",
          dim = 64, threshold = 0.9)
        .where(col("b_id") === col("a_id") + 100000)
        .agg(count(lit(1)).as("found"))
        .crossJoin(emb.agg(count(lit(1)).as("n_vectors")))
        .select(col("n_vectors"),
          (col("found") >= col("n_vectors") * 0.9).as("recall_ok"))
    },

    // --- similarity search: IVF ANN (the other scale path). Planted
    // signal: each query is a lightly-perturbed copy of a corpus vector
    // (cos ≈ 0.999 with its source), which shares the source's coarse cell
    // with overwhelming probability — IVF must surface the source in its
    // top-k while probing only nProbe/nlist of the corpus. The flag-based
    // oracle pins the query set and asserts every planted source is found
    // (the HLL-tolerance gate pattern).
    QueryDef("q_ann_ivf",
      """SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS found_planted
        |FROM embeddings WHERE vec_id < 20
        |ORDER BY query_id NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      // id shift keeps the planted source visible (ivfTopK drops self-ids)
      val queries = emb.where(col("vec_id") < 20)
        .withColumn("vec_id", col("vec_id") + 100000)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            (x.cast("double") + sin(i.cast("double") * 1.3) * 0.01).cast("float")))
      val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", queries, 5,
          nlist = 32, nProbe = 4)
      ivf.groupBy("query_id")
        .agg(max(col("neighbor_id") === col("query_id") - 100000).as("found_planted"))
        .select((col("query_id") - 100000).as("query_id"), col("found_planted"))
        .orderBy("query_id")
    },

    // --- similarity search: JL-reduce → IVF candidates → exact rerank
    // (the wide-embedding composition: index small projected vectors,
    // score survivors on the originals). Same planted contract as
    // q_ann_ivf; the rerank makes rank-1 exact for planted twins.
    QueryDef("q_ann_jl_rerank",
      """SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS found_planted
        |FROM embeddings WHERE vec_id < 20
        |ORDER BY query_id NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 20)
        .withColumn("vec_id", col("vec_id") + 100000)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            (x.cast("double") + sin(i.cast("double") * 1.3) * 0.01).cast("float")))
      Similarity.jlRerankTopK(emb, "vec_id", "embedding", queries, k = 5,
          inDim = 64, outDim = 16, candK = 20, nlist = 32, nProbe = 8)
        .groupBy("query_id")
        .agg(max(col("neighbor_id") === col("query_id") - 100000).as("found_planted"))
        .select((col("query_id") - 100000).as("query_id"), col("found_planted"))
        .orderBy("query_id")
    },

    // --- ANN recall audit (session 4): recall@5 of the IVF path against
    // brute-force ground truth, through the generic retrievalMetrics
    // scorecard — the measurement a user runs before trusting nlist/
    // nProbe at scale. IVF assignments aren't SQL-replayable (k-means
    // centroids), so the oracle pins the query count and the aggregate
    // recall floor (the flag-based ANN contract).
    QueryDef("q_ann_recall",
      """SELECT CAST((SELECT COUNT(*) FROM embeddings WHERE vec_id < 20)
        |  AS BIGINT) AS n_queries, TRUE AS monotone_ok, TRUE AS recall_ok"""
        .stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 20)
      // truth has three consumers (one per sweep point) — stage it
      // (bounded: 20 queries × 5 rows) so the brute-force corpus scan
      // runs once; the ANN side sweeps the PERSISTED index (built once
      // per corpus fingerprint), so only the probe step varies per point
      val truth = graft.operators.Staged.materialize(
        Similarity.topKCosine(emb, "vec_id", "embedding", queries, 5)
          .select(col("query_id"), col("neighbor_id").as("doc_id")))
      val dir = AnnFixtures.ivfIndexDir(s, d, nlist = 32)
      // centroids load ONCE for the whole sweep (r15): three parquet
      // reads + driver collects of the same nlist×dim model were pure
      // fixed cost per sweep point
      val cents = graft.operators.IvfIndex.centroids(s, dir)
      // recall is monotone in nProbe by construction (more probes = a
      // candidate superset, exact scoring over candidates) — assert the
      // tuning curve a user sweeps, plus the floor at the top setting
      def recallAt(np: Int) =
        graft.operators.TextRank.retrievalMetrics(
            graft.operators.IvfIndex.search(s, dir, cents, queries,
              "vec_id", "embedding", k = 5, nProbe = np)
              .select(col("query_id"), col("rank"),
                col("neighbor_id").as("doc_id")),
            truth, k = 5)
          .agg((sum("hits") / sum("n_truth")).as(s"__r$np"),
            count(lit(1)).as(s"__n$np"))
      recallAt(4).crossJoin(recallAt(8)).crossJoin(recallAt(16))
        .select(col("__n4").as("n_queries"),
          (col("__r16") >= col("__r8") && col("__r8") >= col("__r4"))
            .as("monotone_ok"),
          (col("__r16") >= 0.6).as("recall_ok"))
    },

    // --- similarity search: PERSISTED IVF index (build once, search many
    // — the production form; search reads only the probed cell partitions
    // via dynamic partition pruning, IvfIndexSpec asserts). Same planted
    // contract as q_ann_ivf.
    QueryDef("q_ann_ivf_index",
      """SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS found_planted
        |FROM embeddings WHERE vec_id < 20
        |ORDER BY query_id NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      // build-once fixture: the index is rebuilt only when the source
      // fingerprint changes (AnnFixtures — atomic promote, race-safe)
      val dir = AnnFixtures.ivfIndexDir(s, d, nlist = 32)
      val queries = emb.where(col("vec_id") < 20)
        .withColumn("vec_id", col("vec_id") + 100000)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            (x.cast("double") + sin(i.cast("double") * 1.3) * 0.01).cast("float")))
      graft.operators.IvfIndex.search(s, dir, queries, "vec_id", "embedding",
          k = 5, nProbe = 4)
        .groupBy("query_id")
        .agg(max(col("neighbor_id") === col("query_id") - 100000).as("found_planted"))
        .select((col("query_id") - 100000).as("query_id"), col("found_planted"))
        .orderBy("query_id")
    },

    // --- similarity search: incremental index maintenance. Build a small
    // IVF index, APPEND perturbed twins of the queries (assign-to-existing-
    // centroids, files appended under the cell partitions — no rebuild),
    // and search: every appended twin (cos ≈ 0.999 with its query) must
    // surface at rank 1, proving searches see appended vectors with
    // unchanged probe math. The production maintenance path at corpus
    // scale, where an index is built once and grows.
    QueryDef("q_ann_ivf_append",
      """SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS found_appended
        |FROM embeddings WHERE vec_id < 15
        |ORDER BY query_id NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val base = emb.where(col("vec_id") < 500)
      val dir = java.nio.file.Files.createTempDirectory("ivfappend").toString
      graft.operators.IvfIndex.build(base, "vec_id", "embedding",
        nlist = 8, dir, refineIterations = 1)
      val queries = emb.where(col("vec_id") < 15)
      val twins = queries
        .withColumn("vec_id", col("vec_id") + 300000)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            (x.cast("double") + sin(i.cast("double") * 1.7) * 0.01).cast("float")))
      graft.operators.IvfIndex.append(s, dir, twins, "vec_id", "embedding")
      graft.operators.IvfIndex.search(s, dir, queries, "vec_id", "embedding",
          k = 1, nProbe = 2)
        .groupBy("query_id")
        .agg(max(col("neighbor_id") === col("query_id") + 300000).as("found_appended"))
        .orderBy("query_id")
    },

    // --- similarity search: PERSISTED IVF-SQ8 index (coarse cells +
    // residual scalar-quantized codes — the composition that makes SQ8 a
    // search structure instead of a flat-scan compression layer; ADC runs
    // only over the probed nProbe/nlist cell partitions via dynamic
    // partition pruning, IvfIndexSpec asserts). Perturbed-query planted
    // contract as q_ann_ivf_index: each query is a lightly-perturbed copy
    // (cos ≈ 0.999) of a corpus vector whose source must surface in the
    // ADC top-5.
    QueryDef("q_ann_ivf_sq8",
      """SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS found_planted
        |FROM embeddings WHERE vec_id < 20
        |ORDER BY query_id NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      // build-once fixture: rebuilt only when the source fingerprint
      // changes (AnnFixtures — atomic promote, race-safe)
      val dir = AnnFixtures.ivfSq8IndexDir(s, d, nlist = 32)
      val queries = emb.where(col("vec_id") < 20)
        .withColumn("vec_id", col("vec_id") + 100000)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            (x.cast("double") + sin(i.cast("double") * 1.3) * 0.01).cast("float")))
      graft.operators.IvfIndex.searchSq8(s, dir, queries, "vec_id", "embedding",
          k = 5, nProbe = 4)
        .groupBy("query_id")
        .agg(max(col("neighbor_id") === col("query_id") - 100000).as("found_planted"))
        .select((col("query_id") - 100000).as("query_id"), col("found_planted"))
        .orderBy("query_id")
    },

    // --- similarity search: product quantization (the compression layer
    // under IVF at billion scale). Train an (m=8 × k=16) codebook with
    // distributed Lloyd, encode the corpus as 8 codes/vector, and ADC-score
    // planted EXACT copies of 10 queries: a copy shares all m codes with its
    // source, so its ADC distance (the query's own quantization error) ranks
    // below any other row's. Flag-based oracle pins the query set and
    // asserts every planted copy is recovered at rank 1.
    QueryDef("q_ann_pq",
      """SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS copy_at_rank1
        |FROM embeddings WHERE vec_id < 10
        |ORDER BY query_id NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      // build-once fixture: codebook trained once per source fingerprint
      val book = AnnFixtures.pqBook(s, d, m = 8, k = 16, iters = 3)
      val queries = emb.where(col("vec_id") < 10)
      val corpus = emb.select(col("vec_id"), col("embedding"))
        .unionByName(queries.select((col("vec_id") + 100000).as("vec_id"),
          col("embedding")))
      val codes = Pq.encode(corpus, "vec_id", "embedding", book)
      Pq.adcTopK(codes, "vec_id", queries, "vec_id", "embedding", book, 1)
        .groupBy("query_id")
        .agg(max(col("neighbor_id") === col("query_id") + 100000).as("copy_at_rank1"))
        .orderBy("query_id")
    },

    // --- similarity search: IVF-PQ (coarse cells + residual codes — the
    // billion-scale composition). Planted exact copies share their source's
    // cell and residual codes, so ADC over the probed nProbe/nlist slice of
    // the corpus must put the copy at rank 1. Flag-based oracle as above.
    QueryDef("q_ann_ivfpq",
      """SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS copy_at_rank1
        |FROM embeddings WHERE vec_id < 10
        |ORDER BY query_id NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
      val corpus = emb.select(col("vec_id"), col("embedding"))
        .unionByName(queries.select((col("vec_id") + 100000).as("vec_id"),
          col("embedding")))
      // build-once fixture: coarse centroids + residual codebook trained
      // once per source fingerprint (the gate corpus is a pure function of
      // the table); encode+search stay per-run
      val model = AnnFixtures.cachedModel(d, "ivfpq-gate-n16-m8-k16-i3") {
        Pq.ivfpqTrain(corpus, "vec_id", "embedding",
          nlist = 16, m = 8, kCodes = 16, iters = 3)
      }
      Pq.ivfpqTopK(corpus, "vec_id", "embedding",
          queries, "vec_id", "embedding", k = 1, nlist = 16, nProbe = 2,
          trained = Some(model))
        .groupBy("query_id")
        .agg(max(col("neighbor_id") === col("query_id") + 100000).as("copy_at_rank1"))
        .orderBy("query_id")
    },

    // --- text retrieval: BM25 top-k per query. Query vocabulary is
    // broadcast to prune term-frequency rows before any shuffle; scores
    // round to 4 decimals on both sides so cross-engine float compare is
    // exact (RSJ idf, k1=1.2, b=0.75).
    QueryDef("q_text_bm25",
      """WITH q(query_id, qtext) AS (VALUES (0, 'hash join batch'), (1, 'vector scan')),
        |qt AS (SELECT query_id, unnest(list_distinct(string_split_regex(trim(lower(qtext)), '\s+'))) AS tok FROM q),
        |dt AS (SELECT doc_id, len(string_split_regex(trim(lower(text)), '\s+')) AS len,
        |              unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |       FROM documents),
        |tf AS (SELECT doc_id, len, tok, CAST(COUNT(*) AS DOUBLE) AS tf FROM dt
        |       WHERE tok IN (SELECT tok FROM qt) GROUP BY 1, 2, 3),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |                 AVG(len(string_split_regex(trim(lower(text)), '\s+'))) AS avg_len
        |          FROM documents),
        |dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS nt FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    ROUND(SUM(ln(1 + (n_docs - nt + 0.5) / (nt + 0.5)) *
        |      tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * tf.len / avg_len))), 4) AS score
        |  FROM tf JOIN dfreq USING (tok) CROSS JOIN stats JOIN qt USING (tok)
        |  GROUP BY 1, 2)
        |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
        |       CAST(doc_id AS BIGINT) AS doc_id, score
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, doc_id) AS rank FROM scored)
        |WHERE rank <= 5
        |ORDER BY query_id NULLS FIRST, rank NULLS FIRST""".stripMargin) { (s, d) =>
      TextRank.bm25TopK(Tables.documents(s, d), "doc_id", "text",
          Seq((0L, "hash join batch"), (1L, "vector scan")), k = 5)
        .orderBy("query_id", "rank")
    },

    // --- text retrieval off the PERSISTED inverted index (build once,
    // search many — IvfIndex's lexical sibling): the scan prunes
    // statically to the query vocabulary's term-hash buckets
    // (TextIndexSpec asserts the PartitionFilters). Scoring arithmetic
    // is bm25TopK's exactly, so the same oracle pins both paths.
    QueryDef("q_text_index_search",
      """WITH q(query_id, qtext) AS (VALUES (0, 'hash join batch'), (1, 'vector scan')),
        |qt AS (SELECT query_id, unnest(list_distinct(string_split_regex(trim(lower(qtext)), '\s+'))) AS tok FROM q),
        |dt AS (SELECT doc_id, len(string_split_regex(trim(lower(text)), '\s+')) AS len,
        |              unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |       FROM documents),
        |tf AS (SELECT doc_id, len, tok, CAST(COUNT(*) AS DOUBLE) AS tf FROM dt
        |       WHERE tok IN (SELECT tok FROM qt) GROUP BY 1, 2, 3),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |                 AVG(len(string_split_regex(trim(lower(text)), '\s+'))) AS avg_len
        |          FROM documents),
        |dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS nt FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    ROUND(SUM(ln(1 + (n_docs - nt + 0.5) / (nt + 0.5)) *
        |      tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * tf.len / avg_len))), 4) AS score
        |  FROM tf JOIN dfreq USING (tok) CROSS JOIN stats JOIN qt USING (tok)
        |  GROUP BY 1, 2)
        |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
        |       CAST(doc_id AS BIGINT) AS doc_id, score
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, doc_id) AS rank FROM scored)
        |WHERE rank <= 5
        |ORDER BY query_id NULLS FIRST, rank NULLS FIRST""".stripMargin) { (s, d) =>
      val dir = AnnFixtures.textIndexDir(s, d, nBuckets = 64)
      graft.operators.TextIndex.search(s, dir,
          Seq((0L, "hash join batch"), (1L, "vector scan")), k = 5)
        .orderBy("query_id", "rank")
    },

    // --- incremental index append: 60% built + 40% appended must answer
    // exactly like the one-shot index (same full-corpus oracle) — df is
    // derived from term-pruned postings, so appends stay appends with no
    // stored aggregate to rebuild.
    QueryDef("q_text_index_append",
      """WITH q(query_id, qtext) AS (VALUES (0, 'hash join batch'), (1, 'vector scan')),
        |qt AS (SELECT query_id, unnest(list_distinct(string_split_regex(trim(lower(qtext)), '\s+'))) AS tok FROM q),
        |dt AS (SELECT doc_id, len(string_split_regex(trim(lower(text)), '\s+')) AS len,
        |              unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |       FROM documents),
        |tf AS (SELECT doc_id, len, tok, CAST(COUNT(*) AS DOUBLE) AS tf FROM dt
        |       WHERE tok IN (SELECT tok FROM qt) GROUP BY 1, 2, 3),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |                 AVG(len(string_split_regex(trim(lower(text)), '\s+'))) AS avg_len
        |          FROM documents),
        |dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS nt FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    ROUND(SUM(ln(1 + (n_docs - nt + 0.5) / (nt + 0.5)) *
        |      tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * tf.len / avg_len))), 4) AS score
        |  FROM tf JOIN dfreq USING (tok) CROSS JOIN stats JOIN qt USING (tok)
        |  GROUP BY 1, 2)
        |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
        |       CAST(doc_id AS BIGINT) AS doc_id, score
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, doc_id) AS rank FROM scored)
        |WHERE rank <= 5
        |ORDER BY query_id NULLS FIRST, rank NULLS FIRST""".stripMargin) { (s, d) =>
      val dir = AnnFixtures.textIndexAppendDir(s, d, nBuckets = 64)
      graft.operators.TextIndex.search(s, dir,
          Seq((0L, "hash join batch"), (1L, "vector scan")), k = 5)
        .orderBy("query_id", "rank")
    },

    // --- exact phrase search off the POSITIONAL postings (r10): overlapping
    // occurrences counted ('a a' matches twice inside 'a a a'), first match
    // position returned; the scan prunes to the phrase vocabulary's bucket
    // partitions exactly like scoring searches, and the oracle rebuilds
    // positions from scratch with zipped parallel unnests.
    QueryDef("q_text_index_phrase",
      """WITH q(query_id, qtext) AS (VALUES (0, 'table hash'), (1, 'customer join'), (2, 'a a')),
        |ph AS (SELECT query_id, off - 1 AS off, tok FROM (
        |  SELECT query_id,
        |    unnest(string_split_regex(trim(lower(qtext)), '\s+')) AS tok,
        |    unnest(range(1, len(string_split_regex(trim(lower(qtext)), '\s+')) + 1)) AS off
        |  FROM q)),
        |n AS (SELECT query_id, COUNT(*) AS n_terms FROM ph GROUP BY 1),
        |toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |         FROM documents),
        |pos AS (SELECT doc_id, unnest(tk) AS tok, unnest(range(0, len(tk))) AS p
        |        FROM toks),
        |cand AS (SELECT ph.query_id, pos.doc_id, pos.p - ph.off AS base
        |         FROM pos JOIN ph ON pos.tok = ph.tok
        |         WHERE pos.p - ph.off >= 0),
        |hit AS (SELECT query_id, doc_id, base, COUNT(*) AS cnt
        |        FROM cand GROUP BY 1, 2, 3),
        |m AS (SELECT h.query_id, h.doc_id, h.base
        |      FROM hit h JOIN n USING (query_id) WHERE h.cnt = n.n_terms)
        |SELECT CAST(query_id AS BIGINT) AS query_id,
        |  CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_hits,
        |  CAST(MIN(base) AS INT) AS first_pos
        |FROM m GROUP BY 1, 2
        |ORDER BY query_id NULLS FIRST, doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val dir = AnnFixtures.textIndexDir(s, d, nBuckets = 64)
      graft.operators.TextIndex.phraseSearch(s, dir,
          Seq((0L, "table hash"), (1L, "customer join"), (2L, "a a")))
        .orderBy("query_id", "doc_id")
    },

    // --- corpus statistics: top-k word bigrams above a frequency cutoff.
    // orderBy.limit executes as TakeOrderedAndProject (per-partition heaps,
    // no global sort).
    QueryDef("q_text_ngrams",
      """SELECT ngram, CAST(cnt AS BIGINT) AS cnt FROM (
        |  SELECT ngram, COUNT(*) AS cnt FROM (
        |    SELECT unnest(list_transform(range(1, len(toks)),
        |             i -> array_to_string(toks[i:i+1], ' '))) AS ngram
        |    FROM (SELECT string_split_regex(trim(lower(text)), '\s+') AS toks
        |          FROM documents))
        |  GROUP BY 1 HAVING COUNT(*) >= 20)
        |ORDER BY cnt DESC, ngram NULLS FIRST LIMIT 20""".stripMargin) { (s, d) =>
      TextRank.topNgrams(Tables.documents(s, d), "text", n = 2, k = 20,
        minCount = 20)
    },

    // --- corpus statistics: Misra–Gries heavy hitters (mergeable top-k
    // frequency summary, the cardinality-HLL's frequency sibling). A
    // planted token at ~n/4 occurrences dwarfs the MG error bound
    // n/(capacity+1), so the summary MUST rank it first at any sf; the
    // oracle pins the planted count exactly and asserts both flags.
    QueryDef("q_freq_items",
      """SELECT 'zzheavy' AS top1_item,
        |  CAST(SUM(len(string_split_regex(trim(text), '\s+')) // 4) AS BIGINT) AS planted,
        |  TRUE AS est_within_bound
        |FROM documents""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(TextOps.tokens(col("text")).as("t"))
        .select(explode(concat(col("t"),
          array_repeat(lit("zzheavy"), (size(col("t")) / 4).cast("int")))).as("tok"))
      val agg = toks.agg(
        graft.functions.FreqItems.freqItems(col("tok"), 16).as("fi"),
        count(lit(1)).as("n"),
        sum(when(col("tok") === "zzheavy", 1L).otherwise(0L)).as("planted"))
      val top1 = element_at(col("fi"), 1)
      agg.select(top1.getField("item").as("top1_item"), col("planted"),
        (top1.getField("est") <= col("planted") &&
          top1.getField("est") >= col("planted") - col("n") * 2 / 17)
          .as("est_within_bound"))
    },

    // --- text analysis: token counting (whitespace + BPE-ish subword) ------
    QueryDef("q_text_token_count",
      """SELECT lang,
        |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS ws_tokens,
        |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS bpeish_tokens
        |FROM documents GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(sum(size(TextOps.tokens(col("text")))).cast("long").as("ws_tokens"),
          sum(size(TextOps.bpeishTokens(col("text")))).cast("long").as("bpeish_tokens"))
        .orderBy("lang")
    },

    // --- text analysis: LEARNED subword segmentation. Vocabulary = top-64
    // word prefixes (len 2-6) by occurrence, ties lexicographic; encoding
    // is greedy longest-prefix max-match with a 1-char fallback. The
    // oracle learns the identical vocabulary and replays the greedy loop
    // as a recursive CTE with a correlated longest-match subquery —
    // segmentation is pinned exactly, not statistically.
    QueryDef("q_text_subword",
      """WITH RECURSIVE toks AS (
        |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |pref AS (
        |  SELECT substring(t.w, 1, l) AS p
        |  FROM toks t, UNNEST(range(2, least(6, len(t.w)) + 1)) AS u(l)),
        |vocab AS (SELECT p FROM (SELECT p, COUNT(*) AS c FROM pref GROUP BY 1)
        |          ORDER BY c DESC, p LIMIT 64),
        |words AS (SELECT DISTINCT w FROM toks),
        |r(w, pos, n) AS (
        |  SELECT w, 1, 0 FROM words
        |  UNION ALL
        |  SELECT r.w, r.pos + COALESCE((SELECT MAX(len(v.p)) FROM vocab v
        |           WHERE v.p = substring(r.w, r.pos, len(v.p))), 1),
        |         r.n + 1
        |  FROM r WHERE r.pos <= len(r.w)),
        |pieces AS (SELECT w, n FROM r WHERE pos > len(w))
        |SELECT t.lang, CAST(SUM(p.n) AS BIGINT) AS subword_tokens
        |FROM toks t JOIN pieces p ON p.w = t.w
        |GROUP BY 1 ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
      graft.operators.Subword.subwordTokens(
          Tables.documents(s, d), "text", "lang", vocabSize = 64, maxLen = 6)
        .orderBy("lang")
    },

    // --- iterative BPE merge learning (Sennrich 2016) on a PLANTED
    // dictionary with a forced pair-count ordering — the merge SEQUENCE
    // is analytically determined (see SubwordSpec's derivation), so the
    // oracle is the expected table itself; the engine runs the real
    // distributed word count + merge loop end to end. qz x900, qzx x700,
    // vv x600, vvv x100 force (q,z) -> (v,v) -> (qz,x) -> (vv,v), then
    // early stop (no pairs left) despite nMerges = 6.
    QueryDef("q_text_bpe_merges",
      """SELECT * FROM (VALUES
        |  (1, 'q', 'z'), (2, 'v', 'v'), (3, 'qz', 'x'), (4, 'vv', 'v'))
        |AS t(mrank, l, r) ORDER BY mrank""".stripMargin) { (s, d) =>
      import s.implicits._
      val corpus = Seq(("qz", 900), ("qzx", 700), ("vv", 600), ("vvv", 100))
        .toDF("w", "n")
        .select(explode(sequence(lit(1), col("n"))).as("__i"), col("w"))
        .select(col("w").as("text"))
      graft.operators.Subword.learnBpeMerges(corpus, "text", nMerges = 6)
        .toDF("mrank", "l", "r").orderBy("mrank")
    },

    // --- BPE encode under the learned merges: per-group piece totals,
    // weighted by occurrence (encode runs once per DISTINCT word). All
    // four planted words end as ONE symbol under the four merges, so the
    // totals are the occurrence counts per family (A: 900+700,
    // B: 600+100).
    QueryDef("q_text_bpe_tokens",
      """SELECT * FROM (VALUES ('A', CAST(1600 AS BIGINT)),
        |  ('B', CAST(700 AS BIGINT)))
        |AS t(src, bpe_tokens) ORDER BY src""".stripMargin) { (s, d) =>
      import s.implicits._
      val corpus = Seq(("qz", 900), ("qzx", 700), ("vv", 600), ("vvv", 100))
        .toDF("w", "n")
        .select(explode(sequence(lit(1), col("n"))).as("__i"), col("w"))
        .select(col("w").as("text"))
        .withColumn("src",
          when(col("text").startsWith("q"), "A").otherwise("B"))
      graft.operators.Subword.bpeTokens(corpus, "text", "src", nMerges = 6)
        .toDF("src", "bpe_tokens").orderBy("src")
    },

    // --- tokenize → pack bridge (session 4): per-doc token counts under
    // the LEARNED subword vocabulary feed concat-and-chunk packing — the
    // text-to-training-sequences composition in one job (the count the
    // packer must use is the tokenizer's, not whitespace's). Oracle
    // chains the two verified replays: the recursive-CTE greedy
    // segmentation per doc, then the exclusive prefix sum at budget 128.
    QueryDef("q_pipeline_tokenize_pack",
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |pref AS (
        |  SELECT substring(t.w, 1, l) AS p
        |  FROM toks t, UNNEST(range(2, least(6, len(t.w)) + 1)) AS u(l)),
        |vocab AS (SELECT p FROM (SELECT p, COUNT(*) AS c FROM pref GROUP BY 1)
        |          ORDER BY c DESC, p LIMIT 64),
        |words AS (SELECT DISTINCT w FROM toks),
        |r(w, pos, n) AS (
        |  SELECT w, 1, 0 FROM words
        |  UNION ALL
        |  SELECT r.w, r.pos + COALESCE((SELECT MAX(len(v.p)) FROM vocab v
        |           WHERE v.p = substring(r.w, r.pos, len(v.p))), 1),
        |         r.n + 1
        |  FROM r WHERE r.pos <= len(r.w)),
        |pieces AS (SELECT w, n FROM r WHERE pos > len(w)),
        |st AS (SELECT t.doc_id, CAST(SUM(p.n) AS BIGINT) AS n
        |       FROM toks t JOIN pieces p ON p.w = t.w GROUP BY 1),
        |o AS (SELECT doc_id, n,
        |    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start
        |  FROM st)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, n AS n_tokens,
        |  start AS start_tok, start // 128 AS first_seq,
        |  CASE WHEN n > 0 THEN (start + n - 1) // 128
        |       ELSE start // 128 END AS last_seq
        |FROM o ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val st = graft.operators.Subword.subwordTokens(
        Tables.documents(s, d), "text", "doc_id", vocabSize = 64, maxLen = 6)
      graft.operators.Packing.packOffsets(st, "doc_id", "subword_tokens", 128)
        .orderBy("doc_id")
    },

    // --- tokenizer-coverage / OOV report (r10): per-language fallback rate
    // under the learned top-64 subword vocabulary — the vocabulary-fit
    // monitor. Same recursive-CTE greedy replay as q_text_subword, with a
    // fallback counter threaded through the recursion.
    QueryDef("q_text_oov_rate",
      """WITH RECURSIVE toks AS (
        |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |pref AS (
        |  SELECT substring(t.w, 1, l) AS p
        |  FROM toks t, UNNEST(range(2, least(6, len(t.w)) + 1)) AS u(l)),
        |vocab AS (SELECT p FROM (SELECT p, COUNT(*) AS c FROM pref GROUP BY 1)
        |          ORDER BY c DESC, p LIMIT 64),
        |words AS (SELECT DISTINCT w FROM toks),
        |r(w, pos, n, f) AS (
        |  SELECT w, 1, 0, 0 FROM words
        |  UNION ALL
        |  SELECT r.w, r.pos + COALESCE((SELECT MAX(len(v.p)) FROM vocab v
        |           WHERE v.p = substring(r.w, r.pos, len(v.p))), 1),
        |         r.n + 1,
        |         r.f + CASE WHEN (SELECT MAX(len(v.p)) FROM vocab v
        |           WHERE v.p = substring(r.w, r.pos, len(v.p))) IS NULL
        |           THEN 1 ELSE 0 END
        |  FROM r WHERE r.pos <= len(r.w)),
        |pieces AS (SELECT w, n, f FROM r WHERE pos > len(w))
        |SELECT t.lang, CAST(SUM(p.n) AS BIGINT) AS subword_tokens,
        |  CAST(SUM(p.f) AS BIGINT) AS fallback_pieces,
        |  ROUND(SUM(p.f) * 1.0 / SUM(p.n), 6) AS oov_rate
        |FROM toks t JOIN pieces p ON p.w = t.w
        |GROUP BY 1 ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
      graft.operators.Subword.oovReport(
          Tables.documents(s, d), "text", "lang", vocabSize = 64, maxLen = 6)
        .orderBy("lang")
    },

    // --- tokenizer fertility / compression per language: subword pieces
    // per whitespace word and UTF-8 bytes per subword token under the
    // learned top-64 vocabulary — the tokenizer-fit dashboard (fertility
    // spikes on a language mean the vocabulary fragments it; bytes per
    // token is what a token budget buys). Oracle: the q_text_subword
    // recursive-CTE replay null-safe-joined to the per-lang byte/word
    // counts.
    QueryDef("q_tokenizer_fertility",
      """WITH RECURSIVE toks AS (
        |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |pref AS (
        |  SELECT substring(t.w, 1, l) AS p
        |  FROM toks t, UNNEST(range(2, least(6, len(t.w)) + 1)) AS u(l)),
        |vocab AS (SELECT p FROM (SELECT p, COUNT(*) AS c FROM pref GROUP BY 1)
        |          ORDER BY c DESC, p LIMIT 64),
        |words AS (SELECT DISTINCT w FROM toks),
        |r(w, pos, n) AS (
        |  SELECT w, 1, 0 FROM words
        |  UNION ALL
        |  SELECT r.w, r.pos + COALESCE((SELECT MAX(len(v.p)) FROM vocab v
        |           WHERE v.p = substring(r.w, r.pos, len(v.p))), 1),
        |         r.n + 1
        |  FROM r WHERE r.pos <= len(r.w)),
        |pieces AS (SELECT w, n FROM r WHERE pos > len(w)),
        |sw AS (SELECT t.lang, CAST(SUM(p.n) AS BIGINT) AS subword_tokens
        |       FROM toks t JOIN pieces p ON p.w = t.w GROUP BY 1),
        |base AS (SELECT lang,
        |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS ws_tokens,
        |    CAST(SUM(strlen(text)) AS BIGINT) AS text_bytes
        |  FROM documents GROUP BY 1)
        |SELECT b.lang, b.ws_tokens, b.text_bytes, s.subword_tokens,
        |  CASE WHEN b.ws_tokens > 0
        |       THEN ROUND(s.subword_tokens * 1.0 / b.ws_tokens, 6) END AS fertility,
        |  CASE WHEN s.subword_tokens > 0
        |       THEN ROUND(b.text_bytes * 1.0 / s.subword_tokens, 6) END AS bytes_per_token
        |FROM base b LEFT JOIN sw s ON b.lang IS NOT DISTINCT FROM s.lang
        |ORDER BY b.lang NULLS FIRST""".stripMargin) { (s, d) =>
      graft.operators.Subword.fertilityReport(
          Tables.documents(s, d), "text", "lang", vocabSize = 64, maxLen = 6)
        .orderBy(asc_nulls_first("lang"))
    },

    // --- text analysis -------------------------------------------------------
    QueryDef("q_text_stats",
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 20
        |                 AND n_chars >= 100
        |                 AND n_chars <= len(string_split_regex(trim(text), '\s+')) * 10
        |            THEN 1 ELSE 0 END) AS BIGINT) AS quality_docs
        |FROM documents GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
      val toks = TextOps.tokens(col("text"))
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"),
          sum(size(toks)).cast("long").as("total_tokens"),
          sum(TextOps.qualityFlag(toks, col("n_chars"))).cast("long").as("quality_docs"))
        .orderBy("lang")
    },

    QueryDef("q_text_langid",
      """WITH scored AS (
        |  SELECT len(list_filter(string_split_regex(trim(text), '\s+'),
        |           t -> t IN ('the','a','of','and','to','in','is'))) AS en_s,
        |         len(list_filter(string_split_regex(trim(text), '\s+'),
        |           t -> t IN ('der','die','das','und','ist','ein'))) AS de_s,
        |         len(list_filter(string_split_regex(trim(text), '\s+'),
        |           t -> t IN ('el','la','de','y','es','un'))) AS es_s,
        |         len(list_filter(string_split_regex(trim(text), '\s+'),
        |           t -> t IN ('le','la','et','les','est','un'))) AS fr_s
        |  FROM documents)
        |SELECT CASE
        |  WHEN en_s > 0 AND en_s > de_s AND en_s > es_s AND en_s > fr_s THEN 'en'
        |  WHEN de_s > 0 AND de_s > en_s AND de_s > es_s AND de_s > fr_s THEN 'de'
        |  WHEN es_s > 0 AND es_s > en_s AND es_s > de_s AND es_s > fr_s THEN 'es'
        |  WHEN fr_s > 0 AND fr_s > en_s AND fr_s > de_s AND fr_s > es_s THEN 'fr'
        |  ELSE 'und' END AS predicted_lang,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM scored GROUP BY 1 ORDER BY predicted_lang NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(TextOps.predictLang(TextOps.tokens(col("text"))).as("predicted_lang"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("predicted_lang")
    },

    // --- char-n-gram langid (Cavnar–Trenkle rank profiles): the real
    // n-gram heuristic next to the stopword vote above. Integer-exact
    // (out-of-place rank distance), so the oracle replays the whole
    // method: trigram the normalized text, rank per-lang and per-doc
    // profiles, score |rank gaps| with a fixed miss penalty, argmin.
    // Output is the confusion matrix against the labeled lang column.
    QueryDef("q_text_langid_ngram",
      """WITH norm AS (
        |  SELECT doc_id, lang,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS s
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, lang, substring(s, CAST(i AS INT), 3) AS g
        |  FROM norm, UNNEST(range(1, len(s) - 1)) u(i)
        |  WHERE len(s) >= 3),
        |lp AS (
        |  SELECT lang, g,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, g) AS rl
        |  FROM grams WHERE lang IS NOT NULL GROUP BY lang, g
        |  QUALIFY rl <= 300),
        |dp AS (
        |  SELECT doc_id, g,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, g) AS rd
        |  FROM grams GROUP BY doc_id, g
        |  QUALIFY rd <= 50),
        |langs AS (SELECT DISTINCT lang FROM lp),
        |dist AS (
        |  SELECT dp.doc_id, l.lang AS cand,
        |    SUM(COALESCE(ABS(dp.rd - lp.rl), 300)) AS d
        |  FROM dp CROSS JOIN langs l
        |  LEFT JOIN lp ON lp.lang = l.lang AND lp.g = dp.g
        |  GROUP BY 1, 2),
        |pred AS (
        |  SELECT doc_id, cand,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d, cand) AS rn
        |  FROM dist QUALIFY rn = 1)
        |SELECT d.lang, COALESCE(p.cand, 'und') AS predicted_lang,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM documents d LEFT JOIN pred p USING (doc_id)
        |GROUP BY 1, 2
        |ORDER BY lang NULLS FIRST, predicted_lang""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val prof = graft.operators.LangId.profiles(docs, "text", "lang", k = 300)
      graft.operators.LangId
        .predict(docs, "doc_id", "text", prof, docK = 50, penalty = 300)
        .groupBy("lang", "predicted_lang")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "predicted_lang")
    },

    QueryDef("q_text_fingerprint",
      """SELECT lang, CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_fp,
        |  MIN(md5(text)) AS min_fp
        |FROM documents GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count_distinct(TextOps.fingerprintMd5(col("text"))).as("n_fp"),
          min(TextOps.fingerprintMd5(col("text"))).as("min_fp"))
        .orderBy("lang")
    },

    // rolling fingerprints are engine-specific 64-bit values, but their
    // CONTRACT is checkable: deterministic (equal texts hash equal) and
    // collision-free on this corpus — distinct fingerprints == distinct
    // texts per language; the oracle pins the distinct-text counts
    QueryDef("q_text_rolling_fingerprint",
      """SELECT lang, CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts,
        |  TRUE AS fp_bijective
        |FROM documents GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), col("text"),
          TextOps.fingerprintRolling(TextOps.tokens(col("text"))).as("fp"))
        .groupBy("lang")
        .agg(count_distinct(col("text")).as("n_distinct_texts"),
          (count_distinct(col("fp")) === count_distinct(col("text"))).as("fp_bijective"))
        .orderBy("lang")
    },

    // --- winnowing fingerprints (r10, Schleimer/Wilkerson/Aiken MOSS):
    // k=3 shingle hashes, window w=4, rightmost-min selection — any shared
    // token run >= w+k-1 guarantees a shared fingerprint. One map-side
    // fold per doc; the oracle replays hash, window min and the rightmost
    // tie rule exactly.
    QueryDef("q_text_winnow",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |              FROM documents WHERE doc_id < 20),
        |g AS (SELECT doc_id, list_transform(range(1, len(tk) - 1),
        |        i -> array_to_string(tk[i:i+2], ' ')) AS grams
        |      FROM toks WHERE len(tk) >= 3),
        |h AS (SELECT doc_id, list_transform(grams,
        |        g2 -> CAST(('0x' || substring(md5(g2), 1, 15)) AS BIGINT)) AS hs
        |      FROM g),
        |winpos AS (SELECT doc_id, hs, unnest(range(1, len(hs) - 2)) AS j
        |           FROM h WHERE len(hs) >= 4),
        |sel AS (SELECT doc_id,
        |    (j - 1) + (4 - list_position(list_reverse(hs[j:j+3]),
        |                                 list_min(hs[j:j+3]))) AS pos,
        |    list_min(hs[j:j+3]) AS fp
        |  FROM winpos)
        |SELECT DISTINCT doc_id, CAST(pos AS INT) AS pos, CAST(fp AS BIGINT) AS fp
        |FROM sel ORDER BY doc_id NULLS FIRST, pos NULLS FIRST""".stripMargin) { (s, d) =>
      graft.operators.Dedup.winnowFingerprints(
          Tables.documents(s, d).where(col("doc_id") < 20),
          "doc_id", "text", k = 3, w = 4)
        .orderBy("doc_id", "pos")
    },

    // --- winnowing clone pairs (r10): cross-document pairs sharing >= 3
    // fingerprint selections (MOSS's actual query) over planted mutated
    // copies; stopword-tier fingerprints (> 64 docs) dropped whole — the
    // minhash bucket-cap rule, replayed by the oracle's window count.
    QueryDef("q_winnow_pairs",
      """WITH input AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 150
        |  UNION ALL SELECT doc_id + 100000, text || ' zz yy xx'
        |  FROM documents WHERE doc_id < 150),
        |toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |         FROM input),
        |g AS (SELECT doc_id, list_transform(range(1, len(tk) - 1),
        |        i -> array_to_string(tk[i:i+2], ' ')) AS grams
        |      FROM toks WHERE len(tk) >= 3),
        |h AS (SELECT doc_id, list_transform(grams,
        |        g2 -> CAST(('0x' || substring(md5(g2), 1, 15)) AS BIGINT)) AS hs
        |      FROM g),
        |winpos AS (SELECT doc_id, hs, unnest(range(1, len(hs) - 2)) AS j
        |           FROM h WHERE len(hs) >= 4),
        |sel AS (SELECT DISTINCT doc_id, list_min(hs[j:j+3]) AS fp FROM winpos),
        |capped AS (SELECT doc_id, fp FROM (
        |    SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS n FROM sel)
        |  WHERE n <= 64),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
        |      FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
        |  CAST(shared AS BIGINT) AS shared
        |FROM p WHERE shared >= 3
        |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d).where(col("doc_id") < 150)
      val input = base.select("doc_id", "text").unionByName(
        base.select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zz yy xx")).as("text")))
      graft.operators.Dedup.winnowClonePairs(input, "doc_id", "text",
          k = 3, w = 4, minShared = 3, maxDocsPerFp = 64)
        .orderBy("a_id", "b_id")
    },

    // --- containment-scored near-dup pairs (session 4): asymmetric
    // |A∩B|/|A| over distinct 3-shingle sets — catches the planted
    // 25-token FRAGMENTS (doc_id+100000, a prefix quote of each long
    // doc) whose containment in their source is 1.0 while Jaccard stays
    // tiny. Engine keys shingles by hash60, oracle by content (the
    // q_dedup_spans hash-vs-string adjudication); candidate join is an
    // inverted index with the 64-doc stopword cap, so the verdict is
    // exact, not probabilistic.
    QueryDef("q_dedup_containment",
      """WITH input AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 150
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    array_to_string((string_split_regex(trim(text), '\s+'))[1:25], ' ')
        |  FROM documents WHERE doc_id < 150),
        |tk AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |       FROM input),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS g
        |       FROM tk, unnest(range(1, len(tk) - 1)) AS ui(i)),
        |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
        |capped AS (SELECT doc_id, g FROM (
        |    SELECT doc_id, g, COUNT(*) OVER (PARTITION BY g) AS n FROM sh)
        |  WHERE n <= 64),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |        CAST(COUNT(*) AS BIGINT) AS shared
        |      FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
        |  shared, ROUND(shared / sa.sz, 4) AS c_ab, ROUND(shared / sb.sz, 4) AS c_ba
        |FROM p JOIN sz sa ON sa.doc_id = p.a_id JOIN sz sb ON sb.doc_id = p.b_id
        |WHERE greatest(shared / sa.sz, shared / sb.sz) >= 0.8
        |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d).where(col("doc_id") < 150)
        .select("doc_id", "text")
      val input = base.unionByName(
        base.select((col("doc_id") + 100000).as("doc_id"),
          array_join(slice(TextOps.tokens(trim(col("text"))), 1, 25), " ")
            .as("text")))
      graft.operators.Dedup.containmentPairs(input, "doc_id", "text",
          k = 3, threshold = 0.8, maxDocsPerShingle = 64)
        .orderBy("a_id", "b_id")
    },

    // --- cross-split near-dup leakage (session 4): the eval-
    // contamination report — exact copies planted at doc_id+100000 split
    // INDEPENDENTLY of their originals (md5 of the id), so ~2·0.8·0.2 of
    // clone pairs must straddle train/test. Chains the two verified
    // replays (winnow selections + cap, md5-bucket split) end to end.
    QueryDef("q_split_leakage",
      """WITH input AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 200
        |  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 200),
        |toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |         FROM input),
        |g AS (SELECT doc_id, list_transform(range(1, len(tk) - 1),
        |        i -> array_to_string(tk[i:i+2], ' ')) AS grams
        |      FROM toks WHERE len(tk) >= 3),
        |h AS (SELECT doc_id, list_transform(grams,
        |        g2 -> CAST(('0x' || substring(md5(g2), 1, 15)) AS BIGINT)) AS hs
        |      FROM g),
        |winpos AS (SELECT doc_id, hs, unnest(range(1, len(hs) - 2)) AS j
        |           FROM h WHERE len(hs) >= 4),
        |sel AS (SELECT DISTINCT doc_id, list_min(hs[j:j+3]) AS fp FROM winpos),
        |capped AS (SELECT doc_id, fp FROM (
        |    SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS n FROM sel)
        |  WHERE n <= 64),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
        |      FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |lab AS (SELECT doc_id,
        |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
        |         THEN 'train' ELSE 'test' END AS sp FROM input)
        |SELECT least(la.sp, lb.sp) AS split_a, greatest(la.sp, lb.sp) AS split_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM p JOIN lab la ON la.doc_id = p.a_id JOIN lab lb ON lb.doc_id = p.b_id
        |WHERE shared >= 3
        |GROUP BY 1, 2 ORDER BY split_a NULLS FIRST, split_b NULLS FIRST"""
        .stripMargin) { (s, d) =>
      val base = Tables.documents(s, d).where(col("doc_id") < 200)
        .select("doc_id", "text")
      val input = base.unionByName(
        base.withColumn("doc_id", col("doc_id") + 100000))
      val labeled = graft.operators.Sampling.groupSplit(input, col("doc_id"),
        Seq("train" -> 0.8, "test" -> 0.2))
      graft.operators.Dedup.splitLeakage(labeled, "doc_id", "text", "split",
          k = 3, w = 4, minShared = 3, maxDocsPerFp = 64)
        .orderBy("split_a", "split_b")
    },

    // --- session-3 composition (r10): classifier gate -> winnow clone-pair
    // dedup (drop b-sides) -> per-source token-budget mix, ONE job. The
    // oracle chains the three verified replays (classifier weights, winnow
    // selections + cap, budget rates) end to end.
    QueryDef("q_pipeline_classify_dedup_mix",
      """WITH toksq AS (SELECT doc_id, source,
        |    string_split_regex(trim(lower(text)), '\s+') AS tk FROM documents),
        |feats AS (SELECT doc_id, unnest(list_concat(tk,
        |    list_transform(range(1, len(tk)),
        |      i -> array_to_string(tk[i:i+1], ' ')))) AS f FROM toksq),
        |wt AS (SELECT doc_id,
        |    ((CAST(('0x' || substring(md5(f), 1, 15)) AS BIGINT) % 262144) + 7)
        |      * 2654435761 % 2001 - 1000 AS wm FROM feats),
        |agg AS (SELECT doc_id, COUNT(*) AS n, SUM(wm) AS s FROM wt GROUP BY 1),
        |kept AS (SELECT t.doc_id, t.source, t.tk FROM toksq t
        |         JOIN agg ON t.doc_id = agg.doc_id
        |         WHERE ROUND(1.0 / (1.0 + exp(-(s / (n * 1000.0)))), 4) >= 0.5),
        |g AS (SELECT doc_id, list_transform(range(1, len(tk) - 1),
        |        i -> array_to_string(tk[i:i+2], ' ')) AS grams
        |      FROM kept WHERE len(tk) >= 3),
        |h AS (SELECT doc_id, list_transform(grams,
        |        g2 -> CAST(('0x' || substring(md5(g2), 1, 15)) AS BIGINT)) AS hs
        |      FROM g),
        |winpos AS (SELECT doc_id, hs, unnest(range(1, len(hs) - 2)) AS j
        |           FROM h WHERE len(hs) >= 4),
        |sel AS (SELECT DISTINCT doc_id, list_min(hs[j:j+3]) AS fp FROM winpos),
        |capped AS (SELECT doc_id, fp FROM (
        |    SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS cnum FROM sel)
        |  WHERE cnum <= 64),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
        |      FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |losers AS (SELECT DISTINCT b_id AS doc_id FROM p WHERE shared >= 3),
        |ded AS (SELECT k.doc_id, k.source, CAST(len(k.tk) AS BIGINT) AS n
        |        FROM kept k
        |        WHERE k.doc_id NOT IN (SELECT doc_id FROM losers)),
        |tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS actual
        |        FROM ded GROUP BY source),
        |r AS (SELECT source, CASE WHEN actual <= 400 THEN CAST(65536 AS BIGINT)
        |        ELSE CAST(26214400 // actual AS BIGINT) END AS rate16 FROM tot)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS kept_docs,
        |  CAST(SUM(n) AS BIGINT) AS kept_tokens
        |FROM ded JOIN r USING (source)
        |WHERE rate16 >= 65536
        |   OR substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |      < lpad(lower(to_hex(rate16)), 4, '0')
        |GROUP BY source ORDER BY source NULLS FIRST""".stripMargin) { (s, d) =>
      // one staged job (see Pipeline.classifyDedupMix for the measured
      // perf shape: single tokenization, scored frame persisted
      // UNFILTERED so the md5 fold stays above the exchange); the
      // operator returns the per-doc mix manifest, the gate aggregates
      graft.operators.Pipeline.classifyDedupMix(
          Tables.documents(s, d), "doc_id", "text", "source",
          budgetTokens = 400L, minShared = 3)
        .groupBy("source")
        .agg(count(lit(1)).as("kept_docs"),
          sum("n_tokens").cast("long").as("kept_tokens"))
        .orderBy("source")
    },

    // --- multimodal plumbing -------------------------------------------------
    QueryDef("q_multimodal_meta",
      """SELECT ascii(substring(text, 1, 1)) AS magic,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY magic NULLS FIRST""".stripMargin) { (s, d) =>
      Multimodal.withPayload(Tables.documents(s, d), "doc_id", "text")
        .groupBy(col("magic"))
        .agg(count(lit(1)).as("cnt"), sum("byte_len").cast("long").as("total_bytes"))
        .orderBy("magic")
    },

    // resize: REAL codec round trip — synth PNGs (dims/seed SQL-derived
    // from doc_id), nearest-neighbor resample to 24×24, re-encode as PNG,
    // then DECODE THE RESIZED BYTES and emit their actual dimensions and
    // top-left pixel. out(0,0) samples src(0,0) = seed, so the oracle pins
    // real decoded pixel values through resize + re-encode, not stub
    // constants.
    QueryDef("q_multimodal_resize",
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(24 AS INT) AS width, CAST(24 AS INT) AS height,
        |  CAST(doc_id % 251 AS INT) AS top_left
        |FROM documents WHERE doc_id < 100
        |ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val payloads = Multimodal.withImagePayload(
        Tables.documents(s, d).where(col("doc_id") < 100), "doc_id")
      val resized = Multimodal.resizeImages(s, payloads, "doc_id", 24, 24)
      Multimodal.decodeImages(s, resized.toDF(), "doc_id")
        .select(col("doc_id"), col("width"), col("height"), col("top_left"))
        .orderBy("doc_id")
    },

    // frame sampling: n deterministic byte-slice "frames" per payload; the
    // slice boundaries are SQL-expressible, so the fan-out plumbing gets a
    // full cross-engine oracle (per-doc frame count + total frame bytes)
    QueryDef("q_multimodal_frames",
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(4 AS BIGINT) AS n_frames,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS frame_bytes_total
        |FROM documents WHERE doc_id < 30 ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val payloads = Multimodal.withPayload(
        Tables.documents(s, d).where(col("doc_id") < 30), "doc_id", "text")
      Multimodal.sampleFrames(s, payloads, "doc_id", 4)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame_bytes"))).cast("long").as("frame_bytes_total"))
        .orderBy("doc_id")
    },

    // REAL multi-frame extraction: each row carries an actual animated GIF
    // (frame count + geometry + pixel function SQL-derived from doc_id);
    // the engine decodes 4 evenly spaced frames (index k·F/4) through
    // javax.imageio and emits codec-reported geometry + top-left pixel —
    // the oracle replays the sampling arithmetic and pins the decoded
    // values cross-engine.
    QueryDef("q_multimodal_gif_frames",
      """SELECT CAST(d.doc_id AS BIGINT) AS doc_id, CAST(k.k AS INT) AS frame_idx,
        |  CAST(16 + d.doc_id % 16 AS INT) AS width,
        |  CAST(16 + (d.doc_id * 3) % 16 AS INT) AS height,
        |  CAST((d.doc_id % 251 + ((k.k * (4 + d.doc_id % 5)) // 4) * 17) % 256 AS INT)
        |    AS top_left
        |FROM documents d CROSS JOIN (VALUES (0),(1),(2),(3)) k(k)
        |WHERE d.doc_id < 60
        |ORDER BY doc_id NULLS FIRST, frame_idx NULLS FIRST""".stripMargin) { (s, d) =>
      val payloads = Multimodal.withGifPayload(
        Tables.documents(s, d).where(col("doc_id") < 60), "doc_id")
      Multimodal.decodeFrames(s, payloads, "doc_id", 4)
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
          col("top_left"))
        .orderBy("doc_id", "frame_idx")
    },

    // REAL video-frame extraction: each row carries an actual MJPEG clip
    // (concatenated baseline JPEGs; frame count / geometry / flat-gray
    // pixel value SQL-derived from doc_id). The engine SOI-splits the
    // stream, decodes 2 evenly spaced frames (index k·F/2) through
    // javax.imageio and emits codec-reported geometry + top-left pixel —
    // exact cross-engine because a flat frame at quality 1.0 is DC-only
    // over an all-ones quantization table (MultimodalSpec pins all 256
    // gray values round-trip).
    QueryDef("q_multimodal_video_frames",
      """SELECT CAST(d.doc_id AS BIGINT) AS doc_id, CAST(k.k AS INT) AS frame_idx,
        |  CAST(16 + d.doc_id % 16 AS INT) AS width,
        |  CAST(16 + (d.doc_id * 3) % 16 AS INT) AS height,
        |  CAST((d.doc_id % 251 + ((k.k * (4 + d.doc_id % 5)) // 2) * 17) % 256 AS INT)
        |    AS top_left
        |FROM documents d CROSS JOIN (VALUES (0),(1)) k(k)
        |WHERE d.doc_id < 60
        |ORDER BY doc_id NULLS FIRST, frame_idx NULLS FIRST""".stripMargin) { (s, d) =>
      val payloads = Multimodal.withMjpegPayload(
        Tables.documents(s, d).where(col("doc_id") < 60), "doc_id")
      Multimodal.decodeVideoFrames(s, payloads, "doc_id", 2)
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
          col("top_left"))
        .orderBy("doc_id", "frame_idx")
    },

    // REAL audio decode: each row carries an actual WAV container
    // (synthWav's pure-integer sawtooth, frames/freq SQL-derived from
    // doc_id); the engine re-parses header + PCM frames through
    // javax.sound.sampled and emits codec-reported format fields plus
    // peak / sum-of-squares — the oracle replays the integer sample
    // function exactly, so real decoded amplitudes pin cross-engine.
    QueryDef("q_multimodal_audio",
      """WITH p AS (
        |  SELECT doc_id, 200 + (doc_id % 100) * 4 AS frames,
        |         100 + doc_id % 400 AS freq
        |  FROM documents WHERE doc_id < 40),
        |s AS (SELECT doc_id, frames, freq, unnest(range(0, frames)) AS n FROM p),
        |v AS (SELECT doc_id, frames, ((n * freq) % 8000) * 8 - 32000 AS val FROM s)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(8000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels, CAST(16 AS INT) AS bits,
        |  CAST(frames AS BIGINT) AS n_frames,
        |  CAST(MAX(ABS(val)) AS INT) AS peak,
        |  CAST(SUM(val * val) AS BIGINT) AS sum_sq
        |FROM v GROUP BY doc_id, frames
        |ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val payloads = Multimodal.withWavPayload(
        Tables.documents(s, d).where(col("doc_id") < 40), "doc_id")
      Multimodal.decodeAudio(s, payloads, "doc_id")
        .select(col("doc_id"), col("sample_rate"), col("channels"), col("bits"),
          col("n_frames"), col("peak"), col("sum_sq"))
        .orderBy("doc_id")
    },

    // --- end-to-end curation pipeline: exact dedup → minhash near-dup →
    // CC keep-min → decontam → token-budget mix → sequence packing, as ONE
    // job. The oracle recomputes EVERY stage exactly — including the
    // near-dup components, via exact 3-shingle jaccard + a recursive-CTE
    // transitive closure. That is sound on this corpus because the
    // engine's minhash+banding pair set at the 0.35 threshold EQUALS the
    // exact-jaccard pair set — a fixture property (the corpus keeps clear
    // of the estimate boundary; measured at sf0.01: organic pairs <= 0.103
    // or >= 0.666) that q_pipeline_oracle_guard CHECKS cross-engine every
    // round instead of assuming: a regenerated fixture that breaks the
    // equality fails the guard gate loudly by name. Planted signal: exact
    // copies (+100000) must die in stage 1, mutated copies (+200000) in
    // stage 2 — the output's doc_id range pins both.
    QueryDef("q_pipeline_e2e",
      """WITH RECURSIVE input AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL SELECT doc_id + 100000, text, source FROM documents
        |  UNION ALL SELECT doc_id + 200000, text || ' zz yy xx', source FROM documents),
        |s1 AS (
        |  SELECT i.* FROM input i
        |  JOIN (SELECT text, MIN(doc_id) AS doc_id FROM input GROUP BY text) k
        |    ON i.doc_id = k.doc_id),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ts)-1),
        |    i -> array_to_string(ts[i:i+2], ' ')))) AS g
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM s1)
        |  WHERE len(ts) >= 3),
        |szs AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |e0 AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |edges AS (
        |  SELECT a, b FROM e0
        |  JOIN szs sa ON sa.doc_id = e0.a JOIN szs sb ON sb.doc_id = e0.b
        |  WHERE 100 * e0.i >= 35 * (sa.n + sb.n - e0.i)),
        |bidir AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
        |reach(a, b) AS (
        |  SELECT a, b FROM bidir
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN bidir e ON r.b = e.a),
        |reps AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS rep FROM reach GROUP BY a),
        |s2 AS (
        |  SELECT s1.* FROM s1 LEFT JOIN reps USING (doc_id)
        |  WHERE rep IS NULL OR rep = doc_id),
        |bg AS (
        |  SELECT DISTINCT unnest(list_transform(range(1, len(ts)-7),
        |    i -> array_to_string(ts[i:i+7], ' '))) AS g
        |  FROM (SELECT string_split_regex(trim(text), '\s+') AS ts
        |        FROM documents WHERE doc_id < 5)
        |  WHERE len(ts) >= 8),
        |g8 AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ts)-7),
        |    i -> array_to_string(ts[i:i+7], ' ')))) AS g
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM s2)
        |  WHERE len(ts) >= 8),
        |contam AS (SELECT DISTINCT g8.doc_id FROM g8 JOIN bg USING (g)),
        |s3 AS (
        |  SELECT s2.*, CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        |  FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
        |tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS actual FROM s3 GROUP BY source),
        |r16 AS (SELECT source, CASE WHEN actual <= 1000 THEN CAST(65536 AS BIGINT)
        |         ELSE CAST(65536000 // actual AS BIGINT) END AS rate16 FROM tot),
        |s4 AS (
        |  SELECT s3.* FROM s3 JOIN r16 USING (source)
        |  WHERE rate16 >= 65536
        |     OR substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < lpad(lower(to_hex(rate16)), 4, '0')),
        |p AS (
        |  SELECT doc_id, source, n,
        |    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
        |  FROM s4)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, source, n AS n_tokens,
        |  start AS start_tok, start // 128 AS first_seq,
        |  CASE WHEN n > 0 THEN (start + n - 1) // 128 ELSE start // 128 END AS last_seq
        |FROM p ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text", "source")
      val input = docs
        .unionByName(docs.withColumn("doc_id", col("doc_id") + 100000))
        .unionByName(docs.withColumn("doc_id", col("doc_id") + 200000)
          .withColumn("text", concat(col("text"), lit(" zz yy xx"))))
      graft.operators.Pipeline.curate(input, "doc_id", "text", "source",
          minhashThreshold = 0.35,
          decontamBenchmark = docs.where(col("doc_id") < 5),
          decontamN = 8, budgetTokens = 1000L, packBudget = 128)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("start_tok"), col("first_seq"), col("last_seq"))
        .orderBy("doc_id")
    },

    // --- incremental dedup: the last 50 documents play a "daily delta"
    // against the rest of the corpus, plus planted exact copies (+100000,
    // must die in the exact stage) and mutated copies (+200000, must die
    // in the near-dup stage). The oracle recomputes both stages exactly —
    // text anti-join, then exact 3-shingle jaccard between batch survivors
    // and the corpus at the 0.35 threshold. Sound on this corpus for the
    // same reason as q_pipeline_e2e's oracle (the jaccard gap), which
    // q_pipeline_oracle_guard checks cross-engine every round.
    // --- bloom pre-filtered incremental dedup: the corpus key set rides
    // a constant-size Bloom filter instead of an exact broadcast (the
    // both-sides-huge shape). Output is EXACTLY the anti-join — false
    // positives are verified away — so the oracle needs no bloom replay.
    QueryDef("q_dedup_bloom_incremental",
      """WITH cutv AS (SELECT MAX(doc_id) - 49 AS cut FROM documents),
        |corpus AS (SELECT doc_id, text FROM documents
        |           WHERE doc_id < (SELECT cut FROM cutv)),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= (SELECT cut FROM cutv)
        |  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 10)
        |SELECT CAST(b.doc_id AS BIGINT) AS doc_id FROM batch b
        |WHERE b.text NOT IN (SELECT text FROM corpus)
        |ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val cut = docs.agg(max("doc_id")).head().getLong(0) - 49
      val corpus = docs.where(col("doc_id") < cut)
      val batch = docs.where(col("doc_id") >= cut).unionByName(
        docs.where(col("doc_id") < 10)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      Dedup.bloomDedupAgainst(batch, corpus, Seq("text"), mBits = 1 << 17)
        .select("doc_id").orderBy("doc_id")
    },

    QueryDef("q_dedup_incremental",
      """WITH cutv AS (SELECT MAX(doc_id) - 49 AS cut FROM documents),
        |corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < (SELECT cut FROM cutv)),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= (SELECT cut FROM cutv)
        |  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 10
        |  UNION ALL SELECT doc_id + 200000, text || ' zz yy xx' FROM documents WHERE doc_id < 20),
        |ex AS (SELECT b.doc_id, b.text FROM batch b
        |       WHERE b.text NOT IN (SELECT text FROM corpus)),
        |shb AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ts)-1),
        |          i -> array_to_string(ts[i:i+2], ' ')))) AS g
        |        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM ex)
        |        WHERE len(ts) >= 3),
        |shc AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ts)-1),
        |          i -> array_to_string(ts[i:i+2], ' ')))) AS g
        |        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM corpus)
        |        WHERE len(ts) >= 3),
        |szb AS (SELECT doc_id, COUNT(*) AS n FROM shb GROUP BY doc_id),
        |szc AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
        |e0 AS (SELECT b.doc_id AS bid, c.doc_id AS cid, COUNT(*) AS i
        |       FROM shb b JOIN shc c ON b.g = c.g GROUP BY 1, 2),
        |hits AS (SELECT DISTINCT bid FROM e0
        |         JOIN szb ON szb.doc_id = e0.bid JOIN szc ON szc.doc_id = e0.cid
        |         WHERE 100 * e0.i >= 35 * (szb.n + szc.n - e0.i))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ex
        |WHERE doc_id NOT IN (SELECT bid FROM hits)
        |ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val cut = docs.agg(max("doc_id")).head.getLong(0) - 49L
      val corpus = docs.where(col("doc_id") < cut)
      val batch = docs.where(col("doc_id") >= cut)
        .unionByName(docs.where(col("doc_id") < 10)
          .withColumn("doc_id", col("doc_id") + 100000))
        .unionByName(docs.where(col("doc_id") < 20)
          .withColumn("doc_id", col("doc_id") + 200000)
          .withColumn("text", concat(col("text"), lit(" zz yy xx"))))
      Dedup.incrementalDedup(batch, corpus, "doc_id", "text", threshold = 0.35)
        .select(col("doc_id").cast("long").as("doc_id"))
        .orderBy("doc_id")
    },

    // --- quality-aware canonical selection: every original near-dups its
    // longer mutated copy, so "keep best by length" must pick the MUTATED
    // side of each cluster (where keep-min would pick the original) and
    // merge organic near-dup clusters on the way. Oracle recomputes the
    // exact-jaccard closure (same fragment as q_pipeline_e2e, same guard)
    // and the per-cluster arg-max.
    QueryDef("q_dedup_keep_best",
      """WITH RECURSIVE input AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 200000, text || ' zz yy xx' FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ts)-1),
        |        i -> array_to_string(ts[i:i+2], ' ')))) AS g
        |       FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM input)
        |       WHERE len(ts) >= 3),
        |szs AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |e0 AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
        |       FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |edges AS (SELECT a, b FROM e0
        |          JOIN szs sa ON sa.doc_id = e0.a JOIN szs sb ON sb.doc_id = e0.b
        |          WHERE 100 * e0.i >= 35 * (sa.n + sb.n - e0.i)),
        |bidir AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
        |reach(a, b) AS (SELECT a, b FROM bidir
        |  UNION SELECT r.a, e.b FROM reach r JOIN bidir e ON r.b = e.a),
        |grp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS grp FROM reach GROUP BY a),
        |m AS (SELECT i.doc_id, length(i.text) AS score, COALESCE(g.grp, i.doc_id) AS grp
        |      FROM input i LEFT JOIN grp g USING (doc_id)),
        |r AS (SELECT doc_id, grp, row_number() OVER (PARTITION BY grp ORDER BY score DESC, doc_id) AS rn FROM m)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id FROM r WHERE rn = 1
        |ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val input = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + 200000)
          .withColumn("text", concat(col("text"), lit(" zz yy xx"))))
      Dedup.keepBestNearDups(input, "doc_id", "text",
          length(col("text")), threshold = 0.35)
        .select(col("doc_id").cast("long").as("doc_id"))
        .orderBy("doc_id")
    },

    // --- pipeline-oracle soundness guard. q_pipeline_e2e's exact oracle
    // (recursive-CTE closure over exact-jaccard edges) equals the engine
    // ONLY while minhash estimation agrees with exact 3-shingle jaccard
    // about which pairs cross the 0.35 threshold — a property of the
    // FIXTURE's pairwise distribution (the sf0.01 corpus keeps clear of
    // the boundary: nothing in (0.103, 0.666)). This gate checks that
    // precondition DIRECTLY: the engine's est_jaccard >= 0.35 pair set
    // must EQUAL the exact-jaccard pair set (integer inequality, same
    // definition as the oracle's edges CTE) — edge-set equality is
    // strictly stronger than the component equality the pipeline oracle
    // needs, so a regenerated fixture that lands a pair on the wrong
    // side of an estimate fails THIS gate loudly by name instead of
    // silently flaking q_pipeline_e2e.
    // The engine side blocks with the audit's 32-band×2-row pass, NOT the
    // production 16×4 banding: the production blocking has a real recall
    // gap at the flag boundary (two sf0.1 pairs agreeing on 40/64
    // positions miss all 16 four-row bands — (1018,201083) J=11/15 and
    // (4599,203436) J=9/13; those misses are absorbed by component
    // transitivity in every pipeline gate, so e2e stays exact), and a
    // banding-recall flake here would misreport the est/exact property
    // this guard exists to pin. The oracle recomputes the exact-jaccard
    // pair set in DuckDB, so the driver's row-hash compare IS the
    // edge-set equality check and the bench never pays for an all-pairs
    // exact join.
    QueryDef("q_pipeline_oracle_guard",
      """WITH input AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 200000, text || ' zz yy xx' FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ts)-1),
        |    i -> array_to_string(ts[i:i+2], ' ')))) AS g
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM input)
        |  WHERE len(ts) >= 3),
        |szs AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |e0 AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT CAST(a AS BIGINT) AS a_id, CAST(b AS BIGINT) AS b_id
        |FROM e0
        |JOIN szs sa ON sa.doc_id = e0.a JOIN szs sb ON sb.doc_id = e0.b
        |WHERE 100 * e0.i >= 35 * (sa.n + sb.n - e0.i)
        |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val input = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + 200000)
          .withColumn("text", concat(col("text"), lit(" zz yy xx"))))
      Dedup.minhashNearDups(input, "doc_id", "text", 0.35, rowsPerBand = 2)
        .select("a_id", "b_id")
        .orderBy("a_id", "b_id")
    },

    // --- dataset-card report: per-source release-note statistics from
    // ONE corpus scan (the two exact count-distincts ride Catalyst's
    // expand rewrite inside the same aggregation).
    QueryDef("q_corpus_report",
      """SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(SUM(CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 20
        |                 AND length(text) >= 100
        |                 AND length(text) <= len(string_split_regex(trim(text), '\s+')) * 10
        |            THEN 1 ELSE 0 END) AS BIGINT) AS quality_docs,
        |  CAST(SUM(CASE WHEN
        |      len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    + len(regexp_extract_all(text, '\+?[0-9]+-[0-9]{3}-[0-9]{3}-[0-9]{4}')) > 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS pii_docs
        |FROM documents GROUP BY source ORDER BY source NULLS FIRST""".stripMargin) { (s, d) =>
      graft.operators.Pipeline.corpusReport(
          Tables.documents(s, d), "text", "source", "lang")
        .orderBy("source")
    },

    // --- per-source token-distribution KL divergence from the corpus
    // (r10): the mixture-drift monitor. Counts are exact integers; the
    // probability ratios divide identically in both engines; round(4)
    // absorbs summation order.
    QueryDef("q_source_kl",
      """WITH t AS (SELECT source,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM documents),
        |sw AS (SELECT source, w, COUNT(*) AS csw FROM t GROUP BY 1, 2),
        |st AS (SELECT source, SUM(csw) AS ns, COUNT(*) AS nv FROM sw GROUP BY 1),
        |ct AS (SELECT w, SUM(csw) AS cw FROM sw GROUP BY 1),
        |tot AS (SELECT SUM(csw) AS n FROM sw)
        |SELECT source, CAST(ns AS BIGINT) AS n_tokens,
        |  CAST(nv AS BIGINT) AS n_vocab,
        |  ROUND(SUM((csw * 1.0 / ns) * ln((csw * 1.0 / ns) / (cw * 1.0 / n))), 4)
        |    AS kl
        |FROM sw JOIN st USING (source) JOIN ct USING (w) CROSS JOIN tot
        |GROUP BY 1, 2, 3
        |ORDER BY source NULLS FIRST""".stripMargin) { (s, d) =>
      graft.operators.Pipeline.sourceDivergence(
          Tables.documents(s, d), "source", "text")
        .orderBy("source")
    },

    // --- minhash precision audit: flagged pairs re-scored with exact
    // 2-shingle jaccard, histogrammed by integer decile. The oracle
    // computes the exact >= 0.35 pair set (the banding == exact equality
    // that q_pipeline_oracle_guard pins loudly every round) and replays
    // the same integer bucket arithmetic.
    QueryDef("q_dedup_minhash_audit",
      """WITH input AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 200000, text || ' zz yy xx' FROM documents),
        |shg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ts)-1),
        |    i -> array_to_string(ts[i:i+2], ' '))) AS g
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM input)
        |  WHERE len(ts) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) AS h
        |  FROM shg),
        |szs AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |e0 AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |flagged AS (
        |  SELECT e0.i, sa.n AS na, sb.n AS nb
        |  FROM e0 JOIN szs sa ON sa.doc_id = e0.a JOIN szs sb ON sb.doc_id = e0.b
        |  WHERE 100 * e0.i >= 35 * (sa.n + sb.n - e0.i))
        |SELECT CAST((10 * i) // (na + nb - i) AS INT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM flagged GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val input = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + 200000)
          .withColumn("text", concat(col("text"), lit(" zz yy xx"))))
      Dedup.minhashPrecisionAudit(input, "doc_id", "text", 0.35)
        .orderBy("bucket")
    },

    // --- audio fingerprint: REAL WAV decode → 65-window energy profile
    // → 64 difference bits as four 16-bit bands (dHash's acoustic
    // sibling). The sawtooth sample law is pure-integer, so the oracle
    // replays every window energy and every bit through the actual
    // codec round trip.
    QueryDef("q_multimodal_audio_print",
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        |p AS (SELECT doc_id, 200 + (doc_id % 100) * 4 AS frames,
        |        100 + doc_id % 400 AS freq FROM ids),
        |s AS (SELECT doc_id, frames, n.n,
        |        abs(((n.n * freq) % 8000) * 8 - 32000) AS a
        |      FROM p, UNNEST(range(0, frames)) n(n)),
        |e AS (SELECT doc_id, CAST((n * 65) // frames AS INT) AS w, SUM(a) AS en
        |      FROM s GROUP BY 1, 2),
        |bits AS (SELECT a.doc_id, a.w AS w,
        |           CASE WHEN b.en > a.en THEN 1 ELSE 0 END AS bit
        |         FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.w = a.w + 1
        |         WHERE a.w < 64),
        |bands AS (SELECT doc_id, w // 16 AS band,
        |            SUM(bit * (1 << (w % 16))) AS v
        |          FROM bits GROUP BY 1, 2)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(MAX(CASE WHEN band = 0 THEN v END) AS INT) AS b0,
        |  CAST(MAX(CASE WHEN band = 1 THEN v END) AS INT) AS b1,
        |  CAST(MAX(CASE WHEN band = 2 THEN v END) AS INT) AS b2,
        |  CAST(MAX(CASE WHEN band = 3 THEN v END) AS INT) AS b3
        |FROM bands GROUP BY doc_id ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      Multimodal.audioFingerprint(s,
          Multimodal.withWavPayload(
            Tables.documents(s, d).where(col("doc_id") < 200), "doc_id"),
          "doc_id")
        .toDF()
        .orderBy("doc_id")
    },

    // --- perceptual image hash (dHash): REAL codec decode → 9×8
    // nearest-neighbor luminance grid → 64 difference bits as four
    // 16-bit bands. The synthetic pixel law is integer-SQL-expressible,
    // so the oracle replays every band bit-for-bit through the actual
    // PNG round trip.
    QueryDef("q_multimodal_dhash",
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        |g AS (SELECT doc_id, r.r, c.c,
        |        16 + doc_id % 32 AS w, 16 + (doc_id*7) % 32 AS h,
        |        doc_id % 251 AS seed,
        |        33 + doc_id % 7 AS xs, 17 + doc_id % 5 AS ys
        |      FROM ids, UNNEST(range(0, 8)) r(r), UNNEST(range(0, 8)) c(c)),
        |bits AS (SELECT doc_id, r, c,
        |  CASE WHEN ((((c+1)*w)//9*xs + (r*h)//8*ys + seed) % 256) >
        |            (((c*w)//9*xs + (r*h)//8*ys + seed) % 256) THEN 1 ELSE 0 END AS bit
        |  FROM g),
        |bands AS (SELECT doc_id, (r*8+c)//16 AS band,
        |            SUM(bit * (1 << ((r*8+c) % 16))) AS v
        |          FROM bits GROUP BY 1, 2)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(MAX(CASE WHEN band = 0 THEN v END) AS INT) AS b0,
        |  CAST(MAX(CASE WHEN band = 1 THEN v END) AS INT) AS b1,
        |  CAST(MAX(CASE WHEN band = 2 THEN v END) AS INT) AS b2,
        |  CAST(MAX(CASE WHEN band = 3 THEN v END) AS INT) AS b3
        |FROM bands GROUP BY doc_id ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val gen = udf { (id: Long) =>
        Multimodal.synthTexturedPng(16 + (id % 32).toInt, 16 + (id * 7 % 32).toInt,
          (id % 251).toInt, 33 + (id % 7).toInt, 17 + (id % 5).toInt)
      }
      Multimodal.dHash(s,
          Tables.documents(s, d).where(col("doc_id") < 200)
            .select(col("doc_id")).withColumn("payload", gen(col("doc_id"))),
          "doc_id")
        .toDF()
        .orderBy("doc_id")
    },

    // --- image near-dup via banded dHash: planted copies at id+100000
    // carry the same dimensions with seed+1 (the gradient wraps shift by
    // one sample → a few bits flip), candidates share a 16-bit band,
    // exact hamming verified per band. Everything — pixel law, bands,
    // banding candidates, hamming — replays in integer SQL.
    QueryDef("q_multimodal_image_neardup",
      """WITH base AS (SELECT doc_id FROM documents WHERE doc_id < 150),
        |ents AS (SELECT doc_id AS eid, doc_id AS bid, 0 AS sh FROM base
        |         UNION ALL
        |         SELECT doc_id + 100000, doc_id, 1 FROM base),
        |g AS (SELECT eid, r.r, c.c,
        |        16 + bid % 32 AS w, 16 + (bid*7) % 32 AS h,
        |        bid % 251 + sh AS seed,
        |        33 + bid % 7 AS xs, 17 + bid % 5 AS ys
        |      FROM ents, UNNEST(range(0, 8)) r(r), UNNEST(range(0, 8)) c(c)),
        |bits AS (SELECT eid, r, c,
        |  CASE WHEN ((((c+1)*w)//9*xs + (r*h)//8*ys + seed) % 256) >
        |            (((c*w)//9*xs + (r*h)//8*ys + seed) % 256) THEN 1 ELSE 0 END AS bit
        |  FROM g),
        |bands AS (SELECT eid, (r*8+c)//16 AS band,
        |            CAST(SUM(bit * (1 << ((r*8+c) % 16))) AS INT) AS v
        |          FROM bits GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.eid AS a_id, b.eid AS b_id
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.v = b.v AND a.eid < b.eid),
        |ham AS (SELECT c.a_id, c.b_id,
        |          CAST(SUM(bit_count(xor(ba.v, bb.v))) AS INT) AS hamming
        |        FROM cand c
        |        JOIN bands ba ON ba.eid = c.a_id
        |        JOIN bands bb ON bb.eid = c.b_id AND bb.band = ba.band
        |        GROUP BY 1, 2)
        |SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id, hamming
        |FROM ham WHERE hamming <= 16
        |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d).where(col("doc_id") < 150)
        .select(col("doc_id"))
      val both = base.unionByName(
        base.select((col("doc_id") + 100000).as("doc_id")))
      val gen = udf { (id: Long) =>
        val b = id % 100000
        val sh = if (id >= 100000) 1 else 0
        Multimodal.synthTexturedPng(16 + (b % 32).toInt, 16 + (b * 7 % 32).toInt,
          (b % 251).toInt + sh, 33 + (b % 7).toInt, 17 + (b % 5).toInt)
      }
      Multimodal.nearDupImages(s,
          both.withColumn("payload", gen(col("doc_id"))), "doc_id",
          maxHamming = 16)
        .orderBy("a_id", "b_id")
    },

    // decode is REAL (javax.imageio PNG): each row carries an actual PNG
    // whose dims/seed derive SQL-expressibly from doc_id, and the engine
    // emits what the CODEC decoded — dimensions and the top-left pixel —
    // so the oracle cross-checks a genuine decode, not stub arithmetic.
    QueryDef("q_multimodal_decode",
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(16 + doc_id % 32 AS INT) AS width,
        |  CAST(16 + (doc_id * 7) % 32 AS INT) AS height,
        |  CAST(doc_id % 251 AS INT) AS top_left
        |FROM documents WHERE doc_id < 200
        |ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      Multimodal.decodeImages(s,
          Multimodal.withImagePayload(
            Tables.documents(s, d).where(col("doc_id") < 200), "doc_id"), "doc_id")
        .select(col("doc_id"), col("width"), col("height"), col("top_left"))
        .orderBy("doc_id")
    }
  )
}
