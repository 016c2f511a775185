package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Curation, Dedup, Sampling, Similarity, Sq}
import org.apache.spark.sql.functions._

/** Gate queries for the round-8 data-pipeline additions: cosine radius
  * search (exact and IVF-indexed), cluster-balanced sampling and
  * hard-negative mining ([[graft.operators.Similarity]] /
  * [[graft.operators.IvfIndex]]), the Gopher-style quality-rule filter
  * ([[graft.operators.Curation]]), SQ8 scalar-quantized ANN
  * ([[graft.operators.Sq]]), the deterministic training-shard shuffle
  * ([[graft.operators.Sampling]]), hybrid BM25→cosine retrieval
  * ([[graft.operators.TextRank]]) and the quality-gated packing
  * composition ([[graft.operators.Pipeline.qualityPack]]).
  *
  * Oracle strategy per gate: searches emit ids only, so DuckDB recomputes
  * the same double-precision cosine / argmin-L2 exactly (the
  * q_emb_near_dup precedent); quality rules are integer
  * cross-multiplications (float-free); the shard shuffle and pack shards
  * are the same md5 hex arithmetic in both engines; SQ8 and the indexed
  * radius search use planted-copy flag contracts (the q_ann_pq pattern —
  * quantization/index internals are engine-side, the oracle pins the
  * query set and asserts recovery); hybrid retrieval composes the rounded
  * BM25 oracle with an exact cosine rerank.
  */
object DataOpsQueries {

  val defs: Seq[QueryDef] = Seq(

    // --- similarity search: radius (range) query. Exact by construction —
    // queries broadcast, map-side cosine filter, ids-only output.
    QueryDef("q_ann_range",
      """SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |FROM embeddings q, embeddings c
        |WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
        |  AND list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(c.embedding AS DOUBLE[])) >= 0.3
        |ORDER BY query_id NULLS FIRST, neighbor_id NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.rangeSearch(emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 5), 0.3)
        .select("query_id", "neighbor_id")
        .orderBy("query_id", "neighbor_id")
    },

    // --- cluster-balanced sampling: assign to the nearest of 8
    // deterministic centroids (the vectors of ids 0..7), keep ≤25 per
    // cluster by smallest id. DuckDB recomputes the argmin exactly
    // (sqrt-L2 is argmin-equivalent to the engine's squared L2; ties —
    // which only the centroid rows themselves could hit — break toward the
    // smaller cell in both engines).
    // --- embedding drift: per-label centroid cosine between two corpus
    // snapshots (first vs second half by vec_id) — the re-embed / corpus
    // update monitor. Composes groupCentroids with the double cosine;
    // same element-order fold in the oracle.
    QueryDef("q_emb_drift",
      """WITH e AS (SELECT label, vec_id >= 250 AS half, i,
        |             CAST(embedding[i] AS DOUBLE) AS v
        |           FROM embeddings, UNNEST(range(1, 65)) u(i)),
        |m AS (SELECT label, half, i, AVG(v) AS c FROM e GROUP BY 1, 2, 3),
        |cen AS (SELECT label, half, array_agg(c ORDER BY i) AS cen
        |        FROM m GROUP BY 1, 2),
        |p AS (SELECT a.label, a.cen AS ca, b.cen AS cb
        |      FROM cen a JOIN cen b ON a.label = b.label
        |      WHERE NOT a.half AND b.half)
        |SELECT label,
        |  ROUND(list_sum(list_transform(range(1, 65), i -> ca[i]*cb[i])) /
        |    (sqrt(list_sum(list_transform(range(1, 65), i -> ca[i]*ca[i]))) *
        |     sqrt(list_sum(list_transform(range(1, 65), i -> cb[i]*cb[i])))), 4)
        |    AS drift_cos
        |FROM p ORDER BY label""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      def cen(half: org.apache.spark.sql.Column) =
        Similarity.groupCentroids(emb.where(half), "label", "embedding")
      cen(col("vec_id") < 250)
        .select(col("group").as("label"), col("centroid").as("ca"))
        .join(cen(col("vec_id") >= 250)
          .select(col("group").as("label"), col("centroid").as("cb")), Seq("label"))
        .select(col("label"),
          round(graft.functions.VectorOps.cosineDouble(col("ca"), col("cb")), 4)
            .as("drift_cos"))
        .orderBy("label")
    },

    // --- JL random projection: the hash-sign matrix is a pure function
    // of (i, j) via the md5 hex prefix, so the oracle regenerates the
    // SAME matrix and folds each output dim in the same element order —
    // the projection values are pinned, not just their distance
    // statistics (those live in ProjectionSpec).
    QueryDef("q_emb_jl_project",
      """SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(j AS INT) AS dim,
        |  ROUND(list_sum(list_transform(range(1, 65),
        |    i -> CAST(embedding[i] AS DOUBLE) *
        |      (CASE WHEN CAST(('0x' || substring(md5((i-1) || ':' || j), 1, 15))
        |                    AS BIGINT) % 2 = 0
        |            THEN 1.0/sqrt(8) ELSE -(1.0/sqrt(8)) END))), 4) AS v
        |FROM embeddings, UNNEST(range(0, 8)) u(j)
        |WHERE vec_id < 50
        |ORDER BY vec_id, dim""".stripMargin) { (s, d) =>
      graft.operators.Projection.reduce(
          Tables.embeddings(s, d).where(col("vec_id") < 50),
          "embedding", inDim = 64, outDim = 8)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "pv")))
        .select(col("vec_id"), col("dim"), round(col("pv"), 4).as("v"))
        .orderBy("vec_id", "dim")
    },

    // --- PCA: the data-aware projection next to JL. The eigen basis is
    // not SQL-replayable, so the gate pins the INVARIANTS that define a
    // correct PCA (the flag-oracle pattern of q_ann_sq8/q_percentile_
    // approx): fitted components orthonormal, eigenvalues descending and
    // non-negative, and top-k eigenvalue mass >= the best k COORDINATE
    // axes' variance mass (optimality over axis-aligned projections —
    // a wrong eigensolver fails this on real data immediately). The fit
    // itself is the real distributed one-pass Gram accumulation.
    QueryDef("q_emb_pca",
      """SELECT * FROM (VALUES (8, TRUE, TRUE, TRUE, TRUE))
        |AS t(k, orthonormal_ok, descending_ok, beats_axes_ok, proj_var_ok)""".stripMargin) { (s, d) =>
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      val m = graft.operators.Projection.fitPca(emb, "embedding", inDim = 64, k = 8)
      val orth = (0 until 8).forall { a =>
        (a until 8).forall { b =>
          val dot = (0 until 64).map(i => m.components(a)(i) * m.components(b)(i)).sum
          math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-8
        }
      }
      val desc = m.eigenvalues.sliding(2).forall {
        case Array(x, y) => x >= y - 1e-12
        case _ => true
      } && m.eigenvalues.forall(_ >= -1e-9)
      val axisVars = emb
        .select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("dim").agg(var_samp(col("v").cast("double")).as("s"))
        .collect().map(_.getDouble(1)).sorted.reverse.take(8).sum
      val beats = m.eigenvalues.sum >= axisVars - 1e-9
      // the PROJECTION path, driven distributively: the sample variance
      // of each projected coordinate IS the component's eigenvalue —
      // ties fit and transform together (a wrong mean offset, a wrong
      // matrix orientation, or a broken kernel all break the identity)
      val projVars = emb
        .select(graft.operators.Projection.pcaProject(col("embedding"), m)
          .as("p"))
        .select(posexplode(col("p")).as(Seq("dim", "v")))
        .groupBy("dim").agg(var_samp(col("v")).as("s"))
        .orderBy("dim")
        .collect().map(_.getDouble(1))
      val projOk = projVars.zip(m.eigenvalues).forall { case (v, e) =>
        math.abs(v - e) <= 1e-6 * math.max(1.0, math.abs(e))
      }
      Seq((8, orth, desc, beats, projOk))
        .toDF("k", "orthonormal_ok", "descending_ok", "beats_axes_ok",
          "proj_var_ok")
    },

    // --- label-centroid separability: per-label mean vectors (double,
    // one (group, dim)-keyed partial agg) scored pairwise with the
    // sequential-fold double cosine. Both engines fold sums in element
    // order, so ROUND(_, 4) compares a like-for-like double.
    QueryDef("q_emb_centroid_sep",
      """WITH e AS (SELECT label, i, CAST(embedding[i] AS DOUBLE) AS v
        |           FROM embeddings, UNNEST(range(1, 65)) u(i)),
        |m AS (SELECT label, i, AVG(v) AS c FROM e GROUP BY 1, 2),
        |cen AS (SELECT label, array_agg(c ORDER BY i) AS cen FROM m GROUP BY 1),
        |p AS (SELECT a.label AS label_a, b.label AS label_b,
        |        a.cen AS ca, b.cen AS cb
        |      FROM cen a JOIN cen b ON a.label < b.label)
        |SELECT label_a, label_b,
        |  ROUND(list_sum(list_transform(range(1, 65), i -> ca[i]*cb[i])) /
        |    (sqrt(list_sum(list_transform(range(1, 65), i -> ca[i]*ca[i]))) *
        |     sqrt(list_sum(list_transform(range(1, 65), i -> cb[i]*cb[i])))), 4)
        |    AS cos
        |FROM p ORDER BY label_a, label_b""".stripMargin) { (s, d) =>
      val cen = Similarity.groupCentroids(Tables.embeddings(s, d),
        "label", "embedding")
      val a = cen.select(col("group").as("label_a"), col("centroid").as("ca"))
      val b = cen.select(col("group").as("label_b"), col("centroid").as("cb"))
      a.join(b, col("label_a") < col("label_b"))
        .select(col("label_a"), col("label_b"),
          round(graft.functions.VectorOps.cosineDouble(col("ca"), col("cb")), 4)
            .as("cos"))
        .orderBy("label_a", "label_b")
    },

    // --- embedding outliers (r10): bottom-k cosine-to-own-centroid per
    // label — the mislabel/noise review queue. Rank on the ROUNDED score
    // with id tiebreak so the order is engine-independent; WindowGroupLimit
    // trims map-side below the group-key shuffle.
    QueryDef("q_emb_outliers",
      """WITH e AS (SELECT label, i, CAST(embedding[i] AS DOUBLE) AS v
        |           FROM embeddings, UNNEST(range(1, 65)) u(i)),
        |m AS (SELECT label, i, AVG(v) AS c FROM e GROUP BY 1, 2),
        |cen AS (SELECT label, array_agg(c ORDER BY i) AS cen FROM m GROUP BY 1),
        |s AS (SELECT emb.vec_id, emb.label,
        |  ROUND(list_sum(list_transform(range(1, 65),
        |          i -> CAST(embedding[i] AS DOUBLE) * cen[i])) /
        |    (sqrt(list_sum(list_transform(range(1, 65),
        |          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(range(1, 65), i -> cen[i] * cen[i])))), 4)
        |    AS cos
        |  FROM embeddings emb JOIN cen ON emb.label = cen.label)
        |SELECT CAST(label AS INT) AS grp, CAST(rank AS INT) AS rank,
        |  CAST(vec_id AS BIGINT) AS vec_id, cos
        |FROM (SELECT *, row_number() OVER (PARTITION BY label
        |        ORDER BY cos, vec_id) AS rank FROM s)
        |WHERE rank <= 10
        |ORDER BY grp NULLS FIRST, rank NULLS FIRST""".stripMargin) { (s, d) =>
      Similarity.embeddingOutliers(Tables.embeddings(s, d),
          "vec_id", "label", "embedding", k = 10)
        .select(col("group").cast("int").as("grp"), col("rank"),
          col("vec_id"), col("cos"))
        .orderBy("grp", "rank")
    },

    QueryDef("q_cluster_balance",
      """WITH cents AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cvec
        |               FROM embeddings WHERE vec_id < 8),
        |assigned AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cvec), c.cell) AS rn
        |    FROM embeddings e CROSS JOIN cents c) t WHERE rn = 1),
        |kept AS (SELECT vec_id, cell,
        |           row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rn
        |         FROM assigned)
        |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cell AS INT) AS cell
        |FROM kept WHERE rn <= 25
        |ORDER BY vec_id NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val centroids = emb.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding")).orderBy("vec_id")
        .collect()
        .map(_.getSeq[Float](1).map(_.toDouble).toArray)
      Similarity.clusterBalance(emb, "vec_id", "embedding", centroids, cap = 25)
        .select(col("vec_id"), col("cell").cast("int").as("cell"))
        .orderBy("vec_id")
    },

    // --- quality-rule filter (Gopher §A.1.1 shape): five integer rule
    // flags + their conjunction. All thresholds cross-multiplied so the
    // oracle compare is float-free.
    QueryDef("q_quality_rules",
      """WITH toks AS (SELECT doc_id AS id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |              FROM documents),
        |perdoc AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |  CAST(SUM(len(tok)) AS BIGINT) AS n_wchars,
        |  CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types,
        |  CAST(SUM(CASE WHEN tok IN ('the','a','of','and','to','in','is')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
        |  FROM toks GROUP BY 1),
        |maxf AS (SELECT id, CAST(MAX(c) AS BIGINT) AS max_freq
        |         FROM (SELECT id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2)
        |         GROUP BY 1),
        |flags AS (SELECT id,
        |  CAST(CASE WHEN n_words >= 30 THEN 1 ELSE 0 END AS INT) AS r_nwords,
        |  CAST(CASE WHEN n_wchars >= 4*n_words AND n_wchars <= 10*n_words
        |       THEN 1 ELSE 0 END AS INT) AS r_wordlen,
        |  CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS INT) AS r_stop,
        |  CAST(CASE WHEN 2*n_types >= n_words THEN 1 ELSE 0 END AS INT) AS r_ttr,
        |  CAST(CASE WHEN 10*max_freq <= n_words THEN 1 ELSE 0 END AS INT) AS r_maxfreq
        |  FROM perdoc JOIN maxf USING (id))
        |SELECT CAST(id AS BIGINT) AS doc_id, r_nwords, r_wordlen, r_stop,
        |  r_ttr, r_maxfreq,
        |  CAST(r_nwords*r_wordlen*r_stop*r_ttr*r_maxfreq AS INT) AS keep
        |FROM flags ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      Curation.qualityRules(Tables.documents(s, d), "doc_id", "text")
        .withColumn("keep", col("keep").cast("int"))
        .orderBy("doc_id")
    },

    // --- similarity search: SQ8 scalar-quantized ANN. Planted EXACT
    // copies of 10 queries (+100000): a copy shares all d codes with its
    // source, so its ADC distance is the query's own (tiny — 255 levels
    // per dimension) quantization error and must rank 1 once the source id
    // itself is self-excluded. Flag-based oracle pins the query set.
    QueryDef("q_ann_sq8",
      """SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS copy_at_rank1
        |FROM embeddings WHERE vec_id < 10
        |ORDER BY query_id NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
      val corpus = emb.select(col("vec_id"), col("embedding"))
        .unionByName(queries.select((col("vec_id") + 100000).as("vec_id"),
          col("embedding")))
      // build-once fixture: bounds trained once per source fingerprint
      val bounds = AnnFixtures.sqBounds(s, d)
      val codes = Sq.encode(corpus, "vec_id", "embedding", bounds)
      Sq.adcTopK(codes, "vec_id", queries, "vec_id", "embedding", bounds, 1)
        .groupBy("query_id")
        .agg(max(col("neighbor_id") === col("query_id") + 100000).as("copy_at_rank1"))
        .orderBy("query_id")
    },

    // --- similarity search: radius query from the PERSISTED IVF index —
    // the scale path of q_ann_range (threshold filter over only the probed
    // ~nProbe/nlist partition-pruned slice). Planted contract as q_ann_ivf:
    // each query is a lightly-perturbed copy (cos ≈ 0.999) of a corpus
    // vector, which must fall inside the 0.9-radius of its source.
    QueryDef("q_ann_ivf_range",
      """SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS found_planted
        |FROM embeddings WHERE vec_id < 15
        |ORDER BY query_id NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val dir = AnnFixtures.ivfIndexDir(s, d, nlist = 32)
      val queries = emb.where(col("vec_id") < 15)
        .withColumn("vec_id", col("vec_id") + 100000)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            (x.cast("double") + sin(i.cast("double") * 1.3) * 0.01).cast("float")))
      graft.operators.IvfIndex.searchRange(s, dir, queries, "vec_id", "embedding",
          minCosine = 0.9, nProbe = 4)
        .groupBy("query_id")
        .agg(max(col("neighbor_id") === col("query_id") - 100000).as("found_planted"))
        .select((col("query_id") - 100000).as("query_id"), col("found_planted"))
        .orderBy("query_id")
    },

    // --- hard-negative mining: each query's top-3 most-similar vectors
    // with a DIFFERENT label (the informative negatives for contrastive
    // training). Exact oracle mirrors q_ann_topk with the label predicate.
    QueryDef("q_hard_negatives",
      """SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                      CAST(c.embedding AS DOUBLE[])) DESC,
        |               c.vec_id) AS rank
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 5 AND c.vec_id != q.vec_id AND c.label != q.label)
        |WHERE rank <= 3
        |ORDER BY query_id NULLS FIRST, rank NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.labelConstrainedTopK(emb, "vec_id", "embedding", "label",
          emb.where(col("vec_id") < 5), k = 3, excludeSameLabel = true)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    },

    // --- margin-based pair mining (session 4, Artetxe & Schwenk 2019):
    // best cross-group partner per label-0 vector, cosine normalized by
    // both endpoints' k-NN neighborhood averages — the LASER bitext-
    // mining criterion. Selection ranks/thresholds on the ROUNDED margin
    // (the q_emb_outliers engine-independence rule); the oracle replays
    // forward top-k, candidate-only reverse top-k, and the max strategy.
    QueryDef("q_margin_mining",
      """WITH a AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE label = 0 AND vec_id < 10000),
        |b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings WHERE label = 1),
        |pairs AS (SELECT a.vec_id AS x, b.vec_id AS y,
        |    list_cosine_similarity(a.v, b.v) AS cos FROM a, b),
        |fwd AS (SELECT x, y, cos, row_number() OVER (
        |    PARTITION BY x ORDER BY cos DESC, y) AS rk FROM pairs),
        |topk AS (SELECT * FROM fwd WHERE rk <= 4),
        |da AS (SELECT x, AVG(cos) AS da FROM topk GROUP BY 1),
        |cand AS (SELECT DISTINCT y FROM topk),
        |rev AS (SELECT p.y, p.cos, row_number() OVER (
        |    PARTITION BY p.y ORDER BY p.cos DESC, p.x) AS rk
        |  FROM pairs p JOIN cand USING (y)),
        |db AS (SELECT y, AVG(cos) AS db FROM rev WHERE rk <= 4 GROUP BY 1),
        |m AS (SELECT t.x, t.y, t.cos,
        |    ROUND(t.cos / ((da.da + db.db) / 2), 4) AS margin
        |  FROM topk t JOIN da USING (x) JOIN db USING (y)),
        |best AS (SELECT x, y, cos, margin, row_number() OVER (
        |    PARTITION BY x ORDER BY margin DESC, y) AS rk FROM m)
        |SELECT CAST(x AS BIGINT) AS a_id, CAST(y AS BIGINT) AS b_id,
        |  ROUND(cos, 4) AS cos, margin
        |FROM best WHERE rk = 1 AND margin >= 1.02
        |ORDER BY a_id NULLS FIRST""".stripMargin) { (s, d) =>
      // the mining side A is BOUNDED by id (the operator's broadcast-side
      // contract): at scaled fixtures only replica-0 ids qualify, so the
      // gate stays A-bounded while B grows with the corpus
      val emb = Tables.embeddings(s, d)
        .where(col("label") =!= 0 || col("vec_id") < 10000)
      Similarity.marginMining(emb, "vec_id", "embedding",
          "label", lit(0), lit(1), k = 4, threshold = 1.02)
        .orderBy("a_id")
    },

    // --- MMR-diversified retrieval (Carbonell & Goldstein 1998): per-query
    // top-20 candidate pool → greedy pick of 5 maximizing
    // 0.7·rel − (1−0.7)·max-cos-to-picked; first pick is pure relevance.
    // Selection compares scores ROUNDED to 6 with the smaller-id tiebreak
    // (the q_emb_outliers engine-independence rule). The oracle unrolls
    // the 5 greedy steps as chained CTEs (the q_link_rank iteration
    // precedent); (1 - 0.7) is spelled identically in both engines so the
    // IEEE value of the diversity weight matches bit-for-bit.
    QueryDef("q_retrieval_mmr",
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 4),
        |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings),
        |sc AS (SELECT q.qid, c.nid, list_cosine_similarity(q.v, c.v) AS rel
        |       FROM q JOIN c ON c.nid <> q.qid),
        |tn AS (SELECT qid, nid, rel FROM (
        |         SELECT *, row_number() OVER (
        |           PARTITION BY qid ORDER BY rel DESC, nid) AS rk FROM sc)
        |       WHERE rk <= 20),
        |pr AS (SELECT a.qid, a.nid AS x, b.nid AS y,
        |         list_cosine_similarity(ca.v, cb.v) AS sim
        |       FROM tn a JOIN tn b ON a.qid = b.qid AND a.nid <> b.nid
        |       JOIN c ca ON ca.nid = a.nid JOIN c cb ON cb.nid = b.nid),
        |s1 AS (SELECT qid, nid, ROUND(rel, 6) AS score FROM (
        |         SELECT qid, nid, rel, row_number() OVER (
        |           PARTITION BY qid ORDER BY ROUND(rel, 6) DESC, nid) AS rk
        |         FROM tn) WHERE rk = 1),
        |p1 AS (SELECT qid, nid, 1 AS sel_rank, score FROM s1),
        |m2 AS (SELECT t.qid, t.nid,
        |         ROUND(0.7 * t.rel - (1 - 0.7) * MAX(p.sim), 6) AS score
        |       FROM tn t JOIN pr p ON p.qid = t.qid AND p.x = t.nid
        |       JOIN p1 ON p1.qid = p.qid AND p1.nid = p.y
        |       WHERE NOT EXISTS (SELECT 1 FROM p1 z
        |                         WHERE z.qid = t.qid AND z.nid = t.nid)
        |       GROUP BY t.qid, t.nid, t.rel),
        |s2 AS (SELECT qid, nid, score FROM (
        |         SELECT *, row_number() OVER (
        |           PARTITION BY qid ORDER BY score DESC, nid) AS rk FROM m2)
        |       WHERE rk = 1),
        |p2 AS (SELECT * FROM p1 UNION ALL
        |       SELECT qid, nid, 2, score FROM s2),
        |m3 AS (SELECT t.qid, t.nid,
        |         ROUND(0.7 * t.rel - (1 - 0.7) * MAX(p.sim), 6) AS score
        |       FROM tn t JOIN pr p ON p.qid = t.qid AND p.x = t.nid
        |       JOIN p2 ON p2.qid = p.qid AND p2.nid = p.y
        |       WHERE NOT EXISTS (SELECT 1 FROM p2 z
        |                         WHERE z.qid = t.qid AND z.nid = t.nid)
        |       GROUP BY t.qid, t.nid, t.rel),
        |s3 AS (SELECT qid, nid, score FROM (
        |         SELECT *, row_number() OVER (
        |           PARTITION BY qid ORDER BY score DESC, nid) AS rk FROM m3)
        |       WHERE rk = 1),
        |p3 AS (SELECT * FROM p2 UNION ALL
        |       SELECT qid, nid, 3, score FROM s3),
        |m4 AS (SELECT t.qid, t.nid,
        |         ROUND(0.7 * t.rel - (1 - 0.7) * MAX(p.sim), 6) AS score
        |       FROM tn t JOIN pr p ON p.qid = t.qid AND p.x = t.nid
        |       JOIN p3 ON p3.qid = p.qid AND p3.nid = p.y
        |       WHERE NOT EXISTS (SELECT 1 FROM p3 z
        |                         WHERE z.qid = t.qid AND z.nid = t.nid)
        |       GROUP BY t.qid, t.nid, t.rel),
        |s4 AS (SELECT qid, nid, score FROM (
        |         SELECT *, row_number() OVER (
        |           PARTITION BY qid ORDER BY score DESC, nid) AS rk FROM m4)
        |       WHERE rk = 1),
        |p4 AS (SELECT * FROM p3 UNION ALL
        |       SELECT qid, nid, 4, score FROM s4),
        |m5 AS (SELECT t.qid, t.nid,
        |         ROUND(0.7 * t.rel - (1 - 0.7) * MAX(p.sim), 6) AS score
        |       FROM tn t JOIN pr p ON p.qid = t.qid AND p.x = t.nid
        |       JOIN p4 ON p4.qid = p.qid AND p4.nid = p.y
        |       WHERE NOT EXISTS (SELECT 1 FROM p4 z
        |                         WHERE z.qid = t.qid AND z.nid = t.nid)
        |       GROUP BY t.qid, t.nid, t.rel),
        |s5 AS (SELECT qid, nid, score FROM (
        |         SELECT *, row_number() OVER (
        |           PARTITION BY qid ORDER BY score DESC, nid) AS rk FROM m5)
        |       WHERE rk = 1),
        |p5 AS (SELECT * FROM p4 UNION ALL
        |       SELECT qid, nid, 5, score FROM s5)
        |SELECT qid AS query_id, CAST(sel_rank AS INT) AS sel_rank,
        |  nid AS neighbor_id, ROUND(score, 4) AS score
        |FROM p5 ORDER BY query_id NULLS FIRST, sel_rank NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.mmrSelect(emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 4), n = 20, k = 5, lambda = 0.7)
        .select(col("query_id"), col("sel_rank"), col("neighbor_id"),
          round(col("score"), 4).as("score"))
        .orderBy("query_id", "sel_rank")
    },

    // --- hybrid retrieval: BM25 lexical candidates → embedding cosine
    // rerank (two-stage retrieval; the vector column is touched only for
    // the ≤ queries×20 candidate ids). Query vectors are the embeddings of
    // ids 0/1, so the oracle can recompute both stages exactly.
    QueryDef("q_hybrid_search",
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
        |  GROUP BY 1, 2),
        |cand AS (SELECT query_id, doc_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
        |    FROM scored) WHERE rank <= 20),
        |rer AS (SELECT c.query_id, c.doc_id,
        |    list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
        |  FROM cand c
        |  JOIN embeddings e ON e.vec_id = c.doc_id
        |  JOIN embeddings qe ON qe.vec_id = c.query_id)
        |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
        |  CAST(doc_id AS BIGINT) AS doc_id
        |FROM (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, doc_id) AS rank FROM rer)
        |WHERE rank <= 5
        |ORDER BY query_id NULLS FIRST, rank NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qv = emb.where(col("vec_id") < 2).orderBy("vec_id")
        .select("embedding").collect()
        .map(_.getSeq[Float](0).toArray)
      graft.operators.TextRank.hybridTopK(
          Tables.documents(s, d), "doc_id", "text", emb, "vec_id", "embedding",
          Seq((0L, "hash join batch", qv(0)), (1L, "vector scan", qv(1))),
          kCandidates = 20, k = 5)
        .orderBy("query_id", "rank")
    },

    // --- hybrid retrieval by reciprocal rank fusion (r10): BM25 top-20 and
    // dense cosine top-20 run independently and fuse by Σ 1/(60+rank) —
    // robust to score-scale mismatch, no calibration. Ranks are integers,
    // so the fused score is exact; round(6) pins the final order.
    QueryDef("q_hybrid_rrf",
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
        |  GROUP BY 1, 2),
        |lex AS (SELECT query_id, doc_id, rank FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id) AS rank FROM scored) WHERE rank <= 20),
        |den AS (SELECT query_id, doc_id, rank FROM (
        |    SELECT q2.vec_id AS query_id, c.vec_id AS doc_id,
        |      row_number() OVER (PARTITION BY q2.vec_id
        |        ORDER BY list_cosine_similarity(CAST(q2.embedding AS DOUBLE[]),
        |                                        CAST(c.embedding AS DOUBLE[])) DESC,
        |                 c.vec_id) AS rank
        |    FROM embeddings q2, embeddings c
        |    WHERE q2.vec_id < 2 AND c.vec_id != q2.vec_id) WHERE rank <= 20),
        |fused AS (SELECT coalesce(l.query_id, d2.query_id) AS query_id,
        |    coalesce(l.doc_id, d2.doc_id) AS doc_id,
        |    ROUND(coalesce(1.0 / (60 + l.rank), 0) +
        |          coalesce(1.0 / (60 + d2.rank), 0), 6) AS rrf
        |  FROM lex l FULL OUTER JOIN den d2
        |    ON l.query_id = d2.query_id AND l.doc_id = d2.doc_id)
        |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
        |  CAST(doc_id AS BIGINT) AS doc_id, rrf
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY rrf DESC, doc_id) AS rank FROM fused)
        |WHERE rank <= 10
        |ORDER BY query_id NULLS FIRST, rank NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qv = emb.where(col("vec_id") < 2).orderBy("vec_id")
        .select("embedding").collect()
        .map(_.getSeq[Float](0).toArray)
      graft.operators.TextRank.rrfTopK(
          Tables.documents(s, d), "doc_id", "text", emb, "vec_id", "embedding",
          Seq((0L, "hash join batch", qv(0)), (1L, "vector scan", qv(1))),
          kEach = 20, k = 10)
        .orderBy("query_id", "rank")
    },

    // --- retrieval metrics (r10): BM25 top-10 scored against the dense
    // cosine top-10 as the relevance set — the lexical-vs-dense agreement
    // scorecard. All metrics are integer ratios rounded to 6.
    QueryDef("q_retrieval_metrics",
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
        |  GROUP BY 1, 2),
        |lex AS (SELECT query_id, doc_id, rank FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id) AS rank FROM scored) WHERE rank <= 10),
        |den AS (SELECT query_id, doc_id FROM (
        |    SELECT q2.vec_id AS query_id, c.vec_id AS doc_id,
        |      row_number() OVER (PARTITION BY q2.vec_id
        |        ORDER BY list_cosine_similarity(CAST(q2.embedding AS DOUBLE[]),
        |                                        CAST(c.embedding AS DOUBLE[])) DESC,
        |                 c.vec_id) AS rank
        |    FROM embeddings q2, embeddings c
        |    WHERE q2.vec_id < 2 AND c.vec_id != q2.vec_id) WHERE rank <= 10),
        |h AS (SELECT l.query_id, COUNT(*) AS hits, MIN(l.rank) AS fr,
        |        list_sum(list_transform(list_sort(list(l.rank)),
        |          r -> 1.0 / (ln(r + 1) / ln(2)))) AS dcg
        |      FROM lex l JOIN den d2
        |        ON l.query_id = d2.query_id AND l.doc_id = d2.doc_id
        |      GROUP BY 1),
        |ts AS (SELECT query_id, COUNT(*) AS n_truth FROM den GROUP BY 1)
        |SELECT CAST(ts.query_id AS BIGINT) AS query_id,
        |  CAST(n_truth AS BIGINT) AS n_truth,
        |  CAST(coalesce(hits, 0) AS BIGINT) AS hits,
        |  ROUND(coalesce(hits, 0) * 1.0 / n_truth, 6) AS recall,
        |  ROUND(coalesce(hits, 0) / 10.0, 6) AS p_at_k,
        |  ROUND(coalesce(1.0 / fr, 0), 6) AS mrr,
        |  ROUND(coalesce(dcg, 0) / list_sum(list_transform(
        |    range(1, least(n_truth, 10) + 1),
        |    i -> 1.0 / (ln(i + 1) / ln(2)))), 6) AS ndcg
        |FROM ts LEFT JOIN h ON ts.query_id = h.query_id
        |ORDER BY query_id NULLS FIRST""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val lex = graft.operators.TextRank.bm25TopK(Tables.documents(s, d),
        "doc_id", "text", Seq((0L, "hash join batch"), (1L, "vector scan")), 10)
      val den = Similarity.topKCosine(emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 2), 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"))
      graft.operators.TextRank.retrievalMetrics(lex, den, k = 10)
        .orderBy("query_id")
    },

    // --- composition: quality-gated no-split packing as ONE job (the
    // round's new operators chained — rule filter, map-side, feeds the
    // deterministic hash-shard next-fit pack). Oracle composes the two
    // exact replays: the quality CTE gates the recursive pack CTE.
    QueryDef("q_pipeline_quality_pack",
      """WITH RECURSIVE toks AS (SELECT doc_id AS id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |              FROM documents),
        |perdoc AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |  CAST(SUM(len(tok)) AS BIGINT) AS n_wchars,
        |  CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types,
        |  CAST(SUM(CASE WHEN tok IN ('the','a','of','and','to','in','is')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
        |  FROM toks GROUP BY 1),
        |maxf AS (SELECT id, CAST(MAX(c) AS BIGINT) AS max_freq
        |         FROM (SELECT id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2)
        |         GROUP BY 1),
        |kept AS (SELECT id AS doc_id, n_words AS n FROM perdoc JOIN maxf USING (id)
        |  WHERE n_words >= 30 AND n_wchars >= 4*n_words AND n_wchars <= 10*n_words
        |    AND n_stop >= 2 AND 2*n_types >= n_words AND 10*max_freq <= n_words),
        |t AS (SELECT doc_id, n,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS shard
        |  FROM kept),
        |o AS (SELECT doc_id, shard, n,
        |        row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM t),
        |pack AS (
        |  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT) AS bin, n AS fill
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.shard, o.rn, o.doc_id, o.n,
        |    CASE WHEN p.fill + o.n <= 128 THEN p.bin ELSE p.bin + 1 END,
        |    CASE WHEN p.fill + o.n <= 128 THEN p.fill + o.n ELSE o.n END
        |  FROM pack p JOIN o ON o.shard = p.shard AND o.rn = p.rn + 1)
        |SELECT CAST(shard AS INT) AS shard, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens
        |FROM pack GROUP BY 1, 2
        |ORDER BY shard NULLS FIRST, bin NULLS FIRST""".stripMargin) { (s, d) =>
      graft.operators.Pipeline.qualityPack(Tables.documents(s, d),
          "doc_id", "text", packBudget = 128, nShards = 8)
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
        .orderBy("shard", "bin")
    },

    // --- deterministic training-shard shuffle: content-hash shard + within-
    // shard order, a pure function of the data (identical md5 hex
    // arithmetic in both engines).
    // --- leakage-safe split: train/val/test assigned by md5 of the SOURCE
    // group, so near-duplicate docs sharing provenance can never straddle
    // train and eval. Pure map-side when-chain — identical hex-prefix
    // thresholds in both engines (0.8/0.1/0.1 → 'cccd'/'e666').
    QueryDef("q_group_split",
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
        |  CASE WHEN substring(md5(source),1,4) < 'cccd' THEN 'train'
        |       WHEN substring(md5(source),1,4) < 'e666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      Sampling.groupSplit(Tables.documents(s, d), col("source"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "source", "split")
        .orderBy("doc_id")
    },

    // --- temperature mixture sampling: per-language keep rates from
    // sqrt-count weights (alpha = 0.5), derived in integer arithmetic so
    // both engines select the identical rows. en (218 docs) is tamed to
    // its temperature share while tail languages keep ~45%.
    QueryDef("q_mixture_sample",
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM c),
        |tot AS (SELECT SUM(w) AS tw FROM w),
        |r AS (SELECT lang, LEAST(CAST(65536 AS BIGINT), (65536 * 200 * w) // (tw * n)) AS rate16
        |      FROM w CROSS JOIN tot)
        |SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
        |FROM documents d JOIN r USING (lang)
        |WHERE r.rate16 >= 65536
        |   OR CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)),1,4)) AS BIGINT) < r.rate16
        |ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      Sampling.mixtureSample(Tables.documents(s, d), "lang", col("doc_id"),
          budgetRows = 200)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // --- keyword extraction: top-3 TF-IDF terms per document (smoothed
    // ln((N+1)/(df+1))+1 idf; scores rounded to 4dp, ties by term).
    QueryDef("q_tfidf_topk",
      """WITH dt AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf FROM dt GROUP BY 1,2),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
        |dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        |scored AS (SELECT doc_id, tok, ROUND(tf * (ln((n_docs + 1) / (df + 1)) + 1), 4) AS score
        |           FROM tf JOIN dfreq USING (tok) CROSS JOIN n)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(rank AS INT) AS rank, tok AS term, score
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rank FROM scored)
        |WHERE rank <= 3 ORDER BY doc_id NULLS FIRST, rank NULLS FIRST""".stripMargin) { (s, d) =>
      graft.operators.TextRank.tfidfTopK(Tables.documents(s, d), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")
    },

    // --- graded decontamination: per-doc 3-gram overlap counts against
    // the doc_id<10 benchmark (the q_curation_decontam fixture), flagged
    // at >= 1/20 overlap via cross-multiplication — integer-exact.
    QueryDef("q_contamination_score",
      """WITH tok AS (SELECT doc_id, unnest(ts) AS t, unnest(range(1, len(ts)+1)) AS i
        |             FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents)),
        |g AS (SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS gram
        |      FROM tok a JOIN tok b ON b.doc_id=a.doc_id AND b.i=a.i+1
        |                 JOIN tok c ON c.doc_id=a.doc_id AND c.i=a.i+2),
        |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10),
        |per AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |        CAST(SUM(CASE WHEN bg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        |        FROM g LEFT JOIN bg ON bg.gram = g.gram GROUP BY 1)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_grams, n_shared,
        |  CAST(CASE WHEN 20*n_shared >= n_grams THEN 1 ELSE 0 END AS INT) AS flagged
        |FROM per ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Curation.contaminationScore(docs, docs.where(col("doc_id") < 10),
          "doc_id", "text", n = 3, flagDenom = 20)
        .orderBy("doc_id")
    },

    // --- epoch-aware mixture: upsampling counterpart of q_mixture_sample.
    // Tail sources repeat (epoch column) up to the 4-epoch cap; the repeat
    // count per row is integer-exact ((rate16 DIV 2^16) + hash-fraction),
    // so both engines emit the identical multiset.
    QueryDef("q_mixture_epochs",
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM c),
        |tot AS (SELECT SUM(w) AS tw FROM w),
        |r AS (SELECT lang, LEAST(CAST(262144 AS BIGINT), (65536 * 1000 * w) // (tw * n)) AS rate16
        |      FROM w CROSS JOIN tot),
        |d2 AS (SELECT d.doc_id, d.lang, r.rate16,
        |       CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)),1,4)) AS BIGINT) AS h
        |       FROM documents d JOIN r USING (lang)),
        |cp AS (SELECT doc_id, lang,
        |       CAST((rate16 // 65536) + CASE WHEN h < rate16 % 65536 THEN 1 ELSE 0 END AS BIGINT) AS copies
        |       FROM d2)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, CAST(unnest(range(copies)) AS BIGINT) AS epoch
        |FROM cp WHERE copies > 0 ORDER BY doc_id NULLS FIRST, epoch NULLS FIRST""".stripMargin) { (s, d) =>
      Sampling.mixtureEpochs(Tables.documents(s, d), "lang", col("doc_id"),
          budgetRows = 1000, maxEpochs = 4)
        .select("doc_id", "lang", "epoch")
        .orderBy("doc_id", "epoch")
    },

    // --- normalized-key dedup: exact dedup one rung below minhash — the
    // planted copies differ only by case and punctuation, and collapse
    // onto their originals under the canonical form. Pure character-class
    // regex chain, identical in Java regex and RE2.
    QueryDef("q_norm_dedup",
      """WITH input AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, upper(text) || ' !!' FROM documents),
        |n AS (SELECT doc_id,
        |      trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS norm
        |      FROM input)
        |SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_members
        |FROM n GROUP BY norm ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val input = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + 100000)
          .withColumn("text", concat(upper(col("text")), lit(" !!"))))
      // group on the 16-byte CONTENT KEY of the normalized text, not the
      // text itself (the Dedup.exactDedup shuffle rule): the dedup
      // exchange moves md5 keys instead of a normalized copy of the
      // corpus — at 100 TB that is the difference between a key shuffle
      // and re-shuffling every byte of text
      input.select(
          md5(graft.operators.TextOps.normalizeText(col("text")).cast("binary"))
            .as("__key"),
          col("doc_id"))
        .groupBy("__key")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_members"))
        .select("doc_id", "n_members")
        .orderBy("doc_id")
    },

    // --- exact-size deterministic sample: the 100 hash-smallest ids.
    // TakeOrderedAndProject in the engine; identical (md5, id) order in
    // DuckDB, so the picked set matches exactly.
    QueryDef("q_sample_exact_n",
      """SELECT CAST(doc_id AS BIGINT) AS doc_id FROM
        | (SELECT doc_id FROM documents ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 100)
        |ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      Sampling.exactSample(Tables.documents(s, d), col("doc_id"), 100)
        .select("doc_id")
        .orderBy("doc_id")
    },

    // --- fixed-size-sample quantile estimation: exact interpolated
    // percentiles over the deterministic 2000-row hash-smallest sample —
    // the 100 TB quantile pattern (a full-table exact percentile sorts
    // per-group value SETS; the sample is TakeOrderedAndProject + a
    // 2000-row agg at ANY corpus size, and the estimate's error is the
    // standard sampling bound, not engine-dependent sketch error). The
    // pick is a pure function of the data, so the oracle replays the
    // identical sample and lands on the identical percentiles — no
    // tolerance flag needed, unlike q_percentile_approx's sketch.
    QueryDef("q_quantile_sample",
      """WITH smp AS (
        |  SELECT event_type, value FROM events
        |  ORDER BY md5(CAST(event_id AS VARCHAR)), event_id LIMIT 2000)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(quantile_cont(value, 0.50), 4) AS p50,
        |  ROUND(quantile_cont(value, 0.95), 4) AS p95
        |FROM smp GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin) { (s, d) =>
      Sampling.exactSample(
          Tables.events(s, d).select("event_id", "event_type", "value"),
          col("event_id"), 2000)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"))
        .orderBy(asc_nulls_first("event_type"))
    },

    // --- token-length histogram per source (mix/packing planning):
    // integer bucket = n_tokens DIV 50, counts and token mass per cell.
    QueryDef("q_token_histogram",
      """SELECT source, CAST(len(string_split_regex(trim(text), '\s+')) // 50 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        |FROM documents GROUP BY 1, 2 ORDER BY source NULLS FIRST, bucket NULLS FIRST""".stripMargin) { (s, d) =>
      Curation.tokenHistogram(Tables.documents(s, d), "source", "text", 50)
        .orderBy("source", "bucket")
    },

    // --- snapshot diff: crawl N (doc_id < 480) vs crawl N+1 (doc_id >=
    // 20, every 7th text mutated) — added/removed/changed/unchanged per
    // id. Statuses depend only on content-hash equality; the oracle
    // replays them with NULL-SAFE text equality (IS NOT DISTINCT FROM —
    // the engine hashes null columns to equal keys, so null==null must be
    // 'unchanged' on the oracle side too, not SQL-NULL → 'changed').
    QueryDef("q_snapshot_diff",
      """WITH oldv AS (SELECT doc_id, text FROM documents WHERE doc_id < 480),
        |newv AS (SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 0 THEN text || ' mutated' ELSE text END AS text
        |         FROM documents WHERE doc_id >= 20)
        |SELECT CAST(COALESCE(o.doc_id, n.doc_id) AS BIGINT) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM oldv o FULL OUTER JOIN newv n USING (doc_id)
        |ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val oldv = docs.where(col("doc_id") < 480)
      val newv = docs.where(col("doc_id") >= 20)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" mutated"))).otherwise(col("text")))
      Dedup.snapshotDiff(oldv, newv, "doc_id", Seq("text"))
        .select(col("doc_id").cast("long").as("doc_id"), col("status"))
        .orderBy("doc_id")
    },

    // --- surgical decontamination: cut only the token windows overlapping
    // a benchmark 3-gram (benchmark = doc_id < 10) and rebuild; benchmark
    // member docs empty out entirely, everything else keeps its clean
    // tokens. Compared by rebuilt-text md5, the q_dedup_span_trim
    // precedent.
    QueryDef("q_curation_trim",
      """WITH bench AS (SELECT text FROM documents WHERE doc_id < 10),
        |bg AS (SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(ts)-1),
        |        i -> array_to_string(ts[i:i+2], ' ')))) AS g
        |       FROM (SELECT string_split_regex(trim(text), '\s+') AS ts FROM bench)
        |       WHERE len(ts) >= 3),
        |tk AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |pos AS (SELECT tk.doc_id, i - 1 AS start
        |        FROM tk, unnest(range(1, len(ts) - 1)) AS u(i)
        |        WHERE len(ts) >= 3 AND array_to_string(ts[i:i+2], ' ') IN (SELECT g FROM bg)),
        |removed AS (SELECT DISTINCT doc_id, CAST(unnest(range(start, start + 3)) AS BIGINT) AS ti FROM pos),
        |toks AS (SELECT tk.doc_id, i - 1 AS ti, ts[i] AS tok
        |         FROM tk, unnest(range(1, len(ts) + 1)) AS u(i)),
        |kept AS (SELECT t.doc_id, t.ti, t.tok FROM toks t
        |         LEFT JOIN removed r ON r.doc_id = t.doc_id AND r.ti = t.ti
        |         WHERE r.ti IS NULL),
        |rebuilt AS (
        |  SELECT tk.doc_id,
        |    CASE WHEN tk.doc_id IN (SELECT doc_id FROM removed)
        |      THEN COALESCE((SELECT string_agg(k.tok, ' ' ORDER BY k.ti)
        |                     FROM kept k WHERE k.doc_id = tk.doc_id), '')
        |      ELSE tk.text END AS txt
        |  FROM tk)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(CASE WHEN txt = '' THEN 0
        |       ELSE len(string_split_regex(trim(txt), '\s+')) END AS BIGINT) AS n_tokens,
        |  md5(txt) AS fp
        |FROM rebuilt ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      Curation.trimContaminated(docs, docs.where(col("doc_id") < 10),
          "doc_id", "text", n = 3)
        .select(col("doc_id").cast("long").as("doc_id"),
          when(col("text") === "", 0L)
            .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
            .as("n_tokens"),
          md5(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    QueryDef("q_shuffle_shards",
      """WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
        |s AS (SELECT doc_id, hx,
        |        CAST(('0x' || substring(hx, 1, 8)) AS BIGINT) % 16 AS shard
        |      FROM h)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(shard AS INT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) AS BIGINT) AS pos
        |FROM s ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, d) =>
      Sampling.shardShuffle(Tables.documents(s, d), "doc_id", "text", nShards = 16)
        .orderBy("doc_id")
    }
  )
}
