#!/usr/bin/env python3
"""Scale the driver-generated documents/embeddings tables by an integer
factor for throughput checkpoints (BENCH_NOTES scale table). Driver-side
utility (pyarrow), never a library dependency.

Construction — the point is 10x MORE data with the SAME statistical
shape, not 10x copies:

- documents: replica r keeps replica 0's rows verbatim at r=0; for r>0
  every word w is rewritten w~r (a per-replica word codebook). Word-level
  shingles map elementwise through the codebook, so within-replica
  jaccard/minhash/exact-dup structure is preserved EXACTLY (organic dup
  clusters replicate as r independent clusters), while cross-replica
  similarity is zero (no shared words). doc_id' = doc_id + r*1_000_000
  stays clear of the gates' +100000/+200000 planted-id shifts.
- embeddings: replica r>0 perturbs each value relatively
  (e*(1+eps*sin(vec_id*31+i*7+r*131)), eps=0.02) — same distribution, no
  cross-replica exact duplicates; vec_id' = vec_id + r*1_000_000.
- files are written with BOUNDED ROW GROUPS (5000 rows) so the scaled
  corpus is SPLITTABLE: the driver's own sf* files are single-row-group
  (one scan task no matter the size — fine at 600k rows, pathological at
  50x that), and a scale rung that can't parallelize its first stage
  measures the file layout, not the engine. Real 100 TB inputs arrive as
  many files; bounded row groups model that.

Usage: tools/scale_up.py SRC_DIR DST_DIR FACTOR
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def scale_documents(src, dst, factor):
    t = pq.read_table(src)
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    lang = t.column("lang")
    source = t.column("source")
    parts = []
    for r in range(factor):
        if r == 0:
            rt = texts
        else:
            suf = f"~{r}"
            rt = [" ".join(w + suf for w in x.split(" ")) for x in texts]
        parts.append(pa.table({
            "doc_id": pa.array(ids + r * 1_000_000, pa.int64()),
            "text": pa.array(rt, pa.string()),
            "lang": lang,
            "source": source,
            "n_chars": pa.array([len(x) for x in rt], pa.int64()),
        }))
    out = pa.concat_tables(parts)
    pq.write_table(out, dst, row_group_size=5000)
    return out.num_rows


def scale_embeddings(src, dst, factor):
    t = pq.read_table(src)
    ids = t.column("vec_id").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    label = t.column("label")
    dim = emb.shape[1]
    i_idx = np.arange(dim, dtype=np.float64)
    parts = []
    for r in range(factor):
        if r == 0:
            re_ = emb
        else:
            phase = (ids[:, None] * 31.0 + i_idx[None, :] * 7.0 + r * 131.0)
            re_ = (emb * (1.0 + 0.02 * np.sin(phase))).astype(np.float32)
        parts.append(pa.table({
            "vec_id": pa.array(ids + r * 1_000_000, pa.int64()),
            "embedding": pa.array(list(re_), pa.list_(pa.float32())),
            "label": label,
        }))
    out = pa.concat_tables(parts)
    pq.write_table(out, dst, row_group_size=5000)
    return out.num_rows


def scale_events(src, dst, factor):
    """Replica r shifts user_id by r*100_000 and event_id by r*10_000_000
    (clear of the specs' planted 9xx,xxx,xxx ids) and keeps ts/event_type/
    value/props verbatim: day count stays fixed while per-day volume
    scales — the realistic 100 TB shape (more events per day, not more
    days) — and per-user session/funnel/cohort structure replicates as
    independent user populations."""
    t = pq.read_table(src)
    eid = t.column("event_id").to_numpy()
    uid = t.column("user_id").to_numpy()
    parts = []
    for r in range(factor):
        parts.append(pa.table({
            "event_id": pa.array(eid + r * 10_000_000, pa.int64()),
            "ts": t.column("ts"),
            "user_id": pa.array(uid + r * 100_000, pa.int64()),
            "event_type": t.column("event_type"),
            "value": t.column("value"),
            "props": t.column("props"),
        }))
    out = pa.concat_tables(parts)
    pq.write_table(out, dst, row_group_size=5000)
    return out.num_rows


def scale_tpch(src, dst, factor):
    """Scale the orders⋈lineitem FACT pair: replica r shifts the shared
    o_orderkey/l_orderkey by r*(max source key + 1) and keeps every other column
    verbatim — customers/suppliers/parts stay fixed (the realistic shape:
    more orders against the same dimension population), so per-order line
    structure, join fan-out per key and filter selectivities replicate
    exactly. Multi-join rungs (q_tpch_*) then measure the fact-shuffle
    growth, not a changed data distribution."""
    o = pq.read_table(f"{src}/orders.parquet")
    l = pq.read_table(f"{src}/lineitem.parquet")
    okey = o.column("o_orderkey").to_numpy()
    lkey = l.column("l_orderkey").to_numpy()
    # stride derives from the SOURCE's actual key range: a hardcoded 10M
    # overlaps once source orderkeys pass it (TPC-H reaches 6M*SF, and
    # re-scaling an already-scaled dir starts far beyond), silently
    # merging distinct orders under one key
    stride = int(max(okey.max(), lkey.max())) + 1
    oparts, lparts = [], []
    for r in range(factor):
        oparts.append(o.set_column(o.schema.get_field_index("o_orderkey"),
                                   "o_orderkey",
                                   pa.array(okey + r * stride, pa.int64())))
        lparts.append(l.set_column(l.schema.get_field_index("l_orderkey"),
                                   "l_orderkey",
                                   pa.array(lkey + r * stride, pa.int64())))
    oo = pa.concat_tables(oparts)
    ll = pa.concat_tables(lparts)
    # DATE-SORT the scaled pair (orders by o_orderdate, lineitem by
    # l_shipdate): replicating rows verbatim makes every row group span
    # the whole date range, so a date predicate prunes NOTHING and a
    # date-filtered rung (q_tpch_q10/q14) measures the fixture layout,
    # not the engine — the r13 driver measured q10/q14 at 15-32x per
    # 100x on exactly this artifact. Production data does not look like
    # that: the engine's own Archiver writes day-partitioned,
    # sort-column-ordered parquet, so tight per-row-group date min/max
    # stats ARE the deployed layout. Sorting here makes the rung honest
    # about pruning while leaving every other distribution unchanged
    # (orderkey join fan-out, selectivities, per-order line structure).
    oo = oo.sort_by("o_orderdate")
    ll = ll.sort_by("l_shipdate")
    # ...and annotate the date columns isAdjustedToUTC=true (UTC-instant
    # micros): Spark REJECTS timestamp filter pushdown against
    # local-semantics (NTZ) parquet timestamps — the row-group stats are
    # there but zone-dependent conversion makes them unusable, so a
    # date-filtered scan decodes every row (measured: 6M rows out of the
    # scan vs 100k, 2.6 s vs 0.5 s on the same sorted file). The engine's
    # own Archiver (Spark-written) emits UTC-adjusted micros, so archive
    # data prunes; the rung fixture models that layout. Foreign
    # pandas/pyarrow dumps are NTZ by default — route them through the
    # archiver before serving (see DEPLOYMENT.md).
    def utc(tab, col_name):
        i = tab.schema.get_field_index(col_name)
        return tab.set_column(
            i, col_name,
            tab.column(col_name).cast(pa.timestamp("us", tz="UTC")))
    oo = utc(oo, "o_orderdate")
    ll = utc(ll, "l_shipdate")
    # 100k-row groups, not the 5000 the text tables use: the fact pair is
    # 10-100x the row count of documents/events, and 5000-row groups put
    # TWELVE THOUSAND row-group footers in one sf10 lineitem file — every
    # scan task then parses megabytes of metadata before reading a byte
    # (measured: q_filter_rows 43.5 s at sf10 on the 5000-row layout vs
    # 1.3 s on this one, and the six-table q_tpch_q5 OOM'd the default
    # 8 GB bench heap on the old layout while completing on this one).
    # 100k rows ≈ 10 MB groups — the parquet-format recommended order of
    # magnitude, still plenty splittable.
    pq.write_table(oo, f"{dst}/orders.parquet", row_group_size=100_000)
    pq.write_table(ll, f"{dst}/lineitem.parquet", row_group_size=100_000)
    return oo.num_rows, ll.num_rows


def rescale_documents(src, dst, factor):
    """Two-hop document scaling for the deep rungs (sf100 = sf10 × 10):
    the one-hop path holds `factor` replicas of the SOURCE in Python
    strings — fine at factor 100 from sf0.1, pathological at factor 1000
    — so the deep rung re-scales an already-scaled dir instead, with two
    changes the one-hop path doesn't need:

    - the per-replica word codebook is applied VECTORIZED
      (pyarrow replace_substring_regex, `([^ ]+)` == split(" ") token
      rule) — replica r rewrites every token w → w~r, exactly the
      one-hop construction, so within-replica jaccard/minhash/exact-dup
      structure is preserved and cross-replica similarity is zero;
    - doc_id stride derives from the SOURCE's max id rounded up to the
      next 1M multiple: (id mod 1M) stays in the source's [0, 5000]
      band, so the gates' +100000/+200000 planted-id shifts remain
      collision-free at every hop (a max+1 stride would destroy the
      mod-1M band the gates rely on);
    - replicas stream through one ParquetWriter (bounded memory: one
      replica in flight, never `factor`).
    """
    import pyarrow.compute as pc
    t = pq.read_table(src)
    ids = t.column("doc_id").to_numpy()
    stride = ((int(ids.max()) // 1_000_000) + 1) * 1_000_000
    writer = None
    n = 0
    for r in range(factor):
        if r == 0:
            rt = t.column("text").combine_chunks()
        else:
            rt = pc.replace_substring_regex(
                t.column("text"), pattern="([^ ]+)",
                replacement=f"\\1~~{r}").combine_chunks()
        part = pa.table({
            "doc_id": pa.array(ids + r * stride, pa.int64()),
            "text": rt,
            "lang": t.column("lang"),
            "source": t.column("source"),
            "n_chars": pc.utf8_length(rt).cast(pa.int64()),
        })
        if writer is None:
            writer = pq.ParquetWriter(dst, part.schema)
        writer.write_table(part, row_group_size=5000)
        n += part.num_rows
    writer.close()
    return n


def rescale_tpch(src, dst, factor):
    """Two-hop fact scaling (sf100 = sf10 × 10): the one-hop path
    concatenates every replica in memory and re-sorts — at 600M lineitem
    rows that is a ~100 GB arrow sort. The deep rung instead streams
    replicas of an ALREADY date-sorted, UTC-annotated source (the one-hop
    output) through a ParquetWriter: each replica is internally
    date-sorted, so per-row-group date min/max stats stay as tight as a
    global sort's and pruning behaves identically; orderkey stride
    derives from the source's actual key range exactly like scale_tpch.
    """
    o = pq.read_table(f"{src}/orders.parquet")
    l = pq.read_table(f"{src}/lineitem.parquet")
    okey = o.column("o_orderkey").to_numpy()
    lkey = l.column("l_orderkey").to_numpy()
    stride = int(max(okey.max(), lkey.max())) + 1
    ow = pq.ParquetWriter(f"{dst}/orders.parquet", o.schema)
    lw = pq.ParquetWriter(f"{dst}/lineitem.parquet", l.schema)
    no = nl = 0
    for r in range(factor):
        op = o.set_column(o.schema.get_field_index("o_orderkey"), "o_orderkey",
                          pa.array(okey + r * stride, pa.int64()))
        ow.write_table(op, row_group_size=100_000)
        no += op.num_rows
        lp = l.set_column(l.schema.get_field_index("l_orderkey"), "l_orderkey",
                          pa.array(lkey + r * stride, pa.int64()))
        lw.write_table(lp, row_group_size=100_000)
        nl += lp.num_rows
    ow.close()
    lw.close()
    return no, nl


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)
    if "--rescale" in sys.argv:
        # deep-rung path: SRC is itself a scale_up output (e.g. target/sf10)
        n = rescale_documents(f"{src}/documents.parquet",
                              f"{dst}/documents.parquet", factor)
        print(f"documents: {n} rows")
        no, nl = rescale_tpch(src, dst, factor)
        print(f"orders: {no} rows, lineitem: {nl} rows")
        return
    if "--only-tpch" not in sys.argv:
        n = scale_documents(f"{src}/documents.parquet",
                            f"{dst}/documents.parquet", factor)
        print(f"documents: {n} rows")
        n = scale_embeddings(f"{src}/embeddings.parquet",
                             f"{dst}/embeddings.parquet", factor)
        print(f"embeddings: {n} rows")
        n = scale_events(f"{src}/events.parquet",
                         f"{dst}/events.parquet", factor)
        print(f"events: {n} rows")
    if "--tpch" in sys.argv or "--only-tpch" in sys.argv:
        no, nl = scale_tpch(src, dst, factor)
        print(f"orders: {no} rows, lineitem: {nl} rows")


if __name__ == "__main__":
    main()
