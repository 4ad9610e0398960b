"""Top-k BM25 retrieval over segment indexes (reference operators Q1-Q8).

Lifecycle (SURVEY.md §3.1 Spark equivalent):
 1. driver tokenizes the query with the index's config (Q1) and broadcasts
    [(term, query_freq)],
 2. stage 1: dictionary lookup — read the segment Parquet filtered to the
    query terms (Catalyst pushes ``term IN (...)`` into the scan: per-file
    min/max + dictionary pruning = the reference's binary-searched term
    dictionary, Q10), aggregate global doc_freq per term (Q2),
 3. driver computes IDFs from the manifest's global stats (Q3: N, avgdl are
    global across all segments — segment layout never changes scores),
 4. stage 2: per-segment scoring kernel (applyInPandas over segment_id):
    numpy-vectorized term-at-a-time accumulation with block-max pruning of
    blocks that cannot reach the local top-k threshold (Q4/Q5/Q11/Q12) and a
    local top-k (Q6),
 5. stage 3: global ``orderBy(score desc, doc_id asc).limit(k)`` —
    Spark's TakeOrderedAndProject is the final top-k heap merge.

Vectorization stance: the reference's document-at-a-time Block-Max WAND
(src/scoring/bmw.c:1477-1716) is optimal for scalar C; in a columnar numpy
kernel, term-at-a-time bulk scoring with per-block upper-bound skipping
(same safe-skip bound: block contributes only if block_max + Σ other-term
maxima can beat the current threshold, bmw.c:1526-1571) gives identical
results with array-level operations. Single-term queries additionally
process blocks in descending bound order and stop early once the bound
cannot beat the kth score — true block-max early termination.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import Bm25Options
from ..functions.fieldnorm import DECODE_TABLE
from ..functions.tokenizer import tokenize_query
from .codec import varbyte_decode
from .segment import decode_positions, decode_row

if TYPE_CHECKING:
    from .build import Bm25Index


def idf(n_docs: int, df_t: int) -> float:
    return math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))


def _read_postings(index: "Bm25Index", terms: list[str]) -> DataFrame:
    paths = index.postings_paths()
    if not paths:
        raise ValueError("index has no segments")
    # cache the DataFrame (and with it Spark's resolved FileIndex) across
    # queries on the same segment set — re-listing N segment directories
    # per query dominates small-query latency otherwise
    key = tuple(sorted(paths))
    cached = getattr(index, "_postings_df_cache", None)
    if cached is None or cached[0] != key:
        df = index.spark.read.parquet(*paths)
        index._postings_df_cache = (key, df)
    else:
        df = cached[1]
    return df.filter(F.col("term").isin(terms))


def term_stats(index: "Bm25Index", terms: list[str]) -> DataFrame:
    """Global (term, doc_freq, idf) from the dictionary columns (Q2)."""
    n = index.manifest.total_docs
    agg = (_read_postings(index, terms)
           .groupBy("term").agg(F.sum("doc_freq").alias("doc_freq")))
    idf_col = F.log(F.lit(1.0) + (F.lit(float(n)) - F.col("doc_freq") + 0.5)
                    / (F.col("doc_freq") + 0.5))
    return agg.select("term", "doc_freq", F.round(idf_col, 6).alias("idf"))


def make_segment_kernel(qfreqs: dict[str, float], n_docs: int,
                        k: int | None, opts: Bm25Options, avgdl: float,
                        mode: str, phrase_occs: list[tuple[str, int]] | None,
                        deleted: np.ndarray | None = None,
                        static_df: dict[str, int] | None = None):
    """Build the applyInPandas kernel. ``qfreqs``: term -> query frequency.

    IDFs are computed inside the kernel from the ``gdf`` column (global
    doc_freq attached by a window aggregate in the same job — Q2 without a
    separate driver round-trip; every segment sees the same global value,
    so scores are independent of segment layout, SURVEY.md §1.4).

    ``deleted``: sorted tombstoned doc ids (delete.py). Dead postings are
    masked right after block decode — before any accumulation or pruning —
    so MaxScore thresholds only ever see alive docs (the reference checks
    its alive bitset per hit the same way). Stats stay dead-inclusive until
    a merge, matching reference VACUUM semantics (SURVEY.md §2.2 M4)."""
    k1, b = float(opts.k1), float(opts.b)
    block_size = opts.block_size
    # norm code -> BM25 tf-denominator length component, precomputed once
    norm_len = DECODE_TABLE.astype(np.float64)
    denom_norm = k1 * (1.0 - b + b * norm_len / avgdl)  # indexed by norm code

    def term_bound(w: float, best_norm_denom: float, max_tf: float) -> float:
        return w * (max_tf * (k1 + 1.0)) / (max_tf + best_norm_denom)

    n_qterms = len(qfreqs)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # Per term: concatenate shard rows in doc_id order, decode, score.
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "raw_score": pd.Series(dtype="float64"),
                              "n_terms": pd.Series(dtype="int32")})
        if len(pdf) == 0:
            return empty
        per_term: dict[str, list] = {}
        for _, row in pdf.sort_values(["term", "shard"]).iterrows():
            per_term.setdefault(row["term"], []).append(row)

        # global IDF: from the driver's df cache when warm (static), else
        # from the window-attached gdf column (identical on every shard
        # row of a term, across all segments)
        if static_df is not None:
            weights = {t: qfreqs[t] * idf(n_docs, static_df[t])
                       for t in per_term}
        else:
            weights = {t: qfreqs[t] * idf(n_docs, int(rows_[0]["gdf"]))
                       for t, rows_ in per_term.items()}

        # per-term upper bound from skip metadata (block_max_tf + min
        # fieldnorm — the reference's bound inputs, bmw.c:382-396 applied to
        # the block maxima recorded at pack time)
        bounds = {}
        for t, rows in per_term.items():
            w = weights[t]
            best = math.inf
            maxtf = 0
            for r in rows:
                mn = np.asarray(r["skip_min_norm"], dtype=np.int64)
                mt = np.asarray(r["skip_max_tf"], dtype=np.int64)
                best = min(best, float(denom_norm[mn].min()))
                maxtf = max(maxtf, int(mt.max()))
            bounds[t] = term_bound(w, best, float(maxtf))

        # Vectorized MaxScore (exact): process terms in descending bound
        # order, accumulating full contributions ("essential" phase). Once
        # the summed bounds of the remaining terms cannot beat the running
        # kth-best partial score, switch to the "non-essential" phase: only
        # docs already accumulated can still make top-k, so for each
        # remaining term decode ONLY the blocks containing candidate docs
        # (random access via skip offsets) and add their contributions.
        # Strict inequalities keep score-ties exact (the reference breaks
        # ties by doc id, bmw.c:297-319). Equivalent pruning power to the
        # reference's Block-Max WAND (bmw.c:1477-1716) but expressed as
        # array ops instead of a document-at-a-time cursor walk.
        order = sorted(per_term, key=lambda t: (-bounds[t], t))
        can_prune = mode == "or" and k is not None and phrase_occs is None

        id_parts, sc_parts = [], []
        pos_parts: dict[str, tuple[np.ndarray, list]] = {}

        def accumulate():
            all_ids = np.concatenate(id_parts)
            all_sc = np.concatenate(sc_parts)
            uniq, inv = np.unique(all_ids, return_inverse=True)
            scores = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(scores, inv, all_sc)
            counts = np.zeros(uniq.size, dtype=np.int64)
            np.add.at(counts, inv, 1)
            return uniq, scores, counts

        def decode_term(t):
            ids_l, tfs_l, norms_l, poss_l = [], [], [], []
            for r in per_term[t]:
                ids, tfs, norms = decode_row(r, block_size)
                ids_l.append(ids); tfs_l.append(tfs); norms_l.append(norms)
                if phrase_occs is not None:
                    p = decode_positions(r)
                    if p is not None:
                        poss_l.extend(p)
            ids = np.concatenate(ids_l)
            tfs = np.concatenate(tfs_l).astype(np.float64)
            norms = np.concatenate(norms_l)
            if deleted is not None and deleted.size:
                pos = np.searchsorted(deleted, ids)
                pos[pos >= deleted.size] = deleted.size - 1
                dead = deleted[pos] == ids
                if dead.any():
                    alive = ~dead
                    ids, tfs, norms = ids[alive], tfs[alive], norms[alive]
                    if poss_l:
                        poss_l = [p for p, a in zip(poss_l, alive) if a]
            return ids, tfs, norms, poss_l

        uniq = scores = counts = None
        nonessential_from = len(order)
        if can_prune:
            remaining = sum(bounds[t] for t in order)
            for i, t in enumerate(order):
                if i > 0 and id_parts:
                    u, sc, _ = accumulate()
                    if sc.size >= k:
                        kth = np.partition(sc, sc.size - k)[sc.size - k]
                        if remaining < kth:
                            uniq, scores, counts = u, sc, _
                            nonessential_from = i
                            break
                w = weights[t]
                ids, tfs, norms, _p = decode_term(t)
                contrib = w * (tfs * (k1 + 1.0)) / (tfs + denom_norm[norms])
                id_parts.append(ids)
                sc_parts.append(contrib)
                remaining -= bounds[t]
        else:
            for t in order:
                w = weights[t]
                ids, tfs, norms, poss_l = decode_term(t)
                contrib = w * (tfs * (k1 + 1.0)) / (tfs + denom_norm[norms])
                id_parts.append(ids)
                sc_parts.append(contrib)
                if phrase_occs is not None:
                    pos_parts[t] = (ids, poss_l)

        if not id_parts:
            return empty
        if uniq is None:
            uniq, scores, counts = accumulate()

        if nonessential_from < len(order):
            # candidates: accumulated docs that can still reach the kth-best
            rem_terms = order[nonessential_from:]
            rem_bound = sum(bounds[t] for t in rem_terms)
            kth = np.partition(scores, scores.size - k)[scores.size - k]
            cand_mask = scores + rem_bound >= kth
            cand_ids = uniq[cand_mask]
            for t in rem_terms:
                add = _candidate_contrib(per_term[t], cand_ids, weights[t],
                                         denom_norm, k1, block_size)
                scores[cand_mask] += add
            # counts are partial under pruning; only used for 'and' (no prune)

        keep = np.ones(uniq.size, dtype=bool)
        if mode == "and":
            keep = counts >= n_qterms
        elif mode == "phrase":
            keep = _phrase_filter(uniq, pos_parts, phrase_occs)
        uniq, scores, counts = uniq[keep], scores[keep], counts[keep]

        if k is not None and uniq.size > k:
            # local top-k with (score desc, doc_id asc) tie order
            sel = np.lexsort((uniq, -scores))[:k]
            uniq, scores, counts = uniq[sel], scores[sel], counts[sel]
        return pd.DataFrame({"doc_id": uniq.astype(np.int64),
                             "raw_score": scores,
                             "n_terms": counts.astype(np.int32)})

    return kernel


def _candidate_contrib(rows, cand_ids: np.ndarray, w: float,
                        denom_norm: np.ndarray, k1: float,
                        block_size: int) -> np.ndarray:
    """Non-essential term lookup: decode only the 128-doc blocks that can
    contain a candidate doc (binary search over skip last_doc_ids — the
    reference's block seek, src/segment/scan.c:448-500) and return each
    candidate's contribution (0 where absent)."""
    out = np.zeros(cand_ids.size, dtype=np.float64)
    if cand_ids.size == 0:
        return out
    for r in rows:
        lasts = np.asarray(r["skip_last_doc_id"], dtype=np.int64)
        sel = cand_ids[(cand_ids >= int(r["min_doc_id"]))
                       & (cand_ids <= int(r["last_doc_id"]))]
        if sel.size == 0:
            continue
        blocks = np.unique(np.searchsorted(lasts, sel, side="left"))
        doc_off = np.asarray(r["skip_doc_off"], dtype=np.int64)
        tf_off = np.asarray(r["skip_tf_off"], dtype=np.int64)
        counts_b = np.asarray(r["skip_doc_count"], dtype=np.int64)
        starts = np.cumsum(np.r_[0, counts_b])[:-1]
        dbin = r["doc_ids_bin"]; tbin = r["tfs_bin"]
        nrm = np.frombuffer(r["norms_bin"], dtype=np.uint8)
        for bi in blocks:
            cnt = int(counts_b[bi])
            deltas = varbyte_decode(dbin, offset=int(doc_off[bi]), count=cnt)
            ids = np.cumsum(deltas.astype(np.int64))  # block start is absolute
            tfs = varbyte_decode(tbin, offset=int(tf_off[bi]), count=cnt).astype(np.float64)
            norms = nrm[starts[bi]: starts[bi] + cnt].astype(np.int64)
            pos = np.searchsorted(ids, sel)
            hit = (pos < ids.size)
            hit[hit] = ids[pos[hit]] == sel[hit]
            if hit.any():
                c = w * (tfs * (k1 + 1.0)) / (tfs + denom_norm[norms])
                idx = np.searchsorted(cand_ids, sel[hit])
                out[idx] += c[pos[hit]]
    return out


def _phrase_filter(uniq_ids: np.ndarray,
                   pos_parts: dict[str, tuple[np.ndarray, list]],
                   occs: list[tuple[str, int]]) -> np.ndarray:
    """Vectorized phrase check: doc qualifies if some anchor position p has
    term_i at p + offset_i for every query occurrence."""
    if not occs:
        return np.zeros(uniq_ids.size, dtype=bool)
    local = {int(d): i for i, d in enumerate(uniq_ids)}

    def keys_for(t: str, off: int) -> np.ndarray:
        if t not in pos_parts:
            return np.empty(0, dtype=np.int64)
        ids, plists = pos_parts[t]
        ks = []
        for d, pl in zip(ids, plists):
            li = local.get(int(d))
            if li is None:
                continue
            pl = np.asarray(pl, dtype=np.int64) - off
            ks.append((np.int64(li) << np.int64(32)) | (pl & np.int64(0xFFFFFFFF)))
        return np.concatenate(ks) if ks else np.empty(0, dtype=np.int64)

    t0, off0 = occs[0]
    anchors = keys_for(t0, off0)
    for t, off in occs[1:]:
        if anchors.size == 0:
            break
        anchors = anchors[np.isin(anchors, keys_for(t, off))]
    ok_local = np.unique(anchors >> np.int64(32)).astype(np.int64)
    keep = np.zeros(uniq_ids.size, dtype=bool)
    keep[ok_local] = True
    return keep


def search_index(index: "Bm25Index", query: str, k: int | None = 10,
                 mode: str = "or", round_to: int = 4) -> DataFrame:
    spark = index.spark
    opts = index.manifest.opts
    qterms = tokenize_query(query, opts.text_config)
    if not qterms:
        return spark.createDataFrame([], "doc_id long, score double")

    terms = [t for t, _ in qterms]
    n = index.manifest.total_docs
    avgdl = max(index.manifest.avgdl, 1e-9)
    qfreqs = {t: float(qf) for t, qf in qterms}

    phrase_occs = None
    if mode == "phrase":
        if not opts.store_positions:
            raise ValueError("phrase search requires an index built with store_positions=True")
        from ..spark_utils import _tokenize_with_positions
        ts, _, _, ps = _tokenize_with_positions(query, opts.text_config, {})
        occ = [(t, p) for t, pl in zip(ts, ps) for p in pl]
        base = min(p for _, p in occ)
        phrase_occs = [(t, p - base) for t, p in occ]

    from .delete import load_deletes
    deleted = load_deletes(index)

    # per-manifest-version doc_freq cache: df only changes on
    # build/append/merge, so repeated query terms skip the aggregation
    # entirely — warm queries are ONE no-shuffle-to-window job
    ver = (index.manifest.updated_at, len(index.manifest.segments))
    cached = getattr(index, "_df_cache", None)
    if cached is None or cached[0] != ver:
        index._df_cache = (ver, {})
    dfc = index._df_cache[1]
    static_df = None
    if all(t in dfc for t in terms):
        static_df = {t: dfc[t] for t in terms}

    kernel = make_segment_kernel(qfreqs, n, k, opts, avgdl, mode, phrase_occs,
                                 deleted=deleted if deleted.size else None,
                                 static_df=static_df)
    postings = _read_postings(index, terms)
    out_schema = "doc_id long, raw_score double, n_terms int"
    if static_df is None:
        # cold terms — the search job itself stays ONE job: global
        # per-term doc_freq via a window aggregate (tiny — only the query
        # terms' dictionary rows flow through it), then the per-segment
        # scoring kernel. A small extra dictionary aggregation fills the
        # cache so the NEXT query on these terms skips the window.
        from pyspark.sql import Window
        rows = postings.withColumn(
            "gdf", F.sum("doc_freq").over(Window.partitionBy("term")))
        local = rows.groupBy("segment_id").applyInPandas(kernel, out_schema)
        for r in (postings.groupBy("term")
                  .agg(F.sum("doc_freq").alias("df")).collect()):
            dfc[r["term"]] = int(r["df"])
        for t in terms:
            dfc.setdefault(t, 0)
    else:
        local = postings.groupBy("segment_id").applyInPandas(kernel, out_schema)
    result = local.select(
        "doc_id", F.round(F.col("raw_score"), round_to).alias("score"))
    result = result.orderBy(F.desc("score"), F.asc("doc_id"))
    if k is not None:
        result = result.limit(k)
    return result


def search_batch(index: "Bm25Index", queries: list[str], k: int = 10,
                 round_to: int = 4) -> DataFrame:
    """Score MANY queries in ONE Spark job (disjunctive top-k each).

    The reference's batch benchmark runs 691 queries back-to-back over one
    connection (BASELINE.md single-client batch); per-query Spark jobs pay
    ~0.5-1 s of scheduling each, so batched retrieval is the
    throughput-correct shape on a cluster: union the query terms, scan the
    index once, decode each term once per segment, accumulate per query,
    and take all per-query global top-ks with a single window.

    Returns (query_id, doc_id, score) with query_id = position in
    ``queries``, ordered by (query_id, score DESC, doc_id ASC).
    """
    spark = index.spark
    opts = index.manifest.opts
    n = index.manifest.total_docs
    avgdl = max(index.manifest.avgdl, 1e-9)
    k1, b = float(opts.k1), float(opts.b)
    block_size = opts.block_size

    per_query: list[list[tuple[str, float]]] = []
    all_terms: set[str] = set()
    for q in queries:
        qt = tokenize_query(q, opts.text_config)
        per_query.append([(t, float(f)) for t, f in qt])
        all_terms.update(t for t, _ in qt)
    if not all_terms:
        return spark.createDataFrame([], "query_id int, doc_id long, score double")

    from .delete import load_deletes
    deleted = load_deletes(index)
    deleted = deleted if deleted.size else None

    norm_len = DECODE_TABLE.astype(np.float64)
    denom_norm = k1 * (1.0 - b + b * norm_len / avgdl)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out_q, out_id, out_sc = [], [], []
        if len(pdf) == 0:
            return pd.DataFrame({"query_id": np.empty(0, np.int32),
                                 "doc_id": np.empty(0, np.int64),
                                 "raw_score": np.empty(0, np.float64)})
        # decode each term ONCE
        gdf: dict[str, int] = {}
        decoded: dict[str, tuple] = {}
        for t, grp in pdf.sort_values(["term", "shard"]).groupby("term", sort=False):
            ids_l, tfs_l, norms_l = [], [], []
            for _, r in grp.iterrows():
                ids, tfs, norms = decode_row(r, block_size)
                ids_l.append(ids); tfs_l.append(tfs); norms_l.append(norms)
            ids = np.concatenate(ids_l)
            tfs = np.concatenate(tfs_l).astype(np.float64)
            norms = np.concatenate(norms_l)
            if deleted is not None:
                pos = np.searchsorted(deleted, ids)
                pos[pos >= deleted.size] = deleted.size - 1
                alive = deleted[pos] != ids
                ids, tfs, norms = ids[alive], tfs[alive], norms[alive]
            contrib = (tfs * (k1 + 1.0)) / (tfs + denom_norm[norms])
            decoded[t] = (ids, contrib)
            gdf[t] = int(grp["gdf"].iloc[0])

        for qi, qterms in enumerate(per_query):
            parts_i, parts_c = [], []
            for t, qf in qterms:
                if t not in decoded:
                    continue
                ids, contrib = decoded[t]
                w = qf * idf(n, gdf[t])
                parts_i.append(ids)
                parts_c.append(contrib * w)
            if not parts_i:
                continue
            all_ids = np.concatenate(parts_i)
            all_sc = np.concatenate(parts_c)
            uniq, inv = np.unique(all_ids, return_inverse=True)
            scores = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(scores, inv, all_sc)
            if uniq.size > k:
                sel = np.lexsort((uniq, -scores))[:k]
                uniq, scores = uniq[sel], scores[sel]
            out_q.append(np.full(uniq.size, qi, dtype=np.int32))
            out_id.append(uniq)
            out_sc.append(scores)
        if not out_q:
            return pd.DataFrame({"query_id": np.empty(0, np.int32),
                                 "doc_id": np.empty(0, np.int64),
                                 "raw_score": np.empty(0, np.float64)})
        return pd.DataFrame({"query_id": np.concatenate(out_q),
                             "doc_id": np.concatenate(out_id),
                             "raw_score": np.concatenate(out_sc)})

    postings = _read_postings(index, sorted(all_terms))
    from pyspark.sql import Window
    rows = postings.withColumn(
        "gdf", F.sum("doc_freq").over(Window.partitionBy("term")))
    local = rows.groupBy("segment_id").applyInPandas(
        kernel, "query_id int, doc_id long, raw_score double")
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("raw_score"), F.asc("doc_id")))
    return (local.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "doc_id",
                    F.round(F.col("raw_score"), round_to).alias("score"))
            .orderBy("query_id", F.desc("score"), F.asc("doc_id")))
