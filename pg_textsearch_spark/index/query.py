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
    numpy-vectorized term-at-a-time accumulation with block-max pruning
    (Q4/Q5/Q11/Q12) and a local top-k (Q6),
 5. stage 3: global ``orderBy(score desc, doc_id asc).limit(k)`` —
    Spark's TakeOrderedAndProject is the final top-k heap merge.

Block-max pruning (the reference's BMW, src/scoring/bmw.c:469-642 single
-term and 1477-1716 multi-term, safe-skip bound at bmw.c:1526-1571),
re-expressed term-at-a-time for a columnar numpy kernel:

- the FIRST term in MaxScore order (== the only term of a single-term
  query) is decoded progressively: blocks sorted by descending per-block
  upper bound, decoded in doubling batches, stopping as soon as the next
  block's bound plus the other terms' bounds cannot beat the running kth
  contribution — true block-max early termination;
- every LATER essential term decodes only blocks whose bound plus the
  other terms' bounds can beat the kth accumulated partial score (skipped
  blocks are random-accessed never — the skip entries' byte offsets give
  block-level seek, segment.decode_row_blocks);
- once the summed bounds of all remaining terms cannot beat the kth
  partial score, the non-essential phase decodes only candidate-bearing
  blocks (``_candidate_contrib``).

All thresholds carry an ``eps = 10^-round_to`` slack so pruning can never
disturb ties at the ROUNDED-score boundary the public API (and the DuckDB
oracle) orders by. Per-kernel ``blocks_decoded``/``blocks_total`` counters
(the reference's log_bmw_stats analogue) are exposed via ``profile=True``
/ :func:`search_profiled`.

Tombstone masking is distributed: the driver slices the sorted tombstone
array to each segment's [min_doc_id, max_doc_id] from the manifest and
ships the per-segment dict ONCE per executor as a Spark broadcast
(delete.tombstone_broadcast) — the Spark analogue of the reference's
per-segment alive bitset locality (src/segment/alive_bitset.c).
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
from .segment import decode_positions, decode_row, decode_row_blocks

if TYPE_CHECKING:
    from .build import Bm25Index


def idf(n_docs: int, df_t: int) -> float:
    return math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))


def _resolve_k(k, opts: Bm25Options) -> int | None:
    """Public ``k`` contract (reference src/index/limit.c:22-28):
    ``k=None`` applies the ``default_limit`` GUC; the explicit string
    ``"all"`` is the unbounded escape hatch for oracle/exhaustive paths."""
    if k == "all":
        return None
    if k is None:
        return int(opts.default_limit)
    return int(k)


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
                        deleted_bc=None, static_df: dict[str, int] | None = None,
                        round_to: int = 4, profile: bool = False):
    """Build the applyInPandas kernel. ``qfreqs``: term -> query frequency.

    IDFs are computed inside the kernel from the ``gdf`` column (global
    doc_freq attached by a window aggregate in the same job — Q2 without a
    separate driver round-trip; every segment sees the same global value,
    so scores are independent of segment layout, SURVEY.md §1.4).

    ``deleted_bc``: Spark broadcast (or plain dict in unit tests) mapping
    segment_id -> sorted tombstoned ids overlapping that segment's doc
    range. Dead postings are masked right after block decode — before any
    accumulation or pruning — so thresholds only ever see alive docs (the
    reference checks its alive bitset per hit the same way). Stats stay
    dead-inclusive until a merge, matching reference VACUUM semantics
    (SURVEY.md §2.2 M4)."""
    k1, b = float(opts.k1), float(opts.b)
    # norm code -> BM25 tf-denominator length component, precomputed once
    norm_len = DECODE_TABLE.astype(np.float64)
    denom_norm = k1 * (1.0 - b + b * norm_len / avgdl)  # indexed by norm code
    # rounding slack: the public ordering rounds scores to `round_to`
    # decimals, so pruning must only drop docs strictly below the kth
    # ROUNDED score; eps covers a full ulp of the rounded digit
    eps = 10.0 ** (-round_to)
    n_qterms = len(qfreqs)

    out_cols = ["doc_id", "raw_score", "n_terms"]
    if profile:
        out_cols += ["segment_id", "blocks_decoded", "blocks_total"]

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        seg_id = str(key[0])
        spec = {"doc_id": "int64", "raw_score": "float64", "n_terms": "int32",
                "segment_id": "object", "blocks_decoded": "int64",
                "blocks_total": "int64"}
        empty = pd.DataFrame({c: pd.Series(dtype=spec[c]) for c in out_cols})
        if len(pdf) == 0:
            return empty
        per_term: dict[str, list[dict]] = {}
        for rec in pdf.sort_values(["term", "shard"]).to_dict("records"):
            per_term.setdefault(rec["term"], []).append(rec)

        deleted = None
        if deleted_bc is not None:
            dmap = getattr(deleted_bc, "value", deleted_bc)
            deleted = dmap.get(seg_id) if dmap else None

        # global IDF: from the driver's df cache when warm (static), else
        # from the window-attached gdf column (identical on every shard
        # row of a term, across all segments)
        if static_df is not None:
            weights = {t: qfreqs[t] * idf(n_docs, static_df[t])
                       for t in per_term}
        else:
            weights = {t: qfreqs[t] * idf(n_docs, int(rows_[0]["gdf"]))
                       for t, rows_ in per_term.items()}

        # per-block upper bounds from skip metadata (block_max_tf + min
        # fieldnorm — the reference's bound inputs, bmw.c:382-396 applied
        # to the block maxima recorded at pack time); term bound = max
        blk_bounds: dict[str, list[np.ndarray]] = {}
        bounds: dict[str, float] = {}
        blocks_total = 0
        counters = {"decoded": 0}
        for t, rows in per_term.items():
            w = weights[t]
            bl = []
            for r in rows:
                mn = np.asarray(r["skip_min_norm"], dtype=np.int64)
                mt = np.asarray(r["skip_max_tf"], dtype=np.float64)
                bl.append(w * (mt * (k1 + 1.0)) / (mt + denom_norm[mn]))
                blocks_total += mn.size
            blk_bounds[t] = bl
            bounds[t] = float(max(a.max() for a in bl))

        def mask_deleted(ids, tfs, norms, poss_l=None):
            if deleted is None or not deleted.size or not ids.size:
                return ids, tfs, norms, poss_l
            pos = np.searchsorted(deleted, ids)
            pos[pos >= deleted.size] = deleted.size - 1
            dead = deleted[pos] == ids
            if dead.any():
                alive = ~dead
                ids, tfs, norms = ids[alive], tfs[alive], norms[alive]
                if poss_l:
                    poss_l = [p for p, a in zip(poss_l, alive) if a]
            return ids, tfs, norms, poss_l

        def decode_term_full(t):
            ids_l, tfs_l, norms_l, poss_l = [], [], [], []
            for r in per_term[t]:
                ids, tfs, norms = decode_row(r, opts.block_size, opts.codec)
                counters["decoded"] += int(r["num_blocks"])
                ids_l.append(ids); tfs_l.append(tfs); norms_l.append(norms)
                if phrase_occs is not None:
                    p = decode_positions(r)
                    if p is not None:
                        poss_l.extend(p)
            ids = np.concatenate(ids_l)
            tfs = np.concatenate(tfs_l).astype(np.float64)
            norms = np.concatenate(norms_l)
            return mask_deleted(ids, tfs, norms, poss_l)

        def decode_term_masked(t, threshold, other_bound):
            """Decode only blocks whose bound can beat ``threshold``."""
            ids_l, tfs_l, norms_l = [], [], []
            for r, bnds in zip(per_term[t], blk_bounds[t]):
                sel = np.flatnonzero(bnds + other_bound >= threshold - eps)
                if sel.size == 0:
                    continue
                if sel.size == bnds.size:
                    ids, tfs, norms = decode_row(r, opts.block_size, opts.codec)
                else:
                    ids, tfs, norms = decode_row_blocks(r, sel, opts.codec)
                counters["decoded"] += int(sel.size)
                ids_l.append(ids)
                tfs_l.append(tfs.astype(np.float64))
                norms_l.append(norms)
            if not ids_l:
                e = np.empty(0, dtype=np.int64)
                return e, e.astype(np.float64), e, None
            ids = np.concatenate(ids_l)
            tfs = np.concatenate(tfs_l)
            norms = np.concatenate(norms_l)
            return mask_deleted(ids, tfs, norms)

        def decode_term_progressive(t, other_bound):
            """First-term (or single-term) block-max early termination:
            decode blocks in descending bound order, in doubling batches,
            stopping once the next bound + other terms' bounds cannot beat
            the kth contribution seen so far. Returns (ids, contribs)."""
            w = weights[t]
            rows = per_term[t]
            flat_row, flat_blk, flat_bnd = [], [], []
            for ri, bnds in enumerate(blk_bounds[t]):
                flat_row.append(np.full(bnds.size, ri, dtype=np.int64))
                flat_blk.append(np.arange(bnds.size, dtype=np.int64))
                flat_bnd.append(bnds)
            frow = np.concatenate(flat_row)
            fblk = np.concatenate(flat_blk)
            fbnd = np.concatenate(flat_bnd)
            # deterministic order: bound DESC, then (row, block) ASC
            order_b = np.lexsort((fblk, frow, -fbnd))
            frow, fblk, fbnd = frow[order_b], fblk[order_b], fbnd[order_b]

            ids_parts, sc_parts = [], []
            n_seen = 0
            pos = 0
            batch = 4
            total = fbnd.size
            while pos < total:
                take = min(batch, total - pos)
                sel_r, sel_b = frow[pos:pos + take], fblk[pos:pos + take]
                for ri in np.unique(sel_r):
                    blks = np.sort(sel_b[sel_r == ri])
                    r = rows[int(ri)]
                    if blks.size == int(r["num_blocks"]):
                        ids, tfs, norms = decode_row(r, opts.block_size, opts.codec)
                    else:
                        ids, tfs, norms = decode_row_blocks(r, blks,
                                                            opts.codec)
                    counters["decoded"] += int(blks.size)
                    ids, tfs, norms, _ = mask_deleted(
                        ids, tfs.astype(np.float64), norms)
                    if ids.size:
                        contrib = (w * (tfs * (k1 + 1.0))
                                   / (tfs + denom_norm[norms]))
                        ids_parts.append(ids)
                        sc_parts.append(contrib)
                        n_seen += ids.size
                pos += take
                batch = min(batch * 2, 1024)
                if pos >= total or k is None or n_seen < k:
                    continue
                allc = np.concatenate(sc_parts)
                kth = np.partition(allc, allc.size - k)[allc.size - k]
                if fbnd[pos] + other_bound < kth - eps:
                    break
            if not ids_parts:
                e = np.empty(0, dtype=np.int64)
                return e, e.astype(np.float64)
            return np.concatenate(ids_parts), np.concatenate(sc_parts)

        # Vectorized MaxScore (exact): process terms in descending bound
        # order, accumulating full contributions ("essential" phase) with
        # the per-block skipping above. Once the summed bounds of the
        # remaining terms cannot beat the running kth-best partial score,
        # switch to the "non-essential" phase: only docs already
        # accumulated can still make top-k, so for each remaining term
        # decode ONLY the blocks containing candidate docs (random access
        # via skip offsets) and add their contributions. Strict
        # eps-slackened inequalities keep rounded-score ties exact (the
        # reference breaks ties by doc id, bmw.c:297-319).
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

        uniq = scores = counts = None
        nonessential_from = len(order)
        if can_prune:
            total_bound = sum(bounds.values())
            remaining = total_bound
            for i, t in enumerate(order):
                other = total_bound - bounds[t]
                if i == 0:
                    ids, contrib = decode_term_progressive(t, other)
                    id_parts.append(ids)
                    sc_parts.append(contrib)
                else:
                    u, sc, cn = accumulate()
                    kth = None
                    if sc.size >= k:
                        kth = np.partition(sc, sc.size - k)[sc.size - k]
                        if remaining < kth - eps:
                            uniq, scores, counts = u, sc, cn
                            nonessential_from = i
                            break
                    w = weights[t]
                    if kth is None:
                        ids, tfs, norms, _p = decode_term_full(t)
                    else:
                        ids, tfs, norms, _p = decode_term_masked(t, kth, other)
                    contrib = w * (tfs * (k1 + 1.0)) / (tfs + denom_norm[norms])
                    id_parts.append(ids)
                    sc_parts.append(contrib)
                remaining -= bounds[t]
        else:
            for t in order:
                w = weights[t]
                ids, tfs, norms, poss_l = decode_term_full(t)
                contrib = w * (tfs * (k1 + 1.0)) / (tfs + denom_norm[norms])
                id_parts.append(ids)
                sc_parts.append(contrib)
                if phrase_occs is not None:
                    pos_parts[t] = (ids, poss_l)

        if not id_parts or not any(a.size for a in id_parts):
            return empty
        if uniq is None:
            uniq, scores, counts = accumulate()

        if nonessential_from < len(order):
            # candidates: accumulated docs that can still reach the kth-best
            rem_terms = order[nonessential_from:]
            rem_bound = sum(bounds[t] for t in rem_terms)
            kth = np.partition(scores, scores.size - k)[scores.size - k]
            cand_mask = scores + rem_bound >= kth - eps
            cand_ids = uniq[cand_mask]
            for t in rem_terms:
                add = _candidate_contrib(per_term[t], cand_ids, weights[t],
                                         denom_norm, k1, deleted, counters,
                                         opts.codec)
                scores[cand_mask] += add
            # counts are partial under pruning; only used for 'and' (no prune)

        keep = np.ones(uniq.size, dtype=bool)
        if mode == "and":
            keep = counts >= n_qterms
        elif mode == "phrase":
            keep = _phrase_filter(uniq, pos_parts, phrase_occs)
        uniq, scores, counts = uniq[keep], scores[keep], counts[keep]

        if k is not None and uniq.size > k:
            # local top-k with (ROUNDED score desc, doc_id asc) tie order —
            # the same ordering the global stage and the oracle use, so the
            # k-boundary cut can never disagree across rounding ties
            sel = np.lexsort((uniq, -np.round(scores, round_to)))[:k]
            uniq, scores, counts = uniq[sel], scores[sel], counts[sel]
        out = pd.DataFrame({"doc_id": uniq.astype(np.int64),
                            "raw_score": scores,
                            "n_terms": counts.astype(np.int32)})
        if profile:
            out["segment_id"] = seg_id
            out["blocks_decoded"] = np.int64(counters["decoded"])
            out["blocks_total"] = np.int64(blocks_total)
        return out

    return kernel


def _candidate_contrib(rows, cand_ids: np.ndarray, w: float,
                       denom_norm: np.ndarray, k1: float,
                       deleted: np.ndarray | None = None,
                       counters: dict | None = None,
                       codec: str = "varbyte") -> np.ndarray:
    """Non-essential term lookup: decode only the blocks that can contain a
    candidate doc (binary search over skip last_doc_ids — the reference's
    block seek, src/segment/scan.c:448-500) and return each candidate's
    contribution (0 where absent)."""
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
        if counters is not None:
            counters["decoded"] += int(blocks.size)
        ids, tfs, norms = decode_row_blocks(r, blocks, codec)
        if deleted is not None and deleted.size and ids.size:
            pos_d = np.searchsorted(deleted, ids)
            pos_d[pos_d >= deleted.size] = deleted.size - 1
            alive = deleted[pos_d] != ids
            ids, tfs, norms = ids[alive], tfs[alive], norms[alive]
        if not ids.size:
            continue
        pos = np.searchsorted(ids, sel)
        hit = (pos < ids.size)
        hit[hit] = ids[pos[hit]] == sel[hit]
        if hit.any():
            tfd = tfs.astype(np.float64)
            c = w * (tfd * (k1 + 1.0)) / (tfd + denom_norm[norms])
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


def _search_local(index: "Bm25Index", query: str, k, mode: str,
                  round_to: int, profile: bool):
    """Shared plan builder: returns the per-segment kernel output DataFrame
    (doc_id, raw_score, n_terms[, profile cols]) plus the resolved k."""
    spark = index.spark
    opts = index.manifest.opts
    k = _resolve_k(k, opts)
    qterms = tokenize_query(query, opts.text_config)
    if not qterms:
        return None, k

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

    from .delete import tombstone_broadcast
    deleted_bc = tombstone_broadcast(index)

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
                                 deleted_bc=deleted_bc, static_df=static_df,
                                 round_to=round_to, profile=profile)
    postings = _read_postings(index, terms)
    if phrase_occs is None:
        # applyInPandas ships every input column to the kernel (no
        # automatic pruning through the Arrow boundary) — drop the
        # positions sidecar unless this is a phrase query. On a
        # positions-enabled index the sidecar is the biggest column.
        pos_cols = [c for c in ("pos_counts_bin", "pos_deltas_bin")
                    if c in postings.columns]
        if pos_cols:
            postings = postings.drop(*pos_cols)
    out_schema = "doc_id long, raw_score double, n_terms int"
    if profile:
        out_schema += ", segment_id string, blocks_decoded long, blocks_total long"
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
    return local, k


def search_index(index: "Bm25Index", query: str, k: int | None | str = 10,
                 mode: str = "or", round_to: int = 4) -> DataFrame:
    local, k = _search_local(index, query, k, mode, round_to, profile=False)
    if local is None:
        return index.spark.createDataFrame([], "doc_id long, score double")
    result = local.select(
        "doc_id", F.round(F.col("raw_score"), round_to).alias("score"))
    result = result.orderBy(F.desc("score"), F.asc("doc_id"))
    if k is not None:
        result = result.limit(k)
    return result


def search_profiled(index: "Bm25Index", query: str, k: int | None | str = 10,
                    mode: str = "or", round_to: int = 4):
    """Eager search returning (top-k pandas frame, BMW stats dict) — the
    reference's ``log_bmw_stats`` analogue. Stats count posting blocks
    actually decoded vs present across all query terms and segments."""
    local, k = _search_local(index, query, k, mode, round_to, profile=True)
    if local is None:
        return (pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "score": pd.Series(dtype="float64")}),
                {"blocks_decoded": 0, "blocks_total": 0, "segments": 0})
    pdf = local.toPandas()
    seg = pdf.drop_duplicates("segment_id")
    stats = {"blocks_decoded": int(seg["blocks_decoded"].sum()),
             "blocks_total": int(seg["blocks_total"].sum()),
             "segments": int(len(seg))}
    pdf = pdf.assign(score=pdf["raw_score"].round(round_to))
    pdf = pdf.sort_values(["score", "doc_id"], ascending=[False, True])
    if k is not None:
        pdf = pdf.head(k)
    index.last_bmw_stats = stats
    return pdf[["doc_id", "score"]].reset_index(drop=True), stats


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
    ``queries``, ordered by (query_id, score DESC, doc_id ASC). All cuts
    (per-segment and global) order by the ROUNDED score, mirroring
    ``search_index`` and the oracle, so k-boundary ties agree.
    """
    spark = index.spark
    opts = index.manifest.opts
    n = index.manifest.total_docs
    avgdl = max(index.manifest.avgdl, 1e-9)
    k1, b = float(opts.k1), float(opts.b)
    block_size = opts.block_size
    codec = opts.codec

    per_query: list[list[tuple[str, float]]] = []
    all_terms: set[str] = set()
    for q in queries:
        qt = tokenize_query(q, opts.text_config)
        per_query.append([(t, float(f)) for t, f in qt])
        all_terms.update(t for t, _ in qt)
    if not all_terms:
        return spark.createDataFrame([], "query_id int, doc_id long, score double")

    from .delete import tombstone_broadcast
    deleted_bc = tombstone_broadcast(index)

    norm_len = DECODE_TABLE.astype(np.float64)
    denom_norm = k1 * (1.0 - b + b * norm_len / avgdl)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        seg_id = str(key[0])
        out_q, out_id, out_sc = [], [], []
        if len(pdf) == 0:
            return pd.DataFrame({"query_id": np.empty(0, np.int32),
                                 "doc_id": np.empty(0, np.int64),
                                 "raw_score": np.empty(0, np.float64)})
        deleted = None
        if deleted_bc is not None:
            dmap = getattr(deleted_bc, "value", deleted_bc)
            deleted = dmap.get(seg_id) if dmap else None
        # decode each term ONCE
        gdf: dict[str, int] = {}
        decoded: dict[str, tuple] = {}
        for t, grp in pdf.sort_values(["term", "shard"]).groupby("term", sort=False):
            ids_l, tfs_l, norms_l = [], [], []
            for r in grp.to_dict("records"):
                ids, tfs, norms = decode_row(r, block_size, codec)
                ids_l.append(ids); tfs_l.append(tfs); norms_l.append(norms)
            ids = np.concatenate(ids_l)
            tfs = np.concatenate(tfs_l).astype(np.float64)
            norms = np.concatenate(norms_l)
            if deleted is not None and deleted.size:
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
                # cut by rounded score (see docstring)
                sel = np.lexsort((uniq, -np.round(scores, round_to)))[:k]
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
    postings = postings.drop(*[c for c in ("pos_counts_bin",
                                           "pos_deltas_bin")
                               if c in postings.columns])
    from pyspark.sql import Window
    rows = postings.withColumn(
        "gdf", F.sum("doc_freq").over(Window.partitionBy("term")))
    local = rows.groupBy("segment_id").applyInPandas(
        kernel, "query_id int, doc_id long, raw_score double")
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc(F.round(F.col("raw_score"), round_to)),
                  F.asc("doc_id")))
    return (local.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "doc_id",
                    F.round(F.col("raw_score"), round_to).alias("score"))
            .orderBy("query_id", F.desc("score"), F.asc("doc_id")))
