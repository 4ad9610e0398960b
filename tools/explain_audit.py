"""Plan audit: capture .explain("formatted") for the headline operators
and annotate why each shape survives a 100 TB / 1000-executor scale-up.

Writes PLANS.md at the repo root. Run at sf0.01 (plans are size-
independent; only statistics change).
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def trim(plan: str, max_lines: int = 40) -> str:
    """Keep the operator tree + the most informative node details
    (PushedFilters, ReadSchema, join/exchange keys), drop the rest."""
    lines = plan.splitlines()
    # tree section ends at the first blank line after the header
    tree_end = next((i for i, ln in enumerate(lines[1:], 1)
                     if not ln.strip()), len(lines))
    tree = lines[:tree_end]
    keep_detail = [ln for ln in lines[tree_end:]
                   if re.search(r"PushedFilters|ReadSchema|Arguments: "
                                r"\[?(term|doc_id|hashpartitioning|"
                                r"SinglePartition)|BroadcastExchange|"
                                r"Location.*parquet", ln)]
    out = tree[:max_lines]
    if keep_detail:
        out += ["", "-- key node details --"] + keep_detail[:14]
    return "\n".join(out)


def main() -> int:
    import __spark_entry__ as entry
    from pg_textsearch_spark.spark_utils import get_spark, doc_term_arrays
    from pg_textsearch_spark.config import Bm25Options
    from pg_textsearch_spark.operators import dedup, similarity
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    spark = get_spark("plans", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    idx = entry._index_for(spark, sf)

    sections: list[tuple[str, str, str]] = []

    # 1. dictionary lookup: predicate pushdown into the postings parquet
    from pg_textsearch_spark.index.query import _read_postings
    lookup = _read_postings(idx, ["merge", "hash"])
    sections.append((
        "Q10 dictionary term lookup",
        formatted(lookup),
        """The scan reads ONLY the query terms' shard rows: `term IN (...)`
reaches the parquet scan as PushedFilters (row-group pruning via the
term min/max statistics written per segment = the sorted dictionary's
binary search), and ReadSchema shows column pruning. At 100 TB the scan
cost is O(query terms x segments), independent of corpus size."""))

    # 2. the one-job search plan
    sections.append((
        "Q4/Q5 top-k search (single job)",
        formatted(idx.search("hash join merge", k=10)),
        """One job end-to-end: pushdown scan -> window attaches the global
doc_freq to the term's shard rows (a shuffle over only those few rows)
-> per-segment Arrow kernel (FlatMapGroupsInPandas) computes Block-Max
-pruned local top-k -> TakeOrderedAndProject merges k rows per segment
on the driver. Nothing shuffles postings; the only data movement is
query-term dictionary rows and k results per segment. NOTE the
ReadSchema excludes pos_counts_bin/pos_deltas_bin: applyInPandas ships
every input column through Arrow (no automatic pruning), so non-phrase
queries explicitly drop the positions sidecar — this audit caught the
sidecar being read on every query of a positions-enabled index."""))

    # 3. build tokenize+pack dataflow
    arrs = doc_term_arrays(docs, "text", "doc_id",
                           Bm25Options(text_config="simple"))
    sections.append((
        "B3-B10 build dataflow (tokenize -> array-packed rows)",
        formatted(arrs),
        """The build's only wide exchange shuffles ONE array-packed row per
document (terms[], tfs[]), never a row per posting — at 33 M postings
the per-row shuffle machinery dominates otherwise. Tokenization is a
single Arrow-batched mapInPandas pass (measured 2x faster than a pure-
Catalyst expression tower, BENCH.md); everything after the packer is
embarrassingly parallel per segment."""))

    # 3b. budget spill pack stage (B13/B14): repartition + mapInPandas
    from pg_textsearch_spark.index.build import (PACK_STATS_SCHEMA,
                                                 make_spill_packer)
    sopts = Bm25Options(text_config="simple", spill_budget_bytes=1 << 20)
    sarrs = doc_term_arrays(docs, "text", "doc_id", sopts)
    spill_df = (
        sarrs.withColumn("seg", (F.col("doc_id") % 4).cast("int"))
        .repartition(8, "seg")
        .mapInPandas(make_spill_packer(
            "/tmp/pgts_plan_probe", {i: f"seg-{i:06d}" for i in range(4)},
            sopts, []), PACK_STATS_SCHEMA))
    sections.append((
        "B13/B14 budget spill pack stage (plan only)",
        formatted(spill_df),
        """With spill_budget_bytes set, the pack stage swaps
groupBy().applyInPandas (whole group materialized per task) for
repartition-by-segment + MapInPandas: the SAME single hash exchange,
but the task consumes an ITERATOR of Arrow batches and flushes an
independent level-0 sub-segment whenever a bucket's buffered working
set crosses the budget — executor memory stays bounded under
pathological doc-id skew. (Plan captured without execution.)"""))

    # 4. exact dedup: map-side partial aggregation
    sections.append((
        "exact_dedup (hash groupBy)",
        formatted(dedup.exact_dedup(docs)),
        """HashAggregate appears twice around the exchange: partial_count on
the map side collapses duplicate hashes BEFORE the shuffle, so shuffle
volume is O(distinct contents), not O(rows). sha256 runs inside
whole-stage codegen."""))

    # 5. LSH banded pair join
    sections.append((
        "minhash_candidate_pairs (LSH band join)",
        formatted(dedup.minhash_candidate_pairs(docs.limit(500))),
        """The self-join key is (band, band-hash): fanout is bounded by
bucket sizes, the classic LSH guarantee — no cartesian anything. The
signature aggregation (min over 8 hash lanes) is map-side combinable."""))

    # 6. ANN broadcast shape
    sections.append((
        "cosine_topk (brute ANN baseline)",
        formatted(similarity.cosine_topk(embs, [0, 1, 2], k=5)),
        """The tiny query set broadcasts (BroadcastExchange +
BroadcastNestedLoopJoin); the corpus side stays partitioned and is
scanned once. The per-query ranking window partitions by query_id —
k x n_queries rows into the final sort."""))

    # 7. facet composition: broadcast hash join on the top-k result
    sections.append((
        "bm25_facets (top-k join metadata)",
        formatted(entry.queries()["bm25_facets"](spark, sf)),
        """The top-k result (k rows) joins doc metadata via an explicit
F.broadcast -> BroadcastHashJoin; the facet groupBy aggregates k rows.
No shuffle touches the corpus."""))

    # 8. manifest-level term-range segment pruning (round 5): a selective
    # term must drop whole segment DIRECTORIES before the scan
    import tempfile as _tf

    from pg_textsearch_spark.index.build import Bm25Index as _B
    sp_rows = [(i, "apple banana cherry date") for i in range(200)]
    sp_rows += [(i, "quince raisin squash tomato")
                for i in range(200, 400)]
    sp_docs = spark.createDataFrame(sp_rows, "doc_id long, text string")
    sp_path = os.path.join(_tf.gettempdir(), "pgts_plans_splitvocab")
    import shutil as _sh
    if os.path.exists(sp_path):
        _sh.rmtree(sp_path)
    sp_idx = _B.build(spark, sp_docs, "text", sp_path, id_col="doc_id",
                      opts=Bm25Options(text_config="simple"),
                      num_segments=2)
    plan = formatted(sp_idx.search("banana", k=5))
    scanned = sp_idx.last_segments_scanned
    sections.append((
        "term-range segment pruning (manifest-level, round 5)",
        plan,
        f"""Two segments with disjoint vocabularies; querying 'banana'
scanned **{scanned} of 2** segment directories (Bm25Index.
last_segments_scanned — the manifest's [term_min, term_max] dropped the
other segment before Spark listed its files). At the 380 k-segment
design point this is the layer ABOVE parquet row-group statistics: a
selective term touches only the segment directories whose dictionary
range can contain it, so the scan's file list — not just its row
groups — shrinks. The InMemoryFileIndex location above shows only the
surviving segment's path."""))

    parts = ["# PLANS — .explain('formatted') audit of the headline operators",
             "",
             "Generated by tools/explain_audit.py (sf0.01; plan shapes are",
             "data-size independent). Each section: trimmed formatted plan +",
             "why the shape survives 100 TB on a 1000-executor cluster.",
             ""]
    for title, plan, why in sections:
        parts += [f"## {title}", "", "```", trim(plan), "```", "", why.strip(),
                  ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(parts) + "\n")
    print(f"wrote PLANS.md with {len(sections)} sections")
    return 0


if __name__ == "__main__":
    sys.exit(main())
