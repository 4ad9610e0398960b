"""Deterministic synthetic source-code corpus (FIXTURES.md F0).

Generates the exact input shape from BASELINE.json's input_hint —
``(repo STRING, path STRING, commit STRING, lang STRING, content STRING)``
plus a ``sha256`` column — entirely inside Spark (``spark.range`` +
an Arrow-batched pandas generator seeded per row id), so the same call is
partition-count- and parallelism-independent: row *i* has identical bytes
at local[8] and local[32], on 1 or 1000 executors. No external data.

Content model: keyword-heavy code lines (``def return import for if`` + a
brace soup) mixed with a Zipf-sampled identifier vocabulary; doc lengths
are lognormal spanning ~5..5000 tokens so fieldnorm quantization buckets
differ; common keywords land in >50% of docs, producing the skewed
mega-posting-lists the north rule's salting requirement targets.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["python", "c", "java", "go", "rust", "sql", "markdown"]
EXT = {"python": "py", "c": "c", "java": "java", "go": "go", "rust": "rs",
       "sql": "sql", "markdown": "md"}

# high-frequency keywords (>50% of docs) — the skew drivers
KEYWORDS = ("def return import for if else while class struct fn func let "
            "const static void int select from where join public private "
            "match impl type var range len print true false null").split()

VOCab_SIZE = 50_000


def _zipf_probs(n: int) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = 1.0 / ranks
    return p / p.sum()


def _gen_batch(ids: np.ndarray, seed: int, avg_tokens: int) -> pd.DataFrame:
    """Generate one Arrow batch of rows; rng is keyed per row id, never per
    partition, so output is independent of the physical split."""
    probs = _zipf_probs(VOCab_SIZE)
    # alias-free sampling via cumulative probs + per-row uniform draws
    cum = np.cumsum(probs)
    out = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    kw = np.array(KEYWORDS)
    for i in ids:
        rng = np.random.RandomState((seed * 1_000_003 + int(i)) % (2**31 - 1))
        # lognormal length, clipped to [5, 5000] tokens
        n_tok = int(np.clip(rng.lognormal(np.log(avg_tokens), 1.0), 5, 5000))
        n_kw = max(1, int(n_tok * 0.35))
        kws = kw[rng.randint(0, len(kw), n_kw)]
        idents_idx = np.searchsorted(cum, rng.random_sample(n_tok - n_kw))
        idents = np.char.add("ident_", idents_idx.astype("U8"))
        toks = np.concatenate([kws, idents])
        rng.shuffle(toks)
        # break into "lines" of ~8 tokens
        lines = [" ".join(toks[j:j + 8]) for j in range(0, len(toks), 8)]
        content = "\n".join(lines)
        lang = LANGS[int(i) % len(LANGS)]
        out["repo"].append(f"org/repo-{int(i) % 50}")
        out["path"].append(f"src/mod{int(i) // 50}/file_{int(i)}.{EXT[lang]}")
        out["commit"].append(hashlib.sha1(str(i).encode()).hexdigest())
        out["lang"].append(lang)
        out["content"].append(content)
    df = pd.DataFrame(out)
    df["sha256"] = [hashlib.sha256(c.encode()).hexdigest()
                    for c in out["content"]]
    df.insert(0, "file_id", ids.astype(np.int64))
    return df


def synth_source_corpus(spark: SparkSession, n_rows: int, seed: int = 42,
                        avg_tokens: int = 80,
                        num_partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: ``spark.range`` → ``mapInPandas``."""
    schema = ("file_id long, repo string, path string, commit string, "
              "lang string, content string, sha256 string")
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism * 2, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield _gen_batch(b["id"].to_numpy(), seed, avg_tokens)

    return (spark.range(0, n_rows, numPartitions=num_partitions)
            .mapInPandas(gen, schema))
