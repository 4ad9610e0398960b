"""Spark helpers: session factory, JVM-side fieldnorm quantization, and the
Arrow-batched tokenize→postings dataflow shared by the exhaustive scorer and
the segment index builder."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import Bm25Options
from .functions.fieldnorm import DECODE_TABLE, encode_fieldnorm
from .functions.tokenizer import tokenize


def get_spark(app: str = "pg_textsearch_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """local[] session tuned like the production submit would be: AQE on
    (runtime skew-join/partition-coalescing), Arrow on (all our UDFs are
    Arrow-batched), shuffle partitions sized to the core count."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    # Make the package importable in executor workers regardless of the
    # driver's cwd (production equivalent: spark-submit --py-files pgts.zip).
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + pypath if pypath else ""))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


#: fieldnorm decode table as a Column array literal (JVM-side quantization).
def _table_array():
    return F.array(*[F.lit(int(v)) for v in DECODE_TABLE])


def quantize_len_col(dl_col):
    """decode(encode(dl)) as a pure built-in expression — stays inside
    whole-stage codegen, no Python UDF: max table value <= dl."""
    return F.aggregate(
        F.filter(_table_array(), lambda v: v <= dl_col),
        F.lit(0).cast("long"),
        lambda acc, v: F.greatest(acc, v),
    )


POSTINGS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("term", T.StringType()),        # NULL marks an empty doc
    T.StructField("tf", T.IntegerType()),
    T.StructField("doc_len", T.LongType()),
    T.StructField("fieldnorm", T.IntegerType()),
    T.StructField("positions", T.ArrayType(T.IntegerType())),
])


def doc_postings(df: DataFrame, text_col: str, id_col: str,
                 opts: Bm25Options) -> DataFrame:
    """(docs) -> postings rows (doc_id, term, tf, doc_len, fieldnorm[,positions]).

    One Arrow-batched pass (mapInPandas); per-batch stem memoization makes
    the english config O(unique words). Empty docs emit a single NULL-term
    marker row so downstream doc maps see every document.

    Reference dataflow B3+B4 (src/access/build.c:974-1059,
    src/segment/fieldnorm.c:311-326).
    """
    config = opts.text_config
    want_pos = opts.store_positions

    fields = [f for f in POSTINGS_SCHEMA.fields
              if want_pos or f.name != "positions"]
    schema = T.StructType(fields)

    from .functions.tokenizer import TOKEN_PATTERN, ENGLISH_STOPWORDS, MAX_TF
    from .functions.stemmer import stem as _stem

    def run(batches):
        cache: dict = {}
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            texts = pdf["text"]
            out_ids, out_terms, out_tfs, out_dls, out_fns = [], [], [], [], []
            out_pos = []
            for did, text in zip(ids, texts):
                if want_pos:
                    terms, tfs, dl, pos = _tokenize_with_positions(
                        text, config, cache)
                else:
                    terms, tfs, dl = tokenize(text, config, cache)
                    pos = None
                if not terms:
                    out_ids.append(did); out_terms.append(None)
                    out_tfs.append(0); out_dls.append(0); out_fns.append(0)
                    if want_pos:
                        out_pos.append(None)
                    continue
                n = len(terms)
                out_ids.extend([did] * n)
                out_terms.extend(terms)
                out_tfs.extend(tfs)
                out_dls.extend([dl] * n)
                fn = int(encode_fieldnorm([dl])[0])
                out_fns.extend([fn] * n)
                if want_pos:
                    out_pos.extend(pos)
            data = {
                "doc_id": np.asarray(out_ids, dtype=np.int64),
                "term": out_terms,
                "tf": np.asarray(out_tfs, dtype=np.int32),
                "doc_len": np.asarray(out_dls, dtype=np.int64),
                "fieldnorm": np.asarray(out_fns, dtype=np.int32),
            }
            if want_pos:
                data["positions"] = out_pos
            yield pd.DataFrame(data)

    # text-array flatten (reference B2, src/types/array.c:35-70): arrays of
    # text are joined with single spaces; concat_ws skips NULL elements
    text_expr = F.col(text_col)
    if isinstance(df.schema[text_col].dataType, T.ArrayType):
        text_expr = F.concat_ws(" ", F.col(text_col))
    src = df.select(F.col(id_col).cast("long").alias("doc_id"),
                    text_expr.alias("text"))
    return src.mapInPandas(run, schema)


DOC_ARRAYS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("terms", T.ArrayType(T.StringType())),
    T.StructField("tfs", T.ArrayType(T.IntegerType())),
    T.StructField("doc_len", T.LongType()),
    T.StructField("fieldnorm", T.IntegerType()),
    T.StructField("positions", T.ArrayType(T.ArrayType(T.IntegerType()))),
])


def doc_term_arrays(df: DataFrame, text_col: str, id_col: str,
                    opts: Bm25Options, extra_cols: list[str] | None = None,
                    with_sha: bool = False) -> DataFrame:
    """(docs) -> ONE row per document: (doc_id, terms[], tfs[], doc_len,
    fieldnorm[, positions[][]]).

    The build-side dataflow shuffles THIS shape, not exploded postings: a
    posting row per (doc, term) costs row-conversion overhead per posting
    through every exchange (at 33 M postings the shuffle machinery dwarfs
    the actual pack work); one array-packed row per doc moves the same
    bytes with ~100x fewer rows, and the packer re-flattens with
    np.repeat/concatenate at C speed. Same tokenizer contract as
    doc_postings (reference B3+B4)."""
    config = opts.text_config
    want_pos = opts.store_positions
    extra_cols = extra_cols or []
    fields = [f for f in DOC_ARRAYS_SCHEMA.fields
              if want_pos or f.name != "positions"]
    schema = T.StructType(fields)
    if with_sha:
        schema = schema.add("content_sha256", T.StringType())
    for c in extra_cols:
        schema = schema.add(df.schema[c])

    def run(batches):
        import hashlib
        cache: dict = {}
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            texts = pdf["text"]
            terms_c, tfs_c, dls, pos_c = [], [], [], []
            for text in texts:
                if want_pos:
                    terms, tfs, dl, pos = _tokenize_with_positions(
                        text, config, cache)
                    pos_c.append(pos)
                else:
                    terms, tfs, dl = tokenize(text, config, cache)
                terms_c.append(terms)
                tfs_c.append(np.asarray(tfs, dtype=np.int32))
                dls.append(dl)
            dl_arr = np.asarray(dls, dtype=np.int64)
            data = {"doc_id": ids.astype(np.int64), "terms": terms_c,
                    "tfs": tfs_c,
                    "doc_len": dl_arr,
                    "fieldnorm": encode_fieldnorm(dl_arr)
                    .astype(np.int32)}
            if want_pos:
                data["positions"] = pos_c
            if with_sha:
                # per-row content invariant (input_hint): sha256 of the
                # exact string the tokenizer saw, carried into the docmap
                data["content_sha256"] = [
                    hashlib.sha256((t or "").encode("utf-8")).hexdigest()
                    for t in texts]
            for c in extra_cols:
                data[c] = pdf[c].to_numpy()
            yield pd.DataFrame(data)

    text_expr = F.col(text_col)
    if isinstance(df.schema[text_col].dataType, T.ArrayType):
        text_expr = F.concat_ws(" ", F.col(text_col))
    src = df.select(F.col(id_col).cast("long").alias("doc_id"),
                    text_expr.alias("text"),
                    *[F.col(c) for c in extra_cols])
    return src.mapInPandas(run, schema)


def _tokenize_with_positions(text, config, cache):
    """Tokenize keeping per-term position lists (positions sidecar for
    phrase queries; positions are 1-based indexes in the kept-token stream,
    like tsvector positions)."""
    from .functions.tokenizer import (
        _CONFIGS, resolve_config, MAX_WORD_LEN, MAX_TF,
        TOKEN_PATTERN, _ASCII_TOKEN_TABLE)
    if not text:
        return [], [], 0, []
    pattern, stopwords, stem_fn = _CONFIGS[resolve_config(config)]
    posmap: dict[str, list[int]] = {}
    if pattern == "pg":
        # PG default parser: positions come from the parser itself
        # (compound wholes/parts each consume one, like tsvector's)
        from .functions.pg_parser import pg_parse_typed
        for w, p, stemmable in pg_parse_typed(text):
            if stem_fn is not None and stemmable:
                lex = cache.get(w, "?")
                if lex == "?":
                    lex = (None if (stopwords and w in stopwords)
                           else stem_fn(w))
                    cache[w] = lex
                if lex is None:
                    continue   # stopword: position already consumed
            else:
                lex = w
            posmap.setdefault(lex, []).append(p)
        words = []
    elif pattern is TOKEN_PATTERN:
        # same bytes fast path as _chunk_term_freqs: token-identical to the
        # regex for the ASCII class, ~1.5x faster; decodes are memoized per
        # unique word in the shared cache (bytes keys)
        words = (text.lower().encode("utf-8", "ignore")
                 .translate(_ASCII_TOKEN_TABLE).split())
    else:
        words = pattern.findall(text.lower())
    pos = 0
    for w in words:
        if len(w) > MAX_WORD_LEN:
            continue
        if stem_fn is not None:
            lex = cache.get(w, "?")
            if lex == "?":
                sw = w.decode("ascii") if type(w) is bytes else w
                lex = None if (stopwords and sw in stopwords) else stem_fn(sw)
                cache[w] = lex
            if lex is None or lex is False:
                # None = this path's dropped marker; False = the tokenize()
                # fast path's (same cache dict may serve both)
                pos += 1  # tsvector counts stopword positions
                continue
        elif type(w) is bytes:
            lex = cache.get(w)
            if lex is None:
                lex = cache[w] = w.decode("ascii")
        else:
            lex = w
        pos += 1
        posmap.setdefault(lex, []).append(pos)
    if not posmap:
        return [], [], 0, []
    terms = sorted(posmap)
    tfs = [min(len(posmap[t]), MAX_TF) for t in terms]
    positions = [posmap[t][:MAX_TF] for t in terms]
    return terms, tfs, int(sum(tfs)), positions
