"""Freeze a NATURAL-prose rank-identity fixture grounded in live PostgreSQL.

The reference's primary parity evidence is per-rank score agreement on real
natural-language corpora (full Cranfield via benchmarks/run_cranfield.sh and
committed MS MARCO ground truth, benchmarks/datasets/msmarco/
validate_queries.sql:12-28). Those corpora need network downloads; this
tool builds the offline equivalent from natural English text that ships in
the container — Python standard-library docstrings (PSF-licensed prose:
real sentences, punctuation, code refs, URLs — exactly the messy input the
PG default parser exists for).

Ground truth is a LIVE PostgreSQL 15 (project recipe, port 54333):
``to_tsvector('english', doc)`` per document and per query — the exact
tokenizer+stemmer+stopword pipeline the reference inherits. The fixture
freezes (doc texts, per-doc lexeme->positions, queries, per-query lexemes)
to ``tests/data/pg_natural_fixture.json.gz``; consumers
(tools/validate_pg_natural.py, tests/test_pg_natural.py) then require the
engine's ``pg_english`` config to reproduce every tsvector token-for-token
and the index path to reproduce BM25 ranks at 1e-3.

Run: python tools/gen_pg_natural_fixture.py [n_docs] (default 1500)
"""

from __future__ import annotations

import gzip
import importlib
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "data", "pg_natural_fixture.json.gz")

PSQL = ["psql", "-h", "/tmp/pgts_pg", "-p", "54333", "-U", "pgoracle",
        "-d", "postgres", "-At", "-F", "\t"]

# fixed, alphabetized module list — determinism does not depend on what
# happens to be importable elsewhere; all are pure-stdlib and side-effect
# free to import
MODULES = sorted("""
abc argparse array ast asyncio base64 bisect calendar cmd codecs
collections collections.abc concurrent.futures configparser contextlib
copy csv ctypes dataclasses datetime decimal difflib dis doctest email
email.message enum errno fileinput fnmatch fractions functools gc getopt
getpass gettext glob graphlib gzip hashlib heapq hmac html html.parser
http http.client http.server imaplib importlib inspect io ipaddress
itertools json linecache locale logging logging.handlers lzma mailbox
math mimetypes modulefinder multiprocessing netrc numbers operator os
os.path pathlib pdb pickle pickletools pkgutil platform plistlib poplib
posixpath pprint profile pstats py_compile queue quopri random re
reprlib rlcompleter sched secrets selectors shelve shlex shutil signal
site smtplib socket socketserver sqlite3 ssl stat statistics string
stringprep struct subprocess symtable sysconfig tabnanny tarfile
tempfile textwrap threading timeit token tokenize trace traceback
tracemalloc types typing unicodedata unittest unittest.mock urllib
urllib.parse urllib.request uuid venv warnings wave weakref webbrowser
wsgiref xdrlib xml.dom xml.etree.ElementTree xml.sax xmlrpc.client
zipapp zipfile zipimport zlib
""".split())

_ASCII = re.compile(r"^[\x09\x0a\x20-\x7e]*$")


def harvest_docs(n_docs: int) -> list[str]:
    """Natural-prose docs: module + public-member docstrings, ASCII-only,
    deduped, in deterministic (module, qualname) order. Prefers >=200-char
    docstrings; falls back to progressively shorter floors (still real
    sentences) until n_docs is reached."""
    docs: list[str] = []
    seen: set[str] = set()
    for min_len in (200, 120, 80):
        docs.extend(_harvest_pass(n_docs - len(docs), min_len, seen))
        if len(docs) >= n_docs:
            break
    return docs


def _harvest_pass(n_docs: int, min_len: int, seen: set[str]) -> list[str]:
    docs: list[str] = []
    for modname in MODULES:
        try:
            mod = importlib.import_module(modname)
        except Exception:
            continue
        items: list[tuple[str, str]] = []
        d = inspect.getdoc(mod)
        if d:
            items.append(("", d))
        for name in sorted(dir(mod)):
            if name.startswith("_"):
                continue
            try:
                obj = getattr(mod, name)
            except Exception:
                continue
            if not (inspect.isclass(obj) or inspect.isroutine(obj)):
                continue
            # only members DEFINED here (avoid re-exported duplicates)
            if getattr(obj, "__module__", None) != modname:
                continue
            d = inspect.getdoc(obj)
            if d:
                items.append((name, d))
            if inspect.isclass(obj):
                for mname in sorted(vars(obj)):
                    if mname.startswith("_"):
                        continue
                    m = vars(obj)[mname]
                    if not inspect.isroutine(m):
                        continue
                    md = inspect.getdoc(m)
                    if md:
                        items.append((f"{name}.{mname}", md))
        for _, text in items:
            text = text.strip()
            if len(text) < min_len or not _ASCII.match(text):
                continue
            if "$pgts$" in text:
                continue
            key = text[:400]
            if key in seen:
                continue
            seen.add(key)
            docs.append(text)
            if len(docs) >= n_docs:
                return docs
    return docs


def pg_tsvectors(texts: list[str], config: str = "english") -> list[dict]:
    """to_tsvector(config, t) for each text via COPY into a scratch table
    (dollar-quoting per statement would be fragile at 1.5k multiline docs).
    Returns one {lexeme: [positions]} dict per text."""
    def copy_escape(s: str) -> str:
        return (s.replace("\\", "\\\\").replace("\n", "\\n")
                .replace("\t", "\\t").replace("\r", "\\r"))

    lines = [f"{i}\t{copy_escape(t)}" for i, t in enumerate(texts)]
    script = (
        "DROP TABLE IF EXISTS pgts_nat;\n"
        "CREATE TABLE pgts_nat(id int, txt text);\n"
        "COPY pgts_nat FROM STDIN;\n"
        + "\n".join(lines) + "\n\\.\n"
        f"SELECT id, to_tsvector('{config}', txt)::text FROM pgts_nat "
        "ORDER BY id;\n"
        "DROP TABLE pgts_nat;\n")
    res = subprocess.run(PSQL, input=script, text=True,
                         capture_output=True, check=True)
    out: dict[int, dict] = {}
    for line in res.stdout.splitlines():
        if "\t" not in line:
            continue
        sid, tsv = line.split("\t", 1)
        if not sid.isdigit():
            continue
        out[int(sid)] = parse_tsvector(tsv)
    return [out.get(i, {}) for i in range(len(texts))]


def parse_tsvector(s: str) -> dict[str, list[int]]:
    """Parse tsvector::text — 'lexeme':1,5 'two words':2 ... with ''
    escaping inside quotes."""
    res: dict[str, list[int]] = {}
    i, n = 0, len(s)
    while i < n:
        while i < n and s[i] == " ":
            i += 1
        if i >= n:
            break
        assert s[i] == "'", f"bad tsvector at {i}: {s[i:i+20]!r}"
        i += 1
        lex = []
        while i < n:
            if s[i] == "'":
                if i + 1 < n and s[i + 1] == "'":
                    lex.append("'")
                    i += 2
                    continue
                i += 1
                break
            lex.append(s[i])
            i += 1
        lexeme = "".join(lex)
        poss: list[int] = []
        if i < n and s[i] == ":":
            i += 1
            j = i
            while j < n and s[j] != " ":
                j += 1
            for p in s[i:j].split(","):
                p = p.rstrip("ABCD")      # weight letters (none for D)
                poss.append(int(p))
            i = j
        res[lexeme] = poss
    return res


def build_queries(tsvs: list[dict], texts: list[str],
                  per_len: int = 60) -> list[str]:
    """Natural-word queries across df bands: surface words drawn from the
    docs (so query tokenization is exercised end-to-end), 1-4 words each,
    deterministic selection by df rank."""
    import collections
    df: collections.Counter = collections.Counter()
    for tv in tsvs:
        df.update(tv.keys())
    # surface words present in the corpus, keyed by their PG lexeme
    word_re = re.compile(r"[A-Za-z]{3,}")
    surface: dict[str, str] = {}
    for t in texts[:400]:
        for w in word_re.findall(t):
            lw = w.lower()
            surface.setdefault(lw, lw)
    # rank lexemes by df desc; pick surface words that PG maps to them
    ranked = [lx for lx, _ in df.most_common() if lx.isalpha()]
    words = [w for w in sorted(surface) if len(w) >= 3]
    # deterministic interleave: spread picks across the df spectrum
    picks: list[str] = []
    step = max(1, len(words) // (per_len * 10))
    for i in range(0, len(words), step):
        picks.append(words[i])
    queries: list[str] = []
    idx = 0
    for qlen in (1, 2, 3, 4):
        for _ in range(per_len):
            qs = []
            for j in range(qlen):
                qs.append(picks[(idx * 7 + j * 13) % len(picks)])
            idx += 1
            queries.append(" ".join(qs))
    # seed a few high-df natural queries too
    for lx in ranked[:20]:
        queries.append(lx)
    return queries


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    docs = harvest_docs(n_docs)
    print(f"harvested {len(docs)} natural docs "
          f"({sum(len(d) for d in docs)} chars)")
    tsvs = pg_tsvectors(docs)
    n_empty = sum(1 for t in tsvs if not t)
    print(f"PG tsvectors done ({n_empty} empty)")
    queries = build_queries(tsvs, docs)
    qts = pg_tsvectors(queries)
    fixture = {
        "provenance": ("CPython %d.%d stdlib docstrings (PSF license); "
                       "ground truth: PostgreSQL 15 "
                       "to_tsvector('english', ...)" % sys.version_info[:2]),
        "config": "english",
        "docs": [{"id": i, "text": t} for i, t in enumerate(docs)],
        "tsvectors": [{k: v for k, v in tv.items()} for tv in tsvs],
        "queries": queries,
        "query_tsvectors": qts,
    }
    with gzip.open(OUT, "wt") as f:
        json.dump(fixture, f)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes, "
          f"{len(docs)} docs, {len(queries)} queries)")


if __name__ == "__main__":
    main()
