"""PostgreSQL default-parser token classes — behavioral clone (ASCII).

The reference engine inherits PostgreSQL's default text-search parser via
``to_tsvector`` (reference README.md:581-589, src/access/build.c:995-1007):
URLs, emails, hosts, file paths, version numbers, signed numbers and
hyphenated compound words are all first-class token types, not just
``[a-z0-9_]+`` runs. This module reproduces that classification for the
``pg`` text config.

Implemented from BLACK-BOX observation of PostgreSQL 15's
``to_tsvector('simple', ...)`` / ``ts_debug`` on an ASCII battery (no PG
source involved); parity is frozen in ``tests/data/tsvector_vectors.json``
(generated against a live PG by ``tools/gen_tsvector_vectors.py``) and
enforced by ``tests/test_pg_parser.py``.

Scope notes (documented limits, not bugs):
- ASCII letters only: the ground-truth instance runs a C locale where
  non-ASCII bytes are separators. A UTF-8 PG additionally classifies
  accented words; the fr/de/es configs keep their Latin-1 regex tokenizer.
- Token emission order and 1-based positions mirror tsvector: compound
  tokens (urls, hyphenated words) emit the whole token first, then each
  component, every emission advancing the position counter.

Observed classification rules (each pinned by a fixture):
- HOST: dotted labels ([alnum_] with single interior hyphens); the match
  may cut mid-run at a hyphen, and the final label must be >= 2 chars of
  pure alpha (a real TLD). ``1.ab`` is a host; ``e.g`` is not (file).
- URL: host[:port] followed by ``/`` + at least one path char emits
  url + host[:port] + path; a ``proto://`` prefix is dropped.
- EMAIL: ``local@domain``, local = letter [alnum .]*, domain host-shaped
  with the strict TLD rule.
- FILE: segments joined by '/' or '.'; '.'-only files need a letter in
  the first segment; segments may contain hyphens except the first;
  '.'/'..' are valid '/'-bounded segments; trailing dots are not.
- NUMBERS: version d.d.d(+) (never signed), sfloat d.de[+-]d, float d.d,
  int d+ (each taking one leading sign), digit-letter runs are numwords.
- HWORD: hyphen compounds need a letter in EVERY part; whole then parts.
- ``<tag>`` / ``&entity;`` skip wholesale; ``..`` right after a token is
  (bizarrely, but faithfully) a file token; other punctuation separates.
"""

from __future__ import annotations

import re

__all__ = ["pg_parse", "pg_lexemes"]

MAX_LEXEME = 2047        # PG MAXSTRLEN: longer lexemes are dropped
MAX_POS = 16383          # tsvector position clamp

_TAG = re.compile(r"<(?:!--.*?--\s*|!?/?[a-zA-Z][^<>]*)>", re.S)
_ENTITY = re.compile(r"&(?:[a-zA-Z]+|#[0-9]+|#[xX][0-9a-fA-F]+);")
_PROTO = re.compile(r"[a-zA-Z]+://")
_EMAIL = re.compile(
    r"[a-zA-Z][a-zA-Z0-9]*(?:\.[a-zA-Z0-9]+)*"
    r"@"
    r"(?:[a-zA-Z0-9_](?:[a-zA-Z0-9_-]*[a-zA-Z0-9_])?\.)+"
    r"([a-zA-Z]{2,})(?![a-zA-Z0-9-])")
_PATH = re.compile(r"/[^\s<>\"]*")
_COMPOUND = re.compile(r"[a-zA-Z0-9]+(?:-[a-zA-Z0-9]+)+")
_VERSION = re.compile(r"[0-9]+(?:\.[0-9]+){2,}(?!\.?[0-9])")
_SFLOAT = re.compile(r"[0-9]+\.[0-9]+[eE][+-]?[0-9]+")
_FLOAT = re.compile(r"[0-9]+\.[0-9]+(?!\.?[0-9])")
_NUMWORD = re.compile(r"[0-9][a-zA-Z0-9]*[a-zA-Z][a-zA-Z0-9]*")
_INT = re.compile(r"[0-9]+")
_WORDRUN = re.compile(r"[a-zA-Z0-9]+")
_LETTER = re.compile(r"[a-zA-Z]")
# a maximal run of chars a host/file token can live in
_DOTRUN = re.compile(r"[a-zA-Z0-9_](?:[a-zA-Z0-9_.\-]*[a-zA-Z0-9_])?")
_PORT = re.compile(r":[0-9]+")


def pg_parse(text: str) -> list[tuple[str, int]]:
    """text -> [(lexeme, position)] under the PG default parser + simple
    dictionary (lowercase) contract. Positions are 1-based and clamp at
    16383 like tsvector's."""
    return [(lex, pos) for lex, pos, _ in pg_parse_typed(text)]


def pg_parse_typed(text: str) -> list[tuple[str, int, bool]]:
    """Like :func:`pg_parse` but each lexeme carries ``stemmable``: True
    for the word classes PG's english config routes through the stemmer
    (asciiword / asciihword / hword_asciipart — pure-alpha words and
    hyphen-compound wholes/parts), False for urls, emails, hosts, files,
    numbers and digit-bearing words (numword/numhword/hword_numpart),
    which PG maps to the simple dictionary."""
    out: list[tuple[str, int, bool]] = []
    pos = 0

    def emit(lex: str) -> None:
        nonlocal pos
        if len(lex) > MAX_LEXEME:
            return
        pos += 1
        stemmable = lex.replace("-", "").isalpha()
        out.append((lex.lower(), min(pos, MAX_POS), stemmable))

    i = 0
    n = len(text)
    prev_token_end = -1            # index just past the last emitted token
    while i < n:
        c = text[i]
        if c == "<":
            m = _TAG.match(text, i)
            i = m.end() if m else i + 1
            continue
        if c == "&":
            m = _ENTITY.match(text, i)
            if m:
                i = m.end()
                continue
            i += 1
            continue
        if c == ".":
            # the '..'-after-a-token quirk: exactly two dots immediately
            # following an emitted token, then a boundary -> file '..'
            if (i == prev_token_end and text[i:i + 2] == ".."
                    and (i + 2 >= n or (text[i + 2] != "."
                                        and not text[i + 2].isalnum()))):
                emit("..")
                i += 2
                prev_token_end = i
                continue
            i += 1
            continue
        if c == "/":
            adv = _try_file(text, i, emit)
            if adv:
                i += adv
                prev_token_end = i
                continue
            i += 1
            continue
        if c in "+-" and i + 1 < n and text[i + 1].isdigit():
            i += _scan_number(text, i, emit, signed=True)
            prev_token_end = i
            continue
        if c.isalpha():
            adv = (_try_protocol(text, i, emit)
                   or _try_email(text, i, emit)
                   or _try_hosty(text, i, emit)
                   or _try_compound(text, i, emit))
            if adv:
                i += adv
                prev_token_end = i
                continue
            m = _WORDRUN.match(text, i)
            emit(m.group(0))
            i = m.end()
            prev_token_end = i
            continue
        if c.isdigit():
            adv = (_try_hosty(text, i, emit)
                   or _try_compound(text, i, emit))
            if adv:
                i += adv
                prev_token_end = i
                continue
            i += _scan_number(text, i, emit, signed=False)
            prev_token_end = i
            continue
        i += 1
    return out


def pg_lexemes(text: str) -> list[str]:
    return [lex for lex, _ in pg_parse(text)]


# ------------------------------------------------------------ sub-parsers
# Each _try_* returns the number of characters consumed (0 = no match).

def _try_protocol(text: str, i: int, emit) -> int:
    m = _PROTO.match(text, i)
    if not m:
        return 0
    sub = _try_hosty(text, m.end(), emit, after_proto=True)
    if not sub:
        return 0        # 'mailto:' etc: letters re-parse as a plain word
    return (m.end() - i) + sub


def _try_email(text: str, i: int, emit) -> int:
    m = _EMAIL.match(text, i)
    if not m:
        return 0
    emit(m.group(0))
    return m.end() - i


def _host_prefix(run: str) -> str | None:
    """Longest prefix of a [alnum_.-] run that is a valid HOST: dotted
    labels, single interior hyphens, final label pure-alpha len >= 2.
    The cut may land mid-run at a hyphen or dot."""
    # candidate cut points: end of run, before each '.' and each '-'
    best = None
    # enumerate prefixes ending at label boundaries, longest first
    cuts = [len(run)] + [j for j in range(len(run) - 1, 0, -1)
                         if run[j] in ".-"]
    for j in cuts:
        cand = run[:j]
        if "." not in cand or cand.endswith((".", "-")):
            continue
        last = cand.rsplit(".", 1)[-1]
        if len(last) >= 2 and last.isalpha():
            if _host_labels_ok(cand):
                if best is None or len(cand) > len(best):
                    best = cand
    return best


def _host_labels_ok(cand: str) -> bool:
    for lbl in cand.split("."):
        if not lbl or lbl.startswith("-") or lbl.endswith("-") or "--" in lbl:
            return False
    return True


def _file_prefix(run: str, absolute: bool) -> str | None:
    """Longest valid FILE token over a [alnum_.-/]-ish run.

    Segments join with '/' or '.'; '.'-only files need a letter in the
    first segment; hyphens are allowed in every segment EXCEPT the first;
    '.'/'..' are valid interior '/'-bounded segments; no segment may end
    with a dot (trailing dots stay outside the token)."""
    segs = []
    i = 0
    n = len(run)
    saw_sep = absolute
    while i < n:
        if run[i] == "/":
            saw_sep = True
            i += 1
            if i < n and run[i] == "/":
                break                        # '//' terminates a file
            continue
        # only the FIRST segment (before any separator) excludes hyphens
        m = re.match(r"[a-zA-Z0-9_\-]+" if saw_sep
                     else r"[a-zA-Z0-9_]+", run[i:])
        if m:
            segs.append((i, i + m.end()))
            i += m.end()
            saw_sep = True
            if i < n and run[i] == ".":
                # dot-joined pieces may hold interior hyphens, not edges
                nm = re.match(
                    r"(?:\.[a-zA-Z0-9_](?:[a-zA-Z0-9_\-]*[a-zA-Z0-9_])?)+",
                    run[i:])
                if nm:
                    segs[-1] = (segs[-1][0], i + nm.end())
                    i += nm.end()
            if i < n and run[i] == "/":
                continue
            break
        dm = re.match(r"\.{1,2}(?=/|$)", run[i:])
        if dm and saw_sep:
            segs.append((i, i + dm.end()))
            i += dm.end()
            if i < n and run[i] == "/":
                continue
            break
        break
    if not segs:
        return None
    end = segs[-1][1]
    tok = ("/" + run[:end]) if absolute else run[:end]
    if tok.rsplit("/", 1)[-1].strip("."):   # final seg is not pure dots
        tok = tok.rstrip(".")
    if not tok.strip("/"):
        return None
    body = tok.lstrip("/")
    if absolute:
        return tok                       # '/x', '/..' etc are valid files
    if "/" not in body and "." not in body:
        return None                      # no separator -> not a file
    if "/" not in body:
        firstseg = body.split(".", 1)[0]
        if not _LETTER.search(firstseg):
            return None                  # dot-file needs a letter up front
    return tok


def _try_hosty(text: str, i: int, emit, after_proto: bool = False) -> int:
    """host / url / dotted-file starting at an alnum char."""
    m = _DOTRUN.match(text, i)
    if not m:
        return 0
    run = m.group(0)
    host = _host_prefix(run)
    if host is not None:
        end = i + len(host)
        pm = _PORT.match(text, end)
        port = pm.group(0) if pm and len(host) == len(run) else ""
        end += len(port)
        if end < len(text) and text[end] == "/":
            path = _PATH.match(text, end).group(0)
            if len(path) >= 2:
                emit(host + port + path)
                emit(host + port)
                emit(path)
                return end + len(path) - i
            # bare '/': host only, slash re-parses to nothing
        if len(host) == len(run) or run[len(host)] in ".-":
            emit(host + port)
            return end - i
    if after_proto:
        # a protocol prefix waives the TLD rule, but then the token stays
        # WHOLE: 'http://a.b/x' is one url token, no host/path parts
        if "." not in run:
            return 0
        end = i + len(run)
        pm = _PORT.match(text, end)
        port = pm.group(0) if pm else ""
        end += len(port)
        if end < len(text) and text[end] == "/":
            path = _PATH.match(text, end).group(0)
            if len(path) >= 2:
                emit(run + port + path)
                return end + len(path) - i
        emit(run + port)
        return end - i
    # dotted/slashed file (possibly spanning '/' beyond the dot-run)
    frun_m = re.match(r"[a-zA-Z0-9_.\-/]+", text[i:])
    ftok = _file_prefix(frun_m.group(0), absolute=False) if frun_m else None
    if ftok:
        emit(ftok)
        return len(ftok)
    return 0


def _try_file(text: str, i: int, emit) -> int:
    """absolute file at '/'."""
    if i + 1 < len(text) and text[i + 1] == "/":
        return 0                        # '//' never starts a file
    m = re.match(r"/[a-zA-Z0-9_.\-/]*", text[i:])
    if not m:
        return 0
    body = m.group(0)[1:]
    ftok = _file_prefix(body, absolute=True)
    if ftok is None:
        return 0
    emit(ftok)
    return len(ftok)


def _try_compound(text: str, i: int, emit) -> int:
    m = _COMPOUND.match(text, i)
    if not m:
        return 0
    parts = m.group(0).split("-")
    k = 0
    while k < len(parts) and _LETTER.search(parts[k]):
        k += 1
    if k < 2:
        return 0
    whole = "-".join(parts[:k])
    emit(whole)
    for p in parts[:k]:
        emit(p)
    return len(whole)


def _scan_number(text: str, i: int, emit, signed: bool) -> int:
    start = i
    sign = ""
    if signed:
        sign = text[i]
        i += 1
    m = _VERSION.match(text, i)
    if m:
        emit(m.group(0))            # versions never keep a sign
        return m.end() - start
    for rx in (_SFLOAT, _FLOAT):
        m = rx.match(text, i)
        if m:
            emit(sign + m.group(0))
            return m.end() - start
    if not signed:
        m = _NUMWORD.match(text, i)
        if m:
            emit(m.group(0))
            return m.end() - start
    m = _INT.match(text, i)
    if m:
        emit(sign + m.group(0))
        return m.end() - start
    return 1
