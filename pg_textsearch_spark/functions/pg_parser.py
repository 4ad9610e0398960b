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

Observed classification rules (each pinned by a fixture or by the
differential fuzzer ``tools/fuzz_pg_parser.py`` against a live PG 15):
- HOST: dotted labels ([alnum] with single interior hyphens and interior
  underscores — never '--'/'__' or '-'/'_' at a label edge); the match may
  cut mid-run at a hyphen, dot OR underscore ('parser.add_argument' ->
  host 'parser.add' + word 'argument'), and the final label must be >= 2
  chars of pure alpha (a real TLD). ``1.ab`` is a host; ``e.g`` is not.
- URL: host[:port] followed by ``/`` + at least one path char emits
  url + host[:port] + path; a ``proto://`` prefix is dropped.
- EMAIL: ``local@domain``, local = letter [alnum .]*, domain host-shaped
  with the strict TLD rule.
- FILE: '/'-separated components; a component is '.'/'..' (pure dots,
  '/'-bounded) or dot-joined pieces of [alnum_] + interior/trailing
  hyphens, with at most one leading dot ('foo/.bar' hidden files) and
  never a leading hyphen ('a/-b' is no file). The FIRST piece of a
  relative file is plain [alnum]+ — no '_' ('x_y.z' -> 'x' + file 'y.z')
  — and may not be all digits followed by '.' ('7.7/ab' -> float + file
  '/ab'). './x' and '../x' start files; '//' ends one; trailing dots and
  a trailing '/.' drop (but '/..' stays: 'foo/..' is whole).
- NUMBERS: version d.d.d(+) (never signed), sfloat d.de[+-]d, float d.d,
  int d+ (each taking one leading sign), digit-letter runs are numwords.
- HWORD: hyphen compounds need a letter in EVERY part; whole then parts;
  when the compound truncates at an all-digit part ('ab-ab-7') the joining
  hyphen is consumed as blank and the digits lex unsigned.
- ``<tag>`` / ``&entity;`` skip wholesale; ``..`` right after a token is
  (bizarrely, but faithfully) a file token; other punctuation separates.
"""

from __future__ import annotations

import re

__all__ = ["pg_parse", "pg_lexemes"]

MAX_LEXEME = 2047        # PG MAXSTRLEN: longer lexemes are dropped
MAX_POS = 16383          # tsvector position clamp

# tag grammar (probed): <[!][/]NAME (WS+ (ATTR[=VALUE] | "..."| '...'))* [/]>
# — names start [a-zA-Z_], '=' needs a preceding attr name, bare quoted
# strings are legal units, quoted values may hold any char incl '>'.
_TAG_NAME = r"[a-zA-Z_][\-._:a-zA-Z0-9]*"
_TAG = re.compile(
    r"<(?:!--.*?--\s*>"
    r"|!?/?" + _TAG_NAME +
    r"(?:\s+(?:[\-._:a-zA-Z0-9]+"
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s<>\"'=]+))?"
    r"|\"[^\"]*\"|'[^']*'))*"
    r"\s*/?>)", re.S)
_ENTITY = re.compile(r"&(?:[a-zA-Z][a-zA-Z0-9]*|#[0-9]+|#[xX][0-9a-fA-F]+);")
_PROTO = re.compile(r"[a-zA-Z]+://")
_EMAIL = re.compile(
    r"[a-zA-Z0-9](?:[a-zA-Z0-9_.\-]*[a-zA-Z0-9])?"
    r"@"
    r"(?:[a-zA-Z0-9_](?:[a-zA-Z0-9_-]*[a-zA-Z0-9_])?\.)+"
    r"([a-zA-Z]{2,})(?![a-zA-Z0-9-])")
_PATH = re.compile(r"/[^\s<>\"]*")
_COMPOUND = re.compile(r"[a-zA-Z0-9]+(?:-[a-zA-Z0-9]+)+")
_VERSION = re.compile(r"[0-9]+(?:\.[0-9]+){2,}(?!\.?[0-9])")
# scientific floats do NOT need the decimal point: 12e5, 886313e1, 1e-3
_SFLOAT = re.compile(r"[0-9]+(?:\.[0-9]+)?[eE][+-]?[0-9]+")
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
            # './x' / '../x' relative dot-files — ONLY at text start or
            # right after a token ('foo./a' -> 'foo' + file './a'); after
            # a blank the dots are blank ('x ./a' -> 'x' + file '/a')
            if (i == 0 or i == prev_token_end) and \
                    re.match(r"\.{1,2}/", text[i:]):
                frun = re.match(r"[a-zA-Z0-9_.\-/]+", text[i:]).group(0)
                ftok = _file_prefix(frun, absolute=False, dotstart=True)
                if ftok:
                    emit(ftok)
                    i += len(ftok)
                    prev_token_end = i
                    continue
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
            # 'proto://' is dropped and lexing simply CONTINUES — PG has
            # no special after-protocol mode ('scheme://host/target' is
            # blank + file 'host/target')
            pm = _PROTO.match(text, i)
            if pm:
                i = pm.end()
                continue
            adv = (_try_email(text, i, emit)
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
            # digit-start emails ('1a@b.cd') and exponent floats beat the
            # host/file/compound machinery ('12e5.xy' -> sfloat + word,
            # '886313e1-3b8a' -> sfloat + int + numword)
            adv = _try_email(text, i, emit)
            if not adv:
                sm = _SFLOAT.match(text, i)
                if sm:
                    emit(sm.group(0))
                    adv = sm.end() - i
            if not adv:
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

def _try_email(text: str, i: int, emit) -> int:
    m = _EMAIL.match(text, i)
    if not m:
        return 0
    emit(m.group(0))
    return m.end() - i


def _host_prefix(run: str) -> str | None:
    """Longest prefix of a [alnum_.-] run that is a valid HOST: dotted
    labels, single interior hyphens/underscores, final label pure-alpha
    len >= 2. The cut may land mid-run at a hyphen, dot or underscore
    ('mod.sub.func_name' -> host 'mod.sub.func')."""
    # candidate cut points: end of run, before each '.', '-' and '_'
    best = None
    # enumerate prefixes ending at label boundaries, longest first
    cuts = [len(run)] + [j for j in range(len(run) - 1, 0, -1)
                         if run[j] in ".-_"]
    for j in cuts:
        cand = run[:j]
        if "." not in cand or cand.endswith((".", "-", "_")):
            continue
        last = cand.rsplit(".", 1)[-1]
        if len(last) >= 2 and last.isalpha():
            if _host_labels_ok(cand):
                if best is None or len(cand) > len(best):
                    best = cand
    return best


def _host_labels_ok(cand: str) -> bool:
    for lbl in cand.split("."):
        if (not lbl or lbl[0] in "-_" or lbl[-1] in "-_"
                or "--" in lbl or "__" in lbl or "-_" in lbl
                or "_-" in lbl):
            return False
    return True


_FIRST_PIECE = re.compile(r"[a-zA-Z0-9]+")
_PIECE = re.compile(r"[a-zA-Z0-9_][a-zA-Z0-9_\-]*")
_PUREDOTS = re.compile(r"\.{1,2}(?=/|$)")


def _component_end(run: str, i: int, first: bool) -> int | None:
    """End index of one '/'-bounded file component starting at i, or None.

    A component is '.'/'..' pure dots, or dot-joined pieces with at most
    one leading dot ('.bashrc'); pieces allow '_' and interior/trailing
    hyphens, never a leading hyphen. The FIRST component of a relative
    file starts with a plain [alnum]+ piece (no '_', no leading dot) and
    may not be all digits followed by '.' (numbers win: '7.7/ab')."""
    n = len(run)
    if not first:
        m = _PUREDOTS.match(run, i)
        if m:
            return m.end()
    j = i
    if not first and j < n and run[j] == ".":
        j += 1                           # one leading dot (hidden file)
    m = (_FIRST_PIECE if first else _PIECE).match(run, j)
    if not m:
        return None
    j = m.end()
    if first and run[i:j].isdigit() and run[j:j + 1] == ".":
        return None                      # '7.' lexes as a number
    while j < n and run[j] == ".":
        m = _PIECE.match(run, j + 1)
        if not m:
            break
        j = m.end()
    return j


def _file_prefix(run: str, absolute: bool, dotstart: bool = False) -> \
        str | None:
    """Longest valid FILE token over a [alnum_.-/] run.

    absolute: run is the body after a leading '/' (prepended on return).
    dotstart: run begins with './' or '../' (relative dot-file)."""
    i, n = 0, len(run)
    end = None
    first = not absolute and not dotstart
    while i < n:
        if run[i] == "/":
            if i + 1 < n and run[i + 1] == "/":
                break                    # '//' terminates a file
            i += 1
            continue
        comp_end = _component_end(run, i, first)
        if comp_end is None:
            break
        first = False
        end = comp_end
        i = comp_end
        if i < n and run[i] != "/":
            break
    if end is None:
        return None
    tok = ("/" + run[:end]) if absolute else run[:end]
    # trailing cleanup: dots trim, '/.' drops, '/..' stays
    while tok:
        last = tok.rsplit("/", 1)[-1]
        if last == ".":
            tok = tok[:-2] if "/" in tok else ""
            continue
        if last == "..":
            break
        if tok.endswith("."):
            tok = tok.rstrip(".")
            continue
        break
    if not tok.strip("/"):
        return None
    if absolute:
        return tok                       # '/x', '/..' etc are valid files
    body = tok
    if dotstart:
        # must keep a real component beyond the leading dots
        return tok if "/" in tok and not tok.endswith("/") else None
    if "/" not in body and "." not in body:
        return None                      # no separator -> not a file
    return tok


def _try_hosty(text: str, i: int, emit) -> int:
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
        if len(host) == len(run) or run[len(host)] in ".-_":
            emit(host + port)
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
    if k < len(parts):
        # compound truncated at an all-digit part ('ab-ab-7'): the joining
        # hyphen is blank and the digits lex UNSIGNED (PG: ... 'ab', '7')
        return len(whole) + 1
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
