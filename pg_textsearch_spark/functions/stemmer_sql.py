"""Porter2 (Snowball English) stemmer as pure ANSI/DuckDB SQL.

Generates a chained-CTE implementation of EXACTLY the algorithm in
``stemmer.py`` (itself implemented from the published Snowball
specification), so the DuckDB oracle can stem document tokens the same way
the engine does — making the ``english`` text config hash-checkable by the
driver's correctness gate, the way the reference shares ``to_tsvector``
with its SQL oracle (reference test/sql/validation.sql:1-12).

Shape: :func:`stem_cte_sql` returns a block of CTE definitions that maps a
``toks(term)`` relation of distinct lowercase tokens to
``stems(term, lexeme)``. Each Porter2 step is one CTE so expressions stay
flat (no exponential macro inlining); the stemmer therefore runs once per
DISTINCT token, mirroring the engine's per-batch stem cache.

Parity is enforced by ``tests/test_stemmer_sql.py``, which compares this
SQL against the Python ``stem()`` over the Snowball sample vectors, the
synthetic corpus vocabulary and a generated suffix cross-product.
"""

from __future__ import annotations

from .stemmer import _EXCEPTIONS1, _EXCEPTIONS2

_V = "aeiouy"          # vowels (post-marking: uppercase Y is a consonant)
_LI = "cdeghkmnrt"

_STEP2 = (
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"),
)

_STEP3 = (
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ful", ""), ("ness", ""),
)

_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic",
)


def _cut(w: str, n: int) -> str:
    return f"substr({w}, 1, length({w}) - {n})"


def _short_syllable(w: str) -> str:
    """SQL for _ends_short_syllable(w)."""
    return (f"(CASE WHEN length({w}) = 2 THEN "
            f"regexp_matches({w}, '^[{_V}][^{_V}]$') "
            f"WHEN length({w}) >= 3 THEN "
            f"regexp_matches({w}, '[^{_V}][{_V}][^{_V}wxY]$') "
            f"ELSE FALSE END)")


def _step1a(w: str) -> str:
    return f"""CASE
  WHEN ends_with({w}, 'sses') THEN {_cut(w, 2)}
  WHEN ends_with({w}, 'ied') OR ends_with({w}, 'ies') THEN
    CASE WHEN length({w}) > 4 THEN {_cut(w, 3)} || 'i'
         ELSE {_cut(w, 3)} || 'ie' END
  WHEN ends_with({w}, 'us') OR ends_with({w}, 'ss') THEN {w}
  WHEN ends_with({w}, 's') THEN
    CASE WHEN regexp_matches({_cut(w, 2)}, '[{_V}]')
         THEN {_cut(w, 1)} ELSE {w} END
  ELSE {w}
END"""


def _step1b_main(w: str, r1: str) -> str:
    branches = []
    for suf in ("ingly", "edly", "ing", "ed"):
        n = len(suf)
        branches.append(
            f"WHEN ends_with({w}, '{suf}') THEN "
            f"CASE WHEN regexp_matches({_cut(w, n)}, '[{_V}]') "
            f"THEN {_cut(w, n)} ELSE {w} END")
    body = "\n  ".join(branches)
    return f"""CASE
  WHEN ends_with({w}, 'eedly') THEN
    CASE WHEN length({w}) - 5 >= {r1} THEN {_cut(w, 3)} ELSE {w} END
  WHEN ends_with({w}, 'eed') THEN
    CASE WHEN length({w}) - 3 >= {r1} THEN {_cut(w, 1)} ELSE {w} END
  {body}
  ELSE {w}
END"""


def _step1b_did(w: str) -> str:
    branches = []
    for suf in ("ingly", "edly", "ing", "ed"):
        n = len(suf)
        branches.append(
            f"WHEN ends_with({w}, '{suf}') THEN "
            f"regexp_matches({_cut(w, n)}, '[{_V}]')")
    body = "\n  ".join(branches)
    return f"""CASE
  WHEN ends_with({w}, 'eedly') OR ends_with({w}, 'eed') THEN FALSE
  {body}
  ELSE FALSE
END"""


def _step1b_post(w: str, did: str, r1: str) -> str:
    return f"""CASE
  WHEN NOT {did} THEN {w}
  WHEN ends_with({w}, 'at') OR ends_with({w}, 'bl') OR ends_with({w}, 'iz')
    THEN {w} || 'e'
  WHEN regexp_matches({w}, '(bb|dd|ff|gg|mm|nn|pp|rr|tt)$')
    THEN {_cut(w, 1)}
  WHEN {_short_syllable(w)} AND {r1} >= length({w}) THEN {w} || 'e'
  ELSE {w}
END"""


def _step1c(w: str) -> str:
    return (f"CASE WHEN length({w}) > 2 AND "
            f"regexp_matches({w}, '[^{_V}][yY]$') "
            f"THEN {_cut(w, 1)} || 'i' ELSE {w} END")


def _step2(w: str, r1: str) -> str:
    branches = []
    for suf, repl in _STEP2:
        n = len(suf)
        branches.append(
            f"WHEN ends_with({w}, '{suf}') THEN "
            f"CASE WHEN length({w}) - {n} >= {r1} "
            f"THEN {_cut(w, n)} || '{repl}' ELSE {w} END")
    li_set = ", ".join(f"'{c}'" for c in _LI)
    branches.append(
        f"WHEN ends_with({w}, 'ogi') THEN "
        f"CASE WHEN length({w}) - 3 >= {r1} AND length({w}) >= 4 "
        f"AND substr({w}, length({w}) - 3, 1) = 'l' "
        f"THEN {_cut(w, 1)} ELSE {w} END")
    branches.append(
        f"WHEN ends_with({w}, 'li') THEN "
        f"CASE WHEN length({w}) - 2 >= {r1} AND length({w}) >= 3 "
        f"AND substr({w}, length({w}) - 2, 1) IN ({li_set}) "
        f"THEN {_cut(w, 2)} ELSE {w} END")
    return "CASE\n  " + "\n  ".join(branches) + f"\n  ELSE {w}\nEND"


def _step3(w: str, r1: str, r2: str) -> str:
    branches = []
    for suf, repl in _STEP3:
        n = len(suf)
        rep = f"{_cut(w, n)} || '{repl}'" if repl else _cut(w, n)
        branches.append(
            f"WHEN ends_with({w}, '{suf}') THEN "
            f"CASE WHEN length({w}) - {n} >= {r1} THEN {rep} ELSE {w} END")
    branches.append(
        f"WHEN ends_with({w}, 'ative') THEN "
        f"CASE WHEN length({w}) - 5 >= {r2} THEN {_cut(w, 5)} ELSE {w} END")
    return "CASE\n  " + "\n  ".join(branches) + f"\n  ELSE {w}\nEND"


def _step4(w: str, r2: str) -> str:
    branches = []
    for suf in _STEP4:
        n = len(suf)
        branches.append(
            f"WHEN ends_with({w}, '{suf}') THEN "
            f"CASE WHEN length({w}) - {n} >= {r2} THEN {_cut(w, n)} "
            f"ELSE {w} END")
    branches.append(
        f"WHEN ends_with({w}, 'ion') THEN "
        f"CASE WHEN length({w}) - 3 >= {r2} AND length({w}) >= 4 "
        f"AND substr({w}, length({w}) - 3, 1) IN ('s', 't') "
        f"THEN {_cut(w, 3)} ELSE {w} END")
    return "CASE\n  " + "\n  ".join(branches) + f"\n  ELSE {w}\nEND"


def _step5(w: str, r1: str, r2: str) -> str:
    return f"""CASE
  WHEN ends_with({w}, 'e') THEN
    CASE WHEN length({w}) - 1 >= {r2} THEN {_cut(w, 1)}
         WHEN length({w}) - 1 >= {r1}
              AND NOT {_short_syllable(_cut(w, 1))} THEN {_cut(w, 1)}
         ELSE {w} END
  WHEN ends_with({w}, 'll') AND length({w}) - 1 >= {r2} THEN {_cut(w, 1)}
  ELSE {w}
END"""


def _exc1_case(t: str) -> str:
    whens = "\n    ".join(f"WHEN '{k}' THEN '{v}'"
                          for k, v in _EXCEPTIONS1.items())
    return f"CASE {t}\n    {whens}\n    ELSE NULL\n  END"


def stem_cte_sql(source_cte: str = "toks", token_col: str = "term") -> str:
    """CTE block mapping ``source_cte(token_col)`` (distinct lowercase
    tokens) to ``stems(term, lexeme)``. Append after a WITH clause;
    reference the final CTE ``stems``."""
    t = token_col
    exc2 = ", ".join(f"'{x}'" for x in sorted(_EXCEPTIONS2))
    pair_re = f"^.*?[{_V}][^{_V}](.*)$"
    return f"""p2_in AS (
  SELECT {t} AS term,
         CASE WHEN length({t}) <= 2 THEN {t}
              ELSE {_exc1_case(t)} END AS fixed,
         regexp_replace(regexp_replace({t}, '^y', 'Y'),
                        '([{_V}])y', '\\1Y', 'g') AS w
  FROM {source_cte}
),
p2_r1 AS (
  SELECT term, fixed, w,
         CASE WHEN w LIKE 'gener%' OR w LIKE 'arsen%' THEN 5
              WHEN w LIKE 'commun%' THEN 6
              ELSE length(w) - length(regexp_extract(w, '{pair_re}', 1))
         END AS r1
  FROM p2_in
),
p2_r2 AS (
  SELECT term, fixed, w, r1,
         r1 + length(substr(w, r1 + 1))
            - length(regexp_extract(substr(w, r1 + 1), '{pair_re}', 1)) AS r2
  FROM p2_r1
),
p2_1a AS (
  SELECT term, fixed, {_step1a('w')} AS w, r1, r2 FROM p2_r2
),
p2_x2 AS (
  SELECT term,
         CASE WHEN fixed IS NOT NULL THEN fixed
              WHEN w IN ({exc2}) THEN w
              ELSE NULL END AS fixed,
         w, r1, r2
  FROM p2_1a
),
p2_1bm AS (
  SELECT term, fixed, {_step1b_main('w', 'r1')} AS w,
         {_step1b_did('w')} AS did, r1, r2
  FROM p2_x2
),
p2_1b AS (
  SELECT term, fixed, {_step1b_post('w', 'did', 'r1')} AS w, r1, r2
  FROM p2_1bm
),
p2_1c AS (
  SELECT term, fixed, {_step1c('w')} AS w, r1, r2 FROM p2_1b
),
p2_2 AS (
  SELECT term, fixed, {_step2('w', 'r1')} AS w, r1, r2 FROM p2_1c
),
p2_3 AS (
  SELECT term, fixed, {_step3('w', 'r1', 'r2')} AS w, r1, r2 FROM p2_2
),
p2_4 AS (
  SELECT term, fixed, {_step4('w', 'r2')} AS w, r1, r2 FROM p2_3
),
p2_5 AS (
  SELECT term, fixed, {_step5('w', 'r1', 'r2')} AS w FROM p2_4
),
stems AS (
  SELECT term, COALESCE(fixed, replace(w, 'Y', 'y')) AS lexeme FROM p2_5
)"""
