"""Differential fuzzer: pg_parser vs live PostgreSQL to_tsvector('simple').

Generates a deterministic battery of short strings over the punctuation
alphabet the PG default parser cares about ('.', '/', '-', '_', '@', ':',
digits, words), bulk-evaluates ``to_tsvector('simple', s)`` on the scratch
PG instance (socket /tmp/pgts_pg, port 54333), and diffs against
``pg_parse`` (lexeme + position, ordered). Prints the first N mismatches
with both token streams so parser rules can be fixed case by case.

Usage: python tools/fuzz_pg_parser.py [max_show]
"""

from __future__ import annotations

import itertools
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_textsearch_spark.functions.pg_parser import pg_parse  # noqa: E402
from tools.gen_pg_natural_fixture import parse_tsvector  # noqa: E402

PSQL = ["psql", "-h", "/tmp/pgts_pg", "-p", "54333", "-U", "pgoracle",
        "-d", "postgres", "-At", "-F", "\t"]


def gen_cases() -> list[str]:
    words = ["a", "ab", "foo", "x2", "2x", "7"]
    seps = [".", "/", "-", "_", " ", "..", "//", "__", "./", "/.", "_.",
            "._", "-_", "_-", ":", "@"]
    cases: list[str] = []
    # w s w
    for w1, s, w2 in itertools.product(words, seps, words):
        cases.append(f"{w1}{s}{w2}")
    # w s1 w s2 w — the FSM depth-2 space, on a reduced alphabet
    words2 = ["ab", "x2", "7"]
    seps2 = [".", "/", "-", "_", ":"]
    for w1, s1, w2, s2, w3 in itertools.product(
            words2, seps2, words2, seps2, words2):
        cases.append(f"{w1}{s1}{w2}{s2}{w3}")
    # depth-3 on the dotted/slashed/underscore sub-alphabet
    words3 = ["ab", "7"]
    seps3 = [".", "/", "_", "-"]
    for w1, s1, w2, s2, w3, s3, w4 in itertools.product(
            words3, seps3, words3, seps3, words3, seps3, words3):
        cases.append(f"{w1}{s1}{w2}{s2}{w3}{s3}{w4}")
    # double separators at depth 2
    for w1, s1, w2 in itertools.product(["ab", "7"],
                                        ["..", "//", "__", "--", "./",
                                         "/.", "_.", "._", "-.", ".-",
                                         "/_", "_/", "/-", "-/", "-_",
                                         "_-"], ["ab", "7"]):
        for s2, w3 in (("", ""), (".", "cd"), ("/", "cd"), ("_", "cd")):
            cases.append(f"{w1}{s1}{w2}{s2}{w3}")
    # leading/trailing punctuation
    for s in seps:
        for w in ("foo", "x2", "7", "foo.bar", "foo/bar"):
            cases.append(f"{s}{w}")
            cases.append(f"{w}{s}")
    # depth-3 dotted/underscore names (the natural-corpus shapes)
    for t in ("parser.add_argument", "ast.PyCF_ONLY_AST", "self.doc_header",
              "c.most_common(3)", ".encode()/.decode()", "-h/--help",
              "a.b_c.d", "x_y.z", "foo_bar.baz_qux", "os.path.join",
              "sys._getframe", "obj.__dict__", "a._b", "_a.b", "a_.b_",
              "1.2.3_4", "v1.2_3", "http://a.b_c/d", "u@v_w.xy",
              "/usr/my_file.txt", "/.hidden", "/..x", "./x", "../x",
              "a//b", "a/./b", "a/../b", "a.b-c.de", "a-b.cd", "a.-b",
              "mod.sub.func_name", "x.y.z_", "e.g.", "i.e.,", "etc.)"):
        cases.append(t)
    # dedupe, keep order
    seen: set[str] = set()
    out = []
    for c in cases:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def pg_simple(cases: list[str]) -> list[list[tuple[int, str]]]:
    """Ordered (pos, lexeme) streams from live PG, one per case."""
    def esc(s: str) -> str:
        return (s.replace("\\", "\\\\").replace("\n", "\\n")
                .replace("\t", "\\t").replace("\r", "\\r"))

    lines = [f"{i}\t{esc(t)}" for i, t in enumerate(cases)]
    script = (
        "DROP TABLE IF EXISTS pgts_fuzz;\n"
        "CREATE TABLE pgts_fuzz(id int, txt text);\n"
        "COPY pgts_fuzz FROM STDIN;\n"
        + "\n".join(lines) + "\n\\.\n"
        "SELECT id, to_tsvector('simple', txt)::text FROM pgts_fuzz "
        "ORDER BY id;\n"
        "DROP TABLE pgts_fuzz;\n")
    res = subprocess.run(PSQL, input=script, text=True,
                         capture_output=True, check=True)
    out: dict[int, list[tuple[int, str]]] = {}
    for line in res.stdout.splitlines():
        if "\t" not in line:
            continue
        sid, tsv = line.split("\t", 1)
        if not sid.isdigit():
            continue
        d = parse_tsvector(tsv)
        out[int(sid)] = sorted((p, lex) for lex, ps in d.items() for p in ps)
    return [out.get(i, []) for i in range(len(cases))]


def main() -> int:
    max_show = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    cases = gen_cases()
    want = pg_simple(cases)
    n_bad = 0
    for case, w in zip(cases, want):
        g = sorted((p, lex) for lex, p in pg_parse(case))
        if g != w:
            n_bad += 1
            if n_bad <= max_show:
                print(f"{case!r}\n  PG {w}\n  US {g}")
    print(f"\n{len(cases) - n_bad}/{len(cases)} match")
    return 0 if n_bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
