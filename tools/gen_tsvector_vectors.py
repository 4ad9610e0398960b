"""Freeze PostgreSQL default-parser ground truth for the ``pg`` text config.

Feeds an ASCII battery (crafted web-ish lines + deterministic fuzz
combinations of token atoms) through a live PostgreSQL 15's
``to_tsvector('simple', ...)`` and writes ``tests/data/tsvector_vectors.json``
as ``[{"text": ..., "lexemes": [[lexeme, pos], ...]}, ...]``.

Needs the scratch PG instance from the project recipe (port 54333,
socket /tmp/pgts_pg). The committed JSON is the parity contract for
``pg_textsearch_spark.functions.pg_parser`` (tests/test_pg_parser.py);
regeneration is only needed to EXTEND the battery.

Run: python tools/gen_tsvector_vectors.py [--check]
  --check: don't write; diff pg_parse() against live PG and print
           divergences (the dev loop).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "data", "tsvector_vectors.json")

PSQL = ["psql", "-h", "/tmp/pgts_pg", "-p", "54333", "-U", "pgoracle",
        "-d", "postgres", "-At"]

# ----------------------------------------------------------------- battery

CRAFTED = [
    "Visit http://example.com/path?q=1 or https://foo.org/a/b.html now",
    "mail me at john.doe+spam@sub.example.co.uk today",
    "state-of-the-art foo-bar2 multi-part-word",
    "version 1.2.3 pi is 3.14 int -42 price 1,234.56",
    "file /usr/local/bin/python3.11 and C:\\win\\path",
    "host example.com and www.test.org:8080/x",
    '<div class="x">hello &amp; world</div>',
    "snake_case_name camelCase ALLCAPS a1b2 2fast",
    "End of sentence. next e.g. i.e. u.s.a. done",
    "ranges 2-3 and 1-2-3 and a-1 and 1-a mixed2-case",
    "dont don't it's o'clock rock'n'roll",
    "exp 1e5 2.5e-3 0x1F 0b101 price$ 100% #tag @user",
    "trailing http://x.com/a, (see http://y.io/b) end",
    "a.b a.b.c x9.y8 3.a b.3 1.2.3.4.5",
    "double--dash tri---ple under_score-mix a_b-c",
    "ftp://files.org/x mailto:a@b.co www.plain.com bare.io/path",
    "dots... ellipsis..word a..b -- ++ == <> ->",
    "Mixed CASE Http://UPPER.COM/Path AbC-DeF",
    "e1 a9@b.co a.b9@c.io A.B@c.io x@y.z x@y.zz xy@z.a1 x@sub.d.ef",
    "h x.c x.cc 9.a a.9 a9.b8 a.b.c.d x-.y x.-y xx--yy.z",
    "u2 x.com/%20a x.com/a(b x.com/a;b?c=d&e=f x.com/.. x.com//",
    "f2 a/b/c ab/cd x.y/z/w ./a/b a.b/c:d",
    "n 007 0.5.1 12:30 2026-08-17 3/4",
    "v 1.2 and -3.14 +42 .5 5. 1.e5 1.2e3",
    "em a_b@c.d a-b@c.d a.b-c@x.y 9a@b.c a@b",
    "hosts a-b.cd a_b.cd ab.cd.ef-gh.i",
    "paths a/b ./x ../y /x /x/ b.io/p'q",
    "port x.com:80 x.com:80/y :8080 a:b x:80",
    "file2 /a /a/b /a/b.c /a//b /a/B_c-d.e ~/x",
    "h2 one-2 2-one one2-three x-1y 3d-print print-3d",
    "u3 http://a.bc/x http://a.b/x http://x.com:9/y ssh://g.co/r.git",
    "deep www.a.io/x/y/z?k=v#frag end",
    "q 'quoted' \"dquoted\" (paren) [brack] {brace}",
    "money $5 5$ $5.50 EUR5 5EUR 50c",
    "pc 50% %50 a%b 100%done",
    "sl a\\b c\\\\d end\\",
    "eq a=b c==d key=value&k2=v2",
    "sc a;b c:d e,f g.h i!j k?l",
    "star a*b c**d pow2 x^2",
    "pipe a|b c||d and&also",
    "tld ab.museum x.travel y.aero site.info",
    "trail2 x.com. y.io.. z.org... end",
    "mixnum 3rd 2nd-place 4x4 24x7x365 v2.0 r2-d2",
    "sign -x +y -1.2.3 +1.2.3 --5 ++6",
    "path3 a.b.c/d/e x.com/a/b/c.d?x=1&y=2;z=3",
    "emails2 a@b.cde x.y@z.ab a.b.c@d.ef g@h-i.jk m@n_o.pq",
    "host3 a-b-c.de a--b.cd -ab.cd ab-.cd a.b-c.de",
    "tag2 <a href='x'>y</a> <br/> <!-- note --> <x y> < 3 > 4",
    "ent2 &lt;tag&gt; &#65; &#x41; &amp;amp; &unknown; & 5",
    "uni2 a_b_c __init__ x_ _y _ z",
    "hy a-b.c9 a-b.c x.y-z a.b-c.d-e.fg q-r.s.tu a.b-c",
    "dd .. . ... a.. ..a ../ /.. a.. b ab..",
    "sv -2.5e-3 +0.5.1 -1.2 -0x1f -2fast",
    "fd /a/b. /a/b.. /a/b..c a/b. x/y.. /a/./b /a/../c",
    "hz e-f.gh i-j.k l.m-n o.p-q.rs t.u-v.w",
    # round-4 additions: rules discovered by the natural-prose fixture +
    # tools/fuzz_pg_parser.py differential fuzzing
    "us1 parser.add_argument self.doc_header c.most_common(3)",
    "us2 ast.PyCF_ONLY_AST mod.sub.func_name foo_bar.baz_qux",
    "us3 x_y.z x.y_z a.b_c.d foo._bar foo_.bar a__b.cd ab_.a",
    "us4 www.foo_bar.com foo.bar_ x.y_ x.y_/a a/_b a/b__c 7_x2.x2",
    "us5 ab-_ab.cd ab_-7.cd mod.x_ a_.b_ _a.bc",
    "hid1 /.hidden /.x2 foo/.a foo/.bar/baz .encode()/.decode()",
    "hid2 foo/. foo/bar/. foo/.. foo/../bar /..x ./.x ../..",
    "rel1 ./a ../b ./foo.bar ./foo/bar x ./a/b x./a/b x../a .../x",
    "rel2 foo./a x2./7 x.//a (./a) x, ./b",
    "num1 123E+1 12e5 1e-3 2.5e+10 7E2 12e5x 12e5.xy 1e2.3 12e 12e+",
    "num2 886313e1-3b8a-5372-9b90 1.2.3e4 0x1f 7.7/ab 7.x2/ab 1.2.3/a",
    "num3 7.ab/x x2.7/a 7/.a ab-ab-7 x2-ab-7 ab--7 ab -7",
    "ent3 &x3e; &foo1; &2x; &gt; &#62;",
    "tag3 <intro stuff goes here> <hello & hi there!> <Color.RED: 1>",
    "tag4 <lkcl@samba.org> <a href=\"x y\">t</a> <div class=foo> <_a>",
    "tag5 <a=b> <a \"b\"> <a b=\">\"> <a b = c> <!DOCTYPE html>",
    "tag6 <doctest foo.py:0 (2 examples)> <Q\", sys.maxsize//3)",
    "em3 sendmail-bugs@sendmail.org 1a@b.cd _a@b.cd a_@b.cd -a@b.cd",
    "url5 https://mahler:8092/site-updates.py scheme://host/target",
    "url6 http://a.b/x http://ab a://b mailto:user@x.yz http://w.co/p",
    "url7 <URL:scheme://host/path> uri='https://m:80/s.py', foo.py:0",
    "fl1 -h/--help a/-b a/b-c a-b/c x.y- x.y-z a.b--c a.b__c a.-b",
    "fl2 a//b a/./b a/../b 7/7 x2/.7 sys.maxsize//3) h/--help",
]

ATOMS = [
    "word", "CamelCase", "a1b2", "2fast", "42", "-7", "3.14", "1.2.3",
    "2.5e-3", "foo-bar", "a-b-c", "one-2", "x.com", "a.b.c", "x.com/p",
    "http://h.io/q", "a@b.co", "/usr/bin", "a/b", "don't", "e.g.",
    "snake_case", "100%", "$5", "x:80", "w,x", "y;z", "(p)", "[q]",
    "<b>t</b>", "&amp;", "u.s.a.", "www.site.org:8080/deep/path?k=v",
]


def fuzz_lines(seed: int = 7, n: int = 120) -> list[str]:
    """Deterministic pseudo-random 3-5 atom combinations with varied
    separators — adjacency is where parser bugs live."""
    import random
    rng = random.Random(seed)
    seps = [" ", " ", " ", ", ", ". ", "  ", ": ", " - ", "; "]
    out = []
    for _ in range(n):
        k = rng.randint(3, 5)
        parts = [rng.choice(ATOMS) for _ in range(k)]
        line = ""
        for j, p in enumerate(parts):
            line += p
            if j < k - 1:
                line += rng.choice(seps)
        out.append(line)
    return out


def battery() -> list[str]:
    return CRAFTED + fuzz_lines()


# ------------------------------------------------------------- PG plumbing

def pg_tsvector(texts: list[str], config: str = "simple") -> list[list[tuple[str, int]]]:
    """Run to_tsvector(config, t) for each text via one psql call."""
    sql_lines = []
    for t in texts:
        esc = t.replace("'", "''")
        sql_lines.append(f"SELECT to_tsvector('{config}', '{esc}');")
    res = subprocess.run(PSQL, input="\n".join(sql_lines), text=True,
                         capture_output=True, check=True)
    rows = res.stdout.splitlines()
    assert len(rows) == len(texts), (len(rows), len(texts))
    return [parse_tsvector(r) for r in rows]


_LEX = re.compile(r"'((?:[^']|'')*)':([0-9,]+)")


def parse_tsvector(s: str) -> list[tuple[str, int]]:
    """tsvector text -> [(lexeme, pos)] sorted by position."""
    out = []
    for m in _LEX.finditer(s):
        lex = m.group(1).replace("''", "'")
        for p in m.group(2).split(","):
            out.append((lex, int(p)))
    out.sort(key=lambda x: (x[1], x[0]))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    texts = battery()
    truth = pg_tsvector(texts)

    if args.check:
        sys.path.insert(0, REPO)
        from pg_textsearch_spark.functions.pg_parser import pg_parse
        bad = 0
        for t, want in zip(texts, truth):
            got = sorted(pg_parse(t), key=lambda x: (x[1], x[0]))
            if got != want:
                bad += 1
                print(f"DIVERGE: {t!r}")
                print(f"  pg : {want}")
                print(f"  us : {got}")
        print(f"{len(texts) - bad}/{len(texts)} match")
        sys.exit(1 if bad else 0)

    data = [{"text": t, "lexemes": [[l, p] for l, p in v]}
            for t, v in zip(texts, truth)]
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {len(data)} vectors to {OUT}")

    # english-config twin (default parser + english stopwords + Snowball):
    # the ground truth for text_config='pg_english'
    etruth = pg_tsvector(texts, "english")
    eout = OUT.replace(".json", "_english.json")
    edata = [{"text": t, "lexemes": [[l, p] for l, p in v]}
             for t, v in zip(texts, etruth)]
    with open(eout, "w") as f:
        json.dump(edata, f, indent=1)
    print(f"wrote {len(edata)} vectors to {eout}")


if __name__ == "__main__":
    main()
