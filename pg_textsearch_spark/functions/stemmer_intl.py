"""Snowball French / German / Spanish stemmers — pure Python.

These reproduce the stemmers PostgreSQL's ``to_tsvector('french'|...)``
dictionaries use (PG compiles the published Snowball algorithms), which is
the text_config contract the reference engine inherits
(reference: src/access/build.c:995-1007, test/sql/text_config.sql).
Implemented from the published Snowball specifications — no reference code
involved. Validated against PostgreSQL's own ``ts_lexize('<lang>_stem')``
output on ~780 hand-built inflection vectors
(tests/data/stem_vectors_*.json, tests/test_stemmer_intl.py).

Like the English stemmer, each ``stem_*`` is lru_cached: inside the Arrow
tokenizer UDFs tokens are deduped per batch, so cost is O(unique terms).
"""

from __future__ import annotations

from functools import lru_cache

# ============================================================== helpers


def _r_regions(w: str, vowels: str) -> tuple[int, int]:
    """Standard Snowball R1/R2: R1 = after first non-vowel following a
    vowel; R2 = same, computed within R1."""
    n = len(w)

    def after_nonv_after_v(start: int) -> int:
        i = start
        while i < n and w[i] not in vowels:
            i += 1
        while i < n and w[i] in vowels:
            i += 1
        # i at first non-vowel after a vowel (or end)
        return min(i + 1, n) if i < n else n

    r1 = after_nonv_after_v(0)
    r2 = after_nonv_after_v(r1)
    return r1, r2


# ============================================================== FRENCH

# NB: ë/ï never survive the prelude (rewritten to He/Hi, H a consonant),
# so the general vowel class omits them; the prelude's NEIGHBOR tests use
# the extended class below, where the original ë/ï still count as vowels.
_FR_V = "aeiouyâàéêèîôûù"
_FR_V_PRE = _FR_V + "ëï"

_FR_STEP1 = None  # built lazily below


def _fr_prelude(w: str) -> str:
    """Mark non-vowel u/i/y as U/I/Y and split ë/ï into He/Hi, with
    Snowball's left-to-right cursor semantics: at each position the
    vowel-first alternative wins (so in 'yy' after a consonant the FIRST
    y acts as the preceding vowel and the SECOND gets marked), and the
    cursor jumps past each substitution. The H consonants deliberately
    shift R1/R2/RV; the postlude restores He->ë, Hi->ï."""
    out = list(w)
    i = 0
    while i < len(out):
        c = out[i]
        if c == "ë":
            # cursor lands ON the inserted vowel so it can act as the
            # leading vowel of a following U/I/Y mark (PG behavior:
            # ëue -> HeUe)
            out[i:i + 1] = ["H", "e"]
            i += 1
            continue
        if c == "ï":
            out[i:i + 1] = ["H", "i"]
            i += 1
            continue
        if c in _FR_V:
            nxt = out[i + 1] if i + 1 < len(out) else ""
            nxt2_v = i + 2 < len(out) and out[i + 2] in _FR_V_PRE
            if nxt == "u" and nxt2_v:
                out[i + 1] = "U"
                i += 2
                continue
            if nxt == "i" and nxt2_v:
                out[i + 1] = "I"
                i += 2
                continue
            if nxt == "y":
                out[i + 1] = "Y"
                i += 2
                continue
        if c == "y" and i + 1 < len(out) and out[i + 1] in _FR_V_PRE:
            out[i] = "Y"
            i += 1
            continue
        if c == "q" and i + 1 < len(out) and out[i + 1] == "u":
            out[i + 1] = "U"
            i += 2
            continue
        i += 1
    return "".join(out)


def _fr_rv(w: str) -> int:
    n = len(w)
    if n >= 3 and w[0] in _FR_V and w[1] in _FR_V:
        return 3
    if w[:3] in ("par", "col", "tap"):
        return 3
    # region after the first vowel not at the beginning of the word
    for i in range(1, n):
        if w[i] in _FR_V:
            return i + 1
    return n


@lru_cache(maxsize=65536)
def stem_french(word: str) -> str:
    w = _fr_prelude(word.lower())
    r1, r2 = _r_regions(w, _FR_V)
    rv = _fr_rv(w)

    def in_r1(wd, suf):
        return len(wd) - len(suf) >= r1

    def in_r2(wd, suf):
        return len(wd) - len(suf) >= r2

    def in_rv(wd, suf):
        return len(wd) - len(suf) >= rv

    altered = False
    did_step1_special = False   # removed amment/emment/ment(s) or nothing

    # ------------------------------------------------ step 1
    w1 = w
    matched = None
    for suf in _FR_SUFFIX_ORDER:
        if w.endswith(suf):
            matched = suf
            break
    if matched is None:
        did_step1_special = True
    else:
        s = matched
        grp = _FR_SUFFIX_GROUP[s]
        if grp == "simple":                 # ance iqUe isme able iste eux +s
            if in_r2(w, s):
                w1 = w[:-len(s)]
        elif grp == "ateur":                # atrice ateur ation +s
            if in_r2(w, s):
                w1 = w[:-len(s)]
                if w1.endswith("ic"):
                    if in_r2(w1, "ic"):
                        w1 = w1[:-2]
                    else:
                        w1 = w1[:-2] + "iqU"
        elif grp == "logie":
            if in_r2(w, s):
                w1 = w[:-len(s)] + "log"
        elif grp == "usion":
            if in_r2(w, s):
                w1 = w[:-len(s)] + "u"
        elif grp == "ence":
            if in_r2(w, s):
                w1 = w[:-len(s)] + "ent"
        elif grp == "ement":
            if in_rv(w, s):
                w1 = w[:-len(s)]
                if w1.endswith("iv") and in_r2(w1, "iv"):
                    w1 = w1[:-2]
                    if w1.endswith("at") and in_r2(w1, "at"):
                        w1 = w1[:-2]
                elif w1.endswith("eus"):
                    if in_r2(w1, "eus"):
                        w1 = w1[:-3]
                    elif in_r1(w1, "eus"):
                        w1 = w1[:-3] + "eux"
                elif w1.endswith("abl") and in_r2(w1, "abl"):
                    w1 = w1[:-3]
                elif w1.endswith("iqU") and in_r2(w1, "iqU"):
                    w1 = w1[:-3]
                elif w1.endswith("ièr") and in_rv(w1, "ièr"):
                    w1 = w1[:-3] + "i"
                elif w1.endswith("Ièr") and in_rv(w1, "Ièr"):
                    w1 = w1[:-3] + "i"
        elif grp == "ite":                  # ité ités
            if in_r2(w, s):
                w1 = w[:-len(s)]
                if w1.endswith("abil"):
                    if in_r2(w1, "abil"):
                        w1 = w1[:-4]
                    else:
                        w1 = w1[:-4] + "abl"
                elif w1.endswith("ic"):
                    if in_r2(w1, "ic"):
                        w1 = w1[:-2]
                    else:
                        w1 = w1[:-2] + "iqU"
                elif w1.endswith("iv") and in_r2(w1, "iv"):
                    w1 = w1[:-2]
        elif grp == "if":
            if in_r2(w, s):
                w1 = w[:-len(s)]
                if w1.endswith("at") and in_r2(w1, "at"):
                    w1 = w1[:-2]
                    if w1.endswith("ic"):
                        if in_r2(w1, "ic"):
                            w1 = w1[:-2]
                        else:
                            w1 = w1[:-2] + "iqU"
        elif grp == "eaux":
            w1 = w[:-4] + "eau"
        elif grp == "aux":
            if in_r1(w, s):
                w1 = w[:-3] + "al"
        elif grp == "euse":
            if in_r2(w, s):
                w1 = w[:-len(s)]
            elif in_r1(w, s):
                w1 = w[:-len(s)] + "eux"
        elif grp == "issement":
            stem_len = len(w) - len(s)
            if in_r1(w, s) and stem_len > 0 and w[stem_len - 1] not in _FR_V:
                w1 = w[:-len(s)]
        elif grp == "amment":
            if in_rv(w, s):
                w1 = w[:-len(s)] + "ant"
                did_step1_special = True
        elif grp == "emment":
            if in_rv(w, s):
                w1 = w[:-len(s)] + "ent"
                did_step1_special = True
        elif grp == "ment":
            # delete if preceded by a vowel IN RV (the vowel stays)
            stem_len = len(w) - len(s)
            if stem_len > 0 and w[stem_len - 1] in _FR_V \
                    and stem_len - 1 >= rv:
                w1 = w[:-len(s)]
                did_step1_special = True
        if w1 == w and grp not in ("amment", "emment", "ment"):
            did_step1_special = True        # nothing removed
    if w1 != w:
        altered = True
    w = w1

    # -------------------------------------- steps 2a / 2b (RV-confined)
    if did_step1_special:
        removed_2a = False
        for suf in _FR_2A:
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                pre = len(w) - len(suf) - 1
                # an H (from ë/ï) is a consonant everywhere EXCEPT here:
                # it does not license the verb-suffix deletion (ïs stays)
                if pre >= rv and pre >= 0 and w[pre] not in _FR_V \
                        and w[pre] != "H":
                    w = w[:-len(suf)]
                    altered = True
                    removed_2a = True
                break
        if not removed_2a:
            for suf in _FR_2B:
                if w.endswith(suf) and len(w) - len(suf) >= rv:
                    if suf == "ions":
                        if in_r2(w, suf):
                            w = w[:-len(suf)]
                            altered = True
                        break
                    if suf in _FR_2B_E:     # é ée ées és èrent er ... ez iez
                        w = w[:-len(suf)]
                        altered = True
                        break
                    # â-group: delete; then preceding 'e' in RV also goes
                    w = w[:-len(suf)]
                    if w.endswith("e") and len(w) - 1 >= rv:
                        w = w[:-1]
                    altered = True
                    break

    # ------------------------------------------------ steps 3 / 4
    if altered:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4 (an i from Hi does not protect a final s; x does not
        # protect either)
        if w.endswith("s") and len(w) >= 2 and \
                (w.endswith("His") or w[-2] not in "aiouès"):
            w = w[:-1]
        for suf, kind in (("ion", "ion"), ("ière", "ier"), ("Ière", "ier"),
                          ("ier", "ier"), ("Ier", "ier"), ("e", "e")):
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                if kind == "ion":
                    pre = len(w) - len(suf) - 1
                    if in_r2(w, suf) and pre >= rv and w[pre] in "st":
                        w = w[:-len(suf)]
                        altered = True
                    break
                if kind == "ier":
                    w = w[:-len(suf)] + "i"
                    altered = True
                    break
                if kind == "e":
                    w = w[:-1]
                    altered = True
                    break
                if kind == "gue" and w.endswith("guë"):
                    w = w[:-1]
                    altered = True
                    break

    # ------------------------------------------------ step 5: un-double
    for dbl in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(dbl):
            w = w[:-1]
            break

    # ------------------------------------------------ step 6: un-accent
    i = len(w) - 1
    seen_nonv = 0
    while i >= 0 and w[i] not in _FR_V:
        seen_nonv += 1
        i -= 1
    if seen_nonv >= 1 and i >= 0 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1:]

    # ------------------------------------------------ postlude
    return (w.replace("I", "i").replace("U", "u").replace("Y", "y")
            .replace("He", "ë").replace("Hi", "ï").replace("H", ""))


_FR_GROUPS: list[tuple[str, tuple[str, ...]]] = [
    ("simple", ("ance", "iqUe", "isme", "able", "iste", "eux",
                "ances", "iqUes", "ismes", "ables", "istes")),
    ("ateur", ("atrice", "ateur", "ation", "atrices", "ateurs", "ations")),
    ("logie", ("logie", "logies")),
    ("usion", ("usion", "ution", "usions", "utions")),
    ("ence", ("ence", "ences")),
    ("ement", ("ement", "ements")),
    ("ite", ("ité", "ités")),
    ("if", ("if", "ive", "ifs", "ives")),
    ("eaux", ("eaux",)),
    ("aux", ("aux",)),
    ("euse", ("euse", "euses")),
    ("issement", ("issement", "issements")),
    ("amment", ("amment",)),
    ("emment", ("emment",)),
    ("ment", ("ment", "ments")),
]
_FR_SUFFIX_GROUP = {s: g for g, sufs in _FR_GROUPS for s in sufs}
_FR_SUFFIX_ORDER = sorted(_FR_SUFFIX_GROUP, key=len, reverse=True)

_FR_2A = sorted((
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai", "iraIent",
    "irais", "irait", "iras", "irent", "irez", "iriez", "irions", "irons",
    "iront", "is", "issaIent", "issais", "issait", "issant", "issante",
    "issantes", "issants", "isse", "issent", "isses", "issez", "issiez",
    "issions", "issons", "it"), key=len, reverse=True)

_FR_2B_E = frozenset((
    "é", "ée", "ées", "és", "èrent", "er", "era", "erai", "eraIent",
    "erais", "erait", "eras", "erez", "eriez", "erions", "erons", "eront",
    "ez", "iez"))
_FR_2B_A = (
    "âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant", "ante",
    "antes", "ants", "as", "asse", "assent", "asses", "assiez", "assions")
# 'ions' is R2-conditioned (unlike the rest of 2b); a prelude I-mark
# ('éxàiions' -> 'éxàIions') makes it unmatchable after a vowel, which is
# why 'iftabeions' keeps its suffix while 'editions' loses it (PG-verified)
_FR_2B = sorted(set(_FR_2B_E) | set(_FR_2B_A) | {"ions"},
                key=len, reverse=True)


# ============================================================== GERMAN

_DE_V = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"


def _de_prelude(w: str) -> str:
    w = w.replace("ß", "ss")
    out = list(w)
    for i in range(1, len(out) - 1):
        if out[i] in "uy" and out[i - 1] in _DE_V and out[i + 1] in _DE_V:
            out[i] = out[i].upper()
    return "".join(out)


@lru_cache(maxsize=65536)
def stem_german(word: str) -> str:
    w = _de_prelude(word.lower())
    r1, r2 = _r_regions(w, _DE_V)
    r1 = max(r1, 3)     # region before R1 must hold >= 3 letters

    def in_r1(wd, suf):
        return len(wd) - len(suf) >= r1

    def in_r2(wd, suf):
        return len(wd) - len(suf) >= r2

    # step 1
    for suf in ("ern", "em", "er"):
        if w.endswith(suf):
            if in_r1(w, suf):
                w = w[:-len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if w.endswith(suf):
                if in_r1(w, suf):
                    w = w[:-len(suf)]
                    if w.endswith("niss"):
                        w = w[:-1]
                break
        else:
            if w.endswith("s") and in_r1(w, "s") and len(w) >= 2 \
                    and w[-2] in _DE_S_END:
                w = w[:-1]

    # step 2
    for suf in ("est", "en", "er"):
        if w.endswith(suf):
            if in_r1(w, suf):
                w = w[:-len(suf)]
            break
    else:
        if w.endswith("st") and in_r1(w, "st") and len(w) >= 6 \
                and w[-3] in _DE_ST_END:
            w = w[:-2]

    # step 3 (d-suffixes)
    for suf in ("end", "ung"):
        if w.endswith(suf):
            if in_r2(w, suf):
                w = w[:-len(suf)]
                if w.endswith("ig") and in_r2(w, "ig") and \
                        not w[:-2].endswith("e"):
                    w = w[:-2]
            break
    else:
        for suf in ("isch", "ik", "ig"):
            if w.endswith(suf):
                if in_r2(w, suf) and not w[:-len(suf)].endswith("e"):
                    w = w[:-len(suf)]
                break
        else:
            for suf in ("lich", "heit"):
                if w.endswith(suf):
                    if in_r2(w, suf):
                        w = w[:-len(suf)]
                        for pre in ("er", "en"):
                            if w.endswith(pre) and in_r1(w, pre):
                                w = w[:-2]
                                break
                    break
            else:
                if w.endswith("keit") and in_r2(w, "keit"):
                    w = w[:-4]
                    for pre in ("lich", "ig"):
                        if w.endswith(pre) and in_r2(w, pre):
                            w = w[:-len(pre)]
                            break

    # postlude
    return (w.replace("U", "u").replace("Y", "y")
            .replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# ============================================================== SPANISH

_ES_V = "aeiouáéíóúü"

_ES_PRON = sorted(("me", "se", "sela", "selo", "selas", "selos", "la",
                   "le", "lo", "las", "les", "los", "nos"),
                  key=len, reverse=True)
_ES_PRE_A = sorted(("iéndo", "ándo", "ár", "ér", "ír"), key=len, reverse=True)
_ES_PRE_A_FIX = {"iéndo": "iendo", "ándo": "ando", "ár": "ar",
                 "ér": "er", "ír": "ir"}
_ES_PRE_B = sorted(("ando", "iendo", "ar", "er", "ir"), key=len, reverse=True)


def _es_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _ES_V:
        # second letter a consonant: after the next following vowel
        for i in range(2, n):
            if w[i] in _ES_V:
                return i + 1
        return n
    if w[0] in _ES_V and w[1] in _ES_V:
        # first two letters vowels: after the next following consonant
        for i in range(2, n):
            if w[i] not in _ES_V:
                return i + 1
        return n
    # consonant-vowel: after the third letter
    return 3


_ES_STEP1_GROUPS: list[tuple[str, tuple[str, ...]]] = [
    ("simple", ("anza", "anzas", "ico", "ica", "icos", "icas", "ismo",
                "ismos", "able", "ables", "ible", "ibles", "ista",
                "istas", "oso", "osa", "osos", "osas", "amiento",
                "amientos", "imiento", "imientos")),
    ("ador", ("adora", "ador", "ación", "adoras", "adores", "aciones",
              "ante", "antes", "ancia", "ancias")),
    ("logia", ("logía", "logías")),
    ("ucion", ("ución", "uciones")),
    ("encia", ("encia", "encias")),
    ("amente", ("amente",)),
    ("mente", ("mente",)),
    ("idad", ("idad", "idades")),
    ("iva", ("iva", "ivo", "ivas", "ivos")),
]
_ES_STEP1_GROUP = {s: g for g, sufs in _ES_STEP1_GROUPS for s in sufs}
_ES_STEP1_ORDER = sorted(_ES_STEP1_GROUP, key=len, reverse=True)

_ES_2A = sorted(("ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó",
                 "yas", "yes", "yais", "yamos"), key=len, reverse=True)

_ES_2B_GU = ("en", "es", "éis", "emos")
_ES_2B = sorted(set(_ES_2B_GU) | {
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré", "erían", "erías", "erán", "erás",
    "eríais", "ería", "eréis", "eríamos", "eremos", "erá", "eré",
    "irían", "irías", "irán", "irás", "iríais", "iría", "iréis",
    "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida", "ía", "ara",
    "iera", "ad", "ed", "id", "ase", "iese", "aste", "iste", "an",
    "aban", "ían", "aran", "ieran", "asen", "iesen", "aron", "ieron",
    "ado", "ido", "ando", "iendo", "ió", "ar", "er", "ir", "as", "abas",
    "adas", "idas", "ías", "aras", "ieras", "ases", "ieses", "ís",
    "áis", "abais", "íais", "arais", "ierais", "aseis", "ieseis",
    "asteis", "isteis", "ados", "idos", "amos", "ábamos", "íamos",
    "imos", "áramos", "iéramos", "iésemos", "ásemos"},
    key=len, reverse=True)

_ES_ACCENT = str.maketrans("áéíóú", "aeiou")   # ü is preserved


@lru_cache(maxsize=65536)
def stem_spanish(word: str) -> str:
    w = word.lower()
    r1, r2 = _r_regions(w, _ES_V)
    rv = _es_rv(w)

    def in_r1(wd, suf):
        return len(wd) - len(suf) >= r1

    def in_r2(wd, suf):
        return len(wd) - len(suf) >= r2

    def in_rv(wd, suf):
        return len(wd) - len(suf) >= rv

    # ------------------------------------------------ step 0: pronouns
    for pron in _ES_PRON:
        if not w.endswith(pron):
            continue
        rest = w[:-len(pron)]
        done = False
        for pre in _ES_PRE_A:
            if rest.endswith(pre) and len(rest) - len(pre) >= rv:
                w = rest[:-len(pre)] + _ES_PRE_A_FIX[pre]
                done = True
                break
        if not done:
            for pre in _ES_PRE_B:
                if rest.endswith(pre) and len(rest) - len(pre) >= rv:
                    w = rest
                    done = True
                    break
        if not done and rest.endswith("yendo") and \
                rest[:-5].endswith("u"):
            w = rest
            done = True
        break   # longest pronoun only, matched or not

    # ------------------------------------------------ step 1
    w1 = w
    matched = None
    for suf in _ES_STEP1_ORDER:
        if w.endswith(suf):
            matched = suf
            break
    if matched is not None:
        s = matched
        grp = _ES_STEP1_GROUP[s]
        if grp == "simple":
            if in_r2(w, s):
                w1 = w[:-len(s)]
        elif grp == "ador":
            if in_r2(w, s):
                w1 = w[:-len(s)]
                if w1.endswith("ic") and in_r2(w1, "ic"):
                    w1 = w1[:-2]
        elif grp == "logia":
            if in_r2(w, s):
                w1 = w[:-len(s)] + "log"
        elif grp == "ucion":
            if in_r2(w, s):
                w1 = w[:-len(s)] + "u"
        elif grp == "encia":
            if in_r2(w, s):
                w1 = w[:-len(s)] + "ente"
        elif grp == "amente":
            if in_r1(w, s):
                w1 = w[:-len(s)]
                if w1.endswith("iv") and in_r2(w1, "iv"):
                    w1 = w1[:-2]
                    if w1.endswith("at") and in_r2(w1, "at"):
                        w1 = w1[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w1.endswith(pre) and in_r2(w1, pre):
                            w1 = w1[:-2]
                            break
        elif grp == "mente":
            if in_r2(w, s):
                w1 = w[:-len(s)]
                for pre in ("ante", "able", "ible"):
                    if w1.endswith(pre) and in_r2(w1, pre):
                        w1 = w1[:-len(pre)]
                        break
        elif grp == "idad":
            if in_r2(w, s):
                w1 = w[:-len(s)]
                for pre in ("abil", "ic", "iv"):
                    if w1.endswith(pre) and in_r2(w1, pre):
                        w1 = w1[:-len(pre)]
                        break
        elif grp == "iva":
            if in_r2(w, s):
                w1 = w[:-len(s)]
                if w1.endswith("at") and in_r2(w1, "at"):
                    w1 = w1[:-2]
    step1_removed = w1 != w
    w = w1

    # ------------------------------------------- steps 2a/2b (RV only)
    if not step1_removed:
        removed_2a = False
        for suf in _ES_2A:
            if w.endswith(suf) and in_rv(w, suf):
                if w[:-len(suf)].endswith("u"):
                    w = w[:-len(suf)]
                    removed_2a = True
                break
        if not removed_2a:
            for suf in _ES_2B:
                if w.endswith(suf) and in_rv(w, suf):
                    w = w[:-len(suf)]
                    if suf in _ES_2B_GU and w.endswith("gu"):
                        w = w[:-1]
                    break

    # ------------------------------------------------ step 3 (RV only)
    for suf in ("os", "a", "o", "á", "í", "ó"):
        if w.endswith(suf) and in_rv(w, suf):
            w = w[:-len(suf)]
            break
    else:
        for suf in ("e", "é"):
            if w.endswith(suf) and in_rv(w, suf):
                w = w[:-len(suf)]
                if w.endswith("u") and in_rv(w, "u") and \
                        w[:-1].endswith("g"):
                    w = w[:-1]
                break

    return w.translate(_ES_ACCENT)
