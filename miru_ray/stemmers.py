"""Snowball stemmers for ru / nl / es / pt / it / fr / da / sv / nb —
the locale-analyzer breadth the reference carries as Lucene per-locale
analyzers (miru-plugin .../TermAnalyzers.java:51-81 registers 31 locale
chains; round 4 shipped en+de, this module adds the next nine by corpus
frequency, VERDICT r5 demand #3; no/nn alias onto nb like Lucene's
NorwegianAnalyzer).

Each stemmer is a from-scratch implementation of the PUBLISHED Snowball
algorithm for its language (snowballstem.org/algorithms/<lang>/stemmer.html)
as a scalar word → stem function; `stem.stem_array` vectorizes any of them
over an Arrow token stream by dictionary encoding (the Python kernel runs
once per unique token). The suffix tables below are transcriptions of the
spec's ending lists; the *evaluation engine* (region math, longest-match
`among` semantics, condition gating) is implemented twice — the Python
walk here and an independent DuckDB CASE-cascade built by
`miru_ray.snowball_sql` — and the driver's correctness gate
compares the two on corpus vocabulary plus per-language probe words, the
same two-implementation pattern as the Porter2 / German twins (stem.py).

Shared Snowball semantics implemented here:

* **R1/R2** — the region after the first non-vowel following a vowel,
  and the same again (spec: "R1 is the region after the first non-vowel
  following a vowel, or the end of the word if there is no such
  non-vowel"; R2 computed within R1).
* **RV** (Romance languages) — if the second letter is a consonant, the
  region after the next following vowel; if the first two letters are
  vowels, the region after the next consonant; otherwise (consonant-
  vowel) the region after the third letter; end of word if no such
  position.
* **RV** (Russian) — the region after the first vowel.
* **longest match** (`among`) — the longest listed suffix that matches
  is selected; its own condition then decides success or failure with NO
  backtracking to shorter entries.
* "suffix in R" — the suffix must lie entirely inside the region:
  ``len(w) - len(suffix) >= region_start``.
"""

from __future__ import annotations

# --------------------------------------------------------------- region math


def _regions_std(w: str, vowels: frozenset) -> tuple[int, int]:
    """Standard Snowball R1/R2 as character offsets (len(w) if absent)."""
    n = len(w)
    r1 = n
    for i in range(1, n):
        if w[i] not in vowels and w[i - 1] in vowels:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in vowels and w[i - 1] in vowels:
            r2 = i + 1
            break
    return r1, r2


def _rv_romance(w: str, vowels: frozenset) -> int:
    """Spanish/Portuguese/Italian RV (see module doc)."""
    n = len(w)
    if n < 2:
        return n
    if w[1] not in vowels:
        # region after the next following vowel
        for i in range(2, n):
            if w[i] in vowels:
                return i + 1
        return n
    if w[0] in vowels and w[1] in vowels:
        # region after the next consonant
        for i in range(2, n):
            if w[i] not in vowels:
                return i + 1
        return n
    # consonant-vowel start: region after the third letter
    return 3 if n > 3 else n


def _lmatch(w: str, sufs) -> str | None:
    """Longest suffix of ``w`` among ``sufs`` (the Snowball `among`)."""
    best = None
    for s in sufs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


# ------------------------------------------------------------------- Russian
#
# snowballstem.org/algorithms/russian/stemmer.html — all steps operate
# within RV (the region after the first vowel); DERIVATIONAL additionally
# requires R2. Group-1 endings must directly follow а or я (and that
# letter must itself lie in RV: the backwards cursor test crosses it).

_RU_VOWELS = frozenset("аеиоуыэюя")

_RU_PERF_GERUND_1 = ("в", "вши", "вшись")
_RU_PERF_GERUND_2 = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_RU_REFLEXIVE = ("ся", "сь")
_RU_ADJECTIVE = (
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой", "ем",
    "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых", "ую", "юю",
    "ая", "яя", "ою", "ею",
)
_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = (
    "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но", "ет",
    "ют", "ны", "ть", "ешь", "нно",
)
_RU_VERB_2 = (
    "ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей", "уй",
    "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят", "ует", "уют",
    "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю",
)
_RU_NOUN = (
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи", "ии",
    "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием", "ем", "ам",
    "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию", "ью", "ю", "ия",
    "ья", "я",
)
_RU_SUPERLATIVE = ("ейш", "ейше")
_RU_DERIVATIONAL = ("ост", "ость")


def _ru_grouped(w: str, rv: int, group1, group2) -> str | None:
    """Longest match over group1 ∪ group2 inside RV; group-1 entries must
    directly follow а/я (also inside RV). Returns the shortened word or
    None — a failed condition fails the whole among (no backtracking)."""
    s = _lmatch(w, [x for x in group1 + group2 if len(w) - len(x) >= rv])
    if s is None:
        return None
    if s in group1 and s not in group2:
        p = len(w) - len(s) - 1
        if p < rv or p < 0 or w[p] not in ("а", "я"):
            return None
    return w[: len(w) - len(s)]


def _ru_in_rv(w: str, rv: int, sufs) -> str | None:
    s = _lmatch(w, [x for x in sufs if len(w) - len(x) >= rv])
    return None if s is None else w[: len(w) - len(s)]


def russian_stem(word: str) -> str:
    """Stem one lowercase Cyrillic token by the published Snowball
    Russian algorithm. Non-Cyrillic input passes through largely
    untouched (no vowels → RV = end of word → no suffix is ever in RV)."""
    w = word.replace("ё", "е")
    rv = len(w)
    for i, c in enumerate(w):
        if c in _RU_VOWELS:
            rv = i + 1
            break
    _, r2 = _regions_std(w, _RU_VOWELS)

    # step 1
    out = _ru_grouped(w, rv, _RU_PERF_GERUND_1, _RU_PERF_GERUND_2)
    if out is not None:
        w = out
    else:
        out = _ru_in_rv(w, rv, _RU_REFLEXIVE)
        if out is not None:
            w = out
        out = _ru_in_rv(w, rv, _RU_ADJECTIVE)
        if out is not None:
            w = out
            out = _ru_grouped(w, rv, _RU_PARTICIPLE_1, _RU_PARTICIPLE_2)
            if out is not None:
                w = out
        else:
            out = _ru_grouped(w, rv, _RU_VERB_1, _RU_VERB_2)
            if out is not None:
                w = out
            else:
                out = _ru_in_rv(w, rv, _RU_NOUN)
                if out is not None:
                    w = out

    # step 2: final и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 3: derivational, in R2 (R2 ⊆ RV: R2 starts after a consonant
    # that itself follows a vowel, hence strictly after RV's start)
    s = _lmatch(w, [x for x in _RU_DERIVATIONAL if len(w) - len(x) >= rv])
    if s is not None and len(w) - len(s) >= r2:
        w = w[: len(w) - len(s)]

    # step 4: tidy up — undouble н | superlative (then undouble н) | drop ь
    s = _lmatch(w, [x for x in _RU_SUPERLATIVE + ("н", "ь") if len(w) - len(x) >= rv])
    if s is not None:
        if s in _RU_SUPERLATIVE:
            w = w[: len(w) - len(s)]
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
        elif s == "н":
            if w.endswith("нн") and len(w) - 2 >= rv:
                w = w[:-1]
        else:  # ь
            w = w[: len(w) - 1]
    return w


# --------------------------------------------------------------------- Dutch
#
# snowballstem.org/algorithms/dutch/stemmer.html

_NL_VOWELS = frozenset("aeiouyè")


def _nl_prelude(w: str) -> str:
    """Remove umlaut/acute accents; uppercase initial y, y after a vowel,
    and i between vowels (I/Y then act as consonants)."""
    for a, b in (
        ("ä", "a"), ("ë", "e"), ("ï", "i"), ("ö", "o"), ("ü", "u"),
        ("á", "a"), ("é", "e"), ("í", "i"), ("ó", "o"), ("ú", "u"),
    ):
        w = w.replace(a, b)
    chars = list(w)
    n = len(chars)
    for i in range(n):
        if chars[i] == "y" and (i == 0 or chars[i - 1] in _NL_VOWELS):
            chars[i] = "Y"
        elif (
            chars[i] == "i"
            and 0 < i < n - 1
            and chars[i - 1] in _NL_VOWELS
            and chars[i + 1] in _NL_VOWELS
        ):
            chars[i] = "I"
    return "".join(chars)


def _nl_undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    """Stem one lowercase token by the published Snowball Dutch
    algorithm."""
    w = _nl_prelude(word)
    r1, r2 = _regions_std(w, _NL_VOWELS)
    r1 = max(r1, 3)  # the region before R1 must hold at least 3 letters

    # step 1: heden | en ene | s se (longest match)
    s = _lmatch(w, ("heden", "en", "ene", "s", "se"))
    if s == "heden":
        if len(w) - 5 >= r1:
            w = w[:-5] + "heid"
    elif s in ("en", "ene"):
        k = len(s)
        p = len(w) - k - 1
        stem_ok = (
            len(w) - k >= r1
            and p >= 0
            and w[p] not in _NL_VOWELS
            and not w[: len(w) - k].endswith("gem")
        )
        if stem_ok:
            w = _nl_undouble(w[: len(w) - k])
    elif s in ("s", "se"):
        k = len(s)
        p = len(w) - k - 1
        if len(w) - k >= r1 and p >= 0 and w[p] not in _NL_VOWELS and w[p] != "j":
            w = w[: len(w) - k]

    # step 2: suffix e
    e_found = False
    if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 and w[-2] not in _NL_VOWELS:
        e_found = True
        w = _nl_undouble(w[:-1])

    # step 3a: heid
    if w.endswith("heid") and len(w) - 4 >= r2 and not w[: -4].endswith("c"):
        w = w[:-4]
        if w.endswith("en"):
            p = len(w) - 3
            if (
                len(w) - 2 >= r1
                and p >= 0
                and w[p] not in _NL_VOWELS
                and not w[:-2].endswith("gem")
            ):
                w = _nl_undouble(w[:-2])

    # step 3b: d-suffixes (longest match)
    s = _lmatch(w, ("end", "ing", "ig", "lijk", "baar", "bar"))
    if s in ("end", "ing"):
        if len(w) - 3 >= r2:
            w = w[:-3]
            if w.endswith("ig") and len(w) - 2 >= r2 and not w.endswith("eig"):
                w = w[:-2]
            else:
                w = _nl_undouble(w)
    elif s == "ig":
        if len(w) - 2 >= r2 and not w.endswith("eig"):
            w = w[:-2]
    elif s == "lijk":
        if len(w) - 4 >= r2:
            w = w[:-4]
            # repeat step 2
            if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 and w[-2] not in _NL_VOWELS:
                w = _nl_undouble(w[:-1])
    elif s == "baar":
        if len(w) - 4 >= r2:
            w = w[:-4]
    elif s == "bar":
        if len(w) - 3 >= r2 and e_found:
            w = w[:-3]

    # step 4: undouble vowel — C + (aa|ee|oo|uu) + D, D a non-vowel ≠ I
    if len(w) >= 4:
        c, v1, v2, d = w[-4], w[-3], w[-2], w[-1]
        if (
            c not in _NL_VOWELS
            and d not in _NL_VOWELS
            and d != "I"
            and v1 == v2
            and v1 in ("a", "e", "o", "u")
        ):
            w = w[:-2] + w[-1]

    return w.replace("I", "i").replace("Y", "y")


# ------------------------------------------------------------------- Spanish
#
# snowballstem.org/algorithms/spanish/stemmer.html

_ES_VOWELS = frozenset("aeiouáéíóúü")

_ES_PRONOUNS = (
    "me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo", "las",
    "les", "los", "nos",
)
_ES_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")  # accent-fix group
_ES_PRE_B = ("ando", "iendo", "ar", "er", "ir")
_ES_DEACCENT = {"iéndo": "iendo", "ándo": "ando", "ár": "ar", "ér": "er", "ír": "ir"}

_ES_S1_DELETE_R2 = (
    "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
    "osos", "osas", "amiento", "amientos", "imiento", "imientos",
)
_ES_S1_IC = (
    "adora", "ador", "ación", "adoras", "adores", "aciones", "ante",
    "antes", "ancia", "ancias",
)
_ES_S2A = (
    "ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó", "yas", "yes",
    "yais", "yamos",
)
_ES_S2B_GU = ("en", "es", "éis", "emos")
_ES_S2B = (
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
    "imos", "áramos", "iéramos", "iésemos", "ásemos",
)
_ES_S3 = ("os", "a", "o", "á", "í", "ó")


def spanish_stem(word: str) -> str:
    """Stem one lowercase token by the published Snowball Spanish
    algorithm."""
    w = word
    rv = _rv_romance(w, _ES_VOWELS)
    r1, r2 = _regions_std(w, _ES_VOWELS)

    # ---- step 0: attached pronoun
    pron = _lmatch(w, _ES_PRONOUNS)
    if pron is not None:
        base = w[: len(w) - len(pron)]
        pre = _lmatch(base, _ES_PRE_A + _ES_PRE_B + ("yendo",))
        if pre is not None and len(base) - len(pre) >= rv:
            if pre == "yendo":
                if base[: len(base) - 5].endswith("u"):
                    w = base
            elif pre in _ES_DEACCENT:
                w = base[: len(base) - len(pre)] + _ES_DEACCENT[pre]
            else:
                w = base

    # ---- step 1: standard suffix removal (longest match over the union)
    step1_done = False
    all_s1 = (
        _ES_S1_DELETE_R2 + _ES_S1_IC + ("logía", "logías", "ución",
        "uciones", "encia", "encias", "amente", "mente", "idad",
        "idades", "iva", "ivo", "ivas", "ivos")
    )
    s = _lmatch(w, all_s1)
    if s is not None:
        k = len(s)
        if s in _ES_S1_DELETE_R2:
            if len(w) - k >= r2:
                w = w[: len(w) - k]
                step1_done = True
        elif s in _ES_S1_IC:
            if len(w) - k >= r2:
                w = w[: len(w) - k]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
                step1_done = True
        elif s in ("logía", "logías"):
            if len(w) - k >= r2:
                w = w[: len(w) - k] + "log"
                step1_done = True
        elif s in ("ución", "uciones"):
            if len(w) - k >= r2:
                w = w[: len(w) - k] + "u"
                step1_done = True
        elif s in ("encia", "encias"):
            if len(w) - k >= r2:
                w = w[: len(w) - k] + "ente"
                step1_done = True
        elif s == "amente":
            if len(w) - k >= r1:
                w = w[: len(w) - k]
                step1_done = True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and len(w) - 2 >= r2:
                            w = w[:-2]
                            break
        elif s == "mente":
            if len(w) - k >= r2:
                w = w[: len(w) - k]
                step1_done = True
                for pre in ("ante", "able", "ible"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: len(w) - len(pre)]
                        break
        elif s in ("idad", "idades"):
            if len(w) - k >= r2:
                w = w[: len(w) - k]
                step1_done = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: len(w) - len(pre)]
                        break
        elif s in ("iva", "ivo", "ivas", "ivos"):
            if len(w) - k >= r2:
                w = w[: len(w) - k]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                step1_done = True

    # ---- step 2a: verb suffixes beginning y (only if step 1 did nothing)
    step2a_done = False
    if not step1_done:
        s = _lmatch(w, [x for x in _ES_S2A if len(w) - len(x) >= rv])
        if s is not None and w[: len(w) - len(s)].endswith("u"):
            w = w[: len(w) - len(s)]
            step2a_done = True

    # ---- step 2b (only if 2a did nothing)
    if not step1_done and not step2a_done:
        s = _lmatch(w, [x for x in _ES_S2B_GU + _ES_S2B if len(w) - len(x) >= rv])
        if s is not None:
            w = w[: len(w) - len(s)]
            if s in _ES_S2B_GU and w.endswith("gu"):
                w = w[:-1]

    # ---- step 3: residual suffix
    s = _lmatch(w, [x for x in _ES_S3 + ("e", "é") if len(w) - len(x) >= rv])
    if s is not None:
        w = w[: len(w) - len(s)]
        if s in ("e", "é") and w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]

    # ---- postlude: remove acute accents
    for a, b in (("á", "a"), ("é", "e"), ("í", "i"), ("ó", "o"), ("ú", "u")):
        w = w.replace(a, b)
    return w


# ---------------------------------------------------------------- Portuguese
#
# snowballstem.org/algorithms/portuguese/stemmer.html — ã/õ are marked
# a~/o~ in the prelude (vowel + consonant for region purposes) and
# restored in the postlude.

_PT_VOWELS = frozenset("aeiouáéíóúâêô")

_PT_S1_DELETE_R2 = (
    "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
    "amento", "amentos", "imento", "imentos", "adora", "ador", "aça~o",
    "adoras", "adores", "aço~es", "ante", "antes", "ância",
)
_PT_S2 = (
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste",
    "ei", "arei", "erei", "irei", "am", "iam", "ariam", "eriam",
    "iriam", "aram", "eram", "iram", "avam", "em", "arem", "erem",
    "irem", "assem", "essem", "issem", "ado", "ido", "ando", "endo",
    "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas",
    "idas", "ias", "arias", "erias", "irias", "arás", "aras", "erás",
    "eras", "irás", "avas", "es", "ardes", "erdes", "irdes", "ares",
    "eres", "ires", "asses", "esses", "isses", "astes", "estes",
    "istes", "is", "ais", "eis", "íeis", "aríeis", "eríeis", "iríeis",
    "áreis", "areis", "éreis", "ereis", "íreis", "ireis", "ásseis",
    "ésseis", "ísseis", "áveis", "ados", "idos", "ámos", "amos",
    "íamos", "aríamos", "eríamos", "iríamos", "áramos", "éramos",
    "íramos", "ávamos", "emos", "aremos", "eremos", "iremos",
    "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos", "irmos",
    "eu", "iu", "ou", "ira", "iras",
)
_PT_S4 = ("os", "a", "i", "o", "á", "í", "ó")


def portuguese_stem(word: str) -> str:
    """Stem one lowercase token by the published Snowball Portuguese
    algorithm."""
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv = _rv_romance(w, _PT_VOWELS)
    r1, r2 = _regions_std(w, _PT_VOWELS)

    altered = False

    # ---- step 1: standard suffix removal
    all_s1 = (
        _PT_S1_DELETE_R2 + ("logia", "logias", "uça~o", "uço~es",
        "ência", "ências", "amente", "mente", "idade", "idades", "iva",
        "ivo", "ivas", "ivos", "ira", "iras")
    )
    s = _lmatch(w, all_s1)
    if s is not None:
        k = len(s)
        if s in _PT_S1_DELETE_R2:
            if len(w) - k >= r2:
                w = w[: len(w) - k]
                altered = True
        elif s in ("logia", "logias"):
            if len(w) - k >= r2:
                w = w[: len(w) - k] + "log"
                altered = True
        elif s in ("uça~o", "uço~es"):
            if len(w) - k >= r2:
                w = w[: len(w) - k] + "u"
                altered = True
        elif s in ("ência", "ências"):
            if len(w) - k >= r2:
                w = w[: len(w) - k] + "ente"
                altered = True
        elif s == "amente":
            if len(w) - k >= r1:
                w = w[: len(w) - k]
                altered = True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and len(w) - 2 >= r2:
                            w = w[:-2]
                            break
        elif s == "mente":
            if len(w) - k >= r2:
                w = w[: len(w) - k]
                altered = True
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: len(w) - len(pre)]
                        break
        elif s in ("idade", "idades"):
            if len(w) - k >= r2:
                w = w[: len(w) - k]
                altered = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: len(w) - len(pre)]
                        break
        elif s in ("iva", "ivo", "ivas", "ivos"):
            if len(w) - k >= r2:
                w = w[: len(w) - k]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                altered = True
        elif s in ("ira", "iras"):
            if len(w) - k >= rv and w[: len(w) - k].endswith("e"):
                w = w[: len(w) - k] + "ir"
                altered = True

    # ---- step 2: verb suffixes (only if step 1 removed nothing)
    if not altered:
        s = _lmatch(w, [x for x in _PT_S2 if len(w) - len(x) >= rv])
        if s is not None:
            w = w[: len(w) - len(s)]
            altered = True

    # ---- step 3: final i after c (only if steps 1-2 altered the word)
    if altered:
        if w.endswith("i") and len(w) - 1 >= rv and w[:-1].endswith("c"):
            w = w[:-1]
    else:
        # ---- step 4: residual suffix (only if steps 1-2 did nothing)
        s = _lmatch(w, [x for x in _PT_S4 if len(w) - len(x) >= rv])
        if s is not None:
            w = w[: len(w) - len(s)]

    # ---- step 5: residual form (always)
    s = _lmatch(w, [x for x in ("e", "é", "ê") if len(w) - len(x) >= rv])
    if s is not None:
        w = w[: len(w) - 1]
        if (w.endswith("gu") or w.endswith("ci")) and len(w) - 1 >= rv:
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# ------------------------------------------------------------------- Italian
#
# snowballstem.org/algorithms/italian/stemmer.html

_IT_VOWELS = frozenset("aeiouàèìòù")

_IT_PRONOUNS = (
    "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
    "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene",
)
_IT_S1_DELETE_R2 = (
    "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi", "ismo",
    "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste", "isti",
    "istà", "istè", "istì", "oso", "osi", "osa", "ose", "mente",
    "atrice", "atrici", "ante", "anti",
)
_IT_S1_IC = ("azione", "azioni", "atore", "atori")
_IT_S2 = (
    "ammo", "ando", "ano", "are", "arono", "asse", "assi", "assimo",
    "ata", "ate", "ati", "ato", "ava", "avamo", "avano", "avate",
    "avi", "avo", "emmo", "enda", "ende", "endi", "endo", "erà",
    "erai", "eranno", "ere", "erebbe", "erebbero", "erei", "eremmo",
    "eremo", "ereste", "eresti", "erete", "erò", "erono", "essero",
    "ete", "eva", "evamo", "evano", "evate", "evi", "evo", "Yamo",
    "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
    "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti",
    "irete", "irò", "irono", "isca", "iscano", "isce", "isci",
    "isco", "iscono", "issero", "ita", "ite", "iti", "ito", "iva",
    "ivamo", "ivano", "ivate", "ivi", "ivo", "ono", "uta", "ute",
    "uti", "uto", "ar", "ir",
)


def _it_prelude(w: str) -> str:
    for a, b in (("á", "à"), ("é", "è"), ("í", "ì"), ("ó", "ò"), ("ú", "ù")):
        w = w.replace(a, b)
    chars = list(w)
    n = len(chars)
    for i in range(n):
        if chars[i] == "u" and 0 < i and chars[i - 1] == "q":
            chars[i] = "U"
        elif (
            chars[i] in ("i", "u")
            and 0 < i < n - 1
            and chars[i - 1] in _IT_VOWELS
            and chars[i + 1] in _IT_VOWELS
        ):
            chars[i] = chars[i].upper()
    return "".join(chars)


def italian_stem(word: str) -> str:
    """Stem one lowercase token by the published Snowball Italian
    algorithm."""
    w = _it_prelude(word)
    rv = _rv_romance(w, _IT_VOWELS)
    r1, r2 = _regions_std(w, _IT_VOWELS)

    # ---- step 0: attached pronoun
    pron = _lmatch(w, _IT_PRONOUNS)
    if pron is not None:
        base = w[: len(w) - len(pron)]
        pre = _lmatch(base, ("ando", "endo", "ar", "er", "ir"))
        if pre is not None and len(base) - len(pre) >= rv:
            if pre in ("ando", "endo"):
                w = base
            else:
                w = base + "e"

    # ---- step 1: standard suffix removal
    step1_done = False
    all_s1 = (
        _IT_S1_DELETE_R2 + _IT_S1_IC + ("logia", "logie", "uzione",
        "uzioni", "usione", "usioni", "enza", "enze", "amento",
        "amenti", "imento", "imenti", "amente", "ità", "ivo", "ivi",
        "iva", "ive")
    )
    s = _lmatch(w, all_s1)
    if s is not None:
        k = len(s)
        if s in _IT_S1_DELETE_R2:
            if len(w) - k >= r2:
                w = w[: len(w) - k]
                step1_done = True
        elif s in _IT_S1_IC:
            if len(w) - k >= r2:
                w = w[: len(w) - k]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
                step1_done = True
        elif s in ("logia", "logie"):
            if len(w) - k >= r2:
                w = w[: len(w) - k] + "log"
                step1_done = True
        elif s in ("uzione", "uzioni", "usione", "usioni"):
            if len(w) - k >= r2:
                w = w[: len(w) - k] + "u"
                step1_done = True
        elif s in ("enza", "enze"):
            if len(w) - k >= r2:
                w = w[: len(w) - k] + "ente"
                step1_done = True
        elif s in ("amento", "amenti", "imento", "imenti"):
            if len(w) - k >= rv:
                w = w[: len(w) - k]
                step1_done = True
        elif s == "amente":
            if len(w) - k >= r1:
                w = w[: len(w) - k]
                step1_done = True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "abil"):
                        if w.endswith(pre) and len(w) - len(pre) >= r2:
                            w = w[: len(w) - len(pre)]
                            break
        elif s == "ità":
            if len(w) - k >= r2:
                w = w[: len(w) - k]
                step1_done = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: len(w) - len(pre)]
                        break
        elif s in ("ivo", "ivi", "iva", "ive"):
            if len(w) - k >= r2:
                w = w[: len(w) - k]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic") and len(w) - 2 >= r2:
                        w = w[:-2]
                step1_done = True

    # ---- step 2: verb suffixes (only if step 1 removed nothing)
    if not step1_done:
        s = _lmatch(w, [x for x in _IT_S2 if len(w) - len(x) >= rv])
        if s is not None:
            w = w[: len(w) - len(s)]

    # ---- step 3a: final vowel, then optional preceding i
    if w and w[-1] in ("a", "e", "i", "o", "à", "è", "ì", "ò") and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]

    # ---- step 3b: ch → c, gh → g
    if (w.endswith("ch") or w.endswith("gh")) and len(w) - 2 >= rv:
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")


STEMMERS = {
    "ru": russian_stem,
    "nl": dutch_stem,
    "es": spanish_stem,
    "pt": portuguese_stem,
    "it": italian_stem,
}


# -------------------------------------------------------------------- French
#
# snowballstem.org/algorithms/french/stemmer.html — prelude marks u/i
# between vowels, y next to a vowel, and u after q as U/I/Y (consonants);
# RV has the two-vowel / par|col|tap exceptions; steps 2a/2b are gated on
# step 1's outcome (and the ment-family counts as "found" even when
# removed); steps 5 (undouble enn/onn/ett/ell/eill) and 6 (un-accent
# é/è before a trailing consonant run) always run.

_FR_VOWELS = frozenset("aeiouyâàëéêèïîôûù")

_FR_S1_DELETE_R2 = (
    "ance", "iqUe", "isme", "able", "iste", "eux", "ances", "iqUes",
    "ismes", "ables", "istes",
)
_FR_S1_ATEUR = ("atrice", "ateur", "ation", "atrices", "ateurs", "ations")
_FR_S2A = (
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
    "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
    "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
    "issant", "issante", "issantes", "issants", "isse", "issent",
    "isses", "issez", "issiez", "issions", "issons", "it",
)
_FR_S2B_DELETE = (
    "é", "ée", "ées", "és", "èrent", "er", "era", "erai", "eraIent",
    "erais", "erait", "eras", "erez", "eriez", "erions", "erons",
    "eront", "ez", "iez",
)
_FR_S2B_E = (
    "âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant",
    "ante", "antes", "ants", "as", "asse", "assent", "asses",
    "assiez", "assions",
)


def _fr_prelude(w: str) -> str:
    chars = list(w)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        if c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
        elif (
            c in ("u", "i")
            and 0 < i < n - 1
            and chars[i - 1] in _FR_VOWELS
            and chars[i + 1] in _FR_VOWELS
        ):
            chars[i] = c.upper()
        elif c == "y" and (
            (i > 0 and chars[i - 1] in _FR_VOWELS)
            or (i < n - 1 and chars[i + 1] in _FR_VOWELS)
        ):
            chars[i] = "Y"
    return "".join(chars)


def _fr_rv(w: str) -> int:
    n = len(w)
    if n >= 2 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        return min(3, n)
    if w[:3] in ("par", "col", "tap"):
        return min(3, n)
    for i in range(1, n):
        if w[i] in _FR_VOWELS:
            return i + 1
    return n


def french_stem(word: str) -> str:
    """Stem one lowercase token by the published Snowball French
    algorithm."""
    w = _fr_prelude(word)
    rv = _fr_rv(w)
    r1, r2 = _regions_std(w, _FR_VOWELS)

    found_ment = False
    altered = False

    # ---- step 1: standard suffix removal (longest match, conditions)
    all_s1 = (
        _FR_S1_DELETE_R2 + _FR_S1_ATEUR + (
            "logie", "logies", "usion", "ution", "usions", "utions",
            "ence", "ences", "ement", "ements", "ité", "ités", "if",
            "ive", "ifs", "ives", "eaux", "aux", "euse", "euses",
            "issement", "issements", "amment", "emment", "ment", "ments",
        )
    )
    s = _lmatch(w, all_s1)
    if s is not None:
        k = len(s)
        base = w[: len(w) - k]
        if s in _FR_S1_DELETE_R2:
            if len(w) - k >= r2:
                w, altered = base, True
        elif s in _FR_S1_ATEUR:
            if len(w) - k >= r2:
                w, altered = base, True
                if w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif s in ("logie", "logies"):
            if len(w) - k >= r2:
                w, altered = base + "log", True
        elif s in ("usion", "ution", "usions", "utions"):
            if len(w) - k >= r2:
                w, altered = base + "u", True
        elif s in ("ence", "ences"):
            if len(w) - k >= r2:
                w, altered = base + "ent", True
        elif s in ("ement", "ements"):
            if len(w) - k >= rv:
                w, altered = base, True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif w.endswith("eus"):
                    if len(w) - 3 >= r2:
                        w = w[:-3]
                    elif len(w) - 3 >= r1:
                        w = w[:-3] + "eux"
                elif (w.endswith("abl") or w.endswith("iqU")) and len(w) - 3 >= r2:
                    w = w[:-3]
                elif (w.endswith("ièr") or w.endswith("Ièr")) and len(w) - 3 >= rv:
                    w = w[:-3] + "i"
        elif s in ("ité", "ités"):
            if len(w) - k >= r2:
                w, altered = base, True
                if w.endswith("abil"):
                    if len(w) - 4 >= r2:
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("if", "ive", "ifs", "ives"):
            if len(w) - k >= r2:
                w, altered = base, True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic"):
                        if len(w) - 2 >= r2:
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif s == "eaux":
            w, altered = base + "eau", True
        elif s == "aux":
            if len(w) - k >= r1:
                w, altered = base + "al", True
        elif s in ("euse", "euses"):
            if len(w) - k >= r2:
                w, altered = base, True
            elif len(w) - k >= r1:
                w, altered = base + "eux", True
        elif s in ("issement", "issements"):
            if len(w) - k >= r1 and len(base) > 0 and base[-1] not in _FR_VOWELS:
                w, altered = base, True
        elif s == "amment":
            found_ment = True
            if len(w) - k >= rv:
                w, altered = base + "ant", True
        elif s == "emment":
            found_ment = True
            if len(w) - k >= rv:
                w, altered = base + "ent", True
        elif s in ("ment", "ments"):
            found_ment = True
            # "delete if preceded by a vowel in RV": the preceding vowel
            # must itself lie in RV
            p = len(w) - k - 1
            if p >= rv and w[p] in _FR_VOWELS:
                w, altered = base, True

    # ---- steps 2a/2b: verb suffixes
    step1_removed = altered
    do2a = (not step1_removed) or found_ment
    altered2 = False
    if do2a:
        s = _lmatch(w, [x for x in _FR_S2A if len(w) - len(x) >= rv])
        if s is not None:
            p = len(w) - len(s) - 1
            if p >= rv and p >= 0 and w[p] not in _FR_VOWELS:
                w = w[: len(w) - len(s)]
                altered2 = True
        if not altered2:
            # step 2b
            s = _lmatch(
                w,
                [x for x in ("ions",) + _FR_S2B_DELETE + _FR_S2B_E
                 if len(w) - len(x) >= rv],
            )
            if s is not None:
                if s == "ions":
                    if len(w) - 4 >= r2:
                        w = w[:-4]
                        altered2 = True
                elif s in _FR_S2B_DELETE:
                    w = w[: len(w) - len(s)]
                    altered2 = True
                else:  # _FR_S2B_E
                    w = w[: len(w) - len(s)]
                    altered2 = True
                    if w.endswith("e") and len(w) - 1 >= rv:
                        w = w[:-1]

    # ---- step 3 (last obeyed step altered) or step 4 (it did not)
    if step1_removed or altered2:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4: final s unless preceded by a, i (not after H), o, u, è, s
        if w.endswith("s") and len(w) >= 2:
            p = w[-2]
            hi_exception = p == "i" and len(w) >= 3 and w[-3] == "H"
            if hi_exception or p not in ("a", "i", "o", "u", "è", "s"):
                w = w[:-1]
        # then, in RV (setlimit → pre-filter), longest of:
        s = _lmatch(
            w,
            [x for x in ("ion", "ier", "ière", "Ier", "Ière", "e", "ë")
             if len(w) - len(x) >= rv],
        )
        if s == "ion":
            if len(w) - 3 >= r2 and len(w) - 4 >= rv and len(w) >= 4 \
                    and w[-4] in ("s", "t"):
                w = w[:-3]
        elif s in ("ier", "ière", "Ier", "Ière"):
            w = w[: len(w) - len(s)] + "i"
        elif s == "e":
            w = w[:-1]
        elif s == "ë":
            if w[: len(w) - 1].endswith("gu"):
                w = w[:-1]

    # ---- step 5: undouble
    if w.endswith(("enn", "onn", "ett", "ell", "eill")):
        w = w[:-1]

    # ---- step 6: un-accent é/è before a trailing non-vowel run
    n = len(w)
    i = n - 1
    run = 0
    while i >= 0 and w[i] not in _FR_VOWELS:
        i -= 1
        run += 1
    if run >= 1 and i >= 0 and w[i] in ("é", "è"):
        w = w[:i] + "e" + w[i + 1:]

    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


STEMMERS["fr"] = french_stem


# ------------------------------------------------- Danish/Norwegian/Swedish
#
# The three Scandinavian Snowball algorithms share one shape: a single
# big step-1 ending list + a valid-s-ending rule, a consonant-pair
# trim, and a small step-3 list — all under an R1 limit whose region
# must be preceded by at least 3 letters.

_DA_VOWELS = frozenset("aeiouyæåø")
_DA_S1 = (
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
    "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
    "hedens", "erens", "ers", "ets", "erets", "et", "eret",
)
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")


def danish_stem(word: str) -> str:
    """Stem one lowercase token by the published Snowball Danish
    algorithm."""
    w = word
    r1, _ = _regions_std(w, _DA_VOWELS)
    r1 = max(r1, 3)

    # step 1 (setlimit R1 → pre-filter; the s-ending test is unrestricted)
    s = _lmatch(w, [x for x in _DA_S1 + ("s",) if len(w) - len(x) >= r1])
    if s == "s":
        if len(w) >= 2 and w[-2] in _DA_S_END:
            w = w[:-1]
    elif s is not None:
        w = w[: len(w) - len(s)]

    # step 2: consonant pair — gd dt gt kt in R1 → drop the last letter
    if len(w) - 2 >= r1 and w[-2:] in ("gd", "dt", "gt", "kt"):
        w = w[:-1]

    # step 3: igst → drop st; then ig/lig/elig/els delete (in R1, then
    # repeat step 2) or løst → løs
    if w.endswith("igst"):
        w = w[:-2]
    s = _lmatch(
        w, [x for x in ("ig", "lig", "elig", "els", "løst") if len(w) - len(x) >= r1]
    )
    if s == "løst":
        w = w[:-1]
    elif s is not None:
        w = w[: len(w) - len(s)]
        if len(w) - 2 >= r1 and w[-2:] in ("gd", "dt", "gt", "kt"):
            w = w[:-1]

    # step 4: undouble a final double consonant in R1
    if (
        len(w) >= 2
        and len(w) - 1 >= r1
        and w[-1] not in _DA_VOWELS
        and w[-1] == w[-2]
    ):
        w = w[:-1]
    return w


_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S1 = (
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aden", "heten", "ern", "ar",
    "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
    "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
    "ast",
)
_SV_S_END = frozenset("bcdfghjklmnoprtvy")


def swedish_stem(word: str) -> str:
    """Stem one lowercase token by the published Snowball Swedish
    algorithm."""
    w = word
    r1, _ = _regions_std(w, _SV_VOWELS)
    r1 = max(r1, 3)

    # step 1
    s = _lmatch(w, [x for x in _SV_S1 + ("s",) if len(w) - len(x) >= r1])
    if s == "s":
        if len(w) >= 2 and w[-2] in _SV_S_END:
            w = w[:-1]
    elif s is not None:
        w = w[: len(w) - len(s)]

    # step 2: dd gd nn dt gt kt tt in R1 → drop the last letter
    if len(w) - 2 >= r1 and w[-2:] in ("dd", "gd", "nn", "dt", "gt", "kt", "tt"):
        w = w[:-1]

    # step 3 (in R1): lig ig els delete; löst → lös; fullt → full
    s = _lmatch(
        w,
        [x for x in ("lig", "ig", "els", "löst", "fullt") if len(w) - len(x) >= r1],
    )
    if s in ("löst", "fullt"):
        w = w[:-1]
    elif s is not None:
        w = w[: len(w) - len(s)]
    return w


_NB_VOWELS = frozenset("aeiouyæåø")
_NB_S1 = (
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
    "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast",
)
_NB_S_END = frozenset("bcdfghjlmnoprtvyz")
_NB_S3 = ("leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov",
          "elov", "slov", "hetslov")


def norwegian_stem(word: str) -> str:
    """Stem one lowercase token by the published Snowball Norwegian
    (Bokmål) algorithm."""
    w = word
    r1, _ = _regions_std(w, _NB_VOWELS)
    r1 = max(r1, 3)

    # step 1: big list | s (valid s-ending, incl. k-after-non-vowel) |
    # erte/ert → er
    s = _lmatch(
        w, [x for x in _NB_S1 + ("s", "erte", "ert") if len(w) - len(x) >= r1]
    )
    if s == "s":
        p = w[-2] if len(w) >= 2 else ""
        if p in _NB_S_END or (
            p == "k" and len(w) >= 3 and w[-3] not in _NB_VOWELS
        ):
            w = w[:-1]
    elif s in ("erte", "ert"):
        w = w[: len(w) - len(s)] + "er"
    elif s is not None:
        w = w[: len(w) - len(s)]

    # step 2: dt vt in R1 → drop the t
    if len(w) - 2 >= r1 and w[-2:] in ("dt", "vt"):
        w = w[:-1]

    # step 3 (in R1): delete
    s = _lmatch(w, [x for x in _NB_S3 if len(w) - len(x) >= r1])
    if s is not None:
        w = w[: len(w) - len(s)]
    return w


STEMMERS["da"] = danish_stem
STEMMERS["sv"] = swedish_stem
STEMMERS["nb"] = norwegian_stem


# ------------------------------------------------------------------ Romanian
#
# snowballstem.org/algorithms/romanian/stemmer.html — prelude marks i/u
# between vowels (and normalizes comma-below ș/ț to cedilla ş/ţ); step 0
# strips plural/article endings in R1; step 1 reduces COMBINING
# suffixes in R1 and REPEATS until no change (creativitate → creativ →
# creat); step 2 strips standard suffixes in R2; step 3 (verb suffixes,
# in RV) runs only when steps 1-2 removed nothing; step 4 drops a final
# vowel in RV.

_RO_VOWELS = frozenset("aăâeiîou")

_RO_S0 = {
    "ul": None, "ului": None,
    "aua": "a",
    "ea": "e", "ele": "e", "elor": "e",
    "ii": "i", "iua": "i", "iei": "i", "iile": "i", "iilor": "i",
    "ilor": "i",
    "ile": "i",  # special: not preceded by ab
    "atei": "at",
    "aţie": "aţi", "aţia": "aţi",
}
_RO_S1 = {
    "abilitate": "abil", "abilitati": "abil", "abilităi": "abil",
    "abilităţi": "abil",
    "ibilitate": "ibil",
    "ivitate": "iv", "ivitati": "iv", "ivităi": "iv", "ivităţi": "iv",
    "icitate": "ic", "icitati": "ic", "icităi": "ic", "icităţi": "ic",
    "icator": "ic", "icatori": "ic", "iciv": "ic", "iciva": "ic",
    "icive": "ic", "icivi": "ic", "icivă": "ic", "ical": "ic",
    "icala": "ic", "icale": "ic", "icali": "ic", "icală": "ic",
    "ativ": "at", "ativa": "at", "ative": "at", "ativi": "at",
    "ativă": "at", "aţiune": "at", "atoare": "at", "ator": "at",
    "atori": "at", "ătoare": "at", "ător": "at", "ători": "at",
    "itiv": "it", "itiva": "it", "itive": "it", "itivi": "it",
    "itivă": "it", "iţiune": "it", "itoare": "it", "itor": "it",
    "itori": "it",
}
_RO_S2_DELETE = (
    "at", "ata", "ată", "ati", "ate", "ut", "uta", "ută", "uti", "ute",
    "it", "ita", "ită", "iti", "ite", "ic", "ica", "ice", "ici", "ică",
    "abil", "abila", "abile", "abili", "abilă", "ibil", "ibila",
    "ibile", "ibili", "ibilă", "oasa", "oasă", "oase", "os", "osi",
    "oşi", "ant", "anta", "ante", "anti", "antă", "ator", "atori",
    "itate", "itati", "ităi", "ităţi", "iv", "iva", "ive", "ivi", "ivă",
)
_RO_S2_IST = ("ism", "isme", "ist", "ista", "iste", "isti", "istă", "işti")
_RO_S3_G1 = (
    "are", "ere", "ire", "âre", "ind", "ând", "indu", "ându", "eze",
    "ească", "ez", "ezi", "ează", "esc", "eşti", "eşte", "ăsc", "ăşti",
    "ăşte", "am", "ai", "au", "eam", "eai", "ea", "eaţi", "eau", "iam",
    "iai", "ia", "iaţi", "iau", "ui", "aşi", "arăm", "araţi", "ară",
    "uşi", "urăm", "uraţi", "ură", "işi", "irăm", "iraţi", "iră", "âi",
    "âşi", "ârăm", "âraţi", "âră", "asem", "aseşi", "ase", "aserăm",
    "aserăţi", "aseră", "isem", "iseşi", "ise", "iserăm", "iserăţi",
    "iseră", "âsem", "âseşi", "âse", "âserăm", "âserăţi", "âseră",
    "usem", "useşi", "use", "userăm", "userăţi", "useră",
)
_RO_S3_G2 = (
    "ăm", "aţi", "em", "eţi", "im", "iţi", "âm", "âţi", "seşi",
    "serăm", "serăţi", "seră", "sei", "se", "sesem", "seseşi", "sese",
    "seserăm", "seserăţi", "seseră",
)


def _ro_prelude(w: str) -> str:
    w = w.replace("ș", "ş").replace("ț", "ţ")
    chars = list(w)
    n = len(chars)
    for i in range(1, n - 1):
        if (
            chars[i] in ("i", "u")
            and chars[i - 1] in _RO_VOWELS
            and chars[i + 1] in _RO_VOWELS
        ):
            chars[i] = chars[i].upper()
    return "".join(chars)


def romanian_stem(word: str) -> str:
    """Stem one lowercase token by the published Snowball Romanian
    algorithm."""
    w = _ro_prelude(word)
    rv = _rv_romance(w, _RO_VOWELS)
    r1, r2 = _regions_std(w, _RO_VOWELS)

    # ---- step 0 (in R1)
    s = _lmatch(w, list(_RO_S0))
    if s is not None and len(w) - len(s) >= r1:
        if s == "ile":
            if not w[: len(w) - 3].endswith("ab"):
                w = w[: len(w) - 3] + "i"
        else:
            rep = _RO_S0[s]
            w = w[: len(w) - len(s)] + (rep or "")

    # ---- step 1 (in R1, repeat until no replacement)
    std_removed = False
    while True:
        s = _lmatch(w, list(_RO_S1))
        if s is None or len(w) - len(s) < r1:
            break
        w = w[: len(w) - len(s)] + _RO_S1[s]
        std_removed = True

    # ---- step 2 (in R2)
    s = _lmatch(w, _RO_S2_DELETE + _RO_S2_IST + ("iune", "iuni"))
    if s is not None and len(w) - len(s) >= r2:
        if s in ("iune", "iuni"):
            if w[: len(w) - len(s)].endswith("ţ"):
                w = w[: len(w) - len(s) - 1] + "t"
                std_removed = True
        elif s in _RO_S2_IST:
            w = w[: len(w) - len(s)] + "ist"
            std_removed = True
        else:
            w = w[: len(w) - len(s)]
            std_removed = True

    # ---- step 3 (verb suffixes, in RV; only if steps 1-2 did nothing)
    if not std_removed:
        s = _lmatch(
            w, [x for x in _RO_S3_G1 + _RO_S3_G2 if len(w) - len(x) >= rv]
        )
        if s is not None:
            if s in _RO_S3_G1 and s not in _RO_S3_G2:
                p = len(w) - len(s) - 1
                if p >= rv and (w[p] not in _RO_VOWELS or w[p] == "u"):
                    w = w[: len(w) - len(s)]
            else:
                w = w[: len(w) - len(s)]

    # ---- step 4: final vowel in RV
    s = _lmatch(w, [x for x in ("ie", "a", "e", "i", "ă") if len(w) - len(x) >= rv])
    if s is not None:
        w = w[: len(w) - len(s)]

    return w.replace("I", "i").replace("U", "u")


STEMMERS["ro"] = romanian_stem
