"""Pluggable analyzer registry — the per-locale analyzer seam.

The reference resolves a Lucene analyzer per field locale with a
fallback chain (TermAnalyzers.java:50-136: exact locale → language-only
prefix → default) and uses the SAME chain at ingest and at query parse
(TermTokenizer.java:34-54). This module is that seam for the rebuild:

* an Analyzer couples the VECTORIZED batch tokenizer (build side,
  ``flat``) with its scalar twin (query-parse side, ``scalar``); the two
  must be byte-identical on every input — that is the index's term
  equality contract (see tokenize.py module doc).
* ``get_analyzer`` resolves names with the reference's fallback chop:
  ``"en_GB"`` → ``"en"`` → ``"default"``.
* the analyzer NAME is recorded in the index manifest at build time and
  re-resolved on the query side, so an index can never be queried with a
  different analyzer than it was built with.

Two shipped analyzers:

* ``default`` (= ``ascii``) — the byte-level numpy tokenizer
  (tokenize.tokenize_flat): maximal [a-z0-9]+ runs after ASCII
  lowercasing. The SQL-oracle-expressible engine contract; non-ASCII
  bytes are separators.
* ``unicode`` — Unicode letters/digits/marks after full utf8 lowercasing
  (Arrow ``utf8_lower`` + re2 ``[\\p{L}\\p{N}\\p{M}]+`` splitting): the
  multilingual path (accents, Cyrillic, CJK runs kept whole; combining
  marks — Thai tone/vowel signs, Devanagari matras — stay attached to
  their base letters). Its scalar
  twin IS the vectorized kernel on a 1-row array — parity by
  construction, not by a parallel implementation.

Registering a new locale is ``register_analyzer(Analyzer(...))`` — the
plugin-SPI pattern (plugins.register_plugin) applied to analysis.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .tokenize import STOPWORDS, py_tokenize, tokenize_flat


@dataclass(frozen=True)
class Analyzer:
    name: str
    flat: Callable  # (texts, use_stopwords=False) -> (parents, tokens)
    scalar: Callable  # (text, use_stopwords=False) -> list[str]


_REGISTRY: dict[str, Analyzer] = {}


def register_analyzer(analyzer: Analyzer) -> None:
    _REGISTRY[analyzer.name] = analyzer


def get_analyzer(name: str | None) -> Analyzer:
    """Resolve with the reference's fallback chain
    (TermAnalyzers.findAnalyzer:117-136): exact name, then the language
    prefix before '_' or '-', then the default analyzer."""
    if not name:
        return _REGISTRY["default"]
    key = name.lower()
    if key in _REGISTRY:
        return _REGISTRY[key]
    for sep in ("_", "-"):
        if sep in key and key.split(sep, 1)[0] in _REGISTRY:
            return _REGISTRY[key.split(sep, 1)[0]]
    return _REGISTRY["default"]


def analyzer_names() -> list[str]:
    return sorted(_REGISTRY)


# ------------------------------------------------------------------ unicode


def _unicode_flat(
    texts: pa.Array | pa.ChunkedArray, use_stopwords: bool = False
) -> tuple[np.ndarray, pa.Array]:
    """Unicode tokenizer: utf8 lowercase, tokens = maximal runs of Unicode
    letters/digits/combining-marks (re2 [\\p{L}\\p{N}\\p{M}]+ via
    split-on-complement — marks kept so Thai/Devanagari words survive)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        return np.empty(0, np.int64), pa.array([], type=pa.string())
    lower = pc.utf8_lower(pc.cast(texts, pa.string()))
    lists = pc.split_pattern_regex(
        pc.coalesce(lower, pa.scalar("", pa.string())), pattern="[^\\p{L}\\p{N}\\p{M}]+"
    )
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    counts = np.diff(lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
    parents = np.repeat(np.arange(n, dtype=np.int64), counts)
    keep = pc.not_equal(flat, pa.scalar(""))
    if use_stopwords:
        keep = pc.and_(keep, pc.invert(pc.is_in(flat, value_set=pa.array(sorted(STOPWORDS)))))
    keep_np = keep.to_numpy(zero_copy_only=False)
    return parents[keep_np], flat.filter(keep)


def _unicode_scalar(text: str, use_stopwords: bool = False) -> list[str]:
    """Parity by construction: the scalar side IS the vectorized kernel on
    a one-row array (no second tokenizer implementation to drift)."""
    _, toks = _unicode_flat(pa.array([text or ""], pa.string()), use_stopwords)
    return toks.to_pylist()


register_analyzer(Analyzer("default", tokenize_flat, py_tokenize))
register_analyzer(Analyzer("ascii", tokenize_flat, py_tokenize))
register_analyzer(Analyzer("unicode", _unicode_flat, _unicode_scalar))


# ------------------------------------------------- stemming / locale chains
#
# The reference's analyzer chains are Lucene per-locale analyzers
# (TermAnalyzers.java:50-136; EnglishAnalyzer at ingest,
# WikiMiruIndexService.java:463-470): tokenize → lowercase → per-locale
# stopwords → stem. The ``en`` chain here mirrors that shape with the
# engine's ascii tokenizer + the published Porter2 algorithm (stem.py);
# the non-English locales ship the tokenizer + their own stopword list
# (their Snowball stemmers are a register_analyzer() extension point —
# the seam, like the reference's 31-locale table, is data-driven).


def _en_flat(
    texts: pa.Array | pa.ChunkedArray, use_stopwords: bool = False
) -> tuple[np.ndarray, pa.Array]:
    from .stem import stem_array

    parents, tokens = tokenize_flat(texts, use_stopwords=use_stopwords)
    return parents, stem_array(tokens)


def _en_scalar(text: str, use_stopwords: bool = False) -> list[str]:
    """Parity by construction: the vectorized kernel on a 1-row array."""
    _, toks = _en_flat(pa.array([text or ""], pa.string()), use_stopwords)
    return toks.to_pylist()


register_analyzer(Analyzer("en", _en_flat, _en_scalar))

# Minimal per-locale stopword lists (deterministic contract — the highest-
# frequency function words of each language; the reference's per-locale
# stop sets are the Lucene defaults, same spirit).
LOCALE_STOPWORDS: dict[str, frozenset] = {
    "de": frozenset(
        "der die das und oder aber ein eine einen dem den des ist sind war "
        "nicht mit von zu im in auf für als auch an es sie er wir ihr".split()
    ),
    "fr": frozenset(
        "le la les un une des et ou mais de du au aux est sont était ne pas "
        "avec pour dans sur par ce cette ces il elle nous vous ils que qui".split()
    ),
    "es": frozenset(
        "el la los las un una unos unas y o pero de del al es son era no con "
        "para en sobre por este esta estos estas él ella que quien se su".split()
    ),
    "ru": frozenset(
        "и в во не что он на я с со как а то все она так его но да ты к у же "
        "вы за бы по ее мне было вот от меня еще нет о из ему".split()
    ),
    "pt": frozenset(
        "o a os as um uma uns umas e ou mas de do da dos das no na nos nas ao "
        "é são era não com para em sobre por este esta ele ela que quem se seu".split()
    ),
    "it": frozenset(
        "il lo la i gli le un uno una e o ma di del della dei al alla è sono "
        "era non con per in su da questo questa lui lei che chi si suo".split()
    ),
    "nl": frozenset(
        "de het een en of maar van tot is zijn was niet met voor in op als "
        "ook aan er zij hij wij die dat dit deze door naar bij om te".split()
    ),
    "da": frozenset(
        "og i jeg det at en den til er som på de med han af for ikke der "
        "var mig sig men et har om vi min havde ham hun nu over".split()
    ),
    "sv": frozenset(
        "och det att i en jag hon som han på den med var sig för så till "
        "är men ett om hade de av icke mig du henne då sin nu har".split()
    ),
    "nb": frozenset(
        "og i jeg det at en et den til er som på de med han av ikke der "
        "så var meg seg men har om vi min mitt ha hadde hun nå over".split()
    ),
    "ro": frozenset(
        "și în a la cu de pe un o este sunt era nu că se ce care mai "
        "dar din pentru acest această el ea noi voi ei să fi avea".split()
    ),
    # Remaining reference locales (TermAnalyzers.java:51-81) registered
    # as EXPLICIT unicode+stopword chains — never a silent fallback; the
    # Snowball stemmer for each is the documented open seam (Lucene uses
    # non-Snowball stemmers for several of these).
    "ar": frozenset(
        "في من على إلى عن مع هذا هذه ذلك التي الذي أن إن كان كانت لم لن "
        "ما لا و أو ثم حتى إذا كل بعض هو هي هم نحن أنا أنت".split()
    ),
    "bg": frozenset(
        "и в на с за от по но а че да не се е са бе ще го му си ми ти той "
        "тя то те ние вие как кога къде този тази това".split()
    ),
    "ca": frozenset(
        "el la els les un una uns unes i o però de del al és són era no "
        "amb per a en sobre aquest aquesta ell ella que qui es seu".split()
    ),
    "cs": frozenset(
        "a i v na s z za do od po ale že se je jsou byl byla bylo nebyl "
        "ten ta to tento tato on ona ono my vy oni jak kdy kde co".split()
    ),
    "eu": frozenset(
        "eta edo baina da dira zen ziren ez bat batzuk hau hori hura ni "
        "zu gu zuek haiek nire zure bere gure ere badago dago".split()
    ),
    "fa": frozenset(
        "در از به با که این آن را و یا اما است بود نیست هر چه برای تا "
        "هم او ما شما آنها من تو می بی اگر پس".split()
    ),
    "fi": frozenset(
        "ja tai mutta että jos on ovat oli olivat ei en et emme ette "
        "minä sinä hän me te he se ne tämä tuo joka mikä kun missä".split()
    ),
    "gl": frozenset(
        "o a os as un unha uns unhas e ou pero de do da dos das no na ao "
        "é son era non con para en sobre por este esta el ela que quen se".split()
    ),
    "gr": frozenset(
        "και ή αλλά ο η το οι τα ένας μία ένα είναι ήταν δεν να θα σε "
        "με από για προς αυτός αυτή αυτό εγώ εσύ εμείς που ότι".split()
    ),
    "hi": frozenset(
        "और या लेकिन का की के में से को पर है हैं था थी थे नहीं यह वह ये "
        "वे मैं तुम हम आप एक कुछ क्या जो कि".split()
    ),
    "hy": frozenset(
        "և կամ բայց է են էր էին չի մի այս այն նա ես դու մենք դուք նրանք "
        "որ ինչ երբ որտեղ համար հետ մեջ վրա".split()
    ),
    "id": frozenset(
        "dan atau tetapi yang di ke dari pada untuk dengan adalah ini itu "
        "dia saya kamu kami mereka tidak bukan akan sudah ada bisa".split()
    ),
    "ku": frozenset(
        "و يان بەڵام لە بۆ لەگەڵ ئەم ئەو ئەوە من تۆ ئێمە ئێوە ئەوان کە "
        "چی کەی لەکوێ نەك هەیە نییە دە".split()
    ),
    "lv": frozenset(
        "un vai bet ka ja ir bija nav es tu viņš viņa mēs jūs viņi šis "
        "šī tas tā kas kur kad ar uz no par pēc pie".split()
    ),
    "th": frozenset(
        "และ หรือ แต่ ที่ ใน จาก ไป มา กับ ของ เป็น คือ ไม่ ได้ จะ แล้ว "
        "นี้ นั้น เขา ฉัน เรา คุณ อะไร เมื่อ ไหน ก็ ว่า".split()
    ),
    "tr": frozenset(
        "ve veya ama ki bu şu o bir için ile de da mi mu mü değil var "
        "yok ben sen biz siz onlar ne nerede nasıl çok daha en".split()
    ),
}

# Snowball stemmer per locale (stemmers.py implements the published specs;
# stem.py registers them in _STEMMERS under these language codes)
LOCALE_STEMMER_LANG: dict[str, str] = {
    "de": "de", "ru": "ru", "es": "es", "pt": "pt", "it": "it", "nl": "nl",
    "fr": "fr", "da": "da", "sv": "sv", "nb": "nb", "ro": "ro",
}

# locale aliases resolved to a registered chain (the reference's nb/nn/no
# all map to the Lucene NorwegianAnalyzer; en_ie/pt_br chop to en/pt via
# get_analyzer's fallback already)
LOCALE_ALIASES: dict[str, str] = {"no": "nb", "nn": "nb"}


def _make_locale_analyzer(name: str, stops: frozenset, stem_lang: str | None = None) -> Analyzer:
    stop_arr = pa.array(sorted(stops))

    def flat(texts, use_stopwords: bool = False):
        parents, tokens = _unicode_flat(texts, use_stopwords=False)
        if use_stopwords:
            keep = pc.invert(pc.is_in(tokens, value_set=stop_arr))
            keep_np = keep.to_numpy(zero_copy_only=False)
            parents, tokens = parents[keep_np], tokens.filter(keep)
        if stem_lang is not None:
            from .stem import stem_array

            tokens = stem_array(tokens, lang=stem_lang)
        return parents, tokens

    def scalar(text: str, use_stopwords: bool = False) -> list[str]:
        _, toks = flat(pa.array([text or ""], pa.string()), use_stopwords)
        return toks.to_pylist()

    return Analyzer(name, flat, scalar)


# de/ru/es/pt/it/nl/fr all carry the full chain (unicode tokenize →
# locale stopwords → that language's Snowball stemmer).
for _loc, _stops in LOCALE_STOPWORDS.items():
    register_analyzer(
        _make_locale_analyzer(_loc, _stops, stem_lang=LOCALE_STEMMER_LANG.get(_loc))
    )
for _alias, _target in LOCALE_ALIASES.items():
    _t = _REGISTRY[_target]
    register_analyzer(Analyzer(_alias, _t.flat, _t.scalar))


def tokenizer_meta(analyzer: str, use_stopwords: bool) -> dict:
    """The manifest ``tokenizer`` block. The analyzer name recorded is the
    RESOLVED one (get_analyzer().name), never the raw request — a typo or
    unregistered locale falls back to default at build time, and recording
    the raw string would let a later process that registers that locale
    resolve it differently at query parse (silent term mismatch). The
    pattern/lowercase fields describe the resolved analyzer's actual term
    rule, not a hardcoded ASCII contract."""
    resolved = get_analyzer(analyzer)
    if resolved.name == "unicode" or (
        LOCALE_ALIASES.get(resolved.name, resolved.name) in LOCALE_STOPWORDS
    ):
        contract = {"pattern": "[\\p{L}\\p{N}\\p{M}]+", "lowercase": "utf8"}
    else:
        contract = {"pattern": "[a-z0-9]+", "lowercase": True}
    if resolved.name == "en":
        contract["stem"] = "porter2"
    else:
        base = LOCALE_ALIASES.get(resolved.name, resolved.name)
        if LOCALE_STEMMER_LANG.get(base):
            contract["stem"] = f"snowball-{LOCALE_STEMMER_LANG[base]}"
    return dict(contract, stopwords=use_stopwords, analyzer=resolved.name)
