"""DuckDB CTE twins of the ru/nl/es/pt/it/fr/da/sv/nb Snowball stemmers.

Each ``*_ctes(src, tag)`` returns ``(sql, final_cte_name)`` where ``src``
is a CTE with a string column ``t`` and the final CTE has columns
``(t, stem)`` — the same convention as ``__ray_entry__._german_ctes`` /
``_porter2_ctes``. The driver's correctness gate runs these against
`miru_ray.stemmers`' Python walks on corpus vocabulary + probe words;
the suffix TABLES are shared constants (single transcription of the
published spec's ending lists — snowballstem.org), while the evaluation
engine — region math via RE2 regexes, longest-match CASE cascades,
per-entry condition gating, the sequential letter-marking walks as
recursive CTEs — is implemented independently of the Python cursor
walk, the two-implementation pattern of the splitmix64 hash oracles.

Snowball semantics encoded in the SQL shapes:

* longest match = a CASE whose WHENs are sorted by suffix length
  descending (equal-length suffixes are mutually exclusive);
* ``setlimit``-style steps (Russian steps, Romance verb suffixes) gate
  the region test in the WHEN — a too-long candidate falls through to a
  shorter one;
* condition-style steps (standard/residual suffixes, Dutch R1/R2) test
  the region in the THEN — a failed condition fails the whole among
  with NO backtracking;
* sequential preludes (Dutch y/i marking, Italian qu/iu marking) are
  recursive CTE walks that read the MARKED left context and the
  original right context, exactly like the German u/y walk.

DuckDB's ``len``/``substr``/``left`` are character-based (UTF-8 aware),
so the offsets match Python ``len``/slicing on the same strings.
"""

from __future__ import annotations

from .stemmers import (
    _ES_DEACCENT,
    _ES_PRE_A,
    _ES_PRE_B,
    _ES_PRONOUNS,
    _ES_S1_DELETE_R2,
    _ES_S1_IC,
    _ES_S2A,
    _ES_S2B,
    _ES_S2B_GU,
    _ES_S3,
    _IT_PRONOUNS,
    _IT_S1_DELETE_R2,
    _IT_S1_IC,
    _IT_S2,
    _PT_S1_DELETE_R2,
    _PT_S2,
    _PT_S4,
    _RU_ADJECTIVE,
    _RU_DERIVATIONAL,
    _RU_NOUN,
    _RU_PARTICIPLE_1,
    _RU_PARTICIPLE_2,
    _RU_PERF_GERUND_1,
    _RU_PERF_GERUND_2,
    _RU_REFLEXIVE,
    _RU_SUPERLATIVE,
    _RU_VERB_1,
    _RU_VERB_2,
)

# ------------------------------------------------------------ SQL fragments


def _in(chars) -> str:
    """SQL IN-list of single characters."""
    return ", ".join(f"'{c}'" for c in chars)


def _case(rules, var: str = "w", default: str = "w") -> str:
    """Longest-match CASE over ``rules`` = [(suffix, gate, action)].
    ``gate`` (may be None) is ANDed into the WHEN — setlimit semantics;
    ``action`` is the THEN — condition semantics live there. Both may
    use ``{k}`` (suffix length) and ``{b}`` (the base: var minus the
    suffix)."""
    whens = []
    for suf, gate, action in sorted(rules, key=lambda r: -len(r[0])):
        k = len(suf)
        b = f"left({var}, len({var})-{k})"
        cond = f"ends_with({var}, '{suf}')"
        if gate:
            cond += " AND " + gate.format(k=k, b=b)
        whens.append(f"WHEN {cond} THEN {action.format(k=k, b=b)}")
    return "CASE " + "\n       ".join(whens) + f" ELSE {default} END"


def _regions_sql(tag: str, src: str, vowels: str, rv_expr: str) -> str:
    """CTEs computing (w, rv, r1, r2) from ``src``'s column w."""
    r1pat = f"^[^{vowels}]*[{vowels}]+[^{vowels}]"
    return f"""{tag}ra AS (SELECT *,
  {rv_expr} AS rv,
  CASE WHEN regexp_matches(w, '{r1pat}')
       THEN len(regexp_extract(w, '{r1pat}')) ELSE len(w) END AS r1raw
  FROM {src}),
{tag}rr AS (SELECT *, r1raw AS r1,
  r1raw + CASE WHEN regexp_matches(substr(w, r1raw + 1), '{r1pat}')
               THEN len(regexp_extract(substr(w, r1raw + 1), '{r1pat}'))
               ELSE len(w) - r1raw END AS r2
  FROM {tag}ra)"""


def _rv_first_vowel(vowels: str) -> str:
    """Russian RV: the region after the first vowel."""
    pat = f"^[^{vowels}]*[{vowels}]"
    return (
        f"CASE WHEN regexp_matches(w, '{pat}') "
        f"THEN len(regexp_extract(w, '{pat}')) ELSE len(w) END"
    )


def _rv_romance_sql(vowels: str) -> str:
    """Spanish/Portuguese/Italian RV (stemmers._rv_romance, three cases)."""
    p_after_vowel = f"^..[^{vowels}]*[{vowels}]"
    p_after_cons = f"^..[{vowels}]*[^{vowels}]"
    vin = _in(vowels)
    return f"""CASE WHEN len(w) < 2 THEN len(w)
       WHEN substr(w, 2, 1) NOT IN ({vin}) THEN
            CASE WHEN regexp_matches(w, '{p_after_vowel}')
                 THEN len(regexp_extract(w, '{p_after_vowel}')) ELSE len(w) END
       WHEN substr(w, 1, 1) IN ({vin}) AND substr(w, 2, 1) IN ({vin}) THEN
            CASE WHEN regexp_matches(w, '{p_after_cons}')
                 THEN len(regexp_extract(w, '{p_after_cons}')) ELSE len(w) END
       ELSE LEAST(3, len(w)) END"""


# ------------------------------------------------------------------- Russian

_RU_V = "аеиоуыэюя"


def _ru_grouped_rules(group1, group2):
    """setlimit-gated rules; group-1 entries also require а/я directly
    before the suffix, that letter itself inside RV (condition in the
    THEN: its failure fails the whole among)."""
    rules = []
    for s in group1:
        rules.append(
            (s, "len(w)-{k} >= rv",
             "CASE WHEN len(w)-{k}-1 >= rv AND substr(w, len(w)-{k}, 1) IN ('а', 'я') "
             "THEN {b} ELSE w END")
        )
    for s in group2:
        rules.append((s, "len(w)-{k} >= rv", "{b}"))
    return rules


def russian_ctes(src: str, tag: str = "ru") -> tuple[str, str]:
    pg = _case(_ru_grouped_rules(_RU_PERF_GERUND_1, _RU_PERF_GERUND_2))
    refl = _case([(s, "len(w)-{k} >= rv", "{b}") for s in _RU_REFLEXIVE])
    adj = _case([(s, "len(w)-{k} >= rv", "{b}") for s in _RU_ADJECTIVE])
    part = _case(_ru_grouped_rules(_RU_PARTICIPLE_1, _RU_PARTICIPLE_2))
    verb = _case(_ru_grouped_rules(_RU_VERB_1, _RU_VERB_2))
    noun = _case([(s, "len(w)-{k} >= rv", "{b}") for s in _RU_NOUN])
    deriv = _case(
        [(s, "len(w)-{k} >= rv",
          "CASE WHEN len(w)-{k} >= r2 THEN {b} ELSE w END")
         for s in _RU_DERIVATIONAL]
    )
    tidy = _case(
        [(s, "len(w)-{k} >= rv",
          "CASE WHEN ends_with({b}, 'нн') AND len({b})-1 >= rv "
          "THEN left({b}, len({b})-1) ELSE {b} END")
         for s in _RU_SUPERLATIVE]
        + [("н", "len(w)-1 >= rv",
            "CASE WHEN ends_with(w, 'нн') AND len(w)-2 >= rv "
            "THEN left(w, len(w)-1) ELSE w END"),
           ("ь", "len(w)-1 >= rv", "{b}")]
    )
    sql = f"""{tag}p AS (SELECT t, replace(t, 'ё', 'е') AS w FROM {src}),
{_regions_sql(tag, f"{tag}p", _RU_V, _rv_first_vowel(_RU_V))},
{tag}1a AS (SELECT t, rv, r2, w AS pw, {pg} AS w FROM {tag}rr),
{tag}1b AS (SELECT t, rv, r2, (w <> pw) AS pg,
  CASE WHEN w <> pw THEN w ELSE {refl} END AS w FROM {tag}1a),
{tag}1c AS (SELECT t, rv, r2, pg, w AS pw,
  CASE WHEN NOT pg THEN {adj} ELSE w END AS w FROM {tag}1b),
{tag}1d AS (SELECT t, rv, r2, pg, (NOT pg AND w <> pw) AS adj,
  CASE WHEN NOT pg AND w <> pw THEN {part} ELSE w END AS w FROM {tag}1c),
{tag}1e AS (SELECT t, rv, r2, pg, adj, w AS pw,
  CASE WHEN NOT pg AND NOT adj THEN {verb} ELSE w END AS w FROM {tag}1d),
{tag}1f AS (SELECT t, rv, r2,
  CASE WHEN NOT pg AND NOT adj AND w = pw THEN {noun} ELSE w END AS w
  FROM {tag}1e),
{tag}2 AS (SELECT t, rv, r2,
  CASE WHEN ends_with(w, 'и') AND len(w)-1 >= rv THEN left(w, len(w)-1)
       ELSE w END AS w FROM {tag}1f),
{tag}3 AS (SELECT t, rv, {deriv} AS w FROM {tag}2),
{tag}f AS (SELECT t, {tidy} AS stem FROM {tag}3)"""
    return sql, f"{tag}f"


# --------------------------------------------------------------------- Dutch

_NL_V = "aeiouyè"


def _nl_undouble(x: str) -> str:
    return (
        f"CASE WHEN regexp_matches({x}, '(kk|dd|tt)$') "
        f"THEN left({x}, len({x})-1) ELSE {x} END"
    )


def _nl_en_ok(var: str, k: int) -> str:
    """Valid en-ending on var's k-char suffix: in R1, preceded by a
    non-vowel, and the base not ending gem."""
    return (
        f"len({var})-{k} >= r1 AND substr({var}, len({var})-{k}, 1) NOT IN ({_in(_NL_V)}) "
        f"AND NOT ends_with(left({var}, len({var})-{k}), 'gem')"
    )


def dutch_ctes(src: str, tag: str = "nl") -> tuple[str, str]:
    acc = "w0"
    for a, b in (("ä", "a"), ("ë", "e"), ("ï", "i"), ("ö", "o"), ("ü", "u"),
                 ("á", "a"), ("é", "e"), ("í", "i"), ("ó", "o"), ("ú", "u")):
        acc = f"replace({acc}, '{a}', '{b}')"
    vin = _in(_NL_V)
    step1 = _case([
        ("heden", None,
         "CASE WHEN len(w)-5 >= r1 THEN {b} || 'heid' ELSE w END"),
        ("ene", None,
         f"CASE WHEN {_nl_en_ok('w', 3)} THEN {_nl_undouble('{b}')} ELSE w END"),
        ("en", None,
         f"CASE WHEN {_nl_en_ok('w', 2)} THEN {_nl_undouble('{b}')} ELSE w END"),
        ("se", None,
         f"CASE WHEN len(w)-2 >= r1 AND substr(w, len(w)-2, 1) NOT IN ({vin}, 'j') "
         "THEN {b} ELSE w END"),
        ("s", None,
         f"CASE WHEN len(w)-1 >= r1 AND substr(w, len(w)-1, 1) NOT IN ({vin}, 'j') "
         "THEN {b} ELSE w END"),
    ])
    step2 = (
        f"CASE WHEN ends_with(w, 'e') AND len(w)-1 >= r1 AND len(w) >= 2 "
        f"AND substr(w, len(w)-1, 1) NOT IN ({vin}) "
        f"THEN {_nl_undouble('left(w, len(w)-1)')} ELSE w END"
    )
    lijk_rep2 = (
        f"CASE WHEN ends_with({{b}}, 'e') AND len({{b}})-1 >= r1 AND len({{b}}) >= 2 "
        f"AND substr({{b}}, len({{b}})-1, 1) NOT IN ({vin}) "
        f"THEN {_nl_undouble('left({b}, len({b})-1)')} ELSE {{b}} END"
    )
    ending_ig = (
        "CASE WHEN ends_with({b}, 'ig') AND len({b})-2 >= r2 "
        "AND NOT ends_with({b}, 'eig') THEN left({b}, len({b})-2) "
        f"ELSE {_nl_undouble('{b}')} END"
    )
    step3b = _case([
        ("end", None, f"CASE WHEN len(w)-3 >= r2 THEN {ending_ig} ELSE w END"),
        ("ing", None, f"CASE WHEN len(w)-3 >= r2 THEN {ending_ig} ELSE w END"),
        ("ig", None,
         "CASE WHEN len(w)-2 >= r2 AND NOT ends_with(w, 'eig') THEN {b} ELSE w END"),
        ("lijk", None, f"CASE WHEN len(w)-4 >= r2 THEN {lijk_rep2} ELSE w END"),
        ("baar", None, "CASE WHEN len(w)-4 >= r2 THEN {b} ELSE w END"),
        ("bar", None, "CASE WHEN len(w)-3 >= r2 AND e1 THEN {b} ELSE w END"),
    ])
    sql = f"""{tag}a AS (SELECT t, {acc.replace('w0', 't')} AS w0 FROM {src}),
{tag}mk AS (
  -- sequential y/i marking: the left-context test reads the MARKED
  -- accumulator (an I/Y is no longer a vowel), the right-context test
  -- reads the original word — the Snowball cursor walk
  WITH RECURSIVE walk(t, w0, i, acc) AS (
    SELECT t, w0, 1, '' FROM {tag}a
    UNION ALL
    SELECT t, w0, i + 1,
           acc || CASE
             WHEN substr(w0, i, 1) = 'y'
                  AND (i = 1 OR right(acc, 1) IN ({vin})) THEN 'Y'
             WHEN substr(w0, i, 1) = 'i' AND i > 1 AND i < len(w0)
                  AND right(acc, 1) IN ({vin})
                  AND substr(w0, i + 1, 1) IN ({vin}) THEN 'I'
             ELSE substr(w0, i, 1) END
    FROM walk WHERE i <= len(w0)
  )
  SELECT t, acc AS w FROM walk WHERE i = len(w0) + 1
     UNION ALL SELECT t, w0 FROM {tag}a WHERE len(w0) = 0),
{tag}ra0 AS (SELECT t, w,
  CASE WHEN regexp_matches(w, '^[^{_NL_V}]*[{_NL_V}]+[^{_NL_V}]')
       THEN len(regexp_extract(w, '^[^{_NL_V}]*[{_NL_V}]+[^{_NL_V}]'))
       ELSE len(w) END AS r1raw
  FROM {tag}mk),
{tag}rr AS (SELECT t, w, GREATEST(r1raw, 3) AS r1,
  r1raw + CASE WHEN regexp_matches(substr(w, r1raw + 1), '^[^{_NL_V}]*[{_NL_V}]+[^{_NL_V}]')
               THEN len(regexp_extract(substr(w, r1raw + 1), '^[^{_NL_V}]*[{_NL_V}]+[^{_NL_V}]'))
               ELSE len(w) - r1raw END AS r2
  FROM {tag}ra0),
{tag}1 AS (SELECT t, r1, r2, {step1} AS w FROM {tag}rr),
{tag}2 AS (SELECT t, r1, r2, w AS pw, {step2} AS w FROM {tag}1),
{tag}2f AS (SELECT t, r1, r2, (w <> pw) AS e1, w FROM {tag}2),
{tag}3a0 AS (SELECT t, r1, r2, e1, w AS pw,
  CASE WHEN ends_with(w, 'heid') AND len(w)-4 >= r2
            AND NOT ends_with(left(w, len(w)-4), 'c')
       THEN left(w, len(w)-4) ELSE w END AS w FROM {tag}2f),
{tag}3a AS (SELECT t, r1, r2, e1,
  CASE WHEN w <> pw AND ends_with(w, 'en') AND {_nl_en_ok('w', 2)}
       THEN {_nl_undouble('left(w, len(w)-2)')} ELSE w END AS w FROM {tag}3a0),
{tag}3b AS (SELECT t, {step3b} AS w FROM {tag}3a),
{tag}f AS (SELECT t,
  replace(replace(CASE WHEN len(w) >= 4
       AND substr(w, len(w)-3, 1) NOT IN ({vin})
       AND substr(w, len(w), 1) NOT IN ({vin})
       AND substr(w, len(w), 1) <> 'I'
       AND substr(w, len(w)-2, 1) = substr(w, len(w)-1, 1)
       AND substr(w, len(w)-2, 1) IN ('a', 'e', 'o', 'u')
  THEN left(w, len(w)-2) || right(w, 1) ELSE w END, 'I', 'i'), 'Y', 'y') AS stem
  FROM {tag}3b)"""
    return sql, f"{tag}f"


# ------------------------------------------------------------------- Spanish

_ES_V = "aeiouáéíóúü"


def _pron_pk(prons) -> str:
    """CASE → length of the longest matching pronoun, else 0."""
    whens = [
        f"WHEN ends_with(w, '{p}') THEN {len(p)}"
        for p in sorted(prons, key=lambda p: -len(p))
    ]
    return "CASE " + " ".join(whens) + " ELSE 0 END"


def _post_replace(expr: str, pairs) -> str:
    for a, b in pairs:
        expr = f"replace({expr}, '{a}', '{b}')"
    return expr


def spanish_ctes(src: str, tag: str = "es") -> tuple[str, str]:
    b = "left(w, len(w) - pk)"  # word minus the attached pronoun
    pre_rules = []
    for s in _ES_PRE_A:
        pre_rules.append(
            (s, None,
             "CASE WHEN len({b})-%d >= rv THEN left({b}, len({b})-%d) || '%s' "
             "ELSE w END" % (len(s), len(s), _ES_DEACCENT[s]))
        )
    for s in _ES_PRE_B:
        pre_rules.append(
            (s, None, "CASE WHEN len({b})-%d >= rv THEN {b} ELSE w END" % len(s))
        )
    pre_rules.append(
        ("yendo", None,
         "CASE WHEN len({b})-5 >= rv AND ends_with(left({b}, len({b})-5), 'u') "
         "THEN {b} ELSE w END")
    )
    # the {b} placeholders here refer to the PRONOUN base, not the suffix
    # base — substitute manually
    inner = _case(
        [(s, g, a.replace("{b}", b)) for s, g, a in pre_rules], var=b, default="w"
    )

    s1_rules = []
    for s in _ES_S1_DELETE_R2:
        s1_rules.append((s, None, "CASE WHEN len(w)-{k} >= r2 THEN {b} ELSE w END"))
    for s in _ES_S1_IC:
        s1_rules.append(
            (s, None,
             "CASE WHEN len(w)-{k} >= r2 THEN "
             "CASE WHEN ends_with({b}, 'ic') AND len({b})-2 >= r2 "
             "THEN left({b}, len({b})-2) ELSE {b} END ELSE w END")
        )
    for s, rep in (("logía", "log"), ("logías", "log"), ("ución", "u"),
                   ("uciones", "u"), ("encia", "ente"), ("encias", "ente")):
        s1_rules.append(
            (s, None,
             "CASE WHEN len(w)-{k} >= r2 THEN {b} || '%s' ELSE w END" % rep)
        )
    amente_tail = (
        "CASE WHEN ends_with({b}, 'iv') AND len({b})-2 >= r2 THEN "
        "  CASE WHEN ends_with(left({b}, len({b})-2), 'at') AND len({b})-4 >= r2 "
        "  THEN left({b}, len({b})-4) ELSE left({b}, len({b})-2) END "
        "WHEN ends_with({b}, 'os') AND len({b})-2 >= r2 THEN left({b}, len({b})-2) "
        "WHEN ends_with({b}, 'ic') AND len({b})-2 >= r2 THEN left({b}, len({b})-2) "
        "WHEN ends_with({b}, 'ad') AND len({b})-2 >= r2 THEN left({b}, len({b})-2) "
        "ELSE {b} END"
    )
    s1_rules.append(
        ("amente", None,
         f"CASE WHEN len(w)-6 >= r1 THEN {amente_tail} ELSE w END")
    )

    def _pre_strip(pres, region="r2"):
        whens = " ".join(
            "WHEN ends_with({b}, '%s') AND len({b})-%d >= %s "
            "THEN left({b}, len({b})-%d)" % (p, len(p), region, len(p))
            for p in pres
        )
        return "CASE " + whens + " ELSE {b} END"

    s1_rules.append(
        ("mente", None,
         "CASE WHEN len(w)-5 >= r2 THEN %s ELSE w END"
         % _pre_strip(("ante", "able", "ible")))
    )
    for s in ("idad", "idades"):
        s1_rules.append(
            (s, None,
             "CASE WHEN len(w)-{k} >= r2 THEN %s ELSE w END"
             % _pre_strip(("abil", "ic", "iv")))
        )
    for s in ("iva", "ivo", "ivas", "ivos"):
        s1_rules.append(
            (s, None,
             "CASE WHEN len(w)-{k} >= r2 THEN "
             "CASE WHEN ends_with({b}, 'at') AND len({b})-2 >= r2 "
             "THEN left({b}, len({b})-2) ELSE {b} END ELSE w END")
        )
    step1 = _case(s1_rules)

    step2a = _case(
        [(s, "len(w)-{k} >= rv",
          "CASE WHEN ends_with({b}, 'u') THEN {b} ELSE w END")
         for s in _ES_S2A]
    )
    s2b_rules = [
        (s, "len(w)-{k} >= rv",
         "CASE WHEN ends_with({b}, 'gu') THEN left({b}, len({b})-1) ELSE {b} END")
        for s in _ES_S2B_GU
    ] + [(s, "len(w)-{k} >= rv", "{b}") for s in _ES_S2B]
    step2b = _case(s2b_rules)

    s3_rules = [
        (s, None, "CASE WHEN len(w)-{k} >= rv THEN {b} ELSE w END")
        for s in _ES_S3
    ] + [
        (s, None,
         "CASE WHEN len(w)-1 >= rv THEN "
         "CASE WHEN ends_with({b}, 'gu') AND len({b})-1 >= rv "
         "THEN left({b}, len({b})-1) ELSE {b} END ELSE w END")
        for s in ("e", "é")
    ]
    step3 = _case(s3_rules)

    post = _post_replace(
        "w", (("á", "a"), ("é", "e"), ("í", "i"), ("ó", "o"), ("ú", "u"))
    )
    sql = f"""{tag}p AS (SELECT t, t AS w FROM {src}),
{_regions_sql(tag, f"{tag}p", _ES_V, _rv_romance_sql(_ES_V))},
{tag}00 AS (SELECT t, rv, r1, r2, w, {_pron_pk(_ES_PRONOUNS)} AS pk FROM {tag}rr),
{tag}0 AS (SELECT t, rv, r1, r2,
  CASE WHEN pk = 0 THEN w ELSE {inner} END AS w FROM {tag}00),
{tag}1 AS (SELECT t, rv, r1, r2, w AS pw, {step1} AS w FROM {tag}0),
{tag}2a AS (SELECT t, rv, r2, (w <> pw) AS did1, w AS pw,
  CASE WHEN w = pw THEN {step2a} ELSE w END AS w FROM {tag}1),
{tag}2b AS (SELECT t, rv,
  CASE WHEN NOT did1 AND w = pw THEN {step2b} ELSE w END AS w FROM {tag}2a),
{tag}3 AS (SELECT t, {step3} AS w FROM {tag}2b),
{tag}f AS (SELECT t, {post} AS stem FROM {tag}3)"""
    return sql, f"{tag}f"


# ---------------------------------------------------------------- Portuguese

_PT_V = "aeiouáéíóúâêô"


def portuguese_ctes(src: str, tag: str = "pt") -> tuple[str, str]:
    s1_rules = []
    for s in _PT_S1_DELETE_R2:
        s1_rules.append((s, None, "CASE WHEN len(w)-{k} >= r2 THEN {b} ELSE w END"))
    for s, rep in (("logia", "log"), ("logias", "log"), ("uça~o", "u"),
                   ("uço~es", "u"), ("ência", "ente"), ("ências", "ente")):
        s1_rules.append(
            (s, None,
             "CASE WHEN len(w)-{k} >= r2 THEN {b} || '%s' ELSE w END" % rep)
        )
    amente_tail = (
        "CASE WHEN ends_with({b}, 'iv') AND len({b})-2 >= r2 THEN "
        "  CASE WHEN ends_with(left({b}, len({b})-2), 'at') AND len({b})-4 >= r2 "
        "  THEN left({b}, len({b})-4) ELSE left({b}, len({b})-2) END "
        "WHEN ends_with({b}, 'os') AND len({b})-2 >= r2 THEN left({b}, len({b})-2) "
        "WHEN ends_with({b}, 'ic') AND len({b})-2 >= r2 THEN left({b}, len({b})-2) "
        "WHEN ends_with({b}, 'ad') AND len({b})-2 >= r2 THEN left({b}, len({b})-2) "
        "ELSE {b} END"
    )
    s1_rules.append(
        ("amente", None,
         f"CASE WHEN len(w)-6 >= r1 THEN {amente_tail} ELSE w END")
    )

    def _pre_strip(pres):
        whens = " ".join(
            "WHEN ends_with({b}, '%s') AND len({b})-%d >= r2 "
            "THEN left({b}, len({b})-%d)" % (p, len(p), len(p))
            for p in pres
        )
        return "CASE " + whens + " ELSE {b} END"

    s1_rules.append(
        ("mente", None,
         "CASE WHEN len(w)-5 >= r2 THEN %s ELSE w END"
         % _pre_strip(("ante", "avel", "ível")))
    )
    for s in ("idade", "idades"):
        s1_rules.append(
            (s, None,
             "CASE WHEN len(w)-{k} >= r2 THEN %s ELSE w END"
             % _pre_strip(("abil", "ic", "iv")))
        )
    for s in ("iva", "ivo", "ivas", "ivos"):
        s1_rules.append(
            (s, None,
             "CASE WHEN len(w)-{k} >= r2 THEN "
             "CASE WHEN ends_with({b}, 'at') AND len({b})-2 >= r2 "
             "THEN left({b}, len({b})-2) ELSE {b} END ELSE w END")
        )
    for s in ("ira", "iras"):
        s1_rules.append(
            (s, None,
             "CASE WHEN len(w)-{k} >= rv AND ends_with({b}, 'e') "
             "THEN {b} || 'ir' ELSE w END")
        )
    step1 = _case(s1_rules)
    step2 = _case([(s, "len(w)-{k} >= rv", "{b}") for s in _PT_S2])
    step4 = _case(
        [(s, None, "CASE WHEN len(w)-{k} >= rv THEN {b} ELSE w END")
         for s in _PT_S4]
    )
    step5 = _case(
        [(s, None,
          "CASE WHEN len(w)-1 >= rv THEN "
          "CASE WHEN (ends_with({b}, 'gu') OR ends_with({b}, 'ci')) "
          "AND len({b})-1 >= rv THEN left({b}, len({b})-1) ELSE {b} END "
          "ELSE w END")
         for s in ("e", "é", "ê")]
        + [("ç", None, "{b} || 'c'")]
    )
    sql = f"""{tag}p AS (SELECT t, replace(replace(t, 'ã', 'a~'), 'õ', 'o~') AS w FROM {src}),
{_regions_sql(tag, f"{tag}p", _PT_V, _rv_romance_sql(_PT_V))},
{tag}1 AS (SELECT t, rv, r1, r2, w AS pw, {step1} AS w FROM {tag}rr),
{tag}2 AS (SELECT t, rv, (w <> pw) AS alt1, w AS pw,
  CASE WHEN w = pw THEN {step2} ELSE w END AS w FROM {tag}1),
{tag}34 AS (SELECT t, rv,
  CASE WHEN (alt1 OR w <> pw) THEN
    CASE WHEN ends_with(w, 'i') AND len(w)-1 >= rv
              AND ends_with(left(w, len(w)-1), 'c')
         THEN left(w, len(w)-1) ELSE w END
  ELSE {step4} END AS w FROM {tag}2),
{tag}5 AS (SELECT t, {step5} AS w FROM {tag}34),
{tag}f AS (SELECT t, replace(replace(w, 'a~', 'ã'), 'o~', 'õ') AS stem
  FROM {tag}5)"""
    return sql, f"{tag}f"


# ------------------------------------------------------------------- Italian

_IT_V = "aeiouàèìòù"


def italian_ctes(src: str, tag: str = "it") -> tuple[str, str]:
    acc = "t"
    for a, bb in (("á", "à"), ("é", "è"), ("í", "ì"), ("ó", "ò"), ("ú", "ù")):
        acc = f"replace({acc}, '{a}', '{bb}')"
    vin = _in(_IT_V)

    b = "left(w, len(w) - pk)"
    pre_rules = [
        (s, None, "CASE WHEN len({b})-%d >= rv THEN {b} ELSE w END" % len(s))
        for s in ("ando", "endo")
    ] + [
        (s, None,
         "CASE WHEN len({b})-%d >= rv THEN {b} || 'e' ELSE w END" % len(s))
        for s in ("ar", "er", "ir")
    ]
    inner = _case(
        [(s, g, a.replace("{b}", b)) for s, g, a in pre_rules], var=b, default="w"
    )

    s1_rules = []
    for s in _IT_S1_DELETE_R2:
        s1_rules.append((s, None, "CASE WHEN len(w)-{k} >= r2 THEN {b} ELSE w END"))
    for s in _IT_S1_IC:
        s1_rules.append(
            (s, None,
             "CASE WHEN len(w)-{k} >= r2 THEN "
             "CASE WHEN ends_with({b}, 'ic') AND len({b})-2 >= r2 "
             "THEN left({b}, len({b})-2) ELSE {b} END ELSE w END")
        )
    for s, rep in (("logia", "log"), ("logie", "log"), ("uzione", "u"),
                   ("uzioni", "u"), ("usione", "u"), ("usioni", "u"),
                   ("enza", "ente"), ("enze", "ente")):
        s1_rules.append(
            (s, None,
             "CASE WHEN len(w)-{k} >= r2 THEN {b} || '%s' ELSE w END" % rep)
        )
    for s in ("amento", "amenti", "imento", "imenti"):
        s1_rules.append((s, None, "CASE WHEN len(w)-{k} >= rv THEN {b} ELSE w END"))
    amente_tail = (
        "CASE WHEN ends_with({b}, 'iv') AND len({b})-2 >= r2 THEN "
        "  CASE WHEN ends_with(left({b}, len({b})-2), 'at') AND len({b})-4 >= r2 "
        "  THEN left({b}, len({b})-4) ELSE left({b}, len({b})-2) END "
        "WHEN ends_with({b}, 'os') AND len({b})-2 >= r2 THEN left({b}, len({b})-2) "
        "WHEN ends_with({b}, 'ic') AND len({b})-2 >= r2 THEN left({b}, len({b})-2) "
        "WHEN ends_with({b}, 'abil') AND len({b})-4 >= r2 THEN left({b}, len({b})-4) "
        "ELSE {b} END"
    )
    s1_rules.append(
        ("amente", None,
         f"CASE WHEN len(w)-6 >= r1 THEN {amente_tail} ELSE w END")
    )

    def _pre_strip(pres):
        whens = " ".join(
            "WHEN ends_with({b}, '%s') AND len({b})-%d >= r2 "
            "THEN left({b}, len({b})-%d)" % (p, len(p), len(p))
            for p in pres
        )
        return "CASE " + whens + " ELSE {b} END"

    s1_rules.append(
        ("ità", None,
         "CASE WHEN len(w)-3 >= r2 THEN %s ELSE w END"
         % _pre_strip(("abil", "ic", "iv")))
    )
    for s in ("ivo", "ivi", "iva", "ive"):
        s1_rules.append(
            (s, None,
             "CASE WHEN len(w)-{k} >= r2 THEN "
             "CASE WHEN ends_with({b}, 'at') AND len({b})-2 >= r2 THEN "
             "  CASE WHEN ends_with(left({b}, len({b})-2), 'ic') AND len({b})-4 >= r2 "
             "  THEN left({b}, len({b})-4) ELSE left({b}, len({b})-2) END "
             "ELSE {b} END ELSE w END")
        )
    step1 = _case(s1_rules)
    step2 = _case([(s, "len(w)-{k} >= rv", "{b}") for s in _IT_S2])

    sql = f"""{tag}a AS (SELECT t, {acc} AS w0 FROM {src}),
{tag}mk AS (
  -- sequential marking: u after q → U; i/u between vowels → I/U (left
  -- context reads the MARKED accumulator, right context the original)
  WITH RECURSIVE walk(t, w0, i, acc) AS (
    SELECT t, w0, 1, '' FROM {tag}a
    UNION ALL
    SELECT t, w0, i + 1,
           acc || CASE
             WHEN substr(w0, i, 1) = 'u' AND i > 1
                  AND substr(w0, i - 1, 1) = 'q' THEN 'U'
             WHEN substr(w0, i, 1) IN ('i', 'u') AND i > 1 AND i < len(w0)
                  AND right(acc, 1) IN ({vin})
                  AND substr(w0, i + 1, 1) IN ({vin})
             THEN upper(substr(w0, i, 1))
             ELSE substr(w0, i, 1) END
    FROM walk WHERE i <= len(w0)
  )
  SELECT t, acc AS w FROM walk WHERE i = len(w0) + 1
     UNION ALL SELECT t, w0 FROM {tag}a WHERE len(w0) = 0),
{_regions_sql(tag, f"{tag}mk", _IT_V, _rv_romance_sql(_IT_V))},
{tag}00 AS (SELECT t, rv, r1, r2, w, {_pron_pk(_IT_PRONOUNS)} AS pk FROM {tag}rr),
{tag}0 AS (SELECT t, rv, r1, r2,
  CASE WHEN pk = 0 THEN w ELSE {inner} END AS w FROM {tag}00),
{tag}1 AS (SELECT t, rv, r1, r2, w AS pw, {step1} AS w FROM {tag}0),
{tag}2 AS (SELECT t, rv,
  CASE WHEN w = pw THEN {step2} ELSE w END AS w FROM {tag}1),
{tag}3a0 AS (SELECT t, rv, w AS pw,
  CASE WHEN substr(w, len(w), 1) IN ('a','e','i','o','à','è','ì','ò')
            AND len(w)-1 >= rv THEN left(w, len(w)-1) ELSE w END AS w
  FROM {tag}2),
{tag}3a AS (SELECT t, rv,
  CASE WHEN w <> pw AND ends_with(w, 'i') AND len(w)-1 >= rv
       THEN left(w, len(w)-1) ELSE w END AS w FROM {tag}3a0),
{tag}f AS (SELECT t, replace(replace(
  CASE WHEN (ends_with(w, 'ch') OR ends_with(w, 'gh')) AND len(w)-2 >= rv
       THEN left(w, len(w)-1) ELSE w END, 'I', 'i'), 'U', 'u') AS stem
  FROM {tag}3a)"""
    return sql, f"{tag}f"


CTE_BUILDERS = {
    "ru": russian_ctes,
    "nl": dutch_ctes,
    "es": spanish_ctes,
    "pt": portuguese_ctes,
    "it": italian_ctes,
}


# -------------------------------------------------------------------- French

_FR_V = "aeiouyâàëéêèïîôûù"


def french_ctes(src: str, tag: str = "fr") -> tuple[str, str]:
    from .stemmers import (
        _FR_S1_ATEUR,
        _FR_S1_DELETE_R2,
        _FR_S2A,
        _FR_S2B_DELETE,
        _FR_S2B_E,
    )

    vin = _in(_FR_V)

    # ---- step 1 rules (condition semantics; flags computed from w <> pw)
    ic_or_iqU = (
        "CASE WHEN ends_with({x}, 'ic') THEN "
        "CASE WHEN len({x})-2 >= r2 THEN left({x}, len({x})-2) "
        "ELSE left({x}, len({x})-2) || 'iqU' END ELSE {x} END"
    )
    s1_rules = []
    for s in _FR_S1_DELETE_R2:
        s1_rules.append((s, None, "CASE WHEN len(w)-{k} >= r2 THEN {b} ELSE w END"))
    for s in _FR_S1_ATEUR:
        s1_rules.append(
            (s, None,
             "CASE WHEN len(w)-{k} >= r2 THEN "
             + ic_or_iqU.replace("{x}", "{b}")
             + " ELSE w END")
        )
    for s, rep in (("logie", "log"), ("logies", "log"), ("usion", "u"),
                   ("ution", "u"), ("usions", "u"), ("utions", "u"),
                   ("ence", "ent"), ("ences", "ent")):
        s1_rules.append(
            (s, None,
             "CASE WHEN len(w)-{k} >= r2 THEN {b} || '%s' ELSE w END" % rep)
        )
    ement_tail = (
        "CASE WHEN ends_with({b}, 'iv') AND len({b})-2 >= r2 THEN "
        "  CASE WHEN ends_with(left({b}, len({b})-2), 'at') AND len({b})-4 >= r2 "
        "  THEN left({b}, len({b})-4) ELSE left({b}, len({b})-2) END "
        "WHEN ends_with({b}, 'eus') THEN "
        "  CASE WHEN len({b})-3 >= r2 THEN left({b}, len({b})-3) "
        "       WHEN len({b})-3 >= r1 THEN left({b}, len({b})-3) || 'eux' "
        "       ELSE {b} END "
        "WHEN (ends_with({b}, 'abl') OR ends_with({b}, 'iqU')) AND len({b})-3 >= r2 "
        "  THEN left({b}, len({b})-3) "
        "WHEN (ends_with({b}, 'ièr') OR ends_with({b}, 'Ièr')) AND len({b})-3 >= rv "
        "  THEN left({b}, len({b})-3) || 'i' "
        "ELSE {b} END"
    )
    for s in ("ement", "ements"):
        s1_rules.append(
            (s, None,
             f"CASE WHEN len(w)-{{k}} >= rv THEN {ement_tail} ELSE w END")
        )
    ite_tail = (
        "CASE WHEN ends_with({b}, 'abil') THEN "
        "  CASE WHEN len({b})-4 >= r2 THEN left({b}, len({b})-4) "
        "  ELSE left({b}, len({b})-4) || 'abl' END "
        "WHEN ends_with({b}, 'ic') THEN "
        "  CASE WHEN len({b})-2 >= r2 THEN left({b}, len({b})-2) "
        "  ELSE left({b}, len({b})-2) || 'iqU' END "
        "WHEN ends_with({b}, 'iv') AND len({b})-2 >= r2 THEN left({b}, len({b})-2) "
        "ELSE {b} END"
    )
    for s in ("ité", "ités"):
        s1_rules.append(
            (s, None,
             f"CASE WHEN len(w)-{{k}} >= r2 THEN {ite_tail} ELSE w END")
        )
    if_tail = (
        "CASE WHEN ends_with({b}, 'at') AND len({b})-2 >= r2 THEN "
        + ic_or_iqU.replace("{x}", "left({b}, len({b})-2)")
        + " ELSE {b} END"
    )
    for s in ("if", "ive", "ifs", "ives"):
        s1_rules.append(
            (s, None,
             f"CASE WHEN len(w)-{{k}} >= r2 THEN {if_tail} ELSE w END")
        )
    s1_rules.append(("eaux", None, "{b} || 'eau'"))
    s1_rules.append(
        ("aux", None, "CASE WHEN len(w)-3 >= r1 THEN {b} || 'al' ELSE w END")
    )
    for s in ("euse", "euses"):
        s1_rules.append(
            (s, None,
             "CASE WHEN len(w)-{k} >= r2 THEN {b} "
             "WHEN len(w)-{k} >= r1 THEN {b} || 'eux' ELSE w END")
        )
    for s in ("issement", "issements"):
        s1_rules.append(
            (s, None,
             f"CASE WHEN len(w)-{{k}} >= r1 AND len({{b}}) > 0 "
             f"AND right({{b}}, 1) NOT IN ({vin}) THEN {{b}} ELSE w END")
        )
    s1_rules.append(
        ("amment", None,
         "CASE WHEN len(w)-6 >= rv THEN {b} || 'ant' ELSE w END")
    )
    s1_rules.append(
        ("emment", None,
         "CASE WHEN len(w)-6 >= rv THEN {b} || 'ent' ELSE w END")
    )
    for s in ("ment", "ments"):
        s1_rules.append(
            (s, None,
             f"CASE WHEN len(w)-{{k}}-1 >= rv AND substr(w, len(w)-{{k}}, 1) IN ({vin}) "
             "THEN {b} ELSE w END")
        )
    step1 = _case(s1_rules)
    # the ment-family gates step 2a even when found-but-not-removed
    fm_whens = " OR ".join(
        f"ends_with(w, '{s}')" for s in ("amment", "emment", "ments", "ment")
    )
    # the longest step-1 match must BE a ment-family suffix (not merely
    # end like one): ement(s)/issement(s) shadow ment(s)
    fm_expr = (
        f"(({fm_whens}) AND NOT ends_with(w, 'ement') AND NOT ends_with(w, 'ements'))"
    )

    step2a = _case(
        [(s, "len(w)-{k} >= rv",
          f"CASE WHEN len(w)-{{k}}-1 >= rv "
          f"AND substr(w, len(w)-{{k}}, 1) NOT IN ({vin}) THEN {{b}} ELSE w END")
         for s in _FR_S2A]
    )
    s2b_rules = [
        ("ions", "len(w)-4 >= rv",
         "CASE WHEN len(w)-4 >= r2 THEN {b} ELSE w END"),
    ] + [
        (s, "len(w)-{k} >= rv", "{b}") for s in _FR_S2B_DELETE
    ] + [
        (s, "len(w)-{k} >= rv",
         "CASE WHEN ends_with({b}, 'e') AND len({b})-1 >= rv "
         "THEN left({b}, len({b})-1) ELSE {b} END")
        for s in _FR_S2B_E
    ]
    step2b = _case(s2b_rules)

    s4_s = (
        f"CASE WHEN ends_with(w, 's') AND len(w) >= 2 AND ("
        f"substr(w, len(w)-1, 1) NOT IN ('a', 'i', 'o', 'u', 'è', 's') "
        f"OR (substr(w, len(w)-1, 1) = 'i' AND len(w) >= 3 "
        f"AND substr(w, len(w)-2, 1) = 'H')) "
        f"THEN left(w, len(w)-1) ELSE w END"
    )
    s4_rules = [
        ("ion", "len(w)-3 >= rv",
         "CASE WHEN len(w)-3 >= r2 AND len(w)-4 >= rv AND len(w) >= 4 "
         "AND substr(w, len(w)-3, 1) IN ('s', 't') THEN {b} ELSE w END"),
        ("ière", "len(w)-4 >= rv", "{b} || 'i'"),
        ("Ière", "len(w)-4 >= rv", "{b} || 'i'"),
        ("ier", "len(w)-3 >= rv", "{b} || 'i'"),
        ("Ier", "len(w)-3 >= rv", "{b} || 'i'"),
        ("e", "len(w)-1 >= rv", "{b}"),
        ("ë", "len(w)-1 >= rv",
         "CASE WHEN ends_with({b}, 'gu') THEN {b} ELSE w END"),
    ]
    step4b = _case(s4_rules)

    rv_expr = f"""CASE WHEN len(w) >= 2 AND substr(w, 1, 1) IN ({vin})
            AND substr(w, 2, 1) IN ({vin}) THEN LEAST(3, len(w))
       WHEN substr(w, 1, 3) IN ('par', 'col', 'tap') THEN LEAST(3, len(w))
       WHEN regexp_matches(w, '^.[^{_FR_V}]*[{_FR_V}]')
            THEN len(regexp_extract(w, '^.[^{_FR_V}]*[{_FR_V}]'))
       ELSE len(w) END"""

    sql = f"""{tag}mk AS (
  -- sequential marking: u after q → U; u/i between vowels → U/I; y next
  -- to a vowel (marked left context OR original right context) → Y
  WITH RECURSIVE walk(t, w0, i, acc) AS (
    SELECT t, t AS w0, 1, '' FROM {src}
    UNION ALL
    SELECT t, w0, i + 1,
           acc || CASE
             WHEN substr(w0, i, 1) = 'u' AND i > 1
                  AND substr(w0, i - 1, 1) = 'q' THEN 'U'
             WHEN substr(w0, i, 1) IN ('u', 'i') AND i > 1 AND i < len(w0)
                  AND right(acc, 1) IN ({vin})
                  AND substr(w0, i + 1, 1) IN ({vin})
             THEN upper(substr(w0, i, 1))
             WHEN substr(w0, i, 1) = 'y'
                  AND ((i > 1 AND right(acc, 1) IN ({vin}))
                       OR (i < len(w0) AND substr(w0, i + 1, 1) IN ({vin})))
             THEN 'Y'
             ELSE substr(w0, i, 1) END
    FROM walk WHERE i <= len(w0)
  )
  SELECT t, acc AS w FROM walk WHERE i = len(w0) + 1
     UNION ALL SELECT t, t FROM {src} WHERE len(t) = 0),
{_regions_sql(tag, f"{tag}mk", _FR_V, rv_expr)},
{tag}1 AS (SELECT t, rv, r1, r2, w AS pw, {fm_expr} AS fm, {step1} AS w
  FROM {tag}rr),
{tag}2a AS (SELECT t, rv, r1, r2, (w <> pw) AS alt1, fm, w AS pw,
  CASE WHEN (w = pw OR fm) THEN {step2a} ELSE w END AS w FROM {tag}1),
{tag}2b AS (SELECT t, rv, r1, r2, alt1, (w <> pw) AS alt2a, w AS pw,
  CASE WHEN (NOT alt1 OR fm) AND w = pw THEN {step2b} ELSE w END AS w
  FROM {tag}2a),
{tag}3s AS (SELECT t, rv, r2, (alt1 OR alt2a OR w <> pw) AS altered,
  CASE WHEN alt1 OR alt2a OR w <> pw THEN w ELSE {s4_s} END AS w
  FROM {tag}2b),
{tag}34 AS (SELECT t, rv,
  CASE WHEN altered THEN
    CASE WHEN ends_with(w, 'Y') THEN left(w, len(w)-1) || 'i'
         WHEN ends_with(w, 'ç') THEN left(w, len(w)-1) || 'c'
         ELSE w END
  ELSE {step4b} END AS w
  FROM {tag}3s),
{tag}5 AS (SELECT t,
  CASE WHEN regexp_matches(w, '(enn|onn|ett|ell|eill)$')
       THEN left(w, len(w)-1) ELSE w END AS w FROM {tag}34),
{tag}f AS (SELECT t, replace(replace(replace(
  regexp_replace(w, '([éè])([^{_FR_V}]+)$', 'e\\2'),
  'I', 'i'), 'U', 'u'), 'Y', 'y') AS stem FROM {tag}5)"""
    return sql, f"{tag}f"


CTE_BUILDERS["fr"] = french_ctes


# ------------------------------------------------ Danish/Norwegian/Swedish

_DA_V = "aeiouyæåø"
_SV_V = "aeiouyäåö"


def _scand_r1(tag: str, src: str, vowels: str) -> str:
    """R1 with the ≥3-letters-before adjustment (no R2/RV needed)."""
    r1pat = f"^[^{vowels}]*[{vowels}]+[^{vowels}]"
    return f"""{tag}rr AS (SELECT t, t AS w,
  GREATEST(CASE WHEN regexp_matches(t, '{r1pat}')
                THEN len(regexp_extract(t, '{r1pat}')) ELSE len(t) END, 3) AS r1
  FROM {src})"""


def danish_ctes(src: str, tag: str = "da") -> tuple[str, str]:
    from .stemmers import _DA_S1, _DA_S_END

    step1 = _case(
        [(s, "len(w)-{k} >= r1", "{b}") for s in _DA_S1]
        + [("s", "len(w)-1 >= r1",
            f"CASE WHEN len(w) >= 2 AND substr(w, len(w)-1, 1) IN ({_in(sorted(_DA_S_END))}) "
            "THEN {b} ELSE w END")]
    )
    pair = (
        "CASE WHEN len(w)-2 >= r1 AND right(w, 2) IN ('gd', 'dt', 'gt', 'kt') "
        "THEN left(w, len(w)-1) ELSE w END"
    )
    pair_b = (
        "CASE WHEN len({b})-2 >= r1 AND right({b}, 2) IN ('gd', 'dt', 'gt', 'kt') "
        "THEN left({b}, len({b})-1) ELSE {b} END"
    )
    step3 = _case(
        [(s, "len(w)-{k} >= r1", pair_b) for s in ("ig", "lig", "elig", "els")]
        + [("løst", "len(w)-4 >= r1", "left(w, len(w)-1)")]
    )
    sql = f"""{_scand_r1(tag, src, _DA_V)},
{tag}1 AS (SELECT t, r1, {step1} AS w FROM {tag}rr),
{tag}2 AS (SELECT t, r1, {pair} AS w FROM {tag}1),
{tag}3i AS (SELECT t, r1,
  CASE WHEN ends_with(w, 'igst') THEN left(w, len(w)-2) ELSE w END AS w
  FROM {tag}2),
{tag}3 AS (SELECT t, r1, {step3} AS w FROM {tag}3i),
{tag}f AS (SELECT t,
  CASE WHEN len(w) >= 2 AND len(w)-1 >= r1
            AND substr(w, len(w), 1) NOT IN ({_in(_DA_V)})
            AND substr(w, len(w), 1) = substr(w, len(w)-1, 1)
       THEN left(w, len(w)-1) ELSE w END AS stem FROM {tag}3)"""
    return sql, f"{tag}f"


def swedish_ctes(src: str, tag: str = "sv") -> tuple[str, str]:
    from .stemmers import _SV_S1, _SV_S_END

    step1 = _case(
        [(s, "len(w)-{k} >= r1", "{b}") for s in _SV_S1]
        + [("s", "len(w)-1 >= r1",
            f"CASE WHEN len(w) >= 2 AND substr(w, len(w)-1, 1) IN ({_in(sorted(_SV_S_END))}) "
            "THEN {b} ELSE w END")]
    )
    pair = (
        "CASE WHEN len(w)-2 >= r1 AND right(w, 2) IN "
        "('dd', 'gd', 'nn', 'dt', 'gt', 'kt', 'tt') "
        "THEN left(w, len(w)-1) ELSE w END"
    )
    step3 = _case(
        [(s, "len(w)-{k} >= r1", "{b}") for s in ("lig", "ig", "els")]
        + [("löst", "len(w)-4 >= r1", "left(w, len(w)-1)"),
           ("fullt", "len(w)-5 >= r1", "left(w, len(w)-1)")]
    )
    sql = f"""{_scand_r1(tag, src, _SV_V)},
{tag}1 AS (SELECT t, r1, {step1} AS w FROM {tag}rr),
{tag}2 AS (SELECT t, r1, {pair} AS w FROM {tag}1),
{tag}f AS (SELECT t, {step3} AS stem FROM {tag}2)"""
    return sql, f"{tag}f"


def norwegian_ctes(src: str, tag: str = "nb") -> tuple[str, str]:
    from .stemmers import _NB_S1, _NB_S3, _NB_S_END

    step1 = _case(
        [(s, "len(w)-{k} >= r1", "{b}") for s in _NB_S1]
        + [("s", "len(w)-1 >= r1",
            f"CASE WHEN len(w) >= 2 AND (substr(w, len(w)-1, 1) IN ({_in(sorted(_NB_S_END))}) "
            f"OR (substr(w, len(w)-1, 1) = 'k' AND len(w) >= 3 "
            f"AND substr(w, len(w)-2, 1) NOT IN ({_in(_DA_V)}))) "
            "THEN {b} ELSE w END"),
           ("erte", "len(w)-4 >= r1", "{b} || 'er'"),
           ("ert", "len(w)-3 >= r1", "{b} || 'er'")]
    )
    pair = (
        "CASE WHEN len(w)-2 >= r1 AND right(w, 2) IN ('dt', 'vt') "
        "THEN left(w, len(w)-1) ELSE w END"
    )
    step3 = _case([(s, "len(w)-{k} >= r1", "{b}") for s in _NB_S3])
    sql = f"""{_scand_r1(tag, src, _DA_V)},
{tag}1 AS (SELECT t, r1, {step1} AS w FROM {tag}rr),
{tag}2 AS (SELECT t, r1, {pair} AS w FROM {tag}1),
{tag}f AS (SELECT t, {step3} AS stem FROM {tag}2)"""
    return sql, f"{tag}f"


CTE_BUILDERS["da"] = danish_ctes
CTE_BUILDERS["sv"] = swedish_ctes
CTE_BUILDERS["nb"] = norwegian_ctes


# ------------------------------------------------------------------ Romanian

_RO_V = "aăâeiîou"


def romanian_ctes(src: str, tag: str = "ro") -> tuple[str, str]:
    from .stemmers import (
        _RO_S0,
        _RO_S1,
        _RO_S2_DELETE,
        _RO_S2_IST,
        _RO_S3_G1,
        _RO_S3_G2,
    )

    vin = _in(_RO_V)

    s0_rules = []
    for s, rep in _RO_S0.items():
        if s == "ile":
            s0_rules.append(
                (s, None,
                 "CASE WHEN len(w)-3 >= r1 AND NOT ends_with(left(w, len(w)-3), 'ab') "
                 "THEN left(w, len(w)-3) || 'i' ELSE w END")
            )
        elif rep is None:
            s0_rules.append(
                (s, None, "CASE WHEN len(w)-{k} >= r1 THEN {b} ELSE w END")
            )
        else:
            s0_rules.append(
                (s, None,
                 "CASE WHEN len(w)-{k} >= r1 THEN {b} || '%s' ELSE w END" % rep)
            )
    step0 = _case(s0_rules)

    s1_rules = [
        (s, None,
         "CASE WHEN len(w)-{k} >= r1 THEN {b} || '%s' ELSE w END" % rep)
        for s, rep in _RO_S1.items()
    ]
    step1 = _case(s1_rules)

    s2_rules = [
        (s, None, "CASE WHEN len(w)-{k} >= r2 THEN {b} ELSE w END")
        for s in _RO_S2_DELETE
    ] + [
        (s, None,
         "CASE WHEN len(w)-{k} >= r2 THEN {b} || 'ist' ELSE w END")
        for s in _RO_S2_IST
    ] + [
        (s, None,
         "CASE WHEN len(w)-{k} >= r2 AND ends_with({b}, 'ţ') "
         "THEN left({b}, len({b})-1) || 't' ELSE w END")
        for s in ("iune", "iuni")
    ]
    step2 = _case(s2_rules)

    s3_rules = []
    for s in _RO_S3_G1:
        s3_rules.append(
            (s, "len(w)-{k} >= rv",
             f"CASE WHEN len(w)-{{k}}-1 >= rv AND "
             f"(substr(w, len(w)-{{k}}, 1) NOT IN ({vin}) "
             f"OR substr(w, len(w)-{{k}}, 1) = 'u') THEN {{b}} ELSE w END")
        )
    for s in _RO_S3_G2:
        s3_rules.append((s, "len(w)-{k} >= rv", "{b}"))
    step3 = _case(s3_rules)

    step4 = _case(
        [(s, "len(w)-{k} >= rv", "{b}") for s in ("ie", "a", "e", "i", "ă")]
    )

    sql = f"""{tag}mk AS (
  -- prelude: ș/ț → ş/ţ, then i/u between vowels → I/U (sequential walk)
  WITH RECURSIVE walk(t, w0, i, acc) AS (
    SELECT t, replace(replace(t, 'ș', 'ş'), 'ț', 'ţ'), 1, '' FROM {src}
    UNION ALL
    SELECT t, w0, i + 1,
           acc || CASE
             WHEN substr(w0, i, 1) IN ('i', 'u') AND i > 1 AND i < len(w0)
                  AND right(acc, 1) IN ({vin})
                  AND substr(w0, i + 1, 1) IN ({vin})
             THEN upper(substr(w0, i, 1))
             ELSE substr(w0, i, 1) END
    FROM walk WHERE i <= len(w0)
  )
  SELECT t, acc AS w FROM walk WHERE i = len(w0) + 1
     UNION ALL SELECT t, t FROM {src} WHERE len(t) = 0),
{_regions_sql(tag, f"{tag}mk", _RO_V, _rv_romance_sql(_RO_V))},
{tag}0 AS (SELECT t, rv, r1, r2, {step0} AS w FROM {tag}rr),
{tag}1 AS (
  -- step 1 REPEATS until no combining suffix is replaced; each pass
  -- strictly shortens the word, so the fixpoint row is the arg-min by
  -- length per token
  WITH RECURSIVE rep(t, rv, r1, r2, w) AS (
    SELECT t, rv, r1, r2, w FROM {tag}0
    UNION ALL
    SELECT t, rv, r1, r2, {step1} FROM rep WHERE {step1} <> w
  )
  SELECT t, any_value(rv) AS rv, any_value(r1) AS r1, any_value(r2) AS r2,
         arg_min(w, len(w)) AS w,
         (min(len(w)) < max(len(w))) AS did1  -- robust to duplicate input rows
  FROM rep GROUP BY t),
{tag}2 AS (SELECT t, rv, did1, w AS pw, {step2} AS w FROM {tag}1),
{tag}3 AS (SELECT t, rv,
  CASE WHEN NOT did1 AND w = pw THEN {step3} ELSE w END AS w FROM {tag}2),
{tag}f AS (SELECT t, replace(replace({step4}, 'I', 'i'), 'U', 'u') AS stem
  FROM {tag}3)"""
    return sql, f"{tag}f"


CTE_BUILDERS["ro"] = romanian_ctes
