"""Text-analysis column functions (SURVEY.md §2.7 + LLM-pipeline ops).

Everything here is built-in-expression-only (whole-stage codegen, oracle
reproducible).  The reference's ``clean_text`` (`scrc/utils/main_utils.py:
113-139`) mixes regex steps with ``unicodedata`` NFKC normalization; the
regex steps live here as a codegen-friendly chain (so pushdown/pruning
survive — SURVEY.md §4 note), while the NFKC step lives in
``extraction.cleaning`` as a pandas_udf (no built-in NFKC in Spark).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic (E1 analogue: the reference uses a fastText model,
# `scrc/preprocessors/language_identifier.py:18-58`; at 100 TB a
# stopword/ngram heuristic is the cheap JVM-side first pass, with the
# model-based pass as a pandas_udf escalation for low-margin docs).
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "mit", "von", "wird"],
    "fr": ["le", "la", "les", "et", "ne", "pas", "avec", "est"],
    "it": ["il", "la", "che", "e", "non", "con", "per", "sono"],
    "en": ["the", "and", "not", "with", "from", "that", "this", "is"],
    "es": ["el", "la", "que", "y", "no", "con", "por", "una"],
}

# Regex steps of the reference's clean_text, re-expressed as built-ins
# (order matters; each tuple = (pattern, replacement)):
_CLEAN_STEPS = [
    (r" ", " "),          # NBSP -> space
    (r"\x00", ""),             # NUL removal (text_to_database.py:280-282)
    (r"(\w)-\n(\w)", r"$1$2"),  # de-hyphenate linebreaks
    (r"_+", "_"),              # collapse repeated underscores
    (r"\s+", " "),             # whitespace collapse
]


def clean_text_col(col: Column | str) -> Column:
    """The regex portion of clean_text as a regexp_replace chain; pair
    with ``extraction.cleaning.nfkc_normalize`` for full fidelity."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in _CLEAN_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(c)


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count (num_tokens analogue, SURVEY.md §1.2).

    String column names take the parsed-SQL twin (one py4j call,
    analyzed-plan-identical — r12 session 2); Column inputs keep the
    Column path."""
    if isinstance(col, str) and col.isidentifier():
        return F.expr(token_count_ws_sql(f"`{col}`"))
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


# BPE-ish pre-tokenizer: words | single digits | single punctuation —
# the shape GPT-2-style byte-pair pre-tokenization produces, as a
# portable regex (Java + RE2 compatible for oracle parity).
BPE_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_count_bpe(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_REGEX), 0))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Document-quality scoring features (length / punctuation ratio /
    stopword ratio / mean word length) — the standard pre-training
    corpus filters (C4/Gopher-style), JVM-side only."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    words = F.split(F.trim(F.lower(c)), r"\s+")
    n_words = F.size(words)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^A-Za-z0-9\s]"), 0))
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*[F.lit(s) for s in all_stop]))
    )
    # int/int divisions only — identical doubles in Spark and DuckDB
    # (no round(): the engines' double rounding differs; raw bits match).
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": n_stop / F.greatest(n_words, F.lit(1)),
        "mean_word_len": (
            F.length(F.concat_ws("", words)) / F.greatest(n_words, F.lit(1))
        ),
    }


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Count of words belonging to ``lang``'s stopword list."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(F.lower(c)), r"\s+")
    stops = STOPWORDS[lang]
    return F.size(F.filter(words, lambda w: w.isin(*[F.lit(s) for s in stops])))


def token_count_ws_sql(col_expr: str) -> str:
    """SQL text of :func:`token_count_ws` over an expression string
    (r12, session 2 — construction-cost twin, same technique as
    functions/hashing.py; keep in lockstep with the Column form)."""
    return f"size(split(trim({col_expr}), '\\\\s+'))"


def stopword_hits_sql(col_expr: str, lang: str) -> str:
    """SQL text of :func:`stopword_hits` over an expression string."""
    stops = ", ".join(f"'{s}'" for s in STOPWORDS[lang])
    return (
        f"size(filter(split(trim(lower({col_expr})), '\\\\s+'), "
        f"w -> w IN ({stops})))"
    )


def language_id_score_sql(col_expr: str) -> str:
    """SQL text of :func:`language_id_score` over an expression string.
    Mirrors the Column form exactly — including its re-expansion of
    every per-language hit expression at each reference (the Column
    object is one Python value but embeds as a repeated subtree;
    codegen-level common-subexpression elimination dedups the work at
    runtime in both forms).  Analyzed-plan identity with the Column
    form is pinned by the pipeline fingerprint diff recorded in
    OPTIMIZATION_r12.md and by tests/test_round12_ops.py."""
    langs = sorted(STOPWORDS)
    hits = {lang: stopword_hits_sql(col_expr, lang) for lang in langs}
    max_hits = "greatest(" + ", ".join(hits[lang] for lang in langs) + ")"
    n_at_max = "0"
    for lang in langs:
        n_at_max = (
            f"({n_at_max} + CASE WHEN ({hits[lang]} = {max_hits})"
            " THEN 1 ELSE 0 END)"
        )
    branches = [
        f"WHEN (({max_hits} = 0) OR ({n_at_max} > 1)) THEN 'und'"
    ] + [
        f"WHEN ({hits[lang]} = {max_hits}) THEN '{lang}'" for lang in langs
    ]
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


def language_id_score(col: Column | str) -> Column:
    """Heuristic language ID: argmax over per-language stopword hit
    counts; zero-hit or tied docs -> 'und' (undetermined), mirroring the
    reference's language_id = -1 unknown state (`language_identifier.py:24`).

    DECISION (r03, replacing the r02 'weak' flag): the reference uses a
    fastText lid.176 model file; neither the library nor the model is
    available in this environment, so the stopword heuristic is the
    final implementation, with accuracy pinned by a multilingual test
    over realistic court-register sentences
    (`tests/test_spider_configs.py::test_language_id_multilingual_accuracy`).
    A fastText-backed column could drop in behind this same signature
    (text column -> language code column) without touching any caller.

    Deliberately an explicit greatest + CASE chain (not a struct sort)
    so the SQL oracle is a literal transliteration with identical
    tie-break semantics: first language in alphabetical order wins the
    argmax, but a tie for the max yields 'und'.

    String column names take the parsed-SQL twin (one py4j call instead
    of ~470, analyzed-plan-identical — r12 session 2); Column inputs
    keep the Column path below.
    """
    if isinstance(col, str) and col.isidentifier():
        return F.expr(language_id_score_sql(f"`{col}`"))
    langs = sorted(STOPWORDS)
    hits = {lang: stopword_hits(col, lang) for lang in langs}
    max_hits = F.greatest(*[hits[lang] for lang in langs])
    n_at_max = sum(
        [F.when(hits[lang] == max_hits, 1).otherwise(0) for lang in langs],
        F.lit(0),
    )
    expr = F.when((max_hits == 0) | (n_at_max > 1), F.lit("und"))
    for lang in langs:
        expr = expr.when(hits[lang] == max_hits, F.lit(lang))
    return expr.otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# IAA text-similarity scores (reference `scrc/annotation/
# judgment_explainability/analysis/utils/scores.py`: ROUGE via
# rouge_scorer, BLEU via nltk.sentence_bleu — neither library exists in
# this environment, and neither is needed: both scores are counting
# arithmetic over token n-grams, expressed here as pure array
# expressions (higher-order functions, JVM-side, no UDF).
#
# Annotation spans are short (tens of tokens), so the O(|distinct
# n-grams| * |tokens|) aggregate-fold for clipped counts is cheap; for
# document-scale inputs prefer the explode→groupBy n-gram counters in
# `plans/text_queries.py` (A6), which shuffle instead of folding.
# ---------------------------------------------------------------------------

def _ngrams(tokens: Column, n: int) -> Column:
    """Array of n-gram strings (tokens joined with U+0001, a separator
    that cannot appear in whitespace-tokenized text) from a token-array
    column; empty when the array has < n tokens."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.array_join(F.slice(tokens, i, n), "\u0001"),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _clipped_overlap(cand_ngrams: Column, ref_ngrams: Column) -> Column:
    """sum over distinct shared n-grams of min(count_cand, count_ref) —
    the clipped-count overlap both ROUGE and BLEU's modified precision
    are built on."""
    shared = F.array_distinct(F.array_intersect(cand_ngrams, ref_ngrams))
    return F.aggregate(
        shared,
        F.lit(0),
        lambda acc, g: acc
        + F.least(
            F.size(F.filter(cand_ngrams, lambda x: x == g)),
            F.size(F.filter(ref_ngrams, lambda x: x == g)),
        ),
    )


def rouge_n_scores(
    candidate: Column | str, reference: Column | str, n: int = 1
) -> dict[str, Column]:
    """ROUGE-N precision/recall/F1 between two token-array columns
    (clipped n-gram counts; 0.0 on empty sides, mirroring the
    reference's NaN->0 fill in `scores.py`)."""
    cand = F.col(candidate) if isinstance(candidate, str) else candidate
    ref = F.col(reference) if isinstance(reference, str) else reference
    cg, rg = _ngrams(cand, n), _ngrams(ref, n)
    overlap = _clipped_overlap(cg, rg).cast("double")
    p = F.when(F.size(cg) > 0, overlap / F.size(cg)).otherwise(F.lit(0.0))
    r = F.when(F.size(rg) > 0, overlap / F.size(rg)).otherwise(F.lit(0.0))
    f1 = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    return {"precision": p, "recall": r, "f1": f1}


def bleu_score(
    candidate: Column | str, reference: Column | str, max_n: int = 4
) -> Column:
    """Sentence BLEU (uniform 1..max_n weights, no smoothing — nltk's
    `sentence_bleu` defaults as used in `scores.py`): geometric mean of
    clipped n-gram precisions times the brevity penalty
    min(1, exp(1 - |ref|/|cand|)).  Any zero precision zeroes the
    whole score, as in unsmoothed BLEU."""
    cand = F.col(candidate) if isinstance(candidate, str) else candidate
    ref = F.col(reference) if isinstance(reference, str) else reference
    log_sum = F.lit(0.0)
    any_zero = F.lit(False)
    for n in range(1, max_n + 1):
        cg, rg = _ngrams(cand, n), _ngrams(ref, n)
        overlap = _clipped_overlap(cg, rg).cast("double")
        p_n = F.when(F.size(cg) > 0, overlap / F.size(cg)).otherwise(F.lit(0.0))
        any_zero = any_zero | (p_n == 0)
        log_sum = log_sum + F.when(p_n > 0, F.log(p_n)).otherwise(F.lit(0.0))
    geo = F.exp(log_sum / F.lit(float(max_n)))
    bp = F.when(F.size(cand) >= F.size(ref), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - F.size(ref).cast("double") / F.size(cand))
    )
    return F.when(
        any_zero | (F.size(cand) == 0) | (F.size(ref) == 0), F.lit(0.0)
    ).otherwise(bp * geo)


# ---------------------------------------------------------------------------
# E11 lemma-counter fidelity: rule-based suffix-stripping lemmatizer
# ---------------------------------------------------------------------------
#
# The reference counts CASEFOLDED SPACY LEMMAS with POS exclusions
# {NUM, PUNCT, SYM, X} and an alpha filter
# (`scrc/preprocessors/abstract_preprocessor.py:387-410`).  spaCy is not
# in this container and a statistical tagger is not reproducible across
# engines, so the approximation is (a) alpha-only lowercase tokens
# (which already excludes NUM/PUNCT/SYM exactly as isalpha() does),
# (b) a function-word exclusion list standing in for the closed-class
# POS filter, and (c) ORDERED suffix-stripping rules per language.
# Rules are DATA (suffix, replacement, min-remaining-stem) and compile
# to one CASE expression string valid in BOTH Spark SQL and DuckDB —
# the oracle runs the identical logic, so the gate verifies the
# pipeline (tokenize -> exclude -> lemmatize -> count), not a tagger.
# Deviation from spacy lemma_ fidelity is documented in COVERAGE.md.

LEMMA_SUFFIX_RULES: dict[str, list[tuple[str, str, int]]] = {
    # German: plural/derivational endings; -ungen/-heiten/-keiten keep
    # their singular suffix; -den/-gen plurals of weak -e nouns keep
    # the e (beschwerden/gemeinden/unterlagen/klagen — r05 fidelity
    # measurement); plain declension endings strip
    "de": [
        ("ungen", "ung", 3),
        ("heiten", "heit", 3),
        ("keiten", "keit", 3),
        ("innen", "in", 3),
        # umlaut plural -äge -> -ag (anträge/beiträge/verträge); the
        # verb-noun family -fahren is invariant (verfahren/erfahren)
        # while -ahren alone would wrongly freeze jahren (r05 fidelity)
        ("äge", "ag", 2),
        # min_stem 0: the bare verb-noun "fahren" is itself invariant
        # (min_stem 1 made it fall through to the -en strip; r06 review)
        ("fahren", "fahren", 0),
        ("den", "de", 3),
        ("gen", "ge", 3),
        ("en", "", 3),
        ("er", "", 3),
        ("es", "", 3),
        ("e", "", 3),
        ("n", "", 3),
        ("s", "", 3),
    ],
    # French: plural -s/-x, -aux -> -al, derivational -ations/-ements;
    # -cours nouns (recours, secours, discours, concours) are invariant
    # — the identity rule fires before the generic -s strip ("jours"
    # does NOT match it and still strips to "jour")
    "fr": [
        # invariant identity rules use min_stem 0 so the bare word
        # matches too: "cours"/"frais"/"mois" are their own lemmas
        # (min_stem 1 sent "cours" -> "cour"; r06 review).  -rais does
        # NOT catch délais (ends -lais), which still strips.
        ("cours", "cours", 0),
        ("rais", "rais", 0),
        ("mois", "mois", 0),
        ("ations", "ation", 3),
        ("ements", "ement", 3),
        ("aux", "al", 2),
        ("x", "", 3),
        ("s", "", 3),
    ],
    # Italian: -ioni/-menti singulars first, then the -e-class plurals
    # the bare i -> o default gets wrong (r05 fidelity measurement:
    # sentenze/mesi/valori/termini/parti/giudici/uffici/principi/
    # cancellieri), then masculine plural -i -> -o
    "it": [
        ("ioni", "ione", 3),
        ("menti", "mento", 3),
        ("nze", "nza", 2),
        ("esi", "ese", 1),
        ("dici", "dice", 2),
        ("fici", "ficio", 2),
        ("cipi", "cipio", 2),
        ("ieri", "iere", 2),
        ("ori", "ore", 2),
        ("ini", "ine", 2),
        ("rti", "rte", 2),
        # feminine -esa-class plurals: spese/difese/imprese -> -esa;
        # kept narrower than a bare -ese rule, which would corrupt
        # -ese singulars like paese (r05 fidelity)
        ("pese", "pesa", 1),
        ("fese", "fesa", 1),
        ("rese", "resa", 1),
        ("i", "o", 3),
        ("e", "", 3),
    ],
}

# Closed-class function words (determiners, pronouns, prepositions,
# conjunctions, auxiliaries) — the POS-exclusion proxy.
LEMMA_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": (
        "der", "die", "das", "den", "dem", "des", "ein", "eine", "einer",
        "und", "oder", "nicht", "ist", "sind", "war", "wird", "werden",
        "mit", "von", "zu", "im", "in", "auf", "bei", "aus", "nach",
        "hat", "haben", "als", "auch", "sich", "er", "sie", "es",
    ),
    "fr": (
        "le", "la", "les", "un", "une", "des", "du", "de", "et", "ou",
        "est", "sont", "ne", "pas", "avec", "pour", "que", "qui",
        "dans", "sur", "par", "au", "aux", "il", "elle", "ce", "cette",
        "a", "ont",
    ),
    "it": (
        "il", "lo", "la", "i", "gli", "le", "un", "una", "di", "e",
        "o", "sono", "non", "con", "per", "che", "in", "su", "da",
        "al", "ai", "nel", "della", "ha", "hanno",
    ),
}

LEMMA_TOKEN_SPLIT = "[^a-zäöüßéèêëàâçîïôùûœ]+"


def lemma_case_sql(token_expr: str, lang_expr: str) -> str:
    """One CASE expression applying the per-language suffix rules to an
    (already lowercase, alpha-only) token — the string is valid Spark
    SQL AND DuckDB SQL, so both engines run literally the same logic."""
    lang_branches = []
    for lang, rules in LEMMA_SUFFIX_RULES.items():
        arms = []
        for suffix, repl, min_stem in rules:
            cond = (
                f"{token_expr} LIKE '%{suffix}' "
                f"AND length({token_expr}) >= {len(suffix) + min_stem}"
            )
            val = (
                f"substr({token_expr}, 1, length({token_expr}) - {len(suffix)})"
                + (f" || '{repl}'" if repl else "")
            )
            arms.append(f"WHEN {cond} THEN {val}")
        inner = "CASE " + " ".join(arms) + f" ELSE {token_expr} END"
        lang_branches.append(f"WHEN {lang_expr} = '{lang}' THEN {inner}")
    return "CASE " + " ".join(lang_branches) + f" ELSE {token_expr} END"


def lemma_stopword_sql(token_expr: str, lang_expr: str) -> str:
    """TRUE when the token is a function word of the row's language —
    same dual-dialect property as ``lemma_case_sql``."""
    branches = []
    for lang, words in LEMMA_STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        branches.append(f"WHEN {lang_expr} = '{lang}' THEN {token_expr} IN ({lst})")
    return "CASE " + " ".join(branches) + " ELSE FALSE END"


#: German common-noun derivational suffixes for the POS proxy's
#: capitalized-word disambiguation: German capitalizes EVERY noun, so
#: "capitalized ⇒ PROPN" (right for fr/it) systematically misreads
#: German common nouns (Beschwerde, Bundesgericht) as proper nouns —
#: the one sub-0.95 fidelity class in r05-r08.  A word carrying one of
#: these noun-forming endings is overwhelmingly a common noun;
#: toponyms/surnames (Zürich, Meyer) carry none of them.
DE_NOUN_SUFFIXES = (
    "ung", "heit", "keit", "schaft", "tum", "nis", "erei",
    "chen", "lein", "icht", "erde",
)


def de_noun_suffix_sql(token_expr: str, lang_expr: str) -> str:
    """TRUE when the row is German and the token ends with a common-
    noun derivational suffix (`DE_NOUN_SUFFIXES`) — dual-dialect
    (LIKE is identical in Spark SQL and DuckDB), used by the POS
    proxy to keep capitalized German common nouns out of PROPN."""
    likes = " OR ".join(
        f"lower({token_expr}) LIKE '%{s}'" for s in DE_NOUN_SUFFIXES
    )
    return f"({lang_expr} = 'de' AND ({likes}))"
