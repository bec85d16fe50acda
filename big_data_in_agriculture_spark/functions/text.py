"""Text-analysis Column expressions for the documents pipeline.

Everything here is a pure ``pyspark.sql.functions`` composition —
JVM-side, whole-stage-codegen'd, no Python in the hot path. These are
the building blocks an LLM training-data pipeline runs over billions
of documents: token counts, quality ratios, language heuristics,
fingerprints.

Determinism contract: every expression has an exact ANSI-SQL twin
(used by the DuckDB oracles in __spark_entry__.py) — literal-space
splits, explicit punctuation classes, sha256 fingerprints — so results
hash-match bit-for-bit across engines.
"""

from __future__ import annotations

import pandas as pd  # only nfc_normalize's Arrow island; hot path stays JVM
from pyspark.sql import Column
from pyspark.sql import functions as F

#: Explicit punctuation class — shared verbatim with SQL oracles.
PUNCT_CLASS = r"[.,!?;:]"

#: Tiny per-language marker-word lists for the n-gram/stopword language
#: heuristic. Public common-word lists; intentionally minimal — the
#: heuristic is a scoring scaffold, not a production langid model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "un"],
    "de": ["der", "die", "und", "das", "ein"],
}


def _let_array(bound: Column, fn) -> Column:
    """Let-bind an array expression as a lambda variable: evaluate
    ``bound`` ONCE, then build ``fn(var)`` over the bound value.

    ``transform(array(bound), v -> fn(v))[0]`` — higher-order
    functions run interpreted with no common-subexpression
    elimination, so any lambda body referencing an expression tree
    (not a lambda variable) re-evaluates that tree per element. For a
    per-position transform over ``tokens(text)`` that means one full
    re-split of the document per token: O(n²) in document length,
    found by the --longdoc adversarial corpus. Binding through a
    lambda variable makes the reference a value lookup.

    NULL-safe: ``array(NULL_value)`` is ``[NULL]``, the lambda sees
    NULL, and ``[result][0]`` unwraps — NULL propagation matches the
    unbound expression exactly.
    """
    return F.transform(F.array(bound), fn)[0]


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (single-space split — matches the SQL twin)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def n_tokens(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def n_distinct_tokens(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")


def n_chars(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c).cast("long")


def punct_count(text: Column | str) -> Column:
    """Count of punctuation chars = len − len(strip-punct)."""
    c = F.col(text) if isinstance(text, str) else text
    return (F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))).cast("long")


def quality_score(text: Column | str) -> Column:
    """Cheap quality heuristic: mean token length × distinct-token ratio.

    Degenerate docs (one repeated token, or wall-of-characters) score
    low; normal prose scores near word-length. Pure float64 arithmetic
    so the SQL twin is bit-identical.
    """
    nt = n_tokens(text).cast("double")
    mean_tok_len = (n_chars(text).cast("double") - (nt - 1)) / nt
    distinct_ratio = n_distinct_tokens(text).cast("double") / nt
    return mean_tok_len * distinct_ratio


def lang_score(text: Column | str, lang: str) -> Column:
    """Marker-word hit count for one language (langid building block)."""
    toks = tokens(text)
    markers = LANG_MARKERS[lang]
    return F.size(
        F.filter(toks, lambda t: F.lower(t).isin(markers))
    ).cast("long")


def lang_guess(text: Column | str) -> Column:
    """argmax over LANG_MARKERS scores; 'und' when all scores are 0.

    A real deployment swaps this for a fastText/CLD3 Pandas-UDF island;
    the n-gram scaffold keeps the hot path JVM-side.
    """
    scores = [(lang, lang_score(text, lang)) for lang in LANG_MARKERS]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # Build the when-chain REVERSED: the outermost (first-evaluated)
    # branch must be the first language, so ties break in insertion
    # order (en before es before fr before de).
    for lang, s in reversed(scores):
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


#: BPE-ish pre-tokenization: word runs OR single non-word-non-space
#: chars — the split GPT-style BPE applies before merges. Shared
#: verbatim with SQL oracles (Java and RE2 agree on \w and \s here).
BPE_SPLIT_PATTERN = r"\w+|[^\w\s]"


def bpe_tokens(text: Column | str) -> Column:
    """Pre-tokenizer split: array of word runs + punctuation singletons."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), F.lit(0))


def n_bpe_tokens(text: Column | str) -> Column:
    return F.size(bpe_tokens(text)).cast("long")


def stopword_count(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Tokens that are (lowercased) members of a stopword list."""
    words = stopwords if stopwords is not None else sorted(
        {w for ws in LANG_MARKERS.values() for w in ws}
    )
    return F.size(
        F.filter(tokens(text), lambda t: F.lower(t).isin(words))
    ).cast("long")


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Stopword share of whitespace tokens — a quality-score input."""
    return stopword_count(text, stopwords).cast("double") / n_tokens(text).cast(
        "double"
    )


#: Cleaning regexes — shared verbatim with SQL oracles (Java regex and
#: RE2 agree on these constructs: classes, +, {m,}, alternation).
#: Bounded for the same backtracking-linearity reason as PII_PATTERNS:
#: `<[^>]+>` costs O(run²) on Java for '<'-dense garbage with no '>'
#: (measured 3.8 s on a 100 kB '<' run; bounded: 0.08 s). Tags longer
#: than 512 chars are left unstripped — real markup stays far under
#: that. The bound must also stay ≤ 1000: RE2 (DuckDB) has a hard
#: 1000-max-repeat COMPILE limit, and an over-limit pattern fails
#: silently (regexp_replace returns its input unchanged) — {1,1024}
#: would diverge the engines without any error.
HTML_TAG_PATTERN = r"<[^>]{1,512}>"


def strip_html(text: Column | str) -> Column:
    """Drop markup tags, collapse the leftover whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(
        F.regexp_replace(F.regexp_replace(c, HTML_TAG_PATTERN, " "), r"\s+", " ")
    )


def repetition_ratio(text: Column | str, k: int = 3) -> Column:
    """Share of repeated k-shingles: 1 − |distinct shingles| / |shingles|.

    Boilerplate and looping generations repeat shingles; clean prose
    has a ratio near 0. Uses the total shingle count max(n−k+1, 1) vs
    the distinct set word_shingles produces.
    """
    c = F.col(text) if isinstance(text, str) else text
    nt = n_tokens(text)
    total = F.greatest(nt - F.lit(k - 1), F.lit(1)).cast("double")
    distinct = F.size(word_shingles(text, k)).cast("double")
    # NULL text -> NULL ratio (the unguarded arithmetic produced an
    # arbitrary engine-dependent value via greatest/size NULL quirks)
    return F.when(c.isNull(), F.lit(None).cast("double")).otherwise(
        F.lit(1.0) - distinct / total
    )


def nfc_normalize(text: Column | str) -> Column:
    """Unicode NFC normalization — the corpus-ENTRY convention.

    The same visible text can arrive composed (é = U+00E9) or
    decomposed (e + U+0301); every byte-level operator downstream
    (sha fingerprints, shingle hashes, exact/near dedup) legitimately
    treats those as distinct. The repo-wide convention is therefore:
    normalize ONCE at corpus entry with this function when twin
    collapse is wanted, and keep every downstream operator byte-exact
    (no hidden normalization inside dedup — it would desync the SQL
    oracles, which see raw bytes).

    Arrow-batched pandas UDF over Python's unicodedata (no JVM-side
    normalize exists in Spark SQL's function library); DuckDB's
    ``nfc_normalize()`` is the oracle twin. NULL in → NULL out.
    """
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: None if t is None else unicodedata.normalize("NFC", t)
        )

    c = F.col(text) if isinstance(text, str) else text
    return _nfc(c)


def fingerprint(text: Column | str) -> Column:
    """Normalized-content fingerprint: sha256 of lower(collapsed-ws).

    The content-defined identity used for exact dedup across formatting
    variants. sha256 hex is engine-portable (DuckDB `sha256()` emits
    the same lowercase hex).
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.sha2(F.regexp_replace(F.lower(c), r"\s+", " "), 256)


def shingle_hashes(text: Column | str, k: int = 3) -> Column:
    """Distinct 64-bit hashes of the k-word shingles, as array<long>.

    Equivalent join keys to ``xxhash64(word_shingles(...))`` but built
    without materializing shingle strings: hash each token ONCE, then
    combine k consecutive token hashes with rotate-xor folds and one
    final xxhash64 re-mix. Halves the hashing cost and — more
    importantly for one-shot queries — keeps the expression tree small
    (string-concat shingling dominates plan codegen time).

    Only XOR/shift arithmetic (wrap-safe under ANSI mode; multiplies
    would throw on overflow). Collision probability stays ~n²/2⁶⁴ —
    irrelevant beside the shingle-set semantics both near-dup operators
    already accept.
    """
    def _combine(h: Column) -> Column:
        ln = F.greatest(F.size(h) - F.lit(k - 1), F.lit(1))
        combined = F.slice(h, 1, ln)
        for j in range(1, k):
            nxt = F.slice(h, j + 1, ln)
            combined = F.zip_with(
                combined,
                nxt,
                lambda x, y: F.shiftleft(x, 13)
                .bitwiseXOR(F.shiftrightunsigned(x, 51))
                .bitwiseXOR(F.coalesce(y, F.lit(-7046029254386353131))),
            )
        return F.array_distinct(
            F.transform(combined, lambda x: F.xxhash64(x))
        )

    # the token-hash array is LET-BOUND (_let_array): the k slices +
    # size reference it k+1 times, and unbound each reference re-ran
    # tokenize+hash over the whole document — bit-identical either
    # way, measured ~30% faster let-bound on the sf0.1 corpus (and
    # O(k·n) → O(n) fewer re-evaluations on long documents)
    return _let_array(
        F.transform(tokens(text), lambda x: F.xxhash64(x)), _combine
    )


def shingle_hashes_md5(text: Column | str, k: int = 3) -> Column:
    """Distinct PORTABLE 32-bit shingle hashes, as array<long>.

    The engine-portable twin of :func:`shingle_hashes`: hash = the
    first 8 hex chars of ``md5(shingle)`` parsed as an integer —
    DuckDB reproduces it verbatim as
    ``('0x' || substr(md5(s), 1, 8))::BIGINT`` (both engines emit
    lowercase hex md5 of the UTF-8 bytes). Values are uniform in
    [0, 2^32), exactly the domain MinHash's affine permutations
    expect, so ``minhash_signatures`` needs no extra masking.

    Trade-off vs :func:`shingle_hashes`: md5 over the materialized
    shingle string costs ~2× the rotate-xor token combine; a 100 TB
    deployment that does not need a SQL oracle passes
    ``portable=False`` to the MinHash operators to get the xxhash64
    path back. Collision space is 2^32 (vs 2^64): collisions merely
    merge two shingles in BOTH engines identically, a no-op for the
    set semantics near-dup already accepts below ~10^8 shingles/doc.
    """
    return F.array_distinct(
        F.transform(
            word_shingles(text, k),
            lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
        )
    )


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles as an array<string> (MinHash/Jaccard input).

    Built with transform over a sequence — JVM-side, no UDF. Documents
    shorter than k tokens yield their whole token string as the single
    shingle, so every doc has ≥1 shingle.

    The token array is LET-BOUND as a lambda variable
    (``transform(array(toks), t -> ...)[0]``) before the per-position
    transform: higher-order functions evaluate INTERPRETED with no
    common-subexpression elimination, so a lambda body that references
    the ``split(text)`` expression tree re-tokenizes the whole
    document once PER POSITION — O(n_tokens × doc_len), which turned
    a 20k-token document (advdata --longdoc) into minutes of work.
    A lambda variable is evaluated once and referenced by value.
    """
    return _let_array(
        tokens(text),
        lambda t: F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0), F.greatest(F.size(t) - k, F.lit(0))
                ),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, k)),
            )
        ),
    )


# --- Gopher-style quality-rule signals (Rae et al. 2021, §A1.1) ------------
# Pure Column arithmetic with exact ANSI twins: counts come from
# length-difference tricks and array filters, never UDFs.

BULLET_PREFIXES = ("- ", "* ")


def mean_word_length(text: Column | str) -> Column:
    """Mean token length = non-space chars / tokens (single-space split)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.length(F.replace(c, F.lit(" "), F.lit(""))).cast("double") / n_tokens(
        text
    ).cast("double")


def symbol_word_ratio(text: Column | str) -> Column:
    """(# of '#' chars + '...' runs) per token — the symbol-spam signal."""
    c = F.col(text) if isinstance(text, str) else text
    hashes = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    dots = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    return (hashes + dots).cast("double") / n_tokens(text).cast("double")


def alpha_word_ratio(text: Column | str) -> Column:
    """Fraction of tokens containing at least one ASCII letter."""
    toks = tokens(text)
    return F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("double") / F.size(toks).cast("double")


def lines(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, "\n")


def bullet_line_fraction(text: Column | str) -> Column:
    """Fraction of lines starting with a bullet marker ('- ' or '* ')."""
    ls = lines(text)
    hit = F.filter(
        ls,
        lambda l: F.substring(l, 1, 2).isin(list(BULLET_PREFIXES)),
    )
    return F.size(hit).cast("double") / F.size(ls).cast("double")


def ellipsis_line_fraction(text: Column | str) -> Column:
    """Fraction of lines ending in '...' (the truncated-content signal)."""
    ls = lines(text)
    hit = F.filter(ls, lambda l: l.endswith("..."))
    return F.size(hit).cast("double") / F.size(ls).cast("double")


def dup_line_char_fraction(text: Column | str) -> Column:
    """Chars inside lines occurring ≥2× in the doc / total chars.

    The Gopher duplicate-line signal: boilerplate-heavy pages repeat
    whole lines (nav, footers, cookie banners). Pure array math per
    row — distinct lines × occurrence counts — O(lines²) per doc,
    bounded and map-only; no explode, no shuffle.
    """
    c = F.col(text) if isinstance(text, str) else text
    # lines let-bound (_let_array): referencing the split expression
    # inside the per-distinct-line lambda re-splits the document per
    # line — O(n²·len) on long documents (--longdoc corpus find)
    dup_chars = _let_array(
        lines(text),
        lambda ls: F.aggregate(
            F.transform(
                F.array_distinct(ls),
                lambda l: F.when(
                    F.size(F.filter(ls, lambda x: x == l)) >= 2,
                    (
                        F.size(F.filter(ls, lambda x: x == l)) * F.length(l)
                    ).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
    return dup_chars.cast("double") / F.greatest(
        F.length(c), F.lit(1)
    ).cast("double")


def top_ngram_char_fraction(text: Column | str, n: int = 2) -> Column:
    """Chars covered by the most-repeated word n-gram / total chars.

    The Gopher top-n-gram signal: looping generations and SEO spam
    repeat one phrase; coverage = occurrences × phrase length. Only
    n-grams occurring ≥2× count (a unique n-gram is not repetition —
    without that floor every short document trips the 4-gram
    threshold on its longest phrase). Maximum over distinct n-grams
    of the product — deterministic, no tie-break needed. Same
    O(grams²) map-only shape as the duplicate-line signal.
    """
    c = F.col(text) if isinstance(text, str) else text
    # both the token array AND the gram array are let-bound
    # (_let_array): unbound, the gram lambda re-tokenized per position
    # and the per-distinct-gram lambda re-built the gram array per
    # gram — O(n³) in document length (--longdoc corpus find)
    top = _let_array(
        tokens(text),
        lambda t: _let_array(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
            ),
            lambda grams: F.array_max(
                F.transform(
                    F.array_distinct(grams),
                    lambda g: F.when(
                        F.size(F.filter(grams, lambda x: x == g)) >= 2,
                        (
                            F.size(F.filter(grams, lambda x: x == g))
                            * F.length(g)
                        ).cast("long"),
                    ).otherwise(F.lit(0).cast("long")),
                )
            ),
        ),
    )
    return top.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


# --- PII detection / masking ------------------------------------------------
#
# Heuristic scanners for the PII classes a training-data pipeline
# scrubs before release (the CCNet/Dolma-style email/IP/phone/ID-number
# pass). Patterns deliberately use only the Java-regex ∩ RE2 shared
# subset — explicit ASCII classes (never \w/\d shorthands whose unicode
# behavior could drift), non-backtracking constructs, \b word
# boundaries (ASCII-word-based on both engines) — so DuckDB's
# regexp_extract_all/regexp_replace('g') replay counts and masked text
# byte-identically (parity asserted across hostile/unicode corpora).
# Heuristic by design: IPv4 accepts out-of-range octets, the digit run
# catches SSN/account-number shapes — scanners, not validators.

#: match order is the masking order: emails first (an email can
#: contain a phone-shaped local part), then IPs, phones, digit runs.
#:
#: Every pattern must stay LINEAR on a backtracking engine (Java) for
#: pathological inputs: web garbage contains megabyte-long unbroken
#: base64/hex runs, and an UNBOUNDED `[...]+@` email local part costs
#: O(run²) there — measured 39 s for ONE 200 kB token (a 1 MB token
#: would be ~16 min/doc); RE2 is linear, so the hang would also be
#: engine-asymmetric. The email quantifiers are therefore bounded to
#: RFC 5321's 64-char local / 255-char domain limits (O(64)/position;
#: >64-char local parts match their last 64 chars — parity-tested),
#: and the numeric patterns are \b-anchored, which rejects every
#: inside-the-run start position in O(1).
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "emails",
        r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phones", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("digit_runs", r"\b[0-9]{9,}\b", "<NUM>"),
]

#: Checksum-gated classes (cards, IBANs): a digit-run regex alone
#: drowns in false positives — real pre-release scrubs validate the
#: checksum, which no regex can express. Each class pairs a bounded,
#: \b-anchored candidate pattern (linear on a backtracking engine:
#: in-run start positions reject in O(1), per-candidate work is
#: constant-bounded ≤ 34 chars) with a checksum fold over the match's
#: characters — Luhn mod-10 for cards, ISO 7064 mod-97 for IBANs —
#: expressed as an aggregate Column so the JVM evaluates it without
#: any UDF, and replayed in DuckDB via list_reduce over the same
#: per-character steps (the BPE recursive-replay trick applied to
#: checksums). Grouped 4-4-4-4 and bare 13-19-digit card shapes are
#: both candidates; only Luhn-valid ones count/mask.
CARD_PATTERN = r"\b[0-9]{4}([- ][0-9]{4}){3}\b|\b[0-9]{13,19}\b"
IBAN_PATTERN = r"\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\b"


def luhn_valid(digits: Column) -> Column:
    """True iff a pure-digit string passes the Luhn mod-10 check.

    One fold over the reversed digits. The accumulator packs
    (running_sum, position_parity) into one int — ``acc = sum<<1 | p``
    — so a plain (acc, element) reduce needs no index argument and
    the identical step replays as a DuckDB list_reduce. Odd reversed
    positions double (9-subtracting two-digit results), even add
    as-is; valid means sum % 10 == 0.
    """
    acc = F.aggregate(
        F.transform(
            F.split(F.reverse(digits), ""), lambda c: F.ascii(c) - F.lit(48)
        ),
        F.lit(0),
        lambda acc, d: F.shiftleft(
            F.shiftright(acc, 1)
            + F.when(
                acc.bitwiseAND(F.lit(1)) == 0, d
            ).otherwise(
                F.when(d > 4, d * 2 - 9).otherwise(d * 2)
            ),
            1,
        ).bitwiseOR(F.lit(1) - acc.bitwiseAND(F.lit(1))),
    )
    return F.shiftright(acc, 1) % 10 == 0


def iban_valid(s: Column) -> Column:
    """True iff an IBAN-shaped string passes the ISO 7064 mod-97 check:
    move the first four chars to the end, map letters to 10..35, and
    fold the resulting digit stream mod 97 — valid means remainder 1.
    The fold keeps the accumulator < 9700, so plain int arithmetic
    replays exactly in DuckDB's list_reduce."""
    rearranged = F.concat(F.substring(s, 5, 34), F.substring(s, 1, 4))
    acc = F.aggregate(
        F.transform(F.split(rearranged, ""), F.ascii),
        F.lit(0),
        lambda acc, v: F.when(
            v >= 65, (acc * 100 + v - 55) % 97
        ).otherwise((acc * 10 + v - 48) % 97),
    )
    return acc == 1


def _bounded_literal(x: Column) -> Column:
    """``\\b<candidate>\\b`` as a per-row regex pattern: masking must
    replace a validated candidate only where it sits at the SAME word
    boundaries the extraction saw. A bare literal replace also hit the
    candidate as a SUBSTRING of a longer digit run elsewhere in the
    doc (round-8 ADVICE: '904111111111111111' became '90<CARD>11',
    leaving residue the digit_runs pass no longer matched). Candidate
    values come from the card/IBAN patterns — digits, A-Z, space,
    hyphen — so no regex metacharacter escaping is needed, and ``\\b``
    means ASCII-word boundary in BOTH Java (default, no
    UNICODE_CHARACTER_CLASS) and RE2."""
    return F.concat(F.lit("\\b"), x, F.lit("\\b"))


def _card_candidates(c: Column) -> Column:
    """Luhn-valid card matches in the text (separator-stripped form is
    validated; the literal match is what masking removes). Kept in
    positional match order — identical in Java regex and RE2 — so the
    masking fold is deterministic cross-engine; duplicate values fold
    as no-ops (the literal is already replaced), so no distinct step
    (whose ordering guarantees differ between engines) is needed."""
    return F.filter(
        F.regexp_extract_all(c, F.lit(CARD_PATTERN), 0),
        lambda x: luhn_valid(F.regexp_replace(x, r"[- ]", "")),
    )


def _iban_candidates(c: Column) -> Column:
    return F.filter(
        F.regexp_extract_all(c, F.lit(IBAN_PATTERN), 0), iban_valid
    )


def pii_counts(text: Column | str) -> list[Column]:
    """One count column per PII class (aliased n_<class>), evaluated
    on the ORIGINAL text — classes overlap by design (a phone-shaped
    email local part counts as both) so each counter is independently
    meaningful. NULL text -> NULL counts (NULL-in -> NULL-out; the
    checksum classes inherit it because size(filter(NULL)) is NULL).
    Cards and IBANs count only CHECKSUM-VALID candidates."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ] + [
        F.size(_card_candidates(c)).alias("n_cards"),
        F.size(_iban_candidates(c)).alias("n_ibans"),
    ]


def mask_pii(text: Column | str) -> Column:
    """Text with every PII match replaced by its class token.

    Order is load-bearing: emails first (an email can contain a
    phone-shaped local part), then IPs, then the checksum classes
    (IBANs, cards) BEFORE the plain digit patterns — a bare 16-digit
    card is also a ``digit_runs`` match, and masking it as <NUM>
    first would hide it from the Luhn gate. Checksum masking folds
    the validated candidate list over the text with a
    ``\\b``-anchored ``regexp_replace`` per candidate (round 8 — the
    same boundaries the extraction saw, so a candidate appearing as a
    SUBSTRING of a longer digit run elsewhere is left alone; see
    :func:`_bounded_literal`), which replays in DuckDB as a
    list_reduce of the identical regexp_replace;
    checksum-INVALID candidates are deliberately left for the later
    generic patterns (an invalid bare run still masks as <NUM>; an
    invalid grouped run stays, as a scanner should leave non-PII).
    """
    c = F.col(text) if isinstance(text, str) else text
    chain = list(PII_PATTERNS)
    regex_head, regex_tail = chain[:2], chain[2:]
    for _, pat, rep in regex_head:  # emails, ipv4
        c = F.regexp_replace(c, pat, rep)
    # let-bind the partially-masked text: the candidate extraction and
    # the fold's init both reference it, and HOFs have no CSE — unbound
    # it would re-run the upstream regexp chain per reference
    c = _let_array(
        c,
        lambda t: F.aggregate(
            _iban_candidates(t), t,
            lambda acc, x: F.regexp_replace(
                acc, _bounded_literal(x), F.lit("<IBAN>")
            ),
        ),
    )
    c = _let_array(
        c,
        lambda t: F.aggregate(
            _card_candidates(t), t,
            lambda acc, x: F.regexp_replace(
                acc, _bounded_literal(x), F.lit("<CARD>")
            ),
        ),
    )
    for _, pat, rep in regex_tail:  # phones, digit_runs
        c = F.regexp_replace(c, pat, rep)
    return c
