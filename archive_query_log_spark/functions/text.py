"""Text scalar functions: cleaning, tokenizing, quality, language-ID,
fingerprinting (pure column exprs; SURVEY.md §2.8 C4/C5/C13 + the
training-data text-analysis extensions).

Reference semantics reproduced:
- clean_text / clean_int: /root/reference/archive_query_log/parsers/utils/__init__.py:5-33
  (remove-pattern sub → space-pattern → strip → whitespace collapse → '' → null;
  int parse failure → null).
- language detection (cld3 in scripts/create_corpus.py:41-48) is re-expressed
  as a stopword-hit heuristic so it runs JVM-side; a real lang-id model would
  slot in as a pandas UDF.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def clean_text(
    text: Column | str,
    remove_pattern: str | None = None,
    space_pattern: str | None = None,
) -> Column:
    """parsers/utils/__init__.py:5-18, as one codegen-friendly expression."""
    c = _col(text)
    if remove_pattern is not None:
        c = F.regexp_replace(c, remove_pattern, "")
    if space_pattern is not None:
        c = F.regexp_replace(c, space_pattern, " ")
    # (?U): Python's `" ".join(text.split())` splits on UNICODE whitespace
    # (U+00A0 etc.); Java \s is ASCII-only without the flag. Collapse first,
    # then trim — leading/trailing runs are now single ASCII spaces.
    c = F.regexp_replace(c, r"(?U)\s+", " ")
    c = F.trim(c)
    return F.nullif(c, F.lit(""))


def clean_int(text: Column | str, remove_pattern: str | None = None) -> Column:
    """parsers/utils/__init__.py:21-33; parse failure → null (try_cast)."""
    c = _col(text)
    if remove_pattern is not None:
        c = F.regexp_replace(c, remove_pattern, "")
    return F.trim(c).try_cast("long")


def tokenize(text: Column | str) -> Column:
    """Whitespace tokens, lowercased; empty input → empty array."""
    t = F.trim(F.lower(_col(text)))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokenize(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: words + digits + punctuation runs, the cheap
    proxy a training pipeline uses for budget accounting."""
    return F.size(
        F.regexp_extract_all(
            _col(text), F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), F.lit(0)
        )
    )


# Built-in stopword tables for the JVM-side lang-id heuristic (C13).
# No language-ID wheel (fasttext/cld3/langdetect/…) ships in this container
# — verified at build time — so the heuristic carries the capability: 12
# languages × ~25 high-frequency function words each, argmax on hit count.
# A real model drops into lang_id_udf() below without touching callers.
# NOTE: lang_id's oracle SQL is GENERATED from this table (entry_queries
# _LANG_HITS) — extending it updates both sides automatically. Words are
# single lowercase tokens without apostrophes (SQL-literal safe).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for",
           "was", "on", "are", "as", "with", "his", "they", "at", "be",
           "this", "have", "from", "or", "had", "by"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit",
           "von", "den", "nicht", "sie", "es", "auch", "auf", "sich", "aber",
           "dem", "nach", "wie", "im", "einer", "wird", "noch"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "du", "pour",
           "que", "qui", "dans", "pas", "sur", "plus", "par", "avec", "son",
           "au", "il", "elle", "nous", "vous", "mais"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "de", "por",
           "que", "en", "no", "se", "con", "para", "su", "al", "lo", "como",
           "más", "pero", "sus", "le", "ya"),
    "it": ("il", "di", "che", "la", "per", "un", "una", "non", "sono", "con",
           "si", "del", "come", "anche", "questo", "alla", "della", "nel",
           "gli", "più"),
    "pt": ("o", "de", "que", "do", "da", "em", "um", "para", "com", "não",
           "uma", "os", "no", "se", "na", "mais", "as", "dos", "como", "mas"),
    "nl": ("de", "het", "een", "van", "en", "dat", "is", "op", "te", "zijn",
           "met", "voor", "niet", "aan", "er", "ook", "maar", "bij", "naar",
           "dan"),
    "sv": ("och", "att", "det", "som", "en", "på", "är", "av", "för", "med",
           "den", "till", "inte", "har", "de", "om", "ett", "men", "var",
           "sig"),
    "pl": ("i", "w", "na", "z", "do", "to", "się", "nie", "jest", "że", "o",
           "jak", "po", "co", "tak", "za", "od", "przez", "ale", "czy"),
    "tr": ("bir", "ve", "bu", "da", "de", "için", "ile", "mi", "ne", "gibi",
           "daha", "çok", "en", "kadar", "sonra", "ama", "ise", "veya",
           "olarak", "olan"),
    "id": ("yang", "dan", "di", "itu", "dengan", "ini", "untuk", "dari",
           "dalam", "tidak", "akan", "pada", "juga", "ke", "karena", "ada",
           "mereka", "sudah", "saya", "kita"),
    "ru": ("и", "в", "не", "на", "что", "он", "с", "как", "это", "по", "но",
           "его", "из", "у", "за", "то", "же", "от", "бы", "для"),
}


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Number of tokens that are stopwords of `lang`."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokenize(text), lambda t: F.array_contains(words, t)))


# --- one-pass lang_id ------------------------------------------------------
#
# The naive argmax runs 12 array_contains probes (~260 short-string
# comparisons) on EVERY token. The rewrite computes one per-token language
# BITMASK: a crc32 bloom prefilter (k=1, 4096 bits packed into 64 longs,
# built at import from STOPWORDS so it can never drift) rejects most
# non-stopword tokens with one hash + one indexed bit test; only tokens the
# filter passes (true stopwords + ~6% false positives) pay the exact
# 12-list probe, and false positives are corrected by that exact re-check —
# results are bit-identical to the naive plan (equality-tested). The 12
# per-language hit counts then come from integer scans of the mask array.
_LANGS = tuple(sorted(STOPWORDS))
_BLOOM_BITS = 4096


def _build_bloom() -> list[int]:
    from zlib import crc32

    words = [0] * (_BLOOM_BITS // 64)
    for ws in STOPWORDS.values():
        for w in ws:
            b = crc32(w.encode("utf-8")) % _BLOOM_BITS
            words[b >> 6] |= 1 << (b & 63)
    # pack as SIGNED 64-bit so the values round-trip through LongType
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


_BLOOM_WORDS = _build_bloom()


def _stopword_mask(tok: Column) -> Column:
    """Bitmask over _LANGS of the languages claiming ``tok`` as a stopword
    (exact — the bloom only short-circuits definite misses)."""
    bloom = F.array(*[F.lit(w).cast("long") for w in _BLOOM_WORDS])
    bucket = F.crc32(F.encode(tok, "UTF-8")).bitwiseAND(
        F.lit(_BLOOM_BITS - 1)
    )
    word = F.element_at(
        bloom, (F.shiftright(bucket, 6) + F.lit(1)).cast("int")
    )
    maybe = F.bit_get(word, bucket.bitwiseAND(F.lit(63)).cast("int")) == 1
    exact = None
    for i, lang in enumerate(_LANGS):
        words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        term = F.when(F.array_contains(words, tok), F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        exact = term if exact is None else exact + term
    return F.when(maybe, exact).otherwise(F.lit(0))


def lang_id(text: Column | str) -> Column:
    """argmax over per-language stopword hit counts; null if no hits at all.

    Same decision rule as the naive 12×array_contains plan (first language
    in sorted order wins ties; no hits → null) — see the one-pass design
    note above _LANGS for why the per-token work is a bloom-gated mask."""
    masks = F.transform(tokenize(_col(text)), _stopword_mask)

    def _has_bit(bit: int):
        # closure factory, NOT a default arg: F.filter treats a 2-parameter
        # lambda as the (element, index) form and would bind the index over
        # the default
        return lambda m: m.bitwiseAND(F.lit(bit)) != 0

    def _decide(ms: Column) -> Column:
        hits = [
            F.size(F.filter(ms, _has_bit(1 << i)))
            for i in range(len(_LANGS))
        ]
        best = F.greatest(*hits)
        chain = F.when(best <= 0, F.lit(None).cast("string"))
        for i, lang in enumerate(_LANGS):
            chain = chain.when(hits[i] == best, F.lit(lang))
        return chain

    # bind the mask array ONCE via the single-element-array transform (no
    # CSE across higher-order lambdas — same trick as shingles())
    return F.get(F.transform(F.array(masks), _decide), 0)


def lang_id_udf(model_predict=None):
    """The pandas-UDF slot a REAL language-ID model plugs into (cld3 in the
    reference's scripts/create_corpus.py:41-48). ``model_predict`` takes a
    list[str] and returns list[str|None] (batch API, e.g. fasttext
    model.predict). Default: the stopword heuristic, batch-applied — same
    answers as lang_id(), so swapping in a model changes ONE argument."""
    from pyspark.sql.functions import pandas_udf

    if model_predict is None:
        sets = {k: set(v) for k, v in STOPWORDS.items()}  # built once

        def model_predict(texts: list) -> list:  # heuristic twin
            out = []
            for t in texts:
                toks = (t or "").lower().split()
                hits = {
                    lang: sum(tok in ws for tok in toks)
                    for lang, ws in sets.items()
                }
                best = max(hits.values()) if hits else 0
                out.append(
                    None
                    if best <= 0
                    else min(k for k, v in hits.items() if v == best)
                )
            return out

    @pandas_udf("string")
    def _lang(texts: pd.Series) -> pd.Series:
        return pd.Series(model_predict(texts.tolist()), dtype=object)

    return _lang


def punct_ratio(text: Column | str) -> Column:
    c = _col(text)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return punct.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    n = F.greatest(token_count(text), F.lit(1))
    return stopword_hits(text, lang).cast("double") / n.cast("double")


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0,1]: rewards mid-length docs,
    stopword presence, low punctuation density (training-data filter)."""
    c = _col(text)
    n_tok = token_count(c).cast("double")
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    sw = F.least(stopword_ratio(c) * F.lit(4.0), F.lit(1.0))
    pr = F.lit(1.0) - F.least(punct_ratio(c) * F.lit(5.0), F.lit(1.0))
    return F.round((len_score + sw + pr) / F.lit(3.0), 6)


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — the exact-dedup key (portable to the DuckDB oracle)."""
    norm = F.regexp_replace(F.trim(F.lower(_col(text))), r"\s+", " ")
    return F.md5(norm)


def shingles(text: Column | str, k: int = 3) -> Column:
    """k-token shingles ('a b c') as an array — MinHash/Jaccard input.

    Built with transform over token indices: stays JVM-side. The token
    array is bound ONCE through a single-element-array transform: Catalyst
    does not do common-subexpression elimination inside higher-order
    lambdas, so referencing tokenize(text) (a regex split of the whole
    document) k+2 times — as the first version did — re-splits the text
    per shingle position (measured 6× slower on the sf0.1 shingle stage).
    """

    def _shingles_of(toks: Column) -> Column:
        n = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        return F.when(n < k, F.array().cast("array<string>")).otherwise(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ",
                    *[
                        F.element_at(toks, (i + j + 1).cast("int"))
                        for j in range(k)
                    ],
                ),
            )
        )

    return F.get(F.transform(F.array(tokenize(text)), _shingles_of), 0)
