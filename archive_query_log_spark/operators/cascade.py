"""Data-driven URL parser cascades (SURVEY.md §2.9).

Reference semantics: an ORDERED rule table; per row the first rule that is
(a) applicable — provider matches and URL pattern matches — and (b) whose
parse returns non-null, wins; no-match still yields a progress update
(/root/reference/archive_query_log/parsers/url_query.py:49-59 applicability,
:107-174 cascade; same pattern in url_page.py / url_offset.py).

Spark-first design: the rule table is DATA (a Python list compiled once, or a
broadcast table unrolled), and the whole cascade compiles to ONE ``coalesce``
over per-rule ``when(applicable, extract)`` expressions — the 972-rule
url→query cascade becomes a single whole-stage-codegen projection instead of
a per-row Python loop. Rules here are OUR OWN fixtures; the reference's rule
tables are data files a deployment would import, not code to copy.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from archive_query_log_spark.functions import text as T
from archive_query_log_spark.functions import urls as U


@dataclass(frozen=True)
class UrlRule:
    """One parser rule (mirrors the reference's QueryParser model fields,
    parsers/url_query.py:65-104)."""

    rule_type: str  # 'query_param' | 'fragment_param' | 'path_segment'
    argument: str | int
    provider_id: str | None = None  # None = applicable to any provider
    url_pattern: str | None = None  # regex; None = applicable to any URL
    remove_pattern: str | None = None
    space_pattern: str | None = None


def _extract(rule: UrlRule, url: Column) -> Column:
    if rule.rule_type == "query_param":
        return U.parse_url_query_parameter(str(rule.argument), url)
    if rule.rule_type == "fragment_param":
        return U.parse_url_fragment_parameter(str(rule.argument), url)
    if rule.rule_type == "path_segment":
        return U.parse_url_path_segment(int(rule.argument), url)
    raise ValueError(rule.rule_type)


def compile_cascade(
    rules: list[UrlRule],
    url: Column,
    provider: Column | None = None,
    as_int: bool = False,
) -> Column:
    """Rule table → one coalesce(when(applicable, cleaned_extract), ...).

    First applicable rule whose parse yields non-null wins — exactly the
    reference's loop, minus the loop.
    """
    branches: list[Column] = []
    for r in rules:
        applicable = F.lit(True)
        if r.provider_id is not None and provider is not None:
            applicable = applicable & (provider == r.provider_id)
        if r.url_pattern is not None:
            applicable = applicable & url.rlike(r.url_pattern)
        raw = _extract(r, url)
        val = (
            T.clean_int(raw, r.remove_pattern)
            if as_int
            else T.clean_text(raw, r.remove_pattern, r.space_pattern)
        )
        branches.append(F.when(applicable, val))
    if not branches:
        return F.lit(None).cast("bigint" if as_int else "string")
    return F.coalesce(*branches)


def rules_to_df(spark, rules: list[UrlRule]):
    """Rule table as data (rule_order = cascade precedence)."""
    rows = [
        (
            i,
            r.rule_type,
            str(r.argument),
            r.provider_id,
            r.url_pattern,
            r.remove_pattern,
            r.space_pattern,
        )
        for i, r in enumerate(rules)
    ]
    return spark.createDataFrame(
        rows,
        "rule_order int, rule_type string, argument string, provider_id string,"
        " url_pattern string, remove_pattern string, space_pattern string",
    )


def _extract_dynamic(url: Column, rule_type: Column, arg: Column) -> Column:
    """One 3-branch extraction expression over DYNAMIC rule columns or
    struct fields — the key to both scale plans: the expression count stays
    constant no matter how many rules exist."""
    url = U.lenient_url(url)  # same malformed-escape leniency as compile_cascade
    qp = U.parse_qsl_first(F.try_parse_url(url, F.lit("QUERY")), arg)
    fp = U.parse_qsl_first(F.try_parse_url(url, F.lit("REF")), arg)
    seg = U.percent_decode(
        F.try_element_at(
            F.split(F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")), "/"),
            arg.cast("int") + 1,
        )
    )
    return (
        F.when(rule_type == "query_param", qp)
        .when(rule_type == "fragment_param", fp)
        .when(rule_type == "path_segment", seg)
    )


def _clean_dynamic(
    raw: Column, remove_pattern: Column, space_pattern: Column, as_int: bool
) -> Column:
    """Dynamic clean_text/clean_int: pattern columns instead of literals
    (guarded — regexp_replace with a NULL pattern column returns null)."""
    cleaned = F.when(
        remove_pattern.isNotNull(),
        F.regexp_replace(raw, remove_pattern, F.lit("")),
    ).otherwise(raw)
    if as_int:
        # clean_int semantics exactly (parsers/utils/__init__.py:21-33 and
        # functions.text.clean_int): remove_pattern → trim → try_cast. No
        # space_pattern substitution and no whitespace collapse — clean_int
        # takes no space_pattern, so an int rule carrying one must behave
        # identically in every cascade plan.
        return F.trim(cleaned).try_cast("long")
    cleaned = F.when(
        space_pattern.isNotNull(),
        F.regexp_replace(cleaned, space_pattern, F.lit(" ")),
    ).otherwise(cleaned)
    # (?U)\s+ then trim: unicode-exact twin of clean_text (see text.py)
    return F.nullif(F.trim(F.regexp_replace(cleaned, r"(?U)\s+", " ")), F.lit(""))


_RULE_FIELDS = (
    "rule_order", "rule_type", "argument", "url_pattern",
    "remove_pattern", "space_pattern",
)

# the rule-struct DDL, derived from _RULE_FIELDS so the two never drift
_RULE_ARRAY_TYPE = (
    "array<struct<"
    + ",".join(
        f"{f}:{'int' if f == 'rule_order' else 'string'}" for f in _RULE_FIELDS
    )
    + ">>"
)


def apply_cascade_array(
    df,
    rules_df,
    url: Column,
    provider: Column,
    out_col: str = "query",
    as_int: bool = False,
    out_rule_col: str | None = None,
):
    """The ZERO-SHUFFLE scale plan: broadcast a per-provider ARRAY of rule
    structs (universal rules merged into every provider's array, global
    rule_order preserved by the sort), left-broadcast-join it onto the rows,
    then evaluate the whole first-match cascade as ONE projection with
    higher-order functions — transform(rules, r → cleaned extract) then
    first non-null. No groupBy, no join-back: the plan is scan → broadcast
    join → project, so it composes into any pipeline without adding an
    exchange (apply_cascade_join needs 3: winner agg + both join-back
    sides). Per-row cost is identical (rules-per-provider evaluations).
    Equality-tested against apply_cascade_join and compile_cascade on the
    reference's real rule tables."""
    spec = rules_df.where(F.col("provider_id").isNotNull())
    univ_rows = (
        rules_df.where(F.col("provider_id").isNull())
        .select(*_RULE_FIELDS)
        .collect()
    )

    def _lit_rule(r):
        return F.struct(
            *[
                (
                    F.lit(r[f]).alias(f)
                    if r[f] is not None
                    else F.lit(None).cast("int" if f == "rule_order" else "string").alias(f)
                )
                for f in _RULE_FIELDS
            ]
        )

    univ_arr = (
        F.array(*[_lit_rule(r) for r in univ_rows])
        if univ_rows
        else F.array().cast(_RULE_ARRAY_TYPE)
    )
    # sort each provider's rules ONCE in the pack aggregation (array_sort on
    # structs orders by the first field, rule_order) — the per-row plan used
    # to re-sort the concatenated array for every input row
    packed = spec.groupBy(F.col("provider_id").alias("_rp")).agg(
        F.array_sort(F.collect_list(F.struct(*_RULE_FIELDS))).alias("_prules")
    )
    # Per-row URL components hoisted OUT of the per-rule lambda: the old
    # plan re-ran lenient_url + try_parse_url(QUERY/REF/PATH) inside every
    # rule's branch (Catalyst does no CSE across higher-order-function
    # lambda invocations), so a row visited by k rules parsed its URL up to
    # k times. One projection per row now carries the sanitized URL, query
    # string, fragment and path segments; the rules only run the per-rule
    # match + qsl lookup over those.
    lenient = U.lenient_url(F.col("_url"))
    joined = (
        df.withColumn("_url", url)
        .withColumn("_prov", provider)
        .join(
            F.broadcast(packed), on=F.col("_prov") == F.col("_rp"), how="left"
        )
        .withColumn("_lu", lenient)
        .withColumn("_q", F.try_parse_url(F.col("_lu"), F.lit("QUERY")))
        .withColumn("_ref", F.try_parse_url(F.col("_lu"), F.lit("REF")))
        .withColumn(
            "_psegs",
            F.split(
                F.coalesce(
                    F.try_parse_url(F.col("_lu"), F.lit("PATH")), F.lit("")
                ),
                "/",
            ),
        )
    )
    # merge universal rules in, restore GLOBAL cascade order; with no
    # universal rules (the real url_query/url_page/url_offset tables) the
    # pre-sorted per-provider array is used as-is — no per-row sort/concat
    empty_arr = F.array().cast(_RULE_ARRAY_TYPE)
    if univ_rows:
        rules_arr = F.array_sort(
            F.concat(F.coalesce(F.col("_prules"), empty_arr), univ_arr)
        )
    else:
        rules_arr = F.coalesce(F.col("_prules"), empty_arr)

    # First-match via a SHORT-CIRCUITING fold (guide §1.2: fix the per-task
    # work once the job shape is right): the old filter(transform(rules))
    # plan evaluated EVERY rule for every row — pattern match, dynamic-regex
    # compile, qsl parse — and only then took element 0. aggregate() walks
    # the same rule order, but once the accumulator holds a hit the
    # when() guard skips the whole evaluation branch, so a row costs
    # (rules until first hit) instead of (all rules). Identical first-
    # non-null-by-rule_order semantics (equality-tested vs compile_cascade
    # and apply_cascade_join on the real tables).
    vtype = "long" if as_int else "string"
    zero = F.struct(
        F.lit(None).cast(vtype).alias("v"), F.lit(None).cast("int").alias("o")
    )

    def _step(acc, r):
        applicable = r["url_pattern"].isNull() | F.regexp_like(
            F.col("_url"), r["url_pattern"]
        )
        qp = U.parse_qsl_first(F.col("_q"), r["argument"])
        fp = U.parse_qsl_first(F.col("_ref"), r["argument"])
        seg = U.percent_decode(
            F.try_element_at(F.col("_psegs"), r["argument"].cast("int") + 1)
        )
        raw = (
            F.when(r["rule_type"] == "query_param", qp)
            .when(r["rule_type"] == "fragment_param", fp)
            .when(r["rule_type"] == "path_segment", seg)
        )
        cleaned = _clean_dynamic(
            raw, r["remove_pattern"], r["space_pattern"], as_int
        )
        val = F.when(applicable, cleaned).cast(vtype)
        return F.when(acc["v"].isNotNull(), acc).otherwise(
            F.struct(val.alias("v"), r["rule_order"].alias("o"))
        )

    # bind the fold result as a column so the v/o projections reference ONE
    # evaluation (CollapseProject keeps non-cheap aliased exprs unduplicated)
    out = joined.withColumn("_cacc", F.aggregate(rules_arr, zero, _step))
    first = F.col("_cacc")
    out = out.withColumn(out_col, first["v"])
    if out_rule_col is not None:
        # o is only meaningful when a rule actually hit (the fold leaves the
        # last TRIED rule's order behind on a miss)
        out = out.withColumn(
            out_rule_col, F.when(first["v"].isNotNull(), first["o"])
        )
    return out.drop(
        "_url", "_prov", "_rp", "_prules", "_lu", "_q", "_ref", "_psegs",
        "_cacc",
    )


def apply_cascade_join(
    df,
    rules_df,
    url: Column,
    provider: Column,
    id_col: str,
    out_col: str = "query",
    as_int: bool = False,
    out_rule_col: str | None = None,
):
    """The materialized-hits plan for large rule tables: broadcast the rule
    TABLE, equi-join provider-specific rules on provider_id (fan-out =
    rules-per-provider, typically 1-3), cross-join the few universal rules,
    evaluate ONE generic extraction expression, and keep the first (lowest
    rule_order) non-null parse per row via min_by — identical semantics to
    compile_cascade (tested), per-row cost O(matching rules), not O(all
    rules): the 600-rule unrolled coalesce measured ~0.85 ms/row; this plan
    is ~50× cheaper. Costs 3 exchanges (winner agg + join-back) — prefer
    apply_cascade_array (zero-shuffle) unless you want the hits relation
    itself."""
    keyed = df.withColumn("_url", url).withColumn("_prov", provider)
    # namespace the rule columns so they can never collide with df's own
    # (a caller's df legitimately has e.g. its own provider_id column)
    rules = rules_df.select(
        *[F.col(c).alias(f"_r_{c}") for c in rules_df.columns]
    )
    specific = keyed.join(
        F.broadcast(rules.where(F.col("_r_provider_id").isNotNull())),
        on=F.col("_prov") == F.col("_r_provider_id"),
        how="inner",
    )
    universal = keyed.crossJoin(
        F.broadcast(rules.where(F.col("_r_provider_id").isNull()))
    )
    cand = specific.unionByName(universal)
    applicable = F.col("_r_url_pattern").isNull() | F.expr(
        "_url rlike _r_url_pattern"
    )
    raw = _extract_dynamic(
        F.col("_url"), F.col("_r_rule_type"), F.col("_r_argument")
    )
    cleaned = _clean_dynamic(
        raw, F.col("_r_remove_pattern"), F.col("_r_space_pattern"), as_int
    )
    hits = cand.where(applicable & cleaned.isNotNull()).select(
        F.col(id_col), cleaned.alias("_val"), F.col("_r_rule_order")
    )
    aggs = [F.min_by("_val", "_r_rule_order").alias(out_col)]
    if out_rule_col is not None:
        # winning rule id = lowest rule_order among non-null parses — the
        # reference's first-match loop index (url_query.py:118-126)
        aggs.append(F.min("_r_rule_order").alias(out_rule_col))
    winners = hits.groupBy(id_col).agg(*aggs)
    return df.join(winners, on=id_col, how="left")


# our own fixture rule tables (shape-parity with the reference's url_query /
# url_page / url_offset tables; NOT copies of its 972-rule data file)
FIXTURE_QUERY_RULES = [
    UrlRule("query_param", "q", provider_id="alpha"),
    UrlRule(
        "query_param",
        "query",
        provider_id="beta",
        remove_pattern=r"^\*+",
    ),
    UrlRule("path_segment", 2, provider_id="gamma", url_pattern=r"/find/"),
    UrlRule("fragment_param", "q", provider_id="gamma"),
    UrlRule("query_param", "search"),  # any-provider fallback
]

FIXTURE_PAGE_RULES = [
    UrlRule("query_param", "page", provider_id="alpha"),
    UrlRule("query_param", "p", provider_id="beta", remove_pattern=r"[^0-9]"),
    UrlRule("path_segment", 3, provider_id="gamma", url_pattern=r"/find/"),
]
