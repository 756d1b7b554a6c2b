"""Property tests (SURVEY.md §5): the Catalyst scalar kernels must
match their plain-Python reference semantics on arbitrary inputs, and
the salted aggregation must be exactly equivalent to the direct one.

Hypothesis drives small batches through one Spark job per example;
max_examples is kept low because each example is a JVM round-trip."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.functions.scalar import (
    substr_key,
    tokenize,
    word_ngrams,
)
from lambda_refarch_mapreduce_spark.partitioning import salted_agg

# printable-ish text incl. whitespace runs and unicode
TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    max_size=80,
)

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_tokens(s: str) -> list[str]:
    # ASCII-whitespace split: the portable semantics tokenize() pins
    # (Java regex \s == RE2 \s == re.ASCII \s; Python str.split() would
    # additionally split on unicode whitespace like U+00A0)
    import re

    return [t for t in re.split(r"\s+", s, flags=re.ASCII) if t]


@given(texts=st.lists(TEXT, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_tokenize_matches_python_split(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {r.i: r.toks for r in df.select("i", tokenize("t").alias("toks")).collect()}
    for i, t in enumerate(texts):
        # Spark's \s+ regex splits the same token boundaries as
        # Python str.split() for ASCII whitespace; both drop empties
        assert got[i] == _py_tokens(t), (t, got[i])


@given(
    texts=st.lists(st.text(alphabet="ab c", max_size=40), min_size=1, max_size=6),
    n=st.integers(min_value=1, max_value=4),
)
@settings(**SETTINGS)
def test_word_ngrams_matches_reference(spark, texts, n):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r.i: r.g
        for r in df.select("i", word_ngrams(tokenize("t"), n).alias("g")).collect()
    }
    for i, t in enumerate(texts):
        toks = _py_tokens(t)
        want = [" ".join(toks[j : j + n]) for j in range(max(len(toks) - n + 1, 0))]
        assert got[i] == want, (t, n, got[i], want)


@given(s=st.text(max_size=20), length=st.integers(min_value=1, max_value=12))
@settings(**SETTINGS)
def test_substr_key_matches_python_slice(spark, s, length):
    df = spark.createDataFrame([(s,)], "s string")
    got = df.select(substr_key("s", length).alias("k")).collect()[0].k
    assert got == s[:length]


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_salted_agg_equals_direct_agg(spark, rows):
    df = spark.createDataFrame(rows, "k string, v double")
    direct = {
        r.k: (r.n, round(r.total, 6))
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        r.k: (r.n, round(r.total, 6))
        for r in salted_agg(
            df,
            keys=["k"],
            aggs={
                "n": (F.count(F.lit(1)), F.sum("n")),
                "total": (F.sum("v"), F.sum("total")),
            },
            n_salts=4,
        ).collect()
    }
    assert salted == direct


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(**SETTINGS)
def test_quantize_roundtrip_error_bound(spark, vecs):
    """int8 quantization invariants on arbitrary vectors: |q_i| <= 127,
    dequantization error <= scale/2 (+ float eps), zero vectors map to
    scale 0 / all-zero q."""
    from lambda_refarch_mapreduce_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id int, embedding array<double>"
    )
    for r in quantize_embeddings(df, "vec_id", "embedding").collect():
        src = vecs[r.vec_id]
        if max(abs(x) for x in src) == 0.0:
            assert r.scale == 0.0 and all(q == 0 for q in r.q)
            continue
        assert all(abs(q) <= 127 for q in r.q)
        # rounded outputs: compare against the unrounded bound + rounding slack
        assert r.max_abs_err <= r.scale / 2 + r.scale * 1e-9 + 1e-6


@given(texts=st.lists(TEXT, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_paragraph_dedup_conservation(spark, texts):
    """Corpus-wide invariants on arbitrary text: every distinct
    non-blank paragraph survives exactly once across the corpus, and
    per-doc kept <= total."""
    from lambda_refarch_mapreduce_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    out = paragraph_dedup(df, "doc_id", "text").collect()
    assert all(r.n_kept <= r.n_paras for r in out)
    kept_paras = [
        p for r in out if r.text_deduped for p in r.text_deduped.split("\n")
    ]
    assert len(kept_paras) == len(set(kept_paras))  # no survivor twice
    # blankness = Spark trim semantics (ASCII space 0x20 ONLY — \t,
    # \r, \x1f all survive trim), not Python str.strip()
    distinct_input = {
        p for t in texts for p in t.split("\n") if p.strip(" ") != ""
    }
    assert set(kept_paras) == distinct_input


# URL-shaped strings: optional scheme/www/port/path/fragment noise
URLISH = st.builds(
    lambda scheme, www, host, port, path, slash, frag: (
        scheme + www + host + port + path + slash + frag
    ),
    scheme=st.sampled_from(["", "http://", "https://", "HTTPS://", "HtTp://"]),
    www=st.sampled_from(["", "www.", "WWW."]),
    host=st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.from_regex(r"(/[A-Za-z0-9_.\-]{0,8}){0,3}", fullmatch=True),
    slash=st.sampled_from(["", "/"]),
    frag=st.sampled_from(["", "#x", "#frag/with/slash"]),
)


@given(urls=st.lists(URLISH, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_url_canonicalize_idempotent(spark, urls):
    """Canonicalization is a projection: applying it twice equals
    applying it once, on arbitrary URL-shaped strings."""
    from lambda_refarch_mapreduce_spark.functions.scalar import url_canonicalize

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i int, url string"
    )
    rows = df.select(
        "i",
        url_canonicalize("url").alias("once"),
        url_canonicalize(url_canonicalize("url")).alias("twice"),
    ).collect()
    for r in rows:
        assert r.once == r.twice, (urls[r.i], r.once, r.twice)


def _py_z(a: int, b: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z |= ((a >> j) & 1) << (2 * j)
        z |= ((b >> j) & 1) << (2 * j + 1)
    return z


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1023),
            st.integers(min_value=0, max_value=1023),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_z_value_matches_reference_interleave(spark, pairs):
    """partitioning.z_value must equal the plain-Python Morton
    interleave (which is bijective on the bits x bits grid), so
    range-partitioning on it is a faithful Z-order layout."""
    from lambda_refarch_mapreduce_spark.partitioning import z_value

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], "i long, a long, b long"
    )
    got = {
        r.i: r.z
        for r in df.select(
            "i", z_value(F.col("a"), F.col("b"), 10).alias("z")
        ).collect()
    }
    want = {i: _py_z(a, b, 10) for i, (a, b) in enumerate(pairs)}
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),  # order key
            st.integers(min_value=-50, max_value=50),      # weight a
        ),
        min_size=1,
        max_size=40,
    ),
    partitions=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_prefix_sums_and_global_rank_match_reference(spark, rows, partitions):
    """The two-phase distributed machinery must be EXACTLY the
    single-machine answer on arbitrary inputs and partition counts:
    global_rank = 1..n under the (k, uid) total order, prefix_sums =
    the inclusive running sum — including duplicate keys (tie-broken
    by uid), negative weights, and partition counts exceeding the row
    count."""
    from lambda_refarch_mapreduce_spark.operators.relational import (
        global_rank,
        prefix_sums,
    )

    data = [(i, k, w) for i, (k, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "uid int, k int, w int")
    order = [F.col("k"), F.col("uid")]
    got_rank = {
        r.uid: r.global_rank
        for r in global_rank(df, order, partitions=partitions).collect()
    }
    got_cum = {
        r.uid: r.w_cum
        for r in prefix_sums(df, order, ["w"], partitions=partitions).collect()
    }
    ref = sorted(data, key=lambda t: (t[1], t[0]))
    run = 0
    for rank, (uid, _k, w) in enumerate(ref, start=1):
        run += w
        assert got_rank[uid] == rank, (uid, rank)
        assert got_cum[uid] == run, (uid, run)


@given(
    ivals=st.lists(
        st.tuples(
            st.sampled_from(["g", "h"]),
            st.integers(min_value=-50, max_value=120),
            st.integers(min_value=0, max_value=60),
        ),
        min_size=1,
        max_size=14,
    ),
    width=st.integers(min_value=1, max_value=24),
)
@settings(**SETTINGS)
def test_interval_overlap_join_matches_bruteforce_property(
    spark, ivals, width
):
    """interval_overlap_join on ARBITRARY keyed integer intervals
    (negative starts, zero lengths, arbitrary bucket widths) returns
    exactly the brute-force inclusive-overlap pair set, each pair
    once — the canonical-bucket dedup and the integer floor-division
    bucketing hold for every input, not just the curated cases."""
    from lambda_refarch_mapreduce_spark.operators.relational import (
        interval_overlap_join,
    )

    rows = [
        (i, g, s, s + ln) for i, (g, s, ln) in enumerate(ivals)
    ]
    df = spark.createDataFrame(rows, "k long, g string, s long, e long")
    left = df.select(
        "g", F.col("k").alias("ka"), F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    right = df.select(
        "g", F.col("k").alias("kb"), F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    out = interval_overlap_join(
        left, right, ["g"], "sa", "ea", "sb", "eb", width,
        max_fanout=None,
    ).filter(F.col("ka") < F.col("kb"))
    got = sorted((r.ka, r.kb) for r in out.collect())
    want = sorted(
        (a[0], b[0])
        for a in rows
        for b in rows
        if a[1] == b[1] and a[0] < b[0] and a[2] <= b[3] and b[2] <= a[3]
    )
    assert got == want


@given(
    a_vals=st.lists(
        st.integers(min_value=-30, max_value=30), min_size=1, max_size=20
    ),
    b_vals=st.lists(
        st.integers(min_value=-30, max_value=30), min_size=1, max_size=20
    ),
    grid=st.sampled_from([4, 10]),
)
@settings(**SETTINGS)
def test_qq_quantile_table_property(spark, a_vals, b_vals, grid):
    """qq_quantile_table's Type-1 quantiles on arbitrary integer
    multisets (duplicates, negatives, unequal group sizes) equal the
    brute-force smallest-value-reaching-the-CDF-target definition at
    every interior grid point."""
    from lambda_refarch_mapreduce_spark.operators.analytics import (
        qq_quantile_table,
    )

    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r.grid_i: (r.q_a, r.q_b)
        for r in qq_quantile_table(df, "a", "b", "g", "v", grid).collect()
    }

    def q1(vals, i):
        sv = sorted(vals)
        n = len(sv)
        for idx, v in enumerate(sv):
            if (idx + 1) * grid >= i * n:
                return v
        return sv[-1]

    assert set(got) == set(range(1, grid))
    for i in range(1, grid):
        assert got[i] == (q1(a_vals, i), q1(b_vals, i)), i


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=-5, max_value=5),
        ),
        min_size=2,
        max_size=16,
    ),
)
@settings(**SETTINGS)
def test_spearman_rho_matches_reference_property(spark, pairs):
    """spearman_rho on arbitrary small integer multisets (heavy ties
    by construction) equals the numpy average-rank Pearson — or is
    NULL exactly when a variable is constant."""
    import numpy as np

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        spearman_rho,
    )

    df = spark.createDataFrame(pairs, "x long, y long")
    got = spearman_rho(df, "x", "y").collect()[0]
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]

    def avg_ranks(v):
        v = np.asarray(v, dtype=float)
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v))
        i = 0
        sv = v[order]
        while i < len(v):
            j = i
            while j < len(v) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return ranks

    assert got.n_rows == len(pairs)
    if len(set(xs)) == 1 or len(set(ys)) == 1:
        assert got.rho is None
    else:
        want = float(np.corrcoef(avg_ranks(xs), avg_ranks(ys))[0, 1])
        assert abs(got.rho - want) < 1e-6


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=-4, max_value=4),
            st.integers(min_value=-4, max_value=4),
        ),
        min_size=2,
        max_size=12,
    ),
)
@settings(**SETTINGS)
def test_kendall_tau_b_matches_reference_property(spark, pairs):
    """kendall_tau_b on arbitrary small integer series (heavy ties by
    construction) equals the O(n^2) textbook computation — including
    the NULL tau for an all-tied variable (zero denominator)."""
    import math
    from collections import Counter

    from lambda_refarch_mapreduce_spark.operators.analytics import (
        kendall_tau_b,
    )

    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    got = kendall_tau_b(df, "k", "a", "b").collect()[0]

    n = len(rows)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            d = (rows[j][1] - rows[i][1]) * (rows[j][2] - rows[i][2])
            conc += d > 0
            disc += d < 0
    n0 = n * (n - 1) // 2
    n1 = sum(
        c * (c - 1) // 2 for c in Counter(r[1] for r in rows).values()
    )
    n2 = sum(
        c * (c - 1) // 2 for c in Counter(r[2] for r in rows).values()
    )
    assert (got.concordant, got.discordant) == (conc, disc)
    assert (got.n_obs, got.n_pairs) == (n, n0)
    if (n0 - n1) * (n0 - n2) <= 0:
        assert got.tau_b is None
    else:
        want = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
        assert abs(got.tau_b - want) < 1e-6


# r14 fast-tier: hypothesis property sweeps are one JVM round-trip per
# example — minutes per test. Round close runs them via `-m ""`.
import pytest  # noqa: E402

pytestmark = pytest.mark.slow
