"""Scalar function catalog (SURVEY.md §2.8).

The reference ships exactly three scalar operations: SUBSTR key
extraction (mapper.py:51), float cast (mapper.py:54) and string split
(mapper.py:47,50). This module keeps those (with SQL/Python semantics —
SURVEY.md §7.4 locks the canonical SUBSTR against the Node off-by-one at
mapper.js:44) and adds the vector/text kernels the extension operators
need.

Everything here is a *Column expression builder* — pure Catalyst, no
Python UDFs — so all of it stays inside whole-stage codegen and is
portable to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def substr_key(col: Column | str, length: int = 8) -> Column:
    """The reference's grouping key: SUBSTR(x, 1, length).

    Canonical Python/SQL semantics (reference mapper.py:51,
    ``data[0][:8]``); the Node variant's chars-2..9 off-by-one
    (mapper.js:44) is intentionally NOT reproduced (SURVEY.md §7.4).
    """
    return F.substring(F.col(col) if isinstance(col, str) else col, 1, length)


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> of non-empty tokens.

    Splits on ASCII whitespace (``\\s`` in both Java regex and DuckDB's
    RE2 — the cross-engine-portable choice). Note this intentionally
    diverges from Python ``str.split()``, which also splits on unicode
    whitespace (U+00A0 etc.); property tests pin the ASCII semantics.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def word_ngrams(tokens: Column, n: int) -> Column:
    """Word n-gram shingles from a token array, space-joined.

    Pure-Catalyst via iterated ``zip_with`` against shifted slices:
    the ``tokens`` expression is evaluated O(n) times per ROW. The
    naive formulation — ``transform(sequence(...), i -> slice(tokens,
    i, n))`` — re-evaluates ``tokens`` once per ELEMENT (Catalyst does
    no CSE into higher-order-function lambdas), which turns an O(T)
    shingling into O(T^2) per row; measured ~8x slower on the
    repetition gate. An array of T tokens yields max(T-n+1, 0)
    shingles.
    """
    count = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(0))
    grams = tokens
    for j in range(1, n):
        shifted = F.slice(
            tokens, j + 1, F.greatest(F.size(tokens) - F.lit(j), F.lit(0))
        )
        # null-propagating concat: tail entries (shorter shifted side)
        # become null and are cut by the final length-count slice
        grams = F.zip_with(
            grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.slice(grams, 1, count)


# ---------------------------------------------------------------------------
# SQL-text twins of the vector kernels (optimization round r13).
#
# Why text: every Column-builder call is one or more py4j round-trips,
# and the higher-order-function builders (zip_with/aggregate/transform)
# cost ~10-90 ms EACH at construction time. A literal-centroid ANN plan
# builds hundreds of them, so plan CONSTRUCTION — driver-side,
# single-threaded (guide §7.3) — dominated the literal-mode bench keys
# (measured 6.2 s of 16 s for similarity_pq_topk's encode pass alone).
# One F.expr(...) call parses the whole kernel server-side in ~0.5 ms.
# The parsed tree is the SAME expression the builders produced (same
# lambda shapes, same literal types — doubles rendered with repr(),
# which round-trips bit-exactly), so results are unchanged; only where
# the tree gets built moves.
# ---------------------------------------------------------------------------


def double_sql(x: float) -> str:
    """Bit-exact SQL double literal: repr() round-trips (shortest
    uniquely-parsing decimal), 'D' marks DOUBLE where no exponent
    already does."""
    r = repr(float(x))
    return r if ("e" in r or "E" in r or "inf" in r or "nan" in r) else r + "D"


def array_sql(values) -> str:
    """array(...) literal text of doubles."""
    return "array(" + ", ".join(double_sql(v) for v in values) + ")"


def dot_sql(a: str, b: str) -> str:
    """SQL-text twin of :func:`dot` — identical fold shape."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
        "(acc, v) -> acc + v)"
    )


def l2_norm_sql(a: str) -> str:
    """SQL-text twin of :func:`l2_norm`."""
    return f"sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + v * v))"


def cosine_sql(
    a: str, b: str, norm_a: str | None = None, norm_b: str | None = None
) -> str:
    """SQL-text twin of :func:`cosine_similarity`.

    ``norm_a``/``norm_b`` are pre-staged SQL texts (a column name, or
    a folded double literal) holding the corresponding
    ``l2_norm_sql`` value: Catalyst does no CSE into higher-order-
    function lambdas AND does not constant-fold ``aggregate`` over
    literal arrays (verified on the physical plan), so a caller
    ranking one vector against N candidate literals otherwise re-folds
    BOTH norms N times per row. The division tree is unchanged —
    ``dot / (norm_a * norm_b)`` with the identical fold producing each
    staged norm — so results are bit-identical."""
    na = norm_a if norm_a is not None else l2_norm_sql(a)
    nb = norm_b if norm_b is not None else l2_norm_sql(b)
    return f"({dot_sql(a, b)} / ({na} * {nb}))"


def l2_norm_py(vec) -> float:
    """Python twin of the ``l2_norm_sql`` fold, for pre-folding a
    LITERAL vector's norm at plan-construction time: the identical
    strict left fold (acc + v*v over IEEE doubles, then a correctly-
    rounded sqrt), so the result is bit-identical to evaluating the
    SQL fold over the same literal array."""
    import math

    acc = 0.0
    for v in vec:
        v = float(v)
        acc = acc + v * v
    return math.sqrt(acc)


def l2sq_sql(a: str, b: str) -> str:
    """SQL-text squared-L2 fold (the _l2sq_lit/_l2sq_col shape)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def dot(a: Column, b: Column) -> Column:
    """Vector dot product over two array<numeric> columns.

    ``zip_with`` + ``aggregate`` — stays JVM-side (no Python), which is
    the difference between a scan-bound and a serialization-bound
    similarity search at 100TB.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (JVM-side)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def url_canonicalize(url: Column | str) -> Column:
    """Canonical URL form for web-corpus dedup and per-domain
    accounting (the Common-Crawl-pipeline normalization step):
    drop the fragment, strip an http/https scheme (any case) and a
    leading ``www.``, drop explicit default ports (:80/:443),
    lowercase the host, drop any trailing run of ``?``/``/`` chars
    (one class-strip keeps the function IDEMPOTENT — sequential
    single-char strips are not: ``a?/`` needs the slash gone before
    the ``?`` is visible; property-tested).

    Pure portable regex — no lookarounds, no group backrefs (Java
    ``$1`` vs RE2 ``\\1`` would diverge) — so the DuckDB oracle can
    replay it with the same patterns. Query-parameter reordering and
    tracking-param stripping are deliberately out of scope: they need
    a parse, not a regex, and belong in a mapInPandas kernel.
    """
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"(?i)^https?://", "")
    u = F.regexp_replace(u, r"(?i)^www\.", "")
    # default ports: mid-URL via literal replace, trailing via anchor
    u = F.replace(u, F.lit(":80/"), F.lit("/"))
    u = F.replace(u, F.lit(":443/"), F.lit("/"))
    u = F.regexp_replace(u, r":(80|443)$", "")
    # lowercase the host (everything before the first '/'), keep the
    # path's case
    slash = F.instr(u, "/")
    host = F.when(slash > 0, F.substring_index(u, "/", 1)).otherwise(u)
    path = F.when(slash > 0, F.substr(u, slash)).otherwise(F.lit(""))
    u = F.concat(F.lower(host), path)
    return F.regexp_replace(u, r"[?/]+$", "")


def url_domain(canon_url: Column | str) -> Column:
    """Host (sans port) of an already-canonicalized URL — the
    per-domain grouping key for caps and mixture accounting."""
    u = F.col(canon_url) if isinstance(canon_url, str) else canon_url
    return F.substring_index(F.substring_index(u, "/", 1), ":", 1)
