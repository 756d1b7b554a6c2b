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

    Pure-Catalyst: transform over an index sequence + slice. An array of
    T tokens yields max(T-n+1, 0) shingles; used by the n-gram Jaccard
    and MinHash dedup operators. O(T) per row, no shuffle.
    """
    count = F.size(tokens) - F.lit(n - 1)
    # sequence(1, 0) is DESCENDING [1, 0] in Spark — guard short docs
    # (fewer than n tokens) to an explicit empty shingle list instead.
    idx = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.array_join(F.slice(tokens, i, n), " "))


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
