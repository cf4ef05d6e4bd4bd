"""Deterministic sampling for training-data pipelines.

A 100 TB corpus is sampled by *content hash*, not RNG: the keep/drop decision
for a row is a pure function of its id (plus a seed salt), so the sample is
reproducible across runs, engines, cluster sizes, and partitionings — and a
re-run after appending data keeps every previously-selected row.  This is the
standard trick for stable train/validation splits at scale.

Mechanism: ``md5(id || seed)`` is uniform over hex strings; keeping rows whose
first 8 hex chars are <= ``floor(fraction * 16^8)`` (as a zero-padded hex
literal, compared lexicographically — identical ordering in any engine) keeps
an expected ``fraction`` of rows.  Everything is a JVM-side expression: the
filter rides the scan, no shuffle, no RNG state.

No reference counterpart (machbase/neo-server has no sampling operator) —
beyond-reference training-data surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: width of the hash prefix used for thresholding (8 hex chars = 32 bits —
#: granularity 2.3e-10, plenty for any practical sampling fraction)
_PREFIX = 8


def sample_threshold(fraction: float) -> str:
    """Zero-padded lowercase hex threshold for ``fraction`` of the 32-bit
    hash-prefix space.  Exposed so oracle SQL can embed the same literal."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(int(fraction * (16 ** _PREFIX)) - 1, f"0{_PREFIX}x") if fraction > 0 else ""


def _hash_prefix(id_col: Column | str, seed: str) -> Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(F.concat(c.cast("string"), F.lit(seed))), 1, _PREFIX)


def hash_sample(df: DataFrame, fraction: float, id_col: str = "doc_id",
                seed: str = "") -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows keyed by ``id_col``.

    Different ``seed`` values give independent samples (e.g. train/val/test
    splits from disjoint seeds-and-complements).  The predicate is a scan-side
    filter — zero shuffle at any scale.
    """
    thr = sample_threshold(fraction)
    if not thr:
        return df.filter(F.lit(False))
    return df.filter(_hash_prefix(id_col, seed) <= F.lit(thr))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      by: str = "lang", id_col: str = "doc_id",
                      seed: str = "", default: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions[stratum]`` of each
    ``by``-group, e.g. downsample dominant languages while keeping all of a
    rare one.  One CASE expression — still a pure scan-side filter, no
    per-group shuffle or window."""
    prefix = _hash_prefix(id_col, seed)
    thr: Column = F.lit(sample_threshold(default))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(F.col(by) == stratum, F.lit(sample_threshold(frac))).otherwise(thr)
    return df.filter((thr != F.lit("")) & (prefix <= thr))


def split(df: DataFrame, weights: dict[str, float], id_col: str = "doc_id",
          seed: str = "") -> dict[str, DataFrame]:
    """Disjoint, exhaustive, deterministic train/val/test split.

    ``weights`` are relative (normalized internally); each row lands in
    exactly one part based on which band of the hash-prefix space it falls
    in.  Stable under appends and re-partitioning.
    """
    total = sum(weights.values())
    prefix = _hash_prefix(id_col, seed)
    out: dict[str, DataFrame] = {}
    cum = 0.0
    items = list(weights.items())
    for i, (name, w) in enumerate(items):
        lo = sample_threshold(cum / total) if cum > 0 else ""
        cum += w
        hi = sample_threshold(1.0 if i == len(items) - 1 else cum / total)
        cond = prefix <= F.lit(hi)
        if lo:
            cond = cond & (prefix > F.lit(lo))
        out[name] = df.filter(cond)
    return out
