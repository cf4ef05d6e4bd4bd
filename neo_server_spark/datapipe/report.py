"""Dataset-card generation: one aggregated profile of a document corpus,
composed from the datapipe operators (counts, size, language mix, quality
and length distributions, duplication rates) — the summary a training-data
release ships alongside the shards ("Datasheets for Datasets", Gebru et
al. 2021).

Every section is a small aggregate over an operator output the engine
already computes distributively; the card itself is driver-side markdown
over O(sources + languages) rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from . import text

__all__ = ["corpus_profile", "dataset_card"]


def corpus_profile(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> dict[str, DataFrame]:
    """The card's sections as DataFrames (each one aggregate job):
    totals, per-source, per-language, quality quantiles, duplication."""
    toks = F.expr(f"filter(split({text_col}, ' '), t -> t != '')")
    totals = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(text_col)).alias("n_chars"),
        F.sum(F.size(toks)).alias("n_tokens"),
    )
    by_source = (docs.groupBy("source")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum(F.size(toks)).alias("n_tokens"))
                 .orderBy("source")) if "source" in docs.columns else None
    by_lang = (docs.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n_docs"))
               .orderBy(F.desc("n_docs"), "lang")) \
        if "lang" in docs.columns else None
    q = text.quality_score(docs, text_col=text_col).agg(
        F.round(F.expr("percentile(quality, 0.1)"), 4).alias("q10"),
        F.round(F.expr("percentile(quality, 0.5)"), 4).alias("q50"),
        F.round(F.expr("percentile(quality, 0.9)"), 4).alias("q90"))
    lens = docs.agg(
        F.min(F.length(text_col)).alias("min_chars"),
        F.round(F.expr(f"percentile(length({text_col}), 0.5)"), 1)
        .alias("med_chars"),
        F.max(F.length(text_col)).alias("max_chars"))
    dup = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.md5(F.col(text_col))).alias("n_distinct"))
    return {"totals": totals, "by_source": by_source, "by_lang": by_lang,
            "quality": q, "lengths": lens, "dup": dup}


def dataset_card(docs: DataFrame, name: str = "corpus",
                 text_col: str = "text", id_col: str = "doc_id") -> str:
    """Render the profile as a markdown dataset card."""
    p = corpus_profile(docs, text_col=text_col, id_col=id_col)
    t = p["totals"].first()
    d = p["dup"].first()
    q = p["quality"].first()
    ln = p["lengths"].first()
    lines = [
        f"# Dataset card: {name}",
        "",
        "## Size",
        f"- documents: {t['n_docs']}",
        f"- characters: {t['n_chars']}",
        f"- whitespace tokens: {t['n_tokens']}",
        "",
        "## Duplication",
        f"- exact-duplicate rate: "
        f"{1 - d['n_distinct'] / max(d['n'], 1):.4f} "
        f"({d['n'] - d['n_distinct']} of {d['n']})",
        "",
        "## Quality score (C4-style heuristic, 0..1)",
        f"- p10 / median / p90: {q['q10']} / {q['q50']} / {q['q90']}",
        "",
        "## Document length (chars)",
        f"- min / median / max: {ln['min_chars']} / {ln['med_chars']} / "
        f"{ln['max_chars']}",
    ]
    if p["by_source"] is not None:
        lines += ["", "## Sources", "| source | docs | tokens |",
                  "|---|---|---|"]
        lines += [f"| {r['source']} | {r['n_docs']} | {r['n_tokens']} |"
                  for r in p["by_source"].collect()]
    if p["by_lang"] is not None:
        lines += ["", "## Languages", "| lang | docs |", "|---|---|"]
        lines += [f"| {r['lang']} | {r['n_docs']} |"
                  for r in p["by_lang"].collect()]
    return "\n".join(lines) + "\n"
