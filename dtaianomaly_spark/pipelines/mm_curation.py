"""Cross-modal curation funnel: the decision a MULTIMODAL training-data
pipeline actually makes — one keep/drop verdict per document from all
of its modalities at once. Per doc it combines

- text shape (exact integer char/space/digit counts, expression-only),
- PII exposure (the ``pipelines/text.pii_redact`` regex counts),
- decoded IMAGE brightness (real PNG decode via
  ``multimodal.image_stats_decoded`` — all five unfilter paths),
- decoded AUDIO energy (real WAV decode via
  ``audio.audio_stats_decoded``),

then aggregates per source: docs seen, docs kept, and which modality
rule rejected the rest. Every rule is an INTEGER inequality (ratio
thresholds cleared of division), so the DuckDB oracle — which
re-derives the image/audio statistics from the payloads' closed-form
formulas and re-runs the PII regexes — matches bit-exactly
(``mm_curation_funnel``).

At scale: the three decode branches are map-only Arrow stages over the
same doc_id-keyed scan; the joins are equi-joins on doc_id (AQE picks
broadcast at small SF, sort-merge co-partitioned at 100 TB) and the
final per-source rollup is a tiny aggregate. Payload bytes never
shuffle — only the per-doc integer stats do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Integer keep rules (ratio thresholds written division-free):
#   text : digit ratio < 1/4       -> digits * 4 < chars
#          word count >= MIN_WORDS -> spaces + 1 >= MIN_WORDS
#   pii  : at most one contactable item (emails + phones)
#   image: mean pixel in [PX_MEAN_LO, PX_MEAN_HI] -> bounds * n_px
#   audio: mean square sample >= MEANSQ_MIN (clip not near-silent)
MIN_WORDS = 20
PX_MEAN_LO, PX_MEAN_HI = 120, 135
MEANSQ_MIN = 1_330_000  # uniform [-2000, 2000] has E[v^2] ~ 1.334e6


def multimodal_curation_funnel(docs: DataFrame) -> DataFrame:
    """Per-source keep/drop tallies from all four modality rules."""
    from dtaianomaly_spark.pipelines import audio as AU
    from dtaianomaly_spark.pipelines import multimodal as MM
    from dtaianomaly_spark.pipelines import text as TX

    txt = docs.select(
        "doc_id", "source",
        F.length("text").cast("long").alias("chars"),
        F.expr(
            "CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)"
        ).alias("spaces"),
        F.expr(
            "CAST(length(text) -"
            " length(regexp_replace(text, '[0-9]', '')) AS BIGINT)"
        ).alias("digits"),
    )
    pii = TX.pii_redact(docs).select("doc_id", "n_emails", "n_phones")
    img = MM.image_stats_decoded(MM.with_png_payload(docs)).select(
        "doc_id", "h", "w", "px_sum"
    )
    aud = AU.audio_stats_decoded(AU.with_wav_payload(docs)).select(
        "doc_id", "n_samples", "n_channels", "s_sq_sum"
    )

    flag = lambda c: F.when(c, F.lit(1)).otherwise(F.lit(0))  # noqa: E731
    j = (
        txt.join(pii, "doc_id").join(img, "doc_id").join(aud, "doc_id")
        .select(
            "source",
            flag(
                (F.col("digits") * 4 < F.col("chars"))
                & (F.col("spaces") + 1 >= MIN_WORDS)
            ).alias("text_ok"),
            flag(F.col("n_emails") + F.col("n_phones") <= 1).alias("pii_ok"),
            flag(
                (F.col("px_sum") >= PX_MEAN_LO * F.col("h") * F.col("w") * 3)
                & (F.col("px_sum") <= PX_MEAN_HI * F.col("h") * F.col("w") * 3)
            ).alias("img_ok"),
            flag(
                F.col("s_sq_sum")
                >= MEANSQ_MIN * F.col("n_samples") * F.col("n_channels")
            ).alias("audio_ok"),
        )
    )
    return j.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            F.col("text_ok") * F.col("pii_ok") * F.col("img_ok")
            * F.col("audio_ok")
        ).cast("long").alias("n_keep"),
        F.sum(1 - F.col("text_ok")).cast("long").alias("n_text_fail"),
        F.sum(1 - F.col("pii_ok")).cast("long").alias("n_pii_fail"),
        F.sum(1 - F.col("img_ok")).cast("long").alias("n_img_fail"),
        F.sum(1 - F.col("audio_ok")).cast("long").alias("n_audio_fail"),
    )
