"""Scratch experiment: timing variants of the near-dup pipeline at sf0.1.

Variants:
  1. verify join strategy: shuffle_hash (current) vs broadcast doc arrays
  2. exact-duplicate contraction (collapse identical token sets to a
     representative before the quadratic stage, expand after)

Run: python tools/exp_variants.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CACHE", "1")

from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark import (
    get_spark,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
    dedup,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    load_table,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn, n=2):
    best = None
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:55s} {best:7.2f}s  {out}")
    return out


def verify_broadcast(pairs, tok_arrays, threshold):
    a = F.broadcast(
        tok_arrays.select(
            F.col("doc_id").alias("doc_a"),
            F.col("tokens").alias("tokens_a"),
            F.col("set_size").alias("size_a"),
        )
    )
    b = F.broadcast(
        tok_arrays.select(
            F.col("doc_id").alias("doc_b"),
            F.col("tokens").alias("tokens_b"),
            F.col("set_size").alias("size_b"),
        )
    )
    shared = F.size(F.array_intersect("tokens_a", "tokens_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            shared.alias("shared"),
            (shared / (F.col("size_a") + F.col("size_b") - shared)).alias("jaccard"),
        )
        .filter((F.col("jaccard") >= threshold) & (F.col("shared") >= 1))
        .select("doc_a", "doc_b", "jaccard")
    )


def main():
    spark = get_spark("exp")
    docs = load_table(spark, SF, "documents")
    docs.count()

    tok = dedup._token_sets(docs)
    arrays = dedup._token_arrays(tok)

    # candidate set, materialized once so verify timing is isolated
    sig = dedup._minhash_signature(tok)
    rows_per_band = dedup.N_HASHES // dedup.N_BANDS
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("signature")[i].cast("string")
                                for i in range(
                                    b * rows_per_band, (b + 1) * rows_per_band
                                )
                            ],
                        )
                    )
                    for b in range(dedup.N_BANDS)
                ]
            )
        ).alias("band", "band_key"),
    )
    b1 = bands.alias("b1")
    b2 = bands.alias("b2")
    cand = (
        b1.join(
            b2,
            (F.col("b1.band") == F.col("b2.band"))
            & (F.col("b1.band_key") == F.col("b2.band_key")),
        )
        .filter(F.col("b1.doc_id") < F.col("b2.doc_id"))
        .select(F.col("b1.doc_id").alias("doc_a"), F.col("b2.doc_id").alias("doc_b"))
        .distinct()
        .localCheckpoint()
    )
    print("candidates:", cand.count())

    t("verify shuffle_hash (current)",
      lambda: dedup._verify_pairs_exact(cand, arrays, 0.5).count())
    t("verify broadcast arrays",
      lambda: verify_broadcast(cand, arrays, 0.5).count())

    # ---- contraction stats -------------------------------------------
    groups = (
        tok.groupBy("doc_id")
        .agg(F.sort_array(F.collect_set(F.xxhash64("token"))).alias("toks"))
        .groupBy("toks")
        .agg(F.min("doc_id").alias("rep"), F.collect_list("doc_id").alias("members"))
        .localCheckpoint()
    )
    print("distinct token sets:", groups.count())

    rep_tok = groups.select(F.col("rep").alias("doc_id"), F.explode("toks").alias("token"))

    def contracted_band_join():
        rsig = (
            rep_tok.groupBy("doc_id")
            .agg(
                *[
                    F.min(F.xxhash64(F.concat(F.lit(f"mh{i}:"), F.col("token").cast("string")))).alias(f"h{i}")
                    for i in range(dedup.N_HASHES)
                ]
            )
            .select(
                "doc_id",
                F.array(*[F.col(f"h{i}") for i in range(dedup.N_HASHES)]).alias(
                    "signature"
                ),
            )
        )
        rbands = rsig.select(
            "doc_id",
            F.posexplode(
                F.array(
                    *[
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("signature")[i].cast("string")
                                    for i in range(
                                        b * rows_per_band, (b + 1) * rows_per_band
                                    )
                                ],
                            )
                        )
                        for b in range(dedup.N_BANDS)
                    ]
                )
            ).alias("band", "band_key"),
        )
        x = rbands.alias("b1")
        y = rbands.alias("b2")
        return (
            x.join(
                y,
                (F.col("b1.band") == F.col("b2.band"))
                & (F.col("b1.band_key") == F.col("b2.band_key")),
            )
            .filter(F.col("b1.doc_id") < F.col("b2.doc_id"))
            .select(
                F.col("b1.doc_id").alias("doc_a"), F.col("b2.doc_id").alias("doc_b")
            )
            .distinct()
            .count()
        )

    t("contracted band join + distinct (reps only)", contracted_band_join, n=1)

    # contracted inverted-index jaccard (rep level only, no expansion)
    def contracted_jaccard():
        sizes = rep_tok.groupBy("doc_id").agg(F.count("*").alias("set_size"))
        t1 = rep_tok.alias("t1")
        t2 = rep_tok.alias("t2")
        shared = (
            t1.join(t2, F.col("t1.token") == F.col("t2.token"))
            .filter(F.col("t1.doc_id") < F.col("t2.doc_id"))
            .groupBy(F.col("t1.doc_id").alias("doc_a"), F.col("t2.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("shared"))
        )
        s1 = sizes.alias("s1")
        s2 = sizes.alias("s2")
        jac = F.col("shared") / (
            F.col("s1.set_size") + F.col("s2.set_size") - F.col("shared")
        )
        return (
            shared.join(s1, F.col("doc_a") == F.col("s1.doc_id"))
            .join(s2, F.col("doc_b") == F.col("s2.doc_id"))
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= 0.9)
            .count()
        )

    t("contracted inverted-index jaccard (reps, no expand)", contracted_jaccard, n=1)
    t("current full jaccard (count)",
      lambda: dedup.ngram_jaccard_pairs(spark, SF).count(), n=1)

    spark.stop()


if __name__ == "__main__":
    main()
