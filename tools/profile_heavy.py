"""One-off stage-level profiler for the heavy bench entries (sf0.1).

Times each internal stage of dedup_minhash_lsh / dedup_clusters /
dedup_jaccard_pairs so optimization targets the real bottleneck.
Not part of the driver contract; run manually:
    python tools/profile_heavy.py
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


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:45s} {dt:7.2f}s  {out}")
    return out


def main():
    spark = get_spark("profile")
    docs = load_table(spark, SF, "documents")
    docs.count()  # buffer pool warm

    # --- minhash stages -----------------------------------------------
    tok = dedup._token_sets(docs)
    t("tokenize count", lambda: tok.count())
    sig = dedup._minhash_signature(tok)
    t("signatures count", lambda: sig.count())

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
    )
    t("band join + distinct count", lambda: cand.count())
    cand_ck = t("candidates localCheckpoint", lambda: cand.localCheckpoint())
    arrays = dedup._token_arrays(tok)
    t("token arrays count", lambda: arrays.count())
    ver = dedup._verify_pairs_exact(cand_ck, arrays, 0.5)
    t("verify (count)", lambda: ver.count())
    t(
        "FULL minhash_lsh_pairs (noop sink)",
        lambda: dedup.minhash_lsh_pairs(spark, SF)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # --- jaccard ------------------------------------------------------
    t(
        "FULL ngram_jaccard_pairs (noop sink)",
        lambda: dedup.ngram_jaccard_pairs(spark, SF)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # --- clusters -----------------------------------------------------
    t0 = time.perf_counter()
    pairs = (
        dedup.ngram_jaccard_pairs(spark, SF).select("doc_a", "doc_b").localCheckpoint()
    )
    print(f"{'clusters: pairs checkpoint':45s} {time.perf_counter()-t0:7.2f}s")
    t(
        "clusters: edges checkpoint",
        lambda: pairs.union(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        ).localCheckpoint(),
    )
    t(
        "FULL dedup_clusters (noop sink)",
        lambda: dedup.dedup_clusters(spark, SF)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
