"""Stage-level profiler for the heavy dedup bench entries (sf0.1).

Times each internal stage of the CONTRACTED near-dup pipeline
(r3 architecture: identical token sets collapse to reps before every
quadratic stage) so optimization targets the real bottleneck.
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
    print(f"{label:45s} {time.perf_counter() - t0:7.2f}s  {out}")
    return out


def main():
    spark = get_spark("profile")
    docs = load_table(spark, SF, "documents")
    docs.count()  # buffer pool warm

    groups = t(
        "contract (tokenize + 2 groupBys + ckpt)",
        lambda: dedup._contract(dedup._token_sets(docs)),
    )
    t("  distinct token sets", lambda: groups.count())

    # --- minhash stages ----------------------------------------------
    sig = dedup._rep_minhash_signature(groups)
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
    cand_ck = t("band join + distinct + checkpoint", lambda: cand.localCheckpoint())
    t("  rep candidates", lambda: cand_ck.count())
    ver = dedup._verify_pairs_exact(cand_ck, dedup._rep_arrays(groups), 0.5)
    t("verify (count)", lambda: ver.count())
    t(
        "expand verified pairs (noop sink)",
        lambda: dedup._expand_rep_pairs(ver.localCheckpoint(), groups, 0.5)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    noop = lambda df: df.write.format("noop").mode("overwrite").save()
    t("FULL minhash_lsh_pairs", lambda: noop(dedup.minhash_lsh_pairs(spark, SF)))
    t("FULL ngram_jaccard_pairs", lambda: noop(dedup.ngram_jaccard_pairs(spark, SF)))
    t("FULL dedup_clusters", lambda: noop(dedup.dedup_clusters(spark, SF)))
    spark.stop()


if __name__ == "__main__":
    main()
