"""Scale-stability harness: replicate the sf0.1 fixtures ×N with
DISJOINT key/token/user namespaces and measure how the heavy operator
families' wall time grows with input size.

    python tools/scale_stability.py [factors...]   # default: 1 4 10
    SCALE_OPS=op1,op2 ... restricts to named ops (one-off additions
    get measured without re-running the whole sweep).

Replication is namespace-disjoint on purpose: replica i's documents
share no tokens with replica j's (every token gets a `_r<i>` suffix),
its users/vectors get offset ids, so the JOIN/PAIR STRUCTURE scales
linearly with the input instead of quadratically across replicas —
the growth curve then isolates the ENGINE's scaling behavior (shuffle
sizing, posting-list bounds, per-list scans, CC iterations) from
output-volume growth.  A pair op whose wall grows ~linearly here has
no hidden cross-input quadratic term.

Replicated tables land under spark-warehouse/scalecheck/x<N>/ (git-
ignored); events keep a plain µs timestamp column, which load_table
passes through unchanged.  Each op gets one warm pass (JIT) and one
timed pass at every factor, mirroring bench.py's heavy-op protocol.
Output: one markdown table per op (paste into tools/dump_plans.py →
PLANS.md) plus a JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "spark-warehouse", "scalecheck")


def replicate(spark, factor: int) -> str:
    """Materialize the ×`factor` namespace-disjoint corpus; returns its
    sf_dir. factor 1 copies through unchanged (same timing path)."""
    from pyspark.sql import functions as F

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        load_table,
    )

    out = os.path.join(OUT, f"x{factor}")
    if all(
        os.path.isdir(os.path.join(out, f"{t}.parquet"))
        for t in ("documents", "embeddings", "events")
    ):
        return out

    docs = load_table(spark, BASE, "documents")
    emb = load_table(spark, BASE, "embeddings")
    ev = load_table(spark, BASE, "events")
    n_docs = docs.count()
    n_vecs = emb.count()
    n_events = ev.count()
    n_users = 1000  # > max user_id in the fixture

    def rep(df, build):
        parts = [build(df, i) for i in range(factor)]
        r = parts[0]
        for p in parts[1:]:
            r = r.unionByName(p)
        return r

    rep(
        docs,
        lambda d, i: d.select(
            (F.col("doc_id") + i * n_docs).alias("doc_id"),
            (
                F.col("text")
                if i == 0
                else F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit(f"_r{i}")),
                    ),
                    " ",
                )
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        ),
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    rep(
        emb,
        lambda d, i: d.select(
            (F.col("vec_id") + i * n_vecs).alias("vec_id"),
            F.transform(
                F.col("embedding"), lambda x: x + F.lit(0.003 * i).cast("float")
            ).alias("embedding"),
            "label",
        ),
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )

    rep(
        ev,
        lambda d, i: d.select(
            (F.col("event_id") + i * n_events).alias("event_id"),
            "ts",
            (F.col("user_id") + i * n_users).alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 10]

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark import (
        get_spark,
    )
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        curation,
        dedup,
        events,
        retrieval,
        similarity,
    )

    spark = get_spark("scale-stability")
    spark.sparkContext.setLogLevel("ERROR")

    ops = {
        "dedup_minhash_lsh": lambda s, d: dedup.minhash_lsh_pairs(s, d),
        # r10: the frozen-index probe; its index builds lazily on the
        # warm pass (default_index_dir is keyed by the ×N dir), so the
        # timed pass is the probe alone — the amortized serving path
        "dedup_incremental_minhash": dedup.incremental_minhash_pairs,
        "dedup_clusters": lambda s, d: dedup.dedup_clusters(s, d),
        "sim_ann_ivf_pq": similarity.ann_ivf_pq,
        "sim_ann_ivf_pq_serving": lambda s, d: similarity.ann_ivf_pq_serving(
            s, d, index_dir=os.path.join(d, "_ivfpq_index")
        ),
        # r9: both arms frozen (lexical postings + IVF-PQ); indexes
        # build lazily on the warm pass, timed pass is serving only
        "retrieval_hybrid_rrf_serving": retrieval.hybrid_rrf_serving,
        "events_funnel": events.funnel,
        "events_hll_daily_users": events.hll_daily_users,
        "text_boilerplate_scrub": curation.boilerplate_scrub,
        "text_substring_dedup": curation.substring_dedup,
    }
    # r11/r12 lake + multimodal entries sweep through their driver
    # builders directly (fixtures build lazily on the warm pass,
    # keyed by the ×N dir — the timed pass is the READ path alone)
    import __spark_entry__ as _entry

    _q = _entry.queries()
    for nm in (
        "lake_delta_variant",
        "lake_iceberg_variant",
        "lake_iceberg_changes_eq",
        "mm_audio_ogg_chain",
        "lake_iceberg_stream_hours",
        "lake_uniform_dv",
        "lake_uniform_rev",
        "lake_iceberg_pstats",
        "lake_iceberg_ndv",
        "lake_delta_evolution",
    ):
        ops[nm] = _q[nm]

    only = os.environ.get("SCALE_OPS")
    if only:
        keep = {k.strip() for k in only.split(",")}
        ops = {k: v for k, v in ops.items() if k in keep}

    dirs = {f: replicate(spark, f) for f in factors}
    results: dict[str, dict[int, dict[str, float]]] = {}
    for name, fn in ops.items():
        results[name] = {}
        for f in factors:
            d = dirs[f]
            # serving: build the frozen index before timing (amortized
            # path excludes build by design)
            if name == "sim_ann_ivf_pq_serving":
                idx = os.path.join(d, "_ivfpq_index")
                if not os.path.isdir(os.path.join(idx, "codes")):
                    similarity.ivf_pq_build_index(spark, d, idx)
            fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            out_df = fn(spark, d)
            out_df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            rows = out_df.count()
            results[name][f] = {"wall_s": round(wall, 2), "out_rows": rows}
            print(f"{name} x{f}: {wall:.2f}s, {rows} rows", flush=True)

    print("\n--- markdown ---\n")
    for name, by_f in results.items():
        base = by_f[factors[0]]["wall_s"]
        print(f"**{name}**\n")
        print("| scale | wall | vs ×1 | output rows |")
        print("|---|---|---|---|")
        for f in factors:
            r = by_f[f]
            ratio = r["wall_s"] / base if base else float("nan")
            print(
                f"| ×{f} | {r['wall_s']:.2f} s | {ratio:.1f}× | {r['out_rows']:,} |"
            )
        print()
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
