"""Skew-salting and bucketed co-located join properties (scale path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.functions import (
    scale,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.plans.audit import (
    executed_plan,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    load_table,
)


def test_salted_agg_matches_direct_groupby(spark, sf_correct):
    ev = load_table(spark, sf_correct, "events")
    direct = {
        (r.user_id): (r.events, r.total)
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        )
        .collect()
    }
    salted = {
        (r.user_id): (r.events, r.total)
        for r in scale.salted_agg(
            ev.select("user_id", "value"),
            ["user_id"],
            {
                "events": (F.count("*"), F.sum("events")),
                "total": (
                    F.sum(F.col("value").cast("decimal(18,2)")),
                    F.sum("total"),
                ),
            },
        ).collect()
    }
    assert salted == direct


def test_salt_is_deterministic_and_bounded(spark, sf_correct):
    ev = load_table(spark, sf_correct, "events").select("event_id", "user_id")
    a = scale.with_salt(ev, 16)
    bounds = a.agg(F.min("_salt"), F.max("_salt")).collect()[0]
    assert 0 <= bounds[0] and bounds[1] <= 15
    b = {r.event_id: r._salt for r in scale.with_salt(ev, 16).collect()}
    assert {r.event_id: r._salt for r in a.collect()} == b


def test_table_buffer_pool_persists_once(spark, sf_dir, monkeypatch):
    import full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources.catalog as cat

    monkeypatch.setenv("SPARK_GRAFT_CACHE", "1")
    cat._TABLE_CACHE.clear()
    a = cat.load_table(spark, sf_dir, "nation")
    b = cat.load_table(spark, sf_dir, "nation")
    assert a is b  # same persisted DF, not a second scan
    assert a.storageLevel.useMemory
    assert a.count() == 25
    a.unpersist()
    cat._TABLE_CACHE.clear()
    monkeypatch.delenv("SPARK_GRAFT_CACHE")
    c = cat.load_table(spark, sf_dir, "nation")
    assert not c.storageLevel.useMemory  # default path: plain scan


def test_aqe_splits_skewed_join(spark):
    """Prove the engine's AQE config handles read-side skew: a join
    where one key owns ~90% of rows must get skew-split at runtime
    (thresholds lowered so the effect triggers at test scale)."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        skewed = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(0, 100).select(
            F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id").cast("string")).alias("d")
        )
        joined = skewed.join(dim, "k")
        # collect() drives THIS DataFrame's QueryExecution, so the
        # adaptive plan below is the one that actually ran
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE did not split the skewed side:\n{plan[:2000]}"
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def _drop_table_and_files(spark, name):
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{name}", ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    for t in ("b_orders", "b_lineitem"):
        _drop_table_and_files(spark, t)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    scale.write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4)
    scale.write_bucketed(lineitem, "b_lineitem", "o_orderkey", n_buckets=4)

    # at test SF the sides fit a broadcast, which bypasses bucketing —
    # force the sort-merge path the planner would pick for fact⋈fact
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = scale.bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan}"
        )
        assert "Bucketed: true" in plan
        # same answer as the plain (shuffling) join
        expected = orders.join(lineitem, "o_orderkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for t in ("b_orders", "b_lineitem"):
        _drop_table_and_files(spark, t)


def test_runtime_bloom_filter_prunes_at_scan(spark, sf_correct):
    """With the size gates opened, Catalyst must inject a Bloom filter
    built from the selective order slice into the lineitem scan
    pipeline (bloom_filter_agg on the build, might_contain on the
    probe), and the filtered join must return exactly the unfiltered
    result."""
    baseline = scale.bloom_pruned_revenue(spark, sf_correct).collect()
    old = scale.set_runtime_bloom(
        spark, application_side_min="0", disable_broadcast=True
    )
    try:
        df = scale.bloom_pruned_revenue(spark, sf_correct)
        rows = df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan
    finally:
        scale.restore_confs(spark, old)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, baseline))


def test_zorder_key_bit_interleave(spark):
    """The Morton key on exact cell corners must equal the hand-computed
    interleave (x odd bits, y even bits)."""
    rows = [(0.0, 0.0), (255.0, 0.0), (0.0, 255.0), (255.0, 255.0), (3.0, 5.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    z = scale.zorder_key_2d(F.col("x"), F.col("y"), 0.0, 256.0, 0.0, 256.0)
    got = [r[0] for r in df.select(z).collect()]

    def morton(xi, yi):
        out = 0
        for i in range(8):
            out |= ((xi >> i) & 1) << (2 * i + 1)
            out |= ((yi >> i) & 1) << (2 * i)
        return out

    want = [morton(int(x), int(y)) for x, y in rows]
    assert got == want


def test_zorder_layout_prunes_both_dimensions(spark, sf_correct, tmp_path):
    """Z-ordered files must have tight bounding boxes in BOTH columns:
    for a 2-D box predicate, fewer files intersect than under an
    unsorted (round-robin) layout of the same file count."""
    import pyarrow.parquet as pq
    import glob as g

    ev = load_table(spark, sf_correct, "events").select("user_id", "value")
    zdir, rdir = str(tmp_path / "zorder"), str(tmp_path / "plain")
    scale.write_zordered(ev, zdir, "user_id", "value", n_files=16)
    ev.repartition(16).write.parquet(rdir)

    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    u_lo = stats[0] + (stats[1] - stats[0]) * 0.4
    u_hi = stats[0] + (stats[1] - stats[0]) * 0.6
    v_lo = stats[2] + (stats[3] - stats[2]) * 0.4
    v_hi = stats[2] + (stats[3] - stats[2]) * 0.6

    def candidates(d):
        hits = 0
        for f in g.glob(d + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            fu_lo = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
            fu_hi = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
            fv_lo = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
            fv_hi = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
            if fu_lo <= u_hi and fu_hi >= u_lo and fv_lo <= v_hi and fv_hi >= v_lo:
                hits += 1
        return hits

    n_z, n_plain = candidates(zdir), candidates(rdir)
    # round-robin layout: every file spans ~the full range of both
    # columns, so essentially all 16 intersect; z-order must beat it
    assert n_z < n_plain
    # and the data must round-trip intact
    assert spark.read.parquet(zdir).count() == ev.count()


def test_cbo_stats_drive_join_reorder(spark, sf_correct):
    """ANALYZE'd statistics + CBO join reorder: a 4-table join written
    in the WORST left-to-right order (fact⋈fact first, the selective
    dim last) is re-planned to start from the most selective edge
    (customer⋈filtered-nation), pushing the big fact to the end — the
    stats-driven reorder a 100-TB star join depends on."""
    import re

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.functions import (
        scale,
    )

    old = scale.enable_cbo(spark)
    try:
        scale.analyze_for_cbo(
            spark,
            {
                "cbo_lineitem": load_table(spark, sf_correct, "lineitem"),
                "cbo_orders": load_table(spark, sf_correct, "orders"),
                "cbo_nation": load_table(spark, sf_correct, "nation"),
                "cbo_customer": load_table(spark, sf_correct, "customer"),
            },
        )
        # optimizer-visible row counts exist for every analyzed table
        counts = {
            t: scale.catalog_row_count_stat(spark, t)
            for t in ("cbo_lineitem", "cbo_orders", "cbo_nation", "cbo_customer")
        }
        assert counts["cbo_lineitem"] == 60000 and counts["cbo_nation"] == 25
        df = spark.sql(
            """
            SELECT n.n_name, count(*) AS cnt
            FROM cbo_lineitem l
            JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
            JOIN cbo_customer c ON o.o_custkey = c.c_custkey
            JOIN cbo_nation n ON c.c_nationkey = n.n_nationkey
                             AND n.n_name = 'NATION_19'
            GROUP BY n.n_name
            """
        )
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        order = re.findall(r"cbo_\w+", plan)
        # reorder happened: the two smallest relations join first, the
        # big fact is LAST — not the written order
        assert order.index("cbo_lineitem") == len(order) - 1
        assert set(order[:2]) == {"cbo_customer", "cbo_nation"}
        # and the result is still correct
        [row] = df.collect()
        assert row.n_name == "NATION_19" and row.cnt > 0
    finally:
        scale.restore_confs(spark, old)
        for t in ("cbo_lineitem", "cbo_orders", "cbo_nation", "cbo_customer"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
