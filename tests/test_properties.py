"""Property-based invariants (hypothesis) for the shared expression
idioms and the salted aggregation — randomized inputs, exact laws.
Spark actions are expensive per example, so examples are capped low and
each property batches all examples into ONE DataFrame where possible.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.functions.exprs import (
    extract_price,
    price_category,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.functions.scale import (
    salted_agg,
)

_SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_price(s: str | None) -> int | None:
    """Reference semantics of extract_price: first digit run, else NULL
    (regexp_extract '' on no match → try_cast NULL)."""
    import re

    if s is None:
        return None
    # ASCII digits only: Spark's Java regex \d and DuckDB's RE2 \d are
    # both ASCII-class by default; Python's \d would also match unicode
    # digits ('૦' etc.) and diverge from BOTH engines (hypothesis-found)
    m = re.search(r"([0-9]+)", s)
    if not m:
        return None
    try:
        v = int(m.group(1))
    except ValueError:  # pragma: no cover
        return None
    return v if -2147483648 <= v <= 2147483647 else None


@_SLOW
@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=30)),
        min_size=1,
        max_size=50,
    )
)
def test_extract_price_matches_reference_semantics(spark, rates):
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rates)], "id int, reference_rate string"
    )
    got = {
        r.id: r.price
        for r in df.select("id", extract_price("reference_rate").alias("price")).collect()
    }
    assert got == {i: _ref_price(r) for i, r in enumerate(rates)}


@_SLOW
@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=50))
def test_price_category_partitions_domain(spark, prices):
    df = spark.createDataFrame([(p,) for p in prices], "price int")
    rows = df.select("price", price_category("price").alias("cat")).collect()
    for r in rows:
        expected = "Low" if r.price <= 100 else ("Medium" if r.price <= 500 else "High")
        assert r.cat == expected


@_SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # key (few → collisions)
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=100,
    )
)
def test_salted_agg_equals_direct_groupby(spark, pairs):
    df = spark.createDataFrame(pairs, "k int, v int")
    direct = {
        (r.k): (r.n, r.s)
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    salted = {
        (r.k): (r.n, r.s)
        for r in salted_agg(
            df,
            ["k"],
            {"n": (F.count("*"), F.sum("n")), "s": (F.sum("v"), F.sum("s"))},
            n_buckets=4,
        ).collect()
    }
    assert salted == direct


@_SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # user (few → long chains)
            st.sampled_from([0, 1, 1799, 1800, 1801, 7200]),  # gap to prev event
        ),
        min_size=1,
        max_size=40,
    )
)
def test_sessionization_boundary_parity_with_oracle(spark, steps):
    """Events clustered at EXACTLY the 30-min gap (1799/1800/1801 s
    deltas, plus ties at 0) must sessionize identically in the Spark
    operator and its DuckDB oracle — guards the >gap boundary, the
    BIGINT session_seq cast, and event_id tie-breaking."""
    import os
    import tempfile

    import duckdb

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        events as ev_ops,
    )

    base = 1_700_000_000
    clocks: dict[int, int] = {}
    rows = []
    for event_id, (user, delta) in enumerate(steps):
        clocks[user] = clocks.get(user, base) + delta
        rows.append((event_id, f"u{user}", clocks[user]))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "events.parquet")
        (
            spark.createDataFrame(rows, "event_id long, user_id string, epoch long")
            .select("event_id", "user_id", F.timestamp_seconds("epoch").alias("ts"))
            .write.parquet(path)
        )
        got = {
            (r.user_id, r.session_seq): (r.events, r.session_start, r.session_end)
            for r in ev_ops.sessionization(spark, d).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')"
        )
        want = {
            (u, seq): (n, s, e)
            for u, seq, n, s, e, _ in con.execute(
                ev_ops.ORACLES["events_sessionization"]
            ).fetchall()
        }
        con.close()
    assert got == want


@_SLOW
@given(
    st.lists(
        st.lists(st.sampled_from(list("abcde")), min_size=1, max_size=4),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([0.0, 0.34, 0.5, 0.9, 1.0]),
)
def test_contracted_jaccard_equals_bruteforce(spark, token_lists, threshold):
    """The r3 contraction pipeline (collapse identical token sets →
    rep-level inverted-index jaccard → member expansion) must equal the
    brute-force all-pairs jaccard on arbitrary inputs — duplicate sets,
    subset chains, and thresholds 0/1 included. Values compare EXACTLY
    (same int/int → double division on both sides)."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        dedup,
    )

    sets_ = [frozenset(toks) for toks in token_lists]
    tok_df = spark.createDataFrame(
        [(i, t) for i, s in enumerate(sets_) for t in sorted(s)],
        "doc_id long, token string",
    )
    groups = dedup._contract(tok_df)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup._expand_rep_pairs(
            dedup._rep_jaccard_pairs(groups, threshold), groups, threshold
        ).collect()
    }
    want = {}
    for a in range(len(sets_)):
        for b in range(a + 1, len(sets_)):
            inter = len(sets_[a] & sets_[b])
            if inter == 0:
                continue  # inverted index can only see overlapping pairs
            j = inter / len(sets_[a] | sets_[b])
            if j >= threshold:
                want[(a, b)] = j
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=255.999),
            st.floats(min_value=0.0, max_value=255.999),
        ),
        min_size=1,
        max_size=64,
    )
)
@_SLOW
def test_zorder_key_matches_reference_morton(spark, pts):
    """zorder_key_2d over [0,256) with 8 bits must equal the reference
    Morton interleave of the floored cell indices, for ANY input batch
    (one DataFrame per example)."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.functions.scale import (
        zorder_key_2d,
    )

    df = spark.createDataFrame(pts, "x double, y double")
    z = zorder_key_2d(F.col("x"), F.col("y"), 0.0, 256.0, 0.0, 256.0)
    got = [r[0] for r in df.select(z).collect()]

    def morton(xi: int, yi: int) -> int:
        out = 0
        for i in range(8):
            out |= ((xi >> i) & 1) << (2 * i + 1)
            out |= ((yi >> i) & 1) << (2 * i)
        return out

    want = [morton(int(x), int(y)) for x, y in pts]
    assert got == want


@_SLOW
@given(
    st.lists(
        st.lists(st.sampled_from(list("abcde")), min_size=1, max_size=4),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([0.0, 0.34, 0.5, 0.9, 1.0]),
)
def test_contracted_containment_equals_bruteforce(spark, token_lists, threshold):
    """The directed containment pipeline (contract → rep-level
    candidates → both-direction emit → directed expansion) must equal
    brute-force |A∩B|/|A| over all ordered pairs — duplicate sets,
    subset chains (the containment-specific case), and edge thresholds
    included.  Values compare EXACTLY (int/int division both sides).
    Dispatch note: tiny alphabets exercise the bitmask strategy;
    the max_df=None inverted path is pitted against it in
    tests/test_llm_ops.py."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        dedup,
    )

    sets_ = [frozenset(toks) for toks in token_lists]
    tok_df = spark.createDataFrame(
        [(i, t) for i, s in enumerate(sets_) for t in sorted(s)],
        "doc_id long, token string",
    )
    groups = dedup._contract(tok_df)
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in dedup._expand_rep_pairs_directed(
            dedup._rep_containment_pairs(groups, threshold), groups, threshold
        ).collect()
    }
    want = {}
    for a in range(len(sets_)):
        for b in range(len(sets_)):
            if a == b:
                continue
            inter = len(sets_[a] & sets_[b])
            if inter == 0:
                continue  # candidates require a shared token
            c = inter / len(sets_[a])
            if c >= threshold:
                want[(a, b)] = c
    assert got == want


@_SLOW
@given(
    st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F
                ),
                min_size=1,
                max_size=6,
            ),
            min_size=1,
            max_size=23,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_segmentation_is_a_partition_of_tokens(spark, token_lists):
    """with_segments law: for ANY document, the segments partition the
    token sequence — concatenating seg_texts in seg_idx order yields
    the original tokens, and every segment except possibly the last
    has exactly SEG_TOKENS tokens."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators.curation import (
        SEG_TOKENS,
        with_segments,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        "doc_id long, text string",
    )
    segs = with_segments(docs).collect()
    by_doc: dict[int, list] = {}
    for r in segs:
        by_doc.setdefault(r.doc_id, []).append((r.seg_idx, r.seg_text))
    for i, toks in enumerate(token_lists):
        parts = [t for _, t in sorted(by_doc[i])]
        rebuilt = " ".join(parts).split(" ")
        assert rebuilt == toks
        for p in parts[:-1]:
            assert len(p.split(" ")) == SEG_TOKENS
        assert 1 <= len(parts[-1].split(" ")) <= SEG_TOKENS


# --------------------------------------------------------------------------
# Binary codec laws (roaring / Z85 / IMA ADPCM / Avro) — pure Python,
# no SparkSession needed
# --------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.sets(
        st.one_of(
            st.integers(min_value=0, max_value=2**16),  # array containers
            st.integers(min_value=0, max_value=2**33),  # bucket gaps
            st.builds(
                lambda hi, lo: (hi << 32) | lo,
                st.integers(min_value=0, max_value=12),
                st.integers(min_value=0, max_value=2**32 - 1),
            ),
        ),
        max_size=300,
    )
)
def test_roaring_rbm64_roundtrip_law(values):
    """serialize∘deserialize is the identity on ANY uint64 position
    set — across array containers, sparse high-32 buckets, and bucket
    boundaries (the r9 portable-format fix's regression net)."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        roaring as rb,
    )

    blob = rb.serialize_rbm64(values)
    assert rb.deserialize_rbm64(blob) == sorted(values)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=64).filter(lambda b: len(b) % 4 == 0))
def test_z85_roundtrip_law(raw):
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        roaring as rb,
    )

    assert rb.z85_decode(rb.z85_encode(raw)) == raw


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=400,
    )
)
def test_adpcm_wav_container_law(samples):
    """For ANY int16 signal (noise included): the WAV container
    round-trips the exact sample COUNT and rate, every decoded sample
    stays in int16 range, and the first sample of every block is
    EXACT (it rides the block header verbatim)."""
    import numpy as np

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        adpcm,
    )

    x = np.array(samples, dtype=np.int16)
    y, rate = adpcm.decode_ima_wav(adpcm.encode_ima_wav(x, 16000))
    assert rate == 16000
    assert len(y) == len(x)
    assert all(-32768 <= v <= 32767 for v in y)
    for block_start in range(0, len(x), adpcm.SAMPLES_PER_BLOCK):
        assert y[block_start] == int(x[block_start])


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(max_size=12),
            st.integers(min_value=-(2**62), max_value=2**62),
            st.one_of(st.none(), st.binary(max_size=16)),
        ),
        max_size=20,
    )
)
def test_avrotiny_container_roundtrip_law(rows):
    """Object-container write∘read is the identity for ANY record
    batch over string/long/optional-bytes fields, both codecs."""
    import tempfile

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        avrotiny as av,
    )

    schema = {
        "type": "record",
        "name": "prop",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "b", "type": ["null", "bytes"], "default": None},
        ],
    }
    recs = [{"s": s, "n": n, "b": b} for s, n, b in rows]
    with tempfile.NamedTemporaryFile(suffix=".avro", delete=False) as tf:
        p = tf.name
    for codec in ("null", "deflate"):
        av.write_container(p, schema, recs, codec=codec)
        got, _m, _ws = av.read_container(p)
        assert got == recs


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=400,
    )
)
def test_g711_companding_law(samples):
    """For ANY int16 signal: both G.711 laws reach a decoded-value
    fixpoint after one pass (decode∘encode∘decode∘encode == the first
    decode — byte-level identity would trip on mu-law's two zero
    codes), the error never exceeds the widest quantization step plus
    clip loss, and the WAV container round-trips count and rate."""
    import numpy as np

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        g711,
    )

    x = np.array(samples, dtype=np.int16)
    for law, enc, dec, max_err in (
        ("mulaw", g711.encode_mulaw, g711.decode_mulaw, 16 << 7),
        ("alaw", g711.encode_alaw, g711.decode_alaw, 8 << 7),
    ):
        c = enc(x)
        y = dec(c)
        assert np.array_equal(dec(enc(y)), y), law
        err = np.abs(y.astype(np.int64) - x.astype(np.int64))
        assert int(err.max()) <= max_err, (law, int(err.max()))
        wav_y, rate = g711.decode_g711_wav(g711.encode_g711_wav(x, law, 16000))
        assert rate == 16000 and np.array_equal(wav_y, y)
