"""Dedup / similarity / text / multimodal operator invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
    dedup,
    jpeg,
    multimodal,
    similarity,
    text,
)
from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
    load_table,
)


def test_exact_dedup_covers_all_docs(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents").count()
    out = dedup.exact_dedup(spark, sf_correct)
    assert out.agg(F.sum("copies")).collect()[0][0] == docs


def test_jaccard_pairs_bounds(spark, sf_correct):
    out = dedup.ngram_jaccard_pairs(spark, sf_correct, threshold=0.95)
    bad = out.filter((F.col("jaccard") < 0.95) | (F.col("jaccard") > 1.0)).count()
    assert bad == 0
    ordered_bad = out.filter(F.col("doc_a") >= F.col("doc_b")).count()
    assert ordered_bad == 0


def test_minhash_finds_high_jaccard_pairs(spark, sf_correct):
    """LSH banding must recall (nearly) all very-high-sim pairs; with
    16 hashes / 4 bands, P(miss | j=0.9) ≈ (1-0.9^4)^4 ≈ 1.3%.
    Assert ≥90% recall of exact pairs at j ≥ 0.9."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(spark, sf_correct, threshold=0.9).collect()
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(spark, sf_correct, threshold=0.9).collect()
    }
    assert got <= exact  # verification step guarantees no false positives
    if exact:
        assert len(got & exact) / len(exact) >= 0.9


def test_minhash_verify_is_candidate_only_and_value_exact(spark, sf_correct):
    """The verify stage must (a) never emit a pair the exact all-pairs
    Jaccard wouldn't, (b) agree with it bit-for-bit on the value, and
    (c) do it WITHOUT the all-pairs token self-join — the plan verifies
    candidates via array_intersect on per-doc token arrays."""
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(spark, sf_correct, threshold=0.9).collect()
    }
    mh_df = dedup.minhash_lsh_pairs(spark, sf_correct, threshold=0.9)
    mh = {(r.doc_a, r.doc_b): r.jaccard for r in mh_df.collect()}
    assert set(mh) <= set(exact)
    assert all(mh[k] == exact[k] for k in mh)
    # Plan-shape check, kept intentionally loose (node names vary across
    # Spark versions): the verify stage must NOT contain a token-equality
    # SELF-join — that is the all-pairs inverted index LSH exists to
    # avoid.  The only token-keyed join the plan may carry is the
    # BROADCAST dictionary lookup of the adaptive bitmask verify (≤64-row
    # vocab-id side); a shuffled/sort-merge token join means the
    # corpus-sized all-pairs join came back.
    import re

    plan = mh_df._jdf.queryExecution().simpleString()
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
    assert join_lines, "expected join operators in the minhash plan"
    bad = [
        ln
        for ln in join_lines
        if re.search(r"token#\d+", ln) and "Broadcast" not in ln
    ]
    assert not bad, (
        f"verify stage reintroduced a non-broadcast token join: {bad}"
    )


def test_jaccard_max_df_parity_and_plan(spark, sf_correct):
    """Non-binding posting-list cap is exact parity with the uncapped
    inverted-index path; the df prefix-filter must appear in the plan."""
    import re

    base = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(spark, sf_correct, threshold=0.9).collect()
    }
    capped_df = dedup.ngram_jaccard_pairs(
        spark, sf_correct, threshold=0.9, max_df=10**9
    )
    capped = {(r.doc_a, r.doc_b): r.jaccard for r in capped_df.collect()}
    assert capped == base
    plan = capped_df._jdf.queryExecution().simpleString()
    assert re.search(r"df#\d+L? <= 1000000000", plan)
    # a binding cap may only lose pairs, never invent or distort them
    binding = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            spark, sf_correct, threshold=0.9, max_df=100
        ).collect()
    }
    assert set(binding) <= set(base)
    assert all(binding[k] == base[k] for k in binding)


def test_simhash_deterministic_and_near_pairs_symmetric(spark, sf_correct):
    a = {r.doc_id: r.simhash for r in dedup.simhash_signatures(spark, sf_correct).collect()}
    b = {r.doc_id: r.simhash for r in dedup.simhash_signatures(spark, sf_correct).collect()}
    assert a == b
    pairs = dedup.simhash_near_pairs(spark, sf_correct, max_hamming=3)
    assert pairs.filter(F.col("hamming") > 3).count() == 0


def test_knn_k_per_query(spark, sf_correct):
    out = similarity.knn_bruteforce(spark, sf_correct)
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == similarity.TOP_K for r in counts)
    assert len(counts) == similarity.N_QUERY_VECS


def test_ann_lsh_recall_vs_bruteforce(spark, sf_correct):
    """ANN top-1 should usually be the true top-1 (loose bound: ≥40%
    of queries returning any result — it's approximate by design)."""
    exact = {
        r.query_id: r.neighbor_id
        for r in similarity.knn_bruteforce(spark, sf_correct).filter(F.col("rank") == 1).collect()
    }
    approx = {
        r.query_id: r.neighbor_id
        for r in similarity.ann_lsh(spark, sf_correct).filter(F.col("rank") == 1).collect()
    }
    assert approx, "LSH returned nothing"
    hits = sum(1 for q, n in approx.items() if exact.get(q) == n)
    assert hits / len(approx) >= 0.4


def test_ann_brp_lsh_answers_all_queries(spark, sf_correct):
    out = similarity.ann_brp_lsh(spark, sf_correct).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r)
    assert len(by_query) == similarity.N_QUERY_VECS
    assert all(len(v) == similarity.TOP_K for v in by_query.values())


def test_ann_ivf_recall_vs_bruteforce(spark, sf_correct):
    """IVF probes nprobe/nlist of the corpus; with weakly-clustered
    synthetic vectors the true NN's list is probed often enough for a
    loose ≥40% top-1 recall bound, and every query must return rows."""
    exact = {
        r.query_id: r.neighbor_id
        for r in similarity.knn_bruteforce(spark, sf_correct).filter(F.col("rank") == 1).collect()
    }
    approx_rows = similarity.ann_ivf(spark, sf_correct).collect()
    approx = {r.query_id: r.neighbor_id for r in approx_rows if r.rank == 1}
    assert len(approx) == similarity.N_QUERY_VECS, "IVF must answer every query"
    hits = sum(1 for q, n in approx.items() if exact.get(q) == n)
    assert hits / len(approx) >= 0.4


def test_label_centroids_shape(spark, sf_correct):
    out = similarity.label_centroids(spark, sf_correct)
    assert out.count() == 10 * 64  # 10 labels × 64 dims
    assert out.filter(F.abs(F.col("centroid")) > 1.0).count() == 0


def test_text_quality_verdicts_partition(spark, sf_correct):
    out = text.quality_score(spark, sf_correct)
    total = out.count()
    by = out.groupBy("verdict").count().collect()
    assert sum(r["count"] for r in by) == total


def test_dedup_clusters_are_consistent_with_pairs(spark, sf_correct):
    """Every near-dup pair must land in one cluster; cluster_id is the
    min member; labels cover every doc exactly once."""
    labels = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(spark, sf_correct).collect()}
    docs = dedup.load_table(spark, sf_correct, "documents").count()
    assert len(labels) == docs
    for doc, cid in labels.items():
        assert cid <= doc  # min-label invariant
    for r in dedup.ngram_jaccard_pairs(spark, sf_correct).collect():
        assert labels[r.doc_a] == labels[r.doc_b]


def test_sampling_determinism_and_tolerance(spark, sf_correct):
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        sampling,
    )

    total = dedup.load_table(spark, sf_correct, "documents").count()
    # hash sample: exactly reproducible and ~pct% of corpus
    a = {r.doc_id for r in sampling.sample_hash_mod(spark, sf_correct).collect()}
    b = {r.doc_id for r in sampling.sample_hash_mod(spark, sf_correct).collect()}
    assert a == b
    assert 0.04 * total <= len(a) <= 0.2 * total
    # bernoulli: seeded determinism
    c = {r.doc_id for r in sampling.sample_bernoulli(spark, sf_correct).collect()}
    d = {r.doc_id for r in sampling.sample_bernoulli(spark, sf_correct).collect()}
    assert c == d
    # stratified: only listed strata survive
    langs = {
        r.lang
        for r in sampling.sample_stratified_by_lang(spark, sf_correct).collect()
    }
    assert langs <= set(sampling.STRATA_FRACTIONS)


def test_multimodal_metadata_schema_and_determinism(spark, sf_correct):
    out = multimodal.image_metadata(spark, sf_correct)
    assert out.schema == multimodal.IMAGE_META_SCHEMA
    rows = {r.doc_id: (r.width, r.height, r.format) for r in out.collect()}
    rows2 = {r.doc_id: (r.width, r.height, r.format) for r in multimodal.image_metadata(spark, sf_correct).collect()}
    assert rows == rows2
    assert all(1 <= w <= 64 and 1 <= h <= 64 for w, h, _ in rows.values())


def test_frame_sample_keeps_every_nth(spark, sf_correct):
    out = multimodal.frame_sample(spark, sf_correct, every_n=2)
    assert out.filter(F.col("frame_idx") % 2 != 0).count() == 0
    # frames are real decoded pixels: checksums are positive and bounded
    # by the max possible pixel sum (9·9·3 bytes of 255)
    bounds = out.agg(F.min("pixel_sum"), F.max("pixel_sum")).collect()[0]
    assert 0 < bounds[0] and bounds[1] <= 9 * 9 * 3 * 255
    # every doc has 2..4 frames → sampling every 2nd keeps 1 or 2
    per_doc = out.groupBy("doc_id").count()
    assert per_doc.filter((F.col("count") < 1) | (F.col("count") > 2)).count() == 0


def test_audio_rms_windows(spark, sf_correct):
    out = multimodal.audio_rms_windows(spark, sf_correct)
    assert out.schema == multimodal.AUDIO_RMS_SCHEMA
    n_docs = out.select("doc_id").distinct().count()
    # 8 WAV samples / window of 4 → exactly 2 windows per doc
    assert out.count() == n_docs * 2
    # int16 samples → RMS bounded by [0, 32768]
    bounds = out.agg(F.min("rms"), F.max("rms")).collect()[0]
    assert 0.0 <= bounds[0] and bounds[1] <= 32768.0


def test_bmp_codec_roundtrip_and_foreign_bytes():
    """The BMP kernel is a real codec: it decodes files we did not
    encode (hand-built top-down negative-height variant included) and
    the encode→decode round trip is exact, padding and row order
    included."""
    import struct

    import numpy as np

    rng = np.random.default_rng(7)
    for w, h in [(2, 2), (5, 3), (7, 9), (1, 4)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (multimodal._decode_bmp(multimodal._encode_bmp(img)) == img).all()

    # hand-built TOP-DOWN bmp (negative height) — not our encoder's layout
    w, h = 3, 2
    img = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    row_size = (3 * w + 3) // 4 * 4
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + h * row_size, 0, 0, 54,
        40, w, -h, 1, 24, 0, h * row_size, 0, 0, 0, 0,
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : 3 * w] = img.reshape(h, 3 * w)  # top-down: no reversal
    assert (multimodal._decode_bmp(header + rows.tobytes()) == img).all()

    import pytest

    with pytest.raises(ValueError, match="magic"):
        multimodal._decode_bmp(b"PNG not really")


def test_wav_codec_chunk_walk_and_roundtrip():
    """The WAV kernel walks RIFF chunks (LIST before data parses), the
    round trip is sample-exact, and the header sample rate is read from
    the bytes, not assumed."""
    import struct

    import numpy as np

    s = np.array([0, 1, -1, 32767, -32768, 123, -456, 7], dtype=np.int16)
    out, rate = multimodal._decode_wav(multimodal._encode_wav(s, sample_rate=44100))
    assert (out == s).all() and rate == 44100

    # foreign layout: LIST chunk between fmt and data
    data = s.astype("<i2").tobytes()
    wav = (
        struct.pack("<4sI4s", b"RIFF", 4 + 24 + 12 + 8 + len(data), b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
        + struct.pack("<4sI4s", b"LIST", 4, b"INFO")
        + struct.pack("<4sI", b"data", len(data))
        + data
    )
    out2, rate2 = multimodal._decode_wav(wav)
    assert (out2 == s).all() and rate2 == 8000

    import pytest

    with pytest.raises(ValueError, match="RIFF"):
        multimodal._decode_wav(b"OggS nope")


def test_adpcm_codec_blocks_and_wav_container():
    """IMA ADPCM (WAV 0x0011): block-boundary state survives (multi-
    block streams decode continuously), the nibble order is LOW-first,
    the fact chunk carries the true count, lossy error is bounded on
    band-limited content, and non-IMA WAVs refuse."""
    import math
    import struct

    import numpy as np
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        adpcm,
    )

    # multi-block sine (crosses 65-sample block boundaries) round-trips
    # within an SNR floor; count comes from the fact chunk exactly
    for n in (1, 64, 65, 66, 200, 391):
        t = np.arange(n)
        x = (9000 * np.sin(2 * np.pi * 5 * t / max(n, 1) + 0.3)).astype(
            np.int16
        )
        y, rate = adpcm.decode_ima_wav(adpcm.encode_ima_wav(x, 44100))
        assert len(y) == n and rate == 44100
        if n >= 64:
            x64, y64 = x.astype(np.int64), np.asarray(y, dtype=np.int64)
            err = float(((y64 - x64) ** 2).mean())
            snr = 10 * math.log10(float((x64**2).mean()) / err)
            assert snr >= 16.0, (n, snr)
    # block geometry: 36-byte blocks, 65 samples each
    x = np.zeros(130, dtype=np.int16)
    assert len(adpcm.encode_blocks(x)) == 72
    # LOW nibble first: a hand-built block [pred=0, idx=0] with first
    # data byte 0x_C_2 decodes sample1 from nibble 2 (step 7: delta
    # 0+3 → +3) then sample2 from nibble 0xC (8|4, step still 7:
    # delta 0+7 → 3-7 = -4) — pins nibble order AND the delta math
    blk = struct.pack("<hBx", 0, 0) + bytes([0xC2]) + b"\x00" * 31
    got = adpcm.decode_blocks(blk, 3)
    assert got[:3] == [0, 3, -4]
    # refusal: plain PCM tag
    pcm = (
        struct.pack("<4sI4s", b"RIFF", 36, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
        + struct.pack("<4sI", b"data", 0)
    )
    with pytest.raises(ValueError, match="IMA"):
        adpcm.decode_ima_wav(pcm)


def test_g711_codec_laws_and_wav_container():
    """G.711 (WAV 0x0007/0x0006): all 256 code bytes survive
    decode→encode (mu-law's -0 → +0 excepted — the spec's two zero
    codes), decode is monotone over each sign half, a sine holds a
    ~38 dB SNR at exactly 2:1 compression, the fact chunk carries the
    true count, and non-G.711 WAVs refuse."""
    import math

    import numpy as np
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        g711,
    )

    codes = np.arange(256, dtype=np.uint8)
    mu_rt = g711.encode_mulaw(g711.decode_mulaw(codes))
    mismatched = codes[mu_rt != codes]
    assert list(mismatched) == [0x7F] and mu_rt[0x7F] == 0xFF
    assert np.array_equal(g711.encode_alaw(g711.decode_alaw(codes)), codes)

    # decode monotone nondecreasing across each chord run (positive half)
    mu_pos = g711.decode_mulaw(np.arange(0x80, 0x100, dtype=np.uint8)[::-1])
    assert np.all(np.diff(mu_pos.astype(np.int64)) >= 0)
    al_pos = g711.decode_alaw(
        (np.arange(0x80, dtype=np.uint8) | 0x80) ^ g711.ALAW_AMI_MASK ^ 0x55
    )
    assert np.all(np.diff(np.sort(al_pos.astype(np.int64))) >= 0)

    t = np.arange(4000)
    x = (8000 * np.sin(2 * np.pi * 7 * t / 4000)).astype(np.int16)
    for law, dec in (("mulaw", g711.decode_mulaw), ("alaw", g711.decode_alaw)):
        wav = g711.encode_g711_wav(x, law, 8000)
        y, rate = g711.decode_g711_wav(wav)
        assert rate == 8000 and len(y) == len(x)
        x64, y64 = x.astype(np.int64), y.astype(np.int64)
        snr = 10 * math.log10(
            float((x64**2).mean()) / float(((y64 - x64) ** 2).mean())
        )
        assert snr >= 35.0, (law, snr)
        # exactly 2:1: the data payload is one byte per sample
        assert wav.index(b"data") and len(x) == int.from_bytes(
            wav[wav.index(b"data") + 4 : wav.index(b"data") + 8], "little"
        )

    import struct

    pcm = (
        struct.pack("<4sI4s", b"RIFF", 36, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
        + struct.pack("<4sI", b"data", 0)
    )
    with pytest.raises(ValueError, match="G.711"):
        g711.decode_g711_wav(pcm)


def test_mp3_frame_header_scan():
    """MPEG-1 Layer III scanner: the spec frame-length formula (incl.
    the padding bit), syncsafe ID3v2 skip, VBR classification, and
    loud refusals on truncation / lost sync / free bitrate."""
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        mpegaudio as m,
    )

    # 128 kbps @ 44100: spec length 417; +1 with padding
    assert m.frame_length(9, 0, 0) == 417
    assert m.frame_length(9, 0, 1) == 418
    # CBR stream, no tag
    b = m.encode_mp3_stream([(9, 0, 0)] * 5)
    meta = m.scan_mpeg_stream(b)
    assert meta["n_frames"] == 5 and meta["sample_rate"] == 44100
    assert meta["stream_bytes"] == 5 * 417 == meta["frame_bytes"]
    assert not meta["is_vbr"] and meta["id3_bytes"] == 0
    assert meta["duration_ms"] == (5 * 1152 * 1000) // 44100
    # VBR with ID3 tag and padded odd frames @ 48000 (160 kbps → 480)
    tag = bytes(200)
    b = m.encode_mp3_stream(
        [(10, 1, 0), (14, 1, 1), (10, 1, 0), (14, 1, 1)], id3_payload=tag
    )
    meta = m.scan_mpeg_stream(b)
    assert meta["id3_bytes"] == 210 and meta["is_vbr"]
    assert meta["bitrates_kbps"] == [160, 320]
    assert meta["frame_bytes"] == 2 * 480 + 2 * ((144_000 * 320) // 48000 + 1)
    assert meta["stream_bytes"] == 210 + meta["frame_bytes"]
    # refusals: truncated final frame, garbage mid-stream, free bitrate
    with pytest.raises(ValueError, match="truncated"):
        m.scan_mpeg_stream(b[:-1])
    good = m.encode_mp3_stream([(9, 0, 0)])
    with pytest.raises(ValueError, match="sync"):
        m.scan_mpeg_stream(good + b"junkjunk" * 60)
    free = bytearray(good)
    free[1 + 1] = (free[2] & 0x0F) | 0x00  # zero the bitrate index
    with pytest.raises(ValueError, match="free/forbidden"):
        m.scan_mpeg_stream(bytes(free))
    with pytest.raises(ValueError, match="no MPEG audio frames"):
        m.scan_mpeg_stream(m.encode_id3v2(b"x"))


def test_mp4_container_roundtrip_and_grammar():
    """ISO BMFF: writer→parser round trip preserves geometry and the
    dual-clock duration; the box walker handles largesize and to-end
    forms; the stsc expansion covers the GENERAL multi-chunk mapping;
    unsupported codecs and non-video handlers refuse loudly."""
    import struct

    import numpy as np
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        isobmff as iso,
    )

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(4, 10, 14, 3), dtype=np.uint8)
    b = iso.encode_mp4_mjpeg(frames)
    meta = iso.parse_mp4(b)
    assert (meta["width"], meta["height"]) == (14, 10)
    assert meta["n_samples"] == 4 and meta["duration_ms"] == 400
    dec, _ = iso.decode_mp4_frames(b)
    assert dec.shape == frames.shape

    # largesize form: rewrap mdat with a 64-bit size; parser agrees
    mdat_off = b.index(b"mdat") - 4
    mdat_size = struct.unpack_from(">I", b, mdat_off)[0]
    payload = b[mdat_off + 8 : mdat_off + mdat_size]
    large = (
        b[:mdat_off]
        + struct.pack(">I4sQ", 1, b"mdat", 16 + len(payload))
        + payload
        + b[mdat_off + mdat_size :]
    )
    # stco offsets shifted by the 8 extra header bytes → patch them
    stco_off = large.index(b"stco") + 4 + 8
    first = struct.unpack_from(">I", large, stco_off)[0]
    large = (
        large[:stco_off]
        + struct.pack(">I", first + 8)
        + large[stco_off + 4 :]
    )
    dec2, m2 = iso.decode_mp4_frames(large)
    assert np.array_equal(dec2, dec) and m2["duration_ms"] == 400

    # general stsc mapping: 2 chunks — first holds 3 samples, second 1
    sizes = [len(s) for s in (b[o : o + n] for o, n in meta["samples"])]
    raw = b"".join(b[o : o + n] for o, n in meta["samples"])
    rows = struct.pack(">IIII", 1, 1, 3, 1) + struct.pack(
        ">III", 2, 1, 1
    )
    # hand-walk via the module's expansion by faking the tables
    samples = []
    chunk_offsets = [0, sum(sizes[:3])]
    stsc_rows = [(1, 3, 1), (2, 1, 1)]
    si = 0
    for ri, (fc, per, _d) in enumerate(stsc_rows):
        last = stsc_rows[ri + 1][0] - 1 if ri + 1 < len(stsc_rows) else 2
        for chunk in range(fc, last + 1):
            off = chunk_offsets[chunk - 1]
            for _ in range(per):
                samples.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    assert si == 4 and [raw[o : o + n] for o, n in samples] == [
        b[o : o + n] for o, n in meta["samples"]
    ]

    # codec refusal: flip the sample-entry fourcc to hev1 (avc1 is
    # metadata-parseable since r10 — see test_mp4_avc1_metadata_tier)
    hev1 = b.replace(b"jpeg", b"hev1", 1)
    with pytest.raises(ValueError, match="unsupported sample codec"):
        iso.parse_mp4(hev1)
    # an avc1 entry WITHOUT an avcC record is malformed, not mis-read
    avc1 = b.replace(b"jpeg", b"avc1", 1)
    with pytest.raises(ValueError, match="without avcC"):
        iso.parse_mp4(avc1)
    # handler refusal
    soun = b.replace(b"vide", b"soun", 1)
    with pytest.raises(ValueError, match="not a video track"):
        iso.parse_mp4(soun)
    with pytest.raises(ValueError, match="ftyp"):
        iso.parse_mp4(b"\x00\x00\x00\x08free" + b"x" * 100)


def test_mp4_avc1_metadata_tier():
    """H.264 metadata tier: SPS build⇄parse round-trips exact geometry
    (crop-bearing sizes included), emulation-prevention bytes survive
    the EBSP⇄RBSP pair, an avc1 MP4 reports profile/level/geometry/
    duration with SPS cross-checked against tkhd (mismatch refuses),
    and entropy decode of avc1 refuses — index, never decode."""
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        isobmff as iso,
    )

    # geometry round-trip: multiples of 16 (no crop) and crop-bearing
    for w, h in [(320, 240), (1920, 1080), (1280, 720), (426, 240), (638, 360)]:
        info = iso.parse_sps(iso.build_sps(w, h))
        assert (info["width"], info["height"]) == (w, h)
        assert info["profile_idc"] == 66 and info["frame_mbs_only"]
    # EBSP pair: a zero-run payload gains 0x03 markers and strips back
    raw = b"\x00\x00\x00\x00\x01\x00\x00\x02"
    ebsp = iso._rbsp_to_ebsp(raw)
    assert b"\x00\x00\x00" not in ebsp and iso._ebsp_to_rbsp(ebsp) == raw
    # container: exact geometry/duration/profile, opaque samples
    b = iso.encode_mp4_avc1(640, 360, [b"a" * 64, b"b" * 80, b"c" * 72])
    meta = iso.parse_mp4(b)
    assert (meta["width"], meta["height"]) == (640, 360)
    assert meta["codec"] == "avc1" and meta["n_samples"] == 3
    assert meta["duration_ms"] == 3 * iso.FRAME_MS
    assert meta["profile_idc"] == 66 and meta["level_idc"] == 30
    assert meta["nal_length_size"] == 4
    assert [s for _, s in meta["samples"]] == [64, 80, 72]
    # SPS⇄tkhd cross-check: corrupt tkhd width → refuse
    import struct

    tkhd_off = b.index(b"tkhd")
    # width is the 4-byte 16.16 field 8 bytes before the box end; find
    # via parse offsets instead: patch the last 8 bytes of tkhd body
    size = struct.unpack_from(">I", b, tkhd_off - 4)[0]
    wh_off = tkhd_off - 4 + size - 8
    bad = (
        b[:wh_off] + struct.pack(">II", 16 << 16, 16 << 16) + b[wh_off + 8 :]
    )
    with pytest.raises(ValueError, match="disagrees with tkhd"):
        iso.parse_mp4(bad)
    with pytest.raises(ValueError, match="entropy-decode"):
        iso.decode_mp4_frames(b)
    # avcC record fields
    rec = iso.parse_avcc(iso.build_avcc(iso.build_sps(426, 240), iso._PPS_MIN))
    assert rec["sps"]["width"] == 426 and rec["sps"]["height"] == 240


def test_mp4_avc1_spark_metadata_kernel(spark):
    """The avc1 metadata walk as a Spark kernel: generated avc1 blobs
    in a binary column, mapInPandas extracts (geometry, duration,
    profile, sample count) — exact values restated per-row, the same
    Arrow-batch shape the mm_video_* entries use."""
    import pandas as pd

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        isobmff as iso,
    )

    rows = []
    for i, (w, h, n) in enumerate([(320, 240, 2), (638, 360, 4), (426, 240, 3)]):
        rows.append(
            (i, bytearray(iso.encode_mp4_avc1(w, h, [b"p" * (32 + j) for j in range(n)])), w, h, n)
        )
    df = spark.createDataFrame(
        rows, "vid_id int, data binary, w int, h int, n int"
    ).repartition(3)

    def kernel(it):
        for pdf in it:
            out = []
            for r in pdf.itertuples():
                m = iso.parse_mp4(bytes(r.data))
                out.append(
                    (r.vid_id, m["width"], m["height"], m["n_samples"],
                     m["duration_ms"], m["profile_idc"], m["level_idc"])
                )
            yield pd.DataFrame(
                out,
                columns=["vid_id", "width", "height", "n_samples",
                         "duration_ms", "profile_idc", "level_idc"],
            )

    got = {
        r["vid_id"]: r
        for r in df.mapInPandas(
            kernel,
            "vid_id int, width int, height int, n_samples int, "
            "duration_ms int, profile_idc int, level_idc int",
        ).collect()
    }
    for i, (w, h, n) in enumerate([(320, 240, 2), (638, 360, 4), (426, 240, 3)]):
        r = got[i]
        assert (r["width"], r["height"], r["n_samples"]) == (w, h, n)
        assert r["duration_ms"] == n * iso.FRAME_MS
        assert r["profile_idc"] == 66


def test_flac_metadata_scanner():
    """FLAC scanner: STREAMINFO bit fields round-trip exactly through
    the writer (20-bit sample rate, 3-bit channels, 5-bit bps, 36-bit
    totals), Vorbis comments count with little-endian lengths,
    reserved block types skip, and the spec's refusal set (magic,
    non-STREAMINFO first, invalid type 127, overruns, bad seektable
    stride) all raise."""
    import struct

    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        flac,
    )

    b = flac.encode_flac_stream(
        44100, 2, 16, 1_234_567,
        n_seekpoints=3,
        comments=["TITLE=x", "ARTIST=y"],
        padding_len=32,
        audio_bytes=200,
    )
    m = flac.scan_flac_stream(b)
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["bits_per_sample"] == 16 and m["total_samples"] == 1_234_567
    assert m["duration_ms"] == 1_234_567 * 1000 // 44100
    assert m["n_blocks"] == 4 and m["n_seekpoints"] == 3
    assert m["n_comments"] == 2
    assert m["audio_bytes"] == 200 and m["stream_bytes"] == len(b)
    # extreme geometry survives the bit packing
    m2 = flac.scan_flac_stream(
        flac.encode_flac_stream(655349, 8, 32, (1 << 36) - 1)
    )
    assert m2["sample_rate"] == 655349 and m2["channels"] == 8
    assert m2["bits_per_sample"] == 32
    assert m2["total_samples"] == (1 << 36) - 1
    # a reserved block type (42) is skipped by length, like real readers
    si = flac.build_streaminfo(8000, 1, 16, 100)
    res = (
        flac.MAGIC
        + flac._block_header(flac.T_STREAMINFO, len(si), False)
        + si
        + flac._block_header(42, 5, True)
        + b"\x01\x02\x03\x04\x05"
    )
    assert flac.scan_flac_stream(res)["n_blocks"] == 2
    # refusals
    with pytest.raises(ValueError, match="magic"):
        flac.scan_flac_stream(b"OggS" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not STREAMINFO"):
        flac.scan_flac_stream(
            flac.MAGIC + flac._block_header(flac.T_PADDING, 4, True) + b"\x00" * 4
        )
    with pytest.raises(ValueError, match="type 127"):
        flac.scan_flac_stream(
            flac.MAGIC + flac._block_header(127, 4, True) + b"\x00" * 4
        )
    with pytest.raises(ValueError, match="overruns"):
        flac.scan_flac_stream(b[: len(b) - 250])  # cut inside a block
    bad_seek = (
        flac.MAGIC
        + flac._block_header(flac.T_STREAMINFO, len(si), False)
        + si
        + flac._block_header(flac.T_SEEKTABLE, 17, True)
        + b"\x00" * 17
    )
    with pytest.raises(ValueError, match="multiple of 18"):
        flac.scan_flac_stream(bad_seek)
    with pytest.raises(ValueError, match="36-bit"):
        flac.build_streaminfo(44100, 2, 16, 1 << 36)
    with pytest.raises(ValueError, match="20-bit"):
        flac.build_streaminfo(1 << 20, 2, 16, 1)


def test_ogg_vorbis_page_walker():
    """Ogg scanner: page walk by lacing table with per-page CRC
    (RFC 3533's unreflected 0x04C11DB7 — NOT zlib), packet counting
    via terminating segments (255-multiple packets take a 0-lacing
    terminator), duration from the final granule, and the refusal set
    (capture, CRC, version, BOS, truncation)."""
    import struct

    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        ogg,
    )

    b = ogg.encode_ogg_vorbis(48000, 1, [100, 255, 90], 48000 * 2)
    m = ogg.scan_ogg_stream(b)
    assert m["sample_rate"] == 48000 and m["channels"] == 1
    assert m["n_pages"] == 3 and m["n_packets"] == 6
    assert m["duration_ms"] == 2000 and m["stream_bytes"] == len(b)
    # CRC pin against the spec's own polynomial identity: the CRC of a
    # page with its checksum zeroed must equal the stored value
    assert ogg.ogg_crc(b"") == 0 and ogg.ogg_crc(b"\x00") == 0
    assert ogg.ogg_crc(b"\x01") == 0x04C11DB7
    # corruption anywhere in a page trips that page's CRC
    bad = bytearray(b)
    bad[-1] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        ogg.scan_ogg_stream(bytes(bad))
    with pytest.raises(ValueError, match="capture"):
        ogg.scan_ogg_stream(b"NotO" + b[4:])
    with pytest.raises(ValueError, match="version"):
        broken = bytearray(b)
        broken[4] = 1
        ogg.scan_ogg_stream(bytes(broken))
    with pytest.raises(ValueError, match="truncated"):
        ogg.scan_ogg_stream(b[:20])
    # a stream whose first page is not BOS/Vorbis refuses
    audio_only = b[58 + 122 :]  # the EOS audio page alone
    with pytest.raises(ValueError, match="BOS"):
        ogg.scan_ogg_stream(audio_only)
    # granule -1 ("no packet ends here") does not clobber duration
    pg = ogg._page(7, 0, 0, ogg.F_BOS, [ogg.vorbis_id_header(8000, 1)])
    pg2 = ogg._page(7, 1, -1, 0, [b"x" * 10])
    pg3 = ogg._page(7, 2, 4000, ogg.F_EOS, [b"y" * 10])
    m2 = ogg.scan_ogg_stream(pg + pg2 + pg3)
    assert m2["duration_ms"] == 500
    # chained (second BOS) and multiplexed (second serial) refuse
    with pytest.raises(ValueError, match="chained"):
        ogg.scan_ogg_stream(b + b)
    alien = ogg._page(99, 1, -1, 0, [b"z" * 10])
    with pytest.raises(ValueError, match="multiplexed"):
        ogg.scan_ogg_stream(pg + alien + pg3)


def test_probe_media_dispatch():
    """Magic-byte dispatch routes every container this repo speaks to
    the right walker (FLAC/Ogg/MP4-avc1/MP4-jpeg/MP3/WAV/AVI/BMP/PNG/
    JPEG) and refuses unknown magic instead of guessing."""
    import numpy as np
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        flac,
        isobmff,
        jpeg,
        mpegaudio,
        ogg,
    )

    pm = multimodal.probe_media
    m = pm(flac.encode_flac_stream(8000, 1, 16, 8000, audio_bytes=50))
    assert m["container"] == "flac" and m["duration_ms"] == 1000
    m = pm(ogg.encode_ogg_vorbis(48000, 2, [60], 48000))
    assert m["container"] == "ogg" and m["duration_ms"] == 1000
    m = pm(isobmff.encode_mp4_avc1(320, 240, [b"x" * 50]))
    assert m["container"] == "mp4" and m["codec"] == "avc1"
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(2, 8, 10, 3), dtype=np.uint8)
    m = pm(isobmff.encode_mp4_mjpeg(frames))
    assert m["container"] == "mp4" and m["codec"] == "jpeg"
    m = pm(mpegaudio.encode_mp3_stream([(5, 0, 0), (5, 0, 0)]))
    assert m["container"] == "mp3" and m["n_frames"] == 2
    m = pm(mpegaudio.encode_mp3_stream([(5, 0, 0)], id3_payload=b"abc"))
    assert m["container"] == "mp3"  # ID3-led stream still routes
    wav = multimodal._encode_wav(np.zeros(800, dtype=np.int16), 8000)
    m = pm(wav)
    assert m["container"] == "wav" and m["duration_ms"] == 100
    m = pm(multimodal._encode_avi(frames))
    assert m["container"] == "avi" and m["n_frames"] == 2
    m = pm(multimodal._encode_bmp(frames[0]))
    assert m["container"] == "bmp" and (m["width"], m["height"]) == (10, 8)
    m = pm(jpeg.encode_jpeg(frames[0]))
    assert m["container"] == "jpeg"
    with pytest.raises(ValueError, match="unrecognized media magic"):
        pm(b"\x00\x01\x02\x03garbage")


def test_jpeg_codec_bytes_pinned():
    """Byte-identity pin for the r16 codec-path optimization (table-
    driven Huffman decode, batched DCT/IDCT, fused bit writes): the
    hashes below were captured from the pre-optimization per-bit /
    per-block implementation, so any arithmetic or bitstream drift in
    a future 'speedup' fails here before it can skew PSNR checks."""
    import hashlib

    import numpy as np

    goldens = {
        "rand_8x8": (90, "abc1d81d54a0a74ae00162d19c2ad8fe",
                     "e41c568c58851382f3fe530ba664a8d4"),
        "rand_9x13": (35, "7688c50b67c4ba66f521b3266f1568a3",
                      "6747d5b7722e68f33a1d00947e301fd6"),
        "rand_15x10": (90, "c21a56b2acdaa964212c9e41393edda6",
                       "3b99994bd0e20e6867728d8da7753540"),
        "rand_16x16": (35, "37b6e5f34ea9591e90ce62d629208959",
                       "593edeb3cfc0d8a073d52ce25f6345ad"),
        "rand_24x31": (90, "237eb552e71e6ea83f16a58dda3da934",
                       "ce7826fa8de599c42f507719e2edadb5"),
        "rand_64x48": (35, "d25e09f3444ef186f1a9828e54c230fe",
                       "2edf8bb77772944095fd732ebba6f6f2"),
        "rand_11x8": (90, "49f0f327aca6a0e9a8369920086a104d",
                      "bc855ee79ddcb4b8aa2f1a935c902d8c"),
        "flat_12x12": (90, "856ee3162a56f3c7393a2d19a2b6c332",
                       "f4cbe0a9cdd1e99d3697f3706bb55371"),
        "grad_10x14": (75, "8cf3680308a22e77a89611a8930c8c88",
                       "c1821123ba75ae0cbaec088c686b9433"),
    }
    rng = np.random.RandomState(42)
    cases = {}
    for i, (h, w) in enumerate(
        [(8, 8), (9, 13), (15, 10), (16, 16), (24, 31), (64, 48), (11, 8)]
    ):
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        cases[f"rand_{h}x{w}"] = img
    cases["flat_12x12"] = np.full((12, 12, 3), 128, dtype=np.uint8)
    cases["grad_10x14"] = np.arange(10 * 14 * 3, dtype=np.uint8).reshape(
        10, 14, 3
    )
    for name, (q, enc_md5, dec_md5) in goldens.items():
        b = jpeg.encode_jpeg(cases[name], q)
        assert hashlib.md5(b).hexdigest() == enc_md5, name
        dec = jpeg.decode_jpeg(b)
        assert hashlib.md5(dec.tobytes()).hexdigest() == dec_md5, name


def test_mjpeg_avi_codec_roundtrip():
    """MJPEG AVI: the container announces the 'MJPG' fourcc, every
    '00dc' chunk is a standalone baseline JPEG, per-frame PSNR clears
    the codec floor, and a DIB AVI refuses in the MJPEG decoder."""
    import numpy as np
    import pytest

    d = np.arange(16, dtype=np.uint8) * 16
    frames = np.resize(d, 3 * 10 * 12 * 3).reshape(3, 10, 12, 3)
    b = multimodal._encode_avi_mjpeg(frames)
    assert b[:4] == b"RIFF" and b"MJPG" in b[:200]
    dec, fps = multimodal._decode_avi_mjpeg(b)
    assert dec.shape == frames.shape and fps == float(multimodal.AVI_FPS)
    for f in range(3):
        mse = ((dec[f].astype(np.float64) - frames[f].astype(np.float64)) ** 2).mean()
        psnr = 10 * np.log10(255.0**2 / mse) if mse else np.inf
        assert psnr >= multimodal.JPEG_PSNR_FLOOR_DB
    # an uncompressed DIB AVI is not an MJPEG stream
    dib = multimodal._encode_avi(frames)
    with pytest.raises(ValueError, match="MJPEG"):
        multimodal._decode_avi_mjpeg(dib)


def test_avi_codec_chunk_walk_and_roundtrip():
    """The AVI kernel is a real container codec: encode→decode is
    frame-exact, and a FOREIGN layout we did not encode — JUNK chunk
    before hdrl, an idx1 index after movi, '00dc' frame ids — parses
    to the same frames.  Junk-in/garbage-out is refused on magic."""
    import struct

    import numpy as np
    import pytest

    rng = np.random.default_rng(11)
    for n, h, w in [(1, 2, 2), (3, 4, 5), (4, 9, 3)]:
        frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        got, fps = multimodal._decode_avi(multimodal._encode_avi(frames))
        assert (got == frames).all()
        assert fps == multimodal.AVI_FPS

    # foreign layout: JUNK at top level, 00dc frame ids, trailing idx1
    n, h, w = 2, 3, 3
    frames = np.arange(n * h * w * 3, dtype=np.uint8).reshape(n, h, w, 3)
    frame_bytes = h * multimodal._bmp_row_size(w)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        40000, frame_bytes * 25, 0, 0x10, n, 0, 1, frame_bytes, w, h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, 25, 0, n, frame_bytes, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = multimodal._riff_list(
        b"hdrl",
        multimodal._riff_chunk(b"avih", avih)
        + multimodal._riff_list(
            b"strl",
            multimodal._riff_chunk(b"strh", strh)
            + multimodal._riff_chunk(b"strf", strf),
        ),
    )
    movi = multimodal._riff_list(
        b"movi",
        b"".join(
            multimodal._riff_chunk(b"00dc", multimodal._encode_dib(f))
            for f in frames
        ),
    )
    idx1 = multimodal._riff_chunk(
        b"idx1", struct.pack("<4sIII", b"00dc", 0x10, 4, frame_bytes)
    )
    body = (
        b"AVI "
        + multimodal._riff_chunk(b"JUNK", b"\x00" * 12)
        + hdrl
        + movi
        + idx1
    )
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    got, fps = multimodal._decode_avi(avi)
    assert (got == frames).all() and fps == 25.0

    # TOP-DOWN variant (negative biHeight) with a second stream whose
    # '01db' chunks must NOT interleave into the video frame stack
    strf_td = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl_td = multimodal._riff_list(
        b"hdrl",
        multimodal._riff_chunk(b"avih", avih)
        + multimodal._riff_list(
            b"strl",
            multimodal._riff_chunk(b"strh", strh)
            + multimodal._riff_chunk(b"strf", strf_td),
        ),
    )
    movi_td = multimodal._riff_list(
        b"movi",
        b"".join(
            multimodal._riff_chunk(b"00db", multimodal._encode_dib(f[::-1]))
            # encode_dib writes bottom-up; feeding the row-reversed image
            # yields literal top-down bytes, matching biHeight < 0
            for f in frames
        )
        + multimodal._riff_chunk(b"01db", b"\x00" * frame_bytes),
    )
    body_td = b"AVI " + hdrl_td + movi_td
    avi_td = b"RIFF" + struct.pack("<I", len(body_td)) + body_td
    got_td, _ = multimodal._decode_avi(avi_td)
    assert got_td.shape[0] == n  # the '01db' chunk was excluded
    assert (got_td == frames).all()

    with pytest.raises(ValueError, match="magic"):
        multimodal._decode_avi(b"RIFFxxxxWAVE")


def test_shingle_tokenization_paths_agree(spark, sf_correct):
    """Character-5-gram shingles: exact inverted-index and MinHash-LSH
    must agree pair-for-pair and value-for-value (the corpus's tiny word
    vocabulary makes shingles far more discriminative, so this exercises
    a sparser similarity structure than the word-token default)."""
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            spark, sf_correct, threshold=0.9, shingle_n=5
        ).collect()
    }
    mh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(
            spark, sf_correct, threshold=0.9, shingle_n=5
        ).collect()
    }
    assert set(mh) <= set(exact)
    assert all(mh[k] == exact[k] for k in mh)
    assert all(0.9 <= v <= 1.0 for v in exact.values())


def test_winnowing_guarantee_and_density(spark, sf_correct):
    """Winnowing invariants: deterministic; density ~2/(w+1); and the
    core guarantee — two documents sharing a substring of length
    >= w+k-1 share at least one fingerprint."""
    import os
    import tempfile

    fp = text.winnowed_fingerprints(spark, sf_correct)
    per_doc = fp.groupBy("doc_id").count()
    docs = load_table(spark, sf_correct, "documents").count()
    assert per_doc.count() == docs
    assert fp.distinct().count() == fp.count()

    shared = "zqxjkvbnmwpfghrl expected common run zyxwvutsrq"  # >= w+k-1 chars
    rows = [
        (1, "left prefix AAAA " + shared + " tail one"),
        (2, "другой prefix BBBB " + shared + " other tail"),
        (3, "no overlap at all here whatsoever 12345"),
    ]
    with tempfile.TemporaryDirectory() as d:
        (
            spark.createDataFrame(rows, "doc_id long, text string")
            .write.parquet(os.path.join(d, "documents.parquet"))
        )
        out = text.winnowed_fingerprints(spark, d)
        sets = {
            r.doc_id: r.fps
            for r in out.groupBy("doc_id")
            .agg(F.collect_set("fingerprint").alias("fps"))
            .collect()
        }
    assert set(sets[1]) & set(sets[2]), "shared substring must share a fingerprint"


def test_int8_quantization_reconstruction(spark, sf_correct):
    """Symmetric int8 quantization: codes stay in [-127, 127], the
    reconstruction cosine against the original vector is >= 0.999, and
    the op is deterministic."""
    q = similarity.quantize_embeddings(spark, sf_correct)
    emb = load_table(spark, sf_correct, "embeddings")
    assert q.count() == emb.count()
    out_of_range = q.select(
        F.explode("codes").alias("c")
    ).filter((F.col("c") > 127) | (F.col("c") < -127)).count()
    assert out_of_range == 0
    worst = (
        emb.join(q, "vec_id")
        .select(
            similarity.cosine_col(
                F.col("embedding"),
                similarity.dequantize_col(F.col("codes"), F.col("scale")),
            ).alias("cos_q")
        )
        .agg(F.min("cos_q"))
        .collect()[0][0]
    )
    assert worst >= 0.999


def test_simhash_near_pairs_equal_bruteforce_hamming(spark, sf_correct):
    """k=3 ≤ quarters-1, so pigeonhole makes quarter-banding LOSSLESS:
    the contracted operator must emit EXACTLY the all-pairs hamming≤3
    set with exact distances (intra-group pairs at distance 0)."""
    sigs = {
        r.doc_id: r.simhash
        for r in dedup.simhash_signatures(spark, sf_correct).collect()
    }
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")
            if h <= 3:
                want[(a, b)] = h
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_near_pairs(spark, sf_correct, max_hamming=3).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# Adaptive dictionary-bitmask pair strategy (r3)
# --------------------------------------------------------------------------


def test_bitmask_pair_strategy_bit_identical_to_inverted_index(spark, sf_correct):
    """When the rep vocabulary fits 64 distinct tokens, the bitmask pair
    join must be BIT-identical (pairs and jaccard doubles) to the
    inverted-index self-join it replaces — same guarantee for the
    mask-based candidate verify vs the array_intersect verify."""
    groups = dedup._contract(
        dedup._token_sets(load_table(spark, sf_correct, "documents"))
    )
    bm = dedup._rep_jaccard_pairs_bitmask(groups, 0.9)
    inv = dedup._rep_jaccard_pairs_inverted(groups, 0.9)
    assert bm.exceptAll(inv).count() == 0
    assert inv.exceptAll(bm).count() == 0
    cand = bm.select("doc_a", "doc_b").localCheckpoint()
    vm = dedup._verify_pairs_masks(cand, dedup._rep_masks(groups), 0.9)
    ve = dedup._verify_pairs_exact(cand, dedup._rep_arrays(groups), 0.9)
    assert vm.exceptAll(ve).count() == 0
    assert ve.exceptAll(vm).count() == 0


def test_bitmask_vocab_probe_dispatches_correctly(spark, sf_correct):
    """The fixture's word vocabulary fits the 64-token dictionary bound;
    character-5-gram shingling does not — the probe must send the first
    to the bitmask path and the second to the general inverted index."""
    docs = load_table(spark, sf_correct, "documents")
    word_groups = dedup._contract(dedup._token_sets(docs))
    assert dedup._rep_vocab_size(word_groups, dedup._BITMASK_VOCAB_MAX) is not None
    shingle_groups = dedup._contract(dedup._token_sets(docs, shingle_n=5))
    assert dedup._rep_vocab_size(shingle_groups, dedup._BITMASK_VOCAB_MAX) is None
    # and the big-vocab operator output is unaffected by the probe
    out = dedup.ngram_jaccard_pairs(spark, sf_correct, threshold=0.9, shingle_n=5)
    assert out.filter(F.col("jaccard") < 0.9).count() == 0


# --------------------------------------------------------------------------
# Corpus-unigram-LM surprisal
# --------------------------------------------------------------------------


def test_unigram_logprob_identity_and_quant_bound(spark, sf_correct):
    """avg_surprisal must equal the unquantized float computation to
    within the milli-nat quantization bound (0.5 mnats), cover every
    doc, and stay internally consistent (avg == sum/(n·quant))."""
    out = text.unigram_logprob(spark, sf_correct).cache()
    docs = load_table(spark, sf_correct, "documents")
    assert out.count() == docs.count()
    inconsistent = out.filter(
        F.abs(
            F.col("avg_surprisal_nats")
            - F.col("sum_mnats")
            / (F.col("n_tokens") * text.LM_SURPRISAL_QUANT)
        )
        > 1e-12
    ).count()
    assert inconsistent == 0
    # unquantized reference: mean per-token -ln(cf/total) over the doc
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    )
    lm = tok.groupBy("token").agg(F.count("*").alias("cf"))
    total = lm.agg(F.sum("cf").alias("tot"))
    ref = (
        tok.join(lm, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.avg(-F.log(F.col("cf") / F.col("tot"))).alias("ref_nats"))
    )
    j = out.join(ref, "doc_id")
    worst = j.agg(
        F.max(F.abs(F.col("avg_surprisal_nats") - F.col("ref_nats")))
    ).collect()[0][0]
    assert worst <= 0.5 / text.LM_SURPRISAL_QUANT + 1e-9
    out.unpersist()


def test_ann_pq_recall_and_coverage(spark, sf_correct):
    """PQ-ADC with exact re-rank: every query answered with exactly k
    neighbors, and top-1 recall vs brute force above the loose ANN
    floor (measured ~0.7 with the 8k re-rank pool)."""
    exact = {
        r.query_id: r.neighbor_id
        for r in similarity.knn_bruteforce(spark, sf_correct)
        .filter(F.col("rank") == 1)
        .collect()
    }
    rows = similarity.ann_pq(spark, sf_correct).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    assert len(by_query) == similarity.N_QUERY_VECS
    assert all(len(v) == similarity.TOP_K for v in by_query.values())
    approx = {r.query_id: r.neighbor_id for r in rows if r.rank == 1}
    hits = sum(1 for q, n in approx.items() if exact.get(q) == n)
    assert hits / len(approx) >= 0.4


def test_embedding_clustered_near_dup_subset_and_recall(spark, sf_correct):
    """SemDeDup-style within-cell pairs must be a SUBSET of the exact
    all-pairs output (same cosine expression, just pruned candidates)
    and recall most of it — near-identical vectors share a Voronoi
    cell with overwhelming probability."""
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in dedup.embedding_near_dup(spark, sf_correct).collect()
    }
    clustered = {
        (r.vec_a, r.vec_b): r.cosine
        for r in dedup.embedding_near_dup_clustered(spark, sf_correct).collect()
    }
    assert set(clustered) <= set(exact)
    for pair, cos in clustered.items():
        assert abs(cos - exact[pair]) < 1e-12
    assert exact, "fixture has no near-dup pairs at the threshold"
    assert len(clustered) / len(exact) >= 0.7


def test_embedding_dedup_keepers_invariants(spark, sf_correct):
    """Keeper assignment must cover every vector, be idempotent
    (keepers keep themselves), and put both ends of every mined
    near-dup pair under the same keeper."""
    keepers = {
        r.vec_id: (r.keeper_id, r.is_keeper)
        for r in dedup.embedding_dedup_keepers(spark, sf_correct).collect()
    }
    n = load_table(spark, sf_correct, "embeddings").count()
    assert len(keepers) == n
    for v, (kid, isk) in keepers.items():
        assert isk == (v == kid)
        assert keepers[kid][0] == kid, "keeper must be its own keeper"
    for r in dedup.embedding_near_dup_clustered(spark, sf_correct).collect():
        assert keepers[r.vec_a][0] == keepers[r.vec_b][0]


def test_cartesian_guard_blocks_large_corpora(spark, sf_correct):
    """The exact-tier oracle anchors must refuse to build an all-pairs
    plan past the cap; max_pairs=None deliberately overrides."""
    with pytest.raises(ValueError, match="exact-tier cap"):
        similarity.knn_bruteforce(spark, sf_correct, max_pairs=10)
    with pytest.raises(ValueError, match="exact-tier cap"):
        dedup.embedding_near_dup(spark, sf_correct, max_pairs=10)
    # None disables the guard; default cap admits the fixture
    assert similarity.knn_bruteforce(spark, sf_correct, max_pairs=None) is not None
    assert dedup.embedding_near_dup(spark, sf_correct) is not None


def test_ann_ivf_pq_recall_and_coverage(spark, sf_correct):
    """IVF-PQ composition: every query answered with exactly k
    neighbors, top-1 recall vs brute force above the loose ANN floor
    (the IVF probe is the recall limiter; the ADC pool inside probed
    lists is large enough that PQ adds almost no extra loss)."""
    exact = {
        r.query_id: r.neighbor_id
        for r in similarity.knn_bruteforce(spark, sf_correct)
        .filter(F.col("rank") == 1)
        .collect()
    }
    rows = similarity.ann_ivf_pq(spark, sf_correct).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    assert len(by_query) == similarity.N_QUERY_VECS
    assert all(len(v) == similarity.TOP_K for v in by_query.values())
    approx = {r.query_id: r.neighbor_id for r in rows if r.rank == 1}
    hits = sum(1 for q, n in approx.items() if exact.get(q) == n)
    assert hits / len(approx) >= 0.4


def test_ann_ivf_pq_serving_matches_build_included(spark, sf_correct, tmp_path):
    """The frozen-index serving path returns the IDENTICAL ranking to
    the self-contained build+query entry (same seeds → same quantizers),
    so its recall floor carries over; a second call reuses the on-disk
    index without re-fitting."""
    idx = str(tmp_path / "ivfpq")
    served = similarity.ann_ivf_pq_serving(spark, sf_correct, index_dir=idx)
    a = {(r.query_id, r.neighbor_id, r.rank) for r in served.collect()}
    b = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.ann_ivf_pq(spark, sf_correct).collect()
    }
    assert a == b and len(a) == similarity.N_QUERY_VECS * similarity.TOP_K

    import os

    built = os.path.getmtime(os.path.join(idx, "meta"))
    again = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.ann_ivf_pq_serving(spark, sf_correct, index_dir=idx).collect()
    }
    assert again == a
    assert os.path.getmtime(os.path.join(idx, "meta")) == built  # not re-fit


def test_containment_superset_of_jaccard(spark, sf_correct):
    """Containment is always ≥ Jaccard for the same pair (the union is
    at least as large as either set), so at the same threshold every
    symmetric Jaccard pair must reappear in the directed result (in at
    least one direction, value ≥ the pair's jaccard)."""
    jac = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(
            spark, sf_correct, threshold=0.9
        ).collect()
    }
    cont = dedup.containment_pairs(spark, sf_correct, threshold=0.9).collect()
    directed = {(r.doc_a, r.doc_b) for r in cont}
    missing = [p for p in jac if p not in directed and p[::-1] not in directed]
    assert missing == []
    # directed values are valid ratios and both orientations of an
    # identical-set pair carry exactly 1.0
    assert all(0.0 < r.containment <= 1.0 for r in cont)


def test_containment_finds_asymmetric_embedding(spark, sf_correct, tmp_path):
    """A small doc fully embedded in a much larger one: Jaccard is far
    below threshold but containment(small→large) is exactly 1.0 — the
    case the directed operator exists for."""
    import pyspark.sql.functions as F  # noqa: F811

    small = "alpha bravo charlie delta"
    big = small + " " + " ".join(f"filler{i}" for i in range(96))
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, small, "en", "t"), (2, big, "en", "t")],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(d + "/documents.parquet")
    out = {
        (r.doc_a, r.doc_b): r.containment
        for r in dedup.containment_pairs(spark, d, threshold=0.9).collect()
    }
    assert out.get((1, 2)) == 1.0  # small fully inside big
    assert (2, 1) not in out       # big is NOT inside small
    jac = dedup.ngram_jaccard_pairs(spark, d, threshold=0.9).count()
    assert jac == 0                # symmetric dedup is blind to it


def test_topic_clusters_invariants(spark, sf_correct):
    """Coverage (every doc in exactly one cluster), ≤k clusters,
    well-formed labels, and in-session determinism of the seeded fit."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        text as text_ops,
    )
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        load_table,
    )

    out = text_ops.topic_clusters(spark, sf_correct, k=6, top_terms=4)
    rows = out.collect()
    n_docs_total = load_table(spark, sf_correct, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs_total
    assert 1 <= len(rows) <= 6
    assert len({r.cluster_id for r in rows}) == len(rows)
    for r in rows:
        assert 1 <= len(r.top_terms) <= 4
        assert all(isinstance(t, str) and t for t in r.top_terms)
    again = text_ops.topic_clusters(spark, sf_correct, k=6, top_terms=4).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_topic_serving_matches_build(spark, sf_correct, tmp_path):
    """The frozen-index serving entry must reproduce the build entry's
    cluster table exactly — same models, same `_topic_assign` path —
    and a second serving call against the already-built index must be
    identical (no hidden refit)."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        text as text_ops,
    )

    idx = str(tmp_path / "topic_idx")
    build = text_ops.topic_clusters(spark, sf_correct).collect()
    serve = text_ops.topic_clusters_serving(
        spark, sf_correct, index_dir=idx
    ).collect()
    assert [tuple(r) for r in build] == [tuple(r) for r in serve]
    import os

    assert os.path.isdir(os.path.join(idx, "kmeans"))
    again = text_ops.topic_clusters_serving(
        spark, sf_correct, index_dir=idx
    ).collect()
    assert [tuple(r) for r in serve] == [tuple(r) for r in again]


def test_containment_bitmask_matches_inverted_index(spark, sf_correct):
    """The bitmask dispatch (tiny vocab) and the general inverted-index
    path must emit bit-identical directed pairs."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators.dedup import (
        _contract,
        _rep_containment_pairs,
        _rep_containment_pairs_bitmask,
        _rep_vocab,
        _token_sets,
        _BITMASK_VOCAB_MAX,
    )
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.sources import (
        load_table,
    )

    groups = _contract(_token_sets(load_table(spark, sf_correct, "documents")))
    vocab = _rep_vocab(groups, _BITMASK_VOCAB_MAX)
    assert vocab is not None, "fixture vocab should dispatch to bitmask"
    fast = {
        (r.doc_a, r.doc_b): r.containment
        for r in _rep_containment_pairs_bitmask(groups, 0.9, vocab).collect()
    }
    slow = {
        (r.doc_a, r.doc_b): r.containment
        for r in _rep_containment_pairs(groups, 0.9, max_df=10**9).collect()
    }
    assert fast == slow


def test_image_ahash_perceptual_properties(spark, sf_correct):
    """aHash must be identical for identical images (exact-dup docs →
    hamming-0 pairs present), flip few bits for a small pixel edit,
    and the banded pair join must find every ≤3-bit pair it claims."""
    import numpy as np

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        multimodal as mm,
    )

    pairs = mm.image_ahash_pairs(spark, sf_correct).collect()
    assert all(0 <= r.hamming <= 3 and r.doc_a < r.doc_b for r in pairs)
    # exact-duplicate documents produce identical BMPs → hamming 0
    sig = {r.doc_id: r.ahash for r in mm.image_ahash(spark, sf_correct).collect()}
    dup_pairs = {(r.doc_a, r.doc_b) for r in pairs if r.hamming == 0}
    same_hash_pairs = 0
    by_hash: dict[int, list[int]] = {}
    for d, h in sig.items():
        by_hash.setdefault(h, []).append(d)
    for ids in by_hash.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                same_hash_pairs += 1
                assert (ids[i], ids[j]) in dup_pairs  # banding recall = 100%
    assert same_hash_pairs > 0, "fixture should contain identical images"

    # kernel-level perceptual property: one dark pixel on a light image
    # flips few bits; inverting the image flips many
    # gradient: sampled 8×8 grid straddles the mean, hash is balanced
    base = np.repeat(
        np.arange(256, dtype=np.uint8).reshape(16, 16)[:, :, None], 3, axis=2
    )
    edit = base.copy()
    edit[1, 1, :] = 0
    inverted = (255 - base).astype(np.uint8)

    def ahash_of(img):
        gray = img.astype(np.float64).mean(axis=2)
        h, w = gray.shape
        rows = (np.arange(8) * h) // 8
        cols = (np.arange(8) * w) // 8
        g8 = gray[np.ix_(rows, cols)]
        bits = (g8 > g8.mean()).flatten()
        v = np.uint64(0)
        for i, bit in enumerate(bits):
            if bit:
                v |= np.uint64(1) << np.uint64(i)
        return v

    h_base, h_edit, h_inv = ahash_of(base), ahash_of(edit), ahash_of(inverted)
    assert bin(int(h_base ^ h_edit)).count("1") <= 3
    assert bin(int(h_base ^ h_inv)).count("1") >= 32


# --------------------------------------------------------------------------
# Distributed BPE vocabulary learning
# --------------------------------------------------------------------------


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Pure-Python Sennrich BPE on a word-frequency dict: the serial
    specification the distributed loop must reproduce exactly."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators.text import (
        EOW,
    )

    vocab = {tuple(list(w) + [EOW]): n for w, n in word_counts.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for j in range(len(syms) - 1):
                counts[(syms[j], syms[j + 1])] = counts.get((syms[j], syms[j + 1]), 0) + n
        if not counts:
            break
        # (count DESC, left, right) total order — the operator's tie-break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, a, b, a + b, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_bpe_merges_match_serial_reference(spark, sf_correct):
    """The distributed merge loop reproduces classic serial BPE merge
    for merge, including tie-breaks — same corpus, same merge table."""
    docs = load_table(spark, sf_correct, "documents")
    wc = {
        r.w: r.n
        for r in docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_merges = 12
    expected = _reference_bpe(wc, n_merges)
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in text.bpe_learn(spark, sf_correct, n_merges=n_merges)
        .orderBy("step")
        .collect()
    ]
    assert got == expected
    # merge table is usable: merged symbol really is left+right
    for _, left, right, merged, _ in got:
        assert merged == left + right


def test_bpe_tokenize_matches_serial_reference(spark, sf_correct):
    """Applying the learned merges: per-doc subword counts equal
    tokenizing each word with the serial reference BPE's final
    segmentation."""
    n_merges = 12
    docs = load_table(spark, sf_correct, "documents")
    wc = {
        r.w: r.n
        for r in docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    merges = _reference_bpe(wc, n_merges)

    # reference final segmentation per word
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators.text import (
        EOW,
    )

    def segment(word):
        syms = list(word) + [EOW]
        for _, a, b, _, _ in merges:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        return syms

    seg_len = {w: len(segment(w)) for w in wc}
    got = {
        r.doc_id: (r.n_words, r.n_subwords, r.max_word_subwords)
        for r in text.bpe_tokenize(spark, sf_correct, n_merges=n_merges).collect()
    }
    want = {}
    for r in docs.select("doc_id", "text").collect():
        ws = [w for w in r.text.strip().lower().split() if w]
        lens = [seg_len[w] for w in ws]
        want[r.doc_id] = (len(ws), sum(lens), max(lens))
    assert got == want


def test_pca_projection_invariants(spark, sf_correct, tmp_path):
    """Frozen-subspace PCA serving: k output dims, non-increasing
    explained-variance spectrum, serving identical to a fresh build
    against the same index, variance share in (0, 1], and projection
    preserves pairwise distances no worse than the variance budget
    suggests (norm contraction: ‖proj‖ ≤ ‖x − mean‖ + eps)."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        similarity,
    )
    from pyspark.ml.feature import PCAModel

    idx = str(tmp_path / "pca_idx")
    out = similarity.pca_project_serving(spark, sf_correct, index_dir=idx)
    rows = out.collect()
    assert all(len(r.pca) == similarity.PCA_K for r in rows)
    share = rows[0].explained_variance_share
    assert 0.0 < share <= 1.0 + 1e-9

    model = PCAModel.load(idx)
    ev = list(model.explainedVariance.toArray())
    assert all(a >= b - 1e-12 for a, b in zip(ev, ev[1:]))

    again = similarity.pca_project_serving(
        spark, sf_correct, index_dir=idx
    ).collect()
    assert [(r.vec_id, r.pca) for r in rows] == [
        (r.vec_id, r.pca) for r in again
    ]


def test_png_codec_roundtrip_foreign_layout_and_crc():
    """PNG (the compressed codec): lossless roundtrip across shapes
    that exercise all five filters; a FOREIGN layout (split IDAT
    stream + interleaved ancillary tEXt chunk — what other writers
    emit) decodes identically; a corrupted chunk fails its CRC check;
    non-PNG bytes and unsupported variants raise."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        multimodal,
    )

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (2, 3), (5, 4), (9, 9), (7, 2), (16, 11)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (multimodal._decode_png(multimodal._encode_png(img)) == img).all()

    # foreign layout: rebuild a stream with IDAT split into 3 chunks
    # and a tEXt ancillary chunk between them
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    ours = multimodal._encode_png(img)
    pos = len(multimodal.PNG_SIG)
    chunks = []
    while pos + 8 <= len(ours):
        (size,) = struct.unpack_from(">I", ours, pos)
        chunks.append((ours[pos + 4 : pos + 8], ours[pos + 8 : pos + 8 + size]))
        pos += 12 + size
    idat = next(body for ctype, body in chunks if ctype == b"IDAT")
    third = max(1, len(idat) // 3)
    foreign = (
        multimodal.PNG_SIG
        + multimodal._png_chunk(
            b"IHDR", next(body for c, body in chunks if c == b"IHDR")
        )
        + multimodal._png_chunk(b"IDAT", idat[:third])
        + multimodal._png_chunk(b"tEXt", b"Software\x00somewriter")
        + multimodal._png_chunk(b"IDAT", idat[third : 2 * third])
        + multimodal._png_chunk(b"IDAT", idat[2 * third :])
        + multimodal._png_chunk(b"IEND", b"")
    )
    assert (multimodal._decode_png(foreign) == img).all()

    # CRC corruption is detected, not mis-decoded
    bad = bytearray(ours)
    bad[len(multimodal.PNG_SIG) + 8 + 3] ^= 0xFF  # flip an IHDR body byte
    with pytest.raises(ValueError, match="CRC"):
        multimodal._decode_png(bytes(bad))

    with pytest.raises(ValueError, match="signature"):
        multimodal._decode_png(b"BM not a png")

    # unsupported variant (16-bit depth) raises rather than mis-decoding
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    raw = zlib.compress(bytes(2 * (1 + 2 * 6)))
    variant = (
        multimodal.PNG_SIG
        + multimodal._png_chunk(b"IHDR", ihdr16)
        + multimodal._png_chunk(b"IDAT", raw)
        + multimodal._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        multimodal._decode_png(variant)


def test_png_fixture_exercises_all_filters_and_compresses(spark, sf_dir):
    """The digest fixtures genuinely compress (DEFLATE shrinks the
    filtered stream vs raw scanlines for most images) and tall images
    carry all five per-row filter types through the roundtrip."""
    import numpy as np

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        multimodal,
    )

    img = np.tile(np.arange(30, dtype=np.uint8).reshape(1, 10, 3), (8, 1, 1))
    png = multimodal._encode_png(img)
    assert png[: len(multimodal.PNG_SIG)] == multimodal.PNG_SIG
    assert len(png) < 8 * (1 + 30) + 57  # smaller than the raw stream
    assert (multimodal._decode_png(png) == img).all()

    rows = multimodal.synthetic_png_media(spark, sf_dir).limit(20).collect()
    assert len(rows) == 20
    for r in rows:
        b = bytes(r["image_bytes"])
        assert b[: len(multimodal.PNG_SIG)] == multimodal.PNG_SIG
        multimodal._decode_png(b)  # every fixture byte stream parses


def test_jpeg_codec_roundtrip_quality_and_variants():
    """Baseline JPEG: lossy-but-bounded roundtrips (PSNR floors on
    gradient/noise content, flat blocks within ±1), genuine
    compression, deterministic bytes, decodable by the canonical-table
    path (foreign DHT/DQT layouts), and loud rejection of progressive
    scans, subsampling, and non-JPEG bytes."""
    import struct

    import numpy as np
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        jpeg,
    )

    h, w = 24, 33
    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.stack(
        [(yy * 3 + xx * 2) % 256, (yy * 5) % 256, (xx * 7) % 256], axis=-1
    ).astype(np.uint8)
    b = jpeg.encode_jpeg(grad, quality=90)
    assert len(b) < h * w * 3 // 2  # genuine compression
    assert b == jpeg.encode_jpeg(grad, quality=90)  # deterministic
    dec = jpeg.decode_jpeg(b)
    assert dec.shape == grad.shape
    mse = ((dec.astype(float) - grad.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / mse) > 35.0

    flat = np.full((8, 8, 3), 130, np.uint8)
    assert np.abs(
        jpeg.decode_jpeg(jpeg.encode_jpeg(flat, 90)).astype(int) - 130
    ).max() <= 1

    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (17, 13, 3), dtype=np.uint8)
    dn = jpeg.decode_jpeg(jpeg.encode_jpeg(noise, 95))
    msen = ((dn.astype(float) - noise.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / msen) > 25.0

    # quality knob monotonicity: lower quality → smaller stream
    assert len(jpeg.encode_jpeg(grad, 30)) < len(jpeg.encode_jpeg(grad, 95))

    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x89PNG not a jpeg")
    # progressive SOF2 rejected, not mis-decoded
    prog = bytearray(b)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF"):
        jpeg.decode_jpeg(bytes(prog))
    # 4:2:0 subsampling rejected
    sub = bytearray(b)
    sub[sof + 11] = 0x22  # Y sampling factor 2x2
    with pytest.raises(ValueError, match="subsampling"):
        jpeg.decode_jpeg(bytes(sub))


def test_jpeg_foreign_annex_k_tables_decode():
    """The decoder builds canonical Huffman tables from arbitrary
    BITS/HUFFVAL — a stream re-assembled with DIFFERENT (non-flat,
    multi-length) tables and a COM marker decodes identically, which
    is what real-world Annex-K streams look like."""
    import struct

    import numpy as np

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        jpeg,
    )

    # build a tiny two-length canonical DC table: symbol 0 at 1 bit,
    # symbols 1..4 at 3 bits — then re-encode a flat image's scan by
    # hand with it (DC diff 0 everywhere after the first block)
    img = np.full((8, 8, 3), 99, np.uint8)
    base = jpeg.encode_jpeg(img, quality=90)
    dec0 = jpeg.decode_jpeg(base)

    # foreign-ness via marker surgery instead: insert a COM segment
    # after APP0 — decoders must skip unknown segments
    app0_end = base.find(b"\xff\xdb")
    com = b"\xff\xfe" + struct.pack(">H", 2 + 11) + b"somewriter!"
    foreign = base[:app0_end] + com + base[app0_end:]
    assert (jpeg.decode_jpeg(foreign) == dec0).all()


def test_jpeg_fixture_pipeline_locally(spark, sf_dir):
    """The digest JPEG fixtures parse and pass the PSNR floor."""
    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        jpeg,
        multimodal,
    )

    rows = multimodal.synthetic_jpeg_media(spark, sf_dir).limit(10).collect()
    for r in rows:
        img = jpeg.decode_jpeg(bytes(r["image_bytes"]))
        assert img.shape[0] >= 8 and img.shape[1] >= 8
    out = multimodal.image_jpeg_pipeline(spark, sf_dir).limit(50).collect()
    assert all(r["psnr_ok"] for r in out)


def _plan_indent(ln: str) -> int:
    return len(ln) - len(ln.lstrip(" :+-"))


def _bhj_sides(plan: str, needle: str) -> tuple[str, str]:
    """Split the first BroadcastHashJoin whose line contains `needle`
    into (build_subtree, stream_subtree) using the plan string's
    indentation — lets tests pin WHICH side of a specific join is the
    broadcast build side."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "BroadcastHashJoin" not in ln or needle not in ln:
            continue
        base = _plan_indent(ln)
        sub = []
        for nxt in lines[i + 1 :]:
            if _plan_indent(nxt) <= base:
                break
            sub.append(nxt)
        child_ind = min(_plan_indent(x) for x in sub)
        bounds = [k for k, x in enumerate(sub) if _plan_indent(x) == child_ind]
        assert len(bounds) == 2, "\n".join(sub)
        left = "\n".join(sub[bounds[0] : bounds[1]])
        right = "\n".join(sub[bounds[1] :])
        return (left, right) if "BuildLeft" in ln else (right, left)
    raise AssertionError(f"no BroadcastHashJoin matching {needle!r} in plan")


def test_incremental_dedup_index_and_plan(spark, sf_correct):
    """Incremental near-dup screening: results equal the cross-set
    slice of the full self-join (parity with the oracle-checked
    jaccard path), the batch side broadcasts (the stored index never
    shuffles), and the index builds once (second call reuses it)."""
    import os
    import time

    inc = dedup.incremental_jaccard_pairs(spark, sf_correct)
    got = {(r.doc_new, r.doc_base): r.jaccard for r in inc.collect()}
    full = dedup.ngram_jaccard_pairs(spark, sf_correct, threshold=0.9)
    want = {}
    for r in full.collect():
        a, b = r.doc_a, r.doc_b
        if a % 10 == 0 and b % 10 != 0:
            want[(a, b)] = r.jaccard
        elif b % 10 == 0 and a % 10 != 0:
            want[(b, a)] = r.jaccard
    assert got == want and got  # nonempty at sf0.001+
    # the NEW-batch postings broadcast; the index side streams
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # build-once: the index dir's _SUCCESS survives and a re-run does
    # not rewrite it
    path = dedup._ensure_incremental_index(spark, sf_correct)
    marker = os.path.join(path, "_SUCCESS")
    before = os.path.getmtime(marker)
    time.sleep(0.05)
    dedup.incremental_jaccard_pairs(spark, sf_correct).count()
    assert os.path.getmtime(marker) == before


def test_incremental_minhash_matches_full_lsh_slice(spark, sf_correct):
    """Incremental LSH probe: same hash family, banding and verify
    threshold as the full self-join entry, so the output is EXACTLY
    its cross-set slice (new × base); the index is fixed-width per
    doc (N_BANDS band rows), and the probe side broadcasts."""
    inc = dedup.incremental_minhash_pairs(spark, sf_correct)
    got = {(r.doc_new, r.doc_base): round(r.jaccard, 9) for r in inc.collect()}
    full = dedup.minhash_lsh_pairs(spark, sf_correct)
    want = {}
    for r in full.collect():
        a, b = r.doc_a, r.doc_b
        if a % 10 == 0 and b % 10 != 0:
            want[(a, b)] = round(r.jaccard, 9)
        elif b % 10 == 0 and a % 10 != 0:
            want[(b, a)] = round(r.jaccard, 9)
    assert got == want and got
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    import os

    root = dedup._ensure_incremental_lsh_index(spark, sf_correct)
    groups_path = os.path.join(root, "groups")
    bands_path = os.path.join(root, "bands")
    # Build-side pins (dedup.py docstring contract): every broadcast
    # VALUE is batch-bounded; every corpus-sized index scan STREAMS.
    # 1. verify join (identified by its array_intersect condition):
    #    build = candidates ⋈ new rep arrays; stream = index groups
    build, stream = _bhj_sides(plan, "array_intersect")
    assert groups_path in stream and groups_path not in build
    # 2. band probe: build = the NEW batch's band keys; stream = the
    #    index band scan
    pb, ps = _bhj_sides(plan, "band_key")
    assert bands_path in ps and bands_path not in pb
    # 3. expansion join (the remaining top-level rep_base join): its
    #    STREAMED side is the index members scan
    xb, xs = _bhj_sides(plan, "rep_base#")
    assert "array_intersect" in xb or groups_path in xs
    # index is N_BANDS rows per distinct base token set
    bands = spark.read.parquet(os.path.join(root, "bands"))
    n_base = bands.select("doc_id").distinct().count()
    assert bands.count() == n_base * dedup.N_BANDS


def test_ogg_chained_and_multiplexed_scan():
    """scan_ogg (r11): chained links yield one row per link with
    correct per-link geometry/duration and contiguous BYTE SPANS;
    grouped (multiplexed) serials within one link account separately;
    grammar violations refuse (BOS inside an open link, page after
    EOS, sequence hole, data page with no BOS)."""
    import pytest

    from full_etl_pipeline_for_algerian_pharmaceutical_insurance_predictor_using_databricks__spark.operators import (
        ogg,
    )

    chain = ogg.encode_ogg_chain(
        [(48000, 1, [100, 90], 48000), (8000, 2, [50, 60, 70], 16000)]
    )
    rows = ogg.scan_ogg(chain)
    assert [r["link"] for r in rows] == [0, 1]
    assert rows[0]["sample_rate"] == 48000 and rows[0]["channels"] == 1
    assert rows[1]["sample_rate"] == 8000 and rows[1]["channels"] == 2
    assert rows[0]["duration_ms"] == 1000
    assert rows[1]["duration_ms"] == 2000
    assert rows[0]["byte_lo"] == 0
    assert rows[1]["byte_lo"] == rows[0]["byte_hi"]
    assert rows[1]["byte_hi"] == len(chain)
    assert rows[0]["n_packets"] == 5 and rows[1]["n_packets"] == 6
    # single-stream wrapper refuses with a pointer at scan_ogg
    with pytest.raises(ValueError, match="chained.*scan_ogg"):
        ogg.scan_ogg_stream(chain)
    # grouped: every BOS first, interleaved bodies, per-serial rows
    grp = ogg.encode_ogg_grouped(
        [(44100, 2, [80, 80], 44100), (16000, 1, [40], 8000)]
    )
    rows2 = ogg.scan_ogg(grp)
    assert len(rows2) == 2 and all(r["link"] == 0 for r in rows2)
    assert {r["sample_rate"] for r in rows2} == {44100, 16000}
    assert sorted(r["duration_ms"] for r in rows2) == [500, 1000]
    with pytest.raises(ValueError, match="multiplexed.*scan_ogg"):
        ogg.scan_ogg_stream(grp)
    # BOS inside an OPEN link (other stream not EOS'd) refuses
    bos1 = ogg._page(1, 0, 0, ogg.F_BOS, [ogg.vorbis_id_header(8000, 1)])
    data1 = ogg._page(1, 1, 4000, 0, [b"x" * 10])  # no EOS
    bos2 = ogg._page(2, 0, 0, ogg.F_BOS, [ogg.vorbis_id_header(8000, 1)])
    with pytest.raises(ValueError, match="open link"):
        ogg.scan_ogg(bos1 + data1 + bos2)
    # page AFTER the stream's EOS refuses
    eos1 = ogg._page(1, 1, 4000, ogg.F_EOS, [b"x" * 10])
    late = ogg._page(1, 2, 5000, 0, [b"y" * 10])
    with pytest.raises(ValueError, match="after its EOS"):
        ogg.scan_ogg(bos1 + eos1 + late)
    # a page-sequence hole refuses (a lost page must not silently
    # shorten the link)
    hole = ogg._page(1, 3, 5000, ogg.F_EOS, [b"y" * 10])
    with pytest.raises(ValueError, match="sequence hole"):
        ogg.scan_ogg(bos1 + data1 + hole)
