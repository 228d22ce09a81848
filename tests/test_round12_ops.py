"""Round-12 regression tests.

Covers: the REAL PNG decode path (zlib inflate + all-five-filter
unfilter — VERDICT r11 #3), the FIM rate gate (VERDICT r11 #7), the
dedup-policy composite funnel pins (VERDICT r11 #6), the corpus-derived
canonical-dedup offset (ADVICE r11), the strengthened IVF-PQ artifact
fingerprint (ADVICE r11), and the registry non-empty-doc guarantee
(ADVICE r11: two round-11 keys registered doc="" because .format()
chained onto the docstring literal turned it into an expression).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from airbnb_listings_reviews_data_engineering_spark.operators.multimodal import (
    _png_bytes,
    _png_decode_gray,
)

SF001 = "/root/testdata/sf0.01"


def _duck(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


# --- real PNG decode ---------------------------------------------------------


@pytest.mark.parametrize("filtered", [False, True])
@pytest.mark.parametrize(
    "w,h,seed", [(16, 16, 0), (17, 23, 5), (64, 64, 499), (1, 7, 3)]
)
def test_png_roundtrip_exact(w, h, seed, filtered):
    """Encode -> decode recovers every pixel of the deterministic
    formula; with filtered=True the height >= 5 cases exercise all five
    PNG filter types (scanline y uses filter y % 5)."""
    blob = _png_bytes(w, h, seed=seed, filtered=filtered)
    dw, dh, px = _png_decode_gray(blob)
    assert (dw, dh) == (w, h)
    expect = bytes(
        (x * 7 + y * 13 + seed) % 256 for y in range(h) for x in range(w)
    )
    assert bytes(px) == expect


def test_png_filtered_bytes_differ_from_unfiltered():
    """The filtered encoding must actually change the stored scanlines
    (otherwise the 'decoder must unfilter' claim is vacuous)."""
    import zlib

    def idat(blob: bytes) -> bytes:
        import struct

        off = 8
        out = bytearray()
        while off + 8 <= len(blob):
            ln = struct.unpack(">I", blob[off : off + 4])[0]
            if blob[off + 4 : off + 8] == b"IDAT":
                out += blob[off + 8 : off + 8 + ln]
            off += 12 + ln
        return zlib.decompress(bytes(out))

    plain = idat(_png_bytes(20, 10, seed=1, filtered=False))
    filt = idat(_png_bytes(20, 10, seed=1, filtered=True))
    assert plain != filt
    # filter-type bytes: plain all 0, filtered cycles 0..4
    assert {plain[y * 21] for y in range(10)} == {0}
    assert {filt[y * 21] for y in range(10)} == {0, 1, 2, 3, 4}


def test_png_decode_rejects_malformed():
    blob = _png_bytes(16, 16)
    with pytest.raises(ValueError):
        _png_decode_gray(b"not a png at all")
    with pytest.raises(Exception):
        _png_decode_gray(blob[:40])  # truncated IDAT
    # RGB color type is out of profile -> ValueError, not garbage
    import struct

    bad = bytearray(blob)
    # IHDR data starts at offset 16; color type is byte 9 of the data
    bad[16 + 9] = 2
    with pytest.raises(ValueError):
        _png_decode_gray(bytes(bad))


def test_decode_png_stats_nulls_on_bad_payload(spark):
    """One malformed object must yield NULL fields, never abort."""
    from airbnb_listings_reviews_data_engineering_spark.operators import (
        multimodal as MM,
    )

    good = _png_bytes(16, 16, seed=7, filtered=True)
    df = spark.createDataFrame(
        [(7, bytearray(good)), (8, bytearray(b"\x89PNG garbage"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in MM.decode_png_stats(df).collect()}
    assert rows[7]["width"] == 16 and rows[7]["n_pixels"] == 256
    s = sum((x * 7 + y * 13 + 7) % 256 for x in range(16) for y in range(16))
    assert rows[7]["sum_intensity"] == s
    assert rows[7]["mean_intensity_e4"] == (s * 10000) // 256
    assert rows[8]["width"] is None and rows[8]["sum_intensity"] is None


def test_dhash_real_brightness_twin_is_near_not_equal(spark, sf_dir):
    """The perceptual claim, asserted: a +1-brightness twin changes
    every file byte (different md5) yet moves only wraparound dHash
    bits — hamming must be small but the FILES must differ."""
    import hashlib

    from airbnb_listings_reviews_data_engineering_spark.operators.multimodal import (
        _png_bytes,
    )
    from airbnb_listings_reviews_data_engineering_spark.plans import (
        all_queries,
    )

    rows = all_queries()["mm_dhash_real"].fn(spark, sf_dir).collect()
    assert len(rows) == 100
    hams = [r["twin_hamming"] for r in rows]
    # structure-preserving shift: well under half the 64 bits move;
    # typically only cells straddling a 255->0 wrap flip
    assert max(hams) <= 24 and sorted(hams)[len(hams) // 2] <= 8
    for r in rows[:3]:
        a = _png_bytes(16 + r["doc_id"] % 48, 16 + (r["doc_id"] * 7) % 48,
                       seed=r["doc_id"], filtered=True)
        b = _png_bytes(16 + r["doc_id"] % 48, 16 + (r["doc_id"] * 7) % 48,
                       seed=r["doc_id"] + 1, filtered=True)
        assert hashlib.md5(a).hexdigest() != hashlib.md5(b).hexdigest()


def test_png_dhash_nulls_on_bad_payload(spark):
    from airbnb_listings_reviews_data_engineering_spark.operators import (
        multimodal as MM,
    )

    good = _png_bytes(18, 16, seed=3, filtered=True)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in MM.png_dhash(df).collect()}
    assert rows[1]["dhash_hi"] is not None and rows[1]["dhash_lo"] is not None
    assert 0 <= rows[1]["dhash_hi"] < 2**32 and 0 <= rows[1]["dhash_lo"] < 2**32
    assert rows[2]["dhash_hi"] is None


def test_image_quality_filter_drops_exactly_the_blanks(spark, sf_dir):
    """Every planted flat image (doc_id % 9 == 0: constant luminance,
    variance exactly 0) is dropped; every textured image survives."""
    from airbnb_listings_reviews_data_engineering_spark.plans import (
        all_queries,
    )

    rows = all_queries()["mm_image_quality_filter"].fn(spark, sf_dir).collect()
    assert len(rows) == 120
    dropped = {r["doc_id"] for r in rows if not r["keep"]}
    assert dropped == {i for i in range(120) if i % 9 == 0}
    for r in rows:
        if r["doc_id"] % 9 == 0:
            assert r["var_e4"] == 0
            assert r["mean_e4"] == (r["doc_id"] % 256) * 10000
        else:
            assert r["var_e4"] >= 1_000_000  # textured: variance ~5461


def test_vad_segments_are_maximal_runs(spark, sf_dir):
    """Segments must be disjoint maximal runs of above-threshold
    windows: within a doc, sorted segments never touch or overlap, and
    re-deriving the runs from the raw window RMS reproduces them."""
    from airbnb_listings_reviews_data_engineering_spark.operators import (
        multimodal as MM,
    )
    from airbnb_listings_reviews_data_engineering_spark.plans import (
        all_queries,
    )
    from airbnb_listings_reviews_data_engineering_spark.plans.registry import (
        load,
    )

    segs = all_queries()["mm_audio_vad_segments"].fn(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in segs:
        assert r["start_win"] <= r["end_win"]
        assert r["n_win"] == r["end_win"] - r["start_win"] + 1
        by_doc.setdefault(r["doc_id"], []).append(
            (r["start_win"], r["end_win"])
        )
    for doc, spans in by_doc.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 + 1 < s2, (doc, spans)  # maximal: a gap separates runs
    # ground truth from the raw windows (one sample doc)
    ids = (
        load(spark, sf_dir, "documents")
        .filter("doc_id = 7")
        .select("doc_id")
    )
    rms = MM.audio_window_rms(
        MM.synthesize_pcm(ids, "doc_id", n_samples=256), window=16
    ).collect()
    above = sorted(r["win_idx"] for r in rms if r["rms_e4"] > 5_900_000)
    runs, cur = [], None
    for wi in above:
        if cur and wi == cur[1] + 1:
            cur[1] = wi
        else:
            cur = [wi, wi]
            runs.append(cur)
    assert [(a, b) for a, b in runs] == sorted(by_doc.get(7, []))


# --- FIM rate gate -----------------------------------------------------------


def test_fim_rate_pinned_at_gate_scale():
    """The hash gate applies FIM to 230 of 500 eligible docs at sf0.01
    (deterministic — a changed gate hash or rate constant moves this)."""
    from airbnb_listings_reviews_data_engineering_spark.plans import (
        all_queries,
    )

    con = _duck(SF001)
    rows = con.execute(all_queries()["text_fim_transform"].oracle).fetchall()
    assert len(rows) == 500
    applied = sum(1 for r in rows if r[4])
    assert applied == 230
    # the gate is a rate, not a floor: roughly half, never all-or-none
    assert 0.3 < applied / 500 < 0.7


def test_fim_gate_independent_of_pivot_hash(spark, sf_dir):
    """Gated-out docs pass through verbatim; gated-in docs reorder —
    and the applied set is NOT simply 'every other doc' (hash gate,
    not a modulo stripe)."""
    from airbnb_listings_reviews_data_engineering_spark.plans import (
        all_queries,
    )

    out = all_queries()["text_fim_transform"].fn(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    applied_ids = sorted(r["doc_id"] for r in out if r["fim_applied"])
    assert 0 < len(applied_ids) < len(out)
    for r in out:
        if not r["fim_applied"]:
            assert r["fim_text"] == docs[r["doc_id"]]
            assert r["p1"] == 0 and r["p2"] == 0
    # not a parity stripe
    assert {i % 2 for i in applied_ids} == {0, 1}


# --- dedup-policy composite ---------------------------------------------------


def test_dedup_policy_funnel_pinned_at_gate_scale():
    """Funnel counts at sf0.01, pinned: 718 raw (500 base + 72 exact
    copies + 46 canonical variants + 100 near-dups), stage 1 absorbs
    exactly the 118 exact+canonical plants, stage 2 folds 124 docs
    into 476 clusters (100 planted near-dup pairs + 24 natural
    near-dups the LSH family consistently finds in this corpus)."""
    from airbnb_listings_reviews_data_engineering_spark.plans import (
        all_queries,
    )

    con = _duck(SF001)
    rows = sorted(
        con.execute(all_queries()["pipeline_dedup_policy"].oracle).fetchall()
    )
    assert rows == [
        (0, "raw", 718, 0, 718),
        (1, "canonical_exact", 600, 118, 600),
        (2, "neardup_soft_weight", 600, 0, 476),
    ]


def test_dedup_policy_spark_invariants(spark, sf_dir):
    """Structural invariants at sf0.001 (Spark side): the funnel is
    conserved (docs_out = docs_in - dropped), the soft stage drops
    nothing, and at least the planted near-dups fold into clusters."""
    from airbnb_listings_reviews_data_engineering_spark.plans import (
        all_queries,
    )

    rows = {
        r["stage_id"]: r
        for r in all_queries()["pipeline_dedup_policy"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {0, 1, 2}
    raw, exact, soft = rows[0], rows[1], rows[2]
    assert exact["n_docs"] == raw["n_docs"] - exact["n_dropped"]
    assert exact["n_dropped"] >= 13  # 8 exact + 5 canonical plants at sf0.001
    assert soft["n_docs"] == exact["n_docs"] and soft["n_dropped"] == 0
    assert soft["n_units"] <= soft["n_docs"] - 10  # 10 near-dup plants fold


# --- corpus-derived canonical offset ------------------------------------------


def test_canon_offset_tracks_corpus_scale():
    from airbnb_listings_reviews_data_engineering_spark.plans.pipeline_ext import (
        _canon_offset,
    )

    # sf0.001 and sf0.01 share the 500-doc corpus (ids 0..499)
    assert _canon_offset("/root/testdata/sf0.001") == 1000
    assert _canon_offset(SF001) == 1000
    assert _canon_offset("/root/testdata/sf0.1") == 10000
    # fallback on a corpus with no footer stats -> the gate constant
    assert _canon_offset("/nonexistent") == 1000


# --- IVF-PQ artifact fingerprint ----------------------------------------------


def test_ivfpq_fingerprint_sensitive_to_mtime_ns_and_size(spark, tmp_path):
    """Same row count + same whole-second mtime must still change the
    artifact path when a part file's content timestamp (ns) or size
    changes (ADVICE r11: truncated-second fingerprints served stale
    codebooks on in-place regeneration)."""
    from airbnb_listings_reviews_data_engineering_spark.plans.pipeline_ext import (
        _ivfpq_artifact_path,
    )

    d = tmp_path / "sfx"
    d.mkdir()
    src = "/root/testdata/sf0.001/embeddings.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, d / "embeddings.parquet")
        part = next(
            os.path.join(r, f)
            for r, _, fs in os.walk(d / "embeddings.parquet")
            for f in fs
            if f.endswith(".parquet")
        )
    else:
        shutil.copy(src, d / "embeddings.parquet")
        part = str(d / "embeddings.parquet")
    p0 = _ivfpq_artifact_path(spark, str(d))
    st = os.stat(part)
    # +1 nanosecond, same whole second — the exact blind spot ADVICE
    # r11 named (int(getmtime) is identical before and after)
    os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    p1 = _ivfpq_artifact_path(spark, str(d))
    assert p1 != p0
    # restoring the original timestamp restores the original path
    # (the digest is a pure function of name/size/mtime_ns)
    os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert _ivfpq_artifact_path(spark, str(d)) == p0


# --- registry docs -------------------------------------------------------------


def test_every_registered_key_has_a_doc():
    """doc is read LIVE from fn.__doc__ (post-definition .format()
    lands); no key may register with an empty semantics cell."""
    from airbnb_listings_reviews_data_engineering_spark.plans import (
        all_queries,
    )

    empty = [k for k, s in all_queries().items() if not (s.doc or "").strip()]
    assert empty == []
    docs = all_queries()
    # the two ADVICE r11 offenders now carry substituted constants
    assert "50 %" in docs["text_fim_transform"].doc
    assert "every 11th doc" in docs["dedup_canonical_text"].doc
    assert "{mintok}" not in docs["text_fim_transform"].doc
    assert "{mod}" not in docs["dedup_canonical_text"].doc
