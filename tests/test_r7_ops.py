"""Ground-truth unit tests for the round-7 operator families
X166-X177: hand-computed expectations on tiny crafted inputs, plus
golden invariance tests for the two rows-only families (zlib
compression profile, dHash perceptual fingerprints)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# X166 — compression profile
# ---------------------------------------------------------------------------

def test_compression_profile_separates_repetition_from_noise(spark):
    from sync_cosmos_db_spark.operators.text import compression_profile

    rep = "spam ham " * 500       # highly compressible
    short = "Xq9#kL"               # zlib overhead dominates: ratio > 1
    df = spark.createDataFrame(
        [(1, "a", rep), (2, "b", short)], "id long, g string, t string")
    rows = {r["g"]: r for r in
            compression_profile(df, "g", "id", "t").collect()}
    assert rows["a"]["mean_ratio"] < 0.05
    assert rows["a"]["n_high_redundancy"] == 1
    assert rows["b"]["mean_ratio"] > 0.95
    assert rows["b"]["n_incompressible"] == 1


def test_compression_profile_golden_ratio(spark):
    """The per-doc ratio must be exactly len(zlib(level 6))/len —
    pinned against a locally computed golden so the operator can't
    silently change compressor level or rounding."""
    import zlib

    from sync_cosmos_db_spark.operators.text import compression_profile

    text = "the quick brown fox jumps over the lazy dog " * 10
    raw = text.encode()
    golden = math.floor(len(zlib.compress(raw, 6)) / len(raw) * 1e4
                        + 0.5) / 1e4
    df = spark.createDataFrame([(1, "g", text)],
                               "id long, g string, t string")
    row = compression_profile(df, "g", "id", "t").collect()[0]
    assert row["mean_ratio"] == golden
    assert row["min_ratio"] == golden == row["max_ratio"]


def test_compression_profile_empty_doc_ratio_one(spark):
    from sync_cosmos_db_spark.operators.text import compression_profile

    df = spark.createDataFrame([(1, "g", ""), (2, "g", None)],
                               "id long, g string, t string")
    row = compression_profile(df, "g", "id", "t").collect()[0]
    assert row["n_docs"] == 2 and row["mean_ratio"] == 1.0


# ---------------------------------------------------------------------------
# X167 — NFC audit
# ---------------------------------------------------------------------------

def test_nfc_audit_detects_decomposed_forms(spark):
    from sync_cosmos_db_spark.operators.text import nfc_audit

    df = spark.createDataFrame(
        [("g", "café"),      # e + combining acute -> é (4+1 -> 4)
         ("g", "café"),       # already composed -> unchanged
         ("g", "plain ascii")],
        "g string, t string")
    row = nfc_audit(df, "g", "t").collect()[0]
    assert row["n_docs"] == 3
    assert row["n_changed"] == 1
    assert row["chars_before"] == 5 + 4 + 11
    assert row["chars_after"] == 4 + 4 + 11


# ---------------------------------------------------------------------------
# X168 — Zipf slope
# ---------------------------------------------------------------------------

def test_zipf_slope_exact_minus_one_on_zipfian_counts(spark):
    """Frequencies f(r) = 720/r for ranks 1..6 are exactly Zipfian:
    ln f = ln 720 - 1*ln r, so OLS slope = -1, intercept = ln 720."""
    from sync_cosmos_db_spark.operators.text import zipf_slope

    toks = []
    for r, tok in enumerate("abcdef", start=1):
        toks += [tok] * (720 // r)
    df = spark.createDataFrame([("g", " ".join(toks))],
                               "g string, t string")
    row = zipf_slope(df, "g", "t", top_ranks=6).collect()[0]
    assert row["n_ranks"] == 6
    assert row["slope"] == -1.0
    assert abs(row["intercept"] - math.log(720)) < 1e-3


def test_zipf_slope_caps_ranks(spark):
    from sync_cosmos_db_spark.operators.text import zipf_slope

    df = spark.createDataFrame(
        [("g", " ".join(f"t{i}" for i in range(50)))], "g string, t string")
    assert zipf_slope(df, "g", "t", top_ranks=10).collect()[0][
        "n_ranks"] == 10


# ---------------------------------------------------------------------------
# X169 — script mix
# ---------------------------------------------------------------------------

def test_script_mix_hand_counted(spark):
    from sync_cosmos_db_spark.operators.text import script_mix_profile

    # 5 Latin + 6 Cyrillic + 2 Han + 3 digits + 2 spaces = 18 chars
    df = spark.createDataFrame([("g", "abcde Привет 中文123")],
                               "g string, t string")
    row = script_mix_profile(df, "g", "t").collect()[0]
    nw = 16.0
    assert row["latin_share"] == round(5 / nw, 4)
    assert row["cyrillic_share"] == round(6 / nw, 4)
    assert row["han_share"] == round(2 / nw, 4)
    assert row["digit_share"] == round(3 / nw, 4)
    assert row["n_mixed_script"] == 1


# ---------------------------------------------------------------------------
# X170 — max token run
# ---------------------------------------------------------------------------

def test_max_token_run_hand_cases(spark):
    from sync_cosmos_db_spark.operators.text import max_token_run

    df = spark.createDataFrame(
        [(1, "a a a b b"), (2, "x y x y"), (3, ""), (4, "solo"),
         (5, "b b c c c c a")],
        "doc_id long, text string")
    rows = {r["id"]: r for r in
            max_token_run(df, "doc_id", "text").collect()}
    assert (rows[1]["max_run_token"], rows[1]["max_run_len"]) == ("a", 3)
    assert rows[2]["max_run_len"] == 1 and rows[2]["max_run_token"] == "x"
    assert rows[3]["max_run_len"] == 0 and rows[3]["n_tokens"] == 0
    assert (rows[4]["max_run_token"], rows[4]["max_run_len"]) == ("solo", 1)
    assert (rows[5]["max_run_token"], rows[5]["max_run_len"]) == ("c", 4)


def test_max_token_run_keeps_earliest_maximal_run(spark):
    from sync_cosmos_db_spark.operators.text import max_token_run

    row = max_token_run(
        spark.createDataFrame([(1, "a a b b")], "doc_id long, text string"),
        "doc_id", "text").collect()[0]
    assert row["max_run_token"] == "a" and row["max_run_len"] == 2


# ---------------------------------------------------------------------------
# X171 — burst collapse
# ---------------------------------------------------------------------------

def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_burst_collapse_keeps_first_of_each_burst(spark):
    from sync_cosmos_db_spark.operators.behavioral import burst_collapse

    rows = [(1, "c", _ts(0), 10), (1, "c", _ts(3), 11),  # burst 1
            (1, "c", _ts(4), 12),                        # still burst 1
            (1, "c", _ts(20), 13),                       # burst 2
            (2, "c", _ts(1), 14)]                        # other key
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, "
              "event_id long")
    kept = burst_collapse(df, ["user_id", "event_type"], "ts",
                          "event_id", tolerance_seconds=5).collect()
    by_id = {r["event_id"]: r for r in kept}
    assert sorted(by_id) == [10, 13, 14]
    assert by_id[10]["burst_len"] == 3
    assert by_id[13]["burst_len"] == 1


def test_burst_collapse_chained_gaps_stay_one_burst(spark):
    """Events 4 s apart chained for 20 s: every gap < tolerance, so
    the whole chain is ONE burst even though first-to-last exceeds
    the tolerance — the islands semantics, not a fixed window."""
    from sync_cosmos_db_spark.operators.behavioral import burst_collapse

    rows = [(1, "c", _ts(4 * i), i) for i in range(6)]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, "
              "event_id long")
    kept = burst_collapse(df, ["user_id", "event_type"], "ts",
                          "event_id", tolerance_seconds=5).collect()
    assert len(kept) == 1 and kept[0]["burst_len"] == 6


# ---------------------------------------------------------------------------
# X172 — session depth profile
# ---------------------------------------------------------------------------

def test_session_depth_bounce_and_entry(spark):
    from sync_cosmos_db_spark.operators.behavioral import (
        session_depth_profile,
    )

    rows = [
        # user 1: session A (view, click) then a bounce session (view)
        (1, _ts(0), 1, "view"), (1, _ts(10), 2, "click"),
        (1, dt.datetime(2024, 1, 1, 2, 0, 0), 3, "view"),
        # user 2: one bounce starting with click
        (2, _ts(0), 4, "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string")
    out = {r["entry_type"]: r for r in
           session_depth_profile(df, gap_seconds=1800).collect()}
    assert out["view"]["n_sessions"] == 2
    assert out["view"]["n_bounce"] == 1
    assert out["view"]["bounce_rate"] == 0.5
    assert out["view"]["mean_depth"] == 1.5
    assert out["click"]["n_sessions"] == 1
    assert out["click"]["bounce_rate"] == 1.0


# ---------------------------------------------------------------------------
# X173 — transition validity
# ---------------------------------------------------------------------------

def test_transition_audit_flags_illegal(spark):
    from sync_cosmos_db_spark.operators.behavioral import (
        transition_validity_audit,
    )

    rows = [(1, _ts(0), 1, "view"), (1, _ts(1), 2, "click"),
            (1, _ts(2), 3, "purchase"),
            (2, _ts(0), 4, "purchase"), (2, _ts(1), 5, "purchase")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string")
    out = {(r["from_state"], r["to_state"]): r for r in
           transition_validity_audit(
               df, [("view", "click"), ("click", "purchase")]).collect()}
    assert out[("view", "click")]["is_allowed"]
    assert out[("click", "purchase")]["is_allowed"]
    assert not out[("purchase", "purchase")]["is_allowed"]
    assert out[("purchase", "purchase")]["n"] == 1


# ---------------------------------------------------------------------------
# X174 — inactivity profile
# ---------------------------------------------------------------------------

def test_inactivity_profile_buckets(spark):
    from sync_cosmos_db_spark.operators.behavioral import (
        inactivity_profile,
    )

    d0 = dt.datetime(2024, 1, 31, 12, 0, 0)
    rows = [(1, d0),                                  # gap 0 -> <=1d
            (2, d0 - dt.timedelta(days=3)),           # gap 3 -> <=7d
            (3, d0 - dt.timedelta(days=20)),          # gap 20 -> >7d
            (3, d0 - dt.timedelta(days=25))]          # same key, older
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["bucket"]: r for r in
           inactivity_profile(df, [1, 7]).collect()}
    assert out["<=1d"]["n_keys"] == 1
    assert out["<=7d"]["n_keys"] == 1
    assert out[">7d"]["n_keys"] == 1
    assert out[">7d"]["min_gap_days"] == 20


# ---------------------------------------------------------------------------
# X175 — WOE encoding
# ---------------------------------------------------------------------------

def test_woe_hand_computed(spark):
    from sync_cosmos_db_spark.operators.profiling import woe_encoding

    # cat A: 3 good / 1 bad; cat B: 1 good / 3 bad; totals 4 good 4 bad
    rows = [("A", 1)] * 3 + [("A", 0)] + [("B", 1)] + [("B", 0)] * 3
    df = spark.createDataFrame(rows, "cat string, y long")
    out = {r["category"]: r for r in
           woe_encoding(df, "cat", "y").collect()}
    gs_a, bs_a = (3 + 0.5) / (4 + 1.0), (1 + 0.5) / (4 + 1.0)
    woe_a = math.log(gs_a / bs_a)
    assert out["A"]["woe"] == math.floor(woe_a * 1e6 + 0.5) / 1e6
    assert out["A"]["iv_contrib"] == math.floor(
        (gs_a - bs_a) * woe_a * 1e6 + 0.5) / 1e6
    # symmetry: B is A with good/bad swapped -> woe_B = -woe_A
    assert out["B"]["woe"] == -out["A"]["woe"]


def test_woe_all_one_class_smoothing_keeps_finite(spark):
    from sync_cosmos_db_spark.operators.profiling import woe_encoding

    df = spark.createDataFrame([("A", 1), ("A", 1)], "cat string, y long")
    row = woe_encoding(df, "cat", "y").collect()[0]
    assert math.isfinite(row["woe"])


# ---------------------------------------------------------------------------
# X176 — Jaro-Winkler join
# ---------------------------------------------------------------------------

def test_jaro_winkler_known_scores(spark):
    from sync_cosmos_db_spark.operators.linkage import jaro_winkler_join

    df = spark.createDataFrame(
        [(1, 0, "martha"), (2, 0, "marhta"), (3, 0, "zzzzz"),
         (4, 1, "martha")],                    # different block
        "id long, blk long, name string")
    out = jaro_winkler_join(df, "id", "name", ["blk"],
                            threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["sim"] == 0.961111      # the classic textbook value
    # blocking respected: (1,4) identical names but different blocks


def test_jaro_winkler_empty_and_threshold(spark):
    from sync_cosmos_db_spark.operators.linkage import jaro_winkler_join

    df = spark.createDataFrame(
        [(1, 0, ""), (2, 0, ""), (3, 0, "abc"), (4, 0, "abd")],
        "id long, blk long, name string")
    out = {(r["id_a"], r["id_b"]): r["sim"] for r in
           jaro_winkler_join(df, "id", "name", ["blk"],
                             threshold=0.5).collect()}
    assert (1, 2) not in out        # empty vs empty scores 0.0
    assert out[(3, 4)] == pytest.approx(0.822222, abs=1e-6)


# ---------------------------------------------------------------------------
# X177 — dHash
# ---------------------------------------------------------------------------

def _pattern_png(seed: int, shift: int = 0) -> bytes:
    from sync_cosmos_db_spark.operators.multimodal import png_encode

    w, h = 24, 16
    px = bytes(((x * 7 + y * 13 + seed * 31 + c * 5 + shift) % 256)
               for y in range(h) for x in range(w) for c in range(3))
    return png_encode(w, h, (0, 0, 0), pixels=px)


def test_dhash_brightness_invariant_and_discriminative():
    from sync_cosmos_db_spark.operators.multimodal import (
        dhash64, png_decode,
    )

    h_base = dhash64(png_decode(_pattern_png(3))[3])
    h_same = dhash64(png_decode(_pattern_png(3))[3])
    h_brighter = dhash64(png_decode(_pattern_png(3, shift=10))[3])
    h_other = dhash64(png_decode(_pattern_png(17))[3])
    assert h_base == h_same
    # +10 brightness shifts every pixel equally except mod-256 wrap
    # cells; the gradient signs at non-wrap cells dominate
    assert bin(h_base ^ h_brighter).count("1") <= 8
    assert h_base != h_other


def test_dhash_assets_poison_blob_survives(spark):
    from sync_cosmos_db_spark.operators.multimodal import dhash_png_assets

    good = _pattern_png(1)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a png"))],
        "asset_id long, content binary")
    rows = {r["asset_id"]: r for r in dhash_png_assets(df).collect()}
    assert rows[1]["decode_ok"] and rows[1]["dhash"] is not None
    assert not rows[2]["decode_ok"] and rows[2]["dhash"] is None


def test_dhash_two_complement_fits_long():
    from sync_cosmos_db_spark.operators.multimodal import dhash64

    import numpy as np

    # all-decreasing gradient: every bit set -> value -1 (signed)
    px = np.zeros((8, 9, 1), dtype=np.uint8)
    px[:, :, 0] = np.arange(9, 0, -1, dtype=np.uint8) * 20
    assert dhash64(px) == -1


def test_jaro_winkler_duckdb_parity_randomized():
    """The docstring's bit-identity claim, now a committed test
    (round 12, alongside the pair-vectorized _jw_vector rewrite):
    8,000 randomized pairs — empties, single chars, spaces, shared
    prefixes, transpositions, length skew — score EXACTLY equal to
    DuckDB's jaro_winkler_similarity as raw float64, no rounding."""
    import random

    import duckdb

    from sync_cosmos_db_spark.operators.linkage import _jw_vector

    rng = random.Random(712)
    alpha = "abcdefgh #0123"

    def name() -> str:
        n = rng.randrange(0, 24)
        s = [rng.choice(alpha) for _ in range(n)]
        return "".join(s)

    pairs = []
    for _ in range(6000):
        pairs.append((name(), name()))
    for _ in range(2000):                    # near-dups: edits of one base
        base = list(name() or "a")
        other = list(base)
        for _ in range(rng.randrange(0, 3)):
            op = rng.randrange(3)
            pos = rng.randrange(len(other)) if other else 0
            if op == 0 and other:
                other[pos] = rng.choice(alpha)
            elif op == 1 and len(other) > 1 and pos + 1 < len(other):
                other[pos], other[pos + 1] = other[pos + 1], other[pos]
            elif other:
                other.insert(pos, rng.choice(alpha))
        pairs.append(("".join(base), "".join(other)))

    ours = _jw_vector([a for a, _ in pairs], [b for _, b in pairs])
    con = duckdb.connect()
    con.execute("CREATE TABLE p(i INT, a TEXT, b TEXT)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)",
                    [(i, a, b) for i, (a, b) in enumerate(pairs)])
    theirs = dict(con.execute(
        "SELECT i, jaro_winkler_similarity(a, b) FROM p").fetchall())
    mism = [(i, pairs[i], ours[i], theirs[i])
            for i in range(len(pairs)) if ours[i] != theirs[i]]
    assert not mism, f"{len(mism)} mismatches, first: {mism[:3]}"
