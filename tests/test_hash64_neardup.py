"""hash64_near_pairs: exact banded Hamming join over any 64-bit
fingerprint — the image-near-dup story (payload.phash64) at crawl
scale without touching pixel bytes."""

from __future__ import annotations

import numpy as np
import pytest

from crawler_tjce_spark.operators import dedup
from crawler_tjce_spark.payload import synthesize_image_record


def _brute(rows, max_h):
    out = set()
    for i, (ida, ha) in enumerate(rows):
        for idb, hb in rows[i + 1:]:
            d = bin((ha ^ hb) & 0xFFFFFFFFFFFFFFFF).count("1")
            if d <= max_h:
                out.add((min(ida, idb), max(ida, idb), d))
    return out


@pytest.fixture(scope="module")
def phash_rows():
    """Real synthesized-payload phashes + adversarial near-pairs: for a
    sample of images, flip 1-4 known bits to create twins at exact
    Hamming distances (including one just OVER the threshold)."""
    rows = []
    rng = np.random.default_rng(11)
    for i in range(60):
        rec = synthesize_image_record(f"img-{i}")
        h = np.int64(np.uint64(rec["phash"] & 0xFFFFFFFFFFFFFFFF))
        rows.append((i, int(h)))
    nid = 1000
    for base in (3, 17, 41):
        h = rows[base][1]
        for flips in (1, 3, 4):  # 1 and 3 are in-range, 4 is just out
            bits = rng.choice(64, size=flips, replace=False)
            h2 = h
            for b in bits:
                h2 ^= 1 << int(b)
            # keep int64 two's-complement range
            h2 = int(np.int64(np.uint64(h2 & 0xFFFFFFFFFFFFFFFF)))
            rows.append((nid, h2))
            nid += 1
    return rows


def test_matches_bruteforce_and_pigeonhole_is_exact(spark, phash_rows):
    df = spark.createDataFrame(phash_rows, "img_id long, phash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.hash64_near_pairs(df, "phash", "img_id", max_hamming=3).collect()
    }
    want = _brute(phash_rows, 3)
    assert got == want
    assert len(want) >= 6  # the planted 1- and 3-bit twins are found
    # the 4-bit twins are OUT at threshold 3 but IN at threshold 4
    got4 = {
        (r["id_a"], r["id_b"])
        for r in dedup.hash64_near_pairs(df, "phash", "img_id", max_hamming=4).collect()
    }
    assert got4 == {(a, b) for a, b, _ in _brute(phash_rows, 4)}
    assert len(got4) > len(want)


def test_negative_hashes_and_identical_pairs(spark):
    """int64-negative fingerprints (top bit set) band correctly under
    the arithmetic shift + mask, and duplicates land at hamming 0."""
    rows = [(1, -1), (2, -1), (3, -2), (4, 0), (5, 1)]
    df = spark.createDataFrame(rows, "id long, h long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.hash64_near_pairs(df, "h", "id", max_hamming=1).collect()
    }
    assert got == {(1, 2, 0), (1, 3, 1), (2, 3, 1), (4, 5, 1)}


def test_plan_is_banded_equijoin_not_cartesian(spark):
    df = spark.createDataFrame([(i, i * 7919) for i in range(50)], "id long, h long")
    plan = dedup.hash64_near_pairs(df, "h", "id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_degenerate_pileup_is_bounded(spark):
    """VERDICT r4 #6: a mass of identical fingerprints (the all-zero
    phash of blank images) must not self-join quadratically. With the
    default bucket guard the 10k-row pileup's chunk buckets are dropped
    (zero extra shuffle — the count rides the join's partitioning), the
    job completes with a bounded pair set, and the survivors still match
    brute force over the non-degenerate rows."""
    normal = [(i, int(np.int64(np.uint64((0x9E3779B97F4A7C15 * (i + 1)) & 0xFFFFFFFFFFFFFFFF)))) for i in range(40)]
    # plant one near pair among the normal rows
    twin = (500, normal[7][1] ^ 0b101)  # hamming 2 from normal[7]
    degenerate = [(10_000 + i, 0) for i in range(10_000)]
    rows = normal + [twin] + degenerate
    df = spark.createDataFrame(rows, "id long, h long")

    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.hash64_near_pairs(df, "h", "id", max_hamming=3).collect()
    }
    # no pair touches the dropped pileup…
    assert all(a < 10_000 and b < 10_000 for a, b, _ in got)
    # …and the survivors are exactly brute force over the rest
    assert got == _brute(normal + [twin], 3)
    assert (7, 500, 2) in got

    # guard OFF on a small pileup: intra-pileup pairs DO appear
    small = spark.createDataFrame(normal + [(900 + i, 0) for i in range(4)], "id long, h long")
    got_off = {
        (r["id_a"], r["id_b"])
        for r in dedup.hash64_near_pairs(small, "h", "id", max_hamming=3, max_bucket=None).collect()
    }
    assert {(900, 901), (900, 902), (901, 902)} <= got_off
