"""Perceptual-hash image dedup: distance and pairing contracts."""

from __future__ import annotations

from legendary_data_pipeline_spark.operators.multimodal import (
    ahash_images,
    ahash_pairs,
)

BASE = "the quick brown fox jumps over the lazy dog " * 8


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, k, "application/octet-stream", bytearray(t.encode())) for i, k, t in rows],
        "media_id long, kind string, mime string, payload binary",
    )


def test_ahash_distance_tracks_payload_similarity(spark):
    media = _media(
        spark,
        [
            (1, "image", BASE),
            (2, "image", BASE.replace("quick", "quirk")),  # tiny edit
            (3, "image", BASE),  # identical to 1
            (4, "image", "completely different payload with other content " * 8),
            (5, "audio", BASE),  # non-image: excluded from hashing
        ],
    )
    hashes = {r["media_id"]: r["ahash"] for r in ahash_images(media).collect()}
    assert set(hashes) == {1, 2, 3, 4}
    assert hashes[1] == hashes[3]

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(hashes[1], hashes[2]) <= 8  # near-dup: few bits flip
    assert ham(hashes[1], hashes[4]) > 16  # unrelated: far

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_pairs(ahash_images(media), max_hamming=8).collect()
    }
    assert pairs[(1, 3)] == 0
    assert (1, 2) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_ahash_deterministic_across_runs(spark):
    media = _media(spark, [(i, "image", BASE + str(i % 3)) for i in range(20)])
    a = sorted(ahash_images(media).collect())
    b = sorted(ahash_images(media).collect())
    assert a == b


def test_ahash_empty_payload_yields_null_and_never_pairs(spark):
    media = _media(spark, [(1, "image", ""), (2, "image", ""), (3, "image", BASE)])
    hashes = {r["media_id"]: r["ahash"] for r in ahash_images(media).collect()}
    assert hashes[1] is None and hashes[2] is None
    assert ahash_pairs(ahash_images(media)).count() == 0
