"""Unit tests for owl:sameAs canonicalization and perceptual-hash
image dedup (round 3: operators/canonicalize.py alias identity +
operators/multimodal.py phash tier)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from turtle_spark.functions.imaging import (
    decode_image,
    encode_bmp,
    encode_png,
    encode_ppm,
    grid_phash,
    perturb_image,
    resize_nearest,
    synth_pixels,
)
from turtle_spark.operators.canonicalize import (
    alias_sameas_edges,
    sameas_canonicalize,
)
from turtle_spark.operators.dedup import hamming_band_pairs
from turtle_spark.operators.multimodal import (
    image_near_duplicates,
    image_phash,
    image_variants,
    synthesize_media_table,
)

TRIPLE_COLS = "subject string, predicate string, object string, label string, datatype string, objecttype string"


def _triples(spark, rows):
    return spark.createDataFrame(rows, TRIPLE_COLS)


# --- alias_sameas_edges -----------------------------------------------------


def test_alias_edges_star_to_min(spark):
    t = _triples(
        spark,
        [
            ("http://x/graph_4", "http://x/p", "http://x/graph17", "", "", "iri"),
            ("http://x/graph2", "http://x/p", "lit", "", "", "literal"),
        ],
    )
    edges = {tuple(r) for r in alias_sameas_edges(t).collect()}
    # min of {graph_4, graph17, graph2} is graph17 (digit sorts < '_' and '2')
    assert edges == {
        ("http://x/graph_4", "http://x/graph17"),
        ("http://x/graph2", "http://x/graph17"),
    }


def test_alias_edges_base_form_joins_group(spark):
    t = _triples(
        spark,
        [
            ("http://x/alpha", "http://x/p", "http://x/alpha_9", "", "", "iri"),
        ],
    )
    edges = {tuple(r) for r in alias_sameas_edges(t).collect()}
    assert edges == {("http://x/alpha_9", "http://x/alpha")}


def test_alias_edges_excludes_namespace_stems_blanks_literals(spark):
    t = _triples(
        spark,
        [
            # path-instance IRIs (stem ends in /) never merge
            ("http://x/thing/1", "http://x/p", "http://x/thing/2", "", "", "iri"),
            # blank nodes excluded, literals excluded even if digit-suffixed
            ("_:d#b1", "http://x/p", "name_7", "", "", "literal"),
        ],
    )
    assert alias_sameas_edges(t).count() == 0


# --- sameas_canonicalize ----------------------------------------------------


def test_sameas_transitive_chain_rewrites_all(spark):
    t = _triples(
        spark,
        [
            ("http://x/a", "http://x/p", "http://x/b", "", "", "iri"),
            ("http://x/b", "http://x/p", "lit", "", "", "literal"),
            ("http://x/c", "http://x/q", "http://x/a", "", "", "iri"),
        ],
    )
    sameas = spark.createDataFrame(
        [("http://x/a", "http://x/b"), ("http://x/b", "http://x/c")],
        "src string, dst string",
    )
    out = sameas_canonicalize(t, sameas).collect()
    # every member of {a,b,c} rewrites to the lexicographic min "a"
    subjects = {r.subject for r in out}
    objects = {r.object for r in out}
    assert subjects == {"http://x/a"}
    assert objects == {"http://x/a", "lit"}


def test_sameas_merge_collapses_duplicate_triples_to_set(spark):
    t = _triples(
        spark,
        [
            ("http://x/e_1", "http://x/p", "v", "", "", "literal"),
            ("http://x/e_2", "http://x/p", "v", "", "", "literal"),
        ],
    )
    sameas = spark.createDataFrame(
        [("http://x/e_2", "http://x/e_1")], "src string, dst string"
    )
    out = sameas_canonicalize(t, sameas).collect()
    assert len(out) == 1 and out[0].subject == "http://x/e_1"


def test_sameas_literals_never_rewritten(spark):
    # a literal whose text equals a merged IRI must stay untouched
    t = _triples(
        spark,
        [
            ("http://x/e_1", "http://x/p", "http://x/e_2", "", "", "literal"),
            ("http://x/e_2", "http://x/p", "o", "", "", "literal"),
        ],
    )
    sameas = spark.createDataFrame(
        [("http://x/e_2", "http://x/e_1")], "src string, dst string"
    )
    rows = sameas_canonicalize(t, sameas).where(
        F.col("objecttype") == "literal"
    ).collect()
    assert {r.object for r in rows} == {"http://x/e_2", "o"}


# --- grid phash invariants (pure Python, no Spark) --------------------------


def test_phash_integer_upscale_invariant():
    img = synth_pixels(21, 13, 5, 17, 29)
    h0 = grid_phash(img)
    for k in (2, 3, 5):
        up = resize_nearest(img, 21 * k, 13 * k)
        assert grid_phash(up) == h0, f"{k}x upscale changed the hash"


def test_phash_cross_codec_invariant():
    img = synth_pixels(18, 11, 40, 80, 120)
    h0 = grid_phash(img)
    for enc in (encode_ppm, encode_bmp, encode_png):
        assert grid_phash(decode_image(enc(img))) == h0


def test_phash_perturbation_within_radius_and_distinct_apart():
    hams, cross = [], []
    hashes = []
    for k in range(40):
        img = synth_pixels(8 + (k * 13) % 40, 8 + (k * 7) % 24, (k * 37) % 256, (k * 11) % 251, (k * 5) % 241)
        h0 = grid_phash(img)
        hv = grid_phash(perturb_image(img, brightness=16))
        hams.append(bin(h0 ^ hv).count("1"))
        hashes.append(h0)
    for i in range(0, 40, 3):
        for j in range(i + 1, 40, 5):
            cross.append(bin(hashes[i] ^ hashes[j]).count("1"))
    assert max(hams) <= 3, "variant drifted outside the Hamming radius"
    assert min(cross) > 6, "distinct synth images too close in Hamming space"


# --- hamming_band_pairs -----------------------------------------------------


def test_hamming_band_pairs_finds_close_skips_far(spark):
    rows = [
        ("a", 0b1111000011110000),
        ("b", 0b1111000011110001),  # hamming 1 from a
        ("c", -1),                  # 64 ones: hamming 50 from a
    ]
    df = spark.createDataFrame(rows, "id string, sketch long")
    pairs = {(r.id1, r.id2, r.hamming) for r in hamming_band_pairs(df, max_hamming=3).collect()}
    assert pairs == {("a", "b", 1)}


def test_hamming_band_pairs_dedups_multi_band_collisions(spark):
    # identical sketches collide in ALL 4 bands but must emit one pair
    df = spark.createDataFrame(
        [("x", 12345), ("y", 12345)], "id string, sketch long"
    )
    out = hamming_band_pairs(df, max_hamming=0).collect()
    assert len(out) == 1 and out[0].hamming == 0


# --- image variants + end-to-end pairs ---------------------------------------


@pytest.fixture(scope="module")
def media(spark):
    from turtle_spark.sources.corpus import generate_docs

    return (
        synthesize_media_table(generate_docs(spark, 40, seed=42))
        .where(F.col("media_type") == "image")
        .persist()
    )


def test_image_variants_flip_codec_and_double_dims(media):
    joined = (
        media.alias("o")
        .join(
            image_variants(media).alias("v"),
            F.col("o.media_ref") == F.regexp_replace("v.media_ref", "#v$", ""),
        )
        .select(
            "o.meta.codec", "v.meta.codec", "o.meta.width", "v.meta.width"
        )
        .collect()
    )
    assert joined, "no variants produced"
    for oc, vc, ow, vw in joined:
        assert {oc, vc} == {"ppm", "bmp"}
        assert vw == 2 * ow


def test_image_near_duplicates_pairs_each_original_with_variant(media):
    pool = media.unionByName(image_variants(media))
    pairs = image_near_duplicates(pool, max_hamming=3).collect()
    n_images = media.count()
    assert len(pairs) == n_images
    for p in pairs:
        assert p.id2 == p.id1 + "#v"
        assert p.hamming <= 3


def test_image_phash_matches_pure_python(media):
    sample = media.limit(5).collect()
    engine = {
        r.media_ref: r.phash for r in image_phash(media.limit(5)).collect()
    }
    for row in sample:
        h = grid_phash(decode_image(bytes(row.payload)))
        signed = h - (1 << 64) if h >= (1 << 63) else h
        assert engine[row.media_ref] == signed
