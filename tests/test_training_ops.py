"""Training-data operators: dedup family, similarity, text, multimodal."""

import pytest
from pyspark.sql import functions as F

from etl_warehouse_agnostic_spark.operators import dedup_fuzzy, multimodal, similarity, text

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat"),  # near dup
    (4, "completely different text about spark engines"),
    (5, "THE  Quick   Brown fox jumps over the lazy dog"),  # same after normalize
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_normalized(spark, docs):
    out = {r.doc_id: r.n_copies for r in dedup_fuzzy.exact_dedup(docs, "doc_id", "text").collect()}
    assert out == {1: 3, 3: 1, 4: 1}  # 1,2,5 collapse


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = {(r.a, r.b) for r in
             dedup_fuzzy.ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.5).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_candidates(spark, docs):
    out = {(r.a, r.b) for r in dedup_fuzzy.minhash_lsh_candidates(
        docs, "doc_id", "text", n=2, num_hashes=8, bands=4, verify_threshold=0.5).collect()}
    assert (1, 2) in out  # identical docs always collide in every band
    assert not any(4 in p for p in out)


def test_simhash_identical_and_distance(spark, docs):
    sigs = {r.doc_id: r.simhash for r in dedup_fuzzy.simhash(docs, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2] == sigs[5]
    pairs = {(r.a, r.b): r.hamming for r in
             dedup_fuzzy.simhash_near_pairs(docs, "doc_id", "text", max_hamming=16).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs


def test_cosine_topk_exact(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    q = emb.where("vec_id = 1")
    out = [(r.neighbor_id, r.rank) for r in
           similarity.cosine_topk(emb, q, k=3).orderBy("rank").collect()]
    assert out == [(2, 1), (4, 2), (3, 3)]


def test_ivf_topk_probes_subset(spark):
    import math
    emb = spark.createDataFrame(
        [(i, [math.cos(i / 7.0), math.sin(i / 7.0)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    q = emb.where("vec_id = 10")
    out = similarity.ivf_topk(emb, q, num_centroids=4, nprobe=2, k=3).collect()
    assert len(out) == 3
    assert {r.neighbor_id for r in out} <= set(range(30)) - {10}
    # nearest angular neighbors of 10 are 9 and 11
    assert {9, 11} <= {r.neighbor_id for r in out}


def test_quality_and_tokens(spark, docs):
    q = {r.doc_id: r for r in text.quality_score(docs, "doc_id", "text").collect()}
    assert q[1].n_words == 9 and q[1].keep
    t = docs.select(
        "doc_id",
        text.token_count_bpe_ish("text").alias("n"),
        text.token_count_whitespace("text").alias("nw"),
    ).collect()
    assert all(r.n >= r.nw for r in t)  # BPE-ish never fewer than words


def test_language_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog in the house"), (2, "zzz qqq www rrr ttt")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lang_pred for r in text.language_id(df, "doc_id", "text").collect()}
    assert out == {1: "en", 2: "und"}


def test_fingerprint_normalization(spark, docs):
    fp = {r.doc_id: r.fp_md5 for r in text.fingerprint(docs, "doc_id", "text").collect()}
    assert fp[1] == fp[2] == fp[5] and fp[1] != fp[3]


def test_text_features_matches_per_facet_ops(spark, docs):
    """text_features (the one-pass battery) must agree column-for-column
    with the per-facet operators it fuses."""
    battery = {r.doc_id: r.asDict() for r in text.text_features(docs, "doc_id", "text").collect()}
    q = {r.doc_id: r.asDict() for r in text.quality_score(docs, "doc_id", "text").collect()}
    lang = {r.doc_id: r.asDict() for r in text.language_id(docs, "doc_id", "text").collect()}
    fp = {r.doc_id: r.fp_md5 for r in text.fingerprint(docs, "doc_id", "text").collect()}
    toks = {
        r.doc_id: r.asDict()
        for r in docs.select(
            "doc_id",
            text.token_count_whitespace("text").alias("ws_tokens"),
            text.token_count_bpe_ish("text").alias("bpe_tokens"),
        ).collect()
    }
    for d, row in battery.items():
        for c in ("n_chars_m", "n_words", "avg_word_len", "punct_ratio", "stopword_ratio", "keep"):
            assert row[c] == q[d][c], (d, c)
        for c in ("en_score", "lang_pred"):
            assert row[c] == lang[d][c], (d, c)
        for c in ("ws_tokens", "bpe_tokens"):
            assert row[c] == toks[d][c], (d, c)
        assert row["fp_md5"] == fp[d]


def test_multimodal_plumbing(spark, docs):
    media = multimodal.to_media_table(docs, "doc_id", "text")
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "media_type", "meta"]
    feats = multimodal.extract_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    assert rows[1].byte_len == len(DOCS[0][1].encode())
    assert rows[1].payload_md5 == __import__("hashlib").md5(DOCS[0][1].encode()).hexdigest()
    assert rows[1].decoded is False
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_stub(b"bytes")


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    out = {r.shingle for r in text.word_shingles(df, "doc_id", "text", n=3).collect()}
    assert out == {"a b c", "b c d"}


def test_cosine_near_pairs_blocked_matches_exact_on_planted_dups(spark):
    """Planted near-identical vectors must be found by both the exact
    and the cell-blocked pair finders; blocked ⊆ exact always."""
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(60):
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(16)]))
    # plant 5 near-dup pairs: id 100+i is id i plus tiny noise
    for i in range(5):
        base = rows[i][1]
        rows.append((100 + i, [x + rnd.uniform(-0.01, 0.01) for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    from etl_warehouse_agnostic_spark.operators.similarity import (
        blocked_near_pairs,
        cosine_near_pairs,
    )

    exact = {(r["a"], r["b"]) for r in cosine_near_pairs(emb, threshold=0.95).collect()}
    assert {(i, 100 + i) for i in range(5)} <= exact
    blocked = {
        (r["a"], r["b"])
        for r in blocked_near_pairs(emb, threshold=0.95, num_centroids=4, nprobe=2).collect()
    }
    assert blocked <= exact  # blocking only prunes, never invents
    planted_found = len({(i, 100 + i) for i in range(5)} & blocked)
    assert planted_found >= 4  # near-identical vectors share their cell


def test_blocked_near_pairs_cell_size_guard_on_skewed_corpus(spark):
    """A corpus where ~85% of vectors land in one k-means cell must be
    re-split by the SRP guard: no block may stay near the skewed-cell
    size (bounding the within-block join), and planted near-dup recall
    must still clear the 0.8 floor."""
    import random

    from etl_warehouse_agnostic_spark.operators.similarity import (
        blocked_assignment,
        blocked_near_pairs,
        cosine_near_pairs,
    )

    rnd = random.Random(13)
    dim = 8
    rows = []
    # 850 vectors tightly clustered around one direction (one hot cell)
    for i in range(850):
        rows.append((i, [1.0 + rnd.uniform(-0.05, 0.05) for _ in range(dim)]))
    # 150 spread-out vectors
    for i in range(850, 1000):
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(dim)]))
    # plant 10 near-dup pairs inside the hot cluster
    for i in range(10):
        base = rows[i][1]
        rows.append((100000 + i, [x * 1.0001 + 0.001 for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    max_cell = 100
    assigned = blocked_assignment(
        emb, num_centroids=8, nprobe=2, max_cell_size=max_cell
    )
    from pyspark.sql import functions as F

    census = assigned.groupBy("centroid_id", "_blk").agg(F.count(F.lit(1)).alias("n"))
    sizes = [r["n"] for r in census.collect()]
    # skewed cell (~860+ members) must have been split: SRP halving is
    # probabilistic, so assert a loose but meaningful bound
    assert max(sizes) < 450, f"cell-size guard did not split: max block {max(sizes)}"
    assert sum(sizes) >= 2000  # nprobe=2 multi-assignment intact

    exact = {(r["a"], r["b"]) for r in cosine_near_pairs(emb, threshold=0.99).collect()}
    planted = {(i, 100000 + i) for i in range(10)}
    assert planted <= exact
    blocked = {
        (r["a"], r["b"])
        for r in blocked_near_pairs(
            emb, threshold=0.99, num_centroids=8, nprobe=2, max_cell_size=max_cell
        ).collect()
    }
    assert blocked <= exact
    recall = len(planted & blocked) / len(planted)
    assert recall >= 0.8, f"planted recall {recall} under guard"


def test_decode_dimensions_with_pil(spark, docs):
    """REAL image decode when the optional imaging lib exists (skipped
    where it doesn't): a generated PNG round-trips through the Arrow
    decode path with correct dimensions; a poison payload yields an
    ok=False row, never a failed batch."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    def png_bytes(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (1, 2, 3)).save(buf, format="PNG")
        return buf.getvalue()

    media = spark.createDataFrame(
        [(1, png_bytes(13, 7)), (2, png_bytes(3, 21)), (3, b"not-an-image")],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in multimodal.decode_dimensions(media).collect()}
    assert (rows[1].ok, rows[1].width, rows[1].height) == (True, 13, 7)
    assert (rows[2].width, rows[2].height) == (3, 21)
    assert rows[3].ok is False and rows[3].width is None


def test_decode_dimensions_without_pil_raises_stub(spark):
    """Where the imaging lib is absent the decode path must fail with
    the DECLARED stub error (not a confusing ImportError mid-batch)."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed — covered by the real-decode test")
    except ImportError:
        pass
    media = spark.createDataFrame([(1, b"x")], "media_id long, payload binary")
    with pytest.raises(Exception, match="PIL/libvips"):
        multimodal.decode_dimensions(media).collect()
