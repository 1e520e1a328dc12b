"""Unit tests for the training-data pipeline operators (dedup, similarity,
text analysis, multimodal) on small hand-checkable inputs.

Cross-engine value parity with DuckDB is covered by the driver contract
(tools/check_contract.py over __spark_entry__); these tests pin the
*semantics* independently of any oracle engine.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "a"),
        (1, "the quick brown fox jumps over the lazy cat", "a"),   # near-dup of 0
        (2, "completely different words entirely here now", "a"),
        (3, "the quick brown fox jumps over the lazy dog", "b"),   # exact dup of 0
        (4, "der hund und die katze und das haus", "b"),
        (5, "le chat est dans la maison et le chien", "b"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string, source: string")


class TestTextStats:
    def test_token_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "a  bb\tccc\ndddd"), (2, ""), (3, "  x  ")],
            "id: long, text: string",
        )
        got = {
            r["id"]: (r["n"], r["m"])
            for r in df.select(
                "id",
                textstats.token_count(F.col("text")).alias("n"),
                textstats.mean_word_len(F.col("text")).alias("m"),
            ).collect()
        }
        assert got[1] == (4, 2.5)
        assert got[2] == (0, 0.0)
        assert got[3] == (1, 1.0)

    def test_bpe_tokens_split_digits_and_punct(self, spark):
        df = spark.createDataFrame([(1, "ab12, cd!")], "id: long, text: string")
        n = df.select(textstats.bpe_token_count(F.col("text")).alias("n")).head()["n"]
        # ab | 1 | 2 | , | cd | !
        assert n == 6

    def test_lang_id_markers(self, docs):
        got = {
            r["doc_id"]: r["lang"]
            for r in docs.select(
                "doc_id", textstats.lang_id(F.col("text")).alias("lang")
            ).collect()
        }
        assert got[0] == "en"
        assert got[4] == "de"
        assert got[5] == "fr"
        assert got[2] == "und"  # no marker hits

    def test_quality_range_and_monotonicity(self, docs):
        rows = docs.select(
            textstats.quality_score(F.col("text")).alias("q")
        ).collect()
        assert all(0.0 <= r["q"] <= 1.0 for r in rows)

    def test_fingerprint_matches_reference_impl(self, spark):
        text = "hello world"
        fp = 0
        for ch in text:
            fp = (fp * textstats.FP_BASE + ord(ch)) % textstats.FP_MOD
        df = spark.createDataFrame([(1, text)], "id: long, text: string")
        got = df.select(textstats.fingerprint(F.col("text")).alias("f")).head()["f"]
        assert got == fp


class TestDedup:
    def test_exact_groups_and_keeper(self, docs):
        groups = {
            r["content_hash"]: (r["n_copies"], r["keeper_id"])
            for r in dedup.exact_dedup_groups(docs).collect()
        }
        dup_hash = hashlib.md5(
            b"the quick brown fox jumps over the lazy dog"
        ).hexdigest()
        assert groups[dup_hash] == (2, 0)  # docs 0 and 3; keeper = min id
        assert len(groups) == 5

    def test_drop_exact_dups_keeps_keeper_rows(self, docs):
        kept = sorted(r["doc_id"] for r in dedup.drop_exact_dups(docs).collect())
        assert kept == [0, 1, 2, 4, 5]

    def test_shingles(self, spark):
        df = spark.createDataFrame([(1, "a b c d")], "id: long, text: string")
        sh = df.select(dedup.shingles(F.col("text"), 3).alias("s")).head()["s"]
        assert sorted(sh) == ["a b c", "b c d"]
        short = spark.createDataFrame([(1, "a b")], "id: long, text: string")
        assert short.select(dedup.shingles(F.col("text"), 3).alias("s")).head()["s"] == []

    def test_jaccard_pairs_value(self, docs):
        pairs = {
            (r["id1"], r["id2"]): r["jaccard"]
            for r in dedup.jaccard_pairs(
                docs, block_col="source", n=3, threshold=0.0
            ).collect()
        }
        # docs 0/1 in block a: 9 tokens -> 7 shingles each, 6 shared
        assert pairs[(0, 1)] == round(6 / (7 + 7 - 6), 6)
        assert (0, 3) not in pairs  # different blocks

    def test_repetition_stats(self, spark):
        from webcrawler_spark.operators import textstats

        df = spark.createDataFrame(
            [(1, "a b a b a b"), (2, "x y z w")], "doc_id: long, text: string"
        )
        rows = {
            r["doc_id"]: (r["top_ngram_frac"], r["distinct_ngram_frac"])
            for r in textstats.repetition_stats(df).collect()
        }
        # doc1 bigrams (with multiplicity): [a b, b a, a b, b a, a b]
        assert rows[1] == (0.6, 0.4)
        # doc2: 3 distinct bigrams, each once
        assert rows[2] == (round(1 / 3, 6), 1.0)
        short = spark.createDataFrame([(3, "only")], "doc_id: long, text: string")
        assert textstats.repetition_stats(short).count() == 0

    def test_jaccard_stop_shingle_cap(self, docs):
        """max_shingle_df excludes hot shingles from candidate generation
        but scores surviving pairs EXACTLY (same value as the uncapped
        run); a cap below every shingle's df yields no pairs."""
        exact = {
            (r["id1"], r["id2"]): r["jaccard"]
            for r in dedup.jaccard_pairs(
                docs, block_col="source", n=3, threshold=0.0,
                max_shingle_df=None,  # explicit exact-quadratic escape hatch
            ).collect()
        }
        capped = {
            (r["id1"], r["id2"]): r["jaccard"]
            for r in dedup.jaccard_pairs(
                docs, block_col="source", n=3, threshold=0.0, max_shingle_df=50
            ).collect()
        }
        # generous cap: nothing excluded -> identical pairs AND values
        assert capped == exact
        # the DEFAULT is the capped plan (auto cap, prunes nothing here)
        default = {
            (r["id1"], r["id2"]): r["jaccard"]
            for r in dedup.jaccard_pairs(
                docs, block_col="source", n=3, threshold=0.0
            ).collect()
        }
        assert default == exact
        none = dedup.jaccard_pairs(
            docs, block_col="source", n=3, threshold=0.0, max_shingle_df=0
        ).count()
        assert none == 0

    def test_duplicate_clusters(self, spark):
        """Min-label propagation: a chain component collapses to its min id
        (needs multiple rounds, not just direct neighbors), a separate
        component keeps its own min, untouched docs are singletons."""
        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(10)], "doc_id: long, text: string"
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (7, 8)], "id1: long, id2: long"
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup.duplicate_clusters(docs, pairs).collect()
        }
        assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6,
                       7: 7, 8: 7, 9: 9}

    def test_duplicate_clusters_converges_within_max_iters(self, spark):
        # a 9-node chain needs 8 propagation rounds worst-case; max_iters=8
        # must reach the fixpoint (and the early-exit probe must not stop
        # before labels settle)
        n = 9
        docs = spark.createDataFrame(
            [(i, "") for i in range(n)], "doc_id: long, text: string"
        )
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id1: long, id2: long"
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup.duplicate_clusters(docs, pairs, max_iters=8).collect()
        }
        assert got == {i: 0 for i in range(n)}

    def test_duplicate_clusters_pointer_jumping_long_chain(self, spark):
        # a 100-node chain has diameter 99: plain min-label propagation
        # would need 99 rounds, pointer jumping reaches 2^max_iters-1 hops
        # — max_iters=8 (the default) must fully collapse it
        n = 100
        docs = spark.createDataFrame(
            [(i, "") for i in range(n)], "doc_id: long, text: string"
        )
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id1: long, id2: long"
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup.duplicate_clusters(docs, pairs, max_iters=8).collect()
        }
        assert got == {i: 0 for i in range(n)}

    def test_duplicate_clusters_warns_on_nonconvergence(self, spark):
        import pytest as _pytest

        n = 64
        docs = spark.createDataFrame(
            [(i, "") for i in range(n)], "doc_id: long, text: string"
        )
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id1: long, id2: long"
        )
        with _pytest.warns(RuntimeWarning, match="did not converge"):
            dedup.duplicate_clusters(docs, pairs, max_iters=2).collect()

    def test_minhash_identical_docs_collide(self, docs):
        sigs = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(12))
                for r in dedup.minhash_signatures(docs, k=12).collect()}
        assert sigs[0] == sigs[3]  # exact dups -> identical signatures
        assert sigs[0] != sigs[2]
        pairs = dedup.minhash_lsh_pairs(docs, k=12, bands=4, threshold=0.0)
        got = {(r["id1"], r["id2"]): r["jaccard"] for r in pairs.collect()}
        assert got[(0, 3)] == 1.0
        # recall for the 0.75-Jaccard pair with single-row bands: any shared
        # minhash component produces the candidate (miss prob 0.25^12)
        pairs1 = dedup.minhash_lsh_pairs(docs, k=12, bands=12, threshold=0.0)
        got1 = {(r["id1"], r["id2"]): r["jaccard"] for r in pairs1.collect()}
        assert got1[(0, 1)] == 0.75

    def test_simhash_identical_and_near(self, docs):
        sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
        assert sh[0] == sh[3]
        assert all(-(1 << 63) <= v < (1 << 63) for v in sh.values())  # 64-bit
        assert len(set(sh.values())) > 1
        # banded pairs: identical docs collide in every band, hamming 0
        pairs = {
            (r["id1"], r["id2"]): r["hamming"]
            for r in dedup.simhash_pairs(docs, max_hamming=16).collect()
        }
        assert pairs[(0, 3)] == 0
        # near-dup (0,1) shares >=1 16-bit band iff few bits differ; with
        # max_hamming=16 it must appear only if banding catches it — check
        # the complete-recall regime instead: every pair at hamming <= 3
        # of the full signature is returned (pigeonhole over 4 bands)
        import itertools
        full = dedup.simhash_pairs(docs, max_hamming=3).collect()
        got = {(r["id1"], r["id2"]) for r in full}
        want = {
            (i, j)
            for i, j in itertools.combinations(sorted(sh), 2)
            if bin((sh[i] ^ sh[j]) & ((1 << 64) - 1)).count("1") <= 3
        }
        assert got == want


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 0.0, 0.0, 0.0], 0),     # identical to 0
        (2, [0.0, 1.0, 0.0, 0.0], 0),     # orthogonal to 0
        (3, [0.9, 0.1, 0.0, 0.0], 0),     # close to 0
        (4, [-1.0, 0.0, 0.0, 0.0], 1),    # opposite
    ]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>, label: int")


class TestSimilarity:
    def test_bruteforce_topk(self, vectors):
        q = vectors.filter(F.col("vec_id") == 0)
        out = similarity.topk_bruteforce(vectors, q, k=4)
        rows = sorted((r["rank"], r["neighbor_id"], r["cos_sim"]) for r in out.collect())
        assert rows[0][1] == 1 and rows[0][2] == 1.0          # identical first
        assert [r[1] for r in rows] == [1, 3, 2, 4]           # by cosine desc
        assert rows[3][2] == -1.0

    def test_lsh_bucket_recall(self, vectors):
        q = vectors.filter(F.col("vec_id") == 0)
        out = similarity.topk_lsh(vectors, q, k=4, nbits=4,
                                  multiprobe_hamming=0)
        ids = {r["neighbor_id"] for r in out.collect()}
        # 4 (negative first component) lands in another bucket; 1 and 3 share
        assert 1 in ids and 3 in ids and 4 not in ids

    def test_lsh_multiprobe_fixes_boundary_miss(self, vectors):
        """vec 4 ([-1,0,0,0]) is one sign flip (bit 0) from vec 0's bucket:
        invisible to single-probe, found by Hamming-1 multiprobe — which is
        the DEFAULT (the recall cliff must be opt-in, not opt-out)."""
        q = vectors.filter(F.col("vec_id") == 0)
        single = {
            r["neighbor_id"]
            for r in similarity.topk_lsh(
                vectors, q, k=4, nbits=4, multiprobe_hamming=0
            ).collect()
        }
        default = {
            r["neighbor_id"]
            for r in similarity.topk_lsh(vectors, q, k=4, nbits=4).collect()
        }
        assert 4 not in single and 4 in default
        assert single <= default

    def test_lsh_multiprobe_recall_measured(self, spark):
        """Recall@5 vs brute force on a deterministic random corpus:
        multiprobe must dominate single-probe per query (the candidate
        superset argument) and strictly improve on this corpus."""
        import numpy as np

        rng = np.random.RandomState(7)
        vecs = rng.randn(400, 16).astype("float32")
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(400)],
            "vec_id: long, embedding: array<float>",
        )
        q = df.filter(F.col("vec_id") % 40 == 0)

        def topk_sets(out):
            by_q: dict = {}
            for r in out.collect():
                by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return by_q

        truth = topk_sets(similarity.topk_bruteforce(df, q, k=5))
        single = topk_sets(
            similarity.topk_lsh(df, q, k=5, nbits=8, multiprobe_hamming=0)
        )
        multi = topk_sets(similarity.topk_lsh(df, q, k=5, nbits=8))

        def recall(got):
            return sum(
                len(got.get(qid, set()) & t) for qid, t in truth.items()
            ) / sum(len(t) for t in truth.values())

        r_single, r_multi = recall(single), recall(multi)
        for qid, t in truth.items():
            assert len(multi.get(qid, set()) & t) >= len(single.get(qid, set()) & t)
        assert r_multi > r_single, (r_single, r_multi)

    def test_ivf_cells_and_recall(self, vectors):
        # centroids = 2 lowest-id vectors: cells around [1,0,0,0] and
        # (duplicate) [1,0,0,0] — force 3 centroids so the orthogonal and
        # opposite vectors split off
        q = vectors.filter(F.col("vec_id") == 0)
        out = similarity.topk_ivf(vectors, q, k=4, n_centroids=3, nprobe=1)
        rows = {r["neighbor_id"]: r["cos_sim"] for r in out.collect()}
        # query's cell (centroid 0's) holds ids 1 and 3; 2/4 live in other
        # cells and are not probed at nprobe=1
        assert set(rows) == {1, 3}
        assert rows[1] == 1.0
        # nprobe=3 probes every cell -> full recall, matches brute force
        out_all = similarity.topk_ivf(vectors, q, k=4, n_centroids=3, nprobe=3)
        brute = similarity.topk_bruteforce(vectors, q, k=4)
        assert sorted(
            (r["rank"], r["neighbor_id"], r["cos_sim"]) for r in out_all.collect()
        ) == sorted(
            (r["rank"], r["neighbor_id"], r["cos_sim"]) for r in brute.collect()
        )

    def test_kmeans_separates_clusters(self, spark):
        # two tight cosine clusters around x-axis and y-axis
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0, 0.0]),
            (3, [0.1, 0.9, 0.0, 0.0]),
            (4, [0.8, 0.2, 0.0, 0.0]),
            (5, [0.2, 0.8, 0.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
        cents = similarity.kmeans_centroids(df, n_centroids=2, n_iters=2)
        assert [cid for cid, _ in cents] == [0, 1]
        got = {
            r["vec_id"]: r["cid"]
            for r in similarity.kmeans_assign(df, cents).collect()
        }
        assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}
        # centroid 0 = 6dp-rounded mean of its members
        import numpy as np

        want = np.round(np.mean([[1, 0], [0.9, 0.1], [0.8, 0.2]], axis=0), 6)
        assert cents[0][1][:2] == pytest.approx(list(want), abs=2e-6)

    def test_kmeans_deterministic_across_partitioning(self, spark):
        import numpy as np

        rng = np.random.RandomState(3)
        vecs = rng.randn(120, 8).astype("float32")
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(120)]
        df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
        a = similarity.kmeans_centroids(df.repartition(2), 4, n_iters=2)
        b = similarity.kmeans_centroids(df.repartition(13), 4, n_iters=2)
        # 6dp rounding quantizes away partial-agg summation order
        assert a == b

    def test_kmeans_empty_cluster_drops(self, vectors):
        # init centroids are ids 0 and 1 — identical vectors: every row
        # tie-breaks to the LOWER cid, cluster 1 empties and drops out
        cents = similarity.kmeans_centroids(vectors, n_centroids=2, n_iters=1)
        assert [cid for cid, _ in cents] == [0]

    def test_ivf_trained_full_probe_matches_brute(self, vectors):
        q = vectors.filter(F.col("vec_id") == 0)
        cents = similarity.kmeans_centroids(vectors, n_centroids=3, n_iters=2)
        out = similarity.topk_ivf(
            vectors, q, k=4, nprobe=max(len(cents), 1), centroids=cents
        )
        brute = similarity.topk_bruteforce(vectors, q, k=4)
        assert sorted(
            (r["rank"], r["neighbor_id"], r["cos_sim"]) for r in out.collect()
        ) == sorted(
            (r["rank"], r["neighbor_id"], r["cos_sim"]) for r in brute.collect()
        )

    def test_embedding_neardup(self, vectors):
        pairs = {
            (r["id1"], r["id2"]): r["cos_sim"]
            for r in dedup.embedding_neardup_pairs(
                vectors, block_col="label", threshold=0.9
            ).collect()
        }
        assert pairs[(0, 1)] == 1.0
        assert (0, 2) not in pairs
        assert (0, 4) not in pairs  # different label block


class TestMultimodal:
    def test_fixture_header_decode(self, spark):
        payloads = [
            (1, b"IMG:320:240:jpg:" + b"P" * 100),
            (2, b"\x89PNG not really"),
        ]
        df = spark.createDataFrame(payloads, "id: long, payload: binary")
        meta = {r["id"]: r for r in multimodal.decode_meta(df).collect()}
        assert (meta[1]["width"], meta[1]["height"], meta[1]["format"]) == (320, 240, "jpg")
        assert meta[1]["byte_len"] == 116
        n = meta[2]["byte_len"]
        assert (meta[2]["width"], meta[2]["height"], meta[2]["format"]) == (
            1 + n % 640, 1 + n % 480, "bin",
        )
        assert meta[1]["content_md5"] == hashlib.md5(payloads[0][1]).hexdigest()

    def test_resize_plan_aspect(self, spark):
        df = spark.createDataFrame(
            [(1, 640, 480), (2, 100, 50)], "id: long, width: int, height: int"
        )
        out = {r["id"]: (r["target_width"], r["target_height"])
               for r in multimodal.resize_plan(df, max_side=256).collect()}
        assert out[1] == (256, 192)   # scaled by 256/640
        assert out[2] == (100, 50)    # never upscaled

    def test_real_decode_rejects_fixture_header(self):
        # the seam is closed (real PNG/GIF/JPEG headers decode for real —
        # tests/test_multimodal_codec.py); the FIXTURE header is not a
        # real image and must not be mistaken for one
        with pytest.raises(ValueError):
            multimodal.decode_real(b"IMG:1:1:jpg:x")

    def test_frame_sample_plan(self, spark):
        df = spark.createDataFrame([(1, 30 * 1024)], "id: long, byte_len: long")
        out = multimodal.frame_sample_plan(df, every_n=10, fps=30).collect()
        idxs = sorted(r["frame_idx"] for r in out)
        assert idxs == [0, 10, 20]
        ts = {r["frame_idx"]: r["frame_ts_s"] for r in out}
        assert ts[10] == round(10 / 30.0, 4)


def test_kmeans_early_stop_fixed_point(spark):
    """Two tight, well-separated pairs converge after 2 Lloyd updates; the
    free driver-side probe must make any larger n_iters return the
    identical centroid table (no behavior change, just fewer scans)."""
    from webcrawler_spark.operators import similarity

    vecs = [
        (0, [1.0, 0.0]), (1, [0.0, 1.0]),
        (2, [1.0, 0.01]), (3, [0.01, 1.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    c2 = similarity.kmeans_centroids(emb, n_centroids=2, n_iters=2)
    c10 = similarity.kmeans_centroids(emb, n_centroids=2, n_iters=10)
    assert c2 == c10
