"""Tests for training-data pipeline operators (dedup + text analysis).

Semantics checks on tiny in-memory corpora; cross-engine parity with the
DuckDB oracles is covered by tools/check_oracle.py at the driver level.
"""

import pytest
from pyspark.sql import functions as F

from jvector_spark.pipeline import dedup as D
from jvector_spark.pipeline import text as T

DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (0, "the quick brown fox jumps over the lazy dog", "en", "s0", 43),
    (1, "The quick  brown fox jumps over the lazy dog ", "en", "s0", 45),  # ws/case dup of 0
    (2, "the quick brown fox jumps over the lazy cat", "en", "s0", 43),  # near-dup of 0
    (3, "der hund und die katze sind mit von auf das", "de", "s1", 43),
    (4, "le chat est dans la maison et pour les oiseaux", "fr", "s1", 46),
    (5, "completely different words appear here nothing shared", "en", "s1", 53),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_exact_dedup_groups_whitespace_case_variants(docs):
    rows = {r.doc_id: r for r in D.exact_dedup(docs).collect()}
    assert rows[0].content_hash == rows[1].content_hash
    assert rows[0].group_size == 2 and rows[1].group_size == 2
    assert rows[0].is_canonical and not rows[1].is_canonical
    assert rows[2].group_size == 1 and rows[2].is_canonical


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5, block_col="source").collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # identical after norm
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (3, 4) not in pairs  # different block
    assert all(a < b for a, b in pairs)


def test_minhash_lsh_recovers_high_jaccard_pairs(docs):
    # identical docs share all bands at any banding
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert all(j >= 0.5 for j in pairs.values())  # verification is exact
    # near-dup 0-2 (j≈0.67) needs a banding whose s-curve sits below 0.67:
    # 8 bands x 2 rows -> threshold ~(1/8)^(1/2)=0.35, recovery p>0.99
    wide = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.minhash_lsh_pairs(docs, threshold=0.5, bands=8).collect()
    }
    assert (0, 2) in wide and 0.5 <= wide[(0, 2)] < 1.0
    verified = D.minhash_lsh_pairs(docs, threshold=0.99, bands=8).collect()
    assert {(r.doc_a, r.doc_b) for r in verified} == {(0, 1)}


def test_simhash_identical_docs_hamming_zero(docs):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in D.simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs.get((0, 1)) == 0  # identical after norm -> same fingerprint
    # every reported pair respects the verify threshold
    assert all(h <= 3 for h in pairs.values())


def test_simhash_fingerprints_norm_invariant_and_bounded(docs):
    fp = {r.doc_id: r.fp for r in D.simhash_fingerprints(docs).collect()}
    assert fp[0] == fp[1]
    assert all(0 <= v < 2**32 for v in fp.values())
    # near-dup docs are closer in hamming than unrelated docs
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(fp[0], fp[2]) < ham(fp[0], fp[5])


def test_embedding_neardup_threshold(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.04, 0.0]),
            (2, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = {(r.id_a, r.id_b): r.cos for r in D.embedding_neardup(emb, threshold=0.95).collect()}
    assert set(pairs) == {(0, 1)} and pairs[(0, 1)] > 0.99


def test_embedding_neardup_chunked_prefilter_matches_full(spark):
    """r9 item 25: phase-1 scoring is row-chunked (small per-worker
    scratch). The chunked f32 pre-filter may differ from a full-matrix
    GEMM by ulps AT the margin boundary, but the final pair set after
    the exact f64 rescore must be identical — spanning chunk borders,
    zero-norm rows, and cos==1 ties at the threshold."""
    import numpy as np

    rng = np.random.default_rng(7)
    n, d = 1200, 16
    centers = rng.normal(size=(12, d))
    mat = (centers[rng.integers(0, 12, n)] + 0.02 * rng.normal(size=(n, d))).astype(
        np.float32
    )
    mat[5] = 0.0  # zero-norm row
    mat[100] = mat[200]  # exact duplicate -> cos == 1.0 tie
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.id_a, r.id_b): r.cos
        for r in D.embedding_neardup(emb, threshold=0.98, n_blocks=4).collect()
    }
    # reference: exact f64 all-pairs with the oracle's ROUND(x,6) >= t rule
    m64 = mat.astype(np.float64)
    nrm = np.sqrt((m64 * m64).sum(1))
    nrm[nrm == 0.0] = 1.0
    cos = np.round((m64 @ m64.T) / np.outer(nrm, nrm), 6)
    ia, ib = np.nonzero(cos >= 0.98)
    want = {(int(a), int(b)): float(cos[a, b]) for a, b in zip(ia, ib) if a < b}
    assert got == want
    assert (100, 200) in got and got[(100, 200)] == 1.0


def test_token_stats(docs):
    rows = {r.doc_id: r for r in T.token_stats(docs).collect()}
    assert rows[0].n_tokens == 9
    assert rows[1].n_tokens == 9  # whitespace runs collapse
    assert rows[0].n_regex_tokens == 9
    assert abs(rows[0].avg_token_len - (43 - 8) / 9) < 1e-6  # column is ROUND(x, 6)


def test_quality_score_bounds_and_monotonicity(docs):
    rows = {r.doc_id: r for r in T.quality_score(docs).collect()}
    for r in rows.values():
        assert 0.0 <= r.quality <= 1.0
        assert 0.0 <= r.stopword_ratio <= 1.0
    # doc 5 has no stopwords -> lower stopword_ratio than doc 0
    assert rows[5].stopword_ratio < rows[0].stopword_ratio


def test_language_id_predicts_stopword_language(docs):
    rows = {r.doc_id: r for r in T.language_id(docs).collect()}
    assert rows[0].pred_lang == "en"
    assert rows[3].pred_lang == "de"
    assert rows[4].pred_lang == "fr"
    assert rows[5].pred_lang == "und"  # no stopword hits


def test_fingerprint_deterministic_and_norm_invariant(docs):
    fp = {r.doc_id: r.fp for r in T.fingerprint(docs).collect()}
    assert fp[0] == fp[1]  # normalization-invariant
    assert fp[0] != fp[2]
    assert all(0 <= v < T.MOD for v in fp.values())


def test_duplicate_clusters_known_components(spark):
    """Min-label propagation resolves transitive chains and leaves
    singleton-free output (docs with no pair are absent)."""
    from jvector_spark.pipeline.cluster import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 20)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_duplicate_clusters_long_chain_round_budget(spark):
    """A 1,000-node chain (diameter 999) must converge under a small
    round budget: path halving makes rounds O(log diameter) (~12 here),
    where plain min-propagation would need ~999 and overrun any sane
    max_iterations."""
    from jvector_spark.pipeline.cluster import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "doc_a long, doc_b long"
    )
    got = duplicate_clusters(pairs, max_iterations=20).collect()
    assert len(got) == 1000
    assert all(r["cluster_id"] == 0 for r in got)


def test_winnowing_guarantee_and_robustness(spark):
    """Winnowing's contract (Schleimer et al. §2): documents sharing a
    run of >= k + w - 1 consecutive k-gram hashes share at least one
    fingerprint — and small edits far from the shared run do not destroy
    the match (unlike the exact digest)."""
    from jvector_spark.pipeline.dedup import winnowing_pairs

    shared = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = spark.createDataFrame(
        [
            (1, "intro one " + shared + " tail alpha"),
            (2, "different opening words " + shared + " other ending here"),
            (3, "completely unrelated text about spark catalyst optimizer plans"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnowing_pairs(docs, min_shared=1).collect()
    }
    assert (1, 2) in pairs  # shared run -> shared fingerprints, guaranteed
    assert all(3 not in p for p in pairs)  # unrelated doc matches nothing


def test_repetition_stats_flags_repetitive_docs(spark):
    """Gopher-rule signals: a doc that is one phrase repeated scores far
    higher on both ratios than natural text."""
    docs = spark.createDataFrame(
        [
            (1, "buy now " * 20),
            (2, "the quick brown fox jumps over the lazy dog by the river"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in T.repetition_stats(docs).collect()}
    assert rows[1]["dup_word_ratio"] > 0.9 > rows[2]["dup_word_ratio"]
    assert rows[1]["top_bigram_ratio"] > 0.4 > rows[2]["top_bigram_ratio"]


def test_decontaminate_against_bruteforce(spark):
    """Benchmark decontamination: per-doc distinct-hit counts must equal a
    brute-force python n-gram overlap, eval docs flag themselves, and
    sub-n-token docs can never be contaminated."""
    from jvector_spark.pipeline.decontaminate import decontaminate

    docs = [
        (0, "the quick brown fox jumps over the lazy dog today"),   # eval
        (1, "a quick brown fox jumps over the lazy dog indeed"),    # shares grams
        (2, "completely different words with no overlap at all ok"),
        (3, "short doc"),                                           # < n tokens
        (4, "THE  Quick   brown fox JUMPS over the lazy dog today"),# = doc0 after norm
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_hit_grams"], r["contaminated"])
        for r in decontaminate(df, df.filter("doc_id = 0"), n=4).collect()
    }

    def grams(t, n=4):
        toks = " ".join(t.lower().split()).split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)} if len(toks) >= n else set()

    ev = grams(docs[0][1])
    for doc_id, text in docs:
        hits = len(grams(text) & ev)
        assert got[doc_id] == (hits, int(hits > 0)), (doc_id, got[doc_id], hits)
    assert got[0][1] == 1 and got[4][1] == 1 and got[2] == (0, 0) and got[3] == (0, 0)


# ------------------------------------------------------------- packing (r6)
def test_pack_sequences_partitions_shard_stream(spark):
    """Within every shard the token intervals must tile [0, shard total)
    with no gaps or overlaps in the deterministic (h, doc_id) order, and
    the sequence span must be the chunk arithmetic of the interval."""
    from jvector_spark.pipeline.pack import pack_sequences

    rows = [(i, " ".join(f"w{j}" for j in range(1 + (i * 7) % 23))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, seq_len=16, n_shards=4).toPandas()
    assert len(out) == 200
    for shard, grp in out.groupby("shard"):
        g = grp.sort_values("tok_start")
        assert g["tok_start"].iloc[0] == 0
        assert (g["tok_end"].values[:-1] == g["tok_start"].values[1:]).all()
        assert (g["tok_end"] - g["tok_start"] == g["n_tokens"]).all()
    assert (out["seq_first"] == out["tok_start"] // 16).all()
    nonempty = out[out["n_tokens"] > 0]
    assert (nonempty["seq_last"] == (nonempty["tok_end"] - 1) // 16).all()
    # determinism: same input, same mapping
    out2 = pack_sequences(df, seq_len=16, n_shards=4).toPandas()
    assert out.sort_values("doc_id").reset_index(drop=True).equals(
        out2.sort_values("doc_id").reset_index(drop=True)
    )


def test_mixture_weights_temperature_limits(docs):
    """temperature=1 reproduces natural shares; temperature=0 is uniform;
    0<t<1 up-weights the small stratum. mix_prob always sums to 1."""
    from jvector_spark.pipeline.sampling import mixture_weights

    nat = {r["source"]: r for r in mixture_weights(docs, temperature=1.0).collect()}
    assert abs(sum(r["mix_prob"] for r in nat.values()) - 1.0) < 1e-6
    for r in nat.values():
        assert abs(r["mix_prob"] - r["natural_share"]) < 1e-6

    uni = mixture_weights(docs, temperature=0.0).collect()
    assert all(abs(r["mix_prob"] - 1.0 / len(uni)) < 1e-6 for r in uni)

    mid = {r["source"]: r for r in mixture_weights(docs, temperature=0.5).collect()}
    small = min(nat, key=lambda s: nat[s]["natural_share"])
    assert mid[small]["mix_prob"] > nat[small]["natural_share"]
    # the dominant stratum keeps everything; others downsample
    assert max(r["keep_fraction"] for r in mid.values()) == 1.0


def test_redact_pii_scrubs_and_counts(spark):
    from jvector_spark.pipeline.text import redact_pii

    df = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+x@example.org or bob@sub.host.net today"),
            (1, "server 10.0.255.7 answered, id 123456789012 logged"),
            (2, "clean text, short number 12345 kept"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[0]["n_email"] == 2 and "<EMAIL>" in got[0]["redacted"]
    assert "@" not in got[0]["redacted"]
    assert got[1]["n_ip"] == 1 and got[1]["n_idnum"] == 1
    assert "<IP>" in got[1]["redacted"] and "<NUM>" in got[1]["redacted"]
    assert got[2]["n_email"] == got[2]["n_ip"] == got[2]["n_idnum"] == 0
    assert got[2]["redacted"] == "clean text, short number 12345 kept"


def test_line_dedup_keeps_first_occurrence_and_short_lines(spark):
    boiler = "SHARED BOILERPLATE LINE THAT RECURS EVERYWHERE"
    rows = [
        (1, boiler + "\nunique content of document one\nzz"),
        (2, boiler + "\nanother document's unique line"),
        (3, "third doc leads with its own line\n" + boiler),
        (4, boiler),  # emptied entirely -> dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in D.line_dedup(docs, min_len=20).collect()}
    # first (doc_id, pos) occurrence keeps the boilerplate; others lose it
    assert out[1] == boiler + "\nunique content of document one\nzz"
    assert out[2] == "another document's unique line"
    assert out[3] == "third doc leads with its own line"
    assert 4 not in out  # every line was a later occurrence
    # short lines are exempt even when duplicated
    short = spark.createDataFrame(
        [(1, "zz\nlong distinctive line aaaaaaaaaaaa"), (2, "zz")],
        "doc_id long, text string",
    )
    out2 = {r.doc_id: r.text for r in D.line_dedup(short, min_len=20).collect()}
    assert out2[2] == "zz"


def test_line_dedup_hash_mode_matches_raw_mode(spark):
    rows = [
        (i, f"common header line shared by all docs\nbody {i} with words")
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    raw = sorted((r.doc_id, r.text) for r in D.line_dedup(docs).collect())
    hashed = sorted(
        (r.doc_id, r.text) for r in D.line_dedup(docs, hash_lines=True).collect()
    )
    assert raw == hashed


def test_span_dedup_removes_later_occurrences_only(spark):
    phrase = "one two three four five six"  # 6-word duplicated span
    rows = [
        (1, f"alpha {phrase} beta"),
        (2, f"gamma {phrase} delta"),  # later occurrence -> span cut
        (3, "totally unrelated words here and everywhere"),
        (4, phrase),  # emptied entirely -> dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in D.span_dedup(docs, span_len=6).collect()}
    assert out[1] == f"alpha {phrase} beta"  # first occurrence intact
    assert out[2] == "gamma delta"
    assert out[3] == "totally unrelated words here and everywhere"
    assert 4 not in out


def test_span_dedup_within_doc_repetition_and_short_docs(spark):
    # repetition INSIDE one document: second occurrence cut, first kept
    rows = [
        (1, "x y z x y z"),
        (2, "too short"),  # shorter than span_len -> untouched
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in D.span_dedup(docs, span_len=2).collect()}
    # windows of 2: "x y","y z","z x","x y","y z"; marked = wpos 3,4
    # -> covered tpos {3,4,5}; survivors "x y z"
    assert out[1] == "x y z"
    assert out[2] == "too short"


def test_span_dedup_hash_mode_matches_raw_mode(spark):
    shared = "a long shared verbatim passage of many words repeated across docs"
    rows = [(i, f"doc {i} prefix {shared} suffix {i}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    raw = sorted((r.doc_id, r.text) for r in D.span_dedup(docs, span_len=5).collect())
    hashed = sorted(
        (r.doc_id, r.text)
        for r in D.span_dedup(docs, span_len=5, hash_windows=True).collect()
    )
    assert raw == hashed


def test_span_dedup_matches_reference_impl_on_random_corpora(spark):
    """Randomized parity against an independent single-process reference:
    tiny vocab + short windows force dense duplicate/overlap structure
    (within-doc repeats, cross-doc repeats, whole-doc erasure)."""

    def ref_span_dedup(rows, L):
        toks = {doc: text.split(" ") for doc, text in rows}
        first = {}
        for doc, _ in sorted(rows):
            t = toks[doc]
            for p in range(len(t) - L + 1):
                first.setdefault(tuple(t[p : p + L]), (doc, p))
        out = {}
        for doc, _ in rows:
            t = toks[doc]
            removed = set()
            for p in range(len(t) - L + 1):
                if first[tuple(t[p : p + L])] != (doc, p):
                    removed.update(range(p, p + L))
            kept = [tok for i, tok in enumerate(t) if i not in removed]
            if kept:
                out[doc] = " ".join(kept)
        return out

    import random

    for seed in (0, 1, 2):
        rnd = random.Random(seed)
        L = rnd.randint(2, 4)
        rows = [
            (
                doc,
                " ".join(
                    rnd.choice("abc") for _ in range(rnd.randint(1, 20))
                ),
            )
            for doc in range(15)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r.text for r in D.span_dedup(docs, span_len=L).collect()}
        assert got == ref_span_dedup(rows, L), f"seed={seed} L={L}"


def test_split_by_key_contamination_safe(spark, documents):
    """Every key's rows share one split; fractions apportion keys; the
    assignment is deterministic and salt-independent draws differ."""
    from pyspark.sql import functions as F

    from jvector_spark.pipeline.sampling import split_by_key

    out = split_by_key(documents, 0.25, 0.25, key_col="source").cache()
    per_key = out.groupBy("source").agg(
        F.count_distinct("split").alias("n_splits")
    )
    assert all(r["n_splits"] == 1 for r in per_key.collect())
    a = sorted((r["doc_id"], r["split"]) for r in out.select("doc_id", "split").collect())
    b = sorted(
        (r["doc_id"], r["split"])
        for r in split_by_key(documents, 0.25, 0.25, key_col="source")
        .select("doc_id", "split").collect()
    )
    assert a == b  # deterministic
    c = split_by_key(documents, 0.25, 0.25, key_col="source", salt="other")
    assert sorted(
        (r["doc_id"], r["split"]) for r in c.select("doc_id", "split").collect()
    ) != a  # independent draw
    out.unpersist()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        split_by_key(documents, 0.6, 0.5)


def test_shuffle_corpus_permutation_and_shards(spark, documents):
    """shuffle_rank is a dense 0..n-1 permutation, deterministic per salt,
    different across salts, shards balanced round-robin; the plan never
    funnels through a single-partition global window (bucketed
    prefix-sum)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from jvector_spark.pipeline.sampling import shuffle_corpus

    n = documents.count()
    out = shuffle_corpus(documents, n_shards=4).cache()
    ranks = [r["shuffle_rank"] for r in out.select("shuffle_rank").collect()]
    assert sorted(ranks) == list(range(n))
    shard_counts = {
        r["shard"]: r["count"]
        for r in out.groupBy("shard").count().collect()
    }
    assert max(shard_counts.values()) - min(shard_counts.values()) <= 1
    again = shuffle_corpus(documents, n_shards=4)
    assert sorted(
        (r["doc_id"], r["shuffle_rank"]) for r in again.select("doc_id", "shuffle_rank").collect()
    ) == sorted((r["doc_id"], r["shuffle_rank"]) for r in out.select("doc_id", "shuffle_rank").collect())
    other = shuffle_corpus(documents, salt="epoch2")
    assert sorted(
        (r["doc_id"], r["shuffle_rank"]) for r in other.select("doc_id", "shuffle_rank").collect()
    ) != sorted((r["doc_id"], r["shuffle_rank"]) for r in out.select("doc_id", "shuffle_rank").collect())
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    # the rank window is partitioned by bucket, never a global sort
    assert "Window" not in buf.getvalue() or "_b" in buf.getvalue()
    out.unpersist()
