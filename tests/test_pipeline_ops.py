"""Training-data pipeline semantics: planted near-duplicates are found
by MinHash-LSH / SimHash / embedding-LSH; multimodal plumbing yields the
right shapes; exact ANN agrees with a numpy brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ugfraud_spark.operators import ann, dedup, mix, multimodal


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(80)]
    rows = []
    for i in range(60):
        words = list(rng.choice(vocab, size=40))
        rows.append((i, " ".join(words)))
        if i % 10 == 0:  # plant a near-dup: same text, one word changed
            mutated = words.copy()
            mutated[20] = "MUT"
            rows.append((1000 + i, " ".join(mutated)))
        if i % 15 == 0:  # plant an exact dup
            rows.append((2000 + i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_finds_planted(spark, docs_with_dups):
    d = dedup.exact_dups(docs_with_dups)
    dups = d.where(F.col("n_docs") > 1).collect()
    assert {r["keep_id"] for r in dups} == {0, 15, 30, 45}
    assert all(r["n_docs"] == 2 for r in dups)


def test_lsh_finds_planted_neardups(spark, docs_with_dups):
    pairs = {(r["doc_a"], r["doc_b"])
             for r in dedup.lsh_candidate_pairs(docs_with_dups).collect()}
    for i in [0, 10, 20, 30, 40, 50]:
        assert (i, 1000 + i) in pairs, f"near-dup pair ({i},{1000+i}) missed"


def test_ngram_jaccard_ranks_neardups_high(spark, docs_with_dups):
    j = {(r["doc_a"], r["doc_b"]): r["jaccard"]
         for r in dedup.ngram_jaccard_pairs(docs_with_dups).collect()}
    planted = [j[(i, 1000 + i)] for i in [0, 10, 20, 30, 40, 50] if (i, 1000 + i) in j]
    assert planted and min(planted) > 0.8
    exact = [j[(i, 2000 + i)] for i in [0, 15, 30, 45] if (i, 2000 + i) in j]
    assert exact and all(v == 1.0 for v in exact)


def test_lsh_jaccard_verified_against_python(spark):
    """Randomized model check over the whole LSH+verify chain: every
    emitted pair's jaccard equals a pure-python recomputation from raw
    shingle sets, and every planted EXACT duplicate is always emitted
    (identical text → identical signatures → same band buckets)."""
    rng = np.random.RandomState(17)
    vocab = [f"w{i}" for i in range(50)]
    for _trial in range(3):
        texts = [" ".join(rng.choice(vocab, size=rng.randint(5, 25)))
                 for _ in range(30)]
        texts += [texts[0], texts[5]]  # exact dups with new ids
        rows = [(i, t) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup.ngram_jaccard_pairs(docs).collect()

        def sset(t):
            w = t.split(" ")
            return {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}

        ss = {i: sset(t) for i, t in rows}
        for r in out:
            a, b = ss[r["doc_a"]], ss[r["doc_b"]]
            assert r["jaccard"] == round(len(a & b) / len(a | b), 6), r
        got = {(r["doc_a"], r["doc_b"]) for r in out}
        assert (0, 30) in got and (5, 31) in got


def test_grouped_percentiles_matches_numpy(spark):
    """The histogram + cumulative walk must reproduce np.percentile's
    linear interpolation exactly, per group, including duplicates."""
    from ugfraud_spark.operators import attrs

    rng = np.random.RandomState(3)
    rows = [("a", int(v)) for v in rng.randint(0, 40, size=173)]
    rows += [("b", int(v)) for v in rng.randint(100, 110, size=31)]
    rows += [("c", 7)]  # singleton group: every percentile is the value
    df = spark.createDataFrame(rows, "g string, v long")
    # NULLs must be ignored (quantile_cont semantics), not ranked
    df = df.unionAll(spark.createDataFrame(
        [("a", None), ("c", None)], "g string, v long"))
    out = {r["g"]: r for r in
           attrs.grouped_percentiles(df, "g", "v", [0.5, 0.9, 0.99]).collect()}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        assert out[g]["n_rows"] == len(vals)
        for p, cname in ((50, "p50"), (90, "p90"), (99, "p99")):
            assert out[g][cname] == round(float(np.percentile(vals, p)), 6), \
                (g, cname)


def test_incremental_dedup_directional(spark):
    """A batch doc near-dupping a corpus doc is reported; a novel batch
    doc is not; corpus-internal duplicate pairs are NOT reported (the
    join is directional — the corpus was already deduped)."""
    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(300)]
    a = list(rng.choice(vocab, size=100))
    corpus_rows = [(1, " ".join(a)), (2, " ".join(a)),  # internal dup pair
                   (3, " ".join(list(rng.choice(vocab, size=100))))]
    near = a.copy()
    near[10], near[40] = "X1", "X2"
    batch_rows = [(100, " ".join(near)),
                  (101, " ".join(list(rng.choice(vocab, size=100))))]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    out = dedup.incremental_dedup(corpus, batch, threshold=0.8).collect()
    got = {(r["new_id"], r["old_id"]) for r in out}
    assert got == {(100, 1), (100, 2)}, got
    assert all(r["jaccard"] >= 0.8 for r in out)


def test_repetition_metrics_hand_computed(spark):
    """Planted docs with hand-computable repetition fractions."""
    from ugfraud_spark.functions import text as tx

    rows = [(1, "a a b"),        # 2 distinct of 3; top 'a' 2/3; bigrams all distinct
            (2, "x x x x"),      # top 1.0; bigram 'x x' x3 -> dup 2/3
            (3, "p q r s")]      # no repetition at all
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exprs = tx.repetition_exprs(F.col("text"))
    out = {r["doc_id"]: r for r in docs.select(
        "doc_id", *[c.alias(n) for n, c in exprs.items()]).collect()}
    assert out[1]["n_tokens"] == 3
    assert out[1]["dup_word_frac"] == round(1 - 2 / 3, 6)
    assert out[1]["top_word_frac"] == round(2 / 3, 6)
    assert out[1]["dup_bigram_frac"] == 0.0
    assert out[2]["dup_word_frac"] == 0.75
    assert out[2]["top_word_frac"] == 1.0
    assert out[2]["dup_bigram_frac"] == round(1 - 1 / 3, 6)
    assert out[3]["dup_word_frac"] == 0.0
    assert out[3]["top_word_frac"] == 0.25
    assert out[3]["dup_bigram_frac"] == 0.0


def test_corpus_sample_mix_rates_and_stability(spark, sf_small):
    """rate=1.0 keeps a stratum exactly; fractional rates land near
    their target; and the keep decision is PER-DOC deterministic — the
    kept set of a subset equals the subset of the kept set (no RNG, no
    dependence on corpus composition or partitioning)."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    rates = {"en": 0.25, "zh": 1.0}
    kept = mix.corpus_sample(docs, rates, default_rate=0.5).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert len(by_lang["zh"]) == totals["zh"]  # rate 1.0 keeps all
    en_frac = len(by_lang.get("en", ())) / totals["en"]
    assert 0.1 < en_frac < 0.4  # hash uniformity at ~tens of docs
    for lang in totals:
        if lang not in rates:
            frac = len(by_lang.get(lang, ())) / totals[lang]
            assert 0.25 < frac < 0.75

    sub = docs.where(F.col("doc_id") % 3 == 0)
    kept_sub = {r["doc_id"] for r in
                mix.corpus_sample(sub, rates, default_rate=0.5).collect()}
    kept_all = {r["doc_id"] for r in kept}
    assert kept_sub == {i for i in kept_all if i % 3 == 0}


def test_dedup_clusters_transitive_chain(spark):
    """A→B→C edit chain where A~C alone falls BELOW the pair threshold
    must still land in one cluster (closure, not pairwise), canonical =
    least doc_id; untouched docs don't appear at all."""
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(300)]
    base = list(rng.choice(vocab, size=100))
    b = base.copy()
    b[10], b[40] = "X1", "X2"
    c = b.copy()
    c[70], c[90] = "X3", "X4"
    other = list(rng.choice(vocab, size=100))
    rows = [(1, " ".join(base)), (2, " ".join(b)), (3, " ".join(c)),
            (10, " ".join(other)), (11, " ".join(other)),
            (20, " ".join(list(rng.choice(vocab, size=100))))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    j = {(r["doc_a"], r["doc_b"]): r["jaccard"]
         for r in dedup.ngram_jaccard_pairs(docs).collect()}
    assert j[(1, 2)] >= 0.8 and j[(2, 3)] >= 0.8
    assert j.get((1, 3), 0.0) < 0.8  # the chain link LSH can't shortcut

    out = {r["doc_id"]: r for r in dedup.dedup_clusters(docs).collect()}
    assert [out[i]["canonical_id"] for i in (1, 2, 3)] == [1, 1, 1]
    assert out[1]["cluster_size"] == 3 and out[1]["is_canonical"] == 1
    assert out[2]["is_canonical"] == 0 and out[3]["is_canonical"] == 0
    assert out[10]["canonical_id"] == 10 and out[10]["cluster_size"] == 2
    assert 20 not in out


def test_simhash_close_for_neardups(spark, docs_with_dups):
    s = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs_with_dups).collect()}
    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))
    planted = [ham(s[i], s[1000 + i]) for i in [0, 10, 20, 30, 40, 50]]
    others = [ham(s[i], s[(i + 7) % 60]) for i in range(0, 50, 7)]
    assert np.mean(planted) < np.mean(others)
    assert all(s[i] == s[2000 + i] for i in [0, 15, 30, 45])


def test_cosine_topk_matches_numpy(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    got = ann.cosine_topk(emb, [0, 1, 2], k=3).collect()
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    for q in [0, 1, 2]:
        qv = vecs[q]
        cos = {
            i: float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
            for i, v in vecs.items() if i != q
        }
        want = sorted(cos, key=lambda i: (-round(cos[i], 6), i))[:3]
        got_q = [r["neighbor_id"] for r in sorted(
            (g for g in got if g["query_id"] == q), key=lambda r: r["rank"])]
        assert got_q == want


def test_lsh_neardup_recall_on_duplicated_vectors(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet").limit(100)
    # plant exact duplicate vectors with new ids
    dup = emb.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    both = emb.unionAll(dup)
    pairs = {(r["vec_a"], r["vec_b"])
             for r in ann.lsh_neardup_pairs(both, threshold=0.999).collect()}
    for i in range(5):
        assert (i, 10000 + i) in pairs


def test_multimodal_plumbing(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    assets = multimodal.synth_assets(docs)
    dec = multimodal.decode_assets(assets, fake=True)
    rows = dec.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert len(r["feature"]) == 8
        if r["kind"] == "image":
            assert r["n_frames"] == 1
    fs = multimodal.frame_sample(dec, every=5)
    assert fs.where(F.col("frame_idx") % 5 != 0).count() == 0
    # real decode on non-BMP/WAV payloads names the unsupported format
    with pytest.raises(Exception, match="unsupported container"):
        multimodal.decode_assets(assets, fake=False).collect()


def _tiny_bmp(width: int, height: int) -> bytes:
    """Minimal 24bpp bottom-up BMP with a deterministic pixel array."""
    import struct

    row = ((width * 3 + 3) // 4) * 4  # rows padded to 4 bytes
    pixels = bytes((x * 7 + 3) % 256 for x in range(row * height))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            len(pixels), 2835, 2835, 0, 0))
    return header + pixels


def _tiny_wav(channels: int, bits: int, n_frames: int) -> bytes:
    """Minimal PCM RIFF/WAVE container."""
    import struct

    block = channels * bits // 8
    data = bytes((i * 11 + 5) % 256 for i in range(block * n_frames))
    fmt = struct.pack("<HHIIHH", 1, channels, 8000, 8000 * block, block, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_real_decode_bmp_wav(spark):
    """fake=False parses genuine BMP and WAV containers end-to-end
    through the same Arrow mapInPandas plumbing."""
    bmp = _tiny_bmp(5, 3)
    wav = _tiny_wav(channels=2, bits=16, n_frames=40)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(bmp), ("t", "en")),
         (2, "audio", bytearray(wav), ("t", "en"))],
        "asset_id long, kind string, payload binary, "
        "meta struct<origin string, lang string>",
    )
    rows = {r["asset_id"]: r
            for r in multimodal.decode_assets(assets, fake=False).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["n_frames"]) == (5, 3, 1)
    assert rows[1]["feature"][0] == pytest.approx(3 / 255.0)
    # wav: width=channels, height=bits, n_frames=sample frames
    assert (rows[2]["width"], rows[2]["height"], rows[2]["n_frames"]) == (2, 16, 40)
    assert rows[2]["feature"][0] == pytest.approx(5 / 255.0)


def test_ivf_topk_recall_vs_exact(spark, sf_small):
    """IVF coarse-quantizer ANN: with n_probe covering a quarter of the
    lists, recall@3 against the exact brute-force top-k must be high, and
    every returned neighbor must carry its exact cosine (IVF only prunes
    the candidate set, it never changes scores)."""
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = {(r["query_id"], r["neighbor_id"])
             for r in ann.cosine_topk(emb, qids, k=3).collect()}
    # synthetic embeddings are near-uniform (no cluster structure), the
    # hard case for IVF: measured recall@3 is 0.73/0.87/0.93 at
    # n_probe=4/6/8 of 16 lists — the standard recall/probe tradeoff
    got_rows = ann.ivf_topk(emb, qids, k=3, n_lists=16, n_probe=6).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in got_rows}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.8, f"IVF recall@3 too low: {recall}"
    # scores are exact cosines for returned pairs
    ex_cos = {(r["query_id"], r["neighbor_id"]): r["cos"]
              for r in ann.cosine_topk(emb, qids, k=50).collect()}
    for r in got_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in ex_cos:
            assert abs(r["cos"] - ex_cos[key]) < 1e-9


def test_lsh_bucket_cap_drops_degenerate_band(spark, caplog):
    """A planted degenerate bucket (1k identical docs -> one band key per
    band holding all of them) is dropped by the MAX_BUCKET cap instead of
    exploding into ~500k pairs per band; distinct docs' pairs survive."""
    import logging

    rows = [(i, "the same boilerplate text repeated every time") for i in range(1000)]
    # two genuine near-dups outside the degenerate bucket
    rows.append((5000, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((5001, "alpha beta gamma delta epsilon zeta eta theta"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    with caplog.at_level(logging.WARNING, logger="ugfraud_spark.dedup"):
        pairs = {(r["doc_a"], r["doc_b"])
                 for r in dedup.lsh_candidate_pairs(docs, max_bucket=100).collect()}
    assert (5000, 5001) in pairs
    # nothing from the degenerate bucket: its quadratic blow-up was capped
    assert all(a >= 5000 for a, _ in pairs), pairs
    assert any("dropped" in r.message for r in caplog.records)


def test_ann_bucket_cap_drops_degenerate_bucket(spark, caplog):
    """Same cap on the embedding-LSH side: a spike of identical vectors
    lands in one sign-LSH bucket and is dropped at max_bucket, while a
    small planted near-dup pair in another bucket survives."""
    import logging

    rng = np.random.RandomState(11)
    spike = rng.randn(8).tolist()
    other = rng.randn(8).tolist()
    rows = [(i, [float(x) for x in spike]) for i in range(300)]
    rows.append((9000, [float(x) for x in other]))
    rows.append((9001, [float(x) for x in other]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    with caplog.at_level(logging.WARNING, logger="ugfraud_spark.ann"):
        got = ann.lsh_neardup_pairs(emb, threshold=0.999, max_bucket=50).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in got}
    assert (9000, 9001) in pairs
    assert all(a >= 9000 for a, _ in pairs), pairs
    assert any("dropped" in r.message for r in caplog.records)


def test_contamination_matches_python_model(spark, sf_small):
    """Every output row equals a pure-python recomputation from raw
    shingle sets (bench = doc_id % 31 == 0), including the flag's
    un-rounded threshold comparison and the <3-token absence rule."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    rows = docs.select("doc_id", "text").collect()

    def sh_set(t):
        w = t.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    bench = set()
    for r in rows:
        if r["doc_id"] % 31 == 0:
            bench |= sh_set(r["text"])
    expect = {}
    for r in rows:
        if r["doc_id"] % 31 == 0:
            continue
        s = sh_set(r["text"])
        if not s:
            continue
        hit = len(s & bench)
        expect[r["doc_id"]] = (len(s), hit, round(hit / len(s), 6),
                               hit / len(s) >= 0.25)
    got = {r["doc_id"]: (r["n_shingles"], r["n_hit"], r["overlap"],
                         r["contaminated"])
           for r in dedup.contamination(docs).collect()}
    assert got == expect
    assert any(v[1] > 0 for v in expect.values())  # non-degenerate


def test_remove_boilerplate_known_corpus(spark):
    """12-word docs = spans [w0..w9, w10 w11]. A 10-word span shared by
    docs 0 and 1 is boilerplate (df=2); each doc's unique tail span
    survives and reassembles in order. Doc 2 shares nothing and passes
    through byte-identical; doc 3 is ALL boilerplate (it equals the
    shared span exactly) and must stay present with empty clean_text."""
    shared = " ".join(f"w{i}" for i in range(10))
    rows = [
        (0, shared + " a0 b0"),
        (1, shared + " a1 b1"),
        (2, " ".join(f"u{i}" for i in range(12))),
        (3, shared),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.remove_boilerplate(docs).collect()}
    assert out[0]["clean_text"] == "a0 b0"
    assert out[0]["n_spans"] == 2 and out[0]["n_kept"] == 1
    assert out[1]["clean_text"] == "a1 b1"
    assert out[2]["clean_text"] == rows[2][1]  # untouched doc round-trips
    assert out[2]["n_spans"] == 2 and out[2]["n_kept"] == 2
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0


def test_pack_sequences_hand_computed(spark):
    """budget=10, bucket=2 docs (forces the cross-bucket offset path):
    token counts [4, 7, 3, 12, 5] → offsets [0, 4, 11, 14, 26]; doc 1
    straddles the seq-0/1 boundary, doc 3 straddles 1/2, doc 4 starts
    in 2 and ends in 3."""
    from ugfraud_spark.operators import packing

    counts = [4, 7, 3, 12, 5]
    rows = [(i, " ".join(["w"] * c)) for i, c in enumerate(counts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           packing.pack_sequences(docs, budget=10, bucket_docs=2).collect()}
    expect = {  # doc_id: (tok_offset, seq_id, n_seqs)
        0: (0, 0, 1), 1: (4, 0, 2), 2: (11, 1, 1),
        3: (14, 1, 2), 4: (26, 2, 2),
    }
    for i, (off, seq, ns) in expect.items():
        assert out[i]["n_tokens"] == counts[i]
        assert (out[i]["tok_offset"], out[i]["seq_id"],
                out[i]["n_seqs"]) == (off, seq, ns), out[i]


def test_quality_filter_rules_fire_individually(spark):
    """One doc per rule: each verdict carries exactly the expected
    fail_rules audit string in declaration order."""
    from ugfraud_spark.operators import quality

    good = "the cat sat of the mat and then walked away toward town " \
           "with great calm under bright stars tonight"        # 19 varied
    short = "the cat"                                          # min_tokens
    nostop = " ".join(f"word{i}" for i in range(20))           # stopwords
    thin = "a " + " ".join("bcdefghijklmnopqr"[i] for i in range(16))
    spam = "the " + " ".join(["spam"] * 19)     # dup_words + dup_bigrams
    docs = spark.createDataFrame(
        list(enumerate([good, short, nostop, thin, spam])),
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in quality.quality_filter(docs).collect()}
    assert out[0]["keep"] and out[0]["fail_rules"] == ""
    assert out[1]["fail_rules"] == "min_tokens" and out[1]["n_failed"] == 1
    assert out[2]["fail_rules"] == "stopwords"
    assert out[3]["fail_rules"] == "avg_token_len"
    assert out[4]["fail_rules"] == "dup_words,dup_bigrams"
    assert not out[4]["keep"] and out[4]["n_failed"] == 2


def test_lm_doc_scores_hand_computed(spark):
    """Tiny corpus, full model traced by hand in python: add-one
    bigram probs over the corpus's own counts; a 1-token doc
    contributes to the vocabulary but has no bigram and is absent."""
    import math
    from collections import Counter

    from ugfraud_spark.operators import lmscore

    texts = {0: "a b a b", 1: "a b c", 2: "x"}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    out = {r["doc_id"]: r for r in lmscore.lm_doc_scores(docs).collect()}

    toks = {i: t.split(" ") for i, t in texts.items()}
    bigrams = {i: list(zip(w, w[1:])) for i, w in toks.items()}
    c_bg = Counter(b for bs in bigrams.values() for b in bs)
    c_w1 = Counter(b[0] for bs in bigrams.values() for b in bs)
    v = len({t for w in toks.values() for t in w})
    for i, bs in bigrams.items():
        if not bs:
            assert i not in out
            continue
        lps = [round(math.log((c_bg[b] + 1) / (c_w1[b[0]] + v)), 6)
               for b in bs]
        assert out[i]["n_bigrams"] == len(bs)
        assert abs(out[i]["avg_logprob"] - round(sum(lps) / len(bs), 6)) \
            < 1e-9


def test_winnow_fingerprint_semantics(spark):
    """Winnowing claims: fingerprints equal a python replay of the
    window-min rule; the MOSS guarantee holds (docs sharing a token
    run of >= k+w-1 share a fingerprint); a short doc selects the min
    of its <w hashes; a <k-token doc is absent."""
    import hashlib

    from ugfraud_spark.operators import dedup

    texts = {0: "p q r s t u v zebra lion",      # shares run w/ doc 1
             1: "x y p q r s t u v",             # 6-token shared run
             2: "a b c d",                        # 2 shingles < w
             3: "one two"}                        # no shingle
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    got = {}
    for r in dedup.winnow_fingerprints(docs, w=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])

    def replay(t, k=3, w=4):
        ws = t.split(" ")
        hs = [hashlib.md5(" ".join(ws[i:i + k]).encode()).hexdigest()
              for i in range(len(ws) - k + 1)]
        if not hs:
            return set()
        return {min(hs[j:j + w]) for j in range(max(len(hs) - w + 1, 1))}

    for i, t in texts.items():
        assert got.get(i, set()) == replay(t), i
    assert got[0] & got[1]                       # MOSS guarantee
    assert 3 not in got

    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"]
             for r in dedup.winnow_dup_pairs(docs, min_shared=1).collect()}
    assert pairs[(0, 1)] == len(got[0] & got[1])

    # bucket cap: a fingerprint shared by every doc is dropped
    boiler = spark.createDataFrame(
        [(i, "same same same same same same") for i in range(5)],
        "doc_id long, text string")
    assert dedup.winnow_dup_pairs(boiler, min_shared=1,
                                  max_bucket=4).count() == 0


def test_collocations_pmi_semantics(spark):
    """PMI claims the shared-formula oracle can't see: an
    always-together pair outranks an independent pair of the same
    count, the min_count guard drops a maximal-PMI hapax pair, and
    every score equals a python replay."""
    import math
    from collections import Counter

    from ugfraud_spark.operators import lmscore

    # "new york" always adjacent (4×); "the dog" co-occurs but "the"
    # is everywhere; "rara avis" appears once (hapax pair)
    texts = ["new york new york the dog", "new york the cat the dog",
             "the dog the bird new york", "rara avis the fish"]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    out = {(r["w1"], r["w2"]): r
           for r in lmscore.collocations(docs, min_count=2, k=50).collect()}

    toks = [t.split(" ") for t in texts]
    uni = Counter(w for ws in toks for w in ws)
    bgs = [b for ws in toks for b in zip(ws, ws[1:])]
    c_bg = Counter(bgs)
    n_tok, n_bg = sum(uni.values()), len(bgs)
    for (w1, w2), r in out.items():
        exp = round(math.log((c_bg[(w1, w2)] * n_tok * n_tok)
                             / (n_bg * uni[w1] * uni[w2])), 6)
        assert r["n_pair"] == c_bg[(w1, w2)] and r["pmi"] == exp
    assert ("rara", "avis") not in out          # min_count guard
    assert out[("new", "york")]["pmi"] > out[("the", "dog")]["pmi"]


def test_epoch_shuffle_is_seeded_permutation(spark):
    """Positions are a bijection onto [0, n); the order matches the
    python model of the same hash; different seeds produce
    STRUCTURALLY different orders (adjacent-pair overlap near chance —
    the additive-seed bug made every 'epoch' a rotation of one fixed
    order, sharing ~all adjacent pairs, and `!=` alone missed it);
    the same seed is stable across calls."""
    from ugfraud_spark.operators import shuffle
    from ugfraud_spark.sources.tables import PRIOR_MOD

    n = 200
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n)], "doc_id long, text string")

    def got(seed):
        return {r["doc_id"]: r["shuffle_pos"] for r in
                shuffle.epoch_shuffle(docs, seed=seed,
                                      n_buckets=16).collect()}

    g1 = got(1)
    assert sorted(g1.values()) == list(range(n))  # bijection
    order = sorted(
        range(n),
        key=lambda d: ((d * shuffle.seed_mult(1) + 1) % PRIOR_MOD, d),
    )
    assert g1 == {d: p for p, d in enumerate(order)}  # python model
    assert got(1) == g1          # stable

    def adjacent_pairs(g):
        seq = sorted(g, key=g.get)
        return {(seq[i], seq[i + 1]) for i in range(len(seq) - 1)}

    overlap = len(adjacent_pairs(g1) & adjacent_pairs(got(2)))
    assert overlap < n * 0.05, overlap  # rotations share ~n-1 pairs


def test_source_reputation_rollup(spark):
    """Two sources; srcB contains a 1-token doc (in n_docs but not
    n_scored). keep_rate from the verdicts, avg_lm = HALF_UP-rounded
    decimal mean of the per-doc LM scores."""
    from decimal import ROUND_HALF_UP, Decimal

    from ugfraud_spark.operators import lmscore, quality

    rows = [
        (0, "the cat sat of the mat and then walked away toward town "
            "with great calm under bright stars tonight", "srcA"),
        (1, "the cat", "srcA"),                       # fails min_tokens
        (2, "x", "srcB"),                             # 1 token: no LM row
        (3, "the dog ran of the hill and then came back toward home "
            "with great speed under heavy rain today", "srcB"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")
    rep = {r["source"]: r for r in
           quality.source_reputation(docs).collect()}
    lm = {r["doc_id"]: r["avg_logprob"] for r in
          lmscore.lm_doc_scores(docs).collect()}

    assert rep["srcA"]["n_docs"] == 2 and rep["srcA"]["n_keep"] == 1
    assert rep["srcA"]["keep_rate"] == 0.5
    assert rep["srcB"]["n_docs"] == 2 and rep["srcB"]["n_scored"] == 1

    def mean6(vals):
        s = sum(Decimal(repr(v)).quantize(Decimal("0.000001"))
                for v in vals)
        return float(Decimal(repr(float(s) / len(vals))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP))

    assert rep["srcA"]["avg_lm"] == mean6([lm[0], lm[1]])
    assert rep["srcB"]["avg_lm"] == mean6([lm[3]])


def test_epoch_pack_composes_shuffle_and_prefix_sum(spark):
    """epoch_pack's offsets are exactly the exclusive prefix sums of
    token counts taken in the seeded shuffle order (python model of
    both stages composed)."""
    from ugfraud_spark.operators import packing, shuffle
    from ugfraud_spark.sources.tables import PRIOR_MOD

    rng = np.random.RandomState(23)
    rows = [(i, " ".join(["w"] * int(rng.randint(1, 30))))
            for i in range(150)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           packing.epoch_pack(docs, seed=3, budget=50,
                              bucket_docs=16).collect()}

    m = shuffle.seed_mult(3)
    order = sorted(range(150), key=lambda d: ((d * m + 3) % PRIOR_MOD, d))
    ntok = {i: len(t.split(" ")) for i, t in rows}
    off = 0
    for d in order:
        assert got[d]["tok_offset"] == off, d
        assert got[d]["seq_id"] == off // 50
        off += ntok[d]


def _bpe_python(texts, merges):
    """Reference model of learn_bpe's exact semantics: word-freq
    table, weighted adjacent-pair counts, (n DESC, pair ASC) argmax,
    single-pass boundary-safe str.replace merge."""
    from collections import Counter

    wf = Counter(w for t in texts for w in t.split(" "))
    seqs = {" ".join(w): c for w, c in wf.items()}
    out = []
    for k in range(1, merges + 1):
        pc = Counter()
        for s, c in seqs.items():
            a = s.split(" ")
            for i in range(len(a) - 1):
                pc[a[i] + " " + a[i + 1]] += c
        pair, n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((k, pair, pair.replace(" ", ""), n))
        seqs = {
            (" " + s + " ").replace(" " + pair + " ",
                                    " " + pair.replace(" ", "") + " ")
            .strip(): c
            for s, c in seqs.items()
        }
    return out


def _bpe_python_encode(texts, merges):
    """Reference model of token_counts: apply _bpe_python's final
    word→sequence state to each doc."""
    from collections import Counter

    wf = Counter(w for t in texts for w in t.split(" "))
    seqs = {w: " ".join(w) for w in wf}
    merged = _bpe_python(texts, merges)
    for _, pair, new, _n in merged:
        seqs = {
            w: (" " + s + " ").replace(" " + pair + " ", " " + new + " ")
            .strip()
            for w, s in seqs.items()
        }
    out = {}
    for d, t in enumerate(texts):
        ws = t.split(" ")
        out[d] = (len(ws), sum(len(seqs[w].split(" ")) for w in ws))
    return out


def test_bpe_token_counts_matches_python_model(spark):
    """Encoding with the learned merges: per-doc word + token counts
    equal the python model's replay of the final merge state."""
    from ugfraud_spark.operators import bpe

    texts = [
        "the there then them the the theory",
        "the cat then the hat aaaa",
        "this the that aaaa aaaa",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_tokens"])
           for r in bpe.token_counts(docs, merges=6).collect()}
    assert got == _bpe_python_encode(texts, 6), got
    # merging strictly compresses: tokens < chars, tokens >= words
    for d, t in enumerate(texts):
        n_sym = len(t.replace(" ", ""))
        assert got[d][0] <= got[d][1] < n_sym


def test_learn_bpe_matches_python_model(spark):
    """The full training loop equals the python reference on a corpus
    with planted frequency structure ('th' must be merge #1, 'the'
    a later merge), including tie-breaks and the single-pass merge
    semantics on a consecutive-run word ('aaaa')."""
    from ugfraud_spark.operators import bpe

    texts = [
        "the there then them the the theory",
        "the cat then the hat aaaa",
        "this the that aaaa aaaa",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = sorted(
        (r["round"], r["pair"], r["merged"], r["n"])
        for r in bpe.learn_bpe(docs, merges=6).collect()
    )
    want = _bpe_python(texts, 6)
    assert got == want, (got, want)
    assert got[0][1] == "t h" and got[0][2] == "th"  # planted structure
    merges = [g[2] for g in got]
    assert "the" in merges  # cascaded merge builds on round 1's symbol


def test_grouped_split_purity_fraction_and_model(spark):
    """Leakage-safety is GROUP purity: every doc of a source lands on
    one side. The decision replays in python (md5 nibble math), and
    over many synthetic sources the test fraction is near 10%."""
    import hashlib

    from ugfraud_spark.operators import mix

    rows = [(i, f"site{i % 400}.example") for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = mix.grouped_split(docs).collect()

    by_source = {}
    for r in got:
        by_source.setdefault(r["source"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_source.values())  # purity

    def want(source):
        v = int(hashlib.md5(source.encode()).hexdigest()[:8], 16)
        return "test" if v % 1000 < 100 else "train"

    for r in got:
        assert r["split"] == want(r["source"]), r["source"]
    test_sources = sum(1 for s, v in by_source.items() if v == {"test"})
    assert 15 <= test_sources <= 70  # ~10% of 400, loose binomial band


def test_kmeans_assign_python_replay_and_separation(spark):
    """Lloyd on two well-separated planted blobs: the full algorithm
    (init = k smallest ids, argmin with id tie-break, scaled-int64
    mean updates, empty-cluster carry) replays in python exactly, and
    the two blobs end up in two pure clusters."""
    import numpy as np

    from ugfraud_spark.operators import kmeans as km

    rng = np.random.RandomState(7)
    pts = np.vstack([rng.normal(0.0, 0.05, (20, 4)),
                     rng.normal(1.0, 0.05, (20, 4))]).astype(np.float32)
    order = rng.permutation(40)
    rows = [(int(i), [float(x) for x in pts[order[i]]])
            for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["cluster"]
           for r in km.kmeans_assign(emb, k=2, iters=3).collect()}

    v = {i: [float(np.float64(x)) for x in pts[order[i]]]
         for i in range(40)}
    cents = [v[0], v[1]]
    assign = {}
    for it in range(3):
        for i, vec in v.items():
            ds = [sum((x - c) * (x - c) for x, c in zip(vec, cc))
                  for cc in cents]
            assign[i] = min(range(2), key=lambda j: (ds[j], j))
        if it == 2:
            break
        for j in range(2):
            mine = [v[i] for i in v if assign[i] == j]
            if not mine:
                continue
            n = len(mine)
            cents[j] = [
                sum(int(round(x * 1e6)) for x in (vec[d] for vec in mine))
                / (n * 1e6)
                for d in range(4)
            ]
    assert got == assign
    blob = {i: (0 if order[i] < 20 else 1) for i in range(40)}
    sides = {}
    for i, c in got.items():
        sides.setdefault(c, set()).add(blob[i])
    assert all(len(s) == 1 for s in sides.values())


def test_cms_guarantees(spark):
    """The two claims the shared-formula oracle can't see: the
    estimate never under-counts any key (min over rows is true count
    plus non-negative collision mass), and the sketch is additive
    under any input split (the map-side-combine scale claim)."""
    from ugfraud_spark.operators import sketch

    # zipf-ish: key j appears 200//(j+1) times, heavy head + long tail
    rows = [(j,) for j in range(120) for _ in range(200 // (j + 1))]
    keys = spark.createDataFrame(rows, "key long")
    est = sketch.cms_estimates(keys, d=4, w=32).collect()
    assert len(est) == 120
    by_key = {r["key"]: r for r in est}
    for j in range(120):
        r = by_key[j]
        assert r["true_cnt"] == 200 // (j + 1)
        assert r["est"] >= r["true_cnt"]
    # w=32 << 120 keys forces real collisions — the test input must
    # actually exercise the over-count path, not vacuously pass
    assert any(r["est"] > r["true_cnt"] for r in est)
    # the global L1 error bound eps*N with w=32 is loose; pin a sane cap
    n_total = len(rows)
    assert all(r["est"] - r["true_cnt"] <= 2 * n_total / 32 for r in est)

    # additivity: sketch(all) == sketch(first half) + sketch(second)
    a = spark.createDataFrame(rows[: len(rows) // 2], "key long")
    b = spark.createDataFrame(rows[len(rows) // 2:], "key long")
    grid = {(r["r"], r["bucket"]): r["cnt"]
            for r in sketch.cms_sketch(keys, d=4, w=32).collect()}
    ga = {(r["r"], r["bucket"]): r["cnt"]
          for r in sketch.cms_sketch(a, d=4, w=32).collect()}
    gb = {(r["r"], r["bucket"]): r["cnt"]
          for r in sketch.cms_sketch(b, d=4, w=32).collect()}
    merged = {c: ga.get(c, 0) + gb.get(c, 0) for c in set(ga) | set(gb)}
    assert merged == grid

    # heavy hitters: the true top key (j=0, 200 occurrences) must lead
    top = sketch.cms_heavy_hitters(keys, d=4, w=32, k=5).collect()
    assert top[0]["key"] == 0 and top[0]["true_cnt"] == 200


def test_hashed_features_semantics(spark):
    """Independent checks the shared-formula oracle can't provide:
    the md5-slice hash equals hashlib's, cell values equal a python
    replay, and two planted same-dim opposite-sign tokens cancel."""
    import hashlib

    from ugfraud_spark.operators import features

    docs = spark.createDataFrame(
        [(1, "alpha beta beta gamma"), (2, "alpha alpha delta")],
        "doc_id long, text string")
    d = 32
    rows = features.hashed_features(docs, d=d).collect()

    def H(term):
        return int(hashlib.md5(term.encode()).hexdigest()[:8], 16)

    expect = {}
    for doc, text in [(1, "alpha beta beta gamma"), (2, "alpha alpha delta")]:
        for term in set(text.split()):
            tf = text.split().count(term)
            h = H(term)
            sign = 1 if (h >> 8) % 2 == 0 else -1
            key = (doc, h % d)
            expect[key] = expect.get(key, 0) + sign * tf
    expect = {k: v for k, v in expect.items() if v != 0}
    assert {(r["doc_id"], r["dim"]): r["val"] for r in rows} == expect

    # planted collision: find two vocab words with equal dim, opposite
    # sign, then check a doc holding one of each hashes to NO cell
    by_dim = {}
    pair = None
    for i in range(2000):
        t = f"tok{i}"
        h = H(t)
        s = 1 if (h >> 8) % 2 == 0 else -1
        other = by_dim.get((h % d, -s))
        if other:
            pair = (other, t)
            break
        by_dim.setdefault((h % d, s), t)
    assert pair, "no opposite-sign collision in 2000 tokens"
    solo = spark.createDataFrame([(9, f"{pair[0]} {pair[1]}")],
                                 "doc_id long, text string")
    assert features.hashed_features(solo, d=d).count() == 0


def test_quantize_embeddings_semantics(spark):
    """Reconstruction-error bound (≤ half a quantization step per
    dim), exact endpoints (lo→0, hi→levels), constant-dim handling,
    and code range."""
    from ugfraud_spark.operators import features

    vecs = [(0, [0.0, 5.0, 7.5]), (1, [1.0, 5.0, -2.5]),
            (2, [0.25, 5.0, 10.0])]
    embs = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = features.quantize_embeddings(embs, bits=8).collect()
    assert len(rows) == 9
    x = {(vid, i): v for vid, vec in vecs for i, v in enumerate(vec)}
    lo = {0: 0.0, 1: 5.0, 2: -2.5}
    hi = {0: 1.0, 1: 5.0, 2: 10.0}
    for r in rows:
        dim, code = r["dim"], r["code"]
        assert 0 <= code <= 255
        if hi[dim] == lo[dim]:
            assert code == 0 and r["dequant"] == 5.0
            continue
        step = (hi[dim] - lo[dim]) / 255
        assert abs(r["dequant"] - x[(r["vec_id"], dim)]) <= step / 2 + 1e-6
        if x[(r["vec_id"], dim)] == lo[dim]:
            assert code == 0
        if x[(r["vec_id"], dim)] == hi[dim]:
            assert code == 255


def test_item_cooccurrence_semantics(spark):
    """Hand-built sessions: pair counts and cosine come out exactly,
    an event at exactly the gap starts a NEW session (half-open rule,
    matching F.session_window), and an oversized bot session is
    dropped BEFORE it can mint pairs or inflate item counts."""
    from datetime import datetime, timedelta

    from ugfraud_spark.operators import covisit

    t0 = datetime(2024, 1, 1, 8, 0, 0)

    def ev(eid, user, minutes, item):
        return (eid, t0 + timedelta(minutes=minutes), user,
                "click", 1.0, '{"k": %d}' % item)

    rows = [
        # user 1, session A: items {1, 2}
        ev(1, 1, 0, 1), ev(2, 1, 10, 2),
        # gap 40 >= 30 → session B: items {2, 3}
        ev(3, 1, 50, 2), ev(4, 1, 55, 3),
        # exactly 30 minutes later → half-open rule → session C: {1}
        ev(5, 1, 85, 1),
        # user 2, one session: items {1, 2}
        ev(6, 2, 0, 1), ev(7, 2, 5, 2),
        # user 3 is a bot: 6 items > max_items=5 → session dropped
        *[ev(10 + i, 3, i, i + 1) for i in range(6)],
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

    sess = covisit.session_items(events, gap_minutes=30)
    got = {(r["user_id"], r["sid"], r["item"]) for r in sess.collect()}
    assert {(u, s, i) for (u, s, i) in got if u == 1} == {
        (1, 1, 1), (1, 1, 2), (1, 2, 2), (1, 2, 3), (1, 3, 1)}

    out = covisit.item_cooccurrence(events, gap_minutes=30,
                                    max_items=5, min_count=2).collect()
    assert len(out) == 1
    r = out[0]
    # (1,2) co-occurs in user1/A and user2; n_1 = {A, C, user2} = 3,
    # n_2 = {A, B, user2} = 3 — the bot session (which held both items)
    # contributes to neither
    assert (r["item_a"], r["item_b"], r["n_ab"], r["n_a"], r["n_b"]) == \
        (1, 2, 2, 3, 3)
    assert r["cosine"] == round(2 / 3, 6)


def test_funnel_and_retention_hand_computed(spark):
    """Hand event log: funnel's strict min-ts chaining (a click BEFORE
    the first view must not count; a purchase between view and click
    must not count) and the retention triangle both equal the obvious
    python replay."""
    import datetime as dt

    from ugfraud_spark.operators import funnel

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta
    rows = [
        # user 1: full clean funnel
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + m(hours=1), 1, "click", 0.0, "{}"),
        (3, t0 + m(hours=2), 1, "purchase", 0.0, "{}"),
        # user 2: click BEFORE first view -> stalls at view
        (4, t0, 2, "click", 0.0, "{}"),
        (5, t0 + m(hours=1), 2, "view", 0.0, "{}"),
        # user 3: purchase before click -> stalls at click
        (6, t0, 3, "view", 0.0, "{}"),
        (7, t0 + m(hours=1), 3, "purchase", 0.0, "{}"),
        (8, t0 + m(hours=2), 3, "click", 0.0, "{}"),
        # user 4: never views
        (9, t0, 4, "click", 0.0, "{}"),
        # retention shape: user 1 active again in weeks 1 and 3
        (10, t0 + m(days=8), 1, "view", 0.0, "{}"),
        (11, t0 + m(days=22), 1, "click", 0.0, "{}"),
        # user 5 first appears in week 1, active week 2
        (12, t0 + m(days=7), 5, "view", 0.0, "{}"),
        (13, t0 + m(days=14), 5, "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

    fun = {r["stage"]: r for r in funnel.funnel_counts(ev).collect()}
    # viewers: users 1,2,3,5 (user 4 never views); clicks-after-view:
    # users 1,3; purchase-after-click: user 1 only
    assert (fun[1]["n_users"], fun[2]["n_users"], fun[3]["n_users"]) \
        == (4, 2, 1)
    assert fun[2]["conv"] == 0.5 and fun[3]["conv"] == 0.25

    ret = {(r["cohort_week"], r["week_offset"]): r
           for r in funnel.retention_cohorts(ev).collect()}
    # cohort 0 = users {1,2,3,4}; user 1 active offsets 0,1,3
    assert ret[(0, 0)]["n_active"] == 4 and ret[(0, 0)]["n_cohort"] == 4
    assert ret[(0, 1)]["n_active"] == 1 and ret[(0, 1)]["rate"] == 0.25
    assert ret[(0, 3)]["n_active"] == 1
    assert (0, 2) not in ret
    # cohort 1 = user 5, retained at offset 1
    assert ret[(1, 0)]["n_cohort"] == 1 and ret[(1, 1)]["rate"] == 1.0


def test_activity_gini_known_distributions(spark):
    """Gini pins: perfect equality -> 0; one user owning nearly all
    events approaches (n-1)/n; and an arbitrary case equals the
    classic sorted-rank formula computed in python."""
    import datetime as dt

    from ugfraud_spark.operators import funnel

    t = dt.datetime(2024, 1, 1)

    def ev(counts):
        rows, eid = [], 0
        for uid, c in counts.items():
            for _ in range(c):
                rows.append((eid, t, uid, "view", 0.0, "{}"))
                eid += 1
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")

    eq = funnel.activity_gini(ev({u: 5 for u in range(4)})).first()
    assert (eq["n_users"], eq["total_events"], eq["gini"]) == (4, 20, 0.0)

    skew = funnel.activity_gini(ev({0: 97, 1: 1, 2: 1, 3: 1})).first()
    # exact: sorted x = [1,1,1,97]; G = (2*(1+2+3+4*97)-5*100)/(4*100)
    assert skew["gini"] == (2 * (1 + 2 + 3 + 4 * 97) - 5 * 100) / 400

    counts = {0: 3, 1: 7, 2: 7, 3: 1, 4: 12}
    g = funnel.activity_gini(ev(counts)).first()
    xs = sorted(counts.values())
    n, s = len(xs), sum(xs)
    want = (2 * sum((i + 1) * x for i, x in enumerate(xs))
            - (n + 1) * s) / (n * s)
    assert g["gini"] == want


def test_event_transitions_hand_computed(spark):
    """Two interleaved user streams: transitions are counted within a
    user (never across users), ordered by (ts, event_id), and the
    rows of each from_type's probabilities sum to 1."""
    import datetime as dt

    from ugfraud_spark.operators import funnel

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta
    rows = [
        (1, t0 + m(minutes=0), 1, "view", 0.0, "{}"),
        (2, t0 + m(minutes=1), 2, "click", 0.0, "{}"),   # other user
        (3, t0 + m(minutes=2), 1, "click", 0.0, "{}"),
        (4, t0 + m(minutes=3), 1, "view", 0.0, "{}"),
        (5, t0 + m(minutes=4), 2, "view", 0.0, "{}"),
        # same-ts tie broken by event_id: 6 then 7
        (6, t0 + m(minutes=5), 1, "click", 0.0, "{}"),
        (7, t0 + m(minutes=5), 1, "purchase", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {(r["from_type"], r["to_type"]): r
           for r in funnel.event_transitions(ev).collect()}
    # user1: view->click, click->view, view->click, click->purchase
    # user2: click->view
    assert out[("view", "click")]["n"] == 2
    assert out[("click", "view")]["n"] == 2
    assert out[("click", "purchase")]["n"] == 1
    assert ("click", "click") not in out      # never across users
    assert out[("view", "click")]["prob"] == 1.0
    assert out[("click", "view")]["prob"] == 2 / 3
    by_from = {}
    for (f_, _t), r in out.items():
        by_from[f_] = by_from.get(f_, 0.0) + r["prob"]
    assert all(abs(v - 1.0) < 1e-12 for v in by_from.values())


def test_corpus_keep_decision_stage_order(spark):
    """Planted docs exercising each drop stage and the first-failing
    precedence: a doc that is BOTH low-quality and a duplicate reports
    'quality'; the duplicate copy (not the canonical min-id) reports
    'duplicate'; benchmark ids (id%31==0) report 'benchmark'; a train
    doc overlapping the benchmark reports 'contaminated'."""
    from ugfraud_spark.operators import funnel

    good = "the " + " ".join(f"word{i:02d}" for i in range(19))
    bench_text = "the " + " ".join(f"mark{i:02d}" for i in range(19))
    rows = [
        (62, bench_text),     # benchmark doc (62 % 31 == 0)
        (1, good),            # clean keeper
        (2, good),            # exact dup of 1 -> 'duplicate' (min id 1 wins)
        (3, "x x"),           # fails quality (too short)
        (4, "y y"),           # fails quality AND dup of nothing
        # train doc sharing ~90% of the benchmark's shingles (not an
        # exact dup) -> contaminated
        (5, bench_text + " tail01 tail02"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string") \
        .withColumn("lang", F.lit("en"))
    out = {r["doc_id"]: r
           for r in funnel.corpus_keep_decision(docs).collect()}
    assert out[1]["keep_doc"] and out[1]["drop_reason"] == ""
    assert out[2]["drop_reason"] == "duplicate"
    assert out[3]["drop_reason"] == "quality"
    assert out[4]["drop_reason"] == "quality"
    assert out[62]["drop_reason"] == "benchmark"
    assert out[5]["drop_reason"] == "contaminated"
    assert set(out) == {1, 2, 3, 4, 5, 62}


def test_chunk_documents_grid_and_reconstruction(spark):
    """Chunk grid replay: starts step by chunk-overlap, widths cap at
    the doc end, consecutive chunks share exactly `overlap` tokens,
    and concatenating each chunk's non-overlap prefix rebuilds the
    doc."""
    from ugfraud_spark.operators.packing import chunk_documents

    texts = {0: " ".join(f"t{i}" for i in range(40)),  # 2 chunks
             1: " ".join(f"u{i}" for i in range(10)),  # 1 short chunk
             2: " ".join(f"v{i}" for i in range(25))}  # tail chunk of 1
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    out = {}
    for r in chunk_documents(docs, chunk_tokens=32, overlap=8).collect():
        out.setdefault(r["doc_id"], {})[r["chunk_id"]] = r

    for d, t in texts.items():
        ws = t.split(" ")
        want = {}
        k = 0
        for s in range(0, len(ws), 24):
            k += 1
            want[k] = ws[s:s + 32]
        assert set(out[d]) == set(want)
        for k, ws_k in want.items():
            r = out[d][k]
            assert r["n_tokens"] == len(ws_k)
            assert r["chunk_text"] == " ".join(ws_k)
    # doc 0: chunks [0..31], [24..39] -> 8-token overlap
    a = out[0][1]["chunk_text"].split(" ")
    b = out[0][2]["chunk_text"].split(" ")
    assert a[-8:] == b[:8]
    # reconstruction from non-overlap prefixes + final tail
    rebuilt = a + b[8:]
    assert rebuilt == texts[0].split(" ")


def test_event_rate_anomaly_hand_replay(spark):
    """z = (n·x − S1)/sqrt(n·S2 − S1²) replayed by hand; zero-variance
    types filtered; hour bucketing epoch-aligned."""
    import datetime as dt
    import math

    from ugfraud_spark.operators.funnel import event_rate_anomaly

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    rows = []
    eid = 0
    # type A: counts 1, 2, 9 in three separate hours
    for hour, cnt in [(0, 1), (1, 2), (2, 9)]:
        for _ in range(cnt):
            eid += 1
            rows.append((eid, t0 + hour * h + dt.timedelta(minutes=5),
                         7, "A", 0.0, "{}"))
    # type B: constant 3, 3 -> zero variance, filtered out
    for hour in (0, 1):
        for _ in range(3):
            eid += 1
            rows.append((eid, t0 + hour * h, 8, "B", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {(r["event_type"], r["window_start"].hour): r
           for r in event_rate_anomaly(ev).collect()}

    assert {k[0] for k in out} == {"A"}
    n, s1, s2 = 3, 12, 1 + 4 + 81
    for hour, x in [(0, 1), (1, 2), (2, 9)]:
        r = out[("A", hour)]
        assert r["n_events"] == x
        want = (n * x - s1) / math.sqrt(n * s2 - s1 * s1)
        assert r["z"] == want  # exact: same IEEE ops
        assert r["is_anomaly"] == (abs(want) >= 2.0)
    # the spike hour is the anomaly
    assert not out[("A", 0)]["is_anomaly"]
    assert not out[("A", 1)]["is_anomaly"]
    # z for x=9: (27-12)/sqrt(258-144)=15/sqrt(114)=1.405... not >= 2
    assert out[("A", 2)]["z"] == 15 / math.sqrt(114)


def test_snapshot_delta_hand_replay(spark):
    """All four statuses from a tiny pair of snapshots, plus the
    demo construction's epoch membership rules."""
    from ugfraud_spark.operators.crawl import (
        crawl_delta_demo, fingerprint, snapshot_delta)

    old = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "cc")], "doc_id long, fp string")
    new = spark.createDataFrame(
        [(2, "bb"), (3, "CC"), (4, "dd")], "doc_id long, fp string")
    out = {r["doc_id"]: r["status"]
           for r in snapshot_delta(old, new).collect()}
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}

    # fingerprint digests the UTF-8 bytes (known md5 of 'abc')
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    assert fingerprint(docs).collect()[0]["fp"] == \
        "900150983cd24fb0d6963f7d28e17f72"

    # demo epochs: doc_id 0 is only in NEW (added, despite %5 change);
    # doc_id 3 is only in OLD (removed); doc_id 5 is recrawled with
    # changed bytes; doc_id 1 recrawled unchanged.
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string")
    out = {r["doc_id"]: r["status"]
           for r in crawl_delta_demo(docs).collect()}
    assert out[0] == "added"       # %7==0 not in old; %5==0 irrelevant
    assert out[3] == "removed"     # %11==3 not in new
    assert out[5] == "changed"     # in both, %5==0 -> '#v2' bytes
    assert out[1] == "unchanged"   # in both, untouched
    assert set(out) == {0, 1, 2, 3, 4, 5, 6, 7}


def test_robots_admission_longest_match(spark):
    """Longest-match-wins both directions: a longer allow overrides a
    shorter deny and vice versa; default '/' admits everything else."""
    from ugfraud_spark.operators.robots import (
        demo_rules, doc_urls, robots_admission, robots_admission_demo)

    # host_id = doc_id % 37; pick doc_ids landing on rule-bearing hosts
    # h=9: 9%3==0 AND 9%4==1 -> full rule chain on one host
    docs = spark.createDataFrame(
        [(9, "t", "en", "src15", 1),     # h9  /src15/... matches /src1 (deny) + /src (deny)
         (46, "t", "en", "src12", 1),    # h9  /src12 allow overrides /src1 deny
         (83, "t", "en", "src7", 1),     # h9  /src7/en allow overrides /src deny
         (120, "t", "de", "src7", 1),    # h9  /src7/de -> /src deny (no /src7/en match)
         (157, "t", "en", "other", 1),   # h9  default '/' allow
         (1, "t", "en", "src15", 1)],    # h1  %4==1: /src deny; %3!=0 so no /src1
        "doc_id long, text string, lang string, source string, n_chars long")
    out = {r["doc_id"]: (r["allowed"], r["rule_prefix"])
           for r in robots_admission_demo(docs).collect()}
    assert out[9] == (False, "/src1")
    assert out[46] == (True, "/src12")
    assert out[83] == (True, "/src7/en")
    assert out[120] == (False, "/src")
    assert out[157] == (True, "/")
    assert out[1] == (False, "/src")

    # every URL gets exactly one decision (the default rule is total)
    urls = doc_urls(docs)
    dec = robots_admission(urls, demo_rules(urls))
    assert dec.count() == docs.count()


def test_tokenizer_fertility_matches_python_model(spark):
    """Per-lang fertility equals the python BPE model's aggregation;
    the division is ONE IEEE op on exact integer sums."""
    from ugfraud_spark.operators import bpe

    texts = [
        ("the there then them the the theory", "en"),
        ("the cat then the hat aaaa", "en"),
        ("this the that aaaa aaaa", "de"),
    ]
    docs = spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(texts)],
        "doc_id long, text string, lang string")
    per_doc = _bpe_python_encode([t for t, _ in texts], 6)
    want = {}
    for i, (_, lang) in enumerate(texts):
        d = want.setdefault(lang, [0, 0, 0])
        d[0] += 1
        d[1] += per_doc[i][0]
        d[2] += per_doc[i][1]
    got = {r["lang"]: r for r in
           bpe.tokenizer_fertility(docs, merges=6).collect()}
    assert set(got) == set(want)
    for lang, (nd, nw, nt) in want.items():
        r = got[lang]
        assert (r["n_docs"], r["n_words"], r["n_tokens"]) == (nd, nw, nt)
        assert r["fertility"] == nt / nw  # same single IEEE division


def test_skipgram_pairs_hand_replay(spark):
    """Window-3 forward pairs counted by a python model, raw-offset
    distances across empty slots, min_count filtering."""
    from collections import Counter

    from ugfraud_spark.operators.lmscore import skipgram_pairs

    texts = ["a b  a b", "b a b a b"]  # doubled space -> empty slot
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    want = Counter()
    for t in texts:
        ws = t.split(" ")
        for i, w1 in enumerate(ws):
            for d in range(1, 4):
                if i + d < len(ws) and w1 != "" and ws[i + d] != "":
                    want[(w1, ws[i + d])] += 1
    got = {(r["w1"], r["w2"]): r["n"]
           for r in skipgram_pairs(docs, window=3, min_count=1).collect()}
    assert got == dict(want)
    # 'a b  a b': (a,b) at d=1 twice + d=2 skips over the empty slot
    assert want[("a", "b")] >= 3
    # min_count filters to a deterministic subset
    got2 = {(r["w1"], r["w2"]): r["n"]
            for r in skipgram_pairs(docs, window=3, min_count=3).collect()}
    assert got2 == {k: v for k, v in want.items() if v >= 3}


def test_decayed_activity_exact_micro_units(spark):
    """Weights are exact powers of two in micro-units; horizon cuts to
    exactly 0; score is the single division."""
    import datetime as dt

    from ugfraud_spark.operators.funnel import decayed_activity

    ref = dt.datetime(2024, 1, 3, 12, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        (1, 10, ref),                      # age 0 -> 2^40
        (2, 10, ref - h),                  # age 1 -> 2^39
        (3, 10, ref - 40 * h),             # age 40 -> 1
        (4, 10, ref - 41 * h),             # age 41 -> 0
        (5, 10, ref - dt.timedelta(minutes=90)),  # age 1 (floor)
        (6, 20, ref - 2 * h),              # other user, age 2
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, "x", 0.0, "{}") for i, u, ts in rows],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string")
    out = {r["user_id"]: r for r in decayed_activity(ev).collect()}
    micro10 = 2**40 + 2**39 + 1 + 0 + 2**39
    assert out[10]["n_events"] == 5
    assert out[10]["score_micro"] == micro10
    assert out[10]["score"] == micro10 / float(2**40)
    assert out[20]["score_micro"] == 2**38


def test_importance_sample_replay_and_certainty(spark):
    """Keep set equals the python hash replay; a vertex with
    k·pr >= 1 is kept with certainty; seed changes the tail draw."""
    from ugfraud_spark.operators.mix import (
        SAMPLE_A, SAMPLE_B, SAMPLE_P, importance_sample)

    prs = [(1, 0.5), (2, 0.25), (3, 0.001), (4, 0.0004), (5, 0.0001),
           (6, 0.2486), (7, 0.00001)]
    ranked = spark.createDataFrame(prs, "id long, pagerank double")

    def replay(k, seed):
        keep = set()
        for v, pr in prs:
            h = ((v * SAMPLE_A + seed) % SAMPLE_P * SAMPLE_A
                 + SAMPLE_B) % SAMPLE_P
            if float(h) < k * pr * float(SAMPLE_P):
                keep.add(v)
        return keep

    for k, seed in [(3.0, 5), (3.0, 6), (2000.0, 5)]:
        got = {r["id"] for r in
               importance_sample(ranked, k, seed).collect()}
        assert got == replay(k, seed)
    # certainty region: k·pr = 3·0.5 > 1
    assert 1 in replay(3.0, 5)
    # k large enough -> everything kept
    assert replay(1e9, 5) == {v for v, _ in prs}


def test_host_churn_hand_replay(spark):
    """Counts and the single-division churn from a hand-built delta."""
    from ugfraud_spark.operators.crawl import host_churn

    delta = spark.createDataFrame(
        [(0, "added"), (37, "removed"), (74, "changed"),
         (111, "unchanged"), (148, "unchanged"),
         (1, "changed"), (38, "changed")],
        "doc_id long, status string")
    out = {r["host_id"]: r for r in host_churn(delta).collect()}
    h0 = out[0]
    assert (h0["n_added"], h0["n_removed"], h0["n_changed"],
            h0["n_unchanged"]) == (1, 1, 1, 2)
    assert h0["churn"] == 3 / 5
    h1 = out[1]
    assert h1["n_changed"] == 2 and h1["churn"] == 1.0


def test_session_entry_exit_hand_replay(spark):
    """Entry/exit picked by the tie-free (ts, event_id) order; bounce
    = 1-event session; gap splits sessions."""
    import datetime as dt

    from ugfraud_spark.streaming.events import session_entry_exit

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1 session A: view -> click -> buy
        (1, t0, 1, "view"), (2, t0 + m, 1, "click"), (3, t0 + 5 * m, 1, "buy"),
        # user 1 session B after the 30-min gap: a bounce
        (4, t0 + 60 * m, 1, "view"),
        # user 2: ts tie broken by event_id (5 before 6)
        (5, t0, 2, "click"), (6, t0, 2, "view"),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, et, 0.0, "{}") for i, ts, u, et in rows],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string")
    out = {(r["entry_type"], r["exit_type"]): r
           for r in session_entry_exit(ev).collect()}
    assert out[("view", "buy")]["n_sessions"] == 1
    assert out[("view", "buy")]["n_bounce"] == 0
    assert out[("view", "view")]["n_sessions"] == 1      # the bounce
    assert out[("view", "view")]["bounce_rate"] == 1.0
    assert out[("click", "view")]["n_sessions"] == 1     # tie-break
    assert set(out) == {("view", "buy"), ("view", "view"),
                        ("click", "view")}


def test_resolve_redirects_chains_and_cycles(spark):
    """Chain a->b->c resolves to c; 2-cycle d<->e stays unresolved;
    direct hop resolves; non-sources never emit rows."""
    from ugfraud_spark.operators.crawl import resolve_redirects

    docs = spark.createDataFrame(
        [(i, "t") for i in range(8)], "doc_id long, text string")
    red = spark.createDataFrame(
        [(0, 1), (1, 2),          # chain 0 -> 1 -> 2
         (3, 4), (4, 3),          # 2-cycle
         (5, 6)],                 # direct
        "src long, dst long")
    out = {r["id"]: (r["final_id"], r["resolved"])
           for r in resolve_redirects(docs, red).collect()}
    assert out[0] == (2, True)
    assert out[1] == (2, True)
    assert out[5] == (6, True)
    # cycle members land back on a redirect source -> unresolved
    assert out[3][1] is False and out[4][1] is False
    assert out[3][0] in (3, 4)
    assert set(out) == {0, 1, 3, 4, 5}

    # a chain of length 8 = 2^3 resolves exactly at 3 doublings
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long")
    docs9 = spark.createDataFrame(
        [(i, "t") for i in range(9)], "doc_id long, text string")
    out8 = {r["id"]: (r["final_id"], r["resolved"])
            for r in resolve_redirects(docs9, chain).collect()}
    assert out8[0] == (8, True)


def test_pagerank_residual_curve_properties(spark):
    """Residuals are positive and decreasing on a fixed graph, and
    iteration 1 equals the hand value on a 2-cycle."""
    from ugfraud_spark.operators.pagerank import residual_curve

    # 2-vertex cycle: pagerank is uniform at every iteration -> after
    # the first step the state is IDENTICAL to init (0.5, 0.5):
    # r1 = 0.15/2 + 0.85*0.5 = 0.5 exactly in IEEE
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    out = {r["iter"]: r["l1_residual"]
           for r in residual_curve(e, iters=2).collect()}
    assert out[1] == 0.0 and out[2] == 0.0

    # star 1 -> {2,3,4}: mass concentrates, residuals shrink
    e2 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 1), (3, 1), (4, 1)],
        "src long, dst long")
    out2 = [r["l1_residual"] for r in
            residual_curve(e2, iters=3).orderBy("iter").collect()]
    assert all(x >= 0 for x in out2)
    assert out2[0] > out2[1] > out2[2]


def test_user_gap_stats_hand_replay(spark):
    """Gaps floor to whole seconds; percentiles match numpy's linear
    interpolation; singleton-gap users included, 1-event users not."""
    import datetime as dt

    import numpy as np

    from ugfraud_spark.operators.funnel import user_gap_stats

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows, eid = [], 0
    # user 1: gaps 1, 2, 10 s (and a 1.9s gap flooring to 1)
    for off in [0, 1, 3, 13]:
        eid += 1
        rows.append((eid, t0 + off * s, 1))
    eid += 1
    rows.append((eid, t0 + dt.timedelta(seconds=14.9), 1))  # gap 1.9 -> 1
    # user 2: a single event -> no gaps -> no output row
    eid += 1
    rows.append((eid, t0, 2))
    ev = spark.createDataFrame(
        [(i, ts, u, "x", 0.0, "{}") for i, ts, u in rows],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string")
    out = {r["user_id"]: r for r in user_gap_stats(ev).collect()}
    assert set(out) == {1}
    gaps = [1, 2, 10, 1]
    assert out[1]["n_rows"] == 4
    assert out[1]["p50"] == round(float(np.percentile(gaps, 50)), 6)
    assert out[1]["p90"] == round(float(np.percentile(gaps, 90)), 6)


def test_vocab_drift_hand_replay(spark):
    """log_ratio replayed by hand; min_count on BOTH sides; the sign
    convention (positive = gained share in new)."""
    import math

    from ugfraud_spark.operators.crawl import vocab_drift

    old = spark.createDataFrame(
        [(1, "a a a a a b b b b b c")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(2, "a a a a a a a a a a b b b b b")], "doc_id long, text string")
    out = {r["term"]: r for r in
           vocab_drift(old, new, min_count=5).collect()}
    # c: only 1 in old -> filtered; a: 5->10 of 11->15 totals
    assert set(out) == {"a", "b"}
    assert (out["a"]["c_old"], out["a"]["c_new"]) == (5, 10)
    assert out["a"]["log_ratio"] == round(
        math.log((10.0 * 11) / (5.0 * 15)), 6)
    assert out["a"]["log_ratio"] > 0          # gained share
    assert out["b"]["log_ratio"] == round(
        math.log((5.0 * 11) / (5.0 * 15)), 6)
    assert out["b"]["log_ratio"] < 0          # lost share


def test_langid_agreement_hand_replay(spark):
    """Agreement counted against the deterministic argmax (ties ->
    lexicographically smallest lang)."""
    from ugfraud_spark.operators.quality import langid_agreement

    docs = spark.createDataFrame(
        [(1, "the query join", "en"),     # en markers -> agree
         (2, "der und gross", "de"),      # de markers -> agree
         (3, "der und gross", "en"),      # de markers, labeled en -> no
         (4, "xyz", "en")],               # all scores 0 -> tie -> 'de'
        "doc_id long, text string, lang string")
    out = {r["lang"]: r for r in langid_agreement(docs).collect()}
    assert (out["en"]["n_docs"], out["en"]["n_agree"]) == (3, 1)
    assert out["en"]["rate"] == 1 / 3
    assert (out["de"]["n_docs"], out["de"]["n_agree"]) == (1, 1)


def test_host_lang_entropy_hand_replay(spark):
    """Monolingual host -> 0; two-lang 50/50 -> ln 2; term order is the
    fixed literal order."""
    import math

    from ugfraud_spark.operators.quotient import host_lang_entropy

    docs = spark.createDataFrame(
        # host 0: 2 en -> entropy 0; host 1: en + de 50/50 -> ln 2
        [(0, "t", "en"), (37, "t", "en"),
         (1, "t", "en"), (38, "t", "de")],
        "doc_id long, text string, lang string")
    out = {r["host_id"]: r for r in host_lang_entropy(docs).collect()}
    assert out[0]["entropy"] == 0.0
    want = -(0.5 * math.log(0.5) + 0.5 * math.log(0.5))
    assert out[1]["entropy"] == round(want, 6)  # 6dp: LN ulp convention
    assert abs(out[1]["entropy"] - math.log(2)) < 1e-6


def test_minhash_calibration_estimator(spark):
    """Identical docs agree on all H positions (est 1.0 == exact 1.0);
    n_match is the per-position signature agreement count."""
    from ugfraud_spark.operators.dedup import (
        MINHASH_H, minhash_calibration, minhash_signatures)

    t = ("alpha beta gamma delta epsilon zeta eta theta iota "
         "kappa lambda mu")
    docs = spark.createDataFrame(
        [(1, t), (2, t),                              # exact dup
         (3, t + " extra tokens appended here now")],  # near dup
        "doc_id long, text string")
    out = {(r["doc_a"], r["doc_b"]): r
           for r in minhash_calibration(docs).collect()}
    assert (1, 2) in out
    r12 = out[(1, 2)]
    assert r12["n_match"] == MINHASH_H
    assert r12["est_jaccard"] == 1.0 and r12["jaccard"] == 1.0
    # the near-dup pair (if LSH surfaces it) must replay the signature
    # agreement count exactly
    sig = {r["doc_id"]: [r[f"mh{j}"] for j in range(MINHASH_H)]
           for r in minhash_signatures(docs).collect()}
    for (a, b), r in out.items():
        want = sum(x == y for x, y in zip(sig[a], sig[b]))
        assert r["n_match"] == want
        assert r["est_jaccard"] == round(want / float(MINHASH_H), 6)


def test_frontier_priority_composition(spark):
    """Frontier = allowed ∩ (added|changed), carrying the host churn."""
    from ugfraud_spark.operators.crawl import (
        crawl_delta_demo, frontier_priority_demo, host_churn)
    from ugfraud_spark.operators.robots import robots_admission_demo

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", f"src{i % 20}", 1) for i in range(120)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = {r["doc_id"]: r for r in frontier_priority_demo(docs).collect()}
    delta = {r["doc_id"]: r["status"]
             for r in crawl_delta_demo(docs).collect()}
    allowed = {r["doc_id"] for r in robots_admission_demo(docs).collect()
               if r["allowed"]}
    churn = {r["host_id"]: r["churn"]
             for r in host_churn(crawl_delta_demo(docs)).collect()}
    want = {d for d, s in delta.items()
            if s in ("added", "changed") and d in allowed}
    assert set(out) == want and len(want) > 0
    for d, r in out.items():
        assert r["status"] == delta[d]
        assert r["churn"] == churn[d % 37]


def test_retrieval_tau_hand_values(spark):
    """tau = 1 for identical order, -1 for reversed, hand value for a
    partial agreement; empty intersection yields the n<2 null row."""
    from ugfraud_spark.operators.lmscore import retrieval_tau

    def rk(pairs):
        return spark.createDataFrame(pairs, "doc_id long, r int")

    same = rk([(1, 1), (2, 2), (3, 3)])
    r = retrieval_tau(same, same).collect()[0]
    assert (r["n_common"], r["concordant"], r["discordant"]) == (3, 3, 0)
    assert r["tau"] == 1.0

    rev = rk([(1, 3), (2, 2), (3, 1)])
    r = retrieval_tau(same, rev).collect()[0]
    assert r["tau"] == -1.0 and r["discordant"] == 3

    # one swapped pair of three: 2 concordant, 1 discordant -> 1/3
    swap = rk([(1, 2), (2, 1), (3, 3)])
    r = retrieval_tau(same, swap).collect()[0]
    assert r["tau"] == (2 - 1) / 3

    # disjoint lists: n_common 0, tau null
    r = retrieval_tau(rk([(1, 1)]), rk([(2, 1)])).collect()[0]
    assert r["n_common"] == 0 and r["tau"] is None


def test_source_lm_profile_aggregation(spark):
    """Per-source mean equals the decimal-exact mean of the per-doc
    scores (replayed from lm_doc_scores)."""
    from collections import defaultdict
    from decimal import Decimal

    from ugfraud_spark.operators.lmscore import (
        lm_doc_scores, source_lm_profile)

    docs = spark.createDataFrame(
        [(1, "a b a b a", "s1"), (2, "a b c d e", "s1"),
         (3, "z z z z", "s2")],
        "doc_id long, text string, source string")
    per = {r["doc_id"]: r["avg_logprob"]
           for r in lm_doc_scores(docs.select("doc_id", "text")).collect()}
    by_src = defaultdict(list)
    for d, s in [(1, "s1"), (2, "s1"), (3, "s2")]:
        by_src[s].append(per[d])
    out = {r["source"]: r for r in source_lm_profile(docs).collect()}
    for s, vals in by_src.items():
        want = round(float(sum(Decimal(str(v)) for v in vals))
                     / len(vals), 6)
        assert out[s]["n_docs"] == len(vals)
        assert abs(out[s]["mean_logprob"] - want) < 1e-12


def test_quality_score_hand_replay(spark):
    """The composite replayed from its three signals; length term
    saturates at 200 tokens."""
    from ugfraud_spark.operators.quality import quality_score

    short = "the a an of to in is it"                      # 8 tokens
    longt = " ".join(f"w{i}" for i in range(250))          # 250 uniq
    docs = spark.createDataFrame(
        [(1, short), (2, longt)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_score(docs).collect()}

    def replay(text):
        ws = text.split(" ")
        n = len(ws)
        from ugfraud_spark.functions.text import STOPWORDS
        stop = sum(ws.count(w) for w in STOPWORDS)
        sr = round(stop / n, 6)
        dup = round(1 - len(set(ws)) / n, 6)
        import math
        raw = 0.4 * sr + 0.3 * (min(n, 200) / 200.0) + 0.3 * (1.0 - dup)
        return math.floor(raw * 1e6) / 1e6

    assert out[1]["quality_score"] == replay(short)
    assert out[2]["quality_score"] == replay(longt)
    assert out[2]["n_tokens"] == 250
    # saturation: the length term maxes at 0.3
    assert abs(out[2]["quality_score"] - (0.3 + 0.3)) < 1e-9


def test_host_dup_stats_hand_replay(spark):
    """Duplicates are non-canonical members of md5 groups; rate is the
    single division."""
    from ugfraud_spark.operators.crawl import host_dup_stats

    docs = spark.createDataFrame(
        [(0, "same"), (37, "same"), (74, "same"),   # host 0: 2 dups
         (1, "x"), (38, "y")],                      # host 1: none
        "doc_id long, text string")
    out = {r["host_id"]: r for r in host_dup_stats(docs).collect()}
    assert (out[0]["n_docs"], out[0]["n_dup"]) == (3, 2)
    assert out[0]["dup_rate"] == 2 / 3
    assert (out[1]["n_dup"], out[1]["dup_rate"]) == (0, 0.0)


def test_host_mirror_pairs_hand_replay(spark):
    """Shared-content counting, the min_shared cut, and the group cap
    dropping boilerplate served by every host."""
    from ugfraud_spark.operators.crawl import host_mirror_pairs

    rows = []
    # hosts 0 and 1 mirror two content groups (docs on both hosts)
    rows += [(0, "page A"), (1, "page A"), (37, "page B"), (38, "page B")]
    # hosts 0 and 2 share ONE group -> below min_shared, cut
    rows += [(74, "page C"), (2, "page C")]
    # boilerplate on hosts 0..4 -> capped out at max_group=3
    rows += [(111 + i, "footer") for i in range(5)]  # hosts 0,1,2,3,4
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["host_a"], r["host_b"]): r["n_shared"]
           for r in host_mirror_pairs(docs, max_group=3).collect()}
    assert out == {(0, 1): 2}

    # without the cap, the boilerplate group creates pair mass
    out2 = {(r["host_a"], r["host_b"]): r["n_shared"]
            for r in host_mirror_pairs(docs, max_group=64,
                                       min_shared=1).collect()}
    assert out2[(0, 1)] == 3  # A, B, footer
    assert out2[(3, 4)] == 1  # footer only


def test_dedup_training_pairs_labels(spark):
    """Positives are threshold-cleared candidate pairs; negatives are
    the hash replay minus candidates; no pair carries both labels."""
    from ugfraud_spark.operators.dedup import (
        PAIR_A, PAIR_B, PAIR_P, dedup_training_pairs,
        lsh_candidate_pairs, ngram_jaccard_pairs)

    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma")
    docs = spark.createDataFrame(
        [(i, base if i % 3 == 0 else f"{base} tail{i} t{i} u{i} v{i}")
         for i in range(12)],
        "doc_id long, text string")
    out = {(r["doc_a"], r["doc_b"]): r["label"]
           for r in dedup_training_pairs(docs, n_neg=30).collect()}

    pos = {(r["doc_a"], r["doc_b"])
           for r in ngram_jaccard_pairs(docs).collect()
           if r["jaccard"] >= 0.5}
    cand = {(r["doc_a"], r["doc_b"])
            for r in lsh_candidate_pairs(docs).collect()}

    def scr(x):
        return ((x * PAIR_A + PAIR_B) % PAIR_P * PAIR_A + PAIR_B) % PAIR_P

    neg = set()
    for i in range(30):
        a, b = scr(2 * i) % 12, scr(2 * i + 1) % 12
        a, b = min(a, b), max(a, b)
        if a != b and (a, b) not in cand:
            neg.add((a, b))
    want = {p: 1 for p in pos} | {p: 0 for p in neg}
    assert out == want
    assert set(pos) & neg == set()  # anti-join guarantees disjoint
    assert 1 in out.values() and 0 in out.values()


def test_containment_catches_short_inside_long(spark):
    """A short doc wholly embedded in a long one: containment must be
    1.0 while Jaccard is diluted below 0.5 — the asymmetric signal the
    operator exists for. Values re-checked against raw shingle sets."""
    short = " ".join(f"w{i}" for i in range(12))
    long_ = short + " " + " ".join(f"x{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, short), (4, "totally different words "
                                                 * 5)],
        "doc_id long, text string")
    cont = {(r["doc_a"], r["doc_b"]): r["containment"]
            for r in dedup.containment_pairs(docs).collect()}
    jacc = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(docs).collect()}
    assert cont[(1, 3)] == 1.0                      # exact dup
    if (1, 2) in cont:                              # LSH recalls by Jaccard;
        assert cont[(1, 2)] == 1.0                  # verify is exact when hit
        assert jacc[(1, 2)] < 0.5

    def sset(t):
        w = t.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    for (a, b), c in cont.items():
        ta = sset(docs.where(F.col("doc_id") == a).first()["text"])
        tb = sset(docs.where(F.col("doc_id") == b).first()["text"])
        assert abs(c - round(len(ta & tb) / min(len(ta), len(tb)), 6)) < 1e-9


def test_url_normalize_rules_and_idempotence(spark):
    """Hand-written messy urls: each canonicalization rule checked
    against the expected string, and normalize(normalize(u)) is a
    fixed point."""
    from ugfraud_spark.operators import crawl

    cases = [
        # fragment + default port + WWW + case + dot segments + utm
        ("HTTP://WWW.Ex.COM:80/a//b/./c.html?utm_x=1&b=2&a=1#frag",
         "http://ex.com/a/b/c.html?a=1&b=2"),
        # non-default port survives; trailing slash stripped
        ("https://Ex.com:8443/a/", "https://ex.com:8443/a"),
        # root path: trailing slash kept; empty path becomes /
        ("https://ex.com", "https://ex.com/"),
        ("http://ex.com/", "http://ex.com/"),
        # https default port stripped; only utm params -> no '?'
        ("https://ex.com:443/x.html?utm_a=1&utm_b=2",
         "https://ex.com/x.html"),
        # nested dot segments need the doubled replace
        ("http://ex.com/a/././b", "http://ex.com/a/b"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "doc_id long, url string")
    got = {r["url"]: r["url_norm"]
           for r in crawl.normalize_urls(df).collect()}
    for raw, want in cases:
        assert got[raw] == want, (raw, got[raw], want)
    # idempotence: re-normalizing the canonical forms changes nothing
    df2 = spark.createDataFrame(
        [(i, v) for i, v in enumerate(got.values())],
        "doc_id long, url string")
    again = {r["url"]: r["url_norm"]
             for r in crawl.normalize_urls(df2).collect()}
    assert all(k == v for k, v in again.items())


def test_url_normalize_demo_finds_aliases(spark, sf_small):
    """The synthetic corpus must contain genuine alias groups (distinct
    raw urls, one canonical form) — the structure the gate counts."""
    from ugfraud_spark.operators import crawl
    from ugfraud_spark.sources import tables

    out = crawl.url_normalize_demo(
        tables.load(spark, sf_small, "documents"))
    rows = out.collect()
    assert len(rows) == 500 and all(r["n_aliases"] >= 1 for r in rows)
    groups = {}
    for r in rows:
        groups.setdefault(r["url_norm"], set()).add(r["url"])
    multi = {k: v for k, v in groups.items() if len(v) > 1}
    assert multi, "no alias group planted"
    # within a group the RAW urls differ (that's the point of the op)
    assert all(len(v) > 1 for v in multi.values())
    # and n_aliases matches the group size exactly
    for r in rows:
        assert r["n_aliases"] == len(groups[r["url_norm"]])


def test_phrase_match_counts_adjacent_bigrams_only(spark):
    """Phrase = first bigram of doc 0 ('a b'): adjacent occurrences
    counted, reversed/"gapped" occurrences and zero-match docs excluded;
    overlapping runs ('a a a' vs query 'a a') count per-position."""
    from ugfraud_spark.operators.tfidf import phrase_match

    docs = spark.createDataFrame(
        [(0, "a b x a b"),        # query doc: 2 matches of "a b"
         (1, "b a b a"),          # 1 match (pos 1)
         (2, "a x b a"),          # gapped only -> excluded
         (3, "a a b"),            # 1 match
         (4, "x y z")],           # no query terms
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_matches"] for r in phrase_match(docs).collect()}
    assert got == {0: 2, 1: 1, 3: 1}

    # overlapping-run semantics: query "a a" over "a a a" = 2 positions
    docs2 = spark.createDataFrame(
        [(0, "a a"), (1, "a a a"), (2, "b b")], "doc_id long, text string")
    got2 = {r["doc_id"]: r["n_matches"] for r in phrase_match(docs2).collect()}
    assert got2 == {0: 1, 1: 2}


def test_anchor_text_topk_aggregates_inlink_titles(spark):
    """Anchor terms counted across ALL in-links per target; top-k cut
    on (n DESC, term ASC); pages whose sources have no document drop
    out (inner join)."""
    from ugfraud_spark.operators.crawl import anchor_text_topk

    # mod=10: doc i -> vertex i. Edges: 1->9, 2->9, 3->9, 4->8; vertex 7
    # links to 9 but has no doc (doc 17 would map there -- absent).
    edges = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (4, 8), (7, 9)], "src long, dst long")
    docs = spark.createDataFrame(
        [(1, "buy cheap pills now"), (2, "buy cheap watches"),
         (3, "review of pills here"), (4, "home page")],
        "doc_id long, text string")
    out = anchor_text_topk(edges, docs, mod=10, title_len=3, k=2)
    rows = {(r["dst"], r["rnk"]): (r["term"], r["n"]) for r in out.collect()}
    # dst 9 titles: [buy cheap pills] x2? no -- doc1+doc2 share buy/cheap,
    # doc3 contributes review/of. Counts: buy=2 cheap=2 pills=1 review=1 of=1
    assert rows[(9, 1)] == ("buy", 2)      # tie buy/cheap at 2 -> term ASC
    assert rows[(9, 2)] == ("cheap", 2)
    assert rows[(8, 1)] == ("home", 1)
    assert len([k for k in rows if k[0] == 9]) == 2   # k-cut applied


def test_mine_tracking_params_hand_case(spark):
    """neutral requires EVIDENCE (a multi-fetch group) and zero dirty
    groups; one hash disagreement poisons the param; no-evidence params
    stay non-neutral."""
    from ugfraud_spark.operators.crawl import mine_tracking_params

    fetches = spark.createDataFrame(
        [
            # s varies under fixed content -> clean multi-group for s
            ("http://x/p?id=1&s=a", "H1"),
            ("http://x/p?id=1&s=b", "H1"),
            # id varies and content follows it -> dirty group for id
            ("http://x/p?id=2&s=a", "H2"),
            # lone=7 appears once: no multi-group evidence
            ("http://y/q?id=3&lone=7", "H3"),
        ],
        "url string, h string")
    got = {r["param"]: r for r in mine_tracking_params(fetches).collect()}
    assert got["s"]["neutral"] is True
    assert got["s"]["n_multi"] == 1 and got["s"]["n_dirty"] == 0
    # id: group (http://x/p?s=a) holds fetches 1 and 3 with H1 vs H2
    assert got["id"]["neutral"] is False and got["id"]["n_dirty"] == 1
    assert got["lone"]["neutral"] is False and got["lone"]["n_multi"] == 0


def test_politeness_schedule_rounds_and_order(spark):
    """Rate-2 host: rounds go 1,1,2,2,3 down the priority order; a
    second host schedules independently; doc_id breaks score ties."""
    from ugfraud_spark.operators.crawl import politeness_schedule

    scored = spark.createDataFrame(
        [(10, 1, 0.9), (11, 1, 0.8), (12, 1, 0.8), (13, 1, 0.2),
         (14, 1, 0.1), (20, 2, 0.5)],
        "doc_id long, host_id long, score double")
    got = {r["doc_id"]: (r["rnk_in_host"], r["fetch_round"])
           for r in politeness_schedule(scored, rate=2).collect()}
    assert got[10] == (1, 1)
    assert got[11] == (2, 1)      # 0.8 tie -> doc_id ASC
    assert got[12] == (3, 2)
    assert got[13] == (4, 2)
    assert got[14] == (5, 3)
    assert got[20] == (1, 1)      # other host unaffected


def test_crawl_budget_hamilton_apportionment(spark):
    """floor quotas + largest-remainder top-up; equal fractions break
    by host ASC; Σalloc == total exactly."""
    from ugfraud_spark.operators.crawl import crawl_budget

    w = spark.createDataFrame([(0, 1.0), (1, 1.0), (2, 1.0)],
                              "host long, w double")
    got = {r["host"]: r["alloc"] for r in
           crawl_budget(w, total=10).collect()}
    assert got == {0: 4, 1: 3, 2: 3}     # 10/3: fracs equal -> host 0

    w2 = spark.createDataFrame([(0, 5.0), (1, 3.0), (2, 1.0), (3, 1.0)],
                               "host long, w double")
    got2 = {r["host"]: r["alloc"] for r in
            crawl_budget(w2, total=7).collect()}
    # quotas 3.5/2.1/0.7/0.7 -> base 3/2/0/0, R=2 -> hosts 2,3 (frac .7)
    assert got2 == {0: 3, 1: 2, 2: 1, 3: 1}
    assert sum(got2.values()) == 7


def test_pii_scrub_redacts_and_counts(spark):
    """Hand case: mixed doc (email + phone), email-only, clean doc;
    redaction replaces every occurrence and counts match; scrubbed
    text verified via its md5."""
    import hashlib

    from ugfraud_spark.operators.quality import pii_scrub

    docs = spark.createDataFrame(
        [(0, "mail a@b.com and c.d+x@e.org call +1-555-1234 end"),
         (1, "just a@b.co here"),
         (2, "no pii at all")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert (got[0]["n_emails"], got[0]["n_phones"]) == (2, 1)
    assert (got[1]["n_emails"], got[1]["n_phones"]) == (1, 0)
    assert (got[2]["n_emails"], got[2]["n_phones"]) == (0, 0)
    want0 = "mail <EMAIL> and <EMAIL> call <PHONE> end"
    assert got[0]["scrubbed_md5"] == hashlib.md5(want0.encode()).hexdigest()
    assert got[2]["scrubbed_md5"] == hashlib.md5(b"no pii at all").hexdigest()


def test_lsh_recall_measures_band_misses(spark):
    """Hand corpus: an identical pair (always a candidate) and a
    low-overlap pair that shares shingles but can only collide if a
    band agrees — recall counts exactly the threshold-crossing pairs
    LSH verified. At threshold 0 with shared shingles everywhere,
    n_true counts every overlapping pair."""
    from ugfraud_spark.operators.dedup import lsh_recall

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta"),
         (1, "alpha beta gamma delta epsilon zeta eta"),   # exact dup of 0
         (2, "alpha beta gamma nine ten eleven twelve"),   # weak overlap
         (3, "one two three four five six seven")],        # disjoint
        "doc_id long, text string")
    row = lsh_recall(docs, threshold=0.9).collect()[0]
    # only the exact dup crosses 0.9; identical docs share all bands
    assert (row["n_true"], row["n_lsh"], row["recall"]) == (1, 1, 1.0)

    row2 = lsh_recall(docs, threshold=0.01).collect()[0]
    # pairs (0,1), (0,2), (1,2) share shingles; (3,*) never appears
    assert row2["n_true"] == 3
    assert row2["n_lsh"] <= row2["n_true"]
    assert row2["recall"] == round(row2["n_lsh"] / 3, 6)


def test_recrawl_rate_policy_and_degenerate_ends(spark):
    """lambda = -ln(1-p)/epoch; monotone: faster-churning hosts get
    shorter revisit intervals; p=0 -> max cap with lambda 0-free NULL
    path untouched; p=1 -> min cap with NULL lambda."""
    import math

    from ugfraud_spark.operators.crawl import recrawl_rate

    hc = spark.createDataFrame(
        [(0, 0.0), (1, 0.1), (2, 0.5), (3, 1.0)],
        "host_id long, churn double")
    got = {r["host_id"]: r for r in recrawl_rate(hc).collect()}
    assert got[0]["revisit_days"] == 90.0 and got[0]["lambda_hat"] == 0.0
    assert got[3]["revisit_days"] == 1.0 and got[3]["lambda_hat"] is None
    lam1 = round(-math.log(0.9) / 7.0, 6)
    assert abs(got[1]["lambda_hat"] - lam1) < 1e-12
    assert got[1]["revisit_days"] == round(min(max(1 / lam1, 1.0), 90.0), 6)
    assert got[2]["revisit_days"] < got[1]["revisit_days"]


def test_repeated_spans_hand_corpus(spark):
    """Lee-style repeated-span scrub on a hand corpus: a 6-token
    phrase shared by two docs collapses to ONE merged span in each
    (its two duplicated 5-grams overlap); a within-doc repeat 6 apart
    stays TWO spans; a sub-L doc passes through byte-identical."""
    import hashlib

    phrase = "p1 p2 p3 p4 p5 p6"
    rows = [
        (1, "a b c d e f g h i j " + phrase),
        (2, "z y x " + phrase + " w v"),
        (3, "r1 r2 r3 r4 r5 q r1 r2 r3 r4 r5"),
        (4, "s t u"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.repeated_spans(docs).collect()}

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert out[1]["n_dup_spans"] == 1 and out[1]["tokens_removed"] == 6
    assert out[1]["scrubbed_md5"] == h("a b c d e f g h i j")
    assert out[2]["n_dup_spans"] == 1 and out[2]["tokens_removed"] == 6
    assert out[2]["scrubbed_md5"] == h("z y x w v")
    # starts 1 and 7: 7 > 1 + L(=5), so the islands do NOT fuse
    assert out[3]["n_dup_spans"] == 2 and out[3]["tokens_removed"] == 10
    assert out[3]["scrubbed_md5"] == h("q")
    assert out[4]["n_dup_spans"] == 0 and out[4]["tokens_removed"] == 0
    assert out[4]["scrubbed_md5"] == h("s t u")


def test_semdedup_keeps_lowest_centroid_similarity(spark):
    """SemDeDup hand case: three near-parallel vectors share a cluster
    (every pairwise cosine above tau); ONLY the member farthest from
    the cluster centroid (lowest cent_sim) survives — the paper's
    keep-for-diversity policy — while the lone member of the other
    cluster is untouched."""
    from ugfraud_spark.operators import kmeans

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [0.9, 0.1]),
        (4, [0.95, 0.05]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in
           kmeans.semdedup(emb, k=2, iters=1).collect()}

    assert {v: out[v]["cluster"] for v in (1, 3, 4)} == {1: 0, 3: 0, 4: 0}
    assert out[2]["cluster"] == 1 and out[2]["kept"] == 1
    # centroid of cluster 0 is (0.95, 0.05) ∝ v4, so v4 has cent_sim
    # 1.0 and v3 the smallest — v3 is the kept representative
    assert out[4]["cent_sim"] == 1.0
    assert out[3]["cent_sim"] < out[1]["cent_sim"] < out[4]["cent_sim"]
    assert out[3]["kept"] == 1
    assert out[1]["kept"] == 0 and out[4]["kept"] == 0


def test_dsir_weights_orders_by_target_likeness(spark):
    """DSIR hand corpus: target-language docs made of target-exclusive
    n-grams must out-weigh a mixed doc, which must out-weigh a doc of
    raw-only n-grams; selection keeps exactly the top keep_n."""
    rows = [
        (1, "good good good", "en"),
        (2, "good good good", "en"),
        (3, "bad bad bad", "xx"),
        (4, "good bad bad", "xx"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in mix.dsir_weights(docs, keep_n=2).collect()}

    assert out[1]["n_feats"] == 5  # 3 unigrams + 2 bigrams
    assert out[1]["log_w"] == out[2]["log_w"]
    assert out[1]["log_w"] > out[4]["log_w"] > out[3]["log_w"]
    assert {d for d in out if out[d]["selected"] == 1} == {1, 2}


def test_capture_recapture_content_universe(spark):
    """Lincoln-Petersen over a corpus with planted exact duplicates:
    the universe is DISTINCT content (400, not the 500 rows), both
    captures land near the 30% rate, and N̂ equals the closed form on
    the realized capture counts."""
    from ugfraud_spark.operators import sketch

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), (F.col("id") % 400).cast("string"))
        .alias("text"))
    r = sketch.capture_recapture(docs).collect()[0]
    assert r["n_true"] == 400
    assert 0 < r["n_both"] < min(r["n_a"], r["n_b"])
    assert r["n_hat"] == round(r["n_a"] * r["n_b"] / r["n_both"], 6)
    assert r["rel_err"] == round(abs(r["n_hat"] - 400) / 400, 6)
    # a 30% double capture on 400 units concentrates well inside
    # these bounds (the planted corpus is fixed, so this is exact)
    assert 80 <= r["n_a"] <= 160 and 80 <= r["n_b"] <= 160


def test_hll_registers_vs_python_replication(spark):
    """Explicit-register HLL on a planted 1000-key universe: the
    estimate equals an independent python replication of the same
    md5/bucket/rho/correction pipeline bit for bit; a 3-key universe
    takes the linear-counting branch and lands near-exact."""
    import hashlib
    import math

    from ugfraud_spark.operators import sketch

    keys = spark.range(1000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"))
    r = sketch.hll_distinct(keys, "key").collect()[0]

    m = sketch.HLL_M
    regs = [0] * m
    for i in range(1000):
        h = int(hashlib.md5(f"k{i}".encode()).hexdigest()[:8], 16)
        b, w = h % m, h // m
        rho = 27 if w == 0 else 27 - len(bin(w)) + 2  # len('0b') offset
        regs[b] = max(regs[b], rho)
    ssum = sum(1.0 / (1 << g) for g in regs)
    v = regs.count(0)
    raw = sketch.HLL_ALPHA * m * m / ssum
    exp = round(m * math.log(m / v), 6) if (raw <= 2.5 * m and v > 0) \
        else round(raw, 6)
    assert r["n_true"] == 1000 and r["v_zero"] == v
    assert r["est"] == pytest.approx(exp, abs=2e-6)

    tiny = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "key string")
    t = sketch.hll_distinct(tiny, "key").collect()[0]
    assert t["v_zero"] >= 61  # linear-counting branch engaged
    assert abs(t["est"] - 3) < 0.2


def test_mojibake_scrub_hand_cases(spark):
    """Repair map hand check: multi-occurrence repair, repair-count
    exactness, byte-identity of the fixed text, and clean text passing
    through untouched."""
    import hashlib

    from ugfraud_spark.operators import quality

    rows = [
        (1, "cafÃ© cafÃ© donâ€™t"),
        (2, "plain ascii text"),
        (3, "naÃ¨ve Ã¼ber â€œquoteâ€™"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality.mojibake_scrub(docs).collect()}

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert out[1]["n_fixed"] == 3
    assert out[1]["fixed_md5"] == h("café café don’t")
    assert out[2]["n_fixed"] == 0
    assert out[2]["fixed_md5"] == h("plain ascii text")
    assert out[3]["n_fixed"] == 4
    assert out[3]["fixed_md5"] == h("naève über “quote’")


def test_doc_novelty_hand_corpus(spark):
    """Novelty attribution: the first doc owns all its grams, an exact
    copy later owns none, a half-overlap doc gets exactly the novel
    half; within-doc repeats count once (distinct grams)."""
    rows = [
        (1, "a b c d e"),        # grams: abc bcd cde — all novel
        (2, "a b c d e"),        # exact copy: 0 novel
        (3, "c d e f g h"),      # cde(old) def efg fgh -> 3/4 novel
        (4, "a b c a b c"),      # abc(old) bca cab + dup abc -> 2/4
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.doc_novelty(docs).collect()}
    assert (out[1]["n_grams"], out[1]["n_novel"]) == (3, 3)
    assert out[1]["novelty"] == 1.0
    assert (out[2]["n_grams"], out[2]["n_novel"]) == (3, 0)
    assert (out[3]["n_grams"], out[3]["n_novel"]) == (4, 3)
    assert out[3]["novelty"] == 0.75
    # doc 4: distinct grams {abc, bca, cab} (the repeated abc
    # collapses), abc already owned by doc 1 -> 2 of 3 novel
    assert (out[4]["n_grams"], out[4]["n_novel"]) == (3, 2)


def test_weighted_sample_vs_python(spark):
    """ES sample replicated in python hash-for-hash: same keys, same
    exact-k cut; heavier docs are sampled at a visibly higher rate
    (the weighted-without-replacement property the Poisson sampler
    cannot give at fixed k)."""
    import hashlib
    import math

    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.lit("t").alias("text"),
        # two weight strata: heavy (1000) for ids < 100, light (10)
        F.when(F.col("id") < 100, 1000).otherwise(10).alias("n_chars"))
    out = {r["doc_id"]: r for r in mix.weighted_sample(docs).collect()}

    keys = {}
    for i in range(400):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (h + 1) / float(1 << 32)
        w = 1000 if i < 100 else 10
        keys[i] = round(math.log(u) / w, 6)
    topk = sorted(keys, key=lambda i: (-keys[i], i))[:100]
    for i in range(400):
        assert out[i]["key"] == pytest.approx(keys[i], abs=2e-6)
        assert out[i]["sampled"] == (1 if i in set(topk) else 0)
    heavy = sum(1 for i in topk if i < 100)
    assert heavy >= 60  # heavy stratum dominates the fixed-k sample


def test_quantile_transform_midrank(spark):
    """Midrank CDF on a known multiset {1,1,2,3}: ties share one
    value, ends stay strictly inside (0,1), and the map is monotone."""
    from ugfraud_spark.operators import features

    docs = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2), (4, 3)], "doc_id long, n_chars long")
    out = {r["doc_id"]: r["cdf"]
           for r in features.quantile_transform(docs).collect()}
    assert out[1] == out[2] == 0.25     # (0 + 0.5*2)/4
    assert out[3] == 0.625              # (2 + 0.5)/4
    assert out[4] == 0.875              # (3 + 0.5)/4
