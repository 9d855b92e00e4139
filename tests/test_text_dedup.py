"""Text analysis + dedup + similarity kernels and their pipelines."""

import numpy as np
import pyarrow as pa
import pytest

from polylabel_rs_ray.functions.dedup import (
    MinHasher,
    band_hashes,
    hamming64,
    jaccard,
    minhash_signature,
    shingles,
    simhash64,
)
from polylabel_rs_ray.functions.text import (
    fingerprint_one,
    lang_id_one,
    quality_batch,
    token_counts_batch,
)

SF = "/root/testdata/sf0.001"


def test_lang_id_heuristic():
    assert lang_id_one("the cat and the dog sat in the house") == "en"
    assert lang_id_one("le chat et le chien est dans la maison") == "fr"
    assert lang_id_one("der Hund und die Katze ist nicht hier") == "de"
    assert lang_id_one("你好世界 这是一个测试 谢谢") == "zh"
    assert lang_id_one("") == "und"


def test_quality_batch():
    t = quality_batch(pa.array(["The cat, the hat!", ""]))
    row = t.to_pylist()[0]
    assert row["n_tokens"] == 4
    assert row["punct_count"] == 2
    assert row["stopword_hits"] == 2  # 'the' twice ('the' in 'The'->'the')
    assert t.to_pylist()[1]["n_tokens"] == 0


def test_token_counts():
    t = token_counts_batch(pa.array(["hello world 123 foo-bar!"]))
    row = t.to_pylist()[0]
    assert row["n_ws_tokens"] == 4
    assert row["n_bpe_tokens"] == 7  # hello world 123 foo - bar !


def test_fingerprint_stability():
    assert fingerprint_one("abc") == fingerprint_one("abc")
    assert fingerprint_one("abc") != fingerprint_one("acb")  # order-sensitive
    assert 0 <= fingerprint_one("x" * 1000) < (1 << 61) - 1


def test_minhash_jaccard_approximation():
    mh = MinHasher()
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = a.replace("lazy", "sleepy")
    sa, sb = shingles(a), shingles(b)
    true_j = jaccard(sa, sb)
    siga, sigb = mh.signature(a), mh.signature(b)
    est = (siga == sigb).mean()
    assert abs(est - true_j) < 0.25
    # identical docs share every band; distinct docs share none (w.h.p.)
    assert (band_hashes(siga) == band_hashes(mh.signature(a))).all()
    other = mh.signature("completely different words everywhere entirely unrelated")
    assert not (band_hashes(siga) == band_hashes(other)).any()


def test_simhash_near_dup_close():
    a = "the quick brown fox jumps over the lazy dog " * 3
    b = a.replace("dog", "cat")
    c = "totally unrelated content about databases and query engines"
    assert hamming64(simhash64(a), simhash64(b)) < hamming64(simhash64(a), simhash64(c))
    assert simhash64(a) == simhash64(a)
    assert simhash64(a) >= 0  # int64-safe


def test_minhash_pipeline_finds_planted_dups(ray_session):
    import pyarrow.parquet as pq

    from polylabel_rs_ray.pipelines.queries import (
        DUP_EVERY,
        DUP_OFFSET,
        mutate_text,
        q_minhash_near_dup,
    )

    df = q_minhash_near_dup(SF).to_pandas()
    got = set(zip(df.doc_a, df.doc_b))

    # ground truth: planted pairs whose true word-3-gram Jaccard clears the
    # verification threshold (short docs legitimately fall below it)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pylist()
    above = set()
    for r in docs:
        i = int(r["doc_id"])
        if i % DUP_EVERY:
            continue
        j = jaccard(shingles(r["text"]), shingles(mutate_text(r["text"], i)))
        if j >= 0.55:
            above.add((i, i + DUP_OFFSET))
    assert above, "no plantable pairs?"
    recall = len(above & got) / len(above)
    assert recall == 1.0, f"above-threshold planted recall {recall}"
    # nothing below the verify threshold leaks through
    assert (df.jaccard_pct >= 50).all()


def test_embedding_near_dup_pipeline(ray_session):
    from polylabel_rs_ray.pipelines.queries import DUP_EVERY, DUP_OFFSET, q_embedding_near_dup

    df = q_embedding_near_dup(SF).to_pandas()
    planted = {(a, a + DUP_OFFSET) for a in range(0, 500, DUP_EVERY)}
    got = set(zip(df.vec_a, df.vec_b))
    assert planted <= got


def test_ann_vs_ivf_recall(ray_session):
    from polylabel_rs_ray.pipelines.queries import q_ann_topk, q_ivf_topk

    exact = q_ann_topk(SF).to_pandas()
    approx = q_ivf_topk(SF).to_pandas()
    # per query, rank-1 must agree (the query vector itself); overall
    # recall of the approximate index stays high on this data
    for qid in exact.query_id.unique():
        e1 = exact[(exact.query_id == qid) & (exact["rank"] == 1)].vec_id.iloc[0]
        a1 = approx[(approx.query_id == qid) & (approx["rank"] == 1)].vec_id.iloc[0]
        assert e1 == a1 == qid
    eset = set(zip(exact.query_id, exact.vec_id))
    aset = set(zip(approx.query_id, approx.vec_id))
    assert len(eset & aset) / len(eset) >= 0.6


def test_media_pipeline(ray_session):
    from polylabel_rs_ray.stages.media import MEDIA_FEATURE_DIM, MediaFeaturizer, media_pipeline

    df = media_pipeline(SF).to_pandas()
    assert (df.kind != "text").all()
    assert df.features.map(len).eq(MEDIA_FEATURE_DIM).all()
    # deterministic features
    f = MediaFeaturizer()
    t = pa.table({"media_ref": pa.array(["media://1/0"]), "kind": pa.array(["image"])})
    a = f(t).column("features").to_pylist()[0]
    b = f(t).column("features").to_pylist()[0]
    assert a == b
    # decode="real" genuinely decodes (PPM via the synthetic content store)
    real = MediaFeaturizer(decode="real")._featurize("media://1/0", "image")
    assert real[0] == 1.0 and 0 < real[1] <= 1 and 0 < real[2] <= 1

def test_frame_sampler_pipeline(ray_session):
    from polylabel_rs_ray.stages.media import FrameSampler, frame_pipeline, explode_media_spans
    from polylabel_rs_ray.sources.docs import read_docs
    from polylabel_rs_ray.pipelines.queries import q_video_frame_stats

    frames = frame_pipeline(SF, n_frames=3).to_pandas()
    # one row per (video span, frame); payloads are resized RGB bytes
    media = read_docs(SF).map_batches(
        explode_media_spans, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    n_videos = (media.kind == "video").sum()
    assert len(frames) == 3 * n_videos > 0
    assert frames.frame.map(len).eq(32 * 18 * 3).all()
    assert frames.frame_idx.between(0, 2).all()
    # deterministic payloads
    fs = FrameSampler(n_frames=1)
    assert fs._frame("media://1/0", 0) == fs._frame("media://1/0", 0)
    assert fs._frame("media://1/0", 0) != fs._frame("media://1/0", 1)
    # decode="real" parses an actual Y4M stream from the content store
    payloads, src, total = FrameSampler(decode="real")._sample_real("media://1/2")
    assert len(payloads) == 4 and len(src) == 4 and total >= 2
    assert all(len(p) == 32 * 18 * 3 for p in payloads)
    # the registered rows-only query aggregates per doc
    stats = q_video_frame_stats(SF).to_pandas()
    assert stats.n_frames.sum() == 4 * n_videos  # default n_frames=4
    assert (stats.total_bytes == stats.n_frames * 32 * 18 * 3).all()


def test_minhash_partitioned_equals_single_task(ray_session):
    """The bucket-hash-partitioned candidate/verify path must produce the
    exact pair set of the 1-partition path (global dedup via pass-B key)."""
    from polylabel_rs_ray.pipelines.queries import q_minhash_near_dup

    df1 = q_minhash_near_dup(SF, n_parts=1, verify_mode="partitioned").to_pandas()
    df8 = q_minhash_near_dup(SF, n_parts=8, verify_mode="partitioned").to_pandas()
    s1 = set(zip(df1.doc_a, df1.doc_b, df1.jaccard_pct))
    s8 = set(zip(df8.doc_a, df8.doc_b, df8.jaccard_pct))
    assert s1 == s8 and len(s1) > 0


def test_minhash_verify_modes_agree(ray_session):
    """The corpus-size-gated broadcast verify (small-corpus fast path, zero
    extra shuffles) must produce the exact pair set of the fully
    distributed co-partitioned verify."""
    from polylabel_rs_ray.pipelines.queries import q_minhash_near_dup

    bc = q_minhash_near_dup(SF, verify_mode="broadcast").to_pandas()
    pt = q_minhash_near_dup(SF, verify_mode="partitioned").to_pandas()
    sb = set(zip(bc.doc_a, bc.doc_b, bc.jaccard_pct))
    sp = set(zip(pt.doc_a, pt.doc_b, pt.jaccard_pct))
    assert sb == sp and len(sb) > 0
    # each pair exactly once in BOTH modes (the broadcast path dedupes the
    # multi-band candidate duplicates before verification)
    assert len(bc) == len(sb) and len(pt) == len(sp)

def test_banded_bucketing_candidate_growth():
    """AND/OR banding with size-scaled planes: candidate pair count grows
    ~linearly with n (10x rows -> well under the ~100x a fixed flat code
    would produce from O(n^2/buckets) random collisions)."""
    from polylabel_rs_ray.pipelines.queries import EMB_BANDS, emb_planes_for

    rng = np.random.default_rng(7)

    def cand_pairs(n):
        m = rng.standard_normal((n, 64))
        R = emb_planes_for(n)
        planes = np.random.default_rng(123).standard_normal((EMB_BANDS * R, 64))
        signs = (m @ planes.T) > 0
        w = np.int64(1) << np.arange(R, dtype=np.int64)
        tot = 0
        for b in range(EMB_BANDS):
            bucket = signs[:, b * R : (b + 1) * R] @ w
            _, cnt = np.unique(bucket, return_counts=True)
            tot += int((cnt * (cnt - 1) // 2).sum())
        return tot

    c_small, c_big = cand_pairs(2000), cand_pairs(20000)
    assert c_big <= max(30 * max(c_small, 1), 400), (c_small, c_big)

def test_dedup_clusters_match_union_find(ray_session):
    """Distributed min-label propagation == driver-side union-find over the
    same verified pair set (component rep = min doc_id)."""
    import collections

    from polylabel_rs_ray.pipelines.queries import q_dedup_clusters, q_minhash_near_dup

    df = q_dedup_clusters(SF).to_pandas()
    pairs = q_minhash_near_dup(SF).to_pandas()
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.doc_a, pairs.doc_b):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = collections.defaultdict(list)
    for n in parent:
        comp[find(n)].append(n)
    ref = {n: min(members) for members in comp.values() for n in members}
    got = dict(zip(df.doc_id, df.cluster_id))
    assert got == ref and len(got) > 0

def test_split_and_packing_match_duckdb(ray_session):
    """Hash train/test split and distributed prefix-sum token packing ==
    their SQL window/md5 oracles."""
    import duckdb

    from polylabel_rs_ray.pipelines.queries import (
        SQL_TOKEN_PACKING,
        SQL_TRAIN_TEST_SPLIT,
        q_token_packing,
        q_train_test_split,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    for q, sql in [
        (q_train_test_split, SQL_TRAIN_TEST_SPLIT),
        (q_token_packing, SQL_TOKEN_PACKING),
    ]:
        d = q(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        o = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
        assert len(d) > 0 and d.equals(o[list(d.columns)].astype(d.dtypes.to_dict()))

def test_top_bigrams_match_duckdb(ray_session):
    import duckdb

    from polylabel_rs_ray.pipelines.queries import SQL_TOP_BIGRAMS, q_top_bigrams

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    d = q_top_bigrams(SF).to_pandas().reset_index(drop=True)
    o = con.execute(SQL_TOP_BIGRAMS).df()[list(d.columns)].astype(d.dtypes.to_dict())
    assert len(d) == 20 and d.equals(o)

def test_bloom_no_false_negatives():
    from polylabel_rs_ray.functions.bloom import (
        bloom_contains,
        bloom_size_bits,
        _hash_pair,
        _set_bits,
    )

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 1 << 60, 50_000).astype(np.int64)
    m = bloom_size_bits(len(keys))
    bits = np.zeros(m // 64, dtype=np.uint64)
    for idx in _hash_pair(keys.astype(np.uint64), m):
        _set_bits(bits, idx)
    assert bloom_contains(bits, keys).all()  # never a false negative
    other = rng.integers(1 << 61, 1 << 62, 50_000).astype(np.int64)
    fp = bloom_contains(bits, other).mean()
    assert fp < 0.02, fp

def test_minhash_bloom_path_equals_unfiltered(ray_session):
    from polylabel_rs_ray.pipelines.queries import q_minhash_near_dup

    a = q_minhash_near_dup(SF, use_bloom=False, verify_mode="partitioned").to_pandas()
    b = q_minhash_near_dup(SF, use_bloom=True, verify_mode="partitioned").to_pandas()
    sa = set(zip(a.doc_a, a.doc_b, a.jaccard_pct))
    sb = set(zip(b.doc_a, b.doc_b, b.jaccard_pct))
    assert sa == sb and len(sa) > 0

def test_ivf_exact_matches_bruteforce_integer_topk(ray_session):
    """The exact-IVF triangle-bound cell pruning is lossless: the pipeline
    equals an independent numpy brute-force integer-ADC top-k (no engine
    kernels in the expected side)."""
    import pyarrow.parquet as pq

    from polylabel_rs_ray.pipelines.queries import IVF_K, IVF_N_QUERIES, q_ivf_topk

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    mn, mx = emb.min(0), emb.max(0)
    span = np.where(mx > mn, mx - mn, 1.0)
    codes = np.clip(np.floor(((emb - mn) * 255.0) / span), 0, 255).astype(np.int64)
    ids = t.column("vec_id").to_numpy().astype(np.int64)

    got = q_ivf_topk(SF).to_pandas()
    for qi in range(IVF_N_QUERIES):
        d2 = ((codes - codes[qi]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))[:IVF_K]
        sub = got[got.query_id == ids[qi]].sort_values("rank")
        assert list(sub.vec_id) == list(ids[order])
        assert list(sub.d2) == [int(d2[o]) for o in order]


def test_jaccard_exact_gate_delegates_to_minhash(ray_session, monkeypatch, caplog):
    """Past the vocabulary-derived corpus bound the exact PPJoin delegates
    to the value-equal banded-LSH path (quadratic candidate volume once the
    trigram vocabulary saturates — VERDICT r4 finding #1); force_exact=True
    overrides the gate and runs the deterministic-complete join."""
    import logging

    from polylabel_rs_ray.pipelines import queries_ext36 as m
    from polylabel_rs_ray.pipelines.queries import q_minhash_near_dup

    # shrink the gate below this corpus so the delegation branch fires
    monkeypatch.setattr(m, "JACCARD_EXACT_MAX_DOCS", 10)
    with caplog.at_level(logging.WARNING, logger=m.__name__):
        gated = m.q_jaccard_join_exact(SF).to_pandas()
    assert any("delegating" in r.message for r in caplog.records)
    lsh = q_minhash_near_dup(SF).to_pandas()
    key = lambda df: sorted(zip(df.doc_a, df.doc_b, df.jaccard_pct))
    assert key(gated) == key(lsh) and len(gated) > 0

    # the override keeps the exact path available (and value-equal) even
    # past the gate — no delegation log this time
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger=m.__name__):
        forced = m.q_jaccard_join_exact(SF, force_exact=True).to_pandas()
    assert not any("delegating" in r.message for r in caplog.records)
    assert key(forced) == key(lsh)
