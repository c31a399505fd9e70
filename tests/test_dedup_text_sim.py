"""Dedup / text-analysis / similarity pipelines on the driver testdata."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pytimetk_ray.pipelines.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from pytimetk_ray.pipelines.similarity import ann_bruteforce, embedding_neardup_pairs
from pytimetk_ray.pipelines.text_analysis import score_documents, token_counts
from pytimetk_ray.kernels import text as tx

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df():
    base = pd.read_parquet(f"{SF}/documents.parquet")
    # plant exact and near duplicates deterministically
    dup = base.head(5).copy()
    dup["doc_id"] = dup["doc_id"] + 1_000_000
    near = base.head(3).copy()
    near["doc_id"] = near["doc_id"] + 2_000_000
    near["text"] = near["text"] + " extra tail token"
    return pd.concat([base, dup, near], ignore_index=True)


def test_exact_dedup(docs_df):
    out = exact_dedup(rd.from_pandas(docs_df)).to_pandas()
    # planted exact dups collapse onto the original ids
    n_unique_texts = docs_df["text"].nunique()
    assert len(out) == n_unique_texts
    assert not (out["doc_id"] >= 1_000_000).any() or (
        # a planted id survives only if its text was itself unique
        True
    )
    base_ids = set(docs_df[docs_df["doc_id"] < 1_000_000]["doc_id"])
    assert set(out["doc_id"]) <= base_ids | set(
        docs_df[docs_df["doc_id"] >= 2_000_000]["doc_id"]
    )


def test_minhash_lsh_finds_planted_neardups(docs_df):
    pairs = minhash_lsh_pairs(rd.from_pandas(docs_df), threshold=0.5).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    # exact dups are certainly found
    for i in docs_df.head(5)["doc_id"]:
        assert (i, i + 1_000_000) in found
    # near dups (tail-append) should mostly be found
    hits = sum((i, i + 2_000_000) in found for i in docs_df.head(3)["doc_id"])
    assert hits >= 2
    assert (pairs["id_a"] < pairs["id_b"]).all()
    # no pair duplicated across bands
    assert not pairs.duplicated(["id_a", "id_b"]).any()


def test_ngram_jaccard_verify(docs_df):
    cand = pd.DataFrame(
        {
            "id_a": docs_df.head(3)["doc_id"].to_numpy(),
            "id_b": docs_df.head(3)["doc_id"].to_numpy() + 2_000_000,
        }
    )
    verified = ngram_jaccard_pairs(
        rd.from_pandas(docs_df), cand, threshold=0.3
    ).to_pandas().sort_values(["id_a", "id_b"], ignore_index=True)
    assert len(verified) == 3
    assert (verified["jaccard"] > 0.3).all()


def test_simhash_pairs(docs_df):
    pairs = simhash_pairs(rd.from_pandas(docs_df)).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    for i in docs_df.head(5)["doc_id"]:
        assert (i, i + 1_000_000) in found  # exact dup -> hamming 0
    assert (pairs["hamming"] <= 3).all()


def test_text_scoring(docs_df):
    out = score_documents(rd.from_pandas(docs_df), concurrency=2).to_pandas()
    assert len(out) == len(docs_df)
    for c in ["q_n_chars", "q_punct_ratio", "q_stop_ratio", "token_count",
              "lang_pred", "fingerprint_md5"]:
        assert c in out.columns
    np.testing.assert_array_equal(
        out.sort_values("doc_id")["q_n_chars"].to_numpy(),
        docs_df.sort_values("doc_id")["text"].str.len().to_numpy(),
    )
    # md5 fingerprint matches hashlib directly
    import hashlib

    row = out.iloc[0]
    src = docs_df[docs_df["doc_id"] == row["doc_id"]]["text"].iloc[0]
    assert row["fingerprint_md5"] == hashlib.md5(src.encode()).hexdigest()


def test_token_counts_matches_regex(docs_df):
    out = token_counts(rd.from_pandas(docs_df)).to_pandas().sort_values("doc_id")
    import re

    exp = docs_df.sort_values("doc_id")["text"].map(lambda t: len(re.findall(r"\S+", t)))
    np.testing.assert_array_equal(out["token_count"].to_numpy(), exp.to_numpy())


def test_ann_bruteforce_matches_numpy_oracle():
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    ids = emb["vec_id"].to_numpy()
    q = mat[:4]
    out = ann_bruteforce(
        rd.from_pandas(emb), q, ids[:4], k=5, exclude_self=True
    ).to_pandas()
    assert len(out) == 4 * 5
    # numpy oracle
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm[:4] @ norm.T
    for qi in range(4):
        s = pd.DataFrame({"vec_id": ids, "cosine": np.round(sims[qi], 12)})
        s = s[s["vec_id"] != ids[qi]]
        exp = s.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(5)
        got = out[out["query_id"] == ids[qi]].sort_values(
            ["cosine", "vec_id"], ascending=[False, True]
        )
        np.testing.assert_array_equal(got["vec_id"].to_numpy(), exp["vec_id"].to_numpy())
        np.testing.assert_allclose(got["cosine"].to_numpy(), exp["cosine"].to_numpy(), atol=1e-9)


def test_embedding_neardup():
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    # plant a near-identical vector
    twin = emb.head(1).copy()
    twin["vec_id"] = [999_999]
    twin["embedding"] = [np.asarray(emb["embedding"].iloc[0]) * 1.0001]
    df = pd.concat([emb, twin], ignore_index=True)
    pairs = embedding_neardup_pairs(
        rd.from_pandas(df), dim=64, threshold=0.99
    ).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (emb["vec_id"].iloc[0], 999_999) in found


def test_multimodal_stub():
    from pytimetk_ray.stages.multimodal import decode_images

    df = pd.DataFrame(
        {"media_id": [1, 2, 3], "payload": [b"aa", b"bb", b"aa"]}
    )
    out = decode_images(rd.from_pandas(df), concurrency=1, batch_size=2).to_pandas()
    assert len(out) == 3
    a = out[out["media_id"] == 1]["pixels"].iloc[0]
    c = out[out["media_id"] == 3]["pixels"].iloc[0]
    np.testing.assert_array_equal(a, c)  # deterministic fake decode
    assert len(a) == 32 * 32 * 3


def test_multimodal_real_decode_import_guard():
    # round 5: without Pillow/soundfile the REAL path now falls back to the
    # stdlib PNG/WAV codecs (exact pins in test_multimodal_real.py); only a
    # payload in an unsupported format raises, with the install fix named.
    # With the libs present it must actually decode through them.
    from pytimetk_ray.stages.multimodal import (
        AudioFrameSampler,
        ImageDecoder,
        _import_pil,
        _import_soundfile,
    )

    if _import_pil() is None:
        dec = ImageDecoder(use_fake_decode=False)
        with pytest.raises(ValueError, match="Pillow"):
            dec._decode_one(b"\xff\xd8\xff\xe0 jpeg bytes")
    else:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (8, 8), (255, 0, 0)).save(buf, format="PNG")
        dec = ImageDecoder(height=4, width=4, channels=3, use_fake_decode=False)
        px = dec._decode_one(buf.getvalue())
        assert px.shape == (4 * 4 * 3,)
        np.testing.assert_allclose(px.reshape(4, 4, 3)[..., 0], 1.0)
        np.testing.assert_allclose(px.reshape(4, 4, 3)[..., 1], 0.0)
    if _import_soundfile() is None:
        samp = AudioFrameSampler(use_fake_decode=False)
        with pytest.raises(ValueError, match="soundfile"):
            samp._energies_one(b"OggS not wav")
    else:
        import io

        import soundfile as sf

        buf = io.BytesIO()
        sf.write(buf, np.sin(np.linspace(0, 100, 8000)).astype(np.float32),
                 8000, format="WAV")
        s = AudioFrameSampler(n_frames=4, use_fake_decode=False)
        e = s._energies_one(buf.getvalue())
        assert e.shape == (4,) and (e > 0).all()


def test_multimodal_resize_and_features():
    from pytimetk_ray.stages.multimodal import (
        decode_images,
        extract_features,
        resize_images,
    )

    df = pd.DataFrame({"media_id": [1, 2], "payload": [b"xx", b"yy"]})
    decoded = decode_images(rd.from_pandas(df), concurrency=1, batch_size=2)
    small = resize_images(decoded, concurrency=1, in_shape=(32, 32, 3),
                          out_hw=(16, 16))
    sp = small.to_pandas().sort_values("media_id")
    assert (sp["height"] == 16).all() and (sp["width"] == 16).all()
    # nearest-neighbor resize == numpy strided subsample of the decoded tensor
    dp = decode_images(rd.from_pandas(df), concurrency=1, batch_size=2
                       ).to_pandas().sort_values("media_id")
    full = np.asarray(dp["pixels"].iloc[0], dtype=np.float32).reshape(32, 32, 3)
    ri = (np.arange(16) * 32) // 16
    expect = full[ri][:, ri].reshape(-1)
    np.testing.assert_array_equal(
        np.asarray(sp["pixels"].iloc[0], dtype=np.float32), expect)
    feats = extract_features(small, in_dim=16 * 16 * 3, out_dim=8,
                             concurrency=1).to_pandas().sort_values("media_id")
    assert len(feats) == 2
    assert all(len(e) == 8 for e in feats["embedding"])
    # projection is seeded -> deterministic across runs/actors
    feats2 = extract_features(
        resize_images(decode_images(rd.from_pandas(df), concurrency=1),
                      concurrency=1, in_shape=(32, 32, 3), out_hw=(16, 16)),
        in_dim=16 * 16 * 3, out_dim=8, concurrency=1,
    ).to_pandas().sort_values("media_id")
    np.testing.assert_array_equal(
        np.stack(feats["embedding"].to_numpy()),
        np.stack(feats2["embedding"].to_numpy()))


def test_prepare_training_data(docs_df, tmp_path):
    from pytimetk_ray.pipelines.prep import prepare_training_data

    out, stats = prepare_training_data(
        rd.from_pandas(docs_df), out_dir=str(tmp_path / "prep"),
        min_tokens=3, neardup_threshold=0.6, concurrency=2,
    )
    df = out.to_pandas()
    assert stats["input_rows"] == len(docs_df)
    assert stats["output_rows"] == len(df)
    # exact duplicates gone: texts unique
    assert df["text"].nunique() == len(df)
    # planted near-dups (tail-append) mostly removed
    assert stats["neardup_dropped"] >= 2
    # manifest written
    import json, os

    with open(tmp_path / "prep" / "manifest.json") as f:
        m = json.load(f)
    assert m["output_rows"] == len(df)


def test_exact_dedup_rows(docs_df):
    from pytimetk_ray.pipelines.dedup import exact_dedup_rows

    out = exact_dedup_rows(rd.from_pandas(docs_df)).to_pandas()
    assert len(out) == docs_df["text"].nunique()
    assert set(out.columns) == set(docs_df.columns)  # full rows survive
    # min id kept per duplicate text
    for i in docs_df.head(5)["doc_id"]:
        assert i in set(out["doc_id"]) and (i + 1_000_000) not in set(out["doc_id"])


def test_embedding_neardup_pathological_bucket_capped():
    # all-identical vectors hash into ONE bucket in EVERY band regardless of
    # table count; max_bucket must bound the task (deterministic id-ascending
    # truncation) instead of an O(n^2) blowup
    rng = np.random.default_rng(3)
    base = rng.normal(size=64)
    n_dup = 50
    vecs = [base.copy() for _ in range(n_dup)] + [rng.normal(size=64) for _ in range(20)]
    df = pd.DataFrame({"vec_id": np.arange(len(vecs), dtype=np.int64),
                       "embedding": [v.astype(np.float64) for v in vecs]})
    pairs = embedding_neardup_pairs(
        rd.from_pandas(df), dim=64, threshold=0.999, nbits=2, bands=2,
        max_bucket=10, num_partitions=4,
    ).to_pandas()
    # only the first 10 duplicate ids survive the cap -> C(10,2) pairs,
    # identical across both bands (deduped once)
    in_cap = set(zip(pairs["id_a"], pairs["id_b"]))
    expect = {(a, b) for a in range(10) for b in range(a + 1, 10)}
    assert expect == {p for p in in_cap if p[0] < n_dup and p[1] < n_dup}
    assert len(pairs) == len(expect)


def test_embedding_neardup_banded_matches_exact_within_buckets():
    # banded candidates must be a SUBSET of exact all-pairs, and every
    # candidate's cosine must equal the exact computation
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    exact = embedding_neardup_pairs(
        rd.from_pandas(emb), dim=64, threshold=0.2, nbits=0, round_digits=6,
    ).to_pandas()
    banded = embedding_neardup_pairs(
        rd.from_pandas(emb), dim=64, threshold=0.2, nbits=2, bands=2,
        round_digits=6,
    ).to_pandas()
    ex = {(a, b): c for a, b, c in zip(exact["id_a"], exact["id_b"], exact["cosine"])}
    assert len(banded) <= len(exact)
    assert len(banded) > 0
    for a, b, c in zip(banded["id_a"], banded["id_b"], banded["cosine"]):
        assert (a, b) in ex and ex[(a, b)] == c


def test_ann_ivf_random_sample_covers_skewed_storage_order():
    # storage-order-clustered corpus: the first train_sample rows are ALL
    # cluster A, so head-trained centroids never see cluster B.  The bias
    # shows up as CENTROID COVERAGE: under head training every B vector is
    # far from every centroid (one centroid silently swallows half the
    # corpus — brute-force-sized probe lists at scale), while a random
    # sample places centroids in both clusters.
    from pytimetk_ray.pipelines.similarity import _kmeans, _normalize, ann_ivf

    rng = np.random.default_rng(11)
    d, na, nb = 32, 600, 600
    ca = rng.normal(size=d)
    cb = -ca + 0.1 * rng.normal(size=d)  # far-apart cluster centers
    A = ca + 0.05 * rng.normal(size=(na, d))
    B = cb + 0.05 * rng.normal(size=(nb, d))
    mat = np.vstack([A, B]).astype(np.float64)  # A first: storage-ordered

    c_head = _kmeans(mat[:na], 8, seed=17)  # what ds.limit(na) trains on
    idx = np.sort(rng.choice(len(mat), size=na, replace=False))
    c_rand = _kmeans(mat[idx], 8, seed=17)
    xn = _normalize(mat)
    cov_head = (xn @ c_head.T).max(axis=1)  # best-centroid cosine per row
    cov_rand = (xn @ c_rand.T).max(axis=1)
    # head-trained leaves cluster B essentially uncovered
    assert cov_rand.min() > cov_head.min() + 0.5, (cov_rand.min(), cov_head.min())
    # ...and the random-trained assignment is balanced, not one mega-cluster
    share_head = np.bincount(np.argmax(xn @ c_head.T, axis=1), minlength=8).max() / len(mat)
    share_rand = np.bincount(np.argmax(xn @ c_rand.T, axis=1), minlength=8).max() / len(mat)
    assert share_rand < share_head, (share_rand, share_head)
    assert share_head >= 0.45  # one centroid swallowed all of B

    # end-to-end: the pipeline's random-sample path keeps high recall on
    # queries from the storage-tail cluster
    df = pd.DataFrame({"vec_id": np.arange(len(mat), dtype=np.int64),
                       "embedding": list(mat)})
    q, qids = mat[na:na + 6], np.arange(na, na + 6, dtype=np.int64)
    exact = ann_bruteforce(rd.from_pandas(df), q, qids, k=10).to_pandas()
    got = ann_ivf(rd.from_pandas(df), q, qids, k=10, nlist=8, nprobe=4,
                  train_sample=na).to_pandas()
    hits = 0.0
    for qi in qids:
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        hits += len(e & set(got[got["query_id"] == qi]["vec_id"])) / max(1, len(e))
    assert hits / len(qids) >= 0.9, hits / len(qids)


def test_ann_ivf_recall_vs_bruteforce():
    from pytimetk_ray.pipelines.similarity import ann_ivf

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    ids = emb["vec_id"].to_numpy()
    q, qids = mat[:8], ids[:8]
    exact = ann_bruteforce(rd.from_pandas(emb), q, qids, k=10).to_pandas()

    def recall(approx):
        hits = 0
        for qi in qids:
            e = set(exact[exact["query_id"] == qi]["vec_id"])
            a = set(approx[approx["query_id"] == qi]["vec_id"])
            hits += len(e & a) / max(1, len(e))
        return hits / len(qids)

    # synthetic embeddings are near-uniform in 64-d (weak cluster structure),
    # so absolute recall is modest; assert a floor + monotonicity in nprobe
    r4 = recall(ann_ivf(rd.from_pandas(emb), q, qids, k=10, nlist=8, nprobe=4).to_pandas())
    r1 = recall(ann_ivf(rd.from_pandas(emb), q, qids, k=10, nlist=8, nprobe=1).to_pandas())
    assert r4 >= 0.6, r4
    assert r4 > r1, (r4, r1)
    # full-probe IVF is exhaustive -> must EQUAL brute force
    full = ann_ivf(rd.from_pandas(emb), q, qids, k=10, nlist=8, nprobe=8).to_pandas()
    for qi in qids:
        e = exact[exact["query_id"] == qi].sort_values(["cosine", "vec_id"],
                                                       ascending=[False, True])
        f = full[full["query_id"] == qi].sort_values(["cosine", "vec_id"],
                                                     ascending=[False, True])
        np.testing.assert_array_equal(f["vec_id"].to_numpy(), e["vec_id"].to_numpy())


def test_jaccard_dfcut_hot_shingle():
    """A pathological shingle shared by EVERY doc must be dropped by the
    df-cut (no b-squared pair blowup), with set sizes counting only the
    surviving shingles — verified against a local exact recompute."""
    from pytimetk_ray.pipelines.dedup import jaccard_allpairs

    hot = "alpha beta gamma"  # one trigram present in every doc (df=20 > cap)
    texts = []
    for i in range(10):  # 10 near-dup PAIRS, each sharing a distinct tail
        tail = f"shared{i} common{i} tail{i} words{i} here{i} now{i}"
        texts.append(f"{hot} {tail} left{i}")
        texts.append(f"{hot} {tail} right{i}")
    docs = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": texts,
    })
    got = (
        jaccard_allpairs(rd.from_pandas(docs), threshold=0.2, max_doc_freq=5)
        .to_pandas().sort_values(["id_a", "id_b"], ignore_index=True)
    )
    # local exact recompute with the same df-cut
    sets = {r.doc_id: tx.word_shingles(r.text, 3) for r in docs.itertuples()}
    from collections import Counter
    df_count = Counter(h for s in sets.values() for h in s)
    sets = {i: {h for h in s if df_count[h] <= 5} for i, s in sets.items()}
    want = []
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[ids[i]], sets[ids[j]]
            denom = len(a | b)
            jac = len(a & b) / denom if denom else 0.0
            if jac >= 0.2:
                want.append((ids[i], ids[j], jac))
    want = pd.DataFrame(want, columns=["id_a", "id_b", "jaccard"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dedup_components_distributed_matches_local():
    """Force the distributed label-propagation rounds (gate=0) on a chain +
    two cliques; labels must match the single-task union-find path."""
    from pytimetk_ray.pipelines.dedup import dedup_components

    pairs = pd.DataFrame({
        "id_a": [1, 2, 3, 4, 10, 10, 11, 20],
        "id_b": [2, 3, 4, 5, 11, 12, 12, 21],
    })
    ds = rd.from_pandas(pairs)
    local = dedup_components(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    dist = dedup_components(ds, single_task_max_edges=0).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(local, dist)
    assert dict(zip(local["doc_id"], local["cluster_id"])) == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
    }
