"""Deduplication operators for training-data pipelines.

Exact + four near-dup families, each expressed Ray-Data-first:

- exact:       content hash in map_batches -> groupby(hash) keep-first;
- MinHash+LSH: shingle -> minhash signature per doc (vectorized) ->
               explode to (band_id, band_hash) rows -> groupby bands ->
               candidate pairs -> Jaccard verify;
- SimHash:     64-bit simhash per doc -> exact-bucket groupby (near-dups
               collide on the full hash or a masked band);
- n-gram Jaccard: direct pairwise verify inside candidate buckets;
- embedding cosine: see stages/similarity.py (near_dup_pairs_embedding).

The LSH shuffle keys are (band_id, band_hash) — uniformly distributed by
construction, so the groupby is skew-free; candidate verification runs
per bucket (small groups) and never materializes the corpus.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of the k-word shingles of a document (uint64)."""
    words = text.split()
    if len(words) < k:
        joined = " ".join(words)
        return np.array([zlib.crc32(joined.encode())], dtype=np.uint64)
    out = np.empty(len(words) - k + 1, dtype=np.uint64)
    for i in range(len(words) - k + 1):
        out[i] = zlib.crc32(" ".join(words[i : i + k]).encode())
    return out


class MinHasher:
    """Per-batch MinHash signatures (n_perm universal hashes over shingle
    CRCs), vectorized across each doc's shingle set.

    Adds ``minhash: list<int64>`` of length ``n_perm``.
    """

    def __init__(self, n_perm: int = 64, shingle_k: int = 5, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(
            np.uint64
        )
        self.b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(
            np.uint64
        )
        self.n_perm = n_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (n_perm, n_shingles) universal hash, min over shingles
        with np.errstate(over="ignore"):
            hv = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(
                _MERSENNE
            )
        return hv.min(axis=1).astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["minhash"] = [
            self.signature(t) for t in batch["text"].fillna("")
        ]
        return out


def explode_bands(n_bands: int):
    """minhash signatures -> (doc_id, band_id, band_hash) rows for the LSH
    bucketing groupby. band_hash mixes the band's rows into one int64."""

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids, band_ids, band_hashes = [], [], []
        for doc, sig in zip(batch["doc_id"], batch["minhash"]):
            sig = np.asarray(sig, dtype=np.uint64)
            rows = len(sig) // n_bands
            for b in range(n_bands):
                band = sig[b * rows : (b + 1) * rows]
                h = np.uint64(0xCBF29CE484222325)
                with np.errstate(over="ignore"):
                    for v in band:
                        h = (h * np.uint64(0x100000001B3)) ^ v
                doc_ids.append(doc)
                band_ids.append(b)
                band_hashes.append(np.int64(h >> np.uint64(1)))
        return pd.DataFrame(
            {
                "doc_id": doc_ids,
                "band_id": np.array(band_ids, dtype=np.int64),
                "band_hash": np.array(band_hashes, dtype=np.int64),
            }
        )

    return _f


_BUCKET_PAIR_CAP = 256


def bucket_candidate_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """One LSH bucket -> candidate pairs (docs sharing a band hash).

    Buckets larger than ``_BUCKET_PAIR_CAP`` emit a star (every doc
    paired with the lexicographically-first) instead of all O(n^2)
    pairs: a duplicate-heavy corpus — exactly what a dedup pipeline
    exists for — would otherwise build hundreds of millions of pairs in
    one Python task.  The star still links every member of a duplicate
    group to one representative, which is what downstream grouping
    needs; only (near-dup, near-dup) edges among non-representatives in
    oversized buckets are sacrificed.
    """
    docs = sorted(set(group["doc_id"]))
    if len(docs) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(str)
    if len(docs) > _BUCKET_PAIR_CAP:
        rep = docs[0]
        return pd.DataFrame(
            {"doc_a": [rep] * (len(docs) - 1), "doc_b": docs[1:]}
        )
    a, b = [], []
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a.append(docs[i])
            b.append(docs[j])
    return pd.DataFrame({"doc_a": a, "doc_b": b})


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-word-shingle Jaccard similarity (the LSH verify step)."""
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def minhash_lsh_duplicates(
    docs_ds,
    *,
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    text_by_doc: dict | None = None,
):
    """Full MinHash-LSH near-dup pipeline over (doc_id, text) batches.

    Returns a pandas DataFrame of verified pairs (doc_a, doc_b, jaccard).
    ``text_by_doc``: optional broadcast dict for the verify step; when
    None, verification joins text back via a driver-side lookup of the
    candidate doc_ids only (candidates are sparse).
    """
    sigs = docs_ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"n_perm": n_perm, "shingle_k": shingle_k},
        batch_format="pandas",
        concurrency=(1, 4),
    )
    bands = sigs.map_batches(explode_bands(n_bands), batch_format="pandas")
    cands = bands.groupby(["band_id", "band_hash"]).map_groups(
        bucket_candidate_pairs, batch_format="pandas"
    )
    cand_df = cands.to_pandas().drop_duplicates(["doc_a", "doc_b"])
    if cand_df.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})

    if text_by_doc is None:
        need = set(cand_df["doc_a"]) | set(cand_df["doc_b"])
        import pyarrow.compute as pc

        def pick(t: pa.Table) -> pa.Table:
            mask = pc.is_in(
                t["doc_id"], value_set=pa.array(sorted(need), pa.string())
            )
            return t.filter(mask)

        picked = docs_ds.map_batches(pick, batch_format="pyarrow").to_pandas()
        text_by_doc = dict(zip(picked["doc_id"], picked["text"]))

    jac = [
        ngram_jaccard(text_by_doc[a], text_by_doc[b], shingle_k)
        for a, b in zip(cand_df["doc_a"], cand_df["doc_b"])
    ]
    cand_df = cand_df.assign(jaccard=jac)
    out = cand_df[cand_df["jaccard"] >= jaccard_threshold]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


class SimHasher:
    """64-bit SimHash over word features; near-dups share the hash up to a
    few bits.  Adds ``simhash: int64``."""

    def __init__(self):
        self.word_re = re.compile(r"\w+", re.UNICODE)

    def simhash(self, text: str) -> np.int64:
        words = self.word_re.findall(text.lower())
        if not words:
            return np.int64(0)
        acc = np.zeros(64, dtype=np.int64)
        for w in words:
            h = np.uint64(
                zlib.crc32(w.encode())
                | (zlib.crc32(w[::-1].encode()) << 32)
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        v = 0
        for i in range(64):
            if acc[i] > 0:
                v |= 1 << i
        return np.int64(v >> 1)  # keep sign-safe int64

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["simhash"] = [self.simhash(t) for t in batch["text"].fillna("")]
        return out


def exact_duplicates_by_content(docs_ds):
    """Exact dedup via content hash: hash-partitioned groupby keep-first.

    Returns a Dataset (content_hash, doc_id, copies) with doc_id = the
    minimum doc_id of each content group (the kept representative).
    """
    from ray.data.aggregate import Count, Min

    from pynomaly_ray.functions.hashing import hash_strings

    def add_hash(t: pa.Table) -> pa.Table:
        h = hash_strings(t["text"]).astype(np.int64)
        return t.append_column("content_hash", pa.array(h, pa.int64()))

    hashed = docs_ds.map_batches(add_hash, batch_format="pyarrow")
    return hashed.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Count(alias_name="copies"),
    )
