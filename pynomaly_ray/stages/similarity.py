"""Similarity search over embedding columns (list<float>).

- Brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix, then a global top-k merge — the exact baseline.
- LSH-bucketed variant (random hyperplane signs): candidate buckets
  shrink the scanned set; the scale path when the corpus >> memory.
- Embedding near-dup: all pairs above a cosine threshold via the same
  bucketing.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa


def _embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    if batch.num_rows == 0:
        return np.empty((0, 0), dtype=np.float64)
    emb = batch[col]
    comb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
    if hasattr(comb, "offsets"):  # plain Arrow list<float>
        offs = comb.offsets.to_numpy(zero_copy_only=False)
        flat = comb.values[offs[0] : offs[-1]].to_numpy(zero_copy_only=False)
        return flat.astype(np.float64).reshape(batch.num_rows, -1)
    # Ray's ArrowTensorArray extension (fixed-shape tensors)
    return np.asarray(comb.to_numpy(zero_copy_only=False), dtype=np.float64)


class CosineTopK:
    """Actor-pool stage: per-batch cosine scores against Q broadcast query
    vectors, emitting each batch's local top-k per query.  A final tiny
    driver-side merge of (n_batches x k) rows yields the global top-k —
    no full-corpus sort."""

    def __init__(self, queries_ref, k: int = 10):
        import ray

        q = (
            ray.get(queries_ref)
            if isinstance(queries_ref, ray.ObjectRef)
            else queries_ref
        )
        q = np.asarray(q, dtype=np.float64)
        if q.ndim == 1:
            q = q[None, :]
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        M = _embedding_matrix(batch)
        norms = np.linalg.norm(M, axis=1)
        S = (M @ self.qn.T) / np.where(norms > 0, norms, 1.0)[:, None]
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        k = min(self.k, len(vec_ids))
        for qi in range(S.shape[1]):
            col = S[:, qi]
            idx = np.argpartition(-col, k - 1)[:k]
            out_q.extend([qi] * k)
            out_id.extend(vec_ids[idx].tolist())
            out_s.extend(col[idx].tolist())
    # noqa: local top-k only; global merge happens downstream
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def cosine_topk(ds, queries: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Global cosine top-k per query over an embeddings Dataset."""
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float64))
    local = ds.map_batches(
        CosineTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
    )
    df = local.to_pandas()  # n_batches * n_queries * k rows — tiny
    out = (
        df.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    return out


class HyperplaneLSH:
    """Random-hyperplane sign buckets: adds ``bucket: int64`` so that a
    groupby("bucket") co-locates probable neighbors (IVF/LSH scale path
    for similarity search and embedding near-dup)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 11):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(dim, n_planes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("bucket", pa.array([], pa.int64()))
        M = _embedding_matrix(batch)
        signs = (M @ self.planes) > 0
        bucket = signs @ (1 << np.arange(signs.shape[1], dtype=np.int64))
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )


def near_dup_pairs_embedding(
    ds, *, dim: int, threshold: float = 0.95, n_planes: int = 10
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs via hyperplane-LSH buckets.

    Within each bucket (a small group after the groupby shuffle), computes
    exact pairwise cosine and keeps pairs >= threshold.  Pairs split
    across buckets are missed with probability (1 - (1-theta/pi)^P)... the
    standard LSH recall tradeoff; lower n_planes for higher recall.
    """
    bucketed = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        M = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(M, axis=1)
        S = (M @ M.T) / np.outer(np.where(n > 0, n, 1), np.where(n > 0, n, 1))
        ids = g["vec_id"].to_numpy()
        iu = np.triu_indices(len(g), k=1)
        mask = S[iu] >= threshold
        a, b = ids[iu[0][mask]], ids[iu[1][mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi, "cosine": S[iu][mask]})

    pairs = bucketed.groupby("bucket").map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    df = pairs.to_pandas()
    if df.empty:
        return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
    return (
        df.drop_duplicates(["vec_a", "vec_b"])
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
