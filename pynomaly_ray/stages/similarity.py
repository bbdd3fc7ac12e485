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


def _merge_topk(k: int):
    """Per-bucket exact top-k reducer: every query's survivor rows are
    key-co-located, so head(k) per bucket IS the global top-k."""

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(
                ["query_id", "score", "vec_id"], ascending=[True, False, True]
            )
            .groupby("query_id", sort=False)
            .head(k)
            .reset_index(drop=True)
        )

    return merge


def _present_topk(survivors_ds, k: int) -> pd.DataFrame:
    """Survivors -> exchange-merged top-k -> presentation-ordered frame.

    The merge runs as a hash_aggregate on query_id, so the driver only
    ever sees n_queries*k final rows — many-query workloads stay bounded
    where a driver concat of n_batches*Q*k survivor rows would not.
    """
    from pynomaly_ray.functions.exchange import hash_aggregate

    df = hash_aggregate(survivors_ds, ["query_id"], _merge_topk(k)).to_pandas()
    if df.empty:
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype=np.int64),
                "vec_id": pd.Series(dtype=np.int64),
                "score": pd.Series(dtype=np.float64),
            }
        )
    return df.sort_values(
        ["query_id", "score", "vec_id"], ascending=[True, False, True]
    ).reset_index(drop=True)


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
    return _present_topk(local, k)


def _kmeans_spherical(
    M: np.ndarray, k: int, iters: int = 10, seed: int = 13
) -> np.ndarray:
    """Deterministic spherical k-means (cosine/dot assignment) for IVF
    coarse quantization: rows of ``M`` must be L2-normalized; returns
    (k, dim) normalized centroids.  Pure numpy Lloyd iterations — no
    sklearn in this environment."""
    rng = np.random.RandomState(seed)
    n = len(M)
    k = min(k, n)
    C = M[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(M @ C.T, axis=1)
        empty = []
        for c in range(k):
            rows = assign == c
            if rows.any():
                v = M[rows].sum(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    C[c] = v / norm
            else:
                empty.append(c)
        if empty:
            _reseed_empty_centroids(C, M, assign, empty)
    return C


def _reseed_empty_centroids(
    C: np.ndarray, M: np.ndarray, assign: np.ndarray, empty: list[int]
) -> None:
    """Re-seed each empty centroid at a DISTINCT worst-served point
    (ascending cosine to its assigned centroid), deterministically.
    Several centroids emptying in the same Lloyd iteration must not all
    land on the identical point — duplicate centroids waste n_probe
    budget in cosine_topk_ivf."""
    served = (M * C[assign]).sum(axis=1)
    order = np.argsort(served, kind="stable")  # worst-served first
    for i, c in enumerate(empty):
        C[c] = M[order[i % len(order)]]


def cosine_topk_ivf(
    ds,
    queries: np.ndarray,
    k: int = 10,
    *,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_rows: int = 16384,
    seed: int = 13,
) -> pd.DataFrame:
    """IVF approximate cosine top-k: the scale path beyond brute force.

    Coarse centroids are trained once on a bounded sample (driver-side,
    O(train_rows x dim)); every worker task then assigns its batch's
    vectors to centroids with one matmul and scores ONLY the rows whose
    centroid is among each query's ``n_probe`` closest — scanning
    n_probe/n_centroids of the corpus instead of all of it.  Same
    output schema as :func:`cosine_topk`; recall is the IVF tradeoff
    (raise n_probe toward n_centroids to approach exact).
    """
    import ray

    sample = ds.limit(train_rows).to_pandas()
    S = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    sn = np.linalg.norm(S, axis=1)
    C = _kmeans_spherical(
        S / np.where(sn > 0, sn, 1.0)[:, None], n_centroids, seed=seed
    )
    q = np.asarray(queries, dtype=np.float64)
    if q.ndim == 1:
        q = q[None, :]
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    n_probe = min(n_probe, len(C))
    # (Q, n_probe) centroid ids each query probes
    probes = np.argpartition(-(qn @ C.T), n_probe - 1, axis=1)[:, :n_probe]
    probe_masks = np.zeros((len(qn), len(C)), dtype=bool)
    for qi in range(len(qn)):
        probe_masks[qi, probes[qi]] = True
    cref = ray.put((C, qn, probe_masks))

    def scan(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("query_id", pa.int64()),
                ("vec_id", pa.int64()),
                ("score", pa.float64()),
            ]
        )
        if batch.num_rows == 0:
            return out_schema.empty_table()
        C_l, qn_l, masks = ray.get(cref)
        M = _embedding_matrix(batch)
        norms = np.linalg.norm(M, axis=1)
        Mn = M / np.where(norms > 0, norms, 1.0)[:, None]
        assign = np.argmax(Mn @ C_l.T, axis=1)
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi in range(len(qn_l)):
            rows = np.flatnonzero(masks[qi][assign])
            if not len(rows):
                continue
            scores = Mn[rows] @ qn_l[qi]
            kk = min(k, len(rows))
            top = np.argpartition(-scores, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(vec_ids[rows[top]].tolist())
            out_s.extend(scores[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    local = ds.map_batches(scan, batch_format="pyarrow", batch_size=8192)
    return _present_topk(local, k)


class HyperplaneLSH:
    """Random-hyperplane sign buckets: adds ``bucket: int64`` so that a
    groupby("bucket") co-locates probable neighbors (IVF/LSH scale path
    for similarity search and embedding near-dup)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 11, col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(dim, n_planes)
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("bucket", pa.array([], pa.int64()))
        M = _embedding_matrix(batch, self.col)
        signs = (M @ self.planes) > 0
        bucket = signs @ (1 << np.arange(signs.shape[1], dtype=np.int64))
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )


class MultiTableLSH:
    """L independent hyperplane tables of k planes each: emits the long
    format (vec_id, table_id, bucket) — L rows per vector, embeddings NOT
    carried (candidates re-join them later).  OR-ing tables lifts recall
    from p^k to 1-(1-p^k)^L, the standard LSH knob."""

    def __init__(self, dim: int, n_planes: int = 4, n_tables: int = 8, seed: int = 11):
        rng = np.random.RandomState(seed)
        # (dim, n_tables * n_planes): one matmul covers all tables
        self.planes = rng.randn(dim, n_tables * n_planes)
        self.n_planes = n_planes
        self.n_tables = n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "table_id": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        M = _embedding_matrix(batch)
        signs = (M @ self.planes) > 0  # (n, T*k)
        signs = signs.reshape(n, self.n_tables, self.n_planes)
        bucket = signs @ (1 << np.arange(self.n_planes, dtype=np.int64))
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vec_ids, self.n_tables), pa.int64()),
                "table_id": pa.array(
                    np.tile(np.arange(self.n_tables, dtype=np.int64), n), pa.int64()
                ),
                "bucket": pa.array(bucket.astype(np.int64).ravel(), pa.int64()),
            }
        )


_BUCKET_PAIR_CAP = 512


def _bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """ALL (table_id, bucket) groups of one exchange bucket -> candidate
    id pairs; vectorized singleton elimination, pair emission batched by
    group size (stages/dedup._emit_group_pairs); oversized buckets emit
    a star to the smallest id (see stages/dedup.py rationale)."""
    from pynomaly_ray.stages.dedup import _emit_group_pairs

    if not len(df):
        return pd.DataFrame(
            {
                "vec_a": pd.Series(dtype=np.int64),
                "vec_b": pd.Series(dtype=np.int64),
            }
        )
    keys = ["table_id", "bucket"]
    d = df.drop_duplicates(keys + ["vec_id"]).sort_values(
        keys + ["vec_id"], kind="mergesort"
    )
    sizes = d.groupby(keys, sort=False)["vec_id"].transform("size")
    d = d[sizes >= 2]
    if not len(d):
        return pd.DataFrame(
            {
                "vec_a": pd.Series(dtype=np.int64),
                "vec_b": pd.Series(dtype=np.int64),
            }
        )
    gsizes = d.groupby(keys, sort=False).size().to_numpy()
    a, b = _emit_group_pairs(
        d["vec_id"].to_numpy(dtype=np.int64), gsizes, _BUCKET_PAIR_CAP
    )
    return pd.DataFrame({"vec_a": a, "vec_b": b})


def near_dup_pairs_embedding(
    ds,
    *,
    dim: int,
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 8,
    as_dataset: bool = False,
):
    """Embedding-cosine near-duplicate pairs via multi-table hyperplane
    LSH, fully distributed:

    1. L tables of k hyperplane signs per vector (one matmul);
    2. groupby (table_id, bucket) -> candidate id pairs (uniform keys);
    3. hash-exchange dedup of pairs;
    4. embeddings hash-joined onto the candidates (never broadcast, never
       driver-collected) and exact cosine computed vectorized per batch;
    5. only verified pairs >= threshold reach the driver — or, with
       ``as_dataset=True``, stay distributed as a ray.data.Dataset for a
       ``write_parquet`` sink (the path for corpora whose verified-pair
       list itself exceeds driver memory).

    Recall for a pair at angle theta: 1-(1-p^k)^L with p = 1-theta/pi —
    raise n_tables for higher recall, n_planes for sparser buckets.
    """
    from pynomaly_ray.functions.exchange import hash_aggregate, hash_join

    # plane matrices are tiny and deterministic — plain callable, task pool
    buckets = ds.map_batches(
        MultiTableLSH(dim=dim, n_planes=n_planes, n_tables=n_tables),
        batch_format="pyarrow",
        batch_size=8192,
    )
    cands = hash_aggregate(
        buckets, ["table_id", "bucket"], _bucket_pairs
    )

    def _rename(col_id: str, col_emb: str):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({col_id: t["vec_id"], col_emb: t["embedding"]})

        return _f

    emb_a = ds.map_batches(_rename("vec_a", "emb_a"), batch_format="pyarrow")
    emb_b = ds.map_batches(_rename("vec_b", "emb_b"), batch_format="pyarrow")
    # every copy of a pair (one per colliding table) shares vec_a, so the
    # in-bucket dedup inside the first join is globally exact
    with_a = hash_join(
        cands,
        emb_a,
        ["vec_a"],
        merge_fn=lambda df: df.drop_duplicates(["vec_a", "vec_b"]),
    )
    with_b = hash_join(with_a, emb_b, ["vec_b"])

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        A = _embedding_matrix(t, "emb_a")
        B = _embedding_matrix(t, "emb_b")
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(B, axis=1)
        cos = (A * B).sum(axis=1) / (
            np.where(na > 0, na, 1) * np.where(nb > 0, nb, 1)
        )
        keep = cos >= threshold
        va = t["vec_a"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        vb = t["vec_b"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        return pa.table(
            {
                "vec_a": pa.array(va, pa.int64()),
                "vec_b": pa.array(vb, pa.int64()),
                "cosine": pa.array(cos[keep], pa.float64()),
            }
        )

    verified = with_b.map_batches(verify, batch_format="pyarrow")
    if as_dataset:
        return verified  # threshold filter already ran in the map tasks
    df = verified.to_pandas()
    if df.empty:
        return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
    return df.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
