"""Distributed graph primitives for dedup post-processing.

A near-dup pipeline's pair list is not an actionable keep/drop decision
until pairs are collapsed into groups: connected components turn
(a, b) similarity edges into (node, component) labels, from which a
keep-list is one "keep the component minimum" filter.  The reference
has no analogue (PyNomaly stops at scores); this is engine surface for
the 100-TB curation workflow.
"""

from __future__ import annotations

import os
import warnings

import numpy as np
import pandas as pd

# At or below this many edges the whole graph is driver-sized and the
# distributed rounds are pure scheduling overhead (measured 4 s for a
# 90-edge graph vs microseconds locally); above it, label propagation
# runs as hash exchanges.  Env-overridable so tests force both paths.
_LOCAL_CC_EDGE_CAP_DEFAULT = 1_000_000

# Pointer-jumping lookup table (one row per DISTINCT label ~= per
# component) is broadcast when at most this many entries; beyond it the
# jump is skipped for the round — propagation alone remains correct,
# just diameter-bound (distinct-label count shrinks monotonically, so
# jumping re-engages as convergence proceeds).
_JUMP_BROADCAST_CAP = 1_000_000


def _local_components(
    edges: pd.DataFrame, col_a: str, col_b: str
) -> pd.DataFrame:
    """Driver-local components: code ids via np.unique (sorted, so the
    minimum code IS the minimum id), then vectorized min-propagation
    with pointer jumping — O(E) numpy per round, O(log n) rounds.
    ``edges`` must be pre-cleaned: non-empty, no null endpoints (a null
    id cannot carry a label and would break the sort-based coding).

    np.unique rather than pd.factorize: pandas' object hash table
    compares strings as NUL-terminated C strings, so string doc_ids
    differing only after an embedded ``\\x00`` would alias into one
    node and silently merge unrelated components; np.unique's
    sort-based Python compare is byte-exact."""
    both = pd.concat([edges[col_a], edges[col_b]], ignore_index=True)
    uniques, codes = np.unique(both.to_numpy(), return_inverse=True)
    n = len(uniques)
    m = len(edges)
    src, dst = codes[:m], codes[m:]
    lbl = np.arange(n, dtype=np.int64)
    while True:
        old = lbl.copy()
        np.minimum.at(lbl, dst, lbl[src])
        np.minimum.at(lbl, src, lbl[dst])
        lbl = np.minimum(lbl, lbl[lbl])  # pointer jumping
        if np.array_equal(lbl, old):
            break
    vals = np.asarray(uniques)
    return pd.DataFrame({"node": vals, "lbl": vals[lbl]})


def connected_components(
    edges_ds,
    col_a: str = "a",
    col_b: str = "b",
    max_rounds: int = 64,
):
    """Connected components over an edge Dataset by distributed
    min-label propagation: every round is one labels-onto-edges
    ``hash_join`` (messages collapse to per-destination minima inside
    the join buckets) plus one ``hash_aggregate`` min per node — no
    driver-side graph, no global sort.

    Rounds needed = graph diameter, which for dedup graphs is small by
    construction (the star-capped pair emitters link members to a
    representative, diameter ~2); ``max_rounds`` bounds pathological
    chains and warns on non-convergence.  Convergence is detected by an
    order-insensitive hash checksum of the (node, label) rows: labels
    only ever decrease (monotone), so the label multiset changes at
    every non-fixpoint step and the checksum is a sound detector up to
    a 2^-64 hash collision.  Node ids may be integers or strings (any
    orderable, hashable dtype — doc_ids are strings).

    Returns a Dataset of (node, component) where ``component`` is the
    minimum node id of the component — deterministic and
    engine-independent.  Isolated nodes (no edges) don't appear; union
    them in with label = self if the full node set is needed.
    """
    import ray.data as rd

    from pynomaly_ray.functions.exchange import hash_aggregate, hash_join
    from pynomaly_ray.functions.hashing import nul_safe_key

    cap = int(
        os.environ.get("PNR_LOCAL_CC_EDGES", _LOCAL_CC_EDGE_CAP_DEFAULT)
    )

    import pyarrow as pa

    def drop_null_edges(df: pd.DataFrame) -> pd.DataFrame:
        # a null endpoint cannot carry a label (and would alias other
        # nodes through factorize's -1 code); such edges are dropped —
        # run uniqueness/validation beforehand to surface null ids
        return df.dropna(subset=[col_a, col_b])

    edges_in = edges_ds.map_batches(
        drop_null_edges, batch_format="pandas"
    ).materialize()
    n_edges = edges_in.count()
    if n_edges == 0:
        # typed empty result so downstream renames/writes/unions still
        # work — node/lbl take the INPUT edge column's type (an int64
        # caller unioning the empty result with typed data must not hit
        # a string/int schema mismatch); string fallback when even the
        # input schema is unknown (fully empty upstream dataset)
        schema = edges_ds.schema()
        node_type = pa.string()
        if schema is not None and col_a in schema.names:
            t = schema.types[schema.names.index(col_a)]
            # pandas-backed empty blocks surface Python classes (e.g.
            # ``object``) instead of Arrow types, and all-null extension
            # blocks surface ``null`` — both fall back to string
            if isinstance(t, pa.DataType) and not pa.types.is_null(t):
                node_type = t
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], node_type),
                    "lbl": pa.array([], node_type),
                }
            )
        )
    if n_edges <= cap:
        # size switch (same pattern as anti_membership / Stage B): a
        # driver-sized edge list resolves in vectorized numpy instead of
        # paying a join + aggregate + checksum execution per round
        return rd.from_pandas(
            _local_components(edges_in.to_pandas(), col_a, col_b)
        )

    def symmetrize(df: pd.DataFrame) -> pd.DataFrame:
        a = df[col_a].to_numpy()
        b = df[col_b].to_numpy()
        return pd.DataFrame(
            {
                "src": np.concatenate([a, b]),
                "dst": np.concatenate([b, a]),
            }
        )

    edges = edges_in.map_batches(
        symmetrize, batch_format="pandas"
    ).materialize()

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        # nul_safe_key: pd.unique on object strings aliases node ids
        # differing only after an embedded NUL (pandas C-string compare);
        # cast back to object afterwards so blocks keep a uniform schema
        key = nul_safe_key(df["src"])
        nodes = pd.unique(key)
        if key is not df["src"]:
            nodes = np.asarray(nodes, dtype=object)
        return pd.DataFrame({"node": nodes, "lbl": nodes})

    def min_label(df: pd.DataFrame) -> pd.DataFrame:
        key = nul_safe_key(df["node"])
        g = df.groupby(key, sort=False)["lbl"].min().reset_index()
        if key is not df["node"]:
            g["node"] = g["node"].astype(object)
        return g

    def _min_to_dst(df: pd.DataFrame) -> pd.DataFrame:
        # per-destination minimum inside the join bucket; NUL-safe key
        key = nul_safe_key(df["dst"])
        g = df.groupby(key, sort=False)["lbl"].min().reset_index()
        g = g.rename(columns={"dst": "node"})
        if key is not df["dst"]:
            g["node"] = g["node"].astype(object)
        return g

    labels = hash_aggregate(
        edges.map_batches(init_labels, batch_format="pandas"),
        ["node"],
        min_label,
    ).materialize()

    def block_sum(df: pd.DataFrame) -> pd.DataFrame:
        hn = pd.util.hash_pandas_object(
            df["node"], index=False, categorize=False
        ).to_numpy()
        hl = pd.util.hash_pandas_object(
            df["lbl"], index=False, categorize=False
        ).to_numpy()
        with np.errstate(over="ignore"):
            s = (hn * np.uint64(1000003) + hl).sum(dtype=np.uint64)
        return pd.DataFrame({"s": [s]})

    def checksum(lds) -> int:
        parts = lds.map_batches(block_sum, batch_format="pandas").to_pandas()
        with np.errstate(over="ignore"):
            return int(parts["s"].to_numpy(np.uint64).sum(dtype=np.uint64))

    prev = checksum(labels)
    for round_i in range(max_rounds):
        msgs = hash_join(
            edges,
            labels.map_batches(
                lambda df: df.rename(columns={"node": "src"}),
                batch_format="pandas",
            ),
            ["src"],
            # messages collapse to per-destination minima INSIDE the
            # join bucket, so a hub node's fan-out never materializes
            merge_fn=_min_to_dst,
        )
        new_labels = labels.union(msgs)
        if round_i >= 2:
            # Pointer jumping (lbl' = lbl[lbl]) from round 3 on — star-
            # shaped dedup graphs typically converge before it engages;
            # long chains switch from diameter rounds to O(log diameter).
            # SKEW NOTE: a naive labels-joined-on-'lbl' would funnel a
            # giant converging component's every row into ONE bucket, so
            # instead the lookup table D = {distinct label -> its label}
            # is built with uniform keys (per-block dedup bounds a hot
            # label to <= n_blocks partials; the lookup join keys on
            # NODE, which is unique) and then applied to the label
            # stream as a broadcast map — D has one row per distinct
            # label (~ #components), driver-safe long before jumping
            # matters.  If D outgrows the cap, skip jumping that round
            # (propagation alone stays correct, just diameter-bound).
            distinct_lbl = hash_aggregate(
                labels.map_batches(
                    lambda df: df[["lbl"]].drop_duplicates(),
                    batch_format="pandas",
                ),
                ["lbl"],
                lambda df: df.drop_duplicates("lbl"),
            )
            lookup = hash_join(
                distinct_lbl.map_batches(
                    lambda df: df.rename(columns={"lbl": "node"}),
                    batch_format="pandas",
                ),
                labels,
                ["node"],
            )
            D = lookup.to_pandas()  # one row per distinct label
            if len(D) <= _JUMP_BROADCAST_CAP:
                import ray

                mref = ray.put(dict(zip(D["node"], D["lbl"])))

                def apply_jump(t: pa.Table) -> pa.Table:
                    import ray as _r

                    m = _r.get(mref)
                    df = t.to_pandas()
                    l2 = df["lbl"].map(m).to_numpy()
                    cur = df["lbl"].to_numpy()
                    out = pd.DataFrame(
                        {"node": df["node"], "lbl": np.where(l2 < cur, l2, cur)}
                    )
                    return pa.Table.from_pandas(
                        out, preserve_index=False
                    ).replace_schema_metadata(None)

                new_labels = new_labels.union(
                    labels.map_batches(apply_jump, batch_format="pyarrow")
                )
        labels = hash_aggregate(
            new_labels, ["node"], min_label
        ).materialize()
        cur = checksum(labels)
        if cur == prev:
            return labels
        prev = cur
    warnings.warn(
        f"connected_components did not converge in {max_rounds} rounds "
        "(pathologically long chain?); returning the current labels",
        RuntimeWarning,
    )
    return labels


def components_drop_list(edges_ds, col_a: str, col_b: str, id_name: str, rep_name: str):
    """Near-dup pairs -> O(duplicates) drop list: connected components,
    then every node that is NOT its component's representative, renamed
    to the caller's id columns.  The one shared collapse recipe behind
    both `dedup --keep-list` and `cluster --keep-list` (keeping the
    node!=label filter and rename in a single place so edge-handling
    fixes cannot diverge between the two CLIs)."""
    labels = connected_components(edges_ds, col_a=col_a, col_b=col_b)

    def drop_rows(df):
        d = df[df["node"] != df["lbl"]]
        return d.rename(columns={"node": id_name, "lbl": rep_name})

    return labels.map_batches(drop_rows, batch_format="pandas")
