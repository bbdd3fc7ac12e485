"""Wave-51: shuffle-mixing audit via distributed run-length merge, and
positional phrase statistics.

``shuffle_run_audit`` — the dataloader-mixing scoreboard: order the
corpus by the epoch-shuffle key (the engine's deterministic Knuth hash,
seed 17 — the same order ``epoch_shuffle`` certifies) and measure how
well sources interleave: per source, the number of consecutive runs,
the longest run, and the doc count.  A poorly mixed corpus shows long
single-source runs — exactly what harms training.  Engine shape: the
composite (shuffle_key, doc_id) total order comes from range_sort;
each ordered slice emits interior per-source run partials plus its
first/last boundary runs, and the driver stitches ONLY the boundary
rows in key order (slices x 2 rows — never data rows), merging runs
that span slice boundaries.  The distributed run-length-encode merge is
the same pattern any segment/session merge over an ordered corpus
needs.  SQL twin: gaps-and-islands over the same global order.

``phrase_stats`` — positional phrase statistics: the top-3 most common
token bigrams (count DESC, bigram ASC) with their document frequency
and total occurrence count.  Adjacent-pair surfaces come from one
tokenize pass (map-side counted), one keyed exchange ranks bigrams,
and doc frequency rides the same pair rows — the building block of
phrase indexing / collocation search over an inverted index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    collect_sorted,
    hash_aggregate,
    range_sort,
    topk,
)
from pynomaly_ray.functions.hashing import knuth32
from pynomaly_ray.pipelines.queries import (
    ORACLE_QUERIES,
    _ASCII_TOKEN_RE,
    _pq,
)

_SEED = 17  # epoch_shuffle's pinned seed
_PHRASE_K = 3


# ---------------------------------------------------------------------------
# shuffle_run_audit
# ---------------------------------------------------------------------------


def q_shuffle_run_audit(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["doc_id", "source"])

    def keyed(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = knuth32(did, seed=_SEED)
        # composite (shuffle_key, doc_id) total order in one int64:
        # sk < 2^32, so sk<<31 | doc_id fits while doc_id < 2^31
        key = (sk << np.int64(31)) | did
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "source": t["source"],
            }
        )

    s = range_sort(ds.map_batches(keyed, batch_format="pyarrow"), "key")

    def slice_summary(t: pa.Table) -> pa.Table:
        src = t["source"].to_numpy(zero_copy_only=False).astype(object)
        key = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(src)
        cols = {
            "min_key": [],
            "kind": [],  # 0 interior partial, 1 first, 2 last, 3 whole
            "source": [],
            "n_runs": [],
            "longest": [],
            "total": [],
        }
        if n == 0:
            return pa.table(
                {
                    "min_key": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "n_runs": pa.array([], pa.int64()),
                    "longest": pa.array([], pa.int64()),
                    "total": pa.array([], pa.int64()),
                }
            )
        mk = int(key[0])
        change = np.r_[True, src[1:] != src[:-1]]
        starts = np.nonzero(change)[0]
        lens = np.diff(np.r_[starts, n])
        if len(starts) == 1:
            cols["min_key"].append(mk)
            cols["kind"].append(3)
            cols["source"].append(src[0])
            cols["n_runs"].append(0)
            cols["longest"].append(int(lens[0]))
            cols["total"].append(int(lens[0]))
        else:
            cols["min_key"].append(mk)
            cols["kind"].append(1)
            cols["source"].append(src[starts[0]])
            cols["n_runs"].append(0)
            cols["longest"].append(int(lens[0]))
            cols["total"].append(int(lens[0]))
            cols["min_key"].append(mk)
            cols["kind"].append(2)
            cols["source"].append(src[starts[-1]])
            cols["n_runs"].append(0)
            cols["longest"].append(int(lens[-1]))
            cols["total"].append(int(lens[-1]))
            if len(starts) > 2:
                mid = pd.DataFrame(
                    {
                        "source": src[starts[1:-1]],
                        "ln": lens[1:-1].astype(np.int64),
                    }
                ).groupby("source", sort=False)["ln"]
                agg = mid.agg(n_runs="size", longest="max", total="sum")
                for s_name, row in agg.iterrows():
                    cols["min_key"].append(mk)
                    cols["kind"].append(0)
                    cols["source"].append(s_name)
                    cols["n_runs"].append(int(row["n_runs"]))
                    cols["longest"].append(int(row["longest"]))
                    cols["total"].append(int(row["total"]))
        return pa.table(
            {
                "min_key": pa.array(cols["min_key"], pa.int64()),
                "kind": pa.array(cols["kind"], pa.int64()),
                "source": pa.array(cols["source"], pa.string()),
                "n_runs": pa.array(cols["n_runs"], pa.int64()),
                "longest": pa.array(cols["longest"], pa.int64()),
                "total": pa.array(cols["total"], pa.int64()),
            }
        )

    summ = s.map_batches(slice_summary, batch_format="pyarrow").to_pandas()
    stats: dict[str, list[int]] = {}  # source -> [n_runs, longest, total]

    def absorb(source: str, n_runs: int, longest: int, total: int) -> None:
        cur = stats.setdefault(source, [0, 0, 0])
        cur[0] += n_runs
        cur[1] = max(cur[1], longest)
        cur[2] += total

    def close(run) -> None:
        if run is not None:
            absorb(run[0], 1, run[1], run[1])

    if summ.empty or "min_key" not in summ.columns:
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "n_runs": pd.Series(dtype=np.int64),
                "longest_run": pd.Series(dtype=np.int64),
                "n_docs": pd.Series(dtype=np.int64),
            }
        )
    summ = summ.sort_values(["min_key", "kind"], kind="mergesort")
    pending = None  # (source, len) of the run crossing into the next slice
    for mk, grp in summ.groupby("min_key", sort=True):
        by_kind = {k: g for k, g in grp.groupby("kind", sort=True)}
        if 3 in by_kind:
            r = by_kind[3].iloc[0]
            if pending is not None and pending[0] == r["source"]:
                pending = (pending[0], pending[1] + int(r["longest"]))
            else:
                close(pending)
                pending = (r["source"], int(r["longest"]))
            continue
        first = by_kind[1].iloc[0]
        if pending is not None and pending[0] == first["source"]:
            close((pending[0], pending[1] + int(first["longest"])))
        else:
            close(pending)
            close((first["source"], int(first["longest"])))
        if 0 in by_kind:
            for _, row in by_kind[0].iterrows():
                absorb(
                    row["source"],
                    int(row["n_runs"]),
                    int(row["longest"]),
                    int(row["total"]),
                )
        last = by_kind[2].iloc[0]
        pending = (last["source"], int(last["longest"]))
    close(pending)

    out = pd.DataFrame(
        [
            (s_name, v[0], v[1], v[2])
            for s_name, v in sorted(stats.items())
        ],
        columns=["source", "n_runs", "longest_run", "n_docs"],
    )
    for c in ("n_runs", "longest_run", "n_docs"):
        out[c] = out[c].astype(np.int64)
    return out


SQL_SHUFFLE_RUN_AUDIT = f"""
WITH t AS (
  SELECT source,
         CAST((((doc_id + {_SEED}) % 4294967296) * 2654435761::HUGEINT)
              % 4294967296 AS BIGINT) AS sk,
         doc_id
  FROM documents
),
o AS (
  SELECT source,
         ROW_NUMBER() OVER (ORDER BY sk, doc_id) AS pos
  FROM t
),
i AS (
  SELECT source,
         pos - ROW_NUMBER() OVER (PARTITION BY source ORDER BY pos)
           AS isl
  FROM o
),
r AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS run
  FROM i GROUP BY source, isl
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MAX(run) AS BIGINT) AS longest_run,
       CAST(SUM(run) AS BIGINT) AS n_docs
FROM r GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# phrase_stats
# ---------------------------------------------------------------------------


def q_phrase_stats(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").astype(str)
        toks = s.str.findall(_ASCII_TOKEN_RE)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.fromiter(
            (max(len(w) - 1, 0) for w in toks), np.int64, count=len(toks)
        )
        if counts.sum() == 0:
            return pa.table(
                {
                    "bigram": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "occ": pa.array([], pa.int64()),
                }
            )
        grams = [
            w[i] + " " + w[i + 1]
            for w in toks
            for i in range(len(w) - 1)
        ]
        g = (
            pd.DataFrame(
                {"bigram": grams, "doc_id": np.repeat(did, counts)}
            )
            .groupby(["bigram", "doc_id"], sort=False)
            .size()
            .reset_index(name="occ")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    per_bigram = hash_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["bigram"],
        lambda df: df.groupby("bigram", sort=False)
        .agg(n_docs=("doc_id", "nunique"), n_occ=("occ", "sum"))
        .reset_index(),
    )
    out = topk(
        per_bigram, ["n_occ", "bigram"], _PHRASE_K, descending=[True, False]
    )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_occ"] = out["n_occ"].astype(np.int64)
    return out[["bigram", "n_docs", "n_occ"]]


SQL_PHRASE_STATS = rf"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '{_ASCII_TOKEN_RE}') AS ws
  FROM documents
),
u AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w
),
bg AS (SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bigram FROM u)
SELECT bigram,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM bg GROUP BY bigram
ORDER BY n_occ DESC, bigram
LIMIT {_PHRASE_K}
"""


ORACLE_QUERIES["shuffle_run_audit"] = (
    q_shuffle_run_audit,
    SQL_SHUFFLE_RUN_AUDIT,
)
ORACLE_QUERIES["phrase_stats"] = (q_phrase_stats, SQL_PHRASE_STATS)
