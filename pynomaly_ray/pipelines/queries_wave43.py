"""Wave-43: distributed BPE tokenizer training (stages/bpe.py).

- ``bpe_first_pairs`` — oracle-checked: the round-1 adjacent
  character-pair counts over the word histogram (top-20, ties by pair).
  This certifies the exact kernel every merge round reuses
  (``pair_counts`` over the flattened symbol arrays) against a DuckDB
  ``generate_series``/``substr`` expansion of the same corpus.
- ``bpe_merges`` — rows-only: the learned merge table for 16 rounds
  (rank, left, right, pair_count).  Multi-round BPE is argmax-per-round
  sequential and not reasonably SQL-expressible; pinned instead by
  pytest equality against an independent pure-Python reference BPE and
  by forced-path equality of the driver-local and distributed trainers
  (tests/test_round5q.py).
- ``bpe_encode`` — rows-only: per-source piece statistics after
  applying the 16 learned merges with the actor-pool ``BpeEncoder``
  (n_words, n_pieces, piece_sum — all integer-exact).  Pinned by
  batch/single parity + conservation pytests.

Scale notes: training touches the corpus exactly once (the word
histogram exchange); merge rounds run over the distinct-word table
(Zipf-collapsed).  Encode is an actor pool whose merge list rides the
constructor once per actor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import hash_aggregate
from pynomaly_ray.pipelines.engine_queries import ENGINE_QUERIES
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq
from pynomaly_ray.stages.bpe import (
    BpeEncoder,
    _flatten_words,
    pair_counts,
    train_bpe,
    word_histogram,
)

_TOKEN_RE = r"[^ \t\n\r\f\v]+"
_FIRST_PAIRS_K = 20
_NUM_MERGES = 16


def q_bpe_first_pairs(sf_dir: str):
    docs = _pq(sf_dir, "documents", ["text"])
    hist = word_histogram(docs)

    def partial(batch: pa.Table) -> pa.Table:
        words = batch["word"].to_pylist()
        freq = batch["freq"].to_pandas().to_numpy(dtype=np.int64)
        flat, offsets = _flatten_words(words)
        keys, cnts = pair_counts(flat, offsets, freq)
        return pa.Table.from_pydict({"pair": keys, "cnt": cnts})

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pair", sort=False)["cnt"].sum().reset_index()
        return g.sort_values(
            ["cnt", "pair"], ascending=[False, True], kind="mergesort"
        ).head(_FIRST_PAIRS_K)

    merged = hash_aggregate(
        hist.map_batches(partial, batch_format="pyarrow"), ["pair"], topk
    ).to_pandas()
    if merged.empty or "pair" not in merged.columns:
        return pd.DataFrame(
            {
                "left_sym": pd.Series(dtype=object),
                "right_sym": pd.Series(dtype=object),
                "cnt": pd.Series(dtype=np.int64),
            }
        )
    merged = merged.sort_values(
        ["cnt", "pair"], ascending=[False, True], kind="mergesort"
    ).head(_FIRST_PAIRS_K)
    pair = merged["pair"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "left_sym": [chr(int(p) >> 32) for p in pair],
            "right_sym": [chr(int(p) & 0xFFFFFFFF) for p in pair],
            "cnt": merged["cnt"].to_numpy(dtype=np.int64),
        }
    )


SQL_BPE_FIRST_PAIRS = rf"""
WITH words AS (
  SELECT word, COUNT(*) AS f FROM (
    SELECT unnest(regexp_extract_all(text, '{_TOKEN_RE}')) AS word
    FROM documents
  ) GROUP BY word
),
pairs AS (
  SELECT substr(word, CAST(i AS INTEGER), 1) AS left_sym,
         substr(word, CAST(i AS INTEGER) + 1, 1) AS right_sym,
         f
  FROM words, unnest(generate_series(1, length(word) - 1)) AS t(i)
  WHERE length(word) >= 2
)
SELECT left_sym, right_sym, CAST(SUM(f) AS BIGINT) AS cnt
FROM pairs GROUP BY left_sym, right_sym
ORDER BY cnt DESC, left_sym, right_sym
LIMIT {_FIRST_PAIRS_K}
"""

ORACLE_QUERIES["bpe_first_pairs"] = (q_bpe_first_pairs, SQL_BPE_FIRST_PAIRS)


def q_bpe_merges(sf_dir: str):
    docs = _pq(sf_dir, "documents", ["text"])
    df = train_bpe(docs, num_merges=_NUM_MERGES)
    return df[["rank", "left", "right", "pair_count"]]


ENGINE_QUERIES["bpe_merges"] = q_bpe_merges


def q_bpe_encode(sf_dir: str):
    docs = _pq(sf_dir, "documents", ["text"])
    merges_df = train_bpe(docs, num_merges=_NUM_MERGES)
    merges = list(
        zip(
            merges_df["left_id"].tolist(),
            merges_df["right_id"].tolist(),
        )
    )
    enc_in = _pq(sf_dir, "documents", ["source", "text"])
    encoded = enc_in.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={"merges": merges},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("source", sort=False)[
                ["n_words", "n_pieces", "piece_sum"]
            ]
            .sum()
            .reset_index()
        )

    out = hash_aggregate(encoded, ["source"], merge).to_pandas()
    if out.empty or "source" not in out.columns:
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "n_words": pd.Series(dtype=np.int64),
                "n_pieces": pd.Series(dtype=np.int64),
                "piece_sum": pd.Series(dtype=np.int64),
            }
        )
    out = out.sort_values("source", kind="mergesort").reset_index(drop=True)
    for c in ("n_words", "n_pieces", "piece_sum"):
        out[c] = out[c].astype(np.int64)
    return out[["source", "n_words", "n_pieces", "piece_sum"]]


ENGINE_QUERIES["bpe_encode"] = q_bpe_encode
