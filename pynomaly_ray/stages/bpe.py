"""Distributed BPE (byte-pair-encoding) vocabulary training.

No analogue in the reference (PyNomaly is a scorer, not a tokenizer) —
this is engine surface for the tokens axis: building the tokenizer that
produces the pre-tokenized sequence tables the validation pipeline
consumes.

Industrial shape (the one HuggingFace tokenizers / SentencePiece use,
re-expressed Ray-Data-first):

1. ONE distributed pass over the corpus builds the ``(word, freq)``
   histogram — map-side ``value_counts`` partials, then a keyed
   ``hash_aggregate`` exchange.  After this pass the corpus is never
   touched again: merge rounds operate on the histogram, whose row
   count is the DISTINCT-word count (Zipf: at 100 TB the corpus has
   ~10^11 words but ~10^8 distinct ones — a 1000x reduction before the
   iterative part starts).
2. Merge rounds.  Size switch (same pattern as
   ``functions/graph.py::connected_components``): histograms at or
   under ``driver_max_words`` rows are pulled to the driver and the
   rounds run as local numpy (a few hundred distinct words — the
   testdata shape — costs microseconds per round); above the switch
   each round is a distributed pair-count exchange over the histogram
   dataset (map-side ``np.add.at`` partials keyed on the packed
   ``left<<32|right`` pair, per-bucket top-1, driver picks the global
   argmax — only ``num_buckets`` rows ever reach the driver), then a
   broadcast merge application ``map_batches``.  Each round
   materializes the (histogram-sized, NOT corpus-sized) symbol table so
   lineage does not re-run all prior rounds.

Determinism: the merged pair each round is max count, ties broken by
smallest ``(left_id, right_id)`` — a single int64 comparison on the
packed pair key, identical on the driver-local and distributed paths.
Symbol ids: initial symbols are unicode codepoints; merge ``rank r``
(0-based) creates id ``MERGE_ID_BASE + r``, so ids are deterministic
across paths and runs.

Merge application is leftmost-first non-overlapping (the classic BPE
rule: ``aa`` merged in ``aaa`` consumes positions 0-1, not 1-2),
vectorized: overlapping candidates are necessarily CONSECUTIVE flat
positions, so keeping the even-indexed candidates within each
consecutive run is exactly leftmost-first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import hash_aggregate

# Merged symbols start here — far above any unicode codepoint
# (0x10FFFF), so initial and merged ids never collide.
MERGE_ID_BASE = 1 << 21

_WORD_RE = r"[^ \t\n\r\f\v]+"


# ---------------------------------------------------------------- kernels


def _flatten_words(words) -> tuple[np.ndarray, np.ndarray]:
    """list[str] -> (flat codepoint array, int64 offsets len n+1)."""
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=len(words))
    offsets = np.zeros(len(words) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    joined = "".join(words)
    flat = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    return flat, offsets


def _pair_keys(
    flat: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Packed int64 keys ``left<<32|right`` for every within-word
    adjacent position, plus the word index of each position."""
    n = len(flat)
    if n < 2:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    valid = np.ones(n - 1, dtype=bool)
    # positions whose successor starts a new word are not pairs
    starts = offsets[1:-1]
    valid[starts - 1] = False
    pos = np.flatnonzero(valid)
    keys = (flat[pos] << np.int64(32)) | flat[pos + 1]
    word_idx = np.searchsorted(offsets, pos, side="right") - 1
    return keys, word_idx


def pair_counts(
    flat: np.ndarray, offsets: np.ndarray, freq: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(unique packed pair keys, int64 summed weights) — exact integer
    accumulation (np.add.at, never float bincount weights)."""
    keys, word_idx = _pair_keys(flat, offsets)
    if len(keys) == 0:
        return keys, np.empty(0, dtype=np.int64)
    uniq, inv = np.unique(keys, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sums, inv, freq[word_idx])
    return uniq, sums


def apply_merge(
    flat: np.ndarray,
    offsets: np.ndarray,
    left: int,
    right: int,
    new_id: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Replace leftmost-first non-overlapping (left,right) with new_id."""
    n = len(flat)
    if n < 2:
        return flat, offsets
    cand = (flat[:-1] == left) & (flat[1:] == right)
    starts = offsets[1:-1]
    cand[starts - 1] = False
    pos = np.flatnonzero(cand)
    if len(pos) == 0:
        return flat, offsets
    # overlapping candidates are consecutive positions; keep the
    # even-indexed ones within each consecutive run = leftmost-first
    new_run = np.empty(len(pos), dtype=bool)
    new_run[0] = True
    new_run[1:] = pos[1:] != pos[:-1] + 1
    run_ids = np.cumsum(new_run) - 1
    run_starts = np.flatnonzero(new_run)
    idx_in_run = np.arange(len(pos), dtype=np.int64) - run_starts[run_ids]
    keep = pos[idx_in_run % 2 == 0]
    out = flat.copy()
    out[keep] = new_id
    drop_mask = np.zeros(n, dtype=bool)
    drop_mask[keep + 1] = True
    out = out[~drop_mask]
    # shift offsets by the number of dropped positions before each word
    word_of_keep = np.searchsorted(offsets, keep, side="right") - 1
    drops_per_word = np.zeros(len(offsets) - 1, dtype=np.int64)
    np.add.at(drops_per_word, word_of_keep, 1)
    new_offsets = offsets.copy()
    new_offsets[1:] -= np.cumsum(drops_per_word)
    return out, new_offsets


def _best_pair(keys: np.ndarray, cnts: np.ndarray) -> tuple[int, int] | None:
    """(packed_key, count) of the max-count pair, ties -> smallest key."""
    if len(keys) == 0:
        return None
    top = cnts.max()
    cand = keys[cnts == top]
    return int(cand.min()), int(top)


# ------------------------------------------------------------- histogram


def word_histogram(docs_ds, text_col: str = "text"):
    """documents -> Dataset[(word, freq)] via one keyed exchange."""

    def partial(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().fillna("")
        counts = s.str.findall(_WORD_RE).explode().dropna().value_counts()
        return pa.Table.from_pydict(
            {
                "word": counts.index.to_numpy(dtype=object),
                "freq": counts.to_numpy(dtype=np.int64),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("word", sort=False)["freq"].sum().reset_index()

    return hash_aggregate(
        docs_ds.map_batches(partial, batch_format="pyarrow"), ["word"], merge
    )


# ---------------------------------------------------------------- training


def _train_rounds_local(
    flat: np.ndarray,
    offsets: np.ndarray,
    freq: np.ndarray,
    num_merges: int,
) -> list[tuple[int, int, int]]:
    """Driver-local merge rounds. Returns [(left, right, count), ...]."""
    merges: list[tuple[int, int, int]] = []
    for r in range(num_merges):
        keys, cnts = pair_counts(flat, offsets, freq)
        best = _best_pair(keys, cnts)
        if best is None or best[1] <= 0:
            break
        key, cnt = best
        left, right = key >> 32, key & 0xFFFFFFFF
        merges.append((int(left), int(right), int(cnt)))
        flat, offsets = apply_merge(
            flat, offsets, left, right, MERGE_ID_BASE + r
        )
    return merges


def _train_rounds_distributed(hist_ds, num_merges: int):
    """Merge rounds as pair-count exchanges over the histogram dataset.

    Each round ships only per-bucket top-1 rows to the driver; the
    merge itself is applied by a broadcast ``map_batches`` (the chosen
    pair rides the closure — two ints, no ray.put needed).  The symbol
    table is materialized per round (histogram-sized) so round r+1's
    lineage does not replay rounds 1..r.
    """
    import pyarrow.compute as pc  # noqa: F401

    def _syms_table(
        flat: np.ndarray, offsets: np.ndarray, freq: np.ndarray
    ) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "syms": pa.LargeListArray.from_arrays(
                    pa.array(offsets, type=pa.int64()),
                    pa.array(flat, type=pa.int64()),
                ),
                "freq": freq,
                "n_syms": np.diff(offsets),
            }
        )

    def to_syms(batch: pa.Table) -> pa.Table:
        words = batch["word"].to_pylist()
        flat, offsets = _flatten_words(words)
        freq = batch["freq"].to_pandas().to_numpy(dtype=np.int64)
        return _syms_table(flat, offsets, freq)

    ds = hist_ds.map_batches(to_syms, batch_format="pyarrow").materialize()
    merges: list[tuple[int, int, int]] = []

    def batch_arrays(batch: pa.Table):
        col = batch["syms"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # flatten() honours slicing; rebuild offsets from value lengths
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        lens = col.value_lengths().to_numpy(zero_copy_only=False)
        offs = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        freq = batch["freq"].to_numpy(zero_copy_only=False).astype(np.int64)
        return flat, offs, freq

    for r in range(num_merges):

        def partial(batch: pa.Table) -> pa.Table:
            flat, offs, freq = batch_arrays(batch)
            keys, cnts = pair_counts(flat, offs, freq)
            return pa.Table.from_pydict({"pair": keys, "cnt": cnts})

        def top1(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("pair", sort=False)["cnt"].sum().reset_index()
            g = g.sort_values(
                ["cnt", "pair"], ascending=[False, True], kind="mergesort"
            )
            return g.head(1)

        tops = hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"), ["pair"], top1
        ).to_pandas()
        if tops.empty:
            break
        tops = tops.sort_values(
            ["cnt", "pair"], ascending=[False, True], kind="mergesort"
        )
        key, cnt = int(tops.iloc[0]["pair"]), int(tops.iloc[0]["cnt"])
        if cnt <= 0:
            break
        left, right = key >> 32, key & 0xFFFFFFFF
        merges.append((int(left), int(right), int(cnt)))
        new_id = MERGE_ID_BASE + r

        def apply(batch: pa.Table, _l=left, _r=right, _n=new_id) -> pa.Table:
            flat, offs, freq = batch_arrays(batch)
            flat2, offs2 = apply_merge(flat, offs, _l, _r, _n)
            return _syms_table(flat2, offs2, freq)

        ds = ds.map_batches(apply, batch_format="pyarrow").materialize()
    return merges


def sym_to_str(merges: list[tuple[int, int, int]]) -> dict[int, str]:
    """id -> surface string map covering all ids the merge list uses."""
    out: dict[int, str] = {}

    def expand(sym: int) -> str:
        if sym < MERGE_ID_BASE:
            return chr(sym)
        if sym in out:
            return out[sym]
        left, right, _ = merges[sym - MERGE_ID_BASE]
        s = expand(left) + expand(right)
        out[sym] = s
        return s

    for r, (left, right, _cnt) in enumerate(merges):
        out[MERGE_ID_BASE + r] = expand(left) + expand(right)
    return out


def train_bpe(
    docs_ds,
    num_merges: int,
    text_col: str = "text",
    driver_max_words: int = 200_000,
) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges from a documents dataset.

    Returns a DataFrame (rank:int64, left:str, right:str, left_id,
    right_id, new_id, pair_count) — ranks are 0-based merge order.
    """
    hist = word_histogram(docs_ds, text_col=text_col)
    n_words = hist.count()
    if n_words <= driver_max_words:
        df = hist.to_pandas()
        if df.empty:
            merges: list[tuple[int, int, int]] = []
        else:
            # canonical word order so flat layout is deterministic
            df = df.sort_values("word", kind="mergesort")
            flat, offsets = _flatten_words(df["word"].tolist())
            freq = df["freq"].to_numpy(dtype=np.int64)
            merges = _train_rounds_local(flat, offsets, freq, num_merges)
    else:
        merges = _train_rounds_distributed(hist, num_merges)
    names = sym_to_str(merges)

    def name(sym: int) -> str:
        return chr(sym) if sym < MERGE_ID_BASE else names[sym]

    return pd.DataFrame(
        {
            "rank": np.arange(len(merges), dtype=np.int64),
            "left": [name(m[0]) for m in merges],
            "right": [name(m[1]) for m in merges],
            "left_id": np.array([m[0] for m in merges], dtype=np.int64),
            "right_id": np.array([m[1] for m in merges], dtype=np.int64),
            "new_id": MERGE_ID_BASE
            + np.arange(len(merges), dtype=np.int64),
            "pair_count": np.array([m[2] for m in merges], dtype=np.int64),
        }
    )


# ---------------------------------------------------------------- encoding


class BpeEncoder:
    """Actor-pool encode stage: applies a learned merge list to the
    ``text`` column, emitting per-doc piece stats.

    Merge list rides the constructor ONCE PER ACTOR (the list is tiny;
    at real scale it would be ``ray.put`` once and fetched here).  Per
    batch, only the DISTINCT words are encoded (word-salad corpora and
    natural language both repeat heavily inside a batch), then stats
    are scattered back to documents.
    """

    def __init__(self, merges: list[tuple[int, int, int]]):
        self.merges = [
            (int(l), int(r), MERGE_ID_BASE + rank)
            for rank, (l, r, *_rest) in enumerate(merges)
        ]

    def encode_words(self, words: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """distinct words -> (pieces per word, piece-id sum per word)."""
        if not words:
            z = np.empty(0, dtype=np.int64)
            return z, z
        flat, offsets = _flatten_words(words)
        for left, right, new_id in self.merges:
            flat, offsets = apply_merge(flat, offsets, left, right, new_id)
        n_pieces = np.diff(offsets)
        sums = np.zeros(len(words), dtype=np.int64)
        word_idx = np.searchsorted(
            offsets, np.arange(len(flat)), side="right"
        ) - 1
        np.add.at(sums, word_idx, flat)
        return n_pieces, sums

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = df["text"].fillna("").str.findall(_WORD_RE)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        flat_words = [w for lst in toks for w in lst]
        uniq, inv = np.unique(np.array(flat_words, dtype=object), return_inverse=True)
        n_pieces_u, sums_u = self.encode_words(list(uniq))
        doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), lens)
        n_pieces = np.zeros(len(df), dtype=np.int64)
        piece_sum = np.zeros(len(df), dtype=np.int64)
        if len(doc_idx):
            np.add.at(n_pieces, doc_idx, n_pieces_u[inv])
            np.add.at(piece_sum, doc_idx, sums_u[inv])
        out = {"n_words": lens, "n_pieces": n_pieces, "piece_sum": piece_sum}
        for col in df.columns:
            if col != "text":
                out[col] = df[col].to_numpy()
        return pa.Table.from_pydict(out)
