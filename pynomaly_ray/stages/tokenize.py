"""Tokenization stage: raw text documents -> the pre-tokenized sequence
table shape (doc_id, tokens:list<int32>, n_tok, source [, partition_id]).

A stateful actor-pool stage: the token->id cache (a deterministic CRC32
hash vocabulary, no external model) is built up per actor in ``__init__``
and amortized across batches.  This is how the engine ingests the
driver's ``documents`` table into its native input shape.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.hashing import salt_of


def token_id(token: str, vocab_size: int) -> int:
    """Deterministic token id: CRC32 of the UTF-8 bytes, folded to vocab."""
    return zlib.crc32(token.encode("utf-8")) % vocab_size


class Tokenizer:
    """documents(doc_id, text, source, ...) -> sequence-table batches.

    Whitespace tokenization + stable CRC32 hashing to [0, vocab) — a
    deterministic stand-in for a BPE vocab (no model downloads in this
    environment), with the real actor-pool plumbing a model-backed
    tokenizer would use.
    """

    # per-actor cache bound: an open vocabulary (the 100 TB case) must
    # not grow actor heaps without limit; past the cap, misses are
    # computed without being stored (hashing stays correct either way)
    _CACHE_CAP = 1_000_000

    def __init__(self, vocab_size: int = 32768, partitions_per_source: int = 1):
        self.vocab_size = vocab_size
        self.partitions_per_source = partitions_per_source
        self.cache: dict[str, int] = {}

    def _ids(self, words: list[str]) -> np.ndarray:
        cache = self.cache
        v = self.vocab_size
        tid_of = token_id  # ONE canonical token->id mapping (tested)
        room = len(cache) < self._CACHE_CAP
        out = np.empty(len(words), dtype=np.int32)
        for i, w in enumerate(words):
            tid = cache.get(w)
            if tid is None:
                tid = tid_of(w, v)
                if room:
                    cache[w] = tid
                    room = len(cache) < self._CACHE_CAP
            out[i] = tid
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"].to_pandas()
        words = text.str.split()
        lengths = words.str.len().fillna(0).astype(np.int64).to_numpy()
        flat: list[str] = []
        for lst in words:
            if lst:
                flat.extend(lst)
        ids = self._ids(flat)
        total = int(lengths.sum())
        if total >= 2**31:  # int32 list offsets would wrap silently
            raise ValueError(
                f"batch holds {total} tokens, beyond int32 list offsets; "
                "lower batch_size (or switch the schema to large_list)"
            )
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(ids, pa.int32())
        )
        doc_id = pa.compute.cast(batch["doc_id"], pa.string())
        source = batch["source"]
        if self.partitions_per_source > 1:
            bucket = salt_of(doc_id, self.partitions_per_source)
            part = pa.array(
                [
                    f"{s}-{b:04d}"
                    for s, b in zip(source.to_pylist(), bucket)
                ],
                pa.string(),
            )
        else:
            part = pa.compute.cast(source, pa.string())
        return pa.table(
            {
                "doc_id": doc_id,
                "tokens": tokens,
                "n_tok": pa.array(lengths.astype(np.int32), pa.int32()),
                "source": source,
                "partition_id": part,
            }
        )
