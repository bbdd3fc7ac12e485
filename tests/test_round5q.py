"""Wave-43 tests: distributed BPE training + encode (stages/bpe.py).

The multi-round trainer has no SQL oracle (argmax-per-round is
sequential), so it is pinned here three independent ways:

1. exact merge-list equality against a pure-Python naive BPE written
   in this file (dict-of-lists, O(V * K) scan — shares no code with the
   numpy kernels);
2. forced-path equality: driver-local rounds vs the distributed
   per-round pair-count exchange on the same corpus;
3. encoder invariants: batch/single parity, zero-merge identity,
   codepoint-sum conservation.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from pynomaly_ray.stages.bpe import (
    MERGE_ID_BASE,
    BpeEncoder,
    _flatten_words,
    _train_rounds_local,
    apply_merge,
    pair_counts,
    train_bpe,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------- naive reference


def naive_bpe(word_freq: dict[str, int], k: int):
    """Independent reference: symbols are python lists of ids."""
    seqs = {w: ([ord(c) for c in w], f) for w, f in word_freq.items()}
    merges = []
    for r in range(k):
        counts: dict[tuple[int, int], int] = {}
        for seq, f in seqs.values():
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        top = max(counts.values())
        pair = min(p for p, c in counts.items() if c == top)
        merges.append((pair[0], pair[1], counts[pair]))
        new_id = MERGE_ID_BASE + r
        for w, (seq, f) in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if (
                    i + 1 < len(seq)
                    and seq[i] == pair[0]
                    and seq[i + 1] == pair[1]
                ):
                    out.append(new_id)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = (out, f)
    return merges


def _local_train(word_freq: dict[str, int], k: int):
    ws = sorted(word_freq)
    flat, offs = _flatten_words(ws)
    freq = np.array([word_freq[w] for w in ws], dtype=np.int64)
    return _train_rounds_local(flat, offs, freq, k)


# ------------------------------------------------------------- kernels


def test_apply_merge_leftmost_first_overlap():
    # 'aaaa' with merge (a,a): positions 0-1 and 2-3, never 1-2
    flat, offs = _flatten_words(["aaaa", "aaa", "baaab"])
    out, offs2 = apply_merge(flat, offs, ord("a"), ord("a"), 999)
    words = [out[offs2[i] : offs2[i + 1]].tolist() for i in range(3)]
    assert words[0] == [999, 999]
    assert words[1] == [999, ord("a")]
    assert words[2] == [ord("b"), 999, ord("a"), ord("b")]


def test_pair_counts_respects_word_boundaries():
    flat, offs = _flatten_words(["ab", "ba"])
    keys, cnts = pair_counts(flat, offs, np.array([3, 5], dtype=np.int64))
    got = {(int(k) >> 32, int(k) & 0xFFFFFFFF): int(c) for k, c in zip(keys, cnts)}
    # no ('b','b') pair across the word boundary
    assert got == {(ord("a"), ord("b")): 3, (ord("b"), ord("a")): 5}


def test_pair_counts_single_char_words_empty():
    flat, offs = _flatten_words(["a", "b", "c"])
    keys, cnts = pair_counts(flat, offs, np.ones(3, dtype=np.int64))
    assert len(keys) == 0 and len(cnts) == 0


# ------------------------------------------------- trainer vs reference


def test_local_trainer_matches_naive_reference_random():
    rng = random.Random(7)
    for trial in range(8):
        n = rng.randint(1, 30)
        words = {
            "".join(
                rng.choice("abcdef") for _ in range(rng.randint(1, 8))
            ): rng.randint(1, 40)
            for _ in range(n)
        }
        k = rng.randint(1, 12)
        assert _local_train(words, k) == naive_bpe(dict(words), k), (
            trial,
            words,
            k,
        )


def test_local_trainer_matches_naive_on_corpus(ray_session):
    from pynomaly_ray.pipelines.queries import _pq
    from pynomaly_ray.stages.bpe import word_histogram

    hist = word_histogram(_pq(SF, "documents", ["text"])).to_pandas()
    wf = dict(zip(hist["word"], hist["freq"].astype(int)))
    df = train_bpe(_pq(SF, "documents", ["text"]), num_merges=10)
    ref = naive_bpe(wf, 10)
    got = list(
        zip(
            df["left_id"].tolist(),
            df["right_id"].tolist(),
            df["pair_count"].tolist(),
        )
    )
    assert got == ref


def test_distributed_path_equals_local_path(ray_session):
    from pynomaly_ray.pipelines.queries import _pq

    local = train_bpe(_pq(SF, "documents", ["text"]), num_merges=8)
    dist = train_bpe(
        _pq(SF, "documents", ["text"]), num_merges=8, driver_max_words=0
    )
    pd.testing.assert_frame_equal(
        local.reset_index(drop=True), dist.reset_index(drop=True)
    )


def test_trainer_stops_when_no_pairs_left():
    merges = _local_train({"ab": 5}, 10)
    # 'ab' has one pair; after merging it there is nothing left
    assert merges == [(ord("a"), ord("b"), 5)]


def test_merge_surface_strings():
    from pynomaly_ray.stages.bpe import sym_to_str

    merges = _local_train({"abab": 3}, 3)
    names = sym_to_str(merges)
    # first merge is (a,b) -> 'ab'; second merges 'ab','ab' -> 'abab'
    assert names[MERGE_ID_BASE] == "ab"
    assert names[MERGE_ID_BASE + 1] == "abab"


# ------------------------------------------------------------- encoder


def test_encoder_zero_merges_identity():
    enc = BpeEncoder([])
    n_pieces, sums = enc.encode_words(["abc", "z", "aa"])
    assert n_pieces.tolist() == [3, 1, 2]
    assert sums.tolist() == [
        ord("a") + ord("b") + ord("c"),
        ord("z"),
        2 * ord("a"),
    ]


def test_encoder_applies_merges_in_rank_order():
    # merges: (a,b)->M0 then (M0,c)->M1 ; 'abc' -> single piece M1
    enc = BpeEncoder([(ord("a"), ord("b")), (MERGE_ID_BASE, ord("c"))])
    n_pieces, sums = enc.encode_words(["abc", "ab", "cab"])
    assert n_pieces.tolist() == [1, 1, 2]
    assert sums.tolist() == [
        MERGE_ID_BASE + 1,
        MERGE_ID_BASE,
        ord("c") + MERGE_ID_BASE,
    ]


def test_encoder_batch_single_parity(ray_session):
    import pyarrow as pa

    texts = [
        "ab ab cab abc",
        "",
        "zzz ab",
        "abc abc abc",
    ]
    enc = BpeEncoder([(ord("a"), ord("b")), (MERGE_ID_BASE, ord("c"))])
    batch = pa.table({"doc_id": list(range(4)), "text": texts})
    whole = enc(batch).to_pandas().sort_values("doc_id").reset_index(drop=True)
    singles = pd.concat(
        [
            enc(pa.table({"doc_id": [i], "text": [t]})).to_pandas()
            for i, t in enumerate(texts)
        ]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        whole[["doc_id", "n_words", "n_pieces", "piece_sum"]],
        singles[["doc_id", "n_words", "n_pieces", "piece_sum"]],
    )


def test_encode_query_conservation(ray_session):
    """bpe_encode totals: n_pieces <= total chars, n_words exact."""
    from pynomaly_ray.pipelines.queries_wave43 import q_bpe_encode
    import pyarrow.parquet as pq

    out = q_bpe_encode(SF)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    total_words = sum(len(s.split()) for s in t["text"].to_pylist())
    assert int(out["n_words"].sum()) == total_words
    assert int(out["n_pieces"].sum()) <= sum(
        sum(len(w) for w in s.split()) for s in t["text"].to_pylist()
    )
    assert (out["n_pieces"] >= 0).all()


def test_first_pairs_query_top_is_true_max(ray_session):
    from pynomaly_ray.pipelines.queries_wave43 import q_bpe_first_pairs
    from pynomaly_ray.pipelines.queries import _pq
    from pynomaly_ray.stages.bpe import word_histogram

    got = q_bpe_first_pairs(SF)
    hist = word_histogram(_pq(SF, "documents", ["text"])).to_pandas()
    wf = dict(zip(hist["word"], hist["freq"].astype(int)))
    counts: dict[tuple[str, str], int] = {}
    for w, f in wf.items():
        for a, b in zip(w, w[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + f
    best = max(counts.values())
    assert int(got.iloc[0]["cnt"]) == best
    assert len(got) == min(20, len(counts))
