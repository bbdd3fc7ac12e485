"""Wave-70 tests: simhash banded near-dup is lossless vs brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_simhash_neardup_matches_bruteforce(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave70 import (
        _popcount64,
        q_simhash_neardup,
    )
    from pynomaly_ray.stages.dedup import SimHasher

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(300)]
    texts = [
        " ".join(rng.choice(vocab, 30)) for _ in range(60)
    ]
    # exact duplicates (hamming 0) and light edits (small hamming)
    texts += [texts[0], texts[1], texts[2] + " extra", texts[3] + " x y"]
    ids = [f"d{i:03d}" for i in range(len(texts))]
    df = pd.DataFrame({"doc_id": ids, "text": texts, "source": "s"})
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )

    out = q_simhash_neardup(str(tmp_path))
    got = {(r.doc_a, r.doc_b): r.hamming for r in out.itertuples()}

    sigs = SimHasher().simhash_batch(texts)
    expect = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ham = int(
                _popcount64(
                    np.array(
                        [np.int64(sigs[i]) ^ np.int64(sigs[j])],
                        dtype=np.int64,
                    )
                )[0]
            )
            if ham <= 3:
                a, b = sorted((ids[i], ids[j]))
                expect[(a, b)] = ham

    assert got == expect  # lossless: banding found EXACTLY the <=3 set
    assert any(h == 0 for h in got.values())  # planted exact dups found
