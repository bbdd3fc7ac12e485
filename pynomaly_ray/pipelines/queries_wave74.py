"""Wave-74 query: exact benchmark decontamination (substring probes).

``decontaminate_exact`` — the oracle-certified exact path beside the
rows-only Bloom decontaminator (`decontaminate_bloom`): a small
benchmark-derived probe set (25-codepoint spans lifted from 10
deterministically-picked docs) is broadcast once, and every document
is scanned for verbatim containment of each probe — the
training-data-leaks-the-eval-set check every pretraining pipeline
runs before training.  Output: (doc_id, n_hits) for contaminated docs,
n_hits = how many DISTINCT probes the doc contains.

Engine shape: probes ride a ``ray.put`` broadcast (read once per task,
never re-shipped per batch); the scan is one vectorized Arrow
``match_substring`` pass per probe over each batch (probe count is
benchmark-sized — tens to thousands — while the corpus side streams);
no shuffle at all, a pure map + pruned-column read.  At 100 TB this is
a single map-only pass, the cheapest possible shape.

Certification: the probe set is persisted as a surface; DuckDB re-runs
containment with ``CONTAINS`` against the ORIGINAL documents view and
counts the same distinct-probe hits — certifying the broadcast scan
end-to-end (probe selection is engine-chosen scaffolding; the operator
under test is the containment scan + count).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq

_NPROBES = 10
_SPAN_OFF = 9  # 0-based codepoint offset (SQL SUBSTR position 10)
_SPAN_LEN = 25


def q_decontaminate_exact(sf_dir: str):
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as papq

    import ray

    from pynomaly_ray.pipelines.engine_queries import _surface_dir

    # deterministic probe picks spread over the id range
    meta = papq.read_metadata(os.path.join(sf_dir, "documents.parquet"))
    n = meta.num_rows
    step = max(n // _NPROBES, 1)
    pids = [int(i * step) for i in range(_NPROBES)]
    pt = papq.ParquetDataset(
        os.path.join(sf_dir, "documents.parquet"),
        filters=pads.field("doc_id").isin(pids),
    ).read(columns=["text"])
    spans = pc.utf8_slice_codeunits(
        pt["text"], _SPAN_OFF, _SPAN_OFF + _SPAN_LEN
    )
    probes = sorted({s.as_py() for s in spans if s.is_valid})

    surf = _surface_dir("decontam_exact")
    gdir = os.path.join(surf, "grams")
    os.makedirs(gdir, exist_ok=True)
    papq.write_table(
        pa.table({"gram": pa.array(probes, pa.string())}),
        os.path.join(gdir, "grams.parquet"),
    )

    probes_ref = ray.put(probes)

    def scan(t: pa.Table, _p=probes_ref) -> pa.Table:
        import ray as _ray

        ps = _ray.get(_p)
        hits = np.zeros(t.num_rows, dtype=np.int64)
        for g in ps:
            m = pc.match_substring(t["text"], g)
            hits += m.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = hits > 0
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(keep)),
                "n_hits": pa.array(hits[keep], pa.int64()),
            }
        )

    out = (
        _pq(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(scan, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame(
            {
                "doc_id": pd.Series(dtype=np.int64),
                "n_hits": pd.Series(dtype=np.int64),
            }
        )
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_DECONTAMINATE_EXACT = """
WITH g AS (
  SELECT DISTINCT gram
  FROM read_parquet('/tmp/pnr_oracle_surface/decontam_exact/grams/*.parquet')
)
SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM documents d JOIN g ON CONTAINS(d.text, g.gram)
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


ORACLE_QUERIES["decontaminate_exact"] = (
    q_decontaminate_exact,
    SQL_DECONTAMINATE_EXACT,
)
