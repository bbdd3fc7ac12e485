"""Wave-60 tests: exact Mann-Whitney AUC and deterministic A/B counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, values, types, users=None):
    n = len(values)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(np.arange(n), unit="m"),
            "user_id": np.asarray(
                users if users is not None else np.arange(n), dtype=np.int64
            ),
            "event_type": types,
            "value": np.asarray(values, dtype=np.float64),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "events.parquet"),
    )


def test_auc_ties_average_rank(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave60 import q_auc_eval

    # pos values [2, 3], neg values [1, 2]: the tie at 2 crosses
    # classes, so average ranks matter.  R1 = 2.5 + 4 = 6.5,
    # r2_pos = 13, u2 = 13 - 2*3 = 7 -> U = 3.5, AUC = 0.875.
    _write_events(
        tmp_path,
        values=[2.0, 3.0, 1.0, 2.0],
        types=["purchase", "purchase", "view", "view"],
    )
    out = q_auc_eval(str(tmp_path))
    assert out.loc[0, "n_pos"] == 2
    assert out.loc[0, "n_neg"] == 2
    assert out.loc[0, "u2"] == 7
    auc = out.loc[0, "u2"] / (2 * out.loc[0, "n_pos"] * out.loc[0, "n_neg"])
    assert auc == 0.875


def test_auc_perfect_separation(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave60 import q_auc_eval

    _write_events(
        tmp_path,
        values=[10.0, 11.0, 12.0, 1.0, 2.0],
        types=["purchase"] * 3 + ["view"] * 2,
    )
    out = q_auc_eval(str(tmp_path))
    # perfect ranking: u2 == 2 * n_pos * n_neg
    assert out.loc[0, "u2"] == 2 * 3 * 2


def test_ab_variants_match_driver_recompute(ray_session, tmp_path):
    from pynomaly_ray.functions.hashing import knuth32
    from pynomaly_ray.pipelines.queries_wave60 import q_ab_test_variants

    rng = np.random.RandomState(3)
    users = rng.randint(0, 40, size=200)
    types = np.where(rng.rand(200) < 0.3, "purchase", "view")
    _write_events(tmp_path, values=np.ones(200), types=list(types), users=users)

    out = q_ab_test_variants(str(tmp_path)).set_index("variant")
    ref = (
        pd.DataFrame({"u": users, "c": (types == "purchase").astype(int)})
        .groupby("u")["c"]
        .max()
        .reset_index()
    )
    ref["variant"] = knuth32(ref["u"].to_numpy(np.int64), 7) % 2
    for v, g in ref.groupby("variant"):
        assert out.loc[v, "n_users"] == len(g)
        assert out.loc[v, "n_converted"] == g["c"].sum()
    assert int(out["n_users"].sum()) == ref["u"].nunique()
