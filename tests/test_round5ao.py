"""Wave-66 tests: metadata-only layout stats (deleted-data proof,
append-generation coverage, null accounting)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _ds(keys):
    return rd.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()), "x": list(range(len(keys)))})
    )


def test_stats_survive_deleted_data_files(ray_session, tmp_path):
    from pynomaly_ray.sources.sorted_layout import (
        layout_stats,
        load_manifest,
        write_sorted,
        zone_pruned_scan,
    )

    lay = str(tmp_path / "lay")
    write_sorted(_ds([5, 1, 9, 3, 7]), "k", lay, num_partitions=2)
    m = load_manifest(lay)
    for z in m["zones"]:
        os.remove(os.path.join(lay, z["file"]))
    st = layout_stats(lay)  # manifest-only: still answers
    assert st["rows"] == 5
    assert st["key_min"] == 1
    assert st["key_max"] == 9
    assert st["key_nulls"] == 0
    with pytest.raises(Exception):
        zone_pruned_scan(lay).materialize()  # data really is gone


def test_stats_cover_appended_generation_and_nulls(ray_session, tmp_path):
    from pynomaly_ray.sources.sorted_layout import (
        append_sorted,
        layout_stats,
        write_sorted,
    )

    lay = str(tmp_path / "lay")
    write_sorted(_ds([10, 20]), "k", lay, num_partitions=1)
    append_sorted(_ds([1, 40, None]), lay, num_partitions=1)
    st = layout_stats(lay)
    assert st["rows"] == 5
    assert st["key_min"] == 1
    assert st["key_max"] == 40
    assert st["key_nulls"] == 1


def test_stats_refuse_uncommitted_layout(ray_session, tmp_path):
    from pynomaly_ray.sources.sorted_layout import layout_stats

    d = tmp_path / "not_a_layout"
    d.mkdir()
    with pytest.raises(FileNotFoundError):
        layout_stats(str(d))
