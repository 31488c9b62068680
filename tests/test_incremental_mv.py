"""Incremental MV refresh (pipelines/mv.py:IncrementalAggView): delta
aggregation over append-only snapshot ranges via read_incremental, full
rebuild when a rewrite voids additivity — result always equals the full
recompute."""

import numpy as np
import pandas as pd
import pytest

from ocel_ocpn_lakehouse_ray.pipelines.mv import IncrementalAggView
from ocel_ocpn_lakehouse_ray.sources.generator import create_image_table, gen_batch
from ocel_ocpn_lakehouse_ray.stages.compaction import run_compaction
from ocel_ocpn_lakehouse_ray.table import LakeTable


def _expected_counts(table) -> pd.DataFrame:
    df = table.to_arrow(columns=["fmt"]).to_pandas()
    return (df.groupby("fmt", as_index=False).size()
            .rename(columns={"size": "n"})
            .sort_values("fmt").reset_index(drop=True))


@pytest.fixture()
def src(tmp_path):
    return create_image_table(str(tmp_path / "src"), 200, num_fragments=5, seed=9)


def test_incremental_refresh_matches_full(src, tmp_path):
    mv = IncrementalAggView(str(tmp_path / "wh"), "fmt_counts", src.root, ["fmt"])
    rep0 = mv.refresh()
    assert rep0["mode"] == "full" and rep0["source_version"] == src.version

    t2 = src.append_arrow(gen_batch(np.arange(10**6, 10**6 + 60), 9))
    rep1 = mv.refresh()
    assert rep1["mode"] == "incremental"
    assert rep1["source_version"] == t2.version

    got = mv.read().to_pandas().sort_values("fmt").reset_index(drop=True)
    exp = _expected_counts(t2)
    pd.testing.assert_frame_equal(
        got.astype({"n": "int64"}), exp.astype({"n": "int64"}))


def test_rewrite_forces_full_rebuild(src, tmp_path):
    mv = IncrementalAggView(str(tmp_path / "wh"), "fmt_counts", src.root, ["fmt"])
    mv.refresh()
    t2, _ = run_compaction(
        src.append_arrow(gen_batch(np.arange(10**6, 10**6 + 30), 9)),
        job_id="imv-compact")
    rep = mv.refresh()
    assert rep["mode"] == "full"           # compact in range voids additivity
    got = mv.read().to_pandas().sort_values("fmt").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n": "int64"}),
        _expected_counts(t2).astype({"n": "int64"}))


def test_noop_when_source_unchanged(src, tmp_path):
    mv = IncrementalAggView(str(tmp_path / "wh"), "fmt_counts", src.root, ["fmt"])
    mv.refresh()
    rep = mv.refresh()
    assert rep["mode"] == "noop"
    # history keeps exactly one refresh commit
    assert len(mv.history()) == 1
