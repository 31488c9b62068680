"""Predicate UPDATE (stages/update.py): vectorized SET on matching rows,
untouched rows byte-identical, pruning, failpoint resume."""

import pyarrow.compute as pc
import pytest

from ocel_ocpn_lakehouse_ray.sources.generator import create_image_table
from ocel_ocpn_lakehouse_ray.stages.update import run_update
from ocel_ocpn_lakehouse_ray.table import LakeTable


@pytest.fixture()
def table(tmp_path):
    return create_image_table(str(tmp_path / "t"), 300, num_fragments=10, seed=17)


def test_update_set_and_prefix_exact(table):
    before = table.to_arrow(columns=["image_id", "fmt", "caption", "w"])
    n_png = before.filter(pc.equal(before["fmt"], "png")).num_rows
    assert n_png > 0

    t2, rep = run_update(
        table,
        [{"column": "fmt", "op": "eq", "value": "png"}],
        [{"column": "caption", "prefix": "[png] "},
         {"column": "w", "scale": 2}],
        job_id="upd-1")
    assert rep["updated"] == n_png
    after = t2.to_arrow(columns=["image_id", "fmt", "caption", "w"])
    a = after.to_pandas().set_index("image_id").sort_index()
    b = before.to_pandas().set_index("image_id").sort_index()
    png = b["fmt"] == "png"
    assert (a.loc[png, "caption"] == "[png] " + b.loc[png, "caption"]).all()
    assert (a.loc[png, "w"] == 2 * b.loc[png, "w"]).all()
    # non-matching rows untouched
    assert (a.loc[~png, "caption"] == b.loc[~png, "caption"]).all()
    assert (a.loc[~png, "w"] == b.loc[~png, "w"]).all()
    assert t2.manifest.total_rows == 300
    # snapshot isolation
    assert LakeTable.load(table.root,
                          version=table.version).manifest.total_rows == 300


def test_update_no_match_no_commit(table):
    t2, rep = run_update(
        table, [{"column": "w", "op": "eq", "value": -1}],
        [{"column": "caption", "set": "x"}], job_id="upd-none")
    assert rep["updated"] == 0 and t2.version == table.version


def test_update_failpoint_resume(table):
    pred = [{"column": "h", "op": "between", "lo": 32, "hi": 64}]
    sets = [{"column": "caption", "set": "redacted"}]
    with pytest.raises(Exception):
        run_update(table, pred, sets, job_id="upd-r", failpoint=0)
    t2, rep = run_update(table, pred, sets, job_id="upd-r")
    got = t2.to_arrow(columns=["h", "caption"]).to_pandas()
    m = (got["h"] >= 32) & (got["h"] <= 64)
    assert rep["updated"] == int(m.sum()) > 0
    assert (got.loc[m, "caption"] == "redacted").all()
    assert not (got.loc[~m, "caption"] == "redacted").any()
