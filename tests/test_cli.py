"""CLI (ray job submit entrypoint) smoke tests — each command end-to-end."""

import json

import pytest

from ocel_ocpn_lakehouse_ray import cli


def run_cli(capsys, *argv):
    rc = cli.main(list(argv))
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_full_lifecycle(tmp_path, capsys):
    root = str(tmp_path / "t")
    created = run_cli(capsys, "create", "--root", root, "--rows", "200")
    assert created["rows"] == 200 and created["fragments"] >= 4

    health = run_cli(capsys, "health", "--root", root)
    assert 0 <= health["health_score"] <= 100

    plan = run_cli(capsys, "plan", "--root", root)
    assert plan["schedule"] in ("daily", "weekly", "monthly")

    compacted = run_cli(capsys, "compact", "--root", root, "--job-id", "cli-c")
    assert compacted["rows"] == 200

    clustered = run_cli(capsys, "cluster", "--root", root, "--order", "hilbert",
                        "--job-id", "cli-z")
    assert clustered["rows"] == 200

    verify = run_cli(capsys, "verify", "--root", root, "--rows", "200")
    assert verify["passed"] is True

    merged = run_cli(capsys, "merge", "--root", root, "--job-id", "cli-m",
                     "--source-rows", "200")
    assert merged["inserts"] >= 1

    vm = run_cli(capsys, "verify-merged", "--root", root, "--rows", "200")
    assert vm["passed"] is True and vm["pairs"] == 200 + 200 // 20

    # snapshot isolation: version -1 = parent of latest = pre-merge state
    vs = run_cli(capsys, "verify-snapshot", "--root", root, "--rows", "200",
                 "--version", "-1")
    assert vs["passed"] is True and vs["pairs"] == 200

    fsck = run_cli(capsys, "fsck", "--root", root)
    assert fsck["missing"] == []

    hist = run_cli(capsys, "history", "--root", root)
    ops = [v["operation"] for v in hist["versions"]]
    assert ops[-1] == "merge" and "compact" in ops

    expired = run_cli(capsys, "expire", "--root", root, "--keep-last", "1")
    assert len(expired["expiry"]["expired"]) >= 2
    # expiry keeps only the merge version
    hist2 = run_cli(capsys, "history", "--root", root)
    assert [v["operation"] for v in hist2["versions"]] == ["merge"]


def test_cli_ask_and_refresh_views(tmp_path, capsys):
    wh = str(tmp_path / "wh")
    rep = run_cli(capsys, "refresh-views", "--root", wh,
                  "--sf-dir", "/root/testdata/sf0.001")
    assert "dfg" in rep["last"] and "variants" in rep["last"]
    assert rep["last"]["dfg"]["rows"] > 0

    ans = run_cli(capsys, "ask", "--root", wh,
                  "--sf-dir", "/root/testdata/sf0.001",
                  "--question", "show the top customers")
    assert ans["intent"] == "top_customers" and ans["rows"] == 10


def test_cli_dml_timetravel_export(tmp_path, capsys):
    root = str(tmp_path / "t2")
    run_cli(capsys, "create", "--root", root, "--rows", "150")
    run_cli(capsys, "tag", "--root", root, "--name", "base")

    upd = run_cli(capsys, "update", "--root", root,
                  "--where", '[{"column":"fmt","op":"eq","value":"png"}]',
                  "--set", '[{"column":"caption","prefix":"[p] "}]')
    assert upd["updated"] > 0

    dele = run_cli(capsys, "delete", "--root", root,
                   "--where", '[{"column":"w","op":"eq","value":64}]')
    assert dele["deleted"] > 0

    d = run_cli(capsys, "diff", "--root", root, "--from-version", "1")
    assert d["append_only"] is False
    assert set(d["operations"]) == {"update", "delete"}

    out_dir = str(tmp_path / "shards")
    exp = run_cli(capsys, "export", "--root", root, "--out-dir", out_dir)
    assert exp["rows"] == 150 - dele["deleted"]

    rb = run_cli(capsys, "rollback", "--root", root, "--version", "1")
    assert rb["restored_rows"] == 150

    tags = run_cli(capsys, "tags", "--root", root)
    assert tags["tags"] == {"base": 1}
    run_cli(capsys, "untag", "--root", root, "--name", "base")
    assert run_cli(capsys, "tags", "--root", root)["tags"] == {}


def test_cli_as_of_timestamp_pin(tmp_path, capsys):
    import time

    from ocel_ocpn_lakehouse_ray.table import LakeTable

    root = str(tmp_path / "t3")
    run_cli(capsys, "create", "--root", root, "--rows", "100")
    mark = time.time()
    time.sleep(0.05)
    t = LakeTable.load(root)
    import numpy as np

    from ocel_ocpn_lakehouse_ray.sources.generator import gen_batch

    t.append_arrow(gen_batch(np.arange(10**6, 10**6 + 20), 42))
    # tag resolves the version pinned by --as-of (v1, pre-append)
    out = run_cli(capsys, "tag", "--root", root, "--name", "pre",
                  "--as-of", str(mark))
    assert out["version"] == 1
