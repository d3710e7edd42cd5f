"""Readiness harness for the real-data baselines (VERDICT r3 #8):
scripts/reference_data_check.py must enumerate exactly the CSVs the
reproduction commands consume, flag missing/invalid files, and emit
stand-ins that pass its own validation."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import reference_data_check as rdc  # noqa: E402


def test_expected_files_match_provider_consumption():
    # tsfragment: 4 table families x 3 lengths x (mix-train + eval) roots
    tsf = rdc.expected_files("tsfragment", "./D")
    assert len(tsf) == 24
    assert ("./D/TSFragment-600K/embedding_cleaned_ETTh1_24.csv",
            "mix-train") in tsf
    assert ("./D/our/embedding_cleaned_traffic_96.csv", "infer/eval") in tsf
    # mmd: 6 domains x 3 lengths, single root (dataloader.py:100-103)
    mmd = rdc.expected_files("mmd", "./D")
    assert len(mmd) == 18
    assert all(p.startswith("./D/MMD/") for p, _ in mmd)
    sushi = rdc.expected_files("sushi", "./D")
    assert sushi == [("./D/SUSHI/embedding_cleaned_SUSHI.csv",
                      "train+eval")]


def test_standins_pass_validation_and_missing_detected(tmp_path):
    root = str(tmp_path / "Data")
    rc = rdc.main(["--data_root", root, "--baseline", "all"])
    assert rc == 1  # nothing present yet
    rdc.make_standins(root, sushi_t=32, n=6, seed=0)
    rc = rdc.main(["--data_root", root, "--baseline", "all"])
    assert rc == 0
    # corrupt one file -> schema error surfaces, nonzero exit
    bad = os.path.join(root, "SUSHI", "embedding_cleaned_SUSHI.csv")
    with open(bad, "w") as f:
        f.write("a,b\n1,2\n")
    assert rdc.main(["--data_root", root, "--baseline", "sushi"]) == 1


def test_cli_json_line(tmp_path, capsys):
    root = str(tmp_path / "Data")
    rdc.make_standins(root, sushi_t=32, n=6, seed=1)
    rc = rdc.main(["--data_root", root, "--baseline", "mmd"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(out)
    assert rc == 0 and rep["ok"]
    assert rep["baselines"]["mmd"]["present"] == 18


def test_standin_embedding_styles(tmp_path):
    # MMD/SUSHI stand-ins use the comma style, TSFragment the space style
    # (datafactory/dataset.py:84-96 parses both; the checker must too)
    root = str(tmp_path / "Data")
    rdc.make_standins(root, sushi_t=32, n=4, seed=2)
    import pandas as pd
    mmd = pd.read_csv(os.path.join(root, "MMD",
                                   "embedding_cleaned_Climate_24.csv"),
                      nrows=1)
    assert "," in mmd["TextEmbedding"].iloc[0]
    tsf = pd.read_csv(os.path.join(
        root, "TSFragment-600K", "embedding_cleaned_ETTh1_24.csv"), nrows=1)
    assert "," not in tsf["TextEmbedding"].iloc[0]
    assert rdc.schema_check(os.path.join(
        root, "MMD", "embedding_cleaned_Climate_24.csv")) is None


@pytest.mark.parametrize("mode", ["tsfragment", "sushi", "mmd", "all"])
def test_shell_harness_validates_before_running(mode, tmp_path):
    """Full modes must fail fast (data check, exit 1) on an empty root
    rather than crash deep in a loader."""
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "reproduce_reference.sh"),
         mode, str(tmp_path / "nonexistent")],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "PALLAS_AXON_POOL_IPS": "",
             "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 1, r.stdout + r.stderr
    assert '"ok": false' in r.stdout


def test_gate_bucket_schedule():
    """Step-allocation study knob (VERDICT r3 #6): ratios reallocate the
    fixed budget across buckets without changing its size."""
    import quality_gate as qg
    assert qg.build_bucket_schedule((48, 96, 192), "") == [48, 96, 192]
    assert qg.build_bucket_schedule((48, 96, 192), "1,1,2") == \
        [48, 96, 192, 192]
    sched = qg.build_bucket_schedule((48, 96, 192), "2,2,1")
    assert sched == [48, 48, 96, 96, 192]
    # over one cycle the allocation matches the ratios exactly
    assert [sched.count(L) for L in (48, 96, 192)] == [2, 2, 1]
    with pytest.raises(ValueError):
        qg.build_bucket_schedule((48, 96, 192), "1,2")
    with pytest.raises(ValueError):
        qg.build_bucket_schedule((48, 96, 192), "1,0,2")
