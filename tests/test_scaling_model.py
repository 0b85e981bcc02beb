"""Sanity of the analytical ICI scaling model (tools/scaling_model.py)."""

import json
import subprocess
import sys


def _run(*args):
    out = subprocess.run(
        [sys.executable, "tools/scaling_model.py", "--json", *args],
        capture_output=True, text=True, check=True,
    ).stdout
    return [json.loads(line) for line in out.splitlines()]


def test_infinite_bandwidth_recovers_single_chip_rate():
    rows = _run("--ici-gbps", "1e12", "--chips", "8", "--strategies", "dp,dp+tp2")
    for r in rows:
        # with free comm, every strategy preserves the measured per-chip
        # rate (tp holds MXU efficiency constant by construction)
        assert abs(r["pairs_per_sec_chip"] - 863.5) / 863.5 < 0.01, r
        assert r["comm_ms"] < 0.1, r


def test_dp_weak_scaling_is_monotone_and_bounded():
    rows = _run("--chips", "4,8,64,384", "--strategies", "dp")
    effs = [r["efficiency_pct"] for r in rows]
    assert all(e1 >= e2 for e1, e2 in zip(effs, effs[1:])), effs
    # the design claim: >=85% no-overlap weak scaling for ViT-B/16 dp
    assert effs[-1] > 85.0, effs
    assert all(e <= 100.0 for e in effs), effs
    # global batch grows linearly with chips
    assert rows[-1]["global_batch"] == 88 * 384


def test_fsdp_costs_more_comm_than_dp():
    dp, fsdp = _run("--chips", "64", "--strategies", "dp,fsdp")
    assert fsdp["comm_ms"] > dp["comm_ms"]
    # 3 param collectives vs 2: ratio ~1.5 on the param-dominated part
    assert fsdp["pairs_per_sec_chip"] < dp["pairs_per_sec_chip"]
