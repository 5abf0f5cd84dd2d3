"""The driver-facing bench contract: bench.py must print one JSON line with
the agreed keys, in both modes, and the packaged replay trajectory must be
the production-shaped workload the headline claims (evolving states,
planner publish ticks, contact switches)."""
import io
import json
import os
import sys
from contextlib import redirect_stdout

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)


def test_replay_trajectory_integrity():
    d = np.load(os.path.join(REPO, "data", "walk_traj_400hz.npz"))
    T = d["base_R"].shape[0]
    assert T >= 200
    for k in ("base_p", "base_vel", "q", "qd", "com_pose", "swing_pos",
              "contacts", "ref_is_new"):
        assert d[k].shape[0] == T, k
    # genuinely evolving states
    assert np.abs(np.diff(d["q"], axis=0)).max() > 1e-4
    # planner publishes at 100 Hz over the 400 Hz loop
    assert T // 5 <= d["ref_is_new"].sum() <= T // 3
    # at least one contact switch inside the window (the warm-path stressor)
    switches = (np.abs(np.diff(d["contacts"], axis=0)).sum(axis=1) > 0).sum()
    assert switches >= 1
    # rotations stay orthonormal (both engines assume SO(3))
    R = d["base_R"]
    err = np.abs(R @ np.swapaxes(R, 1, 2) - np.eye(3)).max()
    assert err < 1e-5


def test_bench_json_contract(monkeypatch):
    monkeypatch.setenv("QWBC_BENCH_BATCH", "2")
    monkeypatch.setenv("QWBC_BENCH_REPS", "1")
    import bench

    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    line = [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["metric"] == "wbc_qp_solves_per_s"
    assert out["unit"] == "solves/s/chip"
    assert out["mode"] == "evolving"
    assert out["value"] > 0 and np.isfinite(out["vs_baseline"])
    assert np.isfinite(out["max_kkt"]) and out["max_kkt"] < 0.1
