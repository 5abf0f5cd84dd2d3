#!/usr/bin/env python3
"""On-chip f32 torque-error quantification vs the f64 reference path
(VERDICT r2 #4; BASELINE.md torque-parity row; reference torque map
whole_body_controller.cpp:565-568).

Replays the recorded 400 Hz walking trajectory (data/walk_traj_400hz.npz,
the bench headline input) through a controller path and records the
per-step joint torques tau (12,).  The f64 CPU xla path is the
reference-grade baseline (tests/test_parity.py pins it to the C++ chain at
<= 1e-3 N.m); the f32 path — pallas kernels + QPCache on the TPU, or xla
f32 on CPU as the CI proxy — is the production configuration whose torque
error this tool measures.

f64 cannot run on this TPU stack (compiles hang) and f32 is the TPU mode,
so the comparison necessarily spans two processes:

    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/measure_torque_err.py --stage cpu64
    python tools/measure_torque_err.py --stage run        # f32 on the TPU
    python tools/measure_torque_err.py --stage report

Intermediate torques land in data/torque_{cpu64,run}.npz; `report` prints
the per-step error distribution (median / p99 / max over all 200x12
torques), the worst steps, and whether they sit near the trajectory's
contact switches (active-set boundaries: both torque choices feasible, the
documented mechanism for f32/f64 divergence — PERF.md f32-vs-f64 section).
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
TRAJ = os.path.join(ROOT, "data", "walk_traj_400hz.npz")


def replay_torques(dtype_str):
    """Replay the trajectory single-scenario; returns (T, 12) torques +
    per-step max relative KKT."""
    import jax
    import jax.numpy as jnp

    from quadrupedwholebodycontroller_tpu.config import (
        ControllerParams,
        QPSolverParams,
    )
    from quadrupedwholebodycontroller_tpu.control import wbc
    from quadrupedwholebodycontroller_tpu.models import anymal_d_model
    from quadrupedwholebodycontroller_tpu.ops import qp as qpm

    dtype = jnp.float64 if dtype_str == "float64" else jnp.float32
    backend = "pallas" if jax.default_backend() != "cpu" else "xla"
    if dtype_str == "float64":
        backend = "xla"  # f64 is CPU-only on this stack
    model = anymal_d_model(dtype=dtype)
    cp = ControllerParams()
    qp = QPSolverParams()
    # config probes (A/B the parity contribution of individual mechanisms)
    if os.environ.get("TQ_COMPFINAL"):
        import dataclasses

        qp = dataclasses.replace(
            qp, comp_final_refine=int(os.environ["TQ_COMPFINAL"])
        )
    if os.environ.get("TQ_ROUNDS"):
        import dataclasses

        qp = dataclasses.replace(
            qp, polish_rounds=int(os.environ["TQ_ROUNDS"])
        )
    traj = np.load(TRAJ)
    # B=8 identical scenarios: the pallas kernels tile at the production
    # batch-minor layout; scenario 0 is recorded
    B = 8
    xs_obs = wbc.RobotObservation(
        **{k: jnp.asarray(traj[k], dtype)
           for k in ("base_R", "base_p", "base_vel", "q", "qd")}
    )
    xs_ref = wbc.Reference(
        **{k: jnp.asarray(traj[k], dtype)
           for k in ("com_pose", "com_vel", "com_acc", "swing_pos",
                     "swing_vel", "swing_acc", "contacts")}
    )
    xs_new = jnp.asarray(traj["ref_is_new"])
    cache = qpm.make_cache(B, 42, 70, qp, dtype) if backend == "pallas" else None
    carry = jax.tree.map(lambda x: jnp.stack([x] * B), wbc.init_carry(dtype))

    @jax.jit
    def run(carry, cache, valid):
        def body(cc, xs):
            c, cache = cc
            o_t, r_t, new_t = xs
            obs_b = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (B,) + x.shape), o_t
            )
            ref_b = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (B,) + x.shape), r_t
            )
            if cache is not None:
                out, c2, cache2 = wbc.wbc_step_batched(
                    model, cp, qp, obs_b, ref_b, c, new_t, backend,
                    cache, valid,
                )
            else:
                out, c2 = wbc.wbc_step_batched(
                    model, cp, qp, obs_b, ref_b, c, new_t, backend
                )
                cache2 = None
            return (c2, cache2), (out.tau[0], out.grf[0],
                                  jnp.max(out.qp_info.kkt_residual))
        (c2, cache2), (taus, grfs, kkts) = jax.lax.scan(
            body, (carry, cache), (xs_obs, xs_ref, xs_new)
        )
        return taus, grfs, kkts

    taus, grfs, kkts = run(carry, cache, False)
    return (np.asarray(taus, np.float64), np.asarray(grfs, np.float64),
            np.asarray(kkts, np.float64))


def report():
    ref = np.load(os.path.join(ROOT, "data", "torque_cpu64.npz"))
    f32 = np.load(os.path.join(ROOT, "data", "torque_run.npz"))
    traj = np.load(TRAJ)
    err = np.abs(f32["tau"] - ref["tau"])  # (T, 12)
    step_err = err.max(axis=1)
    # contact-switch steps (the active-set boundaries)
    c = traj["contacts"]
    new = traj["ref_is_new"]
    switch = np.zeros(len(c), bool)
    prev = c[0]
    for t in range(len(c)):
        if new[t] and np.any(c[t] != prev):
            switch[t] = True
            prev = c[t]
    near_switch = np.zeros_like(switch)
    for t in np.flatnonzero(switch):
        near_switch[max(0, t - 2):t + 8] = True
    worst = np.argsort(-step_err)[:5]
    stats = {
        "metric": "f32_torque_error_Nm_vs_f64",
        "backend_f32": str(f32["backend"]),
        "median": float(np.median(err)),
        "p99": float(np.percentile(err, 99)),
        "max": float(err.max()),
        "median_step_max": float(np.median(step_err)),
        "steps_over_1e-3": int(np.sum(step_err > 1e-3)),
        "steps_over_1e-1": int(np.sum(step_err > 1e-1)),
        "worst_steps": [
            {"t": int(t), "err": float(step_err[t]),
             "near_contact_switch": bool(near_switch[t])}
            for t in worst
        ],
        "max_err_off_switch": float(step_err[~near_switch].max()),
        "grf_max_err_N": float(np.abs(f32["grf"] - ref["grf"]).max()),
        "kkt_max_f32": float(f32["kkt"].max()),
        "kkt_max_f64": float(ref["kkt"].max()),
    }
    print(json.dumps(stats))
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["cpu64", "run", "report"],
                    required=True)
    args = ap.parse_args()
    if args.stage == "report":
        report()
        return
    import jax

    dtype = "float64" if args.stage == "cpu64" else "float32"
    if args.stage == "cpu64":
        assert jax.default_backend() == "cpu", (
            "run the cpu64 stage with JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS="
        )
        jax.config.update("jax_enable_x64", True)
    tau, grf, kkt = replay_torques(dtype)
    out = os.path.join(ROOT, "data", f"torque_{args.stage}.npz")
    np.savez(out, tau=tau, grf=grf, kkt=kkt,
             backend=jax.default_backend())
    print(json.dumps({"stage": args.stage, "saved": out,
                      "kkt_max": float(kkt.max())}))


if __name__ == "__main__":
    main()
