#!/usr/bin/env python3
"""Scaling report: solves/s at 1 chip -> 1 host (8 chips) -> N hosts.

BASELINE.md asks for "solves/s efficiency at 1 chip, 1 host, and N >= 2
hosts".  Only one physical chip is reachable in this environment, so the
report combines three honest measurements instead of pretending:

1. measured single-chip throughput (bench.py methodology, when run on TPU);
2. the compiled cross-device communication of the sharded sweep step,
   extracted from the HLO of the real shard_map program on an 8-virtual-
   device mesh — the collectives and their byte counts are what would ride
   ICI/DCN on a pod slice;
3. functional execution of the same program on the virtual mesh
   (tests/test_parallel.py and __graft_entry__.dryrun_multichip cover this
   in CI).

Scenario data-parallelism has no cross-chip term in the solve path — the
only collectives are the SweepMetrics psums (a few scalars per step window)
— so projected efficiency at N devices is communication-bound at
  eff(N) ~ t_compute / (t_compute + t_allreduce(bytes))
with t_allreduce measured in microseconds against compute in tens of ms.

Run:  python tools/scaling_report.py            (CPU: HLO analysis only)
      python tools/scaling_report.py --measure  (TPU: adds 1-chip rate)
"""
import json
import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def collective_inventory(n_devices=8, B=16, T=4):
    """Compile the sharded sweep on an n-device mesh and inventory every
    cross-device op in the optimized HLO (op kind + element count/bytes)."""
    from quadrupedwholebodycontroller_tpu.config import (
        ControllerParams,
        PlannerParams,
        QPSolverParams,
    )
    from quadrupedwholebodycontroller_tpu.models import anymal_d_model
    from quadrupedwholebodycontroller_tpu.parallel import (
        make_mesh,
        shard_batch,
        sharded_sweep_step,
    )
    from quadrupedwholebodycontroller_tpu.sim import SimParams
    from quadrupedwholebodycontroller_tpu.sim.rollout import init_rollout_carry
    from quadrupedwholebodycontroller_tpu.sim.scenario import Scenario

    dtype = jnp.float32
    model = anymal_d_model(dtype=dtype)
    cp, pp, sp = ControllerParams(), PlannerParams(), SimParams(substeps=2)
    qp = QPSolverParams(iterations=10)
    mesh = make_mesh(n_devices)

    carry = init_rollout_carry(model, cp, pp, dtype=dtype)
    bcarry = shard_batch(jax.tree.map(lambda x: jnp.stack([x] * B), carry), mesh)
    cmds = shard_batch(jnp.zeros((B, T, 3), dtype), mesh)
    nom = Scenario.nominal(T, sp.friction, dtype)
    scen = shard_batch(jax.tree.map(lambda x: jnp.stack([x] * B), nom), mesh)

    step = sharded_sweep_step(model, cp, pp, qp, sp, mesh)
    # reach the underlying jitted fn to compile without executing
    lowered = jax.jit(
        lambda c, x, s: step(c, x, s)
    ).lower(bcarry, cmds, scen)
    hlo = lowered.compile().as_text()

    dsize = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1, "bf16": 2}
    coll = []
    for line in hlo.splitlines():
        m = re.search(
            r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
            r"all-to-all)([-\w]*)\(", line
        )
        # async collectives appear as -start/-done pairs: count each pair
        # once (the -start carries the shapes; skip the -done)
        if m and m.group(2).endswith("-done"):
            continue
        if m:
            # shapes like f32[], f32[4,3]{...} on the result
            shapes = re.findall(r"(f32|f64|bf16|s32|u32|pred)\[([\d,]*)\]",
                                line.split("=")[1] if "=" in line else line)
            nbytes = 0
            for ty, dims in shapes:
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                nbytes += n * dsize[ty]
            coll.append({"op": m.group(1), "result_bytes": nbytes})
    return coll, hlo


def measure_allreduce(n_devices, payload_bytes, iters=400):
    """Measured wall time of one psum of `payload_bytes` over the n-device
    mesh (scan-inside-jit amortization).  On the CPU virtual mesh this is a
    shared-memory collective — an over-estimate of the same-byte-count ICI
    all-reduce on a real pod slice (ICI latency is ~us-scale), so any
    efficiency computed from it is a LOWER bound for the real machine."""
    import time

    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    import numpy as np

    mesh = Mesh(np.array(jax.devices()[:n_devices]), ("d",))
    n_floats = max(1, payload_bytes // 4)
    x = jnp.zeros((n_devices, n_floats), jnp.float32)

    @jax.jit
    def run(x):
        def body(c, _):
            # the psum result is axis-invariant; the carry must stay
            # device-varying for scan type agreement
            return jax.lax.pcast(jax.lax.psum(c, "d"), "d", to="varying"), None

        f = shard_map(
            lambda v: jax.lax.scan(body, v[0], None, length=iters)[0][None],
            mesh=mesh, in_specs=P("d"), out_specs=P("d"),
        )
        return f(x)

    run(x).block_until_ready()  # compile
    t0 = time.perf_counter()
    run(x).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    measure = "--measure" in sys.argv
    n = min(8, jax.device_count())
    coll, hlo = collective_inventory(n_devices=n)
    total = sum(c["result_bytes"] for c in coll)
    from collections import Counter

    kinds = Counter(c["op"] for c in coll)
    t_ar = measure_allreduce(n, total)
    report = {
        "mesh_devices": n,
        "collectives_per_sweep_window": dict(kinds),
        "cross_device_bytes_per_sweep_window": total,
        "measured_allreduce_us": round(t_ar * 1e6, 1),
        "allreduce_backend": jax.default_backend(),
        "note": (
            "scenario data-parallel: zero collectives in the per-step solve "
            "path; only the SweepMetrics reduction crosses devices.  The "
            "all-reduce time is measured on THIS process's mesh (CPU shared-"
            "memory unless run on a pod slice) — an over-estimate of the "
            "same bytes on ICI, so the efficiency below is a lower bound."
        ),
    }
    if measure and jax.default_backend() != "cpu":
        # reuse the bench methodology for the single-chip number
        import subprocess

        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if line:
            single = json.loads(line[-1])
            report["single_chip_solves_per_s"] = single["value"]
            # one metrics all-reduce per sweep WINDOW (T steps); use the
            # tune_sweep window length as the amortization unit
            T = 400
            batch = int(os.environ.get("QWBC_BENCH_BATCH", "8192"))
            t_window = T * batch / single["value"]
            eff = t_window / (t_window + t_ar)
            report["sweep_window_steps"] = T
            report["compute_window_s"] = round(t_window, 4)
            report["projected_efficiency_lower_bound"] = round(eff, 6)
            report["projected_v5e8_solves_per_s"] = round(
                single["value"] * 8 * eff, 1
            )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
