"""Golden regression traces: the control law's exact f64 behavior is pinned

(standing and walking closed loops).  A diff here means the controller's
numerical behavior changed — if intentional, regenerate with
tools/make_golden.py and explain in the commit message."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadrupedwholebodycontroller_tpu.config import (
    ControllerParams,
    PlannerParams,
    QPSolverParams,
)
from quadrupedwholebodycontroller_tpu.models import anymal_d_model
from quadrupedwholebodycontroller_tpu.sim import SimParams, closed_loop_rollout
from quadrupedwholebodycontroller_tpu.sim.rollout import init_rollout_carry

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def run(T, walk_after=None):
    dtype = jnp.float64
    model = anymal_d_model(dtype=dtype)
    cp, pp, sp = ControllerParams(), PlannerParams(), SimParams()
    qp = QPSolverParams()
    carry = init_rollout_carry(model, cp, pp, dtype=dtype)
    cmds = jnp.zeros((T, 3), dtype)
    if walk_after is not None:
        cmds = cmds.at[walk_after:, 0].set(0.5)
    _, tr = jax.jit(
        lambda c, x: closed_loop_rollout(model, cp, pp, qp, sp, c, x)
    )(carry, cmds)
    return tr


@pytest.mark.parametrize("name,T,walk_after", [
    ("standing", 200, None),
    ("walking", 400, 100),
])
def test_golden_trace(name, T, walk_after):
    tr = run(T, walk_after)
    with np.load(os.path.join(GOLDEN, f"{name}.npz")) as g:
        # trajectories are chaotic: identical code must match to fp-noise
        # levels; any algorithmic change shows up at O(1)
        assert np.allclose(np.asarray(tr.com_pose)[::10], g["com_pose"], atol=1e-6), name
        assert np.allclose(np.asarray(tr.tau)[::10], g["tau"], atol=1e-3), name
        assert np.allclose(np.asarray(tr.q)[::10], g["q"], atol=1e-6), name
