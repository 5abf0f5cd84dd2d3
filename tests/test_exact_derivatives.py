"""Beyond-reference option: analytic centroidal derivatives (jvp) vs the

reference's finite differences."""
import jax
import jax.numpy as jnp
import numpy as np

from quadrupedwholebodycontroller_tpu.config import (
    ControllerParams,
    PlannerParams,
    QPSolverParams,
)
from quadrupedwholebodycontroller_tpu.models import anymal_d_model
from quadrupedwholebodycontroller_tpu.sim import SimParams, closed_loop_rollout
from quadrupedwholebodycontroller_tpu.sim.rollout import init_rollout_carry


def run(cp, T=500):
    dtype = jnp.float64
    model = anymal_d_model(dtype=dtype)
    pp, sp = PlannerParams(), SimParams()
    qp = QPSolverParams()
    carry = init_rollout_carry(model, cp, pp, dtype=dtype)
    cmds = jnp.zeros((T, 3), dtype).at[100:, 0].set(0.5)
    _, tr = jax.jit(
        lambda c, x: closed_loop_rollout(model, cp, pp, qp, sp, c, x)
    )(carry, cmds)
    return jax.tree.map(np.asarray, tr)


def test_exact_derivatives_walk():
    """Exact-derivative walking is stable, QP-clean, and tracks at least as

    well as the reference-faithful FD mode."""
    tr_fd = run(ControllerParams())
    tr_ex = run(ControllerParams(exact_derivatives=True))

    for tr in (tr_fd, tr_ex):
        assert np.all(np.isfinite(tr.com_pos))
        assert tr.com_pos[:, 2].min() > 0.4
        assert tr.qp_kkt.max() < 1e-3

    def track_err(tr):
        e = tr.com_pose[100:, :3] - tr.ref_com_pose[100:, :3]
        return float(np.sqrt((e**2).mean()))

    err_fd, err_ex = track_err(tr_fd), track_err(tr_ex)
    # exact derivatives must not be worse than FD by more than 20%
    assert err_ex <= err_fd * 1.2, (err_fd, err_ex)
