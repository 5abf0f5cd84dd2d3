"""Cross-validation of the JAX dynamics engine against the independent C++

Featherstone oracle (native/src/dynamics_oracle.cpp): two different
algorithm families (CoM-Jacobian Gram / virtual-work-jvp vs CRBA / RNEA in
body coordinates) must agree to near machine precision."""
import jax.numpy as jnp
import numpy as np
import pytest

from quadrupedwholebodycontroller_tpu.models import anymal_d_model
from quadrupedwholebodycontroller_tpu.ops import dynamics as D
from quadrupedwholebodycontroller_tpu.ops import kinematics as K
from quadrupedwholebodycontroller_tpu.ops import spatial
from quadrupedwholebodycontroller_tpu.runtime import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


@pytest.fixture(scope="module")
def model():
    return anymal_d_model(dtype=jnp.float64)


def random_state(rng):
    q = jnp.asarray(rng.uniform(-0.7, 0.7, size=12), jnp.float64)
    base_p = jnp.asarray(rng.normal(size=3), jnp.float64)
    quat = rng.normal(size=4)
    quat /= np.linalg.norm(quat)
    base_R = spatial.quat_to_matrix(jnp.asarray(quat, jnp.float64))
    u = jnp.asarray(rng.normal(size=18), jnp.float64)
    return base_R, base_p, q, u


def test_mass_matrix_matches_oracle(lib, model, rng):
    for _ in range(5):
        base_R, base_p, q, u = random_state(rng)
        kin = K.forward_kinematics(model, base_R, base_p, q)
        M_jax = np.asarray(D.mass_matrix(model, kin))
        M_cpp, _ = native.oracle_mass_and_bias(model, base_R, q, u)
        scale = np.abs(M_cpp).max()
        assert np.allclose(M_jax, M_cpp, atol=1e-10 * scale), (
            np.abs(M_jax - M_cpp).max()
        )


def test_bias_matches_oracle(lib, model, rng):
    for _ in range(5):
        base_R, base_p, q, u = random_state(rng)
        h_jax = np.asarray(D.coriolis_bias(model, base_R, base_p, q, u))
        _, h_cpp = native.oracle_mass_and_bias(model, base_R, q, u)
        scale = max(1.0, np.abs(h_cpp).max())
        assert np.allclose(h_jax, h_cpp, atol=1e-9 * scale), (
            np.abs(h_jax - h_cpp).max()
        )


def _random_wbc_inputs(rng, contacts):
    from quadrupedwholebodycontroller_tpu.control import wbc

    base_R, base_p, q, u = random_state(rng)
    obs = wbc.RobotObservation(
        base_R=base_R, base_p=base_p, base_vel=u[:6], q=q, qd=u[6:]
    )
    ref = wbc.Reference(
        com_pose=jnp.asarray(rng.normal(size=6), jnp.float64),
        com_vel=jnp.asarray(rng.normal(size=6), jnp.float64),
        com_acc=jnp.asarray(rng.normal(size=6), jnp.float64),
        swing_pos=jnp.asarray(rng.normal(size=12), jnp.float64),
        swing_vel=jnp.asarray(rng.normal(size=12), jnp.float64),
        swing_acc=jnp.asarray(rng.normal(size=12), jnp.float64),
        contacts=jnp.asarray(contacts, jnp.float64),
    )
    return obs, ref


def _assert_assembly_matches(setup, orc, tol=1e-9):
    """Compare wbc_setup's QP data + carry updates against the C++ oracle."""
    pairs = [
        ("H", setup.qp_data.H), ("g", setup.qp_data.g), ("A", setup.qp_data.A),
        ("l", setup.qp_data.l), ("u", setup.qp_data.u), ("h_c", setup.h_c),
        ("T", setup.carry_updates["old_T"]),
        ("Jc_st", setup.carry_updates["old_J_st"]),
        ("Jc_sw", setup.carry_updates["old_J_sw"]),
        ("tdot_inv", setup.carry_updates["tdot_inv"]),
        ("integral_error", setup.carry_updates["integral_error"]),
    ]
    for name, jx in pairs:
        a, b = np.asarray(jx), orc[name]
        finite = np.abs(b) < 1e19  # exclude the QP_INF one-sided bounds
        scale = max(1.0, np.abs(b[finite]).max())
        err = np.abs(a - b)[finite].max()
        assert err < tol * scale, (name, err, scale)


def test_qp_assembly_matches_oracle(lib, model, rng):
    """The full H/g/A/l/u assembly (centroidal transform, desired wrench,
    friction pyramid, torque limits, swing tracking) from an independent
    C++ derivation — closes the last same-author-validates-same-author
    link in the torque-parity chain (VERDICT r1 item 3).  Reference:
    whole_body_controller.cpp:256-320,384-515."""
    from quadrupedwholebodycontroller_tpu.config import ControllerParams
    from quadrupedwholebodycontroller_tpu.control import wbc

    params = ControllerParams()
    for contacts in ([1, 1, 1, 1], [1, 0, 1, 1], [0, 1, 1, 0]):
        obs, ref = _random_wbc_inputs(rng, contacts)
        carry = wbc.init_carry(dtype=jnp.float64)
        carry = carry._replace(prev_contacts=ref.contacts)
        setup = wbc.wbc_setup(model, params, obs, ref, carry)
        orc = native.oracle_qp_assembly(
            model, params, obs, ref, carry, switch_flag=False, deriv_valid=False
        )
        _assert_assembly_matches(setup, orc)


def test_qp_assembly_oracle_two_cycle_chain(lib, model, rng):
    """Second cycle chained through the oracle's own carry outputs:
    exercises the finite-difference Tdot/Jdot path and the reference's
    stale-tdot_inv read ordering (cpp:289 vs 293)."""
    from quadrupedwholebodycontroller_tpu.config import ControllerParams
    from quadrupedwholebodycontroller_tpu.control import wbc

    params = ControllerParams()
    contacts = jnp.asarray([1.0, 0.0, 1.0, 1.0], jnp.float64)
    obs1, ref = _random_wbc_inputs(rng, contacts)
    carry = wbc.init_carry(dtype=jnp.float64)
    carry = carry._replace(prev_contacts=contacts)

    setup1 = wbc.wbc_setup(model, params, obs1, ref, carry)
    orc1 = native.oracle_qp_assembly(
        model, params, obs1, ref, carry, switch_flag=False, deriv_valid=False
    )
    _assert_assembly_matches(setup1, orc1)

    # integrate the state a tiny step so cycle-2 FD derivatives are non-zero
    dt = 1.0 / params.loop_rate
    u1 = jnp.concatenate([obs1.base_vel, obs1.qd])
    from quadrupedwholebodycontroller_tpu.ops import kinematics as K

    _, dp, dq = K.state_flow(obs1.base_R, obs1.base_p, obs1.q, u1)
    # rotation via the exponential map: keeps base_R exactly on SO(3)
    # (both implementations assume orthogonality — the oracle's Featherstone
    # route uses R^T as R^-1, the JAX Gram-sum route never inverts R)
    w = u1[3:6]
    wn = jnp.linalg.norm(w)
    R_step = spatial.axis_angle_to_matrix(w / wn, wn * dt)
    obs2 = obs1._replace(
        base_R=R_step @ obs1.base_R,
        base_p=obs1.base_p + dt * dp,
        q=obs1.q + dt * dq,
    )
    carry2 = carry._replace(
        old_T=jnp.asarray(setup1.carry_updates["old_T"]),
        old_J_st=jnp.asarray(setup1.carry_updates["old_J_st"]),
        old_J_sw=jnp.asarray(setup1.carry_updates["old_J_sw"]),
        tdot_inv=jnp.asarray(setup1.carry_updates["tdot_inv"]),
        integral_error=jnp.asarray(setup1.carry_updates["integral_error"]),
        deriv_valid=jnp.asarray(True),
    )
    setup2 = wbc.wbc_setup(model, params, obs2, ref, carry2, ref_is_new=False)
    carry2_orc = carry._replace(
        old_T=jnp.asarray(orc1["T"]),
        old_J_st=jnp.asarray(orc1["Jc_st"]),
        old_J_sw=jnp.asarray(orc1["Jc_sw"]),
        tdot_inv=jnp.asarray(orc1["tdot_inv"]),
        integral_error=jnp.asarray(orc1["integral_error"]),
    )
    orc2 = native.oracle_qp_assembly(
        model, params, obs2, ref, carry2_orc, switch_flag=False, deriv_valid=True
    )
    # FD derivatives amplify by loop_rate=400; loosen proportionally
    _assert_assembly_matches(setup2, orc2, tol=1e-8)
    # the gate must actually be open: cycle-2 Tdot-dependent rows differ
    # from a zero-derivative assembly
    orc2_gated = native.oracle_qp_assembly(
        model, params, obs2, ref, carry2_orc, switch_flag=True, deriv_valid=True
    )
    assert np.abs(orc2["l"][6:18] - orc2_gated["l"][6:18]).max() > 1e-6


def test_trajlog_roundtrip(lib, tmp_path):
    log = native.TrajLog(frame_doubles=7)
    frames = np.arange(21.0).reshape(3, 7)
    log.append(frames)
    assert len(log) == 3
    path = str(tmp_path / "run.qlog")
    log.flush(path)
    log.close()
    back = native.TrajLog.read(path)
    assert back.shape == (3, 7)
    assert np.allclose(back, frames)
