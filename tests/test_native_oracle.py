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
