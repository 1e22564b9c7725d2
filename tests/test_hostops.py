"""hostops: host-backend routing helpers (see cli.finalize / CLAUDE.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from reart_tpu.hostops import on_host, to_host


def test_to_host_preserves_structure_and_non_arrays():
    tree = {
        "w": jnp.arange(4.0),
        "meta": ("edge", 3),          # non-array leaves pass through
        "nested": {"b": np.ones(2)},  # numpy leaves become committed arrays
    }
    out = to_host(tree)
    assert out["meta"] == ("edge", 3)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.arange(4.0))
    cpu = jax.devices("cpu")[0]
    assert out["w"].devices() == {cpu}
    assert out["w"].committed


def test_on_host_computation_matches_default_backend():
    x = jnp.linspace(0.0, 1.0, 8)
    with on_host():
        y_host = jnp.sin(x) @ jnp.cos(x)
    np.testing.assert_allclose(
        np.asarray(y_host), np.asarray(jnp.sin(x) @ jnp.cos(x)), rtol=1e-6
    )


def test_on_host_outputs_do_not_pin_downstream_work():
    """Arrays created inside on_host are uncommitted: downstream jit outside
    the region must not be dragged onto the CPU backend (the kinematic fit
    consumes state built on host — see cli.build_kinematic_from_result)."""
    with on_host():
        x = jnp.arange(6.0) * 2
    assert not x.committed
    y = jax.jit(lambda a: a + 1)(x)
    assert y.devices() == {jax.devices()[0]}
