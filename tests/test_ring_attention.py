"""Ring attention vs single-device reference on the virtual mesh."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from qlora_tpu.ops.ring_attention import ring_attention
from qlora_tpu.ops.flash_attention import attention_reference


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    return Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("sp",))


@pytest.mark.parametrize("impl", ["flash", "jnp"])
@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_reference(mesh, causal, impl):
    B, H, S, D = 2, 2, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.float32)
    sm = 1.0 / np.sqrt(D)

    f = shard_map(
        functools.partial(ring_attention, axis_name="sp", sm_scale=sm,
                          causal=causal, impl=impl),
        mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
        check_rep=False,
    )
    got = np.asarray(f(q, k, v), np.float32)
    want = np.asarray(
        attention_reference(q, k, v, jnp.full((B,), S, jnp.int32), sm, causal),
        np.float32,
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("impl", ["flash", "jnp"])
def test_ring_grads_flow(mesh, impl):
    B, H, S, D = 1, 1, 128, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.float32)
    sm = 1.0 / np.sqrt(D)

    def loss(q, k, v):
        f = shard_map(
            functools.partial(ring_attention, axis_name="sp", sm_scale=sm,
                              impl=impl),
            mesh=mesh,
            in_specs=(P(None, None, "sp", None),) * 3,
            out_specs=P(None, None, "sp", None),
            check_rep=False,
        )
        return jnp.sum(f(q, k, v) ** 2)

    def loss_ref(q, k, v):
        y = attention_reference(q, k, v, jnp.full((B,), S, jnp.int32), sm, True)
        return jnp.sum(y ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3
        )
