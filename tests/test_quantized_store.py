"""On-disk quantized format round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from qlora_tpu.models import forward, get_config, init_params
from qlora_tpu.utils.quantized_store import load_quantized, save_quantized


def test_save_load_roundtrip(tmp_path):
    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    d = str(tmp_path / "model-nf4")
    save_quantized(d, params, cfg)
    params2, cfg2 = load_quantized(d)
    assert cfg2 == cfg
    ids = jnp.asarray([[1, 5, 9]], jnp.int32)
    a, _ = forward(params, None, ids, cfg)
    b, _ = forward(params2, None, ids, cfg2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dense_roundtrip(tmp_path):
    cfg = get_config("debug-neox")
    params = init_params(jax.random.PRNGKey(1), cfg, quantized=False)
    d = str(tmp_path / "model-bf16")
    save_quantized(d, params, cfg)
    params2, _ = load_quantized(d)
    for x, y in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
