"""Tensor-parallel serving path (parallel/tp_decode.py): megatron-sharded
prefill + decode over a ("tp",) mesh matches the single-device contiguous
cache path token-for-token."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qlora_tpu.lora import LoraConfig
from qlora_tpu.models import forward, init_lora_params, init_params
from qlora_tpu.models.config import ModelConfig
from qlora_tpu.models.transformer import init_cache

pytestmark = pytest.mark.slow  # heavy compiles: run via -m slow in CI

# hidden/intermediate sized so every row-parallel K-chunk stays packable:
# K/tp must divide 2*block_size (=128) for shard-local split-half packing
CFG = ModelConfig(arch="llama", vocab_size=512, hidden_size=512,
                  intermediate_size=512, num_layers=2, num_heads=4,
                  num_kv_heads=4)
GQA = ModelConfig(arch="llama", vocab_size=512, hidden_size=512,
                  intermediate_size=512, num_layers=2, num_heads=4,
                  num_kv_heads=2)
LCFG = LoraConfig(r=4, alpha=8)


def _forced_trajectory(step_fn, params, lora, ids, cache, forced):
    """Prefill then decode with TEACHER-FORCED next tokens (greedy argmax
    tie-breaks diverge on bf16 psum noise); returns per-step logits."""
    B, S = ids.shape
    logits, cache = step_fn(params, lora, ids, cache)
    outs = [logits[:, S - 1]]
    for t in range(forced.shape[1]):
        logits, cache = step_fn(params, lora, forced[:, t:t + 1], cache)
        outs.append(logits[:, 0])
    return jnp.stack(outs, axis=1)


@pytest.mark.parametrize("tp,cfg", [(2, CFG), (4, CFG), (2, GQA)])
def test_tp_decode_matches_single_device(tp, cfg):
    if len(jax.devices()) < tp:
        pytest.skip(f"needs {tp} virtual devices")
    from qlora_tpu.parallel.tp_decode import (
        make_tp_forward_fn, make_tp_mesh, shard_decode_params, shard_tp_cache,
    )

    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    lora = init_lora_params(jax.random.PRNGKey(1), cfg, LCFG)
    B, S, CAP, NSTEP = 2, 8, 32, 4
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, cfg.vocab_size)
    forced = jax.random.randint(jax.random.PRNGKey(3), (B, NSTEP), 0,
                                cfg.vocab_size)

    def ref_step(p, l, i, c):
        return forward(p, l, i, cfg, LCFG, cache=c)

    ref_logits = _forced_trajectory(
        ref_step, params, lora, ids, init_cache(cfg, B, CAP), forced)

    mesh = make_tp_mesh(tp)
    p_tp = shard_decode_params(params, mesh)
    cache = shard_tp_cache(init_cache(cfg, B, CAP), mesh)
    tp_fn = make_tp_forward_fn(cfg, LCFG, mesh, p_tp, lora)
    tp_logits = _forced_trajectory(tp_fn, p_tp, lora, ids, cache, forced)

    # every decode step's logits agree to bf16 psum tolerance (the tp path
    # re-packs row-parallel weights shard-locally, so tiny requant noise +
    # psum reduction order bound the diff)
    np.testing.assert_allclose(
        np.asarray(tp_logits), np.asarray(ref_logits), rtol=0, atol=0.2)
    # and the argmax agrees at every position for nearly all tokens
    same = (np.argmax(np.asarray(tp_logits), -1)
            == np.argmax(np.asarray(ref_logits), -1))
    assert same.mean() >= 0.9, same


def test_tp_cache_is_head_sharded():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from qlora_tpu.parallel.tp_decode import (
        make_tp_mesh, shard_decode_params, shard_tp_cache,
    )

    tp = 2
    mesh = make_tp_mesh(tp)
    cache = shard_tp_cache(init_cache(CFG, 2, 16), mesh)
    # per-device KV shard holds KVH/tp heads ([L, B, KVH, T, hd]: axis 2)
    shard = cache["k"].addressable_shards[0].data
    assert shard.shape[2] == CFG.num_kv_heads // tp
    # packed weight shards shrink 1/tp on the column-parallel linears
    params = init_params(jax.random.PRNGKey(0), CFG, quantized=True)
    p_tp = shard_decode_params(params, mesh)
    wq = p_tp["blocks"]["wq"].qt.packed
    assert wq.addressable_shards[0].data.shape[-1] == wq.shape[-1] // tp


def test_tp_paged_decode_matches_single_device():
    # the two serving flagships composed: paged KV pool + tensor parallelism
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from tests.test_paged_decode import _paged_from_contiguous
    from qlora_tpu.parallel.tp_decode import (
        make_tp_forward_fn, make_tp_mesh, shard_decode_params,
        shard_paged_cache,
    )

    cfg = GQA
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    B, S = 2, 6
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, cfg.vocab_size)

    from qlora_tpu.models.unstack import unstack_cache

    cache = init_cache(cfg, B, 32)
    logits_p, cache = forward(params, None, ids, cfg, LCFG, cache=cache)
    cache = dict(cache, length=jnp.full((B,), S, jnp.int32))
    # per-layer pool lists (production form; PAGED_CACHE_SPECS are 4-D)
    paged_ref = unstack_cache(_paged_from_contiguous(cache, cfg))

    mesh = make_tp_mesh(2)
    p_tp = shard_decode_params(params, mesh)
    paged_tp = shard_paged_cache(paged_ref, mesh)
    fn = make_tp_forward_fn(cfg, LCFG, mesh, p_tp, None, paged=True)

    forced = jax.random.randint(jax.random.PRNGKey(3), (B, 3), 0,
                                cfg.vocab_size)
    for t in range(forced.shape[1]):
        tok = forced[:, t:t + 1]
        lr, paged_ref = forward(params, None, tok, cfg, LCFG, cache=paged_ref)
        lt, paged_tp = fn(p_tp, None, tok, paged_tp)
        np.testing.assert_allclose(np.asarray(lt[:, 0]), np.asarray(lr[:, 0]),
                                   rtol=0, atol=0.2)


def test_paged_batcher_over_tp_mesh():
    # end-to-end serving engine on the tp mesh: admission → paged decode →
    # retirement with full page recycling, params/pools head-sharded
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from qlora_tpu.generate.paged import PagedBatcher
    from qlora_tpu.generate.sampler import SamplingParams
    from qlora_tpu.parallel.tp_decode import make_tp_mesh

    cfg = CFG
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    mesh = make_tp_mesh(2)
    b = PagedBatcher(
        params, None, cfg, num_slots=4, n_pages=64, page_size=8,
        max_pages_per_seq=8, prefill_buckets=(16,), eos_id=-1,
        sparams=SamplingParams(temperature=0.0), tp_mesh=mesh,
    )
    free0 = b.pool.n_free
    for i in range(3):
        b.submit(list(range(4 + i, 10 + i)), max_new_tokens=6)
    done = b.run_to_completion()
    assert len(done) == 3
    assert all(len(r.generated) == 6 for r in done)
    assert b.pool.n_free == free0          # every page recycled
    # the pools stayed head-sharded through the whole loop
    shard = b.pool.k_pages[0].addressable_shards[0].data
    # per-layer pool entry [np, KVH, P, hd]: heads at axis 1
    assert shard.shape[1] == cfg.num_kv_heads // 2


def test_paged_batcher_tp_int8_decode():
    # int8 decode serving on the tp mesh: row-parallel linears requantize
    # per K-chunk (each partial dequantized by its chunk-local column scale
    # before the psum); full loop runs + logits stay in the int8 budget
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from qlora_tpu.generate.paged import PagedBatcher
    from qlora_tpu.generate.sampler import SamplingParams
    from qlora_tpu.parallel.tp_decode import make_tp_mesh

    cfg = CFG
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    mesh = make_tp_mesh(2)
    b = PagedBatcher(
        params, None, cfg, num_slots=2, n_pages=64, page_size=8,
        max_pages_per_seq=8, prefill_buckets=(16,), eos_id=-1,
        sparams=SamplingParams(temperature=0.0), tp_mesh=mesh,
        decode_impl="int8", prefill_impl="w8a8",
    )
    # the row-parallel serving copy is chunk-quantized + K-sharded
    wo8 = b.decode_params["blocks"]["wo"].qt
    assert wo8.quant_type == "int8" and wo8.k_shards == 2
    assert wo8.packed.addressable_shards[0].data.shape[1] == cfg.hidden_size // 2

    r = b.submit([3, 17, 5, 9], max_new_tokens=5)
    b.run_to_completion()
    assert len(r.generated) == 5

    # decode-step logits vs the exact bf16 tp path: int8 noise budget
    from qlora_tpu.parallel.tp_decode import (
        make_tp_forward_fn, shard_decode_params, shard_tp_cache,
    )

    p_tp = shard_decode_params(params, mesh)
    exact_fn = make_tp_forward_fn(cfg, LCFG, mesh, p_tp, None)
    int8_fn = make_tp_forward_fn(cfg, LCFG, mesh, b.decode_params, None,
                                 impl="w8a8")
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, cfg.vocab_size)
    c1 = shard_tp_cache(init_cache(cfg, 2, 32), mesh)
    c2 = shard_tp_cache(init_cache(cfg, 2, 32), mesh)
    le, c1 = exact_fn(p_tp, None, ids, c1)
    la, c2 = int8_fn(b.decode_params, None, ids, c2)
    tok = jnp.argmax(le[:, -1], -1)[:, None].astype(jnp.int32)
    le, _ = exact_fn(p_tp, None, tok, c1)
    la, _ = int8_fn(b.decode_params, None, tok, c2)
    e = np.asarray(le[:, 0], np.float32)
    a = np.asarray(la[:, 0], np.float32)
    assert np.abs(a - e).max() / np.abs(e).max() < 0.1


def test_tp_decode_no_lora():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from qlora_tpu.parallel.tp_decode import (
        make_tp_forward_fn, make_tp_mesh, shard_decode_params, shard_tp_cache,
    )

    params = init_params(jax.random.PRNGKey(0), CFG, quantized=True)
    B, S = 2, 8
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, CFG.vocab_size)

    ref_logits, _ = forward(params, None, ids, CFG, LCFG,
                            cache=init_cache(CFG, B, 32))
    mesh = make_tp_mesh(2)
    p_tp = shard_decode_params(params, mesh)
    cache = shard_tp_cache(init_cache(CFG, B, 32), mesh)
    fn = make_tp_forward_fn(CFG, LCFG, mesh, p_tp, None)
    tp_logits, _ = fn(p_tp, None, ids, cache)
    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               rtol=0, atol=0.15)


def test_paged_batcher_tp_speculative():
    """Speculation composes with tp serving: the [slots, k+1] verify chunk
    runs the fused paged CHUNK kernel on each device's local heads
    (host-side drafting, per-slot rollback); outputs must match the
    non-speculative tp engine token-for-token (greedy)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from qlora_tpu.generate.paged import PagedBatcher
    from qlora_tpu.generate.sampler import SamplingParams
    from qlora_tpu.parallel.tp_decode import make_tp_mesh

    cfg = CFG
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    mesh = make_tp_mesh(2)

    def run(spec):
        b = PagedBatcher(
            params, None, cfg, num_slots=3, n_pages=64, page_size=8,
            max_pages_per_seq=8, prefill_buckets=(16,), eos_id=-1,
            sparams=SamplingParams(temperature=0.0), tp_mesh=mesh,
            spec_draft_len=spec,
        )
        free0 = b.pool.n_free
        reqs = [b.submit(list(range(4 + i, 10 + i)), max_new_tokens=6)
                for i in range(4)]
        b.run_to_completion()
        assert b.pool.n_free == free0
        return [r.generated for r in reqs]

    plain = run(0)
    spec = run(3)
    assert all(len(g) == 6 for g in spec)
    assert plain == spec, (plain, spec)
