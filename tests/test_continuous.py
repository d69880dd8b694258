"""Continuous batching: greedy outputs must match the batch generate path."""

import numpy as np
import jax
import jax.numpy as jnp

from qlora_tpu.generate import generate
from qlora_tpu.generate.continuous import ContinuousBatcher
from qlora_tpu.models import get_config, init_params


def _mk_model():
    cfg = get_config("debug")
    params = init_params(jax.random.PRNGKey(0), cfg, quantized=True)
    return cfg, params


def _batch_reference(cfg, params, prompt, n_new):
    ids = jnp.asarray([prompt], jnp.int32)
    toks = generate(
        params, None, ids, jnp.asarray([len(prompt)]), cfg,
        max_new_tokens=n_new, eos_id=-1,
    )
    return np.asarray(toks)[0].tolist()


def test_single_request_matches_batch_generate():
    cfg, params = _mk_model()
    prompt = [3, 17, 5, 9]
    want = _batch_reference(cfg, params, prompt, 5)
    cb = ContinuousBatcher(params, None, cfg, num_slots=2, max_len=64,
                           prefill_buckets=(16,), eos_id=-1)
    req = cb.submit(prompt, max_new_tokens=5)
    cb.run_to_completion()
    assert req.generated == want


def test_concurrent_requests_isolated():
    cfg, params = _mk_model()
    p1, p2 = [3, 17, 5, 9], [4, 7]
    w1 = _batch_reference(cfg, params, p1, 4)
    w2 = _batch_reference(cfg, params, p2, 4)
    cb = ContinuousBatcher(params, None, cfg, num_slots=2, max_len=64,
                           prefill_buckets=(16,), eos_id=-1)
    r1 = cb.submit(p1, max_new_tokens=4)
    r2 = cb.submit(p2, max_new_tokens=4)
    cb.run_to_completion()
    assert r1.generated == w1
    assert r2.generated == w2


def test_slot_reuse_after_finish():
    cfg, params = _mk_model()
    cb = ContinuousBatcher(params, None, cfg, num_slots=1, max_len=64,
                           prefill_buckets=(16,), eos_id=-1)
    reqs = [cb.submit([3, 5 + i], max_new_tokens=3) for i in range(3)]
    done = cb.run_to_completion()
    assert len(done) >= 2 and all(r.done for r in reqs)
    for i, r in enumerate(reqs):
        want = _batch_reference(cfg, params, [3, 5 + i], 3)
        assert r.generated == want, f"req {i}"


def test_streaming_callback_and_queue_order():
    cfg, params = _mk_model()
    seen = []
    cb = ContinuousBatcher(params, None, cfg, num_slots=2, max_len=64,
                           prefill_buckets=(16,), eos_id=-1)
    r = cb.submit([3, 9], max_new_tokens=4,
                  on_token=lambda uid, t: seen.append((uid, t)))
    cb.run_to_completion()
    assert [t for _, t in seen] == r.generated
    assert len(seen) == 4
