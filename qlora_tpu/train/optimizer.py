"""Optimizers: AdamW with the reference's hyperparameters + 8-bit state.

Reference defaults (SURVEY.md N5/N6):
* ``paged_adamw_32bit`` (qlora.py:198) — CUDA unified-memory paging made
  explicit on TPU: :func:`host_offload` keeps optimizer state in
  ``pinned_host`` memory between steps (``--optim_host_offload``), so HBM
  holds no steady-state optimizer state — the full-finetune memory lever.
  LoRA-only state is tiny (offload rarely needed), and sharded meshes use
  ZeRO-1 instead (qlora_tpu.parallel.sharded_step).
* ``--adam8bit`` (qlora.py:161-164) — blockwise 8-bit optimizer state:
  implemented below as an optax transform storing m and sqrt(v) as int8 with
  per-block (256) fp32 absmax scales (sqrt(v) halves the relative error of
  linear int8 on the wide-dynamic-range second moment).
* gradient clipping max_grad_norm 0.3 (qlora.py:205), constant-with-warmup
  schedule, warmup_ratio 0.03 (qlora.py:208-209).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

STATE_BLOCK = 256


def warmup_constant_schedule(lr: float, total_steps: int, warmup_ratio: float = 0.03):
    warmup = max(1, int(total_steps * warmup_ratio))
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup), optax.constant_schedule(lr)],
        boundaries=[warmup],
    )


def adamw(
    lr,
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float = 0.3,
):
    """The reference's optimizer chain: clip(0.3) → AdamW."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay),
    )


# ---------------------------------------------------------------------------
# 8-bit blockwise optimizer state
# ---------------------------------------------------------------------------


def _q8(x: jax.Array):
    """Blockwise int8 quantize of a flat f32 array (block 256)."""
    n = x.shape[0]
    pad = (-n) % STATE_BLOCK
    xp = jnp.pad(x, (0, pad)).reshape(-1, STATE_BLOCK)
    scale = jnp.max(jnp.abs(xp), axis=1)
    safe = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(xp / safe[:, None] * 127.0), -127, 127).astype(jnp.int8)
    return q.reshape(-1)[:n], scale


def _dq8(q: jax.Array, scale: jax.Array):
    n = q.shape[0]
    pad = (-n) % STATE_BLOCK
    qp = jnp.pad(q, (0, pad)).reshape(-1, STATE_BLOCK).astype(jnp.float32)
    return (qp * (scale[:, None] / 127.0)).reshape(-1)[:n]


class Adam8bitState(NamedTuple):
    count: jax.Array
    m_q: object     # pytree of int8
    m_s: object     # pytree of f32 block scales
    sv_q: object    # pytree of int8 (quantized sqrt(v))
    sv_s: object


def adam8bit(
    lr,
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float = 0.3,
) -> optax.GradientTransformation:
    """AdamW whose m / sqrt(v) state lives in blockwise int8 (bnb adam8bit
    equivalent).  Dequantize → update → requantize each step."""

    schedule = lr if callable(lr) else (lambda _: lr)

    def init(params):
        flat = jax.tree_util.tree_map(lambda p: p.reshape(-1).astype(jnp.float32), params)

        def zeros_qs():
            zq = jax.tree_util.tree_map(lambda f: _q8(jnp.zeros_like(f)), flat)
            is_pair = lambda x: isinstance(x, tuple)
            return (
                jax.tree_util.tree_map(lambda t: t[0], zq, is_leaf=is_pair),
                jax.tree_util.tree_map(lambda t: t[1], zq, is_leaf=is_pair),
            )

        # m and sqrt(v) get INDEPENDENT buffers: aliasing the zero trees was
        # correct only while step 1 fully overwrote both, and breaks under
        # buffer donation / in-place reuse
        m_q, m_s = zeros_qs()
        sv_q, sv_s = zeros_qs()
        return Adam8bitState(jnp.zeros([], jnp.int32), m_q, m_s, sv_q, sv_s)

    def update(grads, state, params):
        count = state.count + 1
        step_lr = schedule(state.count)
        # global-norm clip
        gnorm = optax.global_norm(grads)
        clip = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-12))
        leaves, treedef = jax.tree_util.tree_flatten(grads)
        m_q = treedef.flatten_up_to(state.m_q)
        m_s = treedef.flatten_up_to(state.m_s)
        sv_q = treedef.flatten_up_to(state.sv_q)
        sv_s = treedef.flatten_up_to(state.sv_s)
        p_leaves = treedef.flatten_up_to(params)

        new_updates, nm_q, nm_s, nsv_q, nsv_s = [], [], [], [], []
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        for g, mq, ms, svq, svs, p in zip(leaves, m_q, m_s, sv_q, sv_s, p_leaves):
            gf = g.reshape(-1).astype(jnp.float32) * clip
            m = _dq8(mq, ms)
            sv = _dq8(svq, svs)
            v = sv * sv
            m = b1 * m + (1 - b1) * gf
            v = b2 * v + (1 - b2) * gf * gf
            mhat = m / bc1
            vhat = v / bc2
            upd = -step_lr * (mhat / (jnp.sqrt(vhat) + eps)
                              + weight_decay * p.reshape(-1).astype(jnp.float32))
            q1, s1 = _q8(m)
            q2, s2 = _q8(jnp.sqrt(v))
            new_updates.append(upd.reshape(g.shape).astype(p.dtype))
            nm_q.append(q1); nm_s.append(s1); nsv_q.append(q2); nsv_s.append(s2)

        ups = jax.tree_util.tree_unflatten(treedef, new_updates)
        st = Adam8bitState(
            count,
            jax.tree_util.tree_unflatten(treedef, nm_q),
            jax.tree_util.tree_unflatten(treedef, nm_s),
            jax.tree_util.tree_unflatten(treedef, nsv_q),
            jax.tree_util.tree_unflatten(treedef, nsv_s),
        )
        return ups, st

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# host-offloaded ("paged") optimizer state
# ---------------------------------------------------------------------------


def host_offload(
    inner: optax.GradientTransformation,
    memory_kind: str = "pinned_host",
    device=None,
) -> optax.GradientTransformation:
    """Optimizer-state host offload — the TPU-native "paged" optimizer.

    The reference's ``paged_adamw_*`` (bnb, qlora.py:198) backs optimizer
    state with CUDA unified memory so it spills to host RAM under pressure.
    XLA has no transparent paging; the TPU equivalent is explicit: state
    lives in ``pinned_host`` memory between steps and streams into HBM only
    inside the update.  Steady-state HBM holds NO optimizer state; the
    step's high-water mark is params + grads + one transient state copy.
    Use for full finetunes whose Adam moments don't fit alongside the model
    (the reason the reference made paged optimizers its default).

    Scope: unsharded state (the optimizer.update runs under a plain jit).
    Sharded meshes page at the TrainState level instead — see
    :func:`page_state_between_steps` (device_put with a memory-kind inside
    ``shard_map`` is not expressible, so the mesh path streams the whole
    ZeRO-1/GSPMD-sharded state around each step, outside the jit).
    """

    def _shardings():
        from jax.sharding import SingleDeviceSharding

        d = device if device is not None else jax.devices()[0]
        return (
            SingleDeviceSharding(d, memory_kind=memory_kind),
            SingleDeviceSharding(d, memory_kind="device"),
        )

    def init(params):
        host, _ = _shardings()
        st = inner.init(params)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, host), st)

    def update(grads, state, params=None):
        host, dev = _shardings()
        st_dev = jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), state)
        ups, st2 = inner.update(grads, st_dev, params)
        st2 = jax.tree_util.tree_map(lambda x: jax.device_put(x, host), st2)
        return ups, st2

    return optax.GradientTransformation(init, update)


def tree_to_memory_kind(tree, kind: str):
    """device_put every array leaf to its own sharding with `kind` memory
    (works for SingleDeviceSharding and NamedSharding alike — each device
    pages its OWN shard, so ZeRO-1/GSPMD partitioning is preserved)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, x.sharding.with_memory_kind(kind))
        if isinstance(x, jax.Array) and x.ndim > 0 else x,
        tree,
    )


def page_state_between_steps(step_fn):
    """Mesh-composed paged optimizer (--optim_host_offload on a mesh).

    The reference's paged AdamW (bnb unified memory, qlora.py:198) was
    orthogonal to its parallelism; this is the sharded-mesh equivalent of
    :func:`host_offload`: ``TrainState.opt_state`` parks in ``pinned_host``
    between steps — each device holding its OWN shard's host copy (ZeRO-1
    chunks under fsdp, GSPMD shards under full finetune, tp shards under
    megatron) — and streams to device memory around each jitted step.  The
    transfers run outside the jit, so steady-state HBM holds no optimizer
    state; the step's high-water mark adds one transient state copy.

    Wraps any (state, frozen, batch, rng) -> (state, metrics) step."""

    def paged(state, frozen, batch, rng):
        st = state.replace(
            opt_state=tree_to_memory_kind(state.opt_state, "device"))
        st2, metrics = step_fn(st, frozen, batch, rng)
        return st2.replace(
            opt_state=tree_to_memory_kind(st2.opt_state, "pinned_host")
        ), metrics

    return paged


def make_optimizer(
    name: str,
    lr,
    total_steps: int,
    *,
    warmup_ratio: float = 0.03,
    weight_decay: float = 0.0,
    max_grad_norm: float = 0.3,
    b2: float = 0.999,
    offload_state: bool = False,
):
    """Reference flag parity: --optim paged_adamw_32bit | --adam8bit.

    ``offload_state=True`` pages the optimizer state to host memory
    between steps (see :func:`host_offload`)."""
    sched = warmup_constant_schedule(lr, total_steps, warmup_ratio)
    if name in ("paged_adamw_32bit", "adamw", "adamw_torch"):
        opt = adamw(sched, weight_decay=weight_decay, max_grad_norm=max_grad_norm, b2=b2)
    elif name in ("adam8bit", "paged_adamw_8bit"):
        opt = adam8bit(sched, weight_decay=weight_decay, max_grad_norm=max_grad_norm, b2=b2)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    return host_offload(opt) if offload_state else opt
