"""Microbenchmarks for NF4 decode strategies inside a Pallas TPU kernel.

Decode = 16-entry codebook lookup per 4-bit index. Strategies:
  chain_i32  — 15× (idx>=i)·Δ adds in int32/f32 (current baseline)
  chain_bf16 — same chain, compares+adds in bf16 (2× VPU packing?)
  take       — jnp.take gather (does Mosaic emit a hw dynamic_gather?)
  onehot_mxu — decode via one-hot matmul on the MXU
Each variant runs the same fused matmul y = x @ (decode(p)·am).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qlora_tpu.quant import quantize
from qlora_tpu.quant.blockwise import absmax_f32
from qlora_tpu.quant.codebooks import NF4_CODE

M, K, N = 256, 4096, 4096
BLOCK = 64


def decode_chain_i32(p32, code):
    v = jnp.full(p32.shape, float(code[0]), dtype=jnp.float32)
    for i in range(1, 16):
        d = float(code[i] - code[i - 1])
        if d:
            v += jnp.where(p32 >= i, d, 0.0)
    return v


def decode_chain_bf16(p32, code):
    idx = p32.astype(jnp.bfloat16)
    v = jnp.full(idx.shape, float(code[0]), dtype=jnp.bfloat16)
    for i in range(1, 16):
        d = float(code[i] - code[i - 1])
        if d:
            v += jnp.where(idx >= i, jnp.bfloat16(d), jnp.bfloat16(0.0))
    return v.astype(jnp.float32)


def decode_take(p32, code):
    tab = jnp.asarray(code, dtype=jnp.float32)
    return jnp.take(tab, p32, axis=0)


def decode_tree_bf16(p32, code):
    # binary select tree on bits: 8+4+2+1 selects but short dtype
    idx = p32
    b0 = (idx & 1) > 0
    b1 = (idx & 2) > 0
    b2 = (idx & 4) > 0
    b3 = (idx & 8) > 0
    c = [jnp.bfloat16(v) for v in code]
    lvl0 = [jnp.where(b0, c[2 * i + 1], c[2 * i]) for i in range(8)]
    lvl1 = [jnp.where(b1, lvl0[2 * i + 1], lvl0[2 * i]) for i in range(4)]
    lvl2 = [jnp.where(b2, lvl1[2 * i + 1], lvl1[2 * i]) for i in range(2)]
    v = jnp.where(b3, lvl2[1], lvl2[0])
    return v.astype(jnp.float32)


def decode_tree_f32(p32, code):
    # binary select tree on bits, f32 selects (int compares are fine)
    b0 = (p32 & 1) > 0
    b1 = (p32 & 2) > 0
    b2 = (p32 & 4) > 0
    b3 = (p32 & 8) > 0
    c = [jnp.float32(v) for v in code]
    lvl0 = [jnp.where(b0, c[2 * i + 1], c[2 * i]) for i in range(8)]
    lvl1 = [jnp.where(b1, lvl0[2 * i + 1], lvl0[2 * i]) for i in range(4)]
    lvl2 = [jnp.where(b2, lvl1[2 * i + 1], lvl1[2 * i]) for i in range(2)]
    return jnp.where(b3, lvl2[1], lvl2[0])


def decode_taa(p32, tab):
    # tab: same shape as p32, rows = codebook tiled; same-shape gather axis 0
    return jnp.take_along_axis(tab, p32, axis=0)


def decode_taa_lane(p32, tab):
    # tab: same shape as p32, lanes = codebook tiled; lane gather (vperm-like)
    return jnp.take_along_axis(tab, (p32 & 0x0F) + 0, axis=1)


DECODERS = {
    "chain_i32": decode_chain_i32,
    "tree_f32": decode_tree_f32,
    "taa_gather": "special",
    "taa_lane": "special",
}


def make_qmm(decoder_name, TN=256):
    use_taa = decoder_name in ("taa_gather", "taa_lane")
    lane = decoder_name == "taa_lane"
    decode = None if use_taa else DECODERS[decoder_name]

    def kernel(xl_ref, xh_ref, p_ref, am_ref, tab_ref, o_ref, acc_ref, *, nb, am_half):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        p32 = p_ref[:].astype(jnp.int32)
        low = p32 & 0x0F
        high = p32 >> 4
        if use_taa:
            tab = tab_ref[:]
            if lane:
                vl = decode_taa_lane(low, tab)
                vh = decode_taa_lane(high, tab)
            else:
                vl = decode_taa(low, tab)
                vh = decode_taa(high, tab)
        else:
            vl = decode(low, NF4_CODE)
            vh = decode(high, NF4_CODE)
        aml = am_ref[pl.ds(k * nb, nb), :]
        amh = am_ref[pl.ds(am_half + k * nb, nb), :]
        r, c = vl.shape
        wl = (vl.reshape(r // BLOCK, BLOCK, c) * aml[:, None, :]).reshape(r, c)
        wh = (vh.reshape(r // BLOCK, BLOCK, c) * amh[:, None, :]).reshape(r, c)
        acc_ref[:] += jnp.dot(
            xl_ref[:], wl.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        acc_ref[:] += jnp.dot(
            xh_ref[:], wh.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(jnp.bfloat16)

    @jax.jit
    def qmm(x, packed, am):
        K2 = K // 2
        TKp, TM = 512, min(256, M)
        nb = TKp // BLOCK
        koff = K2 // TKp
        am_rows = K // BLOCK
        grid = (M // TM, N // TN, K2 // TKp)
        return pl.pallas_call(
            functools.partial(kernel, nb=nb, am_half=am_rows // 2),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TM, TKp), lambda i, j, k: (i, k)),
                pl.BlockSpec((TM, TKp), lambda i, j, k: (i, k + koff)),
                pl.BlockSpec((TKp, TN), lambda i, j, k: (k, j)),
                pl.BlockSpec((am_rows, TN), lambda i, j, k: (0, j)),
                pl.BlockSpec((TKp, TN), lambda i, j, k: (0, 0)),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        )(x, x, packed, am, tab2d)

    if lane:
        tab2d = jnp.tile(jnp.asarray(NF4_CODE, jnp.float32)[None, :], (512, TN // 16))
    else:
        tab2d = jnp.tile(jnp.asarray(NF4_CODE, jnp.float32)[:, None], (512 // 16, TN))
    return qmm


def main():
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (M, K), dtype=jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), dtype=jnp.float32) * 0.05
    qt = quantize(w)
    am = absmax_f32(qt)
    y_ref = None
    w_bytes = K * N // 2 + 4 * K * N // BLOCK

    for name, tn in [("chain_i32", 256), ("tree_f32", 256), ("tree_f32", 128), ("taa_lane", 128)]:
        name_l = f"{name}@{tn}"
        try:
            f = make_qmm(name, TN=tn)
            y = f(x, qt.packed, am)
            y.block_until_ready()
        except Exception as e:
            print(f"{name_l:14s}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        if y_ref is None:
            y_ref = np.asarray(y, np.float32)
        else:
            err = np.abs(np.asarray(y, np.float32) - y_ref).max()
            assert err < 0.5, f"{name} mismatch {err}"
        iters = 50
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(x, qt.packed, am)
        y.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(
            f"{name_l:14s}: {dt*1e6:8.1f} us  {2*M*K*N/dt/1e12:6.2f} TFLOP/s  "
            f"weight {w_bytes/dt/1e9:6.1f} GB/s"
        )


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    main()
