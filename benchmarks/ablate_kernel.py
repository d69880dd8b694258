"""Ablation: which part of the fused qmm kernel costs the time?

Variants (all same shapes/grid, M=256, K=4096, N=4096, TN=128):
  full        — decode(gather) + scale + 2 matmuls
  noscale     — decode, skip absmax multiply
  nodecode    — w = nibble.astype(bf16) (1 convert), scale kept
  nounpack    — w = packed byte.astype(bf16), scale kept
  mmonly      — w = table as-is (f32->bf16), no packed read use
  mmonly_bf16 — like mmonly but table already bf16 (no convert)
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
TKp, TN, TM = 512, 128, 256


def make(variant):
    def kernel(xl_ref, xh_ref, p_ref, am_ref, tab_ref, o_ref, acc_ref, *, nb, am_half):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        tab = tab_ref[:]
        if variant == "mmonly":
            wl = tab.astype(jnp.bfloat16)
            wh = wl
        elif variant == "mmonly_bf16":
            wl = tab.astype(jnp.bfloat16)
            wh = wl
        else:
            p32 = p_ref[:].astype(jnp.int32)
            low = p32 & 0x0F
            high = p32 >> 4
            if variant == "nounpack":
                vl = p_ref[:].astype(jnp.float32)
                vh = vl
            elif variant == "nodecode":
                vl = low.astype(jnp.float32)
                vh = high.astype(jnp.float32)
            else:
                vl = jnp.take_along_axis(tab, low, axis=1)
                vh = jnp.take_along_axis(tab, high, axis=1)
            if variant == "noscale":
                wl = vl.astype(jnp.bfloat16)
                wh = vh.astype(jnp.bfloat16)
            else:
                aml = am_ref[pl.ds(k * nb, nb), :]
                amh = am_ref[pl.ds(am_half + k * nb, nb), :]
                r, c = vl.shape
                wl = (vl.reshape(r // BLOCK, BLOCK, c) * aml[:, None, :]).reshape(r, c).astype(jnp.bfloat16)
                wh = (vh.reshape(r // BLOCK, BLOCK, c) * amh[:, None, :]).reshape(r, c).astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(xl_ref[:], wl, preferred_element_type=jnp.float32)
        acc_ref[:] += jnp.dot(xh_ref[:], wh, preferred_element_type=jnp.float32)

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(jnp.bfloat16)

    @jax.jit
    def qmm(x, packed, am, tab2d):
        K2 = K // 2
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

    return qmm


def main():
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (M, K), dtype=jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), dtype=jnp.float32) * 0.05
    qt = quantize(w)
    am = absmax_f32(qt)
    tab2d = jnp.tile(jnp.asarray(NF4_CODE, jnp.float32)[None, :], (TKp, TN // 16))
    w_bytes = K * N // 2

    for v in ["full", "noscale", "nodecode", "nounpack", "mmonly"]:
        try:
            f = make(v)
            y = f(x, qt.packed, am, tab2d)
            y.block_until_ready()
        except Exception as e:
            s = str(e)
            i = s.find("Mosaic failed")
            print(f"{v:12s}: FAILED {(s[i:i+150] if i>=0 else s[:150])}")
            continue
        iters = 50
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(x, qt.packed, am, tab2d)
        y.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"{v:12s}: {dt*1e6:8.1f} us  {2*M*K*N/dt/1e12:6.2f} TFLOP/s  weight {w_bytes/dt/1e9:6.1f} GB/s")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    main()
