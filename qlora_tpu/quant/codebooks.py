"""4-bit codebooks: NF4 (NormalFloat-4) and FP4.

NF4 is the information-theoretically optimal code for normally distributed
weights (QLoRA paper, arXiv:2305.14314 §3.1).  The 16 values are quantile
midpoints of N(0, 1), asymmetric (8 positive, 7 negative, plus exact zero so
zero-valued weights survive round-trip), normalised to [-1, 1].

The values below are pinned constants; `derive_nf4_codebook()` re-derives them
from the quantile definition (used by tests to guard against silent codebook
drift — an off-by-epsilon codebook silently degrades downstream accuracy).

Reference behaviour being matched: bitsandbytes' `quant_type in {"nf4","fp4"}`
as exercised by /root/reference/qlora.py:318-326.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Quantile midpoints of N(0,1), normalised.  See derive_nf4_codebook().
NF4_CODE = np.array(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.4407098352909088,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    dtype=np.float32,
)

# FP4 (E2M1 value set, no inf/nan): sign ⊗ {0, 0.5, 1, 1.5, 2, 3, 4, 6} / 6.
# Stored sorted ascending (our packed format indexes this table directly; it
# is not bit-compatible with IEEE E2M1).  ±0 both appear, as in E2M1, so one
# code point is redundant — inherent to FP4, not a bug.
_FP4_MAGNITUDES = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], dtype=np.float32) / 6.0
FP4_CODE = np.sort(np.concatenate([_FP4_MAGNITUDES, -_FP4_MAGNITUDES])).astype(np.float32)

CODEBOOKS = {"nf4": NF4_CODE, "fp4": FP4_CODE}


def derive_nf4_codebook() -> np.ndarray:
    """Re-derive the NF4 codebook from the N(0,1) quantile definition.

    Asymmetric quantile midpoints: 8 strictly-positive quantiles, exact zero,
    7 strictly-negative quantiles; the tail probability offset is half of
    (1/2·8⁻¹·2 + 1/2·7.5⁻¹·2) ⇒ 0.5·(1/32 + 1/30), per the QLoRA paper.
    Requires scipy (test-time only).
    """
    from scipy.stats import norm  # local import: scipy is a test-only dep

    offset = 0.5 * (1 / 32 + 1 / 30)
    p = 1 - offset
    pos = norm.ppf(np.linspace(p, 0.5, 9))[:-1]
    neg = -norm.ppf(np.linspace(p, 0.5, 8))[:-1]
    v = np.sort(np.concatenate([neg, [0.0], pos]))
    return (v / np.abs(v).max()).astype(np.float32)


def get_code(quant_type: str) -> jnp.ndarray:
    """Return the 16-entry codebook for `quant_type` as a jnp float32 array."""
    try:
        return jnp.asarray(CODEBOOKS[quant_type])
    except KeyError:
        raise ValueError(
            f"unknown quant_type {quant_type!r}; expected one of {sorted(CODEBOOKS)}"
        ) from None
