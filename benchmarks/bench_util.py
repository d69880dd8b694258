"""On-device benchmark helper: time N chained kernel iterations in one jit.

Dispatch through the axon relay has high per-call latency, so wall-clock
around individual dispatches is unreliable.  Chaining iterations inside a
single jit (each iteration data-dependent on the last) measures pure device
time.
"""

import time

import jax
import jax.numpy as jnp


def device_time(fn, x, *args, iters=64, warmup=True):
    """Return seconds/iteration of y = fn(x, *args), chained via data dep.

    fn must map (x, *args) -> y with y.shape[0] == x.shape[0] usable to
    perturb x (we fold y back into x cheaply to create the dependency).
    """

    @jax.jit
    def loop(x, *args):
        def body(_, carry):
            y = fn(carry, *args)
            # fold output back into the input (cheap, keeps shapes): the
            # data dependency prevents reordering/elision across iterations
            carry = carry + (y[:, :1] * 0).astype(carry.dtype)
            return carry
        return jax.lax.fori_loop(0, iters, body, x)

    r = loop(x, *args)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = loop(x, *args)
    r.block_until_ready()
    dt = time.perf_counter() - t0
    return dt / iters
