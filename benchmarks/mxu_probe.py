#!/usr/bin/env python3
"""MXU throughput probe: delivered matmul FLOP/s by precision and shape.

Establishes the scoring kernel's speed-of-light on the machine at hand.
Run on the build machine's tunneled TPU v5e (2026-08-16), this measured:

    XLA    f32  4096x4096x4096:  38.7 TFLOP/s
    XLA    bf16 4096x4096x4096:  36.5 TFLOP/s
    Pallas f32  512x1156x128 :   43.1 TFLOP/s
    Pallas bf16 512x1156x128 :   42.9-50.3 TFLOP/s (any k alignment)
    Pallas f32  1024x1156x128:   73 TFLOP/s   (kernel-shaped, round 2)
    Pallas f32  1024x1156x1024:  35 TFLOP/s   (wide-N, round 2)

Every shape delivers the SAME rate in f32 and bf16, and the best clean-dot
rate (73 TF/s at the NCC kernel's own M=1024/K=1156/N=128 shape) is far
below the 197 TF/s nameplate — while the production kernel's dot section
itself sustains ~105 TF/s nominal (benchmarks/kernel_probe.py skip-mode
split). Conclusions that drive the kernel design: (a) bf16 buys nothing on
this part — the scoring path stays f32, which also keeps the
rankings-identical contract for free; (b) delivered MXU rate is erratic and
shape-dependent but ~invariant to precision, so the probes/s ceiling is set
by f32 FLOP count (~5.4 TF/probe at WVU bench scale through the fused
kernel's dot mix). bench.py numbers must be read against the measured
~15.8 probes/s kernel-only rate (kernel_probe.py), not the nameplate spec.
"""

from __future__ import annotations

import time

import numpy as np


def probe_pallas(n=512, k=1156, lanes=128, y_iters=48, grid=100):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    results = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        def body(a_ref, b_ref, o_ref, acc_ref):
            def step(y, _):
                acc_ref[:] += jnp.dot(a_ref[0], b_ref[0],
                                      preferred_element_type=jnp.float32)
                return _
            jax.lax.fori_loop(0, y_iters, step, None)
            o_ref[:] = acc_ref[:]

        fn = jax.jit(pl.pallas_call(
            body,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(grid,),
                in_specs=[pl.BlockSpec((1, n, k), lambda g: (0, 0, 0)),
                          pl.BlockSpec((1, k, lanes), lambda g: (0, 0, 0))],
                out_specs=pl.BlockSpec((n, lanes), lambda g: (0, 0)),
                scratch_shapes=[pltpu.VMEM((n, lanes), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((n, lanes), jnp.float32),
        ))
        a = jnp.asarray(np.random.default_rng(0).normal(size=(1, n, k)), dtype=dtype)
        b = jnp.asarray(np.random.default_rng(1).normal(size=(1, k, lanes)), dtype=dtype)
        np.asarray(fn(a, b))  # compile + warm; np.asarray round-trips real
        t0 = time.perf_counter()  # bytes (block_until_ready can return at
        for _ in range(3):        # enqueue over the axon tunnel)
            r = fn(a, b)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / 3
        tf = 2 * n * k * lanes * y_iters * grid / dt / 1e12
        results[name] = tf
        print(f"pallas {name:5s} {n}x{k}x{lanes}: {tf:.1f} TFLOP/s", flush=True)
    return results


def probe_xla(m=4096, k=4096, n=4096, length=10):
    import jax
    import jax.numpy as jnp

    results = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        a = jnp.asarray(np.random.default_rng(0).normal(size=(m, k)), dtype=dtype)
        b = jnp.asarray(np.random.default_rng(1).normal(size=(k, n)), dtype=dtype)

        @jax.jit
        def f(a, b):
            def step(c, _):
                # tie each dot to the carry so the scan can't be hoisted
                return c + jnp.dot(a + c[0, :1].astype(a.dtype) * 0, b,
                                   preferred_element_type=jnp.float32), None
            c, _ = jax.lax.scan(step, jnp.zeros((m, n), jnp.float32), None,
                                length=length)
            return c

        np.asarray(f(a, b)[0, 0])
        t0 = time.perf_counter()
        r = f(a, b)
        np.asarray(r[0, 0])
        dt = time.perf_counter() - t0
        tf = 2 * m * k * n * length / dt / 1e12
        results[name] = tf
        print(f"xla    {name:5s} {m}x{k}x{n}: {tf:.1f} TFLOP/s", flush=True)
    return results


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    probe_xla()
    probe_pallas()
