"""Experiment: in-kernel dynamic row gather vs one-hot matmul gather.

The conv kernels gather sender features x[src[e]] via a one-hot [E, TA]
matmul (exact in bf16, MXU-friendly, but does TA x more work than a real
gather). Test whether Mosaic's dynamic gather (jnp.take along sublanes)
lowers and how it performs at the canonical block shape.
"""
import time
import numpy as np

import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Bp, O, TA, C, K = 16, 16, 256, 200, 8
E = K * TA
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(Bp, O, TA, C)), jnp.bfloat16)
src_kta = jnp.asarray(rng.integers(0, TA, size=(Bp, K, TA)), jnp.int32)
src_flat = src_kta.reshape(Bp, E)
sel = jax.nn.one_hot(src_flat, TA, dtype=jnp.bfloat16)  # [Bp, E, TA]

CP = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary"),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _k_onehot(sel_ref, x_ref, y_ref):
    x_o = x_ref[0, 0]
    for k in range(K):
        sl = slice(k * TA, (k + 1) * TA)
        y_ref[0, 0, sl, :] = jnp.dot(
            sel_ref[0, sl, :], x_o, preferred_element_type=jnp.float32
        ).astype(y_ref.dtype)


def _k_take(src_ref, x_ref, y_ref):
    x_o = x_ref[0, 0]
    for k in range(K):
        idx = src_ref[0, k]  # [TA] int32
        idx2d = jax.lax.broadcast_in_dim(idx, (TA, C), (0,))
        y_ref[0, 0, k * TA:(k + 1) * TA, :] = jnp.take_along_axis(x_o, idx2d, axis=0)


def bench(fj, idx_arg, label):
    # vary x each call (scaled copy) so the dispatch relay can't cache
    out = fj(idx_arg, x, 1.0)
    jax.block_until_ready(out)
    n = 100
    t0 = time.perf_counter()
    for i in range(n):
        out = fj(idx_arg, x, 1.0 + i * 1e-6)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1000
    gb = Bp * O * E * C * 2 / 1e9  # output bytes
    print(f"{label}: {ms:.3f} ms  (output write {gb:.2f} GB -> {gb/ms*1000:.0f} GB/s)")
    return out, ms


def make(kernel, idx_spec):
    f = pl.pallas_call(
        kernel,
        grid=(Bp, O),
        in_specs=[
            idx_spec,
            pl.BlockSpec((1, 1, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, E, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, O, E, C), jnp.bfloat16),
        compiler_params=CP,
    )
    return jax.jit(lambda i, xx, s: f(i, (xx.astype(jnp.float32) * s).astype(jnp.bfloat16)))


spec_sel = pl.BlockSpec((1, E, TA), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM)
spec_src = pl.BlockSpec((1, K, TA), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM)

y1, ms1 = bench(make(_k_onehot, spec_sel), sel, "one-hot matmul gather")
try:
    y2, ms2 = bench(make(_k_take, spec_src), src_kta, "dynamic take gather  ")
    print("max abs diff:", float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32)))))
except Exception as e:
    print("dynamic take FAILED:", type(e).__name__, str(e)[:500])

# --- verify correctness + hard-sync timing via device_get ---
ref = jnp.take_along_axis(
    x, src_flat[:, None, :, None].astype(jnp.int32).repeat(O, 1), axis=2
)  # [Bp, O, E, C]
err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - ref.astype(jnp.float32))))
print("one-hot vs XLA-gather max abs diff:", err)

fj = make(_k_onehot, spec_sel)
import numpy as _np
t0 = time.perf_counter()
for i in range(20):
    out = fj(sel, x, 1.0 + i * 1e-6)
    _ = jax.device_get(out[0, 0, 0, :4])
ms = (time.perf_counter() - t0) / 20 * 1000
print(f"one-hot with device_get sync: {ms:.3f} ms")

# --- amortized hard-sync: N calls chained, one device_get at end ---
def chain_bench(n):
    t0 = time.perf_counter()
    s = 1.0
    out = None
    for i in range(n):
        out = fj(sel, x, 1.0 + i * 1e-6)
    _ = jax.device_get(out[0, 0, 0, :4])
    return (time.perf_counter() - t0) * 1000

for n in (50, 200, 500):
    tot = chain_bench(n)
    print(f"N={n}: total {tot:.1f} ms -> per-call {(tot)/n:.3f} ms")
