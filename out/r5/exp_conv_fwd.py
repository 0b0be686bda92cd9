"""Conv FORWARD kernel anatomy (VERDICT r4 item 4 / Weak #2).

The split spatial conv forward (ops/pallas_conv._fwd_spatial_kernel) runs at
~58% in-kernel MFU (3.8 ms/step over 5 layers) while the same family's
backward reaches ~70%. Decompose the per-block time into DMA floor / MXU /
VPU by ablating the kernel body at the exact production shapes
(B=256, A=16 -> Bp=32, TA=128, E=1024, O=16, D=256, C=200, bf16 operands):

  v0_full     — the production kernel body (kern matmul + window + gather
                matmul + elementwise + K-reshape-sum, bf16 store).
  v_dma       — body touches each input block minimally (single sublane row
                reduce) and stores zeros: measures the grid's DMA/launch
                floor with the same block set.
  v_mxu       — the two matmuls only, sum stored (no window, no elementwise
                product, no K-sum): MXU + DMA, minimal VPU.
  v_nowin     — full body minus the window multiply: bounds the window's
                VPU cost.
  v_par       — v0 with BOTH grid axes declared parallel (the split forward
                has no cross-o accumulation — out block is (b, o)-indexed —
                so 'arbitrary' on o is stricter than needed; does Mosaic
                schedule better?).

Roofline accounting at these shapes, per (b', o) block:
  MXU:  kern [E,D]@[D,C] = 104.9 MF + gather [E,TA]@[TA,C] = 52.4 MF
        -> 157 MF = 0.80 us at 197 TF/s.
  DMA:  basis block 512 KB bf16 (per o) + x 51 KB + out write 51 KB
        (sel 256 KB and win 4 KB are o-invariant: fetched once per b')
        -> ~0.62 MB = 0.76 us at 819 GB/s.
Balanced MXU/DMA -> the overlapped floor is ~0.8 us/block = ~2.1 ms for the
5x512 blocks of one step; the measured 3.8 ms = 54-58% of that roofline.
This script measures where the other ~1.7 ms goes.

Usage: python out/r5/exp_conv_fwd.py [variants...]
"""

import sys
import time
from functools import partial

import numpy as np

from arreau_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arreau_tpu.ops.pallas_conv import _COMPILER_PARAMS, _fwd_spatial_kernel

Bp, O, TA, K, D, C = 32, 16, 128, 8, 256, 200
E = K * TA
LAYERS = 5
cdt = jnp.bfloat16

rng = np.random.default_rng(0)
sel = jnp.asarray(rng.random((Bp, E, TA)) < 0.01, cdt)
basis = jnp.asarray(rng.normal(size=(Bp, O, E, D)) * 0.1, cdt)
w = jnp.asarray(rng.normal(size=(D, C)) * 0.05, cdt)
win = jnp.asarray(rng.random((Bp, E, 1)), jnp.float32)
x = jnp.asarray(rng.normal(size=(Bp, O, TA, C)), cdt)

IN_SPECS = [
    pl.BlockSpec((1, E, TA), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
    pl.BlockSpec((1, 1, E, D), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
    pl.BlockSpec(memory_space=pltpu.VMEM),
    pl.BlockSpec((1, E, 1), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
    pl.BlockSpec((1, 1, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
]
OUT_SPEC = pl.BlockSpec((1, 1, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM)
OUT_SHAPE = jax.ShapeDtypeStruct((Bp, O, TA, C), cdt)

PAR_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel"),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _dma_kernel(K_, sel_ref, basis_ref, w_ref, win_ref, x_ref, y_ref):
    # touch each block cheaply so the DMAs are not dead-code-eliminated
    # (accumulate in f32 — Mosaic cannot legalize scalar bf16 arith); the
    # output must VARY with x so the chained harness never reaches a fixed
    # point (identical requests are cache-served by the tunnel)
    f32 = jnp.float32
    s = (
        jnp.sum(basis_ref[0, 0, :1, :].astype(f32))
        + jnp.sum(sel_ref[0, :1, :].astype(f32))
        + jnp.sum(win_ref[0, :1, :])
        + jnp.sum(w_ref[:1, :].astype(f32))
    )
    y_ref[0, 0] = (x_ref[0, 0].astype(f32) * 0.97 + s * 1e-6).astype(cdt)


def _mxu_kernel(K_, sel_ref, basis_ref, w_ref, win_ref, x_ref, y_ref):
    f32 = jnp.float32
    kern = jnp.dot(basis_ref[0, 0], w_ref[:], preferred_element_type=f32)  # [E, C]
    xj = jnp.dot(sel_ref[0], x_ref[0, 0], preferred_element_type=f32)  # [E, C]
    # cheapest possible combine: one row-block add, no K-sum/window/product
    # (kern damped so the chained values stay non-degenerate)
    y_ref[0, 0] = (kern[:TA] * 0.01 + xj[:TA] * 0.9).astype(cdt)


def _nowin_kernel(K_, sel_ref, basis_ref, w_ref, win_ref, x_ref, y_ref):
    f32 = jnp.float32
    kern = jnp.dot(basis_ref[0, 0], w_ref[:], preferred_element_type=f32)
    xj = jnp.dot(sel_ref[0], x_ref[0, 0], preferred_element_type=f32)
    msg = (kern * xj).reshape(K_, TA, C)
    y_ref[0, 0] = msg.sum(axis=0).astype(cdt)


def run(kernel_body, params=None, label=""):
    fn = pl.pallas_call(
        partial(kernel_body, K),
        grid=(Bp, O),
        in_specs=IN_SPECS,
        out_specs=OUT_SPEC,
        out_shape=OUT_SHAPE,
        compiler_params=params or _COMPILER_PARAMS,
    )

    # Measurement discipline for the axon tunnel (two failed harnesses):
    #  * five calls on identical inputs CSE into one — chain x through the
    #    layers instead (the conv output [Bp, O, TA, C] is exactly x's
    #    shape/dtype, so chaining costs nothing extra);
    #  * INDEPENDENT timed iterations overlap/elide on the tunnel (20
    #    iterations measured 0.02 ms for 403 GF — physically impossible,
    #    with or without distinct inputs), so each iteration's input is the
    #    previous iteration's output, like the train state in bench.py.
    ws = tuple(jnp.roll(w, i, axis=0) for i in range(LAYERS))

    @jax.jit
    def step(sel, basis, ws, win, x):
        for wi in ws:
            x = fn(sel, basis, wi, win, x)
        # renormalize once per 5 layers so chained values NEVER collapse to
        # an all-zero/inf fixed point (the tunnel serves identical requests
        # from a cache — a fixed point makes iterations 2..N free and the
        # timing bogus). One 26 MB elementwise pass (~0.06 ms), identical
        # across variants.
        xf = x.astype(jnp.float32)
        return (xf * (1.0 / (jnp.abs(xf).mean() + 1e-20))).astype(cdt)

    N = 20
    # fresh per-iteration perturbation: the renorm alone turns the chain
    # into a power iteration that CONVERGES to a fixed point, after which
    # identical requests are cache-served again (v0_full measured 0.03 ms
    # while passing the finite/nonzero check). eps_i are premade on device;
    # the add is one cheap elementwise op, identical across variants.
    eps = [
        jnp.asarray(rng.normal(size=(Bp, O, TA, C)) * 1e-2, cdt) for _ in range(N)
    ]
    for e in eps:
        e.block_until_ready()
    xt = step(sel, basis, ws, win, x)
    xt.block_until_ready()
    t0 = time.perf_counter()
    for i in range(N):
        xt = step(sel, basis, ws, win, xt + eps[i])
    xt.block_until_ready()
    ms = (time.perf_counter() - t0) / N * 1000
    assert bool(jnp.isfinite(xt.astype(jnp.float32)).all()) and float(
        jnp.abs(xt.astype(jnp.float32)).sum()
    ) > 0, f"{label}: chained state degenerated — timing untrustworthy"
    gf = 2 * (E * D * C + E * TA * C) * Bp * O * LAYERS / 1e9
    print(
        f"{label:10s}: {ms:6.2f} ms / {LAYERS} layers "
        f"({gf:.0f} GF -> {gf / ms:.1f} TF/s, {gf / ms / 197 * 100:.0f}% MFU)",
        flush=True,
    )
    return ms


def _fwd_oblk_kernel(K_, OB, sel_ref, basis_ref, w_ref, win_ref, x_ref, y_ref):
    """Production body over OB orientations per program: fewer, bigger
    blocks amortize the per-block DMA latency the v_dma floor exposed."""
    f32 = jnp.float32
    win = win_ref[0]
    for oi in range(OB):
        kern = jnp.dot(basis_ref[0, oi], w_ref[:], preferred_element_type=f32)
        kern = kern * win
        xj = jnp.dot(sel_ref[0], x_ref[0, oi], preferred_element_type=f32)
        msg = (kern * xj).reshape(K_, TA, C)
        y_ref[0, oi] = msg.sum(axis=0).astype(y_ref.dtype)


def run_oblk(OB, label):
    fn = pl.pallas_call(
        partial(_fwd_oblk_kernel, K, OB),
        grid=(Bp, O // OB),
        in_specs=[
            pl.BlockSpec((1, E, TA), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, OB, E, D), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, 1), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, OB, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, OB, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=OUT_SHAPE,
        compiler_params=_COMPILER_PARAMS,
    )
    ws = tuple(jnp.roll(w, i, axis=0) for i in range(LAYERS))

    @jax.jit
    def step(sel, basis, ws, win, x):
        for wi in ws:
            x = fn(sel, basis, wi, win, x)
        xf = x.astype(jnp.float32)
        return (xf * (1.0 / (jnp.abs(xf).mean() + 1e-20))).astype(cdt)

    N = 20
    eps = [jnp.asarray(np.random.default_rng(i).normal(size=(Bp, O, TA, C)) * 1e-2, cdt)
           for i in range(N)]
    for e in eps:
        e.block_until_ready()
    xt = step(sel, basis, ws, win, x)
    xt.block_until_ready()
    t0 = time.perf_counter()
    for i in range(N):
        xt = step(sel, basis, ws, win, xt + eps[i])
    xt.block_until_ready()
    ms = (time.perf_counter() - t0) / N * 1000
    gf = 2 * (E * D * C + E * TA * C) * Bp * O * LAYERS / 1e9
    print(f"{label:10s}: {ms:6.2f} ms / {LAYERS} layers "
          f"({gf / ms:.1f} TF/s, {gf / ms / 197 * 100:.0f}% MFU)", flush=True)
    return ms


VARIANTS = {
    "v0_full": lambda: run(_fwd_spatial_kernel, label="v0_full"),
    "v_dma": lambda: run(_dma_kernel, label="v_dma"),
    "v_mxu": lambda: run(_mxu_kernel, label="v_mxu"),
    "v_nowin": lambda: run(_nowin_kernel, label="v_nowin"),
    "v_par": lambda: run(_fwd_spatial_kernel, params=PAR_PARAMS, label="v_par"),
    "v_o2": lambda: run_oblk(2, "v_o2"),
    "v_o4": lambda: run_oblk(4, "v_o4"),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        VARIANTS[n]()
