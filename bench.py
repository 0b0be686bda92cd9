"""Benchmark: train steps/sec of the canonical crystal-diffusion config on the
available accelerator. Prints ONE JSON line on stdout (driver contract);
details go to stderr / BENCH_DETAIL.json.

Canonical config = the reference Makefile's train target
(/root/reference/Makefile:6-7): T=1000, radius=5, max_neighbors=8,
batch_size=270, hidden_dim=200 (5 layers, 16 orientations, basis 256). The
reference publishes no steps/sec; BASELINE.md derives ~780 steps/epoch and
~30 min to convergence on an A10. ``REF_STEPS_PER_SEC`` below is the
documented estimate used for ``vs_baseline``: assuming ~20 epochs to converge
(~15.6k steps in 30 min) => ~8.6 steps/s on the A10 in fp64.

Param accounting: the bench model is ~2.31M params — the same count the
reference Makefile config implies (hidden=200; its 18 MB fp64 checkpoint =
2.31M x 8 bytes). The reference README's "1.1M" corresponds to the argparse
default hidden=128, not the Makefile train target; see BASELINE.md.

Modes:
  python bench.py            # canonical shape (driver headline)
  python bench.py --sweep    # bucket ladder A in {16..256} at equal node
                             # budget: steps/s + MFU per bucket
  python bench.py --loader   # real input pipeline in the loop (collate +
                             # transfer overlap) instead of one cached batch
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REF_STEPS_PER_SEC = 8.6
NODE_BUDGET = 4096  # 256 crystals x 16 atoms at the canonical bucket
CANONICAL = (256, 16)
SWEEP = [(256, 16), (128, 32), (64, 64), (32, 128), (16, 256)]
WARMUP_STEPS = 3
MEASURE_STEPS = 20
# peak MXU rate used for MFU: TPU v5e ~197 TFLOP/s bf16 (override for other
# chips with --peak_tflops)
PEAK_TFLOPS_BF16 = 197.0


def build(batch_size: int, max_atoms: int, hidden: int = 200):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from arreau_tpu.data.synthetic import make_synthetic_batch, synthetic_z_table
    from arreau_tpu.tasks.diffusion import CrystalBatch, DiffusionConfig, DiffusionModel
    from arreau_tpu.train.loop import make_train_step
    from arreau_tpu.train.optim import make_optimizer
    from arreau_tpu.train.state import create_train_state

    z_table = synthetic_z_table()
    cfg = DiffusionConfig(
        num_atomic_states=len(z_table), compute_dtype="bfloat16", hidden_dim=hidden
    )
    model = DiffusionModel(cfg)

    rng = np.random.default_rng(0)
    host = make_synthetic_batch(rng, z_table, batch_size, max_atoms)
    batch = CrystalBatch(
        frac_x=jnp.asarray(host.frac_x),
        atom_types=jnp.asarray(host.atom_types),
        lattice=jnp.asarray(host.lattice),
        num_atoms=jnp.asarray(host.num_atoms),
        atom_mask=jnp.asarray(host.atom_mask),
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    tx = make_optimizer(3e-4)
    state = create_train_state(params, tx, ema_decay=None)
    step = make_train_step(model.loss, tx, donate=True)
    return model, state, step, batch, n_params


def measure(step, state, batch, flops_per_step=None, peak_tflops=PEAK_TFLOPS_BF16):
    import jax

    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP_STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, batch)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, batch)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    sps = MEASURE_STEPS / dt
    out = {"steps_per_sec": round(sps, 3), "ms_per_step": round(1000 * dt / MEASURE_STEPS, 2)}
    if flops_per_step:
        out["mfu"] = round(sps * flops_per_step / (peak_tflops * 1e12), 4)
        out["tflops_per_step"] = round(flops_per_step / 1e12, 3)
    return out, state


def pallas_step_flops(batch_size: int, max_atoms: int, hidden: int = 200,
                      basis_dim: int = 256, num_ori: int = 16, layers: int = 5,
                      max_neighbors: int = 8, attr_dim: int = 6, degree: int = 3):
    """Hand-counted matmul FLOPs of the Pallas custom calls in one train step
    (XLA's cost_analysis reports ZERO flops for custom calls, so the MFU
    denominator must add these). Split-conv path (ops/pallas_conv.py)
    + fused basis backward (ops/pallas_basis.py), real (unpadded) flops."""
    from arreau_tpu.ops.pallas_conv import pick_tile

    B, A, K, O, D, C = batch_size, max_atoms, max_neighbors, num_ori, basis_dim, hidden
    T = pick_tile(B, A, target=128)
    Bp, TA = B // T, T * A
    E = K * TA
    per_bo_fwd = (E * D * C + E * TA * C) * 2  # kern matmul + one-hot gather
    # bwd: kern + xj recompute, dbasis, dW, dx-scatter
    per_bo_bwd = (3 * E * D * C + 2 * E * TA * C) * 2
    conv = layers * Bp * O * (per_bo_fwd + per_bo_bwd)
    # fused basis backward kernel: poly selection (3 matmuls) + recompute
    # h1/h2 + dW2 + dh1 + dW1 (BasisMLP hidden == model hidden_dim)
    F = sum(attr_dim**i for i in range(1, degree + 1))
    d1 = attr_dim + 1
    H = hidden
    per_bo_basis = (3 * E * d1 * F
                    + 2 * (E * F * H)       # h1 recompute + dW1
                    + 3 * (E * H * D)) * 2  # h2 recompute + dW2 + dh1
    basis = Bp * O * per_bo_basis
    # fused poly+dense_in FORWARD kernel (ops/pallas_basis._h1_fwd): its
    # poly-selection + dense_in matmuls were XLA-visible before round 3,
    # now inside a custom call -> add them here. The kernel only engages at
    # E >= _H1_KERNEL_MIN_E rows (below that _h1 stays in XLA and
    # cost_analysis already counts it) — mirror that gate to avoid
    # double-counting small shapes.
    from arreau_tpu.ops.pallas_basis import _H1_KERNEL_MIN_E

    basis_fwd = 0
    if E >= _H1_KERNEL_MIN_E:
        per_bo_h1 = (3 * E * d1 * F + E * F * H) * 2
        basis_fwd = Bp * O * per_bo_h1
    return conv + basis + basis_fwd


def step_flops(step, state, batch, batch_size=None, max_atoms=None, hidden=200):
    """XLA's flop estimate for the compiled step + hand-counted Pallas flops
    (custom calls are invisible to cost_analysis)."""
    import jax

    try:
        compiled = step.lower(state, jax.random.PRNGKey(1), batch).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        xla = float(ca.get("flops", 0.0)) or None
    except Exception:
        return None
    if xla is None:
        return None
    # Pallas custom calls only exist on the TPU path (PonitaFiberBundle
    # resolves use_pallas from the backend); elsewhere the same matmuls are
    # XLA-visible and already counted above.
    if batch_size is not None and jax.default_backend() == "tpu":
        xla += pallas_step_flops(batch_size, max_atoms, hidden=hidden)
    return xla


def bench_one(batch_size, max_atoms, peak_tflops, want_flops=True, hidden=200):
    model, state, step, batch, n_params = build(batch_size, max_atoms, hidden=hidden)
    flops = (
        step_flops(step, state, batch, batch_size, max_atoms, hidden=hidden)
        if want_flops
        else None
    )
    res, _ = measure(step, state, batch, flops, peak_tflops)
    res.update({"batch": batch_size, "max_atoms": max_atoms, "params_m": round(n_params / 1e6, 2)})
    if hidden != 200:
        res["hidden_dim"] = hidden
    return res


def bench_loader(peak_tflops):
    """Canonical shape with the real input pipeline in the loop: bucketed
    loader -> C++ collate -> device transfer -> step (prefetched)."""
    import jax

    from arreau_tpu.data.crystal import BucketedLoader
    from arreau_tpu.data.synthetic import synthetic_packed
    from arreau_tpu.utils import prefetch

    model, state, step, batch, n_params = build(*CANONICAL)
    ds = synthetic_packed(6000, seed=0, max_atoms=16, min_atoms=4)
    import numpy as np

    loader = BucketedLoader(
        ds, np.arange(len(ds)), node_budget=NODE_BUDGET, buckets=(16,), seed=0
    )

    def device_batches():
        for host in loader:
            yield jax.tree.map(jax.device_put, host)

    key = jax.random.PRNGKey(1)
    # warmup epoch (compile + cache)
    for db in prefetch(device_batches(), depth=2):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, db)
    jax.block_until_ready(metrics["loss"])

    n = 0
    t0 = time.perf_counter()
    for db in prefetch(device_batches(), depth=2):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, db)
        n += 1
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    return {"steps_per_sec": round(n / dt, 3), "steps": n, "mode": "loader-in-loop"}


SAMPLER_GRID = [(10, 4), (100, 8), (64, 16), (32, 64), (8, 128)]


def bench_sampler(peak_tflops):
    """Sampler throughput ladder: crystals/min + ms/step over a batch x atoms
    grid (the reference generates at 10x4, main_diffusion_generate.py:57;
    real crystals run to 236 atoms). Full T=1000 reverse chain per point."""
    import time

    import jax

    model, state, step, batch, n_params = build(*CANONICAL)
    params = state.params
    rows = []
    for bs, atoms in SAMPLER_GRID:
        key = jax.random.PRNGKey(0)
        out = model.sample(params, key, bs, atoms)  # compile + warm run
        jax.block_until_ready(out.frac_x)
        t0 = time.perf_counter()
        out = model.sample(params, jax.random.PRNGKey(1), bs, atoms)
        jax.block_until_ready(out.frac_x)
        dt = time.perf_counter() - t0
        T = model.config.num_timesteps
        row = {
            "batch": bs, "atoms": atoms,
            "crystals_per_min": round(bs / dt * 60, 1),
            "ms_per_reverse_step": round(dt / T * 1000, 3),
            "batch_seconds": round(dt, 2),
        }
        rows.append(row)
        print(f"sampler {bs}x{atoms}: {row}", file=sys.stderr, flush=True)

    # strided (DDIM-family) sampler at the canonical point: cost scales S/T,
    # so 50 steps ~ 20x the crystals/min of the full T=1000 chain
    for steps in (50, 100):
        bs, atoms = 100, 8
        out = model.sample(params, jax.random.PRNGKey(0), bs, atoms, sample_steps=steps)
        jax.block_until_ready(out.frac_x)
        t0 = time.perf_counter()
        out = model.sample(params, jax.random.PRNGKey(1), bs, atoms, sample_steps=steps)
        jax.block_until_ready(out.frac_x)
        dt = time.perf_counter() - t0
        row = {
            "batch": bs, "atoms": atoms, "sample_steps": steps,
            "crystals_per_min": round(bs / dt * 60, 1),
            "ms_per_reverse_step": round(dt / steps * 1000, 3),
            "batch_seconds": round(dt, 2),
        }
        rows.append(row)
        print(f"sampler {bs}x{atoms} strided S={steps}: {row}", file=sys.stderr, flush=True)
    return rows


def _probe_tunnel() -> None:
    """Fail fast when the axon TPU relay is dead: its JAX client hangs
    forever in ``jax.devices()`` when the relay port refuses connections
    (observed round 3), which would stall the whole bench. A 3-second TCP
    probe turns that hang into an immediate, diagnosable error."""
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return
    import socket

    s = socket.socket()
    s.settimeout(3)
    try:
        s.connect(("127.0.0.1", 8082))
    except OSError as e:
        print(
            f"axon TPU relay unreachable on 127.0.0.1:8082 ({e}); "
            "refusing to start (jax.devices() would hang forever). "
            "Re-run when the tunnel is back, or set JAX_PLATFORMS=cpu.",
            file=sys.stderr,
        )
        raise SystemExit(2)
    finally:
        s.close()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sweep", action="store_true")
    p.add_argument("--loader", action="store_true")
    p.add_argument("--sampler", action="store_true")
    p.add_argument("--ceiling", action="store_true",
                   help="framework-ceiling row: the canonical batch/depth at "
                        "an MXU-aligned width (hidden=256) — shows the MFU "
                        "when the reference's 200-wide padding walls "
                        "(200->256 lanes, 800->896) are absent")
    p.add_argument("--peak_tflops", type=float, default=PEAK_TFLOPS_BF16)
    args = p.parse_args()

    _probe_tunnel()

    from arreau_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # merge into the existing detail file so partial runs (--sampler only)
    # keep the other sections' latest numbers
    detail = {}
    if os.path.exists("BENCH_DETAIL.json"):
        try:
            with open("BENCH_DETAIL.json") as f:
                detail = json.load(f)
        except Exception:
            detail = {}
        if not isinstance(detail, dict):  # legacy/hand-edited payloads
            detail = {}
    if args.sweep:
        detail["sweep"] = []
        for bs, a in SWEEP:
            r = bench_one(bs, a, args.peak_tflops)
            detail["sweep"].append(r)
            print(f"bucket A={a:4d} B={bs:4d}: {r}", file=sys.stderr, flush=True)
    if args.loader:
        detail["loader"] = bench_loader(args.peak_tflops)
        print(f"loader-in-loop: {detail['loader']}", file=sys.stderr, flush=True)
    if args.sampler:
        detail["sampler"] = bench_sampler(args.peak_tflops)
    if args.ceiling:
        r = bench_one(*CANONICAL, args.peak_tflops, hidden=256)
        detail["ceiling_hidden256"] = r
        print(f"framework ceiling (hidden=256): {r}", file=sys.stderr, flush=True)

    head = bench_one(*CANONICAL, args.peak_tflops)
    detail["canonical"] = head
    if args.sweep or args.loader or args.sampler or args.ceiling:
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=2)

    print(
        json.dumps(
            {
                "metric": f"diffusion train steps/sec (batch {CANONICAL[0]}x{CANONICAL[1]}, {head['params_m']}M params)",
                "value": head["steps_per_sec"],
                "unit": "steps/s",
                "vs_baseline": round(head["steps_per_sec"] / REF_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
