"""Fused Pallas fiber-conv kernel: parity with the XLA oracle (interpret
mode on CPU; the same code compiles natively on TPU) and model-level parity
of the use_pallas backbone path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arreau_tpu.ops.pallas_conv import (
    fused_fiber_conv,
    make_gather_matrix,
    pick_tile,
    reference_fiber_conv,
)


def _data(B=4, A=8, K=4, O=4, D=16, C=32, P=None, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    P = P or O
    basis = jnp.asarray(rng.normal(size=(B, A, K, O, D)), dtype)
    w = jnp.asarray(rng.normal(size=(D, C)) * 0.1, dtype)
    x = jnp.asarray(rng.normal(size=(B, A, O, C)), dtype)
    src = jnp.asarray(rng.integers(0, A, size=(B, A, K)), jnp.int32)
    mask = jnp.asarray(rng.random((B, A, K)) > 0.3)
    fk = jnp.asarray(rng.normal(size=(O, P, C)) * 0.3, dtype)
    return basis, w, x, src, mask, fk


def _to_kernel_layout(basis, x, src, mask, tile):
    """Standard layouts -> the fused kernel's super-crystal layouts."""
    B, A, K, O, D = basis.shape
    Bp = B // tile
    basis_om = basis.reshape(Bp, tile, A, K, O, D).transpose(0, 4, 3, 1, 2, 5)
    basis_om = basis_om.reshape(Bp, O, K * tile * A, D)
    x_om = x.reshape(Bp, tile, A, O, -1).transpose(0, 3, 1, 2, 4)
    x_om = x_om.reshape(Bp, O, tile * A, x.shape[-1])
    sel = make_gather_matrix(src, mask, dtype=basis.dtype, crystals_per_tile=tile)
    return basis_om, x_om, sel


def _from_kernel_layout(y, B, A, tile):
    """[B', P, TA, C] -> [B, A, P, C]."""
    Bp, P, TA, C = y.shape
    return y.reshape(Bp, P, tile, A, C).transpose(0, 2, 3, 1, 4).reshape(B, A, P, C)


def _run_fused(basis, w, x, src, mask, fk, tile):
    B, A = basis.shape[0], basis.shape[1]
    basis_om, x_om, sel = _to_kernel_layout(basis, x, src, mask, tile)
    y = fused_fiber_conv(basis_om, w, x_om, sel, fk)
    return _from_kernel_layout(y, B, A, tile)


def test_fused_conv_forward_parity():
    basis, w, x, src, mask, fk = _data()
    y_ref = reference_fiber_conv(basis, w, x, src, mask, fk)
    for tile in (1, 2, 4):
        y_pal = _run_fused(basis, w, x, src, mask, fk, tile)
        np.testing.assert_allclose(
            np.asarray(y_pal), np.asarray(y_ref), rtol=1e-5, atol=1e-5,
            err_msg=f"tile={tile}",
        )


def test_fused_conv_gradient_parity():
    basis, w, x, src, mask, fk = _data(seed=1)

    def loss_r(basis, w, x, fk):
        return (reference_fiber_conv(basis, w, x, src, mask, fk) ** 2).sum()

    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(basis, w, x, fk)
    for tile in (1, 2):
        def loss_p(basis, w, x, fk, tile=tile):
            return (_run_fused(basis, w, x, src, mask, fk, tile) ** 2).sum()

        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(basis, w, x, fk)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
                err_msg=f"tile={tile}",
            )


def test_pick_tile():
    assert pick_tile(256, 16) == 16
    assert pick_tile(16, 256) == 1
    assert pick_tile(170, 24) == 10  # largest divisor with T*24 <= 256
    assert pick_tile(7, 8) == 7
    assert pick_tile(1, 8) == 1


@pytest.mark.slow
def test_model_pallas_path_matches_xla_path():
    """PonitaFiberBundle with use_pallas=True (interpret mode on CPU) must
    match the XLA path closely (B=6, A=5 -> tile 6 exercises super-crystals)."""
    from arreau_tpu.models.ponita import PonitaConfig, PonitaFiberBundle
    from tests.test_ponita import _make_inputs

    base = dict(
        hidden_dim=16, basis_dim=8, degree=2, num_layers=2, radius=4.0,
        num_ori=4, output_dim_scalar=3, output_dim_vec=1,
        output_dim_global_scalar=2, output_dim_global_vec=0,
        output_dim_edge_scalar=0, remat=False,
    )
    cfg_x = PonitaConfig(**base, use_pallas=False)
    cfg_p = PonitaConfig(**base, use_pallas=True)
    inputs, _ = _make_inputs(jax.random.PRNGKey(0), cfg=cfg_x, dtype=jnp.float32)
    model_x = PonitaFiberBundle(cfg_x)
    model_p = PonitaFiberBundle(cfg_p)
    params = model_x.init(jax.random.PRNGKey(1), inputs)
    out_x = model_x.apply(params, inputs)
    out_p = model_p.apply(params, inputs)
    np.testing.assert_allclose(
        np.asarray(out_p.node_scalar), np.asarray(out_x.node_scalar), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_p.global_scalar), np.asarray(out_x.global_scalar), rtol=2e-4, atol=1e-5
    )


@pytest.mark.slow
def test_model_pallas_gradients_match_xla_path():
    """Full-model gradient parity between the fused-kernel path and XLA."""
    from arreau_tpu.models.ponita import PonitaConfig, PonitaFiberBundle
    from tests.test_ponita import _make_inputs

    base = dict(
        hidden_dim=8, basis_dim=8, degree=2, num_layers=2, radius=4.0,
        num_ori=4, output_dim_scalar=2, output_dim_vec=1,
        output_dim_global_scalar=1, output_dim_global_vec=0,
        output_dim_edge_scalar=0, remat=False,
    )
    cfg_x = PonitaConfig(**base, use_pallas=False)
    cfg_p = PonitaConfig(**base, use_pallas=True)
    inputs, _ = _make_inputs(jax.random.PRNGKey(2), cfg=cfg_x, dtype=jnp.float32)
    model_x = PonitaFiberBundle(cfg_x)
    model_p = PonitaFiberBundle(cfg_p)
    params = model_x.init(jax.random.PRNGKey(3), inputs)

    def loss(model):
        def f(p):
            out = model.apply(p, inputs)
            return (
                (out.node_scalar**2).sum()
                + (out.node_vec**2).sum()
                + (out.global_scalar**2).sum()
            )
        return f

    from jax.flatten_util import ravel_pytree

    gx = jax.grad(loss(model_x))(params)
    gp = jax.grad(loss(model_p))(params)
    flat_x, _ = ravel_pytree(gx)
    flat_p, _ = ravel_pytree(gp)
    np.testing.assert_allclose(
        np.asarray(flat_p), np.asarray(flat_x), rtol=5e-4, atol=1e-5
    )


def test_split_spatial_kernel_with_window_parity():
    """fused_spatial_conv applies the per-edge window in-kernel; fwd + grads
    (incl. d(window)) must match the XLA oracle with basis*window."""
    from arreau_tpu.ops.pallas_conv import fused_spatial_conv

    basis, w, x, src, mask, fk = _data(seed=4)
    B, A, K = src.shape
    O = basis.shape[3]
    rng = np.random.default_rng(9)
    win_std = jnp.asarray(rng.uniform(0.2, 1.0, size=(B, A, K)), jnp.float32)

    def ref_loss(basis, w, x, win):
        bw = basis * win[..., None, None]
        kern = jnp.einsum("bakod,dc->bakoc", bw, w).astype(jnp.float32)
        idx = src.reshape(B, A * K)[:, :, None, None]
        x_j = jnp.take_along_axis(x, idx, axis=1).reshape(B, A, K, O, -1)
        msg = kern * x_j.astype(jnp.float32)
        x_sp = jnp.where(mask[..., None, None], msg, 0.0).sum(axis=2)
        return (x_sp**2).sum()

    for tile in (1, 2):
        Bp = B // tile
        basis_om, x_om, sel = _to_kernel_layout(basis, x, src, mask, tile)
        win_k = win_std.reshape(Bp, tile, A, K).transpose(0, 3, 1, 2).reshape(
            Bp, K * tile * A, 1
        )

        def pal_loss(basis_om, w, x_om, win_k):
            return (fused_spatial_conv(basis_om, w, x_om, sel, win_k) ** 2).sum()

        yp = pal_loss(basis_om, w, x_om, win_k)
        yr = ref_loss(basis, w, x, win_std)
        np.testing.assert_allclose(float(yp), float(yr), rtol=1e-5)

        gp = jax.grad(pal_loss, argnums=(0, 1, 2, 3))(basis_om, w, x_om, win_k)
        gr = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(basis, w, x, win_std)
        # map layouts back for comparison
        D = basis.shape[-1]
        gb = np.asarray(gp[0]).reshape(Bp, O, K, tile, A, D).transpose(
            0, 3, 4, 2, 1, 5
        ).reshape(B, A, K, O, D)
        gx = np.asarray(gp[2]).reshape(Bp, O, tile, A, -1).transpose(
            0, 2, 3, 1, 4
        ).reshape(B, A, O, -1)
        gw = np.asarray(gp[3]).reshape(Bp, K, tile, A).transpose(0, 2, 3, 1).reshape(
            B, A, K
        )
        np.testing.assert_allclose(gb, np.asarray(gr[0]), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(gx, np.asarray(gr[2]), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(gw, np.asarray(gr[3]), rtol=1e-4, atol=1e-4)


def test_fused_basis_mlp_matches_flax_oracle():
    """fused_basis_mlp (interpret mode) == polynomial_features + bias-free
    Dense/GELU chain, for values and weight gradients; the attribute
    cotangent is intentionally zero."""
    from arreau_tpu.models.blocks import BasisMLP, polynomial_feature_dim
    from arreau_tpu.ops.pallas_basis import fused_basis_mlp

    rng = np.random.default_rng(3)
    Bp, O, E, d = 2, 4, 16, 6
    H, D, degree = 12, 10, 3
    attr = jnp.asarray(rng.normal(size=(Bp, O, E, d)), jnp.float32)

    ref = BasisMLP(H, D, degree, use_bias=False)
    params = ref.init(jax.random.PRNGKey(0), attr)
    w1 = params["params"]["dense_in"]["kernel"]
    w2 = params["params"]["dense_out"]["kernel"]
    assert w1.shape == (polynomial_feature_dim(d, degree), H)

    want = ref.apply(params, attr)
    got = fused_basis_mlp(attr, w1, w2, degree, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # fused module path shares the param tree
    fused_mod = BasisMLP(H, D, degree, use_bias=False, fused=True)
    got_mod = fused_mod.apply(params, attr)
    np.testing.assert_allclose(np.asarray(got_mod), np.asarray(want), rtol=2e-5, atol=2e-5)

    def loss_ref(w1, w2):
        p = {"params": {"dense_in": {"kernel": w1}, "dense_out": {"kernel": w2}}}
        return (ref.apply(p, attr) ** 2).sum()

    def loss_fused(w1, w2):
        return (fused_basis_mlp(attr, w1, w2, degree, jnp.float32) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(w1, w2)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(w1, w2)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4)

    # attr cotangent is declared dead (zeros)
    dattr = jax.grad(lambda at: (fused_basis_mlp(at, w1, w2, degree, jnp.float32) ** 2).sum())(attr)
    assert float(jnp.abs(dattr).max()) == 0.0


def test_basis_mlp_multi_matches_flax_oracle():
    """basis_mlp_multi (fused Pallas backward, interpret mode) matches the
    flax BasisMLP with biases: forward parity, and weight/bias grads when
    each of the n_out aliased outputs is consumed by a different function."""
    from arreau_tpu.models.blocks import BasisMLP, MultiBasisMLP, polynomial_features
    from arreau_tpu.ops.pallas_basis import basis_mlp_multi

    rng = np.random.default_rng(3)
    Bp, O, E, d, H, D, degree, n_out = 2, 4, 16, 3, 16, 24, 3, 3
    attr = jnp.asarray(rng.normal(size=(Bp, O, E, d)), jnp.float32)
    coeffs = [jnp.asarray(rng.normal(size=(D,)), jnp.float32) for _ in range(n_out)]

    ref = BasisMLP(H, D, degree, use_bias=True)
    params = ref.init(jax.random.PRNGKey(0), attr)
    # give the zero-init biases nontrivial values
    params = jax.tree.map(
        lambda p: p + 0.05 * jnp.asarray(np.random.default_rng(7).normal(size=p.shape), p.dtype),
        params,
    )
    pi, po = params["params"]["dense_in"], params["params"]["dense_out"]
    w1, b1, w2, b2 = pi["kernel"], pi["bias"], po["kernel"], po["bias"]

    attrT = attr.swapaxes(-1, -2)  # lane-major kernel layout [B', O, d, E]
    want = ref.apply(params, attr)
    got = basis_mlp_multi(attrT, w1, b1, w2, b2, degree, n_out)
    assert len(got) == n_out
    for g in got:
        np.testing.assert_allclose(np.asarray(g), np.asarray(want), rtol=2e-5, atol=2e-5)

    # MultiBasisMLP module shares the BasisMLP param tree exactly
    mod = MultiBasisMLP(H, D, degree, n_out=n_out, use_bias=True)
    got_mod = mod.apply(params, attrT)
    np.testing.assert_allclose(np.asarray(got_mod[0]), np.asarray(want), rtol=2e-5, atol=2e-5)
    init_mod = jax.tree.map(jnp.shape, mod.init(jax.random.PRNGKey(0), attrT))
    init_ref = jax.tree.map(jnp.shape, ref.init(jax.random.PRNGKey(0), attr))
    assert init_mod == init_ref

    def loss_ref(w1, b1, w2, b2):
        p = {"params": {"dense_in": {"kernel": w1, "bias": b1},
                        "dense_out": {"kernel": w2, "bias": b2}}}
        y = ref.apply(p, attr)
        return sum(((y * c) ** 2).sum() for c in coeffs)

    def loss_multi(w1, b1, w2, b2):
        ys = basis_mlp_multi(attrT, w1, b1, w2, b2, degree, n_out)
        return sum(((y * c) ** 2).sum() for y, c in zip(ys, coeffs))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(w1, b1, w2, b2)
    g_multi = jax.grad(loss_multi, argnums=(0, 1, 2, 3))(w1, b1, w2, b2)
    for a, b in zip(g_multi, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4)

    # attr cotangent is declared dead (zeros)
    dattr = jax.grad(
        lambda a_: sum(((y) ** 2).sum() for y in basis_mlp_multi(a_, w1, b1, w2, b2, degree, n_out))
    )(attrT)
    assert float(jnp.abs(dattr).max()) == 0.0

    # the production-scale _h1_fwd kernel path (size-gated off at this tiny E)
    # matches the XLA first-layer chain when forced on
    from arreau_tpu.ops.pallas_basis import _h1

    h1_kernel = _h1(attrT, w1, b1, degree, force_kernel=True)
    h1_xla = _h1(attrT, w1, b1, degree)
    np.testing.assert_allclose(
        np.asarray(h1_kernel), np.asarray(h1_xla), rtol=2e-5, atol=2e-5
    )


def test_fused_convnext_mlp_matches_flax_oracle():
    """fused_convnext_mlp (interpret mode) == LayerNorm -> Dense -> GELU ->
    Dense -> layer_scale -> +residual (+ readout Dense): forward and all
    grads, in f32 where the comparison is exact to tolerance."""
    import flax.linen as nn

    from arreau_tpu.ops.pallas_convnext import fused_convnext_mlp

    rng = np.random.default_rng(11)
    Bp, O, TA, C, W, R = 2, 3, 8, 16, 32, 5
    f32 = jnp.float32
    xc = jnp.asarray(rng.normal(size=(Bp, O, TA, C)), f32)
    res = jnp.asarray(rng.normal(size=(Bp, O, TA, C)), f32)
    ln_s = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)), f32)
    ln_b = jnp.asarray(0.1 * rng.normal(size=(C,)), f32)
    w1 = jnp.asarray(rng.normal(size=(C, W)) * 0.2, f32)
    b1 = jnp.asarray(rng.normal(size=(W,)) * 0.1, f32)
    w2 = jnp.asarray(rng.normal(size=(W, C)) * 0.2, f32)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.1, f32)
    gamma = jnp.asarray(rng.normal(size=(C,)) * 0.5, f32)
    wr = jnp.asarray(rng.normal(size=(C, R)) * 0.3, f32)
    br = jnp.asarray(rng.normal(size=(R,)) * 0.1, f32)

    def oracle(xc, res, ln_s, ln_b, w1, b1, w2, b2, gamma, wr, br):
        h = nn.LayerNorm().apply(
            {"params": {"scale": ln_s, "bias": ln_b}}, xc.astype(f32)
        )
        h = jax.nn.gelu(h @ w1 + b1)
        m = h @ w2 + b2
        out = res + gamma * m
        return out, out @ wr + br

    args = (xc, res, ln_s, ln_b, w1, b1, w2, b2, gamma, wr, br)
    out_p, r_p = fused_convnext_mlp(*args, f32)
    out_o, r_o = oracle(*args)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_o), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_o), rtol=2e-5, atol=2e-5)

    def loss_p(*a):
        out, r = fused_convnext_mlp(*a, f32)
        return (out**2).sum() + (r * jnp.arange(R)).sum()

    def loss_o(*a):
        out, r = oracle(*a)
        return (out**2).sum() + (r * jnp.arange(R)).sum()

    gp = jax.grad(loss_p, argnums=tuple(range(11)))(*args)
    go = jax.grad(loss_o, argnums=tuple(range(11)))(*args)
    for i, (a, b) in enumerate(zip(gp, go)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
            err_msg=f"grad argnum {i}",
        )

    # no-readout variant
    out_nr, r_nr = fused_convnext_mlp(*args[:9], None, None, f32)
    assert r_nr is None
    np.testing.assert_allclose(np.asarray(out_nr), np.asarray(out_o), rtol=2e-5, atol=2e-5)


def test_env_gated_convnext_variants_match_default(monkeypatch):
    """The documented-negative-result env gates (ARREAU_LN_NATIVE: flax
    upcasts inside the LN stat reduction; ARREAU_GELU_SAVED: custom-VJP GELU
    with a saved derivative) must stay numerically equivalent to the default
    chain — forward and parameter gradients."""
    import importlib

    import arreau_tpu.models.blocks as blocks

    def run(env):
        for k in ("ARREAU_LN_NATIVE", "ARREAU_GELU_SAVED"):
            monkeypatch.delenv(k, raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        importlib.reload(blocks)
        m = blocks.ConvNextBlock(
            channels=16, dtype=jnp.bfloat16, use_pallas=False,
            return_messages=False, expected_degree=4.0,
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 16)), jnp.float32)
        kb = jnp.asarray(rng.normal(size=(2, 4, 3, 4, 8)), jnp.float32)
        fkb = jnp.asarray(rng.normal(size=(4, 4, 8)), jnp.float32)
        src = jnp.zeros((2, 4, 3), jnp.int32)
        em = jnp.ones((2, 4, 3), bool)
        p = m.init(jax.random.PRNGKey(0), x, kb, fkb, src, em)

        def loss(p_):
            out, _, _ = m.apply(p_, x, kb, fkb, src, em)
            return (out.astype(jnp.float32) ** 2).sum()

        val, grads = jax.value_and_grad(loss)(p)
        return float(val), grads

    v0, g0 = run({})
    for env in ({"ARREAU_LN_NATIVE": "1"}, {"ARREAU_GELU_SAVED": "1"}):
        v1, g1 = run(env)
        assert abs(v1 - v0) / max(abs(v0), 1e-9) < 2e-2, (env, v0, v1)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=5e-2, atol=5e-2, err_msg=str(env),
            )
    run({})  # restore the default-path module state for later tests
