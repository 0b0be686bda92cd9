"""D3PM discrete (masking) diffusion over atom types, pure-function.

Re-design of the reference's ``D3PM`` module
(/root/reference/diffusion/d3pm.py:8-256): precomputed one-step-transposed and
cumulative transition tables, gumbel-argmax forward corruption, hybrid
VB-KL + cross-entropy loss, and gumbel posterior reverse sampling. The "mask"
forward process moves every real class to the absorbing MASK class (last
index) with probability 0.02 per step.

All functions operate on dense batches ``x: [B, A]`` of class indices with
per-atom timesteps ``t: [B, A]`` in ``[1, T]`` and an ``atom_mask`` for
padding (the reference has no padding; masked slots are excluded from loss
means and pinned to class 0 internally).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-6
MASK_TRANSITION_PROB = 0.02


class D3PMTables(NamedTuple):
    q_one_step_transposed: jax.Array  # [T, C, C]
    q_mats: jax.Array  # [T, C, C] cumulative products Qbar_t = Q_1 ... Q_t
    hybrid_loss_coeff: float

    @property
    def num_classes(self) -> int:
        return self.q_mats.shape[-1]

    @property
    def num_steps(self) -> int:
        return self.q_mats.shape[0]


def make_d3pm_tables(
    num_steps: int,
    num_classes: int,
    forward_type: str = "mask",
    hybrid_loss_coeff: float = 0.001,
    dtype=jnp.float32,
    mask_prob: float = MASK_TRANSITION_PROB,
) -> D3PMTables:
    """Build the transition tables on the host (numpy, fp64) then cast.

    ``mask``: per-step probability ``mask_prob`` (reference: 0.02,
    /root/reference/diffusion/d3pm.py:33-40) of jumping to the absorbing last
    class; ``uniform``: classic uniform D3PM with ``beta_t = 1/(T - t + 1)``.
    Raising ``mask_prob`` shifts unmask times earlier in the reverse chain —
    the knob for the type-geometry mutual-information ceiling experiment
    (BASELINE.md).
    """
    one_step = _one_step_mats(num_steps, num_classes, forward_type, mask_prob)

    q_mats = np.zeros_like(one_step)
    q_mats[0] = one_step[0]
    for idx in range(1, num_steps):
        q_mats[idx] = q_mats[idx - 1] @ one_step[idx]

    return D3PMTables(
        q_one_step_transposed=jnp.asarray(one_step.transpose(0, 2, 1), dtype=dtype),
        q_mats=jnp.asarray(q_mats, dtype=dtype),
        hybrid_loss_coeff=hybrid_loss_coeff,
    )


def _one_step_mats(num_steps: int, num_classes: int, forward_type: str, mask_prob: float) -> np.ndarray:
    """Host-side one-step transition matrices Q_1..Q_T (fp64)."""
    betas = [1.0 / (num_steps - t + 1) for t in range(1, num_steps + 1)]
    one_step = np.zeros((num_steps, num_classes, num_classes), dtype=np.float64)
    for i, beta in enumerate(betas):
        if forward_type == "uniform":
            mat = np.full((num_classes, num_classes), beta / num_classes)
            np.fill_diagonal(mat, 1 - (num_classes - 1) * beta / num_classes)
        elif forward_type == "mask":
            mat = np.zeros((num_classes, num_classes))
            mat[:, -1] = mask_prob
            np.fill_diagonal(mat, 1 - mask_prob)
            mat[-1, -1] = 1.0
        else:
            raise NotImplementedError(forward_type)
        one_step[i] = mat
    return one_step


def make_strided_transitions(
    num_steps: int,
    num_classes: int,
    ts: np.ndarray,
    forward_type: str = "mask",
    mask_prob: float = MASK_TRANSITION_PROB,
    dtype=jnp.float32,
) -> jax.Array:
    """Transposed strided transition matrices for a timestep subsequence.

    ``ts`` is an increasing int array of timesteps ``0 = ts[0] < ... <
    ts[-1] = T-1`` (sampler state levels). Returns ``[K, C, C]`` where entry
    ``k`` is ``(Q_{s+1} Q_{s+2} ... Q_t)^T`` for the pair ``s = ts[k], t =
    ts[k+1]`` — i.e. the transposed transition kernel of the forward chain
    from level s to level t, the strided analogue of
    ``q_one_step_transposed``. Built host-side in fp64 like
    :func:`make_d3pm_tables`. Beyond-parity: the reference D3PM
    (/root/reference/diffusion/d3pm.py:25-65) only tabulates adjacent steps.
    """
    ts = np.asarray(ts, dtype=np.int64)
    if ts.ndim != 1 or ts.size < 2 or np.any(np.diff(ts) <= 0):
        raise ValueError("ts must be a strictly increasing timestep sequence")
    if ts[-1] > num_steps - 1 or ts[0] < 0:
        raise ValueError(f"ts out of range [0, {num_steps - 1}]")
    one_step = _one_step_mats(num_steps, num_classes, forward_type, mask_prob)
    out = np.zeros((ts.size - 1, num_classes, num_classes), dtype=np.float64)
    for k in range(ts.size - 1):
        s, t = int(ts[k]), int(ts[k + 1])
        # Q_{s -> t} = Q_{s+1} ... Q_t ; one_step[i] is Q_{i+1}
        mat = np.eye(num_classes)
        for i in range(s, t):
            mat = mat @ one_step[i]
        out[k] = mat
    return jnp.asarray(out.transpose(0, 2, 1), dtype=dtype)


def d3pm_strided_reverse_step(
    tables: D3PMTables,
    q_strided_transposed: jax.Array,
    key: jax.Array,
    xt: jax.Array,
    predicted_x0_logits: jax.Array,
    s: jax.Array,
    temperature: float = 1.0,
) -> jax.Array:
    """Strided gumbel posterior step t -> s using a precomputed strided
    transition (one ``[C, C]`` transposed matrix from
    :func:`make_strided_transitions`).

    ``q(x_s | x_t, x0) \\propto q(x_t | x_s) q(x_s | x0)`` — identical shape
    to the adjacent-step posterior with ``Q_t`` replaced by ``Q_{s->t}`` and
    ``Qbar_{t-1}`` by ``Qbar_s``. ``s``: ``[B, A]`` target level; ``s == 0``
    samples from the x0 logits directly (the strided analogue of the
    reference's ``t == 1`` case, d3pm.py:94-101) with the same 5x gumbel
    damping as the final adjacent step.
    """
    fact1 = q_strided_transposed[xt, :]  # [B, A, C]
    softmaxed = jax.nn.softmax(predicted_x0_logits, axis=-1)
    qbar_s = tables.q_mats[jnp.maximum(s - 1, 0)]  # [B, A, C, C]
    fact2 = jnp.einsum("...c,...cd->...d", softmaxed, qbar_s)
    post = jnp.log(fact1 + EPS) + jnp.log(fact2 + EPS)
    post = jnp.where((s == 0)[..., None], predicted_x0_logits, post)
    g = _gumbel(key, post.shape, post.dtype)
    damp = 0.2 + (s != 0).astype(post.dtype) * 0.8
    return jnp.argmax(post + g * (temperature * damp[..., None]), axis=-1)


def _gumbel(key: jax.Array, shape, dtype) -> jax.Array:
    u = jax.random.uniform(key, shape, dtype=dtype, minval=0.0, maxval=1.0)
    u = jnp.clip(u, EPS, 1.0)
    return -jnp.log(-jnp.log(u))


def d3pm_sample_xt(
    tables: D3PMTables, key: jax.Array, x0: jax.Array, t: jax.Array
) -> jax.Array:
    """Forward corruption: ``x_t ~ Cat(x0 @ Qbar_t)`` via gumbel-argmax.

    ``x0``: int ``[B, A]``, ``t``: ``[B, A]`` in [1, T]. Reference
    ``get_xt``/``q_sample`` (d3pm.py:119-127, :140-143).
    """
    probs = tables.q_mats[t - 1, x0, :]  # [B, A, C]
    logits = jnp.log(probs + EPS)
    g = _gumbel(key, probs.shape, probs.dtype)
    return jnp.argmax(logits + g, axis=-1)


def _q_posterior_logits_from_onehotish(
    tables: D3PMTables, x0_logits: jax.Array, xt: jax.Array, t: jax.Array
) -> jax.Array:
    """log q(x_{t-1} | x_t, x0-distribution); ``t==1`` returns x0 logits.

    ``x0_logits``: ``[B, A, C]``, ``xt``: int ``[B, A]``, ``t``: ``[B, A]``.
    Reference ``q_posterior_logits`` (d3pm.py:74-110).
    """
    fact1 = tables.q_one_step_transposed[t - 1, xt, :]  # [B, A, C]
    softmaxed = jax.nn.softmax(x0_logits, axis=-1)
    # Qbar_{t-1} = q_mats[t-2]; for t==1 the result is replaced below.
    qmats2 = tables.q_mats[jnp.maximum(t - 2, 0)]  # [B, A, C, C]
    fact2 = jnp.einsum("...c,...cd->...d", softmaxed, qmats2)
    out = jnp.log(fact1 + EPS) + jnp.log(fact2 + EPS)
    return jnp.where((t == 1)[..., None], x0_logits, out)


def q_posterior_logits(
    tables: D3PMTables, x0: jax.Array, xt: jax.Array, t: jax.Array
) -> jax.Array:
    """Posterior logits with integer or logit-valued ``x0``."""
    if jnp.issubdtype(x0.dtype, jnp.integer):
        x0_logits = jnp.log(
            jax.nn.one_hot(x0, tables.num_classes, dtype=tables.q_mats.dtype) + EPS
        )
    else:
        x0_logits = x0
    return _q_posterior_logits_from_onehotish(tables, x0_logits, xt, t)


def _vb_kl(dist1: jax.Array, dist2: jax.Array, atom_mask: jax.Array) -> jax.Array:
    """Masked mean KL(softmax(dist1) || softmax(dist2)) over valid atoms.

    Keeps the reference's quirk of adding eps to the *logits* before the
    softmaxes (d3pm.py:112-117) for numerical parity.
    """
    kl = jax.nn.softmax(dist1 + EPS, axis=-1) * (
        jax.nn.log_softmax(dist1 + EPS, axis=-1)
        - jax.nn.log_softmax(dist2 + EPS, axis=-1)
    )
    kl = kl.sum(axis=-1)
    denom = jnp.maximum(atom_mask.sum(), 1)
    return jnp.where(atom_mask, kl, 0.0).sum() / denom


def d3pm_loss(
    tables: D3PMTables,
    x0: jax.Array,
    predicted_x0_logits: jax.Array,
    xt: jax.Array,
    t: jax.Array,
    atom_mask: jax.Array,
) -> jax.Array:
    """Hybrid loss = coeff * VB-KL + cross-entropy against x0 (masked means).

    Reference ``calculate_loss`` (d3pm.py:146-163).
    """
    true_post = q_posterior_logits(tables, x0, xt, t)
    pred_post = q_posterior_logits(tables, predicted_x0_logits, xt, t)
    vb = _vb_kl(true_post, pred_post, atom_mask)

    logp = jax.nn.log_softmax(predicted_x0_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, x0[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(atom_mask.sum(), 1)
    ce = jnp.where(atom_mask, ce, 0.0).sum() / denom
    return tables.hybrid_loss_coeff * vb + ce


def d3pm_reverse_step(
    tables: D3PMTables,
    key: jax.Array,
    xt: jax.Array,
    predicted_x0_logits: jax.Array,
    t: jax.Array,
    temperature: float = 1.0,
) -> jax.Array:
    """Gumbel posterior sampling step; gumbel is damped 5x at ``t == 1``
    (reference ``reverse``, d3pm.py:198-215).

    ``temperature`` scales the gumbel noise: 1.0 is exact reference
    semantics; 0.0 is deterministic posterior argmax. Lower values trade
    categorical diversity for type–geometry consistency (each atom's type is
    frozen at the reverse step where it unmasks, so the draw happens under
    residual coordinate noise — damping the draw noise sharpens it)."""
    pred_post = q_posterior_logits(tables, predicted_x0_logits, xt, t)
    g = _gumbel(key, pred_post.shape, pred_post.dtype)
    not_first = 0.2 + (t != 1).astype(pred_post.dtype) * 0.8
    return jnp.argmax(pred_post + g * (temperature * not_first[..., None]), axis=-1)
