"""Import reference (PyTorch Lightning) PONITA_DIFFUSION checkpoints.

The reference trains with torch modules whose trainable parameters map 1:1
onto this package's flax tree (the forward math is the same function; see
models/ponita.py). This module converts a reference ``.ckpt`` — a Lightning
checkpoint of ``PONITA_DIFFUSION`` (/root/reference/lightning_wrappers/
diffusion.py:29-106) wrapping ``PonitaFiberBundle``
(/root/reference/ponita/models/ponita.py:29-86) — into a self-describing
arreau_tpu checkpoint directory that ``arreau-generate`` consumes directly.

Key mapping (reference state_dict -> flax params; W denotes transpose, since
``torch.nn.Linear`` stores ``[out, in]`` and flax ``Dense`` ``[in, out]``):

  t_emb.gaussian_fourier_proj_w                 -> meta["fourier_w"] (the fixed
                                                   Fourier frequencies ride in
                                                   meta so the rebuilt model
                                                   embeds time identically)
  z_table_zs (buffer)                           -> meta["z_table_zs"]
  model.basis_fn.{1,3}.weight/bias              -> basis_fn.dense_{in,out}.kernel(W)/bias
  model.fiber_basis_fn.{1,3}.weight/bias        -> fiber_basis_fn.dense_{in,out}.kernel(W)/bias
  model.x_embedder.weight                       -> x_embedder.kernel(W)
  model.interaction_layers.{i}.conv.kernel.weight        -> layer_{i}.conv.kernel(W)
  model.interaction_layers.{i}.conv.fiber_kernel.weight  -> layer_{i}.conv.fiber_kernel.kernel(W)
  model.interaction_layers.{i}.conv.bias                 -> layer_{i}.conv.bias
  model.interaction_layers.{i}.norm.weight/bias          -> layer_{i}.norm.scale/bias
  model.interaction_layers.{i}.linear_{1,2}.weight/bias  -> layer_{i}.linear_{1,2}.kernel(W)/bias
  model.interaction_layers.{i}.layer_scale               -> layer_{i}.layer_scale
  model.read_out_layers.{i}.weight/bias                  -> readout_{i}.kernel(W)/bias
  model.edge_readout_layers.{i}.*               -> edge_readout_{i}.* (skipped
                                                   when zero-width, as in the
                                                   diffusion config)
  *.callibrated, diffusion_loss.*               -> dropped (schedule buffers and
                                                   calibration flags re-derive
                                                   from the config)

Known approximations (documented, sub-0.1% relative):

* GELU: the reference uses torch's exact (erf) GELU; this package uses the
  tanh approximation everywhere (incl. the Pallas kernels).
* Orientation grid: the reference REGENERATES its repulsion-minimized S²
  grid from random init per process (ponita/geometry/spherical_grid.py:
  85-147) — the grid is not stored in its checkpoints, so even the
  reference's own inference runs on a different grid than training. Our
  deterministic grid is one more such resampling; the learned kernels are
  continuous functions of grid invariants, so the represented operator is
  the same up to the discretization the reference already accepts.

The readout column order assumes the diffusion head layout
(types | coord-vec | global-scalar); the reference's constructor-vs-split
order quirk (ponita.py:82 vs :111) is inert there because
output_dim_global_vec == 0.
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Tolerant torch.load: reference checkpoints pickle custom classes
# (AtomicNumberTable, argparse.Namespace from the reference package) that are
# not importable here. Any missing class is replaced by a stub that captures
# its state; everything we need (tensors, the args namespace fields) survives.


class _Stub:
    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:  # pragma: no cover - exotic __reduce__ payloads
            self.__dict__["_state"] = state


def _tolerant_torch_load(path: str):
    import torch

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (_Stub,), {"__module__": module})

    mod = type(pickle)("tolerant_pickle")
    mod.Unpickler = _Unpickler
    mod.load = lambda f, **kw: _Unpickler(f).load()
    mod.loads = lambda b, **kw: _Unpickler(io.BytesIO(b)).load()
    return torch.load(path, map_location="cpu", pickle_module=mod, weights_only=False)


def load_reference_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], dict]:
    """Read a reference ``.ckpt`` -> (state_dict as numpy, hyper-param dict).

    Also accepts a bare ``state_dict`` file (no Lightning wrapper); then the
    hyper-param dict is empty and the caller must supply the config.
    """
    obj = _tolerant_torch_load(path)
    if isinstance(obj, dict) and "state_dict" in obj:
        sd, hparams = obj["state_dict"], obj.get("hyper_parameters", {}) or {}
    else:
        sd, hparams = obj, {}
    sd_np = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
             for k, v in sd.items()}
    args = hparams.get("args") if isinstance(hparams, dict) else None
    args_dict = dict(vars(args)) if args is not None and hasattr(args, "__dict__") else {}
    return sd_np, args_dict


# ---------------------------------------------------------------------------
# state_dict -> flax params


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def convert_state_dict(
    sd: Dict[str, np.ndarray], num_layers: int
) -> Tuple[dict, np.ndarray, Optional[np.ndarray]]:
    """Convert a PONITA_DIFFUSION state_dict into ``({'params': ...},
    fourier_w, z_table_zs)``. Raises ``KeyError`` naming the first missing
    reference key, so truncated/foreign checkpoints fail loudly."""
    p: Dict[str, Any] = {}

    def dense(torch_prefix: str, bias: bool = True) -> dict:
        out = {"kernel": _t(sd[f"{torch_prefix}.weight"])}
        if bias:
            out["bias"] = sd[f"{torch_prefix}.bias"]
        return out

    for ours, theirs in (("basis_fn", "model.basis_fn"), ("fiber_basis_fn", "model.fiber_basis_fn")):
        p[ours] = {
            "dense_in": dense(f"{theirs}.1"),
            "dense_out": dense(f"{theirs}.3"),
        }
    p["x_embedder"] = {"kernel": _t(sd["model.x_embedder.weight"])}

    for i in range(num_layers):
        t = f"model.interaction_layers.{i}"
        layer: Dict[str, Any] = {
            "conv": {
                "kernel": _t(sd[f"{t}.conv.kernel.weight"]),
                "fiber_kernel": {"kernel": _t(sd[f"{t}.conv.fiber_kernel.weight"])},
                "bias": sd[f"{t}.conv.bias"],
            },
            "norm": {"scale": sd[f"{t}.norm.weight"], "bias": sd[f"{t}.norm.bias"]},
            "linear_1": dense(f"{t}.linear_1"),
            "linear_2": dense(f"{t}.linear_2"),
        }
        if f"{t}.layer_scale" in sd:
            layer["layer_scale"] = sd[f"{t}.layer_scale"]
        p[f"layer_{i}"] = layer
        ro = f"model.read_out_layers.{i}"
        if f"{ro}.weight" in sd:  # None entries (multiple_readouts=False) are absent
            p[f"readout_{i}"] = dense(ro)
        er = f"model.edge_readout_layers.{i}"
        if f"{er}.weight" in sd and sd[f"{er}.weight"].shape[0] > 0:
            p[f"edge_readout_{i}"] = dense(er)

    fourier_w = sd["t_emb.gaussian_fourier_proj_w"]
    z_zs = sd.get("z_table_zs")
    return {"params": p}, fourier_w, z_zs


# ---------------------------------------------------------------------------
# end-to-end: reference .ckpt -> arreau_tpu checkpoint directory


def config_from_reference_args(args: dict, num_atomic_states: int):
    """Map the reference CLI namespace (main_diffusion.py:34-150) onto
    :class:`DiffusionConfig`. Unknown keys are ignored; ours keep defaults."""
    from arreau_tpu.tasks.diffusion import DiffusionConfig

    take = {
        "num_timesteps": "num_timesteps",
        "radius": "radius",
        "max_neighbors": "max_neighbors",
        "hidden_dim": "hidden_dim",
        "basis_dim": "basis_dim",
        "degree": "degree",
        "layers": "num_layers",
        "num_ori": "num_ori",
        "widening_factor": "widening_factor",
        "layer_scale": "layer_scale",
        "multiple_readouts": "multiple_readouts",
    }
    kw = {ours: args[theirs] for theirs, ours in take.items() if args.get(theirs) is not None}
    return DiffusionConfig(num_atomic_states=num_atomic_states, **kw)


def convert_reference_checkpoint(
    ckpt_path: str, out_dir: str, tag: str = "best"
) -> dict:
    """Reference ``.ckpt`` -> self-describing checkpoint dir for
    ``arreau-generate``. Returns the written meta dict."""
    import jax.numpy as jnp

    from arreau_tpu.data.atoms import AtomicNumberTable
    from arreau_tpu.tasks.diffusion import DiffusionModel
    from arreau_tpu.train.checkpoint import CheckpointManager, diffusion_meta
    from arreau_tpu.train.optim import make_optimizer
    from arreau_tpu.train.state import create_train_state

    sd, args = load_reference_checkpoint(ckpt_path)
    if "z_table_zs" not in sd:
        raise ValueError(
            f"{ckpt_path} has no z_table_zs buffer — not a PONITA_DIFFUSION checkpoint"
        )
    z_zs = [int(z) for z in sd["z_table_zs"]]
    cfg = config_from_reference_args(args, num_atomic_states=len(z_zs))
    params, fourier_w, _ = convert_state_dict(sd, cfg.num_layers)

    # Validate against a fresh init: same tree structure and leaf shapes.
    model = DiffusionModel(cfg)
    import jax

    from arreau_tpu.data.crystal import CrystalBatch

    B, A = 1, 2
    template = model.init(
        jax.random.PRNGKey(0),
        CrystalBatch(
            frac_x=jnp.zeros((B, A, 3)),
            atom_types=jnp.zeros((B, A), jnp.int32),
            lattice=jnp.broadcast_to(jnp.eye(3) * 4.0, (B, 3, 3)),
            num_atoms=jnp.full((B,), A),
            atom_mask=jnp.ones((B, A), bool),
        ),
    )
    want = jax.tree.map(lambda x: x.shape, template)
    got = jax.tree.map(lambda x: tuple(x.shape), params)
    if want != got:
        raise ValueError(
            "converted parameter tree does not match the model built from the "
            f"checkpoint's hyper-parameters:\nwant {want}\ngot  {got}"
        )
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    meta = diffusion_meta(cfg, AtomicNumberTable(z_zs))
    meta["fourier_w"] = [float(w) for w in fourier_w]
    meta["imported_from"] = ckpt_path
    ckpt = CheckpointManager(out_dir, meta=meta)
    state = create_train_state(params, make_optimizer(1e-3), ema_decay=0.999)
    ckpt.save(state, tag)
    return meta
