"""Serving export: serialize the full reverse-diffusion sampler to StableHLO.

``jax.export`` captures the jitted sampler — model code, schedules, the
`lax.fori_loop` reverse chain, and the trained parameters as baked-in
constants — into one portable artifact. A serving host deserializes and calls
it with nothing but jax installed: no arreau_tpu import, no checkpoint
restore, no Python model definition. The reference has no analog (its
generation requires the full torch + Lightning + PyG stack and the source
tree, main_diffusion_generate.py:24-29).

Artifact layout: ``<out>`` holds the serialized StableHLO bytes and
``<out>.json`` a sidecar with the calling convention (shapes, the z-table for
decoding type indices to elements, and the sampler configuration).

The exported function signature is ``f(seed: int32[]) -> (frac_x [B,A,3],
atom_types [B,A], lattice [B,3,3])``. Exports are platform-tagged: exporting
on TPU embeds the Mosaic kernels; exporting on CPU uses the pure-XLA path
(models/ponita.py gates Pallas on the runtime backend).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def export_sampler(
    checkpoint_dir: str,
    out_path: str,
    tag: str = "best",
    use_ema: bool = True,
    batch_size: int = 16,
    num_atoms_per_sample: int = 8,
    sample_steps: Optional[int] = None,
    ddim_eta: float = 0.0,
    type_temperature: float = 1.0,
    variable_num_atoms: bool = False,
) -> dict:
    """Serialize the sampler for ``batch_size`` x ``num_atoms_per_sample``
    crystals into ``out_path`` (+ ``.json`` sidecar). Returns the sidecar.

    ``variable_num_atoms``: export the size-matched serving variant — the
    artifact takes a second argument ``num_atoms int32[B]`` (per-crystal
    counts <= ``num_atoms_per_sample``, which becomes the pad size) so a
    serving host can draw counts from its own distribution per call; padded
    slots diffuse inertly and come back masked via the returned counts."""
    import jax
    from jax import export as jax_export

    from arreau_tpu.cli.generate import length_bounds_from_meta, load_model

    model, params, z_table, meta = load_model(
        checkpoint_dir, tag, use_ema=use_ema, return_meta=True
    )
    length_bounds = length_bounds_from_meta(meta)

    def sample_fn(seed, num_atoms=None):
        batch = model.sample(
            params,
            jax.random.PRNGKey(seed),
            num_samples=batch_size,
            num_atoms_per_sample=num_atoms_per_sample,
            num_atoms=num_atoms,
            length_bounds=length_bounds,
            type_temperature=type_temperature,
            sample_steps=sample_steps,
            ddim_eta=ddim_eta,
        )
        # plain tuple output: no pytree registration needed on the serving host
        return batch.frac_x, batch.atom_types, batch.lattice

    if variable_num_atoms:
        exp = jax_export.export(jax.jit(sample_fn))(
            jax.ShapeDtypeStruct((), np.int32),
            jax.ShapeDtypeStruct((batch_size,), np.int32),
        )
    else:
        exp = jax_export.export(jax.jit(sample_fn))(
            jax.ShapeDtypeStruct((), np.int32)
        )
    blob = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    sidecar = {
        "calling_convention": (
            "f(seed: int32[], num_atoms: int32[B]) -> (frac_x [B,A,3] f32, "
            "atom_types [B,A] int, lattice [B,3,3] f32); slots >= num_atoms[b] "
            "are padding"
            if variable_num_atoms
            else "f(seed: int32[]) -> (frac_x [B,A,3] f32, "
            "atom_types [B,A] int, lattice [B,3,3] f32)"
        ),
        "variable_num_atoms": variable_num_atoms,
        "batch_size": batch_size,
        "num_atoms_per_sample": num_atoms_per_sample,
        "sample_steps": sample_steps,
        "ddim_eta": ddim_eta,
        "type_temperature": type_temperature,
        "use_ema": use_ema,
        "platforms": list(exp.platforms),
        "z_table_zs": [int(z) for z in z_table.zs],
        "num_timesteps": int(model.config.num_timesteps),
        "bytes": len(blob),
    }
    with open(out_path + ".json", "w") as f:
        json.dump(sidecar, f, indent=2)
    return sidecar


def load_exported(path: str):
    """Deserialize an exported sampler; returns ``(callable, sidecar_dict)``.

    The callable takes a scalar int32 seed and returns
    ``(frac_x, atom_types, lattice)`` on the artifact's platform.
    """
    from jax import export as jax_export

    with open(path, "rb") as f:
        exp = jax_export.deserialize(bytearray(f.read()))
    sidecar = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            sidecar = json.load(f)
    return exp.call, sidecar
