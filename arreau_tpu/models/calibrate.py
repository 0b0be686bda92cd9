"""One-shot activation-variance calibration for the conv kernels.

The reference re-scales its conv kernel weights on the first training batch
so activation std is preserved through each conv ("Callibrating...",
/root/reference/ponita/nn/conv.py:49-51, :64-68, :140-146) — a data-dependent
mutation inside forward that cannot live in a jitted functional step.

Here the default init already applies a 1/sqrt(expected_degree) variance
correction (blocks.FiberBundleConv), and this module provides the explicit
equivalent as a pure host-side function: run one probe batch with flax
intermediate capture, measure each interaction layer's output std, and
return params with that layer's spatial kernel rescaled toward unit output
std. Apply once after ``init`` for reference-style calibrated starts.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict


def calibrate_conv_kernels(
    model_apply: Callable,
    params,
    inputs,
    target_std: float = 1.0,
) -> tuple[dict, dict]:
    """Returns (rescaled params, measured stds per layer).

    ``model_apply(params, inputs, capture_intermediates=..., mutable=...)``
    must be the flax apply of a PonitaFiberBundle-style module whose
    interaction layers are named ``layer_<i>`` with a ``conv`` child.
    """
    _, state = model_apply(
        params, inputs, capture_intermediates=True, mutable=["intermediates"]
    )
    flat_inter = flatten_dict(state["intermediates"], sep="/")

    stds: dict[str, float] = {}
    for key, val in flat_inter.items():
        out = val[0]
        if isinstance(out, tuple):
            out = out[0]
        stds[key] = float(jnp.std(out))

    flat_params = flatten_dict(params["params"], sep="/")
    new_flat = dict(flat_params)
    for key in flat_params:
        if key.endswith("conv/kernel"):
            layer = key.split("/")[0]  # "layer_<i>"
            probe = f"{layer}/__call__"
            if probe in stds and stds[probe] > 0:
                new_flat[key] = flat_params[key] * (target_std / stds[probe])
    new_params = dict(params)
    new_params["params"] = unflatten_dict(new_flat, sep="/")
    return new_params, stds
