"""arreau_tpu — a TPU-native crystal-diffusion framework (JAX/XLA/Pallas).

Re-designed from scratch with the capabilities of the reference Arreau codebase
(PyTorch/Lightning/torch-geometric): joint diffusion over crystal structures
(VE score diffusion on fractional coordinates under periodic boundary
conditions, VP diffusion on lattice lengths, D3PM masking diffusion on atom
types) driven by a Ponita position-orientation-space SE(3)-equivariant GNN.

Design stance (TPU-first, not a port):
  * static shapes everywhere — crystals batched into dense ``[B, A_max]``
    buckets, neighbor lists with fixed per-atom degree ``K`` (receiver-major),
    so message aggregation is a masked dense reduce instead of a scatter;
  * pure-function diffusion processes with precomputed schedule tables;
  * fully jit-compiled training step and ``lax.fori_loop`` samplers;
  * data parallelism via ``jax.sharding`` over a TPU mesh.
"""

__version__ = "0.1.0"
