"""SevenNet-FT/TPU: a TPU-native equivariant message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SevenNet-reEWC
(kskjs1203/SevenNet_finetuning): NequIP-style E(3)/SE(3)-equivariant GNN
interatomic potentials with a full training stack (energy/force/stress losses,
metrics, checkpointing, data-parallel training over TPU meshes), reEWC
fine-tuning (Fisher-information EWC penalty + rehearsal replay), and an
edge-partitioned multi-device MD execution model with halo exchange over ICI.

The compute path is JAX/XLA with Pallas kernels for the hot ops; the package
is organized as:

- ``irreps``     : O(3) irreducible-representation algebra (no e3nn dependency)
- ``ops``        : equivariant primitives (spherical harmonics, radial bases,
                   tensor products, linear layers, gates, scatter ops)
- ``model``      : graph batch pytree + NequIP/SevenNet model assembly
- ``data``       : neighbor lists, VASP OUTCAR/structure_list readers, datasets
- ``train``      : losses (incl. EWC), trainer, metrics, optimizers, checkpoints
- ``parallel``   : device-mesh data parallelism and spatial halo exchange
"""

__version__ = '0.1.0'
