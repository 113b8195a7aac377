"""LatticeUrbanWind-TPU: a TPU-native urban micrometeorology LES framework.

Clean-room, TPU-first (JAX / Pallas / shard_map) implementation of the
capabilities of the reference LatticeUrbanWind platform: mesoscale-NWP-coupled
lattice-Boltzmann LES over voxelized city geometry, with the same deck/config
contract, file formats, and run modes — but engineered for TPU hardware
(bf16/fp16 DDF storage with fp32 compute, XLA-fused streaming, ICI halo
exchange over a 3-D device mesh).
"""

__version__ = "0.1.0"
