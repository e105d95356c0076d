"""disentangled_multimodal_learning_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework
for disentangled multimodal learning on whole-slide pathology images + genomics.

This is a ground-up TPU-first re-design with the capabilities of the reference
PyTorch framework helenypzhang/Disentangled-Multimodal-Learning:

- bag-level MIL models over precomputed WSI patch features at two magnification
  scales plus tumor/immune-disentangled gene-expression vectors
  (reference data contract: train_test.py:52-54),
- the multi-scale teacher/student knowledge-distillation pipeline
  (reference models/Modules.py, models/model.py:571-964),
- the disentangled deformable cross-attention fusion models
  (reference models/DeformCrossTransMIL.py, models/model.py:471-568),
- baselines: ABMIL / TransMIL / MaxNet / Pathomic{,_Original,_FG,_Ensemble} /
  MCAT / CMTA (reference models/mil.py, models/model.py:173-1450),
- four task heads: diag2021 / survival / grade / subtype
  (reference config/config_mine_diag2021.yaml:91-92).

Design stance (TPU-native, NOT a torch translation):
- models are pure functions over pytrees (flax.linen modules),
- one jitted train step per mode; no Python control flow on traced values,
- data parallelism via jax.sharding.Mesh + NamedSharding (replaces the
  reference's NCCL DDP + manual grad all-reduce, reference main.py:27-29,
  train_test.py:223-228),
- hot ops (Nystrom landmark attention, deformable offset-grid attention,
  DPC-KNN cluster merge) have fused Pallas TPU kernels with jnp reference
  implementations and golden tests,
- static shapes everywhere (the reference's fixdim=2500 padding is kept as a
  first-class contract, reference config/config_mine_diag2021.yaml:2).
"""

__version__ = "0.1.0"

from . import config  # noqa: F401

SHORT_NAME = "dml_tpu"
