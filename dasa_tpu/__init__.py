"""dasa_tpu — a TPU-native Vision-and-Language-Navigation (R2R) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the DASA
("Depth-guided AdaIN and Shift Attention") research stack:

- a host-side navigation-graph simulator with a *batched* step API
  (``dasa_tpu.sim``) replacing the reference's per-episode C++ OpenGL
  simulator (reference: src/lib/MatterSim.cpp, include/MatterSim.hpp),
- a dense, fixed-shape observation pipeline (``dasa_tpu.env``) replacing
  dict-of-dicts observations (reference: r2r_src/env.py),
- Flax models for the instruction encoders, cross-modal DicModel, the
  DASA action decoder with shift attention and depth-guided AdaIN
  (``dasa_tpu.models``; reference: r2r_src/model.py, vilmodel.py,
  r2rmodel.py, agent_dg.py),
- Pallas TPU kernels for the bandwidth-bound fusions (``dasa_tpu.ops``),
- an act/replay agent that keeps episodic control on the host while all
  per-step math runs as one jitted XLA program, and the whole training
  backward runs as a single `lax.scan` replay (``dasa_tpu.agents``),
- training/eval drivers with SR/SPL/NE/OSR metrics (``dasa_tpu.train``;
  reference: r2r_src/train.py, eval.py),
- sharding utilities for data-parallel scale-out over a `jax.sharding.Mesh`
  (``dasa_tpu.parallel``; replaces NCCL DDP in tasks/R2R/nav_dic_pretrain.py).
"""

__version__ = "0.1.0"
