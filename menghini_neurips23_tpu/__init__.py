"""TPU-native framework for CLIP prompt tuning with pseudolabels.

A from-scratch JAX/Flax/pjit re-design of the capabilities of
BatsResearch/menghini-neurips23-code ("Enhancing CLIP with CLIP", NeurIPS 2023):
textual (CoOp), visual (VPT) and multimodal (UPT) soft-prompt tuning of a frozen
CLIP under SSL / UL / TRZSL learning paradigms, with FPL / IFPL / GRIP
pseudolabel training strategies on the FRAMED datasets.

Design notes (TPU-first, not a port):
- Soft prompts are *inputs* to jitted pure functions, not module attributes.
- Frozen-tower features are precomputed once (the reference recomputes the
  frozen image tower per batch, see reference
  methods/semi_supervised_learning/textual_prompt.py:100).
- Pseudolabel generation is one batched, data-sharded inference pass over the
  whole unlabeled pool (the reference loops per image with batch size 1, see
  reference utils/clip_pseudolabels.py:31).
- Data parallelism is a jax.sharding.Mesh over all chips; gradients sync via
  XLA collectives implicit in jit (no per-batch host barriers).
"""

__version__ = "0.1.0"

from menghini_neurips23_tpu.config import Config  # noqa: F401
