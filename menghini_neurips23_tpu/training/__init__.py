"""Training strategies.

The reference exposes per-paradigm classes {Textual,Visual,Multimodal}Prompt
and {Textual,Visual,Multimodal}FPL in three near-identical packages
(methods/{semi_supervised_learning,unsupervised_learning,transductive_zsl});
here one strategy class per modality covers all paradigms (the paradigm is
config.LEARNING_PARADIGM) and "FPL vs prompt-only" is just whether an
unlabeled dataset is passed to train()/fixed_iterative_train()/grip_train().
The reference class names are provided as aliases for familiarity.
"""

from menghini_neurips23_tpu.training.losses import (  # noqa: F401
    cross_entropy_per_sample,
    masked_mean,
    two_group_loss,
)
from menghini_neurips23_tpu.training.multimodal import MultimodalStrategy
from menghini_neurips23_tpu.training.schedulers import lr_factor, lr_for_epoch  # noqa: F401
from menghini_neurips23_tpu.training.strategy import EpochData, TrainingStrategy  # noqa: F401
from menghini_neurips23_tpu.training.textual import TextualStrategy
from menghini_neurips23_tpu.training.visual import VisualStrategy

# Reference-compatible aliases (reference methods/*/__init__.py)
TextualPrompt = TextualStrategy
TextualFPL = TextualStrategy
VisualPrompt = VisualStrategy
VisualFPL = VisualStrategy
MultimodalPrompt = MultimodalStrategy
MultimodalFPL = MultimodalStrategy

MODALITY_STRATEGIES = {
    "text": TextualStrategy,
    "image": VisualStrategy,
    "multi": MultimodalStrategy,
}

__all__ = [
    "EpochData",
    "TrainingStrategy",
    "TextualStrategy",
    "VisualStrategy",
    "MultimodalStrategy",
    "TextualPrompt",
    "TextualFPL",
    "VisualPrompt",
    "VisualFPL",
    "MultimodalPrompt",
    "MultimodalFPL",
    "MODALITY_STRATEGIES",
    "lr_factor",
    "lr_for_epoch",
    "two_group_loss",
    "cross_entropy_per_sample",
    "masked_mean",
]
