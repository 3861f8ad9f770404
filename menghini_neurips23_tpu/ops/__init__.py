from menghini_neurips23_tpu.ops.clip_head import (  # noqa: F401
    fused_probs,
    fused_probs_reference,
)
from menghini_neurips23_tpu.ops.patch_embed import (  # noqa: F401
    fold_normalization,
    folded_patch_tokens,
)
