from menghini_neurips23_tpu.models.clip import (  # noqa: F401
    CLIP,
    TextTower,
    Transformer,
    VisionTower,
    init_clip_params,
    quick_gelu,
)
from menghini_neurips23_tpu.models.configs import (  # noqa: F401
    ARCHS,
    CLIPArch,
    TINY_TEST,
    VIT_B32,
    VIT_L14,
    get_arch,
)
from menghini_neurips23_tpu.models.prompts import (  # noqa: F401
    UPTMixer,
    build_prompt_token_ids,
    truncate_context,
    coop_text_features,
    init_prefix,
    init_upt_params,
    upt_features,
    vision_tokens_with_prefix,
    vpt_image_features,
)
from menghini_neurips23_tpu.models.convert import (  # noqa: F401
    convert_hf_state_dict,
    convert_state_dict,
    is_hf_state_dict,
    infer_arch,
    load_clip,
    load_npz,
    save_npz,
)
