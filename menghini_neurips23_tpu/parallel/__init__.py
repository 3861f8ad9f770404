from menghini_neurips23_tpu.parallel.mesh import (  # noqa: F401
    clip_param_sharding,
    data_parallelism,
    data_sharding,
    make_mesh,
    mesh_from_config,
    pad_to_multiple,
    put_batch,
    put_replicated,
    replicated,
)
from menghini_neurips23_tpu.parallel.multihost import (  # noqa: F401
    initialize_distributed,
    initialize_from_env,
    is_main_process,
    replicate_tree,
    shard_filelist_for_batch,
)
