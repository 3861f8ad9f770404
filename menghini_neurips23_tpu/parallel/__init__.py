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
    is_main_process,
    shard_filelist_for_host,
)
