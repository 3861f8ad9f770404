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
