from menghini_neurips23_tpu.runners.clip_baseline import ClipBaseline  # noqa: F401
