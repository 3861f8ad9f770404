from menghini_neurips23_tpu.utils.logging import setup_logging  # noqa: F401
