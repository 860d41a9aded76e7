from lanczosplusplus_tpu.models.registry import build_model  # noqa: F401
