from lanczosplusplus_tpu.engine.engine import Engine  # noqa: F401
