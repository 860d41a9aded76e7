from lanczosplusplus_tpu.geometry.geometry import Geometry  # noqa: F401
