from lanczosplusplus_tpu.symmetry.blocks import (  # noqa: F401
    DefaultSymmetry, TranslationSymmetry, ReflectionSymmetry,
    build_symmetry)
