"""Model factory keyed by the input's Model= line.

Replaces the reference's ModelSelector (reference:
src/Engine/ModelSelector.h:45-96).  The full set of reference model
strings (ModelSelector.h:72-95) is registered here; entries are filled
in as each model family lands.
"""

from __future__ import annotations


def build_model(inp, geometry):
    name = inp.string("Model")
    if name in ("HubbardOneBand", "HubbardOneBandExtended",
                "SuperHubbardExtended", "KaneMeleHubbard"):
        from lanczosplusplus_tpu.models.hubbard import HubbardModel
        return HubbardModel(inp, geometry)
    if name == "HubbardOneBandRashbaSOC":
        from lanczosplusplus_tpu.models.rashba import RashbaSOCModel
        return RashbaSOCModel(inp, geometry)
    if name == "Heisenberg":
        from lanczosplusplus_tpu.models.heisenberg import HeisenbergModel
        return HeisenbergModel(inp, geometry)
    if name == "Kitaev":
        from lanczosplusplus_tpu.models.kitaev import KitaevModel
        return KitaevModel(inp, geometry)
    if name == "TjMultiOrb":
        from lanczosplusplus_tpu.models.tj import TjMultiOrbModel
        return TjMultiOrbModel(inp, geometry)
    if name in ("FeAsBasedSc", "FeAsBasedScExtended"):
        # a 4x4 SpinOrbit matrix selects the spin-mixing basis variant
        # (reference: ModelSelector.h:45-96)
        if inp.has("SpinOrbit"):
            from lanczosplusplus_tpu.models.feas_spinorbit import \
                FeAsSpinOrbitModel
            return FeAsSpinOrbitModel(inp, geometry)
        from lanczosplusplus_tpu.models.feas import FeBasedScModel
        return FeBasedScModel(inp, geometry)
    if name == "Immm":
        from lanczosplusplus_tpu.models.immm import ImmmModel
        return ImmmModel(inp, geometry)
    raise ValueError(f"unknown Model= {name}")
