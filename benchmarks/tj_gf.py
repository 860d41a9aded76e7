"""BASELINE config 3: t-J chain, 16 sites, one-particle G(omega).

Runs the full continued-fraction pipeline on the attached device and
prints the CF weights and a 41-point G(omega) table.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    from lanczosplusplus_tpu.io_.input_parser import parse_input
    from lanczosplusplus_tpu.geometry import Geometry
    from lanczosplusplus_tpu.models import build_model
    from lanczosplusplus_tpu.engine import Engine

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))
    from test_tj import tj_input

    inp = parse_input(tj_input(16, 7, 7, t=-1.0, j=0.35, periodic=1))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    t0 = time.time()
    eng = Engine(model, inp)
    print(f"dim={eng.basis.size} E0={eng.ground_energy:.8f} "
          f"({time.time() - t0:.1f}s)", flush=True)
    t0 = time.time()
    coll, labels = eng.spectral_function("c", 0, 0, spin=0)
    print(f"spectral: {time.time() - t0:.1f}s; weights="
          f"{[round(float(c.weight), 6) for c in coll.items]}", flush=True)
    omegas = np.linspace(-6, 6, 41)
    g = coll.evaluate(omegas, 0.1)
    for w, gv in zip(omegas, g):
        print(f"{w:+.3f} {gv.real:+.6f} {gv.imag:+.6f}")


if __name__ == "__main__":
    main()
