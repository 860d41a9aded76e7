"""The `ed` driver: full diagonalization + <E>(T or beta) schedule
(reference: src/ed.cpp)."""

from __future__ import annotations

import argparse
import sys

from lanczosplusplus_tpu.io_.input_parser import read_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine.thermal import ExactDiag


def run(argv=None):
    p = argparse.ArgumentParser(prog="ed++")
    p.add_argument("-f", dest="input", required=True)
    args = p.parse_args(argv)
    inp = read_input(args.input)
    geometry = Geometry(inp)
    model = build_model(inp, geometry)
    ed = ExactDiag(model, inp)
    ed.print_energies(sys.stdout)
    return ed


def main():
    run()


if __name__ == "__main__":
    main()
