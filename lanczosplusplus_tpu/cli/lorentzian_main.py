"""The `lorentzian` driver: pole list -> smooth G on real/Matsubara
grids (reference: src/lorentzian.cpp:126-212 CLI)."""

from __future__ import annotations

import argparse

import numpy as np

from lanczosplusplus_tpu.engine.broadening import lorentzian_grid


def run(argv=None):
    p = argparse.ArgumentParser(prog="lorentzian++")
    p.add_argument("-f", dest="file", required=True,
                   help="two-column (energy weight) file")
    p.add_argument("-t", dest="total", type=int, required=True)
    p.add_argument("-m", dest="mode", required=True,
                   choices=["real", "matsubara"])
    p.add_argument("-e", dest="eps", type=float, default=0.1)
    p.add_argument("-b", dest="beta", type=float, default=0.0)
    p.add_argument("-s", dest="step", type=float, default=None)
    p.add_argument("-S", dest="start", type=float, default=None)
    args = p.parse_args(argv)
    data = np.loadtxt(args.file)
    e, w = data[:, 0], data[:, 1]
    omegas, g = lorentzian_grid(e, w, args.total, mode=args.mode,
                                eps=args.eps, beta=args.beta,
                                start=args.start, step=args.step)
    for om, val in zip(omegas, g):
        print(f"{om} {val.real} {val.imag}")


def main():
    run()


if __name__ == "__main__":
    main()
