#!/usr/bin/env python
"""Emit a LAMMPS `read_data` file with the benchmark point cloud.

Bit-identical to the reference's `lmp-data` example
(examples/lammps_data.rs:33-81, same ChaCha12 RNG) so energies and timings
are directly comparable against the LAMMPS/CellListMap harness
(more_benches/in.zelllbench.txt, scripts/more_benches.sh).

Usage: python benchmarks/lammps_data.py <n> [seed] > atomsinabox.txt
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zelll_tpu.utils.datagen import DEFAULT_SEED, generate_points_random, lj_box


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_SEED
    cutoff = 10.0
    a, b, c = lj_box(n, cutoff)
    pts = generate_points_random(n, (a, b, c), seed=seed)

    w = sys.stdout.write
    w(f"# {n} random atom positions taken from zelll benchmarks:\n")
    w(
        f"# generate_points_random({n}, [{a}, {b}, {c}], [0.0, 0.0, 0.0], "
        f"Some({seed}));\n"
    )
    w(f"{n} atoms\n")
    w("1 atom types\n")
    w(f"-{0.5 * a} {0.5 * a} xlo xhi\n")
    w(f"-{0.5 * b} {0.5 * b} ylo yhi\n")
    w(f"-{0.5 * c} {0.5 * c} zlo zhi\n")
    w("\n")
    w("Atoms # atomic\n")
    w("# lammps read_data needs an empty line here\n")
    for i, (x, y, z) in enumerate(pts):
        w(f"{i + 1} 1 {float(x)!r} {float(y)!r} {float(z)!r}\n")
    w("\n")


if __name__ == "__main__":
    main()
