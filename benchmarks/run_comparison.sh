#!/bin/bash
# Cross-tool comparison orchestrator (the analogue of the reference's
# scripts/more_benches.sh): one bit-identical dataset per size, fed to
#   - zelll_tpu (the engine under test; auto-dispatched fused/column path)
#   - the repo's exact-f64 C++ oracle (always available, needs g++)
#   - LAMMPS           (skipped gracefully when `lmp` is absent)
#   - CellListMap.jl   (skipped gracefully when `julia` is absent)
# and merges per-atom LJ energy + runtime + memory into one CSV.
#
# Usage: benchmarks/run_comparison.sh [out.csv] [exponents...]
#   e.g. benchmarks/run_comparison.sh /tmp/cmp.csv 3 4 5 6
set -u

OUT=${1:-comparison.csv}
shift 2>/dev/null || true
EXPONENTS=${@:-"3 4 5"}

REPO_DIR=$(cd "$(dirname "$0")/.." && pwd)
TMP_DIR=$(mktemp -d /tmp/zelll_cmp.XXXXXX)
trap 'rm -rf "$TMP_DIR"' EXIT

echo "n,reps,energy_per_atom,runtime_s,memory_mb,tool" > "$OUT"

for exponent in $EXPONENTS; do
  n=$((10**exponent))
  data="$TMP_DIR/${n}atomsinabox.txt"
  >&2 echo "== n=$n: generating $data"
  python "$REPO_DIR/benchmarks/lammps_data.py" "$n" > "$data"

  # zelll_tpu engine (three protocol variants: split = f64-grade parity
  # mode, f32 = speed mode, f32+presorted = the cachemisses.rs
  # "presorted x f32" variant; sort-based binning makes the engine
  # input-order-invariant, which the presorted row demonstrates) and the
  # C++ oracle — each in its OWN process so memory_mb (peak RSS) is
  # per-tool, like more_benches.sh's Mbytes column
  for variant in split f32 presorted; do
    ZELLL_REPO="$REPO_DIR" ZELLL_VARIANT="$variant" \
      python - "$data" "$n" >> "$OUT" <<'PYEOF'
import os, sys, time, resource
import numpy as np

sys.path.insert(0, os.environ["ZELLL_REPO"])
data_path, n = sys.argv[1], int(sys.argv[2])
variant = os.environ["ZELLL_VARIANT"]

rows = []
inside = False
for line in open(data_path):
    s = line.strip()
    if s.startswith("Atoms"):
        inside = True
        continue
    if not inside or not s or s.startswith("#"):
        continue
    f = s.split()
    if len(f) >= 5:
        rows.append((float(f[2]), float(f[3]), float(f[4])))
pts = np.asarray(rows)
assert len(pts) == n, (len(pts), n)
cutoff = 10.0

if variant == "presorted":
    # presort by flat cell key on the host (the reference's presorted
    # cachemiss variant, examples/cachemisses.rs:61-72)
    org = pts.min(axis=0)
    cell = np.floor((pts - org) / cutoff).astype(np.int64)
    shape = cell.max(axis=0) + 1
    strides = np.array([1, shape[0] + 4, (shape[0] + 4) * (shape[1] + 4)])
    pts = pts[np.argsort(cell @ strides, kind="stable")]

from zelll_tpu.ops.fused import auto_lj_energy

split = variant == "split"
t0 = time.perf_counter()
e, path = auto_lj_energy(pts, cutoff, split=split)
warm = time.perf_counter() - t0
t0 = time.perf_counter()
e, path = auto_lj_energy(pts, cutoff, split=split)
dt = time.perf_counter() - t0
mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
print(f"{n},1,{e / n:.14g},{dt:.6g},{mb:.1f},zelll_tpu[{path}|{variant}]")
PYEOF
  done

  ZELLL_REPO="$REPO_DIR" python - "$data" "$n" >> "$OUT" <<'PYEOF'
import os, sys, time, resource
import numpy as np

sys.path.insert(0, os.environ["ZELLL_REPO"])
data_path, n = sys.argv[1], int(sys.argv[2])

rows = []
inside = False
for line in open(data_path):
    s = line.strip()
    if s.startswith("Atoms"):
        inside = True
        continue
    if not inside or not s or s.startswith("#"):
        continue
    f = s.split()
    if len(f) >= 5:
        rows.append((float(f[2]), float(f[3]), float(f[4])))
pts = np.asarray(rows)
assert len(pts) == n, (len(pts), n)
cutoff = 10.0

from zelll_tpu import oracle

if oracle.available():
    t0 = time.perf_counter()
    e_ref, n_pairs = oracle.lj_energy(pts, cutoff)
    dt = time.perf_counter() - t0
    mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    print(f"{n},1,{e_ref / n:.14g},{dt:.6g},{mb:.1f},cpp_oracle")
PYEOF

  # LAMMPS (if installed)
  if command -v lmp >/dev/null 2>&1; then
    >&2 echo "== n=$n: LAMMPS"
    (cd "$TMP_DIR" && cp "$data" atomsinabox.txt && \
     lmp -in "$REPO_DIR/benchmarks/in.zelllbench.lmp" -var repeats 1 \
       > lmp.out 2>&1)
    # thermo_style custom step pe: take the final pe line; loop time + Mbytes
    pe=$(awk '/^ *[0-9]+ +-?[0-9.eE+-]+ *$/ {v=$2} END {print v}' "$TMP_DIR/lmp.out")
    lt=$(grep -oE 'Loop time of [0-9.eE+-]+' "$TMP_DIR/lmp.out" | awk '{print $4}')
    mb=$(grep -oE '[0-9.eE+-]+ Mbytes' "$TMP_DIR/lmp.out" | head -1 | awk '{print $1}')
    if [ -n "$pe" ]; then
      echo "$n,1,$pe,${lt:-},${mb:-},LAMMPS" >> "$OUT"
    else
      >&2 echo "   LAMMPS produced no energy line (see $TMP_DIR/lmp.out)"
    fi
  else
    >&2 echo "== n=$n: lmp not found, skipping LAMMPS"
  fi

  # CellListMap.jl (if installed)
  if command -v julia >/dev/null 2>&1; then
    >&2 echo "== n=$n: CellListMap.jl"
    julia "$REPO_DIR/benchmarks/celllistmap.jl" "$data" 1 >> "$OUT" \
      || >&2 echo "   julia run failed (CellListMap installed?)"
  else
    >&2 echo "== n=$n: julia not found, skipping CellListMap.jl"
  fi

  # Third-party rows that are always available in this image (scipy
  # cKDTree + torch brute force): independent codebases filling the
  # external-oracle role when LAMMPS/Julia cannot be hosted (see
  # benchmarks/external_energy.py)
  >&2 echo "== n=$n: scipy/torch external rows"
  python "$REPO_DIR/benchmarks/external_energy.py" "$data" "$n" scipy >> "$OUT" \
    || >&2 echo "   external_energy.py (scipy) failed"
  python "$REPO_DIR/benchmarks/external_energy.py" "$data" "$n" torch >> "$OUT" \
    || >&2 echo "   external_energy.py (torch) failed"
done

>&2 echo "wrote $OUT"
cat "$OUT"
