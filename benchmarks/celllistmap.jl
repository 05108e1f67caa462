#!/usr/bin/env julia
# CellListMap.jl twin of the zelll_tpu LJ benchmark: reads a LAMMPS
# `read_data` file produced by benchmarks/lammps_data.py (bit-identical to
# the reference's lmp-data stream) and reports the same per-atom LJ energy,
# so all three tools (zelll_tpu, LAMMPS, CellListMap.jl) can be compared on
# one dataset. Output: one CSV row
#   n,reps,energy_per_atom,runtime_s,memory_mb,tool
# matching run_comparison.sh's schema.
#
# Usage: julia benchmarks/celllistmap.jl atomsinabox.txt [reps]

using CellListMap
using Printf

function read_atoms(path)
    coords = Vector{NTuple{3,Float64}}()
    inside = false
    for line in eachline(path)
        s = strip(line)
        if startswith(s, "Atoms")
            inside = true
            continue
        end
        if !inside || isempty(s) || startswith(s, "#")
            continue
        end
        f = split(s)
        length(f) >= 5 || continue
        push!(coords, (parse(Float64, f[3]), parse(Float64, f[4]),
                       parse(Float64, f[5])))
    end
    permutedims(reduce(hcat, collect.(coords)))'  # 3 x n matrix
end

function lj_per_atom(particles, cutoff, n)
    # non-periodic box large enough to contain the data (free boundaries,
    # like the LAMMPS config's `boundary f f f`)
    lims = limits(particles)
    box = Box(lims, cutoff)
    cl = CellList(particles, box)
    total = map_pairwise!(
        (x, y, i, j, d2, acc) -> begin
            t = (1.0 / d2)^3
            acc + 4.0 * t * (t - 1.0)
        end,
        0.0, box, cl; parallel=false,
    )
    total / n
end

path = ARGS[1]
reps = length(ARGS) >= 2 ? parse(Int, ARGS[2]) : 1
particles = read_atoms(path)
n = size(particles, 2)
cutoff = 10.0

e = lj_per_atom(particles, cutoff, n)  # warm up (compile)
t0 = time_ns()
for _ in 1:reps
    e = lj_per_atom(particles, cutoff, n)
end
dt = (time_ns() - t0) * 1e-9 / reps
mem = Base.gc_live_bytes() / 1024^2

@printf("%d,%d,%.14g,%.6g,%.1f,CellListMap.jl\n", n, reps, e, dt, mem)
