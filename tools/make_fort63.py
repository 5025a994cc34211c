#!/usr/bin/env python3
"""Generate a synthetic fort.63-shaped NetCDF-3 classic file (pure struct
packing, no netcdf library) for scale-testing graft.Pipeline.

Mesh: K x K lattice of nodes on [0,K) x [0,K), 2(K-1)^2 triangles,
T timesteps of zeta = sin(0.01*node + 0.5*t).

Usage: tools/make_fort63.py <out.nc> <K> <T>
       K=550 T=4 ~= the reference's production mesh (302,240 nodes).
"""
import struct, sys

def pad4(b):
    return b + b"\x00" * ((4 - len(b) % 4) % 4)

def name(s):
    b = s.encode()
    return struct.pack(">i", len(b)) + pad4(b)

NC_DIM, NC_VAR, NC_ATTR = 0x0A, 0x0B, 0x0C
NC_CHAR, NC_INT, NC_DOUBLE = 2, 4, 6
FILL = -99999.0

def attr_list(attrs):
    if not attrs:
        return struct.pack(">ii", 0, 0)
    out = struct.pack(">ii", NC_ATTR, len(attrs))
    for k, v in attrs:
        out += name(k)
        if isinstance(v, str):
            out += struct.pack(">ii", NC_CHAR, len(v)) + pad4(v.encode())
        else:
            out += struct.pack(">ii", NC_DOUBLE, 1) + struct.pack(">d", v)
    return out

def main():
    out, K, T = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    N = K * K
    M = 2 * (K - 1) * (K - 1)

    def header(begins):
        h = b"CDF\x01" + struct.pack(">i", T)
        h += struct.pack(">ii", NC_DIM, 4)
        h += name("time") + struct.pack(">i", 0)
        h += name("node") + struct.pack(">i", N)
        h += name("nele") + struct.pack(">i", M)
        h += name("nvertex") + struct.pack(">i", 3)
        h += attr_list([("Conventions", "CF-1.6")])
        h += struct.pack(">ii", NC_VAR, 5)
        def var(nm, dims, typ, vsize, attrs=()):
            v = name(nm) + struct.pack(">i", len(dims))
            for d in dims:
                v += struct.pack(">i", d)
            v += attr_list(list(attrs))
            v += struct.pack(">iii", typ, vsize, begins.get(nm, 0))
            return v
        h += var("x", [1], NC_DOUBLE, N * 8)
        h += var("y", [1], NC_DOUBLE, N * 8)
        h += var("element", [2, 3], NC_INT, M * 3 * 4)
        h += var("time", [0], NC_DOUBLE, 8,
                 attrs=[("units", "seconds since 2008-09-09 00:00:00 UTC"),
                        ("base_date", "2008-09-09 00:00:00")])
        h += var("zeta", [0, 1], NC_DOUBLE, N * 8,
                 attrs=[("_FillValue", FILL)])
        return h

    hlen = len(header({}))
    begins = {
        "x": hlen,
        "y": hlen + N * 8,
        "element": hlen + 2 * N * 8,
        "time": hlen + 2 * N * 8 + M * 3 * 4,
        "zeta": hlen + 2 * N * 8 + M * 3 * 4 + 8,
    }
    import math, array
    with open(out, "wb") as f:
        f.write(header(begins))
        xs = array.array("d", (float(i % K) for i in range(N)))
        ys = array.array("d", (float(i // K) for i in range(N)))
        if sys.byteorder == "little":
            xs.byteswap(); ys.byteswap()
        f.write(xs.tobytes()); f.write(ys.tobytes())
        ele = array.array("i")
        for cell in range((K - 1) * (K - 1)):
            r, c = divmod(cell, K - 1)
            a, b = r * K + c, r * K + c + 1
            cc, dd = (r + 1) * K + c, (r + 1) * K + c + 1
            ele.extend([a + 1, b + 1, cc + 1])   # 1-based, as ADCIRC writes
            ele.extend([b + 1, dd + 1, cc + 1])
        if sys.byteorder == "little":
            ele.byteswap()
        f.write(ele.tobytes())
        for t in range(T):
            f.write(struct.pack(">d", t * 3600.0))
            # ~0.1% deterministic dry nodes carry the ADCIRC fill sentinel
            z = array.array("d", (FILL if i % 997 == 0 else
                                  math.sin(0.01 * i + 0.5 * t) * 10.0 for i in range(N)))
            if sys.byteorder == "little":
                z.byteswap()
            f.write(z.tobytes())
    print(f"{out}: {N:,} nodes, {M:,} triangles, {T} timesteps")

if __name__ == "__main__":
    main()
