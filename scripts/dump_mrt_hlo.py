"""Dump optimized HLO of stacked_mrt and summarize ENTRY ops by output bytes
(dev tool; replaces the former dump_mrt_hlo / dump_mrt_hlo2 scratch pair).

Groups ENTRY-computation ops by (op kind [incl. fusion kind], output shape)
so layout copies, conversions and fusion traffic stand out.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import collections
import re

import jax
import jax.numpy as jnp

from s2m2_tpu.config import get_config
from s2m2_tpu.models.init import init_params
from s2m2_tpu.models.mrt import stacked_mrt

DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "pred": 1,
            "u32": 4, "u8": 1, "s8": 1}
SHAPE_PAT = re.compile(
    r"=\s+\(?((?:f32|bf16|f16|s32|pred|u32|u8|s8)\[[0-9,]*\][^ )]*)")


def nbytes(spec):
    dt = spec.split("[")[0]
    dims = spec[spec.index("[") + 1:spec.index("]")]
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DT_BYTES[dt]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="XL")
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--top", type=int, default=35)
    args = ap.parse_args()

    cfg = get_config(args.model)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_params(cfg, seed=0))
    c = cfg.ch
    h4, w4 = args.height // 4, args.width // 4
    z0 = jnp.zeros((2, h4, w4, c), jnp.bfloat16)
    z1 = jnp.zeros((2, h4 // 2, w4 // 2, c), jnp.bfloat16)
    z2 = jnp.zeros((2, h4 // 4, w4 // 4, 2 * c), jnp.bfloat16)
    z3 = jnp.zeros((2, h4 // 8, w4 // 8, 2 * c), jnp.bfloat16)

    fn = lambda p, a, b, cc, d: stacked_mrt(
        p, a, b, cc, d, num_transformer=cfg.num_transformer,
        num_heads=cfg.num_heads)
    comp = jax.jit(fn).lower(params["transformer"], z0, z1, z2, z3).compile()
    txt = comp.as_text()
    print("total HLO lines:", len(txt.splitlines()))

    entry = txt[txt.index("ENTRY "):]
    groups = collections.Counter()
    counts = collections.Counter()
    for line in entry.splitlines()[1:]:
        ls = line.strip()
        if not ls or (ls.startswith("ROOT") and "tuple(" in ls):
            continue
        m = SHAPE_PAT.search(ls)
        if m is None or "parameter(" in ls or "constant" in ls:
            continue
        spec = m.group(1)
        b = nbytes(spec)
        # op name: first identifier followed by '(' AFTER the result shape
        # (layout annotations contain parens, so a naive split breaks)
        rhs = ls.split("=", 1)[1]
        km = re.search(r"\s([a-z][a-z0-9\-]*)\(", rhs)
        kind = km.group(1) if km else "?"
        if kind == "fusion":
            kf = re.search(r"kind=(\w+)", ls)
            kind = f"fusion:{kf.group(1) if kf else '?'}"
        groups[(kind, spec.split("{")[0])] += b
        counts[(kind, spec.split("{")[0])] += 1

    print(f"ENTRY ops grouped by (kind, shape), top {args.top} by total bytes:")
    for (kind, spec), b in groups.most_common(args.top):
        print(f"{b/1e9:8.2f} GB x{counts[(kind, spec)]:4d}  {kind:22s} {spec}")
    print(f"\nENTRY total output bytes: {sum(groups.values())/1e9:.1f} GB")

    ma = comp.memory_analysis()
    if ma:
        print("memory:", ma)


if __name__ == "__main__":
    main()
