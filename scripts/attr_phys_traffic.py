"""Attribute FULL-forward physical HBM traffic to source lines (dev tool).

The per-stage physical-traffic table (probe_phys_traffic.py) uses isolated
stage compiles; cross-stage fusion in the real program eliminates boundary
materializations, so stage sums overcount ~25%. This walks the compiled
FULL forward's ENTRY computation instead and attributes every top-level
instruction's (padded) bytes to its `metadata.op_name` source file:line —
the ground truth for "which Python line buys which GB" in the program the
benchmark actually runs. Compile-only — never touches the TPU server.

Usage: python scripts/attr_phys_traffic.py [--model XL] [--int8] [--top 40]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import collections
import re

import numpy as np
import jax
import jax.numpy as jnp

from probe_refine_hlo import (  # noqa: E402 (shared ENTRY walker)
    META_RE, SHAPE_RE, parse_entry, shape_bytes)
from s2m2_tpu.config import get_config
from s2m2_tpu.models import quant
from s2m2_tpu.models.init import init_params
from s2m2_tpu.models.s2m2 import forward

PEAK_BW = 819.0


def parse_entry_attr(hlo_text):
    """(src, op, phys_out, log_out, name, rw) per top-level instruction.
    phys_out charges OUTPUT bytes only; rw charges output+operand reads
    (each consumer's read is a real HBM transfer — the measured frame time
    tracks the rw total)."""
    return [(src, op, o_phys, o_log, name, rw)
            for name, op, rw, _, o_phys, o_log, src in parse_entry(hlo_text)]


def classify_copies(hlo_text, top=25):
    """Group ENTRY-level `copy`/no-metadata instructions by output
    shape+dtype. The full-forward attribution leaves ~36 GB physical in
    layout/plumbing instructions that carry NO source metadata (28.3 GB of
    pure `copy` at XL@1216 int8) — this ranks those by shape so each bucket
    can be traced to the producer/consumer layout mismatch that forces it."""
    rows = collections.Counter()
    counts = collections.Counter()
    in_entry = False
    depth = 0
    for ln in hlo_text.splitlines():
        if ln.startswith("ENTRY "):
            in_entry = True
            depth = ln.count("{") - ln.count("}")
            continue
        if not in_entry:
            continue
        depth += ln.count("{") - ln.count("}")
        if depth <= 0:
            break
        s = ln.strip()
        # ([\w\-]+): capture hyphenated opcodes whole, so the skip list
        # matches `get-tuple-element` exactly and `copy-start`/`copy-done`
        # stay distinct from `copy` (ADVICE r4)
        # the shape group allows one level of nested parens (async-fusion
        # outputs are tuples-of-tuples like ((bf16[...]), s32[]))
        m = re.match(
            r"%?[\w.\-]+\s*=\s*(\((?:[^()]|\([^()]*\))*\)|[^\s]+)\s+([\w\-]+)",
            s)
        if not m:
            continue
        shapes_str, op = m.groups()
        if op in ("parameter", "constant", "get-tuple-element", "bitcast",
                  "tuple"):
            continue
        has_meta = META_RE.search(ln) is not None
        if op != "copy" and has_meta:
            continue  # only the unattributed layout/plumbing instructions
        phys = 0
        for dt, dims, lay in SHAPE_RE.findall(shapes_str):
            phys += shape_bytes(dt, dims, lay)[0]
        # keep the layout minor-to-major in the bucket key: copies of one
        # logical shape with different assigned layouts are DIFFERENT
        # relayout families with different padded sizes (ADVICE r4)
        key = (op, SHAPE_RE.sub(
            lambda mm: f"{mm.group(1)}[{mm.group(2)}]"
                       + (f"{{{mm.group(3)}}}" if mm.group(3) else ""),
            shapes_str))
        rows[key] += phys
        counts[key] += 1
    print(f"\ntop {top} unattributed layout/plumbing buckets "
          "(op, output shape -> physical GB x count):")
    for (op, shape), p in rows.most_common(top):
        print(f"  {op:12s} {shape:40s} {p/1e9:7.2f} GB  x{counts[(op, shape)]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="XL")
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--copies", action="store_true",
                    help="rank unattributed copy/plumbing buckets by shape")
    args = ap.parse_args()

    from s2m2_tpu.runtime.engine import cast_params, fp32_keep_paths

    cfg = get_config(args.model)
    # mirror the engine's headline param policy: bf16 + fp32-island heads
    params = cast_params(init_params(cfg, seed=0), jnp.bfloat16,
                         fp32_keep_paths(cfg))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (1, args.height, args.width, 3)),
                      jnp.bfloat16)

    fn = lambda p, a, b: forward(p, a, b, cfg)[0]
    if args.int8:
        def obs(p, a, b):
            with quant.observe(skip_fp32=True) as o:
                out = fn(p, a, b)
            return out, (jnp.stack(o) if o else jnp.zeros((0,)))
        spec0 = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), (params, img, img))
        n = jax.eval_shape(obs, *spec0)[1].shape[0]
        scales = tuple([0.05] * int(n))
        qparams = quant.quantize_params_tree(params, skip_fp32=True)
        fn0 = fn
        fn = lambda p, a, b: _quantized_call(fn0, scales, (p, a, b))
        params = qparams

    spec = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                        (params, img, img))
    comp = jax.jit(fn).lower(*spec).compile()
    rows = parse_entry_attr(comp.as_text())
    tot_phys = sum(r[2] for r in rows)
    tot_log = sum(r[3] for r in rows)
    tot_rw = sum(r[5] for r in rows)
    print(f"reads+writes physical: {tot_rw/1e9:.1f} GB "
          f"-> {tot_rw/1e9/PEAK_BW*1e3:.1f} ms @819 GB/s")
    print(f"FULL forward {args.model}@{args.width}x{args.height} "
          f"({'int8' if args.int8 else 'bf16'}): "
          f"{tot_phys/1e9:.1f} GB physical vs {tot_log/1e9:.1f} GB logical "
          f"({tot_phys/max(tot_log,1):.2f}x pad) — "
          f"phys roofline {tot_phys/1e9/PEAK_BW*1e3:.1f} ms")
    by_src = collections.Counter()
    by_src_log = collections.Counter()
    by_src_rw = collections.Counter()
    for src, op, p, l, _, rw in rows:
        by_src[src] += p
        by_src_log[src] += l
        by_src_rw[src] += rw
    print(f"\ntop {args.top} source lines by physical output bytes:")
    for src, p in by_src.most_common(args.top):
        print(f"  {src:42s} {p/1e9:7.2f} GB phys ({by_src_log[src]/1e9:6.2f} log)")
    print(f"\ntop {args.top} source lines by reads+writes:")
    for src, p in by_src_rw.most_common(args.top):
        print(f"  {src:42s} {p/1e9:7.2f} GB r+w")
    by_op = collections.Counter()
    for _, op, p, l, _, _ in rows:
        by_op[op] += p
    print("\nby op kind (physical GB):")
    for op, p in by_op.most_common(10):
        print(f"  {op:24s} {p/1e9:8.2f}")
    if args.copies:
        classify_copies(comp.as_text(), top=args.top)


def _quantized_call(fn, scales, x):
    with quant.quantized(scales, skip_fp32=True):
        return fn(*x)


if __name__ == "__main__":
    main()
