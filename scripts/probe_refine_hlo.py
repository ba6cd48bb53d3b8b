"""Where do the local-refiner's bytes actually go? (dev tool)

The refine stage measures 99 ms against a 43 ms logical-bytes roofline and
does NOT speed up with batch (XL@1216 int8: batch=2 = 3.069 FPS vs batch=1
3.141 — frame time scales linearly), so the gap is per-work, not dispatch
latency. Hypothesis: physical HBM traffic exceeds the logical cost-analysis
bytes because tensors pad to the TPU tile in their assigned layouts and
because fusion boundaries materialize more intermediates than the logical
count assumes. This walks the compiled ENTRY computation and charges every
top-level instruction its operands+output bytes (layout-padded) — fusion
internals don't touch HBM and are excluded. Compile-only — never touches
the TPU server.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import collections
import re

import numpy as np
import jax
import jax.numpy as jnp

from s2m2_tpu.config import get_config
from s2m2_tpu.models.init import init_params
from s2m2_tpu.models.cost_volume import make_cost_volume
from s2m2_tpu.models.refiners import local_refiner

BITS = {"f32": 32, "s32": 32, "u32": 32, "bf16": 16, "f16": 16,
        "s16": 16, "s8": 8, "u8": 8, "pred": 8}
SHAPE_RE = re.compile(
    r"(f32|bf16|s8|s32|u8|pred|s16|u32|f16)\[([0-9,]*)\](?:\{([0-9,]+)[^}]*\})?")


def shape_bytes(dt, dims, lay):
    bits = BITS[dt]
    if not dims:
        return bits // 8, bits // 8
    shape = [int(x) for x in dims.split(",")]
    order = ([int(x) for x in lay.split(",")] if lay
             else list(range(len(shape)))[::-1])
    if len(order) != len(shape):
        order = list(range(len(shape)))[::-1]
    minor = shape[order[0]] if order else 1
    second = shape[order[1]] if len(order) > 1 else 1
    sub = {32: 8, 16: 16, 8: 32}.get(bits, 8)
    pad_minor = -(-minor // 128) * 128
    pad_second = -(-second // sub) * sub
    rest = 1
    for i in order[2:]:
        rest *= shape[i]
    phys = rest * pad_second * pad_minor * bits // 8
    logical = int(np.prod(shape)) * bits // 8
    return phys, logical


META_RE = re.compile(r'source_file="([^"]+)".*?source_line=(\d+)')


def parse_entry(hlo_text):
    """Charge each top-level ENTRY instruction its output bytes + operand
    output bytes (reads). Returns rows
    (name, op, phys_out+reads, log_out+reads, phys_out, log_out, src)
    where src is the instruction metadata's "file.py:line" (or
    "(no metadata)") — attr_phys_traffic.py aggregates on it."""
    import os as _op

    lines = hlo_text.splitlines()
    in_entry = False
    depth = 0
    # instruction name -> (phys, logical) of its output
    out_bytes = {}
    rows = []
    for ln in lines:
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
        # op captures hyphenated opcodes too ([\w\-]+): with (\w+) alone,
        # `get-tuple-element` parsed as `get` and bypassed the skip list
        # below (charging full padded bytes to zero-traffic GTE aliasing),
        # and `copy-start`/`copy-done` collapsed into `copy` (ADVICE r4)
        m = re.match(
            r"(%?[\w.\-]+)\s*=\s*(\((?:[^()]|\([^()]*\))*\)|[^\s]+)\s+([\w\-]+)",
            s)
        if not m:
            continue
        name, shapes_str, op = m.groups()
        shapes = SHAPE_RE.findall(shapes_str)
        o_phys = o_log = 0
        # VMEM prefetch accounting (round 5): memory-space-assignment emits
        # copy-start/copy-done pairs staging operands into scratch memory
        # S(1) (VMEM). Their HBM cost is ONE read of the source (charged as
        # this instruction's operand read); the S(1) write is on-chip and
        # the tuple's second element merely aliases the operand. Charging
        # the full tuple + the done's output triple-counted the buffer
        # (~19 GB phantom traffic on the XL int8 census).
        if op == "copy-start" and shapes:
            first_elem = shapes_str.split("},")[0]  # dest incl. its layout
            if "S(1)" not in first_elem:
                # plain async HBM copy: charge the destination once
                p, l = shape_bytes(*shapes[0])
                o_phys += p
                o_log += l
        elif op == "copy-done":
            pass  # aliases the copy-start's destination — no new movement
        else:
            for dt, dims, lay in shapes:
                p, l = shape_bytes(dt, dims, lay)
                o_phys += p
                o_log += l
        out_bytes[name] = (o_phys, o_log)
        # operand reads: referenced instruction names
        operands = re.findall(r"(%?[\w.\-]+)", s.split(op, 1)[1] if op in s else "")
        r_phys = r_log = 0
        for t in set(operands):
            if t in out_bytes and t != name:
                p, l = out_bytes[t]
                r_phys += p
                r_log += l
        if op in ("parameter", "constant", "get-tuple-element", "bitcast",
                  "tuple"):
            continue  # no data movement of their own
        mm = META_RE.search(ln)
        src = (f"{_op.path.basename(mm.group(1))}:{mm.group(2)}"
               if mm else "(no metadata)")
        rows.append((name, op, o_phys + r_phys, o_log + r_log, o_phys, o_log,
                     src))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="XL")
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    cfg = get_config(args.model)
    c = cfg.ch
    H, W = args.height, args.width
    h4, w4 = H // 4, W // 4
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_params(cfg, seed=0))
    rng = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
    one = jnp.asarray(rng.uniform(0.1, 0.9, (1, h4, w4, 1)), jnp.float32)
    cv = rnd(1, h4, w4, w4)

    def one_refine(p, hidden, ctx, disp, conf, occ, cvv):
        state = make_cost_volume(cvv, radius=cfg.radius)
        return local_refiner(p, hidden, ctx, disp, conf, occ, state)

    a = (params["refiner"], rnd(1, h4, w4, c), rnd(1, h4, w4, c),
         one * 30, one, one, cv)
    spec = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), a)
    comp = jax.jit(one_refine).lower(*spec).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"cost analysis: {ca.get('flops',0)/1e12:.2f} TF  "
          f"{ca.get('bytes accessed',0)/1e9:.2f} GB logical")

    rows = parse_entry(comp.as_text())
    tot_phys = sum(r[2] for r in rows)
    tot_log = sum(r[3] for r in rows)
    print(f"entry-computation materialized traffic: "
          f"{tot_phys/1e9:.2f} GB physical vs {tot_log/1e9:.2f} GB logical "
          f"({tot_phys/max(tot_log,1):.2f}x padding)")
    by_op = collections.Counter()
    for _, op, p, l, *_ in rows:
        by_op[op] += p
    print("\nby op kind (physical GB):")
    for op, p in by_op.most_common(12):
        print(f"  {op:24s} {p/1e9:8.2f}")
    print(f"\ntop {args.top} instructions by physical bytes (out+reads):")
    for name, op, p, l, op_, ol, _src in sorted(rows, key=lambda r: -r[2])[:args.top]:
        print(f"  {op:20s} {p/1e6:9.1f} MB phys ({l/1e6:9.1f} log)  {name[:60]}")


if __name__ == "__main__":
    main()
