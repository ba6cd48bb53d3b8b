"""Candidate layouts for MULTI-HEAD no-fold scanline attention (dev tool).

The round-4 copy census names the multi-head fold relayouts at the 8x/16x
MRT scales as the top tractable copy family (~3.7+ GB: bf16[256,152,2,192]
<-> bf16[256,2,152,192] transpose pairs x18, bf16[256,152,384] x48 and
bf16[128,76,768] x48 fold relayouts). The heads==1 4D rewrite killed the
same family at 4x (+1.8% e2e). This compiles candidate multi-head cores at
the REAL z1/z2 XL shapes and censuses ENTRY-level copy/transpose bytes so
the winning layout is chosen on evidence before touching attention.py.

Candidates (all numerically equal to the fold path, asserted on CPU):
  V0 fold     — today's path: (2B,R,W,C)->(2B*R,W,C) fold + split_heads
                transpose to (2B*R,h,W,d)  [the copy family under attack]
  V1 nhd      — q/k/v stay (B,R,W,h,d) (bitcast reshape); heads batch
                mid-position in the dots: "brihd,brjhd->brhij"
  V2 hnd      — explicit transpose to (B,R,h,W,d); standard batched dots;
                head-merge folded into the proj contraction "...hid,hdo->..io"
  V3 sliced   — h independent (B,R,W,d) heads via weight column slices;
                proj = sum of per-head dots (concat-contraction identity)

Usage: python scripts/probe_mh4d.py [--scale z1|z2|z3] [--blocks 2] [--cpu]

z3 probes the 2D GLOBAL bottleneck (3D token form, heads=8): fold 0.635 vs
sliced 0.777 GB reads+writes — the fold path stays there (24 re-reads of zn
outweigh ~8 MB of split copies). sliced_qkv (per-head fused qkv GEMM) wins
z2 narrowly but regresses z1 badly; one uniform sliced path shipped.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import collections

import numpy as np
import jax
import jax.numpy as jnp

from probe_refine_hlo import SHAPE_RE, parse_entry, shape_bytes  # noqa: E402


def layer_norm(x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def softmax_bf16(score):
    return jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(
        jnp.bfloat16)


# --- candidate self-attention cores: z (2B, R, W, C) -> same ---------------

def core_fold(p, z, nh):
    b, r, w, c = z.shape
    d = c // nh
    zf = layer_norm(z).reshape(b * r, w, c)
    q = (zf @ p["q"]).reshape(b * r, w, nh, d).transpose(0, 2, 1, 3)
    k = (zf @ p["k"]).reshape(b * r, w, nh, d).transpose(0, 2, 1, 3)
    v = (zf @ p["v"]).reshape(b * r, w, nh, d).transpose(0, 2, 1, 3)
    score = jnp.einsum("bhic,bhjc->bhij", q * d ** -0.5, k,
                       preferred_element_type=jnp.bfloat16)
    attn = softmax_bf16(score)
    out = jnp.einsum("bhij,bhjc->bhic", attn, v,
                     preferred_element_type=jnp.bfloat16)
    out = out.transpose(0, 2, 1, 3).reshape(b * r, w, c)
    return (out @ p["proj"]).reshape(b, r, w, c) + z


def core_nhd(p, z, nh):
    b, r, w, c = z.shape
    d = c // nh
    zn = layer_norm(z)
    q = (zn @ p["q"]).reshape(b, r, w, nh, d)
    k = (zn @ p["k"]).reshape(b, r, w, nh, d)
    v = (zn @ p["v"]).reshape(b, r, w, nh, d)
    score = jnp.einsum("brihd,brjhd->brhij", q * d ** -0.5, k,
                       preferred_element_type=jnp.bfloat16)
    attn = softmax_bf16(score)
    out = jnp.einsum("brhij,brjhd->brhid", attn, v,
                     preferred_element_type=jnp.bfloat16)
    return jnp.einsum("brhid,hdo->brio", out,
                      p["proj"].reshape(nh, d, c)) + z


def core_hnd(p, z, nh):
    b, r, w, c = z.shape
    d = c // nh
    zn = layer_norm(z)
    split = lambda t: t.reshape(b, r, w, nh, d).transpose(0, 1, 3, 2, 4)
    q, k, v = split(zn @ p["q"]), split(zn @ p["k"]), split(zn @ p["v"])
    score = jnp.einsum("...ic,...jc->...ij", q * d ** -0.5, k,
                       preferred_element_type=jnp.bfloat16)
    attn = softmax_bf16(score)
    out = jnp.einsum("...ij,...jc->...ic", attn, v,
                     preferred_element_type=jnp.bfloat16)
    return jnp.einsum("brhid,hdo->brio", out,
                      p["proj"].reshape(nh, d, c)) + z


def core_sliced(p, z, nh):
    b, r, w, c = z.shape
    d = c // nh
    zn = layer_norm(z)
    acc = None
    for h in range(nh):
        sl = slice(h * d, (h + 1) * d)
        q = zn @ p["q"][:, sl]
        k = zn @ p["k"][:, sl]
        v = zn @ p["v"][:, sl]
        score = jnp.einsum("...ic,...jc->...ij", q * d ** -0.5, k,
                           preferred_element_type=jnp.bfloat16)
        out = jnp.einsum("...ij,...jc->...ic", softmax_bf16(score), v,
                         preferred_element_type=jnp.bfloat16)
        y = out @ p["proj"][sl, :]
        acc = y if acc is None else acc + y
    return acc + z


def core_sliced_qkv(p, z, nh):
    """Per-head heads, but q/k/v of head h come from ONE (c, 3d) GEMM —
    3x fewer reads of zn than core_sliced; the 3d minor split lands on
    d-boundaries (192: not tile-aligned — the census prices the cost)."""
    b, r, w, c = z.shape
    d = c // nh
    zn = layer_norm(z)
    acc = None
    for h in range(nh):
        sl = slice(h * d, (h + 1) * d)
        wh = jnp.concatenate([p["q"][:, sl], p["k"][:, sl], p["v"][:, sl]],
                             axis=1)
        qkv = zn @ wh
        q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
        score = jnp.einsum("...ic,...jc->...ij", q * d ** -0.5, k,
                           preferred_element_type=jnp.bfloat16)
        out = jnp.einsum("...ij,...jc->...ic", softmax_bf16(score), v,
                         preferred_element_type=jnp.bfloat16)
        y = out @ p["proj"][sl, :]
        acc = y if acc is None else acc + y
    return acc + z


CORES = {"fold": core_fold, "nhd": core_nhd, "hnd": core_hnd,
         "sliced": core_sliced, "sliced_qkv": core_sliced_qkv}


def census(hlo_text):
    by_op = collections.Counter()
    buckets = collections.Counter()
    in_entry = False
    depth = 0
    import re
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
        m = re.match(r"%?[\w.\-]+\s*=\s*(\((?:[^()]|\([^()]*\))*\)|[^\s]+)"
                     r"\s+([\w\-]+)", ln.strip())
        if not m:
            continue
        shapes_str, op = m.groups()
        if op in ("parameter", "constant", "get-tuple-element", "bitcast",
                  "tuple"):
            continue
        phys = sum(shape_bytes(dt, dims, lay)[0]
                   for dt, dims, lay in SHAPE_RE.findall(shapes_str))
        by_op[op] += phys
        if op in ("copy", "transpose"):
            buckets[(op, shapes_str.strip())] += phys
    return by_op, buckets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="z1", choices=["z1", "z2", "z3"])
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--cpu", action="store_true",
                    help="also assert numeric parity across cores (CPU)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.scale == "z3":
        return main_z3()

    # XL@1216x1024 block shapes (README copy-census family)
    if args.scale == "z1":
        shape, nh = (2, 128, 152, 384), 2
    else:
        shape, nh = (2, 64, 76, 768), 4
    c = shape[-1]
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    mk = lambda: jnp.asarray(
        rng.standard_normal((c, c)) / np.sqrt(c), jnp.bfloat16)
    params = [{k: mk() for k in ("q", "k", "v", "proj")}
              for _ in range(args.blocks)]

    # FFN between attention sublayers, on the 4D block shape (as the real
    # basic_attn_block does): the fold path's block-boundary relayouts only
    # appear when a 4D consumer follows the folded attention output.
    fparams = [(mk(), mk()) for _ in range(args.blocks)]

    def stack(core):
        def fn(ps, fps, x):
            for p, (w1, w2) in zip(ps, fps):
                x = core(p, x, nh)
                x = (jax.nn.gelu(layer_norm(x) @ w1) @ w2) + x
            return x
        return fn

    if args.cpu:
        ref = jax.jit(stack(core_fold))(params, fparams, z)
        for name in ("nhd", "hnd", "sliced"):
            got = jax.jit(stack(CORES[name]))(params, fparams, z)
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"parity {name:7s} vs fold: max {err:.5f}")
        return

    for name, core in CORES.items():
        comp = jax.jit(stack(core)).lower(params, fparams, z).compile()
        by_op, buckets = census(comp.as_text())
        tot = sum(by_op.values())
        cp = by_op.get("copy", 0) + by_op.get("transpose", 0)
        # reads+writes accounting (parse_entry row[2]): per-head GEMMs
        # re-read their input nh x 3 times — output-only bytes miss that
        rw = sum(r[2] for r in parse_entry(comp.as_text()))
        print(f"\n== {name}: out phys {tot/1e9:.3f} GB "
              f"(reads+writes {rw/1e9:.3f}), "
              f"copy+transpose {cp/1e9:.3f} GB ==")
        for (op, sh), pbytes in buckets.most_common(8):
            print(f"   {op:10s} {sh[:70]:70s} {pbytes/1e6:8.1f} MB")




# --- z3 global-attention (3D token) variants: (2, N, C) with heads=8 -----

def core3d_fold(p, z, nh):
    b, n, c = z.shape
    d = c // nh
    zf = layer_norm(z)
    split = lambda t: t.reshape(b, n, nh, d).transpose(0, 2, 1, 3)
    q, k, v = split(zf @ p["q"]), split(zf @ p["k"]), split(zf @ p["v"])
    score = jnp.einsum("bhic,bhjc->bhij", q * d ** -0.5, k,
                       preferred_element_type=jnp.bfloat16)
    out = jnp.einsum("bhij,bhjc->bhic", softmax_bf16(score), v,
                     preferred_element_type=jnp.bfloat16)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    return (out @ p["proj"]) + z


def core3d_sliced(p, z, nh):
    b, n, c = z.shape
    d = c // nh
    zf = layer_norm(z)
    acc = None
    for h in range(nh):
        sl = slice(h * d, (h + 1) * d)
        q, k, v = zf @ p["q"][:, sl], zf @ p["k"][:, sl], zf @ p["v"][:, sl]
        score = jnp.einsum("bic,bjc->bij", q * d ** -0.5, k,
                           preferred_element_type=jnp.bfloat16)
        out = jnp.einsum("bij,bjc->bic", softmax_bf16(score), v,
                         preferred_element_type=jnp.bfloat16)
        y = out @ p["proj"][sl, :]
        acc = y if acc is None else acc + y
    return acc + z


def main_z3():
    shape, nh = (2, 1216, 768), 8  # XL z3: 32x38 tokens
    b, n, c = shape
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    mk = lambda: jnp.asarray(
        rng.standard_normal((c, c)) / np.sqrt(c), jnp.bfloat16)
    params = [{k: mk() for k in ("q", "k", "v", "proj")} for _ in range(2)]
    fparams = [(mk(), mk()) for _ in range(2)]

    def stack(core):
        def fn(ps, fps, x):
            for p, (w1, w2) in zip(ps, fps):
                x = core(p, x, nh)
                x = (jax.nn.gelu(layer_norm(x) @ w1) @ w2) + x
            return x
        return fn

    for name, core in (("fold3d", core3d_fold), ("sliced3d", core3d_sliced)):
        comp = jax.jit(stack(core)).lower(params, fparams, z).compile()
        by_op, buckets = census(comp.as_text())
        tot = sum(by_op.values())
        rw = sum(r[2] for r in parse_entry(comp.as_text()))
        cp = by_op.get("copy", 0) + by_op.get("transpose", 0)
        print(f"== {name}: out phys {tot/1e9:.3f} GB "
              f"(reads+writes {rw/1e9:.3f}), copy+transpose {cp/1e9:.3f} ==")

if __name__ == "__main__":
    main()
