"""Compile-derived 2-chip scaling accounting for the band-sharded int8 XL
forward (dev tool; round-4 verdict weak #2d: the README's ">=80% scaling"
was asserted, never derived).

Method — all compile-only, no TPU server contact:
  1. Compile the UNSHARDED int8 XL forward and the band-sharded (band=2)
     int8 XL forward on virtual CPU devices; walk both ENTRY computations
     with the (8,128)-tile physical-bytes model (probe_refine_hlo walker).
     The partitioned module is the per-device SPMD program, so its
     non-collective output bytes are per-chip HBM traffic.
  2. per-chip compute time t2_hbm = per-chip bytes scaled into the TPU
     accounting: T2_tpu = T1_tpu * (T2_cpu / T1_cpu), where T1_tpu is the
     single-chip physical total from the TPU-compiled program
     (attr_phys_traffic.py; pass --t1-tpu to update) — this transfers the
     sharding OVERHEAD RATIO from the CPU compile onto the TPU-calibrated
     baseline rather than trusting CPU layouts directly.
  3. collective bytes C = sum of collective output bytes in the partitioned
     module (logical — ICI moves logical bytes); t_ici = C / BW_ICI.
  4. bounds: serial t2 = t2_hbm + t_ici; overlapped t2 = max(t2_hbm, t_ici).
     Latency scaling efficiency = t1 / (2 * t2).

ICI assumption (printed): v5e chips have 4 ICI links x ~45 GB/s one-way
(scaling-book numbers); a 2-chip group connects over 2 links per direction
-> 90 GB/s. DATA-parallel serving (one frame per chip) needs NO collectives
and scales at ~100% by construction; band sharding is the LATENCY config.

Usage: python scripts/estimate_mesh_scaling.py [--n-band 2] [--t1-tpu GB]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

_os.environ["XLA_FLAGS"] = (
    _os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import argparse
import re

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from probe_refine_hlo import parse_entry  # noqa: E402

PEAK_HBM = 819.0   # GB/s v5e
ICI_2CHIP = 90.0   # GB/s one-way between a 2-chip pair (2 links x 45)

COLLECTIVE_RE = re.compile(
    r"\b(all-gather|all-reduce|collective-permute|reduce-scatter|"
    r"all-to-all)\b")


def walk(comp_text):
    """(non-collective physical bytes, collective output physical bytes,
    collective count) over the ENTRY computation; collective ops also show
    up inside async wrappers (-start/-done) — count the -start only."""
    noncoll = 0
    coll = 0
    n_coll = 0
    for name, op, _, _, o_phys, o_log, _ in parse_entry(comp_text):
        base = op.replace("-start", "")
        if COLLECTIVE_RE.search(base) and not op.endswith("-done"):
            coll += o_log  # ICI moves logical bytes
            n_coll += 1
        else:
            noncoll += o_phys
    return noncoll, coll, n_coll


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="XL")
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--n-band", type=int, default=2)
    ap.add_argument("--t1-tpu", type=float, default=128.6,
                    help="single-chip physical GB from attr_phys_traffic "
                         "--int8 on the TPU backend (default: round-5 "
                         "measured value)")
    ap.add_argument("--fps1", type=float, default=3.173,
                    help="measured single-chip FPS for the same program")
    args = ap.parse_args()

    from s2m2_tpu.config import get_config
    from s2m2_tpu.models import quant
    from s2m2_tpu.models.init import init_params
    from s2m2_tpu.models.s2m2 import forward
    from s2m2_tpu.parallel.mesh import image_sharding, make_mesh, replicated

    cfg = get_config(args.model)
    shapes = jax.eval_shape(lambda: init_params(cfg, seed=0))
    pa = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, jnp.bfloat16), shapes)
    a = jax.ShapeDtypeStruct((1, args.height, args.width, 3), jnp.bfloat16)

    def obs(p, x, y):
        with quant.observe(skip_fp32=True) as o:
            out = forward(p, x, y, cfg)
        return out, (jnp.stack(o) if o else jnp.zeros((0,)))

    n_sites = int(jax.eval_shape(obs, pa, a, a)[1].shape[0])
    scales = tuple([0.05] * n_sites)
    qa = jax.eval_shape(
        lambda p: quant.quantize_params_tree(p, skip_fp32=True), pa)

    def qfwd(p, x, y):
        with quant.quantized(scales, skip_fp32=True):
            return forward(p, x, y, cfg)

    print(f"compiling unsharded int8 {args.model} (CPU, abstract)...")
    c1 = jax.jit(qfwd).lower(qa, a, a).compile()
    t1_cpu, _, _ = walk(c1.as_text())

    print(f"compiling band={args.n_band} int8 {args.model}...")
    mesh = make_mesh(n_data=1, n_band=args.n_band)
    c2 = jax.jit(qfwd,
                 in_shardings=(replicated(mesh), image_sharding(mesh),
                               image_sharding(mesh))
                 ).lower(qa, a, a).compile()
    t2_cpu, coll, n_coll = walk(c2.as_text())

    ratio = t2_cpu / t1_cpu
    t2_tpu = args.t1_tpu * ratio
    t1_ms = args.t1_tpu / PEAK_HBM * 1e3
    t2_hbm_ms = t2_tpu / PEAK_HBM * 1e3
    t_ici_ms = coll / 1e9 / ICI_2CHIP * 1e3
    serial = t2_hbm_ms + t_ici_ms
    overlap = max(t2_hbm_ms, t_ici_ms)
    eff_serial = t1_ms / (args.n_band * serial)
    eff_overlap = t1_ms / (args.n_band * overlap)

    # project FPS from the measured single-chip FPS (scales the whole
    # measured frame time, which includes the latency-bound stages the
    # roofline misses, by the derived per-chip work ratio)
    frame1_ms = 1e3 / args.fps1
    fps_serial = 1e3 / (frame1_ms * serial / t1_ms)
    fps_overlap = 1e3 / (frame1_ms * overlap / t1_ms)

    print(f"\nunsharded CPU-walk physical: {t1_cpu/1e9:.1f} GB")
    print(f"band={args.n_band} per-chip physical: {t2_cpu/1e9:.1f} GB "
          f"(overhead ratio {ratio:.3f} vs ideal {1/args.n_band:.3f})")
    print(f"collectives: {n_coll} ops, {coll/1e9:.2f} GB logical over ICI "
          f"(assumed {ICI_2CHIP:.0f} GB/s for a 2-chip pair)")
    print(f"\nTPU-calibrated accounting (t1_tpu={args.t1_tpu:.1f} GB "
          f"-> {t1_ms:.1f} ms roofline):")
    print(f"  per-chip HBM time {t2_hbm_ms:.1f} ms, ICI time {t_ici_ms:.2f} ms")
    print(f"  latency scaling eff: {eff_overlap:.1%} (overlapped) "
          f"... {eff_serial:.1%} (serialized)")
    print(f"  projected 2-chip FPS from measured {args.fps1}: "
          f"{fps_overlap:.2f} (overlapped) ... {fps_serial:.2f} (serialized)")
    print("\nNOTE: data-parallel serving (one frame per chip, no "
          "collectives) scales at ~100% by construction: "
          f"{args.n_band * args.fps1:.2f} FPS aggregate.")


if __name__ == "__main__":
    main()
