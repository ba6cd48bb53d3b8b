"""Dump optimized HLO of stacked_mrt and summarize the largest buffers
(dev tool)."""
import collections
import re
import numpy as np
import jax
import jax.numpy as jnp

from s2m2_tpu.config import get_config
from s2m2_tpu.models.init import init_params
from s2m2_tpu.models.mrt import stacked_mrt

MODEL = "XL"
W, H = 1216, 1024


def main():
    cfg = get_config(MODEL)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_params(cfg, seed=0))
    c = cfg.ch
    h4, w4 = H // 4, W // 4
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

    # histogram of output-buffer sizes by (dtype, shape) for fusions/convs/dots
    sizes = collections.Counter()
    counts = collections.Counter()
    pat = re.compile(r"=\s+((?:f32|bf16|f16|s32|pred|u32)\[[0-9,]*\])")
    dt_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "pred": 1, "u32": 4}
    for line in txt.splitlines():
        line = line.strip()
        m = pat.search(line)
        if not m or "parameter(" in line or "constant" in line:
            continue
        spec = m.group(1)
        dt = spec.split("[")[0]
        dims = spec[spec.index("[") + 1:-1]
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        op = line.split("=", 2)[-1].strip().split("(")[0].split()[0]
        key = (op[:24], spec)
        sizes[key] += n * dt_bytes[dt]
        counts[key] += 1
    print("\nTop 30 output-buffer groups by total bytes:")
    for (op, spec), b in sizes.most_common(30):
        print(f"{b/1e9:8.2f} GB  x{counts[(op, spec)]:4d}  {op:24s} {spec}")

    ma = comp.memory_analysis()
    if ma:
        print("\nmemory:", ma)


if __name__ == "__main__":
    main()
