"""Attention + factorized-PE parity vs torch oracles."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from s2m2_tpu.models import attention
from s2m2_tpu.models.pe import pe_contract, pe_tables


def _linear_params(rng, cin, cout, bias):
    w = (rng.standard_normal((cin, cout), dtype=np.float32)
         / np.float32(np.sqrt(cin)))
    p = {"weight": jnp.asarray(w)}
    tw = torch.from_numpy(np.transpose(w))
    tb = None
    if bias:
        b = rng.standard_normal((cout,), dtype=np.float32) * 0.1
        p["bias"] = jnp.asarray(b)
        tb = torch.from_numpy(b)
    return p, tw, tb


def test_self_attn_no_pe(rng):
    B, N, C, heads, e = 3, 17, 16, 4, 2
    x = rng.standard_normal((B, N, C), dtype=np.float32)
    pq, twq, _ = _linear_params(rng, C, e * C, False)
    pk, twk, _ = _linear_params(rng, C, e * C, False)
    pv, twv, tbv = _linear_params(rng, C, e * C, True)
    pp, twp, _ = _linear_params(rng, e * C, C, False)
    params = {"q": pq, "k": pk, "v": pv, "proj": pp}

    got = attention.self_attn(params, jnp.asarray(x), heads)

    xt = torch.from_numpy(x)
    hd = e * C // heads
    q = F.linear(xt, twq).reshape(B, N, heads, hd).transpose(1, 2)
    k = F.linear(xt, twk).reshape(B, N, heads, hd).transpose(1, 2)
    v = F.linear(xt, twv, tbv).reshape(B, N, heads, hd).transpose(1, 2)
    out = F.scaled_dot_product_attention(q, k, v)
    ref = F.linear(out.transpose(1, 2).reshape(B, N, heads * hd), twp)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


def test_cross_attn_symmetric(rng):
    B, N, C, heads = 2, 11, 8, 2
    x = rng.standard_normal((B, N, C), dtype=np.float32)
    y = rng.standard_normal((B, N, C), dtype=np.float32)
    pq, twq, _ = _linear_params(rng, C, C, False)
    pk, twk, _ = _linear_params(rng, C, C, False)
    pv, twv, tbv = _linear_params(rng, C, C, True)
    pp, twp, _ = _linear_params(rng, C, C, False)
    params = {"q": pq, "k": pk, "v": pv, "proj": pp}

    gx, gy = attention.cross_attn(params, jnp.asarray(x), jnp.asarray(y), heads)

    hd = C // heads
    def split(t):
        return t.reshape(B, N, heads, hd).transpose(1, 2)
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    x_out = F.scaled_dot_product_attention(
        split(F.linear(xt, twq)), split(F.linear(yt, twk)),
        split(F.linear(yt, twv, tbv)))
    y_out = F.scaled_dot_product_attention(
        split(F.linear(yt, twq)), split(F.linear(xt, twk)),
        split(F.linear(xt, twv, tbv)))
    rx = F.linear(x_out.transpose(1, 2).reshape(B, N, C), twp)
    ry = F.linear(y_out.transpose(1, 2).reshape(B, N, C), twp)
    np.testing.assert_allclose(np.asarray(gx), rx.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gy), ry.numpy(), atol=2e-5)


def _dense_pe_torch(h, w, pe_dim):
    """Dense reference PE table built with torch ops (oracle for the
    factorized form; mirrors reference core/model/utils.py:32-60)."""
    def sinc(x):
        return torch.where(x.abs() < 1e-6, torch.ones_like(x),
                           torch.sin(3.1415 * x) / (3.1415 * x))

    gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                            torch.arange(w, dtype=torch.float32), indexing="ij")
    rel_x = (gx.reshape(-1, 1) - gx.reshape(1, -1)).long()
    rel_y = (gy.reshape(-1, 1) - gy.reshape(1, -1)).long()
    sig = 5 / pe_dim
    out = []
    for n, rel in ((w, rel_x), (h, rel_y)):
        L = 2 * n + 1
        pos = torch.linspace(-3, 3, L).tanh()
        dim_t = torch.linspace(-1, 1, pe_dim // 2)
        tab = sinc((dim_t[None, :] - pos[:, None]) / sig)
        tab = F.normalize(tab, p=2, dim=-1)
        out.append(tab[rel + n - 1].reshape(h * w, h * w, pe_dim // 2))
    return 0.5 * torch.cat(out, dim=2)


def test_pe_factorization_matches_dense(rng):
    h, w, pe_dim = 5, 7, 32
    n = h * w
    attn = rng.uniform(0, 1, (2, 3, n, n)).astype(np.float32)
    attn /= attn.sum(-1, keepdims=True)

    pe_dense = _dense_pe_torch(h, w, pe_dim)
    ref = torch.einsum("bnij,ijc->bnic", torch.from_numpy(attn), pe_dense)

    ty, tx = pe_tables(h, w, pe_dim)
    got = pe_contract(jnp.asarray(attn), ty, tx, h, w)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


def test_self_attn_with_pe(rng):
    """Full use_pe self-attention path vs the reference dense-table math."""
    h, w, C, heads, pe_dim = 4, 5, 16, 8, 32
    N = h * w
    B = 2
    x = rng.standard_normal((B, N, C), dtype=np.float32)
    pq, twq, _ = _linear_params(rng, C, C, False)
    pk, twk, _ = _linear_params(rng, C, C, False)
    pv, twv, tbv = _linear_params(rng, C, C, True)
    pp, twp, _ = _linear_params(rng, C, C, False)
    ppe, twpe, tbpe = _linear_params(rng, pe_dim, C // heads, True)
    params = {"q": pq, "k": pk, "v": pv, "proj": pp, "pe_proj": ppe}

    ty, tx = pe_tables(h, w, pe_dim)
    got = attention.self_attn(params, jnp.asarray(x), heads,
                              pe=(ty, tx, h, w))

    hd = C // heads
    xt = torch.from_numpy(x)
    q = F.linear(xt, twq).reshape(B, N, heads, hd).transpose(1, 2)
    k = F.linear(xt, twk).reshape(B, N, heads, hd).transpose(1, 2)
    v = F.linear(xt, twv, tbv).reshape(B, N, heads, hd).transpose(1, 2)
    score = torch.einsum("bhic,bhjc->bhij", q * hd ** -0.5, k)
    a = score.softmax(-1)
    out = torch.einsum("bhij,bhjc->bhic", a, v)
    pe_dense = _dense_pe_torch(h, w, pe_dim)
    pe_sum = torch.einsum("bnij,ijc->bnic", a, pe_dense)
    out = out + F.linear(pe_sum, twpe, tbpe)
    ref = F.linear(out.transpose(1, 2).reshape(B, N, C), twp)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=3e-5)


def test_scanline_block_shapes(rng):
    B, H, W, C = 2, 6, 10, 8
    z = rng.standard_normal((2 * B, H, W, C), dtype=np.float32)
    p = {"attn": {
        "q": _linear_params(rng, C, C, False)[0],
        "k": _linear_params(rng, C, C, False)[0],
        "v": _linear_params(rng, C, C, True)[0],
        "proj": _linear_params(rng, C, C, False)[0]}}
    out = attention.cross_attn_block_1d(p, jnp.asarray(z), 2)
    assert out.shape == z.shape
    out = attention.self_attn_block_1d(p, jnp.asarray(z), 2)
    assert out.shape == z.shape


def test_scanline_block_4d_matches_fold(rng):
    """S2M2_ATTN_4D keeps heads==1 scanline attention on the (B,H,W,C)
    block shape (rows as a dot batch dim) — same floats as the fold path."""
    B, H, W, C = 2, 5, 12, 16
    z = rng.standard_normal((2 * B, H, W, C), dtype=np.float32)
    p = {"attn": {
        "q": _linear_params(rng, C, C, False)[0],
        "k": _linear_params(rng, C, C, False)[0],
        "v": _linear_params(rng, C, C, True)[0],
        "proj": _linear_params(rng, C, C, False)[0]}}
    # _ATTN_4D defaults ON, so the references must be FORCED onto the fold
    # path (and the prior value restored, not hardcoded, so the rest of the
    # suite keeps running the shipped default) — otherwise this test compares
    # the 4D path against itself.
    try:
        attention.set_attn_4d(False)
        ref_cross = attention.cross_attn_block_1d(p, jnp.asarray(z), 1)
        ref_self = attention.self_attn_block_1d(p, jnp.asarray(z), 1)
        attention.set_attn_4d(True)
        got_cross = attention.cross_attn_block_1d(p, jnp.asarray(z), 1)
        got_self = attention.self_attn_block_1d(p, jnp.asarray(z), 1)
    finally:
        # conftest's autouse _flag_guard restores the registry; explicit
        # restore here keeps the test self-contained as well
        attention.set_attn_4d(True)
    np.testing.assert_allclose(np.asarray(got_cross), np.asarray(ref_cross),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_self), np.asarray(ref_self),
                               atol=1e-5)


def test_pallas_self_flag_does_not_leak_into_4d_cross(rng, monkeypatch):
    """Per-family bisection contract: a 'self'-family Pallas experiment
    (S2M2_PALLAS_ATTN=self) must not change the CROSS family's backend.
    The 4D cross path delegates to sdpa(), which dispatches on the SELF
    flag — it must pin the XLA path via allow_pallas=False."""
    B, H, W, C = 1, 4, 12, 16
    z = rng.standard_normal((2 * B, H, W, C), dtype=np.float32)
    p = {"attn": {
        "q": _linear_params(rng, C, C, False)[0],
        "k": _linear_params(rng, C, C, False)[0],
        "v": _linear_params(rng, C, C, True)[0],
        "proj": _linear_params(rng, C, C, False)[0]}}
    ref = np.asarray(attention.cross_attn_block_1d(p, jnp.asarray(z), 1))

    def boom(*a, **k):
        raise AssertionError("Pallas kernel dispatched on the cross path")

    # force the dispatch gate open for 'self' (the CPU backend check would
    # otherwise make this vacuous) and booby-trap the kernel entry
    monkeypatch.setattr(attention, "_pallas_ok",
                        lambda n, kind: kind == "self")
    monkeypatch.setattr(attention._fa, "scanline_attention", boom)
    attention.set_use_pallas(self_attn=True)  # _flag_guard restores
    got = np.asarray(attention.cross_attn_block_1d(p, jnp.asarray(z), 1))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_scanline_block_4d_mh_matches_fold(rng):
    """S2M2_ATTN_4D_MH runs heads>1 scanline attention as per-head sliced
    4D sdpa (weight column slices; head-merge folded into the proj as a sum
    of row-sliced dots) — same floats as the fold + split_heads path."""
    B, H, W, C, heads = 2, 5, 12, 32, 4
    z = rng.standard_normal((2 * B, H, W, C), dtype=np.float32)
    p = {"attn": {
        "q": _linear_params(rng, C, C, False)[0],
        "k": _linear_params(rng, C, C, False)[0],
        "v": _linear_params(rng, C, C, True)[0],
        "proj": _linear_params(rng, C, C, False)[0]}}
    # the mh flag defaults ON — force the fold path for the reference
    # (conftest's autouse _flag_guard restores the registry afterwards)
    attention.set_attn_4d_mh(False)
    ref_cross = attention.cross_attn_block_1d(p, jnp.asarray(z), heads)
    ref_self = attention.self_attn_block_1d(p, jnp.asarray(z), heads)
    attention.set_attn_4d_mh(True)
    got_cross = attention.cross_attn_block_1d(p, jnp.asarray(z), heads)
    got_self = attention.self_attn_block_1d(p, jnp.asarray(z), heads)
    np.testing.assert_allclose(np.asarray(got_cross), np.asarray(ref_cross),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_self), np.asarray(ref_self),
                               atol=1e-5)


def test_scanline_block_4d_mh_dim_expansion(rng):
    """Sliced-head path with dim_expansion e>1: head dim = e*C//heads; the
    proj row slices must follow the EXPANDED width."""
    B, H, W, C, heads, e = 1, 3, 10, 16, 2, 2
    z = rng.standard_normal((2 * B, H, W, C), dtype=np.float32)
    p = {"attn": {
        "q": _linear_params(rng, C, e * C, False)[0],
        "k": _linear_params(rng, C, e * C, False)[0],
        "v": _linear_params(rng, C, e * C, True)[0],
        "proj": _linear_params(rng, e * C, C, False)[0]}}
    attention.set_attn_4d_mh(False)
    ref = attention.self_attn_block_1d(p, jnp.asarray(z), heads)
    attention.set_attn_4d_mh(True)
    got = attention.self_attn_block_1d(p, jnp.asarray(z), heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
