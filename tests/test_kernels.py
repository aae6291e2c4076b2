"""Pallas kernel correctness: interpret-mode vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtt_tpu.kernels.attention import fused_attention


@pytest.mark.parametrize("n,d,h", [(64, 32, 2), (100, 16, 4)])
def test_fused_attention_matches_xla(n, d, h):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, n, h, d)).astype(np.float32))
    ref = fused_attention(q, k, v, impl="xla")
    out = fused_attention(q, k, v, impl="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_attention_grads_match():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 32, 2, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 32, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 32, 2, 16)).astype(np.float32))

    def loss_custom(q, k, v):
        return (fused_attention(q, k, v, impl="xla") ** 2).sum()

    def loss_plain(q, k, v):
        scale = q.shape[-1] ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        return (out ** 2).sum()

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_cross_len_attention():
    # decoder-style: kv shorter than q
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 80, 2, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 24, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 24, 2, 16)).astype(np.float32))
    ref = fused_attention(q, k, v, impl="xla")
    out = fused_attention(q, k, v, impl="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_qkv_direct_attention_matches_xla():
    """fused_attention_qkv pallas(interpret) vs xla on the head-major qkv
    layout, plus gradient path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mtt_tpu.kernels.attention import fused_attention_qkv

    rng = np.random.default_rng(5)
    B, N, H, D = 2, 100, 2, 64
    qkv = jnp.asarray(rng.normal(size=(B, N, H * 3 * D)).astype(np.float32))
    ref = fused_attention_qkv(qkv, H, D ** -0.5, impl="xla")
    out = fused_attention_qkv(qkv, H, D ** -0.5, impl="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_fused(qkv):
        return (fused_attention_qkv(qkv, H, D ** -0.5, impl="xla") ** 2).sum()

    def loss_plain(qkv):
        q5 = qkv.reshape(B, N, H, 3, D)
        q, k, v = q5[:, :, :, 0], q5[:, :, :, 1], q5[:, :, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (D ** -0.5)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        return (o ** 2).sum()

    g1 = jax.grad(loss_fused)(qkv)
    g2 = jax.grad(loss_plain)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4, rtol=1e-4)


def test_safe_softmax_routing():
    """Training forwards default to the max-subtracted (safe) softmax:
    with logits far past the exp2 clamp the fast path degrades toward
    uniform by design, while safe=True stays exact (VERDICT r3 weak #5).
    Also checks the MTT_ATTN_SAFE_SOFTMAX override wins in both
    directions."""
    import os
    import numpy as np
    import jax.numpy as jnp
    from mtt_tpu.kernels import attention as A

    rng = np.random.default_rng(9)
    B, N, H, D = 1, 100, 2, 64
    # huge-magnitude qkv -> scaled logits way past the 126 exp2 clamp
    qkv = jnp.asarray(
        (rng.normal(size=(B, N, H * 3 * D)) * 40.0).astype(np.float32))
    exact = A._attn_qkv_xla(qkv, H, D ** -0.5)
    safe = A.fused_attention_qkv(qkv, H, D ** -0.5, impl="interpret",
                                 safe=True)
    fast = A.fused_attention_qkv(qkv, H, D ** -0.5, impl="interpret",
                                 safe=False)
    # at |logit|~1600 the log2e pre-scale rounds at ~1e-4 absolute, so
    # sharp near-tie softmax rows can differ ~0.5% — still 30x tighter
    # than the fast path's designed degradation
    np.testing.assert_allclose(np.asarray(safe), np.asarray(exact),
                               atol=1e-2, rtol=1e-2)
    assert np.abs(np.asarray(fast) - np.asarray(exact)).max() > 0.5, \
        "fast path should visibly degrade at clamp-exceeding logits"

    # model plumbing: Attention(deterministic=False) must resolve safe
    assert A._resolve_safe(True) is True
    assert A._resolve_safe(None) is False
    old = os.environ.get("MTT_ATTN_SAFE_SOFTMAX")
    try:
        os.environ["MTT_ATTN_SAFE_SOFTMAX"] = "0"
        assert A._resolve_safe(True) is False   # forced fast
        os.environ["MTT_ATTN_SAFE_SOFTMAX"] = "1"
        assert A._resolve_safe(None) is True    # forced safe
    finally:
        if old is None:
            os.environ.pop("MTT_ATTN_SAFE_SOFTMAX", None)
        else:
            os.environ["MTT_ATTN_SAFE_SOFTMAX"] = old


def test_fused_mlp_matches_xla():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mtt_tpu.kernels.mlp import fused_mlp

    rng = np.random.default_rng(6)
    M, C, H = 100, 128, 1024  # pallas path needs C%128==0, H%1024==0
    x = jnp.asarray(rng.normal(size=(2, 50, C)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.05)
    ref = fused_mlp(x, w1, b1, w2, b2, impl="xla")
    out = fused_mlp(x, w1, b1, w2, b2, impl="interpret")
    # interpret path uses the A&S poly erf (|err|<=1.5e-7 per element)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)

    def loss_f(x, w1, b1, w2, b2):
        return (fused_mlp(x, w1, b1, w2, b2, impl="xla") ** 2).sum()

    def loss_p(x, w1, b1, w2, b2):
        h = jax.nn.gelu(x @ w1 + b1, approximate=False)
        return ((h @ w2 + b2) ** 2).sum()

    g1 = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g2 = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_fused_mlp_ln_res_matches_xla():
    """x + MLP(LN(x)) fused half-block: interpret vs xla, plus grads vs a
    plain composition."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mtt_tpu.kernels.mlp import fused_mlp_ln_res

    rng = np.random.default_rng(7)
    C, H = 128, 1024
    x = jnp.asarray(rng.normal(size=(2, 56, C)).astype(np.float32))
    ga = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    be = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.05)
    ref = fused_mlp_ln_res(x, ga, be, w1, b1, w2, b2, impl="xla")
    out = fused_mlp_ln_res(x, ga, be, w1, b1, w2, b2, impl="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)

    def loss_f(*a):
        return (fused_mlp_ln_res(*a, impl="xla") ** 2).sum()

    def loss_p(x, ga, be, w1, b1, w2, b2):
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        xn = (x - m) * jax.lax.rsqrt(v + 1e-6) * ga + be
        h = jax.nn.gelu(xn @ w1 + b1, approximate=False)
        return ((x + h @ w2 + b2) ** 2).sum()

    g1 = jax.grad(loss_f, argnums=tuple(range(7)))(x, ga, be, w1, b1, w2, b2)
    g2 = jax.grad(loss_p, argnums=tuple(range(7)))(x, ga, be, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_fused_attention_ln_qkv_matches_xla():
    """LN + qkv projection + attention fused front half: interpret vs xla,
    tap outputs (qkv, xn), and gradients vs a plain composition."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mtt_tpu.kernels.attention import fused_attention_ln_qkv

    rng = np.random.default_rng(8)
    B, N, H, D = 2, 56, 2, 64
    C = H * D
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    ga = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    be = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(C, 3 * C)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(3 * C,)).astype(np.float32) * 0.05)

    ref = fused_attention_ln_qkv(x, ga, be, w, b, H, impl="xla")
    out = fused_attention_ln_qkv(x, ga, be, w, b, H, impl="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)

    r3 = fused_attention_ln_qkv(x, ga, be, w, b, H, need_qkv=True,
                                impl="xla")
    o3 = fused_attention_ln_qkv(x, ga, be, w, b, H, need_qkv=True,
                                impl="interpret")
    for a, r in zip(o3, r3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(o3[0]), np.asarray(out),
                               atol=1e-6)

    def loss_f(x, ga, be, w, b):
        out, qkv, xn = fused_attention_ln_qkv(x, ga, be, w, b, H,
                                              need_qkv=True, impl="xla")
        return (out ** 2).sum() + (qkv ** 3).sum() + (xn ** 2).sum()

    def loss_p(x, ga, be, w, b):
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        xn = (x - m) * jax.lax.rsqrt(v + 1e-6) * ga + be
        qkv = xn @ w + b
        q5 = qkv.reshape(B, N, H, 3, D)
        q, k, vv = q5[:, :, :, 0], q5[:, :, :, 1], q5[:, :, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (D ** -0.5)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, vv).reshape(B, N, C)
        return (o ** 2).sum() + (qkv ** 3).sum() + (xn ** 2).sum()

    g1 = jax.grad(loss_f, argnums=tuple(range(5)))(x, ga, be, w, b)
    g2 = jax.grad(loss_p, argnums=tuple(range(5)))(x, ga, be, w, b)
    for a, b2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=2e-3, rtol=2e-3)


def test_fused_task_decode_matches_xla():
    """Fused spatial+channel task decode: interpret vs xla + grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mtt_tpu.kernels.task_decode import fused_task_decode

    rng = np.random.default_rng(9)
    B, S, C, T, G, tar = 2, 256, 128, 3, 4, 48
    x = jnp.asarray(rng.normal(size=(B, S, C)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(B, T, S, G)).astype(np.float32))
    cw = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(T, C, tar)).astype(np.float32) * 0.05)
    bs = jnp.asarray(rng.normal(size=(T, tar)).astype(np.float32) * 0.05)
    wc = jnp.asarray(rng.normal(size=(T, C, tar)).astype(np.float32) * 0.05)
    bc = jnp.asarray(rng.normal(size=(T, tar)).astype(np.float32) * 0.05)
    fin = 40
    wf = jnp.asarray(
        rng.normal(size=(T, 2 * tar, fin)).astype(np.float32) * 0.05)
    bf = jnp.asarray(rng.normal(size=(T, fin)).astype(np.float32) * 0.05)

    ref = fused_task_decode(x, a, cw, ws, bs, wc, bc, wf, bf, impl="xla")
    out = fused_task_decode(x, a, cw, ws, bs, wc, bc, wf, bf,
                            impl="interpret")
    assert out.shape == (B, S, T * fin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)

    # non-128-multiple S (every non-final NYUD stage): the kernel
    # zero-pads rows to the block size and slices back
    Sr = 252
    ref_r = fused_task_decode(x[:, :Sr], a[:, :, :Sr], cw, ws, bs, wc, bc,
                              wf, bf, impl="xla")
    out_r = fused_task_decode(x[:, :Sr], a[:, :, :Sr], cw, ws, bs, wc, bc,
                              wf, bf, impl="interpret")
    assert out_r.shape == (B, Sr, T * fin)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref_r),
                               atol=2e-4, rtol=2e-4)

    def loss_f(*args):
        y = fused_task_decode(*args, impl="xla")
        return (y ** 2).sum() + (y ** 3).sum()

    def loss_p(x, a, cw, ws, bs, wc, bc, wf, bf):
        gc = C // G
        xg = x.reshape(B, S, G, gc)
        at = a.transpose(0, 2, 1, 3)
        f_in = (xg[:, :, None] * at[..., None]).reshape(B, S, T, C) \
            + x[:, :, None]
        fc_in = x[:, :, None] * cw[:, None] + x[:, :, None]
        f = jnp.einsum("bstc,tcr->bstr", f_in, ws) + bs[None, None]
        fc = jnp.einsum("bstc,tcr->bstr", fc_in, wc) + bc[None, None]
        y = (jnp.einsum("bstr,trf->bstf", f, wf[:, :tar])
             + jnp.einsum("bstr,trf->bstf", fc, wf[:, tar:])
             + bf[None, None])
        return (y ** 2).sum() + (y ** 3).sum()

    args = (x, a, cw, ws, bs, wc, bc, wf, bf)
    g1 = jax.grad(loss_f, argnums=tuple(range(9)))(*args)
    g2 = jax.grad(loss_p, argnums=tuple(range(9)))(*args)
    for a1, a2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   atol=2e-3, rtol=2e-3)


def test_fast_softmax_floor_no_nan(monkeypatch):
    """ADVICE r1 (medium): a row whose scaled logits all sit below -126
    used to flush every exp2 to zero -> 0/0 NaN. The two-sided clamp keeps
    probabilities >= 2^-126, so the output must stay finite (it degrades
    toward uniform, by design)."""
    import jax.numpy as jnp
    import numpy as np
    from mtt_tpu.kernels.attention import fused_attention_qkv

    monkeypatch.delenv("MTT_ATTN_SAFE_SOFTMAX", raising=False)
    rng = np.random.default_rng(7)
    B, N, H, D = 1, 16, 2, 64
    qkv = np.zeros((B, N, H * 3 * D), np.float32)
    for h in range(H):
        base = h * 3 * D
        # q strongly anti-aligned with every k -> all logits ~ -40*D*scale
        qkv[:, :, base:base + D] = 40.0
        qkv[:, :, base + D:base + 2 * D] = \
            -1.0 + 0.01 * rng.normal(size=(B, N, D))
        qkv[:, :, base + 2 * D:base + 3 * D] = rng.normal(size=(B, N, D))
    out = fused_attention_qkv(jnp.asarray(qkv), H, D ** -0.5,
                              impl="interpret")
    assert np.isfinite(np.asarray(out)).all()


def test_safe_softmax_env_exact_past_clamp(monkeypatch):
    """MTT_ATTN_SAFE_SOFTMAX=1 must reproduce the exact (max-subtracted)
    softmax even when scaled logits exceed the +126 exp2 clamp, where the
    fast path degrades (ADVICE r1: make clamp engagement non-silent)."""
    import jax.numpy as jnp
    import numpy as np
    from mtt_tpu.kernels.attention import fused_attention_qkv

    rng = np.random.default_rng(8)
    B, N, H, D = 1, 32, 2, 64
    # scale the whole tensor so logits ~ q.k * 15^2 / 8 routinely pass 126
    qkv = jnp.asarray(15.0 * rng.normal(size=(B, N, H * 3 * D)),
                      jnp.float32)
    ref = np.asarray(fused_attention_qkv(qkv, H, D ** -0.5, impl="xla"))
    monkeypatch.setenv("MTT_ATTN_SAFE_SOFTMAX", "1")
    out = np.asarray(fused_attention_qkv(qkv, H, D ** -0.5,
                                         impl="interpret"))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("gh,gw,c,n", [(8, 8, 350, 21), (8, 8, 256, 1),
                                       (8, 12, 350, 21)])
def test_fused_up4_head_matches_xla(gh, gw, c, n):
    """Fused up4 ConvHead kernel (interpret) vs the factored XLA
    composition: Gm + both spatial mixes + folded-BN affine + exact
    gelu + 1x1, at a reduced grid size. The (8, 12) case covers the
    non-square grids of the NYUD configs (head input 28x36)."""
    from mtt_tpu.kernels.head_up4 import fused_up4_head
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, gh, gw, c)).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.02)
    inv = jnp.asarray(1.0 + 0.1 * rng.normal(size=(c,)).astype(np.float32))
    addv = jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32))
    kp = jnp.asarray(rng.normal(size=(c, n)).astype(np.float32) * 0.05)
    ref = fused_up4_head(x, kc, inv, addv, kp, impl="xla")
    out = fused_up4_head(x, kc, inv, addv, kp, impl="interpret")
    assert out.shape == (2, 4 * gh, 4 * gw, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_fused_up4_head_grad_is_xla_composition():
    from mtt_tpu.kernels.head_up4 import fused_up4_head, _head_xla
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 128)).astype(np.float32) * 0.3)
    kc = jnp.asarray(rng.normal(size=(3, 3, 128, 128)).astype(np.float32)
                     * 0.02)
    inv = jnp.ones((128,), jnp.float32)
    addv = jnp.zeros((128,), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(128, 4)).astype(np.float32) * 0.05)
    g1 = jax.grad(lambda a: (fused_up4_head(a, kc, inv, addv, kp,
                                            impl="xla") ** 2).sum())(x)
    g2 = jax.grad(lambda a: (_head_xla(a, kc, inv, addv, kp) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4, rtol=1e-4)


def test_attn_core_bwd_pallas_matches_xla():
    """Flash-style attention-core backward (interpret) vs XLA einsums."""
    from mtt_tpu.kernels.attention import (_attn_core_bwd_pallas,
                                           _attn_core_bwd_xla)
    rng = np.random.default_rng(3)
    B, N, H, D = 2, 100, 4, 64
    qkv = jnp.asarray(rng.normal(size=(B, N, H * 3 * D)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, N, H * D)).astype(np.float32))
    ref = _attn_core_bwd_xla(qkv, g, H, D ** -0.5)
    got = _attn_core_bwd_pallas(qkv, g, H, D ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_attn_ln_grads_pallas_bwd_matches_xla():
    """Full pre-norm attention block grads: the Pallas-core backward path
    (impl='interpret') vs the XLA-composition vjp (impl='xla')."""
    from mtt_tpu.kernels.attention import fused_attention_ln_qkv
    rng = np.random.default_rng(4)
    B, N, C, H = 1, 64, 256, 4
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32) * 0.3)
    ga = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    be = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(C, 3 * C)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(3 * C,)).astype(np.float32) * 0.02)

    def loss(impl):
        def f(x, ga, be, w, b):
            out = fused_attention_ln_qkv(x, ga, be, w, b, H, impl=impl)
            return (out.astype(jnp.float32) ** 2).sum()
        return f

    g1 = jax.grad(loss("interpret"), argnums=(0, 1, 2, 3, 4))(x, ga, be, w, b)
    g2 = jax.grad(loss("xla"), argnums=(0, 1, 2, 3, 4))(x, ga, be, w, b)
    for a, bb, nm in zip(g1, g2, ("dx", "dgamma", "dbeta", "dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=3e-3, rtol=3e-3, err_msg=nm)


def test_fused_window_attention_matches_xla():
    from mtt_tpu.kernels.attention import fused_window_attention
    rng = np.random.default_rng(5)
    nW, B, M, H, D = 4, 2, 19, 2, 32     # M = prompts + window tokens
    q = jnp.asarray(rng.normal(size=(B * nW, M, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B * nW, M, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B * nW, M, H, D)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(H, M, M)).astype(np.float32))
    mask = jnp.asarray(np.where(rng.random((nW, M, M)) > 0.7, -100.0, 0.0)
                       .astype(np.float32))
    for m in (mask, None):
        ref = fused_window_attention(q, k, v, bias, m, D ** -0.5, nW,
                                     impl="xla")
        got = fused_window_attention(q, k, v, bias, m, D ** -0.5, nW,
                                     impl="interpret")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    # flash-style Pallas backward (dq/dk/dv/dbias; dmask intentionally
    # zero — the shifted-window mask is never a parameter) vs autodiff
    # of the XLA composition
    for m in (mask, None):
        def loss(impl, mm):
            def f(qq, kk, vv, bb):
                out = fused_window_attention(qq, kk, vv, bb, mm,
                                             D ** -0.5, nW, impl=impl)
                return (out.astype(jnp.float32) ** 2).sum()
            return f
        g1 = jax.grad(loss("interpret", m), argnums=(0, 1, 2, 3))(
            q, k, v, bias)
        g2 = jax.grad(loss("xla", m), argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b2, nm in zip(g1, g2, ("dq", "dk", "dv", "dbias")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       atol=2e-4, rtol=2e-4, err_msg=nm)


def test_fused_mlp_padded_misaligned_channels():
    """Lane-misaligned (C=144, H=576) MLP runs through the Pallas kernel
    via exact zero padding (the InvPT decoder stage shapes)."""
    from mtt_tpu.kernels.mlp import fused_mlp
    rng = np.random.default_rng(6)
    C, H = 144, 576
    x = jnp.asarray(rng.normal(size=(2, 40, C)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.02)
    ref = fused_mlp(x, w1, b1, w2, b2, impl="xla")
    got = fused_mlp(x, w1, b1, w2, b2, impl="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_mlp_ln_res_handwritten_bwd_matches_autodiff():
    """Hand-written bf16-intermediate backward vs autodiff of the same
    XLA composition."""
    from mtt_tpu.kernels.mlp import fused_mlp_ln_res, _mlp_ln_res_xla
    rng = np.random.default_rng(7)
    B, N, C, H = 1, 40, 128, 512
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32) * 0.3)
    ga = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    be = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.02)

    def loss_custom(*a):
        return (fused_mlp_ln_res(*a, eps=1e-6, impl="xla") ** 2).sum()

    def loss_plain(*a):
        return (_mlp_ln_res_xla(*a, 1e-6) ** 2).sum()

    g1 = jax.grad(loss_custom, argnums=tuple(range(7)))(
        x, ga, be, w1, b1, w2, b2)
    g2 = jax.grad(loss_plain, argnums=tuple(range(7)))(
        x, ga, be, w1, b1, w2, b2)
    names = ("dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2")
    for a, b, nm in zip(g1, g2, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3, err_msg=nm)


def test_mlp_ln_res_handwritten_bwd_bf16():
    """bf16-input grad parity: the hand-written backward's bf16
    intermediates (h/a/dact casts, _mlp_ln_res_bwd) are no-ops on f32
    inputs, so the f32 parity test above never exercises the rounding the
    kernel's comment justifies. Reference: autodiff of the same
    composition computed fully in f32 (weights/cotangents downcast the
    same way), tolerance sized to bf16's 2^-8 mantissa."""
    from mtt_tpu.kernels.mlp import fused_mlp_ln_res, _mlp_ln_res_xla
    rng = np.random.default_rng(11)
    B, N, C, H = 1, 40, 128, 512
    mk = lambda shape, s: jnp.asarray(
        (rng.normal(size=shape) * s).astype(np.float32))
    x = mk((B, N, C), 0.3).astype(jnp.bfloat16)
    ga = (1.0 + mk((C,), 0.1)).astype(jnp.bfloat16)
    be = mk((C,), 0.1).astype(jnp.bfloat16)
    w1, b1 = mk((C, H), 0.05).astype(jnp.bfloat16), \
        mk((H,), 0.02).astype(jnp.bfloat16)
    w2, b2 = mk((H, C), 0.05).astype(jnp.bfloat16), \
        mk((C,), 0.02).astype(jnp.bfloat16)

    def loss_custom(*a):
        return (fused_mlp_ln_res(*a, eps=1e-6, impl="xla")
                .astype(jnp.float32) ** 2).sum()

    def loss_ref(*a):
        af = [t.astype(jnp.float32) for t in a]
        return (_mlp_ln_res_xla(*af, 1e-6) ** 2).sum()

    g1 = jax.grad(loss_custom, argnums=tuple(range(7)))(
        x, ga, be, w1, b1, w2, b2)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(
        x, ga, be, w1, b1, w2, b2)
    names = ("dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2")
    for a, b, nm in zip(g1, g2, names):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale,
                                   atol=3e-2, rtol=0, err_msg=nm)


def test_gelu_fast_poly_accuracy():
    """Polynomial-only gelu (head kernels) vs exact erf gelu: |err| must
    stay an order below bf16 rounding across the active range."""
    import numpy as np
    from scipy.special import erf
    from mtt_tpu.kernels.mlp import _gelu_erf_poly_fast

    x = np.linspace(-8.0, 8.0, 20001).astype(np.float32)
    exact = 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))
    got = np.asarray(_gelu_erf_poly_fast(jnp.asarray(x)), np.float32)
    assert np.abs(got - exact).max() <= 3e-4


def test_upsample_small_c_matches_generic():
    """The small-C MXU path of _upsample_matmul must equal the generic
    cols-dot form (same 2-tap half-pixel math, different dot shapes)."""
    import numpy as np
    from mtt_tpu.models.layers import _upsample_matmul

    rng = np.random.default_rng(0)
    for C in (1, 2, 3):
        x = jnp.asarray(rng.normal(size=(2, 14, 18, C)), jnp.float32)
        small = _upsample_matmul(x, (112, 144))
        # generic path: pad channels past the small-C threshold, slice
        xp = jnp.concatenate([x] * ((5 + C) // C), axis=-1)[..., :5]
        gen = _upsample_matmul(xp, (112, 144))[..., :C]
        np.testing.assert_allclose(np.asarray(small), np.asarray(gen),
                                   atol=2e-5, rtol=2e-5)


def test_fallback_log_records_and_bench_gate():
    """Kernel gates must record a fallback when the Pallas path is
    requested but rejected (the bench's loud-fallback contract)."""
    import numpy as np
    from mtt_tpu.kernels import fallback_log
    from mtt_tpu.kernels.head_up4 import _fused_head

    fallback_log.reset_fallbacks()
    # f32 input: head kernel gate rejects (bf16-only) -> must record
    x = jnp.asarray(np.zeros((1, 8, 8, 64), np.float32))
    kc = jnp.zeros((3, 3, 64, 64), jnp.float32)
    inv = jnp.ones((64,), jnp.float32)
    addv = jnp.zeros((64,), jnp.float32)
    kp = jnp.zeros((64, 3), jnp.float32)
    _fused_head(x, kc, inv, addv, kp, "pallas")
    seen = fallback_log.fallbacks_seen()
    assert any(k[0] == "head_up4" for k in seen), seen
    fallback_log.reset_fallbacks()
    assert not fallback_log.fallbacks_seen()
