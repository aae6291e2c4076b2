"""On-hardware validation (run with `MTT_TEST_TPU=1 pytest tests/`).

VERDICT.md round-1 items 3 and 4: the rotated-BEV IoU geometry and both
Pallas kernels were only ever validated on CPU; on the real TPU the
default-precision matmuls broke the polygon geometry (identical-box IoU
0.003) and the kernel-vs-XLA comparisons were never established at
realistic tolerances. These tests pin all of that on the actual backend
(they also pass on CPU, but conftest only schedules them under
MTT_TEST_TPU=1).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _rng(seed):
    return np.random.default_rng(seed)


class TestIoU3DOnTPU:
    def test_identical_box_iou_one(self):
        import jax.numpy as jnp
        from mtt_tpu.detection.iou3d import boxes_iou_bev
        a = jnp.array([[1.0, 2.0, 3.0, 1.5, 0.7]])
        assert abs(float(boxes_iou_bev(a, a)[0, 0]) - 1.0) < 1e-4

    def test_far_from_origin_identical(self):
        # Cityscapes-scale coordinates (up to ~100 m) — the fp32
        # cancellation case that motivated centroid-relative corner math
        import jax.numpy as jnp
        from mtt_tpu.detection.iou3d import boxes_iou_bev
        a = jnp.array([[87.3, -42.6, 4.2, 1.8, 2.13]])
        assert abs(float(boxes_iou_bev(a, a)[0, 0]) - 1.0) < 1e-4

    def test_random_pairs_match_cpu_oracle(self):
        import jax
        import jax.numpy as jnp
        from mtt_tpu.detection.iou3d import boxes_iou_bev
        rng = _rng(0)
        n = 16
        boxes = np.stack([
            rng.uniform(-80, 80, n), rng.uniform(0, 100, n),
            rng.uniform(1, 5, n), rng.uniform(1, 3, n),
            rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)
        dev = np.asarray(boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
        cpu = jax.jit(boxes_iou_bev, backend="cpu")(boxes, boxes)
        np.testing.assert_allclose(dev, np.asarray(cpu), atol=5e-3)
        np.testing.assert_allclose(np.diag(dev), 1.0, atol=1e-4)

    def test_nms_keeps_sane(self):
        import jax.numpy as jnp
        from mtt_tpu.detection.iou3d import nms_bev
        # two near-duplicates + one distant box -> 2 kept
        boxes = jnp.array([[0.0, 0.0, 4.0, 2.0, 0.3],
                           [0.05, 0.0, 4.0, 2.0, 0.32],
                           [30.0, 40.0, 4.0, 2.0, 1.0]])
        scores = jnp.array([0.9, 0.8, 0.7])
        keep = np.asarray(nms_bev(boxes, scores, 0.5))
        assert keep.tolist() == [True, False, True]


class TestPallasKernelsOnTPU:
    def test_backbone_attention_pallas_vs_xla(self):
        # bench shape: ViT-L 512^2 + 5 prompts -> N=1029, H=16, D=64
        import jax.numpy as jnp
        from mtt_tpu.kernels.attention import fused_attention
        rng = _rng(1)
        B, N, H, D = 2, 1029, 16, 64
        q = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        ref = np.asarray(fused_attention(q, k, v, impl="xla"))
        out = np.asarray(fused_attention(q, k, v, impl="pallas"))
        # fp32 inputs; fp32 accumulation in both paths -> tight tolerance
        np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)

    def test_backbone_attention_bf16_pallas_vs_xla(self):
        import jax.numpy as jnp
        from mtt_tpu.kernels.attention import fused_attention
        rng = _rng(2)
        B, N, H, D = 1, 1029, 16, 64
        mk = lambda s: jnp.asarray(  # noqa: E731
            rng.normal(size=s).astype(np.float32), jnp.bfloat16)
        q, k, v = mk((B, N, H, D)), mk((B, N, H, D)), mk((B, N, H, D))
        ref = np.asarray(fused_attention(q, k, v, impl="xla"), np.float32)
        out = np.asarray(fused_attention(q, k, v, impl="pallas"), np.float32)
        # bf16 IO: tolerance is one bf16 ulp of the output scale
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)

    def test_qkv_direct_attention_pallas_vs_xla(self):
        # the backbone's production path: fused qkv tensor in head-major
        # column order, bf16, bench shape
        import jax.numpy as jnp
        from mtt_tpu.kernels.attention import fused_attention_qkv
        rng = _rng(4)
        B, N, H, D = 2, 1029, 16, 64
        qkv = jnp.asarray(rng.normal(size=(B, N, H * 3 * D)).astype(
            np.float32), jnp.bfloat16)
        ref = np.asarray(fused_attention_qkv(qkv, H, D ** -0.5, impl="xla"),
                         np.float32)
        out = np.asarray(fused_attention_qkv(qkv, H, D ** -0.5,
                                             impl="pallas"), np.float32)
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)

    def test_mlp_ln_res_pallas_vs_xla(self):
        # fused pre-norm MLP half-block at ViT-L bench shape, bf16
        import jax.numpy as jnp
        from mtt_tpu.kernels.mlp import fused_mlp_ln_res
        rng = _rng(5)
        B, N, C, H = 2, 1029, 1024, 4096
        x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32),
                        jnp.bfloat16)
        ga = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
        be = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.03,
                         jnp.bfloat16)
        b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.03)
        w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.03,
                         jnp.bfloat16)
        b2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.03)
        ref = np.asarray(fused_mlp_ln_res(x, ga, be, w1, b1, w2, b2,
                                          impl="xla"), np.float32)
        out = np.asarray(fused_mlp_ln_res(x, ga, be, w1, b1, w2, b2,
                                          impl="pallas"), np.float32)
        np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)

    def test_attention_ln_qkv_pallas_vs_xla(self):
        # fused LN+qkv+attention front half at ViT-L bench shape, bf16
        # (the shape that OOMed scoped VMEM before q-chunking)
        import jax.numpy as jnp
        from mtt_tpu.kernels.attention import fused_attention_ln_qkv
        rng = _rng(6)
        B, N, H, D = 2, 1029, 16, 64
        C = H * D
        x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32),
                        jnp.bfloat16)
        ga = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
        be = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(C, 3 * C)).astype(np.float32) * 0.03,
                        jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(3 * C,)).astype(np.float32) * 0.03,
                        jnp.bfloat16)
        ref = np.asarray(fused_attention_ln_qkv(x, ga, be, w, b, H,
                                                impl="xla"), np.float32)
        out = np.asarray(fused_attention_ln_qkv(x, ga, be, w, b, H,
                                                impl="pallas"), np.float32)
        np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)
        # tap (emit) variant: LN kernel + qkv-emitting attention kernel
        r3 = fused_attention_ln_qkv(x, ga, be, w, b, H, need_qkv=True,
                                    impl="xla")
        o3 = fused_attention_ln_qkv(x, ga, be, w, b, H, need_qkv=True,
                                    impl="pallas")
        for rr, oo in zip(r3, o3):
            np.testing.assert_allclose(np.asarray(oo, np.float32),
                                       np.asarray(rr, np.float32),
                                       atol=3e-2, rtol=3e-2)

    def test_task_decode_pallas_vs_xla(self):
        # fused task decode at TaskPrompter-ViT-L tap shape:
        # S=1024 patches, C=1024, T=5 tasks, G=16 head groups,
        # tar=300 / final=350 (the published ViT-L config shapes)
        import jax.numpy as jnp
        from mtt_tpu.kernels.task_decode import fused_task_decode
        rng = _rng(7)
        B, S, C, T, G, tar = 2, 1024, 1024, 5, 16, 300
        mk = lambda s, sc=1.0: jnp.asarray(  # noqa: E731
            rng.normal(size=s).astype(np.float32) * sc, jnp.bfloat16)
        x = mk((B, S, C))
        a = mk((B, T, S, G))
        cw = mk((B, T, C))
        ws, wc = mk((T, C, tar), 0.03), mk((T, C, tar), 0.03)
        bs, bc = mk((T, tar), 0.03), mk((T, tar), 0.03)
        fin = 350
        wf, bf = mk((T, 2 * tar, fin), 0.03), mk((T, fin), 0.03)
        ref = fused_task_decode(x, a, cw, ws, bs, wc, bc, wf, bf,
                                impl="xla")
        out = fused_task_decode(x, a, cw, ws, bs, wc, bc, wf, bf,
                                impl="pallas")
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=5e-2, rtol=5e-2)
        # non-128-multiple S (NYUD stage 28x36 = 1008 tokens): padded path
        Sr = 1008
        ref_r = fused_task_decode(x[:, :Sr], a[:, :, :Sr], cw, ws, bs, wc,
                                  bc, wf, bf, impl="xla")
        out_r = fused_task_decode(x[:, :Sr], a[:, :, :Sr], cw, ws, bs, wc,
                                  bc, wf, bf, impl="pallas")
        np.testing.assert_allclose(np.asarray(out_r, np.float32),
                                   np.asarray(ref_r, np.float32),
                                   atol=5e-2, rtol=5e-2)

    def test_invpt_message_kernel_pallas_vs_xla(self):
        # InvPT stage-2 shape: 5 tasks x 32x32 q (stride 2 -> 1280),
        # kv 5x8x8=320, 2 heads of 64
        import jax.numpy as jnp
        from mtt_tpu.kernels.invpt_attention import invpt_fused_attention
        rng = _rng(3)
        B, H, Lq, Lk, D = 1, 2, 1280, 320, 64
        q = jnp.asarray(rng.normal(size=(B, H, Lq, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
        msg = jnp.asarray(rng.normal(size=(B, H, Lq, Lk)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(H, 2 * H)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
        o_ref, m_ref = invpt_fused_attention(q, k, v, msg, w, b,
                                             D ** -0.5, impl="xla")
        o_out, m_out = invpt_fused_attention(q, k, v, msg, w, b,
                                             D ** -0.5, impl="pallas")
        np.testing.assert_allclose(np.asarray(o_out), np.asarray(o_ref),
                                   atol=5e-3, rtol=5e-3)
        np.testing.assert_allclose(np.asarray(m_out), np.asarray(m_ref),
                                   atol=5e-3, rtol=5e-3)


class TestFastSoftmaxGuard:
    """VERDICT r1 #8 / ADVICE r1 (medium): the exp2 fast softmax must be
    guarded against out-of-bound logits on the REAL backend, where the
    pallas path actually runs (the CPU/test XLA fallback keeps the exact
    softmax, so only a hardware test can catch clamp engagement)."""

    def _adversarial_qkv(self):
        # deterministic construction: q rows aligned with a unit axis, k
        # rows a linear ramp along it -> scaled logits ramp 0..~460 (far
        # past the +126 clamp) with adjacent gaps ~1.8 (orders of magnitude
        # above f32-matmul rounding, so no argmax flips between backends)
        import jax.numpy as jnp
        rng = _rng(11)
        B, N, H, D = 1, 256, 2, 64
        qkv = np.zeros((B, N, H * 3 * D), np.float32)
        ramp = np.arange(N, dtype=np.float32)
        for h in range(H):
            base = h * 3 * D
            qkv[:, :, base] = 10.0                      # q ~ 10 * e_0
            qkv[:, :, base + D] = ramp                  # k.e_0 = i
            qkv[:, :, base + D + 1:base + 2 * D] = \
                0.01 * rng.normal(size=(B, N, D - 1))
            qkv[:, :, base + 2 * D:base + 3 * D] = rng.normal(size=(B, N, D))
        return jnp.asarray(qkv), H, D

    def test_safe_mode_exact_past_clamp(self, monkeypatch):
        # logits far past the +126 exp2 clamp: safe mode must match the
        # exact XLA softmax on hardware
        import numpy as np
        from mtt_tpu.kernels.attention import fused_attention_qkv
        qkv, H, D = self._adversarial_qkv()
        ref = np.asarray(fused_attention_qkv(qkv, H, D ** -0.5, impl="xla"))
        monkeypatch.setenv("MTT_ATTN_SAFE_SOFTMAX", "1")
        out = np.asarray(fused_attention_qkv(qkv, H, D ** -0.5,
                                             impl="pallas"))
        # tolerance covers fp32 TPU matmul rounding between the two score
        # paths; the degradation guarded against is O(1)
        np.testing.assert_allclose(out, ref, atol=6e-3, rtol=6e-3)
        # and the default fast path on this input visibly degrades (clamp
        # engagement must be what the safe flag is protecting against)
        monkeypatch.delenv("MTT_ATTN_SAFE_SOFTMAX")
        fast = np.asarray(fused_attention_qkv(qkv, H, D ** -0.5,
                                              impl="pallas"))
        # degradation is finite (clamp headroom prevents sum overflow),
        # never a silent NaN — but clearly different from the exact answer
        assert np.isfinite(fast).all()
        assert np.max(np.abs(fast - ref)) > 1e-2

    def test_fast_mode_finite_on_floor(self, monkeypatch):
        # all-far-negative rows: the -120 floor must keep the fast path
        # finite on hardware (TPU flushes fp32 denormals to zero)
        import jax.numpy as jnp
        from mtt_tpu.kernels.attention import fused_attention_qkv
        monkeypatch.delenv("MTT_ATTN_SAFE_SOFTMAX", raising=False)
        rng = _rng(12)
        B, N, H, D = 1, 256, 2, 64
        qkv = np.zeros((B, N, H * 3 * D), np.float32)
        for h in range(H):
            base = h * 3 * D
            qkv[:, :, base:base + D] = 40.0
            qkv[:, :, base + D:base + 2 * D] = \
                -1.0 + 0.01 * rng.normal(size=(B, N, D))
            qkv[:, :, base + 2 * D:base + 3 * D] = rng.normal(size=(B, N, D))
        out = fused_attention_qkv(jnp.asarray(qkv), H, D ** -0.5,
                                  impl="pallas")
        assert np.isfinite(np.asarray(out, np.float32)).all()


class TestRound3KernelsOnTPU:
    def test_fused_up4_head_pallas_vs_xla(self):
        import jax.numpy as jnp
        from mtt_tpu.kernels.head_up4 import fused_up4_head
        rng = _rng(20)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 350)) * 0.3,
                        jnp.bfloat16)
        kc = jnp.asarray(rng.normal(size=(3, 3, 350, 350)) * 0.02,
                         jnp.float32)
        inv = jnp.asarray(1.0 + 0.1 * rng.normal(size=(350,)), jnp.float32)
        addv = jnp.asarray(0.1 * rng.normal(size=(350,)), jnp.float32)
        kp = jnp.asarray(rng.normal(size=(350, 21)) * 0.05, jnp.float32)
        ref = np.asarray(fused_up4_head(x, kc, inv, addv, kp, impl="xla"))
        got = np.asarray(fused_up4_head(x, kc, inv, addv, kp, impl="pallas"))
        np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)
        # task-metric bound for the kernel's bf16 logit accumulation
        # (ADVICE r3): the semseg prediction is argmax over the class
        # axis. Random-weight logits are full of near-ties that a trained
        # head doesn't have, so the meaningful property is: no flips on
        # pixels whose top-2 margin exceeds the accumulation error scale
        # (~2 bf16 roundings of O(1) logits ~ 2e-2).
        srt = np.sort(ref, axis=-1)
        margin = srt[..., -1] - srt[..., -2]
        decided = margin > 0.05
        flips = (got.argmax(-1) != ref.argmax(-1)) & decided
        # random logits are tie-heavy; ~44% of pixels have a clear margin
        assert decided.mean() > 0.25  # the check must cover real pixels
        assert flips.mean() <= 1e-3, (
            f"{flips.sum()} argmax flips on clear-margin pixels "
            f"({flips.mean():.5f} of all) — bf16 logit accumulation is "
            f"not metric-neutral; use an f32 scratch accumulator")
        # non-square grid (NYUD head input 28x36): per-axis shift stacks
        xr = jnp.asarray(rng.normal(size=(1, 28, 36, 350)) * 0.3,
                         jnp.bfloat16)
        ref_r = np.asarray(fused_up4_head(xr, kc, inv, addv, kp,
                                          impl="xla"))
        got_r = np.asarray(fused_up4_head(xr, kc, inv, addv, kp,
                                          impl="pallas"))
        assert got_r.shape == (1, 112, 144, 21)
        np.testing.assert_allclose(got_r, ref_r, atol=5e-2, rtol=5e-2)

    def test_window_attention_pallas_vs_xla(self):
        import jax.numpy as jnp
        from mtt_tpu.kernels.attention import fused_window_attention
        rng = _rng(21)
        nW, B, M, H, D = 8, 2, 147, 4, 64
        q = jnp.asarray(rng.normal(size=(B * nW, M, H, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B * nW, M, H, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B * nW, M, H, D)), jnp.bfloat16)
        bias = jnp.asarray(rng.normal(size=(H, M, M)), jnp.float32)
        mask = jnp.asarray(
            np.where(rng.random((nW, M, M)) > 0.7, -100.0, 0.0), jnp.float32)
        ref = np.asarray(fused_window_attention(
            q, k, v, bias, mask, D ** -0.5, nW, impl="xla"), np.float32)
        got = np.asarray(fused_window_attention(
            q, k, v, bias, mask, D ** -0.5, nW, impl="pallas"), np.float32)
        np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)

    def test_invpt_tail_pallas_vs_xla(self):
        """Fused multi-scale tail at the InvPT PASCAL bench shapes
        (th=tw=128, scales 16/32/64, C=D=576, bf16)."""
        import jax.numpy as jnp
        from mtt_tpu.kernels.invpt_tail import (_ok, _tail_xla,
                                                fused_ms_tail)
        rng = _rng(26)
        th = tw = 128
        C = D = 576
        xs = [jnp.asarray(rng.normal(size=(2, th // f, tw // f, C)) * 0.2,
                          jnp.bfloat16) for f in (8, 4, 2)]
        kc = jnp.asarray(rng.normal(size=(3, 3, C, D)) * 0.02, jnp.float32)
        inv = jnp.asarray(1.0 + 0.1 * rng.normal(size=(D,)), jnp.float32)
        addv = jnp.asarray(0.1 * rng.normal(size=(D,)), jnp.float32)
        assert _ok(xs, kc, th, tw)
        ref = np.asarray(_tail_xla(xs, kc, inv, addv, th, tw), np.float32)
        got = np.asarray(fused_ms_tail(xs, kc, inv, addv, th, tw,
                                       impl="pallas"), np.float32)
        np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)

    def test_invpt_tail_head_pallas_vs_xla(self):
        """Head-fused tail (partial-logit emission) at InvPT PASCAL bench
        shapes: logits vs dense tail + f32 matmul. Needs the 40 MB
        scoped-VMEM cap the opt-in MTT_TAIL_HEAD=1 sets (the default
        28 MB cap OOMs the logits-accumulator scratch); run with
        MTT_TAIL_HEAD=1 MTT_TEST_TPU=1."""
        import os
        if os.environ.get("MTT_TAIL_HEAD") != "1":
            import pytest
            pytest.skip("opt-in kernel: needs MTT_TAIL_HEAD=1 "
                        "(40 MB scoped-VMEM cap)")
        import jax.numpy as jnp
        from mtt_tpu.kernels.invpt_tail import (_tail_xla,
                                                fused_ms_tail_head)
        rng = _rng(27)
        th = tw = 128
        C = D = 576
        n = 21
        xs = [jnp.asarray(rng.normal(size=(2, th // f, tw // f, C)) * 0.2,
                          jnp.bfloat16) for f in (8, 4, 2)]
        kc = jnp.asarray(rng.normal(size=(3, 3, C, D)) * 0.02, jnp.float32)
        inv = jnp.asarray(1.0 + 0.1 * rng.normal(size=(D,)), jnp.float32)
        addv = jnp.asarray(0.1 * rng.normal(size=(D,)), jnp.float32)
        wh = jnp.asarray(rng.normal(size=(D, n)) * 0.05, jnp.float32)
        bh = jnp.asarray(rng.normal(size=(n,)) * 0.1, jnp.float32)
        feats = np.asarray(_tail_xla(xs, kc, inv, addv, th, tw), np.float32)
        ref = (feats.reshape(-1, D) @ np.asarray(wh)
               + np.asarray(bh)).reshape(2, th, tw, n)
        got = np.asarray(fused_ms_tail_head(xs, kc, inv, addv, wh, bh,
                                            th, tw, impl="pallas"),
                         np.float32)
        np.testing.assert_allclose(got, ref, atol=8e-2, rtol=8e-2)

    def test_window_attention_backward_pallas_vs_xla(self):
        import jax
        import jax.numpy as jnp
        from mtt_tpu.kernels.attention import fused_window_attention
        rng = _rng(25)
        nW, B, M, H, D = 8, 2, 147, 4, 32   # CS3D stage-1-like shapes
        q = jnp.asarray(rng.normal(size=(B * nW, M, H, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B * nW, M, H, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B * nW, M, H, D)), jnp.bfloat16)
        bias = jnp.asarray(rng.normal(size=(H, M, M)), jnp.float32)
        mask = jnp.asarray(
            np.where(rng.random((nW, M, M)) > 0.7, -100.0, 0.0), jnp.float32)

        for m in (mask, None):
            def loss(impl, mm):
                def f(qq, kk, vv, bb):
                    out = fused_window_attention(qq, kk, vv, bb, mm,
                                                 D ** -0.5, nW, impl=impl)
                    return (out.astype(jnp.float32) ** 2).sum()
                return f
            g1 = jax.jit(jax.grad(loss("pallas", m), argnums=(0, 1, 2, 3)))(
                q, k, v, bias)
            g2 = jax.jit(jax.grad(loss("xla", m), argnums=(0, 1, 2, 3)))(
                q, k, v, bias)
            for a, b2, nm in zip(g1, g2, ("dq", "dk", "dv", "dbias")):
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(b2, np.float32),
                    atol=5e-2, rtol=5e-2, err_msg=nm)

    def test_attention_core_backward_pallas_vs_xla(self):
        import jax.numpy as jnp
        from mtt_tpu.kernels.attention import (_attn_core_bwd_pallas,
                                               _attn_core_bwd_xla)
        rng = _rng(22)
        B, N, H, D = 2, 1029, 4, 64
        qkv = jnp.asarray(rng.normal(size=(B, N, H * 3 * D)) * 0.3,
                          jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=(B, N, H * D)), jnp.bfloat16)
        ref = np.asarray(_attn_core_bwd_xla(qkv, g, H, D ** -0.5),
                         np.float32)
        got = np.asarray(_attn_core_bwd_pallas(qkv, g, H, D ** -0.5),
                         np.float32)
        np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)
