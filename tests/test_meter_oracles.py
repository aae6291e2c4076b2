"""Golden-value parity: our jnp meters vs the reference's meter math.

The oracles below re-implement, in torch/numpy, the EXACT update/score
semantics of the reference meters (line-cited per test) and are fed the
same random fixtures as our meters; agreement is asserted to ~1e-6.
This pins the metric pipeline to the reference numerics (VERDICT.md
round-1 item 7) without needing real datasets.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _fixture(rng, B=2, H=31, W=37, nc=5, ignore_frac=0.1):
    pred = rng.integers(0, nc, (B, H, W))
    gt = rng.integers(0, nc, (B, H, W))
    gt[rng.random((B, H, W)) < ignore_frac] = 255
    return pred, gt


class TestSemsegOracle:
    def test_miou_matches_reference_math(self):
        # oracle: InvPT/evaluation/eval_semseg.py:35-97
        import jax.numpy as jnp
        from mtt_tpu.evaluation.meters import ConfusionMeter

        rng = np.random.default_rng(0)
        nc = 7
        meter = ConfusionMeter(nc)
        state = meter.init()
        tp = np.zeros(nc)
        fp = np.zeros(nc)
        fn = np.zeros(nc)
        for _ in range(3):
            pred, gt = _fixture(rng, nc=nc)
            state = meter.update(state, jnp.asarray(pred), jnp.asarray(gt))
            p, g = torch.from_numpy(pred), torch.from_numpy(gt)
            valid = g != 255
            for i in range(nc):
                tg, tpd = (g == i), (p == i)
                tp[i] += torch.sum(tg & tpd & valid).item()
                fp[i] += torch.sum(~tg & tpd & valid).item()
                fn[i] += torch.sum(tg & ~tpd & valid).item()
        jac = tp / np.maximum(tp + fp + fn, 1e-8)
        want = float(np.mean(jac))
        got = meter.score(state)["mIoU"]
        assert abs(got - want) < 1e-9


class TestSaliencyOracle:
    def test_maxf_matches_reference_math(self):
        # oracle: InvPT/evaluation/eval_sal.py:12-79 including the
        # double-sigmoid quirk (preds/255 then torch.sigmoid)
        import jax.numpy as jnp
        from mtt_tpu.evaluation.meters import SaliencyMeter

        rng = np.random.default_rng(1)
        meter = SaliencyMeter(beta_squared=0.3, threshold_step=0.05)
        state = meter.init()
        thresholds = torch.arange(0.05, 1, 0.05)
        tps = torch.zeros(len(thresholds))
        pps = torch.zeros(len(thresholds))
        aps = torch.zeros(len(thresholds))
        for _ in range(3):
            pred = rng.integers(0, 256, (2, 17, 19)).astype(np.float32)
            gt = rng.integers(0, 2, (2, 17, 19))
            gt[rng.random((2, 17, 19)) < 0.1] = 255
            state = meter.update(state, jnp.asarray(pred), jnp.asarray(gt))
            p = torch.sigmoid(torch.from_numpy(pred) / 255.0)
            g = torch.from_numpy(gt)
            valid = g != 255
            for i, th in enumerate(thresholds):
                fp_ = (p >= th).long()
                fp_m = torch.masked_select(fp_, valid)
                ft_m = torch.masked_select(g.long(), valid)
                tps[i] += torch.sum(fp_m * ft_m)
                pps[i] += torch.sum(fp_m)
                aps[i] += torch.sum(ft_m)
        precision = tps.float() / pps
        recall = tps.float() / aps
        f = (1 + 0.3) * precision * recall / (0.3 * precision + recall)
        f[f != f] = 0
        want = float(f.max())
        got = meter.score(state)["maxF"]
        assert abs(got - want) < 1e-6


class TestDepthOracle:
    @pytest.mark.parametrize("ranged", [False, True])
    def test_depth_matches_reference_math(self, ranged):
        # oracle: TaskPrompter/evaluation/eval_depth.py:19-63 (ranged) /
        # InvPT/evaluation/eval_depth.py (ignore-index)
        import jax.numpy as jnp
        from mtt_tpu.evaluation.meters import DepthMeter

        rng = np.random.default_rng(2)
        if ranged:
            meter = DepthMeter(max_depth=80.0, min_depth=0.0)
        else:
            meter = DepthMeter(ignore_index=255)
        state = meter.init()
        tot_r = tot_lr = tot_ar = tot_sr = n = 0.0
        for _ in range(3):
            pred = (rng.random((2, 13, 11)) * 90).astype(np.float32)
            gt = (rng.random((2, 13, 11)) * 90).astype(np.float32)
            if not ranged:
                gt[rng.random((2, 13, 11)) < 0.1] = 255.0
            state = meter.update(state, jnp.asarray(pred), jnp.asarray(gt))
            p = torch.from_numpy(pred.copy())
            g = torch.from_numpy(gt.copy())
            if ranged:
                mask = torch.logical_and(g < 80.0, g > 0.0)
            else:
                mask = g != 255.0
            n += mask.float().sum().item()
            g[g <= 0] = 1e-9
            p[p <= 0] = 1e-9
            tot_lr += torch.pow(torch.log(g[mask]) - torch.log(p[mask]),
                                2).sum().item()
            tot_r += torch.pow(g[mask] - p[mask], 2).sum().item()
            tot_ar += (torch.abs(g[mask] - p[mask]) / g[mask]).sum().item()
            tot_sr += ((g[mask] - p[mask]) ** 2 / g[mask]).sum().item()
        got = meter.score(state)
        assert abs(got["rmse"] - np.sqrt(tot_r / n)) < 1e-4
        assert abs(got["log_rmse"] - np.sqrt(tot_lr / n)) < 1e-4
        assert abs(got["abs_rel"] - tot_ar / n) < 1e-4
        assert abs(got["sq_rel"] - tot_sr / n) < 1e-4


class TestNormalsOracle:
    def test_mean_angle_matches_reference_math(self):
        # oracle: InvPT/evaluation/eval_normals.py:27-50
        import jax.numpy as jnp
        from mtt_tpu.evaluation.meters import NormalsMeter

        rng = np.random.default_rng(3)
        meter = NormalsMeter()
        state = meter.init()
        sum_deg = 0.0
        total = 0
        for _ in range(3):
            pred = rng.integers(0, 256, (2, 9, 9, 3)).astype(np.float32)
            gt = rng.normal(size=(2, 9, 9, 3)).astype(np.float32)
            gt[rng.random((2, 9, 9)) < 0.1] = 255.0
            state = meter.update(state, jnp.asarray(pred), jnp.asarray(gt))
            p = torch.from_numpy(pred).permute(0, 3, 1, 2)
            g = torch.from_numpy(gt).permute(0, 3, 1, 2)
            p = 2 * p / 255 - 1
            valid = (g != 255.0).all(dim=1)
            p = torch.nn.functional.normalize(p, dim=1)
            g = torch.nn.functional.normalize(g, dim=1)
            deg = torch.rad2deg(2 * torch.atan2(
                torch.norm(p - g, dim=1), torch.norm(p + g, dim=1)))
            deg = torch.masked_select(deg, valid)
            sum_deg += deg.sum().item()
            total += deg.numel()
        got = meter.score(state)["mean"]
        assert abs(got - sum_deg / total) < 1e-3
