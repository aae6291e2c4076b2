"""Hand-computed golden values for the Cityscapes-3D evaluator.

The fixture is small enough that AP (monotonic precision envelope over
the 51-threshold sweep, evalObjectDetection3d.py:996-1020), the working
point (first threshold with best precision*recall, :984-994), the DDTP
depth-bin means (:559-727), and the ignore-region FP absorption
(:485-502) are all derived by hand in the comments below.
"""

import numpy as np


def _obj(label, center, dims, modal, score=None, rot=(1, 0, 0, 0)):
    o = {"label": label,
         "3d": {"center": list(center), "dimensions": list(dims),
                "rotation": list(rot)},
         "2d": {"modal": list(modal)}}
    if score is not None:
        o["score"] = score
    return o


def build_eval(with_ignore_image=False):
    from mtt_tpu.detection.eval3d import Box3dEvaluator
    ev = Box3dEvaluator(labels=["car"], min_iou=0.7)
    # image A: one GT at depth hypot(3,4)=5 (bin 5); matching pred score
    # 0.9 with BEV center error 0.5 -> CD score 1-0.5/100 = 0.995
    ev.add_image(
        "a",
        [_obj("car", (3, 4, 0), (2, 2, 2), (0, 0, 10, 10))],
        [_obj("car", (3, 4.5, 0), (2, 2, 2), (0, 0, 10, 10), score=0.9)])
    # image B: GT at depth 50 (bin 50), matching pred score 0.5 with center
    # error 0.8 -> 0.992; plus a spurious FP with score 0.3
    ev.add_image(
        "b",
        [_obj("car", (30, 40, 0), (2, 2, 2), (20, 20, 30, 30))],
        [_obj("car", (30, 40.8, 0), (2, 2, 2), (20, 20, 30, 30), score=0.5),
         _obj("car", (5, 5, 0), (1, 1, 1), (50, 50, 60, 60), score=0.3)])
    if with_ignore_image:
        # image C: a high-score pred fully inside an ignore region and no
        # GT; absorption must keep every metric identical
        ev.add_image(
            "c", [],
            [_obj("car", (10, 10, 0), (1, 1, 1), (100, 100, 110, 110),
                  score=0.95)],
            ignore_objects=[{"2d": [95, 95, 120, 120]}])
    return ev


def test_ap_working_point_and_ddtp_hand_values():
    res = build_eval().evaluate()
    # Threshold sweep: s<=0.30 -> tp=2, fp=1, fn=0 (p=2/3, r=1);
    # 0.30<s<=0.50 -> tp=2 fp=0 (p=1, r=1, p*r=1 <- best, first at 0.32);
    # 0.50<s<=0.90 -> tp=1 fn=1 (p=1, r=0.5); s>0.90 -> 0.
    assert abs(res["working_confidence"]["car"] - 0.32) < 1e-9
    # AP: envelope makes precision 1.0 for all recalls in (0,1] -> AP = 1.0
    assert abs(res["AP"]["car"]["auc"] - 1.0) < 1e-9
    # DDTP at working point 0.32: both TPs kept; bins {5: 0.995, 50: 0.992}
    assert abs(res["Center_Dist"]["car"]["auc"] - (0.995 + 0.992) / 2) < 1e-9
    assert abs(res["Size_Similarity"]["car"]["auc"] - 1.0) < 1e-9
    assert abs(res["OS_Yaw"]["car"]["auc"] - 1.0) < 1e-9
    assert abs(res["OS_Pitch_Roll"]["car"]["auc"] - 1.0) < 1e-9
    want_ds = 1.0 * (0.9935 + 1 + 1 + 1) / 4
    assert abs(res["mDetection_Score"] - want_ds) < 1e-9


def test_single_populated_bin_scores_zero():
    # reference _calculateAUC: fewer than 2 populated depth bins -> auc 0
    from mtt_tpu.detection.eval3d import Box3dEvaluator
    ev = Box3dEvaluator(labels=["car"], min_iou=0.7)
    ev.add_image(
        "a",
        [_obj("car", (3, 4, 0), (2, 2, 2), (0, 0, 10, 10))],
        [_obj("car", (3, 4, 0), (2, 2, 2), (0, 0, 10, 10), score=0.9)])
    res = ev.evaluate()
    assert res["AP"]["car"]["auc"] == 1.0
    assert res["Center_Dist"]["car"]["auc"] == 0.0
    assert res["mDetection_Score"] == 0.0


def test_ignore_regions_absorb_false_positives():
    base = build_eval(with_ignore_image=False).evaluate()
    with_ign = build_eval(with_ignore_image=True).evaluate()
    assert abs(base["mAP"] - with_ign["mAP"]) < 1e-12
    assert abs(base["mDetection_Score"]
               - with_ign["mDetection_Score"]) < 1e-12


def test_means_skip_classes_without_gt():
    from mtt_tpu.detection.eval3d import Box3dEvaluator
    ev = Box3dEvaluator(labels=["car", "bus"], min_iou=0.7)
    ev.add_image(
        "a",
        [_obj("car", (3, 4, 0), (2, 2, 2), (0, 0, 10, 10)),
         _obj("car", (30, 40, 0), (2, 2, 2), (20, 20, 30, 30))],
        [_obj("car", (3, 4, 0), (2, 2, 2), (0, 0, 10, 10), score=0.9),
         _obj("car", (30, 40, 0), (2, 2, 2), (20, 20, 30, 30), score=0.8)])
    res = ev.evaluate()
    # 'bus' has no GT anywhere -> excluded from the means (accept_cats)
    assert res["GT_stats"]["bus"] == 0
    assert res["mAP"] == res["AP"]["car"]["auc"] == 1.0
    assert res["mDetection_Score"] == res["Detection_Score"]["car"]
