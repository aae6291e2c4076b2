"""The hand-rolled TB event writer must produce files TensorBoard's own
event loader parses (CRC framing + proto encoding), plus the CSV mirror."""

import csv
import glob
import os


def test_event_file_parses_with_tensorboard(tmp_path):
    from mtt_tpu.utils.tb_writer import SummaryWriter

    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss/total", 1.5, 1)
    w.add_scalar("loss/total", 0.75, 2)
    w.add_scalar("perf/semseg/mIoU", 42.0, 2)
    w.close()

    from tensorboard.backend.event_processing import event_file_loader
    files = glob.glob(os.path.join(tmp_path, "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(event_file_loader.EventFileLoader(files[0]).Load())
    scalars = []
    for e in events:
        for v in getattr(e.summary, "value", []):
            # newer TB migrates simple_value into a v2 tensor proto
            val = v.simple_value
            if not val and v.HasField("tensor"):
                import struct as _s
                if v.tensor.float_val:
                    val = v.tensor.float_val[0]
                elif v.tensor.tensor_content:
                    val = _s.unpack("<f", v.tensor.tensor_content[:4])[0]
            scalars.append((e.step, v.tag, round(val, 6)))
    assert (1, "loss/total", 1.5) in scalars
    assert (2, "loss/total", 0.75) in scalars
    assert (2, "perf/semseg/mIoU", 42.0) in scalars

    with open(os.path.join(tmp_path, "scalars.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert rows[0]["tag"] == "loss/total" and float(rows[0]["value"]) == 1.5


def test_flatten_scores():
    from mtt_tpu.utils.tb_writer import flatten_scores
    flat = flatten_scores({"semseg": {"mIoU": 0.5},
                           "depth": {"rmse": 0.4, "log_rmse": 0.1},
                           "edge": {"loss": 0.2}})
    assert flat == {"semseg/mIoU": 0.5, "depth/rmse": 0.4,
                    "depth/log_rmse": 0.1, "edge/loss": 0.2}
