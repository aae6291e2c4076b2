"""Overfit integration test — the reference's core sanity mechanism
(SURVEY.md §4: 64-image overfit mode). Tiny model, one synthetic batch,
training must drive the loss down sharply and predictions toward labels."""

import jax
import jax.numpy as jnp
import numpy as np

from mtt_tpu.config.config import Config


def test_overfit_single_batch():
    from mtt_tpu.models.wrappers import TaskPrompterNet
    from mtt_tpu.utils.train_utils import Trainer
    from mtt_tpu.data.synthetic import SyntheticMT
    from mtt_tpu.data.loader import collate
    from mtt_tpu.utils.postprocess import get_output
    from mtt_tpu.evaluation.meters import ConfusionMeter

    tasks = ("semseg", "depth")
    num_out = {"semseg": 4, "depth": 1}
    p = Config({
        "train_db_name": "NYUD", "ignore_index": 255,
        "intermediate_supervision": False,
        "TASKS": Config(NAMES=list(tasks), NUM_OUTPUT=Config(num_out)),
        "loss_kwargs": {"loss_weights": {"semseg": 1.0, "depth": 1.0}},
        "optimizer": "adam", "optimizer_kwargs": {"lr": 1e-2},
        "scheduler": "poly", "max_iter": 2000,
    })
    model = TaskPrompterNet(tasks=tasks, num_outputs=num_out,
                            backbone_name="TaskPrompter_vitT",
                            tar_dim=24, final_dim=32, use_ctr=False,
                            drop_path_rate=0.0)
    ds = SyntheticMT(tasks, num_out, size=(32, 32), length=4)
    batch = collate([ds[i] for i in range(4)])
    trainer = Trainer(p, model)
    state = trainer.init_state(batch)
    dev = {k: jax.device_put(v) for k, v in batch.items()
           if isinstance(v, np.ndarray)}
    rng = jax.random.PRNGKey(0)
    state, l0 = trainer.train_step(state, dev, rng)
    l0 = float(jax.device_get(l0)["total"])
    for _ in range(150):
        state, losses = trainer.train_step(state, dev, rng)
    l_end = float(losses["total"])
    assert l_end < 0.5 * l0, (l0, l_end)

    # predictions should now mostly match the labels
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      dev["image"], train=False)
    pred = get_output(out["semseg"], "semseg")
    m = ConfusionMeter(4)
    s = m.update(m.init(), pred, dev["semseg"])
    assert m.score(s)["mIoU"] > 0.4
