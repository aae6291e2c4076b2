#!/usr/bin/env bash
# InvPT ViT-L PASCAL-Context 5-task training (reference InvPT/run.sh
# equivalent — no torch.distributed.launch: one SPMD process per host,
# --multihost on pods).
python main.py --config_exp configs/pascal/invpt_vitLp16.yml --run_mode train "$@"
