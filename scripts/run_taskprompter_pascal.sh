#!/usr/bin/env bash
# TaskPrompter ViT-L PASCAL (reference run_taskprompter_pascal.sh equivalent)
python main.py --config_exp configs/pascal/taskprompter_vitLp16.yml --run_mode train "$@"
