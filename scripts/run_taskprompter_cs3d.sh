#!/usr/bin/env bash
# TaskPrompter Swin-B Cityscapes-3D joint 2D-3D
python main.py --config_exp configs/cityscapes3d/taskprompter_swinB.yml --run_mode train "$@"
