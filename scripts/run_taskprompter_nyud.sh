#!/usr/bin/env bash
python main.py --config_exp configs/nyud/taskprompter_vitLp16.yml --run_mode train "$@"
