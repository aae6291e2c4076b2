#!/usr/bin/env bash
python main.py --config_exp configs/nyud/invpt_vitLp16.yml --run_mode train "$@"
