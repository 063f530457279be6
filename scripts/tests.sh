#!/bin/bash
# Smoke runs (reference tests.sh four-invocation analogue + unit tier).
set -e
python -m pytest tests/ -q
python slam.py --config configs/synthetic/test.yaml --n-frames 10 --eval
