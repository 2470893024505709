#!/bin/sh
# Full verification ladder (reference analogue: .travis.yml:7-21).
#   1. fast unit tier        (~13 min CPU)
#   2. golden nightly tier   (~23 min CPU)
#   3. accel feature matrix  (~12 min CPU)
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python -m pytest tests/ -q -m golden
python tools/accel_matrix.py --scale 0.25 --samples 2
