#!/usr/bin/env bash
# CI matrix mirroring the reference (.github/workflows/rust.yml:19-25):
# full suite once plain, then re-run under each forced codec.
set -e
cd "$(dirname "$0")"
python -m pytest tests/ -x -q
for var in STRAWBOAT_FREQ_COMPRESSION STRAWBOAT_DICT_COMPRESSION STRAWBOAT_RLE_COMPRESSION; do
  echo "=== forced $var ==="
  env $var=1 python -m pytest tests/test_io.py tests/test_decimal.py -x -q
done
