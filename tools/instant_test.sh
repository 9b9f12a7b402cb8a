#!/bin/bash
# "Quick schedule" instant test (the DensePose dev/run_instant_tests.sh idea,
# SURVEY.md §4): a tiny end-to-end train + prune + sft + eval + score run on
# synthetic data, asserting the pipeline works and the toy task is learned.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/test_cli.py tests/test_driver.py -q
echo "instant tests OK"
