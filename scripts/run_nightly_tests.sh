#!/bin/bash
# Nightly tier: the full oracle-replay suites the default pytest gate
# excludes (see pytest.ini). Run AFTER the fast gate:
#   python -m pytest tests/ -q                  # fast gate (default)
#   bash scripts/run_nightly_tests.sh           # nightly replay tier
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q -m nightly "$@"
