#!/usr/bin/env bash
# Run the full test suite (parity with the reference's scripts/run_tests.sh,
# which iterates per-package pytest suites). Tests run on a virtual 8-device
# CPU mesh; conftest.py handles the platform setup.
set -euo pipefail
cd "$(dirname "$0")/.."
python scripts/build_native.py
python -m pytest tests/ -q "$@"
