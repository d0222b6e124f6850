#!/usr/bin/env bash
# CI entry point (reference analog: .github/workflows/test.yml):
# build the native library, run the full pytest suite on the CPU
# backend (x64 parity mode + virtual 8-device mesh via conftest), and
# emit the one-line bench metric.
set -euo pipefail
cd "$(dirname "$0")"

make -C native
python -m regenie_tpu --helpFull > /dev/null   # flag surface smoke
REGENIE_TPU_PLATFORM=cpu python -m pytest tests/ -q
REGENIE_TPU_PLATFORM=cpu python bench.py
