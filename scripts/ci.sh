#!/usr/bin/env bash
# CI-style test runner.
#   scripts/ci.sh quick   — fast tier (unit/kernel tests, -m quick)
#   scripts/ci.sh slow    — system tier (e2e / async / map-io, -m slow)
#   scripts/ci.sh all     — both (default)
# The suite forces the CPU backend + an 8-virtual-device mesh (tests/conftest.py)
# and uses a persistent XLA compile cache, so repeat runs skip compilation.
set -euo pipefail
cd "$(dirname "$0")/.."
tier="${1:-all}"
shift || true
case "$tier" in
  quick) python -m pytest tests/ -m quick -q "$@" ;;
  slow)  python -m pytest tests/ -m slow -q "$@" ;;
  all)   python -m pytest tests/ -q "$@" ;;
  *) echo "usage: scripts/ci.sh [quick|slow|all] [pytest args]" >&2; exit 2 ;;
esac
