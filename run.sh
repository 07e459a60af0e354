#!/bin/bash
# Command dispatcher (reference run.sh role).
set -e
cd "$(dirname "$0")"
export PYTHONPATH="$(pwd):${PYTHONPATH}"

usage() {
  cat <<EOF
usage: ./run.sh <command> [args...]

commands:
  test            run the test suite (CPU, 8-device virtual mesh)
  bench           run the headline benchmark (prints one JSON line)
  serve           start the HTTP server with mock stages
  serve-real      start the HTTP server from configs/cascade.yaml weights
  train           train the quality predictor (synthetic data)
  theory          theory validation demo (thresholds/regret/complexity)
  baselines       baseline policy comparison + statistics
  profile         cost profiling (mock measurements)
  profile-tpu     cost profiling with real engines on the current backend
  sweep           in-process lambda-sweep evaluation
  native          build the native (C++) runtime core
EOF
}

case "${1:-}" in
  test)        shift; python -m pytest tests/ -q "$@" ;;
  bench)       shift; python bench.py "$@" ;;
  serve)       shift; python scripts/serve.py --mock "$@" ;;
  serve-real)  shift; python scripts/serve.py "$@" ;;
  train)       shift; python scripts/train_predictor.py "$@" ;;
  theory)      shift; python scripts/theory_demo.py "$@" ;;
  demo)        shift; python scripts/cascade_demo.py "$@" ;;
  baselines)   shift; python scripts/run_baselines.py "$@" ;;
  profile)     shift; python scripts/profile_costs.py --mock "$@" ;;
  profile-tpu) shift; python scripts/profile_costs.py --synthetic "$@" ;;
  sweep)       shift; python scripts/evaluate.py "$@" ;;
  plot)        shift; python scripts/plot_results.py "$@" ;;
  download)    shift; python scripts/download_models.py "$@" ;;
  native)      shift; ./native/build.sh ;;
  *)           usage; exit 1 ;;
esac
